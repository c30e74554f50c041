"""End-to-end embedding pipeline: text → pandas-UDF embedding → dedup-upsert
key → top-k search — the reference's write path (§3.2 steps embed+upsert)
and read path (search_by_embedding) composed.

Parity: reference backend/services/vector_service.py:86-159 (generate
embeddings batched, content-hash, upsert) + search_service.py:219-295
(embed query → cosine top-k). The embedder is the deterministic local fake
(functions/embedder.py); results are deterministic but not SQL-expressible
(md5-seeded float projection) → rows-only oracle, with pytest checking
determinism and the top-k contract instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table
from ai_powered_data_pipeline_assistant_spark.functions.embedder import _embed_one, embedding_column
from ai_powered_data_pipeline_assistant_spark.functions.vector_math import cosine_similarity


def embed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write path: content hash + embedding column for every document."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    return docs.select(
        "doc_id",
        F.sha2("text", 256).alias("content_hash"),
        embedding_column(F.col("text")).alias("embedding"),
    )


def embed_and_search(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Read path: embed a query string, cosine top-k against the embedded
    corpus (one shuffle-free scored scan + TakeOrderedAndProject).

    The single query vector is embedded DRIVER-side and inlined as an array
    literal: a 1-row pandas-UDF job + broadcast exchange just to produce 64
    floats costs seconds of Python-worker spin-up and re-executes inside
    every consumer of the broadcast. Same trick the reference's read path
    uses — the query is embedded once, client-side, before the SQL RPC
    (reference backend/services/search_service.py:219-270).
    """
    corpus = embed_documents(spark, sf_dir)
    qvec = _embed_one("spark shuffle partition tuning")
    query_lit = F.array(*[F.lit(float(v)) for v in qvec])
    return (
        corpus.select(
            "doc_id",
            cosine_similarity(F.col("embedding"), query_lit).alias("similarity"),
        )
        .orderBy(F.desc("similarity"), "doc_id")
        .limit(k)
    )


ORACLES: dict[str, str] = {}  # hash-projection embeddings: rows-only checks

QUERIES = {
    "embed_documents": embed_documents,
    "embed_and_search": embed_and_search,
}
