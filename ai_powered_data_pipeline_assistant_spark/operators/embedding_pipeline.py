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
from ai_powered_data_pipeline_assistant_spark.functions.embedder import (
    _embed_one,
    cosine_to_query,
    embedding_column,
)


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

    The query vector is embedded DRIVER-side (one vector — the exact
    analogue of the reference embedding the query client-side before the
    SQL RPC, backend/services/search_service.py:219-270) and closed over by
    a vectorized pandas scorer. The scorer chains onto the embed UDF, so
    Spark runs embed+score as one ArrowEvalPython pass: at dim=1536 the
    per-element HOF cosine would be ~23M interpreted lambda evals for 5k
    docs; the batch matmul is one BLAS call per Arrow batch (~10×).
    """
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    qvec = _embed_one("spark shuffle partition tuning")
    scored = docs.select(
        "doc_id",
        cosine_to_query(qvec)(embedding_column(F.col("text"))).alias("similarity"),
    )
    return scored.orderBy(F.desc("similarity"), "doc_id").limit(k)


ORACLES: dict[str, str] = {}  # hash-projection embeddings: rows-only checks

QUERIES = {
    "embed_documents": embed_documents,
    "embed_and_search": embed_and_search,
}
