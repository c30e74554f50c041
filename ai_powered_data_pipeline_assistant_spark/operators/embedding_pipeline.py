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


EMBED_SHARD_BYTES = 16 * 1024


def embed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write path: content hash + embedding column for every document."""
    # EMBED_SHARD_BYTES: the embedder is CPU-bound Python per row, so it
    # wants one worker per core — the 64 KiB session default (10 shards)
    # measured 0.72x of full width on embed_and_search (best-of-5 A/B).
    docs = load_table(
        spark, sf_dir, "documents", parallelize=True,
        min_shard_bytes=EMBED_SHARD_BYTES,
    )
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
    # EMBED_SHARD_BYTES: the embedder is CPU-bound Python per row, so it
    # wants one worker per core — the 64 KiB session default (10 shards)
    # measured 0.72x of full width on embed_and_search (best-of-5 A/B).
    docs = load_table(
        spark, sf_dir, "documents", parallelize=True,
        min_shard_bytes=EMBED_SHARD_BYTES,
    )
    qvec = _embed_one("spark shuffle partition tuning")
    scored = docs.select(
        "doc_id",
        cosine_to_query(qvec)(embedding_column(F.col("text"))).alias("similarity"),
    )
    return scored.orderBy(F.desc("similarity"), "doc_id").limit(k)


# ---------------------------------------------------------------------------
# U2/J2 driver-scorable twin: the deterministic embedder pinned by golden
# integer checksums
# ---------------------------------------------------------------------------

# Fixed probe set: embeddings of these exact strings are part of the U2
# contract. Includes the empty string (the `or ""` null path) and non-ASCII.
EMBED_PROBES = (
    "spark shuffle partition tuning",
    "the quick brown fox jumps over the lazy dog",
    "",
    "naïve façade — übermäßig 日本語",
    "SELECT * FROM documents WHERE doc_id = 42",
    "a",
    "minhash lsh banding",
    "0123456789" * 8,
)


def _probe_golden(text: str) -> tuple[int, int]:
    """Integer-exact fingerprint of one embedding: components quantized as
    floor(v_i * 1e6) (float32 → double is exact, floor is order-free), then
    checksum = Σ q_i and sq_norm = Σ q_i² — both int64 (|q_i| ≤ 1e6 ⇒
    Σ q_i² ≤ 1536·10¹² < 2⁶³). No float ever crosses the engine boundary,
    so the driver hash is exact by construction."""
    import numpy as np

    q = np.floor(_embed_one(text).astype(np.float64) * 1_000_000).astype(np.int64)
    return int(q.sum()), int((q * q).sum())


def embedder_probe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-scorable U2 twin: run the REAL distributed embed path (Arrow
    iterator pandas UDF, functions/embedder.embed_text) over a fixed probe
    set and reduce each 1536-dim vector to integer-exact checksums; the
    oracle carries golden values generated from `_embed_one` — the local
    spec the UDF must reproduce bit-for-bit (reference U2 surface,
    backend/services/vector_service.py:41-84; model mocked per SURVEY §7.4).
    A drift anywhere in the distributed path — Arrow batch shape, float32
    cast, null handling, seed derivation — flips a checksum and the driver
    hash. This retires the last closable rows-only surface (J2/U2)."""
    probes = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EMBED_PROBES)], "probe_id int, text string"
    ).repartition(4)
    emb = probes.select(
        "probe_id", embedding_column(F.col("text")).alias("embedding")
    )
    q = F.transform(F.col("embedding"), lambda x: F.floor(x.cast("double") * 1_000_000))
    return emb.select(
        "probe_id",
        F.size("embedding").alias("dim"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, b: a + b).alias("checksum"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, b: a + b * b).alias("sq_norm"),
    ).orderBy("probe_id")


def _embedder_probe_oracle() -> str:
    from ai_powered_data_pipeline_assistant_spark.functions.embedder import EMBED_DIM

    rows = []
    for i, t in enumerate(EMBED_PROBES):
        checksum, sq_norm = _probe_golden(t)
        rows.append(
            f"({i}, {EMBED_DIM}, CAST({checksum} AS BIGINT),"
            f" CAST({sq_norm} AS BIGINT))"
        )
    values = ",\n            ".join(rows)
    return f"""
        SELECT * FROM (VALUES
            {values}
        ) AS t(probe_id, dim, checksum, sq_norm)
        ORDER BY probe_id
    """


ORACLES: dict[str, str] = {
    # hash-projection corpus embeddings stay rows-only; the probe audit
    # pins the embedder itself with golden integer checksums
    "embedder_probe_audit": _embedder_probe_oracle(),
}

QUERIES = {
    "embed_documents": embed_documents,
    "embed_and_search": embed_and_search,
    "embedder_probe_audit": embedder_probe_audit,
}
