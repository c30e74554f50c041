"""Vector similarity expressions, JVM-side (no Python UDF).

The reference's vector store is pgvector with cosine distance
(`embedding <=> q`, reference Supabase/knowledge_base-RAG.sql:43-67). Here
similarity is a pure column expression over array<float> so it runs inside
whole-stage codegen and distributes with the scan.

Cross-engine exactness: a naive double sum would differ between engines in
the last ulps depending on summation order. ``dot_scaled`` therefore rounds
each elementwise product to a fixed 1e-12 grid (an exact int64) before
summing — integer sums are order-independent and exact, so Spark and any
SQL oracle agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = int(1e12)


def dot_scaled(a: Column, b: Column) -> Column:
    """Exact-integer dot product: sum of round(a_i*b_i*1e12) as int64."""
    prods = F.zip_with(
        a, b, lambda x, y: F.round(x.cast("double") * y.cast("double") * SCALE).cast("long")
    )
    return F.aggregate(prods, F.lit(0).cast("long"), lambda acc, v: acc + v)


def norm_sq_scaled(a: Column) -> Column:
    return dot_scaled(a, a)


def cosine_similarity(a: Column, b: Column, decimals: int = 6) -> Column:
    """Cosine similarity rounded to ``decimals`` (deterministic cross-engine)."""
    sim = dot_scaled(a, b) / F.sqrt(norm_sq_scaled(a).cast("double") * norm_sq_scaled(b).cast("double"))
    return F.round(sim, decimals)


def dot_scaled_sql(a: str, b: str) -> str:
    """DuckDB oracle equivalent of :func:`dot_scaled`."""
    return (
        f"list_sum(list_transform(list_zip({a}, {b}), "
        f"p -> CAST(round(CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE) * 1e12) AS BIGINT)))"
    )


def cosine_similarity_sql(a: str, b: str, decimals: int = 6) -> str:
    dot = dot_scaled_sql(a, b)
    na = dot_scaled_sql(a, a)
    nb = dot_scaled_sql(b, b)
    return f"round({dot} / sqrt(CAST({na} AS DOUBLE) * CAST({nb} AS DOUBLE)), {decimals})"
