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


# Per-VECTOR quantization grid for the block-matmul pair scorer. Unlike
# dot_scaled (which rounds each elementwise PRODUCT — inherently per-pair
# work that BLAS can't batch), quantizing each vector's elements once to an
# integer grid makes the pairwise dot a plain integer matmul: products are
# ≤ QUANT² = 1e12, so a float64 matmul is EXACT (all partial sums are
# integers < 2^53) up to dim ≈ 9000. Quantization is O(n·d); scoring is one
# BLAS call per block pair.
QUANT = int(1e6)


def np_quantize(m):
    """Half-away-from-zero per-element quantization of a float matrix —
    bit-identical to DuckDB round() and to np_round_half_up below."""
    import numpy as np

    s = m.astype(np.float64) * QUANT
    return np.where(s >= 0, np.floor(s + 0.5), np.ceil(s - 0.5))


def np_round_half_up(v, decimals: int = 6):
    """Half-away-from-zero rounding (NOT numpy's banker's rounding) —
    matches DuckDB round(x, d) on the same float64 inputs."""
    import numpy as np

    s = v * (10.0 ** decimals)
    return np.where(s >= 0, np.floor(s + 0.5), np.ceil(s - 0.5)) / (10.0 ** decimals)


def quantize_sql(a: str) -> str:
    """DuckDB mirror of np_quantize over a list column."""
    return (
        f"list_transform({a}, x -> CAST(round(CAST(x AS DOUBLE) * {QUANT}) AS BIGINT))"
    )


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
