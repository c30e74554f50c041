"""Portable deterministic hashing expressions.

The reference hashes content with sha256 for dedup-upsert keys
(reference backend/services/vector_service.py:105) and md5 for cache keys
(reference backend/utils/caching.py:233-251). For cross-engine exactness
(Spark result must hash-match a DuckDB oracle) all derived *numeric* hashes
are defined as integer arithmetic over an md5 hex prefix — identical in any
engine with md5 + hex→int conversion, and JVM-side (no Python UDF) in Spark.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Largest signed-64 safe prefix: 15 hex chars = 60 bits.
MD5_PREFIX_LEN = 15
# Modulus keeping (a * h + b) within int64 for small multipliers a.
HASH_MOD = 1_000_000_007


def md5_int(col: Column, prefix_len: int = MD5_PREFIX_LEN) -> Column:
    """First ``prefix_len`` hex chars of md5 as a non-negative int64."""
    return F.conv(F.substring(F.md5(col), 1, prefix_len), 16, 10).cast("long")


def md5_int_sql(expr: str, prefix_len: int = MD5_PREFIX_LEN) -> str:
    """DuckDB SQL equivalent of :func:`md5_int` (hex-literal string cast)."""
    return f"CAST(('0x' || substr(md5({expr}), 1, {prefix_len})) AS BIGINT)"


def md5_bucket(col: Column, n_buckets: int) -> Column:
    """Stable bucket id in [0, n_buckets) — e.g. IVF-ish coarse routing."""
    return md5_int(col) % n_buckets


def content_hash(col: Column) -> Column:
    """sha256 content hash, the reference's dedup-upsert conflict key
    (reference Supabase/knowledge_base-RAG.sql:5)."""
    return F.sha2(col, 256)


def minhash_perm(hash_col: Column, a: int, b: int) -> Column:
    """One universal-hash permutation for MinHash: (a*h + b) mod p.

    ``hash_col`` must already be reduced mod HASH_MOD; ``a`` small enough
    that a*h stays within int64 (a <= 9e9 / 1e9 ≈ 9 is always safe, we use
    a in [1, 64])."""
    return (F.lit(a) * hash_col + F.lit(b)) % F.lit(HASH_MOD)
