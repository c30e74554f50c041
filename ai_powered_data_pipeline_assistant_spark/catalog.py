"""Table catalog over the driver-generated parquet test data.

The reference's catalog is 7 Supabase tables accessed through a PostgREST
builder (reference backend/db/optimized_queries.py:40-63); here the catalog
is plain parquet DataFrames — scans are pushdown/pruning friendly, and on a
real cluster these would be partitioned Delta/Iceberg tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


# Timestamp columns per table. The driver's parquet stores them as
# TIMESTAMP(NANOS); with spark.sql.legacy.parquet.nanosAsLong they arrive as
# int64 nanos and are floored to microseconds here — the same truncation
# DuckDB applies when reading the files, so oracles agree exactly.
_TS_COLUMNS: dict[str, tuple[str, ...]] = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}


# Parquet SCHEMA cache, keyed by (path, file mtime): creating a DataFrame
# with spark.read.parquet() runs a footer-read JOB on the driver to infer
# the schema, every single call — ~30-50 ms plus a scheduling gap per
# load_table, paid by every query (guide §1.1's empirical loop surfaced it
# as the recurring "parquet at NativeMethodAccessorImpl" jobs). Schemas are
# static per file version, so they are cached and replayed through
# spark.read.schema(...), which skips inference entirely. Only METADATA is
# cached — file listing and all data reads stay fresh per query (the mtime
# in the key invalidates on rewrite), so this is catalog behavior (what a
# metastore provides on a real deployment), not result caching.
_SCHEMA_CACHE: dict = {}


def _parquet_mtime(path: str) -> float:
    import os

    try:
        return os.path.getmtime(path)
    except OSError:
        return -1.0


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    parallelize: bool = False,
    min_shard_bytes: int | None = None,
) -> DataFrame:
    """Load one test table.

    ``parallelize=True`` repartitions the scan for CPU-heavy downstream
    stages (shingle explode, mapInPandas feature extraction, embedding
    UDFs) when the file yields fewer partitions than the data-proportional
    target below. On a real 100 TB table the scan has thousands of splits
    and this is a no-op; the guard keeps it from ever adding a shuffle
    where the scan is already parallel.

    ``min_shard_bytes`` overrides the session's per-shard byte divisor for
    callers that MEASURED a different sweet spot — the pandas-UDF embedder
    rows pass a SMALLER value (their per-row Python compute wants one
    worker per core: embed_and_search at the 64 KiB default is 0.72× of
    its full-width time), while everything else keeps the default.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    try:
        # Runtime-settable; required because the test parquet stores
        # TIMESTAMP(NANOS), which Spark otherwise refuses to read. Set here
        # (not only at session build) so externally-constructed sessions work.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # already set at session build, or conf locked — read will tell
    path = f"{sf_dir}/{name}.parquet"
    key = (path, _parquet_mtime(path))
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _SCHEMA_CACHE[key] = df.schema
    else:
        df = spark.read.schema(schema).parquet(path)
    for ts_col in _TS_COLUMNS.get(name, ()):
        field = df.schema[ts_col]
        if isinstance(field.dataType, LongType):
            # integer division — a double division would lose µs precision
            # at 2024-epoch nanos (~1.7e18 > 2^53)
            df = df.withColumn(
                ts_col, F.expr(f"timestamp_micros({ts_col} div 1000)")
            )
    if parallelize:
        # Data-proportional width cap (round 13, guide §2.5): width follows
        # the file size — one shard per SPARK_GRAFT_PARALLELIZE_BYTES of
        # compressed parquet — still capped at the session's core count.
        # The divisor default (64 KiB ≈ 10 shards for the sf0.1 documents
        # table, 13 for embeddings) was MEASURED, not assumed: interleaved
        # best-of-4 width sweeps at sf0.1/local[32] found width 32 the
        # WORST setting for every parallelize consumer tested — w10/w3 won
        # 1.2-1.9× on span_dedup, bpe_pair_counts, simhash, unigram,
        # length_batched_padding, bm25, curate_corpus, minhash, triangles
        # (dozens of near-empty round-robin shards cost more scheduling
        # and exchange fan-out than their contents; the same signal as the
        # 18 bench rows that ran faster on 8 cores than 32 in PERF_r12).
        # On a real table the scan already has more splits than the cap
        # and the whole branch is a no-op.
        target = spark.sparkContext.defaultParallelism
        try:
            import os

            nbytes = os.path.getsize(path)
            per_part = (
                min_shard_bytes
                if min_shard_bytes is not None
                else int(
                    os.environ.get("SPARK_GRAFT_PARALLELIZE_BYTES", str(64 * 1024))
                )
            )
            target = max(1, min(target, (nbytes + per_part - 1) // per_part))
        except (OSError, ValueError):
            pass  # no local size (remote path) → keep the core-count width
        if df.rdd.getNumPartitions() < target:
            df = df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str, register_views: bool = False) -> dict[str, DataFrame]:
    """Load every test table; optionally register temp views for spark.sql."""
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        if register_views:
            df.createOrReplaceTempView(name)
        out[name] = df
    return out
