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


def load_table(
    spark: SparkSession, sf_dir: str, name: str, parallelize: bool = False
) -> DataFrame:
    """Load one test table.

    ``parallelize=True`` repartitions the scan to the session's default
    parallelism when the file yields fewer partitions than cores. The test
    parquet is a single row group, so CPU-heavy downstream stages (shingle
    explode, mapInPandas feature extraction, embedding UDFs) would otherwise
    run on ONE core. On a real 100 TB table the scan has thousands of
    splits and this is a no-op; the guard keeps it from ever adding a
    shuffle where the scan is already parallel.
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
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for ts_col in _TS_COLUMNS.get(name, ()):
        field = df.schema[ts_col]
        if isinstance(field.dataType, LongType):
            # integer division — a double division would lose µs precision
            # at 2024-epoch nanos (~1.7e18 > 2^53)
            df = df.withColumn(
                ts_col, F.expr(f"timestamp_micros({ts_col} div 1000)")
            )
    if parallelize:
        target = spark.sparkContext.defaultParallelism
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
