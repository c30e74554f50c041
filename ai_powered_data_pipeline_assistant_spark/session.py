"""SparkSession factory.

Cluster-scale defaults: AQE on (runtime re-planning, skew-join splitting,
shuffle-partition coalescing), UTC session timezone (reference normalizes
timestamps to UTC, see reference app/state_manager.py:186-228), Arrow on for
the few pandas-UDF stages. Shuffle partitions default to the local core
count; on a real cluster this is overridden by AQE coalescing anyway.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "ai-pipeline-spark", master: str | None = None) -> SparkSession:
    """Build (or reuse) a SparkSession with engine defaults.

    ``master`` falls back to ``local[$SPARK_GRAFT_CPUS]`` (default all cores)
    so the same entry point works in tests, bench, and driver verify runs.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # 1536-dim float32 embeddings are ~6 KB/row: cap Arrow batches at
        # 1024 rows (~6 MB) so pandas-UDF workers stay memory-bounded; the
        # default 10k rows would build 60 MB batches per worker.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "1024")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # managed tables (bucketed layouts) land in /tmp, not the repo
        .config("spark.sql.warehouse.dir", "/tmp/spark_graft_warehouse")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.filterPushdown", "true")
        # Test parquet stores TIMESTAMP(NANOS) which Spark has no native
        # type for; read as int64 nanos and convert in catalog.load_table
        # (floor to micros — matches DuckDB's truncation of the same files).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    # Deployment hook: arbitrary extra conf pairs via environment, e.g.
    # SPARK_GRAFT_EXTRA_CONF="spark.eventLog.enabled=true;spark.eventLog.dir=/tmp/ev"
    # (profiling) or cluster-side shuffle/memory sizing — keeps
    # scale-dependent settings parameterised without code edits.
    extra = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for pair in filter(None, (p.strip() for p in extra.split(";"))):
        k, _, v = pair.partition("=")
        builder = builder.config(k.strip(), v.strip())
    return builder.getOrCreate()
