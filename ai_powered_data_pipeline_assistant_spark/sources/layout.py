"""Physical table layout: partitioned writes and bucketed joins.

The reference leans on 17+ Postgres B-tree indexes for selective access
(reference Supabase/knowledge_base-RAG.sql:35-40, tasks.sql:20-24,
logs.sql:17-21, chat_history.sql:18-22). A lakehouse replaces those with
LAYOUT (SURVEY §4):

- **Hive-style partition columns** on the coarse filter keys (date,
  source_type): a predicate on the partition column prunes entire
  directories at planning time — the scan never opens excluded files.
- **sortWithinPartitions** on the fine keys (session_id, created_at):
  parquet row-group min/max stats then prune pages within surviving files
  (the poor man's Z-order; one clustering key is usually enough).
- **Bucketing** on a high-cardinality join key: both sides pre-hashed into
  the same bucket count join WITHOUT a shuffle (no Exchange in the plan) —
  the co-located-join answer to the reference's FK joins at fact scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table


def write_partitioned_events(
    spark: SparkSession, sf_dir: str, out_path: str
) -> None:
    """Lay `events` out partitioned by (event_type, day), rows clustered by
    (user_id, ts) within each file for row-group stat pruning."""
    events = load_table(spark, sf_dir, "events")
    (
        events.withColumn("day", F.to_date("ts"))
        .repartition("event_type", "day")
        .sortWithinPartitions("user_id", "ts")
        .write.mode("overwrite")
        .partitionBy("event_type", "day")
        .parquet(out_path)
    )


def read_pruned(
    spark: SparkSession, out_path: str, event_type: str, day: str
) -> DataFrame:
    """Point-read one (event_type, day) partition; the filter must show up
    as PartitionFilters (directory pruning), not a post-scan Filter."""
    df = spark.read.parquet(out_path)
    return df.filter((F.col("event_type") == event_type) & (F.col("day") == day))


def write_ivf_layout(
    spark: SparkSession, sf_dir: str, out_path: str, n_lists: int = 8
) -> None:
    """Persist `embeddings` as an inverted-file layout: every vector assigned
    to its nearest coarse centroid, written ``partitionBy(list_id)`` — the
    lakehouse analogue of pgvector's ivfflat lists (reference
    Supabase/knowledge_base-RAG.sql:31-33). A probe then reads only its
    lists' directories (PartitionFilters), never touching the rest."""
    from ai_powered_data_pipeline_assistant_spark.operators.vector import (
        assign_lists,
        ivf_centroids,
    )

    emb = load_table(spark, sf_dir, "embeddings", parallelize=True)
    assigned = assign_lists(
        emb.select("vec_id", "label", "embedding"),
        "embedding",
        ivf_centroids(emb, n_lists),
        "list_id",
        1,
    )
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(out_path)


def ensure_ivf_layout(
    spark: SparkSession, sf_dir: str, n_lists: int = 8
) -> str:
    """Idempotently materialize the IVF layout for one sf_dir in a temp
    location; returns the path. Cached on disk across calls (_SUCCESS
    marker) — the layout is a write-once index build, not per-query work."""
    import os
    import tempfile

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(tempfile.gettempdir(), f"spark_graft_ivf_{tag}_l{n_lists}")
    if not os.path.isfile(os.path.join(out, "_SUCCESS")):
        write_ivf_layout(spark, sf_dir, out, n_lists)
    return out


def write_bucketed(
    spark: SparkSession, sf_dir: str, table_name: str, n_buckets: int = 8
) -> None:
    """Persist `orders` bucketed by o_custkey (saveAsTable — bucketing needs
    catalog metadata so readers learn the hash layout)."""
    import shutil

    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    shutil.rmtree(f"{warehouse}/{table_name}", ignore_errors=True)
    orders = load_table(spark, sf_dir, "orders")
    (
        orders.write.mode("overwrite")
        .bucketBy(n_buckets, "o_custkey")
        .sortBy("o_custkey")
        .format("parquet")
        .saveAsTable(table_name)
    )


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str
) -> DataFrame:
    """Join two tables bucketed on the same key: with compatible bucket
    counts Catalyst plans a SortMergeJoin with NO Exchange on either side —
    the shuffle happened once at write time and is amortized over every
    subsequent join. (The aggregate below also runs shuffle-free: partial
    and final HashAggregate collapse onto the bucketed scan.)

    merge-hinted so the demonstration holds at test scale too — at fact
    scale neither side broadcasts and SMJ is what Catalyst picks anyway.
    """
    left = spark.table(left_table)
    right = spark.table(right_table).groupBy("o_custkey").agg(
        F.count("*").alias("order_cnt"),
        F.round(F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0, 2).alias(
            "total_spend"
        ),
    )
    return left.hint("merge").join(right.hint("merge"), "o_custkey")
