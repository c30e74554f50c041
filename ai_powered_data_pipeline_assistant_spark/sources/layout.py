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


def _bucketed_table(
    spark: SparkSession, sf_dir: str, source: str, bucket_col: str,
    n_buckets: int = 8,
) -> str:
    """Idempotently materialize one source table bucketed on ``bucket_col``
    (saveAsTable — bucketing needs catalog metadata so readers learn the
    hash layout). External-path under /tmp so the repo tree stays clean; the
    write is a once-per-layout index build, skipped when the catalog already
    knows the table."""
    import os
    import tempfile

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    name = f"bkt_{source}_{tag}_{n_buckets}"
    if spark.catalog.tableExists(name):
        return name
    path = os.path.join(tempfile.gettempdir(), "spark_graft_bucketed", name)
    df = load_table(spark, sf_dir, source)
    (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, bucket_col)
        .sortBy(bucket_col)
        .option("path", path)
        .format("parquet")
        .saveAsTable(name)
    )
    return name


def bucketed_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located FK join: customer and orders both bucketed (8 buckets) on
    the customer key, joined WITHOUT any Exchange — the shuffle happened
    once at write time and is amortized over every subsequent join, which is
    how a 100 TB fact table joins its dimensions daily without re-shuffling
    100 TB daily. The per-customer aggregate also runs shuffle-free: the
    groupBy key is the bucket column, so partial and final HashAggregate
    collapse onto the bucketed scan (plan-asserted: zero Exchange anywhere
    in tests/test_plans.py).

    merge-hinted so the demonstration holds at test scale too — at fact
    scale neither side broadcasts and SMJ is what Catalyst picks anyway."""
    cust_t = _bucketed_table(spark, sf_dir, "customer", "c_custkey")
    orders_t = _bucketed_table(spark, sf_dir, "orders", "o_custkey")
    cust = spark.table(cust_t).select("c_custkey", "c_name", "c_nationkey")
    orders = spark.table(orders_t)
    joined = cust.hint("merge").join(
        orders.hint("merge"), cust.c_custkey == orders.o_custkey
    )
    return joined.groupBy("c_custkey", "c_name").agg(
        F.count("*").alias("order_cnt"),
        F.round(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")) / 100.0, 2
        ).alias("total_spend"),
    )


def events_partition_pruned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-pruned point read: events laid out partitionBy(event_type,
    day), then one (event_type, day) slice read back. The filter must prune
    at planning time (PartitionFilters in the scan, plan-asserted) — the
    directory layout is the lakehouse replacement for the reference's
    B-tree indexes on (event_type, created_at). The layout build is a
    write-once index; reads open ONLY the matching directory."""
    import os
    import tempfile

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(tempfile.gettempdir(), f"spark_graft_evpart_{tag}")
    if not os.path.isfile(os.path.join(out, "_SUCCESS")):
        write_partitioned_events(spark, sf_dir, out)
    pruned = read_pruned(spark, out, "click", "2024-01-01")
    return pruned.select("event_id", "user_id", "ts")


ORACLES: dict[str, str] = {
    "bucketed_join_rollup": """
        SELECT c_custkey, c_name,
               count(*) AS order_cnt,
               round(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                     / 100.0, 2) AS total_spend
        FROM customer JOIN orders ON c_custkey = o_custkey
        GROUP BY 1, 2
    """,
    "events_partition_pruned": """
        SELECT event_id, user_id, ts
        FROM events
        WHERE event_type = 'click' AND CAST(ts AS DATE) = DATE '2024-01-01'
    """,
}

QUERIES = {
    "bucketed_join_rollup": bucketed_join_rollup,
    "events_partition_pruned": events_partition_pruned,
}
