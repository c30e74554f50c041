"""Two-phase global rank helper: ranks must equal the single-window
row_number for any bucket count, and the plan must carry the range
repartition (the parallel phase) instead of funnelling the frame through
one unpartitioned window."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.operators.ranking import (
    append_global_rank,
)


def _naive(df, order_cols):
    return {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order_cols))
        ).collect()
    }


def test_matches_single_window_rank(spark):
    df = spark.range(500).select(
        F.col("id"), (F.col("id") * 37 % 101).alias("v")
    )
    order = [F.desc("v"), F.asc("id")]
    got = {
        r["id"]: r["rank"]
        for r in append_global_rank(df, order, "rank").collect()
    }
    assert got == _naive(df, order)


def test_rank_is_total_and_stable_across_bucket_counts(spark):
    df = spark.range(300).select(F.col("id"), (F.col("id") % 7).alias("v"))
    order = [F.asc("v"), F.asc("id")]  # tie-broken → deterministic
    for buckets in (1, 4, 64):
        got = sorted(
            r["rank"]
            for r in append_global_rank(df, order, "rank", buckets=buckets).collect()
        )
        assert got == list(range(1, 301))
        assert {
            r["id"]: r["rank"]
            for r in append_global_rank(df, order, "rank", buckets=buckets).collect()
        } == _naive(df, order)


def test_plan_uses_range_partitioning_not_single_window(spark):
    df = spark.range(100).select(F.col("id"), (F.col("id") % 5).alias("v"))
    ranked = append_global_rank(df, [F.asc("v"), F.asc("id")], "rank")
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.lower(), plan


def test_empty_frame(spark):
    df = spark.range(0).select(F.col("id"), F.col("id").alias("v"))
    assert append_global_rank(df, [F.asc("v"), F.asc("id")], "rank").count() == 0
