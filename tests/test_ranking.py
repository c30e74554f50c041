"""Size-adaptive global rank helper: ranks must equal the single-window
row_number for any bucket count (forcing the two-phase path via n_rows),
the plan must carry the range repartition when the two-phase path engages
and must NOT when the frame is measured small, and the adaptive switch
must be output-invisible."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.operators.ranking import (
    SINGLE_REDUCER_MAX_ROWS,
    append_global_rank,
)

FORCE_TWO_PHASE = SINGLE_REDUCER_MAX_ROWS + 1


def _naive(df, order_cols):
    return {
        r["id"]: r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order_cols))
        ).collect()
    }


def test_two_phase_matches_single_window_rank(spark):
    df = spark.range(500).select(
        F.col("id"), (F.col("id") * 37 % 101).alias("v")
    )
    order = [F.desc("v"), F.asc("id")]
    got = {
        r["id"]: r["rank"]
        for r in append_global_rank(
            df, order, "rank", n_rows=FORCE_TWO_PHASE
        ).collect()
    }
    assert got == _naive(df, order)


def test_adaptive_paths_agree(spark):
    df = spark.range(300).select(F.col("id"), (F.col("id") % 7).alias("v"))
    order = [F.asc("v"), F.asc("id")]  # tie-broken → deterministic
    small = {
        r["id"]: r["rank"] for r in append_global_rank(df, order, "rank").collect()
    }
    big = {
        r["id"]: r["rank"]
        for r in append_global_rank(
            df, order, "rank", n_rows=FORCE_TWO_PHASE
        ).collect()
    }
    assert small == big == _naive(df, order)


def test_rank_is_total_and_stable_across_bucket_counts(spark):
    df = spark.range(300).select(F.col("id"), (F.col("id") % 7).alias("v"))
    order = [F.asc("v"), F.asc("id")]
    for buckets in (1, 4, 64):
        ranked = append_global_rank(
            df, order, "rank", buckets=buckets, n_rows=FORCE_TWO_PHASE
        )
        got = sorted(r["rank"] for r in ranked.collect())
        assert got == list(range(1, 301))


def test_plan_switches_on_measured_size(spark):
    df = spark.range(100).select(F.col("id"), (F.col("id") % 5).alias("v"))
    order = [F.asc("v"), F.asc("id")]
    big = append_global_rank(df, order, "rank", n_rows=FORCE_TWO_PHASE)
    # the range repartition is pinned behind a localCheckpoint (so the two
    # consuming subtrees can never sample different boundaries): the
    # downstream plan reads the checkpointed RDD, and the range shuffle
    # lives in the checkpoint's own lineage
    big_plan = big._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in big_plan and "_rank_bucket" in big_plan, big_plan
    ckpt_plan = big._jdf.queryExecution().analyzed().toString()
    assert "_rank_bucket" in ckpt_plan, ckpt_plan
    small_plan = (
        append_global_rank(df, order, "rank", n_rows=100)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "rangepartitioning" not in small_plan.lower(), small_plan
    assert "SinglePartition" in small_plan, small_plan


def test_empty_frame(spark):
    df = spark.range(0).select(F.col("id"), F.col("id").alias("v"))
    assert append_global_rank(df, [F.asc("v"), F.asc("id")], "rank").count() == 0


def test_watermark_planner_two_phase_path_matches_single_window(spark, sf_dir, monkeypatch):
    """`watermark_planner`'s running max switches to the bucketed two-phase
    prefix pattern past SINGLE_REDUCER_MAX_ROWS; forcing the threshold to 0
    must produce byte-identical candidate rows to the plain single-window
    path (the adaptive switch is output-invisible)."""
    import ai_powered_data_pipeline_assistant_spark.operators.ranking as ranking
    from ai_powered_data_pipeline_assistant_spark.operators.windows import (
        watermark_planner,
    )

    small = [tuple(r) for r in watermark_planner(spark, sf_dir).collect()]
    monkeypatch.setattr(ranking, "SINGLE_REDUCER_MAX_ROWS", 0)
    big = [tuple(r) for r in watermark_planner(spark, sf_dir).collect()]
    assert small == big
    assert len(small) > 0
