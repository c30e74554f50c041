"""Physical layout: partition pruning and shuffle-free bucketed joins —
the plan-level proof that layout replaces the reference's B-tree indexes.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table
from ai_powered_data_pipeline_assistant_spark.sources.layout import (
    bucketed_join_rollup,
    read_pruned,
    write_partitioned_events,
)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_partition_pruning(spark, sf_dir, tmp_path):
    out = str(tmp_path / "events_part")
    write_partitioned_events(spark, sf_dir, out)

    # pick a (type, day) that exists
    sample = (
        load_table(spark, sf_dir, "events")
        .select("event_type", F.to_date("ts").alias("day"))
        .first()
    )
    df = read_pruned(spark, out, sample["event_type"], str(sample["day"]))
    plan = _plan(df)
    # both predicates must be PartitionFilters (directory pruning), leaving
    # nothing for a row-level Filter over data columns
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" in pf and "day" in pf, plan

    # pruned read returns exactly the rows a full-scan filter would
    expected = (
        load_table(spark, sf_dir, "events")
        .filter(
            (F.col("event_type") == sample["event_type"])
            & (F.to_date("ts") == sample["day"])
        )
        .count()
    )
    assert df.count() == expected > 0


def test_ivf_layout_prunes_partitions(spark, sf_dir):
    """The IVF probe must reach the layout scan as PartitionFilters
    (list_id IN ...) — only probed lists' directories are opened, the
    ivfflat I/O shape — and the pruned result must equal the logical
    (unpartitioned) IVF query exactly."""
    from ai_powered_data_pipeline_assistant_spark.operators.vector import (
        ann_ivf_pruned,
        ann_ivf_topk,
    )

    df = ann_ivf_pruned(spark, sf_dir)
    plan = _plan(df)
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "list_id" in pf and "IN" in pf.upper(), plan

    got = sorted(map(tuple, df.collect()))
    want = sorted(map(tuple, ann_ivf_topk(spark, sf_dir).collect()))
    assert got == want


def test_bucketed_join_has_no_exchange(spark, sf_dir):
    """Zero Exchange anywhere: not on either join side (bucket layout
    replaces the shuffle) and not for the per-customer aggregate (groupBy
    key == bucket column). Values must equal the plain shuffled join."""
    joined = bucketed_join_rollup(spark, sf_dir)
    plan = _plan(joined)
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    want = (
        customer.join(orders, customer.c_custkey == orders.o_custkey)
        .groupBy("c_custkey")
        .agg(F.count("*").alias("order_cnt"))
    )
    got = {(r["c_custkey"], r["order_cnt"]) for r in joined.collect()}
    assert got == {(r["c_custkey"], r["order_cnt"]) for r in want.collect()}
