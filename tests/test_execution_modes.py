"""The SPARK_GRAFT_MATERIALIZE session policy (execution.materialize) must
be output-invisible: every mode — local_checkpoint (default), reliable
checkpoint, persist, none — yields identical results on the barrier-heavy
operators, and the barrier escape (require_barrier) must hold in
lineage-keeping modes (the exceptAll Catalyst workaround and the iterative
plan-size budgets depend on it)."""

from __future__ import annotations

import os

import pytest

from ai_powered_data_pipeline_assistant_spark.execution import materialize

MODES = ("local_checkpoint", "checkpoint", "persist", "none")


@pytest.fixture()
def set_mode(monkeypatch):
    def _set(mode: str) -> None:
        monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", mode)

    return _set


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_invalid_mode_raises(spark, set_mode):
    set_mode("bogus")
    with pytest.raises(ValueError, match="SPARK_GRAFT_MATERIALIZE"):
        materialize(spark.range(1))


@pytest.mark.parametrize("mode", MODES)
def test_modes_output_identical_on_barrier_pipeline(
    mode, spark, sf_dir, set_mode
):
    """neardup_clusters exercises the full barrier stack: LSH postings
    materialize, pointer-doubling loop barriers, component labels."""
    from ai_powered_data_pipeline_assistant_spark.operators.neardup_cluster import (
        neardup_clusters,
    )

    set_mode("local_checkpoint")
    want = _rows(neardup_clusters(spark, sf_dir))
    set_mode(mode)
    assert _rows(neardup_clusters(spark, sf_dir)) == want


def test_persist_mode_barrier_site_truncates_lineage(spark, set_mode, tmp_path):
    """require_barrier must checkpoint (truncate lineage) even under
    persist mode: the returned plan no longer embeds the upstream DAG."""
    set_mode("persist")
    os.environ["SPARK_GRAFT_CHECKPOINT_DIR"] = str(tmp_path / "ckpt")
    try:
        base = spark.range(100).selectExpr("id", "id % 7 AS k")
        out = materialize(base.groupBy("k").count(), require_barrier=True)
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        # a checkpointed frame scans an RDD; a persisted one would still
        # show the aggregate over the range source
        assert "LogicalRDD" in plan, plan
        # non-barrier persist keeps lineage (recomputable after loss)
        kept = materialize(base.groupBy("k").count())
        kept_plan = kept._jdf.queryExecution().optimizedPlan().toString()
        assert "LogicalRDD" not in kept_plan, kept_plan
        kept.unpersist()
    finally:
        os.environ.pop("SPARK_GRAFT_CHECKPOINT_DIR", None)
