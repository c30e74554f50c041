"""Materialized-view manager: serve-from-cache, mtime invalidation, and
result equivalence with the live query."""

from __future__ import annotations

import shutil

from ai_powered_data_pipeline_assistant_spark.operators.aggregates import status_counts
from ai_powered_data_pipeline_assistant_spark.plans.materialize import MaterializedViews


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_mv_builds_once_and_matches_live(spark, sf_dir, tmp_path):
    mv = MaterializedViews(spark, sf_dir, str(tmp_path / "mv"))
    first = mv.read("status_counts", status_counts)
    assert mv.rebuilds == 1
    assert _rows(first) == _rows(status_counts(spark, sf_dir))
    # second read is served from parquet — no rebuild
    again = mv.read("status_counts", status_counts)
    assert mv.rebuilds == 1
    assert _rows(again) == _rows(first)


def test_mv_rebuilds_when_sources_drift(spark, sf_dir, tmp_path):
    # copy the source dir so we can touch it without modifying testdata
    src = tmp_path / "sf_copy"
    shutil.copytree(sf_dir, src)
    mv = MaterializedViews(spark, str(src), str(tmp_path / "mv2"))
    mv.read("status_counts", status_counts)
    assert mv.rebuilds == 1
    assert mv.is_fresh("status_counts")
    # drift one source file → stale → rebuild on next read
    (src / "orders.parquet").touch()
    assert not mv.is_fresh("status_counts")
    mv.read("status_counts", status_counts)
    assert mv.rebuilds == 2


def test_mv_explicit_invalidate(spark, sf_dir, tmp_path):
    mv = MaterializedViews(spark, sf_dir, str(tmp_path / "mv3"))
    mv.read("status_counts", status_counts)
    mv.invalidate("status_counts")
    assert not mv.is_fresh("status_counts")
    mv.read("status_counts", status_counts)
    assert mv.rebuilds == 2
