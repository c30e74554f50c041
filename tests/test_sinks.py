"""Write-path sinks: append / merge / update / delete (S9-S14)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.sources.sinks import ParquetTable


def _mk(spark, tmp_path, rows):
    t = ParquetTable(spark, str(tmp_path / "tbl"))
    t.init(spark.createDataFrame(rows, ["id", "val", "access_count"]))
    return t


def test_append(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a", 0), (2, "b", 0)])
    t.append(spark.createDataFrame([(3, "c", 0)], ["id", "val", "access_count"]))
    assert t.read().count() == 3


def test_merge_upsert(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a", 0), (2, "b", 0)])
    src = spark.createDataFrame([(2, "B", 9), (3, "c", 0)], ["id", "val", "access_count"])
    stats = t.merge(src, "id")
    assert stats == {"updated": 1, "inserted": 1}
    rows = {r["id"]: r["val"] for r in t.read().collect()}
    assert rows == {1: "a", 2: "B", 3: "c"}


def test_update_where_counter(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a", 5), (2, "b", 7)])
    n = t.update_where(F.col("id") == 2, {"access_count": F.col("access_count") + 1})
    assert n == 1
    rows = {r["id"]: r["access_count"] for r in t.read().collect()}
    assert rows == {1: 5, 2: 8}


def test_delete_where(spark, tmp_path):
    t = _mk(spark, tmp_path, [(1, "a", 0), (2, "b", 0), (3, "c", 0)])
    n = t.delete_where(F.col("id") < 3)
    assert n == 2
    assert [r["id"] for r in t.read().collect()] == [3]


def test_delete_where_null_predicate_rows_survive(spark, tmp_path):
    # SQL DELETE retains rows whose predicate evaluates to NULL.
    t = _mk(spark, tmp_path, [(1, "a", 0), (2, None, 0), (3, "c", 0)])
    n = t.delete_where(F.col("val") == "a")
    assert n == 1
    assert sorted(r["id"] for r in t.read().collect()) == [2, 3]


def test_merge_rejects_duplicate_source_keys(spark, tmp_path):
    import pytest

    t = _mk(spark, tmp_path, [(1, "a", 0)])
    dup = spark.createDataFrame(
        [(2, "x", 0), (2, "y", 0)], ["id", "val", "access_count"]
    )
    with pytest.raises(ValueError, match="duplicate"):
        t.merge(dup, "id")


def test_merge_stats_with_duplicate_target_keys(spark, tmp_path):
    # Duplicate TARGET keys: all matching target rows are replaced by the one
    # source row; stats count target rows updated and source rows inserted.
    t = _mk(spark, tmp_path, [(1, "a", 0), (1, "a2", 0), (2, "b", 0)])
    src = spark.createDataFrame([(1, "A", 9), (3, "c", 0)], ["id", "val", "access_count"])
    stats = t.merge(src, "id")
    assert stats == {"updated": 2, "inserted": 1}
    rows = sorted((r["id"], r["val"]) for r in t.read().collect())
    assert rows == [(1, "A"), (2, "b"), (3, "c")]
