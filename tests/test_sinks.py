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
