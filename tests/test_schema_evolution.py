"""Schema-evolution and nested-schema-pruning behavior — the two parquet
properties long-lived 100 TB tables depend on: old files must stay
readable as columns are added, and scans of one nested field must not
deserialize whole structs."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_merge_schema_reads_mixed_file_versions(spark, tmp_path):
    """v2 files add a column; mergeSchema serves the union schema with
    NULLs for v1 rows — no rewrite of old files."""
    path = str(tmp_path / "evolving")
    spark.range(10).select(
        F.col("id"), (F.col("id") * 2).alias("value")
    ).write.mode("overwrite").parquet(path)
    spark.range(10, 20).select(
        F.col("id"),
        (F.col("id") * 2).alias("value"),
        F.lit("v2").alias("source_tag"),
    ).write.mode("append").parquet(path)
    df = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(df.columns) == {"id", "value", "source_tag"}
    assert df.count() == 20
    assert df.filter(F.col("source_tag").isNull()).count() == 10
    assert df.filter(F.col("source_tag") == "v2").count() == 10


def test_nested_field_pruning_in_read_schema(spark, tmp_path):
    """Selecting one nested field must prune the ReadSchema to that leaf —
    reading a whole struct for one member is the nested-data scale bug."""
    path = str(tmp_path / "nested")
    spark.range(100).select(
        F.col("id"),
        F.struct(
            (F.col("id") % 7).alias("a"),
            (F.col("id") % 11).alias("b"),
            F.repeat(F.lit("x"), 100).alias("fat"),
        ).alias("meta"),
    ).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path).select("id", F.col("meta.a").alias("a"))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    read_schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    assert "a" in read_schema
    assert "fat" not in read_schema, read_schema
    assert df.agg(F.sum("a")).first()[0] == sum(i % 7 for i in range(100))
