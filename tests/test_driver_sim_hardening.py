"""The local driver sim must be at least as strict as the real driver:
round 2 shipped 8 red rows because the sim normalized away HUGEINT oracle
columns and array-typed Spark outputs. These tests pin the rejection of
both classes (VERDICT r2 "What's wrong" #3 done-criterion)."""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, ".")

from scripts.driver_sim import driver_representable  # noqa: E402


def test_uncast_sum_is_rejected(spark):
    """A deliberately uncast integer sum() (HUGEINT in DuckDB) must flag."""
    rel = duckdb.connect().sql("SELECT sum(x) AS s FROM (VALUES (1), (2)) t(x)")
    df = spark.range(1).selectExpr("CAST(3 AS BIGINT) AS s")
    problems = driver_representable(df, rel)
    assert problems and "HUGEINT" in problems[0], problems


def test_cast_sum_passes(spark):
    rel = duckdb.connect().sql(
        "SELECT CAST(sum(x) AS BIGINT) AS s FROM (VALUES (1), (2)) t(x)"
    )
    df = spark.range(1).selectExpr("CAST(3 AS BIGINT) AS s")
    assert driver_representable(df, rel) == []


def test_array_output_is_rejected(spark):
    """An array-typed Spark output column (driver canonicalizer crash) must
    flag even when the oracle side is scalar."""
    rel = duckdb.connect().sql("SELECT 'a,b' AS keys")
    df = spark.range(1).selectExpr("array('a', 'b') AS keys")
    problems = driver_representable(df, rel)
    assert problems and "array" in problems[0], problems


def test_driver_window_entries_all_have_oracles():
    """Every driver-window slot must carry an oracle: a rows-only entry in
    the window lands a guaranteed-red ``no_oracle`` verdict (round 5 burned
    two slots this way — VERDICT r5 next-round #2). Schema
    representability is additionally gated by ``driver_sim.py --window``,
    which builds the frames; this metadata half runs on every pytest."""
    from ai_powered_data_pipeline_assistant_spark import registry

    oracles = registry.all_oracles()
    missing = [n for n in registry._DRIVER_WINDOW if n not in oracles]
    assert missing == [], (
        f"driver-window entries without oracles (slot burned on red): {missing}"
    )
