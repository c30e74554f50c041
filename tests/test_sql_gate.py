"""The guarded SQL entry point (reference backend/utils/sql_safety.py)."""

from __future__ import annotations

import pytest

from ai_powered_data_pipeline_assistant_spark.catalog import load_tables
from ai_powered_data_pipeline_assistant_spark.plans.sql_gate import (
    MAX_ROWS,
    UnsafeQueryError,
    safe_sql,
)


@pytest.fixture(scope="module", autouse=True)
def views(spark, sf_dir):
    load_tables(spark, sf_dir, register_views=True)


def test_select_allowed(spark):
    df = safe_sql(spark, "SELECT o_orderstatus, count(*) AS c FROM orders GROUP BY 1")
    assert df.count() > 0


def test_join_allowed_within_limit(spark):
    df = safe_sql(
        spark,
        "SELECT count(*) AS c FROM customer JOIN nation ON c_nationkey = n_nationkey",
    )
    assert df.count() == 1


@pytest.mark.parametrize(
    "bad",
    [
        "INSERT INTO orders VALUES (1)",
        "DROP TABLE orders",
        "SELECT 1; DROP TABLE orders",
        "WITH x AS (SELECT 1) UPDATE orders SET o_orderkey = 1",
        "DELETE FROM orders",
        "",
        "   ",
    ],
)
def test_non_select_rejected(spark, bad):
    with pytest.raises(UnsafeQueryError):
        safe_sql(spark, bad)


def test_too_many_joins_rejected(spark):
    q = "SELECT count(*) FROM orders a " + " ".join(
        f"JOIN orders {c} ON a.o_orderkey = {c}.o_orderkey" for c in "bcdefg"
    )
    with pytest.raises(UnsafeQueryError, match="joins"):
        safe_sql(spark, q)


def test_too_long_rejected(spark):
    with pytest.raises(UnsafeQueryError, match="longer"):
        safe_sql(spark, "SELECT " + "1+" * 3000 + "1")


def test_row_cap(spark):
    assert safe_sql(spark, "SELECT * FROM lineitem").count() == MAX_ROWS


@pytest.mark.parametrize(
    "bad",
    [
        "SELECT reflect('java.lang.System', 'getenv', 'PATH')",
        "SELECT java_method('java.lang.System', 'getProperty', 'user.dir')",
    ],
)
def test_java_escape_builtins_rejected(spark, bad):
    with pytest.raises(UnsafeQueryError):
        safe_sql(spark, bad)


def test_file_path_relation_rejected(spark, sf_dir):
    # Direct file-source relations bypass the registered-view scope; with
    # runSQLOnFiles disabled during analysis they fail table resolution.
    with pytest.raises(Exception):
        safe_sql(spark, f"SELECT * FROM parquet.`{sf_dir}/orders.parquet`")


def test_run_on_files_conf_restored(spark, sf_dir):
    before = spark.conf.get("spark.sql.runSQLOnFiles", "true")
    safe_sql(spark, "SELECT 1 AS one")
    assert spark.conf.get("spark.sql.runSQLOnFiles", "true") == before
