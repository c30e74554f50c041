"""Guarded ad-hoc SQL entry point.

Parity target: reference backend/utils/sql_safety.py:51-231 — SELECT-only,
dangerous-keyword rejection, complexity caps (≤5 joins, ≤3 subqueries,
≤5000 chars), hard 1000-row cap.

Improvement over the reference: instead of regex-counting "JOIN" in the
query text, the gate parses the query with Spark's analyzer and walks the
*logical plan* — comments/strings can't fool it, and the join count is the
real one after view expansion. The row cap is enforced by wrapping the plan
in `.limit()`, so it bounds the result regardless of what the text says.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

MAX_QUERY_LEN = 5000
MAX_JOINS = 5
MAX_SUBQUERIES = 3
MAX_ROWS = 1000

# Statement-level deny list (the reference's dangerous-keyword set,
# sql_safety.py:22-41). Word-boundary regex over the raw text is the first
# cheap gate; the plan walk below is the authoritative one.
_DENY = re.compile(
    r"(?i)\b(insert|update|delete|drop|create|alter|truncate|grant|revoke|"
    r"merge|call|exec|execute|copy|vacuum|analyze|refresh|set|reset|use|"
    # Spark-specific escapes: arbitrary static-Java invocation built-ins can
    # read env vars / system properties (exfiltration) — deny outright.
    r"reflect|java_method)\b"
)
_SELECT_START = re.compile(r"(?is)^\s*(select|with)\b")

# Authoritative post-analysis deny: expression/operator names as they appear
# in the analyzed logical plan. Catches the escapes even if smuggled through
# a view definition or unusual quoting that the text regex misses.
_PLAN_DENY = re.compile(r"(?i)\b(?:reflect|java_method)\(|ScriptTransformation")


class UnsafeQueryError(ValueError):
    pass


@dataclass
class QueryStats:
    joins: int
    subqueries: int


def _plan_stats(df: DataFrame) -> QueryStats:
    """Count Join and Subquery nodes in the analyzed logical plan."""
    plan = df._jdf.queryExecution().analyzed()
    text = plan.toString()
    joins = len(re.findall(r"^[\s:+\-]*Join ", text, re.MULTILINE))
    subqueries = len(re.findall(r"Subquery|CTERelation|scalar-subquery", text))
    return QueryStats(joins=joins, subqueries=subqueries)


def safe_sql(spark: SparkSession, query: str, max_rows: int = MAX_ROWS) -> DataFrame:
    """Validate and run an ad-hoc SELECT with a hard row cap.

    Raises UnsafeQueryError on: non-SELECT, deny-listed keywords, over-long
    text, too many joins/subqueries. Tables must already be registered as
    temp views (see catalog.load_tables(register_views=True)).
    """
    if len(query) > MAX_QUERY_LEN:
        raise UnsafeQueryError(f"query longer than {MAX_QUERY_LEN} chars")
    if not _SELECT_START.match(query):
        raise UnsafeQueryError("only SELECT statements are allowed")
    if _DENY.search(query):
        raise UnsafeQueryError("query contains a forbidden keyword")
    # Scope queries to registered views: with runSQLOnFiles off, direct
    # file-path relations (parquet.`/path`, csv.`...`) fail analysis instead
    # of granting arbitrary filesystem reads. Restored after analysis.
    prev_run_on_files = spark.conf.get("spark.sql.runSQLOnFiles", "true")
    spark.conf.set("spark.sql.runSQLOnFiles", "false")
    try:
        df = spark.sql(query)
        stats = _plan_stats(df)  # forces analysis inside the guarded scope
    finally:
        spark.conf.set("spark.sql.runSQLOnFiles", prev_run_on_files)
    plan_text = df._jdf.queryExecution().analyzed().toString()
    if _PLAN_DENY.search(plan_text):
        raise UnsafeQueryError("query plan contains a forbidden operation")
    if stats.joins > MAX_JOINS:
        raise UnsafeQueryError(f"too many joins: {stats.joins} > {MAX_JOINS}")
    if stats.subqueries > MAX_SUBQUERIES:
        raise UnsafeQueryError(
            f"too many subqueries: {stats.subqueries} > {MAX_SUBQUERIES}"
        )
    return df.limit(max_rows)
