"""Relational scan / project / filter / sort / limit / pagination operators.

Parity targets (SURVEY §2.1, §2.2, §2.6):
- projection field lists: reference backend/db/optimized_queries.py:40-42
- optional equality filters: reference backend/db/optimized_queries.py:45-53
- keyset (cursor) pagination `id < before_id`: reference
  backend/db/optimized_queries.py:126-128
- offset pagination `range(start, end)`: reference
  backend/db/optimized_queries.py:56-63
- newest-N scan: reference backend/api/routes/logs.py:37
- multi-key sort with enum rank map: reference app/state_manager.py:59-77
- id→string normalization: reference backend/db/optimized_queries.py:68-70

Scale notes: all filters/projections are declarative → Catalyst pushes them
into the parquet scan (PushedFilters/ReadSchema). Top-N sorts compile to
TakeOrderedAndProject (per-partition heap + driver merge — no global sort
shuffle). Offset pagination needs a global ordering and is implemented with
a single-partition window only for the requested page; keyset pagination is
the scale-safe variant, same conclusion the reference reached
("cursor-based pagination", optimized_queries.py:101).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table

# Priority rank map à la reference app/state_manager.py:28-33
# (status → sort priority), applied to o_orderpriority.
_PRIORITY_RANKS = {
    "1-URGENT": 0,
    "2-HIGH": 1,
    "3-MEDIUM": 2,
    "4-NOT SPECIFIED": 3,
    "5-LOW": 4,
}


def scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1/S2/F14: explicit field-list projection + id→string cast."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        F.col("o_orderkey").cast("string").alias("id"),
        F.col("o_custkey").alias("cust_id"),
        F.col("o_orderstatus").alias("status"),
        F.col("o_totalprice").alias("total_price"),
        F.col("o_orderdate").alias("created_at"),
    )


def filter_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1/P2: conditional equality-filter conjunction (status + priority)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(
        (F.col("o_orderstatus") == "F") & (F.col("o_orderpriority") == "1-URGENT")
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")


def keyset_page(
    spark: SparkSession, sf_dir: str, before_id: int = 7500, page_size: int = 100
) -> DataFrame:
    """P4/O2: keyset pagination — filter below cursor, newest-first, limit.

    Scale: pure filter + TakeOrderedAndProject; no global sort, no offset
    skip. This is the pagination pattern that survives 100 TB.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_orderkey") < before_id)
        .orderBy(F.desc("o_orderkey"))
        .limit(page_size)
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    )


def offset_page(
    spark: SparkSession, sf_dir: str, start: int = 100, page_size: int = 50
) -> DataFrame:
    """O1: offset pagination via row_number over a global order.

    Deliberately the anti-pattern variant the reference also supports
    (range(start, end)); rank runs over (date DESC, key DESC) with a unique
    tie-break so the page is deterministic. Kept to one window over a
    TakeOrdered-prefiltered frame: limit(start+size) first so only the
    needed prefix is globally sorted.
    """
    orders = load_table(spark, sf_dir, "orders")
    order_cols = [F.desc("o_orderdate"), F.desc("o_orderkey")]
    prefix = orders.orderBy(*order_cols).limit(start + page_size)
    w = Window.orderBy(*order_cols)
    return (
        prefix.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > start) & (F.col("rn") <= start + page_size))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    )


def newest_n(spark: SparkSession, sf_dir: str, n: int = 100) -> DataFrame:
    """S3/O3: logs-style newest-N scan (events as the log stream)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.orderBy(F.desc("ts"), F.desc("event_id"))
        .limit(n)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


def multikey_sort(spark: SparkSession, sf_dir: str, n: int = 200) -> DataFrame:
    """O6/F15: enum-rank-mapped multi-key sort (rank, date, key)."""
    orders = load_table(spark, sf_dir, "orders")
    rank = F.lit(None).cast("int")
    expr = None
    for name, r in _PRIORITY_RANKS.items():
        expr = (
            F.when(F.col("o_orderpriority") == name, r)
            if expr is None
            else expr.when(F.col("o_orderpriority") == name, r)
        )
    rank = expr.otherwise(99)
    return (
        orders.withColumn("priority_rank", rank)
        .orderBy("priority_rank", "o_orderdate", "o_orderkey")
        .limit(n)
        .select("o_orderkey", "o_orderpriority", "priority_rank", "o_orderdate")
    )


def point_lookup(spark: SparkSession, sf_dir: str, order_key: int = 100) -> DataFrame:
    """S5: primary-key point lookup (predicate reaches the parquet scan as
    PushedFilters → row-group pruning via min/max stats)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") == order_key).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


def chat_display_page(spark: SparkSession, sf_dir: str, n: int = 50) -> DataFrame:
    """O2: newest-N fetched descending, then re-sorted ascending for display
    (the reference fetches DESC + client-side reverse(),
    optimized_queries.py:131-139). Spark shape: TakeOrdered for the page,
    then a cheap re-sort of N rows."""
    events = load_table(spark, sf_dir, "events")
    page = events.orderBy(F.desc("ts"), F.desc("event_id")).limit(n)
    return page.orderBy("ts", "event_id").select("event_id", "ts", "event_type")


_INVENTORY_TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def table_inventory(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Catalog inventory: one row per registered table with its row and
    column counts — the first query anyone runs against a new deployment
    (and the freshness check a scheduler runs after each load). Ten 1-row
    count aggregates unioned; each count is a metadata-cheap scan (column
    pruning reduces it to a rowcount over parquet footers)."""
    out = None
    for t in _INVENTORY_TABLES:
        df = load_table(spark, sf_dir, t)
        row = df.agg(
            F.lit(t).alias("table_name"),
            F.count("*").alias("n_rows"),
            F.lit(len(df.columns)).cast("long").alias("n_cols"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("table_name")


ORACLES: dict[str, str] = {
    "table_inventory": " UNION ALL ".join(
        f"SELECT '{t}' AS table_name, count(*) AS n_rows, "
        f"(SELECT count(*) FROM (DESCRIBE SELECT * FROM {t})) AS n_cols "
        f"FROM {t}"
        for t in _INVENTORY_TABLES
    )
    + " ORDER BY table_name",
    "scan_project": """
        SELECT CAST(o_orderkey AS VARCHAR) AS id,
               o_custkey AS cust_id,
               o_orderstatus AS status,
               o_totalprice AS total_price,
               o_orderdate AS created_at
        FROM orders
    """,
    "filter_eq": """
        SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        FROM orders
        WHERE o_orderstatus = 'F' AND o_orderpriority = '1-URGENT'
    """,
    "keyset_page": """
        SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderdate
        FROM orders
        WHERE o_orderkey < 7500
        ORDER BY o_orderkey DESC
        LIMIT 100
    """,
    "offset_page": """
        SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
        FROM orders
        ORDER BY o_orderdate DESC, o_orderkey DESC
        LIMIT 50 OFFSET 100
    """,
    "newest_n": """
        SELECT event_id, ts, user_id, event_type, value
        FROM events
        ORDER BY ts DESC, event_id DESC
        LIMIT 100
    """,
    "multikey_sort": """
        SELECT o_orderkey, o_orderpriority,
               CASE o_orderpriority
                    WHEN '1-URGENT' THEN 0 WHEN '2-HIGH' THEN 1
                    WHEN '3-MEDIUM' THEN 2 WHEN '4-NOT SPECIFIED' THEN 3
                    WHEN '5-LOW' THEN 4 ELSE 99 END AS priority_rank,
               o_orderdate
        FROM orders
        ORDER BY priority_rank, o_orderdate, o_orderkey
        LIMIT 200
    """,
    "point_lookup": """
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_orderkey = 100
    """,
    "chat_display_page": """
        SELECT event_id, ts, event_type FROM (
            SELECT event_id, ts, event_type
            FROM events ORDER BY ts DESC, event_id DESC LIMIT 50)
        ORDER BY ts, event_id
    """,
}

QUERIES = {
    "table_inventory": table_inventory,
    "scan_project": scan_project,
    "filter_eq": filter_eq,
    "keyset_page": keyset_page,
    "offset_page": offset_page,
    "newest_n": newest_n,
    "multikey_sort": multikey_sort,
    "point_lookup": point_lookup,
    "chat_display_page": chat_display_page,
}
