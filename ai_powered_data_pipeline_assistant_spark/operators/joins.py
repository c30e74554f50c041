"""Join operators.

Parity targets (SURVEY §2.3):
- J1 FK equi-join (users ⋈ user_sessions): reference Supabase/user_sessions.sql:3
- J4 anti-join dedup vs seen set: reference backend/services/search_service.py:175-181
- J5 arbitrary validated SQL joins: reference backend/utils/sql_safety.py:184-231
  (Catalyst picks broadcast/hash/sort-merge for free)

Scale notes: dimension tables (region/nation/customer at TPC-H shape) are
broadcast explicitly — the fact-side scan never shuffles for the dim join.
Fact-fact joins (orders ⋈ lineitem) shuffle on the join key; AQE handles
skew. Semi/anti joins are expressed as left_semi/left_anti so Catalyst can
use a broadcast hash join with only the key column shipped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ai_powered_data_pipeline_assistant_spark.catalog import load_table


def fk_join_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1-shaped FK chain: customer ⋈ nation ⋈ region, rolled up per region.

    Both dims broadcast — zero shuffle on the customer side; the final
    1-row-per-region agg is a partial agg.
    """
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    return (
        customer.join(broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(
            F.count("*").alias("customer_cnt"),
            F.round(F.sum(cents) / 100.0, 2).alias("total_acctbal"),
        )
    )


def tpch_q3(spark: SparkSession, sf_dir: str, segment: str = "BUILDING", top_n: int = 10) -> DataFrame:
    """TPC-H Q3 shipping priority: 3-way join + agg + top-N.

    customer is filtered then broadcast; orders ⋈ lineitem shuffles on
    orderkey; final top-N is TakeOrderedAndProject.
    """
    customer = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == segment)
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1995-03-15")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1995-03-15")
    price = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    revenue_units = price * (F.lit(100) - disc)  # exact int: cents * percent
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue_units) / 1e6, 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(top_n)
    )


def semi_join_active(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers having ≥1 urgent open order (left_semi: no row duplication,
    only the key travels)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.col("o_orderstatus") == "O")
    )
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name", "c_mktsegment")


def anti_join_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4: keep docs whose content hash is NOT in the already-ingested set —
    the reference's seen-URL dedup re-expressed as a distributed anti-join.

    The "seen" set here is every doc_id ≡ 0 (mod 7) (a deterministic stand-in
    for the knowledge_base table)."""
    docs = load_table(spark, sf_dir, "documents")
    seen = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.sha2("text", 256).alias("seen_hash")
    )
    return (
        docs.withColumn("content_hash", F.sha2("text", 256))
        .join(broadcast(seen), F.col("content_hash") == F.col("seen_hash"), "left_anti")
        .select("doc_id", "content_hash")
    )


def salted_skew_join(spark: SparkSession, sf_dir: str, n_salts: int = 8) -> DataFrame:
    """Explicit salting for a skew-dominated join — the manual fallback when
    AQE's skew splitting isn't available (e.g. a non-shuffle join input or a
    storage-partitioned join).

    `events` has only a handful of distinct event_type values, so joining a
    per-type dimension on event_type hash-partitions 100k+ rows onto ~4
    reducers no matter how many partitions are configured — the canonical
    skew pathology. Fix: explode the SMALL side n_salts× (one row per salt),
    add a deterministic salt (event_id % n_salts, NOT rand() — keeps
    retries/oracle deterministic) to the big side, and join on
    (key, salt) → every reducer gets ~1/n_salts of each hot key.

    Result is identical to the unsalted join; the oracle is the plain join.
    """
    events = load_table(spark, sf_dir, "events")
    type_dim = (
        events.groupBy("event_type")
        .agg(F.count("*").alias("type_total"))
    )
    dim_salted = type_dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    fact_salted = events.withColumn("salt", (F.col("event_id") % n_salts).cast("int"))
    # hint forces the shuffle join the pattern exists for — at test scale
    # Catalyst would broadcast the tiny dim and no skew would ever occur;
    # at 100 TB the dim that needs salting is precisely the one too big to
    # broadcast.
    return (
        fact_salted.join(dim_salted.hint("shuffle_hash"), ["event_type", "salt"])
        .groupBy("event_type", "type_total")
        .agg(
            F.count("*").alias("joined_cnt"),
            F.sum(F.col("user_id")).alias("user_id_sum"),
        )
    )


def asof_join(spark: SparkSession, sf_dir: str,
              left_type: str = "purchase", right_type: str = "click") -> DataFrame:
    """As-of join — for every `purchase` event, the latest same-user `click`
    at or before it. Spark has no ASOF JOIN operator; this is the standard
    composition: tag both streams, union, one per-user ordered window, and
    `last(..., ignorenulls)` carries the most recent right-side id forward.

    One shuffle on user_id total — versus the naive range-join
    (left ⋈ right ON user AND r.ts <= l.ts + per-pair max) whose
    intermediate is quadratic per user. Ordering puts the right side first
    at equal timestamps (asof is `<=`), with event_id as the deterministic
    final tie-break.
    """
    events = load_table(spark, sf_dir, "events")
    left = events.filter(F.col("event_type") == left_type).select(
        "user_id", "ts", F.lit(1).alias("is_l"),
        F.col("event_id").alias("l_id"), F.lit(None).cast("long").alias("r_id"),
    )
    right = events.filter(F.col("event_type") == right_type).select(
        "user_id", "ts", F.lit(0).alias("is_l"),
        F.lit(None).cast("long").alias("l_id"), F.col("event_id").alias("r_id"),
    )
    u = left.unionByName(right)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "is_l", F.coalesce("r_id", "l_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        u.withColumn("asof_event_id", F.last("r_id", ignorenulls=True).over(w))
        .filter(F.col("is_l") == 1)
        .select(F.col("l_id").alias("event_id"), "user_id", "ts", "asof_event_id")
    )


def range_join(spark: SparkSession, sf_dir: str, window_s: int = 300) -> DataFrame:
    """Range (interval) join — Spark has no native range-join operator
    either: for every `error` event, the same-user `view` events inside the
    following ``window_s`` seconds.

    Scale path: BUCKETED equi-join, not the naive inequality join (which
    Catalyst can only plan as a broadcast-nested-loop + filter — quadratic
    per user). Each error interval [t, t+w) is exploded onto its covered
    w-second epoch buckets (≤ 2 for a window ≤ bucket width); each view
    lands in exactly one bucket; the join is then a plain equi-join on
    (user_id, bucket) refined by the exact interval predicate. Work is
    Σ per-bucket products — linear-ish, shuffle on (user, bucket).
    """
    events = load_table(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.unix_timestamp("ts").alias("t0"),
    )
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        "user_id",
        F.unix_timestamp("ts").alias("tv"),
    )
    err_buckets = errors.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                (F.col("t0") / window_s).cast("long"),
                ((F.col("t0") + window_s - 1) / window_s).cast("long"),
            )
        ),
    )
    view_buckets = views.withColumn("bucket", (F.col("tv") / window_s).cast("long"))
    return (
        err_buckets.join(view_buckets, ["user_id", "bucket"])
        .filter((F.col("tv") >= F.col("t0")) & (F.col("tv") < F.col("t0") + window_s))
        .select("error_id", "view_id", "user_id", (F.col("tv") - F.col("t0")).alias("lag_s"))
        .distinct()
    )


def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: for each FK
    relationship, how many child rows point at a missing parent — the
    data-quality gate run after every ingest (orphans mean a broken or
    out-of-order load). Each check is a left-anti join on the key; parent
    key sets are distinct-projected first, so dimension sides broadcast
    and the fact side is scanned once per relationship with only the key
    column read (column pruning)."""
    checks = [
        ("lineitem.l_orderkey -> orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders.o_custkey -> customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey -> nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey -> nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation.n_regionkey -> region", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    out = None
    for label, child_t, child_k, parent_t, parent_k in checks:
        child = load_table(spark, sf_dir, child_t).select(F.col(child_k).alias("k"))
        parent = (
            load_table(spark, sf_dir, parent_t)
            .select(F.col(parent_k).alias("k"))
            .distinct()
        )
        row = child.join(broadcast(parent), "k", "left_anti").agg(
            F.lit(label).alias("relationship"),
            F.count("*").alias("orphan_rows"),
        )
        out = row if out is None else out.unionByName(row)
    return out.withColumn("ok", F.col("orphan_rows") == 0).orderBy("relationship")


ORACLES: dict[str, str] = {
    "fk_integrity_audit": """
        WITH u AS (
            SELECT 'lineitem.l_orderkey -> orders' AS relationship,
                   count(*) AS orphan_rows
            FROM lineitem WHERE l_orderkey NOT IN
                (SELECT o_orderkey FROM orders)
            UNION ALL
            SELECT 'orders.o_custkey -> customer', count(*)
            FROM orders WHERE o_custkey NOT IN
                (SELECT c_custkey FROM customer)
            UNION ALL
            SELECT 'customer.c_nationkey -> nation', count(*)
            FROM customer WHERE c_nationkey NOT IN
                (SELECT n_nationkey FROM nation)
            UNION ALL
            SELECT 'supplier.s_nationkey -> nation', count(*)
            FROM supplier WHERE s_nationkey NOT IN
                (SELECT n_nationkey FROM nation)
            UNION ALL
            SELECT 'nation.n_regionkey -> region', count(*)
            FROM nation WHERE n_regionkey NOT IN
                (SELECT r_regionkey FROM region))
        SELECT relationship, orphan_rows, orphan_rows = 0 AS ok
        FROM u ORDER BY relationship
    """,
    "range_join": """
        SELECT e.event_id AS error_id, v.event_id AS view_id, e.user_id,
               CAST(floor(epoch(v.ts)) AS BIGINT)
                   - CAST(floor(epoch(e.ts)) AS BIGINT) AS lag_s
        FROM events e
        JOIN events v
          ON e.user_id = v.user_id
         AND v.event_type = 'view'
         AND CAST(floor(epoch(v.ts)) AS BIGINT) >= CAST(floor(epoch(e.ts)) AS BIGINT)
         AND CAST(floor(epoch(v.ts)) AS BIGINT) < CAST(floor(epoch(e.ts)) AS BIGINT) + 300
        WHERE e.event_type = 'error'
    """,
    "asof_join": """
        WITH u AS (
            SELECT user_id, ts, 1 AS is_l, event_id AS l_id,
                   CAST(NULL AS BIGINT) AS r_id
            FROM events WHERE event_type = 'purchase'
            UNION ALL
            SELECT user_id, ts, 0, NULL, event_id
            FROM events WHERE event_type = 'click')
        SELECT l_id AS event_id, user_id, ts, asof_event_id
        FROM (
            SELECT *, last_value(r_id IGNORE NULLS) OVER (
                       PARTITION BY user_id
                       ORDER BY ts, is_l, coalesce(r_id, l_id)
                       ROWS UNBOUNDED PRECEDING) AS asof_event_id
            FROM u)
        WHERE is_l = 1
    """,
    "salted_skew_join": """
        WITH type_dim AS (
            SELECT event_type, count(*) AS type_total FROM events GROUP BY 1)
        SELECT e.event_type, d.type_total,
               count(*) AS joined_cnt,
               CAST(sum(e.user_id) AS BIGINT) AS user_id_sum
        FROM events e JOIN type_dim d ON e.event_type = d.event_type
        GROUP BY 1, 2
    """,
    "fk_join_rollup": """
        SELECT r_name AS region_name,
               count(*) AS customer_cnt,
               round(sum(CAST(round(c_acctbal*100) AS BIGINT)) / 100.0, 2) AS total_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY 1
    """,
    "tpch_q3": """
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               round(sum(CAST(round(l_extendedprice*100) AS BIGINT)
                         * (100 - CAST(round(l_discount*100) AS BIGINT))) / 1e6, 4) AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1995-03-15'
          AND l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY 1, 2, 3
        ORDER BY revenue DESC, o_orderdate, l_orderkey
        LIMIT 10
    """,
    "semi_join_active": """
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE c_custkey IN (
            SELECT o_custkey FROM orders
            WHERE o_orderpriority = '1-URGENT' AND o_orderstatus = 'O')
    """,
    "anti_join_new_docs": """
        SELECT doc_id, sha256(text) AS content_hash
        FROM documents
        WHERE sha256(text) NOT IN (
            SELECT sha256(text) FROM documents WHERE doc_id % 7 = 0)
    """,
}

QUERIES = {
    "fk_join_rollup": fk_join_rollup,
    "tpch_q3": tpch_q3,
    "semi_join_active": semi_join_active,
    "anti_join_new_docs": anti_join_new_docs,
    "salted_skew_join": salted_skew_join,
    "asof_join": asof_join,
    "range_join": range_join,
    "fk_integrity_audit": fk_integrity_audit,
}
