"""Aggregation operators.

Parity targets (SURVEY §2.4):
- A1 group-by status counts: reference backend/mcp/mcp_server.py:250-256
- A2 multi-dim counters (cube candidate): reference backend/core/monitoring.py:28-66
- A3/A4 grouped count/avg/min/max/sum stats: reference
  backend/core/performance_monitoring.py:104-290
- A6 data-quality metrics (completeness/uniqueness/…): reference
  backend/tools/data_tools.py:64-110 (mocked there; real here)
- A7 rate-window counts: reference backend/core/guardrails.py:23-37

Cross-engine float exactness: double sums depend on summation order, which
differs between engines and between Spark partitions run-to-run. Every SUM /
AVG over a double column is therefore computed on a fixed-point int64 view
(`round(x * 100)` cents) and scaled back at the end — order-independent,
bit-exact in both engines, and still fully JVM-side partial aggregation
(map-side combine → final merge; no extra shuffle vs the naive plan).

Scale notes: groupBy on low-cardinality keys is the textbook partial-agg
case — the shuffle carries one row per (partition, key). The quality-metrics
op aggregates a whole table to ONE row; countDistinct is the only
shuffle-heavy part and uses a two-level exact distinct (Spark expands
grouping sets internally). At 100 TB swap exact distinct for HLL
(`approx_count_distinct`) — provided as `quality_metrics_approx`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table
from ai_powered_data_pipeline_assistant_spark.functions.hashing import (
    md5_int,
    md5_int_sql,
)


def _cents(col: str) -> F.Column:
    return F.round(F.col(col) * 100).cast("long")


def status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: task-status breakdown ≙ orders by status."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count("*").alias("cnt")
    )


def multidim_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: counters keyed by (server_type, tool, status) ≙ 3-dim group."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(
        F.col("event_type"),
        (F.col("user_id") % 10).alias("user_shard"),
        F.to_date("ts").alias("day"),
    ).agg(F.count("*").alias("cnt"))


def cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 as the natural cube: all subtotal combinations in one pass."""
    events = load_table(spark, sf_dir, "events")
    return events.cube(
        F.col("event_type"), (F.col("user_id") % 5).alias("user_shard")
    ).agg(F.count("*").alias("cnt"))


def rollup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals (region → nation) in one pass via rollup —
    the grouping-sets shape A2's counters imply but the reference computes
    with separate dict scans."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.rollup(
        F.col("r_name").alias("region_name"), F.col("n_name").alias("nation_name")
    ).agg(F.count("*").alias("cnt"))


def grouped_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A4: per-group count / avg / min / max / sum over a metric column."""
    events = load_table(spark, sf_dir, "events")
    cents = _cents("value")
    return events.groupBy("event_type").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum(cents) / F.lit(100.0), 4).alias("total_value"),
        F.round(F.sum(cents) / (F.count("*") * F.lit(100.0)), 4).alias("avg_value"),
        F.round(F.min(cents) / F.lit(100.0), 4).alias("min_value"),
        F.round(F.max(cents) / F.lit(100.0), 4).alias("max_value"),
    )


def quality_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6: real data-quality metrics over `documents` (one summary row).

    completeness = non-null rate, uniqueness = distinct rate, plus length
    stats — the contract the reference mocks in data_tools.py:64-110.
    """
    docs = load_table(spark, sf_dir, "documents")
    n = F.count("*")
    return docs.agg(
        n.alias("row_cnt"),
        F.round(F.sum(F.col("text").isNotNull().cast("long")) / n.cast("double"), 6).alias(
            "text_completeness"
        ),
        F.round(F.count_distinct(F.col("text")) / n.cast("double"), 6).alias(
            "text_uniqueness"
        ),
        F.round(F.sum(F.col("lang").isin("en", "de", "fr", "es", "zh").cast("long"))
                / n.cast("double"), 6).alias("lang_consistency"),
        F.sum(F.col("n_chars")).alias("total_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


def quality_metrics_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB variant: HLL distinct instead of exact (no oracle — sketch)."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.count("*")
    return docs.agg(
        n.alias("row_cnt"),
        F.approx_count_distinct("text").alias("approx_distinct_text"),
    )


def quality_metrics_approx_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-scorable audit of the HLL path: the sketch estimate must land
    within 10% of the exact distinct count (HLL++ default rsd 5%). The
    oracle recomputes row_cnt / distinct_text exactly and asserts the
    engine's accuracy claim as a boolean."""
    docs = load_table(spark, sf_dir, "documents")
    agg = docs.agg(
        F.count("*").alias("row_cnt"),
        F.count_distinct("text").alias("exact_distinct"),
        F.approx_count_distinct("text").alias("approx_distinct"),
    )
    return agg.select(
        "row_cnt",
        F.col("exact_distinct").alias("distinct_text"),
        (
            F.abs(F.col("approx_distinct") - F.col("exact_distinct"))
            <= F.greatest(F.lit(2.0), F.col("exact_distinct").cast("double") * 0.1)
        ).alias("within_tol"),
    )


def distinct_users_approx_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group HLL audit (the `distinct_users_approx` pin from
    tests/test_vector_quality.py as a driver-checkable query): estimate
    within max(2, 10%) of exact for every event type."""
    events = load_table(spark, sf_dir, "events")
    per = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("distinct_users"),
        F.approx_count_distinct("user_id").alias("approx_distinct"),
    )
    return per.select(
        "event_type",
        "distinct_users",
        (
            F.abs(F.col("approx_distinct") - F.col("distinct_users"))
            <= F.greatest(F.lit(2.0), F.col("distinct_users").cast("double") * 0.1)
        ).alias("within_tol"),
    )


KANON_K = 30


def kanon_report(spark: SparkSession, sf_dir: str, k: int = KANON_K) -> DataFrame:
    """k-anonymity aggregate suppression — the privacy-preserving report
    shape for user-level data: per-(event_type, cohort) counts are published
    only when the cohort holds ≥ k events; smaller cohorts merge into one
    `__suppressed__` bucket per event type so totals still reconcile.
    Two cheap aggregations (map-side combined), no row-level data leaves
    the executors."""
    events = load_table(spark, sf_dir, "events")
    g = events.groupBy(
        "event_type", (F.col("user_id") % 50).alias("cohort_raw")
    ).agg(F.count("*").alias("cnt"))
    bucketed = g.select(
        "event_type",
        F.when(F.col("cnt") >= k, F.col("cohort_raw").cast("string"))
        .otherwise(F.lit("__suppressed__"))
        .alias("cohort"),
        "cnt",
    )
    return bucketed.groupBy("event_type", "cohort").agg(
        F.sum("cnt").alias("event_cnt"),
        F.count("*").alias("merged_cohorts"),
    )


def grouping_sets_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form behind cube/rollup): totals
    by (status, priority), by status alone, and grand total — one scan, one
    shuffle, versus three unioned aggregations."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_gs_orders")
    return spark.sql(
        """
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               count(*) AS cnt
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
        """
    )


def pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: event counts per user shard with one column per event type.
    Spark's groupBy().pivot() with an EXPLICIT value list — without it the
    engine runs an extra distinct-scan to discover the columns, and the
    output schema becomes data-dependent (a schema-stability bug at scale)."""
    events = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    pivoted = (
        events.groupBy((F.col("user_id") % 10).alias("user_shard"))
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )
    # prefix the data-derived column names (SQL-reserved words like `view`
    # make unprefixed pivots fragile downstream)
    return pivoted.select(
        "user_shard", *[F.col(t).alias(f"evt_{t}") for t in types]
    )


def distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-count per group (no reference parity row — the engine
    capability behind uniqueness metrics). Expands to two-phase aggregation:
    partial distinct on (type, user) then final count — shuffle bounded by
    the distinct pair count, not the event count."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("distinct_users"),
        F.count("*").alias("event_cnt"),
    )


def distinct_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """100 TB variant: HyperLogLog++ sketch (`approx_count_distinct`,
    default 5% rsd) — constant memory per group, single-pass, mergeable
    across partitions; rows-only check (sketch estimates differ by engine)."""
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_distinct_users")
    )


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group on fixed-point cents — the
    quartile summary a quality dashboard needs. Quartile fractions (k/4) are
    exact in binary, so linear interpolation over int64 cents is
    bit-reproducible across engines. At 100 TB swap for approx_percentile
    (t-digest) — exact percentile materializes each group's values."""
    events = load_table(spark, sf_dir, "events")
    cents = _cents("value")
    grouped = events.groupBy("event_type")
    return grouped.agg(
        F.round(F.percentile(cents, 0.25) / 100.0, 4).alias("p25"),
        F.round(F.percentile(cents, 0.5) / 100.0, 4).alias("p50"),
        F.round(F.percentile(cents, 0.75) / 100.0, 4).alias("p75"),
    )


def value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quartiles per group (approx_percentile, accuracy 10000)
    — the 100 TB path `value_percentiles` documents: the sketch merges
    map-side, so no group ever materializes its full value list. No SQL
    oracle (sketch internals are engine-specific); accuracy vs the exact
    quartiles is pinned in tests/test_vector_quality.py."""
    events = load_table(spark, sf_dir, "events")
    cents = _cents("value")
    return events.groupBy("event_type").agg(
        F.round(F.percentile_approx(cents, 0.25, 10000) / 100.0, 4).alias("p25"),
        F.round(F.percentile_approx(cents, 0.5, 10000) / 100.0, 4).alias("p50"),
        F.round(F.percentile_approx(cents, 0.75, 10000) / 100.0, 4).alias("p75"),
    )


def value_percentiles_approx_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-scorable audit of the t-digest path: each approx quartile must
    land within max(2% relative, 0.02 absolute) of the exact interpolated
    quartile per group (the tests/test_vector_quality.py pin). The oracle
    recomputes the group keys and asserts the claim per quartile."""
    ex = value_percentiles(spark, sf_dir).select(
        "event_type",
        F.col("p25").alias("e25"),
        F.col("p50").alias("e50"),
        F.col("p75").alias("e75"),
    )
    ap = value_percentiles_approx(spark, sf_dir).select(
        "event_type",
        F.col("p25").alias("a25"),
        F.col("p50").alias("a50"),
        F.col("p75").alias("a75"),
    )

    def ok(a: str, e: str) -> F.Column:
        return F.abs(F.col(a) - F.col(e)) <= F.greatest(
            F.abs(F.col(e)) * 0.02, F.lit(0.02)
        )

    return ex.join(ap, "event_type").select(
        "event_type",
        ok("a25", "e25").alias("p25_ok"),
        ok("a50", "e50").alias("p50_ok"),
        ok("a75", "e75").alias("p75_ok"),
    )


def winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type value stats: clamp every value into the group's
    discrete [p05, p95] before averaging, so a handful of corrupt extremes
    (bad sensor rows, test purchases) can't move the reported mean — the
    robust-aggregation step of a metrics pipeline.

    Exactness: bounds are DISCRETE rank picks (the value at integer rank
    ``(n*5) div 100`` / ``ceil(n*95/100)`` over fixed-point cents) — no
    fraction-of-a-double interpolation, so both engines pick the identical
    element. Clamped sums are int64 → order-free.

    Scale: ONE shuffle. The rank window hash-partitions by event_type and
    the follow-up groupBy reuses that partitioning (no second Exchange —
    asserted in tests/test_plans.py). Per-group value lists are never
    materialized; at 100 TB with huge groups swap the rank window for the
    two-phase bucketed prefix-sum used by `user_activity_pareto`.
    """
    events = load_table(spark, sf_dir, "events")
    base = events.select("event_type", _cents("value").alias("cents"))
    w = Window.partitionBy("event_type").orderBy("cents")
    grp = Window.partitionBy("event_type")
    ranked = base.select(
        "event_type",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(grp).alias("n"),
    )
    lo_rank = F.greatest(F.lit(1), F.expr("(n * 5) DIV 100"))
    hi_rank = F.least(F.col("n"), F.expr("(n * 95 + 99) DIV 100"))
    bounded = ranked.select(
        "event_type",
        "cents",
        F.max(F.when(F.col("rn") == lo_rank, F.col("cents"))).over(grp).alias("lo"),
        F.max(F.when(F.col("rn") == hi_rank, F.col("cents"))).over(grp).alias("hi"),
    )
    clamped = F.least(F.greatest(F.col("cents"), F.col("lo")), F.col("hi"))
    return (
        bounded.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.max("lo") / 100.0, 4).alias("p05"),
            F.round(F.max("hi") / 100.0, 4).alias("p95"),
            F.round(F.sum("cents") / (F.count("*") * 100.0), 4).alias("raw_avg"),
            F.round(F.sum(clamped) / (F.count("*") * 100.0), 4).alias("winsor_avg"),
            F.sum(
                ((F.col("cents") < F.col("lo")) | (F.col("cents") > F.col("hi")))
                .cast("long")
            ).alias("clipped_cnt"),
        )
        .orderBy("event_type")
    )


def top_users_collected(spark: SparkSession, sf_dir: str, k: int = 3) -> DataFrame:
    """Grouped array collection: the top-k users per event type gathered
    into ONE array column per group (leaderboard-as-row). collect_list is
    order-nondeterministic in a distributed shuffle, so entries are
    pre-ranked, encoded as sortable fixed-width strings, and sort_array
    makes the result reproducible cross-engine."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("event_type", "user_id").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy("event_type").orderBy(F.desc("cnt"), "user_id")
    ranked = counts.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= k)
    return ranked.groupBy("event_type").agg(
        # scalarized (joined to one string): the correctness driver's pandas
        # canonicalizer cannot hash array cells
        F.concat_ws(
            ";",
            F.sort_array(
                F.collect_list(F.format_string("%d|%05d|%05d", "rk", "user_id", "cnt"))
            ),
        ).alias("top_users")
    )


def rate_window_counts(spark: SparkSession, sf_dir: str, window_s: int = 60, threshold: int = 3) -> DataFrame:
    """A7/T4 (batch form): per-user tumbling-window request counts, flag
    windows over the limit — the rate-limit aggregation shape.

    Window key is an epoch bucket (int64) so the oracle compares integers,
    not timestamps.
    """
    events = load_table(spark, sf_dir, "events")
    bucket = (F.unix_timestamp("ts") / window_s).cast("long").alias("window_bucket")
    return (
        events.groupBy(F.col("user_id"), bucket)
        .agg(F.count("*").alias("cnt"))
        .withColumn("over_limit", (F.col("cnt") > threshold).alias("over_limit"))
        .filter(F.col("cnt") > 1)
    )


def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 pricing summary — the flagship wide partial-agg query.

    Exercises scan → filter pushdown → 2-key groupBy with 8 aggregates, all
    in fixed-point int64 for exactness.
    """
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.round(F.col("l_quantity") * 100).cast("long")
    price = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    tax = F.round(F.col("l_tax") * 100).cast("long")
    # disc_price/charge: products of exact cents values → exact int math
    disc_price = price * (F.lit(100) - disc)  # cents * percent-cents
    charge = disc_price * (F.lit(100) + tax)
    n = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(qty) / 100.0, 2).alias("sum_qty"),
            F.round(F.sum(price) / 100.0, 2).alias("sum_base_price"),
            F.round(F.sum(disc_price) / 1e6, 2).alias("sum_disc_price"),
            F.round(F.sum(charge) / 1e8, 2).alias("sum_charge"),
            F.round(F.sum(qty) / (n * F.lit(100.0)), 6).alias("avg_qty"),
            F.round(F.sum(price) / (n * F.lit(100.0)), 6).alias("avg_price"),
            F.round(F.sum(disc) / (n * F.lit(100.0)), 6).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLES: dict[str, str] = {
    "status_counts": """
        SELECT o_orderstatus AS status, count(*) AS cnt
        FROM orders GROUP BY 1
    """,
    "multidim_counts": """
        SELECT event_type, user_id % 10 AS user_shard,
               CAST(ts AS DATE) AS day, count(*) AS cnt
        FROM events GROUP BY 1, 2, 3
    """,
    "cube_counts": """
        SELECT event_type, user_id % 5 AS user_shard, count(*) AS cnt
        FROM events GROUP BY CUBE(event_type, user_id % 5)
    """,
    "rollup_counts": """
        SELECT r_name AS region_name, n_name AS nation_name, count(*) AS cnt
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
    """,
    "grouped_stats": """
        SELECT event_type,
               count(*) AS cnt,
               round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 4) AS total_value,
               round(sum(CAST(round(value * 100) AS BIGINT)) / (count(*) * 100.0), 4) AS avg_value,
               round(min(CAST(round(value * 100) AS BIGINT)) / 100.0, 4) AS min_value,
               round(max(CAST(round(value * 100) AS BIGINT)) / 100.0, 4) AS max_value
        FROM events GROUP BY 1
    """,
    "quality_metrics": """
        SELECT count(*) AS row_cnt,
               round(sum(CASE WHEN text IS NOT NULL THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS text_completeness,
               round(count(DISTINCT text) / CAST(count(*) AS DOUBLE), 6) AS text_uniqueness,
               round(sum(CASE WHEN lang IN ('en','de','fr','es','zh') THEN 1 ELSE 0 END) / CAST(count(*) AS DOUBLE), 6) AS lang_consistency,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               min(n_chars) AS min_chars,
               max(n_chars) AS max_chars
        FROM documents
    """,
    "grouping_sets_counts": """
        SELECT o_orderstatus AS status, o_orderpriority AS priority,
               count(*) AS cnt
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), ())
    """,
    "pivot_counts": """
        SELECT user_id % 10 AS user_shard,
               CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS evt_click,
               CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS evt_view,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS evt_purchase,
               CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS evt_signup,
               CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS evt_error
        FROM events GROUP BY 1
    """,
    "distinct_users": """
        SELECT event_type,
               count(DISTINCT user_id) AS distinct_users,
               count(*) AS event_cnt
        FROM events GROUP BY 1
    """,
    "value_percentiles": """
        SELECT event_type,
               round(quantile_cont(CAST(round(value * 100) AS BIGINT), 0.25) / 100.0, 4) AS p25,
               round(quantile_cont(CAST(round(value * 100) AS BIGINT), 0.5) / 100.0, 4) AS p50,
               round(quantile_cont(CAST(round(value * 100) AS BIGINT), 0.75) / 100.0, 4) AS p75
        FROM events GROUP BY 1
    """,
    "kanon_report": """
        WITH g AS (
            SELECT event_type, user_id % 50 AS cohort_raw, count(*) AS cnt
            FROM events GROUP BY 1, 2)
        SELECT event_type,
               CASE WHEN cnt >= 30 THEN CAST(cohort_raw AS VARCHAR)
                    ELSE '__suppressed__' END AS cohort,
               CAST(sum(cnt) AS BIGINT) AS event_cnt,
               count(*) AS merged_cohorts
        FROM g GROUP BY 1, 2
    """,
    # Sketch audits: the oracle recomputes the exact side and asserts the
    # engine's accuracy claim (the boolean) — how HLL/t-digest estimates
    # become driver-scorable without a sketch-internals oracle.
    "quality_metrics_approx_audit": """
        SELECT CAST(count(*) AS BIGINT) AS row_cnt,
               CAST(count(DISTINCT text) AS BIGINT) AS distinct_text,
               true AS within_tol
        FROM documents
    """,
    "distinct_users_approx_audit": """
        SELECT event_type,
               count(DISTINCT user_id) AS distinct_users,
               true AS within_tol
        FROM events GROUP BY 1
    """,
    "value_percentiles_approx_audit": """
        SELECT event_type,
               true AS p25_ok, true AS p50_ok, true AS p75_ok
        FROM events GROUP BY 1
    """,
    "winsorized_stats": """
        WITH ranked AS (
            SELECT event_type, CAST(round(value * 100) AS BIGINT) AS cents,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY CAST(round(value * 100) AS BIGINT)) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM events),
        bounded AS (
            SELECT event_type, cents, n,
                   max(CASE WHEN rn = greatest(1, (n * 5) // 100)
                            THEN cents END)
                       OVER (PARTITION BY event_type) AS lo,
                   max(CASE WHEN rn = least(n, (n * 95 + 99) // 100)
                            THEN cents END)
                       OVER (PARTITION BY event_type) AS hi
            FROM ranked)
        SELECT event_type, count(*) AS n,
               round(max(lo) / 100.0, 4) AS p05,
               round(max(hi) / 100.0, 4) AS p95,
               round(CAST(sum(cents) AS BIGINT) / (count(*) * 100.0), 4) AS raw_avg,
               round(CAST(sum(least(greatest(cents, lo), hi)) AS BIGINT)
                     / (count(*) * 100.0), 4) AS winsor_avg,
               CAST(sum(CASE WHEN cents < lo OR cents > hi THEN 1 ELSE 0 END)
                    AS BIGINT) AS clipped_cnt
        FROM bounded GROUP BY 1 ORDER BY 1
    """,
    "top_users_collected": """
        SELECT event_type,
               array_to_string(list_sort(list(printf('%d|%05d|%05d', rk, user_id, cnt))), ';') AS top_users
        FROM (
            SELECT event_type, user_id, cnt,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY cnt DESC, user_id) AS rk
            FROM (SELECT event_type, user_id, count(*) AS cnt
                  FROM events GROUP BY 1, 2))
        WHERE rk <= 3
        GROUP BY 1
    """,
    "rate_window_counts": """
        SELECT user_id,
               CAST(floor(epoch(ts) / 60) AS BIGINT) AS window_bucket,
               count(*) AS cnt,
               count(*) > 3 AS over_limit
        FROM events
        GROUP BY 1, 2
        HAVING count(*) > 1
    """,
    "tpch_q1": """
        SELECT l_returnflag, l_linestatus,
               round(sum(CAST(round(l_quantity*100) AS BIGINT)) / 100.0, 2) AS sum_qty,
               round(sum(CAST(round(l_extendedprice*100) AS BIGINT)) / 100.0, 2) AS sum_base_price,
               round(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) / 1e6, 2) AS sum_disc_price,
               round(sum(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT)) * (100 + CAST(round(l_tax*100) AS BIGINT))) / 1e8, 2) AS sum_charge,
               round(sum(CAST(round(l_quantity*100) AS BIGINT)) / (count(*) * 100.0), 6) AS avg_qty,
               round(sum(CAST(round(l_extendedprice*100) AS BIGINT)) / (count(*) * 100.0), 6) AS avg_price,
               round(sum(CAST(round(l_discount*100) AS BIGINT)) / (count(*) * 100.0), 6) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
}

QUERIES = {
    "status_counts": status_counts,
    "multidim_counts": multidim_counts,
    "cube_counts": cube_counts,
    "rollup_counts": rollup_counts,
    "grouped_stats": grouped_stats,
    "quality_metrics": quality_metrics,
    # the raw sketch queries (quality_metrics_approx, distinct_users_approx,
    # value_percentiles_approx) are library surface — estimates have no
    # stable SQL mirror; these *_audit twins pin them for the driver
    "quality_metrics_approx_audit": quality_metrics_approx_audit,
    "distinct_users_approx_audit": distinct_users_approx_audit,
    "value_percentiles_approx_audit": value_percentiles_approx_audit,
    "grouping_sets_counts": grouping_sets_counts,
    "kanon_report": kanon_report,
    "pivot_counts": pivot_counts,
    "distinct_users": distinct_users,
    "value_percentiles": value_percentiles,
    "winsorized_stats": winsorized_stats,
    "top_users_collected": top_users_collected,
    "rate_window_counts": rate_window_counts,
    "tpch_q1": tpch_q1,
}


def weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median of `value` per event type (weight = the
    `props.k` metadata field + 1) — a custom grouped aggregate Spark has no
    builtin for, implemented with Arrow-batched ``applyInPandas`` (the
    §2.10 UDAF escape hatch, numpy-vectorized inside each group).

    Median rule: values sort by (cents, event_id); the median is the first
    row whose doubled cumulative weight reaches the group total — integer
    arithmetic end to end, so the pandas path and the oracle's
    window-cumsum SQL agree exactly.

    Scale: ONE hash shuffle on the group key; per-group work is a sort +
    cumsum in Arrow memory. Groups must fit an executor (event-type groups
    are corpus-sized shards — for huge groups switch to the two-phase
    bucketed prefix-sum (`user_activity_pareto`) which computes the same
    rank selection without materializing a group)."""
    import pandas as pd

    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
        (F.get_json_object("props", "$.k").cast("long") + 1).alias("w"),
    )

    def _wm(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["cents", "event_id"], ignore_index=True)
        total = int(pdf["w"].sum())
        cum = pdf["w"].cumsum()
        med = int(pdf.loc[(cum * 2 >= total).idxmax(), "cents"])
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iat[0]],
                "n_events": [len(pdf)],
                "total_w": [total],
                "weighted_median": [med / 100.0],
            }
        )

    return (
        base.groupBy("event_type")
        .applyInPandas(
            _wm,
            schema="event_type string, n_events long, total_w long, "
            "weighted_median double",
        )
        .orderBy("event_type")
    )


QUERIES["weighted_median"] = weighted_median

ORACLES["weighted_median"] = """
    WITH base AS (
        SELECT event_type, event_id,
               CAST(round(value * 100) AS BIGINT) AS cents,
               CAST(json_extract_string(props, '$.k') AS BIGINT) + 1 AS w
        FROM events),
    tot AS (
        SELECT event_type, count(*) AS n_events,
               CAST(sum(w) AS BIGINT) AS total_w
        FROM base GROUP BY 1),
    c AS (
        SELECT event_type, cents,
               CAST(sum(w) OVER (PARTITION BY event_type
                                 ORDER BY cents, event_id) AS BIGINT) AS cw
        FROM base),
    hit AS (
        SELECT c.event_type, c.cents
        FROM c JOIN tot USING (event_type)
        WHERE 2 * c.cw >= tot.total_w
        QUALIFY row_number() OVER (PARTITION BY c.event_type
                                   ORDER BY c.cents) = 1)
    SELECT t.event_type, t.n_events, t.total_w,
           round(h.cents / 100.0, 2) AS weighted_median
    FROM tot t JOIN hit h USING (event_type)
    ORDER BY t.event_type
"""


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — mergeable, deterministic
# ---------------------------------------------------------------------------

KMV_K = 128
KMV_SALTS = 8
KMV_SPACE = 16 ** 15  # md5_int hash space: 15 hex chars = 2^60


def kmv_distinct_report(
    spark: SparkSession, sf_dir: str, k: int = KMV_K
) -> DataFrame:
    """Per-group distinct-count estimation via the KMV (k-minimum-values /
    bottom-k) sketch (Bar-Yossef et al. 2002): keep the k smallest DISTINCT
    md5 hashes per group; estimate = (k-1)·M / h_(k). Unlike HLL the
    estimator here is fully DETERMINISTIC (md5 is the randomness), so the
    report is oracle-EXACT, and the sketch is trivially mergeable — union
    of two groups' bottom-k sets, re-trimmed to k, is the union sketch —
    which is what makes it the cross-partition / cross-day distinct
    primitive at 100 TB (ship k longs per group, never the key sets).

    Scale shape: one distinct shuffle on (group, hash), then the
    repo-standard salted two-phase bottom-k — k smallest per
    (group, h % KMV_SALTS) in parallel, k smallest of the ≤ salts·k
    survivors per group — no reducer ever holds a group's full distinct
    set. Emits exact vs estimate plus the 3σ (≈3/√(k−2)) relative-error
    verdict; the final division runs in double from exactly-representable
    integers, identically in both engines."""
    events = load_table(spark, sf_dir, "events")
    h = md5_int(F.col("user_id").cast("string"))
    d = events.select("event_type", h.alias("h")).distinct()
    w1 = Window.partitionBy("event_type", F.col("h") % KMV_SALTS).orderBy("h")
    survivors = (
        d.withColumn("rn", F.row_number().over(w1))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
    w2 = Window.partitionBy("event_type").orderBy("h")
    bottomk = (
        survivors.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") <= k)
    )
    sketch = bottomk.groupBy("event_type").agg(
        F.count("*").alias("n_kept"),
        F.max("h").alias("kth_min"),
    )
    exact = events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("exact_distinct")
    )
    est = (
        F.when(F.col("n_kept") < k, F.col("n_kept").cast("double"))
        .otherwise(
            F.lit(float((k - 1) * KMV_SPACE)) / F.col("kth_min").cast("double")
        )
    )
    rel_tol = 3.0 / (k - 2) ** 0.5
    return (
        sketch.join(exact, "event_type")
        .select(
            "event_type",
            "exact_distinct",
            "n_kept",
            F.floor(est).cast("long").alias("kmv_estimate"),
            (
                F.abs(est - F.col("exact_distinct").cast("double"))
                <= F.col("exact_distinct").cast("double") * F.lit(rel_tol)
                + F.lit(2.0)
            ).alias("within_tol"),
        )
        .orderBy("event_type")
    )


_KMV_REL_TOL = 3.0 / (KMV_K - 2) ** 0.5

ORACLES["kmv_distinct_report"] = f"""
    WITH d AS (
        SELECT DISTINCT event_type,
               {md5_int_sql("CAST(user_id AS VARCHAR)")} AS h
        FROM events),
    bk AS (
        SELECT event_type, h,
               row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
        FROM d),
    sk AS (
        SELECT event_type, count(*) AS n_kept, CAST(max(h) AS BIGINT) AS kth_min
        FROM bk WHERE rn <= {KMV_K} GROUP BY 1),
    ex AS (
        SELECT event_type, count(DISTINCT user_id) AS exact_distinct
        FROM events GROUP BY 1),
    est AS (
        SELECT sk.event_type, ex.exact_distinct, sk.n_kept,
               CASE WHEN sk.n_kept < {KMV_K}
                    THEN CAST(sk.n_kept AS DOUBLE)
                    ELSE CAST({float((KMV_K - 1) * KMV_SPACE)} AS DOUBLE)
                         / CAST(sk.kth_min AS DOUBLE) END AS e
        FROM sk JOIN ex USING (event_type))
    SELECT event_type, exact_distinct, n_kept,
           CAST(floor(e) AS BIGINT) AS kmv_estimate,
           abs(e - CAST(exact_distinct AS DOUBLE))
               <= CAST(exact_distinct AS DOUBLE) * {_KMV_REL_TOL} + 2.0
               AS within_tol
    FROM est ORDER BY event_type
"""

QUERIES["kmv_distinct_report"] = kmv_distinct_report
