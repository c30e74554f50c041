"""Window-function operators (SURVEY §2.5 — the reference has no OVER
clauses; these are the window-shaped behaviors it implements imperatively).

Parity targets:
- "keep last 1000 timings per metric": reference
  backend/core/performance_monitoring.py:230-233 → row_number retention
- sliding rate-limit counts: reference backend/core/guardrails.py:28-37 →
  count over rangeBetween(-60 s, 0)
- offset pagination: covered in relational.offset_page

Scale notes: both windows partition by a key (metric / user) so they
parallelize across the key space — no single-partition global window. The
retention window's sort is per-key (bounded by per-key row counts); the
range frame is the classic time-series sliding count and shuffles once on
the partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table
from ai_powered_data_pipeline_assistant_spark.execution import materialize


def retention_last_n(spark: SparkSession, sf_dir: str, n: int = 100) -> DataFrame:
    """Keep the newest N samples per metric (event_type ≙ metric name),
    then summarize — the reference's deque-of-1000 retention + stats."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    kept = events.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= n)
    cents = F.round(F.col("value") * 100).cast("long")
    return kept.groupBy("event_type").agg(
        F.count("*").alias("sample_cnt"),
        F.round(F.sum(cents) / (F.count("*") * F.lit(100.0)), 4).alias("avg_value"),
        F.round(F.min(cents) / F.lit(100.0), 4).alias("min_value"),
        F.round(F.max(cents) / F.lit(100.0), 4).alias("max_value"),
    )


def sliding_window_counts(spark: SparkSession, sf_dir: str, window_s: int = 60) -> DataFrame:
    """Per-event trailing-60 s count per user (the exact sliding-window
    rate-limit count the reference's deque computes). Emits only events
    whose trailing count exceeds 1 to keep the result focused."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-(window_s - 1), 0)
    )
    return (
        events.withColumn("trailing_cnt", F.count("*").over(w))
        .filter(F.col("trailing_cnt") > 1)
        .select("event_id", "user_id", "trailing_cnt")
    )


def sessionize(spark: SparkSession, sf_dir: str, gap_s: int = 1800) -> DataFrame:
    """Sessionization: split each user's event stream into sessions separated
    by ≥ gap_s of inactivity (lag → gap flag → running sum = session index),
    then summarize per session.

    The standard training-data/web-analytics primitive (no reference parity
    row; north-star extension). The batch formulation here is the classic
    two-window plan — one shuffle on user_id, both windows reuse the same
    partitioning (Catalyst plans a single Exchange + one sort). Streaming
    equivalent: groupBy(session_window(ts, gap)) with watermark.
    """
    events = load_table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_flag = F.when(
        F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(order)) >= gap_s,
        1,
    ).otherwise(0)
    with_session = events.withColumn(
        "session_idx", F.sum(gap_flag).over(order)
    )
    return (
        with_session.groupBy("user_id", "session_idx")
        .agg(
            F.count("*").alias("event_cnt"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
                "duration_s"
            ),
        )
    )


def session_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row product-analytics rollup of the sessionized stream: session
    and user counts, sessions per user, events per session, mean duration,
    and the single-event-session ("bounce") share. All ratios derive from
    int64 counts/sums, so the summary is exact under any partitioning; it
    reuses `sessionize`'s single-shuffle plan and adds only a final
    1-row aggregate."""
    s = sessionize(spark, sf_dir)
    return s.agg(
        F.count("*").alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.count("*") / F.countDistinct("user_id").cast("double"), 4).alias(
            "sessions_per_user"
        ),
        F.round(F.sum("event_cnt") / F.count("*").cast("double"), 4).alias(
            "events_per_session"
        ),
        F.round(F.sum("duration_s") / F.count("*").cast("double"), 4).alias(
            "avg_duration_s"
        ),
        F.round(
            F.sum((F.col("event_cnt") == 1).cast("long"))
            / F.count("*").cast("double"),
            6,
        ).alias("bounce_share"),
    )


def session_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native `session_window` sessionization (the built-in behind the
    `sessionize` hand-rolled plan): per-user sessions with a 30-minute
    inactivity gap, one shuffle on the grouping key, windows merged by the
    engine — the same operator Structured Streaming runs incrementally with
    a watermark. Oracle = the gap-islands formulation at full microsecond
    precision; session_end is last-event + gap by session_window's
    definition."""
    events = load_table(spark, sf_dir, "events")
    grouped = events.groupBy(
        "user_id", F.session_window("ts", "30 minutes")
    ).agg(F.count("*").alias("event_cnt"))
    return grouped.select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "event_cnt",
    )


def value_ntiles(spark: SparkSession, sf_dir: str, n: int = 4) -> DataFrame:
    """NTILE quantile sharding per group — the training-data trick of
    splitting a corpus into equal-size quality shards. Deterministic
    because the ordering key (value, event_id) is unique."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.round(F.col("value") * 100).cast("long"), "event_id"
    )
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        events.withColumn("tile", F.ntile(n).over(w))
        .groupBy("event_type", "tile")
        .agg(
            F.count("*").alias("cnt"),
            F.round(F.min(cents) / 100.0, 4).alias("tile_min"),
            F.round(F.max(cents) / 100.0, 4).alias("tile_max"),
        )
    )


def customer_running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer cumulative revenue over order history — the running-
    total ledger view. Partitioned by customer, so the window parallelizes
    across the key space (one shuffle, per-key sort); integer-cents math
    keeps the running sums exact."""
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            cents.alias("cents"),
        )
        .select(
            "o_custkey",
            "o_orderkey",
            F.to_date("o_orderdate").alias("order_date"),
            F.round(F.sum("cents").over(w) / 100.0, 2).alias("running_revenue"),
        )
    )


def value_moving_avg(spark: SparkSession, sf_dir: str, n: int = 7) -> DataFrame:
    """Trailing n-row moving average of `value` per event_type (the
    time-series smoothing primitive). Integer-cents sums inside the window
    keep the math exact; one shuffle on event_type, per-key sort only."""
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(n - 1), 0)
    )
    return events.select(
        "event_id",
        "event_type",
        "ts",
        cents.alias("cents"),
    ).select(
        "event_id",
        "event_type",
        F.count("*").over(w).alias("n_in_window"),
        F.round(
            F.sum("cents").over(w) / (F.count("*").over(w) * F.lit(100.0)), 4
        ).alias("moving_avg"),
    )


def user_activity_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-share (Pareto) accounting: users ranked by event count,
    with each user's running share of total events and of the user
    population — "what % of users generate 80% of traffic".

    The cumulative sum over the GLOBAL (cnt DESC, user_id) order is the
    scale hazard: a bare ``Window.orderBy`` funnels every user through one
    partition. Same cure as pack_sequences: range-partition the aggregated
    frame into ordered buckets, run the running sum/rank per bucket in
    parallel, then add broadcast per-bucket offsets. Bucket boundaries come
    from the range partitioner's sampling — nondeterministic — but the
    ordering key is unique, so cum/rank results are identical whatever the
    boundaries land on.
    """
    events = load_table(spark, sf_dir, "events")
    counts = events.groupBy("user_id").agg(F.count("*").alias("cnt"))
    parted = (
        counts.repartitionByRange(32, F.desc("cnt"), F.asc("user_id"))
        .withColumn("bucket", F.spark_partition_id())
        # Pin the sampled range boundaries: `parted` feeds two subtrees
        # (intra-bucket running sums and the per-bucket totals) — see
        # ranking.append_global_rank for the full rationale.
        .transform(materialize)
    )
    intra_w = (
        Window.partitionBy("bucket")
        .orderBy(F.desc("cnt"), "user_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = parted.select(
        "user_id",
        "cnt",
        "bucket",
        F.sum("cnt").over(intra_w).alias("intra_cum"),
        F.count("*").over(intra_w).alias("intra_rank"),
    )
    totals = parted.groupBy("bucket").agg(
        F.sum("cnt").alias("b_cnt"), F.count("*").alias("b_rows")
    )
    off_w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = totals.select(
        "bucket",
        (F.sum("b_cnt").over(off_w) - F.col("b_cnt")).alias("cum_off"),
        (F.sum("b_rows").over(off_w) - F.col("b_rows")).alias("rank_off"),
    )
    grand = counts.agg(
        F.sum("cnt").cast("long").alias("total_events"),
        F.count("*").alias("n_users"),
    )
    return (
        intra.join(F.broadcast(offsets), "bucket")
        .crossJoin(F.broadcast(grand))
        .select(
            "user_id",
            "cnt",
            (F.col("rank_off") + F.col("intra_rank")).alias("user_rank"),
            F.round(
                (F.col("cum_off") + F.col("intra_cum"))
                / F.col("total_events").cast("double"),
                6,
            ).alias("cum_event_share"),
            F.round(
                (F.col("rank_off") + F.col("intra_rank"))
                / F.col("n_users").cast("double"),
                6,
            ).alias("cum_user_share"),
        )
        .orderBy("user_rank")
    )


_SESSIONS_CTE = """
    WITH flagged AS (
        SELECT user_id, event_id, ts,
               CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                         - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) >= 1800
                    THEN 1 ELSE 0 END AS gap_flag
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sessions AS (
        SELECT user_id, ts,
               CAST(sum(gap_flag) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)
                    AS BIGINT) AS session_idx
        FROM flagged),
    per AS (
        SELECT user_id, session_idx, count(*) AS event_cnt,
               CAST(floor(epoch(max(ts))) AS BIGINT)
                   - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_s
        FROM sessions GROUP BY 1, 2)
"""

ORACLES: dict[str, str] = {
    "session_summary": _SESSIONS_CTE + """
    SELECT count(*) AS n_sessions,
           count(DISTINCT user_id) AS n_users,
           round(count(*) / CAST(count(DISTINCT user_id) AS DOUBLE), 4)
               AS sessions_per_user,
           round(CAST(sum(event_cnt) AS BIGINT) / CAST(count(*) AS DOUBLE), 4)
               AS events_per_session,
           round(CAST(sum(duration_s) AS BIGINT) / CAST(count(*) AS DOUBLE), 4)
               AS avg_duration_s,
           round(CAST(sum(CASE WHEN event_cnt = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) / CAST(count(*) AS DOUBLE), 6)
               AS bounce_share
    FROM per
    """,
    "customer_running_revenue": """
        SELECT o_custkey, o_orderkey,
               CAST(o_orderdate AS DATE) AS order_date,
               round(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                         OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) / 100.0, 2)
                   AS running_revenue
        FROM orders
    """,
    "value_moving_avg": """
        SELECT event_id, event_type,
               count(*) OVER w AS n_in_window,
               round(sum(cents) OVER w / (count(*) OVER w * 100.0), 4)
                   AS moving_avg
        FROM (SELECT event_id, event_type, ts,
                     CAST(round(value * 100) AS BIGINT) AS cents
              FROM events)
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
    "user_activity_pareto": """
        WITH counts AS (SELECT user_id, count(*) AS cnt
                        FROM events GROUP BY user_id),
        tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_events,
                       count(*) AS n_users
                FROM counts)
        SELECT user_id, cnt,
               row_number() OVER (ORDER BY cnt DESC, user_id) AS user_rank,
               round(sum(cnt) OVER (ORDER BY cnt DESC, user_id)
                     / CAST(total_events AS DOUBLE), 6) AS cum_event_share,
               round(row_number() OVER (ORDER BY cnt DESC, user_id)
                     / CAST(n_users AS DOUBLE), 6) AS cum_user_share
        FROM counts CROSS JOIN tot
        ORDER BY user_rank
    """,
    "value_ntiles": """
        SELECT event_type, tile, count(*) AS cnt,
               round(min(cents) / 100.0, 4) AS tile_min,
               round(max(cents) / 100.0, 4) AS tile_max
        FROM (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   ntile(4) OVER (PARTITION BY event_type
                                  ORDER BY CAST(round(value * 100) AS BIGINT),
                                           event_id) AS tile
            FROM events)
        GROUP BY 1, 2
    """,
    "session_window_counts": """
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w)
                             >= 1800000000
                        THEN 1 ELSE 0 END AS gap_flag
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sessions AS (
            SELECT user_id, ts,
                   CAST(sum(gap_flag) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                        AS BIGINT) AS s
            FROM flagged)
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTE AS session_end,
               count(*) AS event_cnt
        FROM sessions GROUP BY user_id, s
    """,
    "sessionize": """
        WITH flagged AS (
            SELECT user_id, event_id, ts,
                   CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                             - CAST(floor(epoch(lag(ts) OVER w)) AS BIGINT) >= 1800
                        THEN 1 ELSE 0 END AS gap_flag
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        sessions AS (
            SELECT user_id, ts,
                   CAST(sum(gap_flag) OVER (PARTITION BY user_id
                                            ORDER BY ts, event_id)
                        AS BIGINT) AS session_idx
            FROM flagged)
        SELECT user_id, session_idx,
               count(*) AS event_cnt,
               min(ts) AS session_start,
               max(ts) AS session_end,
               CAST(floor(epoch(max(ts))) AS BIGINT)
                   - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_s
        FROM sessions GROUP BY 1, 2
    """,
    "retention_last_n": """
        WITH kept AS (
            SELECT * FROM (
                SELECT event_type, value,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY ts DESC, event_id DESC) AS rn
                FROM events) WHERE rn <= 100)
        SELECT event_type,
               count(*) AS sample_cnt,
               round(sum(CAST(round(value*100) AS BIGINT)) / (count(*) * 100.0), 4) AS avg_value,
               round(min(CAST(round(value*100) AS BIGINT)) / 100.0, 4) AS min_value,
               round(max(CAST(round(value*100) AS BIGINT)) / 100.0, 4) AS max_value
        FROM kept GROUP BY 1
    """,
    "sliding_window_counts": """
        SELECT event_id, user_id, trailing_cnt FROM (
            SELECT event_id, user_id,
                   count(*) OVER (PARTITION BY user_id
                                  ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                                  RANGE BETWEEN 59 PRECEDING AND CURRENT ROW) AS trailing_cnt
            FROM events)
        WHERE trailing_cnt > 1
    """,
}

QUERIES = {
    "customer_running_revenue": customer_running_revenue,
    "value_moving_avg": value_moving_avg,
    "user_activity_pareto": user_activity_pareto,
    "retention_last_n": retention_last_n,
    "sliding_window_counts": sliding_window_counts,
    "sessionize": sessionize,
    "session_summary": session_summary,
    "session_window_counts": session_window_counts,
    "value_ntiles": value_ntiles,
}


RFM_BANDS = 5


def rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation rollup: every customer scored 1-5 on
    Recency (days since last order), Frequency (order count), and Monetary
    (lifetime revenue), then rolled up per 3-digit segment — the classic
    CRM slicing.

    Determinism: scores are equal-size rank bands ``((rn-1)·5) div n`` over
    a fully-tiebroken row_number (metric, then custkey) — no NTILE tie
    ambiguity, no float thresholds; monetary accumulates integer cents.

    Scale: the three ranks run on the CUSTOMER-GRAIN aggregate (orders of
    magnitude smaller than the fact table; the one fact shuffle is the
    per-customer groupBy). The rank plan is size-adaptive: when a cheap
    zero-column fact count bounds the customer frame under
    `ranking.SINGLE_REDUCER_MAX_ROWS`, the three ranks are plain windows
    over the aggregate (single pipeline, n free from a count window); past
    it, each becomes the bucketed two-phase global rank
    (`ranking.append_global_rank`) — no single-reducer window at
    100 TB-of-customers.
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    ref = orders.agg(F.max(F.to_date("o_orderdate")).alias("ref_day"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_day"),
            F.count("*").alias("frequency"),
            F.sum(cents).alias("monetary_cents"),
        )
        .crossJoin(F.broadcast(ref))
        .select(
            "o_custkey",
            F.datediff("ref_day", "last_day").cast("long").alias("recency_days"),
            "frequency",
            "monetary_cents",
        )
    )
    from ai_powered_data_pipeline_assistant_spark.operators.ranking import (
        SINGLE_REDUCER_MAX_ROWS,
        append_global_rank,
    )

    RANK_ORDERS = (
        ("r_rn", [F.asc("recency_days"), F.asc("o_custkey")]),
        ("f_rn", [F.desc("frequency"), F.asc("o_custkey")]),
        ("m_rn", [F.desc("monetary_cents"), F.asc("o_custkey")]),
    )
    # n_customers <= n_orders; the zero-column fact count is one cheap job
    if orders.count() <= SINGLE_REDUCER_MAX_ROWS:
        # dimension scale: three plain windows over the aggregate, n free
        # from a count window in the same pass — one pipeline, no extra jobs
        ranked = per_cust.select(
            "*",
            *[
                F.row_number()
                .over(Window.partitionBy().orderBy(*order))
                .cast("long")
                .alias(out_col)
                for out_col, order in RANK_ORDERS
            ],
            F.count("*").over(Window.partitionBy()).alias("n"),
        )
    else:
        # lazy materialize (execution.py policy) — computed once, auto-released
        per_cust = per_cust.transform(materialize)
        n = per_cust.count()  # scalar; also materializes the checkpoint
        ranked = per_cust
        for out_col, order in RANK_ORDERS:
            ranked = append_global_rank(ranked, order, out_col, n_rows=n)
        ranked = ranked.withColumn("n", F.lit(n).cast("long"))
    scored = ranked.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        # integer DIV — identical floor semantics to the oracle's `//`
        F.expr(f"(r_rn - 1) * {RFM_BANDS} DIV n + 1").alias("r_score"),
        F.expr(f"(f_rn - 1) * {RFM_BANDS} DIV n + 1").alias("f_score"),
        F.expr(f"(m_rn - 1) * {RFM_BANDS} DIV n + 1").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.avg("recency_days"), 6).alias("avg_recency_days"),
            F.round(F.avg("frequency"), 6).alias("avg_frequency"),
            F.round(F.sum("monetary_cents") / 100.0, 2).alias("total_revenue"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


QUERIES["rfm_segments"] = rfm_segments

ORACLES["rfm_segments"] = f"""
    WITH ref AS (SELECT max(CAST(o_orderdate AS DATE)) AS ref_day FROM orders),
    per_cust AS (
        SELECT o_custkey,
               CAST(datediff('day', max(CAST(o_orderdate AS DATE)),
                             (SELECT ref_day FROM ref)) AS BIGINT)
                   AS recency_days,
               count(*) AS frequency,
               CAST(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT))
                    AS BIGINT) AS monetary_cents
        FROM orders GROUP BY 1),
    scored AS (
        SELECT o_custkey, recency_days, frequency, monetary_cents,
               (row_number() OVER (ORDER BY recency_days ASC, o_custkey ASC)
                - 1) * {RFM_BANDS} // count(*) OVER () + 1 AS r_score,
               (row_number() OVER (ORDER BY frequency DESC, o_custkey ASC)
                - 1) * {RFM_BANDS} // count(*) OVER () + 1 AS f_score,
               (row_number() OVER (ORDER BY monetary_cents DESC, o_custkey ASC)
                - 1) * {RFM_BANDS} // count(*) OVER () + 1 AS m_score
        FROM per_cust)
    SELECT r_score, f_score, m_score,
           count(*) AS n_customers,
           round(avg(recency_days), 6) AS avg_recency_days,
           round(avg(frequency), 6) AS avg_frequency,
           round(CAST(sum(monetary_cents) AS BIGINT) / 100.0, 2)
               AS total_revenue
    FROM scored
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
"""


WATERMARK_CANDIDATES = (0, 60, 300, 1800)  # seconds


def watermark_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark tuning report: replay the events table in ARRIVAL order
    (event_id), measure each event's lateness vs the running event-time
    high-water mark, and report what share of events each candidate
    watermark delay would drop — the analysis run before choosing
    `withWatermark` for a production stream (too tight silently drops
    data; too loose bloats state).

    Lateness is integer seconds off the arrival-order running event-time
    max. Scale shape: the running max is a prefix aggregate, so it uses
    the same two-phase bucketed pattern as `ranking.append_global_rank` —
    range-partition on arrival order, per-bucket running max in parallel,
    then greatest() with the broadcast exclusive prefix max of earlier
    buckets' maxima (≤ buckets rows). Below SINGLE_REDUCER_MAX_ROWS the
    plain single window is cheaper and is used instead (measure, then
    pick — the repo-standard adaptive guard); the candidate evaluation is
    a fixed-width conditional aggregate either way.
    """
    from ai_powered_data_pipeline_assistant_spark.operators.ranking import (
        SINGLE_REDUCER_MAX_ROWS,
    )

    events = load_table(spark, sf_dir, "events")
    base = events.select(
        "event_id", F.unix_timestamp("ts").alias("es")
    )
    if events.count() <= SINGLE_REDUCER_MAX_ROWS:
        w = Window.partitionBy().orderBy("event_id").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        late = base.select(
            (F.max("es").over(w) - F.col("es")).alias("late_s")
        )
    else:
        parted = (
            base.repartitionByRange(32, F.asc("event_id"))
            .withColumn("_wb", F.spark_partition_id())
            # pin the sampled range boundaries — `parted` feeds two plan
            # subtrees (intra running max + per-bucket maxima); see
            # ranking.append_global_rank
            .transform(materialize)
        )
        intra_w = (
            Window.partitionBy("_wb")
            .orderBy("event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        bucket_max = parted.groupBy("_wb").agg(F.max("es").alias("_bmax"))
        # exclusive prefix max over ≤32 bucket rows — trivially single-node
        prev_w = Window.orderBy("_wb").rowsBetween(
            Window.unboundedPreceding, -1
        )
        offsets = bucket_max.select(
            "_wb", F.max("_bmax").over(prev_w).alias("_prev_max")
        )
        late = (
            parted.withColumn("_intra_max", F.max("es").over(intra_w))
            .join(F.broadcast(offsets), "_wb")
            # greatest() skips NULLs, so the first bucket (no prior max)
            # falls back to its own intra running max
            .select(
                (
                    F.greatest(F.col("_intra_max"), F.col("_prev_max"))
                    - F.col("es")
                ).alias("late_s")
            )
        )
    aggs = []
    for wm in WATERMARK_CANDIDATES:
        aggs.append(
            F.sum(F.when(F.col("late_s") > wm, 1).otherwise(0)).alias(f"d{wm}")
        )
    totals = late.agg(F.count("*").alias("n"), *aggs)
    rows = []
    for wm in WATERMARK_CANDIDATES:
        rows.append(
            totals.select(
                F.lit(wm).cast("long").alias("watermark_s"),
                F.col(f"d{wm}").cast("long").alias("n_dropped"),
                F.round(F.col(f"d{wm}") / F.col("n").cast("double"), 6).alias(
                    "drop_share"
                ),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("watermark_s")


QUERIES["watermark_planner"] = watermark_planner

ORACLES["watermark_planner"] = f"""
    WITH late AS (
        SELECT max(CAST(floor(epoch(ts)) AS BIGINT))
                   OVER (ORDER BY event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               - CAST(floor(epoch(ts)) AS BIGINT) AS late_s
        FROM events),
    totals AS (
        SELECT count(*) AS n,
               {", ".join(f"CAST(sum(CASE WHEN late_s > {wm} THEN 1 ELSE 0 END) AS BIGINT) AS d{wm}" for wm in WATERMARK_CANDIDATES)}
        FROM late)
    {" UNION ALL ".join(
        f"SELECT CAST({wm} AS BIGINT) AS watermark_s, d{wm} AS n_dropped, "
        f"round(d{wm} / CAST(n AS DOUBLE), 6) AS drop_share FROM totals"
        for wm in WATERMARK_CANDIDATES)}
    ORDER BY watermark_s
"""
