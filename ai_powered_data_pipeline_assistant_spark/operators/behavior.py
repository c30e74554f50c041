"""Behavioral / event analytics: funnels, cohort retention, calendar
gap-fill, inter-event gaps, histograms, and per-group top-N.

The reference's events handling stops at counters and rate windows
(reference backend/db/optimized_queries.py:118-150, Supabase/setup.sql
usage_counters); these operators are the standard next layer every
product-analytics user asks of an events table. All are pure DataFrame
compositions with exact DuckDB oracles.

Scale notes (the shapes that survive 100 TB):
- ``funnel_counts``: ONE shuffle — groupBy(user_id) with conditional-min
  aggregates (map-side combined); stage flags and the 3-row unpivot run on
  the reduced per-user frame. Never a self-join per stage (the naive
  formulation joins the events table once per funnel step).
- ``cohort_retention``: min-over-user window rides the same hash partition
  as the groupBy that follows; integer week indexes (days since a fixed
  epoch / 7) avoid engine-specific week-truncation semantics.
- ``daily_counts_gapfill``: the calendar dimension is built from a 1-row
  min/max aggregate then ``sequence``-exploded — rows = days × event
  types, independent of fact cardinality; the per-day counts aggregate is
  map-side combined, and the fill join is a broadcast of that tiny
  aggregate, never a shuffle of the facts.
- ``event_gaps``: lag + aggregate over one user_id shuffle.
- ``chars_histogram``: fixed-width bucketing is a pure column expression;
  one map-side-combined groupBy on ≤ N_BUCKETS keys.
- ``top_docs_per_lang``: row_number per lang partition — at scale this is
  the grouped-top-N pattern (partial top-N per partition, AQE-merged),
  bounded output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table
from ai_powered_data_pipeline_assistant_spark.execution import materialize

FUNNEL_STAGES = ("view", "click", "purchase")
WEEK_EPOCH = "2024-01-01"  # integer week index origin (Monday)
HIST_WIDTH = 100
HIST_BUCKETS = 10  # last bucket open-ended
TOP_PER_LANG = 3


def funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel stage counts over view → click → purchase.

    A user converts at stage k when their earliest stage-k event is at or
    after their earliest stage-(k-1) event (first-touch ordering). One
    groupBy(user_id) with conditional mins; no per-stage self-joins.
    """
    events = load_table(spark, sf_dir, "events")
    mins = [
        F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
        for s in FUNNEL_STAGES
    ]
    per_user = events.groupBy("user_id").agg(*mins)
    flags = per_user.select(
        F.col("t_view").isNotNull().cast("long").alias("s1"),
        (
            F.col("t_view").isNotNull()
            & F.col("t_click").isNotNull()
            & (F.col("t_click") >= F.col("t_view"))
        ).cast("long").alias("s2"),
        (
            F.col("t_view").isNotNull()
            & F.col("t_click").isNotNull()
            & (F.col("t_click") >= F.col("t_view"))
            & F.col("t_purchase").isNotNull()
            & (F.col("t_purchase") >= F.col("t_click"))
        ).cast("long").alias("s3"),
    )
    totals = flags.agg(
        F.sum("s1").alias("n1"), F.sum("s2").alias("n2"), F.sum("s3").alias("n3")
    )
    return totals.selectExpr(
        "stack(3, 1L, 'view', n1, 2L, 'click', n2, 3L, 'purchase', n3) "
        "AS (stage_idx, stage, n_users)"
    ).orderBy("stage_idx")


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-activity week,
    counted per week offset from that first activity.

    Week indexes are integers (days since WEEK_EPOCH, div 7) so Spark and
    any oracle agree without week-truncation semantics. The min-over-user
    window and the final groupBy share the user_id hash partitioning.
    """
    events = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    w = Window.partitionBy("user_id")
    with_first = events.select(
        F.col("user_id"), day.alias("day")
    ).withColumn("first_day", F.min("day").over(w))
    return (
        with_first.select(
            (F.datediff("first_day", F.lit(WEEK_EPOCH)).cast("long") / 7)
            .cast("long")
            .alias("cohort_week"),
            (F.datediff("day", "first_day").cast("long") / 7)
            .cast("long")
            .alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


def daily_counts_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day, per-event-type counts with explicit zero rows for missing
    (day, type) combinations across the table's full date range.

    The calendar is derived from a one-row min/max aggregate and
    ``sequence``-exploded — its size is days × types regardless of fact
    volume; the fact-side aggregate is map-side combined and broadcast
    into the fill join.
    """
    events = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    counts = (
        events.groupBy(day.alias("day"), "event_type")
        .agg(F.count("*").alias("n"))
    )
    calendar = (
        events.agg(
            F.min(day).alias("lo"), F.max(day).alias("hi")
        )
        .select(
            F.explode(
                F.sequence("lo", "hi", F.expr("interval 1 day"))
            ).alias("day")
        )
    )
    types = events.select("event_type").distinct()
    grid = calendar.crossJoin(F.broadcast(types))
    return (
        grid.join(F.broadcast(counts), ["day", "event_type"], "left")
        .select(
            "day",
            "event_type",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        )
        .orderBy("day", "event_type")
    )


def event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap statistics (microsecond precision).

    lag over one (user_id)-shuffled window ordered by (ts, event_id); the
    aggregate rides the same partitioning. Integer-microsecond gaps keep
    the float path out until the final rounded average.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # ts arrives TIMESTAMP_NTZ from the nanos-parquet path; the session tz
    # is pinned UTC, so the cast is an exact wall-clock-preserving
    # conversion that makes unix_micros applicable.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = events.select(
        "user_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            (F.count("*")).alias("n_events"),
            F.round(F.avg("gap_us"), 4).alias("avg_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .orderBy("user_id")
    )


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix: for each (prev → next)
    pair of consecutive events within a user's stream, the count and the
    row-normalized transition probability — the Markov view of user
    behavior. One lag window + one tiny groupBy; the normalizing window
    runs on the ≤|types|² aggregate."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            "user_id",
            F.lag("event_type").over(w).alias("prev_type"),
            F.col("event_type").alias("next_type"),
        )
        .filter(F.col("prev_type").isNotNull())
    )
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count("*").alias("n")
    )
    norm = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(norm).cast("double"), 6).alias(
            "p_transition"
        ),
    ).orderBy("prev_type", "next_type")


ANOMALY_WINDOW = 50  # trailing rows (incl. current)
ANOMALY_MIN_N = 20  # warm-up before flagging
ANOMALY_Z = 3  # z-score threshold


def value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-window z-score anomaly detection per event_type, computed
    ENTIRELY in int64 — the float-discipline pattern this engine uses for
    cross-engine exactness, applied to monitoring.

    z² > Z² is algebraically rearranged to an integer comparison:
        (n·x − s)²·(n−1) > Z²·n·(n·s2 − s²)
    over integer-cents window sums (s, s2, n), so the anomaly decision is
    bit-identical on any engine and any partitioning — no σ rounding, no
    float accumulation order. Magnitudes stay < 2^47 at cents scale. One
    shuffle on event_type; the window sort is per-key.
    """
    events = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-(ANOMALY_WINDOW - 1), 0)
    )
    base = events.select(
        "event_id", "event_type", "ts", cents.alias("x")
    ).select(
        "event_id",
        "event_type",
        "x",
        F.count("*").over(w).alias("n"),
        F.sum("x").over(w).alias("s"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("s2"),
    )
    lhs = (F.col("n") * F.col("x") - F.col("s"))
    flagged = base.filter(
        (F.col("n") >= ANOMALY_MIN_N)
        & (
            lhs * lhs * (F.col("n") - 1)
            > F.lit(ANOMALY_Z * ANOMALY_Z)
            * F.col("n")
            * (F.col("n") * F.col("s2") - F.col("s") * F.col("s"))
        )
    )
    return flagged.select(
        "event_id",
        "event_type",
        F.round(F.col("x") / 100.0, 2).alias("value"),
        "n",
    ).orderBy("event_id")


CHURN_QUIET_PCT = 20  # trailing share of the time range with no activity


def churn_risk_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-risk roster: users active earlier in the corpus window but
    silent for its trailing CHURN_QUIET_PCT% — the re-engagement roster a
    growth team pulls; every user is emitted with their recency so the
    flag threshold can be re-tuned without recomputation. The quiet-period cutoff is integer epoch arithmetic
    on the corpus min/max (one 1-row broadcast aggregate, the
    `temporal_split` pattern); per-user last/first activity and event count
    come from one map-side-combined groupBy."""
    events = load_table(spark, sf_dir, "events")
    base = events.select("user_id", F.unix_timestamp("ts").alias("es"))
    bounds = base.agg(F.min("es").alias("mn"), F.max("es").alias("mx"))
    per_user = base.groupBy("user_id").agg(
        F.count("*").alias("n_events"),
        F.min("es").alias("first_es"),
        F.max("es").alias("last_es"),
    )
    joined = per_user.crossJoin(F.broadcast(bounds))
    cutoff = F.col("mx") - F.expr(
        f"((mx - mn) * {CHURN_QUIET_PCT}) DIV 100"
    )
    return joined.select(
        "user_id",
        "n_events",
        (F.col("mx") - F.col("last_es")).alias("silent_s"),
        (F.col("last_es") < cutoff).alias("at_risk"),
    ).orderBy("user_id")


WOW_ALERT_PCT = 0.30  # flag |week-over-week change| ≥ 30%


def weekly_change_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week volume alerting per event type: weekly counts, the
    WoW ratio, and an alert flag when volume moved ≥ WOW_ALERT_PCT in
    either direction — the paging rule monitoring stacks hang off event
    volumes. Integer week index (epoch days div 7) avoids engine week
    semantics; the lag window runs over the tiny (type, week) aggregate,
    guarded so a missing prior week yields NULL, not a wrong neighbor."""
    events = load_table(spark, sf_dir, "events")
    week = (F.datediff(F.to_date("ts"), F.lit(WEEK_EPOCH)) / 7).cast("long")
    weekly = (
        events.select("event_type", week.alias("week"))
        .groupBy("event_type", "week")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("event_type").orderBy("week")
    prior = F.when(
        F.lag("week").over(w) == F.col("week") - 1, F.lag("cnt").over(w)
    )
    ratio = F.round(F.col("cnt") / prior.cast("double"), 6)
    return weekly.select(
        "event_type",
        "week",
        "cnt",
        ratio.alias("wow_ratio"),
        F.when(
            ratio.isNotNull(),
            (F.abs(ratio - 1.0) >= WOW_ALERT_PCT),
        ).alias("alert"),
    ).orderBy("event_type", "week")


RETENTION_DAYS = (1, 7, 30)


def dn_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The D1/D7/D30 retention headline: of all users, what share came
    back exactly N days after their first activity (classic day-N
    definition). One pass builds each user's active-day offsets from their
    first day; the three flags are conditional maxes in the same
    groupBy — no per-day self-joins. Rates are integer count ratios."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    days = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).withColumn("first_day", F.min("day").over(w))
    offsets = days.select(
        "user_id", F.datediff("day", "first_day").cast("long").alias("off")
    )
    flags = offsets.groupBy("user_id").agg(
        *[
            F.max((F.col("off") == n).cast("long")).alias(f"d{n}")
            for n in RETENTION_DAYS
        ]
    )
    return flags.agg(
        F.count("*").alias("n_users"),
        *[
            F.round(F.sum(f"d{n}") / F.count("*").cast("double"), 6).alias(
                f"d{n}_rate"
            )
            for n in RETENTION_DAYS
        ],
    )


MAD_K = 3  # flag days with |cnt − median| > K × MAD


def daily_count_anomalies_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-volume anomaly detection per event_type: flag days whose
    event count deviates from the type's median by more than MAD_K× the
    median absolute deviation. MAD tolerates up to 50% outlier days, where
    `value_anomalies`' z-score window breaks down under heavy-tailed
    volume — the standard robust twin every monitoring stack keeps.

    Both medians are DISCRETE rank picks over integers (counts, then
    absolute deviations), and the flag compares integers (|dev| > K·MAD) —
    bit-identical across engines, no float at all. Every window and groupBy
    keys on event_type, so the whole plan shares one hash Exchange."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select("event_type", F.to_date("ts").alias("day"))
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("cnt"))
    )
    t = Window.partitionBy("event_type")
    r1 = daily.select(
        "event_type",
        "day",
        "cnt",
        F.row_number().over(t.orderBy("cnt", "day")).alias("rn"),
        F.count("*").over(t).alias("n"),
    )
    med = F.max(
        F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("cnt"))
    ).over(t)
    d2 = r1.select(
        "event_type",
        "day",
        "cnt",
        med.alias("med"),
        F.abs(F.col("cnt") - med).alias("dev"),
    )
    r2 = d2.select(
        "event_type",
        "day",
        "cnt",
        "med",
        "dev",
        F.row_number().over(t.orderBy("dev", "day")).alias("rn2"),
        F.count("*").over(t).alias("n2"),
    )
    mad = F.max(
        F.when(F.col("rn2") == F.expr("(n2 + 1) DIV 2"), F.col("dev"))
    ).over(t)
    flagged = r2.select(
        "event_type", "day", "cnt", "med", "dev", mad.alias("mad")
    ).filter(F.col("dev") > MAD_K * F.col("mad"))
    return flagged.select(
        "event_type",
        "day",
        "cnt",
        F.col("med").alias("median_cnt"),
        "mad",
    ).orderBy("event_type", "day")


def chars_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of document lengths: HIST_BUCKETS buckets of
    HIST_WIDTH chars, last bucket open-ended. Pure column expression +
    one tiny groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.least(
        F.floor(F.col("n_chars") / HIST_WIDTH), F.lit(HIST_BUCKETS - 1)
    ).cast("long")
    return (
        docs.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_docs"))
        .select(
            "bucket",
            (F.col("bucket") * HIST_WIDTH).alias("lo_chars"),
            "n_docs",
        )
        .orderBy("bucket")
    )


def activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour event counts — the traffic heatmap grid. ISO
    weekday numbering (Mon=1) avoids engine-specific DOW conventions; one
    map-side-combined groupBy on a ≤168-key space."""
    events = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    return (
        events.select(
            F.dayofweek(ts).alias("dow_raw"),
            F.hour(ts).alias("hour"),
        )
        # Spark dayofweek: Sun=1..Sat=7 → ISO Mon=1..Sun=7
        .select(
            ((F.col("dow_raw") + 5) % 7 + 1).cast("long").alias("iso_dow"),
            F.col("hour").cast("long").alias("hour"),
        )
        .groupBy("iso_dow", "hour")
        .agg(F.count("*").alias("n_events"))
        .orderBy("iso_dow", "hour")
    )


def top_docs_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top TOP_PER_LANG longest documents per language (deterministic
    doc_id tie-break) — the grouped-top-N pattern."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), "doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_PER_LANG)
        .select("lang", "rn", "doc_id", "n_chars")
        .orderBy("lang", "rn")
    )


def event_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basket-style co-occurrence: for every unordered pair of event types,
    how many users exhibit BOTH — the 2-itemset support table behind
    recommendation / feature-affinity analysis. The self-join runs on the
    DISTINCT (user, type) pairs, so per-user join work is bounded by the
    type-alphabet size (constant), never by the user's event count."""
    events = load_table(spark, sf_dir, "events")
    ut = events.select("user_id", "event_type").distinct()
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    return (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").alias("user_cnt"))
    )


def stickiness_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU/WAU stickiness per ISO week: average daily active users over the
    week divided by weekly active users — the canonical engagement ratio
    (1.0 = every weekly user shows up daily). Two exact-distinct
    aggregations (per-day, per-week) that share the user_id shuffle key;
    at 100 TB swap exact distincts for HLL sketches (the
    `distinct_users_approx` path) with the same plan shape."""
    events = load_table(spark, sf_dir, "events")
    base = events.select(
        F.weekofyear("ts").alias("week"),
        F.to_date("ts").alias("day"),
        "user_id",
    )
    dau = base.groupBy("week", "day").agg(
        F.countDistinct("user_id").alias("dau")
    )
    wau = base.groupBy("week").agg(F.countDistinct("user_id").alias("wau"))
    avg_dau = dau.groupBy("week").agg(
        F.count("*").alias("n_days"),
        F.round(F.sum("dau") / F.count("*").cast("double"), 4).alias("avg_dau"),
    )
    return (
        avg_dau.join(wau, "week")
        .select(
            "week",
            "n_days",
            "avg_dau",
            "wau",
            F.round(F.col("avg_dau") / F.col("wau").cast("double"), 6).alias(
                "stickiness"
            ),
        )
        .orderBy("week")
    )


CONVERSION_FROM = "signup"
CONVERSION_TO = "purchase"


def conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert report: for every user with both a signup and a
    later purchase, the seconds between their FIRST signup and the first
    purchase after it — then a one-row summary (converted users, min /
    median / max latency, mean) — the activation-latency number growth
    teams track.

    One conditional-min groupBy(user) computes first-signup and
    first-purchase-after-signup in a single pass over events (the
    `funnel_counts` trick — no per-stage self-join); the latency summary
    then runs on the per-user frame (converted users only). Median is a
    discrete rank pick over the bucketed two-phase global rank
    (`ranking.append_global_rank` — no single-reducer window even at
    billions of converted users), mean an integer-seconds sum — exact in
    both engines."""
    events = load_table(spark, sf_dir, "events")
    es = F.unix_timestamp("ts")
    per_user = (
        events.filter(F.col("event_type").isin(CONVERSION_FROM, CONVERSION_TO))
        .select("user_id", "event_type", es.alias("es"))
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == CONVERSION_FROM, F.col("es"))
            ).alias("first_from")
        )
        .join(
            events.filter(F.col("event_type") == CONVERSION_TO).select(
                "user_id", es.alias("to_es")
            ),
            "user_id",
        )
        .filter(F.col("to_es") >= F.col("first_from"))
        .groupBy("user_id", "first_from")
        .agg(F.min("to_es").alias("first_to"))
        .select(
            "user_id", (F.col("first_to") - F.col("first_from")).alias("lat_s")
        )
    )
    from ai_powered_data_pipeline_assistant_spark.operators.ranking import (
        append_global_rank,
    )

    # lazy materialize (execution.py policy) — computed once, auto-released
    per_user = per_user.transform(materialize)
    n = per_user.count()  # scalar; also materializes the checkpoint
    ranked = append_global_rank(
        per_user, [F.col("lat_s"), F.col("user_id")], "rn", n_rows=n
    ).withColumn("n", F.lit(n).cast("long"))
    med_rank = F.expr("(n + 1) DIV 2")
    return ranked.agg(
        F.max("n").alias("n_converted"),
        F.min("lat_s").alias("min_s"),
        F.max(F.when(F.col("rn") == med_rank, F.col("lat_s"))).alias("median_s"),
        F.max("lat_s").alias("max_s"),
        F.round(F.sum("lat_s") / F.count("*").cast("double"), 4).alias("mean_s"),
    )


def value_hour_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type Pearson correlation between event value and hour-of-day —
    the quick seasonality probe (do purchases spike at certain hours?)
    before committing to a full decomposition.

    Cross-engine exactness: `F.corr` accumulates floats in partition order,
    so instead the five sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²)
    accumulate as int64 over fixed-point cents × integer hours, and the
    final r = (nΣxy − ΣxΣy)/√((nΣx²−Σx²ᵗᵒᵗ)(nΣy²−Σy²ᵗᵒᵗ)) is one fixed
    shape of exactly-rounded double ops. Integer sums fit int64 through
    ~10¹² rows per group at these magnitudes; wider corpora move the sums
    to DECIMAL(38,0) with the same plan. One map-side-combined groupBy."""
    events = load_table(spark, sf_dir, "events")
    x = F.round(F.col("value") * 100).cast("long")
    y = F.hour("ts").cast("long")
    base = events.select("event_type", x.alias("x"), y.alias("y"))
    stats = base.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    cov = n * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = n * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = n * F.col("syy") - F.col("sy") * F.col("sy")
    return stats.select(
        "event_type",
        "n",
        F.round(cov / F.sqrt(vx * vy), 6).alias("pearson_r"),
    ).orderBy("event_type")


ORACLES: dict[str, str] = {
    "weekly_change_alerts": f"""
        WITH weekly AS (
            SELECT event_type,
                   CAST(datediff('day', DATE '{WEEK_EPOCH}', CAST(ts AS DATE))
                        // 7 AS BIGINT) AS week,
                   count(*) AS cnt
            FROM events GROUP BY 1, 2)
        SELECT event_type, week, cnt,
               round(cnt / CAST(CASE WHEN lag(week) OVER w = week - 1
                                     THEN lag(cnt) OVER w END AS DOUBLE), 6)
                   AS wow_ratio,
               CASE WHEN round(cnt / CAST(CASE WHEN lag(week) OVER w = week - 1
                                               THEN lag(cnt) OVER w
                                          END AS DOUBLE), 6) IS NOT NULL
                    THEN abs(round(cnt / CAST(CASE WHEN lag(week) OVER w
                                                        = week - 1
                                                   THEN lag(cnt) OVER w
                                              END AS DOUBLE), 6) - 1.0)
                         >= {WOW_ALERT_PCT}
               END AS alert
        FROM weekly
        WINDOW w AS (PARTITION BY event_type ORDER BY week)
        ORDER BY event_type, week
    """,
    "dn_retention": f"""
        WITH d AS (
            SELECT user_id, CAST(ts AS DATE) AS day,
                   min(CAST(ts AS DATE)) OVER (PARTITION BY user_id)
                       AS first_day
            FROM events),
        offs AS (
            SELECT user_id,
                   CAST(datediff('day', first_day, day) AS BIGINT) AS off
            FROM d),
        flags AS (
            SELECT user_id,
                   {", ".join(f"max(CASE WHEN off = {n} THEN 1 ELSE 0 END) AS d{n}" for n in RETENTION_DAYS)}
            FROM offs GROUP BY 1)
        SELECT count(*) AS n_users,
               {", ".join(f"round(CAST(sum(d{n}) AS BIGINT) / CAST(count(*) AS DOUBLE), 6) AS d{n}_rate" for n in RETENTION_DAYS)}
        FROM flags
    """,
    "churn_risk_flags": f"""
        WITH b AS (
            SELECT min(CAST(floor(epoch(ts)) AS BIGINT)) AS mn,
                   max(CAST(floor(epoch(ts)) AS BIGINT)) AS mx
            FROM events),
        per_user AS (
            SELECT user_id, count(*) AS n_events,
                   max(CAST(floor(epoch(ts)) AS BIGINT)) AS last_es
            FROM events GROUP BY 1)
        SELECT user_id, n_events, mx - last_es AS silent_s,
               last_es < mx - ((mx - mn) * {CHURN_QUIET_PCT}) // 100 AS at_risk
        FROM per_user CROSS JOIN b
        ORDER BY user_id
    """,
    "daily_count_anomalies_mad": f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS cnt
            FROM events GROUP BY 1, 2),
        r1 AS (
            SELECT event_type, day, cnt,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY cnt, day) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM daily),
        d2 AS (
            SELECT event_type, day, cnt,
                   max(CASE WHEN rn = (n + 1) // 2 THEN cnt END)
                       OVER (PARTITION BY event_type) AS med
            FROM r1),
        d3 AS (
            SELECT event_type, day, cnt, med, abs(cnt - med) AS dev
            FROM d2),
        r2 AS (
            SELECT event_type, day, cnt, med, dev,
                   row_number() OVER (PARTITION BY event_type
                                      ORDER BY dev, day) AS rn2,
                   count(*) OVER (PARTITION BY event_type) AS n2
            FROM d3),
        d4 AS (
            SELECT event_type, day, cnt, med, dev,
                   max(CASE WHEN rn2 = (n2 + 1) // 2 THEN dev END)
                       OVER (PARTITION BY event_type) AS mad
            FROM r2)
        SELECT event_type, day, cnt, med AS median_cnt, mad
        FROM d4 WHERE dev > {MAD_K} * mad
        ORDER BY event_type, day
    """,
    "stickiness_report": """
        WITH base AS (
            SELECT weekofyear(ts) AS week, CAST(ts AS DATE) AS day, user_id
            FROM events),
        dau AS (SELECT week, day, count(DISTINCT user_id) AS dau
                FROM base GROUP BY 1, 2),
        wau AS (SELECT week, count(DISTINCT user_id) AS wau
                FROM base GROUP BY 1),
        a AS (SELECT week, count(*) AS n_days,
                     round(CAST(sum(dau) AS BIGINT)
                           / CAST(count(*) AS DOUBLE), 4) AS avg_dau
              FROM dau GROUP BY 1)
        SELECT a.week, n_days, avg_dau, wau,
               round(avg_dau / CAST(wau AS DOUBLE), 6) AS stickiness
        FROM a JOIN wau USING (week) ORDER BY week
    """,
    "conversion_latency": f"""
        WITH f AS (
            SELECT user_id,
                   min(CASE WHEN event_type = '{CONVERSION_FROM}'
                            THEN CAST(floor(epoch(ts)) AS BIGINT) END)
                       AS first_from
            FROM events
            WHERE event_type IN ('{CONVERSION_FROM}', '{CONVERSION_TO}')
            GROUP BY 1),
        p AS (
            SELECT e.user_id, f.first_from,
                   min(CAST(floor(epoch(e.ts)) AS BIGINT)) AS first_to
            FROM events e JOIN f ON e.user_id = f.user_id
            WHERE e.event_type = '{CONVERSION_TO}'
              AND CAST(floor(epoch(e.ts)) AS BIGINT) >= f.first_from
            GROUP BY 1, 2),
        lat AS (SELECT user_id, first_to - first_from AS lat_s FROM p),
        ranked AS (
            SELECT lat_s, user_id,
                   row_number() OVER (ORDER BY lat_s, user_id) AS rn,
                   count(*) OVER () AS n
            FROM lat)
        SELECT max(n) AS n_converted, min(lat_s) AS min_s,
               max(CASE WHEN rn = (n + 1) // 2 THEN lat_s END) AS median_s,
               max(lat_s) AS max_s,
               round(CAST(sum(lat_s) AS BIGINT) / CAST(count(*) AS DOUBLE), 4)
                   AS mean_s
        FROM ranked
    """,
    "value_hour_correlation": """
        WITH base AS (
            SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS x,
                   CAST(hour(ts) AS BIGINT) AS y
            FROM events),
        stats AS (
            SELECT event_type, count(*) AS n,
                   CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx,
                   CAST(sum(y * y) AS BIGINT) AS syy
            FROM base GROUP BY 1)
        SELECT event_type, n,
               round((CAST(n AS DOUBLE) * sxy - sx * sy)
                     / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                            * (CAST(n AS DOUBLE) * syy - sy * sy)), 6)
                   AS pearson_r
        FROM stats ORDER BY event_type
    """,
    "event_cooccurrence": """
        WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               count(*) AS user_cnt
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    """,
    "funnel_counts": """
        WITH per_user AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                   min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                   min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
            FROM events GROUP BY user_id),
        flags AS (
            SELECT CAST(t_view IS NOT NULL AS BIGINT) AS s1,
                   CAST(t_view IS NOT NULL AND t_click IS NOT NULL
                        AND t_click >= t_view AS BIGINT) AS s2,
                   CAST(t_view IS NOT NULL AND t_click IS NOT NULL
                        AND t_click >= t_view AND t_purchase IS NOT NULL
                        AND t_purchase >= t_click AS BIGINT) AS s3
            FROM per_user),
        totals AS (SELECT sum(s1) AS n1, sum(s2) AS n2, sum(s3) AS n3
                   FROM flags)
        SELECT CAST(1 AS BIGINT) AS stage_idx, 'view' AS stage,
               CAST(n1 AS BIGINT) AS n_users FROM totals
        UNION ALL
        SELECT 2, 'click', CAST(n2 AS BIGINT) FROM totals
        UNION ALL
        SELECT 3, 'purchase', CAST(n3 AS BIGINT) FROM totals
        ORDER BY stage_idx
    """,
    "cohort_retention": f"""
        WITH d AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
        f AS (SELECT user_id, day,
                     min(day) OVER (PARTITION BY user_id) AS first_day
              FROM d)
        SELECT CAST(datediff('day', DATE '{WEEK_EPOCH}', first_day) // 7
                    AS BIGINT) AS cohort_week,
               CAST(datediff('day', first_day, day) // 7 AS BIGINT)
                   AS week_offset,
               count(DISTINCT user_id) AS n_users
        FROM f GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "daily_counts_gapfill": """
        WITH bounds AS (SELECT min(CAST(ts AS DATE)) AS lo,
                               max(CAST(ts AS DATE)) AS hi FROM events),
        calendar AS (SELECT CAST(unnest(generate_series(lo, hi,
                         INTERVAL 1 DAY)) AS DATE) AS day FROM bounds),
        types AS (SELECT DISTINCT event_type FROM events),
        counts AS (SELECT CAST(ts AS DATE) AS day, event_type,
                          count(*) AS n
                   FROM events GROUP BY 1, 2)
        SELECT c.day, t.event_type,
               CAST(coalesce(n, 0) AS BIGINT) AS n_events
        FROM calendar c CROSS JOIN types t
        LEFT JOIN counts k ON k.day = c.day AND k.event_type = t.event_type
        ORDER BY c.day, t.event_type
    """,
    "event_gaps": """
        WITH g AS (
            SELECT user_id,
                   epoch_us(ts) - lag(epoch_us(ts)) OVER
                       (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
            FROM events)
        SELECT user_id, count(*) AS n_events,
               round(avg(gap_us), 4) AS avg_gap_us,
               max(gap_us) AS max_gap_us
        FROM g GROUP BY user_id ORDER BY user_id
    """,
    "event_transitions": """
        WITH pairs AS (
            SELECT lag(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS prev_type,
                   event_type AS next_type
            FROM events),
        counts AS (
            SELECT prev_type, next_type, count(*) AS n
            FROM pairs WHERE prev_type IS NOT NULL GROUP BY 1, 2)
        SELECT prev_type, next_type, n,
               round(n / CAST(CAST(sum(n) OVER (PARTITION BY prev_type)
                                   AS BIGINT) AS DOUBLE), 6) AS p_transition
        FROM counts ORDER BY prev_type, next_type
    """,
    "value_anomalies": f"""
        WITH base AS (
            SELECT event_id, event_type,
                   CAST(round(value * 100) AS BIGINT) AS x,
                   count(*) OVER w AS n,
                   sum(CAST(round(value * 100) AS BIGINT)) OVER w AS s,
                   sum(CAST(round(value * 100) AS BIGINT)
                       * CAST(round(value * 100) AS BIGINT)) OVER w AS s2
            FROM events
            WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                         ROWS BETWEEN {ANOMALY_WINDOW - 1} PRECEDING
                                  AND CURRENT ROW))
        SELECT event_id, event_type, round(x / 100.0, 2) AS value, n
        FROM base
        WHERE n >= {ANOMALY_MIN_N}
          AND CAST((n * x - s) AS BIGINT) * CAST((n * x - s) AS BIGINT)
              * (n - 1)
              > {ANOMALY_Z * ANOMALY_Z} * n
                * CAST((n * s2 - s * s) AS BIGINT)
        ORDER BY event_id
    """,
    "chars_histogram": f"""
        WITH b AS (SELECT least(n_chars // {HIST_WIDTH},
                               {HIST_BUCKETS - 1}) AS bucket
                   FROM documents)
        SELECT CAST(bucket AS BIGINT) AS bucket,
               CAST(bucket * {HIST_WIDTH} AS BIGINT) AS lo_chars,
               count(*) AS n_docs
        FROM b GROUP BY bucket ORDER BY bucket
    """,
    "activity_heatmap": """
        SELECT isodow(ts) AS iso_dow, CAST(hour(ts) AS BIGINT) AS hour,
               count(*) AS n_events
        FROM events GROUP BY 1, 2 ORDER BY 1, 2
    """,
    "top_docs_per_lang": f"""
        WITH ranked AS (
            SELECT lang, doc_id, n_chars,
                   row_number() OVER (PARTITION BY lang
                       ORDER BY n_chars DESC, doc_id) AS rn
            FROM documents)
        SELECT lang, CAST(rn AS BIGINT) AS rn, doc_id, n_chars
        FROM ranked WHERE rn <= {TOP_PER_LANG} ORDER BY lang, rn
    """,
}

QUERIES = {
    "funnel_counts": funnel_counts,
    "value_anomalies": value_anomalies,
    "cohort_retention": cohort_retention,
    "daily_counts_gapfill": daily_counts_gapfill,
    "event_gaps": event_gaps,
    "chars_histogram": chars_histogram,
    "top_docs_per_lang": top_docs_per_lang,
    "activity_heatmap": activity_heatmap,
    "event_transitions": event_transitions,
    "event_cooccurrence": event_cooccurrence,
    "value_hour_correlation": value_hour_correlation,
    "conversion_latency": conversion_latency,
    "stickiness_report": stickiness_report,
    "daily_count_anomalies_mad": daily_count_anomalies_mad,
    "churn_risk_flags": churn_risk_flags,
    "weekly_change_alerts": weekly_change_alerts,
    "dn_retention": dn_retention,
}


# ---------------------------------------------------------------------------
# Exponential time-decay engagement scoring
# ---------------------------------------------------------------------------

DECAY_HALF_LIFE_DAYS = 7
DECAY_SCALE = 1_000_000
DECAY_TOP_K = 20


def decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``DECAY_TOP_K`` users by exponentially time-decayed event count —
    the standard recency-weighted engagement / feature-store primitive:
    score = sum over events of 2^(-age_days / half_life), anchored at the
    corpus's newest event so the result is a pure function of the data.

    Cross-engine exactness discipline: each event's decay factor is computed
    in ONE fixed association order — exp(-(ln(2)/H) * ((ref_us - us) /
    86400e6)) — then rounded to an int64 at ``DECAY_SCALE`` BEFORE summing
    (the unigram_logprob rule: round each term once, sum exactly as
    integers), so partition/order float drift cannot touch the total.

    Scale (100 TB): the anchor is a 1-row broadcast max; the per-user sum is
    one map-side-combined groupBy; the top-K is TakeOrdered over user
    aggregates, never a global sort of events.
    """
    events = load_table(spark, sf_dir, "events", parallelize=True)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    ev = events.select("user_id", us.alias("us"))
    ref = ev.agg(F.max("us").alias("ref_us"))
    term = F.round(
        F.exp(
            -(F.log(F.lit(2.0)) / F.lit(float(DECAY_HALF_LIFE_DAYS)))
            * ((F.col("ref_us") - F.col("us")) / F.lit(86400000000.0))
        )
        * DECAY_SCALE,
        0,
    ).cast("long")
    per_user = (
        ev.crossJoin(F.broadcast(ref))
        .select("user_id", term.alias("t"))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("t") / F.lit(float(DECAY_SCALE)), 6).alias(
                "decay_score"
            ),
        )
    )
    return (
        per_user.orderBy(F.desc("decay_score"), "user_id")
        .limit(DECAY_TOP_K)
        .orderBy(F.desc("decay_score"), "user_id")
    )


QUERIES["decayed_engagement"] = decayed_engagement

ORACLES["decayed_engagement"] = rf"""
    WITH ev AS (
        SELECT user_id, epoch_us(ts) AS us FROM events),
    ref AS (SELECT max(us) AS ref_us FROM ev),
    terms AS (
        SELECT user_id,
               CAST(round(exp(-(ln(2) / {float(DECAY_HALF_LIFE_DAYS)})
                              * ((ref_us - us) / 86400000000.0))
                          * {DECAY_SCALE}, 0) AS BIGINT) AS t
        FROM ev CROSS JOIN ref),
    per_user AS (
        SELECT user_id, count(*) AS n_events,
               round(CAST(sum(t) AS BIGINT) / {float(DECAY_SCALE)}, 6)
                   AS decay_score
        FROM terms GROUP BY user_id)
    SELECT user_id, n_events, decay_score
    FROM (SELECT * FROM per_user
          ORDER BY decay_score DESC, user_id LIMIT {DECAY_TOP_K})
    ORDER BY decay_score DESC, user_id
"""


def dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index per event type: observed daily-of-week
    count vs the uniform expectation (total/7). Index > 1 = overrepresented
    weekday — the signal behind traffic-aware sampling windows and anomaly
    baselines. One map-side-combined groupBy on a ≤ 7·|types| key space;
    the normalizing window runs on that tiny aggregate."""
    events = load_table(spark, sf_dir, "events")
    ts = F.col("ts").cast("timestamp")
    dow = F.when(F.dayofweek(ts) == 1, 7).otherwise(F.dayofweek(ts) - 1)
    counts = (
        events.select(F.col("event_type"), dow.alias("iso_dow"))
        .groupBy("event_type", "iso_dow")
        .agg(F.count("*").alias("cnt"))
    )
    total_w = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        F.col("iso_dow").cast("long").alias("iso_dow"),
        "cnt",
        F.round(
            F.col("cnt") * 7 / F.sum("cnt").over(total_w).cast("double"), 6
        ).alias("seasonality_idx"),
    ).orderBy("event_type", "iso_dow")


QUERIES["dow_seasonality"] = dow_seasonality

ORACLES["dow_seasonality"] = """
    WITH counts AS (
        SELECT event_type, CAST(isodow(ts) AS BIGINT) AS iso_dow,
               count(*) AS cnt
        FROM events GROUP BY 1, 2)
    SELECT event_type, iso_dow, cnt,
           round(cnt * 7 / CAST(CAST(sum(cnt) OVER (PARTITION BY event_type)
                                     AS BIGINT) AS DOUBLE), 6)
               AS seasonality_idx
    FROM counts ORDER BY event_type, iso_dow
"""


AB_SCALE = 100  # fixed-point (cents) for order-free value moments; x^2 sums
# stay < 2^63 up to ~1e8 rows per (type, arm) — move to DECIMAL(38,0) beyond
AB_Z = 1.96  # 95% two-sided


def ab_test_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users are deterministically bucketed into
    two arms (md5(user_id) parity — stable under re-runs, no RNG state),
    and each event type's mean `value` is compared across arms with a
    Welch z-test. The experimentation-platform shape: assignment is a pure
    column expression on the scan, per-arm moments are ONE map-side-
    combined groupBy (int64-scaled sums, order-free — same exactness trick
    as `embedding_drift_report`), and the test statistic is arithmetic on
    a ≤ |event types| aggregate.
    """
    from ai_powered_data_pipeline_assistant_spark.functions.hashing import md5_int

    events = load_table(spark, sf_dir, "events")
    arm = (md5_int(F.col("user_id").cast("string")) % 2).alias("arm")
    x = F.round(F.col("value") * AB_SCALE, 0).cast("long").alias("x")
    stats = (
        events.select("event_type", arm, x)
        .groupBy("event_type", "arm")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").alias("sx"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
        )
    )
    a = stats.filter(F.col("arm") == 0).select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("sx").alias("sxa"),
        F.col("sxx").alias("sxxa"),
    )
    b = stats.filter(F.col("arm") == 1).select(
        "event_type",
        F.col("n").alias("n_b"),
        F.col("sx").alias("sxb"),
        F.col("sxx").alias("sxxb"),
    )
    j = a.join(b, "event_type")
    na = F.col("n_a").cast("double")
    nb = F.col("n_b").cast("double")
    ma = F.col("sxa") / na
    mb = F.col("sxb") / nb
    var_a = (F.col("sxxa") - F.col("sxa") * F.col("sxa") / na) / na
    var_b = (F.col("sxxb") - F.col("sxb") * F.col("sxb") / nb) / nb
    return j.select(
        "event_type",
        "n_a",
        "n_b",
        F.round(ma / AB_SCALE, 6).alias("mean_a"),
        F.round(mb / AB_SCALE, 6).alias("mean_b"),
        ((mb - ma) * (mb - ma) / (var_a / na + var_b / nb) > AB_Z * AB_Z).alias(
            "significant"
        ),
    ).orderBy("event_type")


QUERIES["ab_test_report"] = ab_test_report


def _ab_oracle() -> str:
    from ai_powered_data_pipeline_assistant_spark.functions.hashing import md5_int_sql

    return f"""
        WITH vals AS (
            SELECT event_type,
                   {md5_int_sql("CAST(user_id AS VARCHAR)")} % 2 AS arm,
                   CAST(round(value * {AB_SCALE}, 0) AS BIGINT) AS x
            FROM events),
        stats AS (
            SELECT event_type, arm, count(*) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(x * x) AS BIGINT) AS sxx
            FROM vals GROUP BY 1, 2),
        j AS (
            SELECT a.event_type,
                   a.n AS n_a, CAST(a.n AS DOUBLE) AS na, a.sx AS sxa, a.sxx AS sxxa,
                   b.n AS n_b, CAST(b.n AS DOUBLE) AS nb, b.sx AS sxb, b.sxx AS sxxb
            FROM stats a JOIN stats b USING (event_type)
            WHERE a.arm = 0 AND b.arm = 1)
        SELECT event_type, n_a, n_b,
               round(sxa / na / {AB_SCALE}, 6) AS mean_a,
               round(sxb / nb / {AB_SCALE}, 6) AS mean_b,
               (sxb / nb - sxa / na) * (sxb / nb - sxa / na)
                   / (((sxxa - sxa * sxa / na) / na) / na
                      + ((sxxb - sxb * sxb / nb) / nb) / nb)
                   > {AB_Z * AB_Z} AS significant
        FROM j ORDER BY event_type
    """


ORACLES["ab_test_report"] = _ab_oracle()


FC_TRAIN_PCT = 80


def forecast_baseline_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline bake-off per event type: hold out the last 20% of
    the date range, forecast each test day's volume with (a) naive
    (last train-day count) and (b) train-mean baselines, and report both
    MAEs — the readout that decides what an alerting threshold or capacity
    forecast should regress against. Evaluated on days with ≥1 event
    (gap days are a gap-fill concern, see `daily_counts_gapfill`).

    Exactness: day indexes and counts are integers; cutoff is integer DIV
    arithmetic on the 1-row broadcast min/max; the train mean is the same
    IEEE sx/n double on both engines.

    Scale: ONE map-side-combined groupBy over the facts builds the daily
    frame (days × types rows); everything after runs on that tiny
    aggregate — per-type last-train pick is a grouped-top-1 window, and
    the forecasts join back broadcast.
    """
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            "event_type",
            F.datediff(F.to_date("ts"), F.lit(WEEK_EPOCH)).cast("long").alias("day_idx"),
        )
        .groupBy("event_type", "day_idx")
        .agg(F.count("*").alias("cnt"))
    )
    bounds = daily.agg(F.min("day_idx").alias("mn"), F.max("day_idx").alias("mx")).select(
        F.expr(f"mn + ((mx - mn) * {FC_TRAIN_PCT}) DIV 100").alias("cutoff")
    )
    tagged = daily.crossJoin(F.broadcast(bounds))
    train = tagged.filter(F.col("day_idx") < F.col("cutoff"))
    test = tagged.filter(F.col("day_idx") >= F.col("cutoff"))
    last_w = Window.partitionBy("event_type").orderBy(F.desc("day_idx"))
    naive = (
        train.withColumn("rn", F.row_number().over(last_w))
        .filter(F.col("rn") == 1)
        .select("event_type", F.col("cnt").alias("naive_fc"))
    )
    mean = train.groupBy("event_type").agg(
        F.sum("cnt").alias("sx"), F.count("*").alias("nd")
    )
    return (
        test.join(F.broadcast(naive), "event_type")
        .join(F.broadcast(mean), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_test_days"),
            F.round(F.avg(F.abs(F.col("cnt") - F.col("naive_fc"))), 6).alias(
                "mae_naive"
            ),
            F.round(
                F.avg(
                    F.abs(
                        F.col("cnt")
                        - F.col("sx") / F.col("nd").cast("double")
                    )
                ),
                6,
            ).alias("mae_mean"),
        )
        .withColumn("mean_wins", F.col("mae_mean") <= F.col("mae_naive"))
        .orderBy("event_type")
    )


QUERIES["forecast_baseline_report"] = forecast_baseline_report

ORACLES["forecast_baseline_report"] = f"""
    WITH daily AS (
        SELECT event_type,
               CAST(datediff('day', DATE '{WEEK_EPOCH}', CAST(ts AS DATE))
                    AS BIGINT) AS day_idx,
               count(*) AS cnt
        FROM events GROUP BY 1, 2),
    b AS (
        SELECT min(day_idx) + ((max(day_idx) - min(day_idx))
                               * {FC_TRAIN_PCT}) // 100 AS cutoff
        FROM daily),
    train AS (SELECT d.* FROM daily d CROSS JOIN b WHERE day_idx < cutoff),
    test AS (SELECT d.* FROM daily d CROSS JOIN b WHERE day_idx >= cutoff),
    naive AS (
        SELECT event_type, cnt AS naive_fc
        FROM train
        QUALIFY row_number() OVER (PARTITION BY event_type
                                   ORDER BY day_idx DESC) = 1),
    m AS (
        SELECT event_type, CAST(sum(cnt) AS BIGINT) AS sx, count(*) AS nd
        FROM train GROUP BY 1)
    SELECT t.event_type,
           count(*) AS n_test_days,
           round(avg(abs(t.cnt - n.naive_fc)), 6) AS mae_naive,
           round(avg(abs(t.cnt - m.sx / CAST(m.nd AS DOUBLE))), 6) AS mae_mean,
           round(avg(abs(t.cnt - m.sx / CAST(m.nd AS DOUBLE))), 6)
               <= round(avg(abs(t.cnt - n.naive_fc)), 6) AS mean_wins
    FROM test t
    JOIN naive n USING (event_type)
    JOIN m USING (event_type)
    GROUP BY 1
    ORDER BY 1
"""


def ab_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B conversion readout: the full view→click→purchase funnel
    (`funnel_counts` ordering semantics) evaluated per experiment arm
    (md5(user_id) parity, same assignment as `ab_test_report`), with a
    pooled two-proportion z-test on the end-to-end conversion rate.

    Everything reduces to integers (per-arm user and converter counts), so
    both engines compute the identical IEEE test statistic; the decision
    threshold compares against z² = 1.96². One conditional-min groupBy
    over the facts (the `funnel_counts` plan) plus a 2-row aggregate.
    """
    from ai_powered_data_pipeline_assistant_spark.functions.hashing import md5_int

    events = load_table(spark, sf_dir, "events")
    arm = (md5_int(F.col("user_id").cast("string")) % 2).alias("arm")
    mins = [
        F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t_{s}")
        for s in FUNNEL_STAGES
    ]
    per_user = events.select("user_id", arm, "event_type", "ts").groupBy(
        "user_id", "arm"
    ).agg(*mins)
    flags = per_user.select(
        "arm",
        F.col("t_view").isNotNull().cast("long").alias("entered"),
        (
            F.col("t_view").isNotNull()
            & F.col("t_click").isNotNull()
            & (F.col("t_click") >= F.col("t_view"))
            & F.col("t_purchase").isNotNull()
            & (F.col("t_purchase") >= F.col("t_click"))
        ).cast("long").alias("converted"),
    )
    per_arm = flags.groupBy("arm").agg(
        F.sum("entered").alias("n"), F.sum("converted").alias("conv")
    )
    a = per_arm.filter(F.col("arm") == 0).select(
        F.col("n").alias("n_a"), F.col("conv").alias("conv_a")
    )
    b = per_arm.filter(F.col("arm") == 1).select(
        F.col("n").alias("n_b"), F.col("conv").alias("conv_b")
    )
    j = a.crossJoin(F.broadcast(b))
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    pa, pb = F.col("conv_a") / na, F.col("conv_b") / nb
    pooled = (F.col("conv_a") + F.col("conv_b")) / (na + nb)
    z2 = (pa - pb) * (pa - pb) / (
        pooled * (F.lit(1.0) - pooled) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    return j.select(
        "n_a",
        "conv_a",
        F.round(pa, 6).alias("rate_a"),
        "n_b",
        "conv_b",
        F.round(pb, 6).alias("rate_b"),
        (z2 > AB_Z * AB_Z).alias("significant"),
    )


QUERIES["ab_funnel_report"] = ab_funnel_report


def _ab_funnel_oracle() -> str:
    from ai_powered_data_pipeline_assistant_spark.functions.hashing import md5_int_sql

    return f"""
        WITH per_user AS (
            SELECT user_id,
                   {md5_int_sql("CAST(user_id AS VARCHAR)")} % 2 AS arm,
                   min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
                   min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
                   min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
            FROM events GROUP BY 1, 2),
        flags AS (
            SELECT arm,
                   CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END AS entered,
                   CASE WHEN t_view IS NOT NULL AND t_click IS NOT NULL
                             AND t_click >= t_view
                             AND t_purchase IS NOT NULL
                             AND t_purchase >= t_click
                        THEN 1 ELSE 0 END AS converted
            FROM per_user),
        per_arm AS (
            SELECT arm, CAST(sum(entered) AS BIGINT) AS n,
                   CAST(sum(converted) AS BIGINT) AS conv
            FROM flags GROUP BY 1),
        j AS (
            SELECT a.n AS n_a, a.conv AS conv_a, b.n AS n_b, b.conv AS conv_b
            FROM per_arm a CROSS JOIN per_arm b
            WHERE a.arm = 0 AND b.arm = 1)
        SELECT n_a, conv_a, round(conv_a / CAST(n_a AS DOUBLE), 6) AS rate_a,
               n_b, conv_b, round(conv_b / CAST(n_b AS DOUBLE), 6) AS rate_b,
               (conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE))
               * (conv_a / CAST(n_a AS DOUBLE) - conv_b / CAST(n_b AS DOUBLE))
               / ((conv_a + conv_b) / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                  * (1.0 - (conv_a + conv_b)
                           / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)))
                  * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
               > {AB_Z * AB_Z} AS significant
        FROM j
    """


ORACLES["ab_funnel_report"] = _ab_funnel_oracle()


def wow_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contribution analysis for the latest week-over-week volume change:
    per (event_type) segment, its event-count delta between the last two
    FULL weeks and the share of the total delta it explains — the
    "what drove the drop?" decomposition that turns a paging alert
    (`weekly_change_alerts`) into a diagnosis.

    Integer week indexes (same WEEK_EPOCH convention as
    `cohort_retention`); the two-week window is derived from a broadcast
    1-row max-week aggregate; everything else is one map-side-combined
    groupBy and arithmetic on a ≤ |types| frame.
    """
    events = load_table(spark, sf_dir, "events")
    week = (
        F.datediff(F.to_date("ts"), F.lit(WEEK_EPOCH)).cast("long") / 7
    ).cast("long")
    weekly = (
        events.select(F.col("event_type"), week.alias("week"))
        .groupBy("event_type", "week")
        .agg(F.count("*").alias("cnt"))
    )
    latest = weekly.agg(F.max("week").alias("wk"))
    two = weekly.join(F.broadcast(latest), on=F.expr("week IN (wk, wk - 1)")).select(
        "event_type",
        F.when(F.col("week") == F.col("wk"), F.lit("cur"))
        .otherwise(F.lit("prev"))
        .alias("which"),
        "cnt",
    )
    wide = (
        two.groupBy("event_type")
        .pivot("which", ["prev", "cur"])
        .sum("cnt")
        .select(
            "event_type",
            F.coalesce("prev", F.lit(0)).alias("prev_cnt"),
            F.coalesce("cur", F.lit(0)).alias("cur_cnt"),
        )
    )
    total_w = Window.partitionBy()
    delta = F.col("cur_cnt") - F.col("prev_cnt")
    total_delta = F.sum(delta).over(total_w)
    return wide.select(
        "event_type",
        "prev_cnt",
        "cur_cnt",
        delta.alias("delta"),
        F.when(
            total_delta != 0,
            F.round(delta / total_delta.cast("double"), 6),
        ).alias("share_of_change"),
    ).orderBy("event_type")


QUERIES["wow_contribution"] = wow_contribution

ORACLES["wow_contribution"] = f"""
    WITH weekly AS (
        SELECT event_type,
               CAST(datediff('day', DATE '{WEEK_EPOCH}', CAST(ts AS DATE))
                    // 7 AS BIGINT) AS week,
               count(*) AS cnt
        FROM events GROUP BY 1, 2),
    latest AS (SELECT max(week) AS wk FROM weekly),
    wide AS (
        SELECT event_type,
               CAST(coalesce(sum(CASE WHEN week = wk - 1 THEN cnt END), 0)
                    AS BIGINT) AS prev_cnt,
               CAST(coalesce(sum(CASE WHEN week = wk THEN cnt END), 0)
                    AS BIGINT) AS cur_cnt
        FROM weekly CROSS JOIN latest
        WHERE week IN (wk, wk - 1)
        GROUP BY 1)
    SELECT event_type, prev_cnt, cur_cnt,
           cur_cnt - prev_cnt AS delta,
           CASE WHEN CAST(sum(cur_cnt - prev_cnt) OVER () AS BIGINT) <> 0
                THEN round((cur_cnt - prev_cnt)
                           / CAST(CAST(sum(cur_cnt - prev_cnt) OVER ()
                                       AS BIGINT) AS DOUBLE), 6)
           END AS share_of_change
    FROM wide ORDER BY event_type
"""
