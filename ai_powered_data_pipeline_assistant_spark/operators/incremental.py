"""Incremental-maintenance operators: partial-aggregate rollup merge and
SCD Type-2 dimension versioning.

Both are the batch shapes behind a lakehouse's nightly maintenance jobs.
The reference's closest analogue is its counter-upsert maintenance SQL
(reference Supabase/knowledge_base_Maintenance.sql:15-22); these operators
generalize it to (a) mergeable aggregate state and (b) full history-keeping
dimension updates.

- ``incremental_daily_rollup`` — the COMMUTATIVE-MONOID property that makes
  aggregation incremental: yesterday's rollup (already aggregated) merges
  with today's delta partition by summing partial states — the base table
  is never rescanned. Demonstrated here by splitting events at a cut date:
  the "existing rollup" side aggregates once, the "new batch" side
  aggregates once, and the merge is a sum over day keys. Counts and
  integer-cents sums are mergeable; avg is derived at read time (never
  stored — averages don't merge).

- ``scd2_apply`` — Slowly-Changing-Dimension type 2: an update batch closes
  the current version of each changed key (valid_to set) and appends a new
  open version. The update batch is small next to the dimension, so the
  change-key membership joins are broadcast; on Delta/Iceberg the same
  logic is the canonical two-action MERGE.

Scale notes: rollup merge shuffles only day-keyed partial states (days ×
1 row, regardless of event volume); scd2's anti/semi joins broadcast the
update keys — the dimension scan never shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table

ROLLUP_CUT = "2024-01-25"  # existing rollup covers days <= cut
SCD_MOD = 7  # customers with c_custkey % SCD_MOD == 0 receive an update
SCD_NEW_SEGMENT = "MIGRATED"


def incremental_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge an existing daily rollup with a new batch's partial aggregate;
    result must equal the full recompute (which is what the oracle runs)."""
    events = load_table(spark, sf_dir, "events")
    day = F.to_date("ts")
    cents = F.round(F.col("value") * 100).cast("long")

    def partial(df: DataFrame) -> DataFrame:
        return df.groupBy(day.alias("day")).agg(
            F.count("*").alias("n_events"),
            F.sum(cents).alias("cents"),
        )

    existing = partial(events.filter(day <= F.lit(ROLLUP_CUT)))
    delta = partial(events.filter(day > F.lit(ROLLUP_CUT)))
    return (
        existing.unionByName(delta)
        .groupBy("day")
        .agg(
            F.sum("n_events").cast("long").alias("n_events"),
            F.sum("cents").cast("long").alias("cents"),
        )
        .select(
            "day",
            "n_events",
            F.round(F.col("cents") / (F.col("n_events") * 100.0), 4).alias(
                "avg_value"
            ),
        )
        .orderBy("day")
    )


def scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 over the customer dimension: segment migration for every
    SCD_MOD-th key closes version 1 and opens version 2. Returns the full
    versioned dimension (key, segment, version, valid_from, valid_to)."""
    cust = load_table(spark, sf_dir, "customer")
    current = cust.select("c_custkey", F.col("c_mktsegment").alias("segment"))
    updates = current.filter(F.col("c_custkey") % SCD_MOD == 0).select(
        "c_custkey", F.lit(SCD_NEW_SEGMENT).alias("new_segment")
    )
    v1_open = F.lit(1).alias("version"), F.lit(0).alias("valid_from"), F.lit(
        None
    ).cast("int").alias("valid_to")
    unchanged = current.join(
        F.broadcast(updates), "c_custkey", "left_anti"
    ).select("c_custkey", "segment", *v1_open)
    closed = current.join(
        F.broadcast(updates), "c_custkey", "left_semi"
    ).select(
        "c_custkey",
        "segment",
        F.lit(1).alias("version"),
        F.lit(0).alias("valid_from"),
        F.lit(1).cast("int").alias("valid_to"),
    )
    opened = updates.select(
        "c_custkey",
        F.col("new_segment").alias("segment"),
        F.lit(2).alias("version"),
        F.lit(1).alias("valid_from"),
        F.lit(None).cast("int").alias("valid_to"),
    )
    return (
        unchanged.unionByName(closed)
        .unionByName(opened)
        .orderBy("c_custkey", "version")
    )


DIFF_DEL_MOD = 13  # keys deleted in the "new" snapshot
DIFF_UPD_MOD = 11  # keys whose text is rewritten
DIFF_ADD_MOD = 17  # keys cloned as additions
DIFF_ADD_OFFSET = 1_000_000


def snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-version diff: classify every key across two snapshots as
    added / removed / modified / unchanged and count each class — the
    audit every data-versioning workflow (Delta time travel, LakeFS,
    dataset releases) runs between versions.

    The "new" snapshot is derived deterministically from documents
    (deletions, text rewrites, key-shifted additions) so the expected
    classes are oracle-checkable. Comparison is one full-outer join on the
    key with md5 content fingerprints — content hashing means the diff
    never moves document bodies through the shuffle, only 16-byte digests.
    """
    docs = load_table(spark, sf_dir, "documents")
    old = docs.select("doc_id", F.md5("text").alias("o_h"))
    new_text = F.when(
        F.col("doc_id") % DIFF_UPD_MOD == 0, F.upper(F.col("text"))
    ).otherwise(F.col("text"))
    new = (
        docs.filter(F.col("doc_id") % DIFF_DEL_MOD != 0)
        .select("doc_id", F.md5(new_text).alias("n_h"))
        .unionByName(
            docs.filter(F.col("doc_id") % DIFF_ADD_MOD == 0).select(
                (F.col("doc_id") + DIFF_ADD_OFFSET).alias("doc_id"),
                F.md5("text").alias("n_h"),
            )
        )
    )
    status = (
        F.when(F.col("o_h").isNull(), F.lit("added"))
        .when(F.col("n_h").isNull(), F.lit("removed"))
        .when(F.col("o_h") != F.col("n_h"), F.lit("modified"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        old.join(new, "doc_id", "full_outer")
        .select(status.alias("status"))
        .groupBy("status")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("status")
    )


ORACLES: dict[str, str] = {
    "snapshot_diff": f"""
        WITH old AS (SELECT doc_id, md5(text) AS o_h FROM documents),
        new AS (
            SELECT doc_id,
                   md5(CASE WHEN doc_id % {DIFF_UPD_MOD} = 0
                            THEN upper(text) ELSE text END) AS n_h
            FROM documents WHERE doc_id % {DIFF_DEL_MOD} <> 0
            UNION ALL
            SELECT doc_id + {DIFF_ADD_OFFSET}, md5(text)
            FROM documents WHERE doc_id % {DIFF_ADD_MOD} = 0),
        j AS (
            SELECT CASE WHEN o_h IS NULL THEN 'added'
                        WHEN n_h IS NULL THEN 'removed'
                        WHEN o_h <> n_h THEN 'modified'
                        ELSE 'unchanged' END AS status
            FROM old FULL OUTER JOIN new USING (doc_id))
        SELECT status, count(*) AS n_docs FROM j
        GROUP BY status ORDER BY status
    """,
    "incremental_daily_rollup": """
        SELECT CAST(ts AS DATE) AS day, count(*) AS n_events,
               round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
                     / (count(*) * 100.0), 4) AS avg_value
        FROM events GROUP BY 1 ORDER BY 1
    """,
    "scd2_apply": f"""
        WITH cur AS (SELECT c_custkey, c_mktsegment AS segment FROM customer),
        upd AS (SELECT c_custkey FROM cur WHERE c_custkey % {SCD_MOD} = 0)
        SELECT c_custkey, segment, 1 AS version, 0 AS valid_from,
               CAST(NULL AS INTEGER) AS valid_to
        FROM cur WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
        UNION ALL
        SELECT c_custkey, segment, 1, 0, 1
        FROM cur WHERE c_custkey IN (SELECT c_custkey FROM upd)
        UNION ALL
        SELECT c_custkey, '{SCD_NEW_SEGMENT}', 2, 1, CAST(NULL AS INTEGER)
        FROM upd
        ORDER BY c_custkey, version
    """,
}

QUERIES = {
    "incremental_daily_rollup": incremental_daily_rollup,
    "scd2_apply": scd2_apply,
    "snapshot_diff": snapshot_diff,
}


# ------------------------------------------------------------------ CDC
# event_type → changelog op: the deterministic mapping that turns the
# events table into a keyed upsert/delete stream (Debezium-shaped).
CDC_DELETE_TYPE = "error"


def cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction: apply a keyed CDC stream (upserts + deletes)
    to materialize the latest state per key — the read-side half of every
    Debezium → lakehouse pipeline, and the semantics of a Delta/Iceberg
    `MERGE` fed from a change feed.

    The events table is interpreted as the changelog: key = user_id,
    ordered by (ts, event_id); `error` rows are tombstones, everything
    else upserts the row's value. Last writer wins; a key whose final op
    is a tombstone is absent from the result.

    Scale: ONE hash shuffle on the key for the row_number window — the
    canonical compaction plan (Spark's own streaming dedup and Delta's
    MERGE-on-read do the same). No join: tombstone filtering happens on
    the 1-row-per-key output of the window.
    """
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    latest = (
        events.select(
            "user_id",
            "event_type",
            "value",
            F.unix_timestamp("ts").alias("es"),
            "event_id",
            F.count("*").over(Window.partitionBy("user_id")).alias("n_ops"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
    )
    return (
        latest.filter(F.col("event_type") != CDC_DELETE_TYPE)
        .select(
            "user_id",
            F.col("event_type").alias("last_op"),
            F.round("value", 6).alias("last_value"),
            F.col("es").alias("last_es"),
            "n_ops",
        )
        .orderBy("user_id")
    )


QUERIES["cdc_apply"] = cdc_apply

ORACLES["cdc_apply"] = f"""
    WITH ranked AS (
        SELECT user_id, event_type, value,
               CAST(floor(epoch(ts)) AS BIGINT) AS es,
               count(*) OVER (PARTITION BY user_id) AS n_ops,
               row_number() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events)
    SELECT user_id, event_type AS last_op,
           round(value, 6) AS last_value, es AS last_es, n_ops
    FROM ranked
    WHERE rn = 1 AND event_type <> '{CDC_DELETE_TYPE}'
    ORDER BY user_id
"""


BACKFILL_FAIL_MOD = 10  # simulate: every 10th day's partition is missing


def backfill_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backfill planner: diff the expected daily-partition calendar against
    the partitions that actually materialized and emit ordered work units —
    the scheduler-side shape of every incremental pipeline (Airflow
    catchup, Delta RESTORE+rerun). "Materialized" is simulated
    deterministically (md5(day) % 10 == 0 partitions are missing, the same
    portable hash used by the split operators).

    Scale: the calendar is sequence-exploded from a 1-row min/max
    aggregate (days × 1 rows, independent of fact volume); expected per-day
    volumes come from ONE map-side-combined groupBy; the diff is an
    anti-join of two day-keyed tiny frames; newest-first priority is a
    window over the missing-day set only.
    """
    from pyspark.sql import Window as W
    from ai_powered_data_pipeline_assistant_spark.functions.hashing import md5_int

    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(F.to_date("ts").alias("day"))
        .groupBy("day")
        .agg(F.count("*").alias("n_events"))
    )
    bounds = daily.agg(F.min("day").alias("mn"), F.max("day").alias("mx"))
    calendar = bounds.select(
        F.explode(F.sequence("mn", "mx")).alias("day")
    )
    expected = calendar.join(daily, "day", "left").select(
        "day", F.coalesce("n_events", F.lit(0)).alias("n_events")
    )
    materialized = expected.filter(
        md5_int(F.col("day").cast("string")) % BACKFILL_FAIL_MOD != 0
    )
    missing = expected.join(materialized.select("day"), "day", "left_anti")
    pri = W.partitionBy().orderBy(F.desc("day"))
    return (
        missing.withColumn("priority", F.row_number().over(pri))
        .select("priority", "day", "n_events")
        .orderBy("priority")
    )


QUERIES["backfill_plan"] = backfill_plan


def _backfill_oracle() -> str:
    from ai_powered_data_pipeline_assistant_spark.functions.hashing import md5_int_sql

    return f"""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
            FROM events GROUP BY 1),
        b AS (SELECT min(day) AS mn, max(day) AS mx FROM daily),
        calendar AS (
            SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY))::DATE AS day
            FROM b),
        expected AS (
            SELECT c.day, coalesce(d.n_events, 0) AS n_events
            FROM calendar c LEFT JOIN daily d USING (day)),
        missing AS (
            SELECT * FROM expected
            WHERE {md5_int_sql("CAST(day AS VARCHAR)")} % {BACKFILL_FAIL_MOD} = 0)
        SELECT row_number() OVER (ORDER BY day DESC) AS priority,
               day, n_events
        FROM missing
        ORDER BY priority
    """


ORACLES["backfill_plan"] = _backfill_oracle()


LEDGER_DAYS = 5  # deterministic arrival-day assignment: doc_id % LEDGER_DAYS


def daily_dedup_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup accounting: documents arrive over
    LEDGER_DAYS batches (arrival day = doc_id % LEDGER_DAYS, the driver's
    deterministic stand-in for a crawl date) and each day's batch is
    deduplicated against EVERYTHING already ingested. Per day: arrivals,
    docs whose exact content hash was first seen on an earlier day
    (cross-batch dups), within-day dups past the day's first copy, and the
    net-new count an incremental pipeline would actually index.

    Scale design: the whole ledger derives from ONE groupBy over
    (content_hash) computing min arrival day and per-day counts — no
    per-day anti-joins; day count is a constant, corpus size is not.
    The ledger is the accounting twin of `crosscorpus_neardup` (which
    finds the batch-vs-corpus near-dup PAIRS); an incremental pipeline
    runs both: hash ledger first (cheap, exact), LSH on the survivors."""
    docs = load_table(spark, sf_dir, "documents")
    tagged = docs.select(
        (F.col("doc_id") % LEDGER_DAYS).alias("day"),
        F.sha2("text", 256).alias("h"),
    )
    per_hash_day = tagged.groupBy("h", "day").agg(F.count("*").alias("cnt"))
    first_day = per_hash_day.groupBy("h").agg(F.min("day").alias("first_day"))
    joined = per_hash_day.join(first_day, "h")
    is_new_day = F.col("day") == F.col("first_day")
    return (
        joined.groupBy("day")
        .agg(
            F.sum("cnt").alias("arrivals"),
            F.sum(F.when(~is_new_day, F.col("cnt")).otherwise(0)).alias(
                "cross_batch_dups"
            ),
            F.sum(F.when(is_new_day, F.col("cnt") - 1).otherwise(0)).alias(
                "within_day_dups"
            ),
            F.sum(F.when(is_new_day, 1).otherwise(0)).alias("net_new"),
        )
        .orderBy("day")
    )


QUERIES["daily_dedup_ledger"] = daily_dedup_ledger

ORACLES["daily_dedup_ledger"] = f"""
    WITH tagged AS (
        SELECT doc_id % {LEDGER_DAYS} AS day, sha256(text) AS h
        FROM documents),
    per_hash_day AS (
        SELECT h, day, count(*) AS cnt FROM tagged GROUP BY 1, 2),
    first_day AS (
        SELECT h, min(day) AS first_day FROM per_hash_day GROUP BY 1)
    SELECT day,
           CAST(sum(cnt) AS BIGINT) AS arrivals,
           CAST(sum(CASE WHEN day != first_day THEN cnt ELSE 0 END)
                AS BIGINT) AS cross_batch_dups,
           CAST(sum(CASE WHEN day = first_day THEN cnt - 1 ELSE 0 END)
                AS BIGINT) AS within_day_dups,
           CAST(sum(CASE WHEN day = first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS net_new
    FROM per_hash_day JOIN first_day USING (h)
    GROUP BY day ORDER BY day
"""
