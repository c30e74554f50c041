"""Custom stateful operators (applyInPandasWithState): TTL dedup state and
sliding rate-limit state — the escape hatch for state Spark has no built-in
for (reference seen-map pubnub_job_processor.py:302-322, guardrails.py:23-37).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.sources.synthetic import job_requests
from ai_powered_data_pipeline_assistant_spark.streaming.stateful import (
    sliding_rate_limit_state,
    ttl_dedup_state,
)


def _run_stream(spark, src_df, tmp_path, build, name):
    src_dir = str(tmp_path / f"{name}_src")
    src_df.coalesce(1).write.mode("overwrite").parquet(src_dir)
    stream = spark.readStream.schema(src_df.schema).parquet(src_dir)
    out = build(stream)
    # The state store opens one instance per shuffle partition per batch;
    # 4 partitions keeps this test seconds-fast (the partition count is
    # baked into each query's own checkpoint, so other tests are unaffected).
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", str(tmp_path / f"{name}_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        # With ProcessingTimeTimeout an availableNow query stays active
        # ("no new data but cleaning up state") until every pending state
        # TTL fires — minutes. Poll until the input is fully processed,
        # then stop; timed-out-eviction behavior isn't under test here.
        import time

        deadline = time.monotonic() + 120
        while time.monotonic() < deadline:
            if (
                not q.status["isDataAvailable"]
                and q.recentProgress
                and sum(p["numInputRows"] for p in q.recentProgress) > 0
            ):
                break
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(30)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return spark.sql(f"SELECT * FROM {name}")


def test_ttl_dedup_state(spark, tmp_path):
    fixture = job_requests(spark, n=40, dup_every=4, late_dup_every=20).select(
        "request_id", "ts"
    )
    result = _run_stream(spark, fixture, tmp_path, ttl_dedup_state, "ttl_dedup")
    rows = {r["request_id"]: r for r in result.collect()}
    assert len(rows) == 40  # one state row per unique request_id
    total_accept = sum(r["accepted"] for r in rows.values())
    total_suppress = sum(r["suppressed"] for r in rows.values())
    assert total_accept == 40
    assert total_suppress == fixture.count() - 40  # every duplicate suppressed


def test_sliding_rate_limit_state(spark, tmp_path):
    burst = spark.range(45).select(
        F.lit(1).cast("long").alias("user_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
    )
    slow = spark.range(45).select(
        F.lit(2).cast("long").alias("user_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 120).alias("ts"),
    )
    events = burst.unionByName(slow)
    result = _run_stream(
        spark, events, tmp_path, sliding_rate_limit_state, "rate_state"
    )
    by_user = {r["user_id"]: r for r in result.collect()}
    # burst user: all 45 events inside one 60 s window → over the 40 cap
    assert by_user[1]["window_count"] == 45
    assert by_user[1]["over_limit"]
    # slow user: 120 s spacing → only the newest event stays in-window
    assert by_user[2]["window_count"] == 1
    assert not by_user[2]["over_limit"]


def test_trending_counter_state(spark, sf_dir, tmp_path):
    """One availableNow batch per event_type: score == batch count (no prior
    state to decay), trending iff count clears the threshold; state is two
    int64s per key."""
    from ai_powered_data_pipeline_assistant_spark.catalog import load_table
    from ai_powered_data_pipeline_assistant_spark.streaming.stateful import (
        TREND_THRESHOLD,
        trending_counter_state,
    )

    fixture = load_table(spark, sf_dir, "events").select("event_type", "ts")
    result = _run_stream(
        spark, fixture, tmp_path, trending_counter_state, "trending"
    )
    rows = {r["event_type"]: r for r in result.collect()}
    expected = {
        r["event_type"]: r["cnt"]
        for r in fixture.groupBy("event_type").agg(F.count("*").alias("cnt")).collect()
    }
    assert set(rows) == set(expected)
    for et, r in rows.items():
        assert r["batch_count"] == expected[et]
        assert float(r["decayed_score"]) == float(expected[et])
        assert r["trending"] == (expected[et] > TREND_THRESHOLD)


def test_funnel_conversion_state_matches_batch(spark, sf_dir, tmp_path):
    """Streaming-vs-batch parity: the per-user stage verdicts of the
    incremental funnel must aggregate to EXACTLY the batch
    funnel_counts stage totals on the same events."""
    from ai_powered_data_pipeline_assistant_spark.catalog import load_table
    from ai_powered_data_pipeline_assistant_spark.operators.behavior import (
        funnel_counts,
    )
    from ai_powered_data_pipeline_assistant_spark.streaming.stateful import (
        funnel_conversion_state,
    )

    fixture = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    result = _run_stream(
        spark, fixture, tmp_path, funnel_conversion_state, "funnel_state"
    )
    # latest verdict per user (update mode may emit once per batch)
    latest = {r["user_id"]: r for r in result.collect()}
    got = {
        "view": sum(1 for r in latest.values() if r["s1_view"]),
        "click": sum(1 for r in latest.values() if r["s2_click"]),
        "purchase": sum(1 for r in latest.values() if r["s3_purchase"]),
    }
    want = {
        r["stage"]: r["n_users"] for r in funnel_counts(spark, sf_dir).collect()
    }
    assert got == want, (got, want)


def test_cdc_latest_state_matches_batch(spark, sf_dir, tmp_path):
    """Streaming-vs-batch parity: the materialized latest-state view must
    equal the batch cdc_apply compaction on the same changelog (tombstoned
    keys excluded on both sides)."""
    from ai_powered_data_pipeline_assistant_spark.catalog import load_table
    from ai_powered_data_pipeline_assistant_spark.operators.incremental import (
        cdc_apply,
    )
    from ai_powered_data_pipeline_assistant_spark.streaming.stateful import (
        cdc_latest_state,
    )

    fixture = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "event_type", "value", "ts"
    )
    result = _run_stream(spark, fixture, tmp_path, cdc_latest_state, "cdc_state")
    latest = {r["user_id"]: r for r in result.collect()}
    got = {
        uid: (r["last_op"], round(r["last_value"], 6))
        for uid, r in latest.items()
        if not r["deleted"]
    }
    want = {
        r["user_id"]: (r["last_op"], round(r["last_value"], 6))
        for r in cdc_apply(spark, sf_dir).collect()
    }
    assert got == want


def test_transform_with_state_running_counter(spark, sf_dir, tmp_path):
    """Spark 4 transformWithStateInPandas: the running counter's LAST
    emission per key across multi-batch ingestion must equal the batch
    groupBy count of everything ingested.

    The transformWithState state-server protocol needs a working protobuf
    install; this container ships a broken google.protobuf (no
    descriptor), so the test skips there (the applyInPandasWithState
    operators above cover the same semantics on this environment)."""
    import pytest

    pytest.importorskip("google.protobuf.descriptor")
    from ai_powered_data_pipeline_assistant_spark.catalog import load_table
    from ai_powered_data_pipeline_assistant_spark.streaming.stateful import (
        running_type_counter,
    )

    events = load_table(spark, sf_dir, "events").select("event_type", "event_id")
    src = str(tmp_path / "tws_src")
    # two files + maxFilesPerTrigger=1 → state must carry across batches
    events.filter("event_id % 2 = 0").coalesce(1).write.mode("overwrite").parquet(src)
    events.filter("event_id % 2 = 1").coalesce(1).write.mode("append").parquet(src)
    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = running_type_counter(stream)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_counter")
            .option("checkpointLocation", str(tmp_path / "tws_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # last emission per key (update mode may emit once per batch)
    import collections

    latest: dict = collections.OrderedDict()
    for r in spark.sql("SELECT * FROM tws_counter").collect():
        latest[r["event_type"]] = max(
            latest.get(r["event_type"], 0), r["total_events"]
        )
    want = {
        r["event_type"]: r["n"]
        for r in events.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    assert latest == want
