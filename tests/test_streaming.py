"""Streaming behavior: watermark dedup, job pipeline, sliding rate limit.

The reference's dedup window is processing-time; these tests inject event
time explicitly (SURVEY §7.4) via the job_requests fixture generator.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.sources.synthetic import job_requests
from ai_powered_data_pipeline_assistant_spark.streaming.jobs import (
    answer_requests,
    dedup_requests,
    run_job_stream,
)
from ai_powered_data_pipeline_assistant_spark.streaming.ratelimit import (
    over_limit,
    sliding_counts_batch,
)
from ai_powered_data_pipeline_assistant_spark.catalog import load_table


def test_streaming_dedup_within_watermark(spark, sf_dir, tmp_path):
    """In-window duplicates must be dropped; the stream must deliver one row
    per unique request_id per window epoch."""
    fixture = job_requests(spark, n=100, dup_every=10, late_dup_every=25)
    src_dir = str(tmp_path / "requests")
    fixture.coalesce(1).write.mode("overwrite").parquet(src_dir)

    stream = (
        spark.readStream.schema(fixture.schema).parquet(src_dir)
    )
    kb = load_table(spark, sf_dir, "documents")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = run_job_stream(stream, kb, out_dir, ckpt)
    q.awaitTermination(120)

    result = spark.read.parquet(out_dir)
    # one batch → dropDuplicatesWithinWatermark dedups everything per id,
    # including the "late" duplicates that arrived in the same batch
    ids = [r["request_id"] for r in result.select("request_id").collect()]
    assert len(ids) == len(set(ids)), "stream emitted duplicate request_ids"
    assert len(set(ids)) == 100, f"expected 100 unique requests, got {len(set(ids))}"
    # responses joined context where job docs existed
    sample = result.filter(F.col("response").contains("no-context")).count()
    assert sample == 0  # all job_ids 0..19 exist as doc_ids


def test_batch_dedup_fallback(spark):
    fixture = job_requests(spark, n=50, dup_every=5, late_dup_every=50)
    deduped = dedup_requests(fixture)
    assert deduped.count() == deduped.select("request_id").distinct().count()


def test_answer_requests_shapes(spark, sf_dir):
    # n=10 with dup_every/late_dup_every=100 still duplicates id=0 (range
    # start) → 12 raw rows; dedup collapses to the 10 unique requests
    fixture = job_requests(spark, n=10, dup_every=100, late_dup_every=100)
    kb = load_table(spark, sf_dir, "documents")
    out = answer_requests(dedup_requests(fixture), kb)
    rows = out.collect()
    assert len(rows) == 10
    assert all(r["response"].startswith("answer[") for r in rows)


def test_sliding_rate_limit_counts(spark):
    """A burst of 45 events in 60 s from one user must trip the 40/60 s cap
    exactly on events 41..45; a slow user must never trip it."""
    burst = spark.range(45).select(
        F.lit(1).alias("user_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
    )
    slow = spark.range(45).select(
        F.lit(2).alias("user_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 120).alias("ts"),
    )
    events = burst.unionByName(slow)
    counted = sliding_counts_batch(events)
    over = over_limit(events)
    assert over.filter(F.col("user_id") == 2).count() == 0
    assert over.filter(F.col("user_id") == 1).count() == 5  # events 41-45
    max_trailing = counted.agg(F.max("trailing_cnt")).first()[0]
    assert max_trailing == 45


def test_windowed_counts_stream(spark, tmp_path):
    """Event-time sliding-window counts over a real stream: a 45-event burst
    in one minute must produce a window holding all 45 events; late data
    beyond the watermark is handled by the engine (append not tested here —
    update mode surfaces every window)."""
    from ai_powered_data_pipeline_assistant_spark.streaming.ratelimit import (
        windowed_counts_stream,
    )

    burst = spark.range(45).select(
        F.lit(1).cast("long").alias("user_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
    )
    src = str(tmp_path / "rl_src")
    burst.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(burst.schema).parquet(src)
    q = (
        windowed_counts_stream(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("rl_windows")
        .option("checkpointLocation", str(tmp_path / "rl_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM rl_windows").collect()
    assert rows, "no windows emitted"
    # sliding 60s/10s windows: the one fully covering the burst counts all 45
    assert max(r["count"] for r in rows) == 45
    # every window is user-keyed and at most window_s wide
    assert all(r["user_id"] == 1 for r in rows)
    assert all(
        (r["window"]["end"] - r["window"]["start"]).total_seconds() == 60
        for r in rows
    )


def test_publish_channels_fanout(spark, sf_dir, tmp_path):
    """One answered stream fans out to job_responses/tasks/logs channel
    tables in a single foreachBatch (T1 multi-channel publish)."""
    from ai_powered_data_pipeline_assistant_spark.streaming.jobs import (
        publish_channels,
    )

    fixture = job_requests(spark, n=30, dup_every=10, late_dup_every=30)
    src = str(tmp_path / "pub_src")
    fixture.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(fixture.schema).parquet(src)
    kb = load_table(spark, sf_dir, "documents")
    answered = answer_requests(dedup_requests(stream), kb)
    base = str(tmp_path / "channels")
    q = publish_channels(answered, base, str(tmp_path / "pub_ckpt"))
    q.awaitTermination(120)

    responses = spark.read.parquet(f"{base}/job_responses")
    tasks = spark.read.parquet(f"{base}/tasks")
    logs = spark.read.parquet(f"{base}/logs")
    n = responses.count()
    assert n == 30  # deduped
    assert tasks.count() == n and logs.count() == n
    assert set(tasks.columns) == {"task_name", "status", "ts"}
    assert logs.filter(F.col("message").startswith("answered ")).count() == n


def test_append_mode_emits_only_closed_windows(spark, tmp_path):
    """Append-mode windowed aggregation must emit a window only after the
    watermark passes its end. Two micro-batches (maxFilesPerTrigger=1):
    batch 1 fills an early window, batch 2 advances event time far enough
    to close it — the closed window appears, the still-open one does not."""
    import glob

    early = spark.range(10).select(
        F.lit(1).cast("long").alias("user_id"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id")).alias("ts"),
    )
    late = spark.range(5).select(
        F.lit(1).cast("long").alias("user_id"),
        # +10 min: watermark (2*60 s delay) moves past the first window end
        F.timestamp_seconds(F.lit(1700000600) + F.col("id")).alias("ts"),
    )
    src = str(tmp_path / "wm_src")
    early.coalesce(1).write.mode("overwrite").parquet(src)
    # second file written after the first so both exist before the stream runs;
    # maxFilesPerTrigger=1 forces them into separate micro-batches
    late.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(early.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    windowed = (
        stream.withWatermark("ts", "120 seconds")
        .groupBy(F.window("ts", "60 seconds"))
        .count()
    )
    q = (
        windowed.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_append")
        .option("checkpointLocation", str(tmp_path / "wm_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM wm_append").collect()
    starts = sorted(r["window"]["start"].timestamp() for r in rows)
    # the early window (1700000000-ish) closed and emitted with all 10 events
    assert any(abs(s - 1699999980) < 120 for s in starts) or rows, rows
    counts = {r["window"]["start"].timestamp(): r["count"] for r in rows}
    assert 10 in set(counts.values()), f"early window not finalized: {counts}"
    # the late window (1700000600+) is still open → must NOT have emitted
    assert all(s < 1700000600 for s in counts), f"open window emitted: {counts}"


def test_checkpoint_recovery_exactly_once(spark, sf_dir, tmp_path):
    """Restarting a stream from its checkpoint must process only NEW input:
    run 1 handles batch A; after new files land, run 2 (same checkpoint)
    appends only batch B — no reprocessing, no duplicates."""
    src = str(tmp_path / "ck_src")
    out = str(tmp_path / "ck_out")
    ckpt = str(tmp_path / "ck_ckpt")
    kb = load_table(spark, sf_dir, "documents")

    batch_a = job_requests(spark, n=20, dup_every=100, late_dup_every=100)
    batch_a.coalesce(1).write.mode("overwrite").parquet(src)

    def run_once():
        stream = spark.readStream.schema(batch_a.schema).parquet(src)
        q = run_job_stream(stream, kb, out, ckpt)
        q.awaitTermination(120)

    run_once()
    first = spark.read.parquet(out)
    n_first = first.count()
    assert n_first == 20

    # second wave: 10 new request_ids, event time AFTER wave 1 (the restored
    # watermark would otherwise drop same-timestamp rows as late arrivals)
    batch_b = (
        job_requests(spark, n=10, dup_every=100, late_dup_every=100)
        .withColumn("request_id", F.concat(F.lit("wave2-"), F.col("request_id")))
        .withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 HOUR"))
    )
    batch_b.coalesce(1).write.mode("append").parquet(src)
    run_once()

    final = spark.read.parquet(out)
    assert final.count() == n_first + 10, "restart reprocessed or dropped data"
    ids = [r["request_id"] for r in final.select("request_id").collect()]
    assert len(ids) == len(set(ids)), "duplicates after checkpoint recovery"


def test_session_window_stream(spark, tmp_path):
    """Gap-based streaming sessions: two bursts for one user separated by
    more than the gap form two sessions; a far-future batch 2 advances the
    watermark so both emit in append mode, each with end = last_ts + gap."""
    from ai_powered_data_pipeline_assistant_spark.streaming.sessions import (
        session_counts_stream,
    )

    t0 = 1700000000
    burst1 = spark.range(11).select(
        F.lit(1).cast("long").alias("user_id"),
        F.timestamp_seconds(F.lit(t0) + F.col("id")).alias("ts"),
    )
    burst2 = spark.range(3).select(
        F.lit(1).cast("long").alias("user_id"),
        # > gap (1800 s) after burst1 → a second session
        F.timestamp_seconds(F.lit(t0 + 5000) + F.col("id")).alias("ts"),
    )
    closer = spark.range(1).select(
        F.lit(2).cast("long").alias("user_id"),
        # far future: watermark (3600 s delay) passes both sessions' ends
        F.timestamp_seconds(F.lit(t0 + 100000)).alias("ts"),
    )
    src = str(tmp_path / "sess_src")
    burst1.unionAll(burst2).coalesce(1).write.mode("overwrite").parquet(src)
    closer.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(burst1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        session_counts_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions")
        .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM sessions WHERE user_id = 1").collect()
    counts = sorted(r["events"] for r in rows)
    assert counts == [3, 11], f"expected two closed sessions, got {rows}"
    for r in rows:
        start = r["session_window"]["start"].timestamp()
        end = r["session_window"]["end"].timestamp()
        # session extends gap seconds past its last event
        span = 10 if r["events"] == 11 else 2
        assert end - start == span + 1800, (start, end, r["events"])
    # user 2's session is still open (watermark hasn't passed it) → not emitted
    assert not spark.sql("SELECT * FROM sessions WHERE user_id = 2").collect()


def test_streaming_session_windows_match_batch(spark, sf_dir, tmp_path):
    """The streaming session-window aggregation must produce exactly the
    sessions the batch session_window operator computes on the same input
    once every watermark has passed (sentinel far-future events per user
    close all real sessions in append mode; sentinels are filtered out of
    the comparison)."""
    from ai_powered_data_pipeline_assistant_spark.operators.windows import (
        session_window_counts,
    )
    from ai_powered_data_pipeline_assistant_spark.streaming.sessions import (
        session_counts_stream,
    )

    events = (
        load_table(spark, sf_dir, "events")
        # watermarks need TIMESTAMP, not the NTZ surface type (UTC-pinned)
        .select("user_id", F.col("ts").cast("timestamp").alias("ts"))
    )
    # ONE shared far-future sentinel per user: it advances the global
    # watermark far past every real session (so they all close and emit in
    # append mode) while the sentinel sessions themselves stay open — the
    # emitted output is then exactly the batch result.
    sentinels = (
        events.select("user_id")
        .distinct()
        .select("user_id", F.lit("2030-01-01 00:00:00").cast("timestamp").alias("ts"))
    )
    src_dir = str(tmp_path / "events_src")
    events.union(sentinels).coalesce(1).write.mode("overwrite").parquet(src_dir)

    stream = spark.readStream.schema(events.schema).parquet(src_dir)
    out_dir = str(tmp_path / "sess_out")
    ckpt = str(tmp_path / "sess_ckpt")
    sessions = session_counts_stream(stream).select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        F.col("events").alias("event_cnt"),
    )
    q = (
        sessions.writeStream.outputMode("append")
        .option("checkpointLocation", ckpt)
        .format("parquet")
        .option("path", out_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r["user_id"], r["session_start"], r["session_end"], r["event_cnt"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want_df = session_window_counts(spark, sf_dir)
    want = {
        (r["user_id"], r["session_start"], r["session_end"], r["event_cnt"])
        for r in want_df.collect()
    }
    assert got == want, (
        f"streaming sessions diverge from batch: missing {len(want - got)}, "
        f"extra {len(got - want)}"
    )


def test_idempotent_append_replay_safe(spark, tmp_path):
    """Replaying a batch (failure between parquet write and checkpoint
    commit) must not duplicate rows: the same batch_id overwrites its own
    partition; a new batch_id adds rows."""
    from ai_powered_data_pipeline_assistant_spark.streaming.jobs import (
        idempotent_append,
    )

    out = str(tmp_path / "idem_out")
    batch = spark.range(10).select(F.col("id").alias("request_id"))
    idempotent_append(batch, 0, out)
    idempotent_append(batch, 0, out)  # replay of the SAME batch
    assert spark.read.parquet(out).count() == 10

    idempotent_append(batch, 1, out)  # a genuinely new batch
    result = spark.read.parquet(out)
    assert result.count() == 20
    assert result.select("batch_id").distinct().count() == 2


def test_observed_ingest_metrics_in_progress(spark, sf_dir, tmp_path):
    """`observe` metrics must ride the streaming job itself and appear in
    StreamingQueryProgress.observedMetrics — no extra scan or query."""
    from ai_powered_data_pipeline_assistant_spark.streaming.jobs import observed_ingest

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "obs_src")
    docs.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(docs.schema).parquet(src)
    observed = observed_ingest(stream)
    q = (
        observed.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "obs_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    metrics = None
    for p in q.recentProgress:
        om = p.get("observedMetrics") if isinstance(p, dict) else p["observedMetrics"]
        if om and "ingest_metrics" in om:
            metrics = om["ingest_metrics"]
    assert metrics is not None, "no observed metrics in any progress event"
    want = docs.count()
    assert metrics["rows"] == want
    assert metrics["null_text"] == 0
    assert metrics["chars"] > 0
