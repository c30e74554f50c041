"""Structured Streaming job pipeline — the reference's PubNub job processor
re-expressed as a streaming query.

Parity targets (SURVEY §2.9):
- T1 pub/sub channels → readStream/writeStream topics
- T2 stateful job pipeline (context lookup → answer → store → respond):
  reference backend/services/pubnub_job_processor.py:198-280
- T3 duplicate suppression, request_id within 300 s window: reference
  backend/services/pubnub_job_processor.py:302-322 →
  withWatermark + dropDuplicatesWithinWatermark
- T7 fire-and-forget sink → foreachBatch with per-batch error isolation

The reference's dedup window is processing-time; Spark watermarks are
event-time, so requests carry an explicit `ts` column (FIXTURES.md §8) and
tests inject timestamps.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)

DEDUP_WINDOW = "5 minutes"  # reference: 300 s TTL seen-map


def dedup_requests(requests: DataFrame, window: str = DEDUP_WINDOW) -> DataFrame:
    """T3: drop duplicate request_ids arriving within the watermark window.

    Works on both streaming and batch frames (batch falls back to plain
    dropDuplicates semantics for testing).
    """
    with_wm = requests.withWatermark("ts", window)
    if requests.isStreaming:
        return with_wm.dropDuplicatesWithinWatermark(["request_id"])
    return with_wm.dropDuplicates(["request_id"])


def answer_requests(requests: DataFrame, kb: DataFrame) -> DataFrame:
    """T2: per-request context lookup against a (static) knowledge frame.

    The RAG-context join is a stream-static equi-join on job_id — supported
    natively by Structured Streaming without state. The LLM call is
    deterministic template assembly here (the reference's LLM stage is
    external I/O, out of correctness scope — SURVEY §7.4).
    """
    ctx = kb.select(
        F.col("doc_id").alias("job_id"),
        F.col("text").alias("context"),
    )
    joined = requests.join(ctx, "job_id", "left")
    return joined.select(
        "request_id",
        "job_id",
        "ts",
        F.concat(
            F.lit("answer["),
            F.coalesce(F.substring("context", 1, 80), F.lit("no-context")),
            F.lit("] for "),
            F.col("query"),
        ).alias("response"),
    )


def publish_channels(answered: DataFrame, base_path: str, checkpoint: str):
    """T1: one stream fanned out to the reference's channel set — each
    micro-batch lands a `job-responses` row plus derived `tasks` and `logs`
    events (reference publishes to chat/tasks/logs channels per message,
    backend/api/routes/chat.py:159-221). One foreachBatch writes all three:
    the batch is computed once, and each channel write is isolated so a
    failing channel can't poison the others (T7 fire-and-forget)."""

    def _publish(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.persist()
        try:
            channels = {
                "job_responses": batch_df,
                "tasks": batch_df.select(
                    F.col("request_id").alias("task_name"),
                    F.lit("completed").alias("status"),
                    F.col("ts"),
                ),
                "logs": batch_df.select(
                    F.col("ts").alias("time"),
                    F.lit("INFO").alias("level"),
                    F.concat(F.lit("answered "), "request_id").alias("message"),
                ),
            }
            for channel, frame in channels.items():
                try:
                    frame.write.mode("append").parquet(f"{base_path}/{channel}")
                except Exception:  # noqa: BLE001 — ancillary-channel isolation (T7)
                    if channel == "job_responses":
                        # Primary channel must not be silently lost: re-raise
                        # so the checkpoint does NOT commit and the batch
                        # retries (exactly-once story stays intact).
                        raise
                    logger.exception(
                        "batch %s: ancillary channel %r write failed (isolated)",
                        batch_id,
                        channel,
                    )
        finally:
            batch_df.unpersist()

    return (
        answered.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_publish)
        .trigger(availableNow=True)
        .start()
    )


def idempotent_append(batch_df: DataFrame, batch_id: int, path: str) -> None:
    """Exactly-once batch sink: land each micro-batch in its own
    ``batch_id=N`` partition with DYNAMIC partition overwrite, so a batch
    replayed after a partial write (failure between the parquet commit and
    the checkpoint commit — the at-least-once hole of a plain
    ``mode("append")`` foreachBatch) REPLACES its own output instead of
    appending duplicates. Readers see the union of all batch partitions;
    the batch_id column doubles as write provenance.

    The REBALANCE hint (round 12, guide §6 "coalesce on write") sizes the
    batch partition's files adaptively: AQE packs the write into
    advisory-size output partitions, so a small micro-batch lands ONE
    file instead of one near-empty file per upstream task (32 here —
    commit overhead locally, a per-batch small-files leak for every
    downstream reader at scale), while a large batch still fans out."""
    (
        batch_df.withColumn("batch_id", F.lit(batch_id))
        .hint("rebalance")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)
    )


def run_job_stream(requests_stream: DataFrame, kb: DataFrame, out_path: str, checkpoint: str):
    """Wire the full stream: dedup → answer → idempotent batch-versioned
    sink via foreachBatch (per-batch error isolation à la the reference's
    fire-and-forget publish; replayed batches overwrite their own
    partition — exactly-once end to end)."""
    answered = answer_requests(dedup_requests(requests_stream), kb)

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        # Primary sink: let failures propagate so the checkpoint doesn't
        # commit a batch whose write was lost — the stream retries it, and
        # the idempotent writer makes the retry safe.
        idempotent_append(batch_df, batch_id, out_path)

    return (
        answered.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_sink)
        .trigger(availableNow=True)
        .start()
    )



def observed_ingest(df: DataFrame, name: str = "ingest_metrics") -> DataFrame:
    """Attach Spark's native `observe` metrics to an ingest frame: row
    count, null-text count, and total bytes-ish volume are accumulated BY
    THE EXISTING JOB (no second scan, unlike a separate quality query) and
    surface in each StreamingQueryProgress (streams) or via
    QueryExecutionListener (batch) — the reference's monitoring counters
    (reference backend/core/monitoring.py:28-66) as a zero-cost plan
    annotation.
    """
    return df.observe(
        name,
        F.count(F.lit(1)).alias("rows"),
        F.sum(F.col("text").isNull().cast("long")).alias("null_text"),
        F.sum(F.length("text")).alias("chars"),
    )
