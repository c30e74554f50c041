"""Composed crawl-ingest pipeline: near-dup gate → curate → ANN index
maintenance, one micro-batch at a time — the end-to-end shape a
training-data crawler runs continuously, built ENTIRELY from the audited
parts so nothing here introduces new math:

1. `neardup.process_neardup_batch` checks the arriving docs against the
   accumulated bucketed band state (and against each other) and lands the
   flagged (later, earlier) pairs exactly-once;
2. the batch's CURATED slice = arrivals that were not flagged as the
   LATER side of any pair this batch — note dropped docs still enter the
   near-dup state (their content has been seen; a later near-copy of a
   dropped doc must also be dropped), which is what makes the stream's
   keep-set equal the batch rule's;
3. `layout.append_ivfpq_layout(batch_id=N)` routes ONLY the curated docs'
   vectors through the index's stored artifacts into their
   (list_id, batch_id) partitions — replays overwrite themselves;
4. the curated doc ids land via `jobs.idempotent_append` for downstream
   consumers (training-shard writers, quality scoring).

Extension lineage: this is the reference's ingest path composed at crawl
scale — seen-content dedup at ingest (reference
backend/services/search_service.py) feeding pgvector upserts (reference
backend/services/vector_service.py:87) — re-expressed as one idempotent
foreachBatch over lakehouse state.

`crawl_pipeline_parity` (operators/stream_parity.py) pins the whole
composition: the streamed curated set equals the batch arrival-rule
computation (the ORACLE recomputes the curated COUNT in SQL via the
shared LSH CTE — the curation outcome itself is oracle-exact, not a
literal), and the maintained index equals a one-pass encode of
base ∪ curated arrivals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def process_crawl_batch(
    batch_df: DataFrame,
    batch_id: int,
    state_dir: str,
    layout_path: str,
    out_dir: str,
) -> None:
    """One micro-batch of the composed pipeline — module-level so the
    stream wiring, the parity replays, and the steady-state bench row
    (`crawl_steady_batch`) all run the EXACT same per-batch code path.
    Idempotent end to end: every write is batch_id-partitioned dynamic
    overwrite."""
    from ai_powered_data_pipeline_assistant_spark.sources.layout import (
        append_ivfpq_layout,
    )
    from ai_powered_data_pipeline_assistant_spark.streaming.jobs import (
        idempotent_append,
    )
    from ai_powered_data_pipeline_assistant_spark.streaming.neardup import (
        process_neardup_batch,
    )

    pairs_dir = f"{out_dir}/pairs"
    curated_dir = f"{out_dir}/curated"
    spark = batch_df.sparkSession
    batch_df = batch_df.persist()
    try:
        process_neardup_batch(
            batch_df.select("doc_id", "text"), batch_id, state_dir, pairs_dir
        )
        # this batch's later-side ids — the docs the gate drops. An
        # explicit no-files check (not a broad AnalysisException catch):
        # only "no pair flagged so far" (no parquet to infer a schema
        # from) means nothing is dropped; a malformed pairs layout still
        # errors loudly.
        from ai_powered_data_pipeline_assistant_spark import hadoop_fs

        if hadoop_fs.has_parquet(spark, pairs_dir):
            later = (
                spark.read.parquet(pairs_dir)
                .filter(F.col("batch_id") == batch_id)
                .select(F.col("later_id").alias("doc_id"))
                .distinct()
            )
            # two consumers below (index append + curated sink):
            # materialize so the pairs read + anti-join run once
            from ai_powered_data_pipeline_assistant_spark.execution import (
                materialize,
            )

            curated = batch_df.join(later, "doc_id", "left_anti").transform(
                materialize
            )
        else:  # no pairs parquet yet → nothing dropped
            curated = batch_df
        append_ivfpq_layout(
            spark,
            layout_path,
            curated.select(F.col("doc_id").alias("vec_id"), "embedding"),
            batch_id=batch_id,
        )
        idempotent_append(curated.select("doc_id"), batch_id, curated_dir)
    finally:
        batch_df.unpersist()


def run_crawl_pipeline(
    arrivals_stream: DataFrame,
    state_dir: str,
    layout_path: str,
    out_dir: str,
    checkpoint: str,
):
    """Wire the composed pipeline over a (doc_id, text, embedding) source
    against a BATCHED IVF-PQ layout (`write_ivfpq_layout_for(batched=True)`)
    and an (initially empty) near-dup state dir. Outputs under ``out_dir``:
    ``pairs/`` (flagged near-dup pairs) and ``curated/`` (kept doc ids),
    both batch_id-partitioned. Returns the started StreamingQuery
    (availableNow)."""

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        process_crawl_batch(batch_df, batch_id, state_dir, layout_path, out_dir)

    return (
        arrivals_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_handle)
        .trigger(availableNow=True)
        .start()
    )
