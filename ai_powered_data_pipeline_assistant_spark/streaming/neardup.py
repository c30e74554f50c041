"""Incremental streaming near-duplicate detection — the daily-crawl ingest
shape: each arriving micro-batch of documents is checked against EVERYTHING
seen before it, then added to the seen state.

Extension lineage: the reference dedups exact URLs/content hashes at ingest
(reference backend/services/search_service.py seen-URL set → here
streaming/stateful.py + D2-D5); this module is the NEAR-dup analogue a
training-data crawler actually needs — MinHash+LSH against an accumulated
corpus, not equality.

Incrementality (what the state buys at 100 TB): the expensive step —
shingling + hashing the TEXT — runs exactly once per document, in the
micro-batch that delivers it. State stores the derived artifacts only:

- ``state/sigs``      (doc_id, m0..m15, sz)  — one row per seen doc;
- ``state/postings``  (doc_id, h)            — 8-byte shingle hashes.

A new batch band-joins its signatures against the state's (candidates come
from bucket equality, never an all-pairs scan), verifies candidates with
exact Jaccard against state postings, appends flagged (later, earlier)
pairs to the output table, and appends its own artifacts to state. Per
batch the work is O(batch × hit-rate), independent of corpus AGE — the
same math as the batch operator `dedup.minhash_lsh_pairs_for`, via the
same shared helpers (`minhash_sig_aggs` / `minhash_band_frame` /
`minhash_verified_pairs`), so the streaming path cannot drift from the
oracle-checked batch semantics. `neardup_stream_parity`
(operators/stream_parity.py) pins the equality as a driver-hashable row.

Failure semantics: the pair/state writes are plain appends guarded by the
stream checkpoint — a batch replayed after a crash between write and
checkpoint-commit would double-append (at-least-once). The parity audit
runs each batch exactly once; a production deployment lands both tables
with `jobs.idempotent_append` (batch_id-partitioned dynamic overwrite) to
close that hole — same writer, one option.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.execution import materialize

PAIRS_SCHEMA = "later_id long, earlier_id long, jaccard double"


def run_neardup_stream(
    docs_stream: DataFrame,
    state_dir: str,
    pairs_dir: str,
    checkpoint: str,
):
    """Wire the incremental near-dup stream over a (doc_id, text) source.
    Returns the started StreamingQuery (availableNow)."""
    from ai_powered_data_pipeline_assistant_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _shingles,
        minhash_band_frame,
        minhash_sig_aggs,
        minhash_verified_pairs,
    )

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        docs = batch_df.select("doc_id", "text")
        # Shingle/sign ONCE per arriving doc; both frames feed two
        # consumers (candidate join + state append).
        postings_b = _shingles(docs).transform(materialize)
        sigs_b = (
            postings_b.groupBy("doc_id").agg(*minhash_sig_aggs())
        ).transform(materialize)
        if os.path.isfile(os.path.join(state_dir, "sigs", "_SUCCESS")):
            sigs_s = spark.read.parquet(os.path.join(state_dir, "sigs"))
            postings_s = spark.read.parquet(os.path.join(state_dir, "postings"))
            bands_b = minhash_band_frame(sigs_b).select(
                F.col("doc_id").alias("a_id"), "band", "band_key"
            )
            bands_s = minhash_band_frame(sigs_s).select(
                F.col("doc_id").alias("b_id"), "band", "band_key"
            )
            candidates = (
                bands_b.join(bands_s, ["band", "band_key"])
                .select("a_id", "b_id")
                .distinct()
            )
            pairs = minhash_verified_pairs(
                candidates,
                postings_b,
                postings_s,
                sigs_b.select("doc_id", "sz"),
                sigs_s.select("doc_id", "sz"),
                JACCARD_THRESHOLD,
            )
            out = pairs.select(
                F.col("a_id").alias("later_id"),
                F.col("b_id").alias("earlier_id"),
                "jaccard",
            )
        else:
            out = spark.createDataFrame([], PAIRS_SCHEMA)
        # Pairs first, then state: a replay after a crash in between
        # re-checks the batch against pre-batch state (duplicate pairs,
        # reconciled by the idempotent writer in production) rather than
        # against itself (which would silently flag nothing).
        out.write.mode("append").parquet(pairs_dir)
        sigs_b.write.mode("append").parquet(os.path.join(state_dir, "sigs"))
        postings_b.write.mode("append").parquet(
            os.path.join(state_dir, "postings")
        )

    return (
        docs_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_handle)
        .trigger(availableNow=True)
        .start()
    )
