"""Streaming incremental near-dup (streaming/neardup.py) ≡ batch LSH.

The parity operator itself is oracle-checked (test_oracle_parity); this
pins the semantics that make it non-vacuous: pairs are actually flagged
(so the multi-micro-batch replay really happened — a single merged batch
would see an empty state and flag nothing) and the stream's pair set is
exactly the batch cross-batch pair set."""

from __future__ import annotations

from ai_powered_data_pipeline_assistant_spark.operators.stream_parity import (
    NEARDUP_STREAM_BATCHES,
    neardup_stream_parity,
)


def test_stream_matches_batch_and_is_nonvacuous(spark, sf_dir):
    row = neardup_stream_parity(spark, sf_dir).collect()[0]
    assert row.n_batches == NEARDUP_STREAM_BATCHES
    assert row.stream_equals_batch and row.n_mismatches == 0
    # non-vacuous: the corpus contains cross-batch near-dups, the stream
    # found every one of them, and found them only against EARLIER batches
    assert row.n_pairs_stream == row.n_pairs_batch > 0
