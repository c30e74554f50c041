"""Streaming ANN index ingest (streaming/ann_ingest.py): the parity twin
is oracle-checked (test_oracle_parity covers windowed entries); this pins
the booleans that make it non-vacuous — arrivals exist, the streamed index
matches the one-pass encode, batch replays are idempotent, and the probe
query over the streamed index serves appended vectors."""

from __future__ import annotations

from ai_powered_data_pipeline_assistant_spark.operators.stream_parity import (
    ANN_INGEST_BATCHES,
    ann_ingest_stream_parity,
)


def test_stream_ingested_index_matches_one_pass(spark, sf_dir):
    row = ann_ingest_stream_parity(spark, sf_dir).collect()[0]
    assert row.n_batches == ANN_INGEST_BATCHES
    assert row.n_base > 0 and row.n_delta > 0
    assert row.codes_match and row.codes_mismatches == 0
    assert row.replay_idempotent
    assert row.query_match and row.query_mismatches == 0
