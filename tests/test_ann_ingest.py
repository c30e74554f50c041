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


def test_crawl_pipeline_composes_gate_and_index(spark, sf_dir):
    """The composed crawl pipeline (near-dup gate → curate → index
    maintenance): streamed keep-set equals the batch arrival rule, some
    docs are actually dropped (non-vacuous on this corpus), dropped docs'
    vectors are absent from the maintained index, and the index equals a
    one-pass encode of base ∪ curated."""
    from ai_powered_data_pipeline_assistant_spark.operators.stream_parity import (
        CRAWL_BATCHES,
        crawl_pipeline_parity,
    )

    row = crawl_pipeline_parity(spark, sf_dir).collect()[0]
    assert row.n_batches == CRAWL_BATCHES
    assert 0 < row.n_curated_stream < row.n_arrivals  # gate fired
    assert row.n_curated_stream == row.n_curated_batch
    assert row.curated_match and row.curated_mismatches == 0
    assert row.index_match and row.index_mismatches == 0
