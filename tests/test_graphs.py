"""Semantic checks for the graph/sequence operators (oracle parity is
covered by test_oracle_parity; these pin the math invariants)."""

from __future__ import annotations

import math

from ai_powered_data_pipeline_assistant_spark.operators import graphs


def test_pagerank_is_a_distribution(spark, sf_dir):
    rows = graphs.event_pagerank(spark, sf_dir).collect()
    total = sum(r["pagerank"] for r in rows)
    # rank mass is conserved when every node has out-edges (transition
    # graphs from dense event logs do); rounding to 6dp per node bounds
    # the drift
    assert math.isclose(total, 1.0, abs_tol=1e-4)
    assert all(r["pagerank"] > 0 for r in rows)


def test_markov_audit_bounds(spark, sf_dir):
    rows = graphs.markov_prediction_audit(spark, sf_dir).collect()
    assert rows, "test period must contain transitions"
    for r in rows:
        assert 0 <= r["n_correct"] <= r["n_test"]
        assert 0.0 <= r["accuracy"] <= 1.0
        assert r["predicted_next"] is not None


def test_trigrams_bounded_and_ordered(spark, sf_dir):
    rows = graphs.event_trigrams(spark, sf_dir).collect()
    assert 0 < len(rows) <= graphs.TOP_TRIGRAMS
    counts = [r["n"] for r in rows]
    assert counts == sorted(counts, reverse=True)
