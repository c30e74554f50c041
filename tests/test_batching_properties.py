"""Invariant tests for the batching / robust-stats operators added in
round 3. The padding theorem: cutting batches of B from length-sorted
order minimizes Σ(batch_max × batch_size) over all groupings into batches
of the same sizes — so the sorted layout can never pad more than the
shuffled one, on ANY corpus."""

from __future__ import annotations

import random

from pyspark.sql import functions as F


def _padding(lengths: list[int], batch: int) -> int:
    total = 0
    for i in range(0, len(lengths), batch):
        chunk = lengths[i : i + batch]
        total += max(chunk) * len(chunk) - sum(chunk)
    return total


def test_sorted_batching_never_pads_more_than_shuffled():
    """Pure-Python check of the theorem the operator's report relies on,
    over randomized corpora (no Spark needed — the operator's Spark-vs-SQL
    parity is covered by the oracle test)."""
    rng = random.Random(11)
    for _ in range(50):
        n = rng.randrange(1, 300)
        lengths = [rng.randrange(1, 2000) for _ in range(n)]
        shuffled = list(lengths)
        rng.shuffle(shuffled)
        assert _padding(sorted(lengths, reverse=True), 32) <= _padding(
            shuffled, 32
        )


def test_length_batched_padding_sorted_wins_on_corpus(spark, sf_dir):
    from ai_powered_data_pipeline_assistant_spark.operators.batching import (
        length_batched_padding,
    )

    rows = {r["strategy"]: r for r in length_batched_padding(spark, sf_dir).collect()}
    assert rows["length_sorted"]["total_padding"] <= rows["hash_shuffled"][
        "total_padding"
    ]
    assert rows["length_sorted"]["n_batches"] == rows["hash_shuffled"]["n_batches"]


def test_winsorized_mean_sits_inside_bounds(spark, sf_dir):
    """The winsorized mean must lie in [p05, p95] and the clipped count
    can never exceed the group size."""
    from ai_powered_data_pipeline_assistant_spark.operators.aggregates import (
        winsorized_stats,
    )

    for r in winsorized_stats(spark, sf_dir).collect():
        assert r["p05"] <= r["winsor_avg"] <= r["p95"], r
        assert 0 <= r["clipped_cnt"] <= r["n"], r


def test_temporal_split_embargo_gap_holds(spark, sf_dir):
    """No test event may start less than EMBARGO_S after the last train
    event's cutoff side: max(train) < min(test) - embargo boundary."""
    from ai_powered_data_pipeline_assistant_spark.operators.clustering import (
        EMBARGO_S,
        temporal_split,
    )

    rows = {r["split"]: r for r in temporal_split(spark, sf_dir).collect()}
    if "1_train" in rows and "3_test" in rows:
        assert rows["3_test"]["min_es"] - rows["1_train"]["max_es"] >= 1
        # embargo rows, when present, sit strictly inside the gap
        if "2_embargo" in rows:
            assert rows["2_embargo"]["min_es"] > rows["1_train"]["max_es"]
            assert rows["2_embargo"]["max_es"] < rows["3_test"]["min_es"]
            assert (
                rows["3_test"]["min_es"] - rows["2_embargo"]["min_es"]
                >= 1
            )
            # gap between train cutoff and test start spans the embargo
            assert (
                rows["3_test"]["min_es"] - rows["1_train"]["max_es"]
                <= EMBARGO_S + (rows["2_embargo"]["min_es"] - rows["1_train"]["max_es"])
            )
