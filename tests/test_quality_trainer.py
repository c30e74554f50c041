"""Distributed logistic trainer: determinism under repartitioning and the
GD invariants."""

from __future__ import annotations

from ai_powered_data_pipeline_assistant_spark.operators.quality_trainer import (
    LOGREG_PROBES,
    _logreg_train,
    quality_trainer_report,
)


def _probe_df(spark, parts):
    return spark.createDataFrame(
        LOGREG_PROBES, "features array<double>, label double"
    ).repartition(parts)


def test_training_is_partitioning_invariant(spark):
    """The int64-quantized gradient makes the whole trajectory identical
    whatever the partitioning — the property that keeps distributed
    training reproducible."""
    w1, h1 = _logreg_train(_probe_df(spark, 1), dims=3, iters=6)
    w5, h5 = _logreg_train(_probe_df(spark, 5), dims=3, iters=6)
    assert w1 == w5
    assert h1 == h5


def test_probe_loss_decreases_and_separates(spark):
    w, history = _logreg_train(_probe_df(spark, 3), dims=3, iters=10)
    losses = [l for _, l, _ in history]
    assert all(a >= b for a, b in zip(losses, losses[1:]))
    # separable target y = 1 iff f1 > f2 → w1 positive, w2 negative
    assert w[1] > 0 > w[2]


def test_corpus_trainer_beats_majority_baseline(spark, sf_dir):
    rows = {(r["iter"], r["metric"]): r["value"] for r in
            quality_trainer_report(spark, sf_dir).collect()}
    acc = rows[(0, "accuracy_ppm")]
    losses = [v for (it, m), v in rows.items() if m == "loss"]
    assert min(losses) == rows[(max(it for it, m in rows if m == "loss"), "loss")]
    assert acc > 700_000  # > majority-class base rate (~68%)
