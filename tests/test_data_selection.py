"""Semantic pins for the data-selection family (operators/data_selection.py)
— properties the DuckDB parity sweep can't express: directionality of the
DSIR importance signal, probability-simplex and temperature-monotonicity
invariants of the mix plan, and bounds/partitioning-invariance of the
novelty report."""

from __future__ import annotations

import pytest

from ai_powered_data_pipeline_assistant_spark.operators.data_selection import (
    DSIR_SAMPLE_K,
    DSIR_TARGET_LANG,
    MIX_ALPHAS,
    dsir_gumbel_resample,
    dsir_importance_weights,
    ngram_novelty_report,
    temperature_mix_plan,
)


@pytest.fixture(scope="module")
def importance(spark, sf_dir):
    return dsir_importance_weights(spark, sf_dir).collect()


def test_dsir_targets_score_higher_on_average(importance):
    """The whole point of DSIR: documents FROM the target domain must have
    higher mean importance than the rest (the model was fit to them)."""
    tgt = [r.importance for r in importance if r.lang == DSIR_TARGET_LANG]
    rest = [r.importance for r in importance if r.lang != DSIR_TARGET_LANG]
    assert tgt and rest
    assert sum(tgt) / len(tgt) > sum(rest) / len(rest)


def test_dsir_covers_every_document(importance, duck, sf_dir):
    n_docs = duck.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    assert len(importance) == n_docs
    assert all(r.n_ngrams >= 1 for r in importance)


def test_gumbel_resample_is_topk_and_deterministic(spark, sf_dir):
    a = dsir_gumbel_resample(spark, sf_dir).collect()
    b = dsir_gumbel_resample(spark, sf_dir).collect()
    assert [r.doc_id for r in a] == [r.doc_id for r in b]  # reproducible
    assert len(a) == DSIR_SAMPLE_K
    keys = [r.key for r in a]
    assert keys == sorted(keys, reverse=True)
    # the noisy sample must still skew toward the target domain
    n_tgt = sum(1 for r in a if r.lang == DSIR_TARGET_LANG)
    assert n_tgt > DSIR_SAMPLE_K // 2


def test_mix_plan_simplex_and_temperature_direction(spark, sf_dir):
    rows = temperature_mix_plan(spark, sf_dir).collect()
    by_alpha: dict[float, list] = {}
    for r in rows:
        by_alpha.setdefault(r.alpha, []).append(r)
    assert set(by_alpha) == set(MIX_ALPHAS)
    for alpha, grp in by_alpha.items():
        assert sum(r.p_temp for r in grp) == pytest.approx(1.0, abs=1e-4)
    # alpha=1 reproduces the raw mixture
    for r in by_alpha[1.0]:
        assert r.p_temp == pytest.approx(r.p_raw, abs=2e-6)
    # lower temperature flattens: the biggest source loses mass, the
    # smallest gains, monotonically in alpha
    for stat, pick in (("max", max), ("min", min)):
        shares = [
            pick(r.p_temp for r in by_alpha[a]) for a in sorted(MIX_ALPHAS)
        ]
        if stat == "max":
            assert shares == sorted(shares)  # max share grows with alpha
        else:
            assert shares == sorted(shares, reverse=True)


def test_novelty_bounds_and_partitioning_invariance(spark, sf_dir):
    rows = ngram_novelty_report(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_novel <= r.n_test_ngrams
        assert 0.0 <= r.novelty_pct <= 100.0
    # shuffle-partition count must not change exact distinct counts
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        again = ngram_novelty_report(spark, sf_dir).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
