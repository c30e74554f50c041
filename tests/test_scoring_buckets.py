"""Semantic pins for CCNet-style perplexity bucketing
(operators/scoring.py perplexity_buckets): exact thirds per language,
fluency-monotone buckets, and a complete 1..n per-language ranking.
(Cross-engine value equality is covered by the parametrized oracle-parity
suite; these pin the bucket ALGEBRA.)"""

from __future__ import annotations

from ai_powered_data_pipeline_assistant_spark.operators.scoring import (
    calibration_report,
    perplexity_buckets,
)


def _by_lang(rows):
    out: dict[str, list] = {}
    for r in rows:
        out.setdefault(r.lang, []).append(r)
    return out


def test_thirds_are_exact_per_language(spark, sf_dir, duck):
    n_docs = duck.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    rows = perplexity_buckets(spark, sf_dir).collect()
    assert len(rows) == n_docs  # every document is bucketed exactly once
    for _lang, lrows in _by_lang(rows).items():
        n = len(lrows)
        sizes = {"head": 0, "middle": 0, "tail": 0}
        for r in lrows:
            sizes[r.ppl_bucket] += 1
        assert sizes["head"] == n // 3
        assert sizes["middle"] == (n * 2) // 3 - n // 3
        assert sizes["tail"] == n - (n * 2) // 3


def test_buckets_are_fluency_monotone(spark, sf_dir):
    """head ≤ middle ≤ tail in mean negative log-prob (ties at a boundary
    may share a value — the rank cut splits them by doc_id)."""
    rows = perplexity_buckets(spark, sf_dir).collect()
    for _lang, lrows in _by_lang(rows).items():
        by_b = {"head": [], "middle": [], "tail": []}
        for r in lrows:
            by_b[r.ppl_bucket].append(r.mean_neg_logprob)
        assert max(by_b["head"]) <= min(by_b["middle"])
        assert max(by_b["middle"]) <= min(by_b["tail"])


def test_calibration_partitions_corpus_and_gaps_reconcile(spark, sf_dir, duck):
    """Every document lands in exactly one decile bucket; positives total
    the reference-label count; mean predicted probability sits inside its
    bucket's score range; abs_gap is literally |mean_pred − pos_rate|."""
    from ai_powered_data_pipeline_assistant_spark.operators.quality_trainer import (
        LABEL_MIN_CHARS,
    )

    n_docs, n_pos = duck.sql(
        f"SELECT count(*), sum(CASE WHEN len(text) >= {LABEL_MIN_CHARS} "
        f"THEN 1 ELSE 0 END) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()
    rows = calibration_report(spark, sf_dir).collect()
    assert sum(r.n_docs for r in rows) == n_docs
    assert sum(r.n_pos for r in rows) == n_pos
    for r in rows:
        assert 0 <= r.bucket <= 9
        lo, hi = r.bucket / 10.0, (r.bucket + 1) / 10.0 if r.bucket < 9 else 1.0
        assert lo <= r.mean_pred <= hi
        assert abs(r.abs_gap - abs(r.mean_pred - r.pos_rate)) < 1e-6


def test_lang_rank_is_complete_and_ordered(spark, sf_dir):
    rows = perplexity_buckets(spark, sf_dir).collect()
    for _lang, lrows in _by_lang(rows).items():
        lrows.sort(key=lambda r: r.lang_rank)
        assert [r.lang_rank for r in lrows] == list(range(1, len(lrows) + 1))
        ordered = [(r.mean_neg_logprob, r.doc_id) for r in lrows]
        assert ordered == sorted(ordered)
