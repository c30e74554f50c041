"""Semantic pins for CCNet-style perplexity bucketing
(operators/scoring.py perplexity_buckets): exact thirds per language,
fluency-monotone buckets, and a complete 1..n per-language ranking.
(Cross-engine value equality is covered by the parametrized oracle-parity
suite; these pin the bucket ALGEBRA.)"""

from __future__ import annotations

from ai_powered_data_pipeline_assistant_spark.operators.scoring import (
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


def test_lang_rank_is_complete_and_ordered(spark, sf_dir):
    rows = perplexity_buckets(spark, sf_dir).collect()
    for _lang, lrows in _by_lang(rows).items():
        lrows.sort(key=lambda r: r.lang_rank)
        assert [r.lang_rank for r in lrows] == list(range(1, len(lrows) + 1))
        ordered = [(r.mean_neg_logprob, r.doc_id) for r in lrows]
        assert ordered == sorted(ordered)
