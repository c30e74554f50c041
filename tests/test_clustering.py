"""k-means invariants + deterministic split properties."""

from __future__ import annotations

from ai_powered_data_pipeline_assistant_spark.operators.clustering import (
    KMEANS_K,
    kmeans_embeddings,
    stratified_sample,
    total_inertia,
    train_test_split,
)


def test_kmeans_inertia_non_increasing(spark, sf_dir):
    """Lloyd's invariant: more iterations never increase total inertia."""
    i1 = total_inertia(spark, sf_dir, iters=1)
    i3 = total_inertia(spark, sf_dir, iters=3)
    i5 = total_inertia(spark, sf_dir, iters=5)
    assert i1 >= i3 >= i5
    assert i5 < i1  # and it actually improves from the seed centroids


def test_kmeans_covers_all_vectors(spark, sf_dir):
    from ai_powered_data_pipeline_assistant_spark.catalog import load_table

    stats = kmeans_embeddings(spark, sf_dir, iters=2).collect()
    assert len(stats) <= KMEANS_K
    n = load_table(spark, sf_dir, "embeddings").count()
    assert sum(r["size"] for r in stats) == n
    assert all(len(r["centroid"]) == 64 for r in stats)


def test_split_is_stable_and_partitioning(spark, sf_dir):
    a = {r["doc_id"]: r["split"] for r in train_test_split(spark, sf_dir).collect()}
    b = {r["doc_id"]: r["split"] for r in train_test_split(spark, sf_dir).collect()}
    assert a == b  # rerun-stable
    frac_train = sum(1 for s in a.values() if s == "train") / len(a)
    assert 0.7 < frac_train < 0.9  # ~80% by construction


def test_stratified_sample_downsamples_en_only(spark, sf_dir):
    from ai_powered_data_pipeline_assistant_spark.catalog import load_table

    full = (
        load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .count()
        .collect()
    )
    full_by_lang = {r["lang"]: r["count"] for r in full}
    sampled = stratified_sample(spark, sf_dir).groupBy("lang").count().collect()
    samp_by_lang = {r["lang"]: r["count"] for r in sampled}
    for lang, cnt in full_by_lang.items():
        if lang == "en":
            assert samp_by_lang[lang] < cnt  # downsampled
        else:
            assert samp_by_lang[lang] == cnt  # kept whole
