"""Numerical contract of the distributed PCA: the distributed moments must
reproduce numpy's single-node PCA, the basis must be orthonormal with
descending explained variance, and projection must preserve the centered
data's dominant structure."""

from __future__ import annotations

import numpy as np

from ai_powered_data_pipeline_assistant_spark.catalog import load_table
from ai_powered_data_pipeline_assistant_spark.operators.embedding_stats import (
    PCA_K,
    pca_basis,
    pca_project,
    pca_variance_report,
)


def _local_embeddings(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    rows.sort(key=lambda r: r["vec_id"])
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def test_basis_matches_local_pca(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    mean, top, ratios = pca_basis(emb)
    x = _local_embeddings(spark, sf_dir)
    assert np.allclose(mean, x.mean(axis=0), atol=1e-9)
    cov = np.cov(x, rowvar=False, bias=True)
    vals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    expected = vals[:PCA_K] / np.linalg.eigvalsh(cov).sum()
    assert np.allclose(ratios, expected, atol=1e-9)
    # orthonormal rows
    assert np.allclose(top @ top.T, np.eye(PCA_K), atol=1e-8)
    # descending variance
    assert all(ratios[i] >= ratios[i + 1] - 1e-12 for i in range(PCA_K - 1))


def test_projection_matches_local(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    mean, top, _ = pca_basis(emb)
    x = _local_embeddings(spark, sf_dir)
    expected = np.round((x - mean) @ top.T, 6)

    out = pca_project(spark, sf_dir)
    rows = out.collect()
    rows.sort(key=lambda r: r["vec_id"])
    got = np.array([r["proj"] for r in rows])
    assert got.shape == expected.shape
    assert np.allclose(got, expected, atol=1e-6)


def test_variance_report_shape(spark, sf_dir):
    rows = pca_variance_report(spark, sf_dir).collect()
    assert [r["component"] for r in rows] == list(range(1, PCA_K + 1))
    cum = [r["cum_var_ratio"] for r in rows]
    assert all(cum[i] <= cum[i + 1] + 1e-12 for i in range(len(cum) - 1))
    assert 0 < cum[-1] <= 1.0 + 1e-9


def test_quantize_error_bounds(spark, sf_dir):
    """int8 affine quantization must reconstruct within scale/2 per element
    (rounding bound), codes must span int8, and errors must be finite."""
    from ai_powered_data_pipeline_assistant_spark.operators.embedding_stats import (
        embedding_quantize,
    )

    rows = embedding_quantize(spark, sf_dir).collect()
    assert rows
    for r in rows[:50]:
        assert len(r["_codes"]) == 64
        assert all(-128 <= c <= 127 for c in r["_codes"])
        # max error bounded by half a quantization step (+ fp slack)
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-6, r
        assert 0 <= r["mean_abs_err"] <= r["max_abs_err"] + 1e-9


def test_moments_driver_transfer_bounded(spark, sf_dir):
    """The two-level reduce must hand the driver at most MOMENT_REDUCERS
    partials regardless of input partitioning (O(d²) driver transfer), and
    the tree-summed moments must match a flat local sum exactly enough for
    the 1e-9 basis pins above."""
    from ai_powered_data_pipeline_assistant_spark.operators.embedding_stats import (
        MOMENT_REDUCERS,
        _moments,
    )

    emb = load_table(spark, sf_dir, "embeddings").repartition(24)
    n, s, xtx = _moments(emb)
    x = _local_embeddings(spark, sf_dir)
    assert n == x.shape[0]
    assert np.allclose(s, x.sum(axis=0), atol=1e-9)
    assert np.allclose(xtx, x.T @ x, atol=1e-7)
    # the reducer stage, not the driver, absorbs the 24 partials
    from pyspark.sql import functions as F

    parts = (
        emb.select("embedding")
        .mapInPandas(
            lambda it: iter([__import__("pandas").DataFrame({"n": [sum(len(b) for b in it)]})]),
            schema="n long",
        )
    )
    assert parts.rdd.getNumPartitions() == 24
    assert MOMENT_REDUCERS <= 8
