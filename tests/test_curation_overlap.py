"""Gate-overlap matrix: pairwise fail-overlap of INDEPENDENTLY evaluated
curation gates, reconciled against the sequential funnel's counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table
from ai_powered_data_pipeline_assistant_spark.operators.curation import (
    GATE_NAMES,
    curation_funnel,
    gate_overlap_matrix,
)


def _matrix(spark, sf_dir):
    m = {}
    for r in gate_overlap_matrix(spark, sf_dir).collect():
        m[(r["gate_a"], r["gate_b"])] = r["n_fail_both"]
        m[(r["gate_b"], r["gate_a"])] = r["n_fail_both"]
    return m


def test_overlap_reconciles_with_funnel(spark, sf_dir):
    m = _matrix(spark, sf_dir)
    funnel = {
        r["stage"]: r["n_docs"] for r in curation_funnel(spark, sf_dir).collect()
    }
    # diagonal lang = sequential lang-gate drops (first gate: identical)
    assert m[("lang", "lang")] == funnel["total"] - funnel["lang_gate"]
    # sequential quality drops = independent quality fails among lang
    # survivors = quality diagonal minus the (lang, quality) overlap
    assert (
        funnel["lang_gate"] - funnel["quality_gate"]
        == m[("quality", "quality")] - m[("lang", "quality")]
    )


def test_overlap_matrix_invariants(spark, sf_dir):
    m = _matrix(spark, sf_dir)
    rows = gate_overlap_matrix(spark, sf_dir).collect()
    # upper-triangle emission: one row per unordered pair
    assert len(rows) == len(GATE_NAMES) * (len(GATE_NAMES) + 1) // 2
    for a in GATE_NAMES:
        for b in GATE_NAMES:
            assert 0 <= m[(a, b)] <= min(m[(a, a)], m[(b, b)])
    # the synthetic corpus exercises the lang, quality and near-dup gates
    assert m[("lang", "lang")] > 0
    assert m[("quality", "quality")] > 0
    assert m[("near_dup", "near_dup")] > 0


def test_exact_dup_diagonal_counts_non_first_copies(spark, sf_dir):
    m = _matrix(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    total = docs.count()
    distinct_texts = docs.select(F.sha2("text", 256)).distinct().count()
    assert m[("exact_dup", "exact_dup")] == total - distinct_texts
