"""Exact-substring dedup: first-wins window drop, interval merge, and the
accounting identities that make the removal pass trustworthy."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.operators.substring import (
    SUBSTR_K,
    substring_dedup,
    substring_dedup_spans,
    substring_rewrite,
)


@pytest.fixture(scope="module")
def acct(spark, sf_dir):
    return substring_dedup(spark, sf_dir).collect()


@pytest.fixture(scope="module")
def spans(spark, sf_dir):
    return substring_dedup_spans(spark, sf_dir).collect()


def test_accounting_identities(acct):
    for r in acct:
        assert r["tokens_kept"] == r["n_tokens"] - r["tokens_removed"]
        assert 0 <= r["tokens_removed"] <= r["n_tokens"]
        # a merged span covers at least K tokens; spans never overlap, so
        # removal is bounded below by spans * K
        assert r["tokens_removed"] >= r["n_dup_spans"] * SUBSTR_K
        # each dropped window adds at most K tokens to the removal
        assert r["tokens_removed"] <= r["dup_windows"] * SUBSTR_K
        if r["n_dup_spans"] == 0:
            assert r["dup_windows"] == 0 and r["tokens_removed"] == 0


def test_spans_are_disjoint_and_sized(spans):
    by_doc: dict[int, list] = {}
    for r in spans:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r["span_start"])
        for r in rows:
            assert r["span_end"] - r["span_start"] + 1 >= SUBSTR_K
            assert len(r["span_text"].split(" ")) == (
                r["span_end"] - r["span_start"] + 1
            )
        for a, b in zip(rows, rows[1:]):
            assert b["span_start"] > a["span_end"]  # merged → disjoint


def test_spans_reconcile_with_accounting(acct, spans):
    removed: dict[int, int] = {}
    windows: dict[int, int] = {}
    n_spans: dict[int, int] = {}
    for r in spans:
        removed[r["doc_id"]] = removed.get(r["doc_id"], 0) + (
            r["span_end"] - r["span_start"] + 1
        )
        windows[r["doc_id"]] = windows.get(r["doc_id"], 0) + r["n_windows"]
        n_spans[r["doc_id"]] = n_spans.get(r["doc_id"], 0) + 1
    for r in acct:
        d = r["doc_id"]
        assert r["tokens_removed"] == removed.get(d, 0)
        assert r["dup_windows"] == windows.get(d, 0)
        assert r["n_dup_spans"] == n_spans.get(d, 0)


def test_first_occurrence_always_survives(spark, sf_dir, spans):
    """First-wins keeps a strict subset: some but not all window
    occurrences drop. (Window-granularity first-wins does NOT guarantee
    the first occurrence's TOKENS survive when a repeat overlaps itself —
    e.g. 9 identical tokens at K=8 drop the pos-1 window, excising tokens
    1..7 of the kept pos-0 window; Lee et al.'s tool has the same
    all-copies-removed edge case. What IS guaranteed, and asserted here,
    is that the drop set is non-empty and strictly smaller than the
    occurrence set.)"""
    from ai_powered_data_pipeline_assistant_spark.operators.substring import (
        _dropped_intervals,
    )

    sized, dropped = _dropped_intervals(spark, sf_dir)
    n_occ = (
        sized.filter(F.col("n") >= SUBSTR_K)
        .select((F.col("n") - SUBSTR_K + 1).alias("w"))
        .agg(F.sum("w"))
        .first()[0]
    )
    n_dropped = dropped.count()
    # the kept set is non-empty and strictly smaller than all occurrences
    assert 0 < n_dropped < n_occ


def test_corpus_has_duplicate_spans(acct):
    # the synthetic corpus repeats phrases — the operator must find some
    assert sum(r["n_dup_spans"] for r in acct) > 0


def test_source_matrix_reconciles_with_accounting(spark, sf_dir, acct):
    from ai_powered_data_pipeline_assistant_spark.operators.substring import (
        substring_source_matrix,
    )

    rows = substring_source_matrix(spark, sf_dir).collect()
    # total dup windows must equal the accounting's dup_windows sum
    assert sum(r["dup_windows"] for r in rows) == sum(
        r["dup_windows"] for r in acct
    )
    for r in rows:
        assert r["losing_docs"] >= 1
        # every losing doc contributes at least one dropped window
        assert r["dup_windows"] >= r["losing_docs"]


def test_k_plan_monotone_in_k(spark, sf_dir):
    """A longer window is a strictly harder match: dropped windows are
    non-increasing in K (a theorem — every repeated (K+1)-window's prefix
    K-window repeats too, and the per-prefix-class first-wins discount is
    at most one either way; removed TOKENS are deliberately not asserted:
    a kept first occurrence can split the shorter-K interval union)."""
    from ai_powered_data_pipeline_assistant_spark.operators.substring import (
        substring_k_plan,
    )

    rows = sorted(substring_k_plan(spark, sf_dir).collect(), key=lambda r: r["k"])
    assert [r["k"] for r in rows] == [6, 8, 10, 12]
    for a, b in zip(rows, rows[1:]):
        assert a["dup_windows"] >= b["dup_windows"]
        assert a["corpus_tokens"] == b["corpus_tokens"]
    for r in rows:
        assert 0 <= r["removed_micro_share"] <= 1_000_000
        assert r["removed_micro_share"] == r["tokens_removed"] * 1_000_000 // r["corpus_tokens"]


def test_rewrite_reconciles_with_accounting(spark, sf_dir, acct):
    rw = {r["doc_id"]: r for r in substring_rewrite(spark, sf_dir).collect()}
    assert len(rw) == len(acct)
    for r in acct:
        out = rw[r["doc_id"]]
        assert out["tokens_kept"] == r["tokens_kept"]
        n_text_tokens = len(out["kept_text"].split(" ")) if out["kept_text"] else 0
        assert n_text_tokens == out["tokens_kept"]
        # untouched docs round-trip their text verbatim (modulo normalize)
        if r["tokens_removed"] == 0:
            assert out["tokens_kept"] == r["n_tokens"]


def test_hash_keyed_equals_text_keyed_first_wins(spark):
    """VERDICT r9 task #4: the default 128-bit-hash-keyed first-wins path
    must be row-identical to the text-keyed oracle twin — at sf0.01 (the
    driver's own scale), not just the suite default."""
    from ai_powered_data_pipeline_assistant_spark.catalog import load_table
    from ai_powered_data_pipeline_assistant_spark.operators.substring import (
        dropped_intervals_for,
        sized_docs,
    )

    sized = sized_docs(
        load_table(spark, "/root/testdata/sf0.01", "documents", parallelize=True)
    )
    cols = ["doc_id", "pos", "e", "owner_doc"]
    hashed = dropped_intervals_for(sized, hash_keyed=True).select(*cols)
    texted = dropped_intervals_for(sized, hash_keyed=False).select(*cols)
    assert (
        hashed.exceptAll(texted).count() + texted.exceptAll(hashed).count()
        == 0
    )
    assert hashed.count() > 0, "the sf0.01 corpus has repeated windows"


def test_k_plan_single_pass_plan_shape(spark, sf_dir, monkeypatch):
    """VERDICT r9 task #5: the K sweep runs as ONE job over one explode —
    the full-lineage plan (materialization off, so checkpoints don't
    truncate what we're counting) must carry exactly one Generate (the
    flattened all-K window array), not one explode per candidate K."""
    from ai_powered_data_pipeline_assistant_spark.operators.substring import (
        SUBSTR_K_CANDIDATES,
        substring_k_plan,
    )

    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "none")
    plan = (
        substring_k_plan(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the ONE shared occ frame feeds both sides of the first-wins
    # self-join, so full lineage shows the explode at most twice (the
    # session materialize policy folds it to one execution); the old
    # per-K loop showed 2·|candidates| = 8
    assert 1 <= plan.count("Generate explode") <= 2, plan
    assert "CartesianProductExec" not in plan
    assert len(SUBSTR_K_CANDIDATES) == 4  # sweep width unchanged


def test_rewrite_apply_lands_and_converges(spark, sf_dir):
    """The corpus-rewrite sink (VERDICT r9 task #6): the landed table's
    audit reconciles with the rewrite frame and the merge re-apply is a
    converged no-op (all matched, none inserted)."""
    from ai_powered_data_pipeline_assistant_spark.operators.substring import (
        substring_rewrite,
        substring_rewrite_apply,
    )

    row = substring_rewrite_apply(spark, sf_dir).collect()[0]
    rw = substring_rewrite(spark, sf_dir)
    assert row["n_docs"] == rw.count()
    assert row["total_tokens_kept"] == rw.agg(
        F.sum("tokens_kept")
    ).first()[0]
    assert row["reapply_updated"] == row["n_docs"]
    assert row["reapply_inserted"] == 0
    assert row["corpus_fingerprint"] != 0
