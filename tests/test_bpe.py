"""BPE merge trainer: greedy-merge fold exactness and trainer invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.operators.bpe import (
    BPE_MIN_COUNT,
    _chars_expr,
    _merge_pair,
    _train,
    bpe_probe_audit,
)


def test_merge_fold_is_greedy_non_overlapping(spark):
    words = spark.createDataFrame(
        [("aaa", 1), ("abab", 1), ("banana", 1)], "word string, freq long"
    ).withColumn("syms", _chars_expr())
    out = {
        r["word"]: r["syms"]
        for r in _merge_pair(words, "a", "a").collect()
    }
    assert out["aaa"] == ["aa", "a"]          # non-overlapping, left-to-right
    assert out["abab"] == ["a", "b", "a", "b"]  # no (a,a) adjacency
    out2 = {
        r["word"]: r["syms"]
        for r in _merge_pair(words, "a", "n").collect()
    }
    assert out2["banana"] == ["b", "an", "an", "a"]


def test_trainer_counts_decrease_and_pairs_unique(spark):
    words = spark.createDataFrame(
        [("banana", 4), ("bandana", 3), ("cabana", 2)], "word string, freq long"
    ).withColumn("syms", _chars_expr())
    merges = _train(words, 6, BPE_MIN_COUNT)
    assert merges, "expected at least one merge"
    counts = [c for _, _, _, c in merges]
    # greedy argmax each round → counts can rise only when a NEW pair is
    # created by a merge; the first merge must be the global max
    assert counts[0] == max(counts)
    assert len({(a, b) for _, a, b, _ in merges}) == len(merges)


def test_probe_audit_matches_local_replica(spark, sf_dir):
    from ai_powered_data_pipeline_assistant_spark.operators.bpe import _bpe_golden

    got = [
        (r["rank"], r["pair_a"], r["pair_b"], r["pair_count"])
        for r in bpe_probe_audit(spark, sf_dir).collect()
    ]
    assert got == _bpe_golden()
    # classic Sennrich family: 'e'+'r' must be the first merge
    assert got[0][1:3] == ("e", "r")
