"""Incremental streaming exact-substring dedup: batch-replay idempotency,
fresh-session state re-registration, and cross-batch gating."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.streaming.substring_stream import (
    _state_table,
    compact_substring_state,
    drop_state,
    process_substring_batch,
)


@pytest.fixture()
def tmpdirs():
    tmp = tempfile.mkdtemp(prefix="substr_stream_test_")
    yield f"{tmp}/state", f"{tmp}/acct", tmp
    shutil.rmtree(tmp, ignore_errors=True)


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# 10 tokens → windows at pos 0..2 (K=8); doc 1 repeats doc 0's text so
# every window of doc 1 is a cross-batch duplicate.
_TEXT_A = "a b c d e f g h i j"
_TEXT_B = "x y z q r s t u v w"


def test_cross_batch_gating_and_accounting(spark, tmpdirs):
    state_dir, out_dir, _ = tmpdirs
    try:
        process_substring_batch(
            _mkdocs(spark, [(0, _TEXT_A)]), 0, state_dir, out_dir
        )
        process_substring_batch(
            _mkdocs(spark, [(1, _TEXT_A), (2, _TEXT_B)]), 1, state_dir, out_dir
        )
        acct = {
            r["doc_id"]: r
            for r in spark.read.parquet(out_dir).collect()
        }
        assert acct[0]["tokens_removed"] == 0  # first copy survives
        assert acct[1]["tokens_removed"] == 10  # full repeat excised
        assert acct[1]["dup_windows"] == 3
        assert acct[2]["tokens_removed"] == 0  # fresh text untouched
    finally:
        drop_state(spark, state_dir)


def test_replay_is_idempotent(spark, tmpdirs):
    """Re-running a completed batch (the crash window between the parquet
    commits and the checkpoint commit) must leave accounting AND state
    byte-identical."""
    state_dir, out_dir, _ = tmpdirs
    table = _state_table(state_dir)
    try:
        process_substring_batch(
            _mkdocs(spark, [(0, _TEXT_A)]), 0, state_dir, out_dir
        )
        batch1 = _mkdocs(spark, [(1, _TEXT_A), (2, _TEXT_B)])
        process_substring_batch(batch1, 1, state_dir, out_dir)
        acct1 = sorted(
            tuple(r) for r in spark.read.parquet(out_dir).collect()
        )
        state1 = sorted(tuple(r) for r in spark.table(table).collect())
        # replay batch 1
        process_substring_batch(batch1, 1, state_dir, out_dir)
        acct2 = sorted(
            tuple(r) for r in spark.read.parquet(out_dir).collect()
        )
        state2 = sorted(tuple(r) for r in spark.table(table).collect())
        assert acct1 == acct2
        assert state1 == state2
    finally:
        drop_state(spark, state_dir)


def test_fresh_session_reregisters_surviving_state(spark, tmpdirs):
    """Dropping the catalog entry (what a restart into a fresh in-memory
    catalog looks like) must NOT lose the seen-window corpus: the next
    batch re-registers the surviving files and still gates pre-drop
    duplicates."""
    state_dir, out_dir, _ = tmpdirs
    try:
        process_substring_batch(
            _mkdocs(spark, [(0, _TEXT_A)]), 0, state_dir, out_dir
        )
        drop_state(spark, state_dir)  # catalog gone, files survive
        process_substring_batch(
            _mkdocs(spark, [(1, _TEXT_A)]), 1, state_dir, out_dir
        )
        acct = {
            r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()
        }
        assert acct[1]["tokens_removed"] == 10  # batch-0 windows remembered
    finally:
        drop_state(spark, state_dir)


def test_within_batch_first_wins(spark, tmpdirs):
    state_dir, out_dir, _ = tmpdirs
    try:
        process_substring_batch(
            _mkdocs(spark, [(5, _TEXT_A), (6, _TEXT_A)]), 0, state_dir, out_dir
        )
        acct = {
            r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()
        }
        assert acct[5]["tokens_removed"] == 0  # lower doc_id wins
        assert acct[6]["tokens_removed"] == 10
    finally:
        drop_state(spark, state_dir)


def test_compaction_preserves_state_and_still_gates(spark, tmpdirs):
    """Compaction folds per-batch file sets into one bucket-aligned
    partition at the SAME path; the seen-window corpus survives byte-equal
    and the next batch still gates pre-compaction duplicates."""
    from ai_powered_data_pipeline_assistant_spark import hadoop_fs

    state_dir, out_dir, _ = tmpdirs
    table = _state_table(state_dir)
    try:
        process_substring_batch(
            _mkdocs(spark, [(0, _TEXT_A)]), 0, state_dir, out_dir
        )
        process_substring_batch(
            _mkdocs(spark, [(1, _TEXT_B)]), 1, state_dir, out_dir
        )
        before = sorted(
            r["h"] for r in spark.table(table).select("h").collect()
        )
        files_before = hadoop_fs.count_parquet(
            spark, f"{state_dir.rstrip('/')}/wins"
        )
        files_after = compact_substring_state(spark, state_dir)
        assert files_after <= files_before
        after = sorted(
            r["h"] for r in spark.table(table).select("h").collect()
        )
        assert before == after
        # post-compaction batches still see the full corpus
        process_substring_batch(
            _mkdocs(spark, [(2, _TEXT_A)]), 2, state_dir, out_dir
        )
        acct = {
            r["doc_id"]: r for r in spark.read.parquet(out_dir).collect()
        }
        assert acct[2]["tokens_removed"] == 10
    finally:
        drop_state(spark, state_dir)


def test_state_stores_one_hash_per_distinct_window(spark, tmpdirs):
    state_dir, out_dir, _ = tmpdirs
    table = _state_table(state_dir)
    try:
        process_substring_batch(
            _mkdocs(spark, [(0, _TEXT_A), (1, _TEXT_A)]), 0, state_dir, out_dir
        )
        state = spark.table(table)
        n = state.count()
        n_distinct = state.select("h").distinct().count()
        assert n == n_distinct == 3  # 3 windows, duplicates not re-stored
    finally:
        drop_state(spark, state_dir)
