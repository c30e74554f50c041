"""Incremental streaming exact-substring dedup — the span-level gate of a
continuous crawl: each arriving micro-batch of documents has every K-token
window checked against ALL windows seen in earlier batches AND against the
batch itself; repeated spans are accounted (and removable) per document,
and the batch's new windows join the seen state.

Extension lineage: batch twin `operators/substring.py` (Lee et al. 2022);
the streaming state pattern is `streaming/neardup.py`'s (bucketed
catalog-backed state, batch_id-partitioned dynamic-overwrite appends,
Hadoop-FS re-registration in fresh sessions) specialized to ONE table —
exact window membership needs no bands/postings/sizes split.

State: ``wins (h long, batch_id long)`` — one 60-bit content hash per
DISTINCT window first seen in that batch, BUCKETED on ``h``. Per batch the
arriving documents are tokenized and window-hashed ONCE (O(batch tokens));
membership against history is one LEFT-SEMI/LEFT-ANTI pair against the
h-bucketed state — only the (batch-sized) probe side shuffles into the
bucket layout, the accumulated state is read in place, never re-shuffled
or recomputed. State grows one 8-byte hash per distinct window ever seen —
the hash-keyed design the batch module's 100 TB note prescribes (collision
odds ~1e-18 at 1e12 windows; the parity audit compares against the
text-keyed batch twin, so a collision would surface as a mismatch, not
silent corruption).

Semantics (pinned by `substring_stream_parity`): an occurrence is DROPPED
iff its window was seen in an earlier batch, or earlier within this batch
by (doc_id, pos) — i.e. the batch operator's first-wins under the ARRIVAL
order (batch index, doc_id, pos). Per-batch accounting rows land via the
exactly-once batch-partitioned writer; the state append is a dynamic
overwrite of the batch's own partition, so replays after any partial
write repair both in place.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark import hadoop_fs
from ai_powered_data_pipeline_assistant_spark.execution import materialize
from ai_powered_data_pipeline_assistant_spark.functions.hashing import md5_int

SUBSTR_STATE_BUCKETS = 4
_WINS_SCHEMA = "h long, batch_id long"
_BUCKETS_MARKER = "_SPARK_GRAFT_BUCKETS_"


def _state_buckets(spark: SparkSession, state_dir: str) -> int:
    """Effective bucket width of the wins table: parsed from the
    name-encoded ``_SPARK_GRAFT_BUCKETS_{m}`` marker file inside the
    table dir (written at create and at every compaction — underscore
    prefix keeps parquet readers blind to it, and living INSIDE the dir
    means the compaction swap moves data and width ATOMICALLY together,
    the same correctness argument as the near-dup generation-dir names:
    registering re-bucketed files under the wrong count would silently
    break the bucket-pruned join). Falls back to the module constant for
    pre-marker state dirs."""
    for name in hadoop_fs.list_child_files(spark, _wins_path(state_dir)):
        if name.startswith(_BUCKETS_MARKER):
            return int(name[len(_BUCKETS_MARKER):])
    return SUBSTR_STATE_BUCKETS


def _state_table(state_dir: str) -> str:
    """Catalog table name for one stream instance (stable across restarts
    of the same stream; scheme-qualified dirs stay as-is — see
    neardup._state_tables for the abspath rationale)."""
    if ":" in state_dir.split("/", 1)[0]:
        key = state_dir.rstrip("/")
    else:
        key = os.path.abspath(state_dir)
    return f"substr_wins_{hashlib.md5(key.encode()).hexdigest()[:12]}"


def _wins_path(state_dir: str) -> str:
    return f"{state_dir.rstrip('/')}/wins"


def _create_state(spark: SparkSession, state_dir: str, table: str) -> None:
    """Create the wins table with its bucket layout — or re-register
    surviving state files when the stream restarts in a fresh session
    (the default catalog is in-memory; wiping survivors would silently
    forget the whole seen-window corpus). Refuses to bootstrap EMPTY
    state while remnants of a crashed compaction swap hold the only
    intact copy — silently forgetting the corpus would re-admit every
    historical duplicate (the near-dup module's markerless-generation
    rule, applied to the swap-aside dirs)."""
    if spark.catalog.tableExists(table):
        return
    from ai_powered_data_pipeline_assistant_spark.streaming.state_compaction import (
        guard_swap_remnants,
    )

    live_has_data = guard_swap_remnants(
        spark, state_dir, "wins", "substring stream"
    )
    path = _wins_path(state_dir)
    if live_has_data:
        # width from the marker INSIDE the dir, never the module constant:
        # a re-bucketed compaction must re-register at its own width
        spark.sql(
            f"CREATE TABLE {table} (h long, batch_id long) "
            f"USING PARQUET PARTITIONED BY (batch_id) "
            f"CLUSTERED BY (h) SORTED BY (h) "
            f"INTO {_state_buckets(spark, state_dir)} BUCKETS "
            f"LOCATION '{path}'"
        )
        spark.sql(f"ALTER TABLE {table} RECOVER PARTITIONS")
    else:
        (
            spark.createDataFrame([], _WINS_SCHEMA)
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .bucketBy(SUBSTR_STATE_BUCKETS, "h")
            .sortBy("h")
            .option("path", path)
            .format("parquet")
            .saveAsTable(table)
        )
        hadoop_fs.touch(
            spark, f"{path}/{_BUCKETS_MARKER}{SUBSTR_STATE_BUCKETS}"
        )


def drop_state(spark: SparkSession, state_dir: str) -> None:
    """Drop the stream's catalog entry (external files live under
    ``state_dir`` and follow its lifecycle)."""
    spark.sql(f"DROP TABLE IF EXISTS {_state_table(state_dir)}")


def process_substring_batch(
    docs: DataFrame, batch_id: int, state_dir: str, out_dir: str,
    text_out_dir: str | None = None,
) -> None:
    """One micro-batch of the incremental exact-substring gate —
    module-level so a test can REPLAY a completed batch and pin that the
    replay reproduces identical accounting and state.

    ``text_out_dir`` additionally lands the REWRITTEN documents — each
    arriving doc's text with its duplicate spans excised under the
    arrival first-wins order — as batch_id-partitioned parquet (the same
    exactly-once writer as the accounting): the dedup-at-ingest
    deployment shape, where the crawler emits deduplicated TEXT
    downstream, not just accounting. The excision is the batch module's
    `rewrite_for` over the SAME per-batch dropped intervals, so stream
    and batch rewrites cannot drift (pinned end to end by the rewrite leg
    of `substring_stream_parity`, operators/stream_parity.py). A doc's
    spans are FINAL when its
    batch processes: later batches can only drop their own occurrences
    (first-wins never retroactively edits an earlier doc), so the
    accumulated text table needs no updates — append-only by
    construction."""
    from ai_powered_data_pipeline_assistant_spark.operators.substring import (
        SUBSTR_K,
        accounting_for,
        rewrite_for,
        sized_docs,
        windows_expr,
    )
    from ai_powered_data_pipeline_assistant_spark.streaming.jobs import (
        idempotent_append,
    )
    from ai_powered_data_pipeline_assistant_spark.streaming.neardup import (
        _insert_dynamic,
    )

    spark = docs.sparkSession
    table = _state_table(state_dir)
    if not spark.catalog.tableExists(table):
        _create_state(spark, state_dir, table)

    sized = materialize(sized_docs(docs.select("doc_id", "text")))
    # Hash ONCE per occurrence; the window text never enters the shuffle
    # or the state (8-byte keys — the batch module's 100 TB note). The
    # window transform itself is the batch module's `windows_expr` — ONE
    # definition shared by every substring surface.
    occ = materialize(
        sized.filter(F.col("n") >= SUBSTR_K)
        .select("doc_id", F.explode(windows_expr(SUBSTR_K)).alias("w"))
        .select(
            "doc_id",
            F.col("w.pos").alias("pos"),
            md5_int(F.col("w.win")).alias("h"),
        )
    )
    # STRICTLY PRE-BATCH state (replays have already landed their own
    # partition; reading it back would drop every occurrence of the batch).
    state_h = (
        spark.table(table)
        .filter(F.col("batch_id") < batch_id)
        .select("h")
    )
    # Within-batch first occurrence per window hash — the map-side-combined
    # min(struct) shape of the batch operator.
    firsts_b = occ.groupBy("h").agg(
        F.min(F.struct("doc_id", "pos")).alias("first")
    )
    # A batch occurrence survives iff it IS its window's within-batch first
    # AND the window is unseen in state; everything else drops. Both state
    # probes are batch-sized against the h-bucketed table (semi/anti join:
    # the probe side shuffles into the bucket layout, state scans in place).
    batch_firsts = (
        occ.join(firsts_b, "h")
        .filter(
            (F.col("doc_id") == F.col("first.doc_id"))
            & (F.col("pos") == F.col("first.pos"))
        )
        .select("doc_id", "pos", "h")
    )
    kept = batch_firsts.join(state_h, "h", "left_anti").select(
        "doc_id", "pos", "h"
    ).transform(materialize)
    dropped = occ.join(
        kept.select("doc_id", "pos"), ["doc_id", "pos"], "left_anti"
    ).select("doc_id", "pos", (F.col("pos") + SUBSTR_K - 1).alias("e"))

    acct = accounting_for(sized, dropped)
    # Exactly-once per-batch accounting: batch_id-partitioned dynamic
    # overwrite (batch docs appear in exactly one batch, so the union of
    # partitions is the per-doc accounting under the arrival order).
    idempotent_append(acct, batch_id, out_dir)
    if text_out_dir is not None:
        # two consumers of `dropped` (accounting above + rewrite) — the
        # shared occ/kept frames are already materialized, and dropped is
        # a cheap anti-join over them, so no extra barrier needed
        idempotent_append(rewrite_for(sized, dropped), batch_id, text_out_dir)
    # State append: the batch's NEW distinct windows (their first
    # occurrence's hash). Dynamic overwrite of the batch partition makes
    # replays self-repairing.
    _insert_dynamic(
        kept.select("h").distinct().select(
            "h", F.lit(batch_id).cast("long").alias("batch_id")
        ),
        table,
        bucket_cols=["h"],
        n_buckets=SUBSTR_STATE_BUCKETS,
    )


def compact_substring_state(
    spark: SparkSession, state_dir: str, n_buckets: int | None = None
) -> int:
    """Offline state compaction (run with the stream stopped): per-batch
    appends leave one file set per batch; fold every batch partition
    EXCEPT the newest into a single ``batch_id = -1`` partition with the
    same bucket layout — or, with ``n_buckets``, RE-BUCKET to a new width
    in the same pass (round 10, the near-dup compactor's re-bucketing
    lever brought to this table: state grows one hash per distinct window
    forever, so the width that kept buckets at 128 MB–1 GB at bring-up is
    eventually too coarse; the new width rides the name-encoded marker
    file inside the staged dir, so the swap moves data and width
    atomically and `_create_state` re-registers at the width the files
    were actually written with). Fold selection and the bucketed staged
    write go through the shared `streaming/state_compaction` core
    (round 11, VERDICT r10 task #6) — its docstring carries the
    crash-window argument for why the newest partition stays un-folded
    (a replay must keep seeing its own rows excluded by the
    strictly-pre-batch filter; folding them into -1 would make the
    replayed batch treat its own windows as history and rewrite its
    accounting with everything dropped — round-9 review). The compacted
    copy is staged NEXT TO the live dir and swapped in with checked
    renames (`hadoop_fs.swap_dirs` — rollback on a failed second rename),
    then the catalog entry is dropped so the next batch's `_create_state`
    re-registers the compacted files at the SAME path — no generation
    naming needed because the table location never changes (a crash
    between the two renames is caught by `_create_state`'s
    remnant guard, which refuses to bootstrap empty state).
    The per-h min-fold collapse is a no-op by construction (a window's
    hash enters state in exactly one batch partition) but guards against
    a replay interleaving bug ever landing duplicates — including
    duplicates straddling the preserved newest partition, which it
    assigns to the history side. Object-store-safe: staging
    and swap go through the Hadoop FileSystem API. Returns the parquet
    file count after compaction."""
    from ai_powered_data_pipeline_assistant_spark.streaming.state_compaction import (
        fold_expr,
        newest_batch_id,
        write_staged_bucketed,
    )

    table = _state_table(state_dir)
    _create_state(spark, state_dir, table)
    live = _wins_path(state_dir)
    staged = f"{live}_staged"
    hadoop_fs.delete_recursive(spark, staged)  # leftovers of a dead run
    tmp_name = f"{table}_compact"
    spark.sql(f"DROP TABLE IF EXISTS {tmp_name}")
    max_bid = newest_batch_id(spark, [table])
    if max_bid is None:
        return hadoop_fs.count_parquet(spark, live)  # empty state: no-op
    # One row per h, duplicates collapsed to the HISTORY side (min of the
    # folded batch_id): if a bad replay ever landed a hash in the newest
    # partition that history already owns, assigning it to -1 keeps state
    # consistent under a later replay of the newest batch (the replay
    # overwrites its partition with its own kept set; the hash survives
    # in -1). A plain distinct over (h, folded id) would keep BOTH copies.
    width = n_buckets or _state_buckets(spark, state_dir)
    compacted = (
        spark.table(table)
        .select("h", fold_expr(max_bid).alias("batch_id"))
        .groupBy("h")
        .agg(F.min("batch_id").alias("batch_id"))
    )
    write_staged_bucketed(compacted, ["h"], width, tmp_name, staged)
    # width marker INSIDE the staged dir — the swap below carries data
    # and width together
    hadoop_fs.touch(spark, f"{staged}/{_BUCKETS_MARKER}{width}")
    # drop BOTH catalog entries first (external drops leave files), then
    # swap the directories; the next _create_state re-registers the
    # compacted files at the unchanged live path
    spark.sql(f"DROP TABLE {tmp_name}")
    spark.sql(f"DROP TABLE {table}")
    hadoop_fs.swap_dirs(spark, live, staged)
    _create_state(spark, state_dir, table)
    return hadoop_fs.count_parquet(spark, live)


def run_substring_stream(
    docs_stream: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint: str,
    text_out_dir: str | None = None,
):
    """Wire the incremental exact-substring gate over a (doc_id, text)
    source; ``text_out_dir`` opts into landing the rewritten documents
    per batch (see `process_substring_batch`). Returns the started
    StreamingQuery (availableNow)."""

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        process_substring_batch(
            batch_df, batch_id, state_dir, out_dir, text_out_dir=text_out_dir
        )

    return (
        docs_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_handle)
        .trigger(availableNow=True)
        .start()
    )
