"""Incremental streaming near-duplicate CLUSTERING — the tier between the
streaming pair gate (`streaming/neardup.py`, which lands verified
(later, earlier) PAIRS per micro-batch) and the batch clustering module
(`operators/neardup_cluster.py`, which pointer-doubles connected
components over ALL pairs at once): maintain the component labels
INCREMENTALLY, one pair-batch at a time, without ever re-running CC over
the accumulated history.

Extension lineage: the reference stops at per-row content-hash dedup
(backend/services/vector_service.py:105); grouping near-dup pairs into
families is the standard tail of a web-scale dedup pipeline (the batch
module's docstring), and a CONTINUOUS crawl needs the incremental form —
re-clustering 10^9 accumulated pairs per micro-batch is the O(corpus-age)
per-batch cost this repo's streaming designs exist to avoid.

Design — append-only union-find over two state tables:

- ``roots     (doc_id, root, batch_id)`` — one row per document, written
  by the batch that FIRST sees it in a pair; bucketed on doc_id so the
  per-batch resolution join reads state in place (only the batch-sized
  endpoint frame shuffles). Rows are never updated: a doc whose
  component later merges is re-pointed through redirects, not rewritten.
- ``redirects (old_root, new_root, batch_id)`` — one row per MERGE EVENT
  (a batch pair connecting two existing components): the losing root
  points at the min-rule winner. Append-only; cardinality is bounded by
  (#components ever − #components now) ≤ #clustered docs, and in
  practice merge events ≪ docs — the table broadcasts.

Per batch: (1) pointer-double the (small) redirect log into a FLAT
old→final map — O(log chain-depth) joins over merge events only, never
the corpus; (2) resolve the batch's pair endpoints: roots lookup
(bucket-pruned, state side in place) then ONE flat-map hop; (3) run
`connected_components` over the RESOLVED-root edges — a batch-sized
graph; (4) append new docs' (doc_id, final_label) rows and the losing
roots' redirect rows, both batch_id-partitioned dynamic overwrites, so a
replay after any partial write overwrites its own partitions with
identical rows (resolution reads STRICTLY pre-batch state, the
substring-stream rule). Labels are min-doc-id everywhere, so the
resolved assignment equals the batch module's CC over the union of all
pairs regardless of arrival order — which is exactly what
`neardup_cluster_stream_parity` (operators/stream_parity.py) pins, with
the DuckDB oracle recomputing the component count/membership via the
shared recursive-CTE transitive closure.

`compact_cluster_state` (round 11, VERDICT r10 task #3) folds resolved
redirects INTO the roots partitions: every roots row outside the newest
(replayable) batch partition is rewritten with its fully-resolved label
into the ``batch_id = -1`` history partition (the shared
`streaming/state_compaction` fold-all-but-newest core), and the absorbed
redirect partitions are deleted — post-compaction the redirect log holds
the newest batch's merge events only, so read-time pointer-doubling work
tracks RECENT merges instead of all merges ever. On a
template-spam-heavy corpus (merge events ≈ clustered docs) this is the
difference between a broadcastable flat map and one that grows with the
corpus. Crash-window: roots swap first, redirect deletes after — a crash
between the two leaves already-absorbed redirect rows behind, which are
harmless at read time (their old_roots no longer appear as any row's
root: resolution is idempotent on a flattened map) and are removed by
the next compaction.
"""

from __future__ import annotations

import hashlib
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark import hadoop_fs
from ai_powered_data_pipeline_assistant_spark.execution import (
    materialize,
    materialize_barrier,
)

CLUSTER_STATE_BUCKETS = 4
_ROOTS_SCHEMA = "doc_id long, root long, batch_id long"
MAX_FLATTEN_ROUNDS = 30


def _roots_table(state_dir: str) -> str:
    if ":" in state_dir.split("/", 1)[0]:
        key = state_dir.rstrip("/")
    else:
        key = os.path.abspath(state_dir)
    return f"cc_roots_{hashlib.md5(key.encode()).hexdigest()[:12]}"


def _roots_path(state_dir: str) -> str:
    return f"{state_dir.rstrip('/')}/roots"


def _redirects_path(state_dir: str) -> str:
    return f"{state_dir.rstrip('/')}/redirects"


def _create_state(spark: SparkSession, state_dir: str, table: str) -> None:
    """Create the roots table with its bucket layout, or re-register
    surviving files in a fresh session (the substring-stream pattern).
    Refuses to bootstrap EMPTY state while remnants of a crashed
    compaction swap hold the only intact copy — silently forgetting the
    accumulated assignment would relabel every historical component
    (the substring module's swap-aside remnant guard)."""
    if spark.catalog.tableExists(table):
        return
    from ai_powered_data_pipeline_assistant_spark.streaming.state_compaction import (
        guard_swap_remnants,
    )

    live_has_data = guard_swap_remnants(
        spark, state_dir, "roots", "cluster stream"
    )
    path = _roots_path(state_dir)
    if live_has_data:
        spark.sql(
            f"CREATE TABLE {table} (doc_id long, root long, batch_id long) "
            f"USING PARQUET PARTITIONED BY (batch_id) "
            f"CLUSTERED BY (doc_id) SORTED BY (doc_id) "
            f"INTO {CLUSTER_STATE_BUCKETS} BUCKETS "
            f"LOCATION '{path}'"
        )
        spark.sql(f"ALTER TABLE {table} RECOVER PARTITIONS")
    else:
        (
            spark.createDataFrame([], _ROOTS_SCHEMA)
            .write.mode("overwrite")
            .partitionBy("batch_id")
            .bucketBy(CLUSTER_STATE_BUCKETS, "doc_id")
            .sortBy("doc_id")
            .option("path", path)
            .format("parquet")
            .saveAsTable(table)
        )


def drop_state(spark: SparkSession, state_dir: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {_roots_table(state_dir)}")


def _flat_redirects(redirects: DataFrame) -> DataFrame:
    """Pointer-double the redirect log into a flat (old_root, final_root)
    map. old_root is unique by construction (a root is redirected at most
    once — after that, every resolution lands on its successor), so the
    mapping is functional and each round halves the remaining chain
    depth. Work is O(merge events · log depth), corpus-independent.
    Convergence is a scalar sum compare (targets only ever decrease —
    min-rule labels)."""
    flat = materialize_barrier(
        redirects.select("old_root", F.col("new_root").alias("final_root"))
    )
    prev = flat.agg(F.sum("final_root")).first()[0]
    if prev is None:
        return flat
    for _ in range(MAX_FLATTEN_ROUNDS):
        hop = flat.select(
            F.col("old_root").alias("final_root"),
            F.col("final_root").alias("hop"),
        )
        flat = materialize_barrier(
            flat.join(hop, "final_root", "left").select(
                "old_root",
                F.coalesce("hop", "final_root").alias("final_root"),
            )
        )
        cur = flat.agg(F.sum("final_root")).first()[0]
        if cur == prev:
            return flat
        prev = cur
    # unreachable in practice (needs chain depth > 2^30 merge events), but
    # a partially flattened map would yield silently WRONG cluster labels
    # — fail loudly instead (ADVICE r10)
    raise RuntimeError(
        f"redirect flattening did not converge in {MAX_FLATTEN_ROUNDS} "
        "pointer-doubling rounds — redirect log is deeper than 2**30 "
        "or contains a cycle (corrupted state)"
    )


def _read_redirects(spark: SparkSession, state_dir: str) -> DataFrame:
    path = _redirects_path(state_dir)
    if hadoop_fs.has_parquet(spark, path):
        return spark.read.parquet(path)
    return spark.createDataFrame(
        [], "old_root long, new_root long, batch_id long"
    )


def process_cluster_batch(
    pairs: DataFrame, batch_id: int, state_dir: str
) -> None:
    """One micro-batch of incremental clustering over a (a_id, b_id)
    verified-pair frame — module-level so tests can replay a completed
    batch and pin identical state (the streaming-module convention)."""
    from ai_powered_data_pipeline_assistant_spark.operators.neardup_cluster import (
        connected_components,
    )
    from ai_powered_data_pipeline_assistant_spark.streaming.neardup import (
        _insert_dynamic,
    )

    spark = pairs.sparkSession
    table = _roots_table(state_dir)
    if not spark.catalog.tableExists(table):
        _create_state(spark, state_dir, table)

    pairs = materialize(pairs.select("a_id", "b_id"))
    # strictly PRE-batch state (replay rule: a replayed batch must not
    # read its own partial writes)
    pre = F.col("batch_id") < batch_id
    roots_s = spark.table(table).filter(pre)
    flat = _flat_redirects(_read_redirects(spark, state_dir).filter(pre))

    ends = pairs.select(F.col("a_id").alias("doc_id")).unionByName(
        pairs.select(F.col("b_id").alias("doc_id"))
    ).distinct()
    # resolution: roots lookup (state side read in place — the endpoint
    # frame is the shuffled/broadcast side) + one hop through the flat map
    cur = (
        ends.join(roots_s.select("doc_id", "root"), "doc_id", "left")
        .withColumn("root0", F.coalesce("root", "doc_id"))
        .join(
            F.broadcast(flat.select(F.col("old_root").alias("root0"),
                                    "final_root")),
            "root0",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("final_root", "root0").alias("rroot"),
            # provenance: a KNOWN doc's rroot is a live component root;
            # a new doc's rroot is its own id, which nothing references
            F.col("root").isNotNull().alias("known"),
        )
        .transform(materialize)  # feeds edges AND the new-roots join
    )
    edges = (
        pairs.join(
            cur.select(F.col("doc_id").alias("a_id"),
                       F.col("rroot").alias("ra")),
            "a_id",
        )
        .join(
            cur.select(F.col("doc_id").alias("b_id"),
                       F.col("rroot").alias("rb")),
            "b_id",
        )
        .filter(F.col("ra") != F.col("rb"))
        .select(F.col("ra").alias("a_id"), F.col("rb").alias("b_id"))
        .distinct()
    )
    # batch-sized CC over RESOLVED roots (never the accumulated graph)
    groups = materialize_barrier(
        connected_components(edges).select(
            F.col("node").alias("rroot"), F.col("label").alias("gl")
        )
    )
    # one redirect row per MERGE EVENT: only roots some pre-existing doc
    # resolves through get a row — a brand-new doc's losing own-id "root"
    # is never referenced (its roots row below carries the final label
    # directly), and writing it would bloat the merge log to
    # clustered-doc order instead of merge-event order
    known_roots = cur.filter("known").select("rroot").distinct()
    new_redirects = (
        groups.filter(F.col("rroot") != F.col("gl"))
        .join(known_roots, "rroot", "left_semi")
        .select(
            F.col("rroot").alias("old_root"),
            F.col("gl").alias("new_root"),
            F.lit(batch_id).cast("long").alias("batch_id"),
        )
    )
    new_roots = (
        cur.join(roots_s.select("doc_id"), "doc_id", "left_anti")
        .join(groups, "rroot", "left")
        .select(
            "doc_id",
            F.coalesce("gl", "rroot").alias("root"),
            F.lit(batch_id).cast("long").alias("batch_id"),
        )
    )
    # exactly-once appends: dynamic overwrite of the batch's own
    # partitions (bucketed insertInto for roots, plain parquet for the
    # merge log)
    _insert_dynamic(
        new_roots.select("doc_id", "root", "batch_id"),
        table,
        bucket_cols=["doc_id"],
        n_buckets=CLUSTER_STATE_BUCKETS,
    )
    (
        # rebalance: one advisory-sized file per batch partition instead
        # of one per upstream task (guide §6 — see jobs.idempotent_append)
        new_redirects.hint("rebalance")
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(_redirects_path(state_dir))
    )


def resolved_roots(spark: SparkSession, state_dir: str) -> DataFrame:
    """(doc_id, cluster_id) for every document ever seen in a pair — the
    read-time view: stored root, then one hop through the pointer-doubled
    flat redirect map. Equals the batch module's `connected_components`
    labels over the union of all ingested pairs (pinned by
    `neardup_cluster_stream_parity`).

    Crash-window read semantics (ADVICE r10, mirroring the
    substring-stream note): this reads ALL partitions unfiltered, so in
    the window between a batch's roots write and its redirects write a
    just-merged component transiently appears SPLIT — the batch's new
    docs already carry the merged label while pre-existing members still
    resolve through the not-yet-written redirect. The split heals when
    the batch replays (both writes are idempotent dynamic overwrites of
    the batch's own partitions); mid-stream readers that need
    transactional views should snapshot between batches or filter both
    tables to ``batch_id <= last_completed_batch`` — the same
    strictly-pre-batch rule `process_cluster_batch` itself applies."""
    table = _roots_table(state_dir)
    if not spark.catalog.tableExists(table):
        _create_state(spark, state_dir, table)
    flat = _flat_redirects(_read_redirects(spark, state_dir))
    return (
        spark.table(table)
        .select("doc_id", F.col("root").alias("root0"))
        .join(
            F.broadcast(flat.select(F.col("old_root").alias("root0"),
                                    "final_root")),
            "root0",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("final_root", "root0").alias("cluster_id"),
        )
    )


def compact_cluster_state(spark: SparkSession, state_dir: str) -> dict[str, int]:
    """Offline state compaction (run with the stream stopped; VERDICT r10
    task #3): fold resolved redirects into the roots partitions so the
    redirect log stays at RECENT merge events instead of all merge events
    ever.

    Mechanics — the shared `state_compaction` fold-all-but-newest core
    plus this module's two-table twist:

    1. ``max_bid`` is the global newest batch across roots AND redirects
       (the crash window sits between a batch's roots write and its
       redirects write, so the partial batch's partition must stay
       un-folded wherever it landed).
    2. Every roots row with ``batch_id != max_bid`` is rewritten with its
       label resolved through the PRE-newest redirects (pointer-doubled
       flat map) into the ``batch_id = -1`` history partition; the newest
       batch's rows are copied verbatim — a replay of that batch
       dynamic-overwrites its own partition, and its pre-batch reads see
       exactly the same resolved state the original run computed, so the
       replay reproduces identical rows (the strictly-pre-batch rule).
    3. The staged copy swaps in via `hadoop_fs.swap_dirs` (write-new-
       then-swap; `_create_state`'s remnant guard covers a crash between
       the renames), THEN the absorbed redirect partitions
       (``batch_id < max_bid``) are deleted. A crash between the swap and
       the deletes leaves absorbed redirect rows behind — harmless: their
       old_roots no longer appear as any roots row's label (the flat map
       is fully flattened, so resolution is idempotent), and the next
       compaction removes them.

    Duplicate roots rows (impossible under the doc_id-uniqueness contract
    the pair source enforces, but guarded like the substring compactor's
    min-fold) collapse to the HISTORY side, keeping a later replay of the
    newest batch consistent. Returns row/file accounting:
    ``{"roots_files": …, "redirect_rows": …, "redirect_partitions": …}``.
    """
    table = _roots_table(state_dir)
    _create_state(spark, state_dir, table)
    from ai_powered_data_pipeline_assistant_spark.streaming.state_compaction import (
        HISTORY_BATCH_ID,
        newest_batch_id,
        write_staged_bucketed,
    )

    live = _roots_path(state_dir)
    staged = f"{live}_staged"
    hadoop_fs.delete_recursive(spark, staged)  # leftovers of a dead run
    tmp_name = f"{table}_compact"
    spark.sql(f"DROP TABLE IF EXISTS {tmp_name}")
    redirects = _read_redirects(spark, state_dir)
    max_bid_roots = newest_batch_id(spark, [table])
    max_bid_red = redirects.agg(F.max("batch_id")).first()[0]
    cands = [b for b in (max_bid_roots, max_bid_red) if b is not None]
    if not cands:
        return {
            "roots_files": hadoop_fs.count_parquet(spark, live),
            "redirect_rows": 0,
            "redirect_partitions": 0,
        }
    max_bid = max(cands)
    flat_hist = _flat_redirects(redirects.filter(F.col("batch_id") < max_bid))
    hist = (
        spark.table(table)
        .filter(F.col("batch_id") != max_bid)
        .join(
            F.broadcast(
                flat_hist.select(F.col("old_root").alias("root"), "final_root")
            ),
            "root",
            "left",
        )
        .select(
            "doc_id",
            F.coalesce("final_root", "root").alias("root"),
            F.lit(HISTORY_BATCH_ID).cast("long").alias("batch_id"),
        )
    )
    newest = spark.table(table).filter(F.col("batch_id") == max_bid).select(
        "doc_id", "root", "batch_id"
    )
    folded = (
        hist.unionByName(newest)
        .groupBy("doc_id")
        .agg(F.min(F.struct("batch_id", "root")).alias("s"))
        .select("doc_id", F.col("s.root").alias("root"),
                F.col("s.batch_id").alias("batch_id"))
    )
    write_staged_bucketed(
        folded, ["doc_id"], CLUSTER_STATE_BUCKETS, tmp_name, staged
    )
    spark.sql(f"DROP TABLE {tmp_name}")
    spark.sql(f"DROP TABLE {table}")
    hadoop_fs.swap_dirs(spark, live, staged)
    _create_state(spark, state_dir, table)
    # absorbed redirect partitions go last (crash here is harmless; see
    # docstring point 3)
    red_path = _redirects_path(state_dir)
    for d in hadoop_fs.list_child_dirs(spark, red_path):
        if d.startswith("batch_id=") and d != f"batch_id={max_bid}":
            hadoop_fs.delete_recursive(spark, f"{red_path}/{d}")
    remaining = _read_redirects(spark, state_dir)
    return {
        "roots_files": hadoop_fs.count_parquet(spark, live),
        "redirect_rows": int(remaining.count()),
        "redirect_partitions": len(
            [
                d
                for d in hadoop_fs.list_child_dirs(spark, red_path)
                if d.startswith("batch_id=")
            ]
        ),
    }


def run_cluster_stream(
    pairs_stream: DataFrame, state_dir: str, checkpoint: str
):
    """Wire the incremental clusterer over an (a_id, b_id) verified-pair
    source (e.g. the near-dup gate's pair output re-streamed). Returns
    the started StreamingQuery (availableNow)."""

    def _handle(batch_df: DataFrame, batch_id: int) -> None:
        process_cluster_batch(batch_df, batch_id, state_dir)

    return (
        pairs_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(_handle)
        .trigger(availableNow=True)
        .start()
    )
