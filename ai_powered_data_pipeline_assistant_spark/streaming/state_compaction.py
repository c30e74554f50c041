"""Shared fold-all-but-newest compaction core for streaming state tables
(VERDICT r10 task #6): the crash-window reasoning that was hand-rolled in
the substring, near-dup, and cluster compactors, extracted to one tested
place. The three modules keep their own SWAP mechanics (in-place dir swap
with a width marker, generation dirs, roots+redirects two-table fold) —
those encode table-specific invariants — but the two decisions every
compactor must get right live here:

1. **Which partitions may be folded** (`newest_batch_id` + `fold_expr`):
   every batch partition EXCEPT the newest. The one batch that can
   legally REPLAY after a restart is the last one (Structured Streaming
   commits batch N-1's checkpoint before starting batch N), and a replay
   dynamic-overwrites its OWN batch_id partition — if its rows had been
   folded into the ``batch_id = -1`` history partition, the re-insert
   would duplicate them there and poison every later batch's reads.
   For MULTI-table state the newest id is the global max ACROSS the
   tables: a crash between the per-table inserts of one batch leaves the
   partial batch's partition present in some tables only, and each table
   must keep that partition un-folded wherever it landed.

2. **How the compacted copy is written** (`write_staged_bucketed`): a
   bucketed CTAS with ``spark.sql.sources.bucketing.enabled`` OFF for the
   duration. The rewrite must not see the source's bucket partitioning:
   the optimizer would elide the pre-write repartition (the scan claims
   the right hash layout) yet execute one-partition-per-FILE, so the
   compacted table would keep one file per (batch, bucket) — exactly the
   fragmentation being compacted. With bucketed reads off, the caller's
   explicit repartition aligns tasks to buckets → one file each.

Crash-window tests for all three lifecycles live with their modules
(tests/test_substring_stream.py, test_neardup_stream.py,
test_cluster_stream.py); this module's contract is pinned wherever those
run, since every compactor routes through it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark import hadoop_fs

HISTORY_BATCH_ID = -1


def guard_swap_remnants(
    spark: SparkSession, state_dir: str, table_dirname: str, what: str
) -> bool:
    """Swap-aside remnant guard for in-place-swap state lifecycles
    (substring wins, cluster roots): when the live table dir is EMPTY but
    a crashed compaction swap left an intact copy next to it
    (``<dir>.old_<uuid>`` from `hadoop_fs.swap_dirs`, or the staged
    ``<dir>_staged``), a fresh-session re-registration must REFUSE to
    bootstrap empty state — silently forgetting the accumulated corpus
    would re-admit every historical duplicate / relabel every component.
    Remnants are ranked newest-first by file mtime (uuid aside names
    carry no ordering; restoring a stale aside a failed best-effort
    delete left behind would silently truncate the corpus). Returns
    whether the live dir holds data (no-op True), so callers don't pay a
    second object-store LIST for the same question."""
    live = f"{state_dir.rstrip('/')}/{table_dirname}"
    if hadoop_fs.has_parquet(spark, live):
        return True
    remnants = [
        d
        for d in hadoop_fs.list_child_dirs(spark, state_dir)
        if (d.startswith(f"{table_dirname}.old_") or d == f"{table_dirname}_staged")
        and hadoop_fs.has_parquet(spark, f"{state_dir.rstrip('/')}/{d}")
    ]
    if not remnants:
        return False
    ranked = sorted(
        remnants,
        key=lambda d: hadoop_fs.latest_mtime(
            spark, f"{state_dir.rstrip('/')}/{d}"
        ),
        reverse=True,
    )
    raise RuntimeError(
        f"{what} state at {live} is empty but a crashed "
        f"compaction left intact state under {state_dir} "
        f"(newest-first by file mtime: {ranked}). Move the FIRST "
        f"listed copy back to {live} before restarting; refusing "
        "to silently bootstrap empty state."
    )


def newest_batch_id(spark: SparkSession, tables: list[str]) -> int | None:
    """Global max ``batch_id`` across the state tables — the one batch a
    replay may legally rewrite, which therefore must NEVER be folded into
    the history partition (module docstring, point 1). ``None`` when every
    table is empty (nothing to compact)."""
    max_bid: int | None = None
    for name in tables:
        m = spark.table(name).agg(F.max("batch_id")).first()[0]
        if m is not None and (max_bid is None or m > max_bid):
            max_bid = int(m)
    return max_bid


def fold_expr(max_bid: int | None) -> Column:
    """The fold column: a row keeps its batch_id iff it belongs to the
    newest (replayable) batch; every other partition folds into
    ``HISTORY_BATCH_ID``. With ``max_bid=None`` (empty state) everything
    folds — callers normally no-op before reaching that case."""
    if max_bid is None:
        return F.lit(HISTORY_BATCH_ID).cast("long")
    return (
        F.when(F.col("batch_id") == max_bid, F.col("batch_id"))
        .otherwise(F.lit(HISTORY_BATCH_ID))
        .cast("long")
    )


def write_staged_bucketed(
    df: DataFrame,
    bucket_cols: list[str],
    n_buckets: int,
    table_name: str,
    path: str,
) -> None:
    """Write ``df`` as a batch_id-partitioned bucketed table at ``path``
    with one file per (partition, bucket): explicit repartition to the
    bucket columns, bucketed reads disabled for the duration (module
    docstring, point 2). The caller owns ``df``'s content (fold column
    already applied) and the post-write swap."""
    spark = df.sparkSession
    staged = df.repartition(n_buckets, *[F.col(c) for c in bucket_cols])
    bkey = "spark.sql.sources.bucketing.enabled"
    prev = spark.conf.get(bkey)
    spark.conf.set(bkey, "false")
    try:
        (
            staged.write.mode("overwrite")
            .partitionBy("batch_id")
            .bucketBy(n_buckets, *bucket_cols)
            .sortBy(*bucket_cols)
            .option("path", path)
            .format("parquet")
            .saveAsTable(table_name)
        )
    finally:
        spark.conf.set(bkey, prev)


def create_bucketed_state(
    spark: SparkSession,
    state_dir: str,
    specs: dict[str, tuple[str, list[str]]],
    n_buckets: int,
    tables: dict[str, str],
    what: str,
) -> None:
    """Create a multi-table bucketed state (one ``batch_id``-partitioned
    table per spec) or re-register surviving files in a fresh session —
    the create/recover lifecycle the phash stream introduced and the
    media pipeline reuses (round-12 review: one implementation, not one
    copy per module). Refuses to bootstrap empty state over a crashed
    in-place-swap's intact aside (`guard_swap_remnants`). Idempotent per
    table: a crash between creations leaves a partial catalog the next
    call completes. ``specs`` maps table key -> (schema containing a
    trailing ``batch_id long``, bucket columns); table dirs live at
    ``{state_dir}/{key}``."""
    for key, (schema, bucket_cols) in specs.items():
        if spark.catalog.tableExists(tables[key]):
            continue
        live_has_data = guard_swap_remnants(spark, state_dir, key, what)
        path = f"{state_dir.rstrip('/')}/{key}"
        if live_has_data:
            cols = ", ".join(bucket_cols)
            data_cols = ", ".join(
                c.strip() for c in schema.split(",") if "batch_id" not in c
            )
            spark.sql(
                f"CREATE TABLE {tables[key]} ({data_cols}, batch_id long) "
                f"USING PARQUET PARTITIONED BY (batch_id) "
                f"CLUSTERED BY ({cols}) SORTED BY ({cols}) "
                f"INTO {n_buckets} BUCKETS "
                f"LOCATION '{path}'"
            )
            spark.sql(f"ALTER TABLE {tables[key]} RECOVER PARTITIONS")
        else:
            (
                spark.createDataFrame([], schema)
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .bucketBy(n_buckets, *bucket_cols)
                .sortBy(*bucket_cols)
                .option("path", path)
                .format("parquet")
                .saveAsTable(tables[key])
            )


def compact_bucketed_state(
    spark: SparkSession,
    state_dir: str,
    specs: dict[str, tuple[str, list[str]]],
    n_buckets: int,
    tables: dict[str, str],
    create_state,
) -> dict[str, int]:
    """Fold-all-but-newest + in-place swap for a `create_bucketed_state`
    lifecycle (offline, stream stopped): per table, relabel every batch
    partition except the global newest into ``batch_id = -1`` via ONE
    staged bucketed write, swap the staged dir over the live one
    (`hadoop_fs.swap_dirs`; `guard_swap_remnants` inside ``create_state``
    covers a crash between the renames), and re-register. Rows are
    relabeled, never collapsed. ``create_state`` is the caller's
    zero-arg (re)registration hook, invoked before and after the swaps.
    Returns {table key: parquet files after compaction}."""
    create_state()
    max_bid = newest_batch_id(spark, list(tables.values()))
    out: dict[str, int] = {}
    for key, name in tables.items():
        live = f"{state_dir.rstrip('/')}/{key}"
        if max_bid is None:
            out[key] = hadoop_fs.count_parquet(spark, live)
            continue
        staged = f"{live}_staged"
        hadoop_fs.delete_recursive(spark, staged)
        tmp_name = f"{name}_compact"
        spark.sql(f"DROP TABLE IF EXISTS {tmp_name}")
        cols = [c for c in spark.table(name).columns if c != "batch_id"]
        folded = spark.table(name).select(
            *cols, fold_expr(max_bid).alias("batch_id")
        )
        write_staged_bucketed(folded, specs[key][1], n_buckets, tmp_name, staged)
        spark.sql(f"DROP TABLE {tmp_name}")
        spark.sql(f"DROP TABLE {name}")
        hadoop_fs.swap_dirs(spark, live, staged)
        out[key] = hadoop_fs.count_parquet(spark, live)
    create_state()
    return out
