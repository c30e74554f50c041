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

Known follow-up (ROADMAP): a crash-window-safe compactor that folds
resolved redirects into the roots partitions (the substring compactor's
fold-all-but-newest recipe) — until then read-time resolution
pointer-doubles the redirect log, whose size is merge events, not
corpus.
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
    surviving files in a fresh session (the substring-stream pattern; no
    compactor yet, so there are no swap-aside remnants to guard)."""
    if spark.catalog.tableExists(table):
        return
    path = _roots_path(state_dir)
    if hadoop_fs.has_parquet(spark, path):
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
            break
        prev = cur
    return flat


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
    _insert_dynamic(new_roots.select("doc_id", "root", "batch_id"), table)
    (
        new_redirects.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(_redirects_path(state_dir))
    )


def resolved_roots(spark: SparkSession, state_dir: str) -> DataFrame:
    """(doc_id, cluster_id) for every document ever seen in a pair — the
    read-time view: stored root, then one hop through the pointer-doubled
    flat redirect map. Equals the batch module's `connected_components`
    labels over the union of all ingested pairs (pinned by
    `neardup_cluster_stream_parity`)."""
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
