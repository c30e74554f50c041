"""Distributed global ranking: the two-phase (bucketed) row_number.

A bare ``Window.orderBy(...)`` (no partitionBy) funnels every row through
ONE reducer — fine for frames bounded by construction, a scale-killer on
key-cardinality frames (per-user aggregates, per-key counts). The cure —
already proven in `windows.user_activity_pareto` and `packing
.pack_sequences` — is range-partition on the ordering key, rank inside
each ordered bucket in parallel, then add broadcast per-bucket row-count
offsets. Bucket boundaries come from the range partitioner's reservoir
sampling (nondeterministic), but with a fully tie-broken ordering key the
final global ranks are identical whatever the boundaries land on.

This module factors the pattern into one reusable helper so every global
rank in the repo shares the scale-safe shape (and the single-partition
anti-pattern can be grepped away: the only remaining unpartitioned windows
operate on frames bounded by construction — per-brand/lang/label/source
aggregates or ≤`buckets`-row offset frames).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from ai_powered_data_pipeline_assistant_spark.execution import materialize

RANK_BUCKETS = 32

# Below this row count the plain single-window rank wins: the two-phase
# form pays a range-sampling job + two extra shuffles + a broadcast join,
# which dwarfs sorting a few million rows on one reducer. Same adaptive
# shape as the neardup broadcast guard — measure, then pick the plan.
SINGLE_REDUCER_MAX_ROWS = 4_000_000


def append_global_rank(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str,
    buckets: int = RANK_BUCKETS,
    n_rows: int | None = None,
) -> DataFrame:
    """Append the global 1-based row_number over ``order_cols`` (which must
    be a total order — include a unique tie-break column) as LongType
    column ``out_col``, without ever funnelling a large frame through a
    single partition.

    ``n_rows`` is the measured input size (pass it when the caller already
    counted; otherwise one scalar count job runs — callers should persist
    ``df`` first). Under SINGLE_REDUCER_MAX_ROWS the plain single-window
    rank is used (cheaper below a few million rows); above it, two phases:
    per-bucket row_number (parallel) plus the exclusive prefix sum of
    bucket sizes (≤ ``buckets`` rows, broadcast).
    """
    if n_rows is None:
        n_rows = df.count()
    if n_rows <= SINGLE_REDUCER_MAX_ROWS:
        return df.withColumn(
            out_col,
            F.row_number().over(Window.orderBy(*order_cols)).cast("long"),
        )
    parted = (
        df.repartitionByRange(buckets, *order_cols)
        .withColumn("_rank_bucket", F.spark_partition_id())
        # Pin the range partitioning: its reservoir-sampled boundaries are
        # nondeterministic, and `parted` feeds TWO plan subtrees (the
        # bucket-size aggregate and the intra-bucket rank). Without this,
        # correctness would hinge on exchange reuse deduplicating the two
        # shuffles — if reuse doesn't fire (disabled, canonicalization
        # divergence, recompute after block loss) the subtrees could sample
        # DIFFERENT boundaries and sizes would disagree with ranks. Lazy:
        # the first downstream job materializes it.
        .transform(materialize)
    )
    intra_w = Window.partitionBy("_rank_bucket").orderBy(*order_cols)
    sizes = parted.groupBy("_rank_bucket").agg(F.count("*").alias("_bn"))
    off_w = Window.orderBy("_rank_bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    offsets = sizes.select(
        "_rank_bucket",
        (F.sum("_bn").over(off_w) - F.col("_bn")).alias("_rank_off"),
    )
    return (
        parted.withColumn("_intra_rn", F.row_number().over(intra_w))
        .join(F.broadcast(offsets), "_rank_bucket")
        .withColumn(
            out_col, (F.col("_rank_off") + F.col("_intra_rn")).cast("long")
        )
        .drop("_rank_bucket", "_intra_rn", "_rank_off")
    )
