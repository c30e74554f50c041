"""Inference/training batch layout: length-sorted batching vs shuffled
batching, with the padding-waste accounting that motivates it.

Batched transformer inference pads every sequence in a batch to the batch
max, so batch composition decides how much compute is burned on pad
tokens. Sorting by length before cutting batches (the "sortish" /
length-bucketed sampler every serving stack implements) makes batches
length-homogeneous and collapses the waste; this operator quantifies the
win on the actual corpus by building BOTH layouts and reporting padding
waste side by side.

The core primitive is a GLOBAL rank — the same scale problem as
`packing.pack_sequences`, solved the same way (a single global
`Window.orderBy` funnels the corpus through one partition): rows land in
value buckets, ranks are computed per bucket in parallel, and per-bucket
row counts (one row per bucket) take a tiny cumulative sum that broadcasts
back as each bucket's rank offset. For the length order the bucket is a
token-count range (`n_tokens div 16`); for the shuffled order it is a slice
of the md5 hash space — both deterministic, both reproducing the exact
total order the DuckDB oracle states as one `row_number() OVER (ORDER BY
...)`.

The reference has no batching layer (its retrieval path returns top-k rows
one query at a time, backend/services/vector_service.py); this operator is
part of the engine's training/inference-pipeline surface (build brief:
operations a large-scale training-data pipeline needs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table
from ai_powered_data_pipeline_assistant_spark.functions.hashing import (
    md5_int,
    md5_int_sql,
)

BATCH_SIZE = 32
TOK_BUCKET = 16  # token-range width of one length bucket
HASH_BUCKETS = 64


def _batched(base: DataFrame, bucket: F.Column, bucket_desc: bool,
             order_cols: list[F.Column]) -> DataFrame:
    """Attach ``batch_id`` under the global order (bucket, *order_cols)
    without a global window: per-bucket row_number + broadcast cumulative
    bucket counts."""
    b = base.withColumn("bucket", bucket)
    intra_w = Window.partitionBy("bucket").orderBy(*order_cols)
    intra = b.withColumn("intra_rank", F.row_number().over(intra_w))
    counts = b.groupBy("bucket").agg(F.count("*").alias("cnt"))
    off_w = Window.orderBy(
        F.col("bucket").desc() if bucket_desc else F.col("bucket").asc()
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    offsets = counts.select(
        "bucket", (F.sum("cnt").over(off_w) - F.col("cnt")).alias("off")
    )
    return intra.join(F.broadcast(offsets), "bucket").withColumn(
        "batch_id",
        F.floor((F.col("off") + F.col("intra_rank") - 1) / BATCH_SIZE),
    )


def _padding_report(batched: DataFrame, strategy: str) -> DataFrame:
    per = batched.groupBy("batch_id").agg(
        F.count("*").alias("n_docs"),
        F.max("n_tokens").alias("mx"),
        F.sum("n_tokens").alias("s"),
    )
    waste = F.col("mx") * F.col("n_docs") - F.col("s")
    return per.agg(
        F.lit(strategy).alias("strategy"),
        F.count("*").alias("n_batches"),
        F.sum(waste).alias("total_padding"),
        F.round(
            F.sum(waste) / F.sum(F.col("mx") * F.col("n_docs")).cast("double"), 6
        ).alias("padding_share"),
    )


def length_batched_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-row report: padding waste of length-sorted batches vs
    hash-shuffled batches of BATCH_SIZE documents each (total pad tokens
    and the share of batch compute they burn)."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    base = docs.select("doc_id", toks.alias("n_tokens"))

    by_len = _batched(
        base,
        F.floor(F.col("n_tokens") / TOK_BUCKET),
        bucket_desc=True,
        order_cols=[F.desc("n_tokens"), F.asc("doc_id")],
    )
    h = md5_int(F.col("doc_id").cast("string"))
    by_hash = _batched(
        base.withColumn("h", h),
        F.col("h") % HASH_BUCKETS,
        bucket_desc=False,
        order_cols=[F.asc("h"), F.asc("doc_id")],
    )
    return (
        _padding_report(by_len, "length_sorted")
        .unionByName(_padding_report(by_hash, "hash_shuffled"))
        .orderBy("strategy")
    )


_H = md5_int_sql("CAST(doc_id AS VARCHAR)")

ORACLES: dict[str, str] = {
    # The oracle states each layout as ONE ordered row_number — the bucketed
    # two-phase rank must reproduce this exact total order.
    "length_batched_padding": rf"""
        WITH counted AS (
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                       AS n_tokens
            FROM documents),
        by_len AS (
            SELECT n_tokens,
                   (row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1)
                       // {BATCH_SIZE} AS batch_id
            FROM counted),
        by_hash AS (
            SELECT n_tokens,
                   (row_number() OVER (ORDER BY {_H} % {HASH_BUCKETS}, {_H},
                                       doc_id) - 1)
                       // {BATCH_SIZE} AS batch_id
            FROM counted),
        len_per AS (
            SELECT batch_id, count(*) AS n_docs, max(n_tokens) AS mx,
                   CAST(sum(n_tokens) AS BIGINT) AS s
            FROM by_len GROUP BY 1),
        hash_per AS (
            SELECT batch_id, count(*) AS n_docs, max(n_tokens) AS mx,
                   CAST(sum(n_tokens) AS BIGINT) AS s
            FROM by_hash GROUP BY 1)
        SELECT 'length_sorted' AS strategy, count(*) AS n_batches,
               CAST(sum(mx * n_docs - s) AS BIGINT) AS total_padding,
               round(CAST(sum(mx * n_docs - s) AS BIGINT)
                     / CAST(CAST(sum(mx * n_docs) AS BIGINT) AS DOUBLE), 6)
                   AS padding_share
        FROM len_per
        UNION ALL
        SELECT 'hash_shuffled', count(*),
               CAST(sum(mx * n_docs - s) AS BIGINT),
               round(CAST(sum(mx * n_docs - s) AS BIGINT)
                     / CAST(CAST(sum(mx * n_docs) AS BIGINT) AS DOUBLE), 6)
        FROM hash_per
        ORDER BY strategy
    """,
}

QUERIES = {
    "length_batched_padding": length_batched_padding,
}
