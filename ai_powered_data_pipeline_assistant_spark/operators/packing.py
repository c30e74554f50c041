"""Sequence packing: assign every document a (sequence id, offset) slot in
the concatenate-and-cut layout LLM pretraining uses to fill fixed-length
training sequences (concat the token stream in a stable document order, cut
every SEQ_LEN tokens).

The core computation is a GLOBAL prefix sum of per-document token counts in
doc_id order. The naive formulation — one `Window.orderBy(doc_id)` running
sum — funnels the whole corpus through a single partition (Spark warns
"No Partition Defined for Window operation" for exactly this reason) and is
the textbook scale killer. This operator implements the real distributed
two-phase prefix sum instead:

1. docs land in contiguous range buckets (`floor(doc_id / BUCKET_SIZE)` —
   deterministic, no sampled RangePartitioner state);
2. intra-bucket running sums use a window PARTITIONED by bucket (parallel,
   each partition holds ≤ BUCKET_SIZE rows);
3. per-bucket totals — one row per bucket, corpus/BUCKET_SIZE rows total —
   get their own cumulative sum on the tiny frame and broadcast back as
   each bucket's starting offset.

The DuckDB oracle computes the same numbers with a single ordered window —
fine at oracle scale, never the Spark plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table

SEQ_LEN = 512
BUCKET_SIZE = 1000


def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, seq_id, seq_offset): where each document's token
    stream starts in the packed training-sequence layout. Documents longer
    than the remaining room in a sequence straddle into the next one —
    standard concat-and-cut packing."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    base = docs.select(
        "doc_id",
        toks.alias("n_tokens"),
        F.floor(F.col("doc_id") / BUCKET_SIZE).alias("bucket"),
    )
    intra_w = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    intra = base.withColumn("intra_cum", F.sum("n_tokens").over(intra_w))
    totals = base.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_total"))
    offsets_w = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = totals.select(
        "bucket",
        (F.sum("bucket_total").over(offsets_w) - F.col("bucket_total")).alias(
            "bucket_offset"
        ),
    )
    start = F.col("bucket_offset") + F.col("intra_cum") - F.col("n_tokens")
    return (
        intra.join(F.broadcast(offsets), "bucket")
        .select(
            "doc_id",
            "n_tokens",
            F.floor(start / SEQ_LEN).alias("seq_id"),
            (start % SEQ_LEN).alias("seq_offset"),
        )
        .orderBy("doc_id")
    )


def packing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing efficiency report: sequences produced, docs per sequence
    (min/max/avg), and the share of sequences holding a document boundary
    straddle — the number you watch when choosing SEQ_LEN."""
    packed = pack_sequences(spark, sf_dir)
    per_seq = packed.groupBy("seq_id").agg(
        F.count("*").alias("docs_in_seq"),
        F.max(
            F.when(F.col("seq_offset") + F.col("n_tokens") > SEQ_LEN, 1).otherwise(0)
        ).alias("straddles"),
    )
    return per_seq.agg(
        F.count("*").alias("n_seqs"),
        F.min("docs_in_seq").alias("min_docs"),
        F.max("docs_in_seq").alias("max_docs"),
        F.round(
            F.sum("docs_in_seq") / F.count("*").cast("double"), 6
        ).alias("avg_docs"),
        F.round(
            F.sum("straddles") / F.count("*").cast("double"), 6
        ).alias("straddle_share"),
    )


_PACKED_CTE = rf"""
    WITH counted AS (
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
        FROM documents),
    packed AS (
        SELECT doc_id, n_tokens,
               CAST(floor((sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens)
                          / {SEQ_LEN}.0) AS BIGINT) AS seq_id,
               CAST((sum(n_tokens) OVER (ORDER BY doc_id) - n_tokens)
                    % {SEQ_LEN} AS BIGINT) AS seq_offset
        FROM counted)
"""

ORACLES: dict[str, str] = {
    "pack_sequences": _PACKED_CTE + """
    SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens, seq_id, seq_offset
    FROM packed ORDER BY doc_id
    """,
    "packing_summary": _PACKED_CTE + f"""
    , per_seq AS (
        SELECT seq_id, count(*) AS docs_in_seq,
               max(CASE WHEN seq_offset + n_tokens > {SEQ_LEN} THEN 1 ELSE 0 END)
                   AS straddles
        FROM packed GROUP BY 1)
    SELECT count(*) AS n_seqs,
           min(docs_in_seq) AS min_docs, max(docs_in_seq) AS max_docs,
           round(CAST(sum(docs_in_seq) AS BIGINT)
                 / CAST(count(*) AS DOUBLE), 6) AS avg_docs,
           round(CAST(sum(straddles) AS BIGINT)
                 / CAST(count(*) AS DOUBLE), 6) AS straddle_share
    FROM per_seq
    """,
}

QUERIES = {
    "pack_sequences": pack_sequences,
    "packing_summary": packing_summary,
}
