"""Deterministic training-shard layout: seeded global shuffle of the
curated corpus into N balanced output shards, plus the manifest that
audits it.

Every pretraining run consumes the corpus in a pseudo-random order that
must be (a) reproducible bit-for-bit (resume, reruns, ablations), (b)
re-derivable per epoch from a seed, and (c) produced WITHOUT a global
sort — at 100 TB a single total order through one reducer is the
classic scale-killer. The standard layout (WebDataset / TFRecord shard
writers, T5's deterministic pipeline) is exactly what this module
implements:

- permutation key = md5(seed || ':' || doc_id) — a seeded hash, so the
  "shuffle" is stateless and per-epoch re-derivable (change the seed,
  get an independent permutation);
- shard routing = key mod N_SHARDS — hash partitioning balances shards
  to within sampling noise with NO rank/window/global sort;
- intra-shard order = ORDER BY (key, doc_id) — a sortWithinPartitions,
  i.e. a local per-shard sort that parallelizes across shards.

The whole layout costs ONE hash shuffle plus a local sort; the manifest
is one groupBy. Nothing here funnels through a single task at any data
size (shard count scales with the corpus: n_shards ≈ corpus_bytes /
target_shard_bytes).

The reference has no training-export layer (it serves retrieval rows one
query at a time, backend/services/vector_service.py) — this is the
north-star training-data extension family (build brief: "operations a
large-scale training-data pipeline would need").

Determinism contract pinned by the oracle + tests: the manifest states
per shard the membership (n_docs, token totals), the permutation
endpoints (first/last doc under the seeded order — `min_by`/`arg_min`
on the 32-hex key), and an order-free integer checksum of the key set.
Because the intra-shard order IS "sort by (key, doc_id)", key-set
equality pins the full permutation without materializing ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table
from ai_powered_data_pipeline_assistant_spark.functions.hashing import (
    HASH_MOD,
    md5_int,
    md5_int_sql,
)

N_SHARDS = 16
SHARD_SEED = "epoch-0"


def _keyed_docs(docs: DataFrame, seed: str, n_shards: int) -> DataFrame:
    """Attach the seeded permutation key (full 32-hex md5 for ordering,
    60-bit int prefix for routing/checksums) and the shard id."""
    keyed = F.concat(F.lit(seed), F.lit(":"), F.col("doc_id").cast("string"))
    n_tokens = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    return docs.select(
        "doc_id",
        F.md5(keyed).alias("hkey"),
        md5_int(keyed).alias("h"),
        (md5_int(keyed) % n_shards).alias("shard_id"),
        n_tokens.alias("n_tokens"),
    )


def shard_manifest(
    spark: SparkSession,
    sf_dir: str,
    seed: str = SHARD_SEED,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """Per-shard manifest of the seeded shuffle layout: membership counts
    and token totals (the trainer's progress accounting), the first/last
    doc under the permutation order (spot-checkable against any written
    shard), an order-free key-set checksum (pins the permutation — the
    intra-shard order is fully determined by the key set), and the
    shard's size deviation from perfect balance in ppm (the skew audit:
    hash routing balances shards to sampling noise, and this row proves
    it on the actual corpus)."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    keyed = _keyed_docs(docs, seed, n_shards)
    per = keyed.groupBy("shard_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min_by("doc_id", "hkey").alias("first_doc"),
        F.max_by("doc_id", "hkey").alias("last_doc"),
        F.sum(F.col("h") % HASH_MOD).alias("key_checksum"),
    )
    total = per.agg(F.sum("n_docs").alias("corpus_docs"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "shard_id",
            "n_docs",
            "total_tokens",
            "first_doc",
            "last_doc",
            "key_checksum",
            # abs deviation + integer `div`: non-negative operands make
            # truncation == floor, so Spark `div` and DuckDB `//` agree
            F.expr(
                f"abs(n_docs * {n_shards} - corpus_docs) * 1000000L"
                " div corpus_docs"
            ).alias("balance_dev_ppm"),
        )
        .orderBy("shard_id")
    )


def write_training_shards(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    seed: str = SHARD_SEED,
    n_shards: int = N_SHARDS,
) -> DataFrame:
    """Materialize the shard layout: one directory per shard_id, rows in
    the seeded permutation order. ONE hash shuffle (repartition on
    shard_id) + a per-shard local sort — the scale path; no global
    order, no windows. Returns the manifest of what was written.

    At cluster scale ``n_shards`` is sized to the target shard bytes
    (e.g. 100 TB / 1 GiB ≈ 100k shards) so each output task sorts a
    bounded slice; `maxRecordsPerFile` would cap file size further."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    keyed = _keyed_docs(docs, seed, n_shards).join(
        docs.select("doc_id", "text"), "doc_id"
    )
    (
        keyed.repartition(n_shards, "shard_id")
        .sortWithinPartitions("hkey", "doc_id")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(out_dir)
    )
    return shard_manifest(spark, sf_dir, seed=seed, n_shards=n_shards)


_HK = "md5('" + SHARD_SEED + ":' || CAST(doc_id AS VARCHAR))"
_H = md5_int_sql("'" + SHARD_SEED + ":' || CAST(doc_id AS VARCHAR)")

ORACLES: dict[str, str] = {
    "shard_manifest": rf"""
        WITH keyed AS (
            SELECT doc_id,
                   {_HK} AS hkey,
                   {_H} AS h,
                   {_H} % {N_SHARDS} AS shard_id,
                   CAST(len(regexp_split_to_array(trim(text), '\s+'))
                        AS BIGINT) AS n_tokens
            FROM documents),
        per AS (
            SELECT shard_id,
                   count(*) AS n_docs,
                   CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                   arg_min(doc_id, hkey) AS first_doc,
                   arg_max(doc_id, hkey) AS last_doc,
                   CAST(sum(h % {HASH_MOD}) AS BIGINT) AS key_checksum
            FROM keyed GROUP BY 1),
        tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS corpus_docs FROM per)
        SELECT shard_id, n_docs, total_tokens, first_doc, last_doc,
               key_checksum,
               CAST(abs(n_docs * {N_SHARDS} - corpus_docs) * 1000000
                    // corpus_docs AS BIGINT) AS balance_dev_ppm
        FROM per, tot
        ORDER BY shard_id
    """,
}

QUERIES = {
    "shard_manifest": shard_manifest,
}
