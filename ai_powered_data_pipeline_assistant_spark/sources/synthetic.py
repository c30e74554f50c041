"""Synthetic row generators — the S8 "docs placeholder" source and the
streaming fixture generator.

Parity targets:
- S8 deterministic placeholder docs with md5-derived unique URLs: reference
  backend/services/search_clients.py:276-312 → `spark.range` + expressions
  (zero Python, fully distributed generation)
- FIXTURES.md §8 job_requests: streaming input with explicit event time and
  planted duplicate request_ids (for dropDuplicatesWithinWatermark tests)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def placeholder_docs(spark: SparkSession, n: int, query: str = "spark") -> DataFrame:
    """Deterministic placeholder documents à la the reference's docs client:
    content templated from the query, URL made unique via md5 of the id."""
    return spark.range(n).select(
        F.col("id").alias("doc_seq"),
        F.concat(
            F.lit(f"Documentation for '{query}' — placeholder section "),
            F.col("id").cast("string"),
        ).alias("content"),
        F.concat(F.lit(f"Docs: {query} #"), F.col("id").cast("string")).alias("title"),
        F.lit("official_doc").alias("source_type"),
        F.concat(
            F.lit("https://docs.example/"),
            F.md5(F.concat(F.lit(query), F.lit("-"), F.col("id").cast("string"))),
        ).alias("source_url"),
    )


def job_requests(spark: SparkSession, n: int = 100, dup_every: int = 10,
                 late_dup_every: int = 25) -> DataFrame:
    """Job-request fixture with planted duplicates.

    - every `dup_every`-th request is duplicated 30 s later (inside the
      5-minute dedup window → must be dropped);
    - every `late_dup_every`-th is duplicated 10 minutes later (outside the
      window → must survive).
    Timestamps are explicit event time (the reference's dedup window is
    processing-time; SURVEY §7.4 says tests must inject timestamps).
    """
    base = spark.range(n).select(
        F.concat(F.lit("req-"), F.col("id").cast("string")).alias("request_id"),
        (F.col("id") % 20).alias("job_id"),
        F.concat(F.lit("query about job "), (F.col("id") % 20).cast("string")).alias("query"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 2).alias("ts"),
    )
    in_window_dups = (
        spark.range(0, n, dup_every)
        .select(
            F.concat(F.lit("req-"), F.col("id").cast("string")).alias("request_id"),
            (F.col("id") % 20).alias("job_id"),
            F.concat(F.lit("query about job "), (F.col("id") % 20).cast("string")).alias("query"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 2 + 30).alias("ts"),
        )
    )
    late_dups = (
        spark.range(0, n, late_dup_every)
        .select(
            F.concat(F.lit("req-"), F.col("id").cast("string")).alias("request_id"),
            (F.col("id") % 20).alias("job_id"),
            F.concat(F.lit("query about job "), (F.col("id") % 20).cast("string")).alias("query"),
            F.timestamp_seconds(F.lit(1700000000) + F.col("id") * 2 + 600).alias("ts"),
        )
    )
    return base.unionByName(in_window_dups).unionByName(late_dups)
