"""File-format connectors: JSONL / CSV / ORC round-trips and a
malformed-record audit.

The reference ingests JSON over HTTP and stores rows through PostgREST
(reference backend/services/search_clients.py:24-66); a Spark engine's
equivalent surface is first-class file-format IO. Each round-trip query
writes the documents table in the target format (to a scratch dir outside
the repo), reads it back with an EXPLICIT schema (schema inference is a
full extra pass at 100 TB — never rely on it in production paths), and
aggregates; the oracle runs the same aggregate on the original parquet, so
any value lost or mangled in transit fails the hash match.

``corrupt_records_audit`` exercises PERMISSIVE-mode ingestion: a mixed
good/malformed JSONL batch is read with ``columnNameOfCorruptRecord`` and
audited — the quarantine-count accounting every ingest pipeline keeps.
Inputs are deterministic constants, so the oracle is the expected-constant
row.

Scale notes: the write is a plain distributed sink (one task per
partition, no shuffle); the read-back aggregate is map-side combined. The
scratch location is per-scale-factor so concurrent runs at different SFs
don't collide.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table

FORMAT_ROOT = "/tmp/spark_graft_formats"
DOCS_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)

_AUDIT_GOOD = [{"id": i, "v": i * 10} for i in range(8)]
_AUDIT_BAD = ['{"id": 8, "v":', "definitely-not-json"]


def _scratch(sf_dir: str, kind: str) -> str:
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    return f"{FORMAT_ROOT}/{tag}/{kind}"


def _roundtrip_summary(back: DataFrame) -> DataFrame:
    """Aggregate proving every column survived the format round-trip."""
    return (
        back.groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum(F.length("text")).cast("long").alias("total_text_len"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("source")
    )


def jsonl_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → JSON lines → explicit-schema read → summary."""
    path = _scratch(sf_dir, "jsonl")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").json(path)
    return _roundtrip_summary(spark.read.schema(DOCS_SCHEMA).json(path))


def csv_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → quoted CSV with header → explicit-schema read → summary."""
    path = _scratch(sf_dir, "csv")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").option("header", "true").option(
        "quoteAll", "true"
    ).csv(path)
    return _roundtrip_summary(
        spark.read.schema(DOCS_SCHEMA).option("header", "true").csv(path)
    )


def orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → ORC → read → summary (columnar-to-columnar parity)."""
    path = _scratch(sf_dir, "orc")
    docs = load_table(spark, sf_dir, "documents")
    docs.write.mode("overwrite").orc(path)
    return _roundtrip_summary(spark.read.schema(DOCS_SCHEMA).orc(path))


def corrupt_records_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERMISSIVE-mode JSONL ingest over a batch with known-malformed lines:
    count parsed vs quarantined rows and checksum the parsed payload."""
    path = _scratch(sf_dir, "corrupt_jsonl")
    lines = [json.dumps(r) for r in _AUDIT_GOOD] + list(_AUDIT_BAD)
    spark.createDataFrame(
        [(s,) for s in lines], "line string"
    ).coalesce(1).write.mode("overwrite").text(path)
    back = (
        spark.read.schema("id bigint, v bigint, _corrupt string")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .json(path)
    )
    return back.agg(
        F.sum(F.col("_corrupt").isNull().cast("long")).alias("n_good"),
        F.sum(F.col("_corrupt").isNotNull().cast("long")).alias("n_bad"),
        F.sum("v").cast("long").alias("sum_v"),
    )


_SUMMARY_SQL = """
    SELECT source, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(sum(length(text)) AS BIGINT) AS total_text_len,
           min(doc_id) AS min_doc_id, max(doc_id) AS max_doc_id,
           count(DISTINCT lang) AS n_langs
    FROM documents GROUP BY source ORDER BY source
"""

_AUDIT_SUM = sum(r["v"] for r in _AUDIT_GOOD)

ORACLES: dict[str, str] = {
    "jsonl_roundtrip_agg": _SUMMARY_SQL,
    "csv_roundtrip_agg": _SUMMARY_SQL,
    "orc_roundtrip_agg": _SUMMARY_SQL,
    "corrupt_records_audit": f"""
        SELECT CAST({len(_AUDIT_GOOD)} AS BIGINT) AS n_good,
               CAST({len(_AUDIT_BAD)} AS BIGINT) AS n_bad,
               CAST({_AUDIT_SUM} AS BIGINT) AS sum_v
    """,
}

QUERIES = {
    "jsonl_roundtrip_agg": jsonl_roundtrip_agg,
    "csv_roundtrip_agg": csv_roundtrip_agg,
    "orc_roundtrip_agg": orc_roundtrip_agg,
    "corrupt_records_audit": corrupt_records_audit,
}
