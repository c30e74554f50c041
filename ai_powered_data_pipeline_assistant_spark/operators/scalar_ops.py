"""Scalar-expression operators (SURVEY §2.8 F5/F10/F11, §2.10 U1) — the
reference's per-row compute surface as native column expressions.

- F10 schedule arithmetic: next_run = now + {1h,1d,1w,30d} by type
  (reference backend/tools/pipeline_tools.py:56-76)
- F5 error-message keyword extraction: ExceptionType / [code] / table-name
  regex cascade (reference backend/utils/query_processing.py:9-122)
- U1 the reference's example UDF 1/(x-10) with div-by-zero→NULL
  (reference backend/tools/data_tools.py:198-212) — implemented natively
  (when/otherwise), NOT as a Python UDF: stays in codegen, ~100× the
  throughput of the row-at-a-time UDF the reference registers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table

# schedule_type → interval, mirroring pipeline_tools.py:56-76
_SCHEDULE_INTERVALS = {
    "click": "INTERVAL 1 HOUR",
    "view": "INTERVAL 1 DAY",
    "signup": "INTERVAL 7 DAY",
    "purchase": "INTERVAL 30 DAY",
}


def schedule_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F10: next_run = ts + interval keyed by type ('error' → NULL)."""
    events = load_table(spark, sf_dir, "events")
    expr = None
    for etype, interval in _SCHEDULE_INTERVALS.items():
        clause = F.expr(f"ts + {interval}")
        expr = (
            F.when(F.col("event_type") == etype, clause)
            if expr is None
            else expr.when(F.col("event_type") == etype, clause)
        )
    return events.select(
        "event_id", "event_type", "ts", expr.otherwise(F.lit(None)).alias("next_run")
    )


def error_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F5: regexp_extract cascade over synthesized error-log lines.

    Error-shaped messages are assembled deterministically from `events`
    (the corpus has no real error strings), then the extraction cascade —
    exception type, [code], table name, fallback truncation — runs exactly
    as the reference's preprocessor does.
    """
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    msg = F.when(
        F.col("event_type") == "error",
        F.concat(
            F.lit("SparkException [E"),
            k.cast("string"),
            F.lit("]: stage failed while reading table t_"),
            F.col("user_id").cast("string"),
            F.lit(" at step "),
            (F.col("event_id") % 7).cast("string"),
        ),
    ).otherwise(F.concat(F.lit("ok message "), F.col("event_id").cast("string")))
    df = events.select("event_id", msg.alias("msg"))
    exception_type = F.regexp_extract("msg", r"^(\w+Exception)", 1)
    error_code = F.regexp_extract("msg", r"\[E(\d+)\]", 1)
    table_name = F.regexp_extract("msg", r"table (\w+)", 1)
    is_error = exception_type != ""
    return df.select(
        "event_id",
        is_error.alias("is_error"),
        F.when(is_error, exception_type).otherwise(F.lit(None)).alias("exception_type"),
        F.when(error_code != "", error_code.cast("long")).alias("error_code"),
        F.when(table_name != "", table_name).alias("table_name"),
        F.substring("msg", 1, 40).alias("msg_head"),
    )


def safe_reciprocal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: 1/(x-10) with x=10 → NULL, as a native expression (no UDF)."""
    events = load_table(spark, sf_dir, "events")
    x = F.round(F.col("value")).cast("long")
    return events.select(
        "event_id",
        x.alias("x"),
        F.when(x != 10, F.round(F.lit(1.0) / (x - 10).cast("double"), 9)).alias(
            "reciprocal"
        ),
    )


ORACLES: dict[str, str] = {
    "schedule_arithmetic": """
        SELECT event_id, event_type, ts,
               CASE event_type
                    WHEN 'click' THEN ts + INTERVAL 1 HOUR
                    WHEN 'view' THEN ts + INTERVAL 1 DAY
                    WHEN 'signup' THEN ts + INTERVAL 7 DAY
                    WHEN 'purchase' THEN ts + INTERVAL 30 DAY
                    ELSE NULL END AS next_run
        FROM events
    """,
    "error_extract": """
        WITH msgs AS (
            SELECT event_id,
                   CASE WHEN event_type = 'error'
                        THEN 'SparkException [E' || CAST(CAST(json_extract_string(props, '$.k') AS BIGINT) AS VARCHAR)
                             || ']: stage failed while reading table t_' || CAST(user_id AS VARCHAR)
                             || ' at step ' || CAST(event_id % 7 AS VARCHAR)
                        ELSE 'ok message ' || CAST(event_id AS VARCHAR) END AS msg
            FROM events)
        SELECT event_id,
               regexp_extract(msg, '^(\\w+Exception)', 1) != '' AS is_error,
               CASE WHEN regexp_extract(msg, '^(\\w+Exception)', 1) != ''
                    THEN regexp_extract(msg, '^(\\w+Exception)', 1) END AS exception_type,
               CASE WHEN regexp_extract(msg, '\\[E(\\d+)\\]', 1) != ''
                    THEN CAST(regexp_extract(msg, '\\[E(\\d+)\\]', 1) AS BIGINT) END AS error_code,
               CASE WHEN regexp_extract(msg, 'table (\\w+)', 1) != ''
                    THEN regexp_extract(msg, 'table (\\w+)', 1) END AS table_name,
               substr(msg, 1, 40) AS msg_head
        FROM msgs
    """,
    "safe_reciprocal": """
        SELECT event_id,
               CAST(round(value) AS BIGINT) AS x,
               CASE WHEN CAST(round(value) AS BIGINT) != 10
                    THEN round(1.0 / CAST(CAST(round(value) AS BIGINT) - 10 AS DOUBLE), 9)
               END AS reciprocal
        FROM events
    """,
}

QUERIES = {
    "schedule_arithmetic": schedule_arithmetic,
    "error_extract": error_extract,
    "safe_reciprocal": safe_reciprocal,
}


def arrow_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy Arrow-native scan stage (``mapInArrow``): per-document
    byte length and ASCII share computed directly on Arrow RecordBatches —
    the lowest-overhead Python hook Spark offers (no pandas conversion at
    all, unlike mapInPandas; the batch's buffers are read in place). The
    shape a high-throughput byte-level filter (magic-number sniffing,
    encoding detection) takes when even the pandas bridge is too much.

    Oracle-exact: pure integer byte math (UTF-8 encode, count < 0x80).
    """
    import pyarrow as pa

    docs = load_table(spark, sf_dir, "documents", parallelize=True).select(
        "doc_id", "text"
    )

    def batches(it):
        for rb in it:
            texts = rb.column(1).to_pylist()
            raw = [t.encode("utf-8") if t is not None else b"" for t in texts]
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(0),
                    pa.array([len(b) for b in raw], pa.int64()),
                    pa.array(
                        [sum(1 for byte in b if byte < 0x80) for b in raw],
                        pa.int64(),
                    ),
                ],
                names=["doc_id", "n_bytes", "n_ascii"],
            )

    out = docs.mapInArrow(batches, schema="doc_id long, n_bytes long, n_ascii long")
    return out.select(
        "doc_id",
        "n_bytes",
        "n_ascii",
        F.round(F.col("n_ascii") / F.col("n_bytes").cast("double"), 6).alias(
            "ascii_share"
        ),
    ).orderBy("doc_id")


QUERIES["arrow_byte_stats"] = arrow_byte_stats

ORACLES["arrow_byte_stats"] = """
    SELECT doc_id,
           CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS n_bytes,
           CAST(length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g'))
                AS BIGINT) AS n_ascii,
           round(CAST(length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g'))
                      AS BIGINT)
                 / CAST(CAST(octet_length(CAST(text AS BLOB)) AS BIGINT)
                        AS DOUBLE), 6) AS ascii_share
    FROM documents
    ORDER BY doc_id
"""
