"""Repetition-based quality signals (Gopher/C4-family) over `documents`.

Training-data curation filters documents whose text is dominated by
repeated n-grams (boilerplate, keyword stuffing, templated spam). This
module computes, per document and per n-gram order n ∈ {1, 2, 3}:

- ``total_grams`` — number of n-gram occurrences,
- ``top_frac``    — share of occurrences held by the single most frequent
                    n-gram (Gopher's "top n-gram fraction"),
- ``dup_frac``    — share of occurrences whose n-gram appears more than
                    once (Gopher's "duplicate n-gram fraction").

Reference parity: the reference's data-quality contract stops at scalar
per-doc stats (backend/tools/data_tools.py:64-110); these are the
corpus-curation extensions the driver brief asks for beyond it.

Scale design: gram extraction is array-level (one codegen'd projection, no
shuffle), then ONE explode feeds a single groupBy(doc_id, n, gram) with
map-side partial aggregation — repeated grams collapse before the shuffle,
which is exactly the skew the operator measures. The second aggregate
(per doc_id, n) is over the already-tiny distinct-gram set. No Python
UDFs, no per-doc O(tokens²) higher-order loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table

# Spark array subscripts are 0-based (t[i-1], t[i], ...); DuckDB's are
# 1-based (t[i], t[i+1], ...) — the two gram builders below are the same
# windows expressed in each engine's indexing. sequence(1, 0) in Spark
# DESCENDS instead of returning [], so every gram level guards size().
_GRAMS_EXPR = """
    concat(
        transform(t, x -> named_struct('gram_n', 1, 'gram', x)),
        CASE WHEN size(t) >= 2 THEN
            transform(sequence(1, size(t) - 1),
                      i -> named_struct('gram_n', 2,
                                        'gram', concat(t[i-1], ' ', t[i])))
        ELSE array() END,
        CASE WHEN size(t) >= 3 THEN
            transform(sequence(1, size(t) - 2),
                      i -> named_struct('gram_n', 3,
                                        'gram', concat(t[i-1], ' ', t[i], ' ', t[i+1])))
        ELSE array() END
    )
"""


def repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc, n) repetition profile in long format: one row per document
    per n-gram order, with total/top-fraction/duplicate-fraction."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    grams = (
        docs.select("doc_id", toks.alias("t"))
        .select("doc_id", F.explode(F.expr(_GRAMS_EXPR)).alias("g"))
        .select("doc_id", F.col("g.gram_n").alias("gram_n"), F.col("g.gram").alias("gram"))
    )
    counts = grams.groupBy("doc_id", "gram_n", "gram").agg(F.count("*").alias("c"))
    return (
        counts.groupBy("doc_id", "gram_n")
        .agg(
            F.sum("c").alias("total_grams"),
            F.round(F.max("c") / F.sum("c").cast("double"), 6).alias("top_frac"),
            F.round(
                F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
                / F.sum("c").cast("double"),
                6,
            ).alias("dup_frac"),
        )
        .orderBy("doc_id", "gram_n")
    )


def repetition_gate(spark: SparkSession, sf_dir: str,
                    max_top_bigram_frac: float = 0.18,
                    max_dup_trigram_frac: float = 0.30) -> DataFrame:
    """Gate documents on the repetition profile: keep docs whose top-bigram
    share and duplicate-trigram share are both under threshold (Gopher's
    keep-rule shape). Returns the surviving doc ids with their fractions.

    The thresholds compare the same rounded doubles both engines computed
    from identical integer counts, so the cut is reproducible."""
    stats = repetition_stats(spark, sf_dir)
    wide = (
        stats.groupBy("doc_id")
        .agg(
            F.max(F.when(F.col("gram_n") == 2, F.col("top_frac"))).alias("top_bigram_frac"),
            F.max(F.when(F.col("gram_n") == 3, F.col("dup_frac"))).alias("dup_trigram_frac"),
        )
    )
    return (
        wide.filter(
            (F.coalesce(F.col("top_bigram_frac"), F.lit(0.0)) <= max_top_bigram_frac)
            & (F.coalesce(F.col("dup_trigram_frac"), F.lit(0.0)) <= max_dup_trigram_frac)
        )
        .select("doc_id", "top_bigram_frac", "dup_trigram_frac")
        .orderBy("doc_id")
    )


_GRAMS_CTE = r"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents),
    g AS (
        SELECT doc_id, 1 AS gram_n, unnest(t) AS gram FROM toks
        UNION ALL
        SELECT doc_id, 2,
               unnest(list_transform(generate_series(1, len(t) - 1),
                                     i -> t[i] || ' ' || t[i+1]))
        FROM toks WHERE len(t) >= 2
        UNION ALL
        SELECT doc_id, 3,
               unnest(list_transform(generate_series(1, len(t) - 2),
                                     i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        FROM toks WHERE len(t) >= 3),
    counts AS (
        SELECT doc_id, gram_n, gram, count(*) AS c
        FROM g GROUP BY 1, 2, 3),
    profile AS (
        SELECT doc_id, gram_n, CAST(sum(c) AS BIGINT) AS total_grams,
               round(max(c) / CAST(sum(c) AS DOUBLE), 6) AS top_frac,
               round(sum(CASE WHEN c > 1 THEN c ELSE 0 END)
                     / CAST(sum(c) AS DOUBLE), 6) AS dup_frac
        FROM counts GROUP BY 1, 2)
"""

ORACLES: dict[str, str] = {
    "repetition_stats": _GRAMS_CTE + """
    SELECT doc_id, gram_n, total_grams, top_frac, dup_frac
    FROM profile
    ORDER BY doc_id, gram_n
    """,
    "repetition_gate": _GRAMS_CTE + """
    SELECT doc_id,
           max(CASE WHEN gram_n = 2 THEN top_frac END) AS top_bigram_frac,
           max(CASE WHEN gram_n = 3 THEN dup_frac END) AS dup_trigram_frac
    FROM profile
    GROUP BY doc_id
    HAVING coalesce(top_bigram_frac, 0.0) <= 0.18
       AND coalesce(dup_trigram_frac, 0.0) <= 0.30
    ORDER BY doc_id
    """,
}

QUERIES = {
    "repetition_stats": repetition_stats,
    "repetition_gate": repetition_gate,
}
