"""Corpus curation pipeline — the composed training-data shape.

One operator chaining the stages every LLM-data pipeline runs before
training, each of which also exists standalone in this engine:

1. language gate   — keep docs whose `lang` metadata is in the allowed set
                     (the standalone heuristic classifier is `lang_id`)
2. quality gate    — composite quality score ≥ threshold
                     (text_analysis.quality_expr, shared with `quality_score`)
3. exact dedup     — keep the lowest doc_id per sha256(text)
                     (the `exact_dedup` shape, applied as a filter)
4. near-dup dedup  — MinHash+LSH verified Jaccard pairs ≥ 0.5
                     (dedup.minhash_lsh_pairs_for); greedy keep-first policy:
                     any doc that is the HIGHER id of a verified pair is
                     dropped. Deterministic and SQL-mirrorable; note it is
                     not transitively closed (a→b, b→c drops both b and c).

Scale shape: filters ride the scan (pushdown), exact dedup is a
map-side-combined ``min(doc_id)`` per content hash plus a join-back
(NOT a row_number window over sha2(text) partitions — content-keyed
duplicates are precisely the skewed-key class: the most-duplicated text
at 100 TB is empty docs and boilerplate error pages, and a window would
serialize each hash group into ONE unsplittable partition, while the
aggregate combines before its Exchange and AQE skew-join splitting
covers the join side; substring.py:33-48 states the argument,
exact_dedup at dedup.py:193 is the same primitive), the near-dup stage
is the banded-LSH candidate pipeline (never all-pairs), and the final
removal is a broadcast-able anti-join on the (small) drop set. No stage
collects to the driver.

The reference has no curation pipeline (its "quality" endpoint is a mock,
reference backend/mcp_server/tools/data_tools.py:64-110); this operator is
part of the engine's training-data surface (build brief: dedup + text
analysis as first-class components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table
from ai_powered_data_pipeline_assistant_spark.execution import materialize
from ai_powered_data_pipeline_assistant_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    minhash_lsh_cte,
    minhash_lsh_pairs_for,
)
from ai_powered_data_pipeline_assistant_spark.operators.text_analysis import (
    QUALITY_SQL,
    quality_expr,
)

ALLOWED_LANGS = ("en", "de", "fr", "es")
MIN_QUALITY = 0.6


def keeper_ids(docs: DataFrame) -> DataFrame:
    """First-wins exact-dedup keeper set: (doc_id) of the lowest-id row per
    sha256(text) group — the skew-safe first-wins primitive every curation
    entry point shares.

    A two-phase HashAggregate (map-side partial combine before the one
    hash Exchange), never a ``row_number() OVER (PARTITION BY
    sha2(text))`` window: the aggregate's shuffle rows are (32-byte hash,
    min-id) partials regardless of how hot a duplicate group is, while the
    window shape would move every duplicate ROW into one unsplittable
    partition (plan-pinned in tests/test_plans.py). doc_id is unique in
    `documents`, so min-id ≡ row_number()=1 under ORDER BY doc_id.
    """
    return (
        docs.groupBy(F.sha2("text", 256).alias("_h"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )


def exact_keep_first(docs: DataFrame) -> DataFrame:
    """All columns of the lowest-id row per content hash: keeper-id
    aggregate + a left-semi join-back on the unique doc_id (shuffle rows
    on the probe side are keyed by the uniformly distributed id, and AQE
    skew splitting covers any residue — the substring.py first-wins
    discipline)."""
    return docs.join(keeper_ids(docs), "doc_id", "left_semi")


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    langs: tuple[str, ...] = ALLOWED_LANGS,
    min_quality: float = MIN_QUALITY,
    jaccard: float = JACCARD_THRESHOLD,
) -> DataFrame:
    """Returns the curated corpus manifest: (doc_id, lang, n_tokens,
    quality) for every surviving document."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    gated = (
        docs.filter(F.col("lang").isin(*langs))
        .withColumn("quality", quality_expr())
        .filter(F.col("quality") >= min_quality)
    )
    # exact dedup: skew-safe keep-first per content hash (keeper_ids agg
    # + semi join-back; module docstring states why not a window)
    kept = exact_keep_first(gated).transform(
        materialize  # feeds both the LSH stage and the final anti-join
    )
    drops = (
        minhash_lsh_pairs_for(kept.select("doc_id", "text"), threshold=jaccard)
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
    )
    curated = kept.join(drops, "doc_id", "left_anti")
    return curated.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        "quality",
    )


def curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage survivor accounting for the curation pipeline — the
    observability view every data-ops team keeps on a curation run
    (how many docs each gate dropped).

    Five one-row counts over progressively filtered frames, unioned into
    one result. Each count is a map-side-combined aggregate; the exact-dedup
    frame is persisted once and feeds the LSH stage, the final anti-join,
    and its own count — the multi-count accounting adds scans of the
    (columnar, pruned) source but no extra shuffles.
    """
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    lang_gated = docs.filter(F.col("lang").isin(*ALLOWED_LANGS))
    q_gated = lang_gated.withColumn("quality", quality_expr()).filter(
        F.col("quality") >= MIN_QUALITY
    )
    kept = exact_keep_first(q_gated).transform(materialize)
    drops = (
        minhash_lsh_pairs_for(kept.select("doc_id", "text"))
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
    )
    final = kept.join(drops, "doc_id", "left_anti")

    def stage(idx: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(idx).cast("long").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count("*").alias("n_docs"),
        )

    return (
        stage(0, "total", docs)
        .unionByName(stage(1, "lang_gate", lang_gated))
        .unionByName(stage(2, "quality_gate", q_gated))
        .unionByName(stage(3, "exact_dedup", kept))
        .unionByName(stage(4, "neardup_dedup", final))
        .orderBy("stage_idx")
    )


GATE_NAMES = ("lang", "quality", "exact_dup", "near_dup")
_GATE_PAIRS = [
    (a, b)
    for i, a in enumerate(GATE_NAMES)
    for b in GATE_NAMES[i:]
]


def gate_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate-redundancy matrix: every curation gate evaluated INDEPENDENTLY
    on the raw corpus, then pairwise fail-overlap counts — the analysis a
    data-ops team runs before ordering (or pruning) gates: a pair whose
    overlap ≈ its diagonal means the cheaper gate makes the expensive one
    near-redundant; near-zero overlap means the gates catch different
    documents and both earn their cost. Complements `curation_funnel`,
    which reports the SEQUENTIAL pipeline (each stage sees only prior
    survivors, so its drops are order-dependent); here exact-dedup and
    near-dup verdicts are computed over the FULL corpus.

    One row per unordered gate pair (diagonal = per-gate fail counts).
    Scale shape: one flags projection over the corpus (lang/quality ride
    the scan; exact-dup is the skew-safe keeper_ids aggregate joined back
    on the unique doc_id — never a content-keyed window; near-dup reuses
    the banded-LSH drop set as a broadcast-able anti-join side), then ONE
    map-side-combined aggregate producing all |pairs| counts, unpivoted
    in-row — never one pass per pair."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    near_drops = (
        minhash_lsh_pairs_for(docs.select("doc_id", "text"))
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
        .withColumn("near_hit", F.lit(True))
    )
    keepers = keeper_ids(docs).withColumn("_keeper", F.lit(True))
    flags = (
        docs.withColumn("fail_lang", ~F.col("lang").isin(*ALLOWED_LANGS))
        .withColumn("fail_quality", quality_expr() < MIN_QUALITY)
        .join(keepers, "doc_id", "left")
        .withColumn("fail_exact_dup", ~F.coalesce("_keeper", F.lit(False)))
        .join(near_drops, "doc_id", "left")
        .withColumn("fail_near_dup", F.coalesce("near_hit", F.lit(False)))
    )
    aggs = [
        F.sum(
            F.when(F.col(f"fail_{a}") & F.col(f"fail_{b}"), 1).otherwise(0)
        )
        .cast("long")
        .alias(f"{a}__{b}")
        for a, b in _GATE_PAIRS
    ]
    row = flags.agg(*aggs)
    stack = ", ".join(f"'{a}', '{b}', {a}__{b}" for a, b in _GATE_PAIRS)
    return (
        row.select(
            F.expr(
                f"stack({len(_GATE_PAIRS)}, {stack}) "
                "AS (gate_a, gate_b, n_fail_both)"
            )
        )
        .orderBy("gate_a", "gate_b")
    )


def _overlap_sql() -> str:
    langs = ", ".join(f"'{l}'" for l in ALLOWED_LANGS)
    sums = ",\n                   ".join(
        f"CAST(sum(CASE WHEN fail_{a} AND fail_{b} THEN 1 ELSE 0 END) "
        f"AS BIGINT) AS {a}__{b}"
        for a, b in _GATE_PAIRS
    )
    rows = " UNION ALL ".join(
        f"SELECT '{a}' AS gate_a, '{b}' AS gate_b, {a}__{b} AS n_fail_both "
        "FROM m"
        for a, b in _GATE_PAIRS
    )
    return f"""
        WITH {minhash_lsh_cte("documents")},
        near_drops AS (
            SELECT DISTINCT p.b_id AS doc_id
            FROM candidates c
            JOIN pairs p ON c.a_id = p.a_id AND c.b_id = p.b_id
            WHERE p.jaccard >= {JACCARD_THRESHOLD}),
        flags AS (
            SELECT doc_id,
                   lang NOT IN ({langs}) AS fail_lang,
                   {QUALITY_SQL} < {MIN_QUALITY} AS fail_quality,
                   row_number() OVER (PARTITION BY sha256(text)
                                      ORDER BY doc_id) > 1 AS fail_exact_dup,
                   doc_id IN (SELECT doc_id FROM near_drops) AS fail_near_dup
            FROM documents),
        m AS (SELECT {sums} FROM flags)
        {rows}
        ORDER BY gate_a, gate_b
    """


def _curate_sql() -> str:
    langs = ", ".join(f"'{l}'" for l in ALLOWED_LANGS)
    return f"""
        WITH gated AS (
            SELECT doc_id, lang, text, {QUALITY_SQL} AS quality
            FROM documents
            WHERE lang IN ({langs}) AND {QUALITY_SQL} >= {MIN_QUALITY}),
        kept AS (
            SELECT doc_id, lang, text, quality FROM (
                SELECT *, row_number() OVER (PARTITION BY sha256(text)
                                             ORDER BY doc_id) AS rn
                FROM gated)
            WHERE rn = 1),
        {minhash_lsh_cte("kept")},
        drops AS (
            SELECT DISTINCT p.b_id AS doc_id
            FROM candidates c JOIN pairs p ON c.a_id = p.a_id AND c.b_id = p.b_id
            WHERE p.jaccard >= {JACCARD_THRESHOLD})
        SELECT k.doc_id, k.lang,
               len(regexp_split_to_array(trim(k.text), '\\s+')) AS n_tokens,
               k.quality
        FROM kept k
        WHERE k.doc_id NOT IN (SELECT doc_id FROM drops)
    """


def _funnel_sql() -> str:
    langs = ", ".join(f"'{l}'" for l in ALLOWED_LANGS)
    return f"""
        WITH lang_gated AS (
            SELECT doc_id, text FROM documents WHERE lang IN ({langs})),
        q_gated AS (
            SELECT doc_id, text FROM lang_gated
            WHERE {QUALITY_SQL} >= {MIN_QUALITY}),
        kept AS (
            SELECT doc_id, text FROM (
                SELECT *, row_number() OVER (PARTITION BY sha256(text)
                                             ORDER BY doc_id) AS rn
                FROM q_gated)
            WHERE rn = 1),
        {minhash_lsh_cte("kept")},
        drops AS (
            SELECT DISTINCT p.b_id AS doc_id
            FROM candidates c JOIN pairs p ON c.a_id = p.a_id AND c.b_id = p.b_id
            WHERE p.jaccard >= {JACCARD_THRESHOLD}),
        final AS (
            SELECT doc_id FROM kept
            WHERE doc_id NOT IN (SELECT doc_id FROM drops))
        SELECT CAST(0 AS BIGINT) AS stage_idx, 'total' AS stage,
               count(*) AS n_docs FROM documents
        UNION ALL SELECT 1, 'lang_gate', count(*) FROM lang_gated
        UNION ALL SELECT 2, 'quality_gate', count(*) FROM q_gated
        UNION ALL SELECT 3, 'exact_dedup', count(*) FROM kept
        UNION ALL SELECT 4, 'neardup_dedup', count(*) FROM final
        ORDER BY stage_idx
    """


ORACLES: dict[str, str] = {
    "curate_corpus": _curate_sql(),
    "curation_funnel": _funnel_sql(),
    "gate_overlap_matrix": _overlap_sql(),
}

QUERIES = {
    "curate_corpus": curate_corpus,
    "curation_funnel": curation_funnel,
    "gate_overlap_matrix": gate_overlap_matrix,
}


def curation_dropped_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document drop attribution for the curation pipeline: every doc
    labeled with the FIRST stage that rejected it (lang / quality /
    exact_dup / near_dup) or 'kept' — the lineage view a data-ops team
    pulls when a producer asks "why did my documents disappear?".
    `curation_funnel` gives the counts; this gives the receipts.

    Same plan pieces as `curate_corpus` (shared scan for the gates, the
    skew-safe keeper_ids aggregate joined back on the unique doc_id, the
    banded-LSH drop set joined back left), plus one left join to attach
    the near-dup verdict — attribution costs one broadcast join over the
    pipeline it audits.
    """
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    flagged = docs.select(
        "doc_id",
        "lang",
        "text",
        F.col("lang").isin(*ALLOWED_LANGS).alias("lang_ok"),
        (quality_expr() >= MIN_QUALITY).alias("quality_ok"),
    )
    # gate-failed rows must NOT compete for keeper inside a hash group (a
    # failed doc with a lower id would otherwise make its surviving twin
    # look like an exact_dup) → the keeper set is computed over gate
    # SURVIVORS only
    passed = flagged.filter(F.col("lang_ok") & F.col("quality_ok"))
    keepers = keeper_ids(passed).withColumn("_keeper", F.lit(True))
    ranked = flagged.join(keepers, "doc_id", "left")
    kept = (
        ranked.filter(F.col("_keeper"))
        .select("doc_id", "text")
        .transform(materialize)
    )
    drops = (
        minhash_lsh_pairs_for(kept, threshold=JACCARD_THRESHOLD)
        .select(F.col("b_id").alias("doc_id"))
        .distinct()
        .withColumn("near_dup", F.lit(True))
    )
    status = (
        F.when(~F.col("lang_ok"), F.lit("lang"))
        .when(~F.col("quality_ok"), F.lit("quality"))
        .when(~F.coalesce("_keeper", F.lit(False)), F.lit("exact_dup"))
        .when(F.col("near_dup"), F.lit("near_dup"))
        .otherwise(F.lit("kept"))
    )
    return (
        ranked.join(F.broadcast(drops), "doc_id", "left")
        .select("doc_id", "lang", status.alias("dropped_by"))
        .orderBy("doc_id")
    )


QUERIES["curation_dropped_audit"] = curation_dropped_audit


def _dropped_audit_sql() -> str:
    langs = ", ".join(f"'{l}'" for l in ALLOWED_LANGS)
    return f"""
        WITH flagged AS (
            SELECT doc_id, lang, text,
                   lang IN ({langs}) AS lang_ok,
                   {QUALITY_SQL} >= {MIN_QUALITY} AS quality_ok
            FROM documents),
        ranked AS (
            SELECT *, CASE WHEN lang_ok AND quality_ok THEN
                       row_number() OVER (
                           PARTITION BY CASE WHEN lang_ok AND quality_ok
                                             THEN sha256(text) END
                           ORDER BY doc_id) END AS rn
            FROM flagged),
        kept AS (SELECT doc_id, text FROM ranked WHERE rn = 1),
        {minhash_lsh_cte("kept")},
        drops AS (
            SELECT DISTINCT p.b_id AS doc_id
            FROM candidates c JOIN pairs p
                 ON c.a_id = p.a_id AND c.b_id = p.b_id
            WHERE p.jaccard >= {JACCARD_THRESHOLD})
        SELECT r.doc_id, r.lang,
               CASE WHEN NOT r.lang_ok THEN 'lang'
                    WHEN NOT r.quality_ok THEN 'quality'
                    WHEN r.rn > 1 THEN 'exact_dup'
                    WHEN d.doc_id IS NOT NULL THEN 'near_dup'
                    ELSE 'kept' END AS dropped_by
        FROM ranked r LEFT JOIN drops d USING (doc_id)
        ORDER BY r.doc_id
    """


ORACLES["curation_dropped_audit"] = _dropped_audit_sql()
