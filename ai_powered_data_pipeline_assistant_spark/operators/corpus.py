"""Corpus-level text operators: duplicate-span removal and TF-IDF keywords.

Two more members of the 100 TB curation family (BASELINE.json north star;
the reference's text processing stops at per-string cleaning,
backend/services/search_clients.py:68-91):

- `span_dedup` — C4's "remove duplicated spans" rule (Raffel et al. 2020
  drop repeated three-sentence spans corpus-wide; here the span unit is a
  fixed CHUNK_TOKENS-token window since the synthetic corpus has no
  sentence punctuation). Every chunk occurrence that already appeared
  earlier in the corpus — ordered by (doc_id, position) — is dropped, and
  surviving chunks are reassembled per document.

- `tfidf_keywords` — per-document top-K terms by tf·idf, the standard
  keyword-extraction / topic-tagging primitive. idf = ln((N+1)/(df+1));
  ranking uses the ROUNDED score (6 dp) with a term tie-break so the order
  is reproducible across engines regardless of libm ulp differences.

Scale notes:
- span_dedup: one explode to (chunk-hash, doc, pos), ONE window over the
  hash partition to find first occurrences (the shuffle key is the hash —
  uniform by construction, no skew), one groupBy(doc) with an in-array
  sort to reassemble. Work is linear in corpus tokens; nothing quadratic.
- tfidf_keywords: tf is a map-side-combined groupBy(doc, term); df reuses
  the tf frame (already one row per doc-term) with a groupBy(term); the
  scalar N joins back as a 1-row broadcast. The per-doc top-K window
  partitions by doc_id — millions of small partitions, never one global
  sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table
from ai_powered_data_pipeline_assistant_spark.execution import materialize
from ai_powered_data_pipeline_assistant_spark.functions.hashing import (
    md5_int,
    md5_int_sql,
)

CHUNK_TOKENS = 10
TFIDF_TOP_K = 5
RAG_CHUNK_TOKENS = 12
RAG_CHUNK_STRIDE = 8  # 4-token overlap between consecutive chunks


def span_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide duplicate-span removal at CHUNK_TOKENS granularity.

    A chunk occurrence survives iff it is the FIRST occurrence of that
    chunk text in (doc_id, chunk position) order. Returns per document the
    surviving text, total chunks, and how many were dropped.

    First-wins selection is the skew-safe ``min(struct(doc_id, pos))``
    aggregate per chunk hash — the curation/substring keeper discipline
    (round 12): a boilerplate chunk repeated millions of times is exactly
    the hot partition a ``row_number() OVER (PARTITION BY h)`` window
    would serialize into one task, while the aggregate partial-combines
    map-side. The surviving text then re-aggregates from the
    distinct-chunk-order firsts frame (the chunk text is single-valued
    per hash, so it rides the same aggregate); the full occurrence set is
    never shuffled a second time — its only other consumer is the
    map-side-combined per-doc count."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    chunks = F.expr(
        "transform(sequence(0, CAST(ceil(size(t) / {k}.0) AS INT) - 1), "
        "i -> concat_ws(' ', slice(t, i * {k} + 1, {k})))".format(k=CHUNK_TOKENS)
    )
    occ = (
        docs.select("doc_id", toks.alias("t"))
        .select("doc_id", F.posexplode(chunks).alias("pos", "chunk"))
        .select("doc_id", "pos", "chunk", md5_int(F.col("chunk")).alias("h"))
    )
    firsts = (
        occ.groupBy("h")
        .agg(
            F.min(F.struct("doc_id", "pos")).alias("f"),
            # md5-keyed group → one distinct chunk text per group; min is
            # the deterministic way to say "the" value
            F.min("chunk").alias("chunk"),
        )
        .select(
            F.col("f.doc_id").alias("doc_id"),
            F.col("f.pos").alias("pos"),
            "chunk",
        )
    )
    kept_per_doc = firsts.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "chunk"))),
                lambda s: s["chunk"],
            ),
            " ",
        ).alias("kept_text"),
    )
    totals = occ.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
    return (
        totals.join(kept_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_chunks",
            (F.col("n_chunks") - F.coalesce("n_kept", F.lit(0))).alias(
                "n_dropped"
            ),
            F.coalesce("kept_text", F.lit("")).alias("kept_text"),
        )
        .orderBy("doc_id")
    )


def tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K terms per document by tf·idf (rounded-score ranking, term
    tie-break)."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    tf = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n = docs.agg(F.count("*").alias("n"))
    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log((F.col("n") + 1) / (F.col("df") + 1).cast("double")),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= TFIDF_TOP_K)
        .select("doc_id", "term", "tf", "df", "score")
        .orderBy("doc_id", F.desc("score"), "term")
    )


def chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG-style ingestion chunking: overlapping RAG_CHUNK_TOKENS-token
    windows every RAG_CHUNK_STRIDE tokens, with a stable content-addressed
    chunk id (md5 of doc_id:chunk_idx:text — the upsert key a vector store
    would use, cf. the reference's content-hash conflict key,
    backend/services/vector_service.py:105).

    Scale: one explode — rows ≈ corpus_tokens / stride; no shuffle at all
    (the output is a flatMap over the scan), so it pipelines straight into
    the embedder / writer."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    n_win = (
        "CAST(greatest(ceil((size(t) - {k}) / {s}.0) + 1, 1) AS INT)".format(
            k=RAG_CHUNK_TOKENS, s=RAG_CHUNK_STRIDE
        )
    )
    chunks = F.expr(
        "transform(sequence(0, {n} - 1), "
        "i -> concat_ws(' ', slice(t, i * {s} + 1, {k})))".format(
            n=n_win, s=RAG_CHUNK_STRIDE, k=RAG_CHUNK_TOKENS
        )
    )
    out = (
        docs.select("doc_id", toks.alias("t"))
        .select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk_text"))
        .select(
            "doc_id",
            "chunk_idx",
            F.md5(
                F.concat_ws(":", F.col("doc_id"), F.col("chunk_idx"), F.col("chunk_text"))
            ).alias("chunk_id"),
            "chunk_text",
            F.size(F.split(F.col("chunk_text"), " ")).alias("n_tokens"),
        )
    )
    return out.orderBy("doc_id", "chunk_idx")


def corpus_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card manifest: per (source, lang) doc counts, token and char
    volume, and length spread — the summary table published next to every
    training-data release. One map-side-combined groupBy on the scan."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    return (
        docs.select("source", "lang", F.col("n_chars"), n_tokens.alias("n_tokens"))
        .groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("n_tokens").cast("long").alias("min_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
            F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        )
        .orderBy("source", "lang")
    )


TOKEN_BUDGET = 1_000_000  # target training tokens for epoch planning


def token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget planning per source: total tokens, corpus share, and
    epochs over this source needed to fill TOKEN_BUDGET tokens at its
    natural rate — the arithmetic behind training-mixture sheets.

    One map-side-combined groupBy(source); the corpus total joins back as
    a 1-row broadcast (never a second pass over the facts)."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.trim(F.lower(F.col("text"))), r"\s+"))
    per_source = (
        docs.select("source", n_tokens.alias("n_tokens"))
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
    )
    total = per_source.agg(
        F.sum("total_tokens").cast("long").alias("corpus_tokens")
    )
    return (
        per_source.crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "total_tokens",
            F.round(F.col("total_tokens") / F.col("corpus_tokens"), 6).alias(
                "share"
            ),
            F.round(F.lit(TOKEN_BUDGET) / F.col("total_tokens"), 4).alias(
                "epochs_for_budget"
            ),
        )
        .orderBy("source")
    )


BM25_TERMS = ("data", "model", "system")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOP = 20


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword retrieval over the corpus — the lexical ranking twin of
    the vector search path (hybrid search runs both and fuses). Scores the
    fixed query term set BM25_TERMS and returns the top BM25_TOP documents.

    Determinism across engines: per-term scores are computed as separate
    columns from integer tf/df/dl statistics and added in a FIXED literal
    order, so the float expression tree is identical in Spark and DuckDB
    (ln over integer ratios matches, as with `unigram_logprob`). Ranking
    ties break on doc_id; the final rounded score is the output.

    Scale (round 12, guide §2.3/§2.4): ONE tokenize + explode pass feeds a
    map-side-combined groupBy(doc_id) computing dl and the per-term tfs
    together (a doc's tokens never straddle a scan partition, so the
    partial aggregate collapses to one row per doc before the exchange) —
    the old shape tokenized the corpus three times (lengths, filtered
    stream, corpus-total) and pivot-joined the pieces back on doc_id
    across ~7 exchanges. The narrow per-doc stats frame (5 longs/doc) is
    materialized once and feeds both consumers (the 1-row corpus/df
    aggregate, which broadcasts, and the scoring projection). All counts
    are the same integers as the pivot formulation and the score
    expression tree is unchanged, so floats match bit-for-bit; the top-k
    still compiles to TakeOrderedAndProject — no global sort."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    # explode_OUTER + count(term) (round 13, VERDICT r12 #4/#8): a doc with
    # NULL text must stay a document — the oracle's lens CTE keeps it with
    # dl NULL and counts it in n_docs, so a plain explode (which drops it)
    # would drift n_docs/avgdl and lose the row on a corpus with null
    # text. explode_outer emits one NULL-term row for it; count("term")
    # (non-null count) wrapped in when() reproduces the oracle's NULL dl,
    # and the NULL-term row contributes NULL tf sums, which the score's
    # coalesce already treats as 0 — pinned end to end by
    # tests/test_dedup_edge.py::test_bm25_null_text_matches_oracle.
    per_doc = (
        docs.select("doc_id", F.explode_outer(toks).alias("term"))
        .groupBy("doc_id")
        .agg(
            F.when(F.count("term") > 0, F.count("term")).alias("dl"),
            *[
                F.sum((F.col("term") == t).cast("long")).alias(f"tf_{t}")
                for t in BM25_TERMS
            ],
        )
        .transform(materialize)  # two consumers: corpus stats + scoring
    )
    corpus = per_doc.agg(
        F.count("*").alias("n_docs"),
        F.sum("dl").alias("toks"),
        *[
            F.sum((F.col(f"tf_{t}") > 0).cast("long")).alias(f"df_{t}")
            for t in BM25_TERMS
        ],
    )
    wide = per_doc.crossJoin(F.broadcast(corpus))
    avgdl = F.col("toks") / F.col("n_docs").cast("double")

    def term_score(t: str) -> F.Column:
        tf_c = F.coalesce(F.col(f"tf_{t}"), F.lit(0)).cast("double")
        df_c = F.coalesce(F.col(f"df_{t}"), F.lit(0)).cast("double")
        idf = F.log(
            (F.col("n_docs") - df_c + 0.5) / (df_c + 0.5) + 1.0
        )
        denom = tf_c + BM25_K1 * (1.0 - BM25_B + BM25_B * (F.col("dl") / avgdl))
        return idf * (tf_c * (BM25_K1 + 1.0)) / denom

    score = term_score(BM25_TERMS[0])
    for t in BM25_TERMS[1:]:
        score = score + term_score(t)
    scored = wide.select("doc_id", F.round(score, 4).alias("bm25"))
    return scored.orderBy(F.desc("bm25"), "doc_id").limit(BM25_TOP)


def _bm25_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)

    def term_score(t: str) -> str:
        return (
            f"(ln((n_docs - coalesce(df_{t}, 0) + 0.5)"
            f" / (coalesce(df_{t}, 0) + 0.5) + 1.0)"
            f" * (coalesce(tf_{t}, 0) * ({BM25_K1} + 1.0))"
            f" / (coalesce(tf_{t}, 0) + {BM25_K1}"
            f" * (1.0 - {BM25_B} + {BM25_B} * (dl / (toks / CAST(n_docs AS DOUBLE))))))"
        )

    tf_cols = ", ".join(
        f"CAST(sum(CASE WHEN term = '{t}' THEN tf END) AS DOUBLE) AS tf_{t}"
        for t in BM25_TERMS
    )
    df_cols = ", ".join(
        f"CAST(max(CASE WHEN term = '{t}' THEN df END) AS DOUBLE) AS df_{t}"
        for t in BM25_TERMS
    )
    total = " + ".join(term_score(t) for t in BM25_TERMS)
    return rf"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                       AS term
            FROM documents),
        lens AS (
            SELECT doc_id,
                   CAST(len(regexp_split_to_array(trim(lower(text)), '\s+'))
                        AS BIGINT) AS dl
            FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
               WHERE term IN ({terms}) GROUP BY 1, 2),
        tfw AS (SELECT doc_id, {tf_cols} FROM tf GROUP BY 1),
        dfx AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        dfw AS (SELECT {df_cols} FROM dfx),
        corpus AS (
            SELECT count(*) AS n_docs,
                   CAST(sum(CAST(len(regexp_split_to_array(trim(lower(text)),
                        '\s+')) AS BIGINT)) AS BIGINT) AS toks
            FROM documents)
        SELECT doc_id, round({total}, 4) AS bm25
        FROM lens LEFT JOIN tfw USING (doc_id)
        CROSS JOIN corpus CROSS JOIN dfw
        ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOP}
    """


ORACLES: dict[str, str] = {
    "bm25_search": _bm25_sql(),
    "token_budget": rf"""
        WITH per_source AS (
            SELECT source, count(*) AS n_docs,
                   CAST(sum(len(regexp_split_to_array(trim(lower(text)),
                       '\s+'))) AS BIGINT) AS total_tokens
            FROM documents GROUP BY source),
        total AS (SELECT CAST(sum(total_tokens) AS BIGINT) AS corpus_tokens
                  FROM per_source)
        SELECT source, n_docs, total_tokens,
               round(total_tokens / CAST(corpus_tokens AS DOUBLE), 6) AS share,
               round({TOKEN_BUDGET} / CAST(total_tokens AS DOUBLE), 4)
                   AS epochs_for_budget
        FROM per_source CROSS JOIN total
        ORDER BY source
    """,
    "span_dedup": rf"""
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
            FROM documents),
        occ AS (
            SELECT doc_id, i - 1 AS pos,
                   array_to_string(t[(i - 1) * {CHUNK_TOKENS} + 1
                                     : (i - 1) * {CHUNK_TOKENS} + {CHUNK_TOKENS}],
                                   ' ') AS chunk
            FROM toks,
                 LATERAL (SELECT unnest(range(1,
                     CAST(ceil(len(t) / {CHUNK_TOKENS}.0) AS INT) + 1)) AS i)),
        ranked AS (
            SELECT doc_id, pos, chunk,
                   row_number() OVER (PARTITION BY {md5_int_sql("chunk")}
                                      ORDER BY doc_id, pos) AS rn
            FROM occ)
        SELECT doc_id, count(*) AS n_chunks,
               CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_dropped,
               coalesce(string_agg(CASE WHEN rn = 1 THEN chunk END, ' '
                                   ORDER BY pos), '') AS kept_text
        FROM ranked
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    "tfidf_keywords": rf"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
            FROM documents),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        n AS (SELECT count(*) AS n FROM documents),
        scored AS (
            SELECT doc_id, tf.term, tf, df,
                   round(tf * ln((n + 1) / CAST(df + 1 AS DOUBLE)), 6) AS score
            FROM tf JOIN dfreq USING (term) CROSS JOIN n)
        SELECT doc_id, term, tf, df, score
        FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                                           ORDER BY score DESC, term) AS rn
              FROM scored)
        WHERE rn <= {TFIDF_TOP_K}
        ORDER BY doc_id, score DESC, term
    """,
}

ORACLES["chunk_documents"] = rf"""
    WITH toks AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents),
    win AS (
        SELECT doc_id, t,
               CAST(greatest(ceil((len(t) - {RAG_CHUNK_TOKENS})
                                  / {RAG_CHUNK_STRIDE}.0) + 1, 1) AS INT) AS n
        FROM toks),
    occ AS (
        SELECT doc_id, i - 1 AS chunk_idx,
               array_to_string(t[(i - 1) * {RAG_CHUNK_STRIDE} + 1
                                 : (i - 1) * {RAG_CHUNK_STRIDE}
                                   + {RAG_CHUNK_TOKENS}], ' ') AS chunk_text
        FROM win, LATERAL (SELECT unnest(range(1, n + 1)) AS i))
    SELECT doc_id, chunk_idx,
           md5(doc_id || ':' || chunk_idx || ':' || chunk_text) AS chunk_id,
           chunk_text,
           len(string_split(chunk_text, ' ')) AS n_tokens
    FROM occ
    ORDER BY doc_id, chunk_idx
"""

ORACLES["corpus_manifest"] = r"""
    SELECT source, lang, count(*) AS n_docs,
           CAST(sum(len(regexp_split_to_array(trim(lower(text)), '\s+')))
               AS BIGINT) AS total_tokens,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           CAST(min(len(regexp_split_to_array(trim(lower(text)), '\s+')))
               AS BIGINT) AS min_tokens,
           CAST(max(len(regexp_split_to_array(trim(lower(text)), '\s+')))
               AS BIGINT) AS max_tokens,
           round(avg(len(regexp_split_to_array(trim(lower(text)), '\s+'))), 4)
               AS avg_tokens
    FROM documents
    GROUP BY source, lang
    ORDER BY source, lang
"""

QUERIES = {
    "token_budget": token_budget,
    "span_dedup": span_dedup,
    "tfidf_keywords": tfidf_keywords,
    "chunk_documents": chunk_documents,
    "corpus_manifest": corpus_manifest,
    "bm25_search": bm25_search,
}
