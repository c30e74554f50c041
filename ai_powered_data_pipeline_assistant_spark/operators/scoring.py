"""Model-style document scoring, expressed as pure column math:

- `unigram_logprob` — the perplexity-filter stand-in every curation
  pipeline runs (CCNet/KenLM shape): train a unigram LM on the corpus
  itself (token frequencies), score each document by its mean negative
  log-probability. High values = improbable token soup; low = boilerplate.
- `quality_classifier` — a fixed-weight logistic scorer over the shared
  quality features (fastText-classifier shape with hand-set public
  weights; a trained model would drop its coefficients into the same
  expression).

Float discipline: a naive sum(ln p) over a document is float-addition-
order-dependent — different partitionings give different last bits, and
the DuckDB oracle would hash-mismatch. Instead each DISTINCT token's log
probability is rounded to 6 dp and scaled to an int64 ONCE in the vocab
frame; per-document accumulation then sums INTEGERS (order-free, exact),
and only the final mean is floating-point again, computed by the identical
expression in both engines.

Scale notes: the vocab frame is |distinct tokens| rows, built by one
map-side-combined groupBy over the exploded token stream; scoring joins it
back on the token key (Catalyst broadcasts it while it fits — a 100 TB
corpus vocab that outgrows broadcast degrades to a shuffle join on a
uniform key, which is fine). Per-doc reduction is a second combine-heavy
groupBy. The classifier is a single narrow projection — no shuffle at all.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table

LP_SCALE = 1_000_000
# Hand-set logistic weights over (n_tokens/100 capped at 1, avg_word_len,
# punct_ratio, upper_ratio) — public fastText-style quality-filter shape.
W_LEN, W_AWL, W_PUNCT, W_UPPER, BIAS = 2.0, 0.3, -8.0, -4.0, -0.5


def unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean negative log-probability under the corpus's own
    unigram distribution (lower = more typical of the corpus)."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok")
    )
    vocab = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    lp = vocab.crossJoin(F.broadcast(total)).select(
        "tok",
        F.round(
            F.log(F.col("cnt") / F.col("total").cast("double")) * LP_SCALE, 0
        )
        .cast("long")
        .alias("lp_int"),
    )
    return (
        toks.join(lp, "tok")
        .groupBy("doc_id")
        .agg(F.sum("lp_int").alias("sum_lp"), F.count("*").alias("n_tokens"))
        .select(
            "doc_id",
            "n_tokens",
            F.round(
                -(F.col("sum_lp") / F.lit(float(LP_SCALE))) / F.col("n_tokens"), 6
            ).alias("mean_neg_logprob"),
        )
        .orderBy("doc_id")
    )


def bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean negative log-probability under a corpus-trained
    add-one-smoothed bigram LM — one rung up the KenLM ladder from
    `unigram_logprob`.

    Bigram extraction is ARRAY-ADJACENT (t[i], t[i+1]) — a flatMap over the
    scan with NO per-doc window shuffle (the lag-window formulation would
    shuffle the full token stream by doc_id for information the token array
    already holds). Same integer discipline as the unigram scorer: each
    distinct bigram's smoothed log-prob is rounded and int64-scaled once,
    document sums are exact integer adds.
    """
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    pairs = (
        docs.select("doc_id", toks.alias("t"))
        .filter(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2), "
                    "i -> struct(t[i] AS w1, t[i + 1] AS w2))"
                )
            ).alias("bg"),
        )
        .select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    )
    uni = (
        docs.select(F.explode(toks).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c1"))
    )
    vsize = uni.agg(F.count("*").alias("v"))
    big = pairs.groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    lp = (
        big.join(uni.withColumnRenamed("tok", "w1"), "w1")
        .crossJoin(F.broadcast(vsize))
        .select(
            "w1",
            "w2",
            F.round(
                F.log((F.col("c12") + 1) / (F.col("c1") + F.col("v")).cast("double"))
                * LP_SCALE,
                0,
            )
            .cast("long")
            .alias("lp_int"),
        )
    )
    return (
        pairs.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(F.sum("lp_int").alias("sum_lp"), F.count("*").alias("n_bigrams"))
        .select(
            "doc_id",
            "n_bigrams",
            F.round(
                -(F.col("sum_lp") / F.lit(float(LP_SCALE))) / F.col("n_bigrams"), 6
            ).alias("mean_neg_logprob"),
        )
        .orderBy("doc_id")
    )


def perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail perplexity bucketing (Wenzek et al.
    2020, arXiv:1911.00359): train a PER-LANGUAGE unigram LM on the corpus,
    score every document by mean negative log-probability, and split each
    language's documents into equal thirds by rank — head (most fluent)
    feeds training as-is, middle is kept with caution, tail is dropped or
    routed to extra filtering. This is the selection stage CCNet runs with
    a KenLM 5-gram; the unigram scorer slots into the same bucket algebra
    (`bigram_logprob` is the next rung up).

    Exactness: per-token log-probs are int64-scaled ONCE in the per-lang
    vocab frame (the `unigram_logprob` rule) so document sums are
    order-free; the bucket cut is RANK-based (rounded mean, doc_id
    tie-break) — no float threshold comparisons, so both engines agree
    bit-for-bit.

    Scale: the per-lang rank is the hazard — ``Window.partitionBy(lang)``
    funnels corpus/|langs| rows through one reducer. Cure: ONE global
    two-phase rank over (lang, score, doc_id) via `append_global_rank`,
    then per-lang rank = global rank − broadcast per-lang offset
    (|langs|-row frame). The vocab join broadcasts while it fits, exactly
    as in `unigram_logprob`."""
    from ai_powered_data_pipeline_assistant_spark.execution import materialize
    from ai_powered_data_pipeline_assistant_spark.operators.ranking import (
        append_global_rank,
    )
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    # Materialized: the tokenize/explode — the most expensive scan here —
    # feeds TWO consumers (vocab aggregation + per-doc scoring join); without
    # the barrier it would run twice (the dedup.py postings convention).
    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), r"\s+")).alias("tok"),
    ).transform(materialize)
    vocab = toks.groupBy("lang", "tok").agg(F.count("*").alias("cnt"))
    totals = vocab.groupBy("lang").agg(F.sum("cnt").alias("total"))
    lp = vocab.join(F.broadcast(totals), "lang").select(
        "lang",
        "tok",
        F.round(F.log(F.col("cnt") / F.col("total").cast("double")) * LP_SCALE, 0)
        .cast("long")
        .alias("lp_int"),
    )
    per_doc = (
        toks.join(lp, ["lang", "tok"])
        .groupBy("doc_id", "lang")
        .agg(F.sum("lp_int").alias("sum_lp"), F.count("*").alias("n_tokens"))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            F.round(
                -(F.col("sum_lp") / F.lit(float(LP_SCALE))) / F.col("n_tokens"), 6
            ).alias("mean_neg_logprob"),
        )
        .transform(materialize)
    )
    n_rows = per_doc.count()
    ranked = append_global_rank(
        per_doc,
        [F.asc("lang"), F.asc("mean_neg_logprob"), F.asc("doc_id")],
        "grk",
        n_rows=n_rows,
    )
    lang_sizes = per_doc.groupBy("lang").agg(F.count("*").alias("n_lang"))
    off_w = Window.orderBy("lang").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # |langs|-row frame: the unpartitioned window is bounded by construction
    offsets = lang_sizes.select(
        "lang",
        "n_lang",
        (F.sum("n_lang").over(off_w) - F.col("n_lang")).alias("off"),
    )
    rk = F.col("grk") - F.col("off")
    bucket = (
        F.when(rk <= F.floor(F.col("n_lang") / 3), F.lit("head"))
        .when(rk <= F.floor(F.col("n_lang") * 2 / 3), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return (
        ranked.join(F.broadcast(offsets), "lang")
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "mean_neg_logprob",
            rk.alias("lang_rank"),
            bucket.alias("ppl_bucket"),
        )
        .orderBy("doc_id")
    )


def _clf_score_col():
    """The fixed-weight logistic score as a column expression over the
    `documents` scan — shared by `quality_classifier` and
    `calibration_report` so the scored model cannot drift between them."""
    n_chars = F.length("text")
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    n_punct = n_chars - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace("text", r"[A-Z]", ""))
    len_feat = F.least(n_tokens / F.lit(100.0), F.lit(1.0))
    awl = (n_chars - n_tokens + 1) / n_tokens.cast("double")
    punct = n_punct / n_chars.cast("double")
    upper = n_upper / n_chars.cast("double")
    z = (
        F.lit(W_LEN) * len_feat
        + F.lit(W_AWL) * awl
        + F.lit(W_PUNCT) * punct
        + F.lit(W_UPPER) * upper
        + F.lit(BIAS)
    )
    return F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)


def quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Logistic quality score + keep label from the shared per-doc features
    (one codegen'd projection over the scan; weights are inlined
    constants)."""
    docs = load_table(spark, sf_dir, "documents")
    score = _clf_score_col()
    return docs.select(
        "doc_id",
        score.alias("score"),
        (score >= 0.5).alias("keep"),
    )


def calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the quality classifier — the check every
    curation pipeline should run BEFORE picking a keep-threshold: bucket
    documents by predicted score decile and compare the bucket's mean
    predicted probability against the empirical positive rate on a
    reference label (here the `quality_trainer` synthetic target,
    long-document ≥ LABEL_MIN_CHARS chars — deterministic and
    SQL-replicable, standing in for human labels). Large |gap| rows mean
    the score is not a probability there and a threshold chosen on it
    keeps/drops different mass than intended.

    Exactness: scores are already 6-dp-rounded doubles (oracle-exact in
    `quality_classifier`); per-bucket mean prediction sums int64-scaled
    scores (order-free), and rates divide exact integers — every output
    column is the identical expression in both engines. One groupBy over
    the scan; ≤ 10 result rows."""
    from ai_powered_data_pipeline_assistant_spark.operators.quality_trainer import (
        LABEL_MIN_CHARS,
    )

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    score = _clf_score_col()
    scored = docs.select(
        F.least(F.floor(score * 10), F.lit(9)).cast("int").alias("bucket"),
        F.round(score * 1e6, 0).cast("long").alias("score_u"),
        (F.length("text") >= LABEL_MIN_CHARS).cast("long").alias("pos"),
    )
    agg = scored.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("pos").alias("n_pos"),
        F.sum("score_u").alias("pred_u"),
    )
    mean_pred = F.round(F.col("pred_u") / 1e6 / F.col("n_docs"), 6)
    pos_rate = F.round(F.col("n_pos").cast("double") / F.col("n_docs"), 6)
    return agg.select(
        "bucket",
        "n_docs",
        "n_pos",
        mean_pred.alias("mean_pred"),
        pos_rate.alias("pos_rate"),
        F.round(F.abs(mean_pred - pos_rate), 6).alias("abs_gap"),
    ).orderBy("bucket")


def zlib_ratio_udf():
    """Arrow-batched pandas UDF: zlib-compressed size / raw UTF-8 size,
    rounded to 6 dp. Vectorized per Arrow batch; zlib releases the GIL, so
    Python workers stay CPU-bound, not lock-bound."""
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def ratio(texts: pd.Series) -> pd.Series:
        def one(t: str) -> float:
            b = (t or "").encode("utf-8")
            if not b:
                return 1.0
            return round(len(zlib.compress(b, 6)) / len(b), 6)

        return texts.map(one)

    return ratio


def compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compressibility quality signal (the Gopher/MassiveText-style filter):
    zlib-compressed size over raw size per document. Boilerplate and
    template spam compress far below ~0.35; natural prose sits ~0.4-0.7;
    high-entropy token soup approaches 1. Flagging both tails is a standard
    corpus-quality gate.

    No SQL mirror (zlib isn't SQL-expressible) → rows-only driver check;
    the bounds and monotonicity claims are pinned by `compression_ratio_audit`
    (driver-scorable) and tests. Scale: embarrassingly parallel map over the
    scan — no shuffle; compression cost is linear in bytes scanned."""
    docs = load_table(spark, sf_dir, "documents")
    ratio = zlib_ratio_udf()
    return (
        docs.select(
            "doc_id",
            F.length("text").alias("n_chars"),
            ratio("text").alias("zlib_ratio"),
        )
        .withColumn("repetitive", F.col("zlib_ratio") < 0.35)
        .orderBy("doc_id")
    )


def compression_ratio_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-scorable pin of the zlib path: one row asserting every ratio
    is in (0, 1.2] (zlib worst-case overhead is a few % over incompressible
    input) and the operator covers the whole corpus. The oracle recomputes
    the doc count and states the bounds as literals."""
    r = compression_ratio(spark, sf_dir)
    return r.agg(
        F.count("*").alias("n_docs"),
        (F.min("zlib_ratio") > 0.0).alias("all_positive"),
        (F.max("zlib_ratio") <= 1.2).alias("all_bounded"),
    )


ORACLES: dict[str, str] = {
    "compression_ratio_audit": """
        SELECT count(*) AS n_docs, true AS all_positive, true AS all_bounded
        FROM documents
    """,
    "perplexity_buckets": rf"""
        WITH toks AS (
            SELECT doc_id, lang,
                   unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
            FROM documents),
        vocab AS (SELECT lang, tok, count(*) AS cnt FROM toks GROUP BY 1, 2),
        totals AS (
            SELECT lang, CAST(sum(cnt) AS BIGINT) AS total FROM vocab GROUP BY 1),
        lp AS (
            SELECT lang, tok,
                   CAST(round(ln(cnt / CAST(total AS DOUBLE)) * {LP_SCALE}, 0)
                        AS BIGINT) AS lp_int
            FROM vocab JOIN totals USING (lang)),
        per_doc AS (
            SELECT doc_id, lang, count(*) AS n_tokens,
                   round(-(CAST(sum(lp_int) AS BIGINT) / {LP_SCALE}.0)
                         / count(*), 6) AS mean_neg_logprob
            FROM toks JOIN lp USING (lang, tok)
            GROUP BY doc_id, lang),
        ranked AS (
            SELECT *,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY mean_neg_logprob, doc_id) AS lang_rank,
                   count(*) OVER (PARTITION BY lang) AS n_lang
            FROM per_doc)
        SELECT doc_id, lang, n_tokens, mean_neg_logprob,
               CAST(lang_rank AS BIGINT) AS lang_rank,
               CASE WHEN lang_rank <= n_lang // 3 THEN 'head'
                    WHEN lang_rank <= (n_lang * 2) // 3 THEN 'middle'
                    ELSE 'tail' END AS ppl_bucket
        FROM ranked
        ORDER BY doc_id
    """,
    "unigram_logprob": rf"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
            FROM documents),
        vocab AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1),
        total AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
        lp AS (
            SELECT tok,
                   CAST(round(ln(cnt / CAST(total AS DOUBLE)) * {LP_SCALE}, 0)
                        AS BIGINT) AS lp_int
            FROM vocab CROSS JOIN total)
        SELECT doc_id, count(*) AS n_tokens,
               round(-(CAST(sum(lp_int) AS BIGINT) / {LP_SCALE}.0)
                     / count(*), 6) AS mean_neg_logprob
        FROM toks JOIN lp USING (tok)
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    "bigram_logprob": rf"""
        WITH toks AS (
            SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
            FROM documents),
        pairs AS (
            SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
            FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)),
        uni AS (
            SELECT tok, count(*) AS c1 FROM (
                SELECT unnest(t) AS tok FROM toks) GROUP BY 1),
        vsize AS (SELECT count(*) AS v FROM uni),
        big AS (SELECT w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2),
        lp AS (
            SELECT w1, w2,
                   CAST(round(ln((c12 + 1) / CAST(c1 + v AS DOUBLE))
                              * {LP_SCALE}, 0) AS BIGINT) AS lp_int
            FROM big JOIN uni ON uni.tok = big.w1 CROSS JOIN vsize)
        SELECT doc_id, count(*) AS n_bigrams,
               round(-(CAST(sum(lp_int) AS BIGINT) / {LP_SCALE}.0)
                     / count(*), 6) AS mean_neg_logprob
        FROM pairs JOIN lp USING (w1, w2)
        GROUP BY doc_id
        ORDER BY doc_id
    """,
    "quality_classifier": rf"""
        WITH feats AS (
            SELECT doc_id,
                   len(text) AS n_chars,
                   len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
                   len(text) - len(regexp_replace(text, '[^\w\s]', '', 'g'))
                       AS n_punct,
                   len(text) - len(regexp_replace(text, '[A-Z]', '', 'g'))
                       AS n_upper
            FROM documents),
        scored AS (
            SELECT doc_id,
                   round(1.0 / (1.0 + exp(-(
                       {W_LEN} * least(n_tokens / 100.0, 1.0)
                       + {W_AWL} * ((n_chars - n_tokens + 1)
                                    / CAST(n_tokens AS DOUBLE))
                       + {W_PUNCT} * (n_punct / CAST(n_chars AS DOUBLE))
                       + {W_UPPER} * (n_upper / CAST(n_chars AS DOUBLE))
                       + {BIAS}))), 6) AS score
            FROM feats)
        SELECT doc_id, score, score >= 0.5 AS keep FROM scored
    """,
}

from ai_powered_data_pipeline_assistant_spark.operators.quality_trainer import (  # noqa: E402
    LABEL_MIN_CHARS as _LABEL_MIN_CHARS,
)

ORACLES["calibration_report"] = rf"""
    WITH feats AS (
        SELECT len(text) AS n_chars,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
               len(text) - len(regexp_replace(text, '[^\w\s]', '', 'g'))
                   AS n_punct,
               len(text) - len(regexp_replace(text, '[A-Z]', '', 'g'))
                   AS n_upper
        FROM documents),
    scored AS (
        SELECT n_chars,
               round(1.0 / (1.0 + exp(-(
                   {W_LEN} * least(n_tokens / 100.0, 1.0)
                   + {W_AWL} * ((n_chars - n_tokens + 1)
                                / CAST(n_tokens AS DOUBLE))
                   + {W_PUNCT} * (n_punct / CAST(n_chars AS DOUBLE))
                   + {W_UPPER} * (n_upper / CAST(n_chars AS DOUBLE))
                   + {BIAS}))), 6) AS score
        FROM feats),
    b AS (
        SELECT CAST(least(floor(score * 10), 9) AS INT) AS bucket,
               CAST(round(score * 1e6, 0) AS BIGINT) AS score_u,
               CASE WHEN n_chars >= {_LABEL_MIN_CHARS} THEN 1 ELSE 0 END AS pos
        FROM scored)
    SELECT bucket, count(*) AS n_docs, CAST(sum(pos) AS BIGINT) AS n_pos,
           round(CAST(sum(score_u) AS BIGINT) / 1e6 / count(*), 6)
               AS mean_pred,
           round(CAST(sum(pos) AS DOUBLE) / count(*), 6) AS pos_rate,
           round(abs(round(CAST(sum(score_u) AS BIGINT) / 1e6 / count(*), 6)
                     - round(CAST(sum(pos) AS DOUBLE) / count(*), 6)), 6)
               AS abs_gap
    FROM b GROUP BY bucket ORDER BY bucket
"""



ZLIB_PROBES: list[tuple[int, str]] = [
    (0, "a"),
    (1, "abab" * 200),                       # highly compressible template
    (2, "héllo wörld — ünïcode " * 17),      # multi-byte utf-8
    (3, "the quick brown fox jumps over the lazy dog. " * 40),
    (4, "x7Kq9ZpL2mNvR4tYwB8cD1fG6hJ3sU5e" * 11),  # entropy-heavy soup
]


def compression_probe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-checksum pin of the zlib Arrow path (the embedder_probe_audit
    pattern): run `zlib_ratio_udf` — the REAL pandas UDF, through Arrow
    batches over 3 partitions — on fixed probe strings and emit
    floor(ratio·1e6) integers; the oracle carries goldens generated at
    import by the same `len(zlib.compress(utf8, 6)) / len(utf8)` spec.
    zlib output is deterministic for a given level, so this is exact, and
    it upgrades the zlib surface from the bounds-only
    `compression_ratio_audit` to per-value equality (the corpus-wide
    `compression_ratio` stays rows-only: its values depend on sf)."""
    probes = spark.createDataFrame(ZLIB_PROBES, "probe_id long, text string").repartition(3)
    ratio = zlib_ratio_udf()
    return probes.select(
        "probe_id",
        F.floor(ratio("text") * 1e6).cast("long").alias("ratio_u"),
    ).orderBy("probe_id")


def _compression_probe_oracle() -> str:
    import zlib

    rows = []
    for pid, t in ZLIB_PROBES:
        b = t.encode("utf-8")
        r = round(len(zlib.compress(b, 6)) / len(b), 6)
        rows.append((pid, int(r * 1e6 // 1)))
    values = ",\n            ".join(
        f"({pid}, CAST({v} AS BIGINT))" for pid, v in rows
    )
    return f"""
        SELECT * FROM (VALUES
            {values}
        ) AS t(probe_id, ratio_u)
        ORDER BY probe_id
    """


ORACLES["compression_probe_audit"] = _compression_probe_oracle()


QUERIES = {
    "unigram_logprob": unigram_logprob,
    "bigram_logprob": bigram_logprob,
    "perplexity_buckets": perplexity_buckets,
    "quality_classifier": quality_classifier,
    "calibration_report": calibration_report,
    "compression_ratio": compression_ratio,
    "compression_ratio_audit": compression_ratio_audit,
    "compression_probe_audit": compression_probe_audit,
}


# ---------------------------------------------------------------------------
# PMI collocations
# ---------------------------------------------------------------------------

COLLOC_MIN_PAIR = 20
COLLOC_TOP_K = 30


def collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``COLLOC_TOP_K`` adjacent-bigram collocations by pointwise mutual
    information (Church & Hanks 1990), the standard phrase-mining / tokenizer
    -vocab-candidate primitive: PMI = ln(p(w1,w2) / (p(w1) p(w2))), support-
    filtered at ``COLLOC_MIN_PAIR`` occurrences so rare-pair noise never
    ranks.

    Cross-engine exactness discipline: the probability ratio is assembled in
    ONE fixed association order — (c12 * n^2) / ((c1 * c2) * m) with the
    leading operand cast to double before any multiply (the all-integer
    product would overflow int64 at real corpus sizes) — then a single ln +
    round(6). Ranking uses the ROUNDED score with a (w1, w2) tie-break, the
    same reproducibility rule as tfidf_keywords.

    Scale (100 TB): bigram extraction is array-adjacent flatMap (no per-doc
    window shuffle); unigram and bigram counts are map-side-combined
    groupBys; the support filter prunes the bigram table BEFORE the two
    vocab joins; the totals row is a broadcast. Nothing is quadratic and no
    global sort touches more than the support-filtered survivors.
    """
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    tarr = docs.select(toks.alias("t"))
    totals = tarr.agg(
        F.sum(F.size("t")).alias("n"),
        F.sum(F.greatest(F.size("t") - F.lit(1), F.lit(0))).alias("m"),
    )
    uni = (
        tarr.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c"))
    )
    pairs = (
        tarr.filter(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2), "
                    "i -> struct(t[i] AS w1, t[i + 1] AS w2))"
                )
            ).alias("bg")
        )
        .select("bg.w1", "bg.w2")
    )
    big = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
        .filter(F.col("c12") >= COLLOC_MIN_PAIR)
    )
    scored = (
        big.join(uni.withColumnRenamed("tok", "w1").withColumnRenamed("c", "c1"), "w1")
        .join(uni.withColumnRenamed("tok", "w2").withColumnRenamed("c", "c2"), "w2")
        .crossJoin(F.broadcast(totals))
        .select(
            "w1",
            "w2",
            "c12",
            "c1",
            "c2",
            F.round(
                F.log(
                    (F.col("c12").cast("double") * (F.col("n").cast("double") * F.col("n")))
                    / ((F.col("c1").cast("double") * F.col("c2")) * F.col("m"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return (
        scored.orderBy(F.desc("pmi"), "w1", "w2")
        .limit(COLLOC_TOP_K)
        .orderBy(F.desc("pmi"), "w1", "w2")
    )


QUERIES["collocation_pmi"] = collocation_pmi

ORACLES["collocation_pmi"] = rf"""
    WITH toks AS (
        SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS t
        FROM documents),
    totals AS (
        SELECT CAST(sum(len(t)) AS BIGINT) AS n,
               CAST(sum(greatest(len(t) - 1, 0)) AS BIGINT) AS m
        FROM toks),
    uni AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest(t) AS tok FROM toks) GROUP BY 1),
    pairs AS (
        SELECT t[i] AS w1, t[i + 1] AS w2
        FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)),
    big AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        FROM pairs GROUP BY 1, 2
        HAVING count(*) >= 20),
    scored AS (
        SELECT b.w1, b.w2, b.c12, u1.c AS c1, u2.c AS c2,
               round(ln((CAST(b.c12 AS DOUBLE)
                         * (CAST(t.n AS DOUBLE) * t.n))
                        / ((CAST(u1.c AS DOUBLE) * u2.c) * t.m)), 6) AS pmi
        FROM big b
        JOIN uni u1 ON u1.tok = b.w1
        JOIN uni u2 ON u2.tok = b.w2
        CROSS JOIN totals t)
    SELECT w1, w2, c12, c1, c2, pmi
    FROM (SELECT * FROM scored
          ORDER BY pmi DESC, w1, w2 LIMIT 30)
    ORDER BY pmi DESC, w1, w2
"""


# ---------------------------------------------------------------------------
# Held-out LM evaluation
# ---------------------------------------------------------------------------

PPL_TRAIN_PCT = 80


def heldout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out LM evaluation: train the add-one bigram LM on a
    deterministic 80% hash split, score the 20% held-out documents, and
    report per-language mean NLL and perplexity — the eval loop behind
    every "did more/cleaner data help?" curation decision, and the honest
    version of `bigram_logprob` (which trains and scores on the same
    corpus).

    Unseen-event handling: a test bigram absent from training backs off to
    add-one mass ln(1/(c1+V)); an unseen history word scores ln(1/V) —
    all via coalesce(0) on left joins against the train counts, identical
    in the oracle. Per-row log-probs are int64-scaled before the document
    sums (order-free exact); only the per-language averaging of identical
    doubles happens in floating point, displayed at 6 dp.

    Scale: train counts are two map-side-combined groupBys on the (pruned)
    train side; test pairs join them on (w1,w2)/(w1) hash keys. The
    vocabulary-size and split constants broadcast.
    """
    from ai_powered_data_pipeline_assistant_spark.functions.hashing import md5_int

    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    is_train = md5_int(F.col("doc_id").cast("string")) % 100 < PPL_TRAIN_PCT
    base = docs.select(
        "doc_id", "lang", toks.alias("t"), is_train.alias("is_train")
    ).filter(F.size("t") >= 2)

    def pairs_of(df):
        return df.select(
            "doc_id",
            "lang",
            F.explode(
                F.expr(
                    "transform(sequence(0, size(t) - 2), "
                    "i -> struct(t[i] AS w1, t[i + 1] AS w2))"
                )
            ).alias("bg"),
        ).select("doc_id", "lang", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    train = base.filter("is_train")
    test = base.filter("NOT is_train")
    uni = (
        train.select(F.explode("t").alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("c1"))
    )
    vsize = uni.agg(F.count("*").alias("v"))
    big = pairs_of(train).groupBy("w1", "w2").agg(F.count("*").alias("c12"))
    scored = (
        pairs_of(test)
        .join(big, ["w1", "w2"], "left")
        .join(uni.withColumnRenamed("tok", "w1"), "w1", "left")
        .crossJoin(F.broadcast(vsize))
        .select(
            "doc_id",
            "lang",
            F.round(
                F.log(
                    (F.coalesce("c12", F.lit(0)) + 1)
                    / (F.coalesce("c1", F.lit(0)) + F.col("v")).cast("double")
                )
                * LP_SCALE,
                0,
            )
            .cast("long")
            .alias("lp_int"),
        )
    )
    per_doc = scored.groupBy("doc_id", "lang").agg(
        F.sum("lp_int").alias("sum_lp"), F.count("*").alias("n")
    ).select(
        "lang",
        (-(F.col("sum_lp") / F.lit(float(LP_SCALE))) / F.col("n")).alias("nll"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count("*").alias("n_test_docs"),
            F.round(F.avg("nll"), 6).alias("mean_nll"),
            F.round(F.exp(F.avg("nll")), 2).alias("perplexity"),
        )
        .orderBy("lang")
    )


QUERIES["heldout_perplexity"] = heldout_perplexity


def _heldout_ppl_oracle() -> str:
    from ai_powered_data_pipeline_assistant_spark.functions.hashing import md5_int_sql

    split = f"{md5_int_sql('CAST(doc_id AS VARCHAR)')} % 100 < {PPL_TRAIN_PCT}"
    return rf"""
        WITH toks AS (
            SELECT doc_id, lang,
                   regexp_split_to_array(trim(lower(text)), '\s+') AS t,
                   {split} AS is_train
            FROM documents
            WHERE len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 2),
        train_pairs AS (
            SELECT t[i] AS w1, t[i + 1] AS w2
            FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
            WHERE is_train),
        test_pairs AS (
            SELECT doc_id, lang, t[i] AS w1, t[i + 1] AS w2
            FROM toks, LATERAL (SELECT unnest(range(1, len(t))) AS i)
            WHERE NOT is_train),
        uni AS (
            SELECT tok, count(*) AS c1 FROM (
                SELECT unnest(t) AS tok FROM toks WHERE is_train) GROUP BY 1),
        vsize AS (SELECT count(*) AS v FROM uni),
        big AS (SELECT w1, w2, count(*) AS c12 FROM train_pairs GROUP BY 1, 2),
        scored AS (
            SELECT tp.doc_id, tp.lang,
                   CAST(round(ln((coalesce(b.c12, 0) + 1)
                                 / CAST(coalesce(u.c1, 0) + v AS DOUBLE))
                              * {LP_SCALE}, 0) AS BIGINT) AS lp_int
            FROM test_pairs tp
            LEFT JOIN big b ON b.w1 = tp.w1 AND b.w2 = tp.w2
            LEFT JOIN uni u ON u.tok = tp.w1
            CROSS JOIN vsize),
        per_doc AS (
            SELECT doc_id, lang,
                   -(CAST(sum(lp_int) AS BIGINT) / {LP_SCALE}.0) / count(*)
                       AS nll
            FROM scored GROUP BY 1, 2)
        SELECT lang, count(*) AS n_test_docs,
               round(avg(nll), 6) AS mean_nll,
               round(exp(avg(nll)), 2) AS perplexity
        FROM per_doc GROUP BY 1 ORDER BY 1
    """


ORACLES["heldout_perplexity"] = _heldout_ppl_oracle()
