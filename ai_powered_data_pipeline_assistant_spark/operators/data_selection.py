"""Data selection for LM pretraining: importance resampling, mixture
temperature planning, and train/test n-gram novelty.

These extend the reference's curation surface (gates + dedup, reference
backend/services/data_quality.py and the round-2 curation pipeline) with
the *selection* half of a training-data pipeline — which documents to keep
and how to weight sources — using only published methods:

- `dsir_importance_weights` / `dsir_gumbel_resample` — Data Selection with
  Importance Resampling (Xie et al. 2023, arXiv:2302.03169): hashed
  unigram+bigram bag-of-ngrams models for a target domain vs the raw
  corpus; per-document importance = sum of per-feature log-likelihood
  ratios; resampling via Gumbel-top-k over the importance logits.
- `temperature_mix_plan` — multilingual/multi-source mixture weighting
  p_s ∝ share_s^alpha (the temperature-sampling rule of multilingual
  pretraining, e.g. XLM-R; alpha=1 is proportional, alpha→0 uniform).
- `ngram_novelty_report` — per-language fraction of held-out 5-gram types
  unseen in the train split (the memorization/novelty axis of
  "Deduplicating Training Data Makes Language Models Better",
  Lee et al. 2022).

Float discipline (the `unigram_logprob` rule): every ln is rounded to 6 dp
and int64-scaled ONCE in a bounded per-feature frame; per-document and
per-source accumulation sums INTEGERS (order-free, exact); only final
display math is floating point, computed by the identical expression in
both engines. Randomness is deterministic md5 arithmetic (functions/
hashing.py), so the Gumbel draw and the train/test split are
oracle-exact.

Scale (100 TB): feature hashing bounds model state to DSIR_BUCKETS rows
regardless of corpus size — the log-ratio table always broadcasts; n-gram
extraction is array-adjacent flatMap (no per-doc window shuffle); bucket
and per-doc aggregations are map-side-combined groupBys; novelty distincts
shuffle 8-byte hashes, never shingle text; the mix plan reduces to one
|sources|-row frame. Nothing here is all-pairs and no state grows with
corpus size except the per-doc output itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table
from ai_powered_data_pipeline_assistant_spark.execution import materialize
from ai_powered_data_pipeline_assistant_spark.functions.hashing import (
    md5_int,
    md5_int_sql,
)

LP_SCALE = 1_000_000
DSIR_BUCKETS = 4096
DSIR_TARGET_LANG = "en"
DSIR_SAMPLE_K = 200
GUMBEL_MOD = 100_000
MIX_ALPHAS = (0.3, 0.5, 0.7, 1.0)
MIX_SCALE = 1_000_000_000
NOVELTY_N = 5
NOVELTY_TRAIN_PCT = 80

def _toks():
    """Whitespace token array (lazy: Columns need a live session)."""
    return F.split(F.trim(F.lower(F.col("text"))), r"\s+")


def _doc_bucket_stream(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, bucket) — one row per unigram AND adjacent bigram,
    hashed into [0, DSIR_BUCKETS). Array-adjacent extraction, no window."""
    base = docs.select("doc_id", "lang", _toks().alias("t"))
    # Unigrams and bigrams ride ONE explode (round 13): the old
    # uni-UNION-bi shape scanned and re-split the corpus twice; appending
    # the bigram array to the token array per doc emits the identical
    # n-gram multiset from a single pass. size(t) == 1 docs get no bigrams
    # (the guard also keeps sequence() from descending).
    ngrams = F.when(
        F.size("t") >= 2,
        F.concat(
            F.col("t"),
            F.expr(
                "transform(sequence(0, size(t) - 2), "
                "i -> concat_ws(' ', t[i], t[i + 1]))"
            ),
        ),
    ).otherwise(F.col("t"))
    return base.select(
        "doc_id", "lang", F.explode(ngrams).alias("ng")
    ).select(
        "doc_id",
        "lang",
        (md5_int(F.col("ng")) % DSIR_BUCKETS).alias("bucket"),
    )


def _bucket_logratio_counts(counts: DataFrame) -> DataFrame:
    """Per-bucket int64 log-likelihood ratio ln(p_target) - ln(p_raw) from a
    pre-aggregated (bucket, rc, tc) frame, both add-1 smoothed over
    DSIR_BUCKETS. The corpus totals are re-aggregated from the
    ≤DSIR_BUCKETS bucket frame, so the model costs nothing beyond the
    counts that feed it. At most DSIR_BUCKETS rows → broadcasts."""
    totals = counts.agg(
        F.sum("rc").alias("rtot"), F.sum("tc").alias("ttot")
    )

    def lp(cnt, tot):
        return F.round(
            F.log(
                (F.coalesce(cnt, F.lit(0)) + 1)
                / (F.col(tot) + F.lit(DSIR_BUCKETS)).cast("double")
            )
            * LP_SCALE,
            0,
        ).cast("long")

    return counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (lp(F.col("tc"), "ttot") - lp(F.col("rc"), "rtot")).alias("lr_int"),
    )


def _doc_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    stream = _doc_bucket_stream(docs)
    # ONE pass over the n-gram stream (round 13, guide §2.4): the stream fed
    # two consumers — the bucket-count model and the per-doc scorer — and,
    # unmaterialized, the explode+md5 ran twice end to end (profiled: the
    # two heaviest stages of the query were the same computation). Collapse
    # the stream to per-(doc, bucket) counts first (map-side-combined, ~min(
    # n_ngrams, DSIR_BUCKETS) rows per doc), materialize THAT small frame,
    # and derive both the model and the scores from it: counts re-aggregate
    # per bucket, and the per-doc score weights lr_int by the local count.
    per_doc = (
        stream.groupBy("doc_id", "lang", "bucket")
        .agg(F.count("*").alias("cnt"))
        .transform(materialize)
    )
    lr = _bucket_logratio_counts(
        per_doc.groupBy("bucket").agg(
            F.sum("cnt").alias("rc"),
            F.sum(
                F.when(F.col("lang") == DSIR_TARGET_LANG, F.col("cnt")).otherwise(0)
            ).alias("tc"),
        )
    )
    scored = (
        per_doc.join(F.broadcast(lr), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("cnt") * F.col("lr_int")).alias("sum_lr"),
            F.sum("cnt").alias("n_ngrams"),
        )
    )
    return scored.join(docs.select("doc_id", "lang", "source"), "doc_id")


def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance: mean hashed-ngram log-likelihood ratio
    toward the ``DSIR_TARGET_LANG`` domain (positive = more target-like
    than the raw corpus). The logit used by the resampler is the SUM; the
    mean is reported so scores are comparable across document lengths."""
    return (
        _doc_importance(spark, sf_dir)
        .select(
            "doc_id",
            "lang",
            "source",
            "n_ngrams",
            F.round(
                (F.col("sum_lr") / F.lit(float(LP_SCALE))) / F.col("n_ngrams"), 6
            ).alias("importance"),
        )
        .orderBy("doc_id")
    )


def dsir_gumbel_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gumbel-top-k resample (the DSIR sampling step): key = logit + Gumbel
    noise, take the top ``DSIR_SAMPLE_K``. The Gumbel draw is deterministic
    md5 arithmetic — u = (md5(doc_id||':gumbel') mod 1e5 + 0.5)/1e5,
    g = -ln(-ln(u)) — so the sample is reproducible and oracle-exact, and
    each noise term is rounded ONCE before the single add."""
    scored = _doc_importance(spark, sf_dir)
    u = (
        md5_int(F.concat(F.col("doc_id").cast("string"), F.lit(":gumbel")))
        % GUMBEL_MOD
        + F.lit(0.5)
    ) / F.lit(float(GUMBEL_MOD))
    logit = F.round(F.col("sum_lr") / F.lit(float(LP_SCALE)), 6)
    gumbel = F.round(-F.log(-F.log(u)), 6)
    out = scored.select(
        "doc_id",
        "lang",
        "source",
        logit.alias("logit"),
        gumbel.alias("gumbel"),
        F.round(logit + gumbel, 6).alias("key"),
    )
    return (
        out.orderBy(F.desc("key"), "doc_id")
        .limit(DSIR_SAMPLE_K)
        .orderBy(F.desc("key"), "doc_id")
    )


def temperature_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source-mixture plan at several sampling temperatures: p_s ∝
    share_s^alpha over whitespace-token counts, plus the effective epochs
    each source runs when one raw-corpus-size token budget is drawn at
    that mixture. share^alpha (∈ (0,1]) is int64-scaled BEFORE the
    across-source normalization sum, keeping the plan overflow-free at any
    corpus size and the sum order-free."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    per_src = docs.select("source", F.size(_toks()).alias("nt")).groupBy(
        "source"
    ).agg(F.sum("nt").alias("tokens"))
    totals = per_src.agg(F.sum("tokens").alias("total"))
    alphas = F.explode(
        F.array(*[F.lit(a) for a in MIX_ALPHAS])
    ).alias("alpha")
    weighted = (
        per_src.crossJoin(F.broadcast(totals))
        .select("source", "tokens", "total", alphas)
        .select(
            "source",
            "tokens",
            "total",
            "alpha",
            F.round(
                F.pow(F.col("tokens") / F.col("total").cast("double"), F.col("alpha"))
                * MIX_SCALE,
                0,
            )
            .cast("long")
            .alias("w_int"),
        )
    )
    norms = weighted.groupBy("alpha").agg(F.sum("w_int").alias("w_sum"))
    p = F.col("w_int") / F.col("w_sum").cast("double")
    return (
        weighted.join(norms, "alpha")
        .select(
            "source",
            "alpha",
            "tokens",
            F.round(F.col("tokens") / F.col("total").cast("double"), 6).alias(
                "p_raw"
            ),
            F.round(p, 6).alias("p_temp"),
            F.round(p * F.col("total") / F.col("tokens").cast("double"), 4).alias(
                "epochs_at_budget"
            ),
        )
        .orderBy("alpha", "source")
    )


def ngram_novelty_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language novelty of held-out text: share of distinct test-split
    5-gram types absent from the train split (hash split, NOVELTY_TRAIN_PCT
    train). Low novelty = the held-out set is largely memorizable from
    train — the signal dedup/decontamination is meant to raise. Shingles
    are md5-hashed to int64 IMMEDIATELY so the distinct/anti-join shuffles
    move 8-byte keys, never 5-gram text."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    base = (
        docs.select("doc_id", "lang", _toks().alias("t"))
        .filter(F.size("t") >= NOVELTY_N)
        .select(
            "lang",
            (
                md5_int(F.col("doc_id").cast("string")) % 100
                < NOVELTY_TRAIN_PCT
            ).alias("is_train"),
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(t) - {NOVELTY_N}), "
                    "i -> concat_ws(' ', t[i], t[i + 1], t[i + 2], "
                    "t[i + 3], t[i + 4]))"
                )
            ).alias("ng"),
        )
        .select("lang", "is_train", md5_int(F.col("ng")).alias("h"))
    )
    train = base.filter("is_train").select("h").distinct()
    test = base.filter("NOT is_train").select("lang", "h").distinct()
    novel = test.join(train, "h", "left_anti")
    counts = test.groupBy("lang").agg(F.count("*").alias("n_test_ngrams"))
    novel_counts = novel.groupBy("lang").agg(F.count("*").alias("n_novel"))
    return (
        counts.join(novel_counts, "lang", "left")
        .select(
            "lang",
            "n_test_ngrams",
            F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
            F.round(
                F.coalesce("n_novel", F.lit(0)) * 100.0 / F.col("n_test_ngrams"),
                4,
            ).alias("novelty_pct"),
        )
        .orderBy("lang")
    )


QUERIES = {
    "dsir_importance_weights": dsir_importance_weights,
    "dsir_gumbel_resample": dsir_gumbel_resample,
    "temperature_mix_plan": temperature_mix_plan,
    "ngram_novelty_report": ngram_novelty_report,
}


def _dsir_common_sql() -> str:
    bucket = f"{md5_int_sql('ng')} % {DSIR_BUCKETS}"
    return rf"""
        WITH base AS (
            SELECT doc_id, lang,
                   regexp_split_to_array(trim(lower(text)), '\s+') AS t
            FROM documents),
        ngrams AS (
            SELECT doc_id, lang, unnest(t) AS ng FROM base
            UNION ALL
            SELECT doc_id, lang, t[i] || ' ' || t[i + 1] AS ng
            FROM base, LATERAL (SELECT unnest(range(1, len(t))) AS i)
            WHERE len(t) >= 2),
        stream AS (
            SELECT doc_id, lang, {bucket} AS bucket FROM ngrams),
        counts AS (
            SELECT bucket, count(*) AS rc,
                   sum(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1
                            ELSE 0 END) AS tc
            FROM stream GROUP BY 1),
        totals AS (SELECT sum(rc) AS rtot, sum(tc) AS ttot FROM counts),
        lr AS (
            SELECT bucket,
                   CAST(round(ln((coalesce(tc, 0) + 1)
                              / CAST(ttot + {DSIR_BUCKETS} AS DOUBLE))
                              * {LP_SCALE}, 0) AS BIGINT)
                   - CAST(round(ln((coalesce(rc, 0) + 1)
                              / CAST(rtot + {DSIR_BUCKETS} AS DOUBLE))
                              * {LP_SCALE}, 0) AS BIGINT) AS lr_int
            FROM counts CROSS JOIN totals),
        scored AS (
            SELECT s.doc_id,
                   CAST(sum(lr_int) AS BIGINT) AS sum_lr,
                   count(*) AS n_ngrams
            FROM stream s JOIN lr USING (bucket)
            GROUP BY 1)
    """


ORACLES: dict[str, str] = {
    "dsir_importance_weights": _dsir_common_sql()
    + rf"""
        SELECT doc_id, d.lang, d.source, s.n_ngrams,
               round((s.sum_lr / {LP_SCALE}.0) / s.n_ngrams, 6) AS importance
        FROM scored s JOIN documents d USING (doc_id)
        ORDER BY doc_id
    """,
    "dsir_gumbel_resample": _dsir_common_sql()
    + rf"""
        , keyed AS (
            SELECT doc_id, d.lang, d.source,
                   round(s.sum_lr / {LP_SCALE}.0, 6) AS logit,
                   round(-ln(-ln((({md5_int_sql(
                       "CAST(doc_id AS VARCHAR) || ':gumbel'")})
                       % {GUMBEL_MOD} + 0.5) / {GUMBEL_MOD}.0)), 6) AS gumbel
            FROM scored s JOIN documents d USING (doc_id))
        SELECT doc_id, lang, source, logit, gumbel,
               round(logit + gumbel, 6) AS key
        FROM (SELECT * FROM keyed
              ORDER BY round(logit + gumbel, 6) DESC, doc_id
              LIMIT {DSIR_SAMPLE_K})
        ORDER BY key DESC, doc_id
    """,
    "temperature_mix_plan": rf"""
        WITH per_src AS (
            SELECT source,
                   CAST(sum(len(regexp_split_to_array(trim(lower(text)),
                                                      '\s+'))) AS BIGINT)
                       AS tokens
            FROM documents GROUP BY 1),
        totals AS (SELECT CAST(sum(tokens) AS BIGINT) AS total FROM per_src),
        weighted AS (
            SELECT source, tokens, total, alpha,
                   CAST(round(pow(tokens / CAST(total AS DOUBLE), alpha)
                              * {MIX_SCALE}, 0) AS BIGINT) AS w_int
            FROM per_src CROSS JOIN totals
            CROSS JOIN (SELECT CAST(unnest(ARRAY{list(MIX_ALPHAS)}) AS DOUBLE)
                        AS alpha)),
        norms AS (
            SELECT alpha, CAST(sum(w_int) AS BIGINT) AS w_sum
            FROM weighted GROUP BY 1)
        SELECT source, alpha, tokens,
               round(tokens / CAST(total AS DOUBLE), 6) AS p_raw,
               round(w_int / CAST(w_sum AS DOUBLE), 6) AS p_temp,
               round((w_int / CAST(w_sum AS DOUBLE)) * total
                     / CAST(tokens AS DOUBLE), 4) AS epochs_at_budget
        FROM weighted JOIN norms USING (alpha)
        ORDER BY alpha, source
    """,
    "ngram_novelty_report": rf"""
        WITH base AS (
            SELECT doc_id, lang,
                   regexp_split_to_array(trim(lower(text)), '\s+') AS t
            FROM documents
            WHERE len(regexp_split_to_array(trim(lower(text)), '\s+'))
                  >= {NOVELTY_N}),
        shingled AS (
            SELECT lang,
                   {md5_int_sql("CAST(doc_id AS VARCHAR)")} % 100
                       < {NOVELTY_TRAIN_PCT} AS is_train,
                   {md5_int_sql(
                       "t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' "
                       "|| t[i+3] || ' ' || t[i+4]")} AS h
            FROM base,
                 LATERAL (SELECT unnest(range(1, len(t) - {NOVELTY_N - 2}))
                          AS i)),
        train AS (SELECT DISTINCT h FROM shingled WHERE is_train),
        test AS (SELECT DISTINCT lang, h FROM shingled WHERE NOT is_train),
        novel AS (
            SELECT lang, count(*) AS n_novel
            FROM test ANTI JOIN train USING (h)
            GROUP BY 1),
        counts AS (
            SELECT lang, count(*) AS n_test_ngrams FROM test GROUP BY 1)
        SELECT lang, n_test_ngrams,
               coalesce(n_novel, 0) AS n_novel,
               round(coalesce(n_novel, 0) * 100.0 / n_test_ngrams, 4)
                   AS novelty_pct
        FROM counts LEFT JOIN novel USING (lang)
        ORDER BY lang
    """,
}
