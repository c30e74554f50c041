"""Web-corpus curation operators: domain accounting, per-domain caps,
vocabulary statistics, and bloom-prefiltered incremental dedup.

Four more members of the 100 TB training-data family (BASELINE.json north
star; the reference stops at per-string cleaning and single-table upserts,
backend/services/search_clients.py:68-91, backend/services/vector_service.py:105):

- ``domain_stats`` / ``domain_cap_sample`` — the C4/RefinedWeb-style
  domain-level view of a crawl: parse a URL column, aggregate per host, and
  cap the number of documents any one host may contribute (anti-domination
  sampling). The test corpus has no URL column, so a deterministic URL is
  synthesized from (source, lang, doc_id) — the parse/group/cap plumbing is
  the operator; a real crawl swaps the synthesized column for its own.

- ``vocab_topk`` / ``zipf_fit`` — corpus vocabulary head and a Zipf's-law
  regression over the top ranks (log-count vs log-rank least squares), the
  standard sanity checks run before token-budget planning.

- ``bloom_dedup_gate`` — incremental ingest dedup: drop incoming documents
  whose content already exists in the corpus. A bloom filter over the
  corpus keys prefilters the incoming side; only bloom HITS (possible
  duplicates) enter the exact anti-join verify, so the result is exact
  (bloom filters have no false negatives) while the expensive join sees
  only candidate rows. This is the same prefilter-then-verify shape as
  ``minhash_lsh_pairs``, applied to streaming/batch ingest.

Scale notes:
- domain_stats: one groupBy(host) — host cardinality ≪ corpus, map-side
  combined. domain_cap_sample windows per host; millions of small
  partitions, never a global sort.
- vocab_topk: explode → map-side-combined groupBy(term) → TakeOrdered
  top-K (orderBy+limit, no global window); the rank is computed on the
  already-reduced K rows.
- zipf_fit: the regression input is the vocab top-RANKS rows (constant),
  reduced to one row by regr_slope/regr_intercept.
- bloom_dedup_gate: the bloom build is a bounded-size aggregate — distinct
  bit positions (≤ BLOOM_M = 2^17 rows regardless of corpus size) collected
  once and broadcast as a 16 KiB numpy bitmap; membership is an
  Arrow-batched pandas UDF (numpy gather, no per-row Python). At 100 TB the
  corpus side streams through one map + a tiny distinct; the verify join
  shuffles only bloom hits. (PySpark does not expose
  DataFrameStatFunctions.bloomFilter; this is the same construction with
  the bitmap OR expressed as a distinct over set bits.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table
from ai_powered_data_pipeline_assistant_spark.functions.hashing import (
    md5_int,
    md5_int_sql,
)

DOMAIN_CAP = 5
VOCAB_TOP_K = 50
ZIPF_RANKS = 100
BLOOM_M = 1 << 17  # bits; 16 KiB bitmap
BLOOM_K = 5  # probes per key
INCOMING_SOURCE = "src0"

_URL_SQL = "'https://' || source || '.example.org/' || lang || '/' || doc_id"


def _with_host(docs: DataFrame) -> DataFrame:
    """Synthesize the crawl URL and parse its host (JVM-side parse_url)."""
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.org/"),
        F.col("lang"),
        F.lit("/"),
        F.col("doc_id").cast("string"),
    )
    return docs.withColumn("url", url).withColumn(
        "host", F.parse_url(F.col("url"), F.lit("HOST"))
    )


def domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host crawl accounting: doc count, char volume, language spread."""
    docs = _with_host(load_table(spark, sf_dir, "documents"))
    return (
        docs.groupBy("host")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("host")
    )


def domain_cap_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cap each host's contribution at DOMAIN_CAP docs, preferring longer
    documents (deterministic tie-break on doc_id) — anti-domination
    sampling for crawl corpora."""
    docs = _with_host(load_table(spark, sf_dir, "documents"))
    w = Window.partitionBy("host").orderBy(F.desc("n_chars"), "doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= DOMAIN_CAP)
        .select("host", "doc_id", "n_chars", "rn")
        .orderBy("host", "rn")
    )


def _vocab(docs: DataFrame) -> DataFrame:
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    return (
        docs.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
    )


def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary head: top VOCAB_TOP_K terms by frequency.

    orderBy+limit → TakeOrderedAndProject; the rank window then runs on K
    rows only, never the full vocabulary."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    top = _vocab(docs).orderBy(F.desc("cnt"), "term").limit(VOCAB_TOP_K)
    w = Window.orderBy(F.desc("cnt"), "term")
    return top.withColumn("rank", F.row_number().over(w)).orderBy("rank")


OOV_VOCAB_K = 200


def oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage signal: the share of each document's tokens that
    fall outside the corpus's top-OOV_VOCAB_K vocabulary — the number that
    predicts how badly a fixed vocabulary fragments a document (high OOV =
    token soup or out-of-domain text; a curation run gates on it).

    Scale: the vocab head is TakeOrdered-K (never the full vocabulary) and
    broadcasts into the token stream; the per-doc reduction is one
    map-side-combined groupBy. The corpus is exploded once."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    head = (
        _vocab(docs)
        .orderBy(F.desc("cnt"), "term")
        .limit(OOV_VOCAB_K)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    stream = docs.select("doc_id", F.explode(toks).alias("term"))
    joined = stream.join(F.broadcast(head), "term", "left")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias(
                "n_oov"
            ),
        )
        .withColumn(
            "oov_share",
            F.round(F.col("n_oov") / F.col("n_tokens").cast("double"), 6),
        )
        .orderBy("doc_id")
    )


COVERAGE_KS = (10, 100, 1000)


def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary sizing curve: what share of all token occurrences the top
    10 / 100 / 1000 terms cover — the number that decides how large a fixed
    vocabulary (or stopword list) has to be before diminishing returns.

    The vocab frame is ranked once (TakeOrdered over the largest K); each
    curve point is a conditional sum over that single K-row frame against
    the corpus token total — no re-scan per K."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    vocab = _vocab(docs)
    total = vocab.agg(F.sum("cnt").alias("total_tokens"))
    top = vocab.orderBy(F.desc("cnt"), "term").limit(max(COVERAGE_KS))
    w = Window.orderBy(F.desc("cnt"), "term")
    ranked = top.withColumn("rank", F.row_number().over(w)).crossJoin(
        F.broadcast(total)
    )
    points = [
        ranked.agg(
            F.lit(k).cast("long").alias("top_k"),
            F.sum(F.when(F.col("rank") <= k, F.col("cnt"))).alias("covered"),
            F.max("total_tokens").alias("total_tokens"),
        )
        for k in COVERAGE_KS
    ]
    curve = points[0]
    for p in points[1:]:
        curve = curve.unionByName(p)
    return curve.select(
        "top_k",
        "covered",
        "total_tokens",
        F.round(F.col("covered") / F.col("total_tokens").cast("double"), 6).alias(
            "coverage_share"
        ),
    ).orderBy("top_k")


FREQ_SUPPORT = 0.01  # freqItems support threshold (share of token stream)


def frequent_terms_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass heavy-hitters via Spark's `freqItems` (Karp et al.
    streaming frequent-items): candidate terms with share ≥ FREQ_SUPPORT of
    the token stream, found WITHOUT the full vocabulary aggregation —
    constant memory (1/support counters per partition), one pass, no
    shuffle of the vocab. The sketch guarantees no false NEGATIVES (every
    truly frequent term appears) but may include false positives; library
    surface, pinned by `frequent_terms_audit`."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    stream = docs.select(F.explode(toks).alias("term"))
    items = stream.stat.freqItems(["term"], support=FREQ_SUPPORT)
    return items.select(
        F.concat_ws(",", F.array_sort(F.col("term_freqItems"))).alias(
            "candidates"
        )
    )


def frequent_terms_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-scorable pin of the sketch's no-false-negative guarantee: every
    term whose EXACT share ≥ FREQ_SUPPORT must appear in the sketch's
    candidate set. The oracle recomputes the exact frequent set and states
    the guarantee as a literal; the exact term list rides along so the row
    carries real content."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    stream = docs.select(F.explode(toks).alias("term"))
    total = stream.count()
    exact = (
        stream.groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= F.lit(int(total * FREQ_SUPPORT) + 1))
    )
    sketch_terms = set(
        frequent_terms_sketch(spark, sf_dir)
        .first()["candidates"]
        .split(",")
    )
    exact_terms = sorted(r["term"] for r in exact.collect())
    missed = [t for t in exact_terms if t not in sketch_terms]
    return spark.createDataFrame(
        [(len(exact_terms), ",".join(exact_terms), len(missed) == 0)],
        "n_frequent long, frequent_terms string, no_false_negatives boolean",
    )


def source_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-number corpus diversity: the Gini coefficient of document
    counts across sources (0 = perfectly even mix, →1 = one source owns
    the corpus) — the anti-domination metric tracked alongside
    `domain_cap_sample`. Computed exactly from the rank-weighted sum
    formula over the tiny per-source count frame; integer sums until the
    final division."""
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("x"))
    w = Window.orderBy("x", "source")
    ranked = counts.select("x", F.row_number().over(w).alias("i"))
    agg = ranked.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.col("i") * F.col("x")).alias("six"),
    )
    gini = F.round(
        (F.lit(2.0) * F.col("six")) / (F.col("n") * F.col("sx"))
        - (F.col("n") + 1) / F.col("n").cast("double"),
        6,
    )
    return agg.select(
        F.col("n").alias("n_sources"),
        F.col("sx").alias("total_docs"),
        gini.alias("gini"),
    )


ORACLES_EXTRA_SOURCE_CONCENTRATION = """
    WITH counts AS (SELECT source, count(*) AS x FROM documents GROUP BY 1),
    ranked AS (SELECT x, row_number() OVER (ORDER BY x, source) AS i
               FROM counts),
    agg AS (SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(i * x) AS BIGINT) AS six
            FROM ranked)
    SELECT n AS n_sources, sx AS total_docs,
           round((2.0 * six) / (n * sx) - (n + 1) / CAST(n AS DOUBLE), 6)
               AS gini
    FROM agg
"""


def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-squares fit of log(count) ~ log(rank) over the top ZIPF_RANKS
    vocabulary terms — Zipf's law expects a slope near -1."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    top = _vocab(docs).orderBy(F.desc("cnt"), "term").limit(ZIPF_RANKS)
    w = Window.orderBy(F.desc("cnt"), "term")
    ranked = top.withColumn("rank", F.row_number().over(w))
    return ranked.agg(
        F.count("*").cast("long").alias("n_terms"),
        F.round(
            F.regr_slope(F.log(F.col("cnt")), F.log(F.col("rank"))), 4
        ).alias("slope"),
        F.round(
            F.regr_intercept(F.log(F.col("cnt")), F.log(F.col("rank"))), 4
        ).alias("intercept"),
    )


def bloom_dedup_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingest dedup: incoming (source = INCOMING_SOURCE) docs
    whose lowercased text does not already exist in the rest of the corpus.

    Exact result, bloom-accelerated: the corpus keys set bits in a BLOOM_M
    bitmap (built as a bounded ``distinct`` over bit positions — at most
    BLOOM_M rows whatever the corpus size); incoming rows failing every
    probe are duplicates-impossible and skip the join; only bloom hits are
    verified with an exact anti-join on the full md5."""
    docs = load_table(spark, sf_dir, "documents")
    key = md5_int(F.lower(F.col("text")))
    full = F.md5(F.lower(F.col("text")))
    corpus = docs.filter(F.col("source") != INCOMING_SOURCE)
    incoming = docs.filter(F.col("source") == INCOMING_SOURCE).select(
        "doc_id", "n_chars", key.alias("h"), full.alias("md5")
    )

    # Double hashing: probe_i = (h1 + i*h2) mod M, h2 forced odd so the
    # probe sequence spans the table. All int64-safe: h < 2^60, M = 2^17.
    # shiftright (not `/`): double division loses bits for h near 2^60.
    h1 = F.col("h") % F.lit(BLOOM_M)
    _h2 = F.shiftright(F.col("h"), 17) % F.lit(BLOOM_M)
    h2 = _h2 - (_h2 % 2) + F.lit(1)
    probes = F.array(*[(h1 + F.lit(i) * h2) % F.lit(BLOOM_M) for i in range(BLOOM_K)])
    set_bits = (
        corpus.select(key.alias("h"))
        .select(F.explode(probes).alias("pos"))
        .distinct()
    )
    bitmap = np.zeros(BLOOM_M, dtype=bool)
    # Bounded driver transfer: ≤ BLOOM_M small ints, independent of scale.
    bitmap[[r["pos"] for r in set_bits.collect()]] = True

    @F.pandas_udf("boolean")
    def might_contain(h: pd.Series) -> pd.Series:
        hv = h.to_numpy(dtype=np.int64)
        p1 = hv % BLOOM_M
        p2 = ((hv >> 17) % BLOOM_M) | 1
        hit = np.ones(len(hv), dtype=bool)
        for i in range(BLOOM_K):
            hit &= bitmap[(p1 + i * p2) % BLOOM_M]
        return pd.Series(hit)

    candidates = incoming.filter(might_contain(F.col("h")))
    survivors_clear = incoming.filter(~might_contain(F.col("h")))
    verified = candidates.join(
        corpus.select(full.alias("md5")).distinct(), "md5", "left_anti"
    )
    return (
        survivors_clear.select("doc_id", "n_chars")
        .unionByName(verified.select("doc_id", "n_chars"))
        .orderBy("doc_id")
    )


BOILERPLATE_PREFIX_TOKENS = 8
BOILERPLATE_SHARE = 0.2


def boilerplate_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate detection: the most common
    BOILERPLATE_PREFIX_TOKENS-token document prefix of every source and the
    share of that source's documents starting with it. A dominant shared
    prefix is the signature of template boilerplate (cookie banners,
    scraped nav headers) that should be stripped before training — the
    per-source triage view a web-curation run starts from.

    Scale: one map-side-combined groupBy on (source, prefix) — the prefix
    is a fixed-width slice, never the document body — then window top-1
    over the per-source distinct-prefix frame (orders of magnitude smaller
    than the corpus). Source doc totals ride the same aggregate via a
    window sum, so the corpus is scanned once and shuffled once."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.concat_ws(
        " ",
        F.slice(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
            1,
            BOILERPLATE_PREFIX_TOKENS,
        ),
    )
    counts = docs.select("source", prefix.alias("prefix")).groupBy(
        "source", "prefix"
    ).agg(F.count("*").alias("cnt"))
    per_source = Window.partitionBy("source")
    ranked = counts.select(
        "source",
        "prefix",
        "cnt",
        F.row_number()
        .over(per_source.orderBy(F.desc("cnt"), F.asc("prefix")))
        .alias("rn"),
        F.sum("cnt").over(per_source).alias("n_docs"),
    )
    share = F.round(F.col("cnt") / F.col("n_docs").cast("double"), 6)
    return (
        ranked.filter(F.col("rn") == 1)
        .select(
            "source",
            F.col("prefix").alias("top_prefix"),
            F.col("cnt").alias("n_with_prefix"),
            "n_docs",
            share.alias("prefix_share"),
            (share >= BOILERPLATE_SHARE).alias("boilerplate_flag"),
        )
        .orderBy("source")
    )


ORACLES: dict[str, str] = {
    "boilerplate_prefixes": rf"""
        WITH counts AS (
            SELECT source,
                   array_to_string(regexp_split_to_array(trim(lower(text)),
                       '\s+')[1:{BOILERPLATE_PREFIX_TOKENS}], ' ') AS prefix,
                   count(*) AS cnt
            FROM documents GROUP BY 1, 2),
        ranked AS (
            SELECT source, prefix, cnt,
                   row_number() OVER (PARTITION BY source
                                      ORDER BY cnt DESC, prefix) AS rn,
                   CAST(sum(cnt) OVER (PARTITION BY source) AS BIGINT) AS n_docs
            FROM counts)
        SELECT source, prefix AS top_prefix, cnt AS n_with_prefix, n_docs,
               round(cnt / CAST(n_docs AS DOUBLE), 6) AS prefix_share,
               round(cnt / CAST(n_docs AS DOUBLE), 6) >= {BOILERPLATE_SHARE}
                   AS boilerplate_flag
        FROM ranked WHERE rn = 1 ORDER BY source
    """,
    "domain_stats": f"""
        WITH d AS (SELECT *, regexp_extract({_URL_SQL},
                       '^https?://([^/]+)', 1) AS host
                   FROM documents)
        SELECT host, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars,
               round(avg(n_chars), 4) AS avg_chars,
               count(DISTINCT lang) AS n_langs
        FROM d GROUP BY host ORDER BY host
    """,
    "domain_cap_sample": f"""
        WITH d AS (SELECT *, regexp_extract({_URL_SQL},
                       '^https?://([^/]+)', 1) AS host
                   FROM documents),
        ranked AS (SELECT host, doc_id, n_chars,
                          row_number() OVER (PARTITION BY host
                              ORDER BY n_chars DESC, doc_id) AS rn
                   FROM d)
        SELECT host, doc_id, n_chars, rn FROM ranked
        WHERE rn <= {DOMAIN_CAP} ORDER BY host, rn
    """,
    "vocab_topk": rf"""
        WITH toks AS (SELECT unnest(regexp_split_to_array(
                          trim(lower(text)), '\s+')) AS term
                      FROM documents),
        vocab AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term)
        SELECT term, cnt,
               row_number() OVER (ORDER BY cnt DESC, term) AS rank
        FROM vocab ORDER BY cnt DESC, term LIMIT {VOCAB_TOP_K}
    """,
    "zipf_fit": rf"""
        WITH toks AS (SELECT unnest(regexp_split_to_array(
                          trim(lower(text)), '\s+')) AS term
                      FROM documents),
        vocab AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
        ranked AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term)
                       AS rank
                   FROM vocab ORDER BY cnt DESC, term LIMIT {ZIPF_RANKS})
        SELECT CAST(count(*) AS BIGINT) AS n_terms,
               round(regr_slope(ln(cnt), ln(rank)), 4) AS slope,
               round(regr_intercept(ln(cnt), ln(rank)), 4) AS intercept
        FROM ranked
    """,
    "bloom_dedup_gate": f"""
        SELECT i.doc_id, i.n_chars
        FROM documents i
        WHERE i.source = '{INCOMING_SOURCE}'
          AND NOT EXISTS (SELECT 1 FROM documents c
                          WHERE c.source <> '{INCOMING_SOURCE}'
                            AND md5(lower(c.text)) = md5(lower(i.text)))
        ORDER BY i.doc_id
    """,
}

QUERIES = {
    "domain_stats": domain_stats,
    "domain_cap_sample": domain_cap_sample,
    "vocab_topk": vocab_topk,
    "zipf_fit": zipf_fit,
    "bloom_dedup_gate": bloom_dedup_gate,
    "boilerplate_prefixes": boilerplate_prefixes,
    "oov_rate": oov_rate,
    "vocab_coverage_curve": vocab_coverage_curve,
    # frequent_terms_sketch itself is library surface (candidate set may
    # contain partitioning-dependent false positives); the audit pins it.
    "frequent_terms_audit": frequent_terms_audit,
    "source_concentration": source_concentration,
}

ORACLES["source_concentration"] = ORACLES_EXTRA_SOURCE_CONCENTRATION

ORACLES["frequent_terms_audit"] = rf"""
    WITH toks AS (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        FROM documents),
    tot AS (SELECT count(*) AS n FROM toks),
    ex AS (
        SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
    freq AS (
        SELECT term FROM ex CROSS JOIN tot
        WHERE cnt >= CAST(floor(n * {FREQ_SUPPORT}) AS BIGINT) + 1)
    SELECT count(*) AS n_frequent,
           coalesce(array_to_string(list_sort(list(term)), ','), '')
               AS frequent_terms,
           true AS no_false_negatives
    FROM freq
"""

_COVERAGE_POINT = """
    SELECT {k} AS top_k,
           CAST(sum(CASE WHEN rank <= {k} THEN cnt END) AS BIGINT) AS covered,
           max(total_tokens) AS total_tokens
    FROM ranked
"""

ORACLES["vocab_coverage_curve"] = (
    rf"""
    WITH toks AS (
        SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        FROM documents),
    vocab AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total_tokens FROM vocab),
    ranked AS (
        SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rank,
               total_tokens
        FROM vocab CROSS JOIN tot
        ORDER BY cnt DESC, term LIMIT {max(COVERAGE_KS)}),
    curve AS ("""
    + " UNION ALL ".join(_COVERAGE_POINT.format(k=k) for k in COVERAGE_KS)
    + """)
    SELECT top_k, covered, total_tokens,
           round(covered / CAST(total_tokens AS DOUBLE), 6) AS coverage_share
    FROM curve ORDER BY top_k
"""
)

ORACLES["oov_rate"] = rf"""
    WITH toks AS (
        SELECT doc_id,
               unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS term
        FROM documents),
    vocab AS (SELECT term, count(*) AS cnt FROM toks GROUP BY 1),
    head AS (SELECT term FROM vocab
             ORDER BY cnt DESC, term LIMIT {OOV_VOCAB_K}),
    marked AS (
        SELECT t.doc_id,
               CASE WHEN h.term IS NULL THEN 1 ELSE 0 END AS oov
        FROM toks t LEFT JOIN head h ON t.term = h.term)
    SELECT doc_id, count(*) AS n_tokens,
           CAST(sum(oov) AS BIGINT) AS n_oov,
           round(CAST(sum(oov) AS BIGINT) / CAST(count(*) AS DOUBLE), 6)
               AS oov_share
    FROM marked GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# Count-min sketch heavy hitters
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 512
CMS_TOP_K = 25


def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) term-count estimates
    for the corpus's true top-``CMS_TOP_K`` terms, with the exact counts and
    the sketch's overestimate alongside.

    Complements ``frequent_terms_sketch`` (Karp membership, no counts): the
    CMS answers "about how often?" from CMS_DEPTH x CMS_WIDTH int64 cells —
    state that is CONSTANT in corpus size. Every hash is the engine-portable
    ``md5_int`` (functions/hashing.py), so the sketch — and therefore every
    estimate — is bit-identical in any engine: the whole operator is
    oracle-exact, no audit twin needed.

    Scale (100 TB): the sketch build is a groupBy over at most
    DEPTH*WIDTH = 2048 keys — map-side combine reduces each task's output
    to <=2048 rows regardless of token count, so the shuffle is a few KB
    per task. At that scale you would feed raw token occurrences straight
    into the bucket groupBy and point-query only a candidate set (e.g. the
    Karp sketch's); the exact per-term pass here feeds the sketch the same
    totals (mathematically identical cells) and doubles as the report's
    ground-truth column.
    """
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    counts = (
        docs.select(F.explode(toks).alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("exact_cnt"))
    )
    hashes = counts.select(
        "term",
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        (
                            md5_int(F.concat(F.lit(f"{i}:"), F.col("term")))
                            % CMS_WIDTH
                        ).alias("bucket"),
                    )
                    for i in range(CMS_DEPTH)
                ]
            )
        ).alias("h"),
    ).select("term", "exact_cnt", F.col("h.i").alias("i"), F.col("h.bucket").alias("bucket"))
    sketch = hashes.groupBy("i", "bucket").agg(F.sum("exact_cnt").alias("cell"))
    est = (
        hashes.join(sketch, ["i", "bucket"])
        .groupBy("term", "exact_cnt")
        .agg(F.min("cell").alias("cms_est"))
    )
    return (
        est.orderBy(F.desc("exact_cnt"), "term")
        .limit(CMS_TOP_K)
        .select(
            "term",
            "exact_cnt",
            "cms_est",
            (F.col("cms_est") - F.col("exact_cnt")).alias("overestimate"),
        )
        .orderBy(F.desc("exact_cnt"), "term")
    )


QUERIES["cms_heavy_hitters"] = cms_heavy_hitters

ORACLES["cms_heavy_hitters"] = rf"""
    WITH counts AS (
        SELECT term, CAST(count(*) AS BIGINT) AS exact_cnt
        FROM (SELECT unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
                  AS term
              FROM documents)
        GROUP BY term),
    hashes AS (
        SELECT term, exact_cnt, i,
               {md5_int_sql("CAST(i AS VARCHAR) || ':' || term")}
                   % {CMS_WIDTH} AS bucket
        FROM counts, LATERAL (SELECT unnest(range(0, {CMS_DEPTH})) AS i)),
    sketch AS (
        SELECT i, bucket, CAST(sum(exact_cnt) AS BIGINT) AS cell
        FROM hashes GROUP BY i, bucket),
    est AS (
        SELECT h.term, h.exact_cnt, CAST(min(s.cell) AS BIGINT) AS cms_est
        FROM hashes h JOIN sketch s USING (i, bucket)
        GROUP BY h.term, h.exact_cnt)
    SELECT term, exact_cnt, cms_est, cms_est - exact_cnt AS overestimate
    FROM (SELECT * FROM est ORDER BY exact_cnt DESC, term LIMIT {CMS_TOP_K})
    ORDER BY exact_cnt DESC, term
"""
