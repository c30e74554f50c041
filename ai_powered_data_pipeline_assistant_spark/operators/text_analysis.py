"""Text-analysis operators over the `documents` table: language ID, quality
scoring, token counting, fingerprinting, snippet/redaction/JSON/timestamp
scalar pipelines.

Parity targets (SURVEY §2.8): F1-F17 scalar surface — all JVM-side column
expressions (regexp/substring/concat/hash), zero Python UDFs, so the whole
pipeline stays inside whole-stage codegen and scales linearly with the scan.
Plus the training-data text ops from BASELINE.json's north star (language
ID, quality scoring, token counting, fingerprinting).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.catalog import load_table
from ai_powered_data_pipeline_assistant_spark.functions.hashing import md5_int, md5_int_sql
from ai_powered_data_pipeline_assistant_spark.functions.text import (
    redact,
    snippet,
    strip_html,
)

# n-gram-heuristic language ID: tiny stopword lists per language. On real
# text these are the highest-signal unigrams; on any corpus the argmax +
# deterministic tie-break below is reproducible in SQL.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "fr": ["le", "la", "les", "et", "est", "un", "une"],
    "es": ["el", "la", "los", "y", "es", "un", "una"],
}


def _hits(tok_col: Column, words: list[str]) -> Column:
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.array_intersect(tok_col, arr))  # distinct-hit count


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: stopword-hit argmax with fixed tie order
    (en > de > fr > es > unknown)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    d = docs.select("doc_id", "lang", toks.alias("toks"))
    for code, words in LANG_STOPWORDS.items():
        d = d.withColumn(f"hits_{code}", _hits(F.col("toks"), words))
    best = F.greatest(*[F.col(f"hits_{c}") for c in LANG_STOPWORDS])
    pred = F.when(best <= 0, F.lit("unknown"))
    for code in LANG_STOPWORDS:  # ordered dict → fixed tie-break priority
        pred = pred.when(F.col(f"hits_{code}") == best, F.lit(code))
    return d.select(
        "doc_id",
        "lang",
        *[F.col(f"hits_{c}") for c in LANG_STOPWORDS],
        pred.alias("predicted_lang"),
    )


def lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the lang-ID heuristic against the metadata
    label, with per-true-class shares — the evaluation table you publish
    next to any classifier-driven curation gate.

    Rides the lang_id projection; the matrix aggregate is
    |langs|² rows, and the class-share window runs on that tiny frame."""
    pred = lang_id(spark, sf_dir)
    conf = pred.groupBy("lang", "predicted_lang").agg(
        F.count("*").alias("n_docs")
    )
    w = Window.partitionBy("lang")
    return conf.select(
        "lang",
        "predicted_lang",
        "n_docs",
        F.round(F.col("n_docs") / F.sum("n_docs").over(w).cast("double"), 6).alias(
            "class_share"
        ),
    ).orderBy("lang", "predicted_lang")


ENTROPY_SCALE = 1_000_000


def char_trigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Shannon entropy of the character-trigram distribution —
    the randomness signal curation pipelines use to catch gibberish /
    binary-as-text (low entropy = repetitive boilerplate, implausibly high
    = random bytes).

    H = −Σ (c/n)·ln(c/n) is an order-dependent float sum in the naive
    form; here each trigram group's term c·ln(c/n) is rounded and
    int64-scaled ONCE, per-document accumulation sums integers (exact under
    any partitioning), and the final division happens identically in both
    engines — the same discipline as `unigram_logprob`. One explode + one
    (doc, trigram) groupBy + one per-doc agg."""
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    tris = F.expr(
        "transform(sequence(1, greatest(length(text) - 2, 0)), "
        "i -> substring(text, i, 3))"
    )
    occ = (
        docs.select("doc_id", F.length("text").alias("len"), tris.alias("tris"))
        .filter(F.col("len") >= 3)
        .select("doc_id", (F.col("len") - 2).alias("n"), F.explode("tris").alias("tri"))
    )
    counts = occ.groupBy("doc_id", "n", "tri").agg(F.count("*").alias("c"))
    term = (
        F.round(
            F.col("c") * F.log(F.col("c") / F.col("n").cast("double")) * ENTROPY_SCALE,
            0,
        )
        .cast("long")
        .alias("t_int")
    )
    return (
        counts.select("doc_id", "n", term)
        .groupBy("doc_id", "n")
        .agg(F.sum("t_int").alias("sum_t"))
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_trigrams"),
            F.round(
                -(F.col("sum_t") / F.lit(float(ENTROPY_SCALE))) / F.col("n"), 6
            ).alias("entropy"),
        )
        .orderBy("doc_id")
    )


def quality_expr() -> "F.Column":
    """The composite quality score as a reusable column expression over a
    `text` column (shared by quality_score and the curation pipeline)."""
    n_chars = F.length("text")
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    n_punct = n_chars - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace("text", r"[A-Z]", ""))
    punct_ratio = F.round(n_punct / n_chars.cast("double"), 6)
    upper_ratio = F.round(n_upper / n_chars.cast("double"), 6)
    return F.round(
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.5
        + (1 - punct_ratio) * 0.3
        + (1 - upper_ratio) * 0.2,
        6,
    )


# DuckDB mirror of quality_expr() (shared by the quality_score and
# curate_corpus oracles).
QUALITY_SQL = r"""round(least(len(regexp_split_to_array(trim(text), '\s+')) / 100.0, 1.0) * 0.5
      + (1 - round((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g'))) / CAST(length(text) AS DOUBLE), 6)) * 0.3
      + (1 - round((length(text) - length(regexp_replace(text, '[A-Z]', '', 'g'))) / CAST(length(text) AS DOUBLE), 6)) * 0.2, 6)"""


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality features + composite score: token count, mean word
    length, punctuation ratio, uppercase ratio — the reference's data-quality
    contract (data_tools.py:64-110) applied per-document, integer/rational
    math rounded at 6 decimals."""
    docs = load_table(spark, sf_dir, "documents")
    n_chars = F.length("text")
    n_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    n_punct = n_chars - F.length(F.regexp_replace("text", r"[^\w\s]", ""))
    n_upper = n_chars - F.length(F.regexp_replace("text", r"[A-Z]", ""))
    avg_word_len = F.round((n_chars - n_tokens + 1) / n_tokens.cast("double"), 6)
    punct_ratio = F.round(n_punct / n_chars.cast("double"), 6)
    upper_ratio = F.round(n_upper / n_chars.cast("double"), 6)
    score = quality_expr()
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        avg_word_len.alias("avg_word_len"),
        punct_ratio.alias("punct_ratio"),
        upper_ratio.alias("upper_ratio"),
        score.alias("quality"),
    )


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish subword estimate
    (word-chunk count via regex, ~chars/4 fallback blend)."""
    docs = load_table(spark, sf_dir, "documents")
    ws_tokens = F.size(F.split(F.trim("text"), r"\s+"))
    # BPE-ish: count word chunks of <=4 chars (regexp_extract_all length)
    bpe_ish = F.size(F.expr(r"regexp_extract_all(text, '\\w{1,4}', 0)"))
    return docs.select(
        "doc_id",
        ws_tokens.alias("ws_tokens"),
        bpe_ish.alias("bpe_ish_tokens"),
        F.ceil(F.length("text") / 4).cast("long").alias("char_est_tokens"),
    )


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: minimum 5-word-gram hash (winnowing-lite).

    The min-of-k-gram-hashes fingerprint is stable under small edits away
    from the minimizing window — the standard rolling-hash fingerprint trick
    with an order-independent (min) selector so it is exact cross-engine.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    grams = F.expr(
        "transform(sequence(0, size(toks) - 5), i -> concat_ws(' ', slice(toks, i + 1, 5)))"
    )
    # Docs shorter than the gram width have no fingerprint (NULL) — the
    # guard also keeps sequence() from descending and crashing slice();
    # DuckDB's ascending-only range + list_min([]) = NULL matches.
    fp = F.when(
        F.size("toks") >= 5, F.array_min(F.transform(grams, lambda g: md5_int(g)))
    )
    return docs.select("doc_id", toks.alias("toks")).select(
        "doc_id", fp.alias("fingerprint")
    )


WINNOW_K = 5  # k-gram width (words)
WINNOW_W = 4  # winnowing window (hashes per window)


def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full winnowing (Schleimer et al. 2003, public algorithm): the
    DISTINCT minima of every w-window of k-gram hashes, as a per-doc sorted
    fingerprint set — guarantees any match of length ≥ w+k-1 words shares a
    fingerprint. All array-level (transform/slice/array_min), no explode
    shuffle; one row per doc in and out."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim("text"), r"\s+")
    grams = F.expr(
        f"transform(sequence(0, size(toks) - {WINNOW_K}), "
        f"i -> concat_ws(' ', slice(toks, i + 1, {WINNOW_K})))"
    )
    empty = F.expr("CAST(array() AS array<bigint>)")
    # short-doc guards (see doc_fingerprint): no k-grams / no windows →
    # empty fingerprint set, same as DuckDB's ascending-only comprehensions
    hashes = F.when(
        F.size("toks") >= WINNOW_K, F.transform(grams, lambda g: md5_int(g))
    ).otherwise(empty)
    mins = F.expr(
        f"transform(sequence(0, size(hashes) - {WINNOW_W}), "
        f"i -> array_min(slice(hashes, i + 1, {WINNOW_W})))"
    )
    mins_guarded = F.when(F.size("hashes") >= WINNOW_W, mins).otherwise(empty)
    return (
        docs.select("doc_id", toks.alias("toks"))
        .select("doc_id", hashes.alias("hashes"))
        .select(
            "doc_id", F.array_sort(F.array_distinct(mins_guarded)).alias("fps")
        )
        # scalarized for the driver: array cells crash its canonicalizer
        .select("doc_id", F.size("fps").alias("n_fingerprints"),
                F.concat_ws(",", "fps").alias("fingerprints"))
    )


def normalize_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode canonicalization — the first step of any multilingual corpus
    pipeline: NFC normalization, accent stripping (NFD + drop combining
    marks), lowercasing, whitespace collapse. The corpus itself is ASCII, so
    the text is seeded with a deterministic accented suffix per doc (the
    redact_docs pattern) to prove the transforms fire.

    Runs as an Arrow-batched pandas UDF (unicodedata is not expressible in
    JVM column functions) — vectorized str ops per batch, no per-row Python.
    Output is the md5 of the normalized text (driver-hashable scalar) plus
    before/after lengths."""
    from pyspark.sql.functions import pandas_udf

    docs = load_table(spark, sf_dir, "documents")
    seeded = F.concat(
        F.col("text"),
        F.lit("  Café Ñandú ÜBER façade "),
        (F.col("doc_id") % 100).cast("string"),
    )

    @pandas_udf("string")
    def normalize(s: pd.Series) -> pd.Series:
        import unicodedata

        def one(t: str) -> str:
            t = unicodedata.normalize("NFC", t)
            t = "".join(
                c
                for c in unicodedata.normalize("NFD", t)
                if not unicodedata.combining(c)
            )
            return " ".join(t.lower().split())

        return s.map(one)

    return docs.select(
        "doc_id",
        F.length(seeded).alias("raw_len"),
        normalize(seeded).alias("norm"),
    ).select(
        "doc_id",
        "raw_len",
        F.length("norm").alias("norm_len"),
        F.md5("norm").alias("norm_md5"),
    )


def redact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4: redaction chain over content seeded with synthetic PII, so the
    regexes demonstrably fire (the corpus itself is clean)."""
    docs = load_table(spark, sf_dir, "documents")
    seeded = F.concat(
        F.col("text"),
        F.lit(" contact: user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com ssn 123-45-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
    )
    return docs.select(
        "doc_id", F.md5(redact(seeded)).alias("redacted_md5"), redact(seeded).alias("redacted")
    ).select("doc_id", "redacted_md5")


def snippet_truncate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: content[:200] + '...' when longer."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", snippet(F.col("text"), 200).alias("snippet"))


def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12: JSON metadata decode + aggregate over an extracted field."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("cnt"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def map_column_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 map surface: parse the JSONB-style `props` column into a typed
    map, then key lookup / cardinality / key-set — the MapType equivalent
    of the reference's metadata JSONB access. from_json with an explicit
    schema (never schema inference in the hot path)."""
    events = load_table(spark, sf_dir, "events")
    props = F.from_json("props", "map<string,string>")
    return events.select(
        "event_id",
        F.size(props).alias("n_keys"),
        # driver-facing outputs must be scalar: the correctness driver's
        # pandas canonicalizer cannot hash array cells (round-2 err)
        F.concat_ws(",", F.array_sort(F.map_keys(props))).alias("keys"),
        F.element_at(props, "k").cast("long").alias("k_value"),
    )


def timestamp_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: parse/format/convert — hour truncation + formatted string key."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.date_format("ts", "yyyy-MM-dd HH").alias("hour_key"),
            F.col("event_type"),
        )
        .agg(F.count("*").alias("cnt"))
    )


def tz_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F9: UTC → zone wall-time formatting (reference app/state_manager.py:
    186-228 converts UTC rows to the viewer's zone with cached ZoneInfo).
    Real tz database on both engines (JVM vs ICU) — formatted per-minute
    strings keyed by hour bucket."""
    events = load_table(spark, sf_dir, "events")
    ny = F.date_format(
        F.from_utc_timestamp("ts", "America/New_York"), "yyyy-MM-dd HH:mm"
    )
    tokyo = F.date_format(
        F.from_utc_timestamp("ts", "Asia/Tokyo"), "yyyy-MM-dd HH:mm"
    )
    return events.select("event_id", ny.alias("ny_time"), tokyo.alias("tokyo_time"))


def _pii_msg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministically inject PII-shaped substrings into the corpus text
    (the synthetic corpus has none) so the gates below classify non-trivially.
    The oracle applies the identical injection."""
    docs = load_table(spark, sf_dir, "documents")
    inject = (
        F.when(F.col("doc_id") % 7 == 0,
               F.concat(F.lit(" contact me at user"), F.col("doc_id").cast("string"),
                        F.lit("@example.com")))
        .when(F.col("doc_id") % 11 == 0, F.lit(" ssn 123-45-6789"))
        .when(F.col("doc_id") % 13 == 0, F.lit(" card 4111 1111 1111 1111"))
        .otherwise(F.lit(""))
    )
    return docs.select("doc_id", F.concat(F.col("text"), inject).alias("msg"))


_PII_MSG_SQL = """
    SELECT doc_id,
           text || CASE WHEN doc_id % 7 = 0
                        THEN ' contact me at user' || CAST(doc_id AS VARCHAR) || '@example.com'
                        WHEN doc_id % 11 = 0 THEN ' ssn 123-45-6789'
                        WHEN doc_id % 13 = 0 THEN ' card 4111 1111 1111 1111'
                        ELSE '' END AS msg
    FROM documents
"""

_SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_CARD_RE = r"\b(?:\d[ -]?){13,16}\b"
_PROFANITY_RE = r"(?i)\b(damn|hell|crap)\b"


def pii_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: admission-control PII predicate (reference
    backend/core/guardrails.py:8-19 — SSN/CC/email regex union blocks the
    row). Classifies each message by first matching class; the predicate is
    a pure rlike, evaluated during the scan."""
    msgs = _pii_msg(spark, sf_dir)
    cls = (
        F.when(F.col("msg").rlike(_SSN_RE), "ssn")
        .when(F.col("msg").rlike(_EMAIL_RE), "email")
        .when(F.col("msg").rlike(_CARD_RE), "card")
        .otherwise(F.lit("clean"))
    )
    return msgs.select(
        "doc_id",
        cls.alias("pii_class"),
        (cls != "clean").alias("blocked"),
    )


def profanity_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8: profanity predicate (reference backend/utils/profanity_filter.py:
    14-59 — compiled word-list union; matching rows are rejected with a
    canned answer). Word list deterministic-injected like the PII gate."""
    docs = load_table(spark, sf_dir, "documents")
    msg = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(" damn it")).otherwise(F.lit("")),
    )
    return docs.select(
        "doc_id",
        msg.rlike(_PROFANITY_RE).alias("rejected"),
    )


def html_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2: HTML strip (drop <code> blocks, all tags, unescape common
    entities, collapse whitespace — reference
    backend/services/search_clients.py:83-91 incl. the final html.unescape)
    and HTML escape (reference backend/utils/sanitization.py:38-72), both as
    regexp_replace/replace chains, no parser in the hot path."""
    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(
        F.lit("<p>"),
        F.substring("text", 1, 80),
        F.lit("</p> <code>internal = secret()</code> <b>tail</b>"
              " &amp;joined &lt;kept&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b"),
    )
    cleaned = strip_html(html)
    raw = F.concat(F.lit("a<b>&\"c\" "), F.substring("text", 1, 20))
    escaped = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.regexp_replace(raw, "&", "&amp;"), "<", "&lt;"),
            ">",
            "&gt;",
        ),
        '"',
        "&quot;",
    )
    return docs.select("doc_id", cleaned.alias("cleaned"), escaped.alias("escaped"))


def validation_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: data-quality validation predicates (reference
    backend/models/interaction.py:56-107 enum/length/regex shape checks) as
    per-rule pass/fail tallies over `orders` — one scan, all rules evaluated
    as when/rlike/isin columns, partial-aggregated map-side."""
    orders = load_table(spark, sf_dir, "orders")
    rules = {
        "status_enum": F.col("o_orderstatus").isin("O", "F", "P"),
        "price_range": (F.col("o_totalprice") > 0) & (F.col("o_totalprice") < 400000),
        "priority_shape": F.col("o_orderpriority").rlike(r"^[1-5]-[A-Z ]+$"),
        "custkey_positive": F.col("o_custkey") > 0,
    }
    checks = F.explode(
        F.array(
            *[
                F.struct(F.lit(name).alias("rule"), cond.alias("passed"))
                for name, cond in rules.items()
            ]
        )
    ).alias("chk")
    return (
        orders.select(checks)
        .select("chk.rule", "chk.passed")
        .groupBy("rule")
        .agg(
            F.sum(F.when(F.col("passed"), 1).otherwise(0)).alias("pass_cnt"),
            F.sum(F.when(F.col("passed"), 0).otherwise(1)).alias("fail_cnt"),
        )
    )


def enum_rank_maps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F15/F16: enum→rank and enum→emoji literal maps (reference
    app/state_manager.py:28-33, :260-274) as when/otherwise projections
    feeding a grouped count — the status-priority sort-rank map the UI uses."""
    orders = load_table(spark, sf_dir, "orders")
    rank = (
        F.when(F.col("o_orderstatus") == "O", 1)
        .when(F.col("o_orderstatus") == "F", 2)
        .otherwise(3)
    )
    emoji = (
        F.when(F.col("o_orderpriority") == "1-URGENT", "🔴")
        .when(F.col("o_orderpriority") == "2-HIGH", "🟠")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "🟡")
        .when(F.col("o_orderpriority") == "5-LOW", "🟢")
        .otherwise("⚪")
    )
    return (
        orders.groupBy(
            F.col("o_orderstatus").alias("status"),
            rank.alias("status_rank"),
            emoji.alias("priority_emoji"),
        )
        .agg(F.count("*").alias("cnt"))
    )


ORACLES: dict[str, str] = {
    "lang_id": None,  # filled below (generated)
    "pii_gate": f"""
        WITH msgs AS ({_PII_MSG_SQL})
        SELECT doc_id,
               CASE WHEN regexp_matches(msg, '{_SSN_RE}') THEN 'ssn'
                    WHEN regexp_matches(msg, '{_EMAIL_RE}') THEN 'email'
                    WHEN regexp_matches(msg, '{_CARD_RE}') THEN 'card'
                    ELSE 'clean' END AS pii_class,
               CASE WHEN regexp_matches(msg, '{_SSN_RE}') THEN 'ssn'
                    WHEN regexp_matches(msg, '{_EMAIL_RE}') THEN 'email'
                    WHEN regexp_matches(msg, '{_CARD_RE}') THEN 'card'
                    ELSE 'clean' END <> 'clean' AS blocked
        FROM msgs
    """,
    "profanity_gate": f"""
        SELECT doc_id,
               regexp_matches(
                   text || CASE WHEN doc_id % 5 = 0 THEN ' damn it' ELSE '' END,
                   '{_PROFANITY_RE}') AS rejected
        FROM documents
    """,
    "html_clean": r"""
        WITH built AS (
            SELECT doc_id,
                   '<p>' || substr(text, 1, 80) ||
                   '</p> <code>internal = secret()</code> <b>tail</b>' ||
                   ' &amp;joined &lt;kept&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b' AS html,
                   'a<b>&"c" ' || substr(text, 1, 20) AS raw
            FROM documents)
        SELECT doc_id,
               trim(regexp_replace(
                    replace(replace(replace(replace(replace(replace(
                        regexp_replace(regexp_replace(html,
                            '(?s)<code>.*?</code>', ' ', 'g'),
                            '<[^>]+>', ' ', 'g'),
                        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
                        '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&'),
                    '\s+', ' ', 'g')) AS cleaned,
               regexp_replace(regexp_replace(regexp_replace(regexp_replace(raw,
                    '&', '&amp;', 'g'),
                    '<', '&lt;', 'g'),
                    '>', '&gt;', 'g'),
                    '"', '&quot;', 'g') AS escaped
        FROM built
    """,
    "validation_rules": """
        WITH checks AS (
            SELECT 'status_enum' AS rule, o_orderstatus IN ('O','F','P') AS passed FROM orders
            UNION ALL
            SELECT 'price_range', o_totalprice > 0 AND o_totalprice < 400000 FROM orders
            UNION ALL
            SELECT 'priority_shape', regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$') FROM orders
            UNION ALL
            SELECT 'custkey_positive', o_custkey > 0 FROM orders)
        SELECT rule,
               CAST(sum(CASE WHEN passed THEN 1 ELSE 0 END) AS BIGINT) AS pass_cnt,
               CAST(sum(CASE WHEN passed THEN 0 ELSE 1 END) AS BIGINT) AS fail_cnt
        FROM checks GROUP BY rule
    """,
    "enum_rank_maps": """
        SELECT o_orderstatus AS status,
               CASE WHEN o_orderstatus = 'O' THEN 1
                    WHEN o_orderstatus = 'F' THEN 2 ELSE 3 END AS status_rank,
               CASE WHEN o_orderpriority = '1-URGENT' THEN '🔴'
                    WHEN o_orderpriority = '2-HIGH' THEN '🟠'
                    WHEN o_orderpriority = '3-MEDIUM' THEN '🟡'
                    WHEN o_orderpriority = '5-LOW' THEN '🟢'
                    ELSE '⚪' END AS priority_emoji,
               count(*) AS cnt
        FROM orders GROUP BY 1, 2, 3
    """,
    "quality_score": r"""
        SELECT doc_id,
               len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
               round((length(text) - len(regexp_split_to_array(trim(text), '\s+')) + 1)
                     / CAST(len(regexp_split_to_array(trim(text), '\s+')) AS DOUBLE), 6) AS avg_word_len,
               round((length(text) - length(regexp_replace(text, '[^\w\s]', '', 'g')))
                     / CAST(length(text) AS DOUBLE), 6) AS punct_ratio,
               round((length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))
                     / CAST(length(text) AS DOUBLE), 6) AS upper_ratio,
               """ + QUALITY_SQL + """ AS quality
        FROM documents
    """,
    "token_stats": """
        SELECT doc_id,
               len(string_split(trim(text), ' ')) AS ws_tokens,
               len(regexp_extract_all(text, '\\w{1,4}', 0)) AS bpe_ish_tokens,
               CAST(ceil(length(text) / 4.0) AS BIGINT) AS char_est_tokens
        FROM documents
    """,
    "doc_fingerprint": rf"""
        SELECT doc_id,
               list_min([{md5_int_sql("array_to_string(toks[i:i+4], ' ')")}
                         for i in range(1, len(toks) - 3)]) AS fingerprint
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks FROM documents)
    """,
    "map_column_ops": """
        SELECT event_id,
               len(json_keys(props)) AS n_keys,
               array_to_string(list_sort(json_keys(props)), ',') AS keys,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
        FROM events
    """,
    "winnow_fingerprints": f"""
        SELECT doc_id, len(fps) AS n_fingerprints,
               array_to_string(fps, ',') AS fingerprints
        FROM (
          SELECT doc_id,
                 list_sort(list_distinct(
                     [list_min(hashes[i:i+{WINNOW_W - 1}])
                      for i in range(1, len(hashes) - {WINNOW_W - 2})])) AS fps
          FROM (
            SELECT doc_id,
                   [{md5_int_sql("array_to_string(toks[i:i+" + str(WINNOW_K - 1) + "], ' ')")}
                    for i in range(1, len(toks) - {WINNOW_K - 2})] AS hashes
            FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks FROM documents)))
    """,
    "normalize_text": r"""
        SELECT doc_id,
               length(seeded) AS raw_len,
               length(norm) AS norm_len,
               md5(norm) AS norm_md5
        FROM (
            SELECT doc_id, seeded,
                   regexp_replace(trim(lower(strip_accents(nfc_normalize(seeded)))),
                                  '\s+', ' ', 'g') AS norm
            FROM (SELECT doc_id,
                         text || '  Café Ñandú ÜBER façade '
                              || CAST(doc_id % 100 AS VARCHAR) AS seeded
                  FROM documents))
    """,
    "redact_docs": None,  # filled below (generated from REDACTION_RULES)
    "snippet_truncate": """
        SELECT doc_id,
               CASE WHEN length(text) > 200 THEN substr(text, 1, 200) || '...'
                    ELSE text END AS snippet
        FROM documents
    """,
    "json_extract_agg": """
        SELECT event_type, count(*) AS cnt,
               CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
               min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
               max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
        FROM events GROUP BY 1
    """,
    "timestamp_buckets": """
        SELECT strftime(ts, '%Y-%m-%d %H') AS hour_key, event_type, count(*) AS cnt
        FROM events GROUP BY 1, 2
    """,
    # timezone(tz, TIMESTAMP) → TIMESTAMPTZ (interpret naive as tz);
    # timezone(tz, TIMESTAMPTZ) → naive wall time in tz. Nesting makes the
    # conversion independent of the DuckDB session TimeZone.
    "tz_convert": """
        SELECT event_id,
               strftime(timezone('America/New_York', timezone('UTC', ts)), '%Y-%m-%d %H:%M') AS ny_time,
               strftime(timezone('Asia/Tokyo', timezone('UTC', ts)), '%Y-%m-%d %H:%M') AS tokyo_time
        FROM events
    """,
}


def _lang_id_sql() -> str:
    hit_cols = []
    for code, words in LANG_STOPWORDS.items():
        arr = ", ".join(f"'{w}'" for w in words)
        hit_cols.append(f"len(list_intersect(toks, [{arr}])) AS hits_{code}")
    best = "greatest(" + ", ".join(f"hits_{c}" for c in LANG_STOPWORDS) + ")"
    pred = f"CASE WHEN {best} <= 0 THEN 'unknown' "
    for code in LANG_STOPWORDS:
        pred += f"WHEN hits_{code} = {best} THEN '{code}' "
    pred += "END"
    return f"""
        SELECT doc_id, lang, {", ".join(f"hits_{c}" for c in LANG_STOPWORDS)},
               {pred} AS predicted_lang
        FROM (
            SELECT doc_id, lang, {", ".join(hit_cols)}
            FROM (SELECT doc_id, lang, string_split(trim(lower(text)), ' ') AS toks
                  FROM documents))
    """


ORACLES["lang_id"] = _lang_id_sql()

ORACLES["char_trigram_entropy"] = f"""
    WITH occ AS (
        SELECT doc_id, length(text) - 2 AS n, substr(text, i, 3) AS tri
        FROM documents,
             LATERAL (SELECT unnest(range(1, greatest(length(text) - 2, 0) + 1))
                      AS i)
        WHERE length(text) >= 3),
    counts AS (
        SELECT doc_id, n, tri, count(*) AS c FROM occ GROUP BY 1, 2, 3),
    terms AS (
        SELECT doc_id, n,
               CAST(round(c * ln(c / CAST(n AS DOUBLE)) * {ENTROPY_SCALE}, 0)
                    AS BIGINT) AS t_int
        FROM counts)
    SELECT doc_id, CAST(n AS BIGINT) AS n_trigrams,
           round(-(CAST(sum(t_int) AS BIGINT) / {ENTROPY_SCALE}.0) / n, 6)
               AS entropy
    FROM terms GROUP BY doc_id, n ORDER BY doc_id
"""

ORACLES["lang_confusion"] = f"""
    WITH pred AS ({_lang_id_sql()}),
    conf AS (
        SELECT lang, predicted_lang, count(*) AS n_docs
        FROM pred GROUP BY 1, 2)
    SELECT lang, predicted_lang, n_docs,
           round(n_docs / CAST(CAST(sum(n_docs) OVER (PARTITION BY lang)
                                    AS BIGINT) AS DOUBLE), 6) AS class_share
    FROM conf ORDER BY lang, predicted_lang
"""


def _redact_docs_sql() -> str:
    """The same ordered redaction chain in DuckDB (RE2). The rule set uses
    no feature where Java and RE2 diverge (no backrefs/lookaround), so the
    chain is oracle-checkable after all; pytest additionally verifies both
    against Python `re`."""
    from ai_powered_data_pipeline_assistant_spark.functions.text import REDACTION_RULES

    expr = (
        "text || ' contact: user' || CAST(doc_id AS VARCHAR) || "
        "'@example.com ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
    )
    for pat, rep in REDACTION_RULES:
        expr = "regexp_replace({e}, '{p}', '{r}', 'g')".format(
            e=expr, p=pat.replace("'", "''"), r=rep
        )
    return f"SELECT doc_id, md5({expr}) AS redacted_md5 FROM documents"


ORACLES["redact_docs"] = _redact_docs_sql()

def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document readability profile: word/sentence/vowel-group counts
    (all integer regexp counts — JVM-side, codegen'd) and a Flesch
    reading-ease score with a coarse difficulty band — the readability gate
    of a curation pipeline (e.g. keep 'easy' prose for instruction data).

    Syllables are approximated by vowel-group count, the standard cheap
    proxy. Cross-engine exactness: the three counts are integers; the score
    is one fixed shape of exactly-rounded double ops (int/int division,
    constant multiply, subtract) that both engines evaluate bit-identically,
    then rounded to 4 decimals; the band thresholds compare the ROUNDED
    score so banding can't disagree at boundaries.
    """
    docs = load_table(spark, sf_dir, "documents")
    words = F.size(F.split(F.trim(F.col("text")), r"\s+")).cast("long")
    sentences = F.greatest(
        F.lit(1).cast("long"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(r"[.!?]+"), F.lit(0))).cast(
            "long"
        ),
    )
    vowel_groups = F.size(
        F.regexp_extract_all(F.lower(F.col("text")), F.lit("[aeiouy]+"), F.lit(0))
    ).cast("long")
    base = docs.select(
        "doc_id",
        "lang",
        words.alias("words"),
        sentences.alias("sentences"),
        vowel_groups.alias("vowel_groups"),
    )
    w_safe = F.greatest(F.lit(1).cast("long"), F.col("words"))
    fk = F.round(
        F.lit(206.835)
        - F.lit(1.015) * (F.col("words") / F.col("sentences"))
        - F.lit(84.6) * (F.col("vowel_groups") / w_safe),
        4,
    )
    scored = base.withColumn("fk_score", fk)
    band = (
        F.when(F.col("fk_score") >= 60, F.lit("easy"))
        .when(F.col("fk_score") >= 30, F.lit("medium"))
        .otherwise(F.lit("hard"))
    )
    return scored.withColumn("band", band)


ORACLES["readability_scores"] = r"""
    WITH counted AS (
        SELECT doc_id, lang,
               CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT)
                   AS words,
               greatest(1, CAST(len(regexp_extract_all(text, '[.!?]+'))
                                AS BIGINT)) AS sentences,
               CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                    AS BIGINT) AS vowel_groups
        FROM documents),
    scored AS (
        SELECT *, round(206.835
                        - 1.015 * (words / sentences)
                        - 84.6 * (vowel_groups / greatest(1, words)), 4)
                      AS fk_score
        FROM counted)
    SELECT doc_id, lang, words, sentences, vowel_groups, fk_score,
           CASE WHEN fk_score >= 60 THEN 'easy'
                WHEN fk_score >= 30 THEN 'medium'
                ELSE 'hard' END AS band
    FROM scored
"""


def lexical_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document type-token ratio (distinct tokens / tokens) — the
    lexical-diversity quality signal (low TTR = repetitive/templated text;
    the cheap in-plan cousin of the zlib compressibility gate). Pure array
    HOFs on the scan — `array_distinct` inside the row, no explode, no
    shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    n = F.size(toks).cast("long")
    d = F.size(F.array_distinct(toks)).cast("long")
    return docs.select(
        "doc_id",
        n.alias("n_tokens"),
        d.alias("n_distinct"),
        F.round(d / n.cast("double"), 6).alias("ttr"),
    ).orderBy("doc_id")


ORACLES["lexical_diversity"] = r"""
    WITH t AS (
        SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS a
        FROM documents)
    SELECT doc_id,
           CAST(len(a) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(a)) AS BIGINT) AS n_distinct,
           round(CAST(len(list_distinct(a)) AS BIGINT)
                 / CAST(len(a) AS DOUBLE), 6) AS ttr
    FROM t ORDER BY doc_id
"""


LANG_SHARE_DRIFT = 0.05  # flag languages whose corpus share moved ≥ 5 pts


def corpus_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-composition drift: per-language document share in the first
    half of the corpus (by doc_id — in production: the previous ingest
    window) vs the second, flagging languages whose share moved by
    LANG_SHARE_DRIFT or more — the mix-shift alarm that catches a broken
    source or a crawler drifting into one language. Integer counts, shares
    rounded to 6 dp before the threshold compare."""
    docs = load_table(spark, sf_dir, "documents")
    n_total = docs.count()
    half = n_total // 2
    counts = (
        docs.select(
            (F.col("doc_id") >= half).cast("int").alias("cohort"), "lang"
        )
        .groupBy("lang")
        .agg(
            F.sum(F.when(F.col("cohort") == 0, 1).otherwise(0)).alias("n_old"),
            F.sum(F.when(F.col("cohort") == 1, 1).otherwise(0)).alias("n_new"),
        )
    )
    whole = Window.partitionBy()
    share_old = F.round(F.col("n_old") / F.sum("n_old").over(whole).cast("double"), 6)
    share_new = F.round(F.col("n_new") / F.sum("n_new").over(whole).cast("double"), 6)
    return counts.select(
        "lang",
        F.col("n_old").cast("long").alias("n_old"),
        F.col("n_new").cast("long").alias("n_new"),
        share_old.alias("share_old"),
        share_new.alias("share_new"),
        (F.abs(share_new - share_old) >= LANG_SHARE_DRIFT).alias("shifted"),
    ).orderBy("lang")


ORACLES["corpus_drift_report"] = f"""
    WITH h AS (SELECT count(*) // 2 AS half FROM documents),
    counts AS (
        SELECT lang,
               CAST(sum(CASE WHEN doc_id < half THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_old,
               CAST(sum(CASE WHEN doc_id >= half THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_new
        FROM documents CROSS JOIN h GROUP BY 1)
    SELECT lang, n_old, n_new,
           round(n_old / CAST(CAST(sum(n_old) OVER () AS BIGINT) AS DOUBLE), 6)
               AS share_old,
           round(n_new / CAST(CAST(sum(n_new) OVER () AS BIGINT) AS DOUBLE), 6)
               AS share_new,
           abs(round(n_new / CAST(CAST(sum(n_new) OVER () AS BIGINT)
                                  AS DOUBLE), 6)
               - round(n_old / CAST(CAST(sum(n_old) OVER () AS BIGINT)
                                    AS DOUBLE), 6)) >= {LANG_SHARE_DRIFT}
               AS shifted
    FROM counts ORDER BY lang
"""


QUALITY_BAND_EDGES = (0.4, 0.6, 0.8)


def quality_bands_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation observability: per-language document counts in fixed
    quality-score bands — the view that shows WHERE a quality threshold
    will cut (a lang whose mass sits under the gate is about to vanish
    from the corpus). One map-side-combined groupBy over a banded column
    expression; band edges compare the 4-dp-rounded shared quality score
    so both engines band identically."""
    docs = load_table(spark, sf_dir, "documents")
    q = F.round(quality_expr(), 4)
    lo, mid, hi = QUALITY_BAND_EDGES
    band = (
        F.when(q < lo, F.lit("0_low"))
        .when(q < mid, F.lit("1_mid"))
        .when(q < hi, F.lit("2_good"))
        .otherwise(F.lit("3_high"))
    )
    return (
        docs.select("lang", band.alias("band"))
        .groupBy("lang", "band")
        .agg(F.count("*").alias("n_docs"))
        .orderBy("lang", "band")
    )


def _quality_bands_sql() -> str:
    lo, mid, hi = QUALITY_BAND_EDGES
    return f"""
        WITH q AS (SELECT lang, round({QUALITY_SQL}, 4) AS qs FROM documents)
        SELECT lang,
               CASE WHEN qs < {lo} THEN '0_low'
                    WHEN qs < {mid} THEN '1_mid'
                    WHEN qs < {hi} THEN '2_good'
                    ELSE '3_high' END AS band,
               count(*) AS n_docs
        FROM q GROUP BY 1, 2 ORDER BY 1, 2
    """


ORACLES["quality_bands_by_lang"] = _quality_bands_sql()


QUERIES = {
    "lang_id": lang_id,
    "readability_scores": readability_scores,
    "lexical_diversity": lexical_diversity,
    "quality_bands_by_lang": quality_bands_by_lang,
    "corpus_drift_report": corpus_drift_report,
    "normalize_text": normalize_text,
    "lang_confusion": lang_confusion,
    "char_trigram_entropy": char_trigram_entropy,
    "quality_score": quality_score,
    "token_stats": token_stats,
    "doc_fingerprint": doc_fingerprint,
    "winnow_fingerprints": winnow_fingerprints,
    "map_column_ops": map_column_ops,
    "redact_docs": redact_docs,
    "snippet_truncate": snippet_truncate,
    "json_extract_agg": json_extract_agg,
    "timestamp_buckets": timestamp_buckets,
    "tz_convert": tz_convert,
    "pii_gate": pii_gate,
    "profanity_gate": profanity_gate,
    "html_clean": html_clean,
    "validation_rules": validation_rules,
    "enum_rank_maps": enum_rank_maps,
}
