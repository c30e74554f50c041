"""Unigram-LM subword tokenizer (Kudo 2018, "Subword Regularization";
the SentencePiece unigram trainer) — the second major tokenizer family
next to BPE (`operators/bpe.py`).

No reference parity row (the reference tokenizes with a fixed external
model, backend/utils/token_counting.py) — north-star training-data
extension: BPE composes merges bottom-up; the unigram model instead starts
from a LARGE candidate-piece vocabulary and prunes it under a unigram
language model, segmenting each word with Viterbi at every step. Real
pipelines ship both (SentencePiece defaults to unigram).

Algorithm, as implemented here (deterministic hard-EM variant):

1. SEED — candidate pieces = every substring of length 1..UNI_MAX_PIECE of
   the corpus vocabulary head, counted weighted by word frequency
   (Kudo seeds from the suffix array's most frequent substrings; dense
   short-substring counting is the bounded-length equivalent). Keep every
   single character (the model must stay total) plus the top
   UNI_SEED_MULTI multi-character pieces.
2. EM rounds — E-step: Viterbi-segment every vocabulary word under piece
   costs ``round(-ln(count/total) * 1e6)`` (integer micro-nats; ties
   prefer the LONGER piece); recount pieces from the chosen segmentations
   (frequency-weighted integer counts — this is the hard-EM / Viterbi-EM
   approximation of Kudo's forward-backward E-step, chosen so every count
   is an exact integer). M-step/prune: single characters persist (count
   floored to 1), multi-character pieces survive iff used >=
   UNI_MIN_COUNT times.
3. The surviving (piece, count, cost) table IS the tokenizer; encoding is
   the same Viterbi under the final costs.

Scale decomposition (mirrors bpe.py): ONE corpus pass builds the
(word, freq) vocabulary head; seeding and every EM round then run on the
VOCABULARY frame — the corpus never sees the trainer. Segmentation is a
dynamic program with dictionary lookups, which Catalyst expressions cannot
express cheaply, so it runs as an Arrow-batched pandas UDF over the
vocabulary rows (hundreds of rows across partitions — the slow-path budget
is bounded by the vocab cap, never corpus size); the piece recount is a
real distributed explode + map-side-combined groupBy. Corpus-scale token
counting (`unigram_token_counts`) broadcasts the (word -> n_pieces) map
onto the corpus word explode exactly like `bpe_token_counts`.

Determinism: counts are integers; costs are integer micro-nats computed by
ONE Python function used by both the distributed trainer and the golden
replica; Viterbi is ONE shared function (`_viterbi`) called from the
pandas UDF and the replica — `unigram_probe_audit` /
`unigram_encode_probe_audit` pin the whole distributed loop against golden
values. `unigram_seed_counts` (the corpus-scale seeding aggregation) has a
direct SQL oracle; the trained `unigram_vocab_table` over the corpus head
is rows-only (R Viterbi-EM rounds are not DuckDB-expressible).
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

from ai_powered_data_pipeline_assistant_spark.catalog import load_table
from ai_powered_data_pipeline_assistant_spark.execution import materialize
from ai_powered_data_pipeline_assistant_spark.operators.bpe import (
    BPE_VOCAB_CAP,
    _word_freqs,
)

UNI_MAX_PIECE = 4
UNI_SEED_MULTI = 150
UNI_ROUNDS = 4
UNI_MIN_COUNT = 2
COST_SCALE = 1_000_000  # integer micro-nats
# Unreachable-prefix sentinel and the unknown-character fallback cost
# (an out-of-alphabet char segments as itself at ~e^-20 probability).
_BIG = 1 << 60
_UNK_COST = 20 * COST_SCALE


def _costs(counts: dict[str, int]) -> dict[str, int]:
    """Integer micro-nat piece costs from integer counts — the ONE place a
    logarithm is taken, shared by the distributed trainer and the golden
    replica so both see bit-identical costs."""
    total = sum(counts.values())
    return {
        p: round(-math.log(c / total) * COST_SCALE) for p, c in counts.items()
    }


def _viterbi(word: str, costs: dict[str, int], max_len: int) -> list[str]:
    """Min-cost segmentation of ``word`` into vocabulary pieces; at equal
    cost the LONGER ending piece wins (deterministic). Out-of-vocabulary
    single characters fall back to _UNK_COST so the DP is total."""
    n = len(word)
    best = [0] + [_BIG] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for ln in range(1, min(max_len, i) + 1):
            prev = best[i - ln]
            if prev >= _BIG:
                continue
            piece = word[i - ln : i]
            c = costs.get(piece)
            if c is None:
                if ln != 1:
                    continue
                c = _UNK_COST
            cand = prev + c
            if cand < best[i] or (cand == best[i] and ln > back[i]):
                best[i] = cand
                back[i] = ln
    out: list[str] = []
    i = n
    while i > 0:
        out.append(word[i - back[i] : i])
        i -= back[i]
    out.reverse()
    return out


def _segment_udf(costs: dict[str, int]):
    """Arrow-batched segmentation UDF over a word column (vocabulary-scale
    only — see module docstring for the slow-path budget)."""

    @pandas_udf(ArrayType(StringType()))
    def seg(words: pd.Series) -> pd.Series:
        return words.map(lambda w: _viterbi(w, costs, UNI_MAX_PIECE))

    return seg


def _seed_pieces_expr() -> F.Column:
    """All substrings of length 1..UNI_MAX_PIECE of ``word`` — JVM-side
    nested transform, no Python."""
    return F.expr(
        "flatten(transform(sequence(1, length(word)), i -> "
        "transform(sequence(1, least({L}, length(word) - i + 1)), "
        "l -> substring(word, i, l))))".format(L=UNI_MAX_PIECE)
    )


def _seed_counts(words: DataFrame) -> DataFrame:
    """(piece, cnt): frequency-weighted dense substring counts over the
    vocabulary frame — one explode + one partial-agg groupBy."""
    return (
        words.select("freq", F.explode(_seed_pieces_expr()).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("freq").cast("long").alias("cnt"))
    )


def _seed_vocab(words: DataFrame) -> dict[str, int]:
    """Initial piece counts: every single character plus the top
    UNI_SEED_MULTI multi-character substrings by (cnt DESC, piece)."""
    counts = _seed_counts(words)
    chars = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") > 1)
        .orderBy(F.desc("cnt"), "piece")
        .limit(UNI_SEED_MULTI)
    )
    rows = chars.unionByName(multi).collect()  # vocabulary-scale (~hundreds)
    return {r["piece"]: r["cnt"] for r in rows}


def _train(
    words: DataFrame, rounds: int
) -> tuple[DataFrame, dict[str, int], dict[str, int]]:
    """Hard-EM driver loop: per round one vocabulary-scale segmentation +
    one distributed piece recount (collected — piece table rows, not
    corpus rows). Returns (materialized vocabulary frame, final counts,
    final costs) — callers encode against the returned frame so the
    corpus is never rescanned.

    The vocabulary frame is materialized ONCE at entry — without the
    barrier every round's recount action would re-run the corpus-scale
    word-frequency groupBy behind `_word_freqs` (R+1 corpus passes instead
    of the module contract's one)."""
    spark_words = materialize(words.select("word", "freq"))
    counts = _seed_vocab(spark_words)
    for _ in range(rounds):
        costs = _costs(counts)
        seg = spark_words.withColumn("pieces", _segment_udf(costs)("word"))
        recount = (
            seg.select("freq", F.explode("pieces").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .collect()  # vocabulary-scale (~hundreds of pieces)
        )
        used = {r["piece"]: r["cnt"] for r in recount}
        pruned: dict[str, int] = {}
        for p, c in counts.items():
            u = used.get(p, 0)
            if len(p) == 1:
                pruned[p] = max(u, 1)  # the alphabet must stay total
            elif u >= UNI_MIN_COUNT:
                pruned[p] = u
        counts = pruned
    return spark_words, counts, _costs(counts)


def _vocab_frame(
    spark: SparkSession, counts: dict[str, int], costs: dict[str, int]
) -> DataFrame:
    rows = [
        (p, int(c), int(costs[p]), len(p))
        for p, c in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    ]
    ranked = [(i + 1, *r) for i, r in enumerate(rows)]
    return spark.createDataFrame(
        ranked, "rank int, piece string, cnt long, cost_micronats long, n_chars int"
    ).orderBy("rank")


def unigram_seed_counts(
    spark: SparkSession, sf_dir: str, top: int = 50
) -> DataFrame:
    """The seeding aggregation over the real corpus vocabulary head: top
    dense-substring counts (frequency-weighted) — the exact-SQL-oracle
    member of the family, like `bpe_pair_counts` is for BPE."""
    words = _word_freqs(spark, sf_dir)
    counts = _seed_counts(words)
    w_top = counts.orderBy(F.desc("cnt"), "piece").limit(top)
    w = Window.orderBy(F.desc("cnt"), "piece")
    return w_top.select(
        F.row_number().over(w).alias("rank"),
        "piece",
        "cnt",
        F.length("piece").alias("n_chars"),
    ).orderBy("rank")


def unigram_vocab_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trained unigram vocabulary over the corpus head: UNI_ROUNDS
    hard-EM rounds of segment→recount→prune. Rows-only (the R-round
    Viterbi-EM is not DuckDB-expressible); trainer exactness is pinned by
    `unigram_probe_audit`'s golden replica and the seed oracle above."""
    words = _word_freqs(spark, sf_dir)
    _words, counts, costs = _train(words, UNI_ROUNDS)
    return _vocab_frame(spark, counts, costs)


def unigram_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts under the TRAINED unigram tokenizer —
    the packing/budget number, vs the whitespace word count. Encode the
    vocabulary head (one Viterbi pass over <= BPE_VOCAB_CAP words),
    broadcast (word -> n_pieces) onto the corpus word explode, aggregate
    per document; out-of-head words fall back to character tokens. Rows-
    only (trained-table dep); encode exactness is pinned by
    `unigram_encode_probe_audit`.

    Intentional row asymmetry (ADVICE r9, shared with `bpe_token_counts`):
    a document whose text normalizes to ZERO words (empty/whitespace-only)
    has no explode rows and is absent from the output — token counting
    reports the tokenizable corpus, unlike the substring accounting which
    covers every document with zeros. Consumers needing full coverage
    left-join this onto documents."""
    words = _word_freqs(spark, sf_dir)
    head, _counts, costs = _train(words, UNI_ROUNDS)
    encoded = head.select(
        "word", F.size(_segment_udf(costs)("word")).alias("n_pieces")
    )
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    doc_words = docs.select("doc_id", F.explode(toks).alias("word")).filter(
        F.length("word") > 0
    )
    joined = doc_words.join(F.broadcast(encoded), "word", "left")
    per_tok = F.coalesce(F.col("n_pieces"), F.length("word")).cast("long")
    return (
        joined.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_words"),
            F.sum(per_tok).alias("unigram_tokens"),
        )
        .orderBy("doc_id")
    )


def tokenizer_fertility_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer bake-off: per source, token fertility (tokens per
    whitespace word) under the trained BPE and unigram tokenizers — the
    standard number for choosing a tokenizer before a pretraining run
    (lower fertility = more text per context window). Integer token sums
    are primary; the ratios are display-rounded. Rows-only (depends on
    both trained tables; each trainer's exactness is pinned by its own
    probe audits).

    Cost shape: BOTH tokenizers train and encode on the SAME materialized
    vocabulary head (one corpus word-frequency pass total), and the corpus
    is exploded to (doc, source, word) exactly ONCE — the per-word piece
    counts of both tokenizers broadcast-join onto that single explode.
    Calling bpe_token_counts + unigram_token_counts separately would pay
    the corpus scan three times over. The ONLY Python boundary is the
    Viterbi pandas UDF over the ≤ BPE_VOCAB_CAP vocabulary head on the
    broadcast build side — never over the corpus-cardinality explode
    (plan-asserted in tests/test_unigram.py). Zero-word documents are
    absent (see `unigram_token_counts` — same intentional asymmetry),
    though per-SOURCE rows only vanish if a whole source is empty."""
    from ai_powered_data_pipeline_assistant_spark.operators.bpe import (
        BPE_MIN_COUNT,
        BPE_ROUNDS,
        _apply_merges,
        _chars_expr,
    )
    from ai_powered_data_pipeline_assistant_spark.operators.bpe import (
        _train as _bpe_train,
    )

    words = _word_freqs(spark, sf_dir)
    head, _counts, costs = _train(words, UNI_ROUNDS)
    uni_enc = head.select(
        "word", F.size(_segment_udf(costs)("word")).alias("uni_pieces")
    )
    bwords = head.withColumn("syms", _chars_expr())
    merges = _bpe_train(bwords, BPE_ROUNDS, BPE_MIN_COUNT)
    bpe_enc = _apply_merges(bwords, merges).select(
        "word", F.size("syms").alias("bpe_pieces")
    )
    enc = uni_enc.join(bpe_enc, "word")  # head-scale
    docs = load_table(spark, sf_dir, "documents", parallelize=True)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    doc_words = docs.select(
        "doc_id", "source", F.explode(toks).alias("word")
    ).filter(F.length("word") > 0)
    joined = doc_words.join(F.broadcast(enc), "word", "left")
    bpe_tok = F.coalesce(F.col("bpe_pieces"), F.length("word")).cast("long")
    uni_tok = F.coalesce(F.col("uni_pieces"), F.length("word")).cast("long")
    return (
        joined.groupBy("source")
        .agg(
            F.countDistinct("doc_id").cast("long").alias("n_docs"),
            F.count("*").cast("long").alias("n_words"),
            F.sum(bpe_tok).alias("bpe_tokens"),
            F.sum(uni_tok).alias("unigram_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "n_words",
            "bpe_tokens",
            "unigram_tokens",
            F.round(F.col("bpe_tokens") / F.col("n_words"), 4).alias(
                "bpe_fertility"
            ),
            F.round(F.col("unigram_tokens") / F.col("n_words"), 4).alias(
                "unigram_fertility"
            ),
        )
        .orderBy("source")
    )


# Fixed probe vocabulary: shared stems/suffixes so seeding, pruning and
# tie-breaking all exercise non-trivial paths (the BPE probe family plus
# two words that only unigram segments well).
UNI_PROBES: list[tuple[str, int]] = [
    ("low", 5),
    ("lower", 2),
    ("lowest", 2),
    ("newer", 6),
    ("newest", 3),
    ("wider", 3),
    ("winner", 2),
    ("inner", 2),
    ("widest", 2),
    ("win", 4),
]
UNI_PROBE_ROUNDS = 4


def unigram_probe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-hashable pin of the full distributed trainer: run `_train`
    (real seed explode/groupBy, real pandas-UDF Viterbi rounds, words
    across 3 partitions) over the fixed probe vocabulary and return the
    final vocab table; the oracle carries golden rows from
    `_unigram_golden`'s pure-Python replica of the same hard-EM loop. Any
    drift in seeding, cost quantization, tie-breaking, or pruning changes
    a row."""
    words = spark.createDataFrame(UNI_PROBES, "word string, freq long").repartition(3)
    _words, counts, costs = _train(words, UNI_PROBE_ROUNDS)
    return _vocab_frame(spark, counts, costs)


def _golden_seed(probes: list[tuple[str, int]]) -> dict[str, int]:
    counts: dict[str, int] = {}
    for w, f in probes:
        for i in range(len(w)):
            for ln in range(1, min(UNI_MAX_PIECE, len(w) - i) + 1):
                p = w[i : i + ln]
                counts[p] = counts.get(p, 0) + f
    chars = {p: c for p, c in counts.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[:UNI_SEED_MULTI]
    return {**chars, **dict(multi)}


def _unigram_golden(
    probes: list[tuple[str, int]], rounds: int
) -> tuple[dict[str, int], dict[str, int]]:
    """Pure-Python replica of `_train` (same _costs, same _viterbi, same
    prune rule) — the golden the probe audits pin against."""
    counts = _golden_seed(probes)
    for _ in range(rounds):
        costs = _costs(counts)
        used: dict[str, int] = {}
        for w, f in probes:
            for p in _viterbi(w, costs, UNI_MAX_PIECE):
                used[p] = used.get(p, 0) + f
        pruned: dict[str, int] = {}
        for p, c in counts.items():
            u = used.get(p, 0)
            if len(p) == 1:
                pruned[p] = max(u, 1)
            elif u >= UNI_MIN_COUNT:
                pruned[p] = u
        counts = pruned
    return counts, _costs(counts)


def _quote(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _unigram_probe_oracle() -> str:
    counts, costs = _unigram_golden(UNI_PROBES, UNI_PROBE_ROUNDS)
    rows = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    values = ",\n            ".join(
        f"({i + 1}, {_quote(p)}, CAST({c} AS BIGINT), "
        f"CAST({costs[p]} AS BIGINT), {len(p)})"
        for i, (p, c) in enumerate(rows)
    )
    return f"""
        SELECT * FROM (VALUES
            {values}
        ) AS t(rank, piece, cnt, cost_micronats, n_chars)
        ORDER BY rank
    """


def unigram_encode_probe_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden pin of the ENCODE path: train on the probe vocabulary, then
    segment the probe words through the real pandas-UDF Viterbi under the
    final costs; emit (word, n_pieces, pieces_concat). The oracle carries
    values from the pure-Python replica — catches any train-time vs
    encode-time segmentation divergence."""
    words = spark.createDataFrame(UNI_PROBES, "word string, freq long").repartition(3)
    head, _counts, costs = _train(words, UNI_PROBE_ROUNDS)
    seg = head.withColumn("pieces", _segment_udf(costs)("word"))
    return seg.select(
        "word",
        F.size("pieces").alias("n_pieces"),
        F.concat_ws("|", "pieces").alias("pieces_concat"),
    ).orderBy("word")


def _unigram_encode_oracle() -> str:
    _counts, costs = _unigram_golden(UNI_PROBES, UNI_PROBE_ROUNDS)
    rows = []
    for w, _f in sorted(UNI_PROBES):
        pieces = _viterbi(w, costs, UNI_MAX_PIECE)
        rows.append((w, len(pieces), "|".join(pieces)))
    values = ",\n            ".join(
        f"({_quote(w)}, CAST({n} AS INT), {_quote(p)})" for w, n, p in rows
    )
    return f"""
        SELECT * FROM (VALUES
            {values}
        ) AS t(word, n_pieces, pieces_concat)
        ORDER BY word
    """


def _seed_counts_oracle(top: int = 50) -> str:
    return f"""
        WITH vocab AS (
            SELECT word, count(*) AS freq FROM (
                SELECT unnest(string_split_regex(trim(lower(text)), '\\s+'))
                       AS word
                FROM documents) t
            WHERE length(word) > 0
            GROUP BY 1 ORDER BY freq DESC, word LIMIT {BPE_VOCAB_CAP}),
        pieces AS (
            SELECT substr(word, i, l) AS piece, freq
            FROM vocab,
                 LATERAL (SELECT unnest(range(1, length(word) + 1)) AS i),
                 LATERAL (SELECT unnest(range(1,
                     least({UNI_MAX_PIECE}, length(word) - i + 1) + 1)) AS l)),
        counts AS (
            SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
            FROM pieces GROUP BY 1
            ORDER BY cnt DESC, piece LIMIT {top})
        SELECT row_number() OVER (ORDER BY cnt DESC, piece) AS rank,
               piece, cnt, CAST(length(piece) AS INT) AS n_chars
        FROM counts ORDER BY rank
    """


ORACLES: dict[str, str] = {
    "unigram_seed_counts": _seed_counts_oracle(),
    "unigram_probe_audit": _unigram_probe_oracle(),
    "unigram_encode_probe_audit": _unigram_encode_oracle(),
}

QUERIES = {
    "unigram_seed_counts": unigram_seed_counts,
    "unigram_vocab_table": unigram_vocab_table,  # rows-only (R-round EM)
    "unigram_probe_audit": unigram_probe_audit,
    "unigram_token_counts": unigram_token_counts,  # rows-only (trained dep)
    "unigram_encode_probe_audit": unigram_encode_probe_audit,
    "tokenizer_fertility_report": tokenizer_fertility_report,  # rows-only
}
