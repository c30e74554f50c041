"""Hand-computed edge cases for the repetition-profile operators — parity
with DuckDB is covered by test_oracle_parity; these pin the semantics on
inputs the test corpus may not contain (single token, all-same tokens,
exactly-k tokens)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.operators.repetition import _GRAMS_EXPR


def _profile(spark, text: str) -> dict[tuple[int], tuple]:
    df = (
        spark.createDataFrame([(1, text)], "doc_id long, text string")
        .select("doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t"))
        .select("doc_id", F.explode(F.expr(_GRAMS_EXPR)).alias("g"))
        .select("doc_id", "g.gram_n", "g.gram")
        .groupBy("gram_n", "gram")
        .count()
    )
    rows = df.collect()
    out: dict[int, dict[str, int]] = {}
    for r in rows:
        out.setdefault(r["gram_n"], {})[r["gram"]] = r["count"]
    return out


def test_single_token_doc_has_only_unigram(spark):
    prof = _profile(spark, "hello")
    assert prof == {1: {"hello": 1}}


def test_two_token_doc_has_one_bigram_no_trigram(spark):
    prof = _profile(spark, "a b")
    assert prof[1] == {"a": 1, "b": 1}
    assert prof[2] == {"a b": 1}
    assert 3 not in prof


def test_all_same_tokens_fully_duplicated(spark):
    prof = _profile(spark, "x x x x")
    assert prof[1] == {"x": 4}
    assert prof[2] == {"x x": 3}
    assert prof[3] == {"x x x": 2}


def test_case_folding_merges_tokens(spark):
    prof = _profile(spark, "The the THE")
    assert prof[1] == {"the": 3}


def test_zlib_ratio_separates_repetitive_from_entropy(spark):
    """The compressibility signal must order text by information density:
    pure repetition << natural-ish prose < high-entropy noise, all in
    (0, 1.2]."""
    import random

    from pyspark.sql import functions as F

    from ai_powered_data_pipeline_assistant_spark.operators.scoring import (
        zlib_ratio_udf,
    )

    rng = random.Random(7)
    noise = "".join(chr(rng.randrange(33, 127)) for _ in range(2000))
    prose = ("the quick brown fox jumps over the lazy dog and then "
             "inspects a fence post before wandering off to the river ") * 8
    rep = "spam ham " * 250
    df = spark.createDataFrame(
        [("rep", rep), ("prose", prose), ("noise", noise)], "kind string, text string"
    )
    rows = {
        r["kind"]: r["r"]
        for r in df.select("kind", zlib_ratio_udf()("text").alias("r")).collect()
    }
    assert 0 < rows["rep"] < rows["prose"] < rows["noise"] <= 1.2, rows
    assert rows["rep"] < 0.35  # would be flagged repetitive
