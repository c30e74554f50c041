"""Property-based parity: Spark text expressions vs pure-Python `re`
reference implementations over randomized inputs (SURVEY §7.2 step 5).

Alphabet is printable ASCII with PII-shaped fragments mixed in — the
operators promise parity on the corpus domain (the reference sanitizes
chat/log/doc text, reference backend/utils/logging_sanitizer.py:18-113),
not on arbitrary unicode where Java and Python regex classes diverge.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st

from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.functions.text import (
    PII_PATTERN,
    REDACTION_RULES,
    collapse_whitespace,
    contains_pii,
    redact,
    snippet,
)

_FRAGMENTS = st.sampled_from(
    [
        "user@example.com",
        "123-45-6789",
        "4111 1111 1111 1111",
        "api_key: deadbeef",
        "eyJa.eyJb.sig",
        "10.0.0.1",
        "postgres://u:p@h/db",
        " ",
        "\t",
        "word",
    ]
)
_TEXT = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=40
)
_MESSAGE = st.lists(_FRAGMENTS | _TEXT, max_size=8).map(" ".join)


def _py_redact(s: str) -> str:
    for pattern, repl in REDACTION_RULES:
        s = re.sub(pattern, repl, s)
    return s


@settings(max_examples=12, deadline=None)
@given(st.lists(_MESSAGE, min_size=1, max_size=25))
def test_redact_and_pii_match_python(spark, samples):
    df = spark.createDataFrame([(s,) for s in samples], ["raw"])
    rows = df.select(
        redact(F.col("raw")).alias("red"),
        contains_pii(F.col("raw")).alias("pii"),
    ).collect()
    for s, row in zip(samples, rows):
        assert row["red"] == _py_redact(s), repr(s)
        assert bool(row["pii"]) == (re.search(PII_PATTERN, s) is not None), repr(s)


@settings(max_examples=12, deadline=None)
@given(st.lists(_MESSAGE, min_size=1, max_size=25))
def test_collapse_and_snippet_match_python(spark, samples):
    df = spark.createDataFrame([(s,) for s in samples], ["raw"])
    rows = df.select(
        collapse_whitespace(F.col("raw"), 200).alias("c"),
        snippet(F.col("raw"), 30).alias("s"),
    ).collect()
    for s, row in zip(samples, rows):
        want_c = re.sub(r"\s+", " ", s).strip()[:200]
        assert row["c"] == want_c, repr(s)
        want_s = s[:30] + "..." if len(s) > 30 else s
        assert row["s"] == want_s, repr(s)
