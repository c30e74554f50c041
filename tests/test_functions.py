"""Scalar-function parity vs Python reference implementations (the
reference's own behavior re-implemented in `re`), plus embedder determinism
and the multimodal plumbing."""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.functions.text import (
    REDACTION_RULES,
    PII_PATTERN,
    collapse_whitespace,
    contains_pii,
    redact,
    scrub_log_line,
    snippet,
    strip_html,
)

SAMPLES = [
    "plain text with nothing sensitive",
    "mail me at alice@example.com or bob.smith@corp.io today",
    "ssn 123-45-6789 and card 4111 1111 1111 1111 leak",
    "api_key: sk-abcdef123456 token=xyz secret: hunter2",
    "jwt eyJhbGciOi.eyJzdWIiOi.sflKxwRJSM here",
    "server at 192.168.0.12 and postgres://u:p@h:5432/db",
    "line\nwith\rinjection\x00chars",
    "  lots   of \t whitespace   here  ",
    "<p>hello <code>x = 1</code> &amp; <b>world</b></p>",
]


def _py_redact(s: str) -> str:
    for pattern, repl in REDACTION_RULES:
        s = re.sub(pattern, repl, s)
    return s


def test_redaction_matches_python(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["raw"])
    got = [r["red"] for r in df.select(redact(F.col("raw")).alias("red")).collect()]
    want = [_py_redact(s) for s in SAMPLES]
    assert got == want


def test_pii_gate_matches_python(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], ["raw"])
    got = [bool(r["p"]) for r in df.select(contains_pii(F.col("raw")).alias("p")).collect()]
    want = [re.search(PII_PATTERN, s) is not None for s in SAMPLES]
    assert got == want
    assert any(got), "PII gate never fired on the fixtures"


def test_scrub_and_collapse(spark):
    df = spark.createDataFrame([(SAMPLES[6],), (SAMPLES[7],)], ["raw"])
    out = df.select(
        scrub_log_line(F.col("raw")).alias("scrubbed"),
        collapse_whitespace(F.col("raw")).alias("collapsed"),
    ).collect()
    assert "\n" not in out[0]["scrubbed"] and "\x00" not in out[0]["scrubbed"]
    assert out[1]["collapsed"] == "lots of whitespace here"


def test_strip_html_and_snippet(spark):
    df = spark.createDataFrame([(SAMPLES[8],), ("x" * 600,)], ["raw"])
    out = df.select(
        strip_html(F.col("raw")).alias("clean"),
        snippet(F.col("raw"), 500).alias("snip"),
    ).collect()
    assert "code" not in out[0]["clean"] and "<" not in out[0]["clean"]
    assert out[1]["snip"].endswith("...") and len(out[1]["snip"]) == 503


def test_strip_html_unescapes_entities(spark):
    import html as pyhtml

    raw = "x &amp;amp; y &lt;tag&gt; &quot;q&quot; &#39;s&#39; a&nbsp;b"
    df = spark.createDataFrame([(raw,)], ["raw"])
    got = df.select(strip_html(F.col("raw")).alias("clean")).collect()[0]["clean"]
    # mirror the reference pipeline: tags gone, then single-pass unescape,
    # then whitespace collapse (&nbsp; is \xa0 in python, folded to ' ')
    want = re.sub(r"\s+", " ", pyhtml.unescape(raw).replace("\xa0", " ")).strip()
    assert got == want
    assert got == 'x &amp; y <tag> "q" \'s\' a b'


def test_embedder_deterministic(spark):
    from ai_powered_data_pipeline_assistant_spark.functions.embedder import (
        EMBED_DIM,
        _embed_one,
        embedding_column,
    )
    import numpy as np

    v1, v2 = _embed_one("hello world"), _embed_one("hello world")
    assert np.array_equal(v1, v2)
    assert abs(float((v1.astype("float64") ** 2).sum()) - 1.0) < 1e-5
    df = spark.createDataFrame([("a",), ("b",), ("a",)], ["text"])
    rows = df.select(embedding_column(F.col("text")).alias("e")).collect()
    assert len(rows[0]["e"]) == EMBED_DIM
    assert rows[0]["e"] == rows[2]["e"]
    assert rows[0]["e"] != rows[1]["e"]


def test_multimodal_plumbing(spark, sf_dir):
    from ai_powered_data_pipeline_assistant_spark.operators.multimodal import (
        decode_media,
        extract_features,
        media_table,
    )
    import pytest

    media = media_table(spark, sf_dir)
    assert dict(media.dtypes)["payload"] == "binary"
    feats = extract_features(spark, sf_dir).collect()
    assert len(feats) == media.count()
    assert all(f["payload_bytes"] > 0 and f["feature_dim"] == 8 for f in feats)
    with pytest.raises(NotImplementedError):
        decode_media(b"bytes", "image")


def test_resize_and_frame_sample(spark, sf_dir):
    """Multimodal resize / frame-sample plumbing: modality pruning before the
    Python stage, flatMap-shaped output, deterministic across runs."""
    from ai_powered_data_pipeline_assistant_spark.operators.multimodal import (
        _N_FRAMES,
        media_table,
        resize_images,
        sample_frames,
    )

    media = media_table(spark, sf_dir)
    n_images = media.filter(F.col("modality") == "image").count()
    n_videos = media.filter(F.col("modality") == "video").count()

    resized = resize_images(spark, sf_dir)
    r1 = sorted(tuple(r) for r in resized.collect())
    assert len(r1) == n_images
    assert all(r[1] == 32 and r[2] == 32 and 0 < r[3] <= 32 * 32 for r in r1)
    r2 = sorted(tuple(r) for r in resize_images(spark, sf_dir).collect())
    assert r1 == r2  # deterministic

    frames = sample_frames(spark, sf_dir).collect()
    assert len(frames) == n_videos * _N_FRAMES  # 1 row in → N rows out
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r)
    for rows in by_media.values():
        assert sorted(r["frame_idx"] for r in rows) == list(range(_N_FRAMES))
        offs = [r["frame_offset"] for r in sorted(rows, key=lambda r: r["frame_idx"])]
        assert offs == sorted(offs)  # evenly spaced, monotonic
