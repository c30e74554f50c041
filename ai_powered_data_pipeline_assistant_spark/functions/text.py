"""Scalar text expressions — the reference's sanitize/redact/extract/
truncate surface (SURVEY §2.8), re-expressed as JVM-side column expressions
(no Python UDFs in the hot path; whole-stage codegen applies).

Reference parity targets:
- PII/sensitive-data redaction regexes: reference
  backend/utils/logging_sanitizer.py:18-113 and backend/core/guardrails.py:8-19
- snippet truncation: reference backend/services/search_service.py:200
- query cleanup (whitespace collapse + truncate): reference
  backend/utils/query_processing.py:114-122
- log-injection scrub: reference backend/utils/sanitization.py:74-114
- HTML strip: reference backend/services/search_clients.py:83-91
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Ordered (pattern, replacement) chain, mirroring the reference's redaction
# classes (email, ssn, credit card, api key, jwt, ip, db url). Order matters:
# more specific patterns run first, exactly as the reference applies them.
REDACTION_RULES: list[tuple[str, str]] = [
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b(?:\d[ -]?){13,16}\b", "<CARD>"),
    (r"(?i)(api[_-]?key|token|secret)\s*[:=]\s*\S+", "<CREDENTIAL>"),
    (r"eyJ[A-Za-z0-9_-]+\.[A-Za-z0-9_-]+\.[A-Za-z0-9_-]+", "<JWT>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"(?i)(postgres|mysql|mongodb)://\S+", "<DB_URL>"),
]

# Union PII gate (reference backend/core/guardrails.py:8-19).
PII_PATTERN = (
    r"(\b\d{3}-\d{2}-\d{4}\b"  # SSN
    r"|[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"  # email
    r"|\b(?:\d[ -]?){13,16}\b"  # credit card
    r"|AKIA[0-9A-Z]{16}"  # AWS access key
    r"|ghp_[A-Za-z0-9]{36})"  # GitHub PAT
)


def redact(col: Column) -> Column:
    """Apply the ordered redaction chain (chained regexp_replace)."""
    out = col
    for pattern, replacement in REDACTION_RULES:
        out = F.regexp_replace(out, pattern, replacement)
    return out


def contains_pii(col: Column) -> Column:
    return col.rlike(PII_PATTERN)


def scrub_log_line(col: Column) -> Column:
    """Strip newline/CR/null-byte injection chars (sanitization.py:74-114)."""
    return F.regexp_replace(col, r"[\r\n\x00]", " ")


def collapse_whitespace(col: Column, max_len: int = 200) -> Column:
    """Whitespace collapse + truncate (query_processing.py:114-122)."""
    return F.substring(F.trim(F.regexp_replace(col, r"\s+", " ")), 1, max_len)


# Common HTML entities, unescaped after tag-stripping (the reference ends
# _clean_html with html.unescape, search_clients.py:91). &amp; must be LAST:
# Python's unescape is single-pass, so "&amp;lt;" becomes "&lt;" not "<" —
# with &amp; at the end of the chain no earlier literal can re-match, giving
# the same single-pass result for this entity set.
HTML_ENTITIES: list[tuple[str, str]] = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def unescape_entities(col: Column) -> Column:
    """Literal (non-regex) replace chain for the common HTML entities."""
    out = col
    for entity, char in HTML_ENTITIES:
        out = F.replace(out, F.lit(entity), F.lit(char))
    return out


def strip_html(col: Column) -> Column:
    """Drop <code>...</code> blocks, then all tags, then unescape entities
    (search_clients.py:83-91 — BeautifulSoup get_text + html.unescape).

    Regex-based, not a full parser — sufficient for snippet shaping; the
    reference uses BeautifulSoup driver-side for the same purpose. Entities
    unescape before whitespace collapse so &nbsp; folds like any space.
    """
    no_code = F.regexp_replace(col, r"(?s)<code>.*?</code>", " ")
    no_tags = F.regexp_replace(no_code, r"<[^>]+>", " ")
    unescaped = unescape_entities(no_tags)
    return F.trim(F.regexp_replace(unescaped, r"\s+", " "))


def snippet(col: Column, max_len: int = 500) -> Column:
    """content[:max_len] + '...' when longer (search_service.py:200)."""
    return F.when(
        F.length(col) > max_len,
        F.concat(F.substring(col, 1, max_len), F.lit("...")),
    ).otherwise(col)


def tokenize(col: Column) -> Column:
    """Whitespace tokenization as an array column."""
    return F.split(F.trim(col), r"\s+")


def word_count(col: Column) -> Column:
    return F.size(tokenize(col))
