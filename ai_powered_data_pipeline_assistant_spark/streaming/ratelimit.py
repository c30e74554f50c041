"""Sliding-window rate limiting as a streaming aggregation.

Parity target (SURVEY T4): reference backend/core/guardrails.py:23-37 and
backend/auth/mcp_rate_limiter.py:33-84 — per-key trailing-60 s counts with
eviction of old timestamps.

Streaming shape: event-time window aggregation with a watermark; a key is
"limited" in any window where its count exceeds the cap. The batch variant
uses a range-between window frame (the exact trailing-60 s count per event,
which is what the reference's sliding deque computes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RATE_LIMIT_WINDOW_S = 60
DEFAULT_LIMIT = 40  # reference: 40 req / 60 s per user (guardrails.py:40)


def sliding_counts_batch(events: DataFrame, key: str = "user_id", ts: str = "ts",
                         window_s: int = RATE_LIMIT_WINDOW_S) -> DataFrame:
    """Exact per-event trailing-window count (rangeBetween frame)."""
    w = (
        Window.partitionBy(key)
        .orderBy(F.unix_timestamp(F.col(ts)))
        .rangeBetween(-(window_s - 1), 0)
    )
    return events.withColumn("trailing_cnt", F.count("*").over(w))


def windowed_counts_stream(events: DataFrame, key: str = "user_id", ts: str = "ts",
                           window_s: int = RATE_LIMIT_WINDOW_S,
                           slide_s: int = 10) -> DataFrame:
    """Streaming sliding-window counts (watermarked event-time windows)."""
    return (
        events.withWatermark(ts, f"{2 * window_s} seconds")
        .groupBy(
            F.col(key),
            F.window(F.col(ts), f"{window_s} seconds", f"{slide_s} seconds"),
        )
        .count()
    )


def over_limit(events: DataFrame, key: str = "user_id", ts: str = "ts",
               limit: int = DEFAULT_LIMIT, window_s: int = RATE_LIMIT_WINDOW_S) -> DataFrame:
    """Keys/events exceeding the rate limit (batch form)."""
    counted = sliding_counts_batch(events, key, ts, window_s)
    return counted.filter(F.col("trailing_cnt") > limit)
