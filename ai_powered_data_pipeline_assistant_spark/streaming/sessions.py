"""Streaming session windows: gap-based user sessions over an event stream.

The batch variant (operators/windows.py `sessionize`, oracle-checked) marks
a session boundary wherever the gap to the previous event exceeds the
threshold — lag → running-sum, one shuffle. This is the streaming dual:
`session_window(ts, gap)` keeps per-key session state that extends while
events keep arriving within the gap and closes (emits, in append mode) once
the watermark passes session_end.

Parity target (SURVEY §2.9): the reference keeps per-session UI/job state
keyed by session_id with TTL expiry (reference backend/utils/caching.py:
50-214, app/client_cache.py:19-43); a gap-closed session window is the
event-time-correct generalization of that processing-time TTL.

Scale notes: state is per (key, open session) — bounded by active keys, not
history; the watermark bounds how long a session can stay open after its
last event, so state is evicted deterministically. One shuffle on the key,
exactly like the batch form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_GAP_S = 1800
DEFAULT_WATERMARK_S = 3600


def session_counts_stream(
    events: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap_s: int = DEFAULT_GAP_S,
    watermark_s: int = DEFAULT_WATERMARK_S,
) -> DataFrame:
    """Per-key session aggregation: event count + session bounds.

    Emits one row per closed session in append mode: (key, session_window
    struct, events). session_window.end is last_event_ts + gap by
    construction, so downstream session-duration math needs no extra state.
    """
    return (
        events.withWatermark(ts, f"{watermark_s} seconds")
        .groupBy(F.col(key), F.session_window(F.col(ts), f"{gap_s} seconds"))
        .agg(F.count("*").alias("events"))
    )
