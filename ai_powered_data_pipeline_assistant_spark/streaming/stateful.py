"""Custom stateful streaming operators via applyInPandasWithState.

The reference keeps two pieces of hand-rolled mutable state:
- a request_id "seen map" with a 300 s TTL (duplicate suppression,
  reference backend/services/pubnub_job_processor.py:302-322);
- per-key sliding-window request timestamps for rate limiting
  (reference backend/core/guardrails.py:23-37).

`dropDuplicatesWithinWatermark` covers the first natively (streaming/jobs.py);
this module shows the GENERAL escape hatch for stateful logic Spark has no
built-in for: `applyInPandasWithState` with per-group state + processing-time
timeout, the Structured Streaming replacement for the reference's dict+lock.

State design for scale: state is per group key and lives in the state store
(RocksDB on a real cluster), so memory is bounded by (live keys × state row),
not by stream length; the TTL timeout evicts idle keys exactly like the
reference's periodic seen-map sweep.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TTL_MS = 300_000  # reference: 300 s duplicate-suppression window

DEDUP_OUTPUT_SCHEMA = StructType(
    [
        StructField("request_id", StringType()),
        StructField("first_ts", TimestampType()),
        StructField("accepted", LongType()),
        StructField("suppressed", LongType()),
    ]
)

DEDUP_STATE_SCHEMA = StructType(
    [
        StructField("first_ts_micros", LongType()),
        StructField("accepted", LongType()),
        StructField("suppressed", LongType()),
    ]
)


def _dedup_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-request_id TTL state: first arrival is accepted, later arrivals
    within the TTL are counted as suppressed; timeout clears the key."""
    if state.hasTimedOut:
        state.remove()
        return
    rows = pd.concat(list(pdfs), ignore_index=True)
    n = len(rows)
    min_ts = rows["ts"].min()
    if state.exists:
        first_micros, accepted, suppressed = state.get
        suppressed += n
    else:
        first_micros = int(min_ts.value // 1_000)  # pandas ns → micros
        accepted, suppressed = 1, n - 1
    state.update((first_micros, accepted, suppressed))
    state.setTimeoutDuration(TTL_MS)
    yield pd.DataFrame(
        {
            "request_id": [key[0]],
            "first_ts": [pd.Timestamp(first_micros * 1_000)],
            "accepted": [accepted],
            "suppressed": [suppressed],
        }
    )


def ttl_dedup_state(requests: DataFrame) -> DataFrame:
    """T3 as a CUSTOM stateful operator: per-request_id seen-state with a
    processing-time TTL, emitting accept/suppress tallies per update.

    Input must be a streaming frame with (request_id string, ts timestamp).
    """
    return (
        requests.groupBy("request_id")
        .applyInPandasWithState(
            _dedup_fn,
            outputStructType=DEDUP_OUTPUT_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


TREND_HALF_LIFE_S = 3600  # score halves every hour of event time
TREND_THRESHOLD = 50.0

TREND_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("batch_count", LongType()),
        StructField("decayed_score", StringType()),  # fixed 4-dp decimal str
        StructField("trending", BooleanType()),
    ]
)

TREND_STATE_SCHEMA = StructType(
    [
        StructField("last_micros", LongType()),
        StructField("score_1e4", LongType()),  # fixed-point ×10⁴
    ]
)


def _trend_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Half-life decayed counter (the HN/Reddit trending primitive): on
    each batch the stored score decays by 0.5^(Δt/half_life) in EVENT time,
    then the batch count is added. State is two int64s per key — bounded
    regardless of stream length; the decay uses the max event ts so
    replayed batches age the score identically."""
    if state.hasTimedOut:
        state.remove()
        return
    rows = pd.concat(list(pdfs), ignore_index=True)
    n = len(rows)
    batch_max_micros = int(rows["ts"].max().value // 1_000)
    if state.exists:
        last_micros, score_1e4 = state.get
        dt_s = max(0, batch_max_micros - last_micros) / 1_000_000
        decay = 0.5 ** (dt_s / TREND_HALF_LIFE_S)
        score = score_1e4 / 1e4 * decay + n
        last_micros = max(last_micros, batch_max_micros)
    else:
        score = float(n)
        last_micros = batch_max_micros
    state.update((last_micros, int(round(score * 1e4))))
    state.setTimeoutDuration(TREND_HALF_LIFE_S * 4 * 1000)
    yield pd.DataFrame(
        {
            "event_type": [key[0]],
            "batch_count": [n],
            "decayed_score": [f"{score:.4f}"],
            "trending": [score > TREND_THRESHOLD],
        }
    )


def trending_counter_state(events: DataFrame) -> DataFrame:
    """Per-event-type half-life decayed activity score over a stream of
    (event_type string, ts timestamp) — burst detection that forgets old
    traffic exponentially instead of holding a timestamp list (contrast
    `sliding_rate_limit_state`: O(1) state vs O(window) state)."""
    return (
        events.groupBy("event_type")
        .applyInPandasWithState(
            _trend_fn,
            outputStructType=TREND_OUTPUT_SCHEMA,
            stateStructType=TREND_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


FUNNEL_STAGES = ("view", "click", "purchase")  # keep = operators/behavior.py

FUNNEL_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("s1_view", BooleanType()),
        StructField("s2_click", BooleanType()),
        StructField("s3_purchase", BooleanType()),
    ]
)

FUNNEL_STATE_SCHEMA = StructType(
    [
        StructField("min_view", LongType()),
        StructField("min_click", LongType()),
        StructField("min_purchase", LongType()),
    ]
)


def _funnel_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Incremental first-touch funnel: the state is each stage's earliest
    event time (three int64 micros, -1 = unseen) — the exact sufficient
    statistic of the batch operator's conditional-min formulation, so the
    streaming verdict equals the batch verdict on the same events no
    matter how they are micro-batched."""
    if state.hasTimedOut:
        state.remove()
        return
    rows = pd.concat(list(pdfs), ignore_index=True)
    mins = list(state.get) if state.exists else [-1, -1, -1]
    for i, stage in enumerate(FUNNEL_STAGES):
        sub = rows[rows["event_type"] == stage]
        if len(sub):
            batch_min = int(sub["ts"].min().value // 1_000)
            mins[i] = batch_min if mins[i] < 0 else min(mins[i], batch_min)
    state.update(tuple(mins))
    state.setTimeoutDuration(24 * 3600 * 1000)
    s1 = mins[0] >= 0
    s2 = s1 and mins[1] >= 0 and mins[1] >= mins[0]
    s3 = s2 and mins[2] >= 0 and mins[2] >= mins[1]
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "s1_view": [s1],
            "s2_click": [s2],
            "s3_purchase": [s3],
        }
    )


def funnel_conversion_state(events: DataFrame) -> DataFrame:
    """Real-time funnel tracking over (user_id long, event_type string,
    ts timestamp): per-user first-touch stage verdicts maintained
    incrementally — the streaming twin of `behavior.funnel_counts`, with
    per-key state bounded at three int64s."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _funnel_fn,
            outputStructType=FUNNEL_OUTPUT_SCHEMA,
            stateStructType=FUNNEL_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


RATE_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("window_count", LongType()),
        StructField("over_limit", BooleanType()),
    ]
)

RATE_STATE_SCHEMA = StructType([StructField("ts_micros_csv", StringType())])

RATE_WINDOW_MS = 60_000  # reference: trailing 60 s
RATE_LIMIT = 40  # reference: 40 req / 60 s per user (guardrails.py:40)


def _rate_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Sliding-window rate limit: keep per-user event times inside the
    trailing window, evict older ones — the reference's timestamp-list
    eviction loop (guardrails.py:28-37) as managed state."""
    if state.hasTimedOut:
        state.remove()
        return
    rows = pd.concat(list(pdfs), ignore_index=True)
    new_ts = [int(v.value // 1_000) for v in rows["ts"]]
    old: list[int] = []
    if state.exists:
        (csv,) = state.get
        old = [int(x) for x in csv.split(",") if x]
    merged = sorted(old + new_ts)
    horizon = merged[-1] - RATE_WINDOW_MS * 1_000
    live = [t for t in merged if t > horizon]
    state.update((",".join(str(t) for t in live),))
    state.setTimeoutDuration(RATE_WINDOW_MS * 2)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "window_count": [len(live)],
            "over_limit": [len(live) > RATE_LIMIT],
        }
    )


def sliding_rate_limit_state(events: DataFrame) -> DataFrame:
    """T4 as a custom stateful operator over (user_id long, ts timestamp)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _rate_fn,
            outputStructType=RATE_OUTPUT_SCHEMA,
            stateStructType=RATE_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# ------------------------------------------------------------------ CDC
CDC_DELETE_TYPE = "error"  # keep = operators/incremental.CDC_DELETE_TYPE

CDC_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("last_op", StringType()),
        StructField("last_value", DoubleType()),
        StructField("last_micros", LongType()),
        StructField("deleted", BooleanType()),
    ]
)

CDC_STATE_SCHEMA = StructType(
    [
        StructField("last_micros", LongType()),
        StructField("last_event_id", LongType()),
        StructField("last_op", StringType()),
        StructField("last_value", DoubleType()),
    ]
)


def _cdc_fn(
    key: Tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Last-writer-wins changelog state: per key, keep only the newest
    (ts, event_id) row — the exact sufficient statistic of the batch
    ``incremental.cdc_apply`` window, so the streaming materialization
    equals the batch compaction no matter how the changelog is
    micro-batched (including out-of-order and replayed batches: an older
    row can never displace a newer state). State is four scalars per key,
    bounded regardless of stream length."""
    if state.hasTimedOut:
        state.remove()
        return
    rows = pd.concat(list(pdfs), ignore_index=True)
    rows["_micros"] = rows["ts"].astype("int64") // 1_000
    top = rows.sort_values(["_micros", "event_id"]).iloc[-1]
    cand = (
        int(top["_micros"]),
        int(top["event_id"]),
        str(top["event_type"]),
        float(top["value"]),
    )
    if state.exists:
        cur = tuple(state.get)
        if (cand[0], cand[1]) > (cur[0], cur[1]):
            cur = cand
    else:
        cur = cand
    state.update(cur)
    state.setTimeoutDuration(24 * 3600 * 1000)
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "last_op": [cur[2]],
            "last_value": [cur[3]],
            "last_micros": [cur[0]],
            "deleted": [cur[2] == CDC_DELETE_TYPE],
        }
    )


def cdc_latest_state(events: DataFrame) -> DataFrame:
    """Streaming twin of ``incremental.cdc_apply``: materialized
    latest-state view of a keyed changelog over (user_id long, event_id
    long, event_type string, value double, ts timestamp); tombstones are
    emitted as ``deleted`` rows so a downstream sink can drop them."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _cdc_fn,
            outputStructType=CDC_OUTPUT_SCHEMA,
            stateStructType=CDC_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# ---------------------------------------------- transformWithState (4.x)
def running_type_counter(events: DataFrame) -> DataFrame:
    """Cumulative per-event-type counter on the NEW Spark 4
    ``transformWithStateInPandas`` API (the successor to
    applyInPandasWithState: typed state handles — value/list/map — plus
    timers, instead of a single tuple blob). State is one int64 ValueState
    per key; each micro-batch emits the running total, so the latest row
    per key equals the batch groupBy count over everything ingested —
    pinned in tests across multi-batch ingestion (skipped where the
    sandbox's protobuf install is broken — transformWithState's state
    server speaks protobuf; the applyInPandasWithState operators above are
    the env-independent fallback with identical semantics).
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _Counter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._count = handle.getValueState("count", "n BIGINT")

        def handleInputRows(self, key, rows, timerValues):  # noqa: ANN001
            n = sum(len(pdf) for pdf in rows)
            prev = self._count.get()[0] if self._count.exists() else 0
            total = prev + n
            self._count.update((total,))
            yield pd.DataFrame(
                {"event_type": [key[0]], "total_events": [total]}
            )

        def close(self) -> None:
            pass

    return events.groupBy("event_type").transformWithStateInPandas(
        statefulProcessor=_Counter(),
        outputStructType="event_type string, total_events long",
        outputMode="Update",
        timeMode="None",
    )
