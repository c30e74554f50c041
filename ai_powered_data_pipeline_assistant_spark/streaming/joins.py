"""Stream-stream joins: watermarked interval attribution.

The canonical Structured Streaming join shape the batch engine's
``asof_join`` / ``range_join`` (operators/joins.py) answer in batch:
attribute each click to the view that preceded it within an attribution
window, with both sides unbounded streams.

State-bound contract (what makes this safe on an unbounded 100 TB/day
stream): BOTH sides carry watermarks and the join predicate carries a
two-sided event-time constraint, so the state store retains each side only
for watermark + attribution-window time — without the time bounds Spark
would buffer both streams forever. Inner joins emit as matches arrive;
left-outer emits the unmatched left row only once the watermark passes its
join window (the engine then knows no match can still arrive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WATERMARK = "120 seconds"
ATTRIBUTION_WINDOW = "interval 10 minutes"


def attribution_join_stream(
    views: DataFrame,
    clicks: DataFrame,
    how: str = "inner",
) -> DataFrame:
    """Join two event streams — (user_id, ts) views and clicks — attributing
    each click to same-user views it followed within ATTRIBUTION_WINDOW.

    ``how='leftOuter'`` additionally emits never-clicked views (null click
    columns) once their attribution window expires past the watermark.
    """
    v = views.select(
        F.col("user_id").alias("v_user"), F.col("ts").alias("view_ts")
    ).withWatermark("view_ts", WATERMARK)
    c = clicks.select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
    ).withWatermark("click_ts", WATERMARK)
    joined = v.join(
        c,
        F.expr(
            "v_user = c_user AND click_ts >= view_ts "
            f"AND click_ts <= view_ts + {ATTRIBUTION_WINDOW}"
        ),
        how,
    )
    return joined.select(
        F.col("v_user").alias("user_id"),
        "view_ts",
        "click_ts",
        (
            F.unix_micros(F.col("click_ts").cast("timestamp"))
            - F.unix_micros(F.col("view_ts").cast("timestamp"))
        ).alias("lag_us"),
    )
