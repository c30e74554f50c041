"""Stream-stream interval join: inner attribution matches and left-outer
emission of expired unmatched views."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.streaming.joins import (
    attribution_join_stream,
)

T0 = 1700000000


def _views(spark):
    # users 1, 2, 3 each view at t0
    return spark.createDataFrame(
        [(u, T0) for u in (1, 2, 3)], "user_id long, epoch long"
    ).select("user_id", F.timestamp_seconds("epoch").alias("ts"))


def _clicks(spark):
    # user 1 clicks in-window (+60 s), user 2 out-of-window (+3600 s),
    # user 3 never clicks
    return spark.createDataFrame(
        [(1, T0 + 60), (2, T0 + 3600)], "user_id long, epoch long"
    ).select("user_id", F.timestamp_seconds("epoch").alias("ts"))


def _run(spark, tmp_path, how, name):
    vdir, cdir = str(tmp_path / "views"), str(tmp_path / "clicks")
    views = _views(spark)
    clicks = _clicks(spark)
    views.coalesce(1).write.mode("overwrite").parquet(vdir)
    clicks.coalesce(1).write.mode("overwrite").parquet(cdir)
    if how == "leftOuter":
        # a far-future row on each side advances both watermarks so expired
        # unmatched views are emitted before the stream drains
        closer_v = spark.createDataFrame(
            [(99, T0 + 100000)], "user_id long, epoch long"
        ).select("user_id", F.timestamp_seconds("epoch").alias("ts"))
        closer_c = spark.createDataFrame(
            [(98, T0 + 100000)], "user_id long, epoch long"
        ).select("user_id", F.timestamp_seconds("epoch").alias("ts"))
        closer_v.coalesce(1).write.mode("append").parquet(vdir)
        closer_c.coalesce(1).write.mode("append").parquet(cdir)
    vs = (
        spark.readStream.schema(views.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(vdir)
    )
    cs = (
        spark.readStream.schema(clicks.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(cdir)
    )
    q = (
        attribution_join_stream(vs, cs, how=how)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_inner_attribution_matches_only_in_window(spark, tmp_path):
    rows = _run(spark, tmp_path, "inner", "attr_inner")
    assert [(r["user_id"], r["lag_us"]) for r in rows] == [(1, 60_000_000)], rows


def test_left_outer_emits_expired_unmatched_views(spark, tmp_path):
    rows = _run(spark, tmp_path, "leftOuter", "attr_outer")
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    # user 1: matched in-window
    assert [r["lag_us"] for r in by_user[1]] == [60_000_000]
    # users 2 and 3: attribution window expired with no click → null-click rows
    for u in (2, 3):
        assert len(by_user[u]) == 1 and by_user[u][0]["click_ts"] is None, rows
