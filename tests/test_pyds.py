"""Spark 4 Python DataSource connectors: partitioned batch scan and the
offset-tracked streaming source (replay-exact)."""

from __future__ import annotations

from pyspark.sql import functions as F

from ai_powered_data_pipeline_assistant_spark.sources import pyds


def test_stackoverflow_mock_partitioned_scan(spark):
    pyds.register(spark)
    df = (
        spark.read.format("stackoverflow_mock")
        .option("pages", 3)
        .option("per_page", 10)
        .load()
    )
    assert df.count() == 30
    # one input partition per page → the scan itself is distributed
    assert df.rdd.getNumPartitions() == 3
    # deterministic content: same options → identical frame
    again = (
        spark.read.format("stackoverflow_mock")
        .option("pages", 3)
        .option("per_page", 10)
        .load()
    )
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, again.collect()))
    # pages partition the id space
    pages = {r["page"] for r in df.select("page").distinct().collect()}
    assert pages == {0, 1, 2}


def test_request_stream_mock_exactly_once(spark, tmp_path):
    pyds.register(spark)
    stream = (
        spark.readStream.format("request_stream_mock")
        .option("batch_size", 25)
        .option("max_requests", 60)
        .load()
    )
    # Python stream sources don't support Trigger.AvailableNow (Spark
    # falls back to ONE batch) — run continuous micro-batches and stop
    # once the bounded source is drained.
    q = (
        stream.withColumn("ts", F.timestamp_seconds("epoch_s"))
        .writeStream.format("memory")
        .queryName("req_stream")
        .option("checkpointLocation", str(tmp_path / "pyds_ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    import time

    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        if spark.sql("SELECT count(*) AS n FROM req_stream").first()["n"] >= 60:
            break
        time.sleep(0.5)
    q.stop()
    q.awaitTermination(30)
    rows = spark.sql("SELECT * FROM req_stream").collect()
    ids = sorted(r["request_id"] for r in rows)
    assert len(ids) == 60
    assert len(set(ids)) == 60  # no duplicates across micro-batches
    assert ids[0] == "req-0"
