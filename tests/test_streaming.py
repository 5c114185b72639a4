"""Streaming extension tests: the compiled SCD chain and windowed aggs
running under Structured Streaming (memory sink, synchronous drain)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F
from pyspark.sql import types as T


@pytest.fixture()
def dim_stream_dir(spark, tmp_path):
    d = tmp_path / "stream_src"
    d.mkdir()
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", -5.0), (3, "c", 7.0), (4, "d", -1.0)],
        "id int, name string, bal double",
    ).coalesce(1).write.mode("overwrite").parquet(str(d))
    return str(d)


def test_scd_stream_applies_statement_chain(spark, dim_stream_dir):
    from hive_scd_spark.streaming import scd_stream

    schema = T.StructType(
        [
            T.StructField("id", T.IntegerType()),
            T.StructField("name", T.StringType()),
            T.StructField("bal", T.DoubleType()),
        ]
    )
    stream = spark.readStream.schema(schema).parquet(dim_stream_dir)
    out = scd_stream(
        stream,
        "UPDATE dim SET bal = bal + 100 WHERE bal < 0;\nDELETE FROM dim WHERE id = 3;",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("scd_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        rows = {r.id: r.bal for r in spark.sql("SELECT * FROM scd_out").collect()}
    finally:
        q.stop()
    assert rows == {1: 10.0, 2: 95.0, 4: 99.0}  # 3 deleted, negatives bumped


def test_windowed_counts_stream_equals_batch(spark, tmp_path):
    from hive_scd_spark.streaming import windowed_event_counts

    src = tmp_path / "events_src"
    src.mkdir()
    rows = [
        (1, "2024-01-01 00:01:00", "click", 1.0),
        (2, "2024-01-01 00:02:00", "click", 2.0),
        (3, "2024-01-01 00:07:30", "view", 3.0),
        (4, "2024-01-01 00:08:00", "click", 4.0),
    ]
    batch = spark.createDataFrame(
        rows, "event_id long, ts_s string, event_type string, value double"
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "event_type", "value")
    batch.coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema(batch.schema).parquet(str(src))
    agg = windowed_event_counts(stream, window="5 minutes", watermark="1 minute")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_out")
        .outputMode("complete")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (str(r.window_start), r.event_type): (r.n_events, r.sum_value)
            for r in spark.sql("SELECT * FROM win_out").collect()
        }
    finally:
        q.stop()
    expect = (
        batch.groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .select(F.col("window.start").alias("ws"), "event_type", "n", "s")
    )
    want = {
        (str(r.ws), r.event_type): (r.n, r.s) for r in expect.collect()
    }
    assert got == want
    assert got[("2024-01-01 00:00:00", "click")] == (2, 3.0)


def test_scd_snapshot_sink_foreachbatch(spark, dim_stream_dir, tmp_path):
    from hive_scd_spark.streaming import scd_snapshot_sink

    schema = "id int, name string, bal double"
    stream = spark.readStream.schema(schema).parquet(dim_stream_dir)
    snap = str(tmp_path / "snapshot")
    ckpt = str(tmp_path / "ckpt")
    q = scd_snapshot_sink(
        stream, "DELETE FROM dim WHERE bal < 0;", path=snap, checkpoint=ckpt
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    out = spark.read.parquet(snap)
    assert sorted(r.id for r in out.collect()) == [1, 3]
