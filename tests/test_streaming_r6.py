"""Round-6 streaming additions: stream-stream interval join parity."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_scd_spark.streaming import stream_interval_join


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    clicks_rows = [
        (1, "2024-01-01 00:00:00", 100),
        (1, "2024-01-01 00:20:00", 101),
        (2, "2024-01-01 00:05:00", 102),
    ]
    buys_rows = [
        (1, "2024-01-01 00:04:00", 900),  # within 10m of click 100
        (1, "2024-01-01 00:29:00", 901),  # within 10m of click 101
        (2, "2024-01-01 00:30:00", 902),  # too late for click 102
        (3, "2024-01-01 00:06:00", 903),  # no click with this key
    ]
    schema = "user_id long, ts_s string, id long"

    def mk(rows, ts_name, id_name):
        return (
            spark.createDataFrame(rows, schema)
            .select(
                "user_id",
                F.col("ts_s").cast("timestamp").alias(ts_name),
                F.col("id").alias(id_name),
            )
        )

    csrc, bsrc = tmp_path / "clicks", tmp_path / "buys"
    mk(clicks_rows, "click_ts", "click_id").coalesce(1).write.parquet(str(csrc))
    mk(buys_rows, "buy_ts", "buy_id").coalesce(1).write.parquet(str(bsrc))

    cb = spark.read.parquet(str(csrc))
    bb = spark.read.parquet(str(bsrc))
    cs = spark.readStream.schema(cb.schema).parquet(str(csrc))
    bs = spark.readStream.schema(bb.schema).parquet(str(bsrc))

    out = stream_interval_join(
        cs, bs, "user_id", left_ts="click_ts", right_ts="buy_ts",
        within="10 minutes",
    ).select("l.click_id", "r.buy_id")
    q = (
        out.writeStream.format("memory")
        .queryName("sij_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        got = {
            (r.click_id, r.buy_id)
            for r in spark.sql("SELECT * FROM sij_out").collect()
        }
    finally:
        q.stop()

    batch = stream_interval_join(
        cb, bb, "user_id", left_ts="click_ts", right_ts="buy_ts",
        within="10 minutes",
    ).select("l.click_id", "r.buy_id")
    want = {(r.click_id, r.buy_id) for r in batch.collect()}
    assert got == want == {(100, 900), (101, 901)}
