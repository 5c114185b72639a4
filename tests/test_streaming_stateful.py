"""applyInPandasWithState sessionization: cross-micro-batch state."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_stateful_sessionize_across_batches(spark, tmp_path):
    from hive_scd_spark.streaming import sessionize_stream

    src = tmp_path / "ev"
    src.mkdir()
    schema = "user_id long, ts timestamp"

    def write_batch(rows):
        spark.createDataFrame(rows, "user_id long, ts_s string").select(
            "user_id", F.col("ts_s").cast("timestamp").alias("ts")
        ).coalesce(1).write.mode("append").parquet(str(src))

    # batch 1: user 1 → two events 5 min apart (one session)
    write_batch([(1, "2024-01-01 10:00:00"), (1, "2024-01-01 10:05:00")])

    stream = spark.readStream.schema(schema).parquet(str(src))
    out = sessionize_stream(stream, gap_seconds=1800)
    q = (
        out.writeStream.format("memory")
        .queryName("sess_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        r1 = {r.user_id: (r.n_sessions, r.n_events) for r in spark.sql("SELECT * FROM sess_out").collect()}
        assert r1[1] == (1, 2)

        # batch 2: 2h later (new session) + a second user — state must
        # carry the first batch's last_ts across micro-batches
        write_batch([(1, "2024-01-01 12:30:00"), (2, "2024-01-01 09:00:00")])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sess_out").collect()
        latest = {}
        for r in rows:  # memory sink in update mode appends; last write wins
            latest[r.user_id] = (r.n_sessions, r.n_events)
        assert latest[1] == (2, 3)
        assert latest[2] == (1, 1)
    finally:
        q.stop()


def test_compact_rolls_forward(spark, tmp_path):
    from hive_scd_spark.scd import compact

    dim = tmp_path / "dim"
    dim.mkdir()
    spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "id int, v double"
    ).write.mode("overwrite").parquet(str(dim))
    (dim / ".updates").write_text(
        "-- time=2024-01-01\nUPDATE d SET v = v + 1 WHERE id = 1;\n"
        "-- time=2025-01-01\nDELETE FROM d WHERE id = 2;\n"
    )
    snap = str(tmp_path / "snap")
    early = compact(spark, str(dim), snap, as_of="2024-06-01")
    assert {(r.id, r.v) for r in early.collect()} == {(1, 11.0), (2, 20.0)}
    # roll the same snapshot forward
    late = compact(spark, str(dim), snap, as_of="2025-06-01")
    assert {(r.id, r.v) for r in late.collect()} == {(1, 11.0)}
