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


def test_statement_log_stream_equals_batch_at_every_asof(spark, tmp_path):
    """VERDICT r8 task 9 parity contract: DML statements split across N
    micro-batches — including one arriving LATE relative to its seq
    position — must produce, at every as-of, exactly what batch
    apply_statements produces over the whole script."""
    from hive_scd_spark.scd import apply_statements
    from hive_scd_spark.streaming import (
        read_statement_log_scd,
        statement_log_sink,
    )

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", -5.0), (3, "c", 7.0), (4, "d", -1.0)],
        "id int, name string, bal double",
    )
    stmts = [
        (1, "-- time=2014-01-01\nUPDATE dim SET bal = bal + 100 WHERE bal < 0;"),
        (2, "-- time=2014-06-01\nUPDATE dim SET name = name || '!' WHERE id % 2 = 0;"),
        (3, "-- time=2015-01-01\nDELETE FROM dim WHERE id = 3;"),
        (4, "-- time=2015-06-01\nUPDATE dim SET bal = bal * 2 WHERE name LIKE '%!';"),
    ]
    full_script = "\n".join(s for _, s in stmts)

    src = tmp_path / "stmt_src"
    src.mkdir()
    out_path = str(tmp_path / "scd_log")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema("seq long, sql string").parquet(str(src))
    q = statement_log_sink(
        stream, base, out_path, ckpt, seq_col="seq", sql_col="sql"
    ).start()
    try:
        # batch 1: seq 1 and seq 3; batch 2 delivers seq 2 LATE (its
        # position in the chain precedes seq 3) plus seq 4 — the full
        # recompile must slot it back into order
        spark.createDataFrame(
            [stmts[0], stmts[2]], "seq long, sql string"
        ).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
        spark.createDataFrame(
            [stmts[1], stmts[3]], "seq long, sql string"
        ).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()

    for as_of in (-1, "2014-03-01", "2014-12-31", "2015-03-01", None):
        want = sorted(
            map(tuple, apply_statements(base, full_script, as_of=as_of).collect())
        )
        got = sorted(
            map(
                tuple,
                read_statement_log_scd(spark, base, out_path, as_of=as_of).collect(),
            )
        )
        assert got == want, as_of
    # the maintained snapshot equals the as-of-None (current) table
    snap = sorted(map(tuple, spark.read.parquet(f"{out_path}/snapshot").collect()))
    want_now = sorted(
        map(tuple, apply_statements(base, full_script, as_of=None).collect())
    )
    assert snap == want_now
    # no log yet -> base unchanged (reference missing-.updates behavior)
    virgin = read_statement_log_scd(spark, base, str(tmp_path / "nolog"))
    assert sorted(map(tuple, virgin.collect())) == sorted(map(tuple, base.collect()))


def test_statement_log_cap_raises_actionably(spark, tmp_path):
    """VERDICT r9 task 6: the statement-log driver collect is bounded
    by max_statements — an over-limit log raises with the count remedy
    (snapshot/compact or a conscious cap raise) instead of silently
    materializing an unbounded script on the driver."""
    import pytest

    from hive_scd_spark.streaming import read_statement_log_scd

    base = spark.createDataFrame([(1, "a")], "id int, name string")
    log_dir = tmp_path / "capped" / "_statement_log"
    log_dir.mkdir(parents=True)
    stmts = [
        (i, f"-- time=2014-01-01\nUPDATE dim SET name = '{i}' WHERE id = 1;")
        for i in range(7)
    ]
    spark.createDataFrame(stmts, "seq long, sql string").write.mode(
        "append"
    ).parquet(str(log_dir))
    with pytest.raises(ValueError, match="max_statements=5"):
        read_statement_log_scd(
            spark, base, str(tmp_path / "capped"), max_statements=5
        )
    # at the exact cap it compiles fine
    out = read_statement_log_scd(
        spark, base, str(tmp_path / "capped"), max_statements=7
    )
    assert [tuple(r) for r in out.collect()] == [(1, "6")]
    with pytest.raises(ValueError, match="positive"):
        read_statement_log_scd(
            spark, base, str(tmp_path / "capped"), max_statements=0
        )
