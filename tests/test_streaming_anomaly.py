"""Streaming rolling z-score lane (streaming.anomaly_ingest_sink +
read_anomaly_state): per-key exact lookback-bounded tail state, causal
epoch reads, batch-equivalent scores for in-order arrival."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_scd_spark.operators.asof import anomaly_zscore
from hive_scd_spark.streaming import anomaly_ingest_sink, read_anomaly_state

LOOKBACK, MIN_HIST = 5, 3


def _rows(lo, hi):
    out = []
    for i in range(lo, hi):
        out.append(("k1", i, i, 10.0 + (i % 3)))
        out.append(("k2", i, 1000 + i, 50.0 + (i % 4) if i != 12 else 5000.0))
    return out


def _drive(spark, tmp_path, drops):
    src = tmp_path / "src"
    src.mkdir()
    out, state, ckpt = (str(tmp_path / d) for d in ("out", "state", "ckpt"))
    schema = "k string, t long, oid long, v double"
    spark.createDataFrame(drops[0], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = anomaly_ingest_sink(
        stream, out, state, ckpt, "k", "t", "v", "oid",
        lookback=LOOKBACK, min_history=MIN_HIST,
    ).start()
    try:
        q.processAllAvailable()
        for d in drops[1:]:
            spark.createDataFrame(d, schema).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))
            q.processAllAvailable()
    finally:
        q.stop()
    return out, state


def test_streaming_scores_match_batch(spark, tmp_path):
    drops = [_rows(0, 8), _rows(8, 14), _rows(14, 20)]
    out, _state = _drive(spark, tmp_path, drops)
    got = {
        (r["k"], r["oid"]): (r["n_baseline"], r["z"], r["is_anomaly"])
        for r in read_anomaly_state(spark, out, "k", "oid").collect()
    }
    all_rows = [r for d in drops for r in d]
    batch = anomaly_zscore(
        spark.createDataFrame(all_rows, "k string, t long, oid long, v double"),
        "k", "t", "v", "oid", lookback=LOOKBACK, min_history=MIN_HIST,
    )
    exp = {
        (r["k"], r["oid"]): (r["n_baseline"], r["z"], r["is_anomaly"])
        for r in batch.collect()
    }
    assert got == exp
    assert len(got) == len(all_rows)
    # the planted spike (k2 at t=12) crosses a batch boundary's state
    assert got[("k2", 1012)][2] is True


def test_replayed_epoch_rows_dedup(spark, tmp_path):
    out, _state = _drive(spark, tmp_path, [_rows(0, 6), _rows(6, 10)])
    before = sorted(map(tuple, read_anomaly_state(spark, out, "k", "oid").collect()))
    raw = spark.read.parquet(out)
    raw.filter("epoch = 1").write.mode("append").parquet(out)  # replay
    after = sorted(map(tuple, read_anomaly_state(spark, out, "k", "oid").collect()))
    assert before == after


def test_state_tail_is_lookback_bounded(spark, tmp_path):
    _out, state = _drive(spark, tmp_path, [_rows(0, 10), _rows(10, 25)])
    st = spark.read.parquet(state)
    last = st.agg(F.max("epoch").alias("e")).first()["e"]
    per_key = (
        st.filter(F.col("epoch") == last)
        .groupBy("k")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert per_key and all(r["n"] <= LOOKBACK for r in per_key)


def test_state_write_is_idempotent_under_replay(spark, tmp_path):
    """At-least-once replay of a committed epoch (ADVICE r13 high):
    delete the last checkpoint commit and restart the stream — the
    engine re-executes that epoch's state write.  Dynamic partition
    overwrite must leave the state duplicate-free and every later
    epoch's scores batch-identical."""
    import os

    drops = [_rows(0, 8), _rows(8, 14)]
    out, state = _drive(spark, tmp_path, drops)
    ckpt = str(tmp_path / "ckpt")
    commits = sorted(
        f for f in os.listdir(os.path.join(ckpt, "commits")) if f.isdigit()
    )
    os.remove(os.path.join(ckpt, "commits", commits[-1]))
    crc = os.path.join(ckpt, "commits", f".{commits[-1]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    src = str(tmp_path / "src")
    schema = "k string, t long, oid long, v double"
    stream = spark.readStream.schema(schema).parquet(src)
    q = anomaly_ingest_sink(
        stream, out, state, ckpt, "k", "t", "v", "oid",
        lookback=LOOKBACK, min_history=MIN_HIST,
    ).start()
    try:
        q.processAllAvailable()  # replays the last epoch
        spark.createDataFrame(_rows(14, 20), schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        q.processAllAvailable()  # a genuinely new epoch AFTER the replay
    finally:
        q.stop()
    st = spark.read.parquet(state)
    dup = (
        st.groupBy("epoch", "k", "t", "oid")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0, "replayed epoch appended duplicate state rows"
    got = {
        (r["k"], r["oid"]): (r["n_baseline"], r["z"], r["is_anomaly"])
        for r in read_anomaly_state(spark, out, "k", "oid").collect()
    }
    all_rows = [r for d in drops for r in d] + _rows(14, 20)
    batch = anomaly_zscore(
        spark.createDataFrame(all_rows, schema),
        "k", "t", "v", "oid", lookback=LOOKBACK, min_history=MIN_HIST,
    )
    exp = {
        (r["k"], r["oid"]): (r["n_baseline"], r["z"], r["is_anomaly"])
        for r in batch.collect()
    }
    assert got == exp


def test_late_arrival_raises(spark, tmp_path):
    """VERDICT r13 task 4: an out-of-order event (per-key (time, order)
    at or before the stored tail maximum) fails the batch loudly under
    the default on_late='error' instead of silently diverging."""
    import pytest
    from pyspark.errors import StreamingQueryException

    src = tmp_path / "src"
    src.mkdir()
    out, state, ckpt = (str(tmp_path / d) for d in ("out", "state", "ckpt"))
    schema = "k string, t long, oid long, v double"
    spark.createDataFrame(_rows(0, 8), schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = anomaly_ingest_sink(
        stream, out, state, ckpt, "k", "t", "v", "oid",
        lookback=LOOKBACK, min_history=MIN_HIST,
    ).start()
    try:
        q.processAllAvailable()
        # k1's tail max is t=7 — t=3 is late
        spark.createDataFrame(
            [("k1", 3, 99, 11.0)], schema
        ).coalesce(1).write.mode("append").parquet(str(src))
        with pytest.raises(StreamingQueryException, match="out-of-order"):
            q.processAllAvailable()
            q.awaitTermination(30)
    finally:
        q.stop()


def test_late_arrival_scores_at_arrival_when_opted_in(spark, tmp_path):
    """on_late='score' keeps the r13 weaker contract: the late row is
    scored against the history present at arrival (the tail), loudly
    documented rather than the default."""
    src = tmp_path / "src"
    src.mkdir()
    out, state, ckpt = (str(tmp_path / d) for d in ("out", "state", "ckpt"))
    schema = "k string, t long, oid long, v double"
    spark.createDataFrame(_rows(0, 8), schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = anomaly_ingest_sink(
        stream, out, state, ckpt, "k", "t", "v", "oid",
        lookback=LOOKBACK, min_history=MIN_HIST, on_late="score",
    ).start()
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            [("k1", 3, 99, 11.0)], schema
        ).coalesce(1).write.mode("append").parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()
    got = read_anomaly_state(spark, out, "k", "oid")
    assert got.filter("oid = 99").count() == 1


def test_state_retention_bounds_epochs(spark, tmp_path):
    """keep_epochs retention: old epoch partitions are deleted, the
    causal read still sees the latest complete epoch, and scores stay
    batch-identical (in-order data only ever reads the newest tail)."""
    src = tmp_path / "src"
    src.mkdir()
    out, state, ckpt = (str(tmp_path / d) for d in ("out", "state", "ckpt"))
    schema = "k string, t long, oid long, v double"
    drops = [_rows(0, 4), _rows(4, 8), _rows(8, 12), _rows(12, 16), _rows(16, 20)]
    spark.createDataFrame(drops[0], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = anomaly_ingest_sink(
        stream, out, state, ckpt, "k", "t", "v", "oid",
        lookback=LOOKBACK, min_history=MIN_HIST, keep_epochs=2,
    ).start()
    try:
        q.processAllAvailable()
        for d in drops[1:]:
            spark.createDataFrame(d, schema).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))
            q.processAllAvailable()
    finally:
        q.stop()
    st = spark.read.parquet(state)
    epochs = sorted(r["epoch"] for r in st.select("epoch").distinct().collect())
    assert len(epochs) <= 3 and max(epochs) == 4
    got = {
        (r["k"], r["oid"]): (r["n_baseline"], r["z"], r["is_anomaly"])
        for r in read_anomaly_state(spark, out, "k", "oid").collect()
    }
    all_rows = [r for d in drops for r in d]
    batch = anomaly_zscore(
        spark.createDataFrame(all_rows, schema),
        "k", "t", "v", "oid", lookback=LOOKBACK, min_history=MIN_HIST,
    )
    exp = {
        (r["k"], r["oid"]): (r["n_baseline"], r["z"], r["is_anomaly"])
        for r in batch.collect()
    }
    assert got == exp


# ---------------------------------------------------------------------------
# on_late='buffer' — bounded lateness (VERDICT r14 task 4)
# ---------------------------------------------------------------------------

L = 5


def _k1(lo, hi):
    return [("k1", i, i, 10.0 + (i % 3)) for i in range(lo, hi)]


def _drive_buffer(spark, tmp_path, drops):
    src = tmp_path / "src"
    src.mkdir()
    out, state, ckpt = (str(tmp_path / d) for d in ("out", "state", "ckpt"))
    schema = "k string, t long, oid long, v double"
    spark.createDataFrame(drops[0], schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = anomaly_ingest_sink(
        stream, out, state, ckpt, "k", "t", "v", "oid",
        lookback=LOOKBACK, min_history=MIN_HIST,
        on_late="buffer", allowed_lateness=L,
    ).start()
    try:
        q.processAllAvailable()
        for d in drops[1:]:
            spark.createDataFrame(d, schema).coalesce(1).write.mode(
                "append"
            ).parquet(str(src))
            q.processAllAvailable()
    finally:
        q.stop()
    return out, state


def test_buffer_holds_unfinalized_rows(spark, tmp_path):
    """With max event time 9 and L=5 only t <= 4 is finalized; the
    last L of events sit in the state buffer unscored (the standard
    allowed-lateness emission delay)."""
    out, state = _drive_buffer(spark, tmp_path, [_k1(0, 10)])
    got = read_anomaly_state(spark, out, "k", "oid")
    assert {r["t"] for r in got.collect()} == {0, 1, 2, 3, 4}
    st = spark.read.parquet(state)
    buffered = {r["t"] for r in st.filter("NOT __fin").collect()}
    assert buffered == {5, 6, 7, 8, 9}


def test_buffer_late_within_l_scores_batch_identical(spark, tmp_path):
    """The r14-task-4 money pin: a late event (t=7 arriving after the
    stream has seen t=9) lands INSIDE the allowed-lateness window, is
    buffered, and when the watermark passes it scores EXACTLY as the
    batch operator would have — true event-time baseline, not
    history-at-arrival."""
    drops = [
        _k1(0, 10),
        [("k1", 7, 99, 13.5)] + _k1(10, 15),  # late t=7 + progress to 14
    ]
    out, _ = _drive_buffer(spark, tmp_path, drops)
    got = {
        (r["k"], r["oid"]): (r["n_baseline"], r["z"], r["is_anomaly"])
        for r in read_anomaly_state(spark, out, "k", "oid").collect()
    }
    # finalized horizon after drop 2: km=14, t <= 9 — includes the late
    # event and the t=8/9 rows whose baselines CONTAIN it
    all_rows = drops[0] + drops[1]
    batch = anomaly_zscore(
        spark.createDataFrame(all_rows, "k string, t long, oid long, v double"),
        "k", "t", "v", "oid", lookback=LOOKBACK, min_history=MIN_HIST,
    )
    exp = {
        (r["k"], r["oid"]): (r["n_baseline"], r["z"], r["is_anomaly"])
        for r in batch.filter("t <= 9").collect()
    }
    assert got == exp
    assert ("k1", 99) in got  # the late event itself was scored


def test_buffer_beyond_l_still_raises(spark, tmp_path):
    """An arrival at-or-before the FINALIZED frontier (t=2 when t <= 4
    is already scored and emitted) is beyond what the lateness buffer
    can absorb — it must raise, not silently rewrite history."""
    import pytest
    from pyspark.errors import StreamingQueryException

    src = tmp_path / "src"
    src.mkdir()
    out, state, ckpt = (str(tmp_path / d) for d in ("out", "state", "ckpt"))
    schema = "k string, t long, oid long, v double"
    spark.createDataFrame(_k1(0, 10), schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = anomaly_ingest_sink(
        stream, out, state, ckpt, "k", "t", "v", "oid",
        lookback=LOOKBACK, min_history=MIN_HIST,
        on_late="buffer", allowed_lateness=L,
    ).start()
    try:
        q.processAllAvailable()
        spark.createDataFrame(
            [("k1", 2, 99, 11.0)], schema
        ).coalesce(1).write.mode("append").parquet(str(src))
        with pytest.raises(StreamingQueryException, match="allowed_lateness"):
            q.processAllAvailable()
            q.awaitTermination(30)
    finally:
        q.stop()


def test_buffer_mode_validation(spark, tmp_path):
    import pytest

    schema = "k string, t long, oid long, v double"
    stream = spark.readStream.schema(schema).parquet(str(tmp_path))
    args = (stream, "o", "s", "c", "k", "t", "v", "oid")
    with pytest.raises(ValueError, match="allowed_lateness > 0"):
        anomaly_ingest_sink(*args, on_late="buffer")
    with pytest.raises(ValueError, match="allowed_lateness > 0"):
        anomaly_ingest_sink(*args, on_late="buffer", allowed_lateness=0)
    with pytest.raises(ValueError, match="only applies"):
        anomaly_ingest_sink(*args, on_late="error", allowed_lateness=5)
    ts_stream = spark.readStream.schema(
        "k string, t timestamp, oid long, v double"
    ).parquet(str(tmp_path))
    with pytest.raises(NotImplementedError, match="numeric event-time"):
        anomaly_ingest_sink(
            ts_stream, "o", "s", "c", "k", "t", "v", "oid",
            on_late="buffer", allowed_lateness=5,
        )
