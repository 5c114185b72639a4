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
