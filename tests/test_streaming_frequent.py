"""Streaming frequent-items maintenance (streaming.frequent_ingest_sink
+ read_frequent_state): per-micro-batch MG candidates exact-counted
within the batch, certified [cnt_min, cnt_max] intervals at read."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_scd_spark.streaming import frequent_ingest_sink, read_frequent_state


def _drive(spark, tmp_path, batches, capacity=8):
    src = tmp_path / "src"
    src.mkdir()
    state, ckpt = str(tmp_path / "state"), str(tmp_path / "ckpt")
    stream = None
    spark.createDataFrame(batches[0], "key string").coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    stream = spark.readStream.schema("key string").parquet(str(src))
    sink = frequent_ingest_sink(stream, state, ckpt, "key", capacity=capacity)
    q = sink.start()
    try:
        q.processAllAvailable()
        for b in batches[1:]:
            spark.createDataFrame(b, "key string").coalesce(1).write.mode(
                "append"
            ).parquet(str(src))
            q.processAllAvailable()
    finally:
        q.stop()
    return state


def test_intervals_certify_exact_counts(spark, tmp_path):
    """Every key's true count must sit inside [cnt_min, cnt_max], every
    true phi-heavy-hitter must be reported, and 'certain' keys must
    truly clear the threshold."""
    batches = [
        [("hot",)] * 30 + [(f"a{i}",) for i in range(20)],
        [("hot",)] * 25 + [("warm",)] * 20 + [(f"b{i}",) for i in range(20)],
        [("warm",)] * 15 + [(f"c{i}",) for i in range(25)],
    ]
    state = _drive(spark, tmp_path, batches, capacity=8)
    flat = [k for b in batches for (k,) in b]
    n = len(flat)
    exact = {}
    for x in flat:
        exact[x] = exact.get(x, 0) + 1
    k = 8
    got = {r["key"]: r for r in read_frequent_state(spark, state, "key", k=k).collect()}
    # interval soundness for every reported key
    for key, r in got.items():
        assert r["cnt_min"] <= exact.get(key, 0) <= r["cnt_max"], key
        if r["certain"]:
            assert exact[key] * k >= n, key
    # no false negatives: every true hitter reported
    for key, c in exact.items():
        if c * k >= n:
            assert key in got, (key, c)
    assert got["hot"]["certain"]


def test_replayed_epoch_rows_do_not_double_count(spark, tmp_path):
    batches = [[("x",)] * 10 + [("y",)] * 2, [("x",)] * 5]
    state = _drive(spark, tmp_path, batches, capacity=8)
    before = {r["key"]: (r["cnt_min"], r["cnt_max"]) for r in read_frequent_state(spark, state, "key", k=2).collect()}
    raw = spark.read.parquet(state)
    raw.limit(3).write.mode("append").parquet(state)  # simulated replay
    after = {r["key"]: (r["cnt_min"], r["cnt_max"]) for r in read_frequent_state(spark, state, "key", k=2).collect()}
    assert before == after
    assert before["x"][0] == 15  # candidate in both epochs -> exact


def test_k_above_capacity_rejected(spark, tmp_path):
    state = _drive(spark, tmp_path, [[("x",)] * 4], capacity=8)
    with pytest.raises(ValueError, match="capacity"):
        read_frequent_state(spark, state, "key", k=64)


def test_matches_batch_heavy_hitters_when_certain(spark, tmp_path):
    """On a stream whose hitters are candidates in EVERY batch, the
    certain set with exact cnt_min must equal the batch operator's
    exact answer over the concatenation."""
    from hive_scd_spark.operators.profile import heavy_hitters

    batches = [
        [("hh1",)] * 40 + [("hh2",)] * 30 + [(f"t{i}",) for i in range(10)],
        [("hh1",)] * 35 + [("hh2",)] * 25 + [(f"u{i}",) for i in range(10)],
    ]
    state = _drive(spark, tmp_path, batches, capacity=16)
    k = 4
    stream_rows = {
        (r["key"], r["cnt_min"])
        for r in read_frequent_state(spark, state, "key", k=k).collect()
        if r["certain"]
    }
    flat = spark.createDataFrame([k_ for b in batches for k_ in b], "key string")
    batch_rows = {
        (r["key"], r["cnt"]) for r in heavy_hitters(flat, "key", k=k, capacity=16).collect()
    }
    assert stream_rows == batch_rows
