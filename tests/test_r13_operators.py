"""Round-13 second tranche: rolling z-score anomaly flags
(operators/asof.py: anomaly_zscore) and the cross-source n-gram
contamination matrix (operators/decontam.py: source_overlap_matrix).
Both gates are value-checked against DuckDB oracles; these tests carry
the semantic evidence on planted fixtures."""

from __future__ import annotations

import math

import pytest

from hive_scd_spark.operators.asof import anomaly_zscore
from hive_scd_spark.operators.decontam import source_overlap_matrix

# ---------------------------------------------------------------------------
# anomaly_zscore
# ---------------------------------------------------------------------------


def _series(spark, values, key="k"):
    rows = [(key, i, i, float(v)) for i, v in enumerate(values)]
    return spark.createDataFrame(rows, "k string, t long, oid long, v double")


def test_planted_spike_is_flagged(spark):
    vals = [10.0, 11.0, 10.0, 9.0, 10.0, 11.0, 10.0, 9.0, 10.0, 500.0, 10.0]
    out = anomaly_zscore(
        _series(spark, vals), "k", "t", "v", "oid",
        lookback=20, min_history=8, z_threshold=3.0,
    )
    got = {r["t"]: (r["n_baseline"], r["z"], r["is_anomaly"]) for r in out.collect()}
    assert len(got) == len(vals)  # every row survives
    # first 8 rows: insufficient history -> NULL z, never flagged
    for i in range(8):
        assert got[i][1] is None and got[i][2] is False, i
    assert got[9][2] is True  # the spike
    assert got[8][2] is False  # normal row with full history
    # the row AFTER the spike is judged against a baseline polluted by
    # the spike (legit leave-one-out behavior): large std -> not flagged
    assert got[10][2] is False


def test_z_matches_python_replay(spark):
    vals = [3.0, 7.0, 5.0, 4.0, 6.0, 5.5, 4.5, 5.0, 9.0]
    out = anomaly_zscore(
        _series(spark, vals), "k", "t", "v", "oid",
        lookback=20, min_history=8,
    )
    r = {row["t"]: row for row in out.collect()}[8]
    base = [round(v * 1000) for v in vals[:8]]
    n = len(base)
    mean = sum(base) / n
    var = sum(b * b for b in base) / n - mean * mean
    exp = round((9000 - mean) / math.sqrt(var), 6)
    assert r["z"] == exp and r["n_baseline"] == 8


def test_constant_history_never_flags(spark):
    vals = [5.0] * 10 + [99.0]
    out = anomaly_zscore(_series(spark, vals), "k", "t", "v", "oid")
    last = [r for r in out.collect() if r["t"] == 10][0]
    assert last["z"] is None and last["is_anomaly"] is False


def test_keys_are_independent(spark):
    a = _series(spark, [1.0, 2.0] * 6, key="a")
    b = _series(spark, [100.0, 101.0] * 6, key="b")
    out = anomaly_zscore(a.unionByName(b), "k", "t", "v", "oid")
    # b's large values are NORMAL within b's own baseline
    assert not any(r["is_anomaly"] for r in out.filter("k = 'b'").collect())


def test_parameter_guards(spark):
    df = _series(spark, [1.0])
    with pytest.raises(ValueError, match="lookback"):
        anomaly_zscore(df, "k", "t", "v", "oid", lookback=0)
    with pytest.raises(ValueError, match="min_history"):
        anomaly_zscore(df, "k", "t", "v", "oid", min_history=1)


# ---------------------------------------------------------------------------
# source_overlap_matrix
# ---------------------------------------------------------------------------


def _corpus(spark):
    shared = "alpha beta gamma delta epsilon zeta eta theta"  # one 8-gram
    rows = [
        ("s1", f"{shared} unique one tail{i}") for i in range(3)
    ] + [
        ("s2", f"{shared} other words here tail{i}") for i in range(3)
    ] + [
        ("s3", f"completely different text with nothing common at all {i} "
               f"pad pad{i} more padding words here") for i in range(3)
    ]
    return spark.createDataFrame(rows, "source string, text string")


def test_shared_grams_counted_once_per_pair(spark):
    out = {(r["source_a"], r["source_b"]): r
           for r in source_overlap_matrix(_corpus(spark), "source", "text", n=8).collect()}
    # s1 and s2 share the planted 8-gram (each doc carries it once; the
    # per-source DISTINCT set counts it once)
    assert ("s1", "s2") in out
    r = out[("s1", "s2")]
    assert r["n_shared"] >= 1
    assert r["jaccard"] == round(r["n_shared"] / (r["n_a"] + r["n_b"] - r["n_shared"]), 6)
    # s3 shares nothing long enough with s1/s2 -> pair rows absent
    assert ("s1", "s3") not in out and ("s2", "s3") not in out
    # pairs are emitted once, ordered
    assert all(a < b for a, b in out)


def test_max_sources_per_gram_drops_boilerplate(spark):
    shared = "one two three four five six seven eight"
    rows = [(f"s{i}", f"{shared} filler{i} a b c d e f g h") for i in range(5)]
    df = spark.createDataFrame(rows, "source string, text string")
    full = source_overlap_matrix(df, "source", "text", n=8)
    capped = source_overlap_matrix(df, "source", "text", n=8,
                                   max_sources_per_gram=3)
    # the gram in all 5 sources contributes C(5,2)=10 pairs uncapped...
    assert full.filter("n_shared >= 1").count() == 10
    # ...and none once the cap drops it
    assert capped.count() == 0
