"""Heavy-hitters sketch (operators/profile.py:heavy_hitters).

The contract under test: the Misra-Gries candidate pass bounds memory
and shuffle width but NEVER changes the answer — the final output is
the exact phi-heavy-hitter set with exact counts, identical to the
plain groupBy it avoids, for any partitioning and any capacity >= k.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_scd_spark.operators.profile import heavy_hitters, token_heavy_hitters


def _zipf_stream(spark, n=20_000, m=1 << 16, parts=7):
    """share(v) = 1/(v(v+1)) — scale-invariant Zipf over ~2*sqrt(m) keys."""
    h = F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 4), 16, 10).cast(
        "long"
    ) % m
    return (
        spark.range(0, n, 1, parts)
        .select(F.floor(F.lit(m) / (h + 1)).cast("long").alias("key"))
    )


def _exact(stream, k):
    n = stream.count()
    rows = (
        stream.groupBy("key")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * k >= F.lit(n))
        .collect()
    )
    return {(r["key"], r["cnt"]) for r in rows}


def test_matches_plain_groupby_with_pruning(spark):
    """Distinct keys (~400) exceed capacity, so the MG subtraction
    genuinely fires — and the output is still the exact answer."""
    stream = _zipf_stream(spark)
    n_distinct = stream.distinct().count()
    capacity = 64
    assert n_distinct > capacity  # the pruning path is actually exercised
    got = {
        (r["key"], r["cnt"])
        for r in heavy_hitters(stream, "key", k=32, capacity=capacity).collect()
    }
    assert got == _exact(stream, 32)
    assert len(got) >= 3  # the fixture plants real hitters


def test_share_is_rounded_ratio(spark):
    stream = _zipf_stream(spark, n=5_000)
    n = stream.count()
    for r in heavy_hitters(stream, "key", k=16, capacity=64).collect():
        assert r["share"] == round(r["cnt"] / n, 6)


def test_null_keys_excluded(spark):
    df = spark.createDataFrame(
        [("a",)] * 8 + [(None,)] * 90 + [("b",)] * 2, "key string"
    ).repartition(3)
    got = {(r["key"], r["cnt"]) for r in heavy_hitters(df, "key", k=2).collect()}
    # N = 10 non-null elements; 'a' (8) passes 8*2 >= 10, 'b' (2) fails
    assert got == {("a", 8)}


def test_boundary_is_inclusive_integer_arithmetic(spark):
    # cnt * k == N exactly -> in (>= is the documented contract)
    df = spark.createDataFrame([("x",)] * 5 + [("y",)] * 15, "key string")
    got = {r["key"] for r in heavy_hitters(df, "key", k=4, capacity=8).collect()}
    assert got == {"x", "y"}  # 5*4 == 20 and 15*4 >= 20


def test_capacity_below_k_rejected(spark):
    df = spark.createDataFrame([("a",)], "key string")
    with pytest.raises(ValueError, match="capacity"):
        heavy_hitters(df, "key", k=128, capacity=64)
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(df, "key", k=1)


def test_adversarial_single_partition_order(spark):
    """The classic MG killer: a long run of distinct singletons FOLLOWED
    by the heavy key, all in one partition — decrements must not erase
    the hitter (and can't: the recount pass restores exact counts)."""
    rows = [(f"junk{i}",) for i in range(500)] + [("hot",)] * 300
    df = spark.createDataFrame(rows, "key string").coalesce(1)
    got = {(r["key"], r["cnt"]) for r in heavy_hitters(df, "key", k=4, capacity=8).collect()}
    assert got == {("hot", 300)}  # 300*4 >= 800


def test_token_convenience(spark):
    df = spark.createDataFrame(
        [(1, "the cat THE dog the"), (2, "the bird"), (3, None), (4, "")],
        "doc_id long, text string",
    )
    got = {(r["token"], r["cnt"]) for r in token_heavy_hitters(df, "text", k=2).collect()}
    # tokens: the x4 (lowercased), cat, dog, bird -> N=7; 4*2 >= 7
    assert got == {("the", 4)}


def test_integer_keys_pass_through(spark):
    df = spark.createDataFrame([(7,)] * 9 + [(3,)] * 1, "key long")
    got = {(r["key"], r["cnt"]) for r in heavy_hitters(df, "key", k=2).collect()}
    assert got == {(7, 9)}
