"""Interval x interval overlap join (operators/range_join.py:
interval_overlap_join): equi-join-on-bin plan, exactly-one-bin match
(no dedup pass), verified against the naive non-equi join."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from hive_scd_spark.operators.range_join import interval_overlap_join


def _random_intervals(spark, n, span, max_len, seed, prefix):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        s = rng.randrange(span)
        rows.append((i, s, s + rng.randrange(1, max_len)))
    return spark.createDataFrame(
        rows, f"{prefix}_id long, {prefix}_start long, {prefix}_end long"
    )


def _naive(left_rows, right_rows):
    return {
        (l[0], r[0])
        for l in left_rows
        for r in right_rows
        if l[1] < r[2] and r[1] < l[2]
    }


@pytest.mark.parametrize("bin_width", [1, 7, 100, 10_000])
def test_matches_naive_join_across_bin_widths(spark, bin_width):
    """The dedup-free guarantee must hold at every bin width: narrow
    bins (intervals span many bins) and wide bins (many false
    candidates) both reproduce the naive join EXACTLY — no missing
    pairs, no duplicates."""
    left = _random_intervals(spark, 80, 5_000, 400, seed=1, prefix="a")
    right = _random_intervals(spark, 60, 5_000, 900, seed=2, prefix="b")
    got_rows = interval_overlap_join(
        left, right, "a_start", "a_end", "b_start", "b_end", bin_width
    ).collect()
    got = [(r["a_id"], r["b_id"]) for r in got_rows]
    expect = _naive(
        [(r["a_id"], r["a_start"], r["a_end"]) for r in left.collect()],
        [(r["b_id"], r["b_start"], r["b_end"]) for r in right.collect()],
    )
    assert len(got) == len(set(got)), "duplicate pairs — the one-bin rule broke"
    assert set(got) == expect


def test_empty_intervals_never_match(spark):
    left = spark.createDataFrame([(1, 10, 10), (2, 0, 100)], "a_id long, a_start long, a_end long")
    right = spark.createDataFrame([(7, 0, 1000)], "b_id long, b_start long, b_end long")
    got = {r["a_id"] for r in interval_overlap_join(left, right, "a_start", "a_end", "b_start", "b_end", 50).collect()}
    assert got == {2}


def test_half_open_touching_intervals_do_not_match(spark):
    left = spark.createDataFrame([(1, 0, 10)], "a_id long, a_start long, a_end long")
    right = spark.createDataFrame([(2, 10, 20)], "b_id long, b_start long, b_end long")
    assert interval_overlap_join(left, right, "a_start", "a_end", "b_start", "b_end", 5).count() == 0


def test_guards(spark):
    df = spark.createDataFrame([(1, 0, 1)], "a_id long, a_start long, a_end long")
    with pytest.raises(ValueError, match="bin_width"):
        interval_overlap_join(df, df, "a_start", "a_end", "a_start", "a_end", 0)
    with pytest.raises(ValueError, match="inner"):
        interval_overlap_join(df, df, "a_start", "a_end", "a_start", "a_end", 5, how="left")
