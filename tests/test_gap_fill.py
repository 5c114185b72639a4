"""LOCF grid fill (operators/asof.py: gap_fill_locf)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_scd_spark.operators.asof import gap_fill_locf

ROWS = [
    # (user, t, v)
    (1, 5, 10.0),
    (1, 7, 11.0),   # same bucket (step=10) as t=5 -> last wins
    (1, 35, 12.0),  # bucket 3; buckets 1-2 carry 11.0
    (2, 25, 7.0),   # first obs in bucket 2; buckets 0-1 NULL
    (3, 205, 9.9),  # out of range [0, 100) entirely -> grid all NULL
]


@pytest.fixture(scope="module")
def filled(spark):
    df = spark.createDataFrame(ROWS, "user_id long, t long, v double")
    out = gap_fill_locf(df, "user_id", "t", "v", step=10, start=0, end=100)
    return {(r["user_id"], r["bucket"]): (r["filled_value"], r["is_observed"]) for r in out.collect()}


def test_grid_is_complete_per_key(filled):
    assert set(filled) == {(u, b) for u in (1, 2, 3) for b in range(10)}


def test_locf_carries_last_in_bucket(filled):
    assert filled[(1, 0)] == (11.0, True)   # last of the two bucket-0 events
    assert filled[(1, 1)] == (11.0, False)  # carried
    assert filled[(1, 2)] == (11.0, False)
    assert filled[(1, 3)] == (12.0, True)
    assert filled[(1, 9)] == (12.0, False)


def test_null_before_first_observation(filled):
    assert filled[(2, 0)] == (None, False)
    assert filled[(2, 1)] == (None, False)
    assert filled[(2, 2)] == (7.0, True)
    assert filled[(2, 9)] == (7.0, False)


def test_out_of_range_key_gets_all_null_grid(filled):
    assert all(filled[(3, b)] == (None, False) for b in range(10))


def test_guards(spark):
    df = spark.createDataFrame([(1, 0, 0.0)], "user_id long, t long, v double")
    with pytest.raises(ValueError, match="step"):
        gap_fill_locf(df, "user_id", "t", "v", step=0, start=0, end=10)
    with pytest.raises(ValueError, match="start < end"):
        gap_fill_locf(df, "user_id", "t", "v", step=5, start=10, end=10)
