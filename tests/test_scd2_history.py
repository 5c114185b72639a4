"""Type-2 history materializer (scd.scd2_history)."""

from __future__ import annotations

import pytest

from hive_scd_spark.scd import scd2_history


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame(
        [(1, "alice", 100.0), (2, "bob", -50.0), (3, "carol", 10.0)],
        "id int, name string, bal double",
    )


SCRIPT = (
    "-- time=1000\nUPDATE t SET bal = bal + 5 WHERE id = 1;\n"
    "-- time=2000\nDELETE FROM t WHERE id = 2;\n"
    "-- time=3000\nUPDATE t SET name = upper(name) WHERE id = 3;\n"
)


def test_intervals_and_currency(spark, dim):
    rows = sorted(
        (
            (r.id, r.name, r.bal, r.valid_from_ms, r.valid_to_ms, r.is_current)
            for r in scd2_history(dim, SCRIPT).collect()
        ),
        key=lambda t: (t[0], t[3]),  # (id, valid_from) — name case varies
    )
    assert rows == [
        (1, "alice", 100.0, 0, 1000, False),
        (1, "alice", 105.0, 1000, None, True),
        (2, "bob", -50.0, 0, 2000, False),  # deletion closes the interval
        (3, "carol", 10.0, 0, 3000, False),
        (3, "CAROL", 10.0, 3000, None, True),
    ]


def test_unchanged_rows_have_single_current_interval(spark, dim):
    out = scd2_history(dim, "UPDATE t SET bal = 0 WHERE id = 99;")
    rows = [(r.id, r.valid_from_ms, r.valid_to_ms, r.is_current) for r in out.collect()]
    assert sorted(rows) == [(1, 0, None, True), (2, 0, None, True), (3, 0, None, True)]


def test_empty_script_single_interval(spark, dim):
    assert scd2_history(dim, "").count() == 3


def test_chain_dependency_refused(spark, dim):
    with pytest.raises(NotImplementedError, match="sequential snapshots"):
        scd2_history(dim, "UPDATE t SET bal = 1 WHERE id = 1;\nDELETE FROM t WHERE bal = 1;")


def test_asof_consistency_with_apply_statements(spark, dim):
    """At any boundary t, the SCD2 intervals covering t must equal the
    as-of snapshot from apply_statements."""
    from pyspark.sql import functions as F

    from hive_scd_spark.scd import apply_statements

    hist = scd2_history(dim, SCRIPT)
    for t in [0, 999, 1000, 1999, 2000, 2500, 3000, 99999]:
        from_hist = sorted(
            (r.id, r.name, r.bal)
            for r in hist.filter(
                (F.col("valid_from_ms") <= t)
                & (F.col("valid_to_ms").isNull() | (F.col("valid_to_ms") > t))
            ).collect()
        )
        from_apply = sorted(
            (r.id, r.name, r.bal) for r in apply_statements(dim, SCRIPT, as_of=t).collect()
        )
        assert from_hist == from_apply, f"divergence at t={t}"
