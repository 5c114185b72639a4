"""SCD DML over widened column types (VERDICT r1 #6).

The reference supports six primitive Avro types and names decimal as
its near-term want (/root/reference/README.md:251-252).  The compiled
CASE-chain engine inherits Spark's type system, so decimal, date, and
timestamp columns flow through UPDATE/DELETE untouched by the engine
itself — these tests pin that the *semantics* (decimal rounding,
date/timestamp arithmetic, chain ordering, as-of selection) hold on
widened types, and the `scd_decimal_dml` gate query checks the same
cross-engine against DuckDB.
"""

from __future__ import annotations

import datetime
from decimal import ROUND_HALF_UP, Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hive_scd_spark.scd import apply_statements

SCHEMA = "id BIGINT, amt DECIMAL(10,2), d DATE, ts TIMESTAMP"

SCRIPT = """\
UPDATE t SET amt = CAST(ROUND(amt * 1.1, 2) AS DECIMAL(10,2)) WHERE d < DATE '2021-01-01';
-- time=2024-03-01
UPDATE t SET d = date_add(d, 7), ts = ts + INTERVAL '1' HOUR WHERE id = 2;
-- time=2024-06-01
DELETE FROM t WHERE amt < CAST(0.10 AS DECIMAL(10,2));
"""


def _rows():
    return [
        (1, Decimal("10.05"), datetime.date(2020, 1, 5), datetime.datetime(2020, 1, 5, 12, 0)),
        (2, Decimal("20.50"), datetime.date(2021, 6, 15), datetime.datetime(2021, 6, 15, 8, 30)),
        (3, Decimal("0.05"), datetime.date(2022, 3, 3), datetime.datetime(2022, 3, 3, 0, 0)),
    ]


def test_update_chain_decimal_date_timestamp(spark):
    df = spark.createDataFrame(_rows(), schema=SCHEMA)
    out = {r.id: r for r in apply_statements(df, SCRIPT, as_of=None).collect()}
    # row 3 deleted (0.05 < 0.10); row 1 updated by stmt1 only
    assert set(out) == {1, 2}
    assert out[1].amt == Decimal("11.06")  # 10.05 * 1.1 = 11.055 → HALF_UP tie
    assert out[1].d == datetime.date(2020, 1, 5)
    # row 2: stmt1 predicate false (d >= 2021-01-01), stmt2 shifts d and ts
    assert out[2].amt == Decimal("20.50")
    assert out[2].d == datetime.date(2021, 6, 22)
    assert out[2].ts == datetime.datetime(2021, 6, 15, 9, 30)
    # output types preserved end-to-end
    assert dict(apply_statements(df, SCRIPT, as_of=None).dtypes) == {
        "id": "bigint", "amt": "decimal(10,2)", "d": "date", "ts": "timestamp",
    }


def test_asof_mid_keeps_decimal_row(spark):
    df = spark.createDataFrame(_rows(), schema=SCHEMA)
    mid = {r.id: r for r in apply_statements(df, SCRIPT, as_of="2024-04-01").collect()}
    # DELETE (time=2024-06-01) not yet applicable → row 3 survives with
    # its original amount (its date fails stmt1's predicate)
    assert set(mid) == {1, 2, 3}
    assert mid[3].amt == Decimal("0.05")
    assert mid[1].amt == Decimal("11.06")


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cents=st.lists(st.integers(min_value=-(10**6), max_value=10**6), min_size=1, max_size=8),
    mult_tenths=st.integers(min_value=1, max_value=29),
    cutoff_cents=st.integers(min_value=-(10**6), max_value=10**6),
)
def test_decimal_update_matches_python_decimal(spark, cents, mult_tenths, cutoff_cents):
    """UPDATE over a decimal column == Python decimal.Decimal HALF_UP
    arithmetic, for arbitrary amounts, multipliers, and predicates."""
    rows = [(i, Decimal(c) / 100) for i, c in enumerate(cents)]
    df = spark.createDataFrame(rows, schema="id BIGINT, amt DECIMAL(12,2)")
    mult = Decimal(mult_tenths) / 10
    cutoff = Decimal(cutoff_cents) / 100
    script = (
        f"UPDATE t SET amt = CAST(ROUND(amt * {mult}, 2) AS DECIMAL(12,2)) "
        f"WHERE amt < {cutoff};"
    )
    got = {r.id: r.amt for r in apply_statements(df, script, as_of=None).collect()}
    want = {
        i: (amt * mult).quantize(Decimal("0.01"), rounding=ROUND_HALF_UP)
        if amt < cutoff
        else amt
        for i, amt in rows
    }
    assert got == want


def test_update_chain_complex_types(spark):
    """Complex columns (array/map/struct) through UPDATE/DELETE — the
    reference errors on all of these (AvroSCDInputFormat.java:178);
    the compiled chain inherits them from Spark's type system for free,
    including higher-order functions in SET expressions."""
    df = spark.createDataFrame(
        [
            (1, ["a"], {"k": 1}, (10, "x")),
            (2, ["b", "c"], {"k": 2}, (20, "y")),
            (3, [], {}, (30, "z")),
        ],
        schema="id BIGINT, tags ARRAY<STRING>, attrs MAP<STRING,INT>, "
        "meta STRUCT<score:INT, label:STRING>",
    )
    script = """\
UPDATE t SET tags = array_append(tags, 'seen'), meta = named_struct('score', meta.score + 1, 'label', upper(meta.label)) WHERE size(tags) > 0;
UPDATE t SET attrs = map_concat(attrs, map('v', meta.score)) WHERE meta.score >= 21;
DELETE FROM t WHERE size(tags) = 0;
"""
    out = {r.id: r for r in apply_statements(df, script, as_of=None).collect()}
    assert set(out) == {1, 2}
    assert out[1].tags == ["a", "seen"]
    assert out[1].meta.asDict() == {"score": 11, "label": "X"}
    assert out[1].attrs == {"k": 1}  # stmt2 predicate sees post-stmt1 score 11
    assert out[2].tags == ["b", "c", "seen"]
    assert out[2].attrs == {"k": 2, "v": 21}
    assert out[2].meta.asDict() == {"score": 21, "label": "Y"}
