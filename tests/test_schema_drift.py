"""Schema-drift tolerance (VERDICT r4 #1/#4).

The driver regenerates /root/testdata between rounds and has already
shipped ``events.ts`` as BOTH parquet TIMESTAMP(NANOS) (Spark: long
nanos under ``nanosAsLong``) and timestamp[us] NTZ — the untested NTZ
branch cost round 4 four driver rows and the whole bench.  The loaders
are the contract boundary: these tests synthesize every plausible
on-disk representation variant and prove the affected registry queries
stay ORACLE-IDENTICAL (DuckDB on the same fixture files) under each.

Variants covered:
  - events.ts: int64-nanos / timestamp[us] NTZ / timestamp[us] UTC-adjusted
  - embeddings.embedding: list<float> / list<double>
  - orders.o_orderdate: timestamp[us] / date32

Design note: drift is absorbed by dtype-POLYMORPHIC loaders and
per-element casts at compute sites, not by a blanket cast in ``t()`` —
a load-time NTZ→LTZ cast would wrap filter columns (l_shipdate,
o_orderdate) and defeat parquet predicate pushdown on the hot scans.
"""

from __future__ import annotations

import math
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from hive_scd_spark.queries import ORACLES, QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

EVENT_QUERIES = [
    "agg_filtered_event_stats",
    "events_sessionize",
    "asof_join_click_purchase",
    "range_join_event_windows",
    "events_window_counts",
]
EMBEDDING_QUERIES = [
    "array_functions_showcase",
    "dedup_embedding_lsh",
    "ann_lsh_topk",
    "ivf_cosine_topk",
]
ORDERS_QUERIES = [
    "scd_decimal_dml",
    "scd_h2_dialect",
    "date_functions_showcase",
    "window_lead_ntile_orders",
]


def _canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _multiset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon(r[i]) for r in [row] for i in order) for row in rows)


def _check(spark, fixture_dir: str, name: str) -> None:
    sdf = QUERIES[name](spark, str(fixture_dir))
    spark_cols = list(sdf.columns)
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = duckdb.connect()
    for fn in os.listdir(fixture_dir):
        if fn.endswith(".parquet"):
            tbl = fn[: -len(".parquet")]
            con.execute(
                f"CREATE VIEW {tbl} AS SELECT * FROM "
                f"read_parquet('{fixture_dir}/{fn}')"
            )
    rel = con.sql(ORACLES[name])
    duck_cols = list(rel.columns)
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), name
    assert len(spark_rows) == len(duck_rows), name
    ms_s = _multiset(spark_rows, spark_cols)
    ms_d = _multiset(duck_rows, duck_cols)
    assert ms_s == ms_d, f"{name}: first diffs " + str(
        [(a, b) for a, b in zip(ms_s, ms_d) if a != b][:3]
    )


# --------------------------------------------------------------------------
# events.ts representation variants
# --------------------------------------------------------------------------


def _events_table() -> pa.Table:
    tbl = pq.read_table(f"{SF_DIR}/events.parquet")
    ts = tbl.column("ts")
    if pa.types.is_int64(ts.type):  # legacy layout on disk: nanos-as-long
        ts = ts.cast(pa.timestamp("ns"))
        tbl = tbl.set_column(tbl.schema.get_field_index("ts"), "ts", ts)
    return tbl


def _write_events(tmp_path_factory, kind: str) -> str:
    tbl = _events_table()
    i = tbl.schema.get_field_index("ts")
    ts = tbl.column("ts")
    if kind == "nanos_long":
        tbl = tbl.set_column(i, "ts", ts.cast(pa.timestamp("ns")))
    elif kind == "micros_ntz":
        tbl = tbl.set_column(i, "ts", ts.cast(pa.timestamp("us")))
    elif kind == "micros_utc":
        tbl = tbl.set_column(
            i, "ts", ts.cast(pa.timestamp("us")).cast(pa.timestamp("us", tz="UTC"))
        )
    d = tmp_path_factory.mktemp(f"events_{kind}")
    # version=2.6 keeps TIMESTAMP(NANOS) as a true nanos logical type
    pq.write_table(tbl, str(d / "events.parquet"), version="2.6")
    return str(d)


@pytest.fixture(scope="module", params=["nanos_long", "micros_ntz", "micros_utc"])
def events_dir(request, tmp_path_factory):
    return _write_events(tmp_path_factory, request.param)


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_event_queries_all_ts_layouts(spark, events_dir, name):
    _check(spark, events_dir, name)


def test_events_ts_layouts_read_as_expected(spark, tmp_path_factory):
    """The three fixtures really do exercise three distinct Spark dtypes."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    expect = {
        "nanos_long": "bigint",
        "micros_ntz": "timestamp_ntz",
        "micros_utc": "timestamp",
    }
    for kind, dtype in expect.items():
        d = _write_events(tmp_path_factory, kind)
        got = dict(spark.read.parquet(f"{d}/events.parquet").dtypes)["ts"]
        assert got == dtype, (kind, got)


# --------------------------------------------------------------------------
# embeddings.embedding element-type variants
# --------------------------------------------------------------------------


@pytest.fixture(scope="module", params=["float", "double"])
def embeddings_dir(request, tmp_path_factory):
    tbl = pq.read_table(f"{SF_DIR}/embeddings.parquet")
    i = tbl.schema.get_field_index("embedding")
    elem = pa.float32() if request.param == "float" else pa.float64()
    tbl = tbl.set_column(
        i, "embedding", tbl.column("embedding").cast(pa.list_(elem))
    )
    d = tmp_path_factory.mktemp(f"emb_{request.param}")
    pq.write_table(tbl, str(d / "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize("name", EMBEDDING_QUERIES)
def test_embedding_queries_both_elem_types(spark, embeddings_dir, name):
    # float32→float64 widening is exact, and every compute site casts
    # per-element to double, so both layouts must match the oracle run
    # on the SAME fixture file bit-for-bit after the queries' rounding
    _check(spark, embeddings_dir, name)


# --------------------------------------------------------------------------
# orders.o_orderdate representation variants
# --------------------------------------------------------------------------


@pytest.fixture(scope="module", params=["timestamp", "date"])
def orders_dir(request, tmp_path_factory):
    tbl = pq.read_table(f"{SF_DIR}/orders.parquet")
    i = tbl.schema.get_field_index("o_orderdate")
    col = tbl.column("o_orderdate")
    if request.param == "date":
        col = col.cast(pa.date32())
    tbl = tbl.set_column(i, "o_orderdate", col)
    d = tmp_path_factory.mktemp(f"orders_{request.param}")
    pq.write_table(tbl, str(d / "orders.parquet"))
    return str(d)


@pytest.mark.parametrize("name", ORDERS_QUERIES)
def test_orders_queries_both_date_layouts(spark, orders_dir, name):
    _check(spark, orders_dir, name)


# --------------------------------------------------------------------------
# lineitem.l_shipdate representation variants (q1/q6 are lineitem-only)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module", params=["timestamp", "date"])
def lineitem_dir(request, tmp_path_factory):
    tbl = pq.read_table(f"{SF_DIR}/lineitem.parquet")
    i = tbl.schema.get_field_index("l_shipdate")
    col = tbl.column("l_shipdate")
    if request.param == "date":
        col = col.cast(pa.date32())
    tbl = tbl.set_column(i, "l_shipdate", col)
    d = tmp_path_factory.mktemp(f"lineitem_{request.param}")
    pq.write_table(tbl, str(d / "lineitem.parquet"))
    return str(d)


@pytest.mark.parametrize("name", ["q1_pricing_summary", "q6_revenue_forecast"])
def test_lineitem_queries_both_date_layouts(spark, lineitem_dir, name):
    _check(spark, lineitem_dir, name)
