"""SCD over the reference README's aspirational formats
(README.md:254-258): the compiled statement chain is format-agnostic,
so ORC / JSON-lines / CSV directories with a `.updates` script must
produce byte-identical results to the parquet path."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import types as T

from hive_scd_spark.scd import read_scd

SCRIPT = (
    "UPDATE dim SET bal = bal + 100 WHERE bal < 0;\n"
    "-- time=2020-06-01\n"
    "DELETE FROM dim WHERE id = 3;\n"
)

ROWS = [(1, "a", 10.0), (2, "b", -5.0), (3, "c", 7.0), (4, "d", -1.0)]
SCHEMA = T.StructType(
    [
        T.StructField("id", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("bal", T.DoubleType()),
    ]
)


def _build(spark, tmp_path, fmt: str, writer_opts=None, data_rows=ROWS):
    d = tmp_path / f"dim_{fmt}"
    w = spark.createDataFrame(data_rows, SCHEMA).coalesce(1).write.mode("overwrite")
    if writer_opts:
        w = w.options(**writer_opts)
    w.format(fmt).save(str(d))
    with open(os.path.join(str(d), ".updates"), "w") as f:
        f.write(SCRIPT)
    return str(d)


def _snap(df):
    return sorted((r.id, r.name, float(r.bal)) for r in df.collect())


@pytest.mark.parametrize(
    "fmt,read_opts,write_opts",
    [
        ("orc", None, None),
        ("json", None, None),
        ("csv", {"header": "true"}, {"header": "true"}),
    ],
)
def test_scd_format_parity_with_parquet(spark, tmp_path, fmt, read_opts, write_opts):
    pq = _build(spark, tmp_path, "parquet")
    other = _build(spark, tmp_path, fmt, writer_opts=write_opts)
    for as_of in (-1, "2020-01-01", None):
        want = _snap(read_scd(spark, pq, as_of=as_of, format="parquet"))
        got = _snap(
            read_scd(
                spark,
                other,
                as_of=as_of,
                format=fmt,
                schema=SCHEMA,  # json/csv must not round types through inference
                options=read_opts,
            )
        )
        assert got == want, (fmt, as_of)
    # sanity on the final state itself, not just parity
    now = _snap(read_scd(spark, pq, as_of=None, format="parquet"))
    assert now == [(1, "a", 10.0), (2, "b", 95.0), (4, "d", 99.0)]
