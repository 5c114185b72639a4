"""Regression pins for the round-3 ADVICE findings.

1. avro: StructType reader schemas with non-flat types must reach the
   native spark-avro path untouched (no flat-Avro-JSON round-trip).
2. fs: HadoopFS.walk swallows ONLY FileNotFound; auth/connectivity
   errors propagate instead of silently discovering no `.updates`.
3. layout: fan_out never converts a shuffle-bearing plan to an RDD
   (AQE would materialize upstream stages eagerly).
4. updates: compat="reference" + as_of_ms reproduces the reference's
   READ-time filter (SQLUpdater.java:131) exactly.
5. queries: /tmp fixture cache keys include a source-data fingerprint.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_scd_spark.operators.layout import _is_narrow_scan, fan_out
from hive_scd_spark.updates import ScdScriptError, parse_script


# -- 1. avro native path takes StructType directly ---------------------------


class _FakeNativeReader:
    def __init__(self):
        self.schema_arg = None
        self.options_arg = None
        self.loaded = None

    def format(self, fmt):
        assert fmt == "avro"
        return self

    def options(self, **opts):
        self.options_arg = opts
        return self

    def schema(self, s):
        self.schema_arg = s
        return self

    def option(self, k, v):  # pragma: no cover — must not be hit here
        raise AssertionError(f"unexpected option({k!r})")

    def load(self, path):
        self.loaded = path
        return self


class _FakeSC:
    applicationId = "fake-app-for-avro-test"


class _FakeSpark:
    sparkContext = _FakeSC()

    def __init__(self):
        self.read = _FakeNativeReader()


def test_native_avro_struct_schema_bypasses_flat_converter(monkeypatch):
    """A StructType with timestamp/decimal/array fields previously blew
    up in _struct_to_avro_json BEFORE the native branch; now the native
    path must receive the StructType verbatim."""
    from hive_scd_spark.sources import avro as avro_mod

    rich = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("amount", T.DecimalType(12, 2)),
            T.StructField("tags", T.ArrayType(T.StringType())),
        ]
    )
    fake = _FakeSpark()
    monkeypatch.setitem(avro_mod._NATIVE_AVRO, _FakeSC.applicationId, True)
    out = avro_mod.read_avro(fake, "/data/t", reader_schema=rich)
    assert out.loaded == "/data/t"
    assert out.schema_arg is rich


def test_fallback_still_rejects_wide_struct_types(spark, tmp_path):
    """The pure-Python fallback codec is flat-primitive-only; the
    NotImplementedError guard stays on that path."""
    from hive_scd_spark.sources.avro import read_avro

    rich = T.StructType([T.StructField("ts", T.TimestampType())])
    with pytest.raises(NotImplementedError, match="no flat Avro equivalent"):
        read_avro(spark, str(tmp_path), reader_schema=rich)


# -- 2. HadoopFS.walk error discipline ---------------------------------------


class _JExc:
    def __init__(self, cls_name, cause=None):
        self._cls = cls_name
        self._cause = cause

    def getClass(self):
        return self

    def getName(self):
        return self._cls

    def getCause(self):
        return self._cause


class _JavaError(Exception):
    def __init__(self, jexc):
        super().__init__("java error")
        self.java_exception = jexc


def test_is_not_found_classification():
    from hive_scd_spark.fs import HadoopFS

    fnf = _JavaError(_JExc("java.io.FileNotFoundException"))
    denied = _JavaError(_JExc("org.apache.hadoop.fs.s3a.AccessDeniedException"))
    nested = _JavaError(
        _JExc("java.lang.RuntimeException", _JExc("java.io.FileNotFoundException"))
    )
    plain = ValueError("no java_exception attribute at all")
    assert HadoopFS._is_not_found(fnf)
    assert HadoopFS._is_not_found(nested)
    assert not HadoopFS._is_not_found(denied)
    assert not HadoopFS._is_not_found(plain)


def test_walk_missing_dir_yields_nothing(spark, tmp_path):
    from hive_scd_spark.fs import fs_for

    missing = "file:" + str(tmp_path / "definitely-not-here")
    fs = fs_for(spark, missing)
    assert list(fs.walk(missing)) == []


def test_walk_propagates_access_denied(spark, tmp_path):
    """A misconfigured credential must surface, not silently produce an
    empty discovery (= raw un-updated rows)."""
    from hive_scd_spark.fs import fs_for

    fs = fs_for(spark, "file:" + str(tmp_path))

    class _DenyFS:
        def listStatus(self, _p):
            raise _JavaError(
                _JExc("org.apache.hadoop.fs.s3a.AccessDeniedException")
            )

    fs._fs = _DenyFS()
    with pytest.raises(_JavaError):
        list(fs.walk("file:" + str(tmp_path)))


# -- 3. fan_out plan guard ---------------------------------------------------


def test_fan_out_widens_narrow_scan(spark, sf_dir):
    df = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    assert _is_narrow_scan(df)
    out = fan_out(df, min_partitions=4)
    assert out.rdd.getNumPartitions() >= 4


def test_fan_out_leaves_derived_plans_untouched(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    derived = docs.groupBy("lang").agg(F.count("*").alias("n"))
    assert not _is_narrow_scan(derived)
    assert fan_out(derived, min_partitions=1000) is derived
    joined = docs.alias("a").join(docs.alias("b"), "doc_id")
    assert not _is_narrow_scan(joined)
    assert fan_out(joined, min_partitions=1000) is joined


# -- 4. compat="reference" read-time as-of filter ----------------------------

MS_2020 = 1577836800000


def test_reference_asof_skips_future_incomplete_statement():
    """SQLUpdater.java:131 — lines under a future directive are never
    lexed, so a future-dated INCOMPLETE statement is silently skipped
    when the as-of time is threaded in, but still an error without it."""
    script = (
        "UPDATE t SET a = 1 WHERE b = 2;\n"
        "-- time=2999-01-01\n"
        "UPDATE t SET a = 2"  # no terminator — but filtered at read time
    )
    with pytest.raises(ScdScriptError, match="Incomplete"):
        parse_script(script, compat="reference")
    stmts = parse_script(script, compat="reference", as_of_ms=MS_2020)
    assert [s.sets for s in stmts] == [(("a", "1"),)]


def test_reference_asof_mid_statement_directive_truncates():
    """A mid-statement directive whose time filters the continuation
    leaves the pending fragment incomplete at EOF — the reference's
    IllegalStateException, not a joined/retagged statement."""
    script = "UPDATE t SET a = 1\n-- time=2999-01-01\nWHERE b = 2;\n"
    # without the as-of filter the lexer joins across and retags
    (joined,) = parse_script(script, compat="reference")
    assert joined.where == "b = 2"
    with pytest.raises(ScdScriptError, match="Incomplete"):
        parse_script(script, compat="reference", as_of_ms=MS_2020)


def test_reference_asof_joins_across_applicable_directive():
    script = "UPDATE t SET a = 1\n-- time=1000\nWHERE b = 2;\n"
    (stmt,) = parse_script(script, compat="reference", as_of_ms=MS_2020)
    assert stmt.where == "b = 2"
    assert stmt.effective_ms == 1000


def test_asof_rejected_outside_reference_mode():
    with pytest.raises(ValueError, match="only meaningful"):
        parse_script("DELETE FROM t;", as_of_ms=0)


def test_read_scd_compat_reference_end_to_end(spark, tmp_path):
    """compat threads through the public API: a future-dated incomplete
    statement poisons the default lexer but is silently skipped by the
    reference lexer's read-time filter — matching the reference."""
    from hive_scd_spark.scd import read_scd

    d = tmp_path / "dim"
    d.mkdir()
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id int, name string"
    ).write.mode("overwrite").parquet(str(d))
    (d / ".updates").write_text(
        "UPDATE d SET name = upper(name) WHERE id = 1;\n"
        "-- time=2999-01-01\n"
        "UPDATE d SET name = 'future pending"  # unterminated, future-dated
    )
    with pytest.raises(ScdScriptError, match="Incomplete"):
        read_scd(spark, str(d), format="parquet").collect()
    got = {
        r.id: r.name
        for r in read_scd(
            spark, str(d), format="parquet", compat="reference"
        ).collect()
    }
    assert got == {1: "A", 2: "b"}


# -- 5. fixture cache keyed by data fingerprint ------------------------------


def test_data_fingerprint_tracks_source_changes(tmp_path):
    from hive_scd_spark.queries import _data_fingerprint

    d = tmp_path / "sfX"
    tbl = d / "customer.parquet"
    tbl.mkdir(parents=True)
    f = tbl / "part-0.parquet"
    f.write_bytes(b"v1")
    fp1 = _data_fingerprint(str(d), "customer")
    assert fp1 == _data_fingerprint(str(d), "customer")  # stable
    time.sleep(0.01)
    f.write_bytes(b"v2-longer")  # size + mtime change
    fp2 = _data_fingerprint(str(d), "customer")
    assert fp1 != fp2


# -- round-5 ADVICE pins -----------------------------------------------------


def test_snappy_compress_table_is_bounded():
    """compress() must not allocate per-input-offset state: the hash
    table is a fixed-size slot array (≤ 2^_MAX_TABLE_BITS ints), so a
    block-sized input costs O(table), not O(n) dict entries."""
    from hive_scd_spark.sources import snappy_lite

    assert snappy_lite._MAX_TABLE_BITS <= 16
    # collision-heavy input (few distinct 4-grams, hostile to a bounded
    # table) still round-trips — collisions may only cost ratio
    data = (b"abcdabceabcfabcg" * 4096) + bytes(range(256)) * 64
    assert snappy_lite.decompress(snappy_lite.compress(data)) == data


def test_clean_text_vertical_tab_cross_engine(spark):
    """\\x0B is whitespace in Java's \\s but not RE2's; clean_text pins
    an explicit class so both engines collapse it identically."""
    import duckdb
    import pandas as pd

    from hive_scd_spark.operators.text import clean_text

    rows = [
        (1, "a\x0Bb see https://x.io/p\x0Bq end"),
        (2, "mail me@ex.org\tnow\x0B\x0Bok"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: r["clean_text"] for r in clean_text(df, "doc_id", "text").collect()}
    con = duckdb.connect()
    con.register("t", pd.DataFrame(rows, columns=["doc_id", "text"]))
    oracle = dict(
        con.execute(
            r"""
            SELECT doc_id,
                   trim(regexp_replace(
                     regexp_replace(
                       regexp_replace(text, 'https?://[^ \t\n\x0B\f\r]+', ' ', 'g'),
                       '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z][A-Za-z]+', ' ', 'g'),
                     '[ \t\n\x0B\f\r]+', ' ', 'g'))
            FROM t
            """
        ).fetchall()
    )
    assert got == oracle
    # \x0B collapsed like whitespace AND terminates the URL token
    assert "\x0b" not in got[1] and got[1] == "a b see q end"


def test_embedding_lsh_accepts_precomputed_count(spark, monkeypatch):
    """n_rows short-circuits the plan-build count() for non-scan inputs."""
    from hive_scd_spark.operators import dedup

    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(8)], "vec_id int, embedding array<double>"
    )

    def boom(self):
        raise AssertionError("count() must not run when n_rows is given")

    monkeypatch.setattr(type(df), "count", boom)
    out = dedup.embedding_near_dup_pairs(
        df, use_lsh=True, n_planes="auto", n_rows=1 << 20, target_bucket=32
    )
    assert set(out.columns) == {"id_a", "id_b", "cos"}


def test_prefix_sum_pid_guard(spark):
    """distributed_prefix_sum validates the RangePartitioner pid
    contract (distinct pids within [0, numPartitions)) and still
    produces the exact exclusive prefix sum."""
    from pyspark.sql import functions as F

    from hive_scd_spark.operators.pack import distributed_prefix_sum

    rows = [(i, (i * 7) % 5 + 1) for i in range(200)]
    df = spark.createDataFrame(rows, "id int, n int")
    out = {
        r["id"]: r["prefix"]
        for r in distributed_prefix_sum(df, [F.asc("id")], "n").collect()
    }
    acc = 0
    for i, n in rows:
        assert out[i] == acc
        acc += n
