"""scd.time session conf, multi-format SCD sources, skew utilities."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hive_scd_spark.scd import SCD_TIME_CONF, read_scd


@pytest.fixture()
def dim_dir(spark, tmp_path):
    d = tmp_path / "dim"
    d.mkdir()
    spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, name string"
    ).write.mode("overwrite").parquet(str(d))
    (d / ".updates").write_text(
        "UPDATE d SET name = upper(name) WHERE id = 1;\n"
        "-- time=2030-01-01\n"
        "DELETE FROM d WHERE id = 3;\n"
    )
    return str(d)


def test_scd_time_session_conf(spark, dim_dir):
    # mirrors Hive `set scd.time=...` (README.md:172-217)
    try:
        spark.conf.set(SCD_TIME_CONF, "-1")
        assert read_scd(spark, dim_dir, format="parquet").count() == 3
        spark.conf.set(SCD_TIME_CONF, "2031-01-01")
        rows = {r.id: r.name for r in read_scd(spark, dim_dir, format="parquet").collect()}
        assert rows == {1: "A", 2: "b"}
        spark.conf.set(SCD_TIME_CONF, "")  # empty → now (before 2030)
        assert read_scd(spark, dim_dir, format="parquet").count() == 3
    finally:
        spark.conf.unset(SCD_TIME_CONF)
    # explicit as_of still wins over the conf default path
    assert read_scd(spark, dim_dir, format="parquet", as_of=-1).count() == 3


@pytest.mark.parametrize("fmt", ["json", "csv", "orc"])
def test_scd_over_other_formats(spark, tmp_path, fmt):
    # §2.B sources row: the SCD layer is format-agnostic
    d = tmp_path / f"dim_{fmt}"
    d.mkdir()
    base = spark.createDataFrame([(1, "x"), (2, "y")], "id int, name string")
    writer = base.coalesce(1).write.mode("overwrite")
    options = {}
    if fmt == "csv":
        writer = writer.option("header", True)
        options = {"header": True, "inferSchema": True}
    getattr(writer, fmt)(str(d))
    (d / ".updates").write_text("DELETE FROM dim WHERE id = 2;")
    schema = "id int, name string" if fmt == "json" else None
    out = read_scd(spark, str(d), format=fmt, schema=schema, options=options)
    assert [r.id for r in out.collect()] == [1]


def test_salted_agg_matches_plain(spark):
    from hive_scd_spark.operators.skew import salted_agg

    # 90% of rows share one hot key
    df = spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, F.lit("HOT")).otherwise(F.lit("cold")).alias("k"),
        F.col("id").cast("double").alias("x"),
    )
    plain = {
        (r.k): (r.n, r.total)
        for r in df.groupBy("k")
        .agg(F.count("*").alias("n"), F.sum("x").alias("total"))
        .collect()
    }
    salted = {
        (r.k): (r.n, r.total)
        for r in salted_agg(
            df,
            ["k"],
            {
                "n": (F.count("*"), F.sum("n")),
                "total": (F.sum("x"), F.sum("total")),
            },
            n_salts=8,
        ).collect()
    }
    assert salted == plain


def test_salted_join_matches_plain(spark):
    from hive_scd_spark.operators.skew import salted_join

    big = spark.range(5000).select(
        (F.col("id") % 3).alias("k"), F.col("id").alias("v")
    )
    small = spark.createDataFrame(
        [(0, "zero"), (1, "one"), (2, "two")], "k long, label string"
    )
    plain = big.join(small, "k").select("v", "label")
    salted = salted_join(big, small, on="k", n_salts=4).select("v", "label")
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_resolve_as_of_rejects_fractional_float():
    import pytest as _pytest

    from hive_scd_spark.scd import resolve_as_of

    assert resolve_as_of(1700000000000) == 1700000000000
    assert resolve_as_of(1700000000000.0) == 1700000000000  # exact float ok
    with _pytest.raises(TypeError, match="not an integer millisecond"):
        resolve_as_of(1700000000.5)  # epoch-seconds unit bug shape


def test_release_shared_caches(spark):
    """The session pair cache has an explicit release path (VERDICT r6
    nit 2): release drops + unpersists this session's entries, the next
    consumer rebuilds, and a second release is a no-op returning 0."""
    from hive_scd_spark import queries as Q

    sf = "/root/testdata/sf0.001"
    a = Q.shared_minhash_pairs(spark, sf)
    assert Q.shared_minhash_pairs(spark, sf) is a  # cache hit
    assert Q.release_shared_caches(spark) == 1
    assert a.storageLevel.useMemory is False  # unpersisted
    b = Q.shared_minhash_pairs(spark, sf)
    assert b is not a  # rebuilt
    assert Q.release_shared_caches() == 1  # global form
    assert Q.release_shared_caches(spark) == 0


# --- deterministic weighted sampling (r7) -----------------------------


def test_sample_weighted_matches_python_replay(spark):
    """The whole selection is md5-exact: a Python replay of the
    max-of-w-tickets priority must pick the identical winner set."""
    import hashlib

    from hive_scd_spark.operators.sampling import sample_weighted

    rows = [(i, (i * 7) % 12 + 1) for i in range(300)]
    # a NULL weight must behave as zero tickets (dropped), not crash
    df = spark.createDataFrame(rows + [(999, None)], "id long, wt int")
    got = sorted(r.id for r in sample_weighted(df, "id", "wt", 40).collect())

    def priority(i, w):
        return max(
            hashlib.md5(f"{i}:{j}".encode()).hexdigest() for j in range(1, w + 1)
        )

    want = sorted(
        i
        for i, _ in sorted(
            ((i, priority(i, w)) for i, w in rows),
            key=lambda t: (t[1], -t[0]),
            reverse=True,
        )[:40]
    )
    assert got == want


def test_sample_weighted_prefers_heavy_drops_zero_rejects_huge(spark):
    import pytest as _pytest

    from hive_scd_spark.operators.sampling import sample_weighted

    rows = [(i, 9 if i < 1000 else 1) for i in range(2000)]
    rows += [(9999, 0)]  # zero tickets → never sampled
    df = spark.createDataFrame(rows, "id long, wt int")
    picked = [r.id for r in sample_weighted(df, "id", "wt", 200).collect()]
    assert len(picked) == 200 and 9999 not in picked
    heavy = sum(1 for i in picked if i < 1000)
    assert heavy > 150  # weight-9 items dominate (expected ~0.9)

    bad = spark.createDataFrame([(1, 5000)], "id long, wt int")
    with _pytest.raises(Exception, match="max_weight"):
        sample_weighted(bad, "id", "wt", 1).collect()
