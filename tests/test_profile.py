"""table_profile: per-column stats, null/all-null edges, approx path."""

from __future__ import annotations

from hive_scd_spark.operators.profile import table_profile


def _by_col(rows):
    return {r["col_name"]: r for r in rows}


def test_profile_counts_nulls_distinct_minmax(spark):
    df = spark.createDataFrame(
        [(1, "a", 2.5), (2, "a", None), (3, None, 0.5), (4, "b", 0.5)],
        "id bigint, s string, x double",
    )
    p = _by_col(table_profile(df).collect())
    assert set(p) == {"id", "s", "x"}
    assert all(r["n_rows"] == 4 for r in p.values())
    assert (p["id"]["n_nulls"], p["id"]["n_distinct"]) == (0, 4)
    assert (p["s"]["n_nulls"], p["s"]["n_distinct"]) == (1, 2)
    assert (p["x"]["n_nulls"], p["x"]["n_distinct"]) == (1, 2)
    # min/max computed on the NATIVE type, then stringified: numeric
    # ordering, not lexicographic ("10" would sort before "9")
    wide = spark.createDataFrame([(9,), (10,)], "v bigint")
    pw = _by_col(table_profile(wide).collect())
    assert (pw["v"]["min_str"], pw["v"]["max_str"]) == ("9", "10")


def test_profile_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id bigint, dead string")
    p = _by_col(table_profile(df).collect())
    assert p["dead"]["n_nulls"] == 2
    assert p["dead"]["n_distinct"] == 0
    assert p["dead"]["min_str"] is None and p["dead"]["max_str"] is None


def test_profile_approx_path_within_tolerance(spark):
    df = spark.range(2000).selectExpr("id", "cast(id % 37 as string) as s")
    p = _by_col(table_profile(df, exact=False).collect())
    assert abs(p["s"]["n_distinct"] - 37) <= 3
    assert abs(p["id"]["n_distinct"] - 2000) <= 2000 * 0.05


def test_profile_negative_zero_counts_once(spark):
    """-0.0 and 0.0 are SQL-equal; the melt's string rendering must not
    double-count them (was a confirmed overcount)."""
    df = spark.createDataFrame([(0.0,), (-0.0,), (1.5,)], "x double")
    p = _by_col(table_profile(df).collect())
    assert p["x"]["n_distinct"] == 2


def test_profile_binary_distinct_is_byte_exact(spark):
    """Distinct byte values that collide under UTF-8-with-replacement
    string rendering must still count separately (ADVICE r6: the cast
    path replaced invalid sequences, so 0x80 and 0x81 both rendered as
    U+FFFD and 'exact' undercounted).  base64 keys are injective."""
    import pytest

    df = spark.createDataFrame(
        [(bytearray(b"\x80"),), (bytearray(b"\x81"),), (bytearray(b"\x80"),)],
        "b binary",
    )
    p = _by_col(table_profile(df).collect())
    assert p["b"]["n_distinct"] == 2
    # min/max render as base64 of the byte-order min/max
    assert p["b"]["min_str"] == "gA=="  # b"\x80"
    assert p["b"]["max_str"] == "gQ=="  # b"\x81"


def test_profile_complex_columns_error_or_skip(spark):
    import pytest

    df = spark.createDataFrame([(1, [1, 2])], "id bigint, arr array<int>")
    with pytest.raises(ValueError, match="complex-typed columns.*arr"):
        table_profile(df)
    p = _by_col(table_profile(df, on_complex="skip").collect())
    assert set(p) == {"id"}
    with pytest.raises(ValueError, match="no profilable"):
        table_profile(df.select("arr"), on_complex="skip")
    with pytest.raises(ValueError, match="on_complex"):
        table_profile(df, on_complex="bogus")


# --- mergeable histogram-quantile sketch (r7) -------------------------


def test_histogram_merge_equals_direct_build(spark):
    """Per-group build + merge must equal the direct global build
    exactly — bucket assignment is grouping-independent and counts are
    integers; this identity is what makes the sketch persistable."""
    from hive_scd_spark.operators.profile import histogram_merge, histogram_sketch

    df = spark.range(1000).selectExpr(
        "cast(id % 7 as string) as g", "cast(id * 37 % 997 as double) as v"
    )
    direct = {
        (r.bucket, r.cnt)
        for r in histogram_sketch(df, "v", 0.0, 997.0, 32).collect()
    }
    merged = {
        (r.bucket, r.cnt)
        for r in histogram_merge(
            histogram_sketch(df, "v", 0.0, 997.0, 32, by=["g"])
        ).collect()
    }
    assert merged == direct
    assert sum(c for _, c in direct) == 1000


def test_histogram_quantiles_within_bucket_width(spark):
    from hive_scd_spark.operators.profile import histogram_quantiles, histogram_sketch

    import random

    rng = random.Random(7)
    vals = [rng.uniform(0, 100) ** 2 for _ in range(2000)]  # skewed
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    lo, hi, nb = 0.0, 10000.0, 64
    width = (hi - lo) / nb
    sk = histogram_sketch(df, "v", lo, hi, nb)
    got = {r.p: r.est for r in histogram_quantiles(sk, [0.5, 0.9, 0.99], lo, hi, nb).collect()}
    svals = sorted(vals)
    for p in (0.5, 0.9, 0.99):
        exact = svals[int(p * (len(svals) - 1))]
        assert abs(got[p] - exact) <= width + 1e-6, (p, got[p], exact)


def test_histogram_sketch_clamps_out_of_range_and_rejects_bad_range(spark):
    import pytest as _pytest

    from hive_scd_spark.operators.profile import histogram_sketch

    df = spark.createDataFrame(
        [(-5.0,), (0.5,), (9.5,), (50.0,), (None,)], "v double"
    )
    rows = {r.bucket: r.cnt for r in histogram_sketch(df, "v", 0.0, 10.0, 10).collect()}
    assert rows[0] == 2          # -5 clamps down, 0.5 lands
    assert rows[9] == 2          # 9.5 lands, 50 clamps up
    assert sum(rows.values()) == 4  # NULL excluded
    with _pytest.raises(ValueError, match="hi > lo"):
        histogram_sketch(df, "v", 10.0, 10.0, 10)


def test_histogram_streaming_ingest_matches_batch(spark, tmp_path):
    """N micro-batches through histogram_ingest_sink, merged, must
    equal the one-shot batch sketch — the sum-merge identity driven
    through the streaming engine's delivery machinery."""
    from hive_scd_spark.operators.profile import (
        histogram_merge,
        histogram_quantiles,
        histogram_sketch,
    )
    from hive_scd_spark.streaming import histogram_ingest_sink, read_histogram_state

    rows1 = [(float(v),) for v in range(0, 500, 3)]
    rows2 = [(float(v * v % 997),) for v in range(400)]
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(rows1, "v double").coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    stream = spark.readStream.schema("v double").parquet(str(src))
    sink = histogram_ingest_sink(
        stream,
        state_path=str(tmp_path / "state"),
        checkpoint=str(tmp_path / "ckpt"),
        value_col="v",
        lo=0.0,
        hi=1000.0,
        n_buckets=32,
    )
    q = sink.start()
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, "v double").coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()

    # the replay-safe read path: (epoch, bucket) dedup before merge
    state = read_histogram_state(spark, str(tmp_path / "state"))
    # a simulated replay (duplicate epoch rows) must NOT double-count
    raw = spark.read.parquet(str(tmp_path / "state"))
    raw.limit(5).write.mode("append").parquet(str(tmp_path / "state"))
    state = read_histogram_state(spark, str(tmp_path / "state"))
    merged = {
        (r.bucket, r.cnt) for r in histogram_merge(state).collect()
    }
    direct = {
        (r.bucket, r.cnt)
        for r in histogram_sketch(
            spark.createDataFrame(rows1 + rows2, "v double"), "v", 0.0, 1000.0, 32
        ).collect()
    }
    assert merged == direct
    # and the merged state answers quantiles identically
    qs_stream = {
        r.p: r.est
        for r in histogram_quantiles(
            histogram_merge(state), [0.5, 0.9], 0.0, 1000.0, 32
        ).collect()
    }
    qs_batch = {
        r.p: r.est
        for r in histogram_quantiles(
            histogram_sketch(
                spark.createDataFrame(rows1 + rows2, "v double"), "v", 0.0, 1000.0, 32
            ),
            [0.5, 0.9],
            0.0,
            1000.0,
            32,
        ).collect()
    }
    assert qs_stream == qs_batch


def test_histogram_quantiles_bound_vs_order_statistic(spark):
    """The PRECISE guarantee (review r7): the estimate is within one
    bucket width of the rank-ceil(p*N) ORDER STATISTIC — including on
    gapped bimodal data where the INTERPOLATED percentile sits far
    from both clusters and the naive bound claim would fail."""
    import math
    import random

    from hive_scd_spark.operators.profile import histogram_quantiles, histogram_sketch

    rng = random.Random(3)
    corpora = [
        # the adversarial case: two tight clusters, p=0.5 on the boundary
        [float(rng.randint(0, 50)) for _ in range(50)]
        + [float(rng.randint(499950, 500000)) for _ in range(50)],
        # a smooth case
        [rng.uniform(0, 500000) for _ in range(777)],
    ]
    lo, hi, nb = 0.0, 500000.0, 64
    width = (hi - lo) / nb
    for vals in corpora:
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        sk = histogram_sketch(df, "v", lo, hi, nb)
        got = {
            r.p: r.est
            for r in histogram_quantiles(sk, [0.5, 0.9, 0.99], lo, hi, nb).collect()
        }
        svals = sorted(vals)
        for p in (0.5, 0.9, 0.99):
            order_stat = svals[math.ceil(p * len(svals)) - 1]
            assert abs(got[p] - order_stat) <= width + 1e-6, (p, got[p], order_stat)
