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
