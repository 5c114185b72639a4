"""snapshot/compaction pattern + type widening beyond the reference's
six primitives (decimal first — the reference's stated near-term want,
README.md:251-252; then date/timestamp/nested)."""

from __future__ import annotations

from decimal import Decimal

import pytest

from pyspark.sql import functions as F

from hive_scd_spark.scd import apply_statements, read_scd, snapshot


def test_snapshot_compaction_roundtrip(spark, tmp_path):
    # README.md:239-244: keep a Parquet "current snapshot", raw SCD for history
    dim = tmp_path / "dim"
    dim.mkdir()
    spark.createDataFrame(
        [(1, "x", 10.0), (2, "y", 20.0), (3, "z", 30.0)], "id int, n string, v double"
    ).write.mode("overwrite").parquet(str(dim))
    (dim / ".updates").write_text(
        "UPDATE d SET v = v * 2 WHERE id = 1;\nDELETE FROM d WHERE id = 3;"
    )
    snap = str(tmp_path / "snap")
    snapshot(read_scd(spark, str(dim), as_of=None, format="parquet"), snap)
    compacted = spark.read.parquet(snap)
    assert {(r.id, r.v) for r in compacted.collect()} == {(1, 20.0), (2, 20.0)}
    # history still reconstructable from the raw dir
    raw = read_scd(spark, str(dim), as_of=-1, format="parquet")
    assert raw.count() == 3


def test_decimal_column_update(spark):
    df = spark.createDataFrame(
        [(1, Decimal("10.50")), (2, Decimal("99.99"))], "id int, price decimal(10,2)"
    )
    out = apply_statements(
        df, "UPDATE t SET price = price * 2 WHERE id = 1;", as_of=None
    )
    rows = {r.id: r.price for r in out.collect()}
    assert rows[1] == Decimal("21.00")
    assert rows[2] == Decimal("99.99")
    assert out.schema["price"].dataType.simpleString() == "decimal(10,2)"


def test_timestamp_column_predicate_and_set(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (2, "2024-06-01 12:00:00")],
        "id int, ts_s string",
    ).select("id", F.col("ts_s").cast("timestamp").alias("ts"))
    out = apply_statements(
        df,
        "UPDATE t SET ts = timestamp'2024-12-31 00:00:00' "
        "WHERE ts < timestamp'2024-03-01 00:00:00';",
    )
    rows = {r.id: str(r.ts) for r in out.collect()}
    assert rows[1] == "2024-12-31 00:00:00"
    assert rows[2] == "2024-06-01 12:00:00"


def test_date_arithmetic_in_set(spark):
    df = spark.createDataFrame([(1, "2024-01-15")], "id int, d_s string").select(
        "id", F.col("d_s").cast("date").alias("d")
    )
    out = apply_statements(df, "UPDATE t SET d = date_add(d, 10);")
    assert str(out.collect()[0].d) == "2024-01-25"


def test_array_column_passthrough_and_update(spark):
    # nested/array types — beyond the reference's flat-only model
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0])], "id int, xs array<double>"
    )
    out = apply_statements(
        df, "UPDATE t SET xs = array(0.0) WHERE size(xs) = 1;"
    )
    rows = {r.id: list(r.xs) for r in out.collect()}
    assert rows == {1: [1.0, 2.0], 2: [0.0]}


def test_embedding_near_dup_lsh_subset_of_exact(spark):
    from hive_scd_spark.operators.dedup import embedding_near_dup_pairs

    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.99, 0.05, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.98, 0.1, 0.0]),
        (4, [-1.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    exact = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(df, threshold=0.9).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in embedding_near_dup_pairs(
            df, threshold=0.9, use_lsh=True, n_planes=2, dim=4
        ).collect()
    }
    assert exact == {(0, 1), (2, 3)}
    assert lsh <= exact  # LSH never invents pairs; may miss (recall < 1)


def test_token_counts(spark):
    from hive_scd_spark.operators.text import token_counts

    df = spark.createDataFrame([(1, "Hello, world! 42")], "doc_id long, text string")
    (row,) = token_counts(df, "doc_id", "text").collect()
    assert row.n_ws_tokens == 3
    assert row.n_regex_tokens == 5  # Hello , world ! 42
