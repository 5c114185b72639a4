"""write_clustered: partition pruning + range clustering evidence."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from contextlib import contextmanager

from hive_scd_spark.operators.layout import write_clustered
from hive_scd_spark.plans import physical_plan


@contextmanager
def no_coalesce(spark):
    """AQE partition coalescing off — at test scale it merges ALL the
    tiny range partitions into one (at real scale that merging is the
    wanted right-sizing to ~advisoryPartitionSize files), hiding the
    layout behavior under test."""
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try:
        yield
    finally:
        spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")


def test_partition_pruning_and_bounded_files(spark, tmp_path):
    df = spark.range(10000).select(
        "id",
        (F.col("id") % 5).alias("p"),
        F.rand(7).alias("x"),
    )
    out = str(tmp_path / "t")
    write_clustered(df, out, partition_by=["p"], cluster_by=["id"])
    # total files bounded by shuffle partitions + one boundary file per
    # directory — NOT (tasks x partition values)
    n_shuffle = int(spark.conf.get("spark.sql.shuffle.partitions"))
    total = sum(
        1
        for d in glob.glob(os.path.join(out, "p=*"))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )
    assert total <= n_shuffle + 5
    back = spark.read.parquet(out).filter(F.col("p") == 3)
    plan = physical_plan(back)
    # the partition predicate must reach the file index (directory
    # pruning), not run as a post-scan filter
    assert "PartitionFilters: [isnotnull(p" in plan
    assert back.count() == 2000


def test_hot_partition_spans_more_files(spark, tmp_path):
    # p=0 holds 90% of rows; range partitioning by row count must give
    # it proportionally more files than a cold partition
    df = spark.range(20000).select(
        "id", F.when(F.col("id") % 10 < 9, 0).otherwise(1).alias("p")
    )
    out = str(tmp_path / "t2")
    with no_coalesce(spark):
        write_clustered(df, out, partition_by=["p"], cluster_by=["id"])
    counts = {
        os.path.basename(d): sum(
            1 for f in os.listdir(d) if f.endswith(".parquet")
        )
        for d in glob.glob(os.path.join(out, "p=*"))
    }
    assert counts["p=0"] > counts["p=1"]


def _x_file_spans(spark, out, col):
    spans = []
    for f in glob.glob(os.path.join(out, "*.parquet")):
        r = spark.read.parquet(f).agg(
            F.min(col).alias("lo"), F.max(col).alias("hi")
        ).first()
        spans.append((r.lo, r.hi))
    return spans


def test_range_clustering_gives_narrow_file_spans(spark, tmp_path):
    n = 40000
    df = spark.range(n).select(F.col("id").alias("k"), F.rand(11).alias("v"))
    # shuffle the rows so the input arrives unclustered
    df = df.orderBy(F.rand(13))
    out = str(tmp_path / "t3")
    with no_coalesce(spark):
        write_clustered(df, out, cluster_by=["k"])
    files = glob.glob(os.path.join(out, "*.parquet"))
    assert len(files) > 1
    spans = _x_file_spans(spark, out, "k")
    # each file covers a narrow, non-overlapping slice of the key space
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2
    assert sum(hi - lo for lo, hi in spans) < n  # narrow slices, not the full span each


def test_zorder_skips_on_both_dimensions(spark, tmp_path):
    """Z-order: a selective filter on EITHER column overlaps only a
    bounded fraction of files; single-key clustering serves only its
    leading key (the y-spans of x-clustered files cover ~the whole
    domain)."""
    from hive_scd_spark.operators.layout import write_zordered

    n = 60000
    df = (
        spark.range(n)
        .select(
            (F.rand(5) * 1000).alias("x"),
            (F.rand(17) * 1000).alias("y"),
        )
    )
    zout = str(tmp_path / "z")
    cout = str(tmp_path / "c")
    with no_coalesce(spark):
        write_zordered(df, zout, by=["x", "y"], bits=10)
        write_clustered(df, cout, cluster_by=["x"])

    def overlap_fraction(out, col, lo, hi):
        spans = _x_file_spans(spark, out, col)
        assert len(spans) > 2
        touched = sum(1 for s_lo, s_hi in spans if s_hi >= lo and s_lo <= hi)
        return touched / len(spans)

    # a 5%-of-domain filter on either z-ordered dimension skips files
    assert overlap_fraction(zout, "x", 100, 150) < 0.8
    assert overlap_fraction(zout, "y", 100, 150) < 0.8
    # the single-key layout skips on its key but NOT the other column
    assert overlap_fraction(cout, "x", 100, 150) < 0.5
    assert overlap_fraction(cout, "y", 100, 150) == 1.0


def test_zorder_key_validates_input(spark):
    from hive_scd_spark.operators.layout import zorder_key

    import pytest

    with pytest.raises(ValueError, match="supports 1-4"):
        zorder_key(["a", "b", "c", "d", "e"], {})
    with pytest.raises(ValueError, match="empty range"):
        zorder_key(["a"], {"a": (3.0, 3.0)})


def test_zorder_guards_and_degenerate_columns(spark, tmp_path):
    import pytest

    from hive_scd_spark.operators.layout import write_zordered, zorder_key

    # sign-bit overflow guard
    with pytest.raises(ValueError, match="<= 63"):
        zorder_key(["a", "b", "c", "d"], {c: (0.0, 1.0) for c in "abcd"}, bits=16)
    # NULLs map to bucket 0, not the top bucket
    df = spark.createDataFrame([(None,), (0.0,), (1000.0,)], "x double")
    keyed = df.withColumn(
        "z", zorder_key(["x"], {"x": (0.0, 1000.0)}, bits=4)
    ).collect()
    z = {r.x: r.z for r in keyed}
    assert z[None] == 0 and z[1000.0] == 15
    # constant column drops out of the key; all-degenerate writes as-is
    mixed = spark.range(100).select(
        F.col("id").cast("double").alias("a"), F.lit(7.0).alias("b")
    )
    out1 = str(tmp_path / "m")
    write_zordered(mixed, out1, by=["a", "b"])
    assert spark.read.parquet(out1).count() == 100
    empty = spark.createDataFrame([], "a double, b double")
    out2 = str(tmp_path / "e")
    write_zordered(empty, out2, by=["a", "b"])
    assert spark.read.parquet(out2).count() == 0


def test_layout_zorder_skipping_gate_bounds(spark):
    """The r7 layout contract gate: in-gate assertions already enforce
    the ≤60 % bound and z < random; here we pin the shape and that the
    random baseline is genuinely un-skippable (every file spans the
    domain) so the comparison means something."""
    from hive_scd_spark.queries import layout_zorder_skipping

    rows = {r.dim: r for r in layout_zorder_skipping(spark, "/root/testdata/sf0.001").collect()}
    assert set(rows) == {"o_custkey", "o_totalprice"}
    for r in rows.values():
        # floor 64 at small sf; rows/512 beyond (constant-file-size rule)
        assert r.n_files_z == r.n_files_rand == 64
        assert r.touched_z <= 0.6 * r.n_files_z
        assert r.touched_z < r.touched_rand
        # random layout: every file spans ~the full domain
        assert r.touched_rand >= 0.9 * r.n_files_rand


def test_write_zordered_n_files_pins_file_count(spark, tmp_path):
    """Explicit n_files survives AQE (adaptive coalescing shrank a
    small shuffle to ONE file, degenerating the clustering — the gate
    caught it); default stays adaptive."""
    import os

    from hive_scd_spark.operators.layout import write_zordered

    df = spark.range(2000).selectExpr("id as a", "(id * 37) % 2000 as b")
    p = str(tmp_path / "z")
    write_zordered(df, p, by=["a", "b"], n_files=8)
    n = sum(1 for f in os.listdir(p) if f.endswith(".parquet"))
    assert n == 8
