"""Many-partition-dir SCD: identical scripts must compile once and
read in a single scan (the A11 scale property, SURVEY §7.3)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hive_scd_spark.plans import plan_summary
from hive_scd_spark.scd import read_scd


def test_fifty_dirs_identical_script_single_scan(spark, tmp_path):
    base = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("v")
    )
    script = "UPDATE t SET v = v + 1 WHERE id % 2 = 0;"
    for part in range(50):
        d = tmp_path / f"p={part}"
        base.filter(F.col("id") % 50 == part).write.mode("overwrite").parquet(str(d))
        (d / ".updates").write_text(script)
    out = read_scd(spark, str(tmp_path), as_of=None, format="parquet")
    # 50 dirs share one script text → ONE grouped read, not 50 unions
    assert plan_summary(out)["scans"] == 1
    assert out.count() == 1000
    evens = out.filter(F.col("id") % 2 == 0).agg(F.sum("v")).first()[0]
    raw_evens = base.filter(F.col("id") % 2 == 0).agg(F.sum("v") + F.count("*")).first()[0]
    assert evens == raw_evens


def test_mixed_scripts_group_by_content(spark, tmp_path):
    base = spark.range(100).select(F.col("id"), F.lit("x").alias("tag"))
    for part in range(6):
        d = tmp_path / f"p={part}"
        base.filter(F.col("id") % 6 == part).write.mode("overwrite").parquet(str(d))
        # two distinct script texts across six dirs → two scan groups
        script = (
            "UPDATE t SET tag = 'a';" if part % 2 == 0 else "UPDATE t SET tag = 'b';"
        )
        (d / ".updates").write_text(script)
    out = read_scd(spark, str(tmp_path), as_of=None, format="parquet")
    assert plan_summary(out)["scans"] == 2
    tags = {r.tag for r in out.select("tag").distinct().collect()}
    assert tags == {"a", "b"}
