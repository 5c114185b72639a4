"""Bucketing: pre-shuffled tables join without an Exchange."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from hive_scd_spark.plans import plan_summary
from hive_scd_spark.sources.bucketed import bucketed_join, write_bucketed


def test_bucketed_join_has_no_shuffle(spark):
    left = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v1")
    )
    right = spark.range(10000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v2")
    )
    write_bucketed(left, "bk_left", "k", n_buckets=4)
    write_bucketed(right, "bk_right", "k", n_buckets=4)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force a sort-merge join so the Exchange (or its absence) shows
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "bk_left", "bk_right", on="k")
        summary = plan_summary(joined)
        assert summary["sortmerge_joins"] == 1
        assert summary["shuffles"] == 0  # co-located: no Exchange at all
        assert joined.count() == 10000
        # contrast: the same join over plain parquet shuffles both sides
        plain = left.join(right, "k")
        assert plan_summary(plain)["shuffles"] >= 1
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_bucketed_agg_has_no_shuffle(spark):
    df = spark.range(5000).select((F.col("id") % 100).alias("k"), F.col("id").alias("v"))
    write_bucketed(df, "bk_agg", "k", n_buckets=4)
    try:
        agg = spark.table("bk_agg").groupBy("k").agg(F.sum("v").alias("s"))
        assert plan_summary(agg)["shuffles"] == 0
        assert agg.count() == 100
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_agg")
