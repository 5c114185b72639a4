"""Bucketed-table helpers: pre-shuffle once at write time so every
later join/aggregation on the bucket key is co-located.

At 100 TB this is the difference between re-shuffling the fact table
for every join and never shuffling it again: ``bucketBy(n, key)``
hash-partitions files at write; Spark's scan then reports the
partitioning, and joins/aggs on the key skip their Exchange entirely
(verified by plan test).  Bucket counts should be sized so one bucket
≈ one task's worth of data at the target scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist *df* as a bucketed (and optionally sorted) managed
    table.  Sorting within buckets additionally removes the Sort before
    a sort-merge join."""
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str, how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on *on* — shuffle-free when bucket
    counts match."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
