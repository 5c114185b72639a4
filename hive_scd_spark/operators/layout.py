"""Input-layout parallelism guard for expansion-heavy operators.

Small parquet inputs often arrive as a single split (parquet only
splits at row-group boundaries — see SCALE_NOTES.md), which serializes
per-row-EXPENSIVE operators (shingle explode + md5, vector folds) onto
one core no matter how wide the cluster is.  :func:`fan_out` adds a
repartition ONLY when the scan has fewer partitions than the cluster's
default parallelism:

- small input → one tiny shuffle (the un-exploded rows) buys full
  parallelism for the expansion that follows;
- at real scale (100 TB → thousands of splits ≥ cores) the condition
  is false and NO shuffle is added — the guard cannot regress the
  large-data path.

Only used by operators whose per-row cost dwarfs a row shuffle
(dedup signatures, ANN scoring) — plain projections/aggregations keep
their scan-aligned layout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition *df* up to the cluster default parallelism iff its
    current plan yields fewer partitions.  Deterministic for the
    operators using it (their aggregates are order-insensitive:
    min/count/per-row folds)."""
    sc = df.sparkSession.sparkContext
    target = min_partitions if min_partitions is not None else sc.defaultParallelism
    # .rdd triggers physical planning (no job) to learn the real split count
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
