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
from pyspark.sql import functions as F

# Logical nodes that cannot introduce an exchange: probing .rdd under
# these is pure physical planning, no job, even with AQE.  Anything
# outside this set (Join/Aggregate/Window/Repartition/...) means the
# input already passes through a shuffle whose width is
# spark.sql.shuffle.partitions — wide enough, and probing .rdd there
# would eagerly materialize upstream query stages under AQE.
_NARROW_NODES = frozenset(
    {
        "Project",
        "Filter",
        "Relation",
        "LogicalRelation",
        "LogicalRDD",
        "SubqueryAlias",
        "View",
        "LocalRelation",
        "Range",
    }
)


def _is_narrow_scan(df: DataFrame) -> bool:
    """True iff the analyzed logical plan is scan-shaped (projections /
    filters over a relation) — the only inputs whose partition count is
    worth probing and safe to probe."""
    try:
        stack = [df._jdf.queryExecution().analyzed()]
        while stack:
            node = stack.pop()
            if node.nodeName() not in _NARROW_NODES:
                return False
            children = node.children()
            for i in range(children.size()):
                stack.append(children.apply(i))
        return True
    except Exception:
        return False  # unknown plan shape — don't touch .rdd


def fan_out(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition *df* up to the cluster default parallelism iff it is
    a narrow scan whose physical layout yields fewer partitions.
    Derived inputs (plans containing joins/aggregates) are returned
    unchanged: their shuffle already set the width, and converting them
    to an RDD would eagerly run upstream stages under AQE.
    Deterministic for the operators using it (their aggregates are
    order-insensitive: min/count/per-row folds)."""
    if not _is_narrow_scan(df):
        return df
    sc = df.sparkSession.sparkContext
    target = min_partitions if min_partitions is not None else sc.defaultParallelism
    # .rdd triggers physical planning (no job) to learn the real split count
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def write_clustered(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Pruning-optimized parquet layout: hive-style directory
    partitioning for partition pruning + range clustering for parquet
    row-group min/max skipping.

    At 100 TB the scan you DON'T do is the fastest one; this writer
    arranges the two mechanisms Spark's reader exploits for free:

    - *partition_by*: low-cardinality columns become directories;
      readers with equality/range predicates on them never list, let
      alone open, the pruned directories (``PartitionFilters`` in the
      scan — asserted in tests).
    - *cluster_by*: each file covers a narrow key span, so parquet's
      per-row-group min/max stats skip whole files for selective
      predicates (footer-span evidence asserted in tests).  This is
      the Z-order-lite layout: single-key range clustering —
      multi-key interleaving is a deliberate non-goal (it needs a
      space-filling-curve expression, and one well-chosen leading key
      captures most scans).

    The task routing solves the small-files problem and hot-partition
    skew in one move: rows are RANGE-partitioned on
    ``partition_by + cluster_by`` and sorted the same way within each
    task.  The range partitioner balances by ROW COUNT (it samples the
    data), so a hot partition value simply spans proportionally more
    tasks/files, while cold values share a task — total files stay
    bounded by the shuffle partition count (plus one boundary file per
    directory), with no per-partition fan-out knob to tune.  The naive
    ``partitionBy`` write would instead produce
    (input tasks × partition values) files."""
    partition_by = partition_by or []
    cluster_by = cluster_by or []
    keys = partition_by + cluster_by
    if not keys:
        raise ValueError("need partition_by and/or cluster_by")
    out = df.repartitionByRange(*keys).sortWithinPartitions(*keys)
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
