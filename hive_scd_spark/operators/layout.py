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
      single-key range clustering — one well-chosen leading key
      captures most scans; when two-to-four columns genuinely share
      the filter load, :func:`write_zordered` interleaves them on a
      Morton key instead.

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


def zorder_key(
    cols: list[str],
    ranges: dict[str, tuple[float, float]],
    bits: int = 10,
):
    """Morton (Z-order) key column: interleave the bits of each
    column's *bits*-bit bucket index so that sorting by ONE key keeps
    locality in EVERY listed dimension — the public technique behind
    multi-column data-skipping layouts (space-filling curves; Morton
    1966).  Pure JVM column arithmetic — floor/shift/or per bit, no
    UDF, codegen-friendly.

    *ranges* maps each column to its (min, max) — metadata the caller
    owns (a 1-row aggregate, or table statistics); values outside the
    range clamp to the boundary buckets, so stale statistics degrade
    locality, never correctness.  NULLs map to bucket 0 explicitly
    (without the coalesce they would silently ride Spark's
    NULL-skipping least/greatest into the TOP bucket and cluster with
    the highest values)."""
    if not 1 <= len(cols) <= 4:
        raise ValueError("zorder_key supports 1-4 columns")
    if bits * len(cols) > 63:
        # the last interleaved shift is bits*n - 1; at >= 63 it lands in
        # (or wraps past) the long sign bit and the key ORDER silently
        # inverts for high buckets — the one failure mode a layout
        # helper must not have
        raise ValueError(
            f"bits * len(cols) must be <= 63 (got {bits} * {len(cols)}); "
            "lower bits or drop a column"
        )
    n = len(cols)
    key = F.lit(0).cast("long")
    for ci, c in enumerate(cols):
        lo, hi = ranges[c]
        span = float(hi) - float(lo)
        if span <= 0:
            raise ValueError(f"empty range for {c!r}: {ranges[c]}")
        bucket = F.floor(
            (F.col(c).cast("double") - F.lit(float(lo))) / F.lit(span)
            * F.lit(float(2**bits))
        ).cast("long")
        bucket = F.coalesce(bucket, F.lit(0).cast("long"))
        bucket = F.greatest(
            F.lit(0).cast("long"),
            F.least(bucket, F.lit(2**bits - 1).cast("long")),
        )
        for b in range(bits):
            key = key.bitwiseOR(
                F.shiftleft(
                    F.shiftright(bucket, b).bitwiseAND(F.lit(1).cast("long")),
                    b * n + ci,
                )
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    by: list[str],
    bits: int = 10,
    mode: str = "overwrite",
    n_files: int | None = None,
) -> None:
    """Z-order-clustered parquet write: range-partition + sort on the
    Morton key of *by*, so EVERY listed column gets narrow per-file
    min/max spans (parquet row-group skipping works on each dimension),
    where single-key clustering (``write_clustered``) serves only its
    leading key.  The price is resolution: with k columns each gets
    ~bits of the key, so per-dimension spans are ~1/2^(bits_used/k) of
    the domain per file instead of 1/files — the standard Z-order
    trade (tested: a selective filter on EITHER dimension touches a
    bounded fraction of files).

    Column ranges come from one metadata-sized min/max aggregate over
    the input (1 row, 2k values); callers with table statistics can
    avoid the pass by calling :func:`zorder_key` directly.

    *n_files* pins the output file count (an EXPLICIT range-partition
    width, which AQE respects — without it AQE coalesces a small
    shuffle to one partition and the clustering degenerates to a single
    full-span file).  Default None keeps the adaptive behavior: right
    at scale, where input volume sets the width; pass it when the
    file-count/span trade matters (compaction targets, layout tests).

    Degenerate columns degrade instead of crashing: an all-NULL or
    constant column carries zero skipping information, so it is
    DROPPED from the key (each surviving dimension keeps its own
    *bits* of resolution and the shorter key simply sorts on fewer
    interleaved bits); if every column degenerates — e.g. an empty
    input — the data is written as-is (there is nothing to cluster
    by)."""
    stats = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{c}") for c in by],
        *[F.max(c).cast("double").alias(f"hi_{c}") for c in by],
    ).first()
    ranges = {}
    for c in by:
        lo, hi = stats[f"lo_{c}"], stats[f"hi_{c}"]
        if lo is None or hi is None or not hi > lo:
            continue  # all-NULL / constant / empty: no information
        ranges[c] = (lo, hi)
    if not ranges:
        df.write.mode(mode).parquet(path)
        return
    keyed = df.withColumn("__z", zorder_key(list(ranges), ranges, bits))
    parted = (
        keyed.repartitionByRange(n_files, "__z")
        if n_files is not None
        else keyed.repartitionByRange("__z")
    )
    out = parted.sortWithinPartitions("__z").drop("__z")
    out.write.mode(mode).parquet(path)


def file_spans(path: str, cols: list[str]) -> list[dict]:
    """Per-file [min, max] spans for *cols*, read from parquet footers
    (pyarrow; no data pages touched).  This is the measurement half of
    the layout contract: a clustering write is WORKING iff selective
    predicates intersect few files' spans — the same footer stats
    Spark's reader uses for row-group skipping.  Driver-side by design
    (footers are metadata; a 100 TB table's footers are MBs) — used by
    tests and the layout gate, not by any data path."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        spans = {}
        for c in cols:
            ci = names[c]
            lo = hi = None
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(ci).statistics
                if st is None or not st.has_min_max:
                    lo = hi = None
                    break
                lo = st.min if lo is None else min(lo, st.min)
                hi = st.max if hi is None else max(hi, st.max)
            spans[c] = (lo, hi)
        out.append({"file": name, **{c: spans[c] for c in cols}})
    return out


def files_touched(path: str, col: str, lo, hi) -> tuple[int, int]:
    """(touched, total): how many parquet files under *path* a reader
    must open for ``col BETWEEN lo AND hi``, by footer min/max
    intersection — files with missing stats count as touched (a reader
    cannot skip what it cannot bound)."""
    spans = file_spans(path, [col])
    total = len(spans)
    touched = 0
    for s in spans:
        fmin, fmax = s[col]
        if fmin is None or fmax is None or (fmax >= lo and fmin <= hi):
            touched += 1
    return touched, total
