"""Sequence packing for pretraining-data export.

GPT-style pretraining consumes fixed-length token sequences; the
standard way to build them ("concat and chunk") concatenates every
document's tokens in a deterministic order into one global stream and
slices that stream into ``context_len``-sized windows.  The operator
here computes, for every document, WHICH sequences its tokens land in
and at what offsets — the exact shuffle-free metadata a downstream
tokenized-shard writer needs.

The only global coordination required is an exclusive prefix sum of
token counts in the concatenation order.  A naive
``sum() OVER (ORDER BY id)`` pulls every row through ONE window
partition — the same scale-killer ``shard.distributed_rank`` exists to
avoid — so :func:`distributed_prefix_sum` uses the identical two-phase
layout: range repartition, partition-local cumsum, and a driver-side
cumsum over per-partition totals (metadata-sized, one row per shuffle
partition).

Output volume: each document spans ``ceil(n_tokens/context_len)+1``
sequences at most, so the result is ``~total_tokens/context_len +
n_docs`` rows — linear, never quadratic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def distributed_prefix_sum(
    df: DataFrame, order_cols: list, value_col, name: str = "prefix"
) -> DataFrame:
    """EXCLUSIVE prefix sum of *value_col* over the total order given by
    *order_cols* (list of Columns; must include a unique tiebreak or the
    result is nondeterministic), without a single-partition window.

    Same two-phase construction as ``shard.distributed_rank`` (see its
    docstring for the exchange-reuse rationale behind the checkpoint):
    range-partition on the order, cumsum within partitions, then offset
    each partition by the driver-side cumsum of per-partition totals —
    the collected counts are one row per shuffle partition, bounded by
    cluster width, never by data volume.

    Two invariants this leans on, stated explicitly:

    - **localCheckpoint is non-reliable storage** (executor-local
      blocks, not the checkpoint dir): losing an executor AFTER the
      totals were collected makes the returned DataFrame
      unrecomputable — the job fails rather than silently recomputing
      against a different partitioning (same failure mode, and same
      rationale, as the checkpoint in ``cluster.dup_clusters``).  On a
      cluster, rerun the job; reliable ``checkpoint()`` is the
      opt-in alternative when the extra HDFS round-trip is worth it.
    - **repartitionByRange assigns ascending key ranges to ascending
      partition ids** (RangePartitioner's contract — partition i holds
      keys < partition i+1's).  The driver-side offset accumulation in
      pid order below IS the global order only because of this; the
      pid-set sanity check guards the assumption loudly."""
    val = F.col(value_col) if isinstance(value_col, str) else value_col
    work = df.withColumn("__val", val.cast("long"))
    parts = work.repartitionByRange(*order_cols)
    with_pid = parts.withColumn("__pid", F.spark_partition_id()).localCheckpoint(
        eager=False
    )
    local = with_pid.withColumn(
        "__isum",
        F.sum("__val").over(
            W.partitionBy("__pid")
            .orderBy(*order_cols)
            .rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    totals = sorted(
        with_pid.groupBy("__pid").agg(F.sum("__val").alias("__t")).collect(),
        key=lambda r: r["__pid"],
    )
    # guard the RangePartitioner pid assumption: every observed pid must
    # be a distinct int in [0, numPartitions) — gaps are fine (empty
    # partitions produce no group), out-of-range or duplicate pids mean
    # the partitioner contract changed and the offsets would be wrong
    # (.rdd on the CHECKPOINTED frame — already materialized by the
    # collect above, so this reads block metadata, no recompute)
    n_parts = with_pid.rdd.getNumPartitions()
    pids = [r["__pid"] for r in totals]
    if len(set(pids)) != len(pids) or any(p < 0 or p >= n_parts for p in pids):
        raise AssertionError(
            f"repartitionByRange pid invariant violated: pids={pids}, "
            f"numPartitions={n_parts}"
        )
    # literal-array offsets indexed by __pid — a projection, not a
    # broadcast join (see shard.distributed_rank for the rationale and
    # the measured fixed-overhead win); gaps from empty partitions hold
    # the running value and are never read
    max_pid = pids[-1] if pids else 0
    arr, acc, it = [], 0, iter(totals)
    nxt = next(it, None)
    for pid in range(max_pid + 1):
        arr.append(acc)
        if nxt is not None and nxt["__pid"] == pid:
            acc += nxt["__t"] or 0
            nxt = next(it, None)
    offset = F.element_at(F.lit(arr).cast("array<bigint>"), F.col("__pid") + 1)
    return (
        local.withColumn(name, offset + F.col("__isum") - F.col("__val"))
        .drop("__pid", "__isum", "__val")
    )


def pack_sequences(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    context_len: int,
    keep_cols: tuple = (),
) -> DataFrame:
    """Concat-and-chunk packing plan: one output row per
    (document, training sequence) span.

    Documents are concatenated in ascending *id_col* order; the token
    stream is sliced into windows of *context_len*.  Output columns:

    - ``seq_id``       which training sequence (0-based window index)
    - ``slice_start``  first token of the document in that sequence
      (0-based WITHIN the document)
    - ``slice_len``    how many of the document's tokens land there

    Zero-token documents contribute nothing and are dropped.  All
    arithmetic is integer (bigint) — no float anywhere, so the mapping
    is exact and engine-independent.

    ``keep_cols``: extra columns threaded through to the output (the
    clean_c4_lines convention) — document metadata rides the prefix-sum
    plan instead of a corpus-sized re-join on the id."""
    if context_len <= 0:
        raise ValueError(f"context_len must be positive, got {context_len}")
    L = int(context_len)
    toks = df.filter(F.col(tokens_col) > 0).select(
        F.col(id_col), F.col(tokens_col).cast("long").alias("__n"), *keep_cols
    )
    pre = distributed_prefix_sum(toks, [F.asc(id_col)], "__n", name="__start")
    first_seq = F.expr("__start div " + str(L))
    last_seq = F.expr(f"(__start + __n - 1) div {L}")
    out = pre.withColumn("seq_id", F.explode(F.sequence(first_seq, last_seq)))
    slice_start = F.greatest(F.lit(0).cast("long"), F.col("seq_id") * L - F.col("__start"))
    slice_end = F.least(F.col("__n"), (F.col("seq_id") + 1) * L - F.col("__start"))
    return out.select(
        F.col(id_col),
        F.col("seq_id"),
        slice_start.alias("slice_start"),
        (slice_end - slice_start).alias("slice_len"),
        *keep_cols,
    )
