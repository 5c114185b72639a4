"""Bin-bucketed range (interval) join.

Spark has no native range-join optimization for
``point BETWEEN start AND end`` predicates: a bare theta-join plans as
BroadcastNestedLoopJoin (when one side is small) or a cartesian product
(when neither is) — O(|L|·|R|) comparisons, a scale-killer the moment
the interval side outgrows broadcast.

:func:`range_join` makes the join an EQUI-join on a time bin:

- every interval row is exploded to the bins it overlaps
  (``floor(start/w) .. floor((end-1)/w)`` — ``end`` exclusive);
- every point row computes its single bin ``floor(point/w)``;
- the join runs on ``bin`` (shuffle-hash / sort-merge, AQE-eligible,
  skew-splittable) and re-checks the exact predicate.

Each (point, interval) match is found in exactly ONE bin (the point's),
so no dedup pass is needed.  Cost: |R| is replicated ×(len/w + 1) and
the join is a plain equi-join — at 100 TB this is a bounded blowup and
a normal shuffle instead of a nested loop.  Pick *bin_width* near the
typical interval length: wider bins → fewer replicas but more
false-candidate pairs filtered after the join; narrower → the reverse.

The reference has no interval operator (its DML WHERE is row-local,
``SQLUpdater.java:161-175``); this is a training-pipeline extension in
the same family as the as-of join (``operators/asof.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Join *points* to *intervals* where
    ``start_col <= point_col < end_col`` (half-open, like window
    semantics everywhere else in this package).

    All three bound columns must be integral (epoch millis/micros or any
    long domain) and share a unit.  *bin_width* is in that same unit.
    ``how`` is ``inner`` or ``left`` (left keeps unmatched points with
    NULL interval columns).  Column names must not collide between the
    two inputs (prefix your interval columns)."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")

    # integer `div` keeps everything in long arithmetic — F.floor(c / w)
    # would round-trip through double and lose exactness above 2^53
    p_bin = F.expr(f"`{point_col}` div {bin_width}")
    i_lo = F.expr(f"`{start_col}` div {bin_width}")
    i_hi = F.expr(f"(`{end_col}` - 1) div {bin_width}")

    iv = intervals.filter(F.col(start_col) < F.col(end_col)).withColumn(
        "__bin", F.explode(F.sequence(i_lo, i_hi))
    )
    pt = points.withColumn("__bin", p_bin)
    cond = (
        (pt["__bin"] == iv["__bin"])
        & (F.col(start_col) <= F.col(point_col))
        & (F.col(point_col) < F.col(end_col))
    )
    out = pt.join(iv, cond, how)
    return out.drop(pt["__bin"]).drop(iv["__bin"])


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Interval × interval OVERLAP join: match where
    ``l_start < r_end AND r_start < l_end`` (half-open on both sides) —
    the timeline-alignment primitive (audio/video segments × transcript
    spans, sessions × incident windows) that
    :func:`range_join`'s point-in-interval shape cannot express.

    Same binning idea, one extra trick: both sides explode to the bins
    they cover, and because an overlapping pair shares EVERY bin of
    their intersection, the pair is counted once by keeping it only in
    the bin where the overlap STARTS —
    ``greatest(l_start, r_start) div bin_width`` — which both sides
    provably cover.  The join stays a plain equi-join on ``bin`` with
    the exact predicate re-checked, and needs NO dedup pass (a
    ``distinct`` here would shuffle the matched pairs a second time
    and widen with every payload column).

    Empty intervals (start >= end) never match.  Only ``how='inner'``
    is supported: unlike range_join's points (one bin each), the left
    side here is PRE-EXPLODED, so a SQL left join would emit one NULL
    row per covered bin for every unmatched interval — silently wrong.
    Callers wanting left semantics anti-join the inner result against
    their own left key (which they have; this operator does not).
    Column names must not collide between inputs.  Cost at 100 TB:
    each side replicated ×(len/bin_width + 1), then one AQE-eligible
    shuffle join — pick *bin_width* near the typical interval length,
    exactly the range_join guidance."""
    if bin_width <= 0:
        raise ValueError(f"bin_width must be positive, got {bin_width}")
    if how != "inner":
        raise ValueError(
            "interval_overlap_join supports how='inner' only (a left join "
            "over the pre-exploded left side would duplicate unmatched "
            f"intervals per bin); got {how!r}"
        )

    l_lo = F.expr(f"`{l_start}` div {bin_width}")
    l_hi = F.expr(f"(`{l_end}` - 1) div {bin_width}")
    r_lo = F.expr(f"`{r_start}` div {bin_width}")
    r_hi = F.expr(f"(`{r_end}` - 1) div {bin_width}")

    lv = left.filter(F.col(l_start) < F.col(l_end)).withColumn(
        "__bin", F.explode(F.sequence(l_lo, l_hi))
    )
    rv = right.filter(F.col(r_start) < F.col(r_end)).withColumn(
        "__bin", F.explode(F.sequence(r_lo, r_hi))
    )
    overlap_start_bin = F.expr(
        f"greatest(`{l_start}`, `{r_start}`) div {bin_width}"
    )
    cond = (
        (lv["__bin"] == rv["__bin"])
        & (F.col(l_start) < F.col(r_end))
        & (F.col(r_start) < F.col(l_end))
        & (lv["__bin"] == overlap_start_bin)
    )
    out = lv.join(rv, cond, how)
    return out.drop(lv["__bin"]).drop(rv["__bin"])
