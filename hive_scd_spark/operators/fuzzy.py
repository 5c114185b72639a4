"""Edit-distance (fuzzy) joins — segment-blocked Levenshtein matching.

The entity-matching / typo-clustering primitive: find all string pairs
within edit distance *d* without an all-pairs comparison.  Blocking is
the PassJoin scheme (Li, Deng, Feng: "PassJoin: a partition-based
method for similarity joins", PVLDB 2011, public algorithm):

    Partition every string into d+1 contiguous segments.  If
    ed(s, t) <= d, then by pigeonhole at least one segment of s is
    UNTOUCHED by all d edits and therefore occurs VERBATIM as a
    substring of t — and because i edits can shift an alignment by at
    most d positions, it occurs within ±d of its home position.

So an equi-join of (segment-index, source-length, segment-string)
index keys against each string's windowed substrings finds every
qualifying pair — exact recall, like the SimHash band pigeonhole but
for edit distance — and `levenshtein() <= d` verifies bucket-local
candidates only.  Reference scope: beyond the reference core
(SURVEY §7.6 extension family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class FuzzyBlockSkewError(ValueError):
    """A PassJoin block key's candidate volume exceeds ``max_block`` —
    the corpus has a hot block (typically a shared constant-prefix
    segment: serial IDs, "Customer#…") that would degenerate the
    bucket-local verify toward all-pairs.  The message carries the
    offending (segment-index, length, segment-text) keys and their
    candidate counts so the fix is actionable; see
    :func:`edit_distance_self_join` for the remediation options."""


def _hot_blocks(index: DataFrame, probe: DataFrame, max_block: int) -> DataFrame:
    """Per block key, the candidate-pair volume the join WOULD produce
    (index-side population × probe-side population — the exact number
    of levenshtein calls for that key), filtered to keys above
    ``max_block``.  Pure aggregation over the two (already lazy) sides;
    the caller limits + collects a bounded handful of rows."""
    ic = index.groupBy("i", "La", "seg").agg(F.count("*").alias("__ni"))
    pc = probe.groupBy("i", "Ls", "sub").agg(F.count("*").alias("__np"))
    return (
        ic.join(
            pc,
            (ic["i"] == pc["i"]) & (ic["La"] == pc["Ls"]) & (ic["seg"] == pc["sub"]),
        )
        .select(
            ic["i"],
            ic["La"],
            ic["seg"],
            (F.col("__ni") * F.col("__np")).alias("n_candidates"),
        )
        .filter(F.col("n_candidates") > max_block)
    )


def _census_or_raise(
    index: DataFrame,
    probe: DataFrame,
    max_block: int,
    on_hot: str,
    what: str,
):
    """Run the pre-join hot-block census.  ``on_hot='error'`` raises
    :class:`FuzzyBlockSkewError` listing the worst offenders;
    ``on_hot='sample'`` returns a REPLACEMENT index side where each hot
    block's index rows are deterministically thinned (md5-rank, so the
    result is engine-replayable) until the product bound holds — an
    explicit, opt-in recall trade documented at the call site, never a
    silent cap.  Driver collect bounded at 5 rows."""
    if on_hot not in ("error", "sample"):
        raise ValueError(f"on_hot must be 'error' or 'sample', got {on_hot!r}")
    hot = _hot_blocks(index, probe, max_block)
    if on_hot == "error":
        worst = hot.orderBy(F.desc("n_candidates")).limit(5).collect()
        if worst:
            keys = ", ".join(
                f"(i={r['i']}, len={r['La']}, seg={r['seg']!r}: "
                f"{r['n_candidates']} candidates)"
                for r in worst
            )
            raise FuzzyBlockSkewError(
                f"{what}: {'at least 5' if len(worst) == 5 else len(worst)} "
                f"PassJoin block(s) exceed max_block={max_block} candidate "
                f"pairs — worst: {keys}.  A hot block means many strings "
                f"share a segment verbatim (constant prefixes / serial "
                f"IDs); the bucket-local verify degenerates toward "
                f"all-pairs there.  Fix the DATA, not the cap: join on "
                f"the variable part of the string, raise max_dist so "
                f"segments split the constant prefix, or opt into "
                f"on_hot='sample' (deterministic per-block thinning, "
                f"documented recall loss on hot blocks only)."
            )
        return index
    # on_hot == "sample": thin each hot block's INDEX rows to
    # floor(max_block / probe-count) by deterministic md5 rank.  Only
    # hot blocks lose rows; every other block keeps exact recall.
    hk = hot.select(
        F.col("i").alias("__hi"),
        F.col("La").alias("__hL"),
        F.col("seg").alias("__hseg"),
        F.col("n_candidates").alias("__hc"),
    )
    joined = index.join(
        hk,
        (index["i"] == hk["__hi"])
        & (index["La"] == hk["__hL"])
        & (index["seg"] == hk["__hseg"]),
        "left",
    )
    w = Window.partitionBy("i", "La", "seg").orderBy(F.md5(F.concat_ws(":", "ia", "seg")))
    wall = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        joined.withColumn("__rk", F.row_number().over(w))
        .withColumn(
            "__keep",
            F.greatest(
                F.lit(1).cast("long"),
                (F.lit(max_block) * F.count("*").over(wall) / F.col("__hc")).cast(
                    "long"
                ),
            ),
        )
        .filter(F.col("__hc").isNull() | (F.col("__rk") <= F.col("__keep")))
        .select("ia", "sa", "La", "i", "seg")
    )


def _seg_start(L, i, k):
    """0-based start of segment *i* when a length-*L* string is evenly
    partitioned into *k* segments (first L mod k segments one longer) —
    pure column arithmetic, replayable in any SQL engine."""
    base = (L / k).cast("long")  # floor division on non-negative longs
    rem = L % k
    return i * base + F.least(F.lit(i).cast("long"), rem)


def _seg_len(L, i, k):
    base = (L / k).cast("long")
    rem = L % k
    return base + F.when(F.lit(i) < rem, F.lit(1)).otherwise(F.lit(0)).cast("long")


def _base(df: DataFrame, id_col: str, str_col: str, k: int) -> DataFrame:
    return df.select(
        F.col(id_col).alias("__id"),
        F.col(str_col).alias("__s"),
        F.length(str_col).cast("long").alias("__L"),
    ).filter(F.col("__L") >= k)


def _index_side(base: DataFrame, k: int) -> DataFrame:
    """The d+1 segments of each string, keyed by (segment idx, full
    length, segment text): columns (ia, sa, La, i, seg)."""
    L = F.col("__L")
    idx_parts = [
        F.struct(
            F.lit(i).cast("int").alias("i"),
            F.col("__s")
            .substr((_seg_start(L, i, k) + 1).cast("int"), _seg_len(L, i, k).cast("int"))
            .alias("seg"),
        )
        for i in range(k)
    ]
    return base.select(
        F.col("__id").alias("ia"),
        F.col("__s").alias("sa"),
        F.col("__L").alias("La"),
        F.explode(F.array(*idx_parts)).alias("__p"),
    ).select(
        "ia", "sa", "La", F.col("__p.i").alias("i"), F.col("__p.seg").alias("seg")
    )


def _probe_side(base: DataFrame, k: int, d: int) -> DataFrame:
    """For every SOURCE length L' within ±d of this string's length and
    every segment index, the substrings of this string at the
    segment's length, within ±d of the segment's home position:
    columns (ib, sb, i, Ls, pos_b, sub).

    Two CHAINED explodes, not one: exploding the source-length delta
    first and computing (Ls, Ls div k, Ls mod k) as plain columns
    keeps each second-stage struct a few additions — the single
    fully-inlined (2d+1)(d+1)(2d+1)-struct array repeats the length
    arithmetic per field, overflows janino's method limit, and drops
    the whole projection to interpreted eval (the SCALE_NOTES r6
    interpreted-expression trap, measured 3-4x on corpus passes)."""
    by_len = (
        base.select(
            F.col("__id").alias("ib"),
            F.col("__s").alias("sb"),
            F.col("__L").alias("Lb"),
            F.explode(
                F.array(*[F.lit(x).cast("long") for x in range(-d, d + 1)])
            ).alias("__dl"),
        )
        .select("ib", "sb", "Lb", (F.col("Lb") + F.col("__dl")).alias("Ls"))
        .filter(F.col("Ls") >= k)  # source must be partitionable
        .select(
            "ib",
            "sb",
            "Lb",
            "Ls",
            (F.col("Ls") / k).cast("long").alias("__qb"),
            (F.col("Ls") % k).alias("__qr"),
        )
    )
    qb, qr = F.col("__qb"), F.col("__qr")
    probe_parts = []
    for i in range(k):
        start = i * qb + F.least(F.lit(i).cast("long"), qr)
        ln = qb + F.when(F.lit(i) < qr, F.lit(1)).otherwise(F.lit(0)).cast("long")
        for w in range(-d, d + 1):
            p = start + w  # 0-based position in THIS string
            probe_parts.append(
                F.struct(
                    F.lit(i).cast("int").alias("i"),
                    p.cast("int").alias("p"),
                    ln.cast("int").alias("ln"),
                    F.col("sb").substr((p + 1).cast("int"), ln.cast("int")).alias("sub"),
                )
            )
    return (
        by_len.select(
            "ib", "sb", "Lb", "Ls", F.explode(F.array(*probe_parts)).alias("__q")
        )
        .filter(
            (F.col("__q.p") >= 0)
            & (F.col("__q.p") + F.col("__q.ln") <= F.col("Lb"))
            & (F.col("__q.ln") > 0)
        )
        .select(
            "ib",
            "sb",
            F.col("__q.i").alias("i"),
            F.col("Ls"),
            F.col("__q.p").alias("pos_b"),
            F.col("__q.sub").alias("sub"),
        )
        .dropDuplicates(["ib", "i", "Ls", "pos_b", "sub"])
    )


def edit_distance_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    left_str: str,
    right_id: str,
    right_str: str,
    max_dist: int = 1,
    max_block: int | None = None,
    on_hot: str = "error",
) -> DataFrame:
    """Two-table fuzzy join (record linkage): every (left, right) pair
    within Levenshtein distance *max_dist* — exact recall via PassJoin
    blocking (RIGHT side indexed by segments, LEFT side probed with
    windowed substrings; the pigeonhole lemma needs only one
    direction).  Output ``(left_id, right_id, left_str, right_str,
    dist)``, one row per pair.  Strings shorter than max_dist+1 chars
    are excluded on both sides (same contract as the self-join).

    The canonical use: link a dirty column (typos) against a clean
    master list — the master is usually the smaller side and sits on
    the index; AQE broadcasts it when it is small enough.

    ``max_block`` (opt-in) runs a pre-join hot-block census: per block
    key, the exact candidate count the join would produce (index
    population × probe population); any key above the bound raises
    :class:`FuzzyBlockSkewError` naming the offending segment values
    (``on_hot='error'``), or — explicit opt-in — deterministically
    thins the hot blocks' index rows to restore the bound
    (``on_hot='sample'``; recall loss confined to hot blocks, never a
    silent cap).  The census is one counting pass over the two lazy
    sides; leave it ``None`` on corpora already known to be
    prefix-diverse."""
    d = int(max_dist)
    if d < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    if left_id == right_id or {left_id, right_id} & {"left_str", "right_str", "dist"}:
        raise ValueError(
            f"output column collision: left_id={left_id!r} / "
            f"right_id={right_id!r} must be distinct names, neither "
            "'left_str'/'right_str'/'dist' — alias one side before joining"
        )
    k = d + 1
    index = _index_side(_base(right, right_id, right_str, k), k)
    probe = _probe_side(_base(left, left_id, left_str, k), k, d)
    if max_block is not None:
        index = _census_or_raise(
            index, probe, int(max_block), on_hot, "edit_distance_join"
        )
    cand = index.join(
        probe,
        (index["i"] == probe["i"])
        & (index["La"] == probe["Ls"])
        & (index["seg"] == probe["sub"]),
    )
    dist = F.levenshtein(F.col("sa"), F.col("sb"))
    return (
        cand.select(
            F.col("ib").alias(left_id),
            F.col("ia").alias(right_id),
            F.col("sb").alias("left_str"),
            F.col("sa").alias("right_str"),
            dist.cast("int").alias("dist"),
        )
        .filter(F.col("dist") <= d)
        .distinct()
    )


def edit_distance_self_join(
    df: DataFrame,
    id_col: str,
    str_col: str,
    max_dist: int = 1,
    max_block: int | None = None,
    on_hot: str = "error",
) -> DataFrame:
    """All pairs within Levenshtein distance *max_dist* — exact
    (recall-complete) via PassJoin segment blocking, never all-pairs.

    Output ``(id_a, id_b, str_a, str_b, dist)`` with ``id_a < id_b``
    and ``dist <= max_dist``; a pair matching through several segments
    appears once.  Strings shorter than ``max_dist + 1`` are excluded
    (they cannot be partitioned into d+1 non-empty segments; at those
    lengths "within d edits" is near-vacuous anyway) — a documented
    contract, not a silent drop: the gate filters explicitly.

    Plan shape: index side explodes d+1 segment keys per string;
    probe side explodes (2d+1 source-lengths × d+1 segments × ≤2d+1
    window positions) substrings per string — both linear in the
    input with small constants (18 probe rows/string at d=1).  ONE
    shuffle on the (segment-index, source-length, segment-string)
    block key joins them; candidate volume is bounded by block
    population (segment diversity), and the only per-candidate work is
    one `levenshtein` call on two short strings.  Both sides carry
    their strings through the join, so verification needs no lookup
    join — the simhash_near_dups discipline.

    At 100 TB the block key distribution is the thing to watch: a
    corpus whose strings share a constant-prefix segment (serial IDs,
    "Customer#…") degenerates that block to all-pairs.  That is a
    DATA property, not a plan property, and the ``max_block`` census
    (opt-in) makes it LOUD instead of slow: per block key it computes
    the exact candidate count the join would produce and raises
    :class:`FuzzyBlockSkewError` naming the offending segment values
    when any key exceeds the bound (``on_hot='error'``).  The right
    fix is picking segments from the variable part or raising
    max_dist so segments split the constant prefix — a silent cap
    would break the recall guarantee exactly for the pairs that
    differ in the OTHER segment — but ``on_hot='sample'`` offers an
    explicit escape (deterministic md5-rank thinning of hot blocks'
    index rows; recall loss confined to hot blocks and opted into, by
    name, at the call site)."""
    d = int(max_dist)
    if d < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    k = d + 1
    base = _base(df, id_col, str_col, k)
    index = _index_side(base, k)
    probe = _probe_side(base, k, d)
    if max_block is not None:
        index = _census_or_raise(
            index, probe, int(max_block), on_hot, "edit_distance_self_join"
        )
    # ia < ib, not ia != ib: the pigeonhole lemma is symmetric (either
    # string of a qualifying pair can be the partitioned side), so one
    # orientation — index on the smaller id — finds every pair, and
    # candidate volume / levenshtein work is HALF of the both-ways form
    cand = index.join(
        probe,
        (index["i"] == probe["i"])
        & (index["La"] == probe["Ls"])
        & (index["seg"] == probe["sub"])
        & (index["ia"] < probe["ib"]),
    )
    dist = F.levenshtein(F.col("sa"), F.col("sb"))
    return (
        cand.select(
            F.col("ia").alias("id_a"),
            F.col("ib").alias("id_b"),
            F.col("sa").alias("str_a"),
            F.col("sb").alias("str_b"),
            dist.cast("int").alias("dist"),
        )
        .filter(F.col("dist") <= d)
        .distinct()
    )
