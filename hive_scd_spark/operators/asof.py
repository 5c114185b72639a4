"""As-of join — an operator Spark SQL lacks natively (DuckDB/kdb have
it).  For each left row, find the latest right row with the same key
and right.time <= left.time.

Implementation: **union + single window pass** — no range-explosion
join, no per-key driver loop.  Both sides are tagged and unioned; one
window partitioned by key and ordered by (time, side) carries the last
seen right-side payload forward with ``last(..., ignorenulls)``.  Cost
is one shuffle on the key + a sort within partitions — linear at any
scale, skew-safe under AQE.  (Alternative for few keys + dense times:
``applyInPandas`` with ``pd.merge_asof`` per key group; this version
avoids Python entirely.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    suffix: str = "_matched",
) -> DataFrame:
    """Left as-of join: every left row, plus ``<col><suffix>`` columns
    from the latest right row at-or-before the left row's time (NULL
    when no prior right row exists — LEFT ASOF semantics)."""
    lcols = left.columns
    # All right-side payload travels as ONE struct so a single
    # last(..., ignorenulls=True) picks the matched row atomically: a NULL
    # *field* inside the matched row stays NULL (the struct itself is
    # non-null) instead of being backfilled from an older right row —
    # matching DuckDB ASOF JOIN semantics for NULL payload columns.
    payload = F.struct(
        F.col(right_time).alias("__time"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    null_payload_type = right.select(payload.alias("p")).schema["p"].dataType
    tagged_left = left.select(
        F.col(on).alias("__key"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__side"),  # right (0) sorts before left (1) at equal times
        *[F.col(c) for c in lcols],
        F.lit(None).cast(null_payload_type).alias("__r"),
    )
    tagged_right = right.select(
        F.col(on).alias("__key"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        payload.alias("__r"),
    )
    unioned = tagged_left.unionByName(tagged_right)
    w = (
        W.partitionBy("__key")
        .orderBy(F.col("__t").asc(), F.col("__side").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        "*", F.last("__r", ignorenulls=True).over(w).alias("__m")
    )
    return carried.filter(F.col("__side") == 1).select(
        *lcols,
        *[F.col(f"__m.{c}").alias(f"{c}{suffix}") for c in value_cols],
        F.col("__m.__time").alias(f"{right_time}{suffix}"),
    )


def gap_fill_locf(
    events: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    step: int,
    start: int,
    end: int,
) -> DataFrame:
    """Regular-grid gap fill with last-observation-carried-forward —
    the as-of join's self-join special case and the standard
    time-series densification (downstream feature windows want one row
    per (key, bucket), not the raw event cadence).

    Grid: every key × every bucket of the half-open [start, end) range
    at *step* width (bucket = floor(time / step) computed in pure
    integer arithmetic — ``(t - pmod(t, step)) / step`` — so bucket
    boundaries are engine-exact and FLOOR-consistent with the Python
    ``//`` grid bounds even for negative times; Spark's ``div``
    truncates toward zero and would misalign negative observations).  Per bucket the OBSERVED value
    is the bucket's last event — max (time, value) struct, so ties on
    time break on value, deterministically in any engine.  Fill is one
    per-key window ``last(value, ignorenulls)`` over bucket order:
    buckets before a key's first observation stay NULL (LOCF has
    nothing to carry), and ``is_observed`` distinguishes carried rows
    from real ones.

    Output: (key_col, bucket, filled_value, is_observed).  Scale: the
    grid is an EXPLODE over the distinct-key table (never a
    crossJoin), one (key, bucket) combiner-collapsed aggregate for the
    observations, and one KEY-PARTITIONED window — n_keys × n_buckets
    output rows is the inherent result size, nothing quadratic and
    nothing single-partition."""
    if step <= 0:
        raise ValueError(f"step must be positive, got {step}")
    if not start < end:
        raise ValueError(f"need start < end, got [{start}, {end})")
    lo = start // step
    hi = (end - 1) // step
    in_range = (F.col(time_col) >= start) & (F.col(time_col) < end)
    # floor division in exact BIGINT arithmetic: pmod is always
    # non-negative, so (t - pmod(t, step)) is the largest multiple of
    # step <= t and the trailing `div` is exact — matches Python's //
    # for any sign of t, unlike a bare `t div step` (truncates to zero)
    t_sql = f"CAST(`{time_col}` AS BIGINT)"
    floor_bucket = F.expr(
        f"({t_sql} - pmod({t_sql}, {step})) div {step}"
    )
    obs = (
        events.filter(in_range)
        .groupBy(F.col(key_col), floor_bucket.alias("bucket"))
        .agg(
            F.max(
                F.struct(F.col(time_col).alias("t"), F.col(value_col).alias("v"))
            ).alias("__last")
        )
        .select(key_col, "bucket", F.col("__last.v").alias("__obs"))
    )
    grid = (
        events.select(key_col)
        .distinct()
        .withColumn(
            "bucket",
            F.explode(F.sequence(F.lit(lo).cast("long"), F.lit(hi).cast("long"))),
        )
    )
    joined = grid.join(obs, [key_col, "bucket"], "left")
    w = (
        W.partitionBy(key_col)
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return joined.select(
        key_col,
        "bucket",
        F.last("__obs", ignorenulls=True).over(w).alias("filled_value"),
        F.col("__obs").isNotNull().alias("is_observed"),
    )


def anomaly_zscore(
    events: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    order_col: str,
    lookback: int = 20,
    min_history: int = 8,
    z_threshold: float = 3.0,
    scale: int = 1000,
) -> DataFrame:
    """Rolling z-score anomaly flags — the monitoring primitive a
    pipeline health dashboard reads (ingest-volume spikes, metric
    drift): each observation is scored against the mean/std of its
    key's *lookback* PRECEDING observations (the current row is
    excluded from its own baseline, the standard leave-one-out form).

    Engine-exactness discipline: float ``avg``/``stddev`` window
    aggregates are summation-order-dependent, so the baseline moments
    are computed from EXACT integer window sums instead — values scale
    to ``round(value·scale)`` BIGINTs, the window sums Σv and Σv² are
    exact, and mean/variance derive from them in a fixed expression
    shape (population variance ``Σv²/n − (Σv/n)²``).  The z-score is
    ``ROUND(·, 6)`` and the flag compares the ROUNDED value, so both
    are engine-identical by construction.  Overflow headroom: Σv²
    needs ``n·(max|v|·scale)² < 2⁶³`` — at the default milli-scale
    that allows |v| up to ~6.8e5 with lookback 20.

    Rows with fewer than *min_history* prior observations get a NULL
    z (no baseline, never flagged); a zero-variance baseline likewise
    yields NULL z and ``is_anomaly`` false — a constant history says
    nothing about spread, so flagging any deviation would be noise.
    Window order is (time, *order_col*) — pass a unique id so frame
    membership is total-ordered and deterministic in any engine.

    Output: (key, time, order, value, n_baseline, z, is_anomaly).
    Scale: ONE key-partitioned window pass — one shuffle on the key,
    linear in rows, no joins, no Python."""
    if lookback < 1:
        raise ValueError(f"lookback must be >= 1, got {lookback}")
    if min_history < 2:
        raise ValueError(f"min_history must be >= 2, got {min_history}")
    # FLOOR(x*scale + 0.5): the package's engine-exact rounding
    # convention (range_join oracle precedent) — Spark round() is
    # HALF_UP, DuckDB's is half-away-from-zero; floor(+0.5) is the
    # same expression in both
    v = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("long")
    base = events.select(
        F.col(key_col),
        F.col(time_col),
        F.col(order_col),
        F.col(value_col),
        v.alias("__v"),
    )
    w = (
        W.partitionBy(key_col)
        .orderBy(F.col(time_col).asc(), F.col(order_col).asc())
        .rowsBetween(-lookback, -1)
    )
    stats = base.select(
        "*",
        F.count("__v").over(w).alias("__n"),
        F.sum("__v").over(w).alias("__s"),
        F.sum(F.col("__v") * F.col("__v")).over(w).alias("__ss"),
    )
    n = F.col("__n").cast("double")
    mean = F.col("__s") / n
    var = F.col("__ss") / n - mean * mean
    z = F.round(
        (F.col("__v").cast("double") - mean) / F.sqrt(var),
        6,
    )
    usable = (F.col("__n") >= min_history) & (
        F.col("__ss") * F.col("__n") > F.col("__s") * F.col("__s")
    )
    return stats.select(
        key_col,
        time_col,
        order_col,
        value_col,
        F.col("__n").cast("long").alias("n_baseline"),
        F.when(usable, z).alias("z"),
        F.coalesce(
            F.abs(F.when(usable, z)) > F.lit(float(z_threshold)), F.lit(False)
        ).alias("is_anomaly"),
    )
