"""Skew-handling utilities for hot keys at scale.

AQE's skew-join splitting (on by default in ``session.py``) handles
most skew at runtime; these helpers cover the cases AQE can't — a
shuffle *aggregation* with one hot key, and joins where the skewed
side must meet a non-broadcastable big side.

- :func:`salted_agg` — two-phase aggregation: salt the group key into
  ``n_salts`` shards, partially aggregate, then merge shards.  Turns a
  single hot reducer into ``n_salts`` parallel ones.  Works for any
  algebraic aggregate (sum/count/min/max — pass the merge expressions).
- :func:`salted_join` — replicate the small side ``n_salts`` times with
  an explicit salt column, salt the big side randomly; the hot key's
  rows spread over ``n_salts`` tasks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation.

    *aggs* maps output name → (partial_agg_expr, merge_agg_expr), e.g.
    ``{"n": (F.count("*"), F.sum("n")), "total": (F.sum("x"), F.sum("total"))}``.
    Phase 1 groups by (keys + salt) — map-side combine still applies —
    phase 2 merges the ≤ n_salts shard rows per key.  Both shuffles are
    uniform even when one key holds most of the data."""
    salt = (F.spark_partition_id() % n_salts).alias("__salt")
    phase1 = df.groupBy(*group_cols, salt).agg(
        *[partial.alias(name) for name, (partial, _merge) in aggs.items()]
    )
    return phase1.groupBy(*group_cols).agg(
        *[merge.alias(name) for name, (_partial, merge) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join a skewed *big* side to a *small* side without broadcasting.

    The small side is replicated ``n_salts`` × via an exploded salt
    array; the big side gets a random salt in [0, n_salts).  Joining on
    (key, salt) spreads any hot key over n_salts tasks.  Use when the
    small side is too big to broadcast but small enough to replicate."""
    salted_small = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    salted_big = big.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    out = salted_big.join(salted_small, [on, "__salt"], how)
    return out.drop("__salt")
