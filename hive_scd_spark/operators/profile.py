"""Table profiling: per-column statistics in two passes.

The data-engineering "what is in this table" primitive (the shape
popularized by AWS Deequ / Great Expectations): for every column, the
row count, null count, exact distinct count, and min/max.  At 100 TB
this is the operator run BEFORE the pipeline is designed — its own
plan has to be exemplary:

- **Pass 1** (min/max/nulls): ONE single-row aggregate over the scan —
  4k agg expressions for k columns, all map-side combinable, zero
  shuffle beyond the 1-row final combine.  min/max are computed on the
  NATIVE type and cast to string afterwards (stringifying first would
  order "10" < "9").
- **Pass 2** (exact distinct): melt to ``(column, value)`` pairs —
  k rows per input row — then two map-combinable groupBys
  ``(column, value) → (column)``.  This is the exact-distinct plan
  WITHOUT ``count(distinct a), count(distinct b), ...`` in one agg,
  which Catalyst expands k× through an Expand node AND keeps every
  distinct set in one aggregation's hash map at once; the melt form
  shards (column, value) across the cluster uniformly.  Swap the
  second pass to ``approx_count_distinct`` when ±2 % is acceptable —
  one groupBy, no melt (parameter ``exact=False``).
- The two branches join on column name — k rows, broadcast.

The 1-row pass-1 "explode" back to per-column rows goes through an
inline array of structs (``F.inline``) — a plan-side unpivot, no
driver round trip.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def table_profile(
    df: DataFrame, exact: bool = True, on_complex: str = "error"
) -> DataFrame:
    """Per-column profile: ``(col_name, n_rows, n_nulls, n_distinct,
    min_str, max_str)``, one row per column of *df*.

    ``n_distinct`` counts distinct NON-NULL values (exact by default;
    ``exact=False`` switches to ``approx_count_distinct`` for the
    single-shuffle sketch plan).  min/max are native-type results cast
    to string for a uniform schema; NULLs are excluded (SQL aggregate
    semantics) and all-NULL columns profile as NULL min/max.

    Type discipline (the melt keys MUST be injective per column or the
    "exact" distinct silently undercounts):

    - binary columns are keyed and rendered via ``base64`` — a
      straight ``cast('string')`` decodes bytes as UTF-8 with
      replacement characters, so distinct byte values can collide;
    - atomic types render injectively (float negative zero is
      normalized first — see below);
    - complex types (array/map/struct/variant) are not min/max
      orderable in general and have no injective one-column rendering
      we are willing to vouch for — ``on_complex='error'`` (default)
      raises naming the offending columns, ``on_complex='skip'``
      profiles the remaining columns only."""
    atomic_prefixes = ("array<", "map<", "struct<", "variant", "interval")
    complex_cols = [
        c for c, dt in df.dtypes if dt.startswith(atomic_prefixes)
    ]
    if complex_cols:
        if on_complex == "skip":
            pass
        elif on_complex == "error":
            raise ValueError(
                "table_profile: complex-typed columns are not profilable "
                f"(no orderable min/max, no injective distinct key): "
                f"{complex_cols}; pass on_complex='skip' to profile the "
                "remaining columns"
            )
        else:
            raise ValueError(f"on_complex must be 'error' or 'skip', got {on_complex!r}")
    cols = [c for c in df.columns if c not in complex_cols]
    if not cols:
        raise ValueError("table_profile: no profilable (atomic-typed) columns")
    dtypes = dict(df.dtypes)

    def _render(c: str, agg):
        # binary min/max render as base64 (same injective encoding as
        # the distinct key); everything else casts natively
        if dtypes[c] == "binary":
            return F.base64(agg)
        return agg.cast("string")

    stats_exprs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        stats_exprs += [
            F.sum(F.isnull(c).cast("long")).alias(f"__nulls_{c}"),
            _render(c, F.min(c)).alias(f"__min_{c}"),
            _render(c, F.max(c)).alias(f"__max_{c}"),
        ]
    one = df.agg(*stats_exprs)
    per_col = one.select(
        F.inline(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col("__n").alias("n_rows"),
                        F.col(f"__nulls_{c}").alias("n_nulls"),
                        F.col(f"__min_{c}").alias("min_str"),
                        F.col(f"__max_{c}").alias("max_str"),
                    )
                    for c in cols
                ]
            )
        )
    )

    # the melt compares STRING renderings, so float negative zero must
    # be normalized first: -0.0 == 0.0 in SQL (and Spark's own groupBy
    # normalizes it) but renders as a distinct string — without this a
    # double column holding both would overcount "exact" distinct by 1
    def _distinct_key(c: str):
        dt = dtypes[c]
        col = F.col(c)
        if dt == "binary":
            return F.base64(col)  # injective byte rendering
        if dt in ("float", "double"):
            col = F.when(col == 0.0, F.lit(0.0).cast(dt)).otherwise(col)
        return col.cast("string")

    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        _distinct_key(c).alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.col_name", "p.value")
    if exact:
        nd = (
            pairs.filter(F.col("value").isNotNull())
            .groupBy("col_name", "value")
            .agg(F.lit(1))
            .groupBy("col_name")
            .agg(F.count(F.lit(1)).alias("n_distinct"))
        )
    else:
        nd = (
            pairs.filter(F.col("value").isNotNull())
            .groupBy("col_name")
            .agg(F.approx_count_distinct("value").alias("n_distinct"))
        )

    return per_col.join(F.broadcast(nd), "col_name", "left").select(
        "col_name",
        "n_rows",
        "n_nulls",
        F.coalesce("n_distinct", F.lit(0)).alias("n_distinct"),
        "min_str",
        "max_str",
    )
