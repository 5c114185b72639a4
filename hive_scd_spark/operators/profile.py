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
    - complex types (array/map/struct/variant, plus intervals) are not
      min/max orderable in general and have no injective one-column
      rendering we are willing to vouch for — ``on_complex='error'``
      (default) raises naming the offending columns,
      ``on_complex='skip'`` profiles the remaining columns only."""
    # validate the mode UNCONDITIONALLY: an invalid value on an
    # all-atomic table must fail now, not the first time a complex
    # column shows up in production
    if on_complex not in ("error", "skip"):
        raise ValueError(f"on_complex must be 'error' or 'skip', got {on_complex!r}")
    complex_prefixes = ("array<", "map<", "struct<", "variant", "interval")
    complex_cols = [
        c for c, dt in df.dtypes if dt.startswith(complex_prefixes)
    ]
    if complex_cols and on_complex == "error":
        raise ValueError(
            "table_profile: complex-typed columns (incl. intervals) are "
            f"not profilable (no orderable min/max, no injective "
            f"distinct key): {complex_cols}; pass on_complex='skip' to "
            "profile the remaining columns"
        )
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


def histogram_sketch(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_buckets: int = 128,
    by: list[str] | None = None,
) -> DataFrame:
    """Equi-width histogram sketch: ``(*by, bucket, cnt)`` — the
    mergeable-QUANTILE primitive, the percentile analog of the HLL
    persist+merge path (``sketch_merge_distinct_users``).

    The sketch is a fixed-size (≤ *n_buckets* rows per group) summary a
    daily job persists; :func:`histogram_merge` combines any number of
    them by summing counts — no rescan of the data they summarize —
    and :func:`histogram_quantiles` answers any percentile from the
    merged state with error ≤ one bucket width ((hi-lo)/n_buckets).
    That is how a 100 TB pipeline answers "p99 this quarter" without
    re-sorting a quarter of data: per-block sketches are tiny, the
    merge cost is independent of corpus size, and the data is scanned
    exactly once, at block-build time.

    Bucket assignment is pure IEEE double arithmetic
    (``clamp(floor((v-lo)/width), 0, n-1)``), reproducible bit-exactly
    in any engine — the DuckDB oracle replays it, so the sketch itself
    is value-checked, not just its estimates.  NULLs are excluded
    (they carry no quantile information); out-of-range values clamp to
    the edge buckets, so a stale [lo, hi) still counts every row.
    One map-combined groupBy shuffle of ≤ n_buckets × |groups| rows.
    """
    width = (hi - lo) / n_buckets
    if not width > 0:
        raise ValueError(f"need hi > lo, got [{lo}, {hi})")
    bucket = F.least(
        F.greatest(
            F.floor((F.col(value_col) - F.lit(float(lo))) / F.lit(width)),
            F.lit(0),
        ),
        F.lit(n_buckets - 1),
    ).cast("long")
    keys = list(by or [])
    return (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*keys, bucket.alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )


def histogram_merge(sketch: DataFrame, by: list[str] | None = None) -> DataFrame:
    """Merge histogram sketches by summing per-bucket counts —
    associative, commutative, rescan-free.  Pass *by* to keep grouping
    dimensions; omit it to collapse everything into one sketch."""
    keys = list(by or [])
    return sketch.groupBy(*keys, "bucket").agg(F.sum("cnt").alias("cnt"))


def histogram_quantiles(
    sketch: DataFrame,
    ps: list[float],
    lo: float,
    hi: float,
    n_buckets: int,
    by: list[str] | None = None,
) -> DataFrame:
    """Quantile estimates from a (merged) histogram sketch: for each
    p, walk the cumulative distribution to the first bucket holding
    rank ceil(p·N) and interpolate linearly inside it.  Output
    ``(*by, p, est)``.

    Error bound, stated precisely: the estimate is within one bucket
    width of the rank-⌈p·N⌉ ORDER STATISTIC — that value provably lies
    inside the located bucket.  Against INTERPOLATED percentiles
    (Spark ``percentile`` / DuckDB ``quantile_cont``, which blend the
    two order statistics around p·(N-1)) add the gap between those
    neighbors: zero on dense data, arbitrarily large on gapped
    bimodal data where p·N lands exactly on the cluster boundary —
    a property of interpolation, not of the sketch.

    Plan: one window cumulative sum over the (tiny, ≤ n_buckets-row)
    sketch per group, the p list exploded from a LITERAL array (a
    projection, not a join), and a min-struct argmin — all on
    sketch-sized data, the raw corpus is never touched.  The
    ungrouped window runs single-partition by design: its input is
    bounded at n_buckets rows BY CONSTRUCTION (the audit-linter
    exemption is documented at the registry gate)."""
    from pyspark.sql import Window as W

    width = (hi - lo) / n_buckets
    keys = list(by or [])
    w = W.partitionBy(*keys).orderBy("bucket") if keys else W.orderBy("bucket")
    cum = sketch.select(
        *keys,
        "bucket",
        "cnt",
        F.sum("cnt").over(w).alias("__cum"),
        F.sum("cnt").over(
            (W.partitionBy(*keys) if keys else W.partitionBy())
            .orderBy("bucket")
            .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        ).alias("__total"),
    )
    hit = cum.select(
        "*", F.explode(F.array(*[F.lit(float(p)) for p in ps])).alias("p")
    ).filter(F.col("__cum") >= F.ceil(F.col("p") * F.col("__total")))
    # the FIRST qualifying bucket per (group, p): min-struct argmin
    frac = (
        F.ceil(F.col("p") * F.col("__total")) - (F.col("__cum") - F.col("cnt"))
    ).cast("double") / F.col("cnt").cast("double")
    est = F.lit(float(lo)) + (F.col("bucket").cast("double") + frac) * F.lit(width)
    picked = (
        hit.select(
            *keys,
            "p",
            F.struct(F.col("bucket").alias("b"), est.alias("est")).alias("__be"),
        )
        .groupBy(*keys, "p")
        .agg(F.min("__be").alias("__best"))
    )
    return picked.select(
        *keys, "p", F.round(F.col("__best.est"), 6).alias("est")
    )


def mg_candidates(keyed: DataFrame, key_col: str, capacity: int) -> DataFrame:
    """The Misra-Gries candidate pass shared by :func:`heavy_hitters`
    and the streaming ``frequent_ingest_sink``: fold each partition of
    the NON-NULL key stream through a ≤ *capacity*-counter MG summary
    (per Arrow batch an exact Counter is merged by the Agarwal-et-al
    subtract-the-(capacity+1)th-largest rule; total undercount per
    partition ≤ n_p/(capacity+1)), then distinct the survivors.
    Guarantee: every key with stream frequency > N/(capacity+1)
    appears in the output.  ≤ capacity rows per partition, shuffle
    only over the metadata-sized candidate set."""
    from pyspark.sql import types as T

    key_type = keyed.schema[key_col].dataType
    summary_schema = T.StructType([T.StructField(key_col, key_type)])

    def mg_summaries(batches):
        from collections import Counter

        import pandas as pd

        summary: dict = {}
        for pdf in batches:
            batch = Counter(pdf[key_col].dropna())
            for key, c in batch.items():
                summary[key] = summary.get(key, 0) + c
            if len(summary) > capacity:
                vals = sorted(summary.values(), reverse=True)
                sub = vals[capacity]
                summary = {x: c - sub for x, c in summary.items() if c > sub}
        if summary:
            yield pd.DataFrame({key_col: list(summary)})

    return keyed.mapInPandas(mg_summaries, schema=summary_schema).distinct()


def heavy_hitters(
    stream: DataFrame,
    key_col: str,
    k: int = 128,
    capacity: int = 512,
) -> DataFrame:
    """Exact φ-heavy-hitters (φ = 1/k) over an element stream, with a
    Misra–Gries candidate pass — the FREQUENT-ITEMS member of the
    mergeable-sketch trio (distinct → HLL ``sketch_merge_distinct_users``,
    quantile → :func:`histogram_sketch`, frequency → this).

    Why not plain ``groupBy(key).count()``: the map-side combiner's
    hash map — and the shuffle it feeds — is sized by the PER-PARTITION
    DISTINCT key count.  For Zipf-tailed streams (user ids, URLs,
    ngrams) that is nearly the stream itself, and at 100 TB the answer
    "which keys exceed 1/k of all traffic" does not need that shuffle:

    - **Pass 1 (candidates, shuffle-free)**: each partition folds its
      rows through a Misra–Gries summary of ≤ *capacity* counters
      (Arrow-batched ``mapInPandas``; per batch an exact Counter is
      MG-MERGED into the running summary by subtracting the
      (capacity+1)-th largest count — the Agarwal-et-al mergeable-
      summaries rule, total undercount ≤ n_p/(capacity+1)).  Output is
      ≤ capacity rows per partition.  Any key with global count
      ≥ N/k appears in at least one partition summary whenever
      capacity ≥ k: if it survived nowhere, its count would be
      ≤ Σ_p n_p/(capacity+1) < N/k.  No false negatives, ever.
    - **Pass 2 (exact recount + total, ONE scan)**: the ≤ capacity×P
      candidate keys are distinct-ed (metadata-sized shuffle),
      broadcast, and LEFT-joined back into the stream; a ROLLUP over
      ``candidate? key : NULL`` then yields, in a single
      map-side-combined aggregate, the exact per-candidate counts AND
      the grand total N (the grouping-sets ``()`` row) — the stream is
      never scanned a third time for a 1-row total.  The shuffle stays
      candidate-bounded: non-candidates all collapse into the NULL
      group.  The rollup output (≤ capacity×P + 2 rows) is lazily
      ``localCheckpoint``-ed — the pagerank precedent — because its
      two consumers (per-key counts, the N row) otherwise re-derive
      the full lineage: Catalyst pushes each branch's grouping-id
      filter below the Expand, the partial aggregates stop being
      identical, and exchange reuse can never fire.  The 1-row total
      then joins via the audited broadcast-crossJoin idiom.  The filter is INTEGER arithmetic —
      ``cnt * k >= N`` — so the result set is exact and
      engine-identical (no float threshold), and false positives from
      pass 1 die here.

    The final output is therefore EXACT (keys, counts, shares) — the
    sketch bounds memory and shuffle width, not accuracy — which is
    what makes this gate hash-checkable against a plain-SQL oracle.
    NULL keys are excluded on both passes (they match no semi-join and
    ``count(key)`` skips them).  Output: (key_col, cnt, share) with
    share = round(cnt/N, 6).
    """
    if k < 2:
        raise ValueError(f"k must be >= 2 (phi = 1/k), got {k}")
    if capacity < k:
        raise ValueError(
            f"capacity ({capacity}) must be >= k ({k}) or the "
            "Misra-Gries pass can drop a true heavy hitter"
        )
    keyed = stream.select(F.col(key_col)).filter(F.col(key_col).isNotNull())
    candidates = mg_candidates(keyed, key_col, capacity)
    flagged = keyed.join(
        F.broadcast(candidates.withColumn("__cand", F.lit(1))), key_col, "left"
    ).select(F.when(F.col("__cand").isNotNull(), F.col(key_col)).alias("__k"))
    grouped = flagged.rollup("__k").agg(
        F.count("*").alias("cnt"), F.grouping("__k").alias("__g")
    ).localCheckpoint(eager=False)
    # a real keys-empty aggregate (over the one () row), not a bare
    # filter+select: the plan linter proves broadcast-crossJoin builds
    # 1-row by REQUIRING a global aggregate as the build root, and the
    # checkpoint scan underneath would otherwise be opaque to it
    total = (
        grouped.filter(F.col("__g") == 1)
        .agg(F.max("cnt").alias("__hh_n"))
    )
    counts = grouped.filter(
        (F.col("__g") == 0) & F.col("__k").isNotNull()
    ).select(F.col("__k").alias(key_col), "cnt")
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("cnt") * k >= F.col("__hh_n"))
        .select(
            key_col,
            "cnt",
            F.round(F.col("cnt") / F.col("__hh_n"), 6).alias("share"),
        )
    )


def token_heavy_hitters(
    df: DataFrame,
    text_col: str,
    k: int = 128,
    capacity: int = 512,
) -> DataFrame:
    """:func:`heavy_hitters` over the shared whitespace tokenizer —
    the vocabulary-census convenience (stopword discovery, boilerplate
    token screens).  Empty tokens (split semantics on empty text) are
    excluded; output keys are named ``token``."""
    from hive_scd_spark.functions import ws_tokens

    stream = (
        df.select(F.explode(ws_tokens(text_col)).alias("token"))
        .filter(F.col("token") != "")
    )
    return heavy_hitters(stream, "token", k=k, capacity=capacity)
