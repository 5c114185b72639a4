"""Deterministic sampling primitives for training-data mixing.

The hash-threshold row sampler lives inline in the query registry
(``sample_deterministic`` — it is one filter expression); this module
holds the group-wise primitive both the sampling gate and the capstone
pipeline share.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _md5_bucket_offsets(
    df: DataFrame, group_col: str, id_col: str, measure
) -> DataFrame:
    """Shared phase-1 of the bucketed two-phase prefix (r11): per
    (group, md5-first-byte bucket) sums of *measure* with the running
    total of all EARLIER buckets.  The bucket table is ≤ 256 rows per
    group — metadata-sized — so its running-total window is free, and
    the broadcast graft back costs nothing.  Because the bucket is the
    md5 key's first byte, global per-group md5 order ≡ (bucket asc,
    key asc): fine windows then partition by (group, bucket), giving
    256× the parallelism and 1/256 the skew bound of a whole-group
    window — the difference between "a dominant source is a dominant
    task" and a plan that survives 100 TB."""
    return (
        df.groupBy(
            F.col(group_col).alias("__mb_g"), F.col("__cap_b").alias("__mb_b")
        )
        .agg(F.sum(measure).cast("long").alias("__mb_t"))
        .select(
            "__mb_g",
            "__mb_b",
            F.coalesce(
                F.sum("__mb_t").over(
                    W.partitionBy("__mb_g")
                    .orderBy("__mb_b")
                    .rowsBetween(W.unboundedPreceding, -1)
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("__mb_before"),
        )
    )


def _with_md5_bucket(df: DataFrame, id_col: str):
    key = F.md5(F.col(id_col).cast("string"))
    return df.withColumn("__cap_key", key).withColumn(
        "__cap_b", F.conv(F.substring(F.col("__cap_key"), 1, 2), 16, 10).cast("int")
    )


def cap_per_group(
    df: DataFrame, group_col: str, id_col: str, n: int, rank_col: str | None = None
) -> DataFrame:
    """Keep at most *n* rows per *group_col*, chosen DETERMINISTICALLY:
    rank within the group by ``md5(id)`` (a stable, layout- and
    engine-independent order — the same trick as hash-threshold
    sampling) with the id itself as tiebreak, keep rank ≤ n.

    ``rank_col``: optionally keep the 1-based rank in the output under
    this name; default drops it.

    Scale note (r11): the rank is a BUCKETED two-phase computation
    (see _md5_bucket_offsets) — per-bucket counts plus a row_number
    within (group, md5-first-byte bucket) — so the sort bound is the
    largest group's largest BUCKET (~1/256 of the group), never the
    whole group; identical ranks to the naive whole-group window."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    keyed = _with_md5_bucket(df, id_col)
    offs = _md5_bucket_offsets(keyed, group_col, id_col, F.lit(1))
    # eqNullSafe: a NULL group is one group (the window below treats it
    # as one partition); plain `=` would orphan its offset rows and let
    # every md5 bucket restart at rank 1 — up to 256*n kept rows.
    keyed = keyed.join(
        F.broadcast(offs),
        F.col(group_col).eqNullSafe(F.col("__mb_g"))
        & (F.col("__cap_b") == F.col("__mb_b")),
        "left",
    )
    wf = W.partitionBy(group_col, "__cap_b").orderBy("__cap_key", F.col(id_col))
    out = keyed.withColumn(
        "__cap_rk",
        (F.coalesce(F.col("__mb_before"), F.lit(0)) + F.row_number().over(wf))
        .cast("long"),
    ).filter(F.col("__cap_rk") <= n)
    out = out.drop("__cap_key", "__cap_b", "__mb_g", "__mb_b", "__mb_before")
    if rank_col is None:
        return out.drop("__cap_rk")
    return out.withColumnRenamed("__cap_rk", rank_col)


def cap_tokens_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    tokens_col: str,
    budget: int,
    cum_col: str | None = None,
) -> DataFrame:
    """Keep rows per *group_col* until a TOKEN budget is spent — the
    data-mixing primitive real training runs use (mixture weights are
    token budgets per source, not document counts; cf.
    :func:`cap_per_group` for the count-based variant).

    Rows are visited in the same deterministic md5(id) order as
    ``cap_per_group``; a row is kept iff the tokens consumed BEFORE it
    are still under *budget*, so the row that straddles the boundary is
    kept (budget is a floor: every group with ≥ budget tokens yields
    ≥ budget tokens; truncate downstream if an exact cut matters —
    that is the packing operator's job, not the sampler's).

    ``cum_col``: optionally keep the tokens-consumed-before audit
    column under this name.

    Scale note (r11): the cumulative sum is the BUCKETED two-phase
    form (see _md5_bucket_offsets) — per-bucket token sums plus a
    running frame within (group, md5-first-byte bucket) — so the sort
    bound is ~1/256 of the largest group, never the whole group;
    byte-identical `before` values to the naive whole-group window.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    keyed = _with_md5_bucket(df, id_col)
    offs = _md5_bucket_offsets(keyed, group_col, id_col, F.col(tokens_col))
    # eqNullSafe: see cap_per_group — a NULL group must match its own
    # offset rows or its buckets each get the full budget (~256x).
    keyed = keyed.join(
        F.broadcast(offs),
        F.col(group_col).eqNullSafe(F.col("__mb_g"))
        & (F.col("__cap_b") == F.col("__mb_b")),
        "left",
    )
    wf = (
        W.partitionBy(group_col, "__cap_b")
        .orderBy("__cap_key", F.col(id_col))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    before = (
        F.coalesce(F.col("__mb_before"), F.lit(0))
        + F.coalesce(F.sum(tokens_col).over(wf), F.lit(0))
    ).cast("long")
    out = keyed.withColumn("__cap_before", before).filter(
        F.col("__cap_before") < budget
    )
    out = out.drop("__cap_key", "__cap_b", "__mb_g", "__mb_b", "__mb_before")
    if cum_col is None:
        return out.drop("__cap_before")
    return out.withColumnRenamed("__cap_before", cum_col)


def split_assign(
    df: DataFrame,
    id_col: str,
    splits: tuple[tuple[str, int], ...] = (("train", 800), ("val", 100), ("test", 100)),
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by stable-id hash — the
    split must be a pure function of the document identity, never of
    partition layout or RNG state, or re-runs leak eval docs into
    training.  Weights are PER-MILLE integers summing to 1000 (integer
    arithmetic end-to-end: no float boundary can disagree between
    engines).

    ``bucket = hash32(salt ':' id) % 1000``; a document lands in the
    first split whose cumulative weight exceeds its bucket.  *salt*
    namespaces independent splits of the same corpus (re-splitting for
    a new run = new salt, zero correlation with the old assignment).

    Scale note: one projection, no shuffle — the assignment is a
    filter-pushdown-friendly expression, so ``WHERE split = 'train'``
    prunes at the scan like any predicate.
    """
    from hive_scd_spark.functions import hash32

    weights = [w for _, w in splits]
    if any(w <= 0 for w in weights) or sum(weights) != 1000:
        raise ValueError(
            f"split weights must be positive per-mille summing to 1000, got {splits}"
        )
    bucket = hash32(
        F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string"))
    ) % 1000
    cum = 0
    expr = F.lit(splits[-1][0])  # fold from the back; last split is the default
    bounds = []
    for name, w in splits:
        cum += w
        bounds.append((name, cum))
    for name, upper in reversed(bounds[:-1]):
        expr = F.when(bucket < upper, F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def sample_weighted(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    n: int,
    max_weight: int = 1000,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep *n*
    rows with inclusion preference proportional to integer
    *weight_col* — the primitive behind temperature-weighted corpus
    mixing (sample source s proportional to count_s^alpha) and
    quality-weighted selection.

    The trick that keeps it ENGINE-EXACT where the textbook A-ES
    (priority u^(1/w), Efraimidis & Spirakis 2006) is not: a weight-w
    item's priority is the MAX of w independent md5 subkey draws —
    distributionally identical to u^(1/w) (the max of w iid uniforms)
    for integer weights, but computed entirely in md5-hex string
    comparisons.  No pow/log, no floating point, no cross-engine
    last-ulp risk; any SQL engine replays it bit-for-bit, and
    layout/partitioning cannot affect it.

    Plan: explode w subkeys per row (bounded by *max_weight* — an
    explicit error, not a silent cap: resolution beyond ~1000 is
    noise), map-combined MAX per id, global top-n via orderBy+limit
    (TakeOrderedAndProject — per-partition heaps, no full sort
    shuffle).  Weights ≤ 0 or NULL drop the row (zero tickets),
    matching the A-ES convention — NULL must be coalesced BEFORE the
    max_weight check or it would fall through the three-valued
    comparison into the raise branch and abort the job."""
    if n <= 0:
        raise ValueError(f"n must be positive, got {n}")
    w = F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
    checked = F.when(w <= max_weight, w).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"sample_weighted: weight exceeds max_weight={max_weight}: "),
                w.cast("string"),
            )
        )
    )
    # sequence(1, w) DESCENDS for w < 1 ([1, 0], [1, 0, -1], …) instead
    # of being empty — route non-positive weights to an empty ticket
    # array so explode drops the row
    tickets = df.select(
        F.col(id_col).alias("__id"),
        F.explode(
            F.when(checked >= 1, F.sequence(F.lit(1).cast("long"), checked))
            .otherwise(F.array().cast("array<long>"))
        ).alias("__j"),
    ).select(
        "__id",
        F.md5(F.concat_ws(":", F.col("__id").cast("string"), F.col("__j"))).alias(
            "__t"
        ),
    )
    best = tickets.groupBy("__id").agg(F.max("__t").alias("__priority"))
    winners = best.orderBy(F.desc("__priority"), F.asc("__id")).limit(n)
    return df.join(
        winners.select(F.col("__id").alias(id_col), "__priority"), id_col
    ).drop("__priority")


def split_by_cluster(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    pair_a: str = "id_a",
    pair_b: str = "id_b",
    splits: tuple[tuple[str, int], ...] = (("train", 800), ("val", 100), ("test", 100)),
    salt: str = "split",
    strategy: str = "propagate",
) -> DataFrame:
    """Leakage-safe train/val/test split: every member of a
    near-duplicate cluster receives the SAME split, so an eval document
    can never have a near-copy in training.  A plain per-document hash
    split (:func:`split_assign`) is blind to duplication — with a 10 %
    eval fraction, a duplicate pair straddles the train/eval boundary
    with probability ~0.18, and at web scale "some eval docs have a
    training near-copy" becomes "most".

    The split key is the duplicate component's canonical id
    (:func:`~hive_scd_spark.operators.cluster.dup_clusters` min-id
    label over *pairs*); documents in no pair key on themselves, so
    their assignment is IDENTICAL to ``split_assign(docs, id_col,
    splits, salt)`` — introducing dedup-aware splitting perturbs only
    the documents it must.  Assignment is then the same per-mille
    integer-hash rule as :func:`split_assign`, applied to the key: a
    pure function of (salt, cluster identity), independent of partition
    layout, RNG state, and of WHICH member of the cluster you ask.

    Output: *docs* + ``split_key`` (the cluster canonical id) +
    ``split``.

    Scale: the component labeling is the dominant cost (see
    dup_clusters — pair-graph-sized, not corpus-sized); grafting labels
    onto the corpus is one shuffle join on the id (clusters frame ≈
    paired docs only, usually far smaller than the corpus), and the
    assignment itself stays a shuffle-free projection.
    """
    from hive_scd_spark.operators.cluster import dup_clusters

    # the cluster graph keys on LONG ids; a non-integral id (e.g. a
    # string doc key) would cast to NULL, every such doc would share
    # the one NULL key and fall into a single split — silently voiding
    # the leak-safety guarantee (ADVICE r9).  Fail loudly instead:
    # NULL-on-cast with a non-NULL input raises at execution time
    # (row-level expression — no driver action, scale-free).  try_cast
    # keeps the message consistent whether ANSI mode is on (plain cast
    # would throw its own CAST_INVALID_INPUT first) or off (plain cast
    # would return the silent NULL this guard exists to catch).
    # ... and the cast must ROUND-TRIP (ADVICE r10): try_cast alone
    # TRUNCATES fractional numerics (DoubleType 3.9 → 3), so distinct
    # float ids could silently collide on split_key — the same silent
    # leak-safety failure, one type family over.  Non-canonical strings
    # ("03" → 3 ← "3") collide the same way; the round-trip comparison
    # rejects every non-faithful mapping in one rule.  All row-level
    # expressions — no driver action, scale-free.
    idc = F.col(id_col)
    id_type = docs.schema[id_col].dataType
    id_long_raw = idc.try_cast("long")
    faithful = id_long_raw.isNotNull() & (id_long_raw.cast(id_type) == idc)
    id_long = F.when(idc.isNull(), F.lit(None).cast("long")).otherwise(
        # coalesce: three-valued logic must not route a NULL comparison
        # into the raise_error branch silently — treat unknown as bad
        F.when(F.coalesce(faithful, F.lit(False)), id_long_raw).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        f"split_by_cluster: {id_col} must be integral "
                        "(round-trip castable to long; fractional or "
                        "non-canonical ids would collide), got "
                    ),
                    idc.cast("string"),
                )
            ).cast("long")
        )
    )
    clusters = dup_clusters(pairs, pair_a, pair_b, strategy=strategy)
    labeled = docs.join(
        clusters.select(
            F.col("node").alias("__sbc_node"), F.col("cluster").alias("__sbc_cluster")
        ),
        on=id_long == F.col("__sbc_node"),
        how="left",
    ).drop("__sbc_node")
    keyed = labeled.select(
        *docs.columns,
        F.coalesce(F.col("__sbc_cluster"), id_long).alias("split_key"),
    )
    return split_assign(keyed, "split_key", splits, salt)


def quality_floor_per_group(
    df: DataFrame,
    group_col: str,
    id_col: str,
    score_col: str,
    keep_permille: int,
) -> DataFrame:
    """Per-group quality floor — the standard curation step "keep the
    top fraction of each source by quality score" (per-source floors,
    not a global one: a global threshold lets one high-scoring source
    crowd out every other, destroying the mixture).  Selection is
    RANK-based, not threshold-based: rank within the group by
    (score desc, id asc — deterministic tiebreak), keep
    ``rank <= ceil(n_group · keep_permille / 1000)``.  Rank semantics
    sidestep the float-boundary fragility of "score >= quantile(q)"
    (two engines interpolating a quantile differently flip boundary
    rows; a rank cutoff over identical values cannot disagree), the
    keep fraction is a PER-MILLE integer (the split_assign convention —
    the ceil is pure int arithmetic, no 0.6-is-not-representable
    surprises), and every group keeps at least one document.

    Output: the kept rows (all input columns), plus ``q_rank`` (the
    1-based rank) and ``n_group``.

    Scale: one shuffle by group + per-group sort (the cap_per_group
    cost model — bounded by the largest group's sort; AQE handles
    moderate skew).  The group count rides the same window, no second
    shuffle.
    """
    if not (0 < keep_permille <= 1000):
        raise ValueError(
            f"keep_permille must be in (0, 1000], got {keep_permille}"
        )
    w = W.partitionBy(group_col).orderBy(
        F.col(score_col).desc(), F.col(id_col)
    )
    wc = W.partitionBy(group_col)
    out = df.withColumn("q_rank", F.row_number().over(w)).withColumn(
        "n_group", F.count("*").over(wc)
    )
    # ceil(n*kp/1000) over positive ints = (n*kp + 999) div 1000
    return out.filter(
        F.col("q_rank")
        <= (F.col("n_group") * keep_permille + 999).cast("long") / F.lit(1000)
    )


def shuffle_corpus(
    df: DataFrame,
    id_col: str,
    salt: str = "shuffle",
    rank_col: str = "shuffle_rank",
) -> DataFrame:
    """Deterministic distributed GLOBAL SHUFFLE for training order —
    the step between curation and sequence packing: documents must be
    presented in an order that is (a) statistically shuffled, (b) a
    pure function of (salt, document identity) so a re-run — or a
    different cluster layout, or a different engine — reproduces the
    SAME order, and (c) computed without a single-partition sort.
    A new *salt* is a fresh, uncorrelated permutation (the
    split_assign namespacing convention).

    Output: *df* + *rank_col*, the dense 1-based global position in
    md5(salt ':' id) order (id tiebreak — total order).

    Scale: the two-phase distributed ranking (operators/shard.py:
    distributed_rank — range repartition + per-partition row_number +
    driver cumsum over PARTITION COUNTS, never rows), exactly the
    balanced_shards machinery pointed at a hash key.  One range
    shuffle; no window over the whole corpus.
    """
    key = F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string")))
    from hive_scd_spark.operators.shard import distributed_rank

    out = distributed_rank(
        df.withColumn("__shuf_key", key),
        [F.asc("__shuf_key"), F.asc(id_col)],
        rank_name=rank_col,
    )
    return out.drop("__shuf_key")


# quarter-power ladders: sqrt is CORRECTLY ROUNDED under IEEE 754, so a
# chain of sqrts (and one product of two such values) evaluates to the
# identical double in every conforming engine — which is what lets the
# temperature weights be value-checked against DuckDB at all.  A free
# exponent would go through pow(), whose last-ulp behavior is
# library-specific; restricting alpha to quarter powers keeps the
# operator engine-exact (the md5-determinism discipline, applied to
# floats).
_ALPHA_LADDER = {1.0, 0.75, 0.5, 0.25}


def temperature_mix(
    df: DataFrame,
    id_col: str,
    source_col: str,
    tokens_col: str,
    budget: int,
    alpha: float = 0.5,
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-scaled source mixing — the multilingual/multi-source
    sampling recipe (Lample & Conneau arXiv:1901.07291 §3.1; also the
    mT5/GPT-3 data-mixture shape): a corpus of unequal sources is
    rebalanced by sampling source *s* proportional to ``n_s^alpha``
    (n_s = the source's token count).  ``alpha = 1`` keeps natural
    proportions, ``alpha → 0`` approaches uniform-over-sources; small
    high-quality sources get UP-sampled (documents repeat — real
    recipes run small sources for multiple epochs) and huge crawls get
    down-sampled.

    Per source: ``target_s = floor(budget · n_s^alpha / Σ n_t^alpha)``
    tokens, materialized as ``n_repeats = target_s // n_s`` full
    epochs for every document plus ONE extra repeat for the
    deterministic md5-order document prefix covering the remainder
    (the cap_tokens_per_group boundary rule: the straddling document
    rounds up).  Every input row survives with its ``n_repeats``
    (possibly 0 — dropped from the mixture); downstream materializes
    repeats with the id-salted explode it prefers.

    Engine-exactness: *alpha* must be a quarter power (0.25/0.5/
    0.75/1.0 — sqrt chains are IEEE-correctly-rounded, see
    _ALPHA_LADDER); the weight SUM folds over sources in sorted-name
    order (a ~20-element fold in a 1-row aggregate — additions in a
    fixed order, so the double is bit-identical in any engine); all
    remaining arithmetic is integer.  Output: *df* + ``n_repeats``
    (long).

    Scale: one groupBy(source) whose result is SOURCE-COUNT-sized, a
    1-row ordered fold, a broadcast join of the per-source stats back
    to the corpus, and a BUCKETED two-phase cumulative sum for the
    remainder prefix (md5-first-byte buckets; see the inline comment)
    — the fine window partitions by (source, bucket), so a dominant
    source costs 1/256 of itself per task instead of one whole-source
    sort.  Nothing corpus-quadratic, nothing driver-sized.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if alpha not in _ALPHA_LADDER:
        raise ValueError(
            f"alpha must be one of {sorted(_ALPHA_LADDER)} (quarter powers "
            f"stay IEEE-exact across engines), got {alpha}"
        )

    def ladder(n):
        d = n.cast("double")
        if alpha == 1.0:
            return d
        if alpha == 0.5:
            return F.sqrt(d)
        if alpha == 0.25:
            return F.sqrt(F.sqrt(d))
        return F.sqrt(d) * F.sqrt(F.sqrt(d))  # 0.75

    src = F.col(source_col)
    stats = (
        df.groupBy(src.alias("__tm_source"))
        .agg(F.sum(F.coalesce(F.col(tokens_col), F.lit(0))).cast("long").alias("__tm_n"))
        .filter(F.col("__tm_n") > 0)
        .withColumn("__tm_w", ladder(F.col("__tm_n")))
    )
    total = stats.agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.struct("__tm_source", "__tm_w"))),
            F.lit(0.0).cast("double"),
            lambda acc, x: acc + x["__tm_w"],
        ).alias("__tm_sum")
    )
    targets = stats.crossJoin(F.broadcast(total)).select(
        "__tm_source",
        "__tm_n",
        F.floor(F.lit(float(budget)) * (F.col("__tm_w") / F.col("__tm_sum")))
        .cast("long")
        .alias("__tm_target"),
    )
    joined = df.join(
        F.broadcast(targets), src == F.col("__tm_source"), "left"
    ).drop("__tm_source")
    # Remainder prefix as a BUCKETED two-phase cumulative sum (the
    # pack.py distributed-prefix-sum pattern), NOT one window per
    # source: partitionBy(source) would put an entire source in one
    # sort task — at 100 TB a dominant source is a dominant task.
    # Bucket = the md5 key's first byte, so global per-source md5
    # order ≡ (bucket asc, key asc): phase 1 sums tokens per
    # (source, bucket) — a ≤ 256-rows-per-source METADATA table whose
    # running totals ride a tiny window; phase 2 grafts each bucket's
    # offset back (broadcast) and runs the fine cumsum per
    # (source, bucket) — 256× the parallelism and 1/256 the skew
    # bound of the naive window, byte-identical `before` values.
    tok = F.coalesce(F.col(tokens_col), F.lit(0))
    key = F.md5(F.concat(F.lit(salt), F.lit(":"), F.col(id_col).cast("string")))
    keyed = joined.withColumn("__tm_key", key).withColumn(
        "__tm_b", F.conv(F.substring(F.col("__tm_key"), 1, 2), 16, 10).cast("int")
    )
    bsums = keyed.groupBy(
        src.alias("__tmb_source"), F.col("__tm_b").alias("__tmb_b")
    ).agg(F.sum(tok).cast("long").alias("__tmb_t"))
    wb = (
        W.partitionBy("__tmb_source")
        .orderBy("__tmb_b")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    boffs = bsums.select(
        "__tmb_source",
        "__tmb_b",
        F.coalesce(F.sum("__tmb_t").over(wb), F.lit(0))
        .cast("long")
        .alias("__tmb_before"),
    )
    keyed = keyed.join(
        F.broadcast(boffs),
        (src == F.col("__tmb_source")) & (F.col("__tm_b") == F.col("__tmb_b")),
        "left",
    ).drop("__tmb_source", "__tmb_b")
    wf = (
        W.partitionBy(src, "__tm_b")
        .orderBy("__tm_key", F.col(id_col))
        .rowsBetween(W.unboundedPreceding, -1)
    )
    before = (
        F.coalesce(F.col("__tmb_before"), F.lit(0))
        + F.coalesce(F.sum(tok).over(wf), F.lit(0))
    ).cast("long")
    # `div` is true integer division (ADVICE r11): floor(a / b) routes
    # through a double and can be off by one past 2^53, breaking the
    # "all remaining arithmetic is integer" engine-exactness claim.
    repeats = (
        F.expr("__tm_target div __tm_n").cast("long")
        + F.when(before < F.col("__tm_target") % F.col("__tm_n"), 1).otherwise(0)
    )
    return keyed.select(
        *df.columns,
        F.coalesce(repeats, F.lit(0)).cast("long").alias("n_repeats"),
    )


def soft_dedup_weights(
    docs: DataFrame, pairs: DataFrame, id_col: str
) -> DataFrame:
    """Soft deduplication: down-WEIGHT duplicate clusters instead of
    dropping them — the published alternative to hard dedup (sampling
    pressure ∝ 1/cluster_size keeps one expected copy of every
    near-dup cluster in each epoch while hard dedup's canonical-keeper
    choice discards the variants outright).  Composes with every
    sampler in this module: feed ``weight`` to ``sample_weighted`` or
    multiply it into a token budget.

    *pairs* is any near-dup pair set (MinHash/SimHash/winnowing —
    columns ``id_a``/``id_b``); clusters come from the same
    ``cluster.dup_clusters`` fixpoint the hard-dedup lane uses, so the
    two lanes agree on what a duplicate IS.  Output: every input
    document with (cluster_size, weight = round(1/cluster_size, 6));
    unpaired documents get cluster_size 1, weight 1.0.

    Scale: the cluster pass is the audited O(log n) large/small-star
    CC; sizes are one combiner-collapsed groupBy over the CLUSTERED
    nodes only (pair-graph-sized, not corpus-sized); the graft back is
    one left equi-join on the id."""
    from hive_scd_spark.operators.cluster import dup_clusters

    clusters = dup_clusters(pairs)
    sizes = clusters.groupBy("cluster").agg(
        F.count("*").cast("long").alias("__csz")
    )
    labeled = clusters.join(sizes, "cluster").select(
        F.col("node").alias(id_col), F.col("__csz")
    )
    return (
        docs.select(F.col(id_col))
        .join(labeled, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("__csz"), F.lit(1)).cast("long").alias("cluster_size"),
            F.round(
                F.lit(1.0) / F.coalesce(F.col("__csz"), F.lit(1)).cast("double"), 6
            ).alias("weight"),
        )
    )
