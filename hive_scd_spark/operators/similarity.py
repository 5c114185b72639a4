"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — brute-force exact top-k: broadcast the query
  set, one pass over the corpus, per-query window for the top-k.  The
  correctness baseline; cost O(|corpus|·|queries|) — fine when the
  query set broadcasts.
- :func:`lsh_bucketize` — random-hyperplane LSH bucket ids with
  *deterministic* md5-derived hyperplanes (cross-engine reproducible).
  The scale path: bucket the corpus once (shuffle on bucket id), then
  probe only matching buckets; recall tunable via n_planes/n_tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from hive_scd_spark.functions import dot_w, vector_norm, vector_norm_w

# Why these trainers pin (optimization r15, guide §2.4/§5): they
# return LAZY plans, and every downstream reference — pq_encode's
# codebook broadcast, the ADC LUT build, a second encode in the
# incremental gates — re-executes the whole Lloyd-iteration subtree.
# Measured on ann_ivf_pq_incremental at sf0.1: 92 Exchange nodes in
# one plan, 6.3 s; the training subtree appeared 3×.  The helper moved
# to operators/_materialize.py in r16 (the LM/DSIR pins share it); the
# rationale, value-fidelity and accounting notes live there.
from hive_scd_spark.operators._materialize import materialize_small as _materialize_small


def _pair_cos(qv, cv, qn, cn, w: int | None = None):
    """round(dot/(|q|·|c|), 6) with norms precomputed per row — one
    fold per pair instead of three (see dedup module note).

    With *w* (the statically-known vector width — a pure function of
    operator parameters) the dot is the whole-stage-codegen
    :func:`~hive_scd_spark.functions.dot_w` expansion; without it the
    generic interpreted HOF fold.  Same IEEE sequence, same NULL
    propagation — bit-identical results (optimization r16)."""
    if w is not None:
        dot = dot_w(qv, cv, w)
    else:
        dot = F.aggregate(
            F.zip_with(qv, cv, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    # try_divide: zero-norm vector → NULL cosine (ANSI-safe), which
    # sorts last under DESC ordering and never enters a top-k
    return F.round(F.try_divide(dot, qn * cn), 6)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Output: (query_id, neighbor_id, cos) with deterministic tie-break
    (higher cos first, then smaller neighbor id).  Self-matches are
    excluded."""
    from hive_scd_spark.operators.layout import fan_out

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        vector_norm(F.col(vec_col)).alias("__qn"),
    )
    c = fan_out(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        vector_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _pair_cos(
                F.col("__qv"), F.col("__cv"), F.col("__qn"), F.col("__cn")
            ).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "rk")
    )


def plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    md5 of "plane_dim" → 32-bit uniform → shift.  Same value in any
    engine with md5 (DuckDB oracle recomputes it in SQL) — the whole
    LSH index is reproducible."""
    import hashlib

    h = int(hashlib.md5(f"{plane}_{dim}".encode()).hexdigest()[:8], 16)
    return h / 4294967296.0 - 0.5


def _bucket_expr(vec_col: str, n_planes: int, dim: int | None, plane_offset: int = 0):
    """Bucket id = sign-bit pattern of the vector against *n_planes*
    deterministic hyperplanes (global plane index = plane_offset + p, so
    bands draw disjoint plane sets from the same md5 stream).

    With ``dim`` given, the planes are driver-computed constant arrays;
    each bit is one ``zip_with``+``aggregate`` fold over the vector — a
    flat per-row loop, no shuffle, no Python.  With ``dim=None`` the
    SAME md5-derived components are computed lazily inside the plan
    (``transform`` with the element index), so building the plan never
    triggers a job — at the cost of n_planes×dim md5 calls per row.
    Pass ``dim`` in production; both paths produce identical buckets."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        g = plane_offset + p  # md5 keying uses the global plane index
        if dim is not None:
            dot = F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(plane_component(g, d)) for d in range(dim)]),
                    lambda x, w: x.cast("double") * w,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        else:
            # lazy twin of plane_component(): int(md5(f"{g}_{d}")[:8], 16)
            # / 2**32 - 0.5, evaluated per element — dim never needed
            dot = F.aggregate(
                F.transform(
                    F.col(vec_col),
                    lambda x, i: x.cast("double")
                    * (
                        F.conv(
                            F.substring(
                                F.md5(F.concat(F.lit(f"{g}_"), i.cast("string"))), 1, 8
                            ),
                            16,
                            10,
                        ).cast("double")
                        / F.lit(4294967296.0)
                        - F.lit(0.5)
                    ),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        bit = F.when(dot > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + F.shiftleft(bit, p)
    return bucket


def lsh_bucketize(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    dim: int | None = None,
) -> DataFrame:
    """Random-hyperplane LSH: output (id, bucket) — join queries and
    corpus on bucket, then exact-rank within the bucket.  See
    ``_bucket_expr`` for the constant-plane vs lazy-plane trade."""
    return df.select(
        F.col(id_col), _bucket_expr(vec_col, n_planes, dim).alias("bucket")
    )


def lsh_band_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 6,
    n_bands: int = 4,
    dim: int | None = None,
) -> DataFrame:
    """Banded LSH (the MinHash-LSH recall trick applied to hyperplane
    sketches): *n_bands* independent bucketings over disjoint plane
    sets; a pair is a candidate if it collides in ANY band —
    P(candidate) = 1-(1-p^n_planes)^n_bands, tunable recall without
    widening any single bucket.

    One scan: all band buckets are computed in a single projection and
    exploded as (band, bucket) structs — only the id survives the
    explode (the vector never rides through candidate generation)."""
    structs = F.array(
        *[
            F.struct(
                F.lit(b).cast("int").alias("band"),
                _bucket_expr(vec_col, n_planes, dim, b * n_planes).alias("bucket"),
            )
            for b in range(n_bands)
        ]
    )
    return (
        df.select(F.col(id_col), F.explode(structs).alias("__bb"))
        .select(id_col, F.col("__bb.band").alias("band"), F.col("__bb.bucket").alias("bucket"))
    )


def _ivf_centroids(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    stride: int,
    dim: int | None = None,
) -> DataFrame:
    """Deterministic sampled centroids: every vector whose id divides
    *stride*.  An id-stride sample is statistically uniform over a
    hash-assigned id space, is reproducible in plain SQL
    (oracle-checkable), and can be swapped for k-means-trained
    centroids (:func:`kmeans_centroids`) without touching the query
    path — both produce the same (list_id, __centv, __centn) shape.
    *dim*: statically-known width → codegen norm (r16)."""
    norm = (
        vector_norm_w(F.col(vec_col), dim)
        if dim is not None
        else vector_norm(F.col(vec_col))
    )
    return df.filter((F.col(id_col) % stride) == 0).select(
        F.col(id_col).alias("list_id"),
        F.col(vec_col).alias("__centv"),
        norm.alias("__centn"),
    )


def ivf_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stride: int = 29,
    dim: int | None = None,
) -> DataFrame:
    """Public stride-sampled centroid table — the freezable coarse-
    quantizer state for the incremental serving loop
    (:func:`ivf_pq_incremental_topk`): train/sample ONCE on the
    standing corpus, persist, and pass to every arrival batch.
    Same (list_id, __centv, __centn) shape as
    :func:`kmeans_centroids`, so trained centroids swap in without
    touching the query path.

    Materialized at build (optimization r15): this is the FROZEN
    coarse-quantizer state — the serving loop references it from the
    corpus assignment, the arrival assignment, and the probe selection
    (3 broadcasts), each of which otherwise re-runs the sample scan.
    The table is broadcast unconditionally downstream, so the driver
    collect is within the existing envelope (see
    :func:`_materialize_small`); callers are builder-timed."""
    return _materialize_small(_ivf_centroids(df, id_col, vec_col, stride, dim))


def _nearest_centroid(
    vecs: DataFrame,
    cent: DataFrame,
    out_cols: list[str],
    w: int | None = None,
) -> DataFrame:
    """Assign each (__id, __v, __n) row to its nearest centroid by
    cosine (ties → smallest list_id).  Broadcast crossJoin +
    ``max(struct(sim, -list_id))`` argmax: the groupBy partial-aggregates
    map-side, so the only shuffle is one row per input vector — no
    window over the n×k scored pairs.  *w*: statically-known vector
    width → codegen dot (see _pair_cos, r16)."""
    scored = vecs.crossJoin(F.broadcast(cent)).select(
        *[F.col(c) for c in out_cols],
        F.struct(
            _pair_cos(
                F.col("__v"), F.col("__centv"), F.col("__n"), F.col("__centn"),
                w=w,
            ).alias("sim"),
            (-F.col("list_id")).alias("neg_list"),
        ).alias("__sl"),
    )
    return (
        scored.groupBy(*out_cols)
        .agg(F.max("__sl").alias("__best"))
        .select(
            *out_cols,
            (-F.col("__best.neg_list")).alias("list_id"),
            F.col("__best.sim").alias("__sim"),
        )
    )


def kmeans_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_lists: int = 32,
    n_iter: int = 3,
    sample_mod: int = 1,
) -> DataFrame:
    """Spherical k-means training for IVF coarse quantization —
    deterministic, fully distributed; the only driver-side state is the
    n_lists seed rows (metadata-sized by definition: a centroid table
    must fit in one broadcast anyway).

    - **init**: the *n_lists* vectors with the smallest
      ``md5(id)`` — a reproducible uniform draw over the id space
      (distributed TopK via ``orderBy().limit()``, then list_id
      enumeration over the collected ≤ n_lists seeds).
    - **iterate** (Lloyd): assign via :func:`_nearest_centroid`
      (broadcast centroids, map-side-combined argmax — one
      one-row-per-vector shuffle), then re-estimate each centroid as
      the element-wise mean via ``posexplode`` + partial-agg ``avg``
      (shuffle output is only n_lists×dim rows).
    - **100 TB**: centroids always broadcast (n_lists×dim floats);
      per-iteration cost is a corpus scan + two map-side-combined
      aggs.  Train on a sample (``sample_mod``) and assign the full
      corpus once — the standard IVF recipe.

    Output matches ``_ivf_centroids``: (list_id, __centv, __centn),
    list_id = 0..n_lists-1.
    """
    from hive_scd_spark.operators.layout import fan_out

    vecs = fan_out(df).select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
    if sample_mod > 1:
        vecs = vecs.filter((F.col("__id") % sample_mod) == 0)
    vecs = vecs.withColumn("__n", vector_norm(F.col("__v")))
    # Seed selection: the n_lists vectors with the smallest md5(id) —
    # a distributed TopK (orderBy + limit).  The ≤ n_lists seed rows
    # are METADATA-sized (bounded by n_lists, never by data volume), so
    # list_id 0..n-1 is assigned driver-side: a collect + re-create of
    # n_lists rows.  Replaces an unpartitioned row_number window that
    # was equally tiny but spammed WindowExec's moving-all-data warning
    # (VERDICT r3).  Python's hexdigest sort is byte-identical to
    # Spark's ORDER BY md5(cast(id as string)), so the seed order — and
    # therefore every downstream centroid/recall number — is unchanged.
    import hashlib

    from pyspark.sql import types as T

    seed_rows = (
        vecs.orderBy(F.md5(F.col("__id").cast("string")), F.col("__id"))
        .limit(n_lists)
        .collect()
    )
    seed_rows.sort(
        key=lambda r: (hashlib.md5(str(r["__id"]).encode()).hexdigest(), r["__id"])
    )
    vec_type = dict((f.name, f.dataType) for f in vecs.schema.fields)
    cent_schema = T.StructType(
        [
            T.StructField("list_id", T.LongType(), False),
            T.StructField("__centv", vec_type["__v"]),
            T.StructField("__centn", vec_type["__n"]),
        ]
    )
    cent = df.sparkSession.createDataFrame(
        [(i, r["__v"], r["__n"]) for i, r in enumerate(seed_rows)], cent_schema
    )
    for _ in range(n_iter):
        assigned = _nearest_centroid(vecs, cent, ["__id", "__v", "__n"])
        means = (
            assigned.select("list_id", F.posexplode("__v").alias("pos", "val"))
            .groupBy("list_id", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("avgv"))
            .groupBy("list_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "avgv"))),
                    lambda s: s.avgv,
                ).alias("__centv")
            )
        )
        cent = means.select(
            "list_id", "__centv", vector_norm(F.col("__centv")).alias("__centn")
        )
    # materialize the n_lists-row centroid table ONCE (optimization
    # r15): callers reference it from both the assignment and the
    # probe-selection broadcasts, re-running the full Lloyd training
    # per reference otherwise (see _materialize_small)
    return _materialize_small(cent)


def ivf_assign(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    stride: int = 29,
    centroids: DataFrame | None = None,
    dim: int | None = None,
) -> DataFrame:
    """IVF coarse quantization: assign every vector to its nearest
    (by cosine, ties → smallest centroid id) centroid.  One broadcast
    of the centroids + one corpus pass (map-side-combined argmax, no
    window).  Output: (id, list_id) — at scale this is computed once
    and stored alongside the corpus.  *centroids* defaults to the
    oracle-checkable id-stride sample; pass
    :func:`kmeans_centroids` output for trained lists.  *dim*:
    statically-known width → codegen dot/norm (r16, bit-identical)."""
    from hive_scd_spark.operators.layout import fan_out

    cent = (
        centroids
        if centroids is not None
        else _ivf_centroids(df, id_col, vec_col, stride, dim)
    )
    norm = (
        vector_norm_w(F.col(vec_col), dim)
        if dim is not None
        else vector_norm(F.col(vec_col))
    )
    vecs = fan_out(df).select(
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__v"),
        norm.alias("__n"),
    )
    return _nearest_centroid(vecs, cent, ["__id"], w=dim).select(
        F.col("__id").alias(id_col), "list_id"
    )


def ivf_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
    stride: int = 29,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF approximate top-k: rank only the members of each query's
    *n_probe* nearest inverted lists.  Each query touches roughly
    n_probe/n_lists of the corpus — the knob between recall and cost.
    *centroids* as in :func:`ivf_assign` (stride sample by default,
    k-means-trained via :func:`kmeans_centroids`)."""
    cent = (
        centroids
        if centroids is not None
        else _ivf_centroids(corpus, id_col, vec_col, stride)
    )
    assign = ivf_assign(corpus, id_col, vec_col, stride, centroids=cent)
    corpus_b = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        vector_norm(F.col(vec_col)).alias("__cn"),
    ).join(assign.withColumnRenamed(id_col, "neighbor_id"), "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        vector_norm(F.col(vec_col)).alias("__qn"),
    )
    probes = q.crossJoin(F.broadcast(cent)).select(
        "query_id",
        "__qv",
        "__qn",
        "list_id",
        _pair_cos(
            F.col("__qv"), F.col("__centv"), F.col("__qn"), F.col("__centn")
        ).alias("__sim"),
    )
    wp = W.partitionBy("query_id").orderBy(F.desc("__sim"), F.asc("list_id"))
    probed = (
        probes.withColumn("__rk", F.row_number().over(wp))
        .filter(F.col("__rk") <= n_probe)
        .select("query_id", "__qv", "__qn", "list_id")
    )
    scored = (
        corpus_b.join(F.broadcast(probed), "list_id")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _pair_cos(
                F.col("__qv"), F.col("__cv"), F.col("__qn"), F.col("__cn")
            ).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "rk")
    )


def ann_cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """Approximate top-k: LSH-bucket both sides, rank only within the
    query's bucket.  Recall < 1 by design; raise recall by lowering
    n_planes (bigger buckets) or multi-probing.  At 100 TB this turns
    an O(n·q) scan into a bucket-local join."""
    from hive_scd_spark.operators.layout import fan_out

    corpus = fan_out(corpus)
    cb = lsh_bucketize(corpus, id_col, vec_col, n_planes, dim).join(
        corpus.select(F.col(id_col), F.col(vec_col)), id_col
    )
    qb = lsh_bucketize(queries, id_col, vec_col, n_planes, dim).join(
        queries.select(F.col(id_col), F.col(vec_col)), id_col
    )
    q = qb.select(
        F.col(id_col).alias("query_id"),
        F.col("bucket"),
        F.col(vec_col).alias("__qv"),
        vector_norm(F.col(vec_col)).alias("__qn"),
    )
    c = cb.select(
        F.col(id_col).alias("neighbor_id"),
        F.col("bucket"),
        F.col(vec_col).alias("__cv"),
        vector_norm(F.col(vec_col)).alias("__cn"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            _pair_cos(
                F.col("__qv"), F.col("__cv"), F.col("__qn"), F.col("__cn")
            ).alias("cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "rk")
    )


def quantize_embeddings(df: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """Symmetric int8 quantization per vector — the standard 4× memory
    reduction before an ANN index is built or shipped (FAISS SQ8 /
    scalar-quantization; public technique).  Per row:

    - ``scale = max(|x|) / 127`` (symmetric, zero-point-free)
    - ``q[i] = floor(x[i]/scale + 0.5)`` clamped to [-127, 127]
      (round-half-up, spelled as floor arithmetic so Spark and the
      DuckDB oracle evaluate the IDENTICAL IEEE expression — ``round``
      half-even vs half-up conventions differ between engines)

    Output: (id, scale, q) with scale rounded to 9 places for the
    value-hash; q is exact integers.  All-zero vectors quantize to
    all-zero with scale 0.

    Scale: one codegen projection, no shuffle; dequantization is
    ``q[i]·scale``, and downstream cosine on int8 codes is the usual
    int-dot + per-vector scale product.
    """
    x = F.col(vec_col)
    vmax = F.array_max(F.transform(x, lambda v: F.abs(v.cast("double"))))
    scale = vmax / F.lit(127.0)
    q = F.when(
        vmax > 0,
        F.transform(
            x,
            lambda v: F.greatest(
                F.lit(-127),
                F.least(
                    F.lit(127),
                    F.floor(v.cast("double") / scale + F.lit(0.5)).cast("int"),
                ),
            ),
        ),
    ).otherwise(F.transform(x, lambda v: F.lit(0)))
    return df.select(
        F.col(id_col),
        F.round(scale, 9).alias("scale"),
        q.alias("q"),
    )


def hash_embed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 64,
    salt: str = "hembed",
) -> DataFrame:
    """Feature-hashing document embedding (the hashing trick,
    Weinberger et al. 2009 — public technique): each lowercased
    whitespace token contributes ±1 to the component indexed by
    ``hash32(salt ':' token) % dim``, sign from the md5's 9th hex
    digit's parity.  Model-free and deterministic across engines and
    layouts, so documents can enter the embedding operators (cosine
    top-k, LSH/IVF ANN, embedding dedup) without an external encoder —
    and the DuckDB oracle can replay the vectors exactly.

    Output: (id, vec: array<bigint>, n_tokens).  Components are raw
    signed counts (NOT normalized): integers survive cross-engine
    comparison exactly, and every consumer in this package normalizes
    internally (cosine divides by the norms it computes).

    Plan shape: explode → (id, bucket) groupBy → map-densify.  One md5
    per token, partial aggregation collapses the shuffle to at most
    dim rows per document, and the width of *dim* never appears as a
    per-row lambda cost — the all-projection alternative (a fold per
    component) re-evaluates the token hashing dim times per row
    because CollapseProject inlines multi-use aliases (measured 10-17 s
    vs ~1 s at sf0.1, dim 32).  This is also the shape that survives
    dim 4096: per-row work stays O(n + dim), never O(n × dim).
    """
    if dim < 1:
        raise ValueError(f"dim must be positive, got {dim}")
    # The explode is DELIBERATELY alone in its select: a sibling scalar
    # column (size/when over the same split) knocks the Project+Generate
    # out of whole-stage codegen and the tokenizer chain re-runs per
    # exploded row (measured 3.6 s vs 0.2 s at sf0.1 on one input
    # split).  Empty/NULL docs ride through as one '' token that never
    # joins the vocab → the zero vector; the token count is recovered
    # in the aggregation, not carried through the explosion.
    base = F.trim(F.lower(F.coalesce(F.col(text_col), F.lit(""))))
    ex = df.select(F.col(id_col), F.explode(F.split(base, r"\s+")).alias("__tok"))
    # Hash each DISTINCT token once, post-distinct (so the md5+conv work
    # is vocabulary-bounded and runs parallel after the shuffle, not
    # corpus-bounded on the scan's input splits), then join the (bucket,
    # sign) map back.  AQE broadcasts the map when it is small; for
    # high-entropy vocabularies the join degrades gracefully to shuffle.
    h = F.md5(F.concat(F.lit(salt), F.lit(":"), F.col("__tok")))
    vocab = (
        ex.select("__tok")
        .filter(F.col("__tok") != "")
        .distinct()
        .select(
            "__tok",
            (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % dim)
            .cast("int")
            .alias("__b"),
            F.when(
                F.conv(F.substring(h, 9, 1), 16, 10).cast("long") % 2 == 0,
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .cast("long")
            .alias("__s"),
        )
    )
    per_bucket = (
        ex.join(vocab, on="__tok", how="left")  # '' rows keep a null bucket
        .groupBy(id_col, "__b")
        .agg(
            F.sum("__s").alias("__v"),
            F.sum(F.when(F.col("__tok") != "", 1).otherwise(0)).alias("__c"),
        )
    )
    dense = per_bucket.groupBy(id_col).agg(
        F.map_from_entries(
            F.array_compact(
                F.collect_list(
                    F.when(
                        F.col("__b").isNotNull(),
                        F.struct(F.col("__b"), F.col("__v")),
                    )
                )
            )
        ).alias("__m"),
        F.sum("__c").cast("long").alias("n_tokens"),
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.coalesce(
            F.element_at(F.col("__m"), j.cast("int")), F.lit(0).cast("long")
        ),
    )
    return dense.select(F.col(id_col), vec.alias("vec"), F.col("n_tokens"))


def pq_codebooks(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_sub: int = 4,
    n_codes: int = 16,
    n_iter: int = 2,
    sample_mod: int = 1,
) -> DataFrame:
    """Product-quantization codebooks: split *dim* into *n_sub* equal
    subspaces and train an independent :func:`kmeans_centroids`
    codebook of *n_codes* entries in each — the Jégou-et-al PQ recipe,
    each stage reusing this module's deterministic k-means (md5-seeded
    init, fixed Lloyd iterations, round-6 argmax ties), so the whole
    training replays in SQL.  Output: (sub_id, list_id, __centv,
    __centn) — n_sub × n_codes rows, metadata-sized, always broadcast.

    Scale: PQ is the memory lever brute-force and IVF lack — a
    64-float vector (256 B) becomes n_sub code bytes (64× at 4×16),
    which is what lets a 100 TB embedding corpus keep its ANN index
    in cluster RAM.  The n_sub trainings are JOINT, not sequential:
    per-subspace argmax and means are independent, so every Lloyd
    iteration runs over the exploded (vector, subspace) table in ONE
    corpus pass (assign = broadcast codebooks + map-combined argmax
    keyed by (id, sub); re-estimate = one (sub, list, pos)-keyed avg)
    — value-identical to n_sub separate ``kmeans_centroids`` runs
    (same md5 seed ids per sub, same round-6 ties; the oracle replays
    the per-sub form) at 1/n_sub the scan count.  Train on a
    ``sample_mod`` slice at scale, exactly as IVF does."""
    if dim % n_sub != 0:
        raise ValueError(f"dim ({dim}) must divide evenly into n_sub ({n_sub})")
    w = dim // n_sub
    base = df
    if sample_mod > 1:
        base = base.filter((F.col(id_col) % sample_mod) == 0)
    subv = _subvectors(base, id_col, vec_col, dim, n_sub).withColumnRenamed(
        id_col, "__id"
    )
    # Seeds: the n_codes vectors with the smallest md5(id) — ONE
    # metadata-sized collect (same rule as kmeans_centroids; the same
    # seed ids serve every subspace, exactly as n_sub separate runs
    # would draw them).  Norms ride the collect from vector_norm, so
    # no Python float arithmetic enters the contract.
    seed_rows = (
        subv.orderBy(
            F.md5(F.col("__id").cast("string")), F.col("__id"), F.col("sub_id")
        )
        .limit(n_codes * n_sub)
        .collect()
    )
    import hashlib

    from pyspark.sql import types as T

    seed_rows.sort(
        key=lambda r: (
            hashlib.md5(str(r["__id"]).encode()).hexdigest(),
            r["__id"],
            r["sub_id"],
        )
    )
    sub_type = dict((f.name, f.dataType) for f in subv.schema.fields)
    cent_schema = T.StructType(
        [
            T.StructField("sub_id", T.IntegerType(), False),
            T.StructField("list_id", T.LongType(), False),
            T.StructField("__centv", sub_type["__v"]),
            T.StructField("__centn", sub_type["__n"]),
        ]
    )
    cent_data = []
    for rank, r in enumerate(seed_rows):
        cent_data.append((r["sub_id"], rank // n_sub, r["__v"], r["__n"]))
    cb = df.sparkSession.createDataFrame(
        [c for c in cent_data], cent_schema
    )
    for _ in range(n_iter):
        scored = subv.join(F.broadcast(cb), "sub_id").select(
            "__id",
            "sub_id",
            "__v",
            F.struct(
                _pair_cos(
                    F.col("__v"), F.col("__centv"), F.col("__n"), F.col("__centn"),
                    w=w,
                ).alias("sim"),
                (-F.col("list_id")).alias("neg_list"),
            ).alias("__sl"),
        )
        assigned = (
            scored.groupBy("__id", "sub_id", "__v")
            .agg(F.max("__sl").alias("__best"))
            .select(
                "sub_id", "__v", (-F.col("__best.neg_list")).alias("list_id")
            )
        )
        means = (
            assigned.select(
                "sub_id", "list_id", F.posexplode("__v").alias("pos", "val")
            )
            .groupBy("sub_id", "list_id", "pos")
            .agg(F.avg(F.col("val").cast("double")).alias("avgv"))
            .groupBy("sub_id", "list_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "avgv"))),
                    lambda s: s.avgv,
                ).alias("__centv")
            )
        )
        cb = means.select(
            "sub_id",
            "list_id",
            "__centv",
            vector_norm(F.col("__centv")).alias("__centn"),
        )
    # materialize the ≤ n_sub×n_codes-row codebook ONCE — downstream
    # consumers (encode, LUT, incremental re-encode) each broadcast it,
    # and without this the whole Lloyd training re-executes per
    # reference (see _materialize_small)
    return _materialize_small(cb)


def _subvectors(df, id_col, vec_col, dim, n_sub):
    """(id, sub_id, __v, __n) — one row per (vector, subspace).
    Subvector width is dim//n_sub by construction, so the norm is the
    fixed-width codegen form (bit-identical; see functions.dot_w)."""
    w = dim // n_sub
    subs = F.array(
        *[F.slice(F.col(vec_col), s * w + 1, w) for s in range(n_sub)]
    )
    return df.select(F.col(id_col), F.posexplode(subs).alias("sub_id", "__v")).select(
        id_col, "sub_id", "__v", vector_norm_w(F.col("__v"), w).alias("__n")
    )


def pq_encode(
    df: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_sub: int = 4,
) -> DataFrame:
    """Encode each vector as *n_sub* codebook indices: per subspace the
    nearest (round-6 cosine, ties → smallest code) codebook entry —
    the same argmax contract as :func:`_nearest_centroid`.  Output:
    (id_col, codes array<long>, ordered by sub_id).  One broadcast of
    the codebooks + one corpus pass; the only shuffle is the n_sub-row
    per-vector code collection (map-side combined).

    Optimization r15 note: an expression-only variant (codebook as
    literal arrays, argmax via ``array_max`` — zero joins/shuffles)
    was measured at sf0.1 and REJECTED: 14.1 s vs 5.8 s for the
    ann_pq_adc_topk gate — the higher-order-function per-candidate
    evaluation runs interpreted and the 64-literal-array expression
    tree ships a >1 MiB task binary per stage, while this join form
    keeps the pair loop inside whole-stage codegen."""
    subv = _subvectors(df, id_col, vec_col, dim, n_sub)
    scored = subv.join(F.broadcast(codebooks), "sub_id").select(
        id_col,
        "sub_id",
        F.struct(
            _pair_cos(
                F.col("__v"), F.col("__centv"), F.col("__n"), F.col("__centn"),
                w=dim // n_sub,
            ).alias("sim"),
            (-F.col("list_id")).alias("neg_list"),
        ).alias("__sl"),
    )
    best = scored.groupBy(id_col, "sub_id").agg(F.max("__sl").alias("__best"))
    return (
        best.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("sub_id", (-F.col("__best.neg_list")).alias("code"))
                    )
                ),
                lambda s: s.code,
            ).alias("codes")
        )
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_sub: int = 4,
    n_candidates: int = 32,
    k: int = 5,
) -> DataFrame:
    """Asymmetric-distance top-k: score every encoded corpus vector
    against each query through the PQ lookup table (one dot product
    per (query, subspace, code) — n_q × n_sub × n_codes entries, never
    per corpus row), shortlist the *n_candidates* best ADC scores, and
    exact-rerank only the shortlist to the final *k*.

    Determinism discipline: every LUT entry is ROUND(dot, 6); the ADC
    score is the FIXED-ORDER sum lut[0][c0] + lut[1][c1] + ... (an
    explicit n_sub-term expression, not an aggregate — float addition
    order is part of the cross-engine contract); both ranks break ties
    on neighbor id.  Output: (query_id, neighbor_id, cos, rk).

    The LUT is a MAP OF MAPS keyed by VALUE — sub_id → (list_id → d),
    built with ``map_from_entries`` — never a position-indexed array:
    :func:`pq_codebooks`' Lloyd re-estimation drops clusters that
    empty, so surviving list_ids need not be contiguous — positional
    indexing would silently read a shifted entry (or NULL) while the
    SQL oracle joins LUT entries on list_id by value.

    Scale: the corpus is touched twice — once through its CODES (n_sub
    longs per row, the 64×-compressed representation), once for the
    |queries| × n_candidates rerank rows fetched by broadcast
    semi-join.  Full vectors never shuffle; the LUT and query set ride
    one broadcast."""
    codes = pq_encode(corpus, codebooks, id_col, vec_col, dim, n_sub)
    return _pq_adc_from_codes(
        codes, corpus, queries, codebooks, id_col, vec_col, dim, n_sub,
        n_candidates, k,
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_sub: int = 4,
    k: int = 5,
    n_probe: int = 4,
    n_candidates: int = 32,
    stride: int = 29,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF×PQ composed index — the layout real 100 TB ANN serving uses
    (VERDICT r14 task 3): the coarse quantizer prunes WHICH inverted
    lists each query scans (:func:`ivf_assign` — ~n_probe/n_lists of
    the corpus), PQ asymmetric distance scores WHAT remains through
    the broadcast lookup table (codes are n_sub longs per row, the
    64×-compressed representation), and the exact cosine rerank runs
    only on the broadcast *n_candidates*-row shortlist.

    Composition contract: the ADC scan in :func:`_pq_adc_from_codes`
    is IDENTICAL to :func:`pq_adc_topk`'s (same round-6 LUT entries,
    same fixed-order n_sub-term sum, same tie rules) — restricted by
    an equi-join to the (query, probed-list) pairs the IVF probe
    selects exactly as :func:`ivf_cosine_topk` selects them (round-6
    cosine to the broadcast centroids, top-*n_probe* by sim desc /
    list id asc).  Both halves therefore replay in SQL: the oracle is
    the pq_adc oracle with three IVF CTEs splicing the probe
    restriction into the scored join.

    Scale: at 100 TB the assignment and code tables are computed once
    and stored; serving cost per query batch is one broadcast of
    (n_q × n_probe LUT rows + centroids), one equi-join over the
    probed slice of the code table, and one bounded rerank fetch —
    no full-corpus scan of either vectors or codes.

    Output: (query_id, neighbor_id, cos, rk)."""
    # stride centroids are referenced by BOTH the corpus assignment and
    # the probe selection; materialize once (see _materialize_small —
    # callers are builder-timed)
    cent = (
        centroids
        if centroids is not None
        else _materialize_small(_ivf_centroids(corpus, id_col, vec_col, stride, dim))
    )
    assign = ivf_assign(
        corpus, id_col, vec_col, stride, centroids=cent, dim=dim
    ).withColumnRenamed("list_id", "__ivf_list")
    codes = pq_encode(corpus, codebooks, id_col, vec_col, dim, n_sub).join(
        assign, id_col
    )
    probed = _ivf_probes(queries, cent, id_col, vec_col, n_probe, dim=dim)
    return _pq_adc_from_codes(
        codes, corpus, queries, codebooks, id_col, vec_col, dim, n_sub,
        n_candidates, k, probed=probed,
    )


def _ivf_probes(
    queries: DataFrame,
    cent: DataFrame,
    id_col: str,
    vec_col: str,
    n_probe: int,
    dim: int | None = None,
) -> DataFrame:
    """Each query's top-*n_probe* inverted lists by round-6 cosine to
    the broadcast centroids (ties → smallest list id — the
    ivf_cosine_topk probe rule).  Returns (query_id, __ivf_list)."""
    norm = (
        vector_norm_w(F.col(vec_col), dim)
        if dim is not None
        else vector_norm(F.col(vec_col))
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm.alias("__qn"),
    )
    probes = q.crossJoin(F.broadcast(cent)).select(
        "query_id",
        "list_id",
        _pair_cos(
            F.col("__qv"), F.col("__centv"), F.col("__qn"), F.col("__centn"),
            w=dim,
        ).alias("__sim"),
    )
    wp = W.partitionBy("query_id").orderBy(F.desc("__sim"), F.asc("list_id"))
    return (
        probes.withColumn("__rk", F.row_number().over(wp))
        .filter(F.col("__rk") <= n_probe)
        .select("query_id", F.col("list_id").alias("__ivf_list"))
    )


def ivf_pq_incremental_topk(
    new_df: DataFrame,
    corpus_df: DataFrame,
    codebooks: DataFrame,
    centroids: DataFrame,
    corpus_codes: DataFrame | None = None,
    corpus_assign: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_sub: int = 4,
    k: int = 5,
    n_probe: int = 4,
    n_candidates: int = 32,
) -> DataFrame:
    """Batch-arrival IVF×PQ — the FULL frozen-index serving loop
    (:func:`pq_incremental_topk` composed with the coarse quantizer):
    centroids and codebooks are trained ONCE on the standing corpus
    and frozen; the persisted index state is the code table
    (*corpus_codes*) plus the list assignment (*corpus_assign*);
    arrivals pay one bounded batch pass each for encode and
    assignment (both against broadcasts), then probe standing ∪ batch
    through the ADC lookup table restricted to their top-*n_probe*
    lists.  Pass None for either state table to compute it from
    *corpus_df* (a one-off run); the production loop persists both
    and appends the batch's rows after the top-k.

    Parity contract: output is IDENTICAL to the batch path
    ``ivf_pq_topk(corpus ∪ new, new, codebooks,
    centroids=centroids)`` — encode- and assign-on-arrival against
    frozen state are exactly the batch operations restricted to the
    new rows.  Output: (query_id, neighbor_id, cos, rk).

    Scale: this is the true 100 TB ANN ingest shape — per batch,
    O(|batch|) encode+assign, one equi-join over the probed slice of
    the persisted codes, one broadcast-shortlist rerank; the standing
    corpus is never re-encoded, re-assigned, or re-scanned in full."""
    new_vecs = new_df.select(F.col(id_col), F.col(vec_col))
    if corpus_codes is None:
        corpus_codes = pq_encode(corpus_df, codebooks, id_col, vec_col, dim, n_sub)
    if corpus_assign is None:
        corpus_assign = ivf_assign(
            corpus_df, id_col, vec_col, centroids=centroids, dim=dim
        )
    new_codes = pq_encode(new_vecs, codebooks, id_col, vec_col, dim, n_sub)
    new_assign = ivf_assign(new_vecs, id_col, vec_col, centroids=centroids, dim=dim)
    all_assign = corpus_assign.unionByName(new_assign).withColumnRenamed(
        "list_id", "__ivf_list"
    )
    all_codes = corpus_codes.unionByName(new_codes).join(all_assign, id_col)
    all_vecs = corpus_df.select(F.col(id_col), F.col(vec_col)).unionByName(
        new_vecs
    )
    probed = _ivf_probes(new_vecs, centroids, id_col, vec_col, n_probe, dim=dim)
    return _pq_adc_from_codes(
        all_codes, all_vecs, new_vecs, codebooks, id_col, vec_col, dim,
        n_sub, n_candidates, k, probed=probed,
    )


def _pq_adc_from_codes(
    codes: DataFrame,
    vectors: DataFrame,
    queries: DataFrame,
    codebooks: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_sub: int,
    n_candidates: int,
    k: int,
    probed: DataFrame | None = None,
) -> DataFrame:
    """ADC scan + exact rerank over a PRE-ENCODED code table — the
    shared back half of :func:`pq_adc_topk` (which encodes the corpus
    inline), :func:`pq_incremental_topk` (which probes a persisted
    code table, encoding only the arriving batch), and
    :func:`ivf_pq_topk` (which passes *probed*).  *vectors* supplies
    full embeddings for the shortlist rerank only.

    *probed* (optional): a (query_id, ``__ivf_list``) table of the
    inverted lists each query scans; *codes* must then carry an
    ``__ivf_list`` column.  The ADC scan becomes an equi-join on the
    list id — each query touches only its probed lists' codes instead
    of the whole code table (the IVF coarse prune); without it the
    scan is the broadcast cross join over all codes."""
    from functools import reduce as _reduce

    qsub = _subvectors(queries, id_col, vec_col, dim, n_sub).withColumnRenamed(
        id_col, "query_id"
    )
    lut_entries = qsub.join(F.broadcast(codebooks), "sub_id").select(
        "query_id",
        "sub_id",
        "list_id",
        # fixed-width codegen dot — bit-identical to the interpreted
        # zip_with/aggregate fold it replaces (functions.dot_w, r16)
        F.round(dot_w(F.col("__v"), F.col("__centv"), dim // n_sub), 6).alias("d"),
    )
    lut = (
        lut_entries.groupBy("query_id", "sub_id")
        .agg(
            F.map_from_entries(
                F.array_sort(F.collect_list(F.struct("list_id", "d")))
            ).alias("tbl")
        )
        .groupBy("query_id")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("sub_id", "tbl"))
            ).alias("lut")
        )
    )
    adc = F.round(
        _reduce(
            lambda a, b: a + b,
            [
                F.element_at(
                    F.element_at("lut", F.lit(s)),
                    F.element_at("codes", s + 1),
                )
                for s in range(n_sub)
            ],
        ),
        6,
    )
    if probed is None:
        scored = (
            codes.withColumnRenamed(id_col, "neighbor_id")
            .crossJoin(F.broadcast(lut))
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id", adc.alias("adc"))
        )
    else:
        # coarse prune: (query, probed list) × per-query LUT rides one
        # broadcast (n_q × n_probe rows); the code table is touched
        # through an equi-join on its stored list id, so each query
        # scores only ~n_probe/n_lists of the corpus codes.  The LUT
        # side of the plut build is broadcast too — both inputs are
        # query-set-bounded, so a sort-merge shuffle there would be
        # two needless exchanges of metadata-sized tables.
        plut = probed.join(F.broadcast(lut), "query_id")
        scored = (
            codes.withColumnRenamed(id_col, "neighbor_id")
            .join(F.broadcast(plut), "__ivf_list")
            .filter(F.col("neighbor_id") != F.col("query_id"))
            .select("query_id", "neighbor_id", adc.alias("adc"))
        )
    wa = W.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("neighbor_id"))
    shortlist = (
        scored.withColumn("__ark", F.row_number().over(wa))
        .filter(F.col("__ark") <= n_candidates)
        .select("query_id", "neighbor_id")
    )
    cvec = vectors.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        vector_norm_w(F.col(vec_col), dim).alias("__cn"),
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        vector_norm_w(F.col(vec_col), dim).alias("__qn"),
    )
    rerank = (
        shortlist.join(cvec, "neighbor_id")
        .join(F.broadcast(qvec), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            _pair_cos(
                F.col("__qv"), F.col("__cv"), F.col("__qn"), F.col("__cn"),
                w=dim,
            ).alias("cos"),
        )
    )
    wr = W.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        rerank.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", "cos", "rk")
    )


def pq_incremental_topk(
    new_df: DataFrame,
    corpus_df: DataFrame,
    codebooks: DataFrame,
    corpus_codes: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_sub: int = 4,
    n_candidates: int = 32,
    k: int = 5,
) -> DataFrame:
    """Batch-arrival PQ ANN — the ``minhash_incremental_pairs`` idiom
    applied to product quantization (VERDICT r12 task 6): new vectors
    are encoded against the FROZEN codebooks on arrival (one codebook
    broadcast + one bounded batch pass, never a retrain), appended to
    the persisted corpus code table, and each arrival probes the
    union — standing corpus and the batch's own earlier rows alike —
    through the ADC lookup table.

    The production loop this serves: keep :func:`pq_encode`'s code
    table as a persisted table beside the corpus; per ingest, pass it
    as *corpus_codes* (pass None to compute it from *corpus_df* for a
    one-off run), take the top-k, then append the batch's code rows to
    the state.  Codebooks are trained ONCE on the standing corpus and
    frozen — the standard IVF/PQ serving discipline — so arrival cost
    is O(|batch|) encode + one codes-only corpus scan, and the 64×
    compression story is preserved: full vectors are touched only for
    the broadcast-shortlist exact rerank.

    Parity contract (the gate's oracle proves it value-level): output
    is IDENTICAL to the batch path ``pq_adc_topk(corpus ∪ new, new,
    codebooks)`` — encode-on-arrival against frozen codebooks is
    exactly the batch encode restricted to the new rows, so nothing
    drifts.  Output: (query_id, neighbor_id, cos, rk)."""
    new_vecs = new_df.select(F.col(id_col), F.col(vec_col))
    if corpus_codes is None:
        corpus_codes = pq_encode(corpus_df, codebooks, id_col, vec_col, dim, n_sub)
    new_codes = pq_encode(new_vecs, codebooks, id_col, vec_col, dim, n_sub)
    all_codes = corpus_codes.unionByName(new_codes)
    all_vecs = corpus_df.select(F.col(id_col), F.col(vec_col)).unionByName(new_vecs)
    return _pq_adc_from_codes(
        all_codes, all_vecs, new_vecs, codebooks, id_col, vec_col, dim,
        n_sub, n_candidates, k,
    )
