"""Property tests for the round-13 operators: random inputs against
independent Python replays.

Invariants:
(a) anomaly_zscore ≡ a pure-Python leave-one-out rolling z-score at
    any partitioning, lookback, and sign mix (the floor(x·scale+0.5)
    integerization and the fixed moment expressions replayed exactly)
(b) gap_fill_locf buckets with FLOOR semantics for any-signed times —
    the full (grid, fill, is_observed) output replayed in Python
(c) source_overlap_matrix ≡ the naive per-source distinct-gram set
    intersection (counts AND Jaccard) on random small corpora
(d) pq_adc_topk is invariant under ARBITRARY relabeling of codebook
    list_ids (the LUT is value-keyed, never positional)
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hive_scd_spark.operators.asof import anomaly_zscore, gap_fill_locf
from hive_scd_spark.operators.decontam import source_overlap_matrix

COMMON = dict(
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


# -- (a) rolling z-score ------------------------------------------------------

val_st = st.floats(min_value=-500, max_value=500, allow_nan=False,
                   allow_infinity=False, width=32)


def _py_zscore(series, lookback, min_history, thr, scale):
    out = []
    vs = [math.floor(v * scale + 0.5) for v in series]
    for i, v in enumerate(vs):
        base = vs[max(0, i - lookback):i]
        n = len(base)
        if n >= min_history:
            mean = sum(base) / n
            var = sum(b * b for b in base) / n - mean * mean
            if var > 0:
                z = round((v - mean) / math.sqrt(var), 6)
                out.append((n, z, abs(z) > thr))
                continue
        out.append((n, None, False))
    return out


@settings(max_examples=10, **COMMON)
@given(
    series=st.lists(val_st, min_size=1, max_size=40),
    lookback=st.sampled_from([3, 5, 20]),
    min_history=st.sampled_from([2, 4]),
    parts=st.sampled_from([1, 4]),
)
def test_zscore_equals_python_replay(spark, series, lookback, min_history, parts):
    rows = [("k", i, i, float(v)) for i, v in enumerate(series)]
    df = spark.createDataFrame(
        rows, "k string, t long, oid long, v double"
    ).repartition(parts)
    out = anomaly_zscore(df, "k", "t", "v", "oid", lookback=lookback,
                         min_history=min_history, z_threshold=3.0)
    got = {r["t"]: (r["n_baseline"], r["z"], r["is_anomaly"])
           for r in out.collect()}
    exp = _py_zscore(series, lookback, min_history, 3.0, 1000)
    assert len(got) == len(series)
    for i, e in enumerate(exp):
        assert got[i] == e, (i, got[i], e)


# -- (b) LOCF grid with signed times -----------------------------------------


@settings(max_examples=10, **COMMON)
@given(
    events=st.lists(
        st.tuples(st.sampled_from(["a", "b"]),
                  st.integers(-100, 100),
                  st.integers(0, 9)),
        min_size=1, max_size=30, unique_by=lambda e: (e[0], e[1])),
    step=st.sampled_from([3, 7, 10]),
    start=st.integers(-50, 0),
    width=st.integers(1, 60),
)
def test_gap_fill_locf_equals_python_replay(spark, events, step, start, width):
    end = start + width
    df = spark.createDataFrame(
        [(k, t, float(v)) for k, t, v in events],
        "k string, t long, v double",
    )
    out = gap_fill_locf(df, "k", "t", "v", step=step, start=start, end=end)
    got = {(r["k"], r["bucket"]): (r["filled_value"], r["is_observed"])
           for r in out.collect()}
    # Python replay: floor buckets, last-(t,v)-struct per bucket, LOCF
    lo, hi = start // step, (end - 1) // step
    keys = {k for k, _, _ in events}
    obs: dict = {}
    for k, t, v in events:
        if start <= t < end:
            b = t // step  # Python floor
            cur = obs.get((k, b))
            if cur is None or (t, v) > cur:
                obs[(k, b)] = (t, float(v))
    exp = {}
    for k in keys:
        carry = None
        for b in range(lo, hi + 1):
            o = obs.get((k, b))
            if o is not None:
                carry = o[1]
                exp[(k, b)] = (carry, True)
            else:
                exp[(k, b)] = (carry, False)
    assert got == exp


# -- (c) source overlap matrix ------------------------------------------------

word_st = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps", "zeta"])


def _grams(text, n):
    ws = [w for w in text.lower().split() if w]
    return {" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)}


@settings(max_examples=10, **COMMON)
@given(
    docs=st.lists(
        st.tuples(st.sampled_from(["s1", "s2", "s3"]),
                  st.lists(word_st, min_size=0, max_size=8).map(" ".join)),
        min_size=1, max_size=15),
    n=st.sampled_from([2, 3]),
)
def test_overlap_matrix_equals_python_replay(spark, docs, n):
    df = spark.createDataFrame(docs, "source string, text string")
    got = {(r["source_a"], r["source_b"]):
           (r["n_shared"], r["n_a"], r["n_b"], r["jaccard"])
           for r in source_overlap_matrix(df, "source", "text", n=n).collect()}
    per_src: dict = {}
    for s, t in docs:
        per_src.setdefault(s, set()).update(_grams(t, n))
    exp = {}
    srcs = sorted(per_src)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1:]:
            sh = len(per_src[a] & per_src[b])
            if sh:
                na, nb = len(per_src[a]), len(per_src[b])
                exp[(a, b)] = (sh, na, nb, round(sh / (na + nb - sh), 6))
    assert got == exp


# -- (d) PQ list_id relabel invariance ----------------------------------------


@settings(max_examples=6, **COMMON)
@given(
    labels=st.lists(st.integers(0, 60), min_size=3, max_size=3, unique=True),
    seed=st.integers(0, 5),
)
def test_pq_adc_invariant_under_list_id_relabel(spark, labels, seed):
    from pyspark.sql import types as T

    from hive_scd_spark.operators.similarity import pq_adc_topk

    DIM, N_SUB = 8, 2
    cents = [
        [1.0, 0.0, 0.5, 0.0],
        [0.0, 1.0, 0.0, 0.5],
        [-1.0, 0.5, 0.0, 1.0],
    ]
    schema = T.StructType([
        T.StructField("sub_id", T.IntegerType(), False),
        T.StructField("list_id", T.LongType(), False),
        T.StructField("__centv", T.ArrayType(T.DoubleType()), False),
        T.StructField("__centn", T.DoubleType(), False),
    ])

    def cb(ids):
        rows = [
            (s, int(l), c, math.sqrt(sum(x * x for x in c)))
            for s in range(N_SUB)
            for l, c in zip(ids, cents)
        ]
        return spark.createDataFrame(rows, schema)

    corpus = spark.createDataFrame(
        [(i, [float((i * 7 + j * 3 + seed) % 5 - 2) for j in range(DIM)])
         for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    queries = corpus.filter("vec_id < 2")
    base = pq_adc_topk(corpus, queries, cb([0, 1, 2]),
                       dim=DIM, n_sub=N_SUB, n_candidates=5, k=3)
    # labels must preserve the ORDER (smallest-id tie-break is part of
    # the encode contract), so sort them before assigning to centroids
    relab = pq_adc_topk(corpus, queries, cb(sorted(labels)),
                        dim=DIM, n_sub=N_SUB, n_candidates=5, k=3)
    key = lambda r: (r["query_id"], r["rk"])
    assert sorted(map(tuple, base.collect()), key=lambda t: (t[0], t[3])) == \
           sorted(map(tuple, relab.collect()), key=lambda t: (t[0], t[3]))
