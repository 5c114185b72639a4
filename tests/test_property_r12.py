"""Property tests for the round-12 session-2 operators: random inputs
against independent Python replays.

Invariants:
(a) heavy_hitters ≡ exact counting at any partitioning/capacity ≥ k
(b) paragraph_spans offsets slice back to spans VERBATIM on arbitrary
    unicode text, and scrub-nothing rebuilds the exact document
(c) interval_overlap_join ≡ the naive quadratic join at random bin
    widths (the exactly-one-bin rule under hypothesis, not a fixture)
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from hive_scd_spark.operators.profile import heavy_hitters
from hive_scd_spark.operators.range_join import interval_overlap_join
from hive_scd_spark.operators.text import paragraph_spans, scrub_spans

COMMON = dict(
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# Zipf-ish key stream: a few hot keys + a long tail
key_st = st.one_of(
    st.sampled_from(["hot1", "hot2", "hot3"]),
    st.integers(0, 500).map(lambda i: f"t{i}"),
)


@settings(max_examples=10, **COMMON)
@given(
    keys=st.lists(key_st, min_size=1, max_size=400),
    k=st.sampled_from([2, 4, 8, 16]),
    capacity=st.sampled_from([16, 32]),
    parts=st.sampled_from([1, 3, 7]),
)
def test_heavy_hitters_equals_exact(spark, keys, k, capacity, parts):
    df = spark.createDataFrame([(x,) for x in keys], "key string").repartition(parts)
    got = {(r["key"], r["cnt"]) for r in heavy_hitters(df, "key", k=k, capacity=capacity).collect()}
    exact = Counter(keys)
    n = len(keys)
    expect = {(x, c) for x, c in exact.items() if c * k >= n}
    assert got == expect


# text with unicode, the separator embedded at edges, and empty spans
text_st = st.text(
    alphabet=st.sampled_from(list("abβ漢 xyz@.19!\t") + ["\n"]),
    max_size=80,
)


@settings(max_examples=10, **COMMON)
@given(texts=st.lists(text_st | st.none(), min_size=1, max_size=12))
def test_span_offsets_and_identity_rebuild(spark, texts):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    spans = paragraph_spans(docs, "doc_id", "text")
    by_doc = {}
    for r in spans.collect():
        t = texts[r["doc_id"]] or ""
        assert t[r["span_start"] : r["span_start"] + r["span_len"]] == r["span"]
        by_doc.setdefault(r["doc_id"], []).append(r)
    # scrub with NOTHING flagged must rebuild every document verbatim
    empty_attrs = spark.createDataFrame(
        [], "doc_id long, span_idx long, attr string, score double"
    )
    rebuilt = {
        r["doc_id"]: r["scrubbed_text"]
        for r in scrub_spans(
            docs, spans, empty_attrs, "doc_id", "text", drop_attrs=("x",)
        ).collect()
    }
    for i, t in enumerate(texts):
        assert rebuilt[i] == (t or "")


iv_st = st.tuples(st.integers(0, 300), st.integers(0, 60)).map(
    lambda p: (p[0], p[0] + p[1])  # may be empty (len 0)
)


@settings(max_examples=10, **COMMON)
@given(
    ls=st.lists(iv_st, min_size=1, max_size=40),
    rs=st.lists(iv_st, min_size=1, max_size=40),
    bin_width=st.sampled_from([1, 3, 17, 64, 1000]),
)
def test_interval_overlap_equals_naive(spark, ls, rs, bin_width):
    left = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(ls)],
        "a_id long, a_start long, a_end long",
    )
    right = spark.createDataFrame(
        [(i, s, e) for i, (s, e) in enumerate(rs)],
        "b_id long, b_start long, b_end long",
    )
    got = [
        (r["a_id"], r["b_id"])
        for r in interval_overlap_join(
            left, right, "a_start", "a_end", "b_start", "b_end", bin_width
        ).collect()
    ]
    # half-open semantics: an EMPTY interval (start == end) overlaps
    # nothing, even where the bare s1<e2 AND s2<e1 predicate holds
    # ((0,2) vs (1,1): the intersection [1,1) is empty) — hypothesis
    # found exactly this case; the operator's empty-interval exclusion
    # is the correct contract and the reference must share it
    expect = {
        (i, j)
        for i, (s1, e1) in enumerate(ls)
        for j, (s2, e2) in enumerate(rs)
        if s1 < e1 and s2 < e2 and s1 < e2 and s2 < e1
    }
    assert len(got) == len(set(got))
    assert set(got) == expect
