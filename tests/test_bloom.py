"""Bloom decontamination screen (operators/bloom.py).

Pins the three contracts the module header claims:
1. no false negatives — every doc that EXACTLY shares an n-gram with
   the benchmark is Bloom-flagged;
2. mergeability — build(A) OR build(B) renders the same bitmap as
   build(A union B);
3. engine-exact bit positions — Spark's md5 positions match an
   independent Python reference, gram by gram.
Plus the loud error paths (bad m_bits / k / bitmap length / nibble).
"""

from __future__ import annotations

import hashlib
import re

import pytest

from hive_scd_spark.operators.bloom import (
    bloom_build,
    bloom_merge,
    bloom_probe,
    bloom_to_hex,
)

M_BITS = 1 << 12  # small filter -> high fill -> false positives likely
K = 3
N = 3  # word trigrams keep fixture docs short

BENCH = [
    (0, "alpha beta gamma delta epsilon"),
    (1, "one two three four five six seven"),
    (2, "red green blue red green blue red"),  # repeated grams dedup row-local
]
CORPUS = [
    (10, "xx alpha beta gamma yy"),  # shares 'alpha beta gamma' -> must flag
    (11, "three four five and more words here"),  # shares -> must flag
    (12, "completely disjoint text with novel tokens"),  # may FP, never miss
    (13, "red green blue"),  # exactly one gram, shared -> must flag
    (14, "too short"),  # < n words: n_grams = 0, never flagged
    (15, ""),  # empty
]


def _py_words(s):
    return [w for w in re.split(r"[^0-9a-z_]+", s.lower()) if w]


def _py_grams(s, n=N):
    w = _py_words(s)
    return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}


def _py_positions(gram, m_bits=M_BITS, k=K):
    return [
        int(hashlib.md5(f"{j}:{gram}".encode()).hexdigest()[:15], 16) % m_bits
        for j in range(1, k + 1)
    ]


def _py_bitmap(texts, m_bits=M_BITS, k=K, n=N):
    bits = set()
    for s in texts:
        for g in _py_grams(s, n):
            bits.update(_py_positions(g, m_bits, k))
    nib = [0] * (m_bits // 4)
    for p in bits:
        nib[p // 4] |= 1 << (p % 4)
    return "".join(format(v, "x") for v in nib)


@pytest.fixture(scope="module")
def bench_df(spark):
    return spark.createDataFrame(BENCH, ["doc_id", "text"])


@pytest.fixture(scope="module")
def corpus_df(spark):
    return spark.createDataFrame(CORPUS, ["doc_id", "text"])


def test_bitmap_matches_python_reference(spark, bench_df):
    """Spark's distributed nibble build == the Python bit-set reference,
    nibble for nibble — the engine-exactness the oracle relies on."""
    hx = bloom_to_hex(
        bloom_build(bench_df, "text", n=N, m_bits=M_BITS, k=K), m_bits=M_BITS
    )
    assert hx == _py_bitmap([t for _, t in BENCH])


def test_no_false_negatives_and_counts(spark, bench_df, corpus_df):
    hx = bloom_to_hex(
        bloom_build(bench_df, "text", n=N, m_bits=M_BITS, k=K), m_bits=M_BITS
    )
    rows = {
        r["doc_id"]: (r["n_grams"], r["n_hit"])
        for r in bloom_probe(
            corpus_df, "doc_id", "text", hx, n=N, m_bits=M_BITS, k=K
        ).collect()
    }
    bench_grams = set().union(*(_py_grams(t) for _, t in BENCH))
    for doc_id, text in CORPUS:
        grams = _py_grams(text)
        n_grams, n_hit = rows[doc_id]
        assert n_grams == len(grams)
        exact = len(grams & bench_grams)
        # superset property: every exact hit is flagged...
        assert n_hit >= exact
        # ...and n_hit is exactly what the bitmap says (FPs deterministic)
        bitmap = _py_bitmap([t for _, t in BENCH])
        expect = sum(
            all(
                int(bitmap[p // 4], 16) & (1 << (p % 4))
                for p in _py_positions(g)
            )
            for g in grams
        )
        assert n_hit == expect
    assert rows[13][1] >= 1  # the single shared gram is caught
    assert rows[14] == (0, 0) and rows[15] == (0, 0)


def test_merge_equals_union_build(spark):
    a = spark.createDataFrame(BENCH[:1], ["doc_id", "text"])
    b = spark.createDataFrame(BENCH[1:], ["doc_id", "text"])
    merged = bloom_merge(
        bloom_build(a, "text", n=N, m_bits=M_BITS, k=K),
        bloom_build(b, "text", n=N, m_bits=M_BITS, k=K),
    )
    whole = bloom_build(
        spark.createDataFrame(BENCH, ["doc_id", "text"]),
        "text",
        n=N,
        m_bits=M_BITS,
        k=K,
    )
    assert bloom_to_hex(merged, m_bits=M_BITS) == bloom_to_hex(
        whole, m_bits=M_BITS
    )


def test_error_paths(spark, bench_df):
    with pytest.raises(ValueError, match="multiple of 4"):
        bloom_build(bench_df, "text", m_bits=10)
    with pytest.raises(ValueError, match="k must be"):
        bloom_build(bench_df, "text", k=0)
    with pytest.raises(ValueError, match="at least one sketch"):
        bloom_merge()
    with pytest.raises(ValueError, match="hex bitmap length"):
        bloom_probe(bench_df, "doc_id", "text", "ff", m_bits=M_BITS)
    # a sketch built at one m_bits rendered at another -> loud
    sk = bloom_build(bench_df, "text", n=N, m_bits=M_BITS, k=K)
    with pytest.raises(ValueError, match="conflicts with the sketch"):
        bloom_to_hex(sk, m_bits=16)


def test_params_travel_with_sketch_and_bitmap(spark, bench_df, corpus_df):
    """ADVICE r8 #1: (n, m_bits, k) are carried BY the sketch/bitmap —
    a probe needs no re-supplied parameters, and mismatched explicit
    ones fail loudly instead of silently voiding no-false-negatives."""
    sk = bloom_build(bench_df, "text", n=N, m_bits=M_BITS, k=K)
    assert sk.params == (N, M_BITS, K)
    bm = bloom_to_hex(sk)  # no m_bits argument needed anymore
    assert (bm.n, bm.m_bits, bm.k) == (N, M_BITS, K)
    assert bm == _py_bitmap([t for _, t in BENCH])  # still a str
    # parameterless probe == fully-parameterized probe
    a = bloom_probe(corpus_df, "doc_id", "text", bm)
    b = bloom_probe(corpus_df, "doc_id", "text", bm, n=N, m_bits=M_BITS, k=K)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # conflicting explicit parameters -> loud
    for bad in (dict(n=N + 1), dict(m_bits=M_BITS * 2), dict(k=K + 1)):
        with pytest.raises(ValueError, match="conflicts with the bitmap"):
            bloom_probe(corpus_df, "doc_id", "text", bm, **bad)
    # merging sketches with different shapes -> loud
    other = bloom_build(bench_df, "text", n=N, m_bits=M_BITS, k=K + 1)
    with pytest.raises(ValueError, match="mismatched sketch parameters"):
        bloom_merge(sk, other)


def test_bitmap_rides_broadcast_not_plan_literal(spark, bench_df, corpus_df):
    """ADVICE r8 #5 / VERDICT r8 task 7: the packed bitmap must NOT be
    embedded in the plan as an F.lit array (multi-MB plan payload once
    m grows) — it ships as a broadcast one-row dimension."""
    from hive_scd_spark.plans import physical_plan

    bm = bloom_to_hex(bloom_build(bench_df, "text", n=N, m_bits=M_BITS, k=K))
    out = bloom_probe(corpus_df, "doc_id", "text", bm)
    plan = physical_plan(out)
    assert "BroadcastExchange" in plan or "Broadcast" in plan
    # a literal array of m/64 bigints would render as [v1, v2, ...]
    # with m_bits/64 = 64 entries; the plan must stay bitmap-free.
    words = [0] * (M_BITS // 64)
    for i, ch in enumerate(bm):
        words[(4 * i) // 64] |= int(ch, 16) << ((4 * i) % 64)
    nonzero = next(w for w in words if w)
    signed = nonzero - (1 << 64) if nonzero >= (1 << 63) else nonzero
    assert str(signed) not in plan


def test_large_m_parity_vs_literal_semantics(spark, bench_df, corpus_df):
    """Broadcast path parity at a larger m (2^20): same counts as the
    Python reference — the representation change is invisible."""
    m = 1 << 20
    bm = bloom_to_hex(bloom_build(bench_df, "text", n=N, m_bits=m, k=K))
    rows = {
        r["doc_id"]: (r["n_grams"], r["n_hit"])
        for r in bloom_probe(corpus_df, "doc_id", "text", bm).collect()
    }
    bitmap = _py_bitmap([t for _, t in BENCH], m_bits=m)
    for doc_id, text in CORPUS:
        grams = _py_grams(text)
        expect = sum(
            all(
                int(bitmap[p // 4], 16) & (1 << (p % 4))
                for p in _py_positions(g, m_bits=m)
            )
            for g in grams
        )
        assert rows[doc_id] == (len(grams), expect)
