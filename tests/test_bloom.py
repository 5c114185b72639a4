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
    with pytest.raises(ValueError, match="nibble index out of range"):
        bloom_to_hex(sk, m_bits=16)
