"""Interpolated Kneser-Ney trigram LM (operators/quality.py:
kn_trigram_logprob), pinned against an independent pure-Python
reference implementation of the same published formula."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from hive_scd_spark.operators.quality import kn_trigram_logprob

D = 0.75


def _py_kn(train_texts, score_docs, vocab_size):
    """Independent reference: same clipped vocab + interpolated KN."""

    def toks(s):
        return [t for t in s.strip().lower().split() if t != ""]

    counts = Counter(t for s in train_texts for t in toks(s))
    vocab = {t for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]}

    def clip(ws):
        return [w if w in vocab else "<unk>" for w in ws]

    tri = Counter()
    for s in train_texts:
        ws = clip(toks(s))
        for i in range(2, len(ws)):
            tri[(ws[i - 2], ws[i - 1], ws[i])] += 1
    c2ctx, n3, cc2 = Counter(), Counter(), Counter()
    for (w1, w2, w3), c in tri.items():
        c2ctx[(w1, w2)] += c
        n3[(w1, w2)] += 1
        cc2[(w2, w3)] += 1
    ctx2, n2, cc1 = Counter(), Counter(), Counter()
    for (w2, w3), c in cc2.items():
        ctx2[w2] += c
        n2[w2] += 1
        cc1[w3] += 1
    T = sum(cc1.values())
    U = len(cc1)

    def p1(w3):
        return max(cc1.get(w3, 0) - D, 0.0) / T + D * U / T / (vocab_size + 1)

    def p2(w2, w3):
        if w2 not in ctx2:
            return p1(w3)
        return max(cc2.get((w2, w3), 0) - D, 0.0) / ctx2[w2] + D * n2[w2] / ctx2[w2] * p1(w3)

    def p3(w1, w2, w3):
        if (w1, w2) not in c2ctx:
            return p2(w2, w3)
        return (
            max(tri.get((w1, w2, w3), 0) - D, 0.0) / c2ctx[(w1, w2)]
            + D * n3[(w1, w2)] / c2ctx[(w1, w2)] * p2(w2, w3)
        )

    out = {}
    for doc_id, s in score_docs:
        ws = clip(toks(s or ""))
        if len(ws) < 3:
            out[doc_id] = (0, 0, None)
            continue
        lps, unseen = [], 0
        for i in range(2, len(ws)):
            g = (ws[i - 2], ws[i - 1], ws[i])
            if g not in tri:
                unseen += 1
            lps.append(math.log(p3(*g)))
        out[doc_id] = (len(lps), unseen, round(sum(lps) / len(lps), 6))
    return out


TRAIN = [
    "the cat sat on the mat",
    "the dog sat on the log",
    "the cat ran to the dog",
    "a bird flew over the mat",
]
SCORE = [
    (1, "the cat sat on the log"),      # mostly seen trigrams
    (2, "the dog ran to the mat"),      # some unseen -> trigram backoff
    (3, "zebra quantum flux capacitor plasma"),  # all-<unk>-ish word salad
    (4, "on on on on"),                 # repeated rare context
    (5, "hi there"),                    # < 3 tokens
    (6, ""),                            # empty
    (7, None),                          # null text
]


@pytest.fixture(scope="module")
def result(spark):
    train = spark.createDataFrame([(i, s) for i, s in enumerate(TRAIN)], "doc_id long, text string")
    score = spark.createDataFrame(SCORE, "doc_id long, text string")
    rows = kn_trigram_logprob(score, "doc_id", "text", vocab_size=8, train=train).collect()
    return {r["doc_id"]: (r["n_trigrams"], r["n_unseen"], r["avg_kn_logprob"]) for r in rows}


def test_matches_python_reference(result):
    expected = _py_kn(TRAIN, SCORE, vocab_size=8)
    assert set(result) == set(expected)
    for doc_id, (n, u, lp) in expected.items():
        gn, gu, glp = result[doc_id]
        assert (gn, gu) == (n, u), doc_id
        if lp is None:
            assert glp is None, doc_id
        else:
            assert glp == pytest.approx(lp, abs=2e-6), doc_id


def test_short_docs_survive_with_null_score(result):
    for doc_id in (5, 6, 7):
        assert result[doc_id] == (0, 0, None)


def test_word_salad_scores_below_fluent(result):
    assert result[3][2] < result[1][2]


def test_unseen_counts_backoff_events(result):
    assert result[1][1] < result[2][1] <= result[2][0]
    assert result[3][1] == result[3][0]  # salad: every trigram unseen


def test_self_scoring_has_no_unseen(spark):
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(TRAIN)], "doc_id long, text string"
    )
    rows = kn_trigram_logprob(df, "doc_id", "text", vocab_size=8).collect()
    assert all(r["n_unseen"] == 0 for r in rows)
    assert all(r["n_trigrams"] > 0 for r in rows)


def test_parameter_guards(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="vocab_size"):
        kn_trigram_logprob(df, "doc_id", "text", vocab_size=0)
    with pytest.raises(ValueError, match="discount"):
        kn_trigram_logprob(df, "doc_id", "text", discount=1.5)
