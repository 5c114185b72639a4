"""Two-class NB quality classifier (operators/quality.py: nb_logodds),
pinned against an independent pure-Python reference."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from hive_scd_spark.operators.quality import nb_logodds


def _py_nb(pos_texts, neg_texts, score_docs, vocab_size, threshold=0.0):
    def toks(s):
        return [t for t in (s or "").strip().lower().split() if t != ""]

    counts = Counter(t for s in pos_texts + neg_texts for t in toks(s))
    vocab = {
        t
        for t, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:vocab_size]
    }

    def clip(ws):
        return [w if w in vocab else "<unk>" for w in ws]

    cp = Counter(w for s in pos_texts for w in clip(toks(s)))
    cn = Counter(w for s in neg_texts for w in clip(toks(s)))
    np_, nn = sum(cp.values()), sum(cn.values())
    V1 = vocab_size + 1

    def llr(w):
        return math.log((cp.get(w, 0) + 1) / (np_ + V1)) - math.log(
            (cn.get(w, 0) + 1) / (nn + V1)
        )

    out = {}
    for doc_id, s in score_docs:
        ws = clip(toks(s))
        if not ws:
            out[doc_id] = (0, None, False)
            continue
        sc = round(sum(llr(w) for w in ws) / len(ws), 6)
        out[doc_id] = (len(ws), sc, sc >= threshold)
    return out


POS = ["good clean prose flows nicely here", "clean words make good text", "prose text here"]
NEG = ["spam spam buy now click", "click buy spam junk now", "junk click spam"]
SCORE = [
    (1, "clean prose text"),
    (2, "buy spam click now"),
    (3, "good words mixed with junk spam"),
    (4, "completely novel tokens xyzzy"),
    (5, ""),
    (6, None),
]


@pytest.fixture(scope="module")
def result(spark):
    pos = spark.createDataFrame([(100 + i, s) for i, s in enumerate(POS)], "doc_id long, text string")
    neg = spark.createDataFrame([(200 + i, s) for i, s in enumerate(NEG)], "doc_id long, text string")
    score = spark.createDataFrame(SCORE, "doc_id long, text string")
    rows = nb_logodds(score, "doc_id", "text", pos=pos, neg=neg, vocab_size=12).collect()
    return {r["doc_id"]: (r["n_tokens"], r["nb_logodds"], r["kept"]) for r in rows}


def test_matches_python_reference(result):
    exp = _py_nb(POS, NEG, SCORE, vocab_size=12)
    assert set(result) == set(exp)
    for d, (n, sc, kept) in exp.items():
        gn, gsc, gkept = result[d]
        assert gn == n, d
        if sc is None:
            assert gsc is None and gkept is False, d
        else:
            assert gsc == pytest.approx(sc, abs=2e-6), d
            assert gkept == kept, d


def test_classifier_separates_classes(result):
    assert result[1][1] > 0 and result[1][2]        # trusted-looking kept
    assert result[2][1] < 0 and not result[2][2]    # spam-looking dropped


def test_empty_and_null_survive(result):
    for d in (5, 6):
        assert result[d] == (0, None, False)


def test_vocab_guard(spark):
    df = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    with pytest.raises(ValueError, match="vocab_size"):
        nb_logodds(df, "doc_id", "text", pos=df, neg=df, vocab_size=0)
