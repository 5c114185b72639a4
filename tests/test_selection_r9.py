"""DSIR targeted data selection (operators/selection.py)."""

import math

import pytest

from hive_scd_spark.operators.selection import (
    dsir_gumbel_topk,
    dsir_importance_weights,
    hashed_ngram_features,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_features_unigrams_plus_bigrams(spark):
    df = _docs(spark, [(1, "a b c"), (2, "solo"), (3, ""), (4, None)])
    got = hashed_ngram_features(df, "doc_id", "text", n_buckets=64).collect()
    per_doc = {}
    for r in got:
        per_doc[r.doc_id] = per_doc.get(r.doc_id, 0) + 1
    # 3 unigrams + 2 bigrams; a single token has no bigram; empty/NULL
    # docs contribute no feature rows (re-attached downstream)
    assert per_doc == {1: 5, 2: 1}
    assert all(0 <= r.bucket < 64 for r in got)


def test_weights_prefer_target_like_docs(spark):
    target = _docs(spark, [(100 + i, "alpha beta gamma delta") for i in range(5)])
    raw = _docs(
        spark,
        [
            (1, "alpha beta gamma delta"),   # verbatim target-like
            (2, "alpha beta zzz qqq"),       # half target-like
            (3, "xxx yyy zzz qqq"),          # disjoint
        ],
    )
    out = {
        r.doc_id: r
        for r in dsir_importance_weights(
            raw, target, "doc_id", "text", n_buckets=256
        ).collect()
    }
    assert len(out) == 3  # every raw row survives
    assert out[1].dsir_logw > out[2].dsir_logw > out[3].dsir_logw
    assert out[1].dsir_logw > 0 and out[3].dsir_logw < 0
    assert out[1].n_feats == 7  # 4 unigrams + 3 bigrams


def test_weights_empty_and_null_docs_score_zero(spark):
    target = _docs(spark, [(9, "t u v")])
    raw = _docs(spark, [(1, ""), (2, None), (3, "t u")])
    out = {
        r.doc_id: r
        for r in dsir_importance_weights(raw, target, "doc_id", "text").collect()
    }
    assert (out[1].n_feats, out[1].dsir_logw) == (0, 0.0)
    assert (out[2].n_feats, out[2].dsir_logw) == (0, 0.0)
    assert out[3].n_feats == 3


def test_weights_layout_independent(spark):
    target = _docs(spark, [(100 + i, f"alpha beta tok{i}") for i in range(10)])
    raw = _docs(spark, [(i, f"alpha tok{i % 4} beta word{i}") for i in range(50)])
    a = {
        r.doc_id: (r.n_feats, r.dsir_logw)
        for r in dsir_importance_weights(raw, target, "doc_id", "text").collect()
    }
    b = {
        r.doc_id: (r.n_feats, r.dsir_logw)
        for r in dsir_importance_weights(
            raw.repartition(7), target.repartition(3), "doc_id", "text"
        ).collect()
    }
    assert a == b


def test_gumbel_topk_deterministic_and_bounded(spark):
    target = _docs(spark, [(900, "alpha beta")])
    raw = _docs(spark, [(i, f"alpha word{i}") for i in range(40)])
    w = dsir_importance_weights(raw, target, "doc_id", "text")
    sel = dsir_gumbel_topk(w, "doc_id", k=10).collect()
    assert len(sel) == 10
    keys = [r.gumbel_key for r in sel]
    assert keys == sorted(keys, reverse=True)
    assert all(math.isfinite(k) for k in keys)
    # pure function of (salt, id): rerun over a different layout agrees
    sel2 = dsir_gumbel_topk(w.repartition(5), "doc_id", k=10).collect()
    assert {r.doc_id for r in sel} == {r.doc_id for r in sel2}
    # k >= n returns everything
    assert len(dsir_gumbel_topk(w, "doc_id", k=100).collect()) == 40


def test_gumbel_topk_favors_heavy_weights(spark):
    # one document carries nearly all the softmax mass: it must be
    # selected at any k (its logw dwarfs the Gumbel noise spread)
    target = _docs(spark, [(900, "alpha beta gamma delta " * 5)])
    raw = _docs(
        spark,
        [(0, "alpha beta gamma delta " * 5)]
        + [(i, f"zz{i} yy{i}") for i in range(1, 30)],
    )
    w = dsir_importance_weights(raw, target, "doc_id", "text")
    sel = {r.doc_id for r in dsir_gumbel_topk(w, "doc_id", k=3).collect()}
    assert 0 in sel


def test_validation(spark):
    df = _docs(spark, [(1, "a")])
    with pytest.raises(ValueError, match="n_buckets"):
        hashed_ngram_features(df, "doc_id", "text", n_buckets=0)
    with pytest.raises(ValueError, match="k must be"):
        dsir_gumbel_topk(df.withColumn("dsir_logw", df.doc_id * 0.0), "doc_id", 0)
