"""Cross-implementation consistency pins: the public array-based
minhash signature vs the explode+groupBy pipeline, ngram strategies,
and IVF quality on clustered data."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def test_minhash_signature_api_matches_pipeline(spark):
    """functions.minhash_signature (array form, public API) must agree
    with the explode+groupBy signature inside minhash_near_dup_pairs —
    they share perms/hash constants by construction; pin it."""
    from hive_scd_spark.functions import (
        HASH_P,
        char_shingles,
        minhash_perms,
        minhash_signature,
    )

    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "jumps over the lazy dog")],
        "doc_id long, text string",
    )
    perms = minhash_perms(8, 42)
    api = {
        r.doc_id: list(r.sig)
        for r in docs.select(
            "doc_id", minhash_signature(char_shingles("text", 4), perms).alias("sig")
        ).collect()
    }
    hashed = docs.select(
        "doc_id", F.explode(char_shingles("text", 4)).alias("s")
    ).select(
        "doc_id",
        (F.conv(F.substring(F.md5("s"), 1, 8), 16, 10).cast("long") % HASH_P).alias("h"),
    )
    grouped = hashed.groupBy("doc_id").agg(
        *[
            F.min((F.lit(a) * F.col("h") + F.lit(b)) % HASH_P).alias(f"m{j}")
            for j, (a, b) in enumerate(perms)
        ]
    )
    pipeline = {
        r.doc_id: [r[f"m{j}"] for j in range(8)] for r in grouped.collect()
    }
    assert api == pipeline


def test_ngram_strategies_agree(spark):
    from hive_scd_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [
            (1, "aaaa bbbb cccc dddd"),
            (2, "aaaa bbbb cccc eeee"),
            (3, "completely different content here"),
            (4, "aaaa bbbb cccc dddd"),
        ],
        "doc_id long, text string",
    )
    for threshold in (0.3, 0.8):
        count = {
            (r.id_a, r.id_b, r.jaccard)
            for r in ngram_jaccard_pairs(
                docs, "doc_id", "text", threshold=threshold, strategy="count"
            ).collect()
        }
        prefix = {
            (r.id_a, r.id_b, r.jaccard)
            for r in ngram_jaccard_pairs(
                docs, "doc_id", "text", threshold=threshold, strategy="prefix"
            ).collect()
        }
        assert count == prefix, f"strategies diverge at threshold {threshold}"
    with pytest.raises(ValueError, match="unknown strategy"):
        ngram_jaccard_pairs(docs, "doc_id", "text", strategy="bogus")


def test_ivf_perfect_recall_on_clustered_vectors(spark):
    """On well-separated clusters, IVF with enough probes must equal
    exact kNN — the quality pin that the SQL oracle (which replicates
    the approximation) cannot provide."""
    from hive_scd_spark.operators.similarity import cosine_topk, ivf_cosine_topk

    rows = []
    for cluster in range(4):
        base = [0.0] * 8
        base[cluster * 2] = 1.0
        for i in range(6):
            v = list(base)
            v[cluster * 2 + 1] = 0.01 * (i + 1)  # tiny within-cluster spread
            rows.append((cluster * 10 + i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") % 10 == 0)
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(df, q, k=3).collect()}
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in ivf_cosine_topk(df, q, k=3, n_probe=4, stride=10).collect()
    }
    assert ivf == exact
