"""Round-10 ADVICE fixes: NULL-url survival in url_canonical_dedup and
loud non-integral-id failure in split_by_cluster."""

import pytest


def test_url_canonical_dedup_null_urls_survive(spark):
    """NULL urls canonicalize to NULL; they must neither drop (the r9
    inner-join bug) nor group with each other — each survives as its
    own keeper with is_dup=0 and url_canon NULL."""
    from hive_scd_spark.operators.text import url_canonical_dedup

    rows = [
        (1, "https://a.com/x"),
        (2, "HTTPS://A.COM/x/"),
        (3, None),
        (4, None),
        (5, "https://a.com/y"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r.doc_id: r for r in url_canonical_dedup(df, "doc_id", "url").collect()}
    assert sorted(out) == [1, 2, 3, 4, 5]  # every input row labeled
    assert [out[i].keeper for i in (1, 2)] == [1, 1]
    assert out[2].is_dup == 1
    for i in (3, 4):
        assert out[i].url_canon is None
        assert out[i].keeper == i  # own keeper, not grouped with the other NULL
        assert out[i].is_dup == 0
    assert out[5].is_dup == 0
    assert "__ucd_key" not in url_canonical_dedup(df, "doc_id", "url").columns


def test_split_by_cluster_non_integral_ids_fail_loudly(spark):
    """String ids that cast-to-long as NULL would all share one NULL
    split key and land in a single split, voiding leak safety (ADVICE
    r9) — the operator must raise instead of silently degrading."""
    from hive_scd_spark.operators.sampling import split_by_cluster

    docs = spark.createDataFrame(
        [("doc-a",), ("doc-b",), ("doc-c",)], "doc_id string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    with pytest.raises(Exception, match="must be integral"):
        split_by_cluster(docs, pairs).collect()


def test_split_by_cluster_integral_string_ids_match_long_ids(spark):
    """Digit-string ids cast cleanly and must assign identically to the
    same ids carried as longs."""
    from hive_scd_spark.operators.sampling import split_by_cluster

    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    as_long = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    as_str = spark.createDataFrame(
        [(str(i),) for i in range(1, 8)], "doc_id string"
    )
    a = {int(r.doc_id): r.split for r in split_by_cluster(as_long, pairs).collect()}
    b = {int(r.doc_id): r.split for r in split_by_cluster(as_str, pairs).collect()}
    assert a == b
    assert a[1] == a[2]  # paired docs still share a split


def test_ngram_jaccard_hot_shingle_census(spark):
    """max_df opts into the hot-shingle census: a boilerplate shingle
    shared by every doc raises ShingleSkewError naming it; without the
    cap the operator still runs (opt-in, driver-action-free default)."""
    from hive_scd_spark.operators.dedup import (
        ShingleSkewError,
        ngram_jaccard_pairs,
    )

    boiler = "SHAREDBOILERPLATE "
    rows = [(i, boiler + f"unique body {i} " * 3) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    with pytest.raises(ShingleSkewError, match="max_df=5"):
        ngram_jaccard_pairs(df, "doc_id", "text", k=8, max_df=5).collect()
    # same data without the cap: runs (quadratic but tiny here)
    ngram_jaccard_pairs(df, "doc_id", "text", k=8).collect()


def test_ngram_jaccard_census_passes_clean_corpus(spark):
    """A corpus whose shingle dfs sit under the bound is unaffected by
    the census, and the df>=2 prefilter keeps output exact (planted
    near-dup found with the same jaccard value)."""
    from hive_scd_spark.operators.dedup import ngram_jaccard_pairs

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),
        (3, "completely different text with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    base = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, "doc_id", "text", k=8).collect()
    }
    censused = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, "doc_id", "text", k=8, max_df=10).collect()
    }
    assert base == censused
    assert (1, 2) in base and base[(1, 2)] > 0.3
    assert not any(3 in p for p in base)
