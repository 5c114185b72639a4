"""Soft deduplication weights (operators/sampling.py:
soft_dedup_weights): 1/cluster_size sampling pressure, clusters from
the same CC fixpoint as the hard-dedup lane."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_scd_spark.operators.sampling import soft_dedup_weights


def test_weights_follow_cluster_structure(spark):
    docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
    # clusters: {0,1,2} (chained), {5,6}; 3,4,7 unpaired
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (5, 6)], "id_a long, id_b long"
    )
    got = {r["doc_id"]: (r["cluster_size"], r["weight"])
           for r in soft_dedup_weights(docs, pairs, "doc_id").collect()}
    assert got[0] == got[1] == got[2] == (3, round(1 / 3, 6))
    assert got[5] == got[6] == (2, 0.5)
    for d in (3, 4, 7):
        assert got[d] == (1, 1.0)


def test_expected_one_copy_per_cluster(spark):
    """Sum of weights within a cluster ~ 1 (the soft-dedup invariant),
    and every input document survives."""
    docs = spark.createDataFrame([(i,) for i in range(30)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 10)]       # one 11-doc chain
        + [(20, 21), (21, 22), (20, 22)],         # one triangle
        "id_a long, id_b long",
    )
    out = soft_dedup_weights(docs, pairs, "doc_id")
    assert out.count() == 30
    per_cluster = (
        out.filter(F.col("cluster_size") > 1)
        .groupBy("cluster_size")
        .agg(F.sum("weight").alias("w"), F.count("*").alias("n"))
        .collect()
    )
    for r in per_cluster:
        n_clusters = r["n"] / r["cluster_size"]
        assert abs(r["w"] - n_clusters) < 1e-4
