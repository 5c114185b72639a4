"""Round-3 operators: bin-bucketed range join, connected-components
dup clustering, BM25 retrieval, distributed rank + balanced shards,
streaming dedup."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hive_scd_spark.operators.cluster import dup_clusters
from hive_scd_spark.operators.range_join import range_join
from hive_scd_spark.operators.shard import balanced_shards, distributed_rank
from hive_scd_spark.operators.text_rank import bm25_topk


# -- range join --------------------------------------------------------------


@pytest.fixture()
def points(spark):
    return spark.createDataFrame(
        [(1, 5), (2, 10), (3, 19), (4, 20), (5, 100), (6, -3)],
        "pid long, p long",
    )


@pytest.fixture()
def intervals(spark):
    return spark.createDataFrame(
        [(10, 0, 20), (11, 10, 30), (12, 40, 41), (13, 7, 7)],  # 13 is empty
        "iid long, lo long, hi long",
    )


def test_range_join_half_open_semantics(spark, points, intervals):
    out = range_join(points, intervals, "p", "lo", "hi", bin_width=8)
    got = sorted((r.pid, r.iid) for r in out.collect())
    # p=5 → [0,20); p=10 → both [0,20) and [10,30) (lo inclusive);
    # p=19 → both; p=20 → only [10,30) (hi exclusive); 100/-3 → none;
    # empty interval 13 matches nothing
    assert got == [(1, 10), (2, 10), (2, 11), (3, 10), (3, 11), (4, 11)]


def test_range_join_matches_theta_join_on_random_data(spark):
    import random

    rnd = random.Random(7)
    pts = [(i, rnd.randrange(-50, 150)) for i in range(200)]
    ivs = []
    for j in range(40):
        lo = rnd.randrange(-60, 140)
        ivs.append((j, lo, lo + rnd.randrange(0, 45)))
    p = spark.createDataFrame(pts, "pid long, p long")
    iv = spark.createDataFrame(ivs, "iid long, lo long, hi long")
    for w in (1, 7, 64):
        got = sorted(
            (r.pid, r.iid)
            for r in range_join(p, iv, "p", "lo", "hi", bin_width=w).collect()
        )
        want = sorted(
            (pid, iid) for pid, pp in pts for iid, lo, hi in ivs if lo <= pp < hi
        )
        assert got == want, f"bin_width={w}"


def test_range_join_left_keeps_unmatched(spark, points, intervals):
    out = range_join(points, intervals, "p", "lo", "hi", bin_width=8, how="left")
    rows = {r.pid: r.iid for r in out.collect() if r.iid is None}
    assert set(rows) == {5, 6}  # unmatched points survive with NULLs


def test_range_join_plans_as_equi_join(spark, points, intervals):
    out = range_join(points, intervals, "p", "lo", "hi", bin_width=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoop" not in plan
    assert "Cartesian" not in plan


def test_range_join_validates_args(spark, points, intervals):
    with pytest.raises(ValueError, match="bin_width"):
        range_join(points, intervals, "p", "lo", "hi", bin_width=0)
    with pytest.raises(ValueError, match="how"):
        range_join(points, intervals, "p", "lo", "hi", bin_width=8, how="full")


# -- connected components ----------------------------------------------------


def _python_components(pairs):
    """Tiny reference union-find."""
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (7, 9), (4, 1)],
        [(i, i + 1) for i in range(1, 12)],  # single chain, diameter 11
        [(1, 2)],
        [(5, 5)],  # self-loop
        [(10, 20), (30, 40), (20, 30)],  # chain built out of order
    ],
)
def test_dup_clusters_match_union_find(spark, edges):
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.cluster for r in dup_clusters(pairs).collect()}
    assert got == _python_components(edges)


def test_dup_clusters_empty_input(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dup_clusters(pairs).collect() == []


def test_dup_clusters_random_graph(spark):
    import random

    rnd = random.Random(13)
    edges = [(rnd.randrange(60), rnd.randrange(60)) for _ in range(80)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r.node: r.cluster for r in dup_clusters(pairs).collect()}
    assert got == _python_components(edges)


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (7, 9), (4, 1)],
        [(i, i + 1) for i in range(1, 40)],  # 40-node chain: O(log n) rounds
        [(5, 5)],
        [(10, 20), (30, 40), (20, 30)],
    ],
)
def test_star_strategy_matches_union_find(spark, edges):
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.node: r.cluster
        for r in dup_clusters(pairs, strategy="star", max_iter=12).collect()
    }
    assert got == _python_components(edges)


def test_star_strategy_random_graph_agrees_with_propagate(spark):
    import random

    rnd = random.Random(29)
    edges = [(rnd.randrange(80), rnd.randrange(80)) for _ in range(100)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    star = {
        r.node: r.cluster for r in dup_clusters(pairs, strategy="star").collect()
    }
    prop = {r.node: r.cluster for r in dup_clusters(pairs).collect()}
    assert star == prop == _python_components(edges)


def test_star_strategy_empty(spark):
    pairs = spark.createDataFrame([], "id_a long, id_b long")
    assert dup_clusters(pairs, strategy="star").collect() == []


def test_dedup_corpus_keeps_canonical_and_unpaired(spark):
    from hive_scd_spark.operators.cluster import dedup_corpus

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    kept = sorted(
        r.doc_id for r in dedup_corpus(docs, pairs, "doc_id").collect()
    )
    # cluster {1,2,3} → keep 1; cluster {5,6} → keep 5; 4 and 7 unpaired
    assert kept == [1, 4, 5, 7]


# -- BM25 --------------------------------------------------------------------


def test_bm25_matches_reference_formula(spark):
    corpus = [
        (1, "spark join hash join"),
        (2, "vector search index"),
        (3, "the quick brown fox"),
        (4, "join vector join vector join"),
    ]
    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.score)
        for r in bm25_topk(df, "doc_id", "text", ["join", "vector"], k=10).collect()
    }

    # straight-line python replica
    toks = {i: t.split() for i, t in corpus}
    n = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {
        q: sum(1 for v in toks.values() if q in v) for q in ("join", "vector")
    }
    k1, b = 1.2, 0.75
    want = {}
    for i, v in toks.items():
        s = 0.0
        for q in ("join", "vector"):
            tf = v.count(q)
            if tf == 0:
                continue
            idf = math.log(1 + (n - dfreq[q] + 0.5) / (dfreq[q] + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(v) / avgdl))
        if s > 0:
            want[i] = (len(v), round(s, 6))
    assert got == want
    # doc 4 (both terms, repeated) must outrank the single-term docs
    assert max(want, key=lambda i: want[i][1]) == 4


def test_bm25_topk_plans_as_take_ordered(spark, sf_dir):
    """Global top-k must be TakeOrderedAndProject (k per partition →
    k at the driver), never a single-partition sort or window."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        bm25_topk(docs, "doc_id", "text", ["join", "vector"], k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_bm25_validates_args(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, "doc_id", "text", [], k=5)


# -- distributed rank + shards -----------------------------------------------


def test_distributed_rank_equals_global_window(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.length("text").alias("sz")
    )
    got = distributed_rank(docs, [F.desc("sz"), F.asc("doc_id")], "rk")
    want = docs.withColumn(
        "rk", F.row_number().over(W.orderBy(F.desc("sz"), F.asc("doc_id")))
    )
    assert {(r.doc_id, r.rk) for r in got.collect()} == {
        (r.doc_id, r.rk) for r in want.collect()
    }


def test_distributed_rank_has_no_single_partition_window(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.length("text").alias("sz")
    )
    plan = (
        distributed_rank(docs, [F.desc("sz"), F.asc("doc_id")], "rk")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the corpus-side rank window must be keyed by __pid (narrow after
    # the range repartition); the only SinglePartition exchange allowed
    # is the offsets side, whose input is the tiny per-partition counts
    assert "Window" in plan and "__pid" in plan
    corpus_window = plan.split("row_number()")[1]
    assert "__pid" in corpus_window[:300]


def test_balanced_shards_balance_and_determinism(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.size(F.split(F.trim("text"), r"\s+")).alias("n_tokens")
    )
    out = balanced_shards(docs, "doc_id", "n_tokens", 8)
    stats = (
        out.groupBy("shard")
        .agg(F.sum("n_tokens").alias("tok"), F.count("*").alias("n"))
        .collect()
    )
    assert len(stats) == 8
    toks = [r.tok for r in stats]
    assert (max(toks) - min(toks)) / max(toks) < 0.02  # ≤2% imbalance
    # deterministic across invocations (sampled range boundaries must
    # not leak into the output)
    a = sorted((r.doc_id, r.shard) for r in out.collect())
    b = sorted(
        (r.doc_id, r.shard)
        for r in balanced_shards(docs, "doc_id", "n_tokens", 8).collect()
    )
    assert a == b


def test_balanced_shards_validates_args(spark):
    df = spark.createDataFrame([(1, 5)], "id long, n long")
    with pytest.raises(ValueError):
        balanced_shards(df, "id", "n", 0)


# -- streaming dedup ---------------------------------------------------------


def test_dedup_stream_drops_duplicates_within_watermark(spark, tmp_path):
    from hive_scd_spark.streaming import dedup_stream

    src = tmp_path / "docs_src"
    src.mkdir()
    rows = [
        (1, "2024-01-01 00:01:00", "hello world"),
        (2, "2024-01-01 00:02:00", "Hello   WORLD"),  # dup after normalize
        (3, "2024-01-01 00:03:00", "something else"),
        (4, "2024-01-01 00:04:00", "hello world"),  # dup again
    ]
    batch = spark.createDataFrame(
        rows, "doc_id long, ts_s string, text string"
    ).select("doc_id", F.col("ts_s").cast("timestamp").alias("ts"), "text")
    batch.coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(
        str(src)
    )
    out = dedup_stream(stream, text_col="text", ts_col="ts", watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_out")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
        kept = sorted(
            r.doc_id for r in spark.sql("SELECT * FROM dedup_out").collect()
        )
    finally:
        q.stop()
    # one survivor per normalized content; ids 2 and 4 dropped
    assert len(kept) == 2
    assert 3 in kept and (1 in kept or 2 in kept or 4 in kept)
    assert not {1, 2, 4}.issubset(set(kept))
