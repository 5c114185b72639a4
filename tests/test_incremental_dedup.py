"""Incremental MinHash: batch-vs-corpus pairs must equal the
full-corpus pair set restricted to pairs touching the batch, and the
persisted band-table path must agree with the recompute path."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_scd_spark.operators.dedup import (
    minhash_band_table,
    minhash_incremental_pairs,
    minhash_near_dup_pairs,
)


def _pairs(df):
    return {(r.id_a, r.id_b, r.jaccard) for r in df.collect()}


def test_incremental_equals_restricted_full(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 5 == 3)
    corpus = docs.filter(F.col("doc_id") % 5 != 3)

    full = minhash_near_dup_pairs(docs, "doc_id", "text", k=8, threshold=0.3)
    want = {
        p for p in _pairs(full) if p[0] % 5 == 3 or p[1] % 5 == 3
    }
    got = _pairs(
        minhash_incremental_pairs(new, corpus, "doc_id", "text", k=8, threshold=0.3)
    )
    assert got == want
    assert got  # non-vacuous: the planted dups straddle the split


def test_incremental_with_persisted_band_table(spark, sf_dir, tmp_path):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 5 == 3)
    corpus = docs.filter(F.col("doc_id") % 5 != 3)

    state = str(tmp_path / "bands")
    minhash_band_table(corpus, "doc_id", "text", k=8).write.parquet(state)
    persisted = spark.read.parquet(state)

    recompute = _pairs(
        minhash_incremental_pairs(new, corpus, "doc_id", "text", k=8, threshold=0.3)
    )
    from_state = _pairs(
        minhash_incremental_pairs(
            new, corpus, "doc_id", "text",
            corpus_bands=persisted, k=8, threshold=0.3,
        )
    )
    assert from_state == recompute


def test_incremental_broadcast_contract_in_plan(spark, sf_dir):
    """broadcast_new=True must not shuffle the corpus band side for the
    cross join; broadcast_new=False plans a plain join."""
    from hive_scd_spark.plans import physical_plan

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    new = docs.filter(F.col("doc_id") % 5 == 3)
    corpus = docs.filter(F.col("doc_id") % 5 != 3)
    df = minhash_incremental_pairs(new, corpus, "doc_id", "text", k=8)
    assert "BroadcastHashJoin" in physical_plan(df)


def test_streaming_ingest_matches_batch(spark, tmp_path):
    """Two micro-batches through minhash_ingest_sink must discover
    exactly the pairs batch MinHash finds on the union corpus: batch-1
    internal pairs in epoch 1, then batch-2-vs-state and batch-2
    internal pairs in epoch 2."""
    from hive_scd_spark.streaming import minhash_ingest_sink

    base = "the quick brown fox jumps over the lazy dog near the river bank today"
    rows1 = [
        (1, base),
        (2, base + " again"),          # near-dup of 1
        (3, "completely different content about spark physical plans"),
    ]
    rows2 = [
        (4, base + " AGAIN and again"),  # near-dup of 1/2 ACROSS batches
        (5, "completely different content about spark physical plans!"),  # near-dup of 3
        (6, "nothing shares shingles with this one at all, truly unique"),
    ]
    schema = "doc_id long, text string"
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    stream = spark.readStream.schema("doc_id long, text string").parquet(str(src))
    sink = minhash_ingest_sink(
        stream,
        state_path=str(tmp_path / "state"),
        pairs_path=str(tmp_path / "pairs"),
        checkpoint=str(tmp_path / "ckpt"),
        threshold=0.3,
    )
    q = sink.start()
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    all_docs = spark.createDataFrame(rows1 + rows2, schema)
    want = _pairs(
        minhash_near_dup_pairs(all_docs, "doc_id", "text", k=8, threshold=0.3)
    )
    assert got == want
    # the scenario must exercise cross-batch detection, not just replays
    assert any(a <= 3 < b for a, b, _ in got)


def test_substring_pairs_match_bruteforce_reference(spark):
    """Property: substring_dup_pairs over random tiny corpora equals a
    row-by-row Python replay of the definition (star edges per
    in-band-df gram, n_shared = linking-gram count)."""
    import itertools
    import random
    import re

    rng = random.Random(20260814)
    words = ["aa", "bb", "cc", "dd", "ee"]
    for trial in range(6):
        n = rng.choice([2, 3])
        max_df = rng.choice([2, 3, 50])
        docs = [
            (i, " ".join(rng.choice(words) for _ in range(rng.randint(0, 8))))
            for i in range(rng.randint(4, 10))
        ]
        # Python reference
        grams: dict[tuple, set] = {}
        for i, text in docs:
            toks = [w for w in re.split(r"[^0-9a-z_]+", text.lower()) if w]
            seen = set()
            for j in range(len(toks) - n + 1):
                seen.add(tuple(toks[j : j + n]))
            for g in seen:
                grams.setdefault(g, set()).add(i)
        want: dict[tuple, int] = {}
        for g, members in grams.items():
            if not (2 <= len(members) <= max_df):
                continue
            rep = min(members)
            for m in members:
                if m != rep:
                    want[(rep, m)] = want.get((rep, m), 0) + 1

        from hive_scd_spark.operators.dedup import substring_dup_pairs

        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            (r.id_a, r.id_b): r.n_shared
            for r in substring_dup_pairs(
                df, "doc_id", "text", n=n, max_df=max_df
            ).collect()
        }
        assert got == want, (trial, n, max_df, docs)


def test_pagerank_star_center_wins_and_is_deterministic(spark):
    from hive_scd_spark.operators.cluster import pagerank

    # star: 0-1, 0-2, 0-3, 0-4 plus an isolated pair 5-6
    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4), (5, 6)], "id_a long, id_b long"
    )
    r = {x.node: x.rank_scaled for x in pagerank(edges, iters=5).collect()}
    assert set(r) == {0, 1, 2, 3, 4, 5, 6}
    # the hub out-ranks every leaf; leaves are symmetric → equal ranks
    assert all(r[0] > r[i] for i in (1, 2, 3, 4))
    assert len({r[i] for i in (1, 2, 3, 4)}) == 1
    # the isolated symmetric pair: equal ranks, below the hub
    assert r[5] == r[6] < r[0]
    # integer arithmetic → bit-identical on re-run
    r2 = {x.node: x.rank_scaled for x in pagerank(edges, iters=5).collect()}
    assert r == r2


def test_pagerank_directed_sink_leaks_documented_mass(spark):
    from hive_scd_spark.operators.cluster import pagerank

    # chain 0 -> 1 -> 2 (2 is a sink): ranks still orderable, sink
    # highest (receives all flow), source lowest
    edges = spark.createDataFrame([(0, 1), (1, 2)], "id_a long, id_b long")
    r = {x.node: x.rank_scaled for x in pagerank(edges, directed=True, iters=5).collect()}
    assert r[2] > r[1] > r[0]


def test_streaming_state_equals_batch_rebuilt_state(spark, sf_dir, tmp_path):
    """VERDICT r6 task 7: N micro-batches through minhash_ingest_sink
    must leave PERSISTED STATE identical to a one-shot batch rebuild —
    band table ≡ minhash_band_table(all docs), texts ≡ the corpus —
    and a pair log identical to the full-corpus batch replay.  Run on
    the real documents table (planted near-dups), three micro-batches
    via maxFilesPerTrigger=1."""
    from hive_scd_spark.streaming import minhash_ingest_sink

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    src = tmp_path / "src"
    src.mkdir()
    for part in range(3):
        docs.filter(F.col("doc_id") % 3 == part).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    sink = minhash_ingest_sink(
        stream,
        state_path=str(tmp_path / "state"),
        pairs_path=str(tmp_path / "pairs"),
        checkpoint=str(tmp_path / "ckpt"),
        threshold=0.3,
    )
    q = sink.start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    n_batches = len(q.recentProgress)
    assert n_batches >= 3, f"expected >=3 micro-batches, got {n_batches}"

    # (a) band-table state ≡ batch rebuild over the union corpus
    state_bands = {
        (r["__id"], r["__band"], r["__key"])
        for r in spark.read.parquet(str(tmp_path / "state" / "bands")).collect()
    }
    rebuilt = {
        (r["__id"], r["__band"], r["__key"])
        for r in minhash_band_table(docs, "doc_id", "text", k=8).collect()
    }
    assert state_bands == rebuilt
    # (b) text state ≡ the corpus
    state_texts = {
        (r.doc_id, r.text)
        for r in spark.read.parquet(str(tmp_path / "state" / "texts")).collect()
    }
    assert state_texts == {(r.doc_id, r.text) for r in docs.collect()}
    # (c) pair log ≡ full-corpus batch replay (order-insensitive pairs)
    def norm(s):
        return {(min(a, b), max(a, b), round(j, 9)) for a, b, j in s}

    got = norm(_pairs(spark.read.parquet(str(tmp_path / "pairs"))))
    want = norm(
        _pairs(minhash_near_dup_pairs(docs, "doc_id", "text", k=8, threshold=0.3))
    )
    assert got == want and got


# --- embedding-family incremental ingest (r7) -------------------------


def _cpairs(df):
    return {(r.id_a, r.id_b, r.cos) for r in df.collect()}


def test_embedding_incremental_equals_restricted_full(spark, sf_dir):
    """Incremental new×corpus ∪ new×new pairs ≡ the full-corpus LSH
    pair set restricted to pairs touching the batch — the md5-seeded
    planes guarantee both runs bucket identically."""
    from hive_scd_spark.operators.dedup import (
        embedding_incremental_pairs,
        embedding_near_dup_pairs,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    new = emb.filter(F.col("vec_id") % 5 == 3)
    corpus = emb.filter(F.col("vec_id") % 5 != 3)

    full = embedding_near_dup_pairs(
        emb, "vec_id", "embedding",
        threshold=0.35, use_lsh=True, n_planes=4, n_bands=4, dim=64,
    )
    want = {p for p in _cpairs(full) if p[0] % 5 == 3 or p[1] % 5 == 3}
    got = _cpairs(
        embedding_incremental_pairs(
            new, corpus, "vec_id", "embedding",
            threshold=0.35, n_planes=4, n_bands=4, dim=64,
        )
    )
    assert got == want
    assert got  # non-vacuous: near-dup vectors straddle the split


def test_embedding_incremental_with_persisted_buckets(spark, sf_dir, tmp_path):
    """The persisted bucket-state path must agree with the recompute
    path — the session-portability claim (no plane matrix to store)."""
    from hive_scd_spark.operators.dedup import embedding_incremental_pairs
    from hive_scd_spark.operators.similarity import lsh_band_buckets

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    new = emb.filter(F.col("vec_id") % 5 == 3)
    corpus = emb.filter(F.col("vec_id") % 5 != 3)

    state = str(tmp_path / "buckets")
    lsh_band_buckets(corpus, "vec_id", "embedding", 4, 4, 64).write.parquet(state)
    persisted = spark.read.parquet(state)

    recompute = _cpairs(
        embedding_incremental_pairs(
            new, corpus, "vec_id", "embedding",
            threshold=0.35, n_planes=4, n_bands=4, dim=64,
        )
    )
    from_state = _cpairs(
        embedding_incremental_pairs(
            new, corpus, "vec_id", "embedding",
            corpus_buckets=persisted,
            threshold=0.35, n_planes=4, n_bands=4, dim=64,
        )
    )
    assert from_state == recompute


def test_embedding_incremental_broadcast_contract_in_plan(spark, sf_dir):
    from hive_scd_spark.operators.dedup import embedding_incremental_pairs
    from hive_scd_spark.plans import physical_plan

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    new = emb.filter(F.col("vec_id") % 5 == 3)
    corpus = emb.filter(F.col("vec_id") % 5 != 3)
    df = embedding_incremental_pairs(
        new, corpus, "vec_id", "embedding", n_planes=4, n_bands=4, dim=64
    )
    assert "BroadcastHashJoin" in physical_plan(df)


def test_embedding_incremental_new_buckets_are_cut_once(spark, sf_dir):
    """ADVICE r8 #3: the internally-computed new-batch bucket frame is
    lazily checkpointed, so the three downstream references (cross
    probe + both within-join sides) share ONE evaluation of the
    hyperplane pipeline instead of re-running it per reference."""
    from hive_scd_spark.operators.dedup import _computed_new_buckets
    from hive_scd_spark.plans import physical_plan

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    new = emb.filter(F.col("vec_id") % 5 == 3)
    nb = _computed_new_buckets(new, "vec_id", "embedding", 4, 4, 64)
    plan = physical_plan(nb)
    # the frame is an RDD cut, not live hyperplane lineage
    assert "ExistingRDD" in plan and "md5" not in plan


def test_embedding_streaming_ingest_matches_batch(spark, tmp_path):
    """Two micro-batches through embedding_ingest_sink must discover
    exactly the pairs batch LSH finds on the union corpus — including
    cross-batch pairs detected against the persisted bucket state."""
    from hive_scd_spark.operators.dedup import embedding_near_dup_pairs
    from hive_scd_spark.streaming import embedding_ingest_sink

    base = [1.0, 0.2, -0.5, 0.8, 0.1, -0.3, 0.7, 0.4]
    other = [-0.6, 0.9, 0.3, -0.1, 0.5, 0.2, -0.8, 0.1]

    def near(v, eps):
        return [x + eps * ((i % 3) - 1) for i, x in enumerate(v)]

    rows1 = [(1, base), (2, near(base, 0.01)), (3, other)]
    rows2 = [(4, near(base, 0.02)), (5, near(other, 0.01)),
             (6, [0.0, 0.0, 1.0, 0.0, -1.0, 0.0, 0.0, 2.0])]
    schema = "vec_id long, embedding array<double>"
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    sink = embedding_ingest_sink(
        stream,
        state_path=str(tmp_path / "state"),
        pairs_path=str(tmp_path / "pairs"),
        checkpoint=str(tmp_path / "ckpt"),
        threshold=0.9,
        n_planes=2,
        n_bands=2,
        dim=8,
    )
    q = sink.start()
    try:
        q.processAllAvailable()
        spark.createDataFrame(rows2, schema).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r.id_a, r.id_b, r.cos)
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    all_vecs = spark.createDataFrame(rows1 + rows2, schema)
    want = _cpairs(
        embedding_near_dup_pairs(
            all_vecs, "vec_id", "embedding",
            threshold=0.9, use_lsh=True, n_planes=2, n_bands=2, dim=8,
        )
    )
    assert got == want
    # the scenario must exercise cross-batch detection, not just replays
    assert any(a <= 3 < b for a, b, _ in got)
