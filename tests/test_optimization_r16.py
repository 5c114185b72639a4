"""Round-16 optimization pins.

- pagerank deep-unroll re-pin (ADVICE r15 #4): the ``(i+1) % 8`` lazy
  re-checkpoint path was dead code for every in-repo caller (iters=5);
  exercise it with iters=17 (two re-pins) against a pure-Python
  integer replica so the guard's behavior is pinned before anything
  depends on it.
- pagerank job-count budget (VERDICT r15 task 6): the r15 loop-
  invariant pinning claim (35 -> 20 Spark jobs for builder+action) had
  no regression test; assert the builder+noop-action job count stays
  within budget via statusTracker on the real gate.
- model-table pins (VERDICT r15 task 1): materialize_small /
  pin_model_table replaced the lazy localCheckpoints in the LM/DSIR/NB
  operators; pin value fidelity (rows and schema identical to the lazy
  plan) and the bound-based mechanism choice.
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _pagerank_reference(edges, iters, scale=1_000_000, directed=False):
    """Pure-Python integer replica of operators/cluster.pagerank —
    same symmetrization, same floor arithmetic, same fixed iteration
    count.  Integer ops only, so equality with Spark is exact."""
    e = set()
    for a, b in edges:
        e.add((a, b))
        if not directed:
            e.add((b, a))
    nodes = {s for s, _ in e} | {d for _, d in e}
    deg = {}
    for s, _ in e:
        deg[s] = deg.get(s, 0) + 1
    base = scale * 3 // 20
    r = {n: scale for n in nodes}
    for _ in range(iters):
        sums = {}
        for s, d in e:
            sums[d] = sums.get(d, 0) + r[s] // deg[s]
        r = {n: base + (17 * sums.get(n, 0)) // 20 for n in nodes}
    return r


def test_pagerank_deep_unroll_repin_matches_reference(spark):
    """iters=17 crosses the every-8-rounds lazy re-pin twice (after
    rounds 8 and 16); values must equal the un-pinned integer
    recursion exactly — checkpoints never change data."""
    from hive_scd_spark.operators.cluster import pagerank

    edge_list = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3), (4, 5), (5, 6), (6, 4)]
    edges = spark.createDataFrame(edge_list, "id_a long, id_b long")
    got = {
        x.node: x.rank_scaled for x in pagerank(edges, iters=17).collect()
    }
    want = _pagerank_reference(edge_list, iters=17)
    assert got == want


def test_pagerank_gate_job_count_budget(spark, sf_dir):
    """VERDICT r15 task 6: builder + one noop action of the
    graph_pagerank_dups gate must stay within the r15-measured job
    budget (20; was 35 before the loop-invariant pinning).  Job count
    is plan-shape-bound, not data-bound, so sf0.001 pins the same
    claim the r15 sf0.1 measurement made."""
    from hive_scd_spark.queries import graph_pagerank_dups

    sc = spark.sparkContext
    sc.setJobGroup("r16-pagerank-jobcount", "pagerank job budget", False)
    try:
        df = graph_pagerank_dups(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
    finally:
        sc.setJobGroup(None, None, False)
    jobs = sc.statusTracker().getJobIdsForGroup("r16-pagerank-jobcount")
    assert 0 < len(jobs) <= 20, f"pagerank gate ran {len(jobs)} jobs"


def test_materialize_small_rows_and_schema_identical(spark):
    """materialize_small is a driver collect + local re-create: the
    result must carry the identical schema and the identical row
    multiset (doubles included bit-for-bit) as the lazy plan."""
    from hive_scd_spark.operators._materialize import materialize_small

    df = (
        spark.range(100)
        .select(
            (F.col("id") % 7).alias("k"),
            (F.col("id").cast("double") / 3.0).alias("v"),
            F.array(F.col("id") * 2, F.col("id") * 3).alias("arr"),
        )
        .groupBy("k")
        .agg(F.sum("v").alias("sv"), F.count("*").alias("c"))
    )
    pinned = materialize_small(df)
    assert pinned.schema == df.schema
    assert sorted(map(tuple, pinned.collect())) == sorted(
        map(tuple, df.collect())
    )


def test_pin_model_table_mechanism_choice(spark):
    """pin_model_table picks the driver collect for parameter bounds
    within MATERIALIZE_ROW_BOUND and the executor-side lazy checkpoint
    above it — decided by the BOUND (a pure function of operator
    arguments), never by the data."""
    from hive_scd_spark.operators._materialize import (
        MATERIALIZE_ROW_BOUND,
        pin_model_table,
    )

    df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("y"))
    small = pin_model_table(df, row_bound=MATERIALIZE_ROW_BOUND)
    big = pin_model_table(df, row_bound=MATERIALIZE_ROW_BOUND + 1)
    # the driver-collect pin rebuilds from a local relation: no shuffle,
    # no scan — its optimized plan is a LocalRelation / LocalTableScan
    assert "LocalTableScan" in small._jdf.queryExecution().executedPlan().toString() or \
        "LocalRelation" in small._jdf.queryExecution().optimizedPlan().toString()
    # the checkpoint pin stays lazy at build: same rows either way
    assert sorted(map(tuple, big.collect())) == sorted(map(tuple, df.collect()))
    assert sorted(map(tuple, small.collect())) == sorted(map(tuple, df.collect()))


def test_simhash_packed_votes_match_flat_formulation(spark):
    """r16 vote packing (2 bit-counts per 64-bit aggregate lane) must
    produce fingerprints bit-identical to the flat 60-aggregate
    formulation — pinned against a pure-Python replica, including an
    odd bit width (one half-empty lane) and token multiplicity."""
    import hashlib
    import random

    from hive_scd_spark.operators.dedup import simhash

    rng = random.Random(416)
    words = ["alpha", "beta", "gamma", "delta", "x1", "xx", "zz9"]
    docs = [
        (i, " ".join(rng.choices(words, k=rng.randint(1, 40))))
        for i in range(30)
    ]

    def reference_simhash(text, bits):
        toks = text.strip().split()
        hashes = [
            int(hashlib.md5(t.encode()).hexdigest()[:15], 16) for t in toks
        ]
        nt = len(hashes)
        fp = 0
        for b in range(bits):
            votes = sum((h >> b) & 1 for h in hashes)
            if votes * 2 > nt:
                fp |= 1 << b
        return fp

    for bits in (60, 7):  # even (full lanes) and odd (half-empty lane)
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r.doc_id: r.simhash
            for r in simhash(df, "doc_id", "text", bits=bits).collect()
        }
        want = {i: reference_simhash(t, bits) for i, t in docs}
        assert got == want, f"bits={bits}"
