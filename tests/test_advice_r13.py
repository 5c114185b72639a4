"""Round-13 ADVICE fixes.

- pq_adc_topk must key the per-subspace LUT by list_id VALUE, never by
  position: pq_codebooks drops Lloyd clusters that empty, so surviving
  list_ids need not be contiguous — positional indexing reads a
  shifted entry (or NULL) while the SQL oracle joins on list_id.
- gap_fill_locf must bucket with FLOOR division on the Spark side too:
  Python // floors, Spark `div` truncates toward zero, so negative
  event times landed in misaligned buckets and silently dropped out of
  the grid's left join.
- read_frequent_state must not collide epochs from two different
  streaming queries appended to the same state path (fresh checkpoint
  restarts epoch ids at 0): rows are stamped with a run id derived
  from the checkpoint and all dedup/meta math is per (run, epoch).
- heavy_hitters' recount pass must also produce the stream total (one
  ROLLUP aggregate), not scan the stream a third time for a 1-row N.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from hive_scd_spark.operators.asof import gap_fill_locf
from hive_scd_spark.operators.profile import heavy_hitters
from hive_scd_spark.operators.similarity import pq_adc_topk, pq_encode
from hive_scd_spark.streaming import frequent_ingest_sink, read_frequent_state

# ---------------------------------------------------------------------------
# pq_adc_topk: non-contiguous list_ids
# ---------------------------------------------------------------------------

DIM, N_SUB = 8, 2

CB_SCHEMA = T.StructType(
    [
        T.StructField("sub_id", T.IntegerType(), False),
        T.StructField("list_id", T.LongType(), False),
        T.StructField("__centv", T.ArrayType(T.DoubleType()), False),
        T.StructField("__centn", T.DoubleType(), False),
    ]
)


def _norm(v):
    return sum(x * x for x in v) ** 0.5


def _cb(spark, list_ids):
    """Two-subspace codebooks over 3 hand-picked centroids per sub,
    labeled with the given list_ids (same centroids either way)."""
    cents = [
        [1.0, 0.0, 0.0, 0.0],
        [0.0, 1.0, 1.0, 0.0],
        [-1.0, 0.0, 0.0, 1.0],
    ]
    rows = [
        (s, int(lid), c, _norm(c))
        for s in range(N_SUB)
        for lid, c in zip(list_ids, cents)
    ]
    return spark.createDataFrame(rows, CB_SCHEMA)


def _vectors(spark, n=12):
    rows = [
        (
            i,
            [float((i * 7 + j * 3) % 5 - 2) for j in range(DIM)],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_pq_adc_topk_noncontiguous_list_ids(spark):
    """Relabeling codebook list_ids (0,1,2) -> (0,1,3) must not change
    the ANN answer: list_id is an opaque value, and the LUT lookup has
    to key on it by value.  The pre-fix positional array would read
    lut[4] for code 3 (NULL / shifted) and diverge."""
    corpus = _vectors(spark)
    queries = corpus.filter(F.col("vec_id") < 3)
    dense = _cb(spark, [0, 1, 2])
    gapped = _cb(spark, [0, 1, 3])

    got_dense = pq_adc_topk(
        corpus, queries, dense, dim=DIM, n_sub=N_SUB, n_candidates=6, k=3
    ).collect()
    got_gap = pq_adc_topk(
        corpus, queries, gapped, dim=DIM, n_sub=N_SUB, n_candidates=6, k=3
    ).collect()
    key = lambda r: (r["query_id"], r["rk"])
    assert sorted(got_dense, key=key) == sorted(got_gap, key=key)
    assert len(got_gap) == 3 * 3  # 3 queries x top-3, nothing NULLed away

    # codes really do take the gapped values (the regression shape)
    codes = pq_encode(corpus, gapped, dim=DIM, n_sub=N_SUB).collect()
    seen = {c for r in codes for c in r["codes"]}
    assert seen <= {0, 1, 3} and 3 in seen


# ---------------------------------------------------------------------------
# gap_fill_locf: negative time values
# ---------------------------------------------------------------------------


def test_gap_fill_locf_negative_times(spark):
    """Floor-consistent bucketing: t=-21 at step=10 belongs to bucket
    -3 ([-30,-20)), not `div`'s -2.  Python replay of the LOCF grid."""
    ev = spark.createDataFrame(
        [
            ("k1", -21, 1.0),   # bucket -3
            ("k1", -10, 2.0),   # bucket -1
            ("k1", 4, 3.0),     # bucket 0
            ("k2", -1, 9.0),    # bucket -1 (div would say 0)
        ],
        "user string, t long, v double",
    )
    out = gap_fill_locf(ev, "user", "t", "v", step=10, start=-25, end=15)
    got = {(r["user"], r["bucket"]): (r["filled_value"], r["is_observed"])
           for r in out.collect()}
    # grid: buckets -3..1 for both keys
    assert set(got) == {(k, b) for k in ("k1", "k2") for b in range(-3, 2)}
    assert got[("k1", -3)] == (1.0, True)
    assert got[("k1", -2)] == (1.0, False)   # carried across the gap
    assert got[("k1", -1)] == (2.0, True)
    assert got[("k1", 0)] == (3.0, True)
    assert got[("k1", 1)] == (3.0, False)
    assert got[("k2", -3)] == (None, False)  # before first observation
    assert got[("k2", -1)] == (9.0, True)    # the div-misaligned row
    assert got[("k2", 0)] == (9.0, False)
    # in-range filter is on raw time, not bucket: t=-21 >= start=-25 kept
    n_obs = sum(1 for v, o in got.values() if o)
    assert n_obs == 4


def test_gap_fill_locf_positive_times_unchanged(spark):
    """The floor form is identical to the old truncating form for the
    non-negative times every existing gate uses."""
    ev = spark.createDataFrame(
        [("a", 3, 1.0), ("a", 27, 2.0), ("b", 14, 5.0)],
        "user string, t long, v double",
    )
    out = gap_fill_locf(ev, "user", "t", "v", step=10, start=0, end=30)
    got = {(r["user"], r["bucket"]): r["filled_value"] for r in out.collect()}
    assert got[("a", 0)] == 1.0 and got[("a", 1)] == 1.0 and got[("a", 2)] == 2.0
    assert got[("b", 0)] is None and got[("b", 1)] == 5.0 and got[("b", 2)] == 5.0


# ---------------------------------------------------------------------------
# read_frequent_state: two queries, one state path
# ---------------------------------------------------------------------------


def _drive_once(spark, src, state, ckpt, batch, capacity=8):
    spark.createDataFrame(batch, "key string").coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    stream = spark.readStream.schema("key string").parquet(str(src))
    q = frequent_ingest_sink(stream, str(state), str(ckpt), "key",
                             capacity=capacity).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_two_runs_same_state_path_add_not_collide(spark, tmp_path):
    """A second query (fresh checkpoint -> epoch ids restart at 0)
    appending to the same state path must ADD its traffic: N covers
    both runs and per-key counts sum, instead of the old (epoch, key)
    dedup arbitrarily dropping one run's rows."""
    state = tmp_path / "state"
    _drive_once(spark, tmp_path / "src1", state, tmp_path / "ckpt1",
                [("x",)] * 10 + [("y",)] * 4)
    _drive_once(spark, tmp_path / "src2", state, tmp_path / "ckpt2",
                [("x",)] * 6 + [("z",)] * 4)
    raw = spark.read.parquet(str(state))
    assert "run" in raw.columns
    assert raw.select("run").distinct().count() == 2
    got = {r["key"]: r for r in
           read_frequent_state(spark, str(state), "key", k=3).collect()}
    # x was a candidate in both runs: exact 16 across N=24
    assert got["x"]["cnt_min"] == 16 and got["x"]["certain"]
    # certainty threshold uses the COMBINED N (24), not one run's
    n = 24
    for key, r in got.items():
        if r["certain"]:
            assert r["cnt_min"] * 3 >= n


def test_same_run_replay_still_dedups(spark, tmp_path):
    state = tmp_path / "state"
    _drive_once(spark, tmp_path / "src", state, tmp_path / "ckpt",
                [("x",)] * 8 + [("y",)] * 2)
    before = {r["key"]: (r["cnt_min"], r["cnt_max"]) for r in
              read_frequent_state(spark, str(state), "key", k=2).collect()}
    raw = spark.read.parquet(str(state))
    raw.write.mode("append").parquet(str(state))  # full replay, same run
    after = {r["key"]: (r["cnt_min"], r["cnt_max"]) for r in
             read_frequent_state(spark, str(state), "key", k=2).collect()}
    assert before == after and before["x"][0] == 8


# ---------------------------------------------------------------------------
# heavy_hitters: recount + total in ONE aggregate
# ---------------------------------------------------------------------------


def test_heavy_hitters_values_unchanged(spark):
    rows = [("hot",)] * 50 + [("warm",)] * 20 + [(f"t{i}",) for i in range(30)]
    df = spark.createDataFrame(rows, "key string")
    got = {r["key"]: (r["cnt"], r["share"])
           for r in heavy_hitters(df, "key", k=5, capacity=8).collect()}
    assert got == {"hot": (50, 0.5), "warm": (20, 0.2)}


def test_heavy_hitters_single_recount_aggregate(spark):
    """The total must come out of the recount ROLLUP, not a third
    stream scan: the rollup output is lazily localCheckpoint-ed, so
    the final plan's two consumers both read the checkpointed RDD —
    neither re-derives the Expand/MG lineage (which Catalyst would
    otherwise duplicate per branch, filter-pushed into divergence)."""
    df = spark.createDataFrame([("a",)] * 9 + [("b",)], "key string")
    out = heavy_hitters(df, "key", k=2, capacity=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # lineage truncated at the checkpoint: the rollup (Expand) and the
    # MG pass (mg_summaries MapInPandas) run ONCE inside the
    # checkpointed RDD, never in the twice-consumed final plan
    assert plan.count("Expand") == 0
    assert plan.count("mg_summaries") == 0
    assert {r["key"]: r["cnt"] for r in out.collect()} == {"a": 9}
