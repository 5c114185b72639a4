"""Regression pins for the round-14 ADVICE findings fixed in round 15:

- bench.merge_sessions' noise_bound is a true nearest-rank p90, not
  the max, for small session-common query counts.
- winnow_pairs_from_selected(pair_budget=...) localCheckpoints the
  grouped inverted index before the census, so the upstream
  gram/fingerprint pipeline is executed once, and the returned plan
  reads the checkpoint blocks.
- the scd2_chain_outoforder oracle models pre-existing 'PROMO' rows
  (no silent data-dependent assumption): engine and oracle agree on a
  corpus that DOES contain base-'PROMO' customers.
- anomaly_ingest_sink's FS ops route through the fs facade: plain
  local paths are os-backed (Spark-Connect-safe, no py4j); URI-scheme
  paths on a Connect-like session fail with one clear message.
"""

from __future__ import annotations

import pytest


# ---------------------------------------------------------------------------
# bench.merge_sessions percentile index
# ---------------------------------------------------------------------------


def test_noise_bound_p90_is_not_max_for_small_n():
    import bench

    # 10 common queries: 9 ratios at ~1.0x, one outlier at 2.0x.
    # nearest-rank p90 over n=10 is the 9th order statistic (index 8),
    # NOT the max — the old int(p*n) picked index 9 = 2.0.
    s1 = {f"q{i}": 1.0 for i in range(10)}
    s2 = {f"q{i}": (2.0 if i == 9 else 1.0 + i * 0.01) for i in range(10)}
    m = bench.merge_sessions([
        {"queries": s1, "sf": 0.1}, {"queries": s2, "sf": 0.1},
    ])
    assert m["envelope"]["noise_bound"] < 1.5
    assert m["envelope"]["per_query_ratio_p90"] == m["envelope"]["noise_bound"]
    # median unchanged semantics: nearest-rank p50 over n=10 → index 4
    assert m["envelope"]["per_query_ratio_median"] == pytest.approx(1.04)


def test_noise_bound_n1_and_empty():
    import bench

    m = bench.merge_sessions([
        {"queries": {"q0": 1.0}, "sf": 0.1},
        {"queries": {"q0": 1.3}, "sf": 0.1},
    ])
    # n=1: the only ratio is both median and p90
    assert m["envelope"]["noise_bound"] == pytest.approx(1.3)
    m1 = bench.merge_sessions([{"queries": {"q0": 1.0}, "sf": 0.1}])
    assert m1["envelope"]["noise_bound"] is None


# ---------------------------------------------------------------------------
# winnow pair_budget: census runs the upstream once
# ---------------------------------------------------------------------------


def test_pair_budget_checkpoints_grouped_index(spark):
    from hive_scd_spark.operators.dedup import (
        winnow_pairs_from_selected,
        winnow_selected,
    )

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "the quick brown fox jumps over the lazy dog again and again"),
        (3, "a completely different document with no shared content here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sel = winnow_selected(df, "doc_id", "text", k=8, w=4)

    budgeted = winnow_pairs_from_selected(sel, "doc_id", pair_budget=10_000)
    plain = winnow_pairs_from_selected(sel, "doc_id")

    # identical results with and without the budget
    assert sorted(map(tuple, budgeted.collect())) == sorted(
        map(tuple, plain.collect())
    )
    # the budgeted plan reads the checkpointed grouped index (an RDD
    # scan), not a re-derivation of the gram/fingerprint pipeline —
    # i.e. the census materialized it once and the pair plan reuses it
    # (the createDataFrame leaf is itself a LogicalRDD, so test for the
    # absence of the selection's Window pass instead: the checkpoint
    # truncated the lineage below the grouped aggregate)
    optimized = budgeted._jdf.queryExecution().optimizedPlan().toString()
    assert "Window" not in optimized
    assert "Window" in plain._jdf.queryExecution().optimizedPlan().toString()


def test_pair_budget_still_raises_on_blowup(spark):
    from hive_scd_spark.operators.dedup import (
        ShingleSkewError,
        winnow_pairs_from_selected,
        winnow_selected,
    )

    boiler = "shared boilerplate sentence repeated across every document here"
    rows = [(i, boiler) for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sel = winnow_selected(df, "doc_id", "text", k=8, w=4)
    with pytest.raises(ShingleSkewError, match="pair_budget"):
        winnow_pairs_from_selected(sel, "doc_id", max_df=50, pair_budget=3)


# ---------------------------------------------------------------------------
# scd2_chain_outoforder: oracle correct WITH pre-existing 'PROMO' rows
# ---------------------------------------------------------------------------


def test_chain_outoforder_oracle_models_preexisting_promo(spark, tmp_path):
    import duckdb

    from hive_scd_spark.queries import CHAIN_OOO_SCRIPT, ORACLES
    from hive_scd_spark.scd import scd2_history

    rows = [
        # (custkey, name, nationkey, acctbal, mktsegment)
        (1, "plain", 0, 100.0, "BUILDING"),   # neither
        (2, "neg", 0, -20.0, "BUILDING"),     # negative balance
        (3, "pre", 0, 100.0, "PROMO"),        # pre-existing PROMO
        (4, "pre_neg", 0, -20.0, "PROMO"),    # both
    ]
    cust = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey long, "
        "c_acctbal double, c_mktsegment string",
    )
    got = {
        tuple(r)
        for r in scd2_history(cust, CHAIN_OOO_SCRIPT)
        .select(
            "c_custkey", "c_acctbal", "c_mktsegment",
            "valid_from_ms", "valid_to_ms", "is_current",
        )
        .collect()
    }

    pq = str(tmp_path / "cust.parquet")
    cust.write.mode("overwrite").parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW customer AS SELECT * FROM '{pq}/*.parquet'")
    want = {
        (r[0], r[3], r[4], r[5], r[6], r[7])
        for r in con.sql(ORACLES["scd2_chain_outoforder"]).fetchall()
    }
    assert got == want
    # the load-bearing engine shapes the old oracle got wrong:
    t_mar, t_jun = 1709251200000, 1717200000000
    # pre-only: base interval closes at MARCH (stmt 2 reads the base
    # segment), current interval is +50 from March
    assert (3, 100.0, "PROMO", 0, t_mar, False) in got
    assert (3, 150.0, "PROMO", t_mar, None, True) in got
    # pre+neg: same March boundary (June state recomputes to the same
    # values and merges away)
    assert (4, -20.0, "PROMO", 0, t_mar, False) in got
    assert (4, 30.0, "PROMO", t_mar, None, True) in got
    # neg-only: the r14 shape, unchanged — June boundary
    assert (2, -20.0, "BUILDING", 0, t_jun, False) in got
    assert (2, 30.0, "PROMO", t_jun, None, True) in got
    # neither: one open base interval
    assert (1, 100.0, "BUILDING", 0, None, True) in got


# ---------------------------------------------------------------------------
# fs facade: Connect-safe local ops, loud URI-scheme failure
# ---------------------------------------------------------------------------


class _ConnectLikeSession:
    """A session with no py4j gateway (Spark Connect raises
    AttributeError on _jvm access; getattr resolves it to None)."""

    @property
    def _jvm(self):
        raise AttributeError("Spark Connect: no _jvm")


def test_fs_for_local_path_never_touches_jvm(tmp_path):
    from hive_scd_spark.fs import LocalFS, fs_for

    fsx = fs_for(_ConnectLikeSession(), str(tmp_path))
    assert isinstance(fsx, LocalFS)
    (tmp_path / "epoch=1").mkdir()
    (tmp_path / "epoch=2").mkdir()
    (tmp_path / "epoch=1" / "part.parquet").write_bytes(b"x")
    assert sorted(fsx.list_dir(str(tmp_path))) == ["epoch=1", "epoch=2"]
    fsx.delete(fsx.join(str(tmp_path), "epoch=1"), True)
    assert sorted(fsx.list_dir(str(tmp_path))) == ["epoch=2"]


def test_fs_for_uri_scheme_fails_loudly_without_jvm():
    from hive_scd_spark.fs import fs_for

    with pytest.raises(RuntimeError, match="Spark Connect"):
        fs_for(_ConnectLikeSession(), "hdfs://nn/state")
