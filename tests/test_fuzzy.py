"""PassJoin edit-distance self-join: recall-exactness against a
Python Levenshtein brute force over random corpora, plus contract
edges (short strings excluded, d=0 degenerates to exact match)."""

from __future__ import annotations

import itertools
import random

import pytest

from hive_scd_spark.operators.fuzzy import (
    edit_distance_join,
    edit_distance_self_join,
)


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            prev, dp[j] = dp[j], min(
                dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
    return dp[n]


@pytest.mark.parametrize("d", [1, 2])
def test_fuzzy_join_fuzz_vs_bruteforce(spark, d):
    """Blocked output == brute-force pairs at every distance <= d —
    the PassJoin pigeonhole recall guarantee on random corpora with a
    small alphabet (dense near-matches, varied lengths)."""
    rng = random.Random(20260814 + d)
    for _ in range(3):
        words = list(
            {
                "".join(rng.choice("abcd") for _ in range(rng.randint(d + 1, 7)))
                for _ in range(50)
            }
        )
        rows = [(i, w) for i, w in enumerate(words)]
        df = spark.createDataFrame(rows, "id long, w string")
        want = {
            (min(i, j), max(i, j), _lev(a, b))
            for (i, a), (j, b) in itertools.combinations(rows, 2)
            if _lev(a, b) <= d
        }
        got = {
            (r.id_a, r.id_b, r.dist)
            for r in edit_distance_self_join(df, "id", "w", d).collect()
        }
        assert got == want


def test_fuzzy_join_excludes_short_strings_and_carries_strings(spark):
    df = spark.createDataFrame(
        [(1, "ab"), (2, "abcd"), (3, "abce"), (4, "a")], "id long, w string"
    )
    out = edit_distance_self_join(df, "id", "w", max_dist=2)
    rows = {(r.id_a, r.id_b): (r.str_a, r.str_b, r.dist) for r in out.collect()}
    # ids 1/4 are shorter than d+1=3 chars → excluded by contract
    assert set(rows) == {(2, 3)}
    assert rows[(2, 3)] == ("abcd", "abce", 1)


def test_fuzzy_join_d0_is_exact_match(spark):
    df = spark.createDataFrame(
        [(1, "xyz"), (2, "xyz"), (3, "xyw")], "id long, w string"
    )
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_self_join(df, "id", "w", max_dist=0).collect()
    }
    assert got == {(1, 2, 0)}
    with pytest.raises(ValueError, match=">= 0"):
        edit_distance_self_join(df, "id", "w", max_dist=-1)


@pytest.mark.parametrize("d", [1, 2])
def test_fuzzy_two_table_join_fuzz_vs_bruteforce(spark, d):
    """edit_distance_join(left, right) == brute-force cross-product
    Levenshtein at distance <= d on random corpora — the record-linkage
    form (dirty column vs master list)."""
    rng = random.Random(99 + d)
    lwords = ["".join(rng.choice("abc") for _ in range(rng.randint(d + 1, 6))) for _ in range(30)]
    rwords = ["".join(rng.choice("abc") for _ in range(rng.randint(d + 1, 6))) for _ in range(20)]
    left = spark.createDataFrame(list(enumerate(lwords)), "lid long, lw string")
    right = spark.createDataFrame(list(enumerate(rwords)), "rid long, rw string")
    want = {
        (i, j, _lev(a, b))
        for i, a in enumerate(lwords)
        for j, b in enumerate(rwords)
        if _lev(a, b) <= d
    }
    got = {
        (r.lid, r.rid, r.dist)
        for r in edit_distance_join(
            left, right, "lid", "lw", "rid", "rw", d
        ).collect()
    }
    assert got == want


def test_fuzzy_two_table_join_carries_strings(spark):
    left = spark.createDataFrame([(1, "spark")], "lid long, lw string")
    right = spark.createDataFrame([(7, "spork"), (8, "hive")], "rid long, rw string")
    (row,) = edit_distance_join(left, right, "lid", "lw", "rid", "rw", 1).collect()
    assert (row.lid, row.rid, row.left_str, row.right_str, row.dist) == (
        1, 7, "spark", "spork", 1,
    )


def test_fuzzy_two_table_join_rejects_colliding_column_names(spark):
    left = spark.createDataFrame([(1, "abc")], "id long, name string")
    right = spark.createDataFrame([(2, "abd")], "id long, name string")
    with pytest.raises(ValueError, match="collision"):
        edit_distance_join(left, right, "id", "name", "id", "name", 1)
    with pytest.raises(ValueError, match="collision"):
        edit_distance_join(left, right, "dist", "name", "id", "name", 1)


def test_hot_block_census_raises_on_constant_prefix(spark):
    """VERDICT r8 task 5: an adversarial corpus whose strings share a
    constant-prefix segment ("Customer#000…") must raise
    FuzzyBlockSkewError naming the offending segment value — loud,
    never a silent cap — while a prefix-diverse corpus under the same
    bound passes through with identical results."""
    from hive_scd_spark.operators.fuzzy import FuzzyBlockSkewError

    rows = [(i, f"Customer#{i:04d}") for i in range(60)]
    df = spark.createDataFrame(rows, "id long, w string")
    with pytest.raises(FuzzyBlockSkewError) as exc:
        edit_distance_self_join(df, "id", "w", max_dist=1, max_block=100).count()
    msg = str(exc.value)
    # actionable: the offending segment text, the count, and the fixes
    assert "Custome" in msg and "max_block=100" in msg
    assert "variable part" in msg and "on_hot='sample'" in msg

    # same bound on a diverse corpus: census passes, result unchanged
    rng = random.Random(7)
    div = [(i, "".join(rng.choice("abcdefgh") for _ in range(6))) for i in range(60)]
    ddf = spark.createDataFrame(div, "id long, w string")
    plain = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_self_join(ddf, "id", "w", 1).collect()
    }
    censused = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_self_join(ddf, "id", "w", 1, max_block=10_000).collect()
    }
    assert censused == plain


def test_hot_block_census_two_table_and_sample_escape(spark):
    """The two-table census raises on a hot master block; the explicit
    on_hot='sample' escape thins ONLY hot blocks (diverse blocks keep
    exact recall) and bounds the per-block candidate volume."""
    from hive_scd_spark.operators.fuzzy import FuzzyBlockSkewError, _hot_blocks

    left = spark.createDataFrame(
        [(i, f"ACCT-{i % 7:02d}") for i in range(40)], "lid long, lw string"
    )
    right = spark.createDataFrame(
        [(j, f"ACCT-{j % 7:02d}") for j in range(40)], "rid long, rw string"
    )
    with pytest.raises(FuzzyBlockSkewError, match="ACCT"):
        edit_distance_join(
            left, right, "lid", "lw", "rid", "rw", 1, max_block=50
        ).count()
    # sample escape: runs, and every surviving pair is a true pair
    out = edit_distance_join(
        left, right, "lid", "lw", "rid", "rw", 1, max_block=50, on_hot="sample"
    ).collect()
    assert out  # hot blocks thinned, not emptied
    for r in out:
        assert _lev(r.left_str, r.right_str) <= 1
    with pytest.raises(ValueError, match="on_hot"):
        edit_distance_join(
            left, right, "lid", "lw", "rid", "rw", 1, max_block=50, on_hot="cap"
        )


def test_sample_escape_keeps_cold_blocks_exact(spark):
    """on_hot='sample' must not touch blocks under the bound: plant one
    hot group plus a diverse tail; every tail pair found by the plain
    join must survive sampling."""
    rng = random.Random(11)
    hot = [(i, "SERIAL-XX") for i in range(30)]
    tail = [(100 + i, "".join(rng.choice("mnopqr") for _ in range(6))) for i in range(40)]
    df = spark.createDataFrame(hot + tail, "id long, w string")
    plain_tail = {
        (r.id_a, r.id_b)
        for r in edit_distance_self_join(df, "id", "w", 1).collect()
        if r.id_a >= 100 and r.id_b >= 100
    }
    sampled = {
        (r.id_a, r.id_b)
        for r in edit_distance_self_join(
            df, "id", "w", 1, max_block=60, on_hot="sample"
        ).collect()
    }
    assert plain_tail <= sampled
