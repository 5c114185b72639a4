"""Round-11 mixing operators: temperature-scaled source mixing
(n_s^alpha rebalancing with per-doc repeat factors) and the
deterministic distributed global shuffle."""

import pytest

from pyspark.sql import functions as F


def _docs(spark):
    # three sources: tiny/medium/huge token mass
    rows = []
    for i in range(4):
        rows.append((i, "tiny", 10))
    for i in range(10, 30):
        rows.append((i, "mid", 50))
    for i in range(100, 200):
        rows.append((i, "huge", 100))
    return spark.createDataFrame(
        rows, "doc_id long, source string, n_tokens long"
    )


def test_temperature_mix_budget_and_direction(spark):
    """alpha < 1 up-weights small sources relative to natural
    proportions; per-source materialized tokens land within one
    document of the floor target; total ≈ budget."""
    from hive_scd_spark.operators.sampling import temperature_mix

    docs = _docs(spark)
    out = temperature_mix(
        docs, "doc_id", "source", "n_tokens", budget=5_000, alpha=0.5
    )
    rows = out.collect()
    assert len(rows) == docs.count()  # every row survives
    per_src = {}
    for r in rows:
        per_src.setdefault(r.source, 0)
        per_src[r.source] += r.n_repeats * r.n_tokens
    import math

    n = {"tiny": 40, "mid": 1000, "huge": 10000}
    sm = sum(math.sqrt(v) for v in (n["huge"], n["mid"], n["tiny"]))
    # (sorted-name fold order differs from this sum's order; tolerance
    # below absorbs any last-ulp difference — this is a direction test)
    for s in n:
        target = math.floor(5000.0 * (math.sqrt(n[s]) / sm))
        # boundary doc rounds up: overshoot < one max document
        assert target <= per_src[s] <= target + 100, (s, per_src[s], target)
    # alpha=0.5 direction: tiny's sampled share exceeds its natural share
    nat_tiny = n["tiny"] / sum(n.values())
    mix_tiny = per_src["tiny"] / sum(per_src.values())
    assert mix_tiny > nat_tiny


def test_temperature_mix_alpha_one_is_natural_proportions(spark):
    from hive_scd_spark.operators.sampling import temperature_mix

    docs = _docs(spark)
    out = temperature_mix(
        docs, "doc_id", "source", "n_tokens", budget=11_040, alpha=1.0
    )
    # budget == total corpus tokens → every doc repeats exactly once
    # (floor(budget·n_s/N) == n_s for every source)
    reps = {r.doc_id: r.n_repeats for r in out.collect()}
    assert all(v == 1 for v in reps.values())


def test_temperature_mix_layout_independent_and_validated(spark):
    from hive_scd_spark.operators.sampling import temperature_mix

    docs = _docs(spark)
    a = sorted(
        map(
            tuple,
            temperature_mix(
                docs, "doc_id", "source", "n_tokens", budget=3_000
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            temperature_mix(
                docs.repartition(7, "doc_id"),
                "doc_id",
                "source",
                "n_tokens",
                budget=3_000,
            ).collect(),
        )
    )
    assert a == b
    with pytest.raises(ValueError, match="quarter powers"):
        temperature_mix(docs, "doc_id", "source", "n_tokens", 1000, alpha=0.7)
    with pytest.raises(ValueError, match="budget must be positive"):
        temperature_mix(docs, "doc_id", "source", "n_tokens", 0)


def test_shuffle_corpus_is_a_deterministic_permutation(spark):
    from hive_scd_spark.operators.sampling import shuffle_corpus

    docs = spark.range(1, 501).select(F.col("id").alias("doc_id"))
    a = {r.doc_id: r.shuffle_rank for r in shuffle_corpus(docs, "doc_id").collect()}
    assert sorted(a.values()) == list(range(1, 501))  # dense permutation
    # layout-independent: same ranks after repartition
    b = {
        r.doc_id: r.shuffle_rank
        for r in shuffle_corpus(docs.repartition(13), "doc_id").collect()
    }
    assert a == b
    # a different salt is a different permutation (overwhelmingly)
    c = {
        r.doc_id: r.shuffle_rank
        for r in shuffle_corpus(docs, "doc_id", salt="other").collect()
    }
    assert c != a and sorted(c.values()) == list(range(1, 501))


def _py_temperature_mix(rows, budget, alpha=0.5, salt="tmix"):
    """Pure-Python reference for temperature_mix (same ladder, same
    sorted-source fold, same md5-prefix boundary rule)."""
    import hashlib
    import math

    n = {}
    for _id, src, t in rows:
        n[src] = n.get(src, 0) + t
    n = {s: v for s, v in n.items() if v > 0}

    def ladder(x):
        if alpha == 1.0:
            return float(x)
        if alpha == 0.5:
            return math.sqrt(float(x))
        if alpha == 0.25:
            return math.sqrt(math.sqrt(float(x)))
        return math.sqrt(float(x)) * math.sqrt(math.sqrt(float(x)))

    sm = 0.0
    for s in sorted(n):
        sm += ladder(n[s])
    target = {s: math.floor(float(budget) * (ladder(n[s]) / sm)) for s in n}
    order = {}
    for s in n:
        docs = [(hashlib.md5(f"{salt}:{d}".encode()).hexdigest(), d, t)
                for d, src, t in rows if src == s]
        docs.sort()
        before = 0
        for h, d, t in docs:
            order[d] = before
            before += t
    out = {}
    for d, src, t in rows:
        if src not in n:
            out[d] = 0
            continue
        k, r = target[src] // n[src], target[src] % n[src]
        out[d] = k + (1 if order[d] < r else 0)
    return out


def test_temperature_mix_matches_python_reference_property(spark):
    import random

    from hive_scd_spark.operators.sampling import temperature_mix

    rng = random.Random(411)
    for trial in range(4):
        alpha = rng.choice([0.25, 0.5, 0.75, 1.0])
        budget = rng.randint(500, 20_000)
        rows = [
            (d, f"s{rng.randint(0, 5)}", rng.randint(0, 200))
            for d in range(1, rng.randint(30, 120))
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, source string, n_tokens long"
        )
        got = {
            r.doc_id: r.n_repeats
            for r in temperature_mix(
                df, "doc_id", "source", "n_tokens", budget, alpha=alpha
            ).collect()
        }
        want = _py_temperature_mix(rows, budget, alpha)
        assert got == want, (trial, alpha, budget)
