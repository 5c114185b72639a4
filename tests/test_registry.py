"""Registry invariants — the driver-contract properties that every
rotation edit must preserve (each r6 rotation was hand-checked with an
inline script; this pins them in the suite)."""

from __future__ import annotations

import __spark_entry__ as entry
from hive_scd_spark.queries import ORACLES, QUERIES


def test_every_query_has_an_oracle():
    """Every gate carries a DuckDB oracle except the explicitly
    justified rows-only set (file-layout evidence — no SQL replay)."""
    from hive_scd_spark.queries import ROWS_ONLY_GATES

    missing = [q for q in QUERIES if q not in ORACLES]
    assert sorted(missing) == sorted(ROWS_ONLY_GATES), (
        f"gates without DuckDB oracles beyond the justified rows-only "
        f"set: {sorted(set(missing) ^ set(ROWS_ONLY_GATES))}"
    )


def test_registry_names_unique_and_window_full():
    names = list(QUERIES)
    assert len(set(names)) == len(names)
    # the driver checks the FIRST 50 — the window must stay full
    assert len(names) >= 50


def test_entry_module_mirrors_registry():
    assert list(entry.queries()) == list(QUERIES)
    from hive_scd_spark.queries import ROWS_ONLY_GATES

    assert set(entry.oracle_sql()) >= set(QUERIES) - ROWS_ONLY_GATES


def test_window_keeps_reference_core_first():
    """The ten SCD gates (the reference's own surface) must stay inside
    the driver window — extensions rotate, the core does not."""
    window = list(QUERIES)[:50]
    scd = [n for n in window if n.startswith("scd")]
    assert len(scd) >= 10


def test_oracle_sql_is_nonempty_text():
    for name, sql in ORACLES.items():
        assert isinstance(sql, str) and sql.strip(), name


def test_bench_headline_is_registered_and_iterative_subset():
    import bench

    unknown = [n for n in bench.HEADLINE if n not in QUERIES]
    assert unknown == [], f"bench names not in the registry: {unknown}"
    stray = [n for n in bench.ITERATIVE if n not in bench.HEADLINE]
    assert stray == [], f"ITERATIVE entries outside HEADLINE: {stray}"


def test_bench_stdout_line_fits_tail_capture():
    """The driver records only the last ~2 kB of bench stdout (the r12
    artifact lost its head when the line outgrew the window).  Pin the
    COMPACT line's worst-case size: every headline query at a 6-char
    2dp timing, plus the fixed fields, must leave headroom under 2000
    bytes — and the total/unit must be the LAST keys so truncation can
    only ever eat query rows."""
    import json

    from bench import EXTRA_REPS, HEADLINE

    from bench import tail_safe_line

    out = {
        "queries": {name: 999.99 - i for i, name in enumerate(HEADLINE)},
        "sf": 0.1,
        "reps": 2,
        "metric": "headline_queries_total_runtime",
        "value": 99999.999,
        "unit": "sec",
    }
    line = tail_safe_line(dict(out))
    assert len(line) <= 1990, len(line)
    parsed = json.loads(line)  # valid JSON by construction
    assert parsed["value"] == out["value"] and parsed["unit"] == "sec"
    kept = parsed["queries"]
    # most-expensive-first retention; omitted rows counted
    assert len(kept) + parsed.get("queries_omitted", 0) == len(HEADLINE)
    if parsed.get("queries_omitted"):
        assert min(kept.values()) >= max(
            v for k, v in out["queries"].items() if k not in kept
        )
    # a line that already fits passes through whole
    small = dict(out, queries={"q1": 1.0})
    assert json.loads(tail_safe_line(small))["queries"] == {"q1": 1.0}
    assert EXTRA_REPS <= set(HEADLINE)
