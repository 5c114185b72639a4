#!/usr/bin/env python
"""Rotation planner: derive the driver-verification ledger from the
committed CORRECTNESS_r*.json artifacts and the current registry.

The driver's correctness gate only runs the FIRST 50 entries of
``QUERIES`` (the window); everything else is evidenced solely by the
committed contract logs.  Each round ~7-12 never-driver-verified
entries rotate in, displacing multiply-green veterans — this script
computes both lists mechanically instead of by archaeology:

- per registry entry: how many rounds it was driver-checked, how many
  were full hash-green, and the most recent round;
- the rotation-IN pool (registered, never driver-verified), with the
  ten pinned ``scd_*`` core gates and rows-only gates annotated;
- the rotation-OUT candidates (in-window, hash-green in >= 2 rounds).

Usage: python scripts/rotation_report.py   (no Spark session needed)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WINDOW = 50


def main() -> None:
    # registry order WITHOUT a Spark session: parse the QUERIES dict
    # literal (the driver window is defined by source order)
    src = open(
        os.path.join(os.path.dirname(__file__), "..", "hive_scd_spark", "queries.py")
    ).read()
    m = re.search(r"^QUERIES\s*:.*?=\s*\{(.*?)\n\}", src, re.M | re.S)
    registry = re.findall(r'^\s{4}"([a-z0-9_]+)":', m.group(1), re.M)
    ro_m = re.search(r"ROWS_ONLY_GATES\s*[:=][^{]*\{([^}]*)\}", src, re.S)
    rows_only = set(re.findall(r'"([a-z0-9_]+)"', ro_m.group(1))) if ro_m else set()

    history: dict[str, list[tuple[int, bool, bool]]] = {}
    for path in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", path).group(1))
        data = json.load(open(path))
        for name, row in data.items():
            ran = row.get("err") in (None, "no_oracle")
            green = bool(
                row.get("rows_match") and row.get("schema_match") and row.get("hash_match")
            )
            history.setdefault(name, []).append((rnd, ran, green))

    never = [q for q in registry if q not in history]
    in_window = registry[:WINDOW]
    multi_green = []
    for q in in_window:
        greens = [r for r, _ran, g in history.get(q, []) if g]
        if len(greens) >= 2:
            multi_green.append((q, len(greens), max(greens)))

    # rows-only gates can NEVER hash-green (no DuckDB oracle — the
    # driver records a weaker rows-only check), so a window slot is
    # wasted on them: they are excluded from the IN pool and listed
    # separately (the layout_zorder_skipping r7/r8 lesson, re-learned
    # for text_bpe_train in VERDICT r9).
    eligible = [q for q in never if q not in rows_only]
    excluded = [q for q in never if q in rows_only]

    print(f"registry: {len(registry)} entries; window = first {WINDOW}")
    print(f"\nrotation-IN pool ({len(eligible)} never driver-verified, hash-checkable):")
    for q in eligible:
        tag = "  [ALREADY IN WINDOW (verifies this round)]" if q in in_window else ""
        print(f"  {q}{tag}")
    if excluded:
        print(
            f"\nexcluded from IN pool ({len(excluded)} rows-only — cannot "
            f"hash-green; evidenced by check_contract.py instead):"
        )
        for q in excluded:
            print(f"  {q}")
    print(
        f"\nrotation-OUT candidates ({len(multi_green)} in-window, hash-green in >= 2 rounds):"
    )
    for q, n, last in sorted(multi_green, key=lambda t: (-t[1], t[0])):
        pin = "  [PINNED: scd core, never rotates]" if q.startswith("scd") else ""
        print(f"  {q}: green x{n}, last r{last}{pin}")

    # BACK-FILL pool (VERDICT r13 task 7): with the never-windowed debt
    # at zero, window slots freed by multiply-green veterans go to the
    # LONGEST-out-of-window veterans, so no entry's most recent driver
    # verification ages without bound.  Ranked by last driver-green
    # round (stalest first); rows-only gates excluded (cannot green).
    out_window = [q for q in registry[WINDOW:] if q not in rows_only]
    staleness = []
    for q in out_window:
        greens = [r for r, _ran, g in history.get(q, []) if g]
        staleness.append((max(greens) if greens else 0, q))
    print(f"\nback-fill pool ({len(staleness)} out-of-window, stalest first):")
    for last, q in sorted(staleness)[:20]:
        tag = f"last green r{last}" if last else "never green"
        print(f"  {q}: {tag}")


if __name__ == "__main__":
    main()
