"""Plan linter: mechanical review of a physical plan for the failure
modes that are invisible at test scale and fatal at 100 TB.

``audit_plan(df)`` returns findings; ``assert_scale_safe(df)`` raises.
The checks encode this repo's standing plan-review checklist (the one
applied by hand in SCALE_NOTES and VERDICT rounds):

- ``cartesian``          CartesianProduct anywhere.
- ``nested-loop``        BroadcastNestedLoopJoin whose build side is
                         not a 1-row global aggregate (the one shape
                         where BNLJ is the RIGHT plan — e.g. joining a
                         scalar statistic onto every row).
- ``python-row-udf``     BatchEvalPython — row-pickled Python in the
                         row path (Arrow paths are fine and reported
                         separately as info).
- ``single-partition``   Exchange SinglePartition whose child is NOT a
                         partial aggregate / global limit — i.e. the
                         full data stream serializes through one task.
                         (A global aggregate's final combine is also a
                         SinglePartition exchange, but its input is one
                         row per upstream partition — that's the
                         legitimate form and is not flagged.)
- ``unpushed-filter``    a Filter sitting directly on a scan that
                         reports no pushed filters — the predicate
                         runs post-materialization on every row.  Only
                         flagged when the filter's condition mentions
                         a pushable (top-level) column; always-true
                         residuals (e.g. isnotnull chains Spark keeps
                         defensively) are not distinguishable from the
                         outside, so this check is advisory: severity
                         "info".

Parsing works off explain("formatted"): the tree section yields the
child edges (indentation), the detail section yields per-node
arguments.  No JVM internals beyond the explain string.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame

from hive_scd_spark.plans import physical_plan

_TREE_LINE = re.compile(r"^(.*?)\((\d+)\)\s*$")
_DETAIL_HEADER = re.compile(r"^\((\d+)\)\s+(\S+)")


@dataclass
class Finding:
    code: str
    severity: str  # "error" | "info"
    node: str
    detail: str


def _parse_tree(plan: str) -> tuple[dict[int, str], dict[int, list[int]]]:
    """(node_id -> name, node_id -> child ids) from the tree section."""
    names: dict[int, str] = {}
    children: dict[int, list[int]] = {}
    stack: list[tuple[int, int]] = []  # (indent, node_id)
    for raw in plan.splitlines():
        if raw.startswith("== Physical Plan =="):
            continue
        m = _TREE_LINE.match(raw.rstrip())
        if not m:
            if raw.strip() and not raw.startswith(" ") and names:
                break  # end of tree section
            continue
        head, nid_s = m.group(1), int(m.group(2))
        # name = last operator token before the (id)
        name = head.split("+-")[-1].split(":-")[-1].strip().lstrip("*").strip()
        indent = len(head) - len(head.lstrip(" +:-*"))
        names[nid_s] = name
        while stack and stack[-1][0] >= indent:
            stack.pop()
        if stack:
            children.setdefault(stack[-1][1], []).append(nid_s)
        stack.append((indent, nid_s))
    return names, children


def _detail_args(plan: str) -> dict[int, str]:
    """node id -> its detail block text."""
    blocks: dict[int, list[str]] = {}
    cur: int | None = None
    in_detail = False
    for raw in plan.splitlines():
        m = _DETAIL_HEADER.match(raw)
        if m:
            cur = int(m.group(1))
            blocks[cur] = [raw]
            in_detail = True
        elif in_detail and cur is not None:
            blocks[cur].append(raw)
    return {k: "\n".join(v) for k, v in blocks.items()}


_AGG_NODES = ("HashAggregate", "SortAggregate", "ObjectHashAggregate")
_BOUNDED_NODES = (
    # a global limit's exchange carries <= (partitions x limit) rows —
    # the docstring's "global limit" exemption
    "TakeOrderedAndProject",
    "LocalLimit",
)
# unary wrappers to look through when locating the substantive node
# under an exchange/broadcast
_WRAPPER_NODES = ("Project", "Filter", "ColumnarToRow", "InputAdapter")


def _is_global_agg(nid: int, names: dict, details: dict) -> bool:
    """True iff node *nid* is an aggregate with EMPTY grouping keys —
    the 1-row (global) form.  A grouped aggregate is corpus-sized (one
    row per key) and must NOT be exempted: both the nested-loop build
    check and the single-partition check previously accepted any
    aggregate and let corpus-sized plans through (caught by the round-6
    high-effort review, reproduced empirically)."""
    if not names.get(nid, "").startswith(_AGG_NODES):
        return False
    return "Keys: []" in details.get(nid, "")


def _substantive_child(nid: int, names: dict, children: dict) -> int | None:
    """First non-wrapper descendant below *nid* (following the single
    chain through Project/Filter-style unary nodes)."""
    kids = children.get(nid, [])
    while len(kids) == 1 and names.get(kids[0], "").startswith(_WRAPPER_NODES):
        kids = children.get(kids[0], [])
    return kids[0] if len(kids) == 1 else None


def audit_plan(df: DataFrame) -> list[Finding]:
    plan = physical_plan(df)
    names, children = _parse_tree(plan)
    details = _detail_args(plan)
    findings: list[Finding] = []

    for nid, name in names.items():
        if name.startswith("CartesianProduct"):
            findings.append(
                Finding("cartesian", "error", name, f"node ({nid})")
            )
        elif name.startswith("BroadcastNestedLoopJoin"):
            # legitimate iff the broadcast build's SUBSTANTIVE root (the
            # first node under the exchange, looking through projection
            # wrappers) IS a keys-empty aggregate — i.e., the build is
            # one row BY CONSTRUCTION.  "some aggregate anywhere below"
            # is not enough: a corpus-sized build containing any
            # aggregate deeper down would pass
            def _build_is_one_row(bx: int) -> bool:
                sub = _substantive_child(bx, names, children)
                return sub is not None and _is_global_agg(sub, names, details)

            build_ok = any(
                names.get(c, "").startswith("BroadcastExchange")
                and _build_is_one_row(c)
                for c in children.get(nid, [])
            )
            if not build_ok:
                findings.append(
                    Finding(
                        "nested-loop",
                        "error",
                        name,
                        f"node ({nid}): build side is not a 1-row aggregate",
                    )
                )
        elif name.startswith("BatchEvalPython"):
            findings.append(
                Finding(
                    "python-row-udf",
                    "error",
                    name,
                    f"node ({nid}): row-pickled Python UDF — use a Pandas UDF",
                )
            )
        elif name.startswith("Exchange") and "SinglePartition" in details.get(
            nid, ""
        ):
            kids = children.get(nid, [])
            # exempt only bounded children: global limits, top-k, or a
            # GLOBAL (keys-empty) aggregate's partial combine — a
            # grouped aggregate is one row per key, corpus-sized
            combine_like = bool(kids) and all(
                names.get(c, "").startswith(_BOUNDED_NODES)
                or _is_global_agg(c, names, details)
                for c in kids
            )
            if not combine_like:
                findings.append(
                    Finding(
                        "single-partition",
                        "error",
                        name,
                        f"node ({nid}): full stream through one task "
                        f"(child: {[names.get(c) for c in kids]})",
                    )
                )
        elif name.startswith("Filter"):
            for c in children.get(nid, []):
                cname = names.get(c, "")
                if cname.startswith("Scan ") or cname.startswith(
                    "ColumnarToRow"
                ):
                    scan = c
                    if cname.startswith("ColumnarToRow"):
                        sub = children.get(c, [])
                        scan = sub[0] if sub else c
                    d = details.get(scan, "")
                    if "PushedFilters: []" in d:
                        findings.append(
                            Finding(
                                "unpushed-filter",
                                "info",
                                name,
                                f"node ({nid}): filter above scan ({scan}) "
                                "with no pushed filters",
                            )
                        )
    return findings


def assert_scale_safe(df: DataFrame, allow: set[str] = frozenset()) -> None:
    """Raise AssertionError when the plan holds any error-severity
    finding whose code is not in *allow*."""
    errs = [
        f
        for f in audit_plan(df)
        if f.severity == "error" and f.code not in allow
    ]
    if errs:
        lines = "\n".join(f"  [{f.code}] {f.node} — {f.detail}" for f in errs)
        raise AssertionError(f"plan audit failed:\n{lines}")
