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


_COMBINE_CHILDREN = (
    "HashAggregate",
    "SortAggregate",
    "ObjectHashAggregate",
    "TakeOrderedAndProject",
    # a global limit's exchange carries <= (partitions x limit) rows —
    # the docstring's "global limit" exemption
    "LocalLimit",
)


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
            # legitimate iff the broadcast child subtree bottoms out in a
            # global aggregate (1-row build)
            def _has_agg(n: int) -> bool:
                if names.get(n, "").startswith(_COMBINE_CHILDREN):
                    return True
                return any(_has_agg(c) for c in children.get(n, []))

            build_ok = any(
                names.get(c, "").startswith("BroadcastExchange") and _has_agg(c)
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
            combine_like = all(
                names.get(c, "").startswith(_COMBINE_CHILDREN) for c in kids
            ) and kids
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
