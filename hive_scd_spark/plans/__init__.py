"""Physical-plan inspection utilities.

The engine's whole scale thesis (SURVEY.md §4) is that SCD compilation
and every operator stay inside Catalyst's reach: filters push into
scans, dimensions broadcast, projections fuse into whole-stage codegen.
These helpers make those properties *assertable* — tests and ops
tooling can fail when a plan regresses, instead of trusting docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The formatted physical plan as a string."""
    return df._jdf.queryExecution().explainString(  # type: ignore[operator]
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")  # type: ignore[union-attr]
    )


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters lines of every scan in the plan."""
    return "\n".join(
        line.strip()
        for line in physical_plan(df).splitlines()
        if "PushedFilters" in line
    )


def scan_read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema of every scan — the column-pruning evidence."""
    return [
        line.split("ReadSchema:", 1)[1].strip()
        for line in physical_plan(df).splitlines()
        if "ReadSchema:" in line
    ]


import re

_NODE_HEADER = re.compile(r"^\(\d+\)\s+(.+?)(?:\s+\[codegen id : \d+\])?\s*$")


def plan_nodes(df: DataFrame) -> list[str]:
    """Operator names from the formatted explain's detail headers —
    each physical node appears exactly once there (the tree section
    repeats them, so substring-counting the whole text double-counts)."""
    nodes = []
    for line in physical_plan(df).splitlines():
        m = _NODE_HEADER.match(line.strip())
        if m:
            nodes.append(m.group(1))
    return nodes


def uses_broadcast_join(df: DataFrame) -> bool:
    plan = physical_plan(df)
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def count_shuffles(df: DataFrame) -> int:
    """Number of Exchange operators (shuffles) in the physical plan."""
    return sum(1 for n in plan_nodes(df) if n.startswith("Exchange"))


def codegen_stage_count(df: DataFrame) -> int:
    """How many WholeStageCodegen spans the plan compiled to — fewer
    spans over the same operators means wider fusion.  NB: plans under
    AQE report 0 before first execution (codegen ids appear only in the
    final adaptive plan)."""
    plan = physical_plan(df)
    ids = set()
    for line in plan.splitlines():
        if "codegen id :" in line:
            ids.add(line.rsplit(":", 1)[1].strip().rstrip("]").strip())
    return len(ids)


def plan_summary(df: DataFrame) -> dict:
    """One-call summary for bench/debug output (exact node counts)."""
    nodes = plan_nodes(df)
    return {
        "shuffles": sum(1 for n in nodes if n.startswith("Exchange")),
        "broadcast_joins": sum(1 for n in nodes if n.startswith("BroadcastHashJoin")),
        "sortmerge_joins": sum(1 for n in nodes if n.startswith("SortMergeJoin")),
        "codegen_stages": codegen_stage_count(df),
        "python_evals": sum(
            1
            for n in nodes
            if n.startswith(("ArrowEvalPython", "BatchEvalPython", "MapInPandas"))
        ),
        "scans": sum(1 for n in nodes if n.startswith(("Scan ", "LocalTableScan"))),
    }
