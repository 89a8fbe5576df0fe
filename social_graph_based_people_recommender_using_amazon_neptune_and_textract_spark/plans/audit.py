"""Physical-plan audit helpers — the engine's "is this the plan I'd want
at 100 TB?" checks (SURVEY §4).

The reference delegates planning to ES/Neptune; our equivalent discipline
is asserting that Catalyst produced the intended physical shape: small
dimensions broadcast (no shuffle of the big side), filters and column
pruning reach the parquet scan, top-k compiles to TakeOrderedAndProject
(never a global sort), and shuffle counts stay at the declared minimum.
tests/test_plans.py pins these properties so a refactor that silently
de-optimizes a plan fails CI, not the cluster.

Parsing ``explain(formatted)`` text is deliberate: it is the same
artifact a human reads, so a failing assertion prints exactly what to
look at.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def _node_ids(plan: str, op_pattern: str) -> set[str]:
    """Distinct plan-node ids for an operator. The formatted tree repeats
    cached (InMemoryRelation) subtrees at every consumer — counting ids
    instead of lines avoids double-counting work that runs once."""
    return set(re.findall(rf"\b{op_pattern}[^(\n]*\((\d+)\)", plan))


def exchange_count(df: DataFrame) -> int:
    """Number of distinct shuffle exchanges (broadcast exchanges excluded)."""
    plan = physical_plan(df)
    return len(_node_ids(plan, r"(?<!Broadcast)Exchange "))


def broadcast_join_count(df: DataFrame) -> int:
    return len(_node_ids(physical_plan(df), r"BroadcastHashJoin"))


def sort_merge_join_count(df: DataFrame) -> int:
    return len(_node_ids(physical_plan(df), r"SortMergeJoin"))


def has_take_ordered(df: DataFrame) -> bool:
    return "TakeOrderedAndProject" in physical_plan(df)


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries across all parquet scans in the plan."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", physical_plan(df)):
        entry = m.group(1).strip()
        if entry:
            out.extend(s.strip() for s in entry.split(","))
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters entries across file scans (partition pruning)."""
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", physical_plan(df)):
        entry = m.group(1).strip()
        if entry:
            out.extend(s.strip() for s in entry.split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[set[str]]:
    """Column sets actually read by each parquet scan (pruning check)."""
    cols: list[set[str]] = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", physical_plan(df)):
        fields = m.group(1)
        cols.append(
            {f.split(":")[0].strip() for f in fields.split(",") if f.strip()}
        )
    return cols


def estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's size estimate for ``df``'s optimized plan, in bytes —
    the same statistic the planner's own broadcast decision reads.
    Without CBO column stats it is a crude propagation of file sizes
    through the operators, which errs LARGE (an aggregate inherits its
    child's size) — the safe direction for gating a broadcast hint:
    an overestimate falls back to a shuffle join that AQE can still
    convert to broadcast at runtime, while an unconditional hint on a
    giant relation is honored unconditionally and OOMs the driver."""
    return int(
        str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
