"""Physical-plan audit helpers (SURVEY.md §4).

Used by tests/test_plan_quality.py to pin the plan-shape contracts
(pushdown, pruning, broadcast strategy, bucketed co-location) and
available interactively for tuning sessions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def physical_plan(df: DataFrame) -> str:
    """The executed (post-AQE-prepared) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Every PushedFilters clause appearing in the plan's scans."""
    return [
        line.strip()
        for line in physical_plan(df).splitlines()
        if "PushedFilters" in line
    ]


def join_strategies(df: DataFrame) -> list[str]:
    """Join operator names in plan order (BroadcastHashJoin,
    SortMergeJoin, BroadcastNestedLoopJoin, ShuffledHashJoin)."""
    out = []
    for line in physical_plan(df).splitlines():
        s = line.strip().lstrip("+-: *(0123456789)")
        for j in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
        ):
            if s.startswith(j):
                out.append(j)
    return out


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the plan."""
    return sum(
        1
        for line in physical_plan(df).splitlines()
        if line.strip().lstrip("+-: *").startswith("Exchange")
    )
