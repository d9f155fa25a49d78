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


def final_adaptive_plan(df: DataFrame) -> str:
    """The plan AFTER running the query: under AQE, stage-level
    decisions (exchange reuse, skew splits, runtime join demotion) only
    appear once the AdaptiveSparkPlan has executed — the static text
    from ``physical_plan`` can't show them.  ``collect`` (not a noop
    write) because only an action on the DataFrame's OWN QueryExecution
    mutates its AdaptiveSparkPlan in place; callers pass fixture-scale
    queries."""
    df.collect()
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
