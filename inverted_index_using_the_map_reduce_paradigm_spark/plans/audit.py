"""Physical-plan audit helpers (SURVEY.md §4).

Used by tests/test_plan_quality.py to pin the plan-shape contracts
(pushdown, pruning, broadcast strategy, bucketed co-location) and
available interactively for tuning sessions.
"""

from __future__ import annotations

import re

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


# --------------------------------------------------------------------------
# Broadcast-hint scale audit: no corpus-proportional side may be pinned
# to broadcast.  This closes the recurring finding class from rounds
# 4-5 (contamination_check eval side, market_basket supports): a
# compile-time F.broadcast on an input that grows with the data OOMs
# every executor at 100 TB even though it is oracle-correct at fixture
# scale.  Bounded sides (dim tables, global aggregates, vocab-keyed
# aggregates, LIMITed subtrees) may hint; everything else must leave
# the decision to AQE's runtime size check.
# --------------------------------------------------------------------------

# Tables whose row count scales linearly with the corpus / SF.  The
# classic TPC-H dims (region, nation, customer, supplier, part) are
# treated as broadcastable reference data: region/nation are constant
# and customer/supplier/part are the conventional filtered-dim
# broadcast sides of the TPC-H plans (GB-scale vs the 100 TB facts).
FACT_FIRST_COLS = {
    "l_orderkey": "lineitem",
    "o_orderkey": "orders",
    "doc_id": "documents",
    "vec_id": "embeddings",
    "event_id": "events",
}

# Grouping keys whose cardinality is vocabulary/enumeration-sized, not
# corpus-sized: aggregating a fact table down to these keys yields a
# broadcastable result (Heaps-law vocab, language codes, source names,
# event types, class labels, 26 letters, 24 hours, LSH cells).
BOUNDED_GROUP_KEYS = {
    "word",
    "w1",
    "w2",
    "lang",
    "source",
    "m_source",
    "event_type",
    "label",
    "letter",
    "hour",
    "cell",
    "cluster",  # K-means: K values by construction
    "dim",  # embedding dimension index: model-width values
}

# A Filter whose condition upper-bounds a dense primary id by a
# literal (``vec_id < 10``) selects at most that many rows — the
# standard fixture idiom for a fixed query set.  Modulo slices
# (``vec_id % 10 = 0``) deliberately do NOT match: they are
# corpus-proportional.
_LITERAL_ID_BOUND = re.compile(
    r"\b(vec_id|doc_id|query_id)#\d+L? < (cast\()?\d+"
)


def _children(node) -> list:
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def _scan_table(node) -> str | None:
    """Which base table a LogicalRelation reads, by its first output
    column (the synthetic tables have disjoint leading columns)."""
    out = node.output()
    if out.size() == 0:
        return None
    return FACT_FIRST_COLS.get(out.apply(0).name())


def _agg_keys(node) -> set[str]:
    ge = node.groupingExpressions()
    return {
        ge.apply(i).toString().split("#")[0].rsplit(".", 1)[-1]
        for i in range(ge.size())
    }


def _subtree_safe(node) -> bool:
    """True if every path from this node down to a fact-table scan
    passes through a cardinality-bounding operator (global aggregate,
    bounded-key aggregate, or LIMIT)."""
    cls = node.getClass().getSimpleName()
    if cls == "Aggregate":
        keys = _agg_keys(node)
        if keys <= BOUNDED_GROUP_KEYS:  # empty set (global agg) included
            return True
    if cls in ("GlobalLimit", "LocalLimit"):
        return True
    if cls == "Filter" and _LITERAL_ID_BOUND.search(node.condition().toString()):
        return True
    if cls == "LogicalRelation":
        return _scan_table(node) is None
    kids = _children(node)
    return all(_subtree_safe(k) for k in kids)


def broadcast_hint_violations(df: DataFrame) -> list[str]:
    """Every broadcast hint in the analyzed logical plan whose subtree
    reads a fact table without a cardinality bound in between.  Returns
    one human-readable line per violation (empty list = clean)."""
    out: list[str] = []

    def walk(node):
        cls = node.getClass().getSimpleName()
        if cls == "ResolvedHint" and "broadcast" in str(node.hints().strategy()):
            child = _children(node)[0]
            if not _subtree_safe(child):
                out.append(
                    "broadcast hint over unbounded fact-derived input: "
                    + child.getClass().getSimpleName()
                )
                return  # don't double-report nested hints
        for k in _children(node):
            walk(k)

    walk(df._jdf.queryExecution().analyzed())
    return out


def broadcast_hint_count(df: DataFrame) -> int:
    """Number of explicit broadcast hints surviving analysis."""
    n = 0

    def walk(node):
        nonlocal n
        cls = node.getClass().getSimpleName()
        if cls == "ResolvedHint" and "broadcast" in str(node.hints().strategy()):
            n += 1
        for k in _children(node):
            walk(k)

    walk(df._jdf.queryExecution().analyzed())
    return n
