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


_PYTHON_EVAL_OPS = re.compile(
    r"\b(ArrowEvalPython|BatchEvalPython|MapInPandas|"
    r"FlatMapGroupsInPandas|FlatMapCoGroupsInPandas)\b"
)


def python_eval_count(plan_text: str) -> int:
    """Number of Python evaluation operators in a plan dump (the
    ``== Initial Plan ==`` tail of an adaptive dump is ignored).  Each
    occurrence is one full Arrow serialization pass over that subtree's
    rows — the unit the tokenize-once budget counts."""
    return len(_PYTHON_EVAL_OPS.findall(plan_text.split("== Initial Plan ==")[0]))


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

# Tables whose row count scales linearly with the corpus / SF.
# customer/supplier/part are FACTS for this gate (moved from the dim
# map in round 10): TPC-H scales them linearly with SF — at 100
# TB-equivalent part is ~20 B rows and customer ~15 B — so a
# compile-time broadcast hint on any of them pins a build side that
# OOMs every executor at scale, exactly the failure mode this gate
# exists to catch (the repo's own market_basket pin said so while the
# whitelist here contradicted it).  A *filter* on them (brand, LIKE,
# mktsegment, nation membership) selects a constant FRACTION, still
# SF-linear, so filtered subtrees do not qualify either; only a
# genuine cardinality bound (aggregate on a bounded key, LIMIT,
# literal id range) between the hint and the scan does.  At fixture
# scale AQE's runtime size check promotes the same joins to broadcast
# on its own, so dropping the hints changes no executed plan at sf0.1
# while making the 1000-executor plan survivable.
FACT_FIRST_COLS = {
    "l_orderkey": "lineitem",
    "o_orderkey": "orders",
    "doc_id": "documents",
    "vec_id": "embeddings",
    "event_id": "events",
    "c_custkey": "customer",
    "s_suppkey": "supplier",
    "p_partkey": "part",
}

# Explicitly BOUNDED base relations, by first output column: only the
# two constant-cardinality TPC-H enumerations (5 regions, 25 nations —
# fixed by the spec at every SF).  Scans are classified closed-world:
# a LogicalRelation whose first column appears in neither map is
# treated as UNSAFE (fact-like), so a future corpus-scale table that
# nobody adds to FACT_FIRST_COLS cannot slip through the gate as
# broadcastable — the gate fails loud instead of rotting (the dim
# default was inverted in round 7 for exactly this).
DIM_FIRST_COLS = {
    "r_regionkey": "region",
    "n_nationkey": "nation",
}

# Grouping keys whose cardinality is ENUMERATION-sized (tens to
# thousands of values by construction): aggregating a fact table down
# to these keys yields a broadcastable result.  ``word``/``w1``/``w2``
# were removed in r7: Heaps' law keeps the vocabulary sublinear but at
# 100 TB it still reaches 1e7-1e8 rows (multi-GB serialized — see
# SCALE.md "Vocabulary growth"), so word-keyed aggregates are NOT
# broadcast-safe and their joins go unhinted (AQE decides at runtime).
BOUNDED_GROUP_KEYS = {
    "lang",
    "source",
    "m_source",
    "event_type",
    "label",
    "letter",  # 26 by the reference's alphabet
    "hour",  # 24
    "cell",  # LSH cells: 2^n_bits by construction
    "cluster",  # K-means: K values by construction
    "dim",  # embedding dimension index: model-width values
}

# Dense primary-id columns: ``id < literal`` selects at most that many
# rows — the standard fixture idiom for a fixed query set.
_BOUNDABLE_IDS = re.compile(r"^(vec_id|doc_id|query_id)#\d+L?$")


def _children(node) -> list:
    seq = node.children()
    return [seq.apply(i) for i in range(seq.size())]


def _conjuncts(expr) -> list:
    """Top-level AND-split of a condition expression.  Anything under
    an Or/Not stays inside its own conjunct unsplit, so a bound buried
    in a disjunction (``vec_id < 10 OR big``) or negation cannot
    masquerade as a whole-condition bound."""
    if expr.getClass().getSimpleName() == "And":
        out: list = []
        for kid in _children(expr):
            out.extend(_conjuncts(kid))
        return out
    return [expr]


def _is_literal(expr) -> bool:
    cls = expr.getClass().getSimpleName()
    if cls == "Literal":
        return True
    if cls == "Cast":  # cast(10 as bigint) — still a literal bound
        return _is_literal(_children(expr)[0])
    return False


def _literal_id_bound(cond) -> bool:
    """True iff some TOP-LEVEL conjunct of the condition is
    ``<dense-id> < <literal>`` — walked on the expression tree, not a
    substring match, so ``NOT(vec_id < 10)`` and ``vec_id < 10 OR p``
    (corpus-proportional) do not qualify.  Modulo slices
    (``vec_id % 10 = 0``) never match: the left side must be the bare
    id attribute."""
    for c in _conjuncts(cond):
        if c.getClass().getSimpleName() != "LessThan":
            continue
        left, right = _children(c)
        if _BOUNDABLE_IDS.match(left.toString()) and _is_literal(right):
            return True
    return False


def _scan_table(node) -> str | None:
    """Classify a LogicalRelation by its first output column (the
    synthetic tables have disjoint leading columns): returns the fact
    table name for known facts, ``None`` for explicitly bounded dims —
    and, closed-world, an ``"unknown:<col>"`` fact-like marker for any
    relation in neither map, so unclassified tables default to unsafe."""
    out = node.output()
    if out.size() == 0:
        return None
    first = out.apply(0).name()
    if first in DIM_FIRST_COLS:
        return None
    return FACT_FIRST_COLS.get(first, f"unknown:{first}")


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
    if cls == "Filter" and _literal_id_bound(node.condition()):
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


# Expression heads that mark a corpus-expensive computation (the
# tokenizer chain, shingle/bigram construction, char-level scans).
_HEAVY_EXPR_MARKS = (
    "regexp_replace(translate",
    "size(filter(split",
    "regexp_extract_all",
    "transform(slice",
)


def inferred_nullcheck_scan_waste(plan_text: str) -> list[str]:
    """Scan-level ``isnotnull(<heavy expr>)`` conjuncts: the silent
    cost-doubler found on token_budget_select and quality_filter —
    a join or null-rejecting comparison on a key DERIVED from an
    expensive expression makes Catalyst infer ``isnotnull(key)`` and
    push it into the parquet scan's DataFilters, where it evaluates
    the whole expression once per row just to test non-null (the
    projection then recomputes it).  Semantic predicates over the same
    expressions (``size(...) > 0``, quality thresholds) are NOT
    flagged: those prune rows and belong in the scan.  Fix at the
    source: ``F.coalesce(expr, lit(sentinel))`` makes the derived
    column non-nullable, so the constraint is never inferred.

    Returns one descriptive string per offending FileScan line.
    """
    out = []
    for ln in plan_text.splitlines():
        if "FileScan" not in ln or "DataFilters: [" not in ln:
            continue
        filters = ln.split("DataFilters: [", 1)[1]
        for m in re.finditer(r"isnotnull\(", filters):
            start = m.end()
            depth, i = 1, start
            while i < len(filters) and depth:
                if filters[i] == "(":
                    depth += 1
                elif filters[i] == ")":
                    depth -= 1
                i += 1
            inner = filters[start : i - 1]
            if any(h in inner for h in _HEAVY_EXPR_MARKS):
                out.append("isnotnull over heavy expr in scan: " + inner[:80])
                break
    return out
