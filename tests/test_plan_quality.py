"""Physical-plan regression tests (the 100 TB posture, SURVEY.md §4):
pushdown, pruning, and join strategy must survive refactors — a query
that silently loses its PushedFilters or broadcasts would still pass
the value checks while scanning 100x more data at scale.
"""

from __future__ import annotations

from inverted_index_using_the_map_reduce_paradigm_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def physical_plan(spark, name: str) -> str:
    df = load_all()[name].fn(spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_tpch_q1_pushes_filter_and_prunes_columns(spark):
    plan = physical_plan(spark, "tpch_q1")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the 16-column lineitem scan reads only the 7 used
    assert "l_comment" not in plan and "l_partkey" not in plan


def test_tpch_q3_broadcasts_the_dimension_side(spark):
    plan = physical_plan(spark, "tpch_q3")
    assert "BroadcastHashJoin" in plan
    assert "PushedFilters: [IsNotNull(c_mktsegment), EqualTo(c_mktsegment,BUILDING)" in plan


def test_nation_revenue_is_all_broadcast_dims(spark):
    plan = physical_plan(spark, "nation_revenue")
    # region->nation->customer collapse entirely into broadcast joins;
    # no sort-merge join should appear anywhere in the star lookup
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan


def test_term_lookup_filter_reaches_token_source(spark):
    # the word predicate must sit below the aggregation, not above it
    plan = physical_plan(spark, "term_lookup")
    before_agg = plan.split("HashAggregate")[-1]  # deepest = scan side
    assert "scan" in before_agg  # the literal term constant, pushed down


def test_similarity_search_broadcasts_queries_not_corpus(spark):
    plan = physical_plan(spark, "similarity_search")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the corpus side must not be exchanged for the join itself: no
    # sort-merge join of the full embedding table against queries
    assert "SortMergeJoin" not in plan
