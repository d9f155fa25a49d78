"""Physical-plan regression tests (the 100 TB posture, SURVEY.md §4):
pushdown, pruning, and join strategy must survive refactors — a query
that silently loses its PushedFilters or broadcasts would still pass
the value checks while scanning 100x more data at scale.
"""

from __future__ import annotations

from inverted_index_using_the_map_reduce_paradigm_spark.plans import audit
from inverted_index_using_the_map_reduce_paradigm_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def physical_plan(spark, name: str) -> str:
    return audit.physical_plan(load_all()[name].fn(spark, SF))


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


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Tables bucketed on the join key must sort-merge join with zero
    Exchange operators — the write-once-shuffle-never strategy for
    repeated fact-fact joins at scale."""
    from pyspark.sql import functions as F

    from inverted_index_using_the_map_reduce_paradigm_spark.data import table
    from inverted_index_using_the_map_reduce_paradigm_spark.sources.sinks import write_bucketed

    orders = table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    li = table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(orders, "orders_b", "o_orderkey", 8, path=str(tmp_path / "ob"))
    write_bucketed(li, "lineitem_b", "l_orderkey", 8, path=str(tmp_path / "lb"))
    joined = (
        spark.table("lineitem_b")
        .join(
            spark.table("orders_b").hint("merge"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    plan = audit.physical_plan(joined)
    join_part = plan.split("HashAggregate")[-1]  # below the final agg
    assert audit.join_strategies(joined) == ["SortMergeJoin"]
    assert "Exchange hashpartitioning(l_orderkey" not in join_part
    assert "Exchange hashpartitioning(o_orderkey" not in join_part
    # and the result is right
    n = joined.count()
    assert n > 0


def test_similarity_search_broadcasts_queries_not_corpus(spark):
    plan = physical_plan(spark, "similarity_search")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    # the corpus side must not be exchanged for the join itself: no
    # sort-merge join of the full embedding table against queries
    assert "SortMergeJoin" not in plan
