"""Temporal-operator cross-checks that the DuckDB oracle can't cover.

`asof_enrich_cogroup` has no oracle entry (its semantics are identical
to the oracle-checked `asof_enrich`); instead we assert the two plans —
union-window vs cogroup+merge_asof — agree row for row.
"""

from __future__ import annotations

from inverted_index_using_the_map_reduce_paradigm_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def _rows(df):
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_asof_cogroup_matches_window_form(spark):
    qs = load_all()
    window_form = qs["asof_enrich"].fn(spark, SF)
    cogroup_form = qs["asof_enrich_cogroup"].fn(spark, SF)
    assert sorted(window_form.columns) == sorted(cogroup_form.columns)
    a, b = _rows(window_form), _rows(cogroup_form)
    assert len(a) > 0
    assert a == b


def test_range_join_bucketed_equals_naive_nonequi_join(spark):
    """The banded equi-join must return exactly what the naive non-equi
    (nested-loop) formulation returns — banding is an execution
    strategy, never a semantics change."""
    from pyspark.sql import functions as F

    from inverted_index_using_the_map_reduce_paradigm_spark.data import table

    banded = load_all()["range_join_bucketed"].fn(spark, SF)
    ev = table(spark, SF, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.unix_micros("ts").alias("c_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.unix_micros("ts").alias("p_ts")
    )
    naive = (
        purchases.join(
            clicks,
            (F.col("c_ts") >= F.col("p_ts") - 900 * 1_000_000)
            & (F.col("c_ts") < F.col("p_ts")),
            "left",
        )
        .groupBy("event_id")
        .agg(F.count("c_ts").alias("n_recent_clicks"))
    )
    a, b = _rows(banded), _rows(naive)
    assert len(a) > 0
    assert a == b
