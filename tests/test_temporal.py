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


def test_hll_rollup_census_null_ts_symmetric(spark, tmp_path):
    """Null-timestamp day-count invariant (r8): a null ts forms one
    extra per-type 'day' group on BOTH the Spark side (groupBy over
    to_date keeps the null group; n_days counts daily ROWS) and the
    oracle side (count(*) over DISTINCT (type, day) rows — NOT
    count(DISTINCT day), which would skip NULL).  Pinned on a fixture
    with ~14% of timestamps nulled so the alignment can't silently
    regress while real fixtures ship no nulls."""
    import shutil

    import duckdb

    d = tmp_path / "nullts"
    d.mkdir()
    shutil.copy(f"{SF}/events.parquet", d / "_orig.parquet")
    con = duckdb.connect()
    con.sql(
        f"""COPY (
          SELECT event_id, CASE WHEN event_id % 7 = 0 THEN NULL ELSE ts END AS ts,
                 user_id, event_type, value, props
          FROM '{d / "_orig.parquet"}'
        ) TO '{d / "events.parquet"}' (FORMAT PARQUET)"""
    )
    qs = load_all()
    got = (
        qs["hll_rollup_census"].fn(spark, str(d)).toPandas()
        .sort_values("event_type", ignore_index=True)
    )
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{d / 'events.parquet'}'")
    want = (
        con.sql(qs["hll_rollup_census"].oracle).df()
        .sort_values("event_type", ignore_index=True)
    )
    assert list(got["n_days"]) == list(want["n_days"])
    assert got["union_within_tol"].all() and got["union_le_sum_daily"].all()
