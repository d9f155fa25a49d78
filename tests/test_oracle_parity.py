"""Sketch-accuracy check lives in this file too (bottom): sketches have
no cross-engine oracle, so they validate against exact recomputation
within tolerance.

Mimics the driver's correctness gate locally: every registered query
with an oracle runs on Spark AND DuckDB at sf0.001; results must match
on row count, column names, and (order-insensitively) values.

This is deliberately stricter than eyeballing: it sorts columns by name
and rows by all columns, then compares cell-by-cell with a small float
tolerance (the driver hashes after rounding; we round in the queries
themselves so exact match is the expectation).
"""

from __future__ import annotations

import pandas as pd
import pytest

from inverted_index_using_the_map_reduce_paradigm_spark.parity import (
    duck_con,
    normalize,
)
from inverted_index_using_the_map_reduce_paradigm_spark.registry import load_all

SF = "/root/testdata/sf0.001"


# Census queries are VERIFICATION rows (brute-force n² re-checks of a
# banded/bucketed production path — the same taxonomy bench_excluded
# documents); their parity runs are the most expensive tests in the
# suite (r14 durations: 19-40 s each, ~250 s total) while re-verifying
# the CHECKER, not the engine.  Mark them `slow` so the default suite
# fits the round driver's verify window (VERDICT r13 item 4); the full
# tier still runs with `pytest -m "slow or not slow"` (the builder's
# in-session gate before committing operator changes), and the driver's
# own oracle sampling checks census rows independently of this suite.
ORACLE_QUERIES = [
    pytest.param(
        n,
        q,
        id=n,
        marks=(pytest.mark.slow,) if "census" in q.tags else (),
    )
    for n, q in load_all().items()
    if q.oracle
]


@pytest.mark.parametrize("name,q", ORACLE_QUERIES)
def test_parity(spark, name, q):
    got = normalize(q.fn(spark, SF).toPandas())
    con = duck_con(SF)
    want = normalize(con.sql(q.oracle).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    if not got.equals(want):
        diff = (got != want).any(axis=1)
        sample = pd.concat(
            [got[diff].head(5).add_prefix("spark_"), want[diff].head(5).add_prefix("duck_")],
            axis=1,
        )
        raise AssertionError(f"{name}: value mismatch on {int(diff.sum())} rows\n{sample}")


def test_sketches_within_tolerance_of_exact(spark):
    """HLL++ and approx_percentile have no cross-engine oracle; they
    must land within their configured error bounds of the exact
    (oracle-checked) event_type_stats values."""
    qs = load_all()
    exact = {
        r.event_type: r
        for r in qs["event_type_stats"].fn(spark, SF).collect()
    }
    sketch = {
        r.event_type: r
        for r in qs["event_type_sketches"].fn(spark, SF).collect()
    }
    assert set(sketch) == set(exact)
    for et, s in sketch.items():
        e = exact[et]
        assert abs(s.approx_users - e.n_users) / e.n_users <= 0.05, et
        # t-digest with accuracy=10000 on ~hundreds of rows is near-exact
        assert abs(s.approx_median - e.median_value) <= 0.05 * max(
            abs(e.median_value), 1.0
        ), et


def test_hll_union_rollup_merges_within_tolerance(spark):
    """The merged-sketch estimate must land within HLL tolerance of the
    exact per-type distinct count, and at or below the naive
    sum-of-daily-distincts it exists to correct."""
    qs = load_all()
    exact = {
        r.event_type: r.n_users
        for r in qs["event_type_stats"].fn(spark, SF).collect()
    }
    rolled = {r.event_type: r for r in qs["hll_union_rollup"].fn(spark, SF).collect()}
    assert set(rolled) == set(exact)
    for et, r in rolled.items():
        assert abs(r.approx_users - exact[et]) / exact[et] <= 0.05, et
        # a user active on several days inflates the naive sum, never
        # the union (allow HLL estimation jitter of a few percent)
        assert r.approx_users <= r.sum_daily * 1.05, et
