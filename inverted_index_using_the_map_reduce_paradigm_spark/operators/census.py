"""Census queries: the approx/sketch family's guarantees, driver-checked.

The approx operators (MinHash-LSH, RP-LSH / IVF ANN, HLL / quantile
sketches) cannot carry a SQL oracle for their OUTPUT — banding and
sketch binaries are engine-specific — so until round 5 their recall /
error-bound guarantees lived only in local tests.  Each census here
recomputes the EXACT counterpart inside the same query, compares, and
emits a summary whose every value a DuckDB oracle derives
independently from the raw tables — so the external driver
hash-checks the guarantee itself:

* ``minhash_recall_census`` — set EQUALITY of LSH pairs vs exact
  Jaccard pairs (recall is 1.0 at fixture scale; any missed or
  spurious pair breaks the hash).
* ``ann_rp_recall_census`` — per query: result-count contract and a
  found-a-true-neighbor floor for the RP-LSH path.
* ``ann_ivf_recall_census`` — aggregate recall floor for the IVF path
  (one fixture query legitimately has 0 recall at nprobe=2, so the
  floor is corpus-level by design).
* ``sketch_error_census`` — HLL++ distinct-count and quantile-summary
  estimates within declared tolerance per event_type.
* ``hll_rollup_census`` — the union-of-daily-sketches rollup within
  tolerance of the exact distinct count, plus the union <= naive-sum
  structural bound.

The reference has no approximate operators at all
(``/root/reference/main.c++`` is exact end to end); this pattern is
engine-side verification infrastructure for the 100 TB extensions.
Scale shape: each census is strictly the union of its two parents'
plans plus a small join/aggregate on their (tiny) outputs — the exact
side is the expensive half, which is why these are verification
queries, not the production path — which is also why every census
registers ``bench=False``: their exact-recompute halves would otherwise
dominate bench.py's headline timings with verification-only cost (the
same convention the streaming verification queries follow).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import table
from ..registry import register
from .dedup import NGRAM_JACCARD_ORACLE, jaccard_pairs, minhash_pairs
from .similarity import (
    N_QUERIES,
    TOP_K,
    q_similarity_search,
    q_similarity_search_ivf,
    q_similarity_search_rp,
)
from .temporal import q_hll_union_rollup

# Declared tolerances (probed at sf0.001 and sf0.01: HLL++ rsd=2% is
# exact at fixture cardinalities, quantile error <= 0.61%; the bounds
# leave ~10x headroom without becoming vacuous).
HLL_REL_TOL = 0.06  # 3x the requested rsd
MEDIAN_REL_TOL = 0.02
IVF_RECALL_FLOOR = 0.3  # aggregate over all queries; measured 0.6


@register(
    "minhash_recall_census",
    oracle=f"""
WITH exact AS ({NGRAM_JACCARD_ORACLE})
SELECT count(*) AS n_lsh,
       count(*) AS n_exact,
       count(*) AS n_matched,
       CAST(0 AS BIGINT) AS n_missed,
       CAST(0 AS BIGINT) AS n_spurious,
       round(min(jaccard), 6) AS min_jaccard
FROM exact
""",
    description="driver-checked set equality of MinHash-LSH pairs vs exact Jaccard pairs",
    bench=False,
    tags=("dedup", "approx", "census"),
)
def q_minhash_recall_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer-joins the LSH pair set against an independent exact
    recompute and aggregates to one row.  The oracle computes the same
    row assuming PERFECT recall (n_missed = n_spurious = 0, every
    count equal), so the driver's hash check fails iff banding ever
    misses a true pair (recall < 1.0) or the exact-verify step ever
    leaks a false one (precision < 1.0) at fixture scale — the
    guarantee ``tests/test_dedup.py`` asserts locally, moved onto the
    driver's surface."""
    docs = table(spark, sf_dir, "documents")
    lsh = minhash_pairs(docs).select(
        "doc_a", "doc_b", F.col("jaccard").alias("j_lsh")
    )
    exact = jaccard_pairs(docs).select(
        "doc_a", "doc_b", F.col("jaccard").alias("j_ex")
    )
    both = lsh.join(exact, ["doc_a", "doc_b"], "full_outer")
    return both.agg(
        F.count("j_lsh").alias("n_lsh"),
        F.count("j_ex").alias("n_exact"),
        F.count(
            F.when(F.col("j_lsh").isNotNull() & F.col("j_ex").isNotNull(), 1)
        ).alias("n_matched"),
        F.count(F.when(F.col("j_lsh").isNull(), 1)).alias("n_missed"),
        F.count(F.when(F.col("j_ex").isNull(), 1)).alias("n_spurious"),
        F.round(F.min("j_ex"), 6).alias("min_jaccard"),
    )


@register(
    "ann_rp_recall_census",
    oracle=f"""
SELECT vec_id AS query_id,
       CAST({TOP_K} AS BIGINT) AS n_ann,
       TRUE AS found_true_neighbor
FROM embeddings WHERE vec_id < {N_QUERIES}
""",
    description="per-query RP-LSH contract: exactly k results, >=1 true top-k neighbor",
    bench=False,
    tags=("similarity", "approx", "census"),
)
def q_ann_rp_recall_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per query: the RP path must return exactly TOP_K results (its
    bucket candidate pool never starves at fixture scale) and at least
    one of them must be in the TRUE exact top-k (measured per-query
    recall >= 0.2; the floor of 1 hit is what survives seed jitter).
    The oracle predicts (k, TRUE) for every query id, so any query
    whose RP recall collapses to zero flips its row and fails the
    driver hash."""
    exact = q_similarity_search(spark, sf_dir).select("query_id", "neighbor_id")
    rp = q_similarity_search_rp(spark, sf_dir).select("query_id", "neighbor_id")
    hits = rp.join(exact, ["query_id", "neighbor_id"], "left_semi")
    n_ann = rp.groupBy("query_id").agg(F.count("*").alias("n_ann"))
    n_hit = hits.groupBy("query_id").agg(F.count("*").alias("n_hit"))
    return (
        n_ann.join(n_hit, "query_id", "left")
        .select(
            "query_id",
            "n_ann",
            (F.coalesce(F.col("n_hit"), F.lit(0)) >= 1).alias(
                "found_true_neighbor"
            ),
        )
    )


@register(
    "ann_ivf_recall_census",
    oracle=f"""
SELECT count(*) AS n_queries,
       CAST(count(*) * {TOP_K} AS BIGINT) AS n_results,
       TRUE AS recall_floor_met
FROM embeddings WHERE vec_id < {N_QUERIES}
""",
    description=f"aggregate IVF contract: k results per query, corpus recall >= {IVF_RECALL_FLOOR}",
    bench=False,
    tags=("similarity", "approx", "census"),
)
def q_ann_ivf_recall_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate census for the IVF path: per-query floors don't hold
    (a query whose cell neighborhood excludes all true neighbors has 0
    recall at nprobe=2 — seen at sf0.001), so the driver-checked bound
    is corpus-level: total true-top-k hits across all queries >= 30%
    of the attainable maximum (measured 0.6).  Result counts stay
    per-query-exact: n_results must be exactly k * n_queries."""
    exact = q_similarity_search(spark, sf_dir).select("query_id", "neighbor_id")
    ivf = q_similarity_search_ivf(spark, sf_dir).select("query_id", "neighbor_id")
    hits = ivf.join(exact, ["query_id", "neighbor_id"], "left_semi")
    floor = int(IVF_RECALL_FLOOR * N_QUERIES * TOP_K)
    return ivf.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count("*").alias("n_results"),
    ).crossJoin(
        hits.agg((F.count("*") >= floor).alias("recall_floor_met"))
    )


@register(
    "sketch_error_census",
    oracle="""
SELECT event_type,
       count(*) AS n_events,
       TRUE AS users_within_tol,
       TRUE AS median_within_tol
FROM events GROUP BY event_type
""",
    description="HLL++ and approx-percentile estimates within declared tolerance per event type",
    bench=False,
    tags=("temporal", "sketch", "census"),
)
def q_sketch_error_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recomputes the exact aggregates next to the sketch forms of
    ``event_type_sketches`` and emits per-type booleans: HLL++ distinct
    users within 3x the requested rsd, approx median within 2%
    relative.  n_events is exact (predicted by the oracle from the raw
    table), so the row set can't degenerate silently."""
    ev = table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users"),
        F.expr("percentile(value, 0.5)").alias("exact_median"),
        F.count("*").alias("n_events"),
    )
    approx = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("approx_median"),
    )
    j = exact.join(approx, "event_type")
    users_ok = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        / F.col("exact_users")
        <= HLL_REL_TOL
    )
    median_ok = (
        F.abs(F.col("approx_median") - F.col("exact_median"))
        / F.abs(F.col("exact_median"))
        <= MEDIAN_REL_TOL
    )
    return j.select(
        "event_type",
        "n_events",
        users_ok.alias("users_within_tol"),
        median_ok.alias("median_within_tol"),
    )


@register(
    "hll_rollup_census",
    # n_days counts DISTINCT-day ROWS (not count(DISTINCT day), which
    # would skip NULL) because the Spark side's groupBy(to_date(ts))
    # keeps a null-day group — the two sides must agree even if a
    # future fixture ships null timestamps.
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       TRUE AS union_within_tol,
       TRUE AS union_le_sum_daily
FROM (SELECT DISTINCT event_type, CAST(ts AS DATE) AS day FROM events)
GROUP BY event_type
""",
    description="union-of-daily-HLL rollup within tolerance of exact distincts, union <= naive sum",
    bench=False,
    tags=("temporal", "sketch", "census"),
)
def q_hll_rollup_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeable-rollup guarantee on the driver surface: the
    unioned daily DataSketches estimate must land within 3x-rsd of the
    exact per-type distinct count, and must not exceed the naive
    sum-of-daily counts it deduplicates (a user active on two days is
    one user).  n_days is exact, oracle-predicted from raw events."""
    rollup = q_hll_union_rollup(spark, sf_dir)
    ev = table(spark, sf_dir, "events")
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    j = rollup.join(exact, "event_type")
    union_ok = (
        F.abs(F.col("approx_users") - F.col("exact_users"))
        / F.col("exact_users")
        <= HLL_REL_TOL
    )
    return j.select(
        "event_type",
        "n_days",
        union_ok.alias("union_within_tol"),
        (F.col("approx_users") <= F.col("sum_daily")).alias(
            "union_le_sum_daily"
        ),
    )
