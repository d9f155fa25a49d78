"""Self-validation for the approx dedup operators (SURVEY.md §5.2):
the LSH paths have no SQL oracle, so we check them against the exact
(oracle-checked) ``ngram_jaccard_dedup`` result and their own declared
invariants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from inverted_index_using_the_map_reduce_paradigm_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def pairs(df):
    return {(r.doc_a, r.doc_b) for r in df.collect()}


def test_minhash_is_subset_of_exact_with_high_recall(spark):
    qs = load_all()
    exact = pairs(qs["ngram_jaccard_dedup"].fn(spark, SF))
    lsh = pairs(qs["minhash_lsh_dedup"].fn(spark, SF))
    # precision 1.0 by construction (exact verify step)
    assert lsh <= exact
    # banding with 4 bands x 4 rows at J>=0.5 should catch most true pairs
    assert len(exact) > 0
    assert len(lsh) / len(exact) >= 0.8, (len(lsh), len(exact))


def test_minhash_pairs_truly_exceed_threshold(spark):
    qs = load_all()
    df = qs["minhash_lsh_dedup"].fn(spark, SF)
    assert df.filter(F.col("jaccard") < 0.5).count() == 0


def test_simhash_pairs_ordered_and_bounded(spark):
    qs = load_all()
    rows = qs["simhash_dedup"].fn(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0 <= r.hamming <= 3


def test_exact_dedup_keeps_every_distinct_content(spark):
    qs = load_all()
    out = qs["exact_dedup"].fn(spark, SF)
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    n_distinct = docs.select("text").distinct().count()
    assert out.count() == n_distinct


def test_connected_components_chain_and_clique(spark):
    from pyspark.sql import Row

    from inverted_index_using_the_map_reduce_paradigm_spark.operators.dedup import (
        connected_components,
    )

    # chain 1-2-3-4 (diameter 3, needs multiple propagation rounds),
    # triangle 10-11-12, isolated pair 20-21
    und = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)]
    edges = spark.createDataFrame(
        [Row(src=a, dst=b) for a, b in und] + [Row(src=b, dst=a) for a, b in und]
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
