"""Invariant tests for the round-3 curation/analytics operators.

Oracle parity (test_oracle_parity) proves cross-engine equality; these
pin the *semantic* properties that equality alone would not catch if
both sides drifted together.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from inverted_index_using_the_map_reduce_paradigm_spark.operators.similarity import (
    OUTLIER_BOTTOM_K,
    QUANT_LEVELS,
)
from inverted_index_using_the_map_reduce_paradigm_spark.operators.training import (
    PR_DAMPING,
)
from inverted_index_using_the_map_reduce_paradigm_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def test_word_pagerank_is_a_probability_like_distribution(spark):
    rows = load_all()["word_pagerank"].fn(spark, SF).collect()
    total = sum(r.pagerank for r in rows)
    assert all(r.pagerank > 0 for r in rows)
    # with no dangling nodes mass is conserved; dangling nodes only
    # leak mass, never create it
    assert total <= 1.0 + 1e-6
    assert total > (1 - PR_DAMPING)  # the teleport floor alone


def test_embedding_quantize_error_within_step_bound(spark):
    """Scalar quantization error per dim is at most step/2, so the MSE
    cannot exceed max_step^2 / 4 — the bound that makes int8 codes safe
    to score on."""
    import duckdb

    max_step = duckdb.sql(
        f"""
        WITH e AS (SELECT CAST(unnest(embedding) AS DOUBLE) x,
                          generate_subscripts(embedding, 1) dim
                   FROM '{SF}/embeddings.parquet'),
        s AS (SELECT (max(x) - min(x)) / {QUANT_LEVELS} AS step
              FROM e GROUP BY dim)
        SELECT max(step) FROM s
        """
    ).fetchall()[0][0]
    rows = load_all()["embedding_quantize"].fn(spark, SF).collect()
    bound_ppm = (max_step**2 / 4) * 1e6 * 1.001  # rounding headroom
    assert rows
    for r in rows:
        assert 0.0 <= r.mse_ppm <= bound_ppm


def test_embedding_outliers_emits_exactly_bottom_k_per_label(spark):
    df = load_all()["embedding_outliers"].fn(spark, SF)
    per_label = df.groupBy("label").agg(
        F.count("*").alias("n"), F.max("rank").alias("mx")
    )
    for r in per_label.collect():
        assert r.n == OUTLIER_BOTTOM_K and r.mx == OUTLIER_BOTTOM_K


def test_duplicate_ngram_spans_flags_identical_docs(spark, tmp_path):
    """Two byte-identical docs share every shingle: dup_frac must be
    exactly 1.0 for both; a doc of unique words shares none."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta", "en", "s", 36),
            (2, "alpha beta gamma delta epsilon zeta", "en", "s", 36),
            (3, "unique words appear nowhere else here", "en", "s", 37),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    docs.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r.doc_id: r
        for r in load_all()["duplicate_ngram_spans"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert out[1].dup_frac == 1.0 and out[1].flagged
    assert out[2].dup_frac == 1.0 and out[2].flagged
    assert out[3].dup_frac == 0.0 and not out[3].flagged


def test_ngram_lm_score_ranks_templated_text_above_gibberish(spark, tmp_path):
    """A document made of the corpus's dominant bigrams must outscore a
    document whose bigrams each occur once — the whole point of a
    perplexity-style filter."""
    common = "the quick brown fox " * 10
    rows = [(i, common.strip(), "en", "s", len(common)) for i in range(1, 9)]
    rows.append((9, "zeta omega kappa lambda sigma tau phi", "en", "s", 37))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    out = {
        r.doc_id: r.lm_score
        for r in load_all()["ngram_lm_score"].fn(spark, str(tmp_path)).collect()
    }
    assert all(math.isfinite(v) and v < 0 for v in out.values())
    assert out[1] > out[9]


def test_bpe_vocab_merges_contract_the_symbol_stream(spark):
    """Each merge must shrink the corpus's total symbol count by the
    number of non-overlapping occurrences it collapses: strictly
    positive, and never more than the (overlap-counting) pair_freq.
    Re-applying the learned merge table reproduces the contraction —
    the no-oracle verification for the data-dependent loop."""
    from inverted_index_using_the_map_reduce_paradigm_spark.data import table
    from inverted_index_using_the_map_reduce_paradigm_spark.functions.text import (
        tokenize_documents,
    )

    merges = load_all()["bpe_vocab"].fn(spark, SF).collect()
    assert 0 < len(merges) <= 10
    assert [m.merge_rank for m in merges] == list(range(1, len(merges) + 1))

    wf = (
        tokenize_documents(table(spark, SF, "documents"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .collect()
    )
    words = {r.word: r.freq for r in wf}

    def apply_merge(seq, left, right):
        out = []
        for s in seq:
            if out and out[-1] == left and s == right:
                out[-1] = left + right
            else:
                out.append(s)
        return out

    seqs = {w: list(w) for w in words}
    total = sum(len(s) * words[w] for w, s in seqs.items())
    for m in merges:
        seqs = {w: apply_merge(s, m.left, m.right) for w, s in seqs.items()}
        new_total = sum(len(s) * words[w] for w, s in seqs.items())
        shrink = total - new_total
        assert 0 < shrink <= m.pair_freq, (m, shrink)
        total = new_total


def test_bpe_encode_equals_canonical_min_rank_bpe(spark):
    """q_bpe_encode applies merges sequentially (one full pass per
    rank); the canonical tokenizer algorithm instead repeatedly merges
    the LOWEST-RANK pair present anywhere.  For a learned-order table
    the two are equivalent — prove it on the live sf0.001 vocabulary
    by re-encoding every distinct word with the canonical algorithm in
    plain Python and comparing the weighted token counts."""
    from collections import Counter

    from inverted_index_using_the_map_reduce_paradigm_spark.data import table
    from inverted_index_using_the_map_reduce_paradigm_spark.functions.text import (
        tokenize_documents,
    )
    from inverted_index_using_the_map_reduce_paradigm_spark.operators.training import (
        BPE_ENCODE_TABLE,
        BPE_ENCODE_TOPK,
    )

    rank = {pair: i for i, pair in enumerate(BPE_ENCODE_TABLE)}

    def canonical(word: str) -> list[str]:
        seq = list(word)
        while True:
            best, best_i = None, None
            for i in range(len(seq) - 1):
                r = rank.get((seq[i], seq[i + 1]))
                if r is not None and (best is None or r < best):
                    best, best_i = r, i
            if best is None:
                return seq
            seq[best_i : best_i + 2] = [seq[best_i] + seq[best_i + 1]]

    wf = (
        tokenize_documents(table(spark, SF, "documents"))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .collect()
    )
    counts: Counter[str] = Counter()
    for r in wf:
        for tok in canonical(r.word):
            counts[tok] += r.freq
    want = sorted(
        counts.items(), key=lambda kv: (-kv[1], kv[0])
    )[:BPE_ENCODE_TOPK]
    got = [
        (r.token, r.n_occurrences)
        for r in load_all()["bpe_encode"].fn(spark, SF).collect()
    ]
    assert got == want
    # and the table really exercises multi-level merges on this corpus
    assert any("|" not in t and len(t) >= 3 for t, _ in got)


def test_bpe_vocab_is_deterministic(spark):
    a = [tuple(r) for r in load_all()["bpe_vocab"].fn(spark, SF).collect()]
    b = [tuple(r) for r in load_all()["bpe_vocab"].fn(spark, SF).collect()]
    assert a == b


def test_sequence_packing_shard_decomposition_matches_single_window(spark):
    """The sharded prefix sum must be bit-identical to the single-window
    definition on an adversarial doc_id layout: ids chosen to straddle
    shard boundaries (127/128/129...), collide mid-shard, and leave
    whole shards empty.  The reference result is computed in plain
    Python (per-lang running sum in doc_id order)."""
    from collections import defaultdict

    from inverted_index_using_the_map_reduce_paradigm_spark.operators.training import (
        SEQ_BUDGET,
        SEQ_SHARD_DOCS,
        q_sequence_packing,
    )

    ids = [1, 2, 126, 127, 128, 129, 255, 256, 257, 640, 641, 1023, 1024, 2000]
    rows = []
    for j, i in enumerate(ids):
        lang = "aa" if j % 3 else "bb"
        rows.append((i, lang, "tok " * (7 * (j + 1) % 40 + 1)))
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    assert max(ids) // SEQ_SHARD_DOCS >= 3  # really exercises >1 shard

    import inverted_index_using_the_map_reduce_paradigm_spark.operators.training as tr_mod

    orig = tr_mod.table  # training.py binds the symbol at import time
    tr_mod.table = lambda spark_, sf, name: docs  # the op reads 'documents'
    try:
        got = {
            (r.lang, r.seq_id): (r.n_docs, r.seq_tokens, r.first_doc, r.last_doc)
            for r in q_sequence_packing(spark, "ignored").collect()
        }
    finally:
        tr_mod.table = orig

    # plain-Python reference: unsharded per-lang running sum
    toks = {i: len(("tok " * (7 * (j + 1) % 40 + 1)).split()) for j, i in enumerate(ids)}
    want: dict = {}
    per_lang = defaultdict(list)
    for j, i in enumerate(ids):
        per_lang["aa" if j % 3 else "bb"].append(i)
    for lang, ds in per_lang.items():
        cum = 0
        for i in sorted(ds):
            seq = cum // SEQ_BUDGET
            n, tot, lo, hi = want.get((lang, seq), (0, 0, i, i))
            want[(lang, seq)] = (n + 1, tot + toks[i], min(lo, i), max(hi, i))
            cum += toks[i]
    assert got == want


def test_negative_sampling_table_is_a_valid_distribution(spark):
    """cum_lo must be the exact prefix sum of p in rank order, starting
    at 0 and ending at 1 - p_last (a binary search over [0,1) always
    lands in exactly one word's range)."""
    rows = sorted(
        load_all()["negative_sampling_table"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect(),
        key=lambda r: r.rnk,
    )
    assert rows[0].cum_lo == 0.0
    acc = 0.0
    for r in rows:
        assert abs(r.cum_lo - acc) < 5e-6  # rounding tolerance
        assert r.p > 0
        acc += r.p
    assert abs(acc - 1.0) < 5e-5
    # frequencies are non-increasing with rank
    ns = [r.n for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_epoch_shuffle_positions_are_a_balanced_permutation(spark):
    """pos must be exactly 0..n-1 (the bucket decomposition loses or
    duplicates nothing), shards must be balanced to within one doc,
    and the order must genuinely scramble doc_id (a sorted or identity
    order means the hash did nothing)."""
    rows = load_all()["epoch_shuffle"].fn(spark, SF).collect()
    n = len(rows)
    assert n > 0
    assert sorted(r.pos for r in rows) == list(range(n))
    by_shard = {}
    for r in rows:
        assert r.shard == r.pos % 16
        by_shard[r.shard] = by_shard.get(r.shard, 0) + 1
    assert max(by_shard.values()) - min(by_shard.values()) <= 1
    # anti-identity: the first 50 positions are not the first 50 doc_ids
    first = [r.doc_id for r in sorted(rows, key=lambda r: r.pos)[:50]]
    assert first != sorted(first)


def test_token_budget_select_is_the_greedy_quality_prefix(spark):
    """The selected set must be exactly the docs whose preceding
    cumulative tokens (in quality DESC, doc_id ASC order over the
    WHOLE corpus) fit the budget — recomputed here by brute force from
    quality_score, independent of the operator's shard decomposition."""
    from inverted_index_using_the_map_reduce_paradigm_spark.operators.text_analysis import (
        TOKEN_BUDGET,
    )

    got = {
        r.doc_id: (r.n_tokens, r.cum_before)
        for r in load_all()["token_budget_select"].fn(spark, SF).collect()
    }
    scored = load_all()["quality_score"].fn(spark, SF).collect()
    order = sorted(scored, key=lambda r: (-r.quality, r.doc_id))
    cum = 0
    want = {}
    for r in order:
        if cum < TOKEN_BUDGET:
            want[r.doc_id] = (r.n_tokens, cum)
        cum += r.n_tokens
    assert got == want


def test_token_budget_select_degenerate_single_quality_level(spark):
    """Worst case for the three-level decomposition: EVERY doc lands in
    one quality level, so correctness rests entirely on the doc-shard
    rollup inside that level (level-2), with ids straddling shard
    boundaries and whole shards empty.  Spec order degenerates to pure
    doc_id; expected selection computed in plain Python."""
    import inverted_index_using_the_map_reduce_paradigm_spark.operators.text_analysis as ta_mod
    from inverted_index_using_the_map_reduce_paradigm_spark.operators.text_analysis import (
        TB_SHARD_DOCS,
        TOKEN_BUDGET,
        q_token_budget_select,
    )

    ids = [1, 2, 126, 127, 128, 129, 255, 256, 257, 640, 641, 1023, 1024, 2000]
    text = "tok " * 64  # identical docs -> identical quality
    per_doc_tokens = 64
    docs = spark.createDataFrame([(i, text) for i in ids], ["doc_id", "text"])
    assert max(ids) // TB_SHARD_DOCS >= 3

    cum, want = 0, {}
    for i in ids:  # same quality everywhere -> doc_id order
        if cum < TOKEN_BUDGET:
            want[i] = cum
        cum += per_doc_tokens
    # keep the degenerate case non-trivial: with 14x64 tokens all fit,
    # so shrink the effective check by asserting cum_before instead
    orig = ta_mod.table
    ta_mod.table = lambda spark_, sf, name: docs
    try:
        got = {r.doc_id: r.cum_before for r in q_token_budget_select(spark, "x").collect()}
    finally:
        ta_mod.table = orig
    assert got == want
    assert len(set(got.values())) == len(got)  # strictly increasing prefix


def test_epoch_shuffle_huge_doc_ids_match_python_model(spark):
    """Overflow-safety property: with doc_ids up to near 2^62 the
    mod-reduced multiplicative hash must stay int64-exact and the
    bucket decomposition must still produce the exact rank order of
    the plain-Python model (doc_id * mult computed in Python's
    arbitrary-precision ints — the ground truth Spark's reduced form
    claims to equal)."""
    import random

    import inverted_index_using_the_map_reduce_paradigm_spark.operators.training as tr_mod
    from inverted_index_using_the_map_reduce_paradigm_spark.operators.training import (
        _SHUF_ADD,
        _SHUF_MOD,
        _SHUF_MULT,
        _SHUF_SHARDS,
        q_epoch_shuffle,
    )

    rng = random.Random(7)
    ids = sorted(
        {rng.randrange(0, 1 << 62) for _ in range(300)}
        | {0, 1, (1 << 62) - 1, 3_400_000_000, _SHUF_MOD, _SHUF_MOD - 1}
    )
    docs = spark.createDataFrame([(i, "x") for i in ids], ["doc_id", "text"])

    def h(i):  # arbitrary-precision ground truth
        return (i * _SHUF_MULT + _SHUF_ADD) % _SHUF_MOD

    want = {
        d: (h(d), pos, pos % _SHUF_SHARDS)
        for pos, d in enumerate(sorted(ids, key=lambda d: (h(d), d)))
    }
    orig = tr_mod.table
    tr_mod.table = lambda spark_, sf, name: docs
    try:
        got = {
            r.doc_id: (r.h, r.pos, r.shard)
            for r in q_epoch_shuffle(spark, "x").collect()
        }
    finally:
        tr_mod.table = orig
    assert got == want
