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


def _stop_shingle_corpus(spark, n_docs=60):
    """Every doc shares one boilerplate opening (a universal stop-
    shingle); each doc also has a unique tail.  Docs 0/1 are true
    near-dups of each other beyond the boilerplate."""
    from pyspark.sql import Row

    rows = []
    for i in range(n_docs):
        # letter suffixes: the normalizer strips digits, so numeric
        # suffixes would collapse every doc to the same token stream
        s = chr(97 + i % 26) + chr(97 + i // 26)
        tail = f"unique{s} tail{s} words{s} here{s} end{s}"
        if i == 1:
            tail = "uniqueaa tailaa wordsaa hereaa endx"  # near-dup of doc 0
        rows.append(Row(doc_id=i, text=f"common header boilerplate {tail}"))
    return spark.createDataFrame(rows)


def test_hot_shingle_cap_bounds_candidate_pairs(spark):
    """The stop-shingle guard: with the cap, candidate pairs from the
    universal boilerplate shingles disappear (they carry no signal),
    while pairs sharing rare shingles survive.  Candidate volume drops
    from O(n²) to the rare-key pair count."""
    from inverted_index_using_the_map_reduce_paradigm_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        jaccard_pairs,
    )

    docs = _stop_shingle_corpus(spark)
    uncapped = jaccard_pairs(docs, hot_cap=10**9)
    capped = jaccard_pairs(docs, hot_cap=5)

    # with cap=5 the universal boilerplate shingle (group size 60) is
    # dropped, so candidate volume is bounded by rare-key groups only —
    # the true near-dup pair (0,1) survives via its 4 rare shared
    # shingles, everything else disappears
    cap_scores = {(r.doc_a, r.doc_b): r.jaccard for r in capped.collect()}
    assert set(cap_scores) == {(0, 1)}
    # the capped score can only be <= the uncapped score for any pair
    unc = {(r.doc_a, r.doc_b): r.jaccard for r in uncapped.collect()}
    assert set(unc) == {(0, 1)}  # other pairs share ONLY the stop-shingle
    for k, v in cap_scores.items():
        assert k in unc and v <= unc[k] + 1e-9
    assert 0 < JACCARD_THRESHOLD <= 1.0  # sanity


def test_minhash_band_cap_keeps_precision(spark):
    """Band-bucket capping may only LOSE candidates (recall), never
    emit a wrong pair: every surviving pair is exact-verified."""
    from inverted_index_using_the_map_reduce_paradigm_spark.operators.dedup import (
        minhash_pairs,
    )

    docs = _stop_shingle_corpus(spark)
    uncapped = {(r.doc_a, r.doc_b) for r in minhash_pairs(docs, band_cap=10**9).collect()}
    capped = {(r.doc_a, r.doc_b) for r in minhash_pairs(docs, band_cap=5).collect()}
    assert capped <= uncapped
    for df in (minhash_pairs(docs, band_cap=5),):
        assert df.filter(F.col("jaccard") < 0.5).count() == 0


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


def test_production_cap_on_skewed_corpus_budget_and_recall(spark):
    """The VERDICT-requested AQE-scale scenario: a 300-doc corpus where
    ONE stop-shingle appears in 30% of docs, run with the
    production-scale cap (64).  The stop-shingle group (90 docs > cap)
    is dropped, so the candidate-pair budget collapses from the g²
    blowup (90·89/2 ≈ 4e3 pairs from one key) to the rare-key total,
    while recall on non-degenerate pairs — pairs whose similarity does
    NOT hinge on the stop-shingle — is exactly unchanged, scores
    included."""
    from pyspark.sql import Row

    from inverted_index_using_the_map_reduce_paradigm_spark.operators.dedup import (
        _drop_hot_keys,
        jaccard_pairs,
        shingles_of,
    )

    rows = []
    for i in range(300):
        s = chr(97 + i % 26) + chr(97 + (i // 26) % 26) + chr(97 + i // 676)
        # 5 unique tail tokens -> several rare shingles per doc
        tail = f"alpha{s} beta{s} gamma{s} delta{s} omega{s}"
        if i % 10 < 3:  # 30% of docs carry the boilerplate phrase
            text = f"common stop phrase {tail}"
        else:
            text = f"open{s} lead{s} in{s} {tail}"
        if i == 7:  # true near-dup of doc 6 (suffix 'gaa'), no stop-shingle
            text = "opengaa leadgaa ingaa alphagaa betagaa gammagaa deltagaa omegax"
        rows.append(Row(doc_id=i, text=text))
    docs = spark.createDataFrame(rows)

    # candidate budget: after the cap no join key's group exceeds 64,
    # and the 90-doc stop-shingle key is gone entirely
    ex = (
        docs.select("doc_id", F.explode(shingles_of(F.col("text"))).alias("s"))
        .select("doc_id", F.xxhash64("s").alias("h"))
    )
    sizes_before = ex.groupBy("h").count()
    assert sizes_before.agg(F.max("count")).collect()[0][0] == 90
    capped_ex = _drop_hot_keys(ex, ["h"], 64)
    sizes = capped_ex.groupBy("h").count().agg(F.max("count")).collect()[0][0]
    assert sizes is not None and sizes <= 64
    budget = (
        capped_ex.groupBy("h").count()
        .agg(F.sum(F.col("count") * (F.col("count") - 1) / 2)).collect()[0][0]
    )
    assert budget <= 2000  # rare keys only; uncapped would add ~4005 from one key

    uncapped = {(r.doc_a, r.doc_b): r.jaccard for r in jaccard_pairs(docs, hot_cap=10**9).collect()}
    capped = {(r.doc_a, r.doc_b): r.jaccard for r in jaccard_pairs(docs, hot_cap=64).collect()}
    # the true near-dup pair emerges identically — score untouched
    assert (6, 7) in capped and capped[(6, 7)] == uncapped[(6, 7)]
    # recall on non-degenerate pairs unchanged: every uncapped pair
    # above threshold survives the cap (stop-shingle-only overlaps
    # never reached the 0.5 threshold in the first place)
    assert set(capped) == set(uncapped)
    for k in capped:
        assert capped[k] <= uncapped[k] + 1e-9


def test_incremental_near_dedup_equals_batch_restricted_to_delta(spark):
    """A doc's MinHash signature depends only on its text, so banding
    the delta against the stored base band table must surface EXACTLY
    the full-corpus minhash pairs that touch a delta doc (batch /
    incremental equivalence), with identical verified Jaccard values."""
    qs = load_all()
    full = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in qs["minhash_lsh_dedup"].fn(spark, SF).collect()
    }
    inc = {
        (min(r.new_doc_id, r.matched_doc_id), max(r.new_doc_id, r.matched_doc_id)):
        r.jaccard
        for r in qs["incremental_near_dedup"].fn(spark, SF).collect()
    }
    expected = {
        pair: j
        for pair, j in full.items()
        if pair[0] % 5 == 0 or pair[1] % 5 == 0
    }
    assert inc == expected
    assert inc, "fixture should contain at least one delta-touching near-dup"


def test_tfidf_similarity_caps_bound_dense_vocab_pairs(spark):
    """A degenerate corpus (tiny vocabulary, every word near-universal)
    must NOT send the doc-doc posting join quadratic: words over the
    relative stop-word cap are excluded, so docs related only through
    universal words produce no pair at all, while docs sharing a rare
    word still surface.  (The uncapped form was measured never
    finishing at sf0.1 for exactly this corpus shape.)"""
    from pyspark.sql import functions as F

    from inverted_index_using_the_map_reduce_paradigm_spark.operators.text_analysis import (
        SIM_DF_FRAC_DEN,
        SIM_DF_FRAC_NUM,
    )

    n = 200
    rows = []
    letters = "abcdefghij"
    for i in range(n):
        # 'common' appears everywhere (df = n, over the 3/10 cap);
        # 'rareXY' is shared by exactly two docs (a near-dup pair) —
        # letter suffixes because the normalizer strips digits
        suffix = letters[(i // 2) // 10] + letters[(i // 2) % 10]
        rows.append((i, f"common common common rare{suffix}"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    from inverted_index_using_the_map_reduce_paradigm_spark.operators import text_analysis as ta

    # run the registered builder against a temp view-backed loader by
    # monkey-free composition: rebuild the same pipeline pieces
    toks = __import__(
        "inverted_index_using_the_map_reduce_paradigm_spark.functions.text",
        fromlist=["tokenize_documents"],
    ).tokenize_documents(docs)
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    dfreq = toks.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    ndocs = docs.select(F.count("*").alias("n_docs"))
    kept = dfreq.crossJoin(F.broadcast(ndocs)).filter(
        F.col("df") * SIM_DF_FRAC_DEN <= F.col("n_docs") * SIM_DF_FRAC_NUM
    )
    w = tf.join(F.broadcast(kept), "word")
    a, b = w.alias("a"), w.alias("b")
    pairs = a.join(
        b,
        (F.col("a.word") == F.col("b.word"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    n_pairs = pairs.count()
    # only the rare-word pairs survive: exactly one per rare token
    assert n_pairs == n // 2
    kept_words = {r.word for r in kept.select("word").collect()}
    assert "common" not in kept_words and "rareaa" in kept_words


def test_prefix_filtering_same_pairs_fewer_candidates(spark):
    """jaccard_prefix_dedup must emit EXACTLY ngram_jaccard_dedup's
    pairs (prefix filtering is lossless pruning, not approximation)
    while generating strictly fewer candidate pairs than the
    all-shingles join."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from inverted_index_using_the_map_reduce_paradigm_spark.data import table
    from inverted_index_using_the_map_reduce_paradigm_spark.operators.dedup import (
        JACCARD_THRESHOLD,
        _shingle_sets,
    )

    qs = load_all()
    full = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in qs["ngram_jaccard_dedup"].fn(spark, SF).collect()
    }
    pref = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in qs["jaccard_prefix_dedup"].fn(spark, SF).collect()
    }
    assert pref == full and full

    # candidate volume: all-shingle join vs prefix join
    sh = _shingle_sets(table(spark, SF, "documents"))
    ex = sh.select("doc_id", "n_sh", F.explode("shingles").alias("s")).select(
        "doc_id", "n_sh", F.xxhash64("s").alias("h")
    )
    all_cand = (
        ex.alias("a")
        .join(
            ex.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    freq = ex.groupBy("h").agg(F.count("*").alias("gf"))
    w_doc = Window.partitionBy("doc_id").orderBy(F.asc("gf"), F.asc("h"))
    ranked = ex.join(freq, "h").withColumn("pos", F.row_number().over(w_doc))
    prefix = ranked.filter(
        F.col("pos") <= F.col("n_sh") - F.ceil(F.lit(JACCARD_THRESHOLD) * F.col("n_sh")) + 1
    )
    pref_cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    assert pref_cand < all_cand
    print(f"candidates: all-shingles {all_cand} -> prefix {pref_cand}")


def test_materialize_reliable_checkpoint_mode_matches_local(spark, tmp_path):
    """materialize() must switch every checkpoint site to the reliable
    (fault-tolerant storage) form when the session has a checkpoint dir
    configured, producing identical results — the one-switch cluster
    deployment contract.  near_dup_clusters exercises the iterative
    connected-components loop plus the materialized pair set."""
    qs = load_all()
    local_rows = sorted(
        map(tuple, qs["near_dup_clusters"].fn(spark, SF).collect())
    )
    sc = spark.sparkContext
    assert sc.getCheckpointDir() is None
    ckpt = tmp_path / "ckpt"
    sc.setCheckpointDir(str(ckpt))
    try:
        reliable_rows = sorted(
            map(tuple, qs["near_dup_clusters"].fn(spark, SF).collect())
        )
        # the reliable path really ran: checkpoint data landed on disk
        assert any(ckpt.rglob("*")), "no reliable checkpoint files written"
    finally:
        # Scala's setCheckpointDir(null) resolves to Option(null)=None,
        # restoring local mode for the rest of the suite.
        sc._jsc.setCheckpointDir(None)
    assert sc.getCheckpointDir() is None
    assert local_rows == reliable_rows


def test_prefix_dedup_broadcast_guard_fallback_matches(spark):
    """A dense corpus (every doc a near-duplicate) exercises the
    candidate-count guard: with the cap forced to 0 the broadcast hint
    is withheld and the verify runs as plain joins — the output must be
    identical to the hinted path (the guard changes strategy, never
    semantics)."""
    from inverted_index_using_the_map_reduce_paradigm_spark.operators.dedup import (
        jaccard_pairs_prefix,
    )

    rows = [
        (i, f"the quick brown fox jumps over the lazy dog variant{i % 3}")
        for i in range(1, 31)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    hinted = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in jaccard_pairs_prefix(docs).collect()
    }
    fallback = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in jaccard_pairs_prefix(docs, broadcast_cap=0).collect()
    }
    assert hinted  # the dense corpus really produced near-dup pairs
    assert hinted == fallback


def test_substring_dedup_coverage_math(spark):
    """Constructed corpus with known span-duplication structure:
    full-copy, prefix-overlap, within-doc-only repetition (must NOT
    count — duplication is cross-doc), and sub-k short docs."""
    from inverted_index_using_the_map_reduce_paradigm_spark.operators.dedup import (
        SUBSTR_K,
        substring_dup_profile,
    )

    assert SUBSTR_K == 8  # the token strings below assume k=8
    ten = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    rows = [
        (1, ten),  # 10 tokens, spans at pos 0..2
        (2, ten),  # exact copy: everything duplicated
        # first 8 tokens shared with doc 1/2, distinct 8-token tail:
        (3, "alpha bravo charlie delta echo foxtrot golf hotel "
            "xray yankee zulu whiskey quebec romeo sierra tango"),
        (4, "one two three four five six seven eight nine ten"),  # unique
        (5, "tiny doc"),  # < k tokens: no spans at all
        # 8-token run repeated WITHIN one doc only — not cross-doc:
        (6, "papa mike november oscar kilo lima uniform victor "
            "papa mike november oscar kilo lima uniform victor"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in substring_dup_profile(docs).collect()}
    assert set(got) == {1, 2, 3}
    for d in (1, 2):
        r = got[d]
        assert (r.n_tokens, r.n_dup_spans, r.n_dup_tokens) == (10, 3, 10)
        assert r.dup_fraction == 1.0
    r3 = got[3]
    assert (r3.n_tokens, r3.n_dup_spans, r3.n_dup_tokens) == (16, 1, 8)
    assert r3.dup_fraction == 0.5


def _substr_model(docs):
    """Brute-force reference model of substring_dup_profile (pure
    Python): positional k-spans, cross-doc duplicated iff the span
    string occurs in >= 2 distinct docs, coverage = interval union."""
    from inverted_index_using_the_map_reduce_paradigm_spark.operators.dedup import (
        SUBSTR_K as k,
    )

    spans = {
        d: [(i, " ".join(t[i : i + k])) for i in range(len(t) - k + 1)]
        for d, t in docs
    }
    owners = {}
    for d, lst in spans.items():
        for _, s in lst:
            owners.setdefault(s, set()).add(d)
    out = {}
    for d, t in docs:
        dup = [(i, s) for i, s in spans[d] if len(owners[s]) >= 2]
        if not dup:
            continue
        cov = set()
        for i, _ in dup:
            cov.update(range(i, i + k))
        out[d] = (len(t), len({i for i, _ in dup}), len(cov))
    return out


from hypothesis import HealthCheck as _HC
from hypothesis import given as _given, settings as _settings
from hypothesis import strategies as _st

_DOC = _st.lists(_st.sampled_from(["aa", "bb"]), max_size=30)


@_settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[_HC.too_slow, _HC.function_scoped_fixture],
)
@_given(_st.lists(_DOC, min_size=2, max_size=5))
def test_substring_dedup_matches_bruteforce_model(spark, token_lists):
    """Random tiny-vocabulary corpora (2-word alphabet maximizes span
    collisions) against the brute-force model: same flagged docs, same
    span/coverage counts, fraction within float noise."""
    from inverted_index_using_the_map_reduce_paradigm_spark.operators.dedup import (
        substring_dup_profile,
    )

    docs = [(i + 1, t) for i, t in enumerate(token_lists)]
    sdf = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in docs], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in substring_dup_profile(sdf).collect()}
    want = _substr_model(docs)
    assert set(got) == set(want)
    for d, (n_tok, n_dup, n_cov) in want.items():
        r = got[d]
        assert (r.n_tokens, r.n_dup_spans, r.n_dup_tokens) == (n_tok, n_dup, n_cov)
        assert abs(r.dup_fraction - n_cov / n_tok) < 1e-6


# --------------------------------------------------------------------------
# containment_dedup
# --------------------------------------------------------------------------


def test_containment_catches_inclusion_jaccard_misses(spark):
    """A 20-token doc embedded verbatim in a 60-token doc: every short
    shingle is in the long set, so containment = 1.0, while Jaccard is
    ~|short|/|long| < 0.5 — the inclusion case the Jaccard pass is
    blind to by construction."""
    import itertools
    import string

    from inverted_index_using_the_map_reduce_paradigm_spark.operators.dedup import (
        containment_pairs,
        jaccard_pairs,
    )

    words = [
        "".join(p) for p in itertools.islice(
            itertools.product(string.ascii_lowercase, repeat=2), 80
        )
    ]
    long_doc = " ".join(words[:60])
    short_doc = " ".join(words[20:40])  # verbatim substring of long_doc
    other = " ".join(words[60:80])
    sdf = spark.createDataFrame(
        [(1, long_doc), (2, short_doc), (3, other)],
        "doc_id long, text string",
    )
    cont = {(r.doc_a, r.doc_b): r for r in containment_pairs(sdf).collect()}
    assert set(cont) == {(1, 2)}
    assert cont[(1, 2)].containment == 1.0
    assert cont[(1, 2)].jaccard < 0.5
    assert pairs(jaccard_pairs(sdf)) == set()  # Jaccard misses it


def test_containment_score_matches_set_model(spark):
    """Random two-word-alphabet corpora vs a brute-force shingle-set
    model: same pairs, same containment and Jaccard scores."""
    import random

    from inverted_index_using_the_map_reduce_paradigm_spark.operators.dedup import (
        CONTAINMENT_THRESHOLD,
        SHINGLE_N,
        containment_pairs,
    )

    rng = random.Random(7)
    docs = [
        (d, [rng.choice(["aa", "bb"]) for _ in range(rng.randint(0, 25))])
        for d in range(1, 9)
    ]
    sdf = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in docs], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): (r.containment, r.jaccard)
        for r in containment_pairs(sdf).collect()
    }
    sets = {
        d: {
            " ".join(t[i : i + SHINGLE_N])
            for i in range(len(t) - SHINGLE_N + 1)
        }
        for d, t in docs
    }
    want = {}
    for a in sets:
        for b in sets:
            if a < b and sets[a] and sets[b]:
                common = len(sets[a] & sets[b])
                c = common / min(len(sets[a]), len(sets[b]))
                if c >= CONTAINMENT_THRESHOLD:
                    want[(a, b)] = (
                        round(c, 6),
                        round(common / len(sets[a] | sets[b]), 6),
                    )
    assert got == want
