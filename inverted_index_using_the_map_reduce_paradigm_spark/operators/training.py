"""Training-data curation operators beyond the dedup/quality families.

The reference stops at building an index (``/root/reference/main.c++``
has no query or curation surface at all); these are north-star
extensions for an LLM-data pipeline: benchmark-contamination detection,
concat-then-split sequence packing, repetition-based quality signals
(Gopher-style), and PMI co-occurrence mining.  Each is expressed as
declarative DataFrame ops (Catalyst sees plain joins/aggregations) with
a DuckDB oracle, and each documents its 100 TB shape inline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..data import materialize, table
from ..functions.text import (
    sql_tokens,
    tokenize_documents,
    tokenize_documents_distinct,
    tokens_of,
)
from ..registry import register
from .dedup import shingles_of, sql_shingles
from .pipeline import _SPLIT_MULT, _TRAIN_PCT, _VAL_PCT

# --------------------------------------------------------------------------
# contamination_check — train/eval n-gram overlap
# --------------------------------------------------------------------------

_BUCKET = f"((doc_id * {_SPLIT_MULT}) % 4294967296) % 100"


@register(
    "contamination_check",
    oracle=f"""
WITH b AS (
  SELECT doc_id, text, {_BUCKET} AS bucket FROM documents
), tr AS (
  SELECT doc_id, unnest({sql_shingles(sql_tokens('text'))}) AS shingle
  FROM b WHERE bucket < {_TRAIN_PCT}
), ev AS (
  SELECT doc_id AS eval_doc, unnest({sql_shingles(sql_tokens('text'))}) AS shingle
  FROM b WHERE bucket >= {_TRAIN_PCT + _VAL_PCT}
)
SELECT tr.doc_id,
       count(DISTINCT tr.shingle) AS n_shared_ngrams,
       count(DISTINCT ev.eval_doc) AS n_eval_docs
FROM tr JOIN ev USING (shingle)
GROUP BY tr.doc_id
""",
    description="train docs sharing word-3-grams with the held-out test split",
    tags=("training", "dedup", "text"),
)
def q_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: train-split documents that share at
    least one word-3-gram with any test-split document, with how many
    distinct grams and how many distinct eval docs they touch.

    100 TB shape: BOTH sides here are slices of the same corpus, so the
    eval side is corpus-proportional by construction and carries NO
    broadcast hint — the join shuffles on ``shingle``, which scales.
    (In a production run where the eval side really is a bounded
    benchmark suite, AQE's runtime size check — not a compile-time
    hint — upgrades the join to broadcast for free.)  The train side is
    ONE scan + explode; the per-doc aggregation shuffles only the
    contaminated subset, keyed by doc_id.  The same deterministic
    multiplicative-hash split as ``dataset_split`` defines the sides,
    so membership is stable across engines and runs.
    """
    docs = table(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * _SPLIT_MULT) % 4294967296 % 100
    sh = docs.select(
        "doc_id", bucket.alias("bucket"), F.explode(shingles_of(F.col("text"))).alias("shingle")
    )
    # signature-store rule (see dedup.shingle_pair_counts): the shingle
    # UDF's resultId defeats canonical-plan reuse, so WITHOUT this the
    # train and eval branches each re-run tokenize+shingle over the
    # whole corpus (2 ArrowEvalPython nodes in the executed plan).
    # Materialize the exploded table once — val-split rows dropped
    # first, they feed neither side — and both branches read the store.
    # Measured honestly: at sf0.1 the TIMED path is neutral (~2.0 s
    # either way — the shingle-keyed join and the two distinct
    # aggregates dominate, not the UDF); the win is the halved
    # corpus-sized Python pass, which is what matters when the corpus
    # is 100 TB and the join output is contamination-sized.
    sh = materialize(
        sh.filter(
            (F.col("bucket") < _TRAIN_PCT)
            | (F.col("bucket") >= _TRAIN_PCT + _VAL_PCT)
        )
    )
    train = sh.filter(F.col("bucket") < _TRAIN_PCT).select("doc_id", "shingle")
    eval_ = sh.filter(F.col("bucket") >= _TRAIN_PCT + _VAL_PCT).select(
        F.col("doc_id").alias("eval_doc"), "shingle"
    )
    # r13 (optimization round, guide §2.4 "an orderBy used only to make
    # output deterministic"): the final global sort was presentation
    # only — the oracle SQL has no ORDER BY, the driver/parity
    # comparison sorts rows itself (parity.normalize), and no consumer
    # takes a LIMIT off the order.  It cost a rangepartitioning
    # exchange + sort over the whole contaminated-doc result — at
    # 100 TB a full extra shuffle of the output, for nothing.  It was
    # one of only 3 global sorts registry-wide (the other two feed
    # LIMITs and stay).  Result SET unchanged, hash-identical.
    return (
        train.join(eval_, "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_shared_ngrams"),
            F.countDistinct("eval_doc").alias("n_eval_docs"),
        )
    )


# --------------------------------------------------------------------------
# sequence_packing — concat-then-split packing into fixed token budgets
# --------------------------------------------------------------------------

SEQ_BUDGET = 256
# doc_id-range shard width: bounds what any single window task must
# order to SEQ_SHARD_DOCS rows.  Small enough that the sf0.01 fixture
# (~500 docs) spans multiple shards per language, so the sharded path
# is what the oracle actually verifies.
SEQ_SHARD_DOCS = 128


@register(
    "sequence_packing",
    # The oracle keeps the UNsharded per-lang running sum: the engine's
    # shard decomposition (within-shard cumsum + per-shard offset) is
    # associative, so cum_before — and every output row — is identical.
    oracle=f"""
WITH t AS (
  SELECT doc_id, lang, len({sql_tokens('text')}) AS n_tokens FROM documents
), c AS (
  SELECT doc_id, lang, n_tokens,
         COALESCE(SUM(n_tokens) OVER (
           PARTITION BY lang ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM t
)
SELECT lang,
       CAST(FLOOR(cum_before / {SEQ_BUDGET}) AS BIGINT) AS seq_id,
       count(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS seq_tokens,
       MIN(doc_id) AS first_doc,
       MAX(doc_id) AS last_doc
FROM c
GROUP BY lang, seq_id
""",
    description=f"concat-then-split packing into {SEQ_BUDGET}-token training sequences",
    tags=("training", "pipeline"),
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign each document to the training sequence its first token
    lands in when the per-language corpus is concatenated in doc_id
    order and split every ``SEQ_BUDGET`` tokens — the standard
    concat-then-split packing used for LLM pretraining batches
    (exact first-fit packing is inherently sequential; this is the
    deterministic, shuffle-friendly variant real pipelines use).

    100 TB shape: a per-lang running sum must NOT be one window task
    per language (English alone would put half the corpus through a
    single core), so the prefix sum is sharded: each (lang, shard)
    window orders at most ``SEQ_SHARD_DOCS`` docs, the per-shard token
    totals roll up through a shards-only window (one row per shard —
    millions of tiny rows at 100 TB, not billions of docs), and the
    shard offset joins back on the (lang, shard) key the first window
    already partitioned on.  Associativity makes the result identical
    to the single-window form the oracle states.  The final rollup
    shuffles one row per document, keyed by a monotone seq_id with no
    skew.
    """
    docs = table(spark, sf_dir, "documents")
    t = (
        docs.select(
            "doc_id",
            "lang",
            F.size(tokens_of(F.col("text"))).alias("n_tokens"),
        )
        .withColumn("shard", F.floor(F.col("doc_id") / SEQ_SHARD_DOCS))
        # no-op filters (keys are never null), stated explicitly so BOTH
        # consumers of this subtree carry identical inferred constraints
        # — otherwise the offsets join infers isnotnull(shard) on one
        # branch only and the canonical mismatch defeats ReuseExchange
        .filter(F.col("lang").isNotNull() & F.col("shard").isNotNull())
    )
    # shard = floor(doc_id / width) is monotone in doc_id, so ordering
    # shards ascending within a lang IS the doc_id concat order.
    w_in = (
        Window.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = t.select(
        "doc_id",
        "lang",
        "shard",
        "n_tokens",
        F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0)).alias("cum_in_shard"),
    )
    w_sh = (
        Window.partitionBy("lang")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # Shard totals come from the SAME windowed stream (the last row's
    # cum_in_shard + n_tokens), not a second corpus scan: both join
    # branches share an identical subtree through the (lang, shard)
    # exchange, so ReuseExchange runs the scan + tokenize once, and the
    # groupBy rides the exchange's partitioning with no new shuffle.
    offsets = (
        c.groupBy("lang", "shard")
        .agg(
            F.max(F.col("cum_in_shard") + F.col("n_tokens")).alias("shard_tokens")
        )
        .withColumn(
            "shard_offset", F.coalesce(F.sum("shard_tokens").over(w_sh), F.lit(0))
        )
        .select("lang", "shard", "shard_offset")
    )
    c = c.join(offsets, ["lang", "shard"]).withColumn(
        "cum_before", F.col("shard_offset") + F.col("cum_in_shard")
    )
    return (
        c.groupBy("lang", F.floor(F.col("cum_before") / SEQ_BUDGET).alias("seq_id"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("seq_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


# --------------------------------------------------------------------------
# repetition_signals — Gopher-style repetition quality metrics
# --------------------------------------------------------------------------

_SQL_BIGRAMS = (
    "list_transform(generate_series(1, greatest(len({t}) - 1, 0)),"
    " i -> {t}[i] || ' ' || {t}[i+1])"
)


@register(
    "repetition_signals",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {sql_tokens('text')} AS words FROM documents
), wc AS (
  SELECT doc_id, word, count(*) AS n
  FROM (SELECT doc_id, unnest(words) AS word FROM t)
  GROUP BY doc_id, word
), wstats AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
         count(*) AS n_distinct, max(n) AS top_word_n
  FROM wc GROUP BY doc_id
), bc AS (
  SELECT doc_id, bigram, count(*) AS n
  FROM (SELECT doc_id, unnest({_SQL_BIGRAMS.format(t='words')}) AS bigram FROM t)
  GROUP BY doc_id, bigram
), bstats AS (
  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_bigrams, max(n) AS top_bigram_n
  FROM bc GROUP BY doc_id
)
SELECT w.doc_id, w.n_tokens,
       round(w.n_distinct / CAST(w.n_tokens AS DOUBLE), 4) AS distinct_ratio,
       round(w.top_word_n / CAST(w.n_tokens AS DOUBLE), 4) AS top_word_frac,
       round(COALESCE(b.top_bigram_n / CAST(b.n_bigrams AS DOUBLE), 0), 4)
         AS top_bigram_frac,
       (w.n_distinct / CAST(w.n_tokens AS DOUBLE) < 0.5
        OR COALESCE(b.top_bigram_n / CAST(b.n_bigrams AS DOUBLE), 0) > 0.1)
         AS repetitious
FROM wstats w LEFT JOIN bstats b USING (doc_id)
WHERE w.n_tokens > 0
""",
    description="per-doc repetition metrics: distinct ratio, top word/bigram fraction",
    tags=("training", "text", "filter"),
)
def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition screens: documents dominated by a few
    tokens or a repeated bigram are boilerplate/spam and get flagged
    before training.  Emits the raw ratios so callers can re-threshold
    without recomputing.

    100 TB shape (tokenize-once, r7): word grams and bigram grams ride
    ONE explode — each gram is type-prefixed (``u:``/``b:``; tokens are
    ``[a-z]`` only so the prefix cannot collide) — so the corpus is
    scanned and tokenized a single time into one partial-aggregated
    (doc_id, gram) shuffle, and the per-doc rollup splits the types
    back out with conditional aggregates (null-handling reproduces the
    old LEFT JOIN: a one-token doc has no ``b:`` grams, so its bigram
    aggregates are null and coalesce to 0).  Previously the word and
    bigram branches each tokenized the corpus.  High-cardinality keys,
    no skew, everything built-in codegen.
    """
    docs = table(spark, sf_dir, "documents")
    # name the token array (see skipgram_pairs): the bigram expression
    # references it 5x; a named non-cheap alias is not inlined back, so
    # the tokenizer runs once per row instead of per reference
    docs = docs.select("doc_id", tokens_of(F.col("text")).alias("toks"))
    t = F.col("toks")
    bigrams = F.zip_with(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    grams = F.concat(
        F.transform(t, lambda w: F.concat(F.lit("u:"), w)),
        F.transform(bigrams, lambda b: F.concat(F.lit("b:"), b)),
    )
    gc = (
        docs.select("doc_id", F.explode(grams).alias("g"))
        .groupBy("doc_id", "g")
        .agg(F.count("*").alias("n"))
    )
    is_u = F.col("g").startswith("u:")
    stats = gc.groupBy("doc_id").agg(
        F.sum(F.when(is_u, F.col("n"))).alias("n_tokens"),
        F.sum(F.when(is_u, 1)).alias("n_distinct"),
        F.max(F.when(is_u, F.col("n"))).alias("top_word_n"),
        F.sum(F.when(~is_u, F.col("n"))).alias("n_bigrams"),
        F.max(F.when(~is_u, F.col("n"))).alias("top_bigram_n"),
    )
    distinct_ratio = F.col("n_distinct") / F.col("n_tokens").cast("double")
    top_word_frac = F.col("top_word_n") / F.col("n_tokens").cast("double")
    top_bigram_frac = F.coalesce(
        F.col("top_bigram_n") / F.col("n_bigrams").cast("double"), F.lit(0.0)
    )
    return (
        stats.filter(F.col("n_tokens") > 0)
        .select(
            "doc_id",
            "n_tokens",
            F.round(distinct_ratio, 4).alias("distinct_ratio"),
            F.round(top_word_frac, 4).alias("top_word_frac"),
            F.round(top_bigram_frac, 4).alias("top_bigram_frac"),
            ((distinct_ratio < 0.5) | (top_bigram_frac > 0.1)).alias("repetitious"),
        )
    )


# --------------------------------------------------------------------------
# pmi_cooccurrence — collocation mining over per-doc vocabularies
# --------------------------------------------------------------------------

PMI_MIN_DF = 3
PMI_MIN_PAIR = 3
PMI_TOP_K = 50


@register(
    "pmi_cooccurrence",
    oracle=f"""
WITH dv AS (
  SELECT DISTINCT doc_id, unnest({sql_tokens('text')}) AS word FROM documents
), dfreq AS (
  SELECT word, count(*) AS df FROM dv GROUP BY word HAVING count(*) >= {PMI_MIN_DF}
), dvf AS (
  SELECT dv.doc_id, dv.word, dfreq.df FROM dv JOIN dfreq USING (word)
), pair AS (
  SELECT a.word AS w1, b.word AS w2, a.df AS df1, b.df AS df2,
         count(*) AS n_pair
  FROM dvf a JOIN dvf b ON a.doc_id = b.doc_id AND a.word < b.word
  GROUP BY a.word, b.word, a.df, b.df
  HAVING count(*) >= {PMI_MIN_PAIR}
)
SELECT w1, w2, n_pair,
       round(ln(n_pair * (SELECT count(*) FROM documents)
                / CAST(df1 * df2 AS DOUBLE)), 4) AS pmi
FROM pair
ORDER BY pmi DESC, w1 ASC, w2 ASC
LIMIT {PMI_TOP_K}
""",
    description=f"top-{PMI_TOP_K} word pairs by pointwise mutual information",
    tags=("training", "text"),
)
def q_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collocations: word pairs that co-occur in documents far more
    than their independent document frequencies predict —
    ``pmi = ln(P(a,b) / (P(a) P(b)))`` over per-doc presence.

    100 TB shape: document frequency rides a word-partitioned count
    WINDOW on the per-doc vocab stream (r7 — no separate dfreq
    aggregate, no vocab join, one corpus tokenize); the
    per-doc vocab self-join is keyed by doc_id — each doc contributes
    |vocab_doc|² pairs, bounded because the ``PMI_MIN_DF`` filter plus a
    df ceiling (add ``df <= N*frac`` at scale to drop stopwords) caps
    the per-doc candidate set.  The pair aggregation partial-aggregates
    map-side, so the shuffle carries unique pairs, not occurrences.
    The corpus size joins in as a broadcast single-row aggregate — no
    driver-side ``count()`` action.
    """
    docs = table(spark, sf_dir, "documents")
    # per-doc distinct vocab with NO exchange: dedup is array-local
    dv = tokenize_documents_distinct(docs)
    # tokenize-once (r7): df attached via a word-partitioned count
    # window instead of a separate dfreq aggregate + join — the window
    # needs the same word exchange the join needed, but the dfreq
    # branch's second corpus tokenize disappears; the a/b self-join
    # below shares one doc_id shuffle via AQE exchange reuse.
    dvf = dv.withColumn(
        "df", F.count("*").over(Window.partitionBy("word"))
    ).filter(F.col("df") >= PMI_MIN_DF)
    a = dvf.select("doc_id", F.col("word").alias("w1"), F.col("df").alias("df1"))
    b = dvf.select("doc_id", F.col("word").alias("w2"), F.col("df").alias("df2"))
    pair = (
        a.join(b, ["doc_id"])
        .filter(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2", "df1", "df2")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= PMI_MIN_PAIR)
    )
    total = docs.select(F.count("*").alias("n_docs"))
    return (
        pair.crossJoin(F.broadcast(total))
        .select(
            "w1",
            "w2",
            "n_pair",
            F.round(
                F.log(
                    F.col("n_pair")
                    * F.col("n_docs")
                    / (F.col("df1") * F.col("df2")).cast("double")
                ),
                4,
            ).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(PMI_TOP_K)
    )


# --------------------------------------------------------------------------
# ngram_lm_score — bigram-LM perplexity proxy (quality signal)
# --------------------------------------------------------------------------


@register(
    "ngram_lm_score",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {sql_tokens('text')} AS words FROM documents
), bg AS (
  SELECT doc_id, split_part(bigram, ' ', 1) AS w1, split_part(bigram, ' ', 2) AS w2
  FROM (SELECT doc_id, unnest({_SQL_BIGRAMS.format(t='words')}) AS bigram FROM t)
), pc AS (
  SELECT w1, w2, count(*) AS n_pair FROM bg GROUP BY w1, w2
), hc AS (
  SELECT w1, CAST(sum(n_pair) AS BIGINT) AS n_head FROM pc GROUP BY w1
), v AS (
  SELECT count(DISTINCT word) AS vocab
  FROM (SELECT unnest(words) AS word FROM t)
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(ln((pc.n_pair + 1) / CAST(hc.n_head + v.vocab AS DOUBLE))), 4)
         AS lm_score
FROM bg JOIN pc USING (w1, w2) JOIN hc USING (w1) CROSS JOIN v
GROUP BY doc_id
""",
    description="bigram-LM avg log-likelihood per doc (add-one smoothed perplexity proxy)",
    tags=("training", "text", "quality"),
)
def q_ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KenLM-style corpus-level quality signal without external deps: fit
    an add-one-smoothed bigram model ``P(w2|w1) = (c(w1,w2)+1) /
    (c(w1)+|V|)`` on the corpus itself, then score each document by its
    average bigram log-likelihood.  Low scores mark gibberish / shuffled
    text whose token-level stats (``quality_score``) look fine —
    the standard CCNet/Gopher-era perplexity filter, minus the external
    model file.

    100 TB shape: one corpus tokenize into a partial-aggregated
    (doc_id, w1, w2) count; the model's pair/head counts are windows
    over those per-doc counts (see inline comment) so no model table
    is ever built or joined — the heaviest wire traffic is the
    distinct-per-doc-bigram stream, strictly below the raw occurrence
    stream.  Hot-head (stop-word w1) window partitions are df-sized
    but additive-only; at web scale add a ``n_pair >= k`` floor to
    shrink the model (scores shift by a constant, ordering holds).
    """
    docs = table(spark, sf_dir, "documents")
    # name the token array (see skipgram_pairs): the bigram expression
    # references it 5x; a named non-cheap alias is not inlined back, so
    # the tokenizer runs once per row instead of per reference
    docs = docs.select("doc_id", tokens_of(F.col("text")).alias("toks"))
    t = F.col("toks")
    bigrams = F.zip_with(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    bg = docs.select(
        "doc_id", F.explode(bigrams).alias("bigram")
    ).select(
        "doc_id",
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1"),
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(2)).alias("w2"),
    )
    # tokenize-once for the bigram stream (r7): ONE partial-aggregated
    # (doc_id, w1, w2) count collapses the occurrence stream, then the
    # model's global pair and head counts ride WINDOWS over those
    # per-doc counts (sum(c) over w1,w2 / over w1) instead of separate
    # model aggregates joined back — the previous form re-tokenized
    # the corpus for the model branch, the head branch, and the
    # scoring join (3x).  The per-doc average over occurrences becomes
    # the c-weighted average over distinct per-doc bigrams — same
    # value, and no raw-occurrence row survives past the first
    # exchange.
    bgd = bg.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("c"))
    # r13 (optimization round, guide §2.4): both model windows share ONE
    # w1-keyed exchange + (w1, w2) sort — n_pair is the sum over the
    # ORDER-BY PEER GROUP (RANGE CURRENT ROW..CURRENT ROW = all rows
    # with equal w2 inside the w1 partition), which is exactly the old
    # partitionBy(w1, w2) sum over the same rows; n_head rides the same
    # partitioning unordered.  The previous two-window form shuffled the
    # distinct per-doc bigram stream TWICE (once on (w1, w2), once on
    # w1) — at 100 TB that stream is near corpus-sized, so this removes
    # a full corpus-scale exchange + sort.  Skew ceiling is unchanged:
    # the n_head window already concentrated each hot head word into
    # one partition; n_pair now rides that same partition instead of a
    # finer one.
    w_pair = (
        Window.partitionBy("w1")
        .orderBy("w2")
        .rangeBetween(Window.currentRow, Window.currentRow)
    )
    bgd = bgd.withColumn("n_pair", F.sum("c").over(w_pair)).withColumn(
        "n_head", F.sum("c").over(Window.partitionBy("w1"))
    )
    # vocab rides the SAME named token array (array-local distinct
    # before the explode, as tokenize_documents_distinct would)
    vocab = docs.select(
        F.explode(F.array_distinct(F.col("toks"))).alias("word")
    ).agg(F.countDistinct("word").alias("vocab"))
    ll = F.log(
        (F.col("n_pair") + 1) / (F.col("n_head") + F.col("vocab")).cast("double")
    )
    return (
        bgd.crossJoin(F.broadcast(vocab))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_bigrams"),
            F.round(F.sum(F.col("c") * ll) / F.sum("c"), 4).alias("lm_score"),
        )
    )


# --------------------------------------------------------------------------
# duplicate_ngram_spans — cross-doc repeated-substring signal
# --------------------------------------------------------------------------

DUP_SPAN_MIN_DOCS = 2  # shingle counts as duplicated when in >= N docs
DUP_SPAN_FLAG_FRAC = 0.5


@register(
    "duplicate_ngram_spans",
    oracle=f"""
WITH s AS (
  SELECT doc_id, unnest({sql_shingles(sql_tokens('text'))}) AS shingle
  FROM documents
), df AS (
  SELECT shingle, count(*) AS n_docs FROM s GROUP BY shingle
)
SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(sum(CASE WHEN df.n_docs >= {DUP_SPAN_MIN_DOCS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_dup,
       round(sum(CASE WHEN df.n_docs >= {DUP_SPAN_MIN_DOCS} THEN 1 ELSE 0 END)
             / CAST(count(*) AS DOUBLE), 4) AS dup_frac,
       sum(CASE WHEN df.n_docs >= {DUP_SPAN_MIN_DOCS} THEN 1 ELSE 0 END)
         / CAST(count(*) AS DOUBLE) >= {DUP_SPAN_FLAG_FRAC} AS flagged
FROM s JOIN df USING (shingle)
GROUP BY s.doc_id
""",
    description="per-doc fraction of word-3-grams shared with other docs (substring dedup)",
    tags=("training", "dedup", "text"),
)
def q_duplicate_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring dedup signal ("Deduplicating Training Data Makes
    Language Models Better"-style, at shingle granularity): for each
    document, the fraction of its distinct word-3-grams that also occur
    in at least ``DUP_SPAN_MIN_DOCS`` documents corpus-wide.  Unlike the
    pair-generating ``ngram_jaccard_dedup`` this never joins documents
    to documents — it only counts, so there is no quadratic blowup to
    cap and no pair set to verify: a pure linear screen that catches
    templated boilerplate partial-duplicates below the whole-doc
    near-dup thresholds.

    100 TB shape (tokenize-once, r7): the shingle document frequency
    rides a shingle-partitioned COUNT WINDOW on the exploded stream —
    same discipline as ``_drop_hot_keys`` — instead of a separate
    aggregate joined back, so the shingle kernel runs ONCE (the
    aggregate branch and the join-back branch each carried their own
    UDF+explode before, 4 corpus-sized subtrees in the final plan).
    Two linear shuffles remain: the shingle window exchange and the
    per-doc rollup on doc_id.  Skew honesty: AQE splits skewed JOIN
    partitions, not window partitions, so a stop-shingle's group lands
    in one task — same exposure the old join-back form had on its
    probe side, minus that form's extra aggregate branch.  The rows
    are narrow (doc_id + shingle) and the window state is one count;
    hot shingles canNOT be capped away here because high-df shingles
    are exactly the signal being measured.  Nothing quadratic, nothing
    collected.
    """
    docs = table(spark, sf_dir, "documents")
    s = docs.select(
        "doc_id", F.explode(shingles_of(F.col("text"))).alias("shingle")
    ).withColumn(
        "n_docs", F.count(F.lit(1)).over(Window.partitionBy("shingle"))
    )
    dup = (F.col("n_docs") >= DUP_SPAN_MIN_DOCS).cast("long")
    return (
        s.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.sum(dup).alias("n_dup"),
            F.round(
                F.sum(dup) / F.count("*").cast("double"), 4
            ).alias("dup_frac"),
            (
                F.sum(dup) / F.count("*").cast("double")
                >= F.lit(DUP_SPAN_FLAG_FRAC)
            ).alias("flagged"),
        )
    )


# --------------------------------------------------------------------------
# word_pagerank — iterative graph analytics over the co-occurrence graph
# --------------------------------------------------------------------------

PR_DAMPING = 0.85
PR_ITERS = 5


def _pagerank_oracle() -> str:
    """Unrolled fixed-iteration PageRank as chained CTEs (DuckDB side).

    The iteration count is a compile-time constant, so the oracle can
    mirror the Spark loop exactly — same node set, same edge set, same
    update rule — making an otherwise 'iterative, not SQL-expressible'
    algorithm hash-checkable.
    """
    base = f"""
WITH dv AS (
  SELECT DISTINCT doc_id, unnest({sql_tokens('text')}) AS word FROM documents
), dfreq AS (
  SELECT word, count(*) AS df FROM dv GROUP BY word
  HAVING count(*) >= {PMI_MIN_DF}
), dvf AS (
  SELECT dv.doc_id, dv.word FROM dv JOIN dfreq USING (word)
), pair AS (
  SELECT a.word AS w1, b.word AS w2
  FROM dvf a JOIN dvf b ON a.doc_id = b.doc_id AND a.word < b.word
  GROUP BY a.word, b.word
  HAVING count(*) >= {PMI_MIN_PAIR}
), ed AS (
  SELECT w1 AS src, w2 AS dst FROM pair
  UNION ALL
  SELECT w2 AS src, w1 AS dst FROM pair
), deg AS (
  SELECT src AS word, count(*) AS deg FROM ed GROUP BY src
), nodes AS (
  SELECT word FROM dfreq
), nn AS (
  SELECT count(*) AS n FROM nodes
), r0 AS (
  SELECT word, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn
)"""
    for i in range(1, PR_ITERS + 1):
        base += f""", r{i} AS (
  SELECT nodes.word,
         (1 - {PR_DAMPING}) / nn.n + {PR_DAMPING} * COALESCE(inc.s, 0) AS rank
  FROM nodes CROSS JOIN nn
  LEFT JOIN (
    SELECT ed.dst AS word, sum(r{i - 1}.rank / deg.deg) AS s
    FROM ed JOIN r{i - 1} ON ed.src = r{i - 1}.word
            JOIN deg ON ed.src = deg.word
    GROUP BY ed.dst
  ) inc USING (word)
)"""
    return base + f"""
SELECT word, round(rank, 6) + 0 AS pagerank FROM r{PR_ITERS}
"""


@register(
    "word_pagerank",
    oracle=_pagerank_oracle(),
    description=f"{PR_ITERS}-iteration PageRank over the word co-occurrence graph",
    tags=("training", "text", "graph", "iterative"),
)
def q_word_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Centrality mining on the word co-occurrence graph: nodes are
    words above the PMI document-frequency floor, edges are pairs
    co-occurring in >= PMI_MIN_PAIR documents, and rank follows the
    standard damped update ``r(w) = (1-d)/N + d * sum(r(src)/deg(src))``
    for a fixed ``PR_ITERS`` iterations.  Demonstrates the engine's
    iterative-computation shape (like ``near_dup_clusters``) with a
    hash-checkable oracle: the same loop unrolled into chained CTEs.

    100 TB shape: the graph is vocabulary-sized (Zipf-bounded nodes,
    min-pair-floored edges), built once from one corpus scan via the
    same bounded per-doc vocab self-join as ``pmi_cooccurrence``.  Each
    iteration is one edge-keyed join plus one dst-keyed aggregate over
    the VOCAB-sized rank table — corpus data is never touched again.
    Lineage is truncated per round (``materialize``: localCheckpoint
    locally, reliable checkpoint when a checkpoint dir is
    configured) so the plan does not deepen with
    iterations, and N arrives as a broadcast single-row aggregate, not
    a driver count().
    """
    docs = table(spark, sf_dir, "documents")
    # per-doc distinct vocab with NO exchange: dedup is array-local
    dv = tokenize_documents_distinct(docs)
    dfreq = (
        dv.groupBy("word")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= PMI_MIN_DF)
    )
    dvf = dv.join(dfreq.select("word"), "word")  # vocab-sized: AQE decides (r7)
    a = dvf.select("doc_id", F.col("word").alias("w1"))
    b = dvf.select("doc_id", F.col("word").alias("w2"))
    pair = (
        a.join(b, ["doc_id"])
        .filter(F.col("w1") < F.col("w2"))
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= PMI_MIN_PAIR)
    )
    ed = pair.select(
        F.col("w1").alias("src"), F.col("w2").alias("dst")
    ).unionAll(pair.select(F.col("w2").alias("src"), F.col("w1").alias("dst")))
    deg = ed.groupBy("src").agg(F.count("*").alias("deg"))
    edv = ed.join(deg, "src").transform(materialize, eager=False)
    nodes = dfreq.select("word").transform(materialize, eager=False)
    nn = nodes.agg(F.count("*").alias("n"))

    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "word", (F.lit(1.0) / F.col("n")).alias("rank")
    )
    for _ in range(PR_ITERS):
        inc = (
            edv.join(ranks.withColumnRenamed("word", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("s"))
            .withColumnRenamed("dst", "word")
        )
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .join(inc, "word", "left")
            .select(
                "word",
                (
                    F.lit(1 - PR_DAMPING) / F.col("n")
                    + F.lit(PR_DAMPING) * F.coalesce(F.col("s"), F.lit(0.0))
                ).alias("rank"),
            )
            .transform(materialize, eager=False)
        )
    return ranks.select(
        "word", (F.round("rank", 6) + F.lit(0.0)).alias("pagerank")
    )


# --------------------------------------------------------------------------
# bpe_vocab — BPE-style tokenizer-vocabulary induction
# --------------------------------------------------------------------------

BPE_MERGES = 10


@register(
    "bpe_vocab",
    oracle=None,  # data-dependent control flow: the argmax pair of
    # iteration k decides the plan of iteration k+1, so no fixed SQL can
    # mirror it; verified instead by the symbol-count-contraction and
    # determinism properties in tests/test_training_ops.py.
    description=f"top-{BPE_MERGES} BPE merges learned from corpus word frequencies",
    tags=("training", "text", "iterative", "tokenizer"),
)
def q_bpe_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding merge-table induction — tokenizer training as
    a Spark job.  Classic recipe: collapse the corpus to a word
    frequency table, represent words as symbol arrays, then repeatedly
    (a) count adjacent symbol pairs weighted by word frequency, (b)
    take the globally most frequent pair (ties broken lexicographically
    so the result is deterministic), (c) greedily merge its
    non-overlapping occurrences left-to-right in every word.

    100 TB shape: the corpus is touched ONCE (the word-frequency
    aggregation — the same Zipf-bounded table every vocab op here
    uses); all ``BPE_MERGES`` iterations run on that vocabulary-sized
    table.  Per iteration: one explode+agg for pair counts (map-side
    partial on vocab rows) and one driver fetch of exactly ONE row (the
    argmax — the learned model parameter, same pattern as the IVF
    centroid pull); the merge itself is an array-local fold, no
    shuffle.  State is materialized per round (eager localCheckpoint)
    so iteration k+1 never re-executes iteration k.
    """
    docs = table(spark, sf_dir, "documents")
    wf = (
        tokenize_documents(docs)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    syms = wf.select(
        "freq",
        F.filter(F.split("word", ""), lambda c: c != "").alias("arr"),
    ).transform(materialize)

    merges: list[tuple[int, str, str, int]] = []
    for rank in range(1, BPE_MERGES + 1):
        n = F.size("arr")
        pair_counts = (
            syms.filter(n >= 2)
            .select(
                "freq",
                F.explode(
                    F.zip_with(
                        F.slice("arr", 1, n - 1),
                        F.slice(F.col("arr"), 2, n - 1),
                        lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("cnt"))
        )
        top = pair_counts.orderBy(
            F.desc("cnt"), F.asc("l"), F.asc("r")
        ).first()
        if top is None:
            break
        left, right, cnt = top.l, top.r, int(top.cnt)
        merges.append((rank, left, right, cnt))
        tok = left + right
        merged = F.aggregate(
            "arr",
            F.expr("CAST(array() AS array<string>)"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(left))
                & (x == F.lit(right)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(tok))
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        syms = syms.select("freq", merged.alias("arr")).transform(materialize)

    return spark.createDataFrame(
        merges, "merge_rank int, left string, right string, pair_freq bigint"
    )


# --------------------------------------------------------------------------
# bpe_encode — apply a fixed merge table to the corpus
# --------------------------------------------------------------------------

# The merge table is the FIXED artifact a production encode job takes as
# input (training produced it earlier — see q_bpe_vocab); hard-coding a
# valid learned-order table (each side is a char or an earlier merge's
# token) is what makes the query oracle-able: bpe_vocab itself has
# data-dependent control flow, but encoding against a given table is a
# pure per-word function both engines can express.
BPE_ENCODE_TABLE: tuple[tuple[str, str], ...] = (
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("an", "d"), ("in", "g"),
)
BPE_ENCODE_TOPK = 100


def bpe_fold_merge(arr: F.Column, left: str, right: str) -> F.Column:
    """One full left-to-right non-overlapping merge pass of (left,
    right) -> left+right over a token array, as a pure Catalyst fold
    (same kernel the bpe_vocab trainer uses per iteration)."""
    tok = left + right
    return F.aggregate(
        arr,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(tok))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _duck_bpe_tokens() -> str:
    """DuckDB expression computing the same sequential merge folds over
    ``word``: each pass is a ``list_reduce`` whose accumulator is the
    '|'-joined encoded prefix (tokens are [a-z]+, so '|' never collides
    and LIKE needs no escaping), re-split between passes."""
    toks = "string_split(word, '')"
    for left, right in BPE_ENCODE_TABLE:
        fold = (
            f"list_reduce({toks}, (acc, x) -> CASE WHEN "
            f"(acc = '{left}' OR acc LIKE '%|{left}') AND x = '{right}' "
            f"THEN substr(acc, 1, length(acc) - {len(left)}) || '{left + right}' "
            f"ELSE acc || '|' || x END)"
        )
        toks = f"string_split({fold}, '|')"
    return toks


@register(
    "bpe_encode",
    oracle=f"""
WITH wf AS (
  SELECT word, count(*) AS freq
  FROM (SELECT unnest({sql_tokens('text')}) AS word FROM documents)
  GROUP BY word
), enc AS (
  SELECT freq, unnest({_duck_bpe_tokens()}) AS token FROM wf
)
SELECT token, CAST(sum(freq) AS BIGINT) AS n_occurrences
FROM enc GROUP BY token
ORDER BY n_occurrences DESC, token ASC
LIMIT {BPE_ENCODE_TOPK}
""",
    description=f"corpus encoded with a fixed {len(BPE_ENCODE_TABLE)}-merge BPE table: top-{BPE_ENCODE_TOPK} token occurrence counts",
    tags=("training", "text", "tokenizer"),
)
def q_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE *apply* — the missing half of ``bpe_vocab``: tokenize the
    corpus into subword units using a learned merge table, the job an
    LLM pipeline runs over all data every time it re-tokenizes.

    Merges are applied SEQUENTIALLY in rank order, each as one full
    left-to-right non-overlapping pass.  For a table learned in BPE
    training order this equals the canonical min-rank-pair-first
    algorithm (tests/test_training_ops.py proves it against a Python
    reference on the live vocab): merges only ever CREATE longer
    tokens, and merge k's sides predate rank k, so completing pass k
    can never re-open an opportunity for a pass j < k.

    100 TB shape: the corpus is touched ONCE (the word-frequency
    aggregation); every fold runs on the Zipf-bounded DISTINCT-word
    table, so encode cost is vocabulary-sized, not corpus-sized, and
    the whole chain is Catalyst expressions — zero Python, zero extra
    shuffles (one word agg, one token agg, TakeOrdered).  The
    12-literal table compiles into the plan; a production-sized 50k
    table would swap the fold chain for an Arrow-batched pandas UDF
    over the same vocab-sized input with the merge-rank dict in the
    task closure — the input stays the distinct-word table either way.
    """
    docs = table(spark, sf_dir, "documents")
    wf = (
        tokenize_documents(docs)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )
    enc = F.filter(F.split("word", ""), lambda c: c != "")
    for left, right in BPE_ENCODE_TABLE:
        enc = bpe_fold_merge(enc, left, right)
    return (
        wf.select("freq", F.explode(enc).alias("token"))
        .groupBy("token")
        .agg(F.sum("freq").alias("n_occurrences"))
        .orderBy(F.desc("n_occurrences"), F.asc("token"))
        .limit(BPE_ENCODE_TOPK)
    )


# --------------------------------------------------------------------------
# skipgram_pairs — position-window co-occurrence counts
# --------------------------------------------------------------------------

SKIP_WINDOW = 2
SKIP_MIN_PAIR = 5
SKIP_TOP_K = 100


@register(
    "skipgram_pairs",
    oracle=f"""
WITH ptoks AS (
  SELECT doc_id, unnest(words) AS word,
         unnest(generate_series(1, len(words))) AS pos
  FROM (SELECT doc_id, {sql_tokens('text')} AS words FROM documents)
), pair AS (
  SELECT a.word AS center, b.word AS context, count(*) AS n_pair
  FROM ptoks a JOIN ptoks b
    ON a.doc_id = b.doc_id
   AND b.pos BETWEEN a.pos - {SKIP_WINDOW} AND a.pos + {SKIP_WINDOW}
   AND b.pos <> a.pos
  GROUP BY a.word, b.word
  HAVING count(*) >= {SKIP_MIN_PAIR}
)
SELECT center, context, n_pair FROM pair
ORDER BY n_pair DESC, center ASC, context ASC
LIMIT {SKIP_TOP_K}
""",
    description=f"top-{SKIP_TOP_K} skip-gram (center, context) pairs within +/-{SKIP_WINDOW} positions",
    tags=("training", "text", "embedding-prep"),
)
def q_skipgram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The word2vec/GloVe co-occurrence table: (center, context) counts
    within a +/-``SKIP_WINDOW`` token window — positional, unlike
    ``pmi_cooccurrence`` (whole-document co-presence) and wider than
    ``repetition_signals``' adjacent bigrams.  This table IS the input
    to embedding training; producing it at corpus scale is the Spark
    job that precedes any embedding fit.

    100 TB shape: contexts are generated ARRAY-LOCALLY (no positional
    self-join, which would shuffle the corpus twice), then one
    partial-aggregated shuffle on the (center, context) key —
    Zipf-bounded like every vocab table here.  The min-pair floor drops
    the hapax tail before the final top-k sort.  Pair generation is one
    shifted-array ``zip_with`` per offset (2*SKIP_WINDOW slices total):
    a per-position slice/filter lambda computed the same pairs ~3.4x
    slower (measured 4.9 s -> 1.45 s at sf0.1) because it re-sliced the
    token array once per token instead of once per offset.
    """
    from ..functions.text import tokens_of

    docs = table(spark, sf_dir, "documents")
    # NAME the token array instead of inlining tokens_of into every
    # slice: the pair expression references it ~16 times, and
    # CollapseProject will not inline a non-cheap multiply-referenced
    # alias back, so the tokenizer runs once per row instead of per
    # reference (measured 1.9 -> 1.65 s warm at sf0.1; the win is pure
    # tokenize CPU, so it scales with the corpus)
    docs = docs.select(tokens_of(F.col("text")).alias("toks"))
    t = F.col("toks")
    n = F.size(t)

    def offset_pairs(d: int) -> list[F.Column]:
        # tokens i and i+d pair both ways: (t[i] center, t[i+d] context)
        # and the reverse — two struct arrays from one pair of slices
        lead = F.slice(t, 1, F.greatest(n - d, F.lit(0)))
        lag = F.slice(t, 1 + d, F.greatest(n - d, F.lit(0)))
        return [
            F.zip_with(
                lead, lag,
                lambda a, b: F.struct(a.alias("center"), b.alias("context")),
            ),
            F.zip_with(
                lead, lag,
                lambda a, b: F.struct(b.alias("center"), a.alias("context")),
            ),
        ]

    pairs = F.flatten(
        F.array(*[p for d in range(1, SKIP_WINDOW + 1) for p in offset_pairs(d)])
    )
    return (
        docs.select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.center").alias("center"), F.col("p.context").alias("context"))
        .agg(F.count("*").alias("n_pair"))
        .filter(F.col("n_pair") >= SKIP_MIN_PAIR)
        .orderBy(F.desc("n_pair"), F.asc("center"), F.asc("context"))
        .limit(SKIP_TOP_K)
    )


# --------------------------------------------------------------------------
# negative_sampling_table — the word2vec unigram^0.75 sampling ranges
# --------------------------------------------------------------------------

NEG_POWER = 0.75
NEG_TOP = 200  # table over the most frequent words (production: full vocab)


@register(
    "negative_sampling_table",
    oracle=f"""
WITH toks AS (
  SELECT unnest({sql_tokens('text')}) AS word FROM documents
), wc AS (
  SELECT word, count(*) AS n FROM toks GROUP BY word
), top AS (
  SELECT word, n,
         row_number() OVER (ORDER BY n DESC, word ASC) AS rnk
  FROM wc
), pw AS (
  SELECT word, n, rnk, pow(n, {NEG_POWER}) AS w
  FROM top WHERE rnk <= {NEG_TOP}
), tot AS (
  SELECT sum(w) AS tw FROM pw
)
SELECT word, n, rnk,
       round(w / tw, 6) + 0 AS p,
       round(COALESCE(SUM(w) OVER (ORDER BY rnk
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) / tw, 6) + 0
         AS cum_lo
FROM pw CROSS JOIN tot
""",
    description=f"word2vec negative-sampling table: unigram^{NEG_POWER} probs + cumulative ranges",
    tags=("training", "text", "embedding-prep"),
)
def q_negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The other half of skip-gram prep (``skipgram_pairs`` emits the
    positives): negative samples draw from the unigram distribution
    raised to 0.75, materialized as (p, cum_lo) ranges so a
    uniform draw binary-searches the cumulative column — the exact
    word2vec construction.

    Scale: one corpus-token aggregation; everything after is
    vocabulary-sized (the rank window, the power fold, the cumulative
    window over 200 rows).  The total is a 1-row aggregate
    broadcast back — the corpus never reshuffles."""
    toks = tokenize_documents(table(spark, sf_dir, "documents"))
    wc = toks.groupBy("word").agg(F.count("*").alias("n"))
    w_rank = Window.orderBy(F.desc("n"), F.asc("word"))
    top = (
        wc.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= NEG_TOP)
        .withColumn("w", F.pow("n", F.lit(NEG_POWER)))
    )
    tot = top.agg(F.sum("w").alias("tw"))
    w_cum = Window.orderBy("rnk").rowsBetween(Window.unboundedPreceding, -1)
    return (
        top.withColumn("cum_w", F.coalesce(F.sum("w").over(w_cum), F.lit(0.0)))
        .crossJoin(F.broadcast(tot))
        .select(
            "word",
            "n",
            "rnk",
            (F.round(F.col("w") / F.col("tw"), 6) + F.lit(0.0)).alias("p"),
            (F.round(F.col("cum_w") / F.col("tw"), 6) + F.lit(0.0)).alias("cum_lo"),
        )
    )


# --------------------------------------------------------------------------
# word_triangles — triangle counting over the co-occurrence graph
# --------------------------------------------------------------------------

TRI_MIN_PAIR = 5  # edge = pair co-occurring in at least this many docs


@register(
    "word_triangles",
    oracle=f"""
WITH dv AS (
  SELECT DISTINCT doc_id, unnest({sql_tokens('text')}) AS word FROM documents
), pair AS (
  SELECT a.word AS w1, b.word AS w2
  FROM dv a JOIN dv b ON a.doc_id = b.doc_id AND a.word < b.word
  GROUP BY a.word, b.word
  HAVING count(*) >= {TRI_MIN_PAIR}
), tri AS (
  SELECT e1.w1 AS a, e1.w2 AS b, e2.w2 AS c
  FROM pair e1
  JOIN pair e2 ON e2.w1 = e1.w2
  JOIN pair e3 ON e3.w1 = e1.w1 AND e3.w2 = e2.w2
), pertri AS (
  SELECT word, count(*) AS n_triangles FROM (
    SELECT a AS word FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY word
)
SELECT word, n_triangles FROM pertri
ORDER BY n_triangles DESC, word ASC
LIMIT 25
""",
    description="per-word triangle counts over the >=5-doc co-occurrence graph (top 25)",
    tags=("training", "text", "graph"),
)
def q_word_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting — the classic graph-analytics shape the
    iterative ops (PageRank, components) don't cover: clustering
    structure of the word co-occurrence graph via the ordered-wedge
    join (a<b<c, so each triangle is generated exactly once and no
    orientation dedup pass is needed).

    Scale: the edge list is vocabulary-sized (pairs thresholded at
    5+ shared docs — the same sparse-pair discipline as
    PMI), and the wedge join's fan-out is bounded by per-node degree;
    at web scale the standard mitigation is degree-ordering (orient
    edges from low to high degree), which the a<b<c ordering
    approximates for Zipf graphs since frequent words sort everywhere.
    Pair generation is ARRAY-LOCAL (r7, market_basket's pattern): the
    ordered pairs come from a sorted per-doc vocab array inside
    codegen, so the corpus is tokenized ONCE and there is no doc_id
    self-join — the raw token stream never shuffles at all; the first
    exchange is the partial-aggregated (w1, w2) pair count.  Shuffles:
    pair agg, wedge join, closing semi-join."""
    docs = table(spark, sf_dir, "documents")
    v = F.array_sort(F.array_distinct(tokens_of(F.col("text"))))
    varr = docs.select(v.alias("v"))
    vcol = F.col("v")
    pair_structs = F.flatten(
        F.transform(
            vcol,
            lambda x, i: F.transform(
                F.slice(vcol, i + F.lit(2), F.size(vcol)),
                lambda y: F.struct(x.alias("w1"), y.alias("w2")),
            ),
        )
    )
    # r13 (optimization round, guide §2.4/§3.3): the edge list feeds
    # THREE join aliases, and each of the per-corner union branches
    # below re-planned the whole wedge join — the executed plan held
    # NINE copies of the scan+tokenize+pair-aggregate subtree (runtime
    # ReuseExchange recovered some, but three corpus tokenize passes
    # survived).  The edge list is bounded state (vocabulary pairs
    # thresholded at >= TRI_MIN_PAIR shared docs — the same class as
    # near_dup_clusters' pair set), so materialize it ONCE; every
    # consumer reads the store and the corpus is scanned exactly once.
    pair = materialize(
        varr.select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= TRI_MIN_PAIR)
        .select("w1", "w2")
    )
    e1, e2, e3 = pair.alias("e1"), pair.alias("e2"), pair.alias("e3")
    tri = (
        e1.join(e2, F.col("e2.w1") == F.col("e1.w2"))
        .join(
            e3,
            (F.col("e3.w1") == F.col("e1.w1"))
            & (F.col("e3.w2") == F.col("e2.w2")),
        )
        .select(
            F.col("e1.w1").alias("a"),
            F.col("e1.w2").alias("b"),
            F.col("e2.w2").alias("c"),
        )
    )
    # one corner stream via explode instead of a 3-way union — the
    # union form executed the triangle join once PER CORNER; explode of
    # [a, b, c] is row-for-row the same stream off a single execution
    per = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("n_triangles"))
    )
    return per.orderBy(F.desc("n_triangles"), F.asc("word")).limit(25)


# --------------------------------------------------------------------------
# epoch_shuffle — deterministic global training-order shuffle
# --------------------------------------------------------------------------

# Knuth multiplicative hash over doc_id: portable BIGINT arithmetic
# (doc_id * MULT stays far below 2^63, so Spark and DuckDB compute the
# identical value — no engine-specific hash anywhere).
_SHUF_MULT = 2_654_435_761
_SHUF_ADD = 104_729
_SHUF_MOD = 1_000_000_007
# hash-range bucket count: positions are ranked per bucket and offset
# by bucket counts, so no task ever orders more than ~corpus/NB rows —
# and because the hash is uniform, buckets are balanced BY CONSTRUCTION
# (unlike quality/language keys, hash-range sharding cannot skew).
_SHUF_BUCKETS = 4096
_SHUF_SHARDS = 16


@register(
    "epoch_shuffle",
    # The oracle states the spec: one global rank over the
    # deterministic hash order.  The engine's bucket decomposition is
    # exact (bucket = floor(h / width) is monotone in h), so every
    # output row is identical.
    oracle=f"""
WITH h AS (
  SELECT doc_id,
         ((doc_id % {_SHUF_MOD}) * ({_SHUF_MULT} % {_SHUF_MOD})
          + {_SHUF_ADD}) % {_SHUF_MOD} AS h
  FROM documents
), r AS (
  SELECT doc_id, h,
         row_number() OVER (ORDER BY h, doc_id) - 1 AS pos
  FROM h
)
SELECT doc_id, CAST(h AS BIGINT) AS h, CAST(pos AS BIGINT) AS pos,
       CAST(pos % {_SHUF_SHARDS} AS BIGINT) AS shard
FROM r
""",
    description=f"deterministic global training-order shuffle into {_SHUF_SHARDS} shards",
    tags=("training", "pipeline"),
)
def q_epoch_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Assign every document a deterministic pseudo-random position in
    the training order (and a round-robin shard), the way a pretraining
    pipeline fixes an epoch's example order reproducibly: order by a
    multiplicative hash of doc_id, rank, shard by ``pos % k``.

    100 TB shape: a global rank is the canonical
    don't-run-one-window-task problem, and the hash key makes it
    easier than token_budget_select's quality key: bucket by hash
    RANGE (``floor(h / width)`` — monotone, so bucket order IS hash
    order) and the uniform hash balances buckets by construction.
    Within-bucket ``row_number`` tasks see ~corpus/{_SHUF_BUCKETS}
    rows; bucket counts reach their exchange through a map-side
    partial count (one row per bucket per task — the corpus itself
    never shuffles twice); the {_SHUF_BUCKETS}-row offsets window and
    the AQE-broadcast join-back follow token_budget_select's pinned
    pattern.  The parquet scan reads exactly ONE column (doc_id) —
    column pruning leaves text/embedding bytes on disk, so the whole
    job moves 8 bytes per document plus the hash.
    """
    docs = table(spark, sf_dir, "documents")
    width = _SHUF_MOD // _SHUF_BUCKETS + 1
    # mod-reduce before multiplying: (doc_id %% m) * (mult %% m) never
    # exceeds ~1e18, so the product is int64-safe for ANY doc_id
    # (doc_id * mult directly would overflow past doc_id ~3.4e9)
    h = (
        (F.col("doc_id") % _SHUF_MOD) * (_SHUF_MULT % _SHUF_MOD) + _SHUF_ADD
    ) % _SHUF_MOD
    q = docs.select("doc_id", h.alias("h")).select(
        "doc_id", "h", F.floor(F.col("h") / width).alias("bucket")
    ).filter(F.col("h").isNotNull() & F.col("bucket").isNotNull())
    w_in = Window.partitionBy("bucket").orderBy("h", "doc_id")
    ranked = q.withColumn("rn", F.row_number().over(w_in))
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        q.groupBy("bucket")
        .agg(F.count("*").alias("n"))
        .withColumn("offset", F.coalesce(F.sum("n").over(w_b), F.lit(0)))
        .select("bucket", "offset")
    )
    return (
        ranked.join(offsets, "bucket")
        .select(
            "doc_id",
            "h",
            (F.col("offset") + F.col("rn") - 1).cast("long").alias("pos"),
            ((F.col("offset") + F.col("rn") - 1) % _SHUF_SHARDS)
            .cast("long")
            .alias("shard"),
        )
    )
