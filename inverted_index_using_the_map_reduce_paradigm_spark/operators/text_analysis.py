"""Text-analysis operators (north-star extension, SURVEY.md §2.3).

The LLM-training-data text toolkit over the ``documents`` table:
TF-IDF, n-grams, per-language corpus stats, stopword-lexicon language
ID, heuristic quality scoring, token counting (whitespace + BPE-ish
regex), and a polynomial document fingerprint.

Everything is built-in ``pyspark.sql.functions`` — zero Python UDFs —
so the whole family stays in WholeStageCodegen.  Scale notes per
operator in the docstrings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..data import table
from ..functions.text import sql_tokens, tokenize_documents, tokens_of
from ..registry import register
from .inverted_index import SQL_TOKS_CTE

# --------------------------------------------------------------------------
# tf_idf
# --------------------------------------------------------------------------


@register(
    "tf_idf",
    oracle=f"""
{SQL_TOKS_CTE}
, tf AS (
  SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word
), dfreq AS (
  SELECT word, count(DISTINCT doc_id) AS df FROM toks GROUP BY word
), n AS (
  SELECT count(*) AS n_docs FROM documents
)
SELECT tf.doc_id, tf.word, tf.tf,
       round(tf.tf * ln(n.n_docs / dfreq.df), 6) AS tf_idf
FROM tf JOIN dfreq USING (word) CROSS JOIN n
""",
    description="TF-IDF weighting: two aggregations + broadcast join on word",
    tags=("text",),
)
def q_tf_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale posture: the ``dfreq`` join is UNHINTED (r7 — see
    SCALE.md "Vocabulary growth"): Heaps' law keeps the vocab sublinear
    but at 100 TB it still reaches 1e7-1e8 rows (multi-GB serialized),
    past safe executor broadcast; AQE's runtime size check picks
    broadcast at small scale and a word-keyed shuffle join at large.
    N arrives via a 1-row broadcast cross join.

    Tokenize-once (r7): ``df`` is attached to the ``tf`` aggregate via
    ``count(*) over (partition by word)`` (tf rows are unique per
    (doc_id, word), so the per-word row count IS the document
    frequency) instead of re-aggregating the raw token stream into a
    second ``dfreq`` table and joining it back.  One linear chain —
    the corpus is scanned and TOKENIZED exactly once (previously two
    Generate(explode) subtrees ran, doubling the dominant cost at
    100 TB; only the scan's round-robin exchange was AQE-reused), and
    the word-keyed join disappears with its demoted-hint question:
    the word shuffle the window needs is the same shuffle the
    non-broadcast join would have needed, minus the join's second
    tokenize and build side.  Same pattern as ``doc_entropy``'s
    per-doc total.  Pinned by ``test_plan_quality``."""
    docs = table(spark, sf_dir, "documents")
    toks = tokenize_documents(docs)
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    n = docs.select(F.count("*").alias("n_docs"))
    return (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("word")))
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "word",
            "tf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6).alias(
                "tf_idf"
            ),
        )
    )


# --------------------------------------------------------------------------
# ngrams
# --------------------------------------------------------------------------


@register(
    "ngrams",
    oracle=f"""
WITH d AS (
  SELECT doc_id, {sql_tokens('text')} AS t FROM documents
), pos AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i FROM d
)
SELECT t[i] || ' ' || t[i+1] AS bigram, count(*) AS n
FROM pos GROUP BY bigram
ORDER BY n DESC, bigram ASC
LIMIT 50
""",
    description="word bigram counts (zip_with over the token array), top 50",
    tags=("text",),
)
def q_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigrams as ``zip_with(t[:-1], t[1:])`` — array-local, no extra
    shuffle before the count aggregation."""
    docs = table(spark, sf_dir, "documents")
    # name the token array (see skipgram_pairs): the bigram expression
    # references it 5x; a named non-cheap alias is not inlined back, so
    # the tokenizer runs once per row instead of per reference
    docs = docs.select(tokens_of(F.col("text")).alias("toks"))
    t = F.col("toks")
    bigrams = F.zip_with(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        docs.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(50)
    )


# --------------------------------------------------------------------------
# text_stats
# --------------------------------------------------------------------------


@register(
    "text_stats",
    oracle=f"""
{SQL_TOKS_CTE}
, per_doc AS (
  SELECT d.doc_id, d.lang, d.n_chars, count(t.word) AS n_tokens
  FROM documents d LEFT JOIN toks t USING (doc_id)
  GROUP BY d.doc_id, d.lang, d.n_chars
), distinct_words AS (
  SELECT d.lang, count(DISTINCT t.word) AS n_distinct_words
  FROM documents d JOIN toks t USING (doc_id) GROUP BY d.lang
)
SELECT p.lang,
       count(*) AS n_docs,
       CAST(sum(p.n_tokens) AS BIGINT) AS n_tokens,
       any_value(w.n_distinct_words) AS n_distinct_words,
       round(avg(p.n_chars), 2) AS avg_chars
FROM per_doc p JOIN distinct_words w USING (lang)
GROUP BY p.lang
""",
    description="per-language corpus stats: docs, tokens, distinct vocab, avg length",
    tags=("text",),
)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    # `lang` rides through the explode itself (extra_cols) — NO join:
    # the alternative (joining the token stream back to a broadcast of
    # doc_id->lang) broadcasts one row per *document*, which is corpus-
    # sized and OOMs at scale.  Carrying the column is free: it is one
    # extra parquet column pruned at the scan, duplicated per token.
    toks = tokenize_documents(docs, extra_cols=["lang"])
    per_lang = toks.groupBy("lang").agg(
        F.count("*").alias("n_tokens"),
        F.countDistinct("word").alias("n_distinct_words"),
    )
    doc_lang = docs.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.round(F.avg("n_chars"), 2).alias("avg_chars"),
    )
    return doc_lang.join(per_lang, "lang").select(
        "lang", "n_docs", "n_tokens", "n_distinct_words", "avg_chars"
    )


# --------------------------------------------------------------------------
# lang_id — stopword-lexicon heuristic
# --------------------------------------------------------------------------

# Tiny deterministic per-language function-word lexicons.  On the real web
# corpus these would be the usual top-k stopword lists; the mechanism
# (broadcast lexicon join + per-doc argmax) is the operator under test.
LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "es": ("el", "la", "de", "que"),
    "de": ("der", "die", "und", "das"),
    "fr": ("le", "la", "et", "les"),
}


def _lexicon_rows() -> list[tuple[str, str]]:
    return [(lang, w) for lang, ws in LEXICONS.items() for w in ws]


_LEX_SQL_VALUES = ", ".join(f"('{lang}', '{w}')" for lang, w in _lexicon_rows())


@register(
    "lang_id",
    oracle=f"""
{SQL_TOKS_CTE}
, lex(lex_lang, word) AS (VALUES {_LEX_SQL_VALUES}),
hits AS (
  SELECT t.doc_id, l.lex_lang, count(*) AS hits
  FROM toks t JOIN lex l USING (word)
  GROUP BY t.doc_id, l.lex_lang
), ranked AS (
  SELECT doc_id, lex_lang, hits,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY hits DESC, lex_lang ASC) AS rn
  FROM hits
)
SELECT doc_id, lex_lang AS predicted_lang, hits FROM ranked WHERE rn = 1
""",
    description="language ID: broadcast stopword-lexicon join + per-doc argmax",
    tags=("text",),
)
def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale posture: the lexicon is a few-hundred-row broadcast; the
    argmax is a window over (doc_id) — WindowGroupLimit prunes it to a
    streaming top-1 per group."""
    toks = tokenize_documents(table(spark, sf_dir, "documents"))
    lex = F.broadcast(
        toks.sparkSession.createDataFrame(_lexicon_rows(), ["lex_lang", "word"])
    )
    hits = toks.join(lex, "word").groupBy("doc_id", "lex_lang").agg(
        F.count("*").alias("hits")
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("lex_lang"))
    return (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("lex_lang").alias("predicted_lang"), "hits")
    )


# --------------------------------------------------------------------------
# quality_score
# --------------------------------------------------------------------------

STOPWORDS = ("the", "a", "of", "and", "to", "in")
_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)


@register(
    "quality_score",
    oracle=f"""
WITH base AS (
  SELECT doc_id,
         length(text) AS n_chars_text,
         {sql_tokens('text')} AS t,
         len(regexp_extract_all(text, '[^a-zA-Z0-9 ]')) AS n_punct
  FROM documents
), m AS (
  SELECT doc_id, n_chars_text, n_punct,
         len(t) AS n_tokens,
         len(list_filter(t, w -> w IN ({_STOP_SQL}))) AS n_stop
  FROM base
)
SELECT doc_id, n_tokens,
       round(n_punct / greatest(n_chars_text, 1), 6) AS punct_ratio,
       round(n_stop / greatest(n_tokens, 1), 6) AS stopword_ratio,
       round(least(n_tokens / 64.0, 1.0) * (1 - n_punct / greatest(n_chars_text, 1)), 6)
         AS quality
FROM m
""",
    description="heuristic doc quality: length / punctuation / stopword ratios",
    tags=("text",),
)
def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure per-row projection — no shuffle at all; survives any scale."""
    docs = table(spark, sf_dir, "documents")
    t = tokens_of(F.col("text"))
    base = docs.select(
        "doc_id",
        F.length("text").alias("n_chars_text"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[^a-zA-Z0-9 ]"), 0)).alias(
            "n_punct"
        ),
        F.size(t).alias("n_tokens"),
        F.size(F.filter(t, lambda w: w.isin(*STOPWORDS))).alias("n_stop"),
    )
    punct_ratio = F.col("n_punct") / F.greatest(F.col("n_chars_text"), F.lit(1))
    return base.select(
        "doc_id",
        "n_tokens",
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(
            F.col("n_stop") / F.greatest(F.col("n_tokens"), F.lit(1)), 6
        ).alias("stopword_ratio"),
        F.round(
            F.least(F.col("n_tokens") / F.lit(64.0), F.lit(1.0)) * (1 - punct_ratio), 6
        ).alias("quality"),
    )


# --------------------------------------------------------------------------
# token_count — whitespace + BPE-ish regex segmentation
# --------------------------------------------------------------------------

BPE_ISH = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@register(
    "token_count",
    oracle=f"""
SELECT doc_id,
       len(list_filter(regexp_split_to_array(text, '\\s+'), x -> length(x) > 0))
         AS ws_tokens,
       len(regexp_extract_all(text, '{BPE_ISH}')) AS bpe_ish_tokens
FROM documents
""",
    description="token counting: whitespace tokens + BPE-ish regex pieces",
    tags=("text",),
)
def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.col("text"), r"\s+"), lambda x: F.length(x) > 0)
    return docs.select(
        "doc_id",
        F.size(ws).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH), 0)).alias(
            "bpe_ish_tokens"
        ),
    )


# --------------------------------------------------------------------------
# redact_pii — regex scrubbing for training-data hygiene
# --------------------------------------------------------------------------

# Deterministic, portable regexes (no lookaround -- RE2/Java/DuckDB safe).
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_RE = "\\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
LONG_NUM_RE = "[0-9]{9,}"


@register(
    "redact_pii",
    oracle=f"""
WITH r AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{PHONE_RE}', '<PHONE>', 'g'),
           '{LONG_NUM_RE}', '<NUM>', 'g') AS redacted
  FROM documents
)
SELECT doc_id,
       length(redacted) AS n_chars_redacted,
       len(regexp_extract_all(redacted, '<EMAIL>|<PHONE>|<NUM>')) AS n_redactions,
       md5(redacted) AS redacted_md5
FROM r
""",
    description="PII scrubbing: email/phone/long-number regex redaction",
    tags=("text", "hygiene"),
)
def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row regexp_replace chain — no shuffle, stays in codegen; the
    md5 of the redacted text makes the oracle compare the full output
    without shipping document bodies through the value hash.  The
    fixture corpus has no real PII, so redaction is usually a no-op;
    the regex plumbing (and its determinism across engines) is what's
    under test."""
    docs = table(spark, sf_dir, "documents")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), EMAIL_RE, "<EMAIL>"),
            PHONE_RE,
            "<PHONE>",
        ),
        LONG_NUM_RE,
        "<NUM>",
    )
    return docs.select(
        "doc_id",
        F.length(redacted).alias("n_chars_redacted"),
        F.size(
            F.regexp_extract_all(redacted, F.lit("<EMAIL>|<PHONE>|<NUM>"), 0)
        ).alias("n_redactions"),
        F.md5(redacted).alias("redacted_md5"),
    )


# --------------------------------------------------------------------------
# doc_fingerprint — position-weighted polynomial hash mod p
# --------------------------------------------------------------------------

MOD = 1_000_000_007


@register(
    "doc_fingerprint",
    oracle=f"""
WITH p AS (
  SELECT doc_id, text, unnest(generate_series(1, length(text))) AS i
  FROM documents
)
SELECT doc_id, CAST(sum(i * ascii(text[i])) % {MOD} AS BIGINT) AS fingerprint
FROM p GROUP BY doc_id
""",
    description="deterministic position-weighted polynomial document fingerprint",
    tags=("text", "dedup"),
)
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Computed array-locally with ``aggregate`` over a struct accumulator
    (position, sum) — exact integer math, no shuffle beyond the scan."""
    docs = table(spark, sf_dir, "documents")
    chars = F.split(F.col("text"), "")
    acc = F.aggregate(
        chars,
        F.struct(F.lit(0).cast("long").alias("i"), F.lit(0).cast("long").alias("s")),
        lambda a, c: F.struct(
            (a["i"] + 1).alias("i"), (a["s"] + (a["i"] + 1) * F.ascii(c)).alias("s")
        ),
        lambda a: a["s"] % MOD,
    )
    return docs.select("doc_id", acc.alias("fingerprint"))


@register(
    "collection_functions",
    oracle=f"""
WITH t AS (
  SELECT doc_id, {sql_tokens('text')} AS words FROM documents
)
SELECT doc_id,
       len(words) AS n_words,
       array_to_string(words[1:3], ' ') AS first3,
       array_to_string(list_reverse(words)[1:3], ' ') AS last3_rev,
       array_to_string(list_sort(list_distinct(words)), ' ') AS vocab,
       len(list_filter(words, w -> length(w) >= 5)) AS n_long,
       list_sort(list_distinct(words))[1] AS first_alpha,
       array_to_string(list_transform(words[1:1], w -> upper(w)), ' ') AS head_upper
FROM t WHERE len(words) > 0
""",
    description="collection-function gallery: slice/reverse/distinct/filter/transform",
    tags=("text", "functions", "collection"),
)
def q_collection_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The array scalar family the reference lacks entirely (SURVEY.md
    §2.2) over the token arrays: slicing, reversal, dedup + sort,
    predicate counting, element access, per-element transforms — all
    one shuffle-free projection."""
    docs = table(spark, sf_dir, "documents")
    words = tokens_of(F.col("text"))
    base = docs.select("doc_id", words.alias("words")).filter(F.size("words") > 0)
    vocab = F.array_sort(F.array_distinct("words"))
    return base.select(
        "doc_id",
        F.size("words").alias("n_words"),
        F.concat_ws(" ", F.slice("words", 1, 3)).alias("first3"),
        F.concat_ws(" ", F.slice(F.reverse("words"), 1, 3)).alias("last3_rev"),
        F.concat_ws(" ", vocab).alias("vocab"),
        F.size(F.filter("words", lambda w: F.length(w) >= 5)).alias("n_long"),
        F.element_at(vocab, 1).alias("first_alpha"),
        F.concat_ws(
            " ", F.transform(F.slice("words", 1, 1), lambda w: F.upper(w))
        ).alias("head_upper"),
    )


# --------------------------------------------------------------------------
# bm25_rank — ranked retrieval (the search-engine scoring layer)
# --------------------------------------------------------------------------

BM25_TERMS = ("query", "join", "fast")
BM25_K1, BM25_B = 1.2, 0.75


def _bm25_sql() -> str:
    tf_cols = ", ".join(
        f"sum(CASE WHEN word = '{t}' THEN 1 ELSE 0 END) AS tf{i}"
        for i, t in enumerate(BM25_TERMS)
    )
    df_cols = ", ".join(
        f"CAST(sum(CASE WHEN tf{i} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df{i}"
        for i in range(len(BM25_TERMS))
    )
    k1, b = BM25_K1, BM25_B
    parts = " + ".join(
        f"(CASE WHEN tf{i} > 0 THEN ln(1 + (n_docs - df{i} + 0.5) / (df{i} + 0.5))"
        f" * (tf{i} * {k1 + 1.0}) / (tf{i} + {k1} * ({1.0 - b} + {b} * dl / avgdl))"
        f" ELSE 0.0 END)"
        for i in range(len(BM25_TERMS))
    )
    return f"""
{SQL_TOKS_CTE}
, per AS (
  SELECT doc_id, count(*) AS dl, {tf_cols}
  FROM toks GROUP BY doc_id
), stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs, avg(dl) AS avgdl, {df_cols}
  FROM per
)
SELECT doc_id, score FROM (
  SELECT doc_id, round({parts}, 6) AS score
  FROM per CROSS JOIN stats
) s WHERE score > 0
ORDER BY score DESC, doc_id
LIMIT 10
"""


@register(
    "bm25_rank",
    oracle=_bm25_sql(),
    description="BM25 ranked retrieval: top-10 docs for a 3-term query, one corpus scan",
    tags=("text", "query", "scale"),
)
def q_bm25_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked retrieval with the classic BM25 weight, planned for one
    corpus scan and ONE shuffle: per-document term frequencies for the
    (literal, tiny) query-term set and the document length come out of
    a single wide groupBy(doc_id) — no per-term joins — and the corpus
    statistics (N, avgdl, per-term document frequencies) derive from
    THAT aggregate, returning as a 1-row broadcast (the exchange is
    reused at runtime, tpch_q11-style).  The final top-10 is
    TakeOrdered over rounded scores with a doc_id tie-break — no global
    sort.  Floats cross engines through the tf_idf rounding convention
    (identical operand order, round to 6)."""
    toks = tokenize_documents(table(spark, sf_dir, "documents"))
    k1, b = BM25_K1, BM25_B
    per = toks.groupBy("doc_id").agg(
        F.count("*").alias("dl"),
        *[
            F.sum(F.when(F.col("word") == t, 1).otherwise(0)).alias(f"tf{i}")
            for i, t in enumerate(BM25_TERMS)
        ],
    )
    stats = per.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum(F.when(F.col(f"tf{i}") > 0, 1).otherwise(0))
            .cast("long")
            .alias(f"df{i}")
            for i in range(len(BM25_TERMS))
        ],
    )
    score = None
    for i in range(len(BM25_TERMS)):
        tf, df = F.col(f"tf{i}"), F.col(f"df{i}")
        idf = F.log(
            F.lit(1) + (F.col("n_docs") - df + 0.5) / (df + 0.5)
        )
        part = F.when(
            tf > 0,
            idf * (tf * F.lit(k1 + 1.0))
            / (tf + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))),
        ).otherwise(F.lit(0.0))
        score = part if score is None else score + part
    return (
        per.crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(score, 6).alias("score"))
        .filter(F.col("score") > 0)
        .orderBy(F.desc("score"), "doc_id")
        .limit(10)
    )


# --------------------------------------------------------------------------
# zipf_slope — corpus health check: how Zipfian is each language?
# --------------------------------------------------------------------------

ZIPF_TOP = 100  # OLS over the head of the rank-frequency curve


@register(
    "zipf_slope",
    oracle=f"""
WITH toks AS (
  SELECT lang, unnest({sql_tokens('text')}) AS word FROM documents
), wc AS (
  SELECT lang, word, count(*) AS n FROM toks GROUP BY lang, word
), ranked AS (
  SELECT lang, n,
         row_number() OVER (PARTITION BY lang ORDER BY n DESC, word ASC) AS rnk
  FROM wc
)
SELECT lang,
       count(*) AS n_words,
       round(regr_slope(ln(n), ln(rnk)), 4) + 0 AS slope,
       round(regr_intercept(ln(n), ln(rnk)), 4) + 0 AS intercept
FROM ranked WHERE rnk <= {ZIPF_TOP}
GROUP BY lang
""",
    description=f"per-language Zipf exponent: OLS log-log slope over the top-{ZIPF_TOP} words",
    tags=("text", "profile", "agg"),
)
def q_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-quality fingerprint: natural text follows rank-frequency
    power laws with slope ≈ -1; spam, boilerplate, or synthetic text
    bends the curve, so per-language slope drift is a cheap corpus
    health monitor.  OLS on (ln rank, ln count) over each language's
    top-100 words; slope = covar/var, same definition as the
    oracle's regr_slope.

    Scale: one corpus-token aggregation (map-side partial absorbs the
    Zipf head), then everything is vocabulary-sized — the rank window
    and the 2-moment fold see at most 100 rows per language."""
    toks = tokenize_documents(table(spark, sf_dir, "documents"), extra_cols=["lang"])
    wc = toks.groupBy("lang", "word").agg(F.count("*").alias("n"))
    w = Window.partitionBy("lang").orderBy(F.desc("n"), F.asc("word"))
    ranked = wc.withColumn("rnk", F.row_number().over(w)).filter(
        F.col("rnk") <= ZIPF_TOP
    )
    x, y = F.log(F.col("rnk").cast("double")), F.log(F.col("n").cast("double"))
    fitted = ranked.select("lang", x.alias("x"), y.alias("y"))
    slope = F.covar_pop("x", "y") / F.var_pop("x")
    return fitted.groupBy("lang").agg(
        F.count("*").alias("n_words"),
        (F.round(slope, 4) + F.lit(0.0)).alias("slope"),
        (F.round(F.avg("y") - slope * F.avg("x"), 4) + F.lit(0.0)).alias("intercept"),
    )


# --------------------------------------------------------------------------
# tfidf_doc_similarity — doc-doc cosine over the inverted index
# --------------------------------------------------------------------------

SIM_TOP_PAIRS = 20
# Stop-word exclusion for the doc-doc similarity: words are dropped
# from the whole computation (weights, norms, pairs) when their doc
# frequency exceeds EITHER cap below — the tf-idf analogue of the
# dedup family's stop-shingle cap, and the IR champion-list trick.
# A near-universal word relates everything to everything: it carries
# df² candidate pairs but near-zero idf weight, so keeping it turns
# the "sparse" posting join dense (measured: the uncapped form never
# finished at sf0.1 — every one of ~12.5M doc pairs shares a common
# word).  The RELATIVE cap (df/n_docs > 3/10, exact integer compare
# so both engines agree) is the semantic stop-word rule and does the
# work at fixture scale; the ABSOLUTE cap bounds per-word join
# fan-out no matter the corpus size (production sets it O(10^3),
# like HOT_SHINGLE_CAP).
SIM_DF_FRAC_NUM = 3
SIM_DF_FRAC_DEN = 10
SIM_DF_CAP = 100_000


@register(
    "tfidf_doc_similarity",
    oracle=f"""
{SQL_TOKS_CTE}
, tf AS (
  SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word
), dfreq AS (
  SELECT word, count(DISTINCT doc_id) AS df FROM toks GROUP BY word
), n AS (
  SELECT count(*) AS n_docs FROM documents
), w AS (
  SELECT tf.doc_id, tf.word, tf.tf * ln(n.n_docs / dfreq.df) AS wt
  FROM tf JOIN dfreq USING (word) CROSS JOIN n
  WHERE dfreq.df * {SIM_DF_FRAC_DEN} <= n.n_docs * {SIM_DF_FRAC_NUM}
    AND dfreq.df <= {SIM_DF_CAP}
), nrm AS (
  SELECT doc_id, sqrt(sum(wt * wt)) AS nw FROM w GROUP BY doc_id
), dot AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, sum(a.wt * b.wt) AS d
  FROM w a JOIN w b ON a.word = b.word AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(d / (na.nw * nb.nw), 6) + 0 AS cosine
FROM dot
JOIN nrm na ON na.doc_id = doc_a
JOIN nrm nb ON nb.doc_id = doc_b
ORDER BY cosine DESC, doc_a ASC, doc_b ASC
LIMIT {SIM_TOP_PAIRS}
""",
    description=f"top-{SIM_TOP_PAIRS} doc pairs by tf-idf cosine via the sparse posting join",
    tags=("text", "similarity", "query"),
)
def q_tfidf_doc_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-to-document similarity WITHOUT embeddings — the sparse
    dot product computed through the inverted index itself: candidate
    pairs come only from docs sharing a word (the posting join), so
    cost is sum over words of df², never n_docs² — the IR-classic use
    of the index as a similarity accelerator, tying the reference's
    index to the engine's similarity family.

    Scale: identical discipline to ``jaccard_pairs`` — the join key
    is the word, and stop words (relative cap) plus any word beyond
    the absolute ``SIM_DF_CAP`` are excluded from the whole
    computation: a near-universal word carries no similarity signal
    but contributes df² join pairs, so the caps are what keep the
    posting join actually sparse as the corpus grows.  df and the
    per-doc norm ride WINDOWS on the weight rows (r7, see inline
    comment) so there is no corpus-sized join build anywhere;
    top-k is TakeOrdered."""
    docs = table(spark, sf_dir, "documents")
    toks = tokenize_documents(docs)
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    n = docs.select(F.count("*").alias("n_docs"))
    # tokenize-once (r7): df via a word-partitioned count window on
    # the tf aggregate (one corpus tokenize), the per-doc norm via a
    # doc-partitioned sum window on the weight rows (no corpus-sized
    # nrm join — each side of the posting self-join CARRIES its own
    # norm), and the posting self-join's two sides are canonically
    # identical so AQE reuses one shuffle for both.  Net: one
    # tokenize, zero corpus-sized join builds, same result.
    w = (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("word")))
        .crossJoin(F.broadcast(n))
        .filter(
            (F.col("df") * SIM_DF_FRAC_DEN <= F.col("n_docs") * SIM_DF_FRAC_NUM)
            & (F.col("df") <= SIM_DF_CAP)
        )
        .select(
            "doc_id",
            "word",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("wt"),
        )
        .withColumn(
            "nw",
            F.sqrt(F.sum(F.col("wt") * F.col("wt")).over(Window.partitionBy("doc_id"))),
        )
    )
    a, b = w.alias("a"), w.alias("b")
    return (
        a.join(
            b,
            (F.col("a.word") == F.col("b.word"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(
            F.sum(F.col("a.wt") * F.col("b.wt")).alias("d"),
            F.max(F.col("a.nw")).alias("na"),  # constant within the group
            F.max(F.col("b.nw")).alias("nb"),
        )
        .select(
            "doc_a",
            "doc_b",
            (F.round(F.col("d") / (F.col("na") * F.col("nb")), 6) + F.lit(0.0)).alias(
                "cosine"
            ),
        )
        .orderBy(F.desc("cosine"), F.asc("doc_a"), F.asc("doc_b"))
        .limit(SIM_TOP_PAIRS)
    )


# --------------------------------------------------------------------------
# doc_entropy — per-document word-distribution entropy
# --------------------------------------------------------------------------


@register(
    "doc_entropy",
    oracle=f"""
{SQL_TOKS_CTE}
, tf AS (
  SELECT doc_id, word, count(*) AS c FROM toks GROUP BY doc_id, word
), tot AS (
  SELECT doc_id, sum(c) AS n FROM tf GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(any_value(tot.n) AS BIGINT) AS n_tokens,
       count(*) AS n_distinct,
       round(-sum((t.c / tot.n) * log2(t.c / tot.n)), 4) + 0 AS entropy_bits,
       CASE WHEN count(*) = 1 THEN 0.0
            ELSE round(-sum((t.c / tot.n) * log2(t.c / tot.n))
                       / log2(count(*)), 4) + 0
       END AS norm_entropy
FROM tf t JOIN tot USING (doc_id)
GROUP BY t.doc_id
""",
    description="per-doc Shannon entropy of the word distribution (+ normalized)",
    tags=("text", "quality", "filter"),
)
def q_doc_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Information-theoretic quality signal: low-entropy documents are
    repetitive boilerplate (the distribution collapses onto few words),
    entropy near log2(n_distinct) means tokens are spread evenly —
    ``norm_entropy`` is that ratio, a scale-free 0..1 score that
    complements ``repetition_signals``'s top-word fractions.

    100 TB shape: two partial-aggregated shuffles — (doc_id, word) for
    term counts, then doc_id for the window that attaches each doc's
    total; the final per-doc aggregation RIDES the window's doc_id
    partitioning (no third exchange — pinned in test_plan_quality).
    Nothing is corpus-global; group state is one doc's distinct
    words."""
    docs = table(spark, sf_dir, "documents")
    tf = (
        tokenize_documents(docs)
        .groupBy("doc_id", "word")
        .agg(F.count("*").alias("c"))
    )
    w_doc = Window.partitionBy("doc_id")
    p = F.col("c") / F.col("n")
    per_doc = (
        tf.withColumn("n", F.sum("c").over(w_doc))
        .withColumn("contrib", p * F.log2(p))
        .groupBy("doc_id")
        .agg(
            F.max("n").alias("n_tokens"),
            F.count("*").alias("n_distinct"),
            (-F.sum("contrib")).alias("ent_raw"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        (F.round(F.col("ent_raw"), 4) + F.lit(0.0)).alias("entropy_bits"),
        F.when(F.col("n_distinct") == 1, F.lit(0.0))
        .otherwise(
            F.round(F.col("ent_raw") / F.log2(F.col("n_distinct")), 4) + F.lit(0.0)
        )
        .alias("norm_entropy"),
    )


# --------------------------------------------------------------------------
# vocab_growth — Heaps'-law corpus profile (vocabulary vs tokens seen)
# --------------------------------------------------------------------------

VOCAB_BUCKET_DOCS = 50  # curve resolution: docs per bucket


@register(
    "vocab_growth",
    oracle=f"""
{SQL_TOKS_CTE}
, docs_b AS (
  SELECT CAST(floor(doc_id / {VOCAB_BUCKET_DOCS}) AS BIGINT) AS bucket,
         count(*) AS n_docs
  FROM documents GROUP BY bucket
), tok_b AS (
  SELECT CAST(floor(doc_id / {VOCAB_BUCKET_DOCS}) AS BIGINT) AS bucket,
         count(*) AS n_tokens
  FROM toks GROUP BY bucket
), first_occ AS (
  SELECT word, min(doc_id) AS first_doc FROM toks GROUP BY word
), new_b AS (
  SELECT CAST(floor(first_doc / {VOCAB_BUCKET_DOCS}) AS BIGINT) AS bucket,
         count(*) AS new_words
  FROM first_occ GROUP BY bucket
)
SELECT d.bucket, d.n_docs,
       CAST(coalesce(t.n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(coalesce(nb.new_words, 0) AS BIGINT) AS new_words,
       CAST(sum(coalesce(t.n_tokens, 0)) OVER (ORDER BY d.bucket) AS BIGINT)
         AS cum_tokens,
       CAST(sum(coalesce(nb.new_words, 0)) OVER (ORDER BY d.bucket) AS BIGINT)
         AS cum_vocab
FROM docs_b d
LEFT JOIN tok_b t USING (bucket)
LEFT JOIN new_b nb USING (bucket)
""",
    description="Heaps'-law vocabulary-growth curve: cumulative vocab vs tokens per doc bucket",
    tags=("text", "profile", "agg"),
)
def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-profile curve for dedup/mix planning: how fast does the
    vocabulary grow as documents are ingested in doc_id order?  A word
    counts as NEW in the bucket of its first occurrence (min(doc_id)
    per word — a vocabulary-sized aggregate, the inverted index's df
    computation with min instead of collect).

    100 TB shape: the only corpus-sized work is ONE partial-aggregated
    (word, bucket) hash shuffle; everything after it (first-occurrence
    window, bucket rollup) runs on vocab x buckets rows.  The
    cumulative prefix sum runs over BUCKET SUMMARIES only —
    corpus/{VOCAB_BUCKET_DOCS} rows, bounded by choosing the bucket
    width to the curve resolution wanted (~10^4 points), never over
    docs — the same two-level decomposition as sequence_packing's
    sharded offsets; a finer-grained curve would reuse that exact
    shard rollup."""
    docs = table(spark, sf_dir, "documents")
    toks = tokenize_documents(docs)
    bucket_of = lambda c: F.floor(F.col(c) / VOCAB_BUCKET_DOCS).cast("long")  # noqa: E731
    docs_b = docs.groupBy(bucket_of("doc_id").alias("bucket")).agg(
        F.count("*").alias("n_docs")
    )
    # tokenize-once (r7): ONE (word, bucket) aggregate carries both
    # signals through a single linear chain — per-word global first
    # occurrence arrives via a word-partitioned min window, then one
    # bucket aggregate folds token totals and new-word counts together
    # (the row where first_doc == the per-word min is, by definition,
    # in the bucket of the word's first occurrence).  Previously the
    # token-count and first-occurrence branches each tokenized the
    # corpus; g2 is vocab x buckets-sized, so everything after the
    # first exchange is small.
    g2 = toks.groupBy("word", bucket_of("doc_id").alias("bucket")).agg(
        F.count("*").alias("c"), F.min("doc_id").alias("first_doc")
    )
    g3 = g2.withColumn(
        "fw", F.min("first_doc").over(Window.partitionBy("word"))
    )
    both_b = g3.groupBy("bucket").agg(
        F.sum("c").alias("n_tokens"),
        F.sum(
            F.when(F.col("first_doc") == F.col("fw"), 1).otherwise(0)
        ).alias("new_words"),
    )
    base = (
        docs_b.join(both_b, "bucket", "left")
        .select(
            "bucket",
            "n_docs",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("new_words", F.lit(0)).alias("new_words"),
        )
    )
    w_cum = (
        Window.partitionBy(F.lit(0))
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return base.select(
        "bucket",
        "n_docs",
        "n_tokens",
        "new_words",
        F.sum("n_tokens").over(w_cum).alias("cum_tokens"),
        F.sum("new_words").over(w_cum).alias("cum_vocab"),
    )


# --------------------------------------------------------------------------
# doc_keywords — per-document top-k tf-idf terms
# --------------------------------------------------------------------------

KEYWORDS_PER_DOC = 3


@register(
    "doc_keywords",
    oracle=f"""
{SQL_TOKS_CTE}
, tf AS (
  SELECT doc_id, word, count(*) AS tf FROM toks GROUP BY doc_id, word
), dfreq AS (
  SELECT word, count(DISTINCT doc_id) AS df FROM toks GROUP BY word
), n AS (
  SELECT count(*) AS n_docs FROM documents
), ranked AS (
  SELECT tf.doc_id, tf.word,
         round(tf.tf * ln(n.n_docs / dfreq.df), 6) + 0 AS score,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY tf.tf * ln(n.n_docs / dfreq.df) DESC, tf.word ASC
         ) AS rank
  FROM tf JOIN dfreq USING (word) CROSS JOIN n
)
SELECT doc_id, CAST(rank AS INT) AS rank, word, score
FROM ranked WHERE rank <= {KEYWORDS_PER_DOC}
""",
    description=f"top-{KEYWORDS_PER_DOC} tf-idf keywords per document (window group limit)",
    tags=("text", "query", "topk"),
)
def q_doc_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction, RAKE-lite: each document's most
    distinctive terms by tf-idf — the per-doc labels a corpus browser
    or a weak topic model starts from.

    Scale: tf_idf's shapes (one (doc_id, word) shuffle, vocabulary
    broadcast, 1-row N) plus a per-doc rank window that
    InferWindowGroupLimit prunes to a streaming top-{KEYWORDS_PER_DOC}
    inside the doc_id exchange — the ranking never materializes more
    than k rows per doc past the sort."""
    docs = table(spark, sf_dir, "documents")
    toks = tokenize_documents(docs)
    tf = toks.groupBy("doc_id", "word").agg(F.count("*").alias("tf"))
    # tokenize-once (r7): df attached via a word-partitioned count
    # window on the tf aggregate — one linear chain, corpus tokenized
    # exactly once, no vocab join (see tf_idf's docstring)
    n = docs.select(F.count("*").alias("n_docs"))
    scored = (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("word")))
        .crossJoin(F.broadcast(n))
        .withColumn(
            "raw", F.col("tf") * F.log(F.col("n_docs") / F.col("df"))
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("raw"), F.asc("word"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= KEYWORDS_PER_DOC)
        .select(
            "doc_id",
            "rank",
            "word",
            (F.round(F.col("raw"), 6) + F.lit(0.0)).alias("score"),
        )
    )


# --------------------------------------------------------------------------
# token_budget_select — fill a token budget with the highest-quality docs
# --------------------------------------------------------------------------

TOKEN_BUDGET = 12_000
# doc_id-range shard width inside one quality level: bounds what any
# single prefix-sum window task must order (sequence_packing's
# decomposition, nested under the quality key).
TB_SHARD_DOCS = 128
# quality is round(x, 6); scaling by 1e6 and re-rounding recovers the
# exact integer quality level, so "same qlevel" == "same quality".
_QLEVEL = 1_000_000

_TB_QUALITY_SQL = f"""
  SELECT doc_id,
         len({sql_tokens('text')}) AS n_tokens,
         round(least(len({sql_tokens('text')}) / 64.0, 1.0)
               * (1 - len(regexp_extract_all(text, '[^a-zA-Z0-9 ]'))
                      / greatest(length(text), 1)), 6) AS quality
  FROM documents
"""


@register(
    "token_budget_select",
    # The oracle states the spec directly: one global running sum over
    # (quality DESC, doc_id ASC); a doc is selected iff the tokens
    # before it fit the budget.  The engine's three-level shard
    # decomposition is associative, so every output row is identical.
    oracle=f"""
WITH q AS ({_TB_QUALITY_SQL}
), c AS (
  SELECT doc_id, n_tokens, quality,
         COALESCE(SUM(n_tokens) OVER (
           ORDER BY quality DESC, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
  FROM q
)
SELECT doc_id, n_tokens, quality, CAST(cum_before AS BIGINT) AS cum_before
FROM c WHERE cum_before < {TOKEN_BUDGET}
""",
    description=f"greedy quality-ordered doc selection into a {TOKEN_BUDGET}-token budget",
    tags=("text", "training", "pipeline"),
)
def q_token_budget_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Budget-constrained corpus selection: walk docs in (quality DESC,
    doc_id ASC) order and keep each doc whose preceding cumulative
    token count still fits ``TOKEN_BUDGET`` — the standard "best data
    first, stop at the token budget" step when curating a pretraining
    mix (quality is ``quality_score``'s heuristic, recomputed
    identically).

    100 TB shape: the spec is a GLOBAL ordered prefix sum — the one
    thing a distributed engine must never run as one window task.  It
    is decomposed over three associative levels, none of which orders
    more than a bounded slice:

    1. within (qlevel, doc-shard): a window over <= ``TB_SHARD_DOCS``
       rows (qlevel = the exact rounded quality value, so within a
       level the spec order is pure doc_id and doc-id-range sharding
       preserves it);
    2. shard offsets within a qlevel: a window over one row per
       doc-shard (corpus/``TB_SHARD_DOCS`` tiny rows in the worst
       degenerate single-quality corpus — millions, not billions, the
       same posture as sequence_packing's per-lang shard rollup);
    3. qlevel offsets: one window over <= 1e6+1 one-per-level rows.

    The shard-totals branch re-scans the pruned parquet and collapses
    map-side to one row per (qlevel, shard) BEFORE its exchange, so
    only the window's exchange is corpus-sized.  (Deriving the totals
    from the windowed stream instead would NOT save the second pass:
    Catalyst prunes the two consumers' columns differently, ReuseExchange
    cannot match the window's exchange, and the materialization a
    manual checkpoint would buy costs a full corpus write — a second
    column-pruned scan + tokenize is the cheaper production shape,
    measured, and is what a real multi-file table plans too.)  Levels
    whose offset already exceeds the budget are dropped BEFORE the
    join back, so past-budget data never flows through the final
    filter at all.  No broadcast hints: the offset tables are
    level-count-sized and AQE picks the strategy.
    """
    docs = table(spark, sf_dir, "documents")
    t = tokens_of(F.col("text"))
    punct_ratio = F.size(
        F.regexp_extract_all(F.col("text"), F.lit("[^a-zA-Z0-9 ]"), 0)
    ) / F.greatest(F.length("text"), F.lit(1))
    q = docs.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        F.round(
            F.least(F.size(t) / F.lit(64.0), F.lit(1.0)) * (1 - punct_ratio), 6
        ).alias("quality"),
    ).select(
        "doc_id",
        "n_tokens",
        "quality",
        # coalesce makes the keys NON-NULLABLE (the inputs never are;
        # the fixture invariant is stated on the oracle side too), so
        # the join infers no isnotnull(qlevel) constraint — without
        # this, the inferred filter drags the whole tokenize expression
        # down into the parquet scan's DataFilters and every row pays
        # an extra tokenize pass before the projection even runs
        F.coalesce(
            F.round(F.col("quality") * _QLEVEL).cast("long"), F.lit(-1)
        ).alias("qlevel"),
        F.coalesce(
            F.floor(F.col("doc_id") / TB_SHARD_DOCS), F.lit(-1)
        ).alias("shard"),
    )
    # level 1: bounded per-(qlevel, shard) running sum in doc_id order
    w_in = (
        Window.partitionBy("qlevel", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    c = q.withColumn(
        "cum_in_shard", F.coalesce(F.sum("n_tokens").over(w_in), F.lit(0))
    )
    # level 2: per-shard totals as a DIRECT sum off the pre-window
    # stream — map-side partial aggregation collapses each task to one
    # row per (qlevel, shard) BEFORE the exchange, so this branch
    # never shuffles the corpus (deriving totals from the windowed
    # stream instead would ride a second corpus-wide exchange: Catalyst
    # prunes the two consumers' columns differently and ReuseExchange
    # cannot match the window's exchange — measured, not guessed)
    w_sh = (
        Window.partitionBy("qlevel")
        .orderBy("shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    shards = (
        q.groupBy("qlevel", "shard")
        .agg(F.sum("n_tokens").alias("shard_tokens"))
        .withColumn(
            "shard_offset", F.coalesce(F.sum("shard_tokens").over(w_sh), F.lit(0))
        )
    )
    # level 3: per-qlevel totals; one global window over <= 1e6+1 tiny
    # rows, ordered by quality DESC (i.e. qlevel DESC)
    w_lv = (
        Window.orderBy(F.desc("qlevel")).rowsBetween(Window.unboundedPreceding, -1)
    )
    levels = (
        shards.groupBy("qlevel")
        .agg(F.sum("shard_tokens").alias("level_tokens"))
        .withColumn(
            "level_offset", F.coalesce(F.sum("level_tokens").over(w_lv), F.lit(0))
        )
        .filter(F.col("level_offset") < TOKEN_BUDGET)  # prune hopeless levels
        .select("qlevel", "level_offset")
    )
    offsets = shards.join(levels, "qlevel").select(
        "qlevel", "shard", (F.col("level_offset") + F.col("shard_offset")).alias("offset")
    )
    return (
        c.join(offsets, ["qlevel", "shard"])
        .withColumn(
            "cum_before",
            (F.col("offset") + F.col("cum_in_shard")).cast("long"),
        )
        .filter(F.col("cum_before") < TOKEN_BUDGET)
        .select("doc_id", "n_tokens", "quality", "cum_before")
    )


# --------------------------------------------------------------------------
# collated_word_count (r10, Spark 4): collation-aware grouping.  Real
# corpora mix case ('The'/'THE'/'the'); pre-Spark-4 pipelines lower()
# every string BEFORE the shuffle, which loses the original forms and
# bakes one normalization into the data.  Spark 4 string collation
# (COLLATE UTF8_LCASE) makes case-insensitivity a property of the
# COMPARISON instead: grouping, joins and distinct all honor it while
# the original bytes survive to the aggregate.  The fixture re-cases a
# deterministic doc subset so every group really contains multiple
# binary-distinct forms, and the oracle (DuckDB lower()-keyed) pins
# both the grouping and the surviving min-form bytes.
# --------------------------------------------------------------------------


@register(
    "collated_word_count",
    oracle="""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents
), cased AS (
  SELECT CASE WHEN doc_id % 3 = 1 THEN upper(w)
              WHEN doc_id % 3 = 2 THEN concat(upper(w[1:1]), w[2:])
              ELSE w END AS w
  FROM toks
)
SELECT lower(w) AS key_lc,
       CAST(count(*) AS BIGINT) AS n_tokens,
       CAST(count(DISTINCT w) AS BIGINT) AS n_forms,
       min(w) AS min_form
FROM cased GROUP BY lower(w)
""",
    description=(
        "case-insensitive word counts via COLLATE UTF8_LCASE grouping"
        " (originals survive to the aggregate)"
    ),
    tags=("text", "collation"),
)
def q_collated_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-cases a deterministic third of the corpus to UPPER and
    another third to Initcap, then groups tokens under the Spark 4
    ``UTF8_LCASE`` collation: 'THE'/'The'/'the' land in one group
    WITHOUT a pre-shuffle lower() rewrite, so the aggregate still sees
    the original bytes (n_forms counts the binary-distinct case
    variants that coexist in each group; min_form proves they
    survived).  The oracle keys on lower(w) — identical grouping — so
    a collation that under- or over-merges breaks the hash.  Plan
    shape is an ordinary two-phase hash aggregate; collation changes
    the comparator, not the topology."""
    docs = table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split("text", " ")).alias("w0")
    )
    cased = toks.select(
        F.when(F.col("doc_id") % 3 == 1, F.upper("w0"))
        .when(F.col("doc_id") % 3 == 2, F.initcap("w0"))
        .otherwise(F.col("w0"))
        .alias("w")
    )
    return (
        cased.groupBy(F.expr("w COLLATE UTF8_LCASE").alias("wc"))
        .agg(
            F.count("*").alias("n_tokens"),
            F.countDistinct("w").alias("n_forms"),
            F.min("w").alias("min_form"),
        )
        .select(
            F.lower(F.col("wc")).cast("string").alias("key_lc"),
            "n_tokens",
            "n_forms",
            "min_form",
        )
    )
