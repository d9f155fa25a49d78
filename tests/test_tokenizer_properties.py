"""Property tests for the tokenizer/normalizer (SURVEY.md §5.3).

The reference's one documented historical bug was tokens that become
empty after normalization (README.md:18).  These check the Spark
expression chain against an independent pure-Python model of the
reference semantics (main.c++:100-128) over adversarial inputs:
mixed case, digits, punctuation-only, non-ASCII, exotic whitespace.
"""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from inverted_index_using_the_map_reduce_paradigm_spark.functions.text import tokens_of

# The reference reads line-by-line (getline, main.c++:98) and tokenizes
# each line with strtok_r: the FIRST call splits on " \n\t"
# (main.c++:102) but every SUBSEQUENT call splits on " " alone
# (main.c++:143) — a tab after the first token stays inside its token,
# is erased by the normalizer, and JOINS the fragments ("a b\tc" ->
# "a","bc").  Per token: lowercase A-Z, delete every char outside a-z
# (main.c++:110-124), drop tokens that end up empty (main.c++:125-128).
# NOT \s: a mid-token \r, \f, or \xa0 is erased by the normalizer and
# joins its neighbors ("a\rb" -> "ab").


def _strtok_line(line: str) -> list[str]:
    """Faithful model of the strtok_r call pair (main.c++:102,143)."""
    i, n = 0, len(line)
    while i < n and line[i] in " \t":  # first call skips leading delims
        i += 1
    if i == n:
        return []  # strtok returns NULL: no tokens on this line
    j = i
    while j < n and line[j] not in " \t":
        j += 1
    raw = [line[i:j]]
    rest = line[j + 1 :]  # strtok consumed exactly ONE terminator
    raw += [t for t in rest.split(" ") if t]  # NULL-calls: spaces only
    return raw


# ASCII-only fold, like the reference's bytewise `c + 32` on A-Z
# (main.c++:115-118).  NOT str.lower(): Unicode lowercasing folds
# U+212A KELVIN SIGN -> 'k' and U+0130 -> 'i' + combining dot, chars
# the reference deletes byte-by-byte instead.
_ASCII_FOLD = str.maketrans(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ", "abcdefghijklmnopqrstuvwxyz"
)


def reference_tokens(text: str) -> list[str]:
    out = []
    for line in text.split("\n"):  # getline boundary (main.c++:98)
        for tok in _strtok_line(line):
            w = re.sub("[^a-z]", "", tok.translate(_ASCII_FOLD))
            if w:
                out.append(w)
    return out


TEXTS = st.text(
    alphabet=st.characters(
        codec="utf-8", categories=("L", "N", "P", "S", "Z", "C")
    ),
    max_size=200,
)


def spark_tokens_batch(spark, texts: list[str]) -> list[list[str]]:
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    rows = df.select(tokens_of(F.col("text")).alias("t")).collect()
    return [list(r.t) for r in rows]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(st.lists(TEXTS, min_size=1, max_size=10))
def test_tokens_match_reference_model(spark, texts):
    got = spark_tokens_batch(spark, texts)
    want = [reference_tokens(t) for t in texts]
    assert got == want


def test_tokenizer_edge_cases(spark):
    cases = {
        "": [],
        "   \t\n  ": [],
        "123 456": [],
        "!!! ???": [],
        "Don't don't2x": ["dont", "dontx"],
        "quick-quick": ["quickquick"],
        "Ünïcödé naïve": ["ncd", "nave"],
        "MiXeD CaSe": ["mixed", "case"],
        "a.b,c;d": ["abcd"],
        # strtok delimiter asymmetry (main.c++:102,143): tabs split only
        # around the FIRST token of a line; later tabs join fragments.
        "a b\tc": ["a", "bc"],
        "a\tb c": ["a", "b", "c"],
        "\t\ta\tb c\td": ["a", "b", "cd"],
        "a b\tc\nd e\tf": ["a", "bc", "d", "ef"],
        "x\t\ty z": ["x", "y", "z"],
        # chars whose UNICODE lowercase lands in [a-z] must still be
        # deleted (bytewise reference semantics): U+212A KELVIN SIGN
        # would fold to 'k' and U+0130 to 'i' under lower()
        "KelvinK İstanbul": ["kelvin", "stanbul"],
        "K K İ": ["k"],
    }
    got = spark_tokens_batch(spark, list(cases))
    assert got == list(cases.values())


def test_tokenize_distinct_equals_distinct_of_stream(spark):
    """tokenize_documents_distinct (array-local dedup before the
    explode, zero shuffle) must emit exactly the distinct rows of the
    occurrence stream — the equivalence that lets build_index and the
    PMI/PageRank graph builds drop a corpus-wide exchange.  Exercised
    on the real fixture plus adversarial repetition/tab cases."""
    from pyspark.sql import functions as F

    from inverted_index_using_the_map_reduce_paradigm_spark.data import table
    from inverted_index_using_the_map_reduce_paradigm_spark.functions.text import (
        tokenize_documents,
        tokenize_documents_distinct,
    )

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    extra = spark.createDataFrame(
        [
            (100001, "dup dup dup dup unique"),
            (100002, "a b\ta a\tb b"),
            (100003, "Case case CASE 123 !!!"),
            (100004, ""),
        ],
        "doc_id long, text string",
    )
    for frame in (docs.select("doc_id", "text"), extra):
        want = {
            (r.doc_id, r.word)
            for r in tokenize_documents(frame).distinct().collect()
        }
        got_rows = tokenize_documents_distinct(frame).collect()
        got = {(r.doc_id, r.word) for r in got_rows}
        assert got == want
        assert len(got_rows) == len(got)  # already-distinct: no dup rows
    # and the whole point: the plan has NO exchange at all
    plan = tokenize_documents_distinct(
        extra
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_arrow_tokenizer_matches_expression_tokenizer(spark):
    """tokenize_documents_distinct_arrow (bytes.translate fast path)
    must emit exactly the expression form's distinct (doc_id, word)
    set on the real fixture and on adversarial tab/unicode/repetition
    inputs — the equivalence that licenses the bulk pipeline's C-speed
    tokenizer."""
    from inverted_index_using_the_map_reduce_paradigm_spark.data import table
    from inverted_index_using_the_map_reduce_paradigm_spark.functions.text import (
        tokenize_documents_distinct,
        tokenize_documents_distinct_arrow,
    )

    docs = table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    extra = spark.createDataFrame(
        [
            (1, "a b\tc"),
            (2, "a\tb c"),
            (3, "Don't don't2x"),
            (4, ""),
            (5, "Ünïcödé naïve x\t\ty z"),
            (6, "dup dup DUP 123 !!! a.b,c;d"),
            (7, "\t\tlead\ttab mix\tjoin"),
            (8, None),  # null text: no tokens, no crash, either path
            # Unicode-lowercase-folds-to-ASCII hazards: U+212A -> 'k',
            # U+0130 -> 'i' under lower(); BOTH paths must delete them
            (9, "KelvinK İstanbul K"),
        ],
        "doc_id long, text string",
    )
    for frame in (docs, extra):
        want = {
            (r.doc_id, r.word)
            for r in tokenize_documents_distinct(frame).collect()
        }
        got = {
            (r.doc_id, r.word)
            for r in tokenize_documents_distinct_arrow(frame).collect()
        }
        assert got == want
