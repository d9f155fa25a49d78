"""Reference-fidelity tests for the flagship pipeline (SURVEY.md §5.1,3).

Pin the exact semantics of /root/reference/main.c++:
  * tokenizer edge cases (main.c++:100-128): mid-token punctuation joins
    fragments, digits/non-ASCII vanish, empty tokens dropped;
  * per-doc dedup (main.c++:47-58);
  * posting lists ascending (main.c++:239-252);
  * global (letter, df DESC, word ASC) order (main.c++:37-44).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from inverted_index_using_the_map_reduce_paradigm_spark.functions.text import tokens_of
from inverted_index_using_the_map_reduce_paradigm_spark.operators.inverted_index import (
    build_index,
    formatted_index,
)


@pytest.mark.parametrize(
    "text,expected",
    [
        ("don't2x", ["dontx"]),  # punctuation+digit removal JOINS fragments
        ("123 456", []),  # all-digit tokens vanish (R6)
        ("Hello, World!", ["hello", "world"]),
        # strtok asymmetry (main.c++:102,143): tabs after the first
        # token are NOT delimiters — the normalizer erases them and
        # joins the fragments into one word
        ("  leading   spaces\tand\ttabs ", ["leading", "spacesandtabs"]),
        ("first\tsecond third", ["first", "second", "third"]),
        ("ñandú café", ["and", "caf"]),  # non-ASCII chars erased, not transliterated
        ("''' !!!", []),  # empty-after-cleanup (README.md:18 segfault case)
        ("a", ["a"]),
        ("", []),
    ],
)
def test_tokenizer_reference_semantics(spark, text, expected):
    df = spark.createDataFrame([Row(text=text)])
    [row] = df.select(tokens_of(F.col("text")).alias("t")).collect()
    assert row.t == expected


def test_per_doc_dedup_and_posting_order(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=2, text="apple apple banana"),
            Row(doc_id=1, text="banana APPLE!"),
            Row(doc_id=3, text="cherry"),
        ]
    )
    rows = {r.word: r for r in build_index(docs).collect()}
    assert rows["apple"].postings == [1, 2]  # deduped, ascending
    assert rows["apple"].doc_freq == 2
    assert rows["banana"].postings == [1, 2]
    assert rows["cherry"].postings == [3]
    assert rows["cherry"].letter == "c"


def test_formatted_line_matches_reference_format(spark):
    docs = spark.createDataFrame([Row(doc_id=1, text="zeta"), Row(doc_id=2, text="zeta")])
    [row] = formatted_index(docs).collect()
    assert row.line == "zeta:[1 2]"  # main.c++:254-266 format


def test_flagship_on_fixture(spark, sf_dir):
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    entry_mod = importlib.import_module("__spark_entry__")
    df = entry_mod.entry(spark)
    rows = df.limit(2000).collect()
    assert len(rows) > 0
    # global order: letter asc, then df desc, word asc within letter
    for a, b in zip(rows, rows[1:]):
        assert (a.letter, -a.doc_freq, a.word) <= (b.letter, -b.doc_freq, b.word)
    # postings always ascending, non-empty
    for r in rows:
        assert r.postings == sorted(r.postings) and len(r.postings) == r.doc_freq


def test_phrase_search_multiword_and_overlaps(spark):
    from inverted_index_using_the_map_reduce_paradigm_spark.operators.inverted_index import (
        phrase_search,
        tokenize_with_positions,
    )

    docs = spark.createDataFrame(
        [
            # two matches of "a b c", including back-to-back repetition
            Row(doc_id=1, text="a b c a b c"),
            # words present but never consecutive in order
            Row(doc_id=2, text="a c b a"),
            # match across normalization (punctuation stripped, case folded)
            Row(doc_id=3, text="x A! B? C. y"),
            # partial phrase only
            Row(doc_id=4, text="a b a b"),
        ]
    )
    got = {r.doc_id: r.n_matches for r in phrase_search(docs, ["a", "b", "c"]).collect()}
    assert got == {1: 2, 3: 1}

    # positions are 1-based over normalized non-empty tokens
    pos = tokenize_with_positions(
        spark.createDataFrame([Row(doc_id=7, text="  !!  one two  ")])
    ).collect()
    assert {(r.word, r.pos) for r in pos} == {("one", 1), ("two", 2)}
