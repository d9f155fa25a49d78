"""SQL-callable engine functions (CREATE FUNCTION ... RETURN expr).

The DataFrame API exposes the engine's functions as Column builders
(``functions/text.py``, ``functions/vectors.py``); this registers the
same definitions as Spark SQL scalar functions so a pure-SQL caller
gets the identical semantics — the bodies are SQL *expressions*
(macro-expanded into the caller's plan at analysis time, fully
codegen-able), not Python UDFs, so there is no per-row interpreter
cost and Catalyst optimizes through them.

Definitions mirror ``functions/text.py`` exactly (reference tokenizer
semantics, /root/reference/main.c++:100-128); keep both in sync.

Known engine limitation: a SQL UDF cannot appear directly inside a
Generate (``explode(tokens(text))`` fails analysis) — project the
array in a subquery first, then explode the column.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

_DDL = [
    # reference normalizer: ASCII-only fold then strip non-[a-z].
    # translate, NOT lower(): Unicode lower() folds U+212A/U+0130 into
    # [a-z], which the bytewise reference deletes instead (see
    # functions/text.py ascii_lower).
    """CREATE OR REPLACE TEMPORARY FUNCTION norm_word(w STRING)
       RETURNS STRING
       RETURN regexp_replace(translate(w,
         'ABCDEFGHIJKLMNOPQRSTUVWXYZ', 'abcdefghijklmnopqrstuvwxyz'),
         '[^a-z]', '')""",
    # reference tokenizer: per line, tabs split only around the FIRST
    # token (strtok_r " \n\t" then " ", main.c++:102,143) — rewrite each
    # line (keep the strtok head, delete joining tail tabs), then one
    # uniform split; normalize each token, drop empties
    """CREATE OR REPLACE TEMPORARY FUNCTION tokens(t STRING)
       RETURNS ARRAY<STRING>
       RETURN filter(transform(split(
                array_join(transform(split(t, '\n'),
                  l -> concat(regexp_extract(l, '^[ \t]*[^ \t]*[ \t]?', 0),
                              translate(regexp_replace(l, '^[ \t]*[^ \t]*[ \t]?', ''),
                                        '\t', ''))),
                  '\n'),
                '[ \n\t]+'),
                               w -> regexp_replace(translate(w,
                                 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                 'abcdefghijklmnopqrstuvwxyz'),
                                 '[^a-z]', '')),
                     w -> length(w) > 0)""",
    # cosine similarity over double arrays (sequential fold -> the same
    # deterministic float order as functions/vectors.cosine_similarity)
    """CREATE OR REPLACE TEMPORARY FUNCTION cosine(a ARRAY<DOUBLE>, b ARRAY<DOUBLE>)
       RETURNS DOUBLE
       RETURN aggregate(zip_with(a, b, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)
              / (sqrt(aggregate(transform(a, x -> x * x), 0.0D, (acc, v) -> acc + v))
                 * sqrt(aggregate(transform(b, x -> x * x), 0.0D, (acc, v) -> acc + v)))""",
    # reference output-line format word:[d1 d2 ... dn] (main.c++:254-266)
    """CREATE OR REPLACE TEMPORARY FUNCTION posting_line(w STRING, p ARRAY<BIGINT>)
       RETURNS STRING
       RETURN concat(w, ':[', array_join(transform(p, d -> cast(d AS STRING)), ' '), ']')""",
]


def register_sql_functions(spark: SparkSession) -> None:
    """Install the engine's SQL function surface into the session.

    Temporary (session-scoped) on purpose: a cluster deployment would
    run the same DDL without TEMPORARY once against its catalog.
    """
    for ddl in _DDL:
        spark.sql(ddl)
