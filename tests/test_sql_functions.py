"""The pure-SQL surface must reproduce the DataFrame engine exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from inverted_index_using_the_map_reduce_paradigm_spark.data import table
from inverted_index_using_the_map_reduce_paradigm_spark.functions.sql_functions import (
    register_sql_functions,
)
from inverted_index_using_the_map_reduce_paradigm_spark.operators.inverted_index import (
    build_index,
)

SF = "/root/testdata/sf0.001"


def test_sql_flagship_matches_dataframe_engine(spark):
    """The whole flagship pipeline written by a SQL-only user against
    the registered functions must equal build_index row for row."""
    register_sql_functions(spark)
    table(spark, SF, "documents").createOrReplaceTempView("docs_sql")
    got = spark.sql(
        """
        WITH arr AS (
          -- SQL UDFs can't sit inside a Generate directly; project the
          -- array first, then explode the column
          SELECT doc_id, tokens(text) AS ws FROM docs_sql
        ), toks AS (
          SELECT doc_id, explode(ws) AS word FROM arr
        ), dedup AS (
          SELECT DISTINCT word, doc_id FROM toks
        )
        SELECT word,
               sort_array(collect_set(doc_id)) AS postings,
               count(*) AS doc_freq
        FROM dedup GROUP BY word
        """
    )
    want = build_index(table(spark, SF, "documents")).select(
        "word", "postings", F.col("doc_freq").cast("long").alias("doc_freq")
    )
    assert sorted(got.collect()) == sorted(want.collect())


def test_sql_functions_edge_cases(spark):
    register_sql_functions(spark)
    rows = spark.sql(
        """
        SELECT norm_word("Don't2X!") AS nw,
               tokens('  A!  123  b\tc  ') AS t,
               tokens('a\tb c') AS t2,
               round(cosine(array(1.0D, 0.0D), array(1.0D, 1.0D)), 6) AS cos,
               posting_line('zeta', array(1L, 2L, 10L)) AS line
        """
    ).collect()[0]
    assert rows.nw == "dontx"
    # strtok asymmetry: the tab sits after the first token, so 'b\tc'
    # is ONE strtok(NULL, " ") token and the normalizer joins it
    assert rows.t == ["a", "bc"]
    # ...but a tab terminating the FIRST token still splits
    assert rows.t2 == ["a", "b", "c"]
    assert rows.cos == 0.707107
    assert rows.line == "zeta:[1 2 10]"


def test_sql_function_is_macro_expanded_not_udf(spark):
    """The function body must inline into the plan (no Python worker,
    no BatchEvalPython operator) so codegen fuses it with the scan."""
    register_sql_functions(spark)
    table(spark, SF, "documents").createOrReplaceTempView("docs_sql")
    df = spark.sql("SELECT norm_word(text) AS w FROM docs_sql")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "regexp_replace" in plan  # body expanded inline
