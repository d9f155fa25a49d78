"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

The actual engine surface lives in the
``inverted_index_using_the_map_reduce_paradigm_spark`` package; this module just exposes
its registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from inverted_index_using_the_map_reduce_paradigm_spark import registry  # noqa: E402
from inverted_index_using_the_map_reduce_paradigm_spark.data import table  # noqa: E402
from inverted_index_using_the_map_reduce_paradigm_spark.operators.inverted_index import (  # noqa: E402
    build_index,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: full inverted index over sf0.001 documents, in the
    reference's global output order (letter, doc_freq DESC, word ASC)."""
    from pyspark.sql import functions as F

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    return build_index(docs).orderBy("letter", F.desc("doc_freq"), F.asc("word"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.fn for name, q in registry.load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {
        name: q.oracle for name, q in registry.load_all().items() if q.oracle is not None
    }
