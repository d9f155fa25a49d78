"""PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference (an inverted-index MapReduce builder, ``/root/reference/main.c++``),
re-expressed Spark-first: the DataFrame/SQL API declares logical plans and
Catalyst/Tungsten pick the physical strategy.  Extended with the
LLM-data-pipeline operator set (dedup, similarity search, text analysis,
multimodal plumbing) designed for 100 TB scale.

Layout:
    session    - tuned SparkSession builder
    data       - table loaders for the parquet fixtures
    registry   - query registry (name -> spark fn + DuckDB oracle SQL)
    operators/ - one module per operator family (SURVEY.md section 2)
    sources/   - reference-native manifest reader, sinks
    functions/ - reusable column expressions (vector math, hashing, text)
    streaming/ - Structured Streaming variants of the temporal operators
"""

__version__ = "0.1.0"
