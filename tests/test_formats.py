"""Round-trip and contract tests for the uniform format surface."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inverted_index_using_the_map_reduce_paradigm_spark.data import table
from inverted_index_using_the_map_reduce_paradigm_spark.sources.formats import (
    read_table,
    write_table,
)

SF = "/root/testdata/sf0.001"

NATION_SCHEMA = "n_nationkey int, n_name string, n_regionkey int"


@pytest.mark.parametrize("fmt", ["parquet", "orc", "csv", "json"])
def test_round_trip_preserves_rows(spark, tmp_path, fmt):
    src = table(spark, SF, "nation").select("n_nationkey", "n_name", "n_regionkey")
    out = str(tmp_path / fmt)
    write_table(src, out, fmt=fmt)
    back = read_table(
        spark, out, fmt=fmt,
        schema=None if fmt in ("parquet", "orc") else NATION_SCHEMA,
    )
    assert sorted(back.collect()) == sorted(src.collect())
    assert back.schema == src.schema


def test_partitioned_write_prunes_on_read(spark, tmp_path):
    src = table(spark, SF, "orders").select("o_orderkey", "o_orderstatus")
    out = str(tmp_path / "orders_p")
    write_table(src, out, partition_by=["o_orderstatus"])
    got = read_table(spark, out).filter(F.col("o_orderstatus") == "O")
    plan = got._jdf.queryExecution().executedPlan().toString()
    # the status predicate must be a partition filter, not a data filter
    assert "PartitionFilters: [isnotnull(o_orderstatus" in plan
    assert got.count() == src.filter(F.col("o_orderstatus") == "O").count()


def test_csv_without_schema_is_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="explicit schema"):
        read_table(spark, str(tmp_path / "x"), fmt="csv")


def test_csv_failfast_rejects_malformed(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("a,b\n1,2\nnot_an_int,3\n")
    df = read_table(spark, str(p), fmt="csv", schema="a int, b int")
    with pytest.raises(Exception, match="FAILFAST|Malformed|MALFORMED"):
        df.collect()


def test_gzip_warns_unsplittable(spark, tmp_path):
    import gzip
    import warnings as w

    p = tmp_path / "one.json.gz"
    with gzip.open(p, "wt") as f:
        f.write('{"a": 1}\n')
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        df = read_table(spark, str(p), fmt="json", schema="a int")
        assert any("not splittable" in str(c.message) for c in caught)
    assert df.collect()[0].a == 1
