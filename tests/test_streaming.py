"""Streaming-vs-batch convergence (SURVEY.md §7 step 7): the streaming
variants must produce exactly the batch (oracle-checked) results when
the whole fixture arrives as one micro-batch in update mode."""

from __future__ import annotations

from inverted_index_using_the_map_reduce_paradigm_spark.registry import load_all

SF = "/root/testdata/sf0.001"


def as_set(df):
    return {tuple(r) for r in df.collect()}


def test_stream_window_equals_batch(spark):
    qs = load_all()
    batch = as_set(qs["events_window"].fn(spark, SF))
    stream = as_set(qs["stream_events_window"].fn(spark, SF))
    assert stream == batch


def test_stream_sessionize_equals_batch(spark):
    qs = load_all()
    batch = as_set(qs["events_sessionize"].fn(spark, SF))
    stream = as_set(qs["stream_sessionize"].fn(spark, SF))
    assert stream == batch


def test_stream_purchase_attribution_equals_batch_join(spark):
    """The stream-stream interval join must emit exactly the rows the
    equivalent batch inner join produces."""
    from pyspark.sql import functions as F

    from inverted_index_using_the_map_reduce_paradigm_spark.data import table

    qs = load_all()
    ev = table(spark, SF, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts")
    )
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user_id"),
        F.col("ts").alias("s_ts"),
    )
    batch = as_set(
        p.join(
            s,
            (F.col("user_id") == F.col("s_user_id"))
            & (F.col("s_ts") <= F.col("p_ts"))
            & (F.col("s_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
        ).select(
            "purchase_id",
            "user_id",
            "signup_id",
            F.unix_timestamp("p_ts").alias("purchase_ts"),
            F.unix_timestamp("s_ts").alias("signup_ts"),
        )
    )
    stream = as_set(qs["stream_purchase_attribution"].fn(spark, SF))
    assert len(batch) > 0
    assert stream == batch


def test_stream_exact_dedup_matches_batch_groups(spark):
    """Streaming dropDuplicates must keep exactly one row per distinct
    content hash — the same hash set the batch exact_dedup groups on."""
    qs = load_all()
    batch_hashes = {
        r.content_hash for r in qs["exact_dedup"].fn(spark, SF).collect()
    }
    stream_hashes = {
        r.content_hash for r in qs["stream_exact_dedup"].fn(spark, SF).collect()
    }
    assert stream_hashes == batch_hashes


def test_stream_user_stats_equals_batch(spark):
    """The applyInPandasWithState running stats must equal the batch
    groupBy when the whole fixture arrives as one micro-batch."""
    from pyspark.sql import functions as F

    from inverted_index_using_the_map_reduce_paradigm_spark.data import table

    qs = load_all()
    ev = table(spark, SF, "events")
    batch = as_set(
        ev.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            (F.round(F.sum("value"), 2) + F.lit(0.0)).alias("sum_value"),
        )
    )
    stream = as_set(qs["stream_user_stats"].fn(spark, SF))
    assert stream == batch
