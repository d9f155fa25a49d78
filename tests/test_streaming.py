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


def test_checkpoint_resume_is_exactly_once(spark, tmp_path):
    """Two availableNow runs over a growing source directory with one
    checkpoint must process each input file exactly once — the batch-1
    rows must not be re-emitted or lost when batch 2 arrives."""
    import shutil

    from pyspark.sql import functions as F

    from inverted_index_using_the_map_reduce_paradigm_spark.streaming.engine import run_to_parquet_once

    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    def arrive(name, ids):
        df = spark.range(0).sparkSession.createDataFrame(
            [(i, i * 10.0) for i in ids], ["id", "v"]
        )
        tmp = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(p for p in __import__("os").listdir(tmp) if p.endswith(".parquet"))
        shutil.copy(f"{tmp}/{part}", str(src / f"{name}.parquet"))

    def drain():
        stream = (
            spark.readStream.schema("id LONG, v DOUBLE").parquet(str(src))
            .withColumn("v2", F.col("v") * 2)
        )
        run_to_parquet_once(stream, out, ckpt)

    arrive("batch1", range(0, 5))
    drain()
    arrive("batch2", range(5, 8))
    drain()

    got = sorted(r.id for r in spark.read.parquet(out).collect())
    assert got == list(range(8))  # each input exactly once, none twice


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


def test_stream_inverted_index_equals_batch(spark):
    """The streaming index (posting lists growing in the state store)
    must converge to the batch flagship index when the whole corpus
    arrives as one micro-batch."""
    qs = load_all()
    batch = as_set(qs["inverted_index"].fn(spark, SF))
    stream = as_set(qs["stream_inverted_index"].fn(spark, SF))
    assert stream == batch
