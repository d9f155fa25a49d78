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


def test_multi_batch_window_agg_with_late_data(spark, tmp_path):
    """REAL multi-micro-batch semantics (the registered queries pin
    single-batch for their oracles; this pins what happens beyond it):
    a watermarked tumbling-window count fed one file per trigger must
    (a) merge in-window updates across batches, and (b) DROP a row
    arriving after the watermark has passed its window, in append mode
    emitting each window exactly once."""
    import os
    import shutil

    from pyspark.sql import functions as F

    src = tmp_path / "src"
    src.mkdir()

    def arrive(name, rows):
        df = spark.createDataFrame(rows, ["ts_s", "k"]).select(
            F.timestamp_seconds("ts_s").alias("ts"), "k"
        )
        tmp = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        shutil.copy(f"{tmp}/{part}", str(src / f"{name}.parquet"))

    H = 3600
    # batch 1: two rows in window [0,1h), one at [2h,3h) pushing the
    # max event time to 2h -> watermark 2h - 1h = 1h, closing [0,1h).
    arrive("b1", [(10, "a"), (20, "a"), (2 * H + 5, "a")])
    # batch 2: on-time row only.  The watermark computed from batch 1
    # appears in batch 2's progress but is applied to the late-row
    # FILTER one batch later still — a measured Spark behavior this
    # test pins deliberately (late data has a one-batch grace window).
    arrive("b2", [(2 * H + 6, "a")])
    # batch 3: a LATE row for the closed [0,1h) window — by now the
    # 1h watermark governs the filter, so it MUST be dropped.
    arrive("b3", [(30, "a"), (2 * H + 7, "a")])

    agg = (
        spark.readStream.schema("ts TIMESTAMP, k STRING")
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .parquet(str(src))
        .withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), "k")
        .agg(F.count("*").alias("n"))
        .select(F.unix_timestamp("w.start").alias("ws"), "k", "n")
    )
    name = "late_data_test_sink"
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
        assert len(batches) == 3, "maxFilesPerTrigger=1 must yield 3 batches"
    finally:
        q.stop()
    rows = {(r.ws, r.k): r.n for r in spark.table(name).collect()}
    # [0,1h) closed with ONLY batch-1's rows (batch-3's late row
    # dropped by the watermark filter); [2h,3h) never closes (the
    # watermark stops at 1h), so append emits nothing for it yet —
    # exactly-once per window.
    assert rows == {(0, "a"): 2}


def test_stream_upsert_store_equals_batch_dedup(spark, tmp_path):
    """The foreachBatch upsert store must converge to the batch dedup
    keepers (hash -> min doc_id) — and stay correct when the input is
    force-split into 4 micro-batches via the shared harness (each
    batch anti-joins the store, so the contract does not lean on
    single-trigger delivery).  The r11 hardening: assert the sink's
    committed-batch count (from its own checkpoint) really crossed
    >= 3 trigger boundaries, so a regression in the glob/mtime split
    mechanics can't silently turn this back into a single-batch
    test."""
    qs = load_all()
    batch = as_set(
        qs["exact_dedup"].fn(spark, SF).select("content_hash", "keeper_doc_id")
    )
    stream = as_set(
        qs["stream_upsert_store"].fn(spark, SF).select(
            "content_hash", "keeper_doc_id"
        )
    )
    assert stream == batch

    src = _split_fixture(spark, tmp_path, "documents", "doc_id")
    with _force_multi_batch():
        multi = as_set(
            qs["stream_upsert_store"].fn(spark, src).select(
                "content_hash", "keeper_doc_id"
            )
        )
        assert _engine._LAST_FED_BATCHES >= 3
    # same hash set; keepers may differ only if a duplicate's lower
    # doc_id arrived in a later file — impossible under doc_id-ordered
    # range split, so full equality holds
    assert multi == batch


# --------------------------------------------------------------------------
# FORCED multi-micro-batch equality (r7): the four remaining stateful
# queries must converge to their batch results when the fixture is
# split into >= 3 files fed one per trigger — real trigger boundaries,
# real state merges, which the single-batch oracle contract can't see.
# --------------------------------------------------------------------------

import contextlib
import glob as _glob
import os as _os
import shutil as _shutil

from inverted_index_using_the_map_reduce_paradigm_spark.streaming import engine as _engine


@contextlib.contextmanager
def _force_multi_batch():
    """One file per trigger + permit >1 fed batch in _run_to_memory,
    and widen the production exact-filename globs so the split files
    (events1.parquet, ...) are visible to the stream — production keeps
    the exact name so a stray events_backup.parquet can't be silently
    ingested."""
    orig = (
        _engine._SINGLE_BATCH_FILES,
        _engine._EXPECT_MULTI_BATCH,
        _engine._EVENTS_GLOB,
        _engine._DOCS_GLOB,
    )
    _engine._SINGLE_BATCH_FILES, _engine._EXPECT_MULTI_BATCH = 1, True
    _engine._EVENTS_GLOB, _engine._DOCS_GLOB = (
        "events*.parquet",
        "documents*.parquet",
    )
    try:
        yield
    finally:
        (
            _engine._SINGLE_BATCH_FILES,
            _engine._EXPECT_MULTI_BATCH,
            _engine._EVENTS_GLOB,
            _engine._DOCS_GLOB,
        ) = orig


def _split_fixture(spark, tmp_path, tbl: str, order_col: str, n: int = 4) -> str:
    """Split a fixture table into n single-file parquets in order_col
    order, named <tbl>.parquet / <tbl>1.parquet / ... with ascending
    mtimes so the file source feeds them oldest-first one per trigger
    (the first keeps the canonical name for the schema probe)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    src = tmp_path / f"{tbl}_split"
    src.mkdir()
    df = spark.read.parquet(f"{SF}/{tbl}.parquet")
    per = df.count() // n + 1
    w = Window.orderBy(order_col)
    idx = df.withColumn(
        "_i", ((F.row_number().over(w) - 1) / per).cast("int")
    )
    for i in range(n):
        stage = str(tmp_path / f"_stage_{tbl}_{i}")
        (
            idx.filter(F.col("_i") == i)
            .drop("_i")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(stage)
        )
        part = _glob.glob(f"{stage}/part-*.parquet")[0]
        dest = str(src / (f"{tbl}.parquet" if i == 0 else f"{tbl}{i}.parquet"))
        _shutil.copy(part, dest)
        _os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))
        _shutil.rmtree(stage)
    return str(src)


def _final_state(df, key_cols, rank_col):
    """Update-mode memory sinks append one row per key per updating
    batch; the FINAL state per key is the row with the max rank_col
    (strictly monotone across a key's emissions: every re-emission
    merged new rows into the key's state)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(*key_cols).orderBy(F.desc(rank_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def test_multibatch_stream_exact_dedup_equals_batch(spark, tmp_path):
    """Append-mode dropDuplicates under a forced 4-file split: state
    carries first-seen hashes across trigger boundaries, so the union
    of emissions must be exactly the batch-distinct hash set."""
    qs = load_all()
    batch_hashes = {
        r.content_hash for r in qs["exact_dedup"].fn(spark, SF).collect()
    }
    src = _split_fixture(spark, tmp_path, "documents", "doc_id")
    with _force_multi_batch():
        got = {r.content_hash for r in qs["stream_exact_dedup"].fn(spark, src).collect()}
        assert _engine._LAST_FED_BATCHES >= 3
    assert got == batch_hashes


def test_multibatch_stream_user_stats_equals_batch(spark, tmp_path):
    """applyInPandasWithState under a forced 4-file split: per-user
    (count, sum) state must merge across trigger boundaries; the final
    emission per user (max n_events — strictly monotone) must equal
    the batch groupBy."""
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
    src = _split_fixture(spark, tmp_path, "events", "ts")
    with _force_multi_batch():
        sink = qs["stream_user_stats"].fn(spark, src)
        assert _engine._LAST_FED_BATCHES >= 3
        final = as_set(_final_state(sink, ["user_id"], "n_events"))
    assert final == batch


def test_multibatch_stream_inverted_index_equals_batch(spark, tmp_path):
    """The streaming index under a forced 4-file doc_id-ordered split:
    posting-list state must grow across trigger boundaries (each batch
    adds disjoint doc_ids, so doc_freq is strictly monotone per word);
    the final emission per word must equal the batch flagship index."""
    qs = load_all()
    batch = as_set(qs["inverted_index"].fn(spark, SF))
    src = _split_fixture(spark, tmp_path, "documents", "doc_id")
    with _force_multi_batch():
        sink = qs["stream_inverted_index"].fn(spark, src)
        assert _engine._LAST_FED_BATCHES >= 3
        final = as_set(_final_state(sink, ["word"], "doc_freq"))
    assert final == batch


def test_multibatch_stream_sessionize_equals_batch(spark, tmp_path):
    """Session windows under a forced 4-file ts-ordered split: sessions
    spanning a trigger boundary must merge in the state store; complete
    mode re-emits the whole state each trigger, so the sink's final
    contents are the final state and must equal the batch sessionize."""
    qs = load_all()
    batch = as_set(qs["events_sessionize"].fn(spark, SF))
    src = _split_fixture(spark, tmp_path, "events", "ts")
    with _force_multi_batch():
        got = as_set(qs["stream_sessionize"].fn(spark, src))
        assert _engine._LAST_FED_BATCHES >= 3
    assert got == batch


def test_multibatch_stream_purchase_attribution_equals_batch(spark, tmp_path):
    """Stream-stream interval join under a forced 4-file ts-ordered
    split: each side's state must buffer across trigger boundaries
    until the watermark passes the interval bound.  With a ts-ordered
    feed no valid pair can expire early (a matching purchase arrives
    while its signup's eviction watermark still trails by the 2h
    delay), so the union of append-mode emissions must equal the batch
    inner join exactly — the last of the stateful streaming queries to
    get real trigger-boundary coverage."""
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
    src = _split_fixture(spark, tmp_path, "events", "ts")
    with _force_multi_batch():
        got = as_set(qs["stream_purchase_attribution"].fn(spark, src))
        assert _engine._LAST_FED_BATCHES >= 3
    assert len(batch) > 0
    assert got == batch


def test_multibatch_stream_purchase_attribution_outer_equals_batch(
    spark, tmp_path
):
    """LEFT OUTER stream-stream join under a forced 4-file ts-ordered
    split: unmatched purchases must flush progressively as each
    trigger's watermark advances (not just at stream end), matched
    pairs emit exactly once even when the two sides arrive in
    different triggers, and the union of emissions restricted to the
    watermark-stable region must equal the batch left join there."""
    from pyspark.sql import functions as F

    from inverted_index_using_the_map_reduce_paradigm_spark.data import table

    qs = load_all()
    ev = table(spark, SF, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user_id"),
        F.col("ts").alias("s_ts"),
    )
    stable = (
        ev.agg(
            F.unix_timestamp(
                F.least(
                    F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
                    F.max(F.when(F.col("event_type") == "signup", F.col("ts"))),
                )
            ).alias("m")
        ).collect()[0]["m"]
        - 2 * 3600
        - 1800
    )
    batch = as_set(
        p.join(
            s,
            (F.col("user_id") == F.col("s_user_id"))
            & (F.col("s_ts") <= F.col("p_ts"))
            & (F.col("s_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
            "leftOuter",
        )
        .select(
            "purchase_id",
            "user_id",
            F.coalesce("signup_id", F.lit(-1)).alias("signup_id"),
            F.unix_timestamp("p_ts").alias("purchase_ts"),
            F.coalesce(F.unix_timestamp("s_ts"), F.lit(-1)).alias("signup_ts"),
        )
        .filter(
            (F.col("signup_id") != -1) | (F.col("purchase_ts") < stable)
        )
    )
    src = _split_fixture(spark, tmp_path, "events", "ts")
    with _force_multi_batch():
        got = as_set(qs["stream_purchase_attribution_outer"].fn(spark, src))
        assert _engine._LAST_FED_BATCHES >= 3
    # the contract is real: some purchases genuinely unmatched
    assert any(row[2] == -1 for row in batch)
    assert got == batch


def test_multibatch_stream_attribution_full_outer_equals_batch(
    spark, tmp_path
):
    """FULL OUTER stream-stream join under a forced 4-file ts-ordered
    split: both sides' unmatched rows must flush as the per-trigger
    watermark passes their (asymmetric) eviction points, and the
    stable-region union must equal the batch full join there."""
    from pyspark.sql import functions as F

    from inverted_index_using_the_map_reduce_paradigm_spark.data import table

    qs = load_all()
    ev = table(spark, SF, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    s = ev.filter(F.col("event_type") == "signup").select(
        F.col("event_id").alias("signup_id"),
        F.col("user_id").alias("s_user_id"),
        F.col("ts").alias("s_ts"),
    )
    p_stable = (
        ev.agg(
            F.unix_timestamp(
                F.least(
                    F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
                    F.max(F.when(F.col("event_type") == "signup", F.col("ts"))),
                )
            ).alias("m")
        ).collect()[0]["m"]
        - 2 * 3600
        - 1800
    )
    batch = as_set(
        p.join(
            s,
            (F.col("user_id") == F.col("s_user_id"))
            & (F.col("s_ts") <= F.col("p_ts"))
            & (F.col("s_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR")),
            "fullOuter",
        )
        .select(
            F.coalesce("purchase_id", F.lit(-1)).alias("purchase_id"),
            F.coalesce("user_id", "s_user_id").alias("user_id"),
            F.coalesce("signup_id", F.lit(-1)).alias("signup_id"),
            F.coalesce(F.unix_timestamp("p_ts"), F.lit(-1)).alias(
                "purchase_ts"
            ),
            F.coalesce(F.unix_timestamp("s_ts"), F.lit(-1)).alias(
                "signup_ts"
            ),
        )
        .filter(
            ((F.col("purchase_id") != -1) & (F.col("signup_id") != -1))
            | ((F.col("signup_id") == -1) & (F.col("purchase_ts") < p_stable))
            | (
                (F.col("purchase_id") == -1)
                & (F.col("signup_ts") < p_stable - 3600)
            )
        )
    )
    src = _split_fixture(spark, tmp_path, "events", "ts")
    with _force_multi_batch():
        got = as_set(qs["stream_attribution_full_outer"].fn(spark, src))
        assert _engine._LAST_FED_BATCHES >= 3
    # both unmatched directions genuinely present
    assert any(row[0] == -1 for row in batch)
    assert any(row[2] == -1 for row in batch)
    assert got == batch


def test_multibatch_stream_events_window_equals_batch(spark, tmp_path):
    """Tumbling-window aggregation under a forced 4-file ts-ordered
    split (r9 VERDICT item 6): windows spanning a trigger boundary
    must merge in the state store, and the ts-ordered feed guarantees
    no row is watermark-dropped (a batch's min ts is >= the previous
    batch's max, so every window end is >= the committed watermark) —
    the FINAL update-mode emission per (window, event_type) must equal
    the batch events_window exactly, sums included."""
    qs = load_all()
    batch = as_set(qs["events_window"].fn(spark, SF))
    src = _split_fixture(spark, tmp_path, "events", "ts")
    with _force_multi_batch():
        sink = qs["stream_events_window"].fn(spark, src)
        assert _engine._LAST_FED_BATCHES >= 3
        final = as_set(
            _final_state(sink, ["window_start", "event_type"], "n_events")
        )
    assert final == batch


def test_multibatch_stream_enrich_static_equals_batch(spark, tmp_path):
    """The stream-static dimension join under a forced 4-file split:
    stateless, so the union of per-trigger emissions must equal the
    batch join row-for-row regardless of how the stream is split —
    and the static side re-resolves identically every trigger."""
    from pyspark.sql import functions as F

    from inverted_index_using_the_map_reduce_paradigm_spark.data import table

    qs = load_all()
    ev = table(spark, SF, "events")
    dim = table(spark, SF, "customer").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    batch = as_set(
        ev.select("event_id", "user_id", "value")
        .join(dim, "user_id")
        .select(
            "event_id",
            "user_id",
            "segment",
            (F.round("value", 2) + F.lit(0.0)).alias("value"),
        )
    )
    src = _split_fixture(spark, tmp_path, "events", "ts")
    # the static dim side resolves from the same sf_dir
    _shutil.copy(f"{SF}/customer.parquet", f"{src}/customer.parquet")
    with _force_multi_batch():
        got = as_set(qs["stream_enrich_static"].fn(spark, src))
        assert _engine._LAST_FED_BATCHES >= 3
    assert len(batch) > 0
    assert got == batch


def test_multibatch_stream_cms_sketch_equals_batch_sketch(spark, tmp_path):
    """The streaming Count-Min sketch under a forced 4-file ts-ordered
    split: every (seed, bucket) counter must accumulate across trigger
    boundaries to EXACTLY the batch-built sketch — cell-level equality,
    not just the mass-conservation rollup the oracle checks."""
    from pyspark.sql import functions as F

    from inverted_index_using_the_map_reduce_paradigm_spark.operators.census import (
        _cms_buckets,
    )

    batch_cells = as_set(
        spark.read.parquet(f"{SF}/events.parquet")
        .select(F.posexplode(_cms_buckets(F.col("event_type"))).alias("seed", "bucket"))
        .groupBy("seed", "bucket")
        .agg(F.count("*").alias("cnt"))
    )
    src = _split_fixture(spark, tmp_path, "events", "ts")
    with _force_multi_batch():
        ev = _engine._event_stream(spark, src)
        cells = (
            ev.select(
                F.posexplode(_cms_buckets(F.col("event_type"))).alias("seed", "bucket")
            )
            .groupBy("seed", "bucket")
            .agg(F.count("*").alias("cnt"))
        )
        got = as_set(_engine._run_to_memory(cells, "complete"))
        assert _engine._LAST_FED_BATCHES >= 3
    assert got == batch_cells
    # and the registered query's rollup under the same split: 4 rows of
    # exactly count(events) mass each
    n = spark.read.parquet(f"{SF}/events.parquet").count()
    with _force_multi_batch():
        rolled = load_all()["stream_cms_sketch"].fn(spark, src).collect()
    assert sorted((r.seed, r.mass) for r in rolled) == [(s, n) for s in range(4)]


# --------------------------------------------------------------------------
# LATE-DATA semantics (r8): inject out-of-order rows beyond the
# watermark per stateful query and pin drop-vs-update behavior.  The
# forced-split harness feeds ordered files; these feed a file whose
# rows are OLDER than the committed watermark.  Two mechanics matter
# (both discovered empirically and load-bearing for the fixtures):
# the watermark used to filter batch N's input is the one committed
# from batches <= N-2, so a SPACER batch sits between the
# watermark-advancing rows and the late rows; and a watermark operator
# only sees rows that reach IT — the join's per-leg watermarks sit
# after the event_type filters, so its spacers must be signup/purchase
# rows, not clicks.
# --------------------------------------------------------------------------


def _write_event_batches(spark, tmp_path, batches):
    """Write each batch of (event_id, ts_str, user_id, event_type,
    value) rows as one single-file parquet named events{i}.parquet with
    ascending mtimes (events.parquet for i=0 — the schema probe's
    canonical name), so the file source feeds them one per trigger
    under _force_multi_batch."""
    from pyspark.sql import functions as F

    src = tmp_path / "late_events"
    src.mkdir(exist_ok=True)
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            [(eid, ts, uid, et, val, "{}") for eid, ts, uid, et, val in rows],
            "event_id long, ts string, user_id long, event_type string,"
            " value double, props string",
        ).withColumn("ts", F.to_timestamp("ts"))
        stage = str(tmp_path / f"_stage_late_{i}")
        df.coalesce(1).write.mode("overwrite").parquet(stage)
        part = _glob.glob(f"{stage}/part-*.parquet")[0]
        dest = str(src / ("events.parquet" if i == 0 else f"events{i}.parquet"))
        _shutil.copy(part, dest)
        _os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))
        _shutil.rmtree(stage)
    return str(src)


D = "2024-01-01"
_TS = {  # unix seconds for the event times used below (UTC)
    "10:00": 1704103200, "10:40": 1704105600, "13:00": 1704114000,
    "13:30": 1704115800, "14:00": 1704117600, "14:30": 1704119400,
    "15:00": 1704121200,
}


def test_late_row_dropped_by_windowed_aggregation(spark, tmp_path):
    """stream_events_window (update mode, 1h watermark): a row arriving
    after the watermark passed its window's end is DROPPED — the final
    state for that window keeps the pre-late aggregate, diverging from
    the batch result by exactly the late row."""
    src = _write_event_batches(spark, tmp_path, [
        [(1, f"{D} 10:00:00", 1, "click", 1.0),
         (2, f"{D} 13:30:00", 2, "click", 1.0)],
        [(3, f"{D} 14:30:00", 3, "click", 1.0)],   # spacer commits wm 12:30
        [(4, f"{D} 10:20:00", 1, "click", 5.0),    # LATE: window ends 11:00
         (5, f"{D} 14:40:00", 3, "click", 2.0)],   # fresh
    ])
    qs = load_all()
    with _force_multi_batch():
        sink = qs["stream_events_window"].fn(spark, src)
        assert _engine._LAST_FED_BATCHES >= 3
        final = as_set(
            _final_state(sink, ["window_start", "event_type"], "n_events")
        )
    assert final == {
        (_TS["10:00"], "click", 1, 1.0),  # late 10:20 row NOT merged
        (_TS["13:00"], "click", 1, 1.0),
        (_TS["14:00"], "click", 2, 3.0),
    }


def test_late_row_dropped_by_session_window_even_in_complete_mode(spark, tmp_path):
    """stream_sessionize (complete mode): watermark filtering applies
    to the INPUT regardless of output mode — a late row that would have
    extended a closed session is dropped, so the final state keeps the
    original session bounds (complete mode retains state but does not
    resurrect late rows)."""
    src = _write_event_batches(spark, tmp_path, [
        [(1, f"{D} 10:00:00", 1, "click", 1.0),
         (2, f"{D} 10:10:00", 1, "click", 2.0),
         (3, f"{D} 13:30:00", 9, "click", 1.0)],
        [(4, f"{D} 14:30:00", 9, "click", 1.0)],   # spacer commits wm 12:30
        [(5, f"{D} 10:20:00", 1, "click", 5.0)],   # LATE: would extend session
    ])
    qs = load_all()
    with _force_multi_batch():
        got = as_set(qs["stream_sessionize"].fn(spark, src))
        assert _engine._LAST_FED_BATCHES >= 3
    assert got == {
        (1, _TS["10:00"], _TS["10:40"], 2, 3.0),  # ends 10:10+gap, late row absent
        (9, _TS["13:30"], _TS["14:00"], 1, 1.0),
        (9, _TS["14:30"], _TS["15:00"], 1, 1.0),
    }


def test_late_row_updates_user_stats_no_watermark(spark, tmp_path):
    """stream_user_stats (applyInPandasWithState, NoTimeout, no
    watermark): event-time lateness is invisible — an out-of-order row
    UPDATES the user's state, so the final emission equals the batch
    aggregate INCLUDING the late row (the contract a watermark-free
    custom stateful operator promises)."""
    src = _write_event_batches(spark, tmp_path, [
        [(1, f"{D} 10:00:00", 1, "click", 1.0),
         (2, f"{D} 10:10:00", 1, "click", 2.0),
         (3, f"{D} 13:30:00", 9, "click", 1.0)],
        [(4, f"{D} 14:30:00", 9, "click", 1.0)],
        [(5, f"{D} 10:20:00", 1, "click", 5.0)],   # late by event time
    ])
    qs = load_all()
    with _force_multi_batch():
        sink = qs["stream_user_stats"].fn(spark, src)
        assert _engine._LAST_FED_BATCHES >= 3
        final = as_set(_final_state(sink, ["user_id"], "n_events"))
    assert final == {(1, 3, 8.0), (9, 2, 2.0)}


def test_late_rows_dropped_by_stream_stream_join(spark, tmp_path):
    """stream_purchase_attribution: a late signup and a late purchase
    (each below the min-of-legs watermark, arriving in DIFFERENT
    batches so neither can new-x-new join) are dropped pre-state — the
    pair the batch join would produce never appears, while on-time
    pairs keep flowing.  The spacer advancing the watermark must be a
    signup+purchase pair: the per-leg watermark operators sit after
    the event_type filters, so click rows never advance them."""
    src = _write_event_batches(spark, tmp_path, [
        [(1, f"{D} 10:00:00", 1, "signup", 0.0),
         (2, f"{D} 10:30:00", 1, "purchase", 9.0),
         (3, f"{D} 20:00:00", 9, "signup", 0.0),
         (4, f"{D} 20:30:00", 9, "purchase", 9.0)],
        [(5, f"{D} 21:00:00", 8, "signup", 0.0),   # spacer pair: commits
         (6, f"{D} 21:30:00", 8, "purchase", 9.0)],  # wm >= 18:00 on both legs
        [(7, f"{D} 10:40:00", 2, "signup", 0.0)],    # LATE signup, dropped
        [(8, f"{D} 11:00:00", 2, "purchase", 9.0),   # LATE purchase, dropped
         (9, f"{D} 21:40:00", 3, "signup", 0.0),
         (10, f"{D} 21:50:00", 3, "purchase", 9.0)],
    ])
    qs = load_all()
    with _force_multi_batch():
        rows = qs["stream_purchase_attribution"].fn(spark, src).collect()
        assert _engine._LAST_FED_BATCHES >= 3
    pairs = {(r.user_id, r.purchase_id, r.signup_id) for r in rows}
    assert pairs == {(1, 2, 1), (9, 4, 3), (8, 6, 5), (3, 10, 9)}  # no (2, 8, 7)


def test_late_rows_counted_by_cms_sketch_no_watermark(spark, tmp_path):
    """stream_cms_sketch: the sketch has no event-time semantics — a
    late row is mass like any other, so per-seed mass equals the TOTAL
    row count including the late one (the mergeable-sketch contract:
    arrival order and lateness cannot change the final counters)."""
    src = _write_event_batches(spark, tmp_path, [
        [(1, f"{D} 10:00:00", 1, "click", 1.0),
         (2, f"{D} 13:30:00", 2, "view", 1.0)],
        [(3, f"{D} 14:30:00", 3, "click", 1.0)],
        [(4, f"{D} 10:20:00", 1, "error", 5.0)],   # late by event time
    ])
    qs = load_all()
    with _force_multi_batch():
        rolled = qs["stream_cms_sketch"].fn(spark, src).collect()
        assert _engine._LAST_FED_BATCHES >= 3
    assert sorted((r.seed, r.mass) for r in rolled) == [(s, 4) for s in range(4)]


def test_dedup_within_watermark_ttl_reemits_after_eviction(spark, tmp_path):
    """The semantics that make dropDuplicatesWithinWatermark the
    bounded-state production dedup: (a) a duplicate arriving WITHIN
    the 1h delay of its first occurrence is dropped, (b) a key whose
    state the advancing watermark has evicted IS RE-EMITTED on
    re-arrival — the trade plain dropDuplicates (which would dedup
    both but grow state forever) never makes."""
    import os
    import shutil

    from pyspark.sql import functions as F

    src = tmp_path / "src"
    src.mkdir()

    def arrive(name, rows):
        df = spark.createDataFrame(rows, ["ts_s", "k"]).select(
            F.timestamp_seconds("ts_s").alias("ts"), "k"
        )
        tmp = str(tmp_path / f"stage_{name}")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(p for p in os.listdir(tmp) if p.endswith(".parquet"))
        shutil.copy(f"{tmp}/{part}", str(src / f"{name}.parquet"))

    H = 3600
    # batch 1: 'a' at 10s (expires at 1h10s), 'b' at 2h58m (expires at
    # 3h58m), watermark-pusher 'w' at 3h -> watermark after b1 = 2h.
    arrive("b1", [(10, "a"), (2 * H + 58 * 60, "b"), (3 * H, "w")])
    # batch 2: watermark-advancer only.  Eviction (like the late-row
    # filter, see test_multi_batch_window_agg_with_late_data) applies
    # the b1-computed 2h watermark DURING this batch: 'a' (expiry
    # 1h10s < 2h) leaves the state store here.
    arrive("b2", [(3 * H + 60, "x")])
    # batch 3: 'a' re-arrives at 3h+10 — its state is gone, so it
    # re-emits; 'b' re-arrives at 3h+5 — still within its 1h window
    # (expiry 3h58m > the governing watermark), so it is dropped.
    arrive("b3", [(3 * H + 10, "a"), (3 * H + 5, "b")])

    dd = (
        spark.readStream.schema("ts TIMESTAMP, k STRING")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["k"])
        .select("k", F.unix_timestamp("ts").alias("ts_s"))
    )
    name = "dedup_ttl_test_sink"
    q = (
        dd.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
        assert len(batches) == 3, "maxFilesPerTrigger=1 must yield 3 batches"
    finally:
        q.stop()
    rows = sorted((r.k, r.ts_s) for r in spark.table(name).collect())
    assert rows == [
        ("a", 10),
        ("a", 3 * H + 10),  # re-emitted after state eviction
        ("b", 2 * H + 58 * 60),  # second arrival deduped in-window
        ("w", 3 * H),
        ("x", 3 * H + 60),
    ]


def test_transform_with_state_or_documented_absence(spark):
    """transformWithStateInPandas needs google.protobuf in the Python
    runtime (the state-server protocol).  Where present, the named-
    ValueState processor must equal the batch aggregate (same contract
    as stream_user_stats); where absent, the probe documents the gap
    and the processor's LOGIC is still verified against a fake state
    handle so the operator can't rot."""
    import pandas as pd
    import pytest

    from inverted_index_using_the_map_reduce_paradigm_spark.streaming.engine import (
        UserStatsProcessor,
        transform_with_state_available,
        user_stats_tws,
    )

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = v

    class FakeHandle:
        def getValueState(self, name, schema, ttlDurationMs=None):
            assert name == "stats" and ttlDurationMs is None
            return FakeValueState()

    proc = UserStatsProcessor()
    proc.init(FakeHandle())
    out1 = list(
        proc.handleInputRows(
            (7,), iter([pd.DataFrame({"value": [1.5, 2.5]})]), None
        )
    )
    out2 = list(
        proc.handleInputRows(
            (7,), iter([pd.DataFrame({"value": [4.0]})]), None
        )
    )  # second micro-batch: state carries over
    assert out1[0].iloc[0].tolist() == [7, 2, 4.0]
    assert out2[0].iloc[0].tolist() == [7, 3, 8.0]
    proc.close()

    if not transform_with_state_available():
        pytest.skip(
            "google.protobuf absent: transformWithStateInPandas worker "
            "cannot start in this sandbox (probe-gated like spark-avro)"
        )
    got = {
        (r.user_id, r.n_events, r.sum_value)
        for r in user_stats_tws(spark, SF).collect()
    }
    from pyspark.sql import functions as F

    from inverted_index_using_the_map_reduce_paradigm_spark.data import table

    exp = {
        (r.user_id, r.n_events, r.sum_value)
        for r in table(spark, SF, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.round(F.sum("value"), 2) + 0.0).alias("sum_value"),
        )
        .collect()
    }
    assert got == exp


# --------------------------------------------------------------------------
# r11: the vendored protobuf shim behind transformWithStateInPandas
# --------------------------------------------------------------------------


def test_protoshim_wire_format_against_generated_pb2():
    """The shim must be wire-correct for the constructs
    StateMessage.proto uses: oneof exclusivity (including EMPTY oneof
    members, which must still emit their tag), submessage presence via
    auto-vivification, repeated bytes/messages, proto3 optional
    (TimerInfo.key), enums, negative int32, and packed repeated
    varints on parse.  Runs against pyspark's REAL generated pb2
    module, importing through whichever runtime is active."""
    import importlib
    import sys as _sys

    import pytest

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        from inverted_index_using_the_map_reduce_paradigm_spark.streaming.engine import (
            _PROTOSHIM_DIR,
        )

        if _PROTOSHIM_DIR not in _sys.path:
            _sys.path.insert(0, _PROTOSHIM_DIR)
    sm = importlib.import_module(
        "pyspark.sql.streaming.proto.StateMessage_pb2"
    )

    # oneof with empty member: tag+len(0) must be emitted and survive
    req = sm.StateRequest(
        implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
            removeImplicitKey=sm.RemoveImplicitKey()
        )
    )
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    assert back.WhichOneof("method") == "implicitGroupingKeyRequest"
    assert (
        back.implicitGroupingKeyRequest.WhichOneof("method")
        == "removeImplicitKey"
    )

    # submessage presence via attribute write-through (pyspark's own
    # construction pattern for TTL)
    cmd = sm.StateCallCommand()
    cmd.stateName = "stats"
    cmd.ttl.durationMs = 5000
    assert cmd.HasField("ttl")
    rt = sm.StateCallCommand()
    rt.ParseFromString(cmd.SerializeToString())
    assert rt.stateName == "stats" and rt.ttl.durationMs == 5000
    # reading a submessage does NOT set presence
    probe = sm.StateCallCommand()
    _ = probe.ttl.durationMs
    assert not probe.HasField("ttl")

    # oneof reassignment clears the previous member
    call = sm.StatefulProcessorCall(getValueState=sm.StateCallCommand())
    call2 = sm.StatefulProcessorCall()
    call2.ParseFromString(call.SerializeToString())
    assert call2.WhichOneof("method") == "getValueState"

    # repeated bytes + bool
    lg = sm.StateResponseWithListGet(value=[b"a", b"bb"], requireNextFetch=True)
    lgb = sm.StateResponseWithListGet()
    lgb.ParseFromString(lg.SerializeToString())
    assert list(lgb.value) == [b"a", b"bb"] and lgb.requireNextFetch

    # repeated message + proto3 optional presence
    tr = sm.StateResponseWithTimer(
        timer=[sm.TimerInfo(timestampMs=9), sm.TimerInfo(key=b"k", timestampMs=5)]
    )
    trb = sm.StateResponseWithTimer()
    trb.ParseFromString(tr.SerializeToString())
    got = [(t.HasField("key"), t.key, t.timestampMs) for t in trb.timer]
    assert got == [(False, b"", 9), (True, b"k", 5)]

    # negative int32 (10-byte varint two's complement)
    resp = sm.StateResponse(statusCode=-3, errorMessage="boom")
    rb = sm.StateResponse()
    rb.ParseFromString(resp.SerializeToString())
    assert rb.statusCode == -3 and rb.errorMessage == "boom"

    # enum round trip + module-level constants
    sh = sm.SetHandleState(state=sm.INITIALIZED)
    shb = sm.SetHandleState()
    shb.ParseFromString(sh.SerializeToString())
    assert shb.state == sm.HandleState.INITIALIZED == 2

    # packed repeated varint parse (writers MAY pack; readers must cope)
    if "protoshim" in (getattr(sm, "__file__", "") or "") or True:
        from inverted_index_using_the_map_reduce_paradigm_spark.streaming.engine import (
            _protoshim_in_use,
        )

        if _protoshim_in_use():
            import google.protobuf._shim_impl as impl

            f = sm.StateResponseWithListGet.DESCRIPTOR.fields_by_name["value"]
            assert f.is_repeated
            payload = impl.enc_varint(3 << 3 | 2) + impl.enc_varint(1) + b"z"
            m = sm.StateResponseWithListGet()
            m.ParseFromString(payload)
            assert list(m.value) == [b"z"]
        else:
            pytest.skip("real protobuf active: packed-parse internals n/a")


def test_protoshim_nested_messages_and_repeated_mutation_paths():
    """ADVICE r11 hardening, shim-only: (a) a NESTED message type must
    get a concrete class (protoc hangs it off the parent class), so
    parse and auto-vivification of a nested-typed field work — the
    r11 builder materialized only top-level messages; (b) every
    repeated-field mutation path must mark presence — ``+=``, insert
    and item assignment bypass the Python append/extend overrides at C
    level, so a field mutated through them used to vanish from
    serialization."""
    import pytest

    from inverted_index_using_the_map_reduce_paradigm_spark.streaming.engine import (
        _PROTOSHIM_DIR,
        _protoshim_in_use,
    )

    if not _protoshim_in_use():
        if _PROTOSHIM_DIR not in sys.path:
            sys.path.insert(0, _PROTOSHIM_DIR)
    try:
        import google.protobuf._shim_impl as impl
        from google.protobuf import descriptor_pool
        from google.protobuf.internal import builder
    except ImportError:
        pytest.skip("real protobuf active: shim internals n/a")
        return

    enc = impl.enc_varint

    def tag(field, wt):
        return enc(field << 3 | wt)

    def ld(field, payload):  # length-delimited
        return tag(field, 2) + enc(len(payload)) + payload

    def field_proto(name, number, ftype, type_name=None):
        b = ld(1, name) + tag(3, 0) + enc(number) + tag(4, 0) + enc(1)
        b += tag(5, 0) + enc(ftype)
        if type_name is not None:
            b += ld(6, type_name)
        return b

    # message Outer { message Inner { int64 x = 1; } Inner inner = 1;
    #                 repeated string tags = 2; }
    inner = ld(1, b"Inner") + ld(2, field_proto(b"x", 1, 3))  # TYPE_INT64
    outer = (
        ld(1, b"Outer")
        + ld(2, field_proto(b"inner", 1, 11, b".pkg.Outer.Inner"))
        + ld(2, field_proto(b"tags", 2, 9))  # TYPE_STRING
        + ld(3, inner)  # nested_type
    )
    # mark tags repeated: label field (4) = 3 — rebuild with label 3
    def field_proto_lbl(name, number, ftype, label, type_name=None):
        b = ld(1, name) + tag(3, 0) + enc(number) + tag(4, 0) + enc(label)
        b += tag(5, 0) + enc(ftype)
        if type_name is not None:
            b += ld(6, type_name)
        return b

    outer = (
        ld(1, b"Outer")
        + ld(2, field_proto_lbl(b"inner", 1, 11, 1, b".pkg.Outer.Inner"))
        + ld(2, field_proto_lbl(b"tags", 2, 9, 3))
        + ld(3, inner)
    )
    fdp = ld(1, b"nested_test.proto") + ld(2, b"pkg") + ld(4, outer)

    fd = descriptor_pool.Default().AddSerializedFile(fdp)
    mod: dict = {}
    builder.BuildMessageAndEnumDescriptors(fd, mod)
    builder.BuildTopDescriptorsAndMessages(fd, "nested_test_pb2", mod)
    Outer = mod["Outer"]
    assert hasattr(Outer, "Inner"), "nested class not materialized"
    assert Outer.Inner.DESCRIPTOR._concrete_class is Outer.Inner

    # auto-vivification + roundtrip through the nested type
    m = Outer()
    m.inner.x = 42
    back = Outer()
    back.ParseFromString(m.SerializeToString())
    assert back.inner.x == 42 and back.HasField("inner")

    # every repeated mutation path must survive serialization; the
    # container alias is how __iadd__ bypasses Message.__setattr__
    # (direct `m.tags += ...` raises on REAL protobuf too — composite
    # fields reject assignment — so the alias form is the real risk)
    m2 = Outer()
    lst = m2.tags
    lst += ["a"]              # list.__iadd__ (C-level extend)
    lst.insert(0, "z")        # C-level insert
    lst[1] = "b"              # C-level __setitem__
    b2 = Outer()
    b2.ParseFromString(m2.SerializeToString())
    assert list(b2.tags) == ["z", "b"]


def test_multibatch_tws_user_stats_equals_batch(spark, tmp_path):
    """transformWithStateInPandas (ValueState) under a forced 4-file
    split: named state must merge across real trigger boundaries; the
    final emission per user equals the batch groupBy."""
    import pytest

    from pyspark.sql import functions as F

    from inverted_index_using_the_map_reduce_paradigm_spark.data import table

    if not _engine.transform_with_state_available():
        pytest.skip("transformWithState runtime unavailable")
    qs = load_all()
    ev = table(spark, SF, "events")
    batch = as_set(
        ev.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            (F.round(F.sum("value"), 2) + F.lit(0.0)).alias("sum_value"),
        )
    )
    src = _split_fixture(spark, tmp_path, "events", "ts")
    with _force_multi_batch():
        sink = qs["stream_user_stats_tws"].fn(spark, src)
        assert _engine._LAST_FED_BATCHES >= 3
        final = as_set(_final_state(sink, ["user_id"], "n_events"))
    assert final == batch


def test_multibatch_tws_map_state_equals_batch(spark, tmp_path):
    """The MapState/ListState processor under a forced 4-file split:
    per-(user, event_type) map entries must accumulate across trigger
    boundaries (final n_events/sum_value == batch groupBy), and the
    ListState batch log must show >= 2 batches for some user — proof
    the map iterator re-emitted state written in EARLIER batches."""
    import pytest

    from pyspark.sql import functions as F

    from inverted_index_using_the_map_reduce_paradigm_spark.data import table

    if not _engine.transform_with_state_available():
        pytest.skip("transformWithState runtime unavailable")
    qs = load_all()
    ev = table(spark, SF, "events")
    batch = as_set(
        ev.groupBy("user_id", "event_type").agg(
            F.count("*").alias("n_events"),
            (F.round(F.sum("value"), 2) + F.lit(0.0)).alias("sum_value"),
        )
    )
    src = _split_fixture(spark, tmp_path, "events", "ts")
    with _force_multi_batch():
        sink = qs["stream_event_type_stats_tws"].fn(spark, src)
        assert _engine._LAST_FED_BATCHES >= 3
        final = _final_state(sink, ["user_id", "event_type"], "n_batches")
        rows = final.collect()
    assert max(r.n_batches for r in rows) >= 2
    got = {(r.user_id, r.event_type, r.n_events, r.sum_value) for r in rows}
    assert got == batch


def test_tws_event_time_timers_fire_across_batches(spark, tmp_path):
    """Event-time TIMERS through the full state-server protocol
    (register, expiry dispatch, handleExpiredTimer emission): under a
    forced 4-file ts-ordered split, timers registered in early batches
    must FIRE once the advancing watermark passes them — and a timer's
    expiry must never exceed the max event time that advanced the
    watermark past it.  A single-batch run can never fire an
    event-time timer, so this lives in the forced-split harness."""
    import pytest

    if not _engine.transform_with_state_available():
        pytest.skip("transformWithState runtime unavailable")
    src = _split_fixture(spark, tmp_path, "events", "ts")
    with _force_multi_batch():
        rows = _engine.timer_log_tws(spark, src).collect()
        assert _engine._LAST_FED_BATCHES >= 3
    expired = [r for r in rows if r.kind == "expired"]
    inputs = [r for r in rows if r.kind == "input"]
    assert inputs, "no input emissions"
    assert expired, "no event-time timer ever fired across 4 batches"
    # every expired timer belongs to a user that was seen as input,
    # and fires exactly once per registration (one per user max)
    seen = {r.user_id for r in inputs}
    per_user = {}
    for r in expired:
        assert r.user_id in seen
        per_user[r.user_id] = per_user.get(r.user_id, 0) + 1
    assert all(c == 1 for c in per_user.values()), per_user
    # expiry stamps equal the registration (the user's first-batch max
    # event time), which is below the global max event time
    global_max = max(r.ts_ms for r in inputs)
    assert all(0 < r.ts_ms <= global_max for r in expired)


def test_tws_state_ttl_config_reaches_the_state_server(spark):
    """Unit pin of the TTLConfig handshake bytes: getValueState(
    ttlDurationMs=N) must serialize a StateCallCommand whose
    ttl.durationMs survives a wire round-trip.  (TTL is ALSO live
    end-to-end since r12 — see test_tws_ttl_live_expires_between_
    batches; the r11 ">6 min hang" that kept this unit-only turned out
    to be processAllAvailable never returning under ProcessingTime
    timeMode's continuous maintenance batches, not state-server cost —
    engine._run_ttl_stream_to_memory documents the fix.)"""
    import importlib
    import sys as _sys

    try:
        import google.protobuf  # noqa: F401
    except ImportError:
        from inverted_index_using_the_map_reduce_paradigm_spark.streaming.engine import (
            _PROTOSHIM_DIR,
        )

        if _PROTOSHIM_DIR not in _sys.path:
            _sys.path.insert(0, _PROTOSHIM_DIR)
    sm = importlib.import_module(
        "pyspark.sql.streaming.proto.StateMessage_pb2"
    )
    cmd = sm.StateCallCommand()
    cmd.stateName = "stats"
    cmd.schema = "n LONG"
    cmd.ttl.durationMs = 123456789
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(getValueState=cmd)
    )
    back = sm.StateRequest()
    back.ParseFromString(req.SerializeToString())
    got = back.statefulProcessorCall.getValueState
    assert got.HasField("ttl") and got.ttl.durationMs == 123456789
    assert got.stateName == "stats"


def test_tws_ttl_live_expires_between_batches(spark):
    """State TTL LIVE on the real RocksDB state server (r12, VERDICT
    r11 #1): the registered ``stream_user_stats_tws_ttl`` feeds two
    micro-batches (event_id%2 halves) through a 1 ms-TTL ValueState in
    ProcessingTime timeMode.  Wall clock advances far past 1 ms between
    triggers, so the processor must observe ``exists() == False`` at
    EVERY batch start (all rows fresh=True) and each emission must be
    that batch's stats alone — the per-half batch recompute."""
    import pytest

    from pyspark.sql import functions as F

    from inverted_index_using_the_map_reduce_paradigm_spark.data import table

    if not _engine.transform_with_state_available():
        pytest.skip("transformWithState runtime unavailable")
    sink = load_all()["stream_user_stats_tws_ttl"].fn(spark, SF)
    assert _engine._LAST_FED_BATCHES == 2
    rows = sink.collect()
    assert rows and all(r.fresh for r in rows), [r for r in rows if not r.fresh][:5]
    ev = table(spark, SF, "events")
    per_half = as_set(
        ev.groupBy((F.col("event_id") % 2).alias("h"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.round(F.sum("value"), 2) + F.lit(0.0)).alias("sum_value"),
        )
        .select("user_id", "n_events", "sum_value")
    )
    assert {(r.user_id, r.n_events, r.sum_value) for r in rows} == per_half


def test_tws_ttl_map_and_list_state_expire_between_batches(spark):
    """MapState + ListState TTL live (r12): over the two event_id%2
    micro-batches with 1 ms TTLs, every map entry and the batch log
    expire between triggers — each emission is its batch's
    per-(user, event_type) stats and n_batches reads 1 everywhere
    (a surviving list entry would read 2 on the second batch)."""
    import pytest

    from pyspark.sql import functions as F

    from inverted_index_using_the_map_reduce_paradigm_spark.data import table

    if not _engine.transform_with_state_available():
        pytest.skip("transformWithState runtime unavailable")
    sink = load_all()["stream_event_type_stats_tws_ttl"].fn(spark, SF)
    assert _engine._LAST_FED_BATCHES == 2
    rows = sink.collect()
    assert rows and all(r.n_batches == 1 for r in rows)
    ev = table(spark, SF, "events")
    per_half = as_set(
        ev.groupBy((F.col("event_id") % 2).alias("h"), "user_id", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.round(F.sum("value"), 2) + F.lit(0.0)).alias("sum_value"),
        )
        .select("user_id", "event_type", "n_events", "sum_value")
    )
    assert {
        (r.user_id, r.event_type, r.n_events, r.sum_value) for r in rows
    } == per_half


def test_tws_ttl_large_ttl_accumulates(spark):
    """The eviction in the live-TTL test is the TTL's doing, not
    ProcessingTime mode wiping state wholesale: the SAME two-batch
    pipeline with a 1-hour TTL must carry state across the trigger
    boundary — users present in both halves re-read their first-half
    state (fresh=False on their second batch) and the final per-user
    stats equal the whole-fixture batch aggregate."""
    import pytest

    from pyspark.sql import functions as F

    from inverted_index_using_the_map_reduce_paradigm_spark.data import table

    if not _engine.transform_with_state_available():
        pytest.skip("transformWithState runtime unavailable")
    sink = _engine.user_stats_tws_ttl(spark, SF, ttl_ms=3_600_000)
    assert _engine._LAST_FED_BATCHES == 2
    rows = sink.collect()
    assert any(not r.fresh for r in rows), "no key ever re-read live state"
    ev = table(spark, SF, "events")
    batch = as_set(
        ev.groupBy("user_id").agg(
            F.count("*").alias("n_events"),
            (F.round(F.sum("value"), 2) + F.lit(0.0)).alias("sum_value"),
        )
    )
    final = as_set(
        _final_state(sink, ["user_id"], "n_events").select(
            "user_id", "n_events", "sum_value"
        )
    )
    assert final == batch


def test_tws_crash_recovery_equals_uninterrupted_run(spark):
    """The exactly-once proof: crash the TWS query mid-batch-2 (after
    batches 0 and 1 committed, with a TORN partial batch-2 write),
    restart from the same RocksDB checkpoint, and the union of sink
    output must equal an uninterrupted run byte-for-byte — recovered
    state (not restarted-from-zero), replayed-not-reprocessed batches,
    and overwritten-not-appended torn output."""
    from inverted_index_using_the_map_reduce_paradigm_spark.streaming.engine import (
        _run_user_stats_recovery,
        transform_with_state_available,
    )

    if not transform_with_state_available():
        import pytest

        pytest.skip("transformWithStateInPandas runtime unavailable")

    recovered = {
        tuple(r) for r in _run_user_stats_recovery(spark, SF, True).collect()
    }
    from inverted_index_using_the_map_reduce_paradigm_spark.streaming import (
        engine as _e,
    )

    evidence = dict(_e._LAST_RECOVERY)
    assert evidence["run1_crashed"] is True
    assert evidence["run1_commits"] == ["0", "1"]
    assert evidence["run2_commits"] == ["0", "1", "2"]

    clean = {
        tuple(r) for r in _run_user_stats_recovery(spark, SF, False).collect()
    }
    assert recovered == clean
    # three batches' emissions present, running totals strictly grow
    batches = {r[3] for r in recovered}
    assert batches == {0, 1, 2}


def test_gate_nested_type_probe(spark):
    """The transformWithState gate must include the nested-message
    capability probe when the shim is active: a shim that cannot
    materialize message-inside-message types would crash the state
    server the day pyspark's proto adds one, so the gate fails closed
    instead.  Cached-result path exercised by calling twice."""
    from inverted_index_using_the_map_reduce_paradigm_spark.streaming.engine import (
        _nested_type_probe_ok,
        _protoshim_in_use,
        transform_with_state_available,
    )

    if not _protoshim_in_use():
        import pytest

        pytest.skip("real protobuf active: shim nested probe n/a")
    assert _nested_type_probe_ok() is True
    assert _nested_type_probe_ok() is True  # cached, no duplicate-file error
    assert transform_with_state_available() is True


def test_stream_tlog_upsert_exactly_once_across_forced_batches(spark, tmp_path):
    """The tlog streaming sink's exactly-once contract under a REAL
    multi-batch split: 4 files fed one per trigger, every micro-batch
    deliberately delivered twice inside the sink (append_txn replay
    must no-op), final store census equal to the plain batch census.
    A double-write would double sum_doc_id and fail the equality; a
    dropped batch would lower n_docs."""
    qs = load_all()
    batch = as_set(qs["stream_tlog_upsert"].fn(spark, SF))
    src = _split_fixture(spark, tmp_path, "documents", "doc_id")
    with _force_multi_batch():
        multi = as_set(qs["stream_tlog_upsert"].fn(spark, src))
        assert _engine._LAST_FED_BATCHES >= 3
    assert multi == batch
