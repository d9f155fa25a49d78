"""SparkSession factory tuned for the engine.

Local mode for tests/bench; every setting is also the right default on a
real cluster (AQE, skew handling, partition coalescing, Arrow).  The
shuffle-partition count is sized to cores locally; on a 1000-executor
cluster AQE's coalescing makes the static number mostly irrelevant as
long as it is an upper bound, so we keep it configurable via
``SPARK_GRAFT_CPUS``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(app_name: str = "repo_spark", *, shuffle_partitions: int | None = None) -> SparkSession:
    cpus = cpu_count()
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        # ---- planner / runtime re-optimization --------------------------
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # ---- shuffle sizing --------------------------------------------
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Start shuffles at 4x the static count and let AQE's
        # coalescing shrink small ones back to ~cores: at benchmark
        # scale the final partition counts (and timings) are unchanged,
        # but when the data outgrows the JVM the core-sized static
        # count is the cliff — per-partition join state grows linearly
        # with the corpus until tasks hit allocation retries (measured:
        # ngram_jaccard_dedup at 256x bench scale, 70.5 s at 32
        # partitions vs 44.4 s at 128 — linear marginal restored; see
        # SCALE.md x256 notes).  On a real cluster this is exactly the
        # recommended AQE posture: high initial bound, runtime decides.
        .config(
            "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
            str(4 * shuffle_partitions),
        )
        # ---- python <-> jvm data path ----------------------------------
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # InferFiltersFromGenerate synthesizes a ``size(arr) > 0`` filter
        # under every non-outer explode and pushes it below exchanges.
        # When the array comes from a Python UDF that inferred filter
        # carries a DUPLICATE evaluation of the UDF below the exchange
        # (a UDF's resultId defeats common-subexpression elimination), so
        # the shingle kernel ran TWICE over the corpus in the dedup
        # family's final plans.  The rule is optimization-only (empty
        # arrays explode to zero rows regardless); excluding it costs
        # nothing measurable on the expression-side explodes and removes
        # a full corpus-sized Arrow pass from the UDF-side ones.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # ---- determinism for oracle comparison -------------------------
        .config("spark.sql.session.timeZone", "UTC")
        # ---- local-mode memory (driver == the one JVM) -----------------
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
