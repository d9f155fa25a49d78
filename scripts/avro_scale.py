"""Scale validation for the Avro byte-range splits (sources/avro_source.py).

Builds a multi-GiB single Object Container File (the exact shape the
r12 range-split work exists for: ONE huge container that must fan out
across executor cores like parquet), then:

  1. reads it with the default 32 MiB splits and asserts the partition
     count ~= payload_size / split_mib;
  2. reads it again as ONE split (split_mib > file size) — the
     pre-r12, whole-file-per-partition plan;
  3. asserts both reads agree on (row count, sum(i), bit_xor over
     xxhash64(i, payload)) — a value-sensitive aggregate equality that
     a lost, duplicated, or mis-resynced block cannot pass (xor flags
     any single-row difference; count/sum catch double-reads);
  4. prints the wall-clock ratio for SCALE.md.

Usage: python scripts/avro_scale.py [size_gib]   (default 4)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ROW_BYTES = 1 << 20  # 1 MiB payload per row -> 4 rows per 4 MiB block


def build_container(path: str, n_rows: int) -> None:
    from inverted_index_using_the_map_reduce_paradigm_spark.sources.avro_source import (
        write_container,
    )

    sch = json.dumps(
        {
            "type": "record",
            "name": "r",
            "fields": [
                {"name": "i", "type": "long"},
                {"name": "payload", "type": "bytes"},
            ],
        }
    )

    def rows():
        for i in range(n_rows):
            # per-row-distinct bytes: a misattributed block changes the
            # xxhash aggregate below
            yield (i, bytes([i % 256, (i >> 8) % 256]) * (ROW_BYTES // 2))

    t0 = time.time()
    write_container(path, sch, rows(), codec="null")
    print(
        f"built {os.path.getsize(path) / (1 << 30):.2f} GiB container "
        f"({n_rows} rows) in {time.time() - t0:.1f}s"
    )


def main() -> None:
    size_gib = float(sys.argv[1]) if len(sys.argv) > 1 else 4.0
    n_rows = int(size_gib * (1 << 30) / ROW_BYTES)
    d = "/tmp/avro_scale"
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "giant.avro")
    if not (
        os.path.exists(path)
        and abs(os.path.getsize(path) - n_rows * ROW_BYTES) < (64 << 20)
    ):
        build_container(path, n_rows)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from inverted_index_using_the_map_reduce_paradigm_spark.sources.avro_source import (
        AvroDataSource,
    )

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "16g")
        # 1 MiB binary rows: an unbounded arrow batch (default 10k
        # rows) would exceed pyarrow's 2 GiB single-array limit on the
        # whole-file read — bound batches to ~128 MiB
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "128")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(AvroDataSource)

    def scan(split_mib: float) -> tuple[int, int, int, int, float]:
        df = (
            spark.read.format("avro_py")
            .option("path", d)
            .option("split_mib", str(split_mib))
            .load()
        )
        n_parts = df.rdd.getNumPartitions()
        t0 = time.time()
        row = df.agg(
            F.count("*").alias("n"),
            F.sum("i").alias("si"),
            F.bit_xor(F.xxhash64("i", "payload")).alias("sh"),
        ).collect()[0]
        return n_parts, row.n, row.si, row.sh, time.time() - t0

    size = os.path.getsize(path)
    p_split, n1, si1, sh1, t_split = scan(32)
    p_whole, n2, si2, sh2, t_whole = scan(size / (1 << 20) + 64)

    expect_parts = size // (32 << 20) + 1
    print(
        f"splits: {p_split} partitions (expected ~{expect_parts}), "
        f"whole: {p_whole} partitions"
    )
    assert p_whole == 1, p_whole
    assert abs(p_split - expect_parts) <= 2, (p_split, expect_parts)
    assert (n1, si1, sh1) == (n2, si2, sh2), ((n1, si1, sh1), (n2, si2, sh2))
    assert n1 == n_rows, (n1, n_rows)
    print(
        f"agg identical: n={n1} sum_i={si1} sum_hash={sh1}\n"
        f"scan time: split={t_split:.1f}s whole={t_whole:.1f}s "
        f"ratio={t_whole / t_split:.2f}x"
    )


if __name__ == "__main__":
    main()
