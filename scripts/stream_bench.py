"""Streaming throughput bench (r9, VERDICT item 4).

The 10 streaming queries are correctness-pinned (single-batch oracle +
forced multi-batch state-merge tests) but invisible to bench.py
(``bench=False``): the one axis the batch bench cannot see is
state-store cost across trigger boundaries.  This script measures it:
each stateful query runs over sf0.1 fact tables force-split into N
files fed ONE PER TRIGGER (the tests' monkeypatch pattern, applied
here to a persistent /tmp copy), and the per-micro-batch progress the
engine captures in ``_LAST_PROGRESS`` is reduced to

* rows/sec over the whole drive (input rows / wall seconds),
* per-batch trigger latency (median + max ``triggerExecution`` ms),
* final state-store size (rows + memory from ``stateOperators``).

Usage: python scripts/stream_bench.py [--splits 8] [query ...]
Prints one markdown table + one JSON line (same contract as
scale_sweep.py).  Results land in SCALE.md's streaming section.

Methodology note: this is a single-JVM drive of a file stream, so
"latency" is batch processing time (availability-triggered), not
end-to-end event latency; rows/s is comparable across rounds on a
quiet host only — record load1 with any committed number.
"""

from __future__ import annotations

import argparse
import glob as _glob
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BASE = "/tmp/stream_bench"

# the stateful set: session-window state, applyInPandasWithState,
# complete-mode sketch state, stream-stream join buffers, update-mode
# posting-list state, dropDuplicates key state, windowed agg state
DEFAULT_QUERIES = [
    "stream_sessionize",
    "stream_user_stats",
    "stream_cms_sketch",
    "stream_purchase_attribution",
    "stream_inverted_index",
    "stream_exact_dedup",
    "stream_events_window",
]


def build_split_dir(spark, n: int) -> str:
    """/tmp/stream_bench/split{n}: events + documents from SRC split
    into n single-file parquets in ts/doc_id order with ascending
    mtimes, so maxFilesPerTrigger=1 feeds them oldest-first one per
    trigger (same layout as tests/test_streaming._split_fixture);
    dims copied as-is for the enrich join."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    d = os.path.join(BASE, f"split{n}")
    stamp = os.path.join(d, ".complete")
    if os.path.exists(stamp):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    for t in ("region", "nation", "customer"):
        shutil.copy(os.path.join(SRC, f"{t}.parquet"), d)
    for tbl, order_col in (("events", "ts"), ("documents", "doc_id")):
        df = spark.read.parquet(f"{SRC}/{tbl}.parquet")
        per = df.count() // n + 1
        idx = df.withColumn(
            "_i",
            ((F.row_number().over(Window.orderBy(order_col)) - 1) / per).cast(
                "int"
            ),
        )
        for i in range(n):
            stage = os.path.join(d, f"_stage_{tbl}_{i}")
            (
                idx.filter(F.col("_i") == i)
                .drop("_i")
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(stage)
            )
            part = _glob.glob(f"{stage}/part-*.parquet")[0]
            dest = os.path.join(
                d, f"{tbl}.parquet" if i == 0 else f"{tbl}{i}.parquet"
            )
            shutil.copy(part, dest)
            os.utime(dest, (1_700_000_000 + i, 1_700_000_000 + i))
            shutil.rmtree(stage)
    open(stamp, "w").close()
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--splits", type=int, default=8)
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    names = args.queries or DEFAULT_QUERIES

    from inverted_index_using_the_map_reduce_paradigm_spark.registry import (
        load_all,
    )
    from inverted_index_using_the_map_reduce_paradigm_spark.session import (
        get_spark,
    )
    from inverted_index_using_the_map_reduce_paradigm_spark.streaming import (
        engine,
    )

    qs = load_all()
    unknown = set(names) - set(qs)
    if unknown:
        print(f"unknown queries: {sorted(unknown)}", file=sys.stderr)
        return 2
    spark = get_spark("stream_bench")
    d = build_split_dir(spark, args.splits)

    # the tests' multi-batch posture: one file per trigger, wide globs
    # so the split files are visible, and the single-batch oracle
    # guard off (this is a throughput drive, not an oracle check)
    engine._SINGLE_BATCH_FILES = 1
    engine._EXPECT_MULTI_BATCH = True
    engine._EVENTS_GLOB = "events*.parquet"
    engine._DOCS_GLOB = "documents*.parquet"

    load1 = round(os.getloadavg()[0], 2)
    results: dict[str, dict] = {}
    for name in names:
        # _LAST_PROGRESS is only written by queries routed through
        # _run_to_memory; reset it per query so a foreachBatch-based
        # query (e.g. stream_upsert_store) can't silently inherit the
        # PREVIOUS query's batch/row/state metrics (r9 ADVICE).
        engine._LAST_PROGRESS = []
        t0 = time.perf_counter()
        sink = qs[name].fn(spark, d)
        out_rows = sink.count()
        wall = time.perf_counter() - t0
        prog = engine._LAST_PROGRESS
        if not prog:
            print(
                f"{name}: no streaming progress captured (not a "
                "_run_to_memory query) — wall/out_rows only",
                file=sys.stderr,
            )
            results[name] = {
                "wall_sec": round(wall, 2),
                "out_rows": out_rows,
                "progress": None,
            }
            continue
        rows_in = sum(p["numInputRows"] for p in prog)
        trig_ms = [
            p["durationMs"]["triggerExecution"]
            for p in prog
            if "triggerExecution" in p.get("durationMs", {})
        ]
        state = (prog[-1].get("stateOperators") or []) if prog else []
        results[name] = {
            "wall_sec": round(wall, 2),
            "batches": len(prog),
            "rows_in": rows_in,
            "rows_per_sec": round(rows_in / wall) if wall else None,
            "out_rows": out_rows,
            "trigger_ms_median": (
                round(statistics.median(trig_ms)) if trig_ms else None
            ),
            "trigger_ms_max": max(trig_ms) if trig_ms else None,
            "state_rows": sum(s.get("numRowsTotal", 0) for s in state),
            "state_mem_mb": round(
                sum(s.get("memoryUsedBytes", 0) for s in state) / 2**20, 1
            ),
        }
        r = results[name]
        print(
            f"{name}: {r['wall_sec']}s, {r['batches']} batches,"
            f" {r['rows_in']} rows in -> {r['rows_per_sec']}/s,"
            f" trigger p50/max {r['trigger_ms_median']}/{r['trigger_ms_max']}"
            f" ms, state {r['state_rows']} rows / {r['state_mem_mb']} MB"
            f" (load1 {os.getloadavg()[0]:.1f})",
            file=sys.stderr,
            flush=True,
        )

    print("\n| query | wall s | batches | rows/s | trigger p50/max ms |"
          " state rows | state MB |")
    print("|---|---|---|---|---|---|---|")
    for name, r in results.items():
        print(
            f"| `{name}` | {r['wall_sec']} | {r['batches']} |"
            f" {r['rows_per_sec']} | {r['trigger_ms_median']}/"
            f"{r['trigger_ms_max']} | {r['state_rows']} |"
            f" {r['state_mem_mb']} |"
        )
    print(
        json.dumps(
            {"sf_dir": SRC, "splits": args.splits, "load1_start": load1,
             "results": results},
            separators=(",", ":"),
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
