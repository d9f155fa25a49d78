"""Interleaved A/B of spark.sql.adaptive.coalescePartitions.initialPartitionNum.

VERDICT r13 item 1: the driver's 32-core run blew up ngram_jaccard_dedup
(14.2 s) and market_basket (13.7 s) — 14.6x/5.0x over that run's own
global slow factor — while the r13 in-session A/B claimed the derived
bound (32 at bench scale) beat the old 4x-cores constant (128) on both.
This host has minutes-long JVM slow phases, so the ONLY admissible
evidence is an interleaved A/B inside one session: alternate the conf
per run (it is a runtime SQL conf, re-read at each action's physical
planning), never two separately-launched runs.

Usage: python scripts/ab_initial_partitions.py [query ...]
Env:   AB_VALUES=32,128  AB_RUNS=7  SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from inverted_index_using_the_map_reduce_paradigm_spark.registry import load_all
from inverted_index_using_the_map_reduce_paradigm_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CONF = "spark.sql.adaptive.coalescePartitions.initialPartitionNum"

DEFAULT_QUERIES = [
    "ngram_jaccard_dedup",
    "market_basket",
    "tokenize",
    "doc_entropy",
    "epoch_shuffle",
    "tfidf_doc_similarity",
]


def run_once(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> None:
    names = sys.argv[1:] or DEFAULT_QUERIES
    values = [v.strip() for v in os.environ.get("AB_VALUES", "32,128").split(",")]
    runs = int(os.environ.get("AB_RUNS", "7"))
    spark = get_spark("repo_spark_ab_initial_partitions")
    qs = load_all()
    results: dict[str, dict[str, list[float]]] = {}
    for name in names:
        q = qs[name]
        spark.sparkContext.setJobDescription(f"ab:{name}")
        df = q.fn(spark, SF_DIR)
        # one warm-up under each arm (JIT + file listing, not timed)
        for v in values:
            spark.conf.set(CONF, v)
            run_once(df)
        per: dict[str, list[float]] = {v: [] for v in values}
        for i in range(runs):
            # alternate arm order each round so a slow phase that spans
            # one round does not land on the same arm every time
            order = values if i % 2 == 0 else list(reversed(values))
            for v in order:
                spark.conf.set(CONF, v)
                per[v].append(round(run_once(df), 4))
        results[name] = per
        med = {v: round(statistics.median(per[v]), 3) for v in values}
        print(f"{name}: medians {med} runs {per}", file=sys.stderr, flush=True)
    summary = {
        name: {
            v: round(statistics.median(per[v]), 4) for v in per
        }
        for name, per in results.items()
    }
    print(json.dumps({"conf": CONF, "sf_dir": SF_DIR, "runs": runs,
                      "medians": summary, "raw": results}, indent=1))


if __name__ == "__main__":
    main()
