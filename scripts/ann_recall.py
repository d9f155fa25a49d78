"""Measure ANN recall vs the exact top-k for the approximate variants.

Recall = |ann ∩ exact| / (N_QUERIES * TOP_K) over the same dir, where
exact is the oracle-checked brute-force ``similarity_search``.  This is
the number the census floors (census.py IVF_RECALL_FLOOR) are derived
from: floors are set measured-minus-margin, so re-run this after any
quantizer change.

Usage: python scripts/ann_recall.py [DIR ...] [--variants ivf ivfpq ...]
Default dirs: sf0.001, sf0.01; add /tmp/scale_sweep/x{16,64} for ladders.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = ["rp", "ivf", "ivfpq", "ivfpq_stored"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "dirs", nargs="*", default=["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    )
    ap.add_argument("--variants", nargs="+", default=["ivf", "ivfpq"])
    args = ap.parse_args()

    from inverted_index_using_the_map_reduce_paradigm_spark.operators.similarity import (
        N_QUERIES,
        TOP_K,
    )
    from inverted_index_using_the_map_reduce_paradigm_spark.registry import load_all
    from inverted_index_using_the_map_reduce_paradigm_spark.session import get_spark

    qs = load_all()
    spark = get_spark("ann_recall")
    for d in args.dirs:
        exact = {
            (r.query_id, r.neighbor_id)
            for r in qs["similarity_search"].fn(spark, d).collect()
        }
        for v in args.variants:
            t0 = time.perf_counter()
            ann = {
                (r.query_id, r.neighbor_id)
                for r in qs[f"similarity_search_{v}"].fn(spark, d).collect()
            }
            recall = len(ann & exact) / (N_QUERIES * TOP_K)
            print(
                f"{d} {v}: recall={recall:.3f} n_ann={len(ann)}"
                f" ({time.perf_counter() - t0:.1f}s, load1 {os.getloadavg()[0]:.1f})",
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
