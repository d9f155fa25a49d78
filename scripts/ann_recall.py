"""Measure ANN recall vs the exact top-k for the approximate variants.

Recall = |ann ∩ exact| / (N_QUERIES * TOP_K) over the same dir, where
exact is the oracle-checked brute-force ``similarity_search``.  This is
the number the census floors (census.py IVF_RECALL_FLOOR) are derived
from: floors are set measured-minus-margin, so re-run this after any
quantizer change.

Usage: python scripts/ann_recall.py [DIR ...] [--variants ivf ivfpq ...]
                                    [--assert-floors]
Default dirs: sf0.001, sf0.01; add /tmp/scale_sweep/x{16,64} for ladders.

``--assert-floors`` turns the sweep into a gate (exit 1 on violation):
fixture-scale dirs must clear the census floor (0.5), and any
/tmp/scale_sweep/x{m} dir with m >= 16 must clear the SCALE floor
below — so the r8 adaptive-quantizer gains (IVF/IVF-PQ 0.72-0.88 at
x16..x256) cannot silently erode in a later round.  Floors are
measured-minus-margin from the SCALE.md §13 table.
"""

from __future__ import annotations

import argparse
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = ["rp", "ivf", "ivfpq", "ivfpq_stored"]

FIXTURE_FLOOR = 0.5  # == census.IVF_RECALL_FLOOR at sf0.001/sf0.01
# at >= x16 the sqrt(n) coarse quantizer must keep recall rising with
# corpus size: r8 measured IVF 0.76/0.76, IVF-PQ 0.72/0.72 at x16/x64
# and IVF-PQ 0.88 at x256 — floor set with ~0.07 margin.
SCALE_FLOOR = 0.65
SCALE_FLOOR_VARIANTS = {"ivf", "ivfpq", "ivfpq_stored"}


# Perturbed rungs (x{m}p, r10): rotation-only copies saturate recall
# at 1.0 past x256 (16 exact duplicates per vector at x1024 fill the
# whole top-10).  The perturbed build (copies nudged to cos ~0.86 from
# base) ALSO reads 1.000 at x1024p — copy-based scaling makes the task
# EASIER with size at any perturbation strength, because the true
# top-10 become near-copies far above the cos~0.1 background while
# nprobe grows with nlist.  So the discriminating band for quantizer
# quality remains sf0.001..x256 (neighbors in the cos 0.3-0.6 band);
# the x1024/x1024p rungs gate only against catastrophic regressions.
PERTURBED_FLOOR = 0.8

# Planted-neighbor rungs (scripts/planted_ann.py, r11): the rung that
# made recall at 1-2 M vectors FALSIFIABLE again after the copy-based
# ladder saturated (SCALE.md §15).  No duplicates anywhere; the exact
# top-k per query is a mix of planted neighbors (cos 0.35-0.60) and
# the Gaussian background order-statistic tail (~0.6 at n=2M), so the
# quantizer's probe breadth is what recall measures.  Measured r11 at
# p2000000: rp 0.780, ivf/ivfpq/ivfpq_stored 0.940; r12 flip-1
# multiprobe lifted rp to 0.960 (1.000 at p100000), so the floor now
# gates the RP family too — floor stays measured-minus-margin.
PLANTED_FLOOR = 0.8
PLANTED_FLOOR_VARIANTS = SCALE_FLOOR_VARIANTS | {"rp"}


def floor_for(d: str, variant: str) -> float | None:
    m = re.search(r"x(\d+)(p?)$", d.rstrip("/"))
    if m and int(m.group(1)) >= 16:
        if variant not in SCALE_FLOOR_VARIANTS:
            return None
        return PERTURBED_FLOOR if m.group(2) else SCALE_FLOOR
    m = re.search(r"planted_ann/p(\d+)$", d.rstrip("/"))
    if m and int(m.group(1)) >= 1_000_000:
        return PLANTED_FLOOR if variant in PLANTED_FLOOR_VARIANTS else None
    if "testdata/sf" in d:
        return FIXTURE_FLOOR if variant in SCALE_FLOOR_VARIANTS else None
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "dirs", nargs="*", default=["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    )
    ap.add_argument("--variants", nargs="+", default=["ivf", "ivfpq"])
    ap.add_argument("--assert-floors", action="store_true")
    args = ap.parse_args()
    violations: list[str] = []

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
            floor = floor_for(d, v) if args.assert_floors else None
            verdict = ""
            if floor is not None:
                if recall < floor:
                    violations.append(f"{d} {v}: {recall:.3f} < floor {floor}")
                    verdict = f"  FLOOR VIOLATION (< {floor})"
                else:
                    verdict = f"  ok (floor {floor})"
            print(
                f"{d} {v}: recall={recall:.3f} n_ann={len(ann)}"
                f" ({time.perf_counter() - t0:.1f}s, load1 {os.getloadavg()[0]:.1f})"
                + verdict,
                flush=True,
            )
    if violations:
        print("RECALL FLOOR VIOLATIONS:\n  " + "\n  ".join(violations))
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
