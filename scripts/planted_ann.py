"""Planted-neighbor ANN corpus: a falsifiable recall rung at 1-2 M vectors.

Why this exists (SCALE.md §15, r10 finding): the copy-based scale
ladder stops discriminating past x256 — rotation copies give every
base vector >= 16 exact duplicates at x1024, and even perturbed copies
saturate recall at 1.000, because copy-scaling plants the true top-k
at cos ~0.9-1.0 (far above the cos ~0.1 Gaussian background) while the
probe budget grows with nlist.  The quantizer cannot FAIL on that
task, so the rung gates nothing.

This builder makes the task hard again at millions of vectors, by
construction, with no duplicates anywhere:

* background: n i.i.d. unit Gaussian vectors in d=64.  Pairwise
  cosines concentrate around 0 with std 1/8; the max over n samples
  reaches ~0.60-0.67 at n = 1-2 M — a genuinely ambiguous tail.
* queries: vec_id < N_QUERIES (the registered query-set convention).
* planted neighbors: for each query q, N_PLANT vectors at cosine
  uniform in [COS_LO, COS_HI] from q (exact construction: c*q +
  sqrt(1-c^2)*r_hat with r_hat a random orthogonal unit), scattered
  across the id range so they land in arbitrary IVF cells.

With COS in [0.35, 0.60] the exact top-k per query is a MIX of
planted neighbors and the background order-statistic tail — nothing
sits in the query's own cell by construction and nothing is a
duplicate, so IVF/IVF-PQ recall measures probe breadth + quantization
again, exactly like the discriminating sf0.001..x256 band.

Usage:
  python scripts/planted_ann.py [--n 2000000] [--out /tmp/planted_ann]
  python scripts/ann_recall.py /tmp/planted_ann/p2000000 --variants \
      rp ivf ivfpq ivfpq_stored --assert-floors
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 64
N_PLANT = 20  # planted neighbors per query, > TOP_K
COS_LO, COS_HI = 0.35, 0.60
CHUNK = 250_000
SEED = 11


def _unit(v: np.ndarray) -> np.ndarray:
    return v / np.linalg.norm(v, axis=-1, keepdims=True)


def build_planted_dir(n: int, base: str = "/tmp/planted_ann") -> str:
    """Write ``{base}/p{n}/embeddings.parquet``; reused if complete."""
    d = os.path.join(base, f"p{n}")
    stamp = os.path.join(d, ".complete")
    if os.path.exists(stamp):
        return d
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(SEED)

    from inverted_index_using_the_map_reduce_paradigm_spark.operators.similarity import (
        N_QUERIES,
    )

    queries = _unit(rng.standard_normal((N_QUERIES, DIM))).astype(np.float64)

    # planted ids: scattered deterministically across (N_QUERIES, n)
    plant_ids: dict[int, tuple[int, float]] = {}
    step = (n - N_QUERIES) // (N_QUERIES * N_PLANT + 1)
    k = 0
    for qi in range(N_QUERIES):
        for j in range(N_PLANT):
            vid = N_QUERIES + (k + 1) * step + qi  # unique, spread out
            c = float(rng.uniform(COS_LO, COS_HI))
            plant_ids[vid] = (qi, c)
            k += 1
    assert len(plant_ids) == N_QUERIES * N_PLANT and max(plant_ids) < n

    schema = pa.schema(
        [
            ("vec_id", pa.int64()),
            ("embedding", pa.list_(pa.float32())),
            ("label", pa.int32()),
        ]
    )
    tmp = os.path.join(d, "embeddings.parquet.tmp")
    with pq.ParquetWriter(tmp, schema) as w:
        for lo in range(0, n, CHUNK):
            hi = min(lo + CHUNK, n)
            block = _unit(rng.standard_normal((hi - lo, DIM)))
            ids = np.arange(lo, hi, dtype=np.int64)
            if lo == 0:
                block[:N_QUERIES] = queries
            for vid, (qi, c) in plant_ids.items():
                if lo <= vid < hi:
                    q = queries[qi]
                    r = rng.standard_normal(DIM)
                    r -= (r @ q) * q  # orthogonalize
                    r /= np.linalg.norm(r)
                    block[vid - lo] = c * q + np.sqrt(1.0 - c * c) * r
            arr = pa.FixedSizeListArray.from_arrays(
                pa.array(
                    block.astype(np.float32).ravel(), type=pa.float32()
                ),
                DIM,
            ).cast(pa.list_(pa.float32()))
            w.write_table(
                pa.table(
                    {
                        "vec_id": ids,
                        "embedding": arr,
                        "label": (ids % 100).astype(np.int32),
                    },
                    schema=schema,
                )
            )
    os.replace(tmp, os.path.join(d, "embeddings.parquet"))
    with open(stamp, "w") as f:
        f.write("ok\n")
    return d


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2_000_000)
    ap.add_argument("--out", default="/tmp/planted_ann")
    args = ap.parse_args()
    d = build_planted_dir(args.n, args.out)
    print(d)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
