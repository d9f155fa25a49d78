"""Scaling-curve sweep: measure how headline queries scale with data.

Correctness gates prove the operators right at sf0.01; the race proves
ingest parity at 16 GiB; this script answers the remaining scale
question with MEASUREMENT instead of argument: if the corpus grows m
times, does each operator's runtime grow ~m times (partition strategy
holds) or worse (a hidden quadratic / broadcast / driver bottleneck)?

It builds enlarged copies of the three fact tables under
``/tmp/scale_sweep/x{m}/`` (dims are copied as-is):

* ``documents``: m tagged copies — copy i>0 prefixes EVERY word with a
  copy tag (``q`` + base-26 letters, letters only so the reference
  normalizer keeps it), so vocabularies are DISJOINT across copies and
  near-dup/dedup outputs scale linearly BY CONSTRUCTION (cross-copy
  shingle/minhash/simhash collisions are impossible, modulo the rare
  original word that already starts with the tag).  Without the tag a
  duplicated corpus would make every dedup output quadratic in m and
  the sweep would measure the data, not the engine.
* ``embeddings``: copy i rolls each vector left by i positions —
  a permutation, so WITHIN-copy pairwise cosines (and hence per-copy
  ANN/near-dup structure) are preserved exactly while CROSS-copy
  cosines decorrelate; vec_id offset by 10M per copy.  ``label`` is
  offset by 100 per copy: more data means more clusters of the same
  size (the SemDeDup posture — k grows with n), so cluster-bucketed
  operators are measured in their production growth direction; no
  other swept embedding query reads ``label``.
* ``events``: copy i offsets user_id/event_id by 10M — m times the
  users, same per-user density, the natural growth direction.

Timing mirrors bench.py: plan built once, noop-sink execution, median
of 3 runs after a warm-up (1 run when warm < 0.3 s).  Output: one
markdown table + one JSON line; per-query marginal slope ratio
``(t[m2]-t[m1])/(t[m1]-t[m0]) / ((m2-m1)/(m1-m0))`` ~ 1.0 means the
marginal cost per row is flat, i.e. linear scaling past the fixed
per-job overhead that dominates the x1 point.

Usage: python scripts/scale_sweep.py [--mults 1 4 16] [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
BASE = "/tmp/scale_sweep"
OFFSET = 10_000_000

# scale-path headline queries over the three enlarged fact tables;
# deliberately excludes semantically quadratic ops (embedding_near_dup
# is all-pairs BY CONTRACT, and knn_classify's query side is a modulo
# slice of the corpus so its brute-force form is q*n BY CONSTRUCTION —
# measured 0.58/3.39/91.4 s at x1/x4/x16, the declared contract; the
# RP/IVF-bucketed queries ARE in) and bench=False census queries.
DEFAULT_QUERIES = [
    # documents family
    "exact_dedup",
    "substring_dedup",
    "ngram_jaccard_dedup",
    "jaccard_prefix_dedup",
    "containment_dedup",
    "token_budget_select",
    "epoch_shuffle",
    "minhash_lsh_dedup",
    "simhash_dedup",
    "inverted_index_arrow",
    "tf_idf",
    "contamination_check",
    "sequence_packing",
    "corpus_pipeline",
    "word_count_salted",
    "doc_commonness_salted",
    "multimodal_phash_dedup",
    "multimodal_audiohash_dedup",
    "multimodal_video_dedup",
    "incremental_phash_dedup",
    # embeddings family
    "similarity_search",
    "similarity_search_rp",
    "similarity_search_ivf",
    "similarity_search_ivfpq",
    "kmeans_clusters",
    "embedding_near_dup_rp",
    "semantic_dedup",
    "embedding_pca",
    # events family
    "events_sessionize",
    "hll_union_rollup",
    "range_join_bucketed",
]


def _tag(i: int) -> str:
    return "q" + chr(97 + i // 26) + chr(97 + i % 26)


def build_scale_dir(m: int, perturb: float = 0.0) -> str:
    """/tmp/scale_sweep/x{m} with enlarged fact tables, reused if built.

    ``perturb`` > 0 builds an ``x{m}p`` variant whose embedding copies
    additionally get a deterministic per-(copy, dim) nudge of up to
    +/-6*perturb per component.  Rationale (r10): pure rotation makes
    copy i and copy i+64 IDENTICAL, so at m > 64*TOP_K/10ish the exact
    top-10 of every query is all cos=1.0 duplicates sitting in the
    query's own IVF cell and recall saturates at 1.0 (measured at
    x1024) — the rung stops discriminating.  Perturbed copies sit at
    cos ~0.9 from their base, spread across cell boundaries, so the
    quantizer's probe breadth is what recall measures again."""
    import duckdb

    d = os.path.join(BASE, f"x{m}p" if perturb else f"x{m}")
    stamp = os.path.join(d, ".complete")
    if os.path.exists(stamp):
        return d
    shutil.rmtree(d, ignore_errors=True)
    os.makedirs(d)
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        shutil.copy(os.path.join(SRC, f"{t}.parquet"), d)
    con = duckdb.connect()
    # 1024-copy builds exceed DuckDB's default parser depth (1000)
    con.sql("SET max_expression_depth TO 16384")
    doc_parts, emb_parts, ev_parts = [], [], []
    for i in range(m):
        if i == 0:
            doc_parts.append(f"SELECT * FROM '{SRC}/documents.parquet'")
        else:
            # letters-only word tag => disjoint vocabulary per copy
            doc_parts.append(
                f"SELECT doc_id + {i * OFFSET} AS doc_id,"
                f" array_to_string(list_transform(string_split(text, ' '),"
                f" w -> '{_tag(i)}' || w), ' ') AS text,"
                f" lang, source,"
                f" length(array_to_string(list_transform(string_split(text, ' '),"
                f" w -> '{_tag(i)}' || w), ' ')) AS n_chars"
                f" FROM '{SRC}/documents.parquet'"
            )
        r = i % 64
        rot = (
            "embedding"
            if r == 0
            else f"list_concat(embedding[{r + 1}:], embedding[:{r}])"
        )
        if perturb and i:
            rot = (
                f"CAST(list_transform({rot}, (x, j) ->"
                f" x + (({i} * 31 + j * 17) % 13 - 6) * {perturb})"
                f" AS FLOAT[])"
            )
        emb_parts.append(
            f"SELECT vec_id + {i * OFFSET} AS vec_id, {rot} AS embedding,"
            f" label + {i * 100} AS label FROM '{SRC}/embeddings.parquet'"
        )
        ev_parts.append(
            f"SELECT event_id + {i * OFFSET} AS event_id, ts,"
            f" user_id + {i * OFFSET} AS user_id, event_type, value, props"
            f" FROM '{SRC}/events.parquet'"
        )
    for name, parts in (
        ("documents", doc_parts),
        ("embeddings", emb_parts),
        ("events", ev_parts),
    ):
        con.sql(
            f"COPY ({' UNION ALL '.join(parts)}) TO '{d}/{name}.parquet'"
            f" (FORMAT PARQUET)"
        )
    open(stamp, "w").close()
    return d


def run_once(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mults", type=int, nargs="+", default=[1, 4, 16])
    ap.add_argument("queries", nargs="*", default=None)
    args = ap.parse_args()
    names = args.queries or DEFAULT_QUERIES

    from inverted_index_using_the_map_reduce_paradigm_spark.registry import load_all
    from inverted_index_using_the_map_reduce_paradigm_spark.session import get_spark

    qs = load_all()
    unknown = set(names) - set(qs)
    if unknown:
        print(f"unknown queries: {sorted(unknown)}", file=sys.stderr)
        return 2

    dirs = {m: build_scale_dir(m) for m in args.mults}
    spark = get_spark("scale_sweep")
    results: dict[str, dict[int, float]] = {}
    for name in names:
        results[name] = {}
        for m in args.mults:
            # the session derives its initial shuffle-partition bound
            # from $SPARK_GRAFT_SF_DIR (r13); this sweep reads its own
            # larger corpora, so re-derive per multiplier — it is a
            # runtime SQL conf, applied at planning time
            from inverted_index_using_the_map_reduce_paradigm_spark.session import (
                _dir_bytes,
                cpu_count,
                initial_partitions,
            )

            spark.conf.set(
                "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
                str(initial_partitions(cpu_count(), _dir_bytes(dirs[m]))),
            )
            df = qs[name].fn(spark, dirs[m])
            warm = run_once(df)
            runs = 3 if warm >= 0.3 else 1
            samples = [run_once(df) for _ in range(runs)]
            results[name][m] = round(statistics.median(samples), 3)
            print(
                f"{name} x{m}: {results[name][m]:.2f}s"
                f" (warm {warm:.2f}, load1 {os.getloadavg()[0]:.1f})",
                file=sys.stderr,
                flush=True,
            )

    ms = sorted(args.mults)
    hdr = " | ".join(f"x{m}" for m in ms)
    print(f"\n| query | {hdr} | marginal slope ratio |")
    print("|---|" + "---|" * (len(ms) + 1))
    slopes = {}
    for name in names:
        r = results[name]
        cells = " | ".join(f"{r[m]:.2f}s" for m in ms)
        ratio = ""
        if len(ms) >= 3:
            s1 = (r[ms[1]] - r[ms[0]]) / (ms[1] - ms[0])
            s2 = (r[ms[2]] - r[ms[1]]) / (ms[2] - ms[1])
            if s1 > 1e-3:
                slopes[name] = round(s2 / s1, 2)
                ratio = f"{slopes[name]:.2f}"
            else:
                ratio = "flat"
        print(f"| `{name}` | {cells} | {ratio} |")
    print(
        json.dumps(
            {"mults": ms, "results": results, "slope_ratios": slopes},
            separators=(",", ":"),
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
