"""Head-to-head against the compiled reference binary.

Builds a text corpus from sf0.1 ``documents`` (each doc's text repeated
``--mult`` times into its own file + a reference-format manifest),
compiles ``/root/reference/main.c++`` (g++ -O2 -pthread), times the
binary and the engine's drop-in pipeline on the SAME manifest, and
byte-compares the 26 letter files.

Usage: ``python scripts/race_reference.py [--mult 30] [--runs 3]``

Methodology notes (mirrored in BASELINE.md):
  * the binary is timed as a fresh process (it has no startup cost to
    amortize); the engine is timed warm inside one SparkSession, since
    JVM+session startup (~15 s) is a fixed cost that at deployment is
    paid once per cluster, not per corpus;
  * both get 32-way parallelism (binary: 32 mappers + 32 reducers;
    engine: local[32]);
  * outputs must be byte-identical — the race is only meaningful
    because both produce the reference's exact 26-file layout.
"""

from __future__ import annotations

import argparse
import os
import string
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF_SRC = "/root/reference/main.c++"
SF_PARQUET = "/root/testdata/sf0.1/documents.parquet"


def build_corpus(base: str, mult: int, skew_mib: int = 0) -> str:
    """Uniform corpus: every doc's text repeated ``mult`` times in its
    own file.  Skew corpus (``skew_mib`` > 0): every doc ONCE (tiny
    files) except doc 1, whose file is grown to ~``skew_mib`` MiB — the
    one-giant-file layout that starves the reference's static per-file
    thread assignment and stresses the engine's wholetext row bound."""
    import duckdb

    tag = f"skew{skew_mib}" if skew_mib else f"x{mult}"
    d = os.path.join(base, f"corpus_{tag}")
    manifest = os.path.join(base, f"manifest_{tag}.txt")
    if os.path.exists(manifest):
        # Reuse an existing corpus: rewriting GiBs immediately before
        # timing leaves the page cache cold and writeback competing
        # with the first reads — re-runs on a built corpus measure
        # steady-state IO on both sides instead.
        # line-wise parse: first line is the count, the rest are paths
        # (a path may contain spaces — never split on whitespace)
        lines = open(manifest).read().splitlines()
        paths = [ln for ln in lines[1:] if ln]
        if lines and lines[0].strip().isdigit() and int(lines[0]) == len(
            paths
        ) and all(os.path.exists(p) for p in paths):
            size = sum(os.path.getsize(p) for p in paths)
            print(f"corpus (reused): {len(paths)} files, {size / 2**20:.0f} MiB")
            return manifest
    os.makedirs(d, exist_ok=True)
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_PARQUET}' ORDER BY doc_id"
    ).fetchall()
    paths = []
    for doc_id, text in rows:
        p = os.path.join(d, f"doc{doc_id}.txt")
        with open(p, "w") as f:
            if skew_mib and doc_id == 1:
                line = text + "\n"
                reps = max(1, skew_mib * 2**20 // len(line.encode()))
                chunk = line * 4096
                full, rem = divmod(reps, 4096)
                for _ in range(full):
                    f.write(chunk)
                f.write(line * rem)
            else:
                f.write((text + "\n") * (1 if skew_mib else mult))
        paths.append(p)
    with open(manifest, "w") as f:
        f.write(f"{len(paths)}\n" + "\n".join(paths) + "\n")
    size = sum(os.path.getsize(p) for p in paths)
    print(f"corpus: {len(paths)} files, {size / 2**20:.0f} MiB")
    return manifest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=30)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument(
        "--skew",
        type=int,
        default=0,
        metavar="MIB",
        help="skew corpus: doc 1 grown to ~MIB MiB, all others tiny;"
        " the engine reads with wholetext='auto' (line-split big file)",
    )
    ap.add_argument(
        "--build-only",
        action="store_true",
        help="build (or verify) the corpus and exit — lets the multi-GiB"
        " write run concurrently with other work, keeping the timed race"
        " itself on an otherwise idle host",
    )
    args = ap.parse_args()

    base = os.path.join(tempfile.gettempdir(), "spark_graft_race")
    os.makedirs(base, exist_ok=True)
    manifest = build_corpus(base, args.mult, skew_mib=args.skew)
    if args.build_only:
        return 0

    ref_bin = os.path.join(base, "ref_bin")
    subprocess.run(["g++", "-O2", "-pthread", "-o", ref_bin, REF_SRC], check=True)
    ref_out = os.path.join(base, "ref_out")
    os.makedirs(ref_out, exist_ok=True)
    ref_ts = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        subprocess.run([ref_bin, "32", "32", manifest], cwd=ref_out, check=True)
        ref_ts.append(time.perf_counter() - t0)
    print(f"reference (32+32 threads): {[round(t, 2) for t in ref_ts]} "
          f"median {sorted(ref_ts)[len(ref_ts) // 2]:.2f}s")

    from inverted_index_using_the_map_reduce_paradigm_spark.operators.inverted_index import formatted_index
    from inverted_index_using_the_map_reduce_paradigm_spark.session import get_spark
    from inverted_index_using_the_map_reduce_paradigm_spark.sources.manifest import read_corpus
    from inverted_index_using_the_map_reduce_paradigm_spark.sources.sinks import (
        collect_reference_layout,
        write_letter_index,
    )

    spark = get_spark("race_reference")
    eng_ts = []
    out = ""
    granularity = "auto" if args.skew else True
    for i in range(args.runs):
        out = os.path.join(base, f"eng_out_{i}")
        t0 = time.perf_counter()
        docs = read_corpus(spark, manifest, wholetext=granularity)
        write_letter_index(formatted_index(docs, arrow_tokenizer=True), out)
        collect_reference_layout(out)
        eng_ts.append(time.perf_counter() - t0)
    print(f"engine (local[32], warm): {[round(t, 2) for t in eng_ts]} "
          f"median {sorted(eng_ts)[len(eng_ts) // 2]:.2f}s")

    same = all(
        open(os.path.join(out, f"{c}.txt"), "rb").read()
        == open(os.path.join(ref_out, f"{c}.txt"), "rb").read()
        for c in string.ascii_lowercase
    )
    print(f"byte-identical 26-file output: {same}")
    return 0 if same else 1


if __name__ == "__main__":
    raise SystemExit(main())
