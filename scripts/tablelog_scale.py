"""Measure the tlog table format's scale claims at sf0.1 (or
$SPARK_GRAFT_SF_DIR): MERGE file-skipping ratio and cost vs a full
rewrite, checkpoint-vs-replay snapshot resolution, and the bloom
sidecar's within-letter-directory skip ratio.

Usage: python scripts/tablelog_scale.py
Prints one JSON line; numbers land in SCALE.md.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from inverted_index_using_the_map_reduce_paradigm_spark.data import table
from inverted_index_using_the_map_reduce_paradigm_spark.session import get_spark
from inverted_index_using_the_map_reduce_paradigm_spark.sources.tablelog import (
    TlogTable,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    spark = get_spark("repo_spark_tablelog_scale")
    out: dict = {"sf_dir": SF_DIR, "load1": round(os.getloadavg()[0], 2)}
    base = tempfile.mkdtemp(prefix="tlog_scale_")

    # ---- MERGE skip ratio: 32 key-clustered files, 100-key narrow band
    orders = table(spark, SF_DIR, "orders")
    t = TlogTable.create(
        spark,
        os.path.join(base, "orders"),
        orders.repartitionByRange(32, "o_orderkey"),
        stats_cols=("o_orderkey",),
    )
    n_files = len(t.live_files())
    lo = orders.agg(F.min("o_orderkey")).first()[0]
    src = orders.filter(
        (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < lo + 100)
    ).withColumn("o_totalprice", F.col("o_totalprice") + 1.0)
    n_src = src.count()
    live_bytes = sum(a["bytes"] for a in t.live_files().values())
    t0 = time.perf_counter()
    t.merge(src, "o_orderkey", stats_cols=("o_orderkey",))
    merge_sec = time.perf_counter() - t0
    commit = t._read_commit(t.latest_version())
    matched = commit["removes"]
    rewritten_bytes = sum(a["bytes"] for a in commit["adds"])
    # the full-rewrite alternative: write the whole merged table fresh
    t0 = time.perf_counter()
    full = TlogTable.create(
        spark,
        os.path.join(base, "orders_full"),
        t.snapshot().repartitionByRange(32, "o_orderkey"),
        stats_cols=("o_orderkey",),
    )
    full_rewrite_sec = time.perf_counter() - t0
    out["merge"] = {
        "n_source_rows": n_src,
        "files_total": n_files,
        "files_rewritten": len(matched),
        "skip_ratio": round(1 - len(matched) / n_files, 3),
        # the scale-relevant metric: fraction of table BYTES rewritten
        # (wall seconds at fixture scale are job-overhead-dominated —
        # a handful of Spark jobs costs more than rewriting 10 MB, so
        # the wall crossover only appears when data >> overhead)
        "bytes_rewritten_fraction": round(rewritten_bytes / live_bytes, 4),
        "merge_sec": round(merge_sec, 3),
        "full_rewrite_sec": round(full_rewrite_sec, 3),
    }

    # ---- checkpoint vs full-replay snapshot resolution (metadata only)
    one = orders.limit(1)
    for _ in range(16):
        t.append(one)
    v = t.latest_version()
    t0 = time.perf_counter()
    for _ in range(50):
        a = t.live_files(v, use_checkpoint=True)
    ckpt_ms = (time.perf_counter() - t0) * 20  # ms per resolution
    t0 = time.perf_counter()
    for _ in range(50):
        b = t.live_files(v, use_checkpoint=False)
    replay_ms = (time.perf_counter() - t0) * 20
    assert a == b
    out["snapshot_resolution"] = {
        "n_commits": v + 1,
        "via_checkpoint_ms": round(ckpt_ms, 2),
        "full_replay_ms": round(replay_ms, 2),
    }

    # ---- deletion vectors vs copy-on-write: bytes written by a 1%
    # delete (DV writes a delete-sized sidecar; COW rewrites every
    # file containing a match — with a spread predicate that is the
    # whole table)
    t2 = TlogTable.create(
        spark,
        os.path.join(base, "orders_dv"),
        orders.repartitionByRange(32, "o_orderkey"),
        stats_cols=("o_orderkey",),
    )
    table_bytes = sum(a["bytes"] for a in t2.live_files().values())
    v = t2.delete_where_dv(F.col("o_orderkey") % 100 == 0)  # ~1%, all files
    dv_rel = t2._read_commit(v)["dv_adds"][0]
    dv_bytes = os.path.getsize(t2._abs(dv_rel))
    t3 = TlogTable.create(
        spark,
        os.path.join(base, "orders_cow"),
        orders.repartitionByRange(32, "o_orderkey"),
        stats_cols=("o_orderkey",),
    )
    cv = t3.delete_where(F.col("o_orderkey") % 100 == 0,
                         stats_cols=("o_orderkey",))
    cow_bytes = sum(a["bytes"] for a in t3._read_commit(cv)["adds"])
    out["deletion_vectors"] = {
        "table_bytes": table_bytes,
        "dv_sidecar_bytes": dv_bytes,
        "cow_rewrite_bytes": cow_bytes,
        "dv_fraction_of_cow": round(dv_bytes / cow_bytes, 4),
    }

    # ---- bloom sidecar at a REALISTIC vocabulary (the fixture corpus
    # has a few dozen distinct words, so its letter dirs hold 1-2 files
    # and there is nothing to skip; a crawled corpus has millions).
    # Synthetic 20k-word index, 8 bucket files per letter dir, probed
    # with 200 present + 200 absent words.
    from inverted_index_using_the_map_reduce_paradigm_spark.sources.sinks import (
        bloom_candidate_files,
        write_bloom_sidecar,
    )

    idx = os.path.join(base, "synth_index")
    vocab = (
        spark.range(20_000)
        .select(
            F.concat(
                # letter-led word: 26-way first char, hash body
                F.element_at(
                    F.split(F.lit(" ".join("abcdefghijklmnopqrstuvwxyz")), " "),
                    (F.col("id") % 26 + 1).cast("int"),
                ),
                F.md5(F.col("id").cast("string")),
            ).alias("word"),
            F.array(F.col("id")).alias("postings"),
            F.lit(1).alias("doc_freq"),
        )
        .withColumn("letter", F.substring("word", 1, 1))
    )
    (
        vocab.withColumn("_b", F.pmod(F.xxhash64("word"), F.lit(8)))
        .repartitionByRange(8, "_b")
        .drop("_b")
        .write.mode("overwrite")
        .partitionBy("letter")
        .parquet(idx)
    )
    write_bloom_sidecar(spark, idx)
    probes = [r.word for r in vocab.limit(200).collect()]
    absent = [w + "zz" for w in probes]
    fracs, fp_hits = [], 0
    for term in probes + absent:
        letter_files = glob.glob(
            os.path.join(idx, f"letter={term[:1]}", "*.parquet")
        )
        cand = [
            f
            for f in bloom_candidate_files(spark, idx + "_bloom", term)
            if f"/letter={term[:1]}/" in f
        ]
        if term in probes:
            fracs.append(len(cand) / max(len(letter_files), 1))
        else:
            fp_hits += len(cand)
    out["bloom"] = {
        "vocab": 20_000,
        "files_per_letter": len(
            glob.glob(os.path.join(idx, "letter=a", "*.parquet"))
        ),
        "mean_candidate_fraction_present": round(
            sum(fracs) / len(fracs), 3
        ),
        "absent_probe_candidate_files": fp_hits,
    }

    shutil.rmtree(base, ignore_errors=True)
    print(json.dumps(out, separators=(",", ":")))


if __name__ == "__main__":
    main()
