"""Transaction-log table format: the ACID guarantees the registry
censuses rely on, pinned at the mechanism level — snapshot isolation,
merge file-skipping minimality, checkpoint-vs-replay equivalence,
commit-race serialization, compaction content-identity, and vacuum
retention."""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from inverted_index_using_the_map_reduce_paradigm_spark.sources.tablelog import (
    CHECKPOINT_EVERY,
    ConcurrentCommit,
    TlogTable,
)


def _mk(spark, path, n=400, files=4):
    df = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    return TlogTable.create(
        spark, str(path), df.repartitionByRange(files, "k"),
        stats_cols=("k",),
    )


def _rows(df):
    return sorted((r.k, r.v) for r in df.collect())


def test_create_and_snapshot(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    assert t.latest_version() == 0
    assert len(t.live_files()) == 4
    assert _rows(t.snapshot()) == [(i, 2 * i) for i in range(400)]


def test_merge_skips_nonoverlapping_files(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    before = set(t.live_files())
    src = spark.createDataFrame(
        [(10, -1), (20, -2), (401, -3)], "k long, v long"
    )
    # read set: only files whose footer [min,max] covers 10/20/401
    matched = set(t.matched_files(src, "k"))
    assert matched, "source keys overlap the first file"
    assert len(matched) < len(before), "non-overlapping files must be skipped"
    t.merge(src, "k")
    after = t.live_files()
    # every unmatched file survives the commit with its path unchanged
    assert (before - matched) <= set(after)
    assert matched.isdisjoint(after)
    rows = dict(_rows(t.snapshot()))
    assert rows[10] == -1 and rows[20] == -2 and rows[401] == -3  # upserts
    assert rows[11] == 22 and len(rows) == 401  # untouched + insert


def test_snapshot_isolation_and_time_travel(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=100)
    v0_rows = _rows(t.snapshot(0))
    t.merge(spark.createDataFrame([(5, -5)], "k long, v long"), "k")
    t.delete_where(F.col("k") % 10 == 0)
    # v0 unchanged after two later commits
    assert _rows(t.snapshot(0)) == v0_rows
    assert dict(_rows(t.snapshot(1)))[5] == -5
    assert all(k % 10 != 0 for k, _ in _rows(t.snapshot()))


def test_delete_rewrites_only_hit_files(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    before = set(t.live_files())
    # keys 0..9 live in exactly one range-clustered file
    t.delete_where(F.col("k") < 10)
    after = set(t.live_files())
    assert len(before & after) == len(before) - 1, (
        "exactly one file contained matches; the rest must survive"
    )
    assert len(_rows(t.snapshot())) == 390


def test_checkpoint_resolution_equals_full_replay(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=50, files=2)
    one = spark.createDataFrame([(1000, 0)], "k long, v long")
    for i in range(2 * CHECKPOINT_EVERY):
        t.append(one.withColumn("k", F.col("k") + i), stats_cols=("k",))
    v = t.latest_version()
    assert v >= CHECKPOINT_EVERY  # at least one checkpoint was cut
    for probe in (v, v - 1, CHECKPOINT_EVERY, 0):
        assert t.live_files(probe, use_checkpoint=True) == t.live_files(
            probe, use_checkpoint=False
        )


def test_concurrent_appends_serialize(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=10, files=1)
    one = spark.createDataFrame([(99, 99)], "k long, v long")
    errs: list[Exception] = []

    def worker():
        try:
            TlogTable(spark, t.path).append(one)
        except Exception as e:  # noqa: BLE001 - collected for the assert
            errs.append(e)

    ts = [threading.Thread(target=worker) for _ in range(4)]
    for th in ts:
        th.start()
    for th in ts:
        th.join()
    assert not errs, errs
    assert t.latest_version() == 4  # 4 appends serialized after create
    assert t.snapshot().count() == 14


def test_read_write_conflict_raises(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=10, files=1)
    stale = t.latest_version()
    t.append(spark.createDataFrame([(99, 99)], "k long, v long"))
    with pytest.raises(ConcurrentCommit):
        t._commit({"op": "merge", "adds": [], "removes": []},
                  read_version=stale)


def test_compaction_is_content_identical(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.append(spark.createDataFrame([(400, 800)], "k long, v long"),
             stats_cols=("k",))
    pre_version = t.latest_version()
    pre_rows = _rows(t.snapshot())
    pre_files = len(t.live_files())
    v = t.compact(stats_cols=("k",))
    assert v == pre_version + 1
    assert len(t.live_files()) < pre_files
    assert _rows(t.snapshot()) == pre_rows
    # pre-compaction snapshot still readable (old files retained)
    assert _rows(t.snapshot(pre_version)) == pre_rows


def test_vacuum_enforces_retention(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    t.delete_where(F.col("k") < 100)
    t.compact(stats_cols=("k",))
    latest = t.latest_version()
    removed = t.vacuum(retain_from_version=latest)
    assert removed, "pre-compaction files should be reclaimed"
    assert t.snapshot(latest).count() == 300  # latest still reads
    with pytest.raises(Exception):
        t.snapshot(0).count()  # vacuumed history fails loudly


def test_delete_all_leaves_readable_empty_table(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=20, files=1)
    t.delete_where(F.lit(True))
    snap = t.snapshot()
    assert snap.count() == 0
    assert snap.columns == ["k", "v"]


def test_history_audit(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=20, files=2)
    t.merge(spark.createDataFrame([(0, -1)], "k long, v long"), "k")
    t.delete_where(F.col("k") == 5)
    ops = [h["op"] for h in t.history()]
    assert ops == ["create", "merge", "delete"]
    assert t.history()[0]["rows_added"] == 20


def test_aggregate_merge_combines_instead_of_replacing(spark, tmp_path):
    t = TlogTable.create(
        spark,
        str(tmp_path / "t"),
        spark.createDataFrame(
            [("a", [1, 3], 2), ("b", [2], 1)],
            "k string, postings array<long>, n long",
        ),
        stats_cols=("k",),
    )
    src = spark.createDataFrame(
        [("a", [2, 5], 2), ("c", [9], 1)],
        "k string, postings array<long>, n long",
    )
    t.merge(
        src,
        "k",
        stats_cols=("k",),
        combine={
            "postings": lambda s, t_: F.array_sort(F.array_union(s, t_)),
            "n": lambda s, t_: s + t_,
        },
    )
    rows = {r.k: (list(r.postings), r.n) for r in t.snapshot().collect()}
    assert rows == {
        "a": ([1, 2, 3, 5], 4),  # both sides -> combined
        "b": ([2], 1),           # target-only -> untouched
        "c": ([9], 1),           # source-only -> inserted
    }


def test_append_txn_is_idempotent_per_batch(spark, tmp_path):
    t = TlogTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([], "k long, v long"),
    )
    one = spark.createDataFrame([(1, 1)], "k long, v long")
    assert t.append_txn(one, "app", 0) is not None
    assert t.append_txn(one, "app", 0) is None          # replay no-ops
    assert t.append_txn(one, "app", 1) is not None      # next batch lands
    # a fresh handle (post-crash restart) sees the same watermark
    t2 = TlogTable(spark, t.path)
    assert t2.append_txn(one, "app", 1) is None
    assert t2.append_txn(one, "other_app", 0) is not None  # per-app scope
    assert t2.snapshot().count() == 3


def test_txn_state_checkpoint_equals_replay(spark, tmp_path):
    t = TlogTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([], "k long, v long"),
    )
    one = spark.createDataFrame([(1, 1)], "k long, v long")
    for b in range(2 * CHECKPOINT_EVERY):
        t.append_txn(one, "app", b)
    assert t.txn_state(use_checkpoint=True) == t.txn_state(
        use_checkpoint=False
    ) == {"app": 2 * CHECKPOINT_EVERY - 1}


def test_snapshot_census_prunes_columns(spark):
    """The registered tlog census reads 2 of orders' 6 columns; the
    snapshot read must column-prune at the scan (ReadSchema), not
    materialize the full row — the difference between scanning 2 and 6
    column chunks per file at 100 TB."""
    from inverted_index_using_the_map_reduce_paradigm_spark.plans import audit
    from inverted_index_using_the_map_reduce_paradigm_spark.registry import (
        load_all,
    )

    df = load_all()["table_merge_upsert"].fn(spark, "/root/testdata/sf0.001")
    plan = audit.physical_plan(df)
    import re

    schemas = re.findall(r"ReadSchema: struct<([^>]*)>", plan)
    assert schemas, plan
    for s in schemas:
        cols = {c.split(":")[0] for c in s.split(",") if c}
        assert cols <= {"o_orderkey", "o_totalprice"}, s


def test_deletion_vector_touches_no_data_file(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    before = t.live_files()
    v = t.delete_where_dv(F.col("k") % 3 == 0)
    c = t._read_commit(v)
    assert c["adds"] == [] and c["removes"] == []   # zero data files
    assert c["dv_adds"], "must record the vector sidecar"
    assert t.live_files() == before                  # live set unchanged
    rows = [k for k, _ in _rows(t.snapshot())]
    assert rows and all(k % 3 for k in rows)
    assert t.snapshot(0).count() == 400              # time travel intact


def test_merge_does_not_resurrect_dv_deleted_rows(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=30, files=2)
    t.delete_where_dv(F.col("k") == 3)
    # source touches key 4 (same file as key 3) — the rewrite must
    # keep 3 dead
    t.merge(spark.createDataFrame([(4, -4)], "k long, v long"), "k")
    rows = dict(_rows(t.snapshot()))
    assert rows[4] == -4 and 3 not in rows


def test_compact_dvs_rewrites_only_masked_files(spark, tmp_path):
    t = _mk(spark, tmp_path / "t")
    before = set(t.live_files())
    t.delete_where_dv(F.col("k") < 10)   # masks exactly one range file
    pre_fold = _rows(t.snapshot())
    v = t.compact_dvs(stats_cols=("k",))
    assert v is not None
    after = set(t.live_files())
    assert len(before & after) == len(before) - 1, (
        "only the masked file may be rewritten"
    )
    assert _rows(t.snapshot()) == pre_fold           # fold is identity
    assert t.compact_dvs() is None                   # nothing left to fold


def test_dv_then_cow_delete_compose(spark, tmp_path):
    t = _mk(spark, tmp_path / "t", n=60, files=2)
    t.delete_where_dv(F.col("k") % 2 == 0)
    t.delete_where(F.col("k") < 10)
    rows = [k for k, _ in _rows(t.snapshot())]
    assert rows == [k for k in range(60) if k % 2 and k >= 10]


def test_schema_evolution_is_additive_and_versioned(spark, tmp_path):
    t = TlogTable.create(
        spark, str(tmp_path / "t"),
        spark.createDataFrame([(1, 10)], "k long, v long"),
    )
    with pytest.raises(ValueError):  # retype rejected
        t.append(
            spark.createDataFrame([(2, "x")], "k long, v string"),
            evolve_schema=True,
        )
    with pytest.raises(ValueError):  # drop rejected
        t.append(spark.createDataFrame([(2,)], "k long"), evolve_schema=True)
    t.append(
        spark.createDataFrame([(2, 20, "b")], "k long, v long, tag string"),
        evolve_schema=True,
    )
    rows = {r.k: (r.v, r.tag) for r in t.snapshot().collect()}
    assert rows == {1: (10, None), 2: (20, "b")}  # null-backfilled
    # time travel below the evolution commit keeps the narrow schema
    assert t.snapshot(0).columns == ["k", "v"]
    assert t.snapshot().columns == ["k", "v", "tag"]
