"""Transaction-log table format ("tlog"): minimal ACID tables over
parquet — an ordered JSON commit log, snapshot-isolation reads, time
travel, copy-on-write MERGE with stats-based file skipping, small-file
compaction, periodic log checkpoints, and retention-window vacuum.

The design follows the published Delta Lake layout (Armbrust et al.,
"Delta Lake: High-Performance ACID Table Storage over Cloud Object
Stores", VLDB 2020) — an append-only log of {add, remove} actions, one
JSON file per version under ``_txnlog/``, committed with an atomic
create-exclusive so concurrent writers serialize on the version number
(the local-FS / HDFS mutual-exclusion primitive; an object store needs
a coordination service for this exact step, same as Delta's S3
LogStore).  No external table-format library is used or assumed: the
reader/writer below is the implementation.

Scale posture (100 TB):
  * Planning is METADATA-ONLY.  A snapshot resolves by reading the
    newest checkpoint <= V plus the delta commits after it — a handful
    of small JSON files — never a directory listing of the data tree
    (object-store LIST over millions of files is the classic
    metadata bottleneck this format removes).
  * Every ``add`` carries the file's row count and per-column min/max
    read from the parquet FOOTER at commit time (no data scan).
    MERGE range-joins the source keys against that stats table and
    rewrites ONLY overlapping files, so upserting 1k keys into a
    100 TB table touches a handful of files, not the table.  Footer
    min/max are exact bounds, so skipping has no false negatives.
  * Readers get snapshot isolation for free: the live-file set of a
    committed version never changes, so a long-running query pinned at
    V is immune to concurrent appends/compactions; ``remove`` never
    deletes bytes — only ``vacuum`` (with an explicit version-retention
    cutoff) physically reclaims files no retained snapshot references.
  * Compaction is a log-only data rewrite: same rows, fewer files; a
    concurrent reader at the pre-compaction version still sees the old
    files.

Reference scope note: the reference engine (main.c++) has no storage
layer at all — its output is write-once text files (main.c++:231-266).
This module is north-star surface (SURVEY.md §2.3): the maintenance
story (incremental upsert/delete/compact) a recurring 100 TB corpus
refresh needs around the inverted index and dedup operators.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

LOG_DIR = "_txnlog"
LAST_CHECKPOINT = "_last_checkpoint"
# Checkpoint cadence: every N commits the full live-file set is
# consolidated so snapshot resolution stays O(N) regardless of table
# age.  Delta uses 10; 4 keeps the mechanism exercised at test scale.
CHECKPOINT_EVERY = 4
COMMIT_RETRIES = 20


class ConcurrentCommit(RuntimeError):
    """Another writer committed the version this transaction read —
    the operation's read set may be stale, so it must be re-run (only
    blind appends are internally retried; everything else surfaces)."""


def _json_safe(v):
    """Parquet footer stats -> JSON-encodable scalar."""
    if isinstance(v, bytes):
        return v.decode("utf-8", "replace")
    if isinstance(v, (int, float, str, bool)) or v is None:
        return v
    return str(v)


def _file_stats(path: str, stats_cols: tuple[str, ...]) -> dict:
    """Row count + per-column min/max from the parquet footer — a
    metadata read of a few KiB, never a data scan."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    names = {md.schema.column(i).name: i for i in range(md.num_columns)}
    stats: dict[str, dict] = {}
    for col in stats_cols:
        i = names.get(col)
        if i is None:
            continue
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            s = md.row_group(rg).column(i).statistics
            if s is None or not s.has_min_max:
                lo = hi = None
                break
            lo = s.min if lo is None else min(lo, s.min)
            hi = s.max if hi is None else max(hi, s.max)
        if lo is not None:
            stats[col] = {"min": _json_safe(lo), "max": _json_safe(hi)}
    return {"rows": md.num_rows, "bytes": os.path.getsize(path), "stats": stats}


class TlogTable:
    """One table rooted at ``path``; data files flat under the root,
    commit log under ``path/_txnlog``."""

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        self.log_dir = os.path.join(self.path, LOG_DIR)

    # ------------------------------------------------------------------
    # construction
    # ------------------------------------------------------------------

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        df: DataFrame,
        stats_cols: tuple[str, ...] = (),
    ) -> "TlogTable":
        t = cls(spark, path)
        if os.path.exists(t.log_dir) and os.listdir(t.log_dir):
            raise FileExistsError(f"tlog table already exists at {path}")
        os.makedirs(t.log_dir, exist_ok=True)
        adds = t._write_data(df, stats_cols)
        t._commit(
            {"op": "create", "schema": df.schema.json(), "adds": adds,
             "removes": []},
            retry_blind=False,
        )
        return t

    # ------------------------------------------------------------------
    # log plumbing
    # ------------------------------------------------------------------

    def _commit_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:08d}.json")

    def _checkpoint_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:08d}.checkpoint.json")

    def _versions(self) -> list[int]:
        out = []
        for n in os.listdir(self.log_dir):
            if n.endswith(".json") and not n.endswith(".checkpoint.json"):
                out.append(int(n.split(".")[0]))
        return sorted(out)

    def latest_version(self) -> int:
        vs = self._versions()
        if not vs:
            raise FileNotFoundError(f"no tlog table at {self.path}")
        return vs[-1]

    def _read_commit(self, version: int) -> dict:
        with open(self._commit_path(version)) as f:
            return json.load(f)

    def schema(self, version: int | None = None) -> StructType:
        """Table schema as of ``version`` — the newest commit at or
        below it that carries a schema (commit 0 always does; an
        evolving append adds one).  Time-travel reads therefore see
        the schema their snapshot was written under."""
        if version is None:
            vs = self._versions()
            version = vs[-1] if vs else 0
        for v in range(version, -1, -1):
            c = self._read_commit(v)
            if "schema" in c:
                return StructType.fromJson(json.loads(c["schema"]))
        raise FileNotFoundError(f"no schema recorded at or below v{version}")

    def history(self) -> list[dict]:
        """One row per commit: op + add/remove/row counts (audit
        surface; the census queries read this, not the raw log)."""
        out = []
        for v in self._versions():
            c = self._read_commit(v)
            out.append(
                {
                    "version": v,
                    "op": c["op"],
                    "n_added": len(c["adds"]),
                    "n_removed": len(c["removes"]),
                    "rows_added": sum(a["rows"] for a in c["adds"]),
                }
            )
        return out

    def live_files(self, version: int | None = None,
                   use_checkpoint: bool = True) -> dict[str, dict]:
        """{relative path -> add action} live at ``version``.

        Resolution is the scale-critical path: start from the newest
        checkpoint <= version (one JSON read) and replay only the
        commits after it.  ``use_checkpoint=False`` replays the full
        log — the test suite pins both resolutions identical."""
        if version is None:
            version = self.latest_version()
        start = 0
        live: dict[str, dict] = {}
        if use_checkpoint:
            best = -1
            for n in os.listdir(self.log_dir):
                if n.endswith(".checkpoint.json"):
                    v = int(n.split(".")[0])
                    if best < v <= version:
                        best = v
            if best >= 0:
                with open(self._checkpoint_path(best)) as f:
                    live = {a["path"]: a for a in json.load(f)["adds"]}
                start = best + 1
        for v in range(start, version + 1):
            if not os.path.exists(self._commit_path(v)):
                raise FileNotFoundError(
                    f"commit {v} missing from {self.log_dir} "
                    "(vacuumed past its retention?)"
                )
            c = self._read_commit(v)
            for p in c["removes"]:
                live.pop(p, None)
            for a in c["adds"]:
                live[a["path"]] = a
        return live

    def _try_commit(self, version: int, record: dict) -> bool:
        """Atomic create-exclusive of the next version file — the
        mutual-exclusion step that makes concurrent writers serialize
        (two writers racing for version V: exactly one O_EXCL open
        succeeds; the loser re-resolves and retries or aborts)."""
        record = dict(record, version=version, ts=round(time.time(), 3))
        body = json.dumps(record, sort_keys=True)
        try:
            fd = os.open(
                self._commit_path(version),
                os.O_CREAT | os.O_EXCL | os.O_WRONLY,
            )
        except FileExistsError:
            return False
        with os.fdopen(fd, "w") as f:
            f.write(body)
        if (version + 1) % CHECKPOINT_EVERY == 0:
            self._write_checkpoint(version)
        return True

    def _commit(
        self,
        record: dict,
        read_version: int | None = None,
        retry_blind: bool = True,
    ) -> int:
        """Commit at the next free version.  A blind append commutes
        with any concurrent commit, so it retries; an operation that
        READ the table (merge/delete/compact: ``read_version`` set)
        must abort when beaten — its file-level read set may be stale."""
        for _ in range(COMMIT_RETRIES):
            vs = self._versions()
            nxt = (vs[-1] + 1) if vs else 0
            if read_version is not None and nxt != read_version + 1:
                raise ConcurrentCommit(
                    f"table advanced to v{nxt - 1} past read v{read_version}"
                )
            if self._try_commit(nxt, record):
                return nxt
            if read_version is not None:
                raise ConcurrentCommit(
                    f"lost the commit race for v{nxt}"
                )
            if not retry_blind:
                raise ConcurrentCommit(f"lost the commit race for v{nxt}")
        raise ConcurrentCommit(f"no free version after {COMMIT_RETRIES} tries")

    def txn_state(self, version: int | None = None,
                  use_checkpoint: bool = True) -> dict[str, int]:
        """{app_id -> highest committed batch} at ``version`` — the
        idempotence watermark for ``append_txn``.  Resolves exactly
        like ``live_files``: newest checkpoint's consolidated txn map
        plus the delta commits after it."""
        if version is None:
            vs = self._versions()
            if not vs:
                return {}
            version = vs[-1]
        start = 0
        txn: dict[str, int] = {}
        if use_checkpoint:
            best = -1
            for n in os.listdir(self.log_dir):
                if n.endswith(".checkpoint.json"):
                    v = int(n.split(".")[0])
                    if best < v <= version:
                        best = v
            if best >= 0:
                with open(self._checkpoint_path(best)) as f:
                    txn = dict(json.load(f).get("txn", {}))
                start = best + 1
        for v in range(start, version + 1):
            t = self._read_commit(v).get("txn")
            if t:
                txn[t["app"]] = max(txn.get(t["app"], -1), t["batch"])
        return txn

    def _write_checkpoint(self, version: int) -> None:
        # checkpoint resolution must not consult checkpoints (it IS one)
        live = self.live_files(version, use_checkpoint=False)
        body = json.dumps(
            {
                "version": version,
                "adds": list(live.values()),
                "txn": self.txn_state(version, use_checkpoint=False),
            },
            sort_keys=True,
        )
        tmp = self._checkpoint_path(version) + f".tmp.{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            f.write(body)
        os.replace(tmp, self._checkpoint_path(version))
        with open(os.path.join(self.log_dir, LAST_CHECKPOINT), "w") as f:
            f.write(str(version))

    # ------------------------------------------------------------------
    # data files
    # ------------------------------------------------------------------

    def _write_data(
        self, df: DataFrame, stats_cols: tuple[str, ...]
    ) -> list[dict]:
        """Write ``df`` as parquet into the table root via a staging
        directory (task output never lands under a live name), return
        the add actions with footer-derived stats."""
        staging = os.path.join(self.path, f"_staging-{uuid.uuid4().hex}")
        df.write.mode("overwrite").parquet(staging)
        adds = []
        for n in sorted(os.listdir(staging)):
            if not n.endswith(".parquet"):
                continue
            final = f"part-{uuid.uuid4().hex}.parquet"
            os.replace(os.path.join(staging, n), os.path.join(self.path, final))
            adds.append(
                dict(
                    _file_stats(os.path.join(self.path, final), stats_cols),
                    path=final,
                )
            )
        shutil.rmtree(staging)
        return adds

    def _abs(self, rel: str) -> str:
        return os.path.join(self.path, rel)

    @staticmethod
    def _clustered(df: DataFrame, cluster_files: int,
                   cols: tuple[str, ...]) -> DataFrame:
        """Optimized write: range-cluster the output on the given
        columns so each file covers a tight key range — footer min/max
        stay selective and the NEXT merge/delete keeps skipping files.
        0 keeps the plan's own partitioning (no extra shuffle)."""
        if cluster_files and cols:
            return df.repartitionByRange(cluster_files, *cols)
        return df

    # ------------------------------------------------------------------
    # reads
    # ------------------------------------------------------------------

    def snapshot(self, version: int | None = None) -> DataFrame:
        """The table as of ``version`` (default: latest).  The file
        list is frozen at commit time, so this read is repeatable
        regardless of concurrent writes — snapshot isolation.  Pending
        deletion vectors are anti-joined out at scan time (merge-on-
        read); when none are pending the plan is the bare parquet
        scan."""
        if version is None:
            version = self.latest_version()
        schema = self.schema(version)
        live = self.live_files(version)
        if not live:
            return self.spark.createDataFrame([], schema)
        base = self.spark.read.schema(schema).parquet(
            *(self._abs(p) for p in live)
        )
        return self._mask_dvs(base, version).select(*schema.fieldNames())

    # ------------------------------------------------------------------
    # writes
    # ------------------------------------------------------------------

    def append(
        self,
        df: DataFrame,
        stats_cols: tuple[str, ...] = (),
        evolve_schema: bool = False,
    ) -> int:
        """Blind append.  With ``evolve_schema``, the batch may ADD
        columns: the commit records the widened schema, older files
        read back with the new columns null-backfilled (the parquet
        reader resolves by name), and a time-travel read below this
        commit still uses the old schema.  Only additive evolution is
        accepted — a dropped or retyped column is a rewrite, not an
        append, and is rejected loudly."""
        record: dict = {"op": "append", "removes": []}
        if evolve_schema:
            cur = {f.name: f.dataType for f in self.schema().fields}
            new = {f.name: f.dataType for f in df.schema.fields}
            bad = [n for n, t in cur.items() if new.get(n) != t]
            if bad:
                raise ValueError(
                    f"schema evolution is additive-only; existing columns "
                    f"changed or missing: {bad}"
                )
            if len(new) > len(cur):
                record["schema"] = df.schema.json()
        adds = self._write_data(df, stats_cols)
        record["adds"] = adds
        return self._commit(record)

    def append_txn(
        self,
        df: DataFrame,
        app_id: str,
        batch_id: int,
        stats_cols: tuple[str, ...] = (),
    ) -> int | None:
        """Idempotent append, the exactly-once streaming-sink contract
        (Delta's txnAppId/txnVersion pattern): the commit carries
        ``(app_id, batch_id)``, and a batch at or below the app's
        committed watermark is a NO-OP — so a foreachBatch retry or a
        post-crash micro-batch replay cannot double-write.  The check
        and the commit race safely: the watermark is re-read each time
        the O_EXCL commit loses, and a skipped replay removes the data
        files it staged (they were never referenced by any commit)."""
        if batch_id <= self.txn_state().get(app_id, -1):
            return None
        adds = self._write_data(df, stats_cols)
        record = {
            "op": "append",
            "adds": adds,
            "removes": [],
            "txn": {"app": app_id, "batch": int(batch_id)},
        }
        for _ in range(COMMIT_RETRIES):
            vs = self._versions()
            nxt = (vs[-1] + 1) if vs else 0
            if batch_id <= self.txn_state().get(app_id, -1):
                for a in adds:  # unreferenced staging leftovers
                    try:
                        os.remove(self._abs(a["path"]))
                    except OSError:
                        pass
                return None
            if self._try_commit(nxt, record):
                return nxt
        raise ConcurrentCommit(f"no free version after {COMMIT_RETRIES} tries")

    def matched_files(self, source: DataFrame, key: str) -> list[str]:
        """Live files whose footer [min, max] range on ``key`` contains
        at least one source key — the MERGE read set.

        The stats side is metadata-sized (one row per live file), so
        the range join broadcasts it against the distinct source keys;
        footer bounds are exact, so a key inside an unmatched file is
        impossible (no false negatives) and skipping is safe."""
        live = self.live_files()
        rows = [
            (p, a["stats"][key]["min"], a["stats"][key]["max"])
            for p, a in live.items()
            if key in a.get("stats", {})
        ]
        unstated = [p for p, a in live.items() if key not in a.get("stats", {})]
        if not rows:
            return sorted(unstated)
        # key-typed bounds: integer keys range-join as longs, string
        # keys lexicographically (exact as long as the writer did not
        # truncate the footer min/max — parquet truncates binary stats
        # only past ~4 KiB, far beyond any key this engine stores; a
        # general implementation would widen a truncated upper bound,
        # Iceberg-style, before trusting it)
        ktype = dict(source.dtypes)[key]
        files = self.spark.createDataFrame(
            rows, schema=f"path string, _kmin {ktype}, _kmax {ktype}"
        )
        # stats side is tiny (one row per live file) and the distinct
        # source keys broadcast against it; the non-equi range condition
        # is a BroadcastNestedLoop over metadata-sized inputs — never
        # over data
        keys = source.select(F.col(key).alias("_k")).distinct()
        hit = files.join(
            keys,
            (F.col("_k") >= F.col("_kmin")) & (F.col("_k") <= F.col("_kmax")),
            "left_semi",
        )
        return sorted(
            {r.path for r in hit.select("path").collect()} | set(unstated)
        )

    def merge(
        self,
        source: DataFrame,
        key: str,
        stats_cols: tuple[str, ...] = (),
        cluster_files: int = 0,
        combine: dict | None = None,
    ) -> int:
        """Copy-on-write upsert: source rows replace same-key target
        rows, new keys insert.  Only files whose key range overlaps a
        source key are rewritten; every other live file survives the
        commit untouched (pinned by tests/test_tablelog.py).

        Precondition (standard MERGE): ``key`` is unique on both sides
        — a duplicate source key would match one target row twice and
        multiply it through the full-outer join, same as SQL MERGE's
        "multiple rows matched" error class.

        ``combine`` upgrades replace-semantics to AGGREGATE-merge per
        column: ``{col: fn(src_col, tgt_col) -> Column}`` is applied
        when BOTH sides have the key (either side alone passes
        through), e.g. ``array_union`` for posting lists or ``+`` for
        counters — the upsert shape incremental index maintenance
        needs, still within the same one-join copy-on-write commit."""
        read_version = self.latest_version()
        matched = self.matched_files(source, key)
        cols = [c for c in self.schema().fieldNames() if c != key]
        combine = combine or {}
        src = source.select(
            F.col(key), *[F.col(c).alias(f"_s_{c}") for c in cols]
        )
        if matched:
            # DV-masked raw read: a row deleted merge-on-read must not
            # resurrect through the rewrite of its file
            target = self._mask_dvs(
                self.spark.read.schema(self.schema()).parquet(
                    *(self._abs(p) for p in matched)
                ),
                read_version,
            ).select(*self.schema().fieldNames())
            j = target.join(src, key, "full_outer")

            def out_col(c: str) -> F.Column:
                s, t = F.col(f"_s_{c}"), F.col(c)
                if c in combine:
                    return (
                        F.when(s.isNull(), t)
                        .when(t.isNull(), s)
                        .otherwise(combine[c](s, t))
                        .alias(c)
                    )
                return F.coalesce(s, t).alias(c)

            merged = j.select(F.col(key), *[out_col(c) for c in cols])
        else:
            merged = src.select(
                F.col(key), *[F.col(f"_s_{c}").alias(c) for c in cols]
            )
        merged = self._clustered(
            merged.select(*self.schema().fieldNames()), cluster_files, (key,)
        )
        adds = self._write_data(merged, stats_cols or (key,))
        return self._commit(
            {"op": "merge", "adds": adds, "removes": matched},
            read_version=read_version,
        )

    def delete_where(
        self,
        condition,
        stats_cols: tuple[str, ...] = (),
        cluster_files: int = 0,
    ) -> int:
        """Delete matching rows by rewriting only the files that
        actually CONTAIN a match: one scan tags each matching row with
        ``input_file_name`` (exact file-level pruning — stats-based
        pruning would be a superset), untouched files stay live."""
        read_version = self.latest_version()
        live = self.live_files(read_version)
        if live:
            base = self.spark.read.schema(self.schema()).parquet(
                *(self._abs(p) for p in live)
            )
            # tag with the scan's file BEFORE the DV mask joins — a
            # virtual scan column does not survive a join
            keyed = base.select(
                "*", F.input_file_name().alias("_file")
            )
            keyed = self._mask_dvs(keyed, read_version)
            hit_names = {
                os.path.basename(r._file)
                for r in keyed.filter(condition)
                .select("_file")
                .distinct()
                .collect()
            }
        else:
            hit_names = set()
        hit = sorted(p for p in live if os.path.basename(p) in hit_names)
        if not hit:
            return self._commit(
                {"op": "delete", "adds": [], "removes": []},
                read_version=read_version,
            )
        kept = (
            self._mask_dvs(
                self.spark.read.schema(self.schema()).parquet(
                    *(self._abs(p) for p in hit)
                ),
                read_version,
            )
            .select(*self.schema().fieldNames())
            .filter(~condition)
        )
        adds = self._write_data(
            self._clustered(kept, cluster_files, stats_cols), stats_cols
        )
        return self._commit(
            {"op": "delete", "adds": adds, "removes": hit},
            read_version=read_version,
        )

    def compact(
        self,
        target_file_bytes: int = 128 << 20,
        stats_cols: tuple[str, ...] = (),
    ) -> int | None:
        """Bin-pack the live set into ~target-size files.  Data is
        byte-for-byte the same multiset of rows (pinned by tests); the
        old files stay on disk for time travel until ``vacuum``."""
        read_version = self.latest_version()
        live = self.live_files(read_version)
        if len(live) <= 1:
            return None
        total = sum(a["bytes"] for a in live.values())
        n_out = max(1, -(-total // target_file_bytes))
        if n_out >= len(live):
            return None
        df = self.snapshot(read_version).coalesce(int(n_out))
        adds = self._write_data(df, stats_cols)
        return self._commit(
            {"op": "compact", "adds": adds, "removes": sorted(live)},
            read_version=read_version,
        )

    # ------------------------------------------------------------------
    # deletion vectors (merge-on-read deletes)
    # ------------------------------------------------------------------

    def _dv_paths(self, version: int | None = None) -> list[str]:
        """Deletion-vector files accumulated up to ``version`` (each a
        parquet of (file, row_index) pairs).  Rows naming a no-longer-
        live file are inert — a rewrite (merge/compact) retires a DV
        simply by retiring the file it masks."""
        if version is None:
            version = self.latest_version()
        out: list[str] = []
        for v in range(version + 1):
            out.extend(self._read_commit(v).get("dv_adds", []))
        return out

    def delete_where_dv(self, condition) -> int:
        """Merge-on-read delete: instead of rewriting every file that
        contains a match (copy-on-write ``delete_where``), write a
        DELETION VECTOR — the (file, row_index) positions of matching
        rows, found via the parquet reader's ``_metadata.row_index``
        virtual column — and leave every data file untouched.

        This is the Delta deletion-vector / Iceberg position-delete
        design: a delete of 0.01% of a 100 TB table costs one scan +
        a delete-sized sidecar write, not a rewrite of every touched
        file; readers anti-join the (delete-sized, broadcastable) DV
        at scan time.  The trade is read-amplification until the next
        compaction folds the DVs in — exactly the copy-on-write vs
        merge-on-read knob real table formats expose."""
        read_version = self.latest_version()
        base = self.spark.read.schema(self.schema()).parquet(
            *(self._abs(p) for p in self.live_files(read_version))
        )
        # key rows by (file, row_index) BEFORE any join — _metadata is
        # a scan-relation virtual column and does not survive joins
        keyed = base.select(
            "*",
            F.element_at(
                F.split(F.col("_metadata.file_path"), "/"), -1
            ).alias("_dv_file"),
            F.col("_metadata.row_index").alias("_dv_row"),
        )
        dvs = self._dv_paths(read_version)
        if dvs:  # don't re-delete already-DV'd rows
            dv = self.spark.read.schema(
                "file string, row_index long"
            ).parquet(*(self._abs(p) for p in dvs))
            keyed = keyed.join(
                dv,
                (keyed["_dv_file"] == dv["file"])
                & (keyed["_dv_row"] == dv["row_index"]),
                "left_anti",
            )
        hits = keyed.filter(condition).select(
            F.col("_dv_file").alias("file"),
            F.col("_dv_row").alias("row_index"),
        )
        dv_rel = f"dv-{uuid.uuid4().hex}.parquet"
        staging = os.path.join(self.path, f"_staging-{uuid.uuid4().hex}")
        hits.coalesce(1).write.mode("overwrite").parquet(staging)
        parts = [n for n in os.listdir(staging) if n.endswith(".parquet")]
        os.replace(os.path.join(staging, parts[0]), self._abs(dv_rel))
        shutil.rmtree(staging)
        return self._commit(
            {"op": "delete_dv", "adds": [], "removes": [],
             "dv_adds": [dv_rel]},
            read_version=read_version,
        )

    def _mask_dvs(self, df: DataFrame, version: int | None) -> DataFrame:
        dvs = self._dv_paths(version)
        if not dvs:
            return df
        dv = self.spark.read.schema("file string, row_index long").parquet(
            *(self._abs(p) for p in dvs)
        )
        keyed = df.withColumns(
            {
                "_dv_file": F.element_at(
                    F.split(F.col("_metadata.file_path"), "/"), -1
                ),
                "_dv_row": F.col("_metadata.row_index"),
            }
        )
        return keyed.join(
            dv,
            (keyed["_dv_file"] == dv["file"])
            & (keyed["_dv_row"] == dv["row_index"]),
            "left_anti",
        ).drop("_dv_file", "_dv_row")

    def compact_dvs(self, stats_cols: tuple[str, ...] = (),
                    cluster_files: int = 0) -> int | None:
        """Fold pending deletion vectors into the data: rewrite ONLY
        the files a DV actually masks (from the DV's own file column —
        delete-sized metadata), dropping masked rows; untouched files
        stay live.  After this commit the DVs are inert (their target
        files are no longer live) and reads are amplification-free
        again."""
        read_version = self.latest_version()
        dvs = self._dv_paths(read_version)
        if not dvs:
            return None
        live = self.live_files(read_version)
        dv = self.spark.read.schema("file string, row_index long").parquet(
            *(self._abs(p) for p in dvs)
        )
        masked_names = {r.file for r in dv.select("file").distinct().collect()}
        hit = sorted(p for p in live if os.path.basename(p) in masked_names)
        if not hit:
            return None
        kept = self._mask_dvs(
            self.spark.read.schema(self.schema()).parquet(
                *(self._abs(p) for p in hit)
            ),
            read_version,
        ).select(*self.schema().fieldNames())
        adds = self._write_data(
            self._clustered(kept, cluster_files, stats_cols), stats_cols
        )
        return self._commit(
            {"op": "compact_dv", "adds": adds, "removes": hit},
            read_version=read_version,
        )

    # ------------------------------------------------------------------
    # maintenance
    # ------------------------------------------------------------------

    def vacuum(self, retain_from_version: int) -> list[str]:
        """Physically delete data files referenced ONLY by snapshots
        older than ``retain_from_version`` — the explicit retention
        cutoff that trades time-travel depth for storage.  Commits
        older than the cutoff stay in the log (history is cheap);
        reading a vacuumed snapshot fails loudly on the missing file."""
        latest = self.latest_version()
        retain_from_version = min(retain_from_version, latest)
        keep: set[str] = set()
        for v in range(retain_from_version, latest + 1):
            keep.update(self.live_files(v))
        removed = []
        for n in sorted(os.listdir(self.path)):
            if n.endswith(".parquet") and n not in keep:
                os.remove(os.path.join(self.path, n))
                removed.append(n)
        return removed
