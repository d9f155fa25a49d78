"""ACID-table maintenance queries: transaction-log tables (time
travel, copy-on-write MERGE, compaction), SCD2 dimension maintenance,
and incremental materialized-view refresh.

The reference engine's storage story is write-once text output
(main.c++:231-266); this module is the north-star maintenance surface
(SURVEY.md §2.3) a recurring corpus refresh needs: upsert a delta into
a 100 TB table without rewriting it, read any historical snapshot for
reproducible training runs, and keep rollup views fresh from partial
aggregates instead of full recomputes.

Cross-engine float discipline: money sums go through DECIMAL(18,2)
(order-independent) and cast to DOUBLE at the end, as everywhere else
in the registry.  The deterministic "delta" workloads are modular
(o_orderkey % k) so the DuckDB oracle reproduces the post-maintenance
state from the base table in pure SQL.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..data import table, table_fingerprint
from .inverted_index import SQL_TOKS_CTE
from ..registry import register
from ..sources.tablelog import TlogTable

D182 = "decimal(18,2)"

# deterministic maintenance workload on orders (keys are modular so the
# oracle can replay it):  v0 = base load without the %5 slice;
# v1 = MERGE upserting the %5 slice (inserts) and bumping the %7 slice
# (+100.00 updates); v2 = DELETE of the %11 slice; v3 = compaction
# (content-identical).  +100.0 is exactly representable in binary, so
# the bump is the same IEEE double on both engines.
INSERT_MOD = 5
UPDATE_MOD = 7
DELETE_MOD = 11
PRICE_BUMP = 100.0

_TLOG_DIRS: dict[tuple[str, str], str] = {}


def _bumped_price() -> F.Column:
    return F.when(
        F.col("o_orderkey") % UPDATE_MOD == 0,
        F.col("o_totalprice") + F.lit(PRICE_BUMP),
    ).otherwise(F.col("o_totalprice"))


def _tlog_base(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per process per fixture fingerprint) the
    4-commit maintenance scenario on the orders table and return the
    tlog table root."""
    fp = table_fingerprint(sf_dir, "orders")
    got = _TLOG_DIRS.get((sf_dir, fp))
    if got is not None:
        return got
    base = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_tlog_{os.getpid()}",
        sf_dir.strip("/").replace("/", "_"),
        fp,
    )
    orders = table(spark, sf_dir, "orders")
    # v0: base load minus the %5 slice, range-partitioned on the merge
    # key so the log's per-file key stats are tight and MERGE's file
    # skipping has ranges to skip (the 100 TB layout: clustered by key)
    t = TlogTable.create(
        spark,
        base,
        orders.filter(F.col("o_orderkey") % INSERT_MOD != 0)
        .repartitionByRange(4, "o_orderkey"),
        stats_cols=("o_orderkey",),
    )
    # v1: one MERGE carrying both inserts (the withheld %5 slice) and
    # updates (the %7 slice, price bumped)
    source = orders.filter(
        (F.col("o_orderkey") % INSERT_MOD == 0)
        | (F.col("o_orderkey") % UPDATE_MOD == 0)
    ).withColumn("o_totalprice", _bumped_price())
    t.merge(source, "o_orderkey", stats_cols=("o_orderkey",), cluster_files=4)
    # v2: delete the %11 slice (rewrites only files containing a match)
    t.delete_where(
        F.col("o_orderkey") % DELETE_MOD == 0,
        stats_cols=("o_orderkey",),
        cluster_files=4,
    )
    # v3: compact the merge/delete fragments (content-identical)
    t.compact(stats_cols=("o_orderkey",))
    _TLOG_DIRS[(sf_dir, fp)] = base
    return base


def _version_census(t: TlogTable, version: int) -> DataFrame:
    return (
        t.snapshot(version)
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast(D182))
            .cast("double")
            .alias("sum_price"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
        .select(F.lit(version).cast("long").alias("version"), "*")
    )


_SQL_MERGED = f"""
  SELECT o_orderkey,
         CASE WHEN o_orderkey % {UPDATE_MOD} = 0
              THEN o_totalprice + {PRICE_BUMP}
              ELSE o_totalprice END AS o_totalprice
  FROM orders
"""

_SQL_CENSUS = """
SELECT CAST({v} AS BIGINT) AS version, count(*) AS n_rows,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
FROM {src}
"""


@register(
    "table_merge_upsert",
    oracle=f"""
WITH merged AS ({_SQL_MERGED}),
final AS (SELECT * FROM merged WHERE o_orderkey % {DELETE_MOD} <> 0)
SELECT count(*) AS n_rows,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
       CAST(sum(CASE WHEN o_orderkey % {UPDATE_MOD} = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_updated
FROM final
""",
    description="ACID tlog table after MERGE upsert + DELETE: final snapshot census",
    tags=("storage", "acid", "maintenance", "cdc"),
)
def q_table_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End state of the scripted maintenance run (create -> MERGE
    upsert -> DELETE -> compact) on a transaction-log table, reduced
    to a census the oracle replays from the base table.

    Scale: MERGE is copy-on-write with footer-stats file skipping —
    only files whose o_orderkey range overlaps a source key are
    rewritten (sources/tablelog.py:merge); DELETE rewrites only files
    that contain a matching row (exact input_file_name pruning); the
    final read is a plain parquet scan of the live file set resolved
    from checkpoint + deltas, metadata-only."""
    t = TlogTable(spark, _tlog_base(spark, sf_dir))
    return t.snapshot().agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("o_totalprice").cast(D182)).cast("double").alias("sum_price"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
        F.sum(
            F.when(F.col("o_orderkey") % UPDATE_MOD == 0, 1).otherwise(0)
        ).alias("n_updated"),
    )


@register(
    "table_time_travel",
    oracle=f"""
WITH merged AS ({_SQL_MERGED}),
v0 AS (SELECT o_orderkey, o_totalprice FROM orders
       WHERE o_orderkey % {INSERT_MOD} <> 0),
v2 AS (SELECT * FROM merged WHERE o_orderkey % {DELETE_MOD} <> 0)
{_SQL_CENSUS.format(v=0, src="v0")}
UNION ALL {_SQL_CENSUS.format(v=1, src="merged")}
UNION ALL {_SQL_CENSUS.format(v=2, src="v2")}
UNION ALL {_SQL_CENSUS.format(v=3, src="v2")}
""",
    description="time travel: per-version census of all 4 tlog snapshots (v3 = compaction, content-identical to v2)",
    tags=("storage", "acid", "maintenance"),
)
def q_table_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reads every historical version of the maintenance table —
    snapshot isolation makes each version's file list immutable, so
    v0 is still exactly the base load after three later commits, and
    the compaction commit (v3) is pinned content-identical to v2.

    Scale: each snapshot resolves from the newest checkpoint <= v plus
    the delta commits after it (O(commits since checkpoint) small JSON
    reads, no directory listing); removed files stay on disk until an
    explicit vacuum, so historical reads cost nothing extra."""
    t = TlogTable(spark, _tlog_base(spark, sf_dir))
    out = _version_census(t, 0)
    for v in (1, 2, 3):
        out = out.unionByName(_version_census(t, v))
    return out


# --------------------------------------------------------------------------
# SCD2 dimension maintenance
# --------------------------------------------------------------------------


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    tracked: tuple[str, ...],
    batch_id: int,
) -> DataFrame:
    """Slowly-changing-dimension type 2: apply a change batch to a
    versioned dimension (columns: key, attributes, ``valid_from``,
    ``valid_to`` nullable, ``is_current``).

    A change row only takes effect when a tracked attribute actually
    differs from the current row (no-op churn — the bulk of a real
    change feed — produces no new version).  Affected current rows are
    closed (``valid_to = batch_id``) and a new current row opens with
    the new attribute values.

    Scale: ONE left join of current rows against the change batch on
    the dimension key (change batches are delta-sized, so AQE
    broadcasts them); history rows pass through untouched.  No window
    functions, no per-key state."""
    attrs = [c for c in dim.columns if c not in
             (key, "valid_from", "valid_to", "is_current")]
    chg = changes.select(
        F.col(key),
        F.lit(True).alias("_chg_hit"),  # NULL-safe "a change row exists"
        *[F.col(c).alias(f"_n_{c}") for c in tracked],
    )
    cur = dim.filter(F.col("is_current"))
    hist = dim.filter(~F.col("is_current"))
    j = cur.join(chg, key, "left")
    differs = F.lit(False)
    for c in tracked:
        differs = differs | ~F.col(f"_n_{c}").eqNullSafe(F.col(c))
    is_changed = F.col("_chg_hit").isNotNull() & differs
    unchanged = j.filter(~is_changed).select(*dim.columns)
    closed = j.filter(is_changed).select(
        F.col(key),
        *attrs,
        F.col("valid_from"),
        F.lit(batch_id).cast("long").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    opened = j.filter(is_changed).select(
        F.col(key),
        *[
            (F.col(f"_n_{c}") if c in tracked else F.col(c)).alias(c)
            for c in attrs
        ],
        F.lit(batch_id).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    return hist.unionByName(unchanged).unionByName(closed).unionByName(opened)


@register(
    "table_scd2_dimension",
    oracle="""
WITH chg AS (
  SELECT c_custkey FROM customer
  WHERE c_custkey % 7 = 0 AND c_mktsegment <> 'MACHINERY'
),
rows_ AS (
  SELECT c.c_mktsegment, CAST(0 AS BIGINT) AS valid_from, TRUE AS is_current
  FROM customer c
  WHERE c.c_custkey NOT IN (SELECT c_custkey FROM chg)
  UNION ALL
  SELECT c.c_mktsegment, CAST(0 AS BIGINT), FALSE
  FROM customer c JOIN chg USING (c_custkey)
  UNION ALL
  SELECT 'MACHINERY', CAST(1 AS BIGINT), TRUE FROM chg
)
SELECT is_current, c_mktsegment, count(*) AS n_rows,
       CAST(sum(valid_from) AS BIGINT) AS sum_from
FROM rows_ GROUP BY is_current, c_mktsegment
""",
    description="SCD2 dimension maintenance: segment-change batch applied to a versioned customer dim",
    tags=("relational", "maintenance", "cdc", "scd2"),
)
def q_table_scd2_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Versioned customer dimension after one change batch: every 7th
    customer moves to segment MACHINERY at batch 1.  Customers already
    in MACHINERY are the no-op-churn case the operator must NOT
    version — the oracle replays exactly that semantics.  Output is
    the (is_current, segment) census with the summed valid_from epoch
    proving which rows were opened by the batch."""
    cust = table(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        F.lit(0).cast("long").alias("valid_from"),
        F.lit(None).cast("long").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changes = cust.filter(F.col("c_custkey") % 7 == 0).select(
        "c_custkey", F.lit("MACHINERY").alias("c_mktsegment")
    )
    dim2 = scd2_apply(dim, changes, "c_custkey", ("c_mktsegment",), batch_id=1)
    return dim2.groupBy("is_current", "c_mktsegment").agg(
        F.count("*").alias("n_rows"),
        F.sum("valid_from").alias("sum_from"),
    )


# --------------------------------------------------------------------------
# incremental materialized-view refresh
# --------------------------------------------------------------------------


def _revenue_partial(orders: DataFrame, cust: DataFrame,
                     nation: DataFrame) -> DataFrame:
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast(D182)).alias("_sum_dec"),
        )
    )


@register(
    "mv_incremental_refresh",
    oracle="""
SELECT n.n_name, count(*) AS n_orders,
       CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    description="materialized view refreshed incrementally from mergeable partial aggregates == full recompute",
    tags=("relational", "agg", "maintenance", "mv"),
)
def q_mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-by-nation materialized view maintained incrementally:
    the stored MV state is the PARTIAL aggregate (count, decimal sum)
    per group, a delta batch produces the same shape, and refresh is
    re-aggregation of the two partials — never a rescan of the base
    table.  The oracle is the full recompute the incremental path must
    equal.  Here the "stored" partial covers ~2/3 of orders and the
    delta the remaining 1/3 (modular split, so the oracle is exact).

    Scale: this is the standard mergeable-state MV contract — COUNT
    and exact DECIMAL SUM are associative/commutative, so refresh cost
    is O(delta + |MV|), not O(base).  The dim joins broadcast (nation
    is constant-sized, customer SF-linear but AQE-promoted at test
    scale); the delta re-agg shuffles only MV-sized rows."""
    orders = table(spark, sf_dir, "orders")
    cust = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    base = _revenue_partial(
        orders.filter(F.col("o_orderkey") % 3 != 0), cust, nation
    )
    delta = _revenue_partial(
        orders.filter(F.col("o_orderkey") % 3 == 0), cust, nation
    )
    return (
        base.unionByName(delta)
        .groupBy("n_name")
        .agg(
            F.sum("n_orders").alias("n_orders"),
            F.sum("_sum_dec").cast("double").alias("sum_price"),
        )
    )


# --------------------------------------------------------------------------
# change feed between two table versions
# --------------------------------------------------------------------------


@register(
    "table_change_feed",
    oracle=f"""
WITH merged AS ({_SQL_MERGED}),
v0 AS (SELECT o_orderkey, o_totalprice FROM orders
       WHERE o_orderkey % {INSERT_MOD} <> 0),
v2 AS (SELECT * FROM merged WHERE o_orderkey % {DELETE_MOD} <> 0),
j AS (
  SELECT COALESCE(v0.o_orderkey, v2.o_orderkey) AS k,
         CASE WHEN v0.o_orderkey IS NULL THEN 'inserted'
              WHEN v2.o_orderkey IS NULL THEN 'deleted'
              WHEN v0.o_totalprice <> v2.o_totalprice THEN 'updated'
              ELSE 'unchanged' END AS change
  FROM v0 FULL OUTER JOIN v2 ON v0.o_orderkey = v2.o_orderkey
)
SELECT change, count(*) AS n_rows, min(k) AS min_key, max(k) AS max_key
FROM j GROUP BY change
""",
    description="tlog change feed v0 -> v2: inserted/updated/deleted/unchanged census from two snapshot reads",
    tags=("storage", "acid", "cdc", "maintenance"),
)
def q_table_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What changed between two committed versions of the maintenance
    table — the read a downstream incremental consumer (index rebuild,
    dedup refresh, MV update) runs so it reprocesses ONLY the delta.
    Computed from two time-travel snapshots with one full-outer
    equi-join on the table key (value-hash compare classifies
    inserted / updated / deleted / unchanged), then rolled up.

    Scale: both snapshot reads are metadata-planned pruned scans; the
    join co-partitions on the key.  A log-native change feed (reading
    only the add/remove files of the intervening commits) is the
    cheaper path when the versions are adjacent — the snapshot-diff
    form used here is the general one that also works across
    compactions, which rewrite files without changing rows."""
    t = TlogTable(spark, _tlog_base(spark, sf_dir))
    v0 = t.snapshot(0).select(
        "o_orderkey", F.col("o_totalprice").alias("_p0")
    )
    v2 = t.snapshot(2).select(
        "o_orderkey", F.col("o_totalprice").alias("_p2")
    )
    j = v0.join(v2, "o_orderkey", "full_outer")
    change = (
        F.when(F.col("_p0").isNull(), "inserted")
        .when(F.col("_p2").isNull(), "deleted")
        .when(F.col("_p0") != F.col("_p2"), "updated")
        .otherwise("unchanged")
    )
    return j.groupBy(change.alias("change")).agg(
        F.count("*").alias("n_rows"),
        F.min("o_orderkey").alias("min_key"),
        F.max("o_orderkey").alias("max_key"),
    )


# --------------------------------------------------------------------------
# ACID incremental inverted-index maintenance (aggregate MERGE)
# --------------------------------------------------------------------------

# delta corpus: every 17th document arrives AFTER the base index is
# built and stored; its postings must fold into the stored index
# without rebuilding it
ACID_DELTA_MOD = 17

_ACID_IDX_DIRS: dict[tuple[str, str], str] = {}


def _acid_index_base(spark: SparkSession, sf_dir: str) -> str:
    """Materialize (once per process) the stored inverted index as a
    tlog table: v0 = index over the base corpus (word-range-clustered
    so footer word stats are tight), v1 = aggregate MERGE of the delta
    corpus's index (postings array-unioned, doc_freq summed)."""
    from .inverted_index import build_index

    fp = table_fingerprint(sf_dir, "documents")
    got = _ACID_IDX_DIRS.get((sf_dir, fp))
    if got is not None:
        return got
    base = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_acididx_{os.getpid()}",
        sf_dir.strip("/").replace("/", "_"),
        fp,
    )
    docs = table(spark, sf_dir, "documents")
    base_idx = build_index(docs.filter(F.col("doc_id") % ACID_DELTA_MOD != 0))
    t = TlogTable.create(
        spark,
        base,
        base_idx.repartitionByRange(8, "word"),
        stats_cols=("word",),
    )
    delta_idx = build_index(docs.filter(F.col("doc_id") % ACID_DELTA_MOD == 0))
    t.merge(
        delta_idx,
        "word",
        stats_cols=("word",),
        cluster_files=8,
        combine={
            # base and delta posting sets are disjoint (a doc_id is in
            # exactly one corpus slice), so union+sort and summed
            # doc_freq reproduce the full-corpus index exactly
            "postings": lambda s, t_: F.array_sort(F.array_union(s, t_)),
            "doc_freq": lambda s, t_: s + t_,
        },
    )
    _ACID_IDX_DIRS[(sf_dir, fp)] = base
    return base


@register(
    "index_upsert_acid",
    oracle=f"""
{SQL_TOKS_CTE}
, dedup AS (SELECT DISTINCT word, doc_id FROM toks)
SELECT word,
   array_to_string(list(doc_id ORDER BY doc_id), ' ') AS postings,
   count(*) AS doc_freq,
   substr(word, 1, 1) AS letter
FROM dedup
GROUP BY word
""",
    description="incremental index maintenance: delta corpus aggregate-MERGEd into the ACID stored index == full rebuild",
    tags=("reference", "maintenance", "storage", "acid", "scale"),
)
def q_index_upsert_acid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The maintenance loop the reference cannot express: the
    stored inverted index lives in a transaction-log table, a
    late-arriving corpus slice is indexed ALONE (corpus cost is
    O(delta)), and one aggregate MERGE folds its postings into the
    stored index — array_union on postings, summed doc_freq —
    with copy-on-write touching only the word-range files the
    delta's vocabulary overlaps.  The oracle is the full-corpus
    index rebuild the incremental path must equal exactly.

    Scale: index(delta) is delta-sized; the MERGE join is
    vocabulary-sized (never corpus-sized); file skipping works on
    the word footer stats because v0 was written word-range-
    clustered.  Readers keep snapshot isolation: a query pinned at
    v0 serves the pre-delta index while the merge commits."""
    t = TlogTable(spark, _acid_index_base(spark, sf_dir))
    return t.snapshot().select(
        "word",
        F.concat_ws(
            " ", F.transform("postings", lambda d: d.cast("string"))
        ).alias("postings"),
        F.col("doc_freq").cast("long").alias("doc_freq"),
        "letter",
    )



# --------------------------------------------------------------------------
# deletion vectors: merge-on-read delete == copy-on-write result
# --------------------------------------------------------------------------

DV_DELETE_MOD = 3

_DV_DIRS: dict[tuple[str, str], str] = {}


def _dv_base(spark: SparkSession, sf_dir: str) -> str:
    """orders table, deleted merge-on-read (v1 = deletion vector, no
    data file touched) then folded (v2 = compact_dvs rewrites only the
    masked files)."""
    fp = table_fingerprint(sf_dir, "orders")
    got = _DV_DIRS.get((sf_dir, fp))
    if got is not None:
        return got
    base = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_tlogdv_{os.getpid()}",
        sf_dir.strip("/").replace("/", "_"),
        fp,
    )
    orders = table(spark, sf_dir, "orders")
    t = TlogTable.create(
        spark,
        base,
        orders.repartitionByRange(4, "o_orderkey"),
        stats_cols=("o_orderkey",),
    )
    t.delete_where_dv(F.col("o_orderkey") % DV_DELETE_MOD == 0)
    t.compact_dvs(stats_cols=("o_orderkey",), cluster_files=4)
    _DV_DIRS[(sf_dir, fp)] = base
    return base


_SQL_DV_CENSUS = f"""
SELECT '{{phase}}' AS phase, count(*) AS n_rows,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
       min(o_orderkey) AS min_key, max(o_orderkey) AS max_key
FROM orders WHERE o_orderkey % {DV_DELETE_MOD} <> 0
"""


@register(
    "table_delete_vectors",
    oracle=f"""
{_SQL_DV_CENSUS.format(phase="mor")}
UNION ALL {_SQL_DV_CENSUS.format(phase="folded")}
""",
    description="merge-on-read delete via deletion vectors: masked read and post-fold read both equal the SQL delete",
    tags=("storage", "acid", "maintenance", "scale"),
)
def q_table_delete_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The merge-on-read delete path (Delta deletion vectors / Iceberg
    position deletes): v1 deletes the %3 slice by writing ONLY a
    (file, row_index) sidecar — zero data files rewritten, so a
    selective delete on a 100 TB table is delete-sized, not
    rewrite-sized — and the snapshot read anti-joins the vector out at
    scan time (the DV side broadcasts; the data side never shuffles).
    v2 folds the vectors in (compact_dvs rewrites only masked files),
    ending read amplification.  Both phase censuses must equal the
    plain SQL delete — the masked read IS the deleted table, not an
    approximation of it."""
    t = TlogTable(spark, _dv_base(spark, sf_dir))

    def census(version: int, phase: str) -> DataFrame:
        return (
            t.snapshot(version)
            .agg(
                F.count("*").alias("n_rows"),
                F.sum(F.col("o_totalprice").cast(D182))
                .cast("double")
                .alias("sum_price"),
                F.min("o_orderkey").alias("min_key"),
                F.max("o_orderkey").alias("max_key"),
            )
            .select(F.lit(phase).alias("phase"), "*")
        )

    return census(1, "mor").unionByName(census(2, "folded"))


# --------------------------------------------------------------------------
# additive schema evolution
# --------------------------------------------------------------------------

_EVOLVE_DIRS: dict[tuple[str, str], str] = {}


def _evolve_base(spark: SparkSession, sf_dir: str) -> str:
    """v0 = even-key orders WITHOUT o_orderpriority; v1 = odd-key
    orders WITH it (additive evolution)."""
    fp = table_fingerprint(sf_dir, "orders")
    got = _EVOLVE_DIRS.get((sf_dir, fp))
    if got is not None:
        return got
    base = os.path.join(
        tempfile.gettempdir(),
        f"spark_graft_tlogevo_{os.getpid()}",
        sf_dir.strip("/").replace("/", "_"),
        fp,
    )
    orders = table(spark, sf_dir, "orders")
    t = TlogTable.create(
        spark,
        base,
        orders.filter(F.col("o_orderkey") % 2 == 0).select(
            "o_orderkey", "o_totalprice"
        ),
        stats_cols=("o_orderkey",),
    )
    t.append(
        orders.filter(F.col("o_orderkey") % 2 == 1).select(
            "o_orderkey", "o_totalprice", "o_orderpriority"
        ),
        stats_cols=("o_orderkey",),
        evolve_schema=True,
    )
    _EVOLVE_DIRS[(sf_dir, fp)] = base
    return base


@register(
    "table_schema_evolution",
    oracle="""
SELECT CASE WHEN o_orderkey % 2 = 0 THEN 'LEGACY' ELSE o_orderpriority END
         AS priority,
       count(*) AS n_rows,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
FROM orders GROUP BY priority
""",
    description="additive schema evolution: pre-evolution files read back null-backfilled under the widened schema",
    tags=("storage", "acid", "maintenance"),
)
def q_table_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A column added mid-table-life without rewriting history: the
    evolving append records the widened schema in its commit, the
    parquet reader resolves old files by name and null-backfills the
    new column, and a time-travel read below the evolution commit
    still sees the narrow schema (pinned in tests).  At 100 TB this is
    the difference between a metadata commit and rewriting every file
    ever written.  The census buckets pre-evolution rows as LEGACY via
    the read-time null — matching the SQL replay exactly."""
    t = TlogTable(spark, _evolve_base(spark, sf_dir))
    return (
        t.snapshot()
        .groupBy(
            F.coalesce("o_orderpriority", F.lit("LEGACY")).alias("priority")
        )
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("o_totalprice").cast(D182))
            .cast("double")
            .alias("sum_price"),
        )
    )
