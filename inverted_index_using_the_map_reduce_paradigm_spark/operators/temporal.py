"""Temporal / event-stream operators over the ``events`` table
(north-star, SURVEY.md §2.3): tumbling & sliding windows, session
windows, JSON prop extraction, as-of enrichment, and a pivot.

These are the batch forms — their output is what the Structured
Streaming variants in ``streaming/`` must converge to (same DataFrame
expressions under ``readStream``; see SURVEY.md §7 step 7), and the
batch form is what the DuckDB oracle can check.

Timestamps cross engines as ``floor(epoch)`` bigints: Spark
``unix_timestamp`` floors to seconds; DuckDB mirrors it with
``floor(epoch(ts))``.

Scale posture: every aggregation keys on (window/bucket, dimension) —
hash-partitioned, map-side partials, no driver state.  The as-of join
is the union-window form: one shuffle on user_id, no range join
(a range join's O(n*m) per key explodes at 100 TB; the running-``max``
window is linear in the sorted partition).
"""

from __future__ import annotations

import sys
from typing import TYPE_CHECKING

from pyspark import cloudpickle
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..data import table
from ..registry import register

if TYPE_CHECKING:  # pandas used only inside worker functions
    import pandas as pd

# The cogroup merge_asof worker runs in Python workers; ship this
# module's functions by value (same rationale as operators/multimodal.py).
cloudpickle.register_pickle_by_value(sys.modules[__name__])

GAP_MIN = 30  # session gap, minutes
EPOCH = "CAST(floor(epoch({c})) AS BIGINT)"


def _epoch(col) -> F.Column:
    return F.unix_timestamp(col)


@register(
    "json_extract",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
       event_type
FROM events
""",
    description="typed field extraction from the JSON props column",
    tags=("temporal", "json"),
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-row projection via ``from_json`` with an explicit schema —
    one parse per row regardless of how many fields are pulled, and
    Catalyst's JSON schema pruning drops unused fields from the parse
    itself (``get_json_object`` re-parses per extraction)."""
    ev = table(spark, sf_dir, "events")
    props = F.from_json("props", "k BIGINT")
    return ev.select(
        "event_id",
        props.getField("k").alias("k_value"),
        "event_type",
    )


@register(
    "events_window",
    oracle=(EVENTS_WINDOW_ORACLE := f"""
SELECT {EPOCH.format(c="date_trunc('hour', ts)")} AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) + 0 AS sum_value
FROM events
GROUP BY 1, 2
"""),
    description="tumbling 1-hour windows per event_type (count + sum)",
    tags=("temporal", "window"),
)
def q_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.round(F.sum("value"), 2) + F.lit(0.0)).alias("sum_value"),
        )
        .select(
            _epoch(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_sliding_window",
    oracle=f"""
WITH slid AS (
  SELECT e.*,
         CAST(floor(epoch(ts)) AS BIGINT) // 900 * 900 - k.k * 900 AS ws
  FROM events e, (SELECT unnest(generate_series(0, 3)) AS k) k
  WHERE CAST(floor(epoch(ts)) AS BIGINT) // 900 * 900 - k.k * 900
        > CAST(floor(epoch(ts)) AS BIGINT) - 3600
)
SELECT ws AS window_start, event_type,
       count(*) AS n_events,
       round(sum(value), 2) + 0 AS sum_value
FROM slid GROUP BY 1, 2
""",
    description="sliding 1-hour/15-min windows per event_type",
    tags=("temporal", "window"),
)
def q_events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``window(ts, 1h, 15m)`` explodes each event into 4 overlapping
    windows map-side (the oracle mirrors it with a generate_series
    lateral) — the aggregation still shuffles once on (window, type)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.round(F.sum("value"), 2) + F.lit(0.0)).alias("sum_value"),
        )
        .select(
            _epoch(F.col("w.start")).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@register(
    "events_sessionize",
    oracle=(EVENTS_SESSIONIZE_ORACLE := f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL {GAP_MIN} MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                   ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id,
       {EPOCH.format(c='min(ts)')} AS session_start,
       {EPOCH.format(c=f"max(ts) + INTERVAL {GAP_MIN} MINUTE")} AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) + 0 AS sum_value
FROM numbered
GROUP BY user_id, session_no
"""),
    description=f"session windows per user ({GAP_MIN}-minute inactivity gap)",
    tags=("temporal", "window", "session"),
)
def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native ``session_window`` — Spark merges overlapping [ts, ts+gap)
    intervals per user in one pass after a single shuffle on user_id.
    The oracle derives identical sessions with the lag/cumsum idiom
    (session end = last event + gap, matching session_window.end)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", f"{GAP_MIN} minutes").alias("sw"), "user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.round(F.sum("value"), 2) + F.lit(0.0)).alias("sum_value"),
        )
        .select(
            "user_id",
            _epoch(F.col("sw.start")).alias("session_start"),
            _epoch(F.col("sw.end")).alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


@register(
    "asof_enrich",
    oracle=(ASOF_ENRICH_ORACLE := f"""
WITH w AS (
  SELECT event_id, user_id, ts, event_type,
         max(CASE WHEN event_type = 'signup' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS last_signup_ts
  FROM events
)
SELECT event_id, user_id,
       {EPOCH.format(c='ts')} AS purchase_ts,
       {EPOCH.format(c='last_signup_ts')} AS last_signup_ts
FROM w WHERE event_type = 'purchase'
"""),
    description="as-of join: each purchase enriched with the latest prior signup",
    tags=("temporal", "asof"),
)
def q_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of via the union-window form: a running ``max`` of signup
    timestamps over (user_id, ts) order gives every event its most
    recent signup at-or-before — one shuffle, linear scan, no range
    join.  (``merge_asof`` in ``applyInPandas`` is the fallback when
    the two sides are separate tables; here both live in ``events``.)"""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    enriched = ev.withColumn(
        "last_signup_ts",
        F.max(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
    )
    return enriched.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        _epoch(F.col("ts")).alias("purchase_ts"),
        _epoch(F.col("last_signup_ts")).alias("last_signup_ts"),
    )


ASOF_OUT_SCHEMA = (
    "event_id long, user_id long, purchase_ts long, last_signup_ts long"
)


def _epoch_s(col: "pd.Series") -> "pd.Series":
    # robust to datetime64[us] vs [ns]; NaT -> pandas NA
    ns = col.astype("datetime64[ns]")
    out = (ns.astype("int64") // 10**9).astype("object")
    out[ns.isna()] = None
    return out


def _merge_asof_group(left: "pd.DataFrame", right: "pd.DataFrame") -> "pd.DataFrame":
    """cogroup worker: classic sorted-merge as-of within one user's
    partition (pandas.merge_asof, backward direction)."""
    import pandas as pd

    if len(left) == 0:  # signups-only user: no purchases to enrich
        return pd.DataFrame(
            {c: pd.Series(dtype="object") for c in
             ("event_id", "user_id", "purchase_ts", "last_signup_ts")}
        )
    left = left.sort_values("ts").reset_index(drop=True)
    if len(right) == 0:  # purchases with no signup history
        merged = left.assign(signup_ts=pd.NaT)
    else:
        lookup = pd.DataFrame(
            {"ts": right["ts"], "signup_ts": right["ts"]}
        ).sort_values("ts")
        merged = pd.merge_asof(left, lookup, on="ts", direction="backward")
    return pd.DataFrame(
        {
            "event_id": merged["event_id"],
            "user_id": merged["user_id"],
            "purchase_ts": _epoch_s(merged["ts"]),
            "last_signup_ts": _epoch_s(merged["signup_ts"]),
        }
    )


@register(
    "asof_enrich_cogroup",
    # same semantics as asof_enrich (tests also assert row-for-row
    # equality between the two plans), so it shares the same oracle
    oracle=ASOF_ENRICH_ORACLE,
    description="as-of join via cogroup().applyInPandas (pandas merge_asof per key)",
    bench=False,
    tags=("temporal", "asof", "udf"),
)
def q_asof_enrich_cogroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cogroup form of ``asof_enrich``: purchases and signups are
    co-shuffled on user_id and each group pair merges sorted in pandas.
    This is the shape to use when the two sides are SEPARATE tables
    (the window form needs them unioned); at 100 TB both sides shuffle
    once on the key and each group merges linearly."""
    ev = table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    signups = ev.filter(F.col("event_type") == "signup").select("user_id", "ts")
    return (
        purchases.groupBy("user_id")
        .cogroup(signups.groupBy("user_id"))
        .applyInPandas(_merge_asof_group, schema=ASOF_OUT_SCHEMA)
    )


@register(
    "event_type_stats",
    oracle="""
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS median_value,
       round(quantile_cont(value, 0.9), 6) AS p90_value,
       arg_max(event_id, value) AS top_event,
       count(DISTINCT user_id) AS n_users
FROM events GROUP BY event_type
""",
    description="advanced aggregates: exact percentiles, arg-max, distinct count",
    tags=("temporal", "agg"),
)
def q_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (sort-based within each group —
    at 100 TB swap for ``approx_percentile`` t-digests, which aggregate
    partially map-side), ``max_by`` (one-pass argmax, no self-join),
    and a distinct count, all in one hash aggregation."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("median_value"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90_value"),
        F.expr("max_by(event_id, value)").alias("top_event"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "event_type_sketches",
    oracle=None,  # sketches are engine-specific by construction; the
    # test asserts each estimate within tolerance of the exact value.
    description="sketch aggregates: HLL++ distinct users + t-digest-style percentile",
    tags=("temporal", "agg", "sketch"),
)
def q_event_type_sketches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch forms of the ``event_type_stats`` aggregates: HLL++
    (``approx_count_distinct``) and quantile summaries
    (``approx_percentile``).  Both aggregate partially map-side in
    constant memory and merge associatively — at 100 TB these replace
    their exact counterparts, whose memory is O(group cardinality)
    (countDistinct) or needs a per-group sort (percentile)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
        F.round(F.expr("approx_percentile(value, 0.5, 10000)"), 6).alias(
            "approx_median"
        ),
        F.count("*").alias("n_events"),
    )


@register(
    "event_type_pivot",
    oracle="""
SELECT user_id % 10 AS user_bucket,
       count(*) FILTER (event_type = 'click') AS click,
       count(*) FILTER (event_type = 'error') AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup') AS signup,
       count(*) FILTER (event_type = 'view') AS view
FROM events GROUP BY 1
""",
    description="pivot: event-type counts per user bucket",
    tags=("temporal", "pivot"),
)
def q_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``pivot`` with an explicit value list compiles to conditional
    aggregates (same plan as the oracle's FILTER clauses) — one shuffle;
    never use the value-discovering form at scale (extra pass)."""
    ev = table(spark, sf_dir, "events")
    return (
        ev.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .count()
        .na.fill(0)
    )


@register(
    "events_gapfill",
    oracle="""
WITH bounds AS (
  SELECT date_trunc('hour', min(ts)) AS lo, date_trunc('hour', max(ts)) AS hi
  FROM events
), hours AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
), types AS (
  SELECT DISTINCT event_type FROM events
), grid AS (
  SELECT t.event_type, h.hour FROM hours h CROSS JOIN types t
), actual AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         count(*) AS n, round(sum(value), 4) AS total
  FROM events GROUP BY event_type, date_trunc('hour', ts)
)
SELECT g.event_type,
       CAST(floor(epoch(g.hour)) AS BIGINT) AS hour,
       coalesce(a.n, 0) AS n,
       coalesce(a.total, 0.0) AS total
FROM grid g LEFT JOIN actual a
  ON g.event_type = a.event_type AND g.hour = a.hour
""",
    description="time-series gap filling: dense hourly grid, zeros for missing hours",
    tags=("temporal", "window", "gapfill"),
)
def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense-grid densification — every (event_type, hour) cell exists
    even when no event landed in it, the precondition for rolling
    windows and charting.  The grid is sequence()-generated from the
    global [min, max] hour bounds (a one-row aggregate, broadcast);
    the left join against hourly counts is the only shuffle.  Grid
    cardinality is hours x types — tiny relative to the events
    themselves at any scale."""
    ev = table(spark, sf_dir, "events")
    actual = (
        ev.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total"))
    )
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    hours = bounds.select(
        F.explode(
            F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour")
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(hours))
    return (
        grid.join(actual, ["event_type", "hour"], "left")
        .select(
            "event_type",
            F.unix_timestamp("hour").alias("hour"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.coalesce("total", F.lit(0.0)).alias("total"),
        )
    )


@register(
    "events_rolling_avg",
    oracle="""
SELECT event_id, user_id,
       CAST(floor(epoch(ts)) AS BIGINT) AS ts,
       round(avg(value) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       ), 4) AS rolling_avg_1h,
       count(*) OVER (
         PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW
       ) AS n_events_1h
FROM events
""",
    description="per-user 1h trailing average via RANGE window frame",
    tags=("temporal", "window"),
)
def q_events_rolling_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True time-based frame (RANGE on epoch seconds), not a row-count
    frame: each event averages every event of the same user in the
    trailing hour, however many there were.  One shuffle on user_id;
    within a partition the frame is a sliding two-pointer pass over
    the sorted run."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-3600, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.unix_timestamp("ts").alias("ts"),
        F.round(F.avg("value").over(w), 4).alias("rolling_avg_1h"),
        F.count("*").over(w).alias("n_events_1h"),
    )


@register(
    "signup_purchase_full_outer",
    oracle="""
WITH s AS (
  SELECT date_trunc('day', ts) AS day, count(*) AS n_signups
  FROM events WHERE event_type = 'signup' GROUP BY 1
), p AS (
  SELECT date_trunc('day', ts) AS day, count(*) AS n_purchases
  FROM events WHERE event_type = 'purchase' GROUP BY 1
)
SELECT CAST(floor(epoch(coalesce(s.day, p.day))) AS BIGINT) AS day,
       coalesce(s.n_signups, 0) AS n_signups,
       coalesce(p.n_purchases, 0) AS n_purchases
FROM s FULL OUTER JOIN p ON s.day = p.day
""",
    description="FULL OUTER join of daily signup and purchase counts",
    tags=("temporal", "join"),
)
def q_signup_purchase_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer completeness: days with only signups and days with
    only purchases both survive, zeros filled.  Both inputs are already
    aggregated to day grain before the join, so the outer join touches
    two tiny relations regardless of event volume."""
    ev = table(spark, sf_dir, "events")

    def daily(etype: str, out: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy(F.date_trunc("day", "ts").alias("day"))
            .agg(F.count("*").alias(out))
        )

    s = daily("signup", "n_signups")
    p = daily("purchase", "n_purchases")
    return (
        s.join(p, "day", "full_outer")
        .select(
            F.unix_timestamp("day").alias("day"),
            F.coalesce("n_signups", F.lit(0)).alias("n_signups"),
            F.coalesce("n_purchases", F.lit(0)).alias("n_purchases"),
        )
    )


@register(
    "range_join_bucketed",
    oracle=f"""
SELECT p.event_id,
       (SELECT count(*) FROM events c
        WHERE c.event_type = 'click'
          AND c.ts >= p.ts - INTERVAL 15 MINUTE AND c.ts < p.ts) AS n_recent_clicks
FROM events p WHERE p.event_type = 'purchase'
""",
    description="range join via time-bucket banding: clicks in the 15 min before each purchase",
    tags=("temporal", "join", "scale"),
)
def q_range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The bucketed range join — the scale answer to a non-equi time
    interval join that Spark would otherwise plan as a broadcast
    NESTED LOOP (O(n*m) comparisons).  Both sides are bucketed into
    window-width time bands; a click at bucket b can only precede a
    purchase in buckets b or b+1, so the purchase side explodes into
    exactly 2 candidate buckets and the join becomes a hash EQUI-join
    on the band with the exact [ts-15min, ts) predicate as a residual.
    Candidates per row are bounded by 2 buckets' worth of clicks —
    linear in data, not quadratic.  (This is what a range-join hint
    does in engines that have one; plan-pinned hash join, no BNLJ.)

    A left join + count of matches keeps zero-click purchases in the
    result, mirroring the oracle's scalar-subquery count semantics.
    The comparison runs in exact microseconds (the fixture timestamps
    are sub-second), bit-equal to the oracle's interval arithmetic.
    """
    width = 900 * 1_000_000  # 15 min in microseconds == the range width
    ev = table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.unix_micros(F.col("ts")).alias("c_ts")
    ).withColumn("bucket", F.floor(F.col("c_ts") / width))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", F.unix_micros(F.col("ts")).alias("p_ts")
    )
    cand = purchases.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.floor(F.col("p_ts") / width) - 1,
                F.floor(F.col("p_ts") / width),
            )
        ),
    )
    joined = cand.join(
        clicks,
        (cand["bucket"] == clicks["bucket"])
        & (F.col("c_ts") >= F.col("p_ts") - width)
        & (F.col("c_ts") < F.col("p_ts")),
        "left",
    )
    return joined.groupBy("event_id").agg(
        F.count("c_ts").alias("n_recent_clicks")
    )


@register(
    "events_funnel",
    oracle="""
WITH e1 AS (
  SELECT user_id, event_id, ts, event_type,
         min(CASE WHEN event_type = 'signup' THEN ts END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS sig_before
  FROM events
), e2 AS (
  SELECT *, min(CASE WHEN event_type = 'click' AND sig_before IS NOT NULL THEN ts END)
              OVER (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS click_before
  FROM e1
)
SELECT count(DISTINCT CASE WHEN event_type = 'signup' THEN user_id END) AS n_signup,
       count(DISTINCT CASE WHEN event_type = 'click' AND sig_before IS NOT NULL
                      THEN user_id END) AS n_click_after_signup,
       count(DISTINCT CASE WHEN event_type = 'purchase' AND click_before IS NOT NULL
                      THEN user_id END) AS n_purchase_path
FROM e2
""",
    description="ordered conversion funnel signup->click->purchase via layered windows",
    tags=("temporal", "window", "agg"),
)
def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel WITHOUT self-joins: stage N's
    qualification is a running conditional ``min`` over the user's
    event sequence (strictly-before frame), layered once per stage —
    both window layers share partitionBy(user_id) so the whole funnel
    costs ONE shuffle regardless of stage count, where the textbook
    N-way self-join costs N fact shuffles and explodes on power
    users."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    e1 = ev.withColumn(
        "sig_before",
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).over(w),
    )
    e2 = e1.withColumn(
        "click_before",
        F.min(
            F.when(
                (F.col("event_type") == "click") & F.col("sig_before").isNotNull(),
                F.col("ts"),
            )
        ).over(w),
    )
    return e2.agg(
        F.countDistinct(
            F.when(F.col("event_type") == "signup", F.col("user_id"))
        ).alias("n_signup"),
        F.countDistinct(
            F.when(
                (F.col("event_type") == "click") & F.col("sig_before").isNotNull(),
                F.col("user_id"),
            )
        ).alias("n_click_after_signup"),
        F.countDistinct(
            F.when(
                (F.col("event_type") == "purchase")
                & F.col("click_before").isNotNull(),
                F.col("user_id"),
            )
        ).alias("n_purchase_path"),
    )


WEEK_US = 7 * 24 * 3600 * 1_000_000


@register(
    "user_retention",
    oracle=f"""
WITH first_signup AS (
  SELECT user_id, min(ts) AS s_ts FROM events
  WHERE event_type = 'signup' GROUP BY user_id
)
SELECT CAST(epoch_us(f.s_ts) // {WEEK_US} AS BIGINT) AS cohort_week,
       CAST((epoch_us(e.ts) - epoch_us(f.s_ts)) // {WEEK_US} AS BIGINT) AS week_offset,
       count(DISTINCT e.user_id) AS users
FROM events e JOIN first_signup f USING (user_id)
WHERE e.ts >= f.s_ts
GROUP BY cohort_week, week_offset
""",
    description="weekly cohort retention matrix: signup cohort x activity-week offset",
    tags=("temporal", "agg", "join"),
)
def q_user_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cohort retention matrix in two user-keyed hash steps: first
    signup per user (aggregate), then activity joined back on user_id
    — both shuffles key on user_id, so AQE lines them up and the
    cohort/offset aggregation output is matrix-sized (weeks x weeks),
    tiny at any scale.  Week arithmetic is integer microsecond floor
    division on both engines — no float weeks, no timezone traps."""
    ev = table(spark, sf_dir, "events")
    first = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("s_ts"))
        .withColumn("s_us", F.unix_micros("s_ts"))
    )
    return (
        ev.join(first, "user_id")
        .filter(F.col("ts") >= F.col("s_ts"))
        .withColumn("cohort_week", F.expr(f"s_us div {WEEK_US}"))
        .withColumn(
            "week_offset", F.expr(f"(unix_micros(ts) - s_us) div {WEEK_US}")
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("users"))
    )


@register(
    "events_anomaly",
    oracle="""
WITH per AS (
  SELECT event_type, round(quantile_cont(value, 0.99), 6) AS p99
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, round(e.value, 6) AS value
FROM events e JOIN per USING (event_type)
WHERE e.value > p99
""",
    description="per-type outlier detection: events above the exact p99 of their type",
    tags=("temporal", "agg", "join"),
)
def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold anomaly detection with a cross-engine-deterministic
    statistic: exact percentiles are selection+interpolation (addition-
    order independent), unlike mean/std whose float summation order
    differs between engines.  The per-type thresholds are a 5-row
    aggregate broadcast back over the stream — the same topology
    serves a z-score or MAD variant.  At 100 TB swap the exact
    percentile for approx_percentile (t-digest sketch): same plan, the
    aggregate state becomes bounded."""
    ev = table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99")
    )
    return (
        ev.join(F.broadcast(per), "event_type")
        .filter(F.col("value") > F.col("p99"))
        .select("event_id", "event_type", F.round("value", 6).alias("value"))
    )


# --------------------------------------------------------------------------
# value_histogram — equal-width binning of a measure column
# --------------------------------------------------------------------------

HIST_BINS = 20


@register(
    "value_histogram",
    oracle=f"""
WITH s AS (
  SELECT min(value) AS mn, max(value) AS mx FROM events
), b AS (
  SELECT least(CAST(floor((value - mn) / ((mx - mn) / {HIST_BINS}))
               AS BIGINT), {HIST_BINS - 1}) AS bin,
         value, mn, mx
  FROM events CROSS JOIN s
  WHERE mx > mn
)
SELECT bin,
       round(min(mn) + bin * (min(mx) - min(mn)) / {HIST_BINS}, 4) AS bin_lo,
       count(*) AS n_events,
       round(sum(value), 2) + 0 AS sum_value
FROM b GROUP BY bin
""",
    description=f"equal-width {HIST_BINS}-bin histogram of events.value",
    tags=("temporal", "agg", "profile"),
)
def q_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution profiling without quantile state: global min/max in
    one scan-free-sized aggregate, then every row maps to a bin in a
    pure projection.  The complement to ``event_type_sketches``
    (t-digest percentiles): a histogram is mergeable, exact, and
    renders directly.

    100 TB shape: the stats row broadcasts; the bin id is computed
    row-local, so the only corpus-keyed exchange is the final
    ``HIST_BINS``-group rollup whose output size is the bin count.  Two
    scans of one column (stats + binning) — at scale, persist the stats
    or use sketch bounds to make it one.
    """
    ev = table(spark, sf_dir, "events")
    s = ev.agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
    step = (F.col("mx") - F.col("mn")) / HIST_BINS
    binned = (
        ev.crossJoin(F.broadcast(s))
        .filter(F.col("mx") > F.col("mn"))
        .select(
            F.least(
                F.floor((F.col("value") - F.col("mn")) / step).cast("long"),
                F.lit(HIST_BINS - 1),
            ).alias("bin"),
            "value",
            "mn",
            "mx",
        )
    )
    return binned.groupBy("bin").agg(
        F.round(
            F.min("mn") + F.col("bin") * (F.min("mx") - F.min("mn")) / HIST_BINS, 4
        ).alias("bin_lo"),
        F.count("*").alias("n_events"),
        (F.round(F.sum("value"), 2) + F.lit(0.0)).alias("sum_value"),
    )


# --------------------------------------------------------------------------
# event_transitions — per-user Markov transition matrix over event types
# --------------------------------------------------------------------------


@register(
    "event_transitions",
    oracle="""
WITH o AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type AS prev_type, next_type,
       count(*) AS n,
       round(count(*) / CAST(SUM(count(*)) OVER (PARTITION BY event_type)
                             AS DOUBLE), 6) + 0 AS prob
FROM o WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
""",
    description="per-user event-type Markov transitions: counts + row-normalized probabilities",
    tags=("temporal", "window", "sequence"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The behavioral transition matrix (what follows what, per user
    stream) — the sequence-model counterpart of the funnel: ``lead``
    over each user's time-ordered events pairs every event with its
    successor (event_id breaks timestamp ties deterministically), then
    one aggregation yields counts and the row-normalized transition
    probabilities a Markov model trains on.

    Scale: ONE shuffle on user_id for the lead window (user streams
    are the natural partition; a bot user's giant stream is bounded by
    the watermark horizon in the streaming form), then an aggregation
    whose output is |event_types|^2 rows — tiny at any corpus size;
    the normalizing row-sum rides a window over that tiny table."""
    ev = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    o = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counts = o.groupBy(
        F.col("event_type").alias("prev_type"), "next_type"
    ).agg(F.count("*").alias("n"))
    w_row = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        (F.round(F.col("n") / F.sum("n").over(w_row), 6) + F.lit(0.0)).alias(
            "prob"
        ),
    )


# --------------------------------------------------------------------------
# time_decay_score — exponentially decayed engagement per user
# --------------------------------------------------------------------------

DECAY_TAU_S = 86_400  # e-folding time: 1 day


@register(
    "time_decay_score",
    oracle=f"""
WITH ref AS (
  SELECT {EPOCH.format(c='max(ts)')} AS ref_s FROM events
)
SELECT user_id,
       count(*) AS n_events,
       round(sum(value * exp(-(ref.ref_s - {EPOCH.format(c='ts')}) / (1.0 * {DECAY_TAU_S}))), 4) + 0
         AS decayed_value,
       round(max(value * exp(-(ref.ref_s - {EPOCH.format(c='ts')}) / (1.0 * {DECAY_TAU_S}))), 4) + 0
         AS top_decayed
FROM events CROSS JOIN ref
GROUP BY user_id
""",
    description="per-user exponentially time-decayed engagement score (1-day e-folding)",
    tags=("temporal", "agg", "decay"),
)
def q_time_decay_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recency-weighted engagement — the freshness signal a training-
    data pipeline uses to weight recent interactions: every event's
    value decays by exp(-age/tau) measured from the corpus's newest
    event, summed per user.  Ages are INTEGER seconds on both engines,
    so exp() sees bit-identical inputs and the rounded sums hash-match.

    100 TB shape: the reference instant is a 1-row global aggregate
    broadcast back via cross join (no driver round-trip, same pattern
    as tf_idf's corpus size N); the weighted sum is then ONE
    partial-aggregated hash shuffle on user_id.  Decay weighting
    composes with any windowed variant (weight inside the window
    frame), but the plain per-key form needs no window at all."""
    ev = table(spark, sf_dir, "events")
    ref = ev.agg(_epoch(F.max("ts")).alias("ref_s"))
    age_s = F.col("ref_s") - _epoch(F.col("ts"))
    decayed = F.col("value") * F.exp(-age_s / F.lit(float(DECAY_TAU_S)))
    return (
        ev.crossJoin(F.broadcast(ref))
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            (F.round(F.sum(decayed), 4) + F.lit(0.0)).alias("decayed_value"),
            (F.round(F.max(decayed), 4) + F.lit(0.0)).alias("top_decayed"),
        )
    )


# --------------------------------------------------------------------------
# session_paths — frequent event-type sequences per session
# --------------------------------------------------------------------------

PATH_MAX_STEPS = 5
PATH_TOP = 10


@register(
    "session_paths",
    oracle=f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   > INTERVAL {GAP_MIN} MINUTE
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
), paths AS (
  SELECT user_id,
         array_to_string(
           list_slice(list(event_type ORDER BY ts, event_id),
                      1, {PATH_MAX_STEPS}), '>') AS path
  FROM numbered GROUP BY user_id, session_no
)
SELECT path, count(*) AS n_sessions, count(DISTINCT user_id) AS n_users
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT {PATH_TOP}
""",
    description=f"top-{PATH_TOP} session event-type paths (first {PATH_MAX_STEPS} steps, {GAP_MIN}-min sessions)",
    tags=("temporal", "session", "sequence"),
)
def q_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence mining lite — which event-type journeys do sessions
    actually take?  Sessions use the same {GAP_MIN}-minute inactivity
    gap as events_sessionize; each session's path is its first
    {PATH_MAX_STEPS} event types in (ts, event_id) order, and the
    result is the top-{PATH_TOP} paths with session and distinct-user
    counts.

    100 TB shape (r14, VERDICT r13 item 8 — guide §5, smaller per-group
    state): ONE corpus shuffle (user_id), then sessionization is pure
    STREAMING window work — lag flags a gap, a running sum numbers the
    sessions, row_number caps each session at {PATH_MAX_STEPS} rows
    BEFORE anything is buffered.  The previous ``session_window`` +
    ``collect_list(struct)`` shape held every event of a session in the
    object-agg buffer and sliced afterwards — unbounded state under a
    no-gap hot key (a bot session never closes) and the repo's worst
    measured slow-phase amplifier (41.9 s stall vs 0.58 s median, r13).
    Now the aggregate buffers at most {PATH_MAX_STEPS} (rank, type)
    structs per session, the windows stream, and the only remaining
    per-group state is O(1).  The path rollup shuffles session-count
    rows, then TakeOrdered replaces a global sort for the
    top-{PATH_TOP}.  (events_sessionize remains the native
    ``session_window`` demonstration.)"""
    ev = table(spark, sf_dir, "events")
    w_user = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(w_user)
    new_session = F.when(
        prev_ts.isNull()
        | (F.col("ts") > prev_ts + F.expr(f"INTERVAL {GAP_MIN} MINUTES")),
        1,
    ).otherwise(0)
    flagged = ev.select(
        "user_id", "ts", "event_id", "event_type", new_session.alias("new_session")
    )
    numbered = flagged.select(
        "user_id",
        "ts",
        "event_id",
        "event_type",
        F.sum("new_session")
        .over(w_user.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_no"),
    )
    w_sess = Window.partitionBy("user_id", "session_no").orderBy("ts", "event_id")
    first_steps = numbered.withColumn(
        "rn", F.row_number().over(w_sess)
    ).filter(F.col("rn") <= PATH_MAX_STEPS)
    path = F.concat_ws(
        ">",
        F.transform(
            F.array_sort(F.collect_list(F.struct("rn", "event_type"))),
            lambda r: r.event_type,
        ),
    )
    sessions = first_steps.groupBy("user_id", "session_no").agg(path.alias("path"))
    return (
        sessions.groupBy("path")
        .agg(
            F.count("*").alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(PATH_TOP)
    )


# --------------------------------------------------------------------------
# winsorized_stats — tail-robust per-type statistics
# --------------------------------------------------------------------------

WINSOR_LO = 0.05
WINSOR_HI = 0.95


@register(
    "winsorized_stats",
    oracle=f"""
WITH cuts AS (
  SELECT event_type,
         quantile_cont(value, {WINSOR_LO}) AS lo,
         quantile_cont(value, {WINSOR_HI}) AS hi
  FROM events GROUP BY event_type
)
SELECT e.event_type,
       count(*) AS n_events,
       round(avg(e.value), 4) + 0 AS raw_avg,
       round(avg(least(greatest(e.value, c.lo), c.hi)), 4) + 0 AS winsor_avg,
       round(c.lo, 4) + 0 AS p05,
       round(c.hi, 4) + 0 AS p95
FROM events e JOIN cuts c USING (event_type)
GROUP BY e.event_type, c.lo, c.hi
""",
    description="tail-robust per-type stats: mean before/after p05-p95 winsorization",
    tags=("temporal", "agg", "quality"),
)
def q_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier-robust aggregate screening: clip each type's values to
    its own [p05, p95] and compare the winsorized mean to the raw one —
    a large gap flags a metric whose average is tail-driven (the same
    screen a reward/quality pipeline runs before trusting a mean).

    100 TB shape: the cut points are a per-type aggregate (group count
    rows) joined back via BROADCAST, then one partial-aggregated
    shuffle on event_type.  Exact percentiles sort within each group —
    at scale swap for approx_percentile's t-digest (sketch-mergeable,
    map-side partials), same contract as event_type_stats."""
    ev = table(spark, sf_dir, "events")
    cuts = ev.groupBy("event_type").agg(
        F.expr(f"percentile(value, {WINSOR_LO})").alias("lo"),
        F.expr(f"percentile(value, {WINSOR_HI})").alias("hi"),
    )
    clipped = F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
    return (
        ev.join(F.broadcast(cuts), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            (F.round(F.avg("value"), 4) + F.lit(0.0)).alias("raw_avg"),
            (F.round(F.avg(clipped), 4) + F.lit(0.0)).alias("winsor_avg"),
            (F.round(F.first("lo"), 4) + F.lit(0.0)).alias("p05"),
            (F.round(F.first("hi"), 4) + F.lit(0.0)).alias("p95"),
        )
    )


# --------------------------------------------------------------------------
# hll_union_rollup — re-aggregatable distinct-count sketches
# --------------------------------------------------------------------------


@register(
    "hll_union_rollup",
    oracle=None,  # sketch binaries are engine-specific; the tolerance
    # test checks the merged estimate against the exact distinct count
    # and the structural guarantee merged <= sum-of-daily.
    description="DataSketches HLL per (type, day), unioned to per-type distincts (mergeable rollup)",
    tags=("temporal", "agg", "sketch", "scale"),
)
def q_hll_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE pre-aggregation pattern for distinct counts at 100 TB:
    distinct users per (event_type, day) materialize once as
    DataSketches HLL binaries, and any coarser rollup (here: per type
    across all days) UNIONS the stored sketches instead of rescanning
    the raw corpus — distinct counts don't sum (a user active on two
    days is one user), but sketches merge losslessly.  ``sum_daily``
    is the naive sum kept to show the overcount the union removes.

    Scale shape: stage 1 is one partial-aggregated shuffle on the fine
    key (sketch state is constant-size per group, merged map-side);
    stage 2 shuffles only group-count rows of sketch binaries.  In a
    stored pipeline, stage 1's output IS the daily cube table and this
    query reads only that."""
    ev = table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.approx_count_distinct("user_id").alias("daily_users"),
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.count("*").alias("n_days"),
            F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
            F.sum("daily_users").alias("sum_daily"),
        )
    )


# --------------------------------------------------------------------------
# VARIANT semi-structured path (r10, Spark 4): raw JSON log lines ->
# parse_json -> typed variant_get extraction.  At 100 TB the VARIANT
# binary encoding is the semi-structured fast path: one parse per row
# into a shreddable binary column instead of N string re-parses per
# extracted field (get_json_object re-walks the text per call).  The
# synthesized line nests the real ``props`` JSON verbatim, so the
# extraction exercises genuine nested-path traversal — and the oracle
# recomputes every aggregate from the TYPED source columns, making the
# whole stringify -> parse -> variant -> extract loop hash-pinned.
# --------------------------------------------------------------------------


@register(
    "variant_shred",
    oracle="""
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_sum,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents_sum,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
""",
    description=(
        "VARIANT ingestion: raw JSON log lines parse_json'd once, typed"
        " variant_get extraction incl. a nested path, agg per type"
    ),
    tags=("temporal", "json", "variant"),
)
def q_variant_shred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rebuilds each event as the raw JSON log line an ingest pipeline
    would receive (``{"user":…,"type":…,"value":…,"payload":{…}}``
    with the real ``props`` object spliced in verbatim), parses it
    ONCE into a Spark 4 ``VARIANT`` column, then extracts four typed
    fields via ``variant_get`` paths — including the nested
    ``$.payload.k`` — and aggregates per event type.  The oracle
    recomputes everything from the typed source columns, so a defect
    anywhere in the stringify/parse/shred/extract loop (quoting, path
    traversal, type coercion) breaks the driver hash.  All expressions
    are JVM-side Catalyst — no Python in the plan; VARIANT parse cost
    is one pass per row vs one pass per FIELD for repeated
    get_json_object, the difference that matters on 100 TB of logs."""
    ev = table(spark, sf_dir, "events")
    line = F.concat(
        F.lit('{"user":'), F.col("user_id").cast("string"),
        F.lit(',"type":"'), F.col("event_type"),
        F.lit('","value":'), F.col("value").cast("string"),
        F.lit(',"payload":'), F.col("props"), F.lit("}"),
    )
    v = ev.select(F.parse_json(line).alias("v"))
    typed = v.select(
        F.variant_get("v", "$.type", "string").alias("event_type"),
        F.variant_get("v", "$.user", "bigint").alias("user_id"),
        F.variant_get("v", "$.payload.k", "bigint").alias("k"),
        F.variant_get("v", "$.value", "double").alias("value"),
    )
    return typed.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum("k").alias("k_sum"),
        F.sum(F.round(F.col("value") * 100).cast("bigint")).alias("cents_sum"),
        F.countDistinct("user_id").alias("n_users"),
    )
