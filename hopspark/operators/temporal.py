"""Temporal join operators over the events table: as-of join and
bounded-range join.

The reference engine has no dedicated temporal-join operator (joins are
hash/nested-loop only — be/src/exec/partitioned-hash-join-node.h,
nested-loop-join-node.h), so Impala users express these as correlated
subqueries or inequality joins that degrade to nested loops.  Spark also
lacks a native as-of join; these implement both patterns Spark-first, with
plans that stay shuffle-bounded at 100 TB:

* **As-of join** (`asof_join_attribution`): "for each purchase, the most
  recent click by the same user at-or-before the purchase" — the classic
  attribution query, and the canonical as-of shape (kdb's `aj`, pandas
  `merge_asof`).  Instead of a per-pair inequality join (O(n·m) within a
  user) we union the two tagged event streams and take a running
  `last(click, ignorenulls)` over a (user, time) window — a *merge* as-of
  join: one shuffle on user_id, one per-user sort, zero join fanout.
  Ties at equal timestamps resolve to the highest click event_id, pinned
  by the window ordering (ts, tag, event_id).

* **Range join** (`range_join_error_context`): "clicks by the same user in
  the 10 minutes before each error".  A naive user-only equi-join fans out
  to every (error, click) pair per user before filtering; instead both
  sides are binned to 10-minute epoch buckets and errors probe only their
  own and the preceding bucket (ε-join binning) — join fanout is bounded
  by per-bucket density, not per-user history length, which is what
  survives a 100× scale-up on a years-long event log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from hopspark.catalog import read_table

RANGE_WINDOW_US = 600_000_000  # 10 minutes in microseconds


def asof_join_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-based as-of join: latest click at-or-before each purchase,
    per user; purchases with no prior click keep NULL click columns."""
    ev = read_table(spark, "events", sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        "ts",
        F.col("event_id"),
        F.lit(0).alias("tag"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id"), F.lit(1).alias("tag")
    )
    # Clicks sort ahead of purchases at the same timestamp (tag 0 < 1), so
    # an equal-ts click is visible to the purchase — ts_click <= ts_purchase
    # semantics.  Among equal-ts clicks the last by event_id wins.
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "tag", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    last_click = F.last(
        F.when(F.col("tag") == 0, F.struct("ts", "event_id")), ignorenulls=True
    ).over(w)
    return (
        clicks.unionByName(purchases)
        .withColumn("lc", last_click)
        .filter(F.col("tag") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("lc.event_id").alias("click_id"),
            F.col("lc.ts").alias("click_ts"),
            (F.unix_micros("ts") - F.unix_micros("lc.ts")).alias("lag_us"),
        )
        .orderBy("purchase_id")
    )


ASOF_JOIN_ATTRIBUTION_SQL = """
SELECT p.event_id AS purchase_id,
       p.user_id,
       p.ts AS purchase_ts,
       c.click_id,
       c.click_ts,
       epoch_us(p.ts) - epoch_us(c.click_ts) AS lag_us
FROM events p
LEFT JOIN LATERAL (
    SELECT e.event_id AS click_id, e.ts AS click_ts
    FROM events e
    WHERE e.event_type = 'click'
      AND e.user_id = p.user_id
      AND e.ts <= p.ts
    ORDER BY e.ts DESC, e.event_id DESC
    LIMIT 1
) c ON TRUE
WHERE p.event_type = 'purchase'
ORDER BY purchase_id
"""


def range_join_error_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ε-range join: per error event, how many clicks the same
    user made in the strict 10 minutes before it ([ts-10m, ts))."""
    ev = read_table(spark, "events", sf_dir)
    bucket = (F.unix_micros("ts") / F.lit(RANGE_WINDOW_US)).cast("long")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("click_ts"),
        bucket.alias("bkt"),
    )
    errors = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_id"),
        "user_id",
        F.col("ts").alias("error_ts"),
        # An in-range click is at most one 10-minute bucket behind.
        F.explode(F.array(bucket - 1, bucket)).alias("bkt"),
    )
    lo = F.unix_micros("error_ts") - F.lit(RANGE_WINDOW_US)
    in_range = (F.unix_micros("click_ts") >= lo) & (
        F.unix_micros("click_ts") < F.unix_micros("error_ts")
    )
    return (
        errors.join(clicks, ["user_id", "bkt"], "left")
        .groupBy("error_id", "user_id")
        .agg(
            F.sum(
                F.when(F.col("click_ts").isNotNull() & in_range, 1).otherwise(0)
            ).alias("n_clicks_10m")
        )
        .orderBy("error_id")
    )


RANGE_JOIN_ERROR_CONTEXT_SQL = """
SELECT e.event_id AS error_id,
       e.user_id,
       COUNT(c.event_id) AS n_clicks_10m
FROM events e
LEFT JOIN events c
  ON c.user_id = e.user_id
 AND c.event_type = 'click'
 AND c.ts >= e.ts - INTERVAL 10 MINUTE
 AND c.ts < e.ts
WHERE e.event_type = 'error'
GROUP BY e.event_id, e.user_id
ORDER BY error_id
"""





def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix: users are cohorted by the week of
    their first event; each later active week counts toward
    (cohort_week, week_offset).  The standard growth-analytics rollup.

    Scale shape: one groupBy(user) for cohort assignment (compact
    (user, week) rows), activity deduplicated to (user, week) before the
    join — both sides shuffle on user_id once and the retention matrix
    itself is tiny (weeks x offsets)."""
    ev = read_table(spark, "events", sf_dir)
    week = F.date_trunc("week", "ts")
    cohorts = (
        ev.select("user_id", week.alias("w"))
        .groupBy("user_id")
        .agg(F.min("w").alias("cohort_week"))
    )
    activity = ev.select("user_id", week.alias("active_week")).distinct()
    return (
        activity.join(cohorts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
            ).cast("int").alias("week_offset"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


EVENTS_COHORT_RETENTION_SQL = """
WITH w AS (
  -- CAST back to TIMESTAMP: DuckDB date_trunc('week') yields DATE while
  -- Spark yields TIMESTAMP; pinning both sides to TIMESTAMP keeps the
  -- compare stable whether the harness fetches tuples or pandas frames.
  SELECT user_id,
         CAST(date_trunc('week', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS wk
  FROM events
),
cohorts AS (SELECT user_id, MIN(wk) AS cohort_week FROM w GROUP BY user_id),
activity AS (SELECT DISTINCT user_id, wk AS active_week FROM w)
SELECT c.cohort_week,
       CAST(date_diff('day', c.cohort_week, a.active_week) / 7 AS INT)
         AS week_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM activity a JOIN cohorts c ON c.user_id = a.user_id
GROUP BY 1, 2 ORDER BY 1, 2
"""


# --- hourly volume anomalies (z-score over per-type hourly counts) ----------


def events_hourly_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hours whose event volume is > 2 sample standard deviations above the
    event type's hourly mean — the monitoring query every streaming ingest
    runs in batch form.

    Determinism across engines: the variance numerator c·Σn² − (Σn)² is
    computed in exact BIGINT arithmetic and converted to DOUBLE with ONE
    division, so the z-score is the same IEEE value in Spark and DuckDB.
    Scale shape: one (type, hour) partial-combine aggregation, then a
    per-type window over the (tiny) hourly series — no second scan."""
    from pyspark.sql import Window as W

    events = read_table(spark, "events", sf_dir)
    hours = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    w = W.partitionBy("event_type")
    hours = (
        hours.withColumn("s", F.sum("n").over(w))
        .withColumn("s2", F.sum(F.col("n") * F.col("n")).over(w))
        .withColumn("c", F.count(F.lit(1)).over(w))
    )
    mean = F.col("s").cast("double") / F.col("c")
    var = (F.col("c") * F.col("s2") - F.col("s") * F.col("s")).cast("double") / (
        F.col("c") * (F.col("c") - 1)
    )
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    return (
        hours.filter(F.col("c") > 1)
        .withColumn("z", F.round(z, 6))
        .filter(F.col("z") > 2.0)
        .select("event_type", "hour", "n", "z")
        .orderBy("event_type", "hour")
    )


EVENTS_HOURLY_ANOMALIES_SQL = """
WITH hours AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS hour,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, hour, n,
         SUM(n) OVER (PARTITION BY event_type) AS s,
         SUM(n * n) OVER (PARTITION BY event_type) AS s2,
         COUNT(*) OVER (PARTITION BY event_type) AS c
  FROM hours
)
SELECT event_type, hour, n,
       ROUND((CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / c)
             / SQRT(CAST(c * s2 - s * s AS DOUBLE) / (c * (c - 1))), 6) AS z
FROM stats
WHERE c > 1
  AND ROUND((CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / c)
            / SQRT(CAST(c * s2 - s * s AS DOUBLE) / (c * (c - 1))), 6) > 2.0
ORDER BY event_type, hour
"""


# --- Ordered funnel ----------------------------------------------------------

FUNNEL_STEPS = ("view", "click", "purchase")


def events_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-step funnel (view → click → purchase): how many users
    reach each step, where each step must occur STRICTLY AFTER the previous
    step's first occurrence (the chained-min semantics every funnel engine
    uses).

    Spark-first design: instead of the textbook three self-join chain
    (3 shuffles on user_id, each re-scanning events), the per-user event
    stream is collected once, time-sorted, and folded with a higher-order
    `aggregate` whose accumulator is (stage, reached_at) — one shuffle, one
    scan, pure Catalyst codegen.  Per-user state is bounded by that user's
    funnel-step events (not total corpus size); for a pathological hot user
    the chained-min formulation (equivalent, 3 shuffles) is the fallback —
    which is exactly what the DuckDB oracle runs, making the equivalence
    machine-checked.  The strict `ts >` guard in the fold makes the result
    independent of sort tie-breaking between same-timestamp events.
    """
    events = read_table(spark, "events", sf_dir)
    per_user = (
        events.where(F.col("event_type").isin(*FUNNEL_STEPS))
        .groupBy("user_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct(F.col("ts"), F.col("event_type")))
            ).alias("evs")
        )
    )
    init = F.struct(
        F.lit(0).alias("stage"), F.lit(None).cast("timestamp").alias("at")
    )

    def _advance(acc, e):
        adv = (
            ((acc["stage"] == 0) & (e["event_type"] == FUNNEL_STEPS[0]))
            | (
                (acc["stage"] == 1)
                & (e["event_type"] == FUNNEL_STEPS[1])
                & (e["ts"] > acc["at"])
            )
            | (
                (acc["stage"] == 2)
                & (e["event_type"] == FUNNEL_STEPS[2])
                & (e["ts"] > acc["at"])
            )
        )
        return F.when(
            adv,
            F.struct((acc["stage"] + 1).alias("stage"), e["ts"].alias("at")),
        ).otherwise(acc)

    staged = per_user.select(
        F.aggregate(F.col("evs"), init, _advance)["stage"].alias("stage")
    )
    funnel = staged.agg(
        F.count(F.when(F.col("stage") >= 1, 1)).alias("n_view"),
        F.count(F.when(F.col("stage") >= 2, 1)).alias("n_view_click"),
        F.count(F.when(F.col("stage") >= 3, 1)).alias("n_full_funnel"),
    )
    totals = events.agg(F.countDistinct("user_id").alias("n_users"))
    return totals.crossJoin(funnel).select(
        "n_users", "n_view", "n_view_click", "n_full_funnel"
    )


EVENTS_SESSION_FUNNEL_SQL = f"""
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = '{FUNNEL_STEPS[0]}' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
  WHERE e.event_type = '{FUNNEL_STEPS[1]}' GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
  WHERE e.event_type = '{FUNNEL_STEPS[2]}' GROUP BY e.user_id
)
SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
       (SELECT COUNT(*) FROM s1) AS n_view,
       (SELECT COUNT(*) FROM s2) AS n_view_click,
       (SELECT COUNT(*) FROM s3) AS n_full_funnel
"""


# --- Event-transition matrix ---------------------------------------------------


def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over per-user event streams:
    for each (event_type → next event_type) pair, how many consecutive
    occurrences exist corpus-wide, plus the per-source-state probability
    (rounded) — the behavioural-model / anomaly-baseline primitive.

    One shuffle on user_id for the lag window (per-task state = one row),
    then a tiny (|types|² ≤ 25-row) aggregate.  The (ts, event_id) window
    order is total — event_id is unique — so the successor relation is
    deterministic even under timestamp ties."""
    events = read_table(spark, "events", sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            F.col("event_type").alias("src"),
            F.lead("event_type").over(w).alias("dst"),
        )
        .where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("src").agg(F.sum("n").alias("n_src"))
    return (
        pairs.join(F.broadcast(totals), "src")
        .select(
            "src",
            "dst",
            "n",
            F.round(F.col("n").cast("double") / F.col("n_src"), 6).alias("p"),
        )
        .orderBy("src", "dst")
    )


EVENTS_MARKOV_TRANSITIONS_SQL = """
WITH pairs AS (
  SELECT event_type AS src,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS dst
  FROM events
),
counted AS (
  SELECT src, dst, COUNT(*) AS n FROM pairs WHERE dst IS NOT NULL
  GROUP BY src, dst
),
totals AS (SELECT src, CAST(SUM(n) AS BIGINT) AS n_src FROM counted GROUP BY src)
SELECT c.src, c.dst, c.n, ROUND(CAST(c.n AS DOUBLE) / t.n_src, 6) AS p
FROM counted c JOIN totals t ON c.src = t.src
ORDER BY c.src, c.dst
"""


# --- DAU/WAU stickiness ---------------------------------------------------------


def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users, trailing-7-day weekly active users, and the
    DAU/WAU stickiness ratio per day — the canonical engagement metric.

    Scale shape: events first collapse to the (user, day) grain (one
    map-side-combinable distinct); then each user-day expands SCAN-SIDE to
    the exactly-7 window days it contributes to via
    explode(sequence(day, day+6)) — O(7) rows per user-day, no join against
    the day spine at all.  (The previous shape joined the day spine on
    `u.day BETWEEN d.day-6 AND d.day`, which Catalyst plans as a broadcast
    nested-loop join evaluating the predicate against EVERY spine day per
    user-day row — O(|days|) per row, superlinear as history grows; the
    explode is O(1) per row and keeps map-side combine.)  Window days past
    a user's activity that had no events of their own drop out in the
    final inner join with the DAU relation, whose keys are exactly the
    observed days — same spine the old join used."""
    events = read_table(spark, "events", sf_dir)
    user_days = events.select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    dau = user_days.groupBy("day").agg(
        F.countDistinct("user_id").alias("dau")
    )
    trailing = user_days.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day"),
    )
    wau = trailing.groupBy("day").agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        dau.join(wau, "day")
        .select(
            # DATE output columns render differently across the driver's
            # fetch disciplines (pandas widens DATE to a midnight
            # Timestamp); emit the ISO string form, stable in both
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "wau",
            F.round(
                F.col("dau").cast("double") / F.col("wau").cast("double"), 6
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


EVENTS_DAU_WAU_SQL = """
WITH user_days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
dau AS (
  SELECT day, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS dau
  FROM user_days GROUP BY day
),
days AS (SELECT DISTINCT day FROM user_days),
wau AS (
  SELECT d.day, CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS wau
  FROM days d JOIN user_days u
    ON u.day <= d.day AND u.day >= d.day - 6
  GROUP BY d.day
)
SELECT CAST(dau.day AS VARCHAR) AS day, dau.dau, wau.wau,
       ROUND(CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE), 6)
         AS stickiness
FROM dau JOIN wau ON dau.day = wau.day
ORDER BY dau.day
"""


def events_daily_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume anomaly screen: z-score each day's event count against
    the corpus-wide mean/stddev of daily counts and flag |z| >= 2 — the
    ingestion-monitoring alarm a pipeline runs per batch (a broken crawler
    or a duplicated feed shows up as a volume spike/crater long before any
    content-level audit fires).

    Scale shape: one map-side-combinable count per (day) — the spine is
    |days| rows from then on; the moments come from ONE tiny aggregation
    broadcast back (1 row), so the whole plan is scan -> narrow agg ->
    scan-side z arithmetic. Moments accumulate exact integer sums (counts
    are BIGINTs; sum and sum-of-squares stay integral) with one terminal
    double division, so both engines agree bit-for-bit."""
    events = read_table(spark, "events", sf_dir)
    daily = events.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    moments = daily.agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    mean = F.col("s").cast("double") / F.col("n_days")
    var = (
        F.col("s2").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
        / F.col("n_days")
    ) / (F.col("n_days") - 1)
    z = (F.col("n").cast("double") - mean) / F.sqrt(var)
    return (
        daily.crossJoin(F.broadcast(moments))
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n",
            F.round(z, 6).alias("z"),
            (F.abs(z) >= 2.0).alias("anomalous"),
        )
        .orderBy("day")
    )


EVENTS_DAILY_ANOMALY_SQL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(n) AS BIGINT) AS s,
         CAST(SUM(n * n) AS BIGINT) AS s2
  FROM daily
)
SELECT CAST(day AS VARCHAR) AS day, n,
       ROUND((CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / n_days)
             / SQRT((CAST(s2 AS DOUBLE)
                     - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_days)
                    / (n_days - 1)), 6) AS z,
       ABS((CAST(n AS DOUBLE) - CAST(s AS DOUBLE) / n_days)
           / SQRT((CAST(s2 AS DOUBLE)
                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n_days)
                  / (n_days - 1))) >= 2.0 AS anomalous
FROM daily, m
ORDER BY day
"""


QUERIES: dict[str, tuple] = {
    "temporal_asof_attribution": (asof_join_attribution, ASOF_JOIN_ATTRIBUTION_SQL),
    "events_daily_anomaly": (events_daily_anomaly, EVENTS_DAILY_ANOMALY_SQL),
    "events_session_funnel": (events_session_funnel, EVENTS_SESSION_FUNNEL_SQL),
    "events_markov_transitions": (
        events_markov_transitions,
        EVENTS_MARKOV_TRANSITIONS_SQL,
    ),
    "events_dau_wau_stickiness": (
        events_dau_wau_stickiness,
        EVENTS_DAU_WAU_SQL,
    ),
    "events_hourly_anomalies": (events_hourly_anomalies, EVENTS_HOURLY_ANOMALIES_SQL),
    "temporal_range_join_context": (
        range_join_error_context,
        RANGE_JOIN_ERROR_CONTEXT_SQL,
    ),
    "events_cohort_retention": (
        events_cohort_retention,
        EVENTS_COHORT_RETENTION_SQL,
    ),
}
