"""Window / analytic function coverage.

Reference parity targets:
  * AnalyticEvalNode single-pass evaluation — be/src/exec/analytic-eval-node.h:57-87
  * frames ROWS/RANGE with PRECEDING/FOLLOWING — fe/.../analysis/AnalyticWindow.java:39-107
  * ranking fns rank/dense_rank/row_number/percent_rank/cume_dist/ntile —
    fe/.../catalog/BuiltinsDb.java:1397-1449
  * value fns first_value/last_value (IGNORE NULLS)/lag/lead — BuiltinsDb.java:1512-1578
  * partitioned TOP-N pushdown — be/src/exec/topn-node.h:130-148
    (Spark 3.5+: InferWindowGroupLimit turns the rank filter into a
    per-partition group limit; asserted in tests/test_plans.py)

Every ORDER BY inside a window includes a unique tiebreak column so results
are deterministic for the oracle comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from hopspark.catalog import read_table
from hopspark.operators._util import dec


def window_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per market segment by price: rank/dense_rank/row_number
    + the partitioned-TOP-N pattern (rank ≤ k pushed into the sort)."""
    orders = read_table(spark, "orders", sf_dir)
    cust = read_table(spark, "customer", sf_dir)
    j = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment", "o_orderkey", "o_totalprice"
    )
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        j.withColumn("rn", F.row_number().over(w))
        .withColumn("rnk", F.rank().over(w))
        .withColumn("drnk", F.dense_rank().over(w))
        .filter(F.col("rn") <= 3)
        .select("c_mktsegment", "o_orderkey", "o_totalprice", "rn", "rnk", "drnk")
        .orderBy("c_mktsegment", "rn")
    )


WINDOW_RANK_TOPN_SQL = """
SELECT c_mktsegment, o_orderkey, o_totalprice, rn, rnk, drnk FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn,
         RANK()       OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk,
         DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey ASC) AS drnk
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rn <= 3
ORDER BY c_mktsegment, rn
"""


def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running revenue per customer over order dates — ROWS UNBOUNDED
    PRECEDING frame + lag/lead (value functions)."""
    orders = read_table(spark, "orders", sf_dir).filter(F.col("o_custkey") <= 50)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(run).cast("double").alias("running_total"),
        F.lag("o_orderkey", 1).over(w).alias("prev_orderkey"),
        F.lead("o_orderkey", 1).over(w).alias("next_orderkey"),
        F.row_number().over(w).alias("order_seq"),
    ).orderBy("o_custkey", "order_seq")


WINDOW_RUNNING_SUM_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_total,
       LAG(o_orderkey, 1)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS prev_orderkey,
       LEAD(o_orderkey, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS next_orderkey,
       ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS order_seq
FROM orders WHERE o_custkey <= 50
ORDER BY o_custkey, order_seq
"""


def window_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding ROWS 2-PRECEDING..CURRENT moving sum + full-partition frame
    (first_value/last_value over UNBOUNDED..UNBOUNDED)."""
    ev = read_table(spark, "events", sf_dir).filter(F.col("user_id") <= 20)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    mov = w.rowsBetween(-2, W.currentRow)
    full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return ev.select(
        "user_id",
        "event_id",
        F.sum(dec("value", 12, 2)).over(mov).cast("double").alias("moving_sum3"),
        F.first("event_id").over(full).alias("first_event"),
        F.last("event_id").over(full).alias("last_event"),
        F.count(F.lit(1)).over(full).alias("n_events"),
    ).orderBy("user_id", "event_id")


# Oracle orders by the same µs-truncated instant the engine exposes
# (events.ts is parquet TIMESTAMP(NANOS); see hopspark/catalog.py).
WINDOW_SLIDING_FRAME_SQL = """
WITH ev AS (
  SELECT user_id, event_id, value,
         make_timestamp(epoch_ns(ts) // 1000) AS ts_us
  FROM events WHERE user_id <= 20
)
SELECT user_id, event_id,
       CAST(SUM(CAST(value AS DECIMAL(12,2)))
            OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum3,
       FIRST_VALUE(event_id) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_event,
       LAST_VALUE(event_id)  OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_event,
       COUNT(*) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS n_events
FROM ev
ORDER BY user_id, event_id
"""


def window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist / ntile (BuiltinsDb.java:1445-1449)."""
    cust = read_table(spark, "customer", sf_dir)
    w = W.partitionBy("c_mktsegment").orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    return cust.select(
        "c_mktsegment",
        "c_custkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    ).orderBy("c_mktsegment", "c_custkey")


WINDOW_DISTRIBUTION_SQL = """
SELECT c_mktsegment, c_custkey,
       PERCENT_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC) AS pct_rank,
       CUME_DIST()    OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC) AS cume,
       NTILE(4)       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal ASC, c_custkey ASC) AS quartile
FROM customer
ORDER BY c_mktsegment, c_custkey
"""


def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over a numeric ordering key: count of orders within
    ±1000.00 of each order's price (AnalyticWindow RANGE offsets)."""
    orders = read_table(spark, "orders", sf_dir).filter(F.col("o_custkey") <= 30)
    w = (
        W.partitionBy("o_custkey")
        .orderBy(dec("o_totalprice"))
        .rangeBetween(-1000, 1000)
    )
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.count(F.lit(1)).over(w).alias("n_near_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


WINDOW_RANGE_FRAME_SQL = """
SELECT o_custkey, o_orderkey,
       COUNT(*) OVER (PARTITION BY o_custkey ORDER BY CAST(o_totalprice AS DECIMAL(12,2))
                      RANGE BETWEEN 1000 PRECEDING AND 1000 FOLLOWING) AS n_near_price
FROM orders WHERE o_custkey <= 30
ORDER BY o_custkey, o_orderkey
"""


def window_value_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value with IGNORE NULLS + lag/lead with defaults
    (reference: BuiltinsDb first_value 1512-1528 IGNORE NULLS variants,
    lag/lead 1555-1578; grammar sql-parser.cup:3729). Status 'P' orders
    provide a deterministic NULL pattern."""
    orders = read_table(spark, "orders", sf_dir).filter(F.col("o_custkey") <= 100)
    v = F.when(F.col("o_orderstatus") != "P", dec("o_totalprice", 14, 2))
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.first(v, ignorenulls=True).over(w).cast("double").alias("first_nonnull"),
            F.last(v, ignorenulls=True).over(w).cast("double").alias("last_nonnull"),
            F.lag(dec("o_totalprice", 14, 2), 1, -1.0)
            .over(w)
            .cast("double")
            .alias("prev_price"),
            F.lead(dec("o_totalprice", 14, 2), 1, -1.0)
            .over(w)
            .cast("double")
            .alias("next_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


WINDOW_VALUE_FNS_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(first_value(v IGNORE NULLS) OVER w AS DOUBLE) AS first_nonnull,
       CAST(last_value(v IGNORE NULLS) OVER w AS DOUBLE)  AS last_nonnull,
       CAST(lag(p, 1, -1.0) OVER w AS DOUBLE)  AS prev_price,
       CAST(lead(p, 1, -1.0) OVER w AS DOUBLE) AS next_price
FROM (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CAST(o_totalprice AS DECIMAL(14,2)) AS p,
         CASE WHEN o_orderstatus <> 'P'
              THEN CAST(o_totalprice AS DECIMAL(14,2)) END AS v
  FROM orders WHERE o_custkey <= 100
) t
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


def window_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-timeout sessionization over the events stream table — the
    lag + cumulative-sum session-id pattern (the batch twin of the
    streaming session_window in hopspark/streaming/windows.py). Timestamps
    are second-truncated in BOTH engines so the ns-vs-µs storage difference
    can't flip a gap comparison; a 30-minute silence starts a new session."""
    ev = read_table(spark, "events", sf_dir).select(
        "user_id", "event_id", F.date_trunc("second", "ts").alias("ts")
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = ev.withColumn(
        "new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    )
    wcum = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    sess = flagged.withColumn("session_no", F.sum("new_sess").over(wcum))
    return (
        sess.groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("user_id", "session_no")
    )


WINDOW_SESSIONIZE_SQL = """
WITH ev AS (
  SELECT user_id, event_id, date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts
  FROM events
),
flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR CAST(epoch(ts) AS BIGINT)
                      - CAST(epoch(lag(ts) OVER w) AS BIGINT) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS session_no
  FROM flagged
)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       COUNT(*) AS n_events
FROM sess
GROUP BY user_id, session_no
ORDER BY user_id, session_no
"""


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel over the events stream table: users whose
    first view is followed by a click, then a purchase (each stage's clock
    starts at the previous stage's first completion). Stage counts are the
    classic product-analytics output; each stage is a filtered min-ts
    aggregate joined forward — three narrow shuffles on user_id, payload
    never moves. Second-truncated timestamps keep the ns-vs-µs storage
    difference out of the ordering comparisons."""
    ev = read_table(spark, "events", sf_dir).select(
        "user_id", "event_type", F.date_trunc("second", "ts").alias("ts")
    )

    def stage(prev: DataFrame, etype: str) -> DataFrame:
        src = ev.filter(F.col("event_type") == etype)
        if prev is not None:
            src = src.join(prev, "user_id").filter(F.col("ts") >= F.col("t"))
        return src.groupBy("user_id").agg(F.min("ts").alias("t"))

    views = stage(None, "view")
    clicks = stage(views.select("user_id", "t"), "click")
    purchases = stage(clicks.select("user_id", "t"), "purchase")
    rows = [
        ("view", 1, views),
        ("click", 2, clicks),
        ("purchase", 3, purchases),
    ]
    out = None
    for name, no, df in rows:
        one = df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(name).alias("stage"), F.lit(no).alias("stage_no"), "n_users"
        )
        out = one if out is None else out.unionByName(one)
    return out.orderBy("stage_no")


EVENTS_FUNNEL_SQL = """
WITH ev AS (
  SELECT user_id, event_type,
         date_trunc('second', CAST(ts AS TIMESTAMP)) AS ts
  FROM events
),
v AS (SELECT user_id, MIN(ts) AS t FROM ev
      WHERE event_type = 'view' GROUP BY user_id),
c AS (SELECT ev.user_id, MIN(ev.ts) AS t
      FROM ev JOIN v ON ev.user_id = v.user_id AND ev.ts >= v.t
      WHERE ev.event_type = 'click' GROUP BY ev.user_id),
p AS (SELECT ev.user_id, MIN(ev.ts) AS t
      FROM ev JOIN c ON ev.user_id = c.user_id AND ev.ts >= c.t
      WHERE ev.event_type = 'purchase' GROUP BY ev.user_id)
SELECT 'view' AS stage, 1 AS stage_no, COUNT(*) AS n_users FROM v
UNION ALL
SELECT 'click', 2, COUNT(*) FROM c
UNION ALL
SELECT 'purchase', 3, COUNT(*) FROM p
ORDER BY stage_no
"""


QUERIES: dict[str, tuple] = {
    "window_sessionize": (window_sessionize, WINDOW_SESSIONIZE_SQL),
    "events_funnel": (events_funnel, EVENTS_FUNNEL_SQL),
    "window_rank_topn": (window_rank_topn, WINDOW_RANK_TOPN_SQL),
    "window_running_sum": (window_running_sum, WINDOW_RUNNING_SUM_SQL),
    "window_sliding_frame": (window_sliding_frame, WINDOW_SLIDING_FRAME_SQL),
    "window_distribution": (window_distribution, WINDOW_DISTRIBUTION_SQL),
    "window_range_frame": (window_range_frame, WINDOW_RANGE_FRAME_SQL),
    "window_value_fns_ignore_nulls": (window_value_functions, WINDOW_VALUE_FNS_SQL),
}
