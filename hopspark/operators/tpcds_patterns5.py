"""TPC-DS-pattern workload slice, part 5 — 5 more plan shapes.

Round-3 fourth widening (reference: testdata/workloads/tpcds/queries/):
INTERSECT-derived dims driving the fact join (q14-2), HAVING against a
max-over-group scalar (q23-2), time-range rolling-window sums (q57's
moving monthly window), FULL OUTER joins of per-channel aggregate CTEs
with coalesced netting (q77), and ratio-to-class windows at item grain
(q12/q20/q98).

Same adaptation + determinism discipline as parts 2-4.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hopspark.catalog import read_table
from hopspark.operators._util import REVENUE_TERM, dec
from hopspark.operators.tpcds_patterns2 import (
    LOW,
    URGENT,
    _li_orders,
    _rev,
)

# ---------------------------------------------------------------------------
# q14-2 shape — INTERSECT chain builds the qualifying-items dim, which
# then drives the fact aggregation
# ---------------------------------------------------------------------------


def tpcds_q14b_intersect_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    base = _li_orders(spark, sf_dir)

    def channel_parts(prios: tuple) -> DataFrame:
        return (
            base.filter(F.col("o_orderpriority").isin(*prios))
            .select("l_partkey")
            .distinct()
        )

    in_all = (
        channel_parts(URGENT)
        .intersect(channel_parts(("3-MEDIUM",)))
        .intersect(channel_parts(LOW))
    )
    return (
        base.filter(F.year("o_orderdate") == 1996)
        .join(in_all, "l_partkey")
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(_rev()).cast("double").alias("rev"),
        )
        .orderBy("p_brand")
    )


TPCDS_Q14B_SQL = f"""
WITH in_all AS (
  SELECT DISTINCT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
  INTERSECT
  SELECT DISTINCT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderpriority IN ('3-MEDIUM')
  INTERSECT
  SELECT DISTINCT l_partkey FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderpriority IN ('4-NOT SPECIFIED','5-LOW')
)
SELECT p_brand, COUNT(*) AS n_lines,
       CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS rev
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN in_all USING (l_partkey)
JOIN part   ON l_partkey = p_partkey
WHERE year(o_orderdate) = 1996
GROUP BY p_brand
ORDER BY p_brand
"""

# ---------------------------------------------------------------------------
# q23-2 shape — HAVING against a scalar computed over the SAME aggregate:
# customers above half the best customer's total
# ---------------------------------------------------------------------------


def tpcds_q23b_above_half_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    totals = (
        _li_orders(spark, sf_dir)
        .groupBy("o_custkey")
        .agg(F.sum(_rev()).alias("total"))
    )
    best = totals.agg(F.max("total").alias("best"))
    return (
        totals.crossJoin(F.broadcast(best))
        .filter(F.col("total") * 2 > F.col("best"))
        .select(
            "o_custkey",
            F.col("total").cast("double").alias("total"),
            F.round(
                F.col("total").cast("double") / F.col("best").cast("double"), 6
            ).alias("share_of_best"),
        )
        .orderBy("o_custkey")
    )


TPCDS_Q23B_SQL = f"""
WITH totals AS (
  SELECT o_custkey, SUM({REVENUE_TERM}) AS total
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey
)
SELECT o_custkey, CAST(total AS DOUBLE) AS total,
       ROUND(CAST(total AS DOUBLE)
             / CAST((SELECT MAX(total) FROM totals) AS DOUBLE), 6)
           AS share_of_best
FROM totals
WHERE total * 2 > (SELECT MAX(total) FROM totals)
ORDER BY o_custkey
"""

# ---------------------------------------------------------------------------
# q57 shape — rolling 30-day window sum per supplier (time-range frame,
# expressed as a numeric range over epoch seconds so both engines agree)
# ---------------------------------------------------------------------------

_30D = 30 * 86400


def tpcds_q57_rolling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        read_table(spark, "lineitem", sf_dir)
        .filter(F.year("l_shipdate") == 1996)
        .groupBy("l_suppkey", F.to_date("l_shipdate").alias("day"))
        .agg(F.sum(dec("l_quantity")).alias("qty"))
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy(F.unix_timestamp(F.col("day").cast("timestamp")))
        .rangeBetween(-_30D, 0)
    )
    return (
        daily.select(
            "l_suppkey",
            # TIMESTAMP on both sides: DuckDB's pandas bridge widens DATE
            # to datetime64 anyway, so DATE outputs hash-mismatch
            F.col("day").cast("timestamp").alias("day"),
            F.col("qty").cast("double").alias("day_qty"),
            F.sum("qty").over(w).cast("double").alias("qty_30d"),
        )
        .orderBy("l_suppkey", "day")
    )


TPCDS_Q57_SQL = f"""
WITH daily AS (
  SELECT l_suppkey, CAST(l_shipdate AS DATE) AS day,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
  FROM lineitem
  WHERE year(l_shipdate) = 1996
  GROUP BY 1, 2
)
SELECT l_suppkey, CAST(day AS TIMESTAMP) AS day, CAST(qty AS DOUBLE) AS day_qty,
       CAST(SUM(qty) OVER (
           PARTITION BY l_suppkey
           ORDER BY epoch(CAST(day AS TIMESTAMP))
           RANGE BETWEEN {_30D} PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS qty_30d
FROM daily
ORDER BY l_suppkey, day
"""

# ---------------------------------------------------------------------------
# q77 shape — per-nation profit matrix: urgent-channel sales FULL OUTER
# joined to low-channel returns, coalesced netting
# ---------------------------------------------------------------------------


def tpcds_q77_channel_profit_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    base = (
        _li_orders(spark, sf_dir)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    sales = (
        base.filter(
            F.col("o_orderpriority").isin(*URGENT)
            & (F.col("l_returnflag") != "R")
        )
        .groupBy(F.col("n_name").alias("sn"))
        .agg(F.sum(_rev()).alias("sales"))
    )
    returns = (
        base.filter(
            F.col("o_orderpriority").isin(*LOW) & (F.col("l_returnflag") == "R")
        )
        .groupBy(F.col("n_name").alias("rn"))
        .agg(F.sum(_rev()).alias("returns"))
    )
    joined = sales.join(returns, sales.sn == returns.rn, "full_outer")
    zero = F.lit(0).cast("decimal(38,4)")
    return (
        joined.select(
            F.coalesce("sn", "rn").alias("n_name"),
            F.coalesce("sales", zero).cast("double").alias("sales"),
            F.coalesce("returns", zero).cast("double").alias("returns"),
            (F.coalesce("sales", zero) - F.coalesce("returns", zero))
            .cast("double")
            .alias("net"),
        )
        .orderBy("n_name")
    )


TPCDS_Q77_SQL = f"""
WITH s AS (
  SELECT n_name AS sn, SUM({REVENUE_TERM}) AS sales
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE o_orderpriority IN ('1-URGENT','2-HIGH') AND l_returnflag <> 'R'
  GROUP BY n_name
),
r AS (
  SELECT n_name AS rn, SUM({REVENUE_TERM}) AS returns
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE o_orderpriority IN ('4-NOT SPECIFIED','5-LOW') AND l_returnflag = 'R'
  GROUP BY n_name
)
SELECT COALESCE(sn, rn) AS n_name,
       CAST(COALESCE(sales, 0) AS DOUBLE) AS sales,
       CAST(COALESCE(returns, 0) AS DOUBLE) AS returns,
       CAST(COALESCE(sales, 0) - COALESCE(returns, 0) AS DOUBLE) AS net
FROM s FULL OUTER JOIN r ON sn = rn
ORDER BY n_name
"""

# ---------------------------------------------------------------------------
# q12/q20/q98 shape — ratio-to-class: each part's revenue share within its
# p_type class via a window over the aggregate
# ---------------------------------------------------------------------------


def tpcds_q98_ratio_to_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    per_part = (
        read_table(spark, "lineitem", sf_dir)
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_type", "p_partkey")
        .agg(F.sum(_rev()).alias("rev"))
    )
    w = Window.partitionBy("p_type")
    share = F.round(
        F.col("rev").cast("double") / F.sum("rev").over(w).cast("double") * 100,
        6,
    )
    return (
        per_part.select(
            "p_type",
            "p_partkey",
            F.col("rev").cast("double").alias("rev"),
            share.alias("class_share_pct"),
        )
        .filter(F.col("class_share_pct") > 2.0)
        .orderBy("p_type", "p_partkey")
    )


TPCDS_Q98_SQL = f"""
WITH per_part AS (
  SELECT p_type, p_partkey, SUM({REVENUE_TERM}) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
)
SELECT p_type, p_partkey, CAST(rev AS DOUBLE) AS rev, class_share_pct
FROM (
  SELECT p_type, p_partkey, rev,
         ROUND(CAST(rev AS DOUBLE)
               / CAST(SUM(rev) OVER (PARTITION BY p_type) AS DOUBLE) * 100, 6)
             AS class_share_pct
  FROM per_part
)
WHERE class_share_pct > 2.0
ORDER BY p_type, p_partkey
"""


QUERIES: dict[str, tuple] = {
    "tpcds_q14b_intersect_dim": (tpcds_q14b_intersect_dim, TPCDS_Q14B_SQL),
    "tpcds_q23b_above_half_max": (tpcds_q23b_above_half_max, TPCDS_Q23B_SQL),
    "tpcds_q57_rolling_window": (tpcds_q57_rolling_window, TPCDS_Q57_SQL),
    "tpcds_q77_channel_profit_matrix": (
        tpcds_q77_channel_profit_matrix,
        TPCDS_Q77_SQL,
    ),
    "tpcds_q98_ratio_to_class": (tpcds_q98_ratio_to_class, TPCDS_Q98_SQL),
}
