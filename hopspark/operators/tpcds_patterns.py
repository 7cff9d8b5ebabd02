"""TPC-DS-pattern workload slice, adapted to the driver schema.

The reference ships 205 TPC-DS query files (testdata/workloads/tpcds/queries/)
whose plan shapes TPC-H misses: date-dim star joins with top-n, year-over-year
self-joins of aggregated CTEs, multi-level aggregation feeding semi-joins,
HAVING-range join-backs, ROLLUP with windowed ranks inside grouping levels,
best/worst rank joins, cumulative full-outer channel comparisons, weekday
pivots, and scalar-subquery cross joins. Each query here mirrors one of those
shapes (named after the TPC-DS query whose plan it reproduces) over the
driver's TPC-H-ish tables, with a DuckDB oracle twin.

Scale notes: date dimensions are derived scan-side (year()/weekofyear() are
cheap codegen exprs — no date_dim table needed); every agg keeps the
exact-decimal discipline of operators/_util.py; joins are on compact keys
with AQE free to broadcast the measured-small sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hopspark.catalog import read_table
from hopspark.operators._util import (
    DEC_PRICE,
    DEC_QTY,
    ONE_MINUS_DISC,
    REVENUE_TERM,
    dec,
    dsum,
    one_minus,
)

# ---------------------------------------------------------------------------
# q3 shape — date-dim star join + agg + top-n (tpcds-q3.test)
# ---------------------------------------------------------------------------


def tpcds_q3_brand_year_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    part = read_table(spark, "part", sf_dir).filter(F.col("p_type").like("ECONOMY%"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy(F.year("o_orderdate").alias("d_year"), "p_brand")
        .agg(dsum(dec("l_extendedprice") * one_minus("l_discount")).alias("revenue"))
        .orderBy(F.desc("revenue"), "d_year", "p_brand")
        .limit(20)
    )


TPCDS_Q3_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS d_year, p_brand,
       CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part   ON l_partkey = p_partkey
WHERE p_type LIKE 'ECONOMY%'
GROUP BY d_year, p_brand
ORDER BY revenue DESC, d_year, p_brand
LIMIT 20
"""

# ---------------------------------------------------------------------------
# q7 shape — dimension-filtered multi-measure averages (tpcds-q7.test)
# ---------------------------------------------------------------------------


def tpcds_q7_avg_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    orders = read_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    part = read_table(spark, "part", sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(
            (F.sum(dec("l_quantity")).cast("double") / F.count("l_quantity")).alias(
                "avg_qty"
            ),
            (
                F.sum(dec("l_extendedprice")).cast("double")
                / F.count("l_extendedprice")
            ).alias("avg_price"),
            (
                F.sum(dec("l_discount", 4, 2)).cast("double") / F.count("l_discount")
            ).alias("avg_disc"),
        )
        .orderBy("p_brand")
    )


TPCDS_Q7_SQL = f"""
SELECT p_brand,
       CAST(SUM({DEC_QTY}) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
       CAST(SUM({DEC_PRICE}) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(l_discount) AS avg_disc
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part   ON l_partkey = p_partkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY p_brand
ORDER BY p_brand
"""

# ---------------------------------------------------------------------------
# q11/q74 shape — year-over-year growth via self-joined yearly aggregate CTE
# ---------------------------------------------------------------------------


def tpcds_q11_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, "orders", sf_dir)
    yearly = orders.groupBy(
        "o_custkey", F.year("o_orderdate").alias("d_year")
    ).agg(F.sum(dec("o_totalprice")).alias("total"))
    y1 = yearly.select(
        F.col("o_custkey").alias("custkey"),
        F.col("d_year").alias("year1"),
        F.col("total").alias("total1"),
    )
    y2 = yearly.select(
        F.col("o_custkey").alias("custkey"),
        (F.col("d_year") - 1).alias("year1"),
        F.col("total").alias("total2"),
    )
    return (
        y1.join(y2, ["custkey", "year1"])
        .filter(F.col("total1") > 0)
        .select(
            "custkey",
            "year1",
            F.round(F.col("total2").cast("double") / F.col("total1").cast("double"), 6).alias(
                "growth"
            ),
        )
        .filter(F.col("growth") > 1.2)
        .orderBy("custkey", "year1")
    )


TPCDS_Q11_SQL = """
WITH yearly AS (
  SELECT o_custkey AS custkey, CAST(year(o_orderdate) AS INT) AS d_year,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total
  FROM orders GROUP BY custkey, d_year
)
SELECT y1.custkey AS custkey, y1.d_year AS year1,
       ROUND(CAST(y2.total AS DOUBLE) / CAST(y1.total AS DOUBLE), 6) AS growth
FROM yearly y1
JOIN yearly y2 ON y1.custkey = y2.custkey AND y2.d_year = y1.d_year + 1
WHERE y1.total > 0
  AND ROUND(CAST(y2.total AS DOUBLE) / CAST(y1.total AS DOUBLE), 6) > 1.2
ORDER BY y1.custkey, year1
"""

# ---------------------------------------------------------------------------
# q23 shape — multi-level agg: frequent items feed a semi-join (tpcds-q23)
# ---------------------------------------------------------------------------


def tpcds_q23_frequent_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    frequent = (
        li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("cnt")).filter(
            F.col("cnt") > 35
        )
    )
    return (
        li.join(frequent.select("l_partkey"), "l_partkey", "left_semi")
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.year("o_orderdate").alias("d_year"))
        .agg(dsum(dec("l_extendedprice") * one_minus("l_discount")).alias("revenue"))
        .orderBy("d_year")
    )


TPCDS_Q23_SQL = f"""
SELECT CAST(year(o_orderdate) AS INT) AS d_year,
       CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_partkey IN (
  SELECT l_partkey FROM lineitem GROUP BY l_partkey HAVING COUNT(*) > 35
)
GROUP BY d_year
ORDER BY d_year
"""

# ---------------------------------------------------------------------------
# q34 shape — HAVING-range aggregate joined back to the dimension (tpcds-q34)
# ---------------------------------------------------------------------------


def tpcds_q34_order_size_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    cust = read_table(spark, "customer", sf_dir)
    sized = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_lines"))
        .filter((F.col("n_lines") >= 5) & (F.col("n_lines") <= 7))
    )
    return (
        sized.join(orders, sized.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_name", F.col("l_orderkey").alias("o_orderkey"), "n_lines")
        .orderBy("c_name", "o_orderkey")
    )


TPCDS_Q34_SQL = """
SELECT c_name, o_orderkey, n_lines
FROM (
  SELECT l_orderkey, COUNT(*) AS n_lines
  FROM lineitem GROUP BY l_orderkey HAVING COUNT(*) BETWEEN 5 AND 7
) sized
JOIN orders   ON sized.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY c_name, o_orderkey
"""

# ---------------------------------------------------------------------------
# q36 shape — ROLLUP hierarchy + rank() inside each grouping level
# ---------------------------------------------------------------------------


def tpcds_q36_margin_rollup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    supp = read_table(spark, "supplier", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    base = li.join(supp, li.l_suppkey == supp.s_suppkey).join(
        F.broadcast(nation), supp.s_nationkey == nation.n_nationkey
    )
    # Pre-aggregate to the finest grouping before the ROLLUP: decimal sums
    # re-aggregate exactly, so the Expand (x3 grouping sets) runs over the
    # ~|nations x flags| partial rows instead of the full fact table — the
    # "push aggregation partial" rule at the grouping-sets level.
    fine = base.groupBy("n_name", "l_returnflag").agg(
        F.sum(dec("l_extendedprice") * one_minus("l_discount")).alias("_rev"),
        F.sum(dec("l_extendedprice")).alias("_price"),
    )
    rolled = (
        fine.rollup("n_name", "l_returnflag")
        .agg(
            (
                F.sum("_rev").cast("double") / F.sum("_price").cast("double")
            ).alias("margin"),
            F.grouping_id().alias("lochierarchy"),
        )
    )
    w = Window.partitionBy(
        "lochierarchy", F.when(F.col("lochierarchy") == 1, F.col("n_name"))
    ).orderBy("margin", "n_name", "l_returnflag")
    return rolled.select(
        "n_name",
        "l_returnflag",
        F.round("margin", 6).alias("margin"),
        "lochierarchy",
        F.rank().over(w).alias("rank_within_parent"),
    ).orderBy(
        F.desc("lochierarchy"), "n_name", "l_returnflag"
    )


TPCDS_Q36_SQL = f"""
WITH rolled AS (
  SELECT n_name, l_returnflag,
         CAST(SUM({REVENUE_TERM}) AS DOUBLE)
           / CAST(SUM({DEC_PRICE}) AS DOUBLE) AS margin,
         GROUPING(n_name) * 2 + GROUPING(l_returnflag) AS lochierarchy
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  GROUP BY ROLLUP(n_name, l_returnflag)
)
SELECT n_name, l_returnflag, ROUND(margin, 6) AS margin, lochierarchy,
       RANK() OVER (
         PARTITION BY lochierarchy,
                      CASE WHEN lochierarchy = 1 THEN n_name END
         ORDER BY margin, n_name, l_returnflag
       ) AS rank_within_parent
FROM rolled
ORDER BY lochierarchy DESC, n_name, l_returnflag
"""

# ---------------------------------------------------------------------------
# q44 shape — best/worst performers joined on rank (tpcds-q44.test)
# ---------------------------------------------------------------------------


def tpcds_q44_best_worst_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    part = read_table(spark, "part", sf_dir)
    perf = li.groupBy("l_partkey").agg(
        F.round(
            F.sum(dec("l_extendedprice") * one_minus("l_discount")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_rev")
    )
    # top-10 via orderBy().limit() = TakeOrderedAndProject (distributed
    # per-partition heaps, no single-partition global sort); the row_number
    # window then ranks only the 10 survivors.
    best10 = perf.orderBy(F.desc("avg_rev"), "l_partkey").limit(10)
    worst10 = perf.orderBy("avg_rev", "l_partkey").limit(10)
    best = best10.select(
        F.row_number()
        .over(Window.orderBy(F.desc("avg_rev"), "l_partkey"))
        .alias("rnk"),
        F.col("l_partkey").alias("best_part"),
    )
    worst = worst10.select(
        F.row_number().over(Window.orderBy("avg_rev", "l_partkey")).alias("rnk"),
        F.col("l_partkey").alias("worst_part"),
    )
    pb = part.select(F.col("p_partkey").alias("best_part"), F.col("p_name").alias("best_name"))
    pw = part.select(F.col("p_partkey").alias("worst_part"), F.col("p_name").alias("worst_name"))
    return (
        best.join(worst, "rnk")
        .join(F.broadcast(pb), "best_part")
        .join(F.broadcast(pw), "worst_part")
        .select("rnk", "best_name", "worst_name")
        .orderBy("rnk")
    )


TPCDS_Q44_SQL = f"""
WITH perf AS (
  SELECT l_partkey,
         ROUND(CAST(SUM({REVENUE_TERM}) AS DOUBLE) / COUNT(*), 6) AS avg_rev
  FROM lineitem GROUP BY l_partkey
),
best AS (
  SELECT ROW_NUMBER() OVER (ORDER BY avg_rev DESC, l_partkey) AS rnk,
         l_partkey AS best_part FROM perf
),
worst AS (
  SELECT ROW_NUMBER() OVER (ORDER BY avg_rev ASC, l_partkey) AS rnk,
         l_partkey AS worst_part FROM perf
)
SELECT best.rnk, pb.p_name AS best_name, pw.p_name AS worst_name
FROM best JOIN worst ON best.rnk = worst.rnk
JOIN part pb ON best.best_part = pb.p_partkey
JOIN part pw ON worst.worst_part = pw.p_partkey
WHERE best.rnk <= 10
ORDER BY best.rnk
"""

# ---------------------------------------------------------------------------
# q51 shape — two channels full-outer-joined on month + cumulative windows
# ---------------------------------------------------------------------------


def tpcds_q51_cumulative_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, "orders", sf_dir)
    li = read_table(spark, "lineitem", sf_dir)
    omonth = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).alias("mon")
    ).agg(F.sum(dec("o_totalprice")).alias("order_rev"))
    smonth = li.groupBy(
        F.date_trunc("month", F.col("l_shipdate")).alias("mon")
    ).agg(F.sum(dec("l_extendedprice") * one_minus("l_discount")).alias("ship_rev"))
    joined = omonth.join(smonth, "mon", "full_outer")
    w = Window.orderBy("mon").rowsBetween(Window.unboundedPreceding, 0)
    cum_o = F.sum(F.coalesce(F.col("order_rev"), F.lit(0))).over(w).cast("double")
    cum_s = F.sum(F.coalesce(F.col("ship_rev"), F.lit(0))).over(w).cast("double")
    return joined.select(
        "mon",
        cum_o.alias("cum_order_rev"),
        cum_s.alias("cum_ship_rev"),
        (cum_o > cum_s).alias("orders_ahead"),
    ).orderBy("mon")


TPCDS_Q51_SQL = f"""
WITH o AS (
  -- TIMESTAMP pin: DuckDB date_trunc('month') yields DATE, Spark TIMESTAMP
  SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS order_rev
  FROM orders GROUP BY mon
),
s AS (
  SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS mon,
         SUM({REVENUE_TERM}) AS ship_rev
  FROM lineitem GROUP BY mon
)
SELECT COALESCE(o.mon, s.mon) AS mon,
       CAST(SUM(COALESCE(order_rev, 0)) OVER (ORDER BY COALESCE(o.mon, s.mon)
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS cum_order_rev,
       CAST(SUM(COALESCE(ship_rev, 0)) OVER (ORDER BY COALESCE(o.mon, s.mon)
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS cum_ship_rev,
       CAST(SUM(COALESCE(order_rev, 0)) OVER (ORDER BY COALESCE(o.mon, s.mon)
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         > CAST(SUM(COALESCE(ship_rev, 0)) OVER (ORDER BY COALESCE(o.mon, s.mon)
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS orders_ahead
FROM o FULL OUTER JOIN s ON o.mon = s.mon
ORDER BY mon
"""

# ---------------------------------------------------------------------------
# q59 shape — weekday pivot (sum CASE) with year-over-year self-join
# ---------------------------------------------------------------------------


def tpcds_q59_weekday_pivot_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, "orders", sf_dir)
    # isodow: Monday=1..Sunday=7 in both engines (Spark weekday()+1)
    dow = F.weekday("o_orderdate") + 1
    weekly = orders.groupBy(
        F.year("o_orderdate").alias("d_year"),
        F.weekofyear("o_orderdate").alias("d_week"),
    ).agg(
        *[
            F.sum(F.when(dow == d, dec("o_totalprice")).otherwise(F.lit(0)))
            .cast("double")
            .alias(f"rev_d{d}")
            for d in (1, 2, 3)
        ]
    )
    y1 = weekly.select(
        "d_week",
        F.col("d_year").alias("year1"),
        F.col("rev_d1").alias("y1_d1"),
        F.col("rev_d2").alias("y1_d2"),
        F.col("rev_d3").alias("y1_d3"),
    )
    y2 = weekly.select(
        "d_week",
        (F.col("d_year") - 1).alias("year1"),
        F.col("rev_d1").alias("y2_d1"),
    )
    return (
        y1.join(y2, ["d_week", "year1"])
        .select("year1", "d_week", "y1_d1", "y1_d2", "y1_d3", "y2_d1")
        .orderBy("year1", "d_week")
    )


TPCDS_Q59_SQL = """
WITH weekly AS (
  SELECT CAST(year(o_orderdate) AS INT) AS d_year,
         CAST(weekofyear(o_orderdate) AS INT) AS d_week,
         CAST(SUM(CASE WHEN isodow(o_orderdate) = 1
                  THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE 0 END) AS DOUBLE) AS rev_d1,
         CAST(SUM(CASE WHEN isodow(o_orderdate) = 2
                  THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE 0 END) AS DOUBLE) AS rev_d2,
         CAST(SUM(CASE WHEN isodow(o_orderdate) = 3
                  THEN CAST(o_totalprice AS DECIMAL(12,2)) ELSE 0 END) AS DOUBLE) AS rev_d3
  FROM orders GROUP BY d_year, d_week
)
SELECT y1.d_year AS year1, y1.d_week,
       y1.rev_d1 AS y1_d1, y1.rev_d2 AS y1_d2, y1.rev_d3 AS y1_d3,
       y2.rev_d1 AS y2_d1
FROM weekly y1
JOIN weekly y2 ON y1.d_week = y2.d_week AND y2.d_year = y1.d_year + 1
ORDER BY year1, y1.d_week
"""

# ---------------------------------------------------------------------------
# q88 shape — scalar-subquery cross join of band counts (tpcds-q88.test)
# ---------------------------------------------------------------------------


def tpcds_q88_band_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)

    def band(lo: int, hi: int, name: str) -> DataFrame:
        return (
            li.filter((F.col("l_quantity") >= lo) & (F.col("l_quantity") < hi))
            .agg(F.count(F.lit(1)).alias(name))
        )

    return (
        band(1, 10, "h1")
        .crossJoin(band(10, 20, "h2"))
        .crossJoin(band(20, 35, "h3"))
        .crossJoin(band(35, 51, "h4"))
    )


TPCDS_Q88_SQL = """
SELECT (SELECT COUNT(*) FROM lineitem WHERE l_quantity >= 1 AND l_quantity < 10) AS h1,
       (SELECT COUNT(*) FROM lineitem WHERE l_quantity >= 10 AND l_quantity < 20) AS h2,
       (SELECT COUNT(*) FROM lineitem WHERE l_quantity >= 20 AND l_quantity < 35) AS h3,
       (SELECT COUNT(*) FROM lineitem WHERE l_quantity >= 35 AND l_quantity < 51) AS h4
"""

# ---------------------------------------------------------------------------
# q65 shape — dimension vs its own average: brands whose revenue is below
# 0.9 × the average brand revenue (scalar subquery over an aggregate CTE)
# ---------------------------------------------------------------------------


def tpcds_q65_below_avg_brands(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    part = read_table(spark, "part", sf_dir)
    brand_rev = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(dec("l_extendedprice") * one_minus("l_discount")).alias("rev"))
    )
    avg_rev = brand_rev.agg(
        (F.sum("rev").cast("double") / F.count(F.lit(1))).alias("avg_rev")
    )
    return (
        brand_rev.crossJoin(F.broadcast(avg_rev))
        .filter(F.col("rev").cast("double") < 0.9 * F.col("avg_rev"))
        .select("p_brand", F.col("rev").cast("double").alias("rev"))
        .orderBy("p_brand")
    )


TPCDS_Q65_SQL = f"""
WITH brand_rev AS (
  SELECT p_brand, SUM({REVENUE_TERM}) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY p_brand
)
SELECT p_brand, CAST(rev AS DOUBLE) AS rev
FROM brand_rev
WHERE CAST(rev AS DOUBLE) <
      0.9 * (SELECT CAST(SUM(rev) AS DOUBLE) / COUNT(*) FROM brand_rev)
ORDER BY p_brand
"""



# ---------------------------------------------------------------------------
# q95 shape — orders satisfying two correlated EXISTS on the same fact table
# (tpcds-q95.test: ws_wh multi-warehouse EXISTS + catalog-returns EXISTS)
# ---------------------------------------------------------------------------


def tpcds_q95_multi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders shipped from more than one supplier that also have at least
    one returned line: two semi-join reductions against self-aggregations
    of the same fact table, then a tiny rollup."""
    li = read_table(spark, "lineitem", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    multi_supp = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") > 1)
        .select("l_orderkey")
    )
    returned = (
        li.filter(F.col("l_returnflag") == "R").select("l_orderkey").distinct()
    )
    return (
        orders.join(multi_supp, orders.o_orderkey == multi_supp.l_orderkey, "leftsemi")
        .join(returned, orders.o_orderkey == returned.l_orderkey, "leftsemi")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum(dec("o_totalprice")).alias("total_price"),
        )
    )


TPCDS_Q95_SQL = """
SELECT COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM orders o
WHERE EXISTS (
        SELECT 1 FROM lineitem GROUP BY l_orderkey
        HAVING l_orderkey = o.o_orderkey AND COUNT(DISTINCT l_suppkey) > 1)
  AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o.o_orderkey AND l_returnflag = 'R')
"""


# ---------------------------------------------------------------------------
# q49 shape — per-channel worst-return ranking, channels unioned
# (tpcds-q49.test: web/catalog/store return ratios, rank <= k per channel)
# ---------------------------------------------------------------------------


def tpcds_q49_return_ratio_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per channel (synthetic: l_suppkey % 3 — the driver schema has no
    shipmode), rank parts by return ratio
    (returned qty / shipped qty) and keep the worst 5 per channel, union
    semantics across channels with the channel tag kept."""
    li = read_table(spark, "lineitem", sf_dir).withColumn(
        "channel", (F.col("l_suppkey") % 3).cast("int")
    )
    ratios = (
        li.groupBy("channel", "l_partkey")
        .agg(
            dsum(
                F.when(F.col("l_returnflag") == "R", dec("l_quantity")).otherwise(
                    F.lit(0).cast("decimal(18,4)")
                )
            ).alias("ret_qty"),
            dsum(dec("l_quantity")).alias("qty"),
        )
        .withColumn(
            "return_ratio",
            F.round(F.col("ret_qty").cast("double") / F.col("qty").cast("double"), 6),
        )
    )
    w = Window.partitionBy("channel").orderBy(
        F.desc("return_ratio"), "l_partkey"
    )
    return (
        ratios.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 5)
        .select("channel", "l_partkey", "return_ratio", "rnk")
        .orderBy("channel", "rnk", "l_partkey")
    )


TPCDS_Q49_SQL = """
WITH ratios AS (
  SELECT CAST(l_suppkey % 3 AS INT) AS channel, l_partkey,
         ROUND(CAST(SUM(CASE WHEN l_returnflag = 'R'
                        THEN CAST(l_quantity AS DECIMAL(18,4))
                        ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
               / CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE),
               6) AS return_ratio
  FROM lineitem
  GROUP BY channel, l_partkey
)
SELECT channel, l_partkey, return_ratio, rnk FROM (
  SELECT channel, l_partkey, return_ratio,
         RANK() OVER (PARTITION BY channel
                      ORDER BY return_ratio DESC, l_partkey) AS rnk
  FROM ratios
) WHERE rnk <= 5
ORDER BY channel, rnk, l_partkey
"""


# ---------------------------------------------------------------------------
# q17 shape — quantity stats (mean/stdev/cov) per part across order groups
# (tpcds-q17.test: store/catalog quantity statistics with stddev/mean)
# ---------------------------------------------------------------------------


def tpcds_q17_quantity_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per line status: mean, sample stdev, and coefficient of variation of
    line quantities, keeping only groups where cov > 0.5 — the
    stats-moments-with-HAVING shape."""
    li = read_table(spark, "lineitem", sf_dir)
    agg = li.groupBy("l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(F.col("l_quantity").cast("double")), 6).alias("qty_mean"),
        F.round(F.stddev_samp(F.col("l_quantity").cast("double")), 6).alias("qty_stdev"),
    )
    return (
        agg.withColumn(
            "qty_cov", F.round(F.col("qty_stdev") / F.col("qty_mean"), 6)
        )
        .filter(F.col("qty_cov") > 0.5)
        .orderBy("l_linestatus")
    )


TPCDS_Q17_SQL = """
SELECT l_linestatus, COUNT(*) AS n,
       ROUND(AVG(CAST(l_quantity AS DOUBLE)), 6) AS qty_mean,
       ROUND(STDDEV_SAMP(CAST(l_quantity AS DOUBLE)), 6) AS qty_stdev,
       ROUND(ROUND(STDDEV_SAMP(CAST(l_quantity AS DOUBLE)), 6)
             / ROUND(AVG(CAST(l_quantity AS DOUBLE)), 6), 6) AS qty_cov
FROM lineitem
GROUP BY l_linestatus
HAVING ROUND(ROUND(STDDEV_SAMP(CAST(l_quantity AS DOUBLE)), 6)
             / ROUND(AVG(CAST(l_quantity AS DOUBLE)), 6), 6) > 0.5
ORDER BY l_linestatus
"""


# ---------------------------------------------------------------------------
# q14 shape — INTERSECT of item sets across periods feeding a semi-joined agg
# (tpcds-q14: cross-channel common items -> sales over the common set)
# ---------------------------------------------------------------------------


def tpcds_q14_common_parts_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts shipped in BOTH halves of 1995 (INTERSECT, distinct
    semantics), then 1996 revenue by brand over that common set.

    Plan shape: two pruned key-only scans → intersect (Spark plans a
    left-semi over distinct keys) → semi-join gates the 1996 scan before
    the brand aggregation — the agg never sees non-common parts."""
    li = read_table(spark, "lineitem", sf_dir)
    part = read_table(spark, "part", sf_dir)
    h1 = li.filter(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1995-07-01")
    ).select("l_partkey")
    h2 = li.filter(
        (F.col("l_shipdate") >= "1995-07-01") & (F.col("l_shipdate") < "1996-01-01")
    ).select("l_partkey")
    common = h1.intersect(h2)
    rev96 = li.filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    ).join(common, "l_partkey", "semi")
    return (
        rev96.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            dsum(dec("l_extendedprice") * one_minus("l_discount")).alias("rev"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy(F.desc("rev"), F.asc("p_brand"))
        .limit(10)
    )


TPCDS_Q14_SQL = f"""
WITH common AS (
  SELECT l_partkey FROM lineitem
  WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1995-07-01'
  INTERSECT
  SELECT l_partkey FROM lineitem
  WHERE l_shipdate >= DATE '1995-07-01' AND l_shipdate < DATE '1996-01-01'
)
SELECT p_brand,
       CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS rev,
       COUNT(*) AS n_lines
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'
  AND l_partkey IN (SELECT l_partkey FROM common)
GROUP BY p_brand
ORDER BY rev DESC, p_brand LIMIT 10
"""


# ---------------------------------------------------------------------------
# q31 shape — windowed quarter-over-quarter growth of an aggregated series
# (tpcds-q31: per-county share growth across consecutive quarters)
# ---------------------------------------------------------------------------


def tpcds_q31_quarterly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation quarterly order revenue for 1995 with quarter-over-quarter
    growth via lag(): the window value-function-over-aggregate shape.

    Plan shape: star join (orders→customer→nation, dims broadcast) →
    hash agg to a tiny (nation, quarter) series → the lag window runs on
    that aggregate, never the fact table."""
    orders = read_table(spark, "orders", sf_dir)
    cust = read_table(spark, "customer", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    q = F.quarter("o_orderdate")
    series = (
        orders.filter(
            (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1996-01-01")
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), q.alias("qtr"))
        .agg(dsum(dec("o_totalprice")).alias("rev"))
    )
    w = Window.partitionBy("nation").orderBy("qtr")
    prev = F.lag("rev").over(w)
    return series.select(
        "nation",
        "qtr",
        "rev",
        F.round(F.col("rev").cast("double") / prev.cast("double"), 6).alias(
            "qoq_growth"
        ),
    ).orderBy("nation", "qtr")


TPCDS_Q31_SQL = """
WITH series AS (
  SELECT n_name AS nation,
         CAST(quarter(o_orderdate) AS INT) AS qtr,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
  GROUP BY 1, 2
)
SELECT nation, qtr, rev,
       ROUND(CAST(rev AS DOUBLE)
             / CAST(lag(rev) OVER (PARTITION BY nation ORDER BY qtr) AS DOUBLE),
             6) AS qoq_growth
FROM series ORDER BY nation, qtr
"""


QUERIES: dict[str, tuple] = {
    "tpcds_q14_common_parts_revenue": (
        tpcds_q14_common_parts_revenue,
        TPCDS_Q14_SQL,
    ),
    "tpcds_q31_quarterly_growth": (tpcds_q31_quarterly_growth, TPCDS_Q31_SQL),
    "tpcds_q3_brand_year_topn": (tpcds_q3_brand_year_topn, TPCDS_Q3_SQL),
    "tpcds_q7_avg_measures": (tpcds_q7_avg_measures, TPCDS_Q7_SQL),
    "tpcds_q11_yoy_growth": (tpcds_q11_yoy_growth, TPCDS_Q11_SQL),
    "tpcds_q23_frequent_parts": (tpcds_q23_frequent_parts, TPCDS_Q23_SQL),
    "tpcds_q34_order_size_buckets": (tpcds_q34_order_size_buckets, TPCDS_Q34_SQL),
    "tpcds_q36_margin_rollup_rank": (tpcds_q36_margin_rollup_rank, TPCDS_Q36_SQL),
    "tpcds_q44_best_worst_parts": (tpcds_q44_best_worst_parts, TPCDS_Q44_SQL),
    "tpcds_q51_cumulative_channels": (tpcds_q51_cumulative_channels, TPCDS_Q51_SQL),
    "tpcds_q59_weekday_pivot_yoy": (tpcds_q59_weekday_pivot_yoy, TPCDS_Q59_SQL),
    "tpcds_q88_band_counts": (tpcds_q88_band_counts, TPCDS_Q88_SQL),
    "tpcds_q65_below_avg_brands": (tpcds_q65_below_avg_brands, TPCDS_Q65_SQL),
    "tpcds_q95_multi_exists": (tpcds_q95_multi_exists, TPCDS_Q95_SQL),
    "tpcds_q49_return_ratio_rank": (tpcds_q49_return_ratio_rank, TPCDS_Q49_SQL),
    "tpcds_q17_quantity_stats": (tpcds_q17_quantity_stats, TPCDS_Q17_SQL),
}
