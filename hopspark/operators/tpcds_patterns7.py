"""TPC-DS-pattern workload slice, part 7 — 14 more plan shapes (→ 100).

Round-4 second widening (reference corpus: testdata/workloads/tpcds/queries/).
Covers the remaining distinctive shapes: OR-across-dims qualification (q15),
HAVING vs a global scalar average (q24), 3-level rollup profile (q27),
pivot-date before/after split (q40), weekday pivot (q43), latency bands
(q50/q99), disjoint-filter UNION re-aggregation (q56), channel x month
union matrix (q71), returns-netted channel/brand rollup (q80), IN-list dim
probe with quantity band (q82), OR-band conditional profile (q85), window
avg deviation by month (q89), and correlated 1.3x-average filter (q92).

Same adaptation + determinism discipline as parts 1-6 (see part 6 header).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hopspark.catalog import read_table
from hopspark.operators._util import REVENUE_TERM, dec
from hopspark.operators.tpcds_patterns2 import LOW, URGENT, _li_orders, _rev

# ---------------------------------------------------------------------------
# q15 shape — dim qualification by an OR across a fact aggregate and a dim
# attribute (zip IN ... OR state IN ... OR sales > k)
# ---------------------------------------------------------------------------


def tpcds_q15_or_qualification(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    per_cust = (
        orders.filter(F.year("o_orderdate") == 1996)
        .groupBy("o_custkey")
        .agg(F.sum(dec("o_totalprice")).alias("total"))
    )
    joined = cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
    qualified = joined.filter(
        (F.col("c_mktsegment").isin("AUTOMOBILE", "MACHINERY"))
        | (F.col("c_nationkey") < 3)
        | (F.col("total").cast("double") > 400000)
    )
    return (
        qualified.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(F.coalesce(F.col("total"), F.lit(0).cast("decimal(12,2)")))
            .cast("double")
            .alias("total_1996"),
        )
        .orderBy("c_nationkey")
    )


TPCDS_Q15_SQL = """
WITH per_cust AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total
  FROM orders WHERE year(o_orderdate) = 1996 GROUP BY 1
)
SELECT c_nationkey, COUNT(*) AS n_cust,
       CAST(SUM(COALESCE(total, 0)) AS DOUBLE) AS total_1996
FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
WHERE c_mktsegment IN ('AUTOMOBILE','MACHINERY')
   OR c_nationkey < 3
   OR CAST(total AS DOUBLE) > 400000
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q24 shape — pair aggregate HAVING > k x the GLOBAL average of the same
# aggregate (scalar broadcast against the grouped CTE)
# ---------------------------------------------------------------------------


def tpcds_q24_above_global_avg_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    pair = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(_rev()).alias("rev")
    )
    glob = pair.agg(
        (F.sum("rev").cast("double") / F.count(F.lit(1))).alias("avg_rev")
    )
    return (
        pair.crossJoin(glob)
        .filter(F.col("rev").cast("double") > 5 * F.col("avg_rev"))
        .select(
            "l_suppkey",
            "l_partkey",
            F.col("rev").cast("double").alias("rev"),
            F.round("avg_rev", 6).alias("avg_rev"),
        )
        .orderBy("l_suppkey", "l_partkey")
    )


TPCDS_Q24_SQL = f"""
WITH pair AS (
  SELECT l_suppkey, l_partkey, SUM({REVENUE_TERM}) AS rev
  FROM lineitem GROUP BY 1, 2
), overall AS (
  SELECT CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS avg_rev FROM pair
)
SELECT l_suppkey, l_partkey, CAST(rev AS DOUBLE) AS rev,
       ROUND(avg_rev, 6) AS avg_rev
FROM pair, overall
WHERE CAST(rev AS DOUBLE) > 5 * avg_rev
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# q27 shape — 3-level ROLLUP (region > nation > segment) with exact-avg
# measures at every level
# ---------------------------------------------------------------------------


def tpcds_q27_three_level_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    region = read_table(spark, "region", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    base = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
    )
    # pre-aggregate at the finest grain; rollup re-aggregates the partials
    # (Expand over ~125 rows instead of the order fact — see q18)
    fine = base.groupBy("r_name", "n_name", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(dec("o_totalprice")).alias("ps"),
    )
    return (
        fine.rollup("r_name", "n_name", "c_mktsegment")
        .agg(
            F.sum("pn").alias("n_orders"),
            (F.sum("ps").cast("double") / F.sum("pn")).alias("avg_price"),
            F.grouping_id().alias("gid"),
        )
        .filter(F.col("n_orders") >= 500)
        .orderBy("gid", "r_name", "n_name", "c_mktsegment")
    )


TPCDS_Q27_SQL = """
SELECT r_name, n_name, c_mktsegment, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
         AS avg_price,
       GROUPING(r_name, n_name, c_mktsegment) AS gid
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name, c_mktsegment)
HAVING COUNT(*) >= 500
ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST,
         c_mktsegment NULLS FIRST
"""


# ---------------------------------------------------------------------------
# q40 shape — before/after split around a pivot date, per brand, in one scan
# ---------------------------------------------------------------------------


def tpcds_q40_pivot_date_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    base = (
        _li_orders(spark, sf_dir)
        .join(part, F.col("l_partkey") == part.p_partkey)
        .filter(F.year("o_orderdate").isin(1995))
    )
    pivot = F.lit("1995-06-17").cast("timestamp")
    return (
        base.groupBy("p_brand")
        .agg(
            F.sum(F.when(F.col("o_orderdate") < pivot, _rev()))
            .cast("double")
            .alias("rev_before"),
            F.sum(F.when(F.col("o_orderdate") >= pivot, _rev()))
            .cast("double")
            .alias("rev_after"),
        )
        .orderBy("p_brand")
    )


TPCDS_Q40_SQL = f"""
SELECT p_brand,
       CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1995-06-17'
                     THEN {REVENUE_TERM} END) AS DOUBLE) AS rev_before,
       CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1995-06-17'
                     THEN {REVENUE_TERM} END) AS DOUBLE) AS rev_after
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
WHERE year(o_orderdate) = 1995
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q43 shape — weekday pivot: per-nation revenue split across the 7 weekdays
# in one scan (engine-neutral weekday: days since a known Sunday, mod 7)
# ---------------------------------------------------------------------------


def tpcds_q43_weekday_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    # 1992-01-05 is a Sunday; datediff % 7 gives 0=Sun..6=Sat identically in
    # both engines (Spark dayofweek=1..7 vs DuckDB dayofweek=0..6 would not)
    dow = F.pmod(
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-05").cast("date")), 7
    )
    base = orders.join(cust, orders.o_custkey == cust.c_custkey).withColumn(
        "dow", dow
    )
    aggs = [
        F.sum(F.when(F.col("dow") == d, dec("o_totalprice")))
        .cast("double")
        .alias(n)
        for d, n in enumerate(
            ["sun", "mon", "tue", "wed", "thu", "fri", "sat"]
        )
    ]
    return base.groupBy("c_nationkey").agg(*aggs).orderBy("c_nationkey")


_DOW = "((DATEDIFF('day', DATE '1992-01-05', o_orderdate) % 7 + 7) % 7)"
TPCDS_Q43_SQL = f"""
SELECT c_nationkey,
  CAST(SUM(CASE WHEN {_DOW} = 0 THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS sun,
  CAST(SUM(CASE WHEN {_DOW} = 1 THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS mon,
  CAST(SUM(CASE WHEN {_DOW} = 2 THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS tue,
  CAST(SUM(CASE WHEN {_DOW} = 3 THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS wed,
  CAST(SUM(CASE WHEN {_DOW} = 4 THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS thu,
  CAST(SUM(CASE WHEN {_DOW} = 5 THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS fri,
  CAST(SUM(CASE WHEN {_DOW} = 6 THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS sat
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q50 shape — ship-latency bands per supplier nation (order date → ship date)
# ---------------------------------------------------------------------------


def tpcds_q50_latency_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = read_table(spark, "supplier", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    base = (
        _li_orders(spark, sf_dir)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .withColumn("lat", F.datediff("l_shipdate", "o_orderdate"))
    )

    def band(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).alias(name)

    lat = F.col("lat")
    return (
        base.groupBy("n_name")
        .agg(
            band(lat <= 30, "d30"),
            band((lat > 30) & (lat <= 60), "d60"),
            band((lat > 60) & (lat <= 90), "d90"),
            band((lat > 90) & (lat <= 120), "d120"),
            band(lat > 120, "d120_plus"),
        )
        .orderBy("n_name")
    )


TPCDS_Q50_SQL = """
SELECT n_name,
  CAST(SUM(CASE WHEN lat <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
  CAST(SUM(CASE WHEN lat > 30 AND lat <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
  CAST(SUM(CASE WHEN lat > 60 AND lat <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
  CAST(SUM(CASE WHEN lat > 90 AND lat <= 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120,
  CAST(SUM(CASE WHEN lat > 120 THEN 1 ELSE 0 END) AS BIGINT) AS d120_plus
FROM (
  SELECT n_name, DATEDIFF('day', o_orderdate, l_shipdate) AS lat
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
)
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q56/q60 shape — the SAME aggregate under three disjoint dim filters,
# UNION ALL'd then re-aggregated per brand
# ---------------------------------------------------------------------------


def tpcds_q56_disjoint_union_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    base = _li_orders(spark, sf_dir).join(
        part, F.col("l_partkey") == part.p_partkey
    )

    def slice_rev(prios):
        return (
            base.filter(F.col("o_orderpriority").isin(*prios))
            .groupBy("p_brand")
            .agg(F.sum(_rev()).alias("rev"))
        )

    unioned = (
        slice_rev(URGENT)
        .unionAll(slice_rev(("3-MEDIUM",)))
        .unionAll(slice_rev(LOW))
    )
    return (
        unioned.groupBy("p_brand")
        .agg(F.sum("rev").cast("double").alias("total_rev"))
        .orderBy(F.desc("total_rev"), "p_brand")
        .limit(25)
    )


TPCDS_Q56_SQL = f"""
WITH u AS (
  SELECT p_brand, SUM({REVENUE_TERM}) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE o_orderpriority IN ('1-URGENT','2-HIGH') GROUP BY 1
  UNION ALL
  SELECT p_brand, SUM({REVENUE_TERM}) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE o_orderpriority IN ('3-MEDIUM') GROUP BY 1
  UNION ALL
  SELECT p_brand, SUM({REVENUE_TERM}) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE o_orderpriority IN ('4-NOT SPECIFIED','5-LOW') GROUP BY 1
)
SELECT p_brand, CAST(SUM(rev) AS DOUBLE) AS total_rev
FROM u GROUP BY 1
ORDER BY total_rev DESC, p_brand
LIMIT 25
"""


# ---------------------------------------------------------------------------
# q71 shape — channel x month matrix from a single UNION of labeled slices
# ---------------------------------------------------------------------------


def tpcds_q71_channel_month_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _li_orders(spark, sf_dir).withColumn(
        "channel",
        F.when(F.col("o_orderpriority").isin(*URGENT), F.lit("express"))
        .when(F.col("o_orderpriority").isin(*LOW), F.lit("bulk"))
        .otherwise(F.lit("standard")),
    )
    return (
        base.filter(F.year("o_orderdate") == 1997)
        .withColumn("mo", F.month("o_orderdate"))
        .groupBy("channel", "mo")
        .agg(F.sum(_rev()).cast("double").alias("rev"))
        .orderBy("channel", "mo")
    )


TPCDS_Q71_SQL = f"""
SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'express'
            WHEN o_orderpriority IN ('4-NOT SPECIFIED','5-LOW') THEN 'bulk'
            ELSE 'standard' END AS channel,
       month(o_orderdate) AS mo,
       CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS rev
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE year(o_orderdate) = 1997
GROUP BY 1, 2 ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# q80 shape — returns-netted channel x brand ROLLUP (gross minus returned)
# ---------------------------------------------------------------------------


def tpcds_q80_netted_channel_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    base = (
        _li_orders(spark, sf_dir)
        .join(part, F.col("l_partkey") == part.p_partkey)
        .withColumn(
            "channel",
            F.when(F.col("o_orderpriority").isin(*URGENT), F.lit("express"))
            .when(F.col("o_orderpriority").isin(*LOW), F.lit("bulk"))
            .otherwise(F.lit("standard")),
        )
    )
    net = F.when(F.col("l_returnflag") == "R", -_rev()).otherwise(_rev())
    # finest-grain pre-aggregation before the rollup Expand (see q18)
    fine = base.groupBy("channel", "p_brand").agg(F.sum(net).alias("pnet"))
    return (
        fine.rollup("channel", "p_brand")
        .agg(
            F.sum("pnet").cast("double").alias("net_rev"),
            F.grouping_id().alias("gid"),
        )
        .filter((F.col("gid") > 0) | (F.col("net_rev") < 0))
        .orderBy("gid", "channel", "p_brand")
    )


TPCDS_Q80_SQL = f"""
SELECT channel, p_brand, CAST(SUM(net) AS DOUBLE) AS net_rev,
       GROUPING(channel, p_brand) AS gid
FROM (
  SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'express'
              WHEN o_orderpriority IN ('4-NOT SPECIFIED','5-LOW') THEN 'bulk'
              ELSE 'standard' END AS channel,
         p_brand,
         CASE WHEN l_returnflag = 'R' THEN -({REVENUE_TERM})
              ELSE {REVENUE_TERM} END AS net
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
)
GROUP BY ROLLUP (channel, p_brand)
HAVING GROUPING(channel, p_brand) > 0 OR CAST(SUM(net) AS DOUBLE) < 0
ORDER BY gid, channel NULLS FIRST, p_brand NULLS FIRST
"""


# ---------------------------------------------------------------------------
# q82 shape — IN-list dim probe: parts of select sizes with heavy lines
# ---------------------------------------------------------------------------


def tpcds_q82_inlist_dim_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    li = read_table(spark, "lineitem", sf_dir)
    sized = part.filter(F.col("p_size").isin(5, 10, 15, 20, 25))
    heavy = li.filter(F.col("l_quantity") >= 45)
    return (
        sized.join(heavy, sized.p_partkey == heavy.l_partkey, "left_semi")
        .select("p_partkey", "p_name", "p_size")
        .orderBy("p_partkey")
    )


TPCDS_Q82_SQL = """
SELECT p_partkey, p_name, p_size
FROM part
WHERE p_size IN (5, 10, 15, 20, 25)
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_partkey = p_partkey AND l_quantity >= 45)
ORDER BY p_partkey
"""


# ---------------------------------------------------------------------------
# q85 shape — OR-of-band predicates feeding per-band conditional averages
# ---------------------------------------------------------------------------


def tpcds_q85_or_band_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    base = (
        read_table(spark, "orders", sf_dir)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
    )
    b1 = (F.col("c_acctbal") >= 0) & (F.col("o_totalprice") < 50000)
    b2 = (F.col("c_acctbal") < 0) & (F.col("o_totalprice") >= 50000)
    b3 = (F.col("c_mktsegment") == "BUILDING") & (
        F.col("o_orderpriority").isin(*URGENT)
    )
    filtered = base.filter(b1 | b2 | b3)

    def avg_if(cond, name):
        return (
            F.sum(F.when(cond, dec("o_totalprice"))).cast("double")
            / F.sum(F.when(cond, 1))
        ).alias(name)

    return filtered.agg(
        avg_if(b1, "avg_band1"),
        avg_if(b2, "avg_band2"),
        avg_if(b3, "avg_band3"),
        F.count(F.lit(1)).alias("n_rows"),
    )


TPCDS_Q85_SQL = """
SELECT
  CAST(SUM(CASE WHEN c_acctbal >= 0 AND o_totalprice < 50000
                THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE)
    / SUM(CASE WHEN c_acctbal >= 0 AND o_totalprice < 50000 THEN 1 END)
    AS avg_band1,
  CAST(SUM(CASE WHEN c_acctbal < 0 AND o_totalprice >= 50000
                THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE)
    / SUM(CASE WHEN c_acctbal < 0 AND o_totalprice >= 50000 THEN 1 END)
    AS avg_band2,
  CAST(SUM(CASE WHEN c_mktsegment = 'BUILDING'
                AND o_orderpriority IN ('1-URGENT','2-HIGH')
                THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE)
    / SUM(CASE WHEN c_mktsegment = 'BUILDING'
               AND o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 END)
    AS avg_band3,
  COUNT(*) AS n_rows
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE (c_acctbal >= 0 AND o_totalprice < 50000)
   OR (c_acctbal < 0 AND o_totalprice >= 50000)
   OR (c_mktsegment = 'BUILDING'
       AND o_orderpriority IN ('1-URGENT','2-HIGH'))
"""


# ---------------------------------------------------------------------------
# q89 shape — deviation from the year's monthly average per nation (window
# avg over the aggregate, filter on relative deviation)
# ---------------------------------------------------------------------------


def tpcds_q89_monthly_avg_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    monthly = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.year("o_orderdate") == 1997)
        .withColumn("mo", F.month("o_orderdate"))
        .groupBy("c_nationkey", "mo")
        .agg(F.sum(dec("o_totalprice")).alias("rev"))
    )
    w = Window.partitionBy("c_nationkey")
    avg_rev = F.sum("rev").over(w).cast("double") / F.count(F.lit(1)).over(w)
    dev = F.round(
        (F.col("rev").cast("double") - avg_rev) / avg_rev, 6
    )
    return (
        monthly.select(
            "c_nationkey",
            "mo",
            F.col("rev").cast("double").alias("rev"),
            dev.alias("rel_dev"),
        )
        .filter(F.abs(F.col("rel_dev")) > 0.5)
        .orderBy("c_nationkey", "mo")
    )


TPCDS_Q89_SQL = """
WITH monthly AS (
  SELECT c_nationkey, month(o_orderdate) AS mo,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
  FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE year(o_orderdate) = 1997
  GROUP BY 1, 2
)
SELECT c_nationkey, mo, CAST(rev AS DOUBLE) AS rev, rel_dev
FROM (
  SELECT c_nationkey, mo, rev,
         ROUND((CAST(rev AS DOUBLE)
                - CAST(SUM(rev) OVER (PARTITION BY c_nationkey) AS DOUBLE)
                  / COUNT(*) OVER (PARTITION BY c_nationkey))
               / (CAST(SUM(rev) OVER (PARTITION BY c_nationkey) AS DOUBLE)
                  / COUNT(*) OVER (PARTITION BY c_nationkey)), 6) AS rel_dev
  FROM monthly
)
WHERE ABS(rel_dev) > 0.5
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# q92 shape — lines above 1.3x the per-part average within a date window
# (correlated average filter, expressed as an aggregate join)
# ---------------------------------------------------------------------------


def tpcds_q92_above_1_3x_part_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir).filter(
        F.year("l_shipdate") == 1995
    )
    rev = _rev()
    lines = li.select(
        "l_partkey", "l_orderkey", "l_linenumber", rev.alias("line_rev")
    )
    part_avg = lines.groupBy("l_partkey").agg(
        (F.sum("line_rev").cast("double") / F.count(F.lit(1))).alias("part_avg")
    )
    return (
        lines.join(part_avg, "l_partkey")
        .filter(F.col("line_rev").cast("double") > 1.3 * F.col("part_avg"))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("line_rev").cast("double").alias("excess_rev"),
        )
    )


TPCDS_Q92_SQL = f"""
WITH lines AS (
  SELECT l_partkey, {REVENUE_TERM} AS line_rev
  FROM lineitem WHERE year(l_shipdate) = 1995
), part_avg AS (
  SELECT l_partkey, CAST(SUM(line_rev) AS DOUBLE) / COUNT(*) AS part_avg
  FROM lines GROUP BY 1
)
SELECT COUNT(*) AS n_lines, CAST(SUM(line_rev) AS DOUBLE) AS excess_rev
FROM lines JOIN part_avg USING (l_partkey)
WHERE CAST(line_rev AS DOUBLE) > 1.3 * part_avg
"""


# ---------------------------------------------------------------------------
# q99 shape — month x latency-band count matrix
# ---------------------------------------------------------------------------


def tpcds_q99_month_latency_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        _li_orders(spark, sf_dir)
        .filter(F.year("o_orderdate") == 1996)
        .withColumn("mo", F.month("o_orderdate"))
        .withColumn("lat", F.datediff("l_shipdate", "o_orderdate"))
    )
    lat = F.col("lat")

    def band(cond, name):
        return F.sum(F.when(cond, 1).otherwise(0)).alias(name)

    return (
        base.groupBy("mo")
        .agg(
            band(lat <= 30, "d30"),
            band((lat > 30) & (lat <= 60), "d60"),
            band((lat > 60) & (lat <= 90), "d90"),
            band(lat > 90, "d90_plus"),
        )
        .orderBy("mo")
    )


TPCDS_Q99_SQL = """
SELECT month(o_orderdate) AS mo,
  CAST(SUM(CASE WHEN lat <= 30 THEN 1 ELSE 0 END) AS BIGINT) AS d30,
  CAST(SUM(CASE WHEN lat > 30 AND lat <= 60 THEN 1 ELSE 0 END) AS BIGINT) AS d60,
  CAST(SUM(CASE WHEN lat > 60 AND lat <= 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90,
  CAST(SUM(CASE WHEN lat > 90 THEN 1 ELSE 0 END) AS BIGINT) AS d90_plus
FROM (
  SELECT o_orderdate, DATEDIFF('day', o_orderdate, l_shipdate) AS lat
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(o_orderdate) = 1996
)
GROUP BY 1 ORDER BY 1
"""


QUERIES: dict[str, tuple] = {
    "tpcds_q15_or_qualification": (
        tpcds_q15_or_qualification, TPCDS_Q15_SQL),
    "tpcds_q24_above_global_avg_pairs": (
        tpcds_q24_above_global_avg_pairs, TPCDS_Q24_SQL),
    "tpcds_q27_three_level_rollup": (
        tpcds_q27_three_level_rollup, TPCDS_Q27_SQL),
    "tpcds_q40_pivot_date_split": (
        tpcds_q40_pivot_date_split, TPCDS_Q40_SQL),
    "tpcds_q43_weekday_pivot": (tpcds_q43_weekday_pivot, TPCDS_Q43_SQL),
    "tpcds_q50_latency_bands": (tpcds_q50_latency_bands, TPCDS_Q50_SQL),
    "tpcds_q56_disjoint_union_reagg": (
        tpcds_q56_disjoint_union_reagg, TPCDS_Q56_SQL),
    "tpcds_q71_channel_month_matrix": (
        tpcds_q71_channel_month_matrix, TPCDS_Q71_SQL),
    "tpcds_q80_netted_channel_rollup": (
        tpcds_q80_netted_channel_rollup, TPCDS_Q80_SQL),
    "tpcds_q82_inlist_dim_probe": (
        tpcds_q82_inlist_dim_probe, TPCDS_Q82_SQL),
    "tpcds_q85_or_band_profile": (tpcds_q85_or_band_profile, TPCDS_Q85_SQL),
    "tpcds_q89_monthly_avg_deviation": (
        tpcds_q89_monthly_avg_deviation, TPCDS_Q89_SQL),
    "tpcds_q92_above_1_3x_part_avg": (
        tpcds_q92_above_1_3x_part_avg, TPCDS_Q92_SQL),
    "tpcds_q99_month_latency_matrix": (
        tpcds_q99_month_latency_matrix, TPCDS_Q99_SQL),
}
