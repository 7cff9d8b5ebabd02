"""TPC-DS-pattern workload slice, part 6 — 16 more plan shapes.

Round-4 widening (reference corpus: testdata/workloads/tpcds/queries/, 205
files), prioritizing the shapes the round-3 verdict called unexercised:
GROUPING SETS over derived channels (q18/q22/q27 family), windowed
percentile-within-group (q49/q51a), correlated NOT EXISTS + rollup
(q16/q30/q69 family), and multi-level CTE reuse (q11/q64/q74).

Adaptation discipline (same as parts 1-5): the reference queries' PLAN
SHAPES are re-derived on the driver's reduced TPC-H-ish schema —
channel = o_orderpriority bands, store/catalog/web = priority classes,
date_dim = o_orderdate arithmetic — with hand-written DuckDB oracle twins.
No reference query text is copied.  Determinism: exact-decimal money math
(operators/_util.py), full tie-broken ORDER BY, ratios rounded at 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hopspark.catalog import read_table
from hopspark.operators._util import REVENUE_TERM, dec
from hopspark.operators.tpcds_patterns2 import LOW, URGENT, _li_orders, _rev

# ---------------------------------------------------------------------------
# q18/q27 shape — GROUPING SETS over a DERIVED channel column + a dim
# attribute, with grouping_id disambiguating the null rows
# ---------------------------------------------------------------------------


def tpcds_q18_grouping_sets_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    base = (
        _li_orders(spark, sf_dir)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .withColumn(
            "channel",
            F.when(F.col("o_orderpriority").isin(*URGENT), F.lit("express"))
            .when(F.col("o_orderpriority").isin(*LOW), F.lit("bulk"))
            .otherwise(F.lit("standard")),
        )
    )
    # Pre-aggregate to the finest grouping grain BEFORE the grouping sets:
    # Expand multiplies its input by the number of sets, so expanding the
    # raw fact triples 600k rows (and at 100 TB, the full scan) — expanding
    # the ~15-row (channel, segment) partial is free. SUM/COUNT re-aggregate
    # losslessly across the coarser sets.
    fine = (
        base.select("channel", "c_mktsegment", _rev().alias("r"))
        .groupBy("channel", "c_mktsegment")
        .agg(F.sum("r").alias("pr"), F.count(F.lit(1)).alias("pn"))
    )
    return (
        fine.groupingSets(
            [["channel", "c_mktsegment"], ["channel"], []],
            "channel",
            "c_mktsegment",
        )
        .agg(
            F.sum("pr").cast("double").alias("rev"),
            F.sum("pn").alias("n_lines"),
            F.grouping_id().alias("gid"),
        )
        .orderBy("gid", "channel", "c_mktsegment")
    )


TPCDS_Q18_SQL = f"""
WITH base AS (
  SELECT CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'express'
              WHEN o_orderpriority IN ('4-NOT SPECIFIED','5-LOW') THEN 'bulk'
              ELSE 'standard' END AS channel,
         c_mktsegment, {REVENUE_TERM} AS r
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
)
SELECT channel, c_mktsegment, CAST(SUM(r) AS DOUBLE) AS rev,
       COUNT(*) AS n_lines, GROUPING(channel, c_mktsegment) AS gid
FROM base
GROUP BY GROUPING SETS ((channel, c_mktsegment), (channel), ())
ORDER BY gid, channel NULLS FIRST, c_mktsegment NULLS FIRST
"""


# ---------------------------------------------------------------------------
# q49/q51a shape — percentile WITHIN group via window percent_rank: orders in
# the top decile of their market segment by value
# ---------------------------------------------------------------------------


def tpcds_q49_top_decile_within_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    seg_orders = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment", "o_orderkey", dec("o_totalprice").alias("price")
    )
    w = Window.partitionBy("c_mktsegment").orderBy("price", "o_orderkey")
    ranked = seg_orders.select(
        "c_mktsegment",
        "o_orderkey",
        F.col("price").cast("double").alias("price"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )
    return (
        ranked.filter(F.col("pr") >= 0.998)
        .orderBy("c_mktsegment", "o_orderkey")
    )


TPCDS_Q49_SQL = """
SELECT c_mktsegment, o_orderkey, CAST(price AS DOUBLE) AS price, pr
FROM (
  SELECT c_mktsegment, o_orderkey, price,
         ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                    ORDER BY price, o_orderkey), 6) AS pr
  FROM (SELECT c_mktsegment, o_orderkey,
               CAST(o_totalprice AS DECIMAL(12,2)) AS price
        FROM orders JOIN customer ON o_custkey = c_custkey)
)
WHERE pr >= 0.998
ORDER BY c_mktsegment, o_orderkey
"""


# ---------------------------------------------------------------------------
# q16/q69 shape — correlated EXISTS + NOT EXISTS against two fact slices,
# aggregated with ROLLUP over the dim hierarchy
# ---------------------------------------------------------------------------


def tpcds_q16_exists_not_exists_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    nation = read_table(spark, "nation", sf_dir)
    region = read_table(spark, "region", sf_dir)
    cust = read_table(spark, "customer", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    active = orders.select("o_custkey").distinct()
    low = (
        orders.filter(F.col("o_orderpriority").isin(*LOW))
        .select("o_custkey")
        .distinct()
    )
    qualifying = (
        cust.join(active, cust.c_custkey == active.o_custkey, "left_semi")
        .join(low, cust.c_custkey == low.o_custkey, "left_anti")
    )
    return (
        qualifying.join(nation, F.col("c_nationkey") == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(dec("c_acctbal")).cast("double").alias("total_bal"),
            F.grouping_id().alias("gid"),
        )
        .orderBy("gid", "r_name", "n_name")
    )


TPCDS_Q16_SQL = """
SELECT r_name, n_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal,
       GROUPING(r_name, n_name) AS gid
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
  AND NOT EXISTS (
    SELECT 1 FROM orders WHERE o_custkey = c_custkey
      AND o_orderpriority IN ('4-NOT SPECIFIED','5-LOW'))
GROUP BY ROLLUP (r_name, n_name)
ORDER BY gid, r_name NULLS FIRST, n_name NULLS FIRST
"""


# ---------------------------------------------------------------------------
# q11/q74 shape — multi-level CTE reuse: the SAME per-customer yearly
# aggregate CTE joined against itself for two years; growth-ratio filter
# ---------------------------------------------------------------------------


def tpcds_q74_yoy_customer_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q11/q74 shape. The reference joins the same yearly CTE against
    itself; pushing each year filter through the aggregate would scan the
    fact TWICE. Spark-first: ONE scan with per-year conditional sums —
    identical result (the oracle keeps the reference's self-join form),
    half the IO at 100 TB."""
    orders = read_table(spark, "orders", sf_dir)
    yr = F.year("o_orderdate")
    both = (
        orders.filter(yr.isin(1996, 1997))
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(yr == 1996, dec("o_totalprice"))).alias("t1"),
            F.sum(F.when(yr == 1997, dec("o_totalprice"))).alias("t2"),
        )
        .filter(F.col("t1").isNotNull() & F.col("t2").isNotNull())
    )
    ratio = F.round(F.col("t2").cast("double") / F.col("t1").cast("double"), 6)
    return (
        both.select(
            "o_custkey",
            F.col("t1").cast("double").alias("total_1996"),
            F.col("t2").cast("double").alias("total_1997"),
            ratio.alias("growth"),
        )
        .filter(F.col("growth") > 2.0)
        .orderBy(F.desc("growth"), "o_custkey")
    )


TPCDS_Q74_SQL = """
WITH yearly AS (
  SELECT o_custkey, year(o_orderdate) AS yr,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total
  FROM orders WHERE year(o_orderdate) IN (1996, 1997)
  GROUP BY 1, 2
)
SELECT y1.o_custkey,
       CAST(y1.total AS DOUBLE) AS total_1996,
       CAST(y2.total AS DOUBLE) AS total_1997,
       ROUND(CAST(y2.total AS DOUBLE) / CAST(y1.total AS DOUBLE), 6) AS growth
FROM yearly y1 JOIN yearly y2 ON y1.o_custkey = y2.o_custkey
WHERE y1.yr = 1996 AND y2.yr = 1997
  AND ROUND(CAST(y2.total AS DOUBLE) / CAST(y1.total AS DOUBLE), 6) > 2.0
ORDER BY growth DESC, y1.o_custkey
"""


# ---------------------------------------------------------------------------
# q1/q30 shape — per-entity metric vs 1.2x the per-group average of the SAME
# aggregate CTE (referenced twice at different grains)
# ---------------------------------------------------------------------------


def tpcds_q30_above_1_2x_nation_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    per_cust = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum(dec("o_totalprice")).alias("total"))
    )
    nation_avg = per_cust.groupBy("c_nationkey").agg(
        (F.sum("total").cast("double") / F.count(F.lit(1))).alias("nat_avg")
    )
    return (
        per_cust.join(nation_avg, "c_nationkey")
        .filter(F.col("total").cast("double") > 1.2 * F.col("nat_avg"))
        .select(
            "c_nationkey",
            "c_custkey",
            F.col("total").cast("double").alias("total"),
            F.round("nat_avg", 6).alias("nat_avg"),
        )
        .orderBy("c_nationkey", "c_custkey")
    )


TPCDS_Q30_SQL = """
WITH per_cust AS (
  SELECT c_custkey, c_nationkey,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), nation_avg AS (
  SELECT c_nationkey, CAST(SUM(total) AS DOUBLE) / COUNT(*) AS nat_avg
  FROM per_cust GROUP BY 1
)
SELECT p.c_nationkey, p.c_custkey, CAST(p.total AS DOUBLE) AS total,
       ROUND(n.nat_avg, 6) AS nat_avg
FROM per_cust p JOIN nation_avg n ON p.c_nationkey = n.c_nationkey
WHERE CAST(p.total AS DOUBLE) > 1.2 * n.nat_avg
ORDER BY p.c_nationkey, p.c_custkey
"""


# ---------------------------------------------------------------------------
# q34/q73 shape — order line-count bucket drives a customer list
# ---------------------------------------------------------------------------


def tpcds_q73_linecount_bucket_customers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    cust = read_table(spark, "customer", sf_dir)
    cnts = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("cnt"))
    busy = cnts.filter((F.col("cnt") >= 6) & (F.col("cnt") <= 7))
    return (
        orders.join(busy, orders.o_orderkey == busy.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "cnt")
        .orderBy(F.desc("cnt"), "c_custkey", "o_orderkey")
    )


TPCDS_Q73_SQL = """
SELECT c_custkey, c_name, o_orderkey, cnt
FROM orders
JOIN (SELECT l_orderkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1
      HAVING COUNT(*) BETWEEN 6 AND 7) b ON o_orderkey = b.l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY cnt DESC, c_custkey, o_orderkey
"""


# ---------------------------------------------------------------------------
# q46/q68 shape — per-order amounts where the customer's and supplier's
# nations differ (the "current_addr <> customer_addr" cross-geo pattern)
# ---------------------------------------------------------------------------


def tpcds_q68_cross_nation_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    cust = read_table(spark, "customer", sf_dir)
    supp = read_table(spark, "supplier", sf_dir)
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") != F.col("s_nationkey"))
        .filter(F.year("o_orderdate") == 1995)
    )
    return (
        joined.groupBy("o_orderkey", "c_custkey")
        .agg(
            F.sum(_rev()).cast("double").alias("cross_rev"),
            F.count(F.lit(1)).alias("n_cross_lines"),
        )
        .filter(F.col("n_cross_lines") >= 5)
        .orderBy("o_orderkey")
    )


TPCDS_Q68_SQL = f"""
SELECT o_orderkey, c_custkey, CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS cross_rev,
       COUNT(*) AS n_cross_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
WHERE c_nationkey <> s_nationkey AND year(o_orderdate) = 1995
GROUP BY 1, 2
HAVING COUNT(*) >= 5
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------------
# q59 shape — month-over-month: the same monthly aggregate CTE joined across
# adjacent years, ratio per month
# ---------------------------------------------------------------------------


def tpcds_q59_mom_across_years(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q59 shape — same one-scan conditional-sum rewrite as q74 (the
    oracle keeps the reference's monthly-CTE self-join form)."""
    orders = read_table(spark, "orders", sf_dir)
    yr = F.year("o_orderdate")
    return (
        orders.filter(yr.isin(1996, 1997))
        .withColumn("mo", F.month("o_orderdate"))
        .groupBy("mo")
        .agg(
            F.sum(F.when(yr == 1996, dec("o_totalprice"))).alias("t1"),
            F.sum(F.when(yr == 1997, dec("o_totalprice"))).alias("t2"),
        )
        .filter(F.col("t1").isNotNull() & F.col("t2").isNotNull())
        .select(
            "mo",
            F.col("t1").cast("double").alias("total_1996"),
            F.col("t2").cast("double").alias("total_1997"),
            F.round(
                F.col("t2").cast("double") / F.col("t1").cast("double"), 6
            ).alias("ratio"),
        )
        .orderBy("mo")
    )


TPCDS_Q59_SQL = """
WITH monthly AS (
  SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total
  FROM orders WHERE year(o_orderdate) IN (1996, 1997) GROUP BY 1, 2
)
SELECT m1.mo, CAST(m1.total AS DOUBLE) AS total_1996,
       CAST(m2.total AS DOUBLE) AS total_1997,
       ROUND(CAST(m2.total AS DOUBLE) / CAST(m1.total AS DOUBLE), 6) AS ratio
FROM monthly m1 JOIN monthly m2 ON m1.mo = m2.mo
WHERE m1.yr = 1996 AND m2.yr = 1997
ORDER BY m1.mo
"""


# ---------------------------------------------------------------------------
# q65 shape — (supplier, part) pairs whose revenue is at most 10% of the
# average pair-revenue within the part's type class
# ---------------------------------------------------------------------------


def tpcds_q65_low_share_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    part = read_table(spark, "part", sf_dir)
    pair_rev = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_type", "l_suppkey", "p_partkey")
        .agg(F.sum(_rev()).alias("rev"))
    )
    class_avg = pair_rev.groupBy("p_type").agg(
        (F.sum("rev").cast("double") / F.count(F.lit(1))).alias("cls_avg")
    )
    return (
        pair_rev.join(class_avg, "p_type")
        .filter(F.col("rev").cast("double") <= 0.1 * F.col("cls_avg"))
        .select(
            "p_type",
            "l_suppkey",
            "p_partkey",
            F.col("rev").cast("double").alias("rev"),
            F.round("cls_avg", 6).alias("cls_avg"),
        )
        .orderBy("p_type", "l_suppkey", "p_partkey")
    )


TPCDS_Q65_SQL = f"""
WITH pair_rev AS (
  SELECT p_type, l_suppkey, p_partkey, SUM({REVENUE_TERM}) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2, 3
), class_avg AS (
  SELECT p_type, CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS cls_avg
  FROM pair_rev GROUP BY 1
)
SELECT p.p_type, p.l_suppkey, p.p_partkey, CAST(p.rev AS DOUBLE) AS rev,
       ROUND(c.cls_avg, 6) AS cls_avg
FROM pair_rev p JOIN class_avg c ON p.p_type = c.p_type
WHERE CAST(p.rev AS DOUBLE) <= 0.1 * c.cls_avg
ORDER BY p.p_type, p.l_suppkey, p.p_partkey
"""


# ---------------------------------------------------------------------------
# q9 shape — bucketed CASE over scalar subqueries: the reference runs 15
# scalar subqueries over quantity buckets; the Spark-first plan computes all
# bucket aggregates in ONE conditional-aggregation scan (at 100 TB, 1 scan
# beats 15), then assembles the CASE columns from the 1-row result
# ---------------------------------------------------------------------------


def tpcds_q9_bucket_case_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    buckets = [(1, 10), (11, 25), (26, 50)]
    aggs = []
    for i, (lo, hi) in enumerate(buckets):
        in_b = F.col("l_quantity").between(lo, hi)
        aggs += [
            F.sum(F.when(in_b, 1).otherwise(0)).alias(f"cnt_{i}"),
            F.sum(F.when(in_b, dec("l_extendedprice"))).alias(f"sp_{i}"),
            F.sum(F.when(in_b, dec("l_discount", 8, 2))).alias(f"sd_{i}"),
        ]
    one = li.agg(*aggs)
    cols = []
    for i, (lo, hi) in enumerate(buckets):
        cnt = F.col(f"cnt_{i}")
        pick = F.when(
            cnt > 2000,
            F.round(F.col(f"sp_{i}").cast("double") / cnt, 6),
        ).otherwise(F.round(F.col(f"sd_{i}").cast("double") / cnt, 6))
        cols.append(pick.alias(f"bucket_{lo}_{hi}"))
    return one.select(*cols)


TPCDS_Q9_SQL = """
SELECT
  CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) > 2000
       THEN ROUND(CAST((SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                        FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) AS DOUBLE)
            / (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10), 6)
       ELSE ROUND(CAST((SELECT SUM(CAST(l_discount AS DECIMAL(8,2)))
                        FROM lineitem WHERE l_quantity BETWEEN 1 AND 10) AS DOUBLE)
            / (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 1 AND 10), 6)
  END AS bucket_1_10,
  CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 25) > 2000
       THEN ROUND(CAST((SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                        FROM lineitem WHERE l_quantity BETWEEN 11 AND 25) AS DOUBLE)
            / (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 25), 6)
       ELSE ROUND(CAST((SELECT SUM(CAST(l_discount AS DECIMAL(8,2)))
                        FROM lineitem WHERE l_quantity BETWEEN 11 AND 25) AS DOUBLE)
            / (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 11 AND 25), 6)
  END AS bucket_11_25,
  CASE WHEN (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 26 AND 50) > 2000
       THEN ROUND(CAST((SELECT SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                        FROM lineitem WHERE l_quantity BETWEEN 26 AND 50) AS DOUBLE)
            / (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 26 AND 50), 6)
       ELSE ROUND(CAST((SELECT SUM(CAST(l_discount AS DECIMAL(8,2)))
                        FROM lineitem WHERE l_quantity BETWEEN 26 AND 50) AS DOUBLE)
            / (SELECT COUNT(*) FROM lineitem WHERE l_quantity BETWEEN 26 AND 50), 6)
  END AS bucket_26_50
"""


# ---------------------------------------------------------------------------
# q88 shape — multi-band conditional counts in ONE scan (8 time-band counts;
# here: quantity bands x return status)
# ---------------------------------------------------------------------------


def tpcds_q88_multiband_single_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)

    def band(lo, hi, flag):
        cond = (F.col("l_quantity") >= lo) & (F.col("l_quantity") < hi)
        if flag is not None:
            cond = cond & (F.col("l_returnflag") == flag)
        return F.sum(F.when(cond, 1).otherwise(0))

    return li.agg(
        band(0, 10, None).alias("q0_10"),
        band(10, 20, None).alias("q10_20"),
        band(20, 30, None).alias("q20_30"),
        band(30, 60, None).alias("q30_60"),
        band(0, 10, "R").alias("r0_10"),
        band(10, 20, "R").alias("r10_20"),
        band(20, 30, "R").alias("r20_30"),
        band(30, 60, "R").alias("r30_60"),
    )


TPCDS_Q88_SQL = """
SELECT
  CAST(SUM(CASE WHEN l_quantity >= 0  AND l_quantity < 10 THEN 1 ELSE 0 END) AS BIGINT) AS q0_10,
  CAST(SUM(CASE WHEN l_quantity >= 10 AND l_quantity < 20 THEN 1 ELSE 0 END) AS BIGINT) AS q10_20,
  CAST(SUM(CASE WHEN l_quantity >= 20 AND l_quantity < 30 THEN 1 ELSE 0 END) AS BIGINT) AS q20_30,
  CAST(SUM(CASE WHEN l_quantity >= 30 AND l_quantity < 60 THEN 1 ELSE 0 END) AS BIGINT) AS q30_60,
  CAST(SUM(CASE WHEN l_quantity >= 0  AND l_quantity < 10 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r0_10,
  CAST(SUM(CASE WHEN l_quantity >= 10 AND l_quantity < 20 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r10_20,
  CAST(SUM(CASE WHEN l_quantity >= 20 AND l_quantity < 30 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r20_30,
  CAST(SUM(CASE WHEN l_quantity >= 30 AND l_quantity < 60 AND l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r30_60
FROM lineitem
"""


# ---------------------------------------------------------------------------
# q70 shape — rank WITHIN the rollup: top nations by revenue inside each
# region, computed over the rolled-up aggregate with a grouping() partition
# ---------------------------------------------------------------------------


def tpcds_q70_rank_within_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_table(spark, "nation", sf_dir)
    region = read_table(spark, "region", sf_dir)
    cust = read_table(spark, "customer", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    base = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
    )
    # finest-grain pre-aggregation before the rollup Expand (see q18)
    fine = base.groupBy("r_name", "n_name").agg(
        F.sum(dec("o_totalprice")).alias("pt")
    )
    rolled = fine.rollup("r_name", "n_name").agg(
        F.sum("pt").alias("total"),
        F.grouping_id().alias("gid"),
    )
    w = Window.partitionBy("gid", "r_name").orderBy(
        F.desc("total"), F.asc_nulls_first("n_name")
    )
    return (
        rolled.withColumn("rk", F.rank().over(w))
        .filter((F.col("gid") > 0) | (F.col("rk") <= 3))
        .select(
            "gid", "r_name", "n_name",
            F.col("total").cast("double").alias("total"), "rk",
        )
        .orderBy("gid", "r_name", "rk", "n_name")
    )


TPCDS_Q70_SQL = """
WITH rolled AS (
  SELECT r_name, n_name, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total,
         GROUPING(r_name, n_name) AS gid
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY ROLLUP (r_name, n_name)
)
SELECT gid, r_name, n_name, CAST(total AS DOUBLE) AS total, rk
FROM (
  SELECT gid, r_name, n_name, total,
         RANK() OVER (PARTITION BY gid, r_name
                      ORDER BY total DESC, n_name NULLS FIRST) AS rk
  FROM rolled
)
WHERE gid > 0 OR rk <= 3
ORDER BY gid, r_name NULLS FIRST, rk, n_name NULLS FIRST
"""


# ---------------------------------------------------------------------------
# q25/q29 shape — triple-fact chain (orders x lineitem x supplier) rolled to
# (nation, brand) with three distinct aggregates
# ---------------------------------------------------------------------------


def tpcds_q29_nation_brand_triple(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    part = read_table(spark, "part", sf_dir)
    supp = read_table(spark, "supplier", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    joined = (
        _li_orders(spark, sf_dir)
        .filter(F.col("o_orderpriority").isin(*URGENT))
        .join(part, F.col("l_partkey") == part.p_partkey)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
    )
    return (
        joined.groupBy("n_name", "p_brand")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("qty"),
            F.sum(_rev()).cast("double").alias("rev"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
        .filter(F.col("n_orders") >= 10)
        .orderBy("n_name", "p_brand")
    )


TPCDS_Q29_SQL = f"""
SELECT n_name, p_brand,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty,
       CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS rev,
       COUNT(DISTINCT o_orderkey) AS n_orders
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
GROUP BY 1, 2
HAVING COUNT(DISTINCT o_orderkey) >= 10
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# q35 shape — dim rows qualified by EXISTS in ANY of two fact slices plus a
# grouped multi-aggregate profile (avg via exact sum/count)
# ---------------------------------------------------------------------------


def tpcds_q35_exists_any_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    urgent = orders.filter(F.col("o_orderpriority").isin(*URGENT))
    low = orders.filter(F.col("o_orderpriority").isin(*LOW))
    either = (
        urgent.select("o_custkey").union(low.select("o_custkey")).distinct()
    )
    qualified = cust.join(either, cust.c_custkey == either.o_custkey, "left_semi")
    return (
        qualified.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.min(dec("c_acctbal")).cast("double").alias("min_bal"),
            F.max(dec("c_acctbal")).cast("double").alias("max_bal"),
            (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias(
                "avg_bal"
            ),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )


TPCDS_Q35_SQL = """
SELECT c_nationkey, c_mktsegment, COUNT(*) AS n_cust,
       CAST(MIN(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS min_bal,
       CAST(MAX(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS max_bal,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_bal
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_orderpriority IN ('1-URGENT','2-HIGH'))
   OR EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_orderpriority IN ('4-NOT SPECIFIED','5-LOW'))
GROUP BY 1, 2
ORDER BY 1, 2
"""


# ---------------------------------------------------------------------------
# q41 shape — dim self-qualification: part names sharing a (brand, size)
# combination with 2+ types (correlated count subquery on the dim itself)
# ---------------------------------------------------------------------------


def tpcds_q41_dim_self_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    combos = part.groupBy("p_brand", "p_size").agg(
        F.countDistinct("p_type").alias("n_types")
    )
    rich = combos.filter(F.col("n_types") >= 3)
    return (
        part.join(rich, ["p_brand", "p_size"])
        .select("p_brand", "p_size", "n_types", "p_partkey", "p_name")
        .orderBy("p_brand", "p_size", "p_partkey")
    )


TPCDS_Q41_SQL = """
SELECT p.p_brand, p.p_size, r.n_types, p.p_partkey, p.p_name
FROM part p
JOIN (SELECT p_brand, p_size, COUNT(DISTINCT p_type) AS n_types
      FROM part GROUP BY 1, 2 HAVING COUNT(DISTINCT p_type) >= 3) r
  ON p.p_brand = r.p_brand AND p.p_size = r.p_size
ORDER BY p.p_brand, p.p_size, p.p_partkey
"""


# ---------------------------------------------------------------------------
# q54 shape — cohort build then spend-band histogram: customers who bought a
# target part class, bucketed by their total spend
# ---------------------------------------------------------------------------


def tpcds_q54_cohort_spend_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    cohort = (
        _li_orders(spark, sf_dir)
        .join(
            part.filter(F.col("p_brand") == "Brand#23"),
            F.col("l_partkey") == part.p_partkey,
        )
        .select("o_custkey")
        .distinct()
    )
    spend = (
        orders.join(cohort, "o_custkey")
        .groupBy("o_custkey")
        .agg(F.sum(dec("o_totalprice")).alias("total"))
    )
    band = (F.floor(F.col("total").cast("double") / 100000) * 100000).cast(
        "bigint"
    )
    return (
        spend.select(band.alias("spend_band"))
        .groupBy("spend_band")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("spend_band")
    )


TPCDS_Q54_SQL = """
WITH cohort AS (
  SELECT DISTINCT o_custkey
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part   ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
), spend AS (
  SELECT o.o_custkey, SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total
  FROM orders o JOIN cohort c ON o.o_custkey = c.o_custkey
  GROUP BY 1
)
SELECT CAST(FLOOR(CAST(total AS DOUBLE) / 100000) * 100000 AS BIGINT)
         AS spend_band,
       COUNT(*) AS n_customers
FROM spend
GROUP BY 1
ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q90 shape — ratio of two disjoint-slice counts from one table (am/pm ratio)
# ---------------------------------------------------------------------------


def tpcds_q90_slice_count_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q90 shape. The reference computes the two slice counts as two
    scalar subqueries (two fact scans); Spark-first is one
    conditional-count scan — the oracle keeps the two-subquery form."""
    orders = read_table(spark, "orders", sf_dir)
    mo = F.month("o_orderdate")
    return orders.agg(
        F.sum(F.when(mo.between(1, 3), 1).otherwise(0)).alias("n_q1"),
        F.sum(F.when(mo.between(10, 12), 1).otherwise(0)).alias("n_q4"),
    ).select(
        "n_q1",
        "n_q4",
        F.round(F.col("n_q1").cast("double") / F.col("n_q4"), 6).alias("ratio"),
    )


TPCDS_Q90_SQL = """
SELECT n_q1, n_q4, ROUND(CAST(n_q1 AS DOUBLE) / n_q4, 6) AS ratio
FROM (SELECT COUNT(*) AS n_q1 FROM orders
      WHERE month(o_orderdate) BETWEEN 1 AND 3),
     (SELECT COUNT(*) AS n_q4 FROM orders
      WHERE month(o_orderdate) BETWEEN 10 AND 12)
"""


# ---------------------------------------------------------------------------
# q2 shape — share-of-period windows: each month's revenue as a fraction of
# its year via two stacked window grains
# ---------------------------------------------------------------------------


def tpcds_q2_month_share_of_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, "orders", sf_dir)
    monthly = (
        orders.withColumn("yr", F.year("o_orderdate"))
        .withColumn("mo", F.month("o_orderdate"))
        .groupBy("yr", "mo")
        .agg(F.sum(dec("o_totalprice")).alias("total"))
    )
    wy = Window.partitionBy("yr")
    return (
        monthly.select(
            "yr",
            "mo",
            F.col("total").cast("double").alias("total"),
            F.round(
                F.col("total").cast("double")
                / F.sum("total").over(wy).cast("double"),
                6,
            ).alias("share_of_year"),
        )
        .orderBy("yr", "mo")
    )


TPCDS_Q2_SQL = """
WITH monthly AS (
  SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS total
  FROM orders GROUP BY 1, 2
)
SELECT yr, mo, CAST(total AS DOUBLE) AS total,
       ROUND(CAST(total AS DOUBLE)
             / CAST(SUM(total) OVER (PARTITION BY yr) AS DOUBLE), 6)
         AS share_of_year
FROM monthly
ORDER BY yr, mo
"""


QUERIES: dict[str, tuple] = {
    "tpcds_q18_grouping_sets_channels": (
        tpcds_q18_grouping_sets_channels, TPCDS_Q18_SQL),
    "tpcds_q49_top_decile_within_segment": (
        tpcds_q49_top_decile_within_segment, TPCDS_Q49_SQL),
    "tpcds_q16_exists_not_exists_rollup": (
        tpcds_q16_exists_not_exists_rollup, TPCDS_Q16_SQL),
    "tpcds_q74_yoy_customer_growth": (
        tpcds_q74_yoy_customer_growth, TPCDS_Q74_SQL),
    "tpcds_q30_above_1_2x_nation_avg": (
        tpcds_q30_above_1_2x_nation_avg, TPCDS_Q30_SQL),
    "tpcds_q73_linecount_bucket_customers": (
        tpcds_q73_linecount_bucket_customers, TPCDS_Q73_SQL),
    "tpcds_q68_cross_nation_orders": (
        tpcds_q68_cross_nation_orders, TPCDS_Q68_SQL),
    "tpcds_q59_mom_across_years": (tpcds_q59_mom_across_years, TPCDS_Q59_SQL),
    "tpcds_q65_low_share_pairs": (tpcds_q65_low_share_pairs, TPCDS_Q65_SQL),
    "tpcds_q9_bucket_case_profile": (tpcds_q9_bucket_case_profile, TPCDS_Q9_SQL),
    "tpcds_q88_multiband_single_scan": (
        tpcds_q88_multiband_single_scan, TPCDS_Q88_SQL),
    "tpcds_q70_rank_within_rollup": (
        tpcds_q70_rank_within_rollup, TPCDS_Q70_SQL),
    "tpcds_q29_nation_brand_triple": (
        tpcds_q29_nation_brand_triple, TPCDS_Q29_SQL),
    "tpcds_q35_exists_any_profile": (
        tpcds_q35_exists_any_profile, TPCDS_Q35_SQL),
    "tpcds_q41_dim_self_count": (tpcds_q41_dim_self_count, TPCDS_Q41_SQL),
    "tpcds_q54_cohort_spend_bands": (
        tpcds_q54_cohort_spend_bands, TPCDS_Q54_SQL),
    "tpcds_q90_slice_count_ratio": (
        tpcds_q90_slice_count_ratio, TPCDS_Q90_SQL),
    "tpcds_q2_month_share_of_year": (
        tpcds_q2_month_share_of_year, TPCDS_Q2_SQL),
}
