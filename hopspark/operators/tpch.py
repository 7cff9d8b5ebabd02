"""TPC-H-style relational core queries, adapted to the driver's reduced
star schema (TESTDATA.md — no partsupp; fewer columns per table).

These mirror the reference's E2E correctness spine
(testdata/workloads/tpch/queries/tpch-q1.test … q22 in the reference tree):
scan→filter→project→hash-agg→sort (q1), multi-way joins with
broadcast-able dims (q3/q5/q10), filter+global agg (q6).

Scale notes (100 TB thinking):
  * Fact-fact joins (orders⋈lineitem) shuffle on the join key; AQE picks
    sort-merge vs shuffled-hash from runtime stats.
  * Dimension joins (region/nation/customer/supplier) stay under the
    broadcast threshold at any SF where they are true dimensions; Catalyst
    broadcasts automatically, `F.broadcast` pins the tiny ones.
  * All filters are plain column predicates → parquet pushdown + column
    pruning reach the scan (verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hopspark.catalog import read_table
from hopspark.operators._util import (
    DEC_PRICE,
    DEC_QTY,
    ONE_MINUS_DISC,
    ONE_PLUS_TAX,
    REVENUE_TERM,
    davg,
    dec,
    dsum,
    one_minus,
    one_plus,
)

# ---------------------------------------------------------------------------
# Q1 — pricing summary report (flagship). Reference: tpch-q1.test.
# ---------------------------------------------------------------------------


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    disc_price = dec("l_extendedprice") * one_minus("l_discount")
    charge = (dec("l_extendedprice") * one_minus("l_discount") * one_plus("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity")).alias("sum_qty"),
            dsum(dec("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(dec("l_quantity")).alias("avg_qty"),
            davg(dec("l_extendedprice")).alias("avg_price"),
            davg(dec("l_discount", 4, 2)).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM({DEC_QTY}) AS DOUBLE)                         AS sum_qty,
       CAST(SUM({DEC_PRICE}) AS DOUBLE)                       AS sum_base_price,
       CAST(SUM({DEC_PRICE} * {ONE_MINUS_DISC}) AS DOUBLE)    AS sum_disc_price,
       CAST(SUM({DEC_PRICE} * {ONE_MINUS_DISC} * {ONE_PLUS_TAX}) AS DOUBLE) AS sum_charge,
       CAST(SUM({DEC_QTY}) AS DOUBLE) / COUNT(l_quantity)     AS avg_qty,
       CAST(SUM({DEC_PRICE}) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
       CAST(SUM({"CAST(l_discount AS DECIMAL(4,2))"}) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
       COUNT(*)                                               AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

# ---------------------------------------------------------------------------
# Q3 — shipping priority. Reference: tpch-q3.test.
# ---------------------------------------------------------------------------


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir).filter(F.col("c_mktsegment") == "BUILDING")
    orders = read_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = read_table(spark, "lineitem", sf_dir).filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(dec("l_extendedprice") * one_minus("l_discount")).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate,
       CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""

# ---------------------------------------------------------------------------
# Q5 — local supplier volume: 6-table join. Reference: tpch-q5.test.
# ---------------------------------------------------------------------------


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = read_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    nation = read_table(spark, "nation", sf_dir)
    cust = read_table(spark, "customer", sf_dir)
    supp = read_table(spark, "supplier", sf_dir)
    orders = read_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = read_table(spark, "lineitem", sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(dec("l_extendedprice") * one_minus("l_discount")).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("n_name"))
    )


Q5_SQL = f"""
SELECT n_name, CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""

# ---------------------------------------------------------------------------
# Q6 — forecasting revenue change: filter + ungrouped agg. Reference: tpch-q6.test.
# ---------------------------------------------------------------------------


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            # redundant RAW bounding range: the exact predicate below casts
            # to decimal, which blocks parquet pushdown — this wider raw
            # range is pushable (row-group/page pruning at 100 TB) and
            # never excludes a row the cast predicate would keep
            & (F.col("l_discount") >= 0.015) & (F.col("l_discount") <= 0.045)
            & (dec("l_discount", 4, 2).between(0.02, 0.04))
            & (F.col("l_quantity") < 24)
        )
        .agg(dsum(dec("l_extendedprice") * dec("l_discount", 4, 2)).alias("revenue"))
    )


Q6_SQL = """
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND CAST(l_discount AS DECIMAL(4,2)) BETWEEN 0.02 AND 0.04
  AND l_quantity < 24
"""

# ---------------------------------------------------------------------------
# Q10 — returned-item reporting. Reference: tpch-q10.test.
# ---------------------------------------------------------------------------


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    orders = read_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-10-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = read_table(spark, "lineitem", sf_dir).filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(dec("l_extendedprice") * one_minus("l_discount")).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

# ---------------------------------------------------------------------------
# Q4 — order priority checking via EXISTS semi-join. Reference: tpch-q4.test.
# (Adapted: no l_commitdate/l_receiptdate in the driver schema, so the
# correlated predicate is l_shipdate > o_orderdate.)
# ---------------------------------------------------------------------------


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = read_table(spark, "lineitem", sf_dir)
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# ---------------------------------------------------------------------------
# Q7 — volume shipping between two nations. Reference: tpch-q7.test.
# ---------------------------------------------------------------------------


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    n1 = read_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = read_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    supp = read_table(spark, "supplier", sf_dir)
    cust = read_table(spark, "customer", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    li = read_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") <= F.lit("1997-12-31").cast("timestamp"))
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    rpair = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(pair | rpair)
        .withColumn("l_year", F.year("l_shipdate"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(dsum(dec("l_extendedprice") * one_minus("l_discount")).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT supp_nation, cust_nation, l_year,
       CAST(SUM(volume) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l_shipdate) AS l_year,
         {REVENUE_TERM} AS volume
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) shipping
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

# ---------------------------------------------------------------------------
# Q8 — national market share. Reference: tpch-q8.test.
# ---------------------------------------------------------------------------


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir).filter(F.col("p_type") == "ECONOMY")
    supp = read_table(spark, "supplier", sf_dir)
    li = read_table(spark, "lineitem", sf_dir)
    orders = read_table(spark, "orders", sf_dir).filter(
        F.col("o_orderdate").between(
            F.lit("1996-01-01").cast("timestamp"), F.lit("1997-12-31").cast("timestamp")
        )
    )
    cust = read_table(spark, "customer", sf_dir)
    n1 = read_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = read_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    region = read_table(spark, "region", sf_dir).filter(F.col("r_name") == "ASIA")
    vol = dec("l_extendedprice") * one_minus("l_discount")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n1), cust.c_nationkey == F.col("n1_key"))
        .join(F.broadcast(region), F.col("n1_region") == region.r_regionkey)
        .join(F.broadcast(n2), supp.s_nationkey == F.col("n2_key"))
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy("o_year")
        .agg(
            (
                dsum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0)))
                / dsum(vol)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END) AS DOUBLE)
         / CAST(SUM(volume) AS DOUBLE) AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o_orderdate) AS o_year,
         {REVENUE_TERM} AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
    AND o_orderdate BETWEEN TIMESTAMP '1996-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
) all_nations
GROUP BY o_year
ORDER BY o_year
"""

# ---------------------------------------------------------------------------
# Q9 — product-type profit. Reference: tpch-q9.test.
# (Adapted: no partsupp/ps_supplycost; cost proxy = p_retailprice * qty.)
# ---------------------------------------------------------------------------


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir).filter(F.col("p_name").contains("wid"))
    supp = read_table(spark, "supplier", sf_dir)
    li = read_table(spark, "lineitem", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    amount = dec("l_extendedprice") * one_minus("l_discount") - dec(
        "p_retailprice"
    ) * dec("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .withColumn("o_year", F.year("o_orderdate"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(dsum(amount).alias("sum_profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


Q9_SQL = f"""
SELECT nation, o_year, CAST(SUM(amount) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation, EXTRACT(year FROM o_orderdate) AS o_year,
         {REVENUE_TERM} - CAST(p_retailprice AS DECIMAL(12,2)) * {DEC_QTY} AS amount
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%wid%'
) profit
GROUP BY nation, o_year
ORDER BY nation ASC, o_year DESC
"""

# ---------------------------------------------------------------------------
# Q12 — shipping modes and order priority. Reference: tpch-q12.test.
# (Adapted: no l_shipmode; grouped by l_returnflag instead.)
# ---------------------------------------------------------------------------


def q12_priority_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    orders = read_table(spark, "orders", sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


Q12_SQL = """
SELECT l_returnflag,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# ---------------------------------------------------------------------------
# Q13 — customer order-count distribution (left outer join). tpch-q13.test.
# ---------------------------------------------------------------------------


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    orders = read_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") != "5-LOW"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '5-LOW'
  GROUP BY c_custkey
) c_orders
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

# ---------------------------------------------------------------------------
# Q14 — promotion effect. Reference: tpch-q14.test.
# ---------------------------------------------------------------------------


def q14_promotion_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    part = read_table(spark, "part", sf_dir)
    vol = dec("l_extendedprice") * one_minus("l_discount")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * dsum(F.when(F.col("p_type") == "PROMO", vol).otherwise(F.lit(0)))
                / dsum(vol)
            ).alias("promo_revenue")
        )
    )


Q14_SQL = f"""
SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {REVENUE_TERM} ELSE 0 END) AS DOUBLE)
       / CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""

# ---------------------------------------------------------------------------
# Q15 — top supplier (scalar-subquery max over a derived view). tpch-q15.test.
# Decimal revenue is kept exact for the = max() comparison; cast to double
# only in the output so the oracle hash stays deterministic.
# ---------------------------------------------------------------------------


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    supp = read_table(spark, "supplier", sf_dir)
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(dec("l_extendedprice") * one_minus("l_discount")).alias("rev_dec")
    )
    mx = revenue.agg(F.max("rev_dec").alias("mx"))
    return (
        revenue.join(F.broadcast(mx), F.col("rev_dec") == F.col("mx"))
        .join(supp, F.col("supplier_no") == supp.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.col("rev_dec").cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no, SUM({REVENUE_TERM}) AS rev_dec
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
FROM supplier
JOIN revenue ON s_suppkey = supplier_no
WHERE rev_dec = (SELECT MAX(rev_dec) FROM revenue)
ORDER BY s_suppkey
"""

# ---------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated avg subquery). tpch-q17.test.
# The threshold l_quantity < 0.2*avg(l_quantity) is rewritten in exact
# integer-decimal arithmetic (5*qty*cnt < sum) so the comparison cannot flip
# on last-ulp double differences between engines.
# ---------------------------------------------------------------------------


def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    part = read_table(spark, "part", sf_dir).filter(F.col("p_brand") == "Brand#23")
    # Semi-join before the per-part aggregation: only ~1/25 of parts
    # survive the brand filter, so the agg shuffles a fraction of lineitem
    # instead of all of it (the broadcast side is the filtered dim).
    per_part = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy(F.col("l_partkey").alias("agg_partkey"))
        .agg(
            F.sum(dec("l_quantity")).alias("qty_sum"),
            F.count(F.lit(1)).alias("qty_cnt"),
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("agg_partkey"))
        .filter(dec("l_quantity") * 5 * F.col("qty_cnt") < F.col("qty_sum"))
        .agg((dsum(dec("l_extendedprice")) / F.lit(7.0)).alias("avg_yearly"))
    )


Q17_SQL = f"""
SELECT CAST(SUM({DEC_PRICE}) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS agg_partkey, SUM({DEC_QTY}) AS qty_sum, COUNT(*) AS qty_cnt
  FROM lineitem GROUP BY l_partkey
) part_agg ON agg_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND {DEC_QTY} * 5 * qty_cnt < qty_sum
"""

# ---------------------------------------------------------------------------
# Q18 — large-volume customers (HAVING on grouped sum). tpch-q18.test.
# ---------------------------------------------------------------------------


def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    cust = read_table(spark, "customer", sf_dir)
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 250)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("qty_dec").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


Q18_SQL = f"""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(qty_dec AS DOUBLE) AS total_qty
FROM (
  SELECT l_orderkey, SUM({DEC_QTY}) AS qty_dec
  FROM lineitem GROUP BY l_orderkey HAVING SUM({DEC_QTY}) > 250
) big
JOIN orders   ON o_orderkey = big.l_orderkey
JOIN customer ON c_custkey = o_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""

# ---------------------------------------------------------------------------
# Q19 — discounted revenue (OR of AND-groups; tests disjunct pushdown).
# Reference: tpch-q19.test (adapted: p_container → p_size bands).
# ---------------------------------------------------------------------------


def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    part = read_table(spark, "part", sf_dir)
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & (F.col("p_size").between(1, 5))
        & (F.col("l_quantity").between(1, 11))
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & (F.col("p_size").between(1, 10))
        & (F.col("l_quantity").between(10, 20))
    )
    b3 = (
        (F.col("p_brand") == "Brand#3")
        & (F.col("p_size").between(1, 15))
        & (F.col("l_quantity").between(20, 30))
    )
    return j.filter(b1 | b2 | b3).agg(
        dsum(dec("l_extendedprice") * one_minus("l_discount")).alias("revenue")
    )


Q19_SQL = f"""
SELECT CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1  AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
"""

# ---------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS chain).
# Reference: tpch-q21.test (adapted: "late" = l_returnflag = 'R').
# ---------------------------------------------------------------------------


def q21_suppliers_waiting(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = read_table(spark, "supplier", sf_dir)
    nation = read_table(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_5")
    orders = read_table(spark, "orders", sf_dir).filter(F.col("o_orderstatus") == "F")
    li = read_table(spark, "lineitem", sf_dir)
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey").alias("l3")
    base = (
        l1.join(orders, F.col("l1.l_orderkey") == orders.o_orderkey)
        .join(supp, F.col("l1.l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    with_other = base.join(
        l2,
        (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
        "left_semi",
    )
    no_other_late = with_other.join(
        l3,
        (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
        & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
        "left_anti",
    )
    return (
        no_other_late.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(100)
    )


Q21_SQL = """
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F' AND n_name = 'NATION_5'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""

# ---------------------------------------------------------------------------
# Q22 — global sales opportunity (NOT EXISTS + global avg threshold).
# Reference: tpch-q22.test (adapted: cntrycode → c_nationkey bucket; the
# acctbal > avg(acctbal) threshold is exact-decimal: bal*cnt > sum).
# ---------------------------------------------------------------------------

_Q22_NATIONS = [1, 3, 5, 7, 9, 11, 13]


def q22_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir).filter(
        F.col("c_nationkey").isin(_Q22_NATIONS)
    )
    orders = read_table(spark, "orders", sf_dir)
    avg_pos = cust.filter(dec("c_acctbal") > 0).agg(
        F.sum(dec("c_acctbal")).alias("bal_sum"), F.count(F.lit(1)).alias("bal_cnt")
    )
    return (
        cust.join(F.broadcast(avg_pos))
        .filter(dec("c_acctbal") * F.col("bal_cnt") > F.col("bal_sum"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum(dec("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


_Q22_IN = ", ".join(str(n) for n in _Q22_NATIONS)

Q22_SQL = f"""
SELECT c_nationkey AS cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM customer
CROSS JOIN (
  SELECT SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS bal_sum, COUNT(*) AS bal_cnt
  FROM customer
  WHERE c_nationkey IN ({_Q22_IN}) AND CAST(c_acctbal AS DECIMAL(12,2)) > 0
) threshold
WHERE c_nationkey IN ({_Q22_IN})
  AND CAST(c_acctbal AS DECIMAL(12,2)) * bal_cnt > bal_sum
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
GROUP BY c_nationkey
ORDER BY cntrycode
"""

# ---------------------------------------------------------------------------
# Q2 — minimum-cost supplier (adapted: no partsupp, so the "cost" of
# supplying a part is modeled from lineitem history: min avg sell price per
# (part, supplier); correlated-min subquery structure preserved).
# Reference: tpch-q2.test.
# ---------------------------------------------------------------------------


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir).filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    supp = read_table(spark, "supplier", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    region = read_table(spark, "region", sf_dir).filter(F.col("r_name") == "EUROPE")
    li = read_table(spark, "lineitem", sf_dir)
    # supply cost proxy: exact-decimal min extendedprice per (part, supplier)
    cost = li.groupBy(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    ).agg(F.min(dec("l_extendedprice")).alias("ps_cost"))
    min_cost = cost.groupBy(F.col("ps_partkey").alias("mc_partkey")).agg(
        F.min("ps_cost").alias("min_cost")
    )
    eu_supp = (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    return (
        cost.join(F.broadcast(part), F.col("ps_partkey") == part.p_partkey)
        .join(min_cost, (F.col("ps_partkey") == F.col("mc_partkey")))
        .filter(F.col("ps_cost") == F.col("min_cost"))
        .join(eu_supp, F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("p_partkey"),
            F.col("ps_cost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = """
WITH cost AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(12,2))) AS ps_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT s_acctbal, s_name, n_name, p_partkey,
       CAST(ps_cost AS DOUBLE) AS supply_cost
FROM cost
JOIN part     ON ps_partkey = p_partkey
JOIN supplier ON ps_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE p_size = 15 AND p_type = 'LARGE' AND r_name = 'EUROPE'
  AND ps_cost = (SELECT MIN(c2.ps_cost) FROM cost c2
                 WHERE c2.ps_partkey = cost.ps_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

# ---------------------------------------------------------------------------
# Q11 — important stock identification (adapted: "stock value" per nation's
# suppliers = sum of extendedprice*qty from lineitem; HAVING against a
# scalar-subquery fraction of the global total, in exact decimals).
# Reference: tpch-q11.test.
# ---------------------------------------------------------------------------


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = read_table(spark, "supplier", sf_dir)
    nation = read_table(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_7")
    li = read_table(spark, "lineitem", sf_dir)
    value = dec("l_extendedprice") * dec("l_quantity")
    scoped = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
    )
    per_part = scoped.groupBy("l_partkey").agg(F.sum(value).alias("val_dec"))
    total = per_part.agg(
        F.sum("val_dec").alias("tot_dec"), F.count(F.lit(1)).alias("n_parts")
    )
    # threshold: value > total/1000  ⇔  value*1000 > total (exact decimals)
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("val_dec") * 1000 > F.col("tot_dec"))
        .select("l_partkey", F.col("val_dec").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), F.asc("l_partkey"))
    )


Q11_SQL = """
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS val_dec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(val_dec AS DOUBLE) AS part_value
FROM per_part
WHERE val_dec * 1000 > (SELECT SUM(val_dec) FROM per_part)
ORDER BY part_value DESC, l_partkey ASC
"""

# ---------------------------------------------------------------------------
# Q16 — parts/supplier relationship (adapted: the part-supplier bridge is
# lineitem history; counts distinct suppliers per part attribute group,
# excluding a supplier denylist via NOT IN → null-aware anti join).
# Reference: tpch-q16.test.
# ---------------------------------------------------------------------------


def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir).filter(
        (F.col("p_brand") != "Brand#5") & (F.col("p_size").isin(1, 4, 9, 14, 23))
    )
    li = read_table(spark, "lineitem", sf_dir)
    # denylist: suppliers whose name ends in '7' (deterministic stand-in for
    # the reference's comment-LIKE filter)
    bad_supp = read_table(spark, "supplier", sf_dir).filter(
        F.col("s_name").endswith("7")
    )
    bridge = (
        li.select(F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey"))
        .distinct()
        .join(
            bad_supp.select(F.col("s_suppkey").alias("ps_suppkey")),
            "ps_suppkey",
            "left_anti",
        )
    )
    return (
        bridge.join(F.broadcast(part), F.col("ps_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, COUNT(DISTINCT ps_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem) bridge
JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> 'Brand#5'
  AND p_size IN (1, 4, 9, 14, 23)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_name LIKE '%7')
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

# ---------------------------------------------------------------------------
# Q20 — potential part promotion (adapted: suppliers whose shipped quantity
# of PROMO parts exceeds half their average order size; EXISTS chain into a
# semi-join, thresholds in exact decimals). Reference: tpch-q20.test.
# ---------------------------------------------------------------------------


def q20_promotion_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = read_table(spark, "supplier", sf_dir)
    nation = read_table(spark, "nation", sf_dir).filter(F.col("n_name") == "NATION_3")
    part = read_table(spark, "part", sf_dir).filter(F.col("p_type") == "PROMO")
    li = read_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    promo_qty = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("promo_qty"))
        .filter(F.col("promo_qty") > 100)
    )
    return (
        supp.join(promo_qty, supp.s_suppkey == promo_qty.l_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select(
            "s_name", "s_suppkey", F.col("promo_qty").cast("double").alias("promo_qty")
        )
        .orderBy("s_name")
    )


Q20_SQL = """
SELECT s_name, s_suppkey, CAST(promo_qty AS DOUBLE) AS promo_qty
FROM supplier
JOIN (
  SELECT l_suppkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS promo_qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
  GROUP BY l_suppkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 100
) pq ON s_suppkey = pq.l_suppkey
JOIN nation ON s_nationkey = n_nationkey
WHERE n_name = 'NATION_3'
ORDER BY s_name
"""

# registry: name → (query fn, oracle sql | None)
QUERIES: dict[str, tuple] = {
    "tpch_q2_min_cost_supplier": (q2_min_cost_supplier, Q2_SQL),
    "tpch_q11_important_stock": (q11_important_stock, Q11_SQL),
    "tpch_q16_parts_supplier": (q16_parts_supplier, Q16_SQL),
    "tpch_q20_promotion_suppliers": (q20_promotion_suppliers, Q20_SQL),
    "tpch_q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "tpch_q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "tpch_q4_order_priority": (q4_order_priority, Q4_SQL),
    "tpch_q5_local_supplier_volume": (q5_local_supplier_volume, Q5_SQL),
    "tpch_q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "tpch_q7_volume_shipping": (q7_volume_shipping, Q7_SQL),
    "tpch_q8_market_share": (q8_market_share, Q8_SQL),
    "tpch_q9_product_profit": (q9_product_profit, Q9_SQL),
    "tpch_q10_returned_items": (q10_returned_items, Q10_SQL),
    "tpch_q12_priority_by_flag": (q12_priority_by_flag, Q12_SQL),
    "tpch_q13_customer_distribution": (q13_customer_distribution, Q13_SQL),
    "tpch_q14_promotion_effect": (q14_promotion_effect, Q14_SQL),
    "tpch_q15_top_supplier": (q15_top_supplier, Q15_SQL),
    "tpch_q17_small_quantity": (q17_small_quantity, Q17_SQL),
    "tpch_q18_large_volume_customers": (q18_large_volume_customers, Q18_SQL),
    "tpch_q19_discounted_revenue": (q19_discounted_revenue, Q19_SQL),
    "tpch_q21_suppliers_waiting": (q21_suppliers_waiting, Q21_SQL),
    "tpch_q22_sales_opportunity": (q22_sales_opportunity, Q22_SQL),
}
