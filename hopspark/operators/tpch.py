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

# registry: name → (query fn, oracle sql | None)
QUERIES: dict[str, tuple] = {
    "tpch_q1_pricing_summary": (q1_pricing_summary, Q1_SQL),
    "tpch_q3_shipping_priority": (q3_shipping_priority, Q3_SQL),
    "tpch_q5_local_supplier_volume": (q5_local_supplier_volume, Q5_SQL),
    "tpch_q6_forecast_revenue": (q6_forecast_revenue, Q6_SQL),
    "tpch_q10_returned_items": (q10_returned_items, Q10_SQL),
}
