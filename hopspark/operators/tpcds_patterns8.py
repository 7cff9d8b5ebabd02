"""TPC-DS-pattern workload slice, part 8 — 6 more plan shapes (→ 106).

Round-4 third widening (reference corpus: testdata/workloads/tpcds/queries/):
same-order-different-supplier EXISTS with cancellation NOT EXISTS (q94),
two-slice loss ratios by month x segment (q91), top-order-per-customer
windows (q79), attribute-band lookup chains (q84), double NOT EXISTS
demographic profile (q69), and date-windowed ratio-to-class (q20).

Same adaptation + determinism discipline as parts 1-7 (see part 6 header).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hopspark.catalog import read_table
from hopspark.operators._util import REVENUE_TERM, dec
from hopspark.operators.tpcds_patterns2 import LOW, URGENT, _li_orders, _rev

# ---------------------------------------------------------------------------
# q94 shape — orders shipped by MULTIPLE suppliers (correlated EXISTS on the
# same fact with a different-key predicate) and never returned (NOT EXISTS)
# ---------------------------------------------------------------------------


def tpcds_q94_multi_supplier_clean_orders(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    multi = (
        li.groupBy("l_orderkey")
        .agg(
            F.countDistinct("l_suppkey").alias("n_supp"),
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
                "n_ret"
            ),
            F.sum(_rev()).alias("rev"),
        )
        .filter((F.col("n_supp") >= 2) & (F.col("n_ret") == 0))
    )
    return multi.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("rev").cast("double").alias("total_rev"),
    )


TPCDS_Q94_SQL = f"""
SELECT COUNT(*) AS n_orders, CAST(SUM(rev) AS DOUBLE) AS total_rev
FROM (
  SELECT l_orderkey, SUM({REVENUE_TERM}) AS rev
  FROM lineitem l
  GROUP BY l_orderkey
  HAVING COUNT(DISTINCT l_suppkey) >= 2
     AND SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) = 0
)
"""


# ---------------------------------------------------------------------------
# q91 shape — loss ratio (returned / gross) by month x segment
# ---------------------------------------------------------------------------


def tpcds_q91_loss_ratio_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    base = (
        _li_orders(spark, sf_dir)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .filter(F.year("o_orderdate") == 1994)
        .withColumn("mo", F.month("o_orderdate"))
    )
    ret = F.when(F.col("l_returnflag") == "R", _rev())
    return (
        base.groupBy("mo", "c_mktsegment")
        .agg(
            F.sum(ret).cast("double").alias("returned_rev"),
            F.sum(_rev()).cast("double").alias("gross_rev"),
        )
        .select(
            "mo",
            "c_mktsegment",
            "returned_rev",
            "gross_rev",
            F.round(F.col("returned_rev") / F.col("gross_rev"), 6).alias(
                "loss_ratio"
            ),
        )
        .orderBy("mo", "c_mktsegment")
    )


TPCDS_Q91_SQL = f"""
SELECT mo, c_mktsegment, returned_rev, gross_rev,
       ROUND(returned_rev / gross_rev, 6) AS loss_ratio
FROM (
  SELECT month(o_orderdate) AS mo, c_mktsegment,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN {REVENUE_TERM} END)
              AS DOUBLE) AS returned_rev,
         CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS gross_rev
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE year(o_orderdate) = 1994
  GROUP BY 1, 2
)
ORDER BY mo, c_mktsegment
"""


# ---------------------------------------------------------------------------
# q79 shape — each customer's single largest order (top-1 window per entity)
# ---------------------------------------------------------------------------


def tpcds_q79_top_order_per_customer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = read_table(spark, "orders", sf_dir)
    cust = read_table(spark, "customer", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc(dec("o_totalprice")), F.asc("o_orderkey")
    )
    top = (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .filter(F.col("c_mktsegment") == "MACHINERY")
        .select(
            "c_custkey",
            F.substring("c_name", 1, 12).alias("c_short"),
            "o_orderkey",
            dec("o_totalprice").cast("double").alias("best_order"),
        )
        .orderBy(F.desc("best_order"), "c_custkey")
        .limit(30)
    )
    return top


TPCDS_Q79_SQL = """
SELECT c_custkey, SUBSTR(c_name, 1, 12) AS c_short, o_orderkey,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS best_order
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY CAST(o_totalprice AS DECIMAL(12,2)) DESC,
                                     o_orderkey) AS rn
  FROM orders
) t
JOIN customer ON t.o_custkey = c_custkey
WHERE rn = 1 AND c_mktsegment = 'MACHINERY'
ORDER BY best_order DESC, c_custkey
LIMIT 30
"""


# ---------------------------------------------------------------------------
# q84 shape — attribute-band lookup chain: customers in an acctbal band,
# displayed through a dim chain (the income-band join analogue)
# ---------------------------------------------------------------------------


def tpcds_q84_band_lookup_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    region = read_table(spark, "region", sf_dir)
    return (
        cust.filter(dec("c_acctbal").between(1000, 2000))
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .select(
            "c_custkey",
            F.concat_ws(", ", "c_name", "n_name", "r_name").alias("customer_id"),
        )
        .orderBy("c_custkey")
        .limit(100)
    )


TPCDS_Q84_SQL = """
SELECT c_custkey, concat_ws(', ', c_name, n_name, r_name) AS customer_id
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE CAST(c_acctbal AS DECIMAL(12,2)) BETWEEN 1000 AND 2000
ORDER BY c_custkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# q69 shape — customers active in one channel but in NEITHER of two others
# (one EXISTS + two NOT EXISTS), profiled by segment
# ---------------------------------------------------------------------------


def tpcds_q69_exclusive_channel_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    orders = read_table(spark, "orders", sf_dir)

    def custkeys(prios):
        return (
            orders.filter(F.col("o_orderpriority").isin(*prios))
            .select("o_custkey")
            .distinct()
        )

    express = custkeys(URGENT)
    medium = custkeys(("3-MEDIUM",))
    bulk = custkeys(LOW)
    only_express = (
        cust.join(express, cust.c_custkey == express.o_custkey, "left_semi")
        .join(medium, cust.c_custkey == medium.o_custkey, "left_anti")
        .join(bulk, cust.c_custkey == bulk.o_custkey, "left_anti")
    )
    return (
        only_express.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.max(dec("c_acctbal")).cast("double").alias("max_bal"),
        )
        .orderBy("c_mktsegment")
    )


TPCDS_Q69_SQL = """
SELECT c_mktsegment, COUNT(*) AS n_cust,
       CAST(MAX(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS max_bal
FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
              AND o_orderpriority IN ('1-URGENT','2-HIGH'))
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority = '3-MEDIUM')
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderpriority IN ('4-NOT SPECIFIED','5-LOW'))
GROUP BY 1 ORDER BY 1
"""


# ---------------------------------------------------------------------------
# q20 shape — ratio-to-class restricted to a date window (q98's share
# computation over a 60-day slice)
# ---------------------------------------------------------------------------


def tpcds_q20_windowed_class_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    li = read_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1995-02-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1995-04-02").cast("timestamp"))
    )
    per_brand = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_type", "p_brand")
        .agg(F.sum(_rev()).alias("rev"))
    )
    w = Window.partitionBy("p_type")
    return (
        per_brand.select(
            "p_type",
            "p_brand",
            F.col("rev").cast("double").alias("rev"),
            F.round(
                F.col("rev").cast("double")
                / F.sum("rev").over(w).cast("double") * 100,
                6,
            ).alias("class_share_pct"),
        )
        .orderBy("p_type", "p_brand")
    )


TPCDS_Q20_SQL = f"""
WITH per_brand AS (
  SELECT p_type, p_brand, SUM({REVENUE_TERM}) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1995-02-01'
    AND l_shipdate <  TIMESTAMP '1995-04-02'
  GROUP BY 1, 2
)
SELECT p_type, p_brand, CAST(rev AS DOUBLE) AS rev,
       ROUND(CAST(rev AS DOUBLE)
             / CAST(SUM(rev) OVER (PARTITION BY p_type) AS DOUBLE) * 100, 6)
         AS class_share_pct
FROM per_brand
ORDER BY p_type, p_brand
"""


QUERIES: dict[str, tuple] = {
    "tpcds_q94_multi_supplier_clean_orders": (
        tpcds_q94_multi_supplier_clean_orders, TPCDS_Q94_SQL),
    "tpcds_q91_loss_ratio_matrix": (
        tpcds_q91_loss_ratio_matrix, TPCDS_Q91_SQL),
    "tpcds_q79_top_order_per_customer": (
        tpcds_q79_top_order_per_customer, TPCDS_Q79_SQL),
    "tpcds_q84_band_lookup_chain": (
        tpcds_q84_band_lookup_chain, TPCDS_Q84_SQL),
    "tpcds_q69_exclusive_channel_profile": (
        tpcds_q69_exclusive_channel_profile, TPCDS_Q69_SQL),
    "tpcds_q20_windowed_class_share": (
        tpcds_q20_windowed_class_share, TPCDS_Q20_SQL),
}
