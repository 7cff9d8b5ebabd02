"""TPC-DS-pattern workload slice, part 4 — 8 more plan shapes.

Round-3 third widening (reference: testdata/workloads/tpcds/queries/):
expression join keys (q8's zip-prefix substring join), disjunctive
multi-dimension pushdown spanning join columns (q19/q85), three-channel
composite-key aggregate self-joins (q25/q29), selective dim-range-driven
scans (q37/q82), triple AND-OR guarded sums (q48), LEFT JOIN
null-check promotion counting (q72), per-channel NULL-dimension counts
over UNION ALL (q76), and chained EXCEPT across channels (q87).

Same adaptation + determinism discipline as parts 2-3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hopspark.catalog import read_table
from hopspark.operators._util import REVENUE_TERM, dec, dsum
from hopspark.operators.tpcds_patterns2 import (
    LOW,
    MEDIUM,
    URGENT,
    _li_orders,
    _rev,
)
from hopspark.operators.tpcds_patterns3 import _CHANNEL_SQL, _channel

# ---------------------------------------------------------------------------
# q8 shape — substring-prefix expression join key
# ---------------------------------------------------------------------------


def tpcds_q8_prefix_key_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    li = read_table(spark, "lineitem", sf_dir)
    prefix = F.substring("p_type", 1, 8)
    qualifying = (
        part.filter(F.col("p_size") > 40)
        .select(prefix.alias("pfx"))
        .distinct()
    )
    fact = li.join(part, li.l_partkey == part.p_partkey).select(
        prefix.alias("fact_pfx"), _rev().alias("rev")
    )
    return (
        fact.join(
            F.broadcast(qualifying), F.col("fact_pfx") == F.col("pfx")
        )
        .groupBy("pfx")
        .agg(F.count(F.lit(1)).alias("n_lines"), dsum(F.col("rev")).alias("rev"))
        .orderBy("pfx")
    )


TPCDS_Q8_SQL = f"""
WITH q AS (
  SELECT DISTINCT substring(p_type, 1, 8) AS pfx
  FROM part WHERE p_size > 40
)
SELECT pfx, COUNT(*) AS n_lines,
       CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS rev
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN q    ON substring(p_type, 1, 8) = pfx
GROUP BY pfx
ORDER BY pfx
"""

# ---------------------------------------------------------------------------
# q19/q85 shape — disjunctive predicates spanning columns of three joined
# tables (brand × quantity band × priority tier triples)
# ---------------------------------------------------------------------------


def tpcds_q19_disjunctive_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    base = _li_orders(spark, sf_dir).join(part, F.col("l_partkey") == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("l_quantity").between(1, 15)
            & F.col("o_orderpriority").isin(*URGENT)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("l_quantity").between(16, 30)
            & F.col("o_orderpriority").isin(*MEDIUM)
        )
        | (
            (F.col("p_brand") == "Brand#33")
            & F.col("l_quantity").between(31, 50)
            & F.col("o_orderpriority").isin(*LOW)
        )
    )
    return (
        base.filter(cond)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_lines"), dsum(_rev()).alias("rev"))
        .orderBy("p_brand")
    )


TPCDS_Q19_SQL = f"""
SELECT p_brand, COUNT(*) AS n_lines,
       CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS rev
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part   ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND l_quantity BETWEEN 1 AND 15
       AND o_orderpriority IN ('1-URGENT','2-HIGH'))
   OR (p_brand = 'Brand#22' AND l_quantity BETWEEN 16 AND 30
       AND o_orderpriority IN ('3-MEDIUM'))
   OR (p_brand = 'Brand#33' AND l_quantity BETWEEN 31 AND 50
       AND o_orderpriority IN ('4-NOT SPECIFIED','5-LOW'))
GROUP BY p_brand
ORDER BY p_brand
"""

# ---------------------------------------------------------------------------
# q25/q29 shape — three per-channel aggregate CTEs inner-joined on a
# composite key (REAL joins, not conditional sums — two shuffles + joins)
# ---------------------------------------------------------------------------


def tpcds_q29_channel_stats_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    part = read_table(spark, "part", sf_dir)
    base = (
        _li_orders(spark, sf_dir)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(part, F.col("l_partkey") == part.p_partkey)
        .select(
            "c_nationkey", "p_brand", _channel().alias("ch"),
            dec("l_quantity").alias("qty"),
        )
    )

    def chan(name: str, out: str) -> DataFrame:
        return (
            base.filter(F.col("ch") == name)
            .groupBy("c_nationkey", "p_brand")
            .agg(F.sum("qty").alias(out))
        )

    return (
        chan("urgent", "uq").join(chan("medium", "mq"), ["c_nationkey", "p_brand"])
        .join(chan("low", "lq"), ["c_nationkey", "p_brand"])
        .select(
            "c_nationkey", "p_brand",
            F.col("uq").cast("double").alias("urgent_qty"),
            F.col("mq").cast("double").alias("medium_qty"),
            F.col("lq").cast("double").alias("low_qty"),
        )
        .orderBy("c_nationkey", "p_brand")
        .limit(200)
    )


TPCDS_Q29_SQL = f"""
WITH base AS (
  SELECT c_nationkey, p_brand, {_CHANNEL_SQL} AS ch,
         CAST(l_quantity AS DECIMAL(12,2)) AS qty
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN part     ON l_partkey = p_partkey
),
u AS (SELECT c_nationkey, p_brand, SUM(qty) AS uq FROM base
      WHERE ch = 'urgent' GROUP BY 1, 2),
m AS (SELECT c_nationkey, p_brand, SUM(qty) AS mq FROM base
      WHERE ch = 'medium' GROUP BY 1, 2),
l AS (SELECT c_nationkey, p_brand, SUM(qty) AS lq FROM base
      WHERE ch = 'low' GROUP BY 1, 2)
SELECT u.c_nationkey, u.p_brand,
       CAST(uq AS DOUBLE) AS urgent_qty,
       CAST(mq AS DOUBLE) AS medium_qty,
       CAST(lq AS DOUBLE) AS low_qty
FROM u
JOIN m ON u.c_nationkey = m.c_nationkey AND u.p_brand = m.p_brand
JOIN l ON u.c_nationkey = l.c_nationkey AND u.p_brand = l.p_brand
ORDER BY u.c_nationkey, u.p_brand
LIMIT 200
"""

# ---------------------------------------------------------------------------
# q37/q82 shape — selective dim-range scan driving the fact join
# ---------------------------------------------------------------------------


def tpcds_q37_part_range_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    li = read_table(spark, "lineitem", sf_dir)
    sel = part.filter(
        F.col("p_retailprice").between(900, 1200)
        & F.col("p_size").isin(2, 4, 6, 8)
    )
    return (
        li.filter(F.year("l_shipdate") == 1996)
        .join(F.broadcast(sel), li.l_partkey == sel.p_partkey)
        .select("p_partkey", "p_name", "p_retailprice")
        .distinct()
        .orderBy("p_partkey")
        .limit(50)
    )


TPCDS_Q37_SQL = """
SELECT DISTINCT p_partkey, p_name, p_retailprice
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_retailprice BETWEEN 900 AND 1200
  AND p_size IN (2, 4, 6, 8)
  AND year(l_shipdate) = 1996
ORDER BY p_partkey
LIMIT 50
"""

# ---------------------------------------------------------------------------
# q48 shape — one guarded sum over triple AND-OR segment/quantity/discount
# bands spanning the customer join
# ---------------------------------------------------------------------------


def tpcds_q48_triple_or_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    base = _li_orders(spark, sf_dir).join(
        cust, F.col("o_custkey") == cust.c_custkey
    )
    cond = (
        (
            (F.col("c_mktsegment") == "BUILDING")
            & F.col("l_quantity").between(1, 20)
            & F.col("l_discount").between(0.0, 0.05)
        )
        | (
            (F.col("c_mktsegment") == "MACHINERY")
            & F.col("l_quantity").between(21, 35)
            & F.col("l_discount").between(0.03, 0.08)
        )
        | (
            (F.col("c_mktsegment") == "AUTOMOBILE")
            & F.col("l_quantity").between(36, 50)
            & F.col("l_discount").between(0.05, 0.1)
        )
    )
    return base.filter(cond).agg(
        F.sum(dec("l_quantity")).cast("double").alias("total_qty"),
        F.count(F.lit(1)).alias("n_lines"),
    )


TPCDS_Q48_SQL = """
SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE (c_mktsegment = 'BUILDING' AND l_quantity BETWEEN 1 AND 20
       AND l_discount BETWEEN 0.0 AND 0.05)
   OR (c_mktsegment = 'MACHINERY' AND l_quantity BETWEEN 21 AND 35
       AND l_discount BETWEEN 0.03 AND 0.08)
   OR (c_mktsegment = 'AUTOMOBILE' AND l_quantity BETWEEN 36 AND 50
       AND l_discount BETWEEN 0.05 AND 0.1)
"""

# ---------------------------------------------------------------------------
# q72 shape — LEFT JOIN to a derived promotion dim, matched vs unmatched
# counts per brand (the promo-is-null branch counting)
# ---------------------------------------------------------------------------


def tpcds_q72_promo_null_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    fact = (
        _li_orders(spark, sf_dir)
        .join(part, F.col("l_partkey") == part.p_partkey)
        .select(
            "p_brand",
            F.weekofyear("o_orderdate").alias("wk"),
            F.year("o_orderdate").alias("yr"),
            "l_discount",
        )
        .filter(F.col("yr") == 1996)
    )
    promo = (
        fact.filter(F.col("l_discount") >= 0.08)
        .select("p_brand", "wk")
        .distinct()
        .withColumn("is_promo", F.lit(1))
    )
    return (
        fact.join(F.broadcast(promo), ["p_brand", "wk"], "left")
        .groupBy("p_brand")
        .agg(
            F.count(F.when(F.col("is_promo").isNotNull(), 1)).alias("promo_lines"),
            F.count(F.when(F.col("is_promo").isNull(), 1)).alias("regular_lines"),
        )
        .orderBy("p_brand")
    )


TPCDS_Q72_SQL = """
WITH fact AS (
  SELECT p_brand, weekofyear(o_orderdate) AS wk, l_discount
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part   ON l_partkey = p_partkey
  WHERE year(o_orderdate) = 1996
),
promo AS (
  SELECT DISTINCT p_brand, wk, 1 AS is_promo FROM fact WHERE l_discount >= 0.08
)
SELECT f.p_brand,
       COUNT(CASE WHEN is_promo IS NOT NULL THEN 1 END) AS promo_lines,
       COUNT(CASE WHEN is_promo IS NULL THEN 1 END) AS regular_lines
FROM fact f
LEFT JOIN promo p ON f.p_brand = p.p_brand AND f.wk = p.wk
GROUP BY f.p_brand
ORDER BY f.p_brand
"""

# ---------------------------------------------------------------------------
# q76 shape — per-channel NULL-dimension counts over UNION ALL
# ---------------------------------------------------------------------------


def tpcds_q76_null_channel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _li_orders(spark, sf_dir).select(
        _channel().alias("ch"),
        F.nullif(F.col("l_returnflag"), F.lit("N")).alias("flag"),
        _rev().alias("rev"),
    )
    parts = [base.filter(F.col("ch") == c) for c in ("urgent", "medium", "low")]
    unioned = parts[0].unionByName(parts[1]).unionByName(parts[2])
    return (
        unioned.groupBy("ch")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.count(F.when(F.col("flag").isNull(), 1)).alias("null_flags"),
            dsum(F.col("rev")).alias("rev"),
        )
        .orderBy("ch")
    )


TPCDS_Q76_SQL = f"""
SELECT ch, COUNT(*) AS n_lines,
       COUNT(CASE WHEN flag IS NULL THEN 1 END) AS null_flags,
       CAST(SUM(rev) AS DOUBLE) AS rev
FROM (
  SELECT {_CHANNEL_SQL} AS ch, NULLIF(l_returnflag, 'N') AS flag,
         {REVENUE_TERM} AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
)
GROUP BY ch
ORDER BY ch
"""

# ---------------------------------------------------------------------------
# q87 shape — chained EXCEPT across the three channels' (customer, week)
# distinct sets
# ---------------------------------------------------------------------------


def tpcds_q87_chained_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, "orders", sf_dir).filter(
        F.year("o_orderdate") == 1996
    )

    def keys(prios: tuple) -> DataFrame:
        return (
            orders.filter(F.col("o_orderpriority").isin(*prios))
            .select("o_custkey", F.weekofyear("o_orderdate").alias("wk"))
            .distinct()
        )

    only_urgent = keys(URGENT).subtract(keys(MEDIUM)).subtract(keys(LOW))
    return only_urgent.agg(F.count(F.lit(1)).alias("n_urgent_only"))


TPCDS_Q87_SQL = """
SELECT COUNT(*) AS n_urgent_only FROM (
  SELECT DISTINCT o_custkey, weekofyear(o_orderdate) AS wk FROM orders
  WHERE year(o_orderdate) = 1996
    AND o_orderpriority IN ('1-URGENT','2-HIGH')
  EXCEPT
  SELECT DISTINCT o_custkey, weekofyear(o_orderdate) AS wk FROM orders
  WHERE year(o_orderdate) = 1996 AND o_orderpriority IN ('3-MEDIUM')
  EXCEPT
  SELECT DISTINCT o_custkey, weekofyear(o_orderdate) AS wk FROM orders
  WHERE year(o_orderdate) = 1996
    AND o_orderpriority IN ('4-NOT SPECIFIED','5-LOW')
)
"""


QUERIES: dict[str, tuple] = {
    "tpcds_q8_prefix_key_join": (tpcds_q8_prefix_key_join, TPCDS_Q8_SQL),
    "tpcds_q19_disjunctive_bands": (
        tpcds_q19_disjunctive_bands,
        TPCDS_Q19_SQL,
    ),
    "tpcds_q29_channel_stats_join": (
        tpcds_q29_channel_stats_join,
        TPCDS_Q29_SQL,
    ),
    "tpcds_q37_part_range_scan": (tpcds_q37_part_range_scan, TPCDS_Q37_SQL),
    "tpcds_q48_triple_or_sum": (tpcds_q48_triple_or_sum, TPCDS_Q48_SQL),
    "tpcds_q72_promo_null_counts": (
        tpcds_q72_promo_null_counts,
        TPCDS_Q72_SQL,
    ),
    "tpcds_q76_null_channel_counts": (
        tpcds_q76_null_channel_counts,
        TPCDS_Q76_SQL,
    ),
    "tpcds_q87_chained_except": (tpcds_q87_chained_except, TPCDS_Q87_SQL),
}
