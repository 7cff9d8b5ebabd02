"""TPC-DS-pattern workload slice, part 2 — 24 more plan shapes.

Round-3 widening (reference: testdata/workloads/tpcds/queries/, 205 files;
round-2 verdict item 3): the shapes round 2 left out — customer-vs-group-
average join-backs (q1/q30), week/year self-joins of aggregated CTEs
(q2/q74/q75), 4-way CTE growth self-joins (q4), correlated-aggregate
spend filters (q6/q32), EXISTS-chains (q10/q16/q35), multi-OR branchy
scans (q13/q41), UNION'd channel CTEs (q18a/q33/q75), ROLLUP hierarchies
(q18a/q22), wide single-row band unions (q28), INTERSECT across channels
(q38), exact-variance coefficient-of-variation self-joins (q39), windowed
deviation-from-average and share-of-total (q47/q53/q78), and equal-share
channel comparison (q58).

Adaptation to the driver's reduced TPC-H-ish schema: "channel" := order
priority class (urgent/medium/low — the schema has no ship mode),
"manufacturer" := p_type (6 values), "store/week dims" derived scan-side
from dates.  Determinism discipline: decimal sums cast to double only at
the end, averages as sum/count, ratios rounded to 6dp BEFORE any filter
or sort touches them, and every ORDER BY carries a full tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hopspark.catalog import read_table
from hopspark.operators._util import REVENUE_TERM, dec, dsum, one_minus

URGENT = ("1-URGENT", "2-HIGH")
MEDIUM = ("3-MEDIUM",)
LOW = ("4-NOT SPECIFIED", "5-LOW")

def _rev():
    """Exact-decimal revenue term; built lazily because Column construction
    needs an active SparkContext (module import must stay session-free)."""
    return dec("l_extendedprice") * one_minus("l_discount")


def _li_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    return li.join(orders, li.l_orderkey == orders.o_orderkey)


# ---------------------------------------------------------------------------
# q1 shape — per-customer returns vs 1.2 × group average (CTE join-back)
# ---------------------------------------------------------------------------


def tpcds_q1_returns_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    ctr = (
        _li_orders(spark, sf_dir)
        .filter(F.col("l_returnflag") == "R")
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.sum(_rev()).alias("ret"))
    )
    avg_ret = ctr.groupBy(F.col("c_nationkey").alias("nk")).agg(
        (F.sum("ret").cast("double") / F.count(F.lit(1))).alias("avg_ret")
    )
    return (
        ctr.join(avg_ret, ctr.c_nationkey == F.col("nk"))
        .filter(F.col("ret").cast("double") > 1.2 * F.col("avg_ret"))
        .join(F.broadcast(nation), ctr.c_nationkey == nation.n_nationkey)
        .select("c_custkey", "n_name", F.col("ret").cast("double").alias("ret"))
        .orderBy("c_custkey")
        .limit(100)
    )


TPCDS_Q1_SQL = f"""
WITH ctr AS (
  SELECT c_custkey, c_nationkey, SUM({REVENUE_TERM}) AS ret
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE l_returnflag = 'R'
  GROUP BY c_custkey, c_nationkey
)
SELECT c_custkey, n_name, CAST(ret AS DOUBLE) AS ret
FROM ctr
JOIN (SELECT c_nationkey AS nk, CAST(SUM(ret) AS DOUBLE) / COUNT(*) AS avg_ret
      FROM ctr GROUP BY c_nationkey) a ON ctr.c_nationkey = a.nk
JOIN nation ON ctr.c_nationkey = n_nationkey
WHERE CAST(ret AS DOUBLE) > 1.2 * avg_ret
ORDER BY c_custkey
LIMIT 100
"""

# ---------------------------------------------------------------------------
# q2 shape — week-over-year ratios of two channel CTEs (self-join on week)
# ---------------------------------------------------------------------------


def tpcds_q2_weekly_channel_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        _li_orders(spark, sf_dir)
        .filter(F.year("l_shipdate").isin(1995, 1996))
        .select(
            F.year("l_shipdate").alias("yr"),
            F.weekofyear("l_shipdate").alias("wk"),
            F.when(F.col("o_orderpriority").isin(*URGENT), F.lit("hi"))
            .otherwise(F.lit("lo"))
            .alias("ch"),
            _rev().alias("rev"),
        )
        .groupBy("yr", "wk", "ch")
        .agg(dsum(F.col("rev")).alias("rev"))
    )
    y1 = base.filter(F.col("yr") == 1995).select(
        "wk", "ch", F.col("rev").alias("rev1")
    )
    y2 = base.filter(F.col("yr") == 1996).select(
        "wk", "ch", F.col("rev").alias("rev2")
    )
    return (
        y1.join(y2, ["wk", "ch"])
        .select(
            "wk",
            "ch",
            F.round(
                F.col("rev2").cast("double") / F.col("rev1").cast("double"), 6
            ).alias("yoy_ratio"),
        )
        .orderBy("wk", "ch")
    )


TPCDS_Q2_SQL = f"""
WITH base AS (
  SELECT year(l_shipdate) AS yr, weekofyear(l_shipdate) AS wk,
         CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
              THEN 'hi' ELSE 'lo' END AS ch,
         SUM({REVENUE_TERM}) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(l_shipdate) IN (1995, 1996)
  GROUP BY 1, 2, 3
)
SELECT CAST(y1.wk AS INT) AS wk, y1.ch AS ch,
       ROUND(CAST(y2.rev AS DOUBLE) / CAST(y1.rev AS DOUBLE), 6) AS yoy_ratio
FROM base y1 JOIN base y2 ON y1.wk = y2.wk AND y1.ch = y2.ch
WHERE y1.yr = 1995 AND y2.yr = 1996
ORDER BY wk, ch
"""

# ---------------------------------------------------------------------------
# q4 shape — customer growth: 4 aggregated-CTE instances self-joined
# (2 channels × 2 years), keep customers whose low-priority growth beats
# their high-priority growth
# ---------------------------------------------------------------------------


def tpcds_q4_customer_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, "orders", sf_dir)
    yearly = (
        orders.filter(F.year("o_orderdate").isin(1995, 1996))
        .groupBy(
            "o_custkey",
            F.year("o_orderdate").alias("yr"),
            F.when(F.col("o_orderpriority").isin(*URGENT), F.lit("hi"))
            .otherwise(F.lit("lo"))
            .alias("ch"),
        )
        .agg(dsum(dec("o_totalprice")).alias("rev"))
    )

    def slice_(yr: int, ch: str, out: str) -> DataFrame:
        return yearly.filter((F.col("yr") == yr) & (F.col("ch") == ch)).select(
            F.col("o_custkey").alias("ck"), F.col("rev").alias(out)
        )

    hi1, hi2 = slice_(1995, "hi", "hi1"), slice_(1996, "hi", "hi2")
    lo1, lo2 = slice_(1995, "lo", "lo1"), slice_(1996, "lo", "lo2")
    return (
        hi1.join(hi2, "ck")
        .join(lo1, "ck")
        .join(lo2, "ck")
        .select(
            F.col("ck").alias("c_custkey"),
            F.round(F.col("lo2").cast("double") / F.col("lo1").cast("double"), 6)
            .alias("lo_growth"),
            F.round(F.col("hi2").cast("double") / F.col("hi1").cast("double"), 6)
            .alias("hi_growth"),
        )
        .filter(F.col("lo_growth") > F.col("hi_growth"))
        .orderBy("c_custkey")
        .limit(100)
    )


TPCDS_Q4_SQL = """
WITH yearly AS (
  SELECT o_custkey AS ck, year(o_orderdate) AS yr,
         CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
              THEN 'hi' ELSE 'lo' END AS ch,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
  FROM orders
  WHERE year(o_orderdate) IN (1995, 1996)
  GROUP BY 1, 2, 3
)
SELECT hi1.ck AS c_custkey,
       ROUND(CAST(lo2.rev AS DOUBLE) / CAST(lo1.rev AS DOUBLE), 6) AS lo_growth,
       ROUND(CAST(hi2.rev AS DOUBLE) / CAST(hi1.rev AS DOUBLE), 6) AS hi_growth
FROM yearly hi1
JOIN yearly hi2 ON hi1.ck = hi2.ck AND hi2.yr = 1996 AND hi2.ch = 'hi'
JOIN yearly lo1 ON hi1.ck = lo1.ck AND lo1.yr = 1995 AND lo1.ch = 'lo'
JOIN yearly lo2 ON hi1.ck = lo2.ck AND lo2.yr = 1996 AND lo2.ch = 'lo'
WHERE hi1.yr = 1995 AND hi1.ch = 'hi'
  AND ROUND(CAST(lo2.rev AS DOUBLE) / CAST(lo1.rev AS DOUBLE), 6)
    > ROUND(CAST(hi2.rev AS DOUBLE) / CAST(hi1.rev AS DOUBLE), 6)
ORDER BY c_custkey
LIMIT 100
"""

# ---------------------------------------------------------------------------
# q6 shape — nations whose customers buy parts priced ≥ 1.03 × the average
# price of the part's type (synthetic prices span only [900,1000)) (correlated-aggregate spend filter + HAVING)
# ---------------------------------------------------------------------------


def tpcds_q6_pricey_type_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    part = read_table(spark, "part", sf_dir)
    cust = read_table(spark, "customer", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    type_avg = part.groupBy(F.col("p_type").alias("t")).agg(
        (F.sum(dec("p_retailprice")).cast("double") / F.count(F.lit(1))).alias(
            "avg_price"
        )
    )
    pricey = part.join(F.broadcast(type_avg), part.p_type == F.col("t")).filter(
        F.col("p_retailprice").cast("double") > 1.03 * F.col("avg_price")
    )
    return (
        li.join(pricey, li.l_partkey == pricey.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 10)
        .orderBy("cnt", "n_name")
    )


TPCDS_Q6_SQL = """
WITH type_avg AS (
  SELECT p_type AS t,
         CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
           AS avg_price
  FROM part GROUP BY p_type
)
SELECT n_name, COUNT(*) AS cnt
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN type_avg ON p_type = t
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE CAST(p_retailprice AS DOUBLE) > 1.03 * avg_price
GROUP BY n_name
HAVING COUNT(*) >= 10
ORDER BY cnt, n_name
"""

# ---------------------------------------------------------------------------
# q10 shape — EXISTS-chain over two channels, grouped demographic counts
# ---------------------------------------------------------------------------


def tpcds_q10_exists_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    urgent = orders.filter(F.col("o_orderpriority").isin(*URGENT)).select(
        F.col("o_custkey").alias("uk")
    )
    low = orders.filter(F.col("o_orderpriority").isin(*LOW)).select(
        F.col("o_custkey").alias("lk")
    )
    return (
        cust.join(urgent, cust.c_custkey == F.col("uk"), "left_semi")
        .join(low, cust.c_custkey == F.col("lk"), "left_semi")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.max(dec("c_acctbal")).cast("double").alias("max_bal"),
        )
        .orderBy("c_mktsegment")
    )


TPCDS_Q10_SQL = """
SELECT c_mktsegment, COUNT(*) AS cnt,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       CAST(MAX(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS max_bal
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey
              AND o_orderpriority IN ('1-URGENT','2-HIGH'))
  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey
              AND o_orderpriority IN ('4-NOT SPECIFIED','5-LOW'))
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""

# ---------------------------------------------------------------------------
# q13 shape — single wide scan with multi-OR branch predicates feeding avgs
# ---------------------------------------------------------------------------


def tpcds_q13_branchy_averages(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    branch = (
        (
            (F.col("c_mktsegment") == "BUILDING")
            & F.col("l_quantity").between(1, 20)
            & F.col("l_discount").between(0.00, 0.03)
        )
        | (
            (F.col("c_mktsegment") == "MACHINERY")
            & F.col("l_quantity").between(21, 35)
            & F.col("l_discount").between(0.03, 0.06)
        )
        | (
            (F.col("c_mktsegment") == "AUTOMOBILE")
            & F.col("l_quantity").between(36, 50)
            & F.col("l_discount").between(0.06, 0.10)
        )
    )
    return (
        _li_orders(spark, sf_dir)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .filter(branch)
        .agg(
            (F.sum(dec("l_quantity")).cast("double") / F.count(F.lit(1))).alias(
                "avg_qty"
            ),
            (
                F.sum(dec("l_extendedprice")).cast("double") / F.count(F.lit(1))
            ).alias("avg_price"),
            dsum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )


TPCDS_Q13_SQL = f"""
SELECT CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
       CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS revenue,
       COUNT(*) AS cnt
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE (c_mktsegment = 'BUILDING'   AND l_quantity BETWEEN 1 AND 20
       AND l_discount BETWEEN 0.00 AND 0.03)
   OR (c_mktsegment = 'MACHINERY'  AND l_quantity BETWEEN 21 AND 35
       AND l_discount BETWEEN 0.03 AND 0.06)
   OR (c_mktsegment = 'AUTOMOBILE' AND l_quantity BETWEEN 36 AND 50
       AND l_discount BETWEEN 0.06 AND 0.10)
"""

# ---------------------------------------------------------------------------
# q16 shape — EXISTS (another line, different supplier) + NOT EXISTS
# (returned line) + distinct-count rollup of the surviving orders
# ---------------------------------------------------------------------------


def tpcds_q16_exists_notexists_count(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    orders = read_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority").isin(*URGENT)
    )
    multi_supp = (
        li.groupBy("l_orderkey")
        .agg(F.countDistinct("l_suppkey").alias("ns"))
        .filter(F.col("ns") > 1)
        .select(F.col("l_orderkey").alias("mk"))
    )
    returned = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("rk"))
        .distinct()
    )
    return (
        orders.join(multi_supp, orders.o_orderkey == F.col("mk"), "left_semi")
        .join(returned, orders.o_orderkey == F.col("rk"), "left_anti")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            dsum(dec("o_totalprice")).cast("double").alias("total_price"),
        )
    )


TPCDS_Q16_SQL = """
SELECT COUNT(DISTINCT o_custkey) AS n_customers,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
FROM orders o
WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
  AND EXISTS (SELECT 1 FROM lineitem l1 WHERE l1.l_orderkey = o.o_orderkey
              AND EXISTS (SELECT 1 FROM lineitem l2
                          WHERE l2.l_orderkey = o.o_orderkey
                            AND l2.l_suppkey <> l1.l_suppkey))
  AND NOT EXISTS (SELECT 1 FROM lineitem l3 WHERE l3.l_orderkey = o.o_orderkey
                  AND l3.l_returnflag = 'R')
"""

# ---------------------------------------------------------------------------
# q18a shape — UNION ALL of channel CTEs feeding ROLLUP(n_name, yr)
# ---------------------------------------------------------------------------


def tpcds_q18a_union_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    base = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .filter(F.year("o_orderdate").isin(1995, 1996))
        .select(
            "n_name",
            F.year("o_orderdate").alias("yr"),
            dec("o_totalprice").alias("price"),
            "o_orderpriority",
        )
    )
    hi = base.filter(F.col("o_orderpriority").isin(*URGENT))
    lo = base.filter(~F.col("o_orderpriority").isin(*URGENT))
    return (
        hi.unionByName(lo)
        .rollup("n_name", "yr")
        .agg(
            (F.sum("price").cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id("n_name", "yr").cast("int").alias("gid"),
        )
        .orderBy(
            F.col("gid").desc(),
            F.col("n_name").asc_nulls_first(),
            F.col("yr").asc_nulls_first(),
        )
    )


TPCDS_Q18A_SQL = """
WITH base AS (
  SELECT n_name, year(o_orderdate) AS yr,
         CAST(o_totalprice AS DECIMAL(12,2)) AS price
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE year(o_orderdate) IN (1995, 1996)
    AND o_orderpriority IN ('1-URGENT','2-HIGH')
  UNION ALL
  SELECT n_name, year(o_orderdate) AS yr,
         CAST(o_totalprice AS DECIMAL(12,2)) AS price
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  WHERE year(o_orderdate) IN (1995, 1996)
    AND o_orderpriority NOT IN ('1-URGENT','2-HIGH')
)
SELECT n_name, CAST(yr AS INT) AS yr,
       CAST(SUM(price) AS DOUBLE) / COUNT(*) AS avg_price,
       COUNT(*) AS n_orders,
       CAST(GROUPING(n_name, yr) AS INT) AS gid
FROM base
GROUP BY ROLLUP (n_name, yr)
ORDER BY gid DESC, n_name ASC NULLS FIRST, yr ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# q22 shape — three-level ROLLUP hierarchy over part attributes
# ---------------------------------------------------------------------------


def tpcds_q22_rollup_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    part = read_table(spark, "part", sf_dir)
    size_bucket = (F.col("p_size") - 1 - (F.col("p_size") - 1) % 10 + 1).cast("int")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .select(
            "p_type",
            "p_brand",
            size_bucket.alias("size_lo"),
            dec("l_quantity").alias("qty"),
        )
        .rollup("p_type", "p_brand", "size_lo")
        .agg(
            (F.sum("qty").cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            F.count(F.lit(1)).alias("cnt"),
            F.grouping_id("p_type", "p_brand", "size_lo").cast("int").alias("gid"),
        )
        .orderBy(
            F.col("gid").desc(),
            F.col("p_type").asc_nulls_first(),
            F.col("p_brand").asc_nulls_first(),
            F.col("size_lo").asc_nulls_first(),
        )
    )


TPCDS_Q22_SQL = """
SELECT p_type, p_brand,
       CAST((p_size - 1 - (p_size - 1) % 10 + 1) AS INT) AS size_lo,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
       COUNT(*) AS cnt,
       CAST(GROUPING(p_type, p_brand,
                     CAST((p_size - 1 - (p_size - 1) % 10 + 1) AS INT)) AS INT) AS gid
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY ROLLUP (p_type, p_brand,
                 CAST((p_size - 1 - (p_size - 1) % 10 + 1) AS INT))
ORDER BY gid DESC, p_type ASC NULLS FIRST, p_brand ASC NULLS FIRST,
         size_lo ASC NULLS FIRST
"""

# ---------------------------------------------------------------------------
# q28 shape — six filtered aggregate bands cross-joined into one wide row
# ---------------------------------------------------------------------------


def tpcds_q28_six_band_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)

    def band(lo: float, hi: float, i: int) -> DataFrame:
        return li.filter(
            (F.col("l_extendedprice") >= lo) & (F.col("l_extendedprice") < hi)
        ).agg(
            (
                F.sum(dec("l_extendedprice")).cast("double") / F.count(F.lit(1))
            ).alias(f"avg{i}"),
            F.count(F.lit(1)).alias(f"cnt{i}"),
            F.countDistinct("l_partkey").alias(f"ndv{i}"),
        )

    out = band(900, 10000, 1)
    for i, (lo, hi) in enumerate(
        [(10000, 20000), (20000, 30000), (30000, 40000), (40000, 50000), (50000, 110000)],
        start=2,
    ):
        out = out.crossJoin(band(lo, hi, i))
    return out


def _q28_band_sql(lo: int, hi: int, i: int) -> str:
    return (
        f"(SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)"
        f" / COUNT(*) AS avg{i}, COUNT(*) AS cnt{i},"
        f" COUNT(DISTINCT l_partkey) AS ndv{i} FROM lineitem"
        f" WHERE l_extendedprice >= {lo} AND l_extendedprice < {hi}) b{i}"
    )


TPCDS_Q28_SQL = "SELECT * FROM " + ", ".join(
    _q28_band_sql(lo, hi, i)
    for i, (lo, hi) in enumerate(
        [
            (900, 10000),
            (10000, 20000),
            (20000, 30000),
            (30000, 40000),
            (40000, 50000),
            (50000, 110000),
        ],
        start=1,
    )
)

# ---------------------------------------------------------------------------
# q30 shape — customer return ratio vs 1.2 × segment average (the q1 CTE
# reused at a different grain, plus customer attributes in the output)
# ---------------------------------------------------------------------------


def tpcds_q30_return_ratio_by_segment(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    ctr = (
        _li_orders(spark, sf_dir)
        .filter(F.col("l_returnflag") == "R")
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.sum(_rev()).alias("ret"))
    )
    seg_avg = ctr.groupBy(F.col("c_mktsegment").alias("seg")).agg(
        (F.sum("ret").cast("double") / F.count(F.lit(1))).alias("avg_ret")
    )
    return (
        ctr.join(F.broadcast(seg_avg), ctr.c_mktsegment == F.col("seg"))
        .filter(F.col("ret").cast("double") > 1.2 * F.col("avg_ret"))
        .join(cust.select("c_custkey", "c_acctbal"), "c_custkey")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.col("ret").cast("double").alias("ret"),
            dec("c_acctbal").cast("double").alias("acctbal"),
        )
        .orderBy("c_custkey")
        .limit(100)
    )


TPCDS_Q30_SQL = f"""
WITH ctr AS (
  SELECT c_custkey, c_mktsegment, SUM({REVENUE_TERM}) AS ret
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  WHERE l_returnflag = 'R'
  GROUP BY c_custkey, c_mktsegment
)
SELECT ctr.c_custkey, ctr.c_mktsegment, CAST(ret AS DOUBLE) AS ret,
       CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS DOUBLE) AS acctbal
FROM ctr
JOIN (SELECT c_mktsegment AS seg, CAST(SUM(ret) AS DOUBLE) / COUNT(*) AS avg_ret
      FROM ctr GROUP BY c_mktsegment) a ON ctr.c_mktsegment = a.seg
JOIN customer c ON ctr.c_custkey = c.c_custkey
WHERE CAST(ret AS DOUBLE) > 1.2 * avg_ret
ORDER BY ctr.c_custkey
LIMIT 100
"""

# ---------------------------------------------------------------------------
# q32 shape — excess discount: lineitems discounted more than 1.3 × their
# part's average discount (correlated aggregate as a join-back)
# ---------------------------------------------------------------------------


def tpcds_q32_excess_discount(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        (F.sum(dec("l_discount", 4, 2)).cast("double") / F.count(F.lit(1))).alias(
            "avg_disc"
        )
    )
    return (
        li.join(part_avg, li.l_partkey == F.col("pk"))
        .filter(F.col("l_discount").cast("double") > 1.3 * F.col("avg_disc"))
        .agg(
            dsum(dec("l_extendedprice")).cast("double").alias("excess_revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


TPCDS_Q32_SQL = """
WITH part_avg AS (
  SELECT l_partkey AS pk,
         CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*)
           AS avg_disc
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
         AS excess_revenue,
       COUNT(*) AS n_lines
FROM lineitem JOIN part_avg ON l_partkey = pk
WHERE CAST(l_discount AS DOUBLE) > 1.3 * avg_disc
"""

# ---------------------------------------------------------------------------
# q33 shape — per-"manufacturer" revenue UNION ALL'd across three channel
# CTEs, re-aggregated into channel totals
# ---------------------------------------------------------------------------


def tpcds_q33_manufacturer_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    base = (
        _li_orders(spark, sf_dir)
        .join(part, F.col("l_partkey") == part.p_partkey)
        .select(
            "p_type",
            "o_orderpriority",
            _rev().alias("rev"),
        )
    )

    def channel(prios: tuple, name: str) -> DataFrame:
        return (
            base.filter(F.col("o_orderpriority").isin(*prios))
            .groupBy("p_type")
            .agg(F.sum(F.col("rev")).alias("rev"))
            .select("p_type", F.lit(name).alias("channel"), "rev")
        )

    return (
        channel(URGENT, "urgent")
        .unionByName(channel(MEDIUM, "medium"))
        .unionByName(channel(LOW, "low"))
        .groupBy("p_type")
        .agg(
            dsum(F.col("rev")).cast("double").alias("total_rev"),
            F.count(F.lit(1)).alias("n_channels"),
        )
        .orderBy("p_type")
    )


TPCDS_Q33_SQL = f"""
WITH base AS (
  SELECT p_type, o_orderpriority, {REVENUE_TERM} AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part   ON l_partkey = p_partkey
),
channels AS (
  SELECT p_type, 'urgent' AS channel, SUM(rev) AS rev FROM base
  WHERE o_orderpriority IN ('1-URGENT','2-HIGH') GROUP BY p_type
  UNION ALL
  SELECT p_type, 'medium' AS channel, SUM(rev) AS rev FROM base
  WHERE o_orderpriority IN ('3-MEDIUM') GROUP BY p_type
  UNION ALL
  SELECT p_type, 'low' AS channel, SUM(rev) AS rev FROM base
  WHERE o_orderpriority IN ('4-NOT SPECIFIED','5-LOW') GROUP BY p_type
)
SELECT p_type, CAST(SUM(rev) AS DOUBLE) AS total_rev,
       COUNT(*) AS n_channels
FROM channels
GROUP BY p_type
ORDER BY p_type
"""

# ---------------------------------------------------------------------------
# q35a shape — IN-subquery plus OR'd EXISTS pair, grouped stats
# ---------------------------------------------------------------------------


def tpcds_q35a_in_exists_combo(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    in_1995 = (
        orders.filter(F.year("o_orderdate") == 1995)
        .select(F.col("o_custkey").alias("k95"))
        .distinct()
    )
    urgent = orders.filter(F.col("o_orderpriority").isin(*URGENT)).select(
        F.col("o_custkey").alias("ku")
    )
    big = orders.filter(F.col("o_totalprice") > 200000).select(
        F.col("o_custkey").alias("kb")
    )
    either = urgent.unionByName(
        big.select(F.col("kb").alias("ku"))
    ).distinct()
    return (
        cust.join(in_1995, cust.c_custkey == F.col("k95"), "left_semi")
        .join(either, cust.c_custkey == F.col("ku"), "left_semi")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_mktsegment", "n_name")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum(dec("c_acctbal")).cast("double").alias("sum_bal"),
            F.max(dec("c_acctbal")).cast("double").alias("max_bal"),
        )
        .orderBy("c_mktsegment", "n_name")
    )


TPCDS_Q35A_SQL = """
SELECT c_mktsegment, n_name, COUNT(*) AS cnt,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS sum_bal,
       CAST(MAX(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS max_bal
FROM customer c
JOIN nation ON c_nationkey = n_nationkey
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995)
  AND (EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey
               AND o_orderpriority IN ('1-URGENT','2-HIGH'))
       OR EXISTS (SELECT 1 FROM orders WHERE o_custkey = c.c_custkey
                  AND o_totalprice > 200000))
GROUP BY c_mktsegment, n_name
ORDER BY c_mktsegment, n_name
"""

# ---------------------------------------------------------------------------
# q38 shape — customers present in ALL three channels (INTERSECT chain)
# ---------------------------------------------------------------------------


def tpcds_q38_intersect_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, "orders", sf_dir)

    def keys(prios: tuple) -> DataFrame:
        return (
            orders.filter(F.col("o_orderpriority").isin(*prios))
            .select("o_custkey")
            .distinct()
        )

    return (
        keys(URGENT)
        .intersect(keys(MEDIUM))
        .intersect(keys(LOW))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


TPCDS_Q38_SQL = """
SELECT COUNT(*) AS n_customers FROM (
  SELECT o_custkey FROM orders
  WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
  INTERSECT
  SELECT o_custkey FROM orders WHERE o_orderpriority IN ('3-MEDIUM')
  INTERSECT
  SELECT o_custkey FROM orders
  WHERE o_orderpriority IN ('4-NOT SPECIFIED','5-LOW')
) t
"""

# ---------------------------------------------------------------------------
# q39 shape — coefficient of variation from EXACT decimal sums, self-joined
# on consecutive months.  Variance via (sum(q²) - sum(q)²/n)/(n-1) keeps
# both engines bit-identical (summation-order-proof); cov rounded to 6dp
# BEFORE the filter so the threshold cannot flake.
# ---------------------------------------------------------------------------


def tpcds_q39_inventory_cov(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir).filter(
        F.year("l_shipdate") == 1995
    )
    q = dec("l_quantity")
    stats = (
        li.groupBy(
            "l_suppkey", F.month("l_shipdate").alias("mo")
        )
        .agg(
            F.sum(q).alias("s"),
            F.sum(q * q).alias("s2"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") > 1)
        .select(
            "l_suppkey",
            "mo",
            F.round(
                F.sqrt(
                    (
                        F.col("s2").cast("double")
                        - F.col("s").cast("double")
                        * F.col("s").cast("double")
                        / F.col("n")
                    )
                    / (F.col("n") - 1)
                )
                / (F.col("s").cast("double") / F.col("n")),
                6,
            ).alias("cov"),
        )
    )
    a = stats.select(
        F.col("l_suppkey").alias("sk"), F.col("mo").alias("mo1"), F.col("cov").alias("cov1")
    )
    b = stats.select(
        F.col("l_suppkey").alias("sk"), F.col("mo").alias("mo2"), F.col("cov").alias("cov2")
    )
    return (
        a.join(b, "sk")
        .filter(
            (F.col("mo2") == F.col("mo1") + 1)
            & (F.col("cov1") > 0.6)
            & (F.col("cov2") > 0.6)
        )
        .select(
            F.col("sk").alias("l_suppkey"), "mo1", "cov1", "mo2", "cov2"
        )
        .orderBy("l_suppkey", "mo1")
    )


TPCDS_Q39_SQL = """
WITH stats AS (
  SELECT l_suppkey, month(l_shipdate) AS mo,
         ROUND(
           sqrt((CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))
                          * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                 - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                   * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
                   / COUNT(*))
                / (COUNT(*) - 1))
           / (CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)),
           6) AS cov
  FROM lineitem
  WHERE year(l_shipdate) = 1995
  GROUP BY l_suppkey, month(l_shipdate)
  HAVING COUNT(*) > 1
)
SELECT a.l_suppkey, CAST(a.mo AS INT) AS mo1, a.cov AS cov1,
       CAST(b.mo AS INT) AS mo2, b.cov AS cov2
FROM stats a JOIN stats b
  ON a.l_suppkey = b.l_suppkey AND b.mo = a.mo + 1
WHERE a.cov > 0.6 AND b.cov > 0.6
ORDER BY a.l_suppkey, mo1
"""


# ---------------------------------------------------------------------------
# q41 shape — distinct dimension rows via OR'd correlated EXISTS over the
# same dimension (self-referential attribute combos)
# ---------------------------------------------------------------------------


def tpcds_q41_or_exists_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    combo = part.filter(
        ((F.col("p_type") == "ECONOMY") & F.col("p_size").between(1, 15))
        | ((F.col("p_type") == "PROMO") & F.col("p_size").between(30, 45))
    ).select(F.col("p_brand").alias("b"))
    return (
        part.join(combo, part.p_brand == F.col("b"), "left_semi")
        .select("p_name")
        .distinct()
        .orderBy("p_name")
        .limit(50)
    )


TPCDS_Q41_SQL = """
SELECT DISTINCT p_name
FROM part p
WHERE EXISTS (
  SELECT 1 FROM part p2
  WHERE p2.p_brand = p.p_brand
    AND ((p2.p_type = 'ECONOMY' AND p2.p_size BETWEEN 1 AND 15)
         OR (p2.p_type = 'PROMO' AND p2.p_size BETWEEN 30 AND 45))
)
ORDER BY p_name
LIMIT 50
"""

# ---------------------------------------------------------------------------
# q45 shape — geo filter OR'd with an IN-subquery over a different table
# ---------------------------------------------------------------------------


def tpcds_q45_geo_or_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    rich = cust.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("rk")
    )
    base = (
        _li_orders(spark, sf_dir)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    in_rich = base.join(rich, F.col("c_custkey") == F.col("rk"), "left_semi")
    named = base.filter(F.col("n_name").isin("NATION_1", "NATION_3"))
    return (
        named.unionByName(in_rich)
        .select("n_name", "l_orderkey", "l_linenumber", _rev().alias("rev"))
        .distinct()
        .groupBy("n_name")
        .agg(
            dsum(F.col("rev")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
        .orderBy("n_name")
    )


TPCDS_Q45_SQL = f"""
SELECT n_name, CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE n_name IN ('NATION_1', 'NATION_3')
   OR c_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
GROUP BY n_name
ORDER BY n_name
"""

# ---------------------------------------------------------------------------
# q47 shape — monthly revenue vs the brand-year window average, with
# lag/lead neighbors in the same window (deviation-from-average analytics)
# ---------------------------------------------------------------------------


def tpcds_q47_window_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    monthly = (
        read_table(spark, "lineitem", sf_dir)
        .filter(F.year("l_shipdate") == 1995)
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", F.month("l_shipdate").alias("mo"))
        .agg(F.sum(_rev()).alias("rev"))
    )
    w = Window.partitionBy("p_brand")
    wo = Window.partitionBy("p_brand").orderBy("mo")
    dev = monthly.select(
        "p_brand",
        "mo",
        F.col("rev").cast("double").alias("rev"),
        (F.sum("rev").over(w).cast("double") / F.count(F.lit(1)).over(w)).alias(
            "avg_rev"
        ),
        F.lag(F.col("rev").cast("double")).over(wo).alias("prev_rev"),
        F.lead(F.col("rev").cast("double")).over(wo).alias("next_rev"),
    )
    return (
        dev.withColumn(
            "dev_ratio",
            F.round((F.col("rev") - F.col("avg_rev")) / F.col("avg_rev"), 6),
        )
        .filter(F.abs(F.col("dev_ratio")) > 0.1)
        .orderBy("p_brand", "mo")
    )


TPCDS_Q47_SQL = f"""
WITH monthly AS (
  SELECT p_brand, month(l_shipdate) AS mo, SUM({REVENUE_TERM}) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE year(l_shipdate) = 1995
  GROUP BY p_brand, month(l_shipdate)
),
dev AS (
  SELECT p_brand, CAST(mo AS INT) AS mo, CAST(rev AS DOUBLE) AS rev,
         CAST(SUM(rev) OVER (PARTITION BY p_brand) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY p_brand) AS avg_rev,
         LAG(CAST(rev AS DOUBLE)) OVER (PARTITION BY p_brand ORDER BY mo)
           AS prev_rev,
         LEAD(CAST(rev AS DOUBLE)) OVER (PARTITION BY p_brand ORDER BY mo)
           AS next_rev
  FROM monthly
)
SELECT p_brand, mo, rev, avg_rev, prev_rev, next_rev,
       ROUND((rev - avg_rev) / avg_rev, 6) AS dev_ratio
FROM dev
WHERE abs(ROUND((rev - avg_rev) / avg_rev, 6)) > 0.1
ORDER BY p_brand, mo
"""

# ---------------------------------------------------------------------------
# q53 shape — quarterly share-of-total within "manufacturer" (windowed
# share), keeping quarters that deviate from an even share
# ---------------------------------------------------------------------------


def tpcds_q53_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    quarterly = (
        read_table(spark, "lineitem", sf_dir)
        .filter(F.year("l_shipdate") == 1995)
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_type", F.quarter("l_shipdate").alias("qtr"))
        .agg(F.sum(_rev()).alias("rev"))
    )
    w = Window.partitionBy("p_type")
    return (
        quarterly.select(
            "p_type",
            "qtr",
            F.col("rev").cast("double").alias("rev"),
            F.round(
                F.col("rev").cast("double") / F.sum("rev").over(w).cast("double"),
                6,
            ).alias("share"),
        )
        .filter(F.abs(F.col("share") - 0.25) > 0.02)
        .orderBy("p_type", "qtr")
    )


TPCDS_Q53_SQL = f"""
WITH quarterly AS (
  SELECT p_type, quarter(l_shipdate) AS qtr, SUM({REVENUE_TERM}) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE year(l_shipdate) = 1995
  GROUP BY p_type, quarter(l_shipdate)
)
SELECT * FROM (
  SELECT p_type, CAST(qtr AS INT) AS qtr, CAST(rev AS DOUBLE) AS rev,
         ROUND(CAST(rev AS DOUBLE)
               / CAST(SUM(rev) OVER (PARTITION BY p_type) AS DOUBLE), 6) AS share
  FROM quarterly
) t
WHERE abs(share - 0.25) > 0.02
ORDER BY p_type, qtr
"""

# ---------------------------------------------------------------------------
# q58 shape — brands whose three channel revenues each sit within a band
# around the cross-channel average (0.5-1.5: the channel classes are
# 2/1/2 priorities wide, so even shares cluster near 0.6/1.2) (equal-share comparison of 3 CTEs)
# ---------------------------------------------------------------------------


def tpcds_q58_equal_share_channels(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    base = (
        _li_orders(spark, sf_dir)
        .join(part, F.col("l_partkey") == part.p_partkey)
        .select("p_brand", "o_orderpriority", _rev().alias("rev"))
    )

    def chan(prios: tuple, out: str) -> DataFrame:
        return (
            base.filter(F.col("o_orderpriority").isin(*prios))
            .groupBy("p_brand")
            .agg(dsum(F.col("rev")).cast("double").alias(out))
        )

    joined = (
        chan(URGENT, "rev_hi")
        .join(chan(MEDIUM, "rev_md"), "p_brand")
        .join(chan(LOW, "rev_lo"), "p_brand")
        .withColumn(
            "avg_rev",
            (F.col("rev_hi") + F.col("rev_md") + F.col("rev_lo")) / 3.0,
        )
    )
    in_band = (
        (F.col("rev_hi") / F.col("avg_rev")).between(0.5, 1.5)
        & (F.col("rev_md") / F.col("avg_rev")).between(0.5, 1.5)
        & (F.col("rev_lo") / F.col("avg_rev")).between(0.5, 1.5)
    )
    return (
        joined.filter(in_band)
        .select("p_brand", "rev_hi", "rev_md", "rev_lo")
        .orderBy("p_brand")
    )


TPCDS_Q58_SQL = f"""
WITH base AS (
  SELECT p_brand, o_orderpriority, {REVENUE_TERM} AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part   ON l_partkey = p_partkey
),
hi AS (SELECT p_brand, CAST(SUM(rev) AS DOUBLE) AS rev_hi FROM base
       WHERE o_orderpriority IN ('1-URGENT','2-HIGH') GROUP BY p_brand),
md AS (SELECT p_brand, CAST(SUM(rev) AS DOUBLE) AS rev_md FROM base
       WHERE o_orderpriority IN ('3-MEDIUM') GROUP BY p_brand),
lo AS (SELECT p_brand, CAST(SUM(rev) AS DOUBLE) AS rev_lo FROM base
       WHERE o_orderpriority IN ('4-NOT SPECIFIED','5-LOW') GROUP BY p_brand)
SELECT hi.p_brand AS p_brand, rev_hi, rev_md, rev_lo
FROM hi JOIN md ON hi.p_brand = md.p_brand
        JOIN lo ON hi.p_brand = lo.p_brand
WHERE rev_hi / ((rev_hi + rev_md + rev_lo) / 3.0) BETWEEN 0.5 AND 1.5
  AND rev_md / ((rev_hi + rev_md + rev_lo) / 3.0) BETWEEN 0.5 AND 1.5
  AND rev_lo / ((rev_hi + rev_md + rev_lo) / 3.0) BETWEEN 0.5 AND 1.5
ORDER BY p_brand
"""

# ---------------------------------------------------------------------------
# q74 shape — year-over-year ORDER-COUNT ratio per customer across two
# channels; keep customers whose low-channel ratio beats the high-channel
# ratio (the count-based little sibling of q4)
# ---------------------------------------------------------------------------


def tpcds_q74_yoy_count_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, "orders", sf_dir)
    yearly = (
        orders.filter(F.year("o_orderdate").isin(1995, 1996))
        .groupBy(
            "o_custkey",
            F.year("o_orderdate").alias("yr"),
            F.when(F.col("o_orderpriority").isin(*URGENT), F.lit("hi"))
            .otherwise(F.lit("lo"))
            .alias("ch"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    def slice_(yr: int, ch: str, out: str) -> DataFrame:
        return yearly.filter((F.col("yr") == yr) & (F.col("ch") == ch)).select(
            F.col("o_custkey").alias("ck"), F.col("cnt").alias(out)
        )

    return (
        slice_(1995, "hi", "h1")
        .join(slice_(1996, "hi", "h2"), "ck")
        .join(slice_(1995, "lo", "l1"), "ck")
        .join(slice_(1996, "lo", "l2"), "ck")
        .select(
            F.col("ck").alias("c_custkey"),
            F.round(F.col("l2") / F.col("l1"), 6).alias("lo_ratio"),
            F.round(F.col("h2") / F.col("h1"), 6).alias("hi_ratio"),
        )
        .filter(F.col("lo_ratio") > F.col("hi_ratio"))
        .orderBy(F.desc("lo_ratio"), "c_custkey")
        .limit(100)
    )


TPCDS_Q74_SQL = """
WITH yearly AS (
  SELECT o_custkey AS ck, year(o_orderdate) AS yr,
         CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
              THEN 'hi' ELSE 'lo' END AS ch,
         COUNT(*) AS cnt
  FROM orders
  WHERE year(o_orderdate) IN (1995, 1996)
  GROUP BY 1, 2, 3
)
SELECT h1.ck AS c_custkey,
       ROUND(CAST(l2.cnt AS DOUBLE) / l1.cnt, 6) AS lo_ratio,
       ROUND(CAST(h2.cnt AS DOUBLE) / h1.cnt, 6) AS hi_ratio
FROM yearly h1
JOIN yearly h2 ON h1.ck = h2.ck AND h2.yr = 1996 AND h2.ch = 'hi'
JOIN yearly l1 ON h1.ck = l1.ck AND l1.yr = 1995 AND l1.ch = 'lo'
JOIN yearly l2 ON h1.ck = l2.ck AND l2.yr = 1996 AND l2.ch = 'lo'
WHERE h1.yr = 1995 AND h1.ch = 'hi'
  AND ROUND(CAST(l2.cnt AS DOUBLE) / l1.cnt, 6)
    > ROUND(CAST(h2.cnt AS DOUBLE) / h1.cnt, 6)
ORDER BY lo_ratio DESC, c_custkey
LIMIT 100
"""

# ---------------------------------------------------------------------------
# q75 shape — per-(year, brand) quantity+revenue across UNION'd channels,
# current-vs-prior-year join, negative deltas first
# ---------------------------------------------------------------------------


def tpcds_q75_brand_yoy_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    base = (
        _li_orders(spark, sf_dir)
        .filter(F.year("o_orderdate").isin(1995, 1996))
        .join(part, F.col("l_partkey") == part.p_partkey)
        .select(
            F.year("o_orderdate").alias("yr"),
            "p_brand",
            "o_orderpriority",
            dec("l_quantity").alias("qty"),
            _rev().alias("rev"),
        )
    )
    hi = base.filter(F.col("o_orderpriority").isin(*URGENT))
    rest = base.filter(~F.col("o_orderpriority").isin(*URGENT))
    tot = (
        hi.unionByName(rest)
        .groupBy("yr", "p_brand")
        .agg(
            F.sum("qty").alias("qty"),
            F.sum(F.col("rev")).alias("rev"),
        )
    )
    cur = tot.filter(F.col("yr") == 1996).select(
        "p_brand", F.col("qty").alias("qty2"), F.col("rev").alias("rev2")
    )
    prev = tot.filter(F.col("yr") == 1995).select(
        "p_brand", F.col("qty").alias("qty1"), F.col("rev").alias("rev1")
    )
    return (
        cur.join(prev, "p_brand")
        .select(
            "p_brand",
            (F.col("qty2") - F.col("qty1")).cast("double").alias("qty_delta"),
            (F.col("rev2") - F.col("rev1")).cast("double").alias("rev_delta"),
        )
        .filter(F.col("qty_delta") < 0)
        .orderBy("qty_delta", "p_brand")
        .limit(100)
    )


TPCDS_Q75_SQL = f"""
WITH base AS (
  SELECT year(o_orderdate) AS yr, p_brand,
         CAST(l_quantity AS DECIMAL(12,2)) AS qty, {REVENUE_TERM} AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part   ON l_partkey = p_partkey
  WHERE year(o_orderdate) IN (1995, 1996)
    AND o_orderpriority IN ('1-URGENT','2-HIGH')
  UNION ALL
  SELECT year(o_orderdate) AS yr, p_brand,
         CAST(l_quantity AS DECIMAL(12,2)) AS qty, {REVENUE_TERM} AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part   ON l_partkey = p_partkey
  WHERE year(o_orderdate) IN (1995, 1996)
    AND o_orderpriority NOT IN ('1-URGENT','2-HIGH')
),
tot AS (
  SELECT yr, p_brand, SUM(qty) AS qty, SUM(rev) AS rev
  FROM base GROUP BY yr, p_brand
)
SELECT cur.p_brand AS p_brand,
       CAST(cur.qty - prev.qty AS DOUBLE) AS qty_delta,
       CAST(cur.rev - prev.rev AS DOUBLE) AS rev_delta
FROM tot cur JOIN tot prev
  ON cur.p_brand = prev.p_brand AND cur.yr = 1996 AND prev.yr = 1995
WHERE CAST(cur.qty - prev.qty AS DOUBLE) < 0
ORDER BY qty_delta, p_brand
LIMIT 100
"""

# ---------------------------------------------------------------------------
# q78 shape — per-(customer, year) cross-channel quantity ratio with a
# windowed rank over the ratio
# ---------------------------------------------------------------------------


def tpcds_q78_cross_channel_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        _li_orders(spark, sf_dir)
        .filter(F.year("o_orderdate") == 1995)
        .select(
            "o_custkey",
            F.when(F.col("o_orderpriority").isin(*URGENT), F.lit("hi"))
            .otherwise(F.lit("lo"))
            .alias("ch"),
            dec("l_quantity").alias("qty"),
        )
        .groupBy("o_custkey", "ch")
        .agg(F.sum("qty").alias("qty"))
    )
    hi = base.filter(F.col("ch") == "hi").select(
        F.col("o_custkey").alias("ck"), F.col("qty").alias("hi_qty")
    )
    lo = base.filter(F.col("ch") == "lo").select(
        F.col("o_custkey").alias("ck"), F.col("qty").alias("lo_qty")
    )
    ratio = hi.join(lo, "ck").select(
        F.col("ck").alias("c_custkey"),
        F.col("hi_qty").cast("double").alias("hi_qty"),
        F.col("lo_qty").cast("double").alias("lo_qty"),
        F.round(F.col("hi_qty").cast("double") / F.col("lo_qty").cast("double"), 6)
        .alias("ratio"),
    )
    w = Window.orderBy(F.desc("ratio"), F.asc("c_custkey"))
    return (
        ratio.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 50)
        .orderBy("rk")
    )


TPCDS_Q78_SQL = """
WITH base AS (
  SELECT o_custkey,
         CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
              THEN 'hi' ELSE 'lo' END AS ch,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE year(o_orderdate) = 1995
  GROUP BY 1, 2
),
ratio AS (
  SELECT hi.o_custkey AS c_custkey,
         CAST(hi.qty AS DOUBLE) AS hi_qty,
         CAST(lo.qty AS DOUBLE) AS lo_qty,
         ROUND(CAST(hi.qty AS DOUBLE) / CAST(lo.qty AS DOUBLE), 6) AS ratio
  FROM base hi JOIN base lo
    ON hi.o_custkey = lo.o_custkey AND hi.ch = 'hi' AND lo.ch = 'lo'
)
SELECT c_custkey, hi_qty, lo_qty, ratio,
       CAST(ROW_NUMBER() OVER (ORDER BY ratio DESC, c_custkey) AS INT) AS rk
FROM ratio
QUALIFY rk <= 50
ORDER BY rk
"""


QUERIES: dict[str, tuple] = {
    "tpcds_q1_returns_above_avg": (tpcds_q1_returns_above_avg, TPCDS_Q1_SQL),
    "tpcds_q2_weekly_channel_ratio": (
        tpcds_q2_weekly_channel_ratio,
        TPCDS_Q2_SQL,
    ),
    "tpcds_q4_customer_growth": (tpcds_q4_customer_growth, TPCDS_Q4_SQL),
    "tpcds_q6_pricey_type_buyers": (tpcds_q6_pricey_type_buyers, TPCDS_Q6_SQL),
    "tpcds_q10_exists_chain": (tpcds_q10_exists_chain, TPCDS_Q10_SQL),
    "tpcds_q13_branchy_averages": (tpcds_q13_branchy_averages, TPCDS_Q13_SQL),
    "tpcds_q16_exists_notexists_count": (
        tpcds_q16_exists_notexists_count,
        TPCDS_Q16_SQL,
    ),
    "tpcds_q18a_union_rollup": (tpcds_q18a_union_rollup, TPCDS_Q18A_SQL),
    "tpcds_q22_rollup_hierarchy": (tpcds_q22_rollup_hierarchy, TPCDS_Q22_SQL),
    "tpcds_q28_six_band_row": (tpcds_q28_six_band_row, TPCDS_Q28_SQL),
    "tpcds_q30_return_ratio_by_segment": (
        tpcds_q30_return_ratio_by_segment,
        TPCDS_Q30_SQL,
    ),
    "tpcds_q32_excess_discount": (tpcds_q32_excess_discount, TPCDS_Q32_SQL),
    "tpcds_q33_manufacturer_union": (
        tpcds_q33_manufacturer_union,
        TPCDS_Q33_SQL,
    ),
    "tpcds_q35a_in_exists_combo": (tpcds_q35a_in_exists_combo, TPCDS_Q35A_SQL),
    "tpcds_q38_intersect_channels": (
        tpcds_q38_intersect_channels,
        TPCDS_Q38_SQL,
    ),
    "tpcds_q39_inventory_cov": (tpcds_q39_inventory_cov, TPCDS_Q39_SQL),
    "tpcds_q41_or_exists_distinct": (
        tpcds_q41_or_exists_distinct,
        TPCDS_Q41_SQL,
    ),
    "tpcds_q45_geo_or_in": (tpcds_q45_geo_or_in, TPCDS_Q45_SQL),
    "tpcds_q47_window_deviation": (tpcds_q47_window_deviation, TPCDS_Q47_SQL),
    "tpcds_q53_share_of_total": (tpcds_q53_share_of_total, TPCDS_Q53_SQL),
    "tpcds_q58_equal_share_channels": (
        tpcds_q58_equal_share_channels,
        TPCDS_Q58_SQL,
    ),
    "tpcds_q74_yoy_count_ratio": (tpcds_q74_yoy_count_ratio, TPCDS_Q74_SQL),
    "tpcds_q75_brand_yoy_delta": (tpcds_q75_brand_yoy_delta, TPCDS_Q75_SQL),
    "tpcds_q78_cross_channel_ratio": (
        tpcds_q78_cross_channel_ratio,
        TPCDS_Q78_SQL,
    ),
}
