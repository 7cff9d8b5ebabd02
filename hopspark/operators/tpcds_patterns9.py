"""TPC-DS-pattern workload slice, part 9 — 11 more plan shapes (→ 117).

Round-5 widening (reference corpus: testdata/workloads/tpcds/queries/, 205
files): the previously-unmirrored report family q42/q52/q55 (single-star
brand reports), q12 (date-windowed revenue share), q25 (multi-channel fact
join on a shared dim), q26 (multi-average star), q51a (cumulative DISTINCT
count over an ordered window, via the scalable first-occurrence rewrite),
q60 (three-disjoint-channel union re-aggregation), q63 (monthly deviation
from a partition average, exact-decimal comparison), q81 (above 1.2× the
group average with detail join-back), and q86 (rollup + rank within the
grouping parent).

Adaptation discipline (same as parts 1-8): plan SHAPES are re-derived on
the driver's TPC-H-ish schema — no reference query text; money math is
exact DECIMAL until a single terminal DOUBLE cast; counts CAST to BIGINT
in the oracle so DuckDB's HUGEINT widening can't reach the driver's hash
(round-4 lesson); every LIMIT is preceded by a total order.

Scale notes (100 TB): every shape here aggregates facts BEFORE windowing
or joining back, so windows/ranks run over group-cardinality rows, not
fact rows; q51a uses the first-occurrence rewrite instead of a
collect_set window (bounded state, no per-row distinct sets); unions are
re-aggregations of already-reduced slices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hopspark.catalog import read_table
from hopspark.operators._util import REVENUE_TERM, dec
from hopspark.operators.tpcds_patterns2 import _li_orders, _rev

# ---------------------------------------------------------------------------
# q12 shape — revenue share by type within brand over a 60-day ship window
# ---------------------------------------------------------------------------


def tpcds_q12_windowed_brand_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    li = read_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1996-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-30").cast("timestamp"))
    )
    per = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.sum(_rev()).alias("rev"))
    )
    w = Window.partitionBy("p_brand")
    return (
        per.select(
            "p_brand",
            "p_type",
            F.col("rev").cast("double").alias("rev"),
            F.round(
                F.col("rev").cast("double")
                / F.sum("rev").over(w).cast("double")
                * 100,
                6,
            ).alias("share_pct"),
        )
        .orderBy("p_brand", "p_type")
    )


TPCDS_Q12_SQL = f"""
WITH per AS (
  SELECT p_brand, p_type, SUM({REVENUE_TERM}) AS rev
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-03-01'
    AND l_shipdate <  TIMESTAMP '1996-04-30'
  GROUP BY 1, 2
)
SELECT p_brand, p_type, CAST(rev AS DOUBLE) AS rev,
       ROUND(CAST(rev AS DOUBLE)
             / CAST(SUM(rev) OVER (PARTITION BY p_brand) AS DOUBLE) * 100, 6)
         AS share_pct
FROM per
ORDER BY p_brand, p_type
"""


# ---------------------------------------------------------------------------
# q25 shape — two fact channels (orders revenue, event activity) joined on
# the shared customer dim, both pre-aggregated before the join
# ---------------------------------------------------------------------------


def tpcds_q25_multichannel_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, "orders", sf_dir)
    events = read_table(spark, "events", sf_dir)
    cust = read_table(spark, "customer", sf_dir)
    ord_agg = (
        orders.filter(F.year("o_orderdate") >= 1996)
        .groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice", 14, 2)).alias("spend"),
        )
    )
    ev_agg = events.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value", 14, 4)).alias("ev_value"),
    )
    return (
        cust.join(ord_agg, cust.c_custkey == ord_agg.o_custkey)
        .join(ev_agg, cust.c_custkey == ev_agg.user_id)
        .select(
            "c_custkey",
            "n_orders",
            F.col("spend").cast("double").alias("spend"),
            "n_events",
            F.col("ev_value").cast("double").alias("ev_value"),
        )
        .orderBy("c_custkey")
    )


TPCDS_Q25_SQL = """
WITH o AS (
  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS spend
  FROM orders WHERE year(o_orderdate) >= 1996 GROUP BY 1
), e AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
         SUM(CAST(value AS DECIMAL(14,4))) AS ev_value
  FROM events GROUP BY 1
)
SELECT c_custkey, n_orders, CAST(spend AS DOUBLE) AS spend,
       n_events, CAST(ev_value AS DOUBLE) AS ev_value
FROM customer
JOIN o ON o.o_custkey = c_custkey
JOIN e ON e.user_id = c_custkey
ORDER BY c_custkey
"""


# ---------------------------------------------------------------------------
# q26 shape — multi-average star: three exact averages per brand under a
# priority filter (averages = exact decimal SUM / COUNT, one IEEE division)
# ---------------------------------------------------------------------------


def tpcds_q26_brand_averages(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    base = (
        _li_orders(spark, sf_dir)
        .filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .join(part, F.col("l_partkey") == part.p_partkey)
    )
    g = base.groupBy("p_brand").agg(
        F.sum(dec("l_quantity", 12, 2)).alias("sq"),
        F.sum(dec("l_extendedprice", 14, 2)).alias("se"),
        F.sum(dec("l_discount", 8, 4)).alias("sd"),
        F.count(F.lit(1)).alias("n"),
    )
    return (
        g.select(
            "p_brand",
            (F.col("sq").cast("double") / F.col("n")).alias("avg_qty"),
            (F.col("se").cast("double") / F.col("n")).alias("avg_price"),
            (F.col("sd").cast("double") / F.col("n")).alias("avg_disc"),
        )
        .orderBy("p_brand")
        .limit(100)
    )


TPCDS_Q26_SQL = """
SELECT p_brand,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
         AS avg_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) / COUNT(*)
         AS avg_price,
       CAST(SUM(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) / COUNT(*)
         AS avg_disc
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
GROUP BY p_brand
ORDER BY p_brand
LIMIT 100
"""


# ---------------------------------------------------------------------------
# q42 shape — year x brand revenue report (single star, top-N by measure)
# ---------------------------------------------------------------------------


def tpcds_q42_year_brand_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    return (
        _li_orders(spark, sf_dir)
        .join(part, F.col("l_partkey") == part.p_partkey)
        .withColumn("yr", F.year("o_orderdate"))
        .groupBy("yr", "p_brand")
        .agg(F.sum(_rev()).cast("double").alias("rev"))
        .orderBy(F.desc("rev"), "yr", "p_brand")
        .limit(10)
    )


TPCDS_Q42_SQL = f"""
SELECT year(o_orderdate) AS yr, p_brand,
       CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS rev
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
GROUP BY 1, 2
ORDER BY rev DESC, yr, p_brand
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q51a shape — cumulative DISTINCT customer count by month. COUNT(DISTINCT)
# over an ordered window is unsupported (Spark) / state-heavy (everywhere);
# the scalable rewrite: each customer contributes at its FIRST month, then
# a running SUM over the tiny month dimension.
# ---------------------------------------------------------------------------


def tpcds_q51a_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, "orders", sf_dir)
    first = (
        orders.withColumn("mo", F.date_format("o_orderdate", "yyyy-MM"))
        .groupBy("o_custkey")
        .agg(F.min("mo").alias("first_mo"))
    )
    per_mo = first.groupBy("first_mo").agg(
        F.count(F.lit(1)).alias("new_customers")
    )
    w = Window.orderBy("first_mo").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per_mo.select(
            F.col("first_mo").alias("mo"),
            "new_customers",
            F.sum("new_customers").over(w).alias("cum_distinct_customers"),
        )
        .orderBy("mo")
    )


TPCDS_Q51A_SQL = """
WITH first AS (
  SELECT o_custkey, MIN(strftime(o_orderdate, '%Y-%m')) AS first_mo
  FROM orders GROUP BY 1
), per_mo AS (
  SELECT first_mo, CAST(COUNT(*) AS BIGINT) AS new_customers
  FROM first GROUP BY 1
)
SELECT first_mo AS mo, new_customers,
       CAST(SUM(new_customers) OVER (ORDER BY first_mo
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         AS cum_distinct_customers
FROM per_mo
ORDER BY mo
"""


# ---------------------------------------------------------------------------
# q52 shape — brand gross-revenue report for a single month (star, simple
# measure — differentiates from q42's discounted revenue + year grain)
# ---------------------------------------------------------------------------


def tpcds_q52_month_brand_gross(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    base = _li_orders(spark, sf_dir).filter(
        (F.year("o_orderdate") == 1997) & (F.month("o_orderdate") == 11)
    )
    return (
        base.join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(dec("l_extendedprice", 14, 2)).cast("double").alias("gross"))
        .orderBy(F.desc("gross"), "p_brand")
        .limit(10)
    )


TPCDS_Q52_SQL = """
SELECT p_brand,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS DOUBLE) AS gross
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
WHERE year(o_orderdate) = 1997 AND month(o_orderdate) = 11
GROUP BY p_brand
ORDER BY gross DESC, p_brand
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q55 shape — brand revenue scoped to one supplier nation (the "manager"
# scope of the reference shape becomes a supplier-dim filter)
# ---------------------------------------------------------------------------


def tpcds_q55_nation_brand_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    supp = read_table(spark, "supplier", sf_dir).filter(
        F.col("s_nationkey") == 5
    )
    li = read_table(spark, "lineitem", sf_dir)
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.sum(_rev()).cast("double").alias("rev"))
        .orderBy(F.desc("rev"), "p_brand")
        .limit(10)
    )


TPCDS_Q55_SQL = f"""
SELECT p_brand, CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS rev
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN part ON l_partkey = p_partkey
WHERE s_nationkey = 5
GROUP BY p_brand
ORDER BY rev DESC, p_brand
LIMIT 10
"""


# ---------------------------------------------------------------------------
# q60 shape — the SAME per-type aggregate under three DISJOINT supplier-
# region channels, UNION ALL'd then re-aggregated (q56's sibling with a
# geographic, rather than priority, channel split)
# ---------------------------------------------------------------------------


def tpcds_q60_region_channel_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    supp = read_table(spark, "supplier", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    li = read_table(spark, "lineitem", sf_dir)
    base = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(part, li.l_partkey == part.p_partkey)
    )
    # One-scan rewrite (the r4 q74/q59/q90 discipline, SCALE.md): the three
    # channels are disjoint region slices union-all'd then re-summed per
    # type, so a single scan grouped by (channel, p_type) followed by the
    # tiny re-aggregation is value-identical — at 100 TB this reads the
    # fact once instead of three times. The oracle keeps the reference's
    # literal 3-subquery UNION ALL form.
    channel = (
        F.when(F.col("n_regionkey") == 0, 0)
        .when(F.col("n_regionkey").isin(1, 2), 1)
        .otherwise(2)
    )
    per_channel = (
        base.groupBy(channel.alias("ch"), F.col("p_type"))
        .agg(F.sum(_rev()).alias("rev"))
    )
    return (
        per_channel.groupBy("p_type")
        .agg(F.sum("rev").cast("double").alias("total_rev"))
        .orderBy(F.desc("total_rev"), "p_type")
        .limit(25)
    )


TPCDS_Q60_SQL = f"""
WITH u AS (
  SELECT p_type, SUM({REVENUE_TERM}) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN part ON l_partkey = p_partkey
  WHERE n_regionkey IN (0) GROUP BY 1
  UNION ALL
  SELECT p_type, SUM({REVENUE_TERM}) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN part ON l_partkey = p_partkey
  WHERE n_regionkey IN (1, 2) GROUP BY 1
  UNION ALL
  SELECT p_type, SUM({REVENUE_TERM}) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN part ON l_partkey = p_partkey
  WHERE n_regionkey IN (3, 4) GROUP BY 1
)
SELECT p_type, CAST(SUM(rev) AS DOUBLE) AS total_rev
FROM u GROUP BY p_type
ORDER BY total_rev DESC, p_type
LIMIT 25
"""


# ---------------------------------------------------------------------------
# q63 shape — months deviating >10% from the supplier's average month.
# The comparison stays in EXACT decimal space (|rev*cnt - total|*10 >
# total*cnt) — no double rounding can flip the filter between engines.
# ---------------------------------------------------------------------------


def tpcds_q63_monthly_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    per = (
        li.withColumn("mo", F.date_format("l_shipdate", "yyyy-MM"))
        .groupBy("l_suppkey", "mo")
        .agg(F.sum(_rev()).alias("rev"))
    )
    w = Window.partitionBy("l_suppkey")
    per = per.withColumn("total", F.sum("rev").over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(w)
    )
    dev = (F.col("rev") * F.col("cnt") - F.col("total")).cast(
        "decimal(28,4)"
    )
    return (
        per.filter(
            F.abs(dev) * 10 > (F.col("total") * F.col("cnt")).cast("decimal(28,4)")
        )
        .select(
            "l_suppkey",
            "mo",
            F.col("rev").cast("double").alias("rev"),
            (F.col("total").cast("double") / F.col("cnt")).alias("avg_month"),
        )
        .orderBy("l_suppkey", "mo")
        .limit(200)
    )


TPCDS_Q63_SQL = f"""
WITH per AS (
  SELECT l_suppkey, strftime(l_shipdate, '%Y-%m') AS mo,
         SUM({REVENUE_TERM}) AS rev
  FROM lineitem GROUP BY 1, 2
), win AS (
  SELECT l_suppkey, mo, rev,
         SUM(rev) OVER (PARTITION BY l_suppkey) AS total,
         CAST(COUNT(*) OVER (PARTITION BY l_suppkey) AS BIGINT) AS cnt
  FROM per
)
SELECT l_suppkey, mo, CAST(rev AS DOUBLE) AS rev,
       CAST(total AS DOUBLE) / cnt AS avg_month
FROM win
WHERE ABS(CAST(rev * cnt - total AS DECIMAL(28,4))) * 10
      > CAST(total * cnt AS DECIMAL(28,4))
ORDER BY l_suppkey, mo
LIMIT 200
"""


# ---------------------------------------------------------------------------
# q81 shape — customers whose finished-order spend exceeds 1.2× their
# nation's average, with dim detail joined back. 1.2× as exact integers:
# spend*5*cnt > total*6.
# ---------------------------------------------------------------------------


def tpcds_q81_above_nation_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, "orders", sf_dir)
    cust = read_table(spark, "customer", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    per = (
        orders.filter(F.col("o_orderstatus") == "F")
        .groupBy("o_custkey")
        .agg(F.sum(dec("o_totalprice", 14, 2)).alias("spend"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
    )
    w = Window.partitionBy("c_nationkey")
    per = per.withColumn("total", F.sum("spend").over(w)).withColumn(
        "cnt", F.count(F.lit(1)).over(w)
    )
    return (
        per.filter(
            (F.col("spend") * 5 * F.col("cnt")).cast("decimal(38,2)")
            > (F.col("total") * 6).cast("decimal(38,2)")
        )
        .join(nation, per.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.col("spend").cast("double").alias("spend"),
            (F.col("total").cast("double") / F.col("cnt")).alias("nation_avg"),
        )
        .orderBy("c_custkey")
        .limit(100)
    )


TPCDS_Q81_SQL = """
WITH per AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS spend
  FROM orders WHERE o_orderstatus = 'F' GROUP BY 1
), j AS (
  SELECT c_custkey, c_name, c_nationkey, spend,
         SUM(spend) OVER (PARTITION BY c_nationkey) AS total,
         CAST(COUNT(*) OVER (PARTITION BY c_nationkey) AS BIGINT) AS cnt
  FROM per JOIN customer ON o_custkey = c_custkey
)
SELECT c_custkey, c_name, n_name, CAST(spend AS DOUBLE) AS spend,
       CAST(total AS DOUBLE) / cnt AS nation_avg
FROM j JOIN nation ON c_nationkey = n_nationkey
WHERE CAST(spend * 5 * cnt AS DECIMAL(38,2)) > CAST(total * 6 AS DECIMAL(38,2))
ORDER BY c_custkey
LIMIT 100
"""


# ---------------------------------------------------------------------------
# q86 shape — ROLLUP over (region, nation) with RANK inside each grouping
# parent: the lochierarchy + partitioned-rank composition. grouping_id is
# computed in the rollup subquery, the window runs over the tiny rollup
# result.
# ---------------------------------------------------------------------------


def tpcds_q86_rollup_rank_within_parent(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    supp = read_table(spark, "supplier", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    region = read_table(spark, "region", sf_dir)
    base = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
    )
    # Grouping-sets pre-aggregation (SCALE.md, r4 discipline): SUM
    # re-aggregates losslessly, so reduce the fact join to the finest
    # (region, nation) grain FIRST and roll up the ≤25-row partial —
    # Expand multiplies its input by the number of grouping sets, and at
    # 100 TB that input must be the group count, not the fact row count.
    fine = base.groupBy("r_name", "n_name").agg(F.sum(_rev()).alias("rev0"))
    rolled = fine.rollup("r_name", "n_name").agg(
        F.sum("rev0").alias("rev"),
        (F.grouping("r_name") + F.grouping("n_name")).alias("lochier"),
        F.grouping("n_name").alias("g_nation"),
    )
    w = Window.partitionBy(
        "lochier",
        F.when(F.col("g_nation") == 0, F.col("r_name")),
    ).orderBy(F.desc("rev"))
    return (
        rolled.select(
            "r_name",
            "n_name",
            "lochier",
            F.col("rev").cast("double").alias("rev"),
            F.rank().over(w).alias("rank_in_parent"),
        )
        .orderBy(F.desc("lochier"), "r_name", "rank_in_parent", "n_name")
    )


TPCDS_Q86_SQL = f"""
WITH rolled AS (
  SELECT r_name, n_name,
         GROUPING(r_name) + GROUPING(n_name) AS lochier,
         GROUPING(n_name) AS g_nation,
         SUM({REVENUE_TERM}) AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY ROLLUP(r_name, n_name)
)
SELECT r_name, n_name, CAST(lochier AS INT) AS lochier,
       CAST(rev AS DOUBLE) AS rev,
       RANK() OVER (
         PARTITION BY lochier,
                      CASE WHEN g_nation = 0 THEN r_name END
         ORDER BY rev DESC) AS rank_in_parent
FROM rolled
ORDER BY lochier DESC, r_name, rank_in_parent, n_name
"""


QUERIES: dict[str, tuple] = {
    "tpcds_q12_windowed_brand_share": (
        tpcds_q12_windowed_brand_share, TPCDS_Q12_SQL),
    "tpcds_q25_multichannel_customer": (
        tpcds_q25_multichannel_customer, TPCDS_Q25_SQL),
    "tpcds_q26_brand_averages": (
        tpcds_q26_brand_averages, TPCDS_Q26_SQL),
    "tpcds_q42_year_brand_report": (
        tpcds_q42_year_brand_report, TPCDS_Q42_SQL),
    "tpcds_q51a_cumulative_distinct": (
        tpcds_q51a_cumulative_distinct, TPCDS_Q51A_SQL),
    "tpcds_q52_month_brand_gross": (
        tpcds_q52_month_brand_gross, TPCDS_Q52_SQL),
    "tpcds_q55_nation_brand_report": (
        tpcds_q55_nation_brand_report, TPCDS_Q55_SQL),
    "tpcds_q60_region_channel_union": (
        tpcds_q60_region_channel_union, TPCDS_Q60_SQL),
    "tpcds_q63_monthly_deviation": (
        tpcds_q63_monthly_deviation, TPCDS_Q63_SQL),
    "tpcds_q81_above_nation_average": (
        tpcds_q81_above_nation_average, TPCDS_Q81_SQL),
    "tpcds_q86_rollup_rank_within_parent": (
        tpcds_q86_rollup_rank_within_parent, TPCDS_Q86_SQL),
}
