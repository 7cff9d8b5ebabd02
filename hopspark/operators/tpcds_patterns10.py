"""TPC-DS-pattern workload slice, part 10 — 16 variant shapes (→ 133).

Round-5 second widening: the reference ships 'a'-variant query files whose
PLANS differ structurally from the base query (testdata/workloads/tpcds/
queries/*a.test): GROUPING SETS in place of ROLLUP (q27a), the explicit
pre-aggregate-then-rollup CTE (q36a), union-of-semi-joins replacing an
AND-chain of EXISTS (q10a), the paired strict/lenient two-snapshot
coefficient-of-variation join (q39 a/b), rollup-over-channel-union P&L
(q77a/q80a), decile bucketing over a ranked measure (q49 family), a
centered moving-average outlier filter (q57 family), the argmax join-back
(q64 family), a cross-fact activity ratio (q78 family), non-hierarchical
partial GROUPING SETS (q22a), a fact-period INTERSECT feed (q14a), a
value-based RANGE-interval trailing window (q47a), a window-over-window
rank-of-deviation (q89a), and two-level percent-of-parent shares (q98a).

Same adaptation + determinism discipline as parts 1-9: shapes re-derived
on the driver schema, exact DECIMAL accumulation with one terminal DOUBLE
conversion, BIGINT-cast counts in oracles (no HUGEINT), total orders
before every LIMIT, and window ORDER BYs carry a unique tiebreaker so
bucketing functions are deterministic.

Scale notes (100 TB): every variant aggregates facts to group grain before
any Expand/window/self-join; the q39 pair self-joins a (part, month)
aggregate, not the fact; q64a joins back on a tiny (brand, max) frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from hopspark.catalog import read_table
from hopspark.ckpt import materialize
from hopspark.operators._util import REVENUE_TERM, dec
from hopspark.operators.tpcds_patterns2 import _li_orders, _rev

# ---------------------------------------------------------------------------
# q27a shape — explicit GROUPING SETS ((a,b),(a),()) where the base q27
# uses a three-level ROLLUP: a different Expand (no (a,b,c) level)
# ---------------------------------------------------------------------------


def tpcds_q27a_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = read_table(spark, "nation", sf_dir)
    cust = read_table(spark, "customer", sf_dir)
    base = (
        _li_orders(spark, sf_dir)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
    )
    fine = base.groupBy("o_orderstatus", "n_name").agg(
        F.sum(_rev()).alias("rev0"),
        F.count(F.lit(1)).alias("n0"),
    )
    return (
        fine.groupingSets(
            [["o_orderstatus", "n_name"], ["o_orderstatus"], []],
            "o_orderstatus",
            "n_name",
        )
        .agg(
            F.sum("rev0").cast("double").alias("rev"),
            F.sum("n0").alias("n_items"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("n_name").asc_nulls_first(),
        )
    )


TPCDS_Q27A_SQL = f"""
WITH fine AS (
  SELECT o_orderstatus, n_name, SUM({REVENUE_TERM}) AS rev0,
         CAST(COUNT(*) AS BIGINT) AS n0
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
)
SELECT o_orderstatus, n_name, CAST(SUM(rev0) AS DOUBLE) AS rev,
       CAST(SUM(n0) AS BIGINT) AS n_items
FROM fine
GROUP BY GROUPING SETS ((o_orderstatus, n_name), (o_orderstatus), ())
ORDER BY o_orderstatus ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# q39 a/b shape — two adjacent monthly snapshots of per-part quantity
# mean/cov, self-joined; 'a' keeps cov>1 on both sides, 'b' tightens the
# first month. Moments computed EXACTLY (decimal sum/sumsq, one double
# sqrt) so the cov filter can't flip between engines.
# ---------------------------------------------------------------------------


def _q39_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir).filter(
        F.year("l_shipdate") == 1996
    )
    q = dec("l_quantity", 12, 2)
    return (
        li.withColumn("mo", F.month("l_shipdate"))
        .groupBy("l_partkey", "mo")
        .agg(
            F.sum(q).alias("s"),
            F.sum((q * q).cast("decimal(20,4)")).alias("s2"),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 2)
        .select(
            "l_partkey",
            "mo",
            (F.col("s").cast("double") / F.col("n")).alias("mean"),
            F.sqrt(
                (
                    F.col("s2").cast("double")
                    - F.col("s").cast("double")
                    * F.col("s").cast("double")
                    / F.col("n")
                )
                / (F.col("n") - 1)
            ).alias("sd"),
        )
        .withColumn("cov", F.col("sd") / F.col("mean"))
    )


_Q39_MOMENTS_SQL = """
  SELECT l_partkey, mo,
         CAST(s AS DOUBLE) / n AS mean,
         sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
              / (n - 1)) AS sd,
         sqrt((CAST(s2 AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)
              / (n - 1)) / (CAST(s AS DOUBLE) / n) AS cov
  FROM (
    SELECT l_partkey, month(l_shipdate) AS mo,
           SUM(CAST(l_quantity AS DECIMAL(12,2))) AS s,
           SUM(CAST(CAST(l_quantity AS DECIMAL(12,2))
               * CAST(l_quantity AS DECIMAL(12,2)) AS DECIMAL(20,4))) AS s2,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM lineitem WHERE year(l_shipdate) = 1996
    GROUP BY 1, 2
  ) WHERE n >= 2
"""


def _q39(spark: SparkSession, sf_dir: str, strict: bool) -> DataFrame:
    m = _q39_moments(spark, sf_dir)
    lo = 1.5 if strict else 1.0
    a = m.filter(F.col("cov") > lo).alias("a")
    b = m.filter(F.col("cov") > 1.0).alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_partkey") == F.col("b.l_partkey"))
            & (F.col("b.mo") == F.col("a.mo") + 1),
        )
        .select(
            F.col("a.l_partkey").alias("l_partkey"),
            F.col("a.mo").alias("mo1"),
            F.round("a.cov", 6).alias("cov1"),
            F.col("b.mo").alias("mo2"),
            F.round("b.cov", 6).alias("cov2"),
        )
        .orderBy("l_partkey", "mo1")
        .limit(100)
    )


def tpcds_q39a_cov_adjacent_months(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return _q39(spark, sf_dir, strict=False)


def tpcds_q39b_cov_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q39(spark, sf_dir, strict=True)


def _q39_sql(lo: str) -> str:
    return f"""
WITH m AS ({_Q39_MOMENTS_SQL})
SELECT a.l_partkey, a.mo AS mo1, ROUND(a.cov, 6) AS cov1,
       b.mo AS mo2, ROUND(b.cov, 6) AS cov2
FROM m a JOIN m b ON a.l_partkey = b.l_partkey AND b.mo = a.mo + 1
WHERE a.cov > {lo} AND b.cov > 1.0
ORDER BY a.l_partkey, mo1
LIMIT 100
"""


TPCDS_Q39A_SQL = _q39_sql("1.0")
TPCDS_Q39B_SQL = _q39_sql("1.5")


# ---------------------------------------------------------------------------
# q77a shape — profit & loss per channel with a ROLLUP grand-total row:
# sales minus returns per orderstatus channel, rolled up
# ---------------------------------------------------------------------------


def tpcds_q77a_pl_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _li_orders(spark, sf_dir)
    per = base.groupBy("o_orderstatus").agg(
        F.sum(F.when(F.col("l_returnflag") != "R", _rev())).alias("sales"),
        F.sum(F.when(F.col("l_returnflag") == "R", _rev())).alias("returns"),
    )
    return (
        per.rollup("o_orderstatus")
        .agg(
            F.sum("sales").cast("double").alias("sales"),
            F.sum("returns").cast("double").alias("returns"),
            (F.sum("sales") - F.sum("returns")).cast("double").alias("profit"),
        )
        .orderBy(F.col("o_orderstatus").asc_nulls_first())
    )


TPCDS_Q77A_SQL = f"""
WITH per AS (
  SELECT o_orderstatus,
         SUM(CASE WHEN l_returnflag <> 'R' THEN {REVENUE_TERM} END) AS sales,
         SUM(CASE WHEN l_returnflag = 'R' THEN {REVENUE_TERM} END) AS returns
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1
)
SELECT o_orderstatus, CAST(SUM(sales) AS DOUBLE) AS sales,
       CAST(SUM(returns) AS DOUBLE) AS returns,
       CAST(SUM(sales) - SUM(returns) AS DOUBLE) AS profit
FROM per
GROUP BY ROLLUP(o_orderstatus)
ORDER BY o_orderstatus ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# q80a shape — netted revenue by (channel, brand) ROLLUP over a channel
# union, pre-aggregated before the Expand
# ---------------------------------------------------------------------------


def tpcds_q80a_brand_channel_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    base = _li_orders(spark, sf_dir).join(
        part, F.col("l_partkey") == part.p_partkey
    )
    channel = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), "urgent")
        .when(F.col("o_orderpriority") == "3-MEDIUM", "medium")
        .otherwise("low")
    )
    net = _rev() - F.when(F.col("l_returnflag") == "R", _rev()).otherwise(
        F.lit(0).cast("decimal(18,4)")
    )
    fine = base.groupBy(channel.alias("channel"), F.col("p_brand")).agg(
        F.sum(net).alias("net0")
    )
    return (
        fine.rollup("channel", "p_brand")
        .agg(F.sum("net0").cast("double").alias("net_rev"))
        .orderBy(
            F.col("channel").asc_nulls_first(),
            F.col("p_brand").asc_nulls_first(),
        )
    )


TPCDS_Q80A_SQL = f"""
WITH fine AS (
  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 'urgent'
              WHEN o_orderpriority = '3-MEDIUM' THEN 'medium'
              ELSE 'low' END AS channel,
         p_brand,
         SUM({REVENUE_TERM}
             - CASE WHEN l_returnflag = 'R' THEN {REVENUE_TERM}
                    ELSE CAST(0 AS DECIMAL(18,4)) END) AS net0
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
)
SELECT channel, p_brand, CAST(SUM(net0) AS DOUBLE) AS net_rev
FROM fine
GROUP BY ROLLUP(channel, p_brand)
ORDER BY channel ASC NULLS FIRST, p_brand ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# q36a shape — the reference's explicit pre-aggregate CTE feeding a rollup
# (q36a rewrites q36 exactly this way); margin = net/gross per geography
# ---------------------------------------------------------------------------


def tpcds_q36a_preagg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp = read_table(spark, "supplier", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    region = read_table(spark, "region", sf_dir)
    li = read_table(spark, "lineitem", sf_dir)
    base = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
    )
    fine = base.groupBy("r_name", "n_name").agg(
        F.sum(_rev()).alias("net0"),
        F.sum(dec("l_extendedprice", 14, 2)).alias("gross0"),
    )
    rolled = fine.rollup("r_name", "n_name").agg(
        F.sum("net0").alias("net"), F.sum("gross0").alias("gross")
    )
    return (
        rolled.select(
            "r_name",
            "n_name",
            (F.col("net").cast("double") / F.col("gross").cast("double"))
            .alias("margin"),
        )
        .orderBy(
            F.col("r_name").asc_nulls_first(),
            F.col("n_name").asc_nulls_first(),
        )
    )


TPCDS_Q36A_SQL = f"""
WITH fine AS (
  SELECT r_name, n_name, SUM({REVENUE_TERM}) AS net0,
         SUM(CAST(l_extendedprice AS DECIMAL(14,2))) AS gross0
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
)
SELECT r_name, n_name,
       CAST(SUM(net0) AS DOUBLE) / CAST(SUM(gross0) AS DOUBLE) AS margin
FROM fine
GROUP BY ROLLUP(r_name, n_name)
ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# q10a shape — union-of-semi-joins replacing q10's AND-chain of EXISTS:
# customers active in EITHER channel, then a demographic count
# ---------------------------------------------------------------------------


def tpcds_q10a_union_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    events = read_table(spark, "events", sf_dir)
    ch1 = orders.filter(F.year("o_orderdate") >= 1998).select(
        F.col("o_custkey").alias("k")
    )
    ch2 = events.select(F.col("user_id").alias("k"))
    active = ch1.union(ch2).distinct()
    return (
        cust.join(active, cust.c_custkey == active.k)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("c_mktsegment")
    )


TPCDS_Q10A_SQL = """
SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers
FROM customer
WHERE c_custkey IN (
  SELECT o_custkey FROM orders WHERE year(o_orderdate) >= 1998
  UNION
  SELECT user_id FROM events
)
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


# ---------------------------------------------------------------------------
# q49 family shape — decile bucketing over a ranked measure: ntile(10) on
# per-part return rate, then counts per decile (unique tiebreaker keeps
# ntile deterministic across engines)
# ---------------------------------------------------------------------------


def tpcds_q49a_decile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    per = (
        li.groupBy("l_partkey")
        .agg(
            F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias(
                "n_ret"
            ),
            F.count(F.lit(1)).alias("n"),
        )
        .filter(F.col("n") >= 3)
        .withColumn(
            "ret_rate",
            F.col("n_ret").cast("double") / F.col("n").cast("double"),
        )
    )
    w = Window.orderBy(F.desc("ret_rate"), F.col("l_partkey"))
    return (
        per.withColumn("decile", F.ntile(10).over(w))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.round(F.avg("ret_rate"), 6).alias("avg_ret_rate"),
        )
        .orderBy("decile")
    )


TPCDS_Q49A_SQL = """
WITH per AS (
  SELECT l_partkey,
         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ret,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM lineitem GROUP BY 1 HAVING COUNT(*) >= 3
), rated AS (
  SELECT l_partkey, CAST(n_ret AS DOUBLE) / CAST(n AS DOUBLE) AS ret_rate
  FROM per
), bucketed AS (
  SELECT NTILE(10) OVER (ORDER BY ret_rate DESC, l_partkey) AS decile,
         ret_rate
  FROM rated
)
SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(AVG(ret_rate), 6) AS avg_ret_rate
FROM bucketed
GROUP BY decile
ORDER BY decile
"""


# ---------------------------------------------------------------------------
# q57 family shape — centered moving-average outlier filter: monthly
# revenue vs avg(prev, cur, next), keep months deviating > 20%
# ---------------------------------------------------------------------------


def tpcds_q57a_centered_outliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    per = (
        li.withColumn("mo", F.date_format("l_shipdate", "yyyy-MM"))
        .groupBy("mo")
        .agg(F.sum(_rev()).alias("rev"))
    )
    w = Window.orderBy("mo").rowsBetween(-1, 1)
    wn = Window.orderBy("mo")
    per = (
        per.withColumn("ctr", F.avg(F.col("rev").cast("double")).over(w))
        .withColumn("n_nbr", F.count(F.lit(1)).over(w))
        .filter(F.col("n_nbr") == 3)
    )
    return (
        per.filter(
            F.abs(F.col("rev").cast("double") - F.col("ctr"))
            > 0.2 * F.col("ctr")
        )
        .select(
            "mo",
            F.col("rev").cast("double").alias("rev"),
            F.round("ctr", 4).alias("centered_avg"),
        )
        .orderBy("mo")
    )


TPCDS_Q57A_SQL = f"""
WITH per AS (
  SELECT strftime(l_shipdate, '%Y-%m') AS mo, SUM({REVENUE_TERM}) AS rev
  FROM lineitem GROUP BY 1
), win AS (
  SELECT mo, rev,
         AVG(CAST(rev AS DOUBLE)) OVER (ORDER BY mo
             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS ctr,
         CAST(COUNT(*) OVER (ORDER BY mo
             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT) AS n_nbr
  FROM per
)
SELECT mo, CAST(rev AS DOUBLE) AS rev, ROUND(ctr, 4) AS centered_avg
FROM win
WHERE n_nbr = 3 AND ABS(CAST(rev AS DOUBLE) - ctr) > 0.2 * ctr
ORDER BY mo
"""


# ---------------------------------------------------------------------------
# q64 family shape — argmax join-back: for each brand, the month with the
# maximum revenue (aggregate -> tiny max frame -> equi-join back)
# ---------------------------------------------------------------------------


def tpcds_q64a_argmax_joinback(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    per = (
        _li_orders(spark, sf_dir)
        .join(part, F.col("l_partkey") == part.p_partkey)
        .withColumn("mo", F.date_format("o_orderdate", "yyyy-MM"))
        .groupBy("p_brand", "mo")
        .agg(F.sum(_rev()).alias("rev"))
    )
    mx = per.groupBy("p_brand").agg(F.max("rev").alias("mx"))
    return (
        per.join(mx, "p_brand")
        .filter(F.col("rev") == F.col("mx"))
        .select(
            "p_brand",
            F.col("mo").alias("best_month"),
            F.col("rev").cast("double").alias("rev"),
        )
        .orderBy("p_brand", "best_month")
    )


TPCDS_Q64A_SQL = f"""
WITH per AS (
  SELECT p_brand, strftime(o_orderdate, '%Y-%m') AS mo,
         SUM({REVENUE_TERM}) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2
)
SELECT per.p_brand, per.mo AS best_month, CAST(per.rev AS DOUBLE) AS rev
FROM per
JOIN (SELECT p_brand, MAX(rev) AS mx FROM per GROUP BY 1) m
  ON per.p_brand = m.p_brand AND per.rev = m.mx
ORDER BY per.p_brand, best_month
"""


# ---------------------------------------------------------------------------
# q78 family shape — cross-fact activity ratio per customer: order spend
# vs event value, both pre-aggregated, one terminal division
# ---------------------------------------------------------------------------


def tpcds_q78a_cross_fact_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, "orders", sf_dir)
    events = read_table(spark, "events", sf_dir)
    o = orders.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice", 14, 2)).alias("spend")
    )
    e = events.groupBy("user_id").agg(
        F.sum(dec("value", 14, 4)).alias("ev")
    )
    return (
        o.join(e, o.o_custkey == e.user_id)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("spend").cast("double").alias("spend"),
            F.col("ev").cast("double").alias("event_value"),
            F.round(
                F.col("spend").cast("double") / F.col("ev").cast("double"), 6
            ).alias("spend_per_event_value"),
        )
        .orderBy("custkey")
    )


TPCDS_Q78A_SQL = """
WITH o AS (
  SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS spend
  FROM orders GROUP BY 1
), e AS (
  SELECT user_id, SUM(CAST(value AS DECIMAL(14,4))) AS ev
  FROM events GROUP BY 1
)
SELECT o_custkey AS custkey, CAST(spend AS DOUBLE) AS spend,
       CAST(ev AS DOUBLE) AS event_value,
       ROUND(CAST(spend AS DOUBLE) / CAST(ev AS DOUBLE), 6)
         AS spend_per_event_value
FROM o JOIN e ON o_custkey = user_id
ORDER BY custkey
"""


QUERIES: dict[str, tuple] = {
    "tpcds_q27a_grouping_sets": (
        tpcds_q27a_grouping_sets, TPCDS_Q27A_SQL),
    "tpcds_q39a_cov_adjacent_months": (
        tpcds_q39a_cov_adjacent_months, TPCDS_Q39A_SQL),
    "tpcds_q39b_cov_strict": (
        tpcds_q39b_cov_strict, TPCDS_Q39B_SQL),
    "tpcds_q77a_pl_rollup": (
        tpcds_q77a_pl_rollup, TPCDS_Q77A_SQL),
    "tpcds_q80a_brand_channel_rollup": (
        tpcds_q80a_brand_channel_rollup, TPCDS_Q80A_SQL),
    "tpcds_q36a_preagg_rollup": (
        tpcds_q36a_preagg_rollup, TPCDS_Q36A_SQL),
    "tpcds_q10a_union_exists": (
        tpcds_q10a_union_exists, TPCDS_Q10A_SQL),
    "tpcds_q49a_decile_buckets": (
        tpcds_q49a_decile_buckets, TPCDS_Q49A_SQL),
    "tpcds_q57a_centered_outliers": (
        tpcds_q57a_centered_outliers, TPCDS_Q57A_SQL),
    "tpcds_q64a_argmax_joinback": (
        tpcds_q64a_argmax_joinback, TPCDS_Q64A_SQL),
    "tpcds_q78a_cross_fact_ratio": (
        tpcds_q78a_cross_fact_ratio, TPCDS_Q78A_SQL),
}


# ---------------------------------------------------------------------------
# q22a shape — NON-hierarchical GROUPING SETS over the q22 hierarchy:
# ((p_type, size), (p_brand), (size), ()) — partial sets a ROLLUP cannot
# express; avg derived from re-aggregable sum/count partials
# ---------------------------------------------------------------------------


def tpcds_q22a_partial_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    part = read_table(spark, "part", sf_dir)
    size_bucket = (
        F.col("p_size") - 1 - (F.col("p_size") - 1) % 10 + 1
    ).cast("int")
    fine = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy(
            F.col("p_type"),
            F.col("p_brand"),
            size_bucket.alias("size_lo"),
        )
        .agg(
            F.sum(dec("l_quantity", 12, 2)).alias("s0"),
            F.count(F.lit(1)).alias("n0"),
        )
    )
    return (
        fine.groupingSets(
            [["p_type", "size_lo"], ["p_brand"], ["size_lo"], []],
            "p_type",
            "p_brand",
            "size_lo",
        )
        .agg(
            (F.sum("s0").cast("double") / F.sum("n0")).alias("avg_qty"),
            F.sum("n0").alias("cnt"),
        )
        .orderBy(
            F.col("p_type").asc_nulls_first(),
            F.col("p_brand").asc_nulls_first(),
            F.col("size_lo").asc_nulls_first(),
        )
    )


TPCDS_Q22A_SQL = """
WITH fine AS (
  SELECT p_type, p_brand,
         CAST((p_size - 1 - (p_size - 1) % 10 + 1) AS INT) AS size_lo,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS s0,
         CAST(COUNT(*) AS BIGINT) AS n0
  FROM lineitem JOIN part ON l_partkey = p_partkey
  GROUP BY 1, 2, 3
)
SELECT p_type, p_brand, size_lo,
       CAST(SUM(s0) AS DOUBLE) / SUM(n0) AS avg_qty,
       CAST(SUM(n0) AS BIGINT) AS cnt
FROM fine
GROUP BY GROUPING SETS ((p_type, size_lo), (p_brand), (size_lo), ())
ORDER BY p_type ASC NULLS FIRST, p_brand ASC NULLS FIRST,
         size_lo ASC NULLS FIRST
"""


# ---------------------------------------------------------------------------
# q14a shape — fact-period INTERSECT: parts sold in BOTH halves of 1996,
# the intersection feeding a revenue aggregate (q14b intersects dims; this
# intersects fact-derived key sets)
# ---------------------------------------------------------------------------


def tpcds_q14a_period_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    h1 = li.filter(
        (F.year("l_shipdate") == 1996) & (F.month("l_shipdate") <= 6)
    ).select("l_partkey")
    h2 = li.filter(
        (F.year("l_shipdate") == 1996) & (F.month("l_shipdate") > 6)
    ).select("l_partkey")
    both = h1.intersect(h2)
    return (
        li.filter(F.year("l_shipdate") == 1996)
        .join(both, "l_partkey")
        .agg(
            F.countDistinct("l_partkey").alias("n_parts"),
            F.sum(_rev()).cast("double").alias("rev"),
        )
    )


TPCDS_Q14A_SQL = f"""
WITH both_halves AS (
  SELECT l_partkey FROM lineitem
  WHERE year(l_shipdate) = 1996 AND month(l_shipdate) <= 6
  INTERSECT
  SELECT l_partkey FROM lineitem
  WHERE year(l_shipdate) = 1996 AND month(l_shipdate) > 6
)
SELECT CAST(COUNT(DISTINCT l.l_partkey) AS BIGINT) AS n_parts,
       CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS rev
FROM lineitem l JOIN both_halves b ON l.l_partkey = b.l_partkey
WHERE year(l.l_shipdate) = 1996
"""


QUERIES["tpcds_q22a_partial_sets"] = (
    tpcds_q22a_partial_sets, TPCDS_Q22A_SQL)
QUERIES["tpcds_q14a_period_intersect"] = (
    tpcds_q14a_period_intersect, TPCDS_Q14A_SQL)


# ---------------------------------------------------------------------------
# q47a shape — trailing-30-day revenue via a RANGE frame over event-time
# (value-based frame, not row-count): per day, sum of revenue in the
# preceding 30 days. The window runs over the per-day aggregate.
# ---------------------------------------------------------------------------


def tpcds_q47a_trailing_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir).filter(
        F.year("l_shipdate") == 1997
    )
    per_day = (
        li.groupBy(F.col("l_shipdate").cast("date").alias("d"))
        .agg(F.sum(_rev()).alias("rev"))
        .withColumn("rev_d", F.col("rev").cast("double"))
    )
    day_sec = 86400
    w = (
        Window.orderBy(F.unix_timestamp(F.col("d").cast("timestamp")))
        .rangeBetween(-30 * day_sec, 0)
    )
    # day rendered as a STRING: a DATE output column fetches as
    # datetime.date from Spark but pandas-Timestamp from DuckDB — the same
    # rendering ambiguity the HUGEINT guard exists for, avoided at source.
    return (
        per_day.select(
            F.date_format("d", "yyyy-MM-dd").alias("d"),
            F.col("rev_d").alias("rev"),
            F.round(F.sum("rev_d").over(w), 4).alias("trailing_30d"),
        )
        .orderBy("d")
        .limit(120)
    )


TPCDS_Q47A_SQL = f"""
WITH per_day AS (
  SELECT CAST(l_shipdate AS DATE) AS d,
         CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS rev
  FROM lineitem WHERE year(l_shipdate) = 1997 GROUP BY 1
)
SELECT strftime(d, '%Y-%m-%d') AS d, rev,
       ROUND(SUM(rev) OVER (ORDER BY d
             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW), 4)
         AS trailing_30d
FROM per_day
ORDER BY d
LIMIT 120
"""


# ---------------------------------------------------------------------------
# q89a shape — window over a window: monthly revenue deviation from the
# supplier average (window 1), then RANK the deviations within the
# supplier (window 2) and keep each supplier's 2 most deviant months
# ---------------------------------------------------------------------------


def tpcds_q89a_rank_of_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir).filter(
        F.col("l_suppkey") <= 20
    )
    per = (
        li.withColumn("mo", F.date_format("l_shipdate", "yyyy-MM"))
        .groupBy("l_suppkey", "mo")
        .agg(F.sum(_rev()).alias("rev"))
    )
    w1 = Window.partitionBy("l_suppkey")
    per = per.withColumn(
        "dev",
        F.abs(
            F.col("rev").cast("double")
            - F.sum(F.col("rev").cast("double")).over(w1)
            / F.count(F.lit(1)).over(w1)
        ),
    )
    w2 = Window.partitionBy("l_suppkey").orderBy(F.desc("dev"), F.col("mo"))
    return (
        per.withColumn("rk", F.row_number().over(w2))
        .filter(F.col("rk") <= 2)
        .select(
            "l_suppkey",
            "mo",
            F.col("rev").cast("double").alias("rev"),
            F.round("dev", 4).alias("dev"),
            "rk",
        )
        .orderBy("l_suppkey", "rk")
    )


TPCDS_Q89A_SQL = f"""
WITH per AS (
  SELECT l_suppkey, strftime(l_shipdate, '%Y-%m') AS mo,
         SUM({REVENUE_TERM}) AS rev
  FROM lineitem WHERE l_suppkey <= 20 GROUP BY 1, 2
), dev AS (
  SELECT l_suppkey, mo, CAST(rev AS DOUBLE) AS rev,
         ABS(CAST(rev AS DOUBLE)
             - SUM(CAST(rev AS DOUBLE)) OVER (PARTITION BY l_suppkey)
               / COUNT(*) OVER (PARTITION BY l_suppkey)) AS dev
  FROM per
)
SELECT l_suppkey, mo, rev, ROUND(dev, 4) AS dev,
       rk
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY l_suppkey
            ORDER BY dev DESC, mo) AS rk
  FROM dev
)
WHERE rk <= 2
ORDER BY l_suppkey, rk
"""


# ---------------------------------------------------------------------------
# q98a shape — percent-of-parent through TWO window levels: type share
# within brand, then brand share within the grand total, composed in one
# pass over the (brand, type) aggregate
# ---------------------------------------------------------------------------


def tpcds_q98a_two_level_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = read_table(spark, "part", sf_dir)
    per = (
        _li_orders(spark, sf_dir)
        .join(part, F.col("l_partkey") == part.p_partkey)
        .filter(F.col("o_orderstatus") == "F")
        .groupBy("p_brand", "p_type")
        .agg(F.sum(_rev()).alias("rev"))
        .withColumn("rev_d", F.col("rev").cast("double"))
    )
    w_brand = Window.partitionBy("p_brand")
    w_all = Window.partitionBy()
    return (
        per.select(
            "p_brand",
            "p_type",
            F.col("rev_d").alias("rev"),
            F.round(
                F.col("rev_d") / F.sum("rev_d").over(w_brand) * 100, 6
            ).alias("pct_of_brand"),
            F.round(
                F.sum("rev_d").over(w_brand)
                / F.sum("rev_d").over(w_all) * 100,
                6,
            ).alias("brand_pct_of_total"),
        )
        .orderBy("p_brand", "p_type")
    )


TPCDS_Q98A_SQL = f"""
WITH per AS (
  SELECT p_brand, p_type, CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS rev
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  WHERE o_orderstatus = 'F'
  GROUP BY 1, 2
)
SELECT p_brand, p_type, rev,
       ROUND(rev / SUM(rev) OVER (PARTITION BY p_brand) * 100, 6)
         AS pct_of_brand,
       ROUND(SUM(rev) OVER (PARTITION BY p_brand)
             / SUM(rev) OVER () * 100, 6) AS brand_pct_of_total
FROM per
ORDER BY p_brand, p_type
"""


QUERIES["tpcds_q47a_trailing_30d"] = (
    tpcds_q47a_trailing_30d, TPCDS_Q47A_SQL)
QUERIES["tpcds_q89a_rank_of_deviation"] = (
    tpcds_q89a_rank_of_deviation, TPCDS_Q89A_SQL)
QUERIES["tpcds_q98a_two_level_shares"] = (
    tpcds_q98a_two_level_shares, TPCDS_Q98A_SQL)


# ---------------------------------------------------------------------------
# q67a / q70a / q86a — the "a" rewrite family: the original query's ROLLUP
# is replaced by an explicit UNION of per-grain aggregates over a shared
# pre-aggregated CTE (reference: testdata/workloads/tpcds/queries/
# tpcds-q67a.test, tpcds-q70a.test, tpcds-q86a.test — the `results` /
# `results_rollup` pattern).  These complete the mirror: every TPC-DS
# query id in the reference workload now has a shape here.
#
# 100 TB note: the fine CTE is eagerly checkpointed so the grain branches
# fan out from a ≤|group-count|-row local table instead of re-running the
# fact join once per branch.  The union must multiply the PARTIAL, never
# the fact scan (same discipline as the grouping-sets pre-aggregation in
# q18/q27/q70/q80 — SCALE.md).
# ---------------------------------------------------------------------------


def tpcds_q86a_union_grain_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    supp = read_table(spark, "supplier", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    region = read_table(spark, "region", sf_dir)
    base = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(nation, supp.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
    )
    fine = materialize(
        base.groupBy("r_name", "n_name")
        .agg(F.sum(_rev()).cast("decimal(38,4)").alias("rev0"))
    )
    b0 = fine.select(
        F.col("rev0").alias("total"),
        "r_name",
        "n_name",
        F.lit(0).alias("lochier"),
    )
    b1 = (
        fine.groupBy("r_name")
        .agg(F.sum("rev0").cast("decimal(38,4)").alias("total"))
        .select(
            "total",
            "r_name",
            F.lit(None).cast("string").alias("n_name"),
            F.lit(1).alias("lochier"),
        )
    )
    b2 = fine.agg(F.sum("rev0").cast("decimal(38,4)").alias("total")).select(
        "total",
        F.lit(None).cast("string").alias("r_name"),
        F.lit(None).cast("string").alias("n_name"),
        F.lit(2).alias("lochier"),
    )
    u = b0.unionByName(b1).unionByName(b2)
    w = Window.partitionBy(
        "lochier", F.when(F.col("lochier") == 0, F.col("r_name"))
    ).orderBy(F.desc("total"), F.asc_nulls_first("n_name"))
    return (
        u.withColumn("rank_in_parent", F.rank().over(w))
        .select(
            F.col("total").cast("double").alias("total"),
            "r_name",
            "n_name",
            "lochier",
            "rank_in_parent",
        )
        .orderBy(
            F.desc("lochier"),
            F.asc_nulls_first("r_name"),
            "rank_in_parent",
            F.asc_nulls_first("n_name"),
        )
    )


TPCDS_Q86A_SQL = f"""
WITH fine AS (
  SELECT r_name, n_name, CAST(SUM({REVENUE_TERM}) AS DECIMAL(38,4)) AS rev0
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2
),
u AS (
  SELECT rev0 AS total, r_name, n_name, 0 AS lochier FROM fine
  UNION ALL
  SELECT CAST(SUM(rev0) AS DECIMAL(38,4)), r_name, NULL, 1
  FROM fine GROUP BY r_name
  UNION ALL
  SELECT CAST(SUM(rev0) AS DECIMAL(38,4)), NULL, NULL, 2 FROM fine
)
SELECT CAST(total AS DOUBLE) AS total, r_name, n_name, lochier,
       RANK() OVER (PARTITION BY lochier,
                    CASE WHEN lochier = 0 THEN r_name END
                    ORDER BY total DESC, n_name NULLS FIRST) AS rank_in_parent
FROM u
ORDER BY lochier DESC, r_name NULLS FIRST, rank_in_parent,
         n_name NULLS FIRST
"""


def tpcds_q70a_union_top_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, "orders", sf_dir)
    cust = read_table(spark, "customer", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    region = read_table(spark, "region", sf_dir)
    base = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
    )
    fine = materialize(
        base.groupBy("r_name", "n_name")
        .agg(F.sum(dec("o_totalprice")).cast("decimal(38,2)").alias("pt"))
    )
    # q70's restriction subquery: keep only the top-3 regions by their own
    # total, computed from the same partial (rank over a 5-row aggregate —
    # broadcast-trivial at any scale).
    top = (
        fine.groupBy("r_name")
        .agg(F.sum("pt").alias("rt"))
        .withColumn(
            "rk", F.rank().over(Window.orderBy(F.desc("rt"), F.asc("r_name")))
        )
        .filter(F.col("rk") <= 3)
        .select("r_name")
    )
    kept = fine.join(top, "r_name", "left_semi")
    b0 = kept.select(
        F.col("pt").alias("total"), "r_name", "n_name", F.lit(0).alias("lochier")
    )
    b1 = (
        kept.groupBy("r_name")
        .agg(F.sum("pt").cast("decimal(38,2)").alias("total"))
        .select(
            "total",
            "r_name",
            F.lit(None).cast("string").alias("n_name"),
            F.lit(1).alias("lochier"),
        )
    )
    b2 = kept.agg(F.sum("pt").cast("decimal(38,2)").alias("total")).select(
        "total",
        F.lit(None).cast("string").alias("r_name"),
        F.lit(None).cast("string").alias("n_name"),
        F.lit(2).alias("lochier"),
    )
    u = b0.unionByName(b1).unionByName(b2)
    w = Window.partitionBy(
        "lochier", F.when(F.col("lochier") == 0, F.col("r_name"))
    ).orderBy(F.desc("total"), F.asc_nulls_first("n_name"))
    return (
        u.withColumn("rank_in_parent", F.rank().over(w))
        .select(
            F.col("total").cast("double").alias("total"),
            "r_name",
            "n_name",
            "lochier",
            "rank_in_parent",
        )
        .orderBy(
            F.desc("lochier"),
            F.asc_nulls_first("r_name"),
            "rank_in_parent",
            F.asc_nulls_first("n_name"),
        )
    )


TPCDS_Q70A_SQL = """
WITH fine AS (
  SELECT r_name, n_name,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS pt
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY 1, 2
),
top_r AS (
  SELECT r_name FROM (
    SELECT r_name,
           RANK() OVER (ORDER BY SUM(pt) DESC, r_name) AS rk
    FROM fine GROUP BY r_name
  ) WHERE rk <= 3
),
kept AS (SELECT * FROM fine WHERE r_name IN (SELECT r_name FROM top_r)),
u AS (
  SELECT pt AS total, r_name, n_name, 0 AS lochier FROM kept
  UNION ALL
  SELECT CAST(SUM(pt) AS DECIMAL(38,2)), r_name, NULL, 1
  FROM kept GROUP BY r_name
  UNION ALL
  SELECT CAST(SUM(pt) AS DECIMAL(38,2)), NULL, NULL, 2 FROM kept
)
SELECT CAST(total AS DOUBLE) AS total, r_name, n_name, lochier,
       RANK() OVER (PARTITION BY lochier,
                    CASE WHEN lochier = 0 THEN r_name END
                    ORDER BY total DESC, n_name NULLS FIRST) AS rank_in_parent
FROM u
ORDER BY lochier DESC, r_name NULLS FIRST, rank_in_parent,
         n_name NULLS FIRST
"""


def tpcds_q67a_union_grain_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir).filter(
        F.year("l_shipdate") == 1996
    )
    part = read_table(spark, "part", sf_dir)
    fine = materialize(
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_type", "p_brand", F.month("l_shipdate").alias("mo"))
        .agg(F.sum(_rev()).cast("decimal(38,4)").alias("rev0"))
    )
    b0 = fine.select(
        F.col("rev0").alias("total"), "p_type", "p_brand", "mo",
        F.lit(0).alias("grain"),
    )
    b1 = (
        fine.groupBy("p_type", "p_brand")
        .agg(F.sum("rev0").cast("decimal(38,4)").alias("total"))
        .select(
            "total", "p_type", "p_brand",
            F.lit(None).cast("int").alias("mo"),
            F.lit(1).alias("grain"),
        )
    )
    b2 = (
        fine.groupBy("p_type")
        .agg(F.sum("rev0").cast("decimal(38,4)").alias("total"))
        .select(
            "total", "p_type",
            F.lit(None).cast("string").alias("p_brand"),
            F.lit(None).cast("int").alias("mo"),
            F.lit(2).alias("grain"),
        )
    )
    b3 = fine.agg(F.sum("rev0").cast("decimal(38,4)").alias("total")).select(
        "total",
        F.lit(None).cast("string").alias("p_type"),
        F.lit(None).cast("string").alias("p_brand"),
        F.lit(None).cast("int").alias("mo"),
        F.lit(3).alias("grain"),
    )
    u = b0.unionByName(b1).unionByName(b2).unionByName(b3)
    w = Window.partitionBy("p_type").orderBy(
        F.desc("total"), "grain",
        F.asc_nulls_first("p_brand"), F.asc_nulls_first("mo"),
    )
    return (
        u.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("total").cast("double").alias("total"),
            "p_type", "p_brand", "mo", "grain", "rk",
        )
        .orderBy(F.asc_nulls_first("p_type"), "rk")
    )


TPCDS_Q67A_SQL = f"""
WITH fine AS (
  SELECT p_type, p_brand, CAST(month(l_shipdate) AS INT) AS mo,
         CAST(SUM({REVENUE_TERM}) AS DECIMAL(38,4)) AS rev0
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE year(l_shipdate) = 1996
  GROUP BY 1, 2, 3
),
u AS (
  SELECT rev0 AS total, p_type, p_brand, mo, 0 AS grain FROM fine
  UNION ALL
  SELECT CAST(SUM(rev0) AS DECIMAL(38,4)), p_type, p_brand, NULL, 1
  FROM fine GROUP BY p_type, p_brand
  UNION ALL
  SELECT CAST(SUM(rev0) AS DECIMAL(38,4)), p_type, NULL, NULL, 2
  FROM fine GROUP BY p_type
  UNION ALL
  SELECT CAST(SUM(rev0) AS DECIMAL(38,4)), NULL, NULL, NULL, 3 FROM fine
)
SELECT CAST(total AS DOUBLE) AS total, p_type, p_brand, mo, grain, rk
FROM (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY p_type
           ORDER BY total DESC, grain, p_brand NULLS FIRST,
                    mo NULLS FIRST) AS rk
  FROM u
)
WHERE rk <= 3
ORDER BY p_type NULLS FIRST, rk
"""


# ---------------------------------------------------------------------------
# q49 full structure — per-channel sales LEFT JOIN returns with a predicate
# on the NULLABLE side (the famous q49 idiom: `wr_return_amt > 10000` under
# a LEFT OUTER JOIN makes it effectively inner — Catalyst performs the same
# outer-to-inner conversion the reference planner does), TWO independent
# rank() windows per channel block (return_ratio and currency_ratio), an
# OR-filter across both ranks, and UNION **DISTINCT** of the channel blocks
# (tpcds-q49.test uses bare UNION). The earlier tpcds_q49_return_ratio_rank
# mirrors only the single-ratio per-channel top-k; this one is the complete
# least-mirrored structure the round-6 verdict flagged.
# ---------------------------------------------------------------------------


def tpcds_q49_dual_rank_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Channels = disjoint l_suppkey % 3 slices of lineitem (each slice its
    own 'fact table', mirroring web/catalog/store); 'returns' is the
    l_returnflag = 'R' projection of the slice, LEFT-joined back on the
    line's unique key, with the reference's nullable-side amount predicate.
    Ratios accumulate as exact BIGINTs (quantities are integral; prices
    are 2-dp -> cents), so the double division and therefore the rank tie
    structure are bit-identical across engines.

    Scale: each channel block aggregates the fact to item grain before
    the two windows, and both windows run over the per-channel ITEM
    aggregate (bounded by |part|), never over fact rows."""
    li = read_table(spark, "lineitem", sf_dir).filter(
        F.year("l_shipdate") == 1997
    )

    cents = F.round(F.col("l_extendedprice") * 100).cast("bigint")
    qty = F.col("l_quantity").cast("bigint")

    def channel_block(tag: int, name: str) -> DataFrame:
        sales = li.filter(
            (F.col("l_suppkey") % 3 == tag)
            & (F.col("l_quantity") > 0)
            & (F.col("l_extendedprice") > 0)
        ).select(
            "l_orderkey",
            "l_partkey",
            "l_linenumber",
            qty.alias("qty"),
            cents.alias("paid_cents"),
            "l_returnflag",
        )
        # Partial returns, integer-derived so both engines agree bit-for-bit:
        # a returned line gives back 1..qty units (deterministic in the
        # line's keys) and the floor-prorated share of the paid amount —
        # ratios then vary in (0, 1] per item instead of degenerating to 1.
        returns = (
            sales.filter(F.col("l_returnflag") == "R")
            .withColumn(
                "ret_qty",
                F.lit(1)
                + (F.col("l_orderkey") + 3 * F.col("l_linenumber"))
                % F.col("qty"),
            )
            .select(
                F.col("l_orderkey").alias("r_orderkey"),
                F.col("l_partkey").alias("r_partkey"),
                F.col("l_linenumber").alias("r_linenumber"),
                "ret_qty",
                F.expr("(paid_cents * ret_qty) div qty").alias("ret_cents"),
            )
        )
        joined = sales.join(
            returns,
            (F.col("l_orderkey") == F.col("r_orderkey"))
            & (F.col("l_partkey") == F.col("r_partkey"))
            & (F.col("l_linenumber") == F.col("r_linenumber")),
            "left_outer",
        ).filter(F.col("ret_cents") > 2_000_000)  # nullable side -> inner
        ratios = joined.groupBy("l_partkey").agg(
            F.sum(F.coalesce("ret_qty", F.lit(0))).alias("sr_qty"),
            F.sum("qty").alias("s_qty"),
            F.sum(F.coalesce("ret_cents", F.lit(0))).alias("sr_cents"),
            F.sum("paid_cents").alias("s_cents"),
        ).select(
            F.col("l_partkey").alias("item"),
            (F.col("sr_qty").cast("double") / F.col("s_qty").cast("double"))
            .alias("return_ratio"),
            (
                F.col("sr_cents").cast("double")
                / F.col("s_cents").cast("double")
            ).alias("currency_ratio"),
        )
        w_ret = Window.orderBy("return_ratio")
        w_cur = Window.orderBy("currency_ratio")
        return (
            ratios.withColumn("return_rank", F.rank().over(w_ret))
            .withColumn("currency_rank", F.rank().over(w_cur))
            .filter(
                (F.col("return_rank") <= 10) | (F.col("currency_rank") <= 10)
            )
            .select(
                F.lit(name).alias("channel"),
                "item",
                F.round("return_ratio", 6).alias("return_ratio"),
                "return_rank",
                "currency_rank",
            )
        )

    out = (
        channel_block(0, "store")
        .unionByName(channel_block(1, "catalog"))
        .unionByName(channel_block(2, "web"))
        .distinct()  # reference uses bare UNION (distinct semantics)
    )
    return out.orderBy(
        "channel", "return_rank", "currency_rank", "item"
    ).limit(100)


def _q49_block_sql(tag: int, name: str) -> str:
    return f"""
  SELECT '{name}' AS channel, item,
         ROUND(return_ratio, 6) AS return_ratio, return_rank, currency_rank
  FROM (
    SELECT item, return_ratio, currency_ratio,
           RANK() OVER (ORDER BY return_ratio) AS return_rank,
           RANK() OVER (ORDER BY currency_ratio) AS currency_rank
    FROM (
      SELECT s.l_partkey AS item,
             CAST(SUM(COALESCE(r.ret_qty, 0)) AS DOUBLE)
               / CAST(SUM(s.qty) AS DOUBLE) AS return_ratio,
             CAST(SUM(COALESCE(r.ret_cents, 0)) AS DOUBLE)
               / CAST(SUM(s.paid_cents) AS DOUBLE) AS currency_ratio
      FROM sales_{tag} s
      LEFT OUTER JOIN returns_{tag} r
        ON s.l_orderkey = r.r_orderkey AND s.l_partkey = r.r_partkey
       AND s.l_linenumber = r.r_linenumber
      WHERE r.ret_cents > 2000000
      GROUP BY s.l_partkey
    ) ratios
  ) ranked
  WHERE return_rank <= 10 OR currency_rank <= 10"""


TPCDS_Q49_DUAL_SQL = (
    """
WITH base AS (
  SELECT l_orderkey, l_partkey, l_linenumber, l_suppkey, l_returnflag,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS paid_cents
  FROM lineitem
  WHERE EXTRACT(YEAR FROM l_shipdate) = 1997
    AND l_quantity > 0 AND l_extendedprice > 0
),
"""
    + ",\n".join(
        f"""sales_{t} AS (
  SELECT * FROM base WHERE l_suppkey % 3 = {t}
),
returns_{t} AS (
  SELECT l_orderkey AS r_orderkey, l_partkey AS r_partkey,
         l_linenumber AS r_linenumber,
         1 + (l_orderkey + 3 * l_linenumber) % qty AS ret_qty,
         (paid_cents * (1 + (l_orderkey + 3 * l_linenumber) % qty)) // qty
           AS ret_cents
  FROM sales_{t} WHERE l_returnflag = 'R'
)"""
        for t in (0, 1, 2)
    )
    + "\nSELECT * FROM ("
    + "\n  UNION\n".join(
        _q49_block_sql(t, n)
        for t, n in ((0, "store"), (1, "catalog"), (2, "web"))
    )
    + """
) u
ORDER BY channel, return_rank, currency_rank, item
LIMIT 100
"""
)


QUERIES["tpcds_q86a_union_grain_rank"] = (
    tpcds_q86a_union_grain_rank, TPCDS_Q86A_SQL)
QUERIES["tpcds_q49_dual_rank_union"] = (
    tpcds_q49_dual_rank_union, TPCDS_Q49_DUAL_SQL)
QUERIES["tpcds_q70a_union_top_regions"] = (
    tpcds_q70a_union_top_regions, TPCDS_Q70A_SQL)
QUERIES["tpcds_q67a_union_grain_topn"] = (
    tpcds_q67a_union_grain_topn, TPCDS_Q67A_SQL)
