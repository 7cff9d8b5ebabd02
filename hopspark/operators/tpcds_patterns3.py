"""TPC-DS-pattern workload slice, part 3 — 15 more plan shapes.

Round-3 second widening (reference: testdata/workloads/tpcds/queries/,
205 files): shapes parts 1-2 left out — channel profit/returns netting
under ROLLUP (q5/q80), repeated scalar-subquery CASE buckets (q9),
before/after-event ratio scans (q21/q40), cross-dimension mismatch joins
(q46/q68), histogram-of-aggregate banding (q54), promotional-share ratio
(q61), latency bucket pivots (q62/q50/q99), repeat-purchase aggregate
self-joins (q64), wide 12-month pivot projections (q66), rank inside
ROLLUP hierarchies (q67/q70), three-channel share joins (q83), am/pm
scalar ratios (q90), returns-netted customer totals (q93), multi-dim
guarded counts (q96), and FULL OUTER distinct-key channel overlap (q97).

Same adaptation + determinism discipline as part 2 (reduced schema:
channel := order-priority tier; ship mode := priority; exact decimal sums
cast to double only at the end; ratios rounded to 6dp before any filter
or sort; full tie-breaks everywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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

def _channel():
    """Priority-tier channel label; built lazily — Column construction
    needs an active SparkContext (module import must stay session-free)."""
    return (
        F.when(F.col("o_orderpriority").isin(*URGENT), F.lit("urgent"))
        .when(F.col("o_orderpriority").isin(*MEDIUM), F.lit("medium"))
        .otherwise(F.lit("low"))
    )

_CHANNEL_SQL = """CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 'urgent'
     WHEN o_orderpriority IN ('3-MEDIUM') THEN 'medium'
     ELSE 'low' END"""

# ---------------------------------------------------------------------------
# q5 shape — channel report: sales vs returns netting under ROLLUP
# ---------------------------------------------------------------------------


def tpcds_q5_channel_profit_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    base = (
        _li_orders(spark, sf_dir)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select(
            _channel().alias("channel"),
            "n_name",
            F.when(F.col("l_returnflag") != "R", _rev()).alias("sale"),
            F.when(F.col("l_returnflag") == "R", _rev()).alias("ret"),
        )
    )
    return (
        base.rollup("channel", "n_name")
        .agg(
            F.sum("sale").cast("double").alias("sales"),
            F.sum("ret").cast("double").alias("returns"),
            (F.sum("sale") - F.sum("ret")).cast("double").alias("profit"),
            F.grouping_id("channel", "n_name").cast("int").alias("gid"),
        )
        .orderBy("gid", "channel", "n_name")
    )


TPCDS_Q5_SQL = f"""
SELECT channel, n_name,
       CAST(SUM(sale) AS DOUBLE) AS sales,
       CAST(SUM(ret) AS DOUBLE) AS returns,
       CAST(SUM(sale) - SUM(ret) AS DOUBLE) AS profit,
       CAST(GROUPING(channel) * 2 + GROUPING(n_name) AS INT) AS gid
FROM (
  SELECT {_CHANNEL_SQL} AS channel, n_name,
         CASE WHEN l_returnflag <> 'R' THEN {REVENUE_TERM} END AS sale,
         CASE WHEN l_returnflag = 'R' THEN {REVENUE_TERM} END AS ret
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
)
GROUP BY ROLLUP (channel, n_name)
ORDER BY gid, channel, n_name
"""

# ---------------------------------------------------------------------------
# q9 shape — five CASE buckets, each choosing between two aggregates on a
# count threshold (the reference runs 15 scalar subqueries; the DataFrame
# plan computes all 15 aggregates in ONE scan — same values, one pass)
# ---------------------------------------------------------------------------

_Q9_BANDS = ((1, 10), (11, 20), (21, 30), (31, 40), (41, 50))


def tpcds_q9_case_bucket_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    aggs = [F.count(F.lit(1)).alias("n_total")]
    for lo, hi in _Q9_BANDS:
        band = F.col("l_quantity").between(lo, hi)
        aggs += [
            F.count(F.when(band, 1)).alias(f"n_{lo}"),
            F.sum(F.when(band, dec("l_extendedprice"))).alias(f"p_{lo}"),
            F.sum(F.when(band, dec("l_discount", 4, 2))).alias(f"d_{lo}"),
        ]
    one = li.agg(*aggs)
    cols = []
    for lo, hi in _Q9_BANDS:
        n = F.col(f"n_{lo}")
        avg_price = F.round(F.col(f"p_{lo}").cast("double") / n, 6)
        avg_disc = F.round(F.col(f"d_{lo}").cast("double") / n * 1000, 6)
        cols.append(
            F.when(n > F.col("n_total") * 0.21, avg_price)
            .otherwise(avg_disc)
            .alias(f"bucket{lo // 10 + 1}")
        )
    return one.select(*cols)


def _q9_sql() -> str:
    cases = []
    for lo, hi in _Q9_BANDS:
        where = f"FROM lineitem WHERE l_quantity BETWEEN {lo} AND {hi}"
        cases.append(
            f"""CASE WHEN (SELECT COUNT(*) {where})
             > (SELECT COUNT(*) FROM lineitem) * 0.21
        THEN (SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
                           / COUNT(*), 6) {where})
        ELSE (SELECT ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
                           / COUNT(*) * 1000, 6) {where})
        END AS bucket{lo // 10 + 1}"""
        )
    return "SELECT " + ",\n       ".join(cases)


TPCDS_Q9_SQL = _q9_sql()

# ---------------------------------------------------------------------------
# q21/q40 shape — quantity shipped in the window before vs after a pivot
# date, keeping the balanced suppliers' nations
# ---------------------------------------------------------------------------

_Q21_PIVOT = "1998-06-01"


def tpcds_q21_before_after_event(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    supp = read_table(spark, "supplier", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    pivot = F.to_timestamp(F.lit(_Q21_PIVOT))
    base = (
        li.filter(
            (F.col("l_shipdate") >= F.date_sub(pivot, 180))
            & (F.col("l_shipdate") < F.date_add(pivot, 180))
        )
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(
                F.when(F.col("l_shipdate") < pivot, dec("l_quantity"))
            ).alias("qb"),
            F.sum(
                F.when(F.col("l_shipdate") >= pivot, dec("l_quantity"))
            ).alias("qa"),
        )
        .filter(F.col("qb").isNotNull() & F.col("qa").isNotNull())
    )
    ratio = F.round(F.col("qa").cast("double") / F.col("qb").cast("double"), 6)
    return (
        base.select(
            "n_name",
            F.col("qb").cast("double").alias("qty_before"),
            F.col("qa").cast("double").alias("qty_after"),
            ratio.alias("ratio"),
        )
        .filter((F.col("ratio") >= 0.5) & (F.col("ratio") <= 2.0))
        .orderBy("n_name")
    )


TPCDS_Q21_SQL = f"""
WITH w AS (
  SELECT n_name,
         SUM(CASE WHEN l_shipdate < TIMESTAMP '{_Q21_PIVOT}'
                  THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS qb,
         SUM(CASE WHEN l_shipdate >= TIMESTAMP '{_Q21_PIVOT}'
                  THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS qa
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE l_shipdate >= TIMESTAMP '{_Q21_PIVOT}' - INTERVAL 180 DAY
    AND l_shipdate <  TIMESTAMP '{_Q21_PIVOT}' + INTERVAL 180 DAY
  GROUP BY n_name
)
SELECT n_name, CAST(qb AS DOUBLE) AS qty_before, CAST(qa AS DOUBLE) AS qty_after,
       ROUND(CAST(qa AS DOUBLE) / CAST(qb AS DOUBLE), 6) AS ratio
FROM w
WHERE qb IS NOT NULL AND qa IS NOT NULL
  AND ROUND(CAST(qa AS DOUBLE) / CAST(qb AS DOUBLE), 6) BETWEEN 0.5 AND 2.0
ORDER BY n_name
"""

# ---------------------------------------------------------------------------
# q46/q68 shape — cross-dimension mismatch: customer nation differs from
# the supplying nation
# ---------------------------------------------------------------------------


def tpcds_q46_nation_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    supp = read_table(spark, "supplier", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    cn = F.broadcast(nation.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_name").alias("cust_nation")
    ))
    sn = F.broadcast(nation.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    ))
    return (
        _li_orders(spark, sf_dir)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(supp, F.col("l_suppkey") == supp.s_suppkey)
        .join(cn, cust.c_nationkey == F.col("cnk"))
        .join(sn, supp.s_nationkey == F.col("snk"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            dsum(_rev()).alias("rev"),
        )
        .orderBy(F.desc("rev"), "cust_nation", "supp_nation")
        .limit(20)
    )


TPCDS_Q46_SQL = f"""
SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
       COUNT(*) AS n_lines,
       CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS rev
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE cn.n_name <> sn.n_name
GROUP BY cn.n_name, sn.n_name
ORDER BY rev DESC, cust_nation, supp_nation
LIMIT 20
"""

# ---------------------------------------------------------------------------
# q54 shape — histogram of an aggregate: customers per revenue band
# ---------------------------------------------------------------------------


def tpcds_q54_revenue_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    per_cust = (
        _li_orders(spark, sf_dir)
        .groupBy("o_custkey")
        .agg(F.sum(_rev()).alias("rev"))
    )
    # exact integer banding: rev is DECIMAL(·,4), so rev*10000 is
    # integer-valued and casts exactly on both engines (a fractional
    # decimal would round in DuckDB but truncate in Spark); the final
    # int/int division is exact in double far below 2^53
    band = F.floor(
        (F.col("rev") * 10000).cast("long") / F.lit(500_000_000)
    ).cast("int")
    return (
        per_cust.select(band.alias("band"))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("band")
    )


TPCDS_Q54_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey, SUM({REVENUE_TERM}) AS rev
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY o_custkey
)
SELECT CAST(FLOOR(CAST(rev * 10000 AS BIGINT) / 500000000) AS INT) AS band,
       COUNT(*) AS n_customers
FROM per_cust
GROUP BY 1
ORDER BY band
"""

# ---------------------------------------------------------------------------
# q61 shape — promotional share of revenue per nation (two conditional
# aggregates; the reference computes them as two scalar subqueries)
# ---------------------------------------------------------------------------


def tpcds_q61_promo_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    base = (
        _li_orders(spark, sf_dir)
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.when(F.col("l_discount") >= 0.05, _rev())).alias("promo"),
            F.sum(_rev()).alias("total"),
        )
    )
    return base.select(
        "n_name",
        F.coalesce(F.col("promo"), F.lit(0)).cast("double").alias("promo_rev"),
        F.col("total").cast("double").alias("total_rev"),
        F.round(
            F.coalesce(F.col("promo"), F.lit(0)).cast("double")
            / F.col("total").cast("double")
            * 100,
            6,
        ).alias("promo_pct"),
    ).orderBy("n_name")


TPCDS_Q61_SQL = f"""
SELECT n_name,
       CAST(COALESCE(SUM(CASE WHEN l_discount >= 0.05 THEN {REVENUE_TERM} END), 0)
            AS DOUBLE) AS promo_rev,
       CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS total_rev,
       ROUND(CAST(COALESCE(SUM(CASE WHEN l_discount >= 0.05 THEN {REVENUE_TERM} END), 0)
                  AS DOUBLE)
             / CAST(SUM({REVENUE_TERM}) AS DOUBLE) * 100, 6) AS promo_pct
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""

# ---------------------------------------------------------------------------
# q62/q50/q99 shape — shipping latency buckets per "ship mode" (priority)
# ---------------------------------------------------------------------------


def tpcds_q62_latency_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        _li_orders(spark, sf_dir)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.when(lag <= 30, 1)).alias("d30"),
            F.count(F.when((lag > 30) & (lag <= 60), 1)).alias("d60"),
            F.count(F.when((lag > 60) & (lag <= 90), 1)).alias("d90"),
            F.count(F.when(lag > 90, 1)).alias("d90_plus"),
        )
        .orderBy("o_orderpriority")
    )


TPCDS_Q62_SQL = """
SELECT o_orderpriority,
       COUNT(CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 1 END) AS d30,
       COUNT(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 30
                   AND date_diff('day', o_orderdate, l_shipdate) <= 60 THEN 1 END) AS d60,
       COUNT(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60
                   AND date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 1 END) AS d90,
       COUNT(CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 90 THEN 1 END) AS d90_plus
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

# ---------------------------------------------------------------------------
# q64 shape — repeat purchases: the same (customer, part) bought in both
# years with growing quantity — a self-join of a composite-key aggregate
# ---------------------------------------------------------------------------


def tpcds_q64_repeat_purchases(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    part = read_table(spark, "part", sf_dir)
    cp_year = (
        _li_orders(spark, sf_dir)
        .filter(F.year("o_orderdate").isin(1995, 1996))
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("o_custkey", "p_type", F.year("o_orderdate").alias("yr"))
        .agg(F.sum(dec("l_quantity")).alias("qty"))
    )
    y95 = cp_year.filter(F.col("yr") == 1995).select(
        F.col("o_custkey").alias("ck"), F.col("p_type").alias("pt"),
        F.col("qty").alias("q95"),
    )
    y96 = cp_year.filter(F.col("yr") == 1996).select(
        F.col("o_custkey").alias("ck2"), F.col("p_type").alias("pt2"),
        F.col("qty").alias("q96"),
    )
    pairs = y95.join(
        y96, (F.col("ck") == F.col("ck2")) & (F.col("pt") == F.col("pt2"))
    ).filter(F.col("q96") > F.col("q95"))
    return (
        pairs.join(cust, F.col("ck") == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            (F.sum(F.col("q96") - F.col("q95")).cast("double")
             / F.count(F.lit(1))).alias("avg_growth"),
        )
        .orderBy("n_name")
    )


TPCDS_Q64_SQL = """
WITH cp AS (
  SELECT o_custkey AS ck, p_type AS pt, year(o_orderdate) AS yr,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part   ON l_partkey = p_partkey
  WHERE year(o_orderdate) IN (1995, 1996)
  GROUP BY 1, 2, 3
)
SELECT n_name, COUNT(*) AS n_pairs,
       CAST(SUM(b.qty - a.qty) AS DOUBLE) / COUNT(*) AS avg_growth
FROM cp a
JOIN cp b ON a.ck = b.ck AND a.pt = b.pt AND a.yr = 1995 AND b.yr = 1996
JOIN customer ON a.ck = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE b.qty > a.qty
GROUP BY n_name
ORDER BY n_name
"""

# ---------------------------------------------------------------------------
# q66 shape — wide pivot projection: 12 monthly quantity columns per
# supplier nation for one year
# ---------------------------------------------------------------------------


def tpcds_q66_monthly_pivot_wide(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir).filter(
        F.year("l_shipdate") == 1996
    )
    supp = read_table(spark, "supplier", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    mo = F.month("l_shipdate")
    aggs = [
        F.sum(F.when(mo == m, dec("l_quantity")))
        .cast("double")
        .alias(f"qty_m{m}")
        for m in range(1, 13)
    ] + [dsum(_rev()).alias("total_rev")]
    return (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(*aggs)
        .orderBy("n_name")
    )


def _q66_sql() -> str:
    cols = ",\n       ".join(
        f"CAST(SUM(CASE WHEN month(l_shipdate) = {m} "
        f"THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS DOUBLE) AS qty_m{m}"
        for m in range(1, 13)
    )
    return f"""
SELECT n_name,
       {cols},
       CAST(SUM({REVENUE_TERM}) AS DOUBLE) AS total_rev
FROM lineitem
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE year(l_shipdate) = 1996
GROUP BY n_name
ORDER BY n_name
"""


TPCDS_Q66_SQL = _q66_sql()

# ---------------------------------------------------------------------------
# q67 shape — rank inside a ROLLUP hierarchy: top revenue rows per p_type
# across every (type, brand, month) grouping level
# ---------------------------------------------------------------------------


def tpcds_q67_rollup_rank_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir).filter(
        F.year("l_shipdate") == 1996
    )
    part = read_table(spark, "part", sf_dir)
    rolled = (
        li.join(part, li.l_partkey == part.p_partkey)
        .rollup("p_type", "p_brand", F.month("l_shipdate").alias("mo"))
        .agg(F.sum(_rev()).alias("rev_d"))
        .select(
            F.coalesce("p_type", F.lit("ALL")).alias("type_l"),
            F.coalesce("p_brand", F.lit("ALL")).alias("brand_l"),
            F.coalesce("mo", F.lit(-1)).alias("mo_l"),
            F.col("rev_d").cast("double").alias("rev"),
        )
    )
    w = Window.partitionBy("type_l").orderBy(
        F.desc("rev"), "brand_l", "mo_l"
    )
    return (
        rolled.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .orderBy("type_l", "rk")
    )


TPCDS_Q67_SQL = f"""
WITH rolled AS (
  SELECT COALESCE(p_type, 'ALL') AS type_l,
         COALESCE(p_brand, 'ALL') AS brand_l,
         COALESCE(mo, -1) AS mo_l,
         CAST(SUM(rev) AS DOUBLE) AS rev
  FROM (
    SELECT p_type, p_brand, month(l_shipdate) AS mo, {REVENUE_TERM} AS rev
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE year(l_shipdate) = 1996
  )
  GROUP BY ROLLUP (p_type, p_brand, mo)
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (
           PARTITION BY type_l ORDER BY rev DESC, brand_l, mo_l) AS rk
  FROM rolled
)
SELECT type_l, brand_l, mo_l, rev, rk FROM ranked
WHERE rk <= 3
ORDER BY type_l, rk
"""

# ---------------------------------------------------------------------------
# q83 shape — three per-channel return CTEs joined on the item, each
# channel's share of the combined returns
# ---------------------------------------------------------------------------


def tpcds_q83_three_channel_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    returns = (
        _li_orders(spark, sf_dir)
        .filter(F.col("l_returnflag") == "R")
        .select("l_partkey", _channel().alias("channel"), dec("l_quantity").alias("q"))
        .groupBy("l_partkey")
        .agg(
            F.sum(F.when(F.col("channel") == "urgent", F.col("q"))).alias("qu"),
            F.sum(F.when(F.col("channel") == "medium", F.col("q"))).alias("qm"),
            F.sum(F.when(F.col("channel") == "low", F.col("q"))).alias("ql"),
        )
        .filter(
            F.col("qu").isNotNull()
            & F.col("qm").isNotNull()
            & F.col("ql").isNotNull()
        )
    )
    total = (F.col("qu") + F.col("qm") + F.col("ql")).cast("double")
    return (
        returns.select(
            "l_partkey",
            F.col("qu").cast("double").alias("urgent_qty"),
            F.col("qm").cast("double").alias("medium_qty"),
            F.col("ql").cast("double").alias("low_qty"),
            F.round(F.col("qu").cast("double") / total * 100, 6).alias("urgent_share"),
        )
        .orderBy("l_partkey")
        .limit(100)
    )


TPCDS_Q83_SQL = f"""
WITH r AS (
  SELECT l_partkey,
         SUM(CASE WHEN {_CHANNEL_SQL} = 'urgent'
                  THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS qu,
         SUM(CASE WHEN {_CHANNEL_SQL} = 'medium'
                  THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS qm,
         SUM(CASE WHEN {_CHANNEL_SQL} = 'low'
                  THEN CAST(l_quantity AS DECIMAL(12,2)) END) AS ql
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
  GROUP BY l_partkey
)
SELECT l_partkey,
       CAST(qu AS DOUBLE) AS urgent_qty,
       CAST(qm AS DOUBLE) AS medium_qty,
       CAST(ql AS DOUBLE) AS low_qty,
       ROUND(CAST(qu AS DOUBLE) / CAST(qu + qm + ql AS DOUBLE) * 100, 6)
           AS urgent_share
FROM r
WHERE qu IS NOT NULL AND qm IS NOT NULL AND ql IS NOT NULL
ORDER BY l_partkey
LIMIT 100
"""

# ---------------------------------------------------------------------------
# q90 shape — am/pm activity ratio per event type (two guarded counts)
# ---------------------------------------------------------------------------


def tpcds_q90_am_pm_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_table(spark, "events", sf_dir)
    hr = F.hour("ts")
    base = events.groupBy("event_type").agg(
        F.count(F.when(hr.between(6, 11), 1)).alias("am_cnt"),
        F.count(F.when(hr.between(18, 23), 1)).alias("pm_cnt"),
    )
    return (
        base.filter(F.col("pm_cnt") > 0)
        .select(
            "event_type",
            "am_cnt",
            "pm_cnt",
            F.round(F.col("am_cnt") / F.col("pm_cnt"), 6).alias("am_pm_ratio"),
        )
        .orderBy("event_type")
    )


TPCDS_Q90_SQL = """
SELECT event_type,
       COUNT(CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 1 END) AS am_cnt,
       COUNT(CASE WHEN hour(ts) BETWEEN 18 AND 23 THEN 1 END) AS pm_cnt,
       ROUND(CAST(COUNT(CASE WHEN hour(ts) BETWEEN 6 AND 11 THEN 1 END) AS DOUBLE)
             / COUNT(CASE WHEN hour(ts) BETWEEN 18 AND 23 THEN 1 END), 6)
           AS am_pm_ratio
FROM events
GROUP BY event_type
HAVING COUNT(CASE WHEN hour(ts) BETWEEN 18 AND 23 THEN 1 END) > 0
ORDER BY event_type
"""

# ---------------------------------------------------------------------------
# q93 shape — customer totals netted of returns, top spenders
# ---------------------------------------------------------------------------


def tpcds_q93_net_after_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    net = F.when(F.col("l_returnflag") == "R", -_rev()).otherwise(_rev())
    return (
        _li_orders(spark, sf_dir)
        .groupBy("o_custkey")
        .agg(F.sum(net).cast("double").alias("net_paid"))
        .orderBy(F.desc("net_paid"), "o_custkey")
        .limit(50)
    )


TPCDS_Q93_SQL = f"""
SELECT o_custkey,
       CAST(SUM(CASE WHEN l_returnflag = 'R' THEN -({REVENUE_TERM})
                     ELSE {REVENUE_TERM} END) AS DOUBLE) AS net_paid
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_custkey
ORDER BY net_paid DESC, o_custkey
LIMIT 50
"""

# ---------------------------------------------------------------------------
# q96 shape — multi-dimension guarded count (a single scalar)
# ---------------------------------------------------------------------------


def tpcds_q96_guarded_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _li_orders(spark, sf_dir)
        .filter(
            F.col("l_quantity").between(20, 30)
            & F.col("o_orderpriority").isin(*URGENT)
            & (F.year("o_orderdate") == 1995)
        )
        .agg(F.count(F.lit(1)).alias("n_lines"))
    )


TPCDS_Q96_SQL = """
SELECT COUNT(*) AS n_lines
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_quantity BETWEEN 20 AND 30
  AND o_orderpriority IN ('1-URGENT','2-HIGH')
  AND year(o_orderdate) = 1995
"""

# ---------------------------------------------------------------------------
# q97 shape — channel overlap: FULL OUTER join of the two channels'
# distinct buyer sets, counted into both/left-only/right-only
# ---------------------------------------------------------------------------


def tpcds_q97_channel_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = read_table(spark, "orders", sf_dir).filter(
        F.year("o_orderdate").isin(1995, 1996)
    )
    urgent = (
        orders.filter(F.col("o_orderpriority").isin(*URGENT))
        .select(F.col("o_custkey").alias("uk"))
        .distinct()
    )
    low = (
        orders.filter(F.col("o_orderpriority").isin(*LOW))
        .select(F.col("o_custkey").alias("lk"))
        .distinct()
    )
    both = urgent.join(low, urgent.uk == low.lk, "full_outer")
    return both.agg(
        F.count(
            F.when(F.col("uk").isNotNull() & F.col("lk").isNotNull(), 1)
        ).alias("both_channels"),
        F.count(
            F.when(F.col("uk").isNotNull() & F.col("lk").isNull(), 1)
        ).alias("urgent_only"),
        F.count(
            F.when(F.col("uk").isNull() & F.col("lk").isNotNull(), 1)
        ).alias("low_only"),
    )


TPCDS_Q97_SQL = """
WITH u AS (
  SELECT DISTINCT o_custkey AS uk FROM orders
  WHERE year(o_orderdate) IN (1995, 1996)
    AND o_orderpriority IN ('1-URGENT','2-HIGH')
),
l AS (
  SELECT DISTINCT o_custkey AS lk FROM orders
  WHERE year(o_orderdate) IN (1995, 1996)
    AND o_orderpriority IN ('4-NOT SPECIFIED','5-LOW')
)
SELECT COUNT(CASE WHEN uk IS NOT NULL AND lk IS NOT NULL THEN 1 END) AS both_channels,
       COUNT(CASE WHEN uk IS NOT NULL AND lk IS NULL THEN 1 END) AS urgent_only,
       COUNT(CASE WHEN uk IS NULL AND lk IS NOT NULL THEN 1 END) AS low_only
FROM u FULL OUTER JOIN l ON uk = lk
"""


QUERIES: dict[str, tuple] = {
    "tpcds_q5_channel_profit_rollup": (
        tpcds_q5_channel_profit_rollup,
        TPCDS_Q5_SQL,
    ),
    "tpcds_q9_case_bucket_scalars": (
        tpcds_q9_case_bucket_scalars,
        TPCDS_Q9_SQL,
    ),
    "tpcds_q21_before_after_event": (
        tpcds_q21_before_after_event,
        TPCDS_Q21_SQL,
    ),
    "tpcds_q46_nation_mismatch": (tpcds_q46_nation_mismatch, TPCDS_Q46_SQL),
    "tpcds_q54_revenue_bands": (tpcds_q54_revenue_bands, TPCDS_Q54_SQL),
    "tpcds_q61_promo_ratio": (tpcds_q61_promo_ratio, TPCDS_Q61_SQL),
    "tpcds_q62_latency_buckets": (tpcds_q62_latency_buckets, TPCDS_Q62_SQL),
    "tpcds_q64_repeat_purchases": (tpcds_q64_repeat_purchases, TPCDS_Q64_SQL),
    "tpcds_q66_monthly_pivot_wide": (
        tpcds_q66_monthly_pivot_wide,
        TPCDS_Q66_SQL,
    ),
    "tpcds_q67_rollup_rank_topn": (tpcds_q67_rollup_rank_topn, TPCDS_Q67_SQL),
    "tpcds_q83_three_channel_returns": (
        tpcds_q83_three_channel_returns,
        TPCDS_Q83_SQL,
    ),
    "tpcds_q90_am_pm_ratio": (tpcds_q90_am_pm_ratio, TPCDS_Q90_SQL),
    "tpcds_q93_net_after_returns": (
        tpcds_q93_net_after_returns,
        TPCDS_Q93_SQL,
    ),
    "tpcds_q96_guarded_count": (tpcds_q96_guarded_count, TPCDS_Q96_SQL),
    "tpcds_q97_channel_overlap": (tpcds_q97_channel_overlap, TPCDS_Q97_SQL),
}
