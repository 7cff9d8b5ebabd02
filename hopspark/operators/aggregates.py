"""Aggregation operator coverage.

Reference parity targets:
  * grouping/spilling hash agg — be/src/exec/grouping-aggregator.h:47-192
  * streaming pre-agg (partial/final split) — be/src/exec/streaming-aggregation-node.h:30-46
    (Spark's partial→final aggregation is the same design, automatic)
  * non-grouping agg — be/src/exec/non-grouping-aggregator.h:69
  * GROUPING SETS / ROLLUP / CUBE + grouping_id —
    fe/.../analysis/MultiAggregateInfo.java:43-162 (Spark: Expand operator)
  * multiple DISTINCT aggregates — MultiAggregateInfo.java:43-84
  * builtins: count/min/max/sum/avg/stddev*/var*/group_concat/ndv/appx_median
    — fe/.../catalog/BuiltinsDb.java:978-1381; kernels
    be/src/exprs/aggregate-functions-ir.cc
  * aggif(p, x) ≡ max(CASE WHEN p THEN x END) — BuiltinsDb.java:1188

Determinism: group_concat is made deterministic by sorting collected items
(the reference documents group_concat order as undefined; we pin it for the
oracle). Variance/stddev use a closed-form over exact decimal sums —
sum(x), sum(x²), count — so both engines compute the identical double, and
the formula is numerically safe here because inputs are bounded decimals.
ndv/appx_median are approximate ⇒ no SQL oracle (rows-only), with exact
twins asserted separately in tests/test_aggregates.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hopspark.catalog import read_table
from hopspark.operators._util import dec, dsum

# --- grouping sets / rollup / cube ----------------------------------------


def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over region→nation revenue with grouping flags."""
    nation = read_table(spark, "nation", sf_dir)
    region = read_table(spark, "region", sf_dir)
    cust = read_table(spark, "customer", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            dsum(dec("o_totalprice")).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
            F.grouping_id("r_name", "n_name").cast("int").alias("gid"),
        )
        .orderBy(
            F.col("gid").desc(),
            F.col("r_name").asc_nulls_first(),
            F.col("n_name").asc_nulls_first(),
        )
    )


AGG_ROLLUP_SQL = """
SELECT r_name, n_name,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders,
       CAST(GROUPING(r_name, n_name) AS INT) AS gid
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY gid DESC, r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over returnflag × linestatus."""
    li = read_table(spark, "lineitem", sf_dir)
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity")).alias("sum_qty"),
            F.count(F.lit(1)).alias("n"),
            F.grouping_id("l_returnflag", "l_linestatus").cast("int").alias("gid"),
        )
        .orderBy(
            F.col("gid").asc(),
            F.col("l_returnflag").asc_nulls_first(),
            F.col("l_linestatus").asc_nulls_first(),
        )
    )


AGG_CUBE_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       COUNT(*) AS n,
       CAST(GROUPING(l_returnflag, l_linestatus) AS INT) AS gid
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY gid ASC, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((priority), (status), ()) — the general
    multi-class aggregation (MultiAggregateInfo)."""
    orders = read_table(spark, "orders", sf_dir)
    return (
        orders.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"], []],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(dec("o_totalprice")).alias("revenue"),
            F.grouping_id("o_orderpriority", "o_orderstatus").cast("int").alias("gid"),
        )
        .orderBy(
            F.col("gid").asc(),
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


AGG_GROUPING_SETS_SQL = """
SELECT o_orderpriority, o_orderstatus,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue,
       CAST(GROUPING(o_orderpriority, o_orderstatus) AS INT) AS gid
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
ORDER BY gid ASC, o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
"""

# --- multiple distinct aggregates -----------------------------------------


def agg_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("nd_parts"),
            F.countDistinct("l_suppkey").alias("nd_supps"),
            F.countDistinct("l_orderkey", "l_linenumber").alias("nd_lines"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("l_returnflag")
    )


AGG_MULTI_DISTINCT_SQL = """
SELECT l_returnflag,
       COUNT(DISTINCT l_partkey) AS nd_parts,
       COUNT(DISTINCT l_suppkey) AS nd_supps,
       COUNT(DISTINCT (l_orderkey, l_linenumber)) AS nd_lines,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

# --- variance / stddev family ---------------------------------------------


def agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """stddev/variance via exact decimal moments → one deterministic double
    expression per group (BuiltinsDb.java:1222-1279 family)."""
    li = read_table(spark, "lineitem", sf_dir)
    q = dec("l_quantity")  # DECIMAL(12,2), exact
    grouped = li.groupBy("l_returnflag").agg(
        F.sum(q).alias("_s1"),
        F.sum(q * q).alias("_s2"),
        F.count("l_quantity").alias("n"),
    )
    s1 = F.col("_s1").cast("double")
    s2 = F.col("_s2").cast("double")
    n = F.col("n").cast("double")
    var_pop = (s2 - s1 * s1 / n) / n
    var_samp = (s2 - s1 * s1 / n) / (n - 1)
    return grouped.select(
        "l_returnflag",
        F.col("n").alias("n"),
        var_pop.alias("var_pop_qty"),
        var_samp.alias("var_samp_qty"),
        F.sqrt(var_pop).alias("stddev_pop_qty"),
        F.sqrt(var_samp).alias("stddev_samp_qty"),
    ).orderBy("l_returnflag")


AGG_STATS_MOMENTS_SQL = """
WITH m AS (
  SELECT l_returnflag,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS _s1,
         SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS _s2,
         COUNT(l_quantity) AS n
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (CAST(_s2 AS DOUBLE) - CAST(_s1 AS DOUBLE) * CAST(_s1 AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) AS var_pop_qty,
       (CAST(_s2 AS DOUBLE) - CAST(_s1 AS DOUBLE) * CAST(_s1 AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS var_samp_qty,
       SQRT((CAST(_s2 AS DOUBLE) - CAST(_s1 AS DOUBLE) * CAST(_s1 AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) AS stddev_pop_qty,
       SQRT((CAST(_s2 AS DOUBLE) - CAST(_s1 AS DOUBLE) * CAST(_s1 AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)) AS stddev_samp_qty
FROM m ORDER BY l_returnflag
"""

# --- group_concat ----------------------------------------------------------


def agg_group_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """group_concat(expr, sep) (BuiltinsDb.java:1370-1381) — implemented as
    sorted collect_list + array_join; sorting pins the undefined order."""
    nation = read_table(spark, "nation", sf_dir)
    return (
        nation.groupBy("n_regionkey")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
        )
        .orderBy("n_regionkey")
    )


AGG_GROUP_CONCAT_SQL = """
SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
"""

# --- aggif ------------------------------------------------------------------


def agg_aggif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """aggif(predicate, expr) ≡ max(CASE WHEN p THEN x END)
    (BuiltinsDb.java:1188; SURVEY.md §2.5 rewrite)."""
    orders = read_table(spark, "orders", sf_dir)
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.max(
                F.when(F.col("o_orderpriority") == "1-URGENT", dec("o_totalprice"))
            )
            .cast("double")
            .alias("max_urgent_price"),
            F.min(
                F.when(F.col("o_orderpriority") == "5-LOW", dec("o_totalprice"))
            )
            .cast("double")
            .alias("min_low_price"),
        )
        .orderBy("o_orderstatus")
    )


AGG_AGGIF_SQL = """
SELECT o_orderstatus,
       CAST(MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS max_urgent_price,
       CAST(MIN(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS min_low_price
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""

# --- approximate aggregates (no SQL oracle: rows-only + unit-tested bounds) --


def agg_ndv_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ndv() → HyperLogLog approx_count_distinct (BuiltinsDb.java:1057;
    CountDistinctToNdvRule). Accuracy bound asserted in unit tests."""
    li = read_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.approx_count_distinct("l_partkey").alias("ndv_parts"),
            F.approx_count_distinct("l_orderkey").alias("ndv_orders"),
        )
        .orderBy("l_returnflag")
    )


def agg_appx_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """appx_median() → percentile_approx(x, 0.5) (BuiltinsDb.java:1030)."""
    orders = read_table(spark, "orders", sf_dir)
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.percentile_approx("o_totalprice", 0.5).alias("appx_median_price"),
            F.min("o_totalprice").alias("min_price"),
            F.max("o_totalprice").alias("max_price"),
        )
        .orderBy("o_orderstatus")
    )


def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (sort-based, linear interpolation) — the exact
    counterpart of appx_median; both engines implement the same
    percentile_cont definition so values are bit-identical."""
    li = read_table(spark, "lineitem", sf_dir)
    pct = F.expr("percentile(l_quantity, array(0.25, 0.5, 0.75))")
    return (
        li.groupBy("l_returnflag")
        .agg(
            pct.getItem(0).alias("p25"),
            pct.getItem(1).alias("p50"),
            pct.getItem(2).alias("p75"),
        )
        .orderBy("l_returnflag")
    )


AGG_PERCENTILES_SQL = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.25) AS p25,
       quantile_cont(l_quantity, 0.50) AS p50,
       quantile_cont(l_quantity, 0.75) AS p75
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


# --- pivot / unpivot --------------------------------------------------------


def agg_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide reshape: order counts and exact revenue by priority × status
    via the native pivot operator (the reference dialect emulates this with
    CASE-WHEN aggregation — fe/.../analysis/CaseExpr.java; Spark plans one
    partial+final hash agg, identical shuffle shape to a plain groupBy).
    Explicit pivot values keep the plan static (no driver-side distinct
    pre-pass), which is the 100 TB discipline."""
    orders = read_table(spark, "orders", sf_dir)
    piv = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(dec("o_totalprice")).alias("total"),
        )
    )
    return piv.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(f"{s}_n"), F.lit(0)).alias(f"n_{s.lower()}")
            for s in ("F", "O", "P")
        ],
        *[
            F.coalesce(F.col(f"{s}_total"), F.lit(0.0)).alias(
                f"total_{s.lower()}"
            )
            for s in ("F", "O", "P")
        ],
    ).orderBy("o_orderpriority")


AGG_PIVOT_STATUS_SQL = """
SELECT o_orderpriority,
       COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
       COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
       COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p,
       COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'F'
                         THEN CAST(o_totalprice AS DECIMAL(12,2)) END)
                     AS DOUBLE), 0.0) AS total_f,
       COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'O'
                         THEN CAST(o_totalprice AS DECIMAL(12,2)) END)
                     AS DOUBLE), 0.0) AS total_o,
       COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'P'
                         THEN CAST(o_totalprice AS DECIMAL(12,2)) END)
                     AS DOUBLE), 0.0) AS total_p
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def agg_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long reshape: stack the three lineitem money measures with the
    native unpivot operator, then aggregate per (returnflag, measure).
    Unpivot is a scan-side Expand (no pre-shuffle); only the 3× compact
    (flag, measure, decimal) rows reach the aggregation exchange."""
    li = read_table(spark, "lineitem", sf_dir)
    long = li.select(
        "l_returnflag",
        dec("l_quantity").alias("l_quantity"),
        dec("l_extendedprice").alias("l_extendedprice"),
        dec("l_discount").alias("l_discount"),
    ).unpivot(
        ids=["l_returnflag"],
        values=["l_quantity", "l_extendedprice", "l_discount"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return (
        long.groupBy("l_returnflag", "measure")
        .agg(dsum(F.col("val")).alias("total"), F.count("val").alias("n"))
        .orderBy("l_returnflag", "measure")
    )


AGG_UNPIVOT_MEASURES_SQL = """
SELECT l_returnflag, 'l_quantity' AS measure,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total,
       COUNT(l_quantity) AS n
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT l_returnflag, 'l_extendedprice' AS measure,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
       COUNT(l_extendedprice) AS n
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT l_returnflag, 'l_discount' AS measure,
       CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS total,
       COUNT(l_discount) AS n
FROM lineitem GROUP BY l_returnflag
ORDER BY l_returnflag, measure
"""


QUERIES: dict[str, tuple] = {
    "agg_percentiles": (agg_percentiles, AGG_PERCENTILES_SQL),
    "agg_pivot_status": (agg_pivot_status, AGG_PIVOT_STATUS_SQL),
    "agg_unpivot_measures": (agg_unpivot_measures, AGG_UNPIVOT_MEASURES_SQL),
    "agg_rollup": (agg_rollup, AGG_ROLLUP_SQL),
    "agg_cube": (agg_cube, AGG_CUBE_SQL),
    "agg_grouping_sets": (agg_grouping_sets, AGG_GROUPING_SETS_SQL),
    "agg_multi_distinct": (agg_multi_distinct, AGG_MULTI_DISTINCT_SQL),
    "agg_stats_moments": (agg_stats_moments, AGG_STATS_MOMENTS_SQL),
    "agg_group_concat": (agg_group_concat, AGG_GROUP_CONCAT_SQL),
    "agg_aggif": (agg_aggif, AGG_AGGIF_SQL),
    "agg_ndv_approx": (agg_ndv_approx, None),
    "agg_appx_median": (agg_appx_median, None),
}
