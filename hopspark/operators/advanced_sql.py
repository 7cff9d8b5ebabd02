"""Advanced SQL surface: recursive CTEs, LATERAL joins, UNPIVOT (round 5).

Spark 4 adds WITH RECURSIVE (SPARK-24497), LATERAL subqueries, and the
UNPIVOT relation — surfaces the reference exposes through its planner
(fe/src/main/java/org/apache/impala/analysis: WITH-clause and lateral-view
analysis; the reference has no recursive CTE, so those two queries are an
engine extension, while UNPIVOT mirrors the dialect's PIVOT inverse).

Scale notes (100 TB): the recursive queries iterate over BOUNDED spines
(12 months; depth-capped closure over a 25-node edge set) — recursion
never touches fact-table cardinality, facts join the spine AFTER it is
materialized. The LATERAL top-k is the index-nested-loop formulation of
partitioned TOP-N: per-group limit pushed into the lateral subquery, an
alternative physical strategy to the WindowGroupLimit the analytic
operators lock. UNPIVOT is a zero-shuffle projection (Expand node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hopspark.catalog import read_table


def _register(spark: SparkSession, sf_dir: str, *tables: str) -> None:
    for t in tables:
        read_table(spark, t, sf_dir).createOrReplaceTempView(t)


# ---------------------------------------------------------------------------
# Recursive month spine + gap-filled monthly revenue: the recursion builds
# the 12-month dimension, facts LEFT JOIN onto it so empty months surface
# with zero revenue (the classic gap-fill a bare GROUP BY cannot produce).
# ---------------------------------------------------------------------------


def recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir, "orders")
    return spark.sql("""
WITH RECURSIVE months(mo) AS (
  SELECT 1
  UNION ALL
  SELECT mo + 1 FROM months WHERE mo < 12
),
rev AS (
  SELECT month(o_orderdate) AS mo,
         SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS r
  FROM orders
  WHERE year(o_orderdate) = 1997
  GROUP BY 1
)
SELECT m.mo,
       CAST(COALESCE(r, 0) AS DOUBLE) AS revenue,
       (r IS NULL) AS is_gap
FROM months m LEFT JOIN rev ON rev.mo = m.mo
ORDER BY m.mo
""")


RECURSIVE_MONTH_SPINE_SQL = """
WITH RECURSIVE months(mo) AS (
  SELECT 1
  UNION ALL
  SELECT mo + 1 FROM months WHERE mo < 12
),
rev AS (
  SELECT month(o_orderdate) AS mo,
         SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS r
  FROM orders
  WHERE year(o_orderdate) = 1997
  GROUP BY 1
)
SELECT CAST(m.mo AS INT) AS mo,
       CAST(COALESCE(r, 0) AS DOUBLE) AS revenue,
       (r IS NULL) AS is_gap
FROM months m LEFT JOIN rev ON rev.mo = m.mo
ORDER BY m.mo
"""


# ---------------------------------------------------------------------------
# Recursive transitive closure, depth-bounded: reachability over a small
# derived edge set (nation -> next nation inside the same region). The
# recursion runs over the 25-row dim; depth is capped so the UNION ALL
# recursion terminates without cycle detection.
# ---------------------------------------------------------------------------

_CLOSURE_SQL_BODY = """
WITH RECURSIVE
edges AS (
  SELECT a.n_nationkey AS src, MIN(b.n_nationkey) AS dst
  FROM nation a JOIN nation b
    ON a.n_regionkey = b.n_regionkey AND b.n_nationkey > a.n_nationkey
  GROUP BY a.n_nationkey
),
reach(src, node, depth) AS (
  SELECT src, dst, 1 FROM edges
  UNION ALL
  SELECT r.src, e.dst, r.depth + 1
  FROM reach r JOIN edges e ON e.src = r.node
  WHERE r.depth < 6
)
SELECT src, CAST(COUNT(*) AS BIGINT) AS n_reachable,
       CAST(MAX(depth) AS INT) AS max_depth
FROM reach
GROUP BY src
ORDER BY src
"""


def recursive_region_closure(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir, "nation")
    return spark.sql(_CLOSURE_SQL_BODY)


RECURSIVE_REGION_CLOSURE_SQL = _CLOSURE_SQL_BODY


# ---------------------------------------------------------------------------
# LATERAL top-k per group: for each region, the top-2 customers by account
# balance among its nations — per-group LIMIT inside the lateral subquery,
# the join-pushdown alternative to a rank() window.
# ---------------------------------------------------------------------------


def lateral_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir, "region", "nation", "customer")
    return spark.sql("""
SELECT r.r_name, x.c_name, x.bal
FROM region r,
LATERAL (
  SELECT c.c_name, CAST(c.c_acctbal AS DOUBLE) AS bal
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE n.n_regionkey = r.r_regionkey
  ORDER BY c.c_acctbal DESC, c.c_name
  LIMIT 2
) x
ORDER BY r.r_name, x.bal DESC, x.c_name
""")


LATERAL_TOPK_SQL = """
SELECT r.r_name, x.c_name, x.bal
FROM region r,
LATERAL (
  SELECT c.c_name, CAST(c.c_acctbal AS DOUBLE) AS bal
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE n.n_regionkey = r.r_regionkey
  ORDER BY c.c_acctbal DESC, c.c_name
  LIMIT 2
) x
ORDER BY r.r_name, x.bal DESC, x.c_name
"""


# ---------------------------------------------------------------------------
# UNPIVOT: status-count matrix to long form — the inverse of the dialect's
# PIVOT rewrite; oracle restates it as a UNION ALL (engine-neutral form).
# ---------------------------------------------------------------------------


def unpivot_status_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    _register(spark, sf_dir, "orders")
    return spark.sql("""
WITH wide AS (
  SELECT year(o_orderdate) AS yr,
         CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_cnt,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_cnt,
         CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS partial_cnt
  FROM orders GROUP BY 1
)
SELECT yr, status, cnt
FROM wide UNPIVOT (cnt FOR status IN (
  open_cnt AS O, finished_cnt AS F, partial_cnt AS P))
ORDER BY yr, status
""")


UNPIVOT_STATUS_SQL = """
WITH wide AS (
  SELECT year(o_orderdate) AS yr,
         CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS open_cnt,
         CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS finished_cnt,
         CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS partial_cnt
  FROM orders GROUP BY 1
)
SELECT yr, 'O' AS status, open_cnt AS cnt FROM wide
UNION ALL SELECT yr, 'F', finished_cnt FROM wide
UNION ALL SELECT yr, 'P', partial_cnt FROM wide
ORDER BY yr, status
"""


QUERIES: dict[str, tuple] = {
    "recursive_month_spine": (
        recursive_month_spine, RECURSIVE_MONTH_SPINE_SQL),
    "recursive_region_closure": (
        recursive_region_closure, RECURSIVE_REGION_CLOSURE_SQL),
    "lateral_topk_per_group": (
        lateral_topk_per_group, LATERAL_TOPK_SQL),
    "unpivot_status_long": (
        unpivot_status_long, UNPIVOT_STATUS_SQL),
}
