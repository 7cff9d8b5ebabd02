"""Relational operator coverage: every join mode, set operations,
sort/limit/offset, and subquery-rewrite patterns.

Reference parity targets:
  * join modes INNER/OUTER/SEMI/ANTI/NULL-AWARE-ANTI/CROSS —
    be/src/exec/join-op.h:27-56 (TJoinOp) and
    be/src/exec/partitioned-hash-join-node.h:94-166
  * nested-loop (theta) join — be/src/exec/nested-loop-join-node.h:48-54
  * UNION ALL / UNION DISTINCT — be/src/exec/union-node.h:88-96,
    fe/.../analysis/SetOperationStmt.java:54-98
  * INTERSECT/EXCEPT → semi/anti rewrite — SetOperationStmt.java:35-45
  * EXISTS/NOT EXISTS/IN/NOT IN rewrites — fe/.../analysis/StmtRewriter.java:424-533
  * TopN / limit+offset — be/src/exec/topn-node.h:120-177
  * SELECT node conjuncts — be/src/exec/select-node.h:53
  * EmptySet node — be/src/exec/empty-set-node.h:35

Scale notes: the semi/anti joins below shuffle only the join keys after
column pruning; dim-side joins broadcast. Cross/theta joins are constrained
to provably tiny inputs (region, supplier) — at 100 TB a cross join on
facts is a design error, and keeping the nested-loop path dimension-only
mirrors the reference's own use of it for non-equi predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hopspark.catalog import read_table
from hopspark.operators._util import dec, dsum, one_minus

# --- outer joins -----------------------------------------------------------


def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with their order counts, keeping order-less customers.
    (partitioned-hash-join LEFT OUTER — join-op.h)"""
    cust = read_table(spark, "customer", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left_outer")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dsum(dec("o_totalprice")).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


JOIN_LEFT_OUTER_SQL = """
SELECT c_custkey, c_name,
       COUNT(o_orderkey) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_spent
FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY c_custkey
"""


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of per-nation customer and supplier counts."""
    cust = (
        read_table(spark, "customer", sf_dir)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp = (
        read_table(spark, "supplier", sf_dir)
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return (
        cust.join(supp, cust.c_nationkey == supp.s_nationkey, "full_outer")
        .select(
            F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
            F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
            F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
        )
        .orderBy("nationkey")
    )


JOIN_FULL_OUTER_SQL = """
WITH c AS (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey),
     s AS (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey)
SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
       COALESCE(n_cust, 0) AS n_cust,
       COALESCE(n_supp, 0) AS n_supp
FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
ORDER BY nationkey
"""

# --- semi / anti / null-aware anti ----------------------------------------


def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS rewrite → LEFT SEMI (StmtRewriter.java:455-476): customers
    having at least one urgent order."""
    cust = read_table(spark, "customer", sf_dir)
    urgent = read_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        cust.join(urgent, cust.c_custkey == urgent.o_custkey, "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


JOIN_LEFT_SEMI_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
ORDER BY c_custkey
"""


def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS rewrite → LEFT ANTI: parts never shipped."""
    part = read_table(spark, "part", sf_dir)
    li = read_table(spark, "lineitem", sf_dir)
    return (
        part.join(li, part.p_partkey == li.l_partkey, "left_anti")
        .select("p_partkey", "p_name", "p_brand")
        .orderBy("p_partkey")
    )


JOIN_LEFT_ANTI_SQL = """
SELECT p_partkey, p_name, p_brand
FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
ORDER BY p_partkey
"""


def join_null_aware_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with a nullable subquery → NULL_AWARE_LEFT_ANTI_JOIN
    (join-op.h:44-56). The subquery's NULLs (customers with negative
    balance mapped to NULL) must make NOT IN yield no rows for them."""
    spark_df = read_table(spark, "customer", sf_dir)
    spark_df.createOrReplaceTempView("_naaj_customer")
    read_table(spark, "orders", sf_dir).createOrReplaceTempView("_naaj_orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey
        FROM _naaj_orders
        WHERE o_custkey NOT IN (
            SELECT CASE WHEN c_acctbal < 0 THEN CAST(NULL AS BIGINT) ELSE c_custkey END
            FROM _naaj_customer WHERE c_mktsegment = 'BUILDING'
        )
        ORDER BY o_orderkey
        """
    )


JOIN_NULL_AWARE_ANTI_SQL = """
SELECT o_orderkey, o_custkey
FROM orders
WHERE o_custkey NOT IN (
    SELECT CASE WHEN c_acctbal < 0 THEN CAST(NULL AS BIGINT) ELSE c_custkey END
    FROM customer WHERE c_mktsegment = 'BUILDING'
)
ORDER BY o_orderkey
"""

# --- cross / theta (nested-loop) ------------------------------------------


def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSS JOIN of two tiny dims (nested-loop-join-node.h)."""
    region = read_table(spark, "region", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    return (
        region.crossJoin(nation)
        .select("r_name", "n_name")
        .orderBy("r_name", "n_name")
    )


JOIN_CROSS_SQL = """
SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name
"""


def join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi join: for each supplier, how many suppliers hold a strictly
    smaller balance (BroadcastNestedLoopJoin — the Spark twin of
    nested-loop-join-node.h)."""
    s1 = read_table(spark, "supplier", sf_dir).alias("s1")
    s2 = read_table(spark, "supplier", sf_dir).alias("s2")
    return (
        s1.join(s2, F.col("s1.s_acctbal") > F.col("s2.s_acctbal"), "left_outer")
        .groupBy(F.col("s1.s_suppkey").alias("s_suppkey"))
        .agg(F.count(F.col("s2.s_suppkey")).alias("n_poorer"))
        .orderBy("s_suppkey")
    )


JOIN_THETA_SQL = """
SELECT s1.s_suppkey AS s_suppkey, COUNT(s2.s_suppkey) AS n_poorer
FROM supplier s1 LEFT OUTER JOIN supplier s2 ON s1.s_acctbal > s2.s_acctbal
GROUP BY s1.s_suppkey
ORDER BY s_suppkey
"""

# --- set operations --------------------------------------------------------


def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL pass-through (union-node.h:88-96)."""
    cust = read_table(spark, "customer", sf_dir).select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = read_table(spark, "supplier", sf_dir).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return (
        cust.unionByName(supp)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("nationkey")
    )


SETOP_UNION_ALL_SQL = """
SELECT nationkey, COUNT(*) AS n FROM (
  SELECT c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT s_nationkey AS nationkey FROM supplier
) GROUP BY nationkey ORDER BY nationkey
"""


def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = read_table(spark, "customer", sf_dir).select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = read_table(spark, "supplier", sf_dir).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.unionByName(supp).distinct().orderBy("nationkey")


SETOP_UNION_DISTINCT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics — SetOperationStmt.java:35-45 rewrites
    to LEFT SEMI + distinct; Spark's intersect() is the same rewrite)."""
    cust = read_table(spark, "customer", sf_dir).select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = read_table(spark, "supplier", sf_dir).select(
        F.col("s_nationkey").alias("nationkey")
    )
    return cust.intersect(supp).orderBy("nationkey")


SETOP_INTERSECT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT/MINUS (distinct semantics → LEFT ANTI + distinct)."""
    cust = read_table(spark, "customer", sf_dir).select(
        F.col("c_nationkey").alias("nationkey")
    )
    supp = read_table(spark, "supplier", sf_dir).select(
        F.col("s_nationkey").alias("nationkey")
    )
    # subtract == EXCEPT DISTINCT (a row present in both sides is removed
    # entirely; exceptAll().distinct() would wrongly keep surplus copies).
    return cust.subtract(supp).orderBy("nationkey")


SETOP_EXCEPT_SQL = """
SELECT c_nationkey AS nationkey FROM customer
EXCEPT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""

# --- sort / limit / offset / empty-set ------------------------------------


def sort_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY … LIMIT … OFFSET (topn-node.h; grammar KW_OFFSET)."""
    orders = read_table(spark, "orders", sf_dir)
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(10)
        .limit(15)
    )


SORT_LIMIT_OFFSET_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 15 OFFSET 10
"""


def sort_nulls_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impala default NULL ordering: ASC ⇒ NULLS LAST, DESC ⇒ NULLS FIRST
    (OrderByElement.java:115-117) — explicit here, and injected by the
    dialect layer for SQL."""
    cust = read_table(spark, "customer", sf_dir)
    with_nulls = cust.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_acctbal")).alias(
            "bal"
        ),
    )
    return with_nulls.orderBy(
        F.col("bal").asc_nulls_last(), F.col("c_custkey").asc()
    ).limit(200)


SORT_NULLS_ORDERING_SQL = """
SELECT c_custkey, CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
FROM customer
ORDER BY bal ASC NULLS LAST, c_custkey ASC
LIMIT 200
"""


def empty_set(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WHERE FALSE → constant-empty relation (empty-set-node.h:35);
    Catalyst folds it to LocalRelation <empty>."""
    li = read_table(spark, "lineitem", sf_dir)
    return li.filter(F.lit(False)).select("l_orderkey", "l_partkey")


EMPTY_SET_SQL = "SELECT l_orderkey, l_partkey FROM lineitem WHERE FALSE"


def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER (TJoinOp RIGHT_OUTER_JOIN, join-op.h:27-56): all
    nations, with supplier counts where present."""
    supp = read_table(spark, "supplier", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    return (
        supp.join(nation, supp.s_nationkey == nation.n_nationkey, "right_outer")
        .groupBy("n_nationkey", "n_name")
        .agg(F.count("s_suppkey").alias("n_supp"))
        .orderBy("n_nationkey")
    )


JOIN_RIGHT_OUTER_SQL = """
SELECT n_nationkey, n_name, COUNT(s_suppkey) AS n_supp
FROM supplier RIGHT OUTER JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_nationkey, n_name
ORDER BY n_nationkey
"""


def join_right_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT SEMI (reference join-op.h RIGHT_SEMI_JOIN): nations that have
    at least one supplier — build side emits."""
    supp = read_table(spark, "supplier", sf_dir)
    nation = read_table(spark, "nation", sf_dir)
    return (
        nation.join(supp, nation.n_nationkey == supp.s_nationkey, "left_semi")
        .select("n_nationkey", "n_name")
        .orderBy("n_nationkey")
    )


JOIN_RIGHT_SEMI_SQL = """
SELECT n_nationkey, n_name
FROM nation n
WHERE EXISTS (SELECT 1 FROM supplier s WHERE s.s_nationkey = n.n_nationkey)
ORDER BY n_nationkey
"""


QUERIES: dict[str, tuple] = {
    "join_left_outer": (join_left_outer, JOIN_LEFT_OUTER_SQL),
    "join_right_outer": (join_right_outer, JOIN_RIGHT_OUTER_SQL),
    "join_right_semi": (join_right_semi, JOIN_RIGHT_SEMI_SQL),
    "join_full_outer": (join_full_outer, JOIN_FULL_OUTER_SQL),
    "join_left_semi_exists": (join_left_semi, JOIN_LEFT_SEMI_SQL),
    "join_left_anti_not_exists": (join_left_anti, JOIN_LEFT_ANTI_SQL),
    "join_null_aware_anti_not_in": (join_null_aware_anti, JOIN_NULL_AWARE_ANTI_SQL),
    "join_cross": (join_cross, JOIN_CROSS_SQL),
    "join_theta_nested_loop": (join_theta, JOIN_THETA_SQL),
    "setop_union_all": (setop_union_all, SETOP_UNION_ALL_SQL),
    "setop_union_distinct": (setop_union_distinct, SETOP_UNION_DISTINCT_SQL),
    "setop_intersect": (setop_intersect, SETOP_INTERSECT_SQL),
    "setop_except": (setop_except, SETOP_EXCEPT_SQL),
    "sort_limit_offset": (sort_limit_offset, SORT_LIMIT_OFFSET_SQL),
    "sort_nulls_ordering": (sort_nulls_ordering, SORT_NULLS_ORDERING_SQL),
    "empty_set": (empty_set, EMPTY_SET_SQL),
}
