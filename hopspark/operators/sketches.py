"""DataSketches theta-sketch family — KMV (k-minimum-values) sketches built
entirely from JVM-side built-ins.

Reference parity:
  * ds_theta_sketch / ds_theta_union / ds_theta_estimate —
    fe/.../catalog/BuiltinsDb.java:1149-1170
  * ds_theta_intersect / ds_theta_exclude (A-not-B) scalar algebra —
    be/src/exprs/datasketches-functions-ir.cc
The reference wraps the Apache DataSketches library; a theta sketch in its
default configuration IS a KMV sample (the k smallest values of a uniform
hash, plus the threshold theta).  We re-derive that structure directly on
DataFrame ops so the whole algebra — union, intersect, difference, estimate
— stays inside whole-stage codegen (no UDF, no sketch-byte blobs).

Representation: `array<bigint>` of the k smallest distinct values of
`xxhash64(x) >>> 1` (uniform on [0, 2^63)), ascending.  theta = 1.0 while
the set holds fewer than k values (exact regime), else (kth value + 1)/2^63.
Estimators (standard KMV):
  estimate(S)        = |S|              if |S| < k   (exact)
                       (k-1)/theta      otherwise
  union(A,B)         = k smallest of A ∪ B  (re-truncated KMV — still a
                       valid sketch of the union)
  intersect/A\\B      = restrict both to h < min(thetaA, thetaB), then exact
                       set algebra on the samples, scaled by 1/theta.

Scale notes (100 TB): the expression form `theta_sketch_agg` holds
O(distinct) state per group until the final truncate — fine for single-group
or low-cardinality aggregations, wrong for hot groups.  The scale paths:
  * global (ungrouped): `theta_sketch_global` — distinct →
    TakeOrderedAndProject: each partition retains only its k smallest hashes
    and the driver merges ≤ k·partitions values.
  * grouped: `theta_sketch_grouped_agg` — two-phase KMV merge. Stage 1
    sketches per (group, input-partition), so no aggregation buffer ever
    holds more than one partition's distinct values, and only ≤k-element
    partial sketches cross the wire; stage 2 merges partials with a
    sort-based k-smallest (window row_number ≤ k), which spills to disk
    instead of materializing one giant in-memory set for hot groups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from hopspark.catalog import read_table

DEFAULT_K = 16384
_SPACE = float(2**63)


def _kmv_hash(c: Column) -> Column:
    """Uniform hash on [0, 2^63): xxhash64 with the sign bit shifted out."""
    return F.shiftrightunsigned(F.xxhash64(c), 1)


def theta_sketch_agg(c: Column, k: int = DEFAULT_K) -> Column:
    """Aggregate expression: KMV theta sketch of a column (ds_theta_sketch)."""
    return F.slice(F.array_sort(F.collect_set(_kmv_hash(c))), 1, k)


def theta_sketch_global(df: DataFrame, c: Column, k: int = DEFAULT_K) -> DataFrame:
    """Ungrouped sketch via the scale path: distinct hashes → global top-k
    ascending (TakeOrderedAndProject: per-partition heap of k, driver merge).
    Returns a 1-row DataFrame with column `sk`."""
    hashes = df.select(_kmv_hash(c).alias("h")).distinct().orderBy("h").limit(k)
    return hashes.agg(F.array_sort(F.collect_list("h")).alias("sk"))


def _theta_partials(
    df: DataFrame, group_cols: list[str], c: Column, k: int = DEFAULT_K
) -> DataFrame:
    """Stage 1 of the grouped scale path: one ≤k-element partial sketch per
    (group, input partition). The groupBy key includes spark_partition_id,
    so each aggregation buffer sees only one partition's values — state is
    bounded by the input split size, never by a group's global cardinality —
    and the exchange carries compact capped arrays."""
    return (
        df.select(*group_cols, _kmv_hash(c).alias("h"))
        .withColumn("_p", F.spark_partition_id())
        .groupBy(*group_cols, "_p")
        .agg(F.slice(F.array_sort(F.collect_set("h")), 1, k).alias("psk"))
    )


def theta_sketch_grouped_agg(
    df: DataFrame, group_cols: list[str], c: Column, k: int = DEFAULT_K
) -> DataFrame:
    """Grouped KMV theta sketch with bounded per-group state (the grouped
    ds_theta_sketch scale path): per-(group, partition) partials, then a
    sort-based merge — explode the partials, de-duplicate hashes, keep each
    group's k smallest via row_number (sort-backed, spills), and collect the
    ≤k survivors. The final groupBy reuses the window's partitioning, so the
    merge costs one exchange. Returns (group_cols..., sk)."""
    from pyspark.sql import Window as W

    partials = _theta_partials(df, group_cols, c, k)
    cand = partials.select(*group_cols, F.explode("psk").alias("h")).dropDuplicates(
        [*group_cols, "h"]
    )
    w = W.partitionBy(*group_cols).orderBy("h")
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy(*group_cols)
        .agg(F.array_sort(F.collect_list("h")).alias("sk"))
    )


def theta_value(sk: Column, k: int = DEFAULT_K) -> Column:
    """theta: fraction of hash space covered by the sketch's sample."""
    return F.when(F.size(sk) < k, F.lit(1.0)).otherwise(
        (F.element_at(sk, k) + F.lit(1)).cast("double") / F.lit(_SPACE)
    )


def theta_estimate(sk: Column, k: int = DEFAULT_K) -> Column:
    """ds_theta_estimate: distinct-count estimate; exact while |S| < k."""
    return F.when(F.size(sk) < k, F.size(sk).cast("double")).otherwise(
        F.lit(float(k - 1)) / theta_value(sk, k)
    )


def theta_union(a: Column, b: Column, k: int = DEFAULT_K) -> Column:
    """ds_theta_union: merged sketch (k smallest of the union)."""
    return F.slice(F.array_sort(F.array_distinct(F.concat(a, b))), 1, k)


def _cut(sk: Column, theta: Column) -> Column:
    """Restrict a sketch to hashes below a (possibly smaller) theta."""
    return F.filter(sk, lambda h: h.cast("double") < theta * F.lit(_SPACE))


def theta_intersect_estimate(a: Column, b: Column, k: int = DEFAULT_K) -> Column:
    """ds_theta_intersect + estimate: |A ∩ B| ≈ |cut(A) ∩ cut(B)| / theta."""
    th = F.least(theta_value(a, k), theta_value(b, k))
    return F.size(F.array_intersect(_cut(a, th), _cut(b, th))).cast("double") / th


def theta_except_estimate(a: Column, b: Column, k: int = DEFAULT_K) -> Column:
    """ds_theta_exclude (A-not-B) + estimate: |A \\ B| ≈ |cut(A) \\ cut(B)| / theta."""
    th = F.least(theta_value(a, k), theta_value(b, k))
    return F.size(F.array_except(_cut(a, th), _cut(b, th))).cast("double") / th


# --- driver-gate queries ----------------------------------------------------


def sketch_theta_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full theta algebra over two real key sets: A = BUILDING-segment
    customers, B = customers with an urgent order.  At the driver's scale
    factors every distinct count is below k, so the KMV estimators are in
    their exact regime and the whole algebra is oracle-checkable; at
    production scale the same plan degrades gracefully to (k-1)/theta
    approximation."""
    cust = read_table(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = read_table(spark, "orders", sf_dir).filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    a = cust.agg(theta_sketch_agg(F.col("c_custkey")).alias("a_sk"))
    b = orders.agg(theta_sketch_agg(F.col("o_custkey")).alias("b_sk"))
    both = a.crossJoin(b)
    ask, bsk = F.col("a_sk"), F.col("b_sk")
    return both.select(
        theta_estimate(ask).cast("bigint").alias("a_est"),
        theta_estimate(bsk).cast("bigint").alias("b_est"),
        theta_estimate(theta_union(ask, bsk)).cast("bigint").alias("union_est"),
        theta_intersect_estimate(ask, bsk).cast("bigint").alias("intersect_est"),
        theta_except_estimate(ask, bsk).cast("bigint").alias("a_not_b_est"),
    )


SKETCH_THETA_SET_ALGEBRA_SQL = """
WITH a AS (SELECT DISTINCT c_custkey AS k FROM customer
           WHERE c_mktsegment = 'BUILDING'),
     b AS (SELECT DISTINCT o_custkey AS k FROM orders
           WHERE o_orderpriority = '1-URGENT')
SELECT CAST((SELECT count(*) FROM a) AS BIGINT)                       AS a_est,
       CAST((SELECT count(*) FROM b) AS BIGINT)                       AS b_est,
       CAST((SELECT count(*) FROM (SELECT k FROM a UNION SELECT k FROM b))
            AS BIGINT)                                                AS union_est,
       CAST((SELECT count(*) FROM a WHERE k IN (SELECT k FROM b))
            AS BIGINT)                                                AS intersect_est,
       CAST((SELECT count(*) FROM a WHERE k NOT IN (SELECT k FROM b))
            AS BIGINT)                                                AS a_not_b_est
"""


def sketch_theta_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped theta sketches: per order priority, estimated distinct
    customers — the grouped-aggregation path of ds_theta_sketch, running
    the bounded two-phase merge (theta_sketch_grouped_agg)."""
    orders = read_table(spark, "orders", sf_dir)
    return (
        theta_sketch_grouped_agg(orders, ["o_orderpriority"], F.col("o_custkey"))
        .select(
            "o_orderpriority",
            theta_estimate(F.col("sk")).cast("bigint").alias("ndv_est"),
        )
        .orderBy("o_orderpriority")
    )


SKETCH_THETA_GROUPED_SQL = """
SELECT o_orderpriority,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS ndv_est
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


QUERIES: dict[str, tuple] = {
    "sketch_theta_set_algebra": (sketch_theta_set_algebra, SKETCH_THETA_SET_ALGEBRA_SQL),
    "sketch_theta_grouped": (sketch_theta_grouped, SKETCH_THETA_GROUPED_SQL),
}
