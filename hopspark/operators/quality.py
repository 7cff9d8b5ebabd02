"""Data-quality audit operators (extension beyond the reference — the
validation pass every large-scale training-data ingest runs before a
corpus is admitted).

Scale design (100 TB thinking):
  * column profile — ONE aggregation pass over the table; the multi-
    DISTINCT is the standard Expand-based plan (partial per-partition
    distinct collapse before the shuffle), and only (column-value, tag)
    pairs shuffle, never whole rows.
  * referential orphans — left-anti joins on compact keys; the dimension
    side (orders keys / customer keys) broadcasts under AQE when small,
    otherwise shuffles key-only projections.
  * value bounds — pure conditional counts folded into one scan;
    whole-stage codegen, no shuffle beyond the final 1-row reduce.
  * duplicate rate — reuses the exact-dedup fingerprint (16-byte md5);
    only (source, fingerprint) shuffles.

Conditional counts use count(CASE WHEN ...) rather than SUM of casts so
the Spark (BIGINT) and DuckDB (which returns HUGEINT for SUM of ints)
result types agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hopspark.catalog import read_table

# --- column null/distinct profile ------------------------------------------

_PROFILE_COLS = [
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
]


def dq_null_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column profile of `orders`: row count, nulls, null fraction,
    exact distinct count — the schema-drift / completeness audit.

    One aggregation computes every metric (single scan); the wide 1-row
    result is then unpivoted driver-side with `stack`, so table size never
    meets the unpivot."""
    orders = read_table(spark, "orders", sf_dir)
    aggs = [F.count(F.lit(1)).alias("n")]
    for c in _PROFILE_COLS:
        aggs.append(F.count(c).alias(f"nn_{c}"))
        aggs.append(F.countDistinct(c).alias(f"nd_{c}"))
    row = orders.agg(*aggs)
    stack_args = ", ".join(f"'{c}', nn_{c}, nd_{c}" for c in _PROFILE_COLS)
    return (
        row.select(
            "n",
            F.expr(
                f"stack({len(_PROFILE_COLS)}, {stack_args}) "
                "AS (column_name, n_not_null, n_distinct)"
            ),
        )
        .select(
            "column_name",
            F.col("n").alias("n_rows"),
            (F.col("n") - F.col("n_not_null")).alias("n_null"),
            F.round(
                (F.col("n") - F.col("n_not_null")).cast("double") / F.col("n"), 6
            ).alias("null_frac"),
            "n_distinct",
        )
        .orderBy("column_name")
    )


def _profile_branch(c: str) -> str:
    return f"""
SELECT '{c}' AS column_name,
       COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_null,
       ROUND(CAST(COUNT(*) - COUNT({c}) AS DOUBLE) / COUNT(*), 6) AS null_frac,
       COUNT(DISTINCT {c}) AS n_distinct
FROM orders"""


DQ_NULL_PROFILE_SQL = (
    "\nUNION ALL".join(_profile_branch(c) for c in _PROFILE_COLS)
    + "\nORDER BY column_name"
)

# --- referential integrity -------------------------------------------------


def dq_referential_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan-row audit: lineitems whose order is missing and orders whose
    customer is missing, as left-anti joins on key-only projections."""
    li = read_table(spark, "lineitem", sf_dir)
    orders = read_table(spark, "orders", sf_dir)
    customer = read_table(spark, "customer", sf_dir)
    a = (
        li.select("l_orderkey")
        .join(
            orders.select("o_orderkey"),
            F.col("l_orderkey") == F.col("o_orderkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_orphans"))
        .select(F.lit("lineitem_without_order").alias("check_name"), "n_orphans")
    )
    b = (
        orders.select("o_custkey")
        .join(
            customer.select("c_custkey"),
            F.col("o_custkey") == F.col("c_custkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("n_orphans"))
        .select(F.lit("order_without_customer").alias("check_name"), "n_orphans")
    )
    return a.unionByName(b).orderBy("check_name")


DQ_REFERENTIAL_ORPHANS_SQL = """
SELECT 'lineitem_without_order' AS check_name, COUNT(*) AS n_orphans
FROM lineitem l
WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
UNION ALL
SELECT 'order_without_customer' AS check_name, COUNT(*) AS n_orphans
FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
ORDER BY check_name
"""

# --- value-range constraint checks -----------------------------------------


def dq_value_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint-violation counts over lineitem in one scan: non-positive
    quantities, discounts outside [0, 1], negative tax, ship dates outside
    the schema's era. count(CASE) keeps types BIGINT in both engines."""
    li = read_table(spark, "lineitem", sf_dir)
    lo = F.lit("1992-01-01").cast("timestamp")
    hi = F.lit("1999-01-01").cast("timestamp")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("l_quantity") <= 0, 1)).alias("qty_nonpositive"),
        F.count(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1)
        ).alias("discount_out_of_range"),
        F.count(F.when(F.col("l_tax") < 0, 1)).alias("tax_negative"),
        F.count(
            F.when((F.col("l_shipdate") < lo) | (F.col("l_shipdate") >= hi), 1)
        ).alias("shipdate_out_of_era"),
    )


DQ_VALUE_BOUNDS_SQL = """
SELECT COUNT(*) AS n_rows,
       COUNT(CASE WHEN l_quantity <= 0 THEN 1 END) AS qty_nonpositive,
       COUNT(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 END)
         AS discount_out_of_range,
       COUNT(CASE WHEN l_tax < 0 THEN 1 END) AS tax_negative,
       COUNT(CASE WHEN l_shipdate < TIMESTAMP '1992-01-01'
                    OR l_shipdate >= TIMESTAMP '1999-01-01' THEN 1 END)
         AS shipdate_out_of_era
FROM lineitem
"""

# --- duplicate-rate audit --------------------------------------------------


def dq_duplicate_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source duplicate rate of the documents corpus using the exact-
    dedup fingerprint (md5 of whitespace-normalized lowercased text); only
    (source, 16-byte fingerprint) shuffles."""
    docs = read_table(spark, "documents", sf_dir)
    fp = F.md5(F.lower(F.regexp_replace(F.col("text"), r"\s+", " ")))
    return (
        docs.select("source", fp.alias("fp"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_unique"),
        )
        .select(
            "source",
            "n_docs",
            "n_unique",
            F.round(
                (F.col("n_docs") - F.col("n_unique")).cast("double")
                / F.col("n_docs"),
                6,
            ).alias("dup_frac"),
        )
        .orderBy("source")
    )


DQ_DUPLICATE_RATE_SQL = r"""
SELECT source,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT md5(lower(regexp_replace(text, '\s+', ' ', 'g')))) AS n_unique,
       ROUND(CAST(COUNT(*) - COUNT(DISTINCT md5(lower(regexp_replace(text, '\s+', ' ', 'g'))))
                  AS DOUBLE) / COUNT(*), 6) AS dup_frac
FROM documents
GROUP BY source
ORDER BY source
"""


# --- Benford first-digit audit -------------------------------------------------


def dq_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals vs the Benford
    expectation log10(1 + 1/d) — the classic bulk-data fabrication /
    corruption screen.  One scan, map-side-combinable 9-group aggregate;
    the deviation column is rounded so the comparison is engine-stable.

    The first digit comes from the decimal rendering of the exact integer
    cent count (o_totalprice is a 2-dp money value > 1): no float
    formatting or log10 in the digit path, so both engines produce the
    identical digit for every row."""
    orders = read_table(spark, "orders", sf_dir)
    cents = F.round(F.col("o_totalprice").cast("double") * 100, 0).cast("bigint")
    d = F.substring(cents.cast("string"), 1, 1).cast("int")
    counts = (
        orders.select(d.alias("digit"))
        .where(F.col("digit").isNotNull())
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # total via a 1-row aggregate joined back — one plan, no driver action
    total = orders.agg(F.count(F.lit(1)).alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "digit",
            "n",
            F.round(
                F.col("n").cast("double") / F.col("total").cast("double"), 6
            ).alias("observed"),
            F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford"),
        )
        .orderBy("digit")
    )


DQ_BENFORD_SQL = r"""
WITH d AS (
  SELECT CAST(substr(CAST(CAST(ROUND(CAST(o_totalprice AS DOUBLE) * 100, 0)
                               AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders
),
t AS (SELECT COUNT(*) AS total FROM orders)
SELECT digit, COUNT(*) AS n,
       ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT CAST(total AS DOUBLE) FROM t), 6)
         AS observed,
       ROUND(LOG10(1.0 + 1.0 / digit), 6) AS benford
FROM d WHERE digit IS NOT NULL
GROUP BY digit ORDER BY digit
"""


# --- Two-sample KS drift audit --------------------------------------------------


def dq_ks_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the even- and
    odd-orderkey halves of order totals — the distribution-drift screen a
    pipeline runs between ingest batches.  Exact D = max |F_a(v) − F_b(v)|
    over the pooled DISTINCT values; per-value cumulative counts are
    integers, so the only float is the final normalized difference
    (rounded).  The drift flag compares D to the α=0.05 critical value
    c(α)·√((n_a+n_b)/(n_a·n_b)).

    Scale note: the cumulative window runs over DISTINCT measure values
    (a bounded money grid here, ~cents resolution), not rows; for an
    unbounded-domain measure the same shape runs over width_bucket bins."""
    orders = read_table(spark, "orders", sf_dir)
    from pyspark.sql import Window as W

    tagged = orders.select(
        F.col("o_totalprice").alias("v"),
        (F.col("o_orderkey") % 2 == 0).cast("int").alias("is_a"),
    )
    per_v = tagged.groupBy("v").agg(
        F.sum("is_a").alias("na_v"),
        F.sum(1 - F.col("is_a")).alias("nb_v"),
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = per_v.select(
        "v",
        F.sum("na_v").over(w).alias("ca"),
        F.sum("nb_v").over(w).alias("cb"),
    )
    totals = tagged.agg(
        F.sum("is_a").alias("n_a"), F.sum(1 - F.col("is_a")).alias("n_b")
    )
    diffs = cum.crossJoin(F.broadcast(totals)).select(
        "n_a",
        "n_b",
        F.abs(
            F.col("ca").cast("double") / F.col("n_a")
            - F.col("cb").cast("double") / F.col("n_b")
        ).alias("d"),
    )
    return (
        diffs.groupBy("n_a", "n_b")
        .agg(F.round(F.max("d"), 6).alias("ks_d"))
        .select(
            "n_a",
            "n_b",
            "ks_d",
            (
                F.col("ks_d")
                > 1.358
                * F.sqrt(
                    (F.col("n_a") + F.col("n_b")).cast("double")
                    / (F.col("n_a") * F.col("n_b")).cast("double")
                )
            ).alias("drifted"),
        )
    )


DQ_KS_DRIFT_SQL = """
WITH tagged AS (
  SELECT o_totalprice AS v,
         CAST(o_orderkey % 2 = 0 AS INT) AS is_a
  FROM orders
),
per_v AS (
  SELECT v, SUM(is_a) AS na_v, SUM(1 - is_a) AS nb_v
  FROM tagged GROUP BY v
),
cum AS (
  SELECT v,
         SUM(na_v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
         SUM(nb_v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb
  FROM per_v
),
totals AS (
  SELECT CAST(SUM(is_a) AS BIGINT) AS n_a,
         CAST(SUM(1 - is_a) AS BIGINT) AS n_b
  FROM tagged
)
SELECT n_a, n_b,
       ROUND(MAX(ABS(CAST(ca AS DOUBLE) / n_a - CAST(cb AS DOUBLE) / n_b)), 6)
         AS ks_d,
       ROUND(MAX(ABS(CAST(ca AS DOUBLE) / n_a - CAST(cb AS DOUBLE) / n_b)), 6)
         > 1.358 * SQRT(CAST(n_a + n_b AS DOUBLE) / CAST(n_a * n_b AS DOUBLE))
         AS drifted
FROM cum, totals
GROUP BY n_a, n_b
"""


def dq_ks_drift_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The width_bucket variant of the KS drift screen — the scale path
    promised in dq_ks_distribution_drift's note: for an unbounded-domain
    measure the pooled-DISTINCT-value grid grows with the data, so the
    cumulative window instead runs over a FIXED 512-bin width_bucket
    histogram — state bounded by bin count forever, at the cost of D
    becoming a lower bound of the exact statistic (error <= max bin
    probability mass; raise the bin count for finer resolution — the
    window stays trivially small at 10x bins too).

    Engine-parity note: Spark's width_bucket computes
    floor((v - lo) / ((hi - lo) / nb)) + 1 with v >= hi -> nb+1 and
    v < lo -> 0; the oracle replicates that arithmetic verbatim (same IEEE
    op order) so boundary values bin identically in both engines."""
    orders = read_table(spark, "orders", sf_dir)
    from pyspark.sql import Window as W

    tagged = orders.select(
        F.col("o_totalprice").cast("double").alias("v"),
        (F.col("o_orderkey") % 2 == 0).cast("int").alias("is_a"),
    )
    rng = tagged.agg(F.min("v").alias("lo"), F.max("v").alias("hi"))
    binned = tagged.crossJoin(F.broadcast(rng)).select(
        F.width_bucket("v", "lo", "hi", F.lit(512)).alias("bucket"),
        "is_a",
    )
    per_b = binned.groupBy("bucket").agg(
        F.sum("is_a").alias("na_v"),
        F.sum(1 - F.col("is_a")).alias("nb_v"),
    )
    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, W.currentRow)
    cum = per_b.select(
        F.sum("na_v").over(w).alias("ca"),
        F.sum("nb_v").over(w).alias("cb"),
    )
    totals = tagged.agg(
        F.sum("is_a").alias("n_a"), F.sum(1 - F.col("is_a")).alias("n_b")
    )
    diffs = cum.crossJoin(F.broadcast(totals)).select(
        "n_a",
        "n_b",
        F.abs(
            F.col("ca").cast("double") / F.col("n_a")
            - F.col("cb").cast("double") / F.col("n_b")
        ).alias("d"),
    )
    return (
        diffs.groupBy("n_a", "n_b")
        .agg(F.round(F.max("d"), 6).alias("ks_d"))
        .select(
            "n_a",
            "n_b",
            F.lit(512).alias("n_bins"),
            "ks_d",
            (
                F.col("ks_d")
                > 1.358
                * F.sqrt(
                    (F.col("n_a") + F.col("n_b")).cast("double")
                    / (F.col("n_a") * F.col("n_b")).cast("double")
                )
            ).alias("drifted"),
        )
    )


DQ_KS_BUCKETED_SQL = """
WITH tagged AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS v,
         CAST(o_orderkey % 2 = 0 AS INT) AS is_a
  FROM orders
),
rng AS (SELECT MIN(v) AS lo, MAX(v) AS hi FROM tagged),
binned AS (
  SELECT CASE WHEN v >= hi THEN 513
              WHEN v < lo THEN 0
              ELSE CAST(FLOOR((v - lo) / ((hi - lo) / 512)) AS BIGINT) + 1
         END AS bucket,
         is_a
  FROM tagged, rng
),
per_b AS (
  SELECT bucket, SUM(is_a) AS na_v, SUM(1 - is_a) AS nb_v
  FROM binned GROUP BY bucket
),
cum AS (
  SELECT SUM(na_v) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS ca,
         SUM(nb_v) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cb
  FROM per_b
),
totals AS (
  SELECT CAST(SUM(is_a) AS BIGINT) AS n_a,
         CAST(SUM(1 - is_a) AS BIGINT) AS n_b
  FROM tagged
)
SELECT n_a, n_b, 512 AS n_bins,
       ROUND(MAX(ABS(CAST(ca AS DOUBLE) / n_a - CAST(cb AS DOUBLE) / n_b)), 6)
         AS ks_d,
       ROUND(MAX(ABS(CAST(ca AS DOUBLE) / n_a - CAST(cb AS DOUBLE) / n_b)), 6)
         > 1.358 * SQRT(CAST(n_a + n_b AS DOUBLE) / CAST(n_a * n_b AS DOUBLE))
         AS drifted
FROM cum, totals
GROUP BY n_a, n_b
"""


QUERIES: dict[str, tuple] = {
    "dq_null_profile": (dq_null_profile, DQ_NULL_PROFILE_SQL),
    "dq_ks_distribution_drift": (dq_ks_distribution_drift, DQ_KS_DRIFT_SQL),
    "dq_ks_drift_bucketed": (dq_ks_drift_bucketed, DQ_KS_BUCKETED_SQL),
    "dq_benford_first_digit": (dq_benford_first_digit, DQ_BENFORD_SQL),
    "dq_referential_orphans": (dq_referential_orphans, DQ_REFERENTIAL_ORPHANS_SQL),
    "dq_value_bounds": (dq_value_bounds, DQ_VALUE_BOUNDS_SQL),
    "dq_duplicate_rate": (dq_duplicate_rate, DQ_DUPLICATE_RATE_SQL),
}
