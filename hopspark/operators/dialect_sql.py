"""Driver-gate queries that enter through the Impala-dialect SQL front door
(`Engine.sql`) rather than the DataFrame API — exercising the translation
layer (hopspark/dialect/translate.py) end-to-end: ILIKE, Impala NULL-ordering
defaults, interval-arithmetic functions, and function-name rewrites
(reference grammar: fe/src/main/cup/sql-parser.cup)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from hopspark.engine import Engine


def _engine(spark: SparkSession, sf_dir: str) -> Engine:
    return Engine(spark=spark, sf_dir=sf_dir, register_tables=True)


def dialect_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ILIKE + interval arithmetic + isnull/zeroifnull rewrites, in one
    Impala-dialect statement."""
    return _engine(spark, sf_dir).sql(
        """
        SELECT p_brand,
               COUNT(*) AS n_parts,
               SUM(CAST(isnull(p_size, 0) AS BIGINT)) AS size_sum
        FROM part
        WHERE p_type ILIKE '%econ%'
           OR p_name ILIKE '%WIDGET%'
        GROUP BY p_brand
        ORDER BY p_brand
        """
    )


DIALECT_FILTERS_SQL = """
SELECT p_brand, COUNT(*) AS n_parts,
       CAST(SUM(COALESCE(p_size, 0)) AS BIGINT) AS size_sum
FROM part
WHERE p_type ILIKE '%econ%' OR p_name ILIKE '%WIDGET%'
GROUP BY p_brand
ORDER BY p_brand
"""


def dialect_interval_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impala interval functions and INTERVAL-form date_add through the
    translator; compared against DuckDB's native interval algebra."""
    return _engine(spark, sf_dir).sql(
        """
        SELECT o_orderkey,
               years_add(o_orderdate, 1)  AS plus_year,
               date_add(o_orderdate, INTERVAL 3 days) AS plus_days,
               months_sub(o_orderdate, 2) AS minus_months
        FROM orders
        WHERE o_orderkey <= 100
        ORDER BY o_orderkey
        """
    )


# months_sub carries the reference's keep-last-day contract (AddMonths
# keep_max_day=true, timestamp-functions-ir.cc:619-647): last day in →
# last day of the target month out. The oracle spells the CASE explicitly.
DIALECT_INTERVAL_SQL = """
SELECT o_orderkey,
       o_orderdate + INTERVAL 1 YEAR   AS plus_year,
       o_orderdate + INTERVAL 3 DAY    AS plus_days,
       CASE WHEN o_orderdate = CAST(last_day(o_orderdate) AS TIMESTAMP)
            THEN CAST(last_day(o_orderdate - INTERVAL 2 MONTH) AS TIMESTAMP)
            ELSE o_orderdate - INTERVAL 2 MONTH END AS minus_months
FROM orders
WHERE o_orderkey <= 100
ORDER BY o_orderkey
"""


def dialect_null_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Impala default NULL ordering (ASC ⇒ NULLS LAST, DESC ⇒ NULLS FIRST —
    OrderByElement.java:115-117), injected by the translator; the oracle
    spells it explicitly."""
    return _engine(spark, sf_dir).sql(
        """
        SELECT o_orderkey,
               nullif(o_orderstatus, 'P') AS status_or_null
        FROM orders
        WHERE o_orderkey <= 200
        ORDER BY status_or_null DESC, o_orderkey
        LIMIT 50
        """
    )


DIALECT_NULL_ORDERING_SQL = """
SELECT o_orderkey, NULLIF(o_orderstatus, 'P') AS status_or_null
FROM orders
WHERE o_orderkey <= 200
ORDER BY status_or_null DESC NULLS FIRST, o_orderkey ASC NULLS LAST
LIMIT 50
"""


QUERIES: dict[str, tuple] = {
    "dialect_sql_filters": (dialect_filters, DIALECT_FILTERS_SQL),
    "dialect_sql_interval_dates": (dialect_interval_dates, DIALECT_INTERVAL_SQL),
    "dialect_sql_null_ordering": (dialect_null_ordering, DIALECT_NULL_ORDERING_SQL),
}
