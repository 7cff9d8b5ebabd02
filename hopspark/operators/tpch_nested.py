"""Nested TPC-H gate queries — the reference's flagship nested-types
workload (testdata/workloads/tpch_nested/queries/tpch_nested-q*.test;
nested schema per testdata/bin/load_nested.py: customer.c_orders
ARRAY<STRUCT<..., o_lineitems ARRAY<STRUCT<...>>>>) run through the SQL
surface against a DuckDB FLAT-table oracle, so a hash match proves the
nest → nested-plan → unnest round trip is lossless.

The nested fixture is built from the driver's parquet with collect_list
(decimal casts match load_nested.py's declared schema; dates are STRING
columns exactly like the reference's nested load).  The full 22-query
workload lives in tests/golden/tpch_nested.test — these three rows put
the three distinct nested PLAN shapes under the external oracle:

  * q1 — rootless multi-level table-path scan with implicit unnest
    (``FROM customer.c_orders.o_lineitems`` — Path.java resolution).
  * q4 — EXISTS subplan over a relative collection (SubplanNode;
    be/src/exec/subplan-node.h:43-65), lowered to a HOF on the scan.
  * q18 — lateral single-aggregate derived table over a relative
    collection, lowered to an inline aggregate() HOF (zero joins).

Scale note: the fixture's two collect_list groupBys are the nesting
step itself (bounded by orders-per-customer / lines-per-order, TPC-H
constants); the queries after it add zero joins and zero extra scans —
one generator per nesting level, the same shape SubplanNode streams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hopspark.engine import Engine

QUERIES: dict = {}

_VIEW = "tn_gate_customer"


def _ensure_fixture(spark: SparkSession, sf_dir: str) -> Engine:
    eng = Engine(spark=spark, sf_dir=sf_dir, register_tables=True)
    marker = f"__tn_gate_fixture_{abs(hash(sf_dir))}"
    if spark.catalog.tableExists(marker):
        return eng
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            "l_orderkey",
            "l_partkey",
            "l_suppkey",
            "l_linenumber",
            F.col("l_quantity").cast("decimal(12,2)").alias("l_quantity"),
            F.col("l_extendedprice").cast("decimal(12,2)")
            .alias("l_extendedprice"),
            F.col("l_discount").cast("decimal(12,2)").alias("l_discount"),
            F.col("l_tax").cast("decimal(12,2)").alias("l_tax"),
            "l_returnflag",
            "l_linestatus",
            F.col("l_shipdate").cast("date").cast("string")
            .alias("l_shipdate"),
            # synthesized like the golden fixture: the reduced testdata
            # has no commit/receipt dates (TESTDATA.md)
            F.date_add(
                F.col("l_shipdate").cast("date"),
                ((F.col("l_partkey") + F.col("l_suppkey")) % 20)
                .cast("int") - F.lit(10),
            ).cast("string").alias("l_commitdate"),
            F.date_add(
                F.col("l_shipdate").cast("date"),
                (F.col("l_orderkey") % 15).cast("int"),
            ).cast("string").alias("l_receiptdate"),
        )
    )
    li_nested = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(F.struct(
                "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
                "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
                "l_linestatus", "l_shipdate", "l_commitdate",
                "l_receiptdate",
            ))
        ).alias("o_lineitems")
    )
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.col("o_totalprice").cast("decimal(12,2)")
            .alias("o_totalprice"),
            F.col("o_orderdate").cast("date").cast("string")
            .alias("o_orderdate"),
            "o_orderpriority",
        )
        .join(li_nested, F.col("o_orderkey") == F.col("l_orderkey"),
              "left")
        .drop("l_orderkey")
    )
    # sort_array: Catalyst decorrelates general-path lateral subplans
    # into a join keyed on the ARRAY ITSELF, re-executing this aggregate
    # on both sides — a nondeterministic collect_list order would make
    # the array keys differ and the join silently match nothing
    ords_nested = orders.groupBy("o_custkey").agg(
        F.sort_array(F.collect_list(F.struct(
            "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate",
            "o_orderpriority", "o_lineitems",
        ))).alias("c_orders")
    )
    cust = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .select(
            "c_custkey", "c_name", "c_nationkey",
            F.col("c_acctbal").cast("decimal(12,2)").alias("c_acctbal"),
            "c_mktsegment",
        )
        .join(ords_nested, F.col("c_custkey") == F.col("o_custkey"),
              "left")
        .drop("o_custkey")
    )
    # persist: the nest (two collect_list groupBys) is the expensive part
    # and every query over the lazy view would recompute it; the fixture
    # is bounded (one row per customer) so caching is safe at gate SFs
    cust = cust.persist()
    cust.createOrReplaceTempView(_VIEW)
    spark.sql(f"CREATE OR REPLACE TEMP VIEW {marker} AS SELECT 1 AS ok")
    return eng


def tpch_nested_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 over the nested schema — a rootless MULTI-LEVEL table-path
    scan (``FROM customer.c_orders.o_lineitems``; implicit unnest of
    c_orders because o_lineitems is a field of its struct element —
    tpch_nested-q1.test; fe Path.java).  avgs computed as sum/count so
    both engines produce bit-identical doubles."""
    eng = _ensure_fixture(spark, sf_dir)
    return eng.sql(f"""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
               CAST(SUM(l_extendedprice) AS DOUBLE) AS sum_base_price,
               CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE)
                 AS sum_disc_price,
               CAST(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax))
                 AS DOUBLE) AS sum_charge,
               CAST(SUM(l_quantity) AS DOUBLE) / COUNT(*) AS avg_qty,
               CAST(SUM(l_discount) AS DOUBLE) / COUNT(*) AS avg_disc,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM {_VIEW}.c_orders.o_lineitems
        WHERE l_shipdate <= '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """)


TPCH_NESTED_Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
         AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE)
         AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
            * (1 - CAST(l_discount AS DECIMAL(12,2)))
            * (1 + CAST(l_tax AS DECIMAL(12,2)))) AS DOUBLE) AS sum_charge,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
         AS avg_qty,
       CAST(SUM(CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
         AS avg_disc,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def tpch_nested_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 over the nested schema — EXISTS over a relative collection
    (tpch_nested-q4.test; SubplanNode semantics), lowered to an exists()
    HOF on the parent scan.  Dates shifted 1993→1996 into the synthetic
    range; commit/receipt synthesized like the golden fixture."""
    eng = _ensure_fixture(spark, sf_dir)
    return eng.sql(f"""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        FROM {_VIEW} c, c.c_orders o
        WHERE o_orderdate >= '1996-07-01' AND o_orderdate < '1996-10-01'
          AND EXISTS (SELECT * FROM o.o_lineitems
                      WHERE l_commitdate < l_receiptdate)
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """)


TPCH_NESTED_Q4_SQL = """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders o
WHERE CAST(o_orderdate AS DATE) >= DATE '1996-07-01'
  AND CAST(o_orderdate AS DATE) < DATE '1996-10-01'
  AND EXISTS (
    SELECT * FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND CAST(CAST(l_shipdate AS DATE)
          + CAST(((l_partkey + l_suppkey) % 20 - 10) AS INT) AS VARCHAR)
        < CAST(CAST(l_shipdate AS DATE)
          + CAST((l_orderkey % 15) AS INT) AS VARCHAR))
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def tpch_nested_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 over the nested schema — a lateral single-aggregate
    derived table ``(SELECT SUM(l_quantity) sum_quantity FROM
    o.o_lineitems)`` (tpch_nested-q18.test), lowered to an inline
    aggregate() HOF: zero joins, zero extra scans.  Threshold 300→220
    (sf-scaled); LIMIT dropped (the driver hash is order-insensitive,
    a tie-dependent LIMIT cut would not be)."""
    eng = _ensure_fixture(spark, sf_dir)
    return eng.sql(f"""
        SELECT c_name, c_custkey, o_orderkey, o_orderdate,
               CAST(o_totalprice AS DOUBLE) AS o_totalprice,
               CAST(sum_quantity AS DOUBLE) AS sum_quantity
        FROM {_VIEW} c, c.c_orders o,
             (SELECT SUM(l_quantity) sum_quantity FROM o.o_lineitems) l
        WHERE sum_quantity > 220
        ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
    """)


TPCH_NESTED_Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
       CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS DOUBLE) AS o_totalprice,
       CAST(l.sum_quantity AS DOUBLE) AS sum_quantity
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN (SELECT l_orderkey,
             SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sum_quantity
      FROM lineitem GROUP BY l_orderkey) l
  ON o.o_orderkey = l.l_orderkey
WHERE l.sum_quantity > 220
ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
"""


QUERIES["tpch_nested_q1"] = (tpch_nested_q1, TPCH_NESTED_Q1_SQL)
QUERIES["tpch_nested_q4"] = (tpch_nested_q4, TPCH_NESTED_Q4_SQL)
QUERIES["tpch_nested_q18"] = (tpch_nested_q18, TPCH_NESTED_Q18_SQL)
