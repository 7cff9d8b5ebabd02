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


def dialect_scalar_parity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-4 parity kernels through the SQL front door: greatest/least
    NULL-poisoning (LeastGreatest:619-622), pmod's every-sign formula
    (PmodBigInt:436-440), regexp_replace RE2 backreferences, extract-FROM
    returning BIGINT, numeric dtrunc, and the RR round-year FORMAT parse
    (RoundYearFromCurrentYear:402-408)."""
    return _engine(spark, sf_dir).sql(
        r"""
        SELECT n_nationkey,
               greatest(n_regionkey, nullif(n_nationkey, 7), 2) AS g,
               least(n_regionkey, nullif(n_nationkey, 13)) AS l,
               pmod(n_nationkey - 12, -5) AS pm,
               regexp_replace(n_name, '([0-9]+)', '<\\1>') AS tagged,
               extract(year from years_add(CAST('1995-03-01' AS timestamp),
                                           n_regionkey)) AS yr,
               dtrunc(n_nationkey + 0.9) AS tr,
               CAST(CAST('96-03-04' AS date FORMAT 'RR-MM-DD') AS string)
                   AS rr_date
        FROM nation
        ORDER BY n_nationkey
        """
    )


DIALECT_SCALAR_PARITY_SQL = r"""
SELECT n_nationkey,
       CASE WHEN nullif(n_nationkey, 7) IS NULL THEN NULL
            ELSE greatest(n_regionkey, nullif(n_nationkey, 7), 2) END AS g,
       CASE WHEN nullif(n_nationkey, 13) IS NULL THEN NULL
            ELSE least(n_regionkey, nullif(n_nationkey, 13)) END AS l,
       (((n_nationkey - 12) % -5) + -5) % -5 AS pm,
       regexp_replace(n_name, '([0-9]+)', '<\1>') AS tagged,
       CAST(year(TIMESTAMP '1995-03-01'
                 + n_regionkey * INTERVAL 1 YEAR) AS BIGINT) AS yr,
       CAST(FLOOR(n_nationkey + 0.9) AS DOUBLE) AS tr,
       '1996-03-04' AS rr_date
FROM nation
ORDER BY n_nationkey
"""


def dialect_mask_bytes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-6 kernels through the SQL front door: the char-argument mask
    family (mask-functions-ir.cc — upper/lower/digit/other chars with
    X/x/n defaults) and the byte-position instr/locate windows
    (string-functions-ir.cc Instr:788-846, LocatePos:863-871; byte ==
    char on this ASCII data, so the windows are oracle-checkable)."""
    return _engine(spark, sf_dir).sql(
        """
        SELECT c_custkey,
               mask(c_name) AS masked_name,
               mask_show_first_n(c_mktsegment, 3) AS seg_prefix,
               mask_last_n(c_name, 4, '#', '#', '#', '#') AS name_tail,
               instr(c_name, '0', 1, 2) AS second_zero,
               instr(c_name, '0', -1, 1) AS last_zero,
               locate('_', c_name, 5) AS underscore_from_5
        FROM customer
        WHERE c_custkey <= 200
        ORDER BY c_custkey
        """
    )


DIALECT_MASK_BYTES_SQL = r"""
SELECT c_custkey,
       regexp_replace(regexp_replace(regexp_replace(c_name,
           '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
         AS masked_name,
       substr(c_mktsegment, 1, 3) ||
       regexp_replace(regexp_replace(regexp_replace(substr(c_mktsegment, 4),
           '[A-Z]', 'X', 'g'), '[a-z]', 'x', 'g'), '[0-9]', 'n', 'g')
         AS seg_prefix,
       substr(c_name, 1, GREATEST(0, length(c_name) - 4)) ||
       regexp_replace(substr(c_name, GREATEST(0, length(c_name) - 4) + 1),
           '.', '#', 'g')
         AS name_tail,
       CAST(CASE WHEN strpos(c_name, '0') = 0 THEN 0
            WHEN strpos(substr(c_name, strpos(c_name, '0') + 1), '0') = 0
              THEN 0
            ELSE strpos(c_name, '0')
                 + strpos(substr(c_name, strpos(c_name, '0') + 1), '0')
            END AS INT) AS second_zero,
       CAST(CASE WHEN strpos(reverse(c_name), '0') = 0 THEN 0
            ELSE length(c_name) - strpos(reverse(c_name), '0') + 1
            END AS INT) AS last_zero,
       CAST(CASE WHEN length(c_name) < 5
                   OR strpos(substr(c_name, 5), '_') = 0 THEN 0
            ELSE 4 + strpos(substr(c_name, 5), '_')
            END AS INT) AS underscore_from_5
FROM customer
WHERE c_custkey <= 200
ORDER BY c_custkey
"""


QUERIES: dict[str, tuple] = {
    "dialect_sql_filters": (dialect_filters, DIALECT_FILTERS_SQL),
    "dialect_sql_mask_bytes": (dialect_mask_bytes, DIALECT_MASK_BYTES_SQL),
    "dialect_sql_interval_dates": (dialect_interval_dates, DIALECT_INTERVAL_SQL),
    "dialect_sql_null_ordering": (dialect_null_ordering, DIALECT_NULL_ORDERING_SQL),
    "dialect_sql_scalar_parity": (dialect_scalar_parity, DIALECT_SCALAR_PARITY_SQL),
}


def dialect_udaf_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CREATE AGGREGATE FUNCTION surface (§2.12, grammar
    sql-parser.cup:693-695, UDA contract be/src/udf/udf.h:379-391),
    oracle-checked: a pandas grouped-agg UDAF (quantity-weighted price)
    registered through the engine's DDL equivalent and used from
    engine.sql() in a GROUP BY — the oracle computes the same weighted
    average in plain SQL, so a hash match proves the Arrow UDAF path
    (not just that it runs).  The UDAF receives each group whole,
    Arrow-batched; at scale the shuffle is the same hash-partition a
    native aggregate uses."""
    eng = _engine(spark, sf_dir)

    import numpy as np
    import pandas as pd

    def weighted_price(price: pd.Series, qty: pd.Series) -> float:
        q = qty.astype("float64")
        return float(np.round((price * q).sum() / q.sum(), 6))

    eng.create_aggregate_function("weighted_price", weighted_price, "double")
    return eng.sql(
        """
        SELECT l_returnflag,
               weighted_price(CAST(l_extendedprice AS DOUBLE),
                              CAST(l_quantity AS DOUBLE)) AS w_price
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


DIALECT_UDAF_SQL = """
SELECT l_returnflag,
       ROUND(SUM(CAST(l_extendedprice AS DOUBLE) * CAST(l_quantity AS DOUBLE))
             / SUM(CAST(l_quantity AS DOUBLE)), 6) AS w_price
FROM lineitem
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def dialect_ddl_ctas_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDL surface oracle-checked end-to-end: CREATE VIEW through the
    Impala-dialect engine (view body uses dialect functions), then a
    query over the view joined back to a base table.  The oracle inlines
    the view definition — a hash match proves the DDL registration,
    dialect translation inside the view body, and view expansion at
    analysis (FeView.java) all compose."""
    eng = _engine(spark, sf_dir)
    eng.sql("DROP VIEW IF EXISTS seg_summary")
    eng.sql(
        """
        CREATE VIEW seg_summary AS
        SELECT c_nationkey,
               COUNT(*) AS n_cust,
               SUM(CAST(zeroifnull(c_acctbal) AS DECIMAL(14,2))) AS bal
        FROM customer
        GROUP BY c_nationkey
        """
    )
    return eng.sql(
        """
        SELECT n.n_name, s.n_cust, CAST(s.bal AS DOUBLE) AS bal
        FROM seg_summary s JOIN nation n ON s.c_nationkey = n.n_nationkey
        ORDER BY n.n_name
        """
    )


DIALECT_DDL_SQL = """
WITH seg_summary AS (
  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_cust,
         SUM(CAST(COALESCE(c_acctbal, 0) AS DECIMAL(14,2))) AS bal
  FROM customer
  GROUP BY c_nationkey
)
SELECT n.n_name, s.n_cust, CAST(s.bal AS DOUBLE) AS bal
FROM seg_summary s JOIN nation n ON s.c_nationkey = n.n_nationkey
ORDER BY n.n_name
"""


def dialect_uda_mergeable_weighted_avg(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The reference's FULL UDA callback contract —
    Init/Update/Merge/Finalize (be/src/udf/udf.h:379-391, Merge at :388) —
    compiled to the distributive two-stage plan (hopspark/uda.py):
    Init/Update folds per (key, salt) sub-group into pickled partial
    states, Merge+Finalize reduces the <= 64 partials per key.  Unlike the
    whole-group grouped-agg form (dialect_sql_udaf_weighted_avg), no task
    ever materializes an entire group — the gate query groups ~600k rows
    into 3 flags, exactly the low-cardinality shape that breaks the
    whole-group plan at 100x.  A hash match against the plain-SQL oracle
    proves the salted split + merge recombination is exact."""
    eng = _engine(spark, sf_dir)

    import numpy as np

    def init() -> list:
        return [0.0, 0.0]

    def update(acc: list, price, qty) -> list:
        acc[0] += price * qty
        acc[1] += qty
        return acc

    def merge(acc: list, other: list) -> list:
        acc[0] += other[0]
        acc[1] += other[1]
        return acc

    def finalize(acc: list):
        return float(np.round(acc[0] / acc[1], 6)) if acc[1] else None

    eng.create_aggregate_function(
        "wavg_mergeable",
        return_type="double",
        init=init,
        update=update,
        merge=merge,
        finalize=finalize,
    )
    return eng.sql(
        """
        SELECT l_returnflag,
               wavg_mergeable(CAST(l_extendedprice AS DOUBLE),
                              CAST(l_quantity AS DOUBLE)) AS w_price
        FROM lineitem
        GROUP BY l_returnflag
        ORDER BY l_returnflag
        """
    )


QUERIES["dialect_sql_udaf_weighted_avg"] = (
    dialect_udaf_weighted_avg, DIALECT_UDAF_SQL)
QUERIES["dialect_sql_uda_mergeable_weighted_avg"] = (
    dialect_uda_mergeable_weighted_avg, DIALECT_UDAF_SQL)
QUERIES["dialect_sql_ddl_ctas_view"] = (
    dialect_ddl_ctas_view, DIALECT_DDL_SQL)


def dialect_collection_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The implicit collection join through the SQL surface, oracle-checked
    on real data: build a nested array<struct> view (per-customer order
    list), then run `FROM cust_orders c, c.orders o` in the Impala
    dialect — the reference's flagship nested idiom
    (testdata/.../nested-types-*.test) — and re-aggregate.  The oracle
    computes the same rollup from the flat base table, so a hash match
    proves the nest → collection-join → unnest round trip is lossless."""
    from pyspark.sql import functions as F

    eng = _engine(spark, sf_dir)
    orders = eng.spark.table("orders")
    nested = (
        orders.groupBy("o_custkey")
        .agg(
            # sort_array: landmine discipline — a collect_list array
            # must never reach a decorrelated join key unsorted
            F.sort_array(F.collect_list(
                F.struct(
                    F.col("o_orderkey").alias("okey"),
                    F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
                )
            )).alias("orders")
        )
    )
    nested.createOrReplaceTempView("cust_orders")
    return eng.sql(
        """
        SELECT c.o_custkey AS c_custkey,
               COUNT(o.okey) AS n_orders,
               CAST(MAX(o.price) AS DOUBLE) AS max_price
        FROM cust_orders c, c.orders o
        GROUP BY c.o_custkey
        ORDER BY c_custkey
        """
    )


DIALECT_COLLECTION_JOIN_SQL = """
SELECT o_custkey AS c_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price
FROM orders
GROUP BY o_custkey
ORDER BY c_custkey
"""


QUERIES["dialect_sql_collection_join"] = (
    dialect_collection_join, DIALECT_COLLECTION_JOIN_SQL)


def dialect_table_path_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rootless table-path collection scan through the SQL surface (r9):
    the reference's ``FROM tbl.collection`` idiom
    (testdata/.../nested-types-scanner-basic.test; fe Path.java) — scan a
    nested collection WITHOUT its parent row.  Build a per-customer
    array<struct> view, scan ``FROM cust_orders_tp.orders`` rootlessly,
    and aggregate the elements.  The oracle aggregates the flat base
    table, so a hash match proves the rootless scan sees exactly every
    element once (empty/NULL collections contribute nothing)."""
    from pyspark.sql import functions as F

    eng = _engine(spark, sf_dir)
    orders = eng.spark.table("orders")
    nested = (
        orders.groupBy("o_custkey")
        .agg(
            # sort_array: landmine discipline — a collect_list array
            # must never reach a decorrelated join key unsorted
            F.sort_array(F.collect_list(
                F.struct(
                    F.col("o_orderkey").alias("okey"),
                    F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
                )
            )).alias("orders")
        )
    )
    nested.createOrReplaceTempView("cust_orders_tp")
    return eng.sql(
        """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_elems,
               CAST(SUM(okey) AS BIGINT) AS sum_okey,
               CAST(MAX(price) AS DOUBLE) AS max_price
        FROM cust_orders_tp.orders
        """
    )


DIALECT_TABLE_PATH_SCAN_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_elems,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_okey,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS max_price
FROM orders
"""


QUERIES["dialect_sql_table_path_scan"] = (
    dialect_table_path_scan, DIALECT_TABLE_PATH_SCAN_SQL)


def dialect_subplan_derived(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated subplan derived table through the SQL surface (r9):
    the reference's ``FROM c, (SELECT * FROM c.collection WHERE ...) v``
    idiom (nested-types-subplan.test; planner SubplanNode), rewritten by
    the engine to a Spark LATERAL subquery with the collection exploded
    inside.  Nest per-customer orders, keep only even order keys inside
    the subplan, re-aggregate.  The oracle filters the flat base table —
    a hash match proves subplan filtering sees exactly the right
    elements and that element-less parents drop (INNER semantics)."""
    from pyspark.sql import functions as F

    eng = _engine(spark, sf_dir)
    orders = eng.spark.table("orders")
    nested = (
        orders.groupBy("o_custkey")
        .agg(
            # sort_array: landmine discipline — a collect_list array
            # must never reach a decorrelated join key unsorted
            F.sort_array(F.collect_list(
                F.struct(
                    F.col("o_orderkey").alias("okey"),
                    F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
                )
            )).alias("orders")
        )
    )
    nested.createOrReplaceTempView("cust_orders_sp")
    return eng.sql(
        """
        SELECT c.o_custkey AS c_custkey,
               CAST(COUNT(v.okey) AS BIGINT) AS n_even,
               CAST(MAX(v.price) AS DOUBLE) AS max_even_price
        FROM cust_orders_sp c, (SELECT * FROM c.orders WHERE okey % 2 = 0) v
        GROUP BY c.o_custkey
        ORDER BY c_custkey
        """
    )


DIALECT_SUBPLAN_SQL = """
SELECT o_custkey AS c_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_even,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
         AS max_even_price
FROM orders
WHERE o_orderkey % 2 = 0
GROUP BY o_custkey
ORDER BY c_custkey
"""


QUERIES["dialect_sql_subplan_derived"] = (
    dialect_subplan_derived, DIALECT_SUBPLAN_SQL)


def dialect_subplan_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar aggregate subplans over a relative collection (r10): the
    reference's ``(SELECT COUNT(*)/SUM/MAX/AVG FROM c.collection [WHERE])``
    idiom (nested-types-subplan.test; planner SubplanNode streams every
    shape, be/src/exec/subplan-node.h:43-65).  The engine lowers these to
    higher-order functions on the parent scan — zero joins, zero extra
    shuffles (Catalyst's generic decorrelation would join on the ARRAY
    itself).  The oracle aggregates the flat base table — a hash match
    proves each agg sees exactly the right elements, that NULL/empty
    collections give COUNT 0 and SUM/MAX/AVG NULL, and that the result
    types match the reference (SUM of integrals BIGINT, AVG DOUBLE)."""
    from pyspark.sql import functions as F

    eng = _engine(spark, sf_dir)
    orders = eng.spark.table("orders")
    nested = (
        orders.groupBy("o_custkey")
        .agg(
            # sort_array: landmine discipline — a collect_list array
            # must never reach a decorrelated join key unsorted
            F.sort_array(F.collect_list(
                F.struct(
                    F.col("o_orderkey").alias("okey"),
                    F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
                )
            )).alias("orders")
        )
    )
    nested.createOrReplaceTempView("cust_orders_spa")
    return eng.sql(
        """
        SELECT c.o_custkey AS c_custkey,
               CAST((SELECT COUNT(*) FROM c.orders) AS BIGINT) AS n_orders,
               CAST((SELECT SUM(okey) FROM c.orders WHERE okey % 2 = 0)
                    AS BIGINT) AS sum_even,
               CAST((SELECT MAX(price) FROM c.orders) AS DOUBLE)
                    AS max_price,
               CAST((SELECT AVG(okey) FROM c.orders) AS DOUBLE) AS avg_okey
        FROM cust_orders_spa c
        ORDER BY c_custkey
        """
    )


DIALECT_SUBPLAN_AGG_SQL = """
SELECT o_custkey AS c_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN o_orderkey % 2 = 0 THEN o_orderkey END)
            AS BIGINT) AS sum_even,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
         AS max_price,
       CAST(AVG(o_orderkey) AS DOUBLE) AS avg_okey
FROM orders
GROUP BY o_custkey
ORDER BY c_custkey
"""


QUERIES["dialect_sql_subplan_agg"] = (
    dialect_subplan_agg, DIALECT_SUBPLAN_AGG_SQL)


def dialect_subplan_multi_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate LATERAL derived table over a relative collection
    (r11): ``, (SELECT COUNT(*) c, SUM(x) s, MAX(x) m FROM c.coll) v`` —
    the reference's subplan derived-table idiom with several items
    (nested-types-subplan.test).  Every item lowers to an inline HOF on
    the parent scan in ONE pass (engine _subplan_lateral_agg); for
    struct-rooted paths Catalyst REJECTS the correlated fallback
    (UNSUPPORTED_CORRELATED_REFERENCE_DATA_TYPE), so this lowering is the
    only plan, not merely the fast one."""
    from pyspark.sql import functions as F

    eng = _engine(spark, sf_dir)
    orders = eng.spark.table("orders")
    nested = (
        orders.groupBy("o_custkey")
        .agg(
            # sort_array: landmine discipline — a collect_list array
            # must never reach a decorrelated join key unsorted
            F.sort_array(F.collect_list(
                F.struct(
                    F.col("o_orderkey").alias("okey"),
                    F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
                )
            )).alias("orders")
        )
    )
    nested.createOrReplaceTempView("cust_orders_sma")
    return eng.sql(
        """
        SELECT c.o_custkey AS c_custkey,
               CAST(n_orders AS BIGINT) AS n_orders,
               CAST(sum_okey AS BIGINT) AS sum_okey,
               CAST(max_price AS DOUBLE) AS max_price
        FROM cust_orders_sma c,
             (SELECT COUNT(*) n_orders, SUM(okey) sum_okey,
                     MAX(price) max_price FROM c.orders) v
        ORDER BY c_custkey
        """
    )


DIALECT_SUBPLAN_MULTI_AGG_SQL = """
SELECT o_custkey AS c_custkey,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_okey,
       CAST(MAX(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
         AS max_price
FROM orders
GROUP BY o_custkey
ORDER BY c_custkey
"""


QUERIES["dialect_sql_subplan_multi_agg"] = (
    dialect_subplan_multi_agg, DIALECT_SUBPLAN_MULTI_AGG_SQL)


def dialect_uda_in_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable UDA called INSIDE a CTE body (r10): ``WITH c AS (SELECT
    k, wavg(x,w) ... GROUP BY k) SELECT ... FROM c`` — the natural
    analyst shape after r9's WITH-prefix support.  The rewriter
    (hopspark/uda.py) recursively compiles the CTE body to the salted
    two-stage partial/merge plan; the outer statement filters and ranks
    the per-group results.  Hash match against a plain-SQL oracle proves
    the in-CTE split+merge recombination is exact."""
    eng = _engine(spark, sf_dir)

    import numpy as np

    def init() -> list:
        return [0.0, 0.0]

    def update(acc: list, price, qty) -> list:
        acc[0] += price * qty
        acc[1] += qty
        return acc

    def merge(acc: list, other: list) -> list:
        acc[0] += other[0]
        acc[1] += other[1]
        return acc

    def finalize(acc: list):
        return float(np.round(acc[0] / acc[1], 6)) if acc[1] else None

    eng.create_aggregate_function(
        "wavg_cte",
        return_type="double",
        init=init,
        update=update,
        merge=merge,
        finalize=finalize,
    )
    return eng.sql(
        """
        WITH flag_prices AS (
            SELECT l_returnflag AS flag, l_linestatus AS status,
                   wavg_cte(CAST(l_extendedprice AS DOUBLE),
                            CAST(l_quantity AS DOUBLE)) AS w_price
            FROM lineitem
            GROUP BY l_returnflag, l_linestatus
        )
        SELECT flag, status, w_price
        FROM flag_prices
        WHERE w_price > 0
        ORDER BY flag, status
        """
    )


DIALECT_UDA_CTE_SQL = """
WITH flag_prices AS (
    SELECT l_returnflag AS flag, l_linestatus AS status,
           ROUND(SUM(CAST(l_extendedprice AS DOUBLE)
                     * CAST(l_quantity AS DOUBLE))
                 / SUM(CAST(l_quantity AS DOUBLE)), 6) AS w_price
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
)
SELECT flag, status, w_price
FROM flag_prices
WHERE w_price > 0
ORDER BY flag, status
"""


QUERIES["dialect_sql_uda_in_cte"] = (dialect_uda_in_cte, DIALECT_UDA_CTE_SQL)
