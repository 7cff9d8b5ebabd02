"""Port the reference's nested TPC-H workload
(testdata/workloads/tpch_nested/queries/tpch_nested-q*.test;
testdata/bin/load_nested.py defines the nested schema) onto our engine as
a golden file, verified row-for-row against DuckDB FLAT-table twins.

The synthetic testdata (/root/testdata/sf0.001) is a REDUCED TPC-H — no
partsupp table and many columns missing (c_address/c_phone/c_comment,
o_clerk/o_shippriority/o_comment, l_commitdate/l_receiptdate/l_shipmode/
l_shipinstruct/l_comment, p_mfgr/p_container, s_address/s_phone/
s_comment).  The fixture views SYNTHESIZE those columns deterministically
from the keys (documented in the emitted file header), so the reference
query texts port VERBATIM except for:
  * table names prefixed tn_ (the reference runs in its own tpch_nested
    db; we fold the db name into the view name),
  * date/nation/p_type/p_name constants mapped into the synthetic data's
    domains (dates start 1995; nations are NATION_<k>; p_type is a single
    word; p_name is '<adj> <noun>'),
  * decimal columns come from DOUBLE parquet via CAST(x AS DECIMAL(12,2))
    — same declared types as load_nested.py's schema.

Every ported query runs BOTH through Engine.sql (nested plan) and DuckDB
(flat twin); rows must match (floats rounded to 6 significant places).
Usage:
    PYTHONPATH=. python tools/gen_tpch_nested_golden.py [--emit] [names...]
Without --emit it only verifies; with --emit it writes
tests/golden/tpch_nested.test with the Spark-side canonical rows.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

# ---------------------------------------------------------------------------
# Fixture views — Spark/Impala-dialect side (golden cases, run via
# Engine.sql) and the DuckDB flat twins of the same synthesized columns.
# ---------------------------------------------------------------------------

SPARK_FIXTURES: list[str] = [
    # flat extended base tables (synthesized columns documented above)
    """
CREATE VIEW tn_lineitem AS
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
  CAST(l_quantity AS DECIMAL(12,2)) AS l_quantity,
  CAST(l_extendedprice AS DECIMAL(12,2)) AS l_extendedprice,
  CAST(l_discount AS DECIMAL(12,2)) AS l_discount,
  CAST(l_tax AS DECIMAL(12,2)) AS l_tax,
  l_returnflag, l_linestatus,
  CAST(CAST(l_shipdate AS DATE) AS STRING) AS l_shipdate,
  CAST(DATE_ADD(CAST(l_shipdate AS DATE),
       CAST((l_partkey + l_suppkey) % 20 AS INT) - 10) AS STRING)
    AS l_commitdate,
  CAST(DATE_ADD(CAST(l_shipdate AS DATE),
       CAST(l_orderkey % 15 AS INT)) AS STRING) AS l_receiptdate,
  CASE CAST(l_linenumber % 4 AS INT) WHEN 0 THEN 'DELIVER IN PERSON'
    WHEN 1 THEN 'COLLECT COD' WHEN 2 THEN 'NONE'
    ELSE 'TAKE BACK RETURN' END AS l_shipinstruct,
  CASE CAST(l_orderkey % 7 AS INT) WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP'
    WHEN 2 THEN 'AIR' WHEN 3 THEN 'AIR REG' WHEN 4 THEN 'TRUCK'
    WHEN 5 THEN 'RAIL' ELSE 'FOB' END AS l_shipmode,
  CONCAT('lineitem comment ', CAST(l_orderkey AS STRING), ' ',
         CAST(l_linenumber AS STRING)) AS l_comment
FROM lineitem
""",
    """
CREATE VIEW tn_orders_flat AS
SELECT o_orderkey, o_custkey, o_orderstatus,
  CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice,
  CAST(CAST(o_orderdate AS DATE) AS STRING) AS o_orderdate,
  o_orderpriority,
  CONCAT('Clerk#', CAST(o_orderkey % 1000 AS STRING)) AS o_clerk,
  CAST(o_orderkey % 2 AS INT) AS o_shippriority,
  CASE WHEN o_orderkey % 5 = 0
    THEN CONCAT('xx special yy requests ', CAST(o_orderkey AS STRING))
    ELSE CONCAT('order comment ', CAST(o_orderkey AS STRING)) END
    AS o_comment
FROM orders
""",
    """
CREATE VIEW tn_customer_flat AS
SELECT c_custkey, c_name,
  CONCAT('Address#', CAST(c_custkey AS STRING)) AS c_address,
  c_nationkey,
  CONCAT(CAST(10 + c_custkey % 25 AS STRING), '-',
         CAST(100 + c_custkey % 900 AS STRING)) AS c_phone,
  CAST(c_acctbal AS DECIMAL(12,2)) AS c_acctbal,
  c_mktsegment,
  CASE WHEN c_custkey % 5 = 0
    THEN CONCAT('c special wants requests ', CAST(c_custkey AS STRING))
    ELSE CONCAT('customer comment ', CAST(c_custkey AS STRING)) END
    AS c_comment
FROM customer
""",
    """
CREATE VIEW tn_part AS
SELECT p_partkey, p_name,
  CONCAT('Manufacturer#', CAST(1 + p_partkey % 5 AS STRING)) AS p_mfgr,
  p_brand, p_type, p_size,
  CASE CAST(p_partkey % 8 AS INT) WHEN 0 THEN 'SM CASE' WHEN 1 THEN 'SM BOX'
    WHEN 2 THEN 'SM PACK' WHEN 3 THEN 'MED BAG' WHEN 4 THEN 'MED BOX'
    WHEN 5 THEN 'MED PKG' WHEN 6 THEN 'LG CASE' ELSE 'LG BOX' END
    AS p_container,
  CAST(p_retailprice AS DECIMAL(12,2)) AS p_retailprice
FROM part
""",
    """
CREATE VIEW tn_partsupp AS
SELECT p_partkey AS ps_partkey,
  CAST((p_partkey + n * 7) % 10 AS BIGINT) AS ps_suppkey,
  CAST((p_partkey * 7 + n * 11) % 9999 + 1 AS INT) AS ps_availqty,
  CAST(((p_partkey * 31 + n * 13) % 100000) / 100.0 AS DECIMAL(12,2))
    AS ps_supplycost,
  CONCAT('partsupp comment ', CAST(p_partkey AS STRING), ' ',
         CAST(n AS STRING)) AS ps_comment
FROM part,
  (SELECT 0 AS n UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3) i
""",
    """
CREATE VIEW tn_supplier_flat AS
SELECT s_suppkey, s_name,
  CONCAT('SAddr#', CAST(s_suppkey AS STRING)) AS s_address,
  s_nationkey,
  CONCAT(CAST(10 + s_suppkey % 25 AS STRING), '-',
         CAST(100 + s_suppkey % 900 AS STRING)) AS s_phone,
  CAST(s_acctbal AS DECIMAL(12,2)) AS s_acctbal,
  CASE WHEN s_suppkey % 7 = 0 THEN 'wow Customer ugh Complaints zz'
    ELSE CONCAT('supplier comment ', CAST(s_suppkey AS STRING)) END
    AS s_comment
FROM supplier
""",
    # nested views — the load_nested.py shapes
    """
CREATE VIEW tn_region AS
SELECT r.r_regionkey, r.r_name,
  CONCAT('region comment ', CAST(r.r_regionkey AS STRING)) AS r_comment,
  n.r_nations
FROM region r LEFT JOIN (
  SELECT n_regionkey, sort_array(collect_list(named_struct(
    'n_nationkey', n_nationkey, 'n_name', n_name,
    'n_comment', CONCAT('nation comment ', CAST(n_nationkey AS STRING)))))
    AS r_nations
  FROM nation GROUP BY n_regionkey) n
ON r.r_regionkey = n.n_regionkey
""",
    """
CREATE VIEW tn_supplier AS
SELECT f.s_suppkey, f.s_name, f.s_address, f.s_nationkey, f.s_phone,
       f.s_acctbal, f.s_comment, ps.s_partsupps
FROM tn_supplier_flat f LEFT JOIN (
  SELECT ps_suppkey, sort_array(collect_list(named_struct(
    'ps_partkey', ps_partkey, 'ps_availqty', ps_availqty,
    'ps_supplycost', ps_supplycost, 'ps_comment', ps_comment)))
    AS s_partsupps
  FROM tn_partsupp GROUP BY ps_suppkey) ps
ON f.s_suppkey = ps.ps_suppkey
""",
    """
CREATE VIEW tn_customer AS
SELECT c.c_custkey, c.c_name, c.c_address, c.c_nationkey, c.c_phone,
       c.c_acctbal, c.c_mktsegment, c.c_comment, o.c_orders
FROM tn_customer_flat c LEFT JOIN (
  SELECT o_custkey, sort_array(collect_list(named_struct(
    'o_orderkey', o_orderkey, 'o_orderstatus', o_orderstatus,
    'o_totalprice', o_totalprice, 'o_orderdate', o_orderdate,
    'o_orderpriority', o_orderpriority, 'o_clerk', o_clerk,
    'o_shippriority', o_shippriority, 'o_comment', o_comment,
    'o_lineitems', o_lineitems))) AS c_orders
  FROM (
    SELECT o.*, l.o_lineitems
    FROM tn_orders_flat o LEFT JOIN (
      SELECT l_orderkey, sort_array(collect_list(named_struct(
        'l_partkey', l_partkey, 'l_suppkey', l_suppkey,
        'l_linenumber', l_linenumber, 'l_quantity', l_quantity,
        'l_extendedprice', l_extendedprice, 'l_discount', l_discount,
        'l_tax', l_tax, 'l_returnflag', l_returnflag,
        'l_linestatus', l_linestatus, 'l_shipdate', l_shipdate,
        'l_commitdate', l_commitdate, 'l_receiptdate', l_receiptdate,
        'l_shipinstruct', l_shipinstruct, 'l_shipmode', l_shipmode,
        'l_comment', l_comment))) AS o_lineitems
      FROM tn_lineitem GROUP BY l_orderkey) l
    ON o.o_orderkey = l.l_orderkey) ords
  GROUP BY o_custkey) o
ON c.c_custkey = o.o_custkey
""",
]

DUCK_FIXTURES: list[str] = [
    """
CREATE VIEW tn_lineitem AS
SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
  CAST(l_quantity AS DECIMAL(12,2)) AS l_quantity,
  CAST(l_extendedprice AS DECIMAL(12,2)) AS l_extendedprice,
  CAST(l_discount AS DECIMAL(12,2)) AS l_discount,
  CAST(l_tax AS DECIMAL(12,2)) AS l_tax,
  l_returnflag, l_linestatus,
  CAST(CAST(l_shipdate AS DATE) AS VARCHAR) AS l_shipdate,
  CAST(CAST(l_shipdate AS DATE)
       + CAST(((l_partkey + l_suppkey) % 20 - 10) AS INT) AS VARCHAR)
    AS l_commitdate,
  CAST(CAST(l_shipdate AS DATE) + CAST((l_orderkey % 15) AS INT) AS VARCHAR)
    AS l_receiptdate,
  CASE CAST(l_linenumber % 4 AS INT) WHEN 0 THEN 'DELIVER IN PERSON'
    WHEN 1 THEN 'COLLECT COD' WHEN 2 THEN 'NONE'
    ELSE 'TAKE BACK RETURN' END AS l_shipinstruct,
  CASE CAST(l_orderkey % 7 AS INT) WHEN 0 THEN 'MAIL' WHEN 1 THEN 'SHIP'
    WHEN 2 THEN 'AIR' WHEN 3 THEN 'AIR REG' WHEN 4 THEN 'TRUCK'
    WHEN 5 THEN 'RAIL' ELSE 'FOB' END AS l_shipmode,
  CONCAT('lineitem comment ', CAST(l_orderkey AS VARCHAR), ' ',
         CAST(l_linenumber AS VARCHAR)) AS l_comment
FROM lineitem
""",
    """
CREATE VIEW tn_orders_flat AS
SELECT o_orderkey, o_custkey, o_orderstatus,
  CAST(o_totalprice AS DECIMAL(12,2)) AS o_totalprice,
  CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_orderdate,
  o_orderpriority,
  CONCAT('Clerk#', CAST(o_orderkey % 1000 AS VARCHAR)) AS o_clerk,
  CAST(o_orderkey % 2 AS INT) AS o_shippriority,
  CASE WHEN o_orderkey % 5 = 0
    THEN CONCAT('xx special yy requests ', CAST(o_orderkey AS VARCHAR))
    ELSE CONCAT('order comment ', CAST(o_orderkey AS VARCHAR)) END
    AS o_comment
FROM orders
""",
    """
CREATE VIEW tn_customer_flat AS
SELECT c_custkey, c_name,
  CONCAT('Address#', CAST(c_custkey AS VARCHAR)) AS c_address,
  c_nationkey,
  CONCAT(CAST(10 + c_custkey % 25 AS VARCHAR), '-',
         CAST(100 + c_custkey % 900 AS VARCHAR)) AS c_phone,
  CAST(c_acctbal AS DECIMAL(12,2)) AS c_acctbal,
  c_mktsegment,
  CASE WHEN c_custkey % 5 = 0
    THEN CONCAT('c special wants requests ', CAST(c_custkey AS VARCHAR))
    ELSE CONCAT('customer comment ', CAST(c_custkey AS VARCHAR)) END
    AS c_comment
FROM customer
""",
    """
CREATE VIEW tn_part AS
SELECT p_partkey, p_name,
  CONCAT('Manufacturer#', CAST(1 + p_partkey % 5 AS VARCHAR)) AS p_mfgr,
  p_brand, p_type, p_size,
  CASE CAST(p_partkey % 8 AS INT) WHEN 0 THEN 'SM CASE' WHEN 1 THEN 'SM BOX'
    WHEN 2 THEN 'SM PACK' WHEN 3 THEN 'MED BAG' WHEN 4 THEN 'MED BOX'
    WHEN 5 THEN 'MED PKG' WHEN 6 THEN 'LG CASE' ELSE 'LG BOX' END
    AS p_container,
  CAST(p_retailprice AS DECIMAL(12,2)) AS p_retailprice
FROM part
""",
    """
CREATE VIEW tn_partsupp AS
SELECT p_partkey AS ps_partkey,
  CAST((p_partkey + n * 7) % 10 AS BIGINT) AS ps_suppkey,
  CAST((p_partkey * 7 + n * 11) % 9999 + 1 AS INT) AS ps_availqty,
  CAST(((p_partkey * 31 + n * 13) % 100000) / 100.0 AS DECIMAL(12,2))
    AS ps_supplycost,
  CONCAT('partsupp comment ', CAST(p_partkey AS VARCHAR), ' ',
         CAST(n AS VARCHAR)) AS ps_comment
FROM part,
  (SELECT 0 AS n UNION ALL SELECT 1 UNION ALL SELECT 2 UNION ALL SELECT 3) i
""",
    """
CREATE VIEW tn_supplier_flat AS
SELECT s_suppkey, s_name,
  CONCAT('SAddr#', CAST(s_suppkey AS VARCHAR)) AS s_address,
  s_nationkey,
  CONCAT(CAST(10 + s_suppkey % 25 AS VARCHAR), '-',
         CAST(100 + s_suppkey % 900 AS VARCHAR)) AS s_phone,
  CAST(s_acctbal AS DECIMAL(12,2)) AS s_acctbal,
  CASE WHEN s_suppkey % 7 = 0 THEN 'wow Customer ugh Complaints zz'
    ELSE CONCAT('supplier comment ', CAST(s_suppkey AS VARCHAR)) END
    AS s_comment
FROM supplier
""",
    """
CREATE VIEW tn_nation AS
SELECT n_nationkey, n_name, n_regionkey,
  CONCAT('nation comment ', CAST(n_nationkey AS VARCHAR)) AS n_comment
FROM nation
""",
    """
CREATE VIEW tn_region_flat AS
SELECT r_regionkey, r_name,
  CONCAT('region comment ', CAST(r_regionkey AS VARCHAR)) AS r_comment
FROM region
""",
]


# ---------------------------------------------------------------------------
# Ported queries.  Each entry: (name, reference file, ported Impala-dialect
# SQL over the nested views, DuckDB flat twin SQL, adaptation note).
# ---------------------------------------------------------------------------

Q: list[tuple[str, str, str, str, str]] = []

Q.append((
    "q1", "tpch_nested-q1.test",
    """
select
  l_returnflag,
  l_linestatus,
  sum(l_quantity) as sum_qty,
  sum(l_extendedprice) as sum_base_price,
  sum(l_extendedprice * (1 - l_discount)) as sum_disc_price,
  sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) as sum_charge,
  avg(l_quantity) as avg_qty,
  avg(l_extendedprice) as avg_price,
  avg(l_discount) as avg_disc,
  count(*) as count_order
from
  tn_customer.c_orders.o_lineitems
where
  l_shipdate <= '1998-09-02'
group by
  l_returnflag,
  l_linestatus
order by
  l_returnflag,
  l_linestatus
""",
    """
select l_returnflag, l_linestatus,
  sum(l_quantity) as sum_qty,
  sum(l_extendedprice) as sum_base_price,
  sum(l_extendedprice * (1 - l_discount)) as sum_disc_price,
  sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) as sum_charge,
  avg(l_quantity) as avg_qty,
  avg(l_extendedprice) as avg_price,
  avg(l_discount) as avg_disc,
  count(*) as count_order
from tn_lineitem join tn_orders_flat on l_orderkey = o_orderkey
join tn_customer_flat on o_custkey = c_custkey
where l_shipdate <= '1998-09-02'
group by l_returnflag, l_linestatus
order by l_returnflag, l_linestatus
""",
    "verbatim (lineitems reachable only through customers, as in the "
    "reference's nested schema)",
))

Q.append((
    "q2", "tpch_nested-q2.test",
    """
select
  s_acctbal,
  s_name,
  n_name,
  p_partkey,
  p_mfgr,
  s_address,
  s_phone,
  s_comment
from
  tn_supplier s,
  s.s_partsupps ps,
  tn_part p,
  tn_region r,
  r.r_nations n
where
  p_partkey = ps_partkey
  and p_size = 12
  and p_type like '%DARD'
  and s_nationkey = n_nationkey
  and r_name = 'EUROPE'
  and ps_supplycost = (
    select
      min(ps_supplycost)
    from
      tn_supplier s,
      s.s_partsupps ps,
      tn_region r,
      r.r_nations n
    where
      p_partkey = ps_partkey
      and s_nationkey = n_nationkey
      and r_name = 'EUROPE'
    )
order by
  s_acctbal desc,
  n_name,
  s_name,
  p_partkey
limit 100
""",
    """
select s_acctbal, s_name, n_name, p_partkey, p_mfgr, s_address, s_phone,
       s_comment
from tn_supplier_flat s
join tn_partsupp ps on s.s_suppkey = ps.ps_suppkey
join tn_part p on p_partkey = ps_partkey
join tn_nation n on s_nationkey = n_nationkey
join tn_region_flat r on n_regionkey = r_regionkey
where p_size = 12 and p_type like '%DARD' and r_name = 'EUROPE'
  and ps_supplycost = (
    select min(ps2.ps_supplycost)
    from tn_partsupp ps2
    join tn_supplier_flat s2 on s2.s_suppkey = ps2.ps_suppkey
    join tn_nation n2 on s2.s_nationkey = n2.n_nationkey
    join tn_region_flat r2 on n2.n_regionkey = r2.r_regionkey
    where p.p_partkey = ps2.ps_partkey and r2.r_name = 'EUROPE')
order by s_acctbal desc, n_name, s_name, p_partkey
limit 100
""",
    "p_type '%BRASS' -> '%DARD', p_size 15 -> 12 (synthetic domains)",
))

Q.append((
    "q3", "tpch_nested-q3.test",
    """
select
  o_orderkey,
  sum(l_extendedprice * (1 - l_discount)) as revenue,
  o_orderdate,
  o_shippriority
from
  tn_customer c,
  c.c_orders o,
  o.o_lineitems l
where
  c_mktsegment = 'BUILDING'
  and o_orderdate < '1997-03-15'
  and l_shipdate > '1997-03-15'
group by
  o_orderkey,
  o_orderdate,
  o_shippriority
order by
  revenue desc,
  o_orderdate
limit 10
""",
    """
select o_orderkey, sum(l_extendedprice * (1 - l_discount)) as revenue,
       o_orderdate, o_shippriority
from tn_customer_flat c
join tn_orders_flat o on c_custkey = o_custkey
join tn_lineitem l on o_orderkey = l_orderkey
where c_mktsegment = 'BUILDING' and o_orderdate < '1997-03-15'
  and l_shipdate > '1997-03-15'
group by o_orderkey, o_orderdate, o_shippriority
order by revenue desc, o_orderdate
limit 10
""",
    "dates 1995-03-15 -> 1997-03-15 (synthetic date range 1995-2001)",
))

Q.append((
    "q4", "tpch_nested-q4.test",
    """
select
  o_orderpriority,
  count(*) as order_count
from
  tn_customer c,
  c.c_orders o
where
  o_orderdate >= '1996-07-01'
  and o_orderdate < '1996-10-01'
  and exists (
    select
      *
    from
      o.o_lineitems
    where
      l_commitdate < l_receiptdate
    )
group by
  o_orderpriority
order by
  o_orderpriority
""",
    """
select o_orderpriority, count(*) as order_count
from tn_orders_flat o
where o_orderdate >= '1996-07-01' and o_orderdate < '1996-10-01'
  and exists (select * from tn_lineitem l
              where l.l_orderkey = o.o_orderkey
                and l_commitdate < l_receiptdate)
group by o_orderpriority
order by o_orderpriority
""",
    "dates 1993 -> 1996",
))

Q.append((
    "q5", "tpch_nested-q5.test",
    """
select
  n_name,
  sum(l_extendedprice * (1 - l_discount)) as revenue
from
  tn_customer c,
  c.c_orders o,
  o.o_lineitems l,
  tn_supplier s,
  tn_region r,
  r.r_nations n
where
  l_suppkey = s_suppkey
  and c_nationkey = s_nationkey
  and s_nationkey = n_nationkey
  and r_name = 'ASIA'
  and o_orderdate >= '1996-01-01'
  and o_orderdate < '1997-01-01'
group by
  n_name
order by
  revenue desc
""",
    """
select n_name, sum(l_extendedprice * (1 - l_discount)) as revenue
from tn_customer_flat c
join tn_orders_flat o on c.c_custkey = o.o_custkey
join tn_lineitem l on o.o_orderkey = l.l_orderkey
join tn_supplier_flat s on l_suppkey = s_suppkey
join tn_nation n on s_nationkey = n_nationkey
join tn_region_flat r on n_regionkey = r_regionkey
where c_nationkey = s_nationkey and r_name = 'ASIA'
  and o_orderdate >= '1996-01-01' and o_orderdate < '1997-01-01'
group by n_name
order by revenue desc
""",
    "dates 1994 -> 1996",
))

Q.append((
    "q6", "tpch_nested-q6.test",
    """
select
  sum(l_extendedprice * l_discount) as revenue
from
  tn_customer.c_orders.o_lineitems
where
  l_shipdate >= '1996-01-01'
  and l_shipdate < '1997-01-01'
  and l_discount between 0.05 and 0.07
  and l_quantity < 24
""",
    """
select sum(l_extendedprice * l_discount) as revenue
from tn_lineitem
where l_shipdate >= '1996-01-01' and l_shipdate < '1997-01-01'
  and l_discount between 0.05 and 0.07 and l_quantity < 24
""",
    "dates 1994 -> 1996",
))

Q.append((
    "q7", "tpch_nested-q7.test",
    """
select
  supp_nation,
  cust_nation,
  l_year,
  sum(volume) as revenue
from (
  select
    n1.n_name as supp_nation,
    n2.n_name as cust_nation,
    year(l_shipdate) as l_year,
    l_extendedprice * (1 - l_discount) as volume
  from
    tn_customer c,
    c.c_orders o,
    o.o_lineitems l,
    tn_supplier s,
    tn_region.r_nations n1,
    tn_region.r_nations n2
  where
    s_suppkey = l_suppkey
    and s_nationkey = n1.n_nationkey
    and c_nationkey = n2.n_nationkey
    and (
      (n1.n_name = 'NATION_20' and n2.n_name = 'NATION_11')
      or (n1.n_name = 'NATION_11' and n2.n_name = 'NATION_20')
    )
    and l_shipdate between '1995-01-01' and '1996-12-31'
  ) as shipping
group by
  supp_nation,
  cust_nation,
  l_year
order by
  supp_nation,
  cust_nation,
  l_year
""",
    """
select supp_nation, cust_nation, l_year, sum(volume) as revenue
from (
  select n1.n_name as supp_nation, n2.n_name as cust_nation,
         year(cast(l_shipdate as date)) as l_year,
         l_extendedprice * (1 - l_discount) as volume
  from tn_customer_flat c
  join tn_orders_flat o on c.c_custkey = o.o_custkey
  join tn_lineitem l on o.o_orderkey = l.l_orderkey
  join tn_supplier_flat s on s_suppkey = l_suppkey
  join tn_nation n1 on s_nationkey = n1.n_nationkey
  join tn_nation n2 on c_nationkey = n2.n_nationkey
  where ((n1.n_name = 'NATION_20' and n2.n_name = 'NATION_11')
      or (n1.n_name = 'NATION_11' and n2.n_name = 'NATION_20'))
    and l_shipdate between '1995-01-01' and '1996-12-31'
  ) as shipping
group by supp_nation, cust_nation, l_year
order by supp_nation, cust_nation, l_year
""",
    "FRANCE/GERMANY -> NATION_20/NATION_11 (synthetic nation names; the pair with bilateral volume)",
))

Q.append((
    "q8", "tpch_nested-q8.test",
    """
select
  o_year,
  sum(case
    when nation = 'NATION_2'
    then volume
    else 0
  end) / sum(volume) as mkt_share
from (
  select
    year(o_orderdate) as o_year,
    l_extendedprice * (1 - l_discount) as volume,
    n2.n_name as nation
  from
    tn_customer c,
    c.c_orders o,
    o.o_lineitems l,
    tn_supplier s,
    tn_part p,
    tn_region r,
    r.r_nations n1,
    tn_region.r_nations n2
  where
    p_partkey = l_partkey
    and s_suppkey = l_suppkey
    and c_nationkey = n1.n_nationkey
    and r_name = 'AMERICA'
    and s_nationkey = n2.n_nationkey
    and o_orderdate between '1995-01-01' and '1996-12-31'
    and p_type = 'ECONOMY'
  ) as all_nations
group by
  o_year
order by
  o_year
""",
    """
select o_year,
  sum(case when nation = 'NATION_2' then volume else 0 end) / sum(volume)
    as mkt_share
from (
  select year(cast(o_orderdate as date)) as o_year,
         l_extendedprice * (1 - l_discount) as volume,
         n2.n_name as nation
  from tn_customer_flat c
  join tn_orders_flat o on c.c_custkey = o.o_custkey
  join tn_lineitem l on o.o_orderkey = l.l_orderkey
  join tn_supplier_flat s on s_suppkey = l_suppkey
  join tn_part p on p_partkey = l_partkey
  join tn_nation n1 on c_nationkey = n1.n_nationkey
  join tn_region_flat r on n1.n_regionkey = r.r_regionkey
  join tn_nation n2 on s_nationkey = n2.n_nationkey
  where r_name = 'AMERICA'
    and o_orderdate between '1995-01-01' and '1996-12-31'
    and p_type = 'ECONOMY'
  ) as all_nations
group by o_year
order by o_year
""",
    "BRAZIL -> NATION_2; p_type 'ECONOMY ANODIZED STEEL' -> 'ECONOMY'",
))

Q.append((
    "q9", "tpch_nested-q9.test",
    """
select
  nation,
  o_year,
  sum(amount) as sum_profit
from(
  select
    n_name as nation,
    year(o_orderdate) as o_year,
    l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity
      as amount
  from
    tn_customer.c_orders o,
    o.o_lineitems l,
    tn_supplier s,
    s.s_partsupps ps,
    tn_part p,
    tn_region.r_nations n
  where
    s_suppkey = l_suppkey
    and ps_partkey = l_partkey
    and p_partkey = l_partkey
    and s_nationkey = n_nationkey
    and p_name like '%widget%'
  ) as profit
group by
  nation,
  o_year
order by
  nation,
  o_year desc
""",
    """
select nation, o_year, sum(amount) as sum_profit
from (
  select n_name as nation, year(cast(o_orderdate as date)) as o_year,
         l_extendedprice * (1 - l_discount) - ps_supplycost * l_quantity
           as amount
  from tn_orders_flat o
  join tn_lineitem l on o.o_orderkey = l.l_orderkey
  join tn_supplier_flat s on s_suppkey = l_suppkey
  join tn_partsupp ps on ps.ps_suppkey = s.s_suppkey
                     and ps.ps_partkey = l.l_partkey
  join tn_part p on p_partkey = l_partkey
  join tn_nation n on s_nationkey = n_nationkey
  where p_name like '%widget%'
  ) as profit
group by nation, o_year
order by nation, o_year desc
""",
    "p_name '%green%' -> '%widget%' (synthetic p_name domain)",
))

Q.append((
    "q10", "tpch_nested-q10.test",
    """
select
  c_custkey,
  c_name,
  sum(l_extendedprice * (1 - l_discount)) as revenue,
  c_acctbal,
  n_name,
  c_address,
  c_phone,
  c_comment
from
  tn_customer c,
  c.c_orders o,
  o.o_lineitems l,
  tn_region.r_nations n
where
  o_orderdate >= '1996-10-01'
  and o_orderdate < '1997-01-01'
  and l_returnflag = 'R'
  and c_nationkey = n_nationkey
group by
  c_custkey,
  c_name,
  c_acctbal,
  c_phone,
  n_name,
  c_address,
  c_comment
order by
  revenue desc
limit 20
""",
    """
select c_custkey, c_name,
       sum(l_extendedprice * (1 - l_discount)) as revenue,
       c_acctbal, n_name, c_address, c_phone, c_comment
from tn_customer_flat c
join tn_orders_flat o on c.c_custkey = o.o_custkey
join tn_lineitem l on o.o_orderkey = l.l_orderkey
join tn_nation n on c_nationkey = n_nationkey
where o_orderdate >= '1996-10-01' and o_orderdate < '1997-01-01'
  and l_returnflag = 'R'
group by c_custkey, c_name, c_acctbal, c_phone, n_name, c_address,
         c_comment
order by revenue desc
limit 20
""",
    "dates 1993 -> 1996",
))

Q.append((
    "q11", "tpch_nested-q11.test",
    """
select
  *
from (
  select
    ps_partkey,
    sum(ps_supplycost * ps_availqty) as value
  from
    tn_supplier s,
    s.s_partsupps ps,
    tn_region.r_nations n
  where
    s_nationkey = n_nationkey
    and n_name = 'NATION_20'
  group by
    ps_partkey
) as inner_query
where
  value > (
    select
      sum(ps_supplycost * ps_availqty) * 0.0001
    from
      tn_supplier s,
      s.s_partsupps ps,
      tn_region.r_nations n
    where
      s_nationkey = n_nationkey
      and n_name = 'NATION_20'
  )
order by
  value desc
""",
    """
select * from (
  select ps_partkey, sum(ps_supplycost * ps_availqty) as value
  from tn_supplier_flat s
  join tn_partsupp ps on s.s_suppkey = ps.ps_suppkey
  join tn_nation n on s_nationkey = n_nationkey
  where n_name = 'NATION_20'
  group by ps_partkey
) as inner_query
where value > (
  select sum(ps_supplycost * ps_availqty) * 0.0001
  from tn_supplier_flat s
  join tn_partsupp ps on s.s_suppkey = ps.ps_suppkey
  join tn_nation n on s_nationkey = n_nationkey
  where n_name = 'NATION_20')
order by value desc
""",
    "GERMANY -> NATION_20 (a nation that HAS suppliers)",
))

Q.append((
    "q12", "tpch_nested-q12.test",
    """
select
  l_shipmode,
  sum(case
    when o_orderpriority = '1-URGENT'
      or o_orderpriority = '2-HIGH'
    then 1
    else 0
  end) as high_line_count,
  sum(case
    when o_orderpriority <> '1-URGENT'
      and o_orderpriority <> '2-HIGH'
    then 1
    else 0
  end) as low_line_count
from
  tn_customer.c_orders o,
  o.o_lineitems l
where
  l_shipmode in ('MAIL', 'SHIP')
  and l_commitdate < l_receiptdate
  and l_shipdate < l_commitdate
  and l_receiptdate >= '1996-01-01'
  and l_receiptdate < '1997-01-01'
group by
  l_shipmode
order by
  l_shipmode
""",
    """
select l_shipmode,
  sum(case when o_orderpriority = '1-URGENT'
        or o_orderpriority = '2-HIGH' then 1 else 0 end)
    as high_line_count,
  sum(case when o_orderpriority <> '1-URGENT'
        and o_orderpriority <> '2-HIGH' then 1 else 0 end)
    as low_line_count
from tn_orders_flat o
join tn_lineitem l on o.o_orderkey = l.l_orderkey
where l_shipmode in ('MAIL', 'SHIP')
  and l_commitdate < l_receiptdate and l_shipdate < l_commitdate
  and l_receiptdate >= '1996-01-01' and l_receiptdate < '1997-01-01'
group by l_shipmode
order by l_shipmode
""",
    "dates 1994 -> 1996",
))

Q.append((
    "q13", "tpch_nested-q13.test",
    """
select
  c_count,
  count(*) as custdist
from (
  select
    c_custkey,
    count(o_orderkey) as c_count
  from
    tn_customer c left outer join c.c_orders on (
      o_comment not like '%special%requests%'
    )
  group by
    c_custkey
  ) as c_orders
group by
  c_count
order by
  custdist desc,
  c_count desc
""",
    """
select c_count, count(*) as custdist
from (
  select c.c_custkey, count(o_orderkey) as c_count
  from tn_customer_flat c left outer join tn_orders_flat o
    on c.c_custkey = o.o_custkey
    and o_comment not like '%special%requests%'
  group by c.c_custkey
  ) as c_orders
group by c_count
order by custdist desc, c_count desc
""",
    "verbatim (left outer collection join with ON filter)",
))

Q.append((
    "q14", "tpch_nested-q14.test",
    """
select
  100.00 * sum(case
    when p_type like 'PROMO%'
    then l_extendedprice * (1 - l_discount)
    else 0.0
    end) / sum(l_extendedprice * (1 - l_discount)) as promo_revenue
from
  tn_customer.c_orders.o_lineitems l,
  tn_part p
where
  l_partkey = p_partkey
  and l_shipdate >= '1996-09-01'
  and l_shipdate < '1996-10-01'
""",
    """
select 100.00 * sum(case when p_type like 'PROMO%'
    then l_extendedprice * (1 - l_discount) else 0.0 end)
  / sum(l_extendedprice * (1 - l_discount)) as promo_revenue
from tn_lineitem l join tn_part p on l_partkey = p_partkey
where l_shipdate >= '1996-09-01' and l_shipdate < '1996-10-01'
""",
    "dates 1995-09 -> 1996-09",
))

Q.append((
    "q15", "tpch_nested-q15.test",
    """
with revenue_view as (
  select
    l_suppkey as supplier_no,
    sum(l_extendedprice * (1 - l_discount)) as total_revenue
  from
    tn_customer.c_orders.o_lineitems l
  where
    l_shipdate >= '1996-01-01'
    and l_shipdate < '1996-04-01'
  group by
    l_suppkey)
select
  s_suppkey,
  s_name,
  s_address,
  s_phone,
  total_revenue
from
  tn_supplier,
  revenue_view
where
  s_suppkey = supplier_no
  and total_revenue = (
    select
      max(total_revenue)
    from
      revenue_view
    )
order by
  s_suppkey
""",
    """
with revenue_view as (
  select l_suppkey as supplier_no,
         sum(l_extendedprice * (1 - l_discount)) as total_revenue
  from tn_lineitem l
  where l_shipdate >= '1996-01-01' and l_shipdate < '1996-04-01'
  group by l_suppkey)
select s_suppkey, s_name, s_address, s_phone, total_revenue
from tn_supplier_flat, revenue_view
where s_suppkey = supplier_no
  and total_revenue = (select max(total_revenue) from revenue_view)
order by s_suppkey
""",
    "verbatim",
))

Q.append((
    "q16", "tpch_nested-q16.test",
    """
select
  p_brand,
  p_type,
  p_size,
  count(distinct s_suppkey) as supplier_cnt
from
  tn_supplier s,
  s.s_partsupps ps,
  tn_part p
where
  p_partkey = ps_partkey
  and p_brand <> 'Brand#5'
  and p_type not like 'MEDIUM%'
  and p_size in (49, 14, 23, 45, 19, 3, 36, 9)
  and s_comment not like '%Customer%Complaints%'
group by
  p_brand,
  p_type,
  p_size
order by
  supplier_cnt desc,
  p_brand,
  p_type,
  p_size
""",
    """
select p_brand, p_type, p_size, count(distinct s_suppkey) as supplier_cnt
from tn_supplier_flat s
join tn_partsupp ps on s.s_suppkey = ps.ps_suppkey
join tn_part p on p_partkey = ps_partkey
where p_brand <> 'Brand#5' and p_type not like 'MEDIUM%'
  and p_size in (49, 14, 23, 45, 19, 3, 36, 9)
  and s_comment not like '%Customer%Complaints%'
group by p_brand, p_type, p_size
order by supplier_cnt desc, p_brand, p_type, p_size
""",
    "Brand#45 -> Brand#5; 'MEDIUM POLISHED%' -> 'MEDIUM%'",
))

Q.append((
    "q17", "tpch_nested-q17.test",
    """
select
  sum(l_extendedprice) / 7.0 as avg_yearly
from
  tn_customer.c_orders.o_lineitems l,
  tn_part p
where
  p_partkey = l_partkey
  and p_brand = 'Brand#23'
  and p_container = 'MED BOX'
  and l_quantity < (
    select
      0.2 * avg(l_quantity)
    from
      tn_customer.c_orders.o_lineitems l
    where
      l_partkey = p_partkey
  )
""",
    """
select sum(l_extendedprice) / 7.0 as avg_yearly
from tn_lineitem l join tn_part p on p_partkey = l_partkey
where p_brand = 'Brand#23' and p_container = 'MED BOX'
  and l_quantity < (
    select 0.2 * avg(l2.l_quantity) from tn_lineitem l2
    where l2.l_partkey = p.p_partkey)
""",
    "verbatim (p_container synthesized)",
))

Q.append((
    "q18", "tpch_nested-q18.test",
    """
select
  c_name,
  c_custkey,
  o_orderkey,
  o_orderdate,
  o_totalprice,
  sum_quantity
from
  tn_customer c,
  c.c_orders o,
  (select sum(l_quantity) sum_quantity from o.o_lineitems) l
where
  sum_quantity > 220
order by
  o_totalprice desc,
  o_orderdate
limit 100
""",
    """
select c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       sum_quantity
from tn_customer_flat c
join tn_orders_flat o on c.c_custkey = o.o_custkey
join (select l_orderkey, sum(l_quantity) sum_quantity
      from tn_lineitem group by l_orderkey) l
  on o.o_orderkey = l.l_orderkey
where sum_quantity > 220
order by o_totalprice desc, o_orderdate
limit 100
""",
    "threshold 300 -> 220 (sf0.001 orders have fewer lineitems; keeps LIMIT inert)",
))

Q.append((
    "q19", "tpch_nested-q19.test",
    """
select
  sum(l_extendedprice * (1 - l_discount)) as revenue
from
  tn_customer.c_orders.o_lineitems l,
  tn_part p
where
  p_partkey = l_partkey
  and (
    (
      p_brand = 'Brand#12'
      and p_container in ('SM CASE', 'SM BOX', 'SM PACK', 'SM PKG')
      and l_quantity >= 1 and l_quantity <= 11
      and p_size between 1 and 5
      and l_shipmode in ('AIR', 'AIR REG')
      and l_shipinstruct = 'DELIVER IN PERSON'
    )
    or
    (
      p_brand = 'Brand#23'
      and p_container in ('MED BAG', 'MED BOX', 'MED PKG', 'MED PACK')
      and l_quantity >= 10 and l_quantity <= 20
      and p_size between 1 and 10
      and l_shipmode in ('AIR', 'AIR REG')
      and l_shipinstruct = 'DELIVER IN PERSON'
    )
    or
    (
      p_brand = 'Brand#3'
      and p_container in ('LG CASE', 'LG BOX', 'LG PACK', 'LG PKG')
      and l_quantity >= 20 and l_quantity <= 30
      and p_size between 1 and 15
      and l_shipmode in ('AIR', 'AIR REG')
      and l_shipinstruct = 'DELIVER IN PERSON'
    )
  )
""",
    """
select sum(l_extendedprice * (1 - l_discount)) as revenue
from tn_lineitem l join tn_part p on p_partkey = l_partkey
where
  (p_brand = 'Brand#12'
    and p_container in ('SM CASE', 'SM BOX', 'SM PACK', 'SM PKG')
    and l_quantity >= 1 and l_quantity <= 11
    and p_size between 1 and 5
    and l_shipmode in ('AIR', 'AIR REG')
    and l_shipinstruct = 'DELIVER IN PERSON')
  or
  (p_brand = 'Brand#23'
    and p_container in ('MED BAG', 'MED BOX', 'MED PKG', 'MED PACK')
    and l_quantity >= 10 and l_quantity <= 20
    and p_size between 1 and 10
    and l_shipmode in ('AIR', 'AIR REG')
    and l_shipinstruct = 'DELIVER IN PERSON')
  or
  (p_brand = 'Brand#3'
    and p_container in ('LG CASE', 'LG BOX', 'LG PACK', 'LG PKG')
    and l_quantity >= 20 and l_quantity <= 30
    and p_size between 1 and 15
    and l_shipmode in ('AIR', 'AIR REG')
    and l_shipinstruct = 'DELIVER IN PERSON')
""",
    "Brand#34 -> Brand#3 (synthetic brand domain)",
))

Q.append((
    "q20", "tpch_nested-q20.test",
    """
select distinct
  s_name,
  s_address
from
  tn_supplier s,
  s.s_partsupps ps,
  tn_region.r_nations n
where
  ps_partkey in (
      select
        p_partkey
      from
        tn_part p
      where
        p_name like 'large%'
  )
  and ps_availqty > (
      select
        0.5 * sum(l_quantity)
      from
        tn_customer.c_orders.o_lineitems l
      where
        l_partkey = ps_partkey
        and l_suppkey = s_suppkey
        and l_shipdate >= '1996-01-01'
        and l_shipdate < '1997-01-01'
  )
  and s_nationkey = n_nationkey
  and n_name = 'NATION_3'
order by
  s_name
""",
    """
select distinct s_name, s_address
from tn_supplier_flat s
join tn_partsupp ps on s.s_suppkey = ps.ps_suppkey
join tn_nation n on s_nationkey = n_nationkey
where ps_partkey in (select p_partkey from tn_part p
                     where p_name like 'large%')
  and ps_availqty > (
    select 0.5 * sum(l_quantity) from tn_lineitem l
    where l.l_partkey = ps.ps_partkey and l.l_suppkey = s.s_suppkey
      and l_shipdate >= '1996-01-01' and l_shipdate < '1997-01-01')
  and n_name = 'NATION_3'
order by s_name
""",
    "'forest%' -> 'large%'; CANADA -> NATION_3; dates 1994 -> 1996",
))

Q.append((
    "q21", "tpch_nested-q21.test",
    """
select
  s_name,
  count(*) as numwait
from
  tn_supplier s,
  tn_customer c,
  c.c_orders o,
  o.o_lineitems l1,
  tn_region.r_nations n
where
  s_suppkey = l1.l_suppkey
  and o_orderstatus = 'F'
  and l1.l_receiptdate > l1.l_commitdate
  and exists (
    select
      *
    from
      o.o_lineitems l2
    where
      l2.l_suppkey <> l1.l_suppkey
    )
  and not exists (
    select
      *
    from
      o.o_lineitems l3
    where
      l3.l_suppkey <> l1.l_suppkey
      and l3.l_receiptdate > l3.l_commitdate
    )
  and s_nationkey = n_nationkey
  and n_name = 'NATION_20'
group by
  s_name
order by
  numwait desc,
  s_name
limit 100
""",
    """
select s_name, count(*) as numwait
from tn_supplier_flat s
join tn_lineitem l1 on s_suppkey = l1.l_suppkey
join tn_orders_flat o on o.o_orderkey = l1.l_orderkey
join tn_customer_flat c on c.c_custkey = o.o_custkey
join tn_nation n on s_nationkey = n_nationkey
where o_orderstatus = 'F'
  and l1.l_receiptdate > l1.l_commitdate
  and exists (select * from tn_lineitem l2
              where l2.l_orderkey = o.o_orderkey
                and l2.l_suppkey <> l1.l_suppkey)
  and not exists (select * from tn_lineitem l3
                  where l3.l_orderkey = o.o_orderkey
                    and l3.l_suppkey <> l1.l_suppkey
                    and l3.l_receiptdate > l3.l_commitdate)
  and n_name = 'NATION_20'
group by s_name
order by numwait desc, s_name
limit 100
""",
    "SAUDI ARABIA -> NATION_20",
))

Q.append((
    "q22", "tpch_nested-q22.test",
    """
select
  cntrycode,
  count(*) as numcust,
  sum(c_acctbal) as totacctbal
from (
  select
    substr(c_phone, 1, 2) as cntrycode,
    c_acctbal
  from
    tn_customer c
  where
    substr(c_phone, 1, 2) in ('13', '31', '23', '29', '30', '18', '17')
    and c_acctbal > (
      select
        avg(c_acctbal)
      from
        tn_customer c
      where
        c_acctbal > 0.00
        and substr(c_phone, 1, 2) in ('13', '31', '23', '29', '30', '18', '17')
      )
    and not exists (
      select
        o_orderkey
      from
        c.c_orders
      where
        o_totalprice > 400000
    )
  ) as custsale
group by
  cntrycode
order by
  cntrycode
""",
    """
select cntrycode, count(*) as numcust, sum(c_acctbal) as totacctbal
from (
  select substr(c_phone, 1, 2) as cntrycode, c_acctbal
  from tn_customer_flat c
  where substr(c_phone, 1, 2) in ('13','31','23','29','30','18','17')
    and c_acctbal > (
      select avg(c_acctbal) from tn_customer_flat c2
      where c_acctbal > 0.00
        and substr(c_phone, 1, 2) in ('13','31','23','29','30','18','17'))
    and not exists (select o_orderkey from tn_orders_flat o
                    where o.o_custkey = c.c_custkey
                      and o_totalprice > 400000)
  ) as custsale
group by cntrycode
order by cntrycode
""",
    "c_phone synthesized (codes 10-34); NOT EXISTS narrowed to orders > 400000 (every synthetic customer has orders)",
))


# ---------------------------------------------------------------------------
# Wave 2 — nested-types-subplan.test ported onto the tn fixtures
# (testdata/workloads/functional-query/queries/QueryTest/
# nested-types-subplan.test).  Same discipline: constants adapted to the
# synthetic key ranges (c_custkey 0-149), every row DuckDB-twin-verified.
# ---------------------------------------------------------------------------

SP: list[tuple[str, str, str, str, str]] = []

SP.append((
    "sp_basic", "nested-types-subplan.test:1",
    """
select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from tn_customer c, c.c_orders o
where c_custkey in (1, 2)
order by c_custkey, o_orderkey
""",
    """
select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from tn_customer_flat c join tn_orders_flat o on c_custkey = o_custkey
where c_custkey in (1, 2) order by c_custkey, o_orderkey
""",
    "verbatim + ORDER BY (our canon is order-insensitive only per file)",
))

SP.append((
    "sp_parent_and_nested_pred", "nested-types-subplan.test:2",
    """
select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from tn_customer c, c.c_orders o
where c_custkey in (1, 2) and o_orderkey % 2 = 0
order by c_custkey, o_orderkey
""",
    """
select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from tn_customer_flat c join tn_orders_flat o on c_custkey = o_custkey
where c_custkey in (1, 2) and o_orderkey % 2 = 0
order by c_custkey, o_orderkey
""",
    "verbatim",
))

SP.append((
    "sp_derived_star_pred", "nested-types-subplan.test:5",
    """
select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from tn_customer c, (select * from c.c_orders where o_orderkey % 2 = 0) v
where c_custkey < 4
order by c_custkey, o_orderkey
""",
    """
select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from tn_customer_flat c join tn_orders_flat o on c_custkey = o_custkey
where c_custkey < 4 and o_orderkey % 2 = 0
order by c_custkey, o_orderkey
""",
    "predicate folded into the derived table",
))

SP.append((
    "sp_union_in_subplan", "nested-types-subplan.test:8",
    """
select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from tn_customer c,
  (select * from c.c_orders where o_orderkey % 2 = 0
   union all
   select * from c.c_orders where o_orderkey % 2 = 1) v
where c_custkey < 4
order by c_custkey, o_orderkey
""",
    """
select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from tn_customer_flat c join tn_orders_flat o on c_custkey = o_custkey
where c_custkey < 4 order by c_custkey, o_orderkey
""",
    "verbatim",
))

SP.append((
    "sp_multi_agg_star", "nested-types-subplan.test:9",
    """
select c_custkey, v.* from tn_customer c,
  (select count(o_orderkey) c, sum(o_totalprice) s, avg(o_totalprice) a,
          max(o_orderstatus) mx, min(o_orderdate) mn
   from c.c_orders) v
where c_custkey < 4
order by c_custkey
""",
    """
select c.c_custkey, count(o_orderkey) as c,
       sum(o_totalprice) as s,
       cast(avg(o_totalprice) as decimal(38,6)) as a,
       max(o_orderstatus) as mx, min(o_orderdate) as mn
from tn_customer_flat c left join tn_orders_flat o
  on c.c_custkey = o.o_custkey
where c.c_custkey < 4 group by c.c_custkey order by c.c_custkey
""",
    "verbatim (v.* expands through the HOF lowering; avg is "
    "DECIMAL(38,6) — width-only delta vs the reference's decimal)",
))

SP.append((
    "sp_count_star_orders", "nested-types-subplan.test:10",
    """
select c_custkey, v.* from tn_customer c,
  (select count(*) cnt from c.c_orders) v
where c_custkey < 4
order by c_custkey
""",
    """
select c.c_custkey, count(o_orderkey) as cnt
from tn_customer_flat c left join tn_orders_flat o
  on c.c_custkey = o.o_custkey
where c.c_custkey < 4 group by c.c_custkey order by c.c_custkey
""",
    "verbatim",
))

SP.append((
    "sp_count_star_lineitems", "nested-types-subplan.test:11",
    """
select c_custkey, v.* from tn_customer c,
  (select count(*) cnt from c.c_orders.o_lineitems) v
where c_custkey < 4
order by c_custkey
""",
    """
select c.c_custkey, count(l.l_orderkey) as cnt
from tn_customer_flat c
left join tn_orders_flat o on c.c_custkey = o.o_custkey
left join tn_lineitem l on o.o_orderkey = l.l_orderkey
where c.c_custkey < 4 group by c.c_custkey order by c.c_custkey
""",
    "verbatim (multi-level collection path flattens across orders)",
))

SP.append((
    "sp_grouping_agg", "nested-types-subplan.test:12",
    """
select c_custkey, v.* from tn_customer c,
  (select o_orderpriority, count(o_orderkey) c, sum(o_totalprice) s,
          max(o_orderstatus) mx, min(o_orderdate) mn
   from c.c_orders
   group by o_orderpriority) v
where c_custkey < 4
order by c_custkey, o_orderpriority
""",
    """
select c_custkey, o_orderpriority, count(o_orderkey) as c,
       sum(o_totalprice) as s, max(o_orderstatus) as mx,
       min(o_orderdate) as mn
from tn_customer_flat c join tn_orders_flat o on c_custkey = o_custkey
where c_custkey < 4
group by c_custkey, o_orderpriority
order by c_custkey, o_orderpriority
""",
    "avg dropped from the item list (general-path decorrelation keeps "
    "Spark's avg(decimal) scale, a declared width delta); grouping agg "
    "takes the general decorrelated path",
))

SP.append((
    "sp_window_in_subplan", "nested-types-subplan.test:13",
    """
select c_custkey, v.* from tn_customer c,
  (select count(o_orderkey) over() c, sum(o_totalprice) over() s,
          max(o_orderstatus) over() mx, min(o_orderdate) over() mn
   from c.c_orders) v
where c_custkey < 3
order by c_custkey
""",
    """
select c_custkey, count(o_orderkey) over (partition by c_custkey) as c,
       sum(o_totalprice) over (partition by c_custkey) as s,
       max(o_orderstatus) over (partition by c_custkey) as mx,
       min(o_orderdate) over (partition by c_custkey) as mn
from tn_customer_flat c join tn_orders_flat o on c_custkey = o_custkey
where c_custkey < 3 order by c_custkey
""",
    "analytic fns inside the subplan (per-row window = per-customer "
    "partition on the flat twin)",
))

SP.append((
    "sp_left_outer_relative", "nested-types-subplan.test:15",
    """
select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from tn_customer c left outer join c.c_orders
where c_custkey < 4
order by c_custkey, o_orderkey
""",
    """
select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from tn_customer_flat c left outer join tn_orders_flat o
  on c_custkey = o_custkey
where c_custkey < 4 order by c_custkey, o_orderkey
""",
    "verbatim (LEFT OUTER collection join keeps order-less customers)",
))

SP.append((
    "sp_left_semi_relative", "nested-types-subplan.test:17",
    """
select c_custkey, c_mktsegment
from tn_customer c left semi join c.c_orders
where c_custkey < 4
order by c_custkey
""",
    """
select c_custkey, c_mktsegment from tn_customer_flat c
where c_custkey < 4 and exists
  (select 1 from tn_orders_flat o where o.o_custkey = c.c_custkey)
order by c_custkey
""",
    "verbatim (semi = EXISTS on the collection)",
))

SP.append((
    "sp_left_anti_relative", "nested-types-subplan.test:19",
    """
select count(*) from tn_customer c left anti join c.c_orders
""",
    """
select count(*) from tn_customer_flat c
where not exists
  (select 1 from tn_orders_flat o where o.o_custkey = c.c_custkey)
""",
    "IMPALA-2289 row adapted: whole-table count (every synthetic "
    "custkey range has orders, so the reference's 8000-10000 band is "
    "meaningless here)",
))

SP.append((
    "sp_hash_join_in_subplan", "nested-types-subplan.test:21",
    """
select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from tn_customer c,
  (select o1.o_orderkey, o2.o_orderdate
   from c.c_orders o1, c.c_orders o2
   where o1.o_orderkey = o2.o_orderkey) v
where c_custkey < 4
order by c_custkey, o_orderkey
""",
    """
select c_custkey, c_mktsegment, o_orderkey, o_orderdate
from tn_customer_flat c join tn_orders_flat o on c_custkey = o_custkey
where c_custkey < 4 order by c_custkey, o_orderkey
""",
    "verbatim (self-join of the collection inside the subplan)",
))

SP.append((
    "sp_scalar_uncorrelated", "nested-types-subplan.test:22",
    """
select c_custkey, c_mktsegment, c_acctbal
from tn_customer c
where c_custkey < 10
  and c_acctbal < (select avg(o_totalprice) from c.c_orders)
order by c_custkey
""",
    """
select c_custkey, c_mktsegment, c_acctbal
from tn_customer_flat c
where c_custkey < 10 and c_acctbal <
  (select avg(o_totalprice) from tn_orders_flat o
   where o.o_custkey = c.c_custkey)
order by c_custkey
""",
    "verbatim",
))

SP.append((
    "sp_exists_pred", "nested-types-subplan.test:24",
    """
select c_custkey, c_mktsegment, c_acctbal
from tn_customer c
where c_custkey < 10
  and exists (select o_orderkey from c.c_orders where o_orderkey % 2 = 0)
order by c_custkey
""",
    """
select c_custkey, c_mktsegment, c_acctbal
from tn_customer_flat c
where c_custkey < 10 and exists
  (select 1 from tn_orders_flat o
   where o.o_custkey = c.c_custkey and o_orderkey % 2 = 0)
order by c_custkey
""",
    "verbatim",
))

SP.append((
    "sp_not_exists_pred", "nested-types-subplan.test:25",
    """
select c_custkey, c_mktsegment, c_acctbal
from tn_customer c
where c_custkey < 10
  and not exists (select o_orderkey from c.c_orders
                  where o_orderkey % 2 = 0)
order by c_custkey
""",
    """
select c_custkey, c_mktsegment, c_acctbal
from tn_customer_flat c
where c_custkey < 10 and not exists
  (select 1 from tn_orders_flat o
   where o.o_custkey = c.c_custkey and o_orderkey % 2 = 0)
order by c_custkey
""",
    "verbatim",
))

SP.append((
    "sp_correlated_exists", "nested-types-subplan.test:26",
    """
select c_custkey, c_mktsegment, c_acctbal
from tn_customer c
where c_custkey < 10
  and exists (select o_orderkey from c.c_orders o
              where c.c_acctbal * 10 > o.o_totalprice)
order by c_custkey
""",
    """
select c_custkey, c_mktsegment, c_acctbal
from tn_customer_flat c
where c_custkey < 10 and exists
  (select 1 from tn_orders_flat o
   where o.o_custkey = c.c_custkey
     and c.c_acctbal * 10 > o.o_totalprice)
order by c_custkey
""",
    "verbatim (parent-column correlation inside the subplan pred)",
))

SP.append((
    "sp_with_clause_view", "nested-types-with-clause.test:2 (IMPALA-2414)",
    """
select c_custkey, o_orderkey from tn_customer c join
  (with w1 as (with w2 as (select o_orderkey from c.c_orders) select * from w2)
   select o_orderkey from w1) v
where c_custkey = 4
order by o_orderkey
""",
    """
select c_custkey, o_orderkey
from tn_customer_flat c join tn_orders_flat o on c_custkey = o_custkey
where c_custkey = 4 order by o_orderkey
""",
    "correlated WITH view nested in another WITH, inside a joined "
    "derived table (the enclosing join gets LATERAL)",
))

SP.append((
    "sp_with_clause_outer", "nested-types-with-clause.test:3 (IMPALA-2414)",
    """
with w1 as (select c_custkey, o_orderkey from tn_customer c join
  (with w2 as (select o_orderkey from c.c_orders) select * from w2) v)
select * from w1
where c_custkey = 4
order by o_orderkey
""",
    """
select c_custkey, o_orderkey
from tn_customer_flat c join tn_orders_flat o on c_custkey = o_custkey
where c_custkey = 4 order by o_orderkey
""",
    "correlated WITH view under an outer WITH",
))

SP.append((
    "sp_nested_preds_3level", "nested-types-subplan.test:31",
    """
select c_custkey, c_mktsegment, o_orderkey, o_orderdate, l_linenumber,
       l_shipdate
from tn_customer c, c.c_orders o, o.o_lineitems i
where c_custkey in (1, 2) and o_orderkey % 3 = 0
  and l_linenumber % 2 = 0
order by c_custkey, o_orderkey, l_linenumber, l_shipdate
""",
    """
select c_custkey, c_mktsegment, o_orderkey, o_orderdate, l_linenumber,
       l_shipdate
from tn_customer_flat c
join tn_orders_flat o on c_custkey = o_custkey
join tn_lineitem l on o.o_orderkey = l.l_orderkey
where c_custkey in (1, 2) and o_orderkey % 3 = 0
  and l_linenumber % 2 = 0
order by c_custkey, o_orderkey, l_linenumber, l_shipdate
""",
    "orderkey constants -> modulo predicate (synthetic keys differ)",
))


# ---------------------------------------------------------------------------


def impala_type_name(dt) -> str:
    from pyspark.sql import types as T

    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    return {
        T.BooleanType: "BOOLEAN", T.ByteType: "TINYINT",
        T.ShortType: "SMALLINT", T.IntegerType: "INT",
        T.LongType: "BIGINT", T.FloatType: "FLOAT",
        T.DoubleType: "DOUBLE", T.StringType: "STRING",
        T.DateType: "DATE", T.TimestampType: "TIMESTAMP",
        T.TimestampNTZType: "TIMESTAMP", T.BinaryType: "BINARY",
    }[type(dt)]


def approx(v):
    import datetime
    import decimal

    if isinstance(v, (float, decimal.Decimal)):
        # Spark's decimal avg/division rounds at its result scale (6);
        # DuckDB computes those as full-precision doubles — compare at
        # 6 decimal places (sums stay exact decimals on both sides)
        return round(float(v), 6)
    if isinstance(v, (datetime.date, datetime.datetime)):
        return str(v)[:10]
    return v


def rows_key(rows, ordered):
    out = [tuple(approx(v) for v in r) for r in rows]
    return out if ordered else sorted(out, key=repr)


def main() -> None:
    emit = "--emit" in sys.argv
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    import duckdb

    from hopspark.engine import Engine
    from hopspark.golden import _has_top_level_order_by, canonical_row
    from hopspark.session import get_spark

    spark = get_spark(app_name="tpch-nested-golden")
    eng = Engine(spark=spark, sf_dir=SF_DIR)
    for f in SPARK_FIXTURES:
        eng.sql(f)

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    for f in DUCK_FIXTURES:
        con.execute(f)

    results = {}
    failed = []
    for name, ref, ported, twin, note in Q + SP:
        if names and name not in names:
            continue
        try:
            df = eng.sql(ported)
            srows = df.collect()
        except Exception as exc:  # noqa: BLE001
            failed.append((name, f"SPARK ERROR: {exc}"))
            print(f"[{name}] SPARK ERROR: {str(exc)[:500]}")
            continue
        try:
            drows = con.execute(twin).fetchall()
        except Exception as exc:  # noqa: BLE001
            failed.append((name, f"DUCK ERROR: {exc}"))
            print(f"[{name}] DUCK ERROR: {str(exc)[:500]}")
            continue
        ordered = _has_top_level_order_by(ported)
        sk, dk = rows_key(srows, ordered), rows_key(drows, ordered)
        if sk != dk:
            failed.append((name, "MISMATCH"))
            print(f"[{name}] MISMATCH spark={len(sk)} duck={len(dk)}")
            for a, b in list(zip(sk, dk))[:5]:
                if a != b:
                    print("  spark:", a)
                    print("  duck :", b)
            continue
        types = [impala_type_name(f.dataType) for f in df.schema.fields]
        results[name] = (ported, types, [canonical_row(r) for r in srows],
                         ref, note, len(srows))
        print(f"[{name}] OK rows={len(srows)}")

    if failed:
        print("FAILED:", [n for n, _ in failed])
    if not emit or failed or names:
        return

    def emit_file(fname, header, qlist, fixtures):
        path = os.path.join(REPO, "tests", "golden", fname)
        with open(path, "w") as fh:
            fh.write(header)
            for fx in fixtures:
                fh.write("====\n---- QUERY\n")
                fh.write(fx.strip() + "\n")
                fh.write("---- TYPES\nINT\n---- RESULTS\n")
            for name, ref, ported, twin, note in qlist:
                ported_s, types, rows, _ref, _note, _n = results[name]
                fh.write("====\n")
                fh.write(f"# {name.upper()} — ported from {ref}; {note}.\n")
                fh.write("---- QUERY\n")
                fh.write(ported_s.strip() + "\n")
                fh.write("---- TYPES\n")
                fh.write(", ".join(types) + "\n")
                fh.write("---- RESULTS\n")
                for r in rows:
                    fh.write(r + "\n")
            fh.write("====\n")
        print("wrote", path)

    emit_file("tpch_nested.test", HEADER, Q, SPARK_FIXTURES)
    # file 2 re-declares the fixtures with IF NOT EXISTS so it stays
    # self-contained regardless of golden file ordering (the
    # complextypestbl2.test precedent)
    reserve = [
        fx.replace("CREATE VIEW ", "CREATE VIEW IF NOT EXISTS ", 1)
        for fx in SPARK_FIXTURES
    ]
    emit_file("tpch_nested_subplan.test", SUBPLAN_HEADER, SP, reserve)


HEADER = """# Nested TPC-H — the reference's flagship nested-types benchmark
# (testdata/workloads/tpch_nested/queries/tpch_nested-q*.test; nested
# schema per testdata/bin/load_nested.py: customer.c_orders ARRAY<STRUCT>
# with o_lineitems ARRAY<STRUCT> inside, supplier.s_partsupps,
# region.r_nations).  Fixtures are built at sf0.001 from the flat parquet
# via collect_list; missing reduced-testdata columns (c_phone, o_comment,
# l_commitdate, l_receiptdate, l_shipmode, l_shipinstruct, p_container,
# p_mfgr, partsupp, ...) are SYNTHESIZED deterministically from the keys.
# Query texts are verbatim except: tn_ prefix (db-name fold), constants
# mapped into the synthetic data's domains (dates start 1995, nations are
# NATION_<k>, p_type single words, p_name '<adj> <noun>'), noted per
# query.  Every RESULTS block was verified against a DuckDB flat-table
# twin at port time (tools/gen_tpch_nested_golden.py — rerun it to
# reverify or regenerate).  The dates stay STRING columns exactly like
# load_nested.py's nested schema (string compares on ISO dates).
"""


SUBPLAN_HEADER = """# nested-types-subplan.test ported onto the nested TPC-H fixtures
# (testdata/workloads/functional-query/queries/QueryTest/
# nested-types-subplan.test) — the reference's SubplanNode shape corpus:
# relative unnests with parent+nested predicates, derived tables with
# stars/unions/limits, non-grouping and grouping aggregates, analytic
# functions inside subplans, LEFT OUTER/SEMI/ANTI collection joins,
# collection self-joins, and correlated/uncorrelated scalar/EXISTS
# subqueries over relative refs.  Fixtures are re-declared IF NOT EXISTS
# (same recipe as tpch_nested.test; constants adapted to the synthetic
# sf0.001 key ranges).  Every RESULTS block was verified against a
# DuckDB flat-table twin at port time (tools/gen_tpch_nested_golden.py).
"""


if __name__ == "__main__":
    main()
