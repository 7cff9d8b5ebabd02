"""Query list for gen_subquery_alltypes2.py — the subquery.test remainder
(reference row numbers in each ref tag).  Ported text is the reference's
verbatim minus the ``functional.`` db prefix; twins adjust only for
DuckDB dialect.  r12: #77 landed with the dimtbl fixture
(testdata/DimTbl/data.csv) — the file is now 41/41."""

Q: list[tuple[str, str, str, str, str]] = []


def _add(num, ported, duck=None, note="verbatim"):
    Q.append((f"sq2_{num:02d}", f"subquery.test#{num}", ported,
              duck or ported, note))


_add(1, """
select a.id, a.int_col, a.string_col
from alltypes a
where a.int_col in (select int_col from alltypesagg where int_col is not null)
and a.id < 5
order by a.id
""", note="verbatim + ORDER BY (our canon sorts per top-level ORDER BY)")

_add(2, """
select a.id, a.int_col, a.string_col
from alltypes a
where a.id in (select int_col from alltypesagg where int_col is null)
and a.id < 5
""")

_add(3, """
select id, year, month
from alltypessmall
where id not in (select id from alltypestiny where bool_col = false)
and id < 5
order by id
""", note="verbatim + ORDER BY")

_add(10, """
select s.id, s.bool_col, s.int_col, s.date_string_col
from alltypessmall s
where s.id in (select id from alltypestiny t where t.int_col = s.int_col)
and s.bool_col = false
order by s.id
""", note="verbatim + ORDER BY")

_add(26, """
select id, int_col, year, month
from alltypessmall
where int_col = (select count(*) from alltypestiny)
order by id
""")

_add(27, """
select id, int_col, year, month
from alltypessmall s
where s.int_col = (select count(*) from alltypestiny t where s.id = t.id)
order by id
""")

_add(28, """
select id, bool_col, int_col, date_string_col
from alltypessmall s
where s.id in (select id from alltypestiny where bool_col = true)
and exists
  (select *
   from alltypesagg g
   where s.int_col = g.int_col and g.bigint_col < 100)
and s.int_col < (select count(*) from alltypes where month = 1)
order by s.id
""", note="verbatim + ORDER BY")

_add(29, """
select month, count(*)
from alltypessmall s
where id in
  (select id
   from alltypestiny t
   where t.int_col <
     (select min(int_col)
      from alltypesagg a
      where a.bool_col = false and exists
      (select * from alltypes b where b.id = a.id)))
group by month
order by month
""", note="verbatim + ORDER BY (triple-nested subqueries)")

_add(30, """
select t.id, t.month, t.year
from alltypestiny t left outer join alltypessmall s
on s.id = t.id
where t.int_col <
  (select avg(a.int_col) * 2
   from alltypesagg a left outer join alltypes b
   on a.bigint_col = b.bigint_col
   where a.id = t.id and b.int_col < 10)
order by t.id
""", note="correlated scalar agg over an outer join")

_add(31, """
with t as
  (select *
   from alltypessmall
   where id in
     (select id
      from alltypestiny
      where bool_col = false))
select id, month, year from t where t.int_col =
  (select count(*) from alltypestiny where id < 5)
order by id
""", note="verbatim + ORDER BY (subquery inside a WITH body)")

_add(32, """
select s.id, s.year
from alltypessmall s left outer join
  (select *
   from alltypestiny t
   where t.id in (select id from alltypesagg)) b
on (s.id = b.id)
where s.int_col < (select max(int_col) from alltypes) and s.id < 10
order by s.id
""")

_add(33, """
select id, double_col
from alltypestiny
where double_col < (select min(d3) from decimal_tbl)
order by id
""", note="functional.decimal_tbl -> decimal_tbl (db prefix folded)")

_add(34, """
select d1, d2, d3
from decimal_tbl
where d3 < (select max(double_col) from alltypestiny)
""", note="functional.decimal_tbl -> decimal_tbl")

_add(35, """
select id, timestamp_col
from alltypestiny
where timestamp_col <= (select max(date_col)
  from date_tbl)
order by id
""", note="functional.date_tbl -> date_tbl; DATE-vs-TIMESTAMP compare")

_add(36, """
select date_col
from date_tbl
where date_col >= DATE '1400-01-01' AND date_col >= (select max(timestamp_col)
  from alltypestiny)
order by date_col
""", note="verbatim + ORDER BY")

_add(46, """
select id, int_col
from alltypesagg a
where exists
  (select id, sum(int_col) over (partition by bool_col)
   from alltypes b
   where a.id = b.id and b.bigint_col < 100
   group by id, int_col, bool_col
   order by id)
and id < 5
order by id
""", """
select id, int_col
from alltypesagg a
where exists
  (select 1 from alltypes b where a.id = b.id and b.bigint_col < 100)
and id < 5
order by id
""", note="EXISTS body with analytic+group-by (twin reduces to the "
          "equivalent existence test)")

_add(48, """
SELECT COUNT(t1.id) AS int_col_1
FROM alltypes t1
WHERE t1.month IN
    (SELECT tt1.tinyint_col AS tinyint_col_1
     FROM alltypes tt1
     WHERE t1.month = tt1.tinyint_col)
  AND EXISTS
    (SELECT MIN(tt1.tinyint_col) AS tinyint_col_1
     FROM alltypestiny tt1)
  AND
    (SELECT t1.year AS int_col_1
     FROM alltypes t1
     ORDER BY t1.year ASC LIMIT 1) = t1.id
""")

_add(49, """
SELECT COUNT(t1.id) AS int_col_1
FROM alltypestiny t1
WHERE t1.month IN
    (SELECT tt1.tinyint_col AS tinyint_col_1
     FROM alltypes tt1
     WHERE t1.month = tt1.tinyint_col)
  AND EXISTS
    (SELECT MIN(tt1.tinyint_col) AS tinyint_col_1
     FROM alltypestiny tt1)
  AND
    (SELECT t1.year AS int_col_1
     FROM alltypes t1
     ORDER BY t1.year ASC LIMIT 1) = t1.id
""")

_add(50, """
select count(t1.c) over () from
  (select max(int_col) c from alltypestiny) t1
where t1.c not in
  (select sum(t1.smallint_col) from alltypes t1)
""")

_add(51, """
select count(*)
FROM alltypesagg t1
WHERE day IS NOT NULL
AND t1.int_col NOT IN
  (SELECT tt1.month AS tinyint_col_1
   FROM alltypesagg tt1
   LEFT JOIN alltypestiny tt2 ON tt2.year = tt1.id
      AND t1.bigint_col = tt2.smallint_col)
""", """
select count(*)
FROM alltypesagg t1
WHERE day IS NOT NULL
AND t1.int_col NOT IN (SELECT tt1.month FROM alltypesagg tt1)
""", note="correlated NOT IN whose correlation sits in a LEFT JOIN's ON "
          "(the ON clause cannot remove tt1 rows, so the IN-list is the "
          "full month set — the twin drops the no-op join)")

_add(55, """
SELECT t1.bigint_col
FROM alltypestiny t1
WHERE NOT EXISTS
  (SELECT SUM(smallint_col) AS int_col
   FROM alltypestiny
   WHERE t1.date_string_col = string_col AND t1.timestamp_col = timestamp_col)
GROUP BY t1.bigint_col
ORDER BY t1.bigint_col
""", note="NOT EXISTS over an ungrouped agg is ALWAYS false (an "
          "ungrouped agg returns one row) — verbatim + ORDER BY")

_add(56, """
SELECT t1.bigint_col
FROM alltypestiny t1
WHERE EXISTS
  (SELECT SUM(smallint_col) AS int_col
   FROM alltypestiny
   WHERE t1.date_string_col = string_col AND t1.timestamp_col = timestamp_col)
GROUP BY t1.bigint_col
ORDER BY t1.bigint_col
""", note="EXISTS over an ungrouped agg is ALWAYS true")

_add(65, """
SELECT count(id) FROM alltypes
WHERE int_col =
  (SELECT int_col
   FROM alltypessmall
   WHERE id = 1)
""")

_add(66, """
SELECT count(id) FROM alltypes
WHERE int_col =
  3 * (SELECT int_col
       FROM alltypessmall
       WHERE id = 1)
""")

_add(67, """
SELECT a FROM (values(1 a),(2),(3)) v
WHERE a = (SELECT x FROM (values(1 x),(2),(3)) v)
""", "CATCH:than one row",
     note="Impala VALUES inline aliases; the reference expects the "
          "cardinality error (CATCH)")

_add(68, """
SELECT id FROM alltypes
WHERE id = (SELECT bigint_col FROM alltypes_view)
""", "CATCH:than one row",
     note="functional.alltypes_view -> alltypes_view; >1-row scalar "
          "subquery raises the cardinality error (CATCH)")

_add(69, """
select count(*) from alltypes
where 7 = (select id from alltypestiny
           order by id limit 8 offset 7)
""", note="scalar subquery with LIMIT+OFFSET (one row survives)")

_add(70, """
select count(*) from alltypes
where int_col = (select f.id from (
                 select * from alltypes order by 1 limit 1) f)
""")

_add(73, """
select s.id, (select count(id) from alltypes) from alltypestiny t
  left outer join alltypessmall s on t.id = s.id where s.bool_col
order by id
""", """
select s.id, (select count(id) from alltypes) as c from alltypestiny t
  left outer join alltypessmall s on t.id = s.id where s.bool_col
order by s.id
""", note="uncorrelated scalar subquery in the select list")

_add(74, """
select id, (select count(id) from alltypessmall where id=t.id)
  from alltypestiny t
order by id
""", """
select id, (select count(id) from alltypessmall where id=t.id) as c
  from alltypestiny t
order by id
""", note="correlated scalar COUNT in the select list")

_add(77, """
select count(id) from
  (select id,
    (select count(*) as cnt from alltypestiny where int_col
    <= (select max(int_col) from alltypes_view)) as c from dimtbl) T
  where t.c <10
""", """
select count(id) from
  (select id,
    (select count(*) as cnt from alltypestiny where int_col
    <= (select max(int_col) from alltypes_view)) as c from dimtbl) T
  where t.c <10
""", note="verbatim minus the functional. prefix; needs the dimtbl "
          "fixture (testdata/DimTbl/data.csv, 10 rows)")

_add(89, """
select id, timestamp_col from alltypes
where (timestamp_col between '2009-04-13' and '2009-04-14') or
    id in (select int_col from alltypestiny)
order by id
""", """
select id, timestamp_col from alltypes
where (timestamp_col between timestamp '2009-04-13' and
       timestamp '2009-04-14') or
    id in (select int_col from alltypestiny)
order by id
""", note="IN subquery under OR (the reference rewrites via a UNION "
          "plan); + ORDER BY")

_add(90, """
select year, id, int_col, string_col, date_string_col
from alltypes
where (int_col = 9 and date_string_col > '12/31/00') or
  (year = 2010 and date_string_col > '12/28/10' and
    string_col in (select min(string_col) from alltypestiny))
order by year, id
""", note="verbatim + ORDER BY")

_add(91, """
select year, month, min(id)
from alltypes
group by year, month
having (year = 2010 and month > 11) or
  min(id) in (select int_col from alltypestiny)
order by year, month
""", """
select year, month, min(id) as m
from alltypes
group by year, month
having (year = 2010 and month > 11) or
  min(id) in (select int_col from alltypestiny)
order by year, month
""", note="IN subquery under OR inside HAVING; + ORDER BY")

_add(92, """
select id from alltypes t
where id % 1234 = 0 or
   t.id <= (select min(id) from alltypesagg g where t.int_col = g.int_col)
order by id
""", note="correlated scalar under OR; + ORDER BY")

_add(93, """
select id, int_col from alltypes t
where t.id = 42 or t.int_col IN (
  select int_col from alltypesagg where id in (1000,2000,3000,4000))
order by id
""", note="verbatim + ORDER BY")

_add(94, """
select id, (select min(int_col) from alltypes having min(int_col) < 0)
from alltypestiny
order by id
""", """
select id, (select min(int_col) from alltypes having min(int_col) < 0)
  as m
from alltypestiny
order by id
""", note="scalar subquery with HAVING that filters the lone agg row "
          "to empty -> NULL")

_add(95, """
select id from alltypestiny
where int_col in (select int_col from alltypes where id % 2 = 0)
order by id
""", note="verbatim + ORDER BY")

_add(97, """
select id from alltypestiny
where exists (select int_col from alltypes where id % 2 = 0)
order by id
""", note="verbatim + ORDER BY")

_add(98, """
select count(*) from alltypesagg t1
where int_col in (
  select int_col from alltypes t2
  where t1.bool_col = t2.bool_col and id is not null)
""", note="correlated IN with an extra equality")

_add(99, """
select id from alltypesagg t1
where int_col in (
    select count(*)
    from alltypes t2
    group by int_col, tinyint_col)
order by id
""", note="IN over a grouped COUNT; + ORDER BY")
