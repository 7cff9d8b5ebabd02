"""Port the REMAINING subquery.test rows (the 41 needing the functional
``alltypes`` base table, ``decimal_tbl``, ``date_tbl``, or
``alltypes_view`` — testdata/workloads/functional-query/queries/
QueryTest/subquery.test) as tests/golden/subquery_alltypes2.test.

``alltypes`` is an EXACT reproduction of the reference's
TestDataGenerator.GenerateAllTypesData(24, 310)
(java/datagenerator/src/main/java/org/apache/impala/datagenerator/
TestDataGenerator.java:40-113): 24 month partitions 2009-2010, 10
int_col tuples per day, and the generator's characteristic timestamp
DRIFT — each tuple advances the calendar by 1 minute + bigint_col ms, so
day d of a month starts at (d-1)x(10min+450ms) past midnight and tuple i
adds i minutes + 5*i*(i-1) ms.  This script reproduces the Java loop in
Python, builds the SQL fixture, and asserts the two agree row-for-row
before verifying every ported query against a DuckDB twin loaded from
the Python rows.

decimal_tbl / date_tbl are the reference's 5- and 22-row fixtures
(values pinned by iceberg-insert.test:59 and date.test:1 dumps).

Usage: PYTHONPATH=. python tools/gen_subquery_alltypes2.py [--emit] [names]
"""

from __future__ import annotations

import datetime
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def gen_alltypes_rows():
    """Python twin of GenerateAllTypesData(24, 310)."""
    rows = []
    rid = 0
    for m in range(24):
        year = 2009 + m // 12
        mon = m % 12 + 1
        date = datetime.datetime(year, mon, 1)
        end = (
            datetime.datetime(year + 1, 1, 1) if mon == 12
            else datetime.datetime(year, mon + 1, 1)
        )
        count = 0
        while date < end and count < 310:
            for i in range(10):
                if count >= 310:
                    break
                # the generator formats the Calendar with
                # SimpleDateFormat "HH:mm:ss.S": the MILLISECOND field
                # prints as a bare digit string (10 ms -> ".10") and
                # reloads as fraction digits(ms)/10^len — reproduce
                # that reinterpretation for the stored timestamp
                ms = date.microsecond // 1000
                if ms == 0:
                    frac_us = 0
                elif ms < 10:
                    frac_us = ms * 100_000
                elif ms < 100:
                    frac_us = ms * 10_000
                else:
                    frac_us = ms * 1_000
                stored_ts = date.replace(microsecond=frac_us)
                rows.append((
                    rid,
                    rid % 2 == 0,
                    i,           # tinyint_col (i%10)
                    i,           # smallint_col (i%100)
                    i,           # int_col
                    i * 10,      # bigint_col
                    float(f"{1.1 * i:.7g}"),  # float32 of 1.1*i
                    10.1 * i,
                    date.strftime("%m/%d/%y"),
                    str(i),
                    stored_ts,   # timestamp_col (".S" reinterpreted)
                    year,
                    mon,
                ))
                rid += 1
                count += 1
                date += datetime.timedelta(minutes=1, milliseconds=i * 10)
            # the +1 day lands after the intra-day drift
            date += datetime.timedelta(days=1)
            # re-anchor? No: the Java Calendar keeps the drift — the next
            # day STARTS at the drifted time.
    return rows


ALLTYPES_SQL = """
CREATE VIEW alltypes AS
WITH g AS (
  SELECT m, d, i,
         make_date(2009 + CAST(m / 12 AS INT), CAST(m % 12 AS INT) + 1, 1)
           AS month_start
  FROM (SELECT explode(sequence(0, 23)) AS m)
  LATERAL VIEW explode(sequence(1, 31)) AS d
  LATERAL VIEW explode(sequence(0, 9)) AS i
),
f AS (
  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY m, d, i) - 1 AS INT) AS id,
         (d - 1) * 450 + 5 * i * (i - 1) AS dms
  FROM g WHERE d <= day(last_day(month_start))
)
SELECT id, id % 2 = 0 AS bool_col,
       CAST(i AS TINYINT) AS tinyint_col,
       CAST(i AS SMALLINT) AS smallint_col,
       CAST(i AS INT) AS int_col,
       CAST(i * 10 AS BIGINT) AS bigint_col,
       CAST(1.1 * i AS FLOAT) AS float_col,
       CAST(10.1 AS DOUBLE) * i AS double_col,
       date_format(month_start + make_dt_interval(d - 1), 'MM/dd/yy')
         AS date_string_col,
       CAST(i AS STRING) AS string_col,
       CAST(month_start AS TIMESTAMP)
         + make_dt_interval(d - 1, 0, (d - 1) * 10 + i,
             FLOOR(dms / 1000)
             + CASE WHEN dms % 1000 = 0 THEN 0
                    WHEN dms % 1000 < 10 THEN (dms % 1000) / 10
                    WHEN dms % 1000 < 100 THEN (dms % 1000) / 100
                    ELSE (dms % 1000) / 1000 END)
         AS timestamp_col,
       year(month_start) AS year, month(month_start) AS month
FROM f
"""

DECIMAL_TBL_SQL = """
CREATE VIEW decimal_tbl AS
SELECT CAST(d1 AS DECIMAL(9,0)) AS d1, CAST(d2 AS DECIMAL(10,0)) AS d2,
       CAST(d3 AS DECIMAL(20,10)) AS d3, CAST(d4 AS DECIMAL(38,38)) AS d4,
       CAST(d5 AS DECIMAL(10,5)) AS d5, CAST(d6 AS DECIMAL(9,0)) AS d6
FROM VALUES
  (1234, 2222, 1.2345678900, 0.12345678900000000000000000000000000000,
   12345.78900, 1),
  (2345, 111, 12.3456789000, 0.12345678900000000000000000000000000000,
   3.14100, 1),
  (12345, 333, 123.4567890000, 0.12345678900000000000000000000000000000,
   11.22000, 1),
  (12345, 333, 1234.5678900000, 0.12345678900000000000000000000000000000,
   0.10000, 1),
  (132842, 333, 12345.6789000000, 0.12345678900000000000000000000000000000,
   0.77889, 1) AS t(d1, d2, d3, d4, d5, d6)
"""

DATE_TBL_SQL = """
CREATE VIEW date_tbl AS
SELECT CAST(id_col AS INT) AS id_col, CAST(date_part AS DATE) AS date_part,
       CAST(date_col AS DATE) AS date_col
FROM VALUES
  (0, '0001-01-01', '0001-01-01'), (1, '0001-01-01', '0001-12-31'),
  (2, '0001-01-01', '0002-01-01'), (3, '0001-01-01', '1399-12-31'),
  (4, '0001-01-01', '2017-11-28'), (5, '0001-01-01', '9999-12-31'),
  (6, '0001-01-01', NULL),
  (10, '1399-06-27', '2017-11-28'), (11, '1399-06-27', NULL),
  (12, '1399-06-27', '2018-12-31'),
  (20, '2017-11-27', '0001-06-21'), (21, '2017-11-27', '0001-06-22'),
  (22, '2017-11-27', '0001-06-23'), (23, '2017-11-27', '0001-06-24'),
  (24, '2017-11-27', '0001-06-25'), (25, '2017-11-27', '0001-06-26'),
  (26, '2017-11-27', '0001-06-27'), (27, '2017-11-27', '0001-06-28'),
  (28, '2017-11-27', '0001-06-29'), (29, '2017-11-27', '2017-11-28'),
  (30, '9999-12-31', '9999-12-01'), (31, '9999-12-31', '9999-12-31')
  AS t(id_col, date_part, date_col)
"""

DIMTBL_SQL = """
CREATE VIEW dimtbl AS
SELECT CAST(id AS BIGINT) AS id, CAST(name AS STRING) AS name,
       CAST(zip AS INT) AS zip
FROM VALUES
  (1001, 'Name1', 94611), (1002, 'Name2', 94611),
  (1003, 'Name3', 94612), (1004, 'Name4', 94612),
  (1005, 'Name5', 94613), (1006, 'Name6', 94613),
  (1007, 'Name7', 94614), (1008, 'Name8', 94614),
  (1009, 'Name9', 94615), (1010, 'Name10', 94615)
  AS t(id, name, zip)
"""

ALLTYPES_VIEW_SQL = """
CREATE VIEW alltypes_view AS SELECT * FROM alltypes
"""

# the three fixtures subquery_alltypes.test already declares — re-declared
# IF NOT EXISTS so this file is self-contained
TINY_SMALL_AGG = None  # filled in main() from the sibling golden file


def main() -> None:
    emit = "--emit" in sys.argv
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    import duckdb

    from hopspark.engine import Engine
    from hopspark.golden import (
        _has_top_level_order_by, canonical_row, parse_test_file,
    )
    from hopspark.session import get_spark

    spark = get_spark(app_name="subquery-alltypes2")
    eng = Engine(spark=spark, sf_dir="/root/testdata/sf0.001")

    # sibling fixtures (alltypestiny/small/agg), re-usable verbatim
    sib = parse_test_file(
        os.path.join(REPO, "tests", "golden", "subquery_alltypes.test")
    )
    sibling_fixtures = [
        c.query.strip() for c in sib[:3]
        if c.query.lstrip().upper().startswith("CREATE VIEW")
    ]
    assert len(sibling_fixtures) == 3, "sibling fixtures moved"
    fixtures = sibling_fixtures + [
        ALLTYPES_SQL.strip(), DECIMAL_TBL_SQL.strip(),
        DATE_TBL_SQL.strip(), DIMTBL_SQL.strip(),
        ALLTYPES_VIEW_SQL.strip(),
    ]
    import re as _re

    for fx in fixtures:
        eng.sql(_re.sub(
            r"^CREATE VIEW (IF NOT EXISTS )?", "CREATE VIEW IF NOT EXISTS ",
            fx.strip(), count=1,
        ))

    # ---- fixture exactness: SQL vs the Java-twin Python rows ----------
    py_rows = gen_alltypes_rows()
    got = [tuple(r) for r in spark.sql(
        "SELECT id, bool_col, CAST(tinyint_col AS INT),"
        " CAST(smallint_col AS INT), int_col, bigint_col,"
        " float_col, double_col, date_string_col, string_col,"
        " timestamp_col, year, month FROM alltypes ORDER BY id"
    ).collect()]
    assert len(got) == len(py_rows) == 7300, (len(got), len(py_rows))
    for a, b in zip(got, py_rows):
        ax = (a[0], a[1], a[2], a[3], a[4], a[5], round(a[6], 5), a[7],
              a[8], a[9], a[10], a[11], a[12])
        bx = (b[0], b[1], b[2], b[3], b[4], b[5], round(b[6], 5), b[7],
              b[8], b[9], b[10], b[11], b[12])
        assert ax == bx, f"fixture drift at id {a[0]}:\n {ax}\n {bx}"
    print("alltypes fixture: 7300 rows exact vs the Java-twin generator")

    # ---- DuckDB twins --------------------------------------------------
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE alltypes (id INT, bool_col BOOLEAN,"
        " tinyint_col TINYINT, smallint_col SMALLINT, int_col INT,"
        " bigint_col BIGINT, float_col FLOAT, double_col DOUBLE,"
        " date_string_col VARCHAR, string_col VARCHAR,"
        " timestamp_col TIMESTAMP, year INT, month INT)"
    )
    con.executemany(
        "INSERT INTO alltypes VALUES (?,?,?,?,?,?,?,?,?,?,?,?,?)", py_rows
    )
    con.execute("CREATE VIEW alltypes_view AS SELECT * FROM alltypes")
    duck_ty = {
        "IntegerType()": "INTEGER", "LongType()": "BIGINT",
        "ShortType()": "SMALLINT", "ByteType()": "TINYINT",
        "BooleanType()": "BOOLEAN", "FloatType()": "FLOAT",
        "DoubleType()": "DOUBLE", "StringType()": "VARCHAR",
        "TimestampType()": "TIMESTAMP", "DateType()": "DATE",
    }
    for name, spark_sql in (
        ("alltypestiny", sibling_fixtures[0]),
        ("alltypessmall", sibling_fixtures[1]),
        ("alltypesagg", sibling_fixtures[2]),
    ):
        body = spark_sql.split("AS", 1)[1]
        df = spark.sql(body)
        rows = [tuple(r) for r in df.collect()]
        decls = ", ".join(
            f'"{f.name}" {duck_ty[repr(f.dataType)]}'
            for f in df.schema.fields
        )
        ph = ",".join("?" * len(df.columns))
        con.execute(f"CREATE TABLE {name} ({decls})")
        con.executemany(f"INSERT INTO {name} VALUES ({ph})", rows)
    con.execute(DECIMAL_TBL_SQL.replace("CREATE VIEW", "CREATE VIEW", 1)
                .replace("explode", "unnest"))
    con.execute(DATE_TBL_SQL)
    con.execute(DIMTBL_SQL.replace(" AS STRING)", " AS VARCHAR)"))

    from queries_subquery2 import Q  # noqa: E402 - sibling module

    results = {}
    failed = []
    for name, ref, ported, twin, note in Q:
        if names and name not in names:
            continue
        if twin.startswith("CATCH:"):
            want = twin[len("CATCH:"):]
            try:
                eng.sql(ported).collect()
                failed.append(name)
                print(f"[{name}] expected error containing {want!r}")
            except Exception as exc:  # noqa: BLE001
                if want in str(exc):
                    results[name] = (ported, None, want)
                    print(f"[{name}] OK (caught)")
                else:
                    failed.append(name)
                    print(f"[{name}] wrong error: {str(exc)[:160]}")
            continue
        try:
            df = eng.sql(ported)
            srows = df.collect()
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"[{name}] SPARK ERROR: {str(exc)[:300]}")
            continue
        try:
            drows = con.execute(twin).fetchall()
        except Exception as exc:  # noqa: BLE001
            failed.append(name)
            print(f"[{name}] DUCK ERROR: {str(exc)[:300]}")
            continue
        from gen_tpch_nested_golden import impala_type_name, rows_key

        ordered = _has_top_level_order_by(ported)
        sk, dk = rows_key(srows, ordered), rows_key(drows, ordered)
        if sk != dk:
            failed.append(name)
            print(f"[{name}] MISMATCH spark={len(sk)} duck={len(dk)}")
            for a, b in list(zip(sk, dk))[:4]:
                if a != b:
                    print("  spark:", a)
                    print("  duck :", b)
            continue
        types = [impala_type_name(f.dataType) for f in df.schema.fields]
        results[name] = (ported, types, [canonical_row(r) for r in srows])
        print(f"[{name}] OK rows={len(srows)}")

    if failed:
        print("FAILED:", failed)
    if not emit or failed or names:
        return
    path = os.path.join(REPO, "tests", "golden", "subquery_alltypes2.test")
    with open(path, "w") as fh:
        fh.write(HEADER)
        for fx in fixtures:
            fh.write("====\n---- QUERY\n")
            fh.write(_re.sub(
                r"^CREATE VIEW (IF NOT EXISTS )?",
                "CREATE VIEW IF NOT EXISTS ", fx.strip(), count=1,
            ) + "\n")
            fh.write("---- TYPES\nINT\n---- RESULTS\n")
        for name, ref, ported, twin, note in Q:
            ported_s, types, rows = results[name]
            fh.write("====\n")
            fh.write(f"# {name} — {ref}; {note}.\n")
            fh.write("---- QUERY\n")
            fh.write(ported_s.strip() + "\n")
            if types is None:
                fh.write("---- CATCH\n")
                fh.write(rows + "\n")
                continue
            fh.write("---- TYPES\n")
            fh.write(", ".join(types) + "\n")
            fh.write("---- RESULTS\n")
            for r in rows:
                fh.write(r + "\n")
        fh.write("====\n")
    print("wrote", path)


HEADER = """# subquery.test port, wave 2 — the rows needing the functional
# ``alltypes`` base table (an EXACT SQL reproduction of the reference's
# TestDataGenerator.GenerateAllTypesData(24, 310), incl. the generator's
# intra-month timestamp drift — tools/gen_subquery_alltypes2.py asserts
# the fixture row-for-row against a Python twin of the Java loop),
# ``decimal_tbl`` (5 rows, iceberg-insert.test:59 dump), ``date_tbl``
# (22 rows, date.test:1 dump) and ``alltypes_view``.  Every RESULTS
# block was verified against a DuckDB twin at port time.  Fixtures are
# declared IF NOT EXISTS (subquery_alltypes.test may already hold the
# tiny/small/agg views).
"""


if __name__ == "__main__":
    main()
