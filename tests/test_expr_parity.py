"""expr-test.cc analogue: scalar-function outputs checked against the
reference's documented semantics (SURVEY.md §2.11 function matrix). These
exercise the *native* Spark coverage claimed in the matrix — every row here
is a function a reference user can call unchanged (possibly via the dialect
translator)."""

from __future__ import annotations

import math

import pytest

from hopspark.dialect import translate


def _one(spark, expr: str):
    return spark.sql(translate(f"SELECT {expr} AS v")).head().v


# --- math ------------------------------------------------------------------


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("abs(-7.5)", 7.5),
        ("ceil(1.1)", 2),
        ("floor(-1.1)", -2),
        ("round(2.5)", 3),
        ("truncate(3.79, 1)", 3.7),  # DECIMAL(2,1) — float-compared below
        ("pow(2, 10)", 1024.0),
        ("quotient(11, 3)", 3),
        ("pmod(-3, 5)", 2),
        ("conv('ff', 16, 10)", "255"),
        ("bin(13)", "1101"),
        ("hex(255)", "FF"),
        ("sign(-42)", -1.0),
        ("greatest(1, 9, 4)", 9),
        ("least(1, 9, 4)", 1),
        ("factorial(5)", 120),
        ("degrees(pi())", 180.0),
        ("width_bucket(5.35, 0.0, 10.0, 5)", 3),
        ("mod(10, 3)", 1),
    ],
)
def test_math_functions(spark, expr, expected):
    v = _one(spark, expr)
    if isinstance(expected, float):
        assert float(v) == pytest.approx(expected)
    else:
        assert v == expected


def test_math_edge_cases(spark):
    assert _one(spark, "is_inf(cast('inf' as double))") is True
    # Documented delta: Spark (ANSI off) yields NULL for x/0 even on
    # doubles, where the reference's double division yields ±inf.
    assert _one(spark, "1.0 / 0.0") is None
    assert math.isnan(_one(spark, "cast('nan' as double)"))
    assert _one(spark, "is_nan(cast('nan' as double))") is True
    assert float(_one(spark, "truncate(-3.79, 1)")) == -3.7


# --- string ----------------------------------------------------------------


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("length('héllo')", 6),  # byte semantics: utf8_mode off default
        ("lower('ABC')", "abc"),
        ("initcap('hello world')", "Hello World"),
        ("repeat('ab', 3)", "ababab"),
        ("reverse('abc')", "cba"),
        ("translate('hello', 'el', 'ip')", "hippo"),
        ("trim('  x  ')", "x"),
        ("ltrim('  x')", "x"),
        ("lpad('5', 3, '0')", "005"),
        ("strleft('hello', 2)", "he"),
        ("strright('hello', 2)", "lo"),
        ("substr('hello', 2, 3)", "ell"),
        ("instr('corporate floor', 'or')", 2),
        ("locate('or', 'corporate floor', 3)", 5),
        ("concat('a', 'b', 'c')", "abc"),
        ("concat_ws('-', 'a', 'b')", "a-b"),
        ("find_in_set('b', 'a,b,c')", 2),
        ("split_part('a|b|c', '|', 2)", "b"),
        ("replace('aaa', 'a', 'b')", "bbb"),
        ("ascii('A')", 65),
        ("chr(65)", "A"),
        ("parse_url('https://x.com/p?q=1', 'HOST')", "x.com"),
        ("parse_url('https://x.com/p?q=1', 'QUERY', 'q')", "1"),
        ("regexp_extract('abc123', '([0-9]+)', 1)", "123"),
        ("regexp_replace('a1b2', '[0-9]', '')", "ab"),
        ("levenshtein('kitten', 'sitting')", 3),
        ("get_json_object('{\"a\": {\"b\": 7}}', '$.a.b')", "7"),
        ("space(3)", "   "),
        ("btrim('xxhixx', 'x')", "hi"),
    ],
)
def test_string_functions(spark, expr, expected):
    assert _one(spark, expr) == expected


# --- conditional -----------------------------------------------------------


@pytest.mark.parametrize(
    "expr,expected",
    [
        ("if(1 < 2, 'y', 'n')", "y"),
        ("nvl(NULL, 7)", 7),
        ("nvl2(NULL, 'a', 'b')", "b"),
        ("ifnull(NULL, 3)", 3),
        ("nullif(5, 5)", None),
        ("nullifzero(0.0)", None),
        ("zeroifnull(CAST(NULL AS DOUBLE))", 0.0),
        ("coalesce(NULL, NULL, 9)", 9),
        ("decode(2, 1, 'one', 2, 'two', 'other')", "two"),
        ("isnull(NULL, 42)", 42),
    ],
)
def test_conditional_functions(spark, expr, expected):
    assert _one(spark, expr) == expected


# --- date/time -------------------------------------------------------------


def test_datetime_functions(spark):
    import datetime as dt

    assert _one(spark, "year(timestamp'2020-06-15 10:30:00')") == 2020
    assert _one(spark, "quarter(timestamp'2020-06-15')") == 2
    assert _one(spark, "month(timestamp'2020-06-15')") == 6
    assert _one(spark, "day(timestamp'2020-06-15')") == 15
    assert _one(spark, "dayofweek(timestamp'2020-06-15')") == 2  # Monday
    assert _one(spark, "dayofyear(timestamp'2020-02-01')") == 32
    assert _one(spark, "week(timestamp'2020-01-15')") == 3
    assert _one(spark, "hour(timestamp'2020-06-15 10:30:00')") == 10
    assert _one(spark, "datediff(timestamp'2020-01-10', timestamp'2020-01-01')") == 9
    assert _one(spark, "date_trunc('month', timestamp'2020-06-15 10:30:00')") == dt.datetime(
        2020, 6, 1
    )
    assert _one(spark, "last_day(timestamp'2020-02-10')") == dt.datetime(
        2020, 2, 29, 0, 0
    )  # TIMESTAMP overload returns TIMESTAMP at midnight (LastDay:587-596)
    assert _one(spark, "months_between(timestamp'2020-03-01', timestamp'2020-01-01')") == 2.0
    # type-preserving + keep-last-day month contract (AddMonths,
    # timestamp-functions-ir.cc:619-647)
    assert _one(spark, "add_months(timestamp'2020-01-31', 1)") == dt.datetime(2020, 2, 29)
    assert _one(spark, "months_add(date'2023-02-28', 1)") == dt.date(2023, 3, 31)
    assert _one(spark, "months_add_interval(date'2023-02-28', 1)") == dt.date(2023, 3, 28)
    assert (
        _one(spark, "unix_timestamp(timestamp'1970-01-01 00:01:00')") == 60
    )
    assert _one(spark, "from_unixtime(60, 'yyyy-MM-dd HH:mm:ss')") == "1970-01-01 00:01:00"
    assert _one(spark, "dayname(timestamp'2020-06-15')") == "Monday"
    assert _one(spark, "monthname(timestamp'2020-06-15')") == "June"
    assert _one(spark, "extract(year FROM timestamp'2020-06-15')") == 2020


# --- hash / misc -----------------------------------------------------------


def test_hash_and_misc(spark):
    assert _one(spark, "md5('abc')") == "900150983cd24fb0d6963f7d28e17f72"
    assert _one(spark, "sha1('abc')") == "a9993e364706816aba3e25717850c26c9cd0d89d"
    assert (
        _one(spark, "sha2('abc', 256)")
        == "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad"
    )
    assert len(_one(spark, "uuid()")) == 36
    assert _one(spark, "base64encode('x')") == "eA=="
    # r8: integer literals take the reference's smallest-fit type
    assert _one(spark, "typeof(1)") == "TINYINT"
    assert _one(spark, "current_database()") is not None


# --- decimal arithmetic (DECIMAL_V2 discipline) ----------------------------


def test_decimal_arithmetic_matches_oracle(spark):
    """Decimal +,-,*,/,% on fixed literals must match DuckDB to 1e-9 —
    result *scales* differ per engine rulebook (documented), values agree
    (reference: be/src/exprs/decimal-operators-ir.cc, DECIMAL_V2)."""
    import duckdb

    exprs = [
        "CAST(1.23 AS DECIMAL(10,2)) + CAST(4.567 AS DECIMAL(10,3))",
        "CAST(1.23 AS DECIMAL(10,2)) - CAST(4.567 AS DECIMAL(10,3))",
        "CAST(1.23 AS DECIMAL(10,2)) * CAST(4.56 AS DECIMAL(10,2))",
        "CAST(10 AS DECIMAL(10,2)) / CAST(3 AS DECIMAL(10,2))",
        "CAST(10 AS DECIMAL(10,2)) % CAST(3 AS DECIMAL(10,2))",
    ]
    con = duckdb.connect()
    for e in exprs:
        got = spark.sql(f"SELECT {e} AS v").head().v
        want = con.execute(f"SELECT {e} AS v").fetchone()[0]
        assert got is not None and want is not None, e
        assert float(got) == pytest.approx(float(want), abs=1e-9), e
    # Engine delta (documented): Spark widens the multiplication result type
    # like the reference's DECIMAL_V2 (result (21,4)); DuckDB raises unless
    # explicitly widened.
    big = spark.sql(
        "SELECT CAST(99999999.99 AS DECIMAL(10,2)) * CAST(99999999.99 AS DECIMAL(10,2)) AS v"
    ).head().v
    assert float(big) == pytest.approx(99999999.99**2, rel=1e-12)


def test_decimal_38_cap(spark):
    """MAX_PRECISION is 38 in both engines (ScalarType.java:64-65)."""
    v = spark.sql(
        "SELECT CAST(1 AS DECIMAL(38,0)) + CAST(1 AS DECIMAL(38,0)) AS v"
    ).head().v
    assert int(v) == 2
