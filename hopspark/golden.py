"""Golden-file `.test` runner — the reference's primary E2E test discipline.

Re-implements the *format contract* of Impala's workload files (section
markers parsed by `tests/util/test_file_parser.py:97-99`; corpora under
`testdata/workloads/functional-query/queries/QueryTest/` — 389 files) on
our engine, without copying its parser:

    ====
    ---- QUERY
    select r_regionkey, r_name from region order by r_regionkey
    ---- TYPES
    INT, STRING
    ---- RESULTS
    0,'AFRICA'
    ...
    ====

Sections supported: QUERY (Impala-dialect SQL, run through Engine.sql so
the dialect layer is exercised), TYPES (Impala type names checked against
the result schema), RESULTS (canonical row text; order-insensitive unless
the query has a top-level ORDER BY — the reference's VERIFY_IS_EQUAL_SORTED
default, impala_test_suite.py:525-546), CATCH (expected error substring).

Canonical value text: NULL, true/false, integers/decimals verbatim,
strings in single quotes, dates as YYYY-MM-DD, doubles via repr (corpus
sticks to exactly-representable values).
"""

from __future__ import annotations

import csv
import datetime
import decimal
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

_SECTION = re.compile(r"^---- (\w+)\s*$")

# Impala type name → acceptable Spark types (PrimitiveType.java:25-58)
_TYPE_MAP: dict[str, tuple] = {
    "BOOLEAN": (T.BooleanType,),
    "TINYINT": (T.ByteType,),
    "SMALLINT": (T.ShortType,),
    "INT": (T.IntegerType,),
    "BIGINT": (T.LongType,),
    "FLOAT": (T.FloatType,),
    "DOUBLE": (T.DoubleType,),
    "STRING": (T.StringType,),
    "DATE": (T.DateType,),
    "TIMESTAMP": (T.TimestampType, T.TimestampNTZType),
    "BINARY": (T.BinaryType,),
    # a bare NULL literal column types as `null` in the reference
    # (joins.test's VALUES(NULL c, ...) rows)
    "NULL": (T.NullType,),
}


@dataclass
class GoldenCase:
    query: str = ""
    results: list[str] = field(default_factory=list)
    types: list[str] = field(default_factory=list)
    catch: str = ""
    lineno: int = 0


def parse_test_file(path: str) -> list[GoldenCase]:
    cases: list[GoldenCase] = []
    cur: GoldenCase | None = None
    section = ""
    with open(path) as f:
        for lineno, line in enumerate(f, 1):
            line = line.rstrip("\n")
            if line.startswith("===="):
                if cur is not None and cur.query.strip():
                    cases.append(cur)
                cur, section = GoldenCase(lineno=lineno), ""
                continue
            if line.startswith("#") and not section:
                continue
            m = _SECTION.match(line)
            if m:
                section = m.group(1).upper()
                continue
            if cur is None or not section:
                continue
            if section == "QUERY":
                # the reference's parser treats full-line `#` comments as
                # annotations anywhere in a section (test_file_parser.py),
                # and its corpora use them inside QUERY bodies
                if line.lstrip().startswith("#"):
                    continue
                cur.query += line + "\n"
            elif section == "RESULTS":
                if line.strip():
                    cur.results.append(line)
            elif section == "TYPES":
                # paren-aware split so DECIMAL(6,2) stays one type name
                cur.types.extend(
                    t.replace(" ", "").upper()
                    for t in re.findall(r"[A-Za-z_]+(?:\([^)]*\))?", line)
                )
            elif section == "CATCH":
                cur.catch += line
    if cur is not None and cur.query.strip():
        cases.append(cur)
    return cases


def canonical_value(v: object) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return "'" + v.isoformat(sep=" ") + "'"
    if isinstance(v, datetime.date):
        return "'" + v.isoformat() + "'"
    return str(v)


def canonical_row(row) -> str:
    return ",".join(canonical_value(v) for v in row)


def _normalize_expected(line: str) -> str:
    """Re-canonicalize an expected RESULTS line so '1, 'a'' and '1,'a''
    compare equal (whitespace around separators is cosmetic)."""
    reader = csv.reader(io.StringIO(line), quotechar="'", skipinitialspace=True)
    parts = next(reader)
    out = []
    raw_parts = _split_respecting_quotes(line)
    for raw, parsed in zip(raw_parts, parts):
        raw = raw.strip()
        if raw.startswith("'"):
            out.append("'" + parsed.replace("'", "''") + "'")
        else:
            out.append(raw)
    return ",".join(out)


def _split_respecting_quotes(line: str) -> list[str]:
    parts, buf, q = [], [], False
    for ch in line:
        if ch == "'":
            q = not q
            buf.append(ch)
        elif ch == "," and not q:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return parts


def _has_top_level_order_by(sql: str) -> bool:
    depth, toks = 0, re.findall(r"\(|\)|[A-Za-z_]+", sql.upper())
    for i, t in enumerate(toks):
        if t == "(":
            depth += 1
        elif t == ")":
            depth -= 1
        elif t == "ORDER" and depth == 0 and i + 1 < len(toks) and toks[i + 1] == "BY":
            return True
    return False


def run_case(engine, case: GoldenCase) -> list[str]:
    """Run one case; returns a list of mismatch descriptions (empty = pass)."""
    errors: list[str] = []
    if case.catch:
        try:
            engine.sql(case.query).collect()
            errors.append(f"expected error containing {case.catch!r}, query succeeded")
        except Exception as exc:  # noqa: BLE001 - any engine error is valid
            if case.catch not in str(exc):
                errors.append(f"error text {exc} lacks expected {case.catch!r}")
        return errors

    df = engine.sql(case.query)
    if case.types:
        actual_fields = df.schema.fields
        if len(case.types) != len(actual_fields):
            errors.append(f"TYPES arity {len(case.types)} != {len(actual_fields)}")
        else:
            for want, got in zip(case.types, actual_fields):
                base = want.split("(")[0]
                if base == "DECIMAL":
                    ok = isinstance(got.dataType, T.DecimalType) and (
                        "(" not in want or want == f"DECIMAL({got.dataType.precision},{got.dataType.scale})"
                    )
                else:
                    ok = isinstance(got.dataType, _TYPE_MAP.get(base, ()))
                if not ok:
                    errors.append(f"column {got.name}: expected {want}, got {got.dataType}")

    actual = [canonical_row(r) for r in df.collect()]
    expected = [_normalize_expected(line) for line in case.results]
    if not _has_top_level_order_by(case.query):
        actual, expected = sorted(actual), sorted(expected)
    if actual != expected:
        errors.append(
            "rows mismatch:\n  expected: %s\n  actual:   %s"
            % ("\n            ".join(expected) or "<none>", "\n            ".join(actual) or "<none>")
        )
    return errors
