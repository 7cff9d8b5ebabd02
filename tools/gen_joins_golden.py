"""Port the reference's join corpus — QueryTest/joins.test,
outer-joins.test, semi-joins.test, semi-joins-exhaustive.test,
outer-to-inner-joins.test, empty-build-joins.test — onto our engine as
two golden files:

    tests/golden/joins_core.test        (joins + empty-build + exhaustive)
    tests/golden/joins_outer_semi.test  (outer/semi/outer-to-inner)

Verification discipline: these files run against the reference's OWN
expected RESULTS.  The alltypes/alltypestiny/alltypessmall/alltypesagg
fixtures are exact reproductions of the reference's TestDataGenerator
(tools/gen_subquery_alltypes2.py asserts alltypes row-for-row against a
Python twin of the Java loop), and jointbl/dimtbl/tinyinttable/nullrows/
nulltable/semijointbl are loaded verbatim from the reference's CSV data
files (testdata/JoinTbl/data.csv, DimTbl/data.csv, TinyIntTable/data.csv,
NullRows/data.csv, NullTable/data.csv; SemiJoinTblA/B values pinned by
semi-joins.test's own setup-verification rows 1-2).  So every ported
query's rows are compared 1:1 against the reference file's RESULTS block
(normalized only for rendering: the reference prints timestamps unquoted
at nanosecond width, we quote at microsecond width — the data is
microsecond-exact).  A mismatch is a defect, not a delta.

Ported text deltas (documented per case in the emitted files):
  * ``functional.`` / ``functional_parquet.`` db prefixes folded away
    (one fixture set serves both — the reference uses the two dbs only to
    vary the storage format, which Spark abstracts);
  * greptiny's 100 rows are synthesized (the reference's file is random
    benchmark junk); every use joins it against the always-empty
    emptytable, so results are content-independent;
  * the two debug_action rows of joins.test are skipped — they inject
    backend faults (DebugAction in the C++ exec engine) with no analogue
    in this engine.

Usage: PYTHONPATH=. python tools/gen_joins_golden.py [--emit] [file#idx ...]
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

REF_DIR = (
    "/root/reference/apache-impala-4.1.0/testdata/workloads/"
    "functional-query/queries/QueryTest"
)

OUT_FILES = {
    "joins_core.test": [
        "joins.test", "empty-build-joins.test", "semi-joins-exhaustive.test",
    ],
    "joins_outer_semi.test": [
        "outer-joins.test", "semi-joins.test", "outer-to-inner-joins.test",
    ],
}

# --- fixtures loaded verbatim from the reference's CSV data ---------------

JOINTBL_SQL = """
CREATE VIEW jointbl AS
SELECT CAST(test_id AS BIGINT) AS test_id,
       CAST(test_name AS STRING) AS test_name,
       CAST(test_zip AS INT) AS test_zip,
       CAST(alltypes_id AS INT) AS alltypes_id
FROM VALUES
  (1001, 'Name1', 94611, 5000), (1002, 'Name2', 94611, 5000),
  (1003, 'Name3', 94611, 5000), (1004, 'Name4', 94611, 5000),
  (1005, 'Name5', 94611, 5000), (1106, 'Name6', 94612, 5000),
  (1006, 'Name16', 94612, 5000), (1006, 'Name6', 94616, 5000),
  (1106, 'Name16', 94612, 5000), (1106, 'Name6', 94616, 5000),
  (1006, 'Name16', 94616, 5000), (1106, 'Name16', 94616, 5000),
  (1106, 'Name6', 94612, 15000), (1006, 'Name16', 94612, 15000),
  (1006, 'Name6', 94616, 15000), (1106, 'Name16', 94612, 15000),
  (1106, 'Name6', 94616, 15000), (1006, 'Name16', 94616, 15000),
  (1106, 'Name16', 94616, 15000)
  AS t(test_id, test_name, test_zip, alltypes_id)
"""

TINYINTTABLE_SQL = """
CREATE VIEW tinyinttable AS
SELECT CAST(int_col AS INT) AS int_col
FROM VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9) AS t(int_col)
"""

NULLTABLE_SQL = """
CREATE VIEW nulltable AS
SELECT 'a' AS a, '' AS b, CAST(NULL AS STRING) AS c,
       CAST(NULL AS INT) AS d, CAST(NULL AS DOUBLE) AS e,
       concat('a', chr(0), 'b') AS f, chr(0) AS g
"""

NULLROWS_SQL = """
CREATE VIEW nullrows AS
SELECT CAST(id AS STRING) AS id, '' AS blank,
       CAST(NULL AS STRING) AS null_str, CAST(NULL AS INT) AS null_int,
       CAST(NULL AS DOUBLE) AS null_double,
       CAST(group_str AS STRING) AS group_str,
       CAST(some_nulls AS STRING) AS some_nulls,
       CAST(bool_nulls AS BOOLEAN) AS bool_nulls
FROM VALUES
  ('a','a','a',true),  ('b','a',NULL,false), ('c','a',NULL,NULL),
  ('d','a',NULL,NULL), ('e','a',NULL,NULL),  ('f','f','f',true),
  ('g','f',NULL,false),('h','f',NULL,NULL),  ('i','f',NULL,NULL),
  ('j','f',NULL,NULL), ('k','k','k',true),   ('l','k',NULL,false),
  ('m','k',NULL,NULL), ('n','k',NULL,NULL),  ('o','k',NULL,NULL),
  ('p','p','p',true),  ('q','p',NULL,false), ('r','p',NULL,NULL),
  ('s','p',NULL,NULL), ('t','p',NULL,NULL),  ('u','u','u',true),
  ('v','u',NULL,false),('w','u',NULL,NULL),  ('x','u',NULL,NULL),
  ('y','u',NULL,NULL), ('z','z','z',true)
  AS t(id, group_str, some_nulls, bool_nulls)
"""

EMPTYTABLE_SQL = """
CREATE VIEW emptytable AS
SELECT CAST(NULL AS STRING) AS field, CAST(NULL AS INT) AS f2 WHERE 1=0
"""

# the reference's greptiny is 100 rows of benchmark junk
# (hive_benchmark/grepTiny/part-00000); every corpus use joins it against
# the always-empty emptytable, so contents are result-irrelevant —
# synthesized deterministically
GREPTINY_SQL = """
CREATE VIEW greptiny AS
SELECT concat('grep_row_', CAST(i AS STRING)) AS field
FROM (SELECT explode(sequence(0, 99)) AS i)
"""

SEMIJOINA_SQL = """
CREATE VIEW semijointbla AS
SELECT CAST(a AS INT) AS a, CAST(b AS INT) AS b, CAST(c AS INT) AS c
FROM VALUES
  (1,1,1), (1,1,10), (1,2,10), (1,3,10),
  (NULL,NULL,30), (2,4,30), (2,NULL,20)
  AS t(a, b, c)
"""

SEMIJOINB_SQL = """
CREATE VIEW semijointblb AS
SELECT CAST(a AS INT) AS a, CAST(b AS INT) AS b, CAST(c AS INT) AS c
FROM VALUES
  (1,1,1), (1,1,10), (1,2,5), (1,NULL,10),
  (2,10,NULL), (3,NULL,NULL), (3,NULL,50)
  AS t(a, b, c)
"""

# --- per-case overrides ---------------------------------------------------
# key: (ref file, 1-based index among parsed cases)
#   skip: str         — don't port; reason goes into the emitted header
#   note: str         — extra provenance note for the emitted case
#   expect_ours: str  — accept OUR rows over the reference text (rendering
#                       or documented-semantics delta; reason required)
OVERRIDES: dict[tuple[str, int], dict] = {
    ("joins.test", 56): {"skip": (
        "set debug_action — injects a backend fault "
        "(DebugAction in the C++ exec engine); no analogue here"
    )},
    ("joins.test", 57): {"skip": (
        "set debug_action PHJ_BUILDER_PREPARE fault injection; "
        "no analogue here"
    )},
    # Spark's documented NaN semantics (SQL ref "NaN Semantics"): NaN
    # equals NaN in comparisons/joins/grouping; the reference follows
    # IEEE 754 (NaN != NaN).  These three rows TEST that behavior, so
    # their rows differ by design — ours keep the NaN matches.
    ("joins.test", 50): {"expect_ours": (
        "NaN-equality delta: Spark NaN = NaN is true (documented NaN "
        "semantics); reference IEEE returns no rows"
    )},
    ("joins.test", 53): {"expect_ours": (
        "NaN-equality delta: the NaN build rows match under Spark NaN "
        "semantics, adding NaN pairs to the IEEE result"
    )},
    ("joins.test", 54): {"expect_ours": (
        "NaN-equality delta: <=> and = agree on NaN in Spark, so the "
        "sqrt(-x) rows join; reference IEEE = returns none"
    )},
}


def strip_prefixes(sql: str) -> str:
    return re.sub(r"\bfunctional(_parquet)?\.", "", sql, flags=re.I)


_TS_RE = re.compile(r"^\d{4}-\d{2}-\d{2} \d{2}:\d{2}:\d{2}(\.\d+)?$")


def normalize_ref_line(line: str, dtypes: list[str] | None = None) -> str:
    """Reference RESULTS line -> our canonical rendering.  Deltas are pure
    rendering: timestamps print unquoted at ns width there, quoted µs here;
    a NULL in a STRING column prints as 'NULL' (quoted) there, bare NULL
    here; integral FLOAT/DOUBLE values print without the decimal point
    there (`0`), via repr here (`0.0`)."""
    from hopspark.golden import _normalize_expected, _split_respecting_quotes

    parts = _split_respecting_quotes(line)
    out = []
    for ci, raw in enumerate(parts):
        cell = raw.strip()
        dt = dtypes[ci] if dtypes and ci < len(dtypes) else ""
        if not cell.startswith("'") and _TS_RE.match(cell):
            if "." in cell:
                base, frac = cell.split(".")
                frac = frac[:6].ljust(6, "0")
                cell = (
                    f"'{base}.{frac}'" if int(frac) else f"'{base}'"
                )
            else:
                cell = f"'{cell}'"
        elif cell == "'NULL'" and dt == "string":
            cell = "NULL"
        elif (dt in ("float", "double") and cell not in ("NULL", "")
                and "." not in cell and "n" not in cell.lower()):
            cell = cell + ".0"
        out.append(cell)
    return _normalize_expected(",".join(out))


def main() -> None:  # noqa: C901 - port driver, linear
    emit = "--emit" in sys.argv
    only = {a for a in sys.argv[1:] if not a.startswith("--")}

    from hopspark.golden import (
        _has_top_level_order_by, _normalize_expected, canonical_row,
        parse_test_file,
    )
    from hopspark.session import get_spark
    from hopspark.engine import Engine

    sys.path.insert(0, os.path.join(REPO, "tools"))
    from gen_subquery_alltypes2 import (
        ALLTYPES_SQL, DATE_TBL_SQL, DECIMAL_TBL_SQL, DIMTBL_SQL,
    )
    from gen_tpch_nested_golden import impala_type_name as _itn

    def impala_type_name(dt):
        from pyspark.sql import types as T

        if isinstance(dt, T.NullType):
            return "NULL"  # reference: bare NULL literal types as `null`
        return _itn(dt)

    spark = get_spark(app_name="joins-golden")
    eng = Engine(spark=spark, sf_dir="/root/testdata/sf0.001")

    sib = parse_test_file(
        os.path.join(REPO, "tests", "golden", "subquery_alltypes.test")
    )
    sibling_fixtures = [
        c.query.strip() for c in sib[:3]
        if c.query.lstrip().upper().startswith("CREATE VIEW")
    ]
    assert len(sibling_fixtures) == 3
    ctb = parse_test_file(
        os.path.join(REPO, "tests", "golden", "complextypestbl.test")
    )
    ctb_fixture = ctb[0].query.strip()
    assert ctb_fixture.upper().startswith("CREATE VIEW COMPLEXTYPESTBL")

    fixtures = sibling_fixtures + [
        ALLTYPES_SQL.strip(), DIMTBL_SQL.strip(), DECIMAL_TBL_SQL.strip(),
        DATE_TBL_SQL.strip(), JOINTBL_SQL.strip(), TINYINTTABLE_SQL.strip(),
        NULLTABLE_SQL.strip(), NULLROWS_SQL.strip(), EMPTYTABLE_SQL.strip(),
        GREPTINY_SQL.strip(), SEMIJOINA_SQL.strip(), SEMIJOINB_SQL.strip(),
        ctb_fixture,
    ]
    for fx in fixtures:
        eng.sql(re.sub(
            r"^CREATE VIEW (IF NOT EXISTS )?", "CREATE VIEW IF NOT EXISTS ",
            fx.strip(), count=1,
        ))

    n_ok = 0
    failed: list[str] = []
    results: dict[tuple[str, int], tuple] = {}
    for out_name, ref_files in OUT_FILES.items():
        for rf in ref_files:
            cases = parse_test_file(os.path.join(REF_DIR, rf))
            for i, case in enumerate(cases, 1):
                tag = f"{rf}#{i}"
                if only and tag not in only:
                    continue
                ov = OVERRIDES.get((rf, i), {})
                if "skip" in ov:
                    results[(rf, i)] = ("skip", ov["skip"])
                    print(f"[{tag}] SKIP: {ov['skip']}")
                    continue
                sql = ov.get("sql") or strip_prefixes(case.query).strip()
                try:
                    df = eng.sql(sql)
                    rows = df.collect()
                except Exception as exc:  # noqa: BLE001
                    failed.append(tag)
                    print(f"[{tag}] ENGINE ERROR: {str(exc)[:240]}")
                    continue
                ours = [canonical_row(r) for r in rows]
                dts = [d for _n, d in df.dtypes]
                exp = [normalize_ref_line(ln, dts) for ln in case.results]
                ordered = _has_top_level_order_by(sql)
                a = ours if ordered else sorted(ours)
                b = exp if ordered else sorted(exp)
                if a != b and "expect_ours" not in ov:
                    failed.append(tag)
                    print(f"[{tag}] MISMATCH ours={len(a)} ref={len(b)}")
                    for x, y in list(zip(a, b))[:4]:
                        if x != y:
                            print(f"  ours: {x}\n  ref : {y}")
                    if len(a) != len(b):
                        print(f"  ours head: {a[:2]}\n  ref head : {b[:2]}")
                    continue
                types = [impala_type_name(f.dataType)
                         for f in df.schema.fields]
                ref_types = [t.upper() for t in case.types]
                tnote = ""
                if ref_types and [t.upper() for t in types] != ref_types:
                    tnote = (
                        f"TYPES delta vs reference ({', '.join(ref_types)})"
                        " — value-identical, Spark width/typing"
                    )
                note = "; ".join(
                    x for x in (ov.get("note", ""), ov.get("expect_ours", ""),
                                tnote) if x
                )
                results[(rf, i)] = ("ok", sql, types, ours, note)
                n_ok += 1
                print(f"[{tag}] OK rows={len(ours)}"
                      + (f" ({note})" if note else ""))

    print(f"\n{n_ok} ported, {len(failed)} failing: {failed}")
    if not emit or failed or only:
        return

    header = (
        "# Port of the reference's join corpus — {files}\n"
        "# (testdata/workloads/functional-query/queries/QueryTest/).\n"
        "# RESULTS are this engine's canonical rows, verified 1:1 against\n"
        "# the REFERENCE file's own RESULTS blocks at port time\n"
        "# (tools/gen_joins_golden.py — the alltypes fixtures reproduce\n"
        "# TestDataGenerator exactly; jointbl/dimtbl/tinyinttable/\n"
        "# nullrows/nulltable/semijointbl are loaded verbatim from the\n"
        "# reference's CSVs; greptiny is synthesized, used only against\n"
        "# the empty table).  functional./functional_parquet. prefixes\n"
        "# are folded (format variation Spark abstracts).  Skipped rows\n"
        "# are listed below with reasons.\n"
    )
    for out_name, ref_files in OUT_FILES.items():
        path = os.path.join(REPO, "tests", "golden", out_name)
        with open(path, "w") as fh:
            fh.write(header.format(files=" + ".join(ref_files)))
            for rf in ref_files:
                for (rff, i), r in sorted(results.items()):
                    if rff == rf and r[0] == "skip":
                        fh.write(f"# SKIPPED {rf}#{i}: {r[1]}\n")
            for fx in fixtures:
                fh.write("====\n---- QUERY\n")
                fh.write(re.sub(
                    r"^CREATE VIEW (IF NOT EXISTS )?",
                    "CREATE VIEW IF NOT EXISTS ", fx.strip(), count=1,
                ) + "\n")
                fh.write("---- TYPES\nINT\n---- RESULTS\n")
            for rf in ref_files:
                for (rff, i), r in sorted(results.items()):
                    if rff != rf or r[0] != "ok":
                        continue
                    _, sql, types, ours, note = r
                    fh.write("====\n")
                    fh.write(f"# {rf}#{i}"
                             + (f" — {note}" if note else "") + "\n")
                    fh.write("---- QUERY\n" + sql.strip() + "\n")
                    fh.write("---- TYPES\n" + ", ".join(types) + "\n")
                    fh.write("---- RESULTS\n")
                    for row in ours:
                        fh.write(row + "\n")
            fh.write("====\n")
        print("wrote", path)


if __name__ == "__main__":
    main()
