"""Re-runnable triage of the reference's expression unit tests.

Mines single-line ``TestValue`` / ``TestStringValue`` / ``TestIsNull`` /
``TestDateValue`` / ``TestTimestampValue`` expectations from the reference's
``be/src/exprs/expr-test.cc`` (~2500 literal cases), runs each through
``hopspark.engine.Engine`` and records PASS / DIFF / ERR per case into a
committed artifact (``tools/expr_triage_report.json``) so the triage counts
are verifiable and diffable round-over-round.

Context tracking: ``PushExecOption("utf8_mode=true")`` scopes run against a
utf8-mode engine; ``DECIMAL_V2=false``-scoped cases are skipped with class
``decimal-v1-context`` (the engine implements the reference's default V2
semantics only, like Impala 4.x's default).

Classification: every non-PASS case carries a one-line class tag — either
auto-derived here (structural heuristics) or hand-assigned in
``tools/expr_triage_classes.json`` (case id → {"class": ..., "note": ...}).
The report's summary counts unclassified diffs; the suite asserts zero.

Usage:
    PYTHONPATH=. python tools/expr_triage.py [--out tools/expr_triage_report.json]
        [--limit N] [--only-diffs]  # --only-diffs re-checks prior non-passes

Case ids are ``sha1(kind|expr|want)[:12]`` — stable across reruns and across
reference-line movement.
"""

from __future__ import annotations

import hashlib
import json
import math
import os
import re
import sys

SRC = "/root/reference/apache-impala-4.1.0/be/src/exprs/expr-test.cc"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DEFAULT_OUT = os.path.join(REPO, "tools", "expr_triage_report.json")
CLASSES_PATH = os.path.join(REPO, "tools", "expr_triage_classes.json")

#: expressions whose value is nondeterministic or environment-bound —
#: excluded from triage entirely (the reference's own harness executes them
#: in-process where the environment is controlled).  Prefix alternatives
#: (current_, utc_) must not carry a trailing \b — underscore-to-letter is
#: not a word boundary.
SKIP_RX = re.compile(
    r"\b(now\b|utc_|current_|unix_timestamp\(\)|rand\b|random\b|uuid\b"
    r"|pid\b|sleep\b|user\(\)|version\b|coordinator\b|effective_user"
    r"|timeofday|logged_in_user|session_user)",
    re.I,
)

#: test-fixture UDFs the reference registers from its own test .so/.jar —
#: declared out of scope (FUNCTIONS.md)
FIXTURE_RX = re.compile(r"\b(udf_|madlib_)", re.I)


def c_unescape(s: str) -> str:
    out = []
    i = 0
    while i < len(s):
        c = s[i]
        if c == "\\" and i + 1 < len(s):
            n = s[i + 1]
            rep = {"n": "\n", "t": "\t", "r": "\r", "0": "\0", "\\": "\\",
                   "v": "\x0b", "f": "\x0c", "a": "\x07", "b": "\x08",
                   '"': '"', "'": "'"}.get(n)
            if rep is not None:
                out.append(rep)
                i += 2
                continue
            if n in ("u", "U"):
                width = 4 if n == "u" else 8
                hexs = s[i + 2 : i + 2 + width]
                if len(hexs) == width and all(
                    h in "0123456789abcdefABCDEF" for h in hexs
                ):
                    out.append(chr(int(hexs, 16)))
                    i += 2 + width
                    continue
            if n == "x":
                hexs = s[i + 2 : i + 4]
                if len(hexs) == 2 and all(
                    h in "0123456789abcdefABCDEF" for h in hexs
                ):
                    out.append(chr(int(hexs, 16)))
                    i += 4
                    continue
        out.append(c)
        i += 1
    return "".join(out)


_LIT = r'"((?:[^"\\]|\\.)*)"'
RX_STR = re.compile(rf'^\s*TestStringValue\({_LIT},\s*{_LIT}\);')
RX_NULL = re.compile(rf'^\s*TestIsNull\({_LIT},\s*TYPE_\w+\);')
RX_VAL = re.compile(rf'^\s*TestValue\({_LIT},\s*TYPE_(\w+),\s*(.+)\);')
RX_DATE = re.compile(
    rf'^\s*TestDateValue\({_LIT},\s*DateValue\((\d+),\s*(\d+),\s*(\d+)\)\);'
)
RX_TS = re.compile(
    rf'^\s*TestTimestampValue\({_LIT},\s*'
    rf'TimestampValue::ParseSimpleDateFormat\({_LIT}(?:,\s*\d+)?\)\);'
)
#: C++ adjacent string-literal concatenation: "abc" "def" == "abcdef"
RX_ADJ = re.compile(rf'{_LIT}\s+{_LIT}')
STMT_HEADS = ("TestValue", "TestStringValue", "TestIsNull",
              "TestDateValue", "TestTimestampValue")
RX_PUSH = re.compile(r'PushExecOption\("(\w+)=([^"]*)"\)')
RX_POP = re.compile(r"PopExecOption\(\)")
RX_CLEAR = re.compile(r"ClearExecOptions\(\)")
RX_TEST = re.compile(r"^TEST_[PF]?\s*\(")


RX_IF_ARCH = re.compile(r"^\s*#\s*(ifdef|ifndef)\s+__aarch64__")
RX_PP_IF = re.compile(r"^\s*#\s*if")
RX_PP_ELSE = re.compile(r"^\s*#\s*else")
RX_PP_ENDIF = re.compile(r"^\s*#\s*endif")
RX_TZ = re.compile(r'ScopedTimeZoneOverride\s+\w+\("([^"]*)"\)')
RX_FIPS = re.compile(r"if\s*\(\s*FIPS_mode\(\)\s*\)")


def parse_cases() -> list[dict]:
    """Yield {kind, expr, want, line, utf8, decimal_v1, tz} case dicts.

    ``kind``: str | null | date | ts | val:<TYPE>.  Exec-option context is
    tracked with a Push/Pop stack reset at every TEST_ boundary.
    Preprocessor ``#ifdef/#ifndef __aarch64__`` branches take the x86 side
    (this harness runs on x86_64).  ``ScopedTimeZoneOverride`` scopes mark
    cases ``tz`` — their expectations are timezone-local and are skipped
    with class ``timezone-context``."""
    cases: list[dict] = []
    opt_stack: list[tuple[str, str]] = []
    # multi-line statement accumulator: (first_lineno, text-so-far)
    stmt: tuple[int, str] | None = None
    # preprocessor stack entries: (active, is_arch_conditional).  The x86
    # side of an __aarch64__ conditional is the primary expectation; the
    # aarch64 side is ALSO parsed (flagged arch_alt) — the reference pins
    # BOTH values (the divergence is C++ out-of-range float→int cast UB,
    # cvttsd2si vs saturating fcvtzs), so matching either is parity.
    pp_stack: list[tuple[bool, bool]] = []
    # ScopedTimeZoneOverride: RAII — approximate its scope by brace depth
    tz_scopes: list[tuple[int, str]] = []  # (depth_at_decl, tz_name)
    fips_scopes: list[list] = []  # [inside_depth, skipping_if_branch]
    brace_depth = 0

    arch_flag = [False]  # set per-line; read when a statement completes

    def ctx() -> dict:
        utf8 = any(k.lower() == "utf8_mode" and v.lower() in ("true", "1")
                   for k, v in opt_stack)
        dv1 = any(k.upper() == "DECIMAL_V2" and v.lower() in ("false", "0")
                  for k, v in opt_stack)
        tz = tz_scopes[-1][1] if tz_scopes else None
        return {"utf8": utf8, "decimal_v1": dv1, "tz": tz,
                "arch_alt": arch_flag[0]}

    for lineno, line in enumerate(
        open(SRC, encoding="utf-8", errors="replace"), 1
    ):
        if RX_PP_IF.match(line):
            m = RX_IF_ARCH.match(line)
            # ifndef __aarch64__ is active on x86; any other #if: assume
            # active (expr-test's remaining #ifs are feature guards)
            pp_stack.append((m.group(1) == "ifndef" if m else True, bool(m)))
            continue
        if RX_PP_ELSE.match(line):
            if pp_stack:
                act, is_arch = pp_stack[-1]
                pp_stack[-1] = (not act, is_arch)
            continue
        if RX_PP_ENDIF.match(line):
            if pp_stack:
                pp_stack.pop()
            continue
        inactive = [e for e in pp_stack if not e[0]]
        if inactive and not all(is_arch for _, is_arch in inactive):
            continue
        arch_flag[0] = bool(inactive)
        # strings in this file never contain braces that matter for the
        # RAII-scope heuristic; count raw braces
        new_depth = brace_depth + line.count("{") - line.count("}")
        if RX_FIPS.search(line):
            # runtime if (FIPS_mode()) { ... } else { ... }: this harness
            # is non-FIPS — skip the if-branch, keep the else-branch
            fips_scopes.append([new_depth, True])
        elif (
            fips_scopes
            and "else" in line
            and new_depth == fips_scopes[-1][0]
        ):
            fips_scopes[-1][1] = False
        if fips_scopes and new_depth < fips_scopes[-1][0]:
            fips_scopes.pop()
        brace_depth = new_depth
        if fips_scopes and fips_scopes[-1][1]:
            continue
        while tz_scopes and brace_depth < tz_scopes[-1][0]:
            tz_scopes.pop()
        m = RX_TZ.search(line)
        if m:
            tz_scopes.append((brace_depth, m.group(1)))
        if RX_TEST.match(line) or RX_CLEAR.search(line):
            opt_stack.clear()
            tz_scopes.clear()
        m = RX_PUSH.search(line)
        if m:
            opt_stack.append((m.group(1), m.group(2)))
        if RX_POP.search(line) and opt_stack:
            opt_stack.pop()

        # accumulate multi-line statements until the terminating ';'
        stripped = line.strip()
        if stmt is None:
            if not any(stripped.startswith(h + "(") for h in STMT_HEADS):
                continue
            stmt = (lineno, stripped)
        elif stmt[1].endswith("\\"):
            # backslash-newline CONTINUATION inside a string literal —
            # the next line continues the same literal, no space joint
            stmt = (stmt[0], stmt[1][:-1] + stripped)
        else:
            stmt = (stmt[0], stmt[1] + " " + stripped)
        if ";" not in stmt[1]:
            if len(stmt[1]) > 4000:  # runaway guard
                stmt = None
            continue
        first_line, text = stmt
        stmt = None
        # C++ adjacent string-literal concatenation
        prev = None
        while prev != text:
            prev = text
            text = RX_ADJ.sub(lambda m: f'"{m.group(1)}{m.group(2)}"', text)

        m = RX_STR.match(text)
        if m:
            cases.append({"kind": "str", "expr": c_unescape(m.group(1)),
                          "want": c_unescape(m.group(2)),
                          "line": first_line, **ctx()})
            continue
        m = RX_NULL.match(text)
        if m:
            cases.append({"kind": "null", "expr": c_unescape(m.group(1)),
                          "want": None, "line": first_line, **ctx()})
            continue
        m = RX_DATE.match(text)
        if m:
            y, mo, d = int(m.group(2)), int(m.group(3)), int(m.group(4))
            cases.append({"kind": "date", "expr": c_unescape(m.group(1)),
                          "want": f"{y:04d}-{mo:02d}-{d:02d}",
                          "line": first_line, **ctx()})
            continue
        m = RX_TS.match(text)
        if m:
            cases.append({"kind": "ts", "expr": c_unescape(m.group(1)),
                          "want": c_unescape(m.group(2)),
                          "line": first_line, **ctx()})
            continue
        m = RX_VAL.match(text)
        if m:
            raw = m.group(3).strip()
            ty = m.group(2)
            raw = re.sub(r"\(u?int\d+_t\)\s*", "", raw)
            raw = re.sub(r"(?<=[\d.])(f|LL|UL|L)\b", "", raw)
            if re.fullmatch(r"0x[0-9a-fA-F]+", raw):
                raw = str(int(raw, 16))
            if re.fullmatch(r"-?\d+(\.\d+)?([eE][-+]?\d+)?|true|false", raw):
                cases.append({"kind": f"val:{ty}",
                              "expr": c_unescape(m.group(1)), "want": raw,
                              "line": first_line, **ctx()})
            continue
    return cases


def case_id(c: dict) -> str:
    key = f"{c['kind']}|{c['expr']}|{c['want']}|{int(c['utf8'])}"
    return hashlib.sha1(key.encode()).hexdigest()[:12]


def compare(kind: str, want, got) -> bool:
    if kind == "null":
        return got is None
    if kind == "str":
        # the reference harness renders a NULL StringVal as the text "NULL"
        if want == "NULL":
            return got is None
        return got == want
    if kind == "date":
        return str(got) == want
    if kind == "ts":
        g = "NULL" if got is None else str(got)
        w = want.strip()  # a few expectations carry trailing spaces
        return (
            g == w
            or g == w + ".000000"
            or (w.endswith(" 00:00:00") and g == w[:10])
            # the reference renders midnight timestamps date-only
            or (len(w) == 10 and g == w + " 00:00:00")
            # the reference renders sub-second as 9-digit ns; Spark as
            # 6-digit us — equal when the extra digits are zero
            or (len(w) > 20 and w.rstrip("0") == g.rstrip("0"))
        )
    ty = kind.split(":")[1]
    if got is None:
        return False
    if want in ("true", "false"):
        return got is (want == "true")
    try:
        if ty in ("FLOAT", "DOUBLE"):
            return math.isclose(float(got), float(want),
                                rel_tol=1e-6, abs_tol=1e-12)
        # int(float(...)) loses precision at the int64 edge
        w_int = int(want) if re.fullmatch(r"-?\d+", want) else int(float(want))
        return int(got) == w_int
    except (ValueError, TypeError):
        return False


#: structural auto-classes, checked in order; first match wins
_AUTO_CLASSES: list[tuple[str, re.Pattern]] = [
    ("re2-vs-java-regex", re.compile(
        r"regexp_|\bilike\b|\birlike\b|\biregexp\b|rlike", re.I)),
    ("ns-rendering", re.compile(
        r"\.\d{7,9}\b|nanosecond|\bns\b", re.I)),
    ("locale-format", re.compile(r"to_char|from_timestamp|format_", re.I)),
    ("float-rendering", re.compile(r"e[+-]\d\d|1\.7976931|4\.9406564", re.I)),
]


def auto_class(c: dict, got_repr: str) -> str | None:
    if c["utf8"]:
        return "utf8-context"
    blob = c["expr"] + " " + str(c["want"]) + " " + got_repr
    for name, rx in _AUTO_CLASSES:
        if rx.search(blob):
            return name
    return None


def main() -> None:
    args = sys.argv[1:]
    out_path = DEFAULT_OUT
    limit = None
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    if "--limit" in args:
        i = args.index("--limit")
        limit = int(args[i + 1])
        del args[i : i + 2]
    only_diffs = "--only-diffs" in args

    manual: dict[str, dict] = {}
    if os.path.exists(CLASSES_PATH):
        manual = json.load(open(CLASSES_PATH))

    prior: dict = {}
    if only_diffs and os.path.exists(out_path):
        prior = json.load(open(out_path)).get("cases", {})

    from hopspark.engine import Engine

    eng = Engine(sf_dir="/root/testdata/sf0.001")
    eng_utf8 = Engine(
        spark=eng.spark, sf_dir="/root/testdata/sf0.001",
        options={"utf8_mode": True},
    )

    cases = parse_cases()
    # aarch64-branch expectations: the reference pins BOTH arch values
    # (expr-test.cc #ifndef __aarch64__ blocks); matching either is parity
    alt_want: dict[tuple, object] = {}
    primary: list[dict] = []
    for c in cases:
        if c.get("arch_alt"):
            alt_want[(c["kind"], c["expr"], c["utf8"])] = c["want"]
        else:
            primary.append(c)
    cases = primary
    if limit:
        cases = cases[:limit]

    report_cases: dict[str, dict] = {}
    counts = {"pass": 0, "diff": 0, "err": 0, "skip": 0}
    unclassified = []
    for c in cases:
        cid = case_id(c)
        rec: dict = {"line": c["line"], "kind": c["kind"], "expr": c["expr"]}
        if c["want"] is not None:
            rec["want"] = c["want"]
        if c["utf8"]:
            rec["utf8"] = True
        if SKIP_RX.search(c["expr"]):
            rec["status"] = "skip"
            rec["class"] = "nondeterministic-skip"
        elif FIXTURE_RX.search(c["expr"]):
            rec["status"] = "skip"
            rec["class"] = "test-fixture-udf"
        elif c.get("tz") not in (None, "UTC"):
            rec["status"] = "skip"
            rec["class"] = "timezone-context"
        elif c["decimal_v1"]:
            rec["status"] = "skip"
            rec["class"] = "decimal-v1-context"
        elif only_diffs and prior.get(cid, {}).get("status") == "pass":
            rec = prior[cid]
        else:
            e = eng_utf8 if c["utf8"] else eng
            try:
                # the newline ends any '--' comment inside the expression
                # so the alias survives; a stray trailing ';' (one test
                # author typo at expr-test.cc:6041) is stripped like the
                # reference's executor does
                expr_sql = c["expr"].rstrip().rstrip(";")
                row = e.sql(f"SELECT {expr_sql}\nAS v").head()
                got = row.v if row is not None else None
                ok = compare(c["kind"], c["want"], got)
                if not ok:
                    key = (c["kind"], c["expr"], c["utf8"])
                    if key in alt_want and compare(
                        c["kind"], alt_want[key], got
                    ):
                        ok = True
                        rec["note"] = (
                            "matches the reference's __aarch64__ branch "
                            "(x86 value is out-of-range float->int cast UB)"
                        )
                rec["status"] = "pass" if ok else "diff"
                if rec["status"] == "diff":
                    rec["got"] = repr(got)[:120]
            except Exception as ex:  # noqa: BLE001
                rec["status"] = "err"
                rec["got"] = f"{type(ex).__name__}: {str(ex)[:120]}"
        if rec["status"] in ("diff", "err") and "class" not in rec:
            if cid in manual:
                rec["class"] = manual[cid]["class"]
                if manual[cid].get("note"):
                    rec["note"] = manual[cid]["note"]
            else:
                ac = auto_class(c, rec.get("got", ""))
                if ac:
                    rec["class"] = ac
                else:
                    unclassified.append(cid)
        counts[rec["status"]] += 1
        report_cases[cid] = rec

    by_class: dict[str, int] = {}
    for rec in report_cases.values():
        if rec["status"] in ("diff", "err"):
            by_class[rec.get("class", "UNCLASSIFIED")] = (
                by_class.get(rec.get("class", "UNCLASSIFIED"), 0) + 1
            )
    summary = {
        "source": SRC,
        "total_cases": len(report_cases),
        **counts,
        "diff_classes": dict(sorted(by_class.items())),
        "unclassified": len(unclassified),
    }
    with open(out_path, "w") as f:
        json.dump({"summary": summary, "cases": report_cases}, f,
                  indent=0, ensure_ascii=False, sort_keys=True)
    print(json.dumps(summary, indent=1))
    if unclassified:
        print("unclassified ids:", unclassified[:40], file=sys.stderr)


if __name__ == "__main__":
    main()
