"""Audited scalar-function matrix vs the reference registry.

The reference's function registry (common/function-registry/impala_functions.py)
declares every scalar builtin name. This tool carries a curated
classification for each name and — for every supported one — a PROBE
expression that is executed through the Impala-dialect SQL surface
(Engine.sql), so the matrix is evidence, not a claim. Output: FUNCTIONS.md.

Statuses:
  native      — Spark builtin, same name and semantics
  renamed     — dialect rename (hopspark/dialect/translate.py _FN_RENAME)
  rewritten   — structural dialect rewrite (argument/shape changes)
  registered  — hopspark/functions/registry.py (SQL temp fn or Arrow UDF)
  unsupported — documented gap (note says why)
  out-of-scope— reference-test-only / connector-specific names

Run:  python tools/gen_function_matrix.py          (writes FUNCTIONS.md)
Test: tests/test_function_matrix.py runs every probe.
"""

from __future__ import annotations

# name: (status, probe_sql_or_None, note)
# fmt: off
MATRIX: dict[str, tuple[str, str | None, str]] = {
    # ---------------- math ----------------
    "abs": ("rewritten", "abs(-3)", "int widths promote one step (IMPALA-4513): width-named kernels"),
    "acos": ("native", "acos(1.0)", ""),
    "asin": ("native", "asin(0.0)", ""),
    "atan": ("native", "atan(0.0)", ""),
    "atan2": ("native", "atan2(1.0, 1.0)", ""),
    "bin": ("native", "bin(5)", ""),
    "ceil": ("native", "ceil(1.2)", ""),
    "ceiling": ("native", "ceiling(1.2)", ""),
    "conv": ("rewritten", "conv('ff', 16, 10)", "digit validation vs source base -> NULL (conv3 kernel)"),
    "cos": ("native", "cos(0.0)", ""),
    "cosh": ("native", "cosh(0.0)", ""),
    "cot": ("native", "cot(1.0)", ""),
    "degrees": ("native", "degrees(pi())", ""),
    "e": ("native", "e()", ""),
    "exp": ("native", "exp(1.0)", ""),
    "factorial": ("native", "factorial(5)", ""),
    "floor": ("native", "floor(1.8)", ""),
    "greatest": ("native", "greatest(1, 2, 3)", ""),
    "hex": ("native", "hex(255)", ""),
    "least": ("native", "least(1, 2, 3)", ""),
    "ln": ("rewritten", "ln(e())", "C log() domain: ln(0)=-inf, ln(neg)=NaN (no guard in math-functions-ir.cc)"),
    "log": ("rewritten", "log(2, 8)", "base-first; raw-C IEEE semantics (log(1,2)=Inf, log(0,0)=NaN) via ln-division rewrite"),
    "log10": ("rewritten", "log10(100)", "C log10() domain: -inf at 0, NaN below"),
    "log2": ("rewritten", "log2(8)", "C log2() domain: -inf at 0, NaN below"),
    "mod": ("native", "mod(7, 3)", ""),
    "negative": ("native", "negative(5)", ""),
    "pi": ("native", "pi()", ""),
    "pmod": ("rewritten", "pmod(3, -5)", "((a%b)+b)%b for every sign (PmodBigInt:436-440); Spark pmod differs for negative divisors"),
    "positive": ("native", "positive(-5)", ""),
    "pow": ("native", "pow(2, 10)", ""),
    "power": ("native", "power(2, 10)", ""),
    "radians": ("native", "radians(180)", ""),
    "rand": ("native", "rand()", "non-deterministic"),
    "random": ("native", "random()", "non-deterministic"),
    "round": ("native", "round(2.5)", ""),
    "sign": ("native", "sign(-2.5)", ""),
    "sin": ("native", "sin(0.0)", ""),
    "sinh": ("native", "sinh(0.0)", ""),
    "sqrt": ("native", "sqrt(4.0)", ""),
    "tan": ("native", "tan(0.0)", ""),
    "tanh": ("native", "tanh(0.0)", ""),
    "width_bucket": ("native", "width_bucket(5.35, 0, 10, 5)", ""),
    "unhex": ("rewritten", "unhex('4142')", "wrapped in CAST(... AS STRING) — reference returns STRING"),
    "dceil": ("renamed", "dceil(1.2)", "→ ceil"),
    "dfloor": ("renamed", "dfloor(1.8)", "→ floor"),
    "dround": ("renamed", "dround(2.5)", "→ round"),
    "dtrunc": ("rewritten", "dtrunc(9.9)", "numeric truncate-toward-zero, DECIMAL typing p-s+min(s,d) for decimal args; string 2nd arg dispatches to the date form"),
    "dexp": ("renamed", "dexp(1.0)", "→ exp"),
    "dlog1": ("rewritten", "dlog1(e())", "→ ln with the C log() domain contract"),
    "dlog10": ("rewritten", "dlog10(100)", "→ log10 with the C log10() domain contract"),
    "dsqrt": ("renamed", "dsqrt(4.0)", "→ sqrt"),
    "dpow": ("renamed", "dpow(2, 10)", "→ pow"),
    "fpow": ("renamed", "fpow(2, 10)", "→ pow"),
    "fmod": ("rewritten", "fmod(7.5, 2.0)", "→ mod over DOUBLE args (floating-only signatures)"),
    "quotient": ("registered", "quotient(11, 3)", "integer division"),
    "truncate": ("registered", "truncate(3.456, 2)", "numeric truncate toward zero"),
    "is_inf": ("registered", "is_inf(1.0 / 0.0)", "NOTE x/0→NULL non-ANSI; literal inf works; NULL input is FALSE (expr-test.cc:5662)"),
    "is_nan": ("renamed", "is_nan(0.0)", "→ isnan"),
    "trunc": ("rewritten", "trunc(DATE'2020-06-15', 'MM')", "datetime form via string-2nd-arg dispatch -> date_trunc (DATE args keep DATE, r8; full Oracle unit set incl. DD/HH24/MI/Q/DAY/WW/W); numeric form routes to truncate()"),
    "max_tinyint": ("registered", "max_tinyint()", "type-limit constant"),
    "min_tinyint": ("registered", "min_tinyint()", "type-limit constant"),
    "max_smallint": ("registered", "max_smallint()", "type-limit constant"),
    "min_smallint": ("registered", "min_smallint()", "type-limit constant"),
    "max_int": ("registered", "max_int()", "type-limit constant"),
    "min_int": ("registered", "min_int()", "type-limit constant"),
    "max_bigint": ("registered", "max_bigint()", "type-limit constant"),
    "min_bigint": ("registered", "min_bigint()", "type-limit constant"),
    "precision": ("rewritten", "precision(CAST(1.5 AS DECIMAL(12,2)))", "typeof()-parse; NULL for non-decimal"),
    "scale": ("rewritten", "scale(CAST(1.5 AS DECIMAL(12,2)))", "typeof()-parse; NULL for non-decimal"),
    # ---------------- string ----------------
    "ascii": ("native", "ascii('A')", ""),
    "btrim": ("native", "btrim('  x  ')", ""),
    "bytes": ("renamed", "bytes('héllo')", "→ octet_length"),
    "char_length": ("renamed", "char_length('abc')", "→ length"),
    "character_length": ("renamed", "character_length('abc')", "→ length"),
    "chr": ("renamed", "chr(65)", "→ char"),
    "concat": ("native", "concat('a', 'b')", ""),
    "concat_ws": ("native", "concat_ws('-', 'a', 'b')", ""),
    "find_in_set": ("native", "find_in_set('b', 'a,b,c')", ""),
    "initcap": ("native", "initcap('hello world')", ""),
    "instr": ("rewritten", "instr('foobarbar', 'bar', -3, 2)", "2-arg native; 3/4-arg → instr4 kernel (pos/occ, negative pos)"),
    "left": ("rewritten", "left('impala', 3)", "byte-count slice under UTF8_MODE=false (alias of strleft)"),
    "length": ("native", "length('héllo')", "UTF-8 chars"),
    "levenshtein": ("native", "levenshtein('abc', 'abd')", ""),
    "locate": ("native", "locate('b', 'abcb', 3)", "2- and 3-arg"),
    "lower": ("native", "lower('ABC')", ""),
    "lcase": ("renamed", "lcase('ABC')", "→ lower"),
    "lpad": ("native", "lpad('7', 3, '0')", ""),
    "ltrim": ("native", "ltrim('  x')", ""),
    "parse_url": ("native", "parse_url('http://a.com/p?q=1', 'HOST')", ""),
    "repeat": ("native", "repeat('ab', 3)", ""),
    "replace": ("native", "replace('aaa', 'a', 'b')", ""),
    "reverse": ("native", "reverse('abc')", ""),
    "right": ("rewritten", "right('impala', 3)", "byte-count slice under UTF8_MODE=false (alias of strright)"),
    "rpad": ("native", "rpad('7', 3, '0')", ""),
    "rtrim": ("native", "rtrim('x  ')", ""),
    "space": ("native", "length(space(3))", ""),
    "split_part": ("native", "split_part('a|b|c', '|', -1)", "negative index counts from end"),
    "strleft": ("rewritten", "strleft('impala', 3)", "BYTE-count prefix under UTF8_MODE=false (encode→substring→cast, string-functions-ir.cc Left)"),
    "strright": ("rewritten", "strright('impala', 3)", "BYTE-count suffix under UTF8_MODE=false (encode→substring→cast, string-functions-ir.cc Right)"),
    "substr": ("native", "substr('hello', 2, 3)", ""),
    "substring": ("native", "substring('hello', 2, 3)", ""),
    "translate": ("native", "translate('abcba', 'ab', 'xy')", ""),
    "trim": ("native", "trim('  x  ')", ""),
    "upper": ("native", "upper('abc')", ""),
    "ucase": ("renamed", "ucase('abc')", "→ upper"),
    "regexp_extract": ("native", "regexp_extract('ab12', '([0-9]+)', 1)", ""),
    "regexp_like": ("rewritten", "regexp_like('ABC', 'abc', 'i')", "flags folded into (?i) prefix"),
    "regexp_replace": ("native", "regexp_replace('a1b2', '[0-9]', '')", ""),
    "regexp_escape": ("registered", "regexp_escape('a.b')", ""),
    "regexp_match_count": ("registered", "regexp_match_count('a1b2c3', '[0-9]')", "2/3/4-arg forms (start_pos; i/c/m/n params, last of i/c wins)"),
    "base64encode": ("registered", "base64encode('ab')", ""),
    "base64decode": ("registered", "base64decode(base64encode('ab'))", ""),
    "jaro_distance": ("registered", "jaro_distance('martha', 'marhta')", "Arrow UDF"),
    "jaro_similarity": ("registered", "jaro_similarity('martha', 'marhta')", "Arrow UDF"),
    "jaro_winkler_distance": ("registered", "jaro_winkler_distance('martha', 'marhta')", "Arrow UDF"),
    "jaro_winkler_similarity": ("registered", "jaro_winkler_similarity('martha', 'marhta')", "Arrow UDF"),
    "damerau_levenshtein": ("registered", "damerau_levenshtein('ab', 'ba')", "Arrow UDF (OSA)"),
    "jaro_dst": ("renamed", "jaro_dst('martha', 'marhta')", "→ jaro_distance"),
    "jaro_sim": ("renamed", "jaro_sim('martha', 'marhta')", "→ jaro_similarity"),
    "jw_dst": ("renamed", "jw_dst('martha', 'marhta')", "→ jaro_winkler_distance"),
    "jw_sim": ("renamed", "jw_sim('martha', 'marhta')", "→ jaro_winkler_similarity"),
    "le_dst": ("renamed", "le_dst('abc', 'abd')", "→ levenshtein"),
    "dle_dst": ("renamed", "dle_dst('ab', 'ba')", "→ damerau_levenshtein"),
    # *_ascii / *_utf8 / utf8_* variants: Spark natives are UTF-8-native,
    # so base name == utf8 variant; ascii variants are a strict subset.
    "initcap_ascii": ("renamed", "initcap_ascii('ab cd')", "→ initcap"),
    "initcap_utf8": ("renamed", "initcap_utf8('ab cd')", "→ initcap"),
    "lcase_ascii": ("renamed", "lcase_ascii('AB')", "→ lower"),
    "lcase_utf8": ("renamed", "lcase_utf8('AB')", "→ lower"),
    "lower_ascii": ("renamed", "lower_ascii('AB')", "→ lower"),
    "lower_utf8": ("renamed", "lower_utf8('AB')", "→ lower"),
    "ucase_ascii": ("renamed", "ucase_ascii('ab')", "→ upper"),
    "ucase_utf8": ("renamed", "ucase_utf8('ab')", "→ upper"),
    "upper_ascii": ("renamed", "upper_ascii('ab')", "→ upper"),
    "upper_utf8": ("renamed", "upper_utf8('ab')", "→ upper"),
    "utf8_length": ("renamed", "utf8_length('héllo')", "→ length"),
    "utf8_reverse": ("renamed", "utf8_reverse('abc')", "→ reverse"),
    "utf8_substr": ("renamed", "utf8_substr('hello', 2, 3)", "→ substr"),
    "utf8_substring": ("renamed", "utf8_substring('hello', 2, 3)", "→ substring"),
    # ---------------- datetime ----------------
    "add_months": ("rewritten", "add_months(TIMESTAMP'2023-02-28 05:00:00', 1)", "keep-last-day + type-preserving"),
    "adddate": ("rewritten", "adddate(DATE'2020-02-28', 2)", "→ + make_interval(days)"),
    "subdate": ("rewritten", "subdate(DATE'2020-03-01', 1)", "→ - make_interval(days)"),
    "current_date": ("native", "current_date()", ""),
    "current_timestamp": ("native", "current_timestamp()", ""),
    "date_add": ("rewritten", "date_add(DATE'2020-01-01', 5)", "plain + INTERVAL forms"),
    "date_sub": ("rewritten", "date_sub(DATE'2020-01-10', 5)", "plain + INTERVAL forms"),
    "date_cmp": ("registered", "date_cmp(DATE'2020-01-02', DATE'2020-01-01')", ""),
    "date_part": ("rewritten", "date_part('year', DATE'2020-06-15')", "field-first swap + BIGINT cast"),
    "date_trunc": ("native", "date_trunc('MONTH', TIMESTAMP'2020-02-10 11:22:33')", ""),
    "datediff": ("native", "datediff(DATE'2020-01-10', DATE'2020-01-01')", ""),
    "day": ("native", "day(DATE'2020-06-15')", ""),
    "dayname": ("rewritten", "dayname(DATE'2020-06-15')", "→ date_format EEEE"),
    "dayofmonth": ("native", "dayofmonth(DATE'2020-06-15')", ""),
    "dayofweek": ("native", "dayofweek(DATE'2020-06-15')", ""),
    "dayofyear": ("native", "dayofyear(DATE'2020-02-01')", ""),
    "days_add": ("rewritten", "days_add(DATE'2020-02-28', 2)", "→ + make_interval"),
    "days_sub": ("rewritten", "days_sub(DATE'2020-03-01', 1)", "→ - make_interval"),
    "extract": ("rewritten", "extract(DATE'2020-06-15', 'year')", "source-first swap + BIGINT cast"),
    "from_timestamp": ("registered", "from_timestamp(TIMESTAMP'2020-01-02 03:04:05', 'yyyy-MM-dd')", ""),
    "from_unixtime": ("native", "from_unixtime(0)", ""),
    "from_utc_timestamp": ("native", "from_utc_timestamp(TIMESTAMP'2020-06-01 12:00:00', 'America/New_York')", "DST-aware"),
    "hour": ("native", "hour(TIMESTAMP'2020-01-01 05:06:07')", ""),
    "hours_add": ("registered", "hours_add(TIMESTAMP'2020-01-01 23:00:00', 2)", ""),
    "hours_sub": ("registered", "hours_sub(TIMESTAMP'2020-01-02 01:00:00', 2)", ""),
    "int_months_between": ("registered", "int_months_between(TIMESTAMP'2020-03-31', TIMESTAMP'2020-01-01')", ""),
    "last_day": ("native", "last_day(DATE'2020-02-10')", ""),
    "microseconds_add": ("registered", "microseconds_add(TIMESTAMP'2020-01-01 00:00:00', 5)", ""),
    "microseconds_sub": ("registered", "microseconds_sub(TIMESTAMP'2020-01-01 00:00:00', 5)", ""),
    "millisecond": ("registered", "millisecond(TIMESTAMP'2020-01-01 01:02:03.456')", ""),
    "milliseconds_add": ("registered", "milliseconds_add(TIMESTAMP'2020-01-01 00:00:00', 5)", ""),
    "milliseconds_sub": ("registered", "milliseconds_sub(TIMESTAMP'2020-01-01 00:00:00', 5)", ""),
    "minute": ("native", "minute(TIMESTAMP'2020-01-01 05:06:07')", ""),
    "minutes_add": ("registered", "minutes_add(TIMESTAMP'2020-01-01 00:59:00', 2)", ""),
    "minutes_sub": ("registered", "minutes_sub(TIMESTAMP'2020-01-01 01:01:00', 2)", ""),
    "month": ("native", "month(DATE'2020-06-15')", ""),
    "monthname": ("rewritten", "monthname(DATE'2020-06-15')", "→ date_format MMMM"),
    "months_add": ("rewritten", "months_add(DATE'2023-02-28', 1)", "keep-last-day contract"),
    "months_sub": ("rewritten", "months_sub(DATE'2023-03-31', 1)", "keep-last-day contract"),
    "months_add_interval": ("rewritten", "months_add_interval(DATE'2023-02-28', 1)", "clamp-only interval form"),
    "months_sub_interval": ("rewritten", "months_sub_interval(DATE'2023-03-31', 1)", "clamp-only interval form"),
    "months_between": ("rewritten", "months_between(DATE'2020-03-31', DATE'2020-02-28')", "time-of-day ignored, UNROUNDED (MonthsBetween; Spark rounds to 8dp)"),
    "nanoseconds_add": ("registered", "nanoseconds_add(TIMESTAMP'2020-01-01 00:00:00', 5000)", "ns→µs truncation documented"),
    "nanoseconds_sub": ("registered", "nanoseconds_sub(TIMESTAMP'2020-01-01 00:00:00', 5000)", "ns→µs truncation documented"),
    "next_day": ("native", "next_day(DATE'2020-01-01', 'MON')", ""),
    "now": ("native", "now()", ""),
    "quarter": ("native", "quarter(DATE'2020-05-01')", ""),
    "second": ("native", "second(TIMESTAMP'2020-01-01 05:06:07')", ""),
    "seconds_add": ("registered", "seconds_add(TIMESTAMP'2020-01-01 00:00:59', 2)", ""),
    "seconds_sub": ("registered", "seconds_sub(TIMESTAMP'2020-01-01 00:01:01', 2)", ""),
    "timeofday": ("registered", "timeofday()", ""),
    "timestamp_cmp": ("registered", "timestamp_cmp(TIMESTAMP'2020-01-02', TIMESTAMP'2020-01-01')", ""),
    "to_date": ("native", "to_date(TIMESTAMP'2020-06-15 10:00:00')", ""),
    "to_timestamp": ("native", "to_timestamp('05/03/2021', 'dd/MM/yyyy')", ""),
    "to_utc_timestamp": ("native", "to_utc_timestamp(TIMESTAMP'2020-06-01 12:00:00', 'America/New_York')", "DST-aware"),
    "unix_micros_to_utc_timestamp": ("registered", "unix_micros_to_utc_timestamp(0)", ""),
    "unix_timestamp": ("native", "unix_timestamp('2020-01-02', 'yyyy-MM-dd')", "string/format variants"),
    "utc_timestamp": ("registered", "utc_timestamp()", ""),
    "utc_to_unix_micros": ("registered", "utc_to_unix_micros(TIMESTAMP'1970-01-01 00:00:01')", ""),
    "week": ("renamed", "week(DATE'2020-01-01')", "→ weekofyear"),
    "weekofyear": ("native", "weekofyear(DATE'2020-01-01')", ""),
    "weeks_add": ("rewritten", "weeks_add(DATE'2020-01-01', 2)", "→ + make_interval"),
    "weeks_sub": ("rewritten", "weeks_sub(DATE'2020-01-15', 2)", "→ - make_interval"),
    "year": ("native", "year(DATE'2020-06-15')", ""),
    "years_add": ("rewritten", "years_add(DATE'2020-02-29', 1)", "→ + make_interval"),
    "years_sub": ("rewritten", "years_sub(DATE'2021-02-28', 1)", "→ - make_interval"),
    # ---------------- conditional ----------------
    "coalesce": ("native", "coalesce(NULL, 7)", ""),
    "if": ("native", "if(3 > 2, 'y', 'n')", ""),
    "ifnull": ("native", "ifnull(NULL, 'x')", ""),
    "isnull": ("rewritten", "isnull(NULL, 'x')", "2-arg → nvl; 1-arg native"),
    "istrue": ("registered", "istrue(NULL)", ""),
    "isfalse": ("registered", "isfalse(false)", ""),
    "isnottrue": ("registered", "isnottrue(NULL)", ""),
    "isnotfalse": ("registered", "isnotfalse(NULL)", ""),
    "nonnullvalue": ("registered", "nonnullvalue('x')", ""),
    "nullvalue": ("registered", "nullvalue(NULL)", ""),
    "nvl": ("native", "nvl(NULL, 7)", ""),
    "nullifzero": ("rewritten", "nullifzero(0)", "→ nullif(x, 0)"),
    "zeroifnull": ("rewritten", "zeroifnull(NULL)", "→ coalesce(x, 0)"),
    "distinctfrom": ("rewritten", "distinctfrom(1, NULL)", "→ NOT (a <=> b)"),
    "notdistinct": ("rewritten", "notdistinct(NULL, NULL)", "→ a <=> b"),
    # ---------------- hash / crypto ----------------
    "fnv_hash": ("registered", "fnv_hash('abc')", "faithful FNV-1a 64 (Arrow UDF)"),
    "murmur_hash": ("registered", "murmur_hash('abc')", "faithful MurmurHash2_64 (Arrow UDF)"),
    "md5": ("native", "md5('abc')", ""),
    "sha1": ("native", "sha1('abc')", ""),
    "sha2": ("native", "sha2('abc', 256)", ""),
    "uuid": ("native", "uuid()", "non-deterministic"),
    # ---------------- bits / bytes ----------------
    "bitand": ("registered", "bitand(6, 3)", ""),
    "bitor": ("registered", "bitor(6, 3)", ""),
    "bitxor": ("registered", "bitxor(6, 3)", ""),
    "bitnot": ("registered", "bitnot(6)", ""),
    "countset": ("registered", "countset(7)", ""),
    "getbit": ("native", "getbit(5, 0)", ""),
    "rotateleft": ("registered", "rotateleft(8, 62)", ""),
    "rotateright": ("registered", "rotateright(8, 62)", ""),
    "setbit": ("registered", "setbit(8, 0)", ""),
    "shiftleft": ("rewritten", "shiftleft(1, 3)", "result truncates to the first argument's int width (expr-test.cc:9903)"),
    "shiftright": ("rewritten", "shiftright(-8, 1)", "LOGICAL shift within the first argument's int width (ShiftRightLogicalImpl; -8 TINYINT is 0xF8 -> 0x7C); negative counts shift the other way"),
    # ---------------- masking ----------------
    "mask": ("native", "mask('AbCd-123')", "same per-char-class defaults"),
    "mask_first_n": ("registered", "mask_first_n('abcd', 2)", ""),
    "mask_last_n": ("registered", "mask_last_n('abcd', 2)", ""),
    "mask_show_first_n": ("registered", "mask_show_first_n('abcd1234', 4)", ""),
    "mask_show_last_n": ("registered", "mask_show_last_n('abcd1234', 4)", ""),
    "mask_hash": ("registered", "mask_hash('abc')", "sha2-256 rendering"),
    # ---------------- json ----------------
    "get_json_object": ("native", "get_json_object('{\"a\": 1}', '$.a')", ""),
    # ---------------- misc / session ----------------
    "coordinator": ("registered", "coordinator()", "driver host"),
    "current_catalog": ("native", "current_catalog()", ""),
    "current_database": ("native", "current_database()", ""),
    "current_session": ("registered", "current_session()", ""),
    "current_sid": ("renamed", "current_sid()", "→ current_session"),
    "current_user": ("native", "current_user()", ""),
    "effective_user": ("renamed", "effective_user()", "→ current_user"),
    "logged_in_user": ("renamed", "logged_in_user()", "→ current_user"),
    "session_user": ("native", "session_user()", ""),
    "user": ("renamed", "user()", "→ current_user"),
    "pid": ("registered", "pid()", "driver pid"),
    "sleep": ("registered", "sleep(1)", "Arrow UDF"),
    "typeof": ("native", "typeof(1)", "integer literals take the smallest-fit type (TINYINT), r8"),
    "version": ("native", "version()", "engine version string"),
    # ---------------- datasketches ----------------
    # sketch-agg names (ds_*_sketch/union) are aggregate-position functions;
    # probes aggregate over a constant inline table.
    "ds_hll_estimate": ("renamed", "ds_hll_estimate(ds_hll_sketch(x)) FROM (SELECT 1 AS x)", "→ hll_sketch_estimate (sketch bytes differ; algebra preserved)"),
    "ds_hll_union_f": ("renamed", "ds_hll_estimate(ds_hll_union_f(ds_hll_sketch(x), ds_hll_sketch(x))) FROM (SELECT 1 AS x)", "→ hll_union scalar"),
    "ds_hll_stringify": ("renamed", "ds_hll_stringify(ds_hll_sketch(x)) FROM (SELECT 1 AS x)", "→ hex of sketch bytes"),
    "ds_cpc_estimate": ("renamed", "ds_cpc_estimate(ds_cpc_sketch(x)) FROM (SELECT 1 AS x)", "→ hll_sketch_estimate"),
    "ds_cpc_union_f": ("renamed", "ds_cpc_estimate(ds_cpc_union_f(ds_cpc_sketch(x), ds_cpc_sketch(x))) FROM (SELECT 1 AS x)", "→ hll_union scalar"),
    "ds_cpc_stringify": ("renamed", "ds_cpc_stringify(ds_cpc_sketch(x)) FROM (SELECT 1 AS x)", "→ hex of sketch bytes"),
    "ds_theta_estimate": ("renamed", "ds_theta_estimate(ds_theta_sketch(x)) FROM (SELECT 1 AS x)", "→ hll estimate in SQL; exact KMV algebra in DataFrame API (operators/sketches.py)"),
    "ds_theta_union_f": ("renamed", "ds_theta_estimate(ds_theta_union_f(ds_theta_sketch(x), ds_theta_sketch(x))) FROM (SELECT 1 AS x)", "→ hll_union scalar"),
    "ds_theta_intersect_f": ("registered", "ds_theta_intersect_f(slice(array_sort(collect_set(shiftrightunsigned(xxhash64(a),1))),1,16384), slice(array_sort(collect_set(shiftrightunsigned(xxhash64(b),1))),1,16384)) FROM (SELECT explode(array(1,2,3,4)) AS a, 3 AS b)", "KMV array sketches; returns the intersection ESTIMATE (terminal ds_theta_estimate composition collapses, like the ds_kll rewrites)"),
    "ds_theta_exclude": ("registered", "ds_theta_exclude(slice(array_sort(collect_set(shiftrightunsigned(xxhash64(a),1))),1,16384), slice(array_sort(collect_set(shiftrightunsigned(xxhash64(b),1))),1,16384)) FROM (SELECT explode(array(1,2,3,4)) AS a, 3 AS b)", "KMV array sketches; returns the A-not-B ESTIMATE (exact regime below k=16384)"),
    "ds_kll_quantile": ("rewritten", "ds_kll_quantile(ds_kll_sketch(x), 0.5) FROM (SELECT 1 AS x)", "composition → percentile"),
    "ds_kll_n": ("rewritten", "ds_kll_n(ds_kll_sketch(CAST(2 AS FLOAT)))", "sketch composition collapses to count(x)"),
    "ds_kll_rank": ("rewritten", "ds_kll_rank(ds_kll_sketch(CAST(2 AS FLOAT)), 3)", "collapses to exact avg(x < v)"),
    "ds_kll_cdf_as_string": ("rewritten", "ds_kll_cdf_as_string(ds_kll_sketch(x), 2, 3) FROM (SELECT CAST(x AS FLOAT) AS x FROM (SELECT explode(array(1,2,3,4)) AS x))", "exact CDF at the split points, %.6g-rendered + trailing 1 (GetDsKllPMFOrCDF)"),
    "ds_kll_pmf_as_string": ("rewritten", "ds_kll_pmf_as_string(ds_kll_sketch(x), 2, 3) FROM (SELECT CAST(x AS FLOAT) AS x FROM (SELECT explode(array(1,2,3,4)) AS x))", "exact bucket masses, %.6g-rendered (GetDsKllPMFOrCDF)"),
    "ds_kll_quantiles_as_string": ("rewritten", "ds_kll_quantiles_as_string(ds_kll_sketch(x), 0, 0.5, 1) FROM (SELECT CAST(x AS FLOAT) AS x FROM (SELECT explode(array(1,2,3,4)) AS x))", "exact percentiles, %.6g-rendered comma list (DsKllQuantilesAsString)"),
    "ds_kll_stringify": ("rewritten", "ds_kll_stringify(ds_kll_sketch(x)) FROM (SELECT CAST(x AS FLOAT) AS x FROM (SELECT explode(array(1,2,3,4)) AS x))", "to_string(false,false) summary block over exact N/min/max; K/M library defaults"),
    "ds_hll_estimate_bounds_as_string": ("rewritten", "ds_hll_estimate_bounds_as_string(ds_hll_sketch(x), 1) FROM (SELECT 1 AS x)", "est,lb,ub with lgK=12 RSE bounds approximation (DsHllEstimateBoundsAsString)"),
    # ---------------- out-of-scope ----------------
    "iceberg_bucket_transform": ("out-of-scope", None, "Iceberg partition transform; no Iceberg connector in scope"),
    "iceberg_truncate_transform": ("out-of-scope", None, "Iceberg partition transform; no Iceberg connector in scope"),
    "madlib_encode_vector": ("out-of-scope", None, "MADlib interop test helper"),
    "madlib_decode_vector": ("out-of-scope", None, "MADlib interop test helper"),
    "madlib_print_vector": ("out-of-scope", None, "MADlib interop test helper"),
    "madlib_vector": ("out-of-scope", None, "MADlib interop test helper"),
    "madlib_vector_get": ("out-of-scope", None, "MADlib interop test helper"),
    "udf_abs": ("out-of-scope", None, "reference test-only sample UDF"),
    "udf_lower": ("out-of-scope", None, "reference test-only sample UDF"),
    "udf_pi": ("out-of-scope", None, "reference test-only sample UDF"),
}
# fmt: on

# names the reference registry declares via ds_*_sketch/ds_kll_sketch that
# appear only inside compositions above
_AGG_POSITION = {"ds_hll_sketch", "ds_cpc_sketch", "ds_theta_sketch", "ds_kll_sketch"}


def reference_names() -> set[str]:
    """Extract declared scalar names from the reference registry file."""
    import re

    path = (
        "/root/reference/apache-impala-4.1.0/common/function-registry/"
        "impala_functions.py"
    )
    names: set[str] = set()
    with open(path) as f:
        src = f.read()
    for m in re.finditer(r"\[\[([^\]]+)\]", src):
        for piece in m.group(1).split(","):
            piece = piece.strip().strip("'\"")
            if piece and re.fullmatch(r"[a-z0-9_]+", piece):
                names.add(piece)
    return names



# ---------------------------------------------------------------------------
# Value pins: expected result of each deterministic probe, normalized by
# `normalize_value`.  Derived from reference semantics (Impala function
# kernels: be/src/exprs/*-functions-ir.cc; expectations cross-checked
# against testdata/workloads/functional-query/queries/QueryTest/exprs.test
# conventions) and reviewed name-by-name — NOT a blind snapshot: the
# Impala-specific contracts (keep-last-day month arithmetic, tinyint-width
# rotates, IS TRUE null handling, ISO weeks, byte-vs-codepoint lengths,
# x/0 -> NULL non-ANSI division) are each asserted by these pins.
# Excluded: non-deterministic (rand/uuid/now family) and
# environment-dependent (user/host/pid/version) names.
# fmt: off
EXPECTED: dict[str, str] = {
    'abs': '3',
    'acos': '0.0',
    'asin': '0.0',
    'atan': '0.0',
    'atan2': '0.785398163',
    'bin': '101',
    'ceil': '2',
    'ceiling': '2',
    'conv': '255',
    'cos': '1.0',
    'cosh': '1.0',
    'cot': '0.642092616',
    'degrees': '180.0',
    'e': '2.718281828',
    'exp': '2.718281828',
    'factorial': '120',
    'floor': '1',
    'greatest': '3',
    'hex': 'FF',
    'least': '1',
    'ln': '1.0',
    'log': '3.0',
    'log10': '2.0',
    'log2': '3.0',
    'mod': '1',
    'negative': '-5',
    'pi': '3.141592654',
    'pmod': '-2',
    'positive': '-5',
    'pow': '1024.0',
    'power': '1024.0',
    'radians': '3.141592654',
    'round': '3',
    'sign': '-1.0',
    'sin': '0.0',
    'sinh': '0.0',
    'sqrt': '2.0',
    'tan': '0.0',
    'tanh': '0.0',
    'width_bucket': '3',
    'unhex': 'AB',
    'dceil': '2',
    'dfloor': '1',
    'dround': '3',
    'dtrunc': '9',
    'dexp': '2.718281828',
    'dlog1': '1.0',
    'dlog10': '2.0',
    'dsqrt': '2.0',
    'dpow': '1024.0',
    'fpow': '1024.0',
    'fmod': '1.5',
    'quotient': '3',
    'truncate': '3.45',
    'is_inf': 'false',
    'is_nan': 'false',
    'trunc': '2020-06-01',
    'max_tinyint': '127',
    'min_tinyint': '-128',
    'max_smallint': '32767',
    'min_smallint': '-32768',
    'max_int': '2147483647',
    'min_int': '-2147483648',
    'max_bigint': '9223372036854775807',
    'min_bigint': '-9223372036854775808',
    'precision': '12',
    'scale': '2',
    'ascii': '65',
    'btrim': 'x',
    'bytes': '6',
    'char_length': '3',
    'character_length': '3',
    'chr': 'A',
    'concat': 'ab',
    'concat_ws': 'a-b',
    'find_in_set': '2',
    'initcap': 'Hello World',
    'instr': '4',
    'left': 'imp',
    'length': '6',
    'levenshtein': '1',
    'locate': '4',
    'lower': 'abc',
    'lcase': 'abc',
    'lpad': '007',
    'ltrim': 'x',
    'parse_url': 'a.com',
    'repeat': 'ababab',
    'replace': 'bbb',
    'reverse': 'cba',
    'right': 'ala',
    'rpad': '700',
    'rtrim': 'x',
    'space': '3',
    'split_part': 'c',
    'strleft': 'imp',
    'strright': 'ala',
    'substr': 'ell',
    'substring': 'ell',
    'translate': 'xycyx',
    'trim': 'x',
    'upper': 'ABC',
    'ucase': 'ABC',
    'regexp_extract': '12',
    'regexp_like': 'true',
    'regexp_replace': 'ab',
    'regexp_escape': 'a\\.b',
    'regexp_match_count': '3',
    'base64encode': 'YWI=',
    'base64decode': 'ab',
    'jaro_distance': '0.055555556',
    'jaro_similarity': '0.944444444',
    'jaro_winkler_distance': '0.038888889',
    'jaro_winkler_similarity': '0.961111111',
    'damerau_levenshtein': '1',
    'jaro_dst': '0.055555556',
    'jaro_sim': '0.944444444',
    'jw_dst': '0.038888889',
    'jw_sim': '0.961111111',
    'le_dst': '1',
    'dle_dst': '1',
    'initcap_ascii': 'Ab Cd',
    'initcap_utf8': 'Ab Cd',
    'lcase_ascii': 'ab',
    'lcase_utf8': 'ab',
    'lower_ascii': 'ab',
    'lower_utf8': 'ab',
    'ucase_ascii': 'AB',
    'ucase_utf8': 'AB',
    'upper_ascii': 'AB',
    'upper_utf8': 'AB',
    'utf8_length': '5',
    'utf8_reverse': 'cba',
    'utf8_substr': 'ell',
    'utf8_substring': 'ell',
    'add_months': '2023-03-31 05:00:00',
    'adddate': '2020-03-01',
    'subdate': '2020-02-29',
    'date_add': '2020-01-06',
    'date_sub': '2020-01-05',
    'date_cmp': '1',
    'date_part': '2020',
    'date_trunc': '2020-02-01 00:00:00',
    'datediff': '9',
    'day': '15',
    'dayname': 'Monday',
    'dayofmonth': '15',
    'dayofweek': '2',
    'dayofyear': '32',
    'days_add': '2020-03-01',
    'days_sub': '2020-02-29',
    'extract': '2020',
    'from_timestamp': '2020-01-02',
    'from_unixtime': '1970-01-01 00:00:00',
    'from_utc_timestamp': '2020-06-01 08:00:00',
    'hour': '5',
    'hours_add': '2020-01-02 01:00:00',
    'hours_sub': '2020-01-01 23:00:00',
    'int_months_between': '2',
    'last_day': '2020-02-29',
    'microseconds_add': '2020-01-01 00:00:00.000005',
    'microseconds_sub': '2019-12-31 23:59:59.999995',
    'millisecond': '456',
    'milliseconds_add': '2020-01-01 00:00:00.005000',
    'milliseconds_sub': '2019-12-31 23:59:59.995000',
    'minute': '6',
    'minutes_add': '2020-01-01 01:01:00',
    'minutes_sub': '2020-01-01 00:59:00',
    'month': '6',
    'monthname': 'June',
    'months_add': '2023-03-31',
    'months_sub': '2023-02-28',
    'months_add_interval': '2023-03-28',
    'months_sub_interval': '2023-02-28',
    'months_between': '1.096774194',
    'nanoseconds_add': '2020-01-01 00:00:00.000005',
    'nanoseconds_sub': '2019-12-31 23:59:59.999995',
    'next_day': '2020-01-06',
    'quarter': '2',
    'second': '7',
    'seconds_add': '2020-01-01 00:01:01',
    'seconds_sub': '2020-01-01 00:00:59',
    'timestamp_cmp': '1',
    'to_date': '2020-06-15',
    'to_timestamp': '2021-03-05 00:00:00',
    'to_utc_timestamp': '2020-06-01 16:00:00',
    'unix_micros_to_utc_timestamp': '1970-01-01 00:00:00',
    'unix_timestamp': '1577923200',
    'utc_to_unix_micros': '1000000',
    'week': '1',
    'weekofyear': '1',
    'weeks_add': '2020-01-15',
    'weeks_sub': '2020-01-01',
    'year': '2020',
    'years_add': '2021-02-28',
    'years_sub': '2020-02-28',
    'coalesce': '7',
    'if': 'y',
    'ifnull': 'x',
    'isnull': 'x',
    'istrue': 'false',
    'isfalse': 'true',
    'isnottrue': 'true',
    'isnotfalse': 'true',
    'nonnullvalue': 'true',
    'nullvalue': 'true',
    'nvl': '7',
    'nullifzero': 'NULL',
    'zeroifnull': '0',
    'distinctfrom': 'true',
    'notdistinct': 'true',
    'fnv_hash': '-1792535898324117685',
    'murmur_hash': '-7148968302806999301',
    'md5': '900150983cd24fb0d6963f7d28e17f72',
    'sha1': 'a9993e364706816aba3e25717850c26c9cd0d89d',
    'sha2': 'ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad',
    'bitand': '2',
    'bitor': '7',
    'bitxor': '5',
    'bitnot': '-7',
    'countset': '3',
    'getbit': '1',
    'rotateleft': '2',
    'rotateright': '32',
    'setbit': '9',
    'shiftleft': '8',
    'shiftright': '124',
    'mask': 'XxXx-nnn',
    'mask_first_n': 'xxcd',
    'mask_last_n': 'abxx',
    'mask_show_first_n': 'abcdnnnn',
    'mask_show_last_n': 'xxxx1234',
    'mask_hash': 'ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad',
    'get_json_object': '1',
    'sleep': 'true',
    'typeof': 'TINYINT',  # uppercase per ScalarType.toSql
    'ds_hll_estimate': '1',
    'ds_hll_union_f': '1',
    'ds_hll_stringify': '0201070C030001082BF2FB0600000000000000000000000000000000000000000000000000000000',
    'ds_cpc_estimate': '1',
    'ds_cpc_union_f': '1',
    'ds_cpc_stringify': '0201070C030001082BF2FB0600000000000000000000000000000000000000000000000000000000',
    'ds_theta_estimate': '1',
    'ds_theta_union_f': '1',
    'ds_kll_quantile': '1.0',
    'ds_kll_n': '1',
    'ds_theta_exclude': '3.0',
    'ds_theta_intersect_f': '1.0',
    'ds_kll_rank': '1.0',
    'ds_kll_quantiles_as_string': '1,2.5,4',
    'ds_kll_cdf_as_string': '0.25,0.5,1',
    'ds_kll_pmf_as_string': '0.25,0.25,0.5',
    'ds_hll_estimate_bounds_as_string': '1,0.98401,1.01625',
    'ds_kll_stringify': '### KLL sketch summary:\n   K              : 200\n   min K          : 200\n   M              : 8\n   N              : 4\n   Epsilon        : 1.33%\n   Epsilon PMF    : 1.65%\n   Empty          : false\n   Estimation mode: false\n   Levels         : 1\n   Sorted         : false\n   Min value      : 1\n   Max value      : 4\n### End sketch summary\n',
}
# fmt: on


def normalize_value(v) -> str:
    """Canonical string form for pin comparison (floats rounded to 9dp so
    JVM/libc last-ulp noise cannot flake the matrix)."""
    import datetime
    import decimal

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        return repr(round(v, 9))
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, datetime.date):
        return v.isoformat()
    return str(v)


def run_probes(eng) -> dict[str, str]:
    """Execute every probe; returns {name: error} for failures."""
    errors: dict[str, str] = {}
    for name, (status, probe, _) in MATRIX.items():
        if probe is None:
            continue
        sql = f"SELECT {probe} AS v" if " FROM " not in probe else f"SELECT {probe}"
        try:
            rows = eng.sql(sql).collect()
            if name in EXPECTED:
                got = normalize_value(rows[0][0])
                if got != EXPECTED[name]:
                    errors[name] = (
                        f"{status}: value pin mismatch — expected "
                        f"{EXPECTED[name]!r}, got {got!r}"
                    )
        except Exception as ex:  # noqa: BLE001 — report, don't raise
            errors[name] = f"{status}: {str(ex).splitlines()[0][:120]}"
    return errors


def write_markdown(path: str = "FUNCTIONS.md") -> None:
    from collections import Counter

    counts = Counter(status for status, _, _ in MATRIX.values())
    supported = sum(
        counts[s] for s in ("native", "renamed", "rewritten", "registered")
    )
    ref = reference_names()
    missing = sorted(ref - set(MATRIX) - _AGG_POSITION)
    lines = [
        "# Scalar-function matrix vs the reference registry",
        "",
        "Generated by `tools/gen_function_matrix.py`; every supported row's",
        "probe expression is executed through the Impala-dialect SQL surface",
        "by `tests/test_function_matrix.py`, and rows marked `pinned` also",
        "assert the probe's VALUE against a reviewed reference-semantics",
        "expectation (EXPECTED in the tool) — parity evidence, not just",
        "no-crash evidence.  Unpinned supported rows are the",
        "non-deterministic / environment-dependent names (rand/uuid/now,",
        "user/host/pid/version families).",
        "",
        f"**{supported} of {len(MATRIX)} classified names supported** "
        f"(native {counts['native']}, renamed {counts['renamed']}, "
        f"rewritten {counts['rewritten']}, registered {counts['registered']}; "
        f"unsupported {counts['unsupported']}, "
        f"out-of-scope {counts['out-of-scope']}); "
        f"**{len(EXPECTED)} value-pinned**.",
        "",
        "| function | status | pinned | probe / note |",
        "|---|---|---|---|",
    ]
    for name in sorted(MATRIX):
        status, probe, note = MATRIX[name]
        detail = " — ".join(x for x in (f"`{probe}`" if probe else "", note) if x)
        pin = f"`{EXPECTED[name]}`" if name in EXPECTED else ""
        lines.append(f"| {name} | {status} | {pin} | {detail} |")
    if missing:
        lines += ["", "Unclassified reference names: " + ", ".join(missing)]
    with open(path, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {path}: {len(MATRIX)} rows, {supported} supported")
    if missing:
        print("UNCLASSIFIED:", missing)


if __name__ == "__main__":
    write_markdown()
