"""Property tests for the dialect translator: Spark-compatible SQL must
pass through byte-for-byte, and translation must be idempotent (the
reference's analyzer re-analyzes after rewrites — AnalysisContext.java —
so rewrites must be stable under re-application)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from hopspark.dialect import translate
from hopspark.dialect.translate import tokenize, untokenize

# Identifiers that never collide with rewrite triggers.
_IDENT = st.text(alphabet="abcxyz_", min_size=1, max_size=8).filter(
    lambda s: s
    not in {
        "isnull",
        "zeroifnull",
        "aggif",
        "cast",
        "unnest",
        "week",
        "user",
        "regexp",
        "fmod",
        "ndv",
        "chr",
    }
)
_LITERAL = st.one_of(
    st.integers(0, 10_000).map(str),
    st.floats(0, 1e6, allow_nan=False).map(lambda f: f"{f:.3f}"),
    _IDENT.map(lambda s: f"'{s}'"),
)
_TERM = st.one_of(_IDENT, _LITERAL)


@given(
    cols=st.lists(_TERM, min_size=1, max_size=5),
    tbl=_IDENT,
    cond_l=_TERM,
    cond_r=_TERM,
)
@settings(max_examples=200, deadline=None)
def test_neutral_sql_passes_through(cols, tbl, cond_l, cond_r):
    sql = f"SELECT {', '.join(cols)} FROM {tbl} WHERE {cond_l} = {cond_r}"
    assert translate(sql) == sql


@given(s=st.text(min_size=0, max_size=60))
@settings(max_examples=200, deadline=None)
def test_tokenizer_roundtrip_lossless(s):
    assert untokenize(tokenize(s)) == s


DIALECT_SAMPLES = [
    "SELECT a FROM t ORDER BY a DESC, b",
    "SELECT isnull(a, b), zeroifnull(c) FROM t",
    "SELECT aggif(x = 1, y) FROM t",
    "SELECT CAST(s AS TIMESTAMP FORMAT 'YYYY-MM-DD') FROM t",
    "SELECT date_add(d, INTERVAL 3 days) FROM t",
    "SELECT a IREGEXP 'x.*' FROM t",
    "SELECT arr.item FROM t, UNNEST(arr)",
    "SELECT ndv(x), appx_median(y) FROM t",
    # round-8 advice: DATE-overload date_trunc/trunc wrap + guard must not
    # re-fire on their own output; to_date_strict must be recognized as
    # DATE-typed so next_day/last_day keep the native DATE form
    "SELECT date_trunc('YEAR', DATE '1200-06-15')",
    "SELECT trunc(DATE '1200-06-15', 'YEAR')",
    "SELECT date_trunc('WEEK', DATE '1400-01-01')",
    "SELECT next_day(CAST(c AS DATE), 'MO') FROM t",
    "SELECT last_day(CAST(c AS DATE)) FROM t",
    # round-9: ns constant folding, IEEE NaN comparison routing, and the
    # unix_timestamp trailing-input truncation must not re-fire on their
    # own output
    "SELECT cast(date_add(cast('2012-01-01 00:00:00.000000001' as"
    " timestamp), interval 1033 nanoseconds) as string)",
    "SELECT CAST('1400-01-01 00:00:00' AS TIMESTAMP) - INTERVAL 1"
    " NANOSECONDS",
    "SELECT 0/0 = 0/0",
    "SELECT cast('nan' as double) <=> cast('nan' as double) d",
    "SELECT unix_timestamp('2038/01/19T03:14:08+01:00',"
    " 'yyyy/MM/ddTHH:mm:ss')",
]


def test_translation_idempotent():
    for sql in DIALECT_SAMPLES:
        once = translate(sql)
        assert translate(once) == once, sql


def test_strings_and_comments_untouched():
    sql = (
        "SELECT 'isnull(a,b) ORDER BY x' AS s, c -- ORDER BY comment\n"
        "FROM t /* aggif(p, x) in comment */"
    )
    out = translate(sql)
    assert "'isnull(a,b) ORDER BY x'" in out
    assert "-- ORDER BY comment" in out
    assert "/* aggif(p, x) in comment */" in out
