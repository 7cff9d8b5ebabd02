"""Registry-wide oracle result-type guard (round-4 verdict item 1).

DuckDB widens integer SUM to HUGEINT (int128). A driver that fetches the
oracle through pandas/Arrow renders HUGEINT as float64 (``24`` → ``"24.0"``,
13-digit values lose mantissa bits), breaking the value hash while
``fetchall()``-based local comparisons — which get lossless Python ints —
still pass. That divergence cost two gate rows in rounds 3 and 4.

This guard binds (does NOT fetch) every registered oracle SQL against the
sf0.001 views and asserts no result column type is HUGEINT/INT128, so a
future ``SUM(CASE ...)`` can't silently regress the gate. Binding is
schema-only, so the whole registry checks in seconds without Spark.
"""

from __future__ import annotations

import pytest

from hopspark.operators import all_queries
from hopspark.testing import oracle_connection, type_category

from conftest import TEST_SF_DIR

_ALL = all_queries()
_WITH_ORACLE = sorted(n for n, (_, sql) in _ALL.items() if sql is not None)


@pytest.fixture(scope="module")
def oracle_con():
    con = oracle_connection(TEST_SF_DIR)
    yield con
    con.close()


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_has_no_int128_columns(oracle_con, name):
    _, sql = _ALL[name]
    rel = oracle_con.sql(sql)
    bad = [
        f"{c}: {t}"
        for c, t in zip(rel.columns, rel.types)
        if type_category(t) == "hugeint"
    ]
    assert not bad, (
        f"oracle for {name!r} yields int128 column(s) {bad} — a pandas/Arrow "
        f"driver fetch renders these as float64 and the value hash breaks; "
        f"CAST the aggregate to BIGINT in the oracle SQL"
    )
