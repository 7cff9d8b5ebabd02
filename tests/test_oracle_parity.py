"""Differential gate: every registered query with an oracle must match the
DuckDB oracle exactly (mirrors the driver's t2 check, at sf0.001 for speed).
Queries without an oracle must at least run and return a stable schema."""

from __future__ import annotations

import pytest

from hopspark.operators import all_queries
from hopspark.testing import compare

_ALL = all_queries()


@pytest.mark.parametrize("name", sorted(_ALL))
def test_query_matches_oracle(spark, sf_dir, name):
    fn, sql = _ALL[name]
    df = fn(spark, sf_dir)
    if sql is None:
        rows = df.count()
        assert rows >= 0
        assert df.schema.fieldNames()
        return
    result = compare(df, sql, sf_dir)
    assert result.ok, "\n".join(result.errors)
