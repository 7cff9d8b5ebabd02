"""Shared helpers for the operator library.

Determinism discipline: the correctness gate hash-compares our results
against a DuckDB oracle, so every floating aggregate must be bit-identical
across engines. Double summation is order-dependent (Spark's partial aggs
sum in partition order, DuckDB in its own), so money/quantity math follows
the reference's own approach — Impala models money as DECIMAL(12,2)
(testdata/datasets/tpch/tpch_schema_template.sql in the reference tree) and
aggregates decimals exactly. We cast measures to tight decimals before
aggregating (exact, order-independent), and convert to DOUBLE only at the
very end (a single deterministic conversion). Averages are computed as
exact-decimal SUM cast to double, divided by COUNT — one IEEE division.

This also matches DECIMAL_V2 semantics (be/src/service/query-options.h:121)
more closely than double math would.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def dec(col: str | Column, precision: int = 12, scale: int = 2) -> Column:
    """Cast a column to a tight decimal for exact aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(T.DecimalType(precision, scale))


def one_minus(col: str, precision: int = 5, scale: int = 2) -> Column:
    """(1 - x) as a tight decimal — e.g. (1 - l_discount)."""
    return (F.lit(1) - dec(col, 4, 2)).cast(T.DecimalType(precision, scale))


def one_plus(col: str, precision: int = 5, scale: int = 2) -> Column:
    """(1 + x) as a tight decimal — e.g. (1 + l_tax)."""
    return (F.lit(1) + dec(col, 4, 2)).cast(T.DecimalType(precision, scale))


def dsum(c: Column) -> Column:
    """Exact decimal sum surfaced as DOUBLE (deterministic)."""
    return F.sum(c).cast("double")


def davg(c: Column) -> Column:
    """Deterministic average: exact decimal sum → double, / count."""
    return F.sum(c).cast("double") / F.count(c)


# SQL-side twins for oracle strings -----------------------------------------

DEC_QTY = "CAST(l_quantity AS DECIMAL(12,2))"
DEC_PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"
DEC_DISC = "CAST(l_discount AS DECIMAL(4,2))"
DEC_TAX = "CAST(l_tax AS DECIMAL(4,2))"
ONE_MINUS_DISC = f"CAST(1 - {DEC_DISC} AS DECIMAL(5,2))"
ONE_PLUS_TAX = f"CAST(1 + {DEC_TAX} AS DECIMAL(5,2))"
REVENUE_TERM = f"{DEC_PRICE} * {ONE_MINUS_DISC}"  # DECIMAL(18,4), exact
