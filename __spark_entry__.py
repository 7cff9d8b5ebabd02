"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query (TPC-H Q1-style pricing summary) on
sf0.001. `queries()` exposes every implemented operator from SURVEY.md §2
as (spark, sf_dir) → DataFrame; `oracle_sql()` gives the DuckDB-runnable
ANSI-SQL twin for each (omitted for non-SQL-expressible operators, which
get a rows-only check).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from hopspark.functions import register_all  # noqa: E402
from hopspark.operators import all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    register_all(spark)
    from hopspark.operators.tpch import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def _prepared(fn: Callable[[SparkSession, str], DataFrame]):
    """Bind a query to the engine's dialect semantics regardless of how the
    caller built its SparkSession: Impala-style non-ANSI arithmetic (Impala
    wraps/nulls instead of erroring; reference be/src/exprs/operators-ir.cc)
    and the engine's scalar-function registry. Both are idempotent runtime
    confs, safe to apply per call."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.ansi.enabled", "false")
        register_all(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: _prepared(fn) for name, (fn, _sql) in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted ⇒ rows-only check)."""
    return {name: sql for name, (_fn, sql) in all_queries().items() if sql is not None}
