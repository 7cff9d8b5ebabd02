"""DuckDB-oracle comparison harness — the engine's analogue of the
reference's randomized differential tester (tests/comparison/
discrepancy_searcher.py in the reference tree, which compared the engine
against Postgres).

`compare(spark_df, oracle_sql, sf_dir)` runs the oracle on the same parquet
tables and compares row counts, column names, and values order-insensitively
and exactly (bit-exact doubles), mirroring the driver's t2 gate."""

from __future__ import annotations

import math
import os
from dataclasses import dataclass, field

import duckdb
import pandas as pd
from pyspark.sql import DataFrame

from hopspark.catalog import TABLES, table_path


def oracle_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        p = table_path(sf_dir, t)
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    # Sort columns by name, then rows by every column (string repr for
    # mixed/NaN-safe ordering) — an order-insensitive canonical form.
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        key = df.astype(str)
        order = key.sort_values(by=list(df.columns)).index
        df = df.loc[order].reset_index(drop=True)
    return df


@dataclass
class CompareResult:
    ok: bool
    errors: list[str] = field(default_factory=list)

    def __bool__(self) -> bool:
        return self.ok


def compare(spark_df: DataFrame, oracle_sql: str, sf_dir: str) -> CompareResult:
    got = spark_df.toPandas()
    con = oracle_connection(sf_dir)
    try:
        want = con.execute(oracle_sql).fetchdf()
    finally:
        con.close()

    errors: list[str] = []
    if sorted(got.columns) != sorted(want.columns):
        errors.append(f"columns differ: spark={sorted(got.columns)} oracle={sorted(want.columns)}")
        return CompareResult(False, errors)
    if len(got) != len(want):
        errors.append(f"row count differs: spark={len(got)} oracle={len(want)}")
        return CompareResult(False, errors)

    g = _normalize(got)
    w = _normalize(want)
    for col in g.columns:
        for i, (a, b) in enumerate(zip(g[col], w[col])):
            if _value_eq(a, b):
                continue
            errors.append(f"value mismatch col={col} row={i}: spark={a!r} oracle={b!r}")
            if len(errors) >= 5:
                return CompareResult(False, errors)
    return CompareResult(not errors, errors)


def _value_eq(a: object, b: object) -> bool:
    a_null = a is None or (isinstance(a, float) and math.isnan(a)) or a is pd.NaT
    b_null = b is None or (isinstance(b, float) and math.isnan(b)) or b is pd.NaT
    if a_null or b_null:
        return a_null and b_null
    if isinstance(a, float) or isinstance(b, float):
        return float(a) == float(b)  # exact: the driver hashes values
    if isinstance(a, (list, tuple)) or isinstance(b, (list, tuple)):
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(_value_eq(x, y) for x, y in zip(la, lb))
    try:
        import numpy as np

        if isinstance(a, np.ndarray) or isinstance(b, np.ndarray):
            la, lb = list(a), list(b)
            return len(la) == len(lb) and all(_value_eq(x, y) for x, y in zip(la, lb))
    except ImportError:
        pass
    return bool(a == b)
