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


def driver_canon(df: pd.DataFrame) -> list[tuple]:
    """Canonicalize a result exactly the way the driver's oracle gate does.

    The driver reorders columns by name, then calls pandas ``sort_values``
    over ALL columns on the RAW cell values — NOT a string projection — and
    only then renders values for hashing.  Sorting raw values means an
    array/map/struct-typed output column makes pandas' lexsort factorizer
    throw ``TypeError: unhashable type: 'list'`` before any comparison runs
    (exactly the CORRECTNESS_r07 ``emb_quantize_int8`` failure).  The sim
    must crash the same way, so this function deliberately does NOT
    stringify before sorting the rows.

    Rendering: nulls (None/NaN/NaT) → "NULL" on both sides (pandas widens
    nullable ints to float64 identically for a Spark ``toPandas()`` and a
    DuckDB Arrow fetch, so the two sides stay comparable); floats rounded
    to 6 dp; everything else ``str()``."""
    import numpy as np

    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    out: list[tuple] = []
    for row in df.itertuples(index=False, name=None):
        vals = []
        for v in row:
            if v is None or v is pd.NaT:
                vals.append("NULL")
            elif isinstance(v, (float, np.floating)):
                vals.append("NULL" if math.isnan(v) else str(round(float(v), 6)))
            else:
                vals.append(str(v))
        out.append(tuple(vals))
    return out


def type_category(type_str: str) -> str:
    """Collapse a Spark dtype / DuckDB type string to a comparison category.

    The driver fetches the oracle through pandas/Arrow, which renders DuckDB
    HUGEINT (int128 — what SUM over integers widens to) as float64, breaking
    the value hash while `fetchall()`-based local comparisons still pass.
    Categories let us fail that class of bug BEFORE fetch, where no pandas
    null-widening noise exists (round-4 verdict item 2)."""
    s = str(type_str).upper()
    if "HUGEINT" in s or "INT128" in s:
        return "hugeint"
    if "DECIMAL" in s or "NUMERIC" in s:
        return "decimal"
    if any(k in s for k in ("DOUBLE", "FLOAT", "REAL")):
        return "float"
    if "BOOL" in s:
        return "bool"
    if any(
        k in s
        for k in ("TINYINT", "SMALLINT", "BIGINT", "INTEGER", "INT", "LONG",
                  "SHORT", "BYTE")
    ):
        return "int"
    if "TIMESTAMP" in s:
        return "timestamp"
    if "DATE" in s:
        return "date"
    if any(k in s for k in ("VARCHAR", "STRING", "CHAR", "TEXT")):
        return "str"
    if "BINARY" in s or "BLOB" in s:
        return "binary"
    return "other"


def oracle_type_errors(scols_types: list, ocols_types: list) -> list[str]:
    """Compare (name, type) lists category-wise; sorted by column name.

    `scols_types` from Spark `df.dtypes`; `ocols_types` from a DuckDB
    relation's (columns, types) zip. Any HUGEINT oracle column is an error
    even if Spark happens to agree, because the driver's pandas fetch cannot
    represent it faithfully."""
    errors: list[str] = []
    omap = {c: str(t) for c, t in ocols_types}
    smap = {c: str(t) for c, t in scols_types}
    for c, t in sorted(omap.items()):
        if type_category(t) == "hugeint":
            errors.append(
                f"oracle column {c!r} is {t} (int128): pandas/Arrow fetch "
                f"renders it float64 — CAST(... AS BIGINT) in the oracle SQL"
            )
    for c in sorted(set(smap) & set(omap)):
        sc, oc = type_category(smap[c]), type_category(omap[c])
        if sc == oc or "hugeint" in (sc, oc):
            continue
        # int vs float vs decimal drift is exactly what breaks the driver's
        # str()-level value hash; date/timestamp likewise. str-vs-other is
        # noise only when a side is a complex type rendered as string.
        if {sc, oc} <= {"int", "float", "decimal"} or {sc, oc} <= {
            "date", "timestamp"
        }:
            errors.append(
                f"type category mismatch col={c}: spark={smap[c]}({sc}) "
                f"oracle={omap[c]}({oc})"
            )
    return errors


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
        rel = con.sql(oracle_sql)
        type_errs = oracle_type_errors(
            spark_df.dtypes, list(zip(rel.columns, rel.types))
        )
        want = rel.df()
    finally:
        con.close()

    errors: list[str] = list(type_errs)
    if errors:
        return CompareResult(False, errors)
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
