"""Simulate the driver's correctness gate: run every registry query AND its
DuckDB oracle side-by-side at a given SF, compare row count, sorted-column
schema, and a rounded-value hash — the same checks CORRECTNESS_r{N}.json
records.

Usage: PYTHONPATH=. python tools/driver_sim.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _norm(rows, cols):
    idx = [cols.index(c) for c in sorted(cols)]
    out = []
    for r in rows:
        vals = []
        for i in idx:
            v = r[i]
            if isinstance(v, float):
                v = round(v, 6)
            vals.append(str(v))
        out.append(tuple(vals))
    return sorted(out)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    from hopspark.operators import all_queries
    from hopspark.session import get_spark

    spark = get_spark(app_name="driver-sim")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    results = {}
    fails = []
    for name, (fn, sql) in sorted(all_queries().items()):
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if sql is None:
                results[name] = {"err": "no_oracle", "spark_rows": len(srows)}
                continue
            ores = con.sql(sql)
            ocols = list(ores.columns)
            orows = ores.fetchall()
            rows_match = len(srows) == len(orows)
            schema_match = sorted(scols) == sorted(ocols)
            hash_match = _norm(srows, scols) == _norm(orows, ocols)
            results[name] = {
                "rows_match": rows_match,
                "schema_match": schema_match,
                "hash_match": hash_match,
                "spark_rows": len(srows),
                "oracle_rows": len(orows),
            }
            if not (rows_match and schema_match and hash_match):
                fails.append(name)
        except Exception as exc:  # noqa: BLE001
            results[name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}
            fails.append(name)
        tag = results[name].get("err") or (
            "OK" if name not in fails else "FAIL"
        )
        print(f"{name}: {tag}", flush=True)

    n_oracle = sum(1 for r in results.values() if "rows_match" in r)
    print(
        f"\n{len(results)} queries, {n_oracle} oracle-checked, "
        f"{len(fails)} failing: {fails}"
    )
    with open("/tmp/driver_sim.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
