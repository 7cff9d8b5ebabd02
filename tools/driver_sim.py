"""Simulate the driver's correctness gate: run every registry query AND its
DuckDB oracle side-by-side at a given SF, compare row count, sorted-column
schema, and a rounded-value hash — the same checks CORRECTNESS_r{N}.json
records.

Usage: PYTHONPATH=. python tools/driver_sim.py [sf_dir] [--first N] [--out PATH]
                                               [--arrow]

``--first N`` limits the run to the first N registry entries — the driver's
gate checks exactly the first 50, so ``--first 50`` reproduces its scope.

``--arrow`` fetches the oracle through Arrow (``fetch_arrow_table``) instead
of ``fetchall()`` — the discipline a pandas/Arrow-based driver uses, which
renders DuckDB HUGEINT as float64. Round 4 proved the sim's ``fetchall()``
(int128 → Python int, lossless) masked exactly that divergence; the sim must
be at least as strict as the strictest plausible driver, so both modes exist
and the oracle's pre-fetch relation types are category-checked against the
Spark schema in EVERY mode.
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
    args = sys.argv[1:]
    first = None
    out_path = "/tmp/driver_sim.json"
    arrow_fetch = "--arrow" in args
    if arrow_fetch:
        args.remove("--arrow")
    if "--first" in args:
        i = args.index("--first")
        first = int(args[i + 1])
        del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    from hopspark.operators import all_queries
    from hopspark.session import get_spark
    from hopspark.testing import oracle_type_errors

    spark = get_spark(app_name="driver-sim")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    results = {}
    fails = []
    items = list(all_queries().items())
    if first is not None:
        # Gate scope: the driver checks the first N in REGISTRY order
        # (CURATED_FIRST leads), not alphabetical.
        items = items[:first]
    else:
        items = sorted(items)
    for name, (fn, sql) in items:
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            if sql is None:
                results[name] = {"err": "no_oracle", "spark_rows": len(srows)}
                continue
            ores = con.sql(sql)
            ocols = list(ores.columns)
            type_errs = oracle_type_errors(
                sdf.dtypes, list(zip(ores.columns, ores.types))
            )
            if arrow_fetch:
                tbl = ores.fetch_arrow_table()
                orows = [
                    tuple(col[i].as_py() for col in tbl.columns)
                    for i in range(tbl.num_rows)
                ]
            else:
                orows = ores.fetchall()
            rows_match = len(srows) == len(orows)
            schema_match = sorted(scols) == sorted(ocols)
            hash_match = _norm(srows, scols) == _norm(orows, ocols)
            results[name] = {
                "rows_match": rows_match,
                "schema_match": schema_match,
                "hash_match": hash_match,
                "type_match": not type_errs,
                "spark_rows": len(srows),
                "oracle_rows": len(orows),
            }
            if type_errs:
                results[name]["type_errors"] = type_errs
            if not (rows_match and schema_match and hash_match) or type_errs:
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
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
