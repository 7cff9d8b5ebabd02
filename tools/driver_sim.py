"""Simulate the driver's correctness gate: run every registry query AND its
DuckDB oracle side-by-side at a given SF, compare row count, sorted-column
schema, and a canonicalized value hash — the same checks CORRECTNESS_r{N}.json
records.

Usage: PYTHONPATH=. python tools/driver_sim.py [sf_dir] [--first N] [--out PATH]

``--first N`` limits the run to the first N registry entries — the driver's
gate checks exactly the first 50, so ``--first 50`` reproduces its scope.

Canonicalization is driver-faithful (round-7 verdict item 2): both sides are
fetched as pandas DataFrames (Spark ``toPandas()``; DuckDB
``fetch_arrow_table().to_pandas()`` — the Arrow path renders HUGEINT as
float64, which is exactly the strictness the round-4 verdict demanded) and
run through :func:`hopspark.testing.driver_canon`, which sorts the RAW cell
values with pandas ``sort_values`` before rendering.  An array/map/struct
output column therefore crashes the sim with pandas' "unhashable type: 'list'"
— the same crash the driver's gate produced on ``emb_quantize_int8`` in
round 7, which the old tuple-based comparison here could not see.
(``--arrow`` is accepted for back-compat and is now the only behavior.)
"""

from __future__ import annotations

import json
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> None:
    args = sys.argv[1:]
    first = None
    out_path = "/tmp/driver_sim.json"
    if "--arrow" in args:  # legacy flag: Arrow fetch is now always on
        args.remove("--arrow")
    if "--first" in args:
        i = args.index("--first")
        first = int(args[i + 1])
        del args[i : i + 2]
    if "--out" in args:
        i = args.index("--out")
        out_path = args[i + 1]
        del args[i : i + 2]
    names = None
    if "--names" in args:
        i = args.index("--names")
        names = set(args[i + 1].split(","))
        del args[i : i + 2]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"

    from hopspark.operators import all_queries
    from hopspark.session import get_spark
    from hopspark.testing import driver_canon, oracle_type_errors

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
    if names is not None:
        items = [(n, v) for n, v in items if n in names]
    for name, (fn, sql) in items:
        try:
            sdf = fn(spark, sf_dir)
            spd = sdf.toPandas()
            if sql is None:
                # Rows-only check — but the driver still collects and
                # canonicalizes the Spark side, so run driver_canon to
                # catch non-scalar output columns here too.
                driver_canon(spd)
                results[name] = {"err": "no_oracle", "spark_rows": len(spd)}
                continue
            ores = con.sql(sql)
            ocols = list(ores.columns)
            type_errs = oracle_type_errors(
                sdf.dtypes, list(zip(ores.columns, ores.types))
            )
            opd = ores.fetch_arrow_table().to_pandas()
            rows_match = len(spd) == len(opd)
            schema_match = sorted(spd.columns) == sorted(ocols)
            hash_match = driver_canon(spd) == driver_canon(opd)
            results[name] = {
                "rows_match": rows_match,
                "schema_match": schema_match,
                "hash_match": hash_match,
                "type_match": not type_errs,
                "spark_rows": len(spd),
                "oracle_rows": len(opd),
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
