#!/usr/bin/env python
"""Per-query perf probe for optimization work (guide §1).

Times individual registry queries with N runs (min reported), same
methodology as bench.py (collect after warmup), optionally also timing the
noop-sink variant (computation without result fetch) and dumping
`.explain("formatted")` to a file.

Usage:
    python tools/perf_probe.py q1 q2 ...            # time with collect
    python tools/perf_probe.py --runs 3 --noop q1   # also noop-sink timing
    python tools/perf_probe.py --explain-dir plans/r12 q1
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hopspark.functions import register_all
from hopspark.operators import all_queries
from hopspark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--noop", action="store_true")
    ap.add_argument("--explain-dir", default=None)
    ap.add_argument("--suffix", default="", help="explain file suffix, e.g. _before")
    args = ap.parse_args()

    spark = get_spark(app_name="hopspark-perf-probe")
    register_all(spark)
    registry = all_queries()

    # same warmup as bench.py
    registry["tpch_q1_pricing_summary"][0](spark, SF_DIR).collect()

    out: dict[str, dict] = {}
    for name in args.names:
        fn, _sql = registry[name]
        spark.sparkContext.setJobDescription(f"probe:{name}")
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.explain_dir, f"{name}{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        best = float("inf")
        for _ in range(args.runs):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).collect()
            best = min(best, time.perf_counter() - t0)
        rec = {"collect_min": round(best, 3)}
        if args.noop:
            best_n = float("inf")
            for _ in range(args.runs):
                t0 = time.perf_counter()
                fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
                best_n = min(best_n, time.perf_counter() - t0)
            rec["noop_min"] = round(best_n, 3)
        spark.sparkContext.setJobDescription(None)
        out[name] = rec
        print(json.dumps({name: rec}), flush=True)
    print("TOTAL " + json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
