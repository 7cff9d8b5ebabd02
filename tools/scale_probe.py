"""Scale-linearity probe: replicate the sf0.1 documents corpus N× (ids
shifted, text perturbed per copy so replicas are NEAR-duplicates, not exact
ones) and measure wall-time of the document-pipeline operators at 1× vs N×.

A linear operator should scale ~N×; anything super-linear (quadratic
candidate generation, driver-side state, unbounded buckets) shows up as a
ratio far above N. This is the local stand-in for "would this hold at
1000 executors" — the shapes that stay linear here are the ones whose
shuffles carry compact keys only.

Usage: PYTHONPATH=. python tools/scale_probe.py [N]
"""

from __future__ import annotations

import os
import sys
import time

PROBE_QUERIES = [
    "text_vocab_coverage",
    "text_bigram_lm",
    "text_train_split",
    "mixture_stratified_sample",
    "mixture_rebalance_uniform",
    "mixture_quality_gate",
    "mixture_epoch_upsample",
    "dedup_exact_groups",
    "dedup_minhash_candidates",
    "dedup_simhash",
    "pack_sequences",
    "pipeline_corpus_stats",
    # fact-table (lineitem/orders) shapes: scan+agg, star join + top-n,
    # broadcast-dim join chain, grouped window
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
    "tpch_q6_forecast_revenue",
    "agg_rollup",
    "agg_multi_distinct",
    "window_rank_topn",
    "tpcds_q51_cumulative_channels",
]

BASE = "/root/testdata/sf0.1"
SCALED = "/tmp/hopspark_scale"


def build_scaled(spark, n: int) -> str:
    from pyspark.sql import functions as F

    from hopspark.catalog import TABLES, read_table

    out = f"{SCALED}/x{n}"
    os.makedirs(out, exist_ok=True)
    # documents: n id-shifted, text-perturbed copies
    doc_path = os.path.join(out, "documents.parquet")
    if not os.path.exists(doc_path):
        docs = read_table(spark, "documents", BASE)
        copies = [
            docs.select(
                (F.col("doc_id") + F.lit(i * 10_000_000)).alias("doc_id"),
                (
                    F.col("text")
                    if i == 0
                    else F.concat(F.col("text"), F.lit(f" copytoken{i}"))
                ).alias("text"),
                "lang",
                "source",
                "n_chars",
            )
            for i in range(n)
        ]
        big = copies[0]
        for c in copies[1:]:
            big = big.unionByName(c)
        big.repartition(32).write.mode("overwrite").parquet(doc_path)
    # fact tables: n key-shifted copies (order/line keys shift; dim keys —
    # cust/part/supp — stay, modeling fact growth against constant dims)
    for fact, keys in (
        ("lineitem", ("l_orderkey",)),
        ("orders", ("o_orderkey",)),
    ):
        fpath = os.path.join(out, f"{fact}.parquet")
        if not os.path.exists(fpath):
            t = read_table(spark, fact, BASE)
            shifted = [
                t.select(
                    *[
                        (F.col(c) + F.lit(i * 100_000_000)).alias(c)
                        if c in keys
                        else F.col(c)
                        for c in t.columns
                    ]
                )
                for i in range(n)
            ]
            big = shifted[0]
            for c in shifted[1:]:
                big = big.unionByName(c)
            big.repartition(32).write.mode("overwrite").parquet(fpath)
    # other tables: symlink to base so read_table resolves them
    for t in TABLES:
        if t in ("documents", "lineitem", "orders"):
            continue
        link = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(BASE, f"{t}.parquet"), link)
    return out


def _timed(fn, spark, sf_dir: str) -> float:
    t0 = time.time()
    fn(spark, sf_dir).collect()
    return time.time() - t0


def _timed_rows(fn, spark, sf_dir: str) -> tuple[float, int]:
    t0 = time.time()
    rows = len(fn(spark, sf_dir).collect())
    return time.time() - t0, rows


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    from hopspark.operators import all_queries
    from hopspark.session import get_spark

    spark = get_spark(app_name="scale-probe")
    reg = all_queries()
    scaled_dir = build_scaled(spark, n)

    print(f"{'query':34s} {'1x':>7s} {'%dx' % n:>8s}  ratio  rows@{n}x")
    for name in PROBE_QUERIES:
        fn = reg[name][0]
        # Untimed warmup pass at BOTH scales first: the 1× run otherwise
        # pays JVM/codegen warmup the N× run inherits for free, while the
        # N× run pays first-touch file listing of the scaled dir — both
        # effects contaminate the ratio near the super-linearity threshold.
        fn(spark, BASE).collect()
        fn(spark, scaled_dir).collect()
        # min-of-2 timed passes so a GC pause doesn't fake super-linearity.
        base_s = min(_timed(fn, spark, BASE) for _ in range(2))
        big_s, rows = min(
            (_timed_rows(fn, spark, scaled_dir) for _ in range(2)),
            key=lambda t: t[0],
        )
        print(
            f"{name:34s} {base_s:7.2f} {big_s:8.2f} {big_s / base_s:6.1f}"
            f"  {rows}",
            flush=True,
        )


if __name__ == "__main__":
    main()
