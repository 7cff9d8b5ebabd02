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
    # r6: incremental anti-join dedup and the per-doc repetition signal
    "dedup_incremental_batch",
    "text_dup_ngram_fraction",
    "text_bigram_score",
    # r6 session 2: head-prefix clustering and per-source capping
    "dedup_prefix_clusters",
    "curation_source_cap",
    # r6 session 3: bounded edit-distance verify and per-doc tf-idf top-k
    "dedup_levenshtein_verify",
    "text_tfidf_top_terms",
    # r7: cluster-grain leakage-safe split
    "pipeline_leakage_safe_split",
    "pipeline_training_mix",
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
    # r5: union-of-grains rollup rewrites (checkpointed partial fan-out) —
    # the checkpoint must keep the grain branches reading the partial, so
    # wall time should scale with the ONE fact scan, not 3-4x of it
    "tpcds_q67a_union_grain_topn",
    "tpcds_q86a_union_grain_rank",
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


def build_bounded(spark, n: int, group: int = 10,
                  base: str | None = None) -> str:
    """n id-shifted document copies where the near-duplicate CLUSTER SIZE
    stays `group` no matter how large n grows.

    The plain build_scaled corpus makes every copy of a doc a near-dup of
    every other copy, so duplicate clusters widen with n and the candidate
    -pair OUTPUT grows ~n² — a corpus property that drowns the plan-cost
    signal at 100×. Real corpora don't do that: a page duplicated 10×
    stays duplicated ~10× when the crawl grows 100×. Here copies in
    different groups get a per-group salt token interleaved after EVERY
    word (each word-shingle then contains the salt, so cross-group Jaccard
    ≈ 0), while copies inside a group differ only by a trailing copytoken
    (Jaccard ≈ 1). Duplicate structure is therefore constant-width and
    total dup-pair output grows linearly in n — a linear operator should
    show time(100×)/time(10×) ≈ 10.

    Built in ONE pass (explode over a replication index), not an n-way
    union — the 100× plan is the same size as the 2× plan."""
    from pyspark.sql import functions as F

    from hopspark.catalog import TABLES, read_table

    base = base or BASE
    tag = "" if base == BASE else f"-{os.path.basename(base.rstrip('/'))}"
    out = f"{SCALED}/b{n}g{group}{tag}"
    os.makedirs(out, exist_ok=True)
    doc_path = os.path.join(out, "documents.parquet")
    if not os.path.exists(doc_path):
        docs = read_table(spark, "documents", base)
        rep = docs.select(
            F.explode(F.sequence(F.lit(0), F.lit(n - 1))).alias("_i"), "*"
        )
        g = (F.col("_i") / F.lit(group)).cast("int")
        salt = F.concat(F.lit("qzsalt"), g.cast("string"))
        salted = F.array_join(
            F.flatten(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.array(w, salt),
                )
            ),
            " ",
        )
        text = F.concat(
            salted, F.lit(" copytoken"), F.col("_i").cast("string")
        )
        (
            rep.select(
                (F.col("doc_id") + F.col("_i").cast("long") * 10_000_000)
                .alias("doc_id"),
                text.alias("text"),
                "lang",
                "source",
                F.length(text).cast("int").alias("n_chars"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(doc_path)
        )
    for t in TABLES:
        if t == "documents":
            continue
        link = os.path.join(out, f"{t}.parquet")
        if not os.path.exists(link):
            os.symlink(os.path.join(base, f"{t}.parquet"), link)
    return out


BIG_PROBE_QUERIES = [
    "dedup_cc_clusters",
    "dedup_simhash",
    "dedup_minhash_candidates",
    "text_tfidf_top_terms",
    "pack_sequences",
]


def big_probe() -> None:
    """100×-scale probe (round-8 verdict item 6): bounded-cluster corpus at
    10× and 100×, report the incremental time ratio (linear ⇒ ≈10), output
    rows at both scales, and driver max-RSS growth across the sweep."""
    import resource

    from hopspark.operators import all_queries
    from hopspark.session import get_spark

    names = BIG_PROBE_QUERIES
    if "--names" in sys.argv:
        names = sys.argv[sys.argv.index("--names") + 1].split(",")
    spark = get_spark(app_name="big-scale-probe")
    reg = all_queries()
    d10 = build_bounded(spark, 10)
    d100 = build_bounded(spark, 100)
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    print(f"{'query':30s} {'10x':>8s} {'100x':>9s}  ratio  rows@10x  rows@100x")
    for name in names:
        fn = reg[name][0]
        fn(spark, d10).collect()  # warmup: codegen + file listing
        t10, r10 = min(
            (_timed_rows(fn, spark, d10) for _ in range(2)), key=lambda t: t[0]
        )
        t100, r100 = _timed_rows(fn, spark, d100)
        print(
            f"{name:30s} {t10:8.2f} {t100:9.2f} {t100 / t10:6.1f}"
            f"  {r10:8d}  {r100:9d}",
            flush=True,
        )
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    print(
        f"driver py max-RSS: {rss0 / 1024:.0f} MiB -> {rss1 / 1024:.0f} MiB "
        f"(delta {(rss1 - rss0) / 1024:.0f} MiB)"
    )


def _timed(fn, spark, sf_dir: str) -> float:
    t0 = time.time()
    fn(spark, sf_dir).collect()
    return time.time() - t0


def _timed_rows(fn, spark, sf_dir: str) -> tuple[float, int]:
    t0 = time.time()
    rows = len(fn(spark, sf_dir).collect())
    return time.time() - t0, rows


def main() -> None:
    args = sys.argv[1:]
    names = None
    if "--names" in args:
        i = args.index("--names")
        names = args[i + 1].split(",")
        del args[i : i + 2]
    n = int(args[0]) if args else 10
    from hopspark.operators import all_queries
    from hopspark.session import get_spark

    spark = get_spark(app_name="scale-probe")
    reg = all_queries()
    scaled_dir = build_scaled(spark, n)

    probe_list = names if names is not None else PROBE_QUERIES
    print(f"{'query':34s} {'1x':>7s} {'%dx' % n:>8s}  ratio  rows@{n}x")
    for name in probe_list:
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


# ---------------------------------------------------------------------------
# Skew probe (round-3 verdict item 6): one hot key owning ~30% of the fact
# table — measure plain vs salted shapes on the same data.
# Run: PYTHONPATH=. python tools/scale_probe.py --skew [replication]
# ---------------------------------------------------------------------------

HOT_KEY = 7


def build_skewed_orders(spark, n: int) -> str:
    """Replicate sf0.1 orders n× and reassign ~30% of rows to one customer
    (uniform otherwise). Written once to /tmp and reused."""
    from pyspark.sql import functions as F

    from hopspark.catalog import read_table

    out = f"{SCALED}/skew_orders_x{n}"
    if not os.path.exists(out):
        orders = read_table(spark, "orders", BASE)
        copies = orders
        for i in range(1, n):
            copies = copies.unionByName(
                orders.withColumn(
                    "o_orderkey", F.col("o_orderkey") + F.lit(i * 10_000_000)
                )
            )
        skewed = copies.withColumn(
            "o_custkey",
            F.when(F.rand(seed=7) < 0.3, F.lit(HOT_KEY)).otherwise(
                F.col("o_custkey")
            ),
        )
        skewed.repartition(32).write.mode("overwrite").parquet(out)
    return out


def skew_probe() -> None:

    from pyspark.sql import functions as F

    from hopspark.catalog import read_table
    from hopspark.session import get_spark
    from hopspark.skew import salted_agg, salted_join

    n = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark(app_name="skew-probe")
    path = build_skewed_orders(spark, n)
    orders = spark.read.parquet(path)
    cust = read_table(spark, "customer", BASE).select("c_custkey", "c_mktsegment")

    total = orders.count()
    hot = orders.filter(F.col("o_custkey") == HOT_KEY).count()
    print(f"skewed orders: {total} rows, hot key owns {hot / total:.1%}")

    def timed(label, build):
        # min-of-3 after one warmup, matching the main probe's discipline
        build().collect()
        ts = []
        for _ in range(3):
            t0 = time.time()
            rows = build().collect()
            ts.append(time.time() - t0)
        print(f"{label:28s} {min(ts):7.2f}s  (runs: "
              f"{', '.join(f'{t:.2f}' for t in ts)})  rows={len(rows)}")
        return min(ts), rows

    def plain_agg():
        return orders.groupBy("o_custkey").agg(
            F.sum("o_totalprice").alias("rev"),
            F.count(F.lit(1)).alias("cnt"),
        )

    def skew_agg():
        return salted_agg(
            orders,
            ["o_custkey"],
            {"rev": ("sum", "o_totalprice"), "cnt": ("count", F.lit(1))},
        )

    def plain_join():
        return (
            orders.join(cust.hint("shuffle_hash"), orders.o_custkey == cust.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    def plain_join_smj():
        return (
            orders.hint("merge")
            .join(cust, orders.o_custkey == cust.c_custkey)
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    def skew_join():
        return (
            salted_join(
                orders.withColumnRenamed("o_custkey", "c_custkey"),
                cust,
                on=["c_custkey"],
            )
            .groupBy("c_mktsegment")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )

    def same_aggs(a, b):
        # double sums differ in summation order between the one- and
        # two-phase plans; compare with relative tolerance
        da = {r[0]: (r[1], r[2]) for r in a}
        db = {r[0]: (r[1], r[2]) for r in b}
        assert da.keys() == db.keys()
        for k, (rev_a, cnt_a) in da.items():
            rev_b, cnt_b = db[k]
            assert cnt_a == cnt_b and abs(rev_a - rev_b) <= 1e-6 * max(abs(rev_a), 1.0)

    t_pa, r_pa = timed("plain groupBy agg", plain_agg)
    t_sa, r_sa = timed("salted_agg", skew_agg)
    same_aggs(r_pa, r_sa)
    t_mj, r_mj = timed("sort-merge join (AQE skew)", plain_join_smj)
    t_pj, r_pj = timed("forced shuffle-hash join", plain_join)
    t_sj, r_sj = timed("salted_join", skew_join)
    assert sorted(map(tuple, r_pj)) == sorted(map(tuple, r_sj)) == sorted(map(tuple, r_mj))
    # Window/sort state is the shape partial agg cannot absorb: the hot
    # key's rows must colocate AND sort in one task.  Same volume, uniform
    # keys, as the control.
    from pyspark.sql import Window

    uniform = orders.withColumn(
        "o_custkey", (F.abs(F.hash("o_orderkey")) % 15000).cast("long")
    )

    def windowed(src):
        # running sum: no WindowGroupLimit pushdown possible (top-k would
        # be optimized into a partial group-limit and hide the skew), so
        # the hot key's 30% of all rows must sort+scan in ONE task
        def build():
            w = (
                Window.partitionBy("o_custkey")
                .orderBy("o_orderkey")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            return (
                src.withColumn("rs", F.sum("o_totalprice").over(w))
                .groupBy()
                .agg(F.sum("rs").alias("chk"), F.count(F.lit(1)).alias("n"))
            )
        return build

    t_wu, _ = timed("window running-sum uniform", windowed(uniform))
    t_ws, _ = timed("window running-sum skewed", windowed(orders))

    print(
        f"agg ratio salted/plain:          {t_sa / t_pa:.2f}\n"
        f"join ratio salted/shuffle-hash:  {t_sj / t_pj:.2f}\n"
        f"join ratio salted/AQE-smj:       {t_sj / t_mj:.2f}\n"
        f"window skew tax (skewed/uniform): {t_ws / t_wu:.2f}"
    )


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--skew":
        skew_probe()
    elif len(sys.argv) > 1 and sys.argv[1] == "--big":
        big_probe()
    else:
        main()
