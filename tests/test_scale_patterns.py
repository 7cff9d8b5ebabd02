"""Scale-pattern coverage: skew-safe aggregation and bucketed co-located
joins — the partitioning strategies a 1000-executor deployment relies on."""

from __future__ import annotations

from pyspark.sql import functions as F

from hopspark.catalog import read_table
from hopspark.plans.inspect import explain_formatted
from hopspark.skew import salted_agg


def test_salted_agg_matches_plain(spark, sf_dir):
    li = read_table(spark, "lineitem", sf_dir)
    got = {
        r.l_returnflag: r
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {
                "n": ("count", F.lit(1)),
                "qty_sum": ("sum", F.col("l_quantity").cast("decimal(12,2)")),
                "qty_min": ("min", "l_quantity"),
                "qty_max": ("max", "l_quantity"),
            },
            n_salts=8,
        ).collect()
    }
    want = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty_sum"),
            F.min("l_quantity").alias("qty_min"),
            F.max("l_quantity").alias("qty_max"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert (got[k].n, got[k].qty_sum, got[k].qty_min, got[k].qty_max) == (
            want[k].n,
            want[k].qty_sum,
            want[k].qty_min,
            want[k].qty_max,
        )


def test_salted_agg_two_shuffles(spark, sf_dir):
    li = read_table(spark, "lineitem", sf_dir)
    plan = explain_formatted(
        salted_agg(li, ["l_returnflag"], {"n": ("count", F.lit(1))}, n_salts=8)
    )
    # phase1 shuffle on (key, salt), phase2 on key
    assert plan.count("Exchange") >= 2


def test_salted_join_matches_plain(spark, sf_dir):
    """salted_join must produce exactly the plain join's rows (inner and
    left), with the fact side spread over salt buckets."""
    from hopspark.skew import salted_join

    li = read_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    part = read_table(spark, "part", sf_dir).select("p_partkey", "p_brand")
    dim = part.withColumnRenamed("p_partkey", "l_partkey")
    for how in ("inner", "left"):
        plain = sorted(map(tuple, li.join(dim, ["l_partkey"], how).collect()))
        salted = sorted(map(tuple, salted_join(li, dim, ["l_partkey"], how).collect()))
        assert salted == plain, how


def test_bucketed_join_avoids_shuffle(spark, sf_dir):
    """Co-located join: both sides bucketed+sorted on the join key read
    without an Exchange (the bucketing/pre-partitioning strategy for
    repeated fact-fact joins at scale)."""
    li = read_table(spark, "lineitem", sf_dir).select("l_orderkey", "l_quantity")
    orders = read_table(spark, "orders", sf_dir).select("o_orderkey", "o_totalprice")
    import shutil

    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS ord_bkt")
    # the in-memory catalog forgets tables between sessions but the
    # warehouse dirs persist; clear them so saveAsTable can't collide
    warehouse = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("li_bkt", "ord_bkt"):
        shutil.rmtree(f"{warehouse}/{t}", ignore_errors=True)
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_bkt")
    )
    (
        orders.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("ord_bkt")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # force the shuffle-join path: at real scale neither fact side
    # broadcasts, which is exactly when bucketing pays off
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("li_bkt")
        b = spark.table("ord_bkt")
        joined = a.join(b, a.l_orderkey == b.o_orderkey)
        plan = explain_formatted(joined)
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        # and it computes the right row count
        assert joined.count() == li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bkt")
        spark.sql("DROP TABLE IF EXISTS ord_bkt")


def test_bounded_cluster_smoke_linearity(spark, sf_dir):
    """Round-10 (r9 verdict item 7): small-N smoke of the 100× bounded-
    cluster probe (tools/scale_probe.py --big).  Duplicate clusters stay
    constant-width while the corpus grows 4×, so a LINEAR operator's
    OUTPUT rows grow ≈4× — an all-pairs plan regression in the dedup/text
    family would blow the ratio (cross-group candidates) or the runtime.
    Row-count ratios are deterministic; the time cap is generous."""
    import sys
    import time
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
    from scale_probe import build_bounded

    from hopspark.operators import all_queries

    reg = all_queries()
    t0 = time.time()
    d_small = build_bounded(spark, 8, base=sf_dir)    # 4k docs
    d_big = build_bounded(spark, 32, base=sf_dir)     # 16k docs
    for name, lo, hi in (
        ("dedup_minhash_candidates", 2.5, 6.0),
        ("dedup_cc_clusters", 2.5, 6.0),
        ("text_tfidf_top_terms", 2.5, 6.0),
    ):
        fn = reg[name][0]
        r_small = fn(spark, d_small).count()
        r_big = fn(spark, d_big).count()
        assert r_small > 0, name
        ratio = r_big / r_small
        assert lo <= ratio <= hi, (
            f"{name}: output rows grew {ratio:.1f}x for a 4x corpus — "
            f"expected ≈4x (constant-width clusters); an all-pairs "
            f"regression? rows {r_small} -> {r_big}"
        )
    assert time.time() - t0 < 120, "bounded-cluster smoke exceeded budget"
