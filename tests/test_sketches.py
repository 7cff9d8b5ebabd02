"""Theta-sketch (KMV) unit tests: exact regime, approximate regime, and the
global TakeOrderedAndProject scale path (reference ds_theta_* —
BuiltinsDb.java:1149-1170, be/src/exprs/datasketches-functions-ir.cc)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hopspark.catalog import read_table
from hopspark.operators.sketches import (
    theta_estimate,
    theta_except_estimate,
    theta_intersect_estimate,
    theta_sketch_agg,
    theta_sketch_global,
    theta_union,
)


def test_exact_regime_matches_count_distinct(spark, sf_dir):
    orders = read_table(spark, "orders", sf_dir)
    est = orders.agg(
        theta_estimate(theta_sketch_agg(F.col("o_custkey"))).alias("e")
    ).first()["e"]
    truth = orders.select("o_custkey").distinct().count()
    assert est == float(truth)


def test_approx_regime_within_tolerance(spark, sf_dir):
    # k << distinct count forces the (k-1)/theta estimator; xxhash64 is
    # deterministic so the estimate is stable run-to-run.
    k = 64
    orders = read_table(spark, "orders", sf_dir)
    est = orders.agg(
        theta_estimate(theta_sketch_agg(F.col("o_orderkey"), k), k).alias("e")
    ).first()["e"]
    truth = orders.select("o_orderkey").distinct().count()
    assert truth * 0.6 < est < truth * 1.6  # KMV rse ~ 1/sqrt(k-2) ≈ 13%


def test_global_path_equals_agg_path(spark, sf_dir):
    k = 64
    orders = read_table(spark, "orders", sf_dir)
    via_agg = orders.agg(
        theta_sketch_agg(F.col("o_custkey"), k).alias("sk")
    ).first()["sk"]
    via_global = theta_sketch_global(orders, F.col("o_custkey"), k).first()["sk"]
    assert via_agg == via_global


def test_grouped_two_phase_equals_direct(spark, sf_dir):
    """The bounded two-phase grouped path must produce byte-identical
    sketches to the direct collect_set expression (same k smallest distinct
    hashes), in both exact (large k) and approximate (small k) regimes."""
    from hopspark.operators.sketches import theta_sketch_grouped_agg

    orders = read_table(spark, "orders", sf_dir)
    for k in (16384, 64):
        direct = {
            r.o_orderpriority: r.sk
            for r in orders.groupBy("o_orderpriority")
            .agg(theta_sketch_agg(F.col("o_custkey"), k).alias("sk"))
            .collect()
        }
        two_phase = {
            r.o_orderpriority: r.sk
            for r in theta_sketch_grouped_agg(
                orders, ["o_orderpriority"], F.col("o_custkey"), k
            ).collect()
        }
        assert two_phase == direct, f"k={k}"


def test_grouped_partials_bounded_at_k(spark, sf_dir):
    """No stage-1 partial sketch may exceed k elements — the state bound
    the VERDICT asked to pin."""
    from hopspark.operators.sketches import _theta_partials

    k = 32
    # repartition so each group genuinely spans several input partitions
    orders = read_table(spark, "orders", sf_dir).repartition(4)
    partials = _theta_partials(orders, ["o_orderpriority"], F.col("o_custkey"), k)
    max_size = partials.agg(F.max(F.size("psk")).alias("m")).first()["m"]
    assert max_size <= k
    # and there genuinely are multiple partials per group (the pre-agg ran)
    n_groups = orders.select("o_orderpriority").distinct().count()
    assert partials.count() > n_groups


def test_union_intersect_except_algebra(spark, sf_dir):
    # Small-k approximate algebra on two overlapping key sets.
    k = 128
    orders = read_table(spark, "orders", sf_dir)
    lo = orders.filter(F.col("o_orderkey") % 3 != 0)
    hi = orders.filter(F.col("o_orderkey") % 3 != 1)
    a = lo.agg(theta_sketch_agg(F.col("o_orderkey"), k).alias("a_sk"))
    b = hi.agg(theta_sketch_agg(F.col("o_orderkey"), k).alias("b_sk"))
    row = (
        a.crossJoin(b)
        .select(
            theta_estimate(theta_union(F.col("a_sk"), F.col("b_sk"), k), k).alias("u"),
            theta_intersect_estimate(F.col("a_sk"), F.col("b_sk"), k).alias("i"),
            theta_except_estimate(F.col("a_sk"), F.col("b_sk"), k).alias("d"),
        )
        .first()
    )
    n_all = orders.count()
    n_union = orders.filter((F.col("o_orderkey") % 3 != 0) | (F.col("o_orderkey") % 3 != 1)).count()
    n_inter = orders.filter(F.col("o_orderkey") % 3 == 2).count()
    n_diff = orders.filter(F.col("o_orderkey") % 3 == 1).count()
    assert n_union == n_all
    assert n_union * 0.5 < row["u"] < n_union * 1.7
    # intersect/except work on the theta-cut sample — wider tolerance
    assert n_inter * 0.4 < row["i"] < n_inter * 2.0
    assert n_diff * 0.4 < row["d"] < n_diff * 2.0
