"""Mergeable UDA compilation (hopspark/uda.py + engine.create_aggregate_function).

The reference UDA contract is Init/Update/Merge/Serialize/Finalize
(be/src/udf/udf.h:379-391) — distributive. These tests pin:
  * the SQL rewriter's supported shape and its refusals,
  * the physical plan: salted two-stage Arrow aggregation, never a
    whole-group aggregate over the raw fact,
  * the distributive split actually happening (>1 partial per key on a
    multi-partition input),
  * exact agreement between the mergeable plan, the whole-group fold, and
    a plain-SQL truth,
  * the whole-group fallback for statements outside the rewriter subset.
"""

import pandas as pd
import pytest

from hopspark.engine import Engine
from hopspark.uda import rewrite_mergeable_uda


def _executed_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AQE's toString renders BOTH the final and the initial plan; node
    # counts must be over the final section only
    return plan.split("== Initial Plan ==")[0]


# ---------------------------------------------------------------------------
# Rewriter unit tests (pure string -> string, no Spark)
# ---------------------------------------------------------------------------


def test_rewrite_canonical_group_by():
    out = rewrite_mergeable_uda(
        "SELECT k, wavg(a, b) AS w FROM t WHERE a > 0 GROUP BY k ORDER BY k",
        {"wavg"},
    )
    assert out is not None
    assert "wavg__partial(a, b) AS __hop_p_0" in out
    assert "wavg__merge(__hop_p_0) AS w" in out
    assert "pmod(spark_partition_id(), 64) AS __hop_salt" in out
    assert "GROUP BY k, __hop_salt" in out
    assert out.rstrip().endswith("GROUP BY k ORDER BY k")
    assert "WHERE a > 0" in out


def test_rewrite_global_aggregate():
    out = rewrite_mergeable_uda("SELECT wavg(x) AS w FROM t", {"wavg"})
    assert out is not None
    assert "GROUP BY __hop_salt" in out
    # no outer GROUP BY for the global form
    assert out.count("GROUP BY") == 1


def test_rewrite_splits_builtin_aggregates():
    out = rewrite_mergeable_uda(
        "SELECT k, wavg(a) AS w, SUM(b) AS s, COUNT(*) AS c, MIN(b) AS lo "
        "FROM t GROUP BY k",
        {"wavg"},
    )
    assert out is not None
    assert "SUM(b) AS __hop_a_0" in out and "SUM(__hop_a_0) AS s" in out
    # COUNT's outer leg is COALESCE'd to 0 so a fully-filtered global
    # aggregate returns 0, not NULL (round-7 advice)
    assert "COUNT(*) AS __hop_a_1" in out
    assert "COALESCE(SUM(__hop_a_1), 0) AS c" in out
    assert "MIN(b) AS __hop_a_2" in out and "MIN(__hop_a_2) AS lo" in out


@pytest.mark.parametrize(
    "sql",
    [
        # DISTINCT select
        "SELECT DISTINCT k, wavg(a) AS w FROM t GROUP BY k",
        # set operation
        "SELECT k, wavg(a) AS w FROM t GROUP BY k UNION ALL SELECT 1, 2.0",
        # UDA call inside a CTE body now rewrites (r10; see
        # test_rewrite_uda_inside_cte_body) — an UNSUPPORTED body shape
        # still refuses
        "WITH c AS (SELECT DISTINCT k, wavg(a) AS w FROM t GROUP BY k)"
        " SELECT * FROM c",
        # expression group key SELECTED without an alias (output column name
        # would be the internal __hop_g_0, not the expression text)
        "SELECT year(ts), wavg(a) AS w FROM t GROUP BY year(ts)",
        # UDA result without an explicit alias (column name must be stable)
        "SELECT k, wavg(a) FROM t GROUP BY k",
        # non-splittable other aggregate
        "SELECT k, wavg(a) AS w, avg(b) AS m FROM t GROUP BY k",
        # non-splittable aggregate in HAVING
        "SELECT k, wavg(a) AS w FROM t GROUP BY k HAVING avg(b) > 1",
        # unknown call name in HAVING (could be an aggregate)
        "SELECT k, wavg(a) AS w FROM t GROUP BY k HAVING mystery(a) > 1",
        # DISTINCT inside a splittable aggregate
        "SELECT k, wavg(a) AS w, COUNT(DISTINCT b) AS c FROM t GROUP BY k",
        # DISTINCT splittable in HAVING
        "SELECT k, wavg(a) AS w FROM t GROUP BY k HAVING COUNT(DISTINCT b) > 1",
        # UDA wrapped in an outer expression
        "SELECT k, round(wavg(a), 2) AS w FROM t GROUP BY k",
        # no mergeable UDA call at all
        "SELECT k, SUM(a) AS s FROM t GROUP BY k",
    ],
)
def test_rewrite_refuses_unsupported_shapes(sql):
    assert rewrite_mergeable_uda(sql, {"wavg"}) is None


def test_rewrite_having_uda_call_routes_through_merge_leg():
    """HAVING over the UDA compiles to the OUTER stage, reusing the select
    item's partial/merge leg (round-7 verdict item 6)."""
    out = rewrite_mergeable_uda(
        "SELECT k, wavg(a) AS w FROM t GROUP BY k HAVING wavg(a) > 1",
        {"wavg"},
    )
    assert out is not None
    assert "HAVING wavg__merge(__hop_p_0) > 1" in out
    # one leg, shared between the select item and HAVING
    assert out.count("wavg__partial") == 1


def test_rewrite_having_alias_reference():
    out = rewrite_mergeable_uda(
        "SELECT k, wavg(a) AS w FROM t GROUP BY k HAVING w > 1 ORDER BY w",
        {"wavg"},
    )
    assert out is not None
    assert "HAVING (wavg__merge(__hop_p_0)) > 1" in out
    assert "ORDER BY (wavg__merge(__hop_p_0))" in out


def test_rewrite_having_scalar_wrapper_and_new_leg():
    """A HAVING aggregate with no matching select item creates its own
    hidden leg; whitelisted scalar wrappers pass through."""
    out = rewrite_mergeable_uda(
        "SELECT k, wavg(a) AS w FROM t GROUP BY k "
        "HAVING abs(SUM(b)) > 10 AND COUNT(*) > 2",
        {"wavg"},
    )
    assert out is not None
    assert "SUM(b) AS __hop_a_0" in out
    assert "COUNT(*) AS __hop_a_1" in out
    assert "HAVING abs(SUM(__hop_a_0)) > 10 AND COALESCE(SUM(__hop_a_1), 0) > 2" in out


def test_rewrite_expression_group_key():
    """GROUP BY year(ts) compiles via an internal inner key column; the
    aliased select item and HAVING/ORDER references map to it."""
    out = rewrite_mergeable_uda(
        "SELECT year(ts) AS y, wavg(a) AS w FROM t GROUP BY year(ts) "
        "HAVING year(ts) > 1995 ORDER BY y",
        {"wavg"},
    )
    assert out is not None
    assert "year(ts) AS __hop_g_0" in out
    assert "GROUP BY year(ts), __hop_salt" in out
    assert "__hop_g_0 AS y" in out
    assert out.rstrip().endswith(
        "GROUP BY __hop_g_0 HAVING __hop_g_0 > 1995 ORDER BY (__hop_g_0)"
    )


def test_rewrite_unselected_expression_group_key():
    out = rewrite_mergeable_uda(
        "SELECT wavg(a) AS w FROM t GROUP BY k + 1", {"wavg"}
    )
    assert out is not None
    assert "k + 1 AS __hop_g_0" in out
    assert "GROUP BY k + 1, __hop_salt" in out
    assert "GROUP BY __hop_g_0" in out


def test_rewrite_keeps_group_key_alias_and_order():
    out = rewrite_mergeable_uda(
        "SELECT wavg(a) AS w, k AS key FROM t GROUP BY k", {"wavg"}
    )
    assert out is not None
    assert out.startswith("SELECT wavg__merge(__hop_p_0) AS w, k AS key FROM")


# ---------------------------------------------------------------------------
# Engine integration
# ---------------------------------------------------------------------------


def _register_wavg(eng: Engine, name: str = "wavg_m") -> None:
    import numpy as np

    eng.create_aggregate_function(
        name,
        return_type="double",
        init=lambda: [0.0, 0.0],
        update=lambda acc, p, q: [acc[0] + p * q, acc[1] + q],
        merge=lambda a, b: [a[0] + b[0], a[1] + b[1]],
        finalize=lambda acc: (
            float(np.round(acc[0] / acc[1], 6)) if acc[1] else None
        ),
    )


UDA_SQL = (
    "SELECT l_returnflag, "
    "wavg_m(CAST(l_extendedprice AS DOUBLE), CAST(l_quantity AS DOUBLE)) "
    "AS w FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
)

TRUTH_SQL = (
    "SELECT l_returnflag, "
    "CAST(round(SUM(CAST(l_extendedprice AS DOUBLE) * l_quantity) "
    "/ SUM(CAST(l_quantity AS DOUBLE)), 6) AS DOUBLE) AS w "
    "FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"
)


def test_mergeable_plan_is_salted_two_stage(spark, sf_dir):
    eng = Engine(spark=spark, sf_dir=sf_dir)
    _register_wavg(eng)
    df = eng.sql(UDA_SQL)
    plan = _executed_plan(df)
    # two Arrow aggregate stages, salt in the first grouping, and the
    # whole-group registration (`wavg_m(`) nowhere in the physical plan
    assert "__hop_salt" in plan
    assert plan.count("ArrowAggregatePython") == 2
    assert "wavg_m__partial" in plan and "wavg_m__merge" in plan
    assert "wavg_m(" not in plan


def test_mergeable_matches_whole_group_and_sql_truth(spark, sf_dir):
    eng = Engine(spark=spark, sf_dir=sf_dir)
    _register_wavg(eng)
    got = [(r.l_returnflag, r.w) for r in eng.sql(UDA_SQL).collect()]
    truth = [(r.l_returnflag, r.w) for r in eng.sql(TRUTH_SQL).collect()]
    assert [g[0] for g in got] == [t[0] for t in truth]
    for (_, gv), (_, tv) in zip(got, truth):
        assert gv == pytest.approx(tv, abs=5e-6)


def test_no_whole_group_ships_to_one_task(spark):
    """The distributive proof: a 3-key x 90k-row input spread over 8
    partitions produces MULTIPLE partials per key in stage 1 — i.e. no
    single task folded an entire group (the whole-group plan would give
    exactly one Arrow batch per key)."""
    eng = Engine(spark=spark, register_tables=False)
    _register_wavg(eng, "wavg_split")
    df = spark.range(0, 90000, 1, 8).selectExpr(
        "CAST(id % 3 AS STRING) AS k",
        "CAST(id AS DOUBLE) AS p",
        "CAST(1 + id % 7 AS DOUBLE) AS q",
    )
    df.createOrReplaceTempView("uda_split_t")
    partials = spark.sql(
        "SELECT k, wavg_split__partial(p, q) AS part FROM "
        "(SELECT *, pmod(spark_partition_id(), 64) AS __hop_salt "
        " FROM uda_split_t) s GROUP BY k, __hop_salt"
    )
    counts = {r.k: r.n for r in partials.groupBy("k").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"0", "1", "2"}
    assert all(n == 8 for n in counts.values()), counts
    # and the merged result equals the plain-SQL truth
    got = {
        r.k: r.w
        for r in eng.sql(
            "SELECT k, wavg_split(p, q) AS w FROM uda_split_t GROUP BY k"
        ).collect()
    }
    truth = {
        r.k: r.w
        for r in spark.sql(
            "SELECT k, CAST(round(SUM(p * q) / SUM(q), 6) AS DOUBLE) AS w "
            "FROM uda_split_t GROUP BY k"
        ).collect()
    }
    for k in truth:
        assert got[k] == pytest.approx(truth[k], abs=5e-6)


def test_unsupported_shape_falls_back_to_whole_group(spark, sf_dir):
    eng = Engine(spark=spark, sf_dir=sf_dir)
    _register_wavg(eng)
    # a UDA call wrapped in an outer expression is outside the rewriter
    # subset -> the whole-group fold registered under the bare name runs
    # (note: Spark itself forbids mixing grouped-agg pandas UDFs with
    # built-in aggregates in one aggregation, so HAVING count(*) shapes
    # are un-runnable in BOTH forms — that refusal is Spark's, not ours)
    df = eng.sql(
        "SELECT l_returnflag, CAST(wavg_m(CAST(l_extendedprice AS DOUBLE), "
        "CAST(l_quantity AS DOUBLE)) AS DOUBLE) AS w FROM lineitem "
        "GROUP BY l_returnflag ORDER BY l_returnflag"
    )
    plan = _executed_plan(df)
    assert "__hop_salt" not in plan
    rows = df.collect()
    truth = eng.sql(TRUTH_SQL).collect()
    assert [(r.l_returnflag, r.w) for r in rows] == [
        (t.l_returnflag, pytest.approx(t.w, abs=5e-6)) for t in truth
    ]


def test_multi_arg_fold_form_without_merge_still_works(spark):
    """init/update/finalize with NO merge keeps the documented whole-group
    fold — now with multi-column update support."""
    eng = Engine(spark=spark, register_tables=False)
    eng.create_aggregate_function(
        "dotsum",
        return_type="double",
        init=lambda: 0.0,
        update=lambda acc, a, b: acc + a * b,
        finalize=lambda acc: float(acc),
    )
    assert "dotsum" not in eng._mergeable_udas
    spark.range(1, 5).selectExpr(
        "CAST(id AS DOUBLE) a", "CAST(id AS DOUBLE) b"
    ).createOrReplaceTempView("dot_t")
    v = eng.sql("SELECT dotsum(a, b) AS v FROM dot_t").head().v
    assert v == pytest.approx(1 + 4 + 9 + 16)


def test_mergeable_state_is_order_insensitive_requirement_documented(spark):
    """Merge gets called with pickled partials in arbitrary order; an
    order-insensitive accumulator (count/sum pairs) must give the exact
    same result as the single-fold form."""
    eng = Engine(spark=spark, register_tables=False)
    _register_wavg(eng, "wavg_ord")
    df = spark.range(0, 40000, 1, 16).selectExpr(
        "'x' AS k", "CAST(id % 100 AS DOUBLE) AS p", "CAST(1 AS DOUBLE) AS q"
    )
    df.createOrReplaceTempView("uda_ord_t")
    got = eng.sql(
        "SELECT k, wavg_ord(p, q) AS w FROM uda_ord_t GROUP BY k"
    ).head().w
    assert got == pytest.approx(49.5, abs=1e-9)


def test_mergeable_having_end_to_end(spark, sf_dir):
    """HAVING over the UDA runs through the salted two-stage plan and
    matches the plain-SQL truth filtered the same way."""
    eng = Engine(spark=spark, sf_dir=sf_dir)
    _register_wavg(eng, "wavg_h")
    got = eng.sql(
        "SELECT l_returnflag, wavg_h(CAST(l_extendedprice AS DOUBLE), "
        "CAST(l_quantity AS DOUBLE)) AS w FROM lineitem "
        "GROUP BY l_returnflag HAVING wavg_h(CAST(l_extendedprice AS DOUBLE), "
        "CAST(l_quantity AS DOUBLE)) > 0 ORDER BY l_returnflag"
    )
    plan = _executed_plan(got)
    assert "__hop_salt" in plan
    rows = [(r.l_returnflag, r.w) for r in got.collect()]
    truth = [
        (r.l_returnflag, r.w)
        for r in eng.sql(TRUTH_SQL).collect()
        if r.w > 0
    ]
    assert [g[0] for g in rows] == [t[0] for t in truth]
    for (_, gv), (_, tv) in zip(rows, truth):
        assert gv == pytest.approx(tv, abs=5e-6)


def test_mergeable_expression_group_key_end_to_end(spark, sf_dir):
    """GROUP BY year(l_shipdate) runs through the salted two-stage plan —
    the inner stage groups by the expression, the outer by the internal
    key column — and matches the plain-SQL truth."""
    eng = Engine(spark=spark, sf_dir=sf_dir)
    _register_wavg(eng, "wavg_y")
    df = eng.sql(
        "SELECT year(l_shipdate) AS y, wavg_y(CAST(l_extendedprice AS "
        "DOUBLE), CAST(l_quantity AS DOUBLE)) AS w FROM lineitem "
        "GROUP BY year(l_shipdate) ORDER BY y"
    )
    plan = _executed_plan(df)
    assert "__hop_salt" in plan
    got = {r.y: r.w for r in df.collect()}
    truth = {
        r.y: r.w
        for r in eng.sql(
            "SELECT year(l_shipdate) AS y, CAST(round(SUM(CAST("
            "l_extendedprice AS DOUBLE) * l_quantity) / SUM(CAST(l_quantity "
            "AS DOUBLE)), 6) AS DOUBLE) AS w FROM lineitem GROUP BY "
            "year(l_shipdate)"
        ).collect()
    }
    assert got.keys() == truth.keys() and len(got) > 1
    for k in truth:
        assert got[k] == pytest.approx(truth[k], abs=5e-6)


def test_two_mergeable_udas_in_one_statement(spark):
    """Two mergeable UDA calls in one aggregation compile into ONE salted
    two-stage plan with two partial columns (both partial folds run in the
    same Arrow aggregation — pandas UDFs may share a grouped agg)."""
    eng = Engine(spark=spark, register_tables=False)
    _register_wavg(eng, "wavg_a")
    import numpy as np

    eng.create_aggregate_function(
        "sumsq_m",
        return_type="double",
        init=lambda: 0.0,
        update=lambda acc, x: acc + x * x,
        merge=lambda a, b: a + b,
        finalize=lambda acc: float(np.round(acc, 6)),
    )
    spark.range(0, 10000, 1, 8).selectExpr(
        "CAST(id % 4 AS STRING) AS k",
        "CAST(id % 100 AS DOUBLE) AS p",
        "CAST(1 + id % 3 AS DOUBLE) AS q",
    ).createOrReplaceTempView("uda_two_t")
    df = eng.sql(
        "SELECT k, wavg_a(p, q) AS w, sumsq_m(p) AS ss "
        "FROM uda_two_t GROUP BY k ORDER BY k"
    )
    plan = _executed_plan(df)
    assert "__hop_salt" in plan
    assert "wavg_a__partial" in plan and "sumsq_m__partial" in plan
    got = {r.k: (r.w, r.ss) for r in df.collect()}
    truth = {
        r.k: (r.w, r.ss)
        for r in spark.sql(
            "SELECT k, CAST(round(SUM(p*q)/SUM(q), 6) AS DOUBLE) AS w, "
            "CAST(round(SUM(p*p), 6) AS DOUBLE) AS ss "
            "FROM uda_two_t GROUP BY k"
        ).collect()
    }
    assert got.keys() == truth.keys()
    for k in truth:
        assert got[k][0] == pytest.approx(truth[k][0], abs=5e-6)
        assert got[k][1] == pytest.approx(truth[k][1], rel=1e-9)


def test_rewrite_with_cte_prefix():
    """Round-8 verdict item 4: a WITH prefix whose UDA calls live in the
    MAIN statement rewrites — the CTE list is kept verbatim."""
    out = rewrite_mergeable_uda(
        "WITH c AS (SELECT k, x, w FROM t WHERE x > 0) "
        "SELECT k, wavg(x, w) AS r FROM c GROUP BY k ORDER BY k",
        {"wavg"},
    )
    assert out is not None
    assert out.startswith("WITH c AS (SELECT k, x, w FROM t WHERE x > 0)")
    assert "wavg__partial(x, w) AS __hop_p_0" in out
    assert "wavg__merge(__hop_p_0) AS r" in out
    assert "__hop_salt" in out
    # multiple CTEs
    out2 = rewrite_mergeable_uda(
        "WITH a AS (SELECT 1 AS k, 2.0 AS x), b AS (SELECT k, x FROM a) "
        "SELECT k, wavg(x, x) AS r FROM b GROUP BY k",
        {"wavg"},
    )
    assert out2 is not None and out2.startswith("WITH a AS")
    assert "wavg__merge" in out2


def test_mergeable_cte_end_to_end(spark, sf_dir):
    """WITH ... SELECT wavg(...) runs through the salted two-stage plan and
    matches the plain-SQL truth."""
    eng = Engine(spark=spark, sf_dir=sf_dir)
    _register_wavg(eng, "wavg_c")
    got = eng.sql(
        "WITH li AS (SELECT l_returnflag AS k, "
        "CAST(l_extendedprice AS DOUBLE) AS p, "
        "CAST(l_quantity AS DOUBLE) AS q FROM lineitem) "
        "SELECT k, wavg_c(p, q) AS w FROM li GROUP BY k ORDER BY k"
    )
    plan = _executed_plan(got)
    assert "__hop_salt" in plan
    rows = [(r.k, r.w) for r in got.collect()]
    truth = [(r.l_returnflag, r.w) for r in eng.sql(TRUTH_SQL).collect()]
    assert [g[0] for g in rows] == [t[0] for t in truth]
    for (_, gv), (_, tv) in zip(rows, truth):
        assert gv == pytest.approx(tv, abs=5e-6)


def test_rewrite_uda_inside_cte_body():
    """Round-10 (r9 verdict item 6): a mergeable-UDA call INSIDE a CTE
    body recursively rewrites the body to the salted two-stage plan; the
    main statement passes through verbatim when it has no UDA call."""
    out = rewrite_mergeable_uda(
        "WITH c AS (SELECT k, wavg(x, w) AS r FROM t GROUP BY k) "
        "SELECT k, r FROM c WHERE r > 1 ORDER BY k",
        {"wavg"},
    )
    assert out is not None
    assert "wavg__partial(x, w) AS __hop_p_0" in out
    assert "wavg__merge(__hop_p_0) AS r" in out
    assert out.rstrip().endswith("SELECT k, r FROM c WHERE r > 1 ORDER BY k")
    # UDA in BOTH a CTE body and the main statement: both rewrite
    out2 = rewrite_mergeable_uda(
        "WITH c AS (SELECT k, wavg(x, w) AS r FROM t GROUP BY k) "
        "SELECT k, wavg(r, r) AS z FROM c GROUP BY k",
        {"wavg"},
    )
    assert out2 is not None and out2.count("wavg__merge") == 2
    # second of two CTEs calls the UDA
    out3 = rewrite_mergeable_uda(
        "WITH a AS (SELECT 1 AS k, 2.0 AS x), "
        "b AS (SELECT k, wavg(x, x) AS r FROM a GROUP BY k) "
        "SELECT k, r FROM b",
        {"wavg"},
    )
    assert out3 is not None and "wavg__partial" in out3
    # an unsupported body shape (UDA inside a window fn) falls back
    assert rewrite_mergeable_uda(
        "WITH c AS (SELECT k, wavg(x, w) OVER (PARTITION BY k) AS r"
        " FROM t) SELECT k FROM c",
        {"wavg"},
    ) is None
    # no UDA anywhere: nothing to rewrite
    assert rewrite_mergeable_uda(
        "WITH c AS (SELECT 1 AS k) SELECT k FROM c", {"wavg"}
    ) is None


def test_mergeable_uda_in_cte_body_end_to_end(spark, sf_dir):
    """UDA inside the CTE body runs the salted two-stage plan and matches
    the plain-SQL truth through the outer filter."""
    eng = Engine(spark=spark, sf_dir=sf_dir)
    _register_wavg(eng, "wavg_cb")
    got = eng.sql(
        "WITH fp AS (SELECT l_returnflag AS k, "
        "wavg_cb(CAST(l_extendedprice AS DOUBLE), "
        "CAST(l_quantity AS DOUBLE)) AS w FROM lineitem GROUP BY "
        "l_returnflag) SELECT k, w FROM fp WHERE w > 0 ORDER BY k"
    )
    plan = _executed_plan(got)
    assert "__hop_salt" in plan
    rows = [(r.k, r.w) for r in got.collect()]
    truth = [(r.l_returnflag, r.w) for r in eng.sql(TRUTH_SQL).collect()]
    assert [g[0] for g in rows] == [t[0] for t in truth]
    for (_, gv), (_, tv) in zip(rows, truth):
        assert gv == pytest.approx(tv, abs=5e-6)
