"""Operator library — DataFrame-native implementations of the reference's
operator inventory (SURVEY.md §2) plus the LLM-data-pipeline extensions.

Each module exposes `QUERIES: dict[name, (fn, oracle_sql | None)]` where
`fn(spark, sf_dir) -> DataFrame` and `oracle_sql` is the DuckDB-runnable
ANSI-SQL twin (None ⇒ not SQL-expressible; rows-only check)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

#: Every operator module contributing to the query registry, in merge order.
_MODULES = (
    "tpch",
    "relational",
    "aggregates",
    "analytic",
    "nested",
    "dedup",
    "graph",
    "temporal",
    "similarity",
    "sketches",
    "text",
    "curation",
    "multimodal",
    "dialect_sql",
    "iceberg_queries",
    "tpcds_patterns",
    "tpcds_patterns2",
    "tpcds_patterns3",
    "tpcds_patterns4",
    "tpcds_patterns5",
    "tpcds_patterns6",
    "tpcds_patterns7",
    "tpcds_patterns8",
    "tpcds_patterns9",
    "tpcds_patterns10",
    "advanced_sql",
    "pipeline",
    "quality",
    "mixture",
    "stream_queries",
    "format_queries",
)

#: The driver's correctness gate checks only the FIRST 50 entries of
#: ``all_queries()``.  Left to module-import order that set would be filled by
#: tpch+relational+aggregates alone (round-2 lesson: the window queries were
#: silently displaced out of the checked set).  This list hand-curates the
#: first 50 so every operator module — every SURVEY.md §2 family plus each
#: LLM-pipeline extension — has at least one driver-checked row.  Entries are
#: chosen to prefer oracle-SQL-checked queries (value-hash compare) over
#: rows-only ones.  ``tests/test_oracle_parity.py`` asserts the coverage.
CURATED_FIRST = (
    # TPC-H spine — richest plans (multi-join, agg, subquery shapes).
    "tpch_q1_pricing_summary",
    "tpch_q3_shipping_priority",
    # r9 rotation: q5 (driver-green r1-r8) hands its slot to the format-
    # codec rows below; the TPC-H spine keeps q1/q3/q21 + lateral_topk,
    # and q5 stays sim-checked.
    # r7 rotation: q8 hands its slot to the new rows below — its market-share
    # multi-join stays sim-checked and plan-asserted
    # (tests/test_plans.py::test_q8_all_joins_broadcast, bloom-filter shape
    # asserts); the TPC-H spine keeps q1/q3/q5/q21 + lateral_topk.
    # r5 rotation: LATERAL per-group top-k (advanced_sql) replaces
    # tpch_q18 — TPC-H spine keeps q1/q3/q5/q8/q21, and the group-
    # having shape q18 exercises stays via tpcds_q94's HAVING composite.
    "lateral_topk_per_group",
    "tpch_q21_suppliers_waiting",
    # Joins / set ops / sorts (§2.4, §2.7, §2.8).
    "join_full_outer",
    "join_null_aware_anti_not_in",
    # r7 rotation: sort_nulls_ordering rotates out — the Impala NULL-ordering
    # default contract keeps a driver row via dialect_sql_null_ordering, and
    # the sorts/limits golden corpus pins the rest; stays sim-checked.
    # Aggregation (§2.5).
    # r7 rotation: agg_rollup rotates out — rollup/grouping evidence keeps
    # THREE driver rows (tpcds_q36 rollup+rank, tpcds_q27a grouping sets,
    # tpcds_q18 grouping-sets channels); stays sim-checked.
    "agg_multi_distinct",
    # r5 rotation: explicit GROUPING SETS over a pre-aggregated partial
    # (tpcds_patterns10, q27a shape) replaces agg_pivot_status — §2.5
    # grouping-family evidence deepens (rollup + grouping sets + q18/q86
    # below); PIVOT stays sim-checked and golden-pinned.
    # r8 rotation: q49a decile buckets (r7's newest TPC-DS shape, sim-only
    # until now) took q27a's slot — grouping-sets evidence keeps driver
    # rows via tpcds_q18_grouping_sets_channels and the q36 rollup;
    # q27a was driver-green in r7 and stays sim-checked.
    # r9 session-2 rotation: q49a (driver-green r8) hands its slot to the
    # correlated subplan derived table — the brand-new nested surface
    # (LATERAL VIEW filter/slice lowering) whose failure modes no gate row
    # exercises; patterns10 keeps tpcds_q49_dual_rank_union, and q49a
    # stays sim-checked.
    "dialect_sql_subplan_derived",
    "agg_stats_moments",
    # Analytic / windows (§2.6).
    # r7 rotation: window_rank_topn rotates out — the partitioned-TopN
    # WindowGroupLimit family keeps driver rows via tpcds_q67_rollup_rank_topn,
    # lateral_topk_per_group, and curation_source_cap; stays sim-checked
    # with its plan assert.
    "window_sessionize",
    # r5 rotation: cumulative-DISTINCT-over-window via the scalable
    # first-occurrence rewrite (tpcds_patterns9) — keeps the running-sum
    # window family covered (it IS a running SUM over the month dim) and
    # adds the distinct-window shape; replaces window_running_sum.
    "tpcds_q51a_cumulative_distinct",
    # Nested types + subqueries (§2.9).
    # r9 session-2 rotation: nested_zip_unnest (driver-green r1-r8) hands
    # its slot to the rootless table-path collection scan — the new FROM
    # tbl.collection surface (schema-resolved LATERAL VIEW rewrite), never
    # driver-checked; zipping UNNEST stays golden-pinned + sim-checked.
    "dialect_sql_table_path_scan",
    "nested_from_disk",
    # r9 rotation: subquery_scalar_threshold (driver-green since r1) hands
    # its slot to the recursive-CTE month spine — a plan shape (iterative
    # UNION ALL expansion) no gate row has ever exercised; the scalar-
    # subquery + CardinalityCheck family stays sim-checked and plan-locked
    # (tests/test_plans.py:121).
    "recursive_month_spine",
    # Deduplication. r5 rotation: avro_roundtrip_agg (below) displaces
    # dedup_ngram_jaccard — the near-dup family keeps embedding_cosine
    # plus the cc_clusters Jaccard-join row, and ngram-Jaccard stays
    # sim-checked.
    # r9 rotation: dedup_exact_groups (driver-green r1-r8) hands its slot
    # to the n-gram Jaccard near-dup screen (never driver-checked; its
    # banded shingle-join failure modes differ from the cc_clusters row);
    # exact dedup stays sim-checked.
    "dedup_ngram_jaccard",
    # r7 rotation: the incremental batch-vs-history anti-join dedup and the
    # capped-prefix Levenshtein verify stage (both new in r6, sim-only until
    # now) take their first driver rows; dedup_embedding_cosine stays
    # sim-checked — the cosine family keeps sim_knn_bruteforce_cosine plus
    # the quantization row below.
    # r8 rotation: both r7-green dedup rows (incremental batch anti-join,
    # capped-prefix Levenshtein verify) hand their slots to first-time rows
    # below; the dedup family keeps dedup_exact_groups + dedup_cc_clusters
    # under the gate, and both rotated rows stay sim-checked.
    "pipeline_leakage_safe_split",
    "iceberg_describe_history",
    # Format scan/sink roundtrips (§2.1): the Avro container codec is the
    # largest pure-Python reader surface — its oracle compares the
    # write→read roundtrip against the ORIGINAL parquet view, upgrading
    # the format family from unit-only to driver-checked.
    # r9 rotation: avro (driver-green r5-r8) hands its slot to the two
    # never-driver-checked format codecs — the ORC write→read roundtrip
    # and the pure-Python RCFile reader with column pruning; avro stays
    # sim-checked.
    "orc_roundtrip_agg",
    "rcfile_roundtrip_prune",
    # Similarity graph / PageRank.
    "dedup_cc_clusters",
    "graph_pagerank_bipartite",
    # Temporal. r6 session-3 rotation: the ordered three-step funnel
    # (sort_array fold with chained-min oracle — a shape no other gate row
    # exercises) replaces events_cohort_retention, which stays sim-checked;
    # the cohort family's user-level window semantics remain covered by
    # window_sessionize above.
    "temporal_asof_attribution",
    # r8 rotation: the daily-anomaly z-score screen (r7's new temporal
    # operator, sim-only until now) takes its first driver row;
    # events_session_funnel was driver-green in r7 and stays sim-checked.
    "events_daily_anomaly",
    # Similarity search. r7 rotation: int8 embedding quantization
    # (zero-shuffle scan-side array kernels, engine-stable rounding) takes
    # its first driver row.
    "sim_knn_bruteforce_cosine",
    "emb_quantize_int8",
    # Sketches.
    "sketch_theta_grouped",
    # r6 session-2 rotation: per-source corpus capping (WindowGroupLimit
    # plan-asserted, kept_chars ranking-dependent) replaces
    # text_token_stats — text keeps the composed bigram-LM scorer row
    # below; token_stats stays sim-checked and unit-tested.
    "curation_source_cap",
    # Curation.
    "pack_sequences",
    # r8 rotation: the keyed-hash curriculum ordering (r7 operator, sim-only
    # until now) takes text_contamination's slot — contamination was
    # driver-green in r7 and stays sim-checked; the text family keeps
    # tfidf_top_terms + bigram_score under the gate.
    "pipeline_curriculum_order",
    # r7 rotation: per-doc TF-IDF top terms (tf join df over two
    # pre-aggregated relations, WindowGroupLimit top-k) — first driver row.
    "text_tfidf_top_terms",
    # Multimodal.
    # r7 rotation: mm_decode_image hands its slot to the new rows below;
    # the PPM/BMP decode path stays sim-checked + unit-tested, and the
    # multimodal family keeps the payload-dedup row.
    "mm_payload_dedup",
    # Impala dialect surface. scalar_parity pins the round-4 kernel fixes
    # (greatest/least NULL-poisoning, pmod sign rule, regexp backrefs,
    # extract BIGINT, dtrunc, RR round-year) under the driver gate; it
    # replaces setop_except (0 rows at gate SF — weak hash evidence; set
    # ops stay covered by sim + the curated union-composite TPC-DS rows).
    "dialect_sql_filters",
    # r9 rotation: dialect_sql_null_ordering (driver-green r7/r8) hands its
    # slot to the DDL surface — CTAS + CREATE VIEW through the Impala SQL
    # translator, never driver-checked; the NULL-ordering default contract
    # stays golden-pinned + sim-checked.
    "dialect_sql_ddl_ctas_view",
    # r6 rotation: the char-argument mask family + byte-position
    # instr/locate windows under the driver gate (scalar_parity's
    # greatest/least/pmod/regexp/extract kernels stay sim-checked —
    # the mask/byte row exercises this round's new dialect surface).
    # r7 rotation: the mergeable-UDA two-stage compilation (the round-6
    # verdict's #1 item — salted partial fold + merge, no whole-group
    # materialization) takes a driver row; mask_bytes rotates out after its
    # r6 driver green (mask family stays golden-pinned + sim-checked).
    "dialect_sql_uda_mergeable_weighted_avg",
    # TPC-DS patterns.
    "tpcds_q36_margin_rollup_rank",
    "tpcds_q33_manufacturer_union",
    "tpcds_q67_rollup_rank_topn",
    "tpcds_q19_disjunctive_bands",
    "tpcds_q57_rolling_window",
    # r7 rotation: the full q49 structure (sales LEFT JOIN returns with a
    # nullable-side predicate -> inner conversion, dual rank windows,
    # OR-filter, UNION DISTINCT of channel blocks) — the round-6 verdict's
    # least-mirrored reference idiom takes a driver row.
    "tpcds_q49_dual_rank_union",
    # r4 rotations: grouping-sets over a derived channel and correlated
    # EXISTS/NOT-EXISTS + rollup (tpcds_patterns6). They replace
    # agg_grouping_sets (subsumed by the richer q18 shape) and tpch_q22
    # (0-row result at gate SF — weak hash evidence).
    "tpcds_q18_grouping_sets_channels",
    # r6 rotation: the composed bigram-LM document scorer (train the LM
    # on the corpus, broadcast it, score every doc — integer-PPM
    # deterministic) replaces q86; tpcds_patterns9 stays covered by
    # q51a, and the rollup+rank composition by q36/q67 above. q86 keeps
    # its sim check.
    "text_bigram_score",
    # r4: engine-neutral weekday pivot (tpcds_patterns7); replaces
    # window_value_fns_ignore_nulls (analytic keeps 3 curated rows).
    "tpcds_q43_weekday_pivot",
    # r4: multi-supplier/no-returns HAVING composite (tpcds_patterns8);
    # replaces text_quality_score (text family keeps token_stats).
    "tpcds_q94_multi_supplier_clean_orders",
    # Iceberg table format (v2 merge-on-read).
    "iceberg_v2_mor_read",
    # Pipeline / quality / mixture / streaming extensions. r6 session-3
    # rotation: the full corpus-to-training-mix composition (dedup gate →
    # temperature allocation → ranked take) replaces the corpus-stats
    # report, which it subsumes; corpus_stats stays sim-checked.
    "pipeline_training_mix",
    "dq_null_profile",
    # r8 rotation: the width_bucket-binned KS drift screen (the FIXED
    # 512-bin scale path promised in r6) takes its first driver row; the
    # exact two-sample variant dq_ks_distribution_drift was driver-green in
    # r7 and stays sim-checked.
    "dq_ks_drift_bucketed",
    # r9 rotation: rebalance_uniform (driver-green r6-r8) hands its slot to
    # the temperature-weighted sampling allocator (never driver-checked);
    # uniform rebalance stays sim-checked.
    "mixture_temperature_weights",
    # r9 rotation: hourly_rollup (driver-green r5-r8) hands its slot to the
    # streaming key-dedup shape (never driver-checked); the windowed rollup
    # stays sim-checked with its watermark unit tests.
    "streaming_dedup_keys",
)


def all_queries() -> dict[str, tuple[QueryFn, str | None]]:
    """Merge every module's registry (import lazily so a broken module is
    isolated during development), then reorder so ``CURATED_FIRST`` leads —
    the driver's gate checks only the first 50 entries."""
    import importlib

    merged: dict[str, tuple[QueryFn, str | None]] = {}
    for mod_name in _MODULES:
        mod = importlib.import_module(f"hopspark.operators.{mod_name}")
        for name, entry in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name {name!r}")
            merged[name] = entry
    missing = [n for n in CURATED_FIRST if n not in merged]
    if missing:
        raise ValueError(f"CURATED_FIRST names not in registry: {missing}")
    ordered = {n: merged[n] for n in CURATED_FIRST}
    ordered.update((n, e) for n, e in merged.items() if n not in ordered)
    return ordered


def queries_by_module() -> dict[str, list[str]]:
    """Map operator-module name → its query names (test/audit helper)."""
    import importlib

    out: dict[str, list[str]] = {}
    for mod_name in _MODULES:
        mod = importlib.import_module(f"hopspark.operators.{mod_name}")
        out[mod_name] = list(mod.QUERIES)
    return out
