"""Operator library — DataFrame-native implementations of the reference's
operator inventory (SURVEY.md §2) plus the LLM-data-pipeline extensions.

Each module exposes `QUERIES: dict[name, (fn, oracle_sql | None)]` where
`fn(spark, sf_dir) -> DataFrame` and `oracle_sql` is the DuckDB-runnable
ANSI-SQL twin (None ⇒ not SQL-expressible; rows-only check)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, tuple[QueryFn, str | None]]:
    """Merge every module's registry; import lazily so a broken module is
    isolated to its own entries during development."""
    from hopspark.operators import (
        aggregates,
        analytic,
        curation,
        dedup,
        dialect_sql,
        graph,
        mixture,
        multimodal,
        nested,
        pipeline,
        quality,
        relational,
        similarity,
        sketches,
        stream_queries,
        temporal,
        text,
        tpch,
        tpcds_patterns,
    )

    merged: dict[str, tuple[QueryFn, str | None]] = {}
    for mod in (
        tpch,
        relational,
        aggregates,
        analytic,
        nested,
        dedup,
        graph,
        temporal,
        similarity,
        sketches,
        text,
        curation,
        multimodal,
        dialect_sql,
        tpcds_patterns,
        pipeline,
        quality,
        mixture,
        stream_queries,
    ):
        for name, entry in mod.QUERIES.items():
            if name in merged:
                raise ValueError(f"duplicate query name {name!r}")
            merged[name] = entry
    return merged
