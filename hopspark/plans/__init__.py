"""Plan-inspection helpers — the engine's explain/plan-assertion toolkit.

The reference locks physical-plan shape with golden EXPLAIN tests
(testdata/workloads/functional-planner/queries/PlannerTest/, 118 files,
driven by fe/src/test/java/org/apache/impala/planner/PlannerTest.java).
We adopt the same discipline against Spark's formatted explain output:
tests assert that filters push to the parquet scan, small dims broadcast,
and window group-limits materialize (tests/test_plans.py).
"""

from hopspark.plans.inspect import (
    explain_formatted,
    has_broadcast_join,
    pushed_filters,
    scan_read_schema,
)

__all__ = [
    "explain_formatted",
    "pushed_filters",
    "scan_read_schema",
    "has_broadcast_join",
]
