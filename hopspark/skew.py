"""Skew mitigation utilities (100 TB concern: a hot grouping key turns one
reducer into the job's critical path).

The reference handles skew with its streaming pre-aggregation (partial agg
passes rows through when reduction is poor — streaming-aggregation-node.h)
plus per-node hash tables; Spark's AQE splits skewed *join* partitions but
grouped aggregation on a hot key still funnels into one task after the
partial agg. `salted_agg` does the classic two-phase rewrite: group by
(key, salt) first, then recombine — the salt spreads the hot key over N
tasks and the second phase aggregates N rows per key instead of all rows.

Composable aggregates only (sum/count/min/max — the algebraic ones);
avg must be expressed as sum+count by the caller (exactly how the engine's
deterministic davg works).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_PHASE2 = {
    "sum": F.sum,
    "count": F.sum,  # counts combine by summing partial counts
    "min": F.min,
    "max": F.max,
}


def salted_join(
    facts: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "inner",
    n_salts: int = 16,
) -> DataFrame:
    """Skew-safe equi-join: salt the (possibly hot-keyed) fact side with a
    random bucket and REPLICATE the other side once per bucket, then join on
    (keys..., salt). A hot join key's rows spread over `n_salts` tasks
    instead of funneling into one. This is the manual form of what AQE's
    skew-join split does at runtime — useful when the skew is known up
    front, when AQE's per-partition size heuristics miss it (many medium-hot
    keys), or on non-AQE paths. The replicated side pays `n_salts`× its
    size in shuffle, so use it for dimension-sized right sides.

    Supported `how`: inner / left (semantics preserved because every fact
    row carries exactly one salt and every dim row exists for every salt)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted = facts.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    replicated = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted.join(replicated, [*on, "_salt"], how).drop("_salt")


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column | str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    aggs: {output_alias: (op, column)} with op in sum|count|min|max.
    count counts non-null values of its column (use a literal for count(*)).
    """
    for alias, (op, _col) in aggs.items():
        if op not in _PHASE2:
            raise ValueError(f"{alias}: op {op!r} not algebraic; use sum/count/min/max")

    salt = (F.rand(seed=42) * n_salts).cast("int").alias("_salt")
    phase1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt")
    partials = []
    for alias, (op, col) in aggs.items():
        c = F.col(col) if isinstance(col, str) else col
        fn = F.count if op == "count" else getattr(F, op)
        partials.append(fn(c).alias(f"_p_{alias}"))
    mid = phase1.agg(*partials)

    finals = [
        _PHASE2[op](F.col(f"_p_{alias}")).alias(alias)
        for alias, (op, _col) in aggs.items()
    ]
    return mid.groupBy(*keys).agg(*finals)
