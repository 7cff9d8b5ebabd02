"""Custom stateful streaming operator via applyInPandasWithState —
the §7.E extension shape for operators Spark lacks natively (running
accumulators, CDC-style merge, online sketches) kept per-key in the state
store across micro-batches.

Scale notes: state is partitioned by the grouping key (same shuffle as a
streaming agg); the pandas function sees one key's rows per call, Arrow-
batched. Hot keys are the usual salting candidates; state size here is two
scalars per user, so 10⁹ users ≈ a few GB across the cluster.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("value_sum", T.DoubleType()),
    ]
)
_STATE = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("s", T.DoubleType())]
)


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "value_sum": [s]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals that survive across micro-batches — a
    custom stateful accumulator (no built-in operator keeps emitting the
    cumulative value per key per batch)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=_OUT,
        stateStructType=_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ---------------------------------------------------------------------------
# Online distinct-count sketch: KMV theta state per key across micro-batches
# ---------------------------------------------------------------------------

SKETCH_K = 1024
_SPACE = float(2**63)

_NDV_OUT = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("ndv_est", T.DoubleType()),
        T.StructField("n_seen", T.LongType()),
    ]
)
# state = (rows processed, ascending k-minimum hash sample)
_NDV_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("mins", T.ArrayType(T.LongType())),
    ]
)


def _kmv_update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Merge each micro-batch's user hashes into the per-key KMV sample —
    the streaming twin of operators/sketches.py (same estimator: exact
    below k, (k-1)/theta above). State is capped at SKETCH_K longs per
    key, so a billion-user stream costs ~8 KB of state per event type."""
    import hashlib

    n, mins = state.get if state.exists else (0, [])
    sample = set(mins)
    for pdf in pdfs:
        n += len(pdf)
        for uid in pdf["user_id"]:
            h = int.from_bytes(
                hashlib.blake2b(
                    int(uid).to_bytes(8, "little", signed=True), digest_size=8
                ).digest(),
                "little",
            ) >> 1
            sample.add(h)
    mins = sorted(sample)[:SKETCH_K]
    state.update((n, mins))
    if len(mins) < SKETCH_K:
        est = float(len(mins))
    else:
        theta = (mins[SKETCH_K - 1] + 1) / _SPACE
        est = (SKETCH_K - 1) / theta
    yield pd.DataFrame(
        {"event_type": [key[0]], "ndv_est": [est], "n_seen": [n]}
    )


def streaming_distinct_users(events: DataFrame) -> DataFrame:
    """Per-event-type approximate distinct user count maintained online —
    a custom stateful sketch operator (ds_theta_sketch over a stream; no
    built-in Spark operator emits a running NDV per key per batch)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _kmv_update,
        outputStructType=_NDV_OUT,
        stateStructType=_NDV_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
