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
