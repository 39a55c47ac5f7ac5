"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2.3 streaming row: 'stateful'): a per-user running profile that
Spark's built-in windowed aggregates cannot express (arbitrary user state
carried across micro-batches).

State design for scale: one small state row per user key; state is
hash-partitioned by the grouping key across executors and checkpointed by the
streaming engine — memory is O(active users), independent of throughput. An
event-time timeout would evict idle users (left NoTimeout here so the
availableNow test is deterministic).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double, last_event_type string"
STATE_SCHEMA = "n long, total double, last string"


def _update_user_profile(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last = str(pdf["event_type"].iloc[-1])
    state.update((n, total, last))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "last_event_type": [last],
        }
    )


def stream_user_profiles(events: DataFrame) -> DataFrame:
    """Running per-user profile (event count, value sum, last event type)
    maintained as explicit group state across micro-batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
