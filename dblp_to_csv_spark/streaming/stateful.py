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
# last_ts/last_id make "last" EVENT-TIME latest, not arrival-latest: the
# state must carry the watermark-free ordering key or a multi-chunk batch
# (chunks arrive in arbitrary order) and any late event silently overwrite
# the true latest (review r8)
STATE_SCHEMA = "n long, total double, last string, last_ts long, last_id long"


def _update_user_profile(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    n, total, last, last_ts, last_id = (
        state.get if state.exists else (0, 0.0, None, -1, -1)
    )
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            # per-chunk event-time max, compared against the carried state:
            # applyInPandasWithState delivers one group as MULTIPLE chunks
            # in arbitrary order, and a later micro-batch may deliver an
            # out-of-order (older) event — both must lose to the stored
            # (ts, event_id) maximum
            idx = pdf.sort_values(["ts", "event_id"]).index[-1]
            ts_us = int(pd.Timestamp(pdf["ts"][idx]).value // 1000)
            eid = int(pdf["event_id"][idx])
            if (ts_us, eid) > (last_ts, last_id):
                last, last_ts, last_id = str(pdf["event_type"][idx]), ts_us, eid
    state.update((n, total, last, last_ts, last_id))
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
