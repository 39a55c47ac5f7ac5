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


# Streaming EWMA: the stateful twin of operators/timeseries.ewma_event_values.
# State per user = the last EWMA_LAGS-1 (ts_us, event_id, value) triples in
# event-time order — null-value rows INCLUDED (they occupy lag positions in
# the batch twin's window, contributing nothing to the numerator and being
# excluded from the weight mass).
EWMA_OUTPUT_SCHEMA = "user_id long, event_id long, value double, ewma double"
EWMA_STATE_SCHEMA = "ts_us array<long>, ids array<long>, vals array<double>"


def _update_user_ewma(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import math

    from dblp_to_csv_spark.operators.timeseries import EWMA_ALPHA, EWMA_LAGS

    (user_id,) = key
    buf: list[tuple[int, int, float | None]] = (
        [tuple(t) for t in zip(*state.get)] if state.exists else []
    )
    chunks = [pdf for pdf in pdfs if len(pdf)]
    out_ids: list[int] = []
    out_vals: list[float | None] = []
    out_ewma: list[float | None] = []
    if chunks:
        batch = pd.concat(chunks).sort_values(["ts", "event_id"])
        for _, row in batch.iterrows():
            ts_us = int(pd.Timestamp(row["ts"]).value // 1000)
            eid = int(row["event_id"])
            val = None if pd.isna(row["value"]) else float(row["value"])
            window = buf[-(EWMA_LAGS - 1):] + [(ts_us, eid, val)]
            num = den = 0.0
            # newest-last buffer: age i = distance from the current row,
            # weight (1-alpha)^i — the batch twin's lag ladder
            for age, (_, _, v) in enumerate(reversed(window)):
                if v is not None and not (isinstance(v, float) and math.isnan(v)):
                    w = (1.0 - EWMA_ALPHA) ** age
                    num += v * w
                    den += w
            out_ids.append(eid)
            out_vals.append(val)
            out_ewma.append(round(num / den, 6) + 0.0 if den != 0.0 else None)
            buf.append((ts_us, eid, val))
            buf = buf[-(EWMA_LAGS - 1):]
    state.update(
        (
            [t for t, _, _ in buf],
            [i for _, i, _ in buf],
            [v for _, _, v in buf],
        )
    )
    yield pd.DataFrame(
        {
            "user_id": [user_id] * len(out_ids),
            "event_id": out_ids,
            "value": out_vals,
            "ewma": out_ewma,
        }
    )


def stream_user_ewma(events: DataFrame) -> DataFrame:
    """Per-event EWMA under Structured Streaming with explicit group state
    (the last EWMA_LAGS-1 observations per user).

    Ordering contract (the substring-dedup precedent): batch parity holds
    when each user's events arrive in event-time order ACROSS micro-batches
    (within a batch they are sorted here) — the bulk-replay / log-structured
    delivery shape. A late cross-batch event gets an EWMA over its
    predecessors-in-arrival rather than its event-time window; pin
    correctness with a watermarked source if late data is possible.
    State is O(EWMA_LAGS) per active user, hash-partitioned by key."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_ewma,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# Streaming bottom-k quantile sketch: the stateful twin of
# operators/statistics.sketch_bottomk_quantiles_by_group. State per event
# type = the k smallest (md5(event_id), value) pairs seen so far — the
# MERGEABILITY of bottom-k (bottom-k of a union = re-cut of the merged
# bottom-k states, pinned in test_governance_sketch_ops) is exactly what
# makes it a streaming-updatable sketch: each micro-batch merges and
# re-cuts, and the final state is IDENTICAL to the batch draw over the
# same data regardless of how the stream was chunked.
BKG_STREAM_OUTPUT_SCHEMA = (
    "event_type string, k_used long, p50 double, p95 double"
)
BKG_STREAM_STATE_SCHEMA = "hks array<string>, vals array<double>"


def _update_group_bottomk(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    import hashlib

    from dblp_to_csv_spark.functions.rounding import TIE_EPS
    from dblp_to_csv_spark.operators.statistics import BOTTOMK_GROUP_K

    (event_type,) = key
    pairs: list[tuple[str, float]] = (
        [tuple(t) for t in zip(*state.get)] if state.exists else []
    )
    for pdf in pdfs:
        # A chunk that carried NULL ids arrives with event_id widened to
        # float64 by pandas; nullable Int64 restores exact int64 identity
        # for in-range values instead of trusting int(float) truncation.
        eids = pdf["event_id"].astype("Int64")
        for eid, val in zip(eids, pdf["value"]):
            if pd.isna(eid):
                continue  # md5(NULL) = NULL on the batch side — no draw
            # identical draw to the batch sketch: md5 of the DECIMAL string
            # of event_id, exactly Spark's md5(CAST(event_id AS STRING))
            hk = hashlib.md5(str(int(eid)).encode()).hexdigest()
            pairs.append(
                (hk, float("nan") if pd.isna(val) else float(val))
            )
    pairs.sort(key=lambda p: p[0])
    pairs = pairs[:BOTTOMK_GROUP_K]
    state.update(([h for h, _ in pairs], [v for _, v in pairs]))
    import numpy as np

    # NULL-value rows occupy sample slots (they are drawn by hash like any
    # row — mirroring the batch sketch, whose rank cut ignores `value`) but
    # are skipped by the percentile, exactly as Spark `percentile` skips
    # NULLs; linear interpolation = Spark `percentile` = DuckDB
    # quantile_cont; tie-down rounding matches round_ties_down(…, 4)
    vals = np.array([v for _, v in pairs], dtype="float64")
    vals = vals[~np.isnan(vals)]
    p50, p95 = (
        (None, None)
        if len(vals) == 0
        else tuple(
            round(float(q) - TIE_EPS, 4) + 0.0
            for q in np.percentile(vals, [50, 95], method="linear")
        )
    )
    yield pd.DataFrame(
        {
            "event_type": [event_type],
            "k_used": [len(pairs)],
            "p50": [p50],
            "p95": [p95],
        }
    )


def stream_group_bottomk(events: DataFrame) -> DataFrame:
    """Per-event-type bottom-k quantile sketch maintained across
    micro-batches (p50/p95 of `value` per type, k smallest md5(event_id)
    rows as state). State is O(k) per group — constant no matter the
    group's throughput — and the merge+re-cut update is order- and
    chunking-insensitive, so the final state equals the batch sketch over
    the same data (pinned in test_streaming.py). The streaming face of the
    'latency percentiles per segment' monitor."""
    return events.groupBy("event_type").applyInPandasWithState(
        _update_group_bottomk,
        outputStructType=BKG_STREAM_OUTPUT_SCHEMA,
        stateStructType=BKG_STREAM_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
