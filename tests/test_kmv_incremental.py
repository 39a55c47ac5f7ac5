"""Incremental KMV distinct sketch (operators/incremental.py: kmv_store_*):
bottom-K over deterministic hash values is associative AND value-idempotent
(same key -> same hash -> distinct collapses), so the streaming fold is
EXACT — estimates equal the oracle-checked batch query's sketch columns for
any batching, replays are no-ops with no replay guard at all, and state is
<= K rows per group forever."""

from __future__ import annotations

import pytest

from dblp_to_csv_spark.operators.incremental import (
    kmv_store_append,
    kmv_store_current,
    kmv_store_init,
)
from tests.conftest import SF_SMOKE


def _rows(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_type", "user_id")
        .orderBy("event_id")
        .collect()
    )


def _df(spark, rows):
    return spark.createDataFrame(
        [(r.event_type, r.user_id) for r in rows], "event_type string, user_id long"
    )


def _cur(spark, d):
    return sorted(tuple(r) for r in kmv_store_current(spark, d).collect())


def _batch_sketch(spark):
    from dblp_to_csv_spark.registry import all_queries

    out = all_queries()["sketch_kmv_distinct"].fn(spark, SF_SMOKE).collect()
    return sorted(
        (r.event_type, min(64, r.exact_distinct), r.kmv_estimate) for r in out
    )


@pytest.mark.parametrize("batch_size", [211, 10_000_000])
def test_streaming_equals_batch_sketch(spark, tmp_path, batch_size):
    rows = _rows(spark)
    d = str(tmp_path / f"kmv{batch_size}")
    kmv_store_init(spark, d)
    for i in range(0, len(rows), batch_size):
        kmv_store_append(spark, _df(spark, rows[i : i + batch_size]), d)
    assert _cur(spark, d) == _batch_sketch(spark)


def test_replay_is_a_noop_and_state_bounded(spark, tmp_path):
    from dblp_to_csv_spark.operators.statistics import KMV_K

    rows = _rows(spark)
    d = str(tmp_path / "kmv_replay")
    kmv_store_init(spark, d)
    kmv_store_append(spark, _df(spark, rows[:500]), d)
    kmv_store_append(spark, _df(spark, rows[500:]), d)
    want = _cur(spark, d)
    kmv_store_append(spark, _df(spark, rows[:500]), d)  # replay: no guard needed
    kmv_store_append(spark, _df(spark, rows), d)  # full replay
    assert _cur(spark, d) == want
    state = spark.read.parquet(d)
    n_groups = state.select("event_type").distinct().count()
    assert state.count() <= KMV_K * n_groups
