"""Incremental PSI drift monitor (operators/incremental.py: psi_store_*):
the reference arm freezes at init (6-dp cutpoints + 10-row counts), current
batches fold integer-additively — so current() must equal the oracle-checked
batch drift_psi_events_value over (reference, everything appended) for any
batching; seq-gated replay; constant-size state."""

from __future__ import annotations

import pytest

from dblp_to_csv_spark.operators.drift import PSI_CUR, PSI_REF
from dblp_to_csv_spark.operators.incremental import (
    psi_store_append,
    psi_store_current,
    psi_store_init,
)
from tests.conftest import SF_SMOKE


def _arms(spark):
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    from dblp_to_csv_spark.sources.tables import load_table

    ev = load_table(spark, SF_SMOKE, "events")
    ref = ev.filter(ev.event_type == PSI_REF).select("event_id", "value")
    cur = [
        (int(r.event_id), r.value)
        for r in ev.filter(ev.event_type == PSI_CUR)
        .select("event_id", "value")
        .orderBy("event_id")
        .collect()
    ]
    return ref, cur


def _cur_df(spark, rows):
    return spark.createDataFrame(rows, "event_id long, value double")


def _want(spark):
    from dblp_to_csv_spark.registry import all_queries

    return [tuple(r) for r in all_queries()["drift_psi_events_value"].fn(spark, SF_SMOKE).collect()]


@pytest.mark.parametrize("n_batches", [1, 4])
def test_streaming_equals_batch_psi(spark, tmp_path, n_batches):
    ref, cur = _arms(spark)
    store = str(tmp_path / f"psi{n_batches}")
    psi_store_init(spark, ref, store)
    step = max(1, len(cur) // n_batches + 1)
    for seq, i in enumerate(range(0, len(cur), step)):
        assert psi_store_append(spark, _cur_df(spark, cur[i : i + step]), store, seq)
    got = [tuple(r) for r in psi_store_current(spark, store).collect()]
    assert got == _want(spark)


def test_replay_is_seq_gated(spark, tmp_path):
    ref, cur = _arms(spark)
    store = str(tmp_path / "psi_replay")
    psi_store_init(spark, ref, store)
    assert psi_store_append(spark, _cur_df(spark, cur[:200]), store, seq=0)
    before = [tuple(r) for r in psi_store_current(spark, store).collect()]
    assert not psi_store_append(spark, _cur_df(spark, cur[:200]), store, seq=0)
    assert [tuple(r) for r in psi_store_current(spark, store).collect()] == before
