"""Incremental Misra-Gries heavy hitters (operators/incremental.py:
mg_store_*): the K-row merged-summary state is batching-dependent, so the
pins are the GUARANTEES, not raw state equality —

- bound validity under any batching: lb(x) <= true(x) <= ub(x) for every
  stored word, and true(x) <= ub - lb for every absent word;
- no-false-negative: the candidate set contains every true phi-frequent
  word, so the exact recount (mg_store_hh) equals the oracle-checked batch
  query heavy_hitters_words for any batching;
- K-row state forever; exact total; seq-gated idempotent replay.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from dblp_to_csv_spark.operators.incremental import (
    mg_store_append,
    mg_store_candidates,
    mg_store_hh,
    mg_store_init,
)
from dblp_to_csv_spark.operators.statistics import HH_K
from tests.conftest import SF_SMOKE


def _rows(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    )


def _df(spark, rows):
    return spark.createDataFrame([tuple(r) for r in rows], "doc_id long, text string")


def _true_counts(rows) -> Counter:
    # Pure-Python twin of functions.text.words (split on [^a-z0-9]+).
    c: Counter = Counter()
    for r in rows:
        c.update(re.findall(r"[a-z0-9]+", r.text.lower()))
    return c


def _ingest(spark, rows, store, batch_size):
    seq = 0
    for i in range(0, len(rows), batch_size):
        assert mg_store_append(spark, _df(spark, rows[i : i + batch_size]), store, seq)
        seq += 1


@pytest.mark.parametrize("batch_size", [37, 200])
def test_bounds_hold_for_every_word(spark, tmp_path, batch_size):
    rows = _rows(spark)
    store = str(tmp_path / "mg")
    mg_store_init(spark, store)
    _ingest(spark, rows, store, batch_size)
    truth = _true_counts(rows)
    cand = {r.word: (r.lb, r.ub) for r in mg_store_candidates(spark, store).collect()}
    assert len(cand) <= HH_K
    for w, (lb, ub) in cand.items():
        assert lb <= truth[w] <= ub, (w, lb, truth[w], ub)
    if cand:
        budget = next(iter(cand.values()))
        absent_max = max(
            (c for w, c in truth.items() if w not in cand), default=0
        )
        assert absent_max <= budget[1] - budget[0]


def test_recount_equals_batch_query_any_batching(spark, tmp_path):
    from dblp_to_csv_spark.registry import all_queries

    rows = _rows(spark)
    want = sorted(
        tuple(r)
        for r in all_queries()["heavy_hitters_words"].fn(spark, SF_SMOKE).collect()
    )
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    for batch_size in (50, len(rows)):  # trickle and single-batch
        store = str(tmp_path / f"mg{batch_size}")
        mg_store_init(spark, store)
        _ingest(spark, rows, store, batch_size)
        got = sorted(tuple(r) for r in mg_store_hh(spark, docs, store).collect())
        assert got == want, batch_size


def test_replay_and_empty_batch(spark, tmp_path):
    rows = _rows(spark)
    store = str(tmp_path / "mg")
    mg_store_init(spark, store)
    assert mg_store_append(spark, _df(spark, rows[:100]), store, seq=0)
    before = sorted(tuple(r) for r in mg_store_candidates(spark, store).collect())
    # replayed seq is a no-op: counts stay exact, state unchanged
    assert not mg_store_append(spark, _df(spark, rows[:100]), store, seq=0)
    assert sorted(tuple(r) for r in mg_store_candidates(spark, store).collect()) == before
    # empty batch advances the seq without touching counters
    assert mg_store_append(spark, _df(spark, []), store, seq=1)
    assert sorted(tuple(r) for r in mg_store_candidates(spark, store).collect()) == before
    truth = _true_counts(rows[:100])
    meta = spark.read.parquet(str(tmp_path / "mg" / "meta")).first()
    assert meta["total"] == sum(truth.values()) and meta["seq"] == 1


def test_streaming_foreachbatch_mg(spark, tmp_path):
    """Document micro-batches fold into the MG summary via foreachBatch
    (batch_id as the seq watermark — the epoch-id contract); the recount
    over everything streamed equals the batch query's semantics."""
    import json as _json

    rows = _rows(spark)[:200]
    src = tmp_path / "src"
    src.mkdir()
    store = str(tmp_path / "mg_stream")
    ckpt = str(tmp_path / "ckpt")
    mg_store_init(spark, store)

    def handle(batch_df, batch_id):
        mg_store_append(spark, batch_df, store, seq=batch_id)

    def run_once():
        q = (
            spark.readStream.schema("doc_id long, text string")
            .json(str(src))
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    def dump(path, chunk):
        path.write_text(
            "\n".join(_json.dumps({"doc_id": r.doc_id, "text": r.text}) for r in chunk)
        )

    dump(src / "b1.json", rows[:100])
    run_once()
    dump(src / "b2.json", rows[100:])
    run_once()
    truth = _true_counts(rows)
    cand = {r.word: (r.lb, r.ub) for r in mg_store_candidates(spark, store).collect()}
    assert cand
    for w, (lb, ub) in cand.items():
        assert lb <= truth[w] <= ub
    meta = spark.read.parquet(str(tmp_path / "mg_stream" / "meta")).first()
    assert meta["total"] == sum(truth.values())
