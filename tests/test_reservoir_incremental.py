"""Incremental weighted reservoir (operators/incremental.py:
reservoir_sample_*): min-K over deterministic A-ES priorities is
associative, so the streaming fold must be EXACTLY the batch
sample_weighted_priority over everything appended — any batching,
re-ingests idempotent, K-row state forever."""

from __future__ import annotations

from dblp_to_csv_spark.operators.incremental import (
    RESERVOIR_K,
    reservoir_sample_append,
    reservoir_sample_current,
    reservoir_sample_init,
)
from tests.conftest import SF_SMOKE


def _rows(spark):
    return (
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
        .collect()
    )


def _df(spark, rows):
    return spark.createDataFrame(
        [tuple(r) for r in rows], "doc_id long, lang string, n_chars long"
    )


def _cur(spark, d):
    return [tuple(r) for r in reservoir_sample_current(spark, d).collect()]


def test_sequential_equals_batch_and_rewind_idempotent(spark, tmp_path):
    from dblp_to_csv_spark.registry import all_queries

    rows = _rows(spark)
    d = str(tmp_path / "res")
    reservoir_sample_init(spark, d)
    third = max(1, len(rows) // 3)
    for k in range(0, len(rows), third):
        reservoir_sample_append(spark, _df(spark, rows[k : k + third]), d)
    want = [
        tuple(r)
        for r in all_queries()["sample_weighted_priority"]
        .fn(spark, SF_SMOKE)
        .collect()
    ]
    got = _cur(spark, d)
    assert got == want and len(got) == min(RESERVOIR_K, len(rows))
    # replaying an old batch changes nothing (same doc -> same priority)
    reservoir_sample_append(spark, _df(spark, rows[:third]), d)
    assert _cur(spark, d) == want


def test_batching_invariance(spark, tmp_path):
    rows = _rows(spark)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    reservoir_sample_init(spark, a)
    reservoir_sample_append(spark, _df(spark, rows), a)
    reservoir_sample_init(spark, b)
    for i in range(4):
        reservoir_sample_append(spark, _df(spark, rows[i::4]), b)
    assert _cur(spark, a) == _cur(spark, b)


def test_k_matches_batch_constant(spark):
    from dblp_to_csv_spark.operators.pipeline import WEIGHTED_SAMPLE_K

    assert RESERVOIR_K == WEIGHTED_SAMPLE_K
