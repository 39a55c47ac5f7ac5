"""Incremental BM25 search index (operators/incremental.py: bm25_index_*):
after ingesting the corpus in ANY batching, both read paths must reproduce
the oracle-checked batch query —

- bm25_index_scan_scored == search_bm25 by construction (the full tf frame
  rebuilt from the index feeds the batch scorer itself);
- bm25_index_search (pruned-probe serving path) == the same top-k, because
  (tf, df, n, avgdl) are maintained exactly and both sides rank on the
  6-dp rounded score with doc_id tie-break;

plus doc_id-idempotent replay, the zero-score tail fill, and
PartitionFilters on the postings probe.
"""

from __future__ import annotations

import re

import pytest

from dblp_to_csv_spark.operators.incremental import (
    _bm25_paths,
    _BM25_POST_SCHEMA,
    bm25_index_append,
    bm25_index_init,
    bm25_index_scan_scored,
    bm25_index_search,
)
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


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize("batch_size", [83, 500])
def test_both_read_paths_equal_batch_query(spark, tmp_path, batch_size):
    from dblp_to_csv_spark.registry import all_queries

    rows = _rows(spark)
    store = str(tmp_path / f"bm25_{batch_size}")
    bm25_index_init(spark, store)
    for i in range(0, len(rows), batch_size):
        assert bm25_index_append(spark, _df(spark, rows[i : i + batch_size]), store)
    want = _sorted(all_queries()["search_bm25"].fn(spark, SF_SMOKE))
    assert _sorted(bm25_index_scan_scored(spark, store)) == want
    assert _sorted(bm25_index_search(spark, store)) == want


def test_replay_is_idempotent(spark, tmp_path):
    rows = _rows(spark)[:120]
    store = str(tmp_path / "bm25_replay")
    bm25_index_init(spark, store)
    assert bm25_index_append(spark, _df(spark, rows[:60]), store) == 60
    assert bm25_index_append(spark, _df(spark, rows[60:]), store) == 60
    want = _sorted(bm25_index_search(spark, store))
    meta_want = tuple(spark.read.parquet(str(tmp_path / "bm25_replay" / "meta")).first())
    assert bm25_index_append(spark, _df(spark, rows[:60]), store) == 0
    assert bm25_index_append(spark, _df(spark, rows[50:70]), store) == 0
    assert _sorted(bm25_index_search(spark, store)) == want
    assert tuple(spark.read.parquet(str(tmp_path / "bm25_replay" / "meta")).first()) == meta_want


def test_zero_score_tail_fill(spark, tmp_path):
    """A query whose terms match almost nothing must fill the tail with
    zero-score docs in doc_id order — the batch ranking's exact tail."""
    store = str(tmp_path / "bm25_fill")
    bm25_index_init(spark, store)
    docs = [(1, "alpha beta"), (2, "beta gamma"), (3, "delta"), (4, "alpha")]
    bm25_index_append(spark, spark.createDataFrame(docs, "doc_id long, text string"), store)
    got = bm25_index_search(spark, store, terms=("alpha",), top=4).collect()
    assert [r.doc_id for r in got[:2]] == [1, 4] or [r.doc_id for r in got[:2]] == [4, 1]
    assert {r.doc_id for r in got} == {1, 2, 3, 4}
    tail = [r for r in got if r.n_terms_matched == 0]
    assert [r.doc_id for r in tail] == [2, 3] and all(r.bm25 == 0.0 for r in tail)


def test_postings_probe_is_partition_pruned(spark, tmp_path):
    from pyspark.sql import functions as F

    rows = _rows(spark)[:100]
    store = str(tmp_path / "bm25_plan")
    bm25_index_init(spark, store)
    bm25_index_append(spark, _df(spark, rows), store)
    post_p, _, _ = _bm25_paths(store)
    probe = (
        spark.read.schema(_BM25_POST_SCHEMA)
        .parquet(post_p)
        .filter(F.col("tb").isin([3, 7]))
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "tb" in m.group(1)


def test_compaction_preserves_search_and_shrinks_files(spark, tmp_path):
    import glob

    from dblp_to_csv_spark.operators.incremental import bm25_index_compact

    rows = _rows(spark)[:200]
    store = str(tmp_path / "bm25_compact")
    bm25_index_init(spark, store)
    for i in range(0, len(rows), 40):
        bm25_index_append(spark, _df(spark, rows[i : i + 40]), store)
    want = _sorted(bm25_index_search(spark, store))
    files_before = len(glob.glob(f"{store}/postings/**/*.parquet", recursive=True))
    bm25_index_compact(spark, store)
    assert _sorted(bm25_index_search(spark, store)) == want
    files_after = len(glob.glob(f"{store}/postings/**/*.parquet", recursive=True))
    assert files_after < files_before
    # appends keep working on the compacted index
    bm25_index_append(spark, _df(spark, _rows(spark)[200:260]), store)
    assert bm25_index_search(spark, store).count() > 0
