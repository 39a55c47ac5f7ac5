"""Degenerate-input guards (r2 ADVICE closures): MAD = 0 must yield zero
outliers on both engines instead of diverging/erroring, and the BLAS top-k
must survive an empty query set and zero-row Arrow batches."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from dblp_to_csv_spark.registry import all_queries


def _entry(name):
    return all_queries()[name]


@pytest.fixture()
def degenerate_sf(tmp_path):
    """A sf_dir whose orders all share one o_totalprice (MAD = 0) and whose
    embeddings table is EMPTY (no query vectors, no corpus)."""
    pd.DataFrame(
        {"o_orderkey": [1, 2, 3, 4], "o_totalprice": [100.0] * 4}
    ).to_parquet(tmp_path / "orders.parquet")
    import pyarrow as pa
    import pyarrow.parquet as pq

    empty = pa.table(
        {
            "vec_id": pa.array([], type=pa.int64()),
            "embedding": pa.array([], type=pa.list_(pa.float64())),
        }
    )
    pq.write_table(empty, tmp_path / "embeddings.parquet")
    return str(tmp_path)


def test_mad_zero_yields_no_outliers_spark(spark, degenerate_sf):
    entry = _entry("outliers_by_mad")
    assert entry.fn(spark, degenerate_sf).count() == 0


def test_mad_zero_yields_no_outliers_oracle(degenerate_sf):
    entry = _entry("outliers_by_mad")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM "
        f"read_parquet('{degenerate_sf}/orders.parquet')"
    )
    assert len(con.execute(entry.oracle).fetchall()) == 0


def test_blas_topk_empty_query_set(spark, degenerate_sf):
    entry = _entry("similarity_topk_blas")
    df = entry.fn(spark, degenerate_sf)
    assert df.count() == 0
    assert df.columns == ["query_id", "neighbor_id", "cos_sim", "rank"]


def test_blas_topk_corpus_smaller_than_batch(spark, tmp_path):
    """3 query vectors, 1 extra corpus vector — exercises the scoring path
    with tiny/ragged Arrow batches (some partitions empty on local[8])."""
    vecs = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0], [2.0, 0.0]]
    pd.DataFrame({"vec_id": [0, 1, 2, 100], "embedding": vecs}).to_parquet(
        tmp_path / "embeddings.parquet"
    )
    entry = _entry("similarity_topk_blas")
    rows = entry.fn(spark, str(tmp_path)).collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    top = {r["neighbor_id"] for r in rows if r["query_id"] == 0 and r["rank"] == 1}
    assert top == {100}  # colinear with query 0 → cos=1.0 beats the others
