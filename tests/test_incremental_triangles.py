"""Incremental triangle maintenance (operators/incremental.py): the
continuous-ingest shape for the graph family. Stateful I/O — the contract
is sequential-appends == batch recompute (third implementation: pure-Python
adjacency intersection), exact-once ownership for triangles closed by
multiple batch edges, duplicate tolerance, and batch-sized-probe plan shape
(PartitionFilters on the store scan)."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from dblp_to_csv_spark.operators.incremental import (
    TRI_STORE_BUCKETS,
    triangle_store_append,
    triangle_store_init,
)
from tests.conftest import SF_SMOKE

_PL_EDGE_SQL = """
    WITH raw AS (
      SELECT ('0x'||substr(md5('pls|'||CAST(l_orderkey AS VARCHAR)||'|'
                 ||CAST(l_linenumber AS VARCHAR)),1,4))::BIGINT AS hs,
             ('0x'||substr(md5('pld|'||CAST(l_orderkey AS VARCHAR)||'|'
                 ||CAST(l_linenumber AS VARCHAR)),1,4))::BIGINT AS hd
      FROM read_parquet('{sf}/lineitem.parquet')
    ), ed AS (
      SELECT LEAST((hs*hs)//1048576,(hd*hd)//1048576) AS u,
             GREATEST((hs*hs)//1048576,(hd*hd)//1048576) AS v
      FROM raw
    )
    SELECT DISTINCT u, v FROM ed WHERE u < v
"""


def _py_triangles(edges) -> int:
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    return sum(len(adj[u] & adj[v]) for u, v in edges) // 3


def _edges_df(spark, rows):
    return spark.createDataFrame([(int(u), int(v)) for u, v in rows], "u long, v long")


def test_sequential_appends_equal_batch_total(spark, tmp_path):
    """Split the sf0.001 power-law edge list into init + 3 uneven batches;
    the rolling total after every append must equal the pure-Python count
    of the graph so far."""
    edges = [
        (u, v)
        for u, v in duckdb.sql(_PL_EDGE_SQL.format(sf=SF_SMOKE)).fetchall()
    ]
    assert len(edges) > 1000
    cuts = [len(edges) // 2, 3 * len(edges) // 4, 7 * len(edges) // 8, len(edges)]
    idx = str(tmp_path / "tri")
    n_e, n_t = triangle_store_init(spark, _edges_df(spark, edges[: cuts[0]]), idx)
    assert n_e == cuts[0]
    assert n_t == _py_triangles(edges[: cuts[0]])
    prev = cuts[0]
    for cut in cuts[1:]:
        added_e, added_t, total = triangle_store_append(
            spark, _edges_df(spark, edges[prev:cut]), idx
        )
        assert added_e == cut - prev
        assert total == _py_triangles(edges[:cut]), (prev, cut)
        prev = cut


def test_multi_new_edge_triangles_counted_once(spark, tmp_path):
    """Ownership discipline: a batch that closes a triangle with TWO new
    edges, and another that inserts all THREE edges of a triangle at once,
    each add exactly one triangle."""
    idx = str(tmp_path / "tri")
    # store: path 1-2, 2-3 (no triangle), plus the edge 4-5
    triangle_store_init(spark, _edges_df(spark, [(1, 2), (2, 3), (4, 5)]), idx)
    # batch closes {1,2,3} with one new edge and {4,5,6} with two new edges
    added_e, added_t, total = triangle_store_append(
        spark, _edges_df(spark, [(1, 3), (4, 6), (5, 6)]), idx
    )
    assert (added_e, added_t, total) == (3, 2, 2)
    # a whole new triangle {7,8,9} in one batch: three new edges, one triangle
    added_e, added_t, total = triangle_store_append(
        spark, _edges_df(spark, [(7, 8), (8, 9), (7, 9)]), idx
    )
    assert (added_e, added_t, total) == (3, 1, 3)


def test_duplicate_and_empty_batches_add_nothing(spark, tmp_path):
    idx = str(tmp_path / "tri")
    triangle_store_init(spark, _edges_df(spark, [(1, 2), (2, 3), (1, 3)]), idx)
    # re-insert existing edges (any orientation), plus an in-batch duplicate
    added_e, added_t, total = triangle_store_append(
        spark, _edges_df(spark, [(2, 1), (1, 2), (3, 1)]), idx
    )
    assert (added_e, added_t, total) == (0, 0, 1)
    added_e, added_t, total = triangle_store_append(
        spark, _edges_df(spark, []), idx
    )
    assert (added_e, added_t, total) == (0, 0, 1)


def test_self_loops_and_reorientation_canonicalized(spark, tmp_path):
    idx = str(tmp_path / "tri")
    n_e, n_t = triangle_store_init(
        spark, _edges_df(spark, [(2, 1), (3, 2), (3, 3)]), idx
    )
    assert (n_e, n_t) == (2, 0)
    added_e, added_t, total = triangle_store_append(
        spark, _edges_df(spark, [(3, 1), (4, 4)]), idx
    )
    assert (added_e, added_t, total) == (1, 1, 1)


def test_store_probe_is_partition_pruned(spark, tmp_path):
    """The scale contract: the append's store scan must prune to the batch
    endpoints' buckets — PartitionFilters on sb, not a full-store read."""
    from pyspark.sql import functions as F

    idx = str(tmp_path / "tri")
    triangle_store_init(
        spark, _edges_df(spark, [(i, i + 1) for i in range(1, 400)]), idx
    )
    import os

    store = spark.read.parquet(os.path.join(idx, "adj"))
    batch_buckets = [7 % TRI_STORE_BUCKETS, 8 % TRI_STORE_BUCKETS]
    pruned = store.filter(F.col("sb").isin(batch_buckets))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "sb" in plan.split("PartitionFilters", 1)[1][:120]


def test_streaming_foreachbatch_incremental_triangles(spark, tmp_path):
    """Production composition: an edge STREAM rolls the triangle total
    forward per microbatch via foreachBatch — the graph family's
    continuous-ingest shape. Totals must match the pure-Python count of
    everything ingested so far at every step."""
    import json as _json

    src = tmp_path / "src"
    src.mkdir()
    idx = str(tmp_path / "tri")
    ckpt = str(tmp_path / "ckpt")
    totals = []

    triangle_store_init(spark, _edges_df(spark, [(1, 2), (2, 3)]), idx)

    def handle(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        _, _, total = triangle_store_append(spark, batch_df, idx)
        totals.append(total)

    def land(name, rows):
        (src / name).write_text(
            "\n".join(_json.dumps({"u": u, "v": v}) for u, v in rows)
        )

    def run_once():
        q = (
            spark.readStream.schema("u long, v long")
            .json(str(src))
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    seen = [(1, 2), (2, 3)]
    land("b1.json", [(1, 3), (3, 4)])
    run_once()
    seen += [(1, 3), (3, 4)]
    assert totals[-1] == _py_triangles(seen) == 1

    land("b2.json", [(1, 4), (2, 4)])
    run_once()
    seen += [(1, 4), (2, 4)]
    assert totals[-1] == _py_triangles(seen) == 4
