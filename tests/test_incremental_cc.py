"""Incremental connected components (operators/incremental.py): the
clustering stage of the streaming near-dup chain. Contracts: sequential
appends resolve to the SAME min-node-id roots as the oracle-checked batch
union-find; merges across batches relabel lazily through the merge map;
compaction changes no lookup result and empties the map; probes prune to
the queried buckets."""

from __future__ import annotations

from collections import defaultdict

import duckdb

from dblp_to_csv_spark.operators.incremental import (
    CC_STORE_BUCKETS,
    cc_store_append,
    cc_store_compact,
    cc_store_init,
    cc_store_lookup,
)
from tests.conftest import SF_SMOKE

_EDGE_SQL = """
    SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
    FROM read_parquet('{sf}/lineitem.parquet') a
    JOIN read_parquet('{sf}/lineitem.parquet') b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""


def _py_components(edges) -> dict:
    """Min-node-id root per node — the batch operator's exact contract."""
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent.setdefault(u, u)
        parent.setdefault(v, v)
        ru, rv = find(u), find(v)
        if ru != rv:
            if rv < ru:
                ru, rv = rv, ru
            parent[rv] = ru
    return {n: find(n) for n in parent}


def _edges_df(spark, rows):
    return spark.createDataFrame(
        [(int(u), int(v)) for u, v in rows], "u long, v long"
    )


def _nodes_df(spark, nodes):
    return spark.createDataFrame([(int(n),) for n in nodes], "node long")


def _lookup(spark, idx, nodes) -> dict:
    return {
        r["node"]: r["component"]
        for r in cc_store_lookup(spark, _nodes_df(spark, nodes), idx).collect()
    }


def test_sequential_appends_match_batch_roots(spark, tmp_path):
    edges = duckdb.sql(_EDGE_SQL.format(sf=SF_SMOKE)).fetchall()
    assert len(edges) > 2000
    cuts = [len(edges) // 3, 2 * len(edges) // 3, len(edges)]
    idx = str(tmp_path / "cc")
    cc_store_init(spark, _edges_df(spark, edges[: cuts[0]]), idx)
    prev = cuts[0]
    for cut in cuts[1:]:
        cc_store_append(spark, _edges_df(spark, edges[prev:cut]), idx)
        prev = cut
    want = _py_components(edges)
    got = _lookup(spark, idx, sorted(want))
    assert got == want


def test_cross_batch_merge_and_min_root_relabel(spark, tmp_path):
    idx = str(tmp_path / "cc")
    # two separate components rooted at 10 and 20
    cc_store_init(spark, _edges_df(spark, [(10, 11), (20, 21)]), idx)
    # bridge them: root becomes the global min 10, recorded as a merge
    new_nodes, merges, _ = cc_store_append(
        spark, _edges_df(spark, [(11, 21)]), idx
    )
    assert (new_nodes, merges) == (0, 1)
    assert _lookup(spark, idx, [10, 11, 20, 21]) == {
        10: 10, 11: 10, 20: 10, 21: 10
    }
    # a NEW node smaller than the existing root relabels the whole
    # component via a merge entry, never a member rewrite
    new_nodes, merges, _ = cc_store_append(
        spark, _edges_df(spark, [(5, 20)]), idx
    )
    assert (new_nodes, merges) == (1, 1)
    assert _lookup(spark, idx, [5, 10, 11, 20, 21]) == {
        5: 5, 10: 5, 11: 5, 20: 5, 21: 5
    }


def test_duplicates_empty_and_untracked(spark, tmp_path):
    idx = str(tmp_path / "cc")
    cc_store_init(spark, _edges_df(spark, [(1, 2)]), idx)
    assert cc_store_append(spark, _edges_df(spark, [(2, 1), (1, 2)]), idx) == (
        0,
        0,
        False,
    )
    assert cc_store_append(spark, _edges_df(spark, []), idx) == (0, 0, False)
    # untracked nodes are their own component (batch singleton convention)
    assert _lookup(spark, idx, [1, 2, 99]) == {1: 1, 2: 1, 99: 99}


def test_compaction_preserves_lookups_and_empties_map(spark, tmp_path):
    import os

    idx = str(tmp_path / "cc")
    # chain merges to build up a multi-hop merge map: 1-2, 3-4, 5-6 then
    # bridge 2-3 (4's root -> 1), then 4-5 (6's root -> 1)
    cc_store_init(spark, _edges_df(spark, [(1, 2), (3, 4), (5, 6)]), idx)
    cc_store_append(spark, _edges_df(spark, [(2, 3)]), idx)
    _, merges, fired = cc_store_append(spark, _edges_df(spark, [(4, 5)]), idx)
    assert merges == 1 and fired  # 2 merge events vs 6 nodes >= 25%
    before = _lookup(spark, idx, [1, 2, 3, 4, 5, 6])
    assert set(before.values()) == {1}
    n = cc_store_compact(spark, idx)
    assert n == 6
    assert _lookup(spark, idx, [1, 2, 3, 4, 5, 6]) == before
    assert (
        spark.read.parquet(os.path.join(idx, "merges")).count() == 0
    )
    # appends keep working after compaction
    _, merges, _ = cc_store_append(spark, _edges_df(spark, [(0, 6)]), idx)
    assert merges == 1
    assert _lookup(spark, idx, [0, 3])[3] == 0


def test_membership_probe_is_partition_pruned(spark, tmp_path):
    import os

    from pyspark.sql import functions as F

    idx = str(tmp_path / "cc")
    cc_store_init(
        spark, _edges_df(spark, [(i, i + 1000) for i in range(1, 500)]), idx
    )
    mem = spark.read.parquet(os.path.join(idx, "members"))
    pruned = mem.filter(F.col("nb").isin([7 % CC_STORE_BUCKETS]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "nb" in plan.split("PartitionFilters", 1)[1][:120]


def test_streaming_foreachbatch_incremental_cc(spark, tmp_path):
    """The end-to-end streaming near-dup clustering shape: candidate-pair
    batches fold into the persistent component store via foreachBatch."""
    import json as _json

    src = tmp_path / "src"
    src.mkdir()
    idx = str(tmp_path / "cc")
    ckpt = str(tmp_path / "ckpt")
    cc_store_init(spark, _edges_df(spark, [(100, 101)]), idx)

    def handle(batch_df, batch_id):
        if batch_df.isEmpty():
            return
        cc_store_append(spark, batch_df, idx)

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

    (src / "b1.json").write_text(
        "\n".join(_json.dumps({"u": u, "v": v}) for u, v in [(101, 102), (200, 201)])
    )
    run_once()
    (src / "b2.json").write_text(_json.dumps({"u": 102, "v": 200}))
    run_once()
    assert _lookup(spark, idx, [100, 101, 102, 200, 201]) == {
        100: 100, 101: 100, 102: 100, 200: 100, 201: 100
    }


# --- end-to-end: streaming near-dup clustering -----------------------------

TEXT_A = "the quick brown fox jumps over the lazy dog near the river bank today"
TEXT_A_NEAR = (
    "the quick brown fox jumps over the lazy dog near the river bank tonight"
)
TEXT_A_NEAR2 = (
    "a quick brown fox jumps over the lazy dog near the river bank today"
)
TEXT_B = "completely different content about spark shuffles and partition pruning"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_streaming_near_dup_clustering_end_to_end(spark, tmp_path):
    """The full chain: per-batch minhash_pairs_incremental (signatures →
    banded candidates → signature-estimate verify, against history and
    in-batch) feeds cc_store_append. Cluster assignments must be
    batching-invariant: three sequential batches == one big batch."""
    from dblp_to_csv_spark.operators.incremental import (
        minhash_pairs_incremental,
    )

    batches = [
        [(1, TEXT_A), (2, TEXT_B)],
        [(3, TEXT_A_NEAR)],
        [(4, TEXT_A_NEAR2), (5, TEXT_B + " appended words here")],
    ]

    def run(splits, tag):
        mh = str(tmp_path / f"mh_{tag}")
        cc = str(tmp_path / f"cc_{tag}")
        cc_store_init(spark, _edges_df(spark, []), cc)
        for i, batch in enumerate(splits):
            pairs = minhash_pairs_incremental(
                spark,
                _docs(spark, batch),
                mh,
                staging_dir=str(tmp_path / f"s_{tag}_{i}"),
            ).select(F_col("doc_a").alias("u"), F_col("doc_b").alias("v"))
            cc_store_append(spark, pairs, cc)
        return _lookup(spark, cc, [1, 2, 3, 4, 5])

    from pyspark.sql.functions import col as F_col

    seq = run(batches, "seq")
    big = run([[d for b in batches for d in b]], "big")
    assert seq == big
    # the A-family clusters together under root 1; B stays apart
    assert seq[1] == seq[3] == seq[4] == 1
    assert seq[2] != 1


def test_reingested_doc_no_self_pair_no_duplicate_index(spark, tmp_path):
    """ADVICE r13: a doc_id already in the index, re-ingested in a later
    batch, must not emit a (doc, doc) self-pair (its own signature matches
    at estimate 1.0) and must not re-append its bands as duplicate index
    rows. It must still LINK normally: a later near-dup of the re-ingested
    doc finds it once."""
    from pyspark.sql.functions import col

    from dblp_to_csv_spark.operators.incremental import (
        minhash_pairs_incremental,
    )

    mh = str(tmp_path / "mh")
    p1 = minhash_pairs_incremental(
        spark, _docs(spark, [(1, TEXT_A), (2, TEXT_B)]), mh,
        staging_dir=str(tmp_path / "s1"),
    )
    assert p1.count() == 0
    index_rows_before = spark.read.parquet(mh).count()
    # batch 2 re-ingests doc 1 verbatim
    p2 = minhash_pairs_incremental(
        spark, _docs(spark, [(1, TEXT_A)]), mh, staging_dir=str(tmp_path / "s2")
    )
    assert p2.count() == 0, p2.collect()  # no self-pair
    assert spark.read.parquet(mh).count() == index_rows_before  # no dup rows
    # batch 3: a near-dup of doc 1 still links, exactly one pair per doc
    p3 = minhash_pairs_incremental(
        spark, _docs(spark, [(7, TEXT_A_NEAR)]), mh,
        staging_dir=str(tmp_path / "s3"),
    )
    rows = {(r["doc_a"], r["doc_b"]) for r in p3.collect()}
    assert rows == {(1, 7)}, rows
    assert p3.filter(col("doc_a") == col("doc_b")).count() == 0


# --- property: batch-split invariance on random graphs ----------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@st.composite
def random_edges_and_split(draw):
    n_edges = draw(st.integers(min_value=1, max_value=18))
    edges = [
        (
            draw(st.integers(min_value=0, max_value=9)),
            draw(st.integers(min_value=0, max_value=9)),
        )
        for _ in range(n_edges)
    ]
    edges = [(u, v) for u, v in edges if u != v]
    if not edges:
        edges = [(0, 1)]
    batch_of = [draw(st.integers(0, 2)) for _ in edges]
    batches = [
        [e for e, b in zip(edges, batch_of) if b == k] for k in range(3)
    ]
    return edges, [b for b in batches if b]


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=random_edges_and_split())
def test_cc_store_split_invariance_property(spark, tmp_path_factory, data):
    """For ANY random multigraph and ANY split into sequential batches,
    the store's resolved roots equal the pure-Python min-root union-find
    over the whole edge list — duplicate edges, re-orientations, hub
    collisions, and cross-batch merge chains included."""
    edges, batches = data
    base = tmp_path_factory.mktemp("cc_prop")
    idx = str(base / "cc")
    cc_store_init(spark, _edges_df(spark, batches[0]), idx)
    for batch in batches[1:]:
        cc_store_append(spark, _edges_df(spark, batch), idx)
    want = _py_components(edges)
    assert _lookup(spark, idx, sorted(want)) == want
