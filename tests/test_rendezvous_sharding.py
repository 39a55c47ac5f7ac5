"""Rendezvous (HRW) shard assignment: the minimal-disruption property and
placement balance (operators/pipeline.py::shard_rendezvous_assign)."""

from __future__ import annotations

from dblp_to_csv_spark.operators.pipeline import RENDEZVOUS_NODES
from dblp_to_csv_spark.registry import all_queries

SF = "/root/testdata/sf0.001"


def _result(spark):
    return (
        all_queries()["shard_rendezvous_assign"]
        .fn(spark, SF)
        .toPandas()
        .set_index("node")
    )


def test_drain_moves_only_the_drained_nodes_keys(spark):
    """THE rendezvous guarantee: removing node-7 moves exactly node-7's
    keys — every other node's allocation is untouched (mod-N would move
    (N-1)/N of everything)."""
    out = _result(spark)
    drained = RENDEZVOUS_NODES[-1]
    assert out.loc[drained, "n_moved_on_drain"] == out.loc[drained, "n_docs"]
    others = out.drop(index=drained)
    assert (others["n_moved_on_drain"] == 0).all()


def test_placement_is_roughly_balanced(spark):
    """md5 weights are uniform, so each of the 8 nodes owns ~1/8 of the
    corpus (loose 3x bound — 500 docs over 8 nodes)."""
    out = _result(spark)
    n = out["n_docs"].sum()
    assert set(out.index) <= set(RENDEZVOUS_NODES)
    assert out["n_docs"].max() <= 3 * n / len(RENDEZVOUS_NODES)
    assert out["n_docs"].min() >= n / (3 * len(RENDEZVOUS_NODES))
