"""Connected-components parity + round-count tests, as promised by the
docstrings of ``star_contraction_components`` and
``dedup_connected_components_star`` (operators/dedup.py).

Two claims under test:

1. **Parity**: large-star/small-star contraction produces the SAME
   (doc_id → min-reachable-label) mapping as min-label propagation, both on
   a synthetic graph with known components and on the real MinHash-LSH pair
   graph of the sf0.001 documents corpus.
2. **Round count**: on a 64-node path graph (diameter 63 — min-label's
   pathological case), star contraction converges in O(log n) ≈ 6-8 rounds,
   not O(diameter).
"""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from dblp_to_csv_spark.operators.dedup import (
    connected_components_min_label,
    dedup_connected_components_star,
    star_contraction_components,
)

from tests.conftest import SF_SMOKE


def _star_labels(spark, edges):
    with tempfile.TemporaryDirectory(prefix="cc_star_") as base:
        labels, rounds = star_contraction_components(spark, edges, base)
        rows = {r["doc_id"]: r["component"] for r in labels.collect()}
    return rows, rounds


def test_star_path_graph_log_rounds(spark):
    """64-node path 0-1-2-...-63: one component, min label 0 everywhere.
    Star contraction must converge in O(log n) rounds (docstring claims ~6;
    allow <=8 slack), far below the 63 rounds min-label propagation needs."""
    edges = spark.range(63).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    labels, rounds = _star_labels(spark, edges)
    assert labels == {i: 0 for i in range(64)}
    assert rounds <= 8, f"expected O(log 64) rounds, got {rounds}"


def test_star_multiple_components_and_self_loops(spark):
    """Three components (a triangle, a 2-chain, an isolated self-loop) plus
    a duplicate + reversed edge — labels must be each component's minimum."""
    raw = [(1, 2), (2, 3), (3, 1), (10, 11), (20, 20), (2, 1), (11, 10)]
    edges = spark.createDataFrame(raw, "src long, dst long")
    labels, _ = _star_labels(spark, edges)
    assert labels == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_star_empty_edges(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    labels, _ = _star_labels(spark, edges)
    assert labels == {}


def test_star_minlabel_parity_on_corpus(spark):
    """Both implementations, run on the real MinHash-LSH pair graph of the
    sf0.001 documents corpus, must emit identical label mappings."""
    star = {
        (r["doc_id"], r["component"])
        for r in dedup_connected_components_star(spark, SF_SMOKE).collect()
    }
    minlabel = {
        (r["doc_id"], r["component"])
        for r in connected_components_min_label(spark, SF_SMOKE).collect()
    }
    assert star == minlabel
    assert len(star) > 0, "fixture corpus should contain near-dup pairs"


@pytest.mark.parametrize("n", [2, 5, 16])
def test_star_parity_random_graphs(spark, n):
    """Deterministic pseudo-random graphs of n*4 nodes: star labels must
    equal a driver-side union-find ground truth."""
    nodes = n * 4
    raw = [((i * 7 + 3) % nodes, (i * 13 + 5) % nodes) for i in range(n * 3)]
    raw = [(a, b) for a, b in raw if a != b]

    parent = list(range(nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in raw:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {v for e in raw for v in e}
    truth = {v: find(v) for v in touched}

    edges = spark.createDataFrame(raw, "src long, dst long")
    labels, _ = _star_labels(spark, edges)
    assert labels == truth


def test_pagerank_fixed_point_matches_python_reference(spark, tmp_path):
    """Independent pure-Python fixed-point PageRank over a crafted graph
    (a K3 near-dup clique + one isolated doc) must equal the operator's
    output exactly — integer arithmetic leaves no tolerance to hide in."""
    import pandas as pd

    from dblp_to_csv_spark.operators.dedup import (
        PR_ITERS,
        PR_SCALE,
        dedup_graph_pagerank,
        minhash_lsh_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog again and again ok"
    texts = [f"{base} copy"] * 3 + [
        "completely different text about spark query planning and shuffles"
    ]
    pd.DataFrame({"doc_id": range(4), "text": texts}).to_parquet(
        tmp_path / "documents.parquet"
    )
    # ground-truth edge list from the oracle-checked pair operator
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(spark, str(tmp_path)).collect()
    ]
    assert sorted(pairs) == [(0, 1), (0, 2), (1, 2)]  # the K3 clique
    edges: dict[int, list[int]] = {}
    for a, b in pairs:
        edges.setdefault(a, []).append(b)
        edges.setdefault(b, []).append(a)
    n = 4
    p = {d: PR_SCALE // n for d in range(n)}
    for _ in range(PR_ITERS):
        inflow = {d: 0 for d in range(n)}
        for u, outs in edges.items():
            share = p[u] // len(outs)
            for v in outs:
                inflow[v] += share
        p = {
            d: (3 * PR_SCALE) // (20 * n) + (17 * inflow[d]) // 20
            for d in range(n)
        }
    got = {
        r["doc_id"]: r["pr_fixed"]
        for r in dedup_graph_pagerank(spark, str(tmp_path)).collect()
    }
    assert got == p
    # clique members outrank the isolated doc, which sits at the floor
    assert got[3] == (3 * PR_SCALE) // (20 * 4)
    assert min(got[0], got[1], got[2]) > got[3]


def test_cc_local_finish_equals_distributed_minlabel(spark):
    """The union-find in-core finisher (default under CC_LOCAL_FINISH_PAIRS)
    must equal the forced-distributed min-label rounds on the real sf0.001
    pair graph — same (doc_id -> min component label) contract, different
    physical strategy."""
    local = {
        (r["doc_id"], r["component"])
        for r in connected_components_min_label(spark, SF_SMOKE).collect()
    }
    dist = {
        (r["doc_id"], r["component"])
        for r in connected_components_min_label(
            spark, SF_SMOKE, local_finish_pairs=0
        ).collect()
    }
    assert local == dist and local


def test_cc_union_find_kernel_min_label_contract():
    """Driver-free kernel check: path, two components, self-loop, and
    min-root union ordering."""
    import pandas as pd

    from dblp_to_csv_spark.operators.dedup import _union_find_components

    pairs = pd.DataFrame(
        {
            # path 5-4-3-9 (min 3), pair (20,21) (min 20), self-loop 30
            "doc_a": [5, 4, 9, 21, 30],
            "doc_b": [4, 3, 3, 20, 30],
        }
    )
    out = _union_find_components(pairs)
    got = dict(zip(out["doc_id"], out["component"]))
    assert got == {5: 3, 4: 3, 3: 3, 9: 3, 21: 20, 20: 20, 30: 30}
