"""Graph-analytics gates beyond oracle parity: the k-core round-budget
contract (the oracle unrolls KCORE_ROUNDS peels — the budget must stay ≥ 2×
the observed rounds-to-fixpoint so driver testdata regeneration cannot
outrun it), an independent pure-Python fixpoint reference, and plan shape.
"""

from __future__ import annotations

from collections import defaultdict

import duckdb

from dblp_to_csv_spark.operators.graph import KCORE_K, KCORE_ROUNDS
from dblp_to_csv_spark.registry import all_queries
from tests.conftest import SF_CORRECTNESS, SF_SMOKE

_EDGE_SQL = """
    SELECT DISTINCT a.l_partkey AS u, b.l_partkey AS v
    FROM read_parquet('{sf}/lineitem.parquet') a
    JOIN read_parquet('{sf}/lineitem.parquet') b
      ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
"""


def _edges(sf_dir: str) -> list[tuple[int, int]]:
    return duckdb.sql(_EDGE_SQL.format(sf=sf_dir)).fetchall()


def _peel_to_fixpoint(edges, k: int) -> tuple[set, int]:
    """Pure-Python peel: drop nodes with < k surviving neighbors until
    stable. Returns (core node set, rounds until the first no-op round)."""
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    cur = set(adj)
    rounds = 0
    while True:
        nxt = {n for n in cur if len(adj[n] & cur) >= k}
        rounds += 1
        if nxt == cur:
            return cur, rounds
        cur = nxt


def test_kcore_round_budget_has_margin():
    """The unrolled-oracle contract only equals the true k-core while the
    peel converges within KCORE_ROUNDS; pin a 2x margin on the correctness
    corpus so regenerated driver testdata cannot silently outrun it."""
    _, rounds = _peel_to_fixpoint(_edges(SF_CORRECTNESS), KCORE_K)
    assert rounds * 2 <= KCORE_ROUNDS, (
        f"peel took {rounds} rounds; budget {KCORE_ROUNDS} leaves <2x margin"
    )


def test_kcore_matches_python_fixpoint(spark):
    """Spark's early-exit loop must land on the same fixpoint as an
    independent in-memory peel (not the DuckDB oracle — a third
    implementation, so a shared misreading of the recurrence can't pass)."""
    core, _ = _peel_to_fixpoint(_edges(SF_SMOKE), KCORE_K)
    got = {
        r["l_partkey"]
        for r in all_queries()["graph_kcore"].fn(spark, SF_SMOKE).collect()
        if r["in_core"]
    }
    assert got == core


def test_graph_queries_stay_equijoin(spark):
    for name in [
        "graph_clustering_coefficient",
        "graph_kcore",
        "graph_bfs_distances",
        "graph_label_propagation",
    ]:
        df = all_queries()[name].fn(spark, SF_SMOKE)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


def test_adamic_adar_capped_subset_of_exact(spark):
    """Hub capping must only REMOVE score mass: every capped pair exists in
    the exact result with >= the capped common-neighbor count and score.
    Runs at SF_CORRECTNESS — the smoke graph is too sparse to clear
    AA_MIN_COMMON, which would make the containment vacuous."""
    exact = {
        (r["part_a"], r["part_b"]): (r["common_neighbors"], r["aa_score"])
        for r in all_queries()["graph_adamic_adar"]
        .fn(spark, SF_CORRECTNESS)
        .collect()
    }
    capped = (
        all_queries()["graph_adamic_adar_capped"].fn(spark, SF_CORRECTNESS).collect()
    )
    assert exact, "exact pair set empty — threshold too high for this corpus"
    # Vacuity guard: the r1-r8 ABSOLUTE cap fell below the median degree on
    # a testdata regeneration and silently emptied the capped result — the
    # quantile cap must keep the query proving something.
    assert capped, "capped pair set empty — cap quantile too aggressive"
    for r in capped:
        key = (r["part_a"], r["part_b"])
        assert key in exact
        cn, sc = exact[key]
        assert r["common_neighbors"] <= cn
        assert r["aa_score"] <= sc + 1e-9


def test_coreness_shuffle_fallback_equals_broadcast_path(spark):
    """broadcast_nodes=False (the beyond-broadcast-capacity regime: rounds
    fall back to shuffle joins) must produce the identical fixpoint — the
    broadcast hints are a physical-plan choice, never semantics."""
    from dblp_to_csv_spark.operators.graph import (
        copart_und,
        coreness_fixpoint,
    )
    from dblp_to_csv_spark.session import checkpoint_base

    und = copart_und(spark, SF_SMOKE)
    # local_finish_edges=0 on BOTH: this test pins the two DISTRIBUTED
    # round shapes against each other (the in-core finisher is pinned
    # separately below).
    fast = {
        r["n"]: r["cor"]
        for r in coreness_fixpoint(
            spark,
            und,
            checkpoint_base(spark, None, "_corb_"),
            local_finish_edges=0,
        ).collect()
    }
    slow = {
        r["n"]: r["cor"]
        for r in coreness_fixpoint(
            spark,
            und,
            checkpoint_base(spark, None, "_cors_"),
            broadcast_nodes=False,
            local_finish_edges=0,
        ).collect()
    }
    assert fast == slow and fast


def test_coreness_local_finish_equals_distributed(spark):
    """The in-core finisher (whole fixpoint in one applyInPandas task) must
    equal the distributed broadcast rounds — same fixpoint, different
    physical strategy (ROADMAP 25 / VERDICT r10 item 3)."""
    from dblp_to_csv_spark.operators.graph import (
        copart_und,
        coreness_fixpoint,
    )
    from dblp_to_csv_spark.session import checkpoint_base

    und = copart_und(spark, SF_SMOKE)
    local = {
        r["n"]: r["cor"]
        for r in coreness_fixpoint(
            spark, und, checkpoint_base(spark, None, "_corl_")
        ).collect()
    }
    dist = {
        r["n"]: r["cor"]
        for r in coreness_fixpoint(
            spark,
            und,
            checkpoint_base(spark, None, "_cord_"),
            local_finish_edges=0,
        ).collect()
    }
    assert local == dist and local


def test_coreness_local_finish_crafted_graphs(spark):
    """The numpy kernel against the pure-Python fixpoint on graphs with
    known structure: star (core 1), clique (core n-1), path (core 1),
    two cliques bridged (mixed), and a seed-capped start."""
    import pandas as pd

    from dblp_to_csv_spark.operators.graph import (
        _hindex_fixpoint_numpy,
        coreness_fixpoint,
    )
    from dblp_to_csv_spark.session import checkpoint_base

    graphs = {
        "star": [(0, i) for i in range(1, 8)],
        "clique5": [(i, j) for i in range(5) for j in range(i + 1, 5)],
        "path": [(i, i + 1) for i in range(9)],
        "bridged": [(i, j) for i in range(4) for j in range(i + 1, 4)]
        + [(10 + i, 10 + j) for i in range(5) for j in range(i + 1, 5)]
        + [(3, 10)],
    }
    for name, pairs in graphs.items():
        ref, _ = _coreness_fixpoint(pairs)
        import numpy as np

        u = np.array([p[0] for p in pairs] + [p[1] for p in pairs])
        v = np.array([p[1] for p in pairs] + [p[0] for p in pairs])
        nodes, cor = _hindex_fixpoint_numpy(u, v)
        got = dict(zip(nodes.tolist(), cor.tolist()))
        assert got == ref, f"{name}: {got} != {ref}"
        # the full Spark path (gate active -> finisher task) agrees too
        und = spark.createDataFrame(
            pd.DataFrame({"u": u, "v": v})
        )
        rows = coreness_fixpoint(
            spark, und, checkpoint_base(spark, None, f"_cg_{name}_")
        ).collect()
        assert {r["n"]: r["cor"] for r in rows} == ref, name


def test_coreness_local_finish_empty_and_seeded(spark):
    """Degenerates: an empty edge frame yields an empty frame; an explicit
    seed frame (any pointwise upper bound) reaches the same fixpoint."""
    import pandas as pd

    from dblp_to_csv_spark.operators.graph import coreness_fixpoint
    from dblp_to_csv_spark.session import checkpoint_base

    empty = spark.createDataFrame([], "u long, v long")
    assert (
        coreness_fixpoint(
            spark, empty, checkpoint_base(spark, None, "_ce_")
        ).count()
        == 0
    )
    pairs = [(i, j) for i in range(5) for j in range(i + 1, 5)] + [(4, 5)]
    ref, _ = _coreness_fixpoint(pairs)
    und = spark.createDataFrame(
        pd.DataFrame(
            {
                "u": [p[0] for p in pairs] + [p[1] for p in pairs],
                "v": [p[1] for p in pairs] + [p[0] for p in pairs],
            }
        )
    )
    seed = spark.createDataFrame(
        pd.DataFrame({"n": list(ref), "cor": [c + 3 for c in ref.values()]})
    )
    rows = coreness_fixpoint(
        spark, und, checkpoint_base(spark, None, "_cs_"), cor=seed
    ).collect()
    assert {r["n"]: r["cor"] for r in rows} == ref


def test_cc_shuffle_fallback_equals_broadcast_path(spark):
    """Same contract for connected components' broadcast_labels flag."""
    from dblp_to_csv_spark.operators.dedup import (
        connected_components_min_label,
    )

    fast = {
        r["doc_id"]: r["component"]
        for r in connected_components_min_label(spark, SF_SMOKE).collect()
    }
    slow = {
        r["doc_id"]: r["component"]
        for r in connected_components_min_label(
            spark, SF_SMOKE, broadcast_labels=False
        ).collect()
    }
    assert fast == slow and fast


def test_graph_report_equals_standalone_queries(spark):
    """The one-pass composite must be a pure refactoring of the standalone
    queries: per part, graph_report's n_triangles / clustering_coeff /
    coreness / in_core columns equal graph_triangle_count,
    graph_clustering_coefficient, graph_coreness, and graph_kcore run
    independently. 36 s of sf0.1 bench time rests on this invariant
    (VERDICT r8 item 3), so it is pinned, not assumed."""
    q = all_queries()
    report = {
        r["l_partkey"]: r for r in q["graph_report"].fn(spark, SF_SMOKE).collect()
    }
    tri = {
        r["l_partkey"]: r["n_triangles"]
        for r in q["graph_triangle_count"].fn(spark, SF_SMOKE).collect()
    }
    coeff = {
        r["l_partkey"]: r["clustering_coeff"]
        for r in q["graph_clustering_coefficient"].fn(spark, SF_SMOKE).collect()
    }
    cor = {
        r["l_partkey"]: r["coreness"]
        for r in q["graph_coreness"].fn(spark, SF_SMOKE).collect()
    }
    kcore = {
        r["l_partkey"]: r["in_core"]
        for r in q["graph_kcore"].fn(spark, SF_SMOKE).collect()
    }
    assert report and set(report) == set(tri) == set(coeff) == set(cor) == set(kcore)
    for pk, r in report.items():
        assert r["n_triangles"] == tri[pk], pk
        assert abs(r["clustering_coeff"] - coeff[pk]) < 1e-9, pk
        assert r["coreness"] == cor[pk], pk
        assert r["in_core"] == kcore[pk], pk


def _coreness_fixpoint(edges) -> tuple[dict, int]:
    """Pure-Python h-index iteration to fixpoint: (coreness map, rounds)."""
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    cor = {n: len(adj[n]) for n in adj}
    rounds = 0
    while True:
        new = {}
        for n in adj:
            vals = sorted((cor[m] for m in adj[n]), reverse=True)
            h = 0
            for i, c in enumerate(vals, 1):
                if c >= i:
                    h = i
                else:
                    break
            new[n] = h
        rounds += 1
        if new == cor:
            return cor, rounds
        cor = new


def test_coreness_round_budget_has_margin():
    from dblp_to_csv_spark.operators.graph import CORENESS_ROUNDS

    _, rounds = _coreness_fixpoint(_edges(SF_CORRECTNESS))
    assert rounds * 1.5 <= CORENESS_ROUNDS, (
        f"h-index took {rounds} rounds; budget {CORENESS_ROUNDS} < 1.5x margin"
    )


def test_coreness_matches_python_and_kcore(spark):
    """graph_coreness equals the independent in-memory h-index fixpoint,
    and {coreness >= KCORE_K} is exactly graph_kcore's membership — the
    cross-operator invariant tying the two decompositions together."""
    ref, _ = _coreness_fixpoint(_edges(SF_SMOKE))
    rows = all_queries()["graph_coreness"].fn(spark, SF_SMOKE).collect()
    got = {r["l_partkey"]: r["coreness"] for r in rows}
    for n, c in ref.items():
        assert got[n] == c
    core = {
        r["l_partkey"]
        for r in all_queries()["graph_kcore"].fn(spark, SF_SMOKE).collect()
        if r["in_core"]
    }
    assert {n for n, c in got.items() if c >= KCORE_K} == core


def _adj(edges):
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    return adj


def _bfs_fixpoint(edges, n_seeds: int) -> tuple[dict, int]:
    """Independent level-synchronous BFS from the n_seeds smallest node
    ids. Returns (node -> dist, rounds until the frontier emptied)."""
    adj = _adj(edges)
    seeds = sorted(adj)[:n_seeds]
    dist = {s: 0 for s in seeds}
    frontier, rounds = set(seeds), 0
    while frontier:
        rounds += 1
        frontier = {v for u in frontier for v in adj[u] if v not in dist}
        for v in frontier:
            dist[v] = rounds
    return dist, rounds


def _lpa_fixed_rounds(edges, rounds: int) -> dict:
    """Independent synchronous LPA: most-frequent neighbor label, ties to
    the smallest label, exactly ``rounds`` synchronous sweeps."""
    from collections import Counter

    adj = _adj(edges)
    lbl = {n: n for n in adj}
    for _ in range(rounds):
        lbl = {
            n: min(
                Counter(lbl[v] for v in adj[n]).items(),
                key=lambda kv: (-kv[1], kv[0]),
            )[0]
            for n in adj
        }
    return lbl


def test_bfs_matches_python_and_budget_has_margin(spark):
    from dblp_to_csv_spark.operators.graph import BFS_ROUNDS, BFS_SEEDS

    ref, rounds = _bfs_fixpoint(_edges(SF_SMOKE), BFS_SEEDS)
    # Budget contract: the oracle unrolls BFS_ROUNDS levels; driver
    # testdata regeneration must not outrun it (the kcore margin rule).
    assert rounds * 2 <= BFS_ROUNDS, (
        f"BFS emptied in {rounds} rounds; budget {BFS_ROUNDS} < 2x margin"
    )
    rows = all_queries()["graph_bfs_distances"].fn(spark, SF_SMOKE).collect()
    for r in rows:
        assert r["dist"] == ref.get(r["l_partkey"], -1), r


def test_lpa_matches_python(spark):
    from dblp_to_csv_spark.operators.graph import LPA_ROUNDS

    ref = _lpa_fixed_rounds(_edges(SF_SMOKE), LPA_ROUNDS)
    rows = (
        all_queries()["graph_label_propagation"].fn(spark, SF_SMOKE).collect()
    )
    for r in rows:
        assert r["community"] == ref.get(r["l_partkey"], -1), r


def test_coreness_numpy_sort_kernel_equals_matrix_kernel(monkeypatch):
    """The O(m)-memory sort kernel (used when the counting matrix would
    exceed _HINDEX_MATRIX_CELL_CAP) must equal the matrix kernel and the
    pure-Python fixpoint on randomized graphs."""
    import random

    import numpy as np

    from dblp_to_csv_spark.operators import graph as G

    rng = random.Random(11)
    for trial in range(25):
        n_nodes = rng.randint(2, 40)
        pairs = {
            (a, b)
            for _ in range(rng.randint(1, 120))
            for a, b in [sorted(rng.sample(range(n_nodes), 2))]
        }
        pairs = sorted(pairs)
        u = np.array([p[0] for p in pairs] + [p[1] for p in pairs])
        v = np.array([p[1] for p in pairs] + [p[0] for p in pairs])
        ref, _ = _coreness_fixpoint(pairs)
        nodes_m, cor_m = G._hindex_fixpoint_numpy(u, v)
        monkeypatch.setattr(G, "_HINDEX_MATRIX_CELL_CAP", 0)
        nodes_s, cor_s = G._hindex_fixpoint_numpy(u, v)
        monkeypatch.undo()
        assert dict(zip(nodes_m.tolist(), cor_m.tolist())) == ref, trial
        assert dict(zip(nodes_s.tolist(), cor_s.tolist())) == ref, trial


def test_kcore_local_finish_equals_distributed(spark):
    """The k-core in-core finisher (whole peel in one applyInPandas task,
    VERDICT r11 item 3) must equal the distributed broadcast rounds — same
    fixpoint, different physical strategy. With the gate active by default
    at this size, test_kcore_matches_python_fixpoint already pins finisher
    == pure-Python; this pins finisher == distributed."""
    from dblp_to_csv_spark.operators.graph import graph_kcore

    # SF_CORRECTNESS: the smoke corpus's 80-core is empty — the larger
    # slice makes the equality non-vacuous (some True, some False)
    local = {
        r["l_partkey"]: r["in_core"]
        for r in graph_kcore(spark, SF_CORRECTNESS).collect()
    }
    dist = {
        r["l_partkey"]: r["in_core"]
        for r in graph_kcore(
            spark, SF_CORRECTNESS, local_finish_edges=0
        ).collect()
    }
    assert local == dist and any(local.values())


def test_lpa_local_finish_equals_distributed(spark):
    """Same pin for label propagation: one-task numpy rounds == the
    distributed broadcast rounds, label for label."""
    from dblp_to_csv_spark.operators.graph import graph_label_propagation

    local = {
        r["l_partkey"]: r["community"]
        for r in graph_label_propagation(spark, SF_SMOKE).collect()
    }
    dist = {
        r["l_partkey"]: r["community"]
        for r in graph_label_propagation(
            spark, SF_SMOKE, local_finish_edges=0
        ).collect()
    }
    assert local == dist and local


def test_bfs_local_finish_equals_distributed(spark):
    """Same pin for BFS (r14 session 5 finisher): one-task numpy levels ==
    the distributed frontier rounds, distance for distance — including the
    -1 rows for parts outside the graph."""
    from dblp_to_csv_spark.operators.graph import graph_bfs_distances

    local = {
        r["l_partkey"]: r["dist"]
        for r in graph_bfs_distances(spark, SF_SMOKE).collect()
    }
    dist = {
        r["l_partkey"]: r["dist"]
        for r in graph_bfs_distances(
            spark, SF_SMOKE, local_finish_edges=0
        ).collect()
    }
    assert local == dist and any(v > 0 for v in local.values())


def test_bfs_numpy_kernel_crafted_graphs():
    """_bfs_levels_numpy against the pure-Python BFS on graphs with known
    structure, across seed counts and round caps INCLUDING caps below the
    diameter (nodes beyond the cap must be absent, they surface as -1 via
    the final left join)."""
    import numpy as np

    from dblp_to_csv_spark.operators.graph import _bfs_levels_numpy

    graphs = {
        "path": [(i, i + 1) for i in range(9)],
        "star": [(0, i) for i in range(1, 8)],
        "two_components": [(0, 1), (1, 2), (10, 11)],
        "clique_plus_tail": [(i, j) for i in range(4) for j in range(i + 1, 4)]
        + [(3, 8), (8, 9)],
    }
    for name, pairs in graphs.items():
        u = np.array([p[0] for p in pairs] + [p[1] for p in pairs])
        v = np.array([p[1] for p in pairs] + [p[0] for p in pairs])
        for seeds in (1, 2, 4):
            ref, _ = _bfs_fixpoint(pairs, seeds)
            for rounds in (1, 2, 16):
                nodes, dist = _bfs_levels_numpy(u, v, seeds, rounds)
                got = dict(zip(nodes.tolist(), dist.tolist()))
                want = {n: d for n, d in ref.items() if d <= rounds}
                assert got == want, (name, seeds, rounds, got, want)


def test_kcore_and_lpa_numpy_kernels_crafted_graphs():
    """The vectorized kernels against the pure-Python references on graphs
    with known structure (the coreness crafted-graph discipline), k chosen
    so peels actually cut."""
    import numpy as np

    from dblp_to_csv_spark.operators.graph import (
        _kcore_peel_numpy,
        _lpa_rounds_numpy,
    )

    graphs = {
        "star": [(0, i) for i in range(1, 8)],
        "clique5": [(i, j) for i in range(5) for j in range(i + 1, 5)],
        "path": [(i, i + 1) for i in range(9)],
        "bridged": [(i, j) for i in range(4) for j in range(i + 1, 4)]
        + [(10 + i, 10 + j) for i in range(5) for j in range(i + 1, 5)]
        + [(3, 10)],
    }
    for name, pairs in graphs.items():
        u = np.array([p[0] for p in pairs] + [p[1] for p in pairs])
        v = np.array([p[1] for p in pairs] + [p[0] for p in pairs])
        for k in (1, 2, 3, 4):
            ref, _ = _peel_to_fixpoint(pairs, k)
            nodes, alive = _kcore_peel_numpy(u, v, k, 32)
            assert set(nodes[alive].tolist()) == ref, f"{name} k={k}"
        for rounds in (1, 2, 4):
            ref_l = _lpa_fixed_rounds(pairs, rounds)
            nodes, labels = _lpa_rounds_numpy(u, v, rounds)
            got = dict(zip(nodes.tolist(), labels.tolist()))
            assert got == ref_l, f"{name} rounds={rounds}: {got} != {ref_l}"


def test_lpa_kernel_round_paths(monkeypatch):
    """The r14 LPA kernel has three per-round strategies — closed-form
    round 1 (distinct edges: every (u, label) count is 1, argmax = smallest
    neighbor), the dense (n × |labels|) matrix round, and the sort-based
    fallback (multi-edges in round 1, or matrix over _LPA_MATRIX_CELL_CAP).
    All three must produce the labels of a multiplicity-aware pure-Python
    synchronous LPA."""
    from collections import Counter, defaultdict

    import numpy as np

    import dblp_to_csv_spark.operators.graph as G

    def ref_lpa(us, vs, rounds):
        adj = defaultdict(list)  # lists: multi-edges keep multiplicity
        for a, b in zip(us, vs):
            adj[int(a)].append(int(b))
        lbl = {node: node for node in adj}
        for _ in range(rounds):
            lbl = {
                node: min(
                    Counter(lbl[x] for x in nbrs).items(),
                    key=lambda kv: (-kv[1], kv[0]),
                )[0]
                for node, nbrs in adj.items()
            }
        return lbl

    rng = np.random.RandomState(23)
    for trial in range(6):
        nn = rng.randint(5, 120)
        mm = rng.randint(nn, nn * 5)
        uu = rng.randint(0, nn, mm)
        vv = rng.randint(0, nn, mm)
        keep = uu != vv
        uu, vv = uu[keep], vv[keep]
        if trial % 2 == 0 and len(uu) >= 4:
            # inject multi-edges: forces round 1 off the closed form
            uu = np.concatenate([uu, uu[:4]])
            vv = np.concatenate([vv, vv[:4]])
        u = np.concatenate([uu, vv])
        v = np.concatenate([vv, uu])
        for rounds in (1, 2, 4):
            ref = ref_lpa(u, v, rounds)
            nodes, labels = G._lpa_rounds_numpy(u, v, rounds)
            assert dict(zip(nodes.tolist(), labels.tolist())) == ref, (
                f"trial={trial} rounds={rounds}"
            )
            # cap 0 forces the sort-based fallback for EVERY round — the
            # matrix and fallback strategies must agree exactly
            monkeypatch.setattr(G, "_LPA_MATRIX_CELL_CAP", 0)
            nodes_f, labels_f = G._lpa_rounds_numpy(u, v, rounds)
            monkeypatch.undo()
            assert np.array_equal(nodes, nodes_f)
            assert np.array_equal(labels, labels_f), (
                f"fallback diverged: trial={trial} rounds={rounds}"
            )


def _artifact_listing(path):
    """Deterministic snapshot of an artifact directory: every file's
    (relative name, size, mtime_ns). Re-serializing an artifact rewrites
    part files, so any recompute changes the snapshot."""
    import os

    out = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            p = os.path.join(root, f)
            st = os.stat(p)
            out.append((os.path.relpath(p, path), st.st_size, st.st_mtime_ns))
    return sorted(out)


def test_graph_report_warm_path_reuses_artifacts(spark):
    """Artifact-reuse pin (VERDICT r12 item 2): a WARM graph_report — run
    after the session has already materialized the edge list, coreness
    fixpoint, and triangle table — must be a join over the cached parquet
    artifacts, never a re-serialization of the chain. The r12 cold-path
    rework made warm report ~0.8 s at sf0.1 (BASELINE §21/§22); this gate
    makes the property structural so a refactor can't silently pay the
    lineitem self-join / 38-round fixpoint / wedge join again:

    * the artifact cache gains ZERO new entries on the warm run,
    * no artifact parquet file is rewritten (name+size+mtime snapshot),
    * warm wall-clock is a small fraction of cold (generous 0.5x bound
      with a 2 s noise floor — the structural asserts are the real gate).
    """
    import time

    from dblp_to_csv_spark.operators import graph as G

    q = all_queries()
    G._ARTIFACT_CACHE.clear()
    t0 = time.perf_counter()
    q["graph_report"].fn(spark, SF_SMOKE).write.format("noop").mode(
        "overwrite"
    ).save()
    cold = time.perf_counter() - t0

    keys = set(G._ARTIFACT_CACHE)
    assert keys, "cold graph_report must populate the artifact cache"
    snapshots = {p: _artifact_listing(p) for p in G._ARTIFACT_CACHE.values()}

    t0 = time.perf_counter()
    q["graph_report"].fn(spark, SF_SMOKE).write.format("noop").mode(
        "overwrite"
    ).save()
    warm = time.perf_counter() - t0

    assert set(G._ARTIFACT_CACHE) == keys, (
        "warm graph_report materialized NEW artifacts: "
        f"{set(G._ARTIFACT_CACHE) - keys}"
    )
    for path, before in snapshots.items():
        assert _artifact_listing(path) == before, (
            f"warm graph_report re-serialized artifact {path}"
        )
    assert warm <= max(0.5 * cold, 2.0), (
        f"warm graph_report took {warm:.2f}s vs cold {cold:.2f}s — "
        "the warm path should only pay the final joins"
    )


# --- power-law stress graph (ROADMAP 17) -----------------------------------

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


def _pl_edges(sf_dir: str) -> list[tuple[int, int]]:
    return duckdb.sql(_PL_EDGE_SQL.format(sf=sf_dir)).fetchall()


def test_powerlaw_graph_stays_skewed():
    """The whole point of the fixture is hub skew — if a driver testdata
    regeneration ever flattened it, the query would silently stop testing
    the orientation where it matters. Pin max/median degree ≥ 10 and the
    oriented wedge count at least 5× below naive at the correctness SF."""
    edges = _pl_edges(SF_CORRECTNESS)
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    degs = sorted(deg.values())
    med = degs[len(degs) // 2]
    assert max(degs) >= 10 * med, (max(degs), med)
    naive = sum(d * (d - 1) // 2 for d in degs)
    od = defaultdict(int)
    for u, v in edges:
        s = u if (deg[u], u) < (deg[v], v) else v
        od[s] += 1
    oriented = sum(d * (d - 1) // 2 for d in od.values())
    assert 5 * oriented <= naive, (oriented, naive)


def test_powerlaw_oriented_outdegree_bound():
    """The theorem the orientation rests on: under (deg, id) orientation
    every out-degree is ≤ sqrt(2m) (an out-neighbor outranks its source,
    so out-deg > sqrt(2m) would force 2m < sum of degrees). This is the
    O(sqrt(m)) wedge fan-out bound that survives 100× scale-up."""
    edges = _pl_edges(SF_CORRECTNESS)
    m = len(edges)
    deg = defaultdict(int)
    for u, v in edges:
        deg[u] += 1
        deg[v] += 1
    od = defaultdict(int)
    for u, v in edges:
        s = u if (deg[u], u) < (deg[v], v) else v
        od[s] += 1
    assert max(od.values()) <= int((2 * m) ** 0.5) + 1, (max(od.values()), m)


def test_powerlaw_triangles_match_pure_python(spark):
    """Third-implementation pin at sf0.001: adjacency-set intersection
    triangle count agrees with the Spark degree-oriented enumeration
    (the oracle's id-ordered enumeration is the second — parity suite)."""
    edges = _pl_edges(SF_SMOKE)
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    total = sum(len(adj[u] & adj[v]) for u, v in edges) // 3
    row = (
        all_queries()["graph_triangle_powerlaw"]
        .fn(spark, SF_SMOKE)
        .collect()[0]
    )
    assert row["n_triangles"] == total
    assert row["n_edges"] == len(edges)


def test_powerlaw_triangle_stage_stays_equijoin(spark):
    """The heavy stage (wedge generation + closing probe over the hub
    graph) must stay equi-joins; the 1-row summary crossJoins are the
    composite's established tiny-frame shape and are excluded by gating
    the compute frame, not the report frame."""
    from dblp_to_csv_spark.operators.graph import (
        degrees,
        powerlaw_edges,
        triangle_counts,
    )

    e0 = powerlaw_edges(spark, SF_SMOKE)
    tri = triangle_counts(spark, SF_SMOKE, e0=e0, deg=degrees(e0))
    plan = tri._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
