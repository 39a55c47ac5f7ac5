"""Measure rounds-to-fixpoint of the synchronous h-index coreness iteration
(Montresor, De Pellegrini & Miorandi 2011 — the graph_coreness shape) and of
the fixed-k peel (graph_kcore) on the driver testdata, to size the
CORENESS_ROUNDS / KCORE_ROUNDS budgets in operators/graph.py.

    python scripts/coreness_rounds_probe.py [sf_dir ...]

Observed on the round-9 testdata: coreness 19 rounds at sf0.01, 38 at
sf0.1; peel(K=80) 6 rounds at both. The budgets must dominate the LARGEST
scale factor the bench runs (sf0.1), not just the driver-correctness one —
a too-small budget silently truncates the iteration, and the mirrored
unrolled-CTE oracle truncates identically, so parity checks cannot catch it.
"""

from __future__ import annotations

import collections
import sys

import duckdb


def h_index(vals: list[int]) -> int:
    best = 0
    for i, c in enumerate(sorted(vals, reverse=True), 1):
        best = max(best, min(i, c))
    return best


def probe(sf_dir: str, k: int = 80) -> None:
    con = duckdb.connect()
    rows = con.execute(f"""
        SELECT DISTINCT a.l_partkey, b.l_partkey
        FROM read_parquet('{sf_dir}/lineitem.parquet') a
        JOIN read_parquet('{sf_dir}/lineitem.parquet') b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    """).fetchall()
    adj: dict[int, set[int]] = collections.defaultdict(set)
    for u, v in rows:
        adj[u].add(v)
        adj[v].add(u)

    cur = set(adj)
    peel_rounds = 0
    while True:
        nxt = {u for u in cur if sum(1 for v in adj[u] if v in cur) >= k}
        peel_rounds += 1
        if nxt == cur:
            break
        cur = nxt

    cor = {u: len(adj[u]) for u in adj}
    cor_rounds = 0
    while True:
        nxt = {u: h_index([cor[v] for v in adj[u]]) for u in adj}
        cor_rounds += 1
        if nxt == cor:
            break
        cor = nxt

    print(
        f"{sf_dir}: nodes={len(adj)} edges={len(rows)} "
        f"kcore_peel_rounds={peel_rounds} coreness_rounds={cor_rounds} "
        f"core_size={len(cur)}"
    )


if __name__ == "__main__":
    for d in sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]:
        probe(d)
