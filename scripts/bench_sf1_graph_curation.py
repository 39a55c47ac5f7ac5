"""sf0.1 → sf1 decade probe for the GRAPH and CURATION series (VERDICT r12
item 4 — the r12 probe covered headline + dedup chain only). Measures:

* graph_report COLD (artifact cache cleared — pays edge list + coreness
  fixpoint + triangle table, concurrently);
* graph_triangle_count on BOTH sides of the closing-broadcast gate: at sf1
  the co-occurrence edge list is expected to cross
  _CLOSING_BROADCAST_MAX_EDGES for the first time, so the default run
  exercises the above-gate shuffle degradation and a raised-gate run
  exercises the broadcast path at the same scale;
* graph_kcore / graph_label_propagation (at sf1 the symmetrized edge frame
  should exceed CORENESS_LOCAL_FINISH_EDGES, forcing the distributed
  rounds the in-core finishers replaced at sf0.1);
* pretrain_corpus_report (six composed stages whose 10x interaction was
  unmeasured).

Best-of-2 per point, artifact cache cleared before every run (cold
numbers; the shared-artifact session number is bench.py's *_shared
series). Usage:
    python scripts/make_sf1.py /tmp/sf1 && \
    python scripts/bench_sf1_graph_curation.py [/tmp/sf1]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dblp_to_csv_spark.registry import all_queries
from dblp_to_csv_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"
SF1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"


def _clear() -> None:
    from dblp_to_csv_spark.operators.graph import _ARTIFACT_CACHE

    _ARTIFACT_CACHE.clear()


def timed(fn, runs: int = 2) -> float:
    best = float("inf")
    for _ in range(runs):
        _clear()
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    spark = get_spark("sf1graph")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # calibration denominator (BASELINE §22 reading rule)
    cal = min(
        timed(lambda: spark.range(1_000_000).selectExpr("sum(id)").collect(), 5),
        float("inf"),
    )
    print(f"calibration: {cal:.4f}")

    import dblp_to_csv_spark.operators.graph as G

    qs = all_queries()

    def noop(name, sf):
        qs[name].fn(spark, sf).write.format("noop").mode("overwrite").save()

    # edge counts: which side of the gates is each scale on?
    for sf in (SF01, SF1):
        _clear()
        e = G.copart_edges(spark, sf).count()
        print(f"copart edges {sf}: {e:,} (closing gate "
              f"{G._CLOSING_BROADCAST_MAX_EDGES:,}; und = {2 * e:,} vs "
              f"finisher gate {G.CORENESS_LOCAL_FINISH_EDGES:,})")

    print(f"{'query':<34}{'sf0.1':>8}{'sf1':>9}{'ratio':>7}")
    for name in (
        "graph_report",
        "graph_triangle_count",
        "graph_kcore",
        "graph_label_propagation",
        "pretrain_corpus_report",
    ):
        a = timed(lambda: noop(name, SF01))
        b = timed(lambda: noop(name, SF1))
        print(f"{name:<34}{a:>8.2f}{b:>9.2f}{b / a:>7.1f}")

    # triangle at sf1 on the OTHER side of the closing gate (forced
    # broadcast): raise the gate for this measurement only
    orig = G._CLOSING_BROADCAST_MAX_EDGES
    try:
        G._CLOSING_BROADCAST_MAX_EDGES = 10**12
        b = timed(lambda: noop("graph_triangle_count", SF1))
        print(f"{'graph_triangle_count sf1 FORCED-BROADCAST':<42}{b:>9.2f}")
    finally:
        G._CLOSING_BROADCAST_MAX_EDGES = orig
    spark.stop()


if __name__ == "__main__":
    main()
