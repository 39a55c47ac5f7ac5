"""Round-12 quiet-window truth probes (VERDICT r11 items 2, 3, 7) at sf0.1.

Two modes, because cold-vs-shared is the whole question for the graph
composite:

* ``cold``  — each named query in its OWN fresh process would be ideal;
  the practical stand-in is a fresh SparkSession artifact cache per query
  (the _ARTIFACT_CACHE is keyed by session id, so a new session pays the
  full edge-derivation bill). Used for graph_report / kcore / LPA.
* ``shared`` — one session, best-of-3 per query (the bench.py regime).
  Used for the lm_bigram / triangle / merge_upsert driver-vs-session
  discrepancy probe.

Numbers land in BASELINE.md §21.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dblp_to_csv_spark.registry import all_queries
from dblp_to_csv_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

SHARED_OPS = [
    "lm_bigram_cross_entropy",
    "graph_triangle_count",
    "merge_upsert_orders",
]
COLD_OPS = ["graph_report", "graph_kcore", "graph_label_propagation"]


def time_best(fn, n=3):
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    qs = all_queries()
    spark = get_spark("r12probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM

    print(f"== shared session, best-of-3, {SF}")
    for name in SHARED_OPS:
        t = time_best(
            lambda: qs[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
        )
        print(f"{name:<32}{t:>9.2f} s")

    print(f"== cold (fresh artifact cache per run), first-run time, {SF}")
    from dblp_to_csv_spark.operators import graph as G

    for name in COLD_OPS:
        times = []
        for _ in range(3):
            G._ARTIFACT_CACHE.clear()
            t0 = time.perf_counter()
            qs[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
            times.append(time.perf_counter() - t0)
        print(f"{name:<32}best {min(times):>7.2f} s   runs {['%.2f' % t for t in times]}")

    print("== shared graph series (artifact cache warm from the cold runs)")
    for name in COLD_OPS:
        t = time_best(
            lambda: qs[name].fn(spark, SF).write.format("noop").mode("overwrite").save()
        )
        print(f"{name:<32}{t:>9.2f} s")


if __name__ == "__main__":
    main()
