"""Process-level query timing for alternated old/new A/B runs (r14 s6).

Usage: PYTHONPATH=<tree> python scripts/ab_proc_queries_r14s6.py q1 q2 ...
Times each named registered query best-of-2 interleaved with a noop sink
(bench methodology) and prints one JSON line with per-query seconds and
the calibration pair.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from dblp_to_csv_spark.registry import all_queries
    from dblp_to_csv_spark.session import get_spark

    spark = get_spark("ab_proc")
    spark.sparkContext.setLogLevel("ERROR")
    for _ in range(3):
        spark.range(1_000_000).selectExpr("sum(id)").collect()

    def cal() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(1_000_000).selectExpr("sum(id)").collect()
            best = min(best, time.perf_counter() - t0)
        return round(best, 4)

    fns = all_queries()
    c0 = cal()
    timings: dict[str, float] = {}
    from dblp_to_csv_spark.operators.graph import _ARTIFACT_CACHE

    for _ in range(2):
        for n in names:
            _ARTIFACT_CACHE.clear()  # bench.py cold-series methodology
            t0 = time.perf_counter()
            fns[n].fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            timings[n] = min(timings.get(n, float("inf")), dt)
    c1 = cal()
    print(json.dumps({"tree": os.environ.get("PYTHONPATH", "cwd"),
                      "cal": [c0, c1],
                      "queries": {n: round(t, 3) for n, t in timings.items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
