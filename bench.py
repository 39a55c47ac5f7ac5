"""Benchmark harness: runs the headline queries (registry entries flagged
``bench=True``) at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop sink (full computation of every
column, nothing collected to the driver). AQE is on; configs come from
dblp_to_csv_spark.session.get_spark.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1).rstrip(".")) if m else -1.0

    from dblp_to_csv_spark.registry import bench_queries
    from dblp_to_csv_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM/session so the first measured query isn't paying JIT and
    # session-bootstrap cost that a long-lived cluster would have amortized.
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    # Two runs per query, report the best: the first run pays one-off JIT
    # compilation and (on this shared VM) noisy-neighbor spikes; a long-lived
    # cluster amortizes both, so steady-state is the honest number.
    timings: dict[str, float] = {}
    for name, fn in sorted(bench_queries().items()):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
