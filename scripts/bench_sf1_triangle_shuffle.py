"""Follow-up to bench_sf1_graph_curation.py: the sf1 co-part edge list
came in at 11.96M rows — still BELOW _CLOSING_BROADCAST_MAX_EDGES (30M),
so the probe's default run already exercises the broadcast side and its
"forced broadcast" leg duplicates it. The missing measurement is the
ABOVE-GATE degradation path (shuffle join on the closing probe), which a
100 TB corpus would hit. Force it by LOWERING the gate below the sf1
edge count for this measurement only.

Usage: python scripts/bench_sf1_triangle_shuffle.py [/tmp/sf1]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dblp_to_csv_spark.registry import all_queries
from dblp_to_csv_spark.session import get_spark

SF1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"


def main() -> None:
    import dblp_to_csv_spark.operators.graph as G

    spark = get_spark("sf1tri")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    cal = min(
        min(
            (lambda t0: (spark.range(1_000_000).selectExpr("sum(id)").collect(), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(5)
        ),
        float("inf"),
    )
    print(f"calibration: {cal:.4f}")

    qs = all_queries()

    def run() -> float:
        G._ARTIFACT_CACHE.clear()
        t0 = time.perf_counter()
        qs["graph_triangle_count"].fn(spark, SF1).write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    orig = G._CLOSING_BROADCAST_MAX_EDGES
    try:
        G._CLOSING_BROADCAST_MAX_EDGES = 1_000_000  # below sf1's 11.96M
        a = min(run(), run())
        print(f"triangle sf1 FORCED-SHUFFLE (gate=1M): {a:.2f}")
    finally:
        G._CLOSING_BROADCAST_MAX_EDGES = orig
    spark.stop()


if __name__ == "__main__":
    main()
