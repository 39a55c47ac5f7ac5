"""Scaling curve for the round-9 session-3 operator batch: wall time per
query at sf0.001 / sf0.01 / sf0.1 (10x data steps). Run:

    python scripts/bench_round9_scale.py

Prints one JSON line per (query, sf). Evidence for BASELINE.md: the new
warehouse/stats/pipeline operators must scale sublinearly-in-wall-time
(reduce-first shapes) or linearly (corpus-pass shapes), never worse.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from dblp_to_csv_spark.registry import all_queries
from dblp_to_csv_spark.session import get_spark

QUERIES = [
    "cooccurrence_parts_pmi",
    "histogram_equiwidth_prices",
    "benford_digit_audit",
    "ab_test_mann_whitney",
    "scd2_point_in_time_join",
    "changepoint_cusum_events",
    "rolling_median_hourly",
    "orders_rfm_segments",
    "skipgram_pairs_subsampled",
    "parts_abc_pareto",
]
SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    spark = get_spark("bench-r9-scale")
    qs = all_queries()
    # warm the JVM/readers once so sf0.001 isn't charged the session startup
    qs[QUERIES[0]].fn(spark, SFS[0]).count()
    for name in QUERIES:
        for sf in SFS:
            t0 = time.monotonic()
            n = qs[name].fn(spark, sf).count()
            dt = round(time.monotonic() - t0, 3)
            print(json.dumps({"query": name, "sf": sf.rsplit("sf", 1)[1],
                              "rows": n, "sec": dt}))
            sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
