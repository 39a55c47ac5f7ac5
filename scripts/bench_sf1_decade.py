"""sf0.1 → sf1 decade probe for the QUERY surface (VERDICT r11 item 4):
the headline set plus the scale-path dedup chain, timed at the driver's
sf0.1 and the 10x key-shifted sf1 from scripts/make_sf1.py. A linear query
should show a ≤ ~10x wall-clock ratio on local[32]; anything super-linear
gets a plan audit entry in BASELINE §21.

The declared-quadratic ground-truth twins (dedup_ngram_jaccard,
embedding_cosine pairs, exact sketch twins) are EXCLUDED by design — they
are verification apparatus with registered banded/sketch scale twins, and
their quadratic growth is the documented contract, not a finding.

Usage: python scripts/make_sf1.py /tmp/sf1 && python scripts/bench_sf1_decade.py
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

OPS = [
    # headline (bench.py's frozen set, minus the quadratic twin)
    "pricing_summary",
    "revenue_by_nation",
    "market_share_by_year",
    "top_orders_by_revenue",
    "broadcast_join_part_agg",
    "window_top_orders_per_customer",
    "tumbling_window_events",
    "array_collapse_returnflags",
    "pipeline_c4_keep",
    "similarity_topk_bruteforce",
    "dedup_minhash_lsh",
    "dedup_simhash",
    # dedup chain, scale paths
    "dedup_exact_documents",
    "dedup_keep_canonical",
    "dedup_connected_components",
    "dedup_cluster_stats",
    "dedup_semantic_semdedup",
    "dedup_substring_rewrite",
    "decontaminate_against_eval",
]


def main() -> None:
    spark = get_spark("sf1probe")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    qs = all_queries()
    print(f"{'query':<34}{'sf0.1':>8}{'sf1':>9}{'ratio':>7}")
    for name in OPS:
        row = []
        for sf in (SF01, SF1):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                qs[name].fn(spark, sf).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            row.append(best)
        print(f"{name:<34}{row[0]:>8.2f}{row[1]:>9.2f}{row[1] / row[0]:>7.1f}")


if __name__ == "__main__":
    main()
