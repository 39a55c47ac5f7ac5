"""Scale contract of the incremental BM25 index: append cost flat in store
size (tokenize-once + partitioned appends + 1-row meta fold), and SEARCH
cost flat in store size up to true posting-list growth (the probed buckets
are the only reads — df for common terms grows with the corpus, which is
the data's own Zipf, not an index defect).

Feeds the documents table through the index in fixed-size batches, timing
every append and a search after each; one batch-query run at the end is
the per-search cost a scan-per-search design pays.

Usage (quiet host, never concurrently with pytest):
    python scripts/bench_bm25_scale.py [sf_dir] [batch_size] [compact_every]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 500
COMPACT_EVERY = int(sys.argv[3]) if len(sys.argv) > 3 else 0
WORK = "/tmp/bm25_scale_store"


def main() -> None:
    from dblp_to_csv_spark.operators.incremental import (
        bm25_index_append,
        bm25_index_compact,
        bm25_index_init,
        bm25_index_search,
    )
    from dblp_to_csv_spark.session import get_spark

    spark = get_spark("bm25scale")
    spark.sparkContext.setLogLevel("ERROR")

    def cal() -> float:
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            spark.range(1_000_000).selectExpr("sum(id)").collect()
            best = min(best, time.perf_counter() - t0)
        return best

    for _ in range(3):
        spark.range(1_000_000).selectExpr("sum(id)").collect()
    print(f"calibration_start: {cal():.4f}", flush=True)

    rows = [
        tuple(r)
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text")
        .orderBy("doc_id")
        .collect()
    ]
    print(f"corpus: {len(rows)} docs from {SF}", flush=True)
    shutil.rmtree(WORK, ignore_errors=True)
    bm25_index_init(spark, WORK)
    schema = "doc_id long, text string"
    for k, i in enumerate(range(0, len(rows), BATCH)):
        batch = spark.createDataFrame(rows[i : i + BATCH], schema)
        t0 = time.perf_counter()
        n = bm25_index_append(spark, batch, WORK)
        t_app = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_hits = bm25_index_search(spark, WORK).count()
        t_srch = time.perf_counter() - t0
        t0 = time.perf_counter()
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        probe = time.perf_counter() - t0
        print(
            f"append store={i:7d} n={n:5d} t={t_app:6.2f}s "
            f"search hits={n_hits} t={t_srch:5.2f}s cal={probe:.3f}",
            flush=True,
        )
        if COMPACT_EVERY and (k + 1) % COMPACT_EVERY == 0:
            t0 = time.perf_counter()
            bm25_index_compact(spark, WORK)
            print(f"compact t={time.perf_counter() - t0:6.2f}s", flush=True)

    from dblp_to_csv_spark.registry import all_queries

    t0 = time.perf_counter()
    n_batch = all_queries()["search_bm25"].fn(spark, SF).count()
    print(
        f"batch search_bm25 (corpus rescan) rows={n_batch} "
        f"t={time.perf_counter() - t0:.2f}s",
        flush=True,
    )
    print(f"calibration_end: {cal():.4f}", flush=True)
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
