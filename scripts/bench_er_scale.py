"""Scale contract of the incremental ER store: per-batch append cost must be
FLAT as the store grows (bucket-pruned block-index probes + O(batch-matches)
repair), vs re-running the batch golden-record composite per micro-batch,
which re-blocks the whole corpus every time.

Feeds the derived dirty corpus at the given SF through the store in
fixed-size batches (variants-FIRST ordering, so the re-election repair path
stays live throughout) and times every append; then times one
golden_from_dirty over the full corpus as the per-batch cost a
recompute-per-batch design would pay at the END of the stream.

Usage (quiet host, never concurrently with pytest):
    python scripts/bench_er_scale.py [sf_dir] [batch_size]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 250
COMPACT_EVERY = int(sys.argv[3]) if len(sys.argv) > 3 else 0  # 0 = never
WORK = "/tmp/er_scale_store"


def main() -> None:
    from dblp_to_csv_spark.operators.entity_resolution import (
        _dirty_records,
        er_store_append,
        er_store_compact,
        er_store_current,
        er_store_init,
        golden_from_dirty,
    )
    from dblp_to_csv_spark.session import get_spark

    spark = get_spark("erscale")
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

    schema = "record_id long, name string, addr string, phone string, bal double"
    rows = [
        tuple(r)
        for r in _dirty_records(spark, SF)
        .orderBy("record_id", ascending=False)  # variants before bases
        .collect()
    ]
    print(f"dirty corpus: {len(rows)} records from {SF}", flush=True)
    shutil.rmtree(WORK, ignore_errors=True)
    er_store_init(spark, WORK)
    for k, i in enumerate(range(0, len(rows), BATCH)):
        batch = spark.createDataFrame(rows[i : i + BATCH], schema)
        t0 = time.perf_counter()
        stats = er_store_append(spark, batch, WORK)
        dt = time.perf_counter() - t0
        t0 = time.perf_counter()
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        probe = time.perf_counter() - t0
        print(
            f"append store={i:6d} n={stats['ingested']:4d} "
            f"matches={stats['store_matches'] + stats['batch_matches']:4d} "
            f"repaired={stats['repaired']:4d} t={dt:6.2f}s cal={probe:.3f}",
            flush=True,
        )
        if COMPACT_EVERY and (k + 1) % COMPACT_EVERY == 0:
            t0 = time.perf_counter()
            er_store_compact(spark, WORK)
            print(f"compact t={time.perf_counter() - t0:6.2f}s", flush=True)

    t0 = time.perf_counter()
    n_golden = er_store_current(spark, WORK).count()
    print(f"current() goldens={n_golden} t={time.perf_counter() - t0:.2f}s", flush=True)

    full = spark.createDataFrame(rows, schema)
    t0 = time.perf_counter()
    n_batch = golden_from_dirty(full).count()
    print(
        f"batch golden_from_dirty (full corpus) goldens={n_batch} "
        f"t={time.perf_counter() - t0:.2f}s",
        flush=True,
    )
    assert n_golden == n_batch, (n_golden, n_batch)
    print(f"calibration_end: {cal():.4f}", flush=True)
    shutil.rmtree(WORK, ignore_errors=True)


if __name__ == "__main__":
    main()
