"""VERDICT r13 item 4: the incremental decade at 12M edges. The r13
triangle/CC store measurements stop at a 1.2M-edge store where a full
recount still wins (BASELINE §22: crossover "just past sf0.1"); this builds
the stores on the sf1 co-part graph (~12M edges, scripts/make_sf1.py) and
measures append(100) + replay + lookup + one compaction against the full
recount — the regime the flat-append claim actually argues for.

Usage (quiet host, never concurrently with pytest):
    python scripts/make_sf1.py /tmp/sf1      # if not already present
    python scripts/bench_sf1_incremental.py [/tmp/sf1]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
WORK = "/tmp/sf1_inc_stores"


def main() -> None:
    from dblp_to_csv_spark.operators.graph import copart_edges
    from dblp_to_csv_spark.operators.incremental import (
        cc_store_append,
        cc_store_compact,
        cc_store_init,
        cc_store_lookup,
        triangle_store_append,
        triangle_store_init,
    )
    from dblp_to_csv_spark.registry import all_queries
    from dblp_to_csv_spark.session import get_spark

    spark = get_spark("sf1inc")
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

    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK)
    edges = copart_edges(spark, SF1)
    # hold out a deterministic 100-edge batch; the rest seeds the store
    batch_path = os.path.join(WORK, "batch")
    store_edges_path = os.path.join(WORK, "store_edges")
    edges.orderBy("u", "v").limit(100).write.mode("overwrite").parquet(batch_path)
    batch = spark.read.parquet(batch_path)
    edges.join(batch, ["u", "v"], "left_anti").write.mode("overwrite").parquet(
        store_edges_path
    )
    seed = spark.read.parquet(store_edges_path)
    n = seed.count()
    print(f"store edges: {n}", flush=True)

    tri_idx = os.path.join(WORK, "tri")
    t0 = time.perf_counter()
    ne, nt = triangle_store_init(spark, seed, tri_idx)
    print(f"triangle init ({ne} edges, {nt} tri): {time.perf_counter() - t0:.1f}")
    t0 = time.perf_counter()
    ae, at_, tot = triangle_store_append(spark, batch, tri_idx)
    print(
        f"triangle append(100) (+{ae}e +{at_}t = {tot}): "
        f"{time.perf_counter() - t0:.1f}",
        flush=True,
    )
    t0 = time.perf_counter()
    triangle_store_append(spark, batch, tri_idx)  # replay: 0 new edges
    print(f"triangle replay(0 new): {time.perf_counter() - t0:.1f}", flush=True)
    import dblp_to_csv_spark.operators.graph as G

    G._ARTIFACT_CACHE.clear()
    t0 = time.perf_counter()
    all_queries()["graph_triangle_count"].fn(spark, SF1).write.format(
        "noop"
    ).mode("overwrite").save()
    print(f"full recount (graph_triangle_count sf1): {time.perf_counter() - t0:.1f}")
    print(f"calibration_mid: {cal():.4f}", flush=True)

    cc_idx = os.path.join(WORK, "cc")
    t0 = time.perf_counter()
    nn = cc_store_init(spark, seed, cc_idx)
    print(f"cc init ({nn} nodes): {time.perf_counter() - t0:.1f}", flush=True)
    t0 = time.perf_counter()
    new_n, merges, trigger = cc_store_append(spark, batch, cc_idx)
    print(
        f"cc append(100) (+{new_n}n {merges}m trig={trigger}): "
        f"{time.perf_counter() - t0:.1f}",
        flush=True,
    )
    probe = seed.select(F.col("u").alias("node")).distinct().limit(200)
    t0 = time.perf_counter()
    cc_store_lookup(spark, probe, cc_idx).collect()
    print(f"cc lookup(200): {time.perf_counter() - t0:.1f}", flush=True)
    t0 = time.perf_counter()
    rows = cc_store_compact(spark, cc_idx)
    print(f"cc compact ({rows} rows): {time.perf_counter() - t0:.1f}", flush=True)
    print(f"calibration_end: {cal():.4f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
