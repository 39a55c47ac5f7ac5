"""Scale contract of the continuous-ingest admission store: per-batch
append cost must be FLAT as the store grows (signals once per doc +
bucket-pruned probes), vs re-running the batch flagship per micro-batch,
which re-scans the whole corpus every time.

Feeds the sf0.01 documents table (500 docs) through the store in
fixed-size batches and times every append; then times one
pretrain_corpus_report over the full corpus as the per-batch cost a
recompute-per-batch design would pay at the END of the stream (and it
keeps growing from there).

Usage (quiet host, never concurrently with pytest):
    python scripts/bench_admission_scale.py [sf_dir] [batch_size]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 50
WORK = "/tmp/adm_scale_store"


def main() -> None:
    from dblp_to_csv_spark.operators.admission_incremental import (
        pretrain_report_append,
        pretrain_report_init,
    )
    from dblp_to_csv_spark.operators.curation import pretrain_corpus_report
    from dblp_to_csv_spark.session import get_spark

    spark = get_spark("admscale")
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

    rows = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .orderBy("doc_id")
        .collect()
    )
    shutil.rmtree(WORK, ignore_errors=True)
    idx = os.path.join(WORK, "store")
    stg = os.path.join(WORK, "stage")
    pretrain_report_init(spark, idx)
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    for i in range(0, len(rows), BATCH):
        chunk = [tuple(r) for r in rows[i : i + BATCH]]
        t0 = time.perf_counter()
        stats = pretrain_report_append(
            spark, spark.createDataFrame(chunk, schema), idx, staging_dir=stg
        )
        print(
            f"append batch {i // BATCH + 1} (store={i} docs): "
            f"{time.perf_counter() - t0:.1f} s  "
            f"(dirty={stats['verdicts_written']}, nd_repair={stats['nd_repair']})",
            flush=True,
        )
    t0 = time.perf_counter()
    pretrain_corpus_report(spark, SF).write.format("noop").mode(
        "overwrite"
    ).save()
    print(f"batch flagship over full corpus: {time.perf_counter() - t0:.1f} s")
    print(f"calibration_end: {cal():.4f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
