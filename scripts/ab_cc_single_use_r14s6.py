"""Interleaved A/B: dedup_cluster_stats / dedup_keep_canonical — old
(materialized labels_local checkpoint + counted broadcast hint) vs new
(single-use lazy union-find + gate-proven broadcast; r14 session 6).
Order alternates per round."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from dblp_to_csv_spark.operators.curation import (
    _cluster_stats_from_labels,
    _kept_docs_from_labels,
    dedup_cluster_stats as new_stats,
    dedup_keep_canonical as new_keep,
)
from dblp_to_csv_spark.operators.dedup import connected_components_min_label
from dblp_to_csv_spark.sources.tables import load_table
from dblp_to_csv_spark.session import get_spark


def old_stats(spark, sf_dir):
    labels = connected_components_min_label(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    return _cluster_stats_from_labels(labels, docs)


def old_keep(spark, sf_dir):
    labels = connected_components_min_label(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    return _kept_docs_from_labels(labels, docs).select("doc_id", "lang", "source")


def run() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_cc"); spark.sparkContext.setLogLevel("ERROR")
    for _ in range(3):
        spark.range(1_000_000).selectExpr("sum(id)").collect()

    for o, n, lbl in [(old_stats, new_stats, "stats"), (old_keep, new_keep, "keep")]:
        a = sorted(map(tuple, o(spark, sf_dir).collect()))
        b = sorted(map(tuple, n(spark, sf_dir).collect()))
        assert a == b, f"MISMATCH {lbl}: {len(a)} vs {len(b)}"
        print(f"identity OK {lbl}: {len(a)} rows", flush=True)

    def t(fn) -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    def cal() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(1_000_000).selectExpr("sum(id)").collect()
            best = min(best, time.perf_counter() - t0)
        return best

    print(f"cal_start {cal():.3f}", flush=True)
    for pair, lbl in [((old_stats, new_stats), "stats"), ((old_keep, new_keep), "keep")]:
        o, n = pair
        for i in range(4):
            if i % 2 == 0:
                to, tn = t(o), t(n)
            else:
                tn, to = t(n), t(o)
            print(f"{lbl} round {i}: old {to:.3f}  new {tn:.3f}", flush=True)
    print(f"cal_end {cal():.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    run()
