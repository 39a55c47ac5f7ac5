"""Isolated A/B probe for dedup_substring_rewrite variants (guide §1.4:
noop sink, labeled jobs, best-of-2 after a warm-up). Run on a quiet host."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dblp_to_csv_spark.operators import curation  # noqa: E402
from dblp_to_csv_spark.operators.curation import (  # noqa: E402
    SPAN_WORDS,
    _broadcast_if_small,
    _span_window_base,
    noncanonical_marked,
    rewrite_from_marked,
)
from dblp_to_csv_spark.registry import all_queries  # noqa: E402
from dblp_to_csv_spark.session import checkpoint_base, get_spark  # noqa: E402
from dblp_to_csv_spark.sources.tables import load_table  # noqa: E402
from dblp_to_csv_spark.functions.text import words  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def timed(spark, label, mk, runs=2):
    best = float("inf")
    for _ in range(runs):
        spark.sparkContext.setJobDescription(label)
        t0 = time.perf_counter()
        mk().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{label}: {best:.3f}s", flush=True)
    return best


def variant_checkpointed(spark, binary_h: bool):
    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", words("text").alias("w")
    )
    base = _span_window_base(docs)
    occ = base.select("doc_id", F.posexplode("hashes").alias("pos", "h"))
    if binary_h:
        occ = occ.select("doc_id", "pos", F.unhex("h").alias("h"))
    ck = checkpoint_base(spark, None, "_probe_substr_")
    occ_path = os.path.join(ck, "occ")
    occ.write.mode("overwrite").parquet(occ_path)
    occ = spark.read.parquet(occ_path)

    def gate(dup):
        dup_path = os.path.join(ck, "dup")
        dup.write.mode("overwrite").parquet(dup_path)
        return _broadcast_if_small(spark.read.parquet(dup_path))

    marked = noncanonical_marked(occ, prepare=gate)
    return rewrite_from_marked(base, marked)


def main():
    spark = get_spark("probe-substr")
    spark.sparkContext.setLogLevel("ERROR")
    for _ in range(3):
        spark.range(1_000_000).selectExpr("sum(id)").collect()

    fns = all_queries()
    timed(spark, "current dedup_substring_rewrite", lambda: fns["dedup_substring_rewrite"].fn(spark, SF_DIR))

    # sub-stage: occ computation alone (tokenize + md5 + posexplode)
    def occ_only():
        docs = load_table(spark, SF_DIR, "documents").select(
            "doc_id", words("text").alias("w")
        )
        return _span_window_base(docs).select(
            "doc_id", F.posexplode("hashes").alias("pos", "h")
        )

    timed(spark, "occ only (noop)", occ_only)

    timed(spark, "variant ck string-h", lambda: variant_checkpointed(spark, False))
    timed(spark, "variant ck binary-h", lambda: variant_checkpointed(spark, True))
    timed(spark, "current again", lambda: fns["dedup_substring_rewrite"].fn(spark, SF_DIR))
    spark.stop()


if __name__ == "__main__":
    main()
