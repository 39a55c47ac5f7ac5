"""Interleaved A/B: MinHash verification tail — old (lazy docs_sh consumed
by two different-key sort-merge joins, re-aggregated per side) vs new
(broadcast both sides of the SAME docs_sh aggregate; AQE stage reuse
computes it once — r14 session 6 change in minhash_lsh_pairs).

The old tail is reconstructed here verbatim (pre-change HEAD). Order
alternates per round so a decaying contention burst cannot bias one arm.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dblp_to_csv_spark.functions.rounding import round_ties_down
from dblp_to_csv_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    minhash_lsh_pairs as new_pairs,
)
from dblp_to_csv_spark.session import get_spark


def old_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-change verification: same chain up to docs_sh, then the lazy
    two-sided join with NO broadcast hints (the old sub-gate shape)."""
    import dblp_to_csv_spark.operators.dedup as D

    docs = D.load_table(spark, sf_dir, "documents")
    sh_raw = docs.select("doc_id", D.words("text").alias("w")).select(
        "doc_id", F.explode(D.shingles(F.col("w"))).alias("shingle")
    )
    hh = F.concat(
        F.md5(F.concat(F.lit("0|"), F.col("shingle"))),
        F.md5(F.concat(F.lit("1|"), F.col("shingle"))),
    )
    mh = sh_raw.select("doc_id", hh.alias("hh")).groupBy("doc_id").agg(
        *[
            F.min(F.substring(F.col("hh"), 1 + 5 * i, 5)).alias(f"h{i}")
            for i in range(D.MINHASH_K)
        ]
    )
    bands = mh.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat(
                            *[
                                F.col(f"h{b * D.MINHASH_R + r}")
                                for r in range(D.MINHASH_R)
                            ]
                        ).alias("bandkey"),
                    )
                    for b in range(D.MINHASH_B)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "bk.band", "bk.bandkey")
    a = bands.alias("a")
    b = bands.hint("merge").alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bandkey") == F.col("b.bandkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    cdir = D.session_checkpoint_dir("_mh_cand_old_")
    cand.write.mode("overwrite").parquet(cdir)
    cand = spark.read.parquet(cdir)
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select("doc_b"))
        .distinct()
    )
    docs_sh = (
        sh_raw.join(F.broadcast(cand_docs), "doc_id", "left_semi")
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("sh"))
    )
    sa = docs_sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha"))
    sb = docs_sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb"))
    i_ = F.size(F.array_intersect("sha", "shb"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            round_ties_down(
                i_ * 1.0 / (F.size("sha") + F.size("shb") - i_), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


def run() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_mh"); spark.sparkContext.setLogLevel("ERROR")
    for _ in range(3):
        spark.range(1_000_000).selectExpr("sum(id)").collect()

    old = sorted(map(tuple, old_tail(spark, sf_dir).collect()))
    new = sorted(map(tuple, new_pairs(spark, sf_dir).collect()))
    assert old == new, f"MISMATCH {len(old)} vs {len(new)}"
    print(f"identity OK: {len(old)} pairs", flush=True)

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
    for i in range(4):
        if i % 2 == 0:
            to, tn = t(old_tail), t(new_pairs)
        else:
            tn, to = t(new_pairs), t(old_tail)
        print(f"round {i}: old {to:.3f}  new {tn:.3f}", flush=True)
    print(f"cal_end {cal():.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    run()
