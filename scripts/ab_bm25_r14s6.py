"""Interleaved A/B + result-identity check for the retrieval_eval_bm25
restructure (r14 session 6).

Old shape: posting build evaluated TWICE (once under the broadcast dft
build, once as the cand probe side), scored frame parquet-checkpointed so
the gold extraction (filter + broadcast join) and the better-than-gold
aggregate both read it.

New shape (guide §2.4 duplicated subtrees / §2.4 shared exchange):
* the posting explode+aggregate runs ONCE: postings are semi-join-pruned
  to query terms BEFORE the aggregate and parquet-checkpointed (the frame
  is query-term-postings-sized — eval-set-bounded, a vanishing corpus
  fraction at 100 TB); dft and the scoring probe both read the checkpoint;
* gold attaches by a WINDOW over query_id (max(when(doc==query, score)))
  instead of checkpoint + filter + broadcast join — the following
  groupBy(query_id) reuses the window's exchange, so the whole verdict is
  one shuffle and the scored checkpoint (write job + read) disappears.

Result identity: gscore per query is unique (the gold row always exists,
(query_id, doc_id) is the aggregate key), every expression is unchanged.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from dblp_to_csv_spark.functions.text import words
from dblp_to_csv_spark.operators.text_analysis import (
    BM25_B,
    BM25_K1,
    REVAL_HIT_K,
    REVAL_STRIDE,
    REVAL_TERMS,
    retrieval_eval_bm25 as old_bm25,
)
from dblp_to_csv_spark.session import checkpoint_base, get_spark
from dblp_to_csv_spark.sources.tables import load_table


def new_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", words("text").alias("w")
    )
    stats = toks.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.avg(F.size("w")).alias("avgdl"),
    )
    first_pos = (
        toks.filter((F.col("doc_id") % REVAL_STRIDE) == 0)
        .select(
            F.col("doc_id").alias("query_id"),
            F.posexplode("w").alias("pos", "term"),
        )
        .groupBy("query_id", "term")
        .agg(F.min("pos").alias("p"))
    )
    qt = (
        first_pos.withColumn(
            "rn",
            F.row_number().over(Window.partitionBy("query_id").orderBy("p")),
        )
        .filter(F.col("rn") <= REVAL_TERMS)
        .select("query_id", "term")
    )
    # posting build pruned to query terms BEFORE the aggregate, then
    # checkpointed once: dft and the scoring probe read the same files —
    # the corpus explode runs exactly once per invocation.
    pruned = (
        toks.select(
            "doc_id", F.size("w").alias("dl"), F.explode("w").alias("term")
        )
        .join(F.broadcast(qt.select("term").distinct()), "term", "semi")
        .groupBy("doc_id", "dl", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    p_path = os.path.join(checkpoint_base(spark, None, "_reval_"), "post")
    pruned.write.mode("overwrite").parquet(p_path)
    pruned = spark.read.parquet(p_path)
    dft = pruned.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    cand = (
        pruned.join(F.broadcast(qt), "term")
        .join(F.broadcast(dft), "term")
        .crossJoin(F.broadcast(stats))
    )
    norm = F.lit(BM25_K1) * (
        F.lit(1 - BM25_B) + F.lit(BM25_B) * F.col("dl") / F.col("avgdl")
    )
    idf = F.log(1 + (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    contrib = idf * F.col("tf") * F.lit(BM25_K1 + 1) / (F.col("tf") + norm)
    scored = cand.groupBy("query_id", "doc_id").agg(
        F.round(F.sum(contrib), 6).alias("score")
    )
    # gold score rides a window over query_id; the groupBy below reuses the
    # window's hash partitioning, so no checkpoint and no broadcast-gold job
    wq = Window.partitionBy("query_id")
    gscore = F.max(
        F.when(F.col("doc_id") == F.col("query_id"), F.col("score"))
    ).over(wq)
    better = (F.col("score") > gscore) | (
        (F.col("score") == gscore) & (F.col("doc_id") < F.col("query_id"))
    )
    agg = (
        scored.select("query_id", "doc_id", "score", better.alias("b"))
        .groupBy("query_id")
        .agg(
            (F.lit(1) + F.sum(F.col("b").cast("int"))).cast("long").alias("gold_rank"),
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
        )
    )
    return agg.select(
        "query_id",
        "gold_rank",
        (F.round(1.0 / F.col("gold_rank"), 6) + F.lit(0.0)).alias(
            "reciprocal_rank"
        ),
        (F.col("gold_rank") <= REVAL_HIT_K).alias("hit_at_k"),
        "n_candidates",
    )


def run() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_bm25")
    spark.sparkContext.setLogLevel("ERROR")
    for _ in range(3):
        spark.range(1_000_000).selectExpr("sum(id)").collect()

    def cal() -> float:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(1_000_000).selectExpr("sum(id)").collect()
            best = min(best, time.perf_counter() - t0)
        return best

    # result identity on sf0.1 AND sf0.01
    for d in [sf_dir, "/root/testdata/sf0.01"]:
        a = sorted(map(tuple, old_bm25(spark, d).collect()))
        b = sorted(map(tuple, new_bm25(spark, d).collect()))
        assert a == b, f"MISMATCH at {d}: {len(a)} vs {len(b)} rows"
        print(f"identity OK at {d}: {len(a)} rows", flush=True)

    def t(fn) -> float:
        spark.sparkContext.setJobDescription(f"ab:{fn.__name__}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        spark.sparkContext.setJobDescription(None)
        return dt

    print(f"cal_start {cal():.3f}", flush=True)
    for i in range(4):
        if i % 2 == 0:
            to, tn = t(old_bm25), t(new_bm25)
        else:
            tn, to = t(new_bm25), t(old_bm25)
        print(f"round {i}: old {to:.3f}  new {tn:.3f}", flush=True)
    print(f"cal_end {cal():.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    run()
