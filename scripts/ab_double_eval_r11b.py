"""Interleaved A/B + oracle parity probe for the round-11 session-2
double-eval fixes (ROADMAP 30): drift_chi2_by_window obs checkpoint,
lm_bigram_cross_entropy derived prev-context table.

Old variants are reconstructed inline (the pre-fix plan shapes) so the A/B
interleaves old/new in one session — the only defensible comparison on this
contended host (BASELINE §17/§18).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F

from dblp_to_csv_spark.session import get_spark
from dblp_to_csv_spark.sources.tables import load_table
from dblp_to_csv_spark.functions.text import words, bigrams
from dblp_to_csv_spark.operators.drift import drift_chi2_by_window
from dblp_to_csv_spark.operators.text_analysis import (
    LM_ADD_K,
    lm_bigram_cross_entropy,
)

SF01 = "/root/testdata/sf0.1"
SF001 = "/root/testdata/sf0.01"


def old_chi2_by_window(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    obs = ev.groupBy(
        F.date_trunc("hour", "ts").alias("window_start"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"))
    glob = obs.groupBy("event_type").agg(F.sum("n").alias("nt"))
    tot = glob.agg(F.sum("nt").alias("n_total"))
    wtot = obs.groupBy("window_start").agg(F.sum("n").alias("nw"))
    grid = (
        wtot.crossJoin(F.broadcast(glob))
        .crossJoin(F.broadcast(tot))
        .select(
            "window_start",
            "event_type",
            "nw",
            (F.col("nw") * F.col("nt") * 1.0 / F.col("n_total")).alias("expected"),
        )
    )
    cells = grid.join(obs, ["window_start", "event_type"], "left").select(
        "window_start",
        "nw",
        (
            F.pow(F.coalesce(F.col("n"), F.lit(0)) - F.col("expected"), 2)
            / F.col("expected")
        ).alias("contrib"),
    )
    return cells.groupBy("window_start").agg(
        F.max("nw").cast("long").alias("n_events"),
        F.round(F.sum("contrib"), 6).alias("chi2"),
    )


def old_lm_bigram(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", words("text").alias("w"))
    bg = t.select("doc_id", F.explode(bigrams(F.col("w"))).alias("bg"))
    vocab = t.select(F.explode("w").alias("word")).agg(
        F.count_distinct("word").alias("v")
    )
    bgc = bg.groupBy("bg").agg(F.count("*").alias("c12"))
    prevc = (
        bg.select(F.split("bg", " ").getItem(0).alias("prev"))
        .groupBy("prev")
        .agg(F.count("*").alias("c1"))
    )
    scored = (
        bg.join(bgc, "bg")
        .withColumn("prev", F.split("bg", " ").getItem(0))
        .join(prevc, "prev")
        .crossJoin(F.broadcast(vocab))
    )
    neg_log2_p = -F.log2(
        (F.col("c12") + LM_ADD_K) / (F.col("c1") + LM_ADD_K * F.col("v"))
    )
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.round(F.avg(neg_log2_p), 6).alias("cross_entropy"),
    )


def timed(fn, spark, sf_dir):
    t0 = time.monotonic()
    n = fn(spark, sf_dir).count()
    return time.monotonic() - t0, n


def main():
    spark = get_spark()

    # parity: new vs old values at sf0.01 (hash-identical frames)
    for new, old, name in [
        (drift_chi2_by_window, old_chi2_by_window, "drift_chi2_by_window"),
        (lm_bigram_cross_entropy, old_lm_bigram, "lm_bigram_cross_entropy"),
    ]:
        a = new(spark, SF001).toPandas()
        b = old(spark, SF001).toPandas()
        from tests.sweep_util import assert_matches_oracle

        assert_matches_oracle(name, a, b, "sf0.01 old-vs-new")
        print(f"{name}: old/new parity OK ({len(a)} rows)")

    # interleaved A/B at sf0.1
    for new, old, name in [
        (drift_chi2_by_window, old_chi2_by_window, "drift_chi2_by_window"),
        (lm_bigram_cross_entropy, old_lm_bigram, "lm_bigram_cross_entropy"),
    ]:
        olds, news = [], []
        for _ in range(3):
            t, _n = timed(old, spark, SF01)
            olds.append(t)
            t, _n = timed(new, spark, SF01)
            news.append(t)
        print(
            f"{name}: old={['%.2f' % t for t in olds]} "
            f"new={['%.2f' % t for t in news]} "
            f"best old={min(olds):.2f} new={min(news):.2f}"
        )


if __name__ == "__main__":
    main()
