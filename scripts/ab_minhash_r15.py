"""r15 A/B: minhash verification stage — tokenize only CANDIDATE docs.

Current shape: docs_sh re-tokenizes the WHOLE corpus (sh_raw pass 2) and
semi-joins the exploded shingles down to candidate docs. Variant: semi-join
the docs FIRST (candidates broadcast), tokenize only those rows — the
semi-join commutes with the per-row tokenize/explode, so rows are identical.

Also prints stage-isolated timings (cand build vs verification) so the
change is attributed, and asserts result-identity between the two plans.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from dblp_to_csv_spark.operators import dedup as D
from dblp_to_csv_spark.functions.text import words, shingles
from dblp_to_csv_spark.session import get_spark, session_checkpoint_dir

SF_DIR = "/root/testdata/sf0.1"


def old_body(spark):
    return D.minhash_lsh_pairs(spark, SF_DIR)


def new_body(spark):
    """minhash_lsh_pairs with the verification tokenize prefiltered by
    candidate docs (default args only: no caps)."""
    from dblp_to_csv_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    sh_raw = docs.select("doc_id", words("text").alias("w")).select(
        "doc_id", F.explode(shingles(F.col("w"))).alias("shingle")
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
    d = session_checkpoint_dir("_mh_cand_ab_")
    cand.write.mode("overwrite").parquet(d)
    cand = spark.read.parquet(d)
    cand_docs = (
        cand.select(F.col("doc_a").alias("doc_id"))
        .union(cand.select("doc_b"))
        .distinct()
    )
    # NEW: prefilter docs before tokenizing — semi-join on doc_id commutes
    # with per-row tokenize/explode.
    cand_texts = docs.join(F.broadcast(cand_docs), "doc_id", "left_semi")
    docs_sh = (
        cand_texts.select("doc_id", words("text").alias("w"))
        .select("doc_id", F.explode(shingles(F.col("w"))).alias("shingle"))
        .groupBy("doc_id")
        .agg(F.collect_set("shingle").alias("sh"))
    )
    sa = F.broadcast(
        docs_sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sha"))
    )
    sb = F.broadcast(
        docs_sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("shb"))
    )
    from dblp_to_csv_spark.functions.rounding import round_ties_down

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
        .filter(F.col("jaccard") >= D.JACCARD_THRESHOLD)
    )


def timeit(fn, spark):
    t0 = time.perf_counter()
    fn(spark).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main():
    spark = get_spark("ab_minhash_r15")
    spark.sparkContext.setLogLevel("ERROR")
    for _ in range(3):
        spark.range(1_000_000).selectExpr("sum(id)").collect()

    # result identity first
    old_rows = sorted(tuple(r) for r in old_body(spark).collect())
    new_rows = sorted(tuple(r) for r in new_body(spark).collect())
    assert old_rows == new_rows, (len(old_rows), len(new_rows))
    print(f"IDENTICAL rows: {len(old_rows)}")

    results = {"old": [], "new": []}
    for i in range(3):
        for name, fn in (("old", old_body), ("new", new_body)):
            spark.sparkContext.setJobDescription(f"mh {name} pass{i}")
            results[name].append(round(timeit(fn, spark), 3))
    print("old:", results["old"], "best", min(results["old"]))
    print("new:", results["new"], "best", min(results["new"]))
    wins = sum(n < o for o, n in zip(results["old"], results["new"]))
    print(f"new wins {wins}/3 pairings")
    spark.stop()


if __name__ == "__main__":
    main()
