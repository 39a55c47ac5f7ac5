"""r15 A/B: gated scan fan-out on the dedup chain (minhash / simhash /
ngram_jaccard). Old = fan_out_small monkeypatched to identity (exactly the
pre-change plan); new = gated hash-repartition to defaultParallelism.
Result-identity asserted first, then interleaved best-of-3."""
import sys, time
sys.path.insert(0, "/root/repo")
from dblp_to_csv_spark.session import get_spark
from dblp_to_csv_spark.operators import dedup as D
from dblp_to_csv_spark import sources

SF = "/root/testdata/sf0.1"
QUERIES = {
    "dedup_minhash_lsh": D.dedup_minhash_lsh,
    "dedup_simhash": D.dedup_simhash,
    "dedup_ngram_jaccard": D.dedup_ngram_jaccard,
}

identity = lambda df, *k: df
real = D.fan_out_small


def run(spark, fn, mode):
    D.fan_out_small = identity if mode == "old" else real
    t0 = time.perf_counter()
    fn(spark, SF).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)


def main():
    spark = get_spark("ab_fanout")
    spark.sparkContext.setLogLevel("ERROR")
    for _ in range(3):
        spark.range(1_000_000).selectExpr("sum(id)").collect()

    for name, fn in QUERIES.items():
        D.fan_out_small = identity
        old_rows = sorted(tuple(r) for r in fn(spark, SF).collect())
        D.fan_out_small = real
        new_rows = sorted(tuple(r) for r in fn(spark, SF).collect())
        assert old_rows == new_rows, (name, len(old_rows), len(new_rows))
        print(f"{name}: IDENTICAL ({len(old_rows)} rows)")

    for name, fn in QUERIES.items():
        res = {"old": [], "new": []}
        for i in range(3):
            for mode in ("old", "new"):
                spark.sparkContext.setJobDescription(f"{name} {mode} p{i}")
                res[mode].append(run(spark, fn, mode))
        wins = sum(n < o for o, n in zip(res["old"], res["new"]))
        print(f"{name}: old {res['old']} best {min(res['old'])} | "
              f"new {res['new']} best {min(res['new'])} | new wins {wins}/3")
    spark.stop()


if __name__ == "__main__":
    main()
