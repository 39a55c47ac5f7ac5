"""Stage isolation for minhash_lsh_pairs at sf0.1: where do the ~3 s go?"""
import sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F
from dblp_to_csv_spark.operators import dedup as D
from dblp_to_csv_spark.functions.text import words, shingles
from dblp_to_csv_spark.session import get_spark, session_checkpoint_dir
from dblp_to_csv_spark.sources.tables import load_table

SF = "/root/testdata/sf0.1"

def noop(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 3)

spark = get_spark("iso_minhash")
spark.sparkContext.setLogLevel("ERROR")
for _ in range(3):
    spark.range(1_000_000).selectExpr("sum(id)").collect()

docs = load_table(spark, SF, "documents")
sh_raw = docs.select("doc_id", words("text").alias("w")).select(
    "doc_id", F.explode(shingles(F.col("w"))).alias("shingle"))
hh = F.concat(F.md5(F.concat(F.lit("0|"), F.col("shingle"))),
              F.md5(F.concat(F.lit("1|"), F.col("shingle"))))
mh = sh_raw.select("doc_id", hh.alias("hh")).groupBy("doc_id").agg(
    *[F.min(F.substring(F.col("hh"), 1 + 5 * i, 5)).alias(f"h{i}")
      for i in range(D.MINHASH_K)])
bands = mh.select("doc_id", F.explode(F.array(
    *[F.struct(F.lit(b).alias("band"),
               F.concat(*[F.col(f"h{b*D.MINHASH_R+r}") for r in range(D.MINHASH_R)]).alias("bandkey"))
      for b in range(D.MINHASH_B)])).alias("bk")).select("doc_id", "bk.band", "bk.bandkey")
a = bands.alias("a"); b = bands.hint("merge").alias("b")
cand_plan = (a.join(b, (F.col("a.band")==F.col("b.band")) & (F.col("a.bandkey")==F.col("b.bandkey"))
                        & (F.col("a.doc_id")<F.col("b.doc_id")))
    .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")).distinct())

for rep in range(3):
    print(f"--- pass {rep} ---")
    print("tokenize+explode only      ", noop(sh_raw))
    print("signature agg (mh)         ", noop(mh))
    print("bands (sig + explode)      ", noop(bands))
    print("cand full (SMJ+distinct)   ", noop(cand_plan))
    d = session_checkpoint_dir("_iso_")
    t0 = time.perf_counter(); cand_plan.write.mode("overwrite").parquet(d)
    print("cand write parquet         ", round(time.perf_counter()-t0, 3))
    cand = spark.read.parquet(d)
    cand_docs = cand.select(F.col("doc_a").alias("doc_id")).union(cand.select("doc_b")).distinct()
    docs_sh_old = (sh_raw.join(F.broadcast(cand_docs), "doc_id", "left_semi")
                   .groupBy("doc_id").agg(F.collect_set("shingle").alias("sh")))
    cand_texts = docs.join(F.broadcast(cand_docs), "doc_id", "left_semi")
    docs_sh_new = (cand_texts.select("doc_id", words("text").alias("w"))
                   .select("doc_id", F.explode(shingles(F.col("w"))).alias("shingle"))
                   .groupBy("doc_id").agg(F.collect_set("shingle").alias("sh")))
    print("docs_sh OLD (corpus explode)", noop(docs_sh_old))
    print("docs_sh NEW (prefilter)     ", noop(docs_sh_new))
    t0 = time.perf_counter()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    print("probe                      ", round(time.perf_counter()-t0, 3))
spark.stop()
