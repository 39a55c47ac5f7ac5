"""One timed dedup_minhash_lsh run at sf0.1 (session warmed first);
prints a single float. Used by the interleaved A/B in ROADMAP 30."""
import sys
import time

sys.path.insert(0, ".")
from dblp_to_csv_spark.session import get_spark
from dblp_to_csv_spark.registry import all_queries

spark = get_spark()
qs = all_queries()
qs["pricing_summary"].fn(spark, "/root/testdata/sf0.1").count()  # warm JVM
t0 = time.monotonic()
qs["dedup_minhash_lsh"].fn(spark, "/root/testdata/sf0.1").count()
print(f"{time.monotonic() - t0:.3f}")
