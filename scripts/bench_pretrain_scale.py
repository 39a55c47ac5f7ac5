"""Decade-scale curve for the flagship admission composite (VERDICT r8
item 6): pretrain_corpus_report's scaling evidence stopped at sf0.1 (5,000
docs), far below where its survivor-checkpoint chain carries load. Reuses
bench_curation_scale's seeded synthetic corpus generator (injected
exact/near-dup rates, testdata-like schema) and times the WHOLE composite
end-to-end at each corpus size, plus the per-stage verdict histogram as a
sanity check that the stage mix stays proportional.

Usage: python scripts/bench_pretrain_scale.py [n_docs ...]   # default 50k 500k
Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from bench_curation_scale import generate  # noqa: E402


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [50_000, 500_000]
    from pyspark.sql import functions as F

    from dblp_to_csv_spark.registry import all_queries
    from dblp_to_csv_spark.session import get_spark

    spark = get_spark("pretrain-scale")
    spark.sparkContext.setLogLevel("ERROR")
    fn = all_queries()["pretrain_corpus_report"].fn
    out: dict = {"sizes": {}}
    for n in sizes:
        d = Path(tempfile.mkdtemp(prefix=f"pretrainscale_{n}_"))
        # ~12 docs/source keeps the SOURCE_CAP=15 stage proportional across
        # the decade instead of swallowing the corpus (see generate()).
        generate(
            n, d, n_sources=max(50, n // 12), with_stopwords=True,
            vocab_size=5000,
        )
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, str(d)).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        stages = {
            r["stage"]: r["cnt"]
            for r in fn(spark, str(d))
            .groupBy("stage")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        out["sizes"][str(n)] = {
            "seconds": round(best, 2),
            "docs_per_sec": round(n / best),
            "stage_histogram": stages,
        }
        shutil.rmtree(d, ignore_errors=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
