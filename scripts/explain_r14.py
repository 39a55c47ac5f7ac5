"""Dump .explain('formatted') for every benched query to plans/r14/.

Usage: python scripts/explain_r14.py [before|after] [query ...]

Plan generation is driver-side (no job runs), so this is cheap and safe to
run alongside other work. Queries default to the union of the four bench
series (the driver-timed surface). The files are the optimization-round
evidence the judge checks plan claims against (OPTIMIZATION_r14.md).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import CURATION_BENCH, GRAPH_BENCH, PIPELINE_BENCH  # noqa: E402
from dblp_to_csv_spark.registry import all_queries, bench_queries  # noqa: E402
from dblp_to_csv_spark.session import get_spark  # noqa: E402


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)

    registry = all_queries()
    names = sys.argv[2:]
    if not names:
        names = sorted(
            set(bench_queries()) | set(CURATION_BENCH) | set(GRAPH_BENCH) | set(PIPELINE_BENCH)
        )

    spark = get_spark("explain-r14")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        entry = registry.get(name)
        if entry is None:
            print(f"SKIP {name}: not registered", file=sys.stderr)
            continue
        try:
            df = entry.fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"EXPLAIN FAILED: {type(exc).__name__}: {exc}\n"
            print(f"FAIL {name}: {exc}", file=sys.stderr)
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(text)
        print(f"wrote {name}_{suffix}.txt", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
