"""Single-pass envelope scan: mapInPandas function front-end vs the Arrow
Python Data Source — same byte scanner, different plumbing (VERDICT r6 item
9: promote the winner to the --single-pass default).

Usage: python scripts/bench_envelope.py [n_records] [--wide]

Times extraction-only (envelope rows -> noop sink, no parquet round-trip,
no parsing) best-of-2 per path, prints one JSON line.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root

from scripts.bench_etl import generate  # noqa: E402


def main() -> None:
    wide = "--wide" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = int(args[0]) if args else 1_000_000
    d = Path(tempfile.mkdtemp())
    xml, dtd = generate(n, d, wide=wide)
    size_mb = Path(xml).stat().st_size / 1e6

    from dblp_to_csv_spark.session import get_spark
    from dblp_to_csv_spark.sources.dtd import get_record_types
    from dblp_to_csv_spark.sources.xml_datasource import DblpXmlDataSource
    from dblp_to_csv_spark.sources.xml_single_pass import extract_record_envelope

    spark = get_spark("bench-envelope")
    spark.sparkContext.setLogLevel("ERROR")
    types = sorted(get_record_types(dtd))
    # split sizing as the ETL would choose for this corpus (plans/etl.py)
    split = max(1 << 20, Path(xml).stat().st_size // 64)

    def run_mapinpandas() -> float:
        t0 = time.perf_counter()
        extract_record_envelope(spark, xml, types, target_split_bytes=split).write.format(
            "noop"
        ).mode("overwrite").save()
        return time.perf_counter() - t0

    def run_datasource() -> float:
        t0 = time.perf_counter()
        (
            spark.read.format("dblp-xml")
            .option("path", xml)
            .option("recordTypes", ",".join(types))
            .option("splitBytes", str(split))
            .load()
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.perf_counter() - t0

    spark.dataSource.register(DblpXmlDataSource)
    results = {}
    for name, fn in (("mapinpandas", run_mapinpandas), ("datasource", run_datasource)):
        best = min(fn() for _ in range(2))
        results[name] = {
            "sec": round(best, 2),
            "records_per_sec": round(n / best, 1),
        }
    print(
        json.dumps(
            {
                "metric": "envelope_scan",
                "n_records": n,
                "n_types": 10 if wide else 3,
                "xml_mb": round(size_mb, 1),
                "split_mb": round(split / 1e6, 1),
                **results,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
