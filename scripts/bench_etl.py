"""ETL throughput measurement: generate an N-record DBLP-like XML corpus,
convert it end-to-end (annotate mode), report records/sec.

Usage: python scripts/bench_etl.py [n_records] [out_dir] [--single-pass] [--wide]
                                   [--types=K] [--reuse]

--wide: 10 record types instead of 3 — the shape where per-type scans pay
N full corpus reads and the single-pass envelope pays one.
--types=K: K record types (3 base + K-3 synthetic) — the axis along which
the per-type mode degrades linearly while single-pass stays one read.
--reuse: skip corpus generation when out_dir/corpus.xml already exists
(multi-GB corpora take minutes to write; mode A/B runs share one corpus).
"""

from __future__ import annotations

import json
import random
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))  # repo root


WIDE_TYPES = [
    "incollection", "proceedings", "phdthesis", "mastersthesis",
    "www", "person", "data",
]


def generate(
    n: int, d: Path, wide: bool = False, n_types: int | None = None
) -> tuple[str, str]:
    rng = random.Random(42)
    xml, dtd = d / "corpus.xml", d / "corpus.dtd"
    extra_types = list(WIDE_TYPES) if wide else []
    if n_types is not None and n_types > 3:
        extra_types = (WIDE_TYPES + [
            f"xtype{i:03d}" for i in range(n_types - 3 - len(WIDE_TYPES))
        ])[: n_types - 3]
    base_types = ["article", "inproceedings", "book"] + extra_types
    dtd.write_text(
        f"<!ELEMENT dblp ({'|'.join(base_types)})*>\n"
        "<!ELEMENT article (author|title|year|journal|pages)*>\n"
        "<!ELEMENT inproceedings (author|title|year|booktitle)*>\n"
        "<!ELEMENT book (author|title|year|publisher)*>\n"
        + "".join(
            f"<!ELEMENT {t} (author|title|year)*>\n"
            f"<!ATTLIST {t} key CDATA #REQUIRED>\n"
            for t in extra_types
        )
        + "<!ELEMENT author (#PCDATA)>\n<!ELEMENT title (#PCDATA)>\n"
        "<!ELEMENT year (#PCDATA)>\n<!ELEMENT journal (#PCDATA)>\n"
        "<!ELEMENT pages (#PCDATA)>\n<!ELEMENT booktitle (#PCDATA)>\n"
        "<!ELEMENT publisher (#PCDATA)>\n"
        '<!ATTLIST article key CDATA #REQUIRED mdate CDATA #IMPLIED>\n'
        '<!ATTLIST inproceedings key CDATA #REQUIRED>\n'
        '<!ATTLIST book key CDATA #REQUIRED>\n'
    )
    kinds = ["article", "article", "inproceedings", "book"] + extra_types
    extra = {
        "article": "<journal>Journal {j}</journal><pages>{a}-{b}</pages>",
        "inproceedings": "<booktitle>Conf {j}</booktitle>",
        "book": "<publisher>Pub {j}</publisher>",
    }
    extra.update({t: "" for t in extra_types})
    with open(xml, "w", encoding="utf-8") as f:
        f.write('<?xml version="1.0"?>\n<dblp>\n')
        for i in range(n):
            k = kinds[i % len(kinds)]
            authors = "".join(
                f"<author>Author {rng.randrange(50000)}</author>"
                for _ in range(rng.randrange(1, 5))
            )
            a = rng.randrange(1, 500)
            f.write(
                f'<{k} key="k{i}"'
                + (' mdate="2020-01-01"' if k == "article" and i % 3 == 0 else "")
                + f">{authors}<title>Title {i} about topic {rng.randrange(5000)}</title>"
                + f"<year>{1950 + i % 74}</year>"
                + extra[k].format(j=rng.randrange(300), a=a, b=a + rng.randrange(1, 30))
                + f"</{k}>\n"
            )
        f.write("</dblp>\n")
    return str(xml), str(dtd)


def main() -> None:
    single_pass = "--single-pass" in sys.argv
    wide = "--wide" in sys.argv
    reuse = "--reuse" in sys.argv
    doc_order = "--doc-order" in sys.argv
    n_types_arg = None
    for a in sys.argv[1:]:
        if a.startswith("--types="):
            n_types_arg = int(a.split("=", 1)[1])
    args = [
        a
        for a in sys.argv[1:]
        if a not in ("--single-pass", "--wide", "--reuse", "--doc-order")
        and not a.startswith("--types=")
    ]
    n = int(args[0]) if len(args) > 0 else 200_000
    out_dir = Path(args[1]) if len(args) > 1 else Path(tempfile.mkdtemp())
    out_dir.mkdir(parents=True, exist_ok=True)

    t0 = time.perf_counter()
    if reuse and (out_dir / "corpus.xml").exists():
        xml, dtd = str(out_dir / "corpus.xml"), str(out_dir / "corpus.dtd")
    else:
        xml, dtd = generate(n, out_dir, wide=wide, n_types=n_types_arg)
    gen_s = time.perf_counter() - t0
    size_mb = Path(xml).stat().st_size / 1e6

    from dblp_to_csv_spark.plans.etl import convert
    from dblp_to_csv_spark.session import get_spark

    spark = get_spark("bench-etl")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    result = convert(
        spark,
        xml,
        dtd,
        str(out_dir / "out.csv"),
        annotate=True,
        relations={"author": "authored_by"},
        single_file=False,
        single_pass=single_pass,
        id_order="document" if doc_order else "table",
    )
    convert_s = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "etl_records_per_sec",
                "single_pass": single_pass,
                "id_order": "document" if doc_order else "table",
                # clamp to what generate() actually produced: K <= 3 still
                # generates the 3 base types (and --reuse keeps whatever the
                # shared corpus was generated with)
                "n_types": (max(n_types_arg, 3) if n_types_arg else (10 if wide else 3)),
                "value": round(n / convert_s, 1),
                "unit": "records/sec",
                "n_records": result.total_records,
                "xml_mb": round(size_mb, 1),
                "gen_sec": round(gen_s, 2),
                "convert_sec": round(convert_s, 2),
                "tables": {t.element: t.n_rows for t in result.tables.values()},
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
