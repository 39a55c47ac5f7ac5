"""XML edge cases the reference handles via libxml2 — entity references,
CDATA sections, empty elements, multi-file input — verified against the
native Spark XML reader's behavior."""

from __future__ import annotations

import csv
import os

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def _rows(path):
    with open(path, encoding="utf-8") as f:
        return {r["key"]: r for r in csv.DictReader(f, delimiter=";")}


def test_entities_cdata_empty(spark, tmp_path):
    from dblp_to_csv_spark.plans.etl import convert

    out = tmp_path / "edge.csv"
    convert(
        spark,
        os.path.join(FIX, "edge_cases.xml"),
        os.path.join(FIX, "edge_cases.dtd"),
        str(out),
    )
    rows = _rows(str(tmp_path / "edge_article.csv"))
    # entity references resolved (numeric + named)
    assert rows["e1"]["title"] == "Café & friends <tags>"
    assert rows["e1"]["author"] == "Müller, Jörg"
    # CDATA passes through unescaped
    assert rows["e2"]["title"] == "Raw <unescaped> & text"
    # an empty element has no text → never observed → no column at all
    # (reference pass 1 gates observation on elem.text is not None,
    # XMLToCSV.py:130; e3's <note></note> is the only note in the fixture)
    assert "note" not in rows["e3"]


def test_parquet_sink(spark, tmp_path):
    """output_format='parquet': pre-serialized frames (native arrays) land
    as parquet; reading back preserves types and array cells."""
    from dblp_to_csv_spark.plans.etl import convert

    out = tmp_path / "p.csv"
    convert(
        spark,
        os.path.join(FIX, "mini_dblp.xml"),
        os.path.join(FIX, "mini_dblp.dtd"),
        str(out),
        output_format="parquet",
    )
    df = spark.read.parquet(str(tmp_path / "p_article.parquet"))
    assert dict(df.dtypes)["author"] == "array<string>"
    rows = {r["key"]: r for r in df.collect()}
    assert sorted(rows["a1"]["author"]) == ["Alice", "Bob"]
    assert rows["a1"]["id"] is not None


def test_parquet_sink_partitioned_prunes(spark, tmp_path):
    """partition_by produces hive partitions and a filtered read shows
    partition pruning in the scan (PartitionFilters), i.e. whole directories
    are skipped before IO."""
    import contextlib
    import io

    from dblp_to_csv_spark.plans.etl import XmlToCsvPlan

    out = tmp_path / "pp.csv"
    XmlToCsvPlan(
        spark,
        os.path.join(FIX, "mini_dblp.xml"),
        os.path.join(FIX, "mini_dblp.dtd"),
        str(out),
        output_format="parquet",
        partition_by=["year"],
    ).run()
    base = str(tmp_path / "pp_article.parquet")
    assert any(p.name.startswith("year=") for p in (tmp_path / "pp_article.parquet").iterdir())
    df = spark.read.parquet(base).filter("year = '2020'")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "year" in plan
    assert df.count() == 1  # only a1 has year 2020


def test_multi_file_input_glob(spark, tmp_path):
    """The engine accepts a directory/glob of XML files — the multi-file
    layout a 100 TB corpus actually has (the reference reads exactly one
    file). IDs must stay globally dense across files."""
    from dblp_to_csv_spark.plans.etl import convert

    for i, keys in enumerate([("m1", "m2"), ("m3",), ("m4", "m5")]):
        body = "".join(
            f'<article key="{k}"><title>T {k}</title><year>200{i}</year></article>\n'
            for k in keys
        )
        (tmp_path / f"part{i}.xml").write_text(
            f"<?xml version=\"1.0\"?>\n<dblp>\n{body}</dblp>\n"
        )
    out = tmp_path / "multi.csv"
    convert(
        spark,
        str(tmp_path / "part*.xml"),
        os.path.join(FIX, "edge_cases.dtd"),
        str(out),
    )
    rows = _rows(str(tmp_path / "multi_article.csv"))
    assert set(rows) == {"m1", "m2", "m3", "m4", "m5"}
    assert sorted(int(r["id"]) for r in rows.values()) == list(range(5))
