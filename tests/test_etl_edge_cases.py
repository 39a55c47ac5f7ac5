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


def test_parquet_sink_schema_evolution_mergeschema(spark, tmp_path):
    """Corpus-version evolution on the parquet sink: a later conversion adds
    a column; reading both versions with mergeSchema unions the schemas and
    nulls the missing cells — the table-format-free evolution path (the
    reference would emit two incompatible CSV layouts)."""
    from dblp_to_csv_spark.plans.etl import convert

    v1 = tmp_path / "v1"
    v2 = tmp_path / "v2"
    for vdir, extra in ((v1, ""), (v2, "<note>late</note>")):
        vdir.mkdir()
        (vdir / "c.xml").write_text(
            '<?xml version="1.0"?>\n<dblp>\n'
            f'<article key="k-{vdir.name}"><title>T</title>{extra}</article>\n'
            "</dblp>\n"
        )
        convert(
            spark,
            str(vdir / "c.xml"),
            os.path.join(FIX, "edge_cases.dtd"),
            str(vdir / "out.csv"),
            output_format="parquet",
        )
        (tmp_path / "lake").mkdir(exist_ok=True)
        import shutil

        shutil.copytree(
            vdir / "out_article.parquet", tmp_path / "lake" / vdir.name
        )
    merged = spark.read.option("mergeSchema", "true").parquet(
        str(tmp_path / "lake" / "v1"), str(tmp_path / "lake" / "v2")
    )
    assert "note" in merged.columns
    rows = {r["key"]: r for r in merged.collect()}
    assert rows["k-v1"]["note"] is None  # old version: column nulled
    assert rows["k-v2"]["note"] == "late"


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


def test_external_pe_fallback_warns_and_converts(spark, tmp_path, capsys):
    """COVERAGE.md deviation 6b golden (VERDICT r7 #8): a DTD whose content
    model references an EXTERNAL parameter entity (unfetchable here; the
    reference's libxml2 resolves it) must fall back to reader inference,
    still convert correctly, and emit an UNMISSABLE warning naming the
    merge hazard so the silently-different schema path is never silent."""
    from dblp_to_csv_spark.plans.etl import convert

    dtd = tmp_path / "ext.dtd"
    dtd.write_text(
        '<!ENTITY % fields SYSTEM "http://unfetchable.invalid/fields.ent">\n'
        "<!ELEMENT dblp (rec)*>\n"
        "<!ELEMENT rec (%fields;)*>\n"
        "<!ATTLIST rec key CDATA #REQUIRED>\n"
    )
    xml = tmp_path / "ext.xml"
    xml.write_text(
        "<?xml version=\"1.0\"?>\n"
        "<dblp><rec key=\"a\"><t>X</t></rec><rec key=\"b\"><t>Y</t></rec></dblp>\n"
    )
    out = tmp_path / "ext.csv"
    convert(spark, str(xml), str(dtd), str(out))
    captured = capsys.readouterr().out
    assert "external parameter entities" in captured
    assert "falling back to reader schema inference" in captured
    assert "Merge hazard" in captured and "'rec'" in captured
    rows = _rows(str(tmp_path / "ext_rec.csv"))
    assert rows["a"]["t"] == "X" and rows["b"]["t"] == "Y"


def test_orc_sink_matches_parquet_and_prunes(spark, tmp_path):
    """ORC third sink format: same rows as the parquet sink (both write the
    pre-serialized frame), hive partitioning works, and a partition-filtered
    read shows PartitionFilters — ORC carries the same pruning machinery."""
    import contextlib
    import io

    from dblp_to_csv_spark.plans.etl import XmlToCsvPlan

    results = {}
    for fmt in ("parquet", "orc"):
        XmlToCsvPlan(
            spark,
            os.path.join(FIX, "mini_dblp.xml"),
            os.path.join(FIX, "mini_dblp.dtd"),
            str(tmp_path / f"{fmt}.csv"),
            output_format=fmt,
            partition_by=["year"],
        ).run()
        base = str(tmp_path / f"{fmt}_article.{fmt}")
        df = spark.read.format(fmt).load(base)
        results[fmt] = {
            tuple(str(r[c]) for c in sorted(df.columns)) for r in df.collect()
        }
    assert results["orc"] == results["parquet"] and results["orc"]
    orc_dir = tmp_path / "orc_article.orc"
    assert any(p.name.startswith("year=") for p in orc_dir.iterdir())
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        spark.read.orc(str(orc_dir)).filter("year = '2020'").explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "year" in plan
