"""Document-order global IDs (id_order='document', single-pass only):
reference-exact interleaved numbering (XMLToCSV.py:161-188) — one counter
over ALL record types in raw-XML document order, empty records consuming no
id, relation-node ids continuing the counter.
"""

from __future__ import annotations

import csv
import os

import pytest

from dblp_to_csv_spark.plans.etl import convert

DTD = """\
<!ELEMENT dblp (article|book|www)*>
<!ELEMENT article (author|title|year)*>
<!ELEMENT book (author|title|year)*>
<!ELEMENT www (author|title|year)*>
<!ELEMENT author (#PCDATA)>
<!ELEMENT title (#PCDATA)>
<!ELEMENT year (#PCDATA)>
<!ATTLIST article key CDATA #IMPLIED>
<!ATTLIST book key CDATA #IMPLIED>
<!ATTLIST www key CDATA #IMPLIED>
"""

# interleaved on purpose: sorted-table numbering (articles first, then books,
# then www) CANNOT reproduce this order, only the document-order path can.
# The bare <book/> has no attributes and no children -> F1 drops it and it
# must consume NO id (reference :176-188 increments only on emit).
XML = """\
<?xml version="1.0"?>
<dblp>
<article key="a0"><author>A</author><title>T0</title></article>
<book key="b0"><author>B</author></book>
<article key="a1"><title>T1</title></article>
<book></book>
<www key="w0"><title>W</title></www>
<book key="b1"><author>C</author></book>
<article key="a2"><author>D</author></article>
</dblp>
"""

EXPECTED = {  # key -> document-order id among KEPT records
    "a0": 0,
    "b0": 1,
    "a1": 2,
    "w0": 3,
    "b1": 4,
    "a2": 5,
}


def _read_ids(out_dir, element):
    path = os.path.join(out_dir, f"out_{element}.csv")
    with open(path, encoding="utf-8") as f:
        return {r["key"]: int(r["id"]) for r in csv.DictReader(f, delimiter=";")}


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    d = tmp_path_factory.mktemp("docorder")
    (d / "c.xml").write_text(XML)
    (d / "c.dtd").write_text(DTD)
    return d


def test_document_order_ids_interleave_across_tables(spark, corpus, tmp_path):
    result = convert(
        spark,
        str(corpus / "c.xml"),
        str(corpus / "c.dtd"),
        str(tmp_path / "out.csv"),
        single_pass=True,
        id_order="document",
    )
    assert result.total_records == len(EXPECTED)
    got: dict[str, int] = {}
    for element in result.tables:
        table_ids = _read_ids(str(tmp_path), element)
        assert "#src" not in result.tables[element].columns  # meta never leaks
        got.update(table_ids)
    assert got == EXPECTED
    # dense + unique across all tables
    assert sorted(got.values()) == list(range(len(EXPECTED)))


def test_document_order_node_ids_continue_counter(spark, corpus, tmp_path):
    result = convert(
        spark,
        str(corpus / "c.xml"),
        str(corpus / "c.dtd"),
        str(tmp_path / "out.csv"),
        single_pass=True,
        id_order="document",
        relations={"author": "authored_by"},
        annotate=True,
    )
    # read the written node CSV (the envelope working dir is cleaned after
    # the run, so files — not lazy frames — are the post-run contract in
    # single-pass mode)
    with open(tmp_path / "out_author.csv", encoding="utf-8") as f:
        rows = list(csv.reader(f, delimiter=";"))
    assert rows[0][0] == ":ID"
    node_ids = sorted(int(r[0]) for r in rows[1:])
    # relation-node ids continue the global record counter (XMLToCSV.py:358-362)
    assert node_ids == list(
        range(result.total_records, result.total_records + len(node_ids))
    )


def test_document_order_requires_single_pass(spark, corpus, tmp_path):
    with pytest.raises(ValueError, match="single_pass"):
        convert(
            spark,
            str(corpus / "c.xml"),
            str(corpus / "c.dtd"),
            str(tmp_path / "out.csv"),
            id_order="document",
        )


def test_document_order_across_multiple_files(spark, corpus, tmp_path):
    """Glob inputs: document order extends across files as (path, offset) —
    lexicographic file order, byte order within each file (the envelope's
    src column is the path; deterministic for any shard naming that sorts)."""
    d = tmp_path / "shards"
    d.mkdir()
    (d / "part_a.xml").write_text(
        '<?xml version="1.0"?>\n<dblp>\n'
        '<book key="s0"><author>X</author></book>\n'
        '<article key="s1"><title>T</title></article>\n'
        "</dblp>\n"
    )
    (d / "part_b.xml").write_text(
        '<?xml version="1.0"?>\n<dblp>\n'
        '<www key="s2"><title>W</title></www>\n'
        '<article key="s3"><title>U</title></article>\n'
        "</dblp>\n"
    )
    result = convert(
        spark,
        str(d / "part_*.xml"),
        str(corpus / "c.dtd"),
        str(tmp_path / "out.csv"),
        single_pass=True,
        id_order="document",
    )
    assert result.total_records == 4
    got: dict[str, int] = {}
    for element in result.tables:
        got.update(_read_ids(str(tmp_path), element))
    assert got == {"s0": 0, "s1": 1, "s2": 2, "s3": 3}


@pytest.mark.parametrize("via", ["datasource", "mapinpandas"])
def test_envelope_rank_is_document_order_across_splits(spark, tmp_path, via):
    """The scan-stamped rank (monotonically_increasing_id + per-partition
    prefix) must equal the (path, offset) document order even when the
    envelope is split into MANY byte ranges — the property the compaction
    fast path rests on, for both scanner front-ends."""
    from dblp_to_csv_spark.sources.xml_single_pass import (
        attach_doc_rank,
        envelope_rank_prefix,
        materialize_envelope,
    )

    d = tmp_path / "shards"
    d.mkdir()
    # two files, several records each → with a 256-byte split target every
    # record's range boundary is exercised and specs span both files
    for part, keys in (("a", range(0, 6)), ("b", range(6, 12))):
        (d / f"part_{part}.xml").write_text(
            '<?xml version="1.0"?>\n<dblp>\n'
            + "".join(
                f'<article key="k{k}"><title>{"T" * 40}{k}</title></article>\n'
                for k in keys
            )
            + "</dblp>\n"
        )
    env_dir = str(tmp_path / "env")
    materialize_envelope(
        spark,
        str(d / "part_*.xml"),
        {"article"},
        env_dir,
        target_split_bytes=256,
        via=via,
        with_rank=True,
    )
    ranked = attach_doc_rank(
        spark.read.parquet(env_dir), envelope_rank_prefix(spark, env_dir)
    )
    rows = ranked.select("src", "offset", "#rank", "xml").collect()
    assert len(rows) == 12
    by_key_order = sorted(rows, key=lambda r: (r["src"], r["offset"]))
    assert [r["#rank"] for r in by_key_order] == list(range(12))
