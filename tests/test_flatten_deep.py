"""Deep-nesting flatten (VERDICT r01 missing #2): the reference flattens
ANY depth into the single tag-name namespace (XMLToCSV.py:127-138 — its
``end``-event loop visits every descendant; depth is lost). Round 1 raised
NotImplementedError past 2 levels inside a repeated element; the recursive
``_walk_array`` must now promote every descendant tag."""

from __future__ import annotations

import csv


def _rows(path):
    with open(path, encoding="utf-8") as f:
        return {r["key"]: r for r in csv.DictReader(f, delimiter=";")}


DTD = """\
<!ELEMENT dblp (www)*>
<!ELEMENT www (crossref|url)*>
<!ELEMENT crossref (ref|deep)*>
<!ELEMENT ref (#PCDATA)>
<!ELEMENT deep (deeper)*>
<!ELEMENT deeper (#PCDATA|mark)*>
<!ELEMENT mark (#PCDATA)>
<!ELEMENT url (#PCDATA)>
<!ATTLIST www key CDATA #REQUIRED>
<!ATTLIST ref note CDATA #IMPLIED>
"""

# <www> repeats <crossref>; inside: <ref> (text+attr), <deep><deeper> — and
# w3 goes four levels (www > crossref > deep > deeper > mark).
XML = """\
<?xml version="1.0"?>
<dblp>
<www key="w1"><crossref><ref note="n1">R1</ref><deep><deeper>D1</deeper></deep></crossref><crossref><ref>R2</ref></crossref><url>http://x</url></www>
<www key="w2"><url>u2</url></www>
<www key="w3"><crossref><deep><deeper>D2<mark>M1</mark></deeper><deeper>D3</deeper></deep><deep><deeper>D4</deeper></deep></crossref></www>
</dblp>
"""


def test_three_level_nesting_in_repeated_element(spark, tmp_path):
    from dblp_to_csv_spark.plans.etl import convert

    (tmp_path / "deep.xml").write_text(XML)
    (tmp_path / "deep.dtd").write_text(DTD)
    convert(
        spark,
        str(tmp_path / "deep.xml"),
        str(tmp_path / "deep.dtd"),
        str(tmp_path / "out.csv"),
    )
    rows = _rows(str(tmp_path / "out_www.csv"))

    # descendants are tag-name columns regardless of depth; repeats merge
    # into one '|'-joined, sorted multi-value cell (A1+A2)
    assert rows["w1"]["ref"] == "R1|R2"
    assert rows["w1"]["ref-note"] == "n1"  # attr gated on element text
    assert rows["w1"]["deeper"] == "D1"
    assert rows["w1"]["url"] == "http://x"
    # 4-level: mark under deeper under deep under repeated crossref
    assert rows["w3"]["deeper"] == "D2|D3|D4"
    assert rows["w3"]["mark"] == "M1"
    assert rows["w3"]["ref"] == ""
    # records without the nested shapes stay empty, not broken
    assert rows["w2"]["deeper"] == ""
    assert rows["w2"]["url"] == "u2"
