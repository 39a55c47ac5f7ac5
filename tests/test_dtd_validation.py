"""Structural DTD validation (S4 stdlib subset): declared elements/attrs and
#REQUIRED presence, via a streaming expat pass."""

from __future__ import annotations

import os

from dblp_to_csv_spark.sources.dtd import (
    get_declared_attributes,
    validate_xml_structurally,
)

FIX = os.path.join(os.path.dirname(__file__), "fixtures")


def test_valid_fixture_passes():
    assert validate_xml_structurally(
        os.path.join(FIX, "mini_dblp.xml"), os.path.join(FIX, "mini_dblp.dtd")
    ) == []


def test_declared_attributes():
    attrs = get_declared_attributes(os.path.join(FIX, "mini_dblp.dtd"))
    assert attrs["article"] == {"key": True, "mdate": False}
    assert attrs["www"] == {"key": True, "status": False}


def test_violations_reported(tmp_path):
    bad = tmp_path / "bad.xml"
    bad.write_text(
        '<?xml version="1.0"?>\n<dblp>\n'
        "<article><title>no key</title></article>\n"  # missing #REQUIRED key
        '<widget key="w">x</widget>\n'  # undeclared element
        '<book key="b" isbn="1"><author>A</author></book>\n'  # undeclared attr
        "</dblp>\n"
    )
    errors = validate_xml_structurally(str(bad), os.path.join(FIX, "mini_dblp.dtd"))
    assert any("missing #REQUIRED attribute 'key' on <article>" in e for e in errors)
    assert any("undeclared element <widget>" in e for e in errors)
    assert any("undeclared attribute 'isbn' on <book>" in e for e in errors)


def test_malformed_xml_reported(tmp_path):
    bad = tmp_path / "trunc.xml"
    bad.write_text('<?xml version="1.0"?>\n<dblp>\n<article key="a">\n')
    errors = validate_xml_structurally(str(bad), os.path.join(FIX, "mini_dblp.dtd"))
    assert any("malformed XML" in e for e in errors)
