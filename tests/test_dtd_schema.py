"""Unit tests for the DTD-derived Spark read schema (build_record_schema):
structure fidelity, recursion cutting, attribute placement, and the
parameter-entity fallback — no Spark session needed."""

from __future__ import annotations

from pyspark.sql import types as T

from dblp_to_csv_spark.sources.dtd import build_record_schema, get_element_children


def _write(tmp_path, text):
    p = tmp_path / "t.dtd"
    p.write_text(text)
    return str(p)


def test_children_map_models(tmp_path):
    dtd = _write(
        tmp_path,
        "<!ELEMENT root (a)*>\n<!ELEMENT a (#PCDATA|b)*>\n<!ELEMENT b EMPTY>\n"
        "<!ELEMENT c ANY>\n<!ELEMENT d (%ent;)*>\n",
    )
    kids = get_element_children(dtd)
    assert kids["a"] == {"b"}
    assert kids["b"] == set()
    assert kids["c"] == {"root", "a", "b", "c", "d"}  # ANY = all declared
    assert kids["d"] is None  # parameter entity: undeterminable


def test_schema_structure_and_attrs(tmp_path):
    dtd = _write(
        tmp_path,
        "<!ELEMENT dblp (article)*>\n"
        "<!ELEMENT article (title|year)*>\n"
        "<!ELEMENT title (#PCDATA|i)*>\n"
        "<!ELEMENT i (#PCDATA)>\n"
        "<!ELEMENT year (#PCDATA)>\n"
        '<!ATTLIST article key CDATA #REQUIRED>\n'
        '<!ATTLIST title lang CDATA #IMPLIED>\n',
    )
    schema, cuts = build_record_schema(dtd, "article")
    assert cuts == []
    fields = {f.name: f.dataType for f in schema.fields}
    assert fields["_key"] == T.StringType()  # record attribute
    # title: struct (has attr + child); year: plain leaf array<string>
    assert fields["year"] == T.ArrayType(T.StringType())
    title_elem = fields["title"].elementType
    tf = {f.name: f.dataType for f in title_elem.fields}
    assert tf["_VALUE"] == T.ArrayType(T.StringType())  # mixed segments
    assert tf["_lang"] == T.StringType()
    assert tf["i"] == T.ArrayType(T.StringType())


def test_recursive_model_is_cut(tmp_path):
    dtd = _write(
        tmp_path,
        "<!ELEMENT dblp (a)*>\n<!ELEMENT a (#PCDATA|b)*>\n"
        "<!ELEMENT b (#PCDATA|a)*>\n",  # a > b > a cycle
    )
    schema, cuts = build_record_schema(dtd, "a")
    assert any("a > b > a" in c for c in cuts)
    a_elem = {f.name: f for f in schema.fields}["b"].dataType.elementType
    inner_a = {f.name: f.dataType for f in a_elem.fields}["a"]
    assert inner_a == T.ArrayType(T.StringType())  # degraded at the cut


def test_parameter_entity_falls_back(tmp_path):
    dtd = _write(
        tmp_path,
        "<!ELEMENT dblp (rec)*>\n<!ELEMENT rec (%fields;)*>\n",
    )
    schema, cuts = build_record_schema(dtd, "rec")
    assert schema is None and cuts == []


def test_parameter_entity_deep_falls_back(tmp_path):
    """Opaqueness anywhere in the reachable subtree must disable the DTD
    schema for the whole record type (a partial schema would silently drop
    the opaque element's children)."""
    dtd = _write(
        tmp_path,
        "<!ELEMENT dblp (rec)*>\n<!ELEMENT rec (sub)*>\n"
        "<!ELEMENT sub (%inner;)*>\n",
    )
    schema, cuts = build_record_schema(dtd, "rec")
    assert schema is None
