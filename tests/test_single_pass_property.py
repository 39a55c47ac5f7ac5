"""Property-based check of the single-pass byte-range scanner: on random
corpora (random record mix, attributes, self-closing records, nested
same-name elements below record level, multibyte text) and ADVERSARIAL split
sizes, the scanner must emit exactly the records a whole-file reference
parse sees — same types, same order, same snippets.

The scanner is pure Python (no Spark session needed): _plan_ranges +
_RangeScanner are driven directly, which keeps hypothesis fast enough to
run hundreds of corpora.
"""

from __future__ import annotations

import os
import tempfile
import xml.etree.ElementTree as ET

from hypothesis import given, settings
from hypothesis import strategies as st

from dblp_to_csv_spark.sources.xml_single_pass import _RangeScanner

RECORD_TYPES = ["article", "book", "www", "art"]  # "art" is a prefix of "article"

_text = st.text(
    alphabet=st.sampled_from("abyz 日本語é&<>/ \n\t"),
    max_size=20,
).map(
    # escape XML metacharacters out of text positions (& first)
    lambda s: s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
)


@st.composite
def record(draw):
    t = draw(st.sampled_from(RECORD_TYPES))
    if draw(st.booleans()) and draw(st.booleans()):
        return f'<{t} key="k{draw(st.integers(0, 99))}"/>'
    fields = []
    for _ in range(draw(st.integers(0, 3))):
        tag = draw(st.sampled_from(["author", "title", "note"]))
        body = draw(_text)
        if draw(st.booleans()):
            # nested same-name element BELOW record level
            body += f"<{tag}>{draw(_text)}</{tag}>"
        fields.append(f"<{tag}>{body}</{tag}>")
    attr = f' mdate="2020-01-0{draw(st.integers(1, 9))}"' if draw(st.booleans()) else ""
    return f"<{t}{attr}>{''.join(fields)}</{t}>"


@st.composite
def corpus(draw):
    recs = draw(st.lists(record(), min_size=0, max_size=12))
    sep = draw(st.sampled_from(["\n", "", "  \n", "\n\n"]))
    return "<?xml version=\"1.0\"?>\n<dblp>" + sep + sep.join(recs) + sep + "</dblp>"


def _reference_records(doc: str) -> list[tuple[str, str]]:
    """Whole-file parse: the records are the root's direct children whose
    tag is a record type (the reference engine's own definition,
    XMLToCSV.py:120-121), re-serialized canonically."""
    root = ET.fromstring(doc)
    out = []
    for child in root:
        if child.tag in RECORD_TYPES:
            out.append((child.tag, ET.canonicalize(ET.tostring(child, encoding="unicode"))))
    return out


@settings(max_examples=150, deadline=None)
@given(doc=corpus(), split=st.integers(3, 200))
def test_scanner_matches_reference_parse(doc: str, split: int):
    data = doc.encode("utf-8")
    with tempfile.NamedTemporaryFile(delete=False, suffix=".xml") as f:
        f.write(data)
        path = f.name
    try:
        got: list[tuple[int, str, str]] = []
        for start in range(0, len(data), split):
            end = min(start + split, len(data))
            with open(path, "rb") as fh:
                fh.seek(start)
                for tag, off, blob in _RangeScanner(
                    fh, start, end, RECORD_TYPES
                ).records():
                    got.append(
                        (off, tag, ET.canonicalize(blob.decode("utf-8")))
                    )
        # exactly-once ownership: offsets strictly increasing, no duplicates
        offsets = [o for o, _, _ in got]
        assert offsets == sorted(set(offsets))
        assert [(t, x) for _, t, x in got] == _reference_records(doc)
    finally:
        os.unlink(path)


# ---------------------------------------------------------------------------
# Review-r8 regressions: codec/directory/encoding handling in _plan_ranges
# and the torn-token margin for long element names.
# ---------------------------------------------------------------------------
import bz2
import pytest

from dblp_to_csv_spark.sources.xml_single_pass import (
    _EXTEND_CHUNK,
    _plan_ranges,
    _scan_spec,
    sniff_encoding,
)


def _scan_all(path, types, step=1 << 20):
    out = []
    for p, s, e, gz in _plan_ranges(path, step):
        out.extend(_scan_spec(p, s, e, gz, types))
    return out


def test_bz2_input_scans(tmp_path):
    """A .bz2 corpus must decompress-scan (stdlib codec), not byte-scan
    compressed bytes into a silently empty envelope."""
    xml = b'<?xml version="1.0"?>\n<dblp><article key="a"><t>x</t></article></dblp>'
    p = tmp_path / "c.xml.bz2"
    p.write_bytes(bz2.compress(xml))
    recs = _scan_all(str(p), ["article"])
    assert [r[0] for r in recs] == ["article"]


def test_unsupported_codec_raises(tmp_path):
    (tmp_path / "c.xml.zst").write_bytes(b"\x28\xb5\x2f\xfd junk")
    with pytest.raises(ValueError, match="cannot byte-scan"):
        _plan_ranges(str(tmp_path / "c.xml.zst"), 1 << 20)


def test_directory_input_expands(tmp_path):
    d = tmp_path / "dumps"
    d.mkdir()
    for i in range(2):
        (d / f"p{i}.xml").write_bytes(
            f'<dblp><article key="a{i}"><t>x</t></article></dblp>'.encode()
        )
    recs = _scan_all(str(d), ["article"])
    assert len(recs) == 2


def test_declared_latin1_encoding_decodes(tmp_path):
    """A declared ISO-8859-1 corpus with raw high bytes must sniff and
    decode, where a hard-coded utf-8 decode raised UnicodeDecodeError."""
    body = '<?xml version="1.0" encoding="ISO-8859-1"?>\n<dblp><article key="a"><t>caf\xe9</t></article></dblp>'
    p = tmp_path / "c.xml"
    p.write_bytes(body.encode("iso-8859-1"))
    assert sniff_encoding(str(p)) == "iso-8859-1"
    recs = _scan_all(str(p), ["article"])
    assert recs[0][2].decode("iso-8859-1").count("café") == 1


def test_utf16_rejected_loudly(tmp_path):
    p = tmp_path / "c.xml"
    p.write_bytes('<?xml version="1.0"?><dblp/>'.encode("utf-16"))
    with pytest.raises(ValueError, match="UTF-16"):
        sniff_encoding(str(p))


def test_long_element_name_straddles_chunk_boundary(tmp_path):
    """A record-type name longer than the old fixed 64-byte torn-token tail,
    with its opening tag straddling the 1 MiB extension boundary, must still
    be found (the margin now derives from the longest type name)."""
    name = "x" * 80
    rec = f'<{name} key="a"><t>hit</t></{name}>'
    header = "<dblp>\n"
    # place the opening '<' 10 bytes before the first extension boundary so
    # the tag is torn mid-name on the first read
    pad = b"z" * (_EXTEND_CHUNK - len(header) - 10)
    p = tmp_path / "c.xml"
    p.write_bytes(header.encode() + pad + rec.encode() + b"\n</dblp>")
    recs = _scan_all(str(p), [name], step=1 << 30)
    assert [r[0] for r in recs] == [name]
