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
