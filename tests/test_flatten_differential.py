"""Differential flatten test: one seeded random corpus of deeply-nested
records is converted by the full Spark ETL, and every cell is compared
against an independent pure-Python reference flattener that replicates the
reference's end-event walk (XMLToCSV.py:127-138, 190-198) — tag-name
namespace at any depth, text-before-first-child, attributes gated on text.

One Spark run covers ~120 randomized records (many hypothesis-style examples
for the price of a single job). Values are alphanumeric so the ';'/'|' CSV
framing can't collide with data.
"""

from __future__ import annotations

import csv
import random
import xml.etree.ElementTree as ET

TAGS = ["aa", "bb", "cc", "dd"]
ATTRS = ["x", "y"]
N_RECORDS = 120
MAX_CHILDREN = 3
MAX_DEPTH = 4


def _gen_elem(rng: random.Random, depth: int, path: frozenset[str]) -> ET.Element:
    """Random element whose tag is NOT on the ancestor path (injective tag
    paths): the DTD-derived schema cuts self-recursive paths (documented
    degradation), so the differential corpus stays inside the exact regime —
    sibling repeats of the same tag are still generated freely."""
    tag = rng.choice([t for t in TAGS if t not in path])
    e = ET.Element(tag)
    for a in ATTRS:
        if rng.random() < 0.3:
            e.set(a, f"v{rng.randrange(100)}")
    has_text = rng.random() < 0.6
    if has_text:
        e.text = f"t{rng.randrange(1000)}"
    if depth < MAX_DEPTH and len(path) + 1 < len(TAGS):
        for _ in range(rng.randrange(0, MAX_CHILDREN + 1)):
            if rng.random() < (0.65 if depth < 2 else 0.35):
                child = _gen_elem(rng, depth + 1, path | {tag})
                # tail text (after a child, inside this element): the
                # reference reads only elem.text (before the first child) —
                # tails must never surface in any column
                if rng.random() < 0.3:
                    child.tail = f"tail{rng.randrange(100)}"
                e.append(child)
    return e


def _gen_corpus(rng: random.Random) -> ET.Element:
    root = ET.Element("dblp")
    for i in range(N_RECORDS):
        rec = ET.Element("rec")
        rec.set("key", f"k{i}")
        for _ in range(rng.randrange(0, MAX_CHILDREN + 2)):
            rec.append(_gen_elem(rng, 1, frozenset()))
        root.append(rec)
    return root


def _element_text(elem: ET.Element) -> str:
    """The engine's documented mixed-content semantics (COVERAGE.md
    deviation #1): the FIRST non-whitespace text segment of the element in
    document order, trimmed — the XML reader exposes segments with no
    before/after-child positions, so text-before-first-child (the
    reference's rule) is recoverable only when leading text exists; the two
    agree in exactly that (overwhelmingly common) case."""
    for seg in [elem.text] + [c.tail for c in elem]:
        if seg and seg.strip():
            return seg.strip()
    return ""


def _reference_flatten(rec: ET.Element) -> dict[str, list[str]]:
    """The reference's namespace semantics (every descendant contributes its
    text under its TAG name, depth lost; attributes under 'tag-attr' gated
    on the element having text; record attributes under their own names —
    XMLToCSV.py:121-138, 170, 190-198), with text defined per the engine's
    documented mixed-content deviation (see _element_text)."""
    out: dict[str, list[str]] = {}
    for a, v in rec.attrib.items():
        out.setdefault(a, []).append(v)
    for elem in rec.iter():
        if elem is rec:
            continue
        text = _element_text(elem)
        if text:
            out.setdefault(elem.tag, []).append(text)
            for a, v in elem.attrib.items():
                out.setdefault(f"{elem.tag}-{a}", []).append(v)
    return out


def test_flatten_differential_random_corpus(spark, tmp_path):
    from dblp_to_csv_spark.plans.etl import convert

    rng = random.Random(20260813)
    root = _gen_corpus(rng)
    xml_path = tmp_path / "rand.xml"
    ET.ElementTree(root).write(xml_path, encoding="unicode")
    decls = "".join(f"<!ELEMENT {t} (#PCDATA|{'|'.join(TAGS)})*>\n" for t in TAGS)
    attls = "".join(f"<!ATTLIST {t} x CDATA #IMPLIED y CDATA #IMPLIED>\n" for t in TAGS)
    (tmp_path / "rand.dtd").write_text(
        f"<!ELEMENT dblp (rec)*>\n<!ELEMENT rec (#PCDATA|{'|'.join(TAGS)})*>\n"
        f"<!ATTLIST rec key CDATA #REQUIRED>\n{decls}{attls}"
    )
    convert(spark, str(xml_path), str(tmp_path / "rand.dtd"), str(tmp_path / "out.csv"))

    with open(tmp_path / "out_rec.csv", encoding="utf-8") as f:
        rows = {r["key"]: r for r in csv.DictReader(f, delimiter=";")}
    assert len(rows) > 0

    checked_cells = 0
    for rec in root:
        want = _reference_flatten(rec)
        key = rec.get("key")
        if not want or list(want) == ["key"]:
            # empty record: reference drops it from output too (F1)
            assert key not in rows or all(
                v == "" for c, v in rows[key].items() if c not in ("id", "key")
            )
            continue
        got = rows[key]
        for col, values in want.items():
            expected = "|".join(sorted(values))
            assert got.get(col, "") == expected, (
                f"record {key} column {col}: got {got.get(col)!r}, "
                f"want {expected!r}"
            )
            checked_cells += 1
        # no phantom values: columns the reference left empty must be empty
        for col, v in got.items():
            if col not in want and col not in ("id",):
                assert v == "", f"record {key}: unexpected value in {col}: {v!r}"
    assert checked_cells > 300  # the corpus actually exercised the namespace
