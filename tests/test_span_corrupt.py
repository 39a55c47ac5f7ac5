"""Span-corruption invariants: splicing each target span back into its
input sentinel reconstructs the original token sequence exactly (the
round-trip property the T5 objective depends on), and mask accounting is
consistent."""

from __future__ import annotations

import re

import pyarrow.parquet as pq

from dblp_to_csv_spark.operators.pipeline import augment_span_corrupt
from tests.conftest import SF_CORRECTNESS


def _splice(input_text: str, target_text: str) -> list[str]:
    spans: dict[str, list[str]] = {}
    cur = None
    for tok in target_text.split():
        if re.fullmatch(r"<extra_id_\d+>", tok):
            cur = tok
            spans[cur] = []
        else:
            spans[cur].append(tok)
    out: list[str] = []
    for tok in input_text.split():
        if re.fullmatch(r"<extra_id_\d+>", tok):
            out.extend(spans[tok])
        else:
            out.append(tok)
    return out


def test_roundtrip_reconstructs_original(spark):
    rows = {r["doc_id"]: r for r in augment_span_corrupt(spark, SF_CORRECTNESS).collect()}
    docs = pq.read_table(f"{SF_CORRECTNESS}/documents.parquet").to_pylist()
    n_with_spans = 0
    for d in docs:
        orig = [w for w in re.split(r"[^a-z0-9]+", d["text"].lower()) if w]
        r = rows[d["doc_id"]]
        assert _splice(r["input_text"], r["target_text"]) == orig
        assert r["n_masked"] == len(orig) - len(
            [t for t in r["input_text"].split() if not re.fullmatch(r"<extra_id_\d+>", t)]
        )
        assert r["n_spans"] <= r["n_masked"]
        n_with_spans += r["n_spans"] > 0
    assert n_with_spans > len(docs) * 0.5  # the 12.5% rate actually masks


def test_no_token_document_yields_empty_example(spark, tmp_path):
    """A document with no [a-z0-9] characters tokenizes to [] — the
    sequence(1, 0)-descending / element_at(msk, 0) crash class (review r8
    session 4, reproduced): must yield an empty example row on BOTH
    engines, not INVALID_INDEX_OF_ZERO."""
    import duckdb
    import pandas as pd

    pd.DataFrame(
        {"doc_id": [0], "text": ["!!! ???"], "lang": ["en"],
         "source": ["s"], "n_chars": [7]}
    ).to_parquet(tmp_path / "documents.parquet")
    row = augment_span_corrupt(spark, str(tmp_path)).collect()[0]
    assert (row["input_text"], row["target_text"], row["n_masked"]) == ("", "", 0)
    from dblp_to_csv_spark.registry import all_queries

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(all_queries()["augment_span_corrupt"].oracle).df()
    assert list(want["input_text"]) == [""] and list(want["n_masked"]) == [0]
