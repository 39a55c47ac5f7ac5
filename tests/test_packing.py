"""Sequence-packing operators: the SQL-oracled concat-then-chunk assignment
and the applyInPandas greedy next-fit packer (rows-only by declared design —
running accumulation with reset has no window-function twin, so parity is
pinned here against a pure-Python reference instead)."""

from __future__ import annotations

import pandas as pd

from dblp_to_csv_spark.operators.pipeline import PACK_BUDGET
from dblp_to_csv_spark.registry import all_queries
from tests.conftest import SF_CORRECTNESS


def _reference_next_fit(rows: list[tuple[int, int]]) -> dict[int, int]:
    """(doc_id, n_tokens) ordered by doc_id → doc_id → pack_id."""
    out, fill, current = {}, 0, 0
    for doc_id, t in sorted(rows):
        if fill > 0 and fill + t > PACK_BUDGET:
            current += 1
            fill = 0
        fill += t
        out[doc_id] = current
    return out


def test_greedy_matches_python_reference(spark):
    df = all_queries()["pack_sequences_greedy"].fn(spark, SF_CORRECTNESS)
    pdf = df.toPandas()
    for bucket, grp in pdf.groupby("bucket"):
        want = _reference_next_fit(
            list(zip(grp["doc_id"], grp["n_tokens"]))
        )
        got = dict(zip(grp["doc_id"], grp["pack_id"]))
        assert got == want, f"bucket {bucket}: next-fit divergence"


def test_greedy_invariants(spark):
    """No bin exceeds the budget unless it holds a single oversized doc;
    pack ids are contiguous from 0 within each bucket."""
    pdf = (
        all_queries()["pack_sequences_greedy"]
        .fn(spark, SF_CORRECTNESS)
        .toPandas()
    )
    assert len(pdf) > 0
    for (bucket, pack), grp in pdf.groupby(["bucket", "pack_id"]):
        assert grp["n_tokens"].sum() <= PACK_BUDGET or len(grp) == 1
    for bucket, grp in pdf.groupby("bucket"):
        ids = sorted(grp["pack_id"].unique())
        assert ids == list(range(len(ids)))


def test_chunk_assignment_covers_all_docs(spark):
    """Every document gets exactly one chunk assignment and chunk ids are
    dense enough: max chunk id ≈ total tokens / budget within each bucket."""
    pdf = (
        all_queries()["pack_concat_chunks"].fn(spark, SF_CORRECTNESS).toPandas()
    )
    n_docs = pd.read_parquet(f"{SF_CORRECTNESS}/documents.parquet").shape[0]
    assert len(pdf) == n_docs
    for bucket, grp in pdf.groupby("bucket"):
        # chunk of the LAST doc in packing order (doc_id asc) = start offset
        # of that doc over the budget; collect order is arbitrary, so sort
        grp = grp.sort_values("doc_id")
        assert (
            grp["chunk_id"].max()
            == (grp["n_tokens"].sum() - grp["n_tokens"].iloc[-1]) // PACK_BUDGET
        )
