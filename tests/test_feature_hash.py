"""Semantic gates for the hashing-trick vectorizer beyond oracle parity:
unit norms, identical-text → identical-vector (the property that makes the
derived embeddings feed the cosine dedup/ANN machinery), and separation of
unrelated texts.
"""

from __future__ import annotations

import math

import pandas as pd

from dblp_to_csv_spark.registry import all_queries


def _vectors(spark, tmp_path, docs):
    pd.DataFrame(
        {"doc_id": [d for d, _ in docs], "text": [t for _, t in docs]}
    ).to_parquet(tmp_path / "documents.parquet")
    rows = (
        all_queries()["text_feature_hash_embedding"]
        .fn(spark, str(tmp_path))
        .collect()
    )
    return {
        r["doc_id"]: [float(x) for x in r["embedding"].split("|")] for r in rows
    }


def test_feature_hash_embedding_properties(spark, tmp_path):
    docs = [
        (0, "the quick brown fox jumps over the lazy dog tonight"),
        (1, "the quick brown fox jumps over the lazy dog tonight"),  # dup of 0
        (2, "completely different material about spark shuffle planning"),
        (3, "a third unrelated text mentioning parquet footers and pruning"),
    ]
    vecs = _vectors(spark, tmp_path, docs)
    # identical text -> identical vector (tokenization and hashing are pure)
    assert vecs[0] == vecs[1]
    # unrelated texts -> different vectors
    assert vecs[0] != vecs[2] and vecs[2] != vecs[3]
    # L2 norm == 1 at the rounding grid for any doc with tokens
    for d, v in vecs.items():
        assert abs(math.sqrt(sum(x * x for x in v)) - 1.0) < 1e-4, d
    # cosine ranks the duplicate first — the property that lets these
    # vectors feed the embedding-cosine dedup family directly
    def cos(a, b):
        return sum(x * y for x, y in zip(a, b))

    sims = {d: cos(vecs[0], v) for d, v in vecs.items() if d != 0}
    assert max(sims, key=sims.get) == 1
    assert sims[1] > sims[2] and sims[1] > sims[3]


def test_feature_hash_small_component_rendering(spark, tmp_path):
    """Regression (review r8): a component below 1e-3 must render as fixed
    decimal on both engines — Spark's plain string cast goes scientific
    ('5.0E-4') while DuckDB prints '0.0005', silently breaking the oracle
    hash only on corpora with large norms. One word repeated 2000x plus a
    single distinct word forces exactly that shape."""
    import duckdb

    docs = [(0, " ".join(["alpha"] * 2000) + " omega")]
    pd.DataFrame(
        {"doc_id": [d for d, _ in docs], "text": [t for _, t in docs]}
    ).to_parquet(tmp_path / "documents.parquet")
    entry = all_queries()["text_feature_hash_embedding"]
    got = entry.fn(spark, str(tmp_path)).collect()[0]["embedding"]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(entry.oracle).fetchone()[1]
    assert got == want
    assert "E" not in got and "e" not in got  # no scientific notation
    comps = [float(x) for x in got.split("|")]
    assert any(0 < abs(c) < 1e-3 for c in comps), (
        "fixture no longer produces a sub-1e-3 component"
    )
