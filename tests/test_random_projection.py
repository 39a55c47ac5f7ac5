"""Random-projection (JL) gates: the projected vectors preserve pairwise
cosine structure within the Achlioptas sign-matrix distortion envelope
(std ≈ 1/√RP_DIM per pair), and the serialized output parses cleanly.
Exact values are covered by the DuckDB oracle in test_oracle_parity.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq

from dblp_to_csv_spark.operators.similarity import (
    RP_DIM,
    embedding_random_projection,
)
from tests.conftest import SF_CORRECTNESS


def _cos_matrix(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return (m @ m.T) / (n * n.T)


def test_projection_preserves_cosine_statistically(spark):
    rows = embedding_random_projection(spark, SF_CORRECTNESS).collect()
    proj = {
        r["vec_id"]: np.array([float(x) for x in r["projected"].split("|")])
        for r in rows
    }
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=float)
        for r in pq.read_table(f"{SF_CORRECTNESS}/embeddings.parquet").to_pylist()
    }
    assert set(proj) == set(emb)
    ids = sorted(proj)[:200]
    p = np.stack([proj[i] for i in ids])
    e = np.stack([emb[i] for i in ids])
    assert p.shape[1] == RP_DIM
    iu = np.triu_indices(len(ids), 1)
    err = np.abs(_cos_matrix(e)[iu] - _cos_matrix(p)[iu])
    # measured at sf0.01: mean ≈ 0.199, corr ≈ 0.44 for RP_DIM=16 —
    # exactly the 1/√k JL envelope; margins are ~25% slack
    assert err.mean() < 0.25
    corr = np.corrcoef(_cos_matrix(e)[iu], _cos_matrix(p)[iu])[0, 1]
    assert corr > 0.3
