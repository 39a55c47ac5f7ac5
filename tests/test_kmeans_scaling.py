"""Corpus-scaled k for the deterministic k-means quantizer (VERDICT r7 #2):
``kmeans_cells`` must default k to ceil(N / target_cell_rows) so that cell
sizes stay BOUNDED as the corpus grows — with a fixed k, the in-cell
quadratic work (SemDeDup pair search, IVF probe) grows as the square of any
scale-up; with corpus-scaled k it stays linear. The registered sf0.01
queries pass k=IVF_CELLS explicitly so their DuckDB oracles (which embed
the constant) remain in lock-step — also pinned here.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from dblp_to_csv_spark.operators.similarity import IVF_CELLS, kmeans_cells

_DIM = 4
_TARGET = 50


def _emb(spark, n: int, seed: int = 7):
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(_DIM)]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, emb array<double>")


def _cell_sizes(cells) -> list[int]:
    return [
        r["c"] for r in cells.groupBy("cell").agg(F.count("*").alias("c")).collect()
    ]


def test_default_k_scales_with_corpus(spark):
    """Doubling N doubles the cell count; max cell size stays bounded near
    the target instead of doubling."""
    maxes = {}
    for n in (8 * _TARGET, 16 * _TARGET):
        cells = kmeans_cells(_emb(spark, n), target_cell_rows=_TARGET)
        sizes = _cell_sizes(cells)
        assert sum(sizes) == n  # every vector assigned exactly once
        assert len(sizes) == n // _TARGET  # k = ceil(N/target), no empty cells here
        # one Lloyd step on uniform data is imperfectly balanced; 3x the
        # target is a generous bound that a FIXED k (avg cell = N/8) would
        # blow through at the larger N if k stopped scaling
        assert max(sizes) <= 3 * _TARGET
        maxes[n] = max(sizes)
    # the bounded-cell property itself: 2x the data must NOT 2x the largest
    # cell (observed 65 -> 74 on this seed)
    assert maxes[16 * _TARGET] <= 1.5 * maxes[8 * _TARGET]


def test_explicit_k_respected_and_deterministic(spark):
    """Registered queries pin k=IVF_CELLS for oracle stability: explicit k
    must win over the corpus-scaled default, cover every vector, and be
    reproducible (md5-min seeds make any k deterministic)."""
    df = _emb(spark, 300)
    a = kmeans_cells(df, k=5)
    assert a.select("cell").distinct().count() == 5
    assert a.count() == 300
    b = kmeans_cells(df, k=5)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    # the sf0.01 query path: k=IVF_CELLS regardless of corpus size
    c = kmeans_cells(df, k=IVF_CELLS)
    assert c.select("cell").distinct().count() == IVF_CELLS


def test_session_checkpoint_root_bounds_tempdir_growth(spark, tmp_path):
    """Checkpointing operators must not leak one tempfile.mkdtemp per
    invocation (VERDICT r7 #6): every default-location checkpoint lands
    under ONE session-scoped root (removed atexit), and an explicit
    checkpoint_dir= is honored verbatim."""
    import dblp_to_csv_spark.session as sess
    from dblp_to_csv_spark.operators.dedup import dedup_semantic_semdedup

    sf_dir = "/root/testdata/sf0.001"
    dedup_semantic_semdedup(spark, sf_dir).count()
    root = sess._CKPT_ROOT  # created lazily by the call above (or earlier)
    assert root is not None
    import os

    before = set(os.listdir(root))
    dedup_semantic_semdedup(spark, sf_dir).count()
    after = set(os.listdir(root))
    # the second invocation checkpointed under the SAME root (one new subdir
    # there, nothing anywhere else to leak)
    new = after - before
    assert len(new) == 1 and next(iter(new)).startswith("_semdedup_")
    # explicit location wins over the managed root
    explicit = str(tmp_path / "cells")
    dedup_semantic_semdedup(spark, sf_dir, checkpoint_dir=explicit).count()
    assert os.path.exists(explicit)
    assert set(os.listdir(root)) == after


def test_semdedup_corpus_scaled_k_drops_only_true_near_dups(spark):
    """The production path (k=None → corpus-scaled cells) must preserve the
    SemDeDup safety invariant regardless of where the cell boundaries land:
    every dropped vector has an exact cosine-≥-threshold partner with a
    smaller id (ground truth via the parity-gated GEMM scorer)."""
    from dblp_to_csv_spark.operators.dedup import (
        dedup_semantic_semdedup,
        embedding_cosine_pairs_blas,
    )
    from tests.conftest import SF_CORRECTNESS

    sem = dedup_semantic_semdedup(spark, SF_CORRECTNESS, k=None)
    dropped = {r["vec_id"] for r in sem.collect() if not r["kept"]}
    partners = {
        r["vec_b"]
        for r in embedding_cosine_pairs_blas(spark, SF_CORRECTNESS).collect()
    }
    assert dropped <= partners
    # with 500 vectors and TARGET_CELL_ROWS=4096 the default collapses to
    # k=1 — every vector in one cell, i.e. the EXACT all-pairs semantics:
    # drops equal the full partner set
    assert dropped == partners
