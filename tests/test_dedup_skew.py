"""Adversarial skew: a corpus where ~15% of documents are IDENTICAL (the
boilerplate cluster every crawl corpus has). The LSH paths must complete with
correct results — the hot band key produces a dense candidate clique, which
is the worst case for the band join's per-key fan-out (quadratic in the
clique, by construction: identical docs ARE all near-dup pairs, so the
output itself is quadratic in the clique — candidate generation cannot do
better than the answer size; the mitigation at corpus scale is collapsing
exact duplicates FIRST, which is what the pipeline_c4_keep gate and
dedup_exact_documents do upstream).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


N_UNIQUE = 60
N_CLONES = 12  # one text repeated this many times → 66 identical pairs


@pytest.fixture(scope="module")
def skewed_docs_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("skew")
    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa".split()
    rows = []
    for i in range(N_UNIQUE):
        # the word rotation cycles every len(words) docs — suffix a unique
        # token so only the boilerplate clique has true duplicates
        text = " ".join(words[(i + j) % len(words)] for j in range(30)) + f" uniq{i}"
        rows.append((i, f"doc {i}", text, "en"))
    boiler = "the same boilerplate text repeated across the crawl " * 4
    for i in range(N_CLONES):
        rows.append((N_UNIQUE + i, f"clone {i}", boiler, "en"))
    spark.createDataFrame(
        rows, "doc_id long, title string, text string, lang string"
    ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


def test_minhash_lsh_survives_identical_cluster(spark, skewed_docs_dir):
    from dblp_to_csv_spark.operators.dedup import dedup_minhash_lsh

    pairs = dedup_minhash_lsh(spark, skewed_docs_dir).collect()
    clone_ids = set(range(N_UNIQUE, N_UNIQUE + N_CLONES))
    clone_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in pairs
        if r["doc_a"] in clone_ids and r["doc_b"] in clone_ids
    }
    # every identical pair found, jaccard exactly 1
    assert len(clone_pairs) == N_CLONES * (N_CLONES - 1) // 2
    assert all(
        r["jaccard"] == 1.0 for r in pairs if (r["doc_a"], r["doc_b"]) in clone_pairs
    )


def test_exact_dedup_collapses_clones_first(spark, skewed_docs_dir):
    """The production order: exact dedup collapses the clique to ONE canonical
    doc before any near-dup pass — the quadratic clique never reaches LSH."""
    from dblp_to_csv_spark.operators.dedup import dedup_exact_documents

    out = dedup_exact_documents(spark, skewed_docs_dir)
    boiler_groups = out.filter(F.col("n_copies") > 1).collect()
    assert len(boiler_groups) == 1
    assert boiler_groups[0]["n_copies"] == N_CLONES
    assert boiler_groups[0]["doc_id"] == N_UNIQUE  # lowest clone id kept


def test_simhash_banding_survives_identical_cluster(spark, skewed_docs_dir):
    from dblp_to_csv_spark.operators.dedup import dedup_simhash

    pairs = dedup_simhash(spark, skewed_docs_dir).collect()
    clone_ids = set(range(N_UNIQUE, N_UNIQUE + N_CLONES))
    clone_pairs = {
        (r["doc_a"], r["doc_b"])
        for r in pairs
        if r["doc_a"] in clone_ids and r["doc_b"] in clone_ids
    }
    assert len(clone_pairs) == N_CLONES * (N_CLONES - 1) // 2
    assert all(
        r["hamming"] == 0 for r in pairs if (r["doc_a"], r["doc_b"]) in clone_pairs
    )
