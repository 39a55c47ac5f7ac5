"""curate_corpus composite: one MinHash→CC chain must serve both dedup
reports with outputs identical to the independently-registered queries
(which each rerun the chain so the driver can verify them in isolation).
"""

from __future__ import annotations

from tests.conftest import SF_CORRECTNESS


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_composite_matches_registered_queries(spark):
    from dblp_to_csv_spark.operators.curation import (
        curate_corpus,
        dedup_cluster_stats,
        dedup_keep_canonical,
    )
    from dblp_to_csv_spark.operators.dedup import dedup_graph_pagerank

    out = curate_corpus(spark, SF_CORRECTNESS)
    assert set(out) == {
        "labels", "cluster_stats", "keep_canonical", "pagerank", "clean_corpus"
    }
    stats = _rows(out["cluster_stats"])
    kept = _rows(out["keep_canonical"])
    assert stats == _rows(dedup_cluster_stats(spark, SF_CORRECTNESS))
    assert kept == _rows(dedup_keep_canonical(spark, SF_CORRECTNESS))
    # the shared-pair-frame PageRank equals the registered (chain-rerunning)
    # query bit-for-bit — fixed-point arithmetic leaves no tolerance
    assert _rows(out["pagerank"]) == _rows(
        dedup_graph_pagerank(spark, SF_CORRECTNESS)
    )
    assert stats and kept  # the sf0.01 corpus has real near-dup clusters
    # every clustered doc is labeled, only canonical members survive
    labels = {r["doc_id"]: r["component"] for r in out["labels"].collect()}
    kept_ids = {r[0] for r in kept}
    for doc_id, component in labels.items():
        assert (doc_id in kept_ids) == (doc_id == component)
    # clean_corpus: the passage-rewrite stage runs on exactly the canonical
    # survivors, and matches the independent pure-Python window-marking
    # reference on that subset (windows compared as tuples, no hashing)
    from tests.test_substring_dedup import _reference

    import duckdb

    kept_texts = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{SF_CORRECTNESS}/documents.parquet') ORDER BY doc_id"
    ).fetchall()
    kept_texts = [(d, t) for d, t in kept_texts if d in kept_ids]
    _, ref_rewrite = _reference(kept_texts)
    got = sorted(
        (r["doc_id"], r["text_clean"], r["n_words_dropped"])
        for r in out["clean_corpus"].collect()
    )
    assert got == sorted(ref_rewrite)
