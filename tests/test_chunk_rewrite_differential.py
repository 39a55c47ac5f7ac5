"""Differential test for dedup_chunk_rewrite: the Spark rewrite is compared
cell-by-cell against an independent pure-Python implementation of the same
semantics (global first occurrence per non-overlapping CHUNK_WORDS-word
chunk, ordered by (doc_id, chunk_idx); tail always kept) on a randomized
corpus with planted duplication — intra-doc repeats, cross-doc shared
chunks, full-doc copies, sub-chunk docs, and exact-multiple lengths.
"""

from __future__ import annotations

import random

import pandas as pd

from dblp_to_csv_spark.operators.curation import CHUNK_WORDS


def _python_reference(texts: dict[int, str]) -> dict[int, tuple[str, int, int]]:
    """First-occurrence chunk dedup, reimplemented independently (dict walk
    in doc order — not a translation of the Spark plan)."""
    seen: set[str] = set()
    out: dict[int, tuple[str, int, int]] = {}
    for doc_id in sorted(texts):
        words = texts[doc_id].strip().lower().split()
        n_chunks = len(words) // CHUNK_WORDS
        kept_words: list[str] = []
        kept = dropped = 0
        for i in range(n_chunks):
            chunk = words[i * CHUNK_WORDS : (i + 1) * CHUNK_WORDS]
            key = " ".join(chunk)
            if key in seen:
                dropped += 1
            else:
                seen.add(key)
                kept += 1
                kept_words.extend(chunk)
        kept_words.extend(words[n_chunks * CHUNK_WORDS :])
        out[doc_id] = (" ".join(kept_words), kept, dropped)
    return out


def _corpus(seed: int, n_docs: int) -> dict[int, str]:
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]  # small vocab → natural collisions
    texts: dict[int, str] = {}
    for d in range(n_docs):
        n = rng.choice([3, 7, CHUNK_WORDS, 2 * CHUNK_WORDS, 25, 35, 80])
        words = [rng.choice(vocab) for _ in range(n)]
        if rng.random() < 0.4 and n >= 2 * CHUNK_WORDS:
            # plant an intra-doc duplicate chunk
            words[CHUNK_WORDS : 2 * CHUNK_WORDS] = words[:CHUNK_WORDS]
        texts[d] = " ".join(words)
    # plant cross-doc duplication: full copies and shared prefixes
    for d in range(n_docs, n_docs + 4):
        src = rng.randrange(n_docs)
        texts[d] = texts[src]
    for d in range(n_docs + 4, n_docs + 8):
        src = rng.randrange(n_docs)
        texts[d] = texts[src].split(" ", 1)[0] + " " + texts[src]
    return texts


def test_chunk_rewrite_matches_python_reference(spark, tmp_path):
    texts = _corpus(seed=7, n_docs=40)
    pd.DataFrame(
        {
            "doc_id": list(texts),
            "text": [texts[d] for d in texts],
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [len(texts[d]) for d in texts],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    from dblp_to_csv_spark.registry import all_queries

    got = {
        r["doc_id"]: (r["text_clean"], r["n_chunks_kept"], r["n_chunks_dropped"])
        for r in all_queries()["dedup_chunk_rewrite"].fn(spark, str(tmp_path)).collect()
    }
    want = _python_reference(texts)
    assert set(got) == set(want)
    for d in sorted(want):
        assert got[d] == want[d], f"doc {d}: {got[d]} != {want[d]}"
    # sanity: the planted duplication actually dropped something
    assert sum(v[2] for v in want.values()) > 0


def test_intradoc_rewrite_drops_repeated_chunks(spark, tmp_path):
    """A document that repeats its first 10-word chunk verbatim keeps only
    the first occurrence; a cross-document duplicate chunk is NOT dropped
    (intra-doc scope only)."""
    import pandas as pd

    from dblp_to_csv_spark.registry import all_queries

    chunk = " ".join(f"w{i}" for i in range(10))
    other = " ".join(f"x{i}" for i in range(10))
    tail = "short tail"
    pd.DataFrame(
        {
            "doc_id": [1, 2],
            # doc 1: chunk, chunk, other, tail → second chunk dropped
            "text": [f"{chunk} {chunk} {other} {tail}", f"{chunk} {tail}"],
            "lang": ["en"] * 2,
            "source": ["s"] * 2,
            "n_chars": [1, 1],
        }
    ).to_parquet(tmp_path / "documents.parquet")
    rows = {
        r["doc_id"]: r
        for r in all_queries()["dedup_intradoc_rewrite"]
        .fn(spark, str(tmp_path))
        .collect()
    }
    assert rows[1]["text_clean"] == f"{chunk} {other} {tail}"
    assert rows[1]["n_chunks_kept"] == 2 and rows[1]["n_chunks_dropped"] == 1
    # doc 2 repeats doc 1's chunk but has no INTERNAL repeat: untouched
    assert rows[2]["text_clean"] == f"{chunk} {tail}"
    assert rows[2]["n_chunks_dropped"] == 0
