"""Differential gate for the exact-substring dedup family: an independent
pure-Python implementation of the window-marking algorithm (no md5, no SQL —
windows compared as tuples, so a shared hashing mistake cannot pass) is run
against the Spark operators on crafted corpora with planted duplicates and
on seeded random corpora. The crafted cases pin exactly the behaviors that
distinguish sliding-window dedup from the chunk-aligned variant:
misaligned cross-document passages, intra-document repeats, overlap
merging, and the first-occurrence guarantee.
"""

from __future__ import annotations

import random
import re

import pandas as pd
import pytest

from dblp_to_csv_spark.operators.curation import SPAN_WORDS
from dblp_to_csv_spark.registry import all_queries


def _words(text: str) -> list[str]:
    return [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]


def _reference(docs: list[tuple[int, str]]):
    """Pure-Python window marking: returns (spans rows, rewrite rows) in the
    operators' schemas."""
    toks = {d: _words(t) for d, t in docs}
    first: dict[tuple, tuple[int, int]] = {}
    occs: list[tuple[int, int, tuple]] = []
    for d in sorted(toks):
        w = toks[d]
        for p in range(len(w) - SPAN_WORDS + 1):
            win = tuple(w[p : p + SPAN_WORDS])
            occs.append((d, p, win))
            if win not in first or (d, p) < first[win]:
                first[win] = (d, p)
    counts: dict[tuple, int] = {}
    for _, _, win in occs:
        counts[win] = counts.get(win, 0) + 1
    marked: dict[int, list[int]] = {}
    for d, p, win in occs:
        if counts[win] > 1 and first[win] != (d, p):
            marked.setdefault(d, []).append(p)
    spans_rows, rewrite_rows = [], []
    for d in sorted(toks):
        w = toks[d]
        n_win = max(len(w) - SPAN_WORDS + 1, 0)
        starts = sorted(marked.get(d, []))
        # longest run of consecutive starts -> longest duplicated passage
        longest = cur = 0
        prev = None
        for s in starts:
            cur = cur + 1 if prev is not None and s == prev + 1 else 1
            longest = max(longest, cur)
            prev = s
        spans_rows.append(
            (d, n_win, len(starts), longest + SPAN_WORDS - 1 if starts else 0)
        )
        dropped = set()
        for s in starts:
            dropped.update(range(s, s + SPAN_WORDS))
        kept = [w[j] for j in range(len(w)) if j not in dropped]
        rewrite_rows.append((d, " ".join(kept), len(w) - len(kept)))
    return spans_rows, rewrite_rows


def _run(spark, tmp_path, docs: list[tuple[int, str]]):
    pd.DataFrame(
        {"doc_id": [d for d, _ in docs], "text": [t for _, t in docs]}
    ).to_parquet(tmp_path / "documents.parquet")
    q = all_queries()
    spans = sorted(
        (r["doc_id"], r["n_windows"], r["n_dup_windows"], r["longest_dup_span"])
        for r in q["dedup_substring_spans"].fn(spark, str(tmp_path)).collect()
    )
    rewrite = sorted(
        (r["doc_id"], r["text_clean"], r["n_words_dropped"])
        for r in q["dedup_substring_rewrite"].fn(spark, str(tmp_path)).collect()
    )
    return spans, rewrite


def _check(spark, tmp_path, docs):
    ref_spans, ref_rewrite = _reference(docs)
    got_spans, got_rewrite = _run(spark, tmp_path, docs)
    assert got_spans == sorted(ref_spans)
    assert got_rewrite == sorted(ref_rewrite)


PASSAGE = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


def test_misaligned_cross_doc_passage(spark, tmp_path):
    """A passage repeated at DIFFERENT word offsets: chunk-aligned dedup
    misses it, sliding windows must cut the later copy and keep the first
    verbatim."""
    docs = [
        (0, "intro words here " + PASSAGE + " trailing material one two"),
        (1, "a very different and much longer leading runway " + PASSAGE),
    ]
    _check(spark, tmp_path, docs)
    # and the first occurrence survived verbatim
    _, rewrite = _run(spark, tmp_path, docs)
    assert PASSAGE in rewrite[0][1]
    assert PASSAGE not in rewrite[1][1]


def test_intra_document_repeat(spark, tmp_path):
    docs = [(0, PASSAGE + " filler middle words go here " + PASSAGE)]
    _check(spark, tmp_path, docs)


def test_overlapping_windows_merge(spark, tmp_path):
    """A duplicated passage longer than SPAN_WORDS produces overlapping
    marked windows whose covered positions must union into ONE cut."""
    long_passage = PASSAGE + " lambda mu nu xi omicron pi rho sigma"
    docs = [
        (0, long_passage + " unique tail zero"),
        (1, "unique head one " + long_passage),
    ]
    _check(spark, tmp_path, docs)


def test_short_empty_and_fully_duplicated_docs(spark, tmp_path):
    docs = [
        (0, "tiny doc"),  # < SPAN_WORDS words: no windows
        (1, ""),  # empty
        (2, PASSAGE),  # exactly the passage
        (3, PASSAGE),  # full duplicate -> rewritten to empty
        (4, "no duplication in this document at all nine words"),
    ]
    _check(spark, tmp_path, docs)
    _, rewrite = _run(spark, tmp_path, docs)
    by_id = {d: (t, n) for d, t, n in rewrite}
    assert by_id[2][0] != ""  # first occurrence kept
    assert by_id[3][0] == ""  # duplicate fully cut


@pytest.mark.parametrize("seed", [7, 11, 13])
def test_random_corpus_matches_reference(spark, tmp_path, seed):
    """Seeded random corpora over a SMALL vocabulary (so SPAN_WORDS-word
    collisions actually occur naturally) plus planted passage copies."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(12)]
    passages = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(SPAN_WORDS, 15)))
        for _ in range(3)
    ]
    docs = []
    for d in range(15):
        parts = [rng.choice(vocab) for _ in range(rng.randint(0, 20))]
        if rng.random() < 0.6:
            parts.append(rng.choice(passages))
        parts.extend(rng.choice(vocab) for _ in range(rng.randint(0, 10)))
        docs.append((d, " ".join(parts)))
    _check(spark, tmp_path, docs)


def test_incremental_sequential_equals_batch(spark, tmp_path):
    """Split-invariance of the incremental path: feeding b1 then b2 through
    substring_dedup_incremental (persistent window-hash index between them)
    must equal the one-shot batch rewrite over b1 ∪ b2 — b1's doc_ids sort
    below b2's, so 'historical hit' == 'earlier batch held the canonical'."""
    from dblp_to_csv_spark.operators.incremental import substring_dedup_incremental

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(10)]
    passages = [
        " ".join(rng.choice(vocab) for _ in range(rng.randint(SPAN_WORDS, 14)))
        for _ in range(3)
    ]

    def make_doc(d):
        parts = [rng.choice(vocab) for _ in range(rng.randint(0, 12))]
        if rng.random() < 0.7:
            parts.append(rng.choice(passages))
        parts.extend(rng.choice(vocab) for _ in range(rng.randint(0, 8)))
        return (d, " ".join(parts))

    docs = [make_doc(d) for d in range(20)]
    b1, b2 = docs[:10], docs[10:]

    # one-shot batch reference over the union
    _, batch_rewrite = _run(spark, tmp_path, docs)

    index_dir = str(tmp_path / "widx")
    staging = str(tmp_path / "stage")
    got = []
    for batch in (b1, b2):
        bdf = spark.createDataFrame(batch, "doc_id long, text string")
        out = substring_dedup_incremental(spark, bdf, index_dir, staging_dir=staging)
        got.extend(
            (r["doc_id"], r["text_clean"], r["n_words_dropped"])
            for r in out.collect()
        )
    assert sorted(got) == batch_rewrite


def test_incremental_index_probe_prunes_partitions(spark, tmp_path):
    """The history probe must read the index PARTITION-PRUNED (the exact/
    minhash incremental contract): PartitionFilters with the batch's
    prefixes appear on the index scan."""
    from dblp_to_csv_spark.operators.incremental import (
        _PREFIX_LEN,
        _read_index,
        substring_dedup_incremental,
    )
    from pyspark.sql import functions as F

    index_dir = str(tmp_path / "widx")
    staging = str(tmp_path / "stage")
    b1 = spark.createDataFrame(
        [(0, PASSAGE + " one two three four five six seven eight")],
        "doc_id long, text string",
    )
    substring_dedup_incremental(spark, b1, index_dir, staging_dir=staging)
    probe = _read_index(spark, index_dir, "h string, prefix string").filter(
        F.col("prefix").isin(["ab", "cd"])
    )
    plan = probe._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "prefix" in plan


def test_streaming_foreachbatch_substring_dedup(spark, tmp_path):
    """The production composition at window granularity: a document STREAM
    rewrites each microbatch against the persistent window-hash index via
    foreachBatch — a passage that arrived in an earlier microbatch is cut
    from later arrivals, the stream's own history building the index."""
    import json as _json

    from dblp_to_csv_spark.operators.incremental import substring_dedup_incremental

    src = tmp_path / "src"
    src.mkdir()
    idx = str(tmp_path / "widx")
    lake = str(tmp_path / "lake")
    ckpt = str(tmp_path / "ckpt")

    def land(name, rows):
        (src / name).write_text(
            "\n".join(_json.dumps({"doc_id": i, "text": t}) for i, t in rows)
        )

    def handle(batch_df, batch_id):
        out = substring_dedup_incremental(
            spark, batch_df, idx, staging_dir=str(tmp_path / f"stage_{batch_id}")
        )
        out.write.mode("append").parquet(lake)

    def run_once():
        q = (
            spark.readStream.schema("doc_id long, text string")
            .json(str(src))
            .writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    land("b1.json", [(1, "lead in words " + PASSAGE)])
    run_once()
    # second microbatch: same passage at a different offset + a clean doc
    land("b2.json", [(10, PASSAGE + " fresh tail material"),
                     (11, "totally unrelated text with no repeats at all")])
    run_once()
    rows = {r["doc_id"]: r for r in spark.read.parquet(lake).collect()}
    assert set(rows) == {1, 10, 11}
    assert PASSAGE in rows[1]["text_clean"]        # first arrival keeps it
    assert PASSAGE not in rows[10]["text_clean"]   # later arrival loses it
    assert rows[10]["n_words_dropped"] == len(PASSAGE.split())
    assert rows[11]["n_words_dropped"] == 0


def test_char_entropy_empty_text(spark, tmp_path):
    """Regression (review r8): sequence(1, 0) DESCENDS in Spark, so an
    empty document fabricated two phantom '' characters before the guard —
    the oracle's generate_series(1, 0) correctly yields none. An empty doc
    must simply produce no entropy row on either engine."""
    import duckdb

    from dblp_to_csv_spark.registry import all_queries

    docs = [(0, ""), (1, "abab")]
    pd.DataFrame(
        {"doc_id": [d for d, _ in docs], "text": [t for _, t in docs]}
    ).to_parquet(tmp_path / "documents.parquet")
    entry = all_queries()["text_char_entropy"]
    got = {
        r["doc_id"]: (r["n_chars_counted"], r["char_entropy"])
        for r in entry.fn(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = {
        d: (n, e) for d, n, e in con.execute(entry.oracle).fetchall()
    }
    assert got == want
    assert 0 not in got          # empty doc: no row on either engine
    assert got[1][0] == 4        # 'abab': 4 chars, two symbols
