"""BPE training-loop gates (bpe_train_merges):

1. The merge-rewrite primitive has true left-to-right non-overlapping BPE
   semantics — including the consecutive-repeat case 'aaaa' + (a,a) →
   [aa][aa] that a naive single-delimiter string replace gets wrong.
2. A pure-Python reference BPE (dict/Counter implementation, no shared
   string-replace trick) learns the IDENTICAL merge table on the smoke
   corpus — an independent differential, same spirit as the substring-dedup
   and flatten differentials.
3. The learned pair counts are non-increasing across rounds (merging the
   argmax pair can only reduce or preserve every other pair's count, and
   pairs created by the merge are bounded by its count).
"""

from __future__ import annotations

import re
from collections import Counter

import duckdb
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from dblp_to_csv_spark.operators.text_analysis import (
    BPE_ROUNDS,
    bpe_train_merges,
)
from tests.conftest import SF_SMOKE


def _rewrite_spark(spark, symstr: str, left: str, right: str) -> str:
    df = spark.createDataFrame([(symstr,)], "symstr string").select(
        F.replace(
            F.col("symstr"),
            F.lit(f"|{left}||{right}|"),
            F.lit(f"|{left}{right}|"),
        ).alias("out")
    )
    return df.collect()[0]["out"]


def test_repeat_merge_semantics_spark(spark):
    # 'aaaa' → [aa][aa]: the second merge must still see its leading pipe
    assert _rewrite_spark(spark, "|a||a||a||a|", "a", "a") == "|aa||aa|"
    # 'aaa' → [aa][a]: strictly left-to-right, no overlap
    assert _rewrite_spark(spark, "|a||a||a|", "a", "a") == "|aa||a|"
    # multi-char symbols never match across their own boundary
    assert _rewrite_spark(spark, "|ab||c|", "b", "c") == "|ab||c|"


def test_repeat_merge_semantics_duckdb():
    con = duckdb.connect()
    q = "SELECT replace(?, '|a||a|', '|aa|')"
    assert con.execute(q, ["|a||a||a||a|"]).fetchone()[0] == "|aa||aa|"
    assert con.execute(q, ["|a||a||a|"]).fetchone()[0] == "|aa||a|"


def _ref_bpe(texts: list[str], rounds: int) -> list[tuple[str, str, int]]:
    wf: Counter = Counter()
    for t in texts:
        for w in re.split(r"[^a-z0-9]+", t.lower()):
            if w:
                wf[w] += 1
    vocab: Counter = Counter()
    for w, f in wf.items():
        vocab[tuple(w)] += f
    rules: list[tuple[str, str, int]] = []
    for _ in range(rounds):
        pc: Counter = Counter()
        for sym, f in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pc[(a, b)] += f
        (a, b), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((a, b, c))
        nxt: Counter = Counter()
        for sym, f in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            nxt[tuple(out)] += f
        vocab = nxt
    return rules


def test_python_differential(spark):
    texts = [
        r["text"] for r in pq.read_table(f"{SF_SMOKE}/documents.parquet").to_pylist()
    ]
    want = _ref_bpe(texts, BPE_ROUNDS)
    got = [
        (r["merge_left"], r["merge_right"], r["pair_count"])
        for r in sorted(
            bpe_train_merges(spark, SF_SMOKE).collect(),
            key=lambda r: r["merge_round"],
        )
    ]
    assert got == want


def test_pair_counts_nonincreasing(spark):
    rows = sorted(
        bpe_train_merges(spark, SF_SMOKE).collect(),
        key=lambda r: r["merge_round"],
    )
    counts = [r["pair_count"] for r in rows]
    assert len(counts) == BPE_ROUNDS
    assert all(a >= b for a, b in zip(counts, counts[1:]))


def test_apply_savings_bounded_by_learned_counts(spark):
    """Corpus-wide symbols saved by encoding == one merge per applied
    occurrence, so savings are positive and bounded above by the sum of
    the learned pair counts (strict equality fails only via self-overlap:
    'aaa' counts the (a,a) pair twice but merges once)."""
    from dblp_to_csv_spark.operators.text_analysis import bpe_apply_encode

    rules = bpe_train_merges(spark, SF_SMOKE).collect()
    enc = bpe_apply_encode(spark, SF_SMOKE).collect()
    saved = sum(r["n_char_symbols"] - r["n_bpe_symbols"] for r in enc)
    assert 0 < saved <= sum(r["pair_count"] for r in rules)
    assert all(0 < r["compression_ratio"] <= 1 for r in enc)


def test_rule_exhaustion_preserves_vocabulary(spark, tmp_path):
    """A corpus whose vocabulary fully merges before BPE_ROUNDS rounds
    (single word type 'ab': round 1 merges (a,b), later rounds find no
    pairs) must emit FEWER rules — not empty the vocabulary (review r8
    session 4: the crossJoin with a 0-row rule frame silently dropped
    every word, and bpe_apply_encode then dropped every document)."""
    import duckdb
    import pandas as pd

    from dblp_to_csv_spark.operators.text_analysis import bpe_apply_encode
    from dblp_to_csv_spark.registry import all_queries

    pd.DataFrame(
        {"doc_id": [0, 1], "text": ["ab ab ab", "ab ab"], "lang": ["en"] * 2,
         "source": ["s"] * 2, "n_chars": [8, 5]}
    ).to_parquet(tmp_path / "documents.parquet")
    rules = bpe_train_merges(spark, str(tmp_path)).collect()
    assert [(r["merge_left"], r["merge_right"], r["pair_count"]) for r in rules] == [
        ("a", "b", 5)
    ]
    enc = {r["doc_id"]: r for r in bpe_apply_encode(spark, str(tmp_path)).collect()}
    assert len(enc) == 2  # no document vanished
    assert enc[0]["n_bpe_symbols"] == 3 and enc[0]["n_char_symbols"] == 6
    # oracles agree on the degenerate corpus too
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{tmp_path}/documents.parquet')"
    )
    want = con.execute(all_queries()["bpe_train_merges"].oracle).df()
    assert len(want) == 1
    wa = con.execute(all_queries()["bpe_apply_encode"].oracle).df()
    assert len(wa) == 2
