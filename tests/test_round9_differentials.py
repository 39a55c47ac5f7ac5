"""Independent (non-oracle) differentials for the round-9 session-3 ops:
the DuckDB oracles mirror the engine's arithmetic by design, so these pin
the SEMANTICS against third implementations — a pure-Python tie-corrected
rank-sum for Mann-Whitney, and a hand-computable skip-gram fixture that
verifies the word2vec compaction behavior (dropped tokens CLOSE the gap
between their neighbors)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from dblp_to_csv_spark.registry import all_queries
from tests.conftest import SF_SMOKE


def _entry(name):
    return all_queries()[name]


def _mann_whitney_python(a: list[float], b: list[float]):
    """Textbook tie-corrected Mann-Whitney over raw samples (average ranks
    via sort — the formulation the engine's grouped-histogram identity must
    reproduce exactly)."""
    pooled = sorted([(v, "a") for v in a] + [(v, "b") for v in b])
    n = len(pooled)
    ranks: dict[int, float] = {}
    i = 0
    tie_term = 0
    while i < n:
        j = i
        while j < n and pooled[j][0] == pooled[i][0]:
            j += 1
        t = j - i
        avg_rank = (i + 1 + j) / 2.0  # mean of ranks i+1..j
        for k in range(i, j):
            ranks[k] = avg_rank
        tie_term += t * t * t - t
        i = j
    r_a = sum(ranks[k] for k in range(n) if pooled[k][1] == "a")
    n_a, n_b = len(a), len(b)
    u_a = r_a - n_a * (n_a + 1) / 2.0
    mean_u = n_a * n_b / 2.0
    sigma2 = (n_a * n_b / 12.0) * (
        (n + 1) - tie_term / (n * (n - 1.0))
    )
    return u_a, mean_u, (u_a - mean_u) / math.sqrt(sigma2), tie_term


def test_mann_whitney_matches_textbook_ranksum(spark, tmp_path):
    """Heavily tied two-arm fixture: the grouped-histogram U/z must equal
    the classic sorted-average-rank computation to the last rounded digit."""
    a_vals = [1.0, 2.0, 2.0, 3.0, 5.0, 5.0, 5.0, 9.0]
    b_vals = [2.0, 2.0, 4.0, 5.0, 5.0, 6.0, 7.0]
    rows = [("purchase", v) for v in a_vals] + [("click", v) for v in b_vals]
    ev = pd.DataFrame(
        {
            "event_id": range(len(rows)),
            "ts": pd.to_datetime(["2024-01-01"] * len(rows)),
            "user_id": [1] * len(rows),
            "event_type": [t for t, _ in rows],
            "value": [v for _, v in rows],
            "props": ["{}"] * len(rows),
        }
    )
    ev.to_parquet(tmp_path / "events.parquet")
    got = _entry("ab_test_mann_whitney").fn(spark, str(tmp_path)).collect()[0]
    u_a, mean_u, z, _ = _mann_whitney_python(a_vals, b_vals)
    assert got.n_a == len(a_vals) and got.n_b == len(b_vals)
    assert got.u_a == round(u_a, 2)
    assert got.mean_u == round(mean_u, 2)
    assert got.z == pytest.approx(round(z, 6), abs=1e-6)
    assert got.tie_groups == 2  # value groups {2.0 (t=4), 5.0 (t=5)}


def test_skipgram_compaction_closes_gaps(spark, tmp_path):
    """A document of rare markers separated by high-frequency filler runs —
    the md5 subsampling draw is replicated in PURE PYTHON over the same
    token stream, and the engine's pair table must equal the pairs of the
    Python-compacted survivor sequence. Dropped filler between two
    survivors makes them adjacent (the word2vec compaction behavior),
    asserted non-vacuously at the end."""
    import hashlib

    markers = [f"m{i:02d}" for i in range(12)]
    tokens: list[str] = []
    for m in markers:
        tokens.append(m)
        tokens.extend(["filler"] * 25)
    text = " ".join(tokens)
    pd.DataFrame(
        {
            "doc_id": [1],
            "text": [text],
            "lang": ["en"],
            "source": ["s"],
            "n_chars": [len(text)],
        }
    ).to_parquet(tmp_path / "documents.parquet")

    # replicate the engine's deterministic draw over the full stream
    total, t = len(tokens), 0.001
    cnt = {w: tokens.count(w) for w in set(tokens)}
    kept: list[tuple[int, str]] = []
    for pos, w in enumerate(tokens, start=1):
        u = int(hashlib.md5(f"1:{pos}:{w}".encode()).hexdigest()[:8], 16) / 2**32
        if u < math.sqrt(t * total / cnt[w]):
            kept.append((pos, w))
    assert len(kept) >= 4, "fixture must keep enough survivors to pair"

    seq = [w for _, w in kept]
    expected: dict[tuple[str, str], int] = {}
    for i, c in enumerate(seq):
        for d in (1, 2):
            if i + d < len(seq):
                for pair in [(c, seq[i + d]), (seq[i + d], c)]:
                    expected[pair] = expected.get(pair, 0) + 1

    got = {
        (r.center, r.context): r.n_pairs
        for r in _entry("skipgram_pairs_subsampled").fn(spark, str(tmp_path)).collect()
    }
    assert got == expected
    # compaction exercised: some emitted pair spans >2 original positions
    pos_of = {}
    for p, w in kept:
        pos_of.setdefault(w, p)
    spans = [
        abs(pos_of[a] - pos_of[b]) for a, b in got if a in pos_of and b in pos_of
    ]
    assert spans and max(spans) > 2


def test_abc_classes_partition_and_order(spark):
    """Structural invariants on real data: classes partition the parts,
    cum_share is nondecreasing in revenue-desc order and ends at 1.0, and
    every A-part's revenue ≥ every C-part's revenue."""
    rows = (
        _entry("parts_abc_pareto")
        .fn(spark, SF_SMOKE)
        .orderBy("cum_share")
        .collect()
    )
    assert rows[-1].cum_share == 1.0
    shares = [r.cum_share for r in rows]
    assert shares == sorted(shares)
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    by_class = {}
    for r in rows:
        by_class.setdefault(r.abc_class, []).append(r.revenue)
    assert set(by_class) <= {"A", "B", "C"} and "A" in by_class
    if "C" in by_class:
        assert min(by_class["A"]) >= max(by_class["C"])
