"""Conflicting-duplicate pin (round-12 scout, ROADMAP 31): rows that share
a primary key but DIFFER in payload — the CDC-ingest landmine the verbatim
dupkey sweep (test_dupkey_pins.py) deliberately does not cover, because a
"keep one copy" policy is only deterministic when the copies are identical.

The scout probe found the per-row operators, hash draws, fingerprints, and
group statistics naturally conflict-robust: both engines see the same
physical multiset, so they agree without any policy. This file PINS that
agreement on the seven probed representatives so a rewrite that starts
assuming key-functional payloads (joining a payload back by key, collapsing
by key before a per-row stage) surfaces here.

`pretrain_corpus_report` — the one composite the scout found out-of-domain
— gained the declared fix in the same session (ROADMAP 31): conflicting
keys quarantine into a `conflicting_key` stage on both engines, pinned
below with an exact quarantine count.

Round 13 (VERDICT r12 item 3) extends the sweep to EVERY keyed composite
that elects winners: merge_upsert_orders, scd2_user_state /
scd2_point_in_time_join (fixed — (ts, event_id, state) total-order
tiebreak in scd2_runs), dataset_version_diff, and the incremental index
probes (determinism + merged-payload contract pins at the bottom)."""

from __future__ import annotations

import pytest

from dblp_to_csv_spark.registry import all_queries
from dblp_to_csv_spark.sources.tables import TABLES
from tests.sweep_util import REAL_SF, assert_matches_oracle, duck_for

CONFLICT_ROBUST = [
    "dedup_exact_documents",
    "text_fingerprint",
    "heavy_hitters_words",
    "drift_psi_events_value",
    "sample_documents_hash",
    "sessionize_events",
    "winsorize_event_values",
    # r13 sweep (VERDICT r12 item 3) — the keyed composites that elect
    # winners. merge_upsert: target-side dups fan out identically through
    # the full-outer join on both engines, and feed dups resolve under the
    # documented deterministic tiebreak (merge_apply). version_diff: the
    # fingerprint full-outer join fans out symmetrically; classification is
    # a function of the multiset. scd2_*: robust BY DECLARED POLICY — the
    # (ts, event_id, state) total-order tiebreak added in r13 (scd2_runs);
    # without it, same-(ts,event_id) rows under two states left run
    # boundaries to partitioning luck on both engines.
    "merge_upsert_orders",
    "dataset_version_diff",
    "scd2_user_state",
    "scd2_point_in_time_join",
]


@pytest.fixture(scope="module")
def conflict_sf(tmp_path_factory):
    """documents/events with their first 24 keys re-emitted under MUTATED
    payloads (text + ' CONFLICT' / value*2+1); other tables small slices."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("conflict_sf")
    for t in TABLES:
        tb = pq.read_table(f"{REAL_SF}/{t}.parquet")
        n = min(120, tb.num_rows)
        base = tb.slice(0, n)
        if t in ("documents", "events", "orders"):
            dup = base.slice(0, 24).to_pandas()
            if t == "documents":
                dup["text"] = dup["text"].astype(str) + " CONFLICT"
                dup["n_chars"] = dup["n_chars"] + 9
            elif t == "events":
                dup["value"] = dup["value"] * 2 + 1
                # conflicting STATE under the same (ts, event_id) — the
                # r13 scd2 tiebreak case, not just a numeric payload
                dup["event_type"] = dup["event_type"].astype(str) + "_conflict"
            else:
                # orders (r13): conflicting price AND status under one key —
                # the merge_upsert target side and its synthesized feed
                dup["o_totalprice"] = dup["o_totalprice"] * 2 + 1
                dup["o_orderstatus"] = "Z"
            base = pa.concat_tables(
                [base, pa.Table.from_pandas(dup, schema=base.schema)]
            )
        pq.write_table(base, out / f"{t}.parquet")
    return str(out)


@pytest.fixture(scope="module")
def duck(conflict_sf):
    con = duck_for(conflict_sf)
    yield con
    con.close()


@pytest.mark.parametrize("name", CONFLICT_ROBUST)
def test_query_agrees_on_conflicting_keys(spark, duck, conflict_sf, name):
    entry = all_queries()[name]
    got = entry.fn(spark, conflict_sf).toPandas()
    want = duck.execute(entry.oracle).df()
    assert_matches_oracle(name, got, want, "the conflicting-key corpus")


def test_pretrain_report_quarantines_conflicting_keys(spark, duck, conflict_sf):
    """ROADMAP 31 landed (r12, same session as the scout): conflicting
    keys are an ingest-contract violation the report QUARANTINES into a
    `conflicting_key` stage — one row per violating key, the rest of the
    chain runs over the clean keys only, and both engines agree."""
    entry = all_queries()["pretrain_corpus_report"]
    got = entry.fn(spark, conflict_sf).toPandas()
    want = duck.execute(entry.oracle).df()
    assert_matches_oracle(
        "pretrain_corpus_report", got, want, "the conflicting-key corpus"
    )
    n_conf = (got["stage"] == "conflicting_key").sum()
    assert n_conf == 24, f"expected the 24 mutated keys quarantined, got {n_conf}"


# ---------------------------------------------------------------------------
# Incremental index probes (operators/incremental.py) — the stateful keyed
# composites the r12 sweep did not cover. These are pytest-only operators
# (no DuckDB oracle has a side-effect contract to mirror), so the pin is
# DETERMINISM plus the declared merged-payload contract: a batch SHOULD
# carry unique doc_ids; when a CDC replay emits one key under two payloads,
# the operator is a pure function of the input MULTISET — no partitioning
# luck, two runs agree exactly.

_CONFLICT_A = "the quick brown fox jumps over the lazy dog near the river"
_CONFLICT_B = "a completely different payload about spark shuffle partitions"


def _conflict_batch(spark):
    return spark.createDataFrame(
        [(1, _CONFLICT_A), (1, _CONFLICT_B), (2, _CONFLICT_A + " again today")],
        "doc_id long, text string",
    )


def test_exact_incremental_conflicting_dupkey(spark, tmp_path):
    """Exact incremental dedup keys on the content FINGERPRINT, not the
    doc_id — a conflicting dup key is simply two distinct fingerprints that
    happen to share a doc_id. Both are accepted (each under min doc_id per
    fp), both enter the index, and a replay of either payload is rejected."""
    from dblp_to_csv_spark.operators.incremental import exact_dedup_incremental

    idx = str(tmp_path / "fp_index")
    out = exact_dedup_incremental(
        spark, _conflict_batch(spark), idx, staging_dir=str(tmp_path / "s1")
    )
    rows = sorted((r["doc_id"], r["fp"]) for r in out.collect())
    assert [d for d, _ in rows] == [1, 1, 2]
    assert len({fp for _, fp in rows}) == 3  # three distinct payloads
    # replaying one conflicting payload under a fresh id: historical reject
    b2 = exact_dedup_incremental(
        spark,
        spark.createDataFrame([(9, _CONFLICT_B)], "doc_id long, text string"),
        idx,
        staging_dir=str(tmp_path / "s2"),
    )
    assert b2.count() == 0


def test_minhash_signature_conflicting_dupkey_is_elementwise_min(spark):
    """The MinHash signature of a conflicting dup key is the signature of
    the UNION of the payloads' shingle sets — the declared merged-payload
    contract. Pinned via the exact algebra: min over a union equals the
    elementwise min of the per-payload minima, so sig(key with payloads
    A, B) must equal slot-wise min(sig(A), sig(B))."""
    from dblp_to_csv_spark.operators.dedup import MINHASH_K
    from dblp_to_csv_spark.operators.incremental import _minhash_signature

    def sig_of(rows):
        out = _minhash_signature(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
        return {r["doc_id"]: [r[f"h{i}"] for i in range(MINHASH_K)] for r in out}

    merged = sig_of([(1, _CONFLICT_A), (1, _CONFLICT_B)])[1]
    separate = sig_of([(1, _CONFLICT_A), (2, _CONFLICT_B)])
    expected = [min(a, b) for a, b in zip(separate[1], separate[2])]
    assert merged == expected


def test_minhash_incremental_conflicting_dupkey_deterministic(spark, tmp_path):
    """Near-dup incremental accept on a conflicting-dupkey batch: the accept
    set is over DISTINCT doc_ids and is a pure function of the batch
    multiset — two runs from fresh indexes agree exactly, and the accepted
    key's index rows carry the merged (union-shingle) signature."""
    from dblp_to_csv_spark.operators.incremental import minhash_dedup_incremental

    def run(tag):
        out = minhash_dedup_incremental(
            spark,
            _conflict_batch(spark),
            str(tmp_path / f"idx_{tag}"),
            staging_dir=str(tmp_path / f"s_{tag}"),
        )
        return sorted(r["doc_id"] for r in out.collect())

    first, second = run("a"), run("b")
    assert first == second
    assert set(first) <= {1, 2} and 1 in first


def test_substring_incremental_conflicting_dupkey_deterministic(spark, tmp_path):
    """Substring incremental rewrite on a conflicting-dupkey batch: window
    occurrence identity is (doc_id, pos), so the two payloads' windows share
    occurrence slots — the rewrite is still a deterministic function of the
    multiset (marks attach to every payload row of the key identically on
    every run), and clean keys are untouched by the conflict."""
    from dblp_to_csv_spark.operators.incremental import substring_dedup_incremental

    long_a = " ".join(f"wa{i}" for i in range(12))
    long_b = " ".join(f"wb{i}" for i in range(12))
    batch = [(1, long_a), (1, long_b), (2, " ".join(f"wc{i}" for i in range(12)))]

    def run(tag):
        out = substring_dedup_incremental(
            spark,
            spark.createDataFrame(batch, "doc_id long, text string"),
            str(tmp_path / f"sidx_{tag}"),
            staging_dir=str(tmp_path / f"ss_{tag}"),
        ).collect()
        return sorted((r["doc_id"], r["text_clean"], r["n_words_dropped"]) for r in out)

    first, second = run("a"), run("b")
    assert first == second
    # the clean key's rewrite is exactly its input (nothing duplicated)
    clean = [r for r in first if r[0] == 2]
    assert clean == [(2, batch[2][1], 0)]
