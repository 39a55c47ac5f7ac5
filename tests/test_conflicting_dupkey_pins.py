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

`pretrain_corpus_report` is the known out-of-domain composite: its entry
distinct collapses only verbatim copies, so conflicting keys fan its keyed
stage joins — documented in ROADMAP 31 with the declared r13 fix
(quarantine conflicting keys as an ingest-contract violation, not pretend
a winner). It is asserted to STAY out-of-domain here so the eventual fix
must update this pin deliberately."""

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
        if t in ("documents", "events"):
            dup = base.slice(0, 24).to_pandas()
            if t == "documents":
                dup["text"] = dup["text"].astype(str) + " CONFLICT"
                dup["n_chars"] = dup["n_chars"] + 9
            else:
                dup["value"] = dup["value"] * 2 + 1
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


def test_pretrain_report_is_known_out_of_domain(spark, duck, conflict_sf):
    """The declared exception: conflicting keys fan the keyed composite's
    stage joins differently across engines. When ROADMAP 31's quarantine
    stage lands, this test flips to an equality pin."""
    entry = all_queries()["pretrain_corpus_report"]
    got = entry.fn(spark, conflict_sf).toPandas()
    want = duck.execute(entry.oracle).df()
    assert len(got) != len(want), (
        "pretrain_corpus_report now agrees on conflicting keys — "
        "ROADMAP 31 landed? Replace this exception with an equality pin."
    )
