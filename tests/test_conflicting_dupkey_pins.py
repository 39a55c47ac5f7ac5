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
below with an exact quarantine count."""

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
