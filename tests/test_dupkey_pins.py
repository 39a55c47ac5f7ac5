"""Duplicate-key pinning gate (round-11 session-2 scout, ROADMAP): the
operators whose semantics lean hardest on key uniqueness — snapshot diff
(full-outer join fan-out), exact dedup, the hash-drawn sketches, keyed
fingerprints, heavy hitters, sessionization, PSI — run against a corpus
where 20% of doc_id/event_id rows are exact duplicates and must match
their DuckDB oracles. The scout probe came back all-agree (join fan-out
and group semantics match across engines); this pins that so an engine
upgrade or a query rewrite that starts assuming PK uniqueness surfaces
here, not in production."""

from __future__ import annotations

import pytest

from dblp_to_csv_spark.registry import all_queries
from dblp_to_csv_spark.sources.tables import TABLES
from tests.sweep_util import REAL_SF, assert_matches_oracle, duck_for

# the PK-sensitive set: joins/groups/draws keyed by doc_id or event_id
PK_SENSITIVE = [
    "dataset_version_diff",
    "dedup_exact_documents",
    "dedup_keep_canonical",
    "sketch_bottomk_quantiles_by_group",
    "text_fingerprint",
    "heavy_hitters_words",
    "sessionize_events",
    "drift_psi_events_value",
    "sample_documents_hash",
    "split_train_val_test",
]


@pytest.fixture(scope="module")
def dup_sf(tmp_path_factory):
    """documents/events with their first 40 rows duplicated verbatim
    (≈20% duplicate primary keys); other tables small slices."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("dup_sf")
    for t in TABLES:
        tb = pq.read_table(f"{REAL_SF}/{t}.parquet")
        if t in ("documents", "events"):
            tb = pa.concat_tables([tb.slice(0, 200), tb.slice(0, 40)])
        else:
            tb = tb.slice(0, 20)
        pq.write_table(tb, out / f"{t}.parquet")
    return str(out)


@pytest.fixture(scope="module")
def duck(dup_sf):
    con = duck_for(dup_sf)
    yield con
    con.close()


@pytest.mark.parametrize("name", PK_SENSITIVE)
def test_query_agrees_on_duplicate_keys(spark, duck, dup_sf, name):
    entry = all_queries()[name]
    got = entry.fn(spark, dup_sf).toPandas()
    want = duck.execute(entry.oracle).df()
    assert_matches_oracle(name, got, want, "the duplicate-key corpus")
