"""Duplicate-key sweep (round-12, VERDICT r11 item 1): EVERY registered
query runs against a corpus where EVERY table carries ≈20% exact-duplicate
primary-key rows — documents/events (the r11 scout's 10-query pin) AND the
join-side tables (orders / customer / part / supplier / lineitem / nation /
region / embeddings), where join fan-out semantics diverge most easily
between engines. Verbatim duplicates are the sharpest probe that stays
deterministic: the two copies tie on every column, so any pinned tiebreak
(the tied-values-sweep discipline) projects identical values whichever copy
wins — a divergence here is a real fan-out / group-semantics difference,
never tiebreak noise.

The r11 scout probe (7 queries) and the seeded 10-query pin both came back
all-agree; this sweep widens the pin to the full oracle'd surface so an
engine upgrade or a rewrite that starts assuming PK uniqueness (a distinct
dropped before a join, a 1:1 merge assumption) surfaces here, not in
production. Reference analog: the reference's edge reconstruction is
set-valued and inherently dup-tolerant (XMLToCSV.py:358-362).
"""

from __future__ import annotations

import pytest

from dblp_to_csv_spark.registry import all_queries
from dblp_to_csv_spark.sources.tables import TABLES
from tests.sweep_util import REAL_SF, assert_matches_oracle, duck_for

ALL_QUERIES = sorted(all_queries().items())

# the r11 scout's PK-sensitive core — kept as the documented high-risk set
# (snapshot diff, exact dedup, hash-drawn sketches, keyed fingerprints,
# heavy hitters, sessionization, PSI, hash sampling/splits); the sweep
# below runs these AND everything else
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

# base-slice rows per table: big enough that group/window/join paths have
# real work, small enough the 228-query sweep stays test-suite-sized; the
# tiny dims duplicate whole-table so every nation/region key is doubled
_BASE = {"region": 5, "nation": 25}
_DEFAULT_BASE = 120
_DUP_FRACTION = 5  # first 1/5 of the base slice appended verbatim


@pytest.fixture(scope="module")
def dup_sf(tmp_path_factory):
    """Every table: first N rows + its first N/5 rows appended verbatim
    (≈20% duplicate primary keys; nation/region duplicate 100%)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path_factory.mktemp("dup_sf")
    for t in TABLES:
        tb = pq.read_table(f"{REAL_SF}/{t}.parquet")
        n = min(_BASE.get(t, _DEFAULT_BASE), tb.num_rows)
        base = tb.slice(0, n)
        dup = base if t in _BASE else base.slice(0, max(1, n // _DUP_FRACTION))
        pq.write_table(pa.concat_tables([base, dup]), out / f"{t}.parquet")
    return str(out)


@pytest.fixture(scope="module")
def duck(dup_sf):
    con = duck_for(dup_sf)
    yield con
    con.close()


def test_pk_sensitive_names_still_registered():
    names = {n for n, _ in ALL_QUERIES}
    missing = [n for n in PK_SENSITIVE if n not in names]
    assert not missing, f"PK-sensitive core renamed/removed: {missing}"


@pytest.mark.parametrize("name,entry", ALL_QUERIES, ids=[n for n, _ in ALL_QUERIES])
def test_query_agrees_on_duplicate_keys(spark, duck, dup_sf, name, entry):
    got = entry.fn(spark, dup_sf).toPandas()  # the crash gate
    if entry.oracle is None:
        return
    want = duck.execute(entry.oracle).df()
    assert_matches_oracle(name, got, want, "the 20%-duplicate-key corpus")
