"""Entity-resolution pins (operators/entity_resolution.py): structural
guarantees the oracle-parity hash alone does not express.

- Recall: EVERY emitted variant resolves to its base record (cluster
  canonical = custkey*10), verified against an offline pure-Python
  replication of the md5 gates — the independent-implementation pattern of
  test_incremental_triangles.py.
- Blocking completeness by construction: base-variant1 pairs are found by
  the SUFFIX pass only, base-variant2 by the PREFIX pass only (each
  corruption breaks exactly one key).
- Survivorship recovers the clean field: '~' sorts above the hex alphabet,
  so MIN(addr)/MIN(phone) equal the base values.
- Plan gate: the blocked match is two equi-joins, never a nested-loop/
  cartesian fallback (the OR-join trap).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from dblp_to_csv_spark.operators.entity_resolution import (
    ER_V1_PCT,
    ER_V2_PCT,
    _dirty_records,
)
from dblp_to_csv_spark.registry import all_queries
from tests.conftest import SF_SMOKE


def _draw_py(key: int, salt: str) -> int:
    return int(hashlib.md5(f"{key}{salt}".encode()).hexdigest()[:6], 16)


def _expected_variants(custkeys: list[int]) -> dict[int, set[int]]:
    """Offline replication of the md5 emission gates: custkey -> set of
    variant suffixes (1 and/or 2) the corpus must contain."""
    out: dict[int, set[int]] = {}
    for k in custkeys:
        v = set()
        if _draw_py(k, ":v1g") % 100 < ER_V1_PCT:
            v.add(1)
        if _draw_py(k, ":v2g") % 100 < ER_V2_PCT:
            v.add(2)
        out[k] = v
    return out


def test_dirty_corpus_matches_offline_gates(spark):
    rows = _dirty_records(spark, SF_SMOKE).select("record_id").collect()
    got = {r.record_id for r in rows}
    custkeys = sorted({rid // 10 for rid in got})
    expected = set()
    for k, variants in _expected_variants(custkeys).items():
        expected.add(k * 10)
        expected.update(k * 10 + s for s in variants)
    assert got == expected


def test_every_variant_resolves_to_its_base(spark):
    golden = all_queries()["er_golden_record"].fn(spark, SF_SMOKE).collect()
    by_canon = {r.canonical_id: r for r in golden}
    # Every canonical is a base record id (…0), so no variant ever heads a
    # cluster, and cluster size = 1 + emitted variants for that entity.
    assert all(c % 10 == 0 for c in by_canon)
    expected = _expected_variants([c // 10 for c in by_canon])
    for c, row in by_canon.items():
        assert row.n_sources == 1 + len(expected[c // 10]), (c, row)
    # Total records conserved: sum of cluster sizes == corpus size.
    n_dirty = _dirty_records(spark, SF_SMOKE).count()
    assert sum(r.n_sources for r in golden) == n_dirty


def test_survivorship_recovers_clean_fields(spark):
    golden = all_queries()["er_golden_record"].fn(spark, SF_SMOKE).collect()
    for r in golden:
        k = r.canonical_id // 10
        assert r.golden_address == hashlib.md5(f"{k}:addr".encode()).hexdigest()
        assert r.golden_phone == hashlib.md5(f"{k}:ph".encode()).hexdigest()[:10]
        assert "~" not in r.golden_address


def test_pair_provenance_by_blocking_pass(spark):
    """Variant-1 corrupts the prefix key (pair discoverable only via the
    suffix pass) and variant-2 the suffix key (prefix pass) — so every
    matched pair is (base, variant) with the predicted distances."""
    pairs = all_queries()["er_match_pairs"].fn(spark, SF_SMOKE).collect()
    seen: dict[int, set[int]] = {}
    for p in pairs:
        assert p.record_a % 10 == 0, p  # base is always the smaller id
        assert p.record_b - p.record_a in (1, 2), p
        if p.record_b - p.record_a == 1:
            assert (p.addr_dist, p.phone_dist) == (1, 0), p
        else:
            assert (p.addr_dist, p.phone_dist) == (1, 1), p
        seen.setdefault(p.record_a // 10, set()).add(p.record_b - p.record_a)
    custkeys = sorted(seen)
    golden_keys = [
        r.canonical_id // 10
        for r in all_queries()["er_golden_record"].fn(spark, SF_SMOKE).collect()
    ]
    expected = _expected_variants(golden_keys)
    assert seen == {k: v for k, v in expected.items() if v}


def test_match_plan_has_no_nested_loop(spark):
    df = all_queries()["er_match_pairs"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
