"""Driver-evidence freshness gates (VERDICT r8 item 7): with ~187 registered
queries and a 50-slot driver window per round, full re-verification takes 4
rounds — staleness beyond that, or a forgotten refresh of the evidence
table, should be a FAILING TEST at round start, not a judge finding.
"""

from __future__ import annotations

import glob
import json
import pathlib
import re

from dblp_to_csv_spark.registry import (
    _EVIDENCE_RESET,
    _LAST_GREEN_ROUND,
    all_queries,
)

REPO = pathlib.Path(__file__).resolve().parent.parent

# A query is allowed to wait this many rounds between green driver rows:
# ceil(len(registry) / 50-slot window) == 4 at the current registry size.
MAX_EVIDENCE_AGE_ROUNDS = 4


def _latest_round_greens() -> tuple[int, set[str]]:
    files = sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json")))
    assert files, "no CORRECTNESS files — driver has not run yet"
    latest = files[-1]
    rnd = int(re.search(r"_r(\d+)\.json$", latest).group(1))
    greens = set()
    for name, row in json.load(open(latest)).items():
        if row.get("hash_match") is True or (
            row.get("err") == "no_oracle" and row.get("spark_rows") is not None
        ):
            greens.add(name)
    return rnd, greens


def test_refresh_script_has_been_applied():
    """scripts/refresh_driver_verified.py must run at round start: every
    query green in the NEWEST CORRECTNESS file must already be folded into
    _LAST_GREEN_ROUND (or be deliberately reset), otherwise the driver
    window re-proves fresh queries while never-verified ones starve."""
    rnd, greens = _latest_round_greens()
    stale = [
        n
        for n in greens
        if n not in _EVIDENCE_RESET and _LAST_GREEN_ROUND.get(n, 0) < rnd
    ]
    assert not stale, (
        f"CORRECTNESS_r{rnd:02d} greens not folded into registry "
        f"(run scripts/refresh_driver_verified.py): {sorted(stale)[:10]}"
    )


def test_oracle_evidence_age_within_rotation_budget():
    """Every oracle'd query either has a green driver row no older than
    MAX_EVIDENCE_AGE_ROUNDS, or sits inside the next 50-slot window (so the
    upcoming driver pass verifies it). Queries without an oracle carry
    pytest parity gates instead and are exempt — a rows-only driver row
    proves nothing the suite doesn't."""
    entries = all_queries()
    window = set(list(entries)[:50])
    top = max(_LAST_GREEN_ROUND.values())
    violations = []
    for name, e in entries.items():
        if e.oracle is None:
            continue
        last = None if name in _EVIDENCE_RESET else _LAST_GREEN_ROUND.get(name)
        fresh = last is not None and top - last <= MAX_EVIDENCE_AGE_ROUNDS
        if not (fresh or name in window):
            violations.append((name, last))
    assert not violations, (
        f"oracle'd queries with evidence older than "
        f"{MAX_EVIDENCE_AGE_ROUNDS} rounds and outside the next driver "
        f"window: {violations[:10]}"
    )


def test_evidence_tables_reference_registered_queries():
    """_LAST_GREEN_ROUND / _EVIDENCE_RESET must not drift from the registry:
    an entry for an unregistered name means a rename lost its evidence."""
    names = set(all_queries())
    assert set(_LAST_GREEN_ROUND) <= names
    assert _EVIDENCE_RESET <= names
