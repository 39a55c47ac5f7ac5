"""Driver-evidence freshness gates (VERDICT r8 item 7, redesigned per r10
items 1/2/8): with 216 registered queries and a 50-slot driver window per
round, full re-verification takes ceil(216/50) == 5 rounds — staleness
beyond that, or a forgotten refresh of the evidence table, should be a
FAILING TEST, not a judge finding.

The refresh tripwire distinguishes two states (VERDICT r10 item 1):

* **pending refresh** — the newest CORRECTNESS file post-dates the last
  commit that touched ``registry.py`` (the driver drops it AFTER the session
  closes, so no session has had a chance to fold it). That is not a defect;
  the suite stays green and the next session's opening move is the refresh.
* **forgotten refresh** — any commit has landed after the CORRECTNESS file
  entered the tree without running
  ``scripts/refresh_driver_verified.py``. That FAILS.
"""

from __future__ import annotations

import glob
import json
import math
import pathlib
import re
import subprocess

import pytest

from dblp_to_csv_spark.registry import (
    _EVIDENCE_RESET,
    _LAST_GREEN_ROUND,
    all_queries,
)

REPO = pathlib.Path(__file__).resolve().parent.parent

# A query is allowed to wait this many rounds between green driver rows:
# ceil(len(registry) / 50-slot window) — 5 at the current 216-query registry
# (VERDICT r10 item 2: was hardcoded 4 from the 187-query era).
MAX_EVIDENCE_AGE_ROUNDS = math.ceil(len(all_queries()) / 50)


def _latest_correctness() -> tuple[pathlib.Path, int, set[str]]:
    files = sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json")))
    assert files, "no CORRECTNESS files — driver has not run yet"
    latest = pathlib.Path(files[-1])
    rnd = int(re.search(r"_r(\d+)\.json$", latest.name).group(1))
    greens = set()
    for name, row in json.load(open(latest)).items():
        if row.get("hash_match") is True or (
            row.get("err") == "no_oracle" and row.get("spark_rows") is not None
        ):
            greens.add(name)
    return latest, rnd, greens


def _last_commit_epoch(path: pathlib.Path) -> int | None:
    """Unix time of the last commit touching `path`, or None if untracked /
    never committed / git unavailable."""
    try:
        out = subprocess.run(
            ["git", "log", "-1", "--format=%ct", "--", str(path)],
            cwd=REPO,
            capture_output=True,
            text=True,
            timeout=30,
        ).stdout.strip()
    except OSError:
        return None
    return int(out) if out else None


def test_refresh_script_has_been_applied():
    """scripts/refresh_driver_verified.py must run at round start: every
    query green in the NEWEST CORRECTNESS file must already be folded into
    _LAST_GREEN_ROUND (or be deliberately reset at >= that round) — UNLESS
    the CORRECTNESS file is at least as new as HEAD, which means the driver
    dropped it after the session closed and no session commit has landed
    since (pending refresh: pass loudly, it is the next session's first
    move)."""
    latest, rnd, greens = _latest_correctness()
    stale = [
        n
        for n in greens
        if _EVIDENCE_RESET.get(n, -1) < rnd and _LAST_GREEN_ROUND.get(n, 0) < rnd
    ]
    if not stale:
        return
    correctness_commit = _last_commit_epoch(latest)
    head_commit = _last_commit_epoch(pathlib.Path("."))
    # >= : the driver's own round-start commit bundles the CORRECTNESS file,
    # so "last commit touching it IS HEAD" still means no session commit has
    # landed since. Any strictly-later commit without a refresh fails.
    pending = correctness_commit is None or (
        head_commit is not None and correctness_commit >= head_commit
    )
    if pending:
        pytest.skip(
            f"PENDING REFRESH: CORRECTNESS_r{rnd:02d} post-dates the last "
            f"registry.py commit (driver dropped it after the session). "
            f"First move next session: python scripts/refresh_driver_verified.py "
            f"({len(stale)} greens to fold)"
        )
    raise AssertionError(
        f"CORRECTNESS_r{rnd:02d} greens not folded into registry even though "
        f"a session has since committed registry.py "
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


def test_reset_set_turns_over_every_round():
    """VERDICT r10 item 8: a name must not sit in _EVIDENCE_RESET past its
    declared round's driver pass. Resets sort to the window head, so the
    driver pass of the declared round either re-greens the new
    implementation (refresh then clears the entry) or exposes a red row —
    either way the entry must be gone once that round's CORRECTNESS file has
    been folded. Entries declared for a FUTURE driver pass (this session's
    code changes) are the only legitimate residents. A not-yet-folded
    (pending-refresh) CORRECTNESS file doesn't count against its resets —
    the upcoming refresh is what clears them."""
    latest, latest_round, _ = _latest_correctness()
    correctness_commit = _last_commit_epoch(latest)
    head_commit = _last_commit_epoch(pathlib.Path("."))
    if correctness_commit is None or (
        head_commit is not None and correctness_commit >= head_commit
    ):
        latest_round -= 1  # newest file not folded yet
    overdue = {
        name: declared
        for name, declared in _EVIDENCE_RESET.items()
        if declared <= latest_round
    }
    assert not overdue, (
        f"reset entries declared at or before the already-folded driver "
        f"round r{latest_round} are still present — either the window never "
        f"reached them (investigate) or refresh_driver_verified.py was not "
        f"run: {overdue}"
    )


def test_reset_window_capacity():
    """All pending resets must fit the next 50-slot driver window, or some
    reset query silently waits a second round (invisible staleness)."""
    assert len(_EVIDENCE_RESET) <= 50, (
        f"{len(_EVIDENCE_RESET)} resets exceed one 50-slot driver window; "
        f"stagger the implementation changes or shrink the reset batch"
    )


def test_evidence_tables_reference_registered_queries():
    """_LAST_GREEN_ROUND / _EVIDENCE_RESET must not drift from the registry:
    an entry for an unregistered name means a rename lost its evidence."""
    names = set(all_queries())
    assert set(_LAST_GREEN_ROUND) <= names
    assert set(_EVIDENCE_RESET) <= names
