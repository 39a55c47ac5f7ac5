"""Regenerate registry._LAST_GREEN_ROUND from the CORRECTNESS_r*.json files.

Run at the start of each round (after the driver has written the previous
round's CORRECTNESS file) so the 50-query driver window rotates onto the
queries with the stalest green evidence:

    python scripts/refresh_driver_verified.py

A query counts as green in a round when its row has ``hash_match: true``, or
— for declared no-oracle (rows-only) queries — a non-null ``spark_rows`` with
``err: no_oracle``. The script rewrites the dict literal in place and prints
the resulting stale/fresh split.

``_EVIDENCE_RESET`` handling (VERDICT r10 item 8): the reset table maps a
query name to the round in whose session the reset was declared. Because the
driver runs AFTER the session closes, a green row in round >= declared round
is evidence on the NEW implementation — the script then removes the name
from the reset literal (its one-line entry, comment included) and keeps the
green. A green strictly older than the declared round is evidence on the old
code and is dropped, so the name sorts as never-verified (window head).
"""

from __future__ import annotations

import glob
import json
import pathlib
import re

REPO = pathlib.Path(__file__).resolve().parent.parent
REGISTRY = REPO / "dblp_to_csv_spark" / "registry.py"


def compute_last_green() -> dict[str, int]:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"_r(\d+)\.json$", f).group(1))
        for name, row in json.load(open(f)).items():
            green = row.get("hash_match") is True or (
                row.get("err") == "no_oracle" and row.get("spark_rows") is not None
            )
            if green:
                last[name] = max(last.get(name, 0), rnd)
    return last


RESET_RE = re.compile(
    r"_EVIDENCE_RESET: dict\[str, int\] = \{\n(.*?)\n?\}", flags=re.DOTALL
)


def read_evidence_reset(src: str) -> dict[str, int]:
    """Names in registry._EVIDENCE_RESET mapped to their declared round."""
    m = RESET_RE.search(src)
    if not m:
        return {}
    return {
        name: int(rnd)
        for name, rnd in re.findall(r'"([^"]+)"\s*:\s*(\d+)', m.group(1))
    }


def drop_reset_lines(src: str, cleared: set[str]) -> str:
    """Remove the one-line entries for cleared names from the reset literal,
    preserving every other line (entries keep their trailing `# why`)."""
    m = RESET_RE.search(src)
    if not m or not cleared:
        return src
    kept = [
        line
        for line in m.group(1).splitlines()
        if not any(f'"{name}"' in line for name in cleared)
    ]
    body = ("\n".join(kept) + "\n") if kept else ""
    new_literal = "_EVIDENCE_RESET: dict[str, int] = {\n" + body + "}"
    return src[: m.start()] + new_literal + src[m.end() :]


def registered_names() -> set[str]:
    """Live query names — old CORRECTNESS files may carry rows for queries
    since renamed or retired; their evidence must not be resurrected."""
    import sys

    sys.path.insert(0, str(REPO))
    from dblp_to_csv_spark.registry import all_queries

    return set(all_queries())


def main() -> None:
    last = compute_last_green()
    live = registered_names()
    for name in sorted(set(last) - live):
        del last[name]
        print(f"dropped (no longer registered): {name}")
    src = REGISTRY.read_text()
    reset = read_evidence_reset(src)
    cleared: set[str] = set()
    for name, declared in sorted(reset.items()):
        if last.get(name, -1) >= declared:
            cleared.add(name)
            print(
                f"reset cleared: {name} (declared r{declared}, "
                f"re-greened r{last[name]} on the new implementation)"
            )
        elif name in last:
            del last[name]
            print(
                f"evidence reset: {name} (green r-old < declared "
                f"r{declared}; sorts as never-verified)"
            )
        else:
            print(f"evidence reset: {name} (never green; window head)")
    src = drop_reset_lines(src, cleared)
    body = "\n".join(f'    "{k}": {v},' for k, v in sorted(last.items()))
    new_src, n = re.subn(
        r"_LAST_GREEN_ROUND: dict\[str, int\] = \{\n.*?\n\}\n",
        "_LAST_GREEN_ROUND: dict[str, int] = {\n" + body + "\n}\n",
        src,
        count=1,
        flags=re.DOTALL,
    )
    if n != 1:
        raise SystemExit("could not locate _LAST_GREEN_ROUND literal in registry.py")
    REGISTRY.write_text(new_src)
    top = max(last.values())
    stale = sum(1 for v in last.values() if v < top)
    print(f"{len(last)} queries with green evidence; {stale} stale (< r{top})")


if __name__ == "__main__":
    main()
