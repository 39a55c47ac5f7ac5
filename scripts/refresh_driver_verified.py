"""Regenerate registry._LAST_GREEN_ROUND from the CORRECTNESS_r*.json files.

Run at the start of each round (after the driver has written the previous
round's CORRECTNESS file) so the 50-query driver window rotates onto the
queries with the stalest green evidence:

    python scripts/refresh_driver_verified.py

A query counts as green in a round when its row has ``hash_match: true``, or
— for declared no-oracle (rows-only) queries — a non-null ``spark_rows`` with
``err: no_oracle``. The script rewrites the dict literal in place and prints
the resulting stale/fresh split.
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


def read_evidence_reset(src: str) -> set[str]:
    """Names in registry._EVIDENCE_RESET: implementation changed after the
    last green row, so the entry must be dropped (sorts as never-verified)."""
    m = re.search(r"_EVIDENCE_RESET: set\[str\] = \{(.*?)\}", src, flags=re.DOTALL)
    if not m:
        return set()
    return set(re.findall(r'"([^"]+)"', m.group(1)))


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
    for name in reset & last.keys():
        del last[name]
        print(f"evidence reset: {name} (sorts as never-verified)")
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
