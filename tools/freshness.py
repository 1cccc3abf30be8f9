"""Driver-freshness ledger, computed from the CORRECTNESS_r*.json records.

The driver verifies the FIRST ~50 registry entries per round, so window
staging is a freshness burn-down: the oldest-checked oracle-backed names
must head ``registry._PRIORITY``. Until r13 that bookkeeping was
hand-maintained prose in a registry comment — one mis-transcribed name
silently burned a slot (r12 verdict item 3 / next-round item 4). This
module computes the ledger from the committed driver records themselves;
``tests/test_freshness_ledger.py`` asserts the staged window against it.

CLI: ``python tools/freshness.py`` prints the staleness cohorts.
"""

from __future__ import annotations

import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _row_green(row: object) -> bool:
    """A record row counts toward freshness only if the check PASSED:
    a failed/errored driver check must leave the name stale so staging
    re-forces it next round (r13 review finding — counting mere
    presence would let a timeout or hash-fail rotate a never-verified
    name to the back of the burn-down). ``hash_match`` may be absent/
    null for rows-only checks; an explicit False fails."""
    return (
        isinstance(row, dict)
        and row.get("err") is None
        and row.get("rows_match") is True
        and row.get("schema_match") is True
        and row.get("hash_match") in (True, None)
    )


def latest_checked(repo: Path = REPO) -> dict[str, int]:
    """name -> newest round whose CORRECTNESS record shows it GREEN.

    Includes names that have since been renamed/unregistered; callers
    intersect with the live registry.
    """
    latest: dict[str, int] = {}
    for f in sorted(repo.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", f.name).group(1))
        for name, row in json.loads(f.read_text()).items():
            if _row_green(row):
                latest[name] = max(latest.get(name, 0), rnd)
    return latest


def cohorts(repo: Path = REPO) -> dict[int, list[str]]:
    """round -> sorted oracle-backed registered names last checked then
    (0 = never checked). Oracle-less names are excluded: they are
    deliberately never staged (their driver check can only report
    ``err: no_oracle``; hash-checked deterministic twins carry their
    correctness evidence instead — registry staging comment)."""
    import sys

    sys.path.insert(0, str(repo))
    from pb_etl_spark.registry import all_oracles, all_queries

    latest = latest_checked(repo)
    out: dict[int, list[str]] = {}
    oracles = all_oracles()
    for name in all_queries():
        if name not in oracles:
            continue
        out.setdefault(latest.get(name, 0), []).append(name)
    return {r: sorted(names) for r, names in sorted(out.items())}


if __name__ == "__main__":
    for rnd, names in cohorts().items():
        label = f"r{rnd:02d}" if rnd else "NEW"
        print(f"{label} ({len(names)}): {' '.join(names)}")
