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


def record_rounds(repo: Path = REPO) -> list[int]:
    """Sorted driver rounds with a committed CORRECTNESS record."""
    return sorted(
        int(re.search(r"r(\d+)", f.name).group(1))
        for f in repo.glob("CORRECTNESS_r*.json")
    )


def latest_checked(repo: Path = REPO, before: int | None = None) -> dict[str, int]:
    """name -> newest round whose CORRECTNESS record shows it GREEN.

    Includes names that have since been renamed/unregistered; callers
    intersect with the live registry. ``before`` restricts to records
    STRICTLY OLDER than that round — the ledger tests pass
    ``registry._STAGED_FOR`` so a window stays green after the driver
    drops the record of the round it was staged for (r13 verdict
    item 3); the CLI passes nothing (staging the NEXT round wants every
    record).
    """
    latest: dict[str, int] = {}
    for f in sorted(repo.glob("CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)", f.name).group(1))
        if before is not None and rnd >= before:
            continue
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


def stage(
    n_slots: int,
    repins: list[str] | None = None,
    repo: Path = REPO,
    as_of: int | None = None,
) -> list[str]:
    """Propose the next ``_PRIORITY`` window: the given re-pin/new-code
    names first (they must ride the window regardless of staleness),
    then the oldest-first (latest-green round, name) prefix of the
    remaining oracle-backed names — exactly the ordering
    ``tests/test_freshness_ledger.py`` asserts, so a window built here
    is green by construction. ``as_of`` replays the staging decision
    against records strictly older than that round (the ledger test
    passes ``registry._STAGED_FOR``)."""
    repins = list(repins or [])
    latest = latest_checked(repo, before=as_of)
    import sys

    sys.path.insert(0, str(repo))
    from pb_etl_spark.registry import all_oracles, all_queries

    oracles = all_oracles()
    unknown = [n for n in repins if n not in oracles]
    if unknown:
        raise SystemExit(f"repins not registered/oracle-backed: {unknown}")
    rest = sorted(
        (latest.get(n, 0), n)
        for n in all_queries()
        if n in oracles and n not in set(repins)
    )
    return repins + [n for _, n in rest[: n_slots - len(repins)]]


if __name__ == "__main__":
    import sys as _sys

    if len(_sys.argv) > 1 and _sys.argv[1] == "--stage":
        # --stage [N] [repin ...] -> a ready-to-paste window proposal
        n = int(_sys.argv[2]) if len(_sys.argv) > 2 else 50
        for name in stage(n, _sys.argv[3:]):
            print(f'    "{name}",')
    else:
        for rnd, names in cohorts().items():
            label = f"r{rnd:02d}" if rnd else "NEW"
            print(f"{label} ({len(names)}): {' '.join(names)}")
