"""Self-checking driver-freshness ledger (r12 verdict item 4).

``registry._PRIORITY`` stages which 50 queries the driver's correctness
harness verifies next round. The staging rule is oldest-first: new code
and plan-changed queries ride the window immediately; otherwise the
least-recently-checked oracle-backed names go first. Until r13 that
ordering lived only in a hand-maintained comment — these tests derive it
from the committed CORRECTNESS_r*.json records, so mis-transcribing one
staged name fails pytest instead of silently burning a driver slot.
"""

from __future__ import annotations


def _ledger():
    """Window state evaluated AS OF the round it was staged for.

    Records >= ``registry._STAGED_FOR`` are excluded: the driver drops
    CORRECTNESS_r{_STAGED_FOR}.json at the END of the round this window
    rides, and that record must not turn the ledger red before the next
    round's restaging commit (r13 verdict item 3). Exactly ONE such
    newer record is tolerated — with a warning naming it, so the
    restaging obligation stays visible — two means a full round went by
    without restaging, which fails here.
    """
    import warnings

    from tools.freshness import REPO, latest_checked, record_rounds

    from pb_etl_spark.registry import (
        _PRIORITY,
        _STAGED_FOR,
        all_oracles,
        all_queries,
    )

    newer = [r for r in record_rounds(REPO) if r >= _STAGED_FOR]
    assert len(newer) <= 1, (
        f"CORRECTNESS records r{newer} are at/after the staged round "
        f"r{_STAGED_FOR} — the window was not restaged for a full "
        "round; restage _PRIORITY (tools/freshness.py --stage 50 "
        "<repins...>) and bump registry._STAGED_FOR"
    )
    if newer:
        warnings.warn(
            f"CORRECTNESS_r{newer[0]:02d}.json has landed — restage "
            f"_PRIORITY for r{newer[0] + 1} and bump "
            "registry._STAGED_FOR (first commit of the round)",
            stacklevel=2,
        )
    return (
        _PRIORITY,
        all_queries(),
        all_oracles(),
        latest_checked(REPO, before=_STAGED_FOR),
    )


def test_never_checked_names_ride_the_next_window():
    """A newly registered oracle-backed query has no CORRECTNESS record
    yet — it MUST be staged in the upcoming window (the registry rule
    every round has followed: new code lands with its driver pin)."""
    prio, queries, oracles, latest = _ledger()
    unchecked = [n for n in queries if n in oracles and n not in latest]
    missing = [n for n in unchecked if n not in prio]
    assert not missing, f"new oracle-backed queries not staged: {missing}"


def test_oldest_cohort_is_fully_staged():
    """Every oracle-backed registered name tied for the OLDEST
    latest-checked round must be in the staged window — the burn-down
    can't leave the stalest names behind. (If an oldest cohort ever
    exceeds the 50-slot window this assertion needs a split rule; today
    the cohorts are far smaller — r12's leftover was 12 names.)"""
    prio, queries, oracles, latest = _ledger()
    checked = {n: latest[n] for n in queries if n in oracles and n in latest}
    oldest = min(checked.values())
    cohort = sorted(n for n, r in checked.items() if r == oldest)
    assert len(cohort) <= len(prio), (
        f"oldest cohort ({len(cohort)} names at r{oldest:02d}) no longer "
        "fits the window — split it explicitly"
    )
    left_behind = [n for n in cohort if n not in prio]
    assert not left_behind, (
        f"names last checked r{oldest:02d} missing from the staged "
        f"window: {left_behind}"
    )


def test_oracle_less_exemption_is_tight():
    """Exactly the oracle-less names are exempt from staging, and each
    must still be oracle-less — if one gains an oracle, it re-enters the
    freshness rotation instead of staying invisibly exempt."""
    prio, queries, oracles, latest = _ledger()
    oracle_less = {n for n in queries if n not in oracles}
    staged_oracle_less = oracle_less & set(prio)
    assert not staged_oracle_less, (
        f"oracle-less names staged (driver would report err: "
        f"no_oracle): {sorted(staged_oracle_less)}"
    )
    # the known exemption set, pinned so silent growth is visible:
    assert oracle_less == {
        "approx_distinct",
        "approx_percentiles",
        "hll_mergeable_counts",
        "stratified_sample",
    }, f"oracle-less set changed: {sorted(oracle_less)}"


def test_ledger_has_no_unknown_registry_names_in_window():
    """Every staged name resolves in the registry AND carries an oracle
    (duplicates/shape pinned by test_registry_priority_window_shape)."""
    prio, queries, oracles, _ = _ledger()
    assert all(n in queries and n in oracles for n in prio)


def test_staged_tail_is_the_oldest_first_prefix():
    """Beyond the oldest cohort: every window slot NOT annotated as a
    re-pin/new-code entry (registry._REPINS) must be exactly the
    oldest-first prefix — sorted by (latest-green round, name) — of the
    non-repin oracle-backed names. This catches a mis-transcribed stale
    name in ANY cohort, e.g. swapping one r06 name for an r07 one in
    this round's 28-of-33 split (r13 review finding; the oldest-cohort
    test alone would miss it)."""
    from pb_etl_spark.registry import _REPINS

    prio, queries, oracles, latest = _ledger()
    assert _REPINS <= set(prio), (
        f"_REPINS entries not staged: {sorted(_REPINS - set(prio))}"
    )
    extras = [n for n in prio if n not in _REPINS]
    candidates = sorted(
        (latest.get(n, 0), n)
        for n in queries
        if n in oracles and n not in _REPINS
    )
    want = {n for _, n in candidates[: len(extras)]}
    assert set(extras) == want, (
        f"staged-but-fresher: {sorted(set(extras) - want)}; "
        f"older-but-left-behind: {sorted(want - set(extras))}"
    )


def test_stage_helper_reproduces_current_window():
    """tools/freshness.stage (the r14+ window generator) must agree
    with the hand-staged current window given the same re-pin set —
    tool, test, and registry stay one convention."""
    from tools.freshness import stage

    from pb_etl_spark.registry import _PRIORITY, _REPINS, _STAGED_FOR

    got = stage(len(_PRIORITY), sorted(_REPINS), as_of=_STAGED_FOR)
    assert set(got) == set(_PRIORITY)
