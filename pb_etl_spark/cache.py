"""Swap-persist: the engine's one-live-cache-per-query discipline.

Several operators materialize a derived frame that multiple plan legs
consume (RFM's keyed base, the shingle table, the allocation aggregate).
A bare ``.persist()`` per invocation would accumulate one cached copy per
driver/bench run; swap-persist keeps exactly ONE live copy per key by
unpersisting the previous invocation's frame (whose action has completed
by the time a new plan is built) before persisting the new one.

Promoted out of ``operators/affinity.py`` (round-8 review): three operator
modules consume it, so it is shared infrastructure, not an affinity
detail.
"""

from __future__ import annotations

_CACHE_SWAP: dict[str, object] = {}


def swap_persist(key: str, df, materialize: bool = False):
    """``materialize=True`` runs one count() so the cache is BUILT before
    the caller's plan legs read it: when several concurrent stages of one
    action consume a lazily-persisted frame, each stage misses the not-
    yet-built cache and recomputes the whole subtree in parallel (r14
    profile of shingle_containment_pairs: SIX concurrent 2 s jobs all
    computing the same explode+distinct). One upfront pass costs a job;
    N racing recomputations cost N-1 wasted ones. Leave False when the
    frame has a single consumer leg (the count would be pure overhead)."""
    prev = _CACHE_SWAP.pop(key, None)
    if prev is not None:
        prev.unpersist()
    out = df.persist()
    if materialize:
        out.count()
    _CACHE_SWAP[key] = out
    return out
