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


def swap_persist(key: str, df):
    prev = _CACHE_SWAP.pop(key, None)
    if prev is not None:
        prev.unpersist()
    out = df.persist()
    _CACHE_SWAP[key] = out
    return out
