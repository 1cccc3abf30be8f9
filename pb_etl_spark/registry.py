"""Central query registry: merges every operator module's QUERIES/ORACLES.

``queries()`` / ``oracle_sql()`` in ``__spark_entry__.py`` delegate here.
Invariant (driver contract): every oracle key exists in queries; column
names match exactly between the Spark DataFrame and the oracle SQL; floats
are rounded identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pb_etl_spark.operators import (
    advanced,
    clustering,
    composite,
    composite_ext,
    dedup,
    events,
    multimodal,
    relational,
    reshape,
    scalar_funcs,
    similarity,
    skew,
    temporal,
    text,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

# Order matters: the driver's correctness harness verifies the FIRST 50
# registry entries (registry insertion order) each round. Round 1 checked
# relational/reshape/events/text and left TPC-H, dedup, clustering,
# temporal, skew, multimodal, similarity, scalar/advanced batteries
# unverified — so rotate those to the front and the round-1-green prefix
# to the back. Rotate again whenever a family has driver verification.
_MODULES = [
    composite,
    dedup,
    clustering,
    temporal,
    skew,
    multimodal,
    similarity,
    scalar_funcs,
    advanced,
    composite_ext,
    text,
    relational,
    reshape,
    events,
]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for m in _MODULES:
        overlap = set(out) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    qnames = set(all_queries())
    stray = set(out) - qnames
    if stray:
        raise ValueError(f"oracles without queries: {stray}")
    return out
