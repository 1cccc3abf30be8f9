"""Skew-handling utilities: salted aggregation and salted join.

AQE's skew-join splitting handles sort-merge skew automatically
(enabled in session.py), but two shapes still need explicit salting at
100 TB:

- **Heavy-hitter groupBy**: one giant key makes one reducer the straggler.
  ``salted_groupby`` pre-aggregates on (key, salt) — spreading the hot key
  over N reducers — then combines partials. Works for any algebraic
  aggregate (sum/count/min/max); results are exactly equal to the direct
  groupBy.
- **Hot-key equi-join**: ``salted_join`` salts the skewed (fact) side and
  explodes the dim side over all salt values — the classic replicate-dim
  trick, correct for inner/left joins on the salted side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SALTS = 8


def salted_groupby(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = DEFAULT_SALTS,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs``: output_name -> (input_col, fn) with fn in
    {sum, count, min, max}. Phase 1 aggregates on keys+salt (hot keys
    spread over n_salts reducers); phase 2 combines partials on keys
    (sum/count re-sum, min/max re-min/max).
    """
    partial_fns = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    combine_fns = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    salted = df.withColumn("__salt", (F.rand(seed=0) * n_salts).cast("int"))
    phase1 = salted.groupBy(*keys, "__salt").agg(
        *[partial_fns[fn](col).alias(name) for name, (col, fn) in aggs.items()]
    )
    return phase1.groupBy(*keys).agg(
        *[combine_fns[fn](name).alias(name) for name, (_, fn) in aggs.items()]
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = DEFAULT_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Hot-key equi-join: salt the fact side, replicate the dim side across
    all salts, join on (key, salt). Correct for inner and left (fact-side)
    joins; dim rows are duplicated n_salts times — use only when dim ≪ fact."""
    f = fact.withColumn("__salt", (F.rand(seed=0) * n_salts).cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = f.join(d, (f[fact_key] == d[dim_key]) & (f["__salt"] == d["__salt"]), how)
    return joined.drop("__salt")
