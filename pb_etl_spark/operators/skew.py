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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pb_etl_spark.operators import money

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


def q_skew_salted_agg(spark, sf_dir: str):
    """Registry entry: the salted two-phase aggregation over lineitem —
    results are exactly the direct groupBy's, so the oracle is plain SQL;
    what's different is the plan (hot keys spread over 8 reducers)."""
    from pb_etl_spark.catalog import read_table

    li = read_table(spark, sf_dir, "lineitem")
    return salted_groupby(
        li,
        ["l_returnflag"],
        {
            "total_qty": ("l_quantity", "sum"),
            "n_rows": ("l_quantity", "count"),
            "max_price": ("l_extendedprice", "max"),
        },
    ).select(
        "l_returnflag",
        F.round("total_qty", 2).alias("total_qty"),
        "n_rows",
        F.round("max_price", 2).alias("max_price"),
    )


def q_skew_salted_join(spark, sf_dir: str):
    """Registry entry: hot-key-safe join orders⋈customer, summarized per
    market segment — equal to the direct join, executed salted."""
    from pb_etl_spark.catalog import read_table

    orders = read_table(spark, sf_dir, "orders")
    cust = read_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    return (
        salted_join(orders, cust, "o_custkey", "c_custkey")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            money.money_sum(
                money.cents(F.col("o_totalprice")), money.CENTS, "skew_salted_join"
            ).alias("segment_spend"),
        )
    )


ORACLES: dict[str, str] = {
    "skew_salted_agg": """
        SELECT l_returnflag,
               ROUND(SUM(l_quantity), 2) AS total_qty,
               COUNT(l_quantity) AS n_rows,
               ROUND(MAX(l_extendedprice), 2) AS max_price
        FROM lineitem GROUP BY l_returnflag
    """,
    "skew_salted_join": f"""
        SELECT c_mktsegment,
               COUNT(*) AS n_orders,
               {money.sql_money_sum(
                   money.sql_cents("o_totalprice"), money.CENTS
               )} AS segment_spend
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
}

QUERIES = {
    "skew_salted_agg": q_skew_salted_agg,
    "skew_salted_join": q_skew_salted_join,
}


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
    joins ONLY — right/full outer would surface each matched dim key's
    n_salts-1 unmatched replicas as spurious null-fact rows, so those are
    rejected. Dim rows are duplicated n_salts times — use when dim ≪ fact."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"salted_join supports how='inner'|'left', got {how!r} — "
            "replicated dim rows would corrupt right/full outer results"
        )
    f = fact.withColumn("__salt", (F.rand(seed=0) * n_salts).cast("int"))
    d = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    joined = f.join(d, (f[fact_key] == d[dim_key]) & (f["__salt"] == d["__salt"]), how)
    return joined.drop("__salt")
