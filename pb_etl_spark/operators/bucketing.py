"""Bucketed (co-located) joins — the storage-level shuffle-elimination
pattern for joins that repeat on the same key at 100 TB scale.

A normal equi-join shuffles BOTH sides on the key every time it runs.
Writing the fact and dimension bucketed (`bucketBy(n, key)` + `sortBy`)
pays that shuffle ONCE at write time; every subsequent join on the bucket
key is then a zero-exchange sort-merge join — each task streams bucket i
of both tables. On a 1000-executor cluster joining a 100 TB fact to a
1 TB dimension nightly, this converts the dominant network cost of every
run into a one-time write cost (the same reason the reference clusters
its parquet output — /root/reference/pb_etl/tasks.py:183-189 writes
sorted/partitioned data for downstream readers).

Spark specifics exercised here:
- `bucketBy` is only available on `saveAsTable` (bucket metadata lives in
  the catalog, not the files), so the tables land as EXTERNAL parquet
  tables under the repo's gitignored spark-warehouse dir.
- Bucket counts must match (or divide) on both sides for exchange
  elimination; `sortBy` additionally removes the per-task sort.
- `tests/test_plans.py::test_bucketed_join_has_no_shuffle` pins the plan:
  with broadcast disabled, the join is a SortMergeJoin with NO
  ShuffleExchange on either input.

The registered query's RESULT is storage-independent — the DuckDB oracle
runs the plain join on the raw parquet — so correctness-checking also
proves bucketing did not change semantics.
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pb_etl_spark.catalog import read_table
from pb_etl_spark.operators import money

N_BUCKETS = 8

# external-table files live under the repo's (gitignored) warehouse dir,
# keyed by source dir so different SFs never collide
_WAREHOUSE = Path(__file__).resolve().parents[2] / "spark-warehouse" / "buckets"


def write_bucketed(
    spark: SparkSession,
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = N_BUCKETS,
    path: str | None = None,
) -> None:
    """Write ``df`` as an external parquet table bucketed+sorted on
    ``key``. Re-registers the table if it already exists (the bucket
    spec is catalog metadata — a fresh session must rewrite it)."""
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        df.write.format("parquet")
        .bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def _register_existing(
    spark: SparkSession, tbl: str, key: str, path: Path, schema
) -> bool:
    """If a COMPLETE bucketed table already sits at ``path`` (_SUCCESS
    marker), re-register the catalog entry only — no rewrite. Returns
    True when the table is ready. Avoids re-paying the bucket write on
    every call and the rewrite race between concurrent sessions
    (pytest + bench) sharing the warehouse dir."""
    if not (path / "_SUCCESS").exists():
        return False
    if spark.catalog.tableExists(tbl):
        return True
    cols = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in schema.fields)
    spark.sql(
        f"CREATE TABLE {tbl} ({cols}) USING PARQUET "
        f"CLUSTERED BY ({key}) SORTED BY ({key}) INTO {N_BUCKETS} BUCKETS "
        f"LOCATION '{path}'"
    )
    return True


def bucketed_tables(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """orders/customer bucketed on custkey as session tables; returns the
    two DataFrames reading from bucketed storage. The write runs at most
    once per (sf_dir, fixture version): the cache tag folds in the source
    parquet mtimes, so a regenerated fixture lands in a fresh dir instead
    of being read stale, and later calls only re-register the catalog
    entry."""
    stamp = "|".join(
        f"{t}:{os.path.getmtime(f'{sf_dir.rstrip(chr(47))}/{t}.parquet'):.0f}"
        for t in ("orders", "customer")
    )
    tag = hashlib.md5(f"{sf_dir}|{stamp}".encode()).hexdigest()[:8]
    base = _WAREHOUSE / tag
    os.makedirs(base, exist_ok=True)
    specs = [
        ("orders", "o_custkey", ["o_orderkey", "o_custkey", "o_totalprice"]),
        ("customer", "c_custkey", ["c_custkey", "c_mktsegment"]),
    ]
    out = []
    for name, key, cols in specs:
        tbl = f"pbspark_bkt_{name}_{tag}"
        src = read_table(spark, sf_dir, name).select(*cols)
        if not _register_existing(spark, tbl, key, base / name, src.schema):
            write_bucketed(spark, src, tbl, key, path=str(base / name))
        out.append(spark.table(tbl))
    return out[0], out[1]


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue by market segment over a CO-LOCATED orders⋈customer join:
    both sides pre-bucketed on custkey, so the join itself is a
    zero-exchange sort-merge join (plan-asserted in tests). The only
    shuffle in the query is the final 5-group aggregate."""
    orders, cust = bucketed_tables(spark, sf_dir)
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            money.money_sum(
                money.cents(F.col("o_totalprice")), money.CENTS, "bucketed_join"
            ).alias("revenue"),
            F.count_distinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


QUERIES = {
    "bucketed_join": q_bucketed_join,
}

ORACLES: dict[str, str] = {
    # plain join on the raw parquet — storage layout must not change results
    "bucketed_join": f"""
        SELECT c.c_mktsegment,
               {money.sql_money_sum(
                   money.sql_cents("o.o_totalprice"), money.CENTS
               )} AS revenue,
               COUNT(DISTINCT o.o_custkey) AS n_customers,
               COUNT(*) AS n_orders
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        GROUP BY c.c_mktsegment
    """,
}
