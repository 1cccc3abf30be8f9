"""Storage-layout operators: hive partitioning (partition pruning) and
Z-order clustering (multi-dimensional data skipping).

With ``bucketing.py`` these cover the three storage layouts that decide
whether a 100 TB scan reads terabytes or gigabytes:

- **Hive partitioning** (`partition_by`): directory-level pruning. A
  filter on the partition column never LISTS — let alone reads — the
  other partitions' files; the plan shows it as ``PartitionFilters`` and
  a pruned ``InMemoryFileIndex``. The layout for low-cardinality,
  always-filtered columns (date, region).
- **Z-order clustering**: single-dimension sort (``cluster_by``) gives
  perfect file-level min/max skipping on ONE column and none on others.
  Interleaving the bits of TWO key columns into one z-value and
  range-partitioning + sorting by it makes every file a small rectangle
  in (a, b) space — selective filters on EITHER column skip most files
  via parquet min/max stats (what Delta's OPTIMIZE ZORDER does). The
  WRITER lives in ``sources/parquet.py`` (``write_parquet_zorder``,
  rectangle property asserted in ``tests/test_layout.py``); this module
  registers the normalize+interleave MATH as the oracle-checked
  ``zorder_key`` query — fixed normalization domain, pure row-wise map,
  bit-for-bit reproducible in DuckDB.
- **Bucketing** (see ``operators/bucketing.py``): hash layout for
  join/aggregation shuffle elimination.

The registered queries return layout-independent results (the DuckDB
oracle runs on the raw table), proving the relayout changes plans, not
semantics; `tests/test_layout_ops.py` asserts the pruning/skipping
itself (partition filters in the plan, per-file min/max disjointness).
"""

from __future__ import annotations

import hashlib
import os
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pb_etl_spark.catalog import read_table

_WAREHOUSE = Path(__file__).resolve().parents[2] / "spark-warehouse" / "layout"

Z_BITS = 16  # bits per dimension in the z-value


def partitioned_events_path(spark: SparkSession, sf_dir: str) -> str:
    """events re-written hive-partitioned by event_date (idempotent per
    sf_dir; the _SUCCESS flag gates reuse so a torn write re-runs)."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = _WAREHOUSE / f"events_by_date_{tag}"
    from pb_etl_spark.catalog import (
        derived_cache_needs_rebuild,
        record_derived_cache_src,
    )

    src = os.path.join(sf_dir, "events.parquet")
    if derived_cache_needs_rebuild(path / "_SUCCESS", src):
        # full rmtree first: partitioned overwrite under
        # partitionOverwriteMode=dynamic only replaces dates present in
        # the NEW fixture, so a shrunken regeneration would leave stale
        # date partitions behind — the rmtree makes the rebuild
        # conf-independent (review finding, same rule as binary docs)
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        ev = read_table(spark, sf_dir, "events").withColumn(
            "event_date", F.to_date("ts")
        )
        ev.write.mode("overwrite").partitionBy("event_date").parquet(str(path))
        record_derived_cache_src(path / "_SUCCESS", src)
    return str(path)


def q_partition_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type event counts for ONE day, read from the date-partitioned
    copy of events: the date predicate is a PARTITION filter — the scan
    lists and reads only that day's directory, never touching the rest
    of the dataset (plan-asserted in tests). At 100 TB with daily
    partitions this is the difference between reading ~1/365th of the
    table and reading all of it."""
    path = partitioned_events_path(spark, sf_dir)
    ev = spark.read.parquet(path)
    # pick a deterministic mid-corpus day so every SF has rows: the
    # fixture spans a fixed range; use the modal date's literal via min+1
    return (
        ev.filter(F.col("event_date") == F.lit("2024-01-02").cast("date"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def zvalue(a, b, bits: int = Z_BITS):
    """Morton/Z-order interleave of two non-negative int columns (low
    ``bits`` of each): bit i of a → bit 2i, bit i of b → bit 2i+1.
    Pure integer expression — runs in whole-stage codegen on Spark and
    reproduces exactly in the DuckDB oracle.

    Callers must feed RANGE-NORMALIZED coordinates (``znorm``): raw
    columns with unequal bit-widths degrade to a single-column sort —
    the wide column's high bits dominate every comparison and the narrow
    column never influences file boundaries (the reason Delta's
    OPTIMIZE ZORDER maps each column through its range first)."""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + (F.shiftleft(F.shiftright(a.cast("long"), i).bitwiseAND(1), 2 * i))
            + (F.shiftleft(F.shiftright(b.cast("long"), i).bitwiseAND(1), 2 * i + 1))
        )
    return z


def znorm(col, cmin, cmax, bits: int = Z_BITS):
    """Scale ``col`` from [cmin, cmax] onto [0, 2^bits) as a double:
    (col - min) * 2^bits / (range + 1). NOTE this is IEEE double
    division, not integer DIV — cross-engine stable because both sides
    run the identical op and the numerator stays far below 2^53. The
    layout keys use ``znorm_int``, which IS exact integer arithmetic."""
    return (
        (col.cast("long") - F.lit(int(cmin))) * F.lit(1 << bits)
    ) / F.lit(int(cmax) - int(cmin) + 1)


def znorm_int(col, cmin, cmax, bits: int = Z_BITS):
    """Integer znorm: (col - min) * 2^bits DIV (range + 1), computed as
    (num - num % den) / den over longs — every step exact long
    arithmetic (the division's quotient has no remainder), so no FLOOR
    over a double anywhere and both engines agree bit-for-bit."""
    num = (col.cast("long") - F.lit(int(cmin))) * F.lit(1 << bits)
    den = F.lit(int(cmax) - int(cmin) + 1)
    return ((num - num % den) / den).cast("long")


def znorm_sql(col: str, cmin: int, cmax: int, bits: int = Z_BITS) -> str:
    num = f"(({col} - {int(cmin)}) * {1 << bits})"
    den = int(cmax) - int(cmin) + 1
    return f"CAST(({num} - {num} % {den}) / {den} AS BIGINT)"


def zvalue_sql(a: str, b: str, bits: int = Z_BITS) -> str:
    """The identical z-value as ANSI SQL (for the oracle)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


ZKEY_BITS = 8  # normalized bit-width for the registered zorder_key query
ZKEY_AMAX = 1 << 20  # fixed normalization domain for the oracle-checked
ZKEY_BMAX = 1 << 20  # query (covers every SF's key range; exact integers)


def q_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-value computation over lineitem's (l_partkey, l_suppkey) — the
    clustering key a Z-ORDER relayout sorts by: each key range-normalized
    onto [0, 2^8), then bit-interleaved. Registered so the normalize +
    interleave math is oracle-checked bit-for-bit; the relayout + file
    skipping it exists for is asserted physically in
    tests/test_layout_ops.py (per-file min/max rectangles shrink on BOTH
    columns). The normalization domain is a fixed literal (not data-
    derived) here so the query is a pure row-wise map."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 1000)
    na = znorm_int(F.col("l_partkey"), 0, ZKEY_AMAX, ZKEY_BITS)
    nb = znorm_int(F.col("l_suppkey"), 0, ZKEY_BMAX, ZKEY_BITS)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_partkey",
        "l_suppkey",
        zvalue(na, nb, ZKEY_BITS).alias("zval"),
    )


def q_dynamic_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition pruning: per-type stats over the HOT days —
    days whose purchase count exceeds the daily average — where the hot-
    day set is only known at RUNTIME (an aggregate subquery, not a
    literal). Joining it (broadcast) against the date-partitioned events
    copy lets Spark inject a DynamicPruningExpression into the fact
    scan: only qualifying day-directories are listed and read, the
    runtime sibling of q_partition_pruned_scan's static pruning
    (plan-asserted in tests/test_plans.py). At 100 TB this is how a
    dim-filtered nightly query reads 10 partitions instead of 3 650."""
    path = partitioned_events_path(spark, sf_dir)
    fact = spark.read.parquet(path)
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("event_date")).agg(
        F.sum(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("purchases")
    )
    # threshold = average daily purchase count (exact integer ratio),
    # collected as TWO INTEGERS (a 1-row driver collect, the
    # bounded-constant pattern): DPP's planner inserts the pruning
    # subquery only for a dim with a plain selective Filter — a
    # crossJoined runtime threshold defeats its benefit heuristic
    t, d = daily.agg(
        F.sum("purchases"), F.count(F.lit(1))
    ).first()
    hot = daily.filter(
        F.col("purchases") * F.lit(int(d)) > F.lit(int(t))
    ).select("event_date")
    return (
        fact.join(F.broadcast(hot), "event_date")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
    )


def orc_orders_path(spark: SparkSession, sf_dir: str) -> str:
    """orders re-written as ORC (idempotent per sf_dir, _SUCCESS-gated
    like the partitioned-events copy) — Spark's built-in columnar
    sibling to parquet, exercised so the engine's source matrix (CSV /
    JSONL / Parquet / ORC) matches what a lakehouse actually contains."""
    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    path = _WAREHOUSE / f"orders_orc_{tag}"
    from pb_etl_spark.catalog import (
        derived_cache_needs_rebuild,
        record_derived_cache_src,
    )

    src = os.path.join(sf_dir, "orders.parquet")
    if derived_cache_needs_rebuild(path / "_SUCCESS", src):
        read_table(spark, sf_dir, "orders").write.mode("overwrite").orc(str(path))
        record_derived_cache_src(path / "_SUCCESS", src)
    return str(path)


def q_orc_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-status revenue rollup read from the ORC copy of orders —
    the ORC connector end-to-end (write → scan → pushdown → aggregate).
    The DuckDB oracle runs the identical aggregate on the parquet
    original, so a hash match proves the ORC round-trip byte-preserves
    the data (cents grid) while the format changes underneath.

    Scale shape: ORC scans support the same predicate pushdown + column
    pruning as parquet (the o_totalprice > 0 filter and 3-column
    ReadSchema reach the scan; asserted in tests/test_layout_ops.py)."""
    path = orc_orders_path(spark, sf_dir)
    o = spark.read.orc(path)
    return (
        o.filter(F.col("o_totalprice") > 0)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias(
                "revenue_cents"
            ),
            F.count_distinct("o_custkey").alias("n_customers"),
        )
    )


def q_xml_roundtrip_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-status rollup computed FROM an XML round-trip of orders —
    ``to_xml(named_struct(...))`` then ``from_xml`` with an explicit
    schema (Spark 4's built-in XML codec, the last leg of the value-codec
    matrix next to ``json_roundtrip``/``orc_roundtrip_agg``). The DuckDB
    oracle aggregates the parquet original directly, so a hash match
    proves the XML encode/decode is lossless for every carried field.

    Scale shape: the round-trip is per-row whole-stage codegen (no
    shuffle added beyond the final rollup's); money rides the cents
    integer grid through the XML text so re-parse is exact, and the
    aggregate shuffles only (status, partial sums)."""
    o = read_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    # the XML encode/decode is the heavy per-row map work and the
    # fixture scan is a single row group = ONE task (0.9 s of this
    # query's 1.2 s at sf0.1, r14 profile) — rebalance the three narrow
    # columns first, guarded so a wide real-scale scan pays nothing
    # (the ddsketch_quantiles pattern)
    from pb_etl_spark.operators._width import core_count, fanout_width
    from pb_etl_spark.operators.retrieval import _scan_width

    if _scan_width(spark, o) < core_count(spark):
        o = o.repartition(fanout_width(spark), "o_orderkey")
    xml = o.selectExpr(
        "to_xml(named_struct("
        "'k', o_orderkey, 's', o_orderstatus, "
        "'c', CAST(ROUND(o_totalprice * 100) AS BIGINT))) AS x"
    )
    back = xml.selectExpr(
        "from_xml(x, 'k BIGINT, s STRING, c BIGINT') AS r"
    ).select("r.k", "r.s", "r.c")
    return back.groupBy(F.col("s").alias("o_orderstatus")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("c").alias("revenue_cents"),
        F.max("k").alias("max_orderkey"),
    )


QUERIES = {
    "partition_pruned_scan": q_partition_pruned_scan,
    "dynamic_partition_pruning": q_dynamic_partition_pruning,
    "zorder_key": q_zorder_key,
    "orc_roundtrip_agg": q_orc_roundtrip_agg,
    "xml_roundtrip_agg": q_xml_roundtrip_agg,
}

ORACLES: dict[str, str] = {
    "xml_roundtrip_agg": """
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents,
               MAX(o_orderkey) AS max_orderkey
        FROM orders
        GROUP BY o_orderstatus
    """,
    "orc_roundtrip_agg": """
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS revenue_cents,
               COUNT(DISTINCT o_custkey) AS n_customers
        FROM orders
        WHERE o_totalprice > 0
        GROUP BY o_orderstatus
    """,
    "dynamic_partition_pruning": """
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS d,
                   SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS purchases
            FROM events GROUP BY 1
        ), tot AS (
            SELECT SUM(purchases) AS t, COUNT(*) AS nd FROM daily
        ), hot AS (
            SELECT d FROM daily CROSS JOIN tot WHERE purchases * nd > t
        )
        SELECT event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 6) AS sum_value
        FROM events
        WHERE CAST(ts AS DATE) IN (SELECT d FROM hot)
        GROUP BY event_type
    """,
    "partition_pruned_scan": """
        SELECT event_type,
               COUNT(*) AS n_events,
               ROUND(SUM(value), 6) AS sum_value
        FROM events
        WHERE CAST(ts AS DATE) = DATE '2024-01-02'
        GROUP BY event_type
    """,
    "zorder_key": f"""
        WITH n AS (
            SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
                   {znorm_sql('l_partkey', 0, ZKEY_AMAX, ZKEY_BITS)} AS na,
                   {znorm_sql('l_suppkey', 0, ZKEY_BMAX, ZKEY_BITS)} AS nb
            FROM lineitem WHERE l_orderkey < 1000
        )
        SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
               {zvalue_sql('na', 'nb', ZKEY_BITS)} AS zval
        FROM n
    """,
}
