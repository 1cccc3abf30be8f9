"""Change-data-capture operators: SCD Type 2 merge + snapshot diff.

Completes the CDC family — ``dedup.q_dedup_keep_latest`` is SCD-1 compaction
(latest row wins), ``sources.parquet.upsert_parquet`` is full-row MERGE;
this module keeps *history* (every change closes the previous version row
and opens a new one, so any past state is queryable with
``valid_from <= t < valid_to``) and DERIVES a change feed from two table
snapshots when the source system provides none (``snapshot_diff``).

Plan shape at scale: one join keyed on the business key between the
current slice of the dimension and the (small) update batch — broadcast
when updates are a trickle — plus a union of four row sets. No windows, no
per-row Python, history rows untouched (they carry no join key match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

OPEN_END = "9999-12-31 23:59:59"


def snapshot_diff(
    old: DataFrame, new: DataFrame, key: str, attr_cols: list[str]
) -> DataFrame:
    """Change feed between two snapshots of the same table: one row per
    changed key with change_type ∈ {insert, update, delete} and both
    value tuples (old NULLs for inserts, new NULLs for deletes).
    Unchanged keys are dropped — the feed is delta-sized, not
    table-sized.

    Plan shape: ONE full-outer equi-join on the key (shuffle both sides
    on the key — the minimum for diffing unsorted snapshots; with both
    snapshots bucketed on the key, zero-exchange, see bucketing.py), and
    a null-safe struct comparison so NULL attribute values diff
    correctly. At 100 TB the output is what feeds incremental downstream
    recomputation instead of a full reprocess."""
    o = old.select(key, *[F.col(c).alias(f"old_{c}") for c in attr_cols])
    n = new.select(key, *[F.col(c).alias(f"new_{c}") for c in attr_cols])
    o_struct = F.struct(*[F.col(f"old_{c}") for c in attr_cols])
    n_struct = F.struct(*[F.col(f"new_{c}") for c in attr_cols])
    # presence must come from the join side, not attr NULL-ness: a key
    # whose attrs are all NULL is still present — carry explicit markers
    o = o.withColumn("__in_old", F.lit(True))
    n = n.withColumn("__in_new", F.lit(True))
    joined = o.join(n, key, "full_outer")
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("insert"))
        .when(F.col("__in_new").isNull(), F.lit("delete"))
        .when(~o_struct.eqNullSafe(n_struct), F.lit("update"))
    )
    return (
        joined.withColumn("change_type", change)
        .filter(F.col("change_type").isNotNull())
        .select(
            key,
            "change_type",
            *[f"old_{c}" for c in attr_cols],
            *[f"new_{c}" for c in attr_cols],
        )
    )


def scd2_merge(
    dim: DataFrame,
    updates: DataFrame,
    key: str,
    ts_col: str = "effective_ts",
    attr_cols: list[str] | None = None,
) -> DataFrame:
    """Apply an update batch to an SCD2 dimension.

    ``dim`` columns: key, attrs..., ``valid_from``, ``valid_to``,
    ``is_current``; ``updates`` columns: key, attrs..., ``ts_col``.
    Per key at most ONE update row is applied (callers pre-compact a batch
    with keep-latest); changed keys get their current row closed at the
    update timestamp and a new open row; brand-new keys get an open row;
    attribute-identical updates are no-ops; a STALE update (ts not after
    the current row's valid_from) is ignored — applying it would invert
    the closed interval and corrupt point-in-time queries.

    Plan shape: the existing-key path is current LEFT JOIN updates on the
    business key — equi-join, broadcastable when the batch is a trickle;
    inserts come from an anti-join of updates against current. (A single
    full_outer join would silently defeat broadcast: BroadcastHashJoin
    does not support full outer.) Presence is tracked with explicit
    marker literals, not column-NULL-ness, so NULL timestamps in the data
    cannot silently drop rows.
    """
    attr_cols = attr_cols or [
        c
        for c in updates.columns
        if c not in (key, ts_col)
    ]
    up = updates.select(
        F.col(key),
        *[F.col(c).alias(f"__u_{c}") for c in attr_cols],
        F.col(ts_col).alias("__u_ts"),
        F.lit(True).alias("__u_present"),
    )

    current = dim.filter(F.col("is_current"))
    history = dim.filter(~F.col("is_current"))

    joined = current.join(F.broadcast(up), key, "left")
    # every conjunct must be null-safe: `applied` is used both as
    # filter(applied) and filter(~applied), and a SQL NULL (e.g. from a
    # NULL update timestamp) is excluded by BOTH — the row would vanish
    # from the dimension. coalesce(False) treats NULL-ts as stale/ignored.
    applied = (
        F.coalesce(F.col("__u_present"), F.lit(False))
        & F.coalesce(F.col("__u_ts") > F.col("valid_from"), F.lit(False))
        & ~F.struct(*[F.col(c) for c in attr_cols]).eqNullSafe(
            F.struct(*[F.col(f"__u_{c}") for c in attr_cols])
        )
    )

    # current rows that survive untouched (no update, identical attrs,
    # or stale update)
    untouched = joined.filter(~applied).select(dim.columns)
    # current rows closed by a change
    closed = joined.filter(applied).select(
        F.col(key),
        *[F.col(c) for c in attr_cols],
        F.col("valid_from"),
        F.col("__u_ts").alias("valid_to"),
        F.lit(False).alias("is_current"),
    )
    # new versions for changed keys
    reopened = joined.filter(applied).select(
        F.col(key),
        *[F.col(f"__u_{c}").alias(c) for c in attr_cols],
        F.col("__u_ts").alias("valid_from"),
        F.lit(OPEN_END).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    # brand-new keys: anti-join against the current slice
    inserts = (
        up.join(current.select(key), key, "left_anti")
        .select(
            F.col(key),
            *[F.col(f"__u_{c}").alias(c) for c in attr_cols],
            F.col("__u_ts").alias("valid_from"),
            F.lit(OPEN_END).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return (
        history.unionByName(untouched)
        .unionByName(closed)
        .unionByName(reopened)
        .unionByName(inserts)
    )


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change feed between two simulated snapshots of orders: snapshot A
    drops keys ≡0 (mod 11) (→ inserts in B), snapshot B drops keys ≡0
    (mod 13) (→ deletes), and B bumps o_totalprice 10% for keys ≡0
    (mod 5) (→ updates). One full-outer join, delta-sized output."""
    # 10% bump in integer cents ((cents*110) div 100 — exact in any
    # engine; ROUND(x*1.1, 2) diverges between engines at double
    # half-boundaries, the money-arithmetic rule from trailing_rows_avg)
    snap_a, snap_b = _snapshots(spark, sf_dir)
    return snapshot_diff(
        snap_a, snap_b, "o_orderkey", ["o_totalprice", "o_orderstatus"]
    )


def q_scd2_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge end-to-end (driver-checkable): the orders table plays
    an open dimension (every row current since its order date); an
    update batch re-prioritizes keys ≡0 (mod 7) thirty days later and
    lands brand-new keys (originals ≡0 (mod 50), offset by 1e7) after
    45 days. Output = the merged dimension: closed old versions,
    reopened current versions, untouched rows, and inserts.

    Exercises scd2_merge()'s whole decision table with a SQL-expressible
    outcome partition (every update changes the attribute and is newer
    than valid_from, so applied/stale/no-op branches are deterministic).
    The update batch is broadcast inside scd2_merge — correct for
    trickle batches; a 100 TB bulk merge would flip to a shuffled join
    (AQE decides when the hint is dropped)."""
    from pb_etl_spark.catalog import read_table

    base = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    dim = base.select(
        "o_orderkey",
        "o_orderpriority",
        F.col("o_orderdate").alias("valid_from"),
        F.lit(OPEN_END).cast("timestamp").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    updates = (
        base.filter(F.col("o_orderkey") % 7 == 0)
        .select(
            "o_orderkey",
            F.lit("X-REVIEW").alias("o_orderpriority"),
            (F.col("o_orderdate") + F.expr("interval 30 days")).alias("eff_ts"),
        )
        .unionByName(
            base.filter(F.col("o_orderkey") % 50 == 0).select(
                (F.col("o_orderkey") + F.lit(10_000_000)).alias("o_orderkey"),
                F.lit("X-NEW").alias("o_orderpriority"),
                (F.col("o_orderdate") + F.expr("interval 45 days")).alias(
                    "eff_ts"
                ),
            )
        )
    )
    merged = scd2_merge(
        dim, updates, "o_orderkey", ts_col="eff_ts", attr_cols=["o_orderpriority"]
    )
    return merged.select(
        "o_orderkey",
        "o_orderpriority",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss").alias("valid_to"),
        F.col("is_current").cast("int").alias("is_current"),
    )


def _snapshots(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """The simulated A/B order snapshots shared by snapshot_diff and the
    incremental-maintenance query (same mod-11/13/5 partition)."""
    from pb_etl_spark.catalog import read_table

    orders = read_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    snap_a = orders.filter(F.col("o_orderkey") % 11 != 0)
    bumped = (
        F.expr("(cast(round(o_totalprice * 100) as bigint) * 110) div 100")
        / F.lit(100.0)
    )
    snap_b = orders.filter(F.col("o_orderkey") % 13 != 0).withColumn(
        "o_totalprice",
        F.when(F.col("o_orderkey") % 5 == 0, bumped).otherwise(
            F.col("o_totalprice")
        ),
    )
    return snap_a, snap_b


def q_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance: the per-status
    (count, revenue) aggregate over snapshot B is produced WITHOUT
    scanning B — old aggregate ⊎ signed delta contributions from the
    change feed (delete → −old, insert → +new, update → −old +new,
    handling status changes by crediting each side to its own group).
    The oracle recomputes the aggregate DIRECTLY from B, so a
    hash-match proves the delta algebra, not just the arithmetic.

    This is the core of incremental pipelines at 100 TB: the nightly
    update touches |Δ| rows instead of re-aggregating the fact table;
    any algebraic aggregate (SUM/COUNT/avg-as-sum/count, sketch unions)
    maintains the same way. Revenue stays on the integer-cents grid
    end-to-end, so the maintained and recomputed sums are bit-identical.
    Plan shape: one aggregate over A, one delta-sized diff join, a
    bounded union — B itself is never scanned."""
    snap_a, snap_b = _snapshots(spark, sf_dir)
    cents = lambda c: F.round(F.col(c) * 100).cast("long")  # noqa: E731
    agg_a = snap_a.groupBy(
        F.col("o_orderstatus").alias("status")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(cents("o_totalprice")).alias("cents"),
    )
    diff = snapshot_diff(
        snap_a, snap_b, "o_orderkey", ["o_totalprice", "o_orderstatus"]
    )
    minus_old = diff.filter(
        F.col("change_type").isin("delete", "update")
    ).select(
        F.col("old_o_orderstatus").alias("status"),
        F.lit(-1).cast("long").alias("n"),
        (-cents("old_o_totalprice")).alias("cents"),
    )
    plus_new = diff.filter(
        F.col("change_type").isin("insert", "update")
    ).select(
        F.col("new_o_orderstatus").alias("status"),
        F.lit(1).cast("long").alias("n"),
        cents("new_o_totalprice").alias("cents"),
    )
    return (
        agg_a.unionByName(minus_old)
        .unionByName(plus_new)
        .groupBy("status")
        .agg(F.sum("n").cast("long").alias("n_orders"),
             (F.sum("cents").cast("double") / F.lit(100.0)).alias("revenue"))
        .filter(F.col("n_orders") > 0)
    )


QUERIES = {
    "snapshot_diff": q_snapshot_diff,
    "scd2_merge_orders": q_scd2_merge_orders,
    "incremental_agg_maintenance": q_incremental_agg_maintenance,
}

ORACLES: dict[str, str] = {
    # the oracle recomputes DIRECTLY from snapshot B — matching it
    # proves the Spark side's incremental delta algebra
    "incremental_agg_maintenance": """
        WITH b AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 5 = 0
                        THEN ((CAST(ROUND(o_totalprice * 100) AS BIGINT) * 110)
                              // 100) / 100.0
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderstatus
            FROM orders WHERE o_orderkey % 13 <> 0
        )
        SELECT o_orderstatus AS status,
               COUNT(*) AS n_orders,
               CAST(CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                         AS BIGINT) AS DOUBLE) / 100.0 AS revenue
        FROM b GROUP BY o_orderstatus
    """,
    "scd2_merge_orders": """
        WITH base AS (
            SELECT o_orderkey, o_orderpriority, o_orderdate FROM orders
        )
        SELECT o_orderkey, o_orderpriority,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS valid_from,
               strftime(o_orderdate + INTERVAL 30 DAY,
                        '%Y-%m-%d %H:%M:%S') AS valid_to,
               0 AS is_current
        FROM base WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, 'X-REVIEW',
               strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d %H:%M:%S'),
               '9999-12-31 23:59:59', 1
        FROM base WHERE o_orderkey % 7 = 0
        UNION ALL
        SELECT o_orderkey, o_orderpriority,
               strftime(o_orderdate, '%Y-%m-%d %H:%M:%S'),
               '9999-12-31 23:59:59', 1
        FROM base WHERE o_orderkey % 7 <> 0
        UNION ALL
        SELECT o_orderkey + 10000000, 'X-NEW',
               strftime(o_orderdate + INTERVAL 45 DAY, '%Y-%m-%d %H:%M:%S'),
               '9999-12-31 23:59:59', 1
        FROM base WHERE o_orderkey % 50 = 0
    """,
    "snapshot_diff": """
        WITH a AS (
            SELECT o_orderkey, o_totalprice, o_orderstatus
            FROM orders WHERE o_orderkey % 11 <> 0
        ), b AS (
            SELECT o_orderkey,
                   CASE WHEN o_orderkey % 5 = 0
                        THEN ((CAST(ROUND(o_totalprice * 100) AS BIGINT) * 110)
                              // 100) / 100.0
                        ELSE o_totalprice END AS o_totalprice,
                   o_orderstatus
            FROM orders WHERE o_orderkey % 13 <> 0
        )
        SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
               CASE WHEN a.o_orderkey IS NULL THEN 'insert'
                    WHEN b.o_orderkey IS NULL THEN 'delete'
                    WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
                         OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
                         THEN 'update' END AS change_type,
               a.o_totalprice AS old_o_totalprice,
               a.o_orderstatus AS old_o_orderstatus,
               b.o_totalprice AS new_o_totalprice,
               b.o_orderstatus AS new_o_orderstatus
        FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
        WHERE CASE WHEN a.o_orderkey IS NULL THEN 'insert'
                   WHEN b.o_orderkey IS NULL THEN 'delete'
                   WHEN a.o_totalprice IS DISTINCT FROM b.o_totalprice
                        OR a.o_orderstatus IS DISTINCT FROM b.o_orderstatus
                        THEN 'update' END IS NOT NULL
    """,
}
