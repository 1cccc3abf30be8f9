"""Change-data-capture operators: SCD Type 2 merge.

Completes the CDC family — ``dedup.q_dedup_keep_latest`` is SCD-1 compaction
(latest row wins), ``sources.parquet.upsert_parquet`` is full-row MERGE;
this module keeps *history*: every change closes the previous version row
and opens a new one, so any past state is queryable with
``valid_from <= t < valid_to``.

Plan shape at scale: one join keyed on the business key between the
current slice of the dimension and the (small) update batch — broadcast
when updates are a trickle — plus a union of four row sets. No windows, no
per-row Python, history rows untouched (they carry no join key match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OPEN_END = "9999-12-31 23:59:59"


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
