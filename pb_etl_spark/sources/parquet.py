"""Parquet dataset source/sink with completion-flag semantics
(SURVEY.md §2.1 S4-S6).

The reference writes Parquet datasets then touches a ``_SUCCESS`` flag, and
guards reads on the flag's existence (/root/reference/pb_etl/luigi/dask/
target.py:92-126,139-148,158-187). Spark's committer already emits
``_SUCCESS`` atomically at job commit, so the sink is plain
``df.write.parquet``; this module adds the guarded-read / existence checks
the incremental layer (pb_etl_spark.plans) relies on.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

SUCCESS_FLAG = "_SUCCESS"

# upsert lock older than this is presumed left by a crashed writer
_LOCK_STALE_S = 3600.0


def _take_dir_lock(target: str, who: str) -> str:
    """O_EXCL lockfile with race-safe stale-break — the same rename-aside
    protocol as ``versioned.VersionedTable._take_lock`` (r13 review
    finding: the previous unlink-in-place break was a TOCTOU that could
    destroy a rival's FRESH lock and admit two writers, whose stale
    sweeps then delete each other's live staging dirs). The stale lock
    is RENAMED to a unique name first (atomic: exactly one contender
    wins; losers get FileNotFoundError and fall through to the create
    attempt, which then fails loudly on the winner's fresh lock)."""
    import time
    import uuid

    lock = f"{target}__lock"
    try:
        try:
            stale = time.time() - os.path.getmtime(lock) > _LOCK_STALE_S
        except FileNotFoundError:
            stale = False  # no lock (or a rival just broke it)
        if stale:
            aside = f"{lock}.stale.{uuid.uuid4().hex[:8]}"
            try:
                os.rename(lock, aside)
            except FileNotFoundError:
                pass  # a rival broke it first; fall through to create
            else:
                # the rename-aside exists only to make the break atomic;
                # once this contender owns the aside name it can delete
                # it, or crashed-writer locks accumulate forever on
                # frequently-compacted targets (ADVICE r13). GUARDED: a
                # rival that won the subsequent lock create may have
                # already swept this aside (its sweep globs every
                # {lock}.stale.*) — losing that race must surface as
                # the designed 'locked by a concurrent writer' error
                # from our own create attempt, not a FileNotFoundError
                try:
                    os.unlink(aside)
                except FileNotFoundError:
                    pass
        fd = os.open(lock, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        os.write(fd, str(os.getpid()).encode())
        os.close(fd)
        # single writer now holds the lock: sweep asides orphaned by
        # contenders that crashed between their rename and unlink
        # (nothing ever reads an aside — the unique name only made the
        # break atomic)
        import glob as _glob

        for orphan in _glob.glob(f"{lock}.stale.*"):
            try:
                os.unlink(orphan)
            except FileNotFoundError:
                pass
    except FileExistsError:
        raise RuntimeError(
            f"{who}: {target} is locked by a concurrent writer ({lock}); "
            "writes are single-writer per target"
        ) from None
    return lock


def _recover_interrupted_swap(target: str) -> None:
    """Restore a table whose writer crashed mid-swap. The swap protocol
    is rename(target, old) then rename(staging, target); a crash between
    the two leaves NO target but a complete ``{target}__old_{token}``
    copy. Caller must hold the lock. Restores the newest old dir (at
    most one can be live — every completed run sweeps on entry) and
    leaves the rest for the caller's sweep. No-op when target exists."""
    import glob

    if os.path.isdir(target):
        return
    olds = sorted(glob.glob(f"{target}__old_*"), key=os.path.getmtime)
    if olds:
        os.rename(olds[-1], target)


def dataset_exists(path: str, flag: str | None = SUCCESS_FLAG) -> bool:
    """True when the dataset at ``path`` is complete.

    ``flag=None`` means "any file present counts" — parity with the
    reference's external-CSV targets (tasks.py:110, target.py:100-111).
    """
    if flag is None:
        return os.path.isdir(path) and any(os.scandir(path))
    return os.path.exists(os.path.join(path, flag))


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = None,
    partition_by: list[str] | None = None,
    cluster_by: list[str] | None = None,
    n_files: int | None = None,
    observe: dict | None = None,
) -> dict | None:
    """Write a DataFrame as a Parquet dataset directory.

    ``compression=None`` keeps Spark's default (snappy) — the reference's
    gzip (tasks.py:183) was a byte-size choice, not a semantic one; snappy
    decodes faster and is the at-scale default. ``partition_by`` enables
    partition pruning on downstream reads.

    ``cluster_by`` range-partitions and sorts the data by the given
    columns before writing, so each output file covers a disjoint value
    range and its parquet min/max statistics prune reads: a selective
    filter on the cluster key then touches ~1/NumFiles of the bytes. This
    is the data-skipping layout a 100 TB table needs for its hottest
    predicate column (the flat-file twin of Delta/Iceberg clustering).

    ``observe`` ({name: aggregate Column}) attaches write-side accounting
    via ``df.observe``: the metrics are computed ON the write job's own
    pass and returned as a dict — row counts / sums for a load audit
    without a second 100 TB scan (the ``count()``-after-write
    anti-pattern). Returns the observed metrics dict, or None.
    """
    observation = None
    if observe:
        from pyspark.sql import Observation

        observation = Observation()
        df = df.observe(observation, *[c.alias(n) for n, c in observe.items()])
    if cluster_by:
        # explicit n_files pins the range-split count (AQE would coalesce a
        # small shuffle to one file, defeating the layout); default sizes
        # from spark.sql.shuffle.partitions
        if n_files:
            df = df.repartitionByRange(n_files, *cluster_by)
        else:
            df = df.repartitionByRange(*cluster_by)
        df = df.sortWithinPartitions(*cluster_by)
    elif n_files:
        df = df.repartition(n_files)
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    return observation.get if observation is not None else None


_Z_BITS = 16  # bits per dimension in the interleaved z-value


def zorder_value(df: DataFrame, cols: list[str]):
    """Z-order (Morton) curve value over 2-4 numeric columns.

    Each column is uniform-bucketized to ``2**(bits_per_dim)`` cells
    between its min and max (one tiny agg — a 1-row literal in the
    plan), then the bucket bits are interleaved round-robin across the
    dimensions. Sorting by the result gives files whose parquet min/max
    stats are narrow in EVERY interleaved column, so predicates on ANY
    dimension prune row groups — single-column ``cluster_by`` only skips
    for its own key. Bits per dimension shrink as dimensions grow
    (16/2-dim, 10/3-dim, 8/4-dim): past ~4 dims the per-dim resolution
    is too coarse to skip anything — the curse that makes wide z-orders
    pointless in every table format. This is the flat-parquet twin of
    Delta/Iceberg Z-ORDER (uniform cells rather than range-partition
    ranks: one agg instead of extra shuffles; skewed columns degrade
    toward fewer effective dims, acceptable for a layout decision).

    Returns (df_with_bounds, zcol) where zcol is the z-value expression.
    """
    from pyspark.sql import functions as F

    n_dims = len(cols)
    if not 2 <= n_dims <= 4:
        raise ValueError("zorder_value interleaves 2-4 columns")
    bits = {2: _Z_BITS, 3: 10, 4: 8}[n_dims]
    bounds = df.agg(
        *[f(c).alias(f"{f.__name__}_{c}") for c in cols for f in (F.min, F.max)]
    ).first()
    n_cells = 1 << bits
    buckets = []
    for c in cols:
        lo = float(bounds[f"min_{c}"])
        hi = float(bounds[f"max_{c}"])
        span = (hi - lo) or 1.0
        b = F.least(
            F.lit(n_cells - 1),
            F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * n_cells),
        ).cast("long")
        buckets.append(b)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for d, b in enumerate(buckets):
            z = z.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(b, i).bitwiseAND(F.lit(1)), n_dims * i + d
                )
            )
    return df, z


def write_parquet_zorder(
    df: DataFrame,
    path: str,
    zorder_by: list[str],
    mode: str = "overwrite",
    n_files: int | None = None,
) -> None:
    """Write with a 2-D Z-order layout: range-partition + sort on the
    interleaved z-value so every file is a compact rectangle in both
    dimensions' parquet statistics."""
    df, z = zorder_value(df, zorder_by)
    df = df.withColumn("__z", z)
    if n_files:
        df = df.repartitionByRange(n_files, "__z")
    else:
        df = df.repartitionByRange("__z")
    df.sortWithinPartitions("__z").drop("__z").write.mode(mode).parquet(path)


def compact_dataset(
    spark: SparkSession,
    path: str,
    target_file_mb: int = 512,
    cluster_by: list[str] | None = None,
) -> int:
    """Compact a parquet dataset's small files into ~``target_file_mb``
    outputs (optionally re-clustering while rewriting — compaction is the
    natural moment to restore a sort layout degraded by appends/upserts).

    The streaming/upsert paths produce one file per micro-batch or merge;
    at 100 TB that is the classic small-files problem (every open/seek is
    an object-store request). Sizing comes from the actual on-disk bytes,
    the rewrite goes through the same staging + rename swap (and writer
    lock) as ``upsert_parquet``, so readers never observe a partial
    dataset. Returns the number of files written.
    """
    import glob
    import math
    import shutil
    import uuid

    lock = _take_dir_lock(path, "compact_dataset")
    try:
        # crash recovery BEFORE the stale-dir sweep, then the same
        # leftover sweep upsert_parquet performs — without it, repeated
        # crashes on a compaction-only target accumulate orphan
        # __staging_/__old_ dirs indefinitely (ADVICE r13)
        _recover_interrupted_swap(path)
        for leftover in glob.glob(f"{path}__staging_*") + glob.glob(
            f"{path}__old_*"
        ):
            shutil.rmtree(leftover, ignore_errors=True)
        total = sum(
            os.path.getsize(f)
            for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        )
        n_files = max(1, math.ceil(total / (target_file_mb << 20)))
        df = spark.read.parquet(path)
        if cluster_by:
            df = df.repartitionByRange(n_files, *cluster_by).sortWithinPartitions(
                *cluster_by
            )
        else:
            df = df.repartition(n_files)
        token = uuid.uuid4().hex[:8]
        staging = f"{path}__staging_{token}"
        try:
            df.write.mode("overwrite").parquet(staging)
        except Exception:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        old = f"{path}__old_{token}"
        os.rename(path, old)
        os.rename(staging, path)
        shutil.rmtree(old, ignore_errors=True)
    finally:
        try:
            os.unlink(lock)
        except FileNotFoundError:
            pass
    return n_files


def read_parquet(spark: SparkSession, path: str, require_flag: bool = True) -> DataFrame:
    """Guarded Parquet read: refuse incomplete datasets (target.py:139-148)."""
    if require_flag and not dataset_exists(path):
        raise FileNotFoundError(f"dataset at {path} is missing or incomplete (no {SUCCESS_FLAG})")
    return spark.read.parquet(path)


def upsert_parquet(
    spark: SparkSession,
    target: str,
    updates: DataFrame,
    key: str | list[str],
) -> None:
    """MERGE/upsert into a flat parquet dataset: rows in ``updates``
    replace target rows with the same key; new keys are inserted; other
    target rows survive. Schema evolves additively (new update columns
    are NULL on old rows, and vice versa, via unionByName).

    Updates must contain at most one row per key (enforced — multiple
    matches would silently duplicate, where Delta/Iceberg MERGE errors);
    pre-compact a CDC batch with keep-latest first.

    SINGLE WRITER, enforced: a ``{target}__lock`` file is taken with
    O_CREAT|O_EXCL before any mutation and a second concurrent upsert on
    the same target raises immediately — without it, the stale-dir sweep
    would delete a live writer's staging directory and two swaps could
    interleave. A lock older than ``_LOCK_STALE_S`` is presumed to belong
    to a crashed writer and is broken. (Multi-writer MERGE needs a real
    table format — Delta/Iceberg optimistic commit — not flat parquet.)

    Plan shape: one anti-join (target minus updated keys) + union — the
    keys-only side is left unhinted so AQE broadcasts it when the batch
    is small and falls back to a shuffle for backfill-sized batches. The
    rewrite goes to a staging directory, the old version is renamed
    aside, staging renamed in, then the old version deleted — readers
    can race a rename (brief FileNotFound, retryable) but never observe
    half-written data, and a crash leaves a recoverable directory. Stale
    staging/old dirs from crashed runs are swept on entry (safe: the
    lock guarantees no live writer owns them).
    """
    import glob
    import shutil
    import uuid

    from pyspark.sql import functions as F

    keys = [key] if isinstance(key, str) else list(key)
    dup = (
        updates.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") > 1)
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            "upsert_parquet: update batch has multiple rows for at least one "
            "key — pre-compact with keep-latest before merging"
        )

    os.makedirs(os.path.dirname(os.path.abspath(target)), exist_ok=True)
    lock = _take_dir_lock(target, "upsert_parquet")
    try:
        # crash recovery BEFORE the stale-dir sweep: a writer that died
        # between its two swap renames left no target but a complete
        # __old_ copy — sweeping first would delete the only surviving
        # data and silently shrink the table to the update batch (r13
        # review finding)
        _recover_interrupted_swap(target)
        for stale in glob.glob(f"{target}__staging_*") + glob.glob(f"{target}__old_*"):
            shutil.rmtree(stale, ignore_errors=True)
        if dataset_exists(target):
            current = spark.read.parquet(target)
            survivors = current.join(updates.select(*keys).distinct(), keys, "left_anti")
            merged = survivors.unionByName(updates, allowMissingColumns=True)
        else:
            merged = updates
        token = uuid.uuid4().hex[:8]
        staging = f"{target}__staging_{token}"
        try:
            merged.write.mode("overwrite").parquet(staging)
        except Exception:
            shutil.rmtree(staging, ignore_errors=True)
            raise
        old = f"{target}__old_{token}"
        if os.path.exists(target):
            os.rename(target, old)
        os.rename(staging, target)
        shutil.rmtree(old, ignore_errors=True)
    finally:
        try:
            os.unlink(lock)
        except FileNotFoundError:
            pass
