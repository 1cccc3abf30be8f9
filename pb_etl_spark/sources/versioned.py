"""Versioned parquet table: copy-on-write snapshots with time travel —
the lakehouse-lite layer over flat parquet.

``upsert_parquet`` (sources/parquet.py) mutates its target in place
(readers always see the newest state, old state is gone). This module
keeps EVERY committed state as an immutable snapshot directory::

    {path}/v=1/...   complete parquet dataset (never mutated)
    {path}/v=2/...
    {path}/_LATEST   text file holding the current version number

giving the three properties a 100 TB pipeline actually buys a table
format for:

- **Snapshot isolation**: a reader resolves ``_LATEST`` once and reads
  that frozen directory — a concurrent commit cannot shear its scan.
- **Time travel**: any retained version is readable by number — the
  "reproduce last Tuesday's training set" requirement.
- **Atomic commit**: a version becomes visible only when the one-byte
  ``_LATEST`` pointer is atomically replaced (os.replace); a crashed
  writer leaves an orphan v-dir, never a torn table.

Copy-on-write cost is the documented trade: every commit rewrites the
survivors (same cost as upsert_parquet's rewrite — flat parquet cannot
do file-level deltas; that is Delta/Iceberg manifest territory).
``vacuum`` bounds retention. Single writer per table, same lock
protocol as upsert_parquet.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class VersionedTable:
    def __init__(self, path: str):
        self.path = path.rstrip("/")

    # -- metadata ----------------------------------------------------------
    def _latest_file(self) -> str:
        return os.path.join(self.path, "_LATEST")

    def latest_version(self) -> int:
        """0 when the table does not exist yet."""
        try:
            with open(self._latest_file()) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def versions(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        out = []
        for d in os.listdir(self.path):
            if d.startswith("v=") and os.path.exists(
                os.path.join(self.path, d, "_SUCCESS")
            ):
                out.append(int(d[2:]))
        return sorted(out)

    def _vdir(self, v: int) -> str:
        return os.path.join(self.path, f"v={v}")

    # -- locking (single writer, stale-break) ------------------------------
    def _take_lock(self) -> str:
        """Delegates to the ONE shared lock protocol
        (``parquet._take_dir_lock``): O_EXCL lockfile, race-safe
        rename-aside stale break, aside unlink + orphan sweep, guarded
        mtime probe. This and the parquet writers previously carried
        two hand-synced copies of the ~25-line protocol, and they had
        already drifted (the parquet copy guarded the
        exists→getmtime TOCTOU and the aside-unlink race; this one did
        not — a rival releasing or sweeping in either window crashed a
        commit with FileNotFoundError instead of acquiring or raising
        the designed locked-by-a-concurrent-writer error)."""
        from pb_etl_spark.sources.parquet import _take_dir_lock

        os.makedirs(self.path, exist_ok=True)
        return _take_dir_lock(self.path, "VersionedTable")

    # -- commits -----------------------------------------------------------
    def _commit_locked(self, df: DataFrame) -> int:
        """Write df as the next snapshot; flip _LATEST atomically.
        Caller must hold the lock."""
        v = self.latest_version() + 1
        vdir = self._vdir(v)
        df.write.mode("overwrite").parquet(vdir)
        tmp = self._latest_file() + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(v))
        os.replace(tmp, self._latest_file())
        return v

    def write(self, df: DataFrame) -> int:
        """Full overwrite as a new snapshot (old versions retained)."""
        lock = self._take_lock()
        try:
            return self._commit_locked(df)
        finally:
            try:
                os.unlink(lock)
            except FileNotFoundError:
                pass

    def upsert(self, spark: SparkSession, updates: DataFrame, key: str | list[str]) -> int:
        """MERGE as a new snapshot: same anti-join + unionByName shape as
        upsert_parquet, but survivors come from the CURRENT SNAPSHOT and
        the merge lands in a NEW one — previous versions stay readable.

        The lock wraps the WHOLE read-merge-commit cycle, not just the
        pointer flip: with only the commit guarded, a rival's commit
        landing between this upsert's read of the current snapshot and
        its own commit would be silently overwritten by survivors
        computed from the stale snapshot (lost update)."""
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
                "VersionedTable.upsert: update batch has multiple rows for "
                "at least one key — pre-compact with keep-latest first"
            )
        lock = self._take_lock()
        try:
            v = self.latest_version()
            if v == 0:
                return self._commit_locked(updates)
            current = self.read(spark, version=v)
            survivors = current.join(
                updates.select(*keys).distinct(), keys, "left_anti"
            )
            return self._commit_locked(
                survivors.unionByName(updates, allowMissingColumns=True)
            )
        finally:
            try:
                os.unlink(lock)
            except FileNotFoundError:
                pass

    # -- reads -------------------------------------------------------------
    def read(self, spark: SparkSession, version: int | None = None) -> DataFrame:
        """Latest snapshot, or time-travel to ``version``."""
        v = self.latest_version() if version is None else version
        vdir = self._vdir(v)
        if v == 0 or not os.path.exists(os.path.join(vdir, "_SUCCESS")):
            raise FileNotFoundError(
                f"VersionedTable: no complete snapshot v={v} under {self.path}"
            )
        return spark.read.parquet(vdir)

    # -- retention ---------------------------------------------------------
    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop all but the newest ``keep_last`` snapshots; returns the
        removed version numbers. Never removes the version ``_LATEST``
        points to — retention is anchored on the COMMITTED latest, not
        the directory listing (r13 review finding: a crash between the
        v-dir write and the ``_LATEST`` flip leaves an orphan v-dir
        NEWER than latest; keeping by listing alone would then vacuum
        the live version and break every subsequent read). The orphan
        itself is removable (it was never committed)."""
        removed = []
        lock = self._take_lock()
        try:
            vs = self.versions()
            latest = self.latest_version()  # what _LATEST actually says
            committed = [v for v in vs if v <= latest]
            keep = set(committed[-max(1, keep_last):]) | {latest}
            for v in vs:
                if v not in keep:
                    shutil.rmtree(self._vdir(v), ignore_errors=True)
                    removed.append(v)
        finally:
            try:
                os.unlink(lock)
            except FileNotFoundError:
                pass
        return removed
