"""VersionedTable (sources/versioned.py): snapshot isolation, time
travel, atomic pointer flip, retention, single-writer lock."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pb_etl_spark.sources.versioned import VersionedTable


def _df(spark, rows):
    return spark.createDataFrame(rows, ["k", "val"])


def test_upsert_creates_snapshots_and_time_travel(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    v1 = t.write(_df(spark, [(1, "a"), (2, "b")]))
    v2 = t.upsert(spark, _df(spark, [(2, "B"), (3, "c")]), key="k")
    assert (v1, v2) == (1, 2)
    assert t.versions() == [1, 2]

    latest = {r.k: r.val for r in t.read(spark).collect()}
    assert latest == {1: "a", 2: "B", 3: "c"}
    # time travel: v1 is untouched by the merge
    old = {r.k: r.val for r in t.read(spark, version=1).collect()}
    assert old == {1: "a", 2: "b"}


def test_vacuum_keeps_newest_and_latest_survives(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    for i in range(4):
        t.write(_df(spark, [(i, str(i))]))
    removed = t.vacuum(keep_last=2)
    assert removed == [1, 2]
    assert t.versions() == [3, 4]
    assert t.read(spark).count() == 1  # latest pointer still valid


def test_upsert_rejects_duplicate_update_keys(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    t.write(_df(spark, [(1, "a")]))
    with pytest.raises(ValueError, match="multiple rows"):
        t.upsert(spark, _df(spark, [(1, "x"), (1, "y")]), key="k")


def test_concurrent_writer_is_rejected(spark, tmp_path):
    t = VersionedTable(str(tmp_path / "tbl"))
    t.write(_df(spark, [(1, "a")]))
    lock = f"{t.path}__lock"
    open(lock, "w").write("held")
    try:
        with pytest.raises(RuntimeError, match="locked"):
            t.write(_df(spark, [(2, "b")]))
    finally:
        os.unlink(lock)


def test_reader_snapshot_isolated_from_commit(spark, tmp_path):
    """A DataFrame resolved against v1 keeps reading v1's files even
    after a new commit flips _LATEST (copy-on-write: old dirs are never
    mutated)."""
    t = VersionedTable(str(tmp_path / "tbl"))
    t.write(_df(spark, [(1, "a"), (2, "b")]))
    pinned = t.read(spark)  # resolves v=1 directory now
    t.upsert(spark, _df(spark, [(2, "B")]), key="k")
    assert {r.k: r.val for r in pinned.collect()} == {1: "a", 2: "b"}
    assert {r.k: r.val for r in t.read(spark).collect()} == {1: "a", 2: "B"}


def test_time_travel_diff_composes_with_snapshot_diff(spark, tmp_path):
    """The lakehouse composition: CHANGES BETWEEN v1 AND v2 = running
    snapshot_diff over two time-travel reads of the same table."""
    from pb_etl_spark.operators.cdc import snapshot_diff

    t = VersionedTable(str(tmp_path / "tbl"))
    t.write(_df(spark, [(1, "a"), (2, "b"), (3, "c")]))
    t.upsert(spark, _df(spark, [(2, "B"), (4, "d")]), key="k")

    feed = snapshot_diff(
        t.read(spark, version=1), t.read(spark, version=2), "k", ["val"]
    )
    got = {(r.k, r.change_type) for r in feed.collect()}
    assert got == {(2, "update"), (4, "insert")}


def test_vacuum_anchors_on_latest_not_directory_listing(spark, tmp_path):
    """r13 review finding: a crash between the v-dir write and the
    _LATEST flip leaves an orphan snapshot NEWER than the committed
    latest. vacuum must keep what _LATEST points to (and may remove the
    never-committed orphan) — keeping by directory listing alone would
    delete the live version and break every subsequent read."""
    t = VersionedTable(str(tmp_path / "tbl"))
    t.write(_df(spark, [(1, "a")]))
    t.write(_df(spark, [(1, "b")]))
    assert t.latest_version() == 2
    # simulate the crashed commit: complete v=3 dir, _LATEST still 2
    _df(spark, [(1, "orphan")]).write.parquet(str(tmp_path / "tbl" / "v=3"))
    assert t.versions() == [1, 2, 3]

    removed = t.vacuum(keep_last=1)
    assert 2 not in removed, "vacuum removed the committed latest"
    assert t.latest_version() == 2
    assert {r.val for r in t.read(spark).collect()} == {"b"}
    assert 3 in removed, "the never-committed orphan should be removable"


def test_upsert_recovers_from_crash_between_swap_renames(spark, tmp_path):
    """r13 review finding: a writer that crashed between
    rename(target, old) and rename(staging, target) left the ONLY copy
    of the table in {target}__old_*; the next upsert used to sweep it
    and silently rebuild the table from the update batch alone."""
    import os as _os

    from pb_etl_spark.sources.parquet import upsert_parquet

    target = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b")], ["id", "v"])
    upsert_parquet(spark, target, base, "id")
    # simulate the crash window: target renamed aside, no new target yet
    _os.rename(target, f"{target}__old_deadbeef")

    updates = spark.createDataFrame([(2, "B"), (3, "c")], ["id", "v"])
    upsert_parquet(spark, target, updates, "id")
    got = {r.id: r.v for r in spark.read.parquet(target).collect()}
    assert got == {1: "a", 2: "B", 3: "c"}, (
        "pre-crash rows were lost — recovery must restore __old_ before "
        "the stale sweep"
    )


def test_stale_lock_break_is_rename_aside(tmp_path):
    """r13 review finding: breaking a stale lock by unlink-in-place is
    a TOCTOU that can destroy a rival's FRESH lock. The shared helper
    must (a) break a genuinely stale lock and take it, (b) refuse a
    fresh one. ADVICE r13 tightened (a): the rename-aside exists only
    to make the break atomic — the winner unlinks it (and any orphans
    from crashed contenders) so asides don't accumulate forever."""
    import os as _os
    import time as _time

    from pb_etl_spark.sources.parquet import _LOCK_STALE_S, _take_dir_lock

    target = str(tmp_path / "tbl")
    lock = f"{target}__lock"
    # stale lock: old mtime -> broken (renamed aside), new lock taken
    with open(lock, "w") as f:
        f.write("999")
    old = _time.time() - _LOCK_STALE_S - 10
    _os.utime(lock, (old, old))
    # plus an aside orphaned by a contender that crashed mid-break
    with open(f"{lock}.stale.deadbeef", "w") as f:
        f.write("998")
    got = _take_dir_lock(target, "test")
    assert got == lock and _os.path.exists(lock)
    import glob as _glob

    assert not _glob.glob(f"{lock}.stale.*"), (
        "rename-aside and orphaned asides must be unlinked after the "
        "break (ADVICE r13: they accumulated forever)"
    )
    # fresh lock: refused loudly
    with pytest.raises(RuntimeError, match="locked by a concurrent writer"):
        _take_dir_lock(target, "test")
    _os.unlink(lock)
