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
