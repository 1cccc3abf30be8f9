"""Pins for the round-5/6 ADVICE items (non-Spark, fast).

- ``_parquet_rows_at_most`` must refuse to "prove" a row bound from
  parquet footers when the directory also holds non-parquet data files
  (their rows are invisible to footers → undercount → OOM-risk routing).
- ``bench.prior_slowest`` must pick the LATEST bench record numerically:
  lexicographic sorting puts BENCH_r10 before BENCH_r2 and would warm up
  against a stale round from round 10 onward.
"""

from __future__ import annotations

import os
import shutil

import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_parquet_rows_at_most_refuses_mixed_extension_dirs(tmp_path):
    from pb_etl_spark.operators.clustering import _parquet_rows_at_most

    src = f"{SF_DIR}/region.parquet"
    d = tmp_path / "data"
    d.mkdir()
    shutil.copy(src, d / "part-0.parquet")
    assert _parquet_rows_at_most(str(d), 10**9)  # pure parquet: provable
    (d / "part-1.orc").write_bytes(b"ORC")  # rows hidden from footers
    assert not _parquet_rows_at_most(str(d), 10**9)
    # hidden/underscore entries (_SUCCESS, .crc) are not data files
    os.remove(d / "part-1.orc")
    (d / "_SUCCESS").write_bytes(b"")
    (d / ".part-0.parquet.crc").write_bytes(b"x")
    assert _parquet_rows_at_most(str(d), 10**9)


def test_prior_slowest_sorts_rounds_numerically(monkeypatch):
    import bench
    import tools.bench_compare as bc

    fake_files = ["BENCH_r2.json", "BENCH_r10.json", "notes.txt"]
    monkeypatch.setattr(bench.os, "listdir", lambda _: fake_files)
    seen = []

    def fake_load(path):
        seen.append(os.path.basename(path))
        return {"queries": {"a": 3.0, "b": 1.0, "c": 2.0}}

    monkeypatch.setattr(bc, "load", fake_load)
    top = bench.prior_slowest(2)
    assert seen == ["BENCH_r10.json"]  # numerically latest, not r2
    assert top == ["a", "c"]


def test_prior_slowest_empty_when_no_records(monkeypatch):
    import bench

    monkeypatch.setattr(bench.os, "listdir", lambda _: ["notes.txt"])
    assert bench.prior_slowest() == []
