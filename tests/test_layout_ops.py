"""Physical assertions for the storage-layout operators (layout.py):
the pruning/skipping behavior itself, which the value-level oracle
cannot see."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from pb_etl_spark.operators.layout import (
    partitioned_events_path,
    write_zordered,
    zvalue,
)
from tests.conftest import SF_DIR


def test_partition_filter_prunes_directories(spark, tmp_path):
    path = partitioned_events_path(spark, SF_DIR)
    df = spark.read.parquet(path).filter(
        F.col("event_date") == F.lit("2024-01-02").cast("date")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the scan's file index must be pruned to the one matching partition
    n_days = len(glob.glob(f"{path}/event_date=*"))
    assert n_days > 1, "fixture spans multiple days"
    assert "event_date=2024-01-02" in plan or "1 paths" in plan


def test_zorder_files_are_rectangles_on_both_dims(spark, tmp_path):
    """After z-order relayout, each file's (partkey, suppkey) min/max
    rectangle must be a small fraction of the full domain on BOTH
    columns — single-column sort gives this on one dim only."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_partkey", "l_suppkey"
    )
    out = str(tmp_path / "zorder")
    write_zordered(spark, li, out, "l_partkey", "l_suppkey", n_files=16)

    lo_p, hi_p, lo_s, hi_s = li.agg(
        F.min("l_partkey"), F.max("l_partkey"), F.min("l_suppkey"), F.max("l_suppkey")
    ).first()
    dom_p, dom_s = hi_p - lo_p, hi_s - lo_s

    files = glob.glob(f"{out}/*.parquet")
    assert len(files) >= 8
    frac_p, frac_s = [], []
    for f in files:
        md = pq.ParquetFile(f).metadata
        cols = {md.schema.column(i).name: i for i in range(len(md.schema))}
        rg = md.row_group(0)
        stats_p = rg.column(cols["l_partkey"]).statistics
        stats_s = rg.column(cols["l_suppkey"]).statistics
        frac_p.append((stats_p.max - stats_p.min) / dom_p)
        frac_s.append((stats_s.max - stats_s.min) / dom_s)
    # every file covers a bounded window on each dim; on average much
    # smaller than the full domain (Z_BITS=16 covers the fixture's key
    # ranges, so the tiling is genuine)
    # (a file that straddles a z-curve quadrant boundary can span a full
    # dim — inherent to the curve — so assert on the average, not the max)
    avg_p = sum(frac_p) / len(frac_p)
    avg_s = sum(frac_s) / len(frac_s)
    assert avg_p < 0.6, frac_p
    assert avg_s < 0.6, frac_s


def test_zvalue_orders_locally(spark):
    """Adjacent z-values differ only in low bits for nearby points: the
    interleave is monotone in each coordinate when the other is fixed."""
    rows = (
        spark.range(0, 8)
        .selectExpr("id AS a", "CAST(3 AS LONG) AS b")
        .withColumn("z", zvalue(F.col("a"), F.col("b")))
        .orderBy("a")
        .collect()
    )
    zs = [r["z"] for r in rows]
    assert zs == sorted(zs)
