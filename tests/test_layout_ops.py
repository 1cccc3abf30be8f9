"""Physical assertions for the storage-layout operators (layout.py):
the pruning/skipping behavior itself, which the value-level oracle
cannot see. (The z-order WRITER's rectangle property is asserted in
tests/test_layout.py against sources/parquet.py::write_parquet_zorder;
here we cover the partition-pruned read path and the zvalue math.)"""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from pb_etl_spark.operators.layout import partitioned_events_path, zvalue
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


def test_orc_scan_pushes_filters_and_prunes_columns(spark):
    """The ORC connector must behave like parquet at scale: the selective
    predicate reaches the scan as a PushedFilter and ReadSchema lists
    only the referenced columns — not all six of orders'."""
    from pb_etl_spark.operators.layout import orc_orders_path

    path = orc_orders_path(spark, SF_DIR)
    df = (
        spark.read.orc(path)
        .filter(F.col("o_totalprice") > 50000)
        .select("o_orderstatus", "o_totalprice")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters")[1][:200]
    assert "o_totalprice" in pushed
    schema = plan.split("ReadSchema")[1][:200]
    assert "o_orderstatus" in schema and "o_custkey" not in schema
