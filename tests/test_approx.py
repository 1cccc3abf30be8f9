"""Approximate sketches must land within tolerance of their exact
counterparts (they have no DuckDB oracle by design)."""

from __future__ import annotations

from pyspark.sql import functions as F

from pb_etl_spark.catalog import read_table
from tests.conftest import SF_DIR


def test_approx_count_distinct_tolerance(spark):
    from pb_etl_spark.operators.composite import q_approx_distinct

    approx = {r["l_returnflag"]: r for r in q_approx_distinct(spark, SF_DIR).collect()}
    exact = {
        r["l_returnflag"]: r
        for r in read_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("parts"),
            F.count_distinct("l_orderkey").alias("orders"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k]["approx_parts"] - exact[k]["parts"]) / exact[k]["parts"] < 0.1
        assert abs(approx[k]["approx_orders"] - exact[k]["orders"]) / exact[k]["orders"] < 0.1


def test_approx_percentile_tolerance(spark):
    from pb_etl_spark.operators.composite import q_approx_percentiles

    approx = {r["l_returnflag"]: r for r in q_approx_percentiles(spark, SF_DIR).collect()}
    exact = {
        r["l_returnflag"]: r
        for r in read_table(spark, SF_DIR, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.percentile("l_extendedprice", F.lit(0.5)).alias("p50"),
            F.percentile("l_extendedprice", F.lit(0.95)).alias("p95"),
        )
        .collect()
    }
    for k in exact:
        assert abs(approx[k]["price_p50_approx"] - exact[k]["p50"]) / exact[k]["p50"] < 0.05
        assert abs(approx[k]["price_p95_approx"] - exact[k]["p95"]) / exact[k]["p95"] < 0.05


def test_hll_sketches_merge_consistently(spark):
    """Partial per-nation sketches unioned must equal the whole-set
    estimate, and at fixture cardinalities (sparse mode) both must be
    EXACT — the rollup-table-of-sketches pattern."""
    from pyspark.sql import functions as F

    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.composite import q_hll_mergeable_counts
    from tests.conftest import SF_DIR

    rows = {r.nationkey: r.n_customers_est
            for r in q_hll_mergeable_counts(spark, SF_DIR).collect()}
    cust = read_table(spark, SF_DIR, "customer")
    exact = {
        r.c_nationkey: r.n
        for r in cust.groupBy("c_nationkey")
        .agg(F.count_distinct("c_custkey").alias("n"))
        .collect()
    }
    for nk, n in exact.items():
        assert rows[nk] == n, (nk, rows[nk], n)
    assert rows[-1] == cust.select("c_custkey").distinct().count()
