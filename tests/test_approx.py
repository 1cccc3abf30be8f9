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


def test_ddsketch_merge_and_relative_error(spark):
    """DDSketch invariants: (1) bucket counts are cell-wise additive —
    the sketch built from two disjoint halves and SUMMED must answer
    every quantile identically to the whole-set sketch; (2) each
    estimate is within the α relative-error guarantee of the exact
    quantile (valid because all fixture prices exceed the 64-cent
    min-indexable collapse)."""
    from pb_etl_spark.operators.retrieval import (
        DD_ALPHA,
        DD_QS,
        q_ddsketch_quantiles,
    )

    whole = {r["q"]: r for r in q_ddsketch_quantiles(spark, SF_DIR).collect()}
    assert set(whole) == set(DD_QS)

    # merge path: per-half histograms summed, then the same extraction
    li = read_table(spark, SF_DIR, "lineitem")
    halves = [
        li.filter(F.col("l_orderkey") % 2 == i).select("l_extendedprice")
        for i in (0, 1)
    ]
    import pandas as pd

    from pb_etl_spark.operators.retrieval import _dd_bounds

    bounds = _dd_bounds()

    def hist_of(df):
        import bisect

        cents = [
            int(round(v * 100))
            for v in df.toPandas()["l_extendedprice"].tolist()
        ]
        h: dict[int, int] = {}
        for c in cents:
            b = bisect.bisect_left(bounds, c)
            h[b] = h.get(b, 0) + 1
        return h

    h0, h1 = hist_of(halves[0]), hist_of(halves[1])
    merged: dict[int, int] = {}
    for h in (h0, h1):
        for b, c in h.items():
            merged[b] = merged.get(b, 0) + c
    n = sum(merged.values())
    import math

    from pb_etl_spark.operators.retrieval import _dd_ests

    ests = _dd_ests(bounds)
    for q in DD_QS:
        target = math.ceil(q * n)
        cum = 0
        for b in sorted(merged):
            cum += merged[b]
            if cum >= target:
                est = round(ests[b] / 100.0, 2)
                assert est == whole[q]["est_price"], (q, est, whole[q])
                break

    # relative-error guarantee vs the exact quantile
    for q in DD_QS:
        exact = li.agg(
            F.percentile("l_extendedprice", F.lit(float(q)))
        ).collect()[0][0]
        assert abs(whole[q]["est_price"] - exact) <= 2 * DD_ALPHA * exact + 0.01
