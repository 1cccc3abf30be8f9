"""Tests for the declarative data-quality surface: single-scan rule
compilation, NULL semantics, and the FK orphan anti-join."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_rules_run_in_one_scan_and_count_violations(spark):
    from pb_etl_spark.quality import Rule, check_rules

    df = spark.createDataFrame(
        [(1, 10.0, "F"), (2, -5.0, "O"), (3, 0.0, "X"), (4, None, "F")],
        "id long, price double, status string",
    )
    out = {
        r.rule: r
        for r in check_rules(
            df,
            [
                Rule("positive_price", F.col("price") > 0),
                Rule("known_status", F.col("status").isin("F", "O")),
            ],
        ).collect()
    }
    # NULL predicate = violation (CHECK semantics would pass NULLs; data
    # QUALITY semantics must flag them — coalesce(False) in check_rules)
    assert out["positive_price"].n_violations == 3  # -5, 0, NULL
    assert out["known_status"].n_violations == 1  # X
    assert all(r.n_rows == 4 for r in out.values())
    # single scan: exactly one aggregate over the source, no join/union
    plan = check_rules(
        df, [Rule("a", F.col("price") > 0), Rule("b", F.col("id") > 0)]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan
    assert "Join" not in plan


def test_fk_orphans_found_and_nulls_exempt(spark):
    from pb_etl_spark.quality import check_foreign_key

    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 99), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(10,), (20,)], "pk long")
    out = {r.orphan_key: r.n_rows for r in
           check_foreign_key(child, "fk", parent, "pk").collect()}
    assert out == {99: 1}  # NULL fk exempt, valid fks pass


def test_orders_constraints_all_pass_on_fixture(spark):
    from pb_etl_spark.operators.advanced import q_constraint_check

    rows = q_constraint_check(spark, SF_DIR).collect()
    assert len(rows) == 4
    assert all(r.n_violations == 0 for r in rows)
    assert all(r.n_rows > 0 for r in rows)


def test_orders_customer_fk_holds_on_fixture(spark):
    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.quality import check_foreign_key

    orphans = check_foreign_key(
        read_table(spark, SF_DIR, "orders"),
        "o_custkey",
        read_table(spark, SF_DIR, "customer"),
        "c_custkey",
    )
    assert orphans.count() == 0
