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


def test_k_anonymity_report_matches_brute_force(spark):
    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.governance import K_ANON, q_k_anonymity_report

    row = q_k_anonymity_report(spark, SF_DIR).collect()[0]
    cust = read_table(spark, SF_DIR, "customer").toPandas()
    sizes = cust.groupby(["c_nationkey", "c_mktsegment"]).size()
    assert row.n_groups == len(sizes)
    assert row.k_achieved == int(sizes.min())
    assert row.n_violating_groups == int((sizes < K_ANON).sum())
    assert row.n_suppressed_rows == int(sizes[sizes < K_ANON].sum())


def test_dp_noise_is_bounded_and_nonzero(spark):
    """The seeded Laplace draw must perturb every count (u = 0.5 exactly
    has measure ~2^-52) and stay within the inverse-CDF's reachable
    range for 52-bit uniforms: |noise| <= ln(2^52)/eps ~ 36."""
    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.governance import DP_EPSILON, q_dp_noisy_counts
    from pyspark.sql import functions as F

    true = {
        r.event_type: r.n
        for r in read_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    rows = q_dp_noisy_counts(spark, SF_DIR).collect()
    assert {r.event_type for r in rows} == set(true)
    for r in rows:
        noise = r.noisy_count - true[r.event_type]
        assert noise != 0.0
        assert abs(noise) <= 37.0 / DP_EPSILON


def test_zipf_slope_is_negative_with_good_fit(spark):
    from pb_etl_spark.operators.text import q_zipf_slope

    row = q_zipf_slope(spark, SF_DIR).collect()[0]
    assert row.n_terms > 20
    assert row.slope < 0
    assert 0.0 < row.r2 <= 1.0


def test_quantile_normalize_equalizes_source_distributions(spark):
    """After normalization, equal-sized sources must have IDENTICAL
    sorted value vectors (they all map onto the same pooled grid), and
    the mapping must preserve within-source order."""
    from pb_etl_spark.operators.reshape import q_quantile_normalize

    df = q_quantile_normalize(spark, SF_DIR).toPandas()
    by_src = {
        s: g.sort_values(["n_chars", "doc_id"]) for s, g in df.groupby("source")
    }
    sizes = {s: len(g) for s, g in by_src.items()}
    vecs = {s: list(g.norm_chars) for s, g in by_src.items()}
    for s, g in by_src.items():
        assert list(g.norm_chars) == sorted(g.norm_chars)  # order-preserving
    same_size = {}
    for s, n in sizes.items():
        same_size.setdefault(n, []).append(s)
    for n, srcs in same_size.items():
        for a, b in zip(srcs, srcs[1:]):
            assert vecs[a] == vecs[b], (a, b)
