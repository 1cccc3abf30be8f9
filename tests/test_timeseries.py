"""Invariant tests for the event-analytics family (operators/timeseries.py).

The oracle-parity suite already hash-checks every query against DuckDB;
these tests assert the SEMANTIC invariants that a hash can't express —
conservation laws (revenue fully attributed, transitions counted once),
order relations (low ≤ open/close ≤ high), and probability normalization.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def events(spark):
    from pb_etl_spark.catalog import read_table

    return read_table(spark, SF_DIR, "events").cache()


def test_transition_matrix_probabilities_normalize(spark, events):
    from pb_etl_spark.operators.timeseries import q_event_transition_matrix

    out = q_event_transition_matrix(spark, SF_DIR).toPandas()
    sums = out.groupby("src")["prob"].sum()
    assert ((sums - 1.0).abs() < 1e-5).all(), sums
    # every event except each user's last contributes exactly one transition
    n_events = events.count()
    n_users = events.select("user_id").distinct().count()
    assert out["n_transitions"].sum() == n_events - n_users


def test_rolling_active_users_bounds(spark, events):
    from pb_etl_spark.operators.timeseries import q_rolling_active_users

    out = q_rolling_active_users(spark, SF_DIR).toPandas()
    assert (out["active_7d"] >= out["active_1d"]).all()
    n_days = events.select(F.date_trunc("day", "ts")).distinct().count()
    assert len(out) == n_days
    n_users = events.select("user_id").distinct().count()
    assert out["active_7d"].max() <= n_users
    # a trailing window can only grow a single day's count
    daily = out.set_index("day")["active_1d"]
    assert (out.set_index("day")["active_7d"] >= daily).all()


def test_ohlc_order_relations_and_conservation(spark, events):
    from pb_etl_spark.operators.timeseries import q_ohlc_hourly

    out = q_ohlc_hourly(spark, SF_DIR).toPandas()
    assert (out["low"] <= out["open"]).all()
    assert (out["low"] <= out["close"]).all()
    assert (out["open"] <= out["high"]).all()
    assert (out["close"] <= out["high"]).all()
    assert out["n_events"].sum() == events.count()
    total_cents = (
        events.select(F.sum(F.round(F.col("value") * 100).cast("long"))).first()[0]
    )
    assert abs(out["volume"].sum() * 100 - total_cents) < 1


def test_attribution_conserves_revenue_and_users(spark, events):
    from pb_etl_spark.operators.timeseries import q_attribution_first_touch

    out = q_attribution_first_touch(spark, SF_DIR).toPandas()
    n_users = events.select("user_id").distinct().count()
    assert out["n_users"].sum() == n_users
    total_purchase_cents = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.sum(F.round(F.col("value") * 100).cast("long")))
        .first()[0]
    )
    assert abs(out["attributed_revenue"].sum() * 100 - total_purchase_cents) < 1


def test_twap_within_value_envelope(spark, events):
    from pb_etl_spark.operators.timeseries import q_twap_user_value

    out = q_twap_user_value(spark, SF_DIR).toPandas()
    env = (
        events.groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .toPandas()
        .set_index("user_id")
    )
    merged = out.set_index("user_id").join(env)
    # TWAP is a convex combination of the user's values (the last event
    # carries no weight, so use the global envelope: still a bound)
    assert (merged["twap_value"] >= merged["lo"] - 1e-9).all()
    assert (merged["twap_value"] <= merged["hi"] + 1e-9).all()


def test_cusum_nonnegative_and_zero_for_constant_series(spark):
    from pb_etl_spark.operators.timeseries import q_cusum_changepoint

    out = q_cusum_changepoint(spark, SF_DIR).toPandas()
    assert (out["max_cusum"] >= 0).all()
    # constant series ⇒ prefix_k == (k/N)·S exactly ⇒ CUSUM ≡ 0: build a
    # tiny synthetic frame through the same arithmetic
    from pyspark.sql import Row

    import pb_etl_spark.operators.timeseries as ts

    rows = [
        Row(event_id=i, user_id=1, ts=f"2024-01-01 00:00:{i:02d}", value=7.25)
        for i in range(10)
    ]
    df = spark.createDataFrame(rows).withColumn("ts", F.to_timestamp("ts"))
    orig = ts.read_table
    ts.read_table = lambda *_: df
    try:
        const = ts.q_cusum_changepoint(spark, SF_DIR).toPandas()
    finally:
        ts.read_table = orig
    assert (const["max_cusum"] == 0).all()


def test_scd2_merge_row_accounting(spark):
    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.cdc import q_scd2_merge_orders

    orders = read_table(spark, SF_DIR, "orders")
    n = orders.count()
    n_mod7 = orders.filter(F.col("o_orderkey") % 7 == 0).count()
    n_mod50 = orders.filter(F.col("o_orderkey") % 50 == 0).count()
    out = q_scd2_merge_orders(spark, SF_DIR)
    # untouched + (closed + reopened per mod-7 key) + inserts
    assert out.count() == n + n_mod7 + n_mod50
    cur = out.filter(F.col("is_current") == 1).count()
    assert cur == n + n_mod50  # exactly one current row per live key


def test_time_bounded_funnel_monotone_and_tighter_than_unbounded(spark):
    from pb_etl_spark.operators.events import q_time_bounded_funnel

    rows = {r.step: r for r in q_time_bounded_funnel(spark, SF_DIR).collect()}
    assert set(rows) == {"1_view", "2_click", "3_purchase"}
    c1, c2, c3 = (rows[s].users for s in ("1_view", "2_click", "3_purchase"))
    assert c1 >= c2 >= c3 >= 0 and c1 > 0
    assert rows["2_click"].conv_overall == rows["2_click"].conv_from_prev
    assert abs(rows["3_purchase"].conv_overall - round(c3 / c1, 6)) < 1e-9


def test_capped_running_balance_matches_brute_force(spark):
    """The closed-form window scan (bal = S - min(0, cummin S); hits =
    strict new below-zero running minima) must equal a row-by-row
    replay in plain pandas — and the clamp must actually fire on the
    fixture (else the operator degenerates to a cumsum and tests
    nothing)."""
    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.events import (
        WALLET_SIGNUP_BONUS_CENTS,
        q_capped_running_balance,
    )

    got = {
        r.user_id: r for r in q_capped_running_balance(spark, SF_DIR).collect()
    }
    ev = (
        read_table(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "event_type", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    total_hits = 0
    for uid, g in ev.groupby("user_id"):
        bal, hits = 0, 0
        for r in g.itertuples():
            if r.event_type == "signup":
                d = WALLET_SIGNUP_BONUS_CENTS
            elif r.event_type in ("view", "click"):
                d = int(round(r.value * 100))
            elif r.event_type == "purchase":
                d = -int(round(r.value * 100))
            else:
                d = 0
            raw = bal + d
            if raw < 0:
                hits += 1
                bal = 0
            else:
                bal = raw
        row = got[uid]
        assert (row.final_balance_cents, row.n_floor_hits, row.n_events) == (
            bal,
            hits,
            len(g),
        ), uid
        total_hits += hits
    assert total_hits > 0  # the clamp fired somewhere on the fixture


def test_ucb_scores_order_and_accounting(spark):
    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.timeseries import q_ucb_bandit_scores

    rows = q_ucb_bandit_scores(spark, SF_DIR).collect()
    n_users = read_table(spark, SF_DIR, "events").select("user_id").distinct().count()
    assert sum(r.n_trials for r in rows) == n_users
    for r in rows:
        assert 0 <= r.n_conversions <= r.n_trials
        assert r.ucb1 > r.mean_rate  # the exploration bonus is positive
        assert 0 < r.posterior_mean < 1


def test_kaplan_meier_curve_is_valid_survival_function(spark):
    from pb_etl_spark.operators.timeseries import q_kaplan_meier

    rows = sorted(q_kaplan_meier(spark, SF_DIR).collect(), key=lambda r: r.t)
    assert rows
    prev_s, prev_risk = 1.0 + 1e-9, None
    for r in rows:
        assert 0.0 <= r.survival <= 1.0
        assert r.survival <= prev_s + 1e-9  # non-increasing
        assert r.d > 0
        if prev_risk is not None:
            assert r.at_risk < prev_risk  # strictly shrinking risk set
        prev_s, prev_risk = r.survival, r.at_risk
    # censoring must actually occur on the fixture (else the estimator
    # degenerates to an empirical CDF and the test proves less)
    assert sum(r.censored for r in rows) > 0 or rows[-1].at_risk > rows[-1].d


def test_holt_forecast_structure_and_linearity(spark):
    """Holt output contract: one row per observed day (h=0) with level/
    trend defined, 7 forecast rows with linearly extrapolated values
    (differences equal the final trend), and the one-step fit equals
    the previous state's level+trend."""
    from pb_etl_spark.operators.timeseries import HOLT_H, q_holt_forecast

    rows = sorted(q_holt_forecast(spark, SF_DIR).collect(), key=lambda r: (r.h, r.day))
    obs = [r for r in rows if r.h == 0]
    fc = sorted((r for r in rows if r.h > 0), key=lambda r: r.h)
    assert len(fc) == HOLT_H
    assert len(obs) > 10
    obs.sort(key=lambda r: r.day)
    for prev, cur in zip(obs, obs[1:]):
        assert cur.fitted is not None
        assert abs(cur.fitted - (prev.level + prev.trend)) < 2e-6
    last = obs[-1]
    for a, b in zip(fc, fc[1:]):
        assert abs((b.fitted - a.fitted) - last.trend) < 2e-6
