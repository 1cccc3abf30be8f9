"""Semantic invariants for the CDC/temporal additions, checked against
independent formulations (not the oracle SQL, which shares the
operator's own shape)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_snapshot_diff_patch_invariant(spark):
    """Applying the change feed to the old snapshot must reconstruct the
    new snapshot exactly: old − (deletes ∪ updates) ∪ new-side of
    (updates ∪ inserts) == new. This is the property a downstream
    incremental consumer relies on."""
    from pb_etl_spark.operators.cdc import snapshot_diff

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    snap_a = orders.filter(F.col("o_orderkey") % 7 != 0)
    snap_b = orders.filter(F.col("o_orderkey") % 9 != 0).withColumn(
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 4 == 0, F.lit("X")).otherwise(
            F.col("o_orderstatus")
        ),
    )
    feed = snapshot_diff(
        snap_a, snap_b, "o_orderkey", ["o_totalprice", "o_orderstatus"]
    ).cache()

    touched = feed.filter(F.col("change_type").isin("delete", "update")).select(
        "o_orderkey"
    )
    patched = (
        snap_a.join(touched, "o_orderkey", "left_anti")
        .unionByName(
            feed.filter(F.col("change_type").isin("update", "insert")).select(
                "o_orderkey",
                F.col("new_o_totalprice").alias("o_totalprice"),
                F.col("new_o_orderstatus").alias("o_orderstatus"),
            )
        )
    )
    assert patched.exceptAll(snap_b).count() == 0
    assert snap_b.exceptAll(patched).count() == 0


def test_pit_join_matches_bruteforce_interval_join(spark):
    """The union+carry PIT join must equal the naive interval
    formulation (per click: the max-valid_from version with
    valid_from <= ts) on a user slice."""
    from pb_etl_spark.registry import all_queries
    from pyspark.sql.window import Window as W

    out = (
        all_queries()["pit_join"](spark, SF_DIR)
        .filter(F.col("user_id") < 20)
        .cache()
    )
    from pb_etl_spark.catalog import read_table

    ev = read_table(spark, SF_DIR, "events")
    purchases = ev.filter(
        (F.col("event_type") == "purchase") & (F.col("user_id") < 20)
    )
    w_v = W.partitionBy("user_id").orderBy("ts", "event_id")
    versions = purchases.withColumn("version_no", F.row_number().over(w_v)).select(
        "user_id", F.col("ts").alias("vts"), "version_no"
    )
    clicks = ev.filter((F.col("event_type") == "click") & (F.col("user_id") < 20))
    brute = (
        clicks.join(versions, "user_id", "left")
        .filter(F.col("vts") <= F.col("ts"))
        .groupBy("event_id")
        .agg(F.max("version_no").cast("long").alias("version_no"))
    )
    got = {r.event_id: r.version_no for r in out.collect()}
    want = {r.event_id: r.version_no for r in brute.collect()}
    # brute omits clicks with no prior purchase; those must be NULL in out
    for eid, ver in got.items():
        assert want.get(eid) == ver, (eid, ver, want.get(eid))
    assert len(got) >= len(want)


def test_ewma_matches_python_replay(spark):
    """Replay the truncated decayed mean in plain Python per user and
    compare every row: weights (1-a)^j over the last 20 events,
    normalized by the weights present."""
    from tests.conftest import SF_DIR

    from pb_etl_spark.operators.temporal import (
        EWMA_ALPHA,
        EWMA_LAGS,
        EWMA_USERS,
        q_ewma_user_value,
    )

    out = {
        r["event_id"]: (r["n_terms"], r["ewma_value"])
        for r in q_ewma_user_value(spark, SF_DIR).collect()
    }
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .filter(F.col("user_id") < EWMA_USERS)
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    by_user: dict[int, list] = {}
    for r in sorted(ev, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    n_checked = 0
    for rows in by_user.values():
        hist: list[float] = []
        for r in rows:
            hist.append(r["value"])
            tail = hist[-EWMA_LAGS:][::-1]  # most recent first
            num = sum(v * (1 - EWMA_ALPHA) ** j for j, v in enumerate(tail))
            den = sum((1 - EWMA_ALPHA) ** j for j in range(len(tail)))
            n_terms, got = out[r["event_id"]]
            assert n_terms == len(tail)
            assert got == pytest.approx(num / den, abs=1e-5)
            n_checked += 1
    assert n_checked == len(out) and n_checked > 0


def test_training_set_assembly_is_point_in_time_correct(spark):
    """Leakage check: replaying features/labels row-by-row in pandas
    must match, and every feature must be derivable from events
    strictly before the cutoff (none after)."""
    import pandas as pd

    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.temporal import (
        TSA_CONV_VALUE,
        TSA_CUTOFFS,
        TSA_LABEL_DAYS,
        q_training_set_assembly,
    )

    got = q_training_set_assembly(spark, SF_DIR).toPandas()
    ev = read_table(spark, SF_DIR, "events").toPandas()
    for cut_s in TSA_CUTOFFS:
        cut = pd.Timestamp(cut_s)
        pre = ev[ev.ts < cut]
        sub = got[got.cutoff == cut_s].set_index("user_id")
        assert set(sub.index) == set(pre.user_id.unique())
        for uid, g in pre.groupby("user_id"):
            row = sub.loc[uid]
            assert row.n_events == len(g)
            exp_cents = int(
                g[g.event_type == "purchase"].value.mul(100).round().sum()
            )
            assert row.purchase_cents == exp_cents
            last_day = g.ts.dt.normalize().max()
            assert row.days_since_last == (cut - last_day).days
            assert row.n_active_days == g.ts.dt.normalize().nunique()
            win = ev[
                (ev.user_id == uid)
                & (ev.ts >= cut)
                & (ev.ts < cut + pd.Timedelta(days=TSA_LABEL_DAYS))
                & (ev.event_type == "purchase")
                & (ev.value >= TSA_CONV_VALUE)
            ]
            assert row.label == (1 if len(win) else 0)
