"""Semantic invariants for the round-5 insights operators — checks the
oracle CANNOT express (both engines could share a bug): structural
properties proven directly against the raw fixture tables."""

from __future__ import annotations

import pandas as pd

from tests.conftest import SF_DIR

from pb_etl_spark.catalog import read_table
from pb_etl_spark.operators.insights import (
    BFS_SEED_MOD,
    LP_NODES,
    OOV_VOCAB_K,
    q_abc_classification,
    q_bfs_hops_knn,
    q_burstiness_stats,
    q_interval_coverage,
    q_label_propagation_knn,
    q_lateral_topk_join,
    q_map_funcs,
    q_mode_per_group,
    q_oov_rate,
    q_theil_sen_trend,
)


def test_lateral_topk_is_per_customer_top2(spark):
    out = q_lateral_topk_join(spark, SF_DIR).toPandas()
    per_cust = out.groupby("c_custkey").size()
    assert per_cust.max() <= 2
    # the per-customer max emitted equals that customer's true max order
    orders = read_table(spark, SF_DIR, "orders").toPandas()
    orders["cents"] = (orders["o_totalprice"] * 100).round().astype("int64")
    true_max = orders.groupby("o_custkey")["cents"].max()
    got_max = out.groupby("c_custkey")["total_cents"].max()
    joined = pd.concat([true_max, got_max], axis=1, join="inner")
    assert (joined.iloc[:, 0] == joined.iloc[:, 1]).all()
    # every customer WITH orders appears (inner lateral drops orderless)
    assert set(got_max.index) == set(true_max.index)


def test_map_funcs_all_row_is_user_total(spark):
    out = q_map_funcs(spark, SF_DIR).toPandas()
    ev = read_table(spark, SF_DIR, "events").toPandas()
    totals = ev.groupby("user_id").size()
    alls = out[out.event_type == "__all"].set_index("user_id")["n_scaled"]
    assert len(alls) == len(totals)
    assert (alls.sort_index() == totals.sort_index()).all()
    # non-__all entries are 10× a count that passed the >=5 filter
    rest = out[out.event_type != "__all"]
    assert (rest.n_scaled % 10 == 0).all()
    assert (rest.n_scaled // 10 >= 5).all()


def test_mode_is_a_maximal_count(spark):
    out = q_mode_per_group(spark, SF_DIR).toPandas()
    ev = read_table(spark, SF_DIR, "events").toPandas()
    counts = ev.groupby(["user_id", "event_type"]).size().rename("n")
    for row in out.itertuples():
        user = counts.loc[row.user_id]
        assert user[row.mode_event_type] == user.max()
        # deterministic tie-break: smallest among the argmaxes
        assert row.mode_event_type == min(user[user == user.max()].index)


def test_interval_coverage_bounds(spark):
    out = q_interval_coverage(spark, SF_DIR).toPandas()
    ev = read_table(spark, SF_DIR, "events").toPandas()
    n = ev.groupby("user_id").size()
    m = out.set_index("user_id").sort_index()
    assert (m["n_islands"] >= 1).all()
    assert (m["n_islands"] <= n.sort_index()).all()
    assert (m["longest_island_us"] <= m["covered_us"]).all()
    # covered time can't exceed sum of individual durations
    ev["dur_us"] = (ev["value"] * 100).round().astype("int64") * 1_000_000
    total_dur = ev.groupby("user_id")["dur_us"].sum().sort_index()
    assert (m["covered_us"] <= total_dur).all()


def test_burstiness_in_range(spark):
    out = q_burstiness_stats(spark, SF_DIR).toPandas()
    assert (out["cv"] >= 0).all()
    # burstiness = (σ−μ)/(σ+μ): exactly −1 for perfectly periodic gaps
    # (σ=0) — a legal value a future fixture may produce; the all-zero-
    # gap 0/0 class is filtered by the operator itself (s > 0)
    assert (out["burstiness"] >= -1).all()
    assert (out["burstiness"] < 1).all()
    assert (out["mean_gap_s"] > 0).all()
    assert out["cv"].notna().all() and out["burstiness"].notna().all()


def test_label_propagation_labels_are_node_ids(spark):
    out = q_label_propagation_knn(spark, SF_DIR).toPandas()
    nodes = set(out["node"])
    assert len(out) == len(nodes) <= LP_NODES
    assert set(out["label"]).issubset(nodes)
    # communities are non-trivial on the threshold graph: fewer labels
    # than nodes (at least one adoption happened)
    assert out["label"].nunique() < len(out)


def test_bfs_seeds_zero_and_neighbors_bounded(spark):
    out = q_bfs_hops_knn(spark, SF_DIR).toPandas().set_index("node")["hops"]
    seeds = [n for n in out.index if n % BFS_SEED_MOD == 0]
    assert seeds and (out.loc[seeds] == 0).all()
    assert ((out == -1) | (out >= 0)).all()
    reached = out[out >= 0]
    assert (reached <= 6).all()  # BFS_ROUNDS bound


def test_theil_sen_pair_counts(spark):
    out = q_theil_sen_trend(spark, SF_DIR).toPandas()
    ev = read_table(spark, SF_DIR, "events").toPandas()
    days = ev.groupby(["event_type", ev["ts"].dt.date]).size()
    for row in out.itertuples():
        d = len(days.loc[row.event_type])
        assert row.n_pairs == d * (d - 1) // 2


def test_oov_rate_range_and_vocab_size(spark):
    out = q_oov_rate(spark, SF_DIR).toPandas()
    assert (out["oov_rate"] >= 0).all() and (out["oov_rate"] < 1).all()
    assert (out["n_oov"] <= out["n_tokens"]).all()
    # fixture has ~31 distinct tokens > OOV_VOCAB_K, so some OOV exists
    assert out["n_oov"].sum() > 0 and OOV_VOCAB_K < 31


def test_abc_partitions_parts_and_shares_sum_to_one(spark):
    out = q_abc_classification(spark, SF_DIR).toPandas()
    li = read_table(spark, SF_DIR, "lineitem").toPandas()
    assert out["n_parts"].sum() == li["l_partkey"].nunique()
    assert abs(out["revenue_share"].sum() - 1.0) < 1e-5
    byc = out.set_index("abc_class")
    assert set(byc.index) == {"A", "B", "C"}
    # A-parts carry more revenue per part than C-parts (Pareto shape)
    a_pp = byc.loc["A", "revenue_cc"] / byc.loc["A", "n_parts"]
    c_pp = byc.loc["C", "revenue_cc"] / byc.loc["C", "n_parts"]
    assert a_pp > c_pp
