"""Central query registry: merges every operator module's QUERIES/ORACLES.

``queries()`` / ``oracle_sql()`` in ``__spark_entry__.py`` delegate here.
Invariant (driver contract): every oracle key exists in queries; column
names match exactly between the Spark DataFrame and the oracle SQL; floats
are rounded identically on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pb_etl_spark.sources import pyds
from pb_etl_spark.operators import (
    advanced,
    affinity,
    bucketing,
    insights,
    cdc,
    clustering,
    composite,
    composite_ext,
    corpus,
    dedup,
    events,
    governance,
    layout,
    multimodal,
    relational,
    reshape,
    retrieval,
    scalar_funcs,
    selection,
    semdedup,
    similarity,
    skew,
    temporal,
    text,
    timeseries,
    tokenize,
    vectors,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

# Order matters: the driver's correctness harness verifies the FIRST ~50
# registry entries (registry insertion order) each round. Cumulative
# r01-r09: every registered name checked at least once, zero
# latest-status hash-fails (CORRECTNESS_r09 = 50/50 green, no `err`
# rows). The round-10 window:
#   1. slots 0-8: the nine ``grouped_running_sum`` consumers — the
#      primitive's plan CHANGED this round (loud raise_error guard on
#      offset/total map misses, ADVICE r09), so every consumer's green
#      must be re-pinned on the guarded plan; gini_by_group also moved
#      its Σ pos·cents onto exact decimal(38,0) with a 2^53 guard.
#   2. slots 9-15: the seven ``global_positions`` /
#      ``global_running_sum`` consumers NOT already in this window —
#      the same map-miss guard was extended to both global primitives
#      late in round 10 (the ADVICE fix originally covered only the
#      grouped one), so their plans changed too. The other two global
#      consumers (curriculum_buckets, deterministic_shuffle) already
#      sit in the r03-stale block below.
#   3. slots 16-19: the round-10 additions — exact two-sample KS +
#      Mann-Whitney drift tests, exact-K priority sampling
#      (Duffield-Lund-Thorup, global and per-source) with
#      Horvitz-Thompson weights, and the pairwise source KS drift
#      matrix.
#   4. slots 20-49: 30 of the 33 queries migrated onto the exact
#      integer-grid money layer (operators/money.py) — the r10 ×10
#      value sweep caught ROUND(SUM(double_product), 2) drifting one
#      cent vs DuckDB (q1/q5/q7/q9), so every money aggregate now sums
#      exact integers; all 33 re-verified green at sf0.01 AND sf1.0
#      locally, but the driver should re-pin them. The 5 overflow to
#      r11 (cube_agg, grouping_sets, pipe_syntax_agg,
#      session_variable_agg, stratified_hash_sample) are the same
#      emission layer as in-window sql_udf_pricing / scalar_subquery /
#      global_aggregates.
# Deliberately NOT staged, ever (r08 verdict item 3): approx_distinct,
# approx_percentiles, hll_mergeable_counts, stratified_sample — the 4
# oracle-less sketch/RNG names whose driver check can only report
# `err: no_oracle`; their hash-checked deterministic twins
# (kmv_distinct_sketch / bitmap_distinct_counts, ddsketch_quantiles,
# stratified_hash_sample) carry the correctness evidence instead.
# r11 head: (a) the 5 money-layer overflow names (cube_agg,
# grouping_sets, pipe_syntax_agg, session_variable_agg,
# stratified_hash_sample); (b) the r02-stale trio displaced by
# the money block (tpch_q4_priority, tpch_q21_waiting_supplier,
# tumbling_window); (c) the r03-stale set displaced or never staged
# (ab_test_zscore, ann_ivf_topk, ann_lsh_topk, ann_pq_topk,
# attribution_first_touch, bloom_doc_filter, bpe_encode_counts,
# bpe_train_merges, chi2_independence, cms_token_counts,
# constraint_check, conversion_latency, cusum_changepoint,
# dataset_card, dsir_weights, event_streaks, event_transition_matrix,
# funnel_conversion, gap_fill_resample, histogram_quantiles,
# incremental_agg_maintenance, interval_overlap_join,
# lang_id_confusion, mad_outlier_stats, media_feature_summary,
# mixture_resample, multi_resolution_rollup, ohlc_hourly, psi_drift,
# rolling_active_users, scd2_merge_orders, sequence_anomaly,
# source_mix_report, stream_doc_source_counts, stream_ohlc_hourly,
# strict_funnel, substring_dup_spans, table_checksum, table_profile,
# time_interpolate, tpch_q12_priority_lines, twap_user_value,
# variant_extract_agg, vector_quantize, winsorized_stats), then the
# r04 set. (curriculum_buckets and deterministic_shuffle were checked
# in this window; they drop out of the stale list.)
_PRIORITY = [
    # -- slots 0-8: changed code (grouped_running_sum map-miss guard;
    #    gini_by_group also: decimal pos_cents + 2^53 raise_error) --
    "exact_stratified_split",
    "gini_by_group",
    "grouped_quantiles_exact",
    "grouped_running_revenue",
    "quantile_normalize",
    "seq_packing",
    "top_p_quality_sample",
    "weighted_median_by_group",
    "window_ranking",
    # -- slots 9-15: changed code (global_positions / global_running_sum
    #    map-miss guard, extended late in round 10; curriculum_buckets
    #    and deterministic_shuffle are covered in the r03 block below) --
    "abc_classification",
    "gini_concentration",
    "pps_systematic_sample",
    "rfm_segments",
    "segment_migration",
    "shard_manifest",
    "sprt_decision",
    # -- slots 16-19: round-10 additions --
    "ks_mann_whitney",
    "priority_sample_per_source",
    "priority_sample_topk",
    "source_drift_matrix",
    # -- slots 20-21: changed-code global consumers kept from the r03
    #    block (the map-miss guard re-pin) --
    "curriculum_buckets",
    "deterministic_shuffle",
    # -- slots 22-49: 28 of the 33 exact-money-layer migrations; the 5
    #    overflow to r11 (cube_agg, grouping_sets, pipe_syntax_agg,
    #    session_variable_agg, stratified_hash_sample) share their
    #    emission layer with in-window representatives --
    "tpch_q1_pricing",
    "tpch_q3_shipping",
    "tpch_q5_region_volume",
    "tpch_q6_revenue",
    "tpch_q7_nation_volume",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q10_returns",
    "tpch_q11_important_parts",
    "tpch_q14_promo",
    "tpch_q15_top_supplier",
    "tpch_q17_small_qty",
    "tpch_q19_disjunctive",
    "tpch_q22_idle_balances",
    "filter_pushdown",
    "star_join_revenue",
    "global_aggregates",
    "backtest_rates",
    "groupby_agg",
    "conditional_agg",
    "having_groups",
    "window_running_sum",
    "monthly_growth",
    "window_range_frame",
    "bucketed_join",
    "skew_salted_join",
    "scalar_subquery",
    "sql_udf_pricing",
]

_MODULES = [
    affinity,
    governance,
    insights,
    bucketing,
    layout,
    cdc,
    pyds,
    composite,
    composite_ext,
    corpus,
    retrieval,
    selection,
    semdedup,
    dedup,
    clustering,
    temporal,
    timeseries,
    skew,
    multimodal,
    similarity,
    vectors,
    scalar_funcs,
    advanced,
    tokenize,
    text,
    relational,
    reshape,
    events,
]


def all_queries() -> dict[str, QueryFn]:
    merged: dict[str, QueryFn] = {}
    for m in _MODULES:
        overlap = set(merged) & set(m.QUERIES)
        if overlap:
            raise ValueError(f"duplicate query names: {overlap}")
        merged.update(m.QUERIES)
    missing = [q for q in _PRIORITY if q not in merged]
    if missing:
        raise ValueError(f"priority entries not registered: {missing}")
    out: dict[str, QueryFn] = {q: merged[q] for q in _PRIORITY}
    out.update(merged)  # dict preserves first-insertion order for dupes
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    qnames = set(all_queries())
    stray = set(out) - qnames
    if stray:
        raise ValueError(f"oracles without queries: {stray}")
    return out
