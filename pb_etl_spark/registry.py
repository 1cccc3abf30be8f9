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
# r01-r10: every registered name checked at least once, zero
# latest-status hash-fails (CORRECTNESS_r10 = 50/50 green, no `err`
# rows). The round-11 window, per the r10 verdict's staged plan plus
# this round's code changes:
#   1. slots 0-3: round-11 changed/new code — embedding_near_dup_lsh is
#      now the production-regime face (16 planes x 8 tables, cos >= 0.9
#      over the twin-planted corpus; the old 0.4-threshold variant is
#      the new sweep-tier name embedding_near_dup_lsh_lowt), and
#      stream_drift_monitor is the new streaming twin of the
#      ks_mann_whitney retrain gate.
#   2. slots 4-8: the 5 money-layer overflow names from r10 (cube_agg,
#      grouping_sets, pipe_syntax_agg, session_variable_agg,
#      stratified_hash_sample) — the only migrated-emission-layer
#      queries without a post-migration driver pin. pipe_syntax_agg and
#      stratified_hash_sample ALSO changed plans this round (the
#      exact_double 2^53 guard on their average paths).
#   3. slots 9-17: the other nine queries whose plans changed this
#      round when every exact-sum average/ratio emission was routed
#      through the guarded money.exact_double (r10 verdict item 3):
#      q1/q8/q14/q17/q22, global_aggregates, backtest_rates,
#      groupby_agg, scalar_subquery. All were r10-green; the guard CASE
#      changes their plans, so their green must be re-pinned.
#   4. slots 18-20: the r02-stale trio displaced by the money block
#      (tpch_q4_priority, tpch_q21_waiting_supplier, tumbling_window).
#   5. slots 21-49: the first 29 of the 45-name r03-stale set. The
#      remaining 16 carry to the r12 window head: rolling_active_users
#      (displaced by the capped_running_balance re-pin), scd2_merge_orders,
#      sequence_anomaly, source_mix_report, stream_doc_source_counts,
#      stream_ohlc_hourly, strict_funnel, substring_dup_spans,
#      table_checksum, table_profile, time_interpolate,
#      tpch_q12_priority_lines, twap_user_value, variant_extract_agg,
#      vector_quantize, winsorized_stats — then the r04 set.
# Deliberately NOT staged, ever (r08 verdict item 3): approx_distinct,
# approx_percentiles, hll_mergeable_counts, stratified_sample — the 4
# oracle-less sketch/RNG names whose driver check can only report
# `err: no_oracle`; their hash-checked deterministic twins
# (kmv_distinct_sketch / bitmap_distinct_counts, ddsketch_quantiles,
# stratified_hash_sample) carry the correctness evidence instead.
_PRIORITY = [
    # -- slots 0-3: round-11 changed/new code (capped_running_balance:
    #    the per-user Python-loop scan became the closed-form JVM window
    #    scan bal = S - min(0, cummin S), so its plan changed) --
    "embedding_near_dup_lsh",
    "embedding_near_dup_lsh_lowt",
    "stream_drift_monitor",
    "capped_running_balance",
    # -- slots 4-8: the r10 money-layer overflow names --
    "cube_agg",
    "grouping_sets",
    "pipe_syntax_agg",
    "session_variable_agg",
    "stratified_hash_sample",
    # -- slots 9-17: plans changed by the uniform exact_double guard --
    "tpch_q1_pricing",
    "tpch_q8_market_share",
    "tpch_q14_promo",
    "tpch_q17_small_qty",
    "tpch_q22_idle_balances",
    "global_aggregates",
    "backtest_rates",
    "groupby_agg",
    "scalar_subquery",
    # -- slots 18-20: the displaced r02 trio --
    "tpch_q4_priority",
    "tpch_q21_waiting_supplier",
    "tumbling_window",
    # -- slots 21-49: first 29 of the r03-stale set --
    "ab_test_zscore",
    "ann_ivf_topk",
    "ann_lsh_topk",
    "ann_pq_topk",
    "attribution_first_touch",
    "bloom_doc_filter",
    "bpe_encode_counts",
    "bpe_train_merges",
    "chi2_independence",
    "cms_token_counts",
    "constraint_check",
    "conversion_latency",
    "cusum_changepoint",
    "dataset_card",
    "dsir_weights",
    "event_streaks",
    "event_transition_matrix",
    "funnel_conversion",
    "gap_fill_resample",
    "histogram_quantiles",
    "incremental_agg_maintenance",
    "interval_overlap_join",
    "lang_id_confusion",
    "mad_outlier_stats",
    "media_feature_summary",
    "mixture_resample",
    "multi_resolution_rollup",
    "ohlc_hourly",
    "psi_drift",
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
