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
# registry entries (registry insertion order) each round. Rounds 1-3
# verified 139 unique queries, all green latest-status. The round-4
# window (slots 0-49) is 100% never-driver-checked names, per the r03
# verdict directive:
#   1. slots 0-5: the six Spark-4 surfaces (SQL UDF, UDTF+LATERAL,
#      recursive CTE, collation, pipe syntax, session variables) — the
#      registry's most environment-sensitive entries, twice missed,
#   2. slots 6-16: the 11 remaining TPC-H shapes (decorrelated-subquery
#      battery, composite_ext.py),
#   3. dedup/graph novelties, temporal, retrieval, corpus-sampling,
#   4. the rest of the never-checked reporting/monitoring rollups,
#      including the two whose code changes this round
#      (seasonal_anomalies ordering fix; entity_golden_record rides the
#      reworked entity-resolution clustering).
# Slot 50 is entity_resolution itself (already r03-green, but its
# clustering gains the size-thresholded union-find/CC hybrid this round
# — kept adjacent to the window in case the driver checks >50).
_PRIORITY = [
    # -- Spark-4 surfaces: slots 0-5 (r03 verdict directive #1) --
    "recursive_hierarchy",
    "collated_group",
    "pipe_syntax_agg",
    "sql_udf_pricing",
    "udtf_chunking",
    "session_variable_agg",
    # -- the 11 remaining TPC-H shapes --
    "tpch_q2_min_cost_supplier",
    "tpch_q9_product_profit",
    "tpch_q11_important_parts",
    "tpch_q13_custdist",
    "tpch_q14_promo",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_cnt",
    "tpch_q17_small_qty",
    "tpch_q19_disjunctive",
    "tpch_q20_part_shippers",
    "tpch_q22_idle_balances",
    # -- dedup / graph novelties (fuzzy_match_pairs's blocking gains
    #    single-deletion keys this round — changed code in-window) --
    "semantic_dedup",
    "fuzzy_match_pairs",
    "pagerank_knn",
    "triangle_count_knn",
    "dup_span_ratio",
    "span_dedup_rewrite",
    "incremental_dedup",
    # -- temporal --
    "pit_join",
    "cogroup_time_since",
    # -- retrieval --
    "bm25_topk",
    "contamination_check",
    "doc_chunking",
    "rolling_fingerprint",
    # -- corpus sampling / packing family --
    "seq_packing",
    "pii_redaction",
    "quality_filter_chain",
    "weighted_hash_sample",
    "kfold_assign",
    "topk_hash_sample",
    "negative_sampling",
    "temperature_mixture",
    "stream_doc_dedup",
    # -- changed this round / downstream of changed code --
    "seasonal_anomalies",
    "entity_golden_record",
    # -- never-checked reporting / monitoring / sketch rollups --
    "topk_with_others",
    "rolling_corr_events",
    "dynamic_partition_pruning",
    "join_cardinality_report",
    "ols2_per_group",
    "vocab_drift",
    "shard_manifest",
    "kmv_jaccard_sources",
    "ewma_user_value",
    # ---- slot 50: window boundary ----
    # entity_resolution: r03-green, but clustering.py gains the
    # size-thresholded hybrid this round — adjacent in case window > 50.
    "entity_resolution",
    "kmv_distinct_sketch",
    # ---- round-5 window, pre-staged: the 41 BRAND-NEW round-4
    # operators first (highest verification value — never driver-
    # checked, some with code changed after local checks), then the
    # ~44 remaining never-checked names in the exact order r05 should
    # verify them: scalar battery (largest count), agg shapes,
    # subquery battery, vectors/layout, text/stats remainder, final
    # stragglers. Rotate r05 by simply deleting the names that
    # CORRECTNESS_r04 covers above; the window (~50) lands on all new
    # ops + the first scalar-battery entries. ----
    # new in round 4: affinity analytics, DDSketch, retrieval heads,
    # k-core, ORC connector
    "association_rules",
    "item_item_cosine",
    "rfm_segments",
    "target_encoding",
    "ddsketch_quantiles",
    "hard_negative_mining",
    "mmr_diverse_topk",
    "k_core_knn",
    "orc_roundtrip_agg",
    "time_bounded_funnel",
    "capped_running_balance",
    "ucb_bandit_scores",
    "kaplan_meier",
    "k_anonymity_report",
    "dp_noisy_counts",
    "zipf_slope",
    "quantile_normalize",
    "sql_table_udf_agg",
    "sql_scripting_threshold",
    "parameterized_sql_agg",
    "listagg_per_group",
    "binaryfile_ingest",
    "holt_forecast",
    "event_pattern_match",
    "training_set_assembly",
    "stream_ddsketch_quantiles",
    "sprt_decision",
    "gini_concentration",
    "benford_digit_test",
    "cohort_ltv",
    "order_cycle_time",
    "attribution_linear",
    "activity_heatmap",
    "supplier_reliability",
    "duplicate_invoice_detector",
    "segment_migration",
    "new_vs_returning_daily",
    "roc_curve_points",
    "roc_auc",
    "calibration_bins",
    "revenue_bridge",
    # scalar battery
    "string_funcs",
    "date_funcs",
    "math_funcs",
    "regex_funcs",
    "hash_funcs",
    "bitwise_funcs",
    "null_handling",
    "try_funcs",
    "array_funcs",
    "struct_funcs",
    "case_bucketing",
    # agg shapes
    "cube_agg",
    "grouping_sets",
    "pivot_agg",
    "bool_aggs",
    "stats_aggs",
    "percentiles",
    "min_max_by",
    # subquery battery
    "scalar_subquery",
    "exists_correlated",
    "not_exists_correlated",
    "in_subquery",
    "null_safe_join",
    # vectors / layout remainder
    "matryoshka_knn",
    "centroid_assign",
    "pq_codes",
    "dim_stats",
    "feature_hashing",
    "zorder_key",
    "snapshot_diff",
    "partial_agg_merge",
    # text / stats remainder
    "bigram_loglik",
    "repetition_ratio",
    "vocab_topk",
    "bpe_token_count",
    "zscore_normalize",
    "value_outliers",
    "price_histogram",
    "per_source_regression",
    # final stragglers
    "media_frame_sample",
    "window_distribution",
    "event_path_topk",
    "hll_mergeable_counts",
]

_MODULES = [
    affinity,
    governance,
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
