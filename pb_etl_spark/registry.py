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
# registry entries (registry insertion order) each round. Rounds 1-4
# verified 188 unique queries, all green latest-status (r04: 50/50).
# The round-5 window (slots 0-49) follows the r04 verdict directive:
#   1. slots 0-40: the 41 operators ADDED in round 4 — never driver-
#      checked, and the highest-value names to verify (brand-new code;
#      includes the environment-sensitive Spark-4 SQL scripting /
#      table-UDF / parameterized-SQL trio and the streaming DDSketch).
#      benford_digit_test and binaryfile_ingest also carry round-5
#      code/oracle fixes (ADVICE items), so they are changed-code
#      in-window.
#   2. slot 41: entity_resolution — r03-green, but clustering.py's
#      eager per-nation collect moves to execution time this round
#      (ADVICE item #1), so its construction path changed.
#   3. slots 42-49: 8 of the 10 round-5 additions (operators/
#      insights.py) — the NEWEST code, hence the highest driver-quirk
#      risk (the same newest-first principle as slots 0-40); the
#      iterative/CTE-chain and Spark-4 LATERAL entries lead.
# Slot 50 keeps entity_golden_record adjacent (r04-green; rides the
# changed clustering construction) in case the driver checks >50;
# slots 51-52 hold the two simplest round-5 additions.
_PRIORITY = [
    # -- round-5 window: the 41 round-4 additions, never driver-checked --
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
    # -- slot 41: changed construction path this round (ADVICE #1) --
    "entity_resolution",
    # -- slots 42-49: the round-5 additions (operators/insights.py),
    # newest-first: iterative CTE-chain graph ops, Spark-4 LATERAL,
    # the global_running_sum consumer, window/integer-math screens --
    "label_propagation_knn",
    "bfs_hops_knn",
    "lateral_topk_join",
    "abc_classification",
    "theil_sen_trend",
    "interval_coverage",
    "burstiness_stats",
    "map_funcs",
    # ---- slot 50: window boundary ----
    # entity_golden_record: r04-green, kept adjacent because it rides
    # the reworked entity-resolution construction (ADVICE #1 fix).
    "entity_golden_record",
    # the two simplest round-5 additions (single hash-agg shapes)
    "mode_per_group",
    "oov_rate",
    # ---- round-6 window, pre-staged: the exact remaining
    # never-checked names in verification order — scalar battery, agg
    # shapes, subquery battery, vectors/layout remainder, text/stats
    # remainder, final stragglers (hll_mergeable_counts is rows-only,
    # no oracle by design). Rotate r06 by deleting the names
    # CORRECTNESS_r05 covers above; the ~50 window then covers ALL of
    # these → 100% driver coverage at round 6. ----
    "kmv_distinct_sketch",
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
