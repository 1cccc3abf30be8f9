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
# r01-r08: every registered name checked at least once, zero
# latest-status hash-fails (CORRECTNESS_r08 = 48/50 green + 2 deliberate
# `err: no_oracle` rows). The round-9 window:
#   1. slot 0: weighted_median_by_group — code CHANGED this round (the
#      r08 verdict's scale fix: pre-compaction before the keyed window),
#      so its green must be re-pinned on the new plan.
#   2. slots 1-4: the round-9 additions (grouped_running_sum infra) —
#      exact grouped weighted quantiles, per-priority running revenue,
#      exact-count stratified split, per-nation Gini.
#   3. slots 5-8: seq_packing / top_p_quality_sample /
#      quantile_normalize / window_ranking — code CHANGED this round
#      (low-cardinality keyed windows migrated onto
#      grouped_running_sum; window_ranking was also r02-stale).
#   4. slots 9-12: the last 4 r01-checked names (the streaming execution
#      path has not been driver-re-checked since round 1).
#   5. slots 13-49: 37 of the 45 remaining oracle-backed r02-stale
#      names, alphabetical. Nothing here changed; this re-pins old
#      greens on current code.
# Deliberately NOT staged, ever (r08 verdict item 3): approx_distinct,
# approx_percentiles, hll_mergeable_counts, stratified_sample — the 4
# oracle-less sketch/RNG names whose driver check can only report
# `err: no_oracle`; their hash-checked deterministic twins
# (kmv_distinct_sketch / bitmap_distinct_counts, ddsketch_quantiles,
# stratified_hash_sample) carry the correctness evidence instead.
# r10 head: the 8 r02 overflow names (tpch_q21_waiting_supplier,
# tpch_q3_shipping, tpch_q4_priority, tpch_q5_region_volume,
# tpch_q6_revenue, tpch_q7_nation_volume, tpch_q8_market_share,
# tumbling_window), then the r03 set.
_PRIORITY = [
    # -- slot 0: changed code (r08-verdict scale fix) --
    "weighted_median_by_group",
    # -- slots 1-4: round-9 additions --
    "grouped_quantiles_exact",
    "grouped_running_revenue",
    "exact_stratified_split",
    "gini_by_group",
    # -- slots 4-7: changed code (keyed windows -> grouped_running_sum) --
    "seq_packing",
    "top_p_quality_sample",
    "quantile_normalize",
    "window_ranking",
    # -- slots 8-11: the last r01-checked names --
    "window_range_frame",
    "stream_tumbling_window",
    "stream_session_window",
    "stream_sliding_window",
    # -- slots 13-49: r02-stale names (37 of 45; 8 overflow to r10) --
    "asof_join",
    "bucketed_join",
    "cohort_retention",
    "dedup_clusters",
    "dedup_keep_latest",
    "dedup_representatives",
    "embedding_near_dup",
    "embedding_near_dup_lsh",
    "embedding_norms",
    "explode_history",
    "interval_funcs",
    "json_extract_agg",
    "knn_cosine",
    "media_decode",
    "minhash_near_dup_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "partition_pruned_scan",
    "python_datasource",
    "range_join",
    "session_window",
    "sessionize_lag",
    "simhash_fingerprints",
    "skew_salted_agg",
    "skew_salted_join",
    "sliding_window",
    "stratified_hash_sample",
    "stream_dedup",
    "stream_enrich",
    "stream_foreach_upsert",
    "stream_python_datasource",
    "stream_stream_join",
    "stream_user_stats_tws",
    "stream_user_totals",
    "tpch_q10_returns",
    "tpch_q18_large_orders",
    "tpch_q1_pricing",
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
