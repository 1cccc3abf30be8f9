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
# r01-r07: 276 of 283 names checked at least once, zero latest-status
# reds (CORRECTNESS_r07 = 50/50 green, including the 11 former
# oracle-typing rows). The round-8 window:
#   1. slots 0-7: the 8 names never driver-checked — the r07 rotation's
#      overflow, pre-staged for this head. After this round every
#      registered query has been driver-checked at least once.
#   2. slots 8-13: the 6 round-8 additions (new code + new oracles) —
#      xml round-trip codec, exact bitmap-cardinality rollup,
#      largest-remainder apportionment, asymmetric shingle containment,
#      PPS systematic sampling, exact per-group weighted median.
#   3. slots 14+: freshness rotation — the 36 stalest names (last
#      checked in round 1; the remaining 4 r01 names lead the r09
#      head). Nothing here changed; this re-pins old greens on current
#      code.
_PRIORITY = [
    # -- slots 0-7: the last 8 never-checked names --
    "zscore_normalize",
    "value_outliers",
    "price_histogram",
    "per_source_regression",
    "media_frame_sample",
    "window_distribution",
    "event_path_topk",
    "hll_mergeable_counts",
    # -- slots 8-13: round-8 additions --
    "xml_roundtrip_agg",
    "bitmap_distinct_counts",
    "largest_remainder_alloc",
    "shingle_containment_pairs",
    "pps_systematic_sample",
    "weighted_median_by_group",
    # -- slots 13+: stalest (r01-checked) names, oldest debt first --
    "text_stats",
    "text_quality",
    "lang_id",
    "doc_fingerprint",
    "dedup_exact",
    "tfidf_top_terms",
    "scan_project",
    "filter_pushdown",
    "left_join",
    "full_outer_join",
    "stratified_sample",
    "semi_join",
    "anti_join",
    "star_join_revenue",
    "global_aggregates",
    "backtest_rates",
    "maxabs_normalize",
    "groupby_agg",
    "distinct_agg",
    "conditional_agg",
    "having_groups",
    "rollup_agg",
    "sort_limit",
    "window_topk_per_group",
    "window_running_sum",
    "window_lag_delta",
    "set_intersect",
    "set_except",
    "union_distinct",
    "set_intersect_all",
    "set_except_all",
    "trailing_rows_avg",
    "higher_order_funcs",
    "json_roundtrip",
    "unpivot_measures",
    "collect_agg",
    # r09 head: window_range_frame, stream_tumbling_window,
    # stream_session_window, stream_sliding_window (the remaining r01
    # names), then the r02 set
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
