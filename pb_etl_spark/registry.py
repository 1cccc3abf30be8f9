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
# r01-r12: every registered name checked at least once, zero
# latest-status hash-fails (CORRECTNESS_r12 = 50/50 green, no `err`
# rows). Freshness bookkeeping is now SELF-CHECKING: tools/freshness.py
# derives each name's latest-checked round from the committed
# CORRECTNESS_r*.json records and tests/test_freshness_ledger.py
# asserts the window below against it (r12 verdict item 4) — a
# mis-transcribed name fails pytest instead of silently burning a slot.
# The round-13 window, per the r12 verdict's staged plan:
#   1. slots 0-11: the 12 r04-stale leftovers, alphabetical (the tail
#      of the r04 burn-down staged since r12; after these, nothing is
#      staler than r06 and staging reverts to oldest-first rotation).
#      vocab_drift doubles as a plan-change re-pin: its G² math moved
#      into the shared selection.vocab_drift_from_cells this round.
#   2. slots 12-20: the 9 queries whose plans changed with the r13
#      fan-out-width conversion (r12 verdict item 2 — the shared
#      operators/_width.fanout_width replaced the last hardcoded
#      defaultParallelism widths at selection.py/text.py/multimodal.py/
#      retrieval.py; 32 -> 200 under the driver's vanilla session):
#      cms_token_counts, ddsketch_quantiles, doc_chunking, dsir_weights,
#      media_decode, media_feature_summary, media_frame_sample,
#      repetition_ratio, vocab_topk. (retrieval._scan_width keeps
#      defaultParallelism DELIBERATELY — it models Spark's own
#      FilePartition maxSplitBytes formula, which divides by
#      defaultParallelism; converting it would make the model disagree
#      with the engine. Exemption pinned in tests/test_plan_lint.py's
#      _WIDTH_SOURCE_WHITELIST.)
#   3. slot 21: round-13 new code — stream_vocab_drift, the Dunning-G²
#      face of the streaming retrain-gate family (r12 verdict item 6),
#      sharing selection.vocab_drift_from_cells and the batch oracle.
#   4. slots 22-24: the r13 review-pass re-pins — curriculum_buckets
#      (Spark bin formula corrected to exact front-loaded NTILE),
#      twap_user_value (zero-duration NULL guard, both engines),
#      incremental_dedup (NULL-text exclusion, both engines).
#   5. remaining slots: the 25 alphabetically-first r06-stale names
#      (the r06 cohort is 33; ddsketch_quantiles and event_pattern_match
#      ride as re-pins; sql_scripting_threshold,
#      stream_ddsketch_quantiles, target_encoding, theil_sen_trend,
#      time_bounded_funnel, ucb_bandit_scores, zipf_slope carry to the
#      r14 window head).
# ALSO staged for r14 (r13 review finding, deliberately deferred): the
# global_positions / global_running_sum / grouped_running_sum offset
# lookup is a CreateMap LITERAL probed per row — GetMapValue on a
# literal map is a linear scan, so every output row pays
# O(shuffle.partitions) key comparisons (invisible at the 32-partition
# fixture; real at a 20k-partition deployment). The fix for the
# pid-keyed variants is an array literal indexed by spark_partition_id
# (O(1) GetArrayItem); the grouped variant wants an array-of-struct per
# pid. Deferred because it changes the plan of every helper consumer
# (seq_packing, exact_stratified_split, grouped_running_revenue,
# pps_systematic_sample, deterministic_shuffle, rfm_segments,
# gini_by_group, abc_classification, curriculum_buckets, ...) — a
# ~12-name re-pin burden this round's window cannot absorb.
# Deliberately NOT staged, ever (r08 verdict item 3): approx_distinct,
# approx_percentiles, hll_mergeable_counts, stratified_sample — the 4
# oracle-less sketch/RNG names whose driver check can only report
# `err: no_oracle`; their hash-checked deterministic twins
# (kmv_distinct_sketch / bitmap_distinct_counts, ddsketch_quantiles,
# stratified_hash_sample) carry the correctness evidence instead
# (exemption pinned by tests/test_freshness_ledger.py).
_PRIORITY = [
    # -- slots 0-11: the 12 r04-stale leftovers --
    "stream_doc_dedup",
    "temperature_mixture",
    "topk_hash_sample",
    "topk_with_others",
    "tpch_q13_custdist",
    "tpch_q16_supplier_cnt",
    "tpch_q20_part_shippers",
    "tpch_q2_min_cost_supplier",
    "triangle_count_knn",
    "udtf_chunking",
    "vocab_drift",
    "weighted_hash_sample",
    # -- slots 12-20: fan-out-width conversion re-pins --
    "cms_token_counts",
    "ddsketch_quantiles",
    "doc_chunking",
    "dsir_weights",
    "media_decode",
    "media_feature_summary",
    "media_frame_sample",
    "repetition_ratio",
    "vocab_topk",
    # -- slot 21: round-13 new code --
    "stream_vocab_drift",
    # -- slots 22-24: r13 review-fix re-pins (plans/oracles changed:
    #    curriculum moved to exact front-loaded NTILE; twap gained the
    #    zero-duration NULL guard; incremental_dedup excludes NULL text
    #    on both engines) --
    "curriculum_buckets",
    "twap_user_value",
    "incremental_dedup",
    # -- slots 22-49: the 28 oldest (r06) names, alphabetical --
    "activity_heatmap",
    "association_rules",
    "attribution_linear",
    "benford_digit_test",
    "bfs_hops_knn",
    "binaryfile_ingest",
    "burstiness_stats",
    "calibration_bins",
    "cohort_ltv",
    "dp_noisy_counts",
    "duplicate_invoice_detector",
    "entity_resolution",
    "event_pattern_match",
    "hard_negative_mining",
    "holt_forecast",
    "interval_coverage",
    "k_core_knn",
    "kaplan_meier",
    "label_propagation_knn",
    "lateral_topk_join",
    "listagg_per_group",
    "mmr_diverse_topk",
    "order_cycle_time",
    "revenue_bridge",
    "roc_auc",
]

# Machine-readable staging annotation (consumed by
# tests/test_freshness_ledger.py): the window entries staged for
# PLAN-CHANGE / NEW-CODE reasons rather than staleness. Every other
# _PRIORITY slot must be exactly the oldest-first (staleness, name)
# prefix of the non-repin oracle-backed names — so a mis-transcribed
# stale name anywhere in the window (not just the oldest cohort) fails
# pytest. Reset this set each round when restaging.
_REPINS = {
    # r13 fan-out-width conversion (operators/_width.fanout_width):
    "cms_token_counts",
    "ddsketch_quantiles",
    "doc_chunking",
    "dsir_weights",
    "media_decode",
    "media_feature_summary",
    "media_frame_sample",
    "repetition_ratio",
    "vocab_topk",
    # r13 refactor onto selection.vocab_drift_from_cells (also r04-stale,
    # so it would ride the window either way):
    "vocab_drift",
    # r13 new code:
    "stream_vocab_drift",
    # r13 review-fix plan changes (same-round re-pins; event_pattern_match
    # was already staged as r06-stale and moved here when its plan gained
    # the PM_JOURNEY_CAP rank filter):
    "curriculum_buckets",
    "twap_user_value",
    "incremental_dedup",
    "event_pattern_match",
}

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
