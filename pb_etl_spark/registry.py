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
# The round-14 window, per the r13 verdict's staged plan:
#   1. slots 0-17: the 18 offset-literal conversion re-pins (r13
#      verdict item 1). The global_positions / global_running_sum /
#      grouped_running_sum primitives now bake their per-partition
#      offsets as an ARRAY literal indexed by spark_partition_id
#      (O(1) GetArrayItem; empty-at-count-time pids hold NULL so the
#      boundary-drift miss detection survives the conversion) instead
#      of a CreateMap literal probed per output row (GetMapValue on a
#      literal map is a linear scan — O(shuffle.partitions) key
#      comparisons per row, invisible at the 32-partition fixture,
#      real at a 20k-partition deployment). The grouped variant keys
#      an outer pid array whose elements are per-pid group maps
#      (bounded by groups-per-partition, small by range-partition
#      contiguity under the documented low-cardinality contract).
#      Every registered consumer's plan changes and rides the window:
#      sprt_decision, quantile_normalize, shard_manifest,
#      gini_by_group, gini_concentration, segment_migration,
#      rfm_segments, abc_classification, weighted_median_by_group,
#      grouped_quantiles_exact, window_ranking, seq_packing,
#      top_p_quality_sample, deterministic_shuffle, curriculum_buckets,
#      exact_stratified_split, pps_systematic_sample,
#      grouped_running_revenue.
#   1b. slots 18-22: the adversarial-fixture review re-pins (found by
#      tools/adversarial_fixture.py mid-round): matryoshka_knn (zero-
#      norm Matryoshka-prefix cosine — ANSI DIVIDE_BY_ZERO crash on
#      Spark, silent -1.0 on DuckDB; both legs now guard cos=0.0),
#      media_frame_sample (byte-true md5∘hex frame digest — the old
#      raw-bytes md5 only matched while text was pure ASCII),
#      binaryfile_ingest (empty-file exclusion documented + oracle
#      filter; Spark binaryFile emits no row for 0-byte files), and
#      media_decode / media_feature_summary (oracle encode(text)
#      instead of the non-ASCII-rejecting VARCHAR->BLOB cast).
#   2. slots 23-29: the 7 r06-stale leftovers, alphabetical (displaced
#      from the r13 window by its review-fix re-pins; after these,
#      nothing oracle-backed is staler than r07).
#   3. slots 30-49: the next 20 r07-stale names, alphabetical (the r07
#      cohort is 43, minus matryoshka_knn which rides as a re-pin; the
#      remaining 22 carry to the r15 window head).
# Deliberately NOT staged, ever (r08 verdict item 3): approx_distinct,
# approx_percentiles, hll_mergeable_counts, stratified_sample — the 4
# oracle-less sketch/RNG names whose driver check can only report
# `err: no_oracle`; their hash-checked deterministic twins
# (kmv_distinct_sketch / bitmap_distinct_counts, ddsketch_quantiles,
# stratified_hash_sample) carry the correctness evidence instead
# (exemption pinned by tests/test_freshness_ledger.py).

# The driver round this window is staged FOR: the ledger tests evaluate
# _PRIORITY against CORRECTNESS records STRICTLY OLDER than this round,
# so pytest stays green after the driver drops CORRECTNESS_r14.json
# (r13 verdict item 3 — previously the post-round record turned the
# ledger red until the next round's first commit). One newer record is
# tolerated with a warning naming it; two means a round went by without
# restaging, which fails.
_STAGED_FOR = 14

_PRIORITY = [
    # -- slots 0-17: offset-literal conversion re-pins --
    "sprt_decision",
    "quantile_normalize",
    "shard_manifest",
    "gini_by_group",
    "gini_concentration",
    "segment_migration",
    "rfm_segments",
    "abc_classification",
    "weighted_median_by_group",
    "grouped_quantiles_exact",
    "window_ranking",
    "seq_packing",
    "top_p_quality_sample",
    "deterministic_shuffle",
    "curriculum_buckets",
    "exact_stratified_split",
    "pps_systematic_sample",
    "grouped_running_revenue",
    # -- slots 18-22: adversarial-fixture review re-pins --
    "matryoshka_knn",
    "media_frame_sample",
    "binaryfile_ingest",
    "media_decode",
    "media_feature_summary",
    # -- slots 23-29: the 7 r06-stale leftovers --
    "sql_scripting_threshold",
    "stream_ddsketch_quantiles",
    "target_encoding",
    "theil_sen_trend",
    "time_bounded_funnel",
    "ucb_bandit_scores",
    "zipf_slope",
    # -- slots 30-49: the next 20 r07-stale names, alphabetical --
    "array_funcs",
    "bigram_loglik",
    "bitwise_funcs",
    "bool_aggs",
    "bpe_token_count",
    "case_bucketing",
    "centroid_assign",
    "date_funcs",
    "dim_stats",
    "exists_correlated",
    "feature_hashing",
    "hash_funcs",
    "in_subquery",
    "item_item_cosine",
    "k_anonymity_report",
    "kmv_distinct_sketch",
    "map_funcs",
    "math_funcs",
    "min_max_by",
    "mode_per_group",
]

# Machine-readable staging annotation (consumed by
# tests/test_freshness_ledger.py): the window entries staged for
# PLAN-CHANGE / NEW-CODE reasons rather than staleness. Every other
# _PRIORITY slot must be exactly the oldest-first (staleness, name)
# prefix of the non-repin oracle-backed names — so a mis-transcribed
# stale name anywhere in the window (not just the oldest cohort) fails
# pytest. Reset this set each round when restaging.
_REPINS = {
    # r14 offset-literal conversion (corpus.global_positions /
    # global_running_sum / grouped_running_sum — every registered
    # consumer, direct or via affinity.exact_quintile):
    "sprt_decision",
    "quantile_normalize",
    "shard_manifest",
    "gini_by_group",
    "gini_concentration",
    "segment_migration",
    "rfm_segments",
    "abc_classification",
    "weighted_median_by_group",
    "grouped_quantiles_exact",
    "window_ranking",
    "seq_packing",
    "top_p_quality_sample",
    "deterministic_shuffle",
    "curriculum_buckets",
    "exact_stratified_split",
    "pps_systematic_sample",
    "grouped_running_revenue",
    # r14 adversarial-fixture review fixes (tools/adversarial_fixture.py
    # sweep findings; see the _PRIORITY staging comment, slots 18-22):
    "matryoshka_knn",
    "media_frame_sample",
    "binaryfile_ingest",
    "media_decode",
    "media_feature_summary",
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
