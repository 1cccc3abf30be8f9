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
# r01-r06: 238 unique names checked, 223 green latest-status; the only
# reds were 11 oracle-typing rows (un-cast SUM -> DuckDB HUGEINT ->
# pandas float64 vs Spark int64; Spark values verified correct).
# The round-7 window executes the r05/r06 verdict directive verbatim:
#   1. slots 0-10: the 11 red rows, each carrying a round-7
#      CAST(... AS BIGINT) oracle fix — re-checked first so the fix is
#      driver-confirmed this round.
#   2. slots 11-12: mode_per_group / oov_rate — staged at slots 51-52
#      in r05/r06 but the driver stops at 50, so still never checked.
#   3. slot 13: map_funcs — r06-green but its code AND oracle changed
#      this round (reserved '__all' key filtered on both engines).
#   4. slots 14-57: the 44 remaining never-checked names in the
#      pre-staged verification order — scalar battery, agg shapes,
#      subquery battery, vectors/layout remainder, text/stats
#      remainder, final stragglers (hll_mergeable_counts is rows-only,
#      no oracle by design). 11 + 1 + 46 = 58: a ~50 window leaves ~8
#      for the r08 head; after that every registered query has been
#      driver-checked at least once.
_PRIORITY = [
    # -- slots 0-10: the 11 r05/r06 reds, oracles CAST to BIGINT r07 --
    "item_item_cosine",
    "rfm_segments",
    "orc_roundtrip_agg",
    "k_anonymity_report",
    "sql_table_udf_agg",
    "parameterized_sql_agg",
    "training_set_assembly",
    "gini_concentration",
    "supplier_reliability",
    "new_vs_returning_daily",
    "roc_curve_points",
    # -- slots 11-12: r05 additions staged beyond the r06 window edge --
    "mode_per_group",
    "oov_rate",
    # -- slot 13: changed code+oracle this round ('__all' reserved-key
    # filter on both engines), so re-checked despite being r06-green --
    "map_funcs",
    # -- slots 14+: the 44 remaining never-checked names --
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
