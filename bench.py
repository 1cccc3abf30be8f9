"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"queries": {<name>: secs, ...}, "qx": {<HEADLINE index>:
secs, ...}, "hl": <crc32 of the HEADLINE list>, "metric": ...,
"value": N, "unit": "sec", "sf": ...}. The r14 verdict (item 2) found
the pure index-coded record of r12-r14 kept PERF's per-query and
scaling blocks EMPTY — the driver's generic parser reads name-keyed
"queries" and cannot import this repo's decoder — so per-query rows are
now split: the ``NAMED`` subset (the 45 slowest per the r14 driver
record, ~80% of total time, a FIXED list so the driver's c8-vs-c32
scaling comparison sees identical name sets in both runs) is emitted
name-keyed in "queries", and the rest stays index-coded in "qx" so the
whole record still fits the driver's 2000-byte tail-capture window
(worst-case line measured 1855 B; pinned by test). Nothing is dropped:
every headline query is in the line (by name or index), and
``tools/bench_compare.load()`` merges/decodes both (crc-guarded).
Each run also writes a full-name mirror of the record to
``.bench/BENCH_FULL_latest.json`` (ignored scratch; override with
$SPARK_GRAFT_BENCH_FULL_PATH) — the committed ``BENCH_FULL.json`` is the
mirror of the DRIVER's recorded round run only, refreshed deliberately
by the round workflow, never as a side effect of a local run; its
``boot`` stamp must match the round's BENCH_r{N}.json.

Each query is executed with a noop-format write: unlike ``count()`` —
which Catalyst rewrites to Aggregate(count(1)) and then PRUNES the
query's own aggregates/projections out of the plan — the noop sink
materializes every output column (full real work), with no driver-side
pandas conversion or disk cost in the measurement.

Each query is timed ``N_RUNS`` times and the MINIMUM is recorded: the
min is the least-noise estimator of the engine's actual cost (ambient
load on a shared host only ever adds time, never subtracts), which keeps
round-over-round comparisons about plan changes rather than scheduler
luck.

Cross-ROUND caveat: the host reboots between rounds and its effective
CPU budget drifts within a day (round 3: the same commit measured 0.17 s
vs 0.35 s on filter_pushdown hours apart with zero code change). Treat
sub-0.5 s per-query deltas across rounds as ambient unless a same-boot
A/B (tools/bench_compare.py, min-of-3, back-to-back) reproduces them.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
import zlib

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pb_etl_spark.registry import all_queries
from pb_etl_spark.session import get_spark

HEADLINE = [
    "tpch_q1_pricing",
    "tpch_q6_revenue",
    "tpch_q3_shipping",
    "tpch_q18_large_orders",
    "star_join_revenue",
    "groupby_agg",
    "filter_pushdown",
    "maxabs_normalize",
    "left_join",
    "window_topk_per_group",
    "sort_limit",
    "json_extract_agg",
    "tumbling_window",
    "session_window",
    "dedup_exact",
    "text_quality",
    "knn_cosine",
    "backtest_rates",
    # round-2 additions: the LLM-pipeline families now have headline
    # representation (r1 entries above are unchanged for comparability)
    "minhash_near_dup_pairs",
    "embedding_near_dup_lsh",
    "seq_packing",
    "quality_filter_chain",
    "vector_quantize",
    "pq_codes",
    "fuzzy_match_pairs",
    "gap_fill_resample",
    # round-2 late additions: sketches, retrieval cascade, CDC diff,
    # storage-layout math
    "kmv_distinct_sketch",
    "matryoshka_knn",
    "snapshot_diff",
    "zorder_key",
    "mixture_resample",
    # round-3 additions: the remaining heavy families, tracked before the
    # driver ever times them (BPE encode, substring/semantic dedup,
    # graph), plus the queries rewritten scale-safe this round
    "bpe_encode_counts",
    "substring_dup_spans",
    "semantic_dedup",
    "pagerank_knn",
    "deterministic_shuffle",
    "curriculum_buckets",
    # round-3 new operators: selection / monitoring / sketch set-ops
    "ols2_per_group",
    "dsir_weights",
    "vocab_drift",
    "shard_manifest",
    "kmv_jaccard_sources",
    "ewma_user_value",
    # round-3 event-analytics family: the sliding COUNT DISTINCT is the
    # scale-interesting one (x7 explode of the deduped pair set), and the
    # SCD2 merge tracks the union+join cost of dimension maintenance
    "rolling_active_users",
    "scd2_merge_orders",
    "interval_overlap_join",
    # late round-3: the iterative record-linkage pipeline (heaviest new
    # entry — tracked before the driver ever times it) and the
    # delta-maintenance path
    "entity_resolution",
    "incremental_agg_maintenance",
    # round-4 additions (r03 verdict directive #7): golden-record rides
    # the heaviest pipeline (re-runs entity_resolution + survivorship),
    # and DPP's benefit heuristic gets a timed row
    "entity_golden_record",
    "dynamic_partition_pruning",
    # round-4 new operators, tracked before the driver ever times them:
    # basket self-join, interaction-matrix self-join, 3x global_positions,
    # sketch insert path, unrolled greedy re-rank, iterative peel
    "association_rules",
    "item_item_cosine",
    "rfm_segments",
    "ddsketch_quantiles",
    "mmr_diverse_topk",
    "k_core_knn",
    # round-5 new operators, tracked before the driver ever times them:
    # the two fixed-round graph loops (4-round LPA, 6-round BFS — per-
    # round join+agg cost), the calendar-bounded pairwise slope join,
    # the gaps-and-islands window pass, and the global_running_sum
    # consumer
    "label_propagation_knn",
    "bfs_hops_knn",
    "theil_sen_trend",
    "interval_coverage",
    "abc_classification",
    # round-8 new operators, tracked before the driver ever times them:
    # the one-sided-prefix shingle self-join, the bitmap partial→merge
    # cascade, the global_running_sum pointer sampler, the per-row
    # XML codec pass, and the (bounded-math) apportionment rollup
    "shingle_containment_pairs",
    "bitmap_distinct_counts",
    "pps_systematic_sample",
    "xml_roundtrip_agg",
    "largest_remainder_alloc",
    "weighted_median_by_group",
    # round-9 new operators: the grouped_running_sum primitive's four
    # faces — the full-fact per-priority cumsum, the compacted grouped
    # exact-quantile family, the exact-quota stratified split, and the
    # per-nation Gini over constant-1 positions
    "grouped_running_revenue",
    "grouped_quantiles_exact",
    "exact_stratified_split",
    "gini_by_group",
    # round-10 new operators: the exact-K weighted samplers (global
    # TakeOrderedAndProject pass; per-source WindowGroupLimit rank) and
    # the compacted drift tests (two-sample KS + Mann-Whitney; pairwise
    # source KS matrix)
    "priority_sample_topk",
    "priority_sample_per_source",
    "ks_mann_whitney",
    "source_drift_matrix",
    # round-11: embedding_near_dup_lsh above is now the production-
    # regime face (16 planes x 8 tables, cos >= 0.9, twin-planted
    # corpus — expect a step CHANGE vs r10 records: different, linear
    # workload); the old 0.4-threshold quadratic face keeps a timed row
    # under its new sweep-tier name, and the streaming drift gate is
    # tracked before the driver ever times it
    "embedding_near_dup_lsh_lowt",
    "stream_drift_monitor",
    # late round-11: the wallet scan's plan changed wholesale (per-user
    # Python loop -> closed-form JVM window identity, 3.3 s -> 0.6 s at
    # sf0.1) — give the driver a timed row on the new plan
    "capped_running_balance",
    # round-12: the PSI face of the streaming retrain-gate family,
    # tracked before the driver ever times it (same compacted-cells
    # drain pattern as stream_drift_monitor — expect micro-batch fixed
    # cost, not data cost)
    "stream_psi_monitor",
    # round-13: the Dunning-G² face completing the streaming monitor
    # trio — same drain pattern, but vocab-sized (not bucket-sized)
    # complete-mode state, so its timing tracks the token explode
    "stream_vocab_drift",
]

# The name-keyed subset of the stdout line (r14 verdict item 2): the 45
# slowest queries of the r14 DRIVER record, in that record's time order.
# FIXED deliberately — a per-run "slowest 45" would emit different name
# sets at different core counts and shrink the driver's scaling
# intersection. Append new heavyweights here only while the worst-case
# line stays under the window (tests/test_bench_line.py pins it).
NAMED = [
    "mmr_diverse_topk",
    "shingle_containment_pairs",
    "entity_golden_record",
    "association_rules",
    "entity_resolution",
    "fuzzy_match_pairs",
    "ddsketch_quantiles",
    "rfm_segments",
    "item_item_cosine",
    "stream_vocab_drift",
    "embedding_near_dup_lsh_lowt",
    "stream_drift_monitor",
    "embedding_near_dup_lsh",
    "rolling_active_users",
    "k_core_knn",
    "substring_dup_spans",
    "stream_psi_monitor",
    "pagerank_knn",
    "ewma_user_value",
    "tpch_q1_pricing",
    "grouped_quantiles_exact",
    "kmv_distinct_sketch",
    "weighted_median_by_group",
    "gini_by_group",
    "star_join_revenue",
    "semantic_dedup",
    "scd2_merge_orders",
    "tpch_q3_shipping",
    "bfs_hops_knn",
    "seq_packing",
    "grouped_running_revenue",
    "dsir_weights",
    "label_propagation_knn",
    "incremental_agg_maintenance",
    "minhash_near_dup_pairs",
    "snapshot_diff",
    "matryoshka_knn",
    "exact_stratified_split",
    "maxabs_normalize",
    "source_drift_matrix",
    "dynamic_partition_pruning",
    "tpch_q18_large_orders",
    "shard_manifest",
    "largest_remainder_alloc",
    "interval_overlap_join",
]


def _boot_stamp() -> str:
    """``<first-8-of-boot_id>+<uptime-hours>h`` — which boot produced
    this record, and how warm the host was. Best-effort (Linux procfs);
    'unknown' elsewhere."""
    try:
        with open("/proc/sys/kernel/random/boot_id") as f:
            boot = f.read().strip()[:8]
        with open("/proc/uptime") as f:
            up_h = float(f.read().split()[0]) / 3600
        return f"{boot}+{up_h:.1f}h"
    except Exception:  # noqa: BLE001 — masked/odd procfs (empty or
        # non-numeric files raise ValueError/IndexError, not OSError)
        # must not cost the whole run's timings at summary time
        return "unknown"


def calibrate(spark, sf_dir: str, n: int = 5) -> float:
    """Machine-speed anchor (r03 verdict directive #4): min-of-``n`` of a
    FIXED, trivially-planned workload — a full lineitem scan + one
    column sum (no shuffle, one stage, fully codegen'd). Its only
    variable across rounds is the host itself (reboots, ambient CPU
    drift — round 3 measured the same commit 2× apart hours apart), so
    ``tools/bench_compare.py`` divides cross-round ratios by the
    calibration ratio to separate drift from plan regressions."""
    path = f"{sf_dir.rstrip('/')}/lineitem.parquet"
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        spark.read.parquet(path).selectExpr("sum(l_quantity)").collect()
        best = min(best, time.time() - t0)
    return round(best, 4)


def calibrate_shuffle(spark, n: int = 5) -> float:
    """Second anchor: a FIXED fixture-independent multi-stage workload
    (range → hash-partitioned groupBy → sorted grouped window → 1-row
    agg: two exchanges, three stages). The scan anchor is blind to
    multi-stage scheduling ambience — r09's driver bench moved 45
    queries >1.3× wholesale while the scan anchor moved the OPPOSITE
    way, and the r10 local runs repeated the pattern — so cross-round
    adjudication gets a scheduling-floor drift signal too."""
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        (
            spark.range(2_000_000)
            .selectExpr("id % 1024 AS k", "id % 7 AS v")
            .groupBy("k")
            .agg({"v": "sum"})
            .withColumnRenamed("sum(v)", "s")
            .selectExpr(
                "s",
                "row_number() OVER (PARTITION BY k % 32 ORDER BY k) AS rn",
            )
            .selectExpr("max(s + rn)")
            .collect()
        )
        best = min(best, time.time() - t0)
    return round(best, 4)


def prior_slowest(n: int = 3) -> list[str]:
    """Names of the ``n`` slowest queries from the latest BENCH_r*.json
    next to this script (empty if none exists yet)."""
    here = os.path.dirname(os.path.abspath(__file__))
    # numeric round sort: lexicographic would put BENCH_r10 before BENCH_r2
    benches = sorted(
        (f for f in os.listdir(here) if re.fullmatch(r"BENCH_r\d+\.json", f)),
        key=lambda f: int(re.search(r"\d+", f).group()),
    )
    if not benches:
        return []
    try:
        # one parser for the driver's record shapes ("queries" at top
        # level, nested under "parsed", or raw in "tail") — shared with
        # the comparison tool so a format change can't silently disable
        # the warm-up here while bench_compare still works
        from tools.bench_compare import load as _load_bench

        prior = _load_bench(os.path.join(here, benches[-1])).get("queries", {})
    except (OSError, json.JSONDecodeError, SystemExit, ImportError):
        return []
    return sorted(prior, key=prior.get, reverse=True)[:n]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    queries = all_queries()

    # steady-state warm-up: JIT/codegen + parquet footer caches, untimed.
    # Warm with a NON-headline query so no timed entry gets a free warm
    # second run the others don't ...
    spark.read.parquet(f"{sf_dir.rstrip('/')}/region.parquet").count()
    queries["semi_join"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    # calibrate BEFORE the heavy warm-up, at exactly this point in the
    # session: the anchor's cross-round comparability depends on a FIXED
    # measurement protocol (light warm-up → calibrate), and that is the
    # protocol every prior round's recorded calib used. Measured: running
    # 3 heavy queries first JIT-warms the scan and drops calib ~25%
    # (0.192 → 0.147 same host, same hour) — which would inflate every
    # drift-normalized timing by ~1.4× against prior rounds and
    # manufacture wholesale fake regressions in bench_compare.
    calib = calibrate(spark, sf_dir)
    print(f"# calib_scan_s: {calib:.4f}s", file=sys.stderr)
    # the shuffle anchor runs at the same fixed point; r10 and earlier
    # rounds have no recorded value (bench_compare treats it as
    # optional), so its protocol position only needs to be stable from
    # r10 onward
    calib_shuffle = calibrate_shuffle(spark)
    print(f"# calib_shuffle_s: {calib_shuffle:.4f}s", file=sys.stderr)

    # ... THEN the 3 slowest prior-round queries, once each, untimed
    # (r04 verdict directive #7): the heaviest plans exercise the widest
    # JIT/codegen surface, so running them first makes warm-up uniform
    # instead of landing the cold-start cost on whatever row is timed
    # first (r04's tpch_q1_pricing 0.51→0.61 first-row pattern).
    for name in prior_slowest():
        if name in queries:
            queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            print(f"# warmed: {name}", file=sys.stderr)

    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = queries[name]
        best = float("inf")
        for _ in range(n_runs):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        timings[name] = round(best, 3)
        total += best
        print(f"# {name}: {best:.3f}s", file=sys.stderr)

    m = re.search(r"sf(\d+(?:\.\d+)?)/?$", sf_dir.rstrip("/"))
    sf = float(m.group(1)) if m else 0.0
    summary = {
        "metric": "headline_queries_total",
        "value": round(total, 3),
        "unit": "sec",
        "sf": sf,
        "calib_scan_s": calib,
        "calib_shuffle_s": calib_shuffle,
        # host-regime stamp (r12 verdict item 5): r12 had TWO plausible
        # "full r12 records" 1.5× apart because a quiet-host re-run and
        # the driver's run were indistinguishable after the fact. The
        # boot id (+ uptime at measurement) pins which boot produced a
        # record, so a re-run on a different boot can never be mistaken
        # for the driver's.
        "boot": _boot_stamp(),
    }
    here = os.path.dirname(os.path.abspath(__file__))
    # full-name record to a file: complete regardless of how much of
    # stdout the driver's capture keeps. Written to an IGNORED scratch
    # path (ADVICE r12: writing the committed BENCH_FULL.json directly
    # meant every exploratory local run dirtied the tree and could
    # silently clobber the official round mirror) — the round workflow
    # copies the driver-run record into the committed BENCH_FULL.json
    # deliberately, verifying the boot stamp against BENCH_r{N}.json.
    full_path = os.environ.get(
        "SPARK_GRAFT_BENCH_FULL_PATH",
        os.path.join(here, ".bench", "BENCH_FULL_latest.json"),
    )
    os.makedirs(os.path.dirname(full_path) or ".", exist_ok=True)
    with open(full_path, "w") as f:
        json.dump({"queries": timings, **summary}, f, indent=1)
    # stdout line: the driver's bench-tail capture keeps only the LAST
    # 2000 bytes (BENCH_r09 lost the summary keys to front-truncation;
    # r11's reordered record lost ~15 per-query rows instead — the full-
    # name 80-query dict alone outgrows the window at ~2150 B). The
    # r12-r14 pure index coding fit but left the DRIVER's generic parser
    # with per_query/scaling EMPTY (r14 verdict item 2), so the record
    # is now hybrid: the FIXED ``NAMED`` subset name-keyed in "queries"
    # (driver-legible, 80% of total time), the rest index-coded in "qx"
    # against HEADLINE (lossless; tools/bench_compare.load() merges
    # both, crc-guarded by "hl"). HEADLINE stays APPEND-ONLY: reordering
    # or deleting entries would shift the indexes of every already-
    # recorded round (the crc turns that mistake into a hard error, not
    # silent mislabeling).
    named = set(NAMED)
    compact = {
        "queries": {n: timings[n] for n in NAMED},
        "qx": {
            str(i): timings[n]
            for i, n in enumerate(HEADLINE)
            if n not in named
        },
        "hl": zlib.crc32(";".join(HEADLINE).encode()),
        **summary,
    }
    line = json.dumps(compact, separators=(",", ":"))
    while len(line) > 1900 and compact["queries"]:
        # paranoia fallback (should never fire: worst-case 1855 B is
        # pinned by test): demote the fastest named rows to index coding
        # until the line fits — nothing is dropped, only re-keyed.
        drop = min(compact["queries"], key=compact["queries"].get)
        compact["qx"][str(HEADLINE.index(drop))] = compact["queries"].pop(drop)
        line = json.dumps(compact, separators=(",", ":"))
        print(f"# bench line over budget: demoted {drop} to qx", file=sys.stderr)
    print(line)


if __name__ == "__main__":
    main()
