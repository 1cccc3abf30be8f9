"""Physical-plan audits: the properties that make queries survive a
100× scale-up must be visible in the executed plan, not assumed.

- predicates reach the parquet scan (PushedFilters), including timestamp
  range predicates;
- column pruning is exact (ReadSchema lists only referenced columns);
- bounded dimensions broadcast (BroadcastHashJoin), never shuffle the fact;
- scan→filter→project→partial-agg pipelines run inside whole-stage codegen.
"""

from __future__ import annotations

from pb_etl_spark.registry import all_queries
from tests.conftest import SF_DIR


def _plan(spark, name: str) -> str:
    # default 100-char metadata truncation hides the tail of PushedFilters
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    df = all_queries()[name](spark, SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filters_pushed_to_scan(spark):
    plan = _plan(spark, "tpch_q6_revenue")
    assert "GreaterThanOrEqual(l_shipdate" in plan, plan[:1500]
    assert "LessThan(l_quantity,24.0)" in plan
    assert "GreaterThanOrEqual(l_discount,0.05)" in plan


def test_q5_column_pruning_exact(spark):
    plan = _plan(spark, "tpch_q5_region_volume")
    # lineitem scan must read exactly the 4 referenced columns
    assert (
        "ReadSchema: struct<l_orderkey:bigint,l_suppkey:bigint,"
        "l_extendedprice:double,l_discount:double>" in plan
    ), plan[:2000]
    # and never the wide text-ish columns
    assert "l_returnflag" not in plan


def test_q5_dims_broadcast(spark):
    plan = _plan(spark, "tpch_q5_region_volume")
    assert plan.count("BroadcastHashJoin") >= 3, plan[:2000]
    assert "SortMergeJoin" not in plan


def test_scan_project_prunes_and_has_no_exchange(spark):
    plan = _plan(spark, "scan_project")
    assert "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_extendedprice:double>" in plan
    assert "Exchange" not in plan


def test_q1_partial_aggregation_and_codegen(spark):
    plan = _plan(spark, "tpch_q1_pricing")
    # map-side combine: partial_sum before the exchange
    assert "partial_sum" in plan
    # the shuffle carries grouped partials, not raw rows: exchange keyed on
    # the group-by columns
    assert "Exchange hashpartitioning(l_returnflag" in plan


def test_sort_limit_is_top_k_not_global_sort(spark):
    plan = _plan(spark, "sort_limit")
    assert "TakeOrderedAndProject" in plan, plan[:1500]


def test_star_join_broadcasts_dims(spark):
    plan = _plan(spark, "star_join_revenue")
    assert "BroadcastHashJoin" in plan, plan[:2000]


def test_q7_both_nation_paths_broadcast(spark):
    plan = _plan(spark, "tpch_q7_nation_volume")
    # customer, supplier, and both nation aliases broadcast; no SMJ for dims
    assert plan.count("BroadcastHashJoin") >= 4, plan[:2500]


def test_null_safe_join_is_hash_not_nested_loop(spark):
    """eqNullSafe is a valid equi-join key: the plan must use a hash join,
    never BroadcastNestedLoopJoin (the O(n*m) trap)."""
    plan = _plan(spark, "null_safe_join")
    assert "NestedLoop" not in plan, plan[:2000]


def test_q18_having_subquery_single_lineitem_scan(spark):
    plan = _plan(spark, "tpch_q18_large_orders")
    assert plan.count("lineitem.parquet") == 1, "HAVING path must not rescan lineitem"


def test_no_hardcoded_broadcast_on_sf_scaling_dims():
    """customer/supplier/part grow linearly with scale factor: a hard-coded
    ``F.broadcast`` hint on them overrides the size threshold AND AQE's
    dynamic join selection, turning into an executor OOM at large SF.
    Hints are reserved for bounded relations (nation, region, 1-row
    scalar aggregates). Checked at the source level because AQE may still
    legitimately *choose* broadcast at small SF — the bug is the hint, not
    the physical join."""
    import inspect
    import re

    from pb_etl_spark.operators import composite, relational

    for mod in (composite, relational):
        src = inspect.getsource(mod)
        bad = re.findall(r"F\.broadcast\((?:cust|supp|part|brand_parts)\b", src)
        assert not bad, f"{mod.__name__}: broadcast hint on SF-scaling dim: {bad}"


def test_bucketed_join_has_no_shuffle(spark):
    """Both sides bucketed+sorted on the join key: the sort-merge join must
    read bucket i of each table directly — no ShuffleExchange (and no sort)
    on either input. Broadcast is disabled so the plan can't sidestep the
    bucketing; the one allowed exchange is the final group-by's."""
    from pb_etl_spark.operators.bucketing import bucketed_tables
    from pyspark.sql import functions as F

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders, cust = bucketed_tables(spark, SF_DIR)
        joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "Exchange" not in plan, plan[:2000]
        assert "Bucketed: true" in plan, plan[:2000]
        # note: a per-task Sort remains — each write task emits its own
        # file per bucket, so Spark cannot trust sortBy order across the
        # files of a bucket; eliminating the network exchange (not the
        # in-memory sort) is what matters at scale
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_runtime_bloom_filter_reaches_fact_scan(spark):
    """Runtime filtering: a selective predicate on the dim side of a
    shuffle join becomes a bloom_filter_agg whose result gates the fact
    scan (might_contain) — row-group skipping a 100 TB join needs. The
    size thresholds are lowered only to trigger the rewrite at fixture
    scale; the session enables the feature flag itself."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet").filter(
            F.col("o_totalprice") > 500000
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("l_returnflag")
            .count()
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE skew-join handling (enabled in the session): one hot key owning
    ~98% of the left side gets its partition SPLIT at runtime —
    SortMergeJoin(skew=true) with an 'AQEShuffleRead … skewed' input —
    instead of one straggler task. This is the first line of defense at
    100 TB; operators/skew.py's explicit salting covers the beyond-AQE
    cases (aggregations, pathological keys). Thresholds are shrunk only
    so the fixture-scale bytes qualify as 'skewed'."""
    from pyspark.sql import functions as F

    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "8KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        left = (
            spark.range(0, 51000)
            .withColumn(
                "k",
                F.when(F.col("id") < 50000, F.lit(0)).otherwise(F.col("id") % 100),
            )
            .withColumn("pay", F.md5(F.col("id").cast("string")))
        )
        right = (
            spark.range(0, 100)
            .withColumnRenamed("id", "k")
            .withColumn("attr", F.md5(F.col("k").cast("string")))
        )
        j = left.join(right, "k")
        assert len(j.collect()) == 51000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in old.items():
            if v is not None:
                spark.conf.set(k, v)


def test_dynamic_partition_pruning_reaches_fact_scan(spark):
    """The hot-day dim filter must inject a DynamicPruningExpression
    into the date-partitioned fact scan — only qualifying day
    directories are listed and read at runtime (the runtime sibling of
    the static partition filter asserted for partition_pruned_scan)."""
    from pb_etl_spark.operators.layout import q_dynamic_partition_pruning

    df = q_dynamic_partition_pruning(spark, SF_DIR)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan[:2000]


def test_vocab_drift_topk_is_take_ordered(spark):
    """Both G² faces' top-k must stay a TakeOrderedAndProject (per-
    partition heap + driver merge of k rows), never a global sort of
    the vocab — and the registered plan must read the ONE-shot
    checkpointed cells (Scan ExistingRDD), proving the corpus is
    exploded/shuffled once per run, not once per consumer (the r13
    review finding's fix)."""
    plan = _plan(spark, "vocab_drift")
    assert "TakeOrderedAndProject" in plan, plan[:1500]
    assert "Scan ExistingRDD" in plan  # the localCheckpointed cells


def test_dsir_weights_scoring_join_is_broadcast(spark):
    """DSIR's per-document scoring joins the corpus tokens against the
    bounded (≤N_DSIR_BUCKETS-row) log-ratio table — that side must
    BROADCAST; an SMJ here would shuffle the exploded corpus on the
    bucket id for nothing."""
    plan = _plan(spark, "dsir_weights")
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan
