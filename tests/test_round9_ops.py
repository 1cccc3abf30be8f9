"""Semantic invariants for the round-9 additions: the keyed
``grouped_running_sum`` primitive (low-cardinality-group cumsums with
|partitions| parallelism), the exact grouped-quantile family built on
it, the re-shaped ``weighted_median_by_group`` (pre-compaction before
the keyed window), and the bounded ``_scan_width`` re-probe — the
properties the oracle hash can't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from tests.conftest import SF_DIR


def _plain_window_cumsum(df, group_cols, order_cols, value_col):
    """The semantically-equivalent single-task-per-group reference."""
    w = (
        W.partitionBy(*group_cols)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wt = W.partitionBy(*group_cols)
    return df.withColumn("cum", F.sum(value_col).over(w).cast("long")).withColumn(
        "gtot", F.sum(value_col).over(wt).cast("long")
    )


def test_grouped_running_sum_matches_keyed_window(spark):
    """Frame-equality against the plain keyed window on the orders
    fact — every row's inclusive cumsum and group total must agree."""
    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.corpus import grouped_running_sum

    o = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderdate",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    got = grouped_running_sum(
        spark, o, ["o_orderpriority"], ["o_orderdate", "o_orderkey"], "cents"
    )
    want = _plain_window_cumsum(
        o, ["o_orderpriority"], ["o_orderdate", "o_orderkey"], "cents"
    )
    assert got.drop("_gr_all").exceptAll(want).count() == 0
    assert want.exceptAll(got.drop("_gr_all")).count() == 0
    # the emitted gtot column is the same grand total per group, and
    # _gr_all the grand total over everything
    exact = {
        (r["o_orderpriority"],): r["t"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.sum("cents").alias("t"))
        .collect()
    }
    totals = {
        (r["o_orderpriority"],): r["gtot"]
        for r in got.select("o_orderpriority", "gtot").distinct().collect()
    }
    assert totals == exact
    alls = got.select("_gr_all").distinct().collect()
    assert len(alls) == 1 and alls[0][0] == sum(exact.values())


def test_grouped_running_sum_is_partition_count_invariant(spark):
    """The driver prefix-sum stitching must give identical results under
    a different range-partition width (different pid boundaries)."""
    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.corpus import grouped_running_sum

    o = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        narrow = grouped_running_sum(
            spark, o, ["o_orderpriority"], ["o_orderkey"], "cents"
        )
        narrow_rows = narrow.collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    wide = grouped_running_sum(
        spark, o, ["o_orderpriority"], ["o_orderkey"], "cents"
    )
    assert sorted(map(tuple, narrow_rows)) == sorted(map(tuple, wide.collect()))


def test_grouped_running_sum_parallelism_is_not_group_bound(spark):
    """The whole point of the primitive: the cumsum must NOT hash the
    fact onto the |groups|-value key. No exchange in the plan may
    hashpartition on the group column alone, and the keyed window must
    ride the range partitioning (pid + group key)."""
    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.corpus import grouped_running_sum

    o = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    got = grouped_running_sum(
        spark, o, ["o_orderpriority"], ["o_orderkey"], "cents"
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning(o_orderpriority" in plan, plan
    lines = plan.splitlines()
    for i, line in enumerate(lines):
        if "hashpartitioning(o_orderpriority" in line and "pid" not in line:
            # the bounded counts-leg offsets window legitimately
            # re-clusters its ≤|partitions|+|groups|-row aggregate by
            # group (r15 one-action form) — recognizable by the
            # _rs_-prefixed aggregate feeding the exchange
            child = "\n".join(lines[i + 1 : i + 3])
            if "_rs_" in child:
                continue
            pytest.fail(f"group-keyed hash exchange in plan: {line.strip()}")


def test_weighted_median_window_consumes_compacted_frame(spark):
    """The r08 verdict's fix contract: the keyed cumsum window must sit
    ABOVE the (flag, cents) compaction aggregate, so the per-group sort
    input is the bounded price grid, never the raw fact."""
    from pb_etl_spark.operators.advanced import q_weighted_median_by_group

    out = q_weighted_median_by_group(spark, SF_DIR)
    plan = out._jdf.queryExecution().executedPlan().toString()
    win = plan.find("Window")
    assert win != -1, plan
    below = plan[win:]
    assert "HashAggregate" in below and "cents" in below.split("HashAggregate")[1], (
        "window input is not the (flag, cents) compaction:\n" + plan
    )


def test_grouped_quantiles_p50_equals_weighted_median(spark):
    """The family must degenerate to the already-proven member: the p50
    row per group IS the weighted median."""
    from pb_etl_spark.operators.advanced import (
        q_grouped_quantiles_exact,
        q_weighted_median_by_group,
    )

    p50 = {
        r["l_returnflag"]: r["q_cents"]
        for r in q_grouped_quantiles_exact(spark, SF_DIR)
        .filter(F.col("quantile") == "p50")
        .collect()
    }
    med = {
        r["l_returnflag"]: r["wmedian_cents"]
        for r in q_weighted_median_by_group(spark, SF_DIR).collect()
    }
    assert p50 == med


def test_grouped_quantiles_are_monotone_and_minimal(spark):
    """p25 ≤ p50 ≤ p75 ≤ p90 per group, and each quantile value is
    MINIMAL: the next-lower distinct cents must fail the integer rule."""
    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.advanced import (
        QUANTILE_FRACS,
        q_grouped_quantiles_exact,
    )

    rows = q_grouped_quantiles_exact(spark, SF_DIR).collect()
    by_flag: dict[str, dict[str, int]] = {}
    for r in rows:
        by_flag.setdefault(r["l_returnflag"], {})[r["quantile"]] = r["q_cents"]
    for flag, qs in by_flag.items():
        assert qs["p25"] <= qs["p50"] <= qs["p75"] <= qs["p90"], (flag, qs)

    li = (
        read_table(spark, SF_DIR, "lineitem")
        .select(
            "l_returnflag",
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("cents"),
            F.col("l_quantity").cast("long").alias("qty"),
        )
        .toPandas()
    )
    for flag, qs in by_flag.items():
        grp = li[li["l_returnflag"] == flag]
        total = int(grp["qty"].sum())
        for lbl, num, den in QUANTILE_FRACS:
            v = qs[lbl]
            mass_incl = int(grp.loc[grp["cents"] <= v, "qty"].sum())
            assert mass_incl * den >= num * total, (flag, lbl)
            lower = grp.loc[grp["cents"] < v, "cents"]
            if len(lower):
                mass_below = int(grp.loc[grp["cents"] <= lower.max(), "qty"].sum())
                assert mass_below * den < num * total, (flag, lbl)


def test_grouped_running_sum_multi_column_groups(spark):
    """A two-column group key must stitch exactly like the
    single-column case (the offsets broadcast-join is keyed on the full
    (pid, group...) tuple since r15) — frame-equal to the plain keyed
    window, gtot keyed by the full tuple."""
    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.corpus import grouped_running_sum

    o = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_orderstatus",
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    got = grouped_running_sum(
        spark,
        o,
        ["o_orderpriority", "o_orderstatus"],
        ["o_orderkey"],
        "cents",
    )
    want = _plain_window_cumsum(
        o, ["o_orderpriority", "o_orderstatus"], ["o_orderkey"], "cents"
    )
    assert got.drop("_gr_all").exceptAll(want).count() == 0
    assert want.exceptAll(got.drop("_gr_all")).count() == 0
    exact = {
        (r["o_orderpriority"], r["o_orderstatus"]): r["t"]
        for r in o.groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.sum("cents").alias("t"))
        .collect()
    }
    totals = {
        (r["o_orderpriority"], r["o_orderstatus"]): r["gtot"]
        for r in got.select("o_orderpriority", "o_orderstatus", "gtot")
        .distinct()
        .collect()
    }
    assert totals == exact


def test_grouped_running_sum_rejects_unsafe_group_keys(spark):
    """Unsafe group-key TYPES (doubles, booleans — the documented
    low-cardinality-key contract) are rejected eagerly at build time;
    NULL group values raise the contract error at ACTION time (r15: the
    validation moved in-plan with the one-action reformulation — a bare
    NULL would otherwise miss the offsets join and corrupt cum/gtot).
    Keys containing \\x1f now WORK — the old reserved-separator
    restriction existed only for the retired string-encoded literal
    maps; the broadcast join keys on the actual columns."""
    from pb_etl_spark.operators.corpus import grouped_running_sum

    bad_type = spark.createDataFrame([(1.5, 1, 1)], "g double, o long, v long")
    with pytest.raises(TypeError, match="only string/integer/date"):
        grouped_running_sum(spark, bad_type, ["g"], ["o"], "v")
    null_key = spark.createDataFrame(
        [(None, 1, 1)], "g string, o long, v long"
    )
    with pytest.raises(Exception, match="NULL"):
        grouped_running_sum(spark, null_key, ["g"], ["o"], "v").collect()
    sep_key = spark.createDataFrame(
        [("a\x1fb", 1, 1)], "g string, o long, v long"
    )
    out = grouped_running_sum(spark, sep_key, ["g"], ["o"], "v").collect()
    assert [(r["cum"], r["gtot"]) for r in out] == [(1, 1)]


def test_exact_stratified_split_hits_quotas_exactly(spark):
    """Per source: |train| == floor(n·8/10), |val| == floor(n/10),
    |test| == the remainder; the three parts partition the source
    (disjoint and complete). Bernoulli samplers only do this in
    expectation — exactness is the op's contract."""
    from pb_etl_spark.operators.corpus import q_exact_stratified_split

    rows = q_exact_stratified_split(spark, SF_DIR).collect()
    by_src: dict[str, dict[str, int]] = {}
    seen = set()
    for r in rows:
        assert (r["source"], r["pos"]) not in seen
        seen.add((r["source"], r["pos"]))
        counts = by_src.setdefault(r["source"], {"train": 0, "val": 0, "test": 0})
        counts[r["split"]] += 1
    assert by_src, "no sources"
    for src, c in by_src.items():
        n = c["train"] + c["val"] + c["test"]
        assert c["train"] == n * 8 // 10, (src, c)
        assert c["val"] == n // 10, (src, c)
        assert c["test"] == n - n * 8 // 10 - n // 10, (src, c)


def test_gini_by_group_matches_pandas_model_and_bounds(spark):
    """Per-nation Gini must equal the rank-formula computed directly in
    pandas over the same spend table, and every coefficient must sit in
    [0, 1) (0 = perfectly equal, →1 = one whale takes all)."""
    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.affinity import q_gini_by_group

    got = {
        r["c_nationkey"]: (r["n_customers"], r["total_cents"], r["gini"])
        for r in q_gini_by_group(spark, SF_DIR).collect()
    }
    orders = (
        read_table(spark, SF_DIR, "orders")
        .selectExpr("o_custkey", "CAST(ROUND(o_totalprice * 100) AS LONG) AS cents")
        .groupBy("o_custkey")
        .agg(F.sum("cents").alias("cents"))
        .toPandas()
    )
    cust = (
        read_table(spark, SF_DIR, "customer")
        .select("c_custkey", "c_nationkey")
        .toPandas()
    )
    spend = orders.merge(cust, left_on="o_custkey", right_on="c_custkey")
    for nk, grp in spend.groupby("c_nationkey"):
        xs = sorted(zip(grp["cents"], grp["o_custkey"]))
        n, total = len(xs), int(grp["cents"].sum())
        pos_cents = sum((i + 1) * c for i, (c, _) in enumerate(xs))
        want = round((2.0 * pos_cents - (n + 1) * float(total)) / (n * float(total)), 6)
        assert got[nk] == (n, total, want), nk
        assert 0.0 <= got[nk][2] < 1.0, nk


def test_migrated_queries_have_no_group_keyed_window_exchange(spark):
    """The three r09 migrations (seq_packing, top_p_quality_sample,
    quantile_normalize) must no longer hash the documents fact onto
    their low-cardinality group column for the cumsum/rank window — the
    only group-keyed hash exchange allowed is the pid-salted one
    grouped_running_sum builds."""
    from pb_etl_spark.operators.corpus import (
        q_seq_packing,
        q_top_p_quality_sample,
    )
    from pb_etl_spark.operators.reshape import q_quantile_normalize

    for fn, key in [
        (q_seq_packing, "source"),
        (q_top_p_quality_sample, "lang"),
        (q_quantile_normalize, "source"),
    ]:
        plan = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        for line in plan.splitlines():
            if f"hashpartitioning({key}" in line and "pid" not in line:
                pytest.fail(f"{fn.__name__}: group-keyed exchange: {line.strip()}")


def test_scan_width_reprobe_is_bounded(spark, tmp_path, monkeypatch):
    """When the listStatus URI forms mismatch and the file set is large,
    _scan_width must degrade to the warned file-count estimate instead
    of issuing one getFileStatus RPC per file (ADVICE r08)."""
    from pb_etl_spark.operators import retrieval

    p = tmp_path / "t"
    spark.range(10).write.parquet(str(p))
    df = spark.read.parquet(str(p))
    real = df.inputFiles()
    phantom_dir = tmp_path / "elsewhere"
    phantom_dir.mkdir()
    fake = list(real) + [f"file:{phantom_dir}/missing.parquet"]
    monkeypatch.setattr(type(df), "inputFiles", lambda self: fake)
    monkeypatch.setattr(retrieval, "_REPROBE_MAX", 0)
    with pytest.warns(RuntimeWarning, match="re-probe"):
        assert retrieval._scan_width(spark, df) == len(fake)
