"""Scale features: salted aggregation/join equivalence, bucketed
co-located joins (no shuffle in the plan), results sink + REST serving."""

from __future__ import annotations

import json
import urllib.request

import pytest
from pyspark.sql import functions as F

from pb_etl_spark.catalog import read_table
from tests.conftest import SF_DIR


def test_salted_groupby_equals_direct(spark):
    from pb_etl_spark.operators.skew import salted_groupby

    li = read_table(spark, SF_DIR, "lineitem")
    salted = salted_groupby(
        li,
        ["l_returnflag"],
        {
            "total_qty": ("l_quantity", "sum"),
            "n": ("l_quantity", "count"),
            "min_qty": ("l_quantity", "min"),
            "max_qty": ("l_quantity", "max"),
        },
    )
    direct = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("total_qty"),
        F.count("l_quantity").alias("n"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )
    s = {r["l_returnflag"]: (r["total_qty"], r["n"], r["min_qty"], r["max_qty"]) for r in salted.collect()}
    d = {r["l_returnflag"]: (r["total_qty"], r["n"], r["min_qty"], r["max_qty"]) for r in direct.collect()}
    assert s == d


def test_salted_join_equals_direct(spark):
    from pb_etl_spark.operators.skew import salted_join

    orders = read_table(spark, SF_DIR, "orders")
    cust = read_table(spark, SF_DIR, "customer").select("c_custkey", "c_mktsegment")
    salted = salted_join(orders, cust, "o_custkey", "c_custkey")
    direct = orders.join(cust, orders.o_custkey == cust.c_custkey)
    assert salted.count() == direct.count()
    s = salted.groupBy("c_mktsegment").count().collect()
    d = direct.groupBy("c_mktsegment").count().collect()
    assert {(r["c_mktsegment"], r["count"]) for r in s} == {
        (r["c_mktsegment"], r["count"]) for r in d
    }


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Pre-bucketing both sides on the join key co-locates matching rows:
    the join plan must contain no Exchange (the 100 TB co-located-join
    pattern; local twin of storage-partitioned joins)."""
    orders = read_table(spark, SF_DIR, "orders")
    li = read_table(spark, SF_DIR, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        li.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the non-broadcast path: the point is that bucketed SMJ
        # needs NO shuffle exchange (broadcast would mask it at this SF)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        j = spark.table("lineitem_b").join(
            spark.table("orders_b"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert j.count() == li.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_results_sink_and_rest(spark, tmp_path):
    from pb_etl_spark.sinks.results import ResultsServer, read_results, write_results

    report = spark.createDataFrame([(0.41, 0.39)], "expected double, actual double")
    db = str(tmp_path / "results.db")
    assert write_results(report, db) == 1
    # overwrite semantics: second load replaces, not appends (etl.py:33-39)
    assert write_results(report, db) == 1
    assert len(read_results(db)) == 1

    with ResultsServer(db) as srv:
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/api/results/") as r:
            data = json.loads(r.read())
        assert data == [{"expected": 0.41, "actual": 0.39}]
        # chart page (reference index.html parity): vega-lite bar spec with
        # the expected/actual values server-rendered
        with urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/") as r:
            assert r.headers["Content-Type"] == "text/html"
            html = r.read().decode()
        assert "vega-lite" in html and "Actual vs Forecast" in html
        assert '"name": "expected", "value": 0.41' in html
        assert '"name": "actual", "value": 0.39' in html
        with pytest.raises(urllib.error.HTTPError):
            urllib.request.urlopen(f"http://127.0.0.1:{srv.port}/nope")


def test_stratified_sample_fractions(spark):
    """Sampled class sizes must track the requested fractions (±50% rel
    tolerance at small SF) and be reproducible under the fixed seed."""
    from pb_etl_spark.operators.relational import q_stratified_sample

    want = {"O": 0.2, "F": 0.1, "P": 0.05}
    totals = {
        r["o_orderstatus"]: r["n"]
        for r in read_table(spark, SF_DIR, "orders")
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {r["o_orderstatus"]: r["n_sampled"] for r in q_stratified_sample(spark, SF_DIR).collect()}
    for status, frac in want.items():
        expect = totals[status] * frac
        assert got.get(status, 0) == pytest.approx(expect, rel=0.5), (status, got)
    again = {r["o_orderstatus"]: r["n_sampled"] for r in q_stratified_sample(spark, SF_DIR).collect()}
    assert got == again


def test_cluster_by_write_produces_disjoint_file_ranges(spark, tmp_path):
    """Range-clustered parquet files must carry disjoint min/max stats on
    the cluster key — the property that makes footer-level data skipping
    effective for selective predicates."""
    import glob

    import pyarrow.parquet as pq

    from pb_etl_spark.sources.parquet import write_parquet

    orders = read_table(spark, SF_DIR, "orders")
    path = str(tmp_path / "orders_clustered")
    write_parquet(
        orders.repartition(8), path, cluster_by=["o_orderkey"], n_files=6
    )
    ranges = []
    for f in glob.glob(f"{path}/part-*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index("o_orderkey")
        lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        ranges.append((lo, hi))
    assert len(ranges) > 1, "expected multiple output files"
    ranges.sort()
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert lo_next > hi_prev, f"overlapping file ranges: {ranges}"


def test_upsert_parquet_merge_semantics(spark, tmp_path):
    """MERGE/upsert: same-key rows replaced, new keys inserted, untouched
    rows survive, and the schema evolves additively; the swap is atomic
    (flag present after every version)."""
    from pb_etl_spark.sources.parquet import dataset_exists, upsert_parquet

    target = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "id long, name string, score double",
    )
    upsert_parquet(spark, target, base, "id")
    assert dataset_exists(target)

    updates = spark.createDataFrame(
        [(2, "b2", 21.0, "new"), (4, "d", 40.0, "new")],
        "id long, name string, score double, tag string",
    )
    upsert_parquet(spark, target, updates, "id")
    got = {r["id"]: (r["name"], r["score"], r["tag"]) for r in spark.read.parquet(target).collect()}
    assert got == {
        1: ("a", 10.0, None),
        2: ("b2", 21.0, "new"),
        3: ("c", 30.0, None),
        4: ("d", 40.0, "new"),
    }
    assert dataset_exists(target)


def test_upsert_single_writer_lock(spark, tmp_path):
    """A held lock must make a second upsert raise (single-writer
    contract); a stale lock from a crashed writer is broken; the lock is
    released after a successful run."""
    import os
    import time

    from pb_etl_spark.sources.parquet import upsert_parquet

    target = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a")], "id long, v string")
    lock = f"{target}__lock"

    with open(lock, "w") as f:
        f.write("999999")
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="locked by a concurrent writer"):
        upsert_parquet(spark, target, df, "id")
    assert os.path.exists(lock), "a live foreign lock must not be removed"

    # stale lock (older than the threshold) is broken and the upsert
    # runs; the rename-aside used for the atomic break and any asides
    # orphaned by previously crashed contenders are both cleaned up
    # (ADVICE r13: they accumulated forever on crash-prone targets)
    os.utime(lock, (time.time() - 7200, time.time() - 7200))
    orphan = f"{lock}.stale.deadbeef"
    with open(orphan, "w") as f:
        f.write("999998")
    upsert_parquet(spark, target, df, "id")
    assert not os.path.exists(lock), "lock must be released on success"
    import glob as _glob

    assert not _glob.glob(f"{lock}.stale.*"), (
        "rename-aside / orphaned stale locks must be deleted"
    )


def test_scd2_merge_tracks_history(spark):
    """SCD2: a changed key closes its current row at the update ts and
    opens a new one; unchanged and identical-attr keys are untouched;
    new keys open fresh; history rows are never modified."""
    from datetime import datetime

    from pb_etl_spark.operators.cdc import scd2_merge

    t0, t1, t2 = (
        datetime(2024, 1, 1),
        datetime(2024, 2, 1),
        datetime(2024, 3, 1),
    )
    far = datetime(9999, 12, 31, 23, 59, 59)
    dim = spark.createDataFrame(
        [
            (1, "alice", "NY", t0, t1, False),   # history row
            (1, "alice", "SF", t1, far, True),   # current
            (2, "bob", "LA", t0, far, True),     # current, will change
            (3, "carol", "TX", t0, far, True),   # current, identical update
        ],
        "id long, name string, city string, valid_from timestamp, "
        "valid_to timestamp, is_current boolean",
    )
    updates = spark.createDataFrame(
        [
            (2, "bob", "SEA", t2),     # change
            (3, "carol", "TX", t2),    # no-op (identical attrs)
            (4, "dave", "CHI", t2),    # brand-new key
        ],
        "id long, name string, city string, effective_ts timestamp",
    )
    out = scd2_merge(dim, updates, "id", attr_cols=["name", "city"])
    rows = {
        (r["id"], r["city"], r["is_current"]): (r["valid_from"], r["valid_to"])
        for r in out.collect()
    }
    assert len(rows) == 6
    assert rows[(1, "NY", False)] == (t0, t1)          # history untouched
    assert rows[(1, "SF", True)] == (t1, far)          # unchanged current
    assert rows[(2, "LA", False)] == (t0, t2)          # closed at update ts
    assert rows[(2, "SEA", True)] == (t2, far)         # new version
    assert rows[(3, "TX", True)] == (t0, far)          # identical → no-op
    assert rows[(4, "CHI", True)] == (t2, far)         # insert


def test_scd2_ignores_stale_updates(spark):
    """A late-arriving update with ts <= the current row's valid_from must
    be a no-op (applying it would invert the closed interval)."""
    from datetime import datetime

    from pb_etl_spark.operators.cdc import scd2_merge

    t0, t_old = datetime(2024, 2, 1), datetime(2024, 1, 15)
    far = datetime(9999, 12, 31, 23, 59, 59)
    dim = spark.createDataFrame(
        [(1, "x", t0, far, True)],
        "id long, v string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, "stale", t_old)], "id long, v string, effective_ts timestamp"
    )
    out = scd2_merge(dim, updates, "id", attr_cols=["v"]).collect()
    assert len(out) == 1
    assert out[0]["v"] == "x" and out[0]["is_current"]


def test_scd2_null_ts_update_cannot_drop_row(spark):
    """Regression: an update with a NULL timestamp and DIFFERING attrs made
    `applied` evaluate to SQL NULL, excluding the current row from both
    filter(applied) and filter(~applied) — the dimension row vanished.
    NULL-ts updates must be treated as stale (ignored)."""
    from datetime import datetime

    from pb_etl_spark.operators.cdc import scd2_merge

    t0 = datetime(2024, 2, 1)
    far = datetime(9999, 12, 31, 23, 59, 59)
    dim = spark.createDataFrame(
        [(1, "x", t0, far, True)],
        "id long, v string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    updates = spark.createDataFrame(
        [(1, "changed", None)], "id long, v string, effective_ts timestamp"
    )
    out = scd2_merge(dim, updates, "id", attr_cols=["v"]).collect()
    assert len(out) == 1
    assert out[0]["v"] == "x" and out[0]["is_current"]


def test_upsert_rejects_duplicate_update_keys(spark, tmp_path):
    from pb_etl_spark.sources.parquet import upsert_parquet

    ups = spark.createDataFrame([(1, "a"), (1, "b")], "id long, v string")
    with pytest.raises(ValueError, match="multiple rows"):
        upsert_parquet(spark, str(tmp_path / "t"), ups, "id")


def test_salted_join_rejects_outer(spark):
    from pb_etl_spark.operators.skew import salted_join

    orders = read_table(spark, SF_DIR, "orders")
    cust = read_table(spark, SF_DIR, "customer")
    with pytest.raises(ValueError, match="inner"):
        salted_join(orders, cust, "o_custkey", "c_custkey", how="full_outer")


def test_dynamic_partition_pruning_on_partitioned_writes(spark, tmp_path):
    """Partitioned writes + a filtered dim join must produce a
    dynamicpruning partition filter on the fact scan: at 100 TB this is
    the difference between scanning one partition directory and all of
    them. (Requires a real filter on the dim side — a bare join never
    triggers DPP.)"""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR

    path = str(tmp_path / "part_orders")
    spark.read.parquet(f"{SF_DIR}/orders.parquet").write.partitionBy(
        "o_orderstatus"
    ).parquet(path)
    fact = spark.read.parquet(path)
    dim = spark.createDataFrame(
        [("F", "keep"), ("O", "drop"), ("P", "drop")],
        "o_orderstatus string, tag string",
    )
    j = fact.join(dim.filter(F.col("tag") == "keep"), "o_orderstatus").agg(
        F.sum("o_totalprice").alias("s")
    )
    j.write.format("noop").mode("overwrite").save()
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), plan
    # and the pruned read is correct
    expected = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_orderstatus") == "F")
        .agg(F.sum("o_totalprice"))
        .first()[0]
    )
    assert abs(j.first()["s"] - expected) < 1e-6


def test_runtime_bloom_filter_prunes_shuffle_join(spark):
    """Runtime bloom-filter join pruning (on by default; gated by a 10 GB
    application-side scan threshold — exactly the 100 TB regime, so at
    real scale it engages untouched). Lower the gate to demonstrate on
    fixture data: the selective dim side must inject a bloom_filter_agg /
    might_contain pair into the fact scan of a SHUFFLE join, and the
    result must match the unpruned plan."""
    from pyspark.sql import functions as F

    from tests.conftest import SF_DIR

    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet").filter(
        F.col("p_retailprice") > 1900
    )
    overrides = {
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    # conf.get returns size values with a trailing 'b' ("10737418240b")
    # that conf.set refuses to parse back — strip it; unset confs → None
    def _norm(v):
        if v is None:
            return None
        return v[:-1] if v.endswith("b") and v[:-1].isdigit() else v

    prev = {k: _norm(spark.conf.get(k, None)) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        j = li.join(part, li.l_partkey == part.p_partkey).agg(
            F.count(F.lit(1)).alias("n")
        )
        pruned = j.first()["n"]
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "bloom_filter_agg" in plan or "might_contain" in plan.lower(), plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    unpruned = (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(F.count(F.lit(1)).alias("n"))
        .first()["n"]
    )
    assert pruned == unpruned


def test_binaryfile_ingest_covers_exactly_the_materialized_docs(spark):
    from pb_etl_spark.operators.multimodal import BIN_DOCS, q_binaryfile_ingest

    rows = q_binaryfile_ingest(spark, SF_DIR).collect()
    assert len(rows) == BIN_DOCS
    assert {r.doc_id for r in rows} == set(range(BIN_DOCS))
    assert all(r.n_bytes > 0 for r in rows)


def test_event_pattern_counts_nest(spark):
    """The immediate-run pattern is a strict subset of the eventual
    funnel; all patterns share one user universe."""
    from pb_etl_spark.operators.events import q_event_pattern_match

    rows = {r.pattern: r for r in q_event_pattern_match(spark, SF_DIR).collect()}
    assert rows["immediate_vcp"].n_matching <= rows["eventual_funnel"].n_matching
    universes = {r.n_users for r in rows.values()}
    assert len(universes) == 1


def test_stream_ddsketch_matches_batch_extraction_on_same_hist(spark):
    """The streaming sketch must answer exactly what a batch sketch
    over the same values answers — state-merged cells are the same
    cells."""
    from pyspark.sql import functions as F

    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.events import q_stream_ddsketch_quantiles
    from pb_etl_spark.operators.retrieval import (
        dd_bucket_expr,
        dd_quantiles_from_hist,
    )

    streamed = {
        r.q: r for r in q_stream_ddsketch_quantiles(spark, SF_DIR).collect()
    }
    ev = read_table(spark, SF_DIR, "events").select(
        F.round(F.col("value") * 100).cast("long").alias("cents")
    )
    hist = ev.groupBy(dd_bucket_expr(F.col("cents")).alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    batch = {r.q: r for r in dd_quantiles_from_hist(spark, hist).collect()}
    assert set(streamed) == set(batch)
    for q in batch:
        assert (streamed[q].bucket, streamed[q].est_price, streamed[q].n_rows) == (
            batch[q].bucket,
            batch[q].est_price,
            batch[q].n_rows,
        )


def test_curriculum_buckets_matches_ntile_on_non_multiple_count(spark, tmp_path):
    """r13 review finding: the old bin formula floor((pos-1)k/n)+1 is
    the Bresenham EVEN spread, which diverges from NTILE's front-loaded
    split whenever n mod k >= 2 — and every fixture doc count is a
    multiple of 10, so the tri-scale oracle check could never see it.
    Pin the query against DuckDB NTILE on a 497-doc corpus."""
    import duckdb

    from tests.conftest import SF_DIR

    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.corpus import q_curriculum_buckets

    n = 497  # 497 % 10 == 7: seven front-loaded big buckets under NTILE
    sub = str(tmp_path / "documents.parquet")
    read_table(spark, SF_DIR, "documents").filter(
        F.col("doc_id") < n
    ).coalesce(1).write.parquet(sub)

    got = {
        r["bin"]: (r["n_docs"], r["min_tokens"], r["max_tokens"], r["bin_tokens"])
        for r in q_curriculum_buckets(spark, str(tmp_path)).collect()
    }
    con = duckdb.connect()
    want = {
        int(b): (int(nd), int(mn), int(mx), int(bt))
        for b, nd, mn, mx, bt in con.execute(f"""
            WITH binned AS (
                SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
                       NTILE(10) OVER (ORDER BY len(string_split(text, ' ')) ASC,
                                       doc_id ASC) AS bin
                FROM '{sub}/*.parquet'
            )
            SELECT bin, COUNT(*), MIN(n_tokens), MAX(n_tokens),
                   CAST(SUM(n_tokens) AS BIGINT)
            FROM binned GROUP BY bin
        """).fetchall()
    }
    con.close()
    assert got == want
    # the front-loading signature itself: first n mod k buckets are big
    sizes = [got[b][0] for b in sorted(got)]
    assert sizes == [50] * 7 + [49] * 3


def test_twap_zero_duration_user_is_null_on_both_engines(spark, tmp_path):
    """r13 review finding: a user whose intervals all have zero
    duration (colliding timestamps) hit 0/0 — NaN on Spark, NULL on
    DuckDB — the exact engine divergence the module guards elsewhere.
    Both legs must now emit NULL for that user."""
    import datetime as dt

    import duckdb

    from pb_etl_spark.operators.timeseries import q_twap_user_value
    from pb_etl_spark.registry import all_oracles
    from pb_etl_spark.streaming.windows import EVENTS_SCHEMA

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # user 1: two events at the IDENTICAL timestamp -> dt_ms = 0
        (1, t0, 1, "view", 10.0, "{}"),
        (2, t0, 1, "click", 20.0, "{}"),
        # user 2: a normal pair one minute apart
        (3, t0, 2, "view", 10.0, "{}"),
        (4, t0 + dt.timedelta(minutes=1), 2, "click", 30.0, "{}"),
    ]
    # write micros (the fixture format): the session default INT96
    # would be reported as 'ns' by the footer probe and then fail the
    # LongType nanos read loudly
    prev = spark.conf.get("spark.sql.parquet.outputTimestampType")
    spark.conf.set("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    try:
        spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.parquet(
            str(tmp_path / "events.parquet")
        )
    finally:
        spark.conf.set("spark.sql.parquet.outputTimestampType", prev)
    got = {r["user_id"]: r["twap_value"] for r in q_twap_user_value(spark, str(tmp_path)).collect()}
    assert got[1] is None, "zero-duration user must be NULL, not NaN"
    assert got[2] == 10.0  # value 10 held for the whole interval

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{tmp_path}/events.parquet/*.parquet'"
    )
    want = {
        int(u): v
        for u, _n, v in con.execute(all_oracles()["twap_user_value"]).fetchall()
    }
    con.close()
    assert want[1] is None and want[2] == 10.0
    assert got == want
