"""Streaming extras: dedup-within-watermark, stream-static join,
foreachBatch parquet sink."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from pb_etl_spark.catalog import read_table
from tests.conftest import SF_DIR


@pytest.fixture()
def dup_events_dir(tmp_path, spark):
    """Events dir where every event appears twice (two files)."""
    d = tmp_path / "dups"
    d.mkdir()
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), d / "a.parquet")
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), d / "b.parquet")
    return str(d)


def test_dedup_within_watermark(spark, dup_events_dir):
    from pb_etl_spark.streaming.windows import (
        dedup_within_watermark,
        read_event_stream,
        run_to_memory,
    )

    out = run_to_memory(
        dedup_within_watermark(read_event_stream(spark, dup_events_dir)),
        "t_dedup",
        output_mode="append",
    )
    n_unique = read_table(spark, SF_DIR, "events").count()
    assert out.count() == n_unique
    assert out.select("event_id").distinct().count() == n_unique


def test_stream_static_join(spark, tmp_path):
    from pb_etl_spark.streaming.windows import (
        read_event_stream,
        run_to_memory,
        stream_static_enrich,
    )

    d = tmp_path / "ev"
    d.mkdir()
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), d / "a.parquet")
    users = (
        read_table(spark, SF_DIR, "events")
        .select("user_id")
        .distinct()
        .withColumn("tier", F.when(F.col("user_id") % 2 == 0, "even").otherwise("odd"))
    )
    out = run_to_memory(
        stream_static_enrich(read_event_stream(spark, str(d)), users),
        "t_enrich",
        output_mode="append",
    )
    assert out.count() == read_table(spark, SF_DIR, "events").count()
    assert out.filter(F.col("tier").isNull()).count() == 0


def test_foreach_batch_parquet_sink(spark, tmp_path):
    from pb_etl_spark.streaming.windows import read_event_stream, write_parquet_stream

    d = tmp_path / "ev"
    d.mkdir()
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), d / "a.parquet")
    out_dir = str(tmp_path / "out")
    q = write_parquet_stream(
        read_event_stream(spark, str(d)), out_dir, str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    written = spark.read.parquet(out_dir)
    assert written.count() == read_table(spark, SF_DIR, "events").count()
    assert "ts" in written.columns


def test_stream_stream_join(spark, tmp_path):
    """Stream-stream range join must equal the identical batch join on the
    same bounded input (click ⋈ view per user within 1 hour back)."""
    from pb_etl_spark.streaming.windows import (
        read_event_stream,
        run_to_memory,
        stream_stream_join,
    )

    d = tmp_path / "ev"
    d.mkdir()
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), d / "a.parquet")
    stream = read_event_stream(spark, str(d))
    clicks = stream.filter(F.col("event_type") == "click")
    views = stream.filter(F.col("event_type") == "view")
    out = run_to_memory(
        stream_stream_join(clicks, views), "t_ssj", output_mode="append"
    )

    ev = read_table(spark, SF_DIR, "events")
    bc = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    bv = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    batch = bc.join(
        bv,
        F.expr(
            "c_user = v_user AND view_ts <= click_ts "
            "AND view_ts >= click_ts - INTERVAL 1 HOUR"
        ),
    )
    assert out.count() == batch.count() > 0
    s = {(r["click_id"], r["view_id"]) for r in out.collect()}
    b = {(r["click_id"], r["view_id"]) for r in batch.collect()}
    assert s == b


def test_jsonl_roundtrip_and_partitioned_write(spark, tmp_path):
    """JSONL sink→source round-trip preserves values under the declared
    schema; a partitioned write produces prunable directories."""
    from pyspark.sql import types as T

    from pb_etl_spark.sources.json import read_jsonl, write_jsonl

    orders = read_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    path = str(tmp_path / "orders_jsonl")
    write_jsonl(orders, path, partition_by=["o_orderstatus"])

    schema = T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_totalprice", T.DoubleType()),
        ]
    )
    back = read_jsonl(spark, path, schema)
    assert back.count() == orders.count()
    # partition column comes back from the directory layout, pruned reads work
    pruned = spark.read.schema(schema).json(path + "/o_orderstatus=F")
    n_f = orders.filter(F.col("o_orderstatus") == "F").count()
    assert pruned.count() == n_f
    assert (
        back.agg(F.round(F.sum("o_totalprice"), 2).alias("s")).collect()[0]["s"]
        == orders.agg(F.round(F.sum("o_totalprice"), 2).alias("s")).collect()[0]["s"]
    )


def test_checkpoint_restart_is_exactly_once(spark, tmp_path):
    """Restarting the parquet-sink stream with the same checkpoint after
    new input arrives must process ONLY the new file — no reprocessing,
    no duplicates (exactly-once across restarts)."""
    from pb_etl_spark.streaming.windows import write_parquet_stream

    src = tmp_path / "src"
    src.mkdir()
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    ev = read_table(spark, SF_DIR, "events")  # ts already nanos→timestamp
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)
    half1.coalesce(1).write.parquet(str(src / "batch1"))

    def stream():
        return spark.readStream.schema(ev.schema).option(
            "recursiveFileLookup", "true"
        ).parquet(str(src))

    # run 1: sees only batch1
    q = write_parquet_stream(stream(), out_dir, ckpt)
    q.awaitTermination()
    assert spark.read.parquet(out_dir).count() == half1.count()

    # new data lands; run 2 with the SAME checkpoint
    half2.coalesce(1).write.parquet(str(src / "batch2"))
    q = write_parquet_stream(stream(), out_dir, ckpt)
    q.awaitTermination()
    out = spark.read.parquet(out_dir)
    assert out.count() == ev.count()
    assert out.select("event_id").distinct().count() == ev.count()


def test_stream_upsert_maintains_latest_table(spark, tmp_path):
    """Streaming CDC into a parquet table: after draining the stream, the
    target holds exactly one row per user — the latest event — and a
    second batch of newer events updates in place."""
    from pb_etl_spark.streaming.windows import read_event_stream, stream_upsert_parquet

    src = tmp_path / "src"
    src.mkdir()
    target = str(tmp_path / "latest_by_user")
    ev = read_table(spark, SF_DIR, "events")
    shutil.copy(os.path.join(SF_DIR, "events.parquet"), src / "a.parquet")

    q = stream_upsert_parquet(
        read_event_stream(spark, str(src)),
        target,
        key="user_id",
        ts_col="ts",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    got = spark.read.parquet(target)
    n_users = ev.select("user_id").distinct().count()
    assert got.count() == n_users

    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    want = (
        ev.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )
    g = {r["user_id"]: r["ts"] for r in got.collect()}
    e = {r["user_id"]: r["ts"] for r in want.collect()}
    assert g == e


def test_stateful_op_identical_under_rocksdb_state_store(spark):
    """The at-scale state backend: RocksDB state store (bounded memory,
    incremental checkpoints) must produce the same drained state as the
    default HDFS-backed provider for the custom stateful operator.
    State-backend choice is a deployment knob, never a semantics change."""
    from pb_etl_spark.streaming.windows import (
        read_event_stream,
        run_to_memory,
        user_totals_stateful,
    )
    from tests.conftest import SF_DIR

    key = "spark.sql.streaming.stateStore.providerClass"
    default = spark.conf.get(key)
    rocks = (
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    )

    def drain(name):
        sdf = read_event_stream(spark, SF_DIR, glob="events.parquet")
        out = run_to_memory(
            user_totals_stateful(sdf), name, output_mode="update"
        )
        return {
            r.user_id: (r.n_events, r.total_value) for r in out.collect()
        }

    base = drain("t_state_default")
    try:
        spark.conf.set(key, rocks)
        got = drain("t_state_rocksdb")
    finally:
        spark.conf.set(key, default)
    assert got == base and len(got) > 0


def test_stream_doc_queries_run_genuinely_stateful(spark):
    """The document-stream queries must execute as stateful streaming
    (state-store-backed aggregation / dedup), not a batch fallback —
    asserted from the drained query's stateOperators progress, the
    plan-level audit test_plan_lint cannot do for stream_* entries."""
    from pb_etl_spark.operators.events import _read_doc_stream
    from pyspark.sql import functions as F
    from tests.conftest import SF_DIR

    cases = {
        "t_docstate_agg": (
            _read_doc_stream(spark, SF_DIR)
            .groupBy("source")
            .agg(F.count(F.lit(1)).alias("n_docs")),
            "complete",
        ),
        "t_docstate_dedup": (
            _read_doc_stream(spark, SF_DIR)
            .select(F.md5("text").alias("fp"))
            .dropDuplicates(["fp"]),
            "append",
        ),
    }
    for name, (sdf, mode) in cases.items():
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.awaitTermination()
            progress = q.lastProgress
        finally:
            q.stop()
        ops = progress["stateOperators"]
        assert ops, f"{name}: no state operators — ran as stateless?"
        assert any(o["numRowsTotal"] > 0 for o in ops), ops


def test_stream_drift_monitor_equals_batch_gate(spark):
    """The streaming drift monitor's drained state must yield the exact
    same KS/MWU statistics as the batch ks_mann_whitney gate — the
    property that lets the batch oracle stand in for the stream."""
    from tests.conftest import SF_DIR

    from pb_etl_spark.operators.events import q_stream_drift_monitor
    from pb_etl_spark.operators.selection import q_ks_mann_whitney

    got = q_stream_drift_monitor(spark, SF_DIR).collect()
    want = q_ks_mann_whitney(spark, SF_DIR).collect()
    assert len(got) == len(want) == 1
    assert got[0].asDict() == want[0].asDict()


def test_stream_psi_monitor_equals_batch_gate(spark):
    """The streaming PSI monitor's drained cells must yield the exact
    same per-bucket terms and total as the batch psi_drift gate — the
    property that lets the batch oracle stand in for the stream."""
    from tests.conftest import SF_DIR

    from pb_etl_spark.operators.events import q_stream_psi_monitor
    from pb_etl_spark.operators.selection import q_psi_drift

    got = {r["bucket"]: r.asDict() for r in q_stream_psi_monitor(spark, SF_DIR).collect()}
    want = {r["bucket"]: r.asDict() for r in q_psi_drift(spark, SF_DIR).collect()}
    assert got == want and -1 in got


def test_stream_psi_monitor_state_is_bucket_bounded(spark):
    """The streaming PSI gate's 100 TB claim rests on its state being
    the compacted cells frame, not the corpus: drain the cells
    aggregate and assert the state store holds exactly one row per
    distinct value bucket — orders of magnitude below the event count —
    so state stays bounded however many micro-batches arrive."""
    from pyspark.sql import functions as F

    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.selection import PSI_BUCKET_WIDTH
    from pb_etl_spark.streaming.windows import read_event_stream
    from tests.conftest import SF_DIR

    sdf = read_event_stream(spark, SF_DIR, glob="events.parquet")
    cells = (
        sdf.select(
            F.floor(F.col("value") / PSI_BUCKET_WIDTH).alias("bucket"),
            F.when(F.dayofmonth("ts") <= 15, 1).otherwise(0).alias("in_a"),
        )
        .groupBy("bucket")
        .agg(F.sum("in_a").alias("n_a"), F.sum(1 - F.col("in_a")).alias("n_b"))
    )
    q = (
        cells.writeStream.format("memory")
        .queryName("t_psi_state_bound")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination()
        progress = q.lastProgress
    finally:
        q.stop()
    ev = read_table(spark, SF_DIR, "events")
    n_buckets = (
        ev.select(F.floor(F.col("value") / PSI_BUCKET_WIDTH).alias("b"))
        .distinct()
        .count()
    )
    n_events = ev.count()
    state_rows = sum(o["numRowsTotal"] for o in progress["stateOperators"])
    assert state_rows == n_buckets, (state_rows, n_buckets)
    assert state_rows < n_events / 10, "state should be sketch-sized"


def test_stream_vocab_drift_equals_batch_gate(spark):
    """The streaming Dunning-G² monitor's drained cells must yield the
    exact same top-k drift report as the batch vocab_drift gate — the
    property that lets the batch oracle stand in for the stream (both
    route through selection.vocab_drift_from_cells, so equality here
    pins the cells compaction, not just the shared scalar math)."""
    from tests.conftest import SF_DIR

    from pb_etl_spark.operators.events import q_stream_vocab_drift
    from pb_etl_spark.operators.selection import q_vocab_drift

    got = [r.asDict() for r in q_stream_vocab_drift(spark, SF_DIR).collect()]
    want = [r.asDict() for r in q_vocab_drift(spark, SF_DIR).collect()]
    assert got == want
    assert got, "fixture must produce a drift report"


def test_stream_vocab_drift_state_is_vocab_bounded(spark):
    """The streaming G² gate's scale claim: state is one row per
    DISTINCT token (Heaps-law sublinear), not per token occurrence.
    Drain the cells aggregate and assert the state equals the distinct
    token count and sits far below total occurrences."""
    from pyspark.sql import functions as F

    from pb_etl_spark.catalog import read_table
    from pb_etl_spark.operators.corpus import _tokens
    from pb_etl_spark.operators.events import _read_doc_stream
    from tests.conftest import SF_DIR

    sdf = _read_doc_stream(spark, SF_DIR)
    tok = sdf.select(
        (F.col("doc_id") % 2 == 1).alias("is_new"),
        F.explode(_tokens()).alias("w"),
    )
    cells = tok.groupBy("w").agg(
        F.sum(F.when(F.col("is_new"), 1).otherwise(0)).alias("k11"),
        F.sum(F.when(~F.col("is_new"), 1).otherwise(0)).alias("k12"),
    )
    q = (
        cells.writeStream.format("memory")
        .queryName("t_vocab_state_bound")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    state_rows = spark.table("t_vocab_state_bound").count()
    doc = read_table(spark, SF_DIR, "documents")
    n_distinct = doc.select(F.explode(_tokens()).alias("w")).select("w").distinct().count()
    n_occurrences = doc.select(F.explode(_tokens()).alias("w")).count()
    assert state_rows == n_distinct
    assert state_rows < n_occurrences / 10
