"""Custom Python DataSource (sources/pyds.py): partition planning and
row determinism — the connector contracts the oracle check can't see."""

from __future__ import annotations

from pb_etl_spark.sources.pyds import (
    DEFAULT_SLICES,
    SyntheticEventsReader,
    register,
    synth_event_row,
)


def test_partition_planning_covers_rows_exactly():
    r = SyntheticEventsReader({"rows": "1003", "slices": "8"})
    parts = r.partitions()
    assert len(parts) == 8
    covered = []
    for p in parts:
        covered.extend(range(p.start, p.end))
    assert covered == list(range(1003))  # no gap, no overlap


def test_rows_are_deterministic_functions_of_id():
    assert synth_event_row(0) == synth_event_row(0)
    r0, r1 = synth_event_row(0), synth_event_row(1)
    assert r0 != r1
    eid, user, etype, value = r0
    assert 0 <= user < 100 and etype in ("view", "click", "purchase")
    assert 0 <= value < 100


def test_read_through_spark_scans_in_parallel(spark):
    register(spark)
    df = spark.read.format("synthetic_events").option("rows", "64").load()
    assert df.rdd.getNumPartitions() == DEFAULT_SLICES
    rows = {r.event_id: (r.user_id, r.event_type, r.value) for r in df.collect()}
    assert len(rows) == 64
    assert rows[7] == synth_event_row(7)[1:]


def test_stream_batches_partition_the_id_space(spark):
    """Drain the streaming face with small batches: every id arrives
    exactly once (offset arithmetic has no gap/overlap across batches)."""
    register(spark)
    sdf = (
        spark.readStream.format("synthetic_events")
        .option("rows", "350")
        .option("batch_rows", "100")
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("t_pyds_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    ids = sorted(r.event_id for r in spark.table("t_pyds_stream").collect())
    assert ids == list(range(350))


def test_receipt_sink_two_phase_commit(spark, tmp_path):
    """Writer face: per-task tallies aggregate into one atomic driver-side
    receipt; totals equal the source's own aggregates."""
    import json

    register(spark)
    receipt = str(tmp_path / "receipt.json")
    df = spark.read.format("synthetic_events").option("rows", "500").load()
    expected = df.agg({"value": "sum"}).first()[0]
    df.write.format("receipt_sink").option("path", receipt).mode(
        "overwrite"
    ).save()
    got = json.load(open(receipt))
    assert got["n_rows"] == 500
    assert got["n_tasks"] >= 2  # parallel write tasks, merged at commit
    assert abs(got["value_sum"] - expected) < 1e-6
