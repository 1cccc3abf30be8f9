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
