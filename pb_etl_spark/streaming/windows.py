"""Structured Streaming operators over the events stream: tumbling /
sliding / session windows with watermarked late-data handling, plus a
custom stateful operator via ``applyInPandasWithState``.

The window expressions are shared with their batch twins in
``pb_etl_spark.operators.events`` — ``F.window`` / ``F.session_window``
compute identically over a bounded input, which is how the batch oracle
validates the streaming semantics (tests assert stream == batch on the
same fixture).

Scale/runtime posture: watermarks bound state (late rows beyond the
watermark are dropped, closed windows are evicted); aggregation state lives
in the state store partitioned by group key, so throughput scales with
executors exactly like a batch shuffle.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


def events_nanos_schema() -> "T.StructType":
    """EVENTS_SCHEMA with ``ts`` as raw INT64 — the only schema Spark
    4.x can use to scan TIMESTAMP(NANOS) parquet (PARQUET_TYPE_ILLEGAL
    otherwise). ONE definition for batch and stream (r13 review: the
    rewrite was copy-pasted in catalog.read_events_parquet and
    read_event_stream — a future decode fix would have had to land in
    both or batch and stream silently diverge)."""
    return T.StructType(
        [
            f if f.name != "ts" else T.StructField("ts", T.LongType())
            for f in EVENTS_SCHEMA.fields
        ]
    )


def decode_nanos_ts(df: DataFrame) -> DataFrame:
    """Raw INT64 nanos -> TimestampType micros. Integer ``div``, not
    ``/``: nanos ≈ 1.7e18 exceed double's exact range (2^53); the
    truncation direction matches DuckDB's."""
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def read_event_stream(
    spark: SparkSession,
    events_dir: str,
    glob: str | None = None,
    ts_unit: str | None = None,
) -> DataFrame:
    """File-source stream over a directory of event parquet files
    (``glob`` narrows to matching files — the source requires a directory
    base path). The ``ts`` storage unit is autodetected from the parquet
    footer (``ts_unit`` overrides): TIMESTAMP(MICROS) files stream with
    the native schema; TIMESTAMP(NANOS) files — which Spark 4.x cannot
    scan as timestamps under a vanilla session — are read as raw INT64
    via a LongType schema and truncated to micros here (integer ``div``,
    not ``/``: nanos exceed double's exact integer range)."""
    if ts_unit is None:
        from pb_etl_spark.catalog import parquet_ts_unit

        ts_unit = parquet_ts_unit(events_dir, glob_pat=glob)
    schema = events_nanos_schema() if ts_unit == "ns" else EVENTS_SCHEMA
    reader = spark.readStream.schema(schema)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    sdf = reader.parquet(events_dir)
    if ts_unit == "ns":
        sdf = decode_nanos_ts(sdf)
    return sdf


def tumbling_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Tumbling 1-hour counts per event type (streaming twin of
    operators.events.q_tumbling_window)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def ohlc_hourly_stream(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming OHLC candlestick downsample (twin of
    timeseries.q_ohlc_hourly): open/close picked with min_by/max_by on
    the (ts, event_id) struct — ORDER-FREE declarative aggregates, so
    they stream (a row_number window would not); identical tie-break to
    the batch twin's (ts, event_id) row_number. Volume sums on the
    integer-cents grid, making the whole row exact cross-engine."""
    key = F.struct(F.col("ts"), F.col("event_id"))
    cents = F.round(F.col("value") * 100).cast("long")
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.min_by("value", key).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max_by("value", key).alias("close"),
            (F.sum(cents).cast("double") / F.lit(100.0)).alias("volume"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "open",
            "high",
            "low",
            "close",
            "volume",
            "n_events",
        )
    )


def sliding_counts(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Sliding 1h/30min counts (streaming twin of q_sliding_window)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


def session_counts(events: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes") -> DataFrame:
    """Per-user session windows with an inactivity gap (streaming twin of
    q_session_window)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
        )
    )


# --- custom stateful operator ---------------------------------------------

USER_TOTALS_SCHEMA = "user_id bigint, n_events bigint, total_value double"
_STATE_SCHEMA = "n bigint, total double"


def _user_totals_fn(key, pdf_iter, state) -> Iterator:
    """Running per-user totals — arbitrary stateful logic the built-in
    aggs can't express is written exactly like this (Arrow-batched pandas,
    explicit GroupState)."""
    import pandas as pd

    n, total = state.get() if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
    )


def user_totals_stateful(events: DataFrame) -> DataFrame:
    """Custom stateful streaming operator: cumulative per-user event count
    and value total via applyInPandasWithState (update mode)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _user_totals_fn,
        outputStructType=USER_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


USER_STATS_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, max_value double"
)
_TWS_STATE_SCHEMA = "n bigint, total double, mx double"


def _tws_available() -> bool:
    """transformWithStateInPandas talks to the JVM state server over
    protobuf; environments without google.protobuf crash the driver
    worker at init (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def _user_stats_fallback_fn(key, pdf_iter, state) -> Iterator:
    """applyInPandasWithState twin of UserStats — same (count, total,
    max) per-key state, same output rows."""
    import pandas as pd

    n, total, mx = state.get() if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 6)],
            "max_value": [round(mx, 6)],
        }
    )


def user_stats_tws(events: DataFrame) -> DataFrame:
    """Custom stateful operator on Spark 4's transformWithState API —
    the successor to applyInPandasWithState (`user_totals_stateful`):
    typed per-key state handles (ValueState here; List/MapState for
    bounded buffers), explicit init/close lifecycle, timers, and TTL.
    State lives in the state store exactly as with the older API, so the
    scale story is unchanged: partitioned by key, bounded per key, no
    driver involvement.

    transformWithState requires google.protobuf in the Python runtime
    (the state server protocol); where that's absent this transparently
    degrades to an applyInPandasWithState implementation with identical
    semantics, so the query stays runnable (and oracle-checkable) in
    minimal environments.
    """
    if not _tws_available():
        from pyspark.sql.streaming.state import GroupStateTimeout

        return events.groupBy("user_id").applyInPandasWithState(
            _user_stats_fallback_fn,
            outputStructType=USER_STATS_SCHEMA,
            stateStructType=_TWS_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", _TWS_STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as pd

            n, total, mx = (
                self._agg.get() if self._agg.exists() else (0, 0.0, float("-inf"))
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                mx = max(mx, float(pdf["value"].max()))
            self._agg.update((n, total, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 6)],
                    "max_value": [round(mx, 6)],
                }
            )

        def close(self) -> None:
            pass

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=UserStats(),
        outputStructType=USER_STATS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


def dedup_within_watermark(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Streaming exact dedup on event_id: state is bounded by the
    watermark (duplicates arriving later than the watermark are not
    caught — the documented trade for bounded state at scale)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def stream_static_enrich(events: DataFrame, user_dim: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with a static dimension
    (broadcast per micro-batch — no stream-side state)."""
    return events.join(F.broadcast(user_dim), "user_id", "left")


def stream_stream_join(
    clicks: DataFrame,
    views: DataFrame,
    watermark: str = "30 minutes",
    join_horizon: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner join with a bounded event-time range: a click
    joins views by the same user within the preceding ``join_horizon``.

    Both sides are watermarked, and the range condition lets the state
    store evict buffered rows once the watermark passes the horizon —
    without it, stream-stream join state grows forever.
    """
    c = clicks.withWatermark("ts", watermark).select(
        F.col("user_id").alias("c_user"),
        F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    v = views.withWatermark("ts", watermark).select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("view_ts"),
        F.col("event_id").alias("view_id"),
    )
    return c.join(
        v,
        F.expr(
            f"""
            c_user = v_user AND
            view_ts <= click_ts AND
            view_ts >= click_ts - INTERVAL {join_horizon}
            """
        ),
    )


def write_parquet_stream(sdf: DataFrame, out_dir: str, checkpoint_dir: str):
    """foreachBatch parquet sink with real exactly-once semantics: each
    micro-batch overwrites its own ``batch_id=N`` directory, so a batch
    replayed after a crash-before-checkpoint rewrites the same path instead
    of appending duplicates (plain append would be at-least-once).
    Readers see one dataset via partition discovery on ``out_dir``."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/batch_id={batch_id}")

    return (
        sdf.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_upsert_parquet(
    sdf: DataFrame,
    target: str,
    key: str,
    ts_col: str,
    checkpoint_dir: str,
):
    """Streaming CDC ingestion: each micro-batch is compacted to its
    latest row per key (ties broken arbitrarily-but-deterministically by
    the window order) and MERGEd into the parquet target via
    ``upsert_parquet`` — the continuously-maintained 'silver table'
    pattern. Replayed batches re-apply the same merge (same keys, same
    rows), so the sink is idempotent across restarts."""
    from pyspark.sql.window import Window as W

    from pb_etl_spark.sources.parquet import upsert_parquet

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        # tiebreak by every remaining column: orderBy(ts) alone leaves
        # equal-timestamp rows to task ordering, and a replayed batch
        # could then merge a DIFFERENT row — breaking idempotency
        tiebreak = [
            F.col(c).desc()
            for c in sorted(batch_df.columns)
            if c not in (key, ts_col)
        ]
        w = W.partitionBy(key).orderBy(F.col(ts_col).desc(), *tiebreak)
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        upsert_parquet(batch_df.sparkSession, target, latest, key)

    return (
        sdf.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


# State-store width for SKETCH-SIZED streaming state (the monitor
# family: drift/PSI/G²/DDSketch cells — state is ≤ |distinct cells|
# rows, bounded by value-domain or Heaps-law-sublinear, NEVER
# data-proportional). Each state partition costs per-micro-batch
# overhead that is independent of its content (a state-store instance,
# its checkpoint delta file, a task): r14 measured the same
# complete-mode cells drain at 1.1-1.4 s with 32 state partitions vs
# 0.6-0.7 s with 8/2 at sf0.1. The right width scales with STATE size,
# not cluster size, so a small constant is correct at any data volume —
# 8 keeps a million-token vocab state at ~125k tiny rows per store.
SKETCH_STATE_PARTITIONS = 8


def run_to_memory(
    sdf: DataFrame,
    name: str,
    output_mode: str,
    state_partitions: int | None = None,
) -> "DataFrame":
    """Drain all available input into an in-memory table; returns the
    result table. Test/dev helper — production sinks are parquet/kafka via
    the same writeStream call.

    State-partition discipline: a NEW stateful streaming query fixes its
    state-store count from ``spark.sql.shuffle.partitions`` at start (AQE
    is disabled for stateful workloads, so nothing coalesces it later).
    Under a default 200-partition session every stateful op pays 200
    state stores per micro-batch — measured 39 s for the stream-stream
    join on a vanilla session vs ~4 s with a core-count-sized setting. A
    streaming job should size state partitions explicitly; pin them for
    the drain and restore the caller's conf after. ``state_partitions``
    overrides the data-proportional default for queries whose state is
    sketch-sized (see ``SKETCH_STATE_PARTITIONS``)."""
    spark = sdf.sparkSession
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    target = state_partitions or min(32, spark.sparkContext.defaultParallelism)
    try:
        spark.conf.set(key, str(target))
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(key, prev)
    return spark.table(name)
