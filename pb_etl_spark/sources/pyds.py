"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic synthetic-events generator.

The reference wires five fixed named sources into its catalog
(/root/reference/pb_etl/tasks.py, the external-source table); this is the
Spark-4-native way to add a NEW kind of source to the same catalog —
a first-class connector with schema, partition planning, and option
handling, written in pure Python and registered per-session
(``spark.dataSource.register``). The obvious production uses are
API-backed sources (REST pages → InputPartitions) and generators like
this one (load tests, fixture synthesis, property tests).

Design notes:
- **Partition planning is the scale story**: ``partitions()`` returns one
  ``InputPartition`` per row-range slice, so a 10¹²-row synthetic table
  generates in parallel across the cluster — the driver never touches
  row data (same contract as any JDBC/warehouse connector).
- **Determinism**: every field is a pure function of the row id (md5-
  based, same construction as the engine's hash-sampling operators), so
  the SAME table is reproducible in the DuckDB oracle — the registered
  query value-checks a custom connector end-to-end, which file-based
  fixtures cannot do for this API.
- The reader emits tuples per the declared schema; Spark handles Arrow
  batching. Python-side generation cost is the documented trade — a
  generator source exists for correctness/ergonomics, not as a parquet
  replacement.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

SYNTH_EVENT_TYPES = ("view", "click", "purchase")
DEFAULT_ROWS = 1000
DEFAULT_SLICES = 8


def _u32(tag: str, i: int) -> int:
    """First 8 hex chars of md5('{tag}:{i}') — the engine's standard
    engine-portable uniform hash (cf. weighted_hash_sample)."""
    return int(hashlib.md5(f"{tag}:{i}".encode()).hexdigest()[:8], 16)


def synth_event_row(i: int) -> tuple:
    """The row for id ``i`` — shared by the reader and tests; the DuckDB
    oracle reproduces the same fields from the same md5 math."""
    user_id = _u32("u", i) % 100
    etype = SYNTH_EVENT_TYPES[_u32("t", i) % len(SYNTH_EVENT_TYPES)]
    value = round((_u32("v", i) % 10_000) / 100.0, 2)
    return (i, user_id, etype, value)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", DEFAULT_ROWS))
        self.n_slices = int(options.get("slices", DEFAULT_SLICES))

    def partitions(self) -> Sequence[InputPartition]:
        step = max(1, -(-self.n_rows // self.n_slices))
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        for i in range(partition.start, partition.end):
            yield synth_event_row(i)


class SyntheticEventsStreamReader(SimpleDataSourceStreamReader):
    """Offset-managed micro-batch source: the stream's offset is simply
    the next row id ({"next": i}), advanced by ``batch_rows`` per
    micro-batch up to ``rows`` total. Because ``readBetweenOffsets``
    regenerates any (start, end) slice deterministically, a batch
    replayed after a crash yields IDENTICAL rows — the replayability
    contract exactly-once sinks (foreachBatch upsert, batch_id
    overwrite) build on. ``commit`` is a no-op: nothing to clean up for
    a generator (a queue-backed source would ack here)."""

    def __init__(self, options):
        self.n_rows = int(options.get("rows", DEFAULT_ROWS))
        self.batch_rows = int(options.get("batch_rows", 100))

    def initialOffset(self) -> dict:
        return {"next": 0}

    def read(self, start: dict):
        lo = start["next"]
        hi = min(lo + self.batch_rows, self.n_rows)
        return (
            iter([synth_event_row(i) for i in range(lo, hi)]),
            {"next": hi},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([synth_event_row(i) for i in range(start["next"], end["next"])])


class SyntheticEventsDataSource(DataSource):
    """``spark.read.format("synthetic_events").option("rows", N)`` —
    batch scan with planned partitions, or ``spark.readStream`` for the
    offset-managed micro-batch stream."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return "event_id bigint, user_id bigint, event_type string, value double"

    def reader(self, schema) -> SyntheticEventsReader:
        return SyntheticEventsReader(self.options)

    def simpleStreamReader(self, schema) -> SyntheticEventsStreamReader:
        return SyntheticEventsStreamReader(self.options)


class _ReceiptCommit(WriterCommitMessage):
    def __init__(self, n_rows: int, value_sum: float):
        self.n_rows, self.value_sum = n_rows, value_sum


class ReceiptSinkWriter(DataSourceWriter):
    """Two-phase commit demo: each task's ``write`` tallies its partition
    and returns a commit message; the DRIVER's ``commit`` — called only
    once every task succeeded — writes a single JSON receipt atomically
    (tmp + rename). A task retry's duplicate tally is discarded with its
    failed attempt (Spark only forwards messages from committed task
    attempts), and ``abort`` leaves no receipt: readers of the receipt
    see all-or-nothing, the same contract a real table sink's manifest
    commit provides."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("receipt_sink requires .option('path', ...)")

    def write(self, iterator) -> _ReceiptCommit:
        n, s = 0, 0.0
        for row in iterator:
            n += 1
            s += float(row.value or 0.0)
        return _ReceiptCommit(n, s)

    def commit(self, messages) -> None:
        import json
        import os

        receipt = {
            "n_rows": sum(m.n_rows for m in messages),
            "value_sum": round(sum(m.value_sum for m in messages), 6),
            "n_tasks": len(messages),
        }
        tmp = f"{self.path}.tmp"
        with open(tmp, "w") as f:
            json.dump(receipt, f)
        os.replace(tmp, self.path)

    def abort(self, messages) -> None:
        import os

        if os.path.exists(f"{self.path}.tmp"):
            os.unlink(f"{self.path}.tmp")


class ReceiptSinkDataSource(DataSource):
    """``df.write.format("receipt_sink").option("path", p).save()`` —
    writes an aggregate receipt, not the rows (the write-side accounting
    pattern of ``write_parquet(observe=...)``, expressed as a connector)."""

    @classmethod
    def name(cls) -> str:
        return "receipt_sink"

    def writer(self, schema, overwrite: bool) -> ReceiptSinkWriter:
        return ReceiptSinkWriter(self.options)


def register(spark) -> None:
    """Idempotent per-session registration."""
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(ReceiptSinkDataSource)


Q_ROWS = 2000


def q_python_datasource(spark, sf_dir: str):
    """End-to-end through the custom connector: read Q_ROWS synthetic
    events via the registered Python DataSource (8 parallel range
    partitions) and aggregate per event type. The oracle regenerates the
    identical table from the same md5 row function over generate_series —
    value-checking the connector's schema, partitioning, and row
    production, not just its plumbing. (``sf_dir`` unused: the source IS
    the data.)"""
    from pyspark.sql import functions as F

    register(spark)
    ev = spark.read.format("synthetic_events").option("rows", Q_ROWS).load()
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count_distinct("user_id").alias("n_users"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def q_stream_python_datasource(spark, sf_dir: str):
    """The custom connector's STREAMING face: drain the offset-managed
    synthetic_events micro-batch stream (4 batches of 500) into a memory
    sink and aggregate — after a full drain the result equals the batch
    read of the same id range, which the same DuckDB regeneration
    oracle-checks. Covers initialOffset/read/readBetweenOffsets offset
    arithmetic end-to-end (a gap or overlap between batches would break
    the value hash)."""
    from pyspark.sql import functions as F

    register(spark)
    sdf = (
        spark.readStream.format("synthetic_events")
        .option("rows", Q_ROWS)
        .option("batch_rows", Q_ROWS // 4)
        .load()
    )
    q = (
        sdf.writeStream.format("memory")
        .queryName("q_stream_python_datasource")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return (
        spark.table("q_stream_python_datasource")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


QUERIES = {
    "python_datasource": q_python_datasource,
    "stream_python_datasource": q_stream_python_datasource,
}

_SYNTH_AGG_ORACLE = f"""
        WITH ids AS (SELECT unnest(generate_series(0, {Q_ROWS - 1})) AS i),
        rows_ AS (
            SELECT
                CAST('0x' || substring(md5('u:' || i), 1, 8) AS BIGINT) % 100
                    AS user_id,
                CASE (CAST('0x' || substring(md5('t:' || i), 1, 8) AS BIGINT) % 3)
                    WHEN 0 THEN 'view' WHEN 1 THEN 'click' ELSE 'purchase'
                END AS event_type,
                ROUND((CAST('0x' || substring(md5('v:' || i), 1, 8) AS BIGINT)
                       % 10000) / 100.0, 2) AS value
            FROM ids
        )
        SELECT event_type, COUNT(*) AS n_events,
               COUNT(DISTINCT user_id) AS n_users,
               ROUND(SUM(value), 2) AS total_value
        FROM rows_ GROUP BY event_type
"""

ORACLES: dict[str, str] = {
    # batch and stream faces of the connector must both equal the same
    # regenerated table after a full drain — one oracle, two queries
    "python_datasource": _SYNTH_AGG_ORACLE,
    "stream_python_datasource": _SYNTH_AGG_ORACLE,
}
