"""JSON-lines dataset source/sink.

Beyond-reference surface (the reference is CSV/Parquet-only,
/root/reference/pb_etl/luigi/dask/target.py:200-213): event feeds and
document dumps arrive as JSONL in practice. Same contract as the other
sources: explicit schema (no inference pass — at 100 TB schema inference
is a full extra read), directory-of-files layout, ``_SUCCESS`` from the
committer on write.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> DataFrame:
    """Read newline-delimited JSON under ``path`` with a declared schema.
    Malformed rows land in PERMISSIVE nulls rather than failing the scan."""
    return spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = "gzip",
    partition_by: list[str] | None = None,
) -> None:
    """Write newline-delimited JSON (gzip by default — JSONL is verbose;
    at rest it should never travel uncompressed)."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.json(path)
