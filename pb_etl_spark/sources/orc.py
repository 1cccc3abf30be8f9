"""ORC dataset source/sink — same contract as the parquet twin
(directory layout, `_SUCCESS` from the committer, explicit schema on
read when the dataset is untrusted).

ORC is the interchange format of the Hive/Trino world; an engine a
reference user migrates onto should read their existing ORC lakes
without a conversion pass. Spark's native reader gives the same
predicate pushdown / column pruning as parquet. (Avro is NOT wired:
spark-avro is an external module not present in this environment — a
clear ImportError-style failure beats a half-working path.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pb_etl_spark.sources.parquet import dataset_exists


def write_orc(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.orc(path)


def read_orc(
    spark: SparkSession,
    path: str,
    schema: T.StructType | None = None,
    require_flag: bool = True,
) -> DataFrame:
    """Guarded ORC read: refuse incomplete datasets, schema-on-read when
    provided (skips footer-merge inference across many files)."""
    if require_flag and not dataset_exists(path):
        raise FileNotFoundError(f"incomplete or missing ORC dataset: {path}")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.orc(path)
