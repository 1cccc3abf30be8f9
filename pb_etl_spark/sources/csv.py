"""CSV directory source (SURVEY.md §2.1 S1-S3).

Reads every ``*.csv`` under a dataset directory with a declared StructType —
schema-on-read with enforcement, not inference (reference semantics:
/root/reference/pb_etl/luigi/dask/target.py:210-213 reads ``{path}/*.csv``
with a dtype dict; call sites tasks.py:168-178,219-228,414-418).

At scale: an explicit schema skips the inference pass (which reads the data
twice), and Spark parallelizes the scan across files/blocks for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv_dataset(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
) -> DataFrame:
    """Read all ``*.csv`` files under ``path`` as one DataFrame."""
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("mode", "PERMISSIVE")
        .csv(f"{path.rstrip('/')}/*.csv")
    )
