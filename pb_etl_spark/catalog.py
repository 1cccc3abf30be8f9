"""Table catalog + path resolution.

Two families of tables:

1. Reference-parity CSV sources — five named CSV datasets under a root that
   an env var can redirect (parity with the reference's ``FINAL_PROJ_BUCKET``
   override, /root/reference/pb_etl/tasks.py:100-111 and its five source
   subclasses tasks.py:114-149).
2. The synthetic benchmark tables (TESTDATA.md): one parquet dataset per
   table under an sf directory.

Everything returns DataFrames lazily — no data moves until an action.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from pb_etl_spark import schemas
from pb_etl_spark.sources.csv import read_csv_dataset

# Env var that redirects the external-data root (reference tasks.py:105).
DATA_ROOT_ENV = "PB_ETL_SPARK_DATA_ROOT"
DEFAULT_DATA_ROOT = "./data/external"

# Named external CSV sources: name -> (subpath, schema)
# (reference tasks.py:114-149: TrnAttr/TrnTscore/TstAttr/TstTscore/BackTestRslt).
EXTERNAL_SOURCES = {
    "train_attr": ("train/attr", schemas.ATTR_SCHEMA),
    "train_tscore": ("train/tscore", schemas.TSCORE_SCHEMA),
    "test_attr": ("test/attr", schemas.TEST_ATTR_SCHEMA),
    "test_tscore": ("test/tscore", schemas.TSCORE_SCHEMA),
    "actuals": ("results", schemas.ACTUALS_SCHEMA),
}

BENCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def data_root() -> str:
    """External-data root; env override mirrors reference tasks.py:103-106."""
    return os.environ.get(DATA_ROOT_ENV, DEFAULT_DATA_ROOT)


def read_external(spark: SparkSession, name: str, root: str | None = None) -> DataFrame:
    """Read one of the five named external CSV datasets with declared schema."""
    subpath, schema = EXTERNAL_SOURCES[name]
    base = root if root is not None else data_root()
    return read_csv_dataset(spark, f"{base.rstrip('/')}/{subpath}", schema)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic benchmark table (parquet) from an sf directory.

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark 4.x cannot infer
    natively (PARQUET_TYPE_ILLEGAL). Reading with an explicit user schema
    that declares ``ts`` as LongType sidesteps inference entirely — the
    physical type is INT64, so the scan succeeds under ANY SparkSession, no
    ``spark.sql.legacy.parquet.nanosAsLong`` conf required (same pattern as
    ``streaming.windows.read_event_stream``). The raw nanos are truncated
    to microseconds — the same truncation DuckDB applies — so both engines
    see identical timestamp values.
    """
    path = f"{sf_dir.rstrip('/')}/{name}.parquet"
    if name == "events":
        from pyspark.sql import functions as F

        from pb_etl_spark.streaming.windows import EVENTS_SCHEMA

        nanos_schema = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.LongType())
                for f in EVENTS_SCHEMA.fields
            ]
        )
        df = spark.read.schema(nanos_schema).parquet(path)
        # integer `div`, not `/`: nanos ≈ 1.7e18 exceeds double's exact
        # integer range (2^53), float division is off by ±1 µs
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every benchmark table as a temp view for spark.sql use."""
    for name in BENCH_TABLES:
        read_table(spark, sf_dir, name).createOrReplaceTempView(name)
