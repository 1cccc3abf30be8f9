"""Driver contract for the spark-graft builder (PySpark target).

Delegates to pb_etl_spark.registry: every implemented operator from
SURVEY.md §2 (plus the training-data-pipeline extension surface) is exposed
as a (spark, sf_dir) -> DataFrame callable with a matching DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: star-schema revenue by
    region (lineitem⋈orders⋈customer⋈nation⋈region → grouped agg)."""
    from pb_etl_spark.operators.relational import q_star_join_revenue

    return q_star_join_revenue(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from pb_etl_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from pb_etl_spark.registry import all_oracles

    return all_oracles()
