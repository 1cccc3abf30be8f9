"""Every registered query must hash-match its DuckDB oracle at sf0.001 —
the local twin of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR


def _all_names():
    from pb_etl_spark.registry import all_oracles

    return sorted(all_oracles())


@pytest.mark.parametrize("name", _all_names())
def test_query_matches_oracle(spark, duck, name):
    import sys

    sys.path.insert(0, "tools")
    from check_oracle import compare

    from pb_etl_spark.registry import all_oracles, all_queries

    sdf = all_queries()[name](spark, SF_DIR).toPandas()
    odf = duck.execute(all_oracles()[name]).fetchdf()
    problems = compare(name, sdf, odf)
    assert not problems, problems


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert set(df.columns) == {"r_name", "revenue", "n_orders"}


def test_registry_contract():
    """Every oracle key has a query; names are unique; callables import."""
    from pb_etl_spark.registry import all_oracles, all_queries

    q, o = all_queries(), all_oracles()
    assert set(o) <= set(q)
    assert len(q) >= 25
