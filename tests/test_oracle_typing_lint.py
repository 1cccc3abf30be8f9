"""Static typing lint over every registered DuckDB oracle.

Guards the round-5 failure class: DuckDB widens SUM(BIGINT) to HUGEINT
(and an un-cast integer VALUES list binds as INT32), pandas renders
HUGEINT as float64, and the driver's exact rendered-value hash then
compares ``123.0`` against Spark's int64 ``123`` and fails — 11 queries
shipped red for two rounds with numerically identical values.

``DESCRIBE <query>`` binds the query against the sf0.001 views without
executing it, so this covers all ~280 oracles in well under a second and
catches the class at authoring time instead of at the driver.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from pb_etl_spark.catalog import BENCH_TABLES
from pb_etl_spark.registry import all_oracles

SF_DIR = "/root/testdata/sf0.001"

#: DuckDB result types whose values are integers but which pandas renders
#: as float64, so they can never hash-match a Spark long column even when
#: every value is equal: HUGEINT (what SUM(BIGINT) widens to) and scale-0
#: DECIMAL (intentional wide-integer math left un-cast). Decimals with a
#: nonzero scale (quantile/epsilon literals like 0.95) render float64 on
#: BOTH engines and are fine.
_BANNED = re.compile(r"^(U?HUGEINT$|DECIMAL\(\d+,\s*0\))", re.IGNORECASE)


@pytest.fixture(scope="module")
def con() -> duckdb.DuckDBPyConnection:
    c = duckdb.connect()
    for t in BENCH_TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def _banned_columns(con: duckdb.DuckDBPyConnection, sql: str) -> list[str]:
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    return [
        f"{name}: {ctype}"
        for name, ctype, *_ in rows
        if _BANNED.match(ctype)
    ]


def test_lint_catches_the_fired_class(con):
    # The exact round-5 defect shape: a bare SUM over a BIGINT expression.
    bad = """
        SELECT o_custkey,
               SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS cents
        FROM orders GROUP BY 1
    """
    assert _banned_columns(con, bad) == ["cents: HUGEINT"]
    good = """
        SELECT o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders GROUP BY 1
    """
    assert _banned_columns(con, good) == []


def test_no_oracle_outputs_a_pandas_unrenderable_integer_type(con):
    offenders: dict[str, list[str]] = {}
    for name, sql in all_oracles().items():
        cols = _banned_columns(con, sql)
        if cols:
            offenders[name] = cols
    assert not offenders, (
        "oracles whose output columns DuckDB types as HUGEINT/DECIMAL "
        "(pandas renders these float64/object and the driver's exact "
        "value-hash can never match Spark's integer columns) — wrap the "
        f"aggregate in CAST(... AS BIGINT): {offenders}"
    )
