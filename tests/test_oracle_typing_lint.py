"""Static typing lint over every registered DuckDB oracle.

Guards the HUGEINT arm of the round-5 failure class: DuckDB widens
SUM(BIGINT) to HUGEINT, pandas renders HUGEINT as float64, and the
driver's exact rendered-value hash then compares ``123.0`` against
Spark's int64 ``123`` and fails — 11 queries shipped red for two rounds
with numerically identical values.

``DESCRIBE <query>`` binds the query against the sf0.001 views without
executing it, so this covers all ~280 oracles in well under a second and
catches the class at authoring time instead of at the driver.

SCOPE: this lint bans only types pandas can NEVER render as an integer
(HUGEINT/UHUGEINT and scale-0 DECIMAL). The other r05 arm — an un-cast
integer VALUES list binding as INT32 against a Spark int64 column
(roc_curve_points) — is NOT statically detectable here, because a
blanket INTEGER ban would false-positive the ~14 oracles where int32 is
the correct rendered dtype on both engines (e.g. l_linenumber). That
arm is covered at runtime by check_oracle.py's dtype_mismatches(),
which fails any rendered int-width difference.
"""

from __future__ import annotations

import os
import re
import sys

import duckdb
import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from check_oracle import duck_con  # noqa: E402
from pb_etl_spark.registry import all_oracles  # noqa: E402

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
    # one source of truth for the view bootstrap: the twin's own
    return duck_con(SF_DIR)


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
