"""operators/money.py — the exact integer-grid money layer.

Round 10's ×10 value sweep caught ROUND(SUM(double_product), 2) money
aggregates drifting one cent between Spark and DuckDB (tpch_q1/q5/q7/q9).
These tests pin the replacement layer: integer half-away-from-zero cent
rounding (both dialects), sign handling on negative totals, the 2^53
loudness guard, and Spark↔DuckDB bit-equality of the emitted dollars on
adversarial magnitudes (including past 2^53, where the correctly-rounded
casts must still agree).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from pb_etl_spark.operators import money

# (e4-unit total, expected dollars) — ties round half AWAY FROM ZERO
E4_CASES = [
    (12345, 1.23),  # plain
    (12350, 1.24),  # positive tie → up
    (-12350, -1.24),  # negative tie → down (away from zero)
    (-12345, -1.23),
    (49, 0.0),  # sub-half-cent → zero
    (50, 0.01),
    (-50, -0.01),
    (0, 0.0),
    # NOTE: totals whose CENT value exceeds 2^53 are deliberately absent
    # here — the dollars() guard raises on them (tested below); the
    # pre-rounding e4 total may exceed 2^53 freely (decimal arithmetic)
    (2**55 + 12350, (2**55 // 100 + 124) / 100.0),
]


def test_cents_of_sum_rounds_half_away_from_zero(spark):
    df = spark.createDataFrame([(int(s),) for s, _ in E4_CASES], "s long")
    out = df.select(
        "s",
        money.dollars(
            money.cents_of_sum(F.col("s").cast("decimal(38,0)"), money.E4)
        ).alias("v"),
    )
    got = {r["s"]: r["v"] for r in out.collect()}
    for s, want in E4_CASES:
        assert got[s] == pytest.approx(want, abs=0.0), (s, got[s], want)


def test_sql_leg_matches_spark_leg_rowwise(spark):
    """The DuckDB-dialect emitter must produce BIT-IDENTICAL doubles to
    the Spark emitter for the same integer totals — including totals
    whose cent value exceeds 2^53-representable dollars only before
    rounding."""
    vals = [s for s, _ in E4_CASES]
    df = spark.createDataFrame([(int(s),) for s in vals], "s long")
    spark_out = {
        r["s"]: r["v"]
        for r in df.select(
            "s",
            money.dollars(
                money.cents_of_sum(F.col("s").cast("decimal(38,0)"), money.E4)
            ).alias("v"),
        ).collect()
    }
    con = duckdb.connect()
    expr = money.sql_dollars(money.sql_cents_of_sum("s", money.E4))
    for s in vals:
        duck = con.execute(
            f"SELECT {expr} FROM (SELECT CAST({s} AS HUGEINT) AS s)"
        ).fetchone()[0]
        assert duck == spark_out[s], (s, duck, spark_out[s])


def test_floor_lift_equals_round_lift_on_every_fixture_grid_value(spark):
    """cents() uses FLOOR(x*100+0.5) for codegen speed; it must recover
    the same integer as ROUND(x*100) on every actual grid value in the
    fixture — including NEGATIVE balances, where floor vs round
    semantics could diverge off-grid."""
    from pb_etl_spark.catalog import read_table
    from tests.conftest import SF_DIR

    for table, col in [
        ("lineitem", "l_extendedprice"),
        ("lineitem", "l_discount"),
        ("lineitem", "l_tax"),
        ("customer", "c_acctbal"),  # negative values present
        ("orders", "o_totalprice"),
    ]:
        df = read_table(spark, SF_DIR, table)
        bad = df.filter(
            money.cents(F.col(col)) != F.round(F.col(col) * 100).cast("long")
        ).count()
        assert bad == 0, f"{table}.{col}: floor lift diverges on {bad} rows"


def test_money_sum_aggregates_exactly(spark):
    """money_sum over rows == the python integer model, and the decimal
    widening means no silent int64 wrap on per-row products."""
    rows = [(101_00, 93), (250_75, 100), (999_99, 87)]  # (cents, 100-d)
    df = spark.createDataFrame(rows, "c long, m long")
    total = sum(c * m for c, m in rows)
    want = (abs(total) + 50) // 100 / 100.0
    got = df.agg(
        money.money_sum(F.col("c") * F.col("m"), money.E4).alias("v")
    ).collect()[0]["v"]
    assert got == want


def test_exact_long_sum_matches_decimal_sum_with_negatives(spark):
    """The split-radix primitive-long path must be value-identical to
    the decimal aggregate it replaces, including sign-mixed rows (the
    q9 profit shape) and values straddling the 1e8 radix."""
    rows = [
        (123_456_789_012,),
        (-99_999_999,),
        (100_000_000,),
        (-100_000_001,),
        (7,),
        (-123_456_789_012,),
        (42_000_000_123,),
    ]
    df = spark.createDataFrame(rows, "e long")
    dec = df.agg(F.sum(F.col("e").cast("decimal(27,0)")).alias("s")).collect()[
        0
    ]["s"]
    split = df.agg(money.exact_long_sum(F.col("e")).alias("s")).collect()[0][
        "s"
    ]
    assert split == dec == sum(r[0] for r in rows)
    # the plan must stay on primitive-long partials: no decimal SUM
    plan = (
        df.agg(money.exact_long_sum(F.col("e")).alias("s"))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # erase the try_sum occurrences FIRST, then require no other sum
    # aggregate — the previous `"sum(" not in plan or "try_sum" in plan`
    # form was vacuously true whenever try_sum appeared, so it could not
    # catch a decimal SUM sneaking in alongside the long try_sums
    assert "sum(" not in plan.lower().replace("try_sum", "")


def test_dollars_guard_raises_past_2_53(spark):
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    df = spark.createDataFrame([(2**53,)], "c long")
    with pytest.raises((Py4JJavaError, SparkRuntimeException)) as e:
        df.select(
            money.dollars(F.col("c").cast("decimal(38,0)"), "test")
        ).collect()
    assert "2^53" in str(e.value)
    # one below the limit is fine
    ok = (
        spark.createDataFrame([(2**53 - 1,)], "c long")
        .select(money.dollars(F.col("c").cast("decimal(38,0)")).alias("v"))
        .collect()[0]["v"]
    )
    assert ok == (2**53 - 1) / 100.0


def test_dollars_guard_passes_null_through(spark):
    """Empty ungrouped aggregates emit NULL sums; the guard must not
    fire on them (the >= comparison is null-safe-false)."""
    df = spark.createDataFrame([], "c decimal(38,0)")
    out = df.agg(
        money.dollars(money.cents_of_sum(F.sum("c"), money.E4)).alias("v")
    ).collect()
    assert out[0]["v"] is None


def test_spark_sql_dialect_matches_dataframe_leg(spark):
    """spark_sql_money_sum (the SQL-string twin) must emit the same
    value as money_sum for the same rows, negative totals included."""
    rows = [(-12_345,), (12_350,), (7,)]
    spark.createDataFrame(rows, "e long").createOrReplaceTempView("__mny")
    sql_v = spark.sql(
        f"SELECT {money.spark_sql_money_sum('e', money.E4, 'test')} AS v "
        "FROM __mny"
    ).collect()[0]["v"]
    df_v = (
        spark.createDataFrame(rows, "e long")
        .agg(money.money_sum(F.col("e"), money.E4).alias("v"))
        .collect()[0]["v"]
    )
    assert sql_v == df_v


def test_grid_check_raises_on_off_grid_column(spark):
    """GRID_CHECK (opt-in) must fail loudly on a 3dp column instead of
    silently mis-gridding it — and stay silent on true 2dp values."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    money.GRID_CHECK = True
    try:
        ok = (
            spark.createDataFrame([(12.34,), (-0.56,)], "x double")
            .select(money.cents(F.col("x")).alias("c"))
            .collect()
        )
        assert {r["c"] for r in ok} == {1234, -56}
        with pytest.raises((Py4JJavaError, SparkRuntimeException)) as e:
            spark.createDataFrame([(12.345,)], "x double").select(
                money.cents(F.col("x"))
            ).collect()
        assert "off the 0.01 grid" in str(e.value)
    finally:
        money.GRID_CHECK = False
    # default-off: the same 3dp value lifts (mis-grids) without error —
    # the documented precondition, not a silent contract
    assert not money.GRID_CHECK


def test_exact_double_guard_uniform_on_avg_paths(spark):
    """The avg/ratio emission paths share dollars()'s 2^53 fail-loud
    contract via exact_double: past the limit the guard raises; below
    it the cast is exact."""
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    big = spark.createDataFrame([(2**53,)], "s long")
    with pytest.raises((Py4JJavaError, SparkRuntimeException)) as e:
        big.select(
            (money.exact_double(F.col("s").cast("decimal(38,0)"), "t") / 10).alias("v")
        ).collect()
    assert "2^53" in str(e.value)
    ok = (
        spark.createDataFrame([(2**53 - 1,)], "s long")
        .select(money.exact_double(F.col("s").cast("decimal(38,0)"), "t").alias("v"))
        .collect()[0]["v"]
    )
    assert ok == float(2**53 - 1)


def test_sql_exact_double_guard_mirrors_in_duckdb():
    """The DuckDB oracle emitter now carries the same 2^53 guard as the
    Spark leg (ADVICE r10: the asymmetry let the oracle silently emit an
    inexact double while only the Spark side raised)."""
    import duckdb

    con = duckdb.connect()
    v = con.execute(
        f"SELECT {money.sql_dollars('123456')} AS v"
    ).fetchone()[0]
    assert v == 1234.56
    import pytest as _pytest

    with _pytest.raises(duckdb.Error, match="2\\^53"):
        con.execute(
            f"SELECT {money.sql_exact_double(str(2**53))} AS v"
        ).fetchone()
