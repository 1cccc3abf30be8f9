"""Exact integer-grid money arithmetic for multi-engine-checked sums.

Round 10's full-registry value sweep at the x10 key-shifted fixture
(.scale/sf1.0, 6M lineitem) caught a latent exactness class the x4 sweep
had passed by rounding margin: money aggregates that SUM double products
(``l_extendedprice * (1 - l_discount)`` and friends) are order-dependent
float accumulations, and at large row counts Spark's and DuckDB's sums
land on opposite sides of a half-cent boundary — tpch_q1_pricing /
q5 / q7 / q9 each drifted by exactly one cent in one or more groups.
At 100 TB the accumulated error is larger still, and silent.

The fix is the repo's established integer-grid discipline (SCALING.md
"integer sums until the final division"), packaged here so every money
aggregate shares one audited implementation:

- every 2dp money column and 0.01-grid rate column is lifted to exact
  integers (``cents``/``pct100``: the fixture grids are exact — max
  |x*100 − round(x*100)| ≈ 1e-9 across all money columns);
- per-row products stay within int64 (≤ ~1.2e11) but are cast to
  decimal(27,0) BEFORE the SUM so the aggregate is exact at any scale
  (a silent int64 wrap at ~9.2e18 is the alternative);
- rounding to whole cents is half-away-from-zero in pure integer
  arithmetic (never ROUND(double) — the cross-engine cent-drift rule),
  sign-handled explicitly so Spark decimal FLOOR and DuckDB hugeint
  ``//`` agree on negative totals (profit, account balances);
- the final ``cents / 100.0`` is one correctly-rounded IEEE division of
  an integer that a loud 2^53 guard keeps exactly representable — the
  ``gini_by_group`` fidelity contract, not just engine agreement.

The DuckDB oracle mirrors (``sql_*``) build the same expressions in
DuckDB dialect: SUM over BIGINT rows accumulates in HUGEINT (exact),
``//`` on the sign-normalized magnitude truncates = floors, and the
hugeint→double cast is correctly rounded — prototyped bit-identical to
the Spark leg including past-2^53 magnitudes.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Per-row product headroom: cents(1e7) * pct(110) * pct(110) ≈ 1.2e11;
# decimal(27,0) rows let the SUM grow to decimal(37,0)+ exactly.
_ROW_DEC = "decimal(27,0)"
_LIM = 2**53  # largest integer band where every long is an exact double

#: unit constants — how many integer steps make one cent
CENTS = 1  # plain 2dp columns (l_extendedprice, o_totalprice, ...)
E4 = 100  # cents x pct100 products (price x (1 - discount))
E6 = 10_000  # cents x pct100 x pct100 (x (1 + tax))


def cents(col: Column) -> Column:
    """2dp money column -> exact integer cents."""
    return F.round(col * 100).cast("long")


def pct100(col: Column) -> Column:
    """0.01-grid rate column (discount, tax) -> integer hundredths."""
    return F.round(col * 100).cast("long")


def money_row(expr: Column) -> Column:
    """Integer money product, widened for exact summation."""
    return expr.cast(_ROW_DEC)


def cents_of_sum(sum_expr: Column, unit: int) -> Column:
    """Exact decimal SUM (in 1/(100*unit) dollars) -> whole cents,
    rounded half-away-from-zero in integer arithmetic."""
    if unit == 1:
        return sum_expr
    mag = F.floor(
        (F.abs(sum_expr) + unit // 2) / F.lit(unit).cast("decimal(10,0)")
    )
    return F.when(sum_expr < 0, -mag).otherwise(mag)


def dollars(cents_expr: Column, label: str = "money_sum") -> Column:
    """Whole-cent integer -> dollars double. The cast is exact below
    2^53 and the /100.0 is one correctly-rounded IEEE op; beyond 2^53
    the emitted dollars could silently drift from the true cent total,
    so fail loudly instead (NULL inputs — empty ungrouped aggregates —
    stay NULL: the >= comparison is null-safe-false)."""
    guarded = F.when(
        F.abs(cents_expr.cast("decimal(38,0)"))
        >= F.lit(_LIM).cast("decimal(38,0)"),
        F.raise_error(
            F.lit(
                f"{label}: cent total >= 2^53 — double dollars would "
                "drift silently; emit cents instead"
            )
        ).cast("double"),
    ).otherwise(cents_expr.cast("double"))
    return guarded / 100.0


def money_sum(expr: Column, unit: int, label: str = "money_sum") -> Column:
    """SUM an integer money expression exactly and emit 2dp dollars —
    the drop-in replacement for ROUND(SUM(double_product), 2)."""
    return dollars(cents_of_sum(F.sum(money_row(expr)), unit), label)


# ---------------------------------------------------------------- SQL —
# DuckDB-dialect mirrors for the oracles. SUM over BIGINT rows is
# HUGEINT (exact); `//` truncates, so the magnitude is sign-normalized
# first; CAST(hugeint AS DOUBLE) is correctly rounded.


def sql_cents(col: str) -> str:
    return f"CAST(ROUND({col}*100) AS BIGINT)"


sql_pct100 = sql_cents  # same 0.01-grid lift


def sql_cents_of_sum(sum_expr: str, unit: int) -> str:
    if unit == 1:
        return sum_expr
    half = unit // 2
    return (
        f"(CASE WHEN {sum_expr} < 0 "
        f"THEN -((-({sum_expr}) + {half}) // {unit}) "
        f"ELSE (({sum_expr}) + {half}) // {unit} END)"
    )


def sql_dollars(cents_expr: str) -> str:
    return f"(CAST({cents_expr} AS DOUBLE) / 100.0)"


def sql_money_sum(expr: str, unit: int) -> str:
    return sql_dollars(sql_cents_of_sum(f"SUM({expr})", unit))


def spark_sql_money_sum(expr: str, unit: int, label: str) -> str:
    """Spark-SQL-dialect twin of ``money_sum`` for queries whose Spark
    leg IS a SQL string (grouping sets, pipe syntax, SQL UDFs, session
    variables). Same exact semantics: decimal SUM, integer
    half-away-from-zero cent rounding (FLOOR on the sign-normalized
    magnitude — Spark has no hugeint ``//``), 2^53 guard, one final
    correctly-rounded division. ``sql_cents``/``sql_pct100`` strings are
    dialect-shared (ROUND/CAST parse identically in Spark and DuckDB);
    only this SUM wrapper differs."""
    s = f"SUM(CAST({expr} AS DECIMAL(27,0)))"
    if unit == 1:
        c = s
    else:
        half = unit // 2
        mag = f"FLOOR((ABS({s}) + {half}) / {unit})"
        c = f"(CASE WHEN {s} < 0 THEN -{mag} ELSE {mag} END)"
    return (
        f"(CASE WHEN ABS({c}) >= {_LIM} THEN CAST(RAISE_ERROR("
        f"'{label}: cent total >= 2^53 — double dollars would drift "
        f"silently') AS DOUBLE) ELSE CAST({c} AS DOUBLE) END / 100.0)"
    )


# Common row expressions, shared verbatim by many oracles:
SQL_EXT_CENTS = sql_cents("l_extendedprice")
SQL_DISC100 = "(100 - CAST(ROUND(l_discount*100) AS BIGINT))"
SQL_TAX100 = "(100 + CAST(ROUND(l_tax*100) AS BIGINT))"
SQL_DISC_PRICE_E4 = f"{SQL_EXT_CENTS} * {SQL_DISC100}"
SQL_CHARGE_E6 = f"{SQL_EXT_CENTS} * {SQL_DISC100} * {SQL_TAX100}"


def disc_price_e4() -> Column:
    """l_extendedprice x (1 - l_discount) in exact 1e-4 dollars."""
    return cents(F.col("l_extendedprice")) * (
        100 - pct100(F.col("l_discount"))
    )


def charge_e6() -> Column:
    """disc_price x (1 + l_tax) in exact 1e-6 dollars."""
    return disc_price_e4() * (100 + pct100(F.col("l_tax")))
