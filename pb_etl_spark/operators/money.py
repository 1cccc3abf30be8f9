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
- per-row products stay within int64 (≤ ~1.2e11) and SUM exactly at
  any scale via the split-radix ``exact_long_sum`` (two primitive-long
  ``try_sum`` halves recombined in decimal — loud raise on overflow,
  never a silent int64 wrap, and no BigDecimal aggregate in the hot
  path);
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

_LIM = 2**53  # largest integer band where every long is an exact double
# Split-accumulator radix: per-row integer money values e split into
# (e div 1e8, e mod 1e8) and each half sums in PRIMITIVE LONGS (the
# whole-stage-codegen fast path — a decimal(27,0) SUM leaves it for
# BigDecimal aggregation and measured 1.5-2.7x slower on the q1-shaped
# aggregates at sf0.1). Overflow margins at 100 TB lineitem volumes:
# |Σlo| ≤ n·(1e8−1) wraps past n ≈ 9.2e10 rows PER GROUP (15x margin
# over a 6e9-row fact), |Σhi| ≤ n·1200 is unreachable — and both
# halves use try_sum, so an overflow surfaces as a loud raise, never a
# silent wrap.
_SPLIT = 100_000_000

#: unit constants — how many integer steps make one cent
CENTS = 1  # plain 2dp columns (l_extendedprice, o_totalprice, ...)
E4 = 100  # cents x pct100 products (price x (1 - discount))
E6 = 10_000  # cents x pct100 x pct100 (x (1 + tax))

#: Opt-in debug assertion that lifted columns really sit on the 2dp
#: grid. The floor lift recovers the integer only when x is within
#: ~±0.005 of a grid point — true of every fixture column (pinned in
#: tests) and of the reference's money semantics, but a 3dp price fed
#: to ``cents`` would silently mis-grid. Flip this on (e.g. in a test
#: or a validation run) to make such a column fail loudly per-row
#: instead; default off so the hot path stays a single Math.floor.
#: BINDING: the flag is read at Column-CONSTRUCTION time (when the
#: query function builds its plan), not at execution — flipping it
#: after a DataFrame is built has no effect on that DataFrame, and
#: parallel plan construction in one process races on it. It is a
#: process-global debug knob for sequential validation runs, not a
#: per-query switch (ADVICE r11).
GRID_CHECK = False
_GRID_EPS = 0.005  # |x*100 - nearest int| beyond this = off-grid


def _grid_lift(col: Column, label: str) -> Column:
    """Shared floor lift for ``cents``/``pct100``; applies the off-grid
    raise when ``GRID_CHECK`` is on."""
    lifted = F.floor(col * 100 + 0.5).cast("long")
    if not GRID_CHECK:
        return lifted
    off = F.abs(col * 100 - lifted.cast("double")) > _GRID_EPS
    return F.when(
        off,
        F.raise_error(
            F.lit(
                f"{label}: value off the 0.01 grid — the integer lift "
                "would silently mis-grid; widen the grid or pre-round"
            )
        ).cast("long"),
    ).otherwise(lifted)


def cents(col: Column) -> Column:
    """2dp money column -> exact integer cents.

    FLOOR(x*100 + 0.5), not ROUND(x*100): Spark's ROUND on double goes
    through BigDecimal per row (measured 2x the whole aggregate's cost
    on q1-shaped scans), while floor is a single codegen'd Math.floor.
    On the fixture grids x*100 is within ~1e-7 of the true integer v
    (for EITHER sign), so x*100 + 0.5 lies strictly inside
    (v + 0.5 - eps, v + 0.5 + eps) ⊂ (v, v+1) and floor recovers v
    exactly — equivalent to the round lift on every grid value, pinned
    in tests. Precondition (documented in the module docstring, loudly
    checkable via ``GRID_CHECK``): inputs sit on the 0.01 grid."""
    return _grid_lift(col, "cents")


def pct100(col: Column) -> Column:
    """0.01-grid rate column (discount, tax) -> integer hundredths
    (same floor lift — and same grid precondition — as ``cents``)."""
    return _grid_lift(col, "pct100")


def exact_long_sum(expr: Column, label: str = "money_sum") -> Column:
    """EXACT sum of an integer money expression as decimal(38,0),
    without a decimal aggregate in the hot path: the per-row value
    splits into (hi, lo) at radix 1e8, both halves sum as primitive
    longs under ``try_sum`` (loud NULL on int64 overflow instead of a
    silent wrap), and the halves recombine in decimal on the
    already-aggregated frame. Value-identical to SUM(CAST(e AS
    DECIMAL(27,0))) — pinned in tests — at the speed of a plain long
    sum.

    Precondition: |expr| < 2^53 per row (every grid product here is
    ≤ ~1.2e11), so ``(e - e % S) / S`` is an exact double division
    with an exact integer quotient; ``%`` carries the dividend's sign,
    so negative rows (profit, balances) split consistently."""
    lo = expr % _SPLIT
    hi = ((expr - lo) / _SPLIT).cast("long")
    hi_s, lo_s = F.try_sum(hi), F.try_sum(lo)
    overflow = (F.count(expr) > 0) & (hi_s.isNull() | lo_s.isNull())
    total = hi_s.cast("decimal(38,0)") * _SPLIT + lo_s.cast("decimal(38,0)")
    return F.when(
        overflow,
        F.raise_error(
            F.lit(
                f"{label}: int64 overflow in split money sum — widen "
                "this aggregate to the decimal path"
            )
        ).cast("decimal(38,0)"),
    ).otherwise(total)


def cents_of_sum(sum_expr: Column, unit: int) -> Column:
    """Exact decimal SUM (in 1/(100*unit) dollars) -> whole cents,
    rounded half-away-from-zero in integer arithmetic."""
    if unit == 1:
        return sum_expr
    mag = F.floor(
        (F.abs(sum_expr) + unit // 2) / F.lit(unit).cast("decimal(10,0)")
    )
    return F.when(sum_expr < 0, -mag).otherwise(mag)


def exact_double(sum_expr: Column, label: str = "money_sum") -> Column:
    """Exact integer aggregate -> double, loud past 2^53 — the ONE gate
    every exact-sum-to-float emission must pass: ``dollars`` for money
    totals, and the average/ratio paths (``exact_long_sum(...)`` divided
    by a count or another sum) directly. The cast is exact below 2^53;
    beyond it the emitted double could silently drift from the true
    integer by ~1 ulp, so fail loudly instead (NULL inputs — empty
    ungrouped aggregates — stay NULL: the >= comparison is
    null-safe-false)."""
    return F.when(
        F.abs(sum_expr.cast("decimal(38,0)"))
        >= F.lit(_LIM).cast("decimal(38,0)"),
        F.raise_error(
            F.lit(
                f"{label}: exact total >= 2^53 — a double emission "
                "would drift silently; emit the integer instead"
            )
        ).cast("double"),
    ).otherwise(sum_expr.cast("double"))


def dollars(cents_expr: Column, label: str = "money_sum") -> Column:
    """Whole-cent integer -> dollars double: the 2^53-guarded exact
    cast (``exact_double``) followed by one correctly-rounded IEEE
    division."""
    return exact_double(cents_expr, label) / 100.0


def money_sum(expr: Column, unit: int, label: str = "money_sum") -> Column:
    """SUM an integer money expression exactly and emit 2dp dollars —
    the drop-in replacement for ROUND(SUM(double_product), 2)."""
    return dollars(cents_of_sum(exact_long_sum(expr, label), unit), label)


# ---------------------------------------------------------------- SQL —
# DuckDB-dialect mirrors for the oracles. SUM over BIGINT rows is
# HUGEINT (exact); `//` truncates, so the magnitude is sign-normalized
# first; CAST(hugeint AS DOUBLE) is correctly rounded.


def sql_cents(col: str) -> str:
    # same floor lift as the Column version; parses identically in
    # Spark SQL (where ROUND(double) would be the per-row BigDecimal
    # cost) and DuckDB (where either form is cheap)
    return f"CAST(FLOOR({col}*100 + 0.5) AS BIGINT)"


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


def sql_exact_double(sum_expr: str) -> str:
    """DuckDB-dialect twin of ``exact_double``: hugeint -> double with
    the same loud 2^53 guard, so the oracle's fidelity contract is
    symmetric with the Spark leg (before this guard, a past-2^53 oracle
    silently emitted a correctly-rounded-but-inexact double and failure
    was loud only because the Spark leg raised first)."""
    return (
        f"(CASE WHEN ABS({sum_expr}) >= {_LIM} "
        f"THEN CAST(error('money: exact total >= 2^53 — a double "
        f"emission would drift silently') AS DOUBLE) "
        f"ELSE CAST({sum_expr} AS DOUBLE) END)"
    )


def sql_dollars(cents_expr: str) -> str:
    return f"({sql_exact_double(cents_expr)} / 100.0)"


def sql_money_sum(expr: str, unit: int) -> str:
    return sql_dollars(sql_cents_of_sum(f"SUM({expr})", unit))


def spark_sql_money_sum(expr: str, unit: int, label: str) -> str:
    """Spark-SQL-dialect twin of ``money_sum`` for queries whose Spark
    leg IS a SQL string (grouping sets, pipe syntax, SQL UDFs, session
    variables). Same exact semantics: split-radix exact sum, integer
    half-away-from-zero cent rounding (FLOOR on the sign-normalized
    magnitude — Spark has no hugeint ``//``), 2^53 guard, one final
    correctly-rounded division. ``sql_cents``/``sql_pct100`` strings are
    dialect-shared (FLOOR/CAST parse identically in Spark and DuckDB);
    only the SUM wrapper differs."""
    s = spark_sql_exact_sum(expr, label)
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


def spark_sql_exact_double(expr: str, label: str) -> str:
    """Spark-SQL-dialect twin of ``exact_double``: 2^53-guarded exact
    integer -> double, for SQL-leg averages/ratios."""
    return (
        f"(CASE WHEN ABS(CAST({expr} AS DECIMAL(38,0))) >= {_LIM} "
        f"THEN CAST(RAISE_ERROR('{label}: exact total >= 2^53 — a "
        f"double emission would drift silently') AS DOUBLE) "
        f"ELSE CAST({expr} AS DOUBLE) END)"
    )


def spark_sql_exact_sum(expr: str, label: str) -> str:
    """Spark-SQL-dialect twin of ``exact_long_sum``: split-radix
    primitive-long TRY_SUMs recombined in decimal, loud on overflow."""
    hi = f"TRY_SUM(({expr}) DIV {_SPLIT})"
    lo = f"TRY_SUM(({expr}) % {_SPLIT})"
    total = (
        f"(CAST({hi} AS DECIMAL(38,0)) * {_SPLIT}"
        f" + CAST({lo} AS DECIMAL(38,0)))"
    )
    return (
        f"(CASE WHEN COUNT({expr}) > 0"
        f" AND ({hi} IS NULL OR {lo} IS NULL)"
        f" THEN CAST(RAISE_ERROR('{label}: int64 overflow in split "
        f"money sum') AS DECIMAL(38,0)) ELSE {total} END)"
    )


# Common row expressions, shared verbatim by many oracles AND by the
# Spark-SQL query legs (so the rate lifts use the same cheap floor form)
SQL_EXT_CENTS = sql_cents("l_extendedprice")
SQL_DISC100 = f"(100 - {sql_pct100('l_discount')})"
SQL_TAX100 = f"(100 + {sql_pct100('l_tax')})"
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
