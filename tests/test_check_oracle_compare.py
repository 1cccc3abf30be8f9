"""Pin tools/check_oracle.py's comparator to driver exactness.

The driver hashes rendered values, so int64 ``123`` vs float64 ``123.0``
is a driver FAIL. The twin's old compare() coerced both sides to float
and compared at round(9), which silently passed the 11 round-5 reds; it
must now go red on any rendered numeric dtype mismatch while still
passing the legitimate case where NULLs float-ify an int column on BOTH
engines (try_funcs, pit_join).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracle import compare, dtype_mismatches  # noqa: E402


def test_int_vs_float_is_red_even_when_values_equal():
    spark = pd.DataFrame({"k": ["a", "b"], "cents": np.array([100, 200], dtype="int64")})
    oracle = pd.DataFrame({"k": ["a", "b"], "cents": np.array([100.0, 200.0], dtype="float64")})
    probs = compare("t", spark, oracle)
    assert any("dtype mismatch" in p and "cents" in p for p in probs)


def test_integer_width_mismatch_is_red():
    spark = pd.DataFrame({"n": np.array([1, 2], dtype="int32")})
    oracle = pd.DataFrame({"n": np.array([1, 2], dtype="int64")})
    assert dtype_mismatches(spark, oracle)


def test_null_floatified_int_on_both_engines_is_green():
    # A NULL-bearing int column renders float64 from BOTH Spark.toPandas
    # and DuckDB.fetchdf — same rendered dtype, no mismatch.
    spark = pd.DataFrame({"v": np.array([1.0, np.nan], dtype="float64")})
    oracle = pd.DataFrame({"v": np.array([1.0, np.nan], dtype="float64")})
    assert dtype_mismatches(spark, oracle) == []
    assert compare("t", spark, oracle) == []


def test_matching_ints_and_strings_are_green():
    a = pd.DataFrame({"k": ["x"], "n": np.array([7], dtype="int64")})
    b = pd.DataFrame({"k": ["x"], "n": np.array([7], dtype="int64")})
    assert compare("t", a, b) == []


def test_value_difference_still_detected():
    a = pd.DataFrame({"n": np.array([7], dtype="int64")})
    b = pd.DataFrame({"n": np.array([8], dtype="int64")})
    assert any("values differ" in p for p in compare("t", a, b))


def test_sub_tolerance_float_drift_is_red():
    # The driver hashes rendered values exactly, so a 1e-12 cross-engine
    # ULP drift is a driver red; the twin's old round(9) passed it.
    a = pd.DataFrame({"x": np.array([1.0, 2.0], dtype="float64")})
    b = pd.DataFrame({"x": np.array([1.0 + 1e-12, 2.0], dtype="float64")})
    assert any("values differ" in p for p in compare("t", a, b))


def test_exactly_equal_floats_align_and_pass():
    # identical multisets in different input order sort-align on the raw
    # values and compare clean
    a = pd.DataFrame({"x": np.array([0.1 + 0.2, 0.3], dtype="float64")})
    b = pd.DataFrame({"x": np.array([0.3, 0.1 + 0.2], dtype="float64")})
    assert compare("t", a, b) == []

def test_datetime_vs_object_string_is_red():
    # ADVICE r07: non-numeric rendered-dtype divergence (datetime64 vs
    # object strings) renders differently under the driver hash
    # ("2024-01-01 00:00:00" vs "2024-01-01") — must be red even when
    # the date values coincide.
    spark = pd.DataFrame({"d": pd.to_datetime(["2024-01-01", "2024-01-02"])})
    oracle = pd.DataFrame({"d": ["2024-01-01", "2024-01-02"]})
    assert any("dtype mismatch" in p for p in compare("t", spark, oracle))


def test_datetime_resolution_difference_is_green():
    # Spark.toPandas emits datetime64[ns], DuckDB.fetchdf datetime64[us];
    # str() renders both identically, so the driver hash cannot see the
    # unit — the documented exemption.
    spark = pd.DataFrame(
        {"d": pd.to_datetime(["2024-01-01 01:02:03"]).astype("datetime64[ns]")}
    )
    oracle = pd.DataFrame(
        {"d": pd.to_datetime(["2024-01-01 01:02:03"]).astype("datetime64[us]")}
    )
    assert dtype_mismatches(spark, oracle) == []
    assert compare("t", spark, oracle) == []


def test_tz_aware_vs_naive_datetime_is_red():
    # same kind 'M' but one side carries a timezone: renders with an
    # offset suffix -> driver red, so the twin must flag it.
    spark = pd.DataFrame(
        {"d": pd.to_datetime(["2024-01-01"]).tz_localize("UTC")}
    )
    oracle = pd.DataFrame({"d": pd.to_datetime(["2024-01-01"])})
    assert dtype_mismatches(spark, oracle)


def test_big_sf_oracles_equal_registry_oracles_at_fixture_scale():
    """The --big-oracles deletion-key variants must produce the exact
    same frames as the registry's brute-force oracles (DuckDB vs DuckDB
    at sf0.01) — the equivalence the big-SF sweep relies on."""
    import duckdb

    from pb_etl_spark.registry import all_oracles
    from tools.check_oracle import BIG_SF_ORACLES

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW customer AS SELECT * FROM "
        "'/root/testdata/sf0.01/customer.parquet'"
    )
    oracles = all_oracles()
    for name, big_src in BIG_SF_ORACLES.items():
        want = con.execute(oracles[name]).fetchdf()
        got = big_src(con) if callable(big_src) else con.execute(big_src).fetchdf()
        assert list(got.columns) == list(want.columns), name
        key = list(got.columns)
        want = want.sort_values(key).reset_index(drop=True)
        got = got.sort_values(key).reset_index(drop=True)
        assert got.equals(want), f"{name}: frames differ"
        assert len(got) > 0, name
