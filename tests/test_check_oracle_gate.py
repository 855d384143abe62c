"""The local correctness gate's compare() must be driver-faithful.

Rounds 7–10 were burned because the old float-coerced compare PASSED
where the driver's value hash FAILED (DuckDB HUGEINT → pandas float64
vs Spark int64).  These tests pin the round-11 contract: int-vs-float
dtype kinds fail even when values are numerically equal; benign width
(int32/int64) and date-representation (object date vs datetime64)
differences — which the driver canonicalizes, with green rows r8–r10 —
still pass.
"""

from __future__ import annotations

import datetime
import importlib.util
import sys

import numpy as np
import pandas as pd

spec = importlib.util.spec_from_file_location(
    "check_oracle", "/root/repo/scripts/check_oracle.py"
)
check_oracle = importlib.util.module_from_spec(spec)
sys.modules["check_oracle"] = check_oracle
spec.loader.exec_module(check_oracle)
compare = check_oracle.compare


def test_int_vs_float_same_values_fails():
    s = pd.DataFrame({"k": ["a", "b"], "v": np.array([123, 456], dtype="int64")})
    o = pd.DataFrame({"k": ["a", "b"], "v": np.array([123.0, 456.0], dtype="float64")})
    assert not compare("t", s, o), "the HUGEINT->float64 class must fail"


def test_int32_vs_int64_passes():
    s = pd.DataFrame({"v": np.array([1, 2], dtype="int32")})
    o = pd.DataFrame({"v": np.array([1, 2], dtype="int64")})
    assert compare("t", s, o)


def test_date_object_vs_datetime64_passes():
    s = pd.DataFrame({"d": [datetime.date(2024, 1, 1), datetime.date(2024, 1, 2)]})
    o = pd.DataFrame({"d": pd.to_datetime(["2024-01-01", "2024-01-02"])})
    assert compare("t", s, o)


def test_equal_floats_pass_and_bit_diff_fails():
    s = pd.DataFrame({"x": [0.1, float("nan")]})
    o = pd.DataFrame({"x": [0.1, float("nan")]})
    assert compare("t", s, o)
    o2 = pd.DataFrame({"x": [0.1 + 1e-15, float("nan")]})
    assert not compare("t", s, o2), "any float bit-difference must fail"


def test_value_mismatch_fails_and_row_order_ignored():
    s = pd.DataFrame({"k": ["b", "a"], "v": np.array([2, 1], dtype="int64")})
    o = pd.DataFrame({"k": ["a", "b"], "v": np.array([1, 2], dtype="int64")})
    assert compare("t", s, o)
    o_bad = pd.DataFrame({"k": ["a", "b"], "v": np.array([1, 3], dtype="int64")})
    assert not compare("t", s, o_bad)
