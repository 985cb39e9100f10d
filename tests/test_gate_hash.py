"""The local gate's value hash must be TYPE-FAITHFUL — the property
that caught round-1's 11 driver failures (DuckDB SUM(INTEGER) →
float64 vs Spark BIGINT). No Spark needed."""

from __future__ import annotations

import sys

import pandas as pd

sys.path.insert(0, "/root/repo/tools")
from check_oracle import value_hash  # noqa: E402


def test_dtype_divergence_changes_hash():
    a = pd.DataFrame({"k": [1, 2], "v": pd.array([10, 20], dtype="int64")})
    b = pd.DataFrame({"k": [1, 2], "v": pd.array([10.0, 20.0], dtype="float64")})
    assert value_hash(a) != value_hash(b)  # "10" vs "10.0"


def test_equal_frames_hash_equal_regardless_of_order():
    a = pd.DataFrame({"k": [2, 1], "v": [20, 10]})
    b = pd.DataFrame({"v": [10, 20], "k": [1, 2]})  # row+col order differ
    assert value_hash(a) == value_hash(b)


def test_null_and_nan_normalize():
    a = pd.DataFrame({"v": [None, 1.5]})
    b = pd.DataFrame({"v": [float("nan"), 1.5]})
    assert value_hash(a) == value_hash(b)


def test_fifth_decimal_divergence_detected():
    a = pd.DataFrame({"v": [0.12345]})
    b = pd.DataFrame({"v": [0.12346]})
    assert value_hash(a) != value_hash(b)  # no %.4f smoothing
