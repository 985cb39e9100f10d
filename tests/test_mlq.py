"""Closed-form ML estimators: the one-pass OLS normal-equation solve
must agree with an independent dense solver (numpy lstsq) on the same
rows — external validation beyond the DuckDB oracle, which shares the
SQL text."""

from __future__ import annotations

import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def test_ols_normal_eq_matches_numpy_lstsq(spark):
    from chopin_spark.queries.mlq import ols_price_normal_eq

    got = ols_price_normal_eq(spark, SF).collect()[0]

    con = duckdb.connect()
    cols = con.execute(
        "SELECT l_quantity, l_discount, l_tax, l_extendedprice"
        f" FROM read_parquet('{SF}/lineitem.parquet')"
    ).fetchnumpy()
    x = np.column_stack([
        np.ones(len(cols["l_quantity"])), cols["l_quantity"],
        cols["l_discount"], cols["l_tax"],
    ])
    y = cols["l_extendedprice"]
    beta, *_ = np.linalg.lstsq(x, y, rcond=None)
    pred = x @ beta
    r2 = 1.0 - ((y - pred) ** 2).sum() / ((y - y.mean()) ** 2).sum()

    assert got["n"] == len(y)
    assert abs(got["beta_intercept"] - beta[0]) < 1e-4
    assert abs(got["beta_qty"] - beta[1]) < 1e-6
    assert abs(got["beta_discount"] - beta[2]) < 1e-4
    assert abs(got["beta_tax"] - beta[3]) < 1e-4
    assert abs(got["r2"] - r2) < 1e-9


def test_jenks_breaks_match_reference_dp():
    """The SQL DP must reproduce an independent O(K n^2) python Fisher
    DP (breaks, class sizes, and total within-class SSD) on the same
    per-zone values."""
    import duckdb

    from chopin_spark.queries.classifyq import (
        _JK_K, _JK_VALS, _jk_oracle,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{SF}/documents.parquet')"
    )
    got = con.execute(_jk_oracle()).fetchall()
    vals = sorted(
        v for (v,) in con.execute(
            f"SELECT v FROM ({_JK_VALS}) q"
        ).fetchall()
    )
    n, k = len(vals), _JK_K
    pre1 = [0.0]
    pre2 = [0.0]
    for v in vals:
        pre1.append(pre1[-1] + v)
        pre2.append(pre2[-1] + v * v)

    def ssd(a, b):  # 1-based inclusive
        s1 = pre1[b] - pre1[a - 1]
        s2 = pre2[b] - pre2[a - 1]
        return s2 - s1 * s1 / (b - a + 1)

    big = float("inf")
    d = [[big] * (n + 1) for _ in range(k + 1)]
    bp = [[0] * (n + 1) for _ in range(k + 1)]
    for j in range(1, n + 1):
        d[1][j] = ssd(1, j)
        bp[1][j] = 1
    for c in range(2, k + 1):
        for j in range(c, n + 1):
            for a in range(c, j + 1):
                cand = d[c - 1][a - 1] + ssd(a, j)
                if cand < d[c][j] - 1e-12:
                    d[c][j], bp[c][j] = cand, a
    # backwalk
    bounds = []
    e = n
    for c in range(k, 0, -1):
        s = bp[c][e]
        bounds.append((c, s, e))
        e = s - 1
    bounds.reverse()
    for (cls, lo, hi, cnt, gvf), (c, s, e) in zip(got, bounds):
        assert cls == c
        assert lo == vals[s - 1] and hi == vals[e - 1]
        assert cnt == e - s + 1
    sst = ssd(1, n)
    assert abs(got[0][4] - (1.0 - d[k][n] / sst)) < 1e-6
