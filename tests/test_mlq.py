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
