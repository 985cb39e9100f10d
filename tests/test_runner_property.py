"""Property-based check of the headline contract: for randomly drawn
grid shapes, pads, and point sets, the padded cogroup runner's
per-keyed-row nearest distance equals the brute-force oracle whenever
pad >= max NN distance (hypothesis drives the configurations; one
shared Spark session)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from chopin_spark import EXTENT
from chopin_spark.grid import make_regular_grid
from chopin_spark.runners import par_grid


def _nearest_fun(kpdf, cpdf):
    if cpdf.empty:
        return pd.DataFrame({"id": kpdf["id"], "nn_dist": np.inf})
    kx = kpdf[["x", "y"]].to_numpy()
    cx = cpdf[["x", "y"]].to_numpy()
    d = np.sqrt(((kx[:, None, :] - cx[None, :, :]) ** 2).sum(-1)).min(axis=1)
    return pd.DataFrame({"id": kpdf["id"].to_numpy(), "nn_dist": d})


@given(
    seed=st.integers(0, 10_000),
    nx=st.integers(1, 6),
    ny=st.integers(1, 5),
    nk=st.integers(20, 120),
    nc=st.integers(30, 200),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_par_grid_nearest_random_configs(spark, seed, nx, ny, nk, nc):
    rng = np.random.default_rng(seed)
    kp = pd.DataFrame(
        {
            "id": np.arange(nk),
            "x": rng.uniform(EXTENT[0], EXTENT[2], nk),
            "y": rng.uniform(EXTENT[1], EXTENT[3], nk),
        }
    )
    cp = pd.DataFrame(
        {
            "id": np.arange(nc),
            "x": rng.uniform(EXTENT[0], EXTENT[2], nc),
            "y": rng.uniform(EXTENT[1], EXTENT[3], nc),
        }
    )
    kx = kp[["x", "y"]].to_numpy()
    cx = cp[["x", "y"]].to_numpy()
    oracle = np.sqrt(((kx[:, None, :] - cx[None, :, :]) ** 2).sum(-1)).min(
        axis=1
    )
    pad = float(oracle.max()) * 1.01 + 1.0
    g = make_regular_grid(nx, ny, pad=pad)
    out = par_grid(
        spark.createDataFrame(kp),
        spark.createDataFrame(cp),
        g,
        _nearest_fun,
        "id long, nn_dist double",
    ).collect()
    got = {r["id"]: r["nn_dist"] for r in out}
    assert len(got) == nk
    for i, want in enumerate(oracle):
        assert got[i] == pytest.approx(want, rel=1e-12), (seed, nx, ny, i)
