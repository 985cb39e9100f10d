"""R2 spatial-fallback + P5 scale-variant tests."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from chopin_spark.grid import balanced_assign_approx
from chopin_spark.runners import par_hierarchy_spatial
from chopin_spark.zones import zones_df


@pytest.fixture(scope="module")
def pts(spark):
    rng = np.random.default_rng(21)
    pdf = pd.DataFrame(
        {
            "id": np.arange(3000),
            "x": rng.uniform(0, 8e5, 3000),
            "y": rng.uniform(0, 6e5, 3000),
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_par_hierarchy_spatial_covers_every_point(spark, pts):
    """With pad=0 the state bboxes partition the extent exactly → the
    spatial assignment equals the arithmetic prefix assignment."""
    df, pdf = pts
    zones = zones_df(spark)

    def agg_fun(p: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [len(p)]})

    out = par_hierarchy_spatial(
        df, zones, agg_fun, "hkey string, n long",
        region_col="zone_id", length_left=2, pad=0.0,
    ).collect()
    got = {r["hkey"]: r["n"] for r in out}
    sx = (pdf.y >= 3e5).astype(int) * 2 + (pdf.x >= 4e5).astype(int)
    want = {f"{s:02d}": int((sx == s).sum()) for s in range(4)}
    assert got == want


def test_par_hierarchy_spatial_pad_duplicates_border_points(spark, pts):
    """With pad>0 points inside the pad band join several prefixes —
    the reference's documented dup caveat
    (/root/reference/R/scale_process.R:267-273) preserved."""
    df, pdf = pts
    zones = zones_df(spark)

    def agg_fun(p: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [len(p)]})

    pad = 50_000.0
    out = par_hierarchy_spatial(
        df, zones, agg_fun, "hkey string, n long",
        region_col="zone_id", length_left=2, pad=pad,
    ).collect()
    total = sum(r["n"] for r in out)
    # multiplicity = (1 + x-band) * (1 + y-band): corner-band points
    # appear in all four padded states
    xb = (np.abs(pdf.x - 4e5) < pad).astype(int)
    yb = (np.abs(pdf.y - 3e5) < pad).astype(int)
    assert total == int(((1 + xb) * (1 + yb)).sum())


def test_balanced_assign_approx_near_equal(spark, pts):
    df, _ = pts
    out = balanced_assign_approx(df, k=8)
    counts = [r["count"] for r in out.groupBy("cgridid").count().collect()]
    assert len(counts) == 8
    assert max(counts) - min(counts) <= 0.15 * (3000 / 8)
    assert sum(counts) == 3000
