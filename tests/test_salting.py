"""Salted skew handling: the two-phase salted aggregation equals the
direct aggregation, hot keys fan out, cold keys don't."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from chopin_spark.grid import salted_agg, salted_key


@pytest.fixture(scope="module")
def skewed(spark):
    # zipf-style skew: key 0 holds ~80% of rows
    rng = np.random.default_rng(5)
    keys = np.where(rng.random(20_000) < 0.8, 0, rng.integers(1, 50, 20_000))
    pdf = pd.DataFrame(
        {"rid": np.arange(20_000), "k": keys, "v": rng.gamma(2.0, 3.0, 20_000)}
    )
    return spark.createDataFrame(pdf), pdf


def test_salted_agg_equals_direct(spark, skewed):
    df, pdf = skewed
    got = {
        r["k"]: (r["n"], r["sv"])
        for r in salted_agg(
            df,
            key_col="k",
            row_key="rid",
            aggs_partial=[
                F.count(F.lit(1)).alias("pn"),
                F.sum("v").alias("pv"),
            ],
            aggs_final=[
                F.sum("pn").alias("n"),
                F.round(F.sum("pv"), 4).alias("sv"),
            ],
            target_rows=1_000,
        ).collect()
    }
    want = {
        int(k): (len(g), round(g["v"].sum(), 4))
        for k, g in pdf.groupby("k")
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-3)


def test_hot_keys_fan_out_cold_keys_dont(spark, skewed):
    df, pdf = skewed
    counts = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    salted = salted_key(df, "k", counts, target_rows=1_000, row_key="rid")
    fan = (
        salted.groupBy("k")
        .agg(F.countDistinct("salt").alias("n_salts"))
        .collect()
    )
    fan = {r["k"]: r["n_salts"] for r in fan}
    hot = int((pdf.k == 0).sum())
    assert fan[0] >= min(8, hot // 2_000)  # key 0 split widely
    cold = [k for k, n in pdf.groupby("k").size().items() if n < 1_000 and k != 0]
    assert all(fan[k] == 1 for k in cold)


def test_salting_is_deterministic(spark, skewed):
    df, _ = skewed
    counts = df.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    a = salted_key(df, "k", counts, 1_000, "rid").select("rid", "salted_key")
    b = salted_key(df.repartition(13), "k", counts, 1_000, "rid").select(
        "rid", "salted_key"
    )
    assert {tuple(r) for r in a.collect()} == {tuple(r) for r in b.collect()}
