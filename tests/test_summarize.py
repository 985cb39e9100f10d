"""C7 dispatcher tests: the three dispatch branches agree with their
direct declarative equivalents; wrong inputs error like the reference."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from chopin_spark.grid import make_regular_grid
from chopin_spark.summarize import summarize_st
from chopin_spark.zones import zones_df
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_SMOKE}/events.parquet")


@pytest.fixture(scope="module")
def pts(spark):
    rng = np.random.default_rng(17)
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "id": np.arange(1000),
                "x": rng.uniform(0, 8e5, 1000),
                "y": rng.uniform(0, 6e5, 1000),
                "v": rng.gamma(2.0, 3.0, 1000).round(6),
            }
        )
    )


def test_time_dispatch_matches_direct(spark, events):
    got = {
        (r["event_type"], r["time_group"]): (
            r["value_mean"], r["user_id_mean"]
        )
        for r in summarize_st(events, "hour", id_col="event_type").collect()
    }
    want = {
        (r["event_type"], r["tg"]): (r["vm"], r["um"])
        for r in events.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("tg")
        )
        .agg(
            F.round(F.avg("value"), 4).alias("vm"),
            F.round(F.avg("user_id"), 4).alias("um"),
        )
        .collect()
    }
    # event_id is also numeric and aggregated; compare the shared keys
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k]


def test_grid_dispatch_matches_direct(spark, pts):
    g = make_regular_grid(4, 3)
    got = {
        r["cgridid"]: (r["id_mean"], r["v_mean"])
        for r in summarize_st(pts, g).collect()
    }
    want = {
        r["cgridid"]: (r["im"], r["vm"])
        for r in g.assign_core(pts)
        .groupBy("cgridid")
        .agg(
            F.round(F.avg("id"), 4).alias("im"),
            F.round(F.avg("v"), 4).alias("vm"),
        )
        .collect()
    }
    assert got == want


def test_zone_dispatch_counts_everything(spark, pts):
    zones = zones_df(spark).select("zone_id", "xmin", "ymin", "xmax", "ymax")
    out = summarize_st(pts, zones, id_col="id").collect()
    # exhaustive partition: zone means weight-average back to the total
    assert 0 < len(out) <= 256
    assert {c for c in out[0].asDict()} == {"zone_id", "v_mean"}


def test_multiple_timestamp_columns_rejected(spark, events):
    two_ts = events.withColumn("ts2", F.col("ts"))
    with pytest.raises(ValueError, match="exactly one timestamp"):
        summarize_st(two_ts, "hour")


def test_unknown_unit_rejected(spark, events):
    with pytest.raises(ValueError, match="unknown time unit"):
        summarize_st(events, "fortnight")


def test_ivf_recall_on_clustered(spark):
    from chopin_spark.simsearch import ivf_topk

    rng = np.random.default_rng(9)
    cents = rng.normal(size=(20, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(20):
        for _ in range(25):
            v = cents[c] + rng.normal(scale=0.05, size=64)
            rows.append(
                {"vec_id": vid, "label": c, "embedding": [float(x) for x in v]}
            )
            vid += 1
    df = spark.createDataFrame(pd.DataFrame(rows))
    m = np.array([r["embedding"] for r in rows])
    q = m[0]
    cos = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    true_top = {
        i
        for _, i in sorted(
            (round(-c, 4), r["vec_id"])
            for c, r in zip(cos, rows)
            if r["vec_id"] != 0
        )[:10]
    }
    got = {r["vec_id"] for r in ivf_topk(df, 0, 10, nprobe=2).collect()}
    assert len(got & true_top) >= 9  # query's own cluster is probed


def test_summarize_st_reference_golden(spark):
    """Transliteration of chopin's own testthat case
    (/root/reference/tests/testthat/test-processing.R:770-800): the
    exact 4-row fixture must floor to two hourly groups with means
    value=(2, 12) and other_value=(3, 21), non-numeric `label`
    dropped, timestamps floored to 00:00 and 01:00 UTC."""
    import datetime as dt

    pdf = pd.DataFrame(
        {
            "id": [1, 1, 2, 2],
            "observed_at": pd.to_datetime(
                [
                    "2024-01-01 00:10:00",
                    "2024-01-01 00:40:00",
                    "2024-01-01 01:05:00",
                    "2024-01-01 01:20:00",
                ]
            ),
            "value": [1.0, 3.0, 10.0, 14.0],
            "other_value": [2.0, 4.0, 20.0, 22.0],
            "label": ["a", "b", "c", "d"],
        }
    )
    out = summarize_st(
        spark.createDataFrame(pdf), "hour", id_col="id"
    )
    assert sorted(out.columns) == [
        "id", "other_value_mean", "time_group", "value_mean"
    ]
    rows = {r["id"]: r for r in out.collect()}
    assert len(rows) == 2
    assert rows[1]["value_mean"] == 2.0 and rows[1]["other_value_mean"] == 3.0
    assert rows[2]["value_mean"] == 12.0 and rows[2]["other_value_mean"] == 21.0
    assert rows[1]["time_group"] == dt.datetime(2024, 1, 1, 0, 0)
    assert rows[2]["time_group"] == dt.datetime(2024, 1, 1, 1, 0)


def test_packed_ordinal_integer_decode(spark):
    """host_latest_snapshot regression: ord ≈ 1.7e16 > 2^53, so the
    double-division decode can round across the floor boundary; the
    integer DIV decode must be exact for every edge alignment."""
    rows = []
    for epoch in (1704067200, 1735689599):
        for doc_id in (0, 1, 2, 9_999_998, 9_999_999):
            rows.append((epoch * 10_000_000 + doc_id, epoch, doc_id))
    df = spark.createDataFrame(
        rows, "ord LONG, epoch LONG, doc_id LONG"
    )
    got = df.selectExpr(
        "CAST(ord DIV 10000000 AS BIGINT) AS e",
        "CAST(ord % 10000000 AS BIGINT) AS d",
        "epoch", "doc_id",
    ).collect()
    for r in got:
        assert r["e"] == r["epoch"] and r["d"] == r["doc_id"]
