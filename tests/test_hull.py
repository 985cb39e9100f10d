"""Convex-hull unit tests: known shapes + partition-count invariance
(the hull-of-hulls reduce must be independent of batch boundaries)."""

from __future__ import annotations

import pandas as pd

from chopin_spark.hull import _chain, convex_hull_stats


def test_chain_square_with_interior_and_collinear():
    pts = [
        (0, 0), (10, 0), (10, 10), (0, 10),  # square corners
        (5, 5), (3, 7),                      # interior
        (5, 0), (10, 5),                     # collinear edge middles
        (0, 0),                              # duplicate
    ]
    hull = _chain(pts)
    assert set(hull) == {(0, 0), (10, 0), (10, 10), (0, 10)}
    # CCW orientation: shoelace positive
    area2 = sum(
        hull[i][0] * hull[(i + 1) % 4][1]
        - hull[i][1] * hull[(i + 1) % 4][0]
        for i in range(4)
    )
    assert area2 == 200


def test_chain_collinear_degenerate():
    assert set(_chain([(0, 0), (5, 5), (10, 10)])) == {(0, 0), (10, 10)}


def _stats_df(spark, rows, nparts):
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["zone_id", "ix", "iy"]),
        "zone_id BIGINT, ix BIGINT, iy BIGINT",
    ).repartition(nparts)
    out = convex_hull_stats(df).collect()
    return {
        r["zone_id"]: (r["n_vertices"], r["area2"], r["perim_m"])
        for r in out
    }


def test_partition_invariance(spark):
    # ring of 12 points + interiors in zone 0; triangle in zone 1
    import math

    rows = []
    for k in range(12):
        a = 2.0 * math.pi * k / 12
        rows.append((0, round(1000 + 500 * math.cos(a)),
                     round(1000 + 500 * math.sin(a))))
    rows += [(0, 1000, 1000), (0, 1100, 900)]
    rows += [(1, 0, 0), (1, 100, 0), (1, 0, 100)]
    r1 = _stats_df(spark, rows, 1)
    r8 = _stats_df(spark, rows, 8)
    assert r1 == r8
    assert r1[1] == (3, 10000, round(200 + 100 * 2 ** 0.5, 4))


def test_single_point_zone_emits_nothing(spark):
    assert _stats_df(spark, [(5, 7, 7), (5, 7, 7)], 2) == {}
