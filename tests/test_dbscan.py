"""DBSCAN unit tests: hand-built patterns with known labels, plus the
sf0.001 role-mix pin (parameter-regression guard for dbscan_docs)."""

from __future__ import annotations

import pandas as pd

from chopin_spark.dbscan import dbscan
from chopin_spark.grid import make_regular_grid


def _run(spark, pts, eps, min_pts, nx=4, ny=4):
    df = spark.createDataFrame(
        pd.DataFrame(pts, columns=["pid", "x", "y"]),
        "pid BIGINT, x DOUBLE, y DOUBLE",
    )
    g = make_regular_grid(
        nx, ny, pad=eps, extent=(0.0, 0.0, 800_000.0, 600_000.0)
    )
    out = dbscan(df, g, "pid", eps=eps, min_pts=min_pts)
    return {r["pid"]: (r["cluster_id"], r["role"]) for r in out.collect()}


def test_two_blobs_and_noise(spark):
    # blob A: 4 mutually-close points; blob B: 4 more, far away;
    # one isolated noise point
    a = [(i, 100_000.0 + 10.0 * i, 100_000.0) for i in range(4)]
    b = [(10 + i, 700_000.0 + 10.0 * i, 500_000.0) for i in range(4)]
    n = [(99, 400_000.0, 300_000.0)]
    got = _run(spark, a + b + n, eps=1_000.0, min_pts=4)
    assert all(got[i] == (0, "core") for i in range(4))
    assert all(got[10 + i] == (10, "core") for i in range(4))
    assert got[99] == (-1, "noise")


def test_border_point_min_cluster_rule(spark):
    # core triangle {0,1,2} (each sees 3 others within eps via point 3);
    # point 3 is within eps of the cores but has too few neighbors of
    # its own only if min_pts demands more than it sees — construct:
    # chain where 50 is within eps of core 0 but sees only 1 neighbor
    core = [(i, 100_000.0 + 10.0 * i, 100_000.0) for i in range(4)]
    border = [(50, 100_000.0 + 30.0 + 900.0, 100_000.0)]  # near core 3 only
    got = _run(spark, core + border, eps=1_000.0, min_pts=4)
    assert all(got[i] == (0, "core") for i in range(4))
    # 50 sees all 4 cores (within 1 km) -> actually 4 neighbors => core?
    # distances: to core i at x=100000+10i, 50 is at 100930 ->
    # 930..900 m, all within eps -> 4 neighbors + self = 5 >= 4: core.
    assert got[50] == (0, "core")


def test_true_border(spark):
    # 3 cores in a tight clump (min_pts=4 counts self), one point at
    # sees only cores 2,3 within eps -> 2 neighbors + self = 3 < 4 -> border
    clump = [(i, 100_000.0 + 5.0 * i, 100_000.0) for i in range(4)]
    brd = [(50, 100_000.0 + 15.0 + 995.0, 100_000.0)]
    got = _run(spark, clump + brd, eps=1_000.0, min_pts=4)
    assert all(got[i][1] == "core" for i in range(4))
    cid, role = got[50]
    assert role == "border" and cid == 0


def test_singleton_core_cluster(spark):
    # min_pts=1: every point is core; isolated point = singleton cluster
    pts = [(0, 100_000.0, 100_000.0), (7, 700_000.0, 500_000.0)]
    got = _run(spark, pts, eps=1_000.0, min_pts=1)
    assert got[0] == (0, "core")
    assert got[7] == (7, "core")


def test_docs_role_mix_sf0001(spark):
    # parameter-regression pin: at sf0.001 (500 docs) the ε=50 km /
    # min_pts=6 choice must exercise all three roles and >1 cluster
    from chopin_spark.queries.vector import dbscan_docs

    out = dbscan_docs(spark, "/root/testdata/sf0.001").toPandas()
    roles = out.groupby("role")["doc_id"].count().to_dict()
    assert roles.get("core", 0) > 0
    assert roles.get("border", 0) > 0
    assert roles.get("noise", 0) > 0
    assert out.loc[out.cluster_id >= 0, "cluster_id"].nunique() > 1
