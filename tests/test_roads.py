"""Point-to-LINESTRING nearest join (VERDICT r02 next-steps #1):
WKB line decode, segment explode, and exactness of nearest_line_join
vs numpy brute force at two grid sizes (partitioned == unpartitioned).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from chopin_spark.geom.core import point_segment_distance
from chopin_spark.geom.wkb import (
    decode,
    line_parts,
    linestring_wkb,
    multilinestring_wkb,
    wkt,
)
from chopin_spark.grid import make_regular_grid
from chopin_spark.roads import nearest_line_join, segments_from_lines


def test_wkb_linestring_roundtrip():
    v = np.array([[0.0, 1.0], [2.0, 3.0], [4.0, 0.5]])
    kind, got = decode(linestring_wkb(v))
    assert kind == "linestring"
    np.testing.assert_array_equal(got, v)
    assert wkt(linestring_wkb(v)).startswith("LINESTRING (0.000000 1.000000")


def test_wkb_multilinestring_roundtrip():
    a = np.array([[0.0, 0.0], [1.0, 1.0]])
    b = np.array([[5.0, 5.0], [6.0, 5.0], [6.0, 7.0]])
    buf = multilinestring_wkb([a, b])
    kind, got = decode(buf)
    assert kind == "multilinestring"
    assert len(got) == 2
    np.testing.assert_array_equal(got[0], a)
    np.testing.assert_array_equal(got[1], b)
    assert line_parts(buf)[1].shape == (3, 2)
    assert wkt(buf).startswith("MULTILINESTRING ((0.000000 0.000000")


def test_point_segment_distance_cases():
    # interior projection, endpoint clamp, degenerate segment
    d = point_segment_distance(
        np.array([1.0, -1.0, 3.0]),
        np.array([1.0, 0.0, 0.0]),
        np.array([0.0, 0.0, 2.0]),
        np.array([0.0, 0.0, 2.0]),
        np.array([2.0, 2.0, 2.0]),
        np.array([0.0, 0.0, 2.0]),
    )
    assert d[0] == pytest.approx(1.0)          # above the middle
    assert d[1] == pytest.approx(1.0)          # beyond endpoint a
    assert d[2] == pytest.approx(np.hypot(1.0, 2.0))  # zero-length seg


def _fixture_roads(rng, n_roads=12, n_verts=4):
    roads = []
    for _ in range(n_roads):
        anchor = rng.uniform([100_000, 100_000], [700_000, 500_000])
        offs = rng.uniform(-40_000, 40_000, size=(n_verts, 2))
        roads.append(anchor + np.cumsum(offs, axis=0))
    return roads


@pytest.fixture(scope="module")
def roads_case(spark):
    rng = np.random.default_rng(17)
    roads = _fixture_roads(rng)
    lines = spark.createDataFrame(
        [(i, bytearray(linestring_wkb(v))) for i, v in enumerate(roads)],
        "line_id long, geom binary",
    )
    segs = segments_from_lines(lines, "line_id", "geom")
    px = rng.uniform(0, 800_000, 400)
    py = rng.uniform(0, 600_000, 400)
    pts = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(px, py))],
        "pid long, x double, y double",
    )
    return roads, segs, pts, px, py


def _brute_nearest(roads, px, py):
    """numpy oracle: nearest line per point, ties by line_id."""
    best_d = np.full(len(px), np.inf)
    best_id = np.full(len(px), -1)
    for lid, v in enumerate(roads):
        for i in range(len(v) - 1):
            d = point_segment_distance(
                px, py, v[i, 0], v[i, 1], v[i + 1, 0], v[i + 1, 1]
            )
            upd = d < best_d
            best_d = np.where(upd, d, best_d)
            best_id = np.where(upd, lid, best_id)
    return best_id, best_d


def test_segments_explode_count(roads_case):
    roads, segs, *_ = roads_case
    assert segs.count() == sum(len(v) - 1 for v in roads)
    row = segs.filter("line_id = 3 AND seg = 1").collect()[0]
    assert row["ax"] == pytest.approx(roads[3][1, 0])
    assert row["by"] == pytest.approx(roads[3][2, 1])


@pytest.mark.parametrize("gnx,gny", [(8, 6), (16, 12)])
def test_nearest_line_exact_two_grids(spark, roads_case, gnx, gny):
    """Exact at every grid size — the par_grid partitioned ==
    unpartitioned invariant, vs an independent numpy brute force."""
    roads, segs, pts, px, py = roads_case
    g = make_regular_grid(gnx, gny, pad=0.0)
    want_id, want_d = _brute_nearest(roads, px, py)
    got = {
        r["pid"]: (r["nn_id"], r["nn_dist"])
        for r in nearest_line_join(pts, segs, g, "pid", 30_000.0).collect()
    }
    assert len(got) == len(px)
    for i in range(len(px)):
        assert got[i][0] == want_id[i], f"pid {i}"
        assert got[i][1] == pytest.approx(want_d[i], rel=1e-12)


def test_nearest_line_no_broadcast_needed(spark, roads_case):
    """Fallback plans with auto-broadcast disabled: no forced
    BroadcastExchange, no cartesian product."""
    roads, segs, pts, *_ = roads_case
    g = make_regular_grid(8, 6, pad=0.0)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = nearest_line_join(pts, segs, g, "pid", 30_000.0)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan
        assert "CartesianProduct" not in plan
        assert df.count() == 400
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _brute_knn_lines(roads, px, py, k):
    per_line = np.stack(
        [
            np.min(
                np.stack(
                    [
                        point_segment_distance(
                            px, py, v[i, 0], v[i, 1], v[i + 1, 0], v[i + 1, 1]
                        )
                        for i in range(len(v) - 1)
                    ]
                ),
                axis=0,
            )
            for v in roads
        ]
    )  # (n_roads, n_pts)
    out = {}
    for p in range(len(px)):
        order = sorted((float(per_line[r, p]), r) for r in range(len(roads)))
        out[p] = order[:k]
    return out


@pytest.mark.parametrize("gnx,gny", [(8, 6), (16, 12)])
def test_knn_lines_exact_two_grids(spark, roads_case, gnx, gny):
    from chopin_spark.roads import knn_line_join

    roads, segs, pts, px, py = roads_case
    g = make_regular_grid(gnx, gny, pad=0.0)
    want = _brute_knn_lines(roads, px, py, 3)
    rows = knn_line_join(pts, segs, g, "pid", 30_000.0, k=3).collect()
    got = {}
    for r in rows:
        got.setdefault(r["pid"], []).append((r["rank"], r["nn_id"], r["nn_dist"]))
    assert len(got) == len(px)
    for pid, triples in got.items():
        triples.sort()
        assert [t[1] for t in triples] == [r for _, r in want[pid]]
        for t, (dist, _) in zip(triples, want[pid]):
            assert t[2] == pytest.approx(dist, rel=1e-12)


def test_extract_at_lines_traversal_connected(spark):
    """Half-pixel stepping means consecutive samples move < one pixel
    edge per axis, so each segment's pixel chain must be 8-connected —
    no holes along the line — and every vertex pixel must be present."""
    import math

    from chopin_spark.queries.roads import (
        _LSTEP, _N_ROADS, _N_SEGS, extract_at_lines,
    )
    from chopin_spark.queries.roads import road_segments
    from chopin_spark.raster import PH, PW
    from tests.conftest import SF_CORRECT

    segs = road_segments(spark).collect()
    got = {
        r["line_id"]: r["n_pixels"]
        for r in extract_at_lines(spark, SF_CORRECT).collect()
    }
    assert len(got) == _N_ROADS

    pix_by_line: dict[int, set] = {}
    for s in segs:
        n = max(1, math.ceil(
            math.hypot(s.bx - s.ax, s.by - s.ay) / _LSTEP
        ))
        prev = None
        for k in range(n + 1):
            t = k / n
            ij = (
                math.floor((s.ax + t * (s.bx - s.ax)) / PW),
                math.floor((s.ay + t * (s.by - s.ay)) / PH),
            )
            if prev is not None:
                assert abs(ij[0] - prev[0]) <= 1
                assert abs(ij[1] - prev[1]) <= 1
            prev = ij
            pix_by_line.setdefault(s.line_id, set()).add(ij)
    # the numpy replay agrees with the engine's per-line pixel counts
    assert got == {lid: len(p) for lid, p in pix_by_line.items()}


def test_seg_intersect_sql_geometry(spark):
    """Orientation-test kernel semantics on constructed cases: a true
    crossing yields the exact intersection point; endpoint touches,
    collinear overlaps and disjoint parallels are excluded (strict
    sign test — what makes the t = d3/(d3-d4) division provably safe)."""
    from chopin_spark.roads import seg_intersect_sql

    cond, ix, iy = seg_intersect_sql(
        "ax", "ay", "bx", "by", "cx", "cy", "dx", "dy"
    )
    cases = [
        # X-cross at (1, 1)
        ((0.0, 0.0, 2.0, 2.0, 0.0, 2.0, 2.0, 0.0), (1.0, 1.0)),
        # T-touch: CD ends ON AB -> excluded (d1*d2 == 0)
        ((0.0, 0.0, 2.0, 0.0, 1.0, 0.0, 1.0, 2.0), None),
        # shared endpoint -> excluded
        ((0.0, 0.0, 2.0, 2.0, 2.0, 2.0, 3.0, 0.0), None),
        # collinear overlap -> excluded
        ((0.0, 0.0, 2.0, 0.0, 1.0, 0.0, 3.0, 0.0), None),
        # disjoint parallel -> excluded
        ((0.0, 0.0, 2.0, 0.0, 0.0, 1.0, 2.0, 1.0), None),
        # asymmetric cross: AB from (0,0)-(4,2), CD vertical x=1 ->
        # crossing at (1, 0.5)
        ((0.0, 0.0, 4.0, 2.0, 1.0, -1.0, 1.0, 1.0), (1.0, 0.5)),
    ]
    rows = [
        dict(zip("ax ay bx by cx cy dx dy".split(), c[0])) for c in cases
    ]
    import pandas as pd

    df = spark.createDataFrame(pd.DataFrame(rows)).selectExpr(
        f"CASE WHEN {cond} THEN array({ix}, {iy}) END AS pt"
    )
    got = [r["pt"] and tuple(r["pt"]) for r in df.collect()]
    assert got == [c[1] for c in cases]


def test_nearest_road_chainage_brute_force(spark):
    """Chainage == driver-side brute force (numpy) at sf0.001:
    same nearest segment, same clamped-t offset along the polyline,
    chainage bounded by total road length."""
    from chopin_spark.queries.roads import (
        _N_ROADS, _N_SEGS, nearest_road_chainage, road_segments,
    )
    from chopin_spark.tables import load
    from chopin_spark.sqlexpr import x_expr, y_expr

    sf = "/root/testdata/sf0.001"
    segs = {}
    for r in road_segments(spark, _N_ROADS).collect():
        segs.setdefault(r.line_id, {})[r.seg] = (r.ax, r.ay, r.bx, r.by)

    docs = load(spark, sf, "documents").selectExpr(
        "doc_id", f"{x_expr('doc_id')} AS x", f"{y_expr('doc_id')} AS y"
    ).collect()

    def seg_dist_t(px, py, ax, ay, bx, by):
        dx, dy = bx - ax, by - ay
        wx, wy = px - ax, py - ay
        l2 = dx * dx + dy * dy
        t = 0.0 if l2 == 0.0 else min(max((wx * dx + wy * dy) / l2, 0.0), 1.0)
        ex, ey = wx - t * dx, wy - t * dy
        return (ex * ex + ey * ey) ** 0.5, t

    ref = {}
    totlen = {}
    for lid, ss in segs.items():
        totlen[lid] = sum(
            ((b[2] - b[0]) ** 2 + (b[3] - b[1]) ** 2) ** 0.5
            for b in ss.values()
        )
    for d in docs:
        best = None
        for lid, ss in segs.items():
            cum = 0.0
            for k in range(_N_SEGS):
                ax, ay, bx, by = ss[k]
                dist, t = seg_dist_t(d.x, d.y, ax, ay, bx, by)
                ln = ((bx - ax) ** 2 + (by - ay) ** 2) ** 0.5
                key = (dist, lid, k)
                if best is None or key < best[0]:
                    best = (key, cum + t * ln)
                cum += ln
        ref[d.doc_id] = (best[0][1], best[0][2],
                         round(best[1], 4), round(best[0][0], 4))

    rows = nearest_road_chainage(spark, sf).collect()
    assert len(rows) == len(docs)
    for r in rows:
        rl, rs, rc, rd = ref[r.doc_id]
        assert (r.road_id, r.seg) == (rl, rs), r.doc_id
        assert abs(r.chainage_m - rc) < 1e-6, r.doc_id
        assert abs(r.dist_m - rd) < 1e-6, r.doc_id
        # chainage_m is rounded to 4 decimals; allow the half-step
        assert -1e-9 <= r.chainage_m <= totlen[r.road_id] + 5e-5


def test_route_trace_is_contiguous_strict_descent(spark):
    """The worst-served route trace must be a CONNECTED chain in the
    planarized graph with strictly decreasing network distance — a
    semantic property the value-hash oracle can't express directly."""
    from chopin_spark.queries.networkq import (
        _net_e2_seeds, road_route_farthest_trace,
    )

    sf = "/root/testdata/sf0.01"
    rows = sorted(
        road_route_farthest_trace(spark, sf).collect(),
        key=lambda r: r.step,
    )
    assert rows and rows[0].step == 0
    assert [r.step for r in rows] == list(range(len(rows)))
    dists = [r.dist_mm for r in rows]
    assert all(a > b for a, b in zip(dists, dists[1:]))  # strict descent

    e2, _ = _net_e2_seeds(spark, sf)
    from chopin_spark.queries.networkq import _K
    adj = {
        (r.src, r.dst)
        for r in e2.select("src", "dst").distinct().collect()
    }
    keys = [r.node_x_mm * _K + r.node_y_mm for r in rows]
    for a, b in zip(keys, keys[1:]):
        assert (a, b) in adj or (b, a) in adj  # consecutive = adjacent
