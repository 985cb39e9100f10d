"""Property tests for the planar geometry kernels (hypothesis) and WKB
round-trips."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from chopin_spark.geom.core import (
    clip_polygon_rect,
    pad_rect,
    points_in_polygon,
    points_in_rect,
    polygon_area,
    polygon_perimeter,
    polsby_popper,
    rect_intersection_area,
)
from chopin_spark.geom.wkb import decode, point_wkb, polygon_wkb, rect_wkb, wkt

coord = st.floats(-1e6, 1e6, allow_nan=False, allow_infinity=False)


@given(coord, coord)
@settings(max_examples=200, deadline=None)
def test_point_wkb_roundtrip(x, y):
    kind, (gx, gy) = decode(point_wkb(x, y))
    assert kind == "point" and gx == x and gy == y


@given(
    st.floats(0, 1e5), st.floats(0, 1e5),
    st.floats(1.0, 1e5), st.floats(1.0, 1e5),
)
@settings(max_examples=100, deadline=None)
def test_rect_wkb_roundtrip_and_area(x0, y0, w, h):
    buf = rect_wkb(x0, y0, x0 + w, y0 + h)
    kind, ring = decode(buf)
    assert kind == "polygon"
    # shoelace rounding grows with the coordinate magnitude (terms are
    # x·y products that mostly cancel): bound = O(n·eps·max|x·y|)
    tol = 64 * 2.3e-16 * (abs(x0) + w + 1.0) * (abs(y0) + h + 1.0)
    assert abs(polygon_area(ring) - w * h) <= tol
    assert wkt(buf).startswith("POLYGON ((")


@given(
    st.floats(0, 9e4), st.floats(0, 9e4),
    st.floats(1e3, 5e4), st.floats(1e3, 5e4),
    st.floats(0, 1e5), st.floats(0, 1e5),
)
@settings(max_examples=200, deadline=None)
def test_pip_rect_agrees_with_ray_cast(x0, y0, w, h, px, py):
    """Ray-cast PIP on an axis-aligned rectangle must agree with direct
    rect membership away from the boundary."""
    ring = np.array(
        [[x0, y0], [x0 + w, y0], [x0 + w, y0 + h], [x0, y0 + h]]
    )
    on_edge = (
        min(abs(px - x0), abs(px - (x0 + w))) < 1e-9
        or min(abs(py - y0), abs(py - (y0 + h))) < 1e-9
    )
    if on_edge:
        return
    got = points_in_polygon(np.array([px]), np.array([py]), ring)[0]
    want = points_in_rect(
        np.array([px]), np.array([py]), x0, y0, x0 + w, y0 + h
    )[0]
    assert got == want


@given(
    st.floats(0, 5e4), st.floats(0, 5e4),
    st.floats(1e3, 5e4), st.floats(1e3, 5e4),
    st.floats(0, 5e4), st.floats(0, 5e4),
    st.floats(1e3, 5e4), st.floats(1e3, 5e4),
)
@settings(max_examples=200, deadline=None)
def test_clip_area_equals_rect_intersection(ax, ay, aw, ah, bx, by, bw, bh):
    """Sutherland–Hodgman clip of rect A by rect B: area equals the
    closed-form rectangle intersection."""
    ring = np.array(
        [[ax, ay], [ax + aw, ay], [ax + aw, ay + ah], [ax, ay + ah]]
    )
    clipped = clip_polygon_rect(ring, bx, by, bx + bw, by + bh)
    want = rect_intersection_area(
        (ax, ay, ax + aw, ay + ah), (bx, by, bx + bw, by + bh)
    )
    got = polygon_area(clipped) if len(clipped) >= 3 else 0.0
    # FP error of the clip is a few ulps of cmax² (shoelace products),
    # NOT of the area — a sliver intersection at 5e4-scale coords
    # carries ~5e-6 absolute noise, so the bound must scale with the
    # coordinate magnitude, not just the result.
    cmax = max(ax + aw, ay + ah, bx + bw, by + bh)
    tol = 1e-6 * max(1.0, want) + 64 * np.finfo(float).eps * cmax * cmax
    assert abs(got - want) <= tol


def test_polsby_popper_square_vs_strip():
    sq = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], dtype=float)
    strip = np.array([[0, 0], [10, 0], [10, 0.1], [0, 0.1]], dtype=float)
    assert polsby_popper(sq) > 0.7
    assert polsby_popper(strip) < 0.1
    assert polygon_perimeter(sq) == 4.0


def test_pad_rect_exactness():
    assert pad_rect(0, 0, 10, 10, 2.5) == (-2.5, -2.5, 12.5, 12.5)


# --- general polygon × polygon clip (C5) ------------------------------------


def test_clip_polygon_convex_squares():
    import pytest

    from chopin_spark.geom.core import (
        clip_polygon_convex,
        polygon_intersection_area,
    )

    a = np.array([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 2.0]])
    b = np.array([[1.0, 1.0], [3.0, 1.0], [3.0, 3.0], [1.0, 3.0]])
    assert polygon_intersection_area(a, b) == pytest.approx(1.0)
    # disjoint -> empty
    c = np.array([[10.0, 10.0], [11.0, 10.0], [11.0, 11.0], [10.0, 11.0]])
    assert polygon_intersection_area(a, c) == 0.0
    assert len(clip_polygon_convex(a, c)) == 0
    # containment: clip window covers subject entirely
    big = np.array([[-5.0, -5.0], [5.0, -5.0], [5.0, 5.0], [-5.0, 5.0]])
    assert polygon_intersection_area(a, big) == pytest.approx(4.0)


def test_clip_polygon_convex_octagon_identities():
    """The summarize_aw_polygons fixture identity: with offsets inside
    the chamfer-disjoint window, each zone∩source area equals the
    closed form lx·ly − CX·CY (the proof obligation behind the
    oracle)."""
    from chopin_spark.geom.core import polygon_intersection_area
    from chopin_spark.queries.polygons import _CX, _CY, octagon_ring
    import chopin_spark.zones as Z

    W, H = Z.TRACT_W, Z.TRACT_H
    rng = np.random.default_rng(5)
    for _ in range(50):
        dx = _CX + (W - 3 * _CX) * rng.random()
        dy = _CY + (H - 3 * _CY) * rng.random()
        src = octagon_ring(dx, dy, dx + W, dy + H)
        for di, dj, lx, ly in [
            (0, 0, W - dx, H - dy),
            (1, 0, dx, H - dy),
            (0, 1, W - dx, dy),
            (1, 1, dx, dy),
        ]:
            zone = octagon_ring(di * W, dj * H, (di + 1) * W, (dj + 1) * H)
            got = polygon_intersection_area(src, zone)
            assert got == pytest.approx(lx * ly - _CX * _CY, abs=1e-3)


def test_triangulate_ring_partitions_area():
    from chopin_spark.geom.core import polygon_area, triangulate_ring

    lshape = np.array(
        [[0.0, 0.0], [2.0, 0.0], [2.0, 1.0], [1.0, 1.0], [1.0, 2.0], [0.0, 2.0]]
    )
    tris = triangulate_ring(lshape)
    assert len(tris) == 4
    assert sum(polygon_area(t) for t in tris) == pytest.approx(3.0)
    # clockwise input normalizes
    tris_cw = triangulate_ring(lshape[::-1])
    assert sum(polygon_area(t) for t in tris_cw) == pytest.approx(3.0)
    # convex ring still partitions
    sq = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    assert sum(polygon_area(t) for t in triangulate_ring(sq)) == pytest.approx(1.0)


def test_concave_intersection_vs_rect_decomposition():
    """polygon_intersection_area_general (ear-clip + per-triangle S–H)
    against an independent disjoint-rect decomposition oracle, for
    random concave U-shapes × rects and U × U — the machinery behind
    summarize_aw_lshapes."""
    from chopin_spark.geom.core import (
        polygon_intersection_area_general,
        rect_intersection_area,
    )

    def mk_u(rng):
        x0, y0 = rng.uniform(0, 2, 2)
        w, h = rng.uniform(1.5, 3, 2)
        nx0 = x0 + rng.uniform(0.2, w - 0.6)
        nw = rng.uniform(0.2, x0 + w - nx0 - 0.2)
        nd = rng.uniform(0.3, h - 0.3)
        ring = np.array(
            [
                [x0, y0], [x0 + w, y0], [x0 + w, y0 + h],
                [nx0 + nw, y0 + h], [nx0 + nw, y0 + h - nd],
                [nx0, y0 + h - nd], [nx0, y0 + h], [x0, y0 + h],
            ]
        )
        rects = [
            (x0, y0, x0 + w, y0 + h - nd),
            (x0, y0 + h - nd, nx0, y0 + h),
            (nx0 + nw, y0 + h - nd, x0 + w, y0 + h),
        ]
        return ring, rects

    rng = np.random.default_rng(23)
    for _ in range(60):
        u1, r1 = mk_u(rng)
        u2, r2 = mk_u(rng)
        want = sum(rect_intersection_area(a, b) for a in r1 for b in r2)
        assert polygon_intersection_area_general(u1, u2) == pytest.approx(
            want, abs=1e-9
        )
        assert polygon_intersection_area_general(u2, u1) == pytest.approx(
            want, abs=1e-9
        )


def test_lshape_quantum_certificate():
    """The summarize_aw_lshapes Q=2 lattice is flip-free: closed-form
    areas sit ≥ 2.5e-3 units from a FLOOR(+0.5) boundary, the general
    clip drifts ≤ 1e-3 units — measured over the whole fixture."""
    from chopin_spark.geom.core import (
        polygon_intersection_area_general,
        rect_intersection_area,
    )
    import chopin_spark.zones as Z

    W, H = Z.TRACT_W, Z.TRACT_H
    Q = 2.0
    worst_margin, worst_drift = 1.0, 0.0
    for sid in range(1, 61):
        ti = (sid * 48271) % 14 + 1
        tj = (sid * 16807) % 14 + 1
        dx = W * (((sid * 40692) % 9973) / 9973.0) * 0.9 + 0.05 * W
        dy = H * (((sid * 69621) % 9973) / 9973.0) * 0.9 + 0.05 * H
        sx0, sy0 = ti * W + dx, tj * H + dy
        src = (sx0, sy0, sx0 + W, sy0 + H)
        src_ring = np.array(
            [[src[0], src[1]], [src[2], src[1]], [src[2], src[3]], [src[0], src[3]]]
        )
        for di in (0, 1):
            for dj in (0, 1):
                zx0, zy0 = (ti + di) * W, (tj + dj) * H
                want = rect_intersection_area(
                    (zx0, zy0, zx0 + W, zy0 + H / 2), src
                ) + rect_intersection_area(
                    (zx0, zy0 + H / 2, zx0 + W / 2, zy0 + H), src
                )
                l_ring = np.array(
                    [
                        [zx0, zy0], [zx0 + W, zy0], [zx0 + W, zy0 + H / 2],
                        [zx0 + W / 2, zy0 + H / 2], [zx0 + W / 2, zy0 + H],
                        [zx0, zy0 + H],
                    ]
                )
                got = polygon_intersection_area_general(src_ring, l_ring)
                worst_drift = max(worst_drift, abs(got - want) * Q)
                if want > 0:
                    f = (want * Q + 0.5) % 1.0
                    worst_margin = min(worst_margin, min(f, 1.0 - f))
    assert worst_margin > 2.5e-3
    assert worst_drift < 1e-3
    assert worst_margin > 2 * worst_drift


def test_polylabel_pole_is_interior_and_locally_optimal():
    """Every zone's pole must be strictly inside its holed octagon with
    the reported clearance equal to an independent python min-segment
    distance, and no coarse-grid probe point may beat it by more than
    the final cell diagonal (the beam's admissibility bound)."""
    import math

    import duckdb

    from chopin_spark.queries.polygons import (
        _CX, _CY, _HH, _HW, _PL_H, _PL_ROUNDS, _PL_W, _pl_oracle,
    )

    rows = duckdb.connect().execute(_pl_oracle()).fetchall()
    assert len(rows) == 48

    def hole_off(z):
        return (((z * 7) % 5) - 2.0) * 0.05 * _PL_W, \
               (((z * 11) % 5) - 2.0) * 0.05 * _PL_H

    def edges(z):
        ox, oy = hole_off(z)
        oct_ = [(_CX, 0.0), (_PL_W - _CX, 0.0), (_PL_W, _CY),
                (_PL_W, _PL_H - _CY), (_PL_W - _CX, _PL_H), (_CX, _PL_H),
                (0.0, _PL_H - _CY), (0.0, _CY)]
        segs = list(zip(oct_, oct_[1:] + oct_[:1]))
        hcx, hcy = _PL_W / 2.0 + ox, _PL_H / 2.0 + oy
        hole = [(hcx - _HW, hcy - _HH), (hcx + _HW, hcy - _HH),
                (hcx + _HW, hcy + _HH), (hcx - _HW, hcy + _HH)]
        segs += list(zip(hole, hole[1:] + hole[:1]))
        return segs

    def seg_dist(px, py, a, b):
        ax, ay = a
        bx, by = b
        l2 = (bx - ax) ** 2 + (by - ay) ** 2
        t = max(0.0, min(1.0, ((px - ax) * (bx - ax)
                               + (py - ay) * (by - ay)) / l2))
        return math.hypot(px - (ax + t * (bx - ax)),
                          py - (ay + t * (by - ay)))

    def inside(px, py, z):
        ox, oy = hole_off(z)
        u, v = px, py
        octin = (u * _CY + v * _CX > _CX * _CY
                 and (_PL_W - u) * _CY + v * _CX > _CX * _CY
                 and u * _CY + (_PL_H - v) * _CX > _CX * _CY
                 and (_PL_W - u) * _CY + (_PL_H - v) * _CX > _CX * _CY)
        inhole = (abs(u - _PL_W / 2.0 - ox) < _HW
                  and abs(v - _PL_H / 2.0 - oy) < _HH)
        return octin and not inhole

    diag = math.hypot(_PL_W / 4.0 / 2 ** (_PL_ROUNDS - 1),
                      _PL_H / 4.0 / 2 ** (_PL_ROUNDS - 1))
    for z, lx, ly, d in rows:
        assert inside(lx, ly, z), (z, lx, ly)
        ref = min(seg_dist(lx, ly, a, b) for a, b in edges(z))
        assert abs(ref - d) < 2e-3, (z, ref, d)
        assert d > 0.1 * _PL_H
        # probe a 25x25 grid: nothing may beat the pole by > one cell
        # diagonal (admissible-bound guarantee of the final round)
        best = max(
            (min(seg_dist(px, py, a, b) for a, b in edges(z))
             for px in [(i + 0.5) * _PL_W / 25 for i in range(25)]
             for py in [(j + 0.5) * _PL_H / 25 for j in range(25)]
             if inside(px, py, z)),
        )
        assert best <= d + diag, (z, best, d, diag)
