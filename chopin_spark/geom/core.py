"""Vectorized planar geometry operations (numpy).

Replaces the reference's GEOS/GDAL calls (sf/terra) with exact planar
math. Zones, grid cells, and raster tiles in this engine are
axis-aligned rectangles (quadtree admin hierarchy, FIXTURES.md §2), for
which every operation here is exact; general single-ring polygons are
supported via ray-cast PIP, shoelace area, and Sutherland–Hodgman
rectangle clipping.
"""

from __future__ import annotations

import numpy as np


def points_in_polygon(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Ray-cast point-in-polygon, vectorized over points.

    Half-open on edges in the same way for every caller (a point on a
    shared boundary lands in exactly one polygon of a partition) — the
    engine's fix for the reference's boundary-drop caveat
    (/root/reference/tests/testthat/test-scale_process.R:320-322).
    ring: (n, 2) closed or open.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    r = np.asarray(ring, dtype=np.float64)
    if (r[0] == r[-1]).all():
        r = r[:-1]
    x0, y0 = r[:, 0], r[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    inside = np.zeros(px.shape, dtype=bool)
    for i in range(len(x0)):
        cond = (y0[i] > py) != (y1[i] > py)
        denom = y1[i] - y0[i]
        if denom == 0:
            continue
        xint = x0[i] + (py - y0[i]) * (x1[i] - x0[i]) / denom
        inside ^= cond & (px < xint)
    return inside


def points_in_rect(
    px: np.ndarray, py: np.ndarray, xmin: float, ymin: float, xmax: float, ymax: float
) -> np.ndarray:
    """Half-open rect membership [xmin, xmax) × [ymin, ymax) —
    assignment to a partition of rects is a function, never a relation."""
    return (px >= xmin) & (px < xmax) & (py >= ymin) & (py < ymax)


def polygon_area(ring: np.ndarray) -> float:
    r = np.asarray(ring, dtype=np.float64)
    if (r[0] == r[-1]).all():
        r = r[:-1]
    x, y = r[:, 0], r[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def polygon_perimeter(ring: np.ndarray) -> float:
    r = np.asarray(ring, dtype=np.float64)
    if not (r[0] == r[-1]).all():
        r = np.vstack([r, r[:1]])
    d = np.diff(r, axis=0)
    return float(np.hypot(d[:, 0], d[:, 1]).sum())


def polsby_popper(ring: np.ndarray) -> float:
    """Compactness 4πA/P² — the reference's merged-cell shape test with
    0.3 warning threshold (/root/reference/R/gridding.R:739-760)."""
    p = polygon_perimeter(ring)
    return 0.0 if p == 0 else 4.0 * np.pi * polygon_area(ring) / (p * p)


def clip_polygon_rect(
    ring: np.ndarray, xmin: float, ymin: float, xmax: float, ymax: float
) -> np.ndarray:
    """Sutherland–Hodgman clip of a single ring by an axis-aligned rect.

    Used for polygon-overlay area weights (summarize_aw,
    /root/reference/R/processing.R:799-811) where one side is a
    rect (zone / grid cell / tile)."""
    poly = np.asarray(ring, dtype=np.float64)
    if (poly[0] == poly[-1]).all():
        poly = poly[:-1]

    def clip_edge(pts, inside_fn, intersect_fn):
        if len(pts) == 0:
            return pts
        out = []
        prev = pts[-1]
        prev_in = inside_fn(prev)
        for cur in pts:
            cur_in = inside_fn(cur)
            if cur_in:
                if not prev_in:
                    out.append(intersect_fn(prev, cur))
                out.append(cur)
            elif prev_in:
                out.append(intersect_fn(prev, cur))
            prev, prev_in = cur, cur_in
        return np.array(out) if out else np.empty((0, 2))

    def x_cut(bound):
        def fn(p, c):
            t = (bound - p[0]) / (c[0] - p[0])
            return np.array([bound, p[1] + t * (c[1] - p[1])])

        return fn

    def y_cut(bound):
        def fn(p, c):
            t = (bound - p[1]) / (c[1] - p[1])
            return np.array([p[0] + t * (c[0] - p[0]), bound])

        return fn

    poly = clip_edge(poly, lambda p: p[0] >= xmin, x_cut(xmin))
    poly = clip_edge(poly, lambda p: p[0] <= xmax, x_cut(xmax))
    poly = clip_edge(poly, lambda p: p[1] >= ymin, y_cut(ymin))
    poly = clip_edge(poly, lambda p: p[1] <= ymax, y_cut(ymax))
    return poly


def clip_polygon_convex(subject: np.ndarray, clip: np.ndarray) -> np.ndarray:
    """Sutherland–Hodgman clip of an arbitrary ring by a CONVEX clip
    ring (counter-clockwise) — the polygon×polygon generalization of
    `clip_polygon_rect` (VERDICT r02 next-steps #5; chopin's
    `summarize_aw` intersects arbitrary polygon pairs via
    `terra::intersect`, /root/reference/R/processing.R:799-811).
    Each clip edge (a→b) keeps subject points on its left half-plane
    (cross(b−a, p−a) ≥ 0). Returns the clipped ring (possibly empty).
    """
    poly = np.asarray(subject, dtype=np.float64)
    if len(poly) and (poly[0] == poly[-1]).all():
        poly = poly[:-1]
    c = np.asarray(clip, dtype=np.float64)
    if (c[0] == c[-1]).all():
        c = c[:-1]
    for i in range(len(c)):
        if len(poly) == 0:
            break
        a, b = c[i], c[(i + 1) % len(c)]
        ex, ey = b[0] - a[0], b[1] - a[1]

        def side(p):
            return ex * (p[1] - a[1]) - ey * (p[0] - a[0])

        out = []
        prev = poly[-1]
        prev_s = side(prev)
        for cur in poly:
            cur_s = side(cur)
            if cur_s >= 0:
                if prev_s < 0:
                    t = prev_s / (prev_s - cur_s)
                    out.append(prev + t * (cur - prev))
                out.append(cur)
            elif prev_s >= 0:
                t = prev_s / (prev_s - cur_s)
                out.append(prev + t * (cur - prev))
            prev, prev_s = cur, cur_s
        poly = np.array(out) if out else np.empty((0, 2))
    return poly


def polygon_intersection_area(a: np.ndarray, b: np.ndarray) -> float:
    """Exact area of A∩B for a convex clip ring b (CCW)."""
    clipped = clip_polygon_convex(a, b)
    return 0.0 if len(clipped) < 3 else polygon_area(clipped)


def _signed_area2(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def triangulate_ring(ring: np.ndarray) -> list[np.ndarray]:
    """Ear-clipping triangulation of a SIMPLE ring (convex or concave,
    any orientation; no self-intersections, no holes).  Returns CCW
    (3, 2) triangles partitioning the polygon — the decomposition that
    lets Sutherland–Hodgman (convex clip windows only) serve arbitrary
    simple clip polygons: area(A∩B) = Σ_t area(A∩t) over B's
    triangles, disjoint up to zero-measure edges."""
    r = np.asarray(ring, dtype=np.float64)
    if (r[0] == r[-1]).all():
        r = r[:-1]
    if _signed_area2(r) < 0:
        r = r[::-1].copy()
    idx = list(range(len(r)))
    tris: list[np.ndarray] = []
    guard = 0
    while len(idx) > 3 and guard < 4 * len(r) * len(r):
        guard += 1
        n = len(idx)
        for k in range(n):
            i0, i1, i2 = idx[(k - 1) % n], idx[k], idx[(k + 1) % n]
            a, b, c = r[i0], r[i1], r[i2]
            cross = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (
                c[0] - a[0]
            )
            if cross <= 0:  # reflex or collinear — not an ear
                continue
            # ear test: no other remaining vertex inside OR on the
            # boundary of abc — an on-edge reflex vertex (common in
            # rectilinear shapes: the L-corner sits exactly on the
            # would-be diagonal) makes the remainder degenerate and
            # silently double-counts area
            ok = True
            for j in idx:
                if j in (i0, i1, i2):
                    continue
                p = r[j]
                if (p == a).all() or (p == b).all() or (p == c).all():
                    continue
                d1 = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
                d2 = (c[0] - b[0]) * (p[1] - b[1]) - (c[1] - b[1]) * (p[0] - b[0])
                d3 = (a[0] - c[0]) * (p[1] - c[1]) - (a[1] - c[1]) * (p[0] - c[0])
                if d1 >= 0 and d2 >= 0 and d3 >= 0:
                    ok = False
                    break
            if ok:
                tris.append(np.array([a, b, c]))
                idx.pop(k)
                break
        else:
            raise ValueError(
                "triangulate_ring: no ear found — ring is likely "
                "self-intersecting (refusing to return a wrong area)"
            )
    if len(idx) == 3:
        tris.append(np.array([r[idx[0]], r[idx[1]], r[idx[2]]]))
    return tris


def _is_convex_ccw(ring: np.ndarray) -> bool:
    r = np.asarray(ring, dtype=np.float64)
    if (r[0] == r[-1]).all():
        r = r[:-1]
    x0, y0 = r[:, 0], r[:, 1]
    x1, y1 = np.roll(x0, -1), np.roll(y0, -1)
    x2, y2 = np.roll(x0, -2), np.roll(y0, -2)
    cross = (x1 - x0) * (y2 - y1) - (y1 - y0) * (x2 - x1)
    return bool((cross >= 0).all())


def polygon_intersection_area_general(a: np.ndarray, b: np.ndarray) -> float:
    """Exact area of A∩B for ARBITRARY simple rings (concave allowed
    on both sides) — completes C5 beyond convex clip windows.  The
    clip side decomposes into CCW triangles (always convex), and the
    subject side may be concave: Sutherland–Hodgman against a convex
    window can emit zero-width bridge edges for in-and-out subjects,
    but their signed-area contribution is exactly zero."""
    bb = np.asarray(b, dtype=np.float64)
    if _is_convex_ccw(bb):
        return polygon_intersection_area(a, bb)
    return float(
        sum(polygon_intersection_area(a, t) for t in triangulate_ring(bb))
    )


def rect_intersection_area(
    a: tuple[float, float, float, float], b: tuple[float, float, float, float]
) -> float:
    w = min(a[2], b[2]) - max(a[0], b[0])
    h = min(a[3], b[3]) - max(a[1], b[1])
    return max(w, 0.0) * max(h, 0.0)


def pad_rect(
    xmin: float, ymin: float, xmax: float, ymax: float, pad: float
) -> tuple[float, float, float, float]:
    """Square-cap mitre buffer of a rectangle == bbox expansion (exact).

    Mirrors par_pad_grid's `st_buffer(..., endCapStyle='SQUARE',
    joinStyle='MITRE')` on grid cells
    (/root/reference/R/gridding.R:192-198)."""
    return xmin - pad, ymin - pad, xmax + pad, ymax + pad


def point_segment_distance(
    px: np.ndarray, py: np.ndarray,
    ax: np.ndarray, ay: np.ndarray, bx: np.ndarray, by: np.ndarray,
) -> np.ndarray:
    """Vectorized distance from points (px, py) to segments (a→b),
    broadcast element-wise (pass compatible shapes; e.g. points (n, 1)
    vs segments (1, m) for the full matrix).  Degenerate zero-length
    segments collapse to point distance.  The numpy twin of the
    column-math expression in chopin_spark/roads.py — the reference
    reaches this through `terra::nearest` on a road LINESTRING layer
    (/root/reference/README.md:1065-1118)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    t = ((px - ax) * dx + (py - ay) * dy) / np.where(len2 == 0.0, 1.0, len2)
    t = np.clip(np.where(len2 == 0.0, 0.0, t), 0.0, 1.0)
    return np.hypot(px - (ax + t * dx), py - (ay + t * dy))


def points_in_parts(px, py, parts) -> np.ndarray:
    """Membership against a (multi)polygon with holes: inside any part's
    outer ring and not inside one of that part's holes (even-odd).
    parts: list of polygons, each [outer, hole1, ...] — the normalized
    view from geom.wkb.parts (chopin casts MULTIPOLYGON inputs and
    honors holes, /root/reference/R/gridding.R:930-940)."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    inside = np.zeros(px.shape, dtype=bool)
    for rings in parts:
        m = points_in_polygon(px, py, rings[0])
        for hole in rings[1:]:
            m &= ~points_in_polygon(px, py, hole)
        inside |= m
    return inside


def parts_area(parts) -> float:
    """Area of a (multi)polygon with holes: Σ(outer − holes)."""
    total = 0.0
    for rings in parts:
        total += polygon_area(rings[0])
        for hole in rings[1:]:
            total -= polygon_area(hole)
    return total
