"""Minimal WKB (little-endian) encode/decode for POINT, POLYGON (with
interior rings / holes), and MULTIPOLYGON.

WKB is the engine's at-rest geometry representation (the reference's
sf/terra objects collapse to one binary column, SURVEY.md §1.1).
chopin handles MULTIPOLYGON inputs by casting and removes holes before
gridding (/root/reference/R/gridding.R:930-940) — `remove_holes` and
`cast_parts` mirror those steps on the decoded structure.
"""

from __future__ import annotations

import struct

import numpy as np

_POINT = 1
_LINESTRING = 2
_POLYGON = 3
_MULTILINESTRING = 5
_MULTIPOLYGON = 6


def point_wkb(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, _POINT, x, y)


def linestring_wkb(coords) -> bytes:
    """coords: (n, 2) vertex array (n ≥ 2), NOT closed — roads/rivers
    (the reference's nearest demo context is a roads layer,
    /root/reference/README.md:1065-1118, tests/testdata/ncroads_first.gpkg)."""
    c = np.asarray(coords, dtype=np.float64)
    return (
        struct.pack("<BII", 1, _LINESTRING, len(c))
        + c.astype("<f8").tobytes()
    )


def multilinestring_wkb(lines) -> bytes:
    """lines: list of (n, 2) vertex arrays."""
    out = [struct.pack("<BII", 1, _MULTILINESTRING, len(lines))]
    for c in lines:
        out.append(linestring_wkb(c))
    return b"".join(out)


def _close(c: np.ndarray) -> np.ndarray:
    c = np.asarray(c, dtype=np.float64)
    if not (c[0] == c[-1]).all():
        c = np.vstack([c, c[:1]])
    return c


def polygon_wkb(coords) -> bytes:
    """coords: one (n, 2) ring, or a list of rings
    [outer, hole1, hole2, ...]; rings closed or open (auto-closed).

    A plain Python list of [x, y] pairs is a single ring (the
    pre-multipolygon signature) — disambiguated by array dimension,
    not container type."""
    if isinstance(coords, (list, tuple)):
        single_ring = (
            len(coords) > 0
            and np.asarray(coords[0], dtype=np.float64).ndim == 1
        )
        rings = [coords] if single_ring else list(coords)
    else:
        rings = [coords]
    rings = [_close(r) for r in rings]
    out = [struct.pack("<BII", 1, _POLYGON, len(rings))]
    for r in rings:
        out.append(struct.pack("<I", len(r)))
        out.append(r.astype("<f8").tobytes())
    return b"".join(out)


def multipolygon_wkb(polys) -> bytes:
    """polys: list of polygons, each a list of rings [outer, holes...]."""
    out = [struct.pack("<BII", 1, _MULTIPOLYGON, len(polys))]
    for rings in polys:
        out.append(polygon_wkb(rings))
    return b"".join(out)


def rect_wkb(xmin: float, ymin: float, xmax: float, ymax: float) -> bytes:
    return polygon_wkb(
        np.array(
            [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]]
        )
    )


def _read_rings(buf: bytes, off: int, nrings: int):
    rings = []
    for _ in range(nrings):
        (npts,) = struct.unpack_from("<I", buf, off)
        off += 4
        ring = np.frombuffer(buf, dtype="<f8", count=npts * 2, offset=off)
        rings.append(ring.reshape(npts, 2).copy())
        off += npts * 16
    return rings, off


def decode(buf: bytes):
    """Return one of
    ('point', (x, y)),
    ('polygon', ring ndarray)                — single-ring polygon,
    ('polygon', [outer, hole, ...])          — holed polygon,
    ('multipolygon', [[outer, holes...], ...]).
    """
    byte_order, gtype = struct.unpack_from("<BI", buf, 0)
    assert byte_order == 1, "big-endian WKB unsupported"
    if gtype == _POINT:
        return "point", struct.unpack_from("<dd", buf, 5)
    if gtype == _LINESTRING:
        (npts,) = struct.unpack_from("<I", buf, 5)
        line = np.frombuffer(buf, dtype="<f8", count=npts * 2, offset=9)
        return "linestring", line.reshape(npts, 2).copy()
    if gtype == _MULTILINESTRING:
        (nlines,) = struct.unpack_from("<I", buf, 5)
        off, lines = 9, []
        for _ in range(nlines):
            bo, gt = struct.unpack_from("<BI", buf, off)
            assert bo == 1 and gt == _LINESTRING
            (npts,) = struct.unpack_from("<I", buf, off + 5)
            line = np.frombuffer(
                buf, dtype="<f8", count=npts * 2, offset=off + 9
            )
            lines.append(line.reshape(npts, 2).copy())
            off += 9 + npts * 16
        return "multilinestring", lines
    if gtype == _POLYGON:
        (nrings,) = struct.unpack_from("<I", buf, 5)
        assert nrings >= 1
        rings, _ = _read_rings(buf, 9, nrings)
        return "polygon", rings[0] if nrings == 1 else rings
    if gtype == _MULTIPOLYGON:
        (npolys,) = struct.unpack_from("<I", buf, 5)
        off, polys = 9, []
        for _ in range(npolys):
            bo, gt = struct.unpack_from("<BI", buf, off)
            assert bo == 1 and gt == _POLYGON
            (nrings,) = struct.unpack_from("<I", buf, off + 5)
            rings, off = _read_rings(buf, off + 9, nrings)
            polys.append(rings)
        return "multipolygon", polys
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def line_parts(buf: bytes) -> list[np.ndarray]:
    """Normalized view of a (MULTI)LINESTRING: list of vertex arrays."""
    kind, g = decode(buf)
    if kind == "linestring":
        return [g]
    if kind == "multilinestring":
        return g
    raise ValueError(f"line_parts() is for line geometries, got {kind}")


def parts(buf: bytes) -> list[list[np.ndarray]]:
    """Normalized view: list of polygons, each [outer, holes...]."""
    kind, g = decode(buf)
    if kind == "point":
        raise ValueError("parts() is for areal geometries")
    if kind == "polygon":
        return [g if isinstance(g, list) else [g]]
    return g


def remove_holes(buf: bytes) -> bytes:
    """chopin's hole removal before gridding
    (/root/reference/R/gridding.R:930-940): keep outer rings only."""
    p = [[rings[0]] for rings in parts(buf)]
    return polygon_wkb(p[0]) if len(p) == 1 else multipolygon_wkb(p)


def cast_parts(buf: bytes) -> list[bytes]:
    """chopin's MULTIPOLYGON → POLYGON cast: one WKB per part."""
    return [polygon_wkb(rings) for rings in parts(buf)]


def _ring_wkt(r: np.ndarray) -> str:
    return "(" + ", ".join(f"{x:.6f} {y:.6f}" for x, y in r) + ")"


def wkt(buf: bytes) -> str:
    """WKT at API edges, mirroring the reference's return_wkt option
    (/root/reference/R/gridding.R:208-220)."""
    kind, g = decode(buf)
    if kind == "point":
        return f"POINT ({g[0]:.6f} {g[1]:.6f})"
    if kind == "linestring":
        return "LINESTRING " + _ring_wkt(g)
    if kind == "multilinestring":
        return "MULTILINESTRING (" + ", ".join(_ring_wkt(c) for c in g) + ")"
    if kind == "polygon":
        rings = g if isinstance(g, list) else [g]
        return "POLYGON (" + ", ".join(_ring_wkt(r) for r in rings) + ")"
    return "MULTIPOLYGON (" + ", ".join(
        "(" + ", ".join(_ring_wkt(r) for r in rings) + ")" for rings in g
    ) + ")"
