"""Minimal WKB (little-endian) encode/decode for POINT and POLYGON.

WKB is the engine's at-rest geometry representation (the reference's
sf/terra objects collapse to one binary column, SURVEY.md §1.1). Only
the shapes the engine produces are supported: 2-D points and
single-ring polygons.
"""

from __future__ import annotations

import struct

import numpy as np

_POINT = 1
_POLYGON = 3


def point_wkb(x: float, y: float) -> bytes:
    return struct.pack("<BIdd", 1, _POINT, x, y)


def polygon_wkb(coords: np.ndarray) -> bytes:
    """coords: (n, 2) ring, closed or open (auto-closed)."""
    c = np.asarray(coords, dtype=np.float64)
    if not (c[0] == c[-1]).all():
        c = np.vstack([c, c[:1]])
    head = struct.pack("<BIII", 1, _POLYGON, 1, len(c))
    return head + c.astype("<f8").tobytes()


def rect_wkb(xmin: float, ymin: float, xmax: float, ymax: float) -> bytes:
    return polygon_wkb(
        np.array(
            [[xmin, ymin], [xmax, ymin], [xmax, ymax], [xmin, ymax], [xmin, ymin]]
        )
    )


def decode(buf: bytes):
    """Return ('point', (x, y)) or ('polygon', ndarray(n, 2))."""
    byte_order, gtype = struct.unpack_from("<BI", buf, 0)
    assert byte_order == 1, "big-endian WKB unsupported"
    if gtype == _POINT:
        return "point", struct.unpack_from("<dd", buf, 5)
    if gtype == _POLYGON:
        (nrings,) = struct.unpack_from("<I", buf, 5)
        assert nrings >= 1
        (npts,) = struct.unpack_from("<I", buf, 9)
        ring = np.frombuffer(buf, dtype="<f8", count=npts * 2, offset=13)
        return "polygon", ring.reshape(npts, 2).copy()
    raise ValueError(f"unsupported WKB geometry type {gtype}")


def wkt(buf: bytes) -> str:
    """WKT at API edges, mirroring the reference's return_wkt option
    (/root/reference/R/gridding.R:208-220)."""
    kind, g = decode(buf)
    if kind == "point":
        return f"POINT ({g[0]:.6f} {g[1]:.6f})"
    pts = ", ".join(f"{x:.6f} {y:.6f}" for x, y in g)
    return f"POLYGON (({pts}))"
