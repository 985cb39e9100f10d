"""MULTIPOLYGON / holed-ring WKB layer + geometry predicates
(chopin casts multipolygons and removes holes, R/gridding.R:930-940)."""

from __future__ import annotations

import numpy as np

from chopin_spark.geom.core import parts_area, points_in_parts
from chopin_spark.geom.wkb import (
    cast_parts, decode, multipolygon_wkb, parts, polygon_wkb,
    remove_holes, wkt,
)

_OUTER = np.array([[0.0, 0.0], [10.0, 0.0], [10.0, 10.0], [0.0, 10.0]])
_HOLE = np.array([[4.0, 4.0], [6.0, 4.0], [6.0, 6.0], [4.0, 6.0]])
_FAR = _OUTER + 100.0


def test_holed_polygon_roundtrip():
    buf = polygon_wkb([_OUTER, _HOLE])
    kind, rings = decode(buf)
    assert kind == "polygon" and len(rings) == 2
    assert (rings[0][:-1] == _OUTER).all() and (rings[1][:-1] == _HOLE).all()
    assert wkt(buf).count("(") == 3  # POLYGON ((outer), (hole))


def test_multipolygon_roundtrip():
    buf = multipolygon_wkb([[_OUTER, _HOLE], [_FAR]])
    kind, polys = decode(buf)
    assert kind == "multipolygon" and len(polys) == 2
    assert len(polys[0]) == 2 and len(polys[1]) == 1
    assert wkt(buf).startswith("MULTIPOLYGON (")


def test_single_ring_contract_unchanged():
    kind, ring = decode(polygon_wkb(_OUTER))
    assert kind == "polygon" and isinstance(ring, np.ndarray)


def test_points_in_parts_honors_holes_and_parts():
    buf = multipolygon_wkb([[_OUTER, _HOLE], [_FAR]])
    px = np.array([5.0, 1.0, 105.0, 50.0])
    py = np.array([5.0, 1.0, 105.0, 50.0])
    got = points_in_parts(px, py, parts(buf))
    # (5,5) is in the hole; (1,1) in the outer; (105,105) in part 2
    assert got.tolist() == [False, True, True, False]


def test_parts_area_subtracts_holes():
    buf = multipolygon_wkb([[_OUTER, _HOLE], [_FAR]])
    assert parts_area(parts(buf)) == (100.0 - 4.0) + 100.0


def test_remove_holes_and_cast():
    buf = multipolygon_wkb([[_OUTER, _HOLE], [_FAR]])
    noholes = remove_holes(buf)
    assert parts_area(parts(noholes)) == 200.0
    pieces = cast_parts(buf)
    assert len(pieces) == 2
    k0, rings0 = decode(pieces[0])
    assert k0 == "polygon" and len(rings0) == 2  # holes preserved in cast


def test_polygon_wkb_plain_list_single_ring():
    """A plain list of [x, y] pairs is ONE ring (the original
    signature), not a list of rings — regression for the widened
    multipolygon signature misparsing it."""
    import numpy as np

    from chopin_spark.geom.wkb import parts, polygon_wkb

    tri = [[0.0, 0.0], [10.0, 0.0], [10.0, 10.0]]
    [rings] = parts(polygon_wkb(tri))
    assert len(rings) == 1
    np.testing.assert_array_equal(
        rings[0], np.array(tri + [tri[0]], dtype=np.float64)
    )
    # same bytes as the ndarray spelling
    assert polygon_wkb(tri) == polygon_wkb(np.array(tri))
