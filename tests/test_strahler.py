"""Block-local Strahler order vs the explicit single-threaded
recursion, with block-size invariance."""

from __future__ import annotations

import pytest

from chopin_spark.flowacc import d8_downstream
from chopin_spark.queries.costdistq import H, W, _zf  # noqa: F401
from chopin_spark.strahler import strahler_py


def _fixture():
    z = {(x, y): ((x + y * W) * 389) % (W * H)
         for x in range(W) for y in range(H)}
    return z, d8_downstream(z)


def test_strahler_py_invariants():
    z, flow = _fixture()
    order = strahler_py(z, flow)
    assert set(order) == set(z)
    assert min(order.values()) == 1
    children: dict = {}
    for c, t in flow.items():
        if t is not None:
            children.setdefault(t, []).append(c)
    for c, o in order.items():
        ch = children.get(c, ())
        if not ch:
            assert o == 1
        else:
            tops = sorted((order[u] for u in ch), reverse=True)
            want = tops[0] + 1 if len(tops) >= 2 and tops[1] == tops[0] \
                else tops[0]
            assert o == want


@pytest.mark.parametrize("tw,th", [(8, 8), (16, 12), (32, 24)])
def test_strahler_matches_reference(spark, tw, th):
    from chopin_spark.queries.costdistq import _FX, _FY
    from chopin_spark.strahler import strahler_order

    cells = spark.range(0, W * H, 1, 8).selectExpr(
        f"CAST(id % {W} AS BIGINT) AS x",
        f"CAST(id DIV {W} AS BIGINT) AS y",
    ).selectExpr(
        "x", "y",
        f"CAST({_zf('x', 'y')} AS BIGINT) AS z",
        f"CAST({_FX} AS BIGINT) AS fx",
        f"CAST({_FY} AS BIGINT) AS fy",
    )
    out = strahler_order(cells, tile_w=tw, tile_h=th)
    rows = {(r["x"], r["y"]): r["ord"] for r in out.collect()}
    z, flow = _fixture()
    assert rows == strahler_py(z, flow)
