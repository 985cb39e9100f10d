"""Block-local D8 flow accumulation vs a single-threaded reference
walk, with block-size invariance."""

from __future__ import annotations

import pytest

from chopin_spark.queries.costdistq import H, W, _zf  # noqa: F401
from chopin_spark.flowacc import d8_downstream


def _ref_acc():
    z = {(x, y): ((x + y * W) * 389) % (W * H)
         for x in range(W) for y in range(H)}
    flow = d8_downstream(z)
    acc = {k: 0 for k in z}
    for start in z:
        cur = start
        while cur is not None:
            acc[cur] += 1
            cur = flow[cur]
    return acc


def test_dem_is_permutation_and_forest():
    z = {(x, y): ((x + y * W) * 389) % (W * H)
         for x in range(W) for y in range(H)}
    assert len(set(z.values())) == W * H  # distinct => acyclic descent
    flow = d8_downstream(z)
    assert any(v is None for v in flow.values())  # pits exist
    for k, v in flow.items():
        if v is not None:
            assert z[v] < z[k]


@pytest.mark.parametrize("tw,th", [(8, 8), (16, 12), (32, 24)])
def test_flow_accumulation_matches_reference(spark, tw, th):
    from chopin_spark.flowacc import flow_accumulation
    from chopin_spark.queries.costdistq import flow_accumulation_d8, _FX, _FY

    cells = spark.range(0, W * H, 1, 8).selectExpr(
        f"CAST(id % {W} AS BIGINT) AS x",
        f"CAST(id DIV {W} AS BIGINT) AS y",
    ).selectExpr(
        "x", "y",
        f"CAST({_zf('x', 'y')} AS BIGINT) AS z",
        f"CAST({_FX} AS BIGINT) AS fx",
        f"CAST({_FY} AS BIGINT) AS fy",
    )
    out = flow_accumulation(cells, tile_w=tw, tile_h=th)
    rows = {(r["x"], r["y"]): r["acc"] for r in out.collect()}
    ref = _ref_acc()
    assert len(rows) == W * H
    assert rows == ref
    # total accumulation == sum of all path lengths == sum over cells
    # of their downstream chain length (conservation sanity)
    assert sum(rows.values()) >= W * H


def test_watershed_basins_match_reference_walk(spark):
    """pointer_jump basin labels + hop counts == the single-threaded
    downstream walk on the same D8 forest."""
    from chopin_spark.queries.costdistq import watershed_basins_d8

    z = {(x, y): ((x + y * W) * 389) % (W * H)
         for x in range(W) for y in range(H)}
    flow = d8_downstream(z)
    ref = {}
    for start in z:
        cur, hops = start, 0
        while flow[cur] is not None:
            cur = flow[cur]
            hops += 1
        ref[start] = (cur[0] + cur[1] * W, hops)

    rows = watershed_basins_d8(spark, "").collect()
    assert len(rows) == W * H
    for r in rows:
        assert ref[(r.x, r.y)] == (r.basin_id, r.hops), (r.x, r.y)
    # basins partition the grid: every basin_id is a pit (no downstream)
    pits = {(x + y * W) for (x, y), v in flow.items() if v is None}
    assert {r.basin_id for r in rows} == pits
