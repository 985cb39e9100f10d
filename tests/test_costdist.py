"""Block-parallel cost distance vs a single-threaded reference
Dijkstra, plus the oracle-cap safety margin and block-size invariance
(the partitioned==unpartitioned discipline of test_runners)."""

from __future__ import annotations

import heapq

import pytest

from chopin_spark.queries.costdistq import _CAP, _COST, _IS_SRC, H, W


def _ref_dijkstra():
    cost = {
        (x, y): 1 + ((x * 7 + y * 13) % 5)
        for x in range(W) for y in range(H)
    }
    d = {
        k: (0 if (k[0] * 31 + k[1] * 17) % 193 == 0 else None)
        for k in cost
    }
    heap = [(0, k) for k, v in d.items() if v == 0]
    heapq.heapify(heap)
    dist = {k: (v if v is not None else 1 << 62) for k, v in d.items()}
    while heap:
        dv, (x, y) = heapq.heappop(heap)
        if dv > dist[(x, y)]:
            continue
        for nb in ((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)):
            if nb not in cost:
                continue
            nd = dv + cost[(x, y)] + cost[nb]
            if nd < dist[nb]:
                dist[nb] = nd
                heapq.heappush(heap, (nd, nb))
    return dist


def test_reference_surface_within_oracle_cap():
    dist = _ref_dijkstra()
    mx = max(dist.values())
    assert mx < (1 << 62), "disconnected fixture"
    assert mx <= _CAP - 50, (
        f"oracle walk cap {_CAP} too tight for max distance {mx}"
    )


@pytest.mark.parametrize("tw,th", [(8, 8), (16, 8), (32, 24)])
def test_cost_distance_matches_dijkstra(spark, tw, th):
    """Any block size — including one global block — yields the exact
    single-threaded Dijkstra surface."""
    from chopin_spark.costdist import cost_distance
    from chopin_spark.queries.costdistq import build_cells

    ref = _ref_dijkstra()
    out = cost_distance(build_cells(spark), tile_w=tw, tile_h=th)
    rows = {(r["x"], r["y"]): r["dist"] for r in out.collect()}
    assert len(rows) == W * H
    assert rows == ref


def test_viewshed_mask_sane(spark):
    """Viewshed partitions the grid: tower cell visible, both visible
    and blocked cells exist, and near-tower cells (m <= 1) are always
    visible."""
    from chopin_spark.queries.costdistq import (
        _VS_TX, _VS_TY, viewshed_d8,
    )

    rows = {(r["x"], r["y"]): r["visible"]
            for r in viewshed_d8(spark, "x").collect()}
    assert len(rows) == W * H
    assert rows[(_VS_TX, _VS_TY)] == 1
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            assert rows[(_VS_TX + dx, _VS_TY + dy)] == 1
    n_vis = sum(rows.values())
    assert 0 < n_vis < W * H
