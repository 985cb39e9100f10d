"""Block-local + seam-merge raster components (chopin_spark.rastercc)
must match the global alternating-star labeling bit-for-bit — same
(node, comp_id = min cell id) contract — on both fixture surfaces, and
through BOTH seam-solve tiers (driver union-find vs distributed star).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chopin_spark.components import connected_components_star
from chopin_spark.rastercc import raster_components

W, H = 32, 24


def _mask_of(e: str) -> str:
    return f"(((({e}) * 389) % {W * H}) % 7 < 3)"


def _cls_of(e: str) -> str:
    return f"(((({e}) * 389) % {W * H}) % 4)"


def _global_star(spark, grp_equal: bool):
    """Reference labeling via the proven global star engine."""
    if grp_equal:
        pred_r = f"{_cls_of('n + 1')} = {_cls_of('n')}"
        pred_u = f"{_cls_of(f'n + {W}')} = {_cls_of('n')}"
        nodes = spark.range(0, W * H, 1, 8).selectExpr("id AS n")
    else:
        pred_r = _mask_of("n + 1")
        pred_u = _mask_of(f"n + {W}")
        nodes = (
            spark.range(0, W * H, 1, 8)
            .selectExpr("id AS n")
            .filter(F.expr(_mask_of("n")))
        )
    edges = nodes.selectExpr(
        "n AS a",
        f"""explode(filter(array(
              CASE WHEN n % {W} < {W - 1} AND ({pred_r}) THEN n + 1 END,
              CASE WHEN n + {W} < {W * H} AND ({pred_u}) THEN n + {W} END,
              n), x -> x IS NOT NULL)) AS b""",
    )
    return {
        (r.node, r.comp_id)
        for r in connected_components_star(edges, "a", "b").collect()
    }


def _cells(spark, grp_equal: bool):
    if grp_equal:
        return spark.range(0, W * H, 1, 8).selectExpr(
            "id AS n", f"CAST({_cls_of('id')} AS BIGINT) AS grp"
        )
    return (
        spark.range(0, W * H, 1, 8)
        .selectExpr("id AS n")
        .filter(F.expr(_mask_of("n")))
        .withColumn("grp", F.lit(0).cast("long"))
    )


@pytest.mark.parametrize("grp_equal", [False, True])
@pytest.mark.parametrize("cap", [200_000, 0])
def test_matches_global_star(spark, grp_equal, cap):
    got = {
        (r.n, r.comp_id)
        for r in raster_components(
            _cells(spark, grp_equal), W, H, tile_w=8, tile_h=8,
            seam_driver_cap=cap,
        ).collect()
    }
    assert got == _global_star(spark, grp_equal)


def test_tile_size_invariance(spark):
    """Labels are a property of the raster, not the blocking."""
    base = {
        (r.n, r.comp_id)
        for r in raster_components(
            _cells(spark, True), W, H, tile_w=8, tile_h=8
        ).collect()
    }
    for tw, th in ((5, 7), (32, 24), (1, 1)):
        got = {
            (r.n, r.comp_id)
            for r in raster_components(
                _cells(spark, True), W, H, tile_w=tw, tile_h=th
            ).collect()
        }
        assert got == base, (tw, th)


def test_singleton_and_empty_seam(spark):
    """A block-diagonal mask with no cross-block adjacency exercises
    the empty-seam early return."""
    # one isolated cell per 8x8 block interior: n % W % 8 == 3, row 3
    cells = (
        spark.range(0, W * H, 1, 4)
        .selectExpr("id AS n")
        .filter(f"(n % {W}) % 8 = 3 AND CAST(n / {W} AS BIGINT) % 8 = 3")
        .withColumn("grp", F.lit(0).cast("long"))
    )
    out = raster_components(cells, W, H, tile_w=8, tile_h=8).collect()
    assert all(r.n == r.comp_id for r in out)
    assert len(out) == 12  # 4x3 blocks, one isolated cell each
