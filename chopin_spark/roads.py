"""Point-to-LINESTRING nearest join (roads/rivers context).

The reference's flagship nearest demo is points → road lines
(`terra::nearest` over `ncroads_first.gpkg`,
/root/reference/README.md:1065-1118;
/root/reference/tests/testthat/test-scale_process.R:965) — VERDICT r02
ranked this the #1 parity gap: the engine's nearest/knn were
point-to-point only.

Architecture (same exactness contract as chopin_spark.vector):

- a (MULTI)LINESTRING layer explodes once into a SEGMENT table
  (line_id, ax, ay, bx, by) — `segments_from_lines` decodes WKB via
  mapInPandas (Arrow-batched; runs once at ingest, not per query);
- segments register in every grid cell whose radius-padded rectangle
  intersects the segment bbox (index-range explode — pure column math,
  equi-join shaped);
- points join on their core cell; the exact point→segment distance is
  a shared SQL text (`seg_dist_sql`) evaluated identically by Spark
  and DuckDB, so oracle doubles match bit-for-bit;
- per point: min(struct(dist, line_id)) over in-radius candidates —
  any segment within `radius` necessarily registered in the point's
  core cell, so the filtered minimum is the true nearest;
- points with no in-radius segment resolve through the same iterative
  cell-disk ring expansion as vector._ring_fallback (equi-join per
  round, no broadcast of the road layer): a best-so-far distance
  strictly below R·min_cell_width certifies exactness because every
  unseen segment's bbox lies wholly outside the scanned disk.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chopin_spark.grid import RectGrid, _index_col

_SEG_SCHEMA = (
    "line_id long, seg long, ax double, ay double, bx double, by double"
)


def segments_from_lines(
    lines: DataFrame, id_col: str = "line_id", wkb_col: str = "geom"
) -> DataFrame:
    """Explode a WKB (MULTI)LINESTRING column into one row per segment.

    mapInPandas (not a per-row UDF): each Arrow batch of road features
    yields a numpy-built segment frame. Runs once per layer — the
    segment table is the operational representation, like the
    reference's terra vector cast."""

    def explode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from chopin_spark.geom.wkb import line_parts

        for pdf in batches:
            ids, segs, axs, ays, bxs, bys = [], [], [], [], [], []
            for lid, buf in zip(pdf[id_col], pdf[wkb_col]):
                s = 0
                for verts in line_parts(bytes(buf)):
                    v = np.asarray(verts, dtype=np.float64)
                    for i in range(len(v) - 1):
                        ids.append(lid)
                        segs.append(s)
                        axs.append(v[i, 0])
                        ays.append(v[i, 1])
                        bxs.append(v[i + 1, 0])
                        bys.append(v[i + 1, 1])
                        s += 1
            yield pd.DataFrame(
                {
                    "line_id": pd.Series(ids, dtype="int64"),
                    "seg": pd.Series(segs, dtype="int64"),
                    "ax": pd.Series(axs, dtype="float64"),
                    "ay": pd.Series(ays, dtype="float64"),
                    "bx": pd.Series(bxs, dtype="float64"),
                    "by": pd.Series(bys, dtype="float64"),
                }
            )

    return lines.mapInPandas(explode_batch, _SEG_SCHEMA)


def seg_dist_sql(px: str, py: str, ax: str, ay: str, bx: str, by: str) -> str:
    """Point→segment distance as ONE SQL text shared by Spark and
    DuckDB (the haversine-twin pattern, queries/s2knn.py): projection
    parameter t clamped to [0, 1], degenerate segments collapse to
    point distance.  Identical operation order in both engines →
    identical IEEE doubles."""
    dx = f"(({bx}) - ({ax}))"
    dy = f"(({by}) - ({ay}))"
    wx = f"(({px}) - ({ax}))"
    wy = f"(({py}) - ({ay}))"
    len2 = f"({dx} * {dx} + {dy} * {dy})"
    t = (
        f"LEAST(GREATEST(CASE WHEN {len2} = 0.0 THEN 0.0"
        f" ELSE ({wx} * {dx} + {wy} * {dy}) / {len2} END, 0.0), 1.0)"
    )
    ex = f"({wx} - {t} * {dx})"
    ey = f"({wy} - {t} * {dy})"
    return f"SQRT({ex} * {ex} + {ey} * {ey})"


def seg_t_sql(px: str, py: str, ax: str, ay: str, bx: str, by: str) -> str:
    """Clamped projection parameter t of P onto segment AB — the SAME
    text (and therefore the same IEEE doubles) as the t inside
    seg_dist_sql; exposed for linear referencing (chainage = offset
    along the polyline = cumulative upstream length + t·len)."""
    dx = f"(({bx}) - ({ax}))"
    dy = f"(({by}) - ({ay}))"
    wx = f"(({px}) - ({ax}))"
    wy = f"(({py}) - ({ay}))"
    len2 = f"({dx} * {dx} + {dy} * {dy})"
    return (
        f"LEAST(GREATEST(CASE WHEN {len2} = 0.0 THEN 0.0"
        f" ELSE ({wx} * {dx} + {wy} * {dy}) / {len2} END, 0.0), 1.0)"
    )


def seg_len_sql(ax: str, ay: str, bx: str, by: str) -> str:
    """Segment length — shared exact text (SQRT of dot products)."""
    dx = f"(({bx}) - ({ax}))"
    dy = f"(({by}) - ({ay}))"
    return f"SQRT({dx} * {dx} + {dy} * {dy})"


def seg_cross_sql(
    ox: str, oy: str, px: str, py: str, qx: str, qy: str
) -> str:
    """2D cross product (P−O)×(Q−O) as shared SQL text — the
    orientation primitive for segment intersection.  Only +,−,* (all
    IEEE-correctly-rounded), identical order both engines."""
    return (
        f"((({px}) - ({ox})) * (({qy}) - ({oy}))"
        f" - (({py}) - ({oy})) * (({qx}) - ({ox})))"
    )


def seg_intersect_sql(
    ax: str, ay: str, bx: str, by: str,
    cx: str, cy: str, dx: str, dy: str,
) -> tuple[str, str, str]:
    """Proper segment crossing AB × CD (terra::intersect on lines):
    returns (condition, ix, iy) SQL texts shared by Spark and DuckDB.

    Condition: strict orientation sign flips on BOTH segments
    (d1·d2 < 0 AND d3·d4 < 0) — endpoint touches and collinear overlaps
    are excluded, so the denominator d3−d4 = (B−A)×(D−C) is provably
    nonzero whenever the condition holds and the point formula
    I = A + t·(B−A), t = d3/(d3−d4), is division-safe.  All ops are
    correctly-rounded IEEE (+,−,*,/), identical text and order both
    engines → bit-identical doubles (the seg_dist_sql contract)."""
    d1 = seg_cross_sql(ax, ay, bx, by, cx, cy)
    d2 = seg_cross_sql(ax, ay, bx, by, dx, dy)
    d3 = seg_cross_sql(cx, cy, dx, dy, ax, ay)
    d4 = seg_cross_sql(cx, cy, dx, dy, bx, by)
    cond = f"({d1} * {d2} < 0.0 AND {d3} * {d4} < 0.0)"
    t = f"({d3} / ({d3} - {d4}))"
    ix = f"(({ax}) + {t} * (({bx}) - ({ax})))"
    iy = f"(({ay}) + {t} * (({by}) - ({ay})))"
    return cond, ix, iy


def _seg_dist_col(grid: RectGrid) -> F.Column:
    return F.expr(
        seg_dist_sql(grid.x_col, grid.y_col, "_sax", "_say", "_sbx", "_sby")
    )


def _seg_cells(segments: DataFrame, grid: RectGrid, pad: float) -> DataFrame:
    """Register each segment in every cell whose pad-expanded rectangle
    its bbox intersects: per-axis index range of [min-pad, max+pad],
    exploded — the segment twin of RectGrid.assign_padded."""
    ax, ay = F.col("ax"), F.col("ay")
    bx, by = F.col("bx"), F.col("by")
    return (
        segments.withColumn(
            "_cix",
            F.explode(
                F.sequence(
                    _index_col(F.least(ax, bx) - pad, grid.xbreaks),
                    _index_col(F.greatest(ax, bx) + pad, grid.xbreaks),
                )
            ),
        )
        .withColumn(
            "_ciy",
            F.explode(
                F.sequence(
                    _index_col(F.least(ay, by) - pad, grid.ybreaks),
                    _index_col(F.greatest(ay, by) + pad, grid.ybreaks),
                )
            ),
        )
        .select(
            "_cix",
            "_ciy",
            F.col("line_id").alias("_lid"),
            ax.alias("_sax"),
            ay.alias("_say"),
            bx.alias("_sbx"),
            by.alias("_sby"),
        )
    )


def _min_agg(cand: DataFrame, point_id: str) -> DataFrame:
    return cand.groupBy(point_id).agg(
        F.min(F.struct(F.col("_d"), F.col("_lid"))).alias("m")
    ).select(
        point_id,
        F.col("m").getField("_lid").alias("nn_id"),
        F.col("m").getField("_d").alias("nn_dist"),
    )


def nearest_line_join(
    points: DataFrame, segments: DataFrame, grid: RectGrid,
    point_id: str, radius: float,
) -> DataFrame:
    """Exact nearest road per point. `segments` is the exploded
    segment table (line_id, ax, ay, bx, by); ties break by line_id.
    Returns (point_id, nn_id, nn_dist). grid.pad is not used — the
    search radius is the explicit `radius` argument.

    Duplicate (point, segment) candidate pairs (a segment spanning
    several cells in the stencil never duplicates against a point's
    single core cell, but ring rounds scan whole disks) are harmless:
    the aggregate is a MIN, idempotent under duplicates."""
    x, y = F.col(grid.x_col), F.col(grid.y_col)
    pts = points.select(
        point_id, grid.x_col, grid.y_col
    ).withColumn("_cix", _index_col(x, grid.xbreaks)).withColumn(
        "_ciy", _index_col(y, grid.ybreaks)
    )
    cand = (
        pts.join(_seg_cells(segments, grid, radius), ["_cix", "_ciy"])
        .withColumn("_d", _seg_dist_col(grid))
        .filter(F.col("_d") <= radius)
    )
    # the ring rounds run extra driver actions; materialize the found
    # set once so the stage-1 join-agg isn't recomputed per action
    found = _min_agg(cand, point_id).localCheckpoint()
    misses = pts.join(found.select(point_id), point_id, "left_anti")
    fb = _ring_fallback_lines(misses, segments, grid, point_id)
    return found.unionByName(fb)


def _ring_fallback_lines(
    misses: DataFrame, segments: DataFrame, grid: RectGrid, point_id: str
) -> DataFrame:
    """vector._ring_fallback for a segment context (k=1): the segment
    registry is the pad-0 bbox-cell table; a best distance strictly
    below R·min_cell_width certifies (every unseen segment's bbox —
    hence the segment itself — lies outside the scanned disk, ≥ that
    bound away, so it can neither beat nor tie the minimum)."""
    min_w = float(
        min(np.diff(grid.xbreaks).min(), np.diff(grid.ybreaks).min())
    )
    max_ring = int(max(grid.nx, grid.ny))
    seg_cells = _seg_cells(segments, grid, 0.0)
    x, y = F.col(grid.x_col), F.col(grid.y_col)
    cur = (
        misses.select(point_id, grid.x_col, grid.y_col)
        .withColumn("_ix0", _index_col(x, grid.xbreaks))
        .withColumn("_iy0", _index_col(y, grid.ybreaks))
        .localCheckpoint()
    )
    accepted = []
    R = 1
    while not cur.isEmpty():
        cand = (
            cur.withColumn(
                "_cix",
                F.explode(
                    F.sequence(
                        F.greatest(F.lit(0), F.col("_ix0") - R),
                        F.least(F.lit(grid.nx - 1), F.col("_ix0") + R),
                    )
                ),
            )
            .withColumn(
                "_ciy",
                F.explode(
                    F.sequence(
                        F.greatest(F.lit(0), F.col("_iy0") - R),
                        F.least(F.lit(grid.ny - 1), F.col("_iy0") + R),
                    )
                ),
            )
            .join(seg_cells, ["_cix", "_ciy"])
            .withColumn("_d", _seg_dist_col(grid))
        )
        agg = _min_agg(cand, point_id)
        last = R >= max_ring
        accept = agg if last else agg.filter(F.col("nn_dist") < R * min_w)
        accepted.append(accept)
        if last:
            break
        cur = cur.join(
            accept.select(point_id), point_id, "left_anti"
        ).localCheckpoint()
        R = min(R * 2, max_ring)
    if not accepted:
        return (
            misses.select(point_id)
            .limit(0)
            .crossJoin(
                segments.select(F.col("line_id").alias("nn_id")).limit(0)
            )
            .withColumn("nn_dist", F.lit(0.0))
            .select(point_id, "nn_id", "nn_dist")
        )
    out = accepted[0]
    for a in accepted[1:]:
        out = out.unionByName(a)
    return out


def seg_len_in_rect_sql(
    ax: str, ay: str, bx: str, by: str,
    x0: str, y0: str, x1: str, y1: str,
) -> str:
    """Length of segment a→b inside the axis-aligned rect
    [x0,x1]×[y0,y1] — Liang–Barsky parameter clamping as ONE SQL text
    (pure arithmetic + LEAST/GREATEST/SQRT: bit-identical across Spark
    and DuckDB, so no quantization-margin analysis is ever needed).
    Degenerate axes (dx=0 or dy=0) collapse to a containment test."""
    dx = f"(({bx}) - ({ax}))"
    dy = f"(({by}) - ({ay}))"
    txa = f"((({x0}) - ({ax})) / {dx})"
    txb = f"((({x1}) - ({ax})) / {dx})"
    tya = f"((({y0}) - ({ay})) / {dy})"
    tyb = f"((({y1}) - ({ay})) / {dy})"
    tlox = (
        f"(CASE WHEN {dx} = 0.0 THEN"
        f" (CASE WHEN ({ax}) >= ({x0}) AND ({ax}) <= ({x1})"
        f" THEN 0.0 ELSE 1.0 END)"
        f" ELSE LEAST({txa}, {txb}) END)"
    )
    thix = (
        f"(CASE WHEN {dx} = 0.0 THEN"
        f" (CASE WHEN ({ax}) >= ({x0}) AND ({ax}) <= ({x1})"
        f" THEN 1.0 ELSE 0.0 END)"
        f" ELSE GREATEST({txa}, {txb}) END)"
    )
    tloy = (
        f"(CASE WHEN {dy} = 0.0 THEN"
        f" (CASE WHEN ({ay}) >= ({y0}) AND ({ay}) <= ({y1})"
        f" THEN 0.0 ELSE 1.0 END)"
        f" ELSE LEAST({tya}, {tyb}) END)"
    )
    thiy = (
        f"(CASE WHEN {dy} = 0.0 THEN"
        f" (CASE WHEN ({ay}) >= ({y0}) AND ({ay}) <= ({y1})"
        f" THEN 1.0 ELSE 0.0 END)"
        f" ELSE GREATEST({tya}, {tyb}) END)"
    )
    t_e = f"GREATEST(0.0, {tlox}, {tloy})"
    t_x = f"LEAST(1.0, {thix}, {thiy})"
    return (
        f"(GREATEST(0.0, {t_x} - {t_e})"
        f" * SQRT({dx} * {dx} + {dy} * {dy}))"
    )


def _topk_lines(per_line: DataFrame, point_id: str, k: int) -> DataFrame:
    """(point, line, _d) → per point sorted top-k lines + line count."""
    return per_line.groupBy(point_id).agg(
        F.slice(
            F.array_sort(
                F.collect_list(F.struct(F.col("_d"), F.col("_lid")))
            ),
            1,
            k,
        ).alias("_top"),
        F.count(F.lit(1)).alias("_nl"),
    )


def _expand_topk(agg: DataFrame, point_id: str) -> DataFrame:
    return agg.select(
        point_id, F.posexplode("_top").alias("_r", "_s")
    ).select(
        point_id,
        (F.col("_r") + 1).cast("long").alias("rank"),
        F.col("_s._lid").alias("nn_id"),
        F.col("_s._d").alias("nn_dist"),
    )


def knn_line_join(
    points: DataFrame, segments: DataFrame, grid: RectGrid,
    point_id: str, radius: float, k: int,
) -> DataFrame:
    """Exact k-nearest ROADS per point (distance to a road = min over
    its segments).  Stage 1: per-(point, line) minimum over in-radius
    candidate segments — exact for every line whose true distance ≤
    radius, because that line's nearest segment is then radius-close
    and registered in the point's core cell.  A point accepts when it
    sees ≥ k distinct lines in radius.  Misses resolve by ring
    expansion with the same strict R·min_cell_width certificate: an
    unseen line's every segment bbox lies outside the scanned disk
    (distance ≥ bound), and a seen line's computed minimum is exact
    whenever it is below the bound (its unseen segments are all ≥ the
    bound).  Returns (point_id, rank, nn_id, nn_dist), ties by line id.
    """
    x, y = F.col(grid.x_col), F.col(grid.y_col)
    pts = points.select(
        point_id, grid.x_col, grid.y_col
    ).withColumn("_cix", _index_col(x, grid.xbreaks)).withColumn(
        "_ciy", _index_col(y, grid.ybreaks)
    )
    per_line = (
        pts.join(_seg_cells(segments, grid, radius), ["_cix", "_ciy"])
        .withColumn("_d", _seg_dist_col(grid))
        .filter(F.col("_d") <= radius)
        .groupBy(point_id, "_lid")
        .agg(F.min("_d").alias("_d"))
    )
    agg = _topk_lines(per_line, point_id, k).localCheckpoint()
    ok = agg.filter(F.col("_nl") >= k)
    found = _expand_topk(ok, point_id)
    misses = pts.join(ok.select(point_id), point_id, "left_anti")
    fb = _ring_fallback_lines_topk(misses, segments, grid, point_id, k)
    return found.unionByName(fb)


def _ring_fallback_lines_topk(
    misses: DataFrame, segments: DataFrame, grid: RectGrid,
    point_id: str, k: int,
) -> DataFrame:
    """Ring expansion emitting top-k LINES (see knn_line_join's
    exactness argument)."""
    min_w = float(
        min(np.diff(grid.xbreaks).min(), np.diff(grid.ybreaks).min())
    )
    max_ring = int(max(grid.nx, grid.ny))
    seg_cells = _seg_cells(segments, grid, 0.0)
    x, y = F.col(grid.x_col), F.col(grid.y_col)
    cur = (
        misses.select(point_id, grid.x_col, grid.y_col)
        .withColumn("_ix0", _index_col(x, grid.xbreaks))
        .withColumn("_iy0", _index_col(y, grid.ybreaks))
        .localCheckpoint()
    )
    accepted = []
    R = 1
    while not cur.isEmpty():
        cand = (
            cur.withColumn(
                "_cix",
                F.explode(
                    F.sequence(
                        F.greatest(F.lit(0), F.col("_ix0") - R),
                        F.least(F.lit(grid.nx - 1), F.col("_ix0") + R),
                    )
                ),
            )
            .withColumn(
                "_ciy",
                F.explode(
                    F.sequence(
                        F.greatest(F.lit(0), F.col("_iy0") - R),
                        F.least(F.lit(grid.ny - 1), F.col("_iy0") + R),
                    )
                ),
            )
            .join(seg_cells, ["_cix", "_ciy"])
            .withColumn("_d", _seg_dist_col(grid))
            .groupBy(point_id, "_lid")
            .agg(F.min("_d").alias("_d"))
        )
        agg = _topk_lines(cand, point_id, k)
        last = R >= max_ring
        if last:
            accept = agg
        else:
            accept = agg.filter(
                (F.col("_nl") >= k)
                & (F.element_at("_top", k).getField("_d") < R * min_w)
            )
        accepted.append(accept)
        if last:
            break
        cur = cur.join(
            accept.select(point_id), point_id, "left_anti"
        ).localCheckpoint()
        R = min(R * 2, max_ring)
    if not accepted:
        return (
            misses.select(point_id)
            .limit(0)
            .crossJoin(
                segments.select(F.col("line_id").alias("nn_id")).limit(0)
            )
            .withColumn("rank", F.lit(1).cast("long"))
            .withColumn("nn_dist", F.lit(0.0))
            .select(point_id, "rank", "nn_id", "nn_dist")
        )
    out = accepted[0]
    for a in accepted[1:]:
        out = out.unionByName(a)
    return _expand_topk(out, point_id)
