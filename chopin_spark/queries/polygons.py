"""General-polygon PIP through the real geometry path (SURVEY.md §2.5
'Inner PIP join' with non-rectangular polygons).

Zones here are OCTAGONS — each tract rectangle with its four corners
cut at 25% of the cell size. The engine runs the production pattern for
arbitrary polygons: arithmetic candidate assignment (the containing
tract) + exact ray-cast refine inside an Arrow-batched pandas UDF
(chopin_spark.geom.core.points_in_polygon — the engine's GEOS stand-in).
The DuckDB oracle evaluates the octagon membership in closed form
(rect ∩ four diagonal half-planes), so the UDF's geometry is checked
value-for-value against arithmetic — the strongest parity evidence the
ray-cast path can get.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark import sqlexpr as sx, zones as Z
from chopin_spark.queries import register
from chopin_spark.tables import load

_X = sx.x_expr("doc_id")
_Y = sx.y_expr("doc_id")

_CUT = 0.25  # corner cut, fraction of the tract size
_CX = _CUT * Z.TRACT_W  # 12_500 m
_CY = _CUT * Z.TRACT_H  # 9_375 m


def octagon_ring(xmin: float, ymin: float, xmax: float, ymax: float) -> np.ndarray:
    """Tract rectangle with 25% corner cuts (counter-clockwise ring)."""
    return np.array(
        [
            [xmin + _CX, ymin],
            [xmax - _CX, ymin],
            [xmax, ymin + _CY],
            [xmax, ymax - _CY],
            [xmax - _CX, ymax],
            [xmin + _CX, ymax],
            [xmin, ymax - _CY],
            [xmin, ymin + _CY],
        ]
    )


# Closed-form octagon membership relative to the containing tract:
# local coordinates u = x - tract_xmin, v = y - tract_ymin; inside iff
# all four diagonal half-planes hold (the rect bounds hold by
# construction of the candidate tract). Edges on the diagonals use the
# same strict/non-strict choices as the ray cast's half-open semantics
# never land exactly on LCG-derived doubles.
_U = f"(({_X}) - FLOOR(({_X}) / {Z.TRACT_W!r}) * {Z.TRACT_W!r})"
_V = f"(({_Y}) - FLOOR(({_Y}) / {Z.TRACT_H!r}) * {Z.TRACT_H!r})"
_IN_OCT = (
    f"(({_U}) * {_CY!r} + ({_V}) * {_CX!r} > {_CX * _CY!r}"  # SW cut
    f" AND ({Z.TRACT_W!r} - ({_U})) * {_CY!r} + ({_V}) * {_CX!r} > {_CX * _CY!r}"  # SE
    f" AND ({_U}) * {_CY!r} + ({Z.TRACT_H!r} - ({_V})) * {_CX!r} > {_CX * _CY!r}"  # NW
    f" AND ({Z.TRACT_W!r} - ({_U})) * {_CY!r} + ({Z.TRACT_H!r} - ({_V})) * {_CX!r}"
    f" > {_CX * _CY!r})"  # NE
)

_OCT_ORACLE = f"""
SELECT {Z.zone_id_expr(_X, _Y)} AS zone_id,
       COUNT(*) AS n_inside,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE {_IN_OCT}
GROUP BY 1
"""


@register("pip_octagon_zones", _OCT_ORACLE)
def pip_octagon_zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIP against octagon zones: arithmetic candidate (containing
    tract) + ray-cast refine in a pandas UDF over the octagon ring —
    the general-polygon production pattern, oracle-checked against the
    closed-form half-plane predicate."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.expr(_X).alias("x"),
        F.expr(_Y).alias("y"),
        F.expr(Z.zone_id_expr(_X, _Y)).alias("zone_id"),
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from chopin_spark.geom.core import points_in_polygon

        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(
                    {
                        "zone_id": pd.Series(dtype="object"),
                        "n_chars": pd.Series(dtype="int64"),
                    }
                )
                continue
            x = pdf["x"].to_numpy()
            y = pdf["y"].to_numpy()
            # candidate tract bounds from the point itself (the zone
            # partition is a function of position)
            x0 = np.floor(x / Z.TRACT_W) * Z.TRACT_W
            y0 = np.floor(y / Z.TRACT_H) * Z.TRACT_H
            # refine per candidate tract group (ring differs per tract)
            inside = np.zeros(len(pdf), dtype=bool)
            key = pdf["zone_id"].to_numpy()
            for zid in np.unique(key):
                m = key == zid
                ring = octagon_ring(
                    x0[m][0], y0[m][0],
                    x0[m][0] + Z.TRACT_W, y0[m][0] + Z.TRACT_H,
                )
                inside[m] = points_in_polygon(x[m], y[m], ring)
            out = pdf.loc[inside, ["zone_id", "n_chars"]]
            yield out

    refined = docs.mapInPandas(refine, "zone_id string, n_chars long")
    return refined.groupBy("zone_id").agg(
        F.count(F.lit(1)).alias("n_inside"),
        F.sum("n_chars").alias("sum_chars"),
    )


# --- holed polygons: octagon outer ring minus a central rectangular hole ----

_HW = 0.2 * Z.TRACT_W  # hole half-extent fractions of the tract
_HH = 0.2 * Z.TRACT_H

_IN_HOLE = (
    f"(({_U}) > {Z.TRACT_W / 2 - _HW!r} AND ({_U}) < {Z.TRACT_W / 2 + _HW!r}"
    f" AND ({_V}) > {Z.TRACT_H / 2 - _HH!r}"
    f" AND ({_V}) < {Z.TRACT_H / 2 + _HH!r})"
)

_HOLED_ORACLE = f"""
SELECT {Z.zone_id_expr(_X, _Y)} AS zone_id,
       COUNT(*) AS n_inside,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
WHERE {_IN_OCT} AND NOT {_IN_HOLE}
GROUP BY 1
"""


def hole_ring(x0: float, y0: float) -> np.ndarray:
    """Central rectangular hole of the tract at (x0, y0)."""
    cx, cy = x0 + Z.TRACT_W / 2, y0 + Z.TRACT_H / 2
    return np.array(
        [
            [cx - _HW, cy - _HH],
            [cx + _HW, cy - _HH],
            [cx + _HW, cy + _HH],
            [cx - _HW, cy + _HH],
        ]
    )


@register("pip_holed_zones", _HOLED_ORACLE)
def pip_holed_zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIP against HOLED polygons (octagon outer ring minus a central
    rectangular hole) through geom.core.points_in_parts — the
    even-odd multi-ring path chopin needs for real admin geometries
    (hole handling, /root/reference/R/gridding.R:930-940). Oracle:
    closed-form half-planes AND NOT hole-rect."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.expr(_X).alias("x"),
        F.expr(_Y).alias("y"),
        F.expr(Z.zone_id_expr(_X, _Y)).alias("zone_id"),
    )

    def refine(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from chopin_spark.geom.core import points_in_parts

        for pdf in batches:
            if pdf.empty:
                yield pd.DataFrame(
                    {
                        "zone_id": pd.Series(dtype="object"),
                        "n_chars": pd.Series(dtype="int64"),
                    }
                )
                continue
            x = pdf["x"].to_numpy()
            y = pdf["y"].to_numpy()
            x0 = np.floor(x / Z.TRACT_W) * Z.TRACT_W
            y0 = np.floor(y / Z.TRACT_H) * Z.TRACT_H
            inside = np.zeros(len(pdf), dtype=bool)
            key = pdf["zone_id"].to_numpy()
            for zid in np.unique(key):
                m = key == zid
                outer = octagon_ring(
                    x0[m][0], y0[m][0],
                    x0[m][0] + Z.TRACT_W, y0[m][0] + Z.TRACT_H,
                )
                hole = hole_ring(x0[m][0], y0[m][0])
                inside[m] = points_in_parts(x[m], y[m], [[outer, hole]])
            yield pdf.loc[inside, ["zone_id", "n_chars"]]

    refined = docs.mapInPandas(refine, "zone_id string, n_chars long")
    return refined.groupBy("zone_id").agg(
        F.count(F.lit(1)).alias("n_inside"),
        F.sum("n_chars").alias("sum_chars"),
    )


# --- C5: general polygon × polygon area-weighted overlay --------------------
#
# summarize_aw over a NON-RECT source layer (chopin intersects arbitrary
# polygon pairs via terra::intersect, /root/reference/R/processing.R:799-811;
# VERDICT r02 next-steps #5).  Sources are octagons on a per-source-shifted
# tract frame: anchor tract (ti, tj) plus offsets dx ∈ [CX, W-2CX],
# dy ∈ [CY, H-2CY].  That offset window keeps each source chamfer clear of
# the zone chamfers, so each of the four zone∩source areas has a CLOSED
# FORM the DuckDB oracle can evaluate:
#     zone (ti+di, tj+dj):  lx(di) * ly(dj) - CX*CY
#     lx(0) = W - dx,  lx(1) = dx,  ly(0) = H - dy,  ly(1) = dy
# (the overlap rectangle loses exactly two chamfer triangles).  The Spark
# side ignores the closed form: it runs the general Sutherland–Hodgman
# polygon×polygon clip (geom.core.clip_polygon_convex) in an Arrow-batched
# pandas UDF — the identities are verified against each other.
# Areas are quantized to 1/16 m² before summing (integer-exact,
# shuffle-order-independent).  Quantum choice is a measured safety
# margin, not a guess: across all 240 fixture pairs the closed-form
# value sits ≥ 0.0069 quantized units from the nearest FLOOR(+0.5)
# boundary while the S–H-vs-closed-form drift is ≤ 0.0028 units —
# the two quantizations provably agree (1/64 had a 0.0008-unit pair
# that flipped at sf0.01).

_N_SRC = 60
_W, _H = Z.TRACT_W, Z.TRACT_H

_TI = "(CAST((s_id * 48271) % 14 AS BIGINT) + 1)"
_TJ = "(CAST((s_id * 16807) % 14 AS BIGINT) + 1)"
_SDX = (
    f"({_CX!r} + ({_W - 3 * _CX!r}) *"
    " (CAST((s_id * 40692) % 9973 AS DOUBLE) / 9973.0))"
)
_SDY = (
    f"({_CY!r} + ({_H - 3 * _CY!r}) *"
    " (CAST((s_id * 69621) % 9973 AS DOUBLE) / 9973.0))"
)
_SVAL = "(CAST((s_id * 2654435761) % 9973 AS BIGINT))"

_AW_ORACLE = f"""
WITH src AS (
  SELECT s.s_id, {_TI} AS ti, {_TJ} AS tj,
         {_SDX} AS dx, {_SDY} AS dy, {_SVAL} AS val
  FROM (SELECT UNNEST(generate_series(1, {_N_SRC})) AS s_id) s
),
cells AS (
  SELECT s_id, val, ti + di AS zi, tj + dj AS zj,
         (CASE WHEN di = 0 THEN {_W!r} - dx ELSE dx END)
         * (CASE WHEN dj = 0 THEN {_H!r} - dy ELSE dy END)
         - {_CX * _CY!r} AS area
  FROM src
  CROSS JOIN (SELECT UNNEST([0, 1]) AS di)
  CROSS JOIN (SELECT UNNEST([0, 1]) AS dj)
),
q AS (
  SELECT zi, zj, val,
         CAST(FLOOR(area * 16.0 + 0.5) AS BIGINT) AS qarea
  FROM cells WHERE area > 0.0
)
SELECT {Z.zone_id_expr(f"(zi + 0.5) * {_W!r}", f"(zj + 0.5) * {_H!r}")}
         AS zone_id,
       COUNT(*) AS n_src,
       ROUND(CAST(SUM(val * qarea) AS DOUBLE) / SUM(qarea), 6) AS aw_mean,
       ROUND(SUM(qarea) / 16.0, 2) AS area_sum
FROM q GROUP BY 1
"""


@register("summarize_aw_polygons", _AW_ORACLE)
def summarize_aw_polygons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Area-weighted overlay of octagon sources onto octagon zones via
    the GENERAL polygon×polygon clip: per candidate pair the pandas UDF
    builds both rings and runs Sutherland–Hodgman; the oracle evaluates
    the chamfer-disjoint closed forms.  Candidates come from the
    anchor-tract 2×2 stencil (column math) — the pair set is
    stencil-bounded, never |zones|×|sources|."""
    src = (
        spark.range(1, _N_SRC + 1)
        .selectExpr(
            "id AS s_id",
            f"{_TI.replace('s_id', 'id')} AS ti",
            f"{_TJ.replace('s_id', 'id')} AS tj",
            f"{_SDX.replace('s_id', 'id')} AS dx",
            f"{_SDY.replace('s_id', 'id')} AS dy",
            f"{_SVAL.replace('s_id', 'id')} AS val",
        )
        .withColumn("di", F.explode(F.array(F.lit(0), F.lit(1))))
        .withColumn("dj", F.explode(F.array(F.lit(0), F.lit(1))))
    )

    def clip_areas(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from chopin_spark.geom.core import polygon_intersection_area

        for pdf in batches:
            zis, zjs, vals, qareas = [], [], [], []
            for r in pdf.itertuples(index=False):
                x0, y0 = r.ti * _W, r.tj * _H
                zx0, zy0 = (r.ti + r.di) * _W, (r.tj + r.dj) * _H
                src_ring = octagon_ring(
                    x0 + r.dx, y0 + r.dy, x0 + r.dx + _W, y0 + r.dy + _H
                )
                zone_ring = octagon_ring(zx0, zy0, zx0 + _W, zy0 + _H)
                area = polygon_intersection_area(src_ring, zone_ring)
                if area > 0.0:
                    zis.append(r.ti + r.di)
                    zjs.append(r.tj + r.dj)
                    vals.append(r.val)
                    qareas.append(int(np.floor(area * 16.0 + 0.5)))
            yield pd.DataFrame(
                {
                    "zi": pd.Series(zis, dtype="int64"),
                    "zj": pd.Series(zjs, dtype="int64"),
                    "val": pd.Series(vals, dtype="int64"),
                    "qarea": pd.Series(qareas, dtype="int64"),
                }
            )

    pairs = src.mapInPandas(
        clip_areas, "zi long, zj long, val long, qarea long"
    )
    return (
        pairs.withColumn(
            "zone_id",
            F.expr(
                Z.zone_id_expr(f"(zi + 0.5) * {_W!r}", f"(zj + 0.5) * {_H!r}")
            ),
        )
        .groupBy("zone_id")
        .agg(
            F.count(F.lit(1)).alias("n_src"),
            F.round(
                F.sum(F.col("val") * F.col("qarea")).cast("double")
                / F.sum("qarea"),
                6,
            ).alias("aw_mean"),
            F.round(F.sum("qarea") / 16.0, 2).alias("area_sum"),
        )
    )


# --- C5 completion: CONCAVE zone overlay (ear-clip triangulated clip) -------
#
# summarize_aw where the zones are L-shaped (each tract minus its NE
# quadrant — a concave hexagon) and sources are shifted tract-sized
# rects.  The Spark side runs the fully general path:
# geom.core.polygon_intersection_area_general triangulates the concave
# clip ring (ear clipping) and sums Sutherland–Hodgman clips per
# triangle.  The oracle decomposes each L-zone into two DISJOINT rects
# and sums rect∩rect closed forms — an independent exact computation.
# Quantum 1/2 m² (Q=2): measured min closed-form margin 3.0e-3 units vs
# ≤3.2e-4 units S–H drift (10× headroom; finer lattices land nearer
# FLOOR boundaries on this fixture and provably flip).

_L_NS = 60
_L_Q = 2.0

_LTI = "(CAST((s_id * 48271) % 14 AS BIGINT) + 1)"
_LTJ = "(CAST((s_id * 16807) % 14 AS BIGINT) + 1)"
_LDX = (
    f"({_W!r} * (CAST((s_id * 40692) % 9973 AS DOUBLE) / 9973.0) * 0.9"
    f" + {0.05 * _W!r})"
)
_LDY = (
    f"({_H!r} * (CAST((s_id * 69621) % 9973 AS DOUBLE) / 9973.0) * 0.9"
    f" + {0.05 * _H!r})"
)
_LVAL = "(CAST((s_id * 1103515245) % 9973 AS BIGINT))"


def _rect_isect_sql(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1):
    w = f"GREATEST(0.0, LEAST({ax1}, {bx1}) - GREATEST({ax0}, {bx0}))"
    h = f"GREATEST(0.0, LEAST({ay1}, {by1}) - GREATEST({ay0}, {by0}))"
    return f"({w} * {h})"


# L-zone (zi, zj) = bottom half (full width) ⊔ top-left quadrant
_L_AREA = (
    _rect_isect_sql(
        f"(zi * {_W!r})", f"(zj * {_H!r})",
        f"((zi + 1) * {_W!r})", f"(zj * {_H!r} + {_H / 2!r})",
        "sx0", "sy0", "sx1", "sy1",
    )
    + " + "
    + _rect_isect_sql(
        f"(zi * {_W!r})", f"(zj * {_H!r} + {_H / 2!r})",
        f"(zi * {_W!r} + {_W / 2!r})", f"((zj + 1) * {_H!r})",
        "sx0", "sy0", "sx1", "sy1",
    )
)

_LSHAPE_ORACLE = f"""
WITH src AS (
  SELECT s.s_id, {_LTI} AS ti, {_LTJ} AS tj, {_LVAL} AS val,
         {_LTI} * {_W!r} + {_LDX} AS sx0,
         {_LTJ} * {_H!r} + {_LDY} AS sy0,
         {_LTI} * {_W!r} + {_LDX} + {_W!r} AS sx1,
         {_LTJ} * {_H!r} + {_LDY} + {_H!r} AS sy1
  FROM (SELECT UNNEST(generate_series(1, {_L_NS})) AS s_id) s
),
cells AS (
  SELECT s_id, val, ti + di AS zi, tj + dj AS zj, sx0, sy0, sx1, sy1
  FROM src
  CROSS JOIN (SELECT UNNEST([0, 1]) AS di)
  CROSS JOIN (SELECT UNNEST([0, 1]) AS dj)
),
q AS (
  SELECT zi, zj, val,
         CAST(FLOOR(({_L_AREA}) * {_L_Q!r} + 0.5) AS BIGINT) AS qarea
  FROM cells
)
SELECT {Z.zone_id_expr(f"(zi + 0.5) * {_W!r}", f"(zj + 0.5) * {_H!r}")}
         AS zone_id,
       COUNT(*) AS n_src,
       ROUND(CAST(SUM(val * qarea) AS DOUBLE) / SUM(qarea), 6) AS aw_mean,
       ROUND(SUM(qarea) / {_L_Q!r}, 2) AS area_sum
FROM q WHERE qarea > 0
GROUP BY 1
"""


@register("summarize_aw_lshapes", _LSHAPE_ORACLE)
def summarize_aw_lshapes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Area-weighted overlay onto CONCAVE zones through the fully
    general clip path (ear-clip triangulation + per-triangle S–H);
    oracle = independent disjoint-rect decomposition."""
    src = (
        spark.range(1, _L_NS + 1)
        .selectExpr(
            "id AS s_id",
            f"{_LTI.replace('s_id', 'id')} AS ti",
            f"{_LTJ.replace('s_id', 'id')} AS tj",
            f"{_LDX.replace('s_id', 'id')} AS dx",
            f"{_LDY.replace('s_id', 'id')} AS dy",
            f"{_LVAL.replace('s_id', 'id')} AS val",
        )
        .withColumn("di", F.explode(F.array(F.lit(0), F.lit(1))))
        .withColumn("dj", F.explode(F.array(F.lit(0), F.lit(1))))
    )

    def clip_areas(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from chopin_spark.geom.core import polygon_intersection_area_general

        for pdf in batches:
            zis, zjs, vals, qareas = [], [], [], []
            for r in pdf.itertuples(index=False):
                sx0 = r.ti * _W + r.dx
                sy0 = r.tj * _H + r.dy
                src_ring = np.array(
                    [
                        [sx0, sy0], [sx0 + _W, sy0],
                        [sx0 + _W, sy0 + _H], [sx0, sy0 + _H],
                    ]
                )
                zx0, zy0 = (r.ti + r.di) * _W, (r.tj + r.dj) * _H
                l_ring = np.array(
                    [
                        [zx0, zy0],
                        [zx0 + _W, zy0],
                        [zx0 + _W, zy0 + _H / 2],
                        [zx0 + _W / 2, zy0 + _H / 2],
                        [zx0 + _W / 2, zy0 + _H],
                        [zx0, zy0 + _H],
                    ]
                )
                area = polygon_intersection_area_general(src_ring, l_ring)
                q = int(np.floor(area * _L_Q + 0.5))
                if q > 0:
                    zis.append(r.ti + r.di)
                    zjs.append(r.tj + r.dj)
                    vals.append(r.val)
                    qareas.append(q)
            yield pd.DataFrame(
                {
                    "zi": pd.Series(zis, dtype="int64"),
                    "zj": pd.Series(zjs, dtype="int64"),
                    "val": pd.Series(vals, dtype="int64"),
                    "qarea": pd.Series(qareas, dtype="int64"),
                }
            )

    pairs = src.mapInPandas(
        clip_areas, "zi long, zj long, val long, qarea long"
    )
    return (
        pairs.withColumn(
            "zone_id",
            F.expr(
                Z.zone_id_expr(f"(zi + 0.5) * {_W!r}", f"(zj + 0.5) * {_H!r}")
            ),
        )
        .groupBy("zone_id")
        .agg(
            F.count(F.lit(1)).alias("n_src"),
            F.round(
                F.sum(F.col("val") * F.col("qarea")).cast("double")
                / F.sum("qarea"),
                6,
            ).alias("aw_mean"),
            F.round(F.sum("qarea") / _L_Q, 2).alias("area_sum"),
        )
    )


# --- polygon centroids (terra::centroids / st_centroid dispatch path) --------
#
# chopin converts polygon inputs to POINTS via centroid before grid
# assignment (`/root/reference/R/gridding.R:440`: `center <-
# sf::st_centroid` / `terra::centroids`; `processing.R:71`:
# `terra::centroids(y_vec, inside = TRUE)`).  This query runs that
# dispatch end-to-end: per-zone HOLED-octagon centroid via the
# distributed shoelace-with-hole reduction (per-edge integer cross
# terms summed per zone — the only shuffle carries 12 edges/zone), then
# par_make_grid assignment of the centroid to a coarse 4x4 grid.  Holes
# are OFF-CENTER per zone (ox = ((zidx%5)-2)*1000, oy = ((zidx%7)-3)*500)
# so the centroid genuinely moves opposite the hole — a symmetric
# fixture would pass with the ring term dropped entirely.
#
# Exactness: every vertex is integer meters, so 2A = sum(x1*y2 - x2*y1)
# and 6*A*cx = sum((x1+x2)*(x1*y2 - x2*y1)) are EXACT int64 (max |6Acx|
# ~ 6.2e15 < 2^53, so the final double division is correctly rounded
# and bit-identical to the oracle's closed form: Spark divides 6Acx/6A,
# DuckDB divides Acx/A — same rational, same IEEE quotient).  The
# oracle never touches the shoelace: centroid-of-difference
# (Ao*c_oct - Ah*c_hole)/(Ao - Ah) with Ao, Ah in closed form.

_CEN_W, _CEN_H = int(Z.TRACT_W), int(Z.TRACT_H)            # 50_000 x 37_500
_CEN_CX, _CEN_CY = int(_CX), int(_CY)                      # 12_500 x 9_375
_CEN_HW, _CEN_HH = int(_HW), int(_HH)                      # 10_000 x 7_500
_CEN_AO = _CEN_W * _CEN_H - 2 * _CEN_CX * _CEN_CY          # octagon area
_CEN_AH = (2 * _CEN_HW) * (2 * _CEN_HH)                    # hole area
_CEN_A = _CEN_AO - _CEN_AH
_CEN_GW = (Z.EXTENT[2] - Z.EXTENT[0]) / 4.0                # coarse 4x4 grid
_CEN_GH = (Z.EXTENT[3] - Z.EXTENT[1]) / 4.0


def _cen_edges() -> list[tuple[str, str, str, str]]:
    """12 directed edges (outer octagon CCW + off-center hole CW) as
    symbolic (x1, y1, x2, y2) SQL expressions over xmin/ymin/ox/oy."""
    W, H, CX, CY = _CEN_W, _CEN_H, _CEN_CX, _CEN_CY
    HW, HH = _CEN_HW, _CEN_HH
    hx, hy = f"(xmin + {W // 2} + ox)", f"(ymin + {H // 2} + oy)"
    outer = [
        (f"(xmin + {CX})", "ymin"),
        (f"(xmin + {W - CX})", "ymin"),
        (f"(xmin + {W})", f"(ymin + {CY})"),
        (f"(xmin + {W})", f"(ymin + {H - CY})"),
        (f"(xmin + {W - CX})", f"(ymin + {H})"),
        (f"(xmin + {CX})", f"(ymin + {H})"),
        ("xmin", f"(ymin + {H - CY})"),
        ("xmin", f"(ymin + {CY})"),
    ]
    hole_cw = [
        (f"({hx} - {HW})", f"({hy} - {HH})"),
        (f"({hx} - {HW})", f"({hy} + {HH})"),
        (f"({hx} + {HW})", f"({hy} + {HH})"),
        (f"({hx} + {HW})", f"({hy} - {HH})"),
    ]
    edges = []
    for ring in (outer, hole_cw):
        n = len(ring)
        for i in range(n):
            x1, y1 = ring[i]
            x2, y2 = ring[(i + 1) % n]
            edges.append((x1, y1, x2, y2))
    return edges


_CEN_ORACLE = f"""
WITH z AS (
  SELECT CAST(zidx AS BIGINT) AS zidx,
         CAST((zidx % {Z.TRACT_NX}) * {_CEN_W} AS BIGINT) AS xmin,
         CAST((zidx // {Z.TRACT_NX}) * {_CEN_H} AS BIGINT) AS ymin,
         CAST(((zidx % 5) - 2) * 1000 AS BIGINT) AS ox,
         CAST(((zidx % 7) - 3) * 500 AS BIGINT) AS oy
  FROM generate_series(0, {Z.TRACT_NX * Z.TRACT_NY - 1}) AS g(zidx)
),
c AS (
  SELECT zidx,
         CAST({2 * _CEN_A} AS BIGINT) AS a2,
         CAST({_CEN_A} * (xmin + {_CEN_W // 2}) - {_CEN_AH} * ox AS DOUBLE)
           / {float(_CEN_A)!r} AS cxv,
         CAST({_CEN_A} * (ymin + {_CEN_H // 2}) - {_CEN_AH} * oy AS DOUBLE)
           / {float(_CEN_A)!r} AS cyv
  FROM z
)
SELECT zidx, a2,
       ROUND(cxv, 4) AS cx, ROUND(cyv, 4) AS cy,
       CAST(FLOOR(cxv / {_CEN_GW!r}) AS BIGINT) AS cell_x,
       CAST(FLOOR(cyv / {_CEN_GH!r}) AS BIGINT) AS cell_y
FROM c
"""


@register("zone_centroids_grid", _CEN_ORACLE)
def zone_centroids_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holed-polygon centroids (terra::centroids analog) by distributed
    shoelace-with-hole, then centroid-based coarse-grid dispatch — the
    polygon branch of chopin's par_make_grid assignment."""
    structs = ", ".join(
        f"named_struct('x1', CAST({x1} AS BIGINT), 'y1', CAST({y1} AS BIGINT),"
        f" 'x2', CAST({x2} AS BIGINT), 'y2', CAST({y2} AS BIGINT))"
        for x1, y1, x2, y2 in _cen_edges()
    )
    zones = spark.range(0, Z.TRACT_NX * Z.TRACT_NY, 1, 8).selectExpr(
        "id AS zidx",
        f"(id % {Z.TRACT_NX}) * {_CEN_W} AS xmin",
        f"(id DIV {Z.TRACT_NX}) * {_CEN_H} AS ymin",
        "((id % 5) - 2) * 1000 AS ox",
        "((id % 7) - 3) * 500 AS oy",
    )
    edges = zones.selectExpr("zidx", f"explode(array({structs})) AS e")
    agg = edges.selectExpr(
        "zidx",
        "e.x1 * e.y2 - e.x2 * e.y1 AS cr",
        "e.x1 + e.x2 AS sx",
        "e.y1 + e.y2 AS sy",
    ).groupBy("zidx").agg(
        F.expr("SUM(cr)").alias("a2"),
        F.expr("SUM(sx * cr)").alias("cx6"),
        F.expr("SUM(sy * cr)").alias("cy6"),
    )
    return agg.selectExpr(
        "zidx",
        "a2",
        "ROUND(CAST(cx6 AS DOUBLE) / CAST(3 * a2 AS DOUBLE), 4) AS cx",
        "ROUND(CAST(cy6 AS DOUBLE) / CAST(3 * a2 AS DOUBLE), 4) AS cy",
        f"CAST(FLOOR(CAST(cx6 AS DOUBLE) / CAST(3 * a2 AS DOUBLE)"
        f" / {_CEN_GW!r}) AS BIGINT) AS cell_x",
        f"CAST(FLOOR(CAST(cy6 AS DOUBLE) / CAST(3 * a2 AS DOUBLE)"
        f" / {_CEN_GH!r}) AS BIGINT) AS cell_y",
    )


# --- concave hull of a point pattern (st_concave_hull coercion analog) -------
#
# chopin coerces non-polygon inputs into a polygon that HUGS the point
# pattern before gridding (`/root/reference/R/gridding.R:936`:
# `st_concave_hull(ratio = 0.5, allow_holes = FALSE)`).  GEOS's
# ratio-parameterized hull (edge removal over a constrained Delaunay
# triangulation) has no closed form an independent oracle could check,
# so — same discipline as the planar-hex analog — the engine exposes a
# DETERMINISTIC concave coercion with exact semantics: the union of
# occupied grid cells (64×48 over the extent).  Shape statistics come
# out integer-exact with ZERO geometry code and zero iteration, purely
# from distinct-counts of the cell complex:
#   boundary H-edges = 2·E_h − 2·F,  V-edges = 2·E_v − 2·F
#   Euler characteristic χ = V − (E_h + E_v) + F
#     (χ = #components − #holes, so allow_holes=FALSE is checkable:
#      a single hole-free hull has χ = 1)
# One exhaustive shared SQL text; every count is a DISTINCT over packed
# int keys — at 100 TB this is four count-distinct aggregations over
# the occupied-cell set (bounded by the grid, not the row count).

_CH_NX, _CH_NY = 64, 48
_CH_CW = (Z.EXTENT[2] - Z.EXTENT[0]) / _CH_NX  # 12_500 m
_CH_CH = (Z.EXTENT[3] - Z.EXTENT[1]) / _CH_NY  # 12_500 m
_CH_K = 100000  # key packing: (cx+a)*K + (cy+b); cy+b < K always

_CH_SQL = f"""
WITH pts AS (
  SELECT DISTINCT
         CAST(FLOOR(({_X}) / {_CH_CW!r}) AS BIGINT) AS cx,
         CAST(FLOOR(({_Y}) / {_CH_CH!r}) AS BIGINT) AS cy
  FROM documents
),
f AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cells FROM pts),
eh AS (
  SELECT CAST(COUNT(DISTINCT cx * {_CH_K} + cy + b) AS BIGINT) AS e_h
  FROM pts, (VALUES (0), (1)) AS t(b)
),
ev AS (
  SELECT CAST(COUNT(DISTINCT (cx + a) * {_CH_K} + cy) AS BIGINT) AS e_v
  FROM pts, (VALUES (0), (1)) AS t(a)
),
vv AS (
  SELECT CAST(COUNT(DISTINCT (cx + a) * {_CH_K} + cy + b) AS BIGINT) AS v
  FROM pts, (VALUES (0, 0), (0, 1), (1, 0), (1, 1)) AS t(a, b)
)
SELECT f.n_cells,
       ROUND(CAST(f.n_cells * {_CH_CW * _CH_CH!r} / 1000000.0 AS DOUBLE), 4)
         AS area_km2,
       ROUND(CAST((2 * eh.e_h - 2 * f.n_cells) * {_CH_CW!r} / 1000.0
             + (2 * ev.e_v - 2 * f.n_cells) * {_CH_CH!r} / 1000.0 AS DOUBLE),
             4) AS perim_km,
       CAST(vv.v - eh.e_h - ev.e_v + f.n_cells AS BIGINT) AS euler_chi
FROM f, eh, ev, vv
"""


@register("concave_hull_cells", _CH_SQL)
def concave_hull_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic concave coercion of the document point pattern
    (occupied-cell union): exact area, boundary perimeter, and Euler
    characteristic from cell-complex distinct-counts — shared SQL."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_CH_SQL)


# --- ring validity census (sf::st_is_valid / GEOS IsSimple on rings) ---------
#
# Chopin's workflows assume valid inputs and lean on sf/GEOS validity
# checking upstream (sf::st_make_valid in the vignettes); an engine that
# ingests crawled/third-party geometries needs the check itself.  A ring
# is invalid when two NON-ADJACENT edges properly cross (the bowtie
# case).  Edge pairs are enumerated per ring — a ring_id-keyed self-join
# that partitions perfectly at any scale; the crossing test is the
# shared orientation kernel from roads.seg_intersect_sql.  The ring
# family is closed-form (pentagons with LCG vertices — 302 of 400 are
# bowties, so both verdicts are heavily exercised).

_RV_RINGS, _RV_NV = 400, 5


def _rv_vx(r: str, k: str) -> str:
    return f"(CAST(((({r}) * 977 + ({k})) * 48271) % 9973 AS DOUBLE) / 9973.0)"


def _rv_vy(r: str, k: str) -> str:
    return f"(CAST(((({r}) * 641 + ({k})) * 16807) % 9973 AS DOUBLE) / 9973.0)"


_RV_SEGS_SQL = f"""
  SELECT r.rid AS ring_id, k.k AS e,
         {_rv_vx('r.rid', 'k.k')} AS ax, {_rv_vy('r.rid', 'k.k')} AS ay,
         {_rv_vx('r.rid', f'((k.k + 1) % {_RV_NV})')} AS bx,
         {_rv_vy('r.rid', f'((k.k + 1) % {_RV_NV})')} AS by
  FROM generate_series(1, {_RV_RINGS}) r(rid)
  CROSS JOIN generate_series(0, {_RV_NV - 1}) k(k)
"""


from chopin_spark.roads import seg_intersect_sql  # noqa: E402

_RV_COND = seg_intersect_sql(
    "a.ax", "a.ay", "a.bx", "a.by", "b.ax", "b.ay", "b.bx", "b.by"
)[0]

_RV_ORACLE = f"""
WITH segs AS ({_RV_SEGS_SQL}),
x AS (
  SELECT a.ring_id, COUNT(*) AS n
  FROM segs a JOIN segs b
    ON a.ring_id = b.ring_id AND b.e - a.e >= 2
   AND NOT (a.e = 0 AND b.e = {_RV_NV - 1})
  WHERE {_RV_COND}
  GROUP BY 1
)
SELECT r.rid AS ring_id,
       COALESCE(x.n, 0) AS n_crossings,
       CASE WHEN x.n IS NULL THEN 1 ELSE 0 END AS is_valid
FROM generate_series(1, {_RV_RINGS}) r(rid)
LEFT JOIN x ON x.ring_id = r.rid
"""


@register("ring_validity_check", _RV_ORACLE)
def ring_validity_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per ring: the count of proper non-adjacent edge crossings and
    the simple/bowtie verdict.  Adjacent edges share an endpoint and
    are excluded by construction (the strict sign test would reject
    the shared-endpoint touch anyway — pinned in test_roads)."""
    segs = (
        spark.range(1, _RV_RINGS + 1)
        .select(F.col("id").alias("rid"))
        .select(
            "rid",
            F.explode(F.sequence(F.lit(0), F.lit(_RV_NV - 1))).alias("k"),
        )
        .selectExpr(
            "rid AS ring_id",
            "k AS e",
            f"{_rv_vx('rid', 'k')} AS ax",
            f"{_rv_vy('rid', 'k')} AS ay",
            f"{_rv_vx('rid', f'((k + 1) % {_RV_NV})')} AS bx",
            f"{_rv_vy('rid', f'((k + 1) % {_RV_NV})')} AS by",
        )
    )
    a = segs.select(
        F.col("ring_id"), F.col("e").alias("ea"),
        F.col("ax").alias("aax"), F.col("ay").alias("aay"),
        F.col("bx").alias("abx"), F.col("by").alias("aby"),
    )
    b = segs.select(
        F.col("ring_id"), F.col("e").alias("eb"),
        F.col("ax").alias("bax"), F.col("ay").alias("bay"),
        F.col("bx").alias("bbx"), F.col("by").alias("bby"),
    )
    cond, _, _ = seg_intersect_sql(
        "aax", "aay", "abx", "aby", "bax", "bay", "bbx", "bby"
    )
    x = (
        a.join(b, "ring_id")
        .filter(
            (F.col("eb") - F.col("ea") >= 2)
            & ~((F.col("ea") == 0) & (F.col("eb") == _RV_NV - 1))
        )
        .filter(F.expr(cond))
        .groupBy("ring_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rings = spark.range(1, _RV_RINGS + 1).select(
        F.col("id").alias("ring_id")
    )
    return rings.join(x, "ring_id", "left").select(
        "ring_id",
        F.coalesce("n", F.lit(0)).alias("n_crossings"),
        F.when(F.col("n").isNull(), 1).otherwise(0).alias("is_valid"),
    )


# --- pole of inaccessibility (polylabel, batched-beam quadtree) ---------------
#
# Mapbox's polylabel (the label-placement / maximum-inscribed-circle
# verb every cartographic pipeline runs after dissolve): refine a
# quadtree over the polygon keeping the cell whose center maximizes
# signed distance to the boundary.  The reference algorithm is a
# priority queue (remove-one-expand-one); here it is the BATCHED BEAM
# variant — each round scores ALL live cells (one cells×edges join +
# min-agg), keeps the top B=6 per polygon by the upper bound
# d + r_cell (admissible, so the true optimum cell survives while the
# beam holds), and splits each survivor into 4 — the vectorization
# trade production polylabel ports make on GPUs/SQL engines.
#
# Fixture: 48 holed octagons (the pip_holed_zones family with a
# zone-dependent hole OFFSET, so every polygon's pole differs; hole
# offsets keep the hole strictly inside the octagon).  Segment
# distance and the inside predicate are fixed double expression trees
# over driver-literal constants — bit-identical across engines; rounds
# materialize (MATERIALIZED / checkpointed views — the VW seam).
#
# Scale shape: rounds are a fixed K=7 (cell size W/512); each round is
# |polygons| × B×4 cells × |edges| — embarrassingly parallel across
# polygons, no cross-polygon traffic, the same per-feature
# independence as the zonal family.

_PL_ZONES = 48
_PL_B = 6
_PL_ROUNDS = 7
_PL_W, _PL_H = Z.TRACT_W, Z.TRACT_H

# outer octagon vertices (local coords), CCW — shared with octagon_ring
_PL_OCT = [
    (_CX, 0.0), (_PL_W - _CX, 0.0), (_PL_W, _CY), (_PL_W, _PL_H - _CY),
    (_PL_W - _CX, _PL_H), (_CX, _PL_H), (0.0, _PL_H - _CY), (0.0, _CY),
]

# zone-dependent hole offsets: ±10% of the tract in 5 steps — the hole
# (half-extents 0.2·W/0.2·H) stays ≥5% clear of the octagon cuts
_PL_OX = f"((CAST((z * 7) % 5 AS DOUBLE) - 2.0) * {0.05 * _PL_W!r})"
_PL_OY = f"((CAST((z * 11) % 5 AS DOUBLE) - 2.0) * {0.05 * _PL_H!r})"


def _pl_edges_sql(zsrc: str) -> str:
    """12 directed edges per zone: 8 octagon + 4 hole-rectangle."""
    arms = []
    ring = _PL_OCT + [_PL_OCT[0]]
    for k in range(8):
        (ax, ay), (bx, by) = ring[k], ring[k + 1]
        arms.append(
            f"SELECT z, {ax!r} AS ax, {ay!r} AS ay,"
            f" {bx!r} AS bx, {by!r} AS by FROM {zsrc}"
        )
    hx, hy = _HW, _HH
    cxm, cym = _PL_W / 2.0, _PL_H / 2.0
    hole = [(-hx, -hy), (hx, -hy), (hx, hy), (-hx, hy)]
    hring = hole + [hole[0]]
    for k in range(4):
        (ax, ay), (bx, by) = hring[k], hring[k + 1]
        arms.append(
            f"SELECT z, {cxm!r} + {_PL_OX} + {ax!r},"
            f" {cym!r} + {_PL_OY} + {ay!r},"
            f" {cxm!r} + {_PL_OX} + {bx!r},"
            f" {cym!r} + {_PL_OY} + {by!r} FROM {zsrc}"
        )
    return " UNION ALL ".join(arms)


# inside predicate for a cell center joined to the zone row (hole
# offset via the zone id): the pip_holed_zones half-plane forms
def _pl_in(cx: str, cy: str, z: str) -> str:
    ox = _PL_OX.replace("z *", f"{z} *")
    oy = _PL_OY.replace("z *", f"{z} *")
    return (
        f"({cx} * {_CY!r} + {cy} * {_CX!r} > {_CX * _CY!r}"
        f" AND ({_PL_W!r} - {cx}) * {_CY!r} + {cy} * {_CX!r} > {_CX * _CY!r}"
        f" AND {cx} * {_CY!r} + ({_PL_H!r} - {cy}) * {_CX!r} > {_CX * _CY!r}"
        f" AND ({_PL_W!r} - {cx}) * {_CY!r} + ({_PL_H!r} - {cy}) * {_CX!r}"
        f" > {_CX * _CY!r}"
        f" AND NOT (ABS({cx} - {_PL_W / 2.0!r} - {ox}) < {_HW!r}"
        f"          AND ABS({cy} - {_PL_H / 2.0!r} - {oy}) < {_HH!r}))"
    )

_PL_SEED = f"""
  SELECT z.z, g.gx, g.gy,
         (CAST(g.gx AS DOUBLE) + 0.5) * {_PL_W / 4.0!r} AS cx,
         (CAST(g.gy AS DOUBLE) + 0.5) * {_PL_H / 4.0!r} AS cy,
         {_PL_W / 8.0!r} AS hx, {_PL_H / 8.0!r} AS hy
  FROM pl_zones z CROSS JOIN pl_grid g
"""


def _pl_score_sql(cells: str) -> str:
    """Signed distance of each cell center to the zone's boundary:
    min point-segment distance over the 12 edges, negated outside."""
    l2 = "((e.bx - e.ax) * (e.bx - e.ax) + (e.by - e.ay) * (e.by - e.ay))"
    t = (
        f"LEAST(GREATEST(((c.cx - e.ax) * (e.bx - e.ax)"
        f" + (c.cy - e.ay) * (e.by - e.ay)) / {l2}, 0.0), 1.0)"
    )
    return f"""
  SELECT c.z, c.cx, c.cy, c.hx, c.hy,
         (CASE WHEN {_pl_in('c.cx', 'c.cy', 'c.z')}
               THEN 1.0 ELSE -1.0 END)
           * MIN(SQRT(
               (c.cx - (e.ax + {t} * (e.bx - e.ax)))
                 * (c.cx - (e.ax + {t} * (e.bx - e.ax)))
               + (c.cy - (e.ay + {t} * (e.by - e.ay)))
                 * (c.cy - (e.ay + {t} * (e.by - e.ay))))) AS d
  FROM {cells} c JOIN pl_edges e ON e.z = c.z
  GROUP BY c.z, c.cx, c.cy, c.hx, c.hy
"""


def _pl_beam_sql(scored: str) -> str:
    """Top-B cells per zone by the admissible bound d + cell radius."""
    return f"""
  SELECT z, cx, cy, hx, hy, d FROM (
    SELECT z, cx, cy, hx, hy, d,
           ROW_NUMBER() OVER (PARTITION BY z
             ORDER BY d + SQRT(hx * hx + hy * hy) DESC, cx, cy) AS rn
    FROM {scored}
  ) t WHERE rn <= {_PL_B}
"""


def _pl_split_sql(beam: str) -> str:
    return f"""
  SELECT b.z,
         b.cx + q.sx * b.hx / 2.0 AS cx,
         b.cy + q.sy * b.hy / 2.0 AS cy,
         b.hx / 2.0 AS hx, b.hy / 2.0 AS hy
  FROM {beam} b CROSS JOIN pl_quad q
"""

_PL_FINAL = f"""
SELECT z AS zone_i,
       ROUND(cx, 3) AS label_x, ROUND(cy, 3) AS label_y,
       ROUND(d, 3) AS pole_dist
FROM (
  SELECT z, cx, cy, d,
         ROW_NUMBER() OVER (PARTITION BY z ORDER BY d DESC, cx, cy) AS rn
  FROM pl_scored_{_PL_ROUNDS}
) t WHERE rn = 1
ORDER BY z
"""

_PL_ZSRC_DUCK = (
    f"pl_zones AS (SELECT CAST(UNNEST(generate_series(0, {_PL_ZONES - 1}))"
    " AS BIGINT) AS z)"
)
_PL_ZSRC_SPARK = (
    f"pl_zones AS (SELECT CAST(x AS BIGINT) AS z"
    f" FROM (SELECT explode(sequence(0, {_PL_ZONES - 1})) AS x))"
)
_PL_GRID_DUCK = (
    "pl_grid AS (SELECT a.gx, b.gy FROM"
    " (SELECT UNNEST(generate_series(0, 3)) AS gx) a,"
    " (SELECT UNNEST(generate_series(0, 3)) AS gy) b)"
)
_PL_GRID_SPARK = (
    "pl_grid AS (SELECT gx, gy FROM"
    " (SELECT explode(sequence(0, 3)) AS gx)"
    " CROSS JOIN (SELECT explode(sequence(0, 3)) AS gy))"
)
_PL_QUAD_DUCK = (
    "pl_quad AS (SELECT a.sx, b.sy FROM"
    " (SELECT UNNEST([CAST(-1 AS DOUBLE), CAST(1 AS DOUBLE)]) AS sx) a,"
    " (SELECT UNNEST([CAST(-1 AS DOUBLE), CAST(1 AS DOUBLE)]) AS sy) b)"
)
_PL_QUAD_SPARK = (
    "pl_quad AS (SELECT sx, sy FROM"
    " (SELECT explode(array(CAST(-1 AS DOUBLE), CAST(1 AS DOUBLE))) AS sx)"
    " CROSS JOIN"
    " (SELECT explode(array(CAST(-1 AS DOUBLE), CAST(1 AS DOUBLE))) AS sy))"
)


def _pl_oracle() -> str:
    ctes = [
        _PL_ZSRC_DUCK, _PL_GRID_DUCK, _PL_QUAD_DUCK,
        f"pl_edges AS MATERIALIZED ({_pl_edges_sql('pl_zones')})",
        f"pl_cells_0 AS MATERIALIZED ({_PL_SEED})",
    ]
    for r in range(1, _PL_ROUNDS + 1):
        ctes.append(
            f"pl_scored_{r} AS MATERIALIZED"
            f" ({_pl_score_sql(f'pl_cells_{r - 1}')})"
        )
        if r < _PL_ROUNDS:
            ctes.append(
                f"pl_beam_{r} AS MATERIALIZED"
                f" ({_pl_beam_sql(f'pl_scored_{r}')})"
            )
            ctes.append(
                f"pl_cells_{r} AS MATERIALIZED"
                f" ({_pl_split_sql(f'pl_beam_{r}')})"
            )
    return "WITH " + ",\n".join(ctes) + "\n" + _PL_FINAL


@register("polylabel_holed_zones", _pl_oracle())
def polylabel_holed_zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pole of inaccessibility per holed-octagon zone via 7 batched
    quadtree-beam rounds (B=6, admissible d + r_cell bound): the label
    point and its clearance, deterministic ties by (d, cx, cy)."""
    spark.sql(f"WITH {_PL_ZSRC_SPARK} SELECT * FROM pl_zones"
              ).createOrReplaceTempView("pl_zones")
    spark.sql(f"WITH {_PL_GRID_SPARK} SELECT * FROM pl_grid"
              ).createOrReplaceTempView("pl_grid")
    spark.sql(f"WITH {_PL_QUAD_SPARK} SELECT * FROM pl_quad"
              ).createOrReplaceTempView("pl_quad")
    spark.sql(_pl_edges_sql("pl_zones")).localCheckpoint(
    ).createOrReplaceTempView("pl_edges")
    spark.sql(_PL_SEED).localCheckpoint(
    ).createOrReplaceTempView("pl_cells_0")
    for r in range(1, _PL_ROUNDS + 1):
        spark.sql(_pl_score_sql(f"pl_cells_{r - 1}")).localCheckpoint(
        ).createOrReplaceTempView(f"pl_scored_{r}")
        if r < _PL_ROUNDS:
            spark.sql(_pl_beam_sql(f"pl_scored_{r}")).localCheckpoint(
            ).createOrReplaceTempView(f"pl_beam_{r}")
            spark.sql(_pl_split_sql(f"pl_beam_{r}")).localCheckpoint(
            ).createOrReplaceTempView(f"pl_cells_{r}")
    return spark.sql(_PL_FINAL)
