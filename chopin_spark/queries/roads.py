"""Point-to-road nearest queries (the reference's flagship nearest
demo: points → road LINESTRINGs, /root/reference/README.md:1065-1118).

Road geometry is a deterministic closed form of (road_id, vertex_k) —
the same SQL text evaluates in Spark and DuckDB, so the oracle
brute-forces the exact same layer without any data exchange.  The
Spark plan is the cell-index segment join from chopin_spark.roads;
the oracle is the full doc × segment cross join (fine at sf0.01).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark import sqlexpr as sx
from chopin_spark.grid import make_regular_grid
from chopin_spark.queries import register
from chopin_spark.roads import nearest_line_join, seg_dist_sql
from chopin_spark.tables import load

_N_ROADS, _N_SEGS = 40, 4  # 5 vertices → 4 segments per road
_RADIUS = 60_000.0

_DX = sx.x_expr("doc_id")
_DY = sx.y_expr("doc_id")


def _vx(r: str, k: str) -> str:
    """Vertex x: a per-road anchor plus a bounded per-vertex offset —
    roads are ~local polylines (≤ ±25 km from anchor), not map-spanning
    zigzags, so segment bboxes stay cell-sized."""
    anchor = (
        f"(60000.0 + 680000.0 *"
        f" (CAST((({r}) * 48271) % 9973 AS DOUBLE) / 9973.0))"
    )
    off = (
        f"(50000.0 * (CAST(((({r}) * 131 + ({k})) * 69621) % 9973"
        f" AS DOUBLE) / 9973.0) - 25000.0)"
    )
    return f"({anchor} + {off})"


def _vy(r: str, k: str) -> str:
    anchor = (
        f"(45000.0 + 510000.0 *"
        f" (CAST((({r}) * 16807) % 9973 AS DOUBLE) / 9973.0))"
    )
    off = (
        f"(50000.0 * (CAST(((({r}) * 197 + ({k})) * 40692) % 9973"
        f" AS DOUBLE) / 9973.0) - 25000.0)"
    )
    return f"({anchor} + {off})"


def road_segments(spark: SparkSession, n_roads: int = _N_ROADS) -> DataFrame:
    """The synthetic road layer as a segment table (line_id, seg,
    ax..by): both endpoints in closed form per (road_id, k) — no join,
    no Python, reproducible in DuckDB from the identical text."""
    return (
        spark.range(1, n_roads + 1)
        .select(F.col("id").alias("rid"))
        .select(
            "rid",
            F.explode(F.sequence(F.lit(0), F.lit(_N_SEGS - 1))).alias("k"),
        )
        .selectExpr(
            "rid AS line_id",
            "k AS seg",
            f"{_vx('rid', 'k')} AS ax",
            f"{_vy('rid', 'k')} AS ay",
            f"{_vx('rid', '(k + 1)')} AS bx",
            f"{_vy('rid', '(k + 1)')} AS by",
        )
    )


_ROAD_ORACLE = f"""
WITH segs AS (
  SELECT r.rid AS line_id,
         {_vx('r.rid', 'k.k')} AS ax, {_vy('r.rid', 'k.k')} AS ay,
         {_vx('r.rid', '(k.k + 1)')} AS bx2, {_vy('r.rid', '(k.k + 1)')} AS by2
  FROM generate_series(1, {_N_ROADS}) r(rid)
  CROSS JOIN generate_series(0, {_N_SEGS - 1}) k(k)
),
d AS (SELECT doc_id, {_DX} AS x, {_DY} AS y FROM documents),
pairs AS (
  SELECT doc_id, line_id,
         {seg_dist_sql('x', 'y', 'ax', 'ay', 'bx2', 'by2')} AS dist
  FROM d CROSS JOIN segs
),
rk AS (
  SELECT doc_id, line_id, dist,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dist, line_id) AS rn
  FROM pairs
)
SELECT doc_id, line_id AS road_id, ROUND(dist, 4) AS dist_m
FROM rk WHERE rn = 1
"""


@register("nearest_road", _ROAD_ORACLE)
def nearest_road(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest road per document (terra::nearest over a LINESTRING
    layer, the reference's README benchmark): cell-index segment join
    + ring-expansion fallback — exact at every grid size, verified
    against the brute-force segment-distance oracle."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_DX).alias("x"), F.expr(_DY).alias("y")
    )
    g = make_regular_grid(16, 12)
    out = nearest_line_join(docs, road_segments(spark), g, "doc_id", _RADIUS)
    return out.select(
        "doc_id",
        F.col("nn_id").alias("road_id"),
        F.round("nn_dist", 4).alias("dist_m"),
    )


# --- line-in-polygon overlay: road length per admin zone --------------------
#
# The length-weighted twin of summarize_aw: clip every road segment to
# the exhaustive tract partition and sum clipped lengths per zone —
# chopin reaches this with terra::intersect + perim (the overlay join
# family, /root/reference/R/processing.R:770-897).  Everything is pure
# column arithmetic (Liang–Barsky parameter clamping, roads.
# seg_len_in_rect_sql): no pandas UDF anywhere, the identical SQL text
# evaluates in DuckDB, and because every operation is exact-rounded
# IEEE arithmetic the doubles match BIT-FOR-BIT — lengths quantize to
# a 1/1024 m lattice purely to make the distributed SUM
# order-independent, not to absorb drift.

import chopin_spark.zones as _Z  # noqa: E402
from chopin_spark.roads import seg_len_in_rect_sql  # noqa: E402

_ZW, _ZH = _Z.TRACT_W, _Z.TRACT_H

_SEGS_SQL = f"""
  SELECT r.rid AS line_id,
         {_vx('r.rid', 'k.k')} AS ax, {_vy('r.rid', 'k.k')} AS ay,
         {_vx('r.rid', '(k.k + 1)')} AS bx2, {_vy('r.rid', '(k.k + 1)')} AS by2
  FROM generate_series(1, {_N_ROADS}) r(rid)
  CROSS JOIN generate_series(0, {_N_SEGS - 1}) k(k)
"""

_LEN_IN_TRACT = seg_len_in_rect_sql(
    "ax", "ay", "bx2", "by2",
    f"(zi * {_ZW!r})", f"(zj * {_ZH!r})",
    f"((zi + 1) * {_ZW!r})", f"((zj + 1) * {_ZH!r})",
)

_LEN_ORACLE = f"""
WITH segs AS ({_SEGS_SQL}),
cells AS (
  SELECT line_id, ax, ay, bx2, by2, zi.zi, zj.zj
  FROM segs
  CROSS JOIN generate_series(0, 15) zi(zi)
  CROSS JOIN generate_series(0, 15) zj(zj)
),
q AS (
  SELECT zi, zj, line_id,
         CAST(FLOOR({_LEN_IN_TRACT} * 1024.0 + 0.5) AS BIGINT) AS qlen
  FROM cells
)
SELECT {_Z.zone_id_expr(f"(zi + 0.5) * {_ZW!r}", f"(zj + 0.5) * {_ZH!r}")}
         AS zone_id,
       COUNT(DISTINCT CASE WHEN qlen > 0 THEN line_id END) AS n_roads,
       ROUND(CAST(SUM(qlen) AS DOUBLE) / 1024.0, 2) AS road_len_m
FROM q GROUP BY 1 HAVING SUM(qlen) > 0
"""


@register("road_length_by_zone", _LEN_ORACLE)
def road_length_by_zone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Road length per tract zone, entirely JVM-side: segments explode
    to the tract cells their bbox overlaps (index arithmetic), the
    Liang–Barsky clip length is a shared-text SQL expression, and the
    per-zone sum runs on the 1/1024 m integer lattice.  The oracle
    enumerates segments × all 256 tracts; the extra terms it sums are
    exact zeros, so candidate pruning is value-invisible."""
    segs = road_segments(spark)
    zi_lo = F.floor(F.least("ax", "bx") / _ZW).cast("int")
    zi_hi = F.floor(F.greatest("ax", "bx") / _ZW).cast("int")
    zj_lo = F.floor(F.least("ay", "by") / _ZH).cast("int")
    zj_hi = F.floor(F.greatest("ay", "by") / _ZH).cast("int")
    cand = (
        segs.withColumn(
            "zi",
            F.explode(
                F.sequence(
                    F.greatest(zi_lo, F.lit(0)), F.least(zi_hi, F.lit(15))
                )
            ),
        )
        .withColumn(
            "zj",
            F.explode(
                F.sequence(
                    F.greatest(zj_lo, F.lit(0)), F.least(zj_hi, F.lit(15))
                )
            ),
        )
        .selectExpr(
            "zi", "zj", "line_id",
            "ax", "ay", "bx AS bx2", "by AS by2",
        )
        .selectExpr(
            "zi", "zj", "line_id",
            f"CAST(FLOOR({_LEN_IN_TRACT} * 1024.0 + 0.5) AS BIGINT) AS qlen",
        )
    )
    return (
        cand.groupBy(
            F.expr(
                _Z.zone_id_expr(f"(zi + 0.5) * {_ZW!r}", f"(zj + 0.5) * {_ZH!r}")
            ).alias("zone_id")
        )
        .agg(
            F.count_distinct(
                F.when(F.col("qlen") > 0, F.col("line_id"))
            ).alias("n_roads"),
            F.round(F.sum("qlen").cast("double") / 1024.0, 2).alias(
                "road_len_m"
            ),
        )
        .filter(F.col("road_len_m") > 0)
    )


# --- range join: documents within D of any road -----------------------------

_RANGE_D = 30_000.0

_RANGE_ORACLE = f"""
WITH segs AS ({_SEGS_SQL}),
d AS (SELECT doc_id, {_DX} AS x, {_DY} AS y FROM documents),
hits AS (
  SELECT doc_id, line_id
  FROM d CROSS JOIN segs
  WHERE {seg_dist_sql('x', 'y', 'ax', 'ay', 'bx2', 'by2')} <= {_RANGE_D!r}
)
SELECT doc_id,
       COUNT(*) AS n_segs,
       COUNT(DISTINCT line_id) AS n_roads
FROM hits GROUP BY doc_id
"""


@register("docs_near_roads", _RANGE_ORACLE)
def docs_near_roads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-band range join to a line layer: per document, how many
    road segments / distinct roads lie within 30 km.  Segments register
    in radius-padded cells, docs join their core cell — candidate
    volume is density-bounded; docs with no road in range drop out
    (inner-join semantics), exactly as the oracle's."""
    from chopin_spark.roads import _seg_cells

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_DX).alias("x"), F.expr(_DY).alias("y")
    )
    g = make_regular_grid(16, 12)
    from chopin_spark.grid import _index_col

    pts = docs.withColumn(
        "_cix", _index_col(F.col("x"), g.xbreaks)
    ).withColumn("_ciy", _index_col(F.col("y"), g.ybreaks))
    segc = _seg_cells(road_segments(spark), g, _RANGE_D)
    hits = (
        pts.join(segc, ["_cix", "_ciy"])
        .filter(
            F.expr(
                seg_dist_sql("x", "y", "_sax", "_say", "_sbx", "_sby")
            )
            <= _RANGE_D
        )
    )
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segs"),
        F.count_distinct("_lid").alias("n_roads"),
    )


# --- k nearest roads --------------------------------------------------------

_KNN_K = 3

_KNN_ROAD_ORACLE = f"""
WITH segs AS ({_SEGS_SQL}),
d AS (SELECT doc_id, {_DX} AS x, {_DY} AS y FROM documents),
per_line AS (
  SELECT doc_id, line_id,
         MIN({seg_dist_sql('x', 'y', 'ax', 'ay', 'bx2', 'by2')}) AS dist
  FROM d CROSS JOIN segs
  GROUP BY doc_id, line_id
),
rk AS (
  SELECT doc_id, line_id, dist,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dist, line_id) AS rn
  FROM per_line
)
SELECT doc_id, CAST(rn AS BIGINT) AS rank, line_id AS road_id,
       ROUND(dist, 4) AS dist_m
FROM rk WHERE rn <= {_KNN_K}
"""


@register("knn3_road", _KNN_ROAD_ORACLE)
def knn3_road(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 nearest roads per document (per-line min over segments, then
    top-k lines) via the cell-index candidate join + ring fallback —
    oracle is the brute-force per-line window ranking."""
    from chopin_spark.roads import knn_line_join

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_DX).alias("x"), F.expr(_DY).alias("y")
    )
    g = make_regular_grid(16, 12)
    out = knn_line_join(
        docs, road_segments(spark), g, "doc_id", _RADIUS, k=_KNN_K
    )
    return out.select(
        "doc_id",
        "rank",
        F.col("nn_id").alias("road_id"),
        F.round("nn_dist", 4).alias("dist_m"),
    )


# --- raster extraction along lines (terra::extract over LINESTRINGs) --------
#
# terra::extract(raster, lines) returns the values of every cell the
# line touches (terra rasterizes the line; /root/reference's C1 verb
# family, R/processing.R:184-208, applied to the roads layer its own
# nearest demo ships).  Traversal here is deterministic half-pixel
# stepping: each segment is sampled every min-pixel-edge/2 metres
# (step count = CEIL(len / step), endpoints included), sample points
# map to pixel (i, j) by floor arithmetic, and pixels dedup per line.
# Half-pixel spacing cannot skip a column or row the segment crosses
# for near-axis-aligned lines and matches terra's line-rasterization
# semantics on the synthetic layer; the recipe is part of the shared
# SQL text, so both engines traverse the IDENTICAL pixel set (IEEE
# expression order is the same on both sides).
#
# Scale shape: sample explosion is bounded by length/step per segment
# (data-parallel, no shuffle), the dedup + value lookup shuffle keys
# are (line_id, i, j) — narrow — and the tile table joins by tile_id
# exactly like extract_at_points: at 10^12 line-cells the tile side is
# the broadcast dimension.  The engine goes through the STORED tile
# path (tile_id equi-join + element_at into the tile array); the
# oracle recomputes the DN closed form, so a hash match proves the
# whole traversal + storage lookup chain.

_LSTEP = 390.625  # PW / 2 — half the pixel edge

_NSTEPS = (
    "GREATEST(1, CAST(CEIL(SQRT((bx2 - ax) * (bx2 - ax)"
    f" + (by2 - ay) * (by2 - ay)) / {_LSTEP!r}) AS BIGINT))"
)
_T = "(CAST(s AS DOUBLE) / n)"
_LPX = f"(ax + {_T} * (bx2 - ax))"
_LPY = f"(ay + {_T} * (by2 - ay))"


def _lines_extract_oracle() -> str:
    from chopin_spark.raster import PH, PW, V_MOD, V_MX, V_MY

    return f"""
WITH segs AS ({_SEGS_SQL}),
st AS (
  SELECT line_id, ax, ay, bx2, by2, {_NSTEPS} AS n FROM segs
),
samp AS (
  SELECT line_id, ax, ay, bx2, by2, n,
         UNNEST(generate_series(0, n)) AS s
  FROM st
),
pix AS (
  SELECT DISTINCT line_id,
         CAST(FLOOR({_LPX} / {PW!r}) AS BIGINT) AS i,
         CAST(FLOOR({_LPY} / {PH!r}) AS BIGINT) AS j
  FROM samp
)
SELECT line_id,
       COUNT(*) AS n_pixels,
       CAST(SUM((i * {V_MX} + j * {V_MY}) % {V_MOD}) AS BIGINT) AS sum_val,
       ROUND(CAST(SUM((i * {V_MX} + j * {V_MY}) % {V_MOD}) AS DOUBLE)
             / COUNT(*), 4) AS mean_val
FROM pix GROUP BY 1
"""


@register("extract_at_lines", _lines_extract_oracle())
def extract_at_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal stats of the raster along each road LINESTRING: half-pixel
    segment sampling → distinct touched pixels per line → stored-tile
    lookup (tile_id equi-join + element_at) → per-line mean/sum/count.
    The oracle replays the identical traversal against the DN closed
    form — the hash match covers sampling, dedup, tile addressing and
    the in-array offset."""
    from chopin_spark.queries.zonal import _tiles
    from chopin_spark.raster import PH, PW, TILE, TNX

    segs = road_segments(spark).selectExpr(
        "line_id", "ax", "ay", "bx AS bx2", "by AS by2"
    )
    pix = (
        segs.selectExpr("*", f"{_NSTEPS} AS n")
        .selectExpr(
            "line_id", "ax", "ay", "bx2", "by2", "n",
            "explode(sequence(CAST(0 AS BIGINT), n)) AS s",
        )
        .selectExpr(
            "line_id",
            f"CAST(FLOOR({_LPX} / {PW!r}) AS BIGINT) AS i",
            f"CAST(FLOOR({_LPY} / {PH!r}) AS BIGINT) AS j",
        )
        .distinct()
        .withColumn(
            "tile_id",
            (F.col("j") / TILE).cast("long") * TNX
            + (F.col("i") / TILE).cast("long"),
        )
    )
    tiles = _tiles(spark, n_rasters=1).select("tile_id", "values")
    vals = pix.join(tiles, "tile_id").select(
        "line_id",
        F.element_at(
            "values",
            ((F.col("j") % TILE) * TILE + F.col("i") % TILE + 1).cast("int"),
        ).alias("val"),
    )
    return vals.groupBy("line_id").agg(
        F.count(F.lit(1)).alias("n_pixels"),
        F.sum("val").cast("bigint").alias("sum_val"),
        F.round(
            F.sum("val").cast("double") / F.count(F.lit(1)), 4
        ).alias("mean_val"),
    )


# --- runner composition: nearest road through the par_grid surface -----------
#
# The reference's flagship composition is par_grid × terra::nearest over
# the ncroads line layer (/root/reference/README.md:1077-1118): the
# POINT side splits into grid cells, the LINE side enters every padded
# cell, and the per-cell function computes nearest-feature locally.
# This query runs roads-nearest through runners.par_cells (the runner
# face) instead of the join face (nearest_line_join) — the per-cell
# numpy kernel replays seg_dist_sql's exact operation order (clamped-t
# projection, same IEEE rounding per op), so runner == join face ==
# brute-force oracle value-for-value, not just row-counts.

import numpy as _np  # noqa: E402
import pandas as _pd  # noqa: E402


def _nearest_cell_fun(kpdf: "_pd.DataFrame", cpdf: "_pd.DataFrame"):
    """Per-cell nearest-segment kernel: exact argmin with (dist,
    line_id) tie-break; emits only points whose nearest candidate is
    within _RADIUS (the pad guarantees candidate completeness for
    those, so the filtered argmin is the global one)."""
    if cpdf.empty or kpdf.empty:
        return None
    ax, ay = cpdf["ax"].to_numpy(), cpdf["ay"].to_numpy()
    bx, by = cpdf["bx"].to_numpy(), cpdf["by"].to_numpy()
    lid = cpdf["line_id"].to_numpy()
    dx, dy = bx - ax, by - ay
    len2 = dx * dx + dy * dy
    safe = _np.where(len2 == 0.0, 1.0, len2)
    px = kpdf["x"].to_numpy()[:, None]
    py = kpdf["y"].to_numpy()[:, None]
    wx, wy = px - ax[None, :], py - ay[None, :]
    t = _np.where(len2 == 0.0, 0.0, (wx * dx + wy * dy) / safe)
    t = _np.minimum(_np.maximum(t, 0.0), 1.0)  # GREATEST then LEAST
    ex, ey = wx - t * dx, wy - t * dy
    d = _np.sqrt(ex * ex + ey * ey)
    ids, roads, dists = [], [], []
    docs = kpdf["doc_id"].to_numpy()
    for i in range(d.shape[0]):
        j = _np.lexsort((lid, d[i]))[0]
        if d[i, j] <= _RADIUS:
            ids.append(int(docs[i]))
            roads.append(int(lid[j]))
            dists.append(float(d[i, j]))
    return _pd.DataFrame(
        {"doc_id": ids, "road_id": roads, "nn_dist": dists}
    )


def runner_nearest_road(
    spark: SparkSession, sf_dir: str, nx: int = 16, ny: int = 12
) -> DataFrame:
    """The composition itself, grid size parameterized so tests can pin
    grid-size invariance (runner == join face at any partitioning)."""
    from chopin_spark.roads import _seg_cells
    from chopin_spark.runners import par_cells

    g = make_regular_grid(nx, ny)
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_DX).alias("x"), F.expr(_DY).alias("y")
    )
    keyed = g.assign_core(docs)
    context = _seg_cells(road_segments(spark), g, _RADIUS).select(
        (F.col("_ciy") * g.nx + F.col("_cix")).alias("cgridid"),
        F.col("_lid").alias("line_id"),
        F.col("_sax").alias("ax"),
        F.col("_say").alias("ay"),
        F.col("_sbx").alias("bx"),
        F.col("_sby").alias("by"),
    )
    out = par_cells(
        keyed, context, "cgridid", _nearest_cell_fun,
        "doc_id long, road_id long, nn_dist double",
    )
    return out.select(
        "doc_id", "road_id", F.round("nn_dist", 4).alias("dist_m")
    )


_RUNNER_ROAD_ORACLE = f"""
WITH segs AS (
  SELECT r.rid AS line_id,
         {_vx('r.rid', 'k.k')} AS ax, {_vy('r.rid', 'k.k')} AS ay,
         {_vx('r.rid', '(k.k + 1)')} AS bx2, {_vy('r.rid', '(k.k + 1)')} AS by2
  FROM generate_series(1, {_N_ROADS}) r(rid)
  CROSS JOIN generate_series(0, {_N_SEGS - 1}) k(k)
),
d AS (SELECT doc_id, {_DX} AS x, {_DY} AS y FROM documents),
pairs AS (
  SELECT doc_id, line_id,
         {seg_dist_sql('x', 'y', 'ax', 'ay', 'bx2', 'by2')} AS dist
  FROM d CROSS JOIN segs
),
rk AS (
  SELECT doc_id, line_id, dist,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dist, line_id) AS rn
  FROM pairs
)
SELECT doc_id, line_id AS road_id, ROUND(dist, 4) AS dist_m
FROM rk WHERE rn = 1 AND dist <= {_RADIUS}
"""


@register("par_grid_nearest_road", _RUNNER_ROAD_ORACLE)
def par_grid_nearest_road(spark: SparkSession, sf_dir: str) -> DataFrame:
    """roads-nearest through the runner surface (reference flagship:
    par_grid × nearest over ncroads, README.md:1077-1118): point side
    core-assigned, segment side registered into every radius-padded
    cell, per-cell exact numpy kernel — value-identical to both the
    join-face query (nearest_road) within radius and the brute-force
    oracle.  VERDICT r03 next-round #4."""
    return runner_nearest_road(spark, sf_dir)


# --- line x line intersections (terra::intersect on two line layers) ---------
#
# The reference workflow intersects vector layers before zonal work
# (terra::intersect; sf::st_intersection in the README pipelines).  On
# lines the output is the crossing POINTS — the computational geometry
# kernel is the orientation test, and the scale shape is the same
# cell-bucketed segment join as every other roads query: segments
# register in the grid cells their bbox touches, candidate pairs exist
# only within a cell, and a DISTINCT collapses pairs whose shared bbox
# spans several cells.  Never an all-pairs join: fan-out is bounded by
# per-cell segment density, the quadtree/R-tree equivalent at crawl
# scale.  The layer here is the closed-form road family densified to
# 800 lines so the crossing census is non-trivial (231 points).

_X_N_ROADS = 800

_X_SEGS_SQL = f"""
  SELECT r.rid AS line_id, k.k AS seg,
         {_vx('r.rid', 'k.k')} AS ax, {_vy('r.rid', 'k.k')} AS ay,
         {_vx('r.rid', '(k.k + 1)')} AS bx, {_vy('r.rid', '(k.k + 1)')} AS by
  FROM generate_series(1, {_X_N_ROADS}) r(rid)
  CROSS JOIN generate_series(0, {_N_SEGS - 1}) k(k)
"""

from chopin_spark.roads import seg_intersect_sql  # noqa: E402

_X_COND, _X_IX, _X_IY = seg_intersect_sql(
    "a.ax", "a.ay", "a.bx", "a.by", "b.ax", "b.ay", "b.bx", "b.by"
)

_X_ORACLE = f"""
WITH segs AS ({_X_SEGS_SQL})
SELECT a.line_id AS line_a, a.seg AS seg_a,
       b.line_id AS line_b, b.seg AS seg_b,
       {_X_IX} AS ix, {_X_IY} AS iy
FROM segs a JOIN segs b ON a.line_id < b.line_id
WHERE {_X_COND}
"""


@register("road_intersections", _X_ORACLE)
def road_intersections(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crossing points between distinct roads: cell-bucketed segment
    pair join + shared-text orientation test + exact IEEE intersection
    point; DISTINCT removes multi-cell double-detections (the point
    expression is the same text per pair, so duplicates are bitwise).
    Oracle is the brute-force all-pairs join — the hash match proves
    the cell index loses no crossing and invents none."""
    from chopin_spark.grid import _index_col

    segs = road_segments(spark, _X_N_ROADS)
    g = make_regular_grid(16, 12)
    reg = (
        segs.withColumn(
            "_cix",
            F.explode(
                F.sequence(
                    _index_col(F.least("ax", "bx"), g.xbreaks),
                    _index_col(F.greatest("ax", "bx"), g.xbreaks),
                )
            ),
        )
        .withColumn(
            "_ciy",
            F.explode(
                F.sequence(
                    _index_col(F.least("ay", "by"), g.ybreaks),
                    _index_col(F.greatest("ay", "by"), g.ybreaks),
                )
            ),
        )
    )
    # TOUCHED-cell filter: the bbox-range double explode registers a
    # diagonal segment in every cell of its bounding RECTANGLE (a×b
    # cells) though it touches only ~a+b of them — the pair join then
    # squares that inflation per cell (guide §3: avoid exploding
    # joins).  A cell is kept unless all four of its corners lie
    # STRICTLY on one side of the segment's line (with slack ≫ the
    # double rounding error, so a true crossing near a cell wall can
    # never be dropped): a conservative, lossless prune — a pair whose
    # true crossing lies in a cell both segments touch still meets
    # there; false candidates die in the exact intersection test
    # exactly as before.
    x0, y0 = float(g.xbreaks[0]), float(g.ybreaks[0])
    cw = float(g.xbreaks[1] - g.xbreaks[0])
    ch = float(g.ybreaks[1] - g.ybreaks[0])
    eps = 1.0  # m² units; cross terms are ~1e11, fp error ≲ 1e-4
    cross = (
        f"((bx - ax) * (%s - ay) - (by - ay) * (%s - ax))"
    )
    cxlo, cxhi = f"({x0!r} + _cix * {cw!r})", f"({x0!r} + (_cix + 1) * {cw!r})"
    cylo, cyhi = f"({y0!r} + _ciy * {ch!r})", f"({y0!r} + (_ciy + 1) * {ch!r})"
    corners = [
        cross % (cylo, cxlo), cross % (cylo, cxhi),
        cross % (cyhi, cxlo), cross % (cyhi, cxhi),
    ]
    all_pos = " AND ".join(f"({c}) > {eps!r}" for c in corners)
    all_neg = " AND ".join(f"({c}) < -{eps!r}" for c in corners)
    reg = reg.filter(F.expr(f"NOT (({all_pos}) OR ({all_neg}))"))
    a = reg.select(
        "_cix", "_ciy",
        F.col("line_id").alias("la"), F.col("seg").alias("sa"),
        F.col("ax").alias("aax"), F.col("ay").alias("aay"),
        F.col("bx").alias("abx"), F.col("by").alias("aby"),
    )
    b = reg.select(
        "_cix", "_ciy",
        F.col("line_id").alias("lb"), F.col("seg").alias("sb"),
        F.col("ax").alias("bax"), F.col("ay").alias("bay"),
        F.col("bx").alias("bbx"), F.col("by").alias("bby"),
    )
    cond, ix, iy = seg_intersect_sql(
        "aax", "aay", "abx", "aby", "bax", "bay", "bbx", "bby"
    )
    return (
        a.join(b, ["_cix", "_ciy"])
        .filter(F.col("la") < F.col("lb"))
        .filter(F.expr(cond))
        .select(
            F.col("la").alias("line_a"),
            F.col("sa").alias("seg_a"),
            F.col("lb").alias("line_b"),
            F.col("sb").alias("seg_b"),
            F.expr(ix).alias("ix"),
            F.expr(iy).alias("iy"),
        )
        .distinct()
    )


# --- trajectory map matching (snap pings to roads, collapse runs) ------------
#
# The movement-analytics composition the reference's nearest flagship
# points at: each user's click pings snap to their nearest road
# (exact, cell-indexed, ring fallback), then consecutive same-road
# pings collapse into RUNS — per (user, run): the road, ping count and
# time span.  Scale shape: the snap is the standard density-bounded
# cell join; the run collapse is one shuffle keyed by user (uniform)
# with an in-partition sort — trajectory_cell_transitions' OD-matrix
# shape, which holds at 10^12 events.  The run tail is ONE SQL text
# run by both engines over their own `best` tables.

_MM_RUN_TAIL = """
SELECT user_id, run_id, road_id,
       COUNT(*) AS n_pings,
       MIN(ts) AS t_start,
       MAX(ts) AS t_end
FROM (
  SELECT user_id, ts, road_id,
         CAST(SUM(chg) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS run_id
  FROM (
    SELECT user_id, event_id, ts, road_id,
           CASE WHEN LAG(road_id) OVER (
                  PARTITION BY user_id ORDER BY ts, event_id
                ) IS DISTINCT FROM road_id THEN 1 ELSE 0 END AS chg
    FROM best
  ) c
) r
GROUP BY user_id, run_id, road_id
"""

_MM_ORACLE = f"""
WITH segs AS ({_X_SEGS_SQL}),
p AS (
  SELECT user_id, event_id, ts,
         {sx.x_expr('event_id')} AS x, {sx.y_expr('event_id')} AS y
  FROM events WHERE event_type = 'click'
),
rk AS (
  SELECT user_id, event_id, ts, line_id,
         ROW_NUMBER() OVER (
           PARTITION BY event_id
           ORDER BY {seg_dist_sql('x', 'y', 'ax', 'ay', 'bx', 'by')}, line_id
         ) AS rn
  FROM p CROSS JOIN segs
),
best AS (
  SELECT user_id, event_id, ts, line_id AS road_id FROM rk WHERE rn = 1
)
{_MM_RUN_TAIL}
"""


@register("map_match_runs", _MM_ORACLE)
def map_match_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-matched trajectory runs over the 800-road layer: snap =
    nearest_line_join (min(struct(dist, line_id)) — the same total
    order as the oracle's ROW_NUMBER), runs = the shared window tail."""
    ev = load(spark, sf_dir, "events")
    pts = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts",
        F.expr(sx.x_expr("event_id")).alias("x"),
        F.expr(sx.y_expr("event_id")).alias("y"),
    )
    g = make_regular_grid(16, 12)
    nn = nearest_line_join(
        pts.select("event_id", "x", "y"),
        road_segments(spark, _X_N_ROADS),
        g,
        "event_id",
        _RADIUS,
    )
    best = pts.join(nn, "event_id").select(
        "user_id", "event_id", "ts", F.col("nn_id").alias("road_id")
    )
    best.createOrReplaceTempView("best")
    return spark.sql(_MM_RUN_TAIL)


# --- spatial ANTI-join: documents farther than D from every road -------------
#
# The complement of docs_near_roads, and the harder correctness claim:
# absence.  A segment within D of a point necessarily registers in the
# point's core cell (the pad-D registration invariant nearest/range
# joins already rely on), so "no in-radius candidate in my cell" IS
# "no road within D" — the anti-join needs only the same density-
# bounded cell join, never a global pass.  left_anti keeps the plan
# shuffle-light at crawl scale (no row multiplication, no distinct).

_FAR_ORACLE = f"""
WITH segs AS ({_SEGS_SQL}),
d AS (SELECT doc_id, {_DX} AS x, {_DY} AS y FROM documents)
SELECT CAST(FLOOR(x / {_Z.TRACT_W * 4!r}) AS BIGINT) AS band_x,
       COUNT(*) AS n_far,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM d
WHERE NOT EXISTS (
  SELECT 1 FROM segs
  WHERE {seg_dist_sql('x', 'y', 'ax', 'ay', 'bx2', 'by2')} <= {_RANGE_D!r}
)
GROUP BY 1
"""


@register("docs_far_from_roads", _FAR_ORACLE)
def docs_far_from_roads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents with NO road within 30 km, rolled up per x-band: the
    candidate set from the padded cell join, an exact distance filter,
    then LEFT ANTI back to the documents — the oracle's NOT EXISTS."""
    from chopin_spark.grid import _index_col
    from chopin_spark.roads import _seg_cells

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_DX).alias("x"), F.expr(_DY).alias("y")
    )
    g = make_regular_grid(16, 12)
    pts = docs.withColumn(
        "_cix", _index_col(F.col("x"), g.xbreaks)
    ).withColumn("_ciy", _index_col(F.col("y"), g.ybreaks))
    segc = _seg_cells(road_segments(spark), g, _RANGE_D)
    near = (
        pts.join(segc, ["_cix", "_ciy"])
        .filter(
            F.expr(seg_dist_sql("x", "y", "_sax", "_say", "_sbx", "_sby"))
            <= _RANGE_D
        )
        .select("doc_id")
    )
    far = docs.join(near, "doc_id", "left_anti")
    return far.groupBy(
        F.floor(F.col("x") / (_Z.TRACT_W * 4)).alias("band_x")
    ).agg(
        F.count(F.lit(1)).alias("n_far"),
        F.min("doc_id").alias("first_doc"),
    )


# --- linear referencing: chainage of the nearest point on the road -----------
#
# The M-value workflow (terra/sf ST_LineLocatePoint analog): for every
# document, WHERE along its nearest road the closest point falls —
# cumulative length of the preceding segments plus t·len of the hit
# segment, t being the clamped projection parameter (the exact same
# text, hence the same IEEE doubles, as inside seg_dist_sql).  Engine:
# the verified cell-join + ring-fallback nearest (road granularity),
# then a ×_N_SEGS re-join against ONLY that road's segments for the
# argmin segment — per-road segment fan-out is layer metadata, never
# all-segments.  Cumulative offsets come from ONE window pass over the
# segment layer (layer-sized, not fact-sized).  Oracle: full
# doc × segment brute force, ranked (dist, line_id, seg) — equivalent
# to the engine's line-then-segment argmin, as line-level ties also
# break on line_id.

from chopin_spark.roads import seg_len_sql, seg_t_sql  # noqa: E402

_CH_T = seg_t_sql("x", "y", "ax", "ay", "bx2", "by2")
_CH_LEN = seg_len_sql("ax", "ay", "bx2", "by2")
_CH_CUM = (
    "COALESCE(SUM(len) OVER (PARTITION BY line_id ORDER BY seg"
    " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0)"
)

_CHAIN_ORACLE = f"""
WITH segs AS (
  SELECT r.rid AS line_id, k.k AS seg,
         {_vx('r.rid', 'k.k')} AS ax, {_vy('r.rid', 'k.k')} AS ay,
         {_vx('r.rid', '(k.k + 1)')} AS bx2, {_vy('r.rid', '(k.k + 1)')} AS by2
  FROM generate_series(1, {_N_ROADS}) r(rid)
  CROSS JOIN generate_series(0, {_N_SEGS - 1}) k(k)
),
sl AS (SELECT *, {_CH_LEN} AS len FROM segs),
sc AS (SELECT *, {_CH_CUM} AS cum FROM sl),
d AS (SELECT doc_id, {_DX} AS x, {_DY} AS y FROM documents),
pairs AS (
  SELECT doc_id, line_id, seg, cum, len,
         {seg_dist_sql('x', 'y', 'ax', 'ay', 'bx2', 'by2')} AS dist,
         {_CH_T} AS t
  FROM d CROSS JOIN sc
),
rk AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY dist, line_id, seg) AS rn
  FROM pairs
)
SELECT doc_id, line_id AS road_id, CAST(seg AS BIGINT) AS seg,
       ROUND(cum + t * len, 4) AS chainage_m,
       ROUND(dist, 4) AS dist_m
FROM rk WHERE rn = 1
"""


@register("nearest_road_chainage", _CHAIN_ORACLE)
def nearest_road_chainage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chainage (distance along the polyline) of each document's
    nearest point on its nearest road — cell-join nearest at road
    granularity, then an argmin re-join against that road's own
    segments only."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_DX).alias("x"), F.expr(_DY).alias("y")
    )
    g = make_regular_grid(16, 12)
    segs = road_segments(spark).selectExpr(
        "line_id", "seg", "ax", "ay", "bx AS bx2", "by AS by2"
    ).withColumn("len", F.expr(_CH_LEN)).withColumn("cum", F.expr(_CH_CUM))
    nr = nearest_line_join(
        docs, road_segments(spark), g, "doc_id", _RADIUS
    ).select("doc_id", F.col("nn_id").alias("road_id"))
    cand = (
        nr.join(docs, "doc_id")
        .join(F.broadcast(segs), F.col("road_id") == F.col("line_id"))
        .withColumn(
            "dist",
            F.expr(seg_dist_sql("x", "y", "ax", "ay", "bx2", "by2")),
        )
        .withColumn("t", F.expr(_CH_T))
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy("dist", "seg")
    )
    return (
        cand.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "road_id",
            F.col("seg").cast("long").alias("seg"),
            F.round(F.col("cum") + F.col("t") * F.col("len"), 4).alias(
                "chainage_m"
            ),
            F.round("dist", 4).alias("dist_m"),
        )
    )


# --- road bearing anisotropy (direction rose per zone) -------------------------
#
# Network anisotropy: per tract zone the length-weighted UNDIRECTED
# bearing histogram of road segments (grid-aligned street networks
# show two dominant sectors; organic ones are flat).  Direction
# classified by SIGN COMPARISONS into the 8 terrain octants and folded
# mod 4 (undirected) — no atan2 anywhere; lengths on the 1/1024 m
# lattice so the per-sector sums are associative integers.

_ANI_SPARK_SEGS = f"""
  SELECT rid AS line_id,
         {_vx('rid', 'k')} AS ax, {_vy('rid', 'k')} AS ay,
         {_vx('rid', '(k + 1)')} AS bx2, {_vy('rid', '(k + 1)')} AS by2
  FROM (SELECT id AS rid FROM range(1, {_N_ROADS + 1}))
  CROSS JOIN (SELECT explode(sequence(0, {_N_SEGS - 1})) AS k)
"""


def _anisotropy_sql(segs_src: str) -> str:
    zone = (
        f"(CAST(FLOOR(((ay + by2) / 2) / {_Z.TRACT_H!r}) AS BIGINT)"
        f" * {_Z.TRACT_NX}"
        f" + CAST(FLOOR(((ax + bx2) / 2) / {_Z.TRACT_W!r}) AS BIGINT))"
    )
    return f"""
WITH segs AS ({segs_src}),
v AS (
  SELECT {zone} AS zone_num,
         (bx2 - ax) AS gx, (by2 - ay) AS gy,
         CAST(FLOOR(SQRT((bx2 - ax) * (bx2 - ax)
                         + (by2 - ay) * (by2 - ay)) * 1024 + 0.5)
              AS BIGINT) AS len_mm
  FROM segs
),
c AS (
  SELECT zone_num, len_mm, ABS(gx) AS axx, ABS(gy) AS ayy, gx, gy
  FROM v
),
s AS (
  SELECT zone_num, len_mm,
         (CASE WHEN axx >= ayy AND gx > 0 AND gy >= 0 THEN 0
               WHEN axx <  ayy AND gy > 0 AND gx >= 0 THEN 1
               WHEN axx <  ayy AND gy > 0 AND gx <  0 THEN 2
               WHEN axx >= ayy AND gx < 0 AND gy >= 0 THEN 3
               WHEN axx >= ayy AND gx < 0 AND gy <  0 THEN 4
               WHEN axx <  ayy AND gy < 0 AND gx <= 0 THEN 5
               WHEN axx <  ayy AND gy < 0 AND gx >  0 THEN 6
               ELSE 7 END) % 4 AS sector
  FROM c
)
SELECT zone_num, CAST(sector AS BIGINT) AS sector,
       CAST(COUNT(*) AS BIGINT) AS n_segs,
       CAST(SUM(len_mm) AS BIGINT) AS len_mm
FROM s
GROUP BY 1, 2
"""


@register("road_bearing_anisotropy", _anisotropy_sql(_SEGS_SQL))
def road_bearing_anisotropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted undirected bearing rose (4 sectors) per tract
    zone — sign-comparison octants folded mod 4, integer-lattice
    lengths, one segment-table agg."""
    return spark.sql(_anisotropy_sql(_ANI_SPARK_SEGS))


# --- linear referencing: locate events by route measure ------------------------
#
# The LRS "dynamic segmentation" verb (ArcGIS locate-features-along-
# routes / PostGIS ST_LineInterpolatePoint) — the inverse of
# nearest_road_chainage's point→measure projection: given (route,
# measure), interpolate the point.  Per route: prefix-sum of segment
# lengths (one window per route partition, no global sort), then each
# event range-joins into its containing segment (equi on route + lo ≤
# m < hi residual) and interpolates linearly.
#
# Determinism: segment lengths are SQRTs of exact-int squared lengths
# and the prefix sum runs in window frame order — identical sequential
# accumulation in both engines; event measures are integer-derived
# fractions of the route total; interpolation is a fixed double tree;
# outputs ROUND(·,4).  Scale: everything partitions by route — the
# classic transport-agency workload shape (10⁷ routes × telemetry).

_LRS_EV_K = 5

_LRS_BODY = """
cum AS (
  SELECT line_id, seg, ax, ay, bx, by,
         SQRT((bx - ax) * (bx - ax) + (by - ay) * (by - ay)) AS slen,
         COALESCE(SUM(SQRT((bx - ax) * (bx - ax) + (by - ay) * (by - ay)))
           OVER (PARTITION BY line_id ORDER BY seg
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0.0) AS lo
  FROM segs
),
tot AS (SELECT line_id, MAX(lo + slen) AS tlen FROM cum GROUP BY line_id),
ev AS (
  SELECT t.line_id, ks.k AS ev_id,
         CAST((t.line_id * 7 + ks.k * 13) % 97 AS DOUBLE) / 97.0 * t.tlen
           AS m
  FROM tot t CROSS JOIN ks
),
loc AS (
  SELECT e.line_id, e.ev_id, c.seg, e.m,
         c.ax + (e.m - c.lo) / c.slen * (c.bx - c.ax) AS px,
         c.ay + (e.m - c.lo) / c.slen * (c.by - c.ay) AS py
  FROM ev e JOIN cum c
    ON c.line_id = e.line_id AND e.m >= c.lo AND e.m < c.lo + c.slen
)
SELECT line_id, ev_id, seg,
       ROUND(m, 4) AS measure,
       ROUND(px, 4) AS px, ROUND(py, 4) AS py
FROM loc
"""

_LRS_KS_DUCK = (
    f"ks AS (SELECT CAST(UNNEST(generate_series(0, {_LRS_EV_K - 1}))"
    " AS BIGINT) AS k)"
)
_LRS_KS_SPARK = (
    f"ks AS (SELECT CAST(x AS BIGINT) AS k"
    f" FROM (SELECT explode(sequence(0, {_LRS_EV_K - 1})) AS x))"
)

_LRS_ORACLE = (
    f"WITH segs AS ({_X_SEGS_SQL}),\n{_LRS_KS_DUCK},\n{_LRS_BODY.strip()}"
)


@register("route_locate_by_measure", _LRS_ORACLE)
def route_locate_by_measure(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear referencing over the 800-road layer: 5 integer-derived
    measures per route located into their containing segments and
    interpolated; one route-partitioned prefix-sum window plus an
    equi+range join."""
    road_segments(spark, _X_N_ROADS).createOrReplaceTempView("lrs_segs")
    return spark.sql(
        f"WITH segs AS (SELECT * FROM lrs_segs),\n{_LRS_KS_SPARK},\n"
        + _LRS_BODY.strip()
    )
