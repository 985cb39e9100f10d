"""Raster grid-alignment verbs: terra::resample (bilinear) and
terra::aggregate (block downsample), plus a terra::distance analog
(per-pixel distance to the nearest POI) driven through the cell-index
nearest machinery.

The resample/aggregate oracles regenerate the LCG raster from
generate_series and replay the SAME integer arithmetic (rational
bilinear weights over denominator 10, non-linear block max/min), so
every comparison is exact — no float tolerance anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark import sqlexpr as sx
from chopin_spark.grid import make_regular_grid
from chopin_spark.queries import register
from chopin_spark.queries.zonal import _tiles
from chopin_spark.raster import (
    NPX, NPY, PH, PW, RNX, RNY, TILE, TNX, V_MOD, V_MX, V_MY, V_SEED,
    aggregate_blocks_tiles, pixel_value_sql, resample_bilinear_tiles,
)
from chopin_spark.tables import load
from chopin_spark.vector import nearest_join

# --- terra::resample, bilinear ------------------------------------------------

_V00 = pixel_value_sql("i0", "j0", 0)
_V10 = pixel_value_sql("i0 + 1", "j0", 0)
_V01 = pixel_value_sql("i0", "j0 + 1", 0)
_V11 = pixel_value_sql("i0 + 1", "j0 + 1", 0)

_RESAMPLE_ORACLE = f"""
WITH tgt AS (
  SELECT it, jt,
         (16 * it + 3) // 10 AS i0, (16 * it + 3) % 10 AS fx,
         (16 * jt + 3) // 10 AS j0, (16 * jt + 3) % 10 AS fy
  FROM generate_series(0, {RNX - 1}) s(it),
       generate_series(0, {RNY - 1}) t(jt)
),
num AS (
  SELECT (j0 // {TILE}) * {TNX} + (i0 // {TILE}) AS tile_id,
         ({_V00} * (10 - fx) * (10 - fy)
          + {_V10} * fx * (10 - fy)
          + {_V01} * (10 - fx) * fy
          + {_V11} * fx * fy) AS num,
         (it * 31 + jt * 17) % 97 AS wt
  FROM tgt
)
SELECT 'r0' AS raster_id, tile_id,
       COUNT(*) AS n_tgt,
       CAST(SUM(num) AS BIGINT) AS num_sum,
       CAST(SUM(num * wt) AS BIGINT) AS num_chk
FROM num
GROUP BY 1, 2
"""


@register("raster_resample_bilinear", _RESAMPLE_ORACLE)
def raster_resample_bilinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bilinear resample of the 1024×768 raster onto a 640×480 grid
    (terra::resample analog — the grid-alignment verb chopin's
    extract_at pipelines assume terra already ran,
    /root/reference/R/processing.R:148-228).  Each target pixel is
    owned by the tile of its floor source pixel; the +1 neighbors come
    from the 1-px strip halo exchange (shuffle = tile surface).  The
    rational target grid (source coord = (16t+3)/10) makes the
    bilinear numerators exact integers over denominator 100."""
    return resample_bilinear_tiles(_tiles(spark)).select(
        "raster_id", "tile_id", "n_tgt", "num_sum", "num_chk"
    )


# --- terra::aggregate, fact=4, fun=max/min -----------------------------------

_FB = TILE // 4  # blocks per tile edge

_AGGBLK_ORACLE = f"""
WITH px AS (
  SELECT i, j, {pixel_value_sql('i', 'j', 0)} AS val
  FROM generate_series(0, {NPX - 1}) s(i),
       generate_series(0, {NPY - 1}) t(j)
),
blk AS (
  SELECT i // 4 AS bi, j // 4 AS bj,
         MAX(val) AS bmax, MIN(val) AS bmin
  FROM px GROUP BY 1, 2
)
SELECT 'r0' AS raster_id,
       (bj // {_FB}) * {TNX} + (bi // {_FB}) AS tile_id,
       COUNT(*) AS n_blocks,
       CAST(SUM(bmax) AS BIGINT) AS sum_bmax,
       CAST(SUM(bmin) AS BIGINT) AS sum_bmin,
       CAST(SUM((bmax - bmin) * ((bi * 13 + bj * 7) % 31)) AS BIGINT) AS chk
FROM blk
GROUP BY 1, 2
"""


@register("raster_aggregate_blocks", _AGGBLK_ORACLE)
def raster_aggregate_blocks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """terra::aggregate(fact=4, fun=max/min) analog: 4×4 block
    downsample as a ZERO-SHUFFLE per-tile map (factor | TILE keeps
    every block interior to one tile — the narrow-transformation
    contrast to the halo-exchange stencils).  Non-linear block stats
    verify the blocking itself; a block SUM would telescope into the
    tile sum and prove nothing."""
    return aggregate_blocks_tiles(_tiles(spark), factor=4).select(
        "raster_id", "tile_id", "n_blocks", "sum_bmax", "sum_bmin", "chk"
    )


# --- terra::distance analog: sampled pixel grid → nearest POI ----------------

# every 8th pixel in each axis → 128×96 = 12,288 sample points; shared
# SQL text for the sample-center coordinates keeps both engines on the
# same doubles.
_SSTEP = 8
_SNX, _SNY = NPX // _SSTEP, NPY // _SSTEP
_SX = f"((i * {_SSTEP} + 4 + 0.5) * {PW!r})"
_SY = f"((j * {_SSTEP} + 4 + 0.5) * {PH!r})"
_PX = sx.x_expr("p_partkey")
_PY = sx.y_expr("p_partkey")
# stage-1 radius is a pure performance knob (misses resolve exactly via
# the fallback): 20 km on a 24×18 grid (pad < 33 km cell ⇒ 3×3 stencil)
# cuts candidate pairs ~4× vs 40 km on the coarse 16×12 grid
_DRADIUS = 20_000.0

_DIST_ORACLE = f"""
WITH px AS (
  SELECT (j * {_SNX} + i) AS pix_id, {_SX} AS x, {_SY} AS y
  FROM generate_series(0, {_SNX - 1}) s(i),
       generate_series(0, {_SNY - 1}) t(j)
),
p AS (
  SELECT p_partkey AS pid, {_PX} AS px, {_PY} AS py FROM part
),
nn AS (
  SELECT pix_id,
         MIN(SQRT((x - px) * (x - px) + (y - py) * (y - py))) AS d
  FROM px CROSS JOIN p
  GROUP BY 1
)
SELECT CAST(pix_id % 64 AS BIGINT) AS bucket,
       COUNT(*) AS n_px,
       CAST(SUM(CAST(FLOOR(d * 1000 + 0.5) AS BIGINT)) AS BIGINT) AS sum_dist_mm,
       ROUND(MAX(d), 4) AS max_dist
FROM nn
GROUP BY 1
"""


@register("raster_distance_to_poi", _DIST_ORACLE)
def raster_distance_to_poi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """terra::distance analog: per-pixel distance to the nearest POI,
    evaluated on a coarse sample of the pixel grid (every 8th center)
    through the SAME cell-index nearest machinery as nearest_poi — at
    100 TB the pixel side is a generated narrow table (spark.range, no
    Python), the join is the padded-cell equi-join, and misses resolve
    by ring expansion, never a context broadcast."""
    px = (
        spark.range(_SNX * _SNY)
        .selectExpr(
            f"CAST(id % {_SNX} AS BIGINT) AS i",
            f"CAST(id DIV {_SNX} AS BIGINT) AS j",
        )
        .selectExpr(
            f"(j * {_SNX} + i) AS pix_id",
            f"{_SX} AS x",
            f"{_SY} AS y",
        )
    )
    poi = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pid"),
        F.expr(_PX).alias("x"),
        F.expr(_PY).alias("y"),
    )
    g = make_regular_grid(24, 18, pad=_DRADIUS)
    nn = nearest_join(
        px, poi, g, "pix_id", "pid", _DRADIUS, small_context=True
    )
    return (
        nn.groupBy((F.col("pix_id") % 64).cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_px"),
            F.sum(
                F.floor(F.col("nn_dist") * 1000 + 0.5).cast("long")
            ).cast("long").alias("sum_dist_mm"),
            F.round(F.max("nn_dist"), 4).alias("max_dist"),
        )
    )


# --- terra::crosstab: contingency table of two categorical rasters ----------
#
# Landcover-change analysis staple (terra::crosstab(c(r0, r1))): count
# pixels per (class-of-raster-0, class-of-raster-1) pair after
# quantizing each DN into 8 classes.  The Spark plan joins the two
# STORED tile tables on tile_id (co-partitioned by construction — at
# production scale a bucketed storage join, never a pixel shuffle),
# fuses the class pair per pixel inside one JVM zip_with, and explodes
# only into the partial hash aggregate: pixel rows never cross the
# wire, each task pre-reduces to ≤ 64 keys, and the final exchange
# carries 64 rows × tasks.  The oracle regenerates both rasters from
# generate_series and replays the identical integer class arithmetic —
# exact, no float anywhere.

_CLS_W = (V_MOD // 8) + 1  # 125001 → classes 0..7 for v < V_MOD

_XTAB_ORACLE = f"""
WITH px AS (
  SELECT i.i, j.j
  FROM generate_series(0, {NPX - 1}) i(i)
  CROSS JOIN generate_series(0, {NPY - 1}) j(j)
),
v AS (
  SELECT ((i * {V_MX} + j * {V_MY}) % {V_MOD}) // {_CLS_W} AS class_a,
         ((i * {V_MX} + j * {V_MY} + {V_SEED}) % {V_MOD}) // {_CLS_W}
           AS class_b
  FROM px
)
SELECT CAST(class_a AS BIGINT) AS class_a,
       CAST(class_b AS BIGINT) AS class_b,
       COUNT(*) AS n_pixels
FROM v GROUP BY 1, 2
"""


@register("raster_crosstab", _XTAB_ORACLE)
def raster_crosstab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pixel contingency table of raster r0 vs r1 through the stored
    tile tables: tile_id equi-join, one zip_with fusing both class
    codes into a single small-integer key, explode straight into the
    partial aggregation.  ``V_SEED`` is r1's DN offset (raster.py:52),
    so the oracle's closed form is the same surface the tiles store."""
    two = _tiles(spark, n_rasters=2)
    t0 = two.filter("rid = 0").select("tile_id", F.col("values").alias("v0"))
    t1 = two.filter("rid = 1").select("tile_id", F.col("values").alias("v1"))
    fused = t0.join(t1, "tile_id").select(
        F.explode(
            F.expr(
                f"zip_with(v0, v1, (a, b) ->"
                f" (a DIV {_CLS_W}) * 8 + (b DIV {_CLS_W}))"
            )
        ).alias("ck")
    )
    return (
        fused.groupBy("ck")
        .agg(F.count(F.lit(1)).alias("n_pixels"))
        .select(
            F.expr("ck DIV 8").cast("bigint").alias("class_a"),
            (F.col("ck") % 8).cast("bigint").alias("class_b"),
            "n_pixels",
        )
    )


# --- terra::classify: reclassify DN values through a breaks table -------------
#
# The reclass matrix (rcl) is metadata, not data: terra::classify takes
# it as an argument, and at cluster scale the right plan is to compile
# the (tiny) breaks table into the pixel expression itself — a CASE
# ladder inside whole-stage codegen — rather than join 10^10 pixel rows
# against a 7-row range table (a broadcast nested-loop that evaluates
# the same 7 comparisons with join machinery overhead on top).  Both
# engines evaluate the identical ladder text, and the per-class sums
# are exact int64 over integer DN values.

_RECLASS_BREAKS = (  # (upper_bound_exclusive, class_code); last catches rest
    (50_000, 10), (150_000, 20), (300_000, 30), (500_000, 40),
    (700_000, 50), (900_000, 60), (V_MOD, 70),
)


def _reclass_case(v: str) -> str:
    arms = " ".join(
        f"WHEN ({v}) < {ub} THEN {code}"
        for ub, code in _RECLASS_BREAKS[:-1]
    )
    return f"(CASE {arms} ELSE {_RECLASS_BREAKS[-1][1]} END)"


_RECLASS_ORACLE = f"""
WITH px AS (
  SELECT i.i, j.j
  FROM generate_series(0, {NPX - 1}) i(i)
  CROSS JOIN generate_series(0, {NPY - 1}) j(j)
),
v AS (
  SELECT {pixel_value_sql('i', 'j', 0)} AS dn FROM px
)
SELECT CAST({_reclass_case('dn')} AS BIGINT) AS class_code,
       COUNT(*) AS n_pixels,
       CAST(SUM(dn) AS BIGINT) AS dn_sum,
       CAST(MIN(dn) AS BIGINT) AS dn_min,
       CAST(MAX(dn) AS BIGINT) AS dn_max
FROM v GROUP BY 1
"""


@register("raster_reclass_table", _RECLASS_ORACLE)
def raster_reclass_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """terra::classify analog: DN values reclassified through a 7-band
    breaks table compiled to a codegen CASE ladder over the stored
    tiles; per-class pixel count and exact DN sum/min/max.  Pixel rows
    never shuffle — explode feeds the partial hash-agg (≤ 7 keys per
    task), and the final exchange carries 7 rows × tasks."""
    tiles = _tiles(spark)
    px = tiles.select(F.explode("values").alias("dn"))
    return (
        px.groupBy(
            F.expr(_reclass_case("dn")).cast("bigint").alias("class_code")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pixels"),
            F.sum("dn").cast("bigint").alias("dn_sum"),
            F.min("dn").cast("bigint").alias("dn_min"),
            F.max("dn").cast("bigint").alias("dn_max"),
        )
    )


# --- ArcGIS ZonalGeometry analog: shape statistics of rasterized zones --------
#
# Per-zone geometry measured IN PIXEL SPACE (the zonal twin of
# rasterize): pixel count, centroid, bounding box and bbox fill ratio
# of each tract-octagon zone.  Spark drives from the stored tile table
# (posexplode over tile-parallel partitions — map-only until the
# 256-row zone agg); the oracle regenerates pixels from generate_series
# and replays the identical half-plane membership.  All sums are int64
# over pixel indices; centroids divide exact sums once at the end.

from chopin_spark.queries.zonal import _in_oct_xy  # noqa: E402
from chopin_spark import zones as _ZG  # noqa: E402

_ZG_CX = f"((gi + 0.5) * {PW!r})"
_ZG_CY = f"((gj + 0.5) * {PH!r})"

_ZG_BODY = f"""
SELECT CAST(FLOOR({_ZG_CY} / {_ZG.TRACT_H!r}) AS BIGINT) * 16
         + CAST(FLOOR({_ZG_CX} / {_ZG.TRACT_W!r}) AS BIGINT) AS zone_id,
       COUNT(*) AS n_px,
       ROUND((CAST(SUM(gi) AS DOUBLE) / COUNT(*) + 0.5) * {PW!r}, 4)
         AS centroid_x,
       ROUND((CAST(SUM(gj) AS DOUBLE) / COUNT(*) + 0.5) * {PH!r}, 4)
         AS centroid_y,
       CAST(MIN(gi) AS BIGINT) AS bb_i0, CAST(MAX(gi) AS BIGINT) AS bb_i1,
       CAST(MIN(gj) AS BIGINT) AS bb_j0, CAST(MAX(gj) AS BIGINT) AS bb_j1,
       ROUND(COUNT(*) / (CAST(MAX(gi) - MIN(gi) + 1 AS DOUBLE)
                         * (MAX(gj) - MIN(gj) + 1)), 6) AS bbox_fill
FROM burned
GROUP BY 1
"""

_ZG_ORACLE = f"""
WITH px AS (
  SELECT i AS gi, j AS gj
  FROM generate_series(0, {NPX - 1}) s(i),
       generate_series(0, {NPY - 1}) t(j)
),
burned AS (
  SELECT gi, gj FROM px WHERE {_in_oct_xy(_ZG_CX, _ZG_CY)}
)
{_ZG_BODY}
"""


@register("raster_zonal_geometry", _ZG_ORACLE)
def raster_zonal_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal geometry of the rasterized octagon zones: per-zone pixel
    count, pixel-space centroid, bbox and bbox fill ratio, driven from
    the stored tiles (posexplode; j is the slow axis of the tile
    payload) — tile-parallel map work into a 256-row hash-agg."""
    tiles = _tiles(spark)
    px = tiles.select(
        "tile_row", "tile_col",
        F.posexplode("values").alias("p", "val"),
    ).select(
        (F.col("tile_col") * TILE + F.col("p") % TILE).alias("gi"),
        (F.col("tile_row") * TILE + F.expr(f"p DIV {TILE}")).alias("gj"),
    )
    burned = px.filter(F.expr(_in_oct_xy(_ZG_CX, _ZG_CY)))
    burned.createOrReplaceTempView("burned")
    return tiles.sparkSession.sql(_ZG_BODY)



# --- Cohen's kappa map-agreement (remote-sensing accuracy assessment) ----------
#
# The standard chance-corrected agreement statistic over the SAME
# two-raster contingency table as raster_crosstab (Congalton 1991's
# accuracy-assessment workflow): kappa = (N·Σdiag − Σ rowᵢ·colᵢ) /
# (N² − Σ rowᵢ·colᵢ).  Every moment is an exact int64 fold of the
# crosstab (N ~ 10^5 pixels → N² ~ 10^11, comfortable), so kappa is
# one correctly-rounded division.  The engine side reuses the tile
# crosstab plan (tile equi-join + fused explode); the oracle folds the
# same closed-form surface.

_KAPPA_TAIL = """
SELECT m.n AS n_pixels,
       m.d AS observed_agree,
       ROUND(CAST(m.d AS DOUBLE) / m.n, 4) AS po,
       ROUND(CAST(pe.s AS DOUBLE) / (CAST(m.n AS DOUBLE) * m.n), 4) AS pe,
       ROUND((CAST(m.n AS DOUBLE) * m.d - pe.s)
             / (CAST(m.n AS DOUBLE) * m.n - pe.s), 4) AS kappa
FROM (
  SELECT CAST(SUM(CASE WHEN class_a = class_b THEN n_pixels ELSE 0 END)
              AS BIGINT) AS d,
         CAST(SUM(n_pixels) AS BIGINT) AS n
  FROM xt
) m
CROSS JOIN (
  SELECT CAST(SUM(r.r * c.cc) AS BIGINT) AS s
  FROM (SELECT class_a AS c, CAST(SUM(n_pixels) AS BIGINT) AS r
        FROM xt GROUP BY 1) r
  JOIN (SELECT class_b AS c, CAST(SUM(n_pixels) AS BIGINT) AS cc
        FROM xt GROUP BY 1) c ON c.c = r.c
) pe
"""

_KAPPA_ORACLE = f"WITH xt AS ({_XTAB_ORACLE}) {_KAPPA_TAIL}"


@register("raster_change_kappa", _KAPPA_ORACLE)
def raster_change_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between the two stored rasters' class maps —
    exact int64 crosstab moments, one division; the engine folds the
    tile-join crosstab, the oracle the closed-form surface."""
    raster_crosstab(spark, sf_dir).createOrReplaceTempView("xt")
    return spark.sql(_KAPPA_TAIL)


# --- two-scale TPI landform classification (radius-2 halo) --------------------
#
# Weiss 2001 topographic position classes (GRASS r.tpi / gdaldem TPI)
# on the partitioned raster: TPI at 3×3 and 5×5, sign-classified at
# ±θ into the 9 (sgn_small, sgn_large) landform combos.  The 5×5
# window needs a radius-2 halo — this query is the driver check for
# raster.halo_joined_r, the radius-PARAMETERIZED generalization of the
# strip exchange (shuffle volume stays the halo surface, ≈2r/TILE of
# tile volume).  Classification is exact int64 (v·cnt − sum vs θ·cnt,
# no division) so class counts are engine-exact; the oracle recomputes
# every pixel's two windows closed-form from the value function — a
# mis-assembled radius-2 strip (corners are now r×r blocks) breaks it.

from chopin_spark.raster import TPI_THETA, tpi_landform_tiles  # noqa: E402

_TPI_NAMES = (
    "CASE class_id WHEN 0 THEN 'valley' WHEN 1 THEN 'lower_slope'"
    " WHEN 2 THEN 'incised_drain' WHEN 3 THEN 'flat_in_basin'"
    " WHEN 4 THEN 'plain' WHEN 5 THEN 'flat_on_crest'"
    " WHEN 6 THEN 'local_pit_on_ridge' WHEN 7 THEN 'upper_slope'"
    " ELSE 'ridge' END"
)


def _tpi_win(rad: int, what: str) -> str:
    terms = []
    for di in range(-rad, rad + 1):
        for dj in range(-rad, rad + 1):
            inb = (
                f"i + {di} BETWEEN 0 AND {NPX - 1}"
                f" AND j + {dj} BETWEEN 0 AND {NPY - 1}"
            )
            val = pixel_value_sql(f"i + {di}", f"j + {dj}", 0) \
                if what == "sum" else "1"
            terms.append(f"(CASE WHEN {inb} THEN {val} ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


_TPI_ORACLE = f"""
WITH px AS (
  SELECT g1.i, g2.j
  FROM generate_series(0, {NPX - 1}) AS g1(i),
       generate_series(0, {NPY - 1}) AS g2(j)
),
w AS (
  SELECT i, j,
         {pixel_value_sql('i', 'j', 0)} AS v,
         {_tpi_win(1, 'sum')} AS s3, {_tpi_win(1, 'cnt')} AS c3,
         {_tpi_win(2, 'sum')} AS s5, {_tpi_win(2, 'cnt')} AS c5,
         (CAST(FLOOR(j / {TILE}.0) AS BIGINT) * {NPX // TILE}
          + CAST(FLOOR(i / {TILE}.0) AS BIGINT)) AS tile_id
  FROM px
),
cls AS (
  SELECT tile_id,
         3 * ((CASE WHEN v * c3 - s3 > {TPI_THETA} * c3 THEN 1
                    WHEN v * c3 - s3 < -{TPI_THETA} * c3 THEN -1
                    ELSE 0 END) + 1)
         + ((CASE WHEN v * c5 - s5 > {TPI_THETA} * c5 THEN 1
                  WHEN v * c5 - s5 < -{TPI_THETA} * c5 THEN -1
                  ELSE 0 END) + 1) AS class_id
  FROM w
)
SELECT class_id, {_TPI_NAMES} AS landform,
       CAST(COUNT(*) AS BIGINT) AS n_px,
       CAST(COUNT(DISTINCT tile_id) AS BIGINT) AS n_tiles
FROM cls GROUP BY class_id ORDER BY class_id
"""


@register("raster_tpi_landforms", _TPI_ORACLE)
def raster_tpi_landforms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-scale TPI landform census over the tiled raster via the
    radius-2 halo exchange; exact-int sign classification, per-class
    pixel and tile counts."""
    tiles = _tiles(spark, n_rasters=1)
    out = tpi_landform_tiles(tiles)
    return (
        out.groupBy("class_id")
        .agg(
            F.sum("n_px").alias("n_px"),
            F.countDistinct("tile_id").cast("long").alias("n_tiles"),
        )
        .selectExpr(
            "class_id", f"{_TPI_NAMES} AS landform", "n_px", "n_tiles"
        )
        .orderBy("class_id")
    )
