"""Zonal-statistics queries (SURVEY.md §2.3 C1–C3 + §2.2 R3).

Raster pixels are integer LCG functions of (pixel index, raster id), so
the DuckDB oracles regenerate the raster from `generate_series` and the
comparison is exact: all sums are bigint (associative — immune to
partition ordering), kernel weights are quantized to integers, and the
only doubles are final divisions + ROUND.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark import sqlexpr as sx, zones as Z
from chopin_spark.kernels import kernel_sql, quantize_sql
from chopin_spark.queries import register
from chopin_spark.raster import (
    NPX, NPY, PH, PW, V_MOD, V_MX, V_MY, V_SEED,
    corrupt_raster_ids, extract_at, raster_tiles_df,
)
from chopin_spark.tables import load

# The tile table is a stored table in production (parquet/Iceberg);
# here it is synthesized, so write it to a local parquet cache ONCE per
# configuration and read it back — otherwise every action regenerates
# 6 MB/raster of tiles through a Python stage (measured: the dominant,
# high-variance cost), and .cache() blocks leak across the 53-query
# bench session.  The parquet read is a pure JVM columnar scan with
# tile_id min/max stats — exactly the production shape.
_TILES_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache", "tiles",
)
_TILES_MEMO: dict = {}


def _tiles(spark, n_rasters: int = 1, corrupt: tuple = ()):
    key = (spark.sparkContext.applicationId, n_rasters, corrupt)
    if key in _TILES_MEMO:
        return _TILES_MEMO[key]
    # the tag carries the raster-generation constants: a change to
    # V_MX/V_MY/V_SEED/V_MOD or the grid shape must MISS the cache
    # (stale tiles would silently disagree with the DuckDB oracles,
    # which regenerate values from the current constants)
    from chopin_spark.raster import TILE, V_SEED

    gen_sig = f"{NPX}x{NPY}t{TILE}v{V_MX}_{V_MY}_{V_SEED}_{V_MOD}"
    tag = (
        f"n{n_rasters}_c{'-'.join(map(str, corrupt)) or 'none'}_{gen_sig}"
    )
    path = os.path.join(_TILES_DIR, tag)
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        raster_tiles_df(
            spark, n_rasters=n_rasters, corrupt=corrupt
        ).write.mode("overwrite").parquet(path)
    # The tiny local files coalesce into 1-2 scan partitions under
    # maxPartitionBytes, which would serialize the downstream Arrow UDF;
    # repartition on tile_id restores parallelism AND pre-partitions the
    # extract_at shuffle-join key (on a cluster the stored tile table
    # would be bucketed by tile_id instead).
    df = spark.read.parquet(path).repartition(
        spark.sparkContext.defaultParallelism, "tile_id"
    )
    _TILES_MEMO[key] = df
    return df


# pixel-center coordinate expressions (shared SQL text)
_PCX = f"((i + 0.5) * {PW!r})"
_PCY = f"((j + 0.5) * {PH!r})"

_PX_GRID = (
    f"SELECT i, j FROM generate_series(0, {NPX - 1}) s(i), "
    f"generate_series(0, {NPY - 1}) t(j)"
)


# --- C1 extract_at over admin zones ---------------------------------------

_TRACTS_ORACLE = f"""
WITH px AS ({_PX_GRID})
SELECT 'r0' AS raster_id,
       {Z.zone_id_expr(_PCX, _PCY)} AS zone_id,
       ROUND(CAST(SUM((i * {V_MX} + j * {V_MY}) % {V_MOD}) AS DOUBLE)
             / COUNT(*), 4) AS mean_val,
       COUNT(*) AS n_pixels
FROM px
GROUP BY 1, 2
"""


@register("extract_at_tracts", _TRACTS_ORACLE)
def extract_at_tracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 extract_at, polygon branch
    (/root/reference/R/processing.R:148-228): zonal mean of raster r0
    over the 256 tracts. Tile⋈zone candidates via index arithmetic
    (broadcast, equi-join on tile_id); per-(tile,zone) integer partial
    sums in an Arrow UDF; final sum/sum — partial+final aggregation,
    the plan that holds at 100 TB."""
    tiles = _tiles(spark, n_rasters=1)
    rects = Z.zones_df(spark).select(
        "zone_id", "xmin", "ymin", "xmax", "ymax"
    )
    return extract_at(tiles, rects, rect_id="zone_id").select(
        "raster_id", "zone_id", "mean_val", "n_pixels"
    )


# --- C1 parameterized summary functions -------------------------------------

_TRACT_STATS_ORACLE = f"""
WITH px AS ({_PX_GRID})
SELECT 'r0' AS raster_id,
       {Z.zone_id_expr(_PCX, _PCY)} AS zone_id,
       CAST(SUM((i * {V_MX} + j * {V_MY}) % {V_MOD}) AS BIGINT) AS sum_val,
       MIN((i * {V_MX} + j * {V_MY}) % {V_MOD}) AS min_val,
       MAX((i * {V_MX} + j * {V_MY}) % {V_MOD}) AS max_val,
       COUNT(*) AS n_pixels
FROM px
GROUP BY 1, 2
"""


@register("extract_at_tracts_stats", _TRACT_STATS_ORACLE)
def extract_at_tracts_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 with injected summary functions (chopin's `func` parameter,
    /root/reference/R/processing.R:117): sum/min/max zonal statistics
    from the same partial-aggregation pass as the mean."""
    tiles = _tiles(spark, n_rasters=1)
    rects = Z.zones_df(spark).select(
        "zone_id", "xmin", "ymin", "xmax", "ymax"
    )
    return extract_at(
        tiles, rects, rect_id="zone_id", stats=("sum", "min", "max")
    ).select(
        "raster_id", "zone_id", "sum_val", "min_val", "max_val", "n_pixels"
    )


# --- C1 extract_at over point buffers --------------------------------------

_RADIUS = 20_000.0
_POIX = sx.x_expr("p_partkey")
_POIY = sx.y_expr("p_partkey")

_BUF_ORACLE = f"""
WITH poi AS (
  SELECT p_partkey, {_POIX} AS px, {_POIY} AS py FROM part
),
ii AS (
  SELECT p_partkey, px, py,
         UNNEST(generate_series(
           GREATEST(0, CAST(FLOOR((px - {_RADIUS!r}) / {PW!r}) AS BIGINT) - 1),
           LEAST({NPX - 1}, CAST(FLOOR((px + {_RADIUS!r}) / {PW!r}) AS BIGINT) + 1)
         )) AS i
  FROM poi
),
jj AS (
  SELECT p_partkey, px, py, i,
         UNNEST(generate_series(
           GREATEST(0, CAST(FLOOR((py - {_RADIUS!r}) / {PH!r}) AS BIGINT) - 1),
           LEAST({NPY - 1}, CAST(FLOOR((py + {_RADIUS!r}) / {PH!r}) AS BIGINT) + 1)
         )) AS j
  FROM ii
),
hit AS (
  SELECT p_partkey, ((i * {V_MX} + j * {V_MY}) % {V_MOD}) AS val
  FROM jj
  WHERE {_PCX} >= px - {_RADIUS!r} AND {_PCX} < px + {_RADIUS!r}
    AND {_PCY} >= py - {_RADIUS!r} AND {_PCY} < py + {_RADIUS!r}
)
SELECT CAST(p_partkey AS STRING) AS pid,
       ROUND(CAST(SUM(val) AS DOUBLE) / COUNT(*), 4) AS mean_val,
       COUNT(*) AS n_pixels
FROM hit GROUP BY 1
"""


@register("extract_at_buffers", _BUF_ORACLE)
def extract_at_buffers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 extract_at, point branch: points buffered by `radius`
    (square caps — chopin buffers circular via st_buffer(nQuadSegs=90),
    /root/reference/R/processing.R:184-192; the rectangular engine path
    keeps membership exact), then zonal mean per point."""
    poi = load(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("string").alias("pid"),
        (F.expr(_POIX) - _RADIUS).alias("xmin"),
        (F.expr(_POIY) - _RADIUS).alias("ymin"),
        (F.expr(_POIX) + _RADIUS).alias("xmax"),
        (F.expr(_POIY) + _RADIUS).alias("ymax"),
    )
    tiles = _tiles(spark, n_rasters=1)
    return extract_at(tiles, poi, rect_id="pid").select(
        "pid", "mean_val", "n_pixels"
    )


# --- C1 circular point buffers (chopin parity: st_buffer circles) -----------

_CIRC_ORACLE = f"""
WITH poi AS (
  SELECT p_partkey, {_POIX} AS px, {_POIY} AS py FROM part
),
ii AS (
  SELECT p_partkey, px, py,
         UNNEST(generate_series(
           GREATEST(0, CAST(FLOOR((px - {_RADIUS!r}) / {PW!r}) AS BIGINT) - 1),
           LEAST({NPX - 1}, CAST(FLOOR((px + {_RADIUS!r}) / {PW!r}) AS BIGINT) + 1)
         )) AS i
  FROM poi
),
jj AS (
  SELECT p_partkey, px, py, i,
         UNNEST(generate_series(
           GREATEST(0, CAST(FLOOR((py - {_RADIUS!r}) / {PH!r}) AS BIGINT) - 1),
           LEAST({NPY - 1}, CAST(FLOOR((py + {_RADIUS!r}) / {PH!r}) AS BIGINT) + 1)
         )) AS j
  FROM ii
),
hit AS (
  SELECT p_partkey, ((i * {V_MX} + j * {V_MY}) % {V_MOD}) AS val
  FROM jj
  WHERE ({_PCX} - px) * ({_PCX} - px) + ({_PCY} - py) * ({_PCY} - py)
        < {_RADIUS * _RADIUS!r}
)
SELECT CAST(p_partkey AS STRING) AS pid,
       ROUND(CAST(SUM(val) AS DOUBLE) / COUNT(*), 4) AS mean_val,
       COUNT(*) AS n_pixels
FROM hit GROUP BY 1
"""


@register("extract_at_circular", _CIRC_ORACLE)
def extract_at_circular(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 extract_at with CIRCULAR point buffers — chopin buffers points
    with st_buffer(nQuadSegs=90) ≈ circles
    (/root/reference/R/processing.R:184-192); membership = pixel-center
    distance < radius, the same-radius answer chopin produces (a square
    cap contains ~27% more pixels)."""
    poi = load(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("string").alias("pid"),
        (F.expr(_POIX) - _RADIUS).alias("xmin"),
        (F.expr(_POIY) - _RADIUS).alias("ymin"),
        (F.expr(_POIX) + _RADIUS).alias("xmax"),
        (F.expr(_POIY) + _RADIUS).alias("ymax"),
        F.expr(_POIX).alias("cx"),
        F.expr(_POIY).alias("cy"),
        F.lit(_RADIUS).alias("r"),
    )
    tiles = _tiles(spark, n_rasters=1)
    return extract_at(tiles, poi, rect_id="pid", shape="circle").select(
        "pid", "mean_val", "n_pixels"
    )


# --- C1 extract_at POINT sampling (radius = 0, the basic terra verb) ---------
#
# terra::extract(raster, points) with no buffer — look up the single
# pixel containing each point.  The engine path is the PRODUCTION one:
# point → (i, j) pixel index by pure arithmetic → tile_id equi-join
# into the stored tile table → element_at into the tile's value array;
# zero Python, and at 10^12 points the join shuffles only the narrow
# point keys (the tile dimension broadcasts).  The oracle recomputes
# the DN closed-form from (i, j) — a hash match proves the tile-id /
# row-major-offset arithmetic of the real lookup path.

_PTS_ORACLE = f"""
WITH poi AS (
  SELECT p_partkey, {_POIX} AS px, {_POIY} AS py FROM part
),
ij AS (
  SELECT p_partkey,
         CAST(FLOOR(px / {PW!r}) AS BIGINT) AS i,
         CAST(FLOOR(py / {PH!r}) AS BIGINT) AS j
  FROM poi
)
SELECT CAST(p_partkey AS STRING) AS pid, i, j,
       CAST(((i * {V_MX} + j * {V_MY}) % {V_MOD}) AS BIGINT) AS val
FROM ij
"""


@register("extract_at_points", _PTS_ORACLE)
def extract_at_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-sample the raster (terra::extract radius-0 branch) through
    the real storage path: index arithmetic → tile_id join → in-array
    offset.  ``values`` is [local_j, local_i] row-major (raster.py), so
    offset = (j % TILE)·TILE + (i % TILE), 1-based for element_at."""
    from chopin_spark.raster import TILE, TNX

    poi = load(spark, sf_dir, "part").selectExpr(
        "CAST(p_partkey AS STRING) AS pid",
        f"CAST(FLOOR({_POIX} / {PW!r}) AS BIGINT) AS i",
        f"CAST(FLOOR({_POIY} / {PH!r}) AS BIGINT) AS j",
    ).withColumn(
        "tile_id",
        (F.col("j") / TILE).cast("long") * TNX + (F.col("i") / TILE).cast("long"),
    )
    tiles = _tiles(spark, n_rasters=1).select("tile_id", "values")
    return poi.join(tiles, "tile_id").select(
        "pid",
        "i",
        "j",
        F.element_at(
            "values",
            ((F.col("j") % TILE) * TILE + F.col("i") % TILE + 1).cast("int"),
        ).alias("val"),
    )


# --- C1 coverage-fraction weighting (exactextractr parity) ------------------

_FXW = (
    f"(LEAST(xmax, {_PCX} + {PW / 2!r}) - GREATEST(xmin, {_PCX} - {PW / 2!r}))"
    f" / {PW!r}"
)
_FYW = (
    f"(LEAST(ymax, {_PCY} + {PH / 2!r}) - GREATEST(ymin, {_PCY} - {PH / 2!r}))"
    f" / {PH!r}"
)
_WQ_FRAC = (
    f"CAST(FLOOR(GREATEST(0.0, {_FXW}) * GREATEST(0.0, {_FYW})"
    f" * 1048576.0 + 0.5) AS BIGINT)"
)

_FRAC_ORACLE = f"""
WITH poi AS (
  SELECT p_partkey,
         {_POIX} - {_RADIUS!r} AS xmin, {_POIY} - {_RADIUS!r} AS ymin,
         {_POIX} + {_RADIUS!r} AS xmax, {_POIY} + {_RADIUS!r} AS ymax
  FROM part
),
ii AS (
  SELECT p_partkey, xmin, ymin, xmax, ymax,
         UNNEST(generate_series(
           GREATEST(0, CAST(FLOOR(xmin / {PW!r}) AS BIGINT) - 1),
           LEAST({NPX - 1}, CAST(FLOOR(xmax / {PW!r}) AS BIGINT) + 1)
         )) AS i
  FROM poi
),
jj AS (
  SELECT *, UNNEST(generate_series(
           GREATEST(0, CAST(FLOOR(ymin / {PH!r}) AS BIGINT) - 1),
           LEAST({NPY - 1}, CAST(FLOOR(ymax / {PH!r}) AS BIGINT) + 1)
         )) AS j
  FROM ii
),
hit AS (
  SELECT p_partkey, {_WQ_FRAC} AS wq,
         ((i * {V_MX} + j * {V_MY}) % {V_MOD}) AS val
  FROM jj
  WHERE {_WQ_FRAC} > 0
)
SELECT CAST(p_partkey AS STRING) AS pid,
       ROUND(CAST(SUM(wq * val) AS DOUBLE) / CAST(SUM(wq) AS DOUBLE), 4)
         AS mean_val,
       COUNT(*) AS n_pixels
FROM hit GROUP BY 1
"""


@register("extract_at_buffers_frac", _FRAC_ORACLE)
def extract_at_buffers_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 extract_at with exact coverage-fraction weighting — chopin
    weights each pixel by its covered fraction via exactextractr
    (/root/reference/R/processing.R:195-208). Buffers are NOT aligned
    to the pixel grid, so boundary pixels get fractional weight
    (quantized to 2^20 → integer-exact distributed sums)."""
    poi = load(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("string").alias("pid"),
        (F.expr(_POIX) - _RADIUS).alias("xmin"),
        (F.expr(_POIY) - _RADIUS).alias("ymin"),
        (F.expr(_POIX) + _RADIUS).alias("xmax"),
        (F.expr(_POIY) + _RADIUS).alias("ymax"),
    )
    tiles = _tiles(spark, n_rasters=1)
    return extract_at(
        tiles, poi, rect_id="pid", weighting="fraction"
    ).select("pid", "mean_val", "n_pixels")


# --- C1 general polygons (octagon zones through the ray-cast path) ----------

from chopin_spark.queries.polygons import _CX as _OCX, _CY as _OCY  # noqa: E402

_IN_OCT_PX = (
    f"((({_PCX}) - FLOOR(({_PCX}) / {Z.TRACT_W!r}) * {Z.TRACT_W!r}) * {_OCY!r}"
    f" + (({_PCY}) - FLOOR(({_PCY}) / {Z.TRACT_H!r}) * {Z.TRACT_H!r}) * {_OCX!r}"
    f" > {_OCX * _OCY!r}"
    f" AND ({Z.TRACT_W!r} - (({_PCX}) - FLOOR(({_PCX}) / {Z.TRACT_W!r})"
    f" * {Z.TRACT_W!r})) * {_OCY!r}"
    f" + (({_PCY}) - FLOOR(({_PCY}) / {Z.TRACT_H!r}) * {Z.TRACT_H!r}) * {_OCX!r}"
    f" > {_OCX * _OCY!r}"
    f" AND ((({_PCX}) - FLOOR(({_PCX}) / {Z.TRACT_W!r}) * {Z.TRACT_W!r})) * {_OCY!r}"
    f" + ({Z.TRACT_H!r} - (({_PCY}) - FLOOR(({_PCY}) / {Z.TRACT_H!r})"
    f" * {Z.TRACT_H!r})) * {_OCX!r} > {_OCX * _OCY!r}"
    f" AND ({Z.TRACT_W!r} - (({_PCX}) - FLOOR(({_PCX}) / {Z.TRACT_W!r})"
    f" * {Z.TRACT_W!r})) * {_OCY!r}"
    f" + ({Z.TRACT_H!r} - (({_PCY}) - FLOOR(({_PCY}) / {Z.TRACT_H!r})"
    f" * {Z.TRACT_H!r})) * {_OCX!r} > {_OCX * _OCY!r})"
)

_OCT_ZONAL_ORACLE = f"""
WITH px AS ({_PX_GRID})
SELECT 'r0' AS raster_id,
       {Z.zone_id_expr(_PCX, _PCY)} AS zone_id,
       ROUND(CAST(SUM((i * {V_MX} + j * {V_MY}) % {V_MOD}) AS DOUBLE)
             / COUNT(*), 4) AS mean_val,
       COUNT(*) AS n_pixels
FROM px
WHERE {_IN_OCT_PX}
GROUP BY 1, 2
"""


@register("extract_at_octagon", _OCT_ZONAL_ORACLE)
def extract_at_octagon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 extract_at over GENERAL polygons: the 256 tracts with 25%
    corner cuts (octagons), evaluated through the production ray-cast
    path (raster.extract_at_polygons + geom.core.points_in_polygon),
    oracle-checked against the closed-form half-plane membership —
    chopin's flagship polygons × raster call
    (/root/reference/R/processing.R:301-530)."""
    from chopin_spark.raster import extract_at_polygons

    tiles = _tiles(spark, n_rasters=1)
    z = Z.zones_df(spark)
    polys = z.select(
        F.col("zone_id").alias("poly_id"),
        "xmin", "ymin", "xmax", "ymax",
        F.array(
            F.col("xmin") + _OCX, F.col("xmax") - _OCX, F.col("xmax"),
            F.col("xmax"), F.col("xmax") - _OCX, F.col("xmin") + _OCX,
            F.col("xmin"), F.col("xmin"),
        ).alias("xs"),
        F.array(
            F.col("ymin"), F.col("ymin"), F.col("ymin") + _OCY,
            F.col("ymax") - _OCY, F.col("ymax"), F.col("ymax"),
            F.col("ymax") - _OCY, F.col("ymin") + _OCY,
        ).alias("ys"),
    )
    return extract_at_polygons(tiles, polys, poly_id="poly_id").select(
        "raster_id",
        F.col("poly_id").alias("zone_id"),
        "mean_val",
        "n_pixels",
    )


# --- C3 kernel_weighting: kernel-weighted zonal mean ------------------------

_BW = 20_000.0
_KD = (
    f"SQRT(({_PCX} - px) * ({_PCX} - px) + ({_PCY} - py) * ({_PCY} - py))"
)
_WQ = quantize_sql(kernel_sql(_KD, _BW, "quartic"))

_KW_ORACLE = f"""
WITH poi AS (
  SELECT p_partkey, {_POIX} AS px, {_POIY} AS py FROM part
),
ii AS (
  SELECT p_partkey, px, py,
         UNNEST(generate_series(
           GREATEST(0, CAST(FLOOR((px - {_BW!r}) / {PW!r}) AS BIGINT) - 1),
           LEAST({NPX - 1}, CAST(FLOOR((px + {_BW!r}) / {PW!r}) AS BIGINT) + 1)
         )) AS i
  FROM poi
),
jj AS (
  SELECT p_partkey, px, py, i,
         UNNEST(generate_series(
           GREATEST(0, CAST(FLOOR((py - {_BW!r}) / {PH!r}) AS BIGINT) - 1),
           LEAST({NPY - 1}, CAST(FLOOR((py + {_BW!r}) / {PH!r}) AS BIGINT) + 1)
         )) AS j
  FROM ii
),
hit AS (
  SELECT p_partkey,
         ((i * {V_MX} + j * {V_MY}) % {V_MOD}) AS val,
         {_WQ} AS wq
  FROM jj
  WHERE {_PCX} >= px - {_BW!r} AND {_PCX} < px + {_BW!r}
    AND {_PCY} >= py - {_BW!r} AND {_PCY} < py + {_BW!r}
)
SELECT CAST(p_partkey AS STRING) AS pid,
       ROUND(CAST(SUM(wq * val) AS DOUBLE) / CAST(SUM(wq) AS DOUBLE), 4)
         AS kw_mean,
       COUNT(*) AS n_pixels
FROM hit GROUP BY 1
"""


@register("kernel_weighting_poi", _KW_ORACLE)
def kernel_weighting_poi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C3 .kernel_weighting (/root/reference/R/processing.R:50-124):
    per-pixel distance point→pixel-center, quartic kernel weight ×
    value, groupBy weighted mean. Quantized integer weights make the
    distributed sum order-independent (exact vs the sequential oracle)."""
    poi = load(spark, sf_dir, "part").select(
        F.col("p_partkey").cast("string").alias("pid"),
        (F.expr(_POIX) - _BW).alias("xmin"),
        (F.expr(_POIY) - _BW).alias("ymin"),
        (F.expr(_POIX) + _BW).alias("xmax"),
        (F.expr(_POIY) + _BW).alias("ymax"),
        F.expr(_POIX).alias("cx"),
        F.expr(_POIY).alias("cy"),
    )
    tiles = _tiles(spark, n_rasters=1)
    out = extract_at(tiles, poi, rect_id="pid", kernel="quartic", bandwidth=_BW)
    return out.select(
        "pid", F.col("mean_val").alias("kw_mean"), "n_pixels"
    )


# --- R3 par_multirasters: fan-out + error rows ------------------------------

_N_RASTERS, _CORRUPT_RID = 6, 5
_CNT_CODE = (
    f"(LPAD(CAST({Z.state_num_expr(_PCX, _PCY)} AS STRING), 2, '0') || "
    f"LPAD(CAST({Z.county_num_expr(_PCX, _PCY)} AS STRING), 3, '0'))"
)

_MR_ORACLE = f"""
WITH r AS (
  SELECT UNNEST(generate_series(0, {_N_RASTERS - 2})) AS rid
),
px AS ({_PX_GRID}),
v AS (
  SELECT rid, {_CNT_CODE} AS county,
         ((i * {V_MX} + j * {V_MY} + rid * {V_SEED}) % {V_MOD}) AS val
  FROM r CROSS JOIN px
),
agg AS (
  SELECT ('r' || CAST(rid AS STRING)) AS base_raster, county,
         ROUND(CAST(SUM(val) AS DOUBLE) / COUNT(*), 4) AS mean_val,
         COUNT(*) AS n_pixels
  FROM v GROUP BY 1, 2
)
SELECT base_raster, county, mean_val, n_pixels,
       CAST(NULL AS STRING) AS error_message
FROM agg
UNION ALL
SELECT 'r{_CORRUPT_RID}', NULL, NULL, NULL, 'corrupt raster: values missing'
"""


@register("par_multirasters_zonal", _MR_ORACLE)
def par_multirasters_zonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R3 par_multirasters (/root/reference/R/scale_process.R:686-787):
    zonal means of 6 rasters × 64 counties in ONE plan — per-file task
    fan-out becomes partition-by-raster_id; provenance column
    base_raster (:764); corrupt raster → one error row, job proceeds
    (row-count contract n_zones × n_files + 1,
    /root/reference/tests/testthat/test-scale_process.R:1230-1234,:1324)."""
    tiles = _tiles(spark, n_rasters=_N_RASTERS, corrupt=(_CORRUPT_RID,))
    rects = spark.createDataFrame(Z.county_rects_pdf())
    good = extract_at(
        tiles.filter(F.col("values").isNotNull()), rects, rect_id="county"
    ).select(
        F.col("raster_id").alias("base_raster"),
        "county", "mean_val", "n_pixels",
        F.lit(None).cast("string").alias("error_message"),
    )
    errors = corrupt_raster_ids(tiles).select(
        F.col("raster_id").alias("base_raster"),
        F.lit(None).cast("string").alias("county"),
        F.lit(None).cast("double").alias("mean_val"),
        F.lit(None).cast("long").alias("n_pixels"),
        F.lit("corrupt raster: values missing").alias("error_message"),
    )
    return good.unionByName(errors)


# --- C2 kernelfunction golden surface ---------------------------------------

_KERNEL_ORACLE = f"""
SELECT event_id,
       ROUND({kernel_sql('value', 50.0, 'uniform')}, 4) AS k_uniform,
       ROUND({kernel_sql('value', 50.0, 'quartic')}, 4) AS k_quartic,
       ROUND({kernel_sql('value', 50.0, 'triweight')}, 4) AS k_triweight,
       ROUND({kernel_sql('value', 50.0, 'epanechnikov')}, 4) AS k_epanechnikov
FROM events
"""


@register("kernel_functions", _KERNEL_ORACLE)
def kernel_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C2 kernelfunction (/root/reference/R/processing.R:23-42) over the
    events value column — same SQL text in Spark and DuckDB; golden
    values pinned in tests/test_zonal.py."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        *[
            F.round(F.expr(kernel_sql("value", 50.0, k)), 4).alias(f"k_{k}")
            for k in ("uniform", "quartic", "triweight", "epanechnikov")
        ],
    )


# --- distributed 3×3 focal sum (stencil + halo exchange) ---------------------

from chopin_spark.raster import TILE, TNX as _TNX  # noqa: E402
from chopin_spark.raster import focal_sum_tiles, pixel_value_sql  # noqa: E402

_FOCAL_TERMS = " + ".join(
    f"(CASE WHEN i + {di} BETWEEN 0 AND {NPX - 1}"
    f" AND j + {dj} BETWEEN 0 AND {NPY - 1}"
    f" THEN {pixel_value_sql(f'(i + {di})', f'(j + {dj})', 0)}"
    f" ELSE 0 END)"
    for dj in (-1, 0, 1)
    for di in (-1, 0, 1)
)

_FOCAL_ORACLE = f"""
WITH px AS (
  SELECT g1.i, g2.j
  FROM generate_series(0, {NPX - 1}) AS g1(i),
       generate_series(0, {NPY - 1}) AS g2(j)
)
SELECT 'r0' AS raster_id,
       (CAST(FLOOR(j / {TILE}.0) AS BIGINT) * {_TNX}
        + CAST(FLOOR(i / {TILE}.0) AS BIGINT)) AS tile_id,
       CAST(SUM({_FOCAL_TERMS}) AS BIGINT) AS focal_sum,
       CAST(SUM(CASE WHEN i BETWEEN 1 AND {NPX - 2}
                      AND j BETWEEN 1 AND {NPY - 2}
                THEN 1 ELSE 0 END) AS INT) AS n_full
FROM px GROUP BY 1, 2
"""


@register("raster_focal_sum", _FOCAL_ORACLE)
def raster_focal_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """terra::focal analog on the partitioned raster: 3×3 truncated-
    window focal sum per pixel via strip-only halo exchange between
    tiles (raster.focal_sum_tiles), rolled up per tile.  The oracle
    recomputes every pixel's window directly from the value function —
    no halos — so any mis-assembled boundary strip breaks the hash."""
    tiles = _tiles(spark, n_rasters=1)
    return focal_sum_tiles(tiles)


# --- 3×3 focal MEDIAN (the order-statistic stencil) ---------------------------
#
# terra::focal(fun=median): unlike the focal sum, a windowed median has
# NO associative partial — this is the stencil that genuinely needs the
# halo exchange.  The engine carries Σ(2·median) per tile (a median of
# ints is an int or half-int, so the doubled value is integer-exact and
# the cross-tile SUM partition-order independent).  The oracle sorts
# each pixel's in-bounds window as a LIST and adds the two middle order
# statistics — an entirely independent algorithm from the numpy
# stacked-sort finish.

_FM_WINDOW = ", ".join(
    f"(CASE WHEN i + {di} BETWEEN 0 AND {NPX - 1}"
    f" AND j + {dj} BETWEEN 0 AND {NPY - 1}"
    f" THEN {pixel_value_sql(f'(i + {di})', f'(j + {dj})', 0)} END)"
    for dj in (-1, 0, 1)
    for di in (-1, 0, 1)
)

_FOCAL_MED_ORACLE = f"""
WITH px AS (
  SELECT g1.i, g2.j
  FROM generate_series(0, {NPX - 1}) AS g1(i),
       generate_series(0, {NPY - 1}) AS g2(j)
),
w AS (
  SELECT i, j,
         LIST_SORT(LIST_FILTER([{_FM_WINDOW}], x -> x IS NOT NULL)) AS l
  FROM px
)
SELECT 'r0' AS raster_id,
       (CAST(FLOOR(j / {TILE}.0) AS BIGINT) * {_TNX}
        + CAST(FLOOR(i / {TILE}.0) AS BIGINT)) AS tile_id,
       CAST(SUM(l[(LEN(l) + 1) // 2] + l[LEN(l) // 2 + 1]) AS BIGINT)
         AS med2_sum,
       CAST(SUM(LEN(l) % 2) AS INT) AS n_odd
FROM w GROUP BY 1, 2
"""


@register("raster_focal_median", _FOCAL_MED_ORACLE)
def raster_focal_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed 3×3 focal median (raster.focal_median_tiles) — strip
    halo exchange + per-pixel stacked-sort, checked against the
    list-sort oracle value-for-value per tile."""
    from chopin_spark.raster import focal_median_tiles

    tiles = _tiles(spark, n_rasters=1)
    return focal_median_tiles(tiles)


# --- C1 std statistic (func injection: population std from partials) ---------

_TRACT_STD_ORACLE = f"""
WITH px AS ({_PX_GRID})
SELECT 'r0' AS raster_id,
       {Z.zone_id_expr(_PCX, _PCY)} AS zone_id,
       ROUND(SQRT(
         CAST(SUM(POW((i * {V_MX} + j * {V_MY}) % {V_MOD}, 2)) AS DOUBLE)
           / COUNT(*)
         - (CAST(SUM((i * {V_MX} + j * {V_MY}) % {V_MOD}) AS DOUBLE)
            / COUNT(*))
           * (CAST(SUM((i * {V_MX} + j * {V_MY}) % {V_MOD}) AS DOUBLE)
              / COUNT(*))
       ), 4) AS std_val,
       COUNT(*) AS n_pixels
FROM px
GROUP BY 1, 2
"""


@register("extract_at_tracts_std", _TRACT_STD_ORACLE)
def extract_at_tracts_std(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 `func` injection beyond sum/min/max: population standard
    deviation per tract, composed from the SAME exact-integer partials
    (sum, sum-of-squares, count) — order-independent, so the float
    finish (sqrt of two IEEE divisions) is bit-identical in DuckDB."""
    tiles = _tiles(spark, n_rasters=1)
    rects = Z.zones_df(spark).select(
        "zone_id", "xmin", "ymin", "xmax", "ymax"
    )
    return extract_at(
        tiles, rects, rect_id="zone_id", stats=("std",)
    ).select("raster_id", "zone_id", "std_val", "n_pixels")


# --- C1 exact coverage fractions for general rings (octagons) ---------------
#
# extract_at with EXACT per-pixel coverage fractions over non-rect zones
# (exactextractr parity, /root/reference/R/processing.R:195-208; VERDICT
# r02 next-steps #6).  Spark runs the perimeter-bounded S-H clip path
# (raster.extract_at_polygons_frac); the oracle computes each pixel's
# octagon coverage in closed form: pixels align with tract edges, so the
# covered area is the pixel minus the four chamfer-triangle cuts, each an
# "area below a falling line within a rect" with clamped breakpoints.

_FRACQ = 4096.0


def _tri_cut_sql(u0: str, u1: str, v0: str, v1: str) -> str:
    """Closed-form area of {u*CY + v*CX < CX*CY} ∩ [u0,u1]×[v0,v1]."""
    cxcy = _OCX * _OCY
    ua = (
        f"LEAST(GREATEST(({cxcy!r} - {_OCX!r} * ({v1})) / {_OCY!r},"
        f" ({u0})), ({u1}))"
    )
    ub = (
        f"LEAST(GREATEST(({cxcy!r} - {_OCX!r} * ({v0})) / {_OCY!r},"
        f" ({u0})), ({u1}))"
    )
    h_ua = f"(({cxcy!r} - {_OCY!r} * {ua}) / {_OCX!r})"
    h_ub = f"(({cxcy!r} - {_OCY!r} * {ub}) / {_OCX!r})"
    return (
        f"(({ua} - ({u0})) * (({v1}) - ({v0}))"
        f" + ({ub} - {ua}) * (({h_ua} + {h_ub}) / 2.0 - ({v0})))"
    )


_U0 = f"((i % {int(Z.TRACT_W / PW)}) * {PW!r})"
_U1 = f"({_U0} + {PW!r})"
_V0 = f"((j % {int(Z.TRACT_H / PH)}) * {PH!r})"
_V1 = f"({_V0} + {PH!r})"
_MU0, _MU1 = f"({Z.TRACT_W!r} - {_U1})", f"({Z.TRACT_W!r} - {_U0})"
_MV0, _MV1 = f"({Z.TRACT_H!r} - {_V1})", f"({Z.TRACT_H!r} - {_V0})"

_PX_COVER = (
    f"({PW * PH!r}"
    f" - {_tri_cut_sql(_U0, _U1, _V0, _V1)}"      # SW chamfer
    f" - {_tri_cut_sql(_MU0, _MU1, _V0, _V1)}"    # SE
    f" - {_tri_cut_sql(_U0, _U1, _MV0, _MV1)}"    # NW
    f" - {_tri_cut_sql(_MU0, _MU1, _MV0, _MV1)})"  # NE
)

_OCT_FRAC_ORACLE = f"""
WITH px AS ({_PX_GRID}),
w AS (
  SELECT i, j,
         CAST(FLOOR({_PX_COVER} / {PW * PH!r} * {_FRACQ!r} + 0.5)
              AS BIGINT) AS q,
         (i * {V_MX} + j * {V_MY}) % {V_MOD} AS val,
         {Z.zone_id_expr(_PCX, _PCY)} AS zone_id
  FROM px
)
SELECT 'r0' AS raster_id, zone_id,
       ROUND(CAST(SUM(q * val) AS DOUBLE) / SUM(q), 4) AS frac_mean,
       ROUND(CAST(SUM(q) AS DOUBLE) / {_FRACQ!r}, 4) AS cov_pixels
FROM w WHERE q > 0
GROUP BY 1, 2
"""


@register("extract_at_octagon_frac", _OCT_FRAC_ORACLE)
def extract_at_octagon_frac(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-coverage-fraction zonal mean over the 256 octagon zones:
    boundary pixels are Sutherland–Hodgman-clipped (general-ring code
    path), interior pixels take the vectorized center test; the oracle
    evaluates the chamfer-cut closed form per pixel."""
    from chopin_spark.raster import extract_at_polygons_frac

    tiles = _tiles(spark, n_rasters=1)
    z = Z.zones_df(spark)
    polys = z.select(
        F.col("zone_id").alias("poly_id"),
        "xmin", "ymin", "xmax", "ymax",
        F.array(
            F.col("xmin") + _OCX, F.col("xmax") - _OCX, F.col("xmax"),
            F.col("xmax"), F.col("xmax") - _OCX, F.col("xmin") + _OCX,
            F.col("xmin"), F.col("xmin"),
        ).alias("xs"),
        F.array(
            F.col("ymin"), F.col("ymin"), F.col("ymin") + _OCY,
            F.col("ymax") - _OCY, F.col("ymax"), F.col("ymax"),
            F.col("ymax") - _OCY, F.col("ymin") + _OCY,
        ).alias("ys"),
    )
    return extract_at_polygons_frac(tiles, polys, poly_id="poly_id").select(
        "raster_id",
        F.col("poly_id").alias("zone_id"),
        "frac_mean",
        "cov_pixels",
    )


# --- C1 exact order statistics (median / quantile zonal stats) ---------------
#
# chopin's `func` passthrough reaches any exact_extract summary,
# including 'median' and 'quantile' (/root/reference/R/processing.R:
# 133-142,196). Order statistics don't decompose into sum-partials, but
# a (zone, DN value) histogram DOES: counts combine associatively
# (map-side partial agg), and the quantile finish is a per-zone window
# over the histogram — tiny for real-world 8/16-bit rasters. Engine
# path: stored tile table -> posexplode (JVM) -> histogram agg ->
# window finish. Oracle: DuckDB's INDEPENDENT builtin MEDIAN /
# quantile_cont over regenerated pixels — two different algorithms
# agreeing on the value.

from pyspark.sql import Window  # noqa: E402

from chopin_spark.raster import tile_pixels, weighted_tiles  # noqa: E402

_MEDIAN_ORACLE = f"""
WITH px AS ({_PX_GRID}),
v AS (
  SELECT (i * {V_MX} + j * {V_MY}) % {V_MOD} AS val,
         {Z.zone_id_expr(_PCX, _PCY)} AS zone_id
  FROM px
)
SELECT 'r0' AS raster_id, zone_id,
       ROUND(CAST(MEDIAN(val) AS DOUBLE), 4) AS median_val,
       ROUND(CAST(quantile_cont(val, 0.9) AS DOUBLE), 4) AS p90_val,
       COUNT(*) AS n_pixels
FROM v GROUP BY 2
"""


@register("extract_at_median", _MEDIAN_ORACLE)
def extract_at_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact zonal median + linearly-interpolated p90 (the
    quantile_cont h = q*(n-1) convention) from a per-(zone, value)
    histogram. Median = mean of the two middle order statistics (even
    n) — matches DuckDB's MEDIAN; both engines' doubles stay exact
    (integer values < 1e6, sums < 2^53)."""
    tiles = _tiles(spark, n_rasters=1)
    px = tile_pixels(tiles).withColumn(
        "zone_id", F.expr(Z.zone_id_expr(_PCX, _PCY))
    )
    hist = px.groupBy("raster_id", "zone_id", "val").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w_ord = Window.partitionBy("raster_id", "zone_id").orderBy("val")
    w_all = Window.partitionBy("raster_id", "zone_id")
    g = (
        hist.withColumn("cum", F.sum("cnt").over(w_ord))
        .withColumn("n", F.sum("cnt").over(w_all))
        .withColumn("lo_p", F.expr("(n + 1) DIV 2"))
        .withColumn("hi_p", F.expr("(n + 2) DIV 2"))
        .withColumn("h90", (F.col("n") - F.lit(1)).cast("double") * F.lit(0.9))
        .withColumn("r90", F.floor("h90"))
    )

    def _at(pos):  # value at 1-based rank `pos` within the zone
        return F.max(
            F.when(
                (F.col("cum") >= pos) & (F.col("cum") - F.col("cnt") < pos),
                F.col("val"),
            )
        )

    agg = g.groupBy("raster_id", "zone_id").agg(
        _at(F.col("lo_p")).alias("med_lo"),
        _at(F.col("hi_p")).alias("med_hi"),
        _at(F.col("r90") + 1).alias("v90_lo"),
        _at(F.least(F.col("r90") + 2, F.col("n"))).alias("v90_hi"),
        F.max(F.col("h90") - F.col("r90").cast("double")).alias("f90"),
        F.max("n").alias("n_pixels"),
    )
    return agg.select(
        "raster_id",
        "zone_id",
        F.round(
            (F.col("med_lo") + F.col("med_hi")).cast("double") / 2.0, 4
        ).alias("median_val"),
        F.round(
            F.col("v90_lo").cast("double")
            + F.col("f90")
            * (F.col("v90_hi") - F.col("v90_lo")).cast("double"),
            4,
        ).alias("p90_val"),
        "n_pixels",
    )


# --- C1 weighted zonal mean (second raster as weights) ------------------------

_WMEAN_ORACLE = f"""
WITH px AS ({_PX_GRID})
SELECT 'r0' AS raster_id,
       {Z.zone_id_expr(_PCX, _PCY)} AS zone_id,
       ROUND(CAST(SUM({pixel_value_sql('i', 'j', 0)}
                      * {pixel_value_sql('i', 'j', 1)}) AS DOUBLE)
             / CAST(SUM({pixel_value_sql('i', 'j', 1)}) AS DOUBLE),
             4) AS wmean_val,
       COUNT(*) AS n_pixels
FROM px
GROUP BY 1, 2
"""


@register("extract_at_weighted", _WMEAN_ORACLE)
def extract_at_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted zonal mean sum(v*w)/sum(w) with raster r1 as the
    pixel-aligned weight layer — exact_extract's weighted summaries
    (`x` plus `w` rasters, /root/reference/R/processing.R:133-142).
    Engine path: one tile_id equi-join fuses the rasters (zip_with
    product, JVM), then TWO extract_at sum passes (v*w and w) joined on
    zone — all integer-exact (v*w < 1e12, zone sums < 2^63). On a
    cluster both tile tables are bucketed by tile_id, so the fuse join
    is shuffle-free."""
    t = _tiles(spark, n_rasters=2)
    v = t.filter(F.col("rid") == 0)
    w = t.filter(F.col("rid") == 1)
    rects = Z.zones_df(spark).select(
        "zone_id", "xmin", "ymin", "xmax", "ymax"
    )
    s_vw = extract_at(
        weighted_tiles(v, w), rects, rect_id="zone_id", stats=("sum",)
    ).select(
        "raster_id", "zone_id",
        F.col("sum_val").alias("vw_sum"), "n_pixels",
    )
    s_w = extract_at(
        w.withColumn("raster_id", F.lit("r0")),
        rects, rect_id="zone_id", stats=("sum",),
    ).select("raster_id", "zone_id", F.col("sum_val").alias("w_sum"))
    return s_vw.join(s_w, ["raster_id", "zone_id"]).select(
        "raster_id",
        "zone_id",
        F.round(
            F.col("vw_sum").cast("double") / F.col("w_sum").cast("double"),
            4,
        ).alias("wmean_val"),
        "n_pixels",
    )


# --- terra::terrain analog: Horn slope/aspect over the partitioned raster ----
#
# Engine side: strip-only halo exchange + integer Horn stencil
# (raster.terrain_tiles).  Oracle side: every interior pixel's eight
# neighbors regenerated in closed form from the value function — no
# halos — so a mis-assembled strip, a flipped stencil sign, or an
# octant-boundary disagreement all break the hash.

from chopin_spark.raster import terrain_tiles  # noqa: E402


def _pv(di: int, dj: int) -> str:
    return pixel_value_sql(f"(i + {di})", f"(j + {dj})", 0)


_GX = (
    f"(({_pv(1, -1)} + 2 * {_pv(1, 0)} + {_pv(1, 1)})"
    f" - ({_pv(-1, -1)} + 2 * {_pv(-1, 0)} + {_pv(-1, 1)}))"
)
_GY = (
    f"(({_pv(-1, 1)} + 2 * {_pv(0, 1)} + {_pv(1, 1)})"
    f" - ({_pv(-1, -1)} + 2 * {_pv(0, -1)} + {_pv(1, -1)}))"
)

_OCTANT = """
CASE WHEN ax >= ay AND gx > 0 AND gy >= 0 THEN 0
     WHEN ax <  ay AND gy > 0 AND gx >= 0 THEN 1
     WHEN ax <  ay AND gy > 0 AND gx <  0 THEN 2
     WHEN ax >= ay AND gx < 0 AND gy >= 0 THEN 3
     WHEN ax >= ay AND gx < 0 AND gy <  0 THEN 4
     WHEN ax <  ay AND gy < 0 AND gx <= 0 THEN 5
     WHEN ax <  ay AND gy < 0 AND gx >  0 THEN 6
     ELSE 7 END
"""

_TERRAIN_ORACLE = f"""
WITH px AS (
  SELECT g1.i, g2.j
  FROM generate_series(1, {NPX - 2}) AS g1(i),
       generate_series(1, {NPY - 2}) AS g2(j)
),
g AS (
  SELECT i, j, {_GX} AS gx, {_GY} AS gy FROM px
),
c AS (
  SELECT i, j, gx, gy, ABS(gx) AS ax, ABS(gy) AS ay,
         CASE WHEN gx = 0 AND gy = 0 THEN 1 ELSE 0 END AS flat,
         {_OCTANT} AS oct
  FROM g
)
SELECT 'r0' AS raster_id,
       (CAST(FLOOR(j / {TILE}.0) AS BIGINT) * {_TNX}
        + CAST(FLOOR(i / {TILE}.0) AS BIGINT)) AS tile_id,
       CAST(COUNT(*) AS INT) AS n_full,
       CAST(SUM(gx * gx + gy * gy) AS BIGINT) AS slope_energy,
       CAST(SUM(flat) AS BIGINT) AS n_flat,
       {", ".join(
         f"CAST(SUM(CASE WHEN oct = {o} AND flat = 0 THEN 1 ELSE 0 END)"
         f" AS BIGINT) AS s{o}" for o in range(8)
       )}
FROM c GROUP BY 1, 2
"""


@register("raster_terrain_horn", _TERRAIN_ORACLE)
def raster_terrain_horn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """terra::terrain analog: Horn slope energy Σ(gx²+gy²) and 8-octant
    aspect class counts per tile, computed distributed with strip-only
    halo exchange — integer-exact end to end (aspect uses sign
    comparisons, never atan2, so there is no float boundary to
    disagree on)."""
    tiles = _tiles(spark, n_rasters=1)
    return terrain_tiles(tiles)


# --- Zevenbergen–Thorne curvature: second-derivative stencils -----------------

from chopin_spark.raster import curvature_tiles  # noqa: E402

_ZXX = f"({_pv(-1, 0)} - 2 * {_pv(0, 0)} + {_pv(1, 0)})"
_ZYY = f"({_pv(0, -1)} - 2 * {_pv(0, 0)} + {_pv(0, 1)})"
_TXY = f"({_pv(1, 1)} - {_pv(-1, 1)} - {_pv(1, -1)} + {_pv(-1, -1)})"

_CURV_ORACLE = f"""
WITH px AS (
  SELECT g1.i, g2.j
  FROM generate_series(1, {NPX - 2}) AS g1(i),
       generate_series(1, {NPY - 2}) AS g2(j)
),
d AS (
  SELECT i, j, {_ZXX} + {_ZYY} AS lap, {_TXY} AS txy FROM px
)
SELECT 'r0' AS raster_id,
       (CAST(FLOOR(j / {TILE}.0) AS BIGINT) * {_TNX}
        + CAST(FLOOR(i / {TILE}.0) AS BIGINT)) AS tile_id,
       CAST(COUNT(*) AS INT) AS n_full,
       CAST(SUM(lap) AS BIGINT) AS lap_sum,
       CAST(SUM(lap * lap) AS BIGINT) AS lap_energy,
       CAST(SUM(txy * txy) AS BIGINT) AS twist_energy,
       CAST(SUM(CASE WHEN lap > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_concave,
       CAST(SUM(CASE WHEN lap < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_convex,
       CAST(SUM(CASE WHEN lap = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_planar
FROM d GROUP BY 1, 2
"""


@register("raster_curvature_zt", _CURV_ORACLE)
def raster_curvature_zt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zevenbergen–Thorne (1987) curvature stencils per tile: integer
    Laplacian carrier (zxx+zyy) sum/energy, twist-term energy, and
    concave/convex/planar class counts — the second-derivative
    companion to raster_terrain_horn's first-derivative battery, same
    strip-only halo exchange (shuffle = tile surface).  Oracle
    regenerates every interior pixel's 3×3 window in closed form, so a
    flipped stencil sign or a mis-assembled corner halo breaks the
    hash."""
    tiles = _tiles(spark, n_rasters=1)
    return curvature_tiles(tiles)


# --- C1 categorical zonal stats: majority / minority / variety ---------------
#
# exact_extract's 'majority'/'minority'/'variety' summaries (reachable
# through chopin's func passthrough, /root/reference/R/processing.R:
# 133-142) operate on CATEGORICAL rasters.  The continuous DN is
# reclassified into 10 landcover-style classes (val % 10 — pure column
# math, terra::classify analog); the per-(zone, class) histogram then
# combines associatively (map-side partials; final table is zones x 10
# rows regardless of raster size — the 100-TB shape).  Ties broken
# deterministically toward the SMALLER class id in both engines.

_MODE_ORACLE = f"""
WITH px AS ({_PX_GRID}),
h AS (
  SELECT {Z.zone_id_expr(_PCX, _PCY)} AS zone_id,
         ({pixel_value_sql('i', 'j', 0)}) % 10 AS cls,
         COUNT(*) AS cnt
  FROM px GROUP BY 1, 2
),
r AS (
  SELECT zone_id, cls, cnt,
         ROW_NUMBER() OVER (PARTITION BY zone_id
                            ORDER BY cnt DESC, cls ASC) AS rmaj,
         ROW_NUMBER() OVER (PARTITION BY zone_id
                            ORDER BY cnt ASC, cls ASC) AS rmin
  FROM h
)
SELECT 'r0' AS raster_id, zone_id,
       CAST(MAX(CASE WHEN rmaj = 1 THEN cls END) AS BIGINT)
         AS majority_cls,
       CAST(MAX(CASE WHEN rmaj = 1 THEN cnt END) AS BIGINT)
         AS majority_cnt,
       CAST(MAX(CASE WHEN rmin = 1 THEN cls END) AS BIGINT)
         AS minority_cls,
       CAST(COUNT(*) AS BIGINT) AS variety,
       CAST(SUM(cnt) AS BIGINT) AS n_pixels
FROM r GROUP BY 2
"""


@register("extract_at_mode", _MODE_ORACLE)
def extract_at_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical zonal stats (exact_extract majority/minority/
    variety): reclassify DN -> 10 classes in the JVM, build the
    (zone, class) histogram, finish with struct-max argmax —
    max(struct(cnt, -cls)) picks the largest count and the smallest
    class on ties, min(struct(cnt, cls)) the minority.  One shuffle on
    the histogram key; the finish agg sees <= 10 rows per zone."""
    tiles = _tiles(spark, n_rasters=1)
    px = tile_pixels(tiles).withColumn(
        "zone_id", F.expr(Z.zone_id_expr(_PCX, _PCY))
    )
    hist = (
        px.withColumn("cls", F.col("val") % 10)
        .groupBy("raster_id", "zone_id", "cls")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    agg = hist.groupBy("raster_id", "zone_id").agg(
        F.max(F.struct(F.col("cnt"), (-F.col("cls")).alias("nc")))
        .alias("maj"),
        F.min(F.struct(F.col("cnt"), F.col("cls"))).alias("mino"),
        F.count(F.lit(1)).alias("variety"),
        F.sum("cnt").alias("n_pixels"),
    )
    return agg.select(
        "raster_id",
        "zone_id",
        (-F.col("maj.nc")).cast("long").alias("majority_cls"),
        F.col("maj.cnt").cast("long").alias("majority_cnt"),
        F.col("mino.cls").cast("long").alias("minority_cls"),
        F.col("variety").cast("long").alias("variety"),
        F.col("n_pixels").cast("long").alias("n_pixels"),
    )


# --- C1 landscape diversity: Simpson index per zone ---------------------------
#
# Landscape-ecology zonal diversity (FRAGSTATS SIDI; reachable through
# chopin's func passthrough, /root/reference/R/processing.R:133-142)
# over the same 10-class reclassification as extract_at_mode.  Simpson
# D = 1 - SUM(n_i^2)/N^2 is a RATIONAL function of the histogram, so
# the engine carries exact BIGINT sum-of-squares all the way and pays
# exactly one IEEE division at the end — deterministic across engines,
# unlike Shannon entropy whose ln() has no cross-engine bit contract.
# Scale shape: identical to the mode query — associative (zone, class)
# histogram with map-side partials, finish agg over <=10 rows/zone.

_SIMPSON_ORACLE = f"""
WITH px AS ({_PX_GRID}),
h AS (
  SELECT {Z.zone_id_expr(_PCX, _PCY)} AS zone_id,
         ({pixel_value_sql('i', 'j', 0)}) % 10 AS cls,
         COUNT(*) AS cnt
  FROM px GROUP BY 1, 2
)
SELECT 'r0' AS raster_id, zone_id,
       CAST(SUM(cnt * cnt) AS BIGINT) AS sum_sq,
       CAST(SUM(cnt) AS BIGINT) AS n_pixels,
       ROUND(1.0 - CAST(SUM(cnt * cnt) AS DOUBLE)
                   / (CAST(SUM(cnt) AS DOUBLE) * CAST(SUM(cnt) AS DOUBLE)),
             6) AS simpson
FROM h GROUP BY 2
"""


@register("extract_at_diversity", _SIMPSON_ORACLE)
def extract_at_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal Simpson diversity over the reclassified landcover raster:
    one histogram shuffle, exact integer sum-of-squares, single final
    division (the only float op — reproducible bit-for-bit)."""
    tiles = _tiles(spark, n_rasters=1)
    px = tile_pixels(tiles).withColumn(
        "zone_id", F.expr(Z.zone_id_expr(_PCX, _PCY))
    )
    hist = (
        px.withColumn("cls", F.col("val") % 10)
        .groupBy("raster_id", "zone_id", "cls")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    agg = hist.groupBy("raster_id", "zone_id").agg(
        F.sum(F.col("cnt") * F.col("cnt")).alias("sum_sq"),
        F.sum("cnt").alias("n_pixels"),
    )
    return agg.select(
        "raster_id",
        "zone_id",
        F.col("sum_sq").cast("long").alias("sum_sq"),
        F.col("n_pixels").cast("long").alias("n_pixels"),
        F.round(
            F.lit(1.0)
            - F.col("sum_sq").cast("double")
            / (F.col("n_pixels").cast("double") * F.col("n_pixels").cast("double")),
            6,
        ).alias("simpson"),
    )


# --- dasymetric areal interpolation (raster-weighted summarize_aw) ----------
#
# The population-weighted exposure workflow chopin's vignettes center
# on: redistribute an EXTENSIVE source-zone variable (tract population)
# onto target zones, weighting each source∩target piece not by bare
# intersection area (summarize_aw's assumption of uniform density) but
# by an ancillary raster mass inside the piece — classic dasymetric
# refinement (nightlights / landcover weighting):
#
#   pop(tgt) = Σ_src pop(src) · W(src ∩ tgt) / W(src),   W = Σ pixels DN
#
# Fixture geometry: sources = the 256 tracts (64×48 px — pixel-edge
# aligned), targets = the 8×6 analysis cells (128×128 px), so every
# intersection is an exact pixel rectangle and W comes through the
# PRODUCTION zonal path (extract_at over the stored tile table,
# chunked-numpy partials).  All mass arithmetic is integer: DN sums
# are exact BIGINTs, population quantizes to micro-units, and each
# piece's contribution is one BIGINT floor-division — the final
# per-target sum is reduction-order independent, so the oracle (which
# regenerates pixels from generate_series and replays the identical
# integer ops) hash-matches exactly.
#
# Scale shape: W(src∩tgt) is one zonal aggregation keyed by the piece
# id (at 10^12 pixels: tile-join + partial aggs, the extract_at plan);
# W(src) is a ≤|src| re-aggregation; population is a broadcast
# dimension; the redistribution itself is pure column math.  Mass
# conservation (Σ tgt == Σ src up to quantization) is pinned in tests.

_DASY_TPXW = 64    # tract width, pixels
_DASY_TPXH = 48    # tract height, pixels
_DASY_CPX = 128    # analysis-cell edge, pixels

_DASY_ORACLE = f"""
WITH px AS (
  SELECT i.i, j.j
  FROM generate_series(0, {NPX - 1}) i(i)
  CROSS JOIN generate_series(0, {NPY - 1}) j(j)
),
w AS (
  SELECT (j // {_DASY_TPXH}) * 16 + (i // {_DASY_TPXW}) AS src,
         (j // {_DASY_CPX}) * 8 + (i // {_DASY_CPX}) AS tgt,
         SUM((i * {V_MX} + j * {V_MY}) % {V_MOD}) AS w_int
  FROM px GROUP BY 1, 2
),
ws AS (SELECT src, SUM(w_int) AS w_src FROM w GROUP BY 1),
pop AS (
  SELECT t.t AS src,
         CAST(FLOOR({Z.pop_expr('t.t')} * 10000 + 0.5) AS BIGINT)
           AS pop_micro
  FROM generate_series(0, 255) t(t)
),
contrib AS (
  SELECT w.tgt,
         (pop.pop_micro * w.w_int) // ws.w_src AS cm
  FROM w
  JOIN ws ON ws.src = w.src
  JOIN pop ON pop.src = w.src
)
SELECT CAST(tgt AS BIGINT) AS cell,
       CAST(COUNT(*) AS BIGINT) AS n_src,
       ROUND(CAST(SUM(cm) AS DOUBLE) / 10000, 4) AS dasy_pop
FROM contrib GROUP BY 1
"""


@register("dasymetric_population", _DASY_ORACLE)
def dasymetric_population(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dasymetric redistribution of tract population onto analysis
    cells, raster-weighted: piece weights via the production zonal path
    (extract_at over stored tiles), per-source normalization, one
    BIGINT floor-division per piece, per-target exact-integer sum."""
    # intersection pieces: tract (ti, tj) × cell (ci = ti DIV 2, cj in
    # the tract's y-overlap range) — closed-form, pixel-edge aligned
    pieces = (
        spark.range(256)
        .selectExpr(
            "CAST(id % 16 AS INT) AS ti",
            "CAST(id DIV 16 AS INT) AS tj",
        )
        .selectExpr(
            "ti", "tj",
            "ti DIV 2 AS ci",
            f"""explode(sequence(
                 (tj * {_DASY_TPXH}) DIV {_DASY_CPX},
                 ((tj + 1) * {_DASY_TPXH} - 1) DIV {_DASY_CPX})) AS cj""",
        )
        .selectExpr(
            "tj * 16 + ti AS src",
            "cj * 8 + ci AS tgt",
            f"CAST(ti * {_DASY_TPXW} * {PW!r} AS DOUBLE) AS xmin",
            f"""CAST(GREATEST(tj * {_DASY_TPXH}, cj * {_DASY_CPX})
                * {PH!r} AS DOUBLE) AS ymin""",
            f"CAST((ti + 1) * {_DASY_TPXW} * {PW!r} AS DOUBLE) AS xmax",
            f"""CAST(LEAST((tj + 1) * {_DASY_TPXH}, (cj + 1) * {_DASY_CPX})
                * {PH!r} AS DOUBLE) AS ymax""",
        )
        .withColumn("rect_id", F.concat_ws("_", "src", "tgt"))
    )
    tiles = _tiles(spark, n_rasters=1)
    w = extract_at(tiles, pieces, rect_id="rect_id", stats=("sum",)).select(
        "rect_id", F.col("sum_val").alias("w_int")
    )
    w = w.join(F.broadcast(pieces.select("rect_id", "src", "tgt")), "rect_id")
    ws = w.groupBy("src").agg(F.sum("w_int").alias("w_src"))
    pop = spark.range(256).selectExpr(
        "id AS src",
        f"CAST(FLOOR({Z.pop_expr('id')} * 10000 + 0.5) AS BIGINT)"
        " AS pop_micro",
    )
    contrib = (
        w.join(ws, "src")
        .join(F.broadcast(pop), "src")
        .selectExpr("tgt", "(pop_micro * w_int) DIV w_src AS cm")
    )
    return contrib.groupBy("tgt").agg(
        F.count(F.lit(1)).alias("n_src"),
        F.round(F.sum("cm").cast("double") / 10000, 4).alias("dasy_pop"),
    ).select(
        F.col("tgt").cast("bigint").alias("cell"),
        F.col("n_src").cast("bigint").alias("n_src"),
        "dasy_pop",
    )


# --- morphological OPENING (erode→dilate, two chained halo exchanges) ---------
#
# terra::focal(fun=min) |> focal(fun=max): greyscale opening shaves
# speckle peaks narrower than the 3×3 element.  The point of the query
# is COMPOSITION at scale: each pass is raster.morph_tiles — a full
# tile-to-tile stencil whose output re-enters halo_joined — so opening
# costs exactly two strip-only halo shuffles (surface-sized, never a
# widened 5×5 halo or a source re-read).  Oracle: two offset-join
# MIN/MAX passes over the closed-form pixel table — an independent
# join-based formulation of the same truncated-window semantics.
# Opening is anti-extensive (opened ≤ original everywhere), so
# n_lowered counts strictly shaved pixels per tile.

_MO_OFFS = "(VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1))"

_MORPH_OPEN_ORACLE = f"""
WITH px AS MATERIALIZED (
  SELECT g1.i, g2.j, {pixel_value_sql('g1.i', 'g2.j', 0)} AS v
  FROM generate_series(0, {NPX - 1}) AS g1(i),
       generate_series(0, {NPY - 1}) AS g2(j)
),
o AS (SELECT * FROM {_MO_OFFS} AS t(di, dj)),
er AS MATERIALIZED (
  SELECT p.i, p.j, MIN(q.v) AS v
  FROM px p CROSS JOIN o JOIN px q
    ON q.i = p.i + o.di AND q.j = p.j + o.dj
  GROUP BY 1, 2
),
op AS MATERIALIZED (
  SELECT p.i, p.j, MAX(q.v) AS v
  FROM px p CROSS JOIN o JOIN er q
    ON q.i = p.i + o.di AND q.j = p.j + o.dj
  GROUP BY 1, 2
)
SELECT 'r0' AS raster_id,
       (CAST(FLOOR(p.j / {TILE}.0) AS BIGINT) * {_TNX}
        + CAST(FLOOR(p.i / {TILE}.0) AS BIGINT)) AS tile_id,
       CAST(SUM(op.v) AS BIGINT) AS open_sum,
       CAST(SUM(CASE WHEN op.v < p.v THEN 1 ELSE 0 END) AS BIGINT)
         AS n_lowered
FROM op JOIN px p ON p.i = op.i AND p.j = op.j
GROUP BY 1, 2
"""


@register("raster_morph_open", _MORPH_OPEN_ORACLE)
def raster_morph_open(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greyscale morphological opening of the raster (3×3 erosion then
    3×3 dilation), composed as two chained strip-halo stencil passes;
    per-tile opened sum + strictly-shaved pixel count."""
    import numpy as np
    import pandas as pd

    from chopin_spark.raster import morph_tiles, tile_values

    tiles = _tiles(spark, n_rasters=1)
    # halo_joined consumes its input TWICE (strip emission + the join
    # side), so the chained stencil must cut lineage between passes —
    # without it the dilate stage recomputes the whole erode pass per
    # reference (measured 7.0 s -> ~2 s at sf-independent tile count)
    eroded = morph_tiles(tiles, "erode").localCheckpoint()
    opened = morph_tiles(eroded, "dilate")

    def rollup(batches):
        for pdf in batches:
            rid, tid, osum, nlow = [], [], [], []
            for row in pdf.itertuples(index=False):
                v = np.asarray(row.values, dtype=np.int64).reshape(
                    TILE, TILE
                )
                orig = tile_values(0, int(row.tile_row), int(row.tile_col))
                rid.append(row.raster_id)
                tid.append(row.tile_id)
                osum.append(int(v.sum()))
                nlow.append(int((v < orig).sum()))
            yield pd.DataFrame(
                {
                    "raster_id": rid,
                    "tile_id": pd.Series(tid, dtype="int64"),
                    "open_sum": pd.Series(osum, dtype="int64"),
                    "n_lowered": pd.Series(nlow, dtype="int64"),
                }
            )

    return opened.mapInPandas(
        rollup,
        "raster_id string, tile_id long, open_sum long, n_lowered long",
    )


# --- 5×5 binomial (integer Gaussian) blur: two chained separable passes -------
#
# terra::focal(w = gauss(5)) analog.  Engine: two chained
# raster.conv3_binomial_tiles passes (each a strip-only halo exchange +
# a SEPARABLE rows-then-cols numpy sweep); per-pass zero beyond the
# raster edge.  Oracle: the composition inlined as one flat 81-term
# expression — for each mid offset (a2,b2) and inner offset (a1,b1),
# W[a2]W[b2]·W[a1]W[b1]·DN(i+a2+a1, j+b2+b1) gated on BOTH the mid
# pixel and the inner pixel being in-raster (exactly the per-pass
# zero-pad the chained engine applies).  No joins, no tolerance:
# binomial weights are integers, so the hash must match bit-for-bit.

_B3 = {-1: 1, 0: 2, 1: 1}  # binomial [1, 2, 1]


def _blur_terms() -> str:
    terms = []
    for a2 in (-1, 0, 1):
        for b2 in (-1, 0, 1):
            w2 = _B3[a2] * _B3[b2]
            for a1 in (-1, 0, 1):
                for b1 in (-1, 0, 1):
                    w = w2 * _B3[a1] * _B3[b1]
                    di, dj = a2 + a1, b2 + b1
                    terms.append(
                        f"(CASE WHEN i + {a2} BETWEEN 0 AND {NPX - 1}"
                        f" AND j + {b2} BETWEEN 0 AND {NPY - 1}"
                        f" AND i + {di} BETWEEN 0 AND {NPX - 1}"
                        f" AND j + {dj} BETWEEN 0 AND {NPY - 1}"
                        f" THEN {w} * {pixel_value_sql(f'(i + {di})', f'(j + {dj})', 0)}"
                        f" ELSE 0 END)"
                    )
    return " + ".join(terms)


_BLUR_ORACLE = f"""
WITH px AS (
  SELECT g1.i, g2.j,
         ({_blur_terms()}) AS bv
  FROM generate_series(0, {NPX - 1}) AS g1(i),
       generate_series(0, {NPY - 1}) AS g2(j)
)
SELECT 'r0' AS raster_id,
       (CAST(FLOOR(j / {TILE}.0) AS BIGINT) * {_TNX}
        + CAST(FLOOR(i / {TILE}.0) AS BIGINT)) AS tile_id,
       CAST(SUM(bv) AS BIGINT) AS blur_sum,
       CAST(SUM(bv * ((i * 31 + j * 17) % 97)) AS BIGINT) AS blur_chk
FROM px GROUP BY 1, 2
"""


@register("raster_blur_binomial5", _BLUR_ORACLE)
def raster_blur_binomial5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5×5 binomial (integer Gaussian) smoothing of the partitioned
    raster as TWO chained separable 3×3 passes; per-tile blurred sum
    plus a position-weighted checksum so a single transposed or
    mis-haloed pixel breaks the hash."""
    import numpy as np
    import pandas as pd

    from chopin_spark.raster import conv3_binomial_tiles

    tiles = _tiles(spark, n_rasters=1)
    # same lineage-cut rule as raster_morph_open: halo_joined consumes
    # its input twice, so cut between chained passes
    once = conv3_binomial_tiles(tiles).localCheckpoint()
    twice = conv3_binomial_tiles(once)

    def rollup(batches):
        for pdf in batches:
            rid, tid, bsum, bchk = [], [], [], []
            for row in pdf.itertuples(index=False):
                v = np.asarray(row.values, dtype=np.int64).reshape(
                    TILE, TILE
                )
                gi = int(row.tile_col) * TILE + np.arange(TILE)[None, :]
                gj = int(row.tile_row) * TILE + np.arange(TILE)[:, None]
                wt = (gi * 31 + gj * 17) % 97
                rid.append(row.raster_id)
                tid.append(row.tile_id)
                bsum.append(int(v.sum()))
                bchk.append(int((v * wt).sum()))
            yield pd.DataFrame(
                {
                    "raster_id": rid,
                    "tile_id": pd.Series(tid, dtype="int64"),
                    "blur_sum": pd.Series(bsum, dtype="int64"),
                    "blur_chk": pd.Series(bchk, dtype="int64"),
                }
            )

    return twice.mapInPandas(
        rollup,
        "raster_id string, tile_id long, blur_sum long, blur_chk long",
    )


# --- terra::rasterize parity: burn vector zones into the pixel grid -----------
#
# The missing direction of the raster↔vector bridge (extract_at reads
# raster BY vector; rasterize writes vector INTO raster): every pixel
# whose CENTER is inside its tract's octagon ring gets burned, and the
# per-tile rollup combines the burn mask with the DN raster (the
# "rasterize then mask/zonal" chain terra users run as one verb).
# Engine: per-tile mapInPandas — pixel centers → candidate tract by
# floor arithmetic → EXACT ray-cast refine (geom.core.points_in_polygon,
# the general-ring production path; a tile spans ≤4 tracts so the ring
# loop is bounded).  Oracle: the closed-form four-half-plane octagon
# predicate on regenerated pixel centers — predicate vs ray cast, two
# independent membership formulations.

from chopin_spark.queries.polygons import _CX as _OCX, _CY as _OCY  # noqa: E402
from chopin_spark.queries.polygons import octagon_ring  # noqa: E402
from chopin_spark import zones as _Z  # noqa: E402
from chopin_spark.raster import PH as _PH, PW as _PW, TILE as _RTILE  # noqa: E402


def _in_oct_xy(x: str, y: str) -> str:
    u = f"(({x}) - FLOOR(({x}) / {_Z.TRACT_W!r}) * {_Z.TRACT_W!r})"
    v = f"(({y}) - FLOOR(({y}) / {_Z.TRACT_H!r}) * {_Z.TRACT_H!r})"
    c = _OCX * _OCY
    return (
        f"(({u}) * {_OCY!r} + ({v}) * {_OCX!r} > {c!r}"
        f" AND ({_Z.TRACT_W!r} - ({u})) * {_OCY!r} + ({v}) * {_OCX!r} > {c!r}"
        f" AND ({u}) * {_OCY!r} + ({_Z.TRACT_H!r} - ({v})) * {_OCX!r} > {c!r}"
        f" AND ({_Z.TRACT_W!r} - ({u})) * {_OCY!r}"
        f" + ({_Z.TRACT_H!r} - ({v})) * {_OCX!r} > {c!r})"
    )


_RB_CX = f"((i + 0.5) * {_PW!r})"
_RB_CY = f"((j + 0.5) * {_PH!r})"

_RASTERIZE_ORACLE = f"""
WITH px AS (
  SELECT i, j, {pixel_value_sql('i', 'j', 0)} AS val
  FROM generate_series(0, {NPX - 1}) s(i),
       generate_series(0, {NPY - 1}) t(j)
),
burned AS (
  SELECT i, j, val
  FROM px WHERE {_in_oct_xy(_RB_CX, _RB_CY)}
)
SELECT 'r0' AS raster_id,
       CAST((j // {_RTILE}) * {NPX // _RTILE} + (i // {_RTILE}) AS BIGINT)
         AS tile_id,
       CAST(COUNT(*) AS BIGINT) AS n_burned,
       CAST(SUM(val) AS BIGINT) AS sum_dn,
       CAST(SUM(val * ((i * 13 + j * 7) % 31)) AS BIGINT) AS chk
FROM burned
GROUP BY 1, 2
"""


@register("raster_rasterize_octagons", _RASTERIZE_ORACLE)
def raster_rasterize_octagons(spark: SparkSession, sf_dir: str) -> DataFrame:
    """terra::rasterize analog: burn the octagon zone layer into the
    pixel grid by exact ray cast on pixel centers, rolled up with the
    DN raster per tile — map-only over stored tiles, no halo, no
    shuffle before the final tile agg."""
    import numpy as np
    import pandas as pd

    tiles = _tiles(spark, n_rasters=1)

    def burn(batches):
        from chopin_spark.geom.core import points_in_polygon

        T = _RTILE
        for pdf in batches:
            out = {"raster_id": [], "tile_id": [], "n_burned": [],
                   "sum_dn": [], "chk": []}
            for row in pdf.itertuples(index=False):
                vals = np.asarray(row.values, dtype=np.int64).reshape(T, T)
                jj, ii = np.meshgrid(
                    np.arange(T, dtype=np.int64),
                    np.arange(T, dtype=np.int64),
                    indexing="ij",
                )
                gi = row.tile_col * T + ii
                gj = row.tile_row * T + jj
                cx = (gi + 0.5) * _PW
                cy = (gj + 0.5) * _PH
                x0 = np.floor(cx / _Z.TRACT_W) * _Z.TRACT_W
                y0 = np.floor(cy / _Z.TRACT_H) * _Z.TRACT_H
                inside = np.zeros(cx.shape, dtype=bool)
                for tx0, ty0 in {
                    (float(a), float(b))
                    for a, b in zip(x0.ravel(), y0.ravel())
                }:
                    sel = (x0 == tx0) & (y0 == ty0)
                    ring = octagon_ring(
                        tx0, ty0, tx0 + _Z.TRACT_W, ty0 + _Z.TRACT_H
                    )
                    inside[sel] = points_in_polygon(
                        cx[sel], cy[sel], ring
                    )
                w = ((gi * 13 + gj * 7) % 31)
                out["raster_id"].append(row.raster_id)
                out["tile_id"].append(row.tile_id)
                out["n_burned"].append(int(inside.sum()))
                out["sum_dn"].append(int(vals[inside].sum()))
                out["chk"].append(int((vals[inside] * w[inside]).sum()))
            yield pd.DataFrame(
                {
                    "raster_id": out["raster_id"],
                    "tile_id": pd.Series(out["tile_id"], dtype="int64"),
                    "n_burned": pd.Series(out["n_burned"], dtype="int64"),
                    "sum_dn": pd.Series(out["sum_dn"], dtype="int64"),
                    "chk": pd.Series(out["chk"], dtype="int64"),
                }
            )

    schema = (
        "raster_id string, tile_id long, n_burned long,"
        " sum_dn long, chk long"
    )
    return tiles.mapInPandas(burn, schema)
