"""Zone-hierarchy + padded-grid queries (SURVEY.md §2.1/§2.2/§2.3).

Zones are the deterministic quadtree admin hierarchy from
`chopin_spark.zones`; assignment is floor arithmetic, so every query
here is oracle-checkable in DuckDB. All joins against the zone/grid
dimensions are broadcasts (≤256 rows); the only shuffles are the final
hash-aggregations on the zone keys — the plan that survives a 100×
scale-up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark import EXTENT, sqlexpr as sx, zones as Z
from chopin_spark.queries import register
from chopin_spark.tables import load

_X = sx.x_expr("doc_id")
_Y = sx.y_expr("doc_id")
_ZID = Z.zone_id_expr(_X, _Y)
_ZIDX = Z.zidx_expr(_X, _Y)


# --- C6 summarize_pp: point-in-polygon join + aggregate ------------------

_PP_ORACLE = f"""
SELECT {_ZID} AS zone_id,
       COUNT(*) AS n_pages,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       {sx.round4('AVG(CAST(n_chars AS DOUBLE))')} AS avg_chars,
       MIN({Z.pop_expr(_ZIDX)}) AS pop
FROM documents
GROUP BY 1
"""


@register("summarize_pp_zones", _PP_ORACLE)
def summarize_pp_zones(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 summarize_pp (/root/reference/R/processing.R:930-1096): inner
    PIP join of pages to the exhaustive tract partition + per-zone agg.
    The quadtree partition makes PIP a *function* (floor math) — no
    geometry, no UDF; the zone attribute (pop) rides along
    arithmetically, replacing the reference's `left_join` back to
    polygons (/root/reference/R/processing.R:1082-1093)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            F.expr(_ZID).alias("zone_id"),
            F.expr(Z.pop_expr(_ZIDX)).alias("pop_row"),
            F.col("n_chars"),
        )
        .groupBy("zone_id")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("n_chars").alias("sum_chars"),
            F.round(F.avg(F.col("n_chars").cast("double")), 4).alias("avg_chars"),
            F.min("pop_row").alias("pop"),
        )
    )


# --- R2 par_hierarchy: left-prefix key partitioning ----------------------

_HIER_ORACLE = f"""
SELECT SUBSTRING({_ZID}, 1, {Z.STATE_LEN}) AS state,
       SUBSTRING({_ZID}, 1, {Z.COUNTY_LEN}) AS county,
       COUNT(*) AS n_pages,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       COUNT(DISTINCT lang) AS n_langs
FROM documents
GROUP BY 1, 2
"""


@register("par_hierarchy_county", _HIER_ORACLE)
def par_hierarchy_county(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R2 par_hierarchy (/root/reference/R/scale_process.R:375-596):
    the partition key is the *left prefix* of the hierarchical region id
    (`substr(vec_regions_id, 1, length_left)`,
    /root/reference/R/scale_process.R:460-462). In Spark the prefix is a
    column and the per-prefix fan-out is one hash aggregation — the
    reference's per-task whole-input re-read disappears."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.expr(_ZID).alias("zone_id"), "n_chars", "lang")
        .withColumn("state", F.substring("zone_id", 1, Z.STATE_LEN))
        .withColumn("county", F.substring("zone_id", 1, Z.COUNTY_LEN))
        .groupBy("state", "county")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
    )


# --- C5 summarize_aw: area-weighted interpolation (polygon overlay) ------
#
# Source polygons: the 8×6 analysis grid (cells 100km × 100km) carrying
# v = page count per cell. Target polygons: the 64 counties (100km ×
# 75km). Rect×rect overlay → exact arithmetic intersection areas;
# x-edges align so overlap exists only for kx == county_x.

_NXC, _NYC = 8, 6
_CELLW = (EXTENT[2] - EXTENT[0]) / _NXC  # 100_000
_CELLH = (EXTENT[3] - EXTENT[1]) / _NYC  # 100_000
_CTYH = (EXTENT[3] - EXTENT[1]) / 8  # 75_000

_AW_ORACLE = f"""
WITH cellcnt AS (
  SELECT {sx.grid_cell_expr(_X, _Y, _NXC, _NYC)} AS cell, COUNT(*) AS v
  FROM documents GROUP BY 1
),
cells AS (
  SELECT i AS cell,
         i % {_NXC} AS kx,
         CAST(FLOOR(i / {_NXC}.0) AS BIGINT) AS ky,
         COALESCE(v, 0) AS v
  FROM generate_series(0, {_NXC * _NYC - 1}) t(i)
  LEFT JOIN cellcnt ON cellcnt.cell = i
),
counties AS (
  SELECT i % 8 AS cxi, CAST(FLOOR(i / 8.0) AS BIGINT) AS cyi
  FROM generate_series(0, 63) t(i)
),
ov AS (
  SELECT cxi, cyi, v,
         GREATEST(0.0,
           LEAST((cyi + 1) * {_CTYH!r}, (ky + 1) * {_CELLH!r})
           - GREATEST(cyi * {_CTYH!r}, ky * {_CELLH!r})) * {_CELLW!r} AS area
  FROM counties JOIN cells ON kx = cxi
)
SELECT (LPAD(CAST(CAST(FLOOR(cyi / 4.0) AS BIGINT) * 2
              + CAST(FLOOR(cxi / 4.0) AS BIGINT) AS STRING), 2, '0')
        || LPAD(CAST((cyi % 4) * 4 + (cxi % 4) AS STRING), 3, '0')) AS county,
       ROUND(SUM(area * v) / SUM(area), 4) AS aw_pages,
       ROUND(SUM(v * area / {_CELLW * _CELLH!r}), 4) AS aw_pages_sum
FROM ov
WHERE area > 0
GROUP BY 1
"""


@register("summarize_aw_counties", _AW_ORACLE)
def summarize_aw_counties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 summarize_aw (/root/reference/R/processing.R:770-897):
    area-weighted interpolation of per-cell page density onto counties.
    Overlay join = broadcast of the 48-cell dimension against the
    64-county dimension (both tiny); intersection areas are exact rect
    arithmetic (the general-polygon path uses
    chopin_spark.geom.core.clip_polygon_rect inside a pandas UDF).
    Weighted mean = sum(area*v)/sum(area) — chopin's intensive branch
    (`st_interpolate_aw(extensive=FALSE)`)."""
    docs = load(spark, sf_dir, "documents")
    counts = (
        docs.select(
            F.expr(sx.grid_cell_expr(_X, _Y, _NXC, _NYC)).alias("cell")
        )
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("v"))
    )
    cells = (
        spark.range(_NXC * _NYC)
        .withColumnRenamed("id", "cell")
        .join(counts, "cell", "left")
        .fillna(0, subset=["v"])
        .withColumn("kx", F.col("cell") % _NXC)
        .withColumn("ky", F.floor(F.col("cell") / _NXC))
    )
    counties = (
        spark.range(64)
        .withColumn("cxi", F.col("id") % 8)
        .withColumn("cyi", F.floor(F.col("id") / 8))
        .drop("id")
    )
    ov = counties.join(F.broadcast(cells), F.col("kx") == F.col("cxi")).withColumn(
        "area",
        F.greatest(
            F.lit(0.0),
            F.least((F.col("cyi") + 1) * _CTYH, (F.col("ky") + 1) * _CELLH)
            - F.greatest(F.col("cyi") * _CTYH, F.col("ky") * _CELLH),
        )
        * _CELLW,
    )
    county_code = F.concat(
        F.lpad(
            (F.floor(F.col("cyi") / 4) * 2 + F.floor(F.col("cxi") / 4)).cast(
                "string"
            ),
            2,
            "0",
        ),
        F.lpad(
            ((F.col("cyi") % 4) * 4 + (F.col("cxi") % 4)).cast("string"), 3, "0"
        ),
    )
    return (
        ov.filter(F.col("area") > 0)
        .groupBy(county_code.alias("county"))
        .agg(
            # intensive: weighted mean (st_interpolate_aw extensive=FALSE)
            F.round(
                F.sum(F.col("area") * F.col("v")) / F.sum("area"), 4
            ).alias("aw_pages"),
            # extensive: apportioned sum — each cell's count split by the
            # fraction of the cell each county covers
            # (st_interpolate_aw extensive=TRUE,
            # /root/reference/R/processing.R:886-894)
            F.round(
                F.sum(F.col("v") * F.col("area") / (_CELLW * _CELLH)), 4
            ).alias("aw_pages_sum"),
        )
    )


# --- P1 par_pad_grid: padded-cell membership ------------------------------
#
# Every cell of the 8×6 grid gets a square-mitre padded twin (+pad on
# each side). Points fall in exactly one ORIGINAL cell (half-open floor
# math) and in up to 4 PADDED cells. The scalable candidate set is the
# 3×3 neighbor stencil (pad < cell size), not a theta-join.

_PAD = 30_000.0

_PADG_ORACLE = f"""
WITH pts AS (
  SELECT {_X} AS x, {_Y} AS y FROM documents
),
cells AS (
  SELECT i % {_NXC} AS ix, CAST(FLOOR(i / {_NXC}.0) AS BIGINT) AS iy
  FROM generate_series(0, {_NXC * _NYC - 1}) t(i)
)
SELECT (iy * {_NXC} + ix) AS cgridid,
       COUNT(*) FILTER (
         WHERE x >= ix * {_CELLW!r} AND x < (ix + 1) * {_CELLW!r}
           AND y >= iy * {_CELLH!r} AND y < (iy + 1) * {_CELLH!r}
       ) AS n_core,
       COUNT(*) AS n_padded
FROM pts JOIN cells
  ON x >= ix * {_CELLW!r} - {_PAD!r} AND x < (ix + 1) * {_CELLW!r} + {_PAD!r}
 AND y >= iy * {_CELLH!r} - {_PAD!r} AND y < (iy + 1) * {_CELLH!r} + {_PAD!r}
GROUP BY 1
"""


@register("par_pad_grid_membership", _PADG_ORACLE)
def par_pad_grid_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 par_pad_grid (/root/reference/R/gridding.R:102-223): padded
    cells are the original cells buffered by `padding` with square caps
    / mitre joins (:192-198) — for axis-aligned cells that is exact bbox
    expansion. Membership in the padded partition is computed by a 3×3
    neighbor-stencil explode + containment filter (pure column math, no
    theta join: at 100 TB the stencil join is an equi-join on cgridid).
    n_core counts half-open original-cell membership: every point is
    core in exactly one cell, so sum(n_core) == table count — the
    invariant behind dedup-free padded execution."""
    docs = load(spark, sf_dir, "documents")
    pts = docs.select(F.expr(_X).alias("x"), F.expr(_Y).alias("y"))
    base = pts.select(
        "x",
        "y",
        F.floor(F.col("x") / _CELLW).alias("ix0"),
        F.floor(F.col("y") / _CELLH).alias("iy0"),
    )
    offsets = F.array([F.lit(v) for v in (-1, 0, 1)])
    exploded = (
        base.withColumn("dx", F.explode(offsets))
        .withColumn("dy", F.explode(offsets))
        .withColumn("ix", F.col("ix0") + F.col("dx"))
        .withColumn("iy", F.col("iy0") + F.col("dy"))
        .filter(
            (F.col("ix") >= 0)
            & (F.col("ix") < _NXC)
            & (F.col("iy") >= 0)
            & (F.col("iy") < _NYC)
        )
        .filter(
            (F.col("x") >= F.col("ix") * _CELLW - _PAD)
            & (F.col("x") < (F.col("ix") + 1) * _CELLW + _PAD)
            & (F.col("y") >= F.col("iy") * _CELLH - _PAD)
            & (F.col("y") < (F.col("iy") + 1) * _CELLH + _PAD)
        )
    )
    is_core = (F.col("dx") == 0) & (F.col("dy") == 0)
    return (
        exploded.groupBy((F.col("iy") * _NXC + F.col("ix")).alias("cgridid"))
        .agg(
            F.count(F.when(is_core, 1)).alias("n_core"),
            F.count(F.lit(1)).alias("n_padded"),
        )
    )
