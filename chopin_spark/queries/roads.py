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


def road_segments(spark: SparkSession) -> DataFrame:
    """The synthetic road layer as a segment table (line_id, seg,
    ax..by): both endpoints in closed form per (road_id, k) — no join,
    no Python, reproducible in DuckDB from the identical text."""
    return (
        spark.range(1, _N_ROADS + 1)
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
