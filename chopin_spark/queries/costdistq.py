"""Cost-distance query: block-parallel Dijkstra vs a recursive-CTE
oracle.

Fixture: a deterministic 32×24 integer cost surface (costs 1..5, pure
arithmetic of the cell index — same fixture discipline as the tile
tables in queries/zonal.py) with ~4 LCG-chosen source cells.  The
engine runs :func:`chopin_spark.costdist.cost_distance` (8×8 blocks →
4×3 block graph, so convergence needs only a handful of halo-exchange
rounds); the oracle enumerates bounded-cost walks with a DuckDB
recursive CTE and takes MIN — two completely independent shortest-path
formulations that must agree integer-exactly on every cell.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark.costdist import INF, cost_distance
from chopin_spark.queries import register

W, H = 32, 24
_COST = "(1 + ((x * 7 + y * 13) % 5))"
_IS_SRC = "(((x * 31 + y * 17) % 193) = 0)"
_CAP = 800  # ≥ max true distance (asserted in tests/test_costdist.py)

_CD_ORACLE = f"""
WITH RECURSIVE cells AS (
  SELECT CAST(i % {W} AS BIGINT) AS x, CAST(i // {W} AS BIGINT) AS y
  FROM (SELECT unnest(generate_series(0, {W * H - 1})) AS i)
),
c AS (
  SELECT x, y, CAST({_COST} AS BIGINT) AS cost, {_IS_SRC} AS is_src
  FROM cells
),
e AS (
  SELECT a.x AS sx, a.y AS sy, b.x AS dx, b.y AS dy,
         a.cost + b.cost AS w
  FROM c a JOIN c b
    ON ABS(a.x - b.x) + ABS(a.y - b.y) = 1
),
sp AS (
  SELECT x, y, CAST(0 AS BIGINT) AS d FROM c WHERE is_src
  UNION
  SELECT e.dx, e.dy, sp.d + e.w
  FROM sp JOIN e ON e.sx = sp.x AND e.sy = sp.y
  WHERE sp.d + e.w <= {_CAP}
)
SELECT x, y, CAST(MIN(d) AS BIGINT) AS dist
FROM sp
GROUP BY 1, 2
"""


def build_cells(spark: SparkSession) -> DataFrame:
    return spark.range(0, W * H, 1, 8).selectExpr(
        f"CAST(id % {W} AS BIGINT) AS x",
        f"CAST(id DIV {W} AS BIGINT) AS y",
    ).selectExpr(
        "x", "y",
        f"CAST({_COST} AS BIGINT) AS cost",
        f"CASE WHEN {_IS_SRC} THEN CAST(0 AS BIGINT)"
        f" ELSE CAST({INF} AS BIGINT) END AS dist",
    )


@register("cost_distance_raster", _CD_ORACLE)
def cost_distance_raster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Accumulated-cost distance surface from the source cells (terra
    costDist semantics, 4-neighbor moves, weight = cost(a) + cost(b)).
    Engine rounds scale with block-boundary crossings of optimal paths
    (~block-graph diameter), each round one co-partitioned shuffle —
    the shape that survives a 10^10-cell surface."""
    return cost_distance(build_cells(spark), tile_w=8, tile_h=8)
