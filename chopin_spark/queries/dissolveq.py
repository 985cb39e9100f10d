"""Polygon dissolve (union-by-attribute) as distributed edge
cancellation — the vector-aggregate verb (sf::st_union / terra
aggregate-by-attribute) chopin applies when it coalesces tract
polygons into parent regions (/root/reference/R/gridding.R merge step
and the dissolve `summarize(n_merged = n())` count).

On the 16×16 tract lattice a CONCAVE deterministic subset of tracts is
dissolved per state.  Every selected tract emits its 4 lattice edges
under a canonical key; an edge shared by two selected tracts of the
same state appears twice and cancels, so the dissolved region's
exterior perimeter is exactly the edges appearing once.  All carriers
are integers (edge counts, cell counts); lengths multiply in as exact
constants at the end.

Scale shape: one explode (×4) + one hash agg on the edge key + one
per-state agg — combiner-friendly, no window, no geometry library; at
10^8 polygons the edge-key shuffle is the only wide stage and AQE
handles any hot attribute value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark.queries import register
from chopin_spark.zones import TRACT_H, TRACT_NX, TRACT_NY, TRACT_W

# deterministic concave subset: keeps ~4/5 of tracts, punches holes
_SEL = "((tx * 3 + ty * 7) % 5) <> 0"

_DISSOLVE_ORACLE = f"""
WITH tracts AS (
  SELECT i % {TRACT_NX} AS tx, i // {TRACT_NX} AS ty
  FROM generate_series(0, {TRACT_NX * TRACT_NY - 1}) s(i)
),
sel AS (
  SELECT tx, ty, (ty // 8) * 2 + (tx // 8) AS state
  FROM tracts WHERE {_SEL}
),
edges AS (
  SELECT state, typ, ex, ey FROM sel, (VALUES
    ('V', 0, 0), ('V', 1, 0), ('H', 0, 0), ('H', 0, 1)
  ) d(typ, dx, dy),
  LATERAL (SELECT tx + d.dx AS ex, ty + d.dy AS ey) c
),
boundary AS (
  SELECT state, typ, ex, ey, COUNT(*) AS cnt
  FROM edges GROUP BY 1, 2, 3, 4
  HAVING COUNT(*) = 1
)
SELECT b.state,
       ANY_VALUE(n.n_tracts) AS n_tracts,
       CAST(SUM(CASE WHEN typ = 'V' THEN 1 ELSE 0 END) AS BIGINT) AS n_v_edges,
       CAST(SUM(CASE WHEN typ = 'H' THEN 1 ELSE 0 END) AS BIGINT) AS n_h_edges,
       ROUND(SUM(CASE WHEN typ = 'V' THEN {TRACT_H!r} ELSE {TRACT_W!r} END), 2)
         AS perimeter
FROM boundary b
JOIN (SELECT state, COUNT(*) AS n_tracts FROM sel GROUP BY 1) n
  ON b.state = n.state
GROUP BY 1
"""


@register("dissolve_tracts_by_state", _DISSOLVE_ORACLE)
def dissolve_tracts_by_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dissolve a concave tract subset per state; exterior perimeter by
    exact integer edge cancellation (interior edges appear twice and
    drop).  The checksum-grade output (edge counts by orientation +
    tract count) pins the union GEOMETRY, not just its area."""
    tracts = spark.range(TRACT_NX * TRACT_NY).selectExpr(
        f"CAST(id % {TRACT_NX} AS BIGINT) AS tx",
        f"CAST(id DIV {TRACT_NX} AS BIGINT) AS ty",
    )
    sel = tracts.filter(F.expr(_SEL)).withColumn(
        "state", (F.col("ty") / 8).cast("long") * 2
        + (F.col("tx") / 8).cast("long")
    )
    edge = F.explode(
        F.array(
            F.struct(F.lit("V").alias("typ"), F.col("tx").alias("ex"),
                     F.col("ty").alias("ey")),
            F.struct(F.lit("V").alias("typ"),
                     (F.col("tx") + 1).alias("ex"),
                     F.col("ty").alias("ey")),
            F.struct(F.lit("H").alias("typ"), F.col("tx").alias("ex"),
                     F.col("ty").alias("ey")),
            F.struct(F.lit("H").alias("typ"), F.col("tx").alias("ex"),
                     (F.col("ty") + 1).alias("ey")),
        )
    )
    boundary = (
        sel.select("state", edge.alias("e"))
        .select("state", "e.typ", "e.ex", "e.ey")
        .groupBy("state", "typ", "ex", "ey")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") == 1)
    )
    n_tracts = sel.groupBy("state").agg(
        F.count(F.lit(1)).alias("n_tracts")
    )
    return (
        boundary.join(n_tracts, "state")
        .groupBy("state")
        .agg(
            F.first("n_tracts").alias("n_tracts"),
            F.sum(F.when(F.col("typ") == "V", 1).otherwise(0))
            .cast("long").alias("n_v_edges"),
            F.sum(F.when(F.col("typ") == "H", 1).otherwise(0))
            .cast("long").alias("n_h_edges"),
            F.round(
                F.sum(
                    F.when(F.col("typ") == "V", F.lit(TRACT_H))
                    .otherwise(F.lit(TRACT_W))
                ),
                2,
            ).alias("perimeter"),
        )
    )
