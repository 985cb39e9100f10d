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
