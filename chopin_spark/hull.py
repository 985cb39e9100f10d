"""Per-zone convex hulls, distributed as hull-of-hulls.

The zonal-geometry summary chopin users compute downstream of the
extract/summarize loop (terra::convHull / sf::st_convex_hull per
group). Convex hull is associative — hull(A ∪ B) = hull(hull(A) ∪
hull(B)) — so the distributed shape is a two-level reduce:

  stage 1 (mapInPandas): LOCAL hull per (zone, Arrow batch) — each
    executor reduces its millions of points per zone to the ≤ O(log n)
    expected hull vertices, with NO shuffle;
  stage 2 (applyInPandas): final hull per zone over the union of the
    tiny stage-1 vertex sets — the only shuffle moves hull vertices,
    not points.

At 100 TB the stage-2 input per zone is (number of upstream partitions
× expected local hull size ~ tens) rows regardless of fact size — the
same partial+final contract as a sum aggregate.

Coordinates are quantized to integer meters BEFORE the hull, so every
orientation test and the shoelace area are EXACT int64 (coords < 2^20
⇒ cross < 2^41): both engines agree bit-for-bit with no epsilon. The
monotone-chain turn test pops on cross ≤ 0, which removes collinear
middle vertices — the vertex-minimal hull, mirrored by the oracle's
"strictly left, or collinear within the segment box" edge rule.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _chain(pts):
    """Andrew monotone chain over unique integer tuples → CCW hull,
    collinear middles removed. len < 2 input returns as-is."""
    pts = sorted(set(pts))
    if len(pts) < 2:
        return pts

    def half(seq):
        h = []
        for p in seq:
            while len(h) >= 2 and (
                (h[-1][0] - h[-2][0]) * (p[1] - h[-2][1])
                - (h[-1][1] - h[-2][1]) * (p[0] - h[-2][0])
            ) <= 0:
                h.pop()
            h.append(p)
        return h

    lower = half(pts)
    upper = half(reversed(pts))
    return lower[:-1] + upper[:-1]


def _hull_rows(pdf: pd.DataFrame):
    """zone-grouped partial reduce: emit hull vertices only."""
    out = []
    for z, g in pdf.groupby("zone_id"):
        for x, y in _chain(list(zip(g["ix"], g["iy"]))):
            out.append((z, x, y))
    return pd.DataFrame(out, columns=["zone_id", "ix", "iy"])


def _stats(key, pdf: pd.DataFrame) -> pd.DataFrame:
    verts = _chain(list(zip(pdf["ix"], pdf["iy"])))
    m = len(verts)
    if m < 2:  # a zone with one distinct point has no hull boundary
        return pd.DataFrame(
            columns=["zone_id", "n_vertices", "area2", "perim_m"]
        )
    area2 = 0
    perim = 0.0
    for i in range(m):
        x0, y0 = verts[i]
        x1, y1 = verts[(i + 1) % m]
        area2 += x0 * y1 - y0 * x1
        perim += float((x1 - x0) ** 2 + (y1 - y0) ** 2) ** 0.5
    # m == 2 degenerates naturally: the closed loop walks the segment
    # twice (perim = 2d, area2 = 0) — the oracle's directed-edge rule
    # produces the same two edges
    return pd.DataFrame(
        [(key[0], m, area2, round(perim, 4))],
        columns=["zone_id", "n_vertices", "area2", "perim_m"],
    )


def convex_hull_stats(pts: DataFrame) -> DataFrame:
    """pts(zone_id bigint, ix bigint, iy bigint) → per-zone
    (n_vertices, area2 = exact 2×shoelace, perim_m)."""
    schema_v = "zone_id BIGINT, ix BIGINT, iy BIGINT"
    partial = pts.mapInPandas(
        lambda it: (_hull_rows(pdf) for pdf in it), schema=schema_v
    )
    return partial.groupBy("zone_id").applyInPandas(
        _stats,
        schema="zone_id BIGINT, n_vertices BIGINT, area2 BIGINT,"
        " perim_m DOUBLE",
    )


def _verts(key, pdf: pd.DataFrame) -> pd.DataFrame:
    verts = _chain(list(zip(pdf["ix"], pdf["iy"])))
    if len(verts) < 2:
        return pd.DataFrame(columns=["zone_id", "vidx", "ix", "iy"])
    return pd.DataFrame(
        [(key[0], i, x, y) for i, (x, y) in enumerate(verts)],
        columns=["zone_id", "vidx", "ix", "iy"],
    )


def convex_hull_vertices(pts: DataFrame) -> DataFrame:
    """pts(zone_id, ix, iy) → per-zone CCW hull vertices with their
    traversal index (zone_id, vidx, ix, iy) — same two-level reduce as
    convex_hull_stats, shuffle volume = hull vertices only."""
    schema_v = "zone_id BIGINT, ix BIGINT, iy BIGINT"
    partial = pts.mapInPandas(
        lambda it: (_hull_rows(pdf) for pdf in it), schema=schema_v
    )
    return partial.groupBy("zone_id").applyInPandas(
        _verts,
        schema="zone_id BIGINT, vidx BIGINT, ix BIGINT, iy BIGINT",
    )
