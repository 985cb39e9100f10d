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


# --- D8 flow accumulation (terra::flowAccumulation analog) -------------------
#
# DEM = an exact permutation of 0..W·H-1 (z = ((x + y·W)·389) mod 768,
# gcd(389, 768) = 1 → all-distinct elevations, so steepest descent is
# a forest).  The D8 target is pure column math — z of any neighbor is
# the same closed form, so the argmax-with-tiebreak compiles to a CASE
# chain shared verbatim by both engines; no join, no geometry.
# Engine: chopin_spark.flowacc.flow_accumulation (block-local
# topological sums + halo rounds).  Oracle: recursive-CTE downstream
# walks from every cell; COUNT(*) per visited cell == upstream count
# incl. self — an independent formulation of the same accumulation.

from chopin_spark.flowacc import D8, flow_accumulation  # noqa: E402


def _zf(x: str, y: str) -> str:
    return f"((({x}) + ({y}) * {W}) * 389) % {W * H}"


def _d8_exprs(x: str = "x", y: str = "y") -> tuple[str, str]:
    """(fx_expr, fy_expr): steepest-descent D8 target, NULL at pits.

    Argmax-with-tiebreak as ONE GREATEST over encoded candidates
    ``score·8 + (7 − i)`` — max score wins, and on equal scores the
    larger (7 − i), i.e. the SMALLER neighbor index, wins: exactly
    d8_downstream's first-max rule.  Invalid candidates encode < 0
    (any valid drop ≥ 1 encodes ≥ 40), so ``g < 0`` means pit.  The
    naive form (compare each score against GREATEST, then CASE on the
    winner) expanded to a ~10^3-node expression whose whole-stage
    codegen COMPILE took ~15 s per distinct plan — the encoded argmax
    is ~30 small terms."""
    enc = []
    for i, (dx, dy, wt) in enumerate(D8):
        nx_, ny_ = f"(({x}) + {dx})", f"(({y}) + {dy})"
        inb = (
            f"({nx_} >= 0 AND {nx_} < {W} AND {ny_} >= 0 AND {ny_} < {H})"
        )
        drop = f"(({_zf(x, y)}) - ({_zf(nx_, ny_)}))"
        enc.append(
            f"(CASE WHEN {inb} AND {drop} > 0"
            f" THEN {drop} * {wt * 8} + {7 - i} ELSE {(7 - i) - 8} END)"
        )
    g = "GREATEST(" + ", ".join(enc) + ")"
    # simple-CASE on the encoding: g appears ONCE per output column
    # (negative g → no WHEN matches → NULL → pit), keeping the total
    # expression ~30 terms
    # pit safety: an all-invalid cell has g == -1 exactly (candidate
    # i=0 always encodes 7-0-8 = -1 and is the largest invalid), so
    # g % 8 == -1 matches no WHEN arm → NULL; no extra guard needed
    out = []
    for deltas, base in ((tuple(d[0] for d in D8), x),
                         (tuple(d[1] for d in D8), y)):
        case = f"(CASE {g} % 8 " + " ".join(
            f"WHEN {7 - i} THEN ({base}) + {dv}"
            for i, dv in enumerate(deltas)
        ) + " END)"
        out.append(case)
    return out[0], out[1]


_FX, _FY = _d8_exprs()

_FLOW_ORACLE = f"""
WITH RECURSIVE cells AS (
  SELECT CAST(i % {W} AS BIGINT) AS x, CAST(i // {W} AS BIGINT) AS y
  FROM (SELECT unnest(generate_series(0, {W * H - 1})) AS i)
),
f AS (
  SELECT x, y, CAST({_FX} AS BIGINT) AS fx, CAST({_FY} AS BIGINT) AS fy
  FROM cells
),
walk AS (
  SELECT x AS sx, y AS sy, x, y FROM f
  UNION ALL
  SELECT w.sx, w.sy, f.fx, f.fy
  FROM walk w JOIN f ON f.x = w.x AND f.y = w.y
  WHERE f.fx IS NOT NULL
)
SELECT x, y, CAST(COUNT(*) AS BIGINT) AS acc
FROM walk
GROUP BY 1, 2
"""


@register("flow_accumulation_d8", _FLOW_ORACLE)
def flow_accumulation_d8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upstream-drainage count per cell over the deterministic DEM.
    Engine rounds scale with block-boundary crossings of drainage
    paths (flowacc.py); the in-plan D8 target derivation is shared
    column math — zero joins before the iterative stage."""
    cells = spark.range(0, W * H, 1, 8).selectExpr(
        f"CAST(id % {W} AS BIGINT) AS x",
        f"CAST(id DIV {W} AS BIGINT) AS y",
    ).selectExpr(
        "x", "y",
        f"CAST({_zf('x', 'y')} AS BIGINT) AS z",
        f"CAST({_FX} AS BIGINT) AS fx",
        f"CAST({_FY} AS BIGINT) AS fy",
    )
    return flow_accumulation(cells, tile_w=8, tile_h=8)


# --- viewshed (terra::viewshed analog, integer-exact line-of-sight) ----------
#
# Visibility of every cell from a tower over the same DEM: cell c is
# blocked iff some intermediate sample on the straight line to the
# tower rises above the sight line.  All comparisons are cleared of
# divisions — z_k · 2m vs 2m·z_t + (z_c − z_t)·2k — so the visibility
# mask is bit-identical in both engines; the only division is the
# half-up DDA coordinate rounding FLOOR((2·k·d + m) / (2m)), an
# IEEE-exact quotient of small integers.  Per-cell work is bounded by
# the line length (explode of 1..m−1 steps): map-only, no join — at a
# 10^5-wide raster the same mask runs as tiled R2 sweeps; this is the
# exact-oracle-checkable core.

_VS_TX, _VS_TY, _VS_TH = 5, 5, 40  # tower cell + mast height


def _vs_sql(seq: str, grid_src: str = "grid_xy") -> str:
    zt = f"({_zf(str(_VS_TX), str(_VS_TY))} + {_VS_TH})"
    m = f"GREATEST(ABS(x - {_VS_TX}), ABS(y - {_VS_TY}))"
    xk = (
        f"({_VS_TX} + CAST(FLOOR((2 * k * (x - {_VS_TX}) + m)"
        f" / (2.0 * m)) AS BIGINT))"
    )
    yk = (
        f"({_VS_TY} + CAST(FLOOR((2 * k * (y - {_VS_TY}) + m)"
        f" / (2.0 * m)) AS BIGINT))"
    )
    return f"""
WITH cells AS (
  SELECT x, y, CAST({_zf('x', 'y')} AS BIGINT) AS zc,
         CAST({m} AS BIGINT) AS m
  FROM {grid_src}
),
steps AS (
  SELECT x, y, zc, m, {seq} AS k
  FROM cells WHERE m >= 2
),
blockers AS (
  SELECT DISTINCT s.x, s.y
  FROM (
    SELECT x, y, zc, m, k, {xk} AS sx, {yk} AS sy FROM steps
  ) s
  WHERE NOT (s.sx = s.x AND s.sy = s.y)
    AND NOT (s.sx = {_VS_TX} AND s.sy = {_VS_TY})
    AND ({_zf('s.sx', 's.sy')}) * 2 * s.m
        >= 2 * s.m * {zt} + (s.zc - {zt}) * 2 * s.k
)
SELECT c.x, c.y,
       CAST(CASE WHEN b.x IS NULL THEN 1 ELSE 0 END AS BIGINT) AS visible
FROM cells c
LEFT JOIN blockers b ON b.x = c.x AND b.y = c.y
"""


_VS_GRID_DUCK = f"""(
  SELECT CAST(i % {W} AS BIGINT) AS x, CAST(i // {W} AS BIGINT) AS y
  FROM (SELECT unnest(generate_series(0, {W * H - 1})) AS i)
)"""

_VS_ORACLE = _vs_sql(
    "UNNEST(generate_series(1, m - 1))", grid_src=_VS_GRID_DUCK
)


@register("viewshed_d8", _VS_ORACLE)
def viewshed_d8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell visibility mask from the tower cell (integer-exact
    sight-line test, division-free comparisons)."""
    spark.range(0, W * H, 1, 8).selectExpr(
        f"CAST(id % {W} AS BIGINT) AS x",
        f"CAST(id DIV {W} AS BIGINT) AS y",
    ).createOrReplaceTempView("grid_xy")
    return spark.sql(_vs_sql("explode(sequence(1, CAST(m - 1 AS INT)))"))


# --- hillshade (terra::shade analog, trig-free interior form) ----------------
#
# Classic hillshade is cos/sin/atan2 of slope and aspect; those
# transcendentals are not bit-identical across engines.  The identical
# quantity falls out of pure vector algebra: shade = max(0, n̂ · ŝ)
# where n = (−gx, −gy, 1) is the surface normal from the central-
# difference gradients and ŝ is the LITERAL sun unit vector (its
# trig runs once in Python, baked into the SQL text).  Division and
# SQRT are IEEE-correctly-rounded, so the shared text hashes exactly.
# Interior cells only (the halo-exchange boundary treatment lives in
# raster_terrain_horn; this is the closed-form-checkable core).

import math as _math  # noqa: E402

_HS_AZ, _HS_ALT = _math.radians(315.0), _math.radians(45.0)
_HS_SX = _math.cos(_HS_ALT) * _math.sin(_HS_AZ)
_HS_SY = _math.cos(_HS_ALT) * _math.cos(_HS_AZ)
_HS_SZ = _math.sin(_HS_ALT)


def _hs_sql(grid_src: str = "grid_xy") -> str:
    gx = f"((({_zf('(x + 1)', 'y')}) - ({_zf('(x - 1)', 'y')})) / 2.0)"
    gy = f"((({_zf('x', '(y + 1)')}) - ({_zf('x', '(y - 1)')})) / 2.0)"
    dot = f"((0.0 - {gx}) * {_HS_SX!r} + (0.0 - {gy}) * {_HS_SY!r} + {_HS_SZ!r})"
    norm = f"SQRT({gx} * {gx} + {gy} * {gy} + 1.0)"
    return f"""
SELECT x, y,
       ROUND(GREATEST({dot} / {norm}, 0.0), 4) AS shade
FROM {grid_src}
WHERE x >= 1 AND x < {W - 1} AND y >= 1 AND y < {H - 1}
"""


_HS_ORACLE = _hs_sql(grid_src=_VS_GRID_DUCK)


@register("raster_hillshade", _HS_ORACLE)
def raster_hillshade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell hillshade (sun az 315°, alt 45°) via the normal-vector
    dot product — sqrt/divide only, bit-exact shared SQL."""
    spark.range(0, W * H, 1, 8).selectExpr(
        f"CAST(id % {W} AS BIGINT) AS x",
        f"CAST(id DIV {W} AS BIGINT) AS y",
    ).createOrReplaceTempView("grid_xy")
    return spark.sql(_hs_sql())


# --- raster patches (terra::patches analog: clumps of masked cells) ----------
#
# terra::patches labels 4-connected regions of non-NA cells.  The mask
# here is the deterministic speckle `z % 7 < 3` over the DEM permutation
# (density 3/7 ≈ 0.43 — below the 4-connectivity percolation threshold,
# so the surface breaks into MANY patches: labeling, not one blob).
# The cell→cell adjacency is a pure projection (the mask is closed-form
# in the cell id, so "right/up neighbor also masked" needs NO self-join
# on the raster — the 100-TB shape: edges stream out of the scan), and
# labeling runs through the proven alternating-star components engine
# (O(log n) rounds regardless of snake-shaped patch diameters).
# Oracle: DuckDB recursive-CTE transitive closure over the same
# closed-form edge list — an independent algorithm at the same fixpoint.

_PATCH_Z = f"((n * 389) % {W * H})"
_PATCH_MASK = f"({_PATCH_Z} % 7 < 3)"


def _patch_mask_of(expr: str) -> str:
    """The speckle mask as a closed form of an arbitrary cell-id expr."""
    return f"(((({expr}) * 389) % {W * H}) % 7 < 3)"

_PATCH_ORACLE = f"""
WITH RECURSIVE cells AS (
  SELECT CAST(g.n AS BIGINT) AS n
  FROM generate_series(0, {W * H - 1}) AS g(n)
  WHERE {_PATCH_MASK}
),
e0 AS (
  SELECT a.n AS src, b.n AS dst
  FROM cells a JOIN cells b ON b.n = a.n + 1
  WHERE a.n % {W} < {W - 1}
  UNION ALL
  SELECT a.n, b.n
  FROM cells a JOIN cells b ON b.n = a.n + {W}
),
edges AS (
  SELECT src, dst FROM e0
  UNION
  SELECT dst, src FROM e0
),
reach AS (
  SELECT n AS a, n AS b FROM cells
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
),
comp AS (
  SELECT a AS n, MIN(b) AS patch_id FROM reach GROUP BY a
)
SELECT patch_id,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM((n * 389) % {W * H}) AS BIGINT) AS sum_z
FROM comp
GROUP BY 1
"""


@register("raster_patches", _PATCH_ORACLE)
def raster_patches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-connected patch labeling of the masked DEM (terra::patches):
    block-local union-find + seam-graph merge (chopin_spark.rastercc —
    one cell pass; iteration only on the perimeter-sized label graph);
    per-patch cell count and z sum.  Global-star equivalence is pinned
    in tests/test_rastercc.py."""
    from chopin_spark.rastercc import raster_components

    cells = (
        spark.range(0, W * H, 1, 8)
        .selectExpr("id AS n")
        .filter(F.expr(_PATCH_MASK))
        .withColumn("grp", F.lit(0).cast("long"))
    )
    cc = raster_components(cells, W, H, tile_w=8, tile_h=8)
    return (
        cc.withColumn("z", F.expr(f"(n * 389) % {W * H}"))
        .groupBy(F.col("comp_id").alias("patch_id"))
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("z").alias("sum_z"),
        )
    )


# --- raster → vector polygonize (terra::as.polygons dissolve=TRUE) -----------
#
# as.polygons dissolves SAME-VALUED 4-connected cells into one polygon
# per region (/root/reference/R/gridding.R — grid-from-raster path uses
# terra::as.polygons).  Class surface: z % 4 over the DEM permutation
# (four interleaved classes, every cell classified — labeling must
# separate touching regions of DIFFERENT classes, not just mask/no-mask
# like raster_patches).  Exact vector measures without any geometry
# code: area = n_cells (unit cells), and since every same-class
# adjacency is internal to its patch by construction,
#   perimeter = 4·n_cells − 2·n_internal_adjacencies
# is an exact integer.  Adjacency is again a pure scan projection
# (class is closed-form in the cell id); the one extra shuffle joins
# the directed adjacency list to patch labels for the perimeter count.

def _poly_class_of(expr: str) -> str:
    return f"(((({expr}) * 389) % {W * H}) % 4)"


_POLY_ORACLE = f"""
WITH RECURSIVE cells AS (
  SELECT CAST(g.n AS BIGINT) AS n, {_poly_class_of('g.n')} AS cls
  FROM generate_series(0, {W * H - 1}) AS g(n)
),
e0 AS (
  SELECT a.n AS src, b.n AS dst
  FROM cells a JOIN cells b ON b.n = a.n + 1 AND b.cls = a.cls
  WHERE a.n % {W} < {W - 1}
  UNION ALL
  SELECT a.n, b.n
  FROM cells a JOIN cells b ON b.n = a.n + {W} AND b.cls = a.cls
),
edges AS (
  SELECT src, dst FROM e0
  UNION
  SELECT dst, src FROM e0
),
reach AS (
  SELECT n AS a, n AS b FROM cells
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
),
comp AS (
  SELECT a AS n, MIN(b) AS patch_id FROM reach GROUP BY a
),
sizes AS (
  SELECT patch_id, CAST(COUNT(*) AS BIGINT) AS n_cells
  FROM comp GROUP BY 1
),
intr AS (
  SELECT c.patch_id, COUNT(*) AS ni
  FROM e0 JOIN comp c ON c.n = e0.src
  GROUP BY 1
)
SELECT s.patch_id,
       {_poly_class_of('s.patch_id')} AS cls,
       s.n_cells,
       CAST(4 * s.n_cells - 2 * COALESCE(i.ni, 0) AS BIGINT) AS perim
FROM sizes s LEFT JOIN intr i ON i.patch_id = s.patch_id
"""


@register("raster_polygonize", _POLY_ORACLE)
def raster_polygonize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dissolved raster→vector regions (terra::as.polygons): per
    same-class 4-connected region, exact unit-cell area and exposed-
    edge perimeter — block-local union-find + seam merge
    (chopin_spark.rastercc) over the class surface."""
    from chopin_spark.rastercc import raster_components

    cls_r = _poly_class_of("n + 1")
    cls_u = _poly_class_of(f"n + {W}")
    cls_n = _poly_class_of("n")
    cells = spark.range(0, W * H, 1, 8).selectExpr(
        "id AS n", f"CAST({_poly_class_of('id')} AS BIGINT) AS grp"
    )
    cc = raster_components(cells, W, H, tile_w=8, tile_h=8).localCheckpoint()
    sizes = cc.groupBy(F.col("comp_id").alias("patch_id")).agg(
        F.count(F.lit(1)).alias("n_cells")
    )
    # directed same-class adjacency for the perimeter count (scan
    # projection, as in the oracle's e0)
    directed = spark.range(0, W * H, 1, 8).selectExpr("id AS n").selectExpr(
        "n",
        f"""explode(filter(array(
              CASE WHEN n % {W} < {W - 1} AND {cls_r} = {cls_n}
                   THEN n + 1 END,
              CASE WHEN n + {W} < {W * H} AND {cls_u} = {cls_n}
                   THEN n + {W} END), x -> x IS NOT NULL)) AS b""",
    )
    intr = (
        directed.join(cc, "n")
        .groupBy(F.col("comp_id").alias("patch_id"))
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    return (
        sizes.join(intr, "patch_id", "left")
        .selectExpr(
            "patch_id",
            f"{_poly_class_of('patch_id')} AS cls",
            "n_cells",
            "CAST(4 * n_cells - 2 * COALESCE(ni, 0) AS BIGINT) AS perim",
        )
    )


# --- contour census (terra::as.contour analog, marching squares) -------------
#
# Isolines of the DEM at half-integer levels (z is an integer
# permutation, so `z > level` never ties and every cell's marching-
# squares case is unambiguous).  Saddles (cases 5/10) use a FIXED
# documented pairing — the same convention in both engines, so the
# census and interpolated length agree bit-for-bit.  Per (cell, level)
# work is a pure projection over the closed-form corner values (no
# join); lengths are quantized with FLOOR(len·2^20 + 0.5) BEFORE the
# sum — FLOOR of a bit-identical double is deterministic (no engine
# tie-rule in play, unlike ROUND), so the int64 sum is shuffle-order-
# free and exact.  At a 10^10-cell DEM this is one map + one 3-key agg.

_CT_LEVELS2 = (383, 767, 1151)  # 2*level: half-integer isolines
_CT_Q = 1 << 20


def _contour_sql(seq_levels: str, grid_src: str = "grid_xy") -> str:
    z00, z10 = _zf("x", "y"), _zf("(x + 1)", "y")
    z01, z11 = _zf("x", "(y + 1)"), _zf("(x + 1)", "(y + 1)")
    # edge crossings in cell-local coords (unit spacing)
    ends = {
        "B": ("tb", "0.0"),
        "R": ("1.0", "tr"),
        "T": ("tt", "1.0"),
        "L": ("0.0", "tl"),
    }
    segs = {
        1: [("L", "B")], 2: [("B", "R")], 3: [("L", "R")],
        4: [("T", "R")], 5: [("L", "B"), ("T", "R")], 6: [("B", "T")],
        7: [("L", "T")], 8: [("L", "T")], 9: [("B", "T")],
        10: [("B", "R"), ("L", "T")], 11: [("T", "R")],
        12: [("L", "R")], 13: [("B", "R")], 14: [("L", "B")],
    }

    def seg_len(e1: str, e2: str) -> str:
        (x1, y1), (x2, y2) = ends[e1], ends[e2]
        return (
            f"SQRT((({x1}) - ({x2})) * (({x1}) - ({x2}))"
            f" + (({y1}) - ({y2})) * (({y1}) - ({y2})))"
        )

    len_arms = " ".join(
        f"WHEN {i} THEN " + " + ".join(seg_len(a, b) for a, b in prs)
        for i, prs in segs.items()
    )
    nseg_arms = " ".join(
        f"WHEN {i} THEN {len(prs)}" for i, prs in segs.items()
    )
    return f"""
WITH base AS (
  SELECT x, y,
         CAST({z00} AS DOUBLE) AS z00, CAST({z10} AS DOUBLE) AS z10,
         CAST({z01} AS DOUBLE) AS z01, CAST({z11} AS DOUBLE) AS z11
  FROM {grid_src}
  WHERE x < {W - 1} AND y < {H - 1}
),
lv AS (
  SELECT x, y, z00, z10, z01, z11,
         CAST(l2 AS DOUBLE) / 2.0 AS lev
  FROM base, ({seq_levels}) AS t(l2)
),
cased AS (
  SELECT x, y, lev,
         (CASE WHEN z00 > lev THEN 1 ELSE 0 END)
         + (CASE WHEN z10 > lev THEN 2 ELSE 0 END)
         + (CASE WHEN z11 > lev THEN 4 ELSE 0 END)
         + (CASE WHEN z01 > lev THEN 8 ELSE 0 END) AS idx,
         (lev - z00) / (z10 - z00) AS tb,
         (lev - z10) / (z11 - z10) AS tr,
         (lev - z01) / (z11 - z01) AS tt,
         (lev - z00) / (z01 - z00) AS tl
  FROM lv
),
percell AS (
  SELECT lev,
         CASE WHEN idx > 0 AND idx < 15 THEN 1 ELSE 0 END AS crossed,
         CAST(CASE idx {nseg_arms} ELSE 0 END AS BIGINT) AS nseg,
         CAST(FLOOR((CASE idx {len_arms} ELSE 0.0 END) * {_CT_Q} + 0.5)
              AS BIGINT) AS qlen
  FROM cased
)
SELECT lev,
       CAST(SUM(crossed) AS BIGINT) AS n_cells,
       CAST(SUM(nseg) AS BIGINT) AS n_segments,
       ROUND(CAST(SUM(qlen) AS DOUBLE) / {_CT_Q}.0, 4) AS total_len
FROM percell
GROUP BY lev
"""


_CT_SEQ_DUCK = (
    "SELECT UNNEST(["
    + ", ".join(str(v) for v in _CT_LEVELS2)
    + "]) AS l2"
)
_CT_SEQ_SPARK = (
    "SELECT explode(array("
    + ", ".join(str(v) for v in _CT_LEVELS2)
    + ")) AS l2"
)

_CT_ORACLE = _contour_sql(_CT_SEQ_DUCK, grid_src=_VS_GRID_DUCK)


@register("raster_contour_stats", _CT_ORACLE)
def raster_contour_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marching-squares contour census of the DEM at three half-integer
    levels: crossed-cell count, segment count (fixed saddle pairing),
    and interpolated isoline length — map-only, one 3-key aggregation."""
    spark.range(0, W * H, 1, 8).selectExpr(
        f"CAST(id % {W} AS BIGINT) AS x",
        f"CAST(id DIV {W} AS BIGINT) AS y",
    ).createOrReplaceTempView("grid_xy")
    return spark.sql(_contour_sql(_CT_SEQ_SPARK))


# --- watershed basins (terra::watershed analog, D8 forest labeling) ----------
#
# Every cell drains along the same steepest-descent D8 forest that
# flow_accumulation_d8 uses (_FX/_FY — shared closed-form column math,
# zero joins before the iterative stage); its BASIN is the terminal pit
# the drainage path ends at.  Engine: components.pointer_jump — path
# DOUBLING over the functional graph n → downstream(n), so a drainage
# path L cells long resolves in ⌈log2 L⌉ pointer-keyed self-joins, not
# L sequential rounds; at a 10^10-cell DEM the round count grows with
# log(path length) while each round is one co-partitioned shuffle.
# Oracle: a recursive-CTE walk that follows the SAME forest one hop at
# a time and keeps the row whose cursor has no downstream — an
# independent O(L)-round formulation of the same fixpoint.  Output also
# carries the exact hop count (path length to the pit), which doubles
# as a check that doubling accumulated lengths correctly.

_WS_ORACLE = f"""
WITH RECURSIVE cells AS (
  SELECT CAST(i % {W} AS BIGINT) AS x, CAST(i // {W} AS BIGINT) AS y
  FROM (SELECT unnest(generate_series(0, {W * H - 1})) AS i)
),
f AS (
  SELECT x, y, CAST({_FX} AS BIGINT) AS fx, CAST({_FY} AS BIGINT) AS fy
  FROM cells
),
walk AS (
  SELECT x AS sx, y AS sy, x, y, CAST(0 AS BIGINT) AS h FROM f
  UNION ALL
  SELECT w.sx, w.sy, g.fx, g.fy, w.h + 1
  FROM walk w JOIN f g ON g.x = w.x AND g.y = w.y
  WHERE g.fx IS NOT NULL
)
SELECT w.sx AS x, w.sy AS y,
       CAST(w.x + w.y * {W} AS BIGINT) AS basin_id,
       CAST(w.h AS BIGINT) AS hops
FROM walk w JOIN f g ON g.x = w.x AND g.y = w.y
WHERE g.fx IS NULL
"""


@register("watershed_basins_d8", _WS_ORACLE)
def watershed_basins_d8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Terminal-pit basin label + drainage-path hop count per cell,
    by pointer doubling over the D8 steepest-descent forest
    (components.pointer_jump; reference terra::watershed semantics,
    /root/reference/R/scale_process.R zonal family)."""
    from chopin_spark.components import pointer_jump

    cells = spark.range(0, W * H, 1, 8).selectExpr(
        f"CAST(id % {W} AS BIGINT) AS x",
        f"CAST(id DIV {W} AS BIGINT) AS y",
    ).selectExpr(
        "x", "y",
        f"CAST({_FX} AS BIGINT) AS fx",
        f"CAST({_FY} AS BIGINT) AS fy",
    )
    succ = cells.selectExpr(
        f"x + y * {W} AS node",
        f"COALESCE(fx + fy * {W}, x + y * {W}) AS nxt",
    )
    out = pointer_jump(succ, max_rounds=16)
    return out.selectExpr(
        f"node % {W} AS x",
        f"node DIV {W} AS y",
        "CAST(target AS BIGINT) AS basin_id",
        "CAST(hops AS BIGINT) AS hops",
    )


# --- zonal statistics over DERIVED zones (watershed basins) -------------------
#
# The composition chopin reaches with watershed |> zonal: the zone
# layer is not an input — it is computed (pointer doubling), then
# immediately consumed as the key of a zonal rollup.  Engine: the
# watershed labels join nothing; z re-derives from the closed form, so
# the rollup is one hash-agg on the label column.  Basin area, total
# elevation, relief (pit depth vs max), and the longest drainage path
# per basin come out of the same pass.

_WSZ_ORACLE = f"""
WITH RECURSIVE cells AS (
  SELECT CAST(i % {W} AS BIGINT) AS x, CAST(i // {W} AS BIGINT) AS y
  FROM (SELECT unnest(generate_series(0, {W * H - 1})) AS i)
),
f AS (
  SELECT x, y, CAST({_FX} AS BIGINT) AS fx, CAST({_FY} AS BIGINT) AS fy
  FROM cells
),
walk AS (
  SELECT x AS sx, y AS sy, x, y, CAST(0 AS BIGINT) AS h FROM f
  UNION ALL
  SELECT w.sx, w.sy, g.fx, g.fy, w.h + 1
  FROM walk w JOIN f g ON g.x = w.x AND g.y = w.y
  WHERE g.fx IS NOT NULL
),
basin AS (
  SELECT w.sx AS x, w.sy AS y,
         CAST(w.x + w.y * {W} AS BIGINT) AS basin_id,
         CAST(w.h AS BIGINT) AS hops
  FROM walk w JOIN f g ON g.x = w.x AND g.y = w.y
  WHERE g.fx IS NULL
)
SELECT basin_id,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM({_zf('x', 'y')}) AS BIGINT) AS sum_z,
       CAST(MAX({_zf('x', 'y')}) - MIN({_zf('x', 'y')}) AS BIGINT)
         AS relief,
       CAST(MAX(hops) AS BIGINT) AS longest_path
FROM basin
GROUP BY 1
"""


@register("basin_zonal_stats", _WSZ_ORACLE)
def basin_zonal_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal rollup keyed by a DERIVED zone layer: watershed basins
    (pointer doubling) feed area / total-z / relief / longest-drainage
    stats in one hash-agg — the watershed |> zonal composition."""
    ws = watershed_basins_d8(spark, sf_dir)
    return (
        ws.selectExpr(
            "basin_id", "hops",
            f"CAST({_zf('x', 'y')} AS BIGINT) AS z",
        )
        .groupBy("basin_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum("z").cast("long").alias("sum_z"),
            (F.max("z") - F.min("z")).cast("long").alias("relief"),
            F.max("hops").cast("long").alias("longest_path"),
        )
    )


# --- topographic wetness index (flow-accumulation ∘ slope composition) --------
#
# TWI = ln(contributing area / slope): the standard hydrology product
# of TWO derived rasters — the iterative D8 accumulation and the
# central-difference gradient stencil — joined per cell.  The gradient
# is integer column math of the closed-form DEM (interior cells, the
# hillshade convention); the only transcendental is the final LN under
# the repo's ROUND(,4) grain.  Engine: flowacc's block-parallel
# fixpoint then pure projection; oracle: the recursive-CTE walk then
# the identical formula.

_TWI_EXPR = (
    "ROUND(LN(CAST(acc AS DOUBLE)"
    " / SQRT(CAST(gx * gx + gy * gy + 1 AS DOUBLE))), 4)"
)
_TWI_GX = f"(({_zf('(x + 1)', 'y')}) - ({_zf('(x - 1)', 'y')}))"
_TWI_GY = f"(({_zf('x', '(y + 1)')}) - ({_zf('x', '(y - 1)')}))"

_TWI_ORACLE = f"""
WITH RECURSIVE cells AS (
  SELECT CAST(i % {W} AS BIGINT) AS x, CAST(i // {W} AS BIGINT) AS y
  FROM (SELECT unnest(generate_series(0, {W * H - 1})) AS i)
),
f AS (
  SELECT x, y, CAST({_FX} AS BIGINT) AS fx, CAST({_FY} AS BIGINT) AS fy
  FROM cells
),
walk AS (
  SELECT x AS sx, y AS sy, x, y FROM f
  UNION ALL
  SELECT w.sx, w.sy, g.fx, g.fy
  FROM walk w JOIN f g ON g.x = w.x AND g.y = w.y
  WHERE g.fx IS NOT NULL
),
acc AS (
  SELECT x, y, CAST(COUNT(*) AS BIGINT) AS acc
  FROM walk GROUP BY 1, 2
),
gr AS (
  SELECT x, y, acc,
         CAST({_TWI_GX} AS BIGINT) AS gx,
         CAST({_TWI_GY} AS BIGINT) AS gy
  FROM acc
  WHERE x >= 1 AND x < {W - 1} AND y >= 1 AND y < {H - 1}
)
SELECT x, y, acc, {_TWI_EXPR} AS twi FROM gr
"""


@register("raster_twi", _TWI_ORACLE)
def raster_twi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topographic wetness index per interior cell — the iterative
    flow-accumulation fixpoint composed with the gradient stencil in
    one projection."""
    cells = spark.range(0, W * H, 1, 8).selectExpr(
        f"CAST(id % {W} AS BIGINT) AS x",
        f"CAST(id DIV {W} AS BIGINT) AS y",
    ).selectExpr(
        "x", "y",
        f"CAST({_zf('x', 'y')} AS BIGINT) AS z",
        f"CAST({_FX} AS BIGINT) AS fx",
        f"CAST({_FY} AS BIGINT) AS fy",
    )
    acc = flow_accumulation(cells, tile_w=8, tile_h=8)
    return (
        acc.filter(
            (F.col("x") >= 1) & (F.col("x") < W - 1)
            & (F.col("y") >= 1) & (F.col("y") < H - 1)
        )
        .selectExpr(
            "x", "y", "CAST(acc AS BIGINT) AS acc",
            f"CAST({_TWI_GX} AS BIGINT) AS gx",
            f"CAST({_TWI_GY} AS BIGINT) AS gy",
        )
        .selectExpr("x", "y", "acc", f"{_TWI_EXPR} AS twi")
    )


# --- least-cost path backtrace (gdistance::shortestPath / terra costPath) -----
#
# The route-extraction companion to cost_distance_raster: given the
# optimal-distance surface, every non-source cell has a deterministic
# PARENT — the rook neighbor satisfying the Dijkstra optimality
# equality dist(n) + w(n,c) = dist(c), smallest cell index on ties —
# and the least-cost path from any target is the parent chain.  The
# engine never walks the chain step-by-step: it builds jump tables
# J_k(c) = 2^k-th ancestor by LOG-DOUBLING (k self-joins of the
# cell-sized parent table, the components.py pointer-doubling
# discipline) and unfolds the target's ancestor set with the closure
# A_{k+1} = A_k ∪ J_k(A_k) — O(log L) shuffles total where a naive
# backtrace needs L sequential joins.  The oracle recomputes the
# distance surface with the bounded-walk recursive CTE and WALKS the
# parent chain recursively — two independent formulations, exact
# integer agreement per step.

_TGX, _TGY = 31, 23           # fixed target cell (not a source)
_LCP_K = 9                    # covers paths up to 2^10 steps

_LCP_ORACLE = f"""
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
),
dd AS MATERIALIZED (
  SELECT x, y, CAST(MIN(d) AS BIGINT) AS dist FROM sp GROUP BY 1, 2
),
cc AS MATERIALIZED (
  SELECT c.x, c.y, c.cost, c.is_src, dd.dist
  FROM c JOIN dd ON dd.x = c.x AND dd.y = c.y
),
par AS (
  SELECT c1.x, c1.y,
         CAST(MIN(CASE WHEN n.dist + n.cost + c1.cost = c1.dist
                       THEN n.y * {W} + n.x END) AS BIGINT) AS pidx
  FROM cc c1 JOIN cc n ON ABS(c1.x - n.x) + ABS(c1.y - n.y) = 1
  WHERE NOT c1.is_src
  GROUP BY 1, 2
),
path AS (
  SELECT CAST(0 AS BIGINT) AS step,
         CAST({_TGX} AS BIGINT) AS x, CAST({_TGY} AS BIGINT) AS y
  UNION ALL
  SELECT p.step + 1, par.pidx % {W}, par.pidx // {W}
  FROM path p JOIN par ON par.x = p.x AND par.y = p.y
)
SELECT p.step, p.x, p.y, cc.dist
FROM path p JOIN cc ON cc.x = p.x AND cc.y = p.y
"""


@register("least_cost_path_trace", _LCP_ORACLE)
def least_cost_path_trace(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Least-cost path from (31, 23) back to the nearest source via
    parent pointer-doubling over the converged cost surface — O(log L)
    shuffles, never an L-step sequential walk."""
    d = cost_distance(build_cells(spark), tile_w=8, tile_h=8)
    cc = d.selectExpr(
        "x", "y", "dist",
        f"CAST({_COST} AS BIGINT) AS cost",
        f"{_IS_SRC} AS is_src",
    ).localCheckpoint()
    # adjacency as an equi-join: each cell re-emits itself shifted into
    # its four rook neighbors' coordinates
    nsh = cc.select(
        "x", "y", "dist", "cost",
        F.explode(
            F.expr(
                "array(named_struct('dx', 1, 'dy', 0),"
                " named_struct('dx', -1, 'dy', 0),"
                " named_struct('dx', 0, 'dy', 1),"
                " named_struct('dx', 0, 'dy', -1))"
            )
        ).alias("o"),
    ).selectExpr(
        "x + o.dx AS cx", "y + o.dy AS cy",
        "dist AS ndist", "cost AS ncost", f"y * {W} + x AS nidx",
    )
    par = (
        cc.filter("NOT is_src")
        .alias("c")
        .join(nsh, (F.col("c.x") == F.col("cx")) & (F.col("c.y") == F.col("cy")))
        .where(F.col("ndist") + F.col("ncost") + F.col("c.cost") == F.col("c.dist"))
        .groupBy("c.x", "c.y")
        .agg(F.min("nidx").alias("a"))
        .selectExpr(f"y * {W} + x AS c", "a")
    )
    selfloop = cc.filter("is_src").selectExpr(
        f"y * {W} + x AS c", f"y * {W} + x AS a"
    )
    jump = par.union(selfloop).localCheckpoint()
    tidx = _TGY * W + _TGX
    from chopin_spark.tables import values_df

    anc = values_df(spark, [(tidx, 0)], "cell long, step long")
    # closure rounds stop as soon as the ancestor set stops growing
    # (source reached) — worst case _LCP_K+1 rounds, typically ~log(L)
    n_prev = 1
    for k in range(_LCP_K + 1):
        nxt = (
            anc.join(jump, anc.cell == jump.c)
            .select(
                jump.a.alias("cell"),
                (anc.step + (1 << k)).alias("step"),
            )
        )
        anc = (
            anc.union(nxt)
            .groupBy("cell")
            .agg(F.min("step").alias("step"))
            .localCheckpoint()
        )
        n_now = anc.count()
        if n_now == n_prev:
            break
        n_prev = n_now
        if k < _LCP_K:
            jump = (
                jump.alias("l")
                .join(jump.alias("r"), F.col("l.a") == F.col("r.c"))
                .select(F.col("l.c").alias("c"), F.col("r.a").alias("a"))
                .localCheckpoint()
            )
    return (
        anc.join(cc, anc.cell == F.expr(f"y * {W} + x"))
        .selectExpr("step", "x", "y", "dist")
    )


# --- depression filling (Planchon–Darboux; terra fillSinks analog) ------------
#
# Engine: chopin_spark.sinkfill.sink_fill — block-parallel PRIORITY
# FLOOD (the minimax twin of the block Dijkstra above).  Oracle: the
# Jacobi fixpoint W(c) = max(z, min_N4 W(n) + 1) unrolled as a
# recursive CTE with a round counter; the probe converges at round 23
# on this DEM, 40 carries margin (tests/test_sinkfill.py asserts the
# last two rounds are equal, so the margin is verified, not assumed).
# Two independent formulations — label-setting flood vs label-
# correcting Jacobi — must agree integer-exactly on every cell.

from chopin_spark.sinkfill import INF as _SF_INF, sink_fill  # noqa: E402

_SF_R = 40
_SF_BORDER = f"(x = 0 OR x = {W - 1} OR y = 0 OR y = {H - 1})"

_SINK_ORACLE = f"""
WITH RECURSIVE cells AS (
  SELECT CAST(i % {W} AS BIGINT) AS x, CAST(i // {W} AS BIGINT) AS y,
         CAST({_zf(f"(i % {W})", f"(i // {W})")} AS BIGINT) AS z,
         ((i % {W}) = 0 OR (i % {W}) = {W - 1}
          OR (i // {W}) = 0 OR (i // {W}) = {H - 1}) AS border
  FROM (SELECT unnest(generate_series(0, {W * H - 1})) AS i)
),
it AS (
  SELECT 0 AS r, x, y, z, border,
         CASE WHEN border THEN z ELSE CAST(1000000 AS BIGINT) END AS w
  FROM cells
  UNION ALL
  SELECT r + 1, c.x, c.y, c.z, c.border,
         CASE WHEN c.border THEN c.z
              ELSE GREATEST(c.z, (
                SELECT MIN(n.w) + 1 FROM it n
                WHERE n.r = c.r
                  AND ABS(n.x - c.x) + ABS(n.y - c.y) = 1)) END
  FROM it c WHERE c.r < {_SF_R}
)
SELECT x, y, z, CAST(w AS BIGINT) AS w,
       CAST(w - z AS BIGINT) AS fill_depth
FROM it WHERE r = {_SF_R}
"""


@register("sink_fill_surface", _SINK_ORACLE)
def sink_fill_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planchon–Darboux filled water level over the DEM permutation
    fixture: W = z at the border, max(z, min neighbor + 1) inside —
    block-parallel priority flood, rounds ~ block-graph diameter."""
    cells = spark.range(0, W * H, 1, 8).selectExpr(
        f"CAST(id % {W} AS BIGINT) AS x",
        f"CAST(id DIV {W} AS BIGINT) AS y",
    ).selectExpr(
        "x", "y",
        f"CAST({_zf('x', 'y')} AS BIGINT) AS z",
        f"CASE WHEN {_SF_BORDER} THEN CAST({_zf('x', 'y')} AS BIGINT)"
        f" ELSE CAST({_SF_INF} AS BIGINT) END AS w",
    )
    filled = sink_fill(cells, tile_w=8, tile_h=8)
    return filled.selectExpr(
        "x", "y",
        f"CAST({_zf('x', 'y')} AS BIGINT) AS z",
        "w",
        f"w - CAST({_zf('x', 'y')} AS BIGINT) AS fill_depth",
    )


# --- accessibility bands: cost-distance surface × document layer --------------
#
# The raster↔vector composition chopin exists for, run through the
# ITERATIVE verb: band documents by the accumulated-cost distance of
# their grid cell (isochrone-style accessibility zoning from the
# source facilities).  Engine: converged block-Dijkstra surface +
# ONE cell-keyed equi-join to the doc layer + band rollup — the
# surface is cell-count-sized (metadata next to the fact table), so
# the join broadcasts at any corpus scale.  Oracle: the bounded-walk
# recursive CTE recomputes the surface independently.

_ACC_BAND = 50  # band width in accumulated-cost units
_ACC_CW = 800000.0 / W
_ACC_CH = 600000.0 / H

from chopin_spark import sqlexpr as _sx  # noqa: E402

_ACC_DOCS = f"""
  SELECT CAST(FLOOR({{dx}} / {_ACC_CW!r}) AS BIGINT) AS x,
         CAST(FLOOR({{dy}} / {_ACC_CH!r}) AS BIGINT) AS y,
         n_chars
  FROM documents
"""

_ACC_DOCS_FILLED = _ACC_DOCS.format(
    dx=_sx.x_expr("doc_id"), dy=_sx.y_expr("doc_id")
)

_ACC_ORACLE_BODY = """
SELECT CAST(FLOOR(dd.dist / {band}.0) AS BIGINT) AS band,
       CAST(COUNT(DISTINCT dd.x * 1024 + dd.y) AS BIGINT) AS n_cells,
       CAST(COUNT(d.n_chars) AS BIGINT) AS n_docs,
       CAST(COALESCE(SUM(d.n_chars), 0) AS BIGINT) AS sum_chars
FROM dd LEFT JOIN d ON d.x = dd.x AND d.y = dd.y
GROUP BY 1
"""

_ACC_ORACLE = f"""
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
),
dd AS MATERIALIZED (
  SELECT x, y, CAST(MIN(d) AS BIGINT) AS dist FROM sp GROUP BY 1, 2
),
d AS (
{_ACC_DOCS_FILLED}
)
{_ACC_ORACLE_BODY.format(band=_ACC_BAND)}
"""


@register("cost_band_accessibility", _ACC_ORACLE)
def cost_band_accessibility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isochrone-style accessibility bands: documents rolled up by the
    accumulated-cost band of their cell — converged cost surface
    (cell-count-sized) equi-joined once to the doc layer."""
    from chopin_spark.tables import load as _load

    dist = cost_distance(build_cells(spark), tile_w=8, tile_h=8)
    dist.createOrReplaceTempView("dd")
    _load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    spark.sql(_ACC_DOCS_FILLED).createOrReplaceTempView("d")
    return spark.sql(_ACC_ORACLE_BODY.format(band=_ACC_BAND))


# --- D8 flow-path length (downstream distance to outlet) -----------------------
#
# flow_accumulation_d8 counts what drains THROUGH a cell; this measures
# how FAR each cell's water travels to its pit — terra's flow-length
# companion.  Step weights on the classic integer lattice (orthogonal
# 10, diagonal 14 ≈ 10√2), so every path length is an exact int64.
# Engine: the parent map is pure column math (the shared _FX/_FY D8
# closed form); lengths come from POINTER-DOUBLING the (cell → parent,
# w) table with weight accumulation — O(log L) self-joins, each
# cell-table-sized, with early exit when the map stabilizes (every
# chain ends in a pit self-loop).  Oracle: recursive downstream walk
# per cell accumulating the same weights.

_FPL_K = 10  # 2^10 = 1024 ≥ any path on a 768-cell grid


_FPL_ORACLE = f"""
WITH RECURSIVE cells AS (
  SELECT CAST(i % {W} AS BIGINT) AS x, CAST(i // {W} AS BIGINT) AS y
  FROM (SELECT unnest(generate_series(0, {W * H - 1})) AS i)
),
f AS (
  SELECT x, y, CAST({_FX} AS BIGINT) AS fx, CAST({_FY} AS BIGINT) AS fy
  FROM cells
),
walk AS (
  SELECT x AS sx, y AS sy, x, y, CAST(0 AS BIGINT) AS len FROM f
  UNION ALL
  SELECT w.sx, w.sy, f.fx, f.fy,
         w.len + CASE WHEN ABS(f.fx - w.x) + ABS(f.fy - w.y) = 2
                      THEN 14 ELSE 10 END
  FROM walk w JOIN f ON f.x = w.x AND f.y = w.y
  WHERE f.fx IS NOT NULL
),
fin AS (
  SELECT sx, sy, MAX(len) AS len_units FROM walk GROUP BY 1, 2
),
term AS (
  SELECT w.sx, w.sy, w.x AS ox, w.y AS oy, w.len
  FROM walk w
  JOIN fin ON fin.sx = w.sx AND fin.sy = w.sy AND fin.len_units = w.len
)
SELECT sx AS x, sy AS y, CAST(len AS BIGINT) AS len_units,
       CAST(oy * {W} + ox AS BIGINT) AS outlet_idx
FROM term
"""


@register("flow_path_length_d8", _FPL_ORACLE)
def flow_path_length_d8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downstream flow-path length and outlet per cell over the DEM
    permutation fixture — pointer-doubled parent map with 10/14
    integer step weights, O(log L) shuffles."""
    cells = spark.range(0, W * H, 1, 8).selectExpr(
        f"CAST(id % {W} AS BIGINT) AS x",
        f"CAST(id DIV {W} AS BIGINT) AS y",
        f"CAST({_FX} AS BIGINT) AS fx",
        f"CAST({_FY} AS BIGINT) AS fy",
    )
    jump = cells.selectExpr(
        f"y * {W} + x AS c",
        f"CASE WHEN fx IS NULL THEN y * {W} + x"
        f" ELSE fy * {W} + fx END AS a",
        f"CASE WHEN fx IS NULL THEN CAST(0 AS BIGINT)"
        f" WHEN ABS(fx - x) + ABS(fy - y) = 2 THEN CAST(14 AS BIGINT)"
        f" ELSE CAST(10 AS BIGINT) END AS w",
    ).localCheckpoint()
    for _k in range(_FPL_K):
        nxt = (
            jump.alias("l")
            .join(jump.alias("r"), F.col("l.a") == F.col("r.c"))
            .select(
                F.col("l.c").alias("c"),
                F.col("r.a").alias("a"),
                (F.col("l.w") + F.col("r.w")).alias("w"),
            )
            .localCheckpoint()
        )
        # early exit: the map is stable once no weight grew this round
        grown = nxt.alias("n").join(
            jump.alias("j"), F.col("n.c") == F.col("j.c")
        ).where(F.col("n.w") > F.col("j.w")).isEmpty()
        jump = nxt
        if grown:
            break
    return jump.selectExpr(
        f"c % {W} AS x", f"CAST(c DIV {W} AS BIGINT) AS y",
        "w AS len_units", "a AS outlet_idx",
    )


# --- Strahler stream order (hydrology-verb family, strahler.py) ---------------
#
# Engine: block-local bottom-up passes over the same D8 forest as
# flow_accumulation_d8 (strahler.py — flowacc's template with the
# max/count-of-max combine).  Oracle: VALUE ITERATION carried in the
# recursive working table — an independent formulation.  Each round
# recomputes every cell's order from its children's previous-round
# orders; the child-order MULTISET is folded into ONE exact-int64 sum
# s = SUM(9^ord) (a cell has <= 8 D8 children, so base-9 digits never
# carry): the leading digit's position is the max child order m, the
# digit itself the count attaining m.  new = 1 if s=0; m+1 if digit>=2;
# else m.  Self-rows with weight 0 keep parentless cells in the state.
# _SO_ROUNDS rounds of synchronous iteration reach the fixpoint iff
# the forest's order-depth is smaller — the engine asserts the same
# convergence dynamically (strahler.LAST_ROUNDS), and the parity test
# pins oracle == engine so a too-small ladder shows up as a hash
# mismatch, not a silent wrong answer.

from chopin_spark.strahler import strahler_order  # noqa: E402

_SO_ROUNDS = 40
_SO_MAXORD = 12
_SO_POW9 = "CASE i.ord " + " ".join(
    f"WHEN {o} THEN CAST({9 ** o} AS BIGINT)" for o in range(1, _SO_MAXORD + 1)
) + " END"
_SO_M = "CASE " + " ".join(
    f"WHEN s >= {9 ** o} THEN {o}" for o in range(_SO_MAXORD, 0, -1)
) + " ELSE 0 END"
# 9^m for the same m — the leading-digit divisor, exact int64
_SO_MPOW = "CASE " + " ".join(
    f"WHEN s >= {9 ** o} THEN CAST({9 ** o} AS BIGINT)"
    for o in range(_SO_MAXORD, 0, -1)
) + " ELSE CAST(1 AS BIGINT) END"

_SO_ORACLE = f"""
WITH RECURSIVE cells AS (
  SELECT CAST(i % {W} AS BIGINT) AS x, CAST(i // {W} AS BIGINT) AS y
  FROM (SELECT unnest(generate_series(0, {W * H - 1})) AS i)
),
f AS (
  SELECT x, y, CAST({_FX} AS BIGINT) AS fx, CAST({_FY} AS BIGINT) AS fy
  FROM cells
),
-- child->parent edges (w=1) plus a w=0 self row per cell so every
-- cell, parentless ones included, survives each round's aggregation
e AS (
  SELECT x AS cx, y AS cy, fx AS px, fy AS py, 1 AS w
  FROM f WHERE fx IS NOT NULL
  UNION ALL
  SELECT x, y, x, y, 0 FROM f
),
it AS (
  SELECT 0 AS rnd, x, y, CAST(1 AS BIGINT) AS ord FROM f
  UNION ALL
  SELECT q.rnd + 1, q.x, q.y,
         CASE WHEN q.s = 0 THEN CAST(1 AS BIGINT)
              WHEN CAST((q.s - (q.s % (.MPOW.))) / (.MPOW.)
                        AS BIGINT) >= 2
                THEN CAST(({_SO_M}) + 1 AS BIGINT)
              ELSE CAST({_SO_M} AS BIGINT) END
  FROM (
    SELECT e.px AS x, e.py AS y, MAX(i.rnd) AS rnd,
           CAST(SUM(CASE WHEN e.w = 1 THEN {_SO_POW9}
                         ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS s
    FROM it i JOIN e ON e.cx = i.x AND e.cy = i.y
    GROUP BY 1, 2
  ) q
  WHERE q.rnd < {_SO_ROUNDS}
)
SELECT ord AS strahler_order, CAST(COUNT(*) AS BIGINT) AS n_cells,
       CAST(SUM(x * 37 + y) AS BIGINT) AS xy_fold
FROM it WHERE rnd = {_SO_ROUNDS}
GROUP BY 1
"""
_SO_ORACLE = _SO_ORACLE.replace(".MPOW.", "(" + _SO_MPOW + ")")


@register("strahler_stream_order", _SO_ORACLE)
def strahler_stream_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strahler order histogram of the deterministic D8 flow forest —
    engine rounds scale with block-boundary crossings (strahler.py),
    one co-partitioned shuffle per round."""
    cells = spark.range(0, W * H, 1, 8).selectExpr(
        f"CAST(id % {W} AS BIGINT) AS x",
        f"CAST(id DIV {W} AS BIGINT) AS y",
    ).selectExpr(
        "x", "y",
        f"CAST({_zf('x', 'y')} AS BIGINT) AS z",
        f"CAST({_FX} AS BIGINT) AS fx",
        f"CAST({_FY} AS BIGINT) AS fy",
    )
    orders = strahler_order(cells, tile_w=8, tile_h=8)
    return (
        orders.groupBy(F.col("ord").alias("strahler_order"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_cells"),
            F.sum(F.col("x") * 37 + F.col("y")).cast("long").alias("xy_fold"),
        )
    )
