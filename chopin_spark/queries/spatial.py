"""Spatial partitioning / cell-assignment queries (SURVEY.md §2.1).

Coordinates derive deterministically from integer ids (sqlexpr LCG), so
every query is oracle-checkable in DuckDB with the identical SQL text.
All cell math is JVM-side column arithmetic — zero UDFs, full codegen,
pushdown-friendly at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark import sqlexpr as sx
from chopin_spark.queries import register
from chopin_spark.tables import load

# regular grid used across queries: 8×6 cells over the working extent
NX, NY = 8, 6
_DOC_X = sx.x_expr("doc_id")
_DOC_Y = sx.y_expr("doc_id")
_EVT_X = sx.x_expr("event_id")
_EVT_Y = sx.y_expr("event_id")


_GRID_ORACLE = f"""
SELECT {sx.grid_cell_expr(_DOC_X, _DOC_Y, NX, NY)} AS cgridid,
       COUNT(*) AS n_pages,
       {sx.round4('AVG(CAST(n_chars AS DOUBLE))')} AS avg_chars
FROM documents
GROUP BY 1
"""


@register("par_make_grid_assign", _GRID_ORACLE)
def par_make_grid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 par_make_grid (/root/reference/R/gridding.R:337-367): regular
    nx×ny grid assignment as pure column math + hash-agg per cell.
    Empty cells never appear — chopin's nonempty-cell filter
    (/root/reference/R/gridding.R:574-577) is free under groupBy."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            F.expr(sx.grid_cell_expr(_DOC_X, _DOC_Y, NX, NY)).alias("cgridid"),
            F.col("n_chars").cast("double").alias("n_chars"),
        )
        .groupBy("cgridid")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


_QUAD_ORACLE = f"""
SELECT {sx.quad_cell_expr(_EVT_X, _EVT_Y, 4)} AS quad_cell,
       COUNT(*) AS n_events,
       ROUND(SUM(CAST(FLOOR((value) * 100 + 0.5) AS BIGINT)) / 100.0, 4) AS sum_value
FROM events
GROUP BY 1
"""


@register("quad_cell_rollup", _QUAD_ORACLE)
def quad_cell_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 par_make_dggrid analog (/root/reference/R/gridding.R:1020-1049):
    hierarchical quadtree cell id at level 4 (parent = child >> bits),
    aggregated per cell."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            F.expr(sx.quad_cell_expr(_EVT_X, _EVT_Y, 4)).alias("quad_cell"),
            "value",
        )
        .groupBy("quad_cell")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.expr("CAST(FLOOR((value) * 100 + 0.5) AS BIGINT)")) / 100.0, 4).alias("sum_value"),
        )
    )


_HEX_SIZE = 40_000.0
_HEX_ORACLE = f"""
SELECT {sx.hex_cell_expr(_DOC_X, _DOC_Y, _HEX_SIZE)} AS hex_cell,
       COUNT(*) AS n_pages
FROM documents
GROUP BY 1
"""


@register("hex_cell_count", _HEX_ORACLE)
def hex_cell_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 par_make_h3 analog (/root/reference/R/gridding.R:910-982):
    per-point hexagon assignment (axial + cube rounding) replaces
    polygon coverage entirely; pure column math."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            F.expr(sx.hex_cell_expr(_DOC_X, _DOC_Y, _HEX_SIZE)).alias("hex_cell")
        )
        .groupBy("hex_cell")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )


# Aperture-7 hex hierarchy (H3's h3_to_parent verb): two parent steps
# composed in one projection chain — nested subqueries bind by column
# reference (linear) in both engines.
_HEXP_SIZE = 10_000.0


def _hexp_sql() -> str:
    # One GROUP BY between every parent hop.  Semantically the same
    # rollup (each cell has exactly one parent, so per-parent distinct
    # descendants partition exactly and partial counts sum), but the
    # aggregation is also a projection-collapse barrier: without it
    # Catalyst's CollapseProject inlines parent(parent(cell(x, y)))
    # into one expression whose term count multiplies per hop (the
    # cube-round CASE references each axis ~10x), and plan compile
    # alone cost seconds per run.  This is also the 100-TB shape —
    # multi-resolution rollup as associative partial aggregation.
    cell = sx.hex_cell_expr(_DOC_X, _DOC_Y, _HEXP_SIZE)
    return f"""
WITH cells AS (
  SELECT {cell} AS hex_cell, COUNT(*) AS n
  FROM documents GROUP BY 1
),
par AS (
  SELECT {sx.hex_parent_expr('hex_cell')} AS parent,
         COUNT(*) AS n_cells, SUM(n) AS n
  FROM cells GROUP BY 1
)
SELECT {sx.hex_parent_expr('parent')} AS gparent,
       CAST(SUM(n) AS BIGINT) AS n_pages,
       COUNT(*) AS n_parents,
       CAST(SUM(n_cells) AS BIGINT) AS n_cells
FROM par
GROUP BY 1
"""


@register("hex_parent_rollup", _hexp_sql())
def hex_parent_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 hierarchy verb (h3_to_parent; chopin exposes `h3index`
    hierarchies, /root/reference/R/gridding.R:970): points → 10 km hex
    → aperture-7 parent → grandparent, rolled up per grandparent with
    distinct-descendant counts.  Every id lives in one packed axial
    space, so the two parent hops are plain column math and the rollup
    is a single partial+final aggregation — multi-resolution pruning at
    any scale.  Exactly-7-children lattice invariant: test_sqlexpr."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_hexp_sql())


# Quantile grid (P4): ntile per axis on deterministic coordinates.
_QSTEPS = 4
_QUANT_ORACLE = f"""
WITH pts AS (
  SELECT doc_id, {_DOC_X} AS x, {_DOC_Y} AS y FROM documents
), cut AS (
  SELECT doc_id,
         NTILE({_QSTEPS}) OVER (ORDER BY x, doc_id) AS qx,
         NTILE({_QSTEPS}) OVER (ORDER BY y, doc_id) AS qy
  FROM pts
)
SELECT (qy - 1) * {_QSTEPS} + (qx - 1) AS cgridid, COUNT(*) AS n_pages
FROM cut GROUP BY 1
"""


@register("par_cut_coords_quantile", _QUANT_ORACLE)
def par_cut_coords_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 par_def_q + par_cut_coords
    (/root/reference/R/gridding.R:414-502): quantile partitioning via
    ntile per axis — steps² cells, near-equal population by
    construction. Deterministic tie-break on doc_id."""
    from pyspark.sql import Window as W

    docs = load(spark, sf_dir, "documents")
    pts = docs.select(
        "doc_id", F.expr(_DOC_X).alias("x"), F.expr(_DOC_Y).alias("y")
    )
    wx = W.orderBy("x", "doc_id")
    wy = W.orderBy("y", "doc_id")
    cut = pts.select(
        ((F.ntile(_QSTEPS).over(wy) - 1) * _QSTEPS + (F.ntile(_QSTEPS).over(wx) - 1)
         ).alias("cgridid")
    )
    return cut.groupBy("cgridid").agg(F.count(F.lit(1)).alias("n_pages"))


# P4 SCALE path: the same quantile grid via distributed approxQuantile
# (Greenwald–Khanna, relative_error=0 → exact order statistics) instead
# of a single-reducer ntile sort. DuckDB's quantile_disc uses the same
# rank convention, so cell populations tie out exactly.
_QG_ORACLE = f"""
WITH pts AS (
  SELECT {_DOC_X} AS x, {_DOC_Y} AS y FROM documents
),
b AS (
  SELECT quantile_disc(x, [0.25, 0.5, 0.75]) AS bx,
         quantile_disc(y, [0.25, 0.5, 0.75]) AS by
  FROM pts
),
a AS (
  SELECT (CASE WHEN x < bx[1] THEN 0 WHEN x < bx[2] THEN 1
               WHEN x < bx[3] THEN 2 ELSE 3 END) AS ix,
         (CASE WHEN y < by[1] THEN 0 WHEN y < by[2] THEN 1
               WHEN y < by[3] THEN 2 ELSE 3 END) AS iy
  FROM pts, b
)
SELECT iy * {_QSTEPS} + ix AS cgridid, COUNT(*) AS n_pages
FROM a GROUP BY 1
"""


@register("quantile_grid_assign", _QG_ORACLE)
def quantile_grid_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 par_def_q/par_cut_coords SCALE path
    (/root/reference/R/gridding.R:414-502): per-axis exact quantile
    breaks from one distributed approxQuantile pass (no global sort),
    WHEN-chain cell assignment, per-cell population."""
    from chopin_spark.grid import quantile_grid

    docs = load(spark, sf_dir, "documents")
    pts = docs.select(F.expr(_DOC_X).alias("x"), F.expr(_DOC_Y).alias("y"))
    g = quantile_grid(pts, steps=_QSTEPS)
    return (
        g.assign_core(pts)
        .groupBy("cgridid")
        .agg(F.count(F.lit(1)).alias("n_pages"))
    )


# P5 SCALE path: near-equal-size Morton clusters via approxQuantile
# breaks (no global ntile window). The oracle asserts the contract the
# reference tests for par_make_balanced (equal group sizes,
# /root/reference/tests/testthat/test-gridding.R:254): k populated
# clusters, every row assigned, spread bounded by the quantile
# granularity (max-min <= 3 ≈ ±1 around ceil(n/k) for exact sketches).
_BAL_K = 16
_BAL_ORACLE = f"""
SELECT {_BAL_K} AS k_cells,
       COUNT(*) AS total_docs,
       true AS spread_ok
FROM documents
"""


@register("balanced_assign_approx_sizes", _BAL_ORACLE)
def balanced_assign_approx_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 par_make_balanced SCALE path (grid.balanced_assign_approx):
    Morton-code approxQuantile breaks → near-equal clusters, fully
    distributed. Output = the invariant the reference contract checks,
    computed honestly from the assignment."""
    from chopin_spark.grid import balanced_assign_approx

    docs = load(spark, sf_dir, "documents")
    pts = docs.select(
        "doc_id", F.expr(_DOC_X).alias("x"), F.expr(_DOC_Y).alias("y")
    )
    # relative_error=0 → exact GK sketches: the oracle's spread bound
    # (max-min <= 3) only holds for exact ranks — the default 1e-3
    # sketch error (eps·n = 5 at sf0.1) breaks it
    sizes = (
        balanced_assign_approx(pts, _BAL_K, relative_error=0.0)
        .groupBy("cgridid")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return sizes.agg(
        F.count(F.lit(1)).alias("k_cells"),
        F.sum("n").alias("total_docs"),
        ((F.max("n") - F.min("n")) <= F.lit(3)).alias("spread_ok"),
    )


# --- global Moran's I (spatial autocorrelation of the page surface) ----------
#
# The statistic an exposure analyst computes right after chopin's zonal
# summaries: is the per-tract page mass spatially clustered?  Global
# Moran's I with rook-adjacency weights over the 16×16 tract grid,
# EXACT: with D_i = n·x_i − S (n = 256 zones, S = Σx), the 1/n factors
# cancel, so I = (n·Σ_pairs D_i·D_j) / (W·Σ D_i²) is a ratio of exact
# int64 sums — shuffle-order independent, one final double division.
#
# Scale shape: the fact scan aggregates to the zone grid (tiny), the
# adjacency join is zone×4-offsets — at 10^12 docs the heavy stage is
# the same per-zone agg every zonal query pays; the Moran finish is
# dimension-sized.  Empty tracts participate with x = 0 (the full-grid
# LEFT JOIN), as the statistic requires.

from chopin_spark.zones import TRACT_H, TRACT_NX, TRACT_NY, TRACT_W  # noqa: E402

_MORAN_BODY = """
z AS (
  SELECT c.gx, c.gy, COALESCE(SUM(d.n_chars), 0) AS x
  FROM cells c LEFT JOIN d ON d.gx = c.gx AND d.gy = c.gy
  GROUP BY 1, 2
),
t AS (
  SELECT gx, gy,
         CAST({n} AS BIGINT) * x - (SELECT SUM(x) FROM z) AS dd
  FROM z
),
nb AS (
  SELECT t.gx + o.dx AS ngx, t.gy + o.dy AS ngy, t.dd
  FROM t CROSS JOIN (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS o(dx, dy)
),
pairs AS (
  SELECT nb.dd AS d1, t2.dd AS d2
  FROM nb JOIN t t2 ON nb.ngx = t2.gx AND nb.ngy = t2.gy
)
SELECT CAST({n} AS BIGINT) AS n_zones,
       (SELECT COUNT(*) FROM pairs) AS w_links,
       (SELECT CAST(SUM(d1 * d2) AS BIGINT) FROM pairs) AS num,
       (SELECT CAST(SUM(dd * dd) AS BIGINT) FROM t) AS den,
       ROUND(
         CAST({n} AS DOUBLE) * (SELECT SUM(d1 * d2) FROM pairs)
         / (CAST((SELECT COUNT(*) FROM pairs) AS DOUBLE)
            * (SELECT SUM(dd * dd) FROM t)),
         6) AS moran_i
"""

_NZ = TRACT_NX * TRACT_NY

_MORAN_SPARK = f"""
WITH cells AS (
  SELECT gx, gy
  FROM (SELECT explode(sequence(0, {TRACT_NX - 1})) AS gx)
  CROSS JOIN (SELECT explode(sequence(0, {TRACT_NY - 1})) AS gy)
),
d AS (
  SELECT CAST(FLOOR({_DOC_X} / {TRACT_W!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_DOC_Y} / {TRACT_H!r}) AS BIGINT) AS gy,
         n_chars
  FROM documents
),
{_MORAN_BODY.format(n=_NZ)}
"""

_MORAN_ORACLE = f"""
WITH cells AS (
  SELECT g1.gx, g2.gy
  FROM generate_series(0, {TRACT_NX - 1}) AS g1(gx),
       generate_series(0, {TRACT_NY - 1}) AS g2(gy)
),
d AS (
  SELECT CAST(FLOOR({_DOC_X} / {TRACT_W!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_DOC_Y} / {TRACT_H!r}) AS BIGINT) AS gy,
         n_chars
  FROM documents
),
{_MORAN_BODY.format(n=_NZ)}
"""


@register("moran_i_tracts", _MORAN_ORACLE)
def moran_i_tracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Moran's I (rook weights) of per-tract page mass —
    integer-exact numerator/denominator via the n·x−S centering
    identity; the adjacency join and all sums are engine-shared SQL."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_MORAN_SPARK)


# --- Geary's C (global spatial autocorrelation, difference form) -------------
#
# Moran's I is a cross-product statistic; Geary's C is its difference
# twin, C = (n−1)·Σᵢⱼ wᵢⱼ(xᵢ−xⱼ)² / (2W·Σᵢ(xᵢ−x̄)²) — more sensitive
# to local than global structure (spdep::geary.test parity; chopin
# feeds exactly these tract summaries to spdep downstream).  With the
# integer centering dd = n·x − S the n² scale cancels between
# numerator and denominator, so num = Σ_directed (dd₁−dd₂)² and
# den = Σ dd² are exact int64 and only the final ratio is a double.

_GEARY_BODY = """
z AS (
  SELECT c.gx, c.gy, COALESCE(SUM(d.n_chars), 0) AS x
  FROM cells c LEFT JOIN d ON d.gx = c.gx AND d.gy = c.gy
  GROUP BY 1, 2
),
t AS (
  SELECT gx, gy,
         CAST({n} AS BIGINT) * x - (SELECT SUM(x) FROM z) AS dd
  FROM z
),
nb AS (
  SELECT t.gx + o.dx AS ngx, t.gy + o.dy AS ngy, t.dd
  FROM t CROSS JOIN (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS o(dx, dy)
),
pairs AS (
  SELECT nb.dd AS d1, t2.dd AS d2
  FROM nb JOIN t t2 ON nb.ngx = t2.gx AND nb.ngy = t2.gy
)
SELECT CAST({n} AS BIGINT) AS n_zones,
       (SELECT COUNT(*) FROM pairs) AS w_links,
       (SELECT CAST(SUM((d1 - d2) * (d1 - d2)) AS BIGINT) FROM pairs) AS num,
       (SELECT CAST(SUM(dd * dd) AS BIGINT) FROM t) AS den,
       ROUND(
         CAST({n} - 1 AS DOUBLE)
         * (SELECT SUM((d1 - d2) * (d1 - d2)) FROM pairs)
         / (2.0 * CAST((SELECT COUNT(*) FROM pairs) AS DOUBLE)
            * (SELECT SUM(dd * dd) FROM t)),
         6) AS geary_c
"""

_GEARY_SPARK = f"""
WITH cells AS (
  SELECT gx, gy
  FROM (SELECT explode(sequence(0, {TRACT_NX - 1})) AS gx)
  CROSS JOIN (SELECT explode(sequence(0, {TRACT_NY - 1})) AS gy)
),
d AS (
  SELECT CAST(FLOOR({_DOC_X} / {TRACT_W!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_DOC_Y} / {TRACT_H!r}) AS BIGINT) AS gy,
         n_chars
  FROM documents
),
{_GEARY_BODY.format(n=_NZ)}
"""

_GEARY_ORACLE = f"""
WITH cells AS (
  SELECT g1.gx, g2.gy
  FROM generate_series(0, {TRACT_NX - 1}) AS g1(gx),
       generate_series(0, {TRACT_NY - 1}) AS g2(gy)
),
d AS (
  SELECT CAST(FLOOR({_DOC_X} / {TRACT_W!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_DOC_Y} / {TRACT_H!r}) AS BIGINT) AS gy,
         n_chars
  FROM documents
),
{_GEARY_BODY.format(n=_NZ)}
"""


@register("geary_c_tracts", _GEARY_ORACLE)
def geary_c_tracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Geary's C (rook weights) of per-tract page mass — the
    squared-difference autocorrelation statistic, exact-integer num/den
    via the same centering identity as moran_i_tracts; the directed
    link count folds the 2W normalization."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_GEARY_SPARK)


# --- Getis-Ord Gi* hotspot detection ----------------------------------------
#
# Moran's I says WHETHER the surface clusters; Gi* says WHERE.  Same
# tract grid, rook neighborhood PLUS self (the * variant).  The z-score
# is exact-integer until one final sqrt:
#   A_i = n·Σ_{j∈N(i)∪{i}} x_j − S·W_i          (integer)
#   V   = n·Σx² − S²                            (integer)
#   z_i = A_i / sqrt(V·(n·W_i − W_i²)/(n−1))
# (the standard Gi* with binary weights after multiplying num/den by n;
# S = Σx).  Both engines evaluate the same three float ops on the same
# exact integers, so ROUND(·, 6) is hash-safe.

_GISTAR_BODY = """
z AS (
  SELECT c.gx, c.gy, COALESCE(SUM(d.n_chars), 0) AS x
  FROM cells c LEFT JOIN d ON d.gx = c.gx AND d.gy = c.gy
  GROUP BY 1, 2
),
tot AS (
  SELECT CAST(SUM(x) AS BIGINT) AS s,
         CAST({n} AS BIGINT) * CAST(SUM(x * x) AS BIGINT)
           - CAST(SUM(x) AS BIGINT) * CAST(SUM(x) AS BIGINT) AS v
  FROM z
),
nb AS (
  SELECT z.gx + o.dx AS ngx, z.gy + o.dy AS ngy, z.x
  FROM z CROSS JOIN (VALUES (0, 0), (1, 0), (-1, 0), (0, 1), (0, -1))
                    AS o(dx, dy)
),
hood AS (
  SELECT z2.gx, z2.gy,
         CAST(SUM(nb.x) AS BIGINT) AS nsum,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM nb JOIN z z2 ON nb.ngx = z2.gx AND nb.ngy = z2.gy
  GROUP BY 1, 2
)
SELECT h.gx, h.gy, h.w AS w_i,
       CAST({n} AS BIGINT) * h.nsum - t.s * h.w AS a_i,
       ROUND(
         (CAST({n} AS BIGINT) * h.nsum - t.s * h.w)
         / SQRT(CAST(t.v AS DOUBLE)
                * (CAST({n} AS BIGINT) * h.w - h.w * h.w)
                / ({n} - 1.0)),
         6) AS gi_z
FROM hood h CROSS JOIN tot t
"""

_GISTAR_SPARK = f"""
WITH cells AS (
  SELECT gx, gy
  FROM (SELECT explode(sequence(0, {TRACT_NX - 1})) AS gx)
  CROSS JOIN (SELECT explode(sequence(0, {TRACT_NY - 1})) AS gy)
),
d AS (
  SELECT CAST(FLOOR({_DOC_X} / {TRACT_W!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_DOC_Y} / {TRACT_H!r}) AS BIGINT) AS gy,
         n_chars
  FROM documents
),
{_GISTAR_BODY.format(n=_NZ)}
"""

_GISTAR_ORACLE = f"""
WITH cells AS (
  SELECT g1.gx, g2.gy
  FROM generate_series(0, {TRACT_NX - 1}) AS g1(gx),
       generate_series(0, {TRACT_NY - 1}) AS g2(gy)
),
d AS (
  SELECT CAST(FLOOR({_DOC_X} / {TRACT_W!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_DOC_Y} / {TRACT_H!r}) AS BIGINT) AS gy,
         n_chars
  FROM documents
),
{_GISTAR_BODY.format(n=_NZ)}
"""


@register("getis_ord_hotspots", _GISTAR_ORACLE)
def getis_ord_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tract Getis-Ord Gi* z-scores of page mass (rook + self
    neighborhood) — the hotspot-detection finish of the zonal summary
    family, exact-integer to the final sqrt."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_GISTAR_SPARK)


# --- local Moran (LISA cluster/outlier classification) -----------------------
#
# The per-zone companion of global Moran's I: which tracts sit in
# high-high / low-low clusters vs high-low / low-high outliers.
# Same integer identity: with D_i = n·x_i − S,
#   I_i = n · D_i · Σ_{j∈N(i)} D_j / Σ_k D_k²
# (binary rook weights, population m2) — numerator and denominator are
# exact int64, the quadrant label is two sign tests, and the only
# float op is the final division.

_LISA_BODY = """
z AS (
  SELECT c.gx, c.gy, COALESCE(SUM(d.n_chars), 0) AS x
  FROM cells c LEFT JOIN d ON d.gx = c.gx AND d.gy = c.gy
  GROUP BY 1, 2
),
t AS (
  SELECT gx, gy,
         CAST({n} AS BIGINT) * x - (SELECT SUM(x) FROM z) AS dd
  FROM z
),
nb AS (
  SELECT t.gx + o.dx AS ngx, t.gy + o.dy AS ngy, t.dd
  FROM t CROSS JOIN (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS o(dx, dy)
),
hood AS (
  SELECT t2.gx, t2.gy, t2.dd, CAST(SUM(nb.dd) AS BIGINT) AS nsum
  FROM nb JOIN t t2 ON nb.ngx = t2.gx AND nb.ngy = t2.gy
  GROUP BY 1, 2, 3
)
SELECT h.gx, h.gy,
       CAST(CAST({n} AS BIGINT) * h.dd * h.nsum AS BIGINT) AS num,
       ROUND(CAST({n} AS BIGINT) * h.dd * h.nsum
             / CAST((SELECT SUM(dd * dd) FROM t) AS DOUBLE), 6) AS lisa_i,
       CASE WHEN h.dd >= 0 AND h.nsum >= 0 THEN 'HH'
            WHEN h.dd < 0 AND h.nsum < 0 THEN 'LL'
            WHEN h.dd >= 0 THEN 'HL'
            ELSE 'LH' END AS quadrant
FROM hood h
"""

_LISA_SPARK = f"""
WITH cells AS (
  SELECT gx, gy
  FROM (SELECT explode(sequence(0, {TRACT_NX - 1})) AS gx)
  CROSS JOIN (SELECT explode(sequence(0, {TRACT_NY - 1})) AS gy)
),
d AS (
  SELECT CAST(FLOOR({_DOC_X} / {TRACT_W!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_DOC_Y} / {TRACT_H!r}) AS BIGINT) AS gy,
         n_chars
  FROM documents
),
{_LISA_BODY.format(n=_NZ)}
"""

_LISA_ORACLE = f"""
WITH cells AS (
  SELECT g1.gx, g2.gy
  FROM generate_series(0, {TRACT_NX - 1}) AS g1(gx),
       generate_series(0, {TRACT_NY - 1}) AS g2(gy)
),
d AS (
  SELECT CAST(FLOOR({_DOC_X} / {TRACT_W!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_DOC_Y} / {TRACT_H!r}) AS BIGINT) AS gy,
         n_chars
  FROM documents
),
{_LISA_BODY.format(n=_NZ)}
"""


@register("lisa_local_moran", _LISA_ORACLE)
def lisa_local_moran(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local Moran I_i with HH/LL/HL/LH quadrant labels per tract —
    cluster/outlier detection, exact-integer numerator/denominator."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_LISA_SPARK)


# --- Mann-Kendall trend per tract (emerging-hotspot analysis) ----------------
#
# The space-time finish of the hotspot family (ArcGIS "emerging hot
# spot" workflow): per tract, the Mann-Kendall trend statistic
# S = Σ_{i<j} sign(c_j − c_i) over the DAILY event-count series —
# upward S > 0, downward S < 0, all integer (sign comparisons on
# integer counts; ties contribute 0).  The day×tract lattice is built
# exhaustively (absent days count 0 — a zone going quiet IS a trend).
#
# Scale shape: facts collapse to the (tract, day) cube first (one
# partial+final agg); the pair stage is the TIME self-join — O(T²) per
# zone with T = #days (30 here), a dimension-sized quadratic, joined
# on the zone key.

_MK_DAYS = 30  # events span 2024-01-01 .. 2024-01-30

_MK_BODY = """
cube0 AS (
  SELECT c.gx, c.gy, dy.d,
         COALESCE(SUM(e.one), 0) AS cnt
  FROM cells c
  CROSS JOIN days dy
  LEFT JOIN e ON e.gx = c.gx AND e.gy = c.gy AND e.d = dy.d
  GROUP BY 1, 2, 3
),
pairs AS (
  SELECT a.gx, a.gy,
         CASE WHEN b.cnt > a.cnt THEN 1
              WHEN b.cnt < a.cnt THEN -1 ELSE 0 END AS sgn
  FROM cube0 a
  JOIN cube0 b ON b.gx = a.gx AND b.gy = a.gy AND b.d > a.d
)
SELECT gx, gy,
       CAST(SUM(sgn) AS BIGINT) AS mk_s,
       CAST(SUM(CASE WHEN sgn <> 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_untied_pairs,
       CASE WHEN SUM(sgn) > 0 THEN 'up'
            WHEN SUM(sgn) < 0 THEN 'down'
            ELSE 'flat' END AS trend
FROM pairs
GROUP BY 1, 2
"""

_MK_SPARK = f"""
WITH cells AS (
  SELECT gx, gy
  FROM (SELECT explode(sequence(0, {TRACT_NX - 1})) AS gx)
  CROSS JOIN (SELECT explode(sequence(0, {TRACT_NY - 1})) AS gy)
),
days AS (
  SELECT explode(sequence(1, {_MK_DAYS})) AS d
),
e AS (
  SELECT CAST(FLOOR({_EVT_X} / {TRACT_W!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_EVT_Y} / {TRACT_H!r}) AS BIGINT) AS gy,
         day(ts) AS d, 1 AS one
  FROM events WHERE month(ts) = 1
),
{_MK_BODY}
"""

_MK_ORACLE = f"""
WITH cells AS (
  SELECT g1.gx, g2.gy
  FROM generate_series(0, {TRACT_NX - 1}) AS g1(gx),
       generate_series(0, {TRACT_NY - 1}) AS g2(gy)
),
days AS (
  SELECT d FROM generate_series(1, {_MK_DAYS}) AS gd(d)
),
e AS (
  SELECT CAST(FLOOR({_EVT_X} / {TRACT_W!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_EVT_Y} / {TRACT_H!r}) AS BIGINT) AS gy,
         CAST(day(ts) AS BIGINT) AS d, 1 AS one
  FROM events WHERE month(ts) = 1
),
{_MK_BODY}
"""


@register("mann_kendall_tract_trend", _MK_ORACLE)
def mann_kendall_tract_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tract Mann-Kendall trend of daily event counts over the
    30-day window — integer sign-pair sums on the exhaustive space-time
    cube (absent days = 0)."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_MK_SPARK)


# --- per-zone convex hull (hull-of-hulls two-level reduce) --------------------

_HULL_CROSS = (
    "((q.ix - p.ix) * (r.iy - p.iy) - (q.iy - p.iy) * (r.ix - p.ix))"
)

_HULL_ORACLE = f"""
WITH d AS (
  SELECT {sx.grid_cell_expr(_DOC_X, _DOC_Y, NX, NY)} AS zone_id,
         CAST(FLOOR({_DOC_X}) AS BIGINT) AS ix,
         CAST(FLOOR({_DOC_Y}) AS BIGINT) AS iy
  FROM documents
),
pts AS (SELECT DISTINCT zone_id, ix, iy FROM d),
e AS (
  SELECT p.zone_id, p.ix AS px, p.iy AS py, q.ix AS qx, q.iy AS qy
  FROM pts p JOIN pts q
    ON p.zone_id = q.zone_id AND (p.ix <> q.ix OR p.iy <> q.iy)
  WHERE NOT EXISTS (
    SELECT 1 FROM pts r
    WHERE r.zone_id = p.zone_id
      AND (r.ix <> p.ix OR r.iy <> p.iy)
      AND (r.ix <> q.ix OR r.iy <> q.iy)
      AND ({_HULL_CROSS} < 0
        OR ({_HULL_CROSS} = 0
           AND NOT (r.ix BETWEEN LEAST(p.ix, q.ix)
                             AND GREATEST(p.ix, q.ix)
                AND r.iy BETWEEN LEAST(p.iy, q.iy)
                             AND GREATEST(p.iy, q.iy))))
  )
)
SELECT zone_id,
       CAST(COUNT(*) AS BIGINT) AS n_vertices,
       CAST(SUM(px * qy - py * qx) AS BIGINT) AS area2,
       ROUND(SUM(SQRT(CAST((qx - px) * (qx - px)
                           + (qy - py) * (qy - py) AS DOUBLE))), 4)
         AS perim_m
FROM e GROUP BY 1
"""


@register("zone_convex_hulls", _HULL_ORACLE)
def zone_convex_hulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-grid-cell convex hull of the document point pattern
    (terra::convHull per group), distributed as a hull-of-hulls
    two-level reduce (chopin_spark.hull): local monotone-chain hulls
    per Arrow batch, final hull over the tiny vertex union — the only
    shuffle carries hull vertices.  Integer-meter quantization makes
    orientation tests and the shoelace 2×area EXACT int64 in both
    engines.  Oracle: the O(n³) hull-EDGE characterization (directed
    edge iff every other point is strictly left, or collinear within
    the segment box) — an entirely different hull algorithm."""
    from chopin_spark.hull import convex_hull_stats

    docs = load(spark, sf_dir, "documents").select(
        F.expr(sx.grid_cell_expr(_DOC_X, _DOC_Y, NX, NY)).alias("zone_id"),
        F.expr(f"CAST(FLOOR({_DOC_X}) AS BIGINT)").alias("ix"),
        F.expr(f"CAST(FLOOR({_DOC_Y}) AS BIGINT)").alias("iy"),
    )
    return convex_hull_stats(docs)


# --- emerging hot spot analysis (per-day Gi* × Mann-Kendall) ------------------
#
# The full ESRI space-time workflow the Gi* and MK pieces above build
# toward: per DAY, a Gi* surface over the tract grid; per TRACT, the
# Mann-Kendall trend of its 30-day Gi* series; final label = (last-day
# hotspot class) × (trend).  Within a tract the Gi* denominator's
# neighborhood term k_i = n·w_i − w_i² is a POSITIVE constant across
# days, so MK's sign comparisons run on u_d = A_d / sqrt(V_d) with k_i
# cancelled — every u_d is a deterministic IEEE double from exact
# integers (sqrt is correctly rounded), identical in both engines, so
# cross-day sign tests cannot diverge.  Final-day z restores the full
# denominator for the 90% gate (|z| > 1.645).
#
# Scale shape: ONE fact aggregation to the (tract, day) cube; all
# later stages are dimension-sized (256 tracts × 30 days; the MK pair
# join is T² per tract = 435 rows).  At 10^12 events only the cube agg
# touches facts.

_EHS_BODY = """
cube0 AS (
  SELECT c.gx, c.gy, dy.d,
         COALESCE(SUM(e.one), 0) AS cnt
  FROM cells c
  CROSS JOIN days dy
  LEFT JOIN e ON e.gx = c.gx AND e.gy = c.gy AND e.d = dy.d
  GROUP BY 1, 2, 3
),
stot AS (
  SELECT d, CAST(SUM(cnt) AS BIGINT) AS s,
         CAST({n} AS BIGINT) * CAST(SUM(cnt * cnt) AS BIGINT)
           - CAST(SUM(cnt) AS BIGINT) * CAST(SUM(cnt) AS BIGINT) AS v
  FROM cube0 GROUP BY 1
),
nb AS (
  SELECT cube0.gx + o.dx AS ngx, cube0.gy + o.dy AS ngy, cube0.d,
         cube0.cnt
  FROM cube0 CROSS JOIN (VALUES (0, 0), (1, 0), (-1, 0), (0, 1), (0, -1))
                        AS o(dx, dy)
),
hood AS (
  SELECT c2.gx, c2.gy, c2.d,
         CAST(SUM(nb.cnt) AS BIGINT) AS nsum,
         CAST(COUNT(*) AS BIGINT) AS w
  FROM nb JOIN cube0 c2
    ON nb.ngx = c2.gx AND nb.ngy = c2.gy AND nb.d = c2.d
  GROUP BY 1, 2, 3
),
ug AS (
  SELECT h.gx, h.gy, h.d,
         CAST({n} AS BIGINT) * h.nsum - st.s * h.w AS a_i,
         h.w, st.v,
         CAST(CAST({n} AS BIGINT) * h.nsum - st.s * h.w AS DOUBLE)
           / SQRT(CAST(st.v AS DOUBLE)) AS u
  FROM hood h JOIN stot st ON st.d = h.d
),
mk AS (
  SELECT a.gx, a.gy, CAST(SUM(
           CASE WHEN b.u > a.u THEN 1
                WHEN b.u < a.u THEN -1 ELSE 0 END) AS BIGINT) AS mk_s
  FROM ug a JOIN ug b ON b.gx = a.gx AND b.gy = a.gy AND b.d > a.d
  GROUP BY 1, 2
),
fin AS (
  SELECT gx, gy,
         ROUND(CAST(a_i AS DOUBLE)
               / SQRT(CAST(v AS DOUBLE)
                      * (CAST({n} AS BIGINT) * w - w * w)
                      / ({n} - 1.0)), 6) AS z_final
  FROM ug WHERE d = {days}
)
SELECT mk.gx, mk.gy, mk.mk_s, fin.z_final,
       CASE WHEN fin.z_final > 1.645 THEN
              CASE WHEN mk.mk_s > 0 THEN 'intensifying-hot'
                   WHEN mk.mk_s < 0 THEN 'diminishing-hot'
                   ELSE 'persistent-hot' END
            WHEN fin.z_final < -1.645 THEN
              CASE WHEN mk.mk_s < 0 THEN 'intensifying-cold'
                   WHEN mk.mk_s > 0 THEN 'diminishing-cold'
                   ELSE 'persistent-cold' END
            ELSE
              CASE WHEN mk.mk_s > 0 THEN 'warming'
                   WHEN mk.mk_s < 0 THEN 'cooling'
                   ELSE 'no-pattern' END
       END AS pattern
FROM mk JOIN fin ON fin.gx = mk.gx AND fin.gy = mk.gy
"""

_EHS_SPARK = f"""
WITH cells AS (
  SELECT gx, gy
  FROM (SELECT explode(sequence(0, {TRACT_NX - 1})) AS gx)
  CROSS JOIN (SELECT explode(sequence(0, {TRACT_NY - 1})) AS gy)
),
days AS (
  SELECT explode(sequence(1, {_MK_DAYS})) AS d
),
e AS (
  SELECT CAST(FLOOR({_EVT_X} / {TRACT_W!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_EVT_Y} / {TRACT_H!r}) AS BIGINT) AS gy,
         day(ts) AS d, 1 AS one
  FROM events WHERE month(ts) = 1
),
{_EHS_BODY.format(n=_NZ, days=_MK_DAYS)}
"""

_EHS_ORACLE = f"""
WITH cells AS (
  SELECT g1.gx, g2.gy
  FROM generate_series(0, {TRACT_NX - 1}) AS g1(gx),
       generate_series(0, {TRACT_NY - 1}) AS g2(gy)
),
days AS (
  SELECT d FROM generate_series(1, {_MK_DAYS}) AS gd(d)
),
e AS (
  SELECT CAST(FLOOR({_EVT_X} / {TRACT_W!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_EVT_Y} / {TRACT_H!r}) AS BIGINT) AS gy,
         CAST(day(ts) AS BIGINT) AS d, 1 AS one
  FROM events WHERE month(ts) = 1
),
{_EHS_BODY.format(n=_NZ, days=_MK_DAYS)}
"""


@register("emerging_hotspots", _EHS_ORACLE)
def emerging_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Emerging hot spot analysis: daily Gi* surfaces over the tract
    grid, Mann-Kendall trend per tract across its Gi* series, ESRI-style
    pattern label from (final-day class × trend).  One fact aggregation
    to the space-time cube; every later stage is dimension-sized."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_EHS_SPARK)


# --- adaptive quadtree tiling (balanced-cell family, P5 analog) ---------------
#
# par_make_balanced (/root/reference/R/gridding.R:1087-1134) balances
# point load with a kd-split; the quadtree variant splits any cell
# holding more than CAP points into its 4 children, recursively to
# MAX_DEPTH.  Because per-point cell counts are monotonically
# non-increasing in depth, "the adaptive leaf of p" == "p's SHALLOWEST
# enclosing cell with count ≤ CAP (else MAX_DEPTH)" — which turns the
# recursive split into ONE declarative plan: explode the D+1 ancestor
# cells per point, count per (level, cell), pick min qualifying level.
# Scale shape: the counts table is bounded by Σ4^L cells (metadata-
# sized, broadcast back); the only fact-sized shuffles are the
# (level, cell) count and the per-point min — no iteration, no driver
# loop, unlike the reference's recursive R splitter.

_QT_DEPTH = 6
_QT_CAP = 64
_QT_CELLS = [
    f"CAST({sx.quad_cell_expr(_DOC_X, _DOC_Y, L)} AS BIGINT)"
    for L in range(_QT_DEPTH + 1)
]

_QT_LV_UNION = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, CAST({L} AS BIGINT) AS lvl, {c} AS cell FROM documents"
    for L, c in enumerate(_QT_CELLS)
)

_QT_ORACLE = f"""
WITH lv AS (
{_QT_LV_UNION}
),
cnts AS (
  SELECT lvl, cell, COUNT(*) AS cnt FROM lv GROUP BY 1, 2
),
pick AS (
  SELECT l.doc_id, MIN(l.lvl) AS lvl, arg_min(l.cell, l.lvl) AS cell
  FROM lv l JOIN cnts c ON c.lvl = l.lvl AND c.cell = l.cell
  WHERE c.cnt <= {_QT_CAP} OR l.lvl = {_QT_DEPTH}
  GROUP BY 1
)
SELECT lvl, cell, COUNT(*) AS n_docs
FROM pick
GROUP BY 1, 2
"""


@register("quadtree_adaptive_assign", _QT_ORACLE)
def quadtree_adaptive_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quadtree leaves (split while count > CAP, depth ≤ 6)
    as one declarative plan: per-point ancestor explode → (level, cell)
    hash-agg → broadcast the metadata-sized counts back → per-point
    min-qualifying-level.  P5 par_make_balanced analog
    (/root/reference/R/gridding.R:1087-1134) without the recursive
    driver-side splitter."""
    docs = load(spark, sf_dir, "documents")
    lv = docs.select(
        "doc_id",
        F.posexplode(F.array(*[F.expr(c) for c in _QT_CELLS])).alias(
            "lvl_i", "cell"
        ),
    ).select("doc_id", F.col("lvl_i").cast("long").alias("lvl"), "cell")
    cnts = lv.groupBy("lvl", "cell").agg(F.count(F.lit(1)).alias("cnt"))
    pick = (
        lv.join(F.broadcast(cnts), ["lvl", "cell"])
        .filter((F.col("cnt") <= _QT_CAP) | (F.col("lvl") == _QT_DEPTH))
        .groupBy("doc_id")
        .agg(F.min(F.struct("lvl", "cell")).alias("s"))
        .select(F.col("s.lvl").alias("lvl"), F.col("s.cell").alias("cell"))
    )
    return pick.groupBy("lvl", "cell").agg(F.count(F.lit(1)).alias("n_docs"))


# --- buffered spatial cross-validation folds ----------------------------------
#
# Leakage-safe model evaluation over spatial data (spatialsample /
# blockCV semantics, the buffered twin of trainprep's host-keyed
# split_leakage_audit): tracts are assigned to K folds by closed-form
# hash; a point is TEST for its own tract's fold, BUFFER for any fold
# owning a rook/queen-adjacent tract (spatial autocorrelation leaks
# across tract edges — buffered points must be dropped from training,
# not trained on), else TRAIN.  Because the tract partition is regular
# and fold() is a closed form of the tract index, the 8-neighbor fold
# probe is pure column arithmetic — the whole query is ONE scan + ONE
# aggregation: no join, no explode, nothing but the fact table moves.

_CV_K = 5
_CV_NX, _CV_NY = 16, 16  # zones.TRACT_NX/NY (pinned in the fixture text)
_CV_TX = f"CAST(FLOOR(({_DOC_X}) / 50000.0) AS BIGINT)"
_CV_TY = f"CAST(FLOOR(({_DOC_Y}) / 37500.0) AS BIGINT)"


def _cv_fold(tx: str, ty: str) -> str:
    return f"((({tx}) * 7 + ({ty}) * 13) % {_CV_K})"


def _cv_touch(k: int) -> str:
    """Does any in-bounds neighbor tract (8-adjacency) belong to fold k?"""
    terms = []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                continue
            nx_, ny_ = f"(tx + {dx})", f"(ty + {dy})"
            inb = (
                f"({nx_} >= 0 AND {nx_} < {_CV_NX}"
                f" AND {ny_} >= 0 AND {ny_} < {_CV_NY})"
            )
            terms.append(f"({inb} AND {_cv_fold(nx_, ny_)} = {k})")
    return "(" + " OR ".join(terms) + ")"


def _cv_sql() -> str:
    aggs = []
    for k in range(_CV_K):
        aggs.append(
            f"SUM(CASE WHEN own = {k} THEN 1 ELSE 0 END) AS test_{k},\n"
            f"  SUM(CASE WHEN own <> {k} AND {_cv_touch(k)} THEN 1 ELSE 0 END)"
            f" AS buf_{k}"
        )
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({k} AS BIGINT) AS fold,"
        f" CAST(test_{k} AS BIGINT) AS n_test,"
        f" CAST(buf_{k} AS BIGINT) AS n_buffer,"
        f" CAST(n - test_{k} - buf_{k} AS BIGINT) AS n_train FROM agg"
        for k in range(_CV_K)
    )
    return f"""
WITH pts AS (
  SELECT {_CV_TX} AS tx, {_CV_TY} AS ty FROM documents
),
f AS (
  SELECT tx, ty, {_cv_fold('tx', 'ty')} AS own FROM pts
),
agg AS (
  SELECT COUNT(*) AS n,
  {", ".join(aggs)}
  FROM f
)
{rows}
"""


_CV_ORACLE = _cv_sql()


@register("spatial_cv_folds", _CV_ORACLE)
def spatial_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Buffered spatial K-fold split census: per fold, the test count,
    the buffer-excluded count (points in tracts adjacent to the fold),
    and the resulting training-set size — one scan, one aggregation,
    zero joins (fold membership of all 8 neighbor tracts is closed-form
    column arithmetic)."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_cv_sql())


# --- Kulldorff spatial scan statistic (circular windows, Poisson LLR) ---------
#
# The hotspot op behind disease/exposure surveillance (SaTScan), and
# the inferential upgrade of getis_ord_hotspots: evaluate every
# circular window (tract-centroid center × radius 1..3 tract units)
# by its Poisson log-likelihood ratio against the constant-rate null.
# Cases carry an injected SW-corner cluster so the statistic has a
# signal to find.  Scale shape: the ONLY fact-sized stage is the
# per-tract (pop, cases) pre-aggregation; the scan itself enumerates
# windows over the 256-row tract table (metadata-sized inequality
# join — broadcast NL in Spark, nested loop in DuckDB, both trivial at
# zone-table cardinality).  ln() is the one non-correctly-rounded op →
# ROUND(…, 6) grain, the repo's standard ln discipline.

# the injected cluster saturates (every SW-corner doc is a case):
# background cases come from doc_id % 7, which aliases with the LCG
# position draw, so a softer injection can be beaten by an aliasing
# fluke — the saturated corner is unambiguous at every sf
_SCAN_CASE = (
    "(CASE WHEN doc_id % 7 = 0"
    " OR (tx < 4 AND ty < 4)"
    " THEN 1 ELSE 0 END)"
)


def _scan_sql() -> str:
    return f"""
WITH pts AS (
  SELECT doc_id, {_CV_TX} AS tx, {_CV_TY} AS ty FROM documents
),
t AS (
  SELECT tx, ty, COUNT(*) AS pop, SUM({_SCAN_CASE}) AS cases
  FROM pts GROUP BY 1, 2
),
tot AS (
  SELECT CAST(SUM(pop) AS DOUBLE) AS mm, CAST(SUM(cases) AS DOUBLE) AS nn
  FROM t
),
cand AS (
  SELECT c.tx AS ctx, c.ty AS cty, r.r,
         CAST(SUM(o.pop) AS BIGINT) AS w_pop,
         CAST(SUM(o.cases) AS BIGINT) AS w_cases
  FROM t c
  JOIN (SELECT * FROM (VALUES (1), (2), (3)) AS v(r)) r ON 1 = 1
  JOIN t o
    ON (o.tx - c.tx) * (o.tx - c.tx) + (o.ty - c.ty) * (o.ty - c.ty)
       <= r.r * r.r
  GROUP BY 1, 2, 3
)
SELECT ctx, cty, CAST(r AS BIGINT) AS r, w_pop, w_cases,
       ROUND(
         CASE WHEN CAST(w_cases AS DOUBLE) * mm > nn * CAST(w_pop AS DOUBLE)
              THEN (CASE WHEN w_cases > 0
                         THEN w_cases * LN(CAST(w_cases AS DOUBLE)
                                           / (nn * w_pop / mm)) ELSE 0.0 END)
                 + (CASE WHEN nn - w_cases > 0
                         THEN (nn - w_cases)
                              * LN((nn - w_cases)
                                   / (nn - nn * w_pop / mm)) ELSE 0.0 END)
              ELSE 0.0 END, 6) AS llr
FROM cand CROSS JOIN tot
"""


_SCAN_ORACLE = _scan_sql()


@register("spatial_scan_llr", _SCAN_ORACLE)
def spatial_scan_llr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson spatial scan statistic over circular tract windows
    (SaTScan semantics): per-window population, cases, and LLR vs the
    constant-rate null — fact table touched once (per-tract pre-agg),
    window enumeration metadata-sized."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_scan_sql())


# --- vector-tile decluttering: top-k features per tile -------------------------
#
# The map-rendering pipeline step (tippecanoe's feature dropping): a
# tile budget keeps only the k most prominent features per tile at
# each zoom, deterministically.  Prominence = n_chars, ties on doc_id;
# the survivor rows carry the cell's total so the dropped count is
# audit-visible (the no-silent-caps rule).  One window pass partitioned
# by cell — the per-cell sort is bounded by cell occupancy, and a
# hot-cell budget at crawl scale would swap in the bounded top-k
# aggregate (grid.salted_agg's discipline); at tile-budget k the
# window form is the clearer plan.

# level 3 (64 tiles): at the sf0.01 gate scale every tile holds > k
# docs, so the budget binds corpus-wide; at level 4 the 500-doc
# fixture never exceeds k per tile and the query was VACUOUS (0 gate
# rows) — caught by the independent replay test
_VT_LEVEL = 3
_VT_K = 3
_VT_CELL = sx.quad_cell_expr(_DOC_X, _DOC_Y, _VT_LEVEL)

_VT_ORACLE = f"""
WITH pts AS (
  SELECT doc_id, n_chars, {_VT_CELL} AS tile FROM documents
),
rk AS (
  SELECT doc_id, n_chars, tile,
         ROW_NUMBER() OVER (PARTITION BY tile
                            ORDER BY n_chars DESC, doc_id) AS rnk,
         COUNT(*) OVER (PARTITION BY tile) AS n_in_tile
  FROM pts
)
SELECT tile, CAST(rnk AS BIGINT) AS rnk, doc_id, n_chars,
       CAST(n_in_tile AS BIGINT) AS n_in_tile,
       CAST(n_in_tile - {_VT_K} AS BIGINT) AS n_dropped
FROM rk WHERE rnk <= {_VT_K} AND n_in_tile > {_VT_K}
"""


@register("vector_tile_topk", _VT_ORACLE)
def vector_tile_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tile-budget feature dropping for map rendering: the k most
    prominent documents per level-4 quad tile (prominence = n_chars,
    deterministic ties), with the per-tile drop count carried on every
    survivor."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_VT_ORACLE)


# --- tile pyramid census (multi-zoom rollup cascade) ---------------------------
#
# The web-map / overview-layer build: per-tile counts at EVERY zoom
# level 6..0, produced as a cascade — the fact table is scanned ONCE
# (level-6 hash agg); every coarser level re-aggregates the previous
# level's cell table (≤ 4^L rows, shrinking 4× per hop), so the whole
# pyramid costs one fact shuffle plus six metadata-sized aggs.  This is
# the associative-partial-aggregation shape that makes overview tiles
# ~free at 100 TB: parent counts are SUMS of child counts, never a
# re-scan per zoom.  Integer division is written FLOOR(x / 2.0) so the
# identical text parses in Spark and DuckDB (cells ≤ 4^6, exact in a
# double).

_TP_MAX_LVL = 6


def _tp_parent(cell: str, lvl: int) -> str:
    n = 1 << lvl
    ix = f"(CAST(({cell}) AS BIGINT) % {n})"
    iy = f"CAST(FLOOR(({cell}) / {n}.0) AS BIGINT)"
    return (
        f"(CAST(FLOOR({iy} / 2.0) AS BIGINT) * {n // 2}"
        f" + CAST(FLOOR({ix} / 2.0) AS BIGINT))"
    )


def _tp_sql() -> str:
    base = sx.quad_cell_expr(_DOC_X, _DOC_Y, _TP_MAX_LVL)
    ctes = [
        f"l{_TP_MAX_LVL} AS (SELECT {base} AS cell,"
        f" CAST(COUNT(*) AS BIGINT) AS n FROM documents GROUP BY 1)"
    ]
    for lvl in range(_TP_MAX_LVL, 0, -1):
        ctes.append(
            f"l{lvl - 1} AS (SELECT {_tp_parent('cell', lvl)} AS cell,"
            f" CAST(SUM(n) AS BIGINT) AS n FROM l{lvl} GROUP BY 1)"
        )
    rows = "\nUNION ALL\n".join(
        f"SELECT CAST({lvl} AS BIGINT) AS lvl, cell, n FROM l{lvl}"
        for lvl in range(_TP_MAX_LVL + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + rows


_TP_ORACLE = _tp_sql()


@register("tile_pyramid_census", _TP_ORACLE)
def tile_pyramid_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-tile document counts at every quad zoom 6..0 — one fact
    scan, then a 4×-shrinking partial-aggregation cascade (parent
    counts are sums of child counts; no per-zoom re-scan).

    The cascade is built imperatively with a localCheckpoint per level:
    Spark inlines WITH chains per UNION branch (no common-subplan
    reuse), so the pure-SQL form re-scans the fact table once PER ZOOM
    — seven full scans (caught by test_plans' scan-count pin).  The
    checkpointed cell tables are ≤ 4^L rows, so the cuts are free."""
    docs = load(spark, sf_dir, "documents")
    base = sx.quad_cell_expr(_DOC_X, _DOC_Y, _TP_MAX_LVL)
    cur = (
        docs.selectExpr(f"{base} AS cell")
        .groupBy("cell")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint()
    )
    levels = {_TP_MAX_LVL: cur}
    for lvl in range(_TP_MAX_LVL, 0, -1):
        cur = (
            cur.selectExpr(f"{_tp_parent('cell', lvl)} AS cell", "n")
            .groupBy("cell")
            .agg(F.sum("n").cast("long").alias("n"))
            .localCheckpoint()
        )
        levels[lvl - 1] = cur
    out = None
    for lvl in range(_TP_MAX_LVL + 1):
        part = levels[lvl].selectExpr(
            f"CAST({lvl} AS BIGINT) AS lvl", "cell", "n"
        )
        out = part if out is None else out.unionByName(part)
    return out


# --- Theil–Sen robust slope per tract (the magnitude twin of Mann-Kendall) ----
#
# MK gives trend DIRECTION; Theil–Sen gives its robust MAGNITUDE: the
# median of all pairwise slopes (c_j − c_i)/(j − i) over the same
# daily count cube.  T = 30 days ⇒ 435 pairs per tract (odd, so the
# median is a single order statistic — no averaging rule to disagree
# on); each slope is an exact-integer division (correctly rounded,
# identical both engines), and rank ties among equal doubles pick
# equal values by construction.  Same tiering as MK: facts collapse to
# the (tract, day) cube once; the pair stage is dimension-sized.

_TS_BODY = _MK_BODY.split("pairs AS (")[0] + """slopes AS (
  SELECT a.gx, a.gy,
         CAST(b.cnt - a.cnt AS DOUBLE) / (b.d - a.d) AS slope
  FROM cube0 a
  JOIN cube0 b ON b.gx = a.gx AND b.gy = a.gy AND b.d > a.d
),
rk AS (
  SELECT gx, gy, slope,
         ROW_NUMBER() OVER (PARTITION BY gx, gy ORDER BY slope) AS rn,
         COUNT(*) OVER (PARTITION BY gx, gy) AS n
  FROM slopes
)
SELECT gx, gy,
       CAST(MIN(n) AS BIGINT) AS n_pairs,
       ROUND(MIN(CASE WHEN rn * 2 = n + 1 THEN slope END), 6)
         AS ts_slope
FROM rk
GROUP BY 1, 2
"""

_TS_ORACLE = f"""
WITH cells AS (
  SELECT g1.gx, g2.gy
  FROM generate_series(0, {TRACT_NX - 1}) AS g1(gx),
       generate_series(0, {TRACT_NY - 1}) AS g2(gy)
),
days AS (
  SELECT d FROM generate_series(1, {_MK_DAYS}) AS gd(d)
),
e AS (
  SELECT CAST(FLOOR({_EVT_X} / {TRACT_W!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_EVT_Y} / {TRACT_H!r}) AS BIGINT) AS gy,
         CAST(day(ts) AS BIGINT) AS d, 1 AS one
  FROM events WHERE month(ts) = 1
),
{_TS_BODY}
"""

_TS_SPARK = f"""
WITH cells AS (
  SELECT gx, gy
  FROM (SELECT explode(sequence(0, {TRACT_NX - 1})) AS gx)
  CROSS JOIN (SELECT explode(sequence(0, {TRACT_NY - 1})) AS gy)
),
days AS (
  SELECT explode(sequence(1, {_MK_DAYS})) AS d
),
e AS (
  SELECT CAST(FLOOR({_EVT_X} / {TRACT_W!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_EVT_Y} / {TRACT_H!r}) AS BIGINT) AS gy,
         day(ts) AS d, 1 AS one
  FROM events WHERE month(ts) = 1
),
{_TS_BODY}
"""


@register("theil_sen_tract_slope", _TS_ORACLE)
def theil_sen_tract_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median pairwise slope of each tract's daily event counts —
    Mann-Kendall's robust magnitude companion over the same cube."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_TS_SPARK)


# --- discrete Voronoi tessellation (nearest-seed partition) -------------------
#
# The seed-partition operator behind chopin's "split work by nearest
# facility" workflows (par_grid over terra::voronoi zones): every grid
# cell joins its nearest seed; per-seed region area and the document
# mass inside it.  Seeds are a deterministic supplier slice — the
# broadcast-small-dim shape: the cell×seed argmin is a broadcast
# nested loop over a metadata-sized seed table, and the doc rollup is
# one equi-join on the cell key; no pairwise doc work ever.
# Argmin is the repo's encoded-MIN trick: FLOOR(d²+0.5)·16384 +
# seed_id — integer-exact, deterministic tie-break toward the smaller
# seed id in both engines.

_VOR_NX, _VOR_NY = 64, 48
_VOR_CW = 800000.0 / _VOR_NX   # 12500.0
_VOR_CH = 600000.0 / _VOR_NY   # 12500.0


def _voronoi_sql(cells_src: str) -> str:
    seed_x, seed_y = sx.x_expr("s_suppkey"), sx.y_expr("s_suppkey")
    d2 = "(cx - sx) * (cx - sx) + (cy - sy) * (cy - sy)"
    return f"""
WITH seeds AS (
  SELECT s_suppkey, {seed_x} AS sx, {seed_y} AS sy
  FROM supplier WHERE s_suppkey % 17 = 3
),
cells AS (
  SELECT gx, gy,
         (gx + 0.5) * {_VOR_CW!r} AS cx,
         (gy + 0.5) * {_VOR_CH!r} AS cy
  FROM ({cells_src})
),
assign AS (
  SELECT gx, gy,
         MIN(CAST(FLOOR(({d2}) + 0.5) AS BIGINT) * 16384 + s_suppkey)
           % 16384 AS seed
  FROM cells CROSS JOIN seeds
  GROUP BY 1, 2
),
d AS (
  SELECT CAST(FLOOR({_DOC_X} / {_VOR_CW!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_DOC_Y} / {_VOR_CH!r}) AS BIGINT) AS gy,
         n_chars
  FROM documents
),
per_cell AS (
  SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS chars
  FROM d GROUP BY 1, 2
)
SELECT a.seed,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       ROUND(CAST(COUNT(*) AS DOUBLE) * {_VOR_CW * _VOR_CH!r} / 1000000.0, 4) AS area_km2,
       CAST(COALESCE(SUM(p.n_docs), 0) AS BIGINT) AS n_docs,
       CAST(COALESCE(SUM(p.chars), 0) AS BIGINT) AS sum_chars
FROM assign a
LEFT JOIN per_cell p ON p.gx = a.gx AND p.gy = a.gy
GROUP BY 1
"""


_VOR_SPARK = _voronoi_sql(f"""
  SELECT t1.gx, t2.gy
  FROM (SELECT explode(sequence(0, {_VOR_NX - 1})) AS gx) t1
  CROSS JOIN (SELECT explode(sequence(0, {_VOR_NY - 1})) AS gy) t2
""")
_VOR_ORACLE = _voronoi_sql(f"""
  SELECT g1.gx, g2.gy
  FROM generate_series(0, {_VOR_NX - 1}) g1(gx),
       generate_series(0, {_VOR_NY - 1}) g2(gy)
""")


@register("voronoi_seed_regions", _VOR_ORACLE)
def voronoi_seed_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete Voronoi regions of the supplier seed set: per seed the
    cell count, region area, and contained document mass — encoded-MIN
    argmin, broadcast seed table, one cell-keyed equi-join."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_VOR_SPARK)


# --- pycnophylactic interpolation (Tobler 1979) --------------------------------
#
# Mass-preserving areal disaggregation: tract-level page mass spread
# onto a finer 64×48 cell grid by iterated neighbor smoothing, with
# each tract's total RE-NORMALIZED back to its true mass after every
# pass (the pycnophylactic constraint — smoothing without it invents
# or destroys population).  Two unrolled rounds; each is one
# 4-neighbor equi-join avg (the Moran adjacency shape) plus one
# zone-keyed agg + broadcast-back scale — all dense-cell-table-sized.
# EVERY stored value lives on the 1e-6 integer lattice (BIGINT
# micro-units): neighbor and zone SUMs are integer — associative,
# reduction-order independent — and each round ends in one half-up
# requantization of a single double product; cross-engine exact with
# no order assumptions (the statistics-battery recipe, docs/SCALE.md).

_PYC_NX, _PYC_NY = 64, 48
_PYC_CPZ = (_PYC_NX // TRACT_NX) * (_PYC_NY // TRACT_NY)  # cells/tract


def _pyc_round(k: int) -> str:
    return f"""
s{k} AS (
  SELECT c.gx, c.gy, c.zone,
         CAST(FLOOR(SUM(n.v) / CAST(COUNT(*) AS DOUBLE) + 0.5)
              AS BIGINT) AS v
  FROM g{k - 1} c
  JOIN g{k - 1} n
    ON ABS(c.gx - n.gx) + ABS(c.gy - n.gy) <= 1
  GROUP BY 1, 2, 3
),
zs{k} AS (
  SELECT zone, CAST(SUM(v) AS BIGINT) AS zv FROM s{k} GROUP BY 1
),
g{k} AS (
  SELECT s.gx, s.gy, s.zone,
         CASE WHEN z.zv > 0
              THEN CAST(FLOOR(s.v * (CAST(m.mass_u AS DOUBLE) / z.zv)
                              + 0.5) AS BIGINT)
              ELSE CAST(0 AS BIGINT) END AS v
  FROM s{k} s
  JOIN zs{k} z ON z.zone = s.zone
  JOIN zmass m ON m.zone = s.zone
)"""


def _pyc_sql(cells_src: str) -> str:
    zone = (
        f"(CAST(FLOOR(gy / {_PYC_NY // TRACT_NY}.0) AS BIGINT) * {TRACT_NX}"
        f" + CAST(FLOOR(gx / {_PYC_NX // TRACT_NX}.0) AS BIGINT))"
    )
    dzone = (
        f"(CAST(FLOOR({_DOC_Y} / {TRACT_H!r}) AS BIGINT) * {TRACT_NX}"
        f" + CAST(FLOOR({_DOC_X} / {TRACT_W!r}) AS BIGINT))"
    )
    return f"""
WITH cells AS (
  SELECT gx, gy, {zone} AS zone FROM ({cells_src})
),
zmass AS (
  SELECT z.zone, CAST(COALESCE(d.mass, 0) * 1000000 AS BIGINT) AS mass_u
  FROM (SELECT DISTINCT zone FROM cells) z
  LEFT JOIN (
    SELECT {dzone} AS zone, CAST(SUM(n_chars) AS BIGINT) AS mass
    FROM documents GROUP BY 1
  ) d ON d.zone = z.zone
),
g0 AS (
  SELECT c.gx, c.gy, c.zone,
         CAST(FLOOR(m.mass_u / {_PYC_CPZ}.0 + 0.5) AS BIGINT) AS v
  FROM cells c JOIN zmass m ON m.zone = c.zone
),{_pyc_round(1)},{_pyc_round(2)}
SELECT zone,
       CAST(COUNT(*) AS BIGINT) AS n_cells,
       ROUND(CAST(SUM(v) AS DOUBLE) / 1000000.0, 4) AS zone_mass_check,
       ROUND(CAST(MAX(v) - MIN(v) AS DOUBLE) / 1000000.0, 4) AS v_range,
       ROUND(CAST(MAX(v) AS DOUBLE) / 1000000.0, 4) AS v_max
FROM g2
GROUP BY 1
"""


_PYC_SPARK_CELLS = f"""
  SELECT t1.gx, t2.gy
  FROM (SELECT explode(sequence(0, {_PYC_NX - 1})) AS gx) t1
  CROSS JOIN (SELECT explode(sequence(0, {_PYC_NY - 1})) AS gy) t2
"""
_PYC_DUCK_CELLS = f"""
  SELECT g1.gx, g2.gy
  FROM generate_series(0, {_PYC_NX - 1}) g1(gx),
       generate_series(0, {_PYC_NY - 1}) g2(gy)
"""


@register("pycnophylactic_smooth", _pyc_sql(_PYC_DUCK_CELLS))
def pycnophylactic_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tobler pycnophylactic disaggregation of tract page mass onto the
    64×48 grid: two smooth+renormalize rounds on the micro-unit
    lattice; per-tract output pins the mass-preservation constraint
    (zone_mass_check ≈ the tract's true mass, drift < n_cells µunits)
    and the within-tract gradient the smoothing created."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_pyc_sql(_PYC_SPARK_CELLS))


# --- join-count statistics (binary spatial association) ----------------------
#
# Moran/Geary handle interval data; the classic statistic for a BINARY
# surface (spdep::joincount.test — "is the above-average half of the
# map contiguous?") is the join count: classify each tract Black if
# its page mass exceeds the map mean, then count BB / BW / WW rook
# links.  The mean cut reuses the n·x − S centering identity, so the
# classification and every count is exact BIGINT; the only doubles are
# the three hypergeometric expectations E[·] under nonfree sampling,
# each one ratio of integer products (ROUND 6).
#
# Scale shape: identical to moran_i_tracts — fact scan → tiny zone
# grid; the link enumeration is zone×4-offsets; the finish is one row.

_JC_BODY = """
z AS (
  SELECT c.gx, c.gy, COALESCE(SUM(d.n_chars), 0) AS x
  FROM cells c LEFT JOIN d ON d.gx = c.gx AND d.gy = c.gy
  GROUP BY 1, 2
),
t AS (
  SELECT gx, gy,
         CASE WHEN CAST({n} AS BIGINT) * x > (SELECT SUM(x) FROM z)
              THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS b
  FROM z
),
nb AS (
  SELECT t.gx + o.dx AS ngx, t.gy + o.dy AS ngy, t.b
  FROM t CROSS JOIN (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS o(dx, dy)
),
links AS (
  SELECT nb.b AS b1, t2.b AS b2
  FROM nb JOIN t t2 ON nb.ngx = t2.gx AND nb.ngy = t2.gy
),
s AS (
  SELECT COUNT(*) AS wdir,
         SUM(b1 * b2) AS bbdir,
         SUM((1 - b1) * (1 - b2)) AS wwdir,
         SUM(b1 + b2 - 2 * b1 * b2) AS bwdir
  FROM links
),
c AS (
  SELECT CAST(SUM(b) AS BIGINT) AS nb_black,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM t
)
SELECT c.n AS n_zones,
       c.nb_black AS n_black,
       CAST(s.wdir / 2 AS BIGINT) AS w_links,
       CAST(s.bbdir / 2 AS BIGINT) AS bb,
       CAST(s.bwdir / 2 AS BIGINT) AS bw,
       CAST(s.wwdir / 2 AS BIGINT) AS ww,
       ROUND(CAST(s.wdir AS DOUBLE) / 2.0
             * c.nb_black * (c.nb_black - 1)
             / (CAST(c.n AS DOUBLE) * (c.n - 1)), 6) AS e_bb,
       ROUND(CAST(s.wdir AS DOUBLE)
             * c.nb_black * (c.n - c.nb_black)
             / (CAST(c.n AS DOUBLE) * (c.n - 1)), 6) AS e_bw,
       ROUND(CAST(s.wdir AS DOUBLE) / 2.0
             * (c.n - c.nb_black) * (c.n - c.nb_black - 1)
             / (CAST(c.n AS DOUBLE) * (c.n - 1)), 6) AS e_ww
FROM s CROSS JOIN c
"""

_JC_SPARK = f"""
WITH cells AS (
  SELECT gx, gy
  FROM (SELECT explode(sequence(0, {TRACT_NX - 1})) AS gx)
  CROSS JOIN (SELECT explode(sequence(0, {TRACT_NY - 1})) AS gy)
),
d AS (
  SELECT CAST(FLOOR({_DOC_X} / {TRACT_W!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_DOC_Y} / {TRACT_H!r}) AS BIGINT) AS gy,
         n_chars
  FROM documents
),
{_JC_BODY.format(n=_NZ)}
"""

_JC_ORACLE = f"""
WITH cells AS (
  SELECT g1.gx, g2.gy
  FROM generate_series(0, {TRACT_NX - 1}) AS g1(gx),
       generate_series(0, {TRACT_NY - 1}) AS g2(gy)
),
d AS (
  SELECT CAST(FLOOR({_DOC_X} / {TRACT_W!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_DOC_Y} / {TRACT_H!r}) AS BIGINT) AS gy,
         n_chars
  FROM documents
),
{_JC_BODY.format(n=_NZ)}
"""


@register("join_count_tracts", _JC_ORACLE)
def join_count_tracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-count statistics (BB/BW/WW rook links) of the binary
    above-mean page-mass surface, with hypergeometric expectations —
    classification and counts integer-exact via the n·x − S identity;
    the adjacency enumeration is the shared Moran link join."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_JC_SPARK)


# --- Moran's I correlogram (queen-ring lags 1..4) ------------------------------
#
# The spatial-scale profile of the autocorrelation: Moran's I computed
# at Chebyshev ring distances 1-4 (spdep::sp.correlogram shape) — how
# fast spatial structure decays with lag tells you the padding radius
# par_pad_grid actually needs.  One offsets dimension (80 rows, shared
# VALUES-free arithmetic) crossed against the 256-zone table covers
# all four lags in a single pairs join + one grouped agg; numerator
# and denominator stay exact int64 via the n·x−S centering identity.

_CORR_MAXLAG = 4

_CORR_BODY = f"""
z AS (
  SELECT c.gx, c.gy, COALESCE(SUM(d.n_chars), 0) AS x
  FROM cells c LEFT JOIN d ON d.gx = c.gx AND d.gy = c.gy
  GROUP BY 1, 2
),
t AS (
  SELECT gx, gy,
         CAST({{n}} AS BIGINT) * x - (SELECT SUM(x) FROM z) AS dd
  FROM z
),
off AS (
  SELECT vx.dx, vy.dy
  FROM {{vgen_x}} CROSS JOIN {{vgen_y}}
  WHERE NOT (vx.dx = 0 AND vy.dy = 0)
),
nb AS (
  SELECT t.gx + o.dx AS ngx, t.gy + o.dy AS ngy,
         GREATEST(ABS(o.dx), ABS(o.dy)) AS lag, t.dd
  FROM t CROSS JOIN off o
),
pairs AS (
  SELECT nb.lag, nb.dd AS d1, t2.dd AS d2
  FROM nb JOIN t t2 ON nb.ngx = t2.gx AND nb.ngy = t2.gy
),
den AS (SELECT CAST(SUM(dd * dd) AS BIGINT) AS den FROM t)
SELECT lag,
       COUNT(*) AS w_links,
       CAST(SUM(d1 * d2) AS BIGINT) AS num,
       den.den,
       ROUND(CAST({{n}} AS DOUBLE) * SUM(d1 * d2)
             / (CAST(COUNT(*) AS DOUBLE) * den.den), 6) AS moran_i
FROM pairs CROSS JOIN den
GROUP BY lag, den.den
"""


def _corr_sql(cells: str, vgen_x: str, vgen_y: str) -> str:
    d = f"""
d AS (
  SELECT CAST(FLOOR({_DOC_X} / {TRACT_W!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_DOC_Y} / {TRACT_H!r}) AS BIGINT) AS gy,
         n_chars
  FROM documents
)"""
    body = _CORR_BODY.format(n=_NZ, vgen_x=vgen_x, vgen_y=vgen_y)
    return f"WITH {cells.strip()},\n{d.strip()},\n{body}"


_CORR_ORACLE = _corr_sql(
    f"""cells AS (
  SELECT g1.gx, g2.gy
  FROM generate_series(0, {TRACT_NX - 1}) AS g1(gx),
       generate_series(0, {TRACT_NY - 1}) AS g2(gy)
)""",
    f"(SELECT UNNEST(generate_series(-{_CORR_MAXLAG}, {_CORR_MAXLAG})) AS dx) vx",
    f"(SELECT UNNEST(generate_series(-{_CORR_MAXLAG}, {_CORR_MAXLAG})) AS dy) vy",
)

_CORR_SPARK = _corr_sql(
    f"""cells AS (
  SELECT gx, gy
  FROM (SELECT explode(sequence(0, {TRACT_NX - 1})) AS gx)
  CROSS JOIN (SELECT explode(sequence(0, {TRACT_NY - 1})) AS gy)
)""",
    f"(SELECT explode(sequence(-{_CORR_MAXLAG}, {_CORR_MAXLAG})) AS dx) vx",
    f"(SELECT explode(sequence(-{_CORR_MAXLAG}, {_CORR_MAXLAG})) AS dy) vy",
)


@register("moran_correlogram", _CORR_ORACLE)
def moran_correlogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moran's I at queen-ring lags 1-4 over the tract grid — the
    autocorrelation-vs-distance profile, all four lags in one pairs
    join over an 80-row offsets dimension."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_CORR_SPARK)


# --- LISA Markov transition matrix (space-time ESDA) ---------------------------
#
# Rey's LISA Markov (PySAL giddy shape): classify every tract into its
# local-Moran quadrant in two epochs (events, days 1-15 vs 16-30) and
# count the quadrant→quadrant transitions — the dynamics of spatial
# structure (an HH→LL cell is a collapsing hotspot; the diagonal mass
# measures regime persistence).  Epoch enters the LISA pipeline as one
# more grouping key: per-epoch totals join in (never a correlated
# scalar per epoch), numerators stay exact int64, and the transition
# matrix is a 256-row self-join on the tract key.

_LMKV_BODY = """
z AS (
  SELECT ep.ep, c.gx, c.gy, COALESCE(COUNT(e.gx), 0) AS x
  FROM cells c
  CROSS JOIN (VALUES (0), (1)) AS ep(ep)
  LEFT JOIN e ON e.gx = c.gx AND e.gy = c.gy AND e.ep = ep.ep
  GROUP BY 1, 2, 3
),
s AS (
  SELECT ep, CAST(SUM(x) AS BIGINT) AS sx FROM z GROUP BY 1
),
t AS (
  SELECT z.ep, z.gx, z.gy, CAST({n} AS BIGINT) * z.x - s.sx AS dd
  FROM z JOIN s ON s.ep = z.ep
),
nb AS (
  SELECT t.ep, t.gx + o.dx AS ngx, t.gy + o.dy AS ngy, t.dd
  FROM t CROSS JOIN (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS o(dx, dy)
),
hood AS (
  SELECT t2.ep, t2.gx, t2.gy, t2.dd, CAST(SUM(nb.dd) AS BIGINT) AS nsum
  FROM nb JOIN t t2 ON nb.ep = t2.ep AND nb.ngx = t2.gx AND nb.ngy = t2.gy
  GROUP BY 1, 2, 3, 4
),
q AS (
  SELECT ep, gx, gy,
         CASE WHEN dd >= 0 AND nsum >= 0 THEN 'HH'
              WHEN dd < 0 AND nsum < 0 THEN 'LL'
              WHEN dd >= 0 THEN 'HL'
              ELSE 'LH' END AS quadrant
  FROM hood
)
SELECT a.quadrant AS q_from, b.quadrant AS q_to,
       COUNT(*) AS n_tracts
FROM q a
JOIN q b ON a.gx = b.gx AND a.gy = b.gy
WHERE a.ep = 0 AND b.ep = 1
GROUP BY 1, 2
"""

_LMKV_E = f"""
e AS (
  SELECT CAST(FLOOR({_EVT_X} / {TRACT_W!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_EVT_Y} / {TRACT_H!r}) AS BIGINT) AS gy,
         CASE WHEN day(ts) <= 15 THEN 0 ELSE 1 END AS ep
  FROM events WHERE month(ts) = 1
)"""

_LMKV_SPARK = f"""
WITH cells AS (
  SELECT gx, gy
  FROM (SELECT explode(sequence(0, {TRACT_NX - 1})) AS gx)
  CROSS JOIN (SELECT explode(sequence(0, {TRACT_NY - 1})) AS gy)
),
{_LMKV_E.strip()},
{_LMKV_BODY.format(n=_NZ)}
"""

_LMKV_ORACLE = f"""
WITH cells AS (
  SELECT g1.gx, g2.gy
  FROM generate_series(0, {TRACT_NX - 1}) AS g1(gx),
       generate_series(0, {TRACT_NY - 1}) AS g2(gy)
),
{_LMKV_E.strip()},
{_LMKV_BODY.format(n=_NZ)}
"""


@register("lisa_markov_transitions", _LMKV_ORACLE)
def lisa_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISA Markov: local-Moran quadrant per tract in two 15-day event
    epochs, quadrant→quadrant transition counts — regime dynamics of
    the hotspot map, exact-integer throughout."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_LMKV_SPARK)


# --- STR (sort-tile-recursive) packing: the sample-based spatial partitioner ---
#
# The data-driven partitioner Sedona/GeoSpark bulk-loads R-trees with,
# and the balanced-partitioning move the quadtree above approaches
# from the other direction: take a bounded SAMPLE, cut it into Sx
# vertical slices at sample-x quantiles, cut each slice at sample-y
# quantiles, broadcast the (Sx−1) + Sx·(Sy−1) boundary values, and
# assign EVERY point by pure comparisons.  The full fact is touched
# exactly twice (sample filter, assignment); everything between is
# sample-sized — at 10^12 rows the partitioner costs one ~10^5-row
# quantile computation, which is precisely why STR is the production
# default over exact balancing.
#
# Determinism: the sample is an LCG predicate (no rand()); boundary
# values are rank-statistics of sampled doubles (exact values, no
# interpolation); assignment compares raw doubles to those values.

_STR_SX, _STR_SY = 4, 4
_STR_SAMPLE = "((doc_id * 2654435761) % 1000003) < 50000"  # ~5%

_STR_SQL = f"""
WITH pts AS (
  SELECT doc_id, {_DOC_X} AS x, {_DOC_Y} AS y FROM documents
),
smp AS (
  SELECT x, y,
         CAST(ROW_NUMBER() OVER (ORDER BY x, y) AS BIGINT) AS rx,
         CAST(COUNT(*) OVER () AS BIGINT) AS n
  FROM pts WHERE {_STR_SAMPLE}
),
bx AS (
  SELECT v.i, s.x AS bound
  FROM (VALUES (1), (2), (3)) AS v(i)
  JOIN smp s ON s.rx = CAST(FLOOR(v.i * s.n / {_STR_SX}.0) AS BIGINT)
),
xs_smp AS (
  SELECT s.rx, s.x, s.y,
         CAST(COALESCE(SUM(CASE WHEN s.x > b.bound THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS xs
  FROM smp s LEFT JOIN bx b ON TRUE
  GROUP BY s.rx, s.x, s.y
),
smpy AS (
  SELECT xs, x, y,
         CAST(ROW_NUMBER() OVER (PARTITION BY xs ORDER BY y, x) AS BIGINT)
           AS ry,
         CAST(COUNT(*) OVER (PARTITION BY xs) AS BIGINT) AS m
  FROM xs_smp
),
by_ AS (
  SELECT s.xs, v.j, s.y AS bound
  FROM (VALUES (1), (2), (3)) AS v(j)
  JOIN smpy s ON s.ry = CAST(FLOOR(v.j * s.m / {_STR_SY}.0) AS BIGINT)
),
axs AS (
  SELECT p.doc_id, p.x, p.y,
         CAST(COALESCE(SUM(CASE WHEN p.x > b.bound THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS xs
  FROM pts p LEFT JOIN bx b ON TRUE
  GROUP BY 1, 2, 3
),
leaf AS (
  SELECT a.doc_id, a.x, a.y, a.xs,
         CAST(COALESCE(SUM(CASE WHEN a.y > b.bound THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS ys
  FROM axs a LEFT JOIN by_ b ON b.xs = a.xs
  GROUP BY 1, 2, 3, 4
)
SELECT xs * {_STR_SY} + ys AS leaf_id,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       ROUND(MIN(x), 4) AS xmin, ROUND(MAX(x), 4) AS xmax,
       ROUND(MIN(y), 4) AS ymin, ROUND(MAX(y), 4) AS ymax
FROM leaf
GROUP BY 1
"""


@register("str_pack_partition", _STR_SQL)
def str_pack_partition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STR packing into a 4×4 leaf grid: sample-quantile x-slices, then
    per-slice sample-quantile y-cuts, boundaries broadcast, every point
    assigned by comparisons — per-leaf occupancy and bbox."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_STR_SQL)


# --- per-zone minimum rotated rectangle (rotating calipers) -------------------
#
# terra::minRect / sf::st_minimum_rotated_rectangle analog: the
# min-AREA rectangle over each zone's point pattern, computed by the
# rotating-calipers theorem (Freeman & Shapira 1975: the optimum rect
# is flush with a hull edge).  For hull edge e=(dx,dy) the rect area
# is (Δ along e)·(Δ along normal)/|e|² — all three factors EXACT
# int64 (projections of integer points on integer edges), so the
# per-zone argmin orders by a correctly-rounded double ratio of exact
# ints (identical in both engines) with a full integer tie-chain.
# Extrema of a linear functional over a point set are attained at hull
# vertices, so the engine projects only the two-level-reduce hull
# vertices (chopin_spark.hull.convex_hull_vertices — shuffle volume =
# hull vertices); the oracle projects ALL distinct points over its
# O(n³) edge characterization — different algorithm, same extrema.
#
# Scale shape: facts reduce to per-zone hull vertices (tens) before
# any pairwise work; the edge×vertex join is O(h²) per zone.

_MRR_BODY = """
proj AS (
  SELECT e.zone_id, e.qx - e.px AS dx, e.qy - e.py AS dy,
         MAX((e.qx - e.px) * p.ix + (e.qy - e.py) * p.iy) AS emax,
         MIN((e.qx - e.px) * p.ix + (e.qy - e.py) * p.iy) AS emin,
         MAX((e.py - e.qy) * p.ix + (e.qx - e.px) * p.iy) AS nmax,
         MIN((e.py - e.qy) * p.ix + (e.qx - e.px) * p.iy) AS nmin
  FROM e JOIN {pts_src} p ON p.zone_id = e.zone_id
  GROUP BY 1, 2, 3
),
rects AS (
  -- each caliper extent is an exact int64 < 2^53 (coords < 2^20,
  -- edge deltas < 2^18), but their PRODUCT can exceed int64 — one
  -- correctly-rounded double multiply is deterministic in both
  -- engines, and the argmin ordering is unaffected
  SELECT zone_id, dx, dy,
         CAST(emax - emin AS DOUBLE) * CAST(nmax - nmin AS DOUBLE)
           AS a_scaled,
         CAST(dx * dx + dy * dy AS BIGINT) AS l2
  FROM proj
),
zarea AS (
  SELECT zone_id, CAST(SUM(px * qy - py * qx) AS BIGINT) AS area2
  FROM e GROUP BY 1
),
best AS (
  SELECT zone_id, a_scaled, l2, dx, dy,
         ROW_NUMBER() OVER (
           PARTITION BY zone_id
           ORDER BY a_scaled / l2, a_scaled, l2, dx, dy
         ) AS rk
  FROM rects WHERE a_scaled > 0
)
SELECT b.zone_id, b.dx, b.dy,
       ROUND(b.a_scaled / b.l2, 4) AS mrr_area,
       z.area2,
       ROUND(CAST(z.area2 AS DOUBLE) / 2.0 / (b.a_scaled / b.l2), 4)
         AS rectangularity
FROM best b JOIN zarea z ON z.zone_id = b.zone_id
WHERE b.rk = 1
"""

_MRR_ORACLE = f"""
WITH d AS (
  SELECT {sx.grid_cell_expr(_DOC_X, _DOC_Y, NX, NY)} AS zone_id,
         CAST(FLOOR({_DOC_X}) AS BIGINT) AS ix,
         CAST(FLOOR({_DOC_Y}) AS BIGINT) AS iy
  FROM documents
),
pts AS (SELECT DISTINCT zone_id, ix, iy FROM d),
e AS (
  SELECT p.zone_id, p.ix AS px, p.iy AS py, q.ix AS qx, q.iy AS qy
  FROM pts p JOIN pts q
    ON p.zone_id = q.zone_id AND (p.ix <> q.ix OR p.iy <> q.iy)
  WHERE NOT EXISTS (
    SELECT 1 FROM pts r
    WHERE r.zone_id = p.zone_id
      AND (r.ix <> p.ix OR r.iy <> p.iy)
      AND (r.ix <> q.ix OR r.iy <> q.iy)
      AND ({_HULL_CROSS} < 0
        OR ({_HULL_CROSS} = 0
           AND NOT (r.ix BETWEEN LEAST(p.ix, q.ix)
                             AND GREATEST(p.ix, q.ix)
                AND r.iy BETWEEN LEAST(p.iy, q.iy)
                             AND GREATEST(p.iy, q.iy))))
  )
),
{_MRR_BODY.strip().format(pts_src="pts")}
"""

_MRR_SPARK = f"""
WITH nv AS (SELECT zone_id, COUNT(*) AS n FROM hull_verts GROUP BY 1),
e AS (
  SELECT v.zone_id, v.ix AS px, v.iy AS py, w.ix AS qx, w.iy AS qy
  FROM hull_verts v
  JOIN nv ON nv.zone_id = v.zone_id
  JOIN hull_verts w ON w.zone_id = v.zone_id
                   AND w.vidx = (v.vidx + 1) % nv.n
),
{_MRR_BODY.strip().format(pts_src="hull_verts")}
"""


@register("zone_min_rotated_rect", _MRR_ORACLE)
def zone_min_rotated_rect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-zone minimum rotated rectangle via rotating calipers over
    the distributed hull — exact-integer caliper extrema, argmin by a
    correctly-rounded ratio with a full integer tie-chain."""
    from chopin_spark.hull import convex_hull_vertices

    docs = load(spark, sf_dir, "documents").select(
        F.expr(sx.grid_cell_expr(_DOC_X, _DOC_Y, NX, NY)).alias("zone_id"),
        F.expr(f"CAST(FLOOR({_DOC_X}) AS BIGINT)").alias("ix"),
        F.expr(f"CAST(FLOOR({_DOC_Y}) AS BIGINT)").alias("iy"),
    )
    convex_hull_vertices(docs).createOrReplaceTempView("hull_verts")
    return spark.sql(_MRR_SPARK)


# --- RANSAC robust line fit (Fischler & Bolles 1981) ---------------------------
#
# Deterministic-hypothesis RANSAC over the document point pattern: 64
# candidate lines through LCG-drawn point pairs (doc_id is contiguous
# from 0 at every sf, so the draw is pure modular arithmetic), inlier
# = perpendicular distance <= tol, winner = max inlier count (tie:
# smallest hypothesis id).  The distance test clears the division:
# cross((P2-P1), (P-P1))^2 <= tol^2 * |P2-P1|^2 — cross is exact int64
# (< 2^41 on quantized meters... here < 2^41? coords < 2^20 so cross
# < 2^41), and both squared sides are single correctly-rounded double
# products of exact ints — identical in both engines, so the inlier
# predicate is deterministic.
#
# Scale shape: hypotheses are a fixed 64-row broadcast dimension; the
# inlier count is one (hypothesis x fact) broadcast join + agg — fact
# rows are touched 64x by column math, never pairwise with each other.

_RS_NHYP = 64
_RS_TOL = 20_000.0  # metres


def _ransac_sql(hyp_seq: str) -> str:
    return f"""
WITH pts AS (
  SELECT CAST(doc_id AS BIGINT) AS id,
         CAST(FLOOR({_DOC_X}) AS BIGINT) AS x,
         CAST(FLOOR({_DOC_Y}) AS BIGINT) AS y
  FROM documents
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM pts),
hyp0 AS (
  SELECT h, (h * 69069 + 7) % n.c AS ia, (h * 48271 + 13) % n.c AS ib
  FROM ({hyp_seq}) q CROSS JOIN n
),
hyp AS (
  SELECT h0.h, a.x AS x1, a.y AS y1, b.x AS x2, b.y AS y2
  FROM hyp0 h0
  JOIN pts a ON a.id = h0.ia
  JOIN pts b ON b.id = h0.ib
  WHERE a.x <> b.x OR a.y <> b.y
),
scored AS (
  SELECT hyp.h, hyp.x1, hyp.y1, hyp.x2, hyp.y2,
         CAST(SUM(CASE WHEN
           CAST((hyp.x2 - hyp.x1) * (p.y - hyp.y1)
                - (hyp.y2 - hyp.y1) * (p.x - hyp.x1) AS DOUBLE)
           * CAST((hyp.x2 - hyp.x1) * (p.y - hyp.y1)
                  - (hyp.y2 - hyp.y1) * (p.x - hyp.x1) AS DOUBLE)
           <= {_RS_TOL} * {_RS_TOL}
              * (CAST((hyp.x2 - hyp.x1) * (hyp.x2 - hyp.x1)
                      + (hyp.y2 - hyp.y1) * (hyp.y2 - hyp.y1) AS DOUBLE))
           THEN 1 ELSE 0 END) AS BIGINT) AS n_inliers,
         CAST(COUNT(*) AS BIGINT) AS n_pts
  FROM hyp CROSS JOIN pts p
  GROUP BY 1, 2, 3, 4, 5
)
SELECT h AS best_hypothesis, x1, y1, x2, y2, n_inliers,
       ROUND(CAST(n_inliers AS DOUBLE) / n_pts, 4) AS inlier_share
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY n_inliers DESC, h ASC) AS rk
  FROM scored
) q WHERE rk = 1
"""


_RS_SEQ_SPARK = (
    "SELECT CAST(x AS BIGINT) AS h"
    f" FROM (SELECT explode(sequence(0, {_RS_NHYP - 1})) AS x)"
)
_RS_SEQ_DUCK = (
    "SELECT CAST(UNNEST(generate_series(0,"
    f" {_RS_NHYP - 1})) AS BIGINT) AS h"
)


@register("ransac_line_fit", _ransac_sql(_RS_SEQ_DUCK))
def ransac_line_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANSAC consensus line over the document points: 64 deterministic
    LCG hypotheses, division-free inlier tests, max-consensus winner."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_ransac_sql(_RS_SEQ_SPARK))


# --- residential-segregation indices over the document grid -------------------
#
# The classic Duncan & Duncan (1955) evenness/exposure pair, applied to
# language-over-zones (the webtext analog of group-over-tracts):
# dissimilarity D_L = Σ_z |a_z·B − b_z·A| / (2AB) with a = lang-L docs,
# b = all others (exact int64 numerator, ONE division), and isolation
# P*_L = (1/A)·Σ_z a_z²/t_z with every term floor-quantized to
# micro-units BEFORE the sum (int64 carrier, reduction-order-free —
# the repo's quantize-then-SUM discipline).  The lang×zone grid is
# densified (zones where a lang is absent still contribute b_z·A to
# D), at |zones|·|langs| rows — metadata-sized at any corpus scale.
# int64 bounds: the D numerator Σ|a·B − b·A| ≤ 2AB ≤ n²/2 holds to
# ~10^9 docs, but iso_q's a_z²·10^6 carrier binds FIRST — it overflows
# once a single lang×zone cell exceeds ~3.0×10^6 docs (sqrt(2^63/10^6)).
# Past either bound the affected column becomes DECIMAL(38,0), same
# plan; iso_q hits its switch at a much lower n than the D numerator.  Reference kinship: chopin's grouped zonal summaries
# (R/calculate.R summarize_aw groupwise shares); statistic itself is
# public-domain demography.

_SEG_SQL = f"""
WITH zl AS (
  SELECT {{zone}} AS zone_id, lang, CAST(COUNT(*) AS BIGINT) AS a
  FROM documents GROUP BY 1, 2
),
zt AS (SELECT zone_id, CAST(SUM(a) AS BIGINT) AS t FROM zl GROUP BY 1),
lt AS (SELECT lang, CAST(SUM(a) AS BIGINT) AS atot FROM zl GROUP BY 1),
tot AS (SELECT CAST(SUM(a) AS BIGINT) AS n FROM zl),
grid AS (
  SELECT l.lang, l.atot, z.zone_id, z.t, n.n,
         COALESCE(x.a, CAST(0 AS BIGINT)) AS a
  FROM lt l CROSS JOIN zt z CROSS JOIN tot n
  LEFT JOIN zl x ON x.lang = l.lang AND x.zone_id = z.zone_id
),
terms AS (
  SELECT lang, atot, n,
         ABS(a * (n - atot) - (t - a) * atot) AS dnum,
         CASE WHEN a = 0 THEN CAST(0 AS BIGINT)
              ELSE CAST(((a * a * 1000000) - ((a * a * 1000000) % t)) / t
                        AS BIGINT) END AS iso_q
  FROM grid
)
SELECT lang, CAST(atot AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(dnum) AS DOUBLE)
             / (2.0 * atot * (n - atot)), 6) AS duncan_d,
       ROUND(CAST(SUM(iso_q) AS DOUBLE) / (atot * 1000000.0), 6)
         AS isolation
FROM terms GROUP BY lang, atot, n
"""

_SEG_BODY = _SEG_SQL.format(zone=sx.grid_cell_expr(_DOC_X, _DOC_Y, NX, NY))


@register("lang_segregation_duncan", _SEG_BODY)
def lang_segregation_duncan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duncan dissimilarity + isolation index per language over the
    8×6 document grid: exact cross-product numerators, micro-quantized
    isolation terms, one division per statistic."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_SEG_BODY)
