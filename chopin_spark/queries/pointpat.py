"""Point-pattern analysis and ESDA completion: bivariate Moran's I,
General G, quadrat CSR test, Clark–Evans nearest-neighbor index,
standard deviational ellipse, Weiszfeld median center, Mann–Whitney U.

These close out the exploratory-spatial-data-analysis battery around
the existing Moran/Geary/Gi*/LISA/Ripley/Knox/join-count queries — the
statistics chopin users compute downstream of its zonal summaries
(spdep/spatstat parity shapes).  Shared-SQL discipline throughout: all
reductions are int64 sums of per-row integer (or integer-quantized)
terms; closed-form statistics are fixed double expressions over those
exact integers, with transcendentals (SQRT/ATAN2) confined to the final
ROUND()ed output columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark import EXTENT
from chopin_spark import sqlexpr as sx
from chopin_spark.grid import make_regular_grid
from chopin_spark.queries import register
from chopin_spark.tables import load
from chopin_spark.vector import knn_join
from chopin_spark.zones import TRACT_H, TRACT_NX, TRACT_NY, TRACT_W

_DX = sx.x_expr("doc_id")
_DY = sx.y_expr("doc_id")
_EX = sx.x_expr("event_id")
_EY = sx.y_expr("event_id")

_NZ = TRACT_NX * TRACT_NY

_CELLS_SPARK = f"""
cells AS (
  SELECT gx, gy
  FROM (SELECT explode(sequence(0, {TRACT_NX - 1})) AS gx)
  CROSS JOIN (SELECT explode(sequence(0, {TRACT_NY - 1})) AS gy)
)"""

_CELLS_DUCK = f"""
cells AS (
  SELECT g1.gx, g2.gy
  FROM generate_series(0, {TRACT_NX - 1}) AS g1(gx),
       generate_series(0, {TRACT_NY - 1}) AS g2(gy)
)"""


# --- bivariate Moran's I (page mass vs event mass) ----------------------------
#
# GeoDa's bivariate global Moran: how variable x at a tract co-varies
# with the spatial lag of variable y.  Same integer centering identity
# as the univariate statistic (DX = n·x − Sx, DY = n·y − Sy): the n²
# scale cancels between the cross-product numerator and the two
# denominator sums, so num/denx/deny are exact int64 and only the final
# ratio is a double.

_BVMORAN_BODY = f"""
zx AS (
  SELECT c.gx, c.gy, COALESCE(SUM(d.n_chars), 0) AS x
  FROM cells c LEFT JOIN d ON d.gx = c.gx AND d.gy = c.gy
  GROUP BY 1, 2
),
zy AS (
  SELECT c.gx, c.gy, COALESCE(COUNT(e.gx), 0) AS y
  FROM cells c LEFT JOIN e ON e.gx = c.gx AND e.gy = c.gy
  GROUP BY 1, 2
),
t AS (
  SELECT zx.gx, zx.gy,
         CAST({_NZ} AS BIGINT) * zx.x - (SELECT SUM(x) FROM zx) AS ddx,
         CAST({_NZ} AS BIGINT) * zy.y - (SELECT SUM(y) FROM zy) AS ddy
  FROM zx JOIN zy ON zx.gx = zy.gx AND zx.gy = zy.gy
),
nb AS (
  SELECT t.gx + o.dx AS ngx, t.gy + o.dy AS ngy, t.ddx
  FROM t CROSS JOIN (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS o(dx, dy)
),
pairs AS (
  SELECT nb.ddx AS d1, t2.ddy AS d2
  FROM nb JOIN t t2 ON nb.ngx = t2.gx AND nb.ngy = t2.gy
)
SELECT CAST({_NZ} AS BIGINT) AS n_zones,
       (SELECT COUNT(*) FROM pairs) AS w_links,
       (SELECT CAST(SUM(d1 * d2) AS BIGINT) FROM pairs) AS num,
       (SELECT CAST(SUM(ddx * ddx) AS BIGINT) FROM t) AS denx,
       (SELECT CAST(SUM(ddy * ddy) AS BIGINT) FROM t) AS deny,
       ROUND(
         CAST({_NZ} AS DOUBLE) * (SELECT SUM(d1 * d2) FROM pairs)
         / (CAST((SELECT COUNT(*) FROM pairs) AS DOUBLE)
            * SQRT(CAST((SELECT SUM(ddx * ddx) FROM t) AS DOUBLE))
            * SQRT(CAST((SELECT SUM(ddy * ddy) FROM t) AS DOUBLE))),
         6) AS moran_bv
"""

_BV_D = f"""
d AS (
  SELECT CAST(FLOOR({_DX} / {TRACT_W!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_DY} / {TRACT_H!r}) AS BIGINT) AS gy,
         n_chars
  FROM documents
),
e AS (
  SELECT CAST(FLOOR({_EX} / {TRACT_W!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_EY} / {TRACT_H!r}) AS BIGINT) AS gy
  FROM events
)"""

_BVMORAN_SPARK = f"WITH {_CELLS_SPARK.strip()},\n{_BV_D.strip()},\n{_BVMORAN_BODY}"
_BVMORAN_ORACLE = f"WITH {_CELLS_DUCK.strip()},\n{_BV_D.strip()},\n{_BVMORAN_BODY}"


@register("moran_i_bivariate", _BVMORAN_ORACLE)
def moran_i_bivariate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate global Moran's I: per-tract page mass against the
    rook-lag of event mass.  Scale shape: two fact scans fold to the
    256-row zone table before any pair math — the join face is always
    zones×4 regardless of fact size."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_BVMORAN_SPARK)


# --- General G (global high-value clustering) ---------------------------------
#
# Getis-Ord's global G = Σ_rook x_i·x_j / Σ_{i≠j} x_i·x_j: are high
# values near high values overall?  The denominator needs no pair
# enumeration — Σ_{i≠j} x_i x_j = (Σx)² − Σx² exactly.

_GENG_BODY = f"""
z AS (
  SELECT c.gx, c.gy, COALESCE(SUM(d.n_chars), 0) AS x
  FROM cells c LEFT JOIN d ON d.gx = c.gx AND d.gy = c.gy
  GROUP BY 1, 2
),
nb AS (
  SELECT z.gx + o.dx AS ngx, z.gy + o.dy AS ngy, z.x
  FROM z CROSS JOIN (VALUES (1, 0), (-1, 0), (0, 1), (0, -1)) AS o(dx, dy)
),
pairs AS (
  SELECT nb.x AS x1, z2.x AS x2
  FROM nb JOIN z z2 ON nb.ngx = z2.gx AND nb.ngy = z2.gy
)
SELECT CAST({_NZ} AS BIGINT) AS n_zones,
       (SELECT COUNT(*) FROM pairs) AS w_links,
       (SELECT CAST(SUM(x1 * x2) AS BIGINT) FROM pairs) AS num,
       (SELECT CAST(SUM(x) AS BIGINT) * CAST(SUM(x) AS BIGINT)
               - CAST(SUM(x * x) AS BIGINT) FROM z) AS den,
       ROUND(
         (SELECT SUM(x1 * x2) FROM pairs)
         / CAST((SELECT CAST(SUM(x) AS BIGINT) * CAST(SUM(x) AS BIGINT)
                        - CAST(SUM(x * x) AS BIGINT) FROM z) AS DOUBLE),
         8) AS general_g
"""

_G_D = f"""
d AS (
  SELECT CAST(FLOOR({_DX} / {TRACT_W!r}) AS BIGINT) AS gx,
         CAST(FLOOR({_DY} / {TRACT_H!r}) AS BIGINT) AS gy,
         n_chars
  FROM documents
)"""

_GENG_SPARK = f"WITH {_CELLS_SPARK.strip()},\n{_G_D.strip()},\n{_GENG_BODY}"
_GENG_ORACLE = f"WITH {_CELLS_DUCK.strip()},\n{_G_D.strip()},\n{_GENG_BODY}"


@register("general_g_tracts", _GENG_ORACLE)
def general_g_tracts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global General G of per-tract page mass over rook weights — the
    global companion of the per-tract Gi* hotspot query."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_GENG_SPARK)


# --- quadrat test of complete spatial randomness ------------------------------
#
# spatstat::quadrat.test shape: counts per 8×6 quadrat, Pearson X²
# against the uniform expectation via the integer identity
# X² = (k·Σc² − n²)/n, plus the variance-mean ratio (k·Σc² − n²)/((k−1)·n).

_QNX, _QNY = 8, 6
_QK = _QNX * _QNY

_QUADRAT_BODY = f"""
q AS (
  SELECT c.gx, c.gy, COALESCE(COUNT(d.gx), 0) AS cnt
  FROM cells c LEFT JOIN d ON d.gx = c.gx AND d.gy = c.gy
  GROUP BY 1, 2
),
s AS (
  SELECT CAST(SUM(cnt) AS BIGINT) AS n,
         CAST(SUM(cnt * cnt) AS BIGINT) AS s2
  FROM q
)
SELECT n AS n_points,
       CAST({_QK} AS BIGINT) AS n_quadrats,
       CAST({_QK - 1} AS BIGINT) AS dof,
       ROUND(({_QK} * CAST(s2 AS DOUBLE) - CAST(n AS DOUBLE) * n) / n,
             6) AS chi2,
       ROUND(({_QK} * CAST(s2 AS DOUBLE) - CAST(n AS DOUBLE) * n)
             / ({_QK - 1.0} * n),
             6) AS vmr
FROM s
"""

_QCELLS_SPARK = f"""
cells AS (
  SELECT gx, gy
  FROM (SELECT explode(sequence(0, {_QNX - 1})) AS gx)
  CROSS JOIN (SELECT explode(sequence(0, {_QNY - 1})) AS gy)
)"""

_QCELLS_DUCK = f"""
cells AS (
  SELECT g1.gx, g2.gy
  FROM generate_series(0, {_QNX - 1}) AS g1(gx),
       generate_series(0, {_QNY - 1}) AS g2(gy)
)"""

_Q_D = f"""
d AS (
  SELECT {sx.grid_ix_expr(_DX, _QNX)} AS gx,
         {sx.grid_iy_expr(_DY, _QNY)} AS gy
  FROM documents
)"""

_QUADRAT_SPARK = f"WITH {_QCELLS_SPARK.strip()},\n{_Q_D.strip()},\n{_QUADRAT_BODY}"
_QUADRAT_ORACLE = f"WITH {_QCELLS_DUCK.strip()},\n{_Q_D.strip()},\n{_QUADRAT_BODY}"


@register("quadrat_csr_test", _QUADRAT_ORACLE)
def quadrat_csr_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quadrat test of CSR for the document point pattern: Pearson X²
    and variance-mean ratio of 8×6 quadrat counts, both exact-integer
    to the final division."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_QUADRAT_SPARK)


# --- Clark–Evans nearest-neighbor index ---------------------------------------
#
# R = observed mean NN distance / expected under CSR (0.5·√(A/n)), with
# the standard-error z.  Spark side: the doc→doc kNN machinery (k = 2,
# self included at distance 0, then dropped) — cell equi-join + ring
# fallback, never n²; the oracle brute-forces the pair minimum.  NN
# distances quantize to mm before the sum.

_CE_RADIUS = 60_000.0
_CE_GNX, _CE_GNY = 8, 6
_AREA = (EXTENT[2] - EXTENT[0]) * (EXTENT[3] - EXTENT[1])

_CE_FINAL = f"""
SELECT n AS n_points,
       ROUND(sumq / 1000.0 / n, 4) AS mean_nn_dist,
       ROUND((sumq / 1000.0 / n)
             / (0.5 * SQRT({_AREA!r} / n)), 6) AS clark_evans_r,
       ROUND(((sumq / 1000.0 / n) - 0.5 * SQRT({_AREA!r} / n))
             / (0.26136 * SQRT({_AREA!r} / (CAST(n AS DOUBLE) * n))),
             6) AS z_score
FROM s
"""

_CE_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_DX} AS x, {_DY} AS y FROM documents
),
nn AS (
  SELECT a.doc_id,
         MIN(SQRT((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)))
           AS nn_dist
  FROM d a JOIN d b ON a.doc_id <> b.doc_id
  GROUP BY 1
),
s AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         CAST(SUM(CAST(FLOOR(nn_dist * 1000 + 0.5) AS BIGINT)) AS DOUBLE)
           AS sumq
  FROM nn
)
{_CE_FINAL}
"""


@register("clark_evans_index", _CE_ORACLE)
def clark_evans_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clark–Evans aggregation index of the document pattern.  The NN
    distance comes from the exact knn_join (k = 2 over the pattern
    itself; the rank-1 self-pair at distance 0 is dropped), so the
    plan is the density-bounded cell join + ring fallback that holds
    at 10^12 points — the oracle's n² enumeration is gate-scale only."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_DX).alias("x"), F.expr(_DY).alias("y")
    )
    ctx = docs.select(
        F.col("doc_id").alias("cid"), "x", "y"
    )
    g = make_regular_grid(_CE_GNX, _CE_GNY, pad=_CE_RADIUS)
    knn = knn_join(docs, ctx, g, "doc_id", "cid", _CE_RADIUS, k=2)
    nn = (
        knn.filter(F.col("nn_id") != F.col("doc_id"))
        .groupBy("doc_id")
        .agg(F.min("nn_dist").alias("nn_dist"))
    )
    s = nn.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(
            F.expr("CAST(FLOOR(nn_dist * 1000 + 0.5) AS BIGINT)")
        ).cast("double").alias("sumq"),
    )
    s.createOrReplaceTempView("s")
    return spark.sql(_CE_FINAL)


# --- standard deviational ellipse ---------------------------------------------
#
# The crime-analysis dispersion summary (ArcGIS Standard Deviational
# Ellipse / CrimeStat SDE): mean center, orientation and axis lengths
# from the eigen-decomposition of the coordinate covariance.  Meter-
# quantized coordinates make all five moments exact int64; the
# centered second moments use the n·Sxx − Sx² identity in double.

_SDE_BODY = """
s AS (
  SELECT COUNT(*) AS n,
         SUM(xi) AS sx, SUM(yi) AS sy,
         SUM(xi * xi) AS sxx, SUM(yi * yi) AS syy, SUM(xi * yi) AS sxy
  FROM pts
),
v AS (
  SELECT n, sx, sy,
         CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx AS vxx,
         CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy AS vyy,
         CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy AS vxy
  FROM s
)
SELECT n AS n_points,
       ROUND(CAST(sx AS DOUBLE) / n, 4) AS mean_x,
       ROUND(CAST(sy AS DOUBLE) / n, 4) AS mean_y,
       ROUND(0.5 * ATAN2(2.0 * vxy, vxx - vyy), 6) AS theta_rad,
       ROUND(SQRT(((vxx + vyy)
                   + SQRT((vxx - vyy) * (vxx - vyy) + 4.0 * vxy * vxy))
                  / 2.0) / n, 4) AS sigma_major,
       ROUND(SQRT(((vxx + vyy)
                   - SQRT((vxx - vyy) * (vxx - vyy) + 4.0 * vxy * vxy))
                  / 2.0) / n, 4) AS sigma_minor
FROM v
"""

_SDE_PTS = f"""
pts AS (
  SELECT CAST(FLOOR({_DX} + 0.5) AS BIGINT) AS xi,
         CAST(FLOOR({_DY} + 0.5) AS BIGINT) AS yi
  FROM documents
)"""

_SDE_SQL = f"WITH {_SDE_PTS.strip()},\n{_SDE_BODY}"


@register("std_deviational_ellipse", _SDE_SQL)
def std_deviational_ellipse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Standard deviational ellipse of the document pattern: mean
    center, orientation (ATAN2 on exact moment doubles, ROUND grain),
    and major/minor axis standard deviations.  One scan, one 6-moment
    hash-agg — map-side combine does all the work at any scale."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_SDE_SQL)


# --- Weiszfeld median center (3 unrolled iterations) ---------------------------
#
# The spatial median (Weber point) via Weiszfeld reweighting, the
# robust companion of the mean center.  Every iteration is one
# kernel-weighted agg over the fact (weights = FLOOR(1e9/softened
# distance), int64) joined to the 1-row previous center — fixed-depth
# unrolled CTEs, bit-reproducible, no driver loop.

_WZ_SOFT = 1.0e6  # d² softening (1 km) bounds weights when d → 0


def _wz_iter(k: int) -> str:
    return f"""
it{k} AS (
  SELECT CAST(FLOOR(CAST(SUM(w * xi) AS DOUBLE) / SUM(w) + 0.5) AS BIGINT)
           AS cx,
         CAST(FLOOR(CAST(SUM(w * yi) AS DOUBLE) / SUM(w) + 0.5) AS BIGINT)
           AS cy
  FROM (
    SELECT p.xi, p.yi,
           CAST(FLOOR(1.0e9 / SQRT((p.xi - c.cx) * (p.xi - c.cx)
                                   + (p.yi - c.cy) * (p.yi - c.cy)
                                   + {_WZ_SOFT!r}) + 0.5) AS BIGINT) AS w
    FROM pts p CROSS JOIN it{k - 1} c
  ) wpts
)"""


_WZ_SQL = (
    f"""
WITH {_SDE_PTS.strip()},
it0 AS (
  SELECT CAST(FLOOR(CAST(SUM(xi) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
           AS cx,
         CAST(FLOOR(CAST(SUM(yi) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT)
           AS cy
  FROM pts
),"""
    + ",".join(_wz_iter(k) for k in range(1, 4))
    + """,
fin AS (
  SELECT ROUND(CAST(SUM(CAST(FLOOR(SQRT((p.xi - c.cx) * (p.xi - c.cx)
                                        + (p.yi - c.cy) * (p.yi - c.cy))
                                   * 1000 + 0.5) AS BIGINT)) AS DOUBLE)
               / 1000.0 / COUNT(*), 4) AS mean_dist_to_median
  FROM pts p CROSS JOIN it3 c
)
SELECT it0.cx AS mean_cx, it0.cy AS mean_cy,
       it3.cx AS median_cx, it3.cy AS median_cy,
       fin.mean_dist_to_median
FROM it0 CROSS JOIN it3 CROSS JOIN fin
"""
)


@register("median_center_weiszfeld", _WZ_SQL)
def median_center_weiszfeld(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weiszfeld median center of the document pattern after three
    synchronous reweighting rounds from the mean center, plus the mean
    distance to it.  Per round: fact scan × 1-row broadcast center →
    one hash-agg; rounds are unrolled into a single Catalyst plan."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_WZ_SQL)


# --- Mann–Whitney U (rank-sum test between two languages) ----------------------
#
# The rank-based two-sample location test next to the existing exact
# KS statistic: U and the tie-corrected normal approximation z for
# en-vs-es document lengths.  Ranks come from value-grouped cumulative
# counts (no per-row window sort at scale — the grouped frame is
# value-cardinality sized), average ranks are exact half-integers
# carried as 2×rank int64.

_MWU_L1, _MWU_L2 = "en", "es"

_MWU_SQL = f"""
WITH g AS (
  SELECT CAST(n_chars AS BIGINT) AS v,
         SUM(CASE WHEN lang = '{_MWU_L1}' THEN 1 ELSE 0 END) AS c1,
         SUM(CASE WHEN lang = '{_MWU_L2}' THEN 1 ELSE 0 END) AS c2
  FROM documents
  WHERE lang IN ('{_MWU_L1}', '{_MWU_L2}')
  GROUP BY 1
),
cum AS (
  SELECT v, c1, c2, c1 + c2 AS ct,
         COALESCE(SUM(c1 + c2) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS below
  FROM g
),
s AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1,
         CAST(SUM(c2) AS BIGINT) AS n2,
         CAST(SUM(c1 * (2 * below + ct + 1)) AS BIGINT) AS r1x2,
         CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS ties
  FROM cum
)
SELECT n1, n2,
       CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
       ties AS tie_term,
       ROUND((CAST(r1x2 - n1 * (n1 + 1) AS DOUBLE) / 2.0 - CAST(n1 AS DOUBLE) * n2 / 2.0)
             / SQRT((CAST(n1 AS DOUBLE) * n2 / 12.0)
                    * ((n1 + n2 + 1.0)
                       - CAST(ties AS DOUBLE)
                         / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2 - 1.0)))),
             6) AS z_score
FROM s
"""


@register("mann_whitney_u_lang", _MWU_SQL)
def mann_whitney_u_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U between en and es document lengths with tie
    correction — rank sums from value-grouped cumulative counts, so
    the only window runs over the distinct-value frame."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_MWU_SQL)


# --- box-counting (Minkowski) fractal dimension --------------------------------
#
# Multi-scale occupancy of the document pattern: occupied-cell counts
# at four dyadic grid scales, and the box-counting dimension as the
# OLS slope of ln(N) on ln(1/s) — the multi-resolution summary used to
# pick partition granularity (a dimension near 2 = space-filling, fine
# grids pay off; near 0 = concentrated, salting matters more).  Counts
# are exact; logs land on the 1e-6 lattice before the moment sums.

_BC_SCALES = (1, 2, 4, 8)  # multipliers over the 8×6 base grid


_BC_SQL = (
    "WITH occ AS (\n"
    + "\n  UNION ALL\n".join(
        f"""  SELECT CAST({m} AS BIGINT) AS lvl, COUNT(*) AS n_occ
  FROM (SELECT DISTINCT {sx.grid_ix_expr(_DX, 8 * m)} * 1024
               + {sx.grid_iy_expr(_DY, 6 * m)} AS c
        FROM documents) u{m}"""
        for m in _BC_SCALES
    )
    + f"""
),
lat AS (
  SELECT CAST(FLOOR(LN(CAST(lvl AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           AS x,
         CAST(FLOOR(LN(CAST(n_occ AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)
           AS y,
         lvl, n_occ
  FROM occ
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM lat
)
SELECT (SELECT n_occ FROM occ WHERE lvl = 1) AS n_occ_base,
       (SELECT n_occ FROM occ WHERE lvl = 8) AS n_occ_finest,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx),
             6) AS box_dimension
FROM s
"""
)


@register("box_counting_dimension", _BC_SQL)
def box_counting_dimension(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Box-counting dimension of the document pattern over four dyadic
    grid scales (8×6 … 64×48) — each scale is one DISTINCT-cell agg
    over the same scan; the UNION of four scale branches re-reads only
    the two derived coordinate columns."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_BC_SQL)


# --- G- and F-functions (NN-distance / empty-space ECDFs) -----------------------
#
# spatstat's Gest/Fest pair: G = ECDF of point-to-nearest-point
# distances (reuses the Clark–Evans NN machinery), F = ECDF of
# empty-space distances from a fixed 48-probe lattice to the nearest
# point.  Both against the CSR reference 1 − exp(−λπr²).  The F probes
# are metadata (broadcast); at corpus scale both NN stages are the
# bounded cell join + ring fallback, never n².

_GF_RADII = (5_000.0, 10_000.0, 15_000.0, 20_000.0, 30_000.0)


def _ecdf_select(nn_view: str, n_expr: str) -> str:
    bins = ",\n".join(
        f"""       ROUND(SUM(CASE WHEN nn_dist <= {r!r} THEN 1 ELSE 0 END)
             / {n_expr}, 6) AS ecdf_{int(r // 1000)}km"""
        for r in _GF_RADII
    )
    return f"SELECT\n{bins}\nFROM {nn_view}"


_G_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_DX} AS x, {_DY} AS y FROM documents
),
nn AS (
  SELECT a.doc_id,
         MIN(SQRT((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)))
           AS nn_dist
  FROM d a JOIN d b ON a.doc_id <> b.doc_id
  GROUP BY 1
)
{_ecdf_select('nn', 'CAST(COUNT(*) AS DOUBLE)')}
"""


@register("gfunction_nn_ecdf", _G_ORACLE)
def gfunction_nn_ecdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """G-function (NN-distance ECDF) of the document pattern at five
    radii — exact NN via knn_join (k=2, self dropped)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_DX).alias("x"), F.expr(_DY).alias("y")
    )
    ctx = docs.select(F.col("doc_id").alias("cid"), "x", "y")
    g = make_regular_grid(_CE_GNX, _CE_GNY, pad=_CE_RADIUS)
    knn = knn_join(docs, ctx, g, "doc_id", "cid", _CE_RADIUS, k=2)
    nn = (
        knn.filter(F.col("nn_id") != F.col("doc_id"))
        .groupBy("doc_id")
        .agg(F.min("nn_dist").alias("nn_dist"))
    )
    nn.createOrReplaceTempView("gf_nn")
    return docs.sparkSession.sql(
        _ecdf_select("gf_nn", "CAST(COUNT(*) AS DOUBLE)")
    )


_F_PROBE_CELLS_SPARK = """
  (SELECT explode(sequence(0, 7)) AS pi)
  CROSS JOIN (SELECT explode(sequence(0, 5)) AS pj)
"""
_F_PROBE_CELLS_DUCK = """
  generate_series(0, 7) AS g1(pi), generate_series(0, 5) AS g2(pj)
"""


def _f_sql(gen: str) -> str:
    return f"""
WITH d AS (
  SELECT {_DX} AS x, {_DY} AS y FROM documents
),
probes AS (
  SELECT pi * 6 + pj AS probe_id,
         (pi + 0.5) * 100000.0 AS px, (pj + 0.5) * 100000.0 AS py
  FROM {gen}
),
nn AS (
  SELECT probe_id,
         MIN(SQRT((x - px) * (x - px) + (y - py) * (y - py))) AS nn_dist
  FROM probes CROSS JOIN d
  GROUP BY 1
)
{_ecdf_select('nn', 'CAST(48 AS DOUBLE)')}
"""


@register("ffunction_empty_space", _f_sql(_F_PROBE_CELLS_DUCK))
def ffunction_empty_space(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F-function (empty-space ECDF): distance from a fixed 48-probe
    lattice to the nearest document, at five radii.  Probe table
    broadcast; the MIN folds map-side, so the fact never shuffles."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_f_sql(_F_PROBE_CELLS_SPARK))


# --- colocation quotient (CLQ) matrix ------------------------------------------
#
# Leslie & Kronenfeld's colocation quotient: for language pair (A, B),
# CLQ_A→B = (C_A→B / N_A) / (N_B' / (N−1)) where C_A→B counts A-points
# whose nearest OTHER point is a B-point and N_B' excludes the A point
# itself when A = B — the categorical-attraction statistic the cross-K
# curve can't give (cross-K is symmetric in distance, CLQ is
# directional in CATEGORY).  CLQ > 1: A seeks B; < 1: A avoids B.
#
# Scale shape: the NN stage is the exact knn_join (cell join + ring
# fallback, k=2 with the self row dropped — never an n² face); the
# quotient arithmetic runs on the 25-row language-pair matrix.  The
# oracle recomputes NN by brute force with the same (dist, id)
# tie-break, so a hash match certifies the index finds the true
# nearest neighbor AND its category.

_CLQ_ORACLE = f"""
WITH d AS (
  SELECT doc_id, lang, {_DX} AS x, {_DY} AS y FROM documents
),
nnr AS (
  SELECT a.doc_id, a.lang AS lang_a, b.lang AS lang_b,
         ROW_NUMBER() OVER (
           PARTITION BY a.doc_id
           ORDER BY (a.x - b.x) * (a.x - b.x)
                    + (a.y - b.y) * (a.y - b.y), b.doc_id
         ) AS rnk
  FROM d a JOIN d b ON a.doc_id <> b.doc_id
),
c AS (
  SELECT lang_a, lang_b, CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM nnr WHERE rnk = 1 GROUP BY 1, 2
),
n AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM d)
SELECT c.lang_a, c.lang_b, c.c_ab, na.n AS n_a, nb.n AS n_b,
       ROUND((CAST(c.c_ab AS DOUBLE) / na.n)
             / (CAST(nb.n - CASE WHEN c.lang_a = c.lang_b
                                 THEN 1 ELSE 0 END AS DOUBLE)
                / (nt - 1)), 6) AS clq
FROM c
JOIN n na ON na.lang = c.lang_a
JOIN n nb ON nb.lang = c.lang_b
CROSS JOIN tot
"""


@register("colocation_quotient_langs", _CLQ_ORACLE)
def colocation_quotient_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional colocation quotient between language pairs, NN via
    the exact cell-indexed knn_join (k=2, self dropped, (dist, id)
    tie-break); quotient arithmetic on the 25-row pair matrix."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.expr(_DX).alias("x"), F.expr(_DY).alias("y")
    )
    ctx = docs.select(
        F.col("doc_id").alias("cid"), F.col("lang").alias("clang"),
        "x", "y",
    )
    g = make_regular_grid(_CE_GNX, _CE_GNY, pad=_CE_RADIUS)
    knn = knn_join(docs, ctx.drop("clang"), g, "doc_id", "cid",
                   _CE_RADIUS, k=2)
    nn = (
        knn.filter(F.col("nn_id") != F.col("doc_id"))
        .groupBy("doc_id")
        .agg(F.min(F.struct("nn_dist", "nn_id")).alias("_m"))
        .select("doc_id", F.col("_m.nn_id").alias("nn_id"))
    )
    spark_docs = docs.select("doc_id", "lang")
    nbl = ctx.select(F.col("cid").alias("nn_id"),
                     F.col("clang").alias("lang_b"))
    pairs = (
        nn.join(spark_docs, "doc_id")
        .join(F.broadcast(nbl), "nn_id")
        .select(F.col("lang").alias("lang_a"), "lang_b")
    )
    pairs.createOrReplaceTempView("clq_pairs")
    spark_docs.createOrReplaceTempView("clq_docs")
    return spark.sql("""
WITH c AS (
  SELECT lang_a, lang_b, CAST(COUNT(*) AS BIGINT) AS c_ab
  FROM clq_pairs GROUP BY 1, 2
),
n AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM clq_docs GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM clq_docs)
SELECT c.lang_a, c.lang_b, c.c_ab, na.n AS n_a, nb.n AS n_b,
       ROUND((CAST(c.c_ab AS DOUBLE) / na.n)
             / (CAST(nb.n - CASE WHEN c.lang_a = c.lang_b
                                 THEN 1 ELSE 0 END AS DOUBLE)
                / (nt - 1)), 6) AS clq
FROM c
JOIN n na ON na.lang = c.lang_a
JOIN n nb ON nb.lang = c.lang_b
CROSS JOIN tot
""")
