"""Distance-join queries (C4, kNN/nearest rows of SURVEY.md §2.5).

POI side = the `part` table projected to deterministic LCG points
(pid = p_partkey); fact side = `documents`. DuckDB oracles brute-force
the pair space (fine at sf0.01); the Spark plans are the cell-index
equi-joins from chopin_spark.vector that replace O(n·m) enumeration at
scale.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark import sqlexpr as sx
from chopin_spark.grid import make_regular_grid
from chopin_spark.queries import register
from chopin_spark.tables import load
from chopin_spark.vector import knn_join, nearest_join, summarize_sedc

_DX = sx.x_expr("doc_id")
_DY = sx.y_expr("doc_id")
_PX = sx.x_expr("p_partkey")
_PY = sx.y_expr("p_partkey")

# Search radius trades stage-1 hit rate against candidate volume; the
# fallback stage keeps the result EXACT at any radius, so the choice is
# purely a performance knob (smaller radius + finer grid → ~8× fewer
# candidate pairs at sf0.1 than a 60 km radius on the coarse grid).
_RADIUS = 20_000.0
_GNX, _GNY = 16, 12  # 50 km cells; pad < cell ⇒ 3×3 candidate stencil
_BW = 40_000.0  # sedc bandwidth; threshold = 2*bw (chopin default)


def _docs_pts(spark, sf_dir):
    return load(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("double").alias("n_chars"),
        F.expr(_DX).alias("x"),
        F.expr(_DY).alias("y"),
    )


def _poi_pts(spark, sf_dir):
    return load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pid"),
        F.expr(_PX).alias("x"),
        F.expr(_PY).alias("y"),
    )


_NEAREST_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_DX} AS x, {_DY} AS y FROM documents
),
p AS (
  SELECT p_partkey AS pid, {_PX} AS px, {_PY} AS py FROM part
),
pairs AS (
  SELECT doc_id, pid,
         SQRT((x - px) * (x - px) + (y - py) * (y - py)) AS dist
  FROM d CROSS JOIN p
),
r AS (
  SELECT doc_id, pid, dist,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dist, pid) AS rn
  FROM pairs
)
SELECT doc_id, pid AS nn_pid, ROUND(dist, 4) AS nn_dist
FROM r WHERE rn = 1
"""


@register("nearest_poi", _NEAREST_ORACLE)
def nearest_poi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest join (terra::nearest via par_grid,
    /root/reference/README.md:1065-1118): cell-index candidates + exact
    fallback for sparse neighborhoods — exact at every grid size, unlike
    the reference's pad-bounded approximation
    (/root/reference/R/scale_process.R:14-22)."""
    g = make_regular_grid(_GNX, _GNY, pad=_RADIUS)
    out = nearest_join(
        _docs_pts(spark, sf_dir), _poi_pts(spark, sf_dir), g,
        "doc_id", "pid", _RADIUS, small_context=True,
    )
    return out.select(
        "doc_id",
        F.col("nn_id").alias("nn_pid"),
        F.round("nn_dist", 4).alias("nn_dist"),
    )


_KNN_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_DX} AS x, {_DY} AS y FROM documents
),
p AS (
  SELECT p_partkey AS pid, {_PX} AS px, {_PY} AS py FROM part
),
pairs AS (
  SELECT doc_id, pid,
         SQRT((x - px) * (x - px) + (y - py) * (y - py)) AS dist
  FROM d CROSS JOIN p
),
r AS (
  SELECT doc_id, pid, dist,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dist, pid) AS rn
  FROM pairs
)
SELECT doc_id, rn AS rank, pid AS nn_pid, ROUND(dist, 4) AS nn_dist
FROM r WHERE rn <= 3
"""


@register("knn3_poi", _KNN_ORACLE)
def knn3_poi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact kNN (k=3) join via padded cell candidates + fallback."""
    g = make_regular_grid(_GNX, _GNY, pad=_RADIUS)
    out = knn_join(
        _docs_pts(spark, sf_dir), _poi_pts(spark, sf_dir), g,
        "doc_id", "pid", _RADIUS, k=3, small_context=True,
    )
    return out.select(
        "doc_id",
        F.col("rank").cast("long").alias("rank"),
        F.col("nn_id").alias("nn_pid"),
        F.round("nn_dist", 4).alias("nn_dist"),
    )


_SEDC_ORACLE = f"""
WITH d AS (
  SELECT n_chars, {_DX} AS x, {_DY} AS y
  FROM documents
),
p AS (
  SELECT p_partkey AS pid, {_PX} AS px, {_PY} AS py FROM part
),
pairs AS (
  SELECT pid, n_chars,
         SQRT((x - px) * (x - px) + (y - py) * (y - py)) AS dist
  FROM d CROSS JOIN p
)
SELECT pid AS p_partkey,
       ROUND(SUM(CAST(FLOOR(EXP(-3.0 * dist / {_BW!r}) * 65536 + 0.5) AS BIGINT)
                 * CAST(n_chars AS BIGINT)) / 65536.0, 4) AS n_chars_sedc,
       COUNT(*) AS n_within
FROM pairs
WHERE dist <= {2.0 * _BW!r}
GROUP BY 1
"""


@register("summarize_sedc_poi", _SEDC_ORACLE)
def summarize_sedc_poi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 summarize_sedc (/root/reference/R/processing.R:604-696):
    distance-band join + sum(exp(-3d/bw)·value) per source with the
    `_sedc` suffix; threshold = 2·bandwidth. The reference's dense
    distance matrix (:666-674) becomes a cell-index range join."""
    g = make_regular_grid(8, 6, pad=2.0 * _BW)  # sedc threshold 80 km < 100 km cell
    out = summarize_sedc(
        _poi_pts(spark, sf_dir), _docs_pts(spark, sf_dir), g,
        "pid", ["n_chars"], bandwidth=_BW,
    )
    return out.select(
        F.col("pid").alias("p_partkey"), "n_chars_sedc", "n_within"
    )


# --- IDW interpolation (exposure surface at document locations) --------------

_IDW_RADIUS = 50_000.0
_IDW_D0 = 10_000.0  # half-weight distance of the inverse-quadratic kernel

_IDW_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_DX} AS x, {_DY} AS y FROM documents
),
p AS (
  SELECT p_size, {_PX} AS px, {_PY} AS py FROM part
),
pairs AS (
  SELECT doc_id, p_size,
         SQRT((x - px) * (x - px) + (y - py) * (y - py)) AS dist
  FROM d CROSS JOIN p
),
w AS (
  SELECT doc_id, p_size,
         CAST(FLOOR(65536 / (1.0 + (dist * dist) / {_IDW_D0 * _IDW_D0!r})
                    + 0.5) AS BIGINT) AS wq
  FROM pairs WHERE dist <= {_IDW_RADIUS!r}
)
SELECT doc_id,
       ROUND(SUM(wq * CAST(p_size AS BIGINT)) / CAST(SUM(wq) AS DOUBLE),
             4) AS p_size_idw,
       COUNT(*) AS n_within
FROM w GROUP BY 1
"""


@register("idw_interpolation_poi", _IDW_ORACLE)
def idw_interpolation_poi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IDW-interpolated POI measurement (p_size) at every document
    location: inverse-quadratic kernel, 50 km radius, quantized
    integer-exact weighted sums (see vector.interpolate_idw). The
    other half of chopin's exposure loop — sedc pushes values onto
    sources, IDW evaluates the surface at the 10^12-row fact side —
    with the identical cell-index range-join scale shape."""
    from chopin_spark.vector import interpolate_idw

    g = make_regular_grid(8, 6, pad=_IDW_RADIUS)
    pois = load(spark, sf_dir, "part").select(
        F.col("p_size").cast("long").alias("p_size"),
        F.expr(_PX).alias("x"),
        F.expr(_PY).alias("y"),
    )
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_DX).alias("x"), F.expr(_DY).alias("y")
    )
    out = interpolate_idw(
        docs, pois, g, "doc_id", ["p_size"],
        radius=_IDW_RADIUS, d0=_IDW_D0,
    )
    return out.select("doc_id", "p_size_idw", "n_within")


# --- empirical semivariogram (spatial structure of the page surface) ---------

_VG_MAXLAG = 100_000.0
_VG_BINW = 10_000.0

_VARIOGRAM_ORACLE = f"""
WITH d AS (
  SELECT doc_id, n_chars, {_DX} AS x, {_DY} AS y FROM documents
),
pairs AS (
  SELECT a.n_chars AS xa, b.n_chars AS xb,
         SQRT((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS dist
  FROM d a JOIN d b ON a.doc_id < b.doc_id
)
SELECT CAST(FLOOR(dist / {_VG_BINW!r}) AS BIGINT) AS lag_bin,
       COUNT(*) AS n_pairs,
       CAST(SUM((xa - xb) * (xa - xb)) AS BIGINT) AS sq_sum,
       ROUND(CAST(SUM((xa - xb) * (xa - xb)) AS DOUBLE)
             / (2.0 * COUNT(*)), 4) AS gamma
FROM pairs
WHERE dist <= {_VG_MAXLAG!r}
GROUP BY 1
"""


@register("semivariogram_docs", _VARIOGRAM_ORACLE)
def semivariogram_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical semivariogram γ(h) of per-page n_chars in 10 km lag
    bins up to 100 km — the spatial-structure diagnostic (kriging prep)
    an exposure analyst runs after chopin's summaries.  The pair space
    is the bounded-radius SELF-join of the fact table: cell-index
    equi-join with padded context cells (vector._prep), never a global
    cross join — pair volume is O(n · density · πR²), the same shape
    that bounds sedc/knn at 10^12 rows.  Squared increments of integer
    values make Σ(x_i−x_j)² exact int64; one double division finishes
    γ."""
    from chopin_spark.vector import _prep

    docs = _docs_pts(spark, sf_dir).select(
        "doc_id", F.col("n_chars").cast("long").alias("n_chars"), "x", "y"
    )
    g = make_regular_grid(8, 6, pad=_VG_MAXLAG)
    pairs = _prep(
        docs, docs, g, ["doc_id", "n_chars"], ["doc_id", "n_chars"]
    ).filter(
        (F.col("_d") <= _VG_MAXLAG) & (F.col("doc_id") < F.col("c_doc_id"))
    )
    dx = F.col("n_chars") - F.col("c_n_chars")
    return (
        pairs.groupBy(
            F.floor(F.col("_d") / _VG_BINW).cast("long").alias("lag_bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(dx * dx).alias("sq_sum"),
            F.round(
                F.sum(dx * dx).cast("double")
                / (F.lit(2.0) * F.count(F.lit(1))),
                4,
            ).alias("gamma"),
        )
    )


# --- Ripley's K / L (point-pattern clustering across scales) -----------------

_RK_MAX = 100_000.0
_RK_STEP = 20_000.0
_EXT_AREA = 800_000.0 * 600_000.0  # working extent, m²

_RIPLEY_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_DX} AS x, {_DY} AS y FROM documents
),
n AS (SELECT COUNT(*) AS n FROM d),
pairs AS (
  SELECT CAST(FLOOR(SQRT((a.x - b.x) * (a.x - b.x)
                         + (a.y - b.y) * (a.y - b.y)) / {_RK_STEP!r})
              AS BIGINT) AS bin
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE SQRT((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))
        <= {_RK_MAX!r}
),
bins AS (
  SELECT bin, COUNT(*) AS cnt FROM pairs GROUP BY 1
),
cum AS (
  SELECT bin,
         CAST(SUM(cnt) OVER (ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pairs
  FROM bins
)
SELECT CAST((bin + 1) * {_RK_STEP!r} AS BIGINT) AS r_m,
       cum_pairs,
       ROUND({_EXT_AREA!r} * 2.0 * cum_pairs
             / (CAST((SELECT n FROM n) AS DOUBLE)
                * (SELECT n FROM n)), 4) AS k_hat,
       ROUND(SQRT({_EXT_AREA!r} * 2.0 * cum_pairs
                  / (CAST((SELECT n FROM n) AS DOUBLE)
                     * (SELECT n FROM n)) / PI()), 4) AS l_hat
FROM cum
"""


@register("ripley_k_docs", _RIPLEY_ORACLE)
def ripley_k_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ripley's K̂(r) and L̂(r) for the document point pattern at
    r = 20..100 km (no edge correction — the statistic is defined on
    the closed working extent).  Pair counting rides the SAME
    bounded-radius cell-index self-join as the semivariogram; the
    cumulative finish is a 5-row window.  Complete-spatial-randomness
    reference: L̂(r) ≈ r."""
    from chopin_spark.vector import _prep

    docs = _docs_pts(spark, sf_dir).select("doc_id", "x", "y")
    g = make_regular_grid(8, 6, pad=_RK_MAX)
    pairs = _prep(docs, docs, g, ["doc_id"], ["doc_id"]).filter(
        (F.col("_d") <= _RK_MAX) & (F.col("doc_id") < F.col("c_doc_id"))
    )
    n = docs.count()  # driver scalar: one count of the fact table
    bins = pairs.groupBy(
        F.floor(F.col("_d") / _RK_STEP).cast("long").alias("bin")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.withColumn("cum_pairs", F.sum("cnt").over(w).cast("long"))
    k = F.round(
        F.lit(_EXT_AREA) * 2.0 * F.col("cum_pairs") / (float(n) * n), 4
    )
    el = F.round(
        F.sqrt(
            F.lit(_EXT_AREA) * 2.0 * F.col("cum_pairs")
            / (float(n) * n) / math.pi
        ),
        4,
    )
    return cum.select(
        ((F.col("bin") + 1) * F.lit(_RK_STEP)).cast("long").alias("r_m"),
        "cum_pairs",
        k.alias("k_hat"),
        el.alias("l_hat"),
    )



# --- DBSCAN (density-based clusters of the document point pattern) -----------

_DB_EPS = 50_000.0
_DB_MINPTS = 6

_DBSCAN_ORACLE = f"""
WITH RECURSIVE d AS (
  SELECT doc_id, {_DX} AS x, {_DY} AS y FROM documents
),
prs AS (
  SELECT a.doc_id AS a, b.doc_id AS b
  FROM d a JOIN d b ON a.doc_id <> b.doc_id
  WHERE SQRT((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))
        <= {_DB_EPS!r}
),
core AS (
  SELECT a FROM prs GROUP BY a HAVING COUNT(*) + 1 >= {_DB_MINPTS}
),
ce AS (
  SELECT p.a AS src, p.b AS dst FROM prs p
  JOIN core c1 ON c1.a = p.a
  JOIN core c2 ON c2.a = p.b
),
reach AS (
  SELECT src AS a, dst AS b FROM ce
  UNION
  SELECT r.a, e.dst FROM reach r JOIN ce e ON e.src = r.b
),
comp0 AS (SELECT a AS node, LEAST(a, MIN(b)) AS comp_id FROM reach GROUP BY 1),
comps AS (
  SELECT node, comp_id FROM comp0
  UNION ALL
  SELECT a, a FROM core WHERE a NOT IN (SELECT node FROM comp0)
),
border AS (
  SELECT p.a, MIN(c.comp_id) AS comp_id
  FROM prs p JOIN comps c ON c.node = p.b
  WHERE p.a NOT IN (SELECT a FROM core)
  GROUP BY 1
)
SELECT d.doc_id,
       CAST(COALESCE(cm.comp_id, b.comp_id, -1) AS BIGINT) AS cluster_id,
       CASE WHEN cm.node IS NOT NULL THEN 'core'
            WHEN b.a IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role
FROM d
LEFT JOIN comps cm ON cm.node = d.doc_id
LEFT JOIN border b ON b.a = d.doc_id
"""


@register("dbscan_docs", _DBSCAN_ORACLE)
def dbscan_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-based distributed DBSCAN (ε = 50 km, min_pts = 6) over the
    document point pattern — per-point (cluster_id, core/border/noise)
    labels. ε-graph from the bounded cell-index self-join; clusters =
    star-CC over core–core edges; border points take the MIN cluster
    id among core neighbors (deterministic replacement for sequential
    DBSCAN's visit-order rule — see chopin_spark.dbscan). Oracle:
    DuckDB recursive-CTE transitive closure over identically-recomputed
    core edges — a second, independent fixpoint algorithm."""
    from chopin_spark.dbscan import dbscan

    docs = _docs_pts(spark, sf_dir).select("doc_id", "x", "y")
    g = make_regular_grid(16, 12, pad=_DB_EPS)
    return dbscan(docs, g, "doc_id", eps=_DB_EPS, min_pts=_DB_MINPTS)


# --- simple kriging (BLUP surface evaluation, exact closed-form solve) -------
#
# The geostatistical upgrade of IDW: weights come from solving the
# 3×3 covariance system C·w = c per prediction point (simple kriging
# with known mean).  The covariance model is the rational kernel
# cov(d²) = 1 / (1 + d²/a²) — no transcendentals, so with the formula
# TEXT shared between engines every +,−,×,÷ is IEEE-correctly-rounded
# and the solve is bit-identical (the crs.py determinism argument).
# The 3×3 solve is CLOSED-FORM (Cramer's rule on a symmetric matrix
# with a constant diagonal D = 1 + nugget) — pure column math, zero
# Python, zero extra shuffles beyond the kNN stage it reuses.
#
# Scale shape: stage 1 is the exact knn_join (cell-index candidates +
# fallback); stage 2 is a broadcast join onto the POI dimension and a
# 3-way conditional-agg pivot (one doc-key agg); stage 3 is map-only
# arithmetic.  At 10^12 rows nothing new shuffles.

_KRIG_A2 = float(40_000.0 ** 2)  # covariance range a²
_KRIG_D = 1.0625  # constant diagonal: 1 + nugget


def _krig_pred_sql(mu: str) -> str:
    """Shared formula text over columns px,py,x1,y1,v1,...,x3,y3,v3."""
    def d2(ax, ay, bx, by):
        return (
            f"(({ax} - {bx}) * ({ax} - {bx})"
            f" + ({ay} - {by}) * ({ay} - {by}))"
        )

    def cov(d2s):
        return f"(1.0 / (1.0 + {d2s} / {_KRIG_A2!r}))"

    c12 = cov(d2("x1", "y1", "x2", "y2"))
    c13 = cov(d2("x1", "y1", "x3", "y3"))
    c23 = cov(d2("x2", "y2", "x3", "y3"))
    r1 = cov(d2("px", "py", "x1", "y1"))
    r2 = cov(d2("px", "py", "x2", "y2"))
    r3 = cov(d2("px", "py", "x3", "y3"))
    D = f"{_KRIG_D!r}"
    det = (
        f"({D} * ({D} * {D} - {c23} * {c23})"
        f" - {c12} * ({c12} * {D} - {c23} * {c13})"
        f" + {c13} * ({c12} * {c23} - {D} * {c13}))"
    )
    w1 = (
        f"(({r1} * ({D} * {D} - {c23} * {c23})"
        f" - {c12} * ({r2} * {D} - {c23} * {r3})"
        f" + {c13} * ({r2} * {c23} - {D} * {r3})) / {det})"
    )
    w2 = (
        f"(({D} * ({r2} * {D} - {r3} * {c23})"
        f" - {r1} * ({c12} * {D} - {c23} * {c13})"
        f" + {c13} * ({c12} * {r3} - {r2} * {c13})) / {det})"
    )
    w3 = (
        f"(({D} * ({D} * {r3} - {c23} * {r2})"
        f" - {c12} * ({c12} * {r3} - {r2} * {c13})"
        f" + {r1} * ({c12} * {c23} - {D} * {c13})) / {det})"
    )
    return (
        f"ROUND({mu} + {w1} * (v1 - {mu}) + {w2} * (v2 - {mu})"
        f" + {w3} * (v3 - {mu}), 4)"
    )


_KRIG_MU = (
    "(SELECT SUM(CAST(p_size AS BIGINT)) / CAST(COUNT(*) AS DOUBLE)"
    " FROM part)"
)

_KRIG_ORACLE = f"""
WITH mu AS (SELECT {_KRIG_MU} AS m),
d AS (
  SELECT doc_id, {_DX} AS px, {_DY} AS py FROM documents
),
p AS (
  SELECT p_partkey AS pid, CAST(p_size AS DOUBLE) AS v,
         {_PX} AS x, {_PY} AS y
  FROM part
),
pairs AS (
  SELECT doc_id, px, py, pid, v, x, y,
         SQRT((px - x) * (px - x) + (py - y) * (py - y)) AS dist
  FROM d CROSS JOIN p
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY dist, pid) AS rn
  FROM pairs
),
piv AS (
  SELECT doc_id, MIN(px) AS px, MIN(py) AS py,
         MAX(CASE WHEN rn = 1 THEN x END) AS x1,
         MAX(CASE WHEN rn = 1 THEN y END) AS y1,
         MAX(CASE WHEN rn = 1 THEN v END) AS v1,
         MAX(CASE WHEN rn = 2 THEN x END) AS x2,
         MAX(CASE WHEN rn = 2 THEN y END) AS y2,
         MAX(CASE WHEN rn = 2 THEN v END) AS v2,
         MAX(CASE WHEN rn = 3 THEN x END) AS x3,
         MAX(CASE WHEN rn = 3 THEN y END) AS y3,
         MAX(CASE WHEN rn = 3 THEN v END) AS v3
  FROM r WHERE rn <= 3
  GROUP BY 1
)
SELECT doc_id, {_krig_pred_sql('mu.m')} AS sk_pred
FROM piv CROSS JOIN mu
"""


@register("kriging_simple_poi", _KRIG_ORACLE)
def kriging_simple_poi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Simple-kriging surface evaluation of the POI measurement at
    every document location: exact 3-NN (cell-index + fallback), then
    a closed-form Cramer solve of the 3×3 covariance system in shared
    SQL arithmetic — bit-identical across engines, no linear-algebra
    library, no Python."""
    g = make_regular_grid(_GNX, _GNY, pad=_RADIUS)
    docs = _docs_pts(spark, sf_dir).select("doc_id", "x", "y")
    pois = _poi_pts(spark, sf_dir)
    vals = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pid"),
        F.col("p_size").cast("double").alias("v"),
    )
    mu = float(
        load(spark, sf_dir, "part")
        .selectExpr(
            "SUM(CAST(p_size AS BIGINT)) / CAST(COUNT(*) AS DOUBLE) AS m"
        )
        .first()["m"]
    )
    nn = knn_join(
        docs, pois, g, "doc_id", "pid", _RADIUS, k=3, small_context=True
    )
    enriched = nn.join(
        F.broadcast(
            pois.join(vals, "pid").select(
                F.col("pid").alias("nn_id"), "x", "y", "v"
            )
        ),
        "nn_id",
    )
    piv = enriched.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("rank") == i, F.col(c))).alias(f"{c}{i}")
            for i in (1, 2, 3)
            for c in ("x", "y", "v")
        ]
    )
    pts = docs.select(
        "doc_id", F.col("x").alias("px"), F.col("y").alias("py")
    )
    return (
        piv.join(pts, "doc_id")
        .selectExpr("doc_id", f"{_krig_pred_sql(repr(mu))} AS sk_pred")
    )


# --- ordinary kriging (unbiased: Σw = 1 via Lagrange border) -----------------
#
# The production geostatistics default: no known mean; the 3-neighbor
# system gains the unbiasedness row [1 1 1 | 0] and solves the 4×4
# bordered matrix.  Same exactness argument as simple kriging — the
# covariances land in NAMED columns first, then Cramer's rule expands
# to a fixed ±product-of-4 sum over those names, so both engines
# evaluate the identical IEEE expression tree.

def _det_sql(m: list[list[str]]) -> str:
    """Recursive cofactor expansion of a string matrix -> SQL expr."""
    n = len(m)
    if n == 1:
        return m[0][0]
    parts = []
    for j in range(n):
        minor = [row[:j] + row[j + 1:] for row in m[1:]]
        term = f"({m[0][j]}) * ({_det_sql(minor)})"
        parts.append(term if j % 2 == 0 else f"(0.0 - {term})")
    return "(" + " + ".join(parts) + ")"


_OK_D = f"{_KRIG_D!r}"
_OK_A = [
    [_OK_D, "c12", "c13", "1.0"],
    ["c12", _OK_D, "c23", "1.0"],
    ["c13", "c23", _OK_D, "1.0"],
    ["1.0", "1.0", "1.0", "0.0"],
]
_OK_RHS = ["r1", "r2", "r3", "1.0"]


def _ok_weight(i: int) -> str:
    m = [row[:] for row in _OK_A]
    for k in range(4):
        m[k][i] = _OK_RHS[k]
    return f"(({_det_sql(m)}) / ({_det_sql(_OK_A)}))"


_OK_PRED = (
    f"ROUND({_ok_weight(0)} * v1 + {_ok_weight(1)} * v2"
    f" + {_ok_weight(2)} * v3, 4)"
)


def _ok_cov_cols() -> str:
    """The six data-dependent covariances as named columns."""
    def d2(ax, ay, bx, by):
        return (
            f"(({ax} - {bx}) * ({ax} - {bx})"
            f" + ({ay} - {by}) * ({ay} - {by}))"
        )

    def cov(d2s):
        return f"(1.0 / (1.0 + {d2s} / {_KRIG_A2!r}))"

    def pt(a):
        return ("px", "py") if a == "p" else (f"x{a}", f"y{a}")

    return ", ".join(
        f"{cov(d2(*pt(a), *pt(b)))} AS {name}"
        for a, b, name in (
            ("1", "2", "c12"), ("1", "3", "c13"), ("2", "3", "c23"),
            ("p", "1", "r1"), ("p", "2", "r2"), ("p", "3", "r3"),
        )
    )


_OKRIG_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_DX} AS px, {_DY} AS py FROM documents
),
p AS (
  SELECT p_partkey AS pid, CAST(p_size AS DOUBLE) AS v,
         {_PX} AS x, {_PY} AS y
  FROM part
),
pairs AS (
  SELECT doc_id, px, py, pid, v, x, y,
         SQRT((px - x) * (px - x) + (py - y) * (py - y)) AS dist
  FROM d CROSS JOIN p
),
r AS (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY doc_id ORDER BY dist, pid) AS rn
  FROM pairs
),
piv AS (
  SELECT doc_id, MIN(px) AS px, MIN(py) AS py,
         MAX(CASE WHEN rn = 1 THEN x END) AS x1,
         MAX(CASE WHEN rn = 1 THEN y END) AS y1,
         MAX(CASE WHEN rn = 1 THEN v END) AS v1,
         MAX(CASE WHEN rn = 2 THEN x END) AS x2,
         MAX(CASE WHEN rn = 2 THEN y END) AS y2,
         MAX(CASE WHEN rn = 2 THEN v END) AS v2,
         MAX(CASE WHEN rn = 3 THEN x END) AS x3,
         MAX(CASE WHEN rn = 3 THEN y END) AS y3,
         MAX(CASE WHEN rn = 3 THEN v END) AS v3
  FROM r WHERE rn <= 3
  GROUP BY 1
),
cv AS (
  SELECT doc_id, v1, v2, v3, {_ok_cov_cols()}
  FROM piv
)
SELECT doc_id, {_OK_PRED} AS ok_pred
FROM cv
"""


@register("kriging_ordinary_poi", _OKRIG_ORACLE)
def kriging_ordinary_poi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordinary-kriging (unbiased BLUP, Σw = 1) evaluation of the POI
    measurement at every document location — the same exact-3-NN +
    covariance-column stage as kriging_simple_poi, closed by the 4×4
    bordered Cramer solve in shared IEEE arithmetic."""
    g = make_regular_grid(_GNX, _GNY, pad=_RADIUS)
    docs = _docs_pts(spark, sf_dir).select("doc_id", "x", "y")
    pois = _poi_pts(spark, sf_dir)
    vals = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pid"),
        F.col("p_size").cast("double").alias("v"),
    )
    nn = knn_join(
        docs, pois, g, "doc_id", "pid", _RADIUS, k=3, small_context=True
    )
    enriched = nn.join(
        F.broadcast(
            pois.join(vals, "pid").select(
                F.col("pid").alias("nn_id"), "x", "y", "v"
            )
        ),
        "nn_id",
    )
    piv = enriched.groupBy("doc_id").agg(
        *[
            F.max(F.when(F.col("rank") == i, F.col(c))).alias(f"{c}{i}")
            for i in (1, 2, 3)
            for c in ("x", "y", "v")
        ]
    )
    pts = docs.select(
        "doc_id", F.col("x").alias("px"), F.col("y").alias("py")
    )
    # selectExpr needs each projection separately; split the joined
    # builder back into its six expressions (top-level commas only)
    exprs = []
    depth = 0
    cur = ""
    for ch in _ok_cov_cols():
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            exprs.append(cur.strip())
            cur = ""
        else:
            cur += ch
    exprs.append(cur.strip())
    cv = piv.join(pts, "doc_id").selectExpr("doc_id", "v1", "v2", "v3", *exprs)
    return cv.selectExpr("doc_id", f"{_OK_PRED} AS ok_pred")


# --- uniform sampling over the spatial range join ----------------------------
#
# "Random Sampling Over Spatial Range Joins" (ICDE 2025, PAPERS.md):
# analysts want a FIXED-SIZE uniform sample of the ε-pair join, not
# its full output.  Two-phase deterministic version: phase 1 counts
# the exact pair-join cardinality |J| (one agg over the cell-index
# join — a metadata scalar, the only driver value); phase 2 re-runs
# the join with the hash-threshold predicate h(pair)·|J| < k·M — an
# integer cross-product compare, so inclusion is replay-identical and
# ORDER-FREE (every pair decided independently; no global sort, no
# rand()).  Only ~k pairs survive to the sink; the join output is
# never materialized.  Expected sample size k with binomial ±√k
# spread — the bound the paper's exact-k scheme tightens; exact-k
# needs weighted per-cell quotas and is noted as the upgrade path.

_SJS_EPS = 60_000.0  # ~3k pairs at sf0.01 (15 km gave zero: mean NN ~31 km)
_SJS_K = 200
_SJS_M = 999983

_SJS_HASH = "((doc_id * 2654435761 + c_doc_id * 40503) % {m})"


def _sjs_pairs(spark, sf_dir):
    from chopin_spark.vector import _prep

    docs = _docs_pts(spark, sf_dir).select("doc_id", "x", "y")
    g = make_regular_grid(8, 6, pad=_SJS_EPS)
    return _prep(docs, docs, g, ["doc_id"], ["doc_id"]).filter(
        (F.col("_d") <= _SJS_EPS) & (F.col("doc_id") < F.col("c_doc_id"))
    )


_SJS_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_DX} AS x, {_DY} AS y FROM documents
),
pairs AS (
  SELECT a.doc_id, b.doc_id AS c_doc_id,
         SQRT((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS _d
  FROM d a JOIN d b ON a.doc_id < b.doc_id
  WHERE SQRT((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))
        <= {_SJS_EPS!r}
),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS j FROM pairs)
SELECT doc_id, c_doc_id, ROUND(_d, 4) AS dist
FROM pairs CROSS JOIN tot
WHERE {_SJS_HASH.format(m=_SJS_M)} * tot.j < {_SJS_K} * {_SJS_M}
"""


@register("spatial_join_sample", _SJS_ORACLE)
def spatial_join_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """~k-pair uniform sample of the ε=60 km pair join, decided by the
    deterministic hash threshold against the exact join cardinality."""
    pairs = _sjs_pairs(spark, sf_dir)
    total = pairs.count()  # metadata scalar (phase 1)
    return (
        _sjs_pairs(spark, sf_dir)
        .filter(
            F.expr(_SJS_HASH.format(m=_SJS_M)) * F.lit(total)
            < F.lit(_SJS_K) * F.lit(_SJS_M)
        )
        .select(
            "doc_id", "c_doc_id", F.round("_d", 4).alias("dist")
        )
    )


# --- IDW leave-one-out cross-validation (surface-model error audit) ----------
#
# gstat::krige.cv / terra::interpIDW-validation workflow: predict each
# POI's value from the OTHER POIs within the radius and summarize the
# prediction error (ME / MAE / RMSE).  The pair stage is the identical
# density-bounded cell join as idw_interpolation_poi with the roles
# folded (POI × POI, self excluded by key — location ties between
# DISTINCT POIs keep both, matching the oracle).  Per-POI predictions
# are exact-integer ratios rounded once; errors then quantize to a
# 1e-4 lattice so every cross-POI SUM is int64 and partition-order
# independent — only the three terminal divisions (and one SQRT) are
# floating point.

_CV_Q = 10_000.0  # error lattice (1e-4 units of p_size)


def _cv_err_q(pred: str, actual: str) -> str:
    return (
        f"CAST(FLOOR((({pred}) - CAST(({actual}) AS DOUBLE)) * {_CV_Q!r}"
        f" + 0.5) AS BIGINT)"
    )


_CV_ORACLE = f"""
WITH p AS (
  SELECT p_partkey, CAST(p_size AS BIGINT) AS p_size,
         {_PX} AS x, {_PY} AS y
  FROM part
),
pairs AS (
  SELECT a.p_partkey, a.p_size,
         b.p_size AS v,
         SQRT((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)) AS dist
  FROM p a JOIN p b ON a.p_partkey <> b.p_partkey
),
w AS (
  SELECT p_partkey, p_size, v,
         CAST(FLOOR(65536 / (1.0 + (dist * dist) / {_IDW_D0 * _IDW_D0!r})
                    + 0.5) AS BIGINT) AS wq
  FROM pairs WHERE dist <= {_IDW_RADIUS!r}
),
pred AS (
  SELECT p_partkey,
         ROUND(SUM(wq * v) / CAST(SUM(wq) AS DOUBLE), 4) AS p_hat,
         MAX(p_size) AS p_size
  FROM w GROUP BY 1
),
err AS (
  SELECT {_cv_err_q('p_hat', 'p_size')} AS eq FROM pred
)
SELECT COUNT(*) AS n_poi,
       ROUND(SUM(eq) / ({_CV_Q!r} * COUNT(*)), 6) AS me,
       ROUND(SUM(ABS(eq)) / ({_CV_Q!r} * COUNT(*)), 6) AS mae,
       ROUND(SQRT((SUM(eq * eq) / CAST(COUNT(*) AS DOUBLE)))
             / {_CV_Q!r}, 6) AS rmse
FROM err
"""


@register("idw_loocv", _CV_ORACLE)
def idw_loocv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out CV of the IDW surface over the POI layer: the
    vector._prep cell join supplies in-radius candidate pairs, the
    self-POI is excluded by key, and the error summary runs on the
    1e-4 integer lattice."""
    from chopin_spark.vector import _prep

    g = make_regular_grid(8, 6, pad=_IDW_RADIUS)
    pois = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("long").alias("p_size"),
        F.expr(_PX).alias("x"),
        F.expr(_PY).alias("y"),
    )
    pairs = (
        _prep(pois, pois.withColumnRenamed("p_partkey", "src_key"),
              g, ["p_partkey", "p_size"], ["src_key", "p_size"])
        .filter(
            (F.col("_d") <= _IDW_RADIUS)
            & (F.col("c_src_key") != F.col("p_partkey"))
        )
    )
    wq = F.expr(
        f"CAST(FLOOR(65536 / (1.0 + (_d * _d) / {_IDW_D0 * _IDW_D0!r})"
        " + 0.5) AS BIGINT)"
    )
    pred = pairs.groupBy("p_partkey").agg(
        F.round(
            F.sum(wq * F.col("c_p_size")) / F.sum(wq).cast("double"), 4
        ).alias("p_hat"),
        F.max("p_size").alias("p_size"),
    )
    err = pred.select(F.expr(_cv_err_q("p_hat", "p_size")).alias("eq"))
    n = F.count(F.lit(1))
    return err.agg(
        n.alias("n_poi"),
        F.round(F.sum("eq") / (F.lit(_CV_Q) * n), 6).alias("me"),
        F.round(F.sum(F.abs("eq")) / (F.lit(_CV_Q) * n), 6).alias("mae"),
        F.round(
            F.sqrt(F.sum(F.col("eq") * F.col("eq")) / n.cast("double"))
            / F.lit(_CV_Q),
            6,
        ).alias("rmse"),
    )


# --- bivariate cross-K (docs vs POI attraction across scales) ----------------
#
# Ripley's K above asks "do pages cluster with themselves?"; the cross
# version asks the analyst's next question: "do pages cluster AROUND
# the POI layer?" — K̂₁₂(r) = A/(n₁·n₂) · Σᵢ Σⱼ 1[dᵢⱼ ≤ r] over ORDERED
# (doc, poi) pairs (no self-pair exclusion, no factor 2 — the two
# patterns are disjoint).  Under independence L̂₁₂(r) ≈ r; excess means
# the page surface tracks the POI surface (chopin's summarize_sedc
# precursor question).
#
# Scale shape: identical to ripley_k_docs — the bounded-radius cell
# equi-join from chopin_spark.vector replaces the O(n₁·n₂) enumeration;
# candidate volume is local density × n₁, the two scalars (n₁, n₂) are
# one count() each, and the finish is a 5-row cumulative window.

_XK_MAX = 100_000.0
_XK_STEP = 20_000.0

_CROSSK_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_DX} AS x, {_DY} AS y FROM documents
),
p AS (
  SELECT p_partkey AS pid, {_PX} AS x, {_PY} AS y FROM part
),
n1 AS (SELECT COUNT(*) AS n FROM d),
n2 AS (SELECT COUNT(*) AS n FROM p),
pairs AS (
  SELECT CAST(FLOOR(SQRT((d.x - p.x) * (d.x - p.x)
                         + (d.y - p.y) * (d.y - p.y)) / {_XK_STEP!r})
              AS BIGINT) AS bin
  FROM d JOIN p ON SQRT((d.x - p.x) * (d.x - p.x)
                        + (d.y - p.y) * (d.y - p.y)) <= {_XK_MAX!r}
),
bins AS (
  SELECT bin, COUNT(*) AS cnt FROM pairs GROUP BY 1
),
cum AS (
  SELECT bin,
         CAST(SUM(cnt) OVER (ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pairs
  FROM bins
)
SELECT CAST((bin + 1) * {_XK_STEP!r} AS BIGINT) AS r_m,
       cum_pairs,
       ROUND({_EXT_AREA!r} * cum_pairs
             / (CAST((SELECT n FROM n1) AS DOUBLE)
                * (SELECT n FROM n2)), 4) AS k12_hat,
       ROUND(SQRT({_EXT_AREA!r} * cum_pairs
                  / (CAST((SELECT n FROM n1) AS DOUBLE)
                     * (SELECT n FROM n2)) / PI()), 4) AS l12_hat
FROM cum
"""


@register("cross_k_docs_poi", _CROSSK_ORACLE)
def cross_k_docs_poi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bivariate Ripley cross-K̂₁₂(r) / L̂₁₂(r) between the document
    pattern and the POI pattern at r = 20..100 km — ordered cross
    pairs through the bounded-radius cell join, cumulative finish over
    5 bins.  Independence reference: L̂₁₂(r) ≈ r."""
    from chopin_spark.vector import _prep

    docs = _docs_pts(spark, sf_dir).select("doc_id", "x", "y")
    pois = _poi_pts(spark, sf_dir)
    g = make_regular_grid(8, 6, pad=_XK_MAX)
    pairs = _prep(docs, pois, g, ["doc_id"], ["pid"]).filter(
        F.col("_d") <= _XK_MAX
    )
    n1 = docs.count()  # two driver scalars: one count per pattern
    n2 = pois.count()
    bins = pairs.groupBy(
        F.floor(F.col("_d") / _XK_STEP).cast("long").alias("bin")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql import Window

    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.withColumn("cum_pairs", F.sum("cnt").over(w).cast("long"))
    k12 = F.round(
        F.lit(_EXT_AREA) * F.col("cum_pairs") / (float(n1) * n2), 4
    )
    l12 = F.round(
        F.sqrt(
            F.lit(_EXT_AREA) * F.col("cum_pairs")
            / (float(n1) * n2) / math.pi
        ),
        4,
    )
    return cum.select(
        ((F.col("bin") + 1) * F.lit(_XK_STEP)).cast("long").alias("r_m"),
        "cum_pairs",
        k12.alias("k12_hat"),
        l12.alias("l12_hat"),
    )


# --- two-step floating catchment area (2SFCA) accessibility --------------------
#
# Luo & Wang's accessibility statistic (the health-geography standard
# the gravity/Huff family approximates): step 1 gives every supply
# point j a ratio R_j = s_j / Σ(demand within d0); step 2 gives every
# demand point i the sum A_i = Σ R_j over supply within d0.  Both
# steps ride ONE radius-bounded pair set — the same cell-index range
# join as summarize_sedc (padded explode lands on the 2 000-row POI
# dimension, docs stay exactly-once in their core cell).
#
# Determinism: R_j quantizes to int64 micro BEFORE the step-2 sum
# (Σ doubles is partition-order dependent — the summarize_st lesson),
# so A_i is an exact integer fold in both engines.  Step-1 demand is a
# count (int64).  Scale: step-1 output is supply-dimension-sized, so
# the step-2 join broadcasts it; the fact-sized pair set is built
# twice (two scans beat materializing a fact-sized intermediate).

_FCA_D0 = 40_000.0


_FCA_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_DX} AS x, {_DY} AS y FROM documents
),
p AS (
  SELECT p_partkey AS pid, p_size AS s, {_PX} AS px, {_PY} AS py FROM part
),
pairs AS (
  SELECT doc_id, pid, s
  FROM d CROSS JOIN p
  WHERE SQRT((x - px) * (x - px) + (y - py) * (y - py)) <= {_FCA_D0!r}
),
rj AS (
  SELECT pid,
         CAST(FLOOR(CAST(MIN(s) AS DOUBLE) * 1000000.0 / COUNT(*) + 0.5)
              AS BIGINT) AS r_micro
  FROM pairs GROUP BY 1
)
SELECT pairs.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_poi_reach,
       ROUND(CAST(SUM(rj.r_micro) AS DOUBLE) / 1000000.0, 4) AS a_2sfca
FROM pairs JOIN rj ON rj.pid = pairs.pid
GROUP BY 1
"""


@register("accessibility_2sfca", _FCA_ORACLE)
def accessibility_2sfca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2SFCA accessibility per document: supply-to-demand ratios within
    the 40 km catchment (step 1, int64-micro quantized), summed over
    reachable supply (step 2) — both steps on the cell-index range
    join."""
    from chopin_spark.vector import _prep

    g = make_regular_grid(_GNX, _GNY, pad=_FCA_D0)
    docs = _docs_pts(spark, sf_dir).select("doc_id", "x", "y")
    pois = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pid"),
        F.col("p_size").cast("long").alias("s"),
        F.expr(_PX).alias("x"),
        F.expr(_PY).alias("y"),
    )
    pairs = (
        _prep(docs, pois, g, ["doc_id"], ["pid", "s"])
        .filter(F.col("_d") <= _FCA_D0)
        .select("doc_id", F.col("c_pid").alias("pid"), F.col("c_s").alias("s"))
    )
    rj = pairs.groupBy("pid").agg(
        F.expr(
            "CAST(FLOOR(CAST(MIN(s) AS DOUBLE) * 1000000.0 / COUNT(*) + 0.5)"
            " AS BIGINT)"
        ).alias("r_micro")
    )
    return (
        pairs.join(F.broadcast(rj), "pid")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_poi_reach"),
            F.round(
                F.sum("r_micro").cast("double") / 1000000.0, 4
            ).alias("a_2sfca"),
        )
    )


# --- adaptive-bandwidth geographically weighted mean ---------------------------
#
# The spgwr/GWmodel adaptive-kernel move the fixed-bandwidth C3 family
# can't express: each point's bandwidth is its distance to the 15th
# nearest neighbor, so the kernel tightens in dense regions and
# stretches in sparse ones.  Composition of two existing exact
# operators: knn_join (k=16, self dropped — exact at any grid size via
# the ring fallback) supplies both the neighbor set AND the bandwidth;
# the quartic weights then quantize to the kernels.QUANT lattice so
# the weighted mean is an exact int64 fold (partition-order free).
#
# Scale shape: one kNN pair shuffle (cell join, top-k in a single agg
# pass), a 16-row-per-key window, one neighbor-value equi-join, one
# agg.  No global sort, no fact×fact face.

_AGW_K = 15


def _agw_quartic(d: str, bw: str) -> str:
    t = f"(LEAST({d}, {bw}) / {bw})"
    return f"((15.0/16.0) * (1.0 - {t}*{t}) * (1.0 - {t}*{t}))"


_AGW_WQ = (
    f"CAST(FLOOR({_agw_quartic('nn_dist', 'bw')} * 65536 + 0.5) AS BIGINT)"
)

_AGW_TAIL = f"""
ranked AS (
  SELECT doc_id, nn_id, nn_dist,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY nn_dist, nn_id) AS rn
  FROM others
),
kept AS (SELECT * FROM ranked WHERE rn <= {_AGW_K}),
bwt AS (
  SELECT k.doc_id, k.nn_id, k.nn_dist, b.bw
  FROM kept k
  JOIN (SELECT doc_id, MAX(nn_dist) AS bw FROM kept GROUP BY 1) b
    ON b.doc_id = k.doc_id
),
wv AS (
  SELECT t.doc_id, t.bw, {_AGW_WQ} AS wq, v.val
  FROM bwt t JOIN vals v ON v.nn_id = t.nn_id
)
SELECT doc_id,
       ROUND(MAX(bw), 4) AS adaptive_bw,
       CAST(SUM(wq) AS BIGINT) AS sum_wq,
       ROUND(CAST(SUM(wq * val) AS DOUBLE) / SUM(wq), 4) AS gw_mean_chars
FROM wv
GROUP BY doc_id
"""

_AGW_ORACLE = f"""
WITH d AS (
  SELECT doc_id, n_chars, {_DX} AS x, {_DY} AS y FROM documents
),
others AS (
  SELECT a.doc_id, b.doc_id AS nn_id,
         SQRT((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y))
           AS nn_dist
  FROM d a JOIN d b ON a.doc_id <> b.doc_id
),
vals AS (SELECT doc_id AS nn_id, CAST(n_chars AS BIGINT) AS val FROM d),
{_AGW_TAIL}
"""


@register("gw_mean_adaptive", _AGW_ORACLE)
def gw_mean_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive-bandwidth geographically weighted mean of n_chars:
    bandwidth = distance to the 15th nearest neighbor (exact knn_join),
    quartic weights on the QUANT lattice, int64-exact weighted fold."""
    from chopin_spark.vector import knn_join

    docs = _docs_pts(spark, sf_dir)
    ctx = docs.select(
        F.col("doc_id").alias("cid"), "x", "y"
    )
    g = make_regular_grid(_GNX, _GNY, pad=_RADIUS)
    knn = knn_join(
        docs.select("doc_id", "x", "y"), ctx, g,
        "doc_id", "cid", _RADIUS, k=_AGW_K + 1,
    )
    knn.filter(F.col("nn_id") != F.col("doc_id")).createOrReplaceTempView(
        "agw_others"
    )
    docs.selectExpr(
        "doc_id AS nn_id", "CAST(n_chars AS BIGINT) AS val"
    ).createOrReplaceTempView("agw_vals")
    return spark.sql(
        "WITH others AS (SELECT doc_id, nn_id, nn_dist FROM agw_others),\n"
        "vals AS (SELECT * FROM agw_vals),\n" + _AGW_TAIL
    )
