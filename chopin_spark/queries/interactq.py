"""Spatial-interaction statistics: geographically weighted regression
and the Huff gravity model.

Both extend chopin's distance-decay family (summarize_sedc,
/root/reference/R/processing.R:604-696) from *sums* of kernel-weighted
values to *model* outputs: GWR fits a locally weighted OLS line at each
regression point, Huff turns distance decay into per-origin choice
probabilities and aggregates expected patronage per destination.

Cross-engine exactness follows the repo discipline: every reduction is
an int64 SUM of per-row quantized terms (kernel weights and choice
scores at fixed grain), so reduction order cannot change the result;
the closed-form model combinations are fixed-shape double expressions
over those exact integers (correctly rounded IEEE ops only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chopin_spark import sqlexpr as sx
from chopin_spark.queries import register
from chopin_spark.tables import load

_DX = sx.x_expr("doc_id")
_DY = sx.y_expr("doc_id")
_PX = sx.x_expr("p_partkey")
_PY = sx.y_expr("p_partkey")

# --- geographically weighted regression (local slope surface) ----------------
#
# 12 regression points (4×3 grid-cell centers); at each, weighted OLS of
# n_chars on the x-coordinate (km) with a Gaussian kernel truncated at
# _GWR_R.  All five weighted moments are exact int64 (weight grain 2^12,
# predictor floor-quantized to km), so the normal-equation solve is a
# deterministic double expression over exact integers.
#
# Scale shape: the regression-point table is metadata-sized (grid
# centers), so the pair stage is a broadcast nested-loop against the
# fact scan — 12·n filtered rows, one hash-agg, no fact shuffle.  At
# denser regression grids the same query switches to the cell-stencil
# equi-join used by huff_gravity_share below.

_GWR_NX, _GWR_NY = 4, 3
_GWR_CW = 800_000.0 / _GWR_NX
_GWR_CH = 600_000.0 / _GWR_NY
_GWR_H = 120_000.0  # Gaussian bandwidth
_GWR_R = 300_000.0  # hard truncation radius

_GWR_BODY = f"""
pts AS (
  SELECT doc_id, {_DX} AS x, {_DY} AS y,
         CAST(n_chars AS BIGINT) AS v
  FROM documents
),
pairs AS (
  SELECT c.gi, c.gj,
         CAST(FLOOR(p.x / 1000.0) AS BIGINT) AS u,
         p.v,
         CAST(FLOOR(4096 * EXP(-((p.x - c.cx) * (p.x - c.cx)
                                 + (p.y - c.cy) * (p.y - c.cy))
                               / {2.0 * _GWR_H * _GWR_H!r}) + 0.5)
              AS BIGINT) AS wq
  FROM pts p CROSS JOIN centers c
  WHERE (p.x - c.cx) * (p.x - c.cx) + (p.y - c.cy) * (p.y - c.cy)
        <= {_GWR_R * _GWR_R!r}
),
m AS (
  SELECT gi, gj,
         COUNT(*) AS n_pts,
         SUM(wq) AS sw,
         SUM(wq * u) AS swu,
         SUM(wq * v) AS swv,
         SUM(wq * u * u) AS swuu,
         SUM(wq * u * v) AS swuv
  FROM pairs
  GROUP BY 1, 2
)
SELECT gi, gj, n_pts,
       ROUND((CAST(sw AS DOUBLE) * CAST(swuv AS DOUBLE)
              - CAST(swu AS DOUBLE) * CAST(swv AS DOUBLE))
             / (CAST(sw AS DOUBLE) * CAST(swuu AS DOUBLE)
                - CAST(swu AS DOUBLE) * CAST(swu AS DOUBLE)),
             6) AS slope_chars_per_km,
       ROUND((CAST(swv AS DOUBLE)
              - ((CAST(sw AS DOUBLE) * CAST(swuv AS DOUBLE)
                  - CAST(swu AS DOUBLE) * CAST(swv AS DOUBLE))
                 / (CAST(sw AS DOUBLE) * CAST(swuu AS DOUBLE)
                    - CAST(swu AS DOUBLE) * CAST(swu AS DOUBLE)))
                * CAST(swu AS DOUBLE))
             / CAST(sw AS DOUBLE),
             4) AS intercept_chars
FROM m
"""

_GWR_CENTER_COLS = f"""
  SELECT gi, gj,
         (gi + 0.5) * {_GWR_CW!r} AS cx,
         (gj + 0.5) * {_GWR_CH!r} AS cy
"""

_GWR_SPARK = f"""
WITH centers AS (
  {_GWR_CENTER_COLS}
  FROM (SELECT explode(sequence(0, {_GWR_NX - 1})) AS gi)
  CROSS JOIN (SELECT explode(sequence(0, {_GWR_NY - 1})) AS gj)
),
{_GWR_BODY}
"""

_GWR_ORACLE = f"""
WITH centers AS (
  {_GWR_CENTER_COLS}
  FROM generate_series(0, {_GWR_NX - 1}) AS g1(gi),
       generate_series(0, {_GWR_NY - 1}) AS g2(gj)
),
{_GWR_BODY}
"""


@register("gwr_local_slope", _GWR_ORACLE)
def gwr_local_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Geographically weighted regression: at each of 12 regression
    points, Gaussian-weighted OLS of document size on the x-coordinate
    (spgwr::gwr semantics for a fixed bandwidth — the local-model
    extension of chopin's kernel weighting, C2/C3).  Weighted moments
    are exact int64; the 2×2 normal-equation solve is a fixed double
    expression over them, so both engines agree bit-for-bit."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_GWR_SPARK)


# --- Huff gravity model (probabilistic catchment shares) ---------------------
#
# P(doc -> poi) = A_poi / d²  normalized over the pois within reach of
# the doc; expected patronage per poi = Σ_docs P.  The two reductions
# (per-doc denominator, per-poi sum of shares) are int64 sums of
# quantized scores — grain 1e12 for the raw gravity score, 1e9 for the
# normalized share — so both are reduction-order independent.
#
# Scale shape (Spark side): grid cell equi-join with a 3×3 stencil on
# the (small) destination side bounds candidates to the 60 km
# neighborhood — never doc×poi; the per-doc normalization is a window
# sum over the pair partition key, then one hash-agg per destination.

_HUFF_R = 60_000.0
_HUFF_SOFT = 1.0e6  # +1 km² softening keeps near-zero distances bounded
_HUFF_NX, _HUFF_NY = 8, 6  # 100 km cells ≥ radius ⇒ 3×3 stencil is exact

_HUFF_SCORE = (
    f"CAST(FLOOR(1.0e12 * CAST(p_size AS DOUBLE) / (d2 + {_HUFF_SOFT!r}) + 0.5)"
    " AS BIGINT)"
)

_HUFF_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_DX} AS x, {_DY} AS y FROM documents
),
p AS (
  SELECT p_partkey AS pid, CAST(p_size AS BIGINT) AS p_size,
         {_PX} AS px, {_PY} AS py
  FROM part
),
pairs AS (
  SELECT doc_id, pid, p_size,
         (x - px) * (x - px) + (y - py) * (y - py) AS d2
  FROM d CROSS JOIN p
  WHERE (x - px) * (x - px) + (y - py) * (y - py) <= {_HUFF_R * _HUFF_R!r}
),
scored AS (
  SELECT doc_id, pid, {_HUFF_SCORE} AS sq
  FROM pairs
),
shares AS (
  SELECT pid,
         CAST(FLOOR(1.0e9 * CAST(sq AS DOUBLE)
                    / CAST(SUM(sq) OVER (PARTITION BY doc_id) AS DOUBLE)
                    + 0.5) AS BIGINT) AS shq
  FROM scored
)
SELECT pid AS p_partkey,
       COUNT(*) AS n_docs,
       ROUND(SUM(shq) / 1.0e9, 4) AS expected_visits
FROM shares
GROUP BY 1
"""


@register("huff_gravity_share", _HUFF_ORACLE)
def huff_gravity_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Huff gravity model: distance-decay choice probabilities from
    every document to the POIs within 60 km (attractiveness = p_size,
    decay = 1/d²), aggregated to expected patronage per POI — the
    spatial-interaction counterpart of summarize_sedc's plain decay sum
    (/root/reference/R/processing.R:604-696)."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id", F.expr(_DX).alias("x"), F.expr(_DY).alias("y")
    )
    pois = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pid"),
        F.col("p_size").cast("long").alias("p_size"),
        F.expr(_PX).alias("px"),
        F.expr(_PY).alias("py"),
    )
    ix = sx.grid_ix_expr("x", _HUFF_NX)
    iy = sx.grid_iy_expr("y", _HUFF_NY)
    pix = sx.grid_ix_expr("px", _HUFF_NX)
    piy = sx.grid_iy_expr("py", _HUFF_NY)
    docs = docs.withColumn("cell", F.expr(f"{iy} * {_HUFF_NX} + {ix}"))
    # destination side explodes to its 3×3 cell stencil (POI tables are
    # the small side; 9× a dimension stays broadcastable)
    pois = (
        pois.withColumn("pix", F.expr(pix))
        .withColumn("piy", F.expr(piy))
        .withColumn("ddx", F.explode(F.expr("sequence(-1, 1)")))
        .withColumn("ddy", F.explode(F.expr("sequence(-1, 1)")))
        .withColumn("cell", (F.col("piy") + F.col("ddy")) * _HUFF_NX
                    + (F.col("pix") + F.col("ddx")))
        .drop("pix", "piy", "ddx", "ddy")
    )
    pairs = (
        docs.join(F.broadcast(pois), "cell")
        .withColumn(
            "d2",
            (F.col("x") - F.col("px")) * (F.col("x") - F.col("px"))
            + (F.col("y") - F.col("py")) * (F.col("y") - F.col("py")),
        )
        .filter(F.col("d2") <= _HUFF_R * _HUFF_R)
        .select("doc_id", "pid", F.expr(_HUFF_SCORE).alias("sq"))
    )
    w = Window.partitionBy("doc_id")
    shares = (
        pairs.withColumn("denom", F.sum("sq").over(w))
        .withColumn(
            "shq",
            F.expr(
                "CAST(FLOOR(1.0e9 * CAST(sq AS DOUBLE)"
                " / CAST(denom AS DOUBLE) + 0.5) AS BIGINT)"
            ),
        )
    )
    return shares.groupBy(F.col("pid").alias("p_partkey")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("shq") / 1.0e9, 4).alias("expected_visits"),
    )


# --- radiation model (Simini, González, Maritan & Barabási 2012) ---------------
#
# The parameter-free spatial-interaction model beside the fitted Huff
# gravity above: expected flux fraction from origin i to destination j
#     p_ij = m_i n_j / ((m_i + s_ij)(m_i + n_j + s_ij))
# where s_ij = total population strictly closer to i than j (excluding
# both endpoints) — the "intervening opportunities" term that replaces
# gravity's decay exponent.  Zones = the 8x6 doc grid with population
# = doc counts; centroid distances are exact integer squares, so the
# s_ij radius test (d²_ik < d²_ij) and every carrier before the final
# ratio are exact int64.
#
# Scale shape: zones are metadata-sized aggregates of the fact scan
# (one groupBy); the O(Z³) intervening-opportunity triple stage runs
# entirely on that broadcast-sized zone table — at web scale Z is the
# analyst's grid choice, never the fact cardinality.

_RAD_NX, _RAD_NY = 8, 6
_RAD_CW = 800000 // _RAD_NX  # 100 km cells
_RAD_CH = 600000 // _RAD_NY

_RAD_SQL = f"""
WITH z AS (
  SELECT CAST(FLOOR(({_DX}) / {_RAD_CW}) AS BIGINT) AS gx,
         CAST(FLOOR(({_DY}) / {_RAD_CH}) AS BIGINT) AS gy,
         CAST(COUNT(*) AS BIGINT) AS pop
  FROM documents
  GROUP BY 1, 2
),
zz AS (
  SELECT gx * {_RAD_NY} + gy AS zid,
         gx * {_RAD_CW} + {_RAD_CW // 2} AS cx,
         gy * {_RAD_CH} + {_RAD_CH // 2} AS cy,
         pop
  FROM z
),
pairs AS (
  SELECT i.zid AS i, j.zid AS j, i.pop AS mi, j.pop AS nj,
         i.cx AS icx, i.cy AS icy,
         (i.cx - j.cx) * (i.cx - j.cx)
         + (i.cy - j.cy) * (i.cy - j.cy) AS d2
  FROM zz i JOIN zz j ON i.zid <> j.zid
),
svals AS (
  SELECT p.i, p.j, p.mi, p.nj,
         CAST(COALESCE(SUM(CASE WHEN k.zid <> p.i AND k.zid <> p.j
                        AND (k.cx - p.icx) * (k.cx - p.icx)
                            + (k.cy - p.icy) * (k.cy - p.icy) < p.d2
                       THEN k.pop ELSE 0 END), 0) AS BIGINT) AS s
  FROM pairs p CROSS JOIN zz k
  GROUP BY 1, 2, 3, 4
)
SELECT i, j, mi, nj, s,
       ROUND(CAST(mi AS DOUBLE) * nj
             / (CAST(mi + s AS DOUBLE) * (mi + nj + s)), 6) AS p_flux
FROM svals
ORDER BY p_flux DESC, i ASC, j ASC
LIMIT 30
"""


@register("radiation_model_flux", _RAD_SQL)
def radiation_model_flux(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parameter-free radiation-model flux fractions between doc-grid
    zones: intervening-opportunity sums on exact integer distances,
    top-30 origin-destination pairs."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_RAD_SQL)


# --- doubly-constrained gravity OD matrix (IPF / Furness balancing) -----------
#
# The transport-planning verb the singly-constrained family (Huff,
# radiation) can't express: balance a distance-decay seed matrix to
# KNOWN productions O_i and attractions D_j (trip distribution /
# survey raking / small-area synthesis — Deming–Stephan 1940 IPF,
# Furness 1965 in transport).  8 unrolled balancing rounds, each a
# row-scale then a column-scale.
#
# Cross-engine exactness: the matrix RE-QUANTIZES to integer
# micro-trips after every scaling (FLOOR(t·f + 0.5) with f a fixed
# double tree target/marginal-sum) — so every marginal sum is an exact
# int64 SUM, immune to reduction order, and the scale factors are the
# only doubles (the mlq micro-nat discipline applied to IPF).  The
# residuals the query reports are therefore honest: they contain the
# true IPF convergence gap plus ≤0.5 micro-trip/cell quantization.
#
# Scale shape: state is the |zones|² OD matrix — at continental scale
# (10⁴ TAZ zones → 10⁸ cells) each round is one groupBy(i) + one
# groupBy(j) over the cells, map-side combinable, 16 rounds max; the
# fact-sized work is only the marginal extraction.

_IPF_NZ = 16  # 4×4 coarse zone grid
_IPF_ROUNDS = 8
_IPF_GRID = 4

# zone of a document: coarse 4×4 grid over the planar window.  FLOOR
# before the BIGINT cast — CAST(double AS BIGINT) truncates in Spark
# but rounds-to-nearest in DuckDB (the repo-wide cast rule)
_IPF_ZONE = (
    f"(LEAST(CAST(FLOOR(({sx.x_expr('doc_id')}) / 800000.0 * {_IPF_GRID})"
    f" AS BIGINT), {_IPF_GRID - 1}) * {_IPF_GRID}"
    f" + LEAST(CAST(FLOOR(({sx.y_expr('doc_id')}) / 600000.0 * {_IPF_GRID})"
    f" AS BIGINT), {_IPF_GRID - 1}))"
)

_IPF_MARG = f"""
  SELECT {_IPF_ZONE} AS z, CAST(SUM(n_chars) AS BIGINT) AS o
  FROM documents GROUP BY 1
"""

# attractions: the same mass re-keyed by a fixed zone permutation
# (z+5 mod 16) — guarantees ΣO = ΣD exactly, as IPF requires
_IPF_TGT = """
  SELECT m.z, m.o, p.o AS d
  FROM ipf_marg m
  JOIN (SELECT (z + 5) % 16 AS z, o FROM ipf_marg) p ON p.z = m.z
"""

# seed: inverse-square distance decay between 4×4 grid-cell centers,
# pre-scaled to integer micro-trips
_IPF_SEED = f"""
  SELECT a.z AS i, b.z AS j,
         CAST(FLOOR(1000000.0 / (1.0
           + CAST(((a.z - (a.z % {_IPF_GRID})) / {_IPF_GRID}
                   - (b.z - (b.z % {_IPF_GRID})) / {_IPF_GRID})
                  * ((a.z - (a.z % {_IPF_GRID})) / {_IPF_GRID}
                   - (b.z - (b.z % {_IPF_GRID})) / {_IPF_GRID})
                  + (a.z % {_IPF_GRID} - b.z % {_IPF_GRID})
                  * (a.z % {_IPF_GRID} - b.z % {_IPF_GRID}) AS DOUBLE)))
              AS BIGINT) AS t
  FROM ipf_tgt a CROSS JOIN ipf_tgt b
"""


def _ipf_row_sql(prev: str) -> str:
    return f"""
  SELECT p.i, p.j,
         CAST(FLOOR(CAST(p.t AS DOUBLE)
              * (CAST(g.o AS DOUBLE) / CAST(g.rs AS DOUBLE)) + 0.5)
              AS BIGINT) AS t
  FROM {prev} p
  JOIN (SELECT p2.i, MAX(tg.o) AS o, SUM(p2.t) AS rs
        FROM {prev} p2 JOIN ipf_tgt tg ON tg.z = p2.i
        GROUP BY p2.i) g ON g.i = p.i
"""


def _ipf_col_sql(prev: str) -> str:
    return f"""
  SELECT p.i, p.j,
         CAST(FLOOR(CAST(p.t AS DOUBLE)
              * (CAST(g.d AS DOUBLE) / CAST(g.cs AS DOUBLE)) + 0.5)
              AS BIGINT) AS t
  FROM {prev} p
  JOIN (SELECT p2.j, MAX(tg.d) AS d, SUM(p2.t) AS cs
        FROM {prev} p2 JOIN ipf_tgt tg ON tg.z = p2.j
        GROUP BY p2.j) g ON g.j = p.j
"""


_IPF_FINAL = f"""
SELECT tg.z AS zone,
       tg.o AS target_o, rs.rs AS row_sum,
       tg.d AS target_d, cs.cs AS col_sum,
       ABS(rs.rs - tg.o) AS row_resid,
       ABS(cs.cs - tg.d) AS col_resid
FROM ipf_tgt tg
JOIN (SELECT i, CAST(SUM(t) AS BIGINT) AS rs
      FROM ipf_t_{2 * _IPF_ROUNDS} GROUP BY i) rs ON rs.i = tg.z
JOIN (SELECT j, CAST(SUM(t) AS BIGINT) AS cs
      FROM ipf_t_{2 * _IPF_ROUNDS} GROUP BY j) cs ON cs.j = tg.z
ORDER BY tg.z
"""


def _ipf_oracle() -> str:
    ctes = [
        f"ipf_marg AS MATERIALIZED ({_IPF_MARG})",
        f"ipf_tgt AS MATERIALIZED ({_IPF_TGT})",
        f"ipf_t_0 AS MATERIALIZED ({_IPF_SEED})",
    ]
    for r in range(1, _IPF_ROUNDS + 1):
        ctes.append(
            f"ipf_t_{2 * r - 1} AS MATERIALIZED"
            f" ({_ipf_row_sql(f'ipf_t_{2 * r - 2}')})"
        )
        ctes.append(
            f"ipf_t_{2 * r} AS MATERIALIZED"
            f" ({_ipf_col_sql(f'ipf_t_{2 * r - 1}')})"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + _IPF_FINAL


@register("gravity_ipf_od_balance", _ipf_oracle())
def gravity_ipf_od_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doubly-constrained gravity OD matrix: inverse-square seed
    balanced to per-zone productions/attractions by 8 IPF rounds with
    integer micro-trip re-quantization each step; reports both
    marginals and residuals per zone."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    spark.sql(_IPF_MARG).localCheckpoint().createOrReplaceTempView("ipf_marg")
    spark.sql(_IPF_TGT).localCheckpoint().createOrReplaceTempView("ipf_tgt")
    spark.sql(_IPF_SEED).localCheckpoint().createOrReplaceTempView("ipf_t_0")
    for r in range(1, _IPF_ROUNDS + 1):
        spark.sql(_ipf_row_sql(f"ipf_t_{2 * r - 2}")).localCheckpoint(
        ).createOrReplaceTempView(f"ipf_t_{2 * r - 1}")
        spark.sql(_ipf_col_sql(f"ipf_t_{2 * r - 1}")).localCheckpoint(
        ).createOrReplaceTempView(f"ipf_t_{2 * r}")
    return spark.sql(_IPF_FINAL)
