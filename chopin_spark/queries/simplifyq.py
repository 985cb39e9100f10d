"""Douglas–Peucker simplification query: bounded-round distributed DP
(chopin_spark.simplify) vs a DuckDB oracle that replays the IDENTICAL
bounded algorithm as unrolled CTE rounds (the pagerank/hits oracle
discipline applied to recursive geometry).

Fixture: 40 deterministic integer polylines × 33 vertices (LCG jitter
around a monotone x spine) — regenerable in either engine from
generate_series/spark.range, exact int64 arithmetic end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark.queries import register
from chopin_spark.simplify import dp_simplify_summary

_NL, _M = 40, 33
_TAU2 = 90_000  # τ = 300
_ROUNDS = 4  # DP depth for the fixture's split tree; both engines share it

_VX = "(i * 500 + ((l * 7 + i * 13) % 41) - 20)"
_VY = "(l * 10000 + ABS((i * 125 + l * 237) % 4000 - 2000) - 1000 + ((l * 13 + i * 29) % 41) - 20)"


def _dp_oracle() -> str:
    ctes = [
        f"""v AS (
  SELECT l AS line_id, i AS idx,
         CAST({_VX} AS BIGINT) AS x, CAST({_VY} AS BIGINT) AS y
  FROM generate_series(0, {_NL - 1}) a(l),
       generate_series(0, {_M - 1}) b(i)
)""",
        f"""iv0 AS (
  SELECT s.line_id, s.idx AS s, e.idx AS e,
         s.x AS sx, s.y AS sy, e.x AS ex, e.y AS ey
  FROM v s JOIN v e ON s.line_id = e.line_id
  WHERE s.idx = 0 AND e.idx = {_M - 1}
)""",
    ]
    for r in range(1, _ROUNDS + 1):
        p = r - 1
        ctes.append(f"""
cand{r} AS (
  SELECT iv.line_id, iv.s, iv.e, iv.sx, iv.sy, iv.ex, iv.ey,
         v.idx, v.x, v.y,
         ((iv.ex - iv.sx) * (v.y - iv.sy)
          - (iv.ey - iv.sy) * (v.x - iv.sx)) AS cr,
         ((iv.ex - iv.sx) * (iv.ex - iv.sx)
          + (iv.ey - iv.sy) * (iv.ey - iv.sy)) AS l2
  FROM iv{p} iv
  JOIN v ON v.line_id = iv.line_id AND v.idx > iv.s AND v.idx < iv.e
),
best{r} AS (
  SELECT * FROM (
    SELECT line_id, s, e, sx, sy, ex, ey, idx, x, y,
           cr * cr AS cross2, l2,
           ROW_NUMBER() OVER (PARTITION BY line_id, s, e
                              ORDER BY cr * cr DESC, idx) AS rn
    FROM cand{r}
  ) WHERE rn = 1
),
fin{r} AS (
  SELECT line_id, s, e FROM best{r} WHERE cross2 <= {_TAU2} * l2
  UNION ALL
  SELECT iv.line_id, iv.s, iv.e FROM iv{p} iv
  LEFT JOIN (SELECT DISTINCT line_id, s, e FROM cand{r}) c
    ON c.line_id = iv.line_id AND c.s = iv.s AND c.e = iv.e
  WHERE c.line_id IS NULL
),
iv{r} AS (
  SELECT line_id, s, idx AS e, sx, sy, x AS ex, y AS ey
  FROM best{r} WHERE cross2 > {_TAU2} * l2
  UNION ALL
  SELECT line_id, idx AS s, e, x AS sx, y AS sy, ex, ey
  FROM best{r} WHERE cross2 > {_TAU2} * l2
)""".strip())
    fins = "\nUNION ALL\n".join(
        f"SELECT line_id, s, e FROM fin{r}" for r in range(1, _ROUNDS + 1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f""",
alldone AS ({fins}),
kept AS (
  SELECT DISTINCT line_id, idx FROM (
    SELECT line_id, s AS idx FROM alldone
    UNION ALL SELECT line_id, e FROM alldone
    UNION ALL SELECT line_id, s FROM iv{_ROUNDS}
    UNION ALL SELECT line_id, e FROM iv{_ROUNDS}
    UNION ALL
    SELECT v.line_id, v.idx
    FROM iv{_ROUNDS} iv JOIN v
      ON v.line_id = iv.line_id AND v.idx > iv.s AND v.idx < iv.e
  )
),
kv AS (
  SELECT k.line_id, k.idx, v.x, v.y,
         LAG(v.x) OVER (PARTITION BY k.line_id ORDER BY k.idx) AS px,
         LAG(v.y) OVER (PARTITION BY k.line_id ORDER BY k.idx) AS py
  FROM kept k JOIN v ON v.line_id = k.line_id AND v.idx = k.idx
)
SELECT line_id,
       COUNT(*) AS n_kept,
       CAST(SUM(idx * idx) AS BIGINT) AS idx_chk,
       CAST(SUM(CASE WHEN px IS NULL THEN 0
                ELSE (x - px) * (x - px) + (y - py) * (y - py) END)
            AS BIGINT) AS len2_sum
FROM kv
GROUP BY 1"""
    )


def _vertices(spark: SparkSession) -> DataFrame:
    return spark.range(_NL * _M).selectExpr(
        f"CAST(id DIV {_M} AS BIGINT) AS l",
        f"CAST(id % {_M} AS BIGINT) AS i",
    ).selectExpr(
        "l AS line_id",
        "i AS idx",
        f"CAST({_VX} AS BIGINT) AS x",
        f"CAST({_VY} AS BIGINT) AS y",
    )


@register("simplify_dp_roads", _dp_oracle())
def simplify_dp_roads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Douglas–Peucker (terra::simplifyGeom parity) on the
    deterministic polyline fixture: bounded-round interval refinement,
    exact-integer cross²-vs-τ²L² deviation tests, smallest-index tie
    break.  The oracle unrolls the SAME rounds as CTEs, so the kept
    set, its checksum, and the simplified squared-length sum are
    value-hash exact — recursion replayed, not approximated."""
    return dp_simplify_summary(_vertices(spark), _TAU2, _ROUNDS)


# --- Chaikin corner-cutting smoothing (exact dyadic, 2 rounds) -----------------
#
# The smoothing counterpart to DP simplification (terra has smooth()
# via the smoothr package; Chaikin 1974 is its default algorithm):
# each round replaces every segment (P_i, P_i+1) with the quarter
# points Q = (3P_i + P_i+1)/4 and R = (P_i + 3P_i+1)/4, keeping the
# open-curve endpoints.  Working in 4^r-scaled INTEGER coordinates
# makes every round exact int64 (Q = 3a+b, R = a+3b; endpoints x4), so
# both engines unroll the identical two rounds as shared CTE text —
# no floats until the final length/roughness ratios.  Roughness =
# sum of squared second differences (the discrete bending energy the
# cut provably shrinks); its 4^2r scale divides out as an exact
# power-of-two dyadic division.
#
# Scale shape: each round is one self-join on (line_id, idx+1) + a
# per-line MAX — co-partitioned by line_id throughout, rounds
# constant (2), vertex growth 2x/round.

def _chaikin_round(src: str, r: int) -> str:
    return f"""
mx{r} AS (SELECT line_id, MAX(idx) AS mi FROM {src} GROUP BY 1),
c{r} AS (
  SELECT v.line_id, CAST(0 AS BIGINT) AS idx,
         v.x * 4 AS x, v.y * 4 AS y
  FROM {src} v WHERE v.idx = 0
  UNION ALL
  SELECT a.line_id, 2 * a.idx + 1, 3 * a.x + b.x, 3 * a.y + b.y
  FROM {src} a JOIN {src} b
    ON b.line_id = a.line_id AND b.idx = a.idx + 1
  UNION ALL
  SELECT a.line_id, 2 * a.idx + 2, a.x + 3 * b.x, a.y + 3 * b.y
  FROM {src} a JOIN {src} b
    ON b.line_id = a.line_id AND b.idx = a.idx + 1
  UNION ALL
  SELECT v.line_id, 2 * mx.mi + 1, v.x * 4, v.y * 4
  FROM {src} v JOIN mx{r} mx
    ON mx.line_id = v.line_id AND v.idx = mx.mi
)"""


def _stage_stats(src: str, scale: int, tag: str) -> str:
    """Per-line vertex count, length (original units), and dyadic-exact
    bending roughness for one smoothing stage."""
    return f"""
len{tag} AS (
  SELECT a.line_id,
         SUM(SQRT(CAST((b.x - a.x) * (b.x - a.x)
                       + (b.y - a.y) * (b.y - a.y) AS DOUBLE))) AS s
  FROM {src} a JOIN {src} b
    ON b.line_id = a.line_id AND b.idx = a.idx + 1
  GROUP BY 1
),
rg{tag} AS (
  SELECT a.line_id,
         CAST(SUM((c.x - 2 * b.x + a.x) * (c.x - 2 * b.x + a.x)
                  + (c.y - 2 * b.y + a.y) * (c.y - 2 * b.y + a.y))
              AS BIGINT) AS rough_scaled
  FROM {src} a
  JOIN {src} b ON b.line_id = a.line_id AND b.idx = a.idx + 1
  JOIN {src} c ON c.line_id = a.line_id AND c.idx = a.idx + 2
  GROUP BY 1
),
st{tag} AS (
  SELECT n.line_id, n.n, l.s, r.rough_scaled
  FROM (SELECT line_id, CAST(COUNT(*) AS BIGINT) AS n
        FROM {src} GROUP BY 1) n
  JOIN len{tag} l ON l.line_id = n.line_id
  JOIN rg{tag} r ON r.line_id = n.line_id
)"""


_CHK_TAIL = f"""
SELECT a.line_id,
       a.n AS n_before, b.n AS n_after,
       ROUND(a.s, 4) AS len_before,
       ROUND(b.s / 16.0, 4) AS len_after,
       a.rough_scaled AS rough_before,
       ROUND(CAST(b.rough_scaled AS DOUBLE) / 256.0, 4) AS rough_after
FROM st0 a JOIN st2 b ON b.line_id = a.line_id
"""


def _chaikin_sql(vsrc: str) -> str:
    return (
        f"WITH v AS ({vsrc}),"
        + _chaikin_round("v", 1) + ","
        + _chaikin_round("c1", 2) + ","
        + _stage_stats("v", 1, "0") + ","
        + _stage_stats("c2", 16, "2")
        + _CHK_TAIL
    )


_CHK_V_DUCK = f"""
  SELECT l AS line_id, i AS idx,
         CAST({_VX} AS BIGINT) AS x, CAST({_VY} AS BIGINT) AS y
  FROM generate_series(0, {_NL - 1}) a(l),
       generate_series(0, {_M - 1}) b(i)
"""

_CHK_V_SPARK = f"""
  SELECT l AS line_id, i AS idx,
         CAST({_VX} AS BIGINT) AS x, CAST({_VY} AS BIGINT) AS y
  FROM (SELECT explode(sequence(0, {_NL - 1})) AS l)
  CROSS JOIN (SELECT explode(sequence(0, {_M - 1})) AS i)
"""


@register("chaikin_smooth_roads", _chaikin_sql(_CHK_V_DUCK))
def chaikin_smooth_roads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two exact-dyadic Chaikin corner-cutting rounds over the polyline
    fixture: per-line vertex growth, length change, and the bending
    roughness the cut shrinks — all integer carriers until the final
    ratios.

    Spark composes the rounds imperatively with a localCheckpoint per
    stage: each round references its source 5x and the stats CTEs 8x
    more, and Spark inlines WITH chains per reference (no common-
    subplan reuse — the tile-pyramid lesson), which blew planning +
    codegen to 6.5 s for a 1320-row fixture as one statement; the
    cascade runs in ~1 s.  The oracle stays one text (DuckDB reuses
    CTEs)."""
    spark.sql(f"SELECT * FROM ({_CHK_V_SPARK}) q").localCheckpoint(
    ).createOrReplaceTempView("chk_v")
    for rnd, src in ((1, "chk_v"), (2, "chk_c1")):
        spark.sql(
            f"WITH {_chaikin_round(src, rnd).strip()}"
            f" SELECT * FROM c{rnd}"
        ).localCheckpoint().createOrReplaceTempView(f"chk_c{rnd}")
    return spark.sql(
        "WITH "
        + _stage_stats("chk_v", 1, "0").strip() + ","
        + _stage_stats("chk_c2", 16, "2").strip()
        + _CHK_TAIL
    )


# --- Visvalingam–Whyatt simplification (effective-area, round-unrolled) -------
#
# The OTHER canonical line-simplifier (Visvalingam & Whyatt 1993,
# rmapshaper/mapshaper's default — the tool chopin users reach for
# before DP when shape character matters): repeatedly delete the
# vertex with the smallest effective area (triangle with its two
# SURVIVING neighbors), recomputing neighbors after each removal.
# Bounded variant here: exactly K global-min removals per line —
# K unrolled rounds, each one window pass (LAG/LEAD over survivors)
# + one ROW_NUMBER argmin + one NOT EXISTS anti-join, IDENTICAL SQL
# in both engines (the chaikin/DP discipline).  Exact int64: areas
# are cross-product 2A values of integer coords; ties break by idx.
#
# Scale shape: rounds are a fixed K (a simplification BUDGET, the way
# production generalization pipelines batch it), each round touching
# |lines|×|alive| rows partitioned by line — embarrassingly parallel
# across lines, no cross-line traffic.  The priority-queue sequential
# formulation (remove-one-recompute-one) is PER LINE; K-round batching
# trades a bounded area-ordering deviation for full vectorization.

_VW_ROUNDS = 8


# The round SQL is ONE text used by both engines; execution differs
# (the no-inline-blowup rule): alive{r-1} is referenced twice per
# round, so a single nested-CTE plan recomputes alive0 2^K times —
# DuckDB gets AS MATERIALIZED barriers, Spark runs each round against
# a localCheckpoint'ed temp view (the DP/chaikin engine discipline).

_VW_W = "PARTITION BY line_id ORDER BY idx"

def _vw_area_sql(prev: str) -> str:
    w = _VW_W
    return f"""
  SELECT line_id, idx, x, y,
         ABS((x - LAG(x) OVER ({w})) * (LEAD(y) OVER ({w}) - LAG(y) OVER ({w}))
           - (y - LAG(y) OVER ({w})) * (LEAD(x) OVER ({w}) - LAG(x) OVER ({w})))
           AS a2
  FROM {prev}"""


def _vw_drop_sql(a: str) -> str:
    return f"""
  SELECT line_id, idx, a2 FROM (
    SELECT line_id, idx, a2,
           ROW_NUMBER() OVER (PARTITION BY line_id ORDER BY a2, idx) AS rn
    FROM {a} WHERE a2 IS NOT NULL
  ) t WHERE rn = 1"""


def _vw_alive_sql(prev: str, drop: str) -> str:
    return f"""
  SELECT v.line_id, v.idx, v.x, v.y FROM {prev} v
  WHERE NOT EXISTS (SELECT 1 FROM {drop} d
                    WHERE d.line_id = v.line_id AND d.idx = v.idx)"""


def _vw_summary_sql(alive: str, drops: str) -> str:
    return f"""
WITH removed AS (
  SELECT line_id, CAST(SUM(a2) AS BIGINT) AS removed_area2,
         CAST(COUNT(*) AS BIGINT) AS n_removed
  FROM ({drops}) u GROUP BY line_id
)
SELECT a.line_id,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(a.x) AS BIGINT) AS sum_x,
       CAST(SUM(a.y) AS BIGINT) AS sum_y,
       r.n_removed, r.removed_area2
FROM {alive} a
JOIN removed r ON r.line_id = a.line_id
GROUP BY a.line_id, r.n_removed, r.removed_area2
ORDER BY a.line_id
"""


def _vw_oracle() -> str:
    ctes = [f"alive0 AS MATERIALIZED ({_CHK_V_DUCK})"]
    for r in range(1, _VW_ROUNDS + 1):
        ctes.append(
            f"a{r} AS MATERIALIZED ({_vw_area_sql(f'alive{r - 1}')})"
        )
        ctes.append(f"drop{r} AS MATERIALIZED ({_vw_drop_sql(f'a{r}')})")
        ctes.append(
            f"alive{r} AS MATERIALIZED"
            f" ({_vw_alive_sql(f'alive{r - 1}', f'drop{r}')})"
        )
    drops = " UNION ALL ".join(
        f"SELECT line_id, a2 FROM drop{r}" for r in range(1, _VW_ROUNDS + 1)
    )
    body = _vw_summary_sql(f"alive{_VW_ROUNDS}", drops)
    assert body.startswith("\nWITH ")
    return "WITH " + ",\n".join(ctes) + "," + body[len("\nWITH "):]


@register("simplify_vw_roads", _vw_oracle())
def simplify_vw_roads(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Visvalingam–Whyatt simplification, 8 exact-int effective-area
    removal rounds per line over the shared 40×33 polyline fixture:
    survivor count/coordinate checksums plus the removed 2A mass."""
    spark.sql(f"SELECT * FROM ({_CHK_V_SPARK}) q").localCheckpoint(
    ).createOrReplaceTempView("vw_alive_0")
    for r in range(1, _VW_ROUNDS + 1):
        spark.sql(_vw_area_sql(f"vw_alive_{r - 1}")).localCheckpoint(
        ).createOrReplaceTempView(f"vw_a_{r}")
        spark.sql(_vw_drop_sql(f"vw_a_{r}")).localCheckpoint(
        ).createOrReplaceTempView(f"vw_drop_{r}")
        spark.sql(
            _vw_alive_sql(f"vw_alive_{r - 1}", f"vw_drop_{r}")
        ).localCheckpoint().createOrReplaceTempView(f"vw_alive_{r}")
    drops = " UNION ALL ".join(
        f"SELECT line_id, a2 FROM vw_drop_{r}"
        for r in range(1, _VW_ROUNDS + 1)
    )
    return spark.sql(_vw_summary_sql(f"vw_alive_{_VW_ROUNDS}", drops))
