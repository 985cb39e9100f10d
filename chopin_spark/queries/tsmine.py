"""Time-series mining over the event stream: autocorrelation (ACF)
and SAX symbolic motifs (Lin, Keogh, Lonardi & Chiu 2003 — the
standard motif alphabet for volume series), complementing the existing
Mann–Kendall / emerging-hotspot family in queries/spatial.py.

Shared-SQL discipline (repo rule): every reduction is an exact-int64
sum — the series are integer daily counts, centering is scaled by n
(z_t = n·c_t − Σc, exact), PAA uses block SUMs not means, and SAX
breakpoints are empirical quartiles via NTILE with a total ORDER BY
(deterministic in both engines).  Doubles appear only in final
ROUND()ed ratio columns; the lone SQRT sits inside the ROUNDed
Mann–Kendall z.

Scale shape: each statistic is one groupBy over (key, day) — a
vocabulary-bounded shuffle — followed by per-key work bounded by the
calendar (≤5 lag joins, ≤10 PAA blocks per key), so cost is linear in
keys no matter the fact size.  Cells/types
with zero activity are dropped before densification, so the dense
frame is |active keys| × 31, never |grid| × 31.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from chopin_spark import sqlexpr as sx
from chopin_spark.queries import register
from chopin_spark.tables import load

# calendar CTEs: the only engine-divergent text (sequence explode)
_DAYS_SPARK = (
    "days AS (SELECT CAST(x AS BIGINT) AS dd"
    " FROM (SELECT explode(sequence(1, 31)) AS x))"
)
_DAYS_DUCK = (
    "days AS (SELECT CAST(UNNEST(generate_series(1, 31)) AS BIGINT) AS dd)"
)
_D30_SPARK = (
    "days AS (SELECT CAST(x AS BIGINT) AS dd"
    " FROM (SELECT explode(sequence(1, 30)) AS x))"
)
_D30_DUCK = (
    "days AS (SELECT CAST(UNNEST(generate_series(1, 30)) AS BIGINT) AS dd)"
)
_LAGS_SPARK = (
    "lags AS (SELECT CAST(x AS BIGINT) AS k"
    " FROM (SELECT explode(sequence(1, 5)) AS x))"
)
_LAGS_DUCK = (
    "lags AS (SELECT CAST(UNNEST(generate_series(1, 5)) AS BIGINT) AS k)"
)


# --- lag-k autocorrelation of daily volumes -----------------------------------
#
# r_k = Σ(c_t−μ)(c_{t+k}−μ) / Σ(c_t−μ)² per event type, k = 1..5, on
# the zero-densified January calendar.  Scaling by n clears the mean:
# with z_t = n·c_t − S both numerator and denominator pick up the same
# n² factor, so r_k = Σ z_t·z_{t+k} / Σ z_t² over EXACT int64 terms
# (|z| ≤ 31·c, z² sums ~1e12 at sf1 — headroom to c ≈ 1e8/day/type).

_ACF_BODY = """
daily AS (
  SELECT event_type, CAST(day(ts) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE month(ts) = 1
  GROUP BY 1, 2
),
types AS (SELECT DISTINCT event_type FROM daily),
dense AS (
  SELECT t.event_type, days.dd AS d,
         COALESCE(daily.c, CAST(0 AS BIGINT)) AS c
  FROM types t CROSS JOIN days
  LEFT JOIN daily ON daily.event_type = t.event_type AND daily.d = days.dd
),
stats AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s
  FROM dense GROUP BY 1
),
z AS (
  SELECT dense.event_type, dense.d, stats.n * dense.c - stats.s AS z
  FROM dense JOIN stats ON stats.event_type = dense.event_type
),
den AS (
  SELECT event_type, CAST(SUM(z * z) AS BIGINT) AS den
  FROM z GROUP BY 1
),
num AS (
  SELECT a.event_type, lags.k, CAST(SUM(a.z * b.z) AS BIGINT) AS num
  FROM z a CROSS JOIN lags
  JOIN z b ON b.event_type = a.event_type AND b.d = a.d + lags.k
  GROUP BY 1, 2
)
SELECT num.event_type, num.k AS lag, num.num AS num_scaled,
       ROUND(CAST(num.num AS DOUBLE) / den.den, 6) AS acf
FROM num JOIN den ON den.event_type = num.event_type
"""

_ACF_SPARK = f"WITH {_DAYS_SPARK}, {_LAGS_SPARK},\n{_ACF_BODY.strip()}"
_ACF_ORACLE = f"WITH {_DAYS_DUCK}, {_LAGS_DUCK},\n{_ACF_BODY.strip()}"


@register("acf_daily_volume", _ACF_ORACLE)
def acf_daily_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag 1–5 autocorrelation of each event type's daily volume,
    integer-exact to the final ratio via n-scaled centering."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_ACF_SPARK)


# --- SAX motifs over daily volumes --------------------------------------------
#
# The full SAX pipeline on integer carriers: PAA = SUM over 3-day
# blocks (day 1–30 → blocks 0–9; sums, not means — same ordering,
# exact), symbols = empirical quartiles via NTILE(4) with the total
# tie-break (paa, block), words = 3 consecutive block symbols.  Lin et
# al.'s Gaussian breakpoints need μ/σ; the quantile alphabet is the
# distribution-free variant and is exactly reproducible cross-engine.

_SAX_BODY = """
daily AS (
  SELECT event_type, CAST(day(ts) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE month(ts) = 1 AND day(ts) <= 30
  GROUP BY 1, 2
),
types AS (SELECT DISTINCT event_type FROM daily),
dense AS (
  SELECT t.event_type, days.dd AS d,
         COALESCE(daily.c, CAST(0 AS BIGINT)) AS c
  FROM types t CROSS JOIN days
  LEFT JOIN daily ON daily.event_type = t.event_type AND daily.d = days.dd
),
paa AS (
  SELECT event_type, CAST(FLOOR((d - 1) / 3.0) AS BIGINT) AS blk,
         CAST(SUM(c) AS BIGINT) AS v
  FROM dense GROUP BY 1, 2
),
sym AS (
  SELECT event_type, blk,
         SUBSTRING('abcd',
                   NTILE(4) OVER (PARTITION BY event_type
                                  ORDER BY v, blk),
                   1) AS s
  FROM paa
),
words AS (
  SELECT event_type, blk,
         s || LEAD(s, 1) OVER (PARTITION BY event_type ORDER BY blk)
           || LEAD(s, 2) OVER (PARTITION BY event_type ORDER BY blk)
           AS word
  FROM sym
)
SELECT event_type, word, CAST(COUNT(*) AS BIGINT) AS n_occurrences
FROM words WHERE word IS NOT NULL
GROUP BY 1, 2
"""

_SAX_SPARK = f"WITH {_D30_SPARK},\n{_SAX_BODY.strip()}"
_SAX_ORACLE = f"WITH {_D30_DUCK},\n{_SAX_BODY.strip()}"


@register("sax_volume_motifs", _SAX_ORACLE)
def sax_volume_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAX words (PAA-3, quartile alphabet abcd) over each event
    type's January volume series, with motif occurrence counts."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_SAX_SPARK)


# --- seasonal decomposition (STL-lite: trend / day-of-week / remainder) --------
#
# Classical additive decomposition of each event type's daily volume:
# trend = centered 7-day moving average (full windows only), seasonal
# = day-of-week mean of the detrended series, remainder = what's left.
# Every carrier stays exact int64 by scaling out the divisions —
# detrended×7 = 7c − Σ₇c, remainder×(7·sden) = sden·det7 − snum — so
# the decomposition is bit-reproducible at any partitioning; the
# ROUNDed doubles are exact-integer ratios evaluated once.

_STL_BODY = """
daily AS (
  SELECT event_type, CAST(day(ts) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE month(ts) = 1
  GROUP BY 1, 2
),
types AS (SELECT DISTINCT event_type FROM daily),
dense AS (
  SELECT t.event_type, days.dd AS d,
         COALESCE(daily.c, CAST(0 AS BIGINT)) AS c
  FROM types t CROSS JOIN days
  LEFT JOIN daily ON daily.event_type = t.event_type AND daily.d = days.dd
),
w AS (
  SELECT event_type, d, c,
         CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY d
                           ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
              AS BIGINT) AS t7,
         CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY d
                             ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
              AS BIGINT) AS t7n
  FROM dense
),
det AS (
  SELECT event_type, d, c, t7, 7 * c - t7 AS det7
  FROM w WHERE t7n = 7
),
dow AS (
  SELECT event_type, d % 7 AS dw, CAST(SUM(det7) AS BIGINT) AS snum,
         CAST(COUNT(*) AS BIGINT) AS sden
  FROM det GROUP BY 1, 2
)
SELECT det.event_type, det.d, det.c,
       ROUND(CAST(det.t7 AS DOUBLE) / 7, 4) AS trend,
       ROUND(CAST(dow.snum AS DOUBLE) / (7 * dow.sden), 4) AS seasonal,
       ROUND(CAST(dow.sden * det.det7 - dow.snum AS DOUBLE)
             / (7 * dow.sden), 4) AS remainder
FROM det JOIN dow ON dow.event_type = det.event_type
                 AND dow.dw = det.d % 7
"""

_STL_SPARK = f"WITH {_DAYS_SPARK},\n{_STL_BODY.strip()}"
_STL_ORACLE = f"WITH {_DAYS_DUCK},\n{_STL_BODY.strip()}"


@register("stl_decompose_volume", _STL_ORACLE)
def stl_decompose_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive seasonal decomposition of daily event volume per type:
    7-day-MA trend, day-of-week seasonal, remainder — divisions scaled
    out so every intermediate is exact int64."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_STL_SPARK)


# --- Kleinberg burst detection (2-state automaton over daily volumes) ----------
#
# Kleinberg's "bursty and hierarchical structure in streams" (KDD
# 2002), batch variant: each day an event type emits c of the day's n
# events; a 2-state automaton (base rate p0 = R/D, burst rate
# p1 = min(1.25·p0, 31/32)) with an up-transition penalty γ explains the
# series; the optimal (Viterbi) state sequence marks the burst days.
#
# Exactness: binomial log-costs are quantized to an integer lattice
# (FLOOR at 2^10) IMMEDIATELY after the one LN evaluation — the whole
# DP then runs in exact int64 min-plus arithmetic, so both engines
# agree bit-for-bit regardless of association order (costs ~7e6; the
# FLOOR boundary band is ~1.6e-9 per value).
#
# Scale shape — the point of this operator: Viterbi is sequential, but
# min-plus 2×2 matrix products are ASSOCIATIVE, so prefix costs L(t)
# and suffix costs R(t) come from a Hillis–Steele doubling scan —
# ⌈log2 T⌉ self-joins each, not T sequential rounds.  At 31 days that
# is 5+5 joins over a (type, day) table; at 10^5 timesteps it is 17 —
# the same shape that makes pointer-doubling CC and watershed scale.
# Day t is a burst iff the best path forced through state 1 at t
# strictly beats the best through state 0 (marginal labeling —
# deterministic, no backpointers to ship).  The Spark side cuts
# lineage per round (155-row frames; the final plan reads zero
# parquet); the DuckDB oracle is the INDEPENDENT sequential recursive-
# CTE DP, so a doubling bug cannot cancel out.

_KB_Q = 1024
_KB_G = 2 * _KB_Q
_KB_INF = 10**15

# shared emission lattice: (event_type, d, c, n) -> integer costs
_KB_BASE = """
daily AS (
  SELECT event_type, CAST(day(ts) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE month(ts) = 1
  GROUP BY 1, 2
),
types AS (SELECT DISTINCT event_type FROM daily),
dense AS (
  SELECT t.event_type, days.dd AS d,
         COALESCE(daily.c, CAST(0 AS BIGINT)) AS c
  FROM types t CROSS JOIN days
  LEFT JOIN daily ON daily.event_type = t.event_type AND daily.d = days.dd
),
dn AS (
  SELECT event_type, d, c,
         CAST(SUM(c) OVER (PARTITION BY d) AS BIGINT) AS n
  FROM dense
),
rates AS (
  SELECT event_type, d, c, n,
         CAST(SUM(c) OVER (PARTITION BY event_type) AS DOUBLE)
           / SUM(n) OVER (PARTITION BY event_type) AS p0
  FROM dn
),
base AS {MAT}(
  SELECT event_type, d, c, n,
         CAST(FLOOR(0.0 - {Q} * (c * LN(p0)
                                 + (n - c) * LN(1.0 - p0)))
              AS BIGINT) AS e0,
         CAST(FLOOR(0.0 - {Q} * (c * LN(LEAST(1.25 * p0, 0.96875))
                                 + (n - c)
                                   * LN(1.0 - LEAST(1.25 * p0, 0.96875))))
              AS BIGINT) AS e1
  FROM rates
)
""".replace("{Q}", str(_KB_Q))

_KB_BASE_SPARK = _KB_BASE.replace("{MAT}", "")
_KB_BASE_DUCK = _KB_BASE.replace("{MAT}", "MATERIALIZED ")

_KB_FINAL = f"""
SELECT p.event_type, p.d, b.c,
       p.m00 + LEAST(s.m00, s.m01) AS cost_base,
       p.m01 + LEAST(s.m10, s.m11) AS cost_burst,
       CAST(CASE WHEN p.m01 + LEAST(s.m10, s.m11)
                      < p.m00 + LEAST(s.m00, s.m01)
                 THEN 1 ELSE 0 END AS BIGINT) AS burst
FROM kb_pref p
JOIN kb_suf s ON s.event_type = p.event_type AND s.d = p.d
JOIN kb_base b ON b.event_type = p.event_type AND b.d = p.d
"""

_KB_ORACLE = f"""
WITH RECURSIVE {_DAYS_DUCK},
{_KB_BASE_DUCK.strip()},
fwd AS (
  SELECT event_type, CAST(0 AS BIGINT) AS t,
         CAST(0 AS BIGINT) AS l0, CAST({_KB_INF} AS BIGINT) AS l1
  FROM types
  UNION ALL
  SELECT m.event_type, m.d,
         LEAST(fwd.l0, fwd.l1) + m.e0,
         LEAST(fwd.l0 + {_KB_G}, fwd.l1) + m.e1
  FROM fwd JOIN base m ON m.event_type = fwd.event_type
                      AND m.d = fwd.t + 1
),
bwd AS (
  SELECT event_type, CAST(31 AS BIGINT) AS t,
         CAST(0 AS BIGINT) AS r0, CAST(0 AS BIGINT) AS r1
  FROM types
  UNION ALL
  SELECT m.event_type, bwd.t - 1,
         LEAST(m.e0 + bwd.r0, {_KB_G} + m.e1 + bwd.r1),
         LEAST(m.e0 + bwd.r0, m.e1 + bwd.r1)
  FROM bwd JOIN base m ON m.event_type = bwd.event_type
                      AND m.d = bwd.t
  WHERE bwd.t >= 1
)
SELECT f.event_type, f.t AS d, b.c,
       f.l0 + w.r0 AS cost_base,
       f.l1 + w.r1 AS cost_burst,
       CAST(CASE WHEN f.l1 + w.r1 < f.l0 + w.r0
                 THEN 1 ELSE 0 END AS BIGINT) AS burst
FROM fwd f
JOIN bwd w ON w.event_type = f.event_type AND w.t = f.t
JOIN base b ON b.event_type = f.event_type AND b.d = f.t
WHERE f.t >= 1
"""

# compose anchor row with a joined row: PRE = joined(d−step) ⊗ anchor
# (prefix scan, joined is the EARLIER factor); SUF = anchor ⊗
# joined(d+step).  Min-plus products do not commute — the two scans
# need opposite orders.  Fallback (edge of the window) keeps the
# anchor unchanged.
_KB_COMPOSE_PRE = """
SELECT a.event_type, a.d,
       CASE WHEN j.d IS NULL THEN a.m00
            ELSE LEAST(j.m00 + a.m00, j.m01 + a.m10) END AS m00,
       CASE WHEN j.d IS NULL THEN a.m01
            ELSE LEAST(j.m00 + a.m01, j.m01 + a.m11) END AS m01,
       CASE WHEN j.d IS NULL THEN a.m10
            ELSE LEAST(j.m10 + a.m00, j.m11 + a.m10) END AS m10,
       CASE WHEN j.d IS NULL THEN a.m11
            ELSE LEAST(j.m10 + a.m01, j.m11 + a.m11) END AS m11
FROM {src} a LEFT JOIN {src} j
  ON j.event_type = a.event_type AND j.d = a.d - {step}
"""

_KB_COMPOSE_SUF = """
SELECT a.event_type, a.d,
       CASE WHEN j.d IS NULL THEN a.m00
            ELSE LEAST(a.m00 + j.m00, a.m01 + j.m10) END AS m00,
       CASE WHEN j.d IS NULL THEN a.m01
            ELSE LEAST(a.m00 + j.m01, a.m01 + j.m11) END AS m01,
       CASE WHEN j.d IS NULL THEN a.m10
            ELSE LEAST(a.m10 + j.m00, a.m11 + j.m10) END AS m10,
       CASE WHEN j.d IS NULL THEN a.m11
            ELSE LEAST(a.m10 + j.m01, a.m11 + j.m11) END AS m11
FROM {src} a LEFT JOIN {src} j
  ON j.event_type = a.event_type AND j.d = a.d + {step}
"""


@register("kleinberg_burst_volume", _KB_ORACLE)
def kleinberg_burst_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kleinberg 2-state burst detection per event type: integer
    min-plus Viterbi evaluated as a log-depth prefix/suffix doubling
    scan (5+5 joins for 31 days), lineage cut per round."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    spark.sql(
        f"WITH {_DAYS_SPARK},\n{_KB_BASE_SPARK.strip()}\nSELECT * FROM base"
    ).localCheckpoint().createOrReplaceTempView("kb_base")

    # prefix: M_d with start-state pinning handled by reading row [0][*]
    spark.sql(f"""
        SELECT event_type, d, e0 AS m00, {_KB_G} + e1 AS m01,
               e0 AS m10, e1 AS m11
        FROM kb_base
    """).localCheckpoint().createOrReplaceTempView("kb_pref_0")
    # suffix base: matrix of day d+1; identity at d = 31
    spark.sql(f"""
        SELECT b.event_type, b.d,
               COALESCE(nx.e0, CAST(0 AS BIGINT)) AS m00,
               COALESCE({_KB_G} + nx.e1, CAST({_KB_INF} AS BIGINT)) AS m01,
               COALESCE(nx.e0, CAST({_KB_INF} AS BIGINT)) AS m10,
               COALESCE(nx.e1, CAST(0 AS BIGINT)) AS m11
        FROM kb_base b
        LEFT JOIN kb_base nx ON nx.event_type = b.event_type
                            AND nx.d = b.d + 1
    """).localCheckpoint().createOrReplaceTempView("kb_suf_0")

    for i, step in enumerate((1, 2, 4, 8, 16)):
        spark.sql(
            _KB_COMPOSE_PRE.format(src=f"kb_pref_{i}", step=step)
        ).localCheckpoint().createOrReplaceTempView(f"kb_pref_{i + 1}")
        spark.sql(
            _KB_COMPOSE_SUF.format(src=f"kb_suf_{i}", step=step)
        ).localCheckpoint().createOrReplaceTempView(f"kb_suf_{i + 1}")
    spark.sql("SELECT * FROM kb_pref_5").createOrReplaceTempView("kb_pref")
    spark.sql("SELECT * FROM kb_suf_5").createOrReplaceTempView("kb_suf")
    return spark.sql(_KB_FINAL)


# --- exponential smoothing forecast (dyadic-exact EWMA) -------------------------
#
# Simple exponential smoothing with alpha = 1/2 over each event type's
# zero-densified January calendar: s_1 = c_1, s_d = (c_d + s_{d-1})/2.
# The halving recurrence is cleared by the scaled state
# S_d = s_d * 2^(d-1), which is a pure PREFIX SUM of integer terms:
#     S_d = c_1 + SUM_{u=2..d} c_u * 2^(u-2)
# so the whole recurrence is one window SUM over exact int64 carriers
# (c < 2^23 keeps S < 2^53, so the final CAST to DOUBLE and the
# division by a power of two are both EXACT — the forecast column is a
# bit-reproducible dyadic rational, no ROUND grain needed; at crawl
# scale c ~ 1e9/day the same plan runs with the ROUND(6) grain).  The
# one-step-ahead residual c_31 - s_30 is dyadic-exact the same way.
#
# Scale shape: one groupBy (event_type, day) — vocabulary-bounded —
# then a 31-row window per key; cost linear in keys, flat in fact rows.

_EWMA_BODY = """
daily AS (
  SELECT event_type, CAST(day(ts) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE month(ts) = 1
  GROUP BY 1, 2
),
types AS (SELECT DISTINCT event_type FROM daily),
dense AS (
  SELECT t.event_type, days.dd AS d,
         COALESCE(daily.c, CAST(0 AS BIGINT)) AS c
  FROM types t CROSS JOIN days
  LEFT JOIN daily ON daily.event_type = t.event_type AND daily.d = days.dd
),
weighted AS (
  SELECT event_type, d, c,
         c * CAST(CASE WHEN d = 1 THEN 1.0
                       ELSE POWER(2.0, CAST(d - 2 AS DOUBLE)) END AS BIGINT)
           AS term
  FROM dense
),
scaled AS (
  SELECT event_type, d, c,
         CAST(SUM(term) OVER (PARTITION BY event_type ORDER BY d) AS BIGINT)
           AS s_scaled
  FROM weighted
)
SELECT s31.event_type,
       CAST(SUM(dense.c) AS BIGINT) AS total,
       s31.s_scaled AS s31_scaled,
       CAST(s31.s_scaled AS DOUBLE) / 1073741824.0 AS ewma_forecast,
       CAST(s31.c31 AS DOUBLE)
         - CAST(s30.s_scaled AS DOUBLE) / 536870912.0 AS last_step_error
FROM (SELECT event_type, c AS c31, s_scaled FROM scaled WHERE d = 31) s31
JOIN (SELECT event_type, s_scaled FROM scaled WHERE d = 30) s30
  ON s30.event_type = s31.event_type
JOIN dense ON dense.event_type = s31.event_type
GROUP BY 1, 3, 4, 5
"""

_EWMA_SPARK = f"WITH {_DAYS_SPARK},\n{_EWMA_BODY.strip()}"
_EWMA_ORACLE = f"WITH {_DAYS_DUCK},\n{_EWMA_BODY.strip()}"


@register("ewma_volume_forecast", _EWMA_ORACLE)
def ewma_volume_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alpha=1/2 exponential-smoothing forecast of each event type's
    daily volume — the halving recurrence cleared to a single exact
    int64 prefix sum (S_d = s_d*2^(d-1)), forecast and one-step
    residual emitted as exact dyadic doubles."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_EWMA_SPARK)


# --- banded matrix profile (z-normalized motif discovery) ----------------------
#
# The matrix-profile motif primitive (Yeh et al., "Matrix Profile I",
# ICDM 2016) restricted to a time BAND: for every length-4 window of
# the hourly volume series, the nearest z-normalized neighbor among
# windows 4..48 hours later (exclusion zone = window length, so no
# self-overlap trivial matches).  The full profile is O(n²); banding
# makes it O(n·L) — the standard scale concession, and the right one
# for volume telemetry where a motif 6 months away is not actionable.
#
# Shared-SQL discipline: z-normalized distance is derived from the
# Pearson correlation identity d² = 2m(1−r), with r computed from
# EXACT int64 carriers — P = m·Σab − Σa·Σb, V = m·Σa² − (Σa)² — so r
# (int ÷ sqrt of int-product, all IEEE-correctly-rounded ops) is
# bit-identical across engines, and the argmax ranking (ORDER BY r
# DESC, i, j) is fully deterministic.  Constant windows (V = 0, z-norm
# undefined) are excluded on both sides, the standard convention.
#
# Scale shape: the band join is an equi-join on event_type with a
# bounded range predicate (≤45 candidates per window) over a
# calendar-bounded dense frame (|types| × 744 rows) — cost is linear
# in types regardless of fact volume; the only fact-sized work is the
# initial (type, hour) count shuffle.

_HRS_SPARK = (
    "hrs AS (SELECT CAST(x AS BIGINT) AS hh"
    " FROM (SELECT explode(sequence(0, 743)) AS x))"
)
_HRS_DUCK = (
    "hrs AS (SELECT CAST(UNNEST(generate_series(0, 743)) AS BIGINT) AS hh)"
)

_MP_BODY = """
hourly AS (
  SELECT event_type,
         CAST((day(ts) - 1) * 24 + hour(ts) AS BIGINT) AS h,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE month(ts) = 1
  GROUP BY 1, 2
),
types AS (SELECT DISTINCT event_type FROM hourly),
dense AS (
  SELECT t.event_type, hrs.hh AS h,
         COALESCE(hourly.c, CAST(0 AS BIGINT)) AS c
  FROM types t CROSS JOIN hrs
  LEFT JOIN hourly ON hourly.event_type = t.event_type AND hourly.h = hrs.hh
),
win AS (
  SELECT event_type, h, c AS c0,
         LEAD(c, 1) OVER (PARTITION BY event_type ORDER BY h) AS c1,
         LEAD(c, 2) OVER (PARTITION BY event_type ORDER BY h) AS c2,
         LEAD(c, 3) OVER (PARTITION BY event_type ORDER BY h) AS c3
  FROM dense
),
feat AS (
  SELECT event_type, h,
         c0 + c1 + c2 + c3 AS s,
         c0 * c0 + c1 * c1 + c2 * c2 + c3 * c3 AS q,
         c0, c1, c2, c3
  FROM win WHERE c3 IS NOT NULL
),
pairs AS (
  SELECT a.event_type, a.h AS i, b.h AS j,
         4 * (a.c0 * b.c0 + a.c1 * b.c1 + a.c2 * b.c2 + a.c3 * b.c3)
           - a.s * b.s AS p,
         4 * a.q - a.s * a.s AS va,
         4 * b.q - b.s * b.s AS vb
  FROM feat a
  JOIN feat b ON b.event_type = a.event_type
             AND b.h >= a.h + 4 AND b.h <= a.h + 48
  WHERE 4 * a.q - a.s * a.s > 0 AND 4 * b.q - b.s * b.s > 0
),
scored AS (
  SELECT event_type, i, j,
         CAST(p AS DOUBLE)
           / SQRT(CAST(va AS DOUBLE) * CAST(vb AS DOUBLE)) AS r
  FROM pairs
),
ranked AS (
  SELECT event_type, i, j, r,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY r DESC, i, j) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
  FROM scored
)
SELECT event_type, i AS motif_i, j AS motif_j,
       ROUND(SQRT(GREATEST(0.0, 8.0 * (1.0 - r))), 9) AS znorm_dist,
       ROUND(r, 9) AS pearson_r,
       CAST(n_pairs AS BIGINT) AS n_pairs
FROM ranked WHERE rn = 1
"""

_MP_SPARK = f"WITH {_HRS_SPARK},\n{_MP_BODY.strip()}"
_MP_ORACLE = f"WITH {_HRS_DUCK},\n{_MP_BODY.strip()}"


@register("matrix_profile_motif_volume", _MP_ORACLE)
def matrix_profile_motif_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded z-normalized matrix profile over hourly volumes: the
    single best repeated 4-hour motif per event type among windows
    4-48 h apart (d² = 2m(1−r) with r from exact-int64 carriers —
    bit-identical ranking across engines)."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_MP_SPARK)
