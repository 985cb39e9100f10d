"""Privacy operators — the release side of the pipeline that
pii_scrub_stats (textops) opens: a k-anonymity audit of a
quasi-identifier projection, and a differential-privacy noisy-count
release with discrete-Laplace noise.

A 100-TB corpus engine that exports ANY aggregate to an external party
needs these two verbs: "is this projection safe to release row-level?"
(k-anonymity, Sweeney 2002) and "release counts with a privacy
budget" (ε-DP, Dwork et al.; the discrete/geometric mechanism of
Ghosh–Roughgarden–Sundararajan, which is the exactly-sampleable integer
form).

Determinism discipline: the DP mechanism's noise is seeded by an LCG
of the release key — two-sided-geometric noise materializes as the
DIFFERENCE OF TWO GEOMETRICS, each FLOOR(LN(u)/LN(α)) with u a
rational LCG draw — so both engines derive the identical integer noise
and the oracle checks the released values bit-for-bit.  (A production
deployment would swap the LCG for a CSPRNG seeded per release; the
MECHANISM — inverse-CDF geometric sampling, ε accounting, the
post-processing max(0,·) — is exactly what ships.)

Scale shape: both are single hash aggregations over the fact (the
quasi-identifier groupBy and the release groupBy); the noise is pure
column math on the released (tiny) side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from chopin_spark import sqlexpr as sx
from chopin_spark.queries import register
from chopin_spark.tables import load

# --- k-anonymity audit ---------------------------------------------------------
#
# Quasi-identifier projection of the event stream: (event_type, day
# bucket, 8×6 location cell) — the classic "could an attacker single
# someone out" projection.  Reports, per equivalence-class size band,
# how many classes and rows sit there, plus the headline % of rows
# below k = 5 (the re-identifiable tail a release would have to
# suppress or generalize).

_KA_CELL = sx.grid_cell_expr(
    sx.x_expr("event_id"), sx.y_expr("event_id"), 8, 6
)

_KANON_SQL = f"""
WITH qi AS (
  SELECT event_type, CAST(day(ts) AS BIGINT) AS d, {_KA_CELL} AS cell,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM events WHERE month(ts) = 1
  GROUP BY 1, 2, 3
),
tot AS (SELECT CAST(SUM(k) AS BIGINT) AS n FROM qi)
SELECT CASE WHEN k = 1 THEN 'k=1'
            WHEN k < 5 THEN 'k=2-4'
            WHEN k < 20 THEN 'k=5-19'
            ELSE 'k>=20' END AS k_band,
       CAST(COUNT(*) AS BIGINT) AS n_classes,
       CAST(SUM(k) AS BIGINT) AS n_rows,
       ROUND(CAST(SUM(k) AS DOUBLE) / MIN(tot.n), 6) AS row_share
FROM qi CROSS JOIN tot
GROUP BY 1
"""


@register("k_anonymity_audit", _KANON_SQL)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity of the (event_type, day, cell) quasi-identifier
    projection: equivalence-class size bands with class/row counts and
    row shares — the suppress-or-generalize worklist of a release."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_KANON_SQL)


# --- ε-DP noisy counts (discrete Laplace / geometric mechanism) ----------------
#
# Released statistic: events per (event_type, day-of-week).  Sensitivity
# 1 (one event moves one count); noise ~ two-sided geometric with
# α = exp(−ε), ε = 1, materialized as Geom(u1) − Geom(u2) where
# Geom(u) = FLOOR(LN(u)/LN(α)) — the exact inverse-CDF sampler.  The
# u draws are rational LCG values of the release key, identical in
# both engines; LN boundary collisions are ~1e-16 per draw.  The
# released value is post-processed to max(0, count + noise) (allowed:
# post-processing never spends budget).

_DP_EPS_ALPHA = 0.36787944117144233  # exp(-1), ε = 1
_DP_MOD = 2147483647


def _dp_u(key: str, mult: int) -> str:
    """Rational uniform in (0,1): ((key·mult + 12345) mod M + 1)/(M+1)."""
    return (
        f"(CAST((({key}) * {mult} + 12345) % {_DP_MOD} + 1 AS DOUBLE)"
        f" / {_DP_MOD + 1}.0)"
    )


_DP_KEY = (
    "(CAST({fold} AS BIGINT) * 7 + dow)".format(
        fold="ascii(substring(event_type, 1, 1)) * 31"
        " + ascii(substring(event_type, 2, 1))"
    )
)

_DP_SQL = f"""
WITH rel AS (
  SELECT event_type, CAST(day(ts) AS BIGINT) % 7 AS dow,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE month(ts) = 1
  GROUP BY 1, 2
),
noise AS (
  SELECT event_type, dow, c,
         CAST(FLOOR(LN({_dp_u(_DP_KEY, 2654435761)}) / LN({_DP_EPS_ALPHA!r}))
              AS BIGINT)
         - CAST(FLOOR(LN({_dp_u(_DP_KEY, 1103515245)}) / LN({_DP_EPS_ALPHA!r}))
                AS BIGINT) AS z
  FROM rel
)
SELECT event_type, dow, z AS noise,
       GREATEST(CAST(0 AS BIGINT), c + z) AS released_count,
       CAST(1.0 AS DOUBLE) AS epsilon_spent
FROM noise
"""


@register("dp_noisy_counts_release", _DP_SQL)
def dp_noisy_counts_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε=1 differentially-private release of events per (type,
    day-of-week): geometric-mechanism integer noise from deterministic
    inverse-CDF draws, non-negative post-processing, ε accounting
    column.  True counts are NOT in the output."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_DP_SQL)
