"""Jenks natural breaks — Fisher's exact optimal 1-D classification
(Fisher 1958; Jenks 1967), THE choropleth class-break verb every
cartographic stack ships (classInt::classIntervals(style="fisher"),
QGIS "natural breaks", ArcGIS default).  chopin users classify zonal
summaries for mapping right after extract_at / summarize_aw
(/root/reference/R/scale_process.R zonal outputs); this closes that
last mile.

Exact DP, not the k-means heuristic: D_c[j] = min_a D_{c-1}[a-1] +
ssd(a, j) over the SORTED per-zone values, ssd from prefix sums
(Σv², Σv exact int64; the single division per candidate is a fixed
double tree — bit-identical across engines).  Classes are contiguous
runs of the sorted order, argmin ties break at the smallest split, so
the break set is fully deterministic.

Execution: c = 2..K rounds materialize (DuckDB MATERIALIZED CTEs /
Spark checkpointed views — the repo's unrolled-fixpoint seam); each
round is an (a ≤ j) pair join over n zone values.

Scale shape: the DP is O(K·n²) on the ZONE AGGREGATE (n = number of
zones — map classes are inherently few-hundred-feature-sized), never
on facts; the only fact-scale work is the zonal SUM.  For n beyond
~10⁵ the published scale path is DP over quantile-binned values
(identical SQL on the binned frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from chopin_spark import zones as Z
from chopin_spark.queries import register
from chopin_spark.queries.polygons import _X, _Y
from chopin_spark.tables import load

_JK_K = 5

_JK_VALS = f"""
  SELECT {Z.zone_id_expr(_X, _Y)} AS zone_id,
         CAST(SUM(n_chars) AS BIGINT) AS v
  FROM documents GROUP BY 1
"""

_JK_PRE = """
  SELECT v, zone_id,
         ROW_NUMBER() OVER (ORDER BY v, zone_id) AS i,
         SUM(v) OVER (ORDER BY v, zone_id) AS s1,
         SUM(v * v) OVER (ORDER BY v, zone_id) AS s2,
         COUNT(*) OVER () AS n
  FROM jk_vals
"""

# ssd(a, j) for 1 <= a <= j: prefix rows pj (at j) and pa (at a-1, or
# zeros when a = 1), cost = (s2_j - s2_a) - (s1_j - s1_a)^2 / (j-a+1)
_JK_COST = """
  SELECT pa.a, pj.i AS j,
         (CAST(pj.s2 - pa.s2p AS DOUBLE)
          - CAST(pj.s1 - pa.s1p AS DOUBLE)
            * CAST(pj.s1 - pa.s1p AS DOUBLE)
            / CAST(pj.i - pa.a + 1 AS DOUBLE)) AS cost
  FROM (SELECT i + 1 AS a, s1 AS s1p, s2 AS s2p FROM jk_pre
        UNION ALL
        SELECT 1, CAST(0 AS BIGINT), CAST(0 AS BIGINT)) pa
  JOIN jk_pre pj ON pj.i >= pa.a
"""

_JK_D1 = """
  SELECT j, cost AS d, CAST(1 AS BIGINT) AS bp
  FROM jk_cost WHERE a = 1
"""


def _jk_round(c: int) -> str:
    """D_c[j] = min over splits a (class c = values a..j)."""
    return f"""
  SELECT j, d, bp FROM (
    SELECT co.j, pd.d + co.cost AS d, co.a AS bp,
           ROW_NUMBER() OVER (PARTITION BY co.j
                              ORDER BY pd.d + co.cost, co.a) AS rn
    FROM jk_cost co JOIN jk_d{c - 1} pd ON pd.j = co.a - 1
    WHERE co.a >= {c}
  ) t WHERE rn = 1
"""


# backwalk: class K ends at n with start bp_K[n]; class c ends at
# start_{c+1} - 1.  K chained scalar joins over the tiny D tables.
_JK_FINAL = f"""
WITH nrow AS (SELECT MAX(j) AS n FROM jk_d1),
b5 AS (SELECT d5.j AS e, d5.bp AS s, d5.d AS dtot
       FROM jk_d{_JK_K} d5 JOIN nrow ON d5.j = nrow.n),
b4 AS (SELECT d.j AS e, d.bp AS s FROM jk_d4 d JOIN b5 ON d.j = b5.s - 1),
b3 AS (SELECT d.j AS e, d.bp AS s FROM jk_d3 d JOIN b4 ON d.j = b4.s - 1),
b2 AS (SELECT d.j AS e, d.bp AS s FROM jk_d2 d JOIN b3 ON d.j = b3.s - 1),
b1 AS (SELECT d.j AS e, d.bp AS s FROM jk_d1 d JOIN b2 ON d.j = b2.s - 1),
cls AS (
  SELECT 1 AS class, s, e FROM b1 UNION ALL
  SELECT 2, s, e FROM b2 UNION ALL
  SELECT 3, s, e FROM b3 UNION ALL
  SELECT 4, s, e FROM b4 UNION ALL
  SELECT 5, s, e FROM b5
),
tot AS (
  SELECT (CAST(MAX(s2) AS DOUBLE)
          - CAST(MAX(s1) AS DOUBLE) * CAST(MAX(s1) AS DOUBLE)
            / CAST(MAX(i) AS DOUBLE)) AS ssd_all
  FROM jk_pre
)
SELECT c.class,
       MIN(p.v) AS lo_value, MAX(p.v) AS hi_value,
       CAST(COUNT(*) AS BIGINT) AS n_zones,
       ROUND(1.0 - b5.dtot / tot.ssd_all, 9) AS gvf
FROM cls c
JOIN jk_pre p ON p.i >= c.s AND p.i <= c.e
CROSS JOIN b5 CROSS JOIN tot
GROUP BY c.class, b5.dtot, tot.ssd_all
ORDER BY c.class
"""


def _jk_oracle() -> str:
    ctes = [
        f"jk_vals AS MATERIALIZED ({_JK_VALS})",
        f"jk_pre AS MATERIALIZED ({_JK_PRE})",
        f"jk_cost AS MATERIALIZED ({_JK_COST})",
        f"jk_d1 AS MATERIALIZED ({_JK_D1})",
    ]
    for c in range(2, _JK_K + 1):
        ctes.append(f"jk_d{c} AS MATERIALIZED ({_jk_round(c)})")
    body = _JK_FINAL.strip()
    assert body.startswith("WITH ")
    return "WITH " + ",\n".join(ctes) + ",\n" + body[len("WITH "):]


@register("jenks_breaks_zone_chars", _jk_oracle())
def jenks_breaks_zone_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jenks/Fisher natural breaks (K=5) over per-zone character
    mass: per-class value range, membership count, and the map-wide
    goodness-of-variance fit."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    spark.sql(_JK_VALS).localCheckpoint().createOrReplaceTempView("jk_vals")
    spark.sql(_JK_PRE).localCheckpoint().createOrReplaceTempView("jk_pre")
    spark.sql(_JK_COST).localCheckpoint().createOrReplaceTempView("jk_cost")
    spark.sql(_JK_D1).localCheckpoint().createOrReplaceTempView("jk_d1")
    for c in range(2, _JK_K + 1):
        spark.sql(_jk_round(c)).localCheckpoint(
        ).createOrReplaceTempView(f"jk_d{c}")
    return spark.sql(_JK_FINAL)
