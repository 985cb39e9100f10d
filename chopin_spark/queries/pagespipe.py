"""The north-star sentence as ONE oracle-checked query: "web pages
geocoded from URL are assigned to S2 cells … re-expressed as explicit
DataFrame partitioning" (BASELINE.json north_star).

Pages are synthesized from `orders` keys with the synth_pages URL
recipe (chopin_spark.pages), geocoded *from the URL string itself*
(polynomial char fold of the host → deterministic lon/lat — the
stand-in for a real geocoder, as pages.py documents), assigned to real
S2 level-8 cells with the pure-SQL Hilbert chain, and rolled up per
level-4 parent.  Every stage — URL build, host extraction, geocode
hash, trig, cell id — is the same SQL text in Spark and DuckDB, so the
driver's value hash pins the whole pipeline bit-for-bit.

Scale shape: scan → projection chain (codegen) → one partial+final
aggregation on the Hilbert-coherent parent key.  No joins, no Python,
nothing that changes at 10^12 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from chopin_spark.pages import CCTLDS
from chopin_spark.queries import register
from chopin_spark.s2sql import s2_prefix_sql
from chopin_spark.tables import load
from chopin_spark.textops import charfold_duckdb, charfold_spark

_CCTLD = (
    "CASE (o_orderkey * 2654435761) % " + str(len(CCTLDS))
    + "".join(f" WHEN {i} THEN '{c}'" for i, c in enumerate(CCTLDS))
    + " END"
)
_HOST = (
    f"('h' || CAST((o_orderkey * 69069) % 99991 AS STRING)"
    f" || '.example.' || {_CCTLD})"
)


def _base(fold: str) -> str:
    """Geocode from the URL's host string: char-fold hash → two LCG
    draws → lon/lat in the CONUS window (face 4 interior)."""
    h = f"({fold})"
    return f"""(
  SELECT o_orderkey AS page_id,
         (-125.0 + 58.0 * (CAST(({h} * 2654435761) % 999983 AS DOUBLE) / 999983.0)) AS lon,
         (25.0 + 16.0 * (CAST(({h} * 1103515245 + 12345) % 999983 AS DOUBLE) / 999983.0)) AS lat
  FROM (SELECT o_orderkey, {_HOST} AS host FROM orders)
)"""


def _rollup(base: str) -> str:
    return f"""
SELECT (s2_prefix >> 8) AS s2_cell4,
       COUNT(*) AS n_pages,
       COUNT(DISTINCT s2_prefix) AS n_cells8,
       MIN(page_id) AS first_page
FROM ({s2_prefix_sql(base, 'lon', 'lat', 8)})
GROUP BY 1
"""


_ORACLE = _rollup(_base(charfold_duckdb("host")))


@register("pages_geocode_s2_rollup", _ORACLE)
def pages_geocode_s2_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL → host → geocode-by-hash → real S2 cell → hierarchical
    rollup, entirely in whole-stage-codegen SQL (the Spark text differs
    from the oracle only in the char-fold HOF spelling)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_rollup(_base(charfold_spark("host"))))
