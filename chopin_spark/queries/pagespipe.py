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
from pyspark.sql import functions as F

from chopin_spark import zones as Z
from chopin_spark.pages import host_sql, lonlat_sql
from chopin_spark.queries import register
from chopin_spark.s2sql import s2_prefix_sql
from chopin_spark.tables import load
from chopin_spark.textops import charfold_duckdb, charfold_spark

# SHARED URL-recipe builders (pages.py) keyed on the orders row id
_HOST = host_sql("o_orderkey")


def _base(fold: str) -> str:
    """Geocode from the URL's host string: char-fold hash → two LCG
    draws → lon/lat in the CONUS window (face 4 interior) — the shared
    pages.lonlat_sql recipe."""
    lon, lat = lonlat_sql(fold)
    return f"""(
  SELECT o_orderkey AS page_id,
         {lon} AS lon,
         {lat} AS lat
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


# --- the north star's other three verbs over the SAME pages table ----------
#
# north_star: "… then chopin's workflows are re-expressed as …
# per-partition point-in-polygon, kNN, and zonal-stat (raster↔vector
# extract) operators …".  pages_geocode_s2_rollup covers the
# geocode→S2 leg; the three queries below run PIP (C6), kNN (§2.5) and
# extract_at (C1) over the same URL-geocoded pages, projected from
# lon/lat into the engine's planar CRS (the EXTENT window) by the same
# affine both engines evaluate on identical IEEE doubles.


def _planar(fold: str) -> str:
    """Geocoded pages in planar EXTENT coords: lon/lat (from `_base`)
    → affine CRS transform into (0,0)-(800000,600000).  Nested
    subqueries, not lateral aliases (linear bind in DuckDB)."""
    lon, lat = lonlat_sql(fold)
    return f"""(
  SELECT page_id, host,
         ((lon - -125.0) / 58.0) * 800000.0 AS x,
         ((lat - 25.0) / 16.0) * 600000.0 AS y
  FROM (
    SELECT page_id, host,
           {lon} AS lon,
           {lat} AS lat
    FROM (SELECT o_orderkey AS page_id, {_HOST} AS host FROM orders)
  )
)"""


def _pip_sql(fold: str) -> str:
    """C6 summarize_pp over pages: arithmetic PIP into admin tracts,
    pages + distinct hosts + LCG tract population per zone."""
    return f"""
SELECT {Z.zone_id_expr('x', 'y')} AS zone_id,
       COUNT(*) AS n_pages,
       COUNT(DISTINCT host) AS n_hosts,
       {Z.pop_expr(Z.zidx_expr('x', 'y'))} AS pop
FROM {_planar(fold)}
GROUP BY 1, 4
"""


@register("pages_pip_zone_rollup", _pip_sql(charfold_duckdb("host")))
def pages_pip_zone_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-polygon leg of the north star on the pages table
    (chopin summarize_pp, /root/reference/R/summaries.R): geocoded
    pages → planar CRS → tract PIP → pages/hosts/pop per zone.  Pure
    codegen'd column math + one partial+final aggregation — the
    crawl-analysis shape ("pages and hosts per admin area") that holds
    at 10^12 rows."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_pip_sql(charfold_spark("host")))


_KNN_K = 3
_KNN_RADIUS = 20_000.0
_PAGE_MOD = 10  # fact-side subsample keeps the DuckDB brute force sane

_PAGES_KNN_ORACLE = f"""
WITH pg AS (
  SELECT page_id, x, y FROM {_planar(charfold_duckdb('host'))}
  WHERE page_id % {_PAGE_MOD} = 0
),
p AS (
  SELECT p_partkey AS pid, {{PX}} AS px, {{PY}} AS py FROM part
),
r AS (
  SELECT page_id, pid,
         SQRT((x - px) * (x - px) + (y - py) * (y - py)) AS dist,
         ROW_NUMBER() OVER (
           PARTITION BY page_id
           ORDER BY SQRT((x - px) * (x - px) + (y - py) * (y - py)), pid
         ) AS rn
  FROM pg CROSS JOIN p
)
SELECT page_id, CAST(rn AS INT) AS rank, pid AS nn_pid,
       ROUND(dist, 4) AS nn_dist
FROM r WHERE rn <= {_KNN_K}
"""


def _pages_knn_oracle() -> str:
    from chopin_spark import sqlexpr as sx

    return _PAGES_KNN_ORACLE.format(
        PX=sx.x_expr("p_partkey"), PY=sx.y_expr("p_partkey")
    )


@register("pages_knn3_poi", _pages_knn_oracle())
def pages_knn3_poi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN leg of the north star on the pages table (chopin par_grid +
    terra::nearest, /root/reference/README.md:1065-1118): geocoded
    pages → exact 3-NN POIs via the cell-index candidate join with
    exact fallback (vector.knn_join) — never the O(n·m) cross join the
    oracle brute-forces."""
    from chopin_spark import sqlexpr as sx
    from chopin_spark.grid import make_regular_grid
    from chopin_spark.vector import knn_join

    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    # localCheckpoint: the geocode char-fold is an interpreted HOF —
    # without the cut it re-evaluates once per reference across the
    # 3×3 candidate stencil and both fallback branches (measured ~3×
    # on this query); the materialized side is only the subsampled
    # (page_id, x, y) points
    pages = spark.sql(
        f"SELECT page_id, x, y FROM {_planar(charfold_spark('host'))} "
        f"WHERE page_id % {_PAGE_MOD} = 0"
    ).localCheckpoint()
    pois = load(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("pid"),
        F.expr(sx.x_expr("p_partkey")).alias("x"),
        F.expr(sx.y_expr("p_partkey")).alias("y"),
    )
    g = make_regular_grid(16, 12, pad=_KNN_RADIUS)
    out = knn_join(
        pages, pois, g, "page_id", "pid", _KNN_RADIUS, k=_KNN_K,
        small_context=True,
    )
    return out.select(
        "page_id",
        F.col("rank").cast("int").alias("rank"),
        F.col("nn_id").alias("nn_pid"),
        F.round("nn_dist", 4).alias("nn_dist"),
    )


# --- zonal-stat leg: extract_at over page-point buffers ---------------------

_ZR = 20_000.0  # buffer radius (same knob as extract_at_buffers)
_Z_MOD = 30  # subsample: every 30th page gets a buffer


def _pages_zonal_oracle() -> str:
    from chopin_spark.raster import NPX, NPY, PH, PW, V_MOD, V_MX, V_MY

    pcx = f"((i + 0.5) * {PW!r})"
    pcy = f"((j + 0.5) * {PH!r})"
    return f"""
WITH pg AS (
  SELECT page_id, x, y FROM {_planar(charfold_duckdb('host'))}
  WHERE page_id % {_Z_MOD} = 0
),
ii AS (
  SELECT page_id, x, y,
         UNNEST(generate_series(
           GREATEST(0, CAST(FLOOR((x - {_ZR!r}) / {PW!r}) AS BIGINT) - 1),
           LEAST({NPX - 1}, CAST(FLOOR((x + {_ZR!r}) / {PW!r}) AS BIGINT) + 1)
         )) AS i
  FROM pg
),
jj AS (
  SELECT page_id, x, y, i,
         UNNEST(generate_series(
           GREATEST(0, CAST(FLOOR((y - {_ZR!r}) / {PH!r}) AS BIGINT) - 1),
           LEAST({NPY - 1}, CAST(FLOOR((y + {_ZR!r}) / {PH!r}) AS BIGINT) + 1)
         )) AS j
  FROM ii
),
hit AS (
  SELECT page_id, ((i * {V_MX} + j * {V_MY}) % {V_MOD}) AS val
  FROM jj
  WHERE {pcx} >= x - {_ZR!r} AND {pcx} < x + {_ZR!r}
    AND {pcy} >= y - {_ZR!r} AND {pcy} < y + {_ZR!r}
)
SELECT CAST(page_id AS STRING) AS pid,
       ROUND(CAST(SUM(val) AS DOUBLE) / COUNT(*), 4) AS mean_val,
       COUNT(*) AS n_pixels
FROM hit GROUP BY 1
"""


@register("pages_extract_buffers", _pages_zonal_oracle())
def pages_extract_buffers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zonal-stat leg of the north star on the pages table (chopin
    extract_at point branch, /root/reference/R/processing.R:184-228):
    geocoded pages buffered by 20 km, raster mean per page via the
    tile join-agg engine path (partial integer sums per (tile, rect),
    broadcast-vs-shuffle switch) — the oracle enumerates pixels."""
    from chopin_spark.queries.zonal import _tiles
    from chopin_spark.raster import extract_at

    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    rects = spark.sql(
        f"SELECT CAST(page_id AS STRING) AS pid, "
        f"x - {_ZR!r} AS xmin, y - {_ZR!r} AS ymin, "
        f"x + {_ZR!r} AS xmax, y + {_ZR!r} AS ymax "
        f"FROM {_planar(charfold_spark('host'))} "
        f"WHERE page_id % {_Z_MOD} = 0"
    )
    tiles = _tiles(spark, n_rasters=1)
    return extract_at(tiles, rects, rect_id="pid").select(
        "pid", "mean_val", "n_pixels"
    )


# --- leakage-safe train/val/test split --------------------------------------


def _split_sql(fold: str) -> str:
    """Deterministic 80/10/10 split keyed on the HOST hash, so every
    page of a host lands in one split (group-aware splitting — the
    train/test-leakage guard a web-corpus pipeline needs)."""
    return f"""
SELECT CASE WHEN b < 800 THEN 'train' WHEN b < 900 THEN 'val' ELSE 'test' END AS split,
       COUNT(*) AS n_pages,
       COUNT(DISTINCT host) AS n_hosts,
       MIN(page_id) AS first_page
FROM (
  SELECT page_id, host, (({fold}) * 2654435761) % 1000 AS b
  FROM (SELECT o_orderkey AS page_id, {_HOST} AS host FROM orders)
)
GROUP BY 1
"""


@register("pages_split_leakage_safe", _split_sql(charfold_duckdb("host")))
def pages_split_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-aware dataset split: hash the host (not the page), bucket
    into 80/10/10.  Pure column math — stable under resharding and
    appends, no shuffle before the final rollup; at 10^12 rows the
    split column is computed at scan time and partition-prunable."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_split_sql(charfold_spark("host")))


# --- toponym gazetteer geocoding from TEXT (the north star's other
# geocode leg: "web pages geocoded from URL/text") ----------------------------
#
# Classic gazetteer resolution (GeoNames-style): mention extraction
# (tokens matching a gazetteer of place names), per-mention sense
# DISAMBIGUATION (a language-match prior beats raw population — the
# standard country-bias heuristic), population-weighted doc centroid,
# then the same real-S2 cell assignment + hierarchical rollup as the
# URL leg.  The gazetteer is synthesized deterministically from the
# corpus vocabulary (names = tokens with >= _TOPO_MIN_C occurrences;
# each name carries TWO candidate senses with hash-derived lon/lat,
# population, and language), so both engines build it from the same
# scan — no external data.
#
# Exactness: coordinates are quantized to int64 micro-degrees the
# moment they exist; the weighted centroid is a ratio of exact int64
# sums (m*pop*lon_u <= ~2^60 at sf1) evaluated as two correctly-rounded
# double divisions — deterministic cross-engine.  Disambiguation
# orders by (lang_match, pop, sense) — all integers.
#
# Scale shape (100 TB): vocabulary-bounded gazetteer (broadcast-sized)
# equi-joined to the exploded token stream — the shuffle carries
# mention rows, not text; centroid + S2 chain are pure column math;
# the rollup is one partial+final agg on the Hilbert-coherent parent.

_TOPO_MIN_C = 40
_TOPO_LANGS = ("de", "en", "es", "fr", "zh")  # fixture lang domain


def _topo_sql(unnest_src: str, fold: str) -> str:
    sense_lang = "CASE (f * (s + 2)) % 5" + "".join(
        f" WHEN {i} THEN '{la}'" for i, la in enumerate(_TOPO_LANGS)
    ) + " END"
    # pre-reduce the sense fold so lonlat's 2654435761 multiplier stays
    # inside int64 (f < 2^30, and lonlat multiplies by ~2^31)
    lon, lat = lonlat_sql("((f * 7 + s * 31) % 999983)")
    return f"""
WITH tok AS ({unnest_src}),
vocab AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS c FROM tok GROUP BY 1
),
gaznames AS (
  SELECT t, c, {fold} AS f FROM vocab WHERE c >= {_TOPO_MIN_C}
),
gaz AS (
  SELECT t, c, f, s,
         ((f * (s * 2 + 3) + 17) % 99991) + c AS pop,
         {sense_lang} AS sense_lang,
         CAST(FLOOR(({lon}) * 1000000.0 + 0.5) AS BIGINT) AS lon_u,
         CAST(FLOOR(({lat}) * 1000000.0 + 0.5) AS BIGINT) AS lat_u
  FROM gaznames CROSS JOIN senses
),
mentions AS (
  SELECT d.doc_id, d.lang, tok.t, CAST(COUNT(*) AS BIGINT) AS m
  FROM tok
  JOIN documents d ON d.doc_id = tok.doc_id
  JOIN gaznames g ON g.t = tok.t
  GROUP BY 1, 2, 3
),
best_sense AS (
  SELECT mn.doc_id, mn.m, gz.pop, gz.lon_u, gz.lat_u,
         ROW_NUMBER() OVER (
           PARTITION BY mn.doc_id, mn.t
           ORDER BY CASE WHEN gz.sense_lang = mn.lang THEN 1 ELSE 0 END
                      DESC,
                    gz.pop DESC, gz.s ASC
         ) AS rk
  FROM mentions mn JOIN gaz gz ON gz.t = mn.t
)
SELECT doc_id,
       CAST(CAST(lx AS DOUBLE) / wsum / 1000000.0 AS DOUBLE) AS lon,
       CAST(CAST(ly AS DOUBLE) / wsum / 1000000.0 AS DOUBLE) AS lat,
       n_mentions
FROM (
  SELECT doc_id,
         CAST(SUM(m * pop) AS BIGINT) AS wsum,
         CAST(SUM(m * pop * lon_u) AS BIGINT) AS lx,
         CAST(SUM(m * pop * lat_u) AS BIGINT) AS ly,
         CAST(SUM(m) AS BIGINT) AS n_mentions
  FROM best_sense WHERE rk = 1
  GROUP BY 1
) q
"""


# the S2-chain rollup over the centroid stage — Spark runs it as a
# SECOND statement over a temp view (the combined text trips the
# analyzer's 100-iteration resolution cap: 8 Hilbert levels of nested
# projections x the gazetteer CTE stack); DuckDB inlines the same two
# stages as one text
_TOPO_ROLLUP = f"""
SELECT (s2_prefix >> 8) AS s2_cell4,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_mentions) AS BIGINT) AS n_mentions,
       CAST(MIN(doc_id) AS BIGINT) AS first_doc
FROM ({s2_prefix_sql('topo_base', 'lon', 'lat', 8)})
GROUP BY 1
"""


_TOPO_SENSES_SPARK = (
    "senses AS (SELECT CAST(x AS BIGINT) AS s"
    " FROM (SELECT explode(sequence(0, 1)) AS x))"
)
_TOPO_SENSES_DUCK = (
    "senses AS (SELECT CAST(UNNEST(generate_series(0, 1)) AS BIGINT) AS s)"
)

_TOPO_SPARK = _topo_sql(
    "SELECT doc_id, explode(split(text, ' ')) AS t FROM documents",
    charfold_spark("t"),
).replace("WITH tok", f"WITH {_TOPO_SENSES_SPARK},\ntok", 1)

_TOPO_ORACLE = _TOPO_ROLLUP.replace(
    "topo_base",
    "("
    + _topo_sql(
        "SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents",
        charfold_duckdb("t"),
    ).replace("WITH tok", f"WITH {_TOPO_SENSES_DUCK},\ntok", 1)
    + ")",
    1,
)


@register("toponym_gazetteer_geocode", _TOPO_ORACLE)
def toponym_gazetteer_geocode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Text-mention gazetteer geocoding: corpus-derived gazetteer,
    language-prior sense disambiguation, int64-exact population-
    weighted centroids, real-S2 cell rollup — the 'geocoded from
    text' leg of the north star beside pages_geocode_s2_rollup."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    spark.sql(_TOPO_SPARK).createOrReplaceTempView("topo_base")
    return spark.sql(_TOPO_ROLLUP)
