"""Reprojection queries (chopin reproject_std parity — the step every
chopin workflow runs first, /root/reference/R/check.R:129-157).

Documents carry deterministic planar LCG coordinates; here they are
interpreted as lon/lat in a CONUS window and reprojected with the
closed-form spherical CRS layer (chopin_spark.crs).  The Albers path is
hash-exact across engines (sin/sqrt-only formulas); the Web Mercator
path reports km at ROUND(·,4), far above the measured ≤2-ulp libm
divergence.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark import sqlexpr as sx
from chopin_spark.crs import (
    ALBERS_CONUS, GeoFrame, albers_xy_sql, webmercator_xy_sql,
)
from chopin_spark.queries import register
from chopin_spark.tables import load

# documents' LCG planar coords → CONUS lon/lat window — the SAME
# strings as the S2 queries (imported, not re-declared: duplicated
# literals drift silently — pages.py rule)
from chopin_spark.queries.s2q import _LAT, _LON  # noqa: E402

_AX, _AY = albers_xy_sql(_LON, _LAT)

# regular grid over the projected window: corner-derived literal bounds
# (computed once in Python — identical constants in both engines),
# padded 1 km and snapped to whole km
_P = ALBERS_CONUS


def _fwd(lon: float, lat: float) -> tuple[float, float]:
    rho = _P.radius * math.sqrt(
        _P.big_c - 2.0 * _P.n * math.sin(math.radians(lat))
    ) / _P.n
    th = _P.n * math.radians(lon - _P.lon0)
    return rho * math.sin(th), _P.rho0 - rho * math.cos(th)


_CORNERS = [_fwd(lo, la) for lo in (-125.0, -67.0) for la in (24.0, 50.0)]
_X0 = math.floor(min(c[0] for c in _CORNERS) / 1000.0 - 1.0) * 1000.0
_X1 = math.ceil(max(c[0] for c in _CORNERS) / 1000.0 + 1.0) * 1000.0
_Y0 = math.floor(min(c[1] for c in _CORNERS) / 1000.0 - 1.0) * 1000.0
_Y1 = math.ceil(max(c[1] for c in _CORNERS) / 1000.0 + 1.0) * 1000.0
_GNX, _GNY = 16, 12
_CW = (_X1 - _X0) / _GNX
_CH = (_Y1 - _Y0) / _GNY

_CELL = (
    f"(LEAST(GREATEST(CAST(FLOOR(({_AY} - {_Y0!r}) / {_CH!r}) AS BIGINT),"
    f" 0), {_GNY - 1}) * {_GNX}"
    f" + LEAST(GREATEST(CAST(FLOOR(({_AX} - {_X0!r}) / {_CW!r}) AS BIGINT),"
    f" 0), {_GNX - 1}))"
)

_ALBERS_ORACLE = f"""
SELECT {_CELL} AS cgridid,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       ROUND(AVG({_AX}) / 1000.0, 4) AS mean_x_km
FROM documents
GROUP BY 1
"""


@register("reproject_albers_grid", _ALBERS_ORACLE)
def reproject_albers_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """reproject_std → grid → aggregate, the canonical chopin opening
    move: lon/lat docs projected to spherical Albers (EPSG:5070
    parameters), assigned to a 16×12 grid in projected meters, counted.
    Hash-exact across engines (sin/sqrt-only projection)."""
    docs = load(spark, sf_dir, "documents")
    gf = GeoFrame(
        docs.select(
            "doc_id", "n_chars",
            F.expr(_LON).alias("x"), F.expr(_LAT).alias("y"),
        ),
        crs="EPSG:4326",
    ).reproject_std("SPHERE:ALBERS_CONUS")
    ix = F.least(
        F.greatest(
            F.floor((F.col("x") - _X0) / _CW).cast("long"), F.lit(0)
        ),
        F.lit(_GNX - 1),
    )
    iy = F.least(
        F.greatest(
            F.floor((F.col("y") - _Y0) / _CH).cast("long"), F.lit(0)
        ),
        F.lit(_GNY - 1),
    )
    return (
        gf.df.withColumn("cgridid", iy * _GNX + ix)
        .groupBy("cgridid")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.round(F.avg("x") / 1000.0, 4).alias("mean_x_km"),
        )
    )


_MX, _MY = webmercator_xy_sql(_LON, _LAT)

_MERC_ORACLE = f"""
SELECT doc_id,
       ROUND({_MX} / 1000.0, 4) AS mx_km,
       ROUND({_MY} / 1000.0, 4) AS my_km
FROM documents
"""


@register("reproject_webmercator_coords", _MERC_ORACLE)
def reproject_webmercator_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Web Mercator coordinates (km, round4 — the ln-based
    y diverges by ≤2 ulp between JVM and C libm, ~2e-12 km, eleven
    orders of magnitude inside the rounding grid)."""
    docs = load(spark, sf_dir, "documents")
    gf = GeoFrame(
        docs.select(
            "doc_id", F.expr(_LON).alias("x"), F.expr(_LAT).alias("y")
        ),
        crs="EPSG:4326",
    ).reproject("SPHERE:WEBMERC")
    return gf.df.select(
        "doc_id",
        F.round(F.col("x") / 1000.0, 4).alias("mx_km"),
        F.round(F.col("y") / 1000.0, 4).alias("my_km"),
    )


# --- true EPSG:5070 (ellipsoidal Albers, GRS80) -----------------------------

from chopin_spark.crs import albers_ell_xy_sql  # noqa: E402

_EX, _EY = albers_ell_xy_sql(_LON, _LAT)

_ELL_ORACLE = f"""
SELECT doc_id,
       ROUND({_EX} / 1000.0, 4) AS ex_km,
       ROUND({_EY} / 1000.0, 4) AS ey_km
FROM documents
"""


@register("reproject_albers5070_coords", _ELL_ORACLE)
def reproject_albers5070_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TRUE EPSG:5070 coordinates (ellipsoidal Albers on
    GRS80, Snyder eqs. 14-1..14-21 — validated against Snyder's
    published Clarke-1866 worked example in tests/test_crs.py).
    Outputs in km at ROUND(·,4): q(φ) needs ln, whose ≤2-ulp
    JVM-vs-libm divergence cannot cross that rounding grain."""
    docs = load(spark, sf_dir, "documents")
    gf = GeoFrame(
        docs.select(
            "doc_id", F.expr(_LON).alias("x"), F.expr(_LAT).alias("y")
        ),
        crs="EPSG:4326",
    ).reproject_std("EPSG:5070")
    return gf.df.select(
        "doc_id",
        F.round(F.col("x") / 1000.0, 4).alias("ex_km"),
        F.round(F.col("y") / 1000.0, 4).alias("ey_km"),
    )


# --- true EPSG:3035 (ellipsoidal LAEA, GRS80) --------------------------------

from chopin_spark.crs import laea_ell_xy_sql  # noqa: E402

# remap the CONUS lon/lat window onto the EPSG:3035 domain (Europe,
# lon −10..30, lat 35..70) with driver-literal affine factors — the
# identical SQL text runs in both engines, so the remap is hash-safe
_LON_EU = f"((({_LON}) - -125.0) * {40.0 / 58.0!r} + -10.0)"
_LAT_EU = f"((({_LAT}) - 24.0) * {35.0 / 26.0!r} + 35.0)"

_LX, _LY = laea_ell_xy_sql(_LON_EU, _LAT_EU)

_LAEA_ORACLE = f"""
SELECT doc_id,
       ROUND({_LX} / 1000.0, 4) AS lx_km,
       ROUND({_LY} / 1000.0, 4) AS ly_km
FROM documents
"""


@register("reproject_laea3035_coords", _LAEA_ORACLE)
def reproject_laea3035_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TRUE EPSG:3035 coordinates (ellipsoidal LAEA on
    GRS80, Snyder eqs. 3-11/3-12/24-17..24-21, false easting/northing
    4321000/3210000 — validated against Snyder's published Clarke-1866
    worked example in tests/test_crs.py).  Documents are affinely
    remapped onto a Europe window first (driver-literal factors, same
    SQL text both engines).  Outputs in km at ROUND(·,4): q(φ) needs
    ln, whose ≤2-ulp JVM-vs-libm divergence cannot cross that grain."""
    docs = load(spark, sf_dir, "documents")
    gf = GeoFrame(
        docs.select(
            "doc_id",
            F.expr(_LON_EU).alias("x"), F.expr(_LAT_EU).alias("y"),
        ),
        crs="EPSG:4326",
    ).reproject_std("EPSG:3035")
    return gf.df.select(
        "doc_id",
        F.round(F.col("x") / 1000.0, 4).alias("lx_km"),
        F.round(F.col("y") / 1000.0, 4).alias("ly_km"),
    )


# --- UTM grid-zone rollup (interop tokens; Norway/Svalbard exceptions) -------

from chopin_spark.crs import utm_designator_sql  # noqa: E402

# widen the affine remap to lat 35..84 so the V-band Norway widening
# AND the Svalbard X-band zones actually occur in the data window
_LAT_UTM = f"((({_LAT}) - 24.0) * {49.0 / 26.0!r} + 35.0)"

_UTM_SQL = f"""
WITH pts AS (
  SELECT doc_id, n_chars, {_LON_EU} AS lon, {_LAT_UTM} AS lat
  FROM documents
)
SELECT {utm_designator_sql('lon', 'lat')} AS utm_zone,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM pts
GROUP BY 1
"""


@register("utm_zone_rollup", _UTM_SQL)
def utm_zone_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-UTM-grid-zone rollup over a Europe-window remap (so the 32V
    and Svalbard 31X/33X/35X/37X spec exceptions are exercised by real
    rows, pinned against published city designators in
    tests/test_crs.py).  Zone tokens are the classic "process each UTM
    zone in its own metric CRS" sharding key; assignment is pure
    CASE/FLOOR column math — bit-exact, codegen'd, one agg shuffle."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_UTM_SQL)


# --- ellipsoidal INVERSES: projected → geographic (r03 next-round #6) --------
#
# chopin's reproject_std round-trips through GDAL in both directions
# (/root/reference/R/check.R:129-157); these queries write projected
# coordinates BACK to lon/lat with the Snyder inverse (authalic-series
# latitude — no iteration), composed in-plan with the forward so the
# oracle certifies the full projected→geographic path.  Degrees at
# ROUND(·,6) (~0.1 m grain): the asin/atan2/ln divergence between JVM
# and C libm is ≤ a few ulp (~1e-13 deg), seven orders inside it.

from chopin_spark.crs import (  # noqa: E402
    albers_ell_inverse_xy_sql,
    laea_ell_inverse_xy_sql,
)

_I5070_LON, _I5070_LAT = albers_ell_inverse_xy_sql(f"({_EX})", f"({_EY})")

_INV5070_ORACLE = f"""
SELECT doc_id,
       ROUND({_I5070_LON}, 6) AS lon_deg,
       ROUND({_I5070_LAT}, 6) AS lat_deg
FROM documents
"""


@register("reproject_albers5070_inverse_coords", _INV5070_ORACLE)
def reproject_albers5070_inverse_coords(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TRUE EPSG:5070 → EPSG:4326 per document: the forward ellipsoidal
    Albers composes with the Snyder inverse (14-10/14-11 + the 3-18
    authalic latitude series) inside one plan; roundtrip accuracy
    ≤ 1.5 mm is pinned in tests/test_crs.py."""
    docs = load(spark, sf_dir, "documents")
    gf = GeoFrame(
        docs.select(
            "doc_id", F.expr(_LON).alias("x"), F.expr(_LAT).alias("y")
        ),
        crs="EPSG:4326",
    ).reproject("EPSG:5070").reproject("EPSG:4326")
    return gf.df.select(
        "doc_id",
        F.round("x", 6).alias("lon_deg"),
        F.round("y", 6).alias("lat_deg"),
    )


_ILX, _ILY = laea_ell_inverse_xy_sql(f"({_LX})", f"({_LY})")

_INV3035_ORACLE = f"""
SELECT doc_id,
       ROUND({_ILX}, 6) AS lon_deg,
       ROUND({_ILY}, 6) AS lat_deg
FROM documents
"""


@register("reproject_laea3035_inverse_coords", _INV3035_ORACLE)
def reproject_laea3035_inverse_coords(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TRUE EPSG:3035 → EPSG:4326 per document (Europe-window remap as
    the forward query): Snyder 24-26..24-31 inverse + 3-18 series,
    composed with the forward in one plan."""
    docs = load(spark, sf_dir, "documents")
    gf = GeoFrame(
        docs.select(
            "doc_id",
            F.expr(_LON_EU).alias("x"), F.expr(_LAT_EU).alias("y"),
        ),
        crs="EPSG:4326",
    ).reproject("EPSG:3035").reproject("EPSG:4326")
    return gf.df.select(
        "doc_id",
        F.round("x", 6).alias("lon_deg"),
        F.round("y", 6).alias("lat_deg"),
    )


# --- ellipsoidal geodesic distance (Andoyer–Lambert, GRS80) --------------------
#
# The first-order-in-f geodesic that rounds out the ellipsoid family
# (5070/3035 forward+inverse transforms above): chopin delegates
# geodesic distances to sf/s2 (s2_distance, R/check.R CRS plumbing);
# here the classic Andoyer–Lambert series — exact on the sphere term,
# O(f²)≈4.5e-6 relative on the flattening correction, ~25 m worst-case
# at CONUS spans, mm-exact vs itself in both engines.
#
# Exactness budget: SIN/COS/ATAN are ≤1 ulp per engine; the value
# chain multiplies ~10 such factors → ≤ ~2e-14 relative divergence,
# i.e. ≤ 1e-7 m at 5000 km.  ROUND at metre grain (km, 3 dp) leaves a
# per-row collision band of ~1e-10 — negligible across the corpus.
# The argmin is on the RAW double distance; anchor separations are
# hundreds of km, so a 1e-7 m wobble can never flip it.
#
# Scale shape: docs × 4 anchor rows — a broadcast dimension cross, one
# map stage, no shuffle until the 1-per-doc window argmin (bounded
# fan-in 4; at cluster scale the argmin is a partial min-by, no sort).

_GRS80_A = 6378137.0
_GRS80_F = 1.0 / 298.257222101

_AND_ANCHORS = """
anchors AS (
  SELECT CAST(1 AS BIGINT) AS aid, CAST(-74.0060 AS DOUBLE) AS alon,
         CAST(40.7128 AS DOUBLE) AS alat
  UNION ALL SELECT 2, CAST(-118.2437 AS DOUBLE), CAST(34.0522 AS DOUBLE)
  UNION ALL SELECT 3, CAST(-87.6298 AS DOUBLE), CAST(41.8781 AS DOUBLE)
  UNION ALL SELECT 4, CAST(-104.9903 AS DOUBLE), CAST(39.7392 AS DOUBLE)
)"""

_ANDOYER_SQL = f"""
WITH docs AS (
  SELECT doc_id, {_LON} AS dlon, {_LAT} AS dlat FROM documents
),
{_AND_ANCHORS.strip()},
trig AS (
  SELECT doc_id, aid,
         SIN(RADIANS((dlat + alat) / 2)) AS sf,
         COS(RADIANS((dlat + alat) / 2)) AS cf,
         SIN(RADIANS((dlat - alat) / 2)) AS sg,
         COS(RADIANS((dlat - alat) / 2)) AS cg,
         SIN(RADIANS((dlon - alon) / 2)) AS sl,
         COS(RADIANS((dlon - alon) / 2)) AS cl
  FROM docs CROSS JOIN anchors
),
sc AS (
  SELECT doc_id, aid, sf, cf, sg, cg,
         sg * sg * cl * cl + cf * cf * sl * sl AS s,
         cg * cg * cl * cl + sf * sf * sl * sl AS c
  FROM trig
),
om AS (
  SELECT doc_id, aid, sf, cf, sg, cg, s, c,
         ATAN(SQRT(s / c)) AS omega
  FROM sc WHERE s > 0 AND c > 0
),
dd AS (
  SELECT doc_id, aid,
         2 * omega * {_GRS80_A!r}
         * (1 + {_GRS80_F!r}
                * ((3 * SQRT(s * c) / omega - 1) / (2 * c)
                     * sf * sf * cg * cg
                   - (3 * SQRT(s * c) / omega + 1) / (2 * s)
                     * cf * cf * sg * sg)) AS d
  FROM om
),
rk AS (
  SELECT doc_id, aid, d,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY d, aid) AS rn
  FROM dd
)
SELECT doc_id, aid AS nearest_city, ROUND(d / 1000.0, 3) AS dist_km
FROM rk WHERE rn = 1
"""


@register("geodesic_nearest_city", _ANDOYER_SQL)
def geodesic_nearest_city(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest of four anchor cities per document by Andoyer–Lambert
    ellipsoidal geodesic distance on GRS80 (metre-grain output)."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_ANDOYER_SQL)


# --- true UTM zone 16N (ellipsoidal Transverse Mercator, EPSG:32616) ---------
#
# The third projected-CRS family (after Albers 5070 / LAEA 3035):
# Snyder 8-9..8-15 forward and 8-17..8-25 inverse on GRS80 — the CRS a
# chopin user actually hands to reproject_std for metric local work
# (/root/reference/R/check.R:129-157; UTM is the reference docs' go-to
# example of a "projected CRS in meters").  Documents are affinely
# remapped into the zone-16 slab (lon −90..−84, CM −87) with
# driver-literal factors so the series stay inside their ±4° validity.
# Outputs in km at ROUND(·,4) like Web Mercator: tan/sin divergence is
# a few ulp RELATIVE (~2e-10 m on a 5e5 m easting), seven orders
# inside the 0.1 m grain.

from chopin_spark.crs import tm_ell_inverse_xy_sql, tm_ell_xy_sql  # noqa: E402

_LON16 = f"((({_LON}) - -125.0) * {6.0 / 58.0!r} + -90.0)"

_UX, _UY = tm_ell_xy_sql(_LON16, _LAT)

_UTM16_ORACLE = f"""
SELECT doc_id,
       ROUND({_UX} / 1000.0, 4) AS ux_km,
       ROUND({_UY} / 1000.0, 4) AS uy_km
FROM documents
"""


@register("reproject_utm16_coords", _UTM16_ORACLE)
def reproject_utm16_coords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document TRUE EPSG:32616 (UTM zone 16N) coordinates —
    ellipsoidal Transverse Mercator on GRS80, validated in
    tests/test_crs.py against the published WGS84 quarter meridian
    (M(90°) = 10 001 965.729 m), Snyder's Clarke-1866 worked example
    (x=127 106.5, y=4 484 124.4 at 0.5 m), central-meridian exactness,
    E/W symmetry, and k0 scale at the CM."""
    docs = load(spark, sf_dir, "documents")
    gf = GeoFrame(
        docs.select(
            "doc_id", F.expr(_LON16).alias("x"), F.expr(_LAT).alias("y")
        ),
        crs="EPSG:4326",
    ).reproject_std("EPSG:32616")
    return gf.df.select(
        "doc_id",
        F.round(F.col("x") / 1000.0, 4).alias("ux_km"),
        F.round(F.col("y") / 1000.0, 4).alias("uy_km"),
    )


_IUX_LON, _IUX_LAT = tm_ell_inverse_xy_sql(f"({_UX})", f"({_UY})")

_INVUTM_ORACLE = f"""
SELECT doc_id,
       ROUND({_IUX_LON}, 6) AS lon_deg,
       ROUND({_IUX_LAT}, 6) AS lat_deg
FROM documents
"""


@register("reproject_utm16_inverse_coords", _INVUTM_ORACLE)
def reproject_utm16_inverse_coords(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TRUE EPSG:32616 → EPSG:4326 per document: forward TM composed
    in-plan with the Snyder 8-17/8-18 inverse (closed 3-26 footpoint
    series, no iteration); roundtrip ≤2e-8° inside the zone is pinned
    in tests/test_crs.py."""
    docs = load(spark, sf_dir, "documents")
    gf = GeoFrame(
        docs.select(
            "doc_id", F.expr(_LON16).alias("x"), F.expr(_LAT).alias("y")
        ),
        crs="EPSG:4326",
    ).reproject("EPSG:32616").reproject("EPSG:4326")
    return gf.df.select(
        "doc_id",
        F.round("x", 6).alias("lon_deg"),
        F.round("y", 6).alias("lat_deg"),
    )


# --- geodesic DIRECT problem (destination points) -----------------------------
#
# The forward twin of geodesic_nearest_city's Andoyer inverse: given
# (lon, lat, bearing, distance), where do you land?  Spherical direct
# formulas on the GRS80 mean radius (the closed-form path — the
# ellipsoidal direct is Vincenty's ITERATIVE series, out of scope for
# the repo's closed-form-SQL discipline; the ~0.3% sphere error is
# documented, and the inverse side already carries the ellipsoidal
# Andoyer correction).  Used for geofence ring construction, synthetic
# negative sampling around POIs, and "N km along the road bearing"
# features.  Deterministic: bearings/distances are integer-derived,
# trig is a fixed expression tree; outputs round at 1e-6 deg (0.1 m).

_GD_R = 6371008.7714  # GRS80 mean radius (a·(2+sqrt(1−e²))/3 class value)
_GD_DIST = 10_000.0   # 10 km

# per-document bearing: LCG-spread integer degrees 0..359
_GD_BRG = "(CAST((doc_id * 48271 + 11) % 360 AS DOUBLE))"

_GD_SQL = f"""
WITH src AS (
  SELECT doc_id, RADIANS({_LAT}) AS ph1, RADIANS({_LON}) AS la1,
         RADIANS({_GD_BRG}) AS th,
         {_GD_DIST / _GD_R!r} AS dr
  FROM documents
),
dst AS (
  SELECT doc_id,
         ASIN(SIN(ph1) * COS(dr) + COS(ph1) * SIN(dr) * COS(th)) AS ph2,
         la1 + ATAN2(SIN(th) * SIN(dr) * COS(ph1),
                     COS(dr) - SIN(ph1) *
                       (SIN(ph1) * COS(dr)
                        + COS(ph1) * SIN(dr) * COS(th))) AS la2
  FROM src
)
SELECT doc_id,
       ROUND(DEGREES(la2), 6) AS dest_lon,
       ROUND(DEGREES(ph2), 6) AS dest_lat
FROM dst
"""


@register("geodesic_destination_points", _GD_SQL)
def geodesic_destination_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle destination 10 km along a per-document bearing
    (spherical direct problem); roundtrip closure against the haversine
    inverse is pinned in tests/test_crs.py."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_GD_SQL)
