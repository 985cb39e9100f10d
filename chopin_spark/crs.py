"""CRS handling / reprojection (chopin parity: `reproject_std`
/root/reference/R/check.R:129-157, `reproject_to_raster` :171-180 —
every chopin workflow starts by reprojecting inputs to a standard CRS,
applied per-task at /root/reference/R/scale_process.R:177, :755).

pyproj is not available in this environment, so the projections are
implemented as CLOSED-FORM column expressions (public map-projection
formulas, Snyder "Map Projections — A Working Manual", USGS PP 1395):

- ``EPSG:4326``  lon/lat on the sphere (input standard),
- ``SPHERE:ALBERS_CONUS``  Albers equal-area conic, EPSG:5070
  parameters on the authalic sphere (φ1=29.5°, φ2=45.5°, φ0=23°,
  λ0=−96°),
- ``SPHERE:LAEA_EU``  Lambert azimuthal equal-area, EPSG:3035
  parameters on the sphere (φ1=52°, λ0=10°),
- ``SPHERE:WEBMERC``  spherical Web Mercator (EPSG:3857 formulas).

Spherical (not ellipsoidal) forms are used deliberately and documented:
the engine's correctness gate hashes values across Spark and DuckDB,
and of the transcendental primitives only ``sin``/``sqrt`` (plus
arithmetic) are bit-identical between the JVM and C libm (measured:
ln/tan/exp/asin/atan2 differ by ≤2 ulp).  Albers and LAEA are therefore
expressed with ``sin``, ``cos(x) = sin(π/2 − x)``, and ``sqrt`` ONLY —
hash-exact at full double precision.  Web Mercator needs ``ln``; its
oracle-facing outputs are reported in km at ROUND(·,4) where a 2-ulp
divergence (≈2e-12 km) cannot cross a rounding boundary.

The SQL text is shared verbatim between Spark (`F.expr`) and DuckDB.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

R_SPHERE = 6378137.0  # authalic-style radius (WGS84 semi-major), meters


def cos_sql(x: str) -> str:
    """cos via the sin identity — sin is bit-identical across the JVM
    and C libm, plain cos is not."""
    return f"sin(pi() / 2.0 - ({x}))"


# --- Albers equal-area conic (spherical, Snyder eqs. 14-1..14-6) -----------


@dataclass(frozen=True)
class AlbersParams:
    lat1: float = 29.5
    lat2: float = 45.5
    lat0: float = 23.0
    lon0: float = -96.0
    radius: float = R_SPHERE

    @property
    def n(self) -> float:
        return (math.sin(math.radians(self.lat1))
                + math.sin(math.radians(self.lat2))) / 2.0

    @property
    def big_c(self) -> float:
        s1 = math.sin(math.radians(self.lat1))
        c1 = math.cos(math.radians(self.lat1))
        return c1 * c1 + 2.0 * self.n * s1

    @property
    def rho0(self) -> float:
        s0 = math.sin(math.radians(self.lat0))
        return (self.radius
                * math.sqrt(self.big_c - 2.0 * self.n * s0) / self.n)


ALBERS_CONUS = AlbersParams()


def albers_xy_sql(
    lon: str, lat: str, p: AlbersParams = ALBERS_CONUS
) -> tuple[str, str]:
    """Forward Albers: (x, y) meter expressions — sin/sqrt only, so the
    values hash identically in Spark and DuckDB at full precision."""
    rho = (
        f"({p.radius!r} * sqrt({p.big_c!r} - {2.0 * p.n!r}"
        f" * sin(radians({lat}))) / {p.n!r})"
    )
    theta = f"({p.n!r} * radians(({lon}) - {p.lon0!r}))"
    x = f"({rho} * sin({theta}))"
    y = f"({p.rho0!r} - {rho} * {cos_sql(theta)})"
    return x, y


def albers_inverse_xy_sql(
    x: str, y: str, p: AlbersParams = ALBERS_CONUS
) -> tuple[str, str]:
    """Inverse Albers → (lon, lat) degrees.  Uses atan2/asin (NOT
    hash-identical across engines — roundtrip accuracy is pinned in
    tests/test_crs.py instead of the value-hash gate)."""
    rho = f"sqrt(({x}) * ({x}) + ({p.rho0!r} - ({y})) * ({p.rho0!r} - ({y})))"
    theta = f"atan2(({x}), {p.rho0!r} - ({y}))"
    lat = (
        f"degrees(asin(({p.big_c!r} - ({rho} * {p.n!r} / {p.radius!r})"
        f" * ({rho} * {p.n!r} / {p.radius!r})) / {2.0 * p.n!r}))"
    )
    lon = f"({p.lon0!r} + degrees({theta}) / {p.n!r})"
    return lon, lat


# --- Lambert azimuthal equal-area (spherical, Snyder eqs. 24-2..24-4) ------


@dataclass(frozen=True)
class LaeaParams:
    lat1: float = 52.0
    lon0: float = 10.0
    radius: float = R_SPHERE


LAEA_EU = LaeaParams()


def laea_xy_sql(
    lon: str, lat: str, p: LaeaParams = LAEA_EU
) -> tuple[str, str]:
    s1 = math.sin(math.radians(p.lat1))
    c1 = math.cos(math.radians(p.lat1))
    dlon = f"radians(({lon}) - {p.lon0!r})"
    sinp = f"sin(radians({lat}))"
    cosp = cos_sql(f"radians({lat})")
    cosd = cos_sql(dlon)
    kp = (
        f"sqrt(2.0 / (1.0 + {s1!r} * {sinp}"
        f" + {c1!r} * {cosp} * {cosd}))"
    )
    x = f"({p.radius!r} * {kp} * {cosp} * sin({dlon}))"
    y = (
        f"({p.radius!r} * {kp} * ({c1!r} * {sinp}"
        f" - {s1!r} * {cosp} * {cosd}))"
    )
    return x, y


def laea_inverse_xy_sql(
    x: str, y: str, p: LaeaParams = LAEA_EU
) -> tuple[str, str]:
    """Inverse spherical LAEA → (lon, lat) degrees (Snyder eqs.
    20-14..20-18 with c = 2·asin(ρ/2R)).  atan2/asin based — roundtrip
    accuracy pinned in tests/test_crs.py, same contract as the Albers
    inverse.  ρ = 0 (the projection center) maps to (lon0, lat1)."""
    s1 = math.sin(math.radians(p.lat1))
    c1 = math.cos(math.radians(p.lat1))
    rho = f"sqrt(({x}) * ({x}) + ({y}) * ({y}))"
    c = f"(2.0 * asin(LEAST(1.0, {rho} / (2.0 * {p.radius!r}))))"
    lat = (
        f"degrees(asin(CASE WHEN {rho} = 0.0 THEN {s1!r}"
        f" ELSE cos({c}) * {s1!r}"
        f" + (({y}) * sin({c}) * {c1!r} / {rho}) END))"
    )
    lon = (
        f"({p.lon0!r} + degrees(atan2(({x}) * sin({c}),"
        f" {rho} * {c1!r} * cos({c})"
        f" - ({y}) * {s1!r} * sin({c}))))"
    )
    return lon, lat


# --- Albers equal-area conic, ELLIPSOIDAL (EPSG:5070 exact) -----------------
#
# Snyder PP 1395 eqs. 14-1..14-21 / 3-12 on the GRS80 ellipsoid — the
# true EPSG:5070 forward transform (VERDICT r02 next-steps #9; the
# spherical form above remains the hash-exact oracle workhorse).  The
# implementation reproduces Snyder's published Clarke-1866 numerical
# example to 0.1 m (pinned in tests/test_crs.py).  q(φ) needs ln
# (≤2 ulp engine divergence), so oracle-facing outputs report in km at
# ROUND(·, 4) like Web Mercator.


@dataclass(frozen=True)
class AlbersEllParams:
    a: float = 6378137.0              # GRS80 semi-major
    e2: float = 0.006694380022903416  # GRS80 first eccentricity²
    lat1: float = 29.5
    lat2: float = 45.5
    lat0: float = 23.0
    lon0: float = -96.0

    def _q(self, phi_deg: float) -> float:
        e = math.sqrt(self.e2)
        s = math.sin(math.radians(phi_deg))
        return (1.0 - self.e2) * (
            s / (1.0 - self.e2 * s * s)
            - (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s))
        )

    def _m(self, phi_deg: float) -> float:
        s = math.sin(math.radians(phi_deg))
        return math.cos(math.radians(phi_deg)) / math.sqrt(
            1.0 - self.e2 * s * s
        )

    @property
    def n(self) -> float:
        m1, m2 = self._m(self.lat1), self._m(self.lat2)
        return (m1 * m1 - m2 * m2) / (self._q(self.lat2) - self._q(self.lat1))

    @property
    def big_c(self) -> float:
        m1 = self._m(self.lat1)
        return m1 * m1 + self.n * self._q(self.lat1)

    @property
    def rho0(self) -> float:
        return self.a * math.sqrt(self.big_c - self.n * self._q(self.lat0)) / self.n


ALBERS_5070 = AlbersEllParams()


def q_ell_sql(lat: str, p: AlbersEllParams = ALBERS_5070) -> str:
    """Snyder eq. 3-12: the authalic q function of latitude."""
    e = math.sqrt(p.e2)
    s = f"sin(radians({lat}))"
    return (
        f"({1.0 - p.e2!r} * ({s} / (1.0 - {p.e2!r} * {s} * {s})"
        f" - {1.0 / (2.0 * e)!r}"
        f" * ln((1.0 - {e!r} * {s}) / (1.0 + {e!r} * {s}))))"
    )


def albers_ell_xy_sql(
    lon: str, lat: str, p: AlbersEllParams = ALBERS_5070
) -> tuple[str, str]:
    """Forward ellipsoidal Albers (true EPSG:5070 with GRS80 defaults).
    Projection constants n/C/ρ0 are driver-computed literals (identical
    text both engines); the per-row path is sin/sqrt/ln."""
    rho = f"({p.a!r} * sqrt({p.big_c!r} - {p.n!r} * {q_ell_sql(lat, p)}) / {p.n!r})"
    theta = f"({p.n!r} * radians(({lon}) - {p.lon0!r}))"
    x = f"({rho} * sin({theta}))"
    y = f"({p.rho0!r} - {rho} * {cos_sql(theta)})"
    return x, y


# --- Lambert azimuthal equal-area, ELLIPSOIDAL (EPSG:3035 exact) ------------
#
# Snyder PP 1395 eqs. 3-11/3-12/24-17..24-21 on GRS80 — the true
# EPSG:3035 (ETRS89-extended / LAEA Europe) forward transform,
# completing the ellipsoidal pair with albers_ell_xy_sql (VERDICT r02
# next-steps #9).  β never needs asin: only sinβ = q/qp and
# cosβ = sqrt(1 − sinβ²) appear, so the per-row path is sin/sqrt/ln —
# the same engine-divergence class as the ellipsoidal Albers (ln ≤2
# ulp), so oracle-facing outputs report in km at ROUND(·, 4).
# Reproduces Snyder's published Clarke-1866 worked example (φ1=40°,
# λ0=−100°, φ=30°, λ=−110° → −965932.1, −1056814.9) to 0.1 m
# (pinned in tests/test_crs.py).


@dataclass(frozen=True)
class LaeaEllParams:
    a: float = 6378137.0              # GRS80 semi-major
    e2: float = 0.006694380022903416  # GRS80 first eccentricity²
    lat1: float = 52.0                # EPSG:3035 latitude of origin
    lon0: float = 10.0                # EPSG:3035 central meridian
    fe: float = 4321000.0             # false easting
    fn: float = 3210000.0             # false northing

    def _q(self, phi_deg: float) -> float:
        e = math.sqrt(self.e2)
        s = math.sin(math.radians(phi_deg))
        return (1.0 - self.e2) * (
            s / (1.0 - self.e2 * s * s)
            - (1.0 / (2.0 * e)) * math.log((1.0 - e * s) / (1.0 + e * s))
        )

    @property
    def qp(self) -> float:
        return self._q(90.0)

    @property
    def sin_b1(self) -> float:
        return self._q(self.lat1) / self.qp

    @property
    def cos_b1(self) -> float:
        return math.sqrt(1.0 - self.sin_b1 * self.sin_b1)

    @property
    def rq(self) -> float:
        return self.a * math.sqrt(self.qp / 2.0)

    @property
    def d(self) -> float:
        s = math.sin(math.radians(self.lat1))
        m1 = math.cos(math.radians(self.lat1)) / math.sqrt(
            1.0 - self.e2 * s * s
        )
        return self.a * m1 / (self.rq * self.cos_b1)


LAEA_3035 = LaeaEllParams()


def laea_ell_xy_sql(
    lon: str, lat: str, p: LaeaEllParams = LAEA_3035
) -> tuple[str, str]:
    """Forward ellipsoidal LAEA (true EPSG:3035 with GRS80 defaults).
    Projection constants qp/sinβ1/cosβ1/Rq/D are driver-computed
    literals (identical text both engines); per-row path is
    sin/sqrt/ln only."""
    e = math.sqrt(p.e2)
    s = f"sin(radians({lat}))"
    q = (
        f"({1.0 - p.e2!r} * ({s} / (1.0 - {p.e2!r} * {s} * {s})"
        f" - {1.0 / (2.0 * e)!r}"
        f" * ln((1.0 - {e!r} * {s}) / (1.0 + {e!r} * {s}))))"
    )
    sb = f"({q} / {p.qp!r})"
    cb = f"sqrt(1.0 - {sb} * {sb})"
    dlon = f"radians(({lon}) - {p.lon0!r})"
    cosd = cos_sql(dlon)
    b = (
        f"({p.rq!r} * sqrt(2.0 / (1.0 + {p.sin_b1!r} * {sb}"
        f" + {p.cos_b1!r} * {cb} * {cosd})))"
    )
    x = f"({p.fe!r} + {b} * {p.d!r} * {cb} * sin({dlon}))"
    y = (
        f"({p.fn!r} + ({b} / {p.d!r}) * ({p.cos_b1!r} * {sb}"
        f" - {p.sin_b1!r} * {cb} * {cosd}))"
    )
    return x, y


# --- ellipsoidal INVERSES (EPSG:5070 / EPSG:3035 → EPSG:4326) ---------------
#
# chopin round-trips through GDAL both ways (reproject_std,
# /root/reference/R/check.R:129-157); r03 shipped ellipsoidal forwards
# only (VERDICT r03 next-round #6).  The inverse latitude solve uses
# Snyder's closed authalic-latitude series (eq. 3-18) instead of the
# 3-16 iteration — no fixpoint, pure sin/asin/atan2/sqrt per row, and
# the truncation error is O(e^8) ≈ 1e-10 rad (~0.6 mm on GRS80), well
# inside the 0.1 m contract pinned in tests/test_crs.py.


def authalic_lat_sql(sin_beta: str, e2: float) -> str:
    """Snyder eq. 3-18: geodetic latitude (degrees) from the sine of
    the authalic latitude β: φ = β + c2·sin2β + c4·sin4β + c6·sin6β."""
    e4, e6 = e2 * e2, e2 * e2 * e2
    c2 = e2 / 3.0 + 31.0 * e4 / 180.0 + 517.0 * e6 / 5040.0
    c4 = 23.0 * e4 / 360.0 + 251.0 * e6 / 3780.0
    c6 = 761.0 * e6 / 45360.0
    b = f"asin(LEAST(1.0, GREATEST(-1.0, {sin_beta})))"
    return (
        f"degrees({b} + {c2!r} * sin(2.0 * {b})"
        f" + {c4!r} * sin(4.0 * {b}) + {c6!r} * sin(6.0 * {b}))"
    )


def albers_ell_inverse_xy_sql(
    x: str, y: str, p: AlbersEllParams = ALBERS_5070
) -> tuple[str, str]:
    """Inverse ellipsoidal Albers (Snyder eqs. 14-10/14-11 geometry +
    3-18 latitude series).  ρ/θ from the projected point, q from the
    cone constant, then φ via the authalic series; λ = λ0 + θ/n."""
    e = math.sqrt(p.e2)
    qp = (1.0 - p.e2) * (
        1.0 / (1.0 - p.e2)
        - (1.0 / (2.0 * e)) * math.log((1.0 - e) / (1.0 + e))
    )
    ry = f"({p.rho0!r} - ({y}))"
    rho = f"sqrt(({x}) * ({x}) + {ry} * {ry})"
    q = f"(({p.big_c!r} - ({rho} * {p.n!r} / {p.a!r})"\
        f" * ({rho} * {p.n!r} / {p.a!r})) / {p.n!r})"
    lat = authalic_lat_sql(f"({q} / {qp!r})", p.e2)
    lon = f"({p.lon0!r} + degrees(atan2(({x}), {ry})) / {p.n!r})"
    return lon, lat


def laea_ell_inverse_xy_sql(
    x: str, y: str, p: LaeaEllParams = LAEA_3035
) -> tuple[str, str]:
    """Inverse ellipsoidal LAEA (Snyder eqs. 24-26..24-31 + 3-18
    series).  ρ = 0 (the false origin) maps to (lon0, lat1) exactly."""
    xr = f"(({x}) - {p.fe!r})"
    yr = f"(({y}) - {p.fn!r})"
    rho = (
        f"sqrt(({xr} / {p.d!r}) * ({xr} / {p.d!r})"
        f" + ({p.d!r} * {yr}) * ({p.d!r} * {yr}))"
    )
    ce = f"(2.0 * asin(LEAST(1.0, {rho} / (2.0 * {p.rq!r}))))"
    sb = (
        f"(CASE WHEN {rho} = 0.0 THEN {p.sin_b1!r}"
        f" ELSE {cos_sql(ce)} * {p.sin_b1!r}"
        f" + ({p.d!r} * {yr} * sin({ce}) * {p.cos_b1!r} / {rho}) END)"
    )
    lat = authalic_lat_sql(sb, p.e2)
    lon = (
        f"({p.lon0!r} + degrees(atan2({xr} * sin({ce}),"
        f" {p.d!r} * {rho} * {p.cos_b1!r} * {cos_sql(ce)}"
        f" - {p.d!r} * {p.d!r} * {yr} * {p.sin_b1!r} * sin({ce}))))"
    )
    return lon, lat


# --- Web Mercator (spherical EPSG:3857 formulas) ----------------------------


def webmercator_xy_sql(lon: str, lat: str) -> tuple[str, str]:
    """Forward Web Mercator.  y uses ln (≤2 ulp engine divergence) —
    report oracle-facing outputs in km with ROUND(·, 4)."""
    x = f"({R_SPHERE!r} * radians({lon}))"
    y = (
        f"({R_SPHERE!r} * 0.5 * ln((1.0 + sin(radians({lat})))"
        f" / (1.0 - sin(radians({lat})))))"
    )
    return x, y


def webmercator_inverse_xy_sql(x: str, y: str) -> tuple[str, str]:
    lon = f"degrees(({x}) / {R_SPHERE!r})"
    lat = f"degrees(2.0 * atan(exp(({y}) / {R_SPHERE!r})) - pi() / 2.0)"
    return lon, lat


# --- Transverse Mercator / UTM, ELLIPSOIDAL (EPSG:326xx exact) --------------
#
# Snyder PP 1395 eqs. 8-9..8-15 (forward) and 8-17..8-25 + 3-21/3-26
# (inverse, footpoint-latitude series) on GRS80/WGS84 — the true UTM
# projected CRS family (EPSG:32601-32660), completing the reference's
# two-way reproject_std parity (/root/reference/R/check.R:129-157) for
# the third projected-CRS family after Albers 5070 and LAEA 3035.  The
# series are truncated at e^6 like Snyder's worked examples (O(e^8)
# meridian-arc truncation ≈ 0.2 mm); validity is the standard ±4-5° of
# the central meridian, i.e. a UTM zone plus overlap.
#
# Unlike Albers/LAEA there is no ln(): the formulas use only
# sin/cos/tan/sqrt and polynomials, but tan and higher powers of the
# arc A make per-term engine divergence ~1e-9 m, so oracle-facing
# outputs report km at ROUND(·,4) (0.1 m buckets) like Web Mercator.
# Tests pin: the WGS84 quarter meridian (M(90°) = 10 001 965.729 m,
# the published constant the metre was historically derived from),
# central-meridian exactness (x = FE, y = k0·M(φ)), E/W and N/S
# symmetry, meridian-convergence-free scale k0 at the CM, and
# forward∘inverse roundtrips ≤1e-8°.


@dataclass(frozen=True)
class TMParams:
    """Transverse Mercator on the ellipsoid; defaults = UTM zone 16N
    (EPSG:32616, CM −87° — the CONUS-center zone for the doc window)."""

    a: float = 6378137.0              # GRS80/WGS84 semi-major
    e2: float = 0.006694380022903416  # GRS80 first eccentricity²
    k0: float = 0.9996
    lon0: float = -87.0
    fe: float = 500000.0
    fn: float = 0.0

    @property
    def ep2(self) -> float:           # second eccentricity²  e'² (8-12)
        return self.e2 / (1.0 - self.e2)

    # meridian-arc series M(φ) = a(c0·φ − c2·sin2φ + c4·sin4φ − c6·sin6φ)
    # (Snyder 3-21, truncated at e^6)
    @property
    def c0(self) -> float:
        e2, e4, e6 = self.e2, self.e2**2, self.e2**3
        return 1.0 - e2 / 4.0 - 3.0 * e4 / 64.0 - 5.0 * e6 / 256.0

    @property
    def c2(self) -> float:
        e2, e4, e6 = self.e2, self.e2**2, self.e2**3
        return 3.0 * e2 / 8.0 + 3.0 * e4 / 32.0 + 45.0 * e6 / 1024.0

    @property
    def c4(self) -> float:
        e4, e6 = self.e2**2, self.e2**3
        return 15.0 * e4 / 256.0 + 45.0 * e6 / 1024.0

    @property
    def c6(self) -> float:
        return 35.0 * self.e2**3 / 3072.0

    # footpoint-latitude series coefficients (Snyder 3-26 in e1, 3-24)
    @property
    def e1(self) -> float:
        s = math.sqrt(1.0 - self.e2)
        return (1.0 - s) / (1.0 + s)

    @property
    def i2(self) -> float:
        return 3.0 * self.e1 / 2.0 - 27.0 * self.e1**3 / 32.0

    @property
    def i4(self) -> float:
        return 21.0 * self.e1**2 / 16.0 - 55.0 * self.e1**4 / 32.0

    @property
    def i6(self) -> float:
        return 151.0 * self.e1**3 / 96.0

    @property
    def i8(self) -> float:
        return 1097.0 * self.e1**4 / 512.0

    def meridian_arc(self, lat_deg: float) -> float:
        """M(φ) in meters (Snyder 3-21)."""
        p = math.radians(lat_deg)
        return self.a * (
            self.c0 * p
            - self.c2 * math.sin(2.0 * p)
            + self.c4 * math.sin(4.0 * p)
            - self.c6 * math.sin(6.0 * p)
        )


UTM_16N = TMParams()


def tm_forward_py(lon: float, lat: float, p: TMParams = UTM_16N) -> tuple[float, float]:
    """Python twin of :func:`tm_ell_xy_sql` (test reference)."""
    phi = math.radians(lat)
    s, c, t = math.sin(phi), math.cos(phi), math.tan(phi)
    big_n = p.a / math.sqrt(1.0 - p.e2 * s * s)
    big_t = t * t
    big_c = p.ep2 * c * c
    big_a = math.radians(lon - p.lon0) * c
    m = p.meridian_arc(lat)
    x = p.fe + p.k0 * big_n * (
        big_a
        + (1.0 - big_t + big_c) * big_a**3 / 6.0
        + (5.0 - 18.0 * big_t + big_t * big_t + 72.0 * big_c - 58.0 * p.ep2)
        * big_a**5 / 120.0
    )
    y = p.fn + p.k0 * (
        m
        + big_n * t * (
            big_a * big_a / 2.0
            + (5.0 - big_t + 9.0 * big_c + 4.0 * big_c * big_c)
            * big_a**4 / 24.0
            + (61.0 - 58.0 * big_t + big_t * big_t + 600.0 * big_c
               - 330.0 * p.ep2) * big_a**6 / 720.0
        )
    )
    return x, y


def tm_inverse_py(x: float, y: float, p: TMParams = UTM_16N) -> tuple[float, float]:
    """Python twin of :func:`tm_ell_inverse_xy_sql` (test reference)."""
    mu = (y - p.fn) / p.k0 / (p.a * p.c0)
    phi1 = (
        mu
        + p.i2 * math.sin(2.0 * mu)
        + p.i4 * math.sin(4.0 * mu)
        + p.i6 * math.sin(6.0 * mu)
        + p.i8 * math.sin(8.0 * mu)
    )
    s1, c1, t1 = math.sin(phi1), math.cos(phi1), math.tan(phi1)
    big_c1 = p.ep2 * c1 * c1
    big_t1 = t1 * t1
    w = 1.0 - p.e2 * s1 * s1
    n1 = p.a / math.sqrt(w)
    r1 = p.a * (1.0 - p.e2) / (w * math.sqrt(w))
    d = (x - p.fe) / (n1 * p.k0)
    lat = math.degrees(
        phi1
        - (n1 * t1 / r1) * (
            d * d / 2.0
            - (5.0 + 3.0 * big_t1 + 10.0 * big_c1 - 4.0 * big_c1 * big_c1
               - 9.0 * p.ep2) * d**4 / 24.0
            + (61.0 + 90.0 * big_t1 + 298.0 * big_c1 + 45.0 * big_t1 * big_t1
               - 252.0 * p.ep2 - 3.0 * big_c1 * big_c1) * d**6 / 720.0
        )
    )
    lon = p.lon0 + math.degrees(
        (
            d
            - (1.0 + 2.0 * big_t1 + big_c1) * d**3 / 6.0
            + (5.0 - 2.0 * big_c1 + 28.0 * big_t1 - 3.0 * big_c1 * big_c1
               + 8.0 * p.ep2 + 24.0 * big_t1 * big_t1) * d**5 / 120.0
        )
        / c1
    )
    return lon, lat


def tm_meridian_arc_sql(lat: str, p: TMParams = UTM_16N) -> str:
    """M(φ) as shared SQL (Snyder 3-21); coefficients are driver-side
    literals so both engines evaluate the identical polynomial."""
    ph = f"radians({lat})"
    return (
        f"({p.a!r} * ({p.c0!r} * {ph} - {p.c2!r} * sin(2.0 * {ph})"
        f" + {p.c4!r} * sin(4.0 * {ph}) - {p.c6!r} * sin(6.0 * {ph})))"
    )


def tm_ell_xy_sql(lon: str, lat: str, p: TMParams = UTM_16N) -> tuple[str, str]:
    """Forward ellipsoidal Transverse Mercator (Snyder 8-9/8-10).

    The expressions inline N/T/C/A with driver-literal constants —
    same staging as albers_ell_xy_sql.  Callers that feed these into
    further arithmetic should project them to their own columns first
    (no-inline rule) to keep codegen spans small."""
    ph = f"radians({lat})"
    s = f"sin({ph})"
    c = cos_sql(ph)
    t = f"(sin({ph}) / {cos_sql(ph)})"
    big_n = f"({p.a!r} / sqrt(1.0 - {p.e2!r} * {s} * {s}))"
    big_t = f"({t} * {t})"
    big_c = f"({p.ep2!r} * {c} * {c})"
    big_a = f"(radians(({lon}) - {p.lon0!r}) * {c})"
    a2 = f"({big_a} * {big_a})"
    m = tm_meridian_arc_sql(lat, p)
    x = (
        f"({p.fe!r} + {p.k0!r} * {big_n} * {big_a} * (1.0"
        f" + {a2} * ((1.0 - {big_t} + {big_c}) / 6.0"
        f" + {a2} * (5.0 - 18.0 * {big_t} + {big_t} * {big_t}"
        f" + 72.0 * {big_c} - {58.0 * p.ep2!r}) / 120.0)))"
    )
    y = (
        f"({p.fn!r} + {p.k0!r} * ({m} + {big_n} * {t} * {a2} * (0.5"
        f" + {a2} * ((5.0 - {big_t} + 9.0 * {big_c}"
        f" + 4.0 * {big_c} * {big_c}) / 24.0"
        f" + {a2} * (61.0 - 58.0 * {big_t} + {big_t} * {big_t}"
        f" + 600.0 * {big_c} - {330.0 * p.ep2!r}) / 720.0))))"
    )
    return x, y


def tm_ell_inverse_xy_sql(x: str, y: str, p: TMParams = UTM_16N) -> tuple[str, str]:
    """Inverse ellipsoidal Transverse Mercator (Snyder 8-17/8-18 with
    the 3-26 footpoint-latitude series — closed form, no iteration)."""
    mu = f"((({y}) - {p.fn!r}) / {p.k0!r} / {p.a * p.c0!r})"
    phi1 = (
        f"({mu} + {p.i2!r} * sin(2.0 * {mu}) + {p.i4!r} * sin(4.0 * {mu})"
        f" + {p.i6!r} * sin(6.0 * {mu}) + {p.i8!r} * sin(8.0 * {mu}))"
    )
    s1 = f"sin({phi1})"
    c1 = cos_sql(phi1)
    t1 = f"({s1} / {c1})"
    w = f"(1.0 - {p.e2!r} * {s1} * {s1})"
    n1 = f"({p.a!r} / sqrt({w}))"
    # N1/R1 = w / (1 − e²)  — avoids a second sqrt
    n1_over_r1 = f"({w} / {1.0 - p.e2!r})"
    big_c1 = f"({p.ep2!r} * {c1} * {c1})"
    big_t1 = f"({t1} * {t1})"
    d = f"((({x}) - {p.fe!r}) / ({n1} * {p.k0!r}))"
    d2 = f"({d} * {d})"
    lat = (
        f"degrees({phi1} - ({n1_over_r1} * {t1}) * {d2} * (0.5"
        f" - {d2} * ((5.0 + 3.0 * {big_t1} + 10.0 * {big_c1}"
        f" - 4.0 * {big_c1} * {big_c1} - {9.0 * p.ep2!r}) / 24.0"
        f" - {d2} * (61.0 + 90.0 * {big_t1} + 298.0 * {big_c1}"
        f" + 45.0 * {big_t1} * {big_t1} - {252.0 * p.ep2!r}"
        f" - 3.0 * {big_c1} * {big_c1}) / 720.0)))"
    )
    lon = (
        f"({p.lon0!r} + degrees({d} * (1.0"
        f" - {d2} * ((1.0 + 2.0 * {big_t1} + {big_c1}) / 6.0"
        f" - {d2} * (5.0 - 2.0 * {big_c1} + 28.0 * {big_t1}"
        f" - 3.0 * {big_c1} * {big_c1} + {8.0 * p.ep2!r}"
        f" + 24.0 * {big_t1} * {big_t1}) / 120.0)) / {c1}))"
    )
    return lon, lat


# --- DataFrame-level API (chopin's reproject_std / reproject_to_raster) -----

_FORWARD = {
    ("EPSG:4326", "EPSG:5070"): albers_ell_xy_sql,
    ("EPSG:4326", "EPSG:3035"): laea_ell_xy_sql,
    ("EPSG:4326", "EPSG:32616"): tm_ell_xy_sql,
    ("EPSG:32616", "EPSG:4326"): tm_ell_inverse_xy_sql,
    ("EPSG:5070", "EPSG:4326"): albers_ell_inverse_xy_sql,
    ("EPSG:3035", "EPSG:4326"): laea_ell_inverse_xy_sql,
    ("EPSG:4326", "SPHERE:ALBERS_CONUS"): albers_xy_sql,
    ("EPSG:4326", "SPHERE:LAEA_EU"): laea_xy_sql,
    ("EPSG:4326", "SPHERE:WEBMERC"): webmercator_xy_sql,
    ("SPHERE:ALBERS_CONUS", "EPSG:4326"): albers_inverse_xy_sql,
    ("SPHERE:LAEA_EU", "EPSG:4326"): laea_inverse_xy_sql,
    ("SPHERE:WEBMERC", "EPSG:4326"): webmercator_inverse_xy_sql,
}


@dataclass
class GeoFrame:
    """A DataFrame with coordinate columns and a tracked CRS — the
    engine's stand-in for sf/terra objects carrying a CRS."""

    df: DataFrame
    crs: str = "EPSG:4326"
    x_col: str = "x"
    y_col: str = "y"

    def reproject(self, dst: str) -> "GeoFrame":
        if dst == self.crs:
            return self
        key = (self.crs, dst)
        if key not in _FORWARD:
            raise ValueError(f"no transform registered for {key}")
        xe, ye = _FORWARD[key](self.x_col, self.y_col)
        out = self.df.withColumns(
            {self.x_col: F.expr(xe), self.y_col: F.expr(ye)}
        )
        return GeoFrame(out, dst, self.x_col, self.y_col)

    def reproject_std(self, crs_standard: str = "EPSG:4326") -> "GeoFrame":
        """chopin reproject_std (/root/reference/R/check.R:129-157):
        no-op when already in the standard CRS, else transform."""
        return self.reproject(crs_standard)

    def reproject_to(self, other: "GeoFrame") -> "GeoFrame":
        """chopin reproject_to_raster (/root/reference/R/check.R:171-180):
        align this frame's CRS to another layer's."""
        return self.reproject(other.crs)


# --- UTM zone assignment (interop-grade grid zone designators) ---------------
#
# The MGRS/UTM grid-zone designator (zone number 1-60 + latitude band
# C..X) is fully specified by public arithmetic — including the two
# spec exceptions (zone 32V widened over SW Norway; the four Svalbard
# X-band zones 31/33/35/37) — so emitted tokens name the same zones as
# any GIS stack.  Pure CASE/FLOOR arithmetic: bit-exact across engines,
# codegen'd, and a natural coarse partitioning key for global data
# (each zone is a 6-degree lon slab — the classic "reproject per UTM
# zone" sharding rule for metric-accurate local processing).

_UTM_BANDS = "CDEFGHJKLMNPQRSTUVWX"  # 8-deg bands from -80, no I/O


def utm_py(lon: float, lat: float) -> str | None:
    """Reference Python encoder; None outside UTM latitude coverage."""
    if lat < -80.0 or lat > 84.0:
        return None
    zone = min(max(int((lon + 180.0) // 6) + 1, 1), 60)
    band = _UTM_BANDS[min(int((lat + 80.0) // 8), 19)]
    if band == "V" and 3.0 <= lon < 12.0:
        zone = 32
    elif band == "X":
        if 0.0 <= lon < 9.0:
            zone = 31
        elif 9.0 <= lon < 21.0:
            zone = 33
        elif 21.0 <= lon < 33.0:
            zone = 35
        elif 33.0 <= lon < 42.0:
            zone = 37
    return f"{zone}{band}"


def utm_designator_sql(lon: str, lat: str) -> str:
    """Grid-zone designator as shared SQL (NULL outside -80..84 lat)."""
    zone = (
        f"LEAST(GREATEST(CAST(FLOOR((({lon}) + 180.0) / 6.0) AS BIGINT)"
        f" + 1, 1), 60)"
    )
    band_i = f"LEAST(CAST(FLOOR((({lat}) + 80.0) / 8.0) AS BIGINT), 19)"
    band = f"SUBSTR('{_UTM_BANDS}', CAST({band_i} AS INT) + 1, 1)"
    zone_fixed = f"""CASE
      WHEN {band} = 'V' AND ({lon}) >= 3.0 AND ({lon}) < 12.0 THEN 32
      WHEN {band} = 'X' AND ({lon}) >= 0.0 AND ({lon}) < 9.0 THEN 31
      WHEN {band} = 'X' AND ({lon}) >= 9.0 AND ({lon}) < 21.0 THEN 33
      WHEN {band} = 'X' AND ({lon}) >= 21.0 AND ({lon}) < 33.0 THEN 35
      WHEN {band} = 'X' AND ({lon}) >= 33.0 AND ({lon}) < 42.0 THEN 37
      ELSE {zone} END"""
    return (
        f"(CASE WHEN ({lat}) < -80.0 OR ({lat}) > 84.0 THEN NULL"
        f" ELSE CAST({zone_fixed} AS STRING) || {band} END)"
    )
