"""CRS layer: forward/inverse roundtrips, projection invariants, and
the GeoFrame reproject_std contract (chopin R/check.R:129-157)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from chopin_spark.crs import (
    ALBERS_CONUS, GeoFrame, LAEA_EU,
    albers_inverse_xy_sql, albers_xy_sql, laea_xy_sql,
    webmercator_inverse_xy_sql, webmercator_xy_sql,
)


@pytest.fixture(scope="module")
def pts(spark):
    # a deterministic lon/lat lattice over the CONUS window
    return spark.sql(
        "SELECT -124.0 + i * 3.17 AS lon, 25.0 + j * 1.73 AS lat "
        "FROM range(0, 18) t1(i), range(0, 14) t2(j)"
    )


def test_albers_roundtrip(spark, pts):
    xe, ye = albers_xy_sql("lon", "lat")
    le, pe = albers_inverse_xy_sql("px", "py")
    out = (
        pts.select("lon", "lat", F.expr(xe).alias("px"), F.expr(ye).alias("py"))
        .select(
            "lon", "lat",
            F.expr(le).alias("lon2"), F.expr(pe).alias("lat2"),
        )
        .select(
            F.max(F.abs(F.col("lon") - F.col("lon2"))).alias("dl"),
            F.max(F.abs(F.col("lat") - F.col("lat2"))).alias("dp"),
        )
        .first()
    )
    assert out["dl"] < 1e-9 and out["dp"] < 1e-9


def test_webmercator_roundtrip(spark, pts):
    xe, ye = webmercator_xy_sql("lon", "lat")
    le, pe = webmercator_inverse_xy_sql("px", "py")
    out = (
        pts.select("lon", "lat", F.expr(xe).alias("px"), F.expr(ye).alias("py"))
        .select(
            "lon", "lat",
            F.expr(le).alias("lon2"), F.expr(pe).alias("lat2"),
        )
        .select(
            F.max(F.abs(F.col("lon") - F.col("lon2"))).alias("dl"),
            F.max(F.abs(F.col("lat") - F.col("lat2"))).alias("dp"),
        )
        .first()
    )
    assert out["dl"] < 1e-9 and out["dp"] < 1e-9


def test_albers_center_meridian_maps_to_x_zero(spark):
    xe, _ = albers_xy_sql("lon", "lat")
    row = spark.sql(
        f"SELECT {xe} AS x FROM (SELECT {ALBERS_CONUS.lon0!r} AS lon,"
        " 37.0 AS lat)"
    ).first()
    assert abs(row["x"]) < 1e-6


def test_laea_origin_maps_to_zero(spark):
    xe, ye = laea_xy_sql("lon", "lat")
    row = spark.sql(
        f"SELECT {xe} AS x, {ye} AS y FROM"
        f" (SELECT {LAEA_EU.lon0!r} AS lon, {LAEA_EU.lat1!r} AS lat)"
    ).first()
    assert abs(row["x"]) < 1e-6 and abs(row["y"]) < 1e-6


def test_albers_equal_area_property(spark):
    """Equal-area projection: the projected area of a small lon/lat
    quad matches the spherical surface area within 0.1%."""
    lon0, lat0, d = -100.0, 35.0, 0.5
    xe, ye = albers_xy_sql("lon", "lat")
    quad = spark.sql(
        "SELECT * FROM VALUES"
        f" ({lon0!r}, {lat0!r}), ({lon0 + d!r}, {lat0!r}),"
        f" ({lon0 + d!r}, {lat0 + d!r}), ({lon0!r}, {lat0 + d!r})"
        " AS t(lon, lat)"
    ).select(F.expr(xe).alias("x"), F.expr(ye).alias("y")).collect()
    # shoelace over the projected quad (vertices in CCW order)
    pts = [(r["x"], r["y"]) for r in quad]
    area = 0.0
    for (x1, y1), (x2, y2) in zip(pts, pts[1:] + pts[:1]):
        area += x1 * y2 - x2 * y1
    area = abs(area) / 2.0
    r = ALBERS_CONUS.radius
    sphere = (
        r * r * math.radians(d)
        * (math.sin(math.radians(lat0 + d)) - math.sin(math.radians(lat0)))
    )
    assert abs(area - sphere) / sphere < 1e-3


def test_geoframe_reproject_std_noop_and_transform(spark, pts):
    gf = GeoFrame(
        pts.select(F.col("lon").alias("x"), F.col("lat").alias("y")),
        crs="EPSG:4326",
    )
    same = gf.reproject_std("EPSG:4326")
    assert same is gf  # chopin: no transform when CRS already matches
    alb = gf.reproject_std("SPHERE:ALBERS_CONUS")
    assert alb.crs == "SPHERE:ALBERS_CONUS"
    # projected magnitudes are meters (≥ 1e4), not degrees
    m = alb.df.select(F.max(F.abs("x")).alias("mx")).first()["mx"]
    assert m > 1e5
    with pytest.raises(ValueError):
        gf.reproject("EPSG:999999")


def test_reproject_to_aligns_crs(spark, pts):
    a = GeoFrame(pts.select(F.col("lon").alias("x"), F.col("lat").alias("y")))
    b = a.reproject("SPHERE:WEBMERC")
    c = a.reproject_to(b)
    assert c.crs == b.crs


def test_laea_roundtrip(spark):
    """LAEA forward→inverse roundtrip (the registry previously had no
    LAEA inverse — a one-way trap for reproject_std)."""
    import pandas as pd

    from chopin_spark.crs import GeoFrame

    pts = spark.createDataFrame(
        pd.DataFrame(
            {"x": [10.0, -5.0, 24.0, 10.0], "y": [52.0, 40.0, 60.0, 52.0]}
        )
    )
    gf = GeoFrame(pts, "EPSG:4326")
    back = gf.reproject("SPHERE:LAEA_EU").reproject_std()
    assert back.crs == "EPSG:4326"
    got = back.df.collect()
    want = pts.collect()
    for g, w in zip(sorted(got), sorted(want)):
        assert abs(g["x"] - w["x"]) < 1e-9 and abs(g["y"] - w["y"]) < 1e-9


# --- ellipsoidal Albers (EPSG:5070 exact) -----------------------------------


def test_albers_ellipsoidal_matches_snyder_example():
    """Snyder PP 1395, ellipsoidal Albers numerical example (Clarke
    1866, std parallels 29.5/45.5, origin 23/-96, point 35N 75W):
    x = 1885472.7 m, y = 1535925.0 m — external ground truth for the
    EPSG:5070 formula chain."""
    import math

    from chopin_spark.crs import AlbersEllParams

    p = AlbersEllParams(a=6378206.4, e2=0.00676866)
    rho = p.a * math.sqrt(p.big_c - p.n * p._q(35.0)) / p.n
    th = p.n * math.radians(-75.0 - p.lon0)
    x = rho * math.sin(th)
    y = p.rho0 - rho * math.cos(th)
    assert abs(x - 1885472.7) < 0.1
    assert abs(y - 1535925.0) < 0.1


def test_albers_ellipsoidal_sql_matches_python(spark):
    """The SQL text (Spark side) reproduces the driver-side python
    formula to sub-mm for GRS80/EPSG:5070 across the CONUS window."""
    import math

    from chopin_spark.crs import ALBERS_5070, albers_ell_xy_sql

    p = ALBERS_5070
    pts = [(-120.0, 30.0), (-96.0, 23.0), (-75.0, 45.0), (-67.0, 49.5)]
    xe, ye = albers_ell_xy_sql("lon", "lat")
    df = spark.createDataFrame(pts, "lon double, lat double").selectExpr(
        "lon", "lat", f"{xe} AS x", f"{ye} AS y"
    )
    for r in df.collect():
        rho = p.a * math.sqrt(p.big_c - p.n * p._q(r["lat"])) / p.n
        th = p.n * math.radians(r["lon"] - p.lon0)
        assert abs(r["x"] - rho * math.sin(th)) < 1e-3
        assert abs(r["y"] - (p.rho0 - rho * math.cos(th))) < 1e-3


def test_albers_ellipsoidal_vs_spherical_delta_documented(spark):
    """The ellipsoid-vs-sphere delta over CONUS is kilometers (max ~30
    km in y) — the quantitative gap docs/SCALE.md documents for the
    spherical workhorse; this pins it so the docs stay honest."""
    from chopin_spark.crs import albers_ell_xy_sql, albers_xy_sql

    sx_, sy_ = albers_xy_sql("lon", "lat")
    ex_, ey_ = albers_ell_xy_sql("lon", "lat")
    pts = [(-120.0, 30.0), (-96.0, 37.0), (-75.0, 45.0)]
    df = spark.createDataFrame(pts, "lon double, lat double").selectExpr(
        f"abs({sx_} - {ex_}) AS dx", f"abs({sy_} - {ey_}) AS dy"
    )
    for r in df.collect():
        assert r["dx"] < 60_000.0 and r["dy"] < 60_000.0


# --- ellipsoidal LAEA (EPSG:3035 exact) ---------------------------------------


def test_laea_ellipsoidal_matches_snyder_example():
    """Snyder PP 1395, ellipsoidal LAEA numerical example (Clarke 1866,
    center 40N/-100W, point 30N 110W): x = -965932.1 m,
    y = -1056814.9 m — external ground truth for the EPSG:3035 formula
    chain (false easting/northing zeroed to match Snyder's frame)."""
    import math

    from chopin_spark.crs import LaeaEllParams

    p = LaeaEllParams(
        a=6378206.4, e2=0.00676866, lat1=40.0, lon0=-100.0, fe=0.0, fn=0.0
    )
    sb = p._q(30.0) / p.qp
    cb = math.sqrt(1.0 - sb * sb)
    dl = math.radians(-110.0 - p.lon0)
    b = p.rq * math.sqrt(
        2.0 / (1.0 + p.sin_b1 * sb + p.cos_b1 * cb * math.cos(dl))
    )
    x = b * p.d * cb * math.sin(dl)
    y = (b / p.d) * (p.cos_b1 * sb - p.sin_b1 * cb * math.cos(dl))
    assert abs(x - -965932.1) < 0.1
    assert abs(y - -1056814.9) < 0.1


def test_laea_ellipsoidal_sql_matches_python(spark):
    """The SQL text (Spark side) reproduces the driver-side python
    formula to sub-mm for GRS80/EPSG:3035 across a Europe window, and
    the projection center maps exactly to the false origin."""
    import math

    from chopin_spark.crs import LAEA_3035, laea_ell_xy_sql

    p = LAEA_3035
    pts = [(-10.0, 35.0), (10.0, 52.0), (25.0, 60.0), (30.0, 70.0)]
    xe, ye = laea_ell_xy_sql("lon", "lat")
    df = spark.createDataFrame(pts, "lon double, lat double").selectExpr(
        "lon", "lat", f"{xe} AS x", f"{ye} AS y"
    )
    for r in df.collect():
        sb = p._q(r["lat"]) / p.qp
        cb = math.sqrt(1.0 - sb * sb)
        dl = math.radians(r["lon"] - p.lon0)
        b = p.rq * math.sqrt(
            2.0 / (1.0 + p.sin_b1 * sb + p.cos_b1 * cb * math.cos(dl))
        )
        assert abs(r["x"] - (p.fe + b * p.d * cb * math.sin(dl))) < 1e-3
        assert abs(
            r["y"]
            - (p.fn + (b / p.d) * (p.cos_b1 * sb - p.sin_b1 * cb * math.cos(dl)))
        ) < 1e-3
        if r["lon"] == p.lon0 and r["lat"] == p.lat1:
            assert abs(r["x"] - p.fe) < 1e-6 and abs(r["y"] - p.fn) < 1e-6


def test_laea_ellipsoidal_degenerates_to_sphere(spark):
    """With e² → 0 and matching center, the ellipsoidal LAEA collapses
    to the spherical Snyder 24-2..24-4 form (same radius, FE=FN=0) —
    a structural check that the authalic machinery is wired right."""
    from chopin_spark.crs import LaeaEllParams, laea_ell_xy_sql, laea_xy_sql

    # e²=1e-10 (not smaller): below that, the (1/2e)·ln((1−es)/(1+es))
    # term hits double-precision cancellation noise larger than the
    # genuine sphere-vs-ellipsoid delta being tested
    p0 = LaeaEllParams(e2=1e-10, fe=0.0, fn=0.0, lat1=52.0, lon0=10.0)
    ex_, ey_ = laea_ell_xy_sql("lon", "lat", p0)
    sx_, sy_ = laea_xy_sql("lon", "lat")
    pts = [(-10.0, 35.0), (10.0, 52.0), (25.0, 60.0), (30.0, 70.0)]
    df = spark.createDataFrame(pts, "lon double, lat double").selectExpr(
        f"abs({ex_} - ({sx_})) AS dx", f"abs({ey_} - ({sy_})) AS dy"
    )
    for r in df.collect():
        assert r["dx"] < 0.01 and r["dy"] < 0.01


def test_laea_ellipsoidal_equal_area_property():
    """|Jacobian| of the forward map equals the GRS80 ellipsoid area
    element a²(1−e²)cosφ/(1−e²sin²φ)² to 1e-6 relative — the defining
    property of an equal-area projection, checked by central finite
    differences at interior Europe points."""
    import math

    from chopin_spark.crs import LAEA_3035

    p = LAEA_3035

    def fwd(lon, lat):
        sb = p._q(lat) / p.qp
        cb = math.sqrt(1.0 - sb * sb)
        dl = math.radians(lon - p.lon0)
        b = p.rq * math.sqrt(
            2.0 / (1.0 + p.sin_b1 * sb + p.cos_b1 * cb * math.cos(dl))
        )
        return (
            b * p.d * cb * math.sin(dl),
            (b / p.d) * (p.cos_b1 * sb - p.sin_b1 * cb * math.cos(dl)),
        )

    h = 1e-5
    for lon, lat in [(0.0, 45.0), (10.0, 52.0), (20.0, 60.0), (-5.0, 40.0)]:
        x_e, y_e = fwd(lon + h, lat)
        x_w, y_w = fwd(lon - h, lat)
        x_n, y_n = fwd(lon, lat + h)
        x_s, y_s = fwd(lon, lat - h)
        dxdl = (x_e - x_w) / (2 * h)
        dydl = (y_e - y_w) / (2 * h)
        dxdp = (x_n - x_s) / (2 * h)
        dydp = (y_n - y_s) / (2 * h)
        jac = abs(dxdl * dydp - dxdp * dydl) * (180.0 / math.pi) ** 2
        s = math.sin(math.radians(lat))
        want = (
            p.a * p.a * (1.0 - p.e2) * math.cos(math.radians(lat))
            / (1.0 - p.e2 * s * s) ** 2
        )
        assert abs(jac - want) / want < 1e-6, (lon, lat, jac, want)


def test_utm_designator_published_vectors():
    """Interop pins: well-known city designators incl. both spec
    exceptions (Norway 32V widening, Svalbard X-band zones)."""
    from chopin_spark.crs import utm_py

    assert utm_py(-74.0060, 40.7128) == "18T"   # New York
    assert utm_py(2.2945, 48.8584) == "31U"     # Paris
    assert utm_py(-0.1278, 51.5074) == "30U"    # London
    assert utm_py(5.7331, 58.9700) == "32V"     # Stavanger: widened 32V
    assert utm_py(4.0, 55.9) == "31U"           # just south of V: no widening
    assert utm_py(15.6, 78.22) == "33X"         # Longyearbyen (Svalbard)
    assert utm_py(7.0, 79.0) == "31X"           # X band: 32 does not exist
    assert utm_py(34.0, 80.0) == "37X"
    assert utm_py(151.2093, -33.8688) == "56H"  # Sydney
    assert utm_py(0.0, 85.0) is None            # above band X
    assert utm_py(0.0, -80.5) is None           # below band C


def test_utm_sql_matches_python(spark):
    from chopin_spark.crs import utm_designator_sql, utm_py

    pts = [
        (-179.9 + i * 17.3, -79.5 + (i * 7.93) % 163.0) for i in range(21)
    ] + [(5.7331, 58.97), (15.6, 78.22), (7.0, 79.0), (2.2945, 48.8584),
         (0.0, 85.5), (11.9999, 63.9999), (12.0, 63.9999)]
    df = spark.createDataFrame(pts, "lon double, lat double").selectExpr(
        "lon", "lat", f"{utm_designator_sql('lon', 'lat')} AS utm"
    )
    for r in df.collect():
        assert r["utm"] == utm_py(r["lon"], r["lat"]), (r["lon"], r["lat"])


def test_ellipsoidal_inverse_roundtrips_under_2mm(spark):
    """EPSG:5070 and EPSG:3035 forward∘inverse must return the input
    lon/lat to ≤2e-8 deg (~2 mm on GRS80) across each CRS's domain —
    the Snyder 3-18 authalic series truncates at O(e^8)."""
    from chopin_spark.crs import (
        albers_ell_inverse_xy_sql, albers_ell_xy_sql,
        laea_ell_inverse_xy_sql, laea_ell_xy_sql,
    )

    for fwd, inv, lons, lats in (
        (albers_ell_xy_sql, albers_ell_inverse_xy_sql,
         [-125 + 5.5 * i for i in range(11)],
         [24 + 2.6 * j for j in range(11)]),
        (laea_ell_xy_sql, laea_ell_inverse_xy_sql,
         [-10 + 4.0 * i for i in range(11)],
         [35 + 3.5 * j for j in range(11)]),
    ):
        fx, fy = fwd("lon", "lat")
        il, ia = inv("px", "py")
        df = spark.createDataFrame(
            [(lo, la) for lo in lons for la in lats], "lon double, lat double"
        ).selectExpr("lon", "lat", f"{fx} AS px", f"{fy} AS py").selectExpr(
            "lon", "lat", f"{il} AS lon2", f"{ia} AS lat2"
        )
        r = df.selectExpr(
            "MAX(ABS(lon2 - lon)) AS dlon", "MAX(ABS(lat2 - lat)) AS dlat"
        ).collect()[0]
        assert r["dlon"] < 2e-8 and r["dlat"] < 2e-8, (fwd.__name__, r)


def test_snyder_inverse_worked_examples(spark):
    """Snyder PP1395's published Clarke-1866 inverse examples, 0.1 m
    class: Albers (x,y)=(1885472.7, 1535925.0) → (−75°, 35°); LAEA
    (φ1=40, λ0=−100) (x,y)=(−965932.1, −1056814.9) → (−110°, 30°).
    Inputs are printed to 0.1 m, so ≤3e-6 deg of slack is the input's
    own rounding, not the transform's."""
    from chopin_spark.crs import (
        AlbersEllParams, LaeaEllParams,
        albers_ell_inverse_xy_sql, laea_ell_inverse_xy_sql,
    )

    pa = AlbersEllParams(a=6378206.4, e2=0.00676866)
    il, ia = albers_ell_inverse_xy_sql("px", "py", pa)
    r = spark.createDataFrame(
        [(1885472.7, 1535925.0)], "px double, py double"
    ).selectExpr(f"{il} AS lon", f"{ia} AS lat").collect()[0]
    assert abs(r["lon"] - -75.0) < 3e-6 and abs(r["lat"] - 35.0) < 3e-6

    pl = LaeaEllParams(a=6378206.4, e2=0.00676866, lat1=40.0,
                       lon0=-100.0, fe=0.0, fn=0.0)
    il, ia = laea_ell_inverse_xy_sql("px", "py", pl)
    r = spark.createDataFrame(
        [(-965932.1, -1056814.9)], "px double, py double"
    ).selectExpr(f"{il} AS lon", f"{ia} AS lat").collect()[0]
    assert abs(r["lon"] - -110.0) < 3e-6 and abs(r["lat"] - 30.0) < 3e-6


def test_laea_inverse_false_origin_maps_to_center(spark):
    from chopin_spark.crs import LAEA_3035, laea_ell_inverse_xy_sql

    il, ia = laea_ell_inverse_xy_sql("px", "py")
    r = spark.createDataFrame(
        [(LAEA_3035.fe, LAEA_3035.fn)], "px double, py double"
    ).selectExpr(f"{il} AS lon", f"{ia} AS lat").collect()[0]
    assert abs(r["lon"] - LAEA_3035.lon0) < 1e-12  # exact ρ=0 branch
    # latitude goes through the 3-18 series: O(e^8) truncation ~3e-9°
    assert abs(r["lat"] - LAEA_3035.lat1) < 1e-8


# --- ellipsoidal Transverse Mercator / UTM (EPSG:32616 exact) -----------------


def test_tm_quarter_meridian_published_constant():
    """The meridian-arc series (Snyder 3-21) must reproduce the
    published WGS84 quarter meridian M(90°) = 10 001 965.729 m — the
    external ground truth the metre was historically derived from
    (1/10 000 000 of it, before the ellipsoid was refined)."""
    from chopin_spark.crs import UTM_16N

    assert abs(UTM_16N.meridian_arc(90.0) - 10_001_965.729) < 5e-3
    assert UTM_16N.meridian_arc(0.0) == 0.0


def test_tm_matches_snyder_example():
    """Snyder PP 1395 Transverse Mercator numerical example (Clarke
    1866, k0=0.9996, CM −75°, point 40°30′N 73°30′W): x = 127 106.5 m,
    y = 4 484 124.4 m (no false easting)."""
    from chopin_spark.crs import TMParams, tm_forward_py, tm_inverse_py

    p = TMParams(a=6378206.4, e2=0.00676866, k0=0.9996, lon0=-75.0,
                 fe=0.0, fn=0.0)
    x, y = tm_forward_py(-73.5, 40.5, p)
    assert abs(x - 127_106.5) < 0.5 and abs(y - 4_484_124.4) < 0.5
    lon, lat = tm_inverse_py(x, y, p)
    assert abs(lon - -73.5) < 1e-9 and abs(lat - 40.5) < 1e-8


def test_tm_central_meridian_exact():
    """On the CM: x = FE exactly, y = k0·M(φ) exactly; at the equator
    origin both are the false values."""
    from chopin_spark.crs import UTM_16N, tm_forward_py

    x0, y0 = tm_forward_py(-87.0, 0.0)
    assert x0 == 500000.0 and y0 == 0.0
    x, y = tm_forward_py(-87.0, 43.25)
    assert x == 500000.0
    assert abs(y - 0.9996 * UTM_16N.meridian_arc(43.25)) < 1e-9


def test_tm_symmetry_and_scale():
    """E/W mirror symmetry about the CM (same y, mirrored x) and N/S
    mirror about the equator; the point scale on the CM is k0 to 1e-6
    relative (measured against the exact parallel arc N·cosφ·dλ)."""
    import math

    from chopin_spark.crs import UTM_16N, tm_forward_py

    xe, ye = tm_forward_py(-84.2, 37.0)
    xw, yw = tm_forward_py(-89.8, 37.0)
    assert abs((xe - 500000.0) + (xw - 500000.0)) < 1e-6
    assert abs(ye - yw) < 1e-6
    xn, yn = tm_forward_py(-85.0, 33.0)
    xs, ys = tm_forward_py(-85.0, -33.0)
    assert abs(xn - xs) < 1e-9 and abs(yn + ys) < 1e-6

    lat, dl = 40.0, 1e-4
    a1 = tm_forward_py(-87.0, lat)
    a2 = tm_forward_py(-87.0 + dl, lat)
    s = math.sin(math.radians(lat))
    n_rad = UTM_16N.a / math.sqrt(1.0 - UTM_16N.e2 * s * s)
    arc = n_rad * math.cos(math.radians(lat)) * math.radians(dl)
    assert abs(abs(a2[0] - a1[0]) / arc - 0.9996) < 1e-6


def test_tm_sql_matches_python(spark):
    """The shared SQL text reproduces the driver-side python twin to
    sub-mm / 1e-11 deg across the zone-16 slab (both directions)."""
    from chopin_spark.crs import (
        tm_ell_inverse_xy_sql, tm_ell_xy_sql, tm_forward_py, tm_inverse_py,
    )

    pts = [(-90.0, 24.0), (-88.3, 31.7), (-87.0, 40.0), (-85.1, 47.3),
           (-84.0, 49.9), (-87.0, 0.5)]
    fx, fy = tm_ell_xy_sql("lon", "lat")
    df = spark.createDataFrame(pts, "lon double, lat double").selectExpr(
        "lon", "lat", f"{fx} AS x", f"{fy} AS y"
    )
    rows = df.collect()
    for r in rows:
        px, py = tm_forward_py(r["lon"], r["lat"])
        assert abs(r["x"] - px) < 1e-3 and abs(r["y"] - py) < 1e-3
    il, ia = tm_ell_inverse_xy_sql("x", "y")
    inv = df.selectExpr("lon", "lat", f"{il} AS lon2", f"{ia} AS lat2")
    for r in inv.collect():
        plo, pla = tm_inverse_py(*tm_forward_py(r["lon"], r["lat"]))
        assert abs(r["lon2"] - plo) < 1e-9 and abs(r["lat2"] - pla) < 1e-9


def test_tm_roundtrip_under_5mm(spark):
    """forward∘inverse returns the input to ≤5e-8 deg (~4 mm) across
    the zone-16 slab including the ±1° overlap margin (the measured
    worst is 3.9e-8° at the far corner, 4° from the CM at 50°N — the
    e^6/A^6 series truncation, not an implementation defect)."""
    from chopin_spark.crs import tm_ell_inverse_xy_sql, tm_ell_xy_sql

    fx, fy = tm_ell_xy_sql("lon", "lat")
    il, ia = tm_ell_inverse_xy_sql("px", "py")
    pts = [(-91.0 + 0.8 * i, 24.0 + 2.6 * j)
           for i in range(11) for j in range(11)]
    df = spark.createDataFrame(pts, "lon double, lat double").selectExpr(
        "lon", "lat", f"{fx} AS px", f"{fy} AS py"
    ).selectExpr("lon", "lat", f"{il} AS lon2", f"{ia} AS lat2")
    r = df.selectExpr(
        "MAX(ABS(lon2 - lon)) AS dlon", "MAX(ABS(lat2 - lat)) AS dlat"
    ).collect()[0]
    assert r["dlon"] < 5e-8 and r["dlat"] < 5e-8, r


def test_tm_geoframe_registry(spark):
    """EPSG:32616 is reachable both ways through the GeoFrame registry
    (reproject_std parity for the third projected family)."""
    from chopin_spark.crs import GeoFrame

    df = spark.createDataFrame([(-86.0, 35.0)], "x double, y double")
    gf = GeoFrame(df, crs="EPSG:4326").reproject("EPSG:32616")
    assert gf.crs == "EPSG:32616"
    back = gf.reproject("EPSG:4326").df.collect()[0]
    assert abs(back["x"] - -86.0) < 1e-7 and abs(back["y"] - 35.0) < 1e-7


def test_geodesic_direct_inverse_closure(spark):
    """Destination points must sit exactly 10 km (haversine, same
    sphere radius) from their origins, and the initial bearing
    recovered from the inverse must match the input bearing — the
    direct/inverse closure identity."""
    import math

    from chopin_spark.queries.crsq import _GD_R, _GD_SQL, _LAT, _LON
    from chopin_spark.tables import load

    load(spark, "/root/testdata/sf0.001", "documents").limit(
        200
    ).createOrReplaceTempView("documents")
    rows = spark.sql(
        f"SELECT doc_id, {_LON} AS lon, {_LAT} AS lat,"
        f" CAST((doc_id * 48271 + 11) % 360 AS DOUBLE) AS brg"
        " FROM documents"
    ).collect()
    dests = {r["doc_id"]: r for r in spark.sql(_GD_SQL).collect()}
    for r in rows:
        d = dests[r["doc_id"]]
        ph1, la1 = math.radians(r["lat"]), math.radians(r["lon"])
        ph2 = math.radians(d["dest_lat"])
        la2 = math.radians(d["dest_lon"])
        h = (math.sin((ph2 - ph1) / 2) ** 2
             + math.cos(ph1) * math.cos(ph2)
             * math.sin((la2 - la1) / 2) ** 2)
        dist = 2 * _GD_R * math.asin(math.sqrt(h))
        assert abs(dist - 10_000.0) < 0.5  # 1e-6 deg output rounding
        y = math.sin(la2 - la1) * math.cos(ph2)
        x = (math.cos(ph1) * math.sin(ph2)
             - math.sin(ph1) * math.cos(ph2) * math.cos(la2 - la1))
        brg = math.degrees(math.atan2(y, x)) % 360.0
        diff = abs(brg - r["brg"]) % 360.0
        assert min(diff, 360.0 - diff) < 0.01
