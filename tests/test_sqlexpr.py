"""sqlexpr unit tests evaluated in DuckDB (the oracle engine) — fast,
no Spark session needed."""

from __future__ import annotations

import duckdb
import pytest

from chopin_spark import sqlexpr as sx


@pytest.fixture(scope="module")
def con():
    return duckdb.connect()


def test_coords_in_extent(con):
    x, y = sx.x_expr("i"), sx.y_expr("i")
    rows = con.execute(
        f"SELECT MIN({x}), MAX({x}), MIN({y}), MAX({y}) "
        "FROM generate_series(1, 10000) t(i)"
    ).fetchone()
    assert 0 <= rows[0] and rows[1] < 800_000
    assert 0 <= rows[2] and rows[3] < 600_000


def test_grid_cell_half_open(con):
    # x exactly on a cell edge belongs to the right/upper cell
    expr = sx.grid_ix_expr("x", 8)
    r = con.execute(
        f"SELECT {expr} FROM (VALUES (100000.0), (99999.999), (0.0)) t(x)"
    ).fetchall()
    assert [v[0] for v in r] == [1, 0, 0]


def test_hex_disk_contains_self_and_six_neighbors(con):
    cell = sx.hex_cell_expr("x", "y", 40_000.0)
    disk = sx.hex_disk_expr(cell, k=1, ctor="LIST_VALUE")
    r = con.execute(
        f"SELECT {cell} AS c, {disk} AS d FROM (VALUES (CAST(123456.0 AS DOUBLE), CAST(234567.0 AS DOUBLE))) t(x, y)"
    ).fetchone()
    c, d = r
    assert c in d
    assert len(d) == 7  # center + 6 axial neighbors
    assert len(set(d)) == 7


def test_hex_disk_k2_size(con):
    cell = sx.hex_cell_expr("x", "y", 40_000.0)
    disk = sx.hex_disk_expr(cell, k=2, ctor="LIST_VALUE")
    (d,) = con.execute(
        f"SELECT {disk} FROM (VALUES (CAST(1.0 AS DOUBLE), CAST(1.0 AS DOUBLE))) t(x, y)"
    ).fetchone()
    assert len(set(d)) == 19  # 1 + 6 + 12


def test_hex_cells_partition_points(con):
    """Every point gets exactly one hex cell and nearby points share
    cells (sanity of the cube rounding)."""
    cell = sx.hex_cell_expr("x", "y", 40_000.0)
    n = con.execute(
        f"SELECT COUNT(DISTINCT {cell}) FROM "
        "(SELECT i * 1.7 AS x, i * 2.3 AS y FROM generate_series(1, 1000) t(i))"
    ).fetchone()[0]
    assert 1 <= n <= 10  # 1000 points in a ~2.3km strip: few hexes


def test_hex_parent_exactly_seven_children(con):
    """Aperture-7 lattice invariant: every interior parent hex covers
    exactly 7 child centers (center + 6-ring), the H3 parent-child
    contract."""
    rows = con.execute(
        f"""
WITH child AS (
  SELECT (CAST(q + 1048576 AS BIGINT) * 2097152
          + CAST(r + 1048576 AS BIGINT)) AS cell
  FROM generate_series(-80, 80) s(q), generate_series(-80, 80) t(r)
),
pc AS (SELECT cell, {sx.hex_parent_expr('cell')} AS parent FROM child),
cnt AS (SELECT parent, COUNT(*) AS n FROM pc GROUP BY 1)
SELECT n, COUNT(*) FROM cnt
WHERE ((CAST(FLOOR(parent / 2097152.0) AS BIGINT) - 1048576)
        BETWEEN -12 AND 12)
  AND ((parent % 2097152 - 1048576) BETWEEN -12 AND 12)
GROUP BY 1 ORDER BY 1
"""
    ).fetchall()
    assert rows == [(7, 625)]


def test_hex_parent_composes_to_grandparent(con):
    """Two parent hops coarsen by ~7 each (aperture-7), and children of
    one parent share that parent's grandparent with the parent itself."""
    n_cells, n_par, n_gpar = con.execute(
        f"""
WITH child AS (
  SELECT (CAST(q + 1048576 AS BIGINT) * 2097152
          + CAST(r + 1048576 AS BIGINT)) AS cell
  FROM generate_series(-40, 40) s(q), generate_series(-40, 40) t(r)
)
SELECT COUNT(DISTINCT cell),
       COUNT(DISTINCT {sx.hex_parent_expr('cell')}),
       COUNT(DISTINCT {sx.hex_parent_expr(sx.hex_parent_expr('cell'))})
FROM child
"""
    ).fetchone()
    assert 5.5 < n_cells / n_par < 8.5
    assert 5.5 < n_par / n_gpar < 8.5


def test_hex_parent_contains_child_center(con):
    """Geometric sanity: a child's center lies within one parent-hex
    circumradius (sqrt(7) * child size) of its parent's center, mapped
    back to child axial coords via M = [[2,-1],[1,3]]."""
    bad = con.execute(
        f"""
WITH child AS (
  SELECT q, r,
         (CAST(q + 1048576 AS BIGINT) * 2097152
          + CAST(r + 1048576 AS BIGINT)) AS cell
  FROM generate_series(-30, 30) s(q), generate_series(-30, 30) t(r)
),
pc AS (
  SELECT q, r,
         (CAST(FLOOR({sx.hex_parent_expr('cell')} / 2097152.0) AS BIGINT)
          - 1048576) AS pq,
         (({sx.hex_parent_expr('cell')} % 2097152) - 1048576) AS pr
  FROM child
),
back AS (
  -- parent center in child axial coords: M·(pq, pr)
  SELECT q, r, (2 * pq - pr) AS cq, (pq + 3 * pr) AS cr FROM pc
),
d AS (
  -- axial -> cartesian (unit hex): dx = sqrt(3)*(dq + dr/2), dy = 1.5*dr
  SELECT SQRT(POW(1.7320508 * ((q - cq) + (r - cr) / 2.0), 2)
              + POW(1.5 * (r - cr), 2)) AS dist
  FROM back
)
SELECT COUNT(*) FROM d WHERE dist > SQRT(7.0) * 1.0000001
"""
    ).fetchone()[0]
    assert bad == 0


def test_geohash_published_vectors():
    """Interop pins: tokens must match the published geohash examples
    (the same class of external ground truth as test_s2's cell pin)."""
    from chopin_spark.sqlexpr import geohash_py

    assert geohash_py(10.40744, 57.64911, 11) == "u4pruydqqvj"
    assert geohash_py(-5.603, 42.605, 5) == "ezs42"
    assert geohash_py(-0.1278, 51.5074, 6) == geohash_py(-0.1278, 51.5074, 7)[:6]


def test_geohash_sql_matches_python(spark):
    """The shared SQL text reproduces the reference encoder on a lon/
    lat sweep, in SPARK (DuckDB equality is exercised by the
    geohash_cell_rollup oracle)."""
    from chopin_spark.sqlexpr import (
        geohash_expr, geohash_latbits_expr, geohash_lonbits_expr, geohash_py,
    )

    pts = [
        (-124.9 + i * 9.7, 24.1 + (i * 2.63) % 25.0) for i in range(12)
    ] + [(10.40744, 57.64911), (-5.603, 42.605)]
    for p in (5, 8, 11):
        df = spark.createDataFrame(pts, "lon double, lat double").selectExpr(
            "lon", "lat",
            f"{geohash_lonbits_expr('lon', p)} AS lonb",
            f"{geohash_latbits_expr('lat', p)} AS latb",
        ).selectExpr("lon", "lat", f"{geohash_expr('lonb', 'latb', p)} AS gh")
        for r in df.collect():
            assert r["gh"] == geohash_py(r["lon"], r["lat"], p)


def test_xyz_tile_published_vectors():
    """Interop pins: the Bing Tile System doc example (x=3, y=5,
    level 3) -> quadkey '213'; the OSM wiki slippy-map Berlin example
    (13.4, 52.52) at z10 -> tile (550, 335); corner conventions."""
    from chopin_spark.sqlexpr import xyz_quadkey_py, xyz_tile_py

    assert xyz_quadkey_py(3, 5, 3) == "213"
    assert xyz_tile_py(13.4, 52.52, 10) == (550, 335)
    assert xyz_tile_py(0.0, 0.0, 1) == (1, 1)       # lat 0 is row 2^z/2
    assert xyz_tile_py(-180.0, 89.0, 4) == (0, 0)   # clamped above max lat
    assert xyz_tile_py(179.999, -89.0, 4) == (15, 15)


def test_xyz_tile_sql_matches_python(spark):
    """The sine-ladder ty + arithmetic tx reproduce the reference
    encoder, and quadkey prefix == parent tile at z-1."""
    from chopin_spark.sqlexpr import (
        xyz_quadkey_expr, xyz_quadkey_py, xyz_tile_py, xyz_tx_expr,
        xyz_ty_expr,
    )

    pts = [
        (-179.3 + i * 23.7, -84.0 + (i * 11.93) % 168.0) for i in range(15)
    ] + [(13.4, 52.52), (0.0, 0.0), (-122.4183, 37.7753)]
    z = 6
    df = spark.createDataFrame(pts, "lon double, lat double").selectExpr(
        "lon", "lat",
        f"{xyz_tx_expr('lon', z)} AS tx",
        f"{xyz_ty_expr('lat', z)} AS ty",
    ).selectExpr("lon", "lat", "tx", "ty",
                 f"{xyz_quadkey_expr('tx', 'ty', z)} AS qk")
    for r in df.collect():
        etx, ety = xyz_tile_py(r["lon"], r["lat"], z)
        assert (r["tx"], r["ty"]) == (etx, ety), (r["lon"], r["lat"])
        qk = xyz_quadkey_py(etx, ety, z)
        assert r["qk"] == qk
        # prefix property: z-1 parent tile
        assert qk[: z - 1] == xyz_quadkey_py(etx >> 1, ety >> 1, z - 1)


def test_xyz_ty_boundary_neighborhood_cross_engine(spark):
    """ADVICE r03: tile-row assignment at latitudes within a few ulps
    of every z=4 row boundary must agree between Spark and DuckDB
    exactly — guaranteed by construction now (raw-lat-vs-literal
    compares, no query-time trig), pinned here against regression."""
    import math

    import duckdb

    from chopin_spark.sqlexpr import _xyz_row_boundary_lat, xyz_ty_expr

    z = 4
    lats = []
    for k in range(1, 1 << z):
        b = _xyz_row_boundary_lat(k, z)
        for step in (-3, -2, -1, 0, 1, 2, 3):
            v = b
            for _ in range(abs(step)):
                v = math.nextafter(v, math.inf if step > 0 else -math.inf)
            lats.append(v)
    expr = xyz_ty_expr("lat", z)
    got_spark = [
        r.ty for r in spark.createDataFrame(
            [(v,) for v in lats], "lat double"
        ).selectExpr(f"{expr} AS ty").collect()
    ]
    con = duckdb.connect()
    got_duck = [
        con.execute(
            f"SELECT {expr} FROM (SELECT ?::DOUBLE AS lat)", [v]
        ).fetchone()[0]
        for v in lats
    ]
    assert got_spark == got_duck
    # boundary itself counts into row k (<= semantics)
    for k in range(1, 1 << z):
        b = _xyz_row_boundary_lat(k, z)
        i = lats.index(b)
        assert got_spark[i] == k, (k, got_spark[i])


def test_hilbert_chain_matches_bitwise_reference():
    """The arithmetic-only unrolled xy2d chain equals the classic
    bitwise loop on the full order-5 grid, is a bijection, and
    consecutive d are rook-adjacent (THE Hilbert property Z-order
    lacks)."""
    import duckdb

    order, n = 5, 32
    chain = sx.hilbert_chain_sql(order, "gx, gy", "src")
    sql = f"""
    WITH src AS (
      SELECT g1.gx, g2.gy, g1.gx AS hx, g2.gy AS hy
      FROM generate_series(0, {n - 1}) g1(gx),
           generate_series(0, {n - 1}) g2(gy)
    ),
    {chain}
    SELECT gx, gy, hd FROM hfin
    """
    rows = duckdb.connect().execute(sql).fetchall()
    assert len(rows) == n * n
    by_d = {}
    for gx, gy, hd in rows:
        assert hd == sx.hilbert_d_py(order, gx, gy), (gx, gy, hd)
        by_d[hd] = (gx, gy)
    assert sorted(by_d) == list(range(n * n))  # bijection
    for d in range(n * n - 1):
        (x1, y1), (x2, y2) = by_d[d], by_d[d + 1]
        assert abs(x1 - x2) + abs(y1 - y2) == 1, (d, by_d[d], by_d[d + 1])


def test_hilbert_chain_spark_matches_duckdb(spark):
    """Same chain text, same hd values, on Spark — mod/CASE semantics
    agree engine-to-engine (no bitwise ops anywhere in the text)."""
    order, n = 4, 16
    chain = sx.hilbert_chain_sql(order, "gx, gy", "src")
    sql = f"""
    WITH src AS (
      SELECT gx, gy, gx AS hx, gy AS hy
      FROM (SELECT explode(sequence(0, {n - 1})) AS gx)
      CROSS JOIN (SELECT explode(sequence(0, {n - 1})) AS gy)
    ),
    {chain}
    SELECT gx, gy, hd FROM hfin
    """
    for r in spark.sql(sql).collect():
        assert r.hd == sx.hilbert_d_py(order, r.gx, r.gy), (r.gx, r.gy)
