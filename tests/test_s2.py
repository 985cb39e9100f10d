"""Real S2 cell-id layer: library invariants, ecosystem interop
(known-region tokens), and bit-equality of the three evaluation paths
(numpy / DuckDB SQL / Spark SQL — the latter pinned via the oracle
gate on s2_cell_rollup, plus a direct check here)."""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd
import pytest

from chopin_spark import s2
from chopin_spark.s2sql import s2_prefix_sql

RNG = np.random.RandomState(20260816)


def test_face_cell_tokens():
    # level-0 cells are the 6 cube faces; their tokens are fixed by the
    # id layout — matches the S2 ecosystem ("1", "3", ..., "b").
    ids = s2.cell_id(
        np.arange(6), np.zeros(6, np.int64), np.zeros(6, np.int64), level=0
    )
    assert s2.token(ids) == ["1", "3", "5", "7", "9", "b"]


def test_known_region_token_interop():
    # NYC (40.7128 N, 74.0060 W): every public S2 library puts lower
    # Manhattan under the level-12 cell with token prefix 89c25 —
    # bit-compatibility smoke check against the real ecosystem.
    cid = s2.cell_id_from_lonlat(
        np.array([-74.0060]), np.array([40.7128]), s2.MAX_LEVEL
    )
    assert s2.token(cid)[0].startswith("89c25")


def test_hilbert_roundtrip():
    f = RNG.randint(0, 6, 2000)
    i = RNG.randint(0, 1 << 14, 2000)
    j = RNG.randint(0, 1 << 14, 2000)
    pos = s2.pos_from_ij(f, i, j, 14)
    i2, j2 = s2.ij_from_pos(f, pos, 14)
    assert np.array_equal(i, i2) and np.array_equal(j, j2)


def test_hilbert_continuity():
    # The defining Hilbert property: consecutive curve positions are
    # 4-adjacent cells.  Validates both orientation tables at once.
    for face in (0, 3, 5):
        pos = np.arange(1 << 10, dtype=np.uint64)
        i, j = s2.ij_from_pos(np.full(1 << 10, face), pos, 5)
        assert np.all(np.abs(np.diff(i)) + np.abs(np.diff(j)) == 1)


def test_parent_level_range():
    lon = RNG.uniform(-180, 180, 1000)
    lat = RNG.uniform(-89, 89, 1000)
    leaf = s2.cell_id_from_lonlat(lon, lat, s2.MAX_LEVEL)
    assert np.all(s2.cell_level(leaf) == 30)
    for lvl in (4, 10, 21):
        par = s2.parent(leaf, lvl)
        assert np.all(s2.cell_level(par) == lvl)
        assert np.all(
            (s2.range_min(par) <= leaf) & (leaf <= s2.range_max(par))
        )
        # parent of the directly-computed child == directly-computed parent
        f, u, v = s2.xyz_to_face_uv(*s2.lonlat_to_xyz(lon, lat))
        i = s2.st_to_ij(s2.uv_to_st(u), lvl)
        j = s2.st_to_ij(s2.uv_to_st(v), lvl)
        assert np.array_equal(par, s2.cell_id(f, i, j, lvl))


def test_prefix_is_shift_of_cell_id():
    lon = RNG.uniform(-180, 180, 500)
    lat = RNG.uniform(-85, 85, 500)
    for lvl in (8, 15):
        cid = s2.cell_id_from_lonlat(lon, lat, lvl)
        pref = s2.prefix_from_cell_id(cid, lvl)
        back = (pref.astype(np.uint64) << np.uint64(61 - 2 * lvl)) | (
            np.uint64(1) << np.uint64(60 - 2 * lvl)
        )
        assert np.array_equal(back, cid)
        # prefix hierarchy: level-(L-2) parent prefix == prefix >> 4
        par = s2.prefix_from_cell_id(s2.parent(cid, lvl - 2), lvl - 2)
        assert np.array_equal(par, pref >> 4)


def test_sql_twin_matches_numpy_duckdb():
    lon = RNG.uniform(-180, 180, 30000)
    lat = RNG.uniform(-89.9, 89.9, 30000)
    con = duckdb.connect()
    con.register("pts", pd.DataFrame({"lon": lon, "lat": lat}))
    got = con.sql(
        "SELECT s2_face, s2_i, s2_j, s2_prefix FROM ("
        + s2_prefix_sql("pts", "lon", "lat", 8)
        + ")"
    ).fetchnumpy()
    f, u, v = s2.xyz_to_face_uv(*s2.lonlat_to_xyz(lon, lat))
    i = s2.st_to_ij(s2.uv_to_st(u), 8)
    j = s2.st_to_ij(s2.uv_to_st(v), 8)
    pref = s2.prefix_from_cell_id(s2.cell_id(f, i, j, 8), 8)
    assert np.array_equal(got["s2_face"], f)
    assert np.array_equal(got["s2_i"], i)
    assert np.array_equal(got["s2_j"], j)
    assert np.array_equal(got["s2_prefix"], pref)


def test_sql_twin_matches_numpy_spark(spark):
    pdf = pd.DataFrame(
        {"lon": RNG.uniform(-130, -60, 5000), "lat": RNG.uniform(20, 50, 5000)}
    )
    sdf = spark.createDataFrame(pdf)
    sdf.createOrReplaceTempView("_s2pts")
    got = (
        spark.sql(
            "SELECT s2_prefix FROM ("
            + s2_prefix_sql("_s2pts", "lon", "lat", 8)
            + ")"
        )
        .toPandas()["s2_prefix"]
        .to_numpy()
    )
    cid = s2.cell_id_from_lonlat(pdf["lon"].to_numpy(), pdf["lat"].to_numpy(), 8)
    assert np.array_equal(np.sort(got), np.sort(s2.prefix_from_cell_id(cid, 8)))


def test_covering_superset_property():
    # every point inside the rect must map to a cell in the expanded
    # covering — this is what makes the covering join prefilter exact
    a, b, c, d = -112.0, -103.0, 37.0, 41.0
    ids = s2.expand_covering(
        s2.covering_cells_for_rect(a, b, c, d, 8, samples=160)
    )
    pref = set(int(p) for p in s2.prefix_from_cell_id(ids, 8))
    lon = RNG.uniform(a, b, 20000)
    lat = RNG.uniform(c, d, 20000)
    pts = s2.prefix_from_cell_id(s2.cell_id_from_lonlat(lon, lat, 8), 8)
    assert set(int(p) for p in pts) <= pref


def test_edge_coordinates():
    # poles, dateline, equator/meridian crossings, face centers — the
    # coordinates where face selection and u/v signs are most fragile
    lon = np.array([0.0, 180.0, -180.0, 90.0, -90.0, 0.0, 0.0, 45.0, 135.0])
    lat = np.array([0.0, 0.0, 0.0, 0.0, 0.0, 90.0, -90.0, 35.26, -35.26])
    cid = s2.cell_id_from_lonlat(lon, lat, 30)
    f, u, v = s2.xyz_to_face_uv(*s2.lonlat_to_xyz(lon, lat))
    # face centers land on the right faces
    assert f[0] == 0 and f[3] == 1 and f[4] == 4
    assert f[5] == 2 and f[6] == 5
    assert (f[1], f[2]) == (3, 3)  # both spellings of the antimeridian
    # every id is a valid leaf and round-trips through face/i/j
    assert np.all(s2.cell_level(cid) == 30)
    f2, i2, j2, _ = s2.face_ij_from_cell_id(cid)
    assert np.array_equal(cid, s2.cell_id(f2, i2, j2, 30))
    # u,v stay inside the face square at these extremes
    assert np.all(np.abs(u) <= 1.0 + 1e-12) and np.all(np.abs(v) <= 1.0 + 1e-12)


def test_face_uv_to_xyz_roundtrip():
    rng = np.random.RandomState(5)
    f = rng.randint(0, 6, 4000)
    u = rng.uniform(-0.999, 0.999, 4000)
    v = rng.uniform(-0.999, 0.999, 4000)
    x, y, z = s2.face_uv_to_xyz(f, u, v)
    f2, u2, v2 = s2.xyz_to_face_uv(x, y, z)
    assert np.array_equal(f, f2)
    assert np.allclose(u, u2, atol=1e-12) and np.allclose(v, v2, atol=1e-12)


def test_wrap_identity_for_interior_cells():
    f = RNG.randint(0, 6, 5000)
    n = 1 << 8
    i = RNG.randint(0, n, 5000)
    j = RNG.randint(0, n, 5000)
    f2, i2, j2 = s2.wrap_face_ij(f, i, j, 8)
    assert np.array_equal(f, f2)
    assert np.array_equal(i, i2) and np.array_equal(j, j2)


def test_wrap_crosses_face_boundary():
    # points straddling the face-4/face-2 boundary (tan(lat)=|sin lon|)
    # must be in each other's wrapped 3×3 disks — adjacency continues
    # across the cube edge, symmetrically
    lon = RNG.uniform(-120, -60, 500)
    lat_b = np.degrees(np.arctan(np.abs(np.sin(np.radians(lon)))))
    below = s2.cell_id_from_lonlat(lon, lat_b - 0.03, 8)
    above = s2.cell_id_from_lonlat(lon, lat_b + 0.03, 8)
    fa, _, _, _ = s2.face_ij_from_cell_id(below)
    fb, _, _, _ = s2.face_ij_from_cell_id(above)
    cross = fa != fb
    assert cross.sum() > 100
    for a, b in zip(below[cross][:60], above[cross][:60]):
        da = s2.expand_covering(np.array([a], dtype=np.uint64), wrap=True)
        db = s2.expand_covering(np.array([b], dtype=np.uint64), wrap=True)
        assert b in da and a in db


def test_token_roundtrip_format():
    ids = s2.cell_id_from_lonlat(
        RNG.uniform(-180, 180, 100), RNG.uniform(-80, 80, 100), 12
    )
    for t, cid in zip(s2.token(ids), ids):
        assert int(t.ljust(16, "0"), 16) == int(cid)
