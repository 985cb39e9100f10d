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
