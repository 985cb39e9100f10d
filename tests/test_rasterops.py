"""Resample / aggregate-blocks / distance-raster: full-grid numpy
replays independent of the DuckDB oracles (the parity gate is the
third check)."""

from __future__ import annotations

import numpy as np
import pytest

from chopin_spark.raster import (
    NPX, NPY, RNX, RNY, TILE, TNX, TNY, V_MOD, V_MX, V_MY,
    aggregate_blocks_tiles, raster_tiles_df, resample_bilinear_tiles,
    resample_src_coords,
)


def _full_grid() -> np.ndarray:
    gi = np.arange(NPX, dtype=np.int64)
    gj = np.arange(NPY, dtype=np.int64)
    return (gi[None, :] * V_MX + gj[:, None] * V_MY) % V_MOD  # [j, i]


def _resample_replay():
    """Whole-raster bilinear numerators, no tiling — the independent
    path the distributed halo version must reproduce."""
    v = _full_grid()
    i0, fx = resample_src_coords(np.arange(RNX))
    j0, fy = resample_src_coords(np.arange(RNY))
    FX, FY = fx[None, :], fy[:, None]
    num = (
        v[j0[:, None], i0[None, :]] * (10 - FX) * (10 - FY)
        + v[j0[:, None], i0[None, :] + 1] * FX * (10 - FY)
        + v[j0[:, None] + 1, i0[None, :]] * (10 - FX) * FY
        + v[j0[:, None] + 1, i0[None, :] + 1] * FX * FY
    )
    return num, i0, j0


def test_resample_coords_in_bounds():
    i0, fx = resample_src_coords(np.arange(RNX))
    j0, fy = resample_src_coords(np.arange(RNY))
    # +1 neighbors never leave the raster: no edge clamping needed
    assert i0.min() >= 0 and i0.max() + 1 <= NPX - 1
    assert j0.min() >= 0 and j0.max() + 1 <= NPY - 1
    assert set(np.unique(fx)) <= {1, 3, 5, 7, 9}


def test_resample_matches_full_grid_replay(spark):
    num, i0, j0 = _resample_replay()
    tile_of = (j0[:, None] // TILE) * TNX + (i0[None, :] // TILE)
    wt = (
        np.arange(RNX)[None, :] * 31 + np.arange(RNY)[:, None] * 17
    ) % 97
    got = {
        r.tile_id: (r.n_tgt, r.num_sum, r.num_chk)
        for r in resample_bilinear_tiles(
            raster_tiles_df(spark)
        ).collect()
    }
    assert sum(g[0] for g in got.values()) == RNX * RNY
    for tid in np.unique(tile_of):
        sel = tile_of == tid
        assert got[tid] == (
            int(sel.sum()),
            int(num[sel].sum()),
            int((num * wt)[sel].sum()),
        )


def test_aggregate_blocks_matches_full_grid_replay(spark):
    v = _full_grid()
    b = v.reshape(NPY // 4, 4, NPX // 4, 4)
    bmax, bmin = b.max(axis=(1, 3)), b.min(axis=(1, 3))
    fB = TILE // 4
    bi = np.arange(NPX // 4)[None, :]
    bj = np.arange(NPY // 4)[:, None]
    tile_of = (bj // fB) * TNX + (bi // fB)
    wt = (bi * 13 + bj * 7) % 31
    rows = aggregate_blocks_tiles(raster_tiles_df(spark), factor=4).collect()
    assert len(rows) == TNX * TNY
    got = {
        r.tile_id: (r.n_blocks, r.sum_bmax, r.sum_bmin, r.chk)
        for r in rows
    }
    for tid in np.unique(tile_of):
        sel = np.broadcast_to(tile_of, bmax.shape) == tid
        assert got[tid] == (
            int(sel.sum()),
            int(bmax[sel].sum()),
            int(bmin[sel].sum()),
            int(((bmax - bmin) * wt)[sel].sum()),
        )


def test_aggregate_blocks_rejects_bad_factor(spark):
    with pytest.raises(ValueError):
        aggregate_blocks_tiles(raster_tiles_df(spark), factor=5)


def test_distance_to_poi_brute_force(spark):
    """Engine distance raster == numpy brute force at sf0.001."""
    import duckdb

    from chopin_spark.queries.rasterops import raster_distance_to_poi
    from tests.conftest import SF_SMOKE

    got = {
        r.bucket: (r.n_px, r.sum_dist_mm, round(r.max_dist, 4))
        for r in raster_distance_to_poi(spark, SF_SMOKE).collect()
    }
    from chopin_spark.queries.rasterops import (
        _PX, _PY, _SNX, _SNY, _SSTEP,
    )
    from chopin_spark.raster import PH, PW

    con = duckdb.connect()
    pois = con.execute(
        f"SELECT {_PX}, {_PY} FROM "
        f"'{SF_SMOKE}/part.parquet'"
    ).fetchnumpy()
    px_, py_ = list(pois.values())
    i = np.arange(_SNX)[None, :]
    j = np.arange(_SNY)[:, None]
    x = (i * _SSTEP + 4 + 0.5) * PW
    y = (j * _SSTEP + 4 + 0.5) * PH
    d = np.sqrt(
        (x[..., None] - px_) ** 2 + (y[..., None] - py_) ** 2
    ).min(axis=-1)
    pix = j * _SNX + i
    bucket = np.broadcast_to(pix % 64, d.shape)
    for b in range(64):
        sel = bucket == b
        assert got[b][0] == int(sel.sum())
        assert got[b][1] == int(np.floor(d[sel] * 1000 + 0.5).sum())
        assert got[b][2] == round(float(d[sel].max()), 4)


def test_morph_open_matches_whole_raster_numpy(spark):
    """Two chained strip-halo stencil passes == a single whole-raster
    numpy erosion+dilation; opening is anti-extensive."""
    import numpy as np

    from chopin_spark.queries.zonal import _tiles, raster_morph_open
    from chopin_spark.raster import NPX, NPY, TILE, TNX, tile_values

    # whole-raster reference
    full = np.empty((NPY, NPX), dtype=np.int64)
    for tr in range(NPY // TILE):
        for tc in range(NPX // TILE):
            full[tr * TILE:(tr + 1) * TILE, tc * TILE:(tc + 1) * TILE] = \
                tile_values(0, tr, tc)

    def morph(a, fn, sentinel):
        p = np.full((NPY + 2, NPX + 2), sentinel, dtype=np.int64)
        p[1:-1, 1:-1] = a
        stk = np.stack([p[r:r + NPY, c:c + NPX]
                        for r in range(3) for c in range(3)])
        return fn(stk, axis=0)

    big = np.iinfo(np.int64).max
    opened = morph(morph(full, np.min, big), np.max, -big)
    assert (opened <= full).all()  # anti-extensive

    ref = {}
    for tr in range(NPY // TILE):
        for tc in range(NPX // TILE):
            blk = opened[tr * TILE:(tr + 1) * TILE,
                         tc * TILE:(tc + 1) * TILE]
            org = full[tr * TILE:(tr + 1) * TILE,
                       tc * TILE:(tc + 1) * TILE]
            ref[tr * TNX + tc] = (int(blk.sum()), int((blk < org).sum()))

    rows = raster_morph_open(spark, "").collect()
    assert len(rows) == len(ref)
    for r in rows:
        assert ref[r.tile_id] == (r.open_sum, r.n_lowered), r.tile_id


def test_halo_joined_r2_assembles_true_window(spark):
    """assemble_padded_r(r=2) of an interior tile must equal the
    ground-truth 36×36 pixel window computed straight from the value
    function (corners are r×r blocks now — the part radius-1 never
    exercised); boundary tiles mask out-of-raster pixels."""
    import numpy as np

    from chopin_spark.queries.zonal import _tiles
    from chopin_spark.raster import (
        TILE, TNX, assemble_padded_r, halo_joined_r, tile_values,
    )

    rows = {
        r["tile_id"]: r
        for r in halo_joined_r(_tiles(spark, n_rasters=1), 2).collect()
    }
    for tr, tc in [(3, 5), (0, 0), (1, 0)]:
        row = rows[tr * TNX + tc]
        p, m = assemble_padded_r(row, 2)
        gi0, gj0 = tc * TILE - 2, tr * TILE - 2
        for jj in range(TILE + 4):
            for ii in range(TILE + 4):
                gi, gj = gi0 + ii, gj0 + jj
                inb = 0 <= gi < 1024 and 0 <= gj < 768
                assert m[jj, ii] == (1 if inb else 0)
        # interior equality against the direct value function
        full = tile_values(0, tr, tc)
        assert np.array_equal(p[2:-2, 2:-2], full)
        if tr == 3 and tc == 5:
            assert m.all()  # interior tile: complete halo
