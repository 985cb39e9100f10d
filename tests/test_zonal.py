"""Zonal/kernel tests: reference-pinned golden kernel values
(/root/reference/tests/testthat/test-processing.R:986-1010) and
structural invariants of the tile table + extract_at."""

from __future__ import annotations

import numpy as np
import pytest

from chopin_spark.kernels import kernel_np
from chopin_spark.raster import TILE, TNX, TNY, tile_values


GOLDEN = {
    # d = (0, 5, 10, 15), bw = 10 — exact reference values
    "uniform": [0.5, 0.5, 0.5, 0.0],
    "quartic": [0.9375, 0.52734375, 0.0, 0.0],
    "triweight": [1.0, 0.875, 0.0, 0.0],
    "epanechnikov": [0.75, 0.5625, 0.0, 0.0],
}


@pytest.mark.parametrize("kernel,want", GOLDEN.items())
def test_kernel_golden_values(kernel, want):
    d = np.array([0.0, 5.0, 10.0, 15.0])
    got = kernel_np(d, 10.0, kernel)
    np.testing.assert_allclose(got, want, atol=1e-8)


def test_kernel_unknown_errors():
    with pytest.raises(ValueError):
        kernel_np(np.array([1.0]), 10.0, "hyperbolic")


def test_tile_values_deterministic_and_int():
    a = tile_values(0, 3, 7)
    b = tile_values(0, 3, 7)
    assert a.shape == (TILE, TILE)
    assert a.dtype == np.int64
    np.testing.assert_array_equal(a, b)
    assert (a >= 0).all() and (a < 1_000_003).all()
    # different raster id → different values
    assert (tile_values(1, 3, 7) != a).any()


def test_extract_at_tract_pixel_counts(spark):
    """Each tract is 64×48 aligned pixels → exactly 3072 per tract, and
    the global pixel budget (1024×768) is partitioned exactly."""
    from chopin_spark import zones as Z
    from chopin_spark.raster import extract_at, raster_tiles_df

    tiles = raster_tiles_df(spark, n_rasters=1)
    rects = Z.zones_df(spark).select("zone_id", "xmin", "ymin", "xmax", "ymax")
    out = extract_at(tiles, rects, rect_id="zone_id").collect()
    assert len(out) == 256
    assert all(r["n_pixels"] == 64 * 48 for r in out)
    assert sum(r["n_pixels"] for r in out) == 1024 * 768
    assert TNX * TNY == 768


def test_kernel_weighting_uniform_identity(spark):
    """Reference testthat golden: .kernel_weighting with a uniform
    kernel and full coverage returns the extracted values unchanged
    (/root/reference/tests/testthat/test-processing.R:520-544,
    expect ret$value == c(10, 20)).  Engine equivalent: extract_at
    with kernel='uniform' and bandwidth covering every pixel equals
    the unweighted zonal mean — constant weights cancel."""
    import pandas as pd

    from chopin_spark.raster import extract_at, raster_tiles_df

    tiles = raster_tiles_df(spark, n_rasters=1)
    rects = spark.createDataFrame(
        pd.DataFrame(
            {
                "pid": ["p1", "p2"],
                "xmin": [100_000.0, 400_000.0],
                "ymin": [100_000.0, 300_000.0],
                "xmax": [140_000.0, 440_000.0],
                "ymax": [140_000.0, 340_000.0],
                "cx": [120_000.0, 420_000.0],
                "cy": [120_000.0, 320_000.0],
            }
        )
    )
    plain = {
        r["pid"]: (r["mean_val"], r["n_pixels"])
        for r in extract_at(tiles, rects, rect_id="pid").collect()
    }
    uniform = {
        r["pid"]: (r["mean_val"], r["n_pixels"])
        for r in extract_at(
            tiles, rects, rect_id="pid",
            kernel="uniform", bandwidth=10_000_000.0,
        ).collect()
    }
    assert plain == uniform and set(plain) == {"p1", "p2"}


def test_focal_sum_matches_full_raster_numpy(spark):
    """Distributed stencil (strip halos) == single-array convolution on
    the whole raster, and invariant to input partitioning."""
    import numpy as np

    from chopin_spark.raster import (
        NPX, NPY, TILE, TNX, V_MOD, V_MX, V_MY,
        focal_sum_tiles, raster_tiles_df,
    )

    gi = np.arange(NPX, dtype=np.int64)
    gj = np.arange(NPY, dtype=np.int64)
    full = (gi[None, :] * V_MX + gj[:, None] * V_MY) % V_MOD  # [j, i]
    pad = np.zeros((NPY + 2, NPX + 2), dtype=np.int64)
    msk = np.zeros_like(pad)
    pad[1:-1, 1:-1] = full
    msk[1:-1, 1:-1] = 1
    focal = sum(
        pad[a : a + NPY, b : b + NPX] for a in range(3) for b in range(3)
    )
    cnt = sum(
        msk[a : a + NPY, b : b + NPX] for a in range(3) for b in range(3)
    )
    tj, ti = gj[:, None] // TILE, gi[None, :] // TILE
    tids = (tj * TNX + ti).ravel()
    want_sum = {}
    want_full = {}
    for t, f, c in zip(tids, focal.ravel(), (cnt == 9).ravel()):
        want_sum[t] = want_sum.get(t, 0) + int(f)
        want_full[t] = want_full.get(t, 0) + int(c)

    for parts in (1, 16):
        tiles = raster_tiles_df(spark, n_rasters=1).repartition(parts)
        got = {
            r["tile_id"]: (r["focal_sum"], r["n_full"])
            for r in focal_sum_tiles(tiles).collect()
        }
        assert len(got) == TNX * (NPY // TILE)
        for t, (fs, nf) in got.items():
            assert fs == want_sum[t] and nf == want_full[t]


def test_frac_quant_margin_certificate():
    """The FRAC_QUANT=4096 lattice is provably flip-free for the
    octagon fixture: every boundary pixel's closed-form coverage sits
    ≥ 0.1 quantized units from a FLOOR(+0.5) boundary while the
    S-H-vs-closed-form drift is ≤ 1e-5 units — the offline certificate
    the raster.extract_at_polygons_frac docstring promises."""
    import numpy as np

    from chopin_spark.geom.core import clip_polygon_rect, polygon_area
    from chopin_spark.queries.polygons import _CX, _CY, octagon_ring
    from chopin_spark.raster import FRAC_QUANT, PH, PW
    import chopin_spark.zones as Z

    W, H = Z.TRACT_W, Z.TRACT_H
    cxcy = _CX * _CY

    def tri_cut(u0, u1, v0, v1):
        ua = min(max((cxcy - _CX * v1) / _CY, u0), u1)
        ub = min(max((cxcy - _CX * v0) / _CY, u0), u1)
        h = lambda u: (cxcy - _CY * u) / _CX  # noqa: E731
        return (ua - u0) * (v1 - v0) + (ub - ua) * (
            (h(ua) + h(ub)) / 2.0 - v0
        )

    ring = octagon_ring(0.0, 0.0, W, H)
    area_px = PW * PH
    worst_margin, worst_drift = 1.0, 0.0
    for i in range(int(W / PW)):
        for j in range(int(H / PH)):
            u0, v0 = i * PW, j * PH
            u1, v1 = u0 + PW, v0 + PH
            cf = area_px - (
                tri_cut(u0, u1, v0, v1)
                + tri_cut(W - u1, W - u0, v0, v1)
                + tri_cut(u0, u1, H - v1, H - v0)
                + tri_cut(W - u1, W - u0, H - v1, H - v0)
            )
            clipped = clip_polygon_rect(ring, u0, v0, u1, v1)
            sh = polygon_area(clipped) if len(clipped) >= 3 else 0.0
            worst_drift = max(worst_drift, abs(cf - sh) / area_px * FRAC_QUANT)
            if 1e-9 < cf < area_px - 1e-9:
                f = (cf / area_px * FRAC_QUANT + 0.5) % 1.0
                worst_margin = min(worst_margin, min(f, 1.0 - f))
    assert worst_margin > 0.1
    assert worst_drift < 1e-5
    assert worst_margin > 100 * worst_drift


def test_median_query_invariants(spark):
    """Exact zonal median/p90 vs a numpy replay: the sorted multiset of
    (n_pixels, median, p90) per zone must match numpy's linear-
    interpolation percentiles per tract (the quantile_cont convention),
    and the histogram path must cover every pixel exactly once."""
    from chopin_spark import zones as Z
    from chopin_spark.queries.zonal import extract_at_median
    from chopin_spark.raster import NPX, NPY, PH, PW, V_MOD, V_MX, V_MY
    from tests.conftest import SF_CORRECT

    rows = extract_at_median(spark, SF_CORRECT).collect()
    assert sum(r["n_pixels"] for r in rows) == NPX * NPY
    got = sorted(
        (r["n_pixels"], r["median_val"], r["p90_val"]) for r in rows
    )

    i, j = np.meshgrid(np.arange(NPX), np.arange(NPY), indexing="ij")
    val = ((i * V_MX + j * V_MY) % V_MOD).ravel()
    gx = np.floor((i + 0.5) * PW / Z.TRACT_W).astype(np.int64)
    gy = np.floor((j + 0.5) * PH / Z.TRACT_H).astype(np.int64)
    tract = (gy * Z.TRACT_NX + gx).ravel()
    want = []
    for t0 in np.unique(tract):
        vv = val[tract == t0]
        want.append(
            (
                len(vv),
                round(float(np.percentile(vv, 50, method="linear")), 4),
                round(float(np.percentile(vv, 90, method="linear")), 4),
            )
        )
    assert got == sorted(want)


def test_weighted_mean_query_invariants(spark):
    """Weighted zonal mean: exact numpy replay over the full grid."""
    from chopin_spark.queries.zonal import extract_at_weighted
    from chopin_spark.raster import NPX, NPY, V_MOD, V_MX, V_MY, V_SEED
    from chopin_spark import zones as Z
    from tests.conftest import SF_CORRECT

    rows = {
        r["zone_id"]: r for r in extract_at_weighted(spark, SF_CORRECT).collect()
    }
    assert sum(r["n_pixels"] for r in rows.values()) == NPX * NPY
    i, j = np.meshgrid(np.arange(NPX), np.arange(NPY), indexing="ij")
    base = i * V_MX + j * V_MY
    v = base % V_MOD
    w = (base + V_SEED) % V_MOD
    from chopin_spark.zones import TRACT_NX, TRACT_W, TRACT_H
    from chopin_spark.raster import PW, PH

    gx = np.floor((i + 0.5) * PW / TRACT_W).astype(np.int64)
    gy = np.floor((j + 0.5) * PH / TRACT_H).astype(np.int64)
    tract = (gy * TRACT_NX + gx).ravel()
    vw = (v * w).ravel()
    wf = w.ravel()
    sums = {}
    for t0 in np.unique(tract):
        m = tract == t0
        sums[t0] = (vw[m].sum(), wf[m].sum(), int(m.sum()))
    want = sorted(
        round(float(a) / float(b), 4) for a, b, _ in sums.values()
    )
    got = sorted(r["wmean_val"] for r in rows.values())
    assert got == want


def test_terrain_full_grid_replay(spark):
    """Horn slope/aspect vs a numpy replay over the WHOLE regenerated
    grid — the halo-exchange stencil must agree exactly with the dense
    computation it distributes, including octant boundaries."""
    from chopin_spark.queries.zonal import raster_terrain_horn
    from chopin_spark.raster import NPX, NPY, V_MOD, V_MX, V_MY
    from tests.conftest import SF_CORRECT

    rows = raster_terrain_horn(spark, SF_CORRECT).collect()
    assert len(rows) == 768
    got_energy = sum(r["slope_energy"] for r in rows)
    got_full = sum(r["n_full"] for r in rows)
    got_oct = [sum(r[f"s{o}"] for r in rows) for o in range(8)]
    got_flat = sum(r["n_flat"] for r in rows)

    i, j = np.meshgrid(np.arange(NPX), np.arange(NPY), indexing="ij")
    v = (i * V_MX + j * V_MY) % V_MOD

    def z(di, dj):
        return v[1 + di : NPX - 1 + di, 1 + dj : NPY - 1 + dj]

    gx = (z(1, -1) + 2 * z(1, 0) + z(1, 1)) - (
        z(-1, -1) + 2 * z(-1, 0) + z(-1, 1)
    )
    gy = (z(-1, 1) + 2 * z(0, 1) + z(1, 1)) - (
        z(-1, -1) + 2 * z(0, -1) + z(1, -1)
    )
    assert got_full == (NPX - 2) * (NPY - 2)
    assert got_energy == int((gx * gx + gy * gy).sum())
    ax, ay = np.abs(gx), np.abs(gy)
    flat = (gx == 0) & (gy == 0)
    octant = np.select(
        [
            (ax >= ay) & (gx > 0) & (gy >= 0),
            (ax < ay) & (gy > 0) & (gx >= 0),
            (ax < ay) & (gy > 0) & (gx < 0),
            (ax >= ay) & (gx < 0) & (gy >= 0),
            (ax >= ay) & (gx < 0) & (gy < 0),
            (ax < ay) & (gy < 0) & (gx <= 0),
            (ax < ay) & (gy < 0) & (gx > 0),
        ],
        list(range(7)),
        default=7,
    )
    assert got_flat == int(flat.sum())
    for o in range(8):
        assert got_oct[o] == int(((octant == o) & ~flat).sum())
    # aspect classes must be non-degenerate: >1 octant actually occurs
    assert sum(1 for o in got_oct if o > 0) > 1


def test_dasymetric_mass_conservation(spark):
    """Dasymetric redistribution is extensive: total redistributed
    population equals total source population up to one micro-unit
    floor loss per piece (≤ 512 pieces · 1e-4)."""
    from chopin_spark.queries.zonal import dasymetric_population
    from chopin_spark.zones import pop_expr
    from tests.conftest import SF_CORRECT

    out = dasymetric_population(spark, SF_CORRECT).collect()
    total_tgt = sum(r.dasy_pop for r in out)
    total_src = (
        spark.range(256)
        .selectExpr(f"{pop_expr('id')} AS pop")
        .groupBy()
        .sum("pop")
        .collect()[0][0]
    )
    assert 0 <= total_src - total_tgt < 512 * 1e-4 + 1e-6
    assert len(out) == 48  # every analysis cell receives mass
    assert all(6 <= r.n_src <= 8 for r in out)  # 2 x-tracts × 3-4 y-tracts
