"""Grid-builder tests (SURVEY.md §2.1) — structural invariants from the
reference's own suite: steps² quantile cells, exactly-equal balanced
clusters, half-open boundary determinism, merge_grid component caps."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from chopin_spark import EXTENT
from chopin_spark.grid import (
    RectGrid,
    balanced_assign,
    grid_from_extent_of,
    make_regular_grid,
    merge_grid,
    quantile_grid,
)


@pytest.fixture(scope="module")
def points(spark):
    rng = np.random.default_rng(42)
    n = 4000
    pdf = pd.DataFrame(
        {
            "id": np.arange(n),
            "x": rng.uniform(EXTENT[0], EXTENT[2], n),
            "y": rng.uniform(EXTENT[1], EXTENT[3], n),
        }
    )
    return spark.createDataFrame(pdf), pdf


def test_assign_core_is_a_function(spark, points):
    df, pdf = points
    g = make_regular_grid(8, 6, pad=30_000.0)
    out = g.assign_core(df)
    assert out.count() == len(pdf)  # exactly one cell per point
    # matches numpy floor math
    got = {r["id"]: r["cgridid"] for r in out.collect()}
    ix = np.floor(pdf.x / 100_000).astype(int)
    iy = np.floor(pdf.y / 100_000).astype(int)
    want = iy * 8 + ix
    assert all(got[i] == want[k] for k, i in enumerate(pdf.id))


def test_boundary_points_assigned_exactly_once(spark):
    # points exactly on shared cell edges — the reference's known
    # boundary-drop case (test-scale_process.R:320-322) must not recur
    pdf = pd.DataFrame(
        {
            "id": [0, 1, 2, 3],
            "x": [100_000.0, 200_000.0, 0.0, 400_000.0],
            "y": [100_000.0, 0.0, 300_000.0, 300_000.0],
        }
    )
    df = spark.createDataFrame(pdf)
    g = make_regular_grid(8, 6)
    out = g.assign_core(df).collect()
    assert len(out) == 4
    ids = {r["id"]: r["cgridid"] for r in out}
    assert ids[0] == 1 * 8 + 1  # half-open: edge belongs to upper cell
    assert ids[1] == 2
    assert ids[2] == 3 * 8 + 0


def test_assign_padded_membership_and_core_flag(spark, points):
    df, pdf = points
    pad = 30_000.0
    g = make_regular_grid(8, 6, pad=pad)
    out = g.assign_padded(df).collect()
    # every point is core in exactly one cell
    core = [r for r in out if r["is_core"]]
    assert len(core) == len(pdf)
    # brute-force oracle: membership in padded rect
    n_expected = 0
    for _, p in pdf.iterrows():
        for iy in range(6):
            for ix in range(8):
                if (
                    ix * 1e5 - pad <= p.x < (ix + 1) * 1e5 + pad
                    and iy * 1e5 - pad <= p.y < (iy + 1) * 1e5 + pad
                ):
                    n_expected += 1
    assert len(out) == n_expected


def test_quantile_grid_steps_squared_and_balance(spark, points):
    df, pdf = points
    g = quantile_grid(df, steps=4)
    assert g.nx == 4 and g.ny == 4  # steps² cells (test-gridding.R:313-316)
    counts = (
        g.assign_core(df).groupBy("cgridid").count().collect()
    )
    assert len(counts) == 16
    vals = [r["count"] for r in counts]
    # exact quantile breaks -> near-equal occupancy per axis slab
    assert max(vals) < 2.2 * min(vals)


def test_grid_from_extent_covers_max_point(spark):
    pdf = pd.DataFrame({"id": [0, 1], "x": [10.0, 90.0], "y": [5.0, 45.0]})
    df = spark.createDataFrame(pdf)
    g = grid_from_extent_of(df, 4, 4)
    out = g.assign_core(df).collect()
    assert {r["cgridid"] for r in out} == {0, 15}


def test_balanced_assign_exact_equal_sizes(spark, points):
    df, _ = points
    out = balanced_assign(df, k=8, id_col="id")
    counts = [r["count"] for r in out.groupBy("cgridid").count().collect()]
    assert len(counts) == 8
    assert all(c == 500 for c in counts)  # 4000/8, test-gridding.R:254


def test_merge_grid_caps_and_labels():
    # 4×3 grid; cells 0..3 tiny, rest big
    counts = {i: (2 if i < 4 else 100) for i in range(12)}
    remap, pp = merge_grid(counts, nx=4, ny=3, grid_min_features=10, merge_max=4)
    assert remap[0] == remap[1] == remap[2] == remap[3] == "0_1_2_3"
    assert all(remap[i] == str(i) for i in range(4, 12))
    (label, ppv) = pp[0]
    # 1×4 strip of unit cells: A=4, P=10 → 4π·4/100
    assert label == "0_1_2_3"
    assert abs(ppv - 4 * np.pi * 4 / 100) < 1e-12
    # chopin warns below 0.3 (R/gridding.R:739-760) — strip is non-compact
    assert ppv < 0.55


def test_merge_grid_merge_max_chunking():
    counts = {i: 1 for i in range(8)}  # all tiny, 4×2 grid, one component
    remap, _ = merge_grid(counts, nx=4, ny=2, grid_min_features=5, merge_max=3)
    sizes = {}
    for lbl in remap.values():
        sizes[lbl] = sizes.get(lbl, 0) + 1
    assert max(sizes.values()) <= 3
    assert sum(sizes.values()) == 8


def test_merge_remap_balances_runner_partitions(spark):
    """End-to-end P3: skewed points → count pre-pass → merge_grid →
    apply_merge_remap → per-merged-cell execution. Result equals the
    unmerged aggregation re-grouped, and no merged partition is smaller
    than the threshold (unless isolated)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from chopin_spark.grid import apply_merge_remap

    rng = np.random.default_rng(11)
    # 90% of points in the left column of an 4×3 grid → cells 1,2,3,... tiny
    x = np.where(rng.random(4000) < 0.9, rng.uniform(0, 2e5, 4000),
                 rng.uniform(2e5, 8e5, 4000))
    pdf = pd.DataFrame({"id": np.arange(4000), "x": x,
                        "y": rng.uniform(0, 6e5, 4000)})
    df = spark.createDataFrame(pdf)
    g = make_regular_grid(4, 3)
    assigned = g.assign_core(df)
    counts = {
        r["cgridid"]: r["count"]
        for r in assigned.groupBy("cgridid").count().collect()
    }
    remap, _ = merge_grid(counts, nx=4, ny=3, grid_min_features=300,
                          merge_max=4)
    merged = apply_merge_remap(assigned, remap)
    out = merged.groupBy("merged_cell").agg(F.count(F.lit(1)).alias("n"))
    rows = {r["merged_cell"]: r["n"] for r in out.collect()}
    assert sum(rows.values()) == 4000
    # merged labels aggregate their members' counts exactly
    for cell, lbl in remap.items():
        if "_" in lbl:
            members = [int(c) for c in lbl.split("_")]
            assert rows[lbl] == sum(counts.get(m, 0) for m in members)


def test_irregular_breaks_when_chain(spark):
    g = RectGrid(
        np.array([0.0, 10.0, 50.0, 100.0]), np.array([0.0, 30.0, 100.0]),
    )
    pdf = pd.DataFrame(
        {"id": [0, 1, 2], "x": [5.0, 49.0, 99.0], "y": [10.0, 10.0, 50.0]}
    )
    out = g.assign_core(spark.createDataFrame(pdf)).collect()
    got = {r["id"]: r["cgridid"] for r in out}
    assert got == {0: 0, 1: 1, 2: 3 + 2}


def test_quadtree_adaptive_assign_properties(spark):
    """Declarative min-qualifying-level == recursive quadtree split,
    plus the structural invariants of an adaptive tiling."""
    from chopin_spark.queries.spatial import (
        _QT_CAP, _QT_DEPTH, quadtree_adaptive_assign,
    )
    from chopin_spark.sqlexpr import EXTENT, x_expr, y_expr  # noqa: F401
    from chopin_spark.tables import load

    sf = "/root/testdata/sf0.001"
    rows = quadtree_adaptive_assign(spark, sf).collect()
    docs_n = load(spark, sf, "documents").count()
    assert sum(r.n_docs for r in rows) == docs_n
    for r in rows:
        if r.lvl < _QT_DEPTH:
            assert r.n_docs <= _QT_CAP

    # brute-force recursive splitter on the driver
    pts = (
        load(spark, sf, "documents")
        .selectExpr(
            f"{x_expr('doc_id')} AS x", f"{y_expr('doc_id')} AS y"
        )
        .collect()
    )
    x0, y0, x1, y1 = EXTENT

    def leaves(items, lvl, ix, iy):
        if len(items) <= _QT_CAP or lvl == _QT_DEPTH:
            yield (lvl, iy * (1 << lvl) + ix, len(items))
            return
        n = 1 << (lvl + 1)
        buckets = {}
        for p in items:
            cx = min(int((p.x - x0) / (x1 - x0) * n), n - 1)
            cy = min(int((p.y - y0) / (y1 - y0) * n), n - 1)
            buckets.setdefault((cx, cy), []).append(p)
        for (cx, cy), sub in buckets.items():
            yield from leaves(sub, lvl + 1, cx, cy)

    ref = {(l, c): n for l, c, n in leaves(pts, 0, 0, 0) if n}
    got = {(r.lvl, r.cell): r.n_docs for r in rows}
    assert got == ref


def test_spatial_cv_folds_invariants(spark):
    """Role partition per fold (test+buffer+train == N), every point
    tests in exactly one fold, buffers never overlap their own fold,
    and a driver-side recomputation agrees exactly."""
    from chopin_spark.queries.spatial import (
        _CV_K, _CV_NX, _CV_NY, spatial_cv_folds,
    )
    from chopin_spark.sqlexpr import x_expr, y_expr
    from chopin_spark.tables import load

    sf = "/root/testdata/sf0.001"
    rows = {r.fold: r for r in spatial_cv_folds(spark, sf).collect()}
    assert set(rows) == set(range(_CV_K))
    pts = load(spark, sf, "documents").selectExpr(
        f"{x_expr('doc_id')} AS x", f"{y_expr('doc_id')} AS y"
    ).collect()
    n = len(pts)
    assert all(
        r.n_test + r.n_buffer + r.n_train == n for r in rows.values()
    )
    assert sum(r.n_test for r in rows.values()) == n

    def fold(tx, ty):
        return (tx * 7 + ty * 13) % _CV_K

    ref = {k: [0, 0, 0] for k in range(_CV_K)}
    for p in pts:
        tx, ty = int(p.x // 50000.0), int(p.y // 37500.0)
        own = fold(tx, ty)
        touched = {
            fold(tx + dx, ty + dy)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            if (dx or dy)
            and 0 <= tx + dx < _CV_NX
            and 0 <= ty + dy < _CV_NY
        }
        for k in range(_CV_K):
            if own == k:
                ref[k][0] += 1
            elif k in touched:
                ref[k][1] += 1
            else:
                ref[k][2] += 1
    for k, r in rows.items():
        assert (r.n_test, r.n_buffer, r.n_train) == tuple(ref[k]), k


def test_spatial_scan_llr_finds_injected_cluster(spark):
    """The argmax-LLR window must sit on the SW-corner injected case
    cluster (tx, ty < 4), and LLR is nonnegative everywhere."""
    from chopin_spark.queries.spatial import spatial_scan_llr

    rows = spatial_scan_llr(spark, "/root/testdata/sf0.01").collect()
    assert rows and all(r.llr >= 0.0 for r in rows)
    top = max(rows, key=lambda r: (r.llr, -r.ctx, -r.cty))
    assert top.llr > 0.0
    assert top.ctx < 6 and top.cty < 6, (top.ctx, top.cty, top.llr)
