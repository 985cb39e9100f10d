"""Runner tests (SURVEY.md §2.2) — the headline equality contract:
partitioned run == unpartitioned run == brute-force oracle
(/root/reference/README.md:463-468, :1125-1128), plus chopin's error-row
and row-count contracts."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from chopin_spark import EXTENT
from chopin_spark.grid import make_regular_grid
from chopin_spark.runners import par_grid, par_grid_map, par_hierarchy, par_multirasters


def _pts(n, seed):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "id": np.arange(n),
            "x": rng.uniform(EXTENT[0], EXTENT[2], n),
            "y": rng.uniform(EXTENT[1], EXTENT[3], n),
        }
    )


@pytest.fixture(scope="module")
def keyed_pdf():
    return _pts(1500, 7)


@pytest.fixture(scope="module")
def context_pdf():
    return _pts(400, 11)


def _nearest_fun(kpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
    if cpdf.empty:
        return pd.DataFrame({"id": kpdf["id"], "nn_dist": np.inf})
    kx = kpdf[["x", "y"]].to_numpy()
    cx = cpdf[["x", "y"]].to_numpy()
    d = np.sqrt(((kx[:, None, :] - cx[None, :, :]) ** 2).sum(-1)).min(axis=1)
    return pd.DataFrame({"id": kpdf["id"].to_numpy(), "nn_dist": d})


def test_par_grid_nearest_matches_unpartitioned(spark, keyed_pdf, context_pdf):
    """kNN is the hard case for padded partitioning (reference caveat
    R/scale_process.R:14-22): with pad >= max global NN distance the
    per-cell result equals the global result exactly."""
    kx = keyed_pdf[["x", "y"]].to_numpy()
    cx = context_pdf[["x", "y"]].to_numpy()
    oracle = np.sqrt(((kx[:, None, :] - cx[None, :, :]) ** 2).sum(-1)).min(axis=1)
    pad = float(oracle.max()) * 1.05

    keyed = spark.createDataFrame(keyed_pdf)
    context = spark.createDataFrame(context_pdf)

    results = {}
    for nx, ny in ((1, 1), (4, 3), (8, 6)):
        g = make_regular_grid(nx, ny, pad=pad)
        out = par_grid(
            keyed, context, g, _nearest_fun, "id long, nn_dist double"
        ).collect()
        results[(nx, ny)] = {r["id"]: r["nn_dist"] for r in out}
        assert len(out) == len(keyed_pdf)

    for key, got in results.items():
        for i, want in enumerate(oracle):
            assert got[i] == pytest.approx(want, abs=1e-9), (key, i)
    # partitioned == unpartitioned, bitwise
    assert results[(1, 1)] == results[(8, 6)] == results[(4, 3)]


def test_par_grid_drops_failing_cell_silently(spark, keyed_pdf, context_pdf):
    def bad_fun(kpdf, cpdf):
        if (np.floor(kpdf["x"] / 1e5) == 0).any():
            raise ValueError("boom")
        return pd.DataFrame({"id": kpdf["id"], "nn_dist": 0.0})

    g = make_regular_grid(8, 6, pad=10_000.0)
    keyed = spark.createDataFrame(keyed_pdf)
    context = spark.createDataFrame(context_pdf)
    out = par_grid(keyed, context, g, bad_fun, "id long, nn_dist double")
    # chopin: failed task → NULL → dropped (R/scale_process.R:209-219)
    assert 0 < out.count() < len(keyed_pdf)


def test_par_grid_debug_emits_error_rows(spark, keyed_pdf, context_pdf):
    def bad_fun(kpdf, cpdf):
        raise RuntimeError("synthetic failure")

    g = make_regular_grid(2, 2, pad=10_000.0)
    keyed = spark.createDataFrame(keyed_pdf)
    context = spark.createDataFrame(context_pdf)
    out = par_grid(
        keyed, context, g, bad_fun,
        "cgridid long, id long, nn_dist double", debug=True,
    ).collect()
    assert len(out) == 4  # one error row per cell
    assert all("synthetic failure" in r["error_message"] for r in out)
    assert sorted(r["cgridid"] for r in out) == [0, 1, 2, 3]


def test_par_grid_map_core_counts_sum_to_total(spark, keyed_pdf):
    df = spark.createDataFrame(keyed_pdf)
    g = make_regular_grid(8, 6, pad=30_000.0)

    def cell_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "n_core": [int(pdf["is_core"].sum())],
                "n_padded": [len(pdf)],
            }
        )

    out = par_grid_map(
        df, g, cell_stats, "cgridid long, n_core long, n_padded long"
    ).collect()
    assert sum(r["n_core"] for r in out) == len(keyed_pdf)
    assert sum(r["n_padded"] for r in out) >= len(keyed_pdf)


def test_par_hierarchy_matches_declarative_groupby(spark, keyed_pdf):
    pdf = keyed_pdf.assign(
        region_id=[f"{i % 4:02d}{i % 16:03d}{i % 3:06d}" for i in keyed_pdf.id]
    )
    df = spark.createDataFrame(pdf)

    def agg_fun(p: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"n": [len(p)], "sx": [round(p["x"].sum(), 4)]})

    out = par_hierarchy(
        df, agg_fun, "hkey string, n long, sx double",
        region_col="region_id", length_left=2,
    ).collect()
    want = {
        r["hkey"]: (r["n"], r["sx"])
        for r in df.groupBy(F.substring("region_id", 1, 2).alias("hkey"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("x"), 4).alias("sx"))
        .collect()
    }
    got = {r["hkey"]: (r["n"], r["sx"]) for r in out}
    assert got == want


def test_par_multirasters_row_count_contract(spark):
    """n_zones × n_files output rows + 1 error row per corrupt file
    (/root/reference/tests/testthat/test-scale_process.R:1324, :1230-1234)."""
    n_zones, files = 10, ["elev", "test1", "test2", "test3", "test4", "corrupt"]
    rows = []
    for rid in files:
        for z in range(n_zones):
            rows.append(
                {
                    "raster_id": rid,
                    "zone": z,
                    "val": None if rid == "corrupt" else float(z) + 0.5,
                }
            )
    df = spark.createDataFrame(pd.DataFrame(rows))

    def zonal(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf["val"].isna().any():
            raise ValueError("corrupt raster")
        return (
            pdf.groupby("zone", as_index=False)
            .agg(mean_val=("val", "mean"))
        )

    out = par_multirasters(
        df, zonal, "zone long, mean_val double", debug=True
    ).collect()
    ok = [r for r in out if r["error_message"] is None]
    err = [r for r in out if r["error_message"] is not None]
    assert len(ok) == n_zones * (len(files) - 1)
    assert len(err) == 1 and err[0]["base_raster"] == "corrupt"
    assert all(r["base_raster"] in files for r in out)


def test_par_cells_custom_index(spark):
    """Index-agnostic cogrouped runner: caller-supplied cell column,
    context duplicated by the caller; empty-context cells returning
    None are dropped (fallback contract); empty-keyed cells vanish."""
    import pandas as pd

    keyed = spark.createDataFrame(
        pd.DataFrame({"cell": [1, 1, 2, 3], "kid": [10, 11, 20, 30]})
    )
    ctx = spark.createDataFrame(
        pd.DataFrame({"cell": [1, 2, 2, 9], "v": [5.0, 7.0, 9.0, 1.0]})
    )

    def fun(kpdf, cpdf):
        if cpdf.empty:
            return None
        return pd.DataFrame(
            {"kid": kpdf["kid"], "vsum": cpdf["v"].sum()}
        )

    from chopin_spark.runners import par_cells

    got = {
        r["kid"]: (r["cell"], r["vsum"])
        for r in par_cells(
            keyed, ctx, "cell", fun,
            schema="cell BIGINT, kid BIGINT, vsum DOUBLE",
        ).collect()
    }
    # cell 3 has no context -> fun returns None -> dropped;
    # cell 9 has no keyed rows -> never runs
    assert got == {10: (1, 5.0), 11: (1, 5.0), 20: (2, 16.0)}


def test_schema_col_names_handles_parameterized_types():
    from chopin_spark.runners import _schema_col_names

    assert _schema_col_names("id long, v decimal(10,2)") == ["id", "v"]
    assert _schema_col_names(
        "a int, m map<string,int>, s struct<x:int,y:array<double>>, b string"
    ) == ["a", "m", "s", "b"]
    assert _schema_col_names("one long") == ["one"]


def test_par_convert_f_actually_reorders(spark):
    """par_convert_f(f, x='points', y='raster') must bind the runner's
    positional (keyed, context) call to f's renamed parameters —
    regression for the adapter that silently passed through."""
    import pandas as pd

    from chopin_spark.runners import par_convert_f

    def f(raster, points):
        # distinguishable by column names
        assert list(points.columns) == ["k"]
        assert list(raster.columns) == ["c"]
        return pd.DataFrame({"n": [len(points) * 100 + len(raster)]})

    adapted = par_convert_f(f, x="points", y="raster")
    out = adapted(pd.DataFrame({"k": [1, 2]}), pd.DataFrame({"c": [9]}))
    assert out["n"].tolist() == [201]


def test_runner_nearest_road_equals_join_face_at_two_grids(spark):
    """VERDICT r03 #4: the reference's flagship composition (par_grid ×
    nearest over a LINE layer) through the runner surface must equal
    the join face row-for-row — same doc set, same road, bitwise-same
    distance — at two different grid sizes (partitioning invariance)."""
    from chopin_spark.grid import make_regular_grid as mk
    from chopin_spark.queries.roads import (
        _DX, _DY, _RADIUS, road_segments, runner_nearest_road,
    )
    from chopin_spark.roads import nearest_line_join

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", F.expr(_DX).alias("x"), F.expr(_DY).alias("y")
    )
    segs = road_segments(spark)
    face = (
        nearest_line_join(docs, segs, mk(16, 12), "doc_id", _RADIUS)
        .filter(F.col("nn_dist") <= _RADIUS)
        .select("doc_id", "nn_id", "nn_dist")
    )
    want = sorted(
        (r.doc_id, r.nn_id, r.nn_dist) for r in face.collect()
    )
    assert want, "fixture produced no in-radius matches"
    for nx, ny in ((16, 12), (7, 5)):
        got = sorted(
            (r.doc_id, r.road_id, r.dist_m)
            for r in runner_nearest_road(spark, sf, nx, ny).collect()
        )
        rounded = sorted((d, i, round(v, 4)) for d, i, v in want)
        # runner emits ROUND(.,4) — compare on the rounded lattice but
        # exact values (no tolerance)
        assert got == rounded, f"grid {nx}x{ny} diverges from join face"
