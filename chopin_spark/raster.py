"""Raster layer (SURVEY.md §1.1 'SpatRaster' → tile table; §2.3 C1/C3).

A raster is a table of fixed-size tiles:
``(raster_id, rid, tile_id, tile_row, tile_col, xmin..ymax,
values: array<bigint>)`` — the columnar re-expression of chopin's
`SpatRaster` (/root/reference/R/check.R:933-972). Tiles are generated
*distributed* (spark.range → mapInPandas), never shipped from the
driver — the reference's "spill in-memory raster to a temp GeoTIFF so
workers get a path" workaround (/root/reference/R/check.R:979-1014)
disappears: tiles are data, referenced by id.

Pixel values are integer LCG draws of (pixel index, raster id):
``(i·MX + j·MY + rid·SEED) % MOD`` — deterministic, regenerable in any
engine (the DuckDB oracles recompute them), and integer so zonal sums
are exact and associative (partition-order-independent).

Zonal statistics (extract_at, C1, /root/reference/R/processing.R:148-228)
is the classic two-stage join-agg:
  rects exploded to candidate tile ids (index arithmetic, equi-join) →
  per-(rect, tile) partial sums in an Arrow-batched pandas UDF →
  final groupBy(rect).agg(sum/sum).
Pixel membership is by pixel-center-in-rect (half-open), the exact
analogue of coverage_fraction for cell-aligned zones; kernel weighting
(C3, /root/reference/R/processing.R:50-124) multiplies in quantized
kernel weights so the weighted mean stays exact-integer.

Memory budgeting: TILE=32 → 1024 values/tile keeps every Arrow batch
far below chopin's max_cells_in_memory=3e7 default
(/root/reference/R/processing.R:324); at 100 TB the tile table is
partitioned by raster_id and pruned by tile_id min/max stats.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark import EXTENT
from chopin_spark.kernels import kernel_np, quantize_np

NPX, NPY = 1024, 768  # pixel grid over the extent
PW = (EXTENT[2] - EXTENT[0]) / NPX  # 781.25 m
PH = (EXTENT[3] - EXTENT[1]) / NPY  # 781.25 m
TILE = 32
TNX, TNY = NPX // TILE, NPY // TILE  # 32 × 24 = 768 tiles
TW, TH = TILE * PW, TILE * PH  # 25 km tile footprint

V_MX, V_MY, V_SEED, V_MOD = 2654435761, 1103515245, 97531, 1_000_003


def pixel_value_sql(i: str, j: str, rid: int) -> str:
    """Pixel DN value — identical SQL text for Spark and DuckDB."""
    return (
        f"((({i}) * {V_MX} + ({j}) * {V_MY} + {rid} * {V_SEED}) % {V_MOD})"
    )


def tile_values(rid: int, tile_row: int, tile_col: int) -> np.ndarray:
    """(TILE, TILE) int64 block, [local_j, local_i] row-major."""
    gi = tile_col * TILE + np.arange(TILE, dtype=np.int64)
    gj = tile_row * TILE + np.arange(TILE, dtype=np.int64)
    return (gi[None, :] * V_MX + gj[:, None] * V_MY + rid * V_SEED) % V_MOD


def raster_tiles_df(
    spark: SparkSession, n_rasters: int = 1, corrupt: tuple[int, ...] = ()
) -> DataFrame:
    """Tile table for rasters r0..r{n-1}; corrupt rids get NULL values
    (the reference's corrupt-GeoTIFF fixture,
    /root/reference/tests/testthat/test-scale_process.R:1214-1234)."""
    base = spark.range(n_rasters * TNX * TNY)
    corrupt_set = set(corrupt)

    schema = (
        "raster_id string, rid int, tile_id long, tile_row int, tile_col int,"
        " xmin double, ymin double, xmax double, ymax double,"
        " values array<long>"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rid = ids // (TNX * TNY)
            t = ids % (TNX * TNY)
            trow, tcol = t // TNX, t % TNX
            vals = [
                None
                if r in corrupt_set
                else tile_values(int(r), int(jr), int(jc)).ravel().tolist()
                for r, jr, jc in zip(rid, trow, tcol)
            ]
            yield pd.DataFrame(
                {
                    "raster_id": [f"r{r}" for r in rid],
                    "rid": rid.astype(np.int32),
                    "tile_id": t,
                    "tile_row": trow.astype(np.int32),
                    "tile_col": tcol.astype(np.int32),
                    "xmin": tcol * TW,
                    "ymin": trow * TH,
                    "xmax": (tcol + 1) * TW,
                    "ymax": (trow + 1) * TH,
                    "values": vals,
                }
            )

    return base.mapInPandas(gen, schema)


def _explode_rect_tiles(rects: DataFrame) -> DataFrame:
    """rect → candidate tile_id list via index arithmetic (conservative;
    the UDF's center-containment mask is the exact filter)."""
    tx_lo = F.greatest(F.lit(0), F.floor(F.col("xmin") / TW).cast("int"))
    tx_hi = F.least(F.lit(TNX - 1), F.floor(F.col("xmax") / TW).cast("int"))
    ty_lo = F.greatest(F.lit(0), F.floor(F.col("ymin") / TH).cast("int"))
    ty_hi = F.least(F.lit(TNY - 1), F.floor(F.col("ymax") / TH).cast("int"))
    return (
        rects.withColumn("_tx", F.explode(F.sequence(tx_lo, tx_hi)))
        .withColumn("_ty", F.explode(F.sequence(ty_lo, ty_hi)))
        .withColumn("tile_id", F.col("_ty").cast("long") * TNX + F.col("_tx"))
        .drop("_tx", "_ty")
    )


def extract_at(
    tiles: DataFrame,
    rects: DataFrame,
    rect_id: str = "rect_id",
    kernel: str | None = None,
    bandwidth: float | None = None,
    stats: tuple[str, ...] = ("mean",),
    broadcast_rects: bool | None = None,
    shape: str = "rect",
    weighting: str = "center",
) -> DataFrame:
    """C1 extract_at: zonal mean of raster values over rects.

    rects: (rect_id, xmin, ymin, xmax, ymax[, cx, cy]) — zones, grid
    cells, or square point-buffers (chopin buffers points by `radius`,
    /root/reference/R/processing.R:184-192; here square caps). With
    `kernel`, per-pixel distances to (cx, cy) are weighted by the
    quantized C2 kernel — C3 .kernel_weighting
    (/root/reference/R/processing.R:50-124).

    Returns (raster_id, rect_id, mean_val, n_pixels). Corrupt tiles
    (NULL values) are skipped here; par_multirasters-style error rows
    are the caller's contract (see queries.zonal).

    shape: "rect" (half-open box) or "circle" (pixel-center distance to
    (cx, cy) < radius column "r" — chopin buffers points CIRCULARLY via
    st_buffer(nQuadSegs=90), /root/reference/R/processing.R:184-192; the
    bbox columns remain the tile-candidacy index).
    weighting: "center" (pixel-center membership) or "fraction"
    (rect-only: pixel weighted by its exact covered area fraction,
    quantized to 2^20 — chopin's exactextractr coverage_fraction,
    /root/reference/R/processing.R:195-208, exact for axis-aligned
    zones at ANY alignment).
    """
    if shape not in ("rect", "circle"):
        raise ValueError(f"unsupported shape {shape!r}")
    if weighting not in ("center", "fraction"):
        raise ValueError(f"unsupported weighting {weighting!r}")
    if weighting == "fraction" and (shape != "rect" or kernel is not None):
        raise ValueError("fraction weighting is defined for plain rects")
    kern = kernel
    bw = bandwidth
    has_kernel = kern is not None
    is_circle = shape == "circle"
    frac = weighting == "fraction"
    cols = [rect_id, "xmin", "ymin", "xmax", "ymax"] + (
        ["cx", "cy"] if (has_kernel or is_circle) else []
    ) + (["r"] if is_circle else [])
    # Candidate rects grouped per tile: each tile's 8 KB value array
    # crosses the join and the Arrow boundary exactly ONCE, carrying the
    # (small) list of rect windows that touch it — instead of one value
    # copy per (tile, rect) pair. At 100 TB this is the difference
    # between shuffling the raster once and shuffling it fan-out times.
    cand = _explode_rect_tiles(rects.select(*cols))
    # Candidates grouped per tile as ONE struct list (field alignment
    # guaranteed by the single collect_list), then decomposed into
    # parallel primitive arrays with GetArrayStructFields
    # (`rects.field`) — codegen'd, and Arrow hands numpy arrays to the
    # UDF. Measured alternatives at sf0.1: shipping the struct list to
    # pandas degrades to per-element dicts (~4× slower); a flat
    # per-(tile,rect) join duplicates every tile's value array per rect
    # (~2× slower); transform() HOF decomposition is interpreted
    # (~6× slower).
    grouped = cand.groupBy("tile_id").agg(
        F.collect_list(F.struct(*cols)).alias("rects")
    )
    cand_per_tile = grouped.select(
        "tile_id",
        *[F.col(f"rects.{c}").alias(f"r_{c}") for c in cols],
    )
    # Broadcast is right for dimension-sized zone sets; for point-buffer
    # workloads the rect side is fact-sized and broadcasting it is a
    # driver-OOM at 100× scale — switch to a shuffle equi-join on tile_id
    # past a threshold (VERDICT r01 "What's wrong" #5).  rects.count() is
    # a cheap column-pruned scan and runs once per plan build.
    if broadcast_rects is None:
        broadcast_rects = rects.count() <= 8192
    if broadcast_rects:
        cand_per_tile = F.broadcast(cand_per_tile)
    joined = tiles.select(
        "tile_id", "raster_id", "tile_row", "tile_col", "values"
    ).join(cand_per_tile, "tile_id")

    need_sum2 = "std" in stats
    if need_sum2 and (has_kernel or frac):
        raise ValueError("std is defined for unweighted membership")
    part_schema = (
        f"raster_id string, {rect_id} string, vsum long, wsum long,"
        " cnt long, vmin long, vmax long"
    ) + (", vsum2 long" if need_sum2 else "")

    need_minmax = any(s in ("min", "max") for s in stats)
    # sums stay exact in float64: values < V_MOD ≈ 1e6, ≤ 1024 px/tile →
    # vsum < 2^30; kernel weights ≤ 2^16 → weighted sums < 2^47 < 2^53.
    _CHUNK = 16384  # pairs per numpy block: ≤ (CHUNK, TILE, TILE) temps

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ar = np.arange(TILE, dtype=np.float64)
        i64 = np.iinfo(np.int64)
        empty_cols = {
            "raster_id": pd.Series(dtype="object"),
            rect_id: pd.Series(dtype="object"),
            "vsum": pd.Series(dtype="int64"),
            "wsum": pd.Series(dtype="int64"),
            "cnt": pd.Series(dtype="int64"),
            "vmin": pd.Series(dtype="int64"),
            "vmax": pd.Series(dtype="int64"),
        }
        if need_sum2:
            empty_cols["vsum2"] = pd.Series(dtype="int64")
        empty = pd.DataFrame(empty_cols)
        for pdf in batches:
            pdf = pdf[pdf["values"].notna()]
            if pdf.empty:
                yield empty
                continue
            # Explode the per-tile rect lists into flat (pair,) arrays —
            # every pair handled in a handful of chunked numpy passes
            # instead of one Python iteration per tile (VERDICT r01
            # "What's wrong" #3: itertuples loop was the 23× anchor miss).
            nrects = pdf[f"r_{rect_id}"].map(len).to_numpy(dtype=np.int64)
            keep_t = nrects > 0
            if not keep_t.any():
                yield empty
                continue
            pdf = pdf[keep_t]
            nrects = nrects[keep_t]
            tidx = np.repeat(np.arange(len(pdf)), nrects)  # (P,) tile row

            def flat(c, dtype=np.float64):
                return np.concatenate(
                    [np.asarray(v, dtype=dtype) for v in pdf[f"r_{c}"]]
                )

            vals = np.stack(
                [np.asarray(v, dtype=np.int64) for v in pdf["values"]]
            ).reshape(len(pdf), TILE, TILE)  # (T, j, i)
            tcol = pdf["tile_col"].to_numpy(dtype=np.float64)
            trow = pdf["tile_row"].to_numpy(dtype=np.float64)
            cx_px = (tcol[:, None] * TILE + ar[None, :] + 0.5) * PW  # (T, i)
            cy_px = (trow[:, None] * TILE + ar[None, :] + 0.5) * PH
            pcx, pcy = cx_px[tidx], cy_px[tidx]  # (P, TILE)
            if not (is_circle or frac):
                # membership masks are used only by the plain-rect and
                # kernel-rect branches; the fraction path derives both
                # mask and count from the coverage weights
                mi = (pcx >= flat("xmin")[:, None]) & (
                    pcx < flat("xmax")[:, None]
                )  # (P, TILE) cols
                mj = (pcy >= flat("ymin")[:, None]) & (
                    pcy < flat("ymax")[:, None]
                )  # (P, TILE) rows
            if frac:
                # exact covered fraction per pixel column/row (overlap
                # length / pixel size), the separable coverage_fraction
                fx = np.clip(
                    (
                        np.minimum(flat("xmax")[:, None], pcx + PW / 2)
                        - np.maximum(flat("xmin")[:, None], pcx - PW / 2)
                    )
                    / PW,
                    0.0,
                    1.0,
                )
                fy = np.clip(
                    (
                        np.minimum(flat("ymax")[:, None], pcy + PH / 2)
                        - np.maximum(flat("ymin")[:, None], pcy - PH / 2)
                    )
                    / PH,
                    0.0,
                    1.0,
                )
            if has_kernel or is_circle:
                kcx, kcy = flat("cx"), flat("cy")
            if is_circle:
                rr2 = flat("r") ** 2
            cnt = (
                np.zeros(len(tidx), dtype=np.int64)
                if (is_circle or frac)
                else mi.sum(1).astype(np.int64) * mj.sum(1).astype(np.int64)
            )
            P = len(tidx)
            vsum = np.zeros(P, dtype=np.int64)
            wsum = np.zeros(P, dtype=np.int64)
            vmin = np.zeros(P, dtype=np.int64)
            vmax = np.zeros(P, dtype=np.int64)
            vsum2 = np.zeros(P, dtype=np.int64) if need_sum2 else None
            for lo in range(0, P, _CHUNK):
                sl = slice(lo, min(lo + _CHUNK, P))
                v = vals[tidx[sl]].astype(np.float64)  # (C, j, i)
                if is_circle:
                    dx = pcx[sl] - kcx[sl, None]  # (C, i)
                    dy = pcy[sl] - kcy[sl, None]  # (C, j)
                    d2 = dx[:, None, :] ** 2 + dy[:, :, None] ** 2
                    mask = d2 < rr2[sl, None, None]  # (C, j, i)
                    cnt[sl] = mask.sum(axis=(1, 2)).astype(np.int64)
                    if has_kernel:
                        wq = quantize_np(
                            kernel_np(np.sqrt(d2), bw, kern)
                        ) * mask
                        vsum[sl] = (wq * v).sum(axis=(1, 2)).astype(np.int64)
                        wsum[sl] = wq.sum(axis=(1, 2)).astype(np.int64)
                    else:
                        vsum[sl] = (
                            (v * mask).sum(axis=(1, 2)).astype(np.int64)
                        )
                        wsum[sl] = cnt[sl]
                        if need_sum2:
                            vsum2[sl] = (
                                (v * v * mask).sum(axis=(1, 2))
                                .astype(np.int64)
                            )
                    mjc = mic = None
                elif frac:
                    wq = np.floor(
                        fy[sl][:, :, None] * fx[sl][:, None, :] * 1048576.0
                        + 0.5
                    ).astype(np.int64)
                    mask = wq > 0
                    cnt[sl] = mask.sum(axis=(1, 2)).astype(np.int64)
                    vsum[sl] = (wq * v).sum(axis=(1, 2)).astype(np.int64)
                    wsum[sl] = wq.sum(axis=(1, 2)).astype(np.int64)
                    mjc = mic = None
                else:
                    mjc, mic = mj[sl], mi[sl]
                    mask = None
                    if has_kernel:
                        dx = pcx[sl] - kcx[sl, None]  # (C, i)
                        dy = pcy[sl] - kcy[sl, None]  # (C, j)
                        d = np.sqrt(dx[:, None, :] ** 2 + dy[:, :, None] ** 2)
                        wq = quantize_np(kernel_np(d, bw, kern)) * (
                            mjc[:, :, None] & mic[:, None, :]
                        )
                        vsum[sl] = (wq * v).sum(axis=(1, 2)).astype(np.int64)
                        wsum[sl] = wq.sum(axis=(1, 2)).astype(np.int64)
                    else:
                        mjf = mjc.astype(np.float64)
                        mif = mic.astype(np.float64)
                        vsum[sl] = np.einsum(
                            "pji,pj,pi->p", v, mjf, mif
                        ).astype(np.int64)
                        wsum[sl] = cnt[sl]
                        if need_sum2:
                            vsum2[sl] = np.einsum(
                                "pji,pj,pi->p", v * v, mjf, mif
                            ).astype(np.int64)
                if need_minmax:
                    vi = vals[tidx[sl]]
                    if mask is not None:
                        vmin[sl] = np.where(mask, vi, i64.max).min(axis=(1, 2))
                        vmax[sl] = np.where(mask, vi, i64.min).max(axis=(1, 2))
                    else:
                        colmin = np.where(mic[:, None, :], vi, i64.max).min(2)
                        vmin[sl] = np.where(mjc, colmin, i64.max).min(1)
                        colmax = np.where(mic[:, None, :], vi, i64.min).max(2)
                        vmax[sl] = np.where(mjc, colmax, i64.min).max(1)
            keep = cnt > 0
            rid_flat = np.concatenate(
                [np.asarray(v, dtype=object) for v in pdf[f"r_{rect_id}"]]
            )
            out_cols = {
                "raster_id": pdf["raster_id"].to_numpy()[tidx[keep]],
                rect_id: rid_flat[keep],
                "vsum": vsum[keep],
                "wsum": wsum[keep],
                "cnt": cnt[keep],
                "vmin": vmin[keep],
                "vmax": vmax[keep],
            }
            if need_sum2:
                out_cols["vsum2"] = vsum2[keep]
            yield pd.DataFrame(out_cols)

    parts = joined.mapInPandas(partials, part_schema)
    # parameterized summary function (chopin's `func` injection,
    # /root/reference/R/processing.R:117, :806-808): partial statistics
    # compose into any of mean/sum/min/max at the final aggregation
    aggs = []
    for s in stats:
        if s == "mean":
            aggs.append(
                F.round(
                    F.sum("vsum").cast("double")
                    / F.sum("wsum").cast("double"),
                    4,
                ).alias("mean_val")
            )
        elif s == "sum":
            aggs.append(F.sum("vsum").alias("sum_val"))
        elif s == "min":
            aggs.append(F.min("vmin").alias("min_val"))
        elif s == "max":
            aggs.append(F.max("vmax").alias("max_val"))
        elif s == "std":
            # population std from exact integer partials:
            # sqrt(E[v^2] - mean^2); every term is one deterministic
            # IEEE op on < 2^53-exact values, identical in DuckDB
            n = F.sum("cnt").cast("double")
            m = F.sum("vsum").cast("double") / n
            aggs.append(
                F.round(
                    F.sqrt(F.sum("vsum2").cast("double") / n - m * m), 4
                ).alias("std_val")
            )
        else:
            raise ValueError(f"unsupported stat {s!r}")
    aggs.append(F.sum("cnt").alias("n_pixels"))
    return parts.groupBy("raster_id", rect_id).agg(*aggs)


def tile_pixels(tiles: DataFrame) -> DataFrame:
    """Tile table → per-pixel rows (raster_id, i, j, val) via
    posexplode — entirely JVM column math (no Python stage).

    The carrier for EXACT order statistics over zones (chopin's `func`
    passthrough to exact_extract accepts 'median'/'quantile',
    /root/reference/R/processing.R:133-142,196): downstream code keys a
    (zone, DN value) histogram on these rows, which combines
    associatively (map-side partials) and, for real-world 8/16-bit
    rasters, collapses to a tiny final table — the 100-TB shape for
    exact medians. ``values`` is [local_j, local_i] row-major, so
    li = pos % TILE and lj = pos div TILE."""
    return (
        tiles.filter(F.col("values").isNotNull())
        .select(
            "raster_id",
            "tile_row",
            "tile_col",
            F.posexplode("values").alias("pos", "val"),
        )
        .select(
            "raster_id",
            (
                F.col("tile_col").cast("long") * TILE
                + F.col("pos") % TILE
            ).alias("i"),
            (
                F.col("tile_row").cast("long") * TILE
                + (F.col("pos") / TILE).cast("long")
            ).alias("j"),
            "val",
        )
    )


def weighted_tiles(vtiles: DataFrame, wtiles: DataFrame) -> DataFrame:
    """Pixel-aligned product raster: values[k] = v[k] * w[k] per tile —
    the v·w carrier for weighted zonal means (exact_extract's
    weighted stats take `x` and `w` rasters,
    /root/reference/R/processing.R:133-142). The multiply is a JVM
    zip_with over co-keyed tile rows (one equi-join on tile_id; in a
    stored deployment both rasters are bucketed by tile_id, so the join
    is shuffle-free). Keeps the VALUE raster's raster_id. Products stay
    exact: v, w < V_MOD ≈ 1e6 → v·w < 1e12 < 2^53."""
    w = wtiles.select(
        "tile_id", F.col("values").alias("_wvals")
    )
    return (
        vtiles.join(w, "tile_id")
        .withColumn(
            "values",
            F.when(
                F.col("values").isNotNull() & F.col("_wvals").isNotNull(),
                F.zip_with("values", "_wvals", lambda a, b: a * b),
            ),
        )
        .drop("_wvals")
    )


def extract_at_polygons(
    tiles: DataFrame,
    polys: DataFrame,
    poly_id: str = "poly_id",
    broadcast_polys: bool | None = None,
) -> DataFrame:
    """C1 extract_at over GENERAL single-ring polygons — the reference's
    flagship polygons × raster call (6 S4 methods,
    /root/reference/R/processing.R:301-530), wired through the engine's
    ray-cast PIP (geom.core.points_in_polygon) instead of exactextractr.

    polys: (poly_id, xmin, ymin, xmax, ymax, xs: array<double>,
    ys: array<double>) — bbox columns drive tile candidacy (index
    arithmetic, same as rects); the ring refines pixel-center
    membership exactly.  Returns (raster_id, poly_id, mean_val,
    n_pixels).
    """
    cols = [poly_id, "xmin", "ymin", "xmax", "ymax", "xs", "ys"]
    cand = _explode_rect_tiles(polys.select(*cols))
    grouped = cand.groupBy("tile_id").agg(
        F.collect_list(F.struct(*cols)).alias("rects")
    )
    cand_per_tile = grouped.select(
        "tile_id", *[F.col(f"rects.{c}").alias(f"r_{c}") for c in cols]
    )
    if broadcast_polys is None:
        broadcast_polys = polys.count() <= 8192
    if broadcast_polys:
        cand_per_tile = F.broadcast(cand_per_tile)
    joined = tiles.select(
        "tile_id", "raster_id", "tile_row", "tile_col", "values"
    ).join(cand_per_tile, "tile_id")

    part_schema = f"raster_id string, {poly_id} string, vsum long, cnt long"

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from chopin_spark.geom.core import points_in_polygon

        ar = np.arange(TILE, dtype=np.float64)
        gx, gy = np.meshgrid(ar, ar)  # [j, i] grids
        empty = pd.DataFrame(
            {
                "raster_id": pd.Series(dtype="object"),
                poly_id: pd.Series(dtype="object"),
                "vsum": pd.Series(dtype="int64"),
                "cnt": pd.Series(dtype="int64"),
            }
        )
        for pdf in batches:
            pdf = pdf[pdf["values"].notna()]
            if pdf.empty:
                yield empty
                continue
            out_r, out_p, out_v, out_c = [], [], [], []
            for row in pdf.itertuples(index=False):
                ids = row[pdf.columns.get_loc(f"r_{poly_id}")]
                if len(ids) == 0:
                    continue
                vals = np.asarray(row.values, dtype=np.int64).reshape(
                    TILE, TILE
                )
                px = ((row.tile_col * TILE + gx + 0.5) * PW).ravel()
                py = ((row.tile_row * TILE + gy + 0.5) * PH).ravel()
                for pid, xs, ys in zip(ids, row.r_xs, row.r_ys):
                    ring = np.column_stack(
                        [np.asarray(xs), np.asarray(ys)]
                    )
                    inside = points_in_polygon(px, py, ring)
                    c = int(inside.sum())
                    if c == 0:
                        continue
                    out_r.append(row.raster_id)
                    out_p.append(pid)
                    out_v.append(int(vals.ravel()[inside].sum()))
                    out_c.append(c)
            yield (
                pd.DataFrame(
                    {
                        "raster_id": out_r,
                        poly_id: out_p,
                        "vsum": np.asarray(out_v, dtype=np.int64),
                        "cnt": np.asarray(out_c, dtype=np.int64),
                    }
                )
                if out_r
                else empty
            )

    parts = joined.mapInPandas(partials, part_schema)
    return parts.groupBy("raster_id", poly_id).agg(
        F.round(
            F.sum("vsum").cast("double") / F.sum("cnt").cast("double"), 4
        ).alias("mean_val"),
        F.sum("cnt").alias("n_pixels"),
    )


FRAC_QUANT = 4096  # coverage-fraction lattice (margin measured ≥ 1/6 unit)


def extract_at_polygons_frac(
    tiles: DataFrame,
    polys: DataFrame,
    poly_id: str = "poly_id",
    broadcast_polys: bool | None = None,
) -> DataFrame:
    """C1 extract_at over general single-ring polygons with EXACT
    per-pixel coverage fractions (VERDICT r02 next-steps #6 — closes
    the boundary-pixel gap vs `exactextractr`'s exact fractions,
    /root/reference/R/processing.R:195-208; `extract_at_polygons` keeps
    the cheaper pixel-center semantics).

    Per (tile, polygon) pair the work is PERIMETER-bounded, not
    area-bounded: pixels whose rectangle intersects some polygon-edge
    bbox are flagged boundary and get a Sutherland–Hodgman clip
    (exact area); every other pixel in the bbox window is uniformly
    inside or outside (no edge crosses it), so the vectorized
    center test is exact there.  Fractions are quantized to the
    FRAC_QUANT lattice so the distributed weighted sums are
    integer-exact (shuffle-order-independent); the fixture's margin to
    the nearest rounding boundary (≥1/6 unit vs ≤1e-9-unit clip
    drift) is asserted offline in tests/test_zonal.py.

    Returns (raster_id, poly_id, frac_mean, cov_pixels): the
    fraction-weighted mean and the total covered area in pixel units.
    """
    cols = [poly_id, "xmin", "ymin", "xmax", "ymax", "xs", "ys"]
    cand = _explode_rect_tiles(polys.select(*cols))
    grouped = cand.groupBy("tile_id").agg(
        F.collect_list(F.struct(*cols)).alias("rects")
    )
    cand_per_tile = grouped.select(
        "tile_id", *[F.col(f"rects.{c}").alias(f"r_{c}") for c in cols]
    )
    if broadcast_polys is None:
        broadcast_polys = polys.count() <= 8192
    if broadcast_polys:
        cand_per_tile = F.broadcast(cand_per_tile)
    joined = tiles.select(
        "tile_id", "raster_id", "tile_row", "tile_col", "values"
    ).join(cand_per_tile, "tile_id")

    part_schema = f"raster_id string, {poly_id} string, wsum long, wtot long"
    area_px = PW * PH

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from chopin_spark.geom.core import (
            clip_polygon_rect,
            points_in_polygon,
            polygon_area,
        )

        empty = pd.DataFrame(
            {
                "raster_id": pd.Series(dtype="object"),
                poly_id: pd.Series(dtype="object"),
                "wsum": pd.Series(dtype="int64"),
                "wtot": pd.Series(dtype="int64"),
            }
        )
        for pdf in batches:
            pdf = pdf[pdf["values"].notna()]
            if pdf.empty:
                yield empty
                continue
            out_r, out_p, out_w, out_t = [], [], [], []
            for row in pdf.itertuples(index=False):
                ids = row[pdf.columns.get_loc(f"r_{poly_id}")]
                if len(ids) == 0:
                    continue
                vals = np.asarray(row.values, dtype=np.int64).reshape(
                    TILE, TILE
                )
                tx0 = row.tile_col * TW
                ty0 = row.tile_row * TH
                for pid, bxmin, bymin, bxmax, bymax, xs, ys in zip(
                    ids, row.r_xmin, row.r_ymin, row.r_xmax, row.r_ymax,
                    row.r_xs, row.r_ys,
                ):
                    i_lo = max(0, int(np.floor((bxmin - tx0) / PW)))
                    i_hi = min(TILE - 1, int(np.ceil((bxmax - tx0) / PW)) - 1)
                    j_lo = max(0, int(np.floor((bymin - ty0) / PH)))
                    j_hi = min(TILE - 1, int(np.ceil((bymax - ty0) / PH)) - 1)
                    if i_lo > i_hi or j_lo > j_hi:
                        continue
                    ni, nj = i_hi - i_lo + 1, j_hi - j_lo + 1
                    ring = np.column_stack(
                        [np.asarray(xs), np.asarray(ys)]
                    )
                    # center test for the whole window (exact off-boundary)
                    ci = tx0 + (i_lo + np.arange(ni) + 0.5) * PW
                    cj = ty0 + (j_lo + np.arange(nj) + 0.5) * PH
                    gx, gy = np.meshgrid(ci, cj)  # [j, i]
                    frac = points_in_polygon(
                        gx.ravel(), gy.ravel(), ring
                    ).astype(np.float64).reshape(nj, ni)
                    # flag boundary pixels per edge bbox
                    bnd = np.zeros((nj, ni), dtype=bool)
                    rr = ring if (ring[0] != ring[-1]).any() else ring[:-1]
                    for e in range(len(rr)):
                        x1, y1 = rr[e]
                        x2, y2 = rr[(e + 1) % len(rr)]
                        ei_lo = int(np.floor((min(x1, x2) - tx0) / PW))
                        ei_hi = int(np.floor((max(x1, x2) - tx0) / PW))
                        ej_lo = int(np.floor((min(y1, y2) - ty0) / PH))
                        ej_hi = int(np.floor((max(y1, y2) - ty0) / PH))
                        ei_lo = max(ei_lo, i_lo)
                        ei_hi = min(ei_hi, i_hi)
                        ej_lo = max(ej_lo, j_lo)
                        ej_hi = min(ej_hi, j_hi)
                        if ei_lo <= ei_hi and ej_lo <= ej_hi:
                            bnd[
                                ej_lo - j_lo : ej_hi - j_lo + 1,
                                ei_lo - i_lo : ei_hi - i_lo + 1,
                            ] = True
                    for bj, bi in zip(*np.nonzero(bnd)):
                        px0 = tx0 + (i_lo + bi) * PW
                        py0 = ty0 + (j_lo + bj) * PH
                        clipped = clip_polygon_rect(
                            ring, px0, py0, px0 + PW, py0 + PH
                        )
                        a = (
                            polygon_area(clipped)
                            if len(clipped) >= 3
                            else 0.0
                        )
                        frac[bj, bi] = a / area_px
                    wq = np.floor(frac * FRAC_QUANT + 0.5).astype(np.int64)
                    if not wq.any():
                        continue
                    win_vals = vals[j_lo : j_hi + 1, i_lo : i_hi + 1]
                    out_r.append(row.raster_id)
                    out_p.append(pid)
                    out_w.append(int((wq * win_vals).sum()))
                    out_t.append(int(wq.sum()))
            yield (
                pd.DataFrame(
                    {
                        "raster_id": out_r,
                        poly_id: out_p,
                        "wsum": np.asarray(out_w, dtype=np.int64),
                        "wtot": np.asarray(out_t, dtype=np.int64),
                    }
                )
                if out_r
                else empty
            )

    parts = joined.mapInPandas(partials, part_schema)
    return parts.groupBy("raster_id", poly_id).agg(
        F.round(
            F.sum("wsum").cast("double") / F.sum("wtot").cast("double"), 4
        ).alias("frac_mean"),
        F.round(
            F.sum("wtot").cast("double") / float(FRAC_QUANT), 4
        ).alias("cov_pixels"),
    )


def corrupt_raster_ids(tiles: DataFrame) -> DataFrame:
    """Distinct raster_ids with NULL tiles — the error-row side of the
    par_multirasters contract."""
    return tiles.filter(F.col("values").isNull()).select("raster_id").distinct()


def focal_sum_tiles(tiles: DataFrame) -> DataFrame:
    """Distributed 3×3 focal (moving-window) sum over the tiled raster
    with HALO EXCHANGE — the stencil pattern chopin's single-machine
    terra backend gets for free (`terra::focal`) and a partitioned
    raster must reconstruct.

    Stage 1 (strips): every tile emits to each existing neighbor ONLY
    the boundary strip that neighbor needs — one row / one column /
    one corner pixel per direction, ≤132 values instead of the 9,216 a
    full-tile 9-way replication would ship.  At 100 TB of raster the
    shuffle volume is the halo surface, not the tile volume (surface /
    volume = 2r/TILE ≈ 6%).

    Stage 2 (assemble + convolve): each tile groups its incoming strips
    (one collect_list join), builds the (TILE+2)² padded array plus an
    in-bounds mask, and computes the truncated-window focal sum as nine
    shifted adds in numpy.  Raster boundary = window truncation (mask),
    matching terra's na.rm=TRUE edge semantics.

    Returns (raster_id, tile_id, focal_sum, n_full): the integer-exact
    total of per-pixel focal sums and the count of pixels with a full
    3×3 window — both partition-order independent, oracle-checkable.
    """
    import numpy as np

    def convolve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        T = TILE
        for pdf in batches:
            pdf = pdf[pdf["values"].notna()]
            rid, tid, fs, nf = [], [], [], []
            for row in pdf.itertuples(index=False):
                p, m = assemble_padded(row)
                focal = sum(
                    p[a : a + T, b : b + T]
                    for a in range(3)
                    for b in range(3)
                )
                cnt = sum(
                    m[a : a + T, b : b + T]
                    for a in range(3)
                    for b in range(3)
                )
                rid.append(row.raster_id)
                tid.append(row.tile_id)
                fs.append(int(focal.sum()))
                nf.append(int((cnt == 9).sum()))
            yield pd.DataFrame(
                {
                    "raster_id": rid,
                    "tile_id": pd.Series(tid, dtype="int64"),
                    "focal_sum": pd.Series(fs, dtype="int64"),
                    "n_full": pd.Series(nf, dtype="int32"),
                }
            )

    out_schema = (
        "raster_id string, tile_id long, focal_sum long, n_full int"
    )
    return halo_joined(tiles).mapInPandas(convolve, out_schema)


def focal_median_tiles(tiles: DataFrame) -> DataFrame:
    """3×3 truncated-window focal MEDIAN over the tiled raster (terra::
    focal(fun=median)) — the order statistic no associative partial can
    carry, i.e. the stencil that genuinely NEEDS the halo exchange
    (focal_sum could in principle be rewritten as three separable
    passes; a windowed median cannot).  Same two stages as
    focal_sum_tiles: strip-only halo shuffle, then a vectorized numpy
    finish — the 9 shifted windows stack to (9, T, T), masked slots get
    +inf, one axis-0 sort, and the two middle order statistics are
    gathered per pixel.

    Per tile the engine emits Σ(2·median) — the DOUBLED median, which
    is integer-exact (a median of ints is an int or a half-int) so the
    cross-tile sum is partition-order independent — plus the count of
    odd-sized windows as an independent boundary-truncation pin.
    """
    import numpy as np

    def convolve(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        T = TILE
        big = np.iinfo(np.int64).max
        for pdf in batches:
            pdf = pdf[pdf["values"].notna()]
            rid, tid, ms, no = [], [], [], []
            for row in pdf.itertuples(index=False):
                p, m = assemble_padded(row)
                vals = np.stack(
                    [p[a : a + T, b : b + T] for a in range(3) for b in range(3)]
                )
                mask = np.stack(
                    [m[a : a + T, b : b + T] for a in range(3) for b in range(3)]
                ).astype(bool)
                k = mask.sum(axis=0)  # window size, >= 4 (corner pixel)
                v = np.where(mask, vals, big)
                v.sort(axis=0)
                lo = (k + 1) // 2 - 1  # 0-based middle (lower)
                hi = k // 2  # 0-based middle (upper)
                med2 = (
                    np.take_along_axis(v, lo[None, :, :], 0)[0]
                    + np.take_along_axis(v, hi[None, :, :], 0)[0]
                )
                rid.append(row.raster_id)
                tid.append(row.tile_id)
                ms.append(int(med2.sum()))
                no.append(int((k % 2 == 1).sum()))
            yield pd.DataFrame(
                {
                    "raster_id": rid,
                    "tile_id": pd.Series(tid, dtype="int64"),
                    "med2_sum": pd.Series(ms, dtype="int64"),
                    "n_odd": pd.Series(no, dtype="int32"),
                }
            )

    out_schema = (
        "raster_id string, tile_id long, med2_sum long, n_odd int"
    )
    return halo_joined(tiles).mapInPandas(convolve, out_schema)


def morph_tiles(tiles: DataFrame, op: str) -> DataFrame:
    """One 3×3 morphological pass (op = "erode" → focal MIN, "dilate" →
    focal MAX, truncated at the raster boundary) that returns FULL
    transformed tiles in the input tile schema — so stencil passes
    CHAIN: each pass is one strip-only halo exchange + a vectorized
    numpy finish, and opening/closing compose as two passes with the
    shuffle volume of two halo surfaces (never a widened 5×5 halo or a
    re-read of the source).  Returns (raster_id, tile_id, tile_row,
    tile_col, values) ready for the next halo_joined.
    """
    import numpy as np

    if op not in ("erode", "dilate"):
        raise ValueError(op)
    big = np.iinfo(np.int64).max

    def finish(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        T = TILE
        for pdf in batches:
            pdf = pdf[pdf["values"].notna()]
            rid, tid, trow, tcol, out = [], [], [], [], []
            for row in pdf.itertuples(index=False):
                p, m = assemble_padded(row)
                vals = np.stack(
                    [p[a : a + T, b : b + T] for a in range(3) for b in range(3)]
                )
                mask = np.stack(
                    [m[a : a + T, b : b + T] for a in range(3) for b in range(3)]
                ).astype(bool)
                if op == "erode":
                    v = np.where(mask, vals, big).min(axis=0)
                else:
                    v = np.where(mask, vals, -big).max(axis=0)
                rid.append(row.raster_id)
                tid.append(row.tile_id)
                trow.append(row.tile_row)
                tcol.append(row.tile_col)
                out.append([int(x) for x in v.ravel()])
            yield pd.DataFrame(
                {
                    "raster_id": rid,
                    "tile_id": pd.Series(tid, dtype="int64"),
                    "tile_row": pd.Series(trow, dtype="int32"),
                    "tile_col": pd.Series(tcol, dtype="int32"),
                    "values": out,
                }
            )

    schema = (
        "raster_id string, tile_id long, tile_row int, tile_col int,"
        " values array<long>"
    )
    return halo_joined(tiles).mapInPandas(finish, schema)


def conv3_binomial_tiles(tiles: DataFrame) -> DataFrame:
    """One 3×3 binomial-weighted convolution pass ([1,2,1]⊗[1,2,1],
    zero beyond the raster edge) returning FULL transformed tiles, so
    smoothing passes CHAIN like :func:`morph_tiles`: two passes give
    the 5×5 binomial kernel [1,4,6,4,1]⊗[1,4,6,4,1] (the integer
    Gaussian) for the shuffle volume of two 1-px halo surfaces — never
    a widened 2-px halo, never a k² window read.

    The numpy finish is SEPARABLE: a horizontal [1,2,1] sweep over the
    padded array, then a vertical one — 2·k shifted adds instead of
    k², the classic Gaussian-pyramid trick.  Composition + separability
    together are the 100-TB story: an order-k smooth costs O(k) passes
    of O(TILE²·3) work each, with halo traffic fixed at one strip per
    pass (terra::focal with a gaussian w matrix does the k² window on
    one machine; /root/reference/R/processing.R:148-228 assumes that
    preprocessing already happened).

    Integer-exact throughout: weights are binomial integers, zero-pad
    keeps every pixel a plain weighted sum of in-raster DNs.
    """

    def finish(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        T = TILE
        for pdf in batches:
            pdf = pdf[pdf["values"].notna()]
            rid, tid, trow, tcol, out = [], [], [], [], []
            for row in pdf.itertuples(index=False):
                p, _m = assemble_padded(row)  # zero outside raster
                h = p[:, 0:T] + 2 * p[:, 1 : T + 1] + p[:, 2 : T + 2]
                v = h[0:T, :] + 2 * h[1 : T + 1, :] + h[2 : T + 2, :]
                rid.append(row.raster_id)
                tid.append(row.tile_id)
                trow.append(row.tile_row)
                tcol.append(row.tile_col)
                out.append([int(x) for x in v.ravel()])
            yield pd.DataFrame(
                {
                    "raster_id": rid,
                    "tile_id": pd.Series(tid, dtype="int64"),
                    "tile_row": pd.Series(trow, dtype="int32"),
                    "tile_col": pd.Series(tcol, dtype="int32"),
                    "values": out,
                }
            )

    schema = (
        "raster_id string, tile_id long, tile_row int, tile_col int,"
        " values array<long>"
    )
    return halo_joined(tiles).mapInPandas(finish, schema)


def curvature_tiles(tiles: DataFrame) -> DataFrame:
    """Zevenbergen–Thorne curvature analog (terra::terrain lacks it;
    the Z–T 1987 second-derivative stencils are the standard DEM
    curvature formulation) on the partitioned raster — same strip-only
    halo exchange as :func:`terrain_tiles`, ALL integer:

    - zxx = z(i-1,j) - 2z(i,j) + z(i+1,j)   (d2z/dx2 * h2)
      zyy = z(i,j-1) - 2z(i,j) + z(i,j+1)   (d2z/dy2 * h2)
      lap = zxx + zyy — the Laplacian carrier; sign classifies the
      surface locally concave (>0), convex (<0), or planar (=0).
    - txy = z(i+1,j+1) - z(i-1,j+1) - z(i+1,j-1) + z(i-1,j-1)
      (4 * d2z/dxdy * h2 — the twist term).

    Per tile: (n_full, lap_sum, lap_energy=SUM lap^2, twist_energy=
    SUM txy^2, n_concave, n_convex, n_planar) over full-window pixels
    only.  Dividing by h^2 is a driver-side constant; keeping the
    distributed sums in int64 makes them associative and oracle-exact."""
    T = TILE

    def finish(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["values"].notna()]
            cols = (
                "raster_id", "tile_id", "n_full", "lap_sum",
                "lap_energy", "twist_energy", "n_concave", "n_convex",
                "n_planar",
            )
            out: dict[str, list] = {k: [] for k in cols}
            for row in pdf.itertuples(index=False):
                p, m = assemble_padded(row)

                def sh(dj, di):
                    return p[1 + dj : 1 + dj + T, 1 + di : 1 + di + T]

                cnt = sum(
                    m[a : a + T, b : b + T]
                    for a in range(3)
                    for b in range(3)
                )
                full = cnt == 9
                c = sh(0, 0)
                zxx = sh(0, -1) - 2 * c + sh(0, 1)
                zyy = sh(-1, 0) - 2 * c + sh(1, 0)
                txy = sh(1, 1) - sh(1, -1) - sh(-1, 1) + sh(-1, -1)
                lap = (zxx + zyy)[full]
                txy = txy[full]
                out["raster_id"].append(row.raster_id)
                out["tile_id"].append(row.tile_id)
                out["n_full"].append(int(full.sum()))
                out["lap_sum"].append(int(lap.sum()))
                out["lap_energy"].append(int((lap * lap).sum()))
                out["twist_energy"].append(int((txy * txy).sum()))
                out["n_concave"].append(int((lap > 0).sum()))
                out["n_convex"].append(int((lap < 0).sum()))
                out["n_planar"].append(int((lap == 0).sum()))
            yield pd.DataFrame(
                {
                    "raster_id": out["raster_id"],
                    "tile_id": pd.Series(out["tile_id"], dtype="int64"),
                    "n_full": pd.Series(out["n_full"], dtype="int32"),
                    **{
                        k: pd.Series(out[k], dtype="int64")
                        for k in (
                            "lap_sum", "lap_energy", "twist_energy",
                            "n_concave", "n_convex", "n_planar",
                        )
                    },
                }
            )

    out_schema = (
        "raster_id string, tile_id long, n_full int, lap_sum long,"
        " lap_energy long, twist_energy long, n_concave long,"
        " n_convex long, n_planar long"
    )
    return halo_joined(tiles).mapInPandas(finish, out_schema)


def halo_joined(tiles: DataFrame) -> DataFrame:
    """Stage 1 of any 3×3 stencil op: tiles joined with the boundary
    strips their neighbors emitted (see focal_sum_tiles for the scale
    rationale — shuffle volume is the halo SURFACE, not tile volume).
    Each output row has (raster_id, tile_id, tile_row, tile_col,
    values, halos) ready for :func:`assemble_padded`."""
    import numpy as np

    strip_schema = (
        "raster_id string, tile_id long, edr int, edc int,"
        " strip array<long>"
    )

    def strips(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["values"].notna()]
            rid, dst, edr, edc, st = [], [], [], [], []
            for row in pdf.itertuples(index=False):
                v = np.asarray(row.values, dtype=np.int64).reshape(
                    TILE, TILE
                )
                for dtr in (-1, 0, 1):
                    for dtc in (-1, 0, 1):
                        if dtr == 0 and dtc == 0:
                            continue
                        nr, nc = row.tile_row + dtr, row.tile_col + dtc
                        if not (0 <= nr < TNY and 0 <= nc < TNX):
                            continue
                        j = 0 if dtr == -1 else TILE - 1
                        i = 0 if dtc == -1 else TILE - 1
                        if dtr != 0 and dtc != 0:
                            s = v[j : j + 1, i]  # corner pixel
                        elif dtr != 0:
                            s = v[j, :]  # full row
                        else:
                            s = v[:, i]  # full column
                        rid.append(row.raster_id)
                        dst.append(nr * TNX + nc)
                        edr.append(-dtr)
                        edc.append(-dtc)
                        st.append([int(x) for x in np.atleast_1d(s)])
            yield pd.DataFrame(
                {
                    "raster_id": rid,
                    "tile_id": pd.Series(dst, dtype="int64"),
                    "edr": pd.Series(edr, dtype="int32"),
                    "edc": pd.Series(edc, dtype="int32"),
                    "strip": st,
                }
            )

    halo = (
        tiles.mapInPandas(strips, strip_schema)
        .groupBy("raster_id", "tile_id")
        .agg(
            F.collect_list(F.struct("edr", "edc", "strip")).alias("halos")
        )
    )
    return tiles.select(
        "raster_id", "tile_id", "tile_row", "tile_col", "values"
    ).join(halo, ["raster_id", "tile_id"], "left")


def assemble_padded(row) -> tuple:
    """Stage-2 helper: a halo_joined row → ((TILE+2)² padded int64
    array, in-bounds mask).  Raster boundary = mask 0 (window
    truncation, terra's na.rm=TRUE edge semantics)."""
    T = TILE
    p = np.zeros((T + 2, T + 2), dtype=np.int64)
    m = np.zeros((T + 2, T + 2), dtype=np.int64)
    p[1:-1, 1:-1] = np.asarray(row.values, dtype=np.int64).reshape(T, T)
    m[1:-1, 1:-1] = 1
    halos = row.halos if row.halos is not None else []
    for h in halos:
        edr, edc, s = h["edr"], h["edc"], np.asarray(
            h["strip"], dtype=np.int64
        )
        jj = 0 if edr == -1 else T + 1
        ii = 0 if edc == -1 else T + 1
        if edr != 0 and edc != 0:
            p[jj, ii], m[jj, ii] = s[0], 1
        elif edr != 0:
            p[jj, 1:-1], m[jj, 1:-1] = s, 1
        else:
            p[1:-1, ii], m[1:-1, ii] = s, 1
    return p, m


def terrain_tiles(tiles: DataFrame) -> DataFrame:
    """terra::terrain analog (slope/aspect, Horn's method) on the
    partitioned raster — same strip-only halo exchange as
    focal_sum_tiles, different stencil finish, ALL integer:

    - gx = Σ east column · [1,2,1] − Σ west column · [1,2,1]
      gy = Σ north row · [1,2,1] − Σ south row · [1,2,1]   (Horn 1981)
    - slope_energy = Σ (gx² + gy²) over full-window pixels — the
      integer carrier of mean squared gradient (÷(8·cellsize)² is a
      driver-side constant, left to the caller so the distributed sum
      stays exact int64)
    - aspect classified into 8 compass octants by SIGN COMPARISONS
      (|gx| vs |gy| and sign pairs) — no atan2, so the class counts are
      engine-exact; flat (gx=gy=0) counted separately.

    Returns per tile: (raster_id, tile_id, n_full, slope_energy,
    n_flat, s0..s7).  Only pixels with a full in-raster 3×3 window
    contribute (global raster edge excluded, like terra's edge NA)."""
    T = TILE

    def finish(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["values"].notna()]
            out: dict[str, list] = {
                k: []
                for k in (
                    "raster_id", "tile_id", "n_full", "slope_energy",
                    "n_flat", *[f"s{o}" for o in range(8)],
                )
            }
            for row in pdf.itertuples(index=False):
                p, m = assemble_padded(row)

                def sh(dj, di):
                    return p[1 + dj : 1 + dj + T, 1 + di : 1 + di + T]

                cnt = sum(
                    m[a : a + T, b : b + T]
                    for a in range(3)
                    for b in range(3)
                )
                full = cnt == 9
                gx = (
                    sh(-1, 1) + 2 * sh(0, 1) + sh(1, 1)
                    - (sh(-1, -1) + 2 * sh(0, -1) + sh(1, -1))
                )
                gy = (
                    sh(1, -1) + 2 * sh(1, 0) + sh(1, 1)
                    - (sh(-1, -1) + 2 * sh(-1, 0) + sh(-1, 1))
                )
                gx, gy = gx[full], gy[full]
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
                out["raster_id"].append(row.raster_id)
                out["tile_id"].append(row.tile_id)
                out["n_full"].append(int(full.sum()))
                out["slope_energy"].append(int((gx * gx + gy * gy).sum()))
                out["n_flat"].append(int(flat.sum()))
                for o in range(8):
                    out[f"s{o}"].append(int(((octant == o) & ~flat).sum()))
            yield pd.DataFrame(
                {
                    "raster_id": out["raster_id"],
                    "tile_id": pd.Series(out["tile_id"], dtype="int64"),
                    "n_full": pd.Series(out["n_full"], dtype="int32"),
                    "slope_energy": pd.Series(
                        out["slope_energy"], dtype="int64"
                    ),
                    "n_flat": pd.Series(out["n_flat"], dtype="int64"),
                    **{
                        f"s{o}": pd.Series(out[f"s{o}"], dtype="int64")
                        for o in range(8)
                    },
                }
            )

    out_schema = (
        "raster_id string, tile_id long, n_full int, slope_energy long,"
        " n_flat long, " + ", ".join(f"s{o} long" for o in range(8))
    )
    return halo_joined(tiles).mapInPandas(finish, out_schema)


# --- terra::resample (bilinear) and terra::aggregate analogs -----------------

# Resample target grid: 640×480 over the same extent (NPX/RNX = NPY/RNY
# = 1.6 = 16/10).  The source coordinate of target center (it, jt) is
# gx = (it+0.5)·NPX/RNX − 0.5 = (16·it + 3)/10 — an exact rational with
# denominator 10, so the bilinear weights are integers over DEN=10 per
# axis and the resampled numerator Σ v·wx·wy (denominator 100) is
# integer-exact: v < V_MOD ≈ 1e6, ×100 → 1e8 ≪ 2^53.
RNX, RNY = 640, 480
_RS_DEN = 10  # per-axis weight denominator


def resample_src_coords(t: np.ndarray) -> tuple:
    """Target index → (floor source index, fractional numerator /10)."""
    gn = 16 * t.astype(np.int64) + 3
    return gn // _RS_DEN, gn % _RS_DEN


def resample_bilinear_tiles(tiles: DataFrame) -> DataFrame:
    """terra::resample(method="bilinear") analog on the partitioned
    raster (chopin feeds terra rasters whose grids rarely match —
    /root/reference/R/processing.R:148-228 extracts at caller-supplied
    grids; resample is the missing grid-alignment verb).

    Distribution: each target pixel is OWNED by the tile containing its
    floor source pixel (i0, j0); the +1 neighbors are at most one pixel
    east/south, i.e. inside the 1-px halo that :func:`halo_joined`
    already ships as boundary STRIPS (shuffle = tile surface, not
    volume — same scale argument as focal_sum_tiles).  No target pixel
    is computed twice, none is dropped: ownership is a partition of the
    target grid because floor is a function.

    All-integer bilinear: numerator = Σ₄ v·wx·wy with wx+wx' = wy+wy'
    = 10, denominator 100 (a driver-side constant divide left to the
    caller).  Per tile returns (raster_id, tile_id, n_tgt, num_sum,
    num_chk) where num_chk position-weights each numerator by
    ((it·31 + jt·17) % 97) — a placement-sensitive checksum that
    catches off-by-one ownership or halo wiring, not just value drift.
    """
    T = TILE

    its = np.arange(RNX, dtype=np.int64)
    jts = np.arange(RNY, dtype=np.int64)
    i0_all, fx_all = resample_src_coords(its)
    j0_all, fy_all = resample_src_coords(jts)

    def finish(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["values"].notna()]
            rid, tid, ntg, nsum, nchk = [], [], [], [], []
            for row in pdf.itertuples(index=False):
                p, m = assemble_padded(row)
                c, r = row.tile_col, row.tile_row
                sel_i = (i0_all >= c * T) & (i0_all < (c + 1) * T)
                sel_j = (j0_all >= r * T) & (j0_all < (r + 1) * T)
                if not (sel_i.any() and sel_j.any()):
                    continue
                li = i0_all[sel_i] - c * T + 1
                lj = j0_all[sel_j] - r * T + 1
                fx = fx_all[sel_i][None, :]
                fy = fy_all[sel_j][:, None]
                JJ, II = lj[:, None], li[None, :]
                if not (
                    m[JJ, II].all() and m[JJ, II + 1].all()
                    and m[JJ + 1, II].all() and m[JJ + 1, II + 1].all()
                ):
                    raise RuntimeError(
                        f"resample halo missing for tile {row.tile_id}"
                    )
                num = (
                    p[JJ, II] * (_RS_DEN - fx) * (_RS_DEN - fy)
                    + p[JJ, II + 1] * fx * (_RS_DEN - fy)
                    + p[JJ + 1, II] * (_RS_DEN - fx) * fy
                    + p[JJ + 1, II + 1] * fx * fy
                )
                wt = (
                    its[sel_i][None, :] * 31 + jts[sel_j][:, None] * 17
                ) % 97
                rid.append(row.raster_id)
                tid.append(row.tile_id)
                ntg.append(int(num.size))
                nsum.append(int(num.sum()))
                nchk.append(int((num * wt).sum()))
            yield pd.DataFrame(
                {
                    "raster_id": rid,
                    "tile_id": pd.Series(tid, dtype="int64"),
                    "n_tgt": pd.Series(ntg, dtype="int64"),
                    "num_sum": pd.Series(nsum, dtype="int64"),
                    "num_chk": pd.Series(nchk, dtype="int64"),
                }
            )

    out_schema = (
        "raster_id string, tile_id long, n_tgt long, num_sum long,"
        " num_chk long"
    )
    return halo_joined(tiles).mapInPandas(finish, out_schema)


def aggregate_blocks_tiles(tiles: DataFrame, factor: int = 4) -> DataFrame:
    """terra::aggregate(fact=factor, fun=max/min) analog: downsample by
    non-overlapping factor×factor blocks.  With factor | TILE every
    block is interior to one tile, so this is a ZERO-SHUFFLE per-tile
    map — the stencil case that needs no halo at all (the scale contrast
    to focal/resample; at 100 TB it is a pure narrow transformation).

    Non-linear block stats (max/min) are kept — a block SUM would
    telescope into the plain tile sum and verify nothing about the
    blocking.  Returns per tile (raster_id, tile_id, n_blocks,
    sum_bmax, sum_bmin, chk) with chk = Σ (bmax − bmin)·((bi·13 +
    bj·7) % 31) over global block indices — sensitive to block
    placement, not just the value multiset.
    """
    if TILE % factor:
        raise ValueError("factor must divide TILE")
    T, fB = TILE, TILE // factor

    def finish(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["values"].notna()]
            rid, tid, nb, smx, smn, chk = [], [], [], [], [], []
            for row in pdf.itertuples(index=False):
                v = np.asarray(row.values, dtype=np.int64).reshape(T, T)
                b = v.reshape(fB, factor, fB, factor)
                bmax = b.max(axis=(1, 3))
                bmin = b.min(axis=(1, 3))
                bj0 = row.tile_row * fB
                bi0 = row.tile_col * fB
                wt = (
                    (bi0 + np.arange(fB))[None, :] * 13
                    + (bj0 + np.arange(fB))[:, None] * 7
                ) % 31
                rid.append(row.raster_id)
                tid.append(row.tile_id)
                nb.append(fB * fB)
                smx.append(int(bmax.sum()))
                smn.append(int(bmin.sum()))
                chk.append(int(((bmax - bmin) * wt).sum()))
            yield pd.DataFrame(
                {
                    "raster_id": rid,
                    "tile_id": pd.Series(tid, dtype="int64"),
                    "n_blocks": pd.Series(nb, dtype="int64"),
                    "sum_bmax": pd.Series(smx, dtype="int64"),
                    "sum_bmin": pd.Series(smn, dtype="int64"),
                    "chk": pd.Series(chk, dtype="int64"),
                }
            )

    out_schema = (
        "raster_id string, tile_id long, n_blocks long, sum_bmax long,"
        " sum_bmin long, chk long"
    )
    return tiles.mapInPandas(finish, out_schema)


def halo_joined_r(tiles: DataFrame, r: int) -> DataFrame:
    """Radius-parameterized halo exchange — the generalization of
    :func:`halo_joined` (r=1) to any stencil radius ≤ TILE (terra::
    focal(w=matrix(2r+1))).  Neighbors receive r-row/r-column strips
    and r×r corner blocks, flattened row-major; shuffle volume stays
    the halo SURFACE (≈ 2r/TILE of tile volume).  Output rows feed
    :func:`assemble_padded_r` with the same r."""
    if not (1 <= r <= TILE):
        raise ValueError(f"halo radius {r} outside 1..{TILE}")

    strip_schema = (
        "raster_id string, tile_id long, edr int, edc int,"
        " strip array<long>"
    )

    def strips(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[pdf["values"].notna()]
            rid, dst, edr, edc, st = [], [], [], [], []
            for row in pdf.itertuples(index=False):
                v = np.asarray(row.values, dtype=np.int64).reshape(
                    TILE, TILE
                )
                for dtr in (-1, 0, 1):
                    for dtc in (-1, 0, 1):
                        if dtr == 0 and dtc == 0:
                            continue
                        nr, nc = row.tile_row + dtr, row.tile_col + dtc
                        if not (0 <= nr < TNY and 0 <= nc < TNX):
                            continue
                        js = slice(0, r) if dtr == -1 else (
                            slice(TILE - r, TILE) if dtr == 1
                            else slice(0, TILE)
                        )
                        is_ = slice(0, r) if dtc == -1 else (
                            slice(TILE - r, TILE) if dtc == 1
                            else slice(0, TILE)
                        )
                        s = v[js, is_]
                        rid.append(row.raster_id)
                        dst.append(nr * TNX + nc)
                        edr.append(-dtr)
                        edc.append(-dtc)
                        st.append([int(x) for x in s.ravel()])
            yield pd.DataFrame(
                {
                    "raster_id": rid,
                    "tile_id": pd.Series(dst, dtype="int64"),
                    "edr": pd.Series(edr, dtype="int32"),
                    "edc": pd.Series(edc, dtype="int32"),
                    "strip": st,
                }
            )

    halo = (
        tiles.mapInPandas(strips, strip_schema)
        .groupBy("raster_id", "tile_id")
        .agg(
            F.collect_list(F.struct("edr", "edc", "strip")).alias("halos")
        )
    )
    return tiles.select(
        "raster_id", "tile_id", "tile_row", "tile_col", "values"
    ).join(halo, ["raster_id", "tile_id"], "left")


def assemble_padded_r(row, r: int) -> tuple:
    """halo_joined_r row → ((TILE+2r)² padded int64 array, mask)."""
    T = TILE
    p = np.zeros((T + 2 * r, T + 2 * r), dtype=np.int64)
    m = np.zeros((T + 2 * r, T + 2 * r), dtype=np.int64)
    p[r:-r, r:-r] = np.asarray(row.values, dtype=np.int64).reshape(T, T)
    m[r:-r, r:-r] = 1
    for h in (row.halos if row.halos is not None else []):
        edr, edc = h["edr"], h["edc"]
        s = np.asarray(h["strip"], dtype=np.int64)
        jj = slice(0, r) if edr == -1 else (
            slice(T + r, T + 2 * r) if edr == 1 else slice(r, T + r)
        )
        ii = slice(0, r) if edc == -1 else (
            slice(T + r, T + 2 * r) if edc == 1 else slice(r, T + r)
        )
        nj = r if edr != 0 else T
        ni = r if edc != 0 else T
        p[jj, ii] = s.reshape(nj, ni)
        m[jj, ii] = 1
    return p, m


TPI_THETA = 100_000  # landform threshold, DN units (V_MOD = 1e6)


def tpi_landform_tiles(tiles: DataFrame, theta: int = TPI_THETA) -> DataFrame:
    """Two-scale Topographic Position Index landform classes (Weiss
    2001 / GRASS r.tpi / gdaldem TPI, the 3×3-vs-5×5 variant): per
    pixel, TPI_s = v − mean(3×3), TPI_l = v − mean(5×5), each sign-
    classified against ±theta, giving the 9 (sgn_s, sgn_l) landform
    combos (ridge, knob, upper/lower slope, flat/plain, valley, pit…).

    EXACT integer classification: the comparison TPI > θ is carried as
    v·cnt − sum > θ·cnt (int64 throughout, counts from the in-bounds
    mask so raster edges are window-truncated) — no division, no float
    knife-edges, so class counts are engine-exact.  One radius-2 halo
    exchange feeds both window sizes.  Returns per (raster, tile):
    9 class counts folded as (class_id, n_px) rows."""
    import numpy as np

    def classify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        T = TILE
        for pdf in batches:
            pdf = pdf[pdf["values"].notna()]
            rid, tid, cid, npx = [], [], [], []
            for row in pdf.itertuples(index=False):
                p, m = assemble_padded_r(row, 2)
                s5 = sum(p[a:a + T, b:b + T]
                         for a in range(5) for b in range(5))
                c5 = sum(m[a:a + T, b:b + T]
                         for a in range(5) for b in range(5))
                s3 = sum(p[a:a + T, b:b + T]
                         for a in range(1, 4) for b in range(1, 4))
                c3 = sum(m[a:a + T, b:b + T]
                         for a in range(1, 4) for b in range(1, 4))
                v = p[2:-2, 2:-2]
                ts = v * c3 - s3
                tl = v * c5 - s5
                sgs = np.sign((ts > theta * c3).astype(np.int64)
                              - (ts < -theta * c3))
                sgl = np.sign((tl > theta * c5).astype(np.int64)
                              - (tl < -theta * c5))
                cls = (3 * (sgs + 1) + (sgl + 1)).ravel()
                counts = np.bincount(cls, minlength=9)
                for k in range(9):
                    if counts[k]:
                        rid.append(row.raster_id)
                        tid.append(row.tile_id)
                        cid.append(k)
                        npx.append(int(counts[k]))
            yield pd.DataFrame(
                {
                    "raster_id": rid,
                    "tile_id": pd.Series(tid, dtype="int64"),
                    "class_id": pd.Series(cid, dtype="int64"),
                    "n_px": pd.Series(npx, dtype="int64"),
                }
            )

    out_schema = "raster_id string, tile_id long, class_id long, n_px long"
    return halo_joined_r(tiles, 2).mapInPandas(classify, out_schema)
