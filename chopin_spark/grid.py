"""Computational-grid builders (SURVEY.md §2.1, P1–P5).

A grid is a rectangular partition of the plane given by per-axis break
arrays, plus a buffer `pad`. It provides three things:

- ``assign_core(df)``: exactly-one-cell membership (half-open floor
  math — a *function*, fixing the reference's boundary-drop caveat,
  /root/reference/tests/testthat/test-scale_process.R:320-322);
- ``assign_padded(df)``: membership in every cell whose padded twin
  contains the point (a relation, ≤4 cells when pad < cell size),
  computed by exploding an index-range candidate set — an equi-join-
  shaped plan that survives 100× scale-up (never a theta join);
- ``cells_df(spark)``: the broadcastable grid dimension
  ``(cgridid, xmin..ymax, pxmin..pymax, cell_wkb, padded_wkb)`` —
  chopin's `list(original=, padded=)` pair
  (/root/reference/R/gridding.R:202-206) as one table.

Everything is JVM-side column arithmetic; the only Python here runs at
plan time on driver-side metadata (break arrays, cell tables — tiny).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from functools import reduce

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark import EXTENT


def _index_col(v: Column, breaks: np.ndarray) -> Column:
    """Cell index of value v against sorted breaks (len n+1) → [0, n).

    Uniform breaks → floor math (one expression, codegen-friendly);
    irregular breaks (quantile grids) → a WHEN chain over the interior
    breaks (n is small — grids are partition schemes, not data).
    Clamped to [0, n) at both ends.
    """
    n = len(breaks) - 1
    widths = np.diff(breaks)
    # the floor path must agree EXACTLY with the break values used by
    # the containment filters — near-uniform quantile breaks (default
    # rtol would accept ~1e-5 width drift) must take the WHEN chain
    if np.allclose(widths, widths[0], rtol=1e-12, atol=0.0):
        ix = F.floor((v - float(breaks[0])) / float(widths[0]))
        return F.least(F.greatest(ix, F.lit(0)), F.lit(n - 1)).cast("long")
    expr = F.lit(n - 1)
    for i in range(n - 1, 0, -1):
        expr = F.when(v < float(breaks[i]), i - 1).otherwise(expr)
    return expr.cast("long")


@dataclass
class RectGrid:
    """Rectangular partition with padded twins (chopin's computational
    grid, par_pad_grid /root/reference/R/gridding.R:102-223)."""

    xbreaks: np.ndarray
    ybreaks: np.ndarray
    pad: float = 0.0
    x_col: str = "x"
    y_col: str = "y"
    nx: int = field(init=False)
    ny: int = field(init=False)

    def __post_init__(self):
        self.xbreaks = np.asarray(self.xbreaks, dtype=np.float64)
        self.ybreaks = np.asarray(self.ybreaks, dtype=np.float64)
        self.nx = len(self.xbreaks) - 1
        self.ny = len(self.ybreaks) - 1

    # --- assignment -------------------------------------------------

    def cell_id(self) -> Column:
        ix = _index_col(F.col(self.x_col), self.xbreaks)
        iy = _index_col(F.col(self.y_col), self.ybreaks)
        return (iy * self.nx + ix).alias("cgridid")

    def assign_core(self, df: DataFrame) -> DataFrame:
        """Exactly-one-cell assignment (the 'original' window)."""
        return df.withColumn("cgridid", self.cell_id())

    def assign_padded(self, df: DataFrame) -> DataFrame:
        """All-padded-cells assignment + is_core flag.

        Candidate cells per axis = index range
        [index(v - pad), index(v + pad)] (contiguous by monotonicity of
        the break search), exploded via `sequence` — pure column math.
        An exact containment post-filter guards the clamped edges, but
        a row's *core* cell is always kept (``is_core OR contained``):
        out-of-extent points clamp to an edge cell exactly like
        ``assign_core``, so ``sum(n_core) == row count`` holds for any
        input, not just in-extent data (ADVICE.md round 1).
        """
        x, y = F.col(self.x_col), F.col(self.y_col)
        xb = F.array([F.lit(float(b)) for b in self.xbreaks])
        yb = F.array([F.lit(float(b)) for b in self.ybreaks])
        out = (
            df.withColumn("_ix0", _index_col(x, self.xbreaks))
            .withColumn("_iy0", _index_col(y, self.ybreaks))
            .withColumn(
                "_ix",
                F.explode(
                    F.sequence(
                        _index_col(x - self.pad, self.xbreaks),
                        _index_col(x + self.pad, self.xbreaks),
                    )
                ),
            )
            .withColumn(
                "_iy",
                F.explode(
                    F.sequence(
                        _index_col(y - self.pad, self.ybreaks),
                        _index_col(y + self.pad, self.ybreaks),
                    )
                ),
            )
            .withColumn(
                "is_core",
                (F.col("_ix") == F.col("_ix0")) & (F.col("_iy") == F.col("_iy0")),
            )
            # exact padded-rect containment (cell bounds via array lookup);
            # the core cell always survives (out-of-extent clamp parity
            # with assign_core)
            .filter(
                F.col("is_core")
                | (
                    (x >= F.element_at(xb, F.col("_ix").cast("int") + 1) - self.pad)
                    & (x < F.element_at(xb, F.col("_ix").cast("int") + 2) + self.pad)
                    & (y >= F.element_at(yb, F.col("_iy").cast("int") + 1) - self.pad)
                    & (y < F.element_at(yb, F.col("_iy").cast("int") + 2) + self.pad)
                )
            )
            .withColumn("cgridid", F.col("_iy") * self.nx + F.col("_ix"))
            .drop("_ix0", "_iy0", "_ix", "_iy")
        )
        return out

    # --- materialized grid table ------------------------------------

    def cells_pdf(self) -> pd.DataFrame:
        from chopin_spark.geom.wkb import rect_wkb

        rows = []
        for iy in range(self.ny):
            for ix in range(self.nx):
                x0, x1 = float(self.xbreaks[ix]), float(self.xbreaks[ix + 1])
                y0, y1 = float(self.ybreaks[iy]), float(self.ybreaks[iy + 1])
                p = self.pad
                rows.append(
                    {
                        "cgridid": iy * self.nx + ix,
                        "xmin": x0, "ymin": y0, "xmax": x1, "ymax": y1,
                        "pxmin": x0 - p, "pymin": y0 - p,
                        "pxmax": x1 + p, "pymax": y1 + p,
                        "cell_wkb": rect_wkb(x0, y0, x1, y1),
                        "padded_wkb": rect_wkb(x0 - p, y0 - p, x1 + p, y1 + p),
                    }
                )
        return pd.DataFrame(rows)

    def cells_df(self, spark: SparkSession) -> DataFrame:
        """Broadcastable grid dimension (chopin returns this pair of sf
        objects; return_wkt mode /root/reference/R/gridding.R:208-220 is
        covered by geom.wkb.wkt at the API edge)."""
        return spark.createDataFrame(self.cells_pdf())


# --- P2 par_make_grid: regular nx×ny grid ---------------------------------


def make_regular_grid(
    nx: int, ny: int, pad: float = 0.0, extent=EXTENT,
    x_col: str = "x", y_col: str = "y",
) -> RectGrid:
    """P2 (/root/reference/R/gridding.R:337-367): regular grid over an
    extent; chopin's CGRIDID = seq_len(n) becomes iy*nx+ix row-major."""
    return RectGrid(
        np.linspace(extent[0], extent[2], nx + 1),
        np.linspace(extent[1], extent[3], ny + 1),
        pad, x_col, y_col,
    )


def grid_from_extent_of(
    df: DataFrame, nx: int, ny: int, pad: float = 0.0,
    x_col: str = "x", y_col: str = "y",
) -> RectGrid:
    """Grid over the data's own bbox (chopin computes the grid from the
    input extent). One tiny 4-number agg — the Spark analogue of
    `terra::ext(points_in)`."""
    r = df.agg(
        F.min(x_col), F.max(x_col), F.min(y_col), F.max(y_col)
    ).collect()[0]
    if r[0] is None:
        raise ValueError("grid_from_extent_of: empty input DataFrame")
    # nudge the max edge so max-coordinate points stay in the last cell
    # under half-open membership
    eps_x = (r[1] - r[0]) * 1e-9 or 1e-9
    eps_y = (r[3] - r[2]) * 1e-9 or 1e-9
    return RectGrid(
        np.linspace(r[0], r[1] + eps_x, nx + 1),
        np.linspace(r[2], r[3] + eps_y, ny + 1),
        pad, x_col, y_col,
    )


# --- P4 par_def_q / par_cut_coords: quantile grid --------------------------


def quantile_grid(
    df: DataFrame, steps: int, pad: float = 0.0,
    x_col: str = "x", y_col: str = "y", relative_error: float = 0.0,
) -> RectGrid:
    """P4 (/root/reference/R/gridding.R:414-502): per-axis quantile
    breaks → steps² cells with near-equal population. Uses
    approxQuantile (Greenwald–Khanna, one pass, distributed);
    relative_error=0 gives exact quantiles (still distributed — this is
    the scale path, unlike a global ntile sort)."""
    probs = [i / steps for i in range(steps + 1)]
    qx, qy = df.stat.approxQuantile([x_col, y_col], probs, relative_error)
    qx[0], qy[0] = qx[0] - 1.0, qy[0] - 1.0
    qx[-1], qy[-1] = qx[-1] + 1.0, qy[-1] + 1.0  # half-open top edge
    # enforce monotonic breaks (approxQuantile can locally invert under
    # relative_error > 0).  Heavy ties still produce EQUAL breaks =
    # zero-width cells: no keyed point lands there (half-open membership
    # is a function), they only receive context rows within pad — wasted
    # shuffle, not wrong answers
    qx = np.maximum.accumulate(np.asarray(qx))
    qy = np.maximum.accumulate(np.asarray(qy))
    return RectGrid(qx, qy, pad, x_col, y_col)


# --- P3 par_merge_grid: skew-aware coalescing ------------------------------


def merge_grid(
    counts: dict[int, int], nx: int, ny: int,
    grid_min_features: int, merge_max: int = 4,
) -> tuple[dict[int, str], list[tuple[str, float]]]:
    """P3 (/root/reference/R/gridding.R:558-766): coalesce under-
    populated cells with rook-contiguous neighbors.

    chopin builds the rook graph via DE-9IM `st_relate` patterns
    (:606-609); on a regular grid adjacency is index math (±1, ±nx).
    Connected components via union-find replace igraph MST+components
    (:648-652); components are capped at `merge_max` members in cell-id
    order (:664-709); merged labels are the "a_b_c" join of members
    (:718-719); Polsby–Popper compactness 4πA/P² of each merged union is
    checked against chopin's 0.3 warning threshold (:739-760) — exact
    for unions of unit cells via shared-edge counting.

    Input is the per-cell count table (tiny — cells, not rows; chopin
    also materializes it driver-side). Returns (cell→label remap,
    [(label, polsby_popper)] for merged cells).
    """
    nonzero = sorted(c for c, n in counts.items() if n > 0)
    small = {c for c in nonzero if counts[c] < grid_min_features}

    parent = {c: c for c in small}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for c in small:
        ix, iy = c % nx, c // nx
        for dx, dy in ((1, 0), (0, 1)):
            jx, jy = ix + dx, iy + dy
            if jx < nx and jy < ny and (jy * nx + jx) in small:
                union(c, jy * nx + jx)

    comps: dict[int, list[int]] = {}
    for c in small:
        comps.setdefault(find(c), []).append(c)

    remap: dict[int, str] = {c: str(c) for c in nonzero if c not in small}
    pp_stats: list[tuple[str, float]] = []
    for members in comps.values():
        members.sort()
        for i in range(0, len(members), merge_max):
            chunk = members[i : i + merge_max]
            label = "_".join(str(c) for c in chunk)
            for c in chunk:
                remap[c] = label
            if len(chunk) > 1:
                cs = set(chunk)
                area = float(len(chunk))
                perim = 0.0
                for c in chunk:
                    ix, iy = c % nx, c // nx
                    for jx, jy in ((ix-1, iy), (ix+1, iy), (ix, iy-1), (ix, iy+1)):
                        if not (0 <= jx < nx and 0 <= jy < ny) or (
                            jy * nx + jx
                        ) not in cs:
                            perim += 1.0
                pp_stats.append(
                    (label, 4.0 * math.pi * area / (perim * perim))
                )
    return remap, pp_stats


# --- P5 par_make_balanced: equal-size spatial clustering --------------------


def morton_code(x: Column, y: Column, extent=EXTENT, bits: int = 16) -> Column:
    """Z-order (Morton) code from planar coords — bit-interleave of the
    two normalized axis indices via magic-number spreading; pure JVM
    bitwise ops, no UDF. The space-filling-curve order behind the
    deterministic balanced partitioner."""
    n = 1 << bits
    # clamp BOTH ends: without the lower clamp an out-of-extent-left
    # point yields ix = -1, which bit-spreads to a near-maximal code
    # and sorts to the far corner
    ix = F.greatest(
        F.lit(0),
        F.least(
            F.lit(n - 1),
            F.floor(
                (x - extent[0]) / ((extent[2] - extent[0]) / n)
            ).cast("long"),
        ),
    )
    iy = F.greatest(
        F.lit(0),
        F.least(
            F.lit(n - 1),
            F.floor(
                (y - extent[1]) / ((extent[3] - extent[1]) / n)
            ).cast("long"),
        ),
    )

    def spread(v: Column) -> Column:
        v = v.bitwiseOR(F.shiftleft(v, 16)).bitwiseAND(F.lit(0x0000FFFF0000FFFF))
        v = v.bitwiseOR(F.shiftleft(v, 8)).bitwiseAND(F.lit(0x00FF00FF00FF00FF))
        v = v.bitwiseOR(F.shiftleft(v, 4)).bitwiseAND(F.lit(0x0F0F0F0F0F0F0F0F))
        v = v.bitwiseOR(F.shiftleft(v, 2)).bitwiseAND(F.lit(0x3333333333333333))
        v = v.bitwiseOR(F.shiftleft(v, 1)).bitwiseAND(F.lit(0x5555555555555555))
        return v

    return spread(ix).bitwiseOR(F.shiftleft(spread(iy), 1))


def apply_merge_remap(
    df: DataFrame, remap: dict[int, str], cell_col: str = "cgridid"
) -> DataFrame:
    """Relabel cell ids with a par_merge_grid remap (P3): the merged
    label becomes the partition key, so under-populated cells execute
    as one task — chopin's dissolve step applied to the execution
    partitioning instead of the geometry. Cells absent from the remap
    (empty at planning time) keep their own id."""
    mexpr = F.create_map(
        *[
            x
            for c, lbl in sorted(remap.items())
            for x in (F.lit(int(c)), F.lit(lbl))
        ]
    )
    return df.withColumn(
        "merged_cell",
        F.coalesce(
            mexpr.getItem(F.col(cell_col)), F.col(cell_col).cast("string")
        ),
    )


def salted_key(
    df: DataFrame,
    key_col: str,
    salt_counts: DataFrame,
    target_rows: int,
    row_key: str,
) -> DataFrame:
    """Count-aware salting (SURVEY.md §4 'skew mitigation — split large
    partitions'): per-key salt fan-out n_salt = ceil(count/target) from
    a count pre-pass; row's salt = pmod(hash(row_key), n_salt). Adds
    `salt` and `salted_key` columns. Deterministic (hash of a stable
    row key, never rand()) so lineage/resume stay valid.

    salt_counts: (key_col, n) — usually `df.groupBy(key).count()`, tiny,
    broadcast. Downstream: groupBy(salted_key) partial-agg, then
    groupBy(key) final-agg — the classic two-phase re-aggregation
    chopin approximates by re-splitting merged cells
    (/root/reference/R/gridding.R:664-709).
    """
    ns = F.greatest(
        F.lit(1), F.ceil(F.col("n") / F.lit(target_rows))
    ).cast("int")
    m = F.broadcast(salt_counts.select(key_col, ns.alias("_n_salt")))
    return (
        df.join(m, key_col, "left")
        .withColumn(
            "salt", F.pmod(F.hash(F.col(row_key)), F.coalesce("_n_salt", F.lit(1)))
        )
        .withColumn(
            "salted_key",
            F.concat_ws("_", F.col(key_col).cast("string"), F.col("salt")),
        )
        .drop("_n_salt")
    )


def salted_agg(
    df: DataFrame,
    key_col: str,
    row_key: str,
    aggs_partial: list,
    aggs_final: list,
    target_rows: int = 100_000,
) -> DataFrame:
    """Two-phase skew-safe aggregation: salt hot keys → partial agg on
    (key, salt) → final agg on key. aggs_partial/aggs_final are the
    partial and merge expressions (e.g. count→sum, sum→sum)."""
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    salted = salted_key(df, key_col, counts, target_rows, row_key)
    partial = salted.groupBy(key_col, "salt").agg(*aggs_partial)
    return partial.groupBy(key_col).agg(*aggs_final)


def balanced_assign(
    df: DataFrame, k: int, id_col: str,
    x_col: str = "x", y_col: str = "y", extent=EXTENT,
) -> DataFrame:
    """P5 par_make_balanced (/root/reference/R/gridding.R:388-405):
    equal-size spatial clusters. chopin solves an O(n²) distance-matrix
    anticlustering problem; the scale answer is Morton-order + ntile(k)
    — deterministic, O(n log n) distributed sort, exactly-equal sizes by
    construction (reference contract `all(table(CGRIDID) == 50)`,
    /root/reference/tests/testthat/test-gridding.R:254, holds when k | n).
    The ntile window is unbounded (single-reducer rank assignment); for
    >10^9 rows swap in approxQuantile breaks on the morton code —
    near-equal, fully distributed.
    """
    from pyspark.sql import Window as W

    m = morton_code(F.col(x_col), F.col(y_col), extent)
    w = W.orderBy(m, F.col(id_col))
    return df.withColumn("cgridid", F.ntile(k).over(w).cast("long") - 1)


def balanced_assign_approx(
    df: DataFrame, k: int,
    x_col: str = "x", y_col: str = "y", extent=EXTENT,
    relative_error: float = 0.001,
) -> DataFrame:
    """Scale path for P5: near-equal-size spatial clusters via
    approxQuantile breaks on the Morton code — fully distributed (no
    global window), sizes equal to within the quantile sketch error.
    This is the variant a 10^12-row table uses; the exact-equal ntile
    variant (balanced_assign) serves the reference's strict equal-size
    contract at moderate scale."""
    with_m = df.withColumn(
        "_m", morton_code(F.col(x_col), F.col(y_col), extent).cast("double")
    )
    probs = [i / k for i in range(1, k)]
    breaks = with_m.stat.approxQuantile("_m", probs, relative_error)
    expr = F.lit(k - 1)
    for i in range(k - 1, 0, -1):
        expr = F.when(F.col("_m") < float(breaks[i - 1]), i - 1).otherwise(expr)
    return with_m.withColumn("cgridid", expr.cast("long")).drop("_m")
