"""Parallel runners (SURVEY.md §2.2) — chopin's physical execution
operators re-expressed as single Spark stages.

chopin's runner contract (par_grid, /root/reference/R/scale_process.R:99-232):
for each grid cell, crop the *keyed* side to the original cell (each row
exactly once) and the *context* side to the padded cell (rows duplicated
near borders), run an arbitrary two-input function per cell, union the
results. The padding guarantees partitioned == unpartitioned for any
function whose reach is ≤ pad — the package's headline equality contract
(/root/reference/README.md:463-468).

Here the whole runner is ONE cogrouped applyInPandas stage: the shuffle
+ Arrow batch transfer replaces chopin's per-task process spawn and
per-task GDAL re-read. Error handling preserves chopin's semantics
(/root/reference/R/scale_process.R:209-219): errors drop the cell's
rows, or with debug=True emit (cgridid, error_message) rows.
"""

from __future__ import annotations

import traceback
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chopin_spark.grid import RectGrid

ERROR_COL = "error_message"


def par_convert_f(fun: Callable, **rename) -> Callable:
    """R5 par_convert_f (/root/reference/R/scale_process.R:873-894):
    adapt a user function whose parameter names differ from the
    engine's x/y convention — `par_convert_f(f, x='points', y='raster')`
    calls f(points=..., raster=...)."""

    def adapted(*args, **kwargs):
        # runners invoke fun POSITIONALLY as (keyed, context) == (x, y);
        # bind positionals to the engine names first, then rename, and
        # call fun entirely by keyword so the adapter actually reorders
        # (a pass-through *args would silently ignore the mapping)
        named = dict(zip(("x", "y"), args))
        named.update(kwargs)
        mapped = {rename.get(k, k): v for k, v in named.items()}
        return fun(**mapped)

    return adapted


def _with_error_col(schema: str) -> str:
    return f"{schema}, {ERROR_COL} string"


def _schema_col_names(schema: str) -> list[str]:
    """Column names of a DDL schema string, split on TOP-LEVEL commas
    only — `v decimal(10,2)` / `m map<string,int>` / nested structs all
    contain commas inside (), <> that a naive split(',') would break
    on."""
    cols, depth, start = [], 0, 0
    for i, ch in enumerate(schema):
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        elif ch == "," and depth == 0:
            cols.append(schema[start:i])
            start = i + 1
    cols.append(schema[start:])
    return [c.strip().split()[0] for c in cols if c.strip()]


def _empty_like(schema_cols: list[str]) -> pd.DataFrame:
    return pd.DataFrame({c: pd.Series(dtype="object") for c in schema_cols})


def par_grid(
    keyed: DataFrame,
    context: DataFrame,
    grid: RectGrid,
    fun: Callable[[pd.DataFrame, pd.DataFrame], pd.DataFrame],
    schema: str,
    debug: bool = False,
) -> DataFrame:
    """R1 par_grid (/root/reference/R/scale_process.R:99-232) as a
    cogrouped-map stage.

    `keyed` rows are assigned to exactly one cell (original window);
    `context` rows to every cell whose padded twin contains them
    (chopin's pad_y switch — which side is padded — is expressed by
    argument position: pass the padded side as `context`).
    `fun(keyed_pdf, context_pdf) -> pdf` runs once per cell on Arrow
    batches. Result cells are unioned by the stage itself (chopin's
    `collapse::rowbind(fill=TRUE)` disappears).
    """
    k = grid.assign_core(keyed)
    c = grid.assign_padded(context).drop("is_core")

    out_schema = _with_error_col(schema) if debug else schema
    # column names of the declared schema, in order
    schema_cols = _schema_col_names(out_schema)

    def runner(key, kpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if kpdf.empty:
            return _empty_like(schema_cols)
        try:
            res = fun(
                kpdf.drop(columns=["cgridid"]), cpdf.drop(columns=["cgridid"])
            )
            if res is None:
                return _empty_like(schema_cols)
            if "cgridid" in schema_cols and "cgridid" not in res.columns:
                res = res.assign(cgridid=key[0])
            if debug:
                res = res.assign(**{ERROR_COL: None})
            return res.reindex(columns=schema_cols)
        except Exception:
            if not debug:
                return _empty_like(schema_cols)  # chopin: NULL → dropped
            row = {col: [None] for col in schema_cols}
            if "cgridid" in schema_cols:
                row["cgridid"] = [key[0]]
            row[ERROR_COL] = [traceback.format_exc(limit=1).splitlines()[-1]]
            return pd.DataFrame(row)

    return (
        k.groupBy("cgridid")
        .cogroup(c.groupBy("cgridid"))
        .applyInPandas(runner, out_schema)
    )


def par_cells(
    keyed: DataFrame,
    context: DataFrame,
    cell_col: str,
    fun: Callable[[pd.DataFrame, pd.DataFrame], pd.DataFrame],
    schema: str,
    debug: bool = False,
) -> DataFrame:
    """par_grid generalized to ANY precomputed cell index (S2 prefix,
    hex id, quadkey): both inputs already carry `cell_col` — keyed
    exactly once, context duplicated into every cell of its padded
    neighborhood (e.g. the wrapped S2 disk table) — and `fun` runs per
    cell on the cogrouped Arrow batches.  This is the runner face of
    the north star's "par_grid … over S2 cells": the RectGrid variant
    assigns cells arithmetically; here the caller brings the index."""
    out_schema = _with_error_col(schema) if debug else schema
    schema_cols = _schema_col_names(out_schema)

    def runner(key, kpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if kpdf.empty:
            return _empty_like(schema_cols)
        try:
            res = fun(
                kpdf.drop(columns=[cell_col]), cpdf.drop(columns=[cell_col])
            )
            if res is None:
                return _empty_like(schema_cols)
            if cell_col in schema_cols and cell_col not in res.columns:
                res = res.assign(**{cell_col: key[0]})
            if debug:
                res = res.assign(**{ERROR_COL: None})
            return res.reindex(columns=schema_cols)
        except Exception:
            if not debug:
                return _empty_like(schema_cols)
            row = {col: [None] for col in schema_cols}
            if cell_col in schema_cols:
                row[cell_col] = [key[0]]
            row[ERROR_COL] = [traceback.format_exc(limit=1).splitlines()[-1]]
            return pd.DataFrame(row)

    return (
        keyed.groupBy(cell_col)
        .cogroup(context.groupBy(cell_col))
        .applyInPandas(runner, out_schema)
    )


def par_grid_map(
    df: DataFrame,
    grid: RectGrid,
    fun: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    padded: bool = True,
    debug: bool = False,
) -> DataFrame:
    """Single-table grouped-map runner: the cell sees its padded
    neighborhood (rows carry `is_core`); `fun` computes on all rows and
    is responsible for emitting results only for core rows (the
    dedup-free padded-execution pattern, SURVEY.md §4 'boundary
    correctness via padding')."""
    a = (
        grid.assign_padded(df)
        if padded
        else grid.assign_core(df).withColumn("is_core", F.lit(True))
    )
    out_schema = _with_error_col(schema) if debug else schema
    schema_cols = _schema_col_names(out_schema)

    def runner(key, pdf: pd.DataFrame) -> pd.DataFrame:
        try:
            res = fun(pdf.drop(columns=["cgridid"]))
            if res is None:
                return _empty_like(schema_cols)
            if "cgridid" in schema_cols and "cgridid" not in res.columns:
                res = res.assign(cgridid=key[0])
            if debug:
                res = res.assign(**{ERROR_COL: None})
            return res.reindex(columns=schema_cols)
        except Exception:
            if not debug:
                return _empty_like(schema_cols)
            row = {col: [None] for col in schema_cols}
            if "cgridid" in schema_cols:
                row["cgridid"] = [key[0]]
            row[ERROR_COL] = [traceback.format_exc(limit=1).splitlines()[-1]]
            return pd.DataFrame(row)

    return a.groupBy("cgridid").applyInPandas(runner, out_schema)


def par_hierarchy(
    keyed: DataFrame,
    fun: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    region_col: str,
    length_left: int | None = None,
    debug: bool = False,
) -> DataFrame:
    """R2 par_hierarchy (/root/reference/R/scale_process.R:375-596):
    partition key = the hierarchical region id or its left prefix
    (`substr(vec_regions_id, 1, length_left)`, :460-462). One grouped-map
    stage on the prefix — the reference's per-prefix whole-input re-read
    becomes a hash shuffle."""
    key = (
        F.substring(F.col(region_col), 1, length_left)
        if length_left
        else F.col(region_col)
    )
    df = keyed.withColumn("_hkey", key)
    out_schema = _with_error_col(schema) if debug else schema
    schema_cols = _schema_col_names(out_schema)

    def runner(k, pdf: pd.DataFrame) -> pd.DataFrame:
        try:
            res = fun(pdf.drop(columns=["_hkey"]))
            if res is None:
                return _empty_like(schema_cols)
            if "hkey" in schema_cols and "hkey" not in res.columns:
                res = res.assign(hkey=k[0])
            if debug:
                res = res.assign(**{ERROR_COL: None})
            return res.reindex(columns=schema_cols)
        except Exception:
            if not debug:
                return _empty_like(schema_cols)
            row = {col: [None] for col in schema_cols}
            if "hkey" in schema_cols:
                row["hkey"] = [k[0]]
            row[ERROR_COL] = [traceback.format_exc(limit=1).splitlines()[-1]]
            return pd.DataFrame(row)

    return df.groupBy("_hkey").applyInPandas(runner, out_schema)


def par_hierarchy_spatial(
    keyed: DataFrame,
    regions: DataFrame,
    fun: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    region_col: str,
    length_left: int,
    pad: float,
    x_col: str = "x",
    y_col: str = "y",
    debug: bool = False,
) -> DataFrame:
    """R2's spatial-fallback branch (/root/reference/R/scale_process.R:
    509-562): when the fact side has NO region FK column, rows are
    assigned to every prefix whose padded subregion bbox contains them
    (the reference's `.intersect` against the buffered subregion,
    :518-562). Rows inside the pad band of several prefixes are
    duplicated — the reference documents exactly this dup/missing
    caveat (:267-273); callers that need exactly-once semantics join a
    FK and use par_hierarchy instead.

    The prefix dimension (bbox per prefix) is tiny → broadcast
    containment join, then one grouped-map stage."""
    prefixes = F.broadcast(
        regions.groupBy(
            F.substring(F.col(region_col), 1, length_left).alias("_hkey")
        ).agg(
            (F.min("xmin") - pad).alias("_bx0"),
            (F.min("ymin") - pad).alias("_by0"),
            (F.max("xmax") + pad).alias("_bx1"),
            (F.max("ymax") + pad).alias("_by1"),
        )
    )
    assigned = keyed.join(
        prefixes,
        (F.col(x_col) >= F.col("_bx0"))
        & (F.col(x_col) < F.col("_bx1"))
        & (F.col(y_col) >= F.col("_by0"))
        & (F.col(y_col) < F.col("_by1")),
    ).drop("_bx0", "_by0", "_bx1", "_by1")

    out_schema = _with_error_col(schema) if debug else schema
    schema_cols = _schema_col_names(out_schema)

    def runner(k, pdf: pd.DataFrame) -> pd.DataFrame:
        try:
            res = fun(pdf.drop(columns=["_hkey"]))
            if res is None:
                return _empty_like(schema_cols)
            if "hkey" in schema_cols and "hkey" not in res.columns:
                res = res.assign(hkey=k[0])
            if debug:
                res = res.assign(**{ERROR_COL: None})
            return res.reindex(columns=schema_cols)
        except Exception:
            if not debug:
                return _empty_like(schema_cols)
            row = {col: [None] for col in schema_cols}
            if "hkey" in schema_cols:
                row["hkey"] = [k[0]]
            row[ERROR_COL] = [traceback.format_exc(limit=1).splitlines()[-1]]
            return pd.DataFrame(row)

    return assigned.groupBy("_hkey").applyInPandas(runner, out_schema)


def par_multirasters(
    rasters: DataFrame,
    fun: Callable[[pd.DataFrame], pd.DataFrame],
    schema: str,
    raster_col: str = "raster_id",
    debug: bool = True,
) -> DataFrame:
    """R3 par_multirasters (/root/reference/R/scale_process.R:686-787):
    one task per raster id over a tile table partitioned by raster_id;
    the provenance column `base_raster` (:764) is the group key; a
    failing raster contributes one error row and the job proceeds
    (:766-775 — row-count contract n_zones × n_files + 1 error row per
    corrupt file, tests/testthat/test-scale_process.R:1230-1234,:1324)."""
    out_schema = f"base_raster string, {schema}"
    if debug:
        out_schema = _with_error_col(out_schema)
    schema_cols = _schema_col_names(out_schema)

    def runner(key, pdf: pd.DataFrame) -> pd.DataFrame:
        try:
            res = fun(pdf)
            if res is None:
                return _empty_like(schema_cols)
            res = res.assign(base_raster=key[0])
            if debug:
                res = res.assign(**{ERROR_COL: None})
            return res.reindex(columns=schema_cols)
        except Exception:
            if not debug:
                return _empty_like(schema_cols)
            row = {col: [None] for col in schema_cols}
            row["base_raster"] = [key[0]]
            row[ERROR_COL] = [traceback.format_exc(limit=1).splitlines()[-1]]
            return pd.DataFrame(row)

    return rasters.groupBy(raster_col).applyInPandas(runner, out_schema)
