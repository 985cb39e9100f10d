"""Great-circle nearest-neighbor via the real S2 index — the north
rule's "(H3/S2 index, …, kNN)" on actual spherical coordinates.

Parity target: chopin's `par_grid` + `terra::nearest` workflow
(/root/reference/README.md:1040-1118) — candidate search inside a
padded cell neighborhood, exact fallback where the neighborhood is
empty.  The planar twin lives in chopin_spark/vector.py; this one runs
on lon/lat with haversine distance and S2 level-5 cell disks.

Exactness argument (same structure as vector.nearest_join): a
candidate result is only accepted when its distance ≤ R_SAFE, a
driver-computed lower bound (×0.7 safety, two full ring widths) on the
distance from any point to the outside of its 5×5 cell disk.  Disks
are expanded with cross-face wrap (s2.wrap_face_ij) so the covering
guarantee holds across cube-face boundaries — in-face clamping here
silently accepted wrong neighbors near the face-4/face-2 edge until
the brute-force oracle caught it.  Everything below the guarantee
falls back to an exact broadcast scan over the (small, dimension-side)
POI set, so the result is exact for every row; the DuckDB oracle IS
the brute-force exact nearest and verifies the machinery end-to-end.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark import s2
from chopin_spark.queries import register
from chopin_spark.runners import par_cells
from chopin_spark.queries.s2q import _LAT, _LON
from chopin_spark.tables import load

_LEVEL = 5  # ~2.8 deg cells: 3x3 disk usually holds >=1 of the 100 POIs


def _geocoded_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, lon, lat, s2_prefix) — ONE definition of
    the geocode projection + level-_LEVEL prefix UDF (this block was
    copy-pasted per query; a drifted copy silently mismatches cell
    assignments between the sphere queries)."""

    def _prefix(lon, lat):
        cid = s2.cell_id_from_lonlat(lon.to_numpy(), lat.to_numpy(), _LEVEL)
        return pd.Series(s2.prefix_from_cell_id(cid, _LEVEL))

    prefix_udf = F.pandas_udf(_prefix, "long")
    return (
        load(spark, sf_dir, "documents")
        .selectExpr("doc_id", f"{_LON} AS lon", f"{_LAT} AS lat")
        .withColumn("s2_prefix", prefix_udf(F.col("lon"), F.col("lat")))
    )

# POIs: supplier table geocoded into the same face-4 window
_PLON = "(-125.0 + 58.0 * (CAST(((s_suppkey * 48271) % 99991) AS DOUBLE) / 99991.0))"
_PLAT = "(24.0 + 26.0 * (CAST(((s_suppkey * 16807) % 99991) AS DOUBLE) / 99991.0))"


def _haversine_sql(lon1: str, lat1: str, lon2: str, lat2: str) -> str:
    """Identical text in Spark SQL and DuckDB; meters on the IUGG mean
    sphere.  libm-vs-JVM trig differs by ulps — far below the ROUND(2)
    output grain and never enough to flip an argmin."""
    return (
        f"(2.0 * {s2.EARTH_RADIUS_M!r} * ASIN(SQRT("
        f"POW(SIN(RADIANS(({lat2}) - ({lat1})) / 2), 2)"
        f" + COS(RADIANS({lat1})) * COS(RADIANS({lat2}))"
        f" * POW(SIN(RADIANS(({lon2}) - ({lon1})) / 2), 2))))"
    )


_NEAREST_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_LON} AS lon, {_LAT} AS lat FROM documents
),
p AS (
  SELECT s_suppkey AS poi_id, {_PLON} AS plon, {_PLAT} AS plat FROM supplier
),
x AS (
  SELECT doc_id, poi_id,
         {_haversine_sql('lon', 'lat', 'plon', 'plat')} AS dist
  FROM d CROSS JOIN p
)
SELECT doc_id,
       ARG_MIN(poi_id, dist) AS poi_id,
       ROUND(MIN(dist), 2) AS dist_m
FROM x
GROUP BY doc_id
"""


_DISK_MEMO: dict = {}


def _poi_disks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension side, chopin-style driver prep: collect the ~100 POIs,
    compute each one's 5×5 S2 cell disk with numpy, broadcast the
    (cell, poi, coords) pairs.  Memoized per (session, sf_dir) — three
    sphere queries share one disk table (same pattern as the zonal
    tile-table memo)."""
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    if memo_key in _DISK_MEMO:
        return _DISK_MEMO[memo_key]
    pois = (
        load(spark, sf_dir, "supplier")
        .selectExpr("s_suppkey AS poi_id", f"{_PLON} AS plon", f"{_PLAT} AS plat")
        .toPandas()
    )
    cid = s2.cell_id_from_lonlat(
        pois["plon"].to_numpy(), pois["plat"].to_numpy(), _LEVEL
    )
    rows = []
    for k in range(len(pois)):
        # 5x5 disk (expand twice, cross-face wrap): guarantees two full
        # ring widths between a doc and any POI outside its disk, ON
        # THE SPHERE — wrapped expansion follows cube-face boundaries,
        # so no face-edge special-casing is needed downstream
        disk = s2.expand_covering(
            s2.expand_covering(np.array([cid[k]], dtype=np.uint64), wrap=True),
            wrap=True,
        )
        for p in s2.prefix_from_cell_id(disk, _LEVEL):
            rows.append(
                (int(p), int(pois["poi_id"][k]),
                 float(pois["plon"][k]), float(pois["plat"][k]))
            )
    out = spark.createDataFrame(
        pd.DataFrame(rows, columns=["s2_prefix", "poi_id", "plon", "plat"]),
        "s2_prefix BIGINT, poi_id BIGINT, plon DOUBLE, plat DOUBLE",
    )
    _DISK_MEMO[memo_key] = out
    return out


@register("nearest_poi_sphere", _NEAREST_ORACLE)
def nearest_poi_sphere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact great-circle nearest POI per document.

    Plan shape at 10^12 docs: one Arrow projection (cell id), one
    broadcast equi-join on the cell against POI disk cells (candidate
    volume ≈ docs × POIs-per-disk, not docs × POIs), one partial+final
    min-struct agg; the guaranteed-radius test routes only the residue
    (empty or too-far disks) to the exact broadcast fallback."""
    r_safe = 0.7 * 2.0 * s2.min_cell_side_m(-125.0, -67.0, 24.0, 50.0, _LEVEL)

    docs = _geocoded_docs(spark, sf_dir)
    disks = _poi_disks(spark, sf_dir)
    dist = F.expr(_haversine_sql("lon", "lat", "plon", "plat"))
    best = (
        docs.join(F.broadcast(disks), "s2_prefix")
        .withColumn("_d", dist)
        .groupBy("doc_id")
        .agg(F.min(F.struct("_d", "poi_id")).alias("_best"))
        .select(
            "doc_id",
            F.col("_best.poi_id").alias("poi_id"),
            F.col("_best._d").alias("_d"),
        )
    )
    accepted = best.filter(F.col("_d") <= F.lit(r_safe))
    # residue: no disk candidate, or best candidate beyond the
    # guaranteed radius — exact scan over the broadcast POI set
    pois = (
        load(spark, sf_dir, "supplier")
        .selectExpr("s_suppkey AS poi_id", f"{_PLON} AS plon", f"{_PLAT} AS plat")
    )
    residue = (
        docs.join(accepted.select("doc_id"), "doc_id", "left_anti")
        .crossJoin(F.broadcast(pois))
        .withColumn("_d", dist)
        .groupBy("doc_id")
        .agg(F.min(F.struct("_d", "poi_id")).alias("_best"))
        .select(
            "doc_id",
            F.col("_best.poi_id").alias("poi_id"),
            F.col("_best._d").alias("_d"),
        )
    )
    return accepted.unionByName(residue).select(
        "doc_id", "poi_id", F.round("_d", 2).alias("dist_m")
    )


# --- great-circle kNN (k=3) --------------------------------------------

_K = 3

_KNN_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_LON} AS lon, {_LAT} AS lat FROM documents
),
p AS (
  SELECT s_suppkey AS poi_id, {_PLON} AS plon, {_PLAT} AS plat FROM supplier
),
x AS (
  SELECT doc_id, poi_id,
         {_haversine_sql('lon', 'lat', 'plon', 'plat')} AS dist,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY dist) AS rk
  FROM d CROSS JOIN p
)
SELECT doc_id, CAST(rk AS INT) AS rk, poi_id, ROUND(dist, 2) AS dist_m
FROM x WHERE rk <= {_K}
"""


@register("knn3_poi_sphere", _KNN_ORACLE)
def knn3_poi_sphere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact great-circle 3-nearest POIs per document.

    Same single-pass shape as the planar knn_join (vector.py): ONE
    aggregation collects the sorted candidate top-k per doc
    (slice(array_sort(collect_list(struct(d, poi))))); a doc's result
    is accepted only when it has ≥ k candidates AND its k-th distance
    ≤ R_SAFE (the k-th true neighbor can only hide outside the wrapped
    5×5 disk if it is farther than the guaranteed radius); the residue
    re-ranks against the full broadcast POI set.  Oracle: brute-force
    window ranking."""
    r_safe = 0.7 * 2.0 * s2.min_cell_side_m(-125.0, -67.0, 24.0, 50.0, _LEVEL)

    docs = _geocoded_docs(spark, sf_dir)
    dist = F.expr(_haversine_sql("lon", "lat", "plon", "plat"))

    def topk(src: DataFrame) -> DataFrame:
        return (
            src.withColumn("_d", dist)
            .groupBy("doc_id")
            .agg(
                F.slice(
                    F.array_sort(
                        F.collect_list(F.struct("_d", "poi_id"))
                    ),
                    1,
                    _K,
                ).alias("_top"),
                F.count(F.lit(1)).alias("_n"),
            )
        )

    cand = topk(docs.join(F.broadcast(_poi_disks(spark, sf_dir)), "s2_prefix"))
    accepted = cand.filter(
        (F.col("_n") >= _K)
        & (F.element_at("_top", _K)["_d"] <= F.lit(r_safe))
    )
    pois = load(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey AS poi_id", f"{_PLON} AS plon", f"{_PLAT} AS plat"
    )
    residue = topk(
        docs.join(accepted.select("doc_id"), "doc_id", "left_anti")
        .crossJoin(F.broadcast(pois))
    )
    return (
        accepted.unionByName(residue)
        .select(
            "doc_id",
            F.posexplode("_top").alias("_pos", "_e"),
        )
        .select(
            "doc_id",
            (F.col("_pos") + 1).cast("int").alias("rk"),
            F.col("_e.poi_id").alias("poi_id"),
            F.round(F.col("_e._d"), 2).alias("dist_m"),
        )
    )


# --- great-circle range join + exponential decay (C4 on the sphere) ----

_SEDC_D = 250_000.0  # range cutoff, meters
_SEDC_BW = 100_000.0  # decay bandwidth: w = exp(-3 d / bw)

_SEDC_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_LON} AS lon, {_LAT} AS lat FROM documents
),
p AS (
  SELECT s_suppkey AS poi_id, {_PLON} AS plon, {_PLAT} AS plat FROM supplier
),
x AS (
  SELECT doc_id, poi_id,
         {_haversine_sql('lon', 'lat', 'plon', 'plat')} AS dist
  FROM d CROSS JOIN p
)
SELECT doc_id,
       COUNT(*) AS n_within,
       ROUND(SUM(CAST(FLOOR(EXP(-3.0 * dist / {_SEDC_BW!r}) * 65536 + 0.5)
                 AS BIGINT)) / 65536.0, 4) AS sedc
FROM x
WHERE dist <= {_SEDC_D!r}
GROUP BY doc_id
"""


@register("summarize_sedc_sphere", _SEDC_ORACLE)
def summarize_sedc_sphere(spark: SparkSession, sf_dir: str) -> DataFrame:
    """summarize_sedc (/root/reference/R/processing.R:612-698) on the
    sphere: per-document count and exp(-3d/bw) weight sum over POIs
    within 250 km, by great-circle distance.

    Unlike the nearest query this needs NO fallback: the range D is
    covered outright when the POI disk spans ceil(D / min_cell_side)+1
    rings (here 2 — the wrapped 5×5 disk), so every doc within D of a
    POI is guaranteed a candidate and the exact distance filter does
    the rest.  One broadcast join + one partial+final agg — chopin's
    range-join shape with the index guaranteeing completeness, proven
    by the brute-force oracle hash."""
    import math

    # a doc r rings from a POI's cell is ≥ (r-1)·min_side away, so
    # docs within D live within floor(D/min_side)+1 rings
    rings_needed = math.floor(
        _SEDC_D / s2.min_cell_side_m(-125.0, -67.0, 24.0, 50.0, _LEVEL)
    ) + 1
    assert rings_needed <= 2, "5×5 disk no longer covers the range cutoff"

    docs = _geocoded_docs(spark, sf_dir)
    dist = F.expr(_haversine_sql("lon", "lat", "plon", "plat"))
    return (
        docs.join(F.broadcast(_poi_disks(spark, sf_dir)), "s2_prefix")
        .withColumn("_d", dist)
        .filter(F.col("_d") <= F.lit(_SEDC_D))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_within"),
            F.round(
                F.sum(
                    F.expr(
                        f"CAST(FLOOR(EXP(-3.0 * _d / {_SEDC_BW!r})"
                        " * 65536 + 0.5) AS BIGINT)"
                    )
                )
                / 65536.0,
                4,
            ).alias("sedc"),
        )
    )


# --- the same nearest, through the par_grid RUNNER face ---------------------


@register("nearest_poi_sphere_pargrid", _NEAREST_ORACLE)
def nearest_poi_sphere_pargrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle nearest POI via the cogrouped RUNNER
    (runners.par_cells) instead of the join-agg plan: docs keyed by
    their own S2 cell, POIs duplicated into every cell of their
    wrapped 5×5 disk (the padded-context contract of chopin's
    par_grid, /root/reference/R/scale_process.R:99-232), a numpy
    haversine argmin per cell, then the identical r_safe acceptance +
    exact broadcast fallback.  Same brute-force oracle as
    nearest_poi_sphere — the driver hash proves runner face == join
    face row-for-row."""
    r_safe = 0.7 * 2.0 * s2.min_cell_side_m(-125.0, -67.0, 24.0, 50.0, _LEVEL)

    docs = _geocoded_docs(spark, sf_dir)
    disks = _poi_disks(spark, sf_dir)

    def fun(kpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if cpdf.empty:
            return None  # whole cell routes to the exact fallback
        # sorted by poi_id so argmin's first-hit rule reproduces the
        # join face's min(struct(_d, poi_id)) tie-break
        cpdf = cpdf.sort_values("poi_id")
        la1 = np.radians(kpdf["lat"].to_numpy())[:, None]
        lo1 = np.radians(kpdf["lon"].to_numpy())[:, None]
        la2 = np.radians(cpdf["plat"].to_numpy())[None, :]
        lo2 = np.radians(cpdf["plon"].to_numpy())[None, :]
        h = (
            np.sin((la2 - la1) / 2) ** 2
            + np.cos(la1) * np.cos(la2) * np.sin((lo2 - lo1) / 2) ** 2
        )
        d = 2.0 * s2.EARTH_RADIUS_M * np.arcsin(np.sqrt(h))
        pid = cpdf["poi_id"].to_numpy()
        best_idx = np.argmin(d, axis=1)
        best_d = d[np.arange(len(kpdf)), best_idx]
        return pd.DataFrame(
            {
                "doc_id": kpdf["doc_id"].to_numpy(),
                "poi_id": pid[best_idx],
                "_d": best_d,
            }
        )

    res = par_cells(
        docs, disks, "s2_prefix", fun,
        schema="doc_id BIGINT, poi_id BIGINT, _d DOUBLE",
    )
    accepted = res.filter(F.col("_d") <= F.lit(r_safe))
    pois = (
        load(spark, sf_dir, "supplier")
        .selectExpr("s_suppkey AS poi_id", f"{_PLON} AS plon", f"{_PLAT} AS plat")
    )
    dist = F.expr(_haversine_sql("lon", "lat", "plon", "plat"))
    residue = (
        docs.join(accepted.select("doc_id"), "doc_id", "left_anti")
        .crossJoin(F.broadcast(pois))
        .withColumn("_d", dist)
        .groupBy("doc_id")
        .agg(F.min(F.struct("_d", "poi_id")).alias("_best"))
        .select(
            "doc_id",
            F.col("_best.poi_id").alias("poi_id"),
            F.col("_best._d").alias("_d"),
        )
    )
    return accepted.unionByName(residue).select(
        "doc_id", "poi_id", F.round("_d", 2).alias("dist_m")
    )


# --- sphere ring-expansion fallback (no broadcast of the POI layer) ---------
#
# VERDICT r02 next-steps #2 on the sphere: the broadcast residue above
# is the right plan for a dimension-sized POI table, but a fact-sized
# context needs a fallback that never ships the context to the driver.
# _s2_ring_resolve expands each unresolved doc's wrapped cell disk
# (radius doubles per round), equi-joins the context's CORE cell
# prefix, and accepts a doc when its best distance is strictly below
# 0.7 · r · min_cell_side — the same two-full-ring-widths safety
# construction as R_SAFE, generalized to r rings with the globally
# sampled minimum cell side.  The terminal radius (the level-5 cell
# graph's diameter bound) covers the whole sphere, so every doc
# resolves exactly.

_RING_SAFETY = 0.7

_GLOBAL_MIN_SIDE: dict[int, float] = {}


def _global_min_side(level: int) -> float:
    if level not in _GLOBAL_MIN_SIDE:
        _GLOBAL_MIN_SIDE[level] = s2.min_cell_side_m(
            -180.0, 180.0, -89.9, 89.9, level, samples=96
        )
    return _GLOBAL_MIN_SIDE[level]


def _prefix_to_cell_id(prefix: np.ndarray, level: int) -> np.ndarray:
    shift = np.uint64(2 * (s2.MAX_LEVEL - level) + 1)
    sentinel = np.uint64(1) << np.uint64(2 * (s2.MAX_LEVEL - level))
    return (prefix.astype(np.uint64) << shift) | sentinel


def _s2_ring_resolve(
    misses: DataFrame, ctx: DataFrame, level: int = _LEVEL,
    min_side: float | None = None, start_r: int = 2,
) -> DataFrame:
    """Exact nearest-context resolve for `misses` (doc_id, lon, lat,
    s2_prefix) against `ctx` (poi_id, plon, plat, s2_prefix — CORE
    cell only, not a disk): iterative wrapped-disk expansion, one
    shuffle equi-join per round, localCheckpoint-ed miss sets.
    `min_side` is the certification bound's cell-side minimum — pass
    the tighter window-sampled value when BOTH sides are confined to a
    lon/lat window (the r_safe convention of nearest_poi_sphere);
    default = globally sampled (valid for any context).
    Returns (doc_id, poi_id, _d)."""
    if min_side is None:
        min_side = _global_min_side(level)
    start_r = max(2, int(start_r))
    terminal = 4 * (1 << level)  # ≥ cell-graph diameter: disk = sphere
    dist = F.expr(_haversine_sql("lon", "lat", "plon", "plat"))
    cur = misses.select("doc_id", "lon", "lat", "s2_prefix").localCheckpoint()
    parts = []
    r = start_r
    while not cur.isEmpty():
        radius = r  # bind per closure

        def explode(batches, radius=radius):
            for pdf in batches:
                if pdf.empty:
                    continue
                uniq = np.unique(pdf["s2_prefix"].to_numpy())
                disks = {}
                for p in uniq:
                    d = _prefix_to_cell_id(np.array([p]), level)
                    for _ in range(radius):
                        d = np.unique(s2.expand_covering(d, wrap=True))
                    disks[int(p)] = s2.prefix_from_cell_id(d, level)
                out_doc, out_lon, out_lat, out_c = [], [], [], []
                for row in pdf.itertuples(index=False):
                    dd = disks[int(row.s2_prefix)]
                    out_doc.extend([row.doc_id] * len(dd))
                    out_lon.extend([row.lon] * len(dd))
                    out_lat.extend([row.lat] * len(dd))
                    out_c.extend(dd.tolist())
                yield pd.DataFrame(
                    {
                        "doc_id": pd.Series(out_doc, dtype="int64"),
                        "lon": pd.Series(out_lon, dtype="float64"),
                        "lat": pd.Series(out_lat, dtype="float64"),
                        "cand_prefix": pd.Series(out_c, dtype="int64"),
                    }
                )

        cand = cur.mapInPandas(
            explode,
            "doc_id long, lon double, lat double, cand_prefix long",
        )
        agg = (
            cand.join(
                ctx.withColumnRenamed("s2_prefix", "cand_prefix"),
                "cand_prefix",
            )
            .withColumn("_d", dist)
            .groupBy("doc_id")
            .agg(F.min(F.struct("_d", "poi_id")).alias("_best"))
            .select(
                "doc_id",
                F.col("_best.poi_id").alias("poi_id"),
                F.col("_best._d").alias("_d"),
            )
        )
        last = r >= terminal
        accept = (
            agg
            if last
            else agg.filter(F.col("_d") < _RING_SAFETY * r * min_side)
        )
        parts.append(accept)
        if last:
            break
        cur = cur.join(
            accept.select("doc_id"), "doc_id", "left_anti"
        ).localCheckpoint()
        r = min(r * 2, terminal)
    if not parts:
        return (
            misses.select("doc_id")
            .limit(0)
            .crossJoin(ctx.select("poi_id").limit(0))
            .withColumn("_d", F.lit(0.0))
            .select("doc_id", "poi_id", "_d")
        )
    out = parts[0]
    for a in parts[1:]:
        out = out.unionByName(a)
    return out


def _pois_with_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    def _prefix(lon, lat):
        cid = s2.cell_id_from_lonlat(lon.to_numpy(), lat.to_numpy(), _LEVEL)
        return pd.Series(s2.prefix_from_cell_id(cid, _LEVEL))

    prefix_udf = F.pandas_udf(_prefix, "long")
    return (
        load(spark, sf_dir, "supplier")
        .selectExpr(
            "s_suppkey AS poi_id", f"{_PLON} AS plon", f"{_PLAT} AS plat"
        )
        .withColumn("s2_prefix", prefix_udf(F.col("plon"), F.col("plat")))
    )


@register("nearest_poi_sphere_ring", _NEAREST_ORACLE)
def nearest_poi_sphere_ring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Great-circle nearest POI with NO broadcast anywhere: stage 1
    equi-joins doc cells against POI core cells expanded one wrapped
    ring (shuffle join — no F.broadcast hint), the residue resolves
    through the iterative ring expansion.  Same brute-force oracle as
    nearest_poi_sphere: the driver hash proves the zero-broadcast plan
    returns identical rows."""
    # both docs and POIs are confined to the CONUS window, so the
    # window-sampled min cell side bounds every doc→unseen-POI path —
    # the same r_safe construction nearest_poi_sphere uses (a global
    # bound here would shrink r_safe ~40% and route half the docs
    # through the ring rounds for nothing)
    win_min_side = s2.min_cell_side_m(-125.0, -67.0, 24.0, 50.0, _LEVEL)
    r_safe = _RING_SAFETY * 2.0 * win_min_side
    docs = _geocoded_docs(spark, sf_dir)
    pois = _pois_with_prefix(spark, sf_dir)

    # stage 1: POI cores expanded 2 wrapped rings (the 5×5 disk) via
    # the same distributed mapInPandas used by the ring rounds
    def expand2(batches):
        # disks are computed once per UNIQUE cell (POIs cluster into a
        # few dozen level-5 cells), then attached to rows with one
        # np.repeat — the former per-POI python loop spent ~3.4 s of
        # pure interpreter/numpy-call overhead on a single task for
        # 1000 POIs (guide §4.2: vectorize inside the UDF)
        for pdf in batches:
            if pdf.empty:
                continue
            prefs = pdf["s2_prefix"].to_numpy()
            disks = {}
            for p in np.unique(prefs):
                d = _prefix_to_cell_id(np.array([p]), _LEVEL)
                for _ in range(2):
                    d = np.unique(s2.expand_covering(d, wrap=True))
                disks[int(p)] = s2.prefix_from_cell_id(d, _LEVEL)
            per_row = [disks[int(p)] for p in prefs]
            sizes = np.array([len(d) for d in per_row])
            idx = np.repeat(np.arange(len(pdf)), sizes)
            yield pd.DataFrame(
                {
                    "poi_id": pdf["poi_id"].to_numpy()[idx],
                    "plon": pdf["plon"].to_numpy()[idx],
                    "plat": pdf["plat"].to_numpy()[idx],
                    "s2_prefix": pd.Series(
                        np.concatenate(per_row), dtype="int64"
                    ),
                }
            )

    disks = pois.mapInPandas(
        expand2, "poi_id long, plon double, plat double, s2_prefix long"
    )
    dist = F.expr(_haversine_sql("lon", "lat", "plon", "plat"))
    best = (
        docs.join(disks, "s2_prefix")
        .withColumn("_d", dist)
        .groupBy("doc_id")
        .agg(F.min(F.struct("_d", "poi_id")).alias("_best"))
        .select(
            "doc_id",
            F.col("_best.poi_id").alias("poi_id"),
            F.col("_best._d").alias("_d"),
        )
        # ring rounds + the final union each re-trigger this stage-1
        # aggregate; one localCheckpoint = one execution
        .localCheckpoint()
    )
    accepted = best.filter(F.col("_d") <= F.lit(r_safe))
    misses = docs.join(accepted.select("doc_id"), "doc_id", "left_anti")
    # start at r=4: the r=2 round's doc-disk coverage mirrors the
    # stage-1 POI-disk coverage the misses already failed, and its
    # certification bound is exactly r_safe — it can never accept
    residue = _s2_ring_resolve(misses, pois, min_side=win_min_side, start_r=4)
    return accepted.unionByName(residue).select(
        "doc_id", "poi_id", F.round("_d", 2).alias("dist_m")
    )


# --- great-circle cross-track distance (corridor proximity) -------------------
#
# The third spherical primitive beside haversine (this module) and the
# Andoyer geodesic (geodesic_nearest_city): signed cross-track
# distance from each geocoded document to the great circle through
# A=(-120,30), B=(-75,42) — the "how far off the corridor" verb used
# for flight/shipping-lane and pipeline-buffer analyses.  Vector
# formulation (no bearings/atan2): with unit vectors a, b, p and the
# circle normal n = a x b / |a x b|,  dxt = asin(p . n) * R.
#
# Determinism: SIN/COS/ASIN are correctly rounded in both engines'
# libm for these magnitudes to within the ROUND(4)/coarse-band grain
# (the module-wide haversine argument); the band edges are 100 km so a
# sub-ulp disagreement cannot cross one.  Scale: pure column math —
# one projection chain, one partial+final band agg.

_XT_A = (-120.0, 30.0)
_XT_B = (-75.0, 42.0)


def _xt_sql() -> str:
    def unit(lon: str, lat: str, tag: str) -> str:
        return (
            f"COS(RADIANS({lat})) * COS(RADIANS({lon})) AS {tag}x, "
            f"COS(RADIANS({lat})) * SIN(RADIANS({lon})) AS {tag}y, "
            f"SIN(RADIANS({lat})) AS {tag}z"
        )

    r = float(s2.EARTH_RADIUS_M)
    return f"""
WITH ab AS (
  SELECT {unit(str(_XT_A[0]), str(_XT_A[1]), 'a')},
         {unit(str(_XT_B[0]), str(_XT_B[1]), 'b')}
),
nrm AS (
  SELECT ay * bz - az * by AS nx,
         az * bx - ax * bz AS ny,
         ax * by - ay * bx AS nz
  FROM ab
),
nn AS (
  SELECT nx / SQRT(nx * nx + ny * ny + nz * nz) AS nx,
         ny / SQRT(nx * nx + ny * ny + nz * nz) AS ny,
         nz / SQRT(nx * nx + ny * ny + nz * nz) AS nz
  FROM nrm
),
docs AS (
  SELECT doc_id, {unit('lon', 'lat', 'p')}
  FROM (SELECT doc_id, {_LON} AS lon, {_LAT} AS lat FROM documents) q
),
xt AS (
  SELECT d.doc_id,
         ASIN(d.px * nn.nx + d.py * nn.ny + d.pz * nn.nz) * {r!r} AS dxt
  FROM docs d CROSS JOIN nn
)
SELECT CAST(FLOOR(ABS(dxt) / 100000.0) AS BIGINT) AS band_100km,
       CAST(SUM(CASE WHEN dxt >= 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_left,
       CAST(SUM(CASE WHEN dxt < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_right,
       ROUND(MIN(ABS(dxt)), 4) AS min_abs_m,
       ROUND(MAX(ABS(dxt)), 4) AS max_abs_m
FROM xt
GROUP BY 1
"""


@register("corridor_cross_track", _xt_sql())
def corridor_cross_track(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed great-circle cross-track distance from every geocoded doc
    to the A-B corridor, folded to 100 km side-split bands — pure
    column math, vector formulation (no atan2)."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_xt_sql())
