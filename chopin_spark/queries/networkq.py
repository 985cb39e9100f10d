"""Road-NETWORK construction and routing (the sfnetworks/pgRouting
verb family the euclidean nearest/knn queries can't express).

The reference's flagship demo measures straight-line proximity to
roads (`terra::nearest`, /root/reference/README.md:1065-1118); the R
spatial stack's next step is `sfnetworks::as_sfnetwork(ncroads)` —
planarize the LINESTRING layer at its crossings into a routable graph
and answer NETWORK-distance questions.  This module is that step,
Spark-first:

1. **Planarize**: crossing points come from the cell-bucketed segment
   pair join (queries/roads.road_intersections — never all-pairs);
   every segment then splits at its crossings.  Split points quantize
   to integer millimetres immediately, so node identity, edge weights
   and the whole downstream graph are int64-exact in both engines.
   Ordering split points along a segment uses the integer squared
   distance from the segment's A endpoint (monotone along a segment;
   ≤ 5e15 < 2^53, so even the DOUBLE cast for the length SQRT is
   exact).  One LEAD window per (line, seg) — a segment-sized
   partition, never a global sort — yields the sub-edges.
2. **Route**: multi-source bounded Bellman-Ford (components.sssp_khop)
   from the crossing nodes gives every reachable node its network
   distance to the nearest junction — the accessibility statistic
   (reach/service-area) planners compute on OSM at continent scale.

Scale shape: crossing detection is the quadtree-equivalent bucketed
join (fan-out bounded by per-cell segment density); splitting is one
segment-keyed window; SSSP rounds are node-sized frontier joins with
min-combine, hop-bounded so both engines terminate identically without
a convergence probe.  At 10^8 road segments every stage is an
equi-join or a bounded window — no geometry library, no driver loop.

Oracle: DuckDB re-derives the crossings by brute-force all-pairs
(road_intersections' contract — proves the cell index loses nothing),
replays the identical quantize/split/edge fold, and enumerates ≤K-hop
walks with a recursive CTE; the value-hash match certifies graph
construction AND routing end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark.queries import register
from chopin_spark.queries.roads import (
    _N_SEGS,
    _X_N_ROADS,
    _X_SEGS_SQL,
    road_intersections,
    road_segments,
)

_K = 2_000_000_000  # node key = mx * _K + my (my < _K always)
_HOPS = 6
_BAND_MM = 10_000_000  # 10 km isochrone bands


def _mq(x: str) -> str:
    """Quantize a coordinate (metres, double) to integer millimetres —
    correctly-rounded IEEE multiply + FLOOR, bit-identical across
    engines (the repo's exactness discipline)."""
    return f"CAST(FLOOR(({x}) * 1000.0 + 0.5) AS BIGINT)"


# the planarize fold: identical text in Spark and DuckDB; only the two
# source CTEs differ (Spark: temp views over the cell-bucketed plan;
# DuckDB: closed-form layer + brute-force crossings).
_FOLD = f"""
pts AS (
  SELECT line_id, seg, {_mq('ax')} AS mx, {_mq('ay')} AS my FROM segs
  UNION ALL
  SELECT line_id, seg, {_mq('bx')} AS mx, {_mq('by')} AS my FROM segs
  UNION ALL
  SELECT line_a AS line_id, seg_a AS seg,
         {_mq('ix')} AS mx, {_mq('iy')} AS my FROM x
  UNION ALL
  SELECT line_b AS line_id, seg_b AS seg,
         {_mq('ix')} AS mx, {_mq('iy')} AS my FROM x
),
dpts AS (SELECT DISTINCT line_id, seg, mx, my FROM pts),
anch AS (
  SELECT line_id, seg, {_mq('ax')} AS amx, {_mq('ay')} AS amy FROM segs
),
ordp AS (
  SELECT d.line_id, d.seg, d.mx, d.my,
         (d.mx - a.amx) * (d.mx - a.amx)
         + (d.my - a.amy) * (d.my - a.amy) AS d2
  FROM dpts d JOIN anch a ON a.line_id = d.line_id AND a.seg = d.seg
),
sub AS (
  SELECT line_id, seg, mx, my,
         LEAD(mx) OVER (PARTITION BY line_id, seg
                        ORDER BY d2, mx, my) AS nx,
         LEAD(my) OVER (PARTITION BY line_id, seg
                        ORDER BY d2, mx, my) AS ny
  FROM ordp
),
edges AS (
  SELECT line_id, seg, mx * {_K} + my AS u, nx * {_K} + ny AS v,
         CAST(FLOOR(SQRT(CAST((nx - mx) * (nx - mx)
                              + (ny - my) * (ny - my) AS DOUBLE)))
              AS BIGINT) AS w
  FROM sub WHERE nx IS NOT NULL
)"""

# DuckDB-side source CTEs: brute-force crossing census over the
# closed-form 800-road layer (the road_intersections oracle contract).
from chopin_spark.roads import seg_intersect_sql  # noqa: E402

_O_COND, _O_IX, _O_IY = seg_intersect_sql(
    "a.ax", "a.ay", "a.bx", "a.by", "b.ax", "b.ay", "b.bx", "b.by"
)

_ORACLE_SRC = f"""segs AS ({_X_SEGS_SQL}),
x AS (
  SELECT a.line_id AS line_a, a.seg AS seg_a,
         b.line_id AS line_b, b.seg AS seg_b,
         {_O_IX} AS ix, {_O_IY} AS iy
  FROM segs a JOIN segs b ON a.line_id < b.line_id
  WHERE {_O_COND}
)"""

_SPARK_SRC = """segs AS (SELECT * FROM net_segs),
x AS (SELECT * FROM net_x)"""


def _spark_net_views(spark: SparkSession, sf_dir: str) -> None:
    """Register the Spark-side sources: the closed-form segment layer
    and the CELL-BUCKETED crossing join (the plan under test)."""
    road_segments(spark, _X_N_ROADS).createOrReplaceTempView("net_segs")
    road_intersections(spark, sf_dir).createOrReplaceTempView("net_x")


_PLAN_TAIL = """
SELECT line_id, CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(w) AS BIGINT) AS total_len_mm
FROM edges GROUP BY line_id"""

_PLANARIZE_ORACLE = f"WITH {_ORACLE_SRC}, {_FOLD} {_PLAN_TAIL}"


@register("road_network_planarize", _PLANARIZE_ORACLE)
def road_network_planarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Planarize the road layer at its crossings: per road, the
    sub-edge count (4 + crossings on it) and total int64-mm length.
    Certifies node quantization, split ordering, and edge weights."""
    _spark_net_views(spark, sf_dir)
    return spark.sql(f"WITH {_SPARK_SRC}, {_FOLD} {_PLAN_TAIL}")


# --- network distance to the nearest junction ---------------------------------
#
# Multi-source bounded SSSP: seeds = crossing nodes at cost 0; after
# _HOPS relaxation rounds each reached node holds MIN network distance
# over all <=_HOPS-hop walks from any junction.  The hop bound makes
# Spark's Bellman-Ford loop and DuckDB's recursive walk enumeration
# agree exactly without a convergence probe.

_WALK_ORACLE = f"""
WITH RECURSIVE {_ORACLE_SRC}, {_FOLD},
e2 AS (
  SELECT u AS src, v AS dst, w FROM edges
  UNION ALL
  SELECT v AS src, u AS dst, w FROM edges
),
seeds AS (
  SELECT DISTINCT {_mq('ix')} * {_K} + {_mq('iy')} AS node FROM x
),
walk(node, d, hops) AS (
  SELECT node, CAST(0 AS BIGINT) AS d, 0 AS hops FROM seeds
  UNION
  SELECT e2.dst, w.d + e2.w, w.hops + 1
  FROM walk w JOIN e2 ON e2.src = w.node
  WHERE w.hops < {_HOPS}
),
best AS (SELECT node, MIN(d) AS d FROM walk GROUP BY 1)
"""

_DIST_TAIL = f"""
SELECT CAST((node - (node % {_K})) / {_K} AS BIGINT) AS node_x_mm,
       node % {_K} AS node_y_mm,
       CAST(d AS BIGINT) AS net_dist_mm
FROM best"""


_NET_MEMO: dict = {}


def _net_e2_seeds(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The routable graph: symmetrized sub-edge relation + the junction
    seed set (cost 0), shared by every network-distance query.

    Memoized per (session, sf_dir) with a localCheckpoint — the same
    pattern as the zonal tile tables and the S2 POI disks (dimension
    prep, not fact data): the graph derives from the closed-form
    800-road fixture layer, is a few thousand rows, and was previously
    re-planarized (cell-bucketed crossing join + split-ordering
    windows) by each of the five routing queries on every run."""
    memo_key = (spark.sparkContext.applicationId, sf_dir)
    if memo_key in _NET_MEMO:
        return _NET_MEMO[memo_key]
    _spark_net_views(spark, sf_dir)
    edges = spark.sql(f"WITH {_SPARK_SRC}, {_FOLD} SELECT u, v, w FROM edges")
    e2 = edges.selectExpr("u AS src", "v AS dst", "w").unionByName(
        edges.selectExpr("v AS src", "u AS dst", "w")
    ).localCheckpoint()
    seeds = spark.sql(
        f"WITH {_SPARK_SRC} SELECT DISTINCT "
        f"{_mq('ix')} * {_K} + {_mq('iy')} AS node FROM x"
    ).withColumn("cost", F.lit(0)).localCheckpoint()
    _NET_MEMO[memo_key] = (e2, seeds)
    return e2, seeds


def _sssp_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from chopin_spark.components import sssp_khop

    e2, seeds = _net_e2_seeds(spark, sf_dir)
    return sssp_khop(seeds, e2, k=_HOPS)


@register("road_network_dist_to_crossing", _WALK_ORACLE + _DIST_TAIL)
def road_network_dist_to_crossing(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """NETWORK distance (int64 mm, along the planarized graph) from
    every reachable node to its nearest junction — multi-source
    hop-bounded Bellman-Ford over the sub-edge graph."""
    return _sssp_best(spark, sf_dir).selectExpr(
        f"CAST((node - (node % {_K})) / {_K} AS BIGINT) AS node_x_mm",
        f"node % {_K} AS node_y_mm",
        "CAST(min_cost AS BIGINT) AS net_dist_mm",
    )


_BAND_TAIL = f"""
SELECT CAST((d - (d % {_BAND_MM})) / {_BAND_MM} AS BIGINT) AS band_10km,
       CAST(COUNT(*) AS BIGINT) AS n_nodes
FROM best GROUP BY 1"""


@register("road_isochrone_bands", _WALK_ORACLE + _BAND_TAIL)
def road_isochrone_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isochrone census: how many graph nodes sit in each 10 km
    network-distance band around the junction set — the service-area
    rollup over the same bounded SSSP."""
    return (
        _sssp_best(spark, sf_dir)
        .selectExpr(
            f"CAST((min_cost - (min_cost % {_BAND_MM})) / {_BAND_MM}"
            " AS BIGINT) AS band_10km"
        )
        .groupBy("band_10km")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
    )


# --- network Voronoi (junction service-area allocation) -----------------------
#
# The allocation twin of dist_to_crossing: each reachable node is OWNED
# by the junction minimizing (network distance, junction id) — the
# service-area partition behind facility siting / catchment rollups
# (sfnetworks' st_network_blend + nearest-feature idiom).  Engine:
# components.sssp_khop_labeled — label-carrying Bellman-Ford whose
# per-round struct-MIN retention is exact because the (cost, label)
# pair order is a shortest-path semiring.  Oracle: recursive ≤k-hop
# walk enumeration carrying the seed label, then argmin per node —
# min distance first, min label among its achievers.

_NV_ORACLE = f"""
WITH RECURSIVE {_ORACLE_SRC}, {_FOLD},
e2 AS (
  SELECT u AS src, v AS dst, w FROM edges
  UNION ALL
  SELECT v AS src, u AS dst, w FROM edges
),
seeds AS (
  SELECT DISTINCT {_mq('ix')} * {_K} + {_mq('iy')} AS node FROM x
),
walk(node, d, lab, hops) AS (
  SELECT node, CAST(0 AS BIGINT), node, 0 FROM seeds
  UNION
  SELECT e2.dst, w.d + e2.w, w.lab, w.hops + 1
  FROM walk w JOIN e2 ON e2.src = w.node
  WHERE w.hops < {_HOPS}
),
bd AS (SELECT node, MIN(d) AS d FROM walk GROUP BY 1),
own AS (
  SELECT w.node, b.d, MIN(w.lab) AS lab
  FROM walk w JOIN bd b ON b.node = w.node AND w.d = b.d
  GROUP BY 1, 2
)
SELECT CAST((lab - (lab % {_K})) / {_K} AS BIGINT) AS junc_x_mm,
       lab % {_K} AS junc_y_mm,
       CAST(COUNT(*) AS BIGINT) AS n_allocated,
       CAST(SUM(d) AS BIGINT) AS total_dist_mm,
       CAST(MAX(d) AS BIGINT) AS max_dist_mm
FROM own GROUP BY 1, 2
"""


@register("road_network_voronoi", _NV_ORACLE)
def road_network_voronoi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Junction service areas over the planarized road graph: every
    reachable node allocated to its (distance, id)-minimal junction;
    per junction, the allocated-node count and distance rollup."""
    from chopin_spark.components import sssp_khop_labeled

    e2, seeds = _net_e2_seeds(spark, sf_dir)
    st = sssp_khop_labeled(
        seeds.withColumn("lab", F.col("node")), e2, k=_HOPS
    )
    return (
        st.selectExpr(
            f"CAST((lab - (lab % {_K})) / {_K} AS BIGINT) AS junc_x_mm",
            f"lab % {_K} AS junc_y_mm",
            "min_cost",
        )
        .groupBy("junc_x_mm", "junc_y_mm")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_allocated"),
            F.sum("min_cost").cast("long").alias("total_dist_mm"),
            F.max("min_cost").cast("long").alias("max_dist_mm"),
        )
    )


# --- route trace to the network's worst-served point ---------------------------
#
# dist_to_crossing says HOW FAR the worst point is; this says WHERE the
# path runs: from the node with MAXIMUM network distance to any
# junction (ties by node id), follow the steepest-descent chain — at
# each node the upstream neighbor minimizing (neighbor distance + edge
# weight, neighbor id), taken only while the distance strictly
# decreases.  Strict integer descent makes the chain finite and
# deterministic in BOTH engines with no convergence probe, and on a
# converged distance field it IS the shortest path.  Spark: the parent
# relation is one node-sized window; the walk joins a 1-row frame per
# step.  Oracle: same parent relation, recursive follow.

_ROUTE_MAX_STEPS = 64

_ROUTE_ORACLE = _WALK_ORACLE + f""",
par AS (
  SELECT v, u FROM (
    SELECT r.v, r.u, r.ud, bv.d AS vd
    FROM (
      SELECT e2.dst AS v, e2.src AS u, bu.d AS ud,
             ROW_NUMBER() OVER (PARTITION BY e2.dst
                                ORDER BY bu.d + e2.w, e2.src) AS rn
      FROM e2 JOIN best bu ON bu.node = e2.src
    ) r JOIN best bv ON bv.node = r.v
    WHERE r.rn = 1
  ) q WHERE ud < vd
),
tgt AS (SELECT node FROM best ORDER BY d DESC, node DESC LIMIT 1),
path(step, node) AS (
  SELECT 0 AS step, node FROM tgt
  UNION ALL
  SELECT p.step + 1, pr.u FROM path p JOIN par pr ON pr.v = p.node
)
SELECT CAST(p.step AS BIGINT) AS step,
       CAST((p.node - (p.node % {_K})) / {_K} AS BIGINT) AS node_x_mm,
       p.node % {_K} AS node_y_mm,
       CAST(b.d AS BIGINT) AS dist_mm
FROM path p JOIN best b ON b.node = p.node
"""


@register("road_route_farthest_trace", _ROUTE_ORACLE)
def road_route_farthest_trace(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Trace the access path from the road network's worst-served node
    (max network distance to any junction) down the steepest-descent
    parent chain to the junction system."""
    from pyspark.sql import Window

    from chopin_spark.components import sssp_khop

    e2, seeds = _net_e2_seeds(spark, sf_dir)
    e2 = e2.localCheckpoint()
    best = sssp_khop(seeds, e2, k=_HOPS).localCheckpoint()

    bu = best.select(
        F.col("node").alias("src"), F.col("min_cost").alias("ud")
    )
    bv = best.select(F.col("node").alias("v"), F.col("min_cost").alias("vd"))
    wnd = Window.partitionBy("v").orderBy("through", "u")
    par = (
        e2.join(bu, "src")
        .select(
            F.col("dst").alias("v"), F.col("src").alias("u"),
            (F.col("ud") + F.col("w")).alias("through"), "ud",
        )
        .withColumn("rn", F.row_number().over(wnd))
        .filter(F.col("rn") == 1)
        .join(bv, "v")
        .filter(F.col("ud") < F.col("vd"))
        .select("v", "u")
        .localCheckpoint()
    )

    cur = (
        best.orderBy(F.col("min_cost").desc(), F.col("node").desc())
        .limit(1)
        .select("node", F.lit(0).cast("long").alias("step"))
        .localCheckpoint()
    )
    parts = [cur]
    for _ in range(_ROUTE_MAX_STEPS):
        nxt = (
            cur.join(par, cur["node"] == par["v"])
            .select(F.col("u").alias("node"), (F.col("step") + 1).alias("step"))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        parts.append(nxt)
        cur = nxt
    else:
        raise RuntimeError(
            f"route trace did not close in {_ROUTE_MAX_STEPS} steps"
        )
    path = parts[0]
    for p in parts[1:]:
        path = path.unionByName(p)
    return path.join(best, "node").selectExpr(
        "CAST(step AS BIGINT) AS step",
        f"CAST((node - (node % {_K})) / {_K} AS BIGINT) AS node_x_mm",
        f"node % {_K} AS node_y_mm",
        "CAST(min_cost AS BIGINT) AS dist_mm",
    )


# --- stroke building (every-best-fit angular continuity) ----------------------
#
# Thomson & Richardson's stroke model — the cartographic-generalization
# / space-syntax primitive (sfnetworks' to_spatial_smooth cousin;
# "natural roads" in the OSM literature): at every planarized node,
# pair the two incident edges whose continuation is straightest
# (MUTUAL best, deviation < 40°), then chain the pairs — each chain is
# a perceptual "stroke".  Because pairing is mutual-best, every edge
# joins ≤2 links (one per endpoint), so strokes are simple paths and
# the components fixpoint runs on a path graph.
#
# Continuation quality is the cosine between the two away-from-node
# direction vectors (straight ⇒ cos → −1): exact int64 dots/norms from
# the millimetre-quantized planarize fold, one fixed double tree per
# candidate — bit-identical ranking, ties by edge id.  Edge ids are a
# ROW_NUMBER over the deterministic (line, seg, u, v) order (at web
# scale: a collision-checked hash instead — no global sort; the
# pairing/link stages are node-local either way).

_STK_COS = -0.766044443118978  # cos 140° — deviation-from-straight < 40°

_STK_EIDT = """
eidt AS (
  SELECT ROW_NUMBER() OVER (ORDER BY line_id, seg, u, v) AS eid,
         u, v, w
  FROM edges
)"""

# pairing stages read ONLY eidt — on the Spark side that lets the
# planarize fold (crossing join + split windows + the eid numbering)
# materialize ONCE and serve both the link graph and the final rollup.
_STK_PAIR = f"""
epts AS (
  SELECT eid, u, v, w,
         (u - (u % {_K})) / {_K} AS ux, u % {_K} AS uy,
         (v - (v % {_K})) / {_K} AS vx, v % {_K} AS vy
  FROM eidt
),
incid AS (
  SELECT eid, u AS node, vx - ux AS dx, vy - uy AS dy FROM epts
  UNION ALL
  SELECT eid, v AS node, ux - vx AS dx, uy - vy AS dy FROM epts
),
cand AS (
  SELECT i.node, i.eid AS e1, j.eid AS e2,
         CAST(i.dx * j.dx + i.dy * j.dy AS DOUBLE)
           / SQRT(CAST(i.dx * i.dx + i.dy * i.dy AS DOUBLE)
                  * CAST(j.dx * j.dx + j.dy * j.dy AS DOUBLE)) AS c
  FROM incid i JOIN incid j ON j.node = i.node AND j.eid <> i.eid
),
best AS (
  SELECT node, e1, e2 FROM (
    SELECT node, e1, e2, c,
           ROW_NUMBER() OVER (PARTITION BY node, e1
                              ORDER BY c, e2) AS rn
    FROM cand WHERE c < {_STK_COS!r}
  ) t WHERE rn = 1
),
links AS (
  SELECT a.e1 AS s, a.e2 AS t
  FROM best a JOIN best b
    ON b.node = a.node AND b.e1 = a.e2 AND b.e2 = a.e1
  WHERE a.e1 < a.e2
)"""

_STK_BODY = f"{_STK_EIDT},{_STK_PAIR}"

_STK_FINAL = """
SELECT stroke_id,
       CAST(COUNT(*) AS BIGINT) AS n_edges,
       CAST(SUM(w) AS BIGINT) AS total_len_mm
FROM strokes GROUP BY stroke_id
ORDER BY stroke_id
"""

_STK_ORACLE = f"""WITH RECURSIVE {_ORACLE_SRC}, {_FOLD}, {_STK_BODY.strip()},
ulinks AS (
  SELECT s AS a, t AS b FROM links UNION SELECT t, s FROM links
),
reach AS (
  SELECT a, b FROM ulinks
  UNION
  SELECT r.a, l.b FROM reach r JOIN ulinks l ON l.a = r.b
),
comp AS (
  SELECT a AS eid, LEAST(a, MIN(b)) AS stroke_id FROM reach GROUP BY a
),
strokes AS (
  SELECT e.eid, e.w, COALESCE(c.stroke_id, e.eid) AS stroke_id
  FROM eidt e LEFT JOIN comp c ON c.eid = e.eid
)
{_STK_FINAL}
"""


@register("road_stroke_building", _STK_ORACLE)
def road_stroke_building(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strokes over the planarized road network: mutual-best angular
    continuation pairing (<40° deviation) chained into perceptual
    units; per stroke, edge count and total length."""
    from chopin_spark.components import connected_components

    # planarize + eid numbering runs ONCE per session (the _net_e2_seeds
    # memo rationale); links derive from the checkpointed edge table
    memo_key = (spark.sparkContext.applicationId, sf_dir, "eidt")
    if memo_key in _NET_MEMO:
        eidt = _NET_MEMO[memo_key]
    else:
        _spark_net_views(spark, sf_dir)
        eidt = spark.sql(
            f"WITH {_SPARK_SRC}, {_FOLD}, {_STK_EIDT.strip()}"
            " SELECT e.eid, e.u, e.v, e.w FROM eidt e"
        ).localCheckpoint()
        _NET_MEMO[memo_key] = eidt
    eidt.createOrReplaceTempView("stk_eidt")
    base = spark.sql(
        f"WITH eidt AS (SELECT * FROM stk_eidt), {_STK_PAIR.strip()}"
        " SELECT l.s, l.t FROM links l"
    )
    comp = connected_components(base, "s", "t")
    strokes = eidt.join(
        comp.withColumnRenamed("node", "eid"), "eid", "left"
    ).select(
        "eid", "w",
        F.coalesce("comp_id", F.col("eid")).alias("stroke_id"),
    )
    strokes.createOrReplaceTempView("strokes")
    return spark.sql(_STK_FINAL)
