"""Distributed grid-based DBSCAN over the cell-index pair join.

Density-based spatial clustering is the point-pattern counterpart of
chopin's exposure workflows (the reference feeds its extracted
summaries to exactly this kind of downstream clustering; chopin itself
stops at the summaries — this is a §2-extension operator like the
dedup/ANN family). The classic sequential algorithm (Ester et al.,
KDD'96) is a visit-order scan; the distributed re-expression is the
MR-DBSCAN shape:

1. ε-neighborhood pairs via the bounded-radius cell-index SELF-join
   (`vector._prep`, pad = ε — the same join that bounds the
   semivariogram/Ripley pair space: O(n · density · πε²), never n²).
2. Degree count per point → CORE iff |N_ε(p)| ≥ min_pts (count
   includes the point itself, the KDD'96 convention).
3. Core–core ε-edges → connected components
   (`components.connected_components_star`, O(log n) rounds) =
   cluster ids. Isolated cores (no core neighbor) are singleton
   clusters.
4. BORDER points (non-core with ≥1 core ε-neighbor) join the cluster
   of their MINIMUM-comp-id core neighbor — sequential DBSCAN leaves
   border assignment visit-order-dependent; the min rule makes it
   deterministic and partition-count-independent (documented
   deviation, same cluster SET either way).
5. Everything else is NOISE (cluster_id = -1).

Every stage is a JVM equi-join or partial+final aggregation; the only
iteration is the CC fixpoint, which cuts lineage per round. At 100 TB
the pair volume is bounded by local density — ε and min_pts are the
knobs the analyst already reasons about.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chopin_spark.components import connected_components_star
from chopin_spark.grid import RectGrid
from chopin_spark.vector import _prep


def dbscan(
    pts: DataFrame,
    grid: RectGrid,
    id_col: str,
    eps: float,
    min_pts: int,
) -> DataFrame:
    """(id, cluster_id, role) for every input point; role in
    ('core', 'border', 'noise'); cluster_id = min core id per cluster,
    -1 for noise. grid.pad must equal eps."""
    ids = pts.select(F.col(id_col).alias("a"))
    pairs = (
        _prep(pts, pts, grid, [id_col], [id_col])
        .filter(
            (F.col("_d") <= eps)
            & (F.col(id_col) != F.col(f"c_{id_col}"))
        )
        .select(F.col(id_col).alias("a"), F.col(f"c_{id_col}").alias("b"))
        # consumed by three downstream stages (degree, core edges,
        # border assignment) — materialize the ε-graph once
        .localCheckpoint()
    )
    # left join from ids: a point with ZERO ε-neighbors still counts
    # itself (|N_ε(p)| = 1), so min_pts <= 1 makes it a singleton core
    deg = ids.join(
        pairs.groupBy("a").agg(F.count(F.lit(1)).alias("n_nbrs")),
        "a",
        "left",
    ).fillna(0, subset=["n_nbrs"])
    core = deg.filter(F.col("n_nbrs") + 1 >= min_pts).select("a")
    edges = pairs.join(core, "a").join(
        core.select(F.col("a").alias("b")), "b"
    )
    comps = connected_components_star(edges, src="a", dst="b")
    singles = core.join(
        comps.select(F.col("node").alias("a")), "a", "left_anti"
    ).select(F.col("a").alias("node"), F.col("a").alias("comp_id"))
    comps = comps.unionByName(singles)
    core_lab = comps.select(
        F.col("node").alias("a"),
        F.col("comp_id").alias("cluster_id"),
        F.lit("core").alias("role"),
    )
    border = (
        pairs.join(core_lab.select("a"), "a", "left_anti")
        .join(
            comps.select(
                F.col("node").alias("b"), F.col("comp_id").alias("cid")
            ),
            "b",
        )
        .groupBy("a")
        .agg(F.min("cid").alias("cluster_id"))
        .withColumn("role", F.lit("border"))
    )
    labeled = core_lab.unionByName(border)
    noise = ids.join(labeled.select("a"), "a", "left_anti").select(
        "a",
        F.lit(-1).cast("long").alias("cluster_id"),
        F.lit("noise").alias("role"),
    )
    return labeled.unionByName(noise).select(
        F.col("a").alias(id_col),
        F.col("cluster_id").cast("long").alias("cluster_id"),
        "role",
    )
