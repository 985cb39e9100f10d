"""Distributed raster connected components: block-local union-find +
boundary-graph merge.

The scale-correct shape for labeling regions on a grid (terra::patches /
terra::as.polygons dissolve, `/root/reference/R/gridding.R` grid-from-
raster path): global iterative CC (components.py) shuffles EVERY edge
every round — O(rounds · |cells|) traffic.  On a raster, almost all
merging is local, so the classic two-level algorithm wins:

1. partition cells into rectangular blocks (the raster's native tiling);
2. per block, label 4-connected same-group runs with an in-memory
   union-find inside one ``applyInPandas`` pass — local label = MIN cell
   id of the local component (one shuffle, by block id);
3. cross-block adjacencies exist only along block SEAMS, so the label
   equivalence graph is perimeter-sized (O(|cells| / tile_w) rows, not
   O(|cells|)); solve it with the alternating-star engine — its
   O(log n) rounds now iterate over seam labels only;
4. one hash join relabels cells to the global root (label = MIN cell id
   of the full component, same contract as components.connected_* —
   asserted equal in tests/test_rastercc.py).

At a 10^10-cell surface with 10^4-cell blocks the seam graph is ~10^7
rows — far below the fact table, and the only iterative state.  Every
fact-sized stage is a single pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chopin_spark.components import connected_components_star


def raster_components(
    cells: DataFrame,
    width: int,
    height: int,
    tile_w: int = 8,
    tile_h: int = 8,
    seam_driver_cap: int = 200_000,
) -> DataFrame:
    """(n, comp_id) for every input cell; comp_id = min cell id of the
    4-connected same-``grp`` component.

    `cells` must have columns ``n`` (BIGINT cell id, ``n = x + y*width``,
    each id at most once) and ``grp`` (BIGINT region key — cells join a
    component only through neighbors with EQUAL grp; pass a constant for
    plain mask labeling).
    """
    bw = (width + tile_w - 1) // tile_w

    blocked = cells.select(
        "n",
        "grp",
        (
            (F.col("n") % width) / tile_w
        ).cast("long").alias("_bx"),
        (
            (F.col("n") / width).cast("long") / tile_h
        ).cast("long").alias("_by"),
    ).withColumn("blk", F.col("_by") * bw + F.col("_bx"))

    def label_block(pdf: pd.DataFrame) -> pd.DataFrame:
        n = pdf["n"].to_numpy(dtype=np.int64)
        grp = pdf["grp"].to_numpy(dtype=np.int64)
        order = np.argsort(n)
        n, grp = n[order], grp[order]
        pos = {int(v): i for i, v in enumerate(n)}
        parent = np.arange(len(n), dtype=np.int64)

        def find(i: int) -> int:
            while parent[i] != i:
                parent[i] = parent[parent[i]]
                i = parent[i]
            return i

        x = n % width
        for i, v in enumerate(n):
            for nb, seam in ((v + 1, x[i] == width - 1), (v + width, False)):
                if seam:
                    continue  # right neighbor is in the next column/block
                j = pos.get(int(nb))
                if j is None or grp[j] != grp[i]:
                    continue
                # neighbor must be in the SAME block (same applyInPandas
                # group); v+width may fall in the block below
                if (nb % width) // tile_w != x[i] // tile_w or (
                    nb // width
                ) // tile_h != (v // width) // tile_h:
                    continue
                ri, rj = find(i), find(j)
                if ri != rj:
                    if ri < rj:
                        parent[rj] = ri
                    else:
                        parent[ri] = rj
        lbl = n[[find(i) for i in range(len(n))]]
        return pd.DataFrame({"n": n, "grp": grp, "lbl": lbl})

    local = blocked.groupBy("blk").applyInPandas(
        label_block, "n long, grp long, lbl long"
    ).localCheckpoint()

    # seam adjacencies: cells on a block's right/top edge joined to the
    # neighbor cell one step over — inputs restricted to edge cells, so
    # the join is perimeter-sized
    right = (
        local.filter((F.col("n") % width) % tile_w == tile_w - 1)
        .filter((F.col("n") % width) != width - 1)
        .select((F.col("n") + 1).alias("n"), F.col("grp").alias("g1"),
                F.col("lbl").alias("l1"))
    )
    top = (
        local.filter((F.col("n") / width).cast("long") % tile_h == tile_h - 1)
        .select((F.col("n") + width).alias("n"), F.col("grp").alias("g1"),
                F.col("lbl").alias("l1"))
    )
    probes = right.unionByName(top)
    seam = (
        probes.join(local, "n")
        .filter(F.col("g1") == F.col("grp"))
        .select(F.col("l1").alias("a"), F.col("lbl").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )

    # size-switched seam solve (same tiering as raster.py's
    # broadcast-vs-shuffle join and the driver-side merge_grid pass):
    # the seam graph is label metadata, not cell data — below the cap
    # a driver union-find replaces ~10 iterative shuffle rounds; above
    # it, the distributed star engine takes over unchanged.
    # materialize the seam ONCE before the tier probe: without the cut,
    # the over-cap branch would discard the probe's work and recompute
    # the whole seam plan from scratch inside connected_components_star
    # (ADVICE r03), and the star engine's own lineage cuts would each
    # re-derive it again.
    seam = seam.localCheckpoint()
    rows = seam.limit(seam_driver_cap + 1).collect()
    if len(rows) <= seam_driver_cap:
        if not rows:
            return local.select("n", F.col("lbl").alias("comp_id"))
        parent: dict[int, int] = {}

        def find(v: int) -> int:
            parent.setdefault(v, v)
            root = v
            while parent[root] != root:
                root = parent[root]
            while parent[v] != root:
                parent[v], v = root, parent[v]
            return root

        for r in rows:
            ra, rb = find(r.a), find(r.b)
            if ra != rb:
                if ra < rb:
                    parent[rb] = ra
                else:
                    parent[ra] = rb
        mapping = [(v, find(v)) for v in list(parent)]
        roots = local.sparkSession.createDataFrame(
            mapping, "lbl long, root long"
        )
        roots = F.broadcast(roots)
    else:
        roots = connected_components_star(seam, "a", "b").select(
            F.col("node").alias("lbl"), F.col("comp_id").alias("root")
        )
    return local.join(roots, "lbl", "left").select(
        "n", F.coalesce("root", "lbl").alias("comp_id")
    )
