"""D8 flow accumulation over a DEM — block-local topological sums.

The ``terra::flowAccumulation`` analog (terrain-verb family; the Horn
slope/aspect stencil lives in raster.py): every cell drains to its
steepest-descent D8 neighbor (strictly lower only — a distinct-valued
DEM makes the flow graph a forest), and the accumulation of a cell is
the number of cells draining THROUGH it, itself included.

Integer-exact determinism: steepness over unequal step lengths is
compared as ``drop × weight`` with integer weights 7 (orthogonal) and
5 (diagonal) — 7/5 as the exact-integer stand-in for the sqrt2 step
ratio, applied identically in the engine and the DuckDB oracle; ties
break on a fixed neighbor order.

Scale shape = costdist.cost_distance's template (docs/SCALE.md,
"Iterative raster accumulation"): each round every block recomputes its
cells' accumulation EXACTLY given current halo inflows, by one pass in
DEM-descending order (upstream-before-downstream inside the block —
valid because flow is strictly height-decreasing).  Estimates grow
monotonically to the unique fixpoint; rounds scale with how many block
boundaries drainage paths cross, not with cell count.  A cell's only
cross-block appearance is in its DOWNSTREAM target's block (the one
place its value is consumed), so the halo is edge-sized.  Convergence
= an empty improved set; ``max_rounds`` raises rather than returning a
partially-propagated surface.

Reliability trade-off (also applies to rastercc's seam cut): the
per-round ``localCheckpoint`` stores blocks on executors only, so at
cluster scale an executor loss mid-fixpoint kills the lineage and
FAILS the job instead of recomputing — rerun from the last durable
checkpoint (chopin_spark.checkpoint) rather than trusting a silently
partial surface.  That is the intended failure mode for a 10^10-cell
run: swap ``localCheckpoint`` for ``sparkContext.setCheckpointDir`` +
``checkpoint()`` when executor churn is expected and the (much slower)
HDFS round-trip per round is acceptable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# D8 neighbor order (tie-break order): E, SE, S, SW, W, NW, N, NE
D8 = (
    (1, 0, 7), (1, 1, 5), (0, 1, 7), (-1, 1, 5),
    (-1, 0, 7), (-1, -1, 5), (0, -1, 7), (1, -1, 5),
)


def d8_downstream(z):
    """Reference Python: {(x, y): elevation} -> {(x, y): target|None}."""
    flow = {}
    for (x, y), zv in z.items():
        best = None
        for i, (dx, dy, wt) in enumerate(D8):
            nb = (x + dx, y + dy)
            if nb not in z:
                continue
            drop = zv - z[nb]
            if drop <= 0:
                continue
            score = drop * wt
            if best is None or score > best[0]:
                best = (score, i, nb)
        flow[(x, y)] = best[2] if best else None
    return flow


def _local_accumulate(pdf):
    """One block: exact topological accumulation of the home cells
    given (stale) halo inflow values.  Home cells process in
    z-descending order, so in-block upstream contributors are final
    before their target is summed."""
    import pandas as pd

    cells = {}
    for x, y, z, fx, fy, acc, home in zip(
        pdf["x"].astype(int), pdf["y"].astype(int), pdf["z"].astype(int),
        pdf["fx"], pdf["fy"], pdf["acc"].astype(int), pdf["is_home"],
    ):
        fl = None if pd.isna(fx) else (int(fx), int(fy))
        cells[(x, y)] = (z, fl, acc, bool(home))

    halo_inflow: dict = {}
    home_srcs: dict = {}
    for key, (z, fl, acc, home) in cells.items():
        if fl is None or fl not in cells or not cells[fl][3]:
            continue
        if home:
            home_srcs.setdefault(fl, []).append(key)
        else:
            halo_inflow[fl] = halo_inflow.get(fl, 0) + acc

    new_acc: dict = {}
    for key in sorted(
        (k for k, v in cells.items() if v[3]), key=lambda k: -cells[k][0]
    ):
        new_acc[key] = (
            1
            + halo_inflow.get(key, 0)
            + sum(new_acc[s] for s in home_srcs.get(key, ()))
        )

    out = [
        (k[0], k[1], v)
        for k, v in new_acc.items()
        if v > cells[k][2]
    ]
    return pd.DataFrame(out, columns=["x", "y", "acc"]).astype("int64")


def flow_accumulation(
    cells: DataFrame, tile_w: int, tile_h: int, max_rounds: int = 24
) -> DataFrame:
    """``cells``: x, y, z (distinct ints), fx, fy (downstream coords,
    NULL at pits).  Returns (x, y, acc), acc >= 1 everywhere."""
    bx = F.floor(F.col("x") / tile_w)
    by = F.floor(F.col("y") / tile_h)
    cur = cells.select(
        "x", "y", F.col("z").cast("long").alias("z"),
        F.col("fx").cast("long").alias("fx"),
        F.col("fy").cast("long").alias("fy"),
        F.lit(1).cast("long").alias("acc"),
    )

    schema = "x long, y long, acc long"
    for rnd in range(max_rounds):
        mem = cur.select(
            "x", "y", "z", "fx", "fy", "acc",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.struct(bx.alias("bx"), by.alias("by")),
                        F.struct(
                            F.floor(
                                F.coalesce(F.col("fx"), F.col("x")) / tile_w
                            ).alias("bx"),
                            F.floor(
                                F.coalesce(F.col("fy"), F.col("y")) / tile_h
                            ).alias("by"),
                        ),
                    )
                )
            ).alias("blk"),
        ).withColumn(
            "is_home",
            (F.col("blk.bx") == bx) & (F.col("blk.by") == by),
        )
        improved = (
            mem.groupBy("blk")
            .applyInPandas(lambda pdf: _local_accumulate(pdf), schema)
            .localCheckpoint()
        )
        if improved.isEmpty():
            return cur.select("x", "y", "acc")
        cur = (
            cur.alias("c")
            .join(improved.alias("i"), ["x", "y"], "left")
            .select(
                "x", "y", "z", "fx", "fy",
                F.coalesce(F.col("i.acc"), F.col("c.acc")).alias("acc"),
            )
        )
        # eager per-round lineage cut: measured fastest at fixture
        # scale (lazy or periodic cuts re-derive the full round chain
        # inside the next grouped map — 3-6x slower end-to-end)
        cur = cur.localCheckpoint()
    raise RuntimeError(
        f"flow_accumulation did not converge in {max_rounds} rounds — "
        "drainage paths cross more block boundaries than expected; "
        "refusing to return a partially-propagated surface"
    )
