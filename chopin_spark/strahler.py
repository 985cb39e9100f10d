"""Strahler stream order over a D8 flow forest — block-local
bottom-up passes (the hydrology-verb family beside flowacc.py's
accumulation and sinkfill.py; terra has no stream-order verb, but the
reference's zonal/terrain suite is the same raster pipeline stage —
/root/reference/R/calculate.R extract_at feeds on exactly these
derived surfaces).

Strahler (1957): a cell with no upstream contributors has order 1; a
cell whose upstream neighbors' maximum order m is attained by >= 2 of
them has order m + 1, else m.  On the strictly-downhill D8 forest the
recursion is well-founded.

Execution = flowacc.py's template: per round, every block recomputes
its home cells' orders EXACTLY given current halo-child orders, in one
z-DESCENDING pass (upstream cells have strictly higher z, so in-block
children finalize before their downstream target is visited).  Orders
start at 1 and only grow (the update is monotone in child orders), so
estimates rise to the unique fixpoint; rounds scale with how many
block boundaries drainage paths cross — the block-graph diameter, not
cell count (docs/SCALE.md "Iterative raster accumulation").  A cell's
only cross-block appearance is in its downstream target's block, so
the halo is edge-sized.  Convergence = an empty improved set;
``max_rounds`` raises rather than returning a partial surface.

Reliability: per-round ``localCheckpoint`` stores blocks on executors
only — at cluster scale an executor loss mid-fixpoint fails the job
(rerun from the durable checkpoint) instead of silently returning a
partially-propagated surface; swap in a reliable checkpoint dir when
executor churn is expected (same trade-off note as flowacc.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: rounds actually used by the last strahler_order() call (scale
#: evidence: flat round counts at 10x data — see BENCH/scale_rung)
LAST_ROUNDS: int | None = None


def strahler_py(z: dict, flow: dict) -> dict:
    """Reference Python: exact Strahler orders by explicit recursion
    over the flow forest (tests pin the engine against this)."""
    children: dict = {}
    for c, t in flow.items():
        if t is not None:
            children.setdefault(t, []).append(c)
    order: dict = {}

    def rec(c):
        if c in order:
            return order[c]
        ch = children.get(c, ())
        if not ch:
            order[c] = 1
            return 1
        orders = sorted((rec(u) for u in ch), reverse=True)
        m = orders[0]
        order[c] = m + 1 if len(orders) >= 2 and orders[1] == m else m
        return order[c]

    for c in z:
        rec(c)
    return order


def _local_strahler(pdf):
    """One block: exact home-cell orders given (stale) halo-child
    orders, in z-descending order so in-block children are final
    before their downstream target is computed."""
    import pandas as pd

    cells = {}
    for x, y, z, fx, fy, order, home in zip(
        pdf["x"].astype(int), pdf["y"].astype(int), pdf["z"].astype(int),
        pdf["fx"], pdf["fy"], pdf["ord"].astype(int), pdf["is_home"],
    ):
        fl = None if pd.isna(fx) else (int(fx), int(fy))
        cells[(x, y)] = (z, fl, order, bool(home))

    children: dict = {}
    for key, (z, fl, order, home) in cells.items():
        if fl is not None and fl in cells and cells[fl][3]:
            children.setdefault(fl, []).append(key)

    new_ord: dict = {}
    for key in sorted(
        (k for k, v in cells.items() if v[3]), key=lambda k: -cells[k][0]
    ):
        best = second = 0
        for ch in children.get(key, ()):
            o = new_ord.get(ch, cells[ch][2])
            if o > best:
                best, second = o, best
            elif o > second:
                second = o
        new_ord[key] = (
            1 if best == 0 else best + 1 if second == best else best
        )

    out = [
        (k[0], k[1], v)
        for k, v in new_ord.items()
        if v > cells[k][2]
    ]
    return pd.DataFrame(out, columns=["x", "y", "ord"]).astype("int64")


def strahler_order(
    cells: DataFrame, tile_w: int, tile_h: int, max_rounds: int = 24
) -> DataFrame:
    """``cells``: x, y, z (distinct ints), fx, fy (downstream coords,
    NULL at pits).  Returns (x, y, ord), ord >= 1 everywhere."""
    global LAST_ROUNDS
    bx = F.floor(F.col("x") / tile_w)
    by = F.floor(F.col("y") / tile_h)
    cur = cells.select(
        "x", "y", F.col("z").cast("long").alias("z"),
        F.col("fx").cast("long").alias("fx"),
        F.col("fy").cast("long").alias("fy"),
        F.lit(1).cast("long").alias("ord"),
    )

    schema = "x long, y long, ord long"
    for rnd in range(max_rounds):
        mem = cur.select(
            "x", "y", "z", "fx", "fy", "ord",
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
            .applyInPandas(lambda pdf: _local_strahler(pdf), schema)
            .localCheckpoint()
        )
        if improved.isEmpty():
            LAST_ROUNDS = rnd + 1
            return cur.select("x", "y", "ord")
        cur = (
            cur.alias("c")
            .join(improved.alias("i"), ["x", "y"], "left")
            .select(
                "x", "y", "z", "fx", "fy",
                F.coalesce(F.col("i.ord"), F.col("c.ord")).alias("ord"),
            )
        )
        cur = cur.localCheckpoint()  # eager lineage cut (flowacc note)
    raise RuntimeError(
        f"strahler_order did not converge in {max_rounds} rounds — "
        "drainage paths cross more block boundaries than expected; "
        "refusing to return a partially-propagated surface"
    )
