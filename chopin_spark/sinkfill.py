"""Depression filling (Planchon–Darboux 2002) — block-parallel
priority flood.

The hydrology-preprocessing fixpoint terra/WhiteboxTools run before any
flow-routing verb (``fillSinks`` / ``FillDepressions``): raise every
cell's water level W to the lowest value from which it can drain off
the raster edge,

    W(c) = z(c)                                   on the border,
    W(c) = max(z(c), min_{n in N4} W(n) + 1)      elsewhere

(eps = 1 on the integer DEM lattice, so the filled surface has no flat
ambiguity and flow_accumulation_d8 downstream is well-defined).

Spark-first shape — the same block-parallel scheme as
:func:`chopin_spark.costdist.cost_distance`, because the recurrence is
a MINIMAX shortest path: within each block an exact PRIORITY FLOOD
(Dijkstra ordered by W, relaxation ``W(n) = max(z(n), W(c) + 1)`` —
monotone, so label-setting correctness carries over) seeded by its own
settled cells plus a one-cell halo of neighbor-block levels; one
co-partitioned shuffle per round; rounds scale with how many block
boundaries drainage paths cross (≈ block-graph diameter), NOT cell
count.  Lineage cut per round; non-convergence raises loudly.

Reference parity: chopin wraps terra's raster verbs
(/root/reference/R/processing.R); depression filling is the
preprocessing member of the flow family (flowacc.py, watershed).
"""

from __future__ import annotations

import heapq

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INF = 1 << 62


def _local_flood(pdf):
    """Exact priority flood on one block (home + halo rows); returns
    improved home rows only."""
    import pandas as pd

    xs = pdf["x"].to_numpy()
    ys = pdf["y"].to_numpy()
    zs = pdf["z"].to_numpy()
    ws = pdf["w"].to_numpy()
    home = pdf["is_home"].to_numpy()

    # halo rows may duplicate a coordinate; keep the minimum level
    best = {}
    for i, key in enumerate(zip(xs, ys)):
        key = (int(key[0]), int(key[1]))
        if key not in best or ws[i] < ws[best[key]]:
            best[key] = i

    z = {k: int(zs[i]) for k, i in best.items()}
    w = {k: int(ws[i]) for k, i in best.items()}
    heap = [(v, k) for k, v in w.items() if v < INF]
    heapq.heapify(heap)
    while heap:
        wv, (x, y) = heapq.heappop(heap)
        if wv > w[(x, y)]:
            continue
        for nk in ((x + 1, y), (x - 1, y), (x, y + 1), (x, y - 1)):
            if nk not in w:
                continue
            nw = wv + 1
            if z[nk] > nw:
                nw = z[nk]
            if nw < w[nk]:
                w[nk] = nw
                heapq.heappush(heap, (nw, nk))

    out_x, out_y, out_w = [], [], []
    seen = set()
    for i in range(len(xs)):
        if not home[i]:
            continue
        key = (int(xs[i]), int(ys[i]))
        if key in seen:
            continue
        seen.add(key)
        if w[key] < int(ws[i]):
            out_x.append(key[0])
            out_y.append(key[1])
            out_w.append(w[key])
    return pd.DataFrame({"x": out_x, "y": out_y, "w": out_w})


def sink_fill(
    cells: DataFrame,
    tile_w: int,
    tile_h: int,
    max_rounds: int = 24,
) -> DataFrame:
    """Filled water level for every cell.

    ``cells``: columns x, y (int), z (int), w (int; z at border/outlet
    cells, anything >= INF elsewhere).  Returns (x, y, w).
    """
    bx = F.floor(F.col("x") / tile_w)
    by = F.floor(F.col("y") / tile_h)
    cur = cells.select(
        "x", "y",
        F.col("z").cast("long").alias("z"),
        F.col("w").cast("long").alias("w"),
    )

    schema = "x long, y long, w long"
    for _rnd in range(max_rounds):
        mem = cur.select(
            "x", "y", "z", "w",
            F.explode(
                F.array_distinct(
                    F.array(
                        F.struct(bx.alias("bx"), by.alias("by")),
                        F.struct(
                            F.floor((F.col("x") + 1) / tile_w).alias("bx"),
                            by.alias("by"),
                        ),
                        F.struct(
                            F.floor((F.col("x") - 1) / tile_w).alias("bx"),
                            by.alias("by"),
                        ),
                        F.struct(
                            bx.alias("bx"),
                            F.floor((F.col("y") + 1) / tile_h).alias("by"),
                        ),
                        F.struct(
                            bx.alias("bx"),
                            F.floor((F.col("y") - 1) / tile_h).alias("by"),
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
            .applyInPandas(lambda pdf: _local_flood(pdf), schema)
            .localCheckpoint()
        )
        if improved.isEmpty():
            return cur.select("x", "y", "w")
        cur = (
            cur.alias("c")
            .join(improved.alias("i"), ["x", "y"], "left")
            .select(
                "x", "y", "z",
                F.least(
                    F.coalesce(F.col("i.w"), F.col("c.w")), F.col("c.w")
                ).alias("w"),
            )
        ).localCheckpoint()
    raise RuntimeError(
        f"sink_fill did not converge in {max_rounds} rounds — raise "
        "max_rounds (drainage paths cross more block boundaries than "
        "expected); refusing to return an unfinished surface"
    )
