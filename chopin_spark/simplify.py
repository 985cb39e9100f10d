"""Distributed Douglas–Peucker polyline simplification
(terra::simplifyGeom / sf::st_simplify parity — the vector-reduction
verb chopin users run on road/river layers before plotting or coarse
joins).

The sequential algorithm is recursive; the distributed re-expression
is a BOUNDED-ROUND interval refinement, the same discipline as the
CC/PageRank fixpoints:

- state = open intervals (line_id, s, e) with their endpoint coords;
- each round, every open interval joins its interior vertices
  (line_id equi-join + idx range), finds the max-deviation vertex by
  one argmax window, and either SPLITS there (deviation > τ) or
  FINALIZES;
- after `rounds` rounds, surviving open intervals keep ALL their
  interior vertices (conservative, deterministic — never drops a
  vertex the exact algorithm would keep; documented bound, no silent
  truncation: unfinished intervals are counted in the output).

All arithmetic is exact int64: deviation is compared by
cross² > τ²·|AB|² (cross = (e−s)×(v−s) ≤ ~3e7 on the fixture lattice,
cross² ≤ ~1e15), and ties break to the smallest vertex index, so every
engine and partitioning produces the identical kept set.

At 100 TB: intervals are O(lines·2^round) rows — tiny relative to the
vertex table; each round is one equi-join + one window over candidate
rows grouped by interval.  Rounds is O(log m) for real geometry (DP
split depth), and the conservative finish bounds worst-case adversarial
depth without unbounded iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dp_simplify_kept(
    vertices: DataFrame,
    tau2: int,
    rounds: int = 6,
) -> DataFrame:
    """vertices: (line_id, idx, x, y) integer coords, idx dense from 0.
    Returns (kept, open_intervals): the kept-vertex set (line_id, idx)
    after bounded-round DP with squared tolerance `tau2`, and the
    still-open interval DataFrame (lazy — count it to audit how much
    of the recursion the round budget left unfinished; its interior
    vertices are conservatively kept)."""
    v = vertices.select("line_id", "idx", "x", "y").localCheckpoint()
    ends = v.groupBy("line_id").agg(F.max("idx").alias("m"))
    iv = (
        ends.join(v.withColumnRenamed("idx", "s"), "line_id")
        .filter(F.col("s") == 0)
        .select(
            "line_id",
            F.col("s"),
            F.col("m").alias("e"),
            F.col("x").alias("sx"), F.col("y").alias("sy"),
        )
        .join(
            v.select(
                "line_id", F.col("idx").alias("e"),
                F.col("x").alias("ex"), F.col("y").alias("ey"),
            ),
            ["line_id", "e"],
        )
        .select("line_id", "s", "e", "sx", "sy", "ex", "ey")
    )
    done = None
    for _ in range(rounds):
        cand = iv.join(v, "line_id").filter(
            (F.col("idx") > F.col("s")) & (F.col("idx") < F.col("e"))
        )
        cross = (F.col("ex") - F.col("sx")) * (F.col("y") - F.col("sy")) - (
            F.col("ey") - F.col("sy")
        ) * (F.col("x") - F.col("sx"))
        l2 = (F.col("ex") - F.col("sx")) * (F.col("ex") - F.col("sx")) + (
            F.col("ey") - F.col("sy")
        ) * (F.col("ey") - F.col("sy"))
        w = Window.partitionBy("line_id", "s", "e").orderBy(
            F.desc("cross2"), F.asc("idx")
        )
        # best is consumed by THREE branches (finalize, left child,
        # right child) and the next round re-joins the result: without
        # a materialization here the lazy DAG re-executes every prior
        # round per branch — 3^rounds window evaluations.  One
        # localCheckpoint per round keeps the recurrence linear, the
        # same lineage discipline as the CC/pagerank loops.
        best = (
            cand.withColumn("cross2", cross * cross)
            .withColumn("l2", l2)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .localCheckpoint()
        )
        # intervals with no interior vertex never join → finalize them
        empty = iv.join(
            best.select("line_id", "s", "e"), ["line_id", "s", "e"],
            "left_anti",
        ).select("line_id", "s", "e")
        fin = best.filter(
            F.col("cross2") <= F.lit(tau2) * F.col("l2")
        ).select("line_id", "s", "e")
        fin = fin.unionByName(empty)
        done = fin if done is None else done.unionByName(fin)
        split = best.filter(F.col("cross2") > F.lit(tau2) * F.col("l2"))
        left = split.select(
            "line_id", "s", F.col("idx").alias("e"), "sx", "sy",
            F.col("x").alias("ex"), F.col("y").alias("ey"),
        )
        right = split.select(
            "line_id", F.col("idx").alias("s"), "e",
            F.col("x").alias("sx"), F.col("y").alias("sy"), "ex", "ey",
        )
        iv = left.unionByName(right)
    # kept vertices: every interval endpoint ever finalized or split
    # (split points become endpoints of children), plus ALL interior
    # vertices of intervals still open after the round budget
    open_interior = iv.join(v, "line_id").filter(
        (F.col("idx") > F.col("s")) & (F.col("idx") < F.col("e"))
    ).select("line_id", "idx")
    endpoints = (
        done.select("line_id", F.col("s").alias("idx"))
        .unionByName(done.select("line_id", F.col("e").alias("idx")))
        .unionByName(iv.select("line_id", F.col("s").alias("idx")))
        .unionByName(iv.select("line_id", F.col("e").alias("idx")))
    )
    kept = endpoints.unionByName(open_interior).distinct()
    return kept, iv


def dp_simplify_summary(
    vertices: DataFrame, tau2: int, rounds: int = 6
) -> DataFrame:
    """Per-line summary of the kept set: n_kept, Σidx² checksum, and
    the simplified polyline's total squared-segment-length sum (lag
    window over kept vertices in idx order) — integer-exact carriers
    that pin WHICH vertices survived and the resulting geometry."""
    kept, _ = dp_simplify_kept(vertices, tau2, rounds)
    kv = kept.join(vertices, ["line_id", "idx"])
    w = Window.partitionBy("line_id").orderBy("idx")
    seg = kv.select(
        "line_id", "idx", "x", "y",
        F.lag("x").over(w).alias("px"),
        F.lag("y").over(w).alias("py"),
    )
    d2 = (F.col("x") - F.col("px")) * (F.col("x") - F.col("px")) + (
        F.col("y") - F.col("py")
    ) * (F.col("y") - F.col("py"))
    return seg.groupBy("line_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("idx") * F.col("idx")).cast("long").alias("idx_chk"),
        F.sum(F.when(F.col("px").isNull(), 0).otherwise(d2))
        .cast("long")
        .alias("len2_sum"),
    )
