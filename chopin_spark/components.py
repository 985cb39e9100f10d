"""Connected components over a pair graph — the dedup endgame.

LSH/Jaccard verification emits duplicate PAIRS; a training pipeline
needs duplicate CLUSTERS (keep one representative per component).
chopin has no graph layer (its dedup analog is unique-id joins); this
is one of the training-data extensions SURVEY.md §2 calls for beyond
the reference.

Algorithm: min-label propagation. comp(v) starts at v; each round
every vertex takes the min of its own label and its neighbors' labels;
fixpoint = min vertex id per component.  Round count is the component
DIAMETER — for near-dup graphs (clusters of mutually-similar docs,
diameter 2-4) that is 2-5 rounds, each round one shuffle-join + one
partial+final min aggregation, all JVM-side.  Lineage is cut with
localCheckpoint every round so the plan never stacks (Catalyst
exponential-analysis guard); convergence is a scalar count per round
(a driver-side scalar, not a collect of data).  For adversarial
long-chain graphs use the alternating large-star/small-star variant
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) — O(log n) rounds; not needed for dedup-shaped graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_iter: int = 25,
) -> DataFrame:
    """(node, comp_id) for every node in `pairs`; comp_id = min node id
    reachable in the undirected pair graph."""
    edges = (
        pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .unionByName(pairs.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .localCheckpoint()
    )
    comp = (
        edges.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp_id", F.col("node"))
        .localCheckpoint()
    )
    # labels only ever decrease, so sum(comp_id) strictly decreases
    # until the fixpoint — convergence is one scalar aggregate per
    # round, no self-join
    prev_sum = comp.agg(F.sum("comp_id")).first()[0]
    for _ in range(max_iter):
        # neighbor labels: for edge (a, b), b hears a's current label
        msgs = edges.join(
            comp.withColumnRenamed("node", "a"), "a"
        ).select(F.col("b").alias("node"), "comp_id")
        comp = (
            comp.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("comp_id").alias("comp_id"))
            .localCheckpoint()
        )
        new_sum = comp.agg(F.sum("comp_id")).first()[0]
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return comp
