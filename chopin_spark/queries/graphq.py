"""Crawl-graph traversal queries: BFS seed depth + redirect resolution.

Two iterative graph primitives a 100 TB crawl store runs on its host /
URL graphs, both with exact recursive-CTE oracles:

* ``crawl_depth_bfs`` — minimum hop distance from the seed list over
  the host link graph (Common Crawl's "depth from seeds" feature).
  Engine: components.bfs_depths — one frontier⋈edges shuffle per hop,
  anti-join visited set, constant round count.  Oracle: DuckDB
  recursive CTE enumerating bounded walks + MIN(depth); the engine's
  first-touch-wins anti-join and the oracle's min-over-all-walks are
  independent formulations of the same BFS semantics.
* ``redirect_resolve_final`` — resolve 301-redirect chains to their
  final target with exact hop counts, by pointer DOUBLING
  (components.pointer_jump, ⌈log2 L⌉ self-joins) — vs the oracle's
  one-hop-at-a-time recursive CTE.  A hash match proves the
  logarithmic-round plan computes exactly the sequential chain walk.

Both graphs are deterministic LCG functions of ``doc_id`` (the same
discipline as webtext.py's PageRank/HITS fixtures) so the fixture text
is shared verbatim between the Spark and DuckDB sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark.queries import register
from chopin_spark.tables import load

# host link graph on 97 hosts — same multiplier family as webtext's
# PageRank fixture but an independent (shift, modulus) draw so the two
# graphs don't accidentally share structure
_EDGES = """(
  SELECT (doc_id * 69069) % 97 AS src,
         ((doc_id * 48271) + 17) % 97 AS dst
  FROM documents
  WHERE (doc_id * 69069) % 97 <> ((doc_id * 48271) + 17) % 97
)"""

_SEED_MOD = 13  # seeds = hosts ≡ 0 (mod 13): 8 of the 97 hosts
_MAX_DEPTH = 4

_BFS_ORACLE = f"""
WITH RECURSIVE e AS (SELECT * FROM {_EDGES}),
n AS (
  SELECT DISTINCT src AS node FROM e
  UNION
  SELECT DISTINCT dst FROM e
),
walk(node, depth) AS (
  SELECT node, 0 FROM n WHERE node % {_SEED_MOD} = 0
  UNION
  SELECT e.dst, w.depth + 1
  FROM walk w JOIN e ON e.src = w.node
  WHERE w.depth < {_MAX_DEPTH}
)
SELECT node AS host_num, CAST(MIN(depth) AS BIGINT) AS depth
FROM walk GROUP BY node
"""


@register("crawl_depth_bfs", _BFS_ORACLE)
def crawl_depth_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum hop count from the seed hosts over the link graph,
    capped at {_MAX_DEPTH} hops (components.bfs_depths).  Scale shape:
    rounds = the depth cap (constant), each round one node-keyed
    equi-join + distinct + anti-join — every structure partial-
    aggregable, no full-graph materialization beyond the edge list."""
    from chopin_spark.components import bfs_depths

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    edges = spark.sql(f"SELECT * FROM {_EDGES}")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    seeds = nodes.filter(F.col("node") % _SEED_MOD == 0)
    out = bfs_depths(edges, seeds, max_depth=_MAX_DEPTH)
    return out.select(
        F.col("node").alias("host_num"), F.col("depth").cast("long").alias("depth")
    )


# redirect successor function on the 200-node URL universe (doc_id is
# contiguous from 0 at every sf, so doc_id % 200 covers the universe):
# multiples of 5 are final targets (self-loop); everything else 301s to
# a strictly smaller id — acyclic by construction, chains up to ~100
# hops long, which is exactly the regime where pointer doubling's
# log-rounds beat one-hop-per-round propagation
_SUCC = """(
  SELECT node,
         CASE WHEN node % 5 = 0 THEN node
              ELSE GREATEST(node - 1 - ((node * 2654435761) % 3), 0)
         END AS nxt
  FROM (SELECT DISTINCT doc_id % 200 AS node FROM documents)
)"""

_REDIRECT_ORACLE = f"""
WITH RECURSIVE s AS (SELECT * FROM {_SUCC}),
r(node, cur, hops) AS (
  SELECT node, node, 0 FROM s
  UNION ALL
  SELECT r.node, s.nxt, r.hops + 1
  FROM r JOIN s ON s.node = r.cur
  WHERE s.nxt <> r.cur
)
SELECT node AS url_node,
       CAST(arg_max(cur, hops) AS BIGINT) AS final_target,
       CAST(MAX(hops) AS BIGINT) AS n_hops
FROM r GROUP BY node
"""


@register("redirect_resolve_final", _REDIRECT_ORACLE)
def redirect_resolve_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final redirect target + exact hop count per URL node
    (components.pointer_jump).  The oracle walks chains ONE hop per
    recursion level; the engine doubles — ⌈log2 L⌉ self-equi-joins —
    and the value hash proves the two agree node-for-node.  At 10^12
    URLs the doubling plan is the only viable one: a 50-hop chain is 6
    rounds, not 50, and every round is a plain pointer-keyed
    equi-join."""
    from chopin_spark.components import pointer_jump

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    succ = spark.sql(f"SELECT * FROM {_SUCC}")
    out = pointer_jump(succ, max_rounds=12)
    return out.select(
        F.col("node").cast("long").alias("url_node"),
        F.col("target").cast("long").alias("final_target"),
        F.col("hops").cast("long").alias("n_hops"),
    )
