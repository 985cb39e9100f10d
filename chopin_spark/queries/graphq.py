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


# --- k-core decomposition of the host graph ----------------------------------
#
# The graph-pruning staple between connected components and PageRank:
# the k-core (maximal subgraph where every node keeps degree ≥ k)
# separates a crawl's link-farm/core hosts from its periphery.  The
# fixture graph is scale-INDEPENDENT (doc_id < 500 universe — same
# edge set at every sf, like the 200-node redirect universe) and
# degree-SKEWED (one endpoint drawn as floor(sqrt(uniform)), density
# ∝ 2v+1), so peeling is non-trivial: at k = 7 three rounds strip 23
# of 97 hosts.  Engine: components.kcore_peel — per round one
# two-sided membership join + one degree agg, localCheckpoint lineage
# cuts, loud non-convergence.  Oracle: the SAME peeling unrolled as
# fixed CTE rounds (fixpoint is reached by round 3; later rounds are
# exact no-ops, so the unroll depth is not load-bearing).

_KCORE_K = 7
_KCORE_ROUNDS = 6
_KCORE_EDGES = """(
  SELECT DISTINCT
    LEAST((doc_id * 69069) % 97,
          CAST(FLOOR(SQRT((doc_id * 48271 + 17) % 9409)) AS BIGINT)) AS a,
    GREATEST((doc_id * 69069) % 97,
          CAST(FLOOR(SQRT((doc_id * 48271 + 17) % 9409)) AS BIGINT)) AS b
  FROM documents
  WHERE doc_id < 500
    AND (doc_id * 69069) % 97
        <> CAST(FLOOR(SQRT((doc_id * 48271 + 17) % 9409)) AS BIGINT)
)"""


def _kcore_oracle() -> str:
    # MATERIALIZED: DuckDB inlines plain CTEs, and each round
    # references the previous one 3x — un-materialized, the unroll
    # re-evaluates the base scan 3^rounds times (measured: 471 s vs
    # <1 s materialized)
    ctes = [
        f"e AS MATERIALIZED (SELECT * FROM {_KCORE_EDGES})",
        "n0 AS MATERIALIZED (SELECT a AS v FROM e UNION SELECT b FROM e)",
    ]
    for r in range(_KCORE_ROUNDS):
        ctes.append(f"""e{r} AS MATERIALIZED (
  SELECT e.a, e.b FROM e
  JOIN n{r} x ON x.v = e.a JOIN n{r} y ON y.v = e.b
),
d{r} AS MATERIALIZED (
  SELECT v, COUNT(*) AS d
  FROM (SELECT a AS v FROM e{r} UNION ALL SELECT b AS v FROM e{r})
  GROUP BY 1
),
n{r + 1} AS MATERIALIZED (SELECT v FROM d{r} WHERE d >= {_KCORE_K})""")
    last = _KCORE_ROUNDS - 1
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT v AS host_num, CAST(d AS BIGINT) AS core_degree
FROM d{last} WHERE d >= {_KCORE_K}"""
    )


@register("host_kcore", _kcore_oracle())
def host_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-core of the skewed host graph: surviving hosts with their
    in-core degree, by iterative peeling (components.kcore_peel)."""
    from chopin_spark.components import kcore_peel

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    edges = spark.sql(f"SELECT * FROM {_KCORE_EDGES}")
    out = kcore_peel(edges, k=_KCORE_K, max_rounds=_KCORE_ROUNDS + 4)
    return out.select(
        F.col("v").alias("host_num"),
        F.col("d").cast("long").alias("core_degree"),
    )


# --- weighted k-hop shortest path (crawl fetch-cost frontier) -----------------
#
# Cheapest way to reach each host from the seed list within K link
# hops, edge cost = a deterministic per-link latency class.  Engine:
# components.sssp_khop — K Bellman-Ford rounds over a node-sized dist
# table (one shuffle join + min-agg per round) after ONE fact-sized
# MIN(w) edge collapse.  Oracle: recursive-CTE enumeration of all
# ≤K-hop walks + MIN — independent path-semantics formulation; the
# UNION-dedup keeps the walk table bounded because costs are small
# integers.  Same LCG edge family as crawl_depth_bfs, plus a weight
# draw, so the fixture text is shared verbatim.

_W_EDGES = f"""(
  SELECT src, dst, MIN(w) AS w FROM (
    SELECT (doc_id * 69069) % 97 AS src,
           ((doc_id * 48271) + 17) % 97 AS dst,
           1 + (doc_id * 16807) % 9 AS w
    FROM documents
    WHERE (doc_id * 69069) % 97 <> ((doc_id * 48271) + 17) % 97
  ) GROUP BY 1, 2
)"""

_SSSP_K = 5

_SSSP_ORACLE = f"""
WITH RECURSIVE e AS (SELECT * FROM {_W_EDGES}),
walk(node, d, hops) AS (
  SELECT DISTINCT src, CAST(0 AS BIGINT), 0 FROM e
  WHERE src % {_SEED_MOD} = 0
  UNION
  SELECT e.dst, w.d + e.w, w.hops + 1
  FROM walk w JOIN e ON e.src = w.node
  WHERE w.hops < {_SSSP_K}
)
SELECT node AS host_num, CAST(MIN(d) AS BIGINT) AS min_cost
FROM walk GROUP BY 1
"""


@register("host_sssp_khop", _SSSP_ORACLE)
def host_sssp_khop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min fetch cost within 5 hops of the seed hosts
    (components.sssp_khop; node-sized rounds, one fact-sized edge
    collapse)."""
    from chopin_spark.components import sssp_khop

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    edges = spark.sql(f"SELECT * FROM {_W_EDGES}")
    seeds = edges.selectExpr("src AS node").filter(
        F.col("node") % _SEED_MOD == 0
    ).distinct().withColumn("cost", F.lit(0))
    out = sssp_khop(seeds, edges, k=_SSSP_K)
    return out.selectExpr(
        "CAST(node AS BIGINT) AS host_num",
        "CAST(min_cost AS BIGINT) AS min_cost",
    )


# --- power-law tail fit of the in-degree distribution (Hill estimator) --------
#
# Web-graph science 101: is the in-link distribution heavy-tailed, and
# with what exponent?  Hill's MLE over degrees ≥ d_min:
# α = 1 + n / Σ ln(d_i / d_min).  Shape: one fact-sized edge agg to
# in-degrees (host-bounded), then a ~hosts-sized filter + agg; ln
# enters once per qualifying host and the summed ≤1-ulp divergence is
# ~1e-13 against the 1e-4 grid (lmq discipline).

_HILL_DMIN = 5

_HILL_ORACLE = f"""
WITH e AS (SELECT * FROM {_EDGES}),
deg AS (
  SELECT dst AS host, CAST(COUNT(*) AS BIGINT) AS d
  FROM e GROUP BY 1
),
tail AS (
  SELECT d FROM deg WHERE d >= {_HILL_DMIN}
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
       CAST(MIN(d) AS BIGINT) AS d_min,
       CAST(MAX(d) AS BIGINT) AS d_max,
       ROUND(1.0 + COUNT(*) / SUM(LN(CAST(d AS DOUBLE) / {_HILL_DMIN})),
             4) AS alpha
FROM tail
"""


@register("degree_powerlaw_hill", _HILL_ORACLE)
def degree_powerlaw_hill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hill estimator of the in-degree power-law exponent over the
    host link graph (tail d ≥ 5)."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_HILL_ORACLE)


# --- semi-supervised label propagation (3 synchronous rounds) -----------------
#
# The host-classification primitive (topic/spam labels from a small
# seed set diffused over the link graph).  Seeds (hosts ≡ 0 mod 13)
# carry a fixed class (node mod 3); each round every non-seed takes
# the MAJORITY class among its labeled undirected neighbors, ties
# toward the smaller class id (encoded-MAX: cnt·4 + (3 − lbl)), no
# labeled neighbor → stays unlabeled.  Three rounds unrolled as CTEs —
# the same one-join-one-agg-per-round shape as PageRank; synchronous
# updates keep the result partition-order independent (asynchronous
# LPA is not deterministic and has no place in a verified pipeline).

_LP_ROUNDS = 3


def _lp_round(k: int) -> str:
    return f"""
c{k} AS (
  SELECT e.dst AS node, l.lbl, COUNT(*) AS cnt
  FROM und e JOIN l{k - 1} l ON l.node = e.src AND l.lbl IS NOT NULL
  GROUP BY 1, 2
),
m{k} AS (
  SELECT node, 3 - (MAX(cnt * 4 + (3 - lbl)) % 4) AS lbl FROM c{k}
  GROUP BY 1
),
l{k} AS (
  SELECT n.node,
         CASE WHEN n.node % {_SEED_MOD} = 0 THEN n.node % 3
              ELSE m.lbl END AS lbl
  FROM n LEFT JOIN m{k} m ON m.node = n.node
)"""


_LP_SQL = (
    f"""
WITH e AS (SELECT * FROM {_EDGES}),
und AS (
  SELECT src, dst FROM e UNION SELECT dst, src FROM e
),
n AS (
  SELECT DISTINCT src AS node FROM und
),
l0 AS (
  SELECT node,
         CASE WHEN node % {_SEED_MOD} = 0 THEN node % 3 END AS lbl
  FROM n
),"""
    + ",".join(_lp_round(k) for k in range(1, _LP_ROUNDS + 1))
    + f"""
SELECT node AS host_num,
       CAST(COALESCE(lbl, -1) AS BIGINT) AS label
FROM l{_LP_ROUNDS}
"""
)


@register("label_propagation_hosts", _LP_SQL)
def label_propagation_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three synchronous label-propagation rounds from the seed hosts:
    majority class over labeled undirected neighbors, deterministic
    tie-break, unlabeled preserved as -1."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_LP_SQL)


# --- OPIC crawl-frontier priority (3 synchronous cash rounds) -----------------
#
# Abiteboul's Adaptive On-line Page Importance Computation — the
# priority score a large crawler keeps per host to order its frontier
# (the crawl-scheduling twin of host_pagerank's quality weighting).
# Every node starts with equal cash; each round it sends cash/outdeg
# along every out-edge and banks the sent amount into its history;
# priority = history + cash.  All state is integer micro-units: the
# per-edge share is FLOOR(cash/deg) (exact — the quotient can never sit
# within an ulp of a wrong integer at these magnitudes), so the three
# rounds are bit-reproducible and dangling nodes simply retire their
# cash, exactly like pagerank_int's dropped dangling mass.
#
# Scale shape: per round one rank⋈edges equi-join + one dst-keyed
# partial+final SUM — identical to the PageRank round, the shape that
# holds at 10^9 hosts; rounds are unrolled CTEs (fixed depth), so the
# whole statistic is a single Catalyst plan with no driver iteration.

_OPIC_ROUNDS = 3
_OPIC_CASH0 = 1_000_000


def _opic_round(k: int) -> str:
    return f"""
inb{k} AS (
  SELECT e.dst AS node,
         SUM(CAST(FLOOR(CAST(s.cash AS DOUBLE) / deg.deg) AS BIGINT)) AS got
  FROM e
  JOIN s{k - 1} s ON s.node = e.src AND s.cash > 0
  JOIN deg ON deg.src = e.src
  GROUP BY 1
),
s{k} AS (
  SELECT n.node,
         CAST(COALESCE(i.got, 0) AS BIGINT) AS cash,
         s.hist + s.cash AS hist
  FROM n
  JOIN s{k - 1} s ON s.node = n.node
  LEFT JOIN inb{k} i ON i.node = n.node
)"""


_OPIC_SQL = (
    f"""
WITH e AS (SELECT * FROM {_EDGES}),
n AS (
  SELECT DISTINCT node FROM
    (SELECT src AS node FROM e UNION ALL SELECT dst FROM e) u
),
deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1),
s0 AS (
  SELECT node, CAST({_OPIC_CASH0} AS BIGINT) AS cash,
         CAST(0 AS BIGINT) AS hist
  FROM n
),"""
    + ",".join(_opic_round(k) for k in range(1, _OPIC_ROUNDS + 1))
    + f"""
SELECT node AS host_num, cash AS cash_micro, hist AS hist_micro,
       cash + hist AS priority_micro
FROM s{_OPIC_ROUNDS}
"""
)


@register("opic_crawl_priority", _OPIC_SQL)
def opic_crawl_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPIC frontier priority per host after three synchronous
    cash-distribution rounds (integer micro-units, bit-exact)."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_OPIC_SQL)


# --- degree assortativity (Newman's r over the host graph) --------------------
#
# Do well-linked hosts link to well-linked hosts?  Pearson correlation
# of endpoint degrees over every directed realization of the simple
# undirected edge set (the symmetric form, so r is orientation-free).
# Degrees are small integers: all five moments are exact int64 and the
# statistic is one fixed double expression — no sampling, no floats in
# any reduction.

from chopin_spark.pages import epoch_sql  # noqa: E402
from chopin_spark.queries.webtext import _TRI_DST, _TRI_SRC  # noqa: E402

_ASSORT_SQL = f"""
WITH und AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM (
    SELECT {_TRI_SRC} AS src, {_TRI_DST} AS dst
    FROM documents WHERE {_TRI_SRC} <> {_TRI_DST}
  ) raw
),
deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und) n
  GROUP BY 1
),
ep AS (
  SELECT du.d AS j, dv.d AS k
  FROM und JOIN deg du ON du.node = und.u JOIN deg dv ON dv.node = und.v
  UNION ALL
  SELECT dv.d AS j, du.d AS k
  FROM und JOIN deg du ON du.node = und.u JOIN deg dv ON dv.node = und.v
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m2,
         CAST(SUM(j * k) AS BIGINT) AS sjk,
         CAST(SUM(j + k) AS BIGINT) AS sj2,
         CAST(SUM(j * j + k * k) AS BIGINT) AS sq2
  FROM ep
)
SELECT m2 / 2 AS n_edges,
       ROUND(
         (CAST(sjk AS DOUBLE) / m2
          - (CAST(sj2 AS DOUBLE) / (2.0 * m2))
            * (CAST(sj2 AS DOUBLE) / (2.0 * m2)))
         / (CAST(sq2 AS DOUBLE) / (2.0 * m2)
            - (CAST(sj2 AS DOUBLE) / (2.0 * m2))
              * (CAST(sj2 AS DOUBLE) / (2.0 * m2))),
         6) AS assortativity_r
FROM s
"""


@register("degree_assortativity_hosts", _ASSORT_SQL)
def degree_assortativity_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the simple undirected host graph
    (symmetric edge realization, exact integer moments)."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_ASSORT_SQL)


# --- modularity of the label-propagation partition -----------------------------
#
# Newman–Girvan Q of the 3-round LPA labels over the SAME undirected
# graph LPA diffused on: Q = intra/(2m) − Σ_c (d_c/(2m))².  Unlabeled
# hosts count as singleton communities (COALESCE to a per-node id
# above the label range).  Both terms are exact int64 sums — intra is
# a label-equality filter on the directed edge set, d_c a degree
# rollup — so Q is one fixed double expression.  This evaluates an
# ALREADY-REGISTERED operator's output quality: the partition query
# and its quality metric share the unrolled LPA CTEs verbatim.

_MOD_SQL = (
    f"""
WITH lab AS ({_LP_SQL}),
lab2 AS (
  SELECT host_num AS node,
         CASE WHEN label < 0 THEN 1000 + host_num ELSE label END AS c
  FROM lab
),
e AS (SELECT * FROM {_EDGES}),
und AS (
  SELECT src, dst FROM e UNION SELECT dst, src FROM e
),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM und),
intra AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS ei
  FROM und
  JOIN lab2 a ON a.node = und.src
  JOIN lab2 b ON b.node = und.dst
  WHERE a.c = b.c
),
dc AS (
  SELECT l.c, CAST(COUNT(*) AS BIGINT) AS d
  FROM und JOIN lab2 l ON l.node = und.src
  GROUP BY 1
),
dsq AS (SELECT CAST(SUM(d * d) AS BIGINT) AS sd2 FROM dc)
SELECT m.m2 / 2 AS n_edges,
       (SELECT COUNT(*) FROM (SELECT DISTINCT c FROM lab2) u) AS n_comms,
       intra.ei / 2 AS intra_edges,
       ROUND(CAST(intra.ei AS DOUBLE) / m.m2
             - CAST(dsq.sd2 AS DOUBLE) / (CAST(m.m2 AS DOUBLE) * m.m2),
             6) AS modularity_q
FROM m CROSS JOIN intra CROSS JOIN dsq
"""
)


@register("modularity_lpa_hosts", _MOD_SQL)
def modularity_lpa_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman–Girvan modularity of the label-propagation partition —
    the quality audit of the LPA community output."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_MOD_SQL)


# --- attack robustness (giant component after hub removal) ---------------------
#
# The crawl-infrastructure resilience audit: how much of the host
# graph stays connected if the top-5 degree hubs vanish (domain
# seizure, CDN outage, blocklist)?  Deterministic hub pick
# (degree DESC, node), then connected components of the surviving
# graph via the star-CC machinery; isolated survivors count as
# singleton components.  Oracle recomputes the post-attack components
# by recursive transitive closure — a different algorithm at the same
# fixpoint, the dedup_components discipline.

_ATK_K = 5

_ATK_UND = f"""
und AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM (
    SELECT {_TRI_SRC} AS src, {_TRI_DST} AS dst
    FROM documents WHERE {_TRI_SRC} <> {_TRI_DST}
  ) raw
)"""

# everything below und is node-sized (host graph, not document-sized) —
# on the Spark side und materializes ONCE and these derive from the view
_ATK_REST = f"""
nodes AS (
  SELECT DISTINCT node FROM
    (SELECT u AS node FROM und UNION ALL SELECT v FROM und) nn
),
deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und) nn
  GROUP BY 1
),
hubs AS (
  SELECT node FROM deg ORDER BY d DESC, node LIMIT {_ATK_K}
),
surv AS (
  SELECT node FROM nodes WHERE node NOT IN (SELECT node FROM hubs)
),
se AS (
  SELECT u, v FROM und
  WHERE u NOT IN (SELECT node FROM hubs)
    AND v NOT IN (SELECT node FROM hubs)
)"""

_ATK_BASE = f"{_ATK_UND},{_ATK_REST}"

_ATK_FINAL = f"""
SELECT (SELECT COUNT(*) FROM nodes) AS n_nodes,
       CAST({_ATK_K} AS BIGINT) AS n_removed,
       (SELECT COUNT(*) FROM se) AS n_edges_after,
       (SELECT COUNT(*) FROM surv) - (SELECT COUNT(DISTINCT node) FROM comp)
         + (SELECT COUNT(DISTINCT comp_id) FROM comp) AS n_components,
       (SELECT MAX(sz) FROM
          (SELECT COUNT(*) AS sz FROM comp GROUP BY comp_id) g)
         AS giant_size,
       ROUND((SELECT MAX(sz) FROM
                (SELECT COUNT(*) AS sz FROM comp GROUP BY comp_id) g)
             / CAST((SELECT COUNT(*) FROM surv) AS DOUBLE), 6)
         AS giant_frac
"""

_ATK_ORACLE = f"""
WITH RECURSIVE {_ATK_BASE.strip()},
edges AS (
  SELECT u AS src, v AS dst FROM se UNION SELECT v, u FROM se
),
reach AS (
  SELECT src AS a, dst AS b FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
),
comp AS (
  SELECT a AS node, LEAST(a, MIN(b)) AS comp_id
  FROM reach GROUP BY a
)
{_ATK_FINAL}
"""


@register("attack_robustness_hosts", _ATK_ORACLE)
def attack_robustness_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Giant-component robustness of the host graph after removing the
    top-5 degree hubs: survivor components via star-CC (O(log n)
    rounds), singleton survivors counted as their own components."""
    from chopin_spark.components import connected_components

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    # the document-sized distinct runs ONCE; every downstream CTE is
    # host-graph-sized and derives from the checkpointed view
    spark.sql(
        f"WITH {_ATK_UND.strip()} SELECT u, v FROM und"
    ).localCheckpoint().createOrReplaceTempView("atk_und")
    rest = f"WITH und AS (SELECT * FROM atk_und), {_ATK_REST.strip()}"
    base = spark.sql(
        f"{rest} SELECT u AS d1, v AS d2 FROM se"
    ).localCheckpoint()
    base.createOrReplaceTempView("se_ckpt")
    comp = connected_components(base).select(
        F.col("node"), F.col("comp_id")
    )
    comp.createOrReplaceTempView("comp")
    spark.sql(f"{rest} SELECT * FROM nodes").createOrReplaceTempView("nodes")
    spark.sql(f"{rest} SELECT * FROM surv").createOrReplaceTempView("surv")
    spark.sql(
        "SELECT d1 AS u, d2 AS v FROM se_ckpt"
    ).createOrReplaceTempView("se")
    return spark.sql(_ATK_FINAL)


# --- Adamic-Adar link prediction on the host graph ----------------------------
#
# The classic common-neighbor link predictor: for a NON-adjacent pair
# (u, v), AA(u, v) = Σ_{w ∈ N(u)∩N(v)} 1/ln(deg w) — shared rare
# neighbors are strong evidence, shared hubs nearly none.  Enumeration
# is by wedge CENTER (u–w–v), which is Σ deg(w)² — the hub-quadratic
# trap at crawl scale — so centers above _AA_DMAX are EXCLUDED, the
# same hot-bucket guard as ngram max_df / LSH banding: legitimate
# because a hub's 1/ln(deg) contribution is the one being down-
# weighted to ~0 by the statistic itself.  Existing edges drop out by
# anti-join; LN enters once per wedge and the summed ≤1-ulp divergence
# sits ~1e-12 under the 1e-4 ROUND grain (the Hill-estimator rule).
#
# Scale: deg/adj are node-sized; the wedge join is bounded by
# cap²·n_centers; the anti-join and top-k are candidate-sized.

_AA_DMAX = 32
_AA_TOPK = 20

_AA_BODY = f"""
deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und) n
  GROUP BY node
),
adj AS (
  SELECT u AS w, v AS nb FROM und UNION ALL SELECT v AS w, u AS nb FROM und
),
wedges AS (
  SELECT a.nb AS u, b.nb AS v, dw.d AS wd
  FROM adj a
  JOIN adj b ON b.w = a.w AND a.nb < b.nb
  JOIN deg dw ON dw.node = a.w
  WHERE dw.d <= {_AA_DMAX}
),
scored AS (
  SELECT wg.u, wg.v,
         CAST(COUNT(*) AS BIGINT) AS n_common,
         ROUND(SUM(1.0 / LN(CAST(wg.wd AS DOUBLE))), 4) AS aa_score
  FROM wedges wg
  LEFT JOIN und e ON e.u = wg.u AND e.v = wg.v
  WHERE e.u IS NULL
  GROUP BY 1, 2
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY aa_score DESC, u, v) AS BIGINT)
         AS rank,
       u AS host_u, v AS host_v, n_common, aa_score
FROM scored
ORDER BY rank
LIMIT {_AA_TOPK}
"""

_AA_UND = f"""
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM (
    SELECT {_TRI_SRC} AS src, {_TRI_DST} AS dst
    FROM documents WHERE {_TRI_SRC} <> {_TRI_DST}
  ) raw
"""

_AA_ORACLE = f"WITH und AS ({_AA_UND}), {_AA_BODY}"


@register("adamic_adar_link_pred", _AA_ORACLE)
def adamic_adar_link_pred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 predicted (non-)links by Adamic-Adar over the undirected
    host graph: wedge-center enumeration with the _AA_DMAX hub guard,
    existing edges anti-joined away.  The distinct edge list
    materializes ONCE (Spark inlines CTEs; und is referenced four
    times)."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    spark.sql(_AA_UND).localCheckpoint().createOrReplaceTempView("aa_und")
    return spark.sql(f"WITH und AS (SELECT * FROM aa_und), {_AA_BODY}")


# --- time-respecting reachability (temporal graph) -----------------------------
#
# Holme & Saramäki temporal-network semantics: host u reaches w only
# through edges whose timestamps are NONDECREASING along the path —
# the redirect/link graph as it actually evolves, not its static
# collapse.  Earliest-arrival propagates greedily (an earlier arrival
# never forecloses an option, so min-combine per node is exact), and
# the hop cap makes Spark's Bellman rounds and DuckDB's walk
# enumeration terminate on identical sets.
#
# Scale shape: per round one frontier ⋈ timestamped-edge equi-join +
# min agg (node-sized state); edges keep their multi-timestamps (a
# MIN-per-pair collapse would be WRONG here — a later copy of an edge
# can be the only usable one), so the join is fact-sized but
# key-bounded.  Rounds ∝ hop cap, lineage cut per round.

_TR_HOPS = 5
_TR_EDGES = f"""(
  SELECT (doc_id * 69069) % 97 AS src,
         ((doc_id * 48271) + 17) % 97 AS dst,
         {epoch_sql('doc_id')} AS t
  FROM documents
  WHERE (doc_id * 69069) % 97 <> ((doc_id * 48271) + 17) % 97
)"""

_TR_ORACLE = f"""
WITH RECURSIVE e AS (SELECT * FROM {_TR_EDGES}),
walk(node, t, hops) AS (
  SELECT DISTINCT src, CAST(0 AS BIGINT), 0 FROM e
  WHERE src % {_SEED_MOD} = 0
  UNION
  SELECT e.dst, CAST(e.t AS BIGINT), w.hops + 1
  FROM walk w JOIN e ON e.src = w.node AND e.t >= w.t
  WHERE w.hops < {_TR_HOPS}
)
SELECT node AS host_num, CAST(MIN(t) AS BIGINT) AS earliest_arrival
FROM walk GROUP BY 1
"""


@register("temporal_reachability_hosts", _TR_ORACLE)
def temporal_reachability_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Earliest time-respecting arrival within 5 hops of the seed
    hosts: per-round frontier join constrained to nondecreasing edge
    timestamps, min-combined per node."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    e = spark.sql(f"SELECT * FROM {_TR_EDGES}").localCheckpoint()
    dist = (
        e.selectExpr("src AS node").filter(F.col("node") % _SEED_MOD == 0)
        .distinct()
        .withColumn("t", F.lit(0).cast("long"))
        .localCheckpoint()
    )
    for _ in range(_TR_HOPS):
        cand = (
            dist.join(e, (dist["node"] == e["src"]) & (e["t"] >= dist["t"]))
            .select(e["dst"].alias("node"), e["t"].cast("long").alias("t"))
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("t").alias("t"))
            .localCheckpoint()
        )
    return dist.selectExpr(
        "CAST(node AS BIGINT) AS host_num",
        "CAST(t AS BIGINT) AS earliest_arrival",
    )


# --- double-sweep diameter lower bound (Magnien, Latapy & Habib 2009) ---------
#
# The standard cheap diameter estimator: BFS from a deterministic seed
# (min node), restart from the farthest node found (tie: min node) —
# the second eccentricity is a lower bound that is exact on trees and
# near-exact on web-ish graphs.  Runs on the SYMMETRIZED 97-host link
# graph.  Both sweeps are the bounded-round BFS used by
# crawl_depth_bfs (components.bfs_depths: per round one node-keyed
# equi-join + min-combine — no full-graph materialization); the
# between-sweep argmax is ONE metadata-sized row to the driver.
# _DS_CAP bounds both engines identically (fixture eccentricities are
# ~5; the cap exists so a pathological graph can't run unbounded).

_DS_CAP = 16

_DS_UEDGES = f"""(
  SELECT src, dst FROM {_EDGES}
  UNION
  SELECT dst AS src, src AS dst FROM {_EDGES}
)"""

_DS_ORACLE = f"""
WITH RECURSIVE e AS (SELECT * FROM {_DS_UEDGES}),
n AS (SELECT DISTINCT src AS node FROM e),
seed1 AS (SELECT MIN(node) AS s FROM n),
w1(node, depth) AS (
  SELECT s, 0 FROM seed1
  UNION
  SELECT e.dst, w1.depth + 1
  FROM w1 JOIN e ON e.src = w1.node
  WHERE w1.depth < {_DS_CAP}
),
d1 AS (SELECT node, MIN(depth) AS depth FROM w1 GROUP BY 1),
far1 AS (
  SELECT node, depth FROM d1
  ORDER BY depth DESC, node ASC LIMIT 1
),
w2(node, depth) AS (
  SELECT node, 0 FROM far1
  UNION
  SELECT e.dst, w2.depth + 1
  FROM w2 JOIN e ON e.src = w2.node
  WHERE w2.depth < {_DS_CAP}
),
d2 AS (SELECT node, MIN(depth) AS depth FROM w2 GROUP BY 1),
far2 AS (
  SELECT node, depth FROM d2
  ORDER BY depth DESC, node ASC LIMIT 1
)
SELECT (SELECT s FROM seed1) AS seed,
       CAST((SELECT depth FROM far1) AS BIGINT) AS ecc_seed,
       CAST((SELECT node FROM far1) AS BIGINT) AS far_node,
       CAST((SELECT depth FROM far2) AS BIGINT) AS diameter_lb,
       CAST((SELECT node FROM far2) AS BIGINT) AS antipode,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM d1) AS n_reached
"""


@register("graph_diameter_double_sweep", _DS_ORACLE)
def graph_diameter_double_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Double-sweep BFS diameter lower bound on the symmetrized host
    graph — two bounded BFS fixpoints, one scalar driver round-trip."""
    from chopin_spark.components import bfs_depths

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    edges = spark.sql(f"SELECT * FROM {_DS_UEDGES}")
    nodes = edges.select(F.col("src").alias("node")).distinct()
    seed = nodes.agg(F.min("node").alias("node"))
    d1 = bfs_depths(edges, seed, max_depth=_DS_CAP)
    far1 = d1.orderBy(F.col("depth").desc(), F.col("node").asc()).limit(1)
    r1 = far1.collect()[0]  # metadata-sized: one (node, depth) row
    n_reached = d1.count()
    from chopin_spark.tables import values_df

    d2 = bfs_depths(
        edges, values_df(spark, [(int(r1["node"]),)], "node long"),
        max_depth=_DS_CAP,
    )
    far2 = d2.orderBy(F.col("depth").desc(), F.col("node").asc()).limit(1)
    r2 = far2.collect()[0]
    seed_val = seed.collect()[0]["node"]
    return values_df(
        edges.sparkSession,
        [(
            int(seed_val), int(r1["depth"]), int(r1["node"]),
            int(r2["depth"]), int(r2["node"]), int(n_reached),
        )],
        "seed long, ecc_seed long, far_node long, diameter_lb long,"
        " antipode long, n_reached long",
    )


# --- closeness + harmonic centrality (all-pairs BFS) ---------------------------
#
# The distance-based centrality pair beside PageRank/HITS/k-core:
# closeness (Bavelas/Freeman, reached-only normalization) and harmonic
# centrality (Boldi & Vigna 2014 — Common Crawl publishes exactly this
# per host).  Distances from components.bfs_depths_labeled (all-pairs
# labeled BFS on the symmetrized host graph; at web scale the source
# side becomes a sampled pivot set, same plan).  Harmonic mass is
# quantized per term (FLOOR(1e6/d + 0.5) — 1/d of an int, one
# correctly-rounded division) so the centrality SUM is exact int64 —
# no float summation anywhere; closeness is one final ratio.

_CC_CAP = 16

_CLOSE_ORACLE = f"""
WITH RECURSIVE e AS (SELECT * FROM {_DS_UEDGES}),
n AS (SELECT DISTINCT src AS node FROM e),
w(s, node, depth) AS (
  SELECT node, node, 0 FROM n
  UNION
  SELECT w.s, e.dst, w.depth + 1
  FROM w JOIN e ON e.src = w.node
  WHERE w.depth < {_CC_CAP}
),
d AS (
  SELECT s, node, CAST(MIN(depth) AS BIGINT) AS dist
  FROM w GROUP BY 1, 2
)
SELECT s AS host_id,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
       CAST(SUM(dist) AS BIGINT) AS dist_sum,
       ROUND(CAST(COUNT(*) - 1 AS DOUBLE) / SUM(dist), 6) AS closeness,
       CAST(SUM(CASE WHEN dist > 0
                     THEN CAST(FLOOR(1000000.0 / dist + 0.5) AS BIGINT)
                     ELSE 0 END) AS BIGINT) AS harmonic_u
FROM d GROUP BY 1
"""


@register("closeness_harmonic_centrality", _CLOSE_ORACLE)
def closeness_harmonic_centrality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closeness + harmonic centrality per host from all-pairs labeled
    BFS — per-term-quantized harmonic mass (exact int64 sums), one
    final closeness ratio."""
    from chopin_spark.components import bfs_depths_labeled

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    edges = spark.sql(f"SELECT * FROM {_DS_UEDGES}")
    nodes = edges.select(F.col("src").alias("node")).distinct()
    d = bfs_depths_labeled(edges, nodes, max_depth=_CC_CAP)
    return d.groupBy(F.col("s").alias("host_id")).agg(
        (F.count(F.lit(1)) - 1).cast("long").alias("n_reached"),
        F.sum("depth").cast("long").alias("dist_sum"),
        F.round(
            (F.count(F.lit(1)) - 1).cast("double") / F.sum("depth"), 6
        ).alias("closeness"),
        F.sum(
            F.when(
                F.col("depth") > 0,
                F.floor(F.lit(1000000.0) / F.col("depth") + 0.5).cast("long"),
            ).otherwise(F.lit(0))
        ).cast("long").alias("harmonic_u"),
    )


# --- betweenness centrality (Brandes 2001, depth-bounded, exact int64) ---------
#
# The last classic centrality: for every source, forward sweep counts
# shortest paths per depth level (sigma), backward sweep accumulates
# dependencies delta(v) = sum over DAG successors w of
# sigma(v)/sigma(w) * (1 + delta(w)).  Dependencies are rationals, so
# each TERM is quantized once to micro-units
# (FLOOR(sigma_v*(1e6 + dq_w)/sigma_w + 0.5) — one correctly-rounded
# division of exact ints, identical in both engines), after which
# every accumulation is an exact int64 SUM — reduction-order-free.
# The horizon is capped at _BC_CAP hops (both engines; fixture
# eccentricities are ~6, so the cap is not binding — at web scale the
# same cap IS the standard k-bounded-betweenness practice).
#
# Scale shape: state is |pivots| x |V| (pivot sampling at web scale);
# rounds = 2 x diameter, each one (s, node)-keyed equi-join + agg with
# a lineage cut — the Pregel Brandes plan.  The oracle unrolls the
# same rounds as a CTE chain.

_BC_CAP = 12


def _bc_chain() -> list:
    """The shared forward+backward CTE chain (w/d/sig levels, del
    rounds) used by BOTH the node-betweenness oracle and the
    edge-betweenness oracle below — identical text, one builder."""
    parts = [
        f"WITH RECURSIVE e AS MATERIALIZED (SELECT * FROM {_DS_UEDGES})",
        "n AS (SELECT DISTINCT src AS node FROM e)",
        f"""w(s, node, depth) AS (
  SELECT node, node, 0 FROM n
  UNION
  SELECT w.s, e.dst, w.depth + 1
  FROM w JOIN e ON e.src = w.node
  WHERE w.depth < {_BC_CAP}
)""",
        # MATERIALIZED: d and sig are referenced by every unrolled round —
        # DuckDB inlines plain CTEs per reference (file-handle and
        # plan blowup; the raster_morph_open lesson)
        "d AS MATERIALIZED (SELECT s, node, CAST(MIN(depth) AS BIGINT) AS dist"
        " FROM w GROUP BY 1, 2)",
        "sig0 AS (SELECT node AS s, node, CAST(1 AS BIGINT) AS sig FROM n)",
    ]
    for k in range(1, _BC_CAP + 1):
        parts.append(f"""sig{k} AS (
  SELECT p.s, dd.node, CAST(SUM(p.sig) AS BIGINT) AS sig
  FROM sig{k - 1} p
  JOIN e ON e.src = p.node
  JOIN d dd ON dd.s = p.s AND dd.node = e.dst AND dd.dist = {k}
  GROUP BY 1, 2
)""")
    parts.append(
        "sig AS MATERIALIZED ("
        + " UNION ALL ".join(f"SELECT * FROM sig{k}"
                             for k in range(_BC_CAP + 1))
        + ")"
    )
    parts.append(
        f"del{_BC_CAP} AS (SELECT s, node, CAST(0 AS BIGINT) AS dq"
        f" FROM d WHERE dist = {_BC_CAP})"
    )
    for k in range(_BC_CAP - 1, 0, -1):
        parts.append(f"""del{k} AS (
  SELECT dv.s, dv.node,
         CAST(COALESCE(SUM(
           CAST(FLOOR(sv.sig * (1000000.0 + dw.dq) / sw.sig + 0.5)
                AS BIGINT)), 0) AS BIGINT) AS dq
  FROM d dv
  JOIN sig sv ON sv.s = dv.s AND sv.node = dv.node
  LEFT JOIN e ON e.src = dv.node
  LEFT JOIN d dn ON dn.s = dv.s AND dn.node = e.dst
                AND dn.dist = {k + 1}
  LEFT JOIN sig sw ON sw.s = dn.s AND sw.node = dn.node
  LEFT JOIN del{k + 1} dw ON dw.s = dn.s AND dw.node = dn.node
  WHERE dv.dist = {k}
  GROUP BY 1, 2
)""")
    return parts


def _bc_oracle() -> str:
    parts = _bc_chain()
    parts.append(
        "alldel AS ("
        + " UNION ALL ".join(f"SELECT * FROM del{k}"
                             for k in range(1, _BC_CAP + 1))
        + ")"
    )
    tail = """
SELECT node AS host_id,
       CAST(SUM(dq) AS BIGINT) AS betweenness_u,
       ROUND(CAST(SUM(dq) AS DOUBLE) / 2000000.0, 4) AS betweenness
FROM alldel
GROUP BY 1
HAVING SUM(dq) > 0
"""
    return ",\n".join(parts) + tail


def _ebc_oracle() -> str:
    """Edge betweenness from the SAME chain: the per-edge quantized
    term sig_v·(1e6 + dq_w)/sig_w is exactly the summand of del{k},
    attributed to the DAG edge (v, w) instead of folded into v; k runs
    down to 0 because source-incident edges carry shortest paths even
    though the source node itself gets no credit."""
    parts = _bc_chain()
    for k in range(_BC_CAP - 1, -1, -1):
        parts.append(f"""eterm{k} AS (
  SELECT dv.s, dv.node AS v, dn.node AS w,
         CAST(FLOOR(sv.sig * (1000000.0 + dw.dq) / sw.sig + 0.5)
              AS BIGINT) AS q
  FROM d dv
  JOIN sig sv ON sv.s = dv.s AND sv.node = dv.node
  JOIN e ON e.src = dv.node
  JOIN d dn ON dn.s = dv.s AND dn.node = e.dst AND dn.dist = {k + 1}
  JOIN sig sw ON sw.s = dn.s AND sw.node = dn.node
  JOIN del{k + 1} dw ON dw.s = dn.s AND dw.node = dn.node
  WHERE dv.dist = {k}
)""")
    parts.append(
        "alleterm AS ("
        + " UNION ALL ".join(f"SELECT * FROM eterm{k}"
                             for k in range(_BC_CAP))
        + ")"
    )
    tail = """
SELECT LEAST(v, w) AS host_a, GREATEST(v, w) AS host_b,
       CAST(SUM(q) AS BIGINT) AS betweenness_u,
       ROUND(CAST(SUM(q) AS DOUBLE) / 2000000.0, 4) AS betweenness
FROM alleterm
GROUP BY 1, 2
HAVING SUM(q) > 0
"""
    return ",\n".join(parts) + tail


def _bc_forward(spark: SparkSession, sf_dir: str):
    """Fixture wrapper: Brandes forward sweep over the symmetrized
    97-host link graph."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    edges = spark.sql(f"SELECT * FROM {_DS_UEDGES}").localCheckpoint()
    return _bc_forward_edges(edges)


def _bc_forward_edges(edges: DataFrame):
    """Shared Brandes forward sweep over an already-symmetrized
    (src, dst) edge frame: levels[k] = (s, node, sig) for nodes at BFS
    depth k from source s (level sets ARE the depth sets, so no
    separate labeled-BFS distance table and no depth-filter joins),
    plus the edge frame aliased (esrc, edst).  Used by both node
    betweenness and edge betweenness below, and unit-testable on
    known graphs."""
    nodes = edges.select(F.col("src").alias("node")).distinct()
    ev = edges.select(F.col("src").alias("esrc"), F.col("dst").alias("edst"))

    # sigma(w, k) = SUM over depth-(k-1) predecessors v of sigma(v);
    # "depth k" enforced by the anti-join against all visited keys
    # (lazy union of checkpointed level keys — cf. bfs_depths).
    #
    # PROBE-FREE to the cap (the bfs_depths argument): _BC_CAP is the
    # semantic horizon, and on the bench host graph (a near-cycle,
    # diameter 48 > cap 12) the frontier never empties, so the former
    # per-level isEmpty probe and eager checkpoint job were pure
    # driver overhead.  Levels past the graph's true depth are EMPTY
    # frames; the backward pass is unaffected by them — an empty level
    # contributes no successors, which is exactly the Brandes base
    # case (deepest occupied level has delta 0) — pinned by the
    # known-graph tests in tests/test_graphq.py.
    levels = [
        nodes.select(
            F.col("node").alias("s"), "node",
            F.lit(1).cast("long").alias("sig"),
        ).localCheckpoint(eager=False)
    ]
    visited = levels[0].select("s", "node")
    parts = 0
    for _k in range(1, _BC_CAP + 1):
        nxt = (
            levels[-1].join(ev, levels[-1].node == ev.esrc)
            .groupBy(F.col("s"), F.col("edst").alias("node"))
            .agg(F.sum("sig").cast("long").alias("sig"))
            .join(visited, ["s", "node"], "left_anti")
            .localCheckpoint(eager=False)
        )
        levels.append(nxt)
        visited = visited.unionByName(nxt.select("s", "node"))
        parts += 1
        # Intentionally a wider stride than components._CONSOLIDATE
        # (=2): the BFS visited set here is keys-only (s, node), so the
        # per-round rewrite is cheap and a 6-round consolidation cadence
        # bounds part counts with less write amplification.
        if parts == 6:
            visited, parts = visited.localCheckpoint(eager=False), 0
    return levels, ev


@register("betweenness_brandes", _bc_oracle())
def betweenness_brandes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Depth-bounded exact Brandes betweenness on the symmetrized host
    graph: ONE forward sweep yields per-level sigma frames; backward
    rounds carry (sig, dq) in one state frame, so each round is
    edge-join + state-join + agg — all int64 carriers; the undirected
    double-count divides out in the final scaling."""
    levels, ev = _bc_forward(spark, sf_dir)

    # backward: state = (s, node, sig, dq) for the level below; each
    # round: depth-k sigma frame ⟕ edges ⟕ state, quantized-term agg.
    maxd = len(levels) - 1
    delta = levels[maxd].withColumn("dq", F.lit(0).cast("long"))
    acc = delta.select("s", "node", "dq")
    for k in range(maxd - 1, 0, -1):
        dw = delta.select(
            F.col("s").alias("qs"), F.col("node").alias("qnode"),
            F.col("sig").alias("wsig"), F.col("dq").alias("qdq"),
        )
        delta = (
            levels[k]
            .join(ev, F.col("esrc") == F.col("node"), "left")
            .join(dw, (F.col("qs") == F.col("s"))
                  & (F.col("qnode") == F.col("edst")), "left")
            .groupBy("s", "node", "sig")
            .agg(
                F.coalesce(
                    F.sum(
                        F.floor(
                            F.col("sig")
                            * (F.lit(1000000.0) + F.col("qdq"))
                            / F.col("wsig")
                            + 0.5
                        ).cast("long")
                    ),
                    F.lit(0),
                ).cast("long").alias("dq")
            )
            .localCheckpoint()
        )
        acc = acc.unionByName(delta.select("s", "node", "dq"))

    return (
        acc.groupBy(F.col("node").alias("host_id"))
        .agg(F.sum("dq").cast("long").alias("betweenness_u"))
        .filter(F.col("betweenness_u") > 0)
        .select(
            "host_id", "betweenness_u",
            F.round(F.col("betweenness_u").cast("double") / 2000000.0, 4)
            .alias("betweenness"),
        )
    )


@register("edge_betweenness_girvan", _ebc_oracle())
def edge_betweenness_girvan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edge betweenness (the Girvan–Newman bridge score) from the SAME
    Brandes sweeps: the quantized per-term summand
    FLOOR(sig_v·(1e6+dq_w)/sig_w + 0.5) is attributed to the DAG edge
    (v, w) instead of folded into v.  Each backward round computes the
    inner-join edge terms ONCE, then derives the next node state by
    grouping those terms and left-joining back onto the level frame
    (zero-successor nodes get dq=0) — so edge credit and node state
    share one join, and rounds run down to k=0 because source-incident
    edges carry shortest paths even though the source node gets no
    credit.  Undirected double-count divides out in the /2e6 scaling
    after LEAST/GREATEST canonicalization."""
    levels, ev = _bc_forward(spark, sf_dir)
    return _edge_betweenness_frame(levels, ev)


def _edge_betweenness_frame(levels: list, ev: DataFrame) -> DataFrame:
    """Backward pass of edge betweenness over forward-sweep levels —
    separate from the query so known-graph tests (barbell bridge
    values) can drive it on an arbitrary symmetrized edge frame."""
    maxd = len(levels) - 1
    if maxd == 0:
        # Edgeless graph: the forward sweep produced only the source
        # level, no shortest path crosses any edge, and the backward
        # loop below would never populate eacc — return an empty frame
        # with the output schema instead of dereferencing None.
        return ev.sparkSession.createDataFrame(
            [],
            "host_a long, host_b long, betweenness_u long,"
            " betweenness double",
        )
    delta = levels[maxd].withColumn("dq", F.lit(0).cast("long"))
    eacc = None
    for k in range(maxd - 1, -1, -1):
        dw = delta.select(
            F.col("s").alias("qs"), F.col("node").alias("qnode"),
            F.col("sig").alias("wsig"), F.col("dq").alias("qdq"),
        )
        eterm = (
            levels[k]
            .join(ev, F.col("esrc") == F.col("node"))
            .join(dw, (F.col("qs") == F.col("s"))
                  & (F.col("qnode") == F.col("edst")))
            .select(
                "s", F.col("node").alias("v"), F.col("edst").alias("w"),
                F.floor(
                    F.col("sig") * (F.lit(1000000.0) + F.col("qdq"))
                    / F.col("wsig") + 0.5
                ).cast("long").alias("q"),
            )
            .localCheckpoint(eager=False)
        )
        eacc = eterm if eacc is None else eacc.unionByName(eterm)
        if k > 0:
            nodedq = eterm.groupBy(
                F.col("s").alias("dsrc"), F.col("v").alias("dnode")
            ).agg(F.sum("q").cast("long").alias("dq"))
            delta = (
                levels[k]
                .join(nodedq, (F.col("dsrc") == F.col("s"))
                      & (F.col("dnode") == F.col("node")), "left")
                .select(
                    "s", "node", "sig",
                    F.coalesce(F.col("dq"), F.lit(0)).cast("long")
                    .alias("dq"),
                )
            )
    return (
        eacc.groupBy(
            F.least("v", "w").alias("host_a"),
            F.greatest("v", "w").alias("host_b"),
        )
        .agg(F.sum("q").cast("long").alias("betweenness_u"))
        .filter(F.col("betweenness_u") > 0)
        .select(
            "host_a", "host_b", "betweenness_u",
            F.round(F.col("betweenness_u").cast("double") / 2000000.0, 4)
            .alias("betweenness"),
        )
    )


# --- strongly connected components / condensation ------------------------------
#
# The DIRECTED twin of link_graph_components: crawl link graphs are
# directed, and the web's macro structure (Broder's bowtie: giant SCC,
# IN, OUT, tendrils) is an SCC decomposition, not a weak-CC one.
# Engine: components.strongly_connected_components — MultiStep-style
# trim (zero-in/zero-out peeling) + Orzan coloring (forward max-id
# fixpoint, backward same-color collect), every round an equi-join +
# agg with lineage cuts.  Oracle: an INDEPENDENT algorithm — the full
# transitive closure by recursive CTE, SCCs as mutual-reachability
# classes (closure is |V|²-bounded, fine at fixture scale; the engine
# side never materializes reachability).  Scale shape: trim is
# anti-join rounds; coloring rounds track forward diameter; the giant
# SCC dominates real crawls and would be peeled by one forward+backward
# BFS (bfs_depths) before coloring — documented in docs/SCALE.md.

# union of TWO affine maps: a single (a·d+b, c·d+e) mod-97 draw is
# functional in src (a permutation — SCCs would just be its cycles);
# the union gives out-degree ≤2 per node, i.e. a genuine digraph with
# a giant SCC plus periphery (the Broder-bowtie shape)
_SCC_EDGES = """(
  SELECT DISTINCT (doc_id * 31337) % 97 AS src,
         ((doc_id * 57331) + 29) % 97 AS dst
  FROM documents
  WHERE doc_id % 151 = 0
    AND (doc_id * 31337) % 97 <> ((doc_id * 57331) + 29) % 97
  UNION
  SELECT DISTINCT ((doc_id * 12289) + 5) % 97 AS src,
         ((doc_id * 75571) + 11) % 97 AS dst
  FROM documents
  WHERE doc_id % 211 = 0
    AND ((doc_id * 12289) + 5) % 97 <> ((doc_id * 75571) + 11) % 97
)"""

_SCC_ORACLE = f"""
WITH RECURSIVE e AS (SELECT * FROM {_SCC_EDGES}),
n AS (
  SELECT DISTINCT src AS node FROM e
  UNION
  SELECT DISTINCT dst FROM e
),
reach AS (
  SELECT src AS a, dst AS b FROM e
  UNION
  SELECT r.a, e.dst AS b FROM reach r JOIN e ON e.src = r.b
),
mutual AS (
  SELECT r1.a AS v, r1.b AS u
  FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
),
scc AS (
  SELECT n.node AS v,
         LEAST(n.node, COALESCE(MIN(m.u), n.node)) AS scc_id
  FROM n LEFT JOIN mutual m ON m.v = n.node
  GROUP BY n.node
),
cond AS (
  SELECT DISTINCT s1.scc_id AS a, s2.scc_id AS b
  FROM e
  JOIN scc s1 ON s1.v = e.src
  JOIN scc s2 ON s2.v = e.dst
  WHERE s1.scc_id <> s2.scc_id
)
SELECT s.scc_id,
       CAST(COUNT(*) AS BIGINT) AS scc_size,
       CAST(COALESCE(MAX(c.deg), 0) AS BIGINT) AS cond_out_degree
FROM scc s
LEFT JOIN (SELECT a, CAST(COUNT(*) AS BIGINT) AS deg
           FROM cond GROUP BY a) c ON c.a = s.scc_id
GROUP BY s.scc_id
ORDER BY s.scc_id
"""


@register("host_scc_condensation", _SCC_ORACLE)
def host_scc_condensation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCC decomposition of a sparse directed host graph plus its
    condensation out-degrees (Broder bowtie structure): scc_id = min
    member, scc_size, and the number of distinct downstream SCCs."""
    from chopin_spark.components import strongly_connected_components

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    edges = spark.sql(f"SELECT * FROM {_SCC_EDGES}").localCheckpoint()
    scc = strongly_connected_components(edges).localCheckpoint()
    s1 = scc.select(F.col("node").alias("src"), F.col("scc_id").alias("a"))
    s2 = scc.select(F.col("node").alias("dst"), F.col("scc_id").alias("b"))
    cond = (
        edges.join(s1, "src").join(s2, "dst")
        .filter(F.col("a") != F.col("b"))
        .select("a", "b")
        .distinct()
        .groupBy("a")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    return (
        scc.groupBy("scc_id")
        .agg(F.count("*").cast("long").alias("scc_size"))
        .join(cond, scc.scc_id == cond.a, "left")
        .select(
            "scc_id", "scc_size",
            F.coalesce(F.col("deg"), F.lit(0)).cast("long")
            .alias("cond_out_degree"),
        )
        .orderBy("scc_id")
    )
