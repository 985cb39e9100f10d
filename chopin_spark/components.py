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
long-chain graphs `connected_components_star` below implements the
alternating large-star/small-star variant (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) — O(log n) rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# Observability: most recent fixpoint round count per algorithm, read
# by the scale-rung bench (BENCH/scale_rung_sf1.json) to evidence the
# SCALE.md claim that rounds track component diameter / log(n), not
# input size.  Driver-side only; no effect on results.
LAST_ROUNDS: dict[str, int] = {}

# BFS-family visited sets are unions of per-round checkpointed level
# parts, consolidated (re-checkpointed) every this-many rounds: the
# per-round anti-join then scans a bounded part count, while prior
# levels are rewritten ~_CONSOLIDATE-fold less often than the
# checkpoint-every-round shape (O(rounds·|V|) block writes → O(rounds·
# |V|/_CONSOLIDATE)).  Accumulators that are only read AFTER a loop
# (Brandes sigma/delta) stay fully lazy — no consolidation at all.
_CONSOLIDATE = 2


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
    converged = False
    for _round in range(1, max_iter + 1):
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
            converged = True
            LAST_ROUNDS["propagation"] = _round
            break
        prev_sum = new_sum
    if not converged:
        # a silent truncation returns WRONG labels (several comp_ids
        # for one true component) — fail loudly; callers with
        # long-diameter graphs should use connected_components_star
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds"
            " (component diameter exceeds max_iter); raise max_iter or"
            " use connected_components_star"
        )
    return comp


def connected_components_star(
    pairs: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    max_iter: int = 30,
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris
    et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
    the O(log n)-rounds variant for ADVERSARIAL diameters (long chains),
    where plain min-label propagation needs O(diameter) rounds.

    Each round is two star operations; each star is one groupBy(min) +
    one equi-join — the same shuffle primitives as
    :func:`connected_components`, just a different message pattern:

    - large-star: every node connects its strictly-larger neighbors to
      its smallest (self-inclusive) neighbor;
    - small-star: keyed on the larger endpoint, every node connects its
      smaller-or-equal closure to the minimum.

    Edges stay in canonical (hi, lo) form between rounds; convergence =
    the canonical edge multiset is unchanged (count + endpoint sums —
    compared as a scalar row per round).  Returns (node, comp_id),
    comp_id = min node id of the component — identical output contract
    to connected_components (asserted in tests/test_components.py).
    """
    # materialize the pair set ONCE — `e` and `nodes` both derive from
    # it, and without the cut each would re-execute the caller's full
    # lineage (e.g. the MinHash verify pipeline)
    pairs = pairs.select(src, dst).localCheckpoint()
    e = (
        pairs.select(
            F.greatest(F.col(src), F.col(dst)).alias("hi"),
            F.least(F.col(src), F.col(dst)).alias("lo"),
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint()
    )
    # every input node, including any isolated self-pair rows
    nodes = (
        pairs.select(F.col(src).alias("node"))
        .unionByName(pairs.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )

    def _sig(edges: DataFrame):
        # order-insensitive edge-set fingerprint: count + XOR of 64-bit
        # row hashes (bit_xor never overflows; sum would under ANSI).
        # Plain (count, sum(hi), sum(lo)) can collide across rounds
        # (e.g. {(5,1),(4,2)} vs {(4,1),(5,2)}) and stop before the
        # fixpoint; a 64-bit-hash collision is ~2^-64 per comparison.
        r = edges.agg(
            F.count(F.lit(1)),
            F.expr("bit_xor(xxhash64(hi, lo))"),
            F.sum("hi"),
            F.sum("lo"),
        ).first()
        return tuple(r)

    prev = _sig(e)
    converged = False
    for _round in range(1, max_iter + 1):
        # -- large-star over the symmetric adjacency ---------------------
        sym = e.select(
            F.col("hi").alias("u"), F.col("lo").alias("v")
        ).unionByName(
            e.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )
        m = sym.groupBy("u").agg(
            F.least(F.min("v"), F.first("u")).alias("m")
        )
        e = (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
            .localCheckpoint()
        )
        # -- small-star keyed on the larger endpoint ---------------------
        adj = e.select(F.col("hi").alias("u"), F.col("lo").alias("v"))
        m = adj.groupBy("u").agg(F.min("v").alias("m"))
        e = (
            adj.join(m, "u")
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .unionByName(
                m.select(F.col("u").alias("hi"), F.col("m").alias("lo"))
            )
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
            .localCheckpoint()
        )
        cur = _sig(e)
        if cur == prev:
            converged = True
            LAST_ROUNDS["star"] = _round
            break
        prev = cur
    if not converged:
        raise RuntimeError(
            f"connected_components_star did not converge in {max_iter}"
            " rounds — raise max_iter (rounds needed ~ log2(n))"
        )
    # final edges are stars (v → component min); read comp as the min
    # over self ∪ neighbors so singleton components label themselves
    sym = e.select(
        F.col("hi").alias("node"), F.col("lo").alias("nbr")
    ).unionByName(
        e.select(F.col("lo").alias("node"), F.col("hi").alias("nbr"))
    )
    return (
        nodes.join(sym, "node", "left")
        .groupBy("node")
        .agg(
            F.least(
                F.min("nbr"), F.first("node")
            ).alias("comp_id")
        )
        .withColumn("comp_id", F.coalesce("comp_id", F.col("node")))
    )


def pagerank_int(
    edges: DataFrame,
    iters: int = 3,
    damping_ppm: int = 850_000,
    rank_scale: int = 1_000_000,
    src: str = "src",
    dst: str = "dst",
    seeds: DataFrame | None = None,
) -> DataFrame:
    """Integer-exact PageRank (power iteration on micro-rank units).

    Float PageRank sums are reduction-order dependent; this variant
    keeps every step deterministic: ranks live in integer units of
    1/rank_scale, each node sends `rank DIV outdeg` to every out-edge
    (integer division; multigraph edges each carry one share), and the
    damped update is
        r' = rank_scale·(1 − d) + FLOOR(d · Σ inbound + 0.5)
    where the single double product d·Σ is exact below 2^53 and
    identical in every engine — the kmeans.py lattice discipline
    applied to graph iteration.

    Each iteration: one equi-join rank⋈edges + one partial+final sum on
    dst — the standard distributed PageRank shape; localCheckpoint cuts
    lineage per round.  Dangling mass is dropped (the simplified
    textbook iteration) — the oracle replays the identical recurrence,
    so the fixpoint is bit-reproducible, not normalized.
    Returns (node, rank) with rank in micro-units.

    PERSONALIZED variant: pass `seeds` (a 1-column `node` DataFrame,
    metadata-sized, broadcast) and the restart mass lands ONLY on the
    seed set — r0 = rank_scale on seeds / 0 elsewhere, and the damped
    update adds the (1−d) base term to seeds only.  Same join shape
    per round; the restart vector never shuffles.
    """
    edges = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    base = rank_scale - rank_scale * damping_ppm // 1_000_000
    d = damping_ppm / 1_000_000.0
    if seeds is not None:
        seed_marked = F.broadcast(
            seeds.select(F.col("node"), F.lit(1).alias("is_seed"))
        )
        nodes = nodes.join(seed_marked, "node", "left").select(
            "node", F.coalesce("is_seed", F.lit(0)).alias("is_seed")
        ).localCheckpoint(eager=False)
        r = nodes.select(
            "node",
            (F.col("is_seed").cast("long") * rank_scale).alias("rank"),
        )
        base_expr = F.col("is_seed").cast("long") * base
    else:
        nodes = nodes.withColumn("is_seed", F.lit(1))
        r = nodes.select(
            "node", F.lit(rank_scale).cast("long").alias("rank")
        )
        base_expr = F.lit(base)
    for _ in range(iters):
        contrib = (
            edges.join(r.withColumnRenamed("node", "src"), "src")
            .join(outdeg, "src")
            .select(
                F.col("dst").alias("node"),
                F.expr("rank DIV deg").alias("share"),
            )
        )
        inbound = contrib.groupBy("node").agg(
            F.sum("share").alias("inb")
        )
        r = (
            nodes.join(inbound, "node", "left")
            .select(
                "node",
                (
                    base_expr
                    + F.expr(
                        f"CAST(FLOOR({d!r} * COALESCE(inb, 0) + 0.5)"
                        " AS BIGINT)"
                    )
                ).alias("rank"),
            )
            # fixed-round loop, no probe: lazy cut — the caller's one
            # action executes the whole chain (guide §1.2, fewer jobs)
            .localCheckpoint(eager=False)
        )
    return r


def hits_int(
    edges: DataFrame,
    iters: int = 2,
    scale: int = 1_000_000,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Integer-exact HITS (Kleinberg hubs & authorities) — PageRank's
    sibling web-graph centrality, same micro-unit discipline as
    :func:`pagerank_int`.

    Each iteration: authority(i) = Σ hub over in-edges, hub(i) = Σ
    authority over out-edges, each vector renormalized to total
    `scale` by integer floor division (the 1-row total crosses in as a
    broadcast — metadata, not data).  Nodes outside the respective
    join (no in-edges / no out-edges) carry exact zero, matching the
    oracle's inner-join-then-COALESCE arithmetic.  All products stay
    below 2^53: raw ≤ scale·|edges| on round one and ≤ scale after
    normalization.

    Returns (node, auth, hub) in micro-units after `iters` rounds —
    bit-reproducible at any partitioning.
    """
    edges = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).localCheckpoint(eager=False)
    nodes = (
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )

    def _normalize(raw: DataFrame, col: str) -> DataFrame:
        total = raw.agg(F.sum("raw").alias("_tot"))
        return (
            raw.crossJoin(F.broadcast(total))
            .select(
                "node",
                F.expr(f"(raw * {scale}) DIV _tot").alias(col),
            )
        )

    h = nodes.withColumn("hub", F.lit(scale).cast("long"))
    a = None
    for _ in range(iters):
        a_raw = (
            edges.join(h.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("raw"))
        )
        a = _normalize(a_raw, "auth").localCheckpoint(eager=False)
        h_raw = (
            edges.join(a.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("raw"))
        )
        h = _normalize(h_raw, "hub").localCheckpoint(eager=False)
    return (
        nodes.join(a, "node", "left")
        .join(h, "node", "left")
        .select(
            "node",
            F.coalesce("auth", F.lit(0)).cast("long").alias("auth"),
            F.coalesce("hub", F.lit(0)).cast("long").alias("hub"),
        )
    )


def bfs_depths(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int,
) -> DataFrame:
    """Multi-source BFS over a directed edge list: (node, depth) with
    depth = minimum hop count from any seed, for every node within
    `max_depth` hops.  The crawl-scheduling primitive ("how deep past
    the seed list is this page?" — Common Crawl publishes exactly this
    as its harmonic-centrality depth feature); chopin has no graph
    layer, so this extends SURVEY.md §2's runner family the same way
    pagerank_int does.

    Shape per round (min-combine, the sssp_khop shape): frontier =
    rows first reached last round → frontier ⋈ edges → union into the
    state table → one (node)-keyed MIN aggregation.  First-touch ==
    minimum depth because depths only ever arrive in round order, so
    the min-combine fixpoint equals the anti-join BFS row-for-row
    (pinned in tests/test_components.py).  Two exchanges per round
    (join + agg) versus the former join+distinct+anti-join chain — at
    bench scale that halves the per-round Spark-job count (guide §2.4:
    remove shuffles outright), and at 10^9 hosts both structures are
    node-keyed and partial-aggregable; the state rewrite per round is
    bounded by the former shape's every-other-round visited-set
    consolidation.  Rounds = max_depth (a constant, not a data-driven
    fixpoint); lineage is cut per round with a LAZY localCheckpoint
    whose materializing action IS the convergence probe (one scalar
    count per round, no separate checkpoint job).
    """
    edges = edges.select("src", "dst").localCheckpoint(eager=False)
    state = (
        seeds.select("node").distinct().withColumn("depth", F.lit(0))
        .localCheckpoint(eager=False)
    )
    # No per-round convergence probe: max_depth is the SEMANTIC bound
    # (capped BFS), a post-closure round is a no-op under min-combine,
    # and a probe costs a scalar job per round that on long-diameter
    # graphs (the bench's near-cycle host graph, diameter 48) never
    # fires.  The per-round lazy checkpoint is still mandatory — state
    # is referenced twice per round (frontier filter + union), so an
    # uncut plan doubles each round.
    for d in range(1, max_depth + 1):
        frontier = state.filter(F.col("depth") == d - 1).select("node")
        cand = edges.join(
            frontier.withColumnRenamed("node", "src"), "src"
        ).select(F.col("dst").alias("node"), F.lit(d).alias("depth"))
        state = (
            state.unionByName(cand)
            .groupBy("node")
            .agg(F.min("depth").alias("depth"))
            .localCheckpoint(eager=False)
        )
    return state


def bfs_depths_labeled(
    edges: DataFrame,
    sources: DataFrame,
    max_depth: int,
) -> DataFrame:
    """All-sources labeled BFS: (s, node, depth) with depth = minimum
    hop count from EACH source s — the all-pairs-distances primitive
    behind closeness/harmonic centrality.  Identical per-round shape
    to :func:`bfs_depths` with the key widened to (s, node): frontier
    ⋈ edges → distinct → anti-join visited.  State is |sources|·|V|
    worst case — the centrality regime where |sources| is a chosen
    pivot set (here: all 97 hosts; at web scale the standard practice
    is a sampled pivot set, same plan)."""
    edges = edges.select("src", "dst").localCheckpoint(eager=False)
    state = (
        sources.select(F.col("node").alias("s"))
        .distinct()
        .withColumn("node", F.col("s"))
        .withColumn("depth", F.lit(0))
        .localCheckpoint(eager=False)
    )
    # min-combine rounds keyed on (s, node), probe-free to the depth
    # cap — see bfs_depths
    for d in range(1, max_depth + 1):
        frontier = state.filter(F.col("depth") == d - 1).select("s", "node")
        cand = edges.join(
            frontier.withColumnRenamed("node", "src"), "src"
        ).select("s", F.col("dst").alias("node"), F.lit(d).alias("depth"))
        state = (
            state.unionByName(cand)
            .groupBy("s", "node")
            .agg(F.min("depth").alias("depth"))
            .localCheckpoint(eager=False)
        )
    return state


def pointer_jump(
    succ: DataFrame,
    node: str = "node",
    nxt: str = "nxt",
    max_rounds: int = 16,
) -> DataFrame:
    """Resolve every node of a functional graph (each node has exactly
    one successor; terminals are self-loops) to its terminal, with the
    exact hop count — by path doubling: ptr ← ptr(ptr),
    hops ← hops + hops(ptr).  A chain of length L resolves in
    ⌈log2 L⌉ rounds, each one self-equi-join on the pointer key —
    the classic parallel list-ranking plan, and the redirect-chain /
    canonical-URL resolution step of a crawl store (301 chains resolve
    to their final target without O(chain) sequential rounds).

    Requires the successor relation to be CLOSED (every `nxt` value
    appears as a `node`) and terminal-at-self-loop; cycles other than
    self-loops never converge and raise after `max_rounds` (loud
    failure, no silent truncation — same discipline as
    connected_components).  Returns (node, target, hops).
    """
    cur = succ.select(
        F.col(node).alias("node"),
        F.col(nxt).alias("ptr"),
        F.when(F.col(nxt) == F.col(node), F.lit(0))
        .otherwise(F.lit(1))
        .alias("hops"),
    ).localCheckpoint()
    terminals = (
        succ.filter(F.col(node) == F.col(nxt))
        .select(F.col(node).alias("ptr"))
        .localCheckpoint()
    )
    for _ in range(max_rounds):
        if cur.join(terminals, "ptr", "left_anti").isEmpty():
            return cur.select("node", F.col("ptr").alias("target"), "hops")
        other = cur.select(
            F.col("node").alias("ptr"),
            F.col("ptr").alias("_p2"),
            F.col("hops").alias("_h2"),
        )
        cur = (
            cur.join(other, "ptr")
            .select(
                "node",
                F.col("_p2").alias("ptr"),
                (F.col("hops") + F.col("_h2")).alias("hops"),
            )
            .localCheckpoint()
        )
    if cur.join(terminals, "ptr", "left_anti").isEmpty():
        return cur.select("node", F.col("ptr").alias("target"), "hops")
    raise RuntimeError(
        f"pointer_jump did not converge in {max_rounds} rounds —"
        " the successor graph has a non-self-loop cycle or an open"
        " successor (a nxt value that is not a node); raise max_rounds"
        " only if chains are genuinely longer than 2^max_rounds"
    )


def kcore_peel(
    edges: DataFrame, k: int, max_rounds: int = 20
) -> DataFrame:
    """k-core of an undirected simple graph by iterative peeling:
    repeatedly drop nodes of degree < k until fixpoint.  Returns
    (v, d) — surviving nodes with their degree INSIDE the core.

    edges: distinct undirected pairs (a, b) with a < b.

    Scale shape: each round is one two-sided membership semi-join on
    the edge list + one node-keyed degree aggregation — both standard
    shuffles on narrow keys; survivors localCheckpoint per round so
    lineage never stacks.  Peeling converges in at most the degeneracy
    ordering depth; exceeding ``max_rounds`` raises loudly instead of
    returning a half-peeled set (the connected_components discipline).
    """
    nodes = (
        edges.select(F.col("a").alias("v"))
        .unionByName(edges.select(F.col("b").alias("v")))
        .distinct()
        .localCheckpoint()
    )
    n_prev = nodes.count()
    for _ in range(max_rounds):
        e = edges.join(
            nodes.withColumnRenamed("v", "a"), "a"
        ).join(nodes.withColumnRenamed("v", "b"), "b")
        deg = (
            e.select(F.col("a").alias("v"))
            .unionByName(e.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("d"))
            .localCheckpoint()
        )
        core = deg.filter(F.col("d") >= k)
        n_next = core.count()
        if n_next == n_prev:
            return core
        nodes = core.select("v").localCheckpoint()
        n_prev = n_next
        if n_next == 0:
            return core
    raise RuntimeError(
        f"kcore_peel: no fixpoint within {max_rounds} rounds"
    )


def sssp_khop(
    seeds: DataFrame,
    edges: DataFrame,
    k: int,
    node: str = "node",
    src: str = "src",
    dst: str = "dst",
    w: str = "w",
) -> DataFrame:
    """Minimum path cost within k hops of the seed set — Bellman-Ford
    relaxation with a bounded horizon: round r extends every current
    best cost by one edge (frontier ⋈ edges, min-combine), so after k
    rounds each node holds MIN(cost) over all ≤k-hop walks from any
    seed.  The hop bound makes the operator deterministic across
    engines without a convergence probe, and it is the crawl-frontier
    shape (fetch-cost budget from the seed list) rather than full SSSP.

    Scale shape: the dist table is node-sized (one row per reached
    node, min-combined every round), so each round is one
    pointer-keyed shuffle join against the edge list plus a hash-agg —
    never path-enumerating.  Multi-edges should be pre-collapsed to
    MIN(w) per (src, dst) by the caller when the edge relation is
    fact-derived; that single fact-sized aggregation is the only scan
    of the big table.

    `seeds` = (node, cost) rows (cost usually 0). Returns
    (node, min_cost).
    """
    dist = seeds.select(
        F.col(node).alias("node"), F.col("cost").cast("long").alias("d")
    ).localCheckpoint(eager=False)
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(w).cast("long").alias("w"),
    ).localCheckpoint(eager=False)
    for _ in range(k):
        cand = (
            dist.join(e, dist["node"] == e["src"])
            .select(e["dst"].alias("node"), (dist["d"] + e["w"]).alias("d"))
        )
        dist = (
            dist.unionByName(cand)
            .groupBy("node")
            .agg(F.min("d").alias("d"))
            # fixed-round, probe-free: lazy cut (see pagerank_int)
            .localCheckpoint(eager=False)
        )
    return dist.select("node", F.col("d").alias("min_cost"))


def sssp_khop_labeled(
    seeds: DataFrame,
    edges: DataFrame,
    k: int,
) -> DataFrame:
    """:func:`sssp_khop` carrying a seed label — the ALLOCATION variant
    (network Voronoi / service areas): each reached node ends up owned
    by the seed minimizing (cost, label) lexicographically over all
    ≤k-hop walks.  The pair order is a shortest-path semiring (adding
    an edge weight preserves it), so per-round retention of the single
    best (d, lab) per node — one struct-MIN hash-agg, same shuffle
    shape as the unlabeled operator — reaches the same fixpoint as
    min-over-all-walks.  Deterministic ties by label, no floats.

    `seeds` = (node, cost, lab); edges = (src, dst, w).  Returns
    (node, min_cost, lab).
    """
    state = seeds.select(
        "node",
        F.col("cost").cast("long").alias("d"),
        F.col("lab").cast("long").alias("lab"),
    ).localCheckpoint(eager=False)
    e = edges.select(
        "src", "dst", F.col("w").cast("long").alias("w")
    ).localCheckpoint(eager=False)
    for _ in range(k):
        cand = state.join(e, state["node"] == e["src"]).select(
            e["dst"].alias("node"),
            (state["d"] + e["w"]).alias("d"),
            state["lab"].alias("lab"),
        )
        state = (
            state.unionByName(cand)
            .groupBy("node")
            .agg(F.min(F.struct("d", "lab")).alias("s"))
            .select("node", F.col("s.d").alias("d"), F.col("s.lab").alias("lab"))
            # fixed-round, probe-free: lazy cut (see pagerank_int)
            .localCheckpoint(eager=False)
        )
    return state.select("node", F.col("d").alias("min_cost"), "lab")


def _reachable_from(
    e: DataFrame, seed: int, forward: bool, max_rounds: int
) -> DataFrame:
    """Nodes reachable from `seed` along e (u→v), incl. the seed;
    forward=False walks reversed edges.  One equi-join per BFS level."""
    a, b = ("u", "v") if forward else ("v", "u")
    spark = e.sparkSession
    from chopin_spark.tables import values_df

    visited = values_df(spark, [(seed,)], "node long").localCheckpoint()
    frontier = visited
    parts = 0
    for _ in range(max_rounds):
        nxt = (
            e.join(frontier.withColumnRenamed("node", a), a)
            .select(F.col(b).alias("node"))
            .distinct()
            .join(visited, "node", "left_anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            return visited
        visited = visited.unionByName(nxt)
        parts += 1
        if parts == _CONSOLIDATE:
            visited, parts = visited.localCheckpoint(), 0
        frontier = nxt
    raise RuntimeError(
        f"SCC FW-BW reachability did not close in {max_rounds} BFS"
        " levels; raise max_rounds (levels track graph diameter)"
    )


def strongly_connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_outer: int = 25,
    max_rounds: int = 40,
    giant_peel: bool = True,
) -> DataFrame:
    """(node, scc_id) over a DIRECTED graph; scc_id = MIN node id in
    the strongly connected component (mutual-reachability classes).

    Trim + coloring — the two phases of Slota/Rajamanickam/Madduri's
    MultiStep SCC decomposition, each expressed as equi-join rounds:

    1. TRIM: iteratively delete vertices with zero in-degree or zero
       out-degree in the remaining subgraph — each is its own trivial
       SCC.  This kills DAG periphery (and entire DAGs, including the
       coloring algorithm's adversarial decreasing-chain case) in
       cheap anti-join rounds.
    2. COLOR (Orzan): propagate the max vertex id FORWARD along edges
       to a fixpoint — color(v) = max id that reaches v.  Roots
       (color(v)==v) are SCC representatives; a BACKWARD propagation
       from the roots restricted to same-color vertices collects
       exactly SCC(root): color(v)=r means r reaches v, and every
       vertex on a v→…→r path provably also has color r, so the
       restriction loses nothing.  Assign, delete, repeat — each outer
       round removes at least every current root's SCC, so outer
       rounds are bounded by the condensation's color-chain depth.

    With giant_peel=True (default) MultiStep's third phase runs once
    between trim and coloring: a forward and a backward BFS from the
    max-degree pivot, whose intersection is SCC(pivot) — at crawl
    scale that is Broder's giant SCC (~25-30% of hosts), peeled in
    2×diameter equi-join rounds so the coloring fixpoint only ever
    sees the small-SCC residue.

    Every round is one shuffle equi-join + partial/final agg with
    localCheckpoint lineage cuts; convergence checks are scalar
    aggregates (no data collect); at fixture scale trim+peel+color
    converges in a handful of rounds (LAST_ROUNDS records the observed
    counts).  Non-convergence raises — the connected_components
    discipline, never silent truncation.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .filter(F.col(src) != F.col(dst))
        .distinct()
        .localCheckpoint()
    )
    # Node universe from the UNFILTERED endpoints: a node whose only
    # edges are self-loops is a singleton SCC (same contract as
    # connected_components' singleton emission) — it carries no
    # non-loop edge, so the trim phase assigns it trivially.
    remaining = (
        edges.select(F.col(src).alias("node"))
        .unionByName(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    spark = edges.sparkSession
    assigned = spark.createDataFrame([], "node long, scc_rep long")
    outer_rounds = 0
    for _outer in range(1, max_outer + 1):
        if remaining.isEmpty():
            break
        outer_rounds = _outer
        # --- phase 1: trim zero-in / zero-out vertices (own SCCs) ----
        for _trim in range(max_rounds):
            has_in = e.select(F.col("v").alias("node")).distinct()
            has_out = e.select(F.col("u").alias("node")).distinct()
            trivial = remaining.join(
                has_in.join(has_out, "node"), "node", "left_anti"
            ).localCheckpoint()
            if trivial.isEmpty():
                break
            assigned = assigned.unionByName(
                trivial.select("node", F.col("node").alias("scc_rep"))
            ).localCheckpoint()
            remaining = remaining.join(
                trivial, "node", "left_anti"
            ).localCheckpoint()
            e = (
                e.join(trivial.withColumnRenamed("node", "u"), "u", "left_anti")
                .join(trivial.withColumnRenamed("node", "v"), "v", "left_anti")
                .localCheckpoint()
            )
        if remaining.isEmpty():
            break
        # --- phase 1b (first round only): FW-BW giant-SCC peel -------
        if giant_peel and _outer == 1:
            pivot = (
                e.select(F.col("u").alias("node"))
                .unionByName(e.select(F.col("v").alias("node")))
                .groupBy("node")
                .agg(F.count("*").alias("deg"))
                .orderBy(F.desc("deg"), F.asc("node"))
                .first()
            )
            pv = int(pivot["node"])
            giant = (
                _reachable_from(e, pv, True, max_rounds)
                .join(_reachable_from(e, pv, False, max_rounds), "node")
                .localCheckpoint()
            )
            LAST_ROUNDS["scc_giant_size"] = giant.count()
            assigned = assigned.unionByName(
                giant.select("node", F.lit(pv).cast("long").alias("scc_rep"))
            ).localCheckpoint()
            remaining = remaining.join(giant, "node", "left_anti").localCheckpoint()
            e = (
                e.join(giant.withColumnRenamed("node", "u"), "u", "left_anti")
                .join(giant.withColumnRenamed("node", "v"), "v", "left_anti")
                .localCheckpoint()
            )
            # the peel exposes fresh zero-in/zero-out periphery (the
            # bowtie's IN/OUT sets): loop back to trim before coloring
            continue
        # --- phase 2a: forward max-id coloring to fixpoint -----------
        color = remaining.withColumn("color", F.col("node")).localCheckpoint()
        # labels only ever increase, so sum(color) strictly increases
        # until the fixpoint — scalar convergence probe per round
        prev = color.agg(F.sum("color")).first()[0]
        for _r in range(1, max_rounds + 1):
            msgs = e.join(
                color.select(F.col("node").alias("u"), F.col("color")), "u"
            ).select(F.col("v").alias("node"), "color")
            color = (
                color.unionByName(msgs)
                .groupBy("node")
                .agg(F.max("color").alias("color"))
                .localCheckpoint()
            )
            cur = color.agg(F.sum("color")).first()[0]
            if cur == prev:
                LAST_ROUNDS["scc_color"] = _r
                break
            prev = cur
        else:
            raise RuntimeError(
                f"scc coloring did not converge in {max_rounds} rounds;"
                " raise max_rounds (rounds track the remaining"
                " subgraph's forward diameter)"
            )
        # --- phase 2b: backward collect within color -----------------
        reached = color.filter(F.col("color") == F.col("node")).localCheckpoint()
        prev_n = reached.count()
        for _r in range(1, max_rounds + 1):
            # edge (u,v): v already collected for root c and u has
            # color c  ⇒  u belongs to SCC(c)
            msgs = (
                e.join(
                    reached.select(F.col("node").alias("v"), F.col("color")),
                    "v",
                )
                .select(F.col("u").alias("node"), F.col("color"))
                .join(
                    color.select("node", F.col("color").alias("_c")), "node"
                )
                .filter(F.col("color") == F.col("_c"))
                .select("node", "color")
            )
            reached = (
                reached.unionByName(msgs).distinct().localCheckpoint()
            )
            n = reached.count()
            if n == prev_n:
                LAST_ROUNDS["scc_collect"] = _r
                break
            prev_n = n
        else:
            raise RuntimeError(
                f"scc backward collect did not converge in {max_rounds}"
                " rounds; raise max_rounds"
            )
        scc = reached.select("node", F.col("color").alias("scc_rep"))
        assigned = assigned.unionByName(scc).localCheckpoint()
        remaining = remaining.join(scc, "node", "left_anti").localCheckpoint()
        e = (
            e.join(scc.select(F.col("node").alias("u")), "u", "left_anti")
            .join(scc.select(F.col("node").alias("v")), "v", "left_anti")
            .localCheckpoint()
        )
    else:
        # The loop exhausts even when the max_outer-th round finished
        # the decomposition (remaining only empties AFTER the round
        # body) — only raise if vertices are genuinely left over.
        if not remaining.isEmpty():
            raise RuntimeError(
                f"strongly_connected_components did not finish in"
                f" {max_outer} outer rounds (condensation color-chain"
                " depth exceeds max_outer); raise max_outer"
            )
    LAST_ROUNDS["scc_outer"] = outer_rounds
    # canonicalize: scc_id = MIN member id (the coloring rep is the MAX
    # id that reaches the SCC, which is engine-internal; min-member is
    # the oracle-friendly canonical label)
    rep = assigned.groupBy("scc_rep").agg(F.min("node").alias("scc_id"))
    return assigned.join(rep, "scc_rep").select("node", "scc_id")
