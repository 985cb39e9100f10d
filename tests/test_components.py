"""Connected-components (dedup clustering) unit tests."""

from __future__ import annotations

import pandas as pd

from chopin_spark.components import connected_components


def _cc(spark, pairs):
    df = spark.createDataFrame(
        pd.DataFrame(pairs, columns=["d1", "d2"]), "d1 BIGINT, d2 BIGINT"
    )
    return {
        r["node"]: r["comp_id"] for r in connected_components(df).collect()
    }


def test_two_components(spark):
    got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_needs_multiple_rounds(spark):
    # diameter-6 path: min label must walk the whole chain
    got = _cc(spark, [(i, i + 1) for i in range(1, 7)])
    assert got == {i: 1 for i in range(1, 8)}


def test_min_label_not_first_label(spark):
    # the smallest id sits at the END of the chain
    got = _cc(spark, [(9, 8), (8, 7), (7, 1)])
    assert got == {9: 1, 8: 1, 7: 1, 1: 1}


# --- alternating large-star/small-star variant -------------------------------

import random

from chopin_spark.components import connected_components_star


def _ccs(spark, pairs, max_iter=30):
    df = spark.createDataFrame(
        pd.DataFrame(pairs, columns=["d1", "d2"]), "d1 BIGINT, d2 BIGINT"
    )
    return {
        r["node"]: r["comp_id"]
        for r in connected_components_star(df, max_iter=max_iter).collect()
    }


def test_star_matches_propagation_on_random_graphs(spark):
    rng = random.Random(7)
    for trial in range(3):
        n = 40
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(30)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        assert _ccs(spark, pairs) == _cc(spark, pairs)


def test_star_long_chain_logarithmic_rounds(spark):
    """A 120-node path (diameter 119): min-label propagation would need
    ~119 rounds; the star variant must finish inside max_iter=12
    (~log2)."""
    pairs = [(i, i + 1) for i in range(120)]
    got = _ccs(spark, pairs, max_iter=12)
    assert got == {i: 0 for i in range(121)}


def test_star_min_at_end_and_singleton(spark):
    got = _ccs(spark, [(9, 8), (8, 7), (7, 1), (42, 42)])
    assert got == {9: 1, 8: 1, 7: 1, 1: 1, 42: 42}


def test_nonconvergence_raises_instead_of_wrong_labels(spark):
    import pytest as _pytest

    from chopin_spark.components import connected_components

    chain = [(i, i + 1) for i in range(10)]
    df = spark.createDataFrame(
        pd.DataFrame(chain, columns=["d1", "d2"]), "d1 BIGINT, d2 BIGINT"
    )
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_iter=3)
    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components_star(df, max_iter=1)


def test_sssp_khop_matches_reference_relaxation(spark):
    """k-hop Bellman-Ford on a handcrafted graph vs a driver-side
    reference: hop bound binds (5->cheap-long-path excluded at k=2),
    min-combine over multi-edges, unreachable nodes absent."""
    from chopin_spark.components import sssp_khop

    edges = spark.createDataFrame(
        [
            (0, 1, 10), (0, 1, 4),          # multi-edge, min wins
            (1, 2, 1), (2, 3, 1), (3, 4, 1),
            (0, 4, 100),                     # 1 hop, expensive
            (7, 8, 1),                       # disconnected from seed
        ],
        "src long, dst long, w long",
    )
    seeds = spark.createDataFrame([(0, 0)], "node long, cost long")

    def ref(k):
        import itertools
        adj = {}
        for r in edges.collect():
            adj.setdefault(r.src, []).append((r.dst, r.w))
        dist = {0: 0}
        for _ in range(k):
            new = dict(dist)
            for n, d in dist.items():
                for m, w in adj.get(n, []):
                    if d + w < new.get(m, 1 << 60):
                        new[m] = d + w
            dist = new
        return dist

    for k in (1, 2, 5):
        got = {r.node: r.min_cost for r in
               sssp_khop(seeds, edges, k=k).collect()}
        assert got == ref(k), k


def test_strongly_connected_components_known_graph(spark):
    """Trim+coloring SCC on a graph with a 3-cycle, a 2-cycle bridged
    by a DAG path, a decreasing chain (the coloring algorithm's
    adversarial case — trim must kill it without outer-round blowup),
    and a detached edge: scc_id = min member, exact classes."""
    from chopin_spark.components import (
        LAST_ROUNDS, strongly_connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (5, 6), (6, 5), (3, 4), (4, 5),
         (10, 9), (9, 8), (8, 7), (7, 5), (11, 12)],
        "src long, dst long",
    )
    got = {
        r["node"]: r["scc_id"]
        for r in strongly_connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5,
                   7: 7, 8: 8, 9: 9, 10: 10, 11: 11, 12: 12}
    # the chain dies in trim; with the FW-BW peel spending its own
    # outer round, two rounds close the graph
    assert LAST_ROUNDS["scc_outer"] <= 2


def test_strongly_connected_components_two_sccs_same_color_chain(spark):
    """Two cycles in series (higher ids upstream): the coloring phase
    paints BOTH with the upstream max id, the backward collect must
    separate them, and the second outer round picks up the remainder."""
    from chopin_spark.components import strongly_connected_components

    edges = spark.createDataFrame(
        [(8, 9), (9, 8), (9, 1), (1, 2), (2, 1)],
        "src long, dst long",
    )
    got = {
        r["node"]: r["scc_id"]
        for r in strongly_connected_components(edges).collect()
    }
    assert got == {8: 8, 9: 8, 1: 1, 2: 1}


def test_scc_giant_peel_matches_coloring(spark):
    """FW-BW pivot peel on and off must produce identical SCCs (the
    peel is an optimization, not a semantics change); the recorded
    giant size matches the true largest SCC."""
    from chopin_spark.components import (
        LAST_ROUNDS, strongly_connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4),
         (6, 7), (2, 8), (8, 2), (9, 1), (5, 10)],
        "src long, dst long",
    )
    on = {r["node"]: r["scc_id"]
          for r in strongly_connected_components(edges).collect()}
    giant = LAST_ROUNDS["scc_giant_size"]
    off = {r["node"]: r["scc_id"]
           for r in strongly_connected_components(
               edges, giant_peel=False).collect()}
    assert on == off
    assert on == {1: 1, 2: 1, 3: 1, 8: 1, 4: 4, 5: 4, 6: 4,
                  7: 7, 9: 9, 10: 10}
    # pivot is node 2 (degree 5); its SCC is {1,2,3,8}
    assert giant == 4


# --- label-carrying bounded SSSP (network Voronoi allocation) -----------------


def _brute_labeled(seeds, edges, k):
    """min over all <=k-hop walks of (cost, seed label), lexicographic."""
    best = {}
    state = {(n, lab): 0 for n, lab in seeds}
    for (n, lab), d in state.items():
        cur = best.get(n)
        if cur is None or (d, lab) < cur:
            best[n] = (d, lab)
    adj = {}
    for u, v, w in edges:
        adj.setdefault(u, []).append((v, w))
        adj.setdefault(v, []).append((u, w))
    frontier = dict(state)
    for _ in range(k):
        nxt = {}
        for (n, lab), d in frontier.items():
            for v, w in adj.get(n, []):
                key = (v, lab)
                if d + w < nxt.get(key, 1 << 62):
                    nxt[key] = d + w
        for (n, lab), d in nxt.items():
            cur = best.get(n)
            if cur is None or (d, lab) < cur:
                best[n] = (d, lab)
        frontier = nxt
    return best


def test_sssp_khop_labeled_matches_brute(spark):
    from chopin_spark.components import sssp_khop_labeled

    # two seeds; node 4 is equidistant (cost 3) from both -> label ties
    # break to the SMALLER seed id; node 6 only reachable from seed 10
    edges = [(1, 2, 1), (2, 4, 2), (10, 3, 1), (3, 4, 2), (10, 6, 5),
             (4, 5, 1)]
    seeds = [(1, 1), (10, 10)]
    sdf = spark.createDataFrame(
        [(n, 0, lab) for n, lab in seeds], "node long, cost long, lab long"
    )
    edf = spark.createDataFrame(edges, "src long, dst long, w long")
    e2 = edf.unionByName(
        edf.selectExpr("dst AS src", "src AS dst", "w")
    )
    got = {
        r["node"]: (r["min_cost"], r["lab"])
        for r in sssp_khop_labeled(sdf, e2, k=4).collect()
    }
    assert got == _brute_labeled(seeds, edges, 4)
    assert got[4] == (3, 1)  # the deterministic tie-break under test


def test_sssp_khop_labeled_hop_bound(spark):
    from chopin_spark.components import sssp_khop_labeled

    # path 1-2-3-4: with k=2 node 4 is unreached
    edges = spark.createDataFrame(
        [(1, 2, 1), (2, 3, 1), (3, 4, 1)], "src long, dst long, w long"
    )
    e2 = edges.unionByName(edges.selectExpr("dst AS src", "src AS dst", "w"))
    seeds = spark.createDataFrame([(1, 0, 1)], "node long, cost long, lab long")
    got = {r["node"] for r in sssp_khop_labeled(seeds, e2, k=2).collect()}
    assert got == {1, 2, 3}


def test_scc_self_loop_only_nodes_are_singletons(spark):
    """A node whose only edges are self-loops is a size-1 SCC and must
    appear in the output (the connected_components singleton contract);
    a self-loop on a cycle member must not perturb its class."""
    from chopin_spark.components import strongly_connected_components

    edges = spark.createDataFrame(
        [(7, 7), (1, 2), (2, 1), (2, 2), (9, 9), (9, 9)],
        "src long, dst long",
    )
    got = {
        r["node"]: r["scc_id"]
        for r in strongly_connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 7: 7, 9: 9}


def test_scc_finishes_on_exact_max_outer_boundary(spark):
    """Two cycles in series need exactly 2 outer rounds; max_outer=2
    must SUCCEED (remaining empties after the final allowed round —
    the for-else must not raise when the loop exhausts having
    finished the decomposition)."""
    from chopin_spark.components import strongly_connected_components

    edges = spark.createDataFrame(
        [(8, 9), (9, 8), (9, 1), (1, 2), (2, 1)],
        "src long, dst long",
    )
    got = {
        r["node"]: r["scc_id"]
        for r in strongly_connected_components(
            edges, max_outer=2, giant_peel=False).collect()
    }
    assert got == {8: 8, 9: 8, 1: 1, 2: 1}
