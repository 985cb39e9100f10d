"""Semantics tests for the crawl-graph traversal operators: sequential
Python replays of BFS and chain-walking, convergence discipline, and
the log-round bound of pointer doubling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chopin_spark.components import bfs_depths, pointer_jump
from chopin_spark.queries.graphq import _MAX_DEPTH, _SEED_MOD
from tests.conftest import SF_CORRECT


def _py_bfs(edges, seeds, max_depth):
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    depth = {s: 0 for s in seeds}
    frontier = set(seeds)
    for d in range(1, max_depth + 1):
        nxt = set()
        for v in frontier:
            for w in adj.get(v, ()):
                if w not in depth:
                    depth[w] = d
                    nxt.add(w)
        frontier = nxt
    return depth


def test_bfs_matches_python_replay(spark):
    from chopin_spark.queries.graphq import crawl_depth_bfs, _EDGES

    spark.read.parquet(f"{SF_CORRECT}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    edges = [tuple(r) for r in spark.sql(f"SELECT * FROM {_EDGES}").collect()]
    nodes = {s for s, _ in edges} | {d for _, d in edges}
    seeds = [n for n in nodes if n % _SEED_MOD == 0]
    expect = _py_bfs(edges, seeds, _MAX_DEPTH)

    got = {
        r["host_num"]: r["depth"]
        for r in crawl_depth_bfs(spark, SF_CORRECT).collect()
    }
    assert got == expect
    assert 0 in set(got.values()) and max(got.values()) >= 1


def test_bfs_unreachable_nodes_absent(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["depth"] for r in bfs_depths(edges, seeds, 5).collect()}
    assert out == {1: 0, 2: 1, 3: 2}  # 10/11 unreachable → absent


def test_bfs_depth_cap(spark):
    # a 6-chain capped at depth 2 keeps only 3 nodes
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(6)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,)], "node long")
    out = {r["node"]: r["depth"] for r in bfs_depths(edges, seeds, 2).collect()}
    assert out == {0: 0, 1: 1, 2: 2}


def _py_chain(succ, v):
    hops = 0
    while succ[v] != v:
        v = succ[v]
        hops += 1
    return v, hops


def test_pointer_jump_matches_sequential_walk(spark):
    from chopin_spark.queries.graphq import _SUCC, redirect_resolve_final

    spark.read.parquet(f"{SF_CORRECT}/documents.parquet").createOrReplaceTempView(
        "documents"
    )
    succ = {r["node"]: r["nxt"] for r in spark.sql(f"SELECT * FROM {_SUCC}").collect()}
    assert len(succ) == 200 and set(succ.values()) <= set(succ)  # closed domain

    got = {
        r["url_node"]: (r["final_target"], r["n_hops"])
        for r in redirect_resolve_final(spark, SF_CORRECT).collect()
    }
    assert len(got) == 200
    for v in succ:
        assert got[v] == _py_chain(succ, v), v
    # targets really are terminals, and real multi-hop chains exist
    assert all(t % 5 == 0 or t == 0 for t, _ in got.values())
    assert max(h for _, h in got.values()) >= 4


def test_pointer_jump_log_rounds(spark):
    # a 300-long chain needs ⌈log2 300⌉ = 9 doubling rounds; 10 must
    # suffice where one-hop propagation would need 300
    n = 300
    rows = [(i, max(i - 1, 0)) for i in range(n)]
    succ = spark.createDataFrame(rows, "node long, nxt long")
    out = pointer_jump(succ, max_rounds=10)
    rs = {r["node"]: (r["target"], r["hops"]) for r in out.collect()}
    assert rs[n - 1] == (0, n - 1) and rs[0] == (0, 0)


def test_pointer_jump_cycle_raises(spark):
    succ = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1)], "node long, nxt long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        pointer_jump(succ, max_rounds=4)


def test_kcore_matches_python_peel(spark):
    """kcore_peel against an independent sequential peeling replay, and
    non-vacuity: the skewed fixture actually loses nodes over >1 round."""
    import collections

    from chopin_spark.queries.graphq import _KCORE_EDGES, _KCORE_K, host_kcore
    from tests.conftest import SF_CORRECT

    spark.read.parquet(f"{SF_CORRECT}/documents.parquet") \
        .createOrReplaceTempView("documents")
    edges = [
        (r.a, r.b) for r in spark.sql(f"SELECT * FROM {_KCORE_EDGES}").collect()
    ]
    nodes = {v for e in edges for v in e}
    n_start = len(nodes)
    rounds = 0
    while True:
        deg = collections.Counter()
        for a, b in edges:
            if a in nodes and b in nodes:
                deg[a] += 1
                deg[b] += 1
        keep = {v for v in nodes if deg[v] >= _KCORE_K}
        if keep == nodes:
            break
        nodes = keep
        rounds += 1
    got = {r.host_num: r.core_degree for r in host_kcore(spark, SF_CORRECT).collect()}
    assert got == {v: deg[v] for v in nodes}
    assert rounds >= 2 and 0 < len(nodes) < n_start


def test_edge_betweenness_barbell_known_values(spark):
    """Girvan–Newman textbook case: barbell K3–bridge–K3.  Hand-derived
    unordered-pair edge betweenness — bridge {2,3} carries all 3×3
    cross pairs (9.0); bridge-adjacent triangle edges {0,2} carry their
    own pair plus the 3 cross pairs from their far endpoint (4.0); far
    triangle edges {0,1} carry only themselves (1.0).  Also pins the
    incidence identity that the node query derives its state from the
    same terms."""
    from chopin_spark.queries.graphq import (
        _bc_forward_edges,
        _edge_betweenness_frame,
    )

    tri = [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)]
    edges = spark.createDataFrame(
        [(a, b) for a, b in tri] + [(b, a) for a, b in tri],
        "src long, dst long",
    )
    levels, ev = _bc_forward_edges(edges.localCheckpoint())
    got = {
        (r.host_a, r.host_b): r.betweenness
        for r in _edge_betweenness_frame(levels, ev).collect()
    }
    assert got == {
        (2, 3): 9.0,
        (0, 2): 4.0, (1, 2): 4.0, (3, 4): 4.0, (3, 5): 4.0,
        (0, 1): 1.0, (4, 5): 1.0,
    }


def test_edge_betweenness_edgeless_graph_empty_frame(spark):
    """Self-loop-only (and fully empty) edge frames yield a single
    forward level; the backward pass must return an EMPTY frame with
    the output schema, not dereference an unset accumulator."""
    from chopin_spark.queries.graphq import (
        _bc_forward_edges,
        _edge_betweenness_frame,
    )

    for rows in ([], [(1, 1), (2, 2)]):
        edges = spark.createDataFrame(rows, "src long, dst long")
        levels, ev = _bc_forward_edges(edges.localCheckpoint())
        out = _edge_betweenness_frame(levels, ev)
        assert out.columns == [
            "host_a", "host_b", "betweenness_u", "betweenness"
        ]
        assert out.count() == 0
