"""Bounded-round Douglas–Peucker: numpy recursive-DP replay and
partitioning invariance (oracle parity is the gate's job)."""

from __future__ import annotations

import numpy as np

from chopin_spark.queries.simplifyq import (
    _M, _NL, _ROUNDS, _TAU2, _vertices,
)
from chopin_spark.simplify import dp_simplify_kept, dp_simplify_summary


def _fixture_np():
    l = np.arange(_NL)[:, None]
    i = np.arange(_M)[None, :]
    x = i * 500 + ((l * 7 + i * 13) % 41) - 20
    y = (
        l * 10000 + np.abs((i * 125 + l * 237) % 4000 - 2000)
        - 1000 + ((l * 13 + i * 29) % 41) - 20
    )
    return x.astype(np.int64), y.astype(np.int64)


def _dp_recursive(x, y, s, e, tau2, kept, depth, max_depth):
    """The SEQUENTIAL recursive DP with the same integer test, same
    smallest-index tie break, and the same round budget (depth cap →
    keep all interior) — the independent replay of the distributed
    interval refinement."""
    if e - s < 2:
        kept.update((s, e))
        return
    if depth >= max_depth:
        kept.update(range(s, e + 1))
        return
    dx, dy = x[e] - x[s], y[e] - y[s]
    best_k, best_c2 = None, -1
    for k in range(s + 1, e):
        cr = dx * (y[k] - y[s]) - dy * (x[k] - x[s])
        c2 = cr * cr
        if c2 > best_c2:
            best_k, best_c2 = k, c2
    l2 = dx * dx + dy * dy
    kept.update((s, e))
    if best_c2 > tau2 * l2:
        _dp_recursive(x, y, s, best_k, tau2, kept, depth + 1, max_depth)
        _dp_recursive(x, y, best_k, e, tau2, kept, depth + 1, max_depth)


def test_dp_matches_sequential_replay(spark):
    x, y = _fixture_np()
    got = {}
    kept, _ = dp_simplify_kept(_vertices(spark), _TAU2, _ROUNDS)
    for r in kept.collect():
        got.setdefault(r.line_id, set()).add(r.idx)
    for li in range(_NL):
        want: set = set()
        _dp_recursive(
            x[li], y[li], 0, _M - 1, _TAU2, want, 0, _ROUNDS
        )
        assert got[li] == want, li


def test_dp_partitioning_invariance(spark):
    v = _vertices(spark)
    a = {
        (r.line_id, r.n_kept, r.idx_chk, r.len2_sum)
        for r in dp_simplify_summary(
            v.repartition(1), _TAU2, _ROUNDS
        ).collect()
    }
    b = {
        (r.line_id, r.n_kept, r.idx_chk, r.len2_sum)
        for r in dp_simplify_summary(
            v.repartition(17, "idx"), _TAU2, _ROUNDS
        ).collect()
    }
    assert a == b and len(a) == _NL


def test_dp_actually_simplifies(spark):
    rows = dp_simplify_summary(_vertices(spark), _TAU2, _ROUNDS).collect()
    assert all(2 <= r.n_kept < _M // 2 for r in rows)
