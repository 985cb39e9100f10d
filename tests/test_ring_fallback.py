"""Ring-expansion fallback for nearest/knn (VERDICT r02 next-steps #2):
exactness when almost every row misses the padded neighborhood, and a
plan proof that the fallback never requires broadcasting the context.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from chopin_spark.grid import make_regular_grid
from chopin_spark.vector import knn_join, nearest_join


def _lcg_points(n, seed, lo=0.0, hi=800_000.0, lo_y=0.0, hi_y=600_000.0):
    s = np.arange(1, n + 1, dtype=np.int64) * 48271 + seed
    x = lo + (hi - lo) * ((s * 16807) % 99991) / 99991.0
    y = lo_y + (hi_y - lo_y) * ((s * 69621) % 99991) / 99991.0
    return x.astype(np.float64), y.astype(np.float64)


@pytest.fixture(scope="module")
def sparse(spark):
    """300 spread keyed points vs 5 context points bunched in one
    corner — with pad = 10 km nearly every key has zero in-radius
    candidates and must resolve through ring expansion."""
    kx, ky = _lcg_points(300, 7)
    cx = np.array([10_000.0, 20_000.0, 15_000.0, 30_000.0, 25_000.0])
    cy = np.array([12_000.0, 18_000.0, 25_000.0, 10_000.0, 30_000.0])
    keyed = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(kx, ky))],
        "kid long, x double, y double",
    )
    ctx = spark.createDataFrame(
        [(int(i), float(x), float(y)) for i, (x, y) in enumerate(zip(cx, cy))],
        "cid long, x double, y double",
    )
    return keyed, ctx, (kx, ky), (cx, cy)


def _brute_knn(kx, ky, cx, cy, k):
    d = np.sqrt(
        (kx[:, None] - cx[None, :]) ** 2 + (ky[:, None] - cy[None, :]) ** 2
    )
    out = {}
    for i in range(len(kx)):
        order = sorted((float(d[i, j]), j) for j in range(len(cx)))[:k]
        out[i] = [(j, dist) for dist, j in order]
    return out


def test_nearest_ring_fallback_exact(spark, sparse):
    keyed, ctx, (kx, ky), (cx, cy) = sparse
    g = make_regular_grid(16, 12, pad=10_000.0)
    want = _brute_knn(kx, ky, cx, cy, 1)
    got = {
        r["kid"]: (r["nn_id"], r["nn_dist"])
        for r in nearest_join(keyed, ctx, g, "kid", "cid", 10_000.0).collect()
    }
    assert len(got) == len(want)
    for kid, [(j, dist)] in want.items():
        assert got[kid][0] == j
        assert got[kid][1] == pytest.approx(dist, rel=1e-12)


def test_knn_ring_fallback_exact(spark, sparse):
    keyed, ctx, (kx, ky), (cx, cy) = sparse
    g = make_regular_grid(16, 12, pad=10_000.0)
    want = _brute_knn(kx, ky, cx, cy, 3)
    rows = knn_join(keyed, ctx, g, "kid", "cid", 10_000.0, k=3).collect()
    got = {}
    for r in rows:
        got.setdefault(r["kid"], []).append((r["rank"], r["nn_id"], r["nn_dist"]))
    assert len(got) == len(want)
    for kid, triples in got.items():
        triples.sort()
        assert [t[1] for t in triples] == [j for j, _ in want[kid]]
        for t, (_, dist) in zip(triples, want[kid]):
            assert t[2] == pytest.approx(dist, rel=1e-12)


def test_knn_fewer_context_than_k(spark, sparse):
    """k=8 > |context|=5: every key returns all 5 context points, exact
    and ranked — the disk-covers-grid terminal round emits what exists
    instead of stalling."""
    keyed, ctx, (kx, ky), (cx, cy) = sparse
    g = make_regular_grid(16, 12, pad=10_000.0)
    rows = knn_join(keyed, ctx, g, "kid", "cid", 10_000.0, k=8).collect()
    per_key = {}
    for r in rows:
        per_key.setdefault(r["kid"], []).append(r)
    assert len(per_key) == 300
    want = _brute_knn(kx, ky, cx, cy, 5)
    for kid, rs in per_key.items():
        assert len(rs) == 5
        rs.sort(key=lambda r: r["rank"])
        assert [r["nn_id"] for r in rs] == [j for j, _ in want[kid]]


def test_fallback_runs_without_broadcast(spark, sparse):
    """With auto-broadcast disabled the whole nearest join still plans
    and executes — no forced BroadcastExchange anywhere (the old
    crossJoin(broadcast(ctx)) fallback could not satisfy this)."""
    keyed, ctx, (kx, ky), (cx, cy) = sparse
    g = make_regular_grid(16, 12, pad=10_000.0)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = nearest_join(keyed, ctx, g, "kid", "cid", 10_000.0)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan
        assert "CartesianProduct" not in plan
        want = _brute_knn(kx, ky, cx, cy, 1)
        got = {r["kid"]: r["nn_id"] for r in df.collect()}
        assert got == {kid: v[0][0] for kid, v in want.items()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_sphere_ring_query_no_broadcast(spark):
    """nearest_poi_sphere_ring: zero-broadcast plan end-to-end (the
    sphere twin of the planar proof) — with auto-broadcast disabled,
    no BroadcastExchange and no cartesian product anywhere, and the
    row count matches the documents table."""
    from chopin_spark.queries import load_all

    fn = load_all()["nearest_poi_sphere_ring"][0]
    sf = "/root/testdata/sf0.001"
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = fn(spark, sf)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastExchange" not in plan
        assert "CartesianProduct" not in plan
        n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
        assert df.count() == n_docs
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
