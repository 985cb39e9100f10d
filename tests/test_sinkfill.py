"""Planchon–Darboux sink fill: engine invariants + the oracle's
round-count margin (the _SF_R = 40 unroll must already be a fixpoint,
otherwise the oracle silently compares an unfinished surface)."""

from __future__ import annotations

import duckdb

from chopin_spark.queries.costdistq import (
    H, W, _SF_R, _SINK_ORACLE, sink_fill_surface, _zf,
)


def test_oracle_round_count_is_a_fixpoint():
    at_r = _SINK_ORACLE.replace(f"WHERE r = {_SF_R}", "WHERE r = {r}")
    con = duckdb.connect()
    last = con.execute(at_r.format(r=_SF_R)).fetchall()
    prev = con.execute(at_r.format(r=_SF_R - 1)).fetchall()
    assert sorted(last) == sorted(prev)


def test_engine_invariants_and_fill_mass(spark):
    rows = sink_fill_surface(spark, "").collect()
    assert len(rows) == W * H
    n_filled = 0
    for r in rows:
        assert r.w >= r.z, (r.x, r.y)
        if r.x in (0, W - 1) or r.y in (0, H - 1):
            assert r.w == r.z, ("border must drain", r.x, r.y)
        if r.fill_depth > 0:
            n_filled += 1
    # the LCG permutation DEM has real depressions — the op must do work
    assert n_filled > 0


def test_partitioning_invariance(spark):
    """Block size must not change the filled surface (the partitioned
    == unpartitioned contract every par_* operator carries)."""
    from chopin_spark.sinkfill import INF, sink_fill

    cells = spark.range(0, W * H, 1, 8).selectExpr(
        f"CAST(id % {W} AS BIGINT) AS x",
        f"CAST(id DIV {W} AS BIGINT) AS y",
    ).selectExpr(
        "x", "y",
        f"CAST({_zf('x', 'y')} AS BIGINT) AS z",
        f"CASE WHEN x = 0 OR x = {W - 1} OR y = 0 OR y = {H - 1}"
        f" THEN CAST({_zf('x', 'y')} AS BIGINT)"
        f" ELSE CAST({INF} AS BIGINT) END AS w",
    )
    a = {(r.x, r.y): r.w for r in sink_fill(cells, 8, 8).collect()}
    b = {(r.x, r.y): r.w for r in sink_fill(cells, 16, 12).collect()}
    assert a == b
