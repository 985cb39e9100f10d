"""Semantics pins for dissolve (edge cancellation) and robots
longest-prefix rules — parity vs DuckDB is the oracle gate's job."""

from __future__ import annotations

import duckdb

from chopin_spark.queries.dissolveq import dissolve_tracts_by_state
from chopin_spark.queries.webtext import robots_prefix_rules
from chopin_spark.zones import TRACT_H, TRACT_NX, TRACT_NY, TRACT_W
from tests.conftest import SF_SMOKE


def test_dissolve_concave_exceeds_solid_perimeter(spark):
    rows = {r.state: r for r in dissolve_tracts_by_state(spark, SF_SMOKE).collect()}
    assert set(rows) == {0, 1, 2, 3}
    # a solid 8×8 state block would have perimeter 2·8·(W+H); the
    # punched-out subset must exceed it (holes add boundary) while
    # keeping fewer tracts than the block
    solid = 2 * 8 * (TRACT_W + TRACT_H)
    for r in rows.values():
        assert r.n_tracts < 64
        assert r.perimeter > solid
        # every boundary edge is either vertical or horizontal and the
        # boundary of a union of cells is a closed curve set: edge
        # counts are even
        assert r.n_v_edges % 2 == 0 and r.n_h_edges % 2 == 0


def test_robots_override_rules_fire(spark):
    out = {
        (r.decision, r.lang): r.n_docs
        for r in robots_prefix_rules(spark, SF_SMOKE).collect()
    }
    assert any(k[0] == "deny" for k in out)
    assert any(k[0] == "allow" for k in out)
    # docs whose depth-2 prefix re-allows inside a denied depth-1
    # section must exist and be allowed: replay the rule table in
    # DuckDB for the expected totals per decision
    con = duckdb.connect()
    n_allow_override = con.execute(
        f"""
        SELECT COUNT(*) FROM '{SF_SMOKE}/documents.parquet'
        WHERE (doc_id * 7919) % 7 = 0 AND (doc_id * 104729) % 13 = 5
        """
    ).fetchone()[0]
    assert n_allow_override > 0
    total = sum(out.values())
    n_docs = con.execute(
        f"SELECT COUNT(*) FROM '{SF_SMOKE}/documents.parquet'"
    ).fetchone()[0]
    assert total == n_docs
