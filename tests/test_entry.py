"""Smoke + contract tests for the driver entry module."""

from __future__ import annotations

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {
        "zone_id", "n_pages", "sum_chars", "avg_chars", "pop"
    }


def test_queries_and_oracles_aligned(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert qs, "no queries registered"
    assert set(oracles) <= set(qs)


def test_every_query_returns_rows_smoke(spark):
    for name, fn in entry_mod.queries().items():
        df = fn(spark, SF_SMOKE)
        assert df.count() >= 0, name
