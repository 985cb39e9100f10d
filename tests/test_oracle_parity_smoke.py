"""Oracle parity at sf0.001 — the same gate as test_oracle_parity but
at the smallest scale, catching size-dependent edges (tiny groups,
k > candidates, empty LSH buckets)."""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_SMOKE
from tests.test_oracle_parity import TABLES, _rows_to_sorted


@pytest.fixture(scope="module")
def ddb_smoke():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMOKE}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql()))
def test_query_matches_oracle_smoke(spark, ddb_smoke, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    sdf = fn(spark, SF_SMOKE)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]
    res = ddb_smoke.execute(sql)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()
    assert sorted(spark_cols) == sorted(duck_cols), name
    assert len(spark_rows) == len(duck_rows), name
    s = _rows_to_sorted(spark_rows, spark_cols)
    d = _rows_to_sorted(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: {mismatches[:3]}"
