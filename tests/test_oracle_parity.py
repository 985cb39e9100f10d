"""Mimics the driver's correctness gate: every query with an oracle runs
in Spark AND in DuckDB at sf0.01; row counts, column names, and values
(sorted by all columns) must match exactly.

This is the local pre-flight for CORRECTNESS_r{N}.json — a failure here
is a failure there.
"""

from __future__ import annotations

import math

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_CORRECT

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_CORRECT}/{t}.parquet'"
        )
    yield con
    con.close()


def _canon(value):
    if value is None:
        return None
    if isinstance(value, float):
        if math.isnan(value):
            return "NaN"
        return round(value, 4)
    return value


def _rows_to_sorted(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((v is None, str(v)) for v in t))
    return out


QUERY_NAMES = sorted(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]

    sdf = fn(spark, SF_CORRECT)
    spark_cols = [c.lower() for c in sdf.columns]
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = ddb.execute(sql)
    duck_cols = [d[0].lower() for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    )
    s = _rows_to_sorted(spark_rows, spark_cols)
    d = _rows_to_sorted(duck_rows, duck_cols)
    mismatches = [(a, b) for a, b in zip(s, d) if a != b]
    assert not mismatches, f"{name}: first value mismatches {mismatches[:5]}"
