"""oracle_gate_digest plumbing: the exact cross-engine double
canonicalization, the per-query digest fold, and the
registry↔COVERAGE.md ledger completeness gate (VERDICT r03 #1/#9).

The full digest equality (Spark folding every query vs DuckDB folding
every oracle) runs through test_oracle_parity.py like any other
registered query; these tests pin the pieces that make it exact.
"""

from __future__ import annotations

import math
import re

import duckdb
import pytest

from chopin_spark.queries.gatedigest import (
    _canon_double,
    _kind_duckdb,
    _kind_spark,
    duckdb_query_digest_sql,
    spark_query_digest,
)


def _truth(x: float) -> str:
    """Reference rendering via Python frexp (exact)."""
    if x != x:
        return "NaN"
    if x == math.inf:
        return "Inf"
    if x == -math.inf:
        return "-Inf"
    if x == 0:
        return "0"
    m, e = math.frexp(abs(x))  # x = m * 2^e, m in [0.5, 1)
    mant = int(m * 2**53)  # exact: in [2^52, 2^53)
    return ("-" if x < 0 else "") + f"{mant}p{e - 1}"


# the adversarial set: subnormals, both neighbors of every 2^k
# boundary (where floor(log2) can be off by one on ANY libm), max
# double, classic decimal traps, printf-tie constructions.
_SWEEP = (
    [2.0**k for k in range(-1074, 972, 13)]
    + [-(2.0**k) for k in range(-1074, 972, 29)]
    + [math.nextafter(2.0**k, 0) for k in range(-1020, 960, 17)]
    + [math.nextafter(2.0**k, math.inf) for k in range(-1020, 960, 17)]
    + [5e-324, -5e-324, 1.7976931348623157e308, -1.7976931348623157e308,
       1 / 1024, 10001 / 2**19, 0.1, 1e-7, math.pi, -math.e, 1e100]
)


def test_canon_double_duckdb_exact():
    con = duckdb.connect()
    expr = _canon_double("v", "duckdb")
    for v in _SWEEP:
        got = con.execute(
            f"SELECT {expr} FROM (SELECT ?::DOUBLE AS v)", [v]
        ).fetchone()[0]
        assert got == _truth(v), v
    # specials
    for lit, want in (("'nan'", "NaN"), ("'inf'", "Inf"),
                      ("'-inf'", "-Inf"), ("0.0", "0"), ("-0.0", "0"),
                      ("NULL", "NULL")):
        got = con.execute(
            f"SELECT {expr} FROM (SELECT CAST({lit} AS DOUBLE) AS v)"
        ).fetchone()[0]
        assert got == want, lit


def test_canon_double_spark_exact(spark):
    expr = _canon_double("v", "spark")
    df = spark.createDataFrame([(v,) for v in _SWEEP], "v double")
    for row in df.selectExpr("v", f"{expr} AS c").collect():
        assert row.c == _truth(row.v), row.v
    special = spark.sql(
        f"""SELECT {expr.replace('`', '')} AS c FROM VALUES
        (CAST('NaN' AS DOUBLE)), (CAST('Infinity' AS DOUBLE)),
        (CAST('-Infinity' AS DOUBLE)), (0.0D), (-0.0D),
        (CAST(NULL AS DOUBLE)) AS t(v)"""
    ).collect()
    assert [r.c for r in special] == [
        "NaN", "Inf", "-Inf", "0", "0", "NULL"
    ]


def test_power_of_two_exact_both_engines(spark):
    """POWER(2.0, n) must be bit-exact over the full exponent range the
    decomposition uses — the only libm call the digest leans on."""
    con = duckdb.connect()
    rows = con.execute(
        "SELECT i, POWER(2.0, i) FROM generate_series(-1022, 970) t(i)"
    ).fetchall()
    for i, p in rows:
        assert p == 2.0**i, i
    srows = spark.sql(
        "SELECT id AS i, POWER(2.0, id) AS p FROM RANGE(-1022, 971)"
    ).collect()
    for r in srows:
        assert r.p == 2.0 ** r.i, r.i


def test_query_digest_cross_engine_mini(spark):
    """End-to-end mini digest: one synthetic query with every supported
    kind (string/int/double/decimal-ish/bool/NULL) folds to the same
    (n_rows, value_hash) in both engines."""
    q_spark = spark.sql(
        """SELECT * FROM VALUES
          ('a', 1L, CAST(0.1 AS DOUBLE), true),
          ('b', -2L, CAST(-1024.5 AS DOUBLE), false),
          (NULL, NULL, CAST(NULL AS DOUBLE), NULL),
          ('NULL', 0L, CAST(0.0 AS DOUBLE), true)
        AS t(s, i, d, b)"""
    )
    n_s, h_s = spark_query_digest(q_spark)
    oracle = (
        "SELECT * FROM (VALUES ('a', 1, 0.1::DOUBLE, true),"
        " ('b', -2, -1024.5::DOUBLE, false),"
        " (NULL, NULL, NULL::DOUBLE, NULL),"
        " ('NULL', 0, 0.0::DOUBLE, true)) t(s, i, d, b)"
    )
    con = duckdb.connect()
    cols = [
        (r[0], _kind_duckdb(r[1]))
        for r in con.execute("DESCRIBE " + oracle).fetchall()
    ]
    sql = duckdb_query_digest_sql("mini", oracle, cols)
    _, n_d, h_d = con.execute(sql).fetchone()
    assert (n_s, h_s) == (n_d, h_d)


def test_kind_mapping_rejects_unknown():
    with pytest.raises(ValueError):
        _kind_spark("map<string,int>")
    with pytest.raises(ValueError):
        _kind_duckdb("BLOB")


# --- ledger completeness (VERDICT r03 next-round #9) -------------------------

# underscore-tokens in COVERAGE.md Query columns that are deliberately
# not registered query names (SQL builtins, engine verbs, test files)
_LEDGER_ALLOW = {
    "allow_holes", "collect_list", "extract_at", "generate_series",
    "rel_err", "row_number",
}


def _registry():
    from chopin_spark.queries import load_all

    return set(load_all())


def test_every_registered_query_in_coverage_md():
    text = open("/root/repo/COVERAGE.md").read()
    missing = sorted(n for n in _registry() if n not in text)
    assert not missing, f"COVERAGE.md is missing registry entries: {missing}"


def test_every_ledger_query_is_registered():
    reg = _registry()
    stray = set()
    q_idx = None  # "Query" column position of the current table
    for line in open("/root/repo/COVERAGE.md"):
        if not line.startswith("|"):
            q_idx = None
            continue
        cells = [c.strip() for c in line.split("|")]
        if "Query" in cells:
            q_idx = cells.index("Query")
            continue
        if q_idx is None or len(cells) <= q_idx:
            continue
        for tok in re.findall(r"\b[a-z0-9]+(?:_[a-z0-9]+)+\b", cells[q_idx]):
            if tok in reg or tok in _LEDGER_ALLOW or tok.startswith("test_"):
                continue
            stray.add(tok)
    assert not stray, (
        f"COVERAGE.md Query column names unregistered queries: {sorted(stray)}"
    )
