"""`oracle_gate_digest`: one driver-checkable row PER registered query.

The driver's correctness gate samples ~50 of the ~190 registered
queries per round, so most of the registry never earns a hard external
signal (VERDICT r03 "Next round" #1).  This meta-query closes that
gap: its Spark side RUNS every registered query at the gate scale and
folds each result to `(query_name, n_rows, value_hash)`; its DuckDB
oracle RUNS every query's oracle SQL and folds with the identical
hash.  One green driver sample of this row set therefore certifies
the entire registry value-for-value.

Cross-engine hash discipline
----------------------------
Rows are canonicalized to strings IN-ENGINE (no pandas stringification
on either side), columns sorted by name, cells joined with chr(31),
then `md5(rowstr)` (bit-identical across engines) is crushed to a
bigint with the repo's 31-polynomial charfold
(:func:`chopin_spark.textops.charfold_spark` /
:func:`~chopin_spark.textops.charfold_duckdb`).  The per-query hash is
the order-insensitive `SUM(rowhash) % P30`.

Cell canonicalization is the load-bearing part.  Per column KIND
(derived independently in each engine — the driver's green pandas-hash
history guarantees the kinds pair up: Spark BIGINT never faces a
DuckDB DOUBLE, because their pandas strings "5" vs "5.0" could not
have hashed equal):

- integers  -> plain CAST to string ("123" in both engines).
- doubles / decimals -> **exact IEEE-754 decomposition**, NOT printf:
  Java's ``%.17e`` zero-pads shortest-roundtrip digits while glibc
  rounds the true binary expansion, so formatted text diverges
  (measured: 2862/3003 mismatches on a random sweep).  Instead the
  double is decomposed into ``sign, mantissa, 'p', exponent`` with
  mantissa an exact 53-bit integer: ``e0 = floor(log2(|x|))`` (allowed
  to be off by one — libm-agnostic), ``m0 = |x| * 2^(52-e0)`` via
  exact power-of-two multiplies (split at 2^970 so subnormals never
  overflow), then one exact-comparison correction step clamps m0 into
  ``[2^52, 2^53)``.  Every op is IEEE-exact, so both engines produce
  identical text for bitwise-identical doubles with zero libm trust
  (``test_gate_digest.py`` sweeps the full exponent range).
- decimals are cast to DOUBLE first: DuckDB's ``.df()`` hands
  DECIMAL/HUGEINT to pandas as float64, so every driver-green decimal
  column is value-equal to a Spark double.
- timestamps -> explicit 6-digit-microsecond format (session tz is
  pinned UTC); booleans/strings/dates -> plain cast, NULL -> 'NULL'.

Scale shape: the digest is a GATE artifact (sf0.01) — one count+sum
aggregation per registered query, each a metadata-sized (1-row)
collect.  It is excluded from bench.py's headline set (it would re-run
the whole suite inside itself).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from chopin_spark.queries import QUERIES, register
from chopin_spark.textops import P30, charfold_duckdb, charfold_spark

DIGEST_NAME = "oracle_gate_digest"

_TWO52 = "4503599627370496.0"  # 2^52
_TWO53 = "9007199254740992.0"  # 2^53


def _canon_double(x: str, engine: str) -> str:
    """Exact (sign, mantissa, exponent) text for a DOUBLE expr `x`.

    Only IEEE-exact ops: abs, compare, power-of-two multiply, truncate
    of an exact integer.  log2 may be off by +-1 at representable-power
    boundaries on either libm — the correction CASE repairs it with
    exact comparisons, so the output never depends on libm rounding.
    """
    inf = "CAST('Infinity' AS DOUBLE)" if engine == "spark" else "CAST('inf' AS DOUBLE)"
    s = "STRING" if engine == "spark" else "VARCHAR"
    e0 = f"CAST(FLOOR(LOG2(ABS({x}))) AS INT)"
    p = f"(52 - {e0})"
    # split the 2^p scale at 2^970: p can reach 1126 for subnormals and
    # POWER(2, 1126) would overflow; both factors stay finite and every
    # multiply is exact (result always representable).
    m0 = (
        f"(ABS({x}) * POWER(2.0, LEAST({p}, 970))"
        f" * POWER(2.0, {p} - LEAST({p}, 970)))"
    )
    mant = (
        f"CASE WHEN {m0} >= {_TWO53} THEN CAST({m0} / 2 AS BIGINT)"
        f" WHEN {m0} < {_TWO52} THEN CAST({m0} * 2 AS BIGINT)"
        f" ELSE CAST({m0} AS BIGINT) END"
    )
    ex = (
        f"CASE WHEN {m0} >= {_TWO53} THEN {e0} + 1"
        f" WHEN {m0} < {_TWO52} THEN {e0} - 1 ELSE {e0} END"
    )
    return (
        f"CASE WHEN {x} IS NULL THEN 'NULL'"
        f" WHEN ISNAN({x}) THEN 'NaN'"
        f" WHEN {x} = {inf} THEN 'Inf'"
        f" WHEN {x} = -{inf} THEN '-Inf'"
        f" WHEN {x} = 0.0 THEN '0'"
        f" ELSE CONCAT(CASE WHEN {x} < 0 THEN '-' ELSE '' END,"
        f" CAST({mant} AS {s}), 'p', CAST({ex} AS {s})) END"
    )


def _kind_spark(dtype: str) -> str:
    if dtype in ("string",):
        return "str"
    if dtype in ("bigint", "int", "smallint", "tinyint"):
        return "int"
    if dtype == "boolean":
        return "bool"
    if dtype in ("double", "float") or dtype.startswith("decimal"):
        return "dbl"
    if dtype.startswith("timestamp"):
        return "ts"
    if dtype == "date":
        return "date"
    raise ValueError(f"gate digest: unsupported Spark dtype {dtype!r}")


def _kind_duckdb(dtype: str) -> str:
    d = dtype.upper()
    if d.startswith("VARCHAR"):
        return "str"
    if d in ("BIGINT", "INTEGER", "SMALLINT", "TINYINT", "HUGEINT",
             "UBIGINT", "UINTEGER"):
        return "int"
    if d == "BOOLEAN":
        return "bool"
    if d in ("DOUBLE", "FLOAT", "REAL") or d.startswith("DECIMAL"):
        return "dbl"
    if d.startswith("TIMESTAMP"):
        return "ts"
    if d == "DATE":
        return "date"
    raise ValueError(f"gate digest: unsupported DuckDB type {dtype!r}")


def _cell(col: str, kind: str, engine: str) -> str:
    q = f"`{col}`" if engine == "spark" else f'"{col}"'
    s = "STRING" if engine == "spark" else "VARCHAR"
    if kind == "str":
        return f"COALESCE({q}, 'NULL')"
    if kind in ("int", "bool", "date"):
        return f"COALESCE(CAST({q} AS {s}), 'NULL')"
    if kind == "dbl":
        return _canon_double(f"CAST({q} AS DOUBLE)", engine)
    if kind == "ts":
        if engine == "spark":
            return (
                f"COALESCE(DATE_FORMAT({q},"
                f" 'yyyy-MM-dd HH:mm:ss.SSSSSS'), 'NULL')"
            )
        return f"COALESCE(STRFTIME({q}, '%Y-%m-%d %H:%M:%S.%f'), 'NULL')"
    raise ValueError(kind)


def _rowstr(cols: list[tuple[str, str]], engine: str) -> str:
    """Canonical row string: cells in column-NAME order, chr(31) glue."""
    cells = [
        _cell(c, k, engine) for c, k in sorted(cols, key=lambda t: t[0])
    ]
    glued: list[str] = []
    for i, c in enumerate(cells):
        if i:
            glued.append("CHR(31)")
        glued.append(c)
    return "CONCAT(" + ", ".join(glued) + ")" if len(glued) > 1 else glued[0]


def spark_query_digest(df: DataFrame) -> tuple[int, int]:
    """(n_rows, value_hash) of a Spark result — one aggregation job."""
    rowstr = _rowstr(
        [(c, _kind_spark(t)) for c, t in df.dtypes], "spark"
    )
    fold = charfold_spark("_m")
    row = (
        df.selectExpr(f"md5({rowstr}) AS _m")
        .selectExpr(
            "COUNT(*) AS n",
            f"CAST(COALESCE(SUM({fold}), 0) % {P30} AS BIGINT) AS h",
        )
        .collect()[0]
    )
    return int(row["n"]), int(row["h"])


def duckdb_query_digest_sql(name: str, oracle: str,
                            cols: list[tuple[str, str]]) -> str:
    """The DuckDB twin of :func:`spark_query_digest` for one query."""
    rowstr = _rowstr(cols, "duckdb")
    fold = charfold_duckdb("_m")
    return (
        f"SELECT '{name}' AS query_name, COUNT(*) AS n_rows,"
        f" CAST(COALESCE(SUM({fold}), 0) % {P30} AS BIGINT) AS value_hash"
        f" FROM (SELECT md5({rowstr}) AS _m FROM ({oracle}\n) _q) _r"
    )


def build_digest_oracle(schema_sf_dir: str = "/root/testdata/sf0.001") -> str:
    """Generate the digest's full DuckDB oracle: UNION ALL over every
    registered query's folded oracle.  DESCRIBE (plan-only — schemas
    are scale-invariant, so the cheapest sf works) supplies each
    oracle's column types for canonicalization."""
    import duckdb

    from chopin_spark.tables import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{schema_sf_dir}/{t}.parquet')"
        )
    parts = []
    for name in sorted(QUERIES):
        if name == DIGEST_NAME:
            continue
        oracle = QUERIES[name][1]
        if oracle is None:
            continue
        desc = con.execute("DESCRIBE " + oracle).fetchall()
        cols = [(r[0], _kind_duckdb(r[1])) for r in desc]
        parts.append(duckdb_query_digest_sql(name, oracle, cols))
    con.close()
    return "\nUNION ALL\n".join(parts)


_ORACLE_CACHE: dict[str, str] = {}


def digest_oracle() -> str:
    if "sql" not in _ORACLE_CACHE:
        _ORACLE_CACHE["sql"] = build_digest_oracle()
    return _ORACLE_CACHE["sql"]


@register(DIGEST_NAME, None)  # oracle attached lazily — see load_all()
def oracle_gate_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run EVERY registered query and fold each to one digest row.

    Mirrors the reference's testthat-everything discipline
    (/root/reference/tests/testthat/ runs the full operator surface in
    one suite) as a single driver-checkable row set.
    """
    rows = []
    for name in sorted(QUERIES):
        if name == DIGEST_NAME:
            continue
        fn, oracle = QUERIES[name]
        if oracle is None:
            continue
        n, h = spark_query_digest(fn(spark, sf_dir))
        rows.append((name, n, h))
    return spark.createDataFrame(
        rows, "query_name string, n_rows bigint, value_hash bigint"
    )
