"""Local mimic of the driver's correctness gate.

Runs every `queries()[name]` on Spark and the matching
`oracle_sql()[name]` on DuckDB against the same parquet tables, then
compares row count, sorted column names, and an order-insensitive
value hash.  Usage:

    python tools/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb


def value_hash(pdf) -> str:
    """Order-insensitive, TYPE-FAITHFUL hash over a pandas DataFrame.

    Mirrors the driver: values are stringified exactly as pandas holds
    them (no ``%.4f`` smoothing), so a DuckDB ``SUM(INTEGER)`` that
    arrives as decimal128→float64 ("149174.0") hashes differently from
    Spark's BIGINT ("149174") — reproducing the driver's round-1
    failures locally (VERDICT.md "What's wrong" #2)."""
    import pandas as pd

    pdf = pdf[sorted(pdf.columns)]
    out = []
    for r in pdf.itertuples(index=False, name=None):
        cells = []
        for v in r:
            if v is None or (isinstance(v, float) and v != v):
                cells.append("NULL")
            else:
                try:
                    if pd.isna(v):
                        cells.append("NULL")
                        continue
                except (TypeError, ValueError):
                    pass
                cells.append(str(v))
        out.append("\x1f".join(cells))
    out.sort()
    return hashlib.sha256("\x1e".join(out).encode()).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry_mod
    from chopin_spark.session import get_session

    spark = get_session(master="local[8]", app_name="oracle-check")

    con = duckdb.connect()
    from chopin_spark.tables import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entry_mod.queries(), entry_mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        s_cols = sorted(sdf.columns)
        s_pdf = sdf.toPandas()
        if name not in oracles:
            print(f"  {name}: rows={len(s_pdf)} (no oracle — rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            if len(s_pdf) == 0:
                failures.append((name, "zero rows, no oracle"))
            continue
        o_pdf = con.execute(oracles[name]).df()
        o_cols = sorted(o_pdf.columns)
        sh = value_hash(s_pdf)
        oh = value_hash(o_pdf)
        ok = (len(s_pdf) == len(o_pdf)) and (s_cols == o_cols) and (sh == oh)
        status = "OK " if ok else "FAIL"
        print(f"  {name}: {status} rows={len(s_pdf)}/{len(o_pdf)} "
              f"cols={'=' if s_cols == o_cols else f'{s_cols} vs {o_cols}'} "
              f"hash={'=' if sh == oh else 'MISMATCH'} [{time.time()-t0:.1f}s]")
        if not ok:
            failures.append((name, f"rows {len(s_pdf)}/{len(o_pdf)} "
                             f"cols_eq={s_cols == o_cols} hash_eq={sh == oh}"))
            if s_cols == o_cols and len(s_pdf) == len(o_pdf):
                print(f"    spark dtypes : {dict(s_pdf.dtypes.astype(str))}")
                print(f"    oracle dtypes: {dict(o_pdf.dtypes.astype(str))}")
                ss = sorted(str(tuple(r)) for r in
                            s_pdf[s_cols].itertuples(index=False, name=None))[:3]
                oo = sorted(str(tuple(r)) for r in
                            o_pdf[o_cols].itertuples(index=False, name=None))[:3]
                print(f"    spark : {ss}")
                print(f"    oracle: {oo}")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
