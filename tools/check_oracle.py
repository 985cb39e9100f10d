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


def value_hash(rows: list[tuple], cols: list[str]) -> str:
    """Order-insensitive hash: sort columns by name, format cells
    (floats to 6 significant-stable decimals), sort rows, sha256."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        cells = []
        for i in order:
            v = r[i]
            if isinstance(v, float):
                cells.append(f"{v:.4f}")
            elif v is None:
                cells.append("NULL")
            else:
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
        s_rows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"  {name}: rows={len(s_rows)} (no oracle — rows-only) "
                  f"[{time.time()-t0:.1f}s]")
            if len(s_rows) == 0:
                failures.append((name, "zero rows, no oracle"))
            continue
        o = con.execute(oracles[name])
        o_cols = sorted(d[0] for d in o.description)
        o_rows = o.fetchall()
        sh = value_hash(s_rows, list(sdf.columns))
        oh = value_hash(o_rows, [d[0] for d in con.execute(oracles[name]).description])
        ok = (len(s_rows) == len(o_rows)) and (s_cols == o_cols) and (sh == oh)
        status = "OK " if ok else "FAIL"
        print(f"  {name}: {status} rows={len(s_rows)}/{len(o_rows)} "
              f"cols={'=' if s_cols == o_cols else f'{s_cols} vs {o_cols}'} "
              f"hash={'=' if sh == oh else 'MISMATCH'} [{time.time()-t0:.1f}s]")
        if not ok:
            failures.append((name, f"rows {len(s_rows)}/{len(o_rows)} "
                             f"cols_eq={s_cols == o_cols} hash_eq={sh == oh}"))
            if s_cols == o_cols and len(s_rows) == len(o_rows):
                # show first differing row pair for debugging
                ss = sorted(map(str, s_rows))[:3]
                oo = sorted(map(str, o_rows))[:3]
                print(f"    spark : {ss}")
                print(f"    oracle: {oo}")

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
