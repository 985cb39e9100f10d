#!/usr/bin/env python
"""Generate a local sf1.0 rung (10× sf0.1) for scale evidence.

/root/testdata is driver-owned and read-only, so the rung lives under
the repo at .localdata/sf1.0 (gitignored).  Construction is a
deterministic 10× replication of sf0.1 with per-replica key shifts so
every table keeps valid keys and foreign keys — and two deliberate
de-aliasing transforms so the DATA workload scales linearly instead of
quadratically:

- documents.text is Caesar-rotated by the replica index (length- and
  structure-preserving), so replicas are NOT near-duplicates of each
  other: duplicate/near-duplicate group sizes stay what sf0.1 had,
  just 10× as many groups.  Without this, every pair-producing dedup
  stage would grow ×100 for data reasons and the rung would measure
  the fixture, not the engine.
- embeddings gain a small per-replica jitter (deterministic, value-
  dependent) for the same reason: exact-duplicate vectors across
  replicas would inflate every cosine bucket ×10.

doc_id/vec_id shifts also translate every derived spatial coordinate
(sqlexpr.x_expr/y_expr are functions of the id), so the point layers
genuinely densify 10× over the same extent — the Common-Crawl growth
shape.

Usage: python scripts/make_scale_rung.py [out_dir]  (default
.localdata/sf1.0; skips work if out_dir already has all tables)
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
REPS = 10

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# per-table row counts at sf0.1 (key shift strides)
N = {
    "customer": 15_000, "supplier": 1_000, "part": 20_000,
    "orders": 150_000, "lineitem": 600_000, "events": 100_000,
    "documents": 5_000, "embeddings": 2_000,
}

_AL = "abcdefghijklmnopqrstuvwxyz"
_AU = _AL.upper()


def _rot(rep: int) -> tuple[str, str]:
    k = rep % 26
    return (_AL + _AU, _AL[k:] + _AL[:k] + _AU[k:] + _AU[:k])


def table_sql(t: str, rep: int) -> str:
    src = f"read_parquet('{SRC}/{t}.parquet')"
    if t in ("region", "nation"):  # tiny dimensions: single copy
        return f"SELECT * FROM {src}" if rep == 0 else ""
    if t == "documents":
        frm, to = _rot(rep)
        return (
            f"SELECT doc_id + {rep * N[t]} AS doc_id,"
            f" translate(text, '{frm}', '{to}') AS text,"
            f" lang, source, n_chars FROM {src}"
        )
    if t == "embeddings":
        # deterministic per-replica jitter: breaks exact duplication
        # across replicas without moving vectors between LSH buckets
        # wholesale (offset ~1e-3 of unit scale)
        return (
            f"SELECT vec_id + {rep * N[t]} AS vec_id,"
            f" list_transform(embedding, x -> CAST(x +"
            f" {rep}.0 * 0.0003 * (CASE WHEN x >= 0 THEN 1 ELSE -1 END)"
            f" AS FLOAT)) AS embedding,"
            f" label FROM {src}"
        )
    if t == "customer":
        return (
            f"SELECT c_custkey + {rep * N[t]} AS c_custkey, c_name,"
            f" c_nationkey, c_acctbal, c_mktsegment FROM {src}"
        )
    if t == "supplier":
        return (
            f"SELECT s_suppkey + {rep * N[t]} AS s_suppkey, s_name,"
            f" s_nationkey, s_acctbal FROM {src}"
        )
    if t == "part":
        return (
            f"SELECT p_partkey + {rep * N[t]} AS p_partkey, p_name,"
            f" p_brand, p_type, p_size, p_retailprice FROM {src}"
        )
    if t == "orders":
        return (
            f"SELECT o_orderkey + {rep * N[t]} AS o_orderkey,"
            f" o_custkey + {rep * N['customer']} AS o_custkey,"
            f" o_orderstatus, o_totalprice, o_orderdate, o_orderpriority"
            f" FROM {src}"
        )
    if t == "lineitem":
        return (
            f"SELECT l_orderkey + {rep * N['orders']} AS l_orderkey,"
            f" l_partkey + {rep * N['part']} AS l_partkey,"
            f" l_suppkey + {rep * N['supplier']} AS l_suppkey,"
            f" l_linenumber, l_quantity, l_extendedprice, l_discount,"
            f" l_tax, l_returnflag, l_linestatus, l_shipdate FROM {src}"
        )
    if t == "events":
        return (
            f"SELECT event_id + {rep * N[t]} AS event_id, ts,"
            f" user_id + {rep * 100000} AS user_id, event_type,"
            f" value, props FROM {src}"
        )
    raise ValueError(t)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else (
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), ".localdata", "sf1.0")
    )
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for t in TABLES:
        dst = f"{out}/{t}.parquet"
        if os.path.exists(dst):
            print(f"{t}: exists, skipping")
            continue
        parts = [s for s in (table_sql(t, r) for r in range(REPS)) if s]
        union = "\nUNION ALL\n".join(parts)
        con.execute(f"COPY ({union}) TO '{dst}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT COUNT(*) FROM read_parquet('{dst}')"
        ).fetchone()[0]
        print(f"{t}: {n} rows")
    print(f"sf1.0 rung ready at {out}")


if __name__ == "__main__":
    main()
