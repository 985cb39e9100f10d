#!/usr/bin/env python
"""Dump `.explain("formatted")` for a list of registered queries to
files — the optimization-round plan evidence (plans/r06/*_{before,after}.txt).

Usage:
  python tools/dump_plans.py <repo_root> <out_dir> <suffix> q1 q2 ...

`repo_root` lets a git worktree of the round-start commit produce the
"before" plans with the identical harness.  For iterative queries the
returned frame's plan bottoms out in the loop's LogicalRDD leaves —
the per-round shape is documented in OPTIMIZATION_r06.md instead.
"""

from __future__ import annotations

import os
import sys


def main() -> None:
    repo, out_dir, suffix, names = (
        sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4:]
    )
    sys.path.insert(0, repo)
    os.makedirs(out_dir, exist_ok=True)
    from chopin_spark.session import get_session

    spark = get_session(master="local[8]", app_name="dump-plans")
    import __spark_entry__ as entry

    queries = entry.queries()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for name in names:
        df = queries[name](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print("wrote", path, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
