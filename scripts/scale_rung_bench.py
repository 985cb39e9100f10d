#!/usr/bin/env python
"""One-rung-up scale evidence (VERDICT r03 next-round #8): run the ten
most expensive sf0.1 queries at sf0.1 AND the locally generated sf1.0
(scripts/make_scale_rung.py, 10× data), and record per-query seconds,
the ratio, and the fixpoint ROUND COUNTS of the iterative operators
(components.LAST_ROUNDS) at both scales.

The SCALE.md claim under test: per-round cost scales ~linearly with
data while round counts stay flat (they track component diameter /
log n, not input size) — so a 10× input should cost ~10× per-round
work at the SAME number of rounds, not 10× rounds.

The query set is the r3b top-10 by wall seconds, minus the two whose
inputs are fixed-size raster fixtures independent of sf_dir
(cost_distance_raster, extract_at buffers keep tile tables constant —
they measure the fixture, not data scaling), plus the next two
data-scaling entries.  Output: BENCH/scale_rung_sf1.json.

Usage: python scripts/scale_rung_bench.py  (run on a quiet host;
min-of-REPS warm like bench.py)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RUNG_QUERIES = (
    "dbscan_docs",
    "nearest_poi_sphere_ring",
    "simhash_fingerprints",
    "dedup_cluster_canonical",
    "dedup_components_star",
    "dedup_components",
    "semdedup_drop_list",
    "dedup_ngram_jaccard_capped",
    "embedding_near_dup_pairs",
    "knn3_road",
)

ROUND_QUERIES = {
    "dbscan_docs", "dedup_cluster_canonical", "dedup_components_star",
    "dedup_components",
}


def main() -> None:
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf01 = "/root/testdata/sf0.1"
    sf10 = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", "sf1.0",
    )
    if not os.path.exists(f"{sf10}/documents.parquet"):
        raise SystemExit("run scripts/make_scale_rung.py first")

    from chopin_spark import components
    from chopin_spark.session import get_session

    spark = get_session(master=f"local[{cpus}]", app_name="scale-rung")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    # warm JVM + python workers once
    queries["simhash_fingerprints"](spark, sf01).count()

    out: dict = {"cpus": cpus, "reps": reps, "queries": {}}
    for name in RUNG_QUERIES:
        fn = queries[name]
        rec: dict = {}
        for tag, sf in (("sf0.1", sf01), ("sf1.0", sf10)):
            best, n_rows, rounds = float("inf"), None, None
            for _ in range(reps):
                components.LAST_ROUNDS.clear()
                t0 = time.perf_counter()
                n_rows = fn(spark, sf).count()
                dt = time.perf_counter() - t0
                if dt < best:
                    best = dt
                    rounds = dict(components.LAST_ROUNDS) or None
            rec[tag] = {"sec": round(best, 3), "rows": n_rows}
            if name in ROUND_QUERIES and rounds:
                rec[tag]["cc_rounds"] = rounds
        rec["ratio"] = round(rec["sf1.0"]["sec"] / rec["sf0.1"]["sec"], 2)
        out["queries"][name] = rec
        print(f"{name}: {rec['sf0.1']['sec']}s -> {rec['sf1.0']['sec']}s "
              f"(x{rec['ratio']}) rows {rec['sf0.1']['rows']}->"
              f"{rec['sf1.0']['rows']}")

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "scale_rung_sf1.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
