#!/usr/bin/env python
"""Cluster entrypoint example (north rule: runs via spark-submit
--py-files on multi-executor clusters).

    ./scripts/make_pyfiles.sh
    spark-submit \
        --master spark://head:7077 \
        --py-files dist/chopin_spark.zip \
        examples/submit_job.py iceberg:web.pages /out/zonal

On a cluster with the Iceberg runtime, pass
`--conf spark.sql.catalog.iceberg=...` (see chopin_spark.catalog) and
an `iceberg:` table ref; any other ref is read as parquet. The job is
the flagship pipeline: geocode → cell/zone assignment → per-zone
aggregation, checkpointed so a killed submit resumes from the last
completed cell batch.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else None
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/chopin_spark_out"

    spark = SparkSession.builder.appName("chopin-spark-zonal").getOrCreate()

    from chopin_spark.catalog import load_table
    from chopin_spark.checkpoint import CheckpointedRun, cell_batches
    from chopin_spark.pages import enrich, synth_pages

    # 'synth:N' generates the deterministic pages table in-plan (CI /
    # submit smoke); 'iceberg:ns.tbl' reads the catalog; else parquet.
    if src is None:
        pages = synth_pages(spark, 1_000_000)
    elif src.startswith("synth:"):
        pages = synth_pages(spark, int(src.split(":", 1)[1]))
    else:
        pages = load_table(spark, src)
    enriched = enrich(pages)

    def job(s: SparkSession, cells: list[int]):
        return (
            enriched.filter(F.col("cgridid").isin(cells))
            .groupBy("cgridid", "zone_id")
            .agg(
                F.count(F.lit(1)).alias("n_pages"),
                F.countDistinct("lang").alias("n_langs"),
            )
        )

    run = CheckpointedRun(spark, out)
    executed = run.run(cell_batches(job, list(range(16 * 12)), n_batches=8))
    print(f"executed batches: {executed}")
    print(f"result rows: {run.result().count()}")
    spark.stop()


if __name__ == "__main__":
    main()
