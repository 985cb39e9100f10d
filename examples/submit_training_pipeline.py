#!/usr/bin/env python
"""Training-data pipeline entrypoint (spark-submit --py-files).

    ./scripts/make_pyfiles.sh
    spark-submit --master spark://head:7077 \
        --py-files dist/chopin_spark.zip \
        examples/submit_training_pipeline.py iceberg:web.pages /out/corpus

The LLM-corpus composition over the north-rule pages table: quality
filter → exact-dup clusters (connected components over same-text
pairs) → keep one representative per cluster → leakage-safe host-keyed
train/val/test split → per-split corpus stats, checkpointed per split
so a killed submit resumes. Without args it synthesizes pages.
"""

from __future__ import annotations

import sys

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else None
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/chopin_spark_corpus"

    spark = SparkSession.builder.appName("chopin-spark-corpus").getOrCreate()

    from chopin_spark.catalog import load_table
    from chopin_spark.checkpoint import CheckpointedRun
    from chopin_spark.components import connected_components
    from chopin_spark.pages import synth_pages
    from chopin_spark.textops import charfold_spark

    pages = load_table(spark, src) if src else synth_pages(spark, 200_000)

    # quality gate: cheap column math, fused into the scan
    ntok = F.size(F.split("text", " "))
    quality = pages.withColumn("_ntok", ntok).filter(F.col("_ntok") >= 12)

    # exact-dup clusters: same-md5 pairs → components → keep min page
    keyed = quality.withColumn(
        "page_id",
        F.expr("cast(regexp_extract(url, '/p/([0-9]+)$', 1) as bigint)"),
    )
    md5_pairs = (
        keyed.groupBy(F.md5("text").alias("h"))
        .agg(F.sort_array(F.collect_list("page_id")).alias("ids"))
        .filter(F.size("ids") > 1)
        .select(
            F.element_at("ids", 1).alias("d1"),
            F.explode(F.slice("ids", 2, 1_000_000)).alias("d2"),
        )
    )
    comp = connected_components(md5_pairs)
    survivors = keyed.join(
        comp.filter(F.col("node") != F.col("comp_id")).select(
            F.col("node").alias("page_id")
        ),
        "page_id",
        "left_anti",
    )

    # leakage-safe split on the HOST hash
    host = F.expr("parse_url(url, 'HOST')")
    bucket = F.pmod(F.expr(charfold_spark("parse_url(url, 'HOST')")) * 2654435761, F.lit(1000))
    split_col = (
        F.when(bucket < 800, "train").when(bucket < 900, "val").otherwise("test")
    )
    tagged = survivors.withColumn("split", split_col).withColumn("host", host)

    def split_job(name):
        def job(s: SparkSession):
            return (
                tagged.filter(F.col("split") == name)
                .groupBy("split", "lang")
                .agg(
                    F.count(F.lit(1)).alias("n_pages"),
                    F.countDistinct("host").alias("n_hosts"),
                    F.sum("_ntok").alias("n_tokens"),
                )
            )

        return job

    run = CheckpointedRun(spark, out)
    executed = run.run({f"split_{n}": split_job(n) for n in ("train", "val", "test")})
    print(f"executed batches: {executed}")
    res = run.result().orderBy("split", "lang")
    print(f"result rows: {res.count()}")
    for r in res.groupBy("split").agg(
        F.sum("n_pages").alias("p"), F.sum("n_tokens").alias("t")
    ).orderBy("split").collect():
        print(f"  {r['split']}: pages={r['p']} tokens={r['t']}")
    spark.stop()


if __name__ == "__main__":
    main()
