"""Streaming kill-and-resume: the north rule's resumability contract
at the Structured-Streaming surface.

A file-source stream drains to a parquet sink with a durable
checkpoint.  Drain 1 sees half the input files; new files then arrive;
drain 2 restarts the SAME query (same checkpoint dir, fresh
DataStreamWriter — a new driver process in production).  The sink must
end exactly-once-complete: every input row present, none duplicated,
and drain 2's file-source offset log must skip everything drain 1
committed."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _write_batch(spark, src_dir, lo, hi, part):
    (
        spark.range(lo, hi, 1, 2)
        .select(
            F.col("id").alias("event_id"),
            F.timestamp_seconds(
                F.lit(1704067200) + F.col("id") * 60
            ).alias("ts"),
            (F.col("id") % 7).alias("user_id"),
        )
        .write.mode("append")
        .parquet(os.path.join(src_dir, part))
    )


def _drain(spark, src_dir, out_dir, ck_dir, schema):
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(os.path.join(src_dir, "*"))
    )
    agg = stream.withColumn("bucket", F.col("event_id") % 10)
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_resumes_from_checkpoint_across_restarts(spark, tmp_path):
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    os.makedirs(src)

    _write_batch(spark, src, 0, 500, "p0")
    schema = spark.read.parquet(os.path.join(src, "p0")).schema

    _drain(spark, src, out, ck, schema)
    n1 = spark.read.parquet(out).count()
    assert n1 == 500

    # late-arriving files, then a RESTARTED query on the same checkpoint
    _write_batch(spark, src, 500, 800, "p1")
    _write_batch(spark, src, 800, 900, "p2")
    _drain(spark, src, out, ck, schema)

    final = spark.read.parquet(out)
    assert final.count() == 900  # no loss
    assert final.select("event_id").distinct().count() == 900  # no dups
    got = {
        r["bucket"]: r["n"]
        for r in final.groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    assert got == {b: 90 for b in range(10)}

    # a third drain with nothing new must commit zero rows
    _drain(spark, src, out, ck, schema)
    assert spark.read.parquet(out).count() == 900
