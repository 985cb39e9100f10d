"""Streaming == batch equivalence for the windowed summarize_st
extension (the engine invariant applied to Structured Streaming)."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from chopin_spark import sqlexpr as sx
from chopin_spark.streaming import (
    run_available_now,
    stream_events,
    windowed_counts,
    windowed_grid_counts,
)
from tests.conftest import SF_SMOKE


@pytest.fixture()
def events_dir(spark, tmp_path):
    src = f"{SF_SMOKE}/events.parquet"
    dst = tmp_path / "events_stream"
    # re-write as a 4-file directory so the file source sees several
    # input splits
    spark.read.parquet(src).repartition(4).write.parquet(str(dst))
    return str(dst)


def test_stream_equals_batch_hourly(spark, events_dir, tmp_path):
    batch = spark.read.parquet(events_dir)
    want = {
        (r["window_start"], r["event_type"], r["n_events"], r["sum_value"])
        for r in (
            batch.groupBy(
                F.date_trunc("hour", "ts").alias("window_start"), "event_type"
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 4).alias("sum_value"),
            )
            .collect()
        )
    }
    stream = stream_events(spark, events_dir, batch.schema)
    assert stream.isStreaming
    out = windowed_counts(stream)
    run_available_now(out, "hourly_counts", str(tmp_path / "ckpt"))
    got = {
        (r["window_start"], r["event_type"], r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM hourly_counts").collect()
    }
    assert got == want
    shutil.rmtree(str(tmp_path / "ckpt"), ignore_errors=True)


def test_session_windows_batch_vs_manual(spark, events_dir):
    """Gap-based session windows: per-user sessions split exactly where
    inter-event gaps exceed the threshold (checked against a pandas
    reconstruction)."""
    from chopin_spark.streaming import sessionized_counts

    batch = spark.read.parquet(events_dir)
    got = sessionized_counts(batch, gap="30 minutes").collect()
    pdf = batch.select("user_id", "ts", "value").toPandas()
    want_sessions = 0
    for _, g in pdf.groupby("user_id"):
        ts = g["ts"].sort_values().to_numpy()
        gaps = (ts[1:] - ts[:-1]).astype("timedelta64[s]").astype(int)
        want_sessions += 1 + int((gaps >= 1800).sum())
    assert len(got) == want_sessions
    assert sum(r["n_events"] for r in got) == len(pdf)


def test_stateful_dedup_across_microbatches(spark, tmp_path):
    """applyInPandasWithState dedup: a key duplicated across
    micro-batches is emitted exactly once (state survives batches)."""
    import pandas as pd

    from chopin_spark.streaming import stateful_dedup

    src = tmp_path / "dedup_src"
    b1 = pd.DataFrame({"k": ["a", "b", "a"], "v": ["1", "2", "3"]})
    b2 = pd.DataFrame({"k": ["b", "c", "a"], "v": ["4", "5", "6"]})
    spark.createDataFrame(b1).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(b2).coalesce(1).write.parquet(str(src / "f2"))

    schema = spark.read.parquet(str(src / "f1")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
    )
    out = stateful_dedup(stream, "k", ["v"])
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("SELECT * FROM dedup_stream").collect()
    keys = sorted(r["k"] for r in rows)
    assert keys == ["a", "b", "c"]  # each key exactly once


def test_streaming_grid_cells(spark, events_dir, tmp_path):
    batch = spark.read.parquet(events_dir)
    cell = sx.grid_cell_expr(
        sx.x_expr("event_id"), sx.y_expr("event_id"), 8, 6
    )
    want = {
        (r["cgridid"], r["n"])
        for r in batch.groupBy(F.expr(cell).alias("cgridid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    stream = stream_events(spark, events_dir, batch.schema)
    out = windowed_grid_counts(stream, cell, window="10000 hours")
    run_available_now(out, "grid_counts", str(tmp_path / "ckpt2"))
    rows = spark.sql("SELECT * FROM grid_counts").collect()
    got = {}
    for r in rows:
        got[r["cgridid"]] = got.get(r["cgridid"], 0) + r["n_events"]
    assert set(got.items()) == want
