"""Snapshot-lineage contract tests: append-only commits, log-driven
file selection (time travel + incremental), stray-file invisibility."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from chopin_spark.snapshots import (
    append_snapshot,
    read_incremental,
    read_snapshot,
    snapshot_log,
)


@pytest.fixture()
def table(spark, tmp_path):
    t = str(tmp_path / "tbl")
    os.makedirs(t)
    for sid in (1, 2, 3):
        pdf = pd.DataFrame(
            {"k": range(sid * 10, sid * 10 + 5), "snap": [sid] * 5}
        )
        assert append_snapshot(spark.createDataFrame(pdf), t) == sid
    return t


def test_log_structure(table):
    log = snapshot_log(table)
    assert [e["snapshot_id"] for e in log] == [1, 2, 3]
    assert [e["parent_id"] for e in log] == [None, 1, 2]
    assert all(e["n_rows"] == 5 for e in log)
    assert all(f.startswith(f"data/snap={e['snapshot_id']}/")
               for e in log for f in e["files"])


def test_time_travel_is_cumulative(spark, table):
    for as_of, n in ((1, 5), (2, 10), (3, 15), (None, 15)):
        df = read_snapshot(spark, table, as_of=as_of)
        assert df.count() == n
        hi = as_of or 3
        assert df.agg(F.max("snap")).first()[0] == hi


def test_incremental_reads_only_new_files(spark, table):
    df = read_incremental(spark, table, from_id=1)
    assert sorted(r["snap"] for r in df.select("snap").distinct().collect()) \
        == [2, 3]
    # storage-level proof: every file the scan touched lives in the
    # requested snapshot directories — selection happened at the file
    # list, not as a row filter
    files = {
        r["f"] for r in
        df.select(F.input_file_name().alias("f")).distinct().collect()
    }
    assert files
    assert all("/data/snap=2/" in f or "/data/snap=3/" in f for f in files)
    # bounded range
    assert read_incremental(spark, table, 1, 2).count() == 5
    # empty range -> empty frame, table schema preserved
    empty = read_incremental(spark, table, 3)
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "snap"}


def test_append_never_rewrites_old_files(spark, table):
    data1 = os.path.join(table, "data", "snap=1")
    before = {
        f: os.stat(os.path.join(data1, f)).st_mtime_ns
        for f in os.listdir(data1)
    }
    append_snapshot(
        spark.createDataFrame(pd.DataFrame({"k": [99], "snap": [4]})), table
    )
    after = {
        f: os.stat(os.path.join(data1, f)).st_mtime_ns
        for f in os.listdir(data1)
    }
    assert before == after
    assert read_snapshot(spark, table).count() == 16


def test_stray_files_are_invisible(spark, table):
    """The log is the source of truth (Iceberg manifest contract): a
    parquet file dropped into a snapshot directory outside a commit is
    never read."""
    rogue_src = read_snapshot(spark, table, as_of=1).limit(1)
    rogue_dir = os.path.join(table, "data", "snap=1")
    rogue_src.toPandas().to_parquet(os.path.join(rogue_dir, "rogue.parquet"))
    assert read_snapshot(spark, table).count() == 15
    assert read_incremental(spark, table, 0, 1).count() == 5


def test_unknown_bounds_raise(spark, table):
    with pytest.raises(ValueError):
        read_incremental(spark, table, from_id=7)
    with pytest.raises(ValueError):
        read_snapshot(spark, table, as_of=9)
