"""Iceberg-style snapshot lineage over parquet: append / time-travel /
incremental reads (the north rule's recurring-crawl ingestion shape).

Iceberg's operational win for a crawl pipeline is not the file format —
it is the SNAPSHOT LOG: every commit records exactly which data files
it added, so "process only what the last crawl added" is a metadata
lookup (list one snapshot's files) instead of a 100 TB diff, and "the
corpus as of the v3 training run" is reproducible forever.  This module
implements that contract over plain parquet so the sandbox engine and
an Iceberg cluster deployment expose the same read surface
(catalog.py's seam decides which one backs it):

- ``append_snapshot`` writes the batch's files under
  ``<table>/data/snap=<id>/`` and appends one log entry
  (id, parent, files, row count) to ``<table>/snapshots.json``
  atomically (tmp + os.replace);
- ``read_snapshot(as_of=k)`` reads the union of files of snapshots
  ``<= k`` — time travel;
- ``read_incremental(lo, hi)`` reads files of snapshots in
  ``(lo, hi]`` — the incremental-processing read.  Both construct the
  scan from the LOG's file list (storage-level skipping), never by
  filtering rows of a full scan.

Scale: the log is one JSON row per commit (a crawl appends daily →
thousands of rows, metadata-sized); each read lists only the snapshot
directories it needs.  Reference parity: chopin has no catalog layer —
this extends SURVEY.md §2.4's storage story (manifest.py min/max
skipping) with the commit/lineage dimension.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

_LOG = "snapshots.json"


def _log_path(table_dir: str) -> str:
    return os.path.join(table_dir, _LOG)


def snapshot_log(table_dir: str) -> list[dict]:
    """The snapshot log, oldest first ([] for a new table)."""
    p = _log_path(table_dir)
    if not os.path.exists(p):
        return []
    with open(p) as f:
        return json.load(f)


def append_snapshot(df: DataFrame, table_dir: str) -> int:
    """Commit ``df`` as the next snapshot; returns its id (1-based).

    Files land under ``data/snap=<id>/`` — existing snapshots' files
    are never touched (append-only, asserted in tests by mtime).  The
    log entry records the exact file names so readers never re-list
    the directory (the Iceberg manifest contract: the log IS the
    source of truth, stray files are invisible)."""
    log = snapshot_log(table_dir)
    sid = (log[-1]["snapshot_id"] + 1) if log else 1
    data_dir = os.path.join(table_dir, "data", f"snap={sid}")
    df.write.mode("error").parquet(data_dir)
    files = sorted(
        f for f in os.listdir(data_dir)
        if f.endswith(".parquet") and not f.startswith(".")
    )
    n_rows = 0
    spark = df.sparkSession
    if files:
        n_rows = spark.read.parquet(
            *(os.path.join(data_dir, f) for f in files)
        ).count()
    log.append(
        {
            "snapshot_id": sid,
            "parent_id": log[-1]["snapshot_id"] if log else None,
            "files": [f"data/snap={sid}/{f}" for f in files],
            "n_rows": n_rows,
        }
    )
    tmp = _log_path(table_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(log, f, indent=1)
    os.replace(tmp, _log_path(table_dir))
    return sid


def _files_between(
    table_dir: str, lo: int, hi: int | None
) -> tuple[list[str], int]:
    """Absolute file paths of snapshots with lo < id <= hi (hi=None →
    latest), plus the resolved hi."""
    log = snapshot_log(table_dir)
    if not log:
        raise ValueError(f"no snapshots at {table_dir}")
    resolved_hi = log[-1]["snapshot_id"] if hi is None else hi
    ids = {e["snapshot_id"] for e in log}
    for bound, name in ((lo, "lo"), (resolved_hi, "hi")):
        if bound != 0 and bound not in ids:
            raise ValueError(f"unknown snapshot {name}={bound}")
    files = [
        os.path.join(table_dir, f)
        for e in log
        if lo < e["snapshot_id"] <= resolved_hi
        for f in e["files"]
    ]
    return files, resolved_hi


def read_snapshot(
    spark: SparkSession, table_dir: str, as_of: int | None = None
) -> DataFrame:
    """Time travel: the table as of snapshot ``as_of`` (default
    latest) — the union of every file committed up to and including
    it, taken from the log."""
    files, _ = _files_between(table_dir, 0, as_of)
    return spark.read.parquet(*files)


def read_incremental(
    spark: SparkSession, table_dir: str, from_id: int, to_id: int | None = None
) -> DataFrame:
    """Rows added AFTER ``from_id`` up to ``to_id`` (default latest):
    the incremental-processing read.  from_id=0 reads everything.  The
    scan lists only the requested snapshots' files — at crawl scale,
    yesterday's append, not the 100 TB table.  An empty range (no new
    snapshots) returns an empty frame with the table schema."""
    files, _ = _files_between(table_dir, from_id, to_id)
    if not files:
        from pyspark.sql import functions as F

        all_files, _ = _files_between(table_dir, 0, None)
        return spark.read.parquet(*all_files).filter(F.lit(False))
    return spark.read.parquet(*files)
