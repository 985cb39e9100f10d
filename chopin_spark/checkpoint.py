"""Checkpointed, resumable batch execution with per-batch lineage +
metrics (the north rule's kill-and-resume contract).

The work is split into named batches (normally: groups of grid cells —
chopin's task list, /root/reference/R/gridding.R:798-825). Each batch
writes its result idempotently to its own output partition directory
(`out/batch_id=<id>`, mode=overwrite: a re-run of a half-written batch
replaces it, never duplicates), THEN appends a completion row to the
checkpoint table. Resume = read the checkpoint table, skip completed
batch ids — an anti-join on lineage, not a re-scan.

Metrics rows carry (batch_id, n_rows, wall_ms, status) and, when the
result exposes a `cgridid` column, per-cell lineage counts — the
reference's per-task debug/timing rows (R/scale_process.R:209-219)
made durable.
"""

from __future__ import annotations

import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType, DoubleType,
)

_CKPT_SCHEMA = StructType(
    [
        StructField("batch_id", StringType()),
        StructField("n_rows", LongType()),
        StructField("wall_ms", DoubleType()),
        StructField("status", StringType()),
    ]
)

_LINEAGE_SCHEMA = StructType(
    [
        StructField("batch_id", StringType()),
        StructField("cgridid", LongType()),
        StructField("n_rows", LongType()),
    ]
)


class CheckpointedRun:
    """Resumable multi-batch job.

    ckpt_dir/
      checkpoint/   completion + metrics rows (parquet, append-only)
      lineage/batch_id=<id>/   per-cell row counts (idempotent overwrite)
      data/batch_id=<id>/   idempotent per-batch output
    """

    def __init__(self, spark: SparkSession, ckpt_dir: str):
        self.spark = spark
        self.ckpt_dir = ckpt_dir
        self.data_dir = os.path.join(ckpt_dir, "data")
        self.meta_dir = os.path.join(ckpt_dir, "checkpoint")
        self.lineage_dir = os.path.join(ckpt_dir, "lineage")

    # --- state ------------------------------------------------------

    def completed(self) -> set[str]:
        try:
            rows = (
                self.spark.read.parquet(self.meta_dir)
                .filter(F.col("status") == "done")
                .select("batch_id")
                .collect()
            )
        except Exception as e:
            # ONLY the first-run case (no checkpoint table yet) means
            # "nothing completed"; a corrupt/unreadable table must
            # surface, not silently trigger a full re-run
            msg = str(e)
            if "PATH_NOT_FOUND" in msg or "Path does not exist" in msg:
                return set()
            raise
        return {r["batch_id"] for r in rows}

    def metrics(self) -> DataFrame:
        return self.spark.read.parquet(self.meta_dir)

    def lineage(self) -> DataFrame:
        # batch_id comes back as the hive partition column of the
        # per-batch overwrite dirs (same layout as data/)
        return self.spark.read.parquet(self.lineage_dir).select(
            F.col("batch_id").cast("string").alias("batch_id"),
            "cgridid",
            "n_rows",
        )

    def result(self) -> DataFrame:
        return self.spark.read.parquet(self.data_dir)

    # --- execution ---------------------------------------------------

    def run(
        self,
        batches: dict[str, Callable[[SparkSession], DataFrame]],
    ) -> list[str]:
        """Execute every batch not already checkpointed. Returns the
        batch ids executed this call. A batch failure propagates after
        its 'failed' metrics row is recorded — the next run() resumes
        from exactly that batch."""
        done = self.completed()
        executed: list[str] = []
        for bid, fn in batches.items():
            if bid in done:
                continue
            t0 = time.perf_counter()
            try:
                df = fn(self.spark).cache()
                n = df.count()
                df.write.mode("overwrite").parquet(
                    os.path.join(self.data_dir, f"batch_id={bid}")
                )
                if "cgridid" in df.columns:
                    # per-batch OVERWRITE dir, like data/: a batch
                    # killed after this write but before its 'done' row
                    # re-runs and REPLACES its lineage instead of
                    # appending a second copy (kill-and-resume must not
                    # double-count)
                    (
                        df.groupBy("cgridid")
                        .agg(F.count(F.lit(1)).alias("n_rows"))
                        .select("cgridid", "n_rows")
                        .write.mode("overwrite")
                        .parquet(
                            os.path.join(
                                self.lineage_dir, f"batch_id={bid}"
                            )
                        )
                    )
                df.unpersist()
            except Exception:
                self._mark(bid, -1, (time.perf_counter() - t0) * 1e3, "failed")
                raise
            self._mark(bid, n, (time.perf_counter() - t0) * 1e3, "done")
            executed.append(bid)
        return executed

    def _mark(self, bid: str, n: int, wall_ms: float, status: str) -> None:
        self.spark.createDataFrame(
            [(bid, n, wall_ms, status)], _CKPT_SCHEMA
        ).write.mode("append").parquet(self.meta_dir)


def cell_batches(
    job: Callable[[SparkSession, list[int]], DataFrame],
    all_cells: list[int],
    n_batches: int,
) -> dict[str, Callable[[SparkSession], DataFrame]]:
    """Partition a cell universe into n_batches contiguous groups; each
    batch runs `job(spark, cells)` — the caller filters its inputs to
    those cgridids (partition pruning via an IN-list of cell keys)."""
    out: dict[str, Callable[[SparkSession], DataFrame]] = {}
    size = (len(all_cells) + n_batches - 1) // n_batches
    for b in range(n_batches):
        cells = all_cells[b * size : (b + 1) * size]
        if not cells:
            continue
        out[f"b{b:04d}"] = (
            lambda spark, _cells=tuple(cells): job(spark, list(_cells))
        )
    return out
