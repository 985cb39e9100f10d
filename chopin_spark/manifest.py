"""Manifest-based file pruning — the in-sandbox working model of what
Iceberg's manifests buy at 100 TB.

catalog.py carries the real Iceberg config seam (no runtime jar in
this sandbox); this module demonstrates the MECHANISM with plain
parquet: write a table range-partitioned on a sort key (an S2/grid
cell id), record per-FILE min/max of that key in a manifest, and serve
range predicates by reading only the overlapping files.  That is
exactly the scan-side contract of Iceberg `lower_bounds/upper_bounds`
file skipping (hidden partitioning + column stats): a spatial range
query over 10^12 rows touches the files whose cell range overlaps the
query window, not the table.

Row-group min/max skipping inside each file comes free from parquet +
the same sort (tested in test_plans via numOutputRows); this layer
adds FILE-level elimination, which is the one that matters when the
file listing itself is the bottleneck.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def manifest_path(path: str) -> str:
    """Manifest lives BESIDE the data dir (sibling), so the data
    scan never sees it and the manifest read needs no
    underscore-hidden-path exception."""
    return path.rstrip("/") + "__manifest"


def write_sorted_table(
    df: DataFrame, path: str, key: str, n_files: int
) -> None:
    """Write `df` as `n_files` parquet files range-partitioned on
    `key` (files own disjoint key ranges), then write the per-file
    (file, min_key, max_key, n_rows) manifest next to the data."""
    df.repartitionByRange(n_files, F.col(key)).sortWithinPartitions(
        key
    ).write.mode("overwrite").parquet(path)
    spark = df.sparkSession
    manifest = (
        spark.read.parquet(path)
        .groupBy(F.input_file_name().alias("file"))
        .agg(
            F.min(key).alias("min_key"),
            F.max(key).alias("max_key"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(
        manifest_path(path)
    )


def read_pruned(
    spark: SparkSession, path: str, key: str, lo, hi
) -> DataFrame:
    """Rows with key in [lo, hi], reading ONLY files whose manifest
    range overlaps — the file-skipping half; the residual filter
    handles in-file precision (and pushes down to row groups)."""
    manifest = spark.read.parquet(manifest_path(path))
    files = [
        r["file"]
        for r in manifest.filter(
            (F.col("max_key") >= lo) & (F.col("min_key") <= hi)
        ).collect()
    ]
    if not files:
        return (
            spark.read.parquet(path)
            .filter(F.lit(False))
        )
    return spark.read.parquet(*files).filter(
        (F.col(key) >= lo) & (F.col(key) <= hi)
    )


def manifest_file_counts(spark: SparkSession, path: str, key: str, lo, hi):
    """(files_selected, files_total) for a range — the pruning ratio."""
    manifest = spark.read.parquet(manifest_path(path))
    total = manifest.count()
    picked = manifest.filter(
        (F.col("max_key") >= lo) & (F.col("min_key") <= hi)
    ).count()
    return picked, total
