"""Manifest file-skipping tests: layout is value-invisible, pruning
is real, empty ranges short-circuit."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from chopin_spark.manifest import (
    manifest_file_counts, read_pruned, write_sorted_table,
)


def _table(spark, tmp_path):
    path = str(tmp_path / "mtab")
    df = spark.range(0, 5000).select(
        F.col("id"),
        (F.col("id") * 48271 % 1009).alias("key"),
        (F.col("id") % 97).alias("v"),
    )
    write_sorted_table(df, path, key="key", n_files=10)
    return path, df


def test_pruned_equals_full_filter(spark, tmp_path):
    path, df = _table(spark, tmp_path)
    lo, hi = 200, 350
    got = sorted(
        (r["id"], r["key"], r["v"])
        for r in read_pruned(spark, path, "key", lo, hi).collect()
    )
    want = sorted(
        (r["id"], r["key"], r["v"])
        for r in df.filter((F.col("key") >= lo) & (F.col("key") <= hi)).collect()
    )
    assert got == want and len(got) > 0


def test_pruning_skips_files(spark, tmp_path):
    path, _ = _table(spark, tmp_path)
    picked, total = manifest_file_counts(spark, path, "key", 200, 350)
    assert total == 10
    # a ~15% key range over range-partitioned files touches few files
    assert 1 <= picked <= 3


def test_empty_range(spark, tmp_path):
    path, _ = _table(spark, tmp_path)
    assert read_pruned(spark, path, "key", 5000, 6000).count() == 0
    picked, _ = manifest_file_counts(spark, path, "key", 5000, 6000)
    assert picked == 0
