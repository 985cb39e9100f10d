"""Loaders for the driver-provided star-schema parquet tables.

Lazy `spark.read.parquet` — nothing materializes until an action, and
Catalyst pushes filters/column pruning into the scan (the Spark
restatement of the reference's windowed per-task re-scan,
/root/reference/R/scale_process.R:180-196 — here pruning happens once
at plan time, not per task).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every star-schema table as a temp view (oracle parity:
    the driver registers the same names in DuckDB)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
