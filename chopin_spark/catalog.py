"""Iceberg-ready table access (the north rule's storage layer).

This sandbox has no Iceberg runtime jar, so the engine reads the
driver-provided parquet files; every loader below resolves through ONE
seam so a cluster deployment flips to Iceberg by configuration only:

    spark = get_session(extra_conf=iceberg_conf("/warehouse"))
    df = load_table(spark, "iceberg:web.pages")     # catalog table
    df = load_table(spark, "/data/sf0.1/pages.parquet")  # file fallback

Why Iceberg at 100 TB (SURVEY.md §2.4): hidden partitioning on
(bucket(url), days(warc_ts)) plus min/max column stats on the derived
cell columns (cgridid, hex_cell, quad_cell, zone_id) give storage-level
partition pruning for every spatial predicate this engine emits — the
scan-side twin of the arithmetic cell assignment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_conf(
    warehouse: str, catalog: str = "iceberg"
) -> dict[str, str]:
    """SparkSession config for a Hadoop-catalog Iceberg deployment.
    Requires org.apache.iceberg:iceberg-spark-runtime on the cluster
    classpath (not present in this sandbox — config is exercised by a
    cluster, the seam by tests)."""
    return {
        f"spark.sql.catalog.{catalog}": "org.apache.iceberg.spark.SparkCatalog",
        f"spark.sql.catalog.{catalog}.type": "hadoop",
        f"spark.sql.catalog.{catalog}.warehouse": warehouse,
        "spark.sql.extensions": (
            "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions"
        ),
    }


def load_table(spark: SparkSession, ref: str) -> DataFrame:
    """One seam for every table read: 'iceberg:<ns.table>' → catalog
    table (predicate pushdown + partition pruning via Iceberg stats);
    anything else → parquet path."""
    if ref.startswith("iceberg:"):
        # the catalog is registered under the name 'iceberg'
        # (iceberg_conf) and defaultCatalog is NOT changed, so the
        # identifier must be catalog-qualified: iceberg.<ns.table>
        return spark.read.table("iceberg." + ref.split(":", 1)[1])
    return spark.read.parquet(ref)


def write_table(df: DataFrame, ref: str, mode: str = "append") -> None:
    """Sink seam: Iceberg writeTo (append/overwritePartitions) or
    parquet directory."""
    if ref.startswith("iceberg:"):
        name = "iceberg." + ref.split(":", 1)[1]
        w = df.writeTo(name)
        if mode == "append":
            w.append()
        elif mode == "overwrite":
            w.overwritePartitions()
        else:
            raise ValueError(f"unsupported iceberg mode {mode!r}")
    else:
        df.write.mode(mode).parquet(ref)
