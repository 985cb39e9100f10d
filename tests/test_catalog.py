"""Catalog seam tests: parquet fallback round-trip + Iceberg config
shape (the runtime jar is cluster-side; here we pin the seam)."""

from __future__ import annotations

from chopin_spark.catalog import iceberg_conf, load_table, write_table


def test_parquet_roundtrip(spark, tmp_path):
    df = spark.range(100).withColumnRenamed("id", "k")
    ref = str(tmp_path / "t1")
    write_table(df, ref, mode="overwrite")
    back = load_table(spark, ref)
    assert back.count() == 100
    assert back.columns == ["k"]


def test_iceberg_conf_shape():
    c = iceberg_conf("/warehouse", catalog="ice")
    assert c["spark.sql.catalog.ice"] == "org.apache.iceberg.spark.SparkCatalog"
    assert c["spark.sql.catalog.ice.type"] == "hadoop"
    assert c["spark.sql.catalog.ice.warehouse"] == "/warehouse"
    assert "IcebergSparkSessionExtensions" in c["spark.sql.extensions"]
