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


_SQL_TYPES = {
    "long": "BIGINT", "bigint": "BIGINT", "int": "INT",
    "double": "DOUBLE", "string": "STRING",
}


def values_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Small driver-side constant table as a pure-SQL VALUES literal —
    a JVM LocalRelation.  createDataFrame(list) instead builds a
    pickled python RDD over defaultParallelism partitions, and every
    PLAN REFERENCE re-evaluates it with one python-worker round trip
    per partition (measured ~370 ms per reference for a 1-row frame at
    local[32] — guide §4: keep constant dimensions out of the Python
    boundary).  `schema` is the usual "name type, name type" DDL
    string; values may be int/float/str/None."""
    fields = [f.strip().rsplit(None, 1) for f in schema.split(",")]

    def lit(v) -> str:
        if v is None:
            return "NULL"
        if isinstance(v, str):
            s = v.replace("\\", "\\\\").replace("'", "''")
            return f"'{s}'"
        return repr(v)

    rows = list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    body = ", ".join(
        "(" + ", ".join(lit(v) for v in r) + ")" for r in rows
    )
    proj = ", ".join(
        f"CAST(col{i + 1} AS {_SQL_TYPES[t.lower()]}) AS {n}"
        for i, (n, t) in enumerate(fields)
    )
    return spark.sql(f"SELECT {proj} FROM VALUES {body}")


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every star-schema table as a temp view (oracle parity:
    the driver registers the same names in DuckDB)."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
