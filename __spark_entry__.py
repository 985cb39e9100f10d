"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship spatial query at sf0.001;
`queries()` / `oracle_sql()` expose every implemented operator from
SURVEY.md §2 with its DuckDB oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the spatial-join + tiling pipeline — geocode → PIP
    join to the admin hierarchy → per-zone aggregation (SURVEY.md §7
    step 2; the north-star query shape)."""
    from chopin_spark.queries import load_all

    q = load_all()["summarize_pp_zones"][0]
    return q(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from chopin_spark.queries import load_all

    return {name: fn for name, (fn, _) in load_all().items()}


def oracle_sql() -> dict[str, str]:
    from chopin_spark.queries import load_all

    return {
        name: sql
        for name, (_, sql) in load_all(with_digest_oracle=True).items()
        if sql is not None
    }
