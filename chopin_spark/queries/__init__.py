"""Query registry: every driver-checkable query registers here.

Each entry pairs a Spark callable `(spark, sf_dir) -> DataFrame` with an
equivalent DuckDB oracle SQL string (or None for non-SQL-expressible
operators, which get the driver's weaker rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = (fn, oracle)
        return fn

    return deco


_MODULES = (
    "relational", "spatial", "hierarchy", "vector", "zonal", "textops",
    "simsearch", "multimodal", "coverage", "coverage2", "runner", "polygons",
    "crsq", "s2q", "webtext", "s2knn", "pagespipe", "temporalq",
    "manifestq", "trainprep", "streamq", "roads", "rasterops", "lmq",
    "snapshotq",
    "dissolveq", "sketchq", "simplifyq", "graphq", "costdistq", "interactq", "pointpat",
    "networkq", "tsmine", "privacyq", "textmine", "mlq", "classifyq",
    "gatedigest",  # must import last: it folds over every other entry
)


def load_all(with_digest_oracle: bool = False) -> dict:
    for mod in _MODULES:
        __import__(f"chopin_spark.queries.{mod}")
    if with_digest_oracle:
        # oracle_gate_digest's DuckDB oracle is generated (DESCRIBE over
        # every registered oracle), so it attaches lazily — only callers
        # that actually need oracle SQL strings pay the generation.
        from chopin_spark.queries import gatedigest

        name = gatedigest.DIGEST_NAME
        if QUERIES[name][1] is None:
            QUERIES[name] = (QUERIES[name][0], gatedigest.digest_oracle())
    return QUERIES
