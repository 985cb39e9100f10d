"""Manifest-pruned spatial range scan (chopin_spark.manifest) — the
Iceberg file-skipping mechanism demonstrated end-to-end and
oracle-checked.

The documents table is stored ONCE per process as parquet
range-partitioned on the real S2 level-8 prefix with a per-file
min/max manifest (the stored table in production is Iceberg with the
cell id as a sort/partition key — catalog.py).  The query answers an
S2 range predicate by reading only overlapping files; the pruning
ratio itself is asserted in tests/test_manifest.py.  The oracle
recomputes the same prefix arithmetic in SQL over the raw table — so
layout + pruning must be value-invisible.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark import s2
from chopin_spark.manifest import read_pruned, write_sorted_table
from chopin_spark.queries import register
from chopin_spark.queries.s2q import _LAT, _LEVEL, _LON
from chopin_spark.s2sql import s2_prefix_sql
from chopin_spark.tables import load

# fixed S2 level-8 prefix window (face-4 interior; ~20% of documents
# at sf0.01) — literals so Spark and DuckDB filter identically
_P_LO, _P_HI = 263940, 276251

_CACHE_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache", "manifest_docs",
)
_MEMO: dict = {}


def _docs_manifest_path(spark: SparkSession, sf_dir: str) -> str:
    """Write documents as a 16-file S2-sorted manifest table once per
    (session, sf_dir); the prefix column is computed with the numpy S2
    kernel (bit-equal to the SQL twin — tests/test_s2.py), keeping the
    deep Hilbert chain out of the write plan (Catalyst
    alias-substitution guard, see docs/PLANS.md notes)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _MEMO:
        return _MEMO[key]
    from chopin_spark.manifest import manifest_path as _mp

    # the tag carries a SOURCE SIGNATURE (mtime+size of the parquet):
    # basename alone would silently serve another dataset's cached
    # manifest for a same-named sf_dir, or a stale one after regeneration
    src = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(src)
    tag = (
        f"{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{int(st.st_mtime)}_{st.st_size}"
    )
    path = os.path.join(_CACHE_ROOT, tag)
    if not (
        os.path.exists(os.path.join(path, "_SUCCESS"))
        and os.path.exists(os.path.join(_mp(path), "_SUCCESS"))
    ):

        def _prefix(lon, lat):
            cid = s2.cell_id_from_lonlat(
                lon.to_numpy(), lat.to_numpy(), _LEVEL
            )
            return pd.Series(s2.prefix_from_cell_id(cid, _LEVEL))

        prefix_udf = F.pandas_udf(_prefix, "long")
        docs = (
            load(spark, sf_dir, "documents")
            .selectExpr("doc_id", "n_chars", f"{_LON} AS lon", f"{_LAT} AS lat")
            .withColumn("s2_prefix", prefix_udf(F.col("lon"), F.col("lat")))
            .select("doc_id", "n_chars", "s2_prefix")
        )
        write_sorted_table(docs, path, key="s2_prefix", n_files=16)
    _MEMO[key] = path
    return path


_BASE = (
    f"(SELECT doc_id, n_chars, {_LON} AS lon, {_LAT} AS lat FROM documents)"
)

# The CTE is MATERIALIZED on purpose: letting DuckDB push the range
# predicate down through the ~40-projection Hilbert chain inlines the
# whole chain into the predicate (exponential text growth — the same
# failure family as lateral-alias inlining; it hard-hangs the bind).
_PRUNED_ORACLE = f"""
WITH pref AS MATERIALIZED (
  SELECT doc_id, n_chars, s2_prefix
  FROM ({s2_prefix_sql(_BASE, 'lon', 'lat', _LEVEL)})
)
SELECT (s2_prefix >> 8) AS s2_cell4,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM pref
WHERE s2_prefix BETWEEN {_P_LO} AND {_P_HI}
GROUP BY 1
"""


@register("s2_manifest_pruned_rollup", _PRUNED_ORACLE)
def s2_manifest_pruned_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 range rollup served from the manifest table: file skipping
    first (read only files whose [min, max] prefix range overlaps),
    residual row filter second, then the parent rollup.  At 10^12 rows
    this is the difference between touching ~range-fraction of the
    table and touching all of it."""
    path = _docs_manifest_path(spark, sf_dir)
    pruned = read_pruned(spark, path, "s2_prefix", _P_LO, _P_HI)
    return pruned.groupBy(
        F.expr("(s2_prefix >> 8)").alias("s2_cell4")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
    )


# --- compaction planning (Iceberg rewrite_data_files binPack) -----------------

_TARGET = 20_000  # target bytes per compaction group

_COMPACT_ORACLE = f"""
WITH files AS (
  SELECT lang, doc_id // 4 AS file_id,
         CAST(SUM(n_chars) AS BIGINT) AS bytes
  FROM documents GROUP BY 1, 2
),
cum AS (
  SELECT lang, file_id, bytes,
         SUM(bytes) OVER (PARTITION BY lang ORDER BY file_id
                          ROWS UNBOUNDED PRECEDING) - bytes AS cum_before
  FROM files
)
SELECT lang, CAST(cum_before // {_TARGET} AS BIGINT) AS grp,
       COUNT(*) AS n_files,
       CAST(SUM(bytes) AS BIGINT) AS bytes,
       CAST(MIN(file_id) AS BIGINT) AS first_file,
       CAST(MAX(file_id) AS BIGINT) AS last_file
FROM cum
GROUP BY 1, 2
"""


@register("compaction_bin_pack", _COMPACT_ORACLE)
def compaction_bin_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planner (Iceberg rewrite_data_files
    binPack): within each table partition (lang), files in sort-key
    order fold into target-size groups by an exclusive running-sum
    window — group = cum_before DIV target, the deterministic
    first-fit-in-order rule.  The window partitions by `lang`, so at
    10^12 rows the global sort the textbook formulation needs
    disappears: each partition plans independently, which is exactly
    how table maintenance shards in production."""
    docs = load(spark, sf_dir, "documents")
    files = docs.groupBy(
        "lang", F.expr("doc_id DIV 4").alias("file_id")
    ).agg(F.sum("n_chars").cast("long").alias("bytes"))
    from pyspark.sql import Window

    w = (
        Window.partitionBy("lang")
        .orderBy("file_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = files.withColumn(
        "cum_before", F.sum("bytes").over(w) - F.col("bytes")
    )
    return cum.groupBy(
        "lang", F.expr(f"cum_before DIV {_TARGET}").alias("grp")
    ).agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("bytes").cast("long").alias("bytes"),
        F.min("file_id").cast("long").alias("first_file"),
        F.max("file_id").cast("long").alias("last_file"),
    )
