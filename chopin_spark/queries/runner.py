"""Driver-visible runner query: the padded applyInPandas runner (R1)
computing per-cell statistics, oracle-checked against plain SQL — the
partitioned == unpartitioned contract exposed to the correctness gate
itself (not just pytest)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark import sqlexpr as sx
from chopin_spark.grid import make_regular_grid
from chopin_spark.queries import register
from chopin_spark.runners import par_grid_map
from chopin_spark.tables import load

_X = sx.x_expr("doc_id")
_Y = sx.y_expr("doc_id")

_RUNNER_ORACLE = f"""
SELECT {sx.grid_cell_expr(_X, _Y, 8, 6)} AS cgridid,
       COUNT(*) AS n_core,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents
GROUP BY 1
"""


def _cell_stats(pdf: pd.DataFrame) -> pd.DataFrame:
    core = pdf[pdf["is_core"]]
    if core.empty:
        return None
    return pd.DataFrame(
        {
            "n_core": [int(len(core))],
            "sum_chars": [int(core["n_chars"].sum())],
        }
    )


@register("par_grid_runner_cell_stats", _RUNNER_ORACLE)
def par_grid_runner_cell_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """R1 par_grid (/root/reference/R/scale_process.R:99-232) through
    the actual grouped-map runner: every point enters its padded cells,
    the per-cell UDF aggregates only core rows (is_core dedup-free
    semantics) — and the result must equal the plain GROUP BY oracle,
    which is precisely chopin's headline contract
    (/root/reference/README.md:463-468)."""
    docs = load(spark, sf_dir, "documents").select(
        F.expr(_X).alias("x"), F.expr(_Y).alias("y"), "n_chars"
    )
    grid = make_regular_grid(8, 6, pad=30_000.0)
    return par_grid_map(
        docs, grid, _cell_stats,
        "cgridid long, n_core long, sum_chars long",
    )
