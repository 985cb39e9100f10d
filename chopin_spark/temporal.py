"""Temporal (as-of) join — attach the latest state row at or before
each fact's timestamp.

A training-data pipeline constantly needs this shape: crawl snapshot ⋈
label-table-as-of-crawl-time, event ⋈ model-version-active-at-event,
price-at-order-time.  Spark has no ASOF JOIN operator; the naive
θ-join (`f.ts >= s.ts`) is a cross product per key.  The scale-right
plan used here is the union trick (how Flink materializes temporal
joins): tag fact and state rows, ONE shuffle on the key, sort within
key by (ts, tag, tie), and carry the last non-null state forward with
an unbounded-preceding window.  Cost = one shuffle + one in-partition
sort, independent of how many state rows precede each fact.

Semantics: for fact f, the attached state is the row with the maximum
(ts, tie) among state rows with s.ts <= f.ts for the same key; facts
with no prior state keep NULL (left as-of).  State rows sort BEFORE
fact rows at equal ts, so a same-instant update is visible (<=, not <).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    facts: DataFrame,
    state: DataFrame,
    keys: list[str],
    ts_col: str,
    state_cols: list[str],
    tie_col: str | None = None,
    prefix: str = "asof_",
) -> DataFrame:
    """facts + {prefix}{c} for c in state_cols, matched as-of ts_col.

    `state` must carry keys + ts_col + state_cols (+ tie_col); `facts`
    keeps all its columns.  tie_col breaks equal-ts state rows
    deterministically (max wins); it must not be NULL in state.
    """
    fact_cols = facts.columns
    reserved = {"_st", "_cf", "_is_fact", "_tie"}
    clash = reserved & (set(fact_cols) | set(state.columns))
    if clash:
        raise ValueError(
            f"asof_join reserves internal column names {sorted(clash)};"
            " rename them on the input"
        )
    tagged_f = facts.withColumn("_is_fact", F.lit(1))
    # the whole state row travels as ONE non-null struct, so a NULL in
    # an individual state column is carried faithfully (per-column
    # last(ignorenulls) would fall through to an older state row)
    tagged_s = state.select(
        *keys,
        ts_col,
        F.struct(*[F.col(c) for c in state_cols]).alias("_st"),
        *([F.col(tie_col).alias("_tie")] if tie_col else [F.lit(0).alias("_tie")]),
    ).withColumn("_is_fact", F.lit(0))
    u = tagged_f.unionByName(tagged_s, allowMissingColumns=True)
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col(ts_col).asc(), F.col("_is_fact").asc(), F.col("_tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("_cf", F.last("_st", ignorenulls=True).over(w))
    return carried.filter(F.col("_is_fact") == 1).select(
        *fact_cols,
        *[F.col(f"_cf.{c}").alias(f"{prefix}{c}") for c in state_cols],
    )
