"""C7 summarize_st — the space-or-time dispatcher
(/root/reference/R/processing.R:1148-1253): one entry point that
dispatches on the `.by` argument: a time-unit string → tumbling
date_trunc aggregation over all numeric columns (:1158-1202, exactly
one time column); a spatial partition → point-in-polygon aggregation
(dispatching summarize_pp / summarize_aw, :1204-1251).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType, TimestampNTZType, TimestampType

from chopin_spark.grid import RectGrid

_TIME_UNITS = {
    "minute", "hour", "day", "week", "month", "quarter", "year",
}


def _numeric_cols(df: DataFrame, exclude: set[str]) -> list[str]:
    """chopin's default target fields = all numeric columns
    (/root/reference/R/processing.R:970, :1214)."""
    return [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, NumericType) and f.name not in exclude
    ]


def _detect_time_col(df: DataFrame) -> str:
    """Exactly one timestamp column, mirroring .detect_time_info
    (/root/reference/R/processing.R:1102-1107, :1167-1176)."""
    ts = [
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (TimestampType, TimestampNTZType))
    ]
    if len(ts) != 1:
        raise ValueError(
            f"summarize_st requires exactly one timestamp column, found {ts}"
        )
    return ts[0]


def summarize_st(
    df: DataFrame,
    by,
    id_col: str | None = None,
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Dispatch on `by`:
    - time-unit string ('hour', 'day', ...) → groupBy(id?, floor(ts))
      mean over all numeric columns;
    - RectGrid → per-cell mean (the rectangular summarize_pp);
    - DataFrame of zone rects (zone_id, xmin..ymax) → broadcast PIP
      containment join + per-zone mean.
    """
    if isinstance(by, str):
        if by not in _TIME_UNITS:
            raise ValueError(f"unknown time unit {by!r}")
        ts = _detect_time_col(df)
        keys = ([id_col] if id_col else []) + [
            F.date_trunc(by, F.col(ts)).alias("time_group")
        ]
        vals = _numeric_cols(df, {id_col} if id_col else set())
        return df.groupBy(*keys).agg(
            *[F.round(F.avg(c), 4).alias(f"{c}_mean") for c in vals]
        )

    if isinstance(by, RectGrid):
        assigned = by.assign_core(df)
        vals = _numeric_cols(df, {x_col, y_col, id_col or ""})
        return assigned.groupBy("cgridid").agg(
            *[F.round(F.avg(c), 4).alias(f"{c}_mean") for c in vals]
        )

    if isinstance(by, DataFrame):
        zones = F.broadcast(by)
        joined = df.join(
            zones,
            (F.col(x_col) >= by["xmin"])
            & (F.col(x_col) < by["xmax"])
            & (F.col(y_col) >= by["ymin"])
            & (F.col(y_col) < by["ymax"]),
        )
        vals = _numeric_cols(df, {x_col, y_col, id_col or ""})
        return joined.groupBy("zone_id").agg(
            *[F.round(F.avg(c), 4).alias(f"{c}_mean") for c in vals]
        )

    raise TypeError(f"unsupported `by` argument: {type(by)}")
