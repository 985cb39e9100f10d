"""As-of (temporal) join queries — chopin_spark.temporal.

The training-pipeline shape: attach to each fact the latest prior
state row (label-as-of-crawl-time, price-at-order-time).  Here:
each `purchase` event gets the same user's most recent prior `click`
(event id + value), NULL if none — a left as-of self-join on the
events table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark.queries import register
from chopin_spark.tables import load
from chopin_spark.temporal import asof_join

_ASOF_ORACLE = """
WITH cl AS (
  SELECT user_id, ts, event_id, value
  FROM events WHERE event_type = 'click'
),
pu AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'
)
SELECT pu.event_id, pu.user_id, pu.ts,
       pu.value AS purchase_value,
       ARG_MAX(cl.event_id, cl.ts) AS click_event_id,
       ARG_MAX(cl.value, cl.ts) AS click_value
FROM pu LEFT JOIN cl
  ON cl.user_id = pu.user_id AND cl.ts <= pu.ts
GROUP BY pu.event_id, pu.user_id, pu.ts, pu.value
"""


@register("events_asof_last_click", _ASOF_ORACLE)
def events_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left as-of join via the union trick (temporal.asof_join): one
    shuffle on user_id + one in-partition sort, NEVER the per-key
    cross product the oracle brute-forces ((user_id, ts) is unique
    among clicks, so the oracle's ARG_MAX by ts is well-defined)."""
    ev = load(spark, sf_dir, "events")
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.col("value").alias("purchase_value"),
    )
    state = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id", "value",
    )
    out = asof_join(
        facts, state,
        keys=["user_id"], ts_col="ts",
        state_cols=["event_id", "value"], tie_col="event_id",
        prefix="click_",
    )
    return out.select(
        "event_id", "user_id", "ts", "purchase_value",
        F.col("click_event_id"), F.col("click_value"),
    )
