"""Structured Streaming driver queries: the streaming plans from
chopin_spark.streaming executed end-to-end (file source → watermark →
windowed/session aggregation → availableNow drain into a memory sink)
and oracle-checked against the equivalent BATCH SQL in DuckDB.

Streaming==batch equivalence is the correctness contract Structured
Streaming gives for its aggregations: draining the whole input through
micro-batches must produce exactly the batch answer.  These four
queries put that contract under the driver's value-hash gate — tumbling
window, session window, window × grid cell (streaming par_grid), and
the custom applyInPandasWithState dedup operator (the pytest streaming
suite pins the same equivalences at other scales).

Scale shape: identical to the batch twins — the streaming plans add
watermark tracking and state-store exchange but aggregate on the same
keys; on a cluster the memory sink swaps for .toTable with a durable
checkpointLocation and the trigger for continuous micro-batches.
"""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark import streaming as S
from chopin_spark.queries import register
from chopin_spark.tables import load

_SEQ = itertools.count()


def _drain(df: DataFrame, prefix: str, spark: SparkSession) -> DataFrame:
    name = f"{prefix}_{next(_SEQ)}"
    ck = tempfile.mkdtemp(prefix="ck_stream_")
    try:
        S.run_available_now(df, name, ck)
    finally:
        # the checkpoint has no value after an availableNow drain into
        # a memory sink — repeated gate/bench runs would litter /tmp
        shutil.rmtree(ck, ignore_errors=True)
    return spark.table(name)


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream over the events table.  The glob keeps the
    resolved basePath a directory (a bare single-file path fails the
    file-stream source's basePath check)."""
    schema = load(spark, sf_dir, "events").schema
    return spark.readStream.schema(schema).parquet(f"{sf_dir}/events.parqu*")


_WINDOWED_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       ROUND(SUM(CAST(FLOOR((value) * 100 + 0.5) AS BIGINT)) / 100.0, 4) AS sum_value
FROM events
GROUP BY 1, 2
"""


@register("stream_windowed_hourly", _WINDOWED_ORACLE)
def stream_windowed_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming summarize_st (C7): readStream → 2 h watermark → 1 h
    tumbling window per event_type → availableNow memory sink.  The
    drained complete-mode result must equal the batch GROUP BY
    date_trunc — the oracle IS that batch query."""
    out = _drain(
        S.windowed_counts(_events_stream(spark, sf_dir)), "stream_wh", spark
    )
    return out.select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


_SESSION_GAP_S = 1800

_SESSION_ORACLE = f"""
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) >= {_SESSION_GAP_S}
                   OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM o
)
SELECT MIN(ts) AS session_start,
       MAX(ts) + INTERVAL {_SESSION_GAP_S} SECOND AS session_end,
       user_id,
       COUNT(*) AS n_events,
       ROUND(SUM(CAST(FLOOR((value) * 100 + 0.5) AS BIGINT)) / 100.0, 4) AS sum_value
FROM s
GROUP BY user_id, session_no
"""


@register("stream_session_windows", _SESSION_ORACLE)
def stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (30 min gap) per user via
    F.session_window — the dynamic-window counterpart of the tumbling
    C7 stream.  Oracle: batch gaps-and-islands over the same events
    (session_end = last event + gap, Spark's session-window end
    semantics; ties at exactly `gap` start a NEW session in both)."""
    out = _drain(
        S.sessionized_counts(_events_stream(spark, sf_dir)),
        "stream_sess",
        spark,
    )
    return out.select(
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "user_id",
        "n_events",
        "sum_value",
    )


# --- streaming par_grid: tumbling window × grid cell -------------------------

from chopin_spark import sqlexpr as sx  # noqa: E402

_SGX = sx.x_expr("event_id")
_SGY = sx.y_expr("event_id")
_SG_CELL = sx.grid_cell_expr(_SGX, _SGY, 16, 12)

_GRID_ORACLE = f"""
SELECT date_trunc('hour', ts) AS window_start,
       {_SG_CELL} AS cgridid,
       COUNT(*) AS n_events
FROM events
GROUP BY 1, 2
"""


@register("stream_grid_cells", _GRID_ORACLE)
def stream_grid_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming par_grid (SURVEY §2.1 applied to a stream): tumbling
    1 h window × regular-grid cell — chopin's partition scheme is a
    column expression, so it drops into the streaming plan unchanged
    (streaming.windowed_grid_counts).  Oracle = the batch rollup."""
    out = _drain(
        S.windowed_grid_counts(
            _events_stream(spark, sf_dir), cell_expr=_SG_CELL
        ),
        "stream_grid",
        spark,
    )
    return out.select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "cgridid",
        "n_events",
    )


# --- streaming stateful dedup (applyInPandasWithState) -----------------------

_SD_ORACLE = """
SELECT md5(text) AS text_md5,
       CAST(MIN(n_chars) AS STRING) AS n_chars
FROM documents
GROUP BY 1
"""


@register("stream_stateful_dedup", _SD_ORACLE)
def stream_stateful_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator under the driver gate:
    exactly-first-occurrence dedup across micro-batches via
    applyInPandasWithState (streaming.stateful_dedup), keyed on the
    content hash.  The carried column (n_chars) is functionally
    dependent on the key — identical text ⇒ identical length — so the
    emitted row is value-deterministic no matter which micro-batch or
    partition wins the race; the batch oracle is a plain GROUP BY."""
    schema = load(spark, sf_dir, "documents").schema
    st = (
        spark.readStream.schema(schema)
        .parquet(f"{sf_dir}/documents.parqu*")
        .withColumn("text_md5", F.md5("text"))
    )
    dd = S.stateful_dedup(st, "text_md5", ["n_chars"])
    name = f"stream_dedup_{next(_SEQ)}"
    ck = tempfile.mkdtemp(prefix="ck_stream_")
    try:
        S.run_available_now(dd, name, ck, output_mode="update")
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    return spark.table(name)


# --- stream-stream interval join (attribution) -------------------------------

_SSJOIN_ORACLE = """
SELECT v.user_id,
       COUNT(*) AS n_pairs,
       CAST(SUM(epoch_us(c.ts) - epoch_us(v.ts)) AS BIGINT) AS sum_lag_us,
       ROUND(CAST(SUM(epoch_us(c.ts) - epoch_us(v.ts)) AS DOUBLE)
             / (COUNT(*) * 1000000.0), 4) AS avg_lag_s
FROM events v
JOIN events c
  ON v.user_id = c.user_id
 AND v.event_type = 'view' AND c.event_type = 'click'
 AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
GROUP BY 1
"""


@register("stream_view_click_join", _SSJOIN_ORACLE)
def stream_view_click_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream interval join (view→click attribution within
    30 min per user), drained append-mode, then rolled up per user —
    streaming==batch join equivalence under the driver's value hash.
    Lag sums are exact integer microseconds."""
    ev = _events_stream(spark, sf_dir)  # ONE source; the two join
    # sides are filtered projections of it (self-join) — halves the
    # file scan vs instantiating the stream twice
    out = _drain_append(
        S.view_click_interval_join(ev, ev), "stream_ssj", spark
    )
    return out.groupBy(F.col("v_user").alias("user_id")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(
            F.unix_micros("c_ts") - F.unix_micros("v_ts")
        ).alias("sum_lag_us"),
        F.round(
            F.sum(F.unix_micros("c_ts") - F.unix_micros("v_ts")).cast(
                "double"
            )
            / (F.count(F.lit(1)) * F.lit(1000000.0)),
            4,
        ).alias("avg_lag_s"),
    )


def _drain_append(df: DataFrame, prefix: str, spark: SparkSession) -> DataFrame:
    name = f"{prefix}_{next(_SEQ)}"
    ck = tempfile.mkdtemp(prefix="ck_stream_")
    try:
        S.run_available_now(df, name, ck, output_mode="append")
    finally:
        shutil.rmtree(ck, ignore_errors=True)
    return spark.table(name)


_ENRICH_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start,
       c_mktsegment AS segment,
       COUNT(*) AS n_events,
       ROUND(SUM(CAST(FLOOR((value) * 100 + 0.5) AS BIGINT)) / 100.0, 4)
         AS sum_value
FROM events
JOIN customer ON c_custkey = user_id
GROUP BY 1, 2
"""


@register("stream_static_enrich", _ENRICH_ORACLE)
def stream_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the events stream broadcast-joined to
    the static customer dimension per micro-batch (stateless join —
    only the 1 h window agg keeps state), drained availableNow.  The
    oracle is the batch join + GROUP BY date_trunc twin."""
    dim = load(spark, sf_dir, "customer")
    out = _drain(
        S.static_enrich_windowed(_events_stream(spark, sf_dir), dim),
        "stream_se",
        spark,
    )
    return out.select(
        F.col("window_start").cast("timestamp_ntz").alias("window_start"),
        "segment",
        "n_events",
        "sum_value",
    )


# --- watermark late-data dropping (append mode) --------------------------------
#
# The one streaming semantic the drain-equals-batch queries above CANNOT
# exhibit: with out-of-order arrival, the watermark FINALIZES windows
# and late rows for finalized windows are DROPPED — streaming's answer
# differs from batch BY DESIGN, and the oracle must reproduce exactly
# which rows die.  Arrival order is engineered: the events table splits
# into three single-file micro-batches by event_id % 3 (mtime-ordered,
# maxFilesPerTrigger=1), so every batch spans the whole month and
# batches 2-3 are massively late.
#
# The cross-engine model (calibrated against the real engine, pinned by
# the value hash):
#   wm_filter(b) = max over batches <= b-2 of (max_event_time - W), 0-init
#     — the input-side late filter LAGS one batch behind the run
#       watermark (the offset-log commit cycle: batch b plans with the
#       watermark recorded at b-1's START);
#   a row is dropped iff its window end <= wm_filter(its batch);
#   a window is emitted iff its end <= final run watermark
#     (the availableNow no-data batch evicts with the full-stream wm).
#
# Scale shape: the streaming plan is the same keyed state-store agg as
# stream_windowed_hourly; the oracle adds one batch-dimension window
# (3 rows) over per-batch max timestamps.

_LATE_W_US = 12 * 3600 * 1000000
_LATE_HR_US = 3600 * 1000000
_LATE_LAYOUT_V = 1

_LATE_CACHE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".cache", "late_stream",
)
_LATE_MEMO: dict = {}


def _late_batches_dir(spark: SparkSession, sf_dir: str) -> str:
    """Three mtime-ordered single-file batches of the events table
    (event_id % 3), memoized per (app, sf_dir) with the snapshotq
    source-signature tag so a regenerated sf_dir never serves stale
    batches."""
    import glob
    import shutil

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _LATE_MEMO:
        return _LATE_MEMO[key]
    src = os.path.join(sf_dir, "events.parquet")
    st = os.stat(src)
    tag = (
        f"{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{int(st.st_mtime)}_{st.st_size}_v{_LATE_LAYOUT_V}"
    )
    d = os.path.join(_LATE_CACHE, tag)
    if not os.path.exists(os.path.join(d, "batch2.parquet")):
        os.makedirs(d, exist_ok=True)
        ev = load(spark, sf_dir, "events")
        for k in range(3):
            tmp = os.path.join(d, f"_tmp{k}")
            ev.filter(F.col("event_id") % 3 == k).coalesce(1).write.mode(
                "overwrite"
            ).parquet(tmp)
            part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
            dst = os.path.join(d, f"batch{k}.parquet")
            shutil.copy(part, dst)
            # file-stream sources order by (mtime, path): pin both
            os.utime(dst, (1700000000 + k * 100, 1700000000 + k * 100))
            shutil.rmtree(tmp)
    _LATE_MEMO[key] = d
    return d


_LATE_ORACLE = f"""
WITH ev AS (
  SELECT event_id % 3 AS b, epoch_us(ts) AS t,
         epoch_us(ts) - epoch_us(ts) % {_LATE_HR_US} AS ws,
         epoch_us(ts) - epoch_us(ts) % {_LATE_HR_US} + {_LATE_HR_US} AS we
  FROM events
),
bm AS (SELECT b, MAX(t) AS mt FROM ev GROUP BY 1),
wmx AS (
  SELECT b,
         COALESCE(MAX(mt - {_LATE_W_US}) OVER (
           ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND 2 PRECEDING
         ), 0) AS wm_filter,
         MAX(mt - {_LATE_W_US}) OVER (ORDER BY b) AS wm_run
  FROM bm
),
surv AS (
  SELECT ev.ws, ev.we FROM ev JOIN wmx ON wmx.b = ev.b
  WHERE NOT (ev.we <= wmx.wm_filter)
),
fin AS (SELECT MAX(wm_run) AS fw FROM wmx)
SELECT make_timestamp(ws) AS window_start, COUNT(*) AS n_events
FROM surv CROSS JOIN fin
WHERE we <= fw
GROUP BY 1
"""


@register("stream_watermark_late_drop", _LATE_ORACLE)
def stream_watermark_late_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode 1 h windowed counts under a 12 h watermark over the
    three engineered out-of-order micro-batches — late rows for
    finalized windows dropped, trailing windows withheld; the oracle
    replays the watermark recurrence row-for-row."""
    schema = load(spark, sf_dir, "events").schema
    d = _late_batches_dir(spark, sf_dir)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(os.path.join(d, "batch*.parquet"))
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    agg = (
        stream.withWatermark("ts", "12 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_events"))
    )
    out = _drain_append(agg, "stream_late", spark)
    return out.select(
        F.col("w.start").cast("timestamp_ntz").alias("window_start"),
        "n_events",
    )


# --- stream-stream LEFT OUTER interval join (abandonment) ---------------------
#
# The outer-join operator class: unmatched views surface as null-click
# rows once the watermark proves finality.  The drained stream is cut
# at the finality horizon: the terminal GLOBAL watermark is the MIN
# over both inputs' per-side max event time (each side advances its
# own watermark from ITS filtered rows — at small SF the click side's
# max ts can lag the view side's by hours), minus the 2 h delay; a
# view's null is flushed only once that passes v_ts + 30 min gap.  Cut
# = LEAST(max view ts, max click ts) − 3 h (2 h watermark + 30 min
# gap + 30 min margin) in BOTH engines — rows past the cut are
# legitimately withheld in the state store at end-of-stream, so
# streaming == batch only up to the horizon (that cut IS the
# semantics of an outer stream join; asserting anything later would
# be asserting unflushed state).

_SSOUTER_CUT = """
  SELECT LEAST(
           MAX(CASE WHEN event_type = 'view' THEN ts END),
           MAX(CASE WHEN event_type = 'click' THEN ts END)
         ) - INTERVAL 3 HOUR AS c
  FROM events
"""

_SSOUTER_ORACLE = f"""
WITH cut AS ({_SSOUTER_CUT}),
v AS (
  SELECT user_id, ts FROM events, cut
  WHERE event_type = 'view' AND ts <= cut.c
),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click'),
j AS (
  SELECT v.user_id, v.ts AS v_ts, c.ts AS c_ts
  FROM v LEFT JOIN c
    ON c.user_id = v.user_id
   AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 30 MINUTE
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CASE WHEN c_ts IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_abandoned,
       CAST(SUM(CASE WHEN c_ts IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_attributed
FROM j GROUP BY 1
"""


@register("stream_view_click_outer_join", _SSOUTER_ORACLE)
def stream_view_click_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream LEFT OUTER interval join drained append-mode:
    per-user attributed vs abandoned view counts, cut at the finality
    horizon (max ts − 3 h) in both engines."""
    ev = _events_stream(spark, sf_dir)
    out = _drain_append(
        S.view_click_left_outer_join(ev, ev), "stream_ssoj", spark
    )
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    cut = spark.sql(_SSOUTER_CUT)
    return (
        out.crossJoin(F.broadcast(cut))
        .filter(F.col("v_ts") <= F.col("c"))
        .groupBy(F.col("v_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(
                F.when(F.col("c_ts").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_abandoned"),
            F.sum(
                F.when(F.col("c_ts").isNotNull(), 1).otherwise(0)
            ).cast("long").alias("n_attributed"),
        )
    )
