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
),
-- deterministic tie-break on (ts, event_id): ARG_MAX(x, ts) alone
-- picks an ARBITRARY row among equal-ts clicks, while the engine's
-- asof_join(tie_col='event_id') always takes the max event_id
ranked AS (
  SELECT pu.event_id, pu.user_id, pu.ts,
         pu.value AS purchase_value,
         cl.event_id AS click_event_id,
         cl.value AS click_value,
         ROW_NUMBER() OVER (
           PARTITION BY pu.event_id
           ORDER BY cl.ts DESC NULLS LAST, cl.event_id DESC NULLS LAST
         ) AS rn
  FROM pu LEFT JOIN cl
    ON cl.user_id = pu.user_id AND cl.ts <= pu.ts
)
SELECT event_id, user_id, ts, purchase_value, click_event_id, click_value
FROM ranked WHERE rn = 1
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


# --- trajectory cell transitions (spatio-temporal movement analytics) --------

from chopin_spark import sqlexpr as _sx  # noqa: E402

_TCX = _sx.x_expr("event_id")
_TCY = _sx.y_expr("event_id")
_TCELL = _sx.grid_cell_expr(_TCX, _TCY, 16, 12)

_TRAJ_SQL = f"""
WITH pos AS (
  SELECT user_id, ts, event_id, {_TCELL} AS cell FROM events
),
seq AS (
  SELECT user_id, cell,
         LAG(cell) OVER (PARTITION BY user_id
                         ORDER BY ts, event_id) AS prev_cell
  FROM pos
)
SELECT prev_cell AS from_cell, cell AS to_cell,
       COUNT(*) AS n_transitions,
       COUNT(DISTINCT user_id) AS n_users
FROM seq
WHERE prev_cell IS NOT NULL AND prev_cell <> cell
GROUP BY 1, 2
"""


@register("trajectory_cell_transitions", _TRAJ_SQL)
def trajectory_cell_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Movement analytics over the partition grid: each user's events
    ordered by time become a trajectory of grid cells; the output is
    the cell-to-cell transition matrix (flow counts + distinct movers).
    One shuffle keyed by user (uniform), an in-partition sort, then a
    partial+final agg on the (from, to) pair — the OD-matrix shape
    that holds at 10^12 events.  Ties broken by event_id so the lag
    sequence is total-ordered in both engines."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_TRAJ_SQL)


# --- ordered funnel (view → signup → purchase) -------------------------------
#
# Event-sequence analytics: how many users complete each stage IN
# ORDER (a signup only counts after that user's first view; a purchase
# only after that ordered signup).  Expressed as three
# conditional-minimum passes — each is one agg on user_id plus one
# equi-join back, the combiner-friendly shape (no per-user sort, no
# window over the whole event stream; at 10^12 events each stage is a
# partial+final MIN on the already-bucketed user key).  Timestamps
# compare at native microsecond precision — no floats anywhere.

_FUNNEL_SQL = """
WITH u1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
),
u2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN u1 ON e.user_id = u1.user_id AND e.ts > u1.t1
  WHERE e.event_type = 'signup' GROUP BY 1
),
u3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN u2 ON e.user_id = u2.user_id AND e.ts > u2.t2
  WHERE e.event_type = 'purchase' GROUP BY 1
)
SELECT (SELECT COUNT(DISTINCT user_id) FROM events) AS n_users,
       (SELECT COUNT(*) FROM u1) AS n_view,
       (SELECT COUNT(*) FROM u2) AS n_view_signup,
       (SELECT COUNT(*) FROM u3) AS n_full_funnel,
       ROUND(CAST((SELECT COUNT(*) FROM u2) AS DOUBLE)
             / (SELECT COUNT(*) FROM u1), 4) AS conv_signup,
       ROUND(CAST((SELECT COUNT(*) FROM u3) AS DOUBLE)
             / (SELECT COUNT(*) FROM u2), 4) AS conv_purchase
"""


@register("funnel_view_signup_purchase", _FUNNEL_SQL)
def funnel_view_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel with per-stage conversion rates —
    shared SQL text both engines (see _FUNNEL_SQL)."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_FUNNEL_SQL)


# --- crawl-volume anomaly detection (integer-exact z-score flags) ------------
#
# Ops monitoring for a continuously-refreshed corpus: flag the days
# whose per-type event volume deviates > 2σ from that type's own
# history.  The FLAG is decided on a pure-integer inequality —
# (c·n − S)² > 4·(n·Q − S²), i.e. z² > 4 cleared of divisions — so the
# anomaly set is bit-reproducible at any partitioning; the reported z
# itself is one exact division + one correctly-rounded SQRT.  Scale
# shape: one (type, day) count agg (partial+final), one 5-row stats
# agg broadcast back, map-side flagging.

_ANOM_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events
  GROUP BY 1, 2
),
stats AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(c * c) AS BIGINT) AS q
  FROM daily GROUP BY 1
)
SELECT d.event_type, CAST(d.day AS STRING) AS day, d.c AS n_events,
       ROUND((d.c * st.n - st.s)
             / SQRT(CAST(st.n * st.q - st.s * st.s AS DOUBLE)),
             4) AS z
FROM daily d JOIN stats st ON st.event_type = d.event_type
WHERE (d.c * st.n - st.s) * (d.c * st.n - st.s)
      > 4 * (st.n * st.q - st.s * st.s)
"""


@register("event_volume_anomalies", _ANOM_SQL)
def event_volume_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days whose per-type volume is a >2σ outlier vs that type's own
    daily history — the crawl-health alarm a refresh pipeline watches.
    Flag decided integer-exactly; shared SQL text both engines."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_ANOM_SQL)


# --- cohort retention (the classic product-analytics triangle) ---------------
#
# Per acquisition cohort (a user's first-purchase day), how many of its
# users purchase again on each later day.  Deliberately window-free:
# two user-keyed aggregations plus one user-keyed join and a final
# (cohort, day) rollup — every stage is a partial+final agg on an
# already-bucketed key, the combiner-friendly shape that holds at
# 10^12 events (no per-user sort, unlike naive LAG formulations).
# date_trunc('day') and the terminal ratio are the only non-integer
# ops; ONE SQL text runs in both engines.

# CAST(... AS DATE) on both truncations: Spark's date_trunc returns
# TIMESTAMP while DuckDB 1.0's returns DATE — the explicit cast makes
# the shared text type-identical.  The OUTPUT day columns must then be
# CAST AS STRING: a projected DATE arrives as datetime.date from Spark
# but datetime64 from DuckDB's .df(), and the gate's type-faithful
# str() hash sees '2024-01-01' vs '2024-01-01 00:00:00' (the
# event_volume_anomalies discipline; caught by the round-4 full-gate
# sweep).
_COHORT_SQL = """
WITH u1 AS (
  SELECT user_id, CAST(date_trunc('day', MIN(ts)) AS DATE) AS cohort_day
  FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
  FROM events WHERE event_type = 'purchase'
),
cs AS (SELECT cohort_day, COUNT(*) AS cohort_size FROM u1 GROUP BY cohort_day),
j AS (
  SELECT u1.cohort_day, act.day, COUNT(*) AS n_active
  FROM u1 JOIN act USING (user_id) GROUP BY u1.cohort_day, act.day
)
SELECT CAST(j.cohort_day AS STRING) AS cohort_day,
       CAST(j.day AS STRING) AS day, j.n_active, cs.cohort_size,
       ROUND(j.n_active / CAST(cs.cohort_size AS DOUBLE), 4) AS retention
FROM j JOIN cs USING (cohort_day)
"""


@register("cohort_retention", _COHORT_SQL)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-cohort retention triangle (214 cells over 11 cohorts at
    sf0.01, retention spanning 0.09-1.0)."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_COHORT_SQL)


# --- last-touch channel attribution (horizon-bounded as-of + rollup) ----------

_ATTR_HORIZON_S = 7 * 86400
_ATTR_CHANNEL = (
    "(CASE CAST(click_event_id % 3 AS INT) WHEN 0 THEN 'organic'"
    " WHEN 1 THEN 'ads' ELSE 'email' END)"
)

_ATTR_ORACLE = f"""
WITH cl AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
),
pu AS (
  SELECT event_id, user_id, ts, value FROM events
  WHERE event_type = 'purchase'
),
ranked AS (
  SELECT pu.event_id, pu.value,
         cl.event_id AS click_event_id,
         cl.ts AS click_ts, pu.ts AS pts,
         ROW_NUMBER() OVER (
           PARTITION BY pu.event_id
           ORDER BY cl.ts DESC NULLS LAST, cl.event_id DESC NULLS LAST
         ) AS rn
  FROM pu LEFT JOIN cl
    ON cl.user_id = pu.user_id AND cl.ts <= pu.ts
),
attributed AS (
  SELECT value,
         CASE WHEN click_event_id IS NULL
                OR EPOCH(pts) - EPOCH(click_ts) > {_ATTR_HORIZON_S}
              THEN 'none' ELSE {_ATTR_CHANNEL} END AS channel
  FROM ranked WHERE rn = 1
)
SELECT channel,
       COUNT(*) AS n_purchases,
       ROUND(CAST(SUM({_sx.cents_expr('value')}) AS BIGINT) / 100.0, 4)
         AS revenue
FROM attributed
GROUP BY 1
"""


@register("attribution_last_touch", _ATTR_ORACLE)
def attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marketing-style last-touch attribution: each purchase credits
    the channel of the user's most recent prior click WITHIN a 7-day
    horizon (else 'none'), revenue rolled up per channel in exact
    cents.  Engine: the union-trick as-of join (one shuffle + one
    in-partition sort — never the oracle's per-key cross product),
    horizon applied as a post-filter on the attached state."""
    ev = load(spark, sf_dir, "events")
    facts = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value",
    )
    state = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id",
    )
    out = asof_join(
        facts, state,
        keys=["user_id"], ts_col="ts",
        state_cols=["event_id", "ts"], tie_col="event_id",
        prefix="click_",
    )
    attributed = out.selectExpr(
        "value",
        f"""CASE WHEN click_event_id IS NULL
                 OR unix_timestamp(ts) - unix_timestamp(click_ts)
                    > {_ATTR_HORIZON_S}
            THEN 'none' ELSE {_ATTR_CHANNEL} END AS channel""",
    )
    return attributed.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(
            F.sum(F.expr(_sx.cents_expr("value"))).cast("bigint") / 100.0, 4
        ).alias("revenue"),
    )


# --- trajectory bearing coherence (directional statistics, trig-free) ---------
#
# How DIRECTED is each user's movement?  Circular statistics' mean
# resultant length R = |Σ û| / n over the unit step vectors — but
# computed WITHOUT atan2/cos/sin (none of which are correctly-rounded
# across engines): the unit vector of a step is just (dx/len, dy/len),
# so R needs only +,−,×,÷,SQRT — all IEEE-exact, shared text.  R ≈ 1 =
# beeline, R ≈ 0 = random walk / loop.  Same user-keyed one-shuffle +
# in-partition-sort shape as trajectory_cell_transitions; the per-user
# double sums sit ~1e-14 from their true value vs a 1e-6 output grid.

_BEAR_SQL = f"""
WITH pts AS (
  SELECT user_id, ts, event_id,
         {_TCX} AS x, {_TCY} AS y
  FROM events
),
steps AS (
  SELECT user_id,
         x - LAG(x) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS dx,
         y - LAG(y) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id) AS dy
  FROM pts
),
unit AS (
  SELECT user_id,
         dx / SQRT(dx * dx + dy * dy) AS ux,
         dy / SQRT(dx * dx + dy * dy) AS uy
  FROM steps
  WHERE dx IS NOT NULL AND (dx <> 0.0 OR dy <> 0.0)
)
SELECT user_id,
       CAST(COUNT(*) AS BIGINT) AS n_steps,
       ROUND(SQRT(SUM(ux) * SUM(ux) + SUM(uy) * SUM(uy))
             / COUNT(*), 6) AS resultant_r
FROM unit
GROUP BY 1
"""


@register("trajectory_bearing_coherence", _BEAR_SQL)
def trajectory_bearing_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean resultant length of each user's step directions (circular
    statistics without transcendentals): R ≈ 1 directed travel, R ≈ 0
    random walk."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_BEAR_SQL)


# --- CUSUM change-point detection on daily event volumes -----------------------
#
# The sequential upgrade of event_volume_anomalies' 2σ rule: where did
# each event type's daily volume SHIFT?  The classic CUSUM argmax
# — k* = argmax_k |Σ_{i≤k}(c_i − mean)| — located with INTEGER-only
# arithmetic by scaling out the division: n·S_k = n·prefix_k − k·total
# (exact int64; days ≤ 31, counts ≤ fact size).  One window pass per
# type + a deterministic (stat DESC, day ASC) argmax.

_CUSUM_SQL = """
WITH daily AS (
  SELECT event_type, CAST(day(ts) AS BIGINT) AS d,
         CAST(COUNT(*) AS BIGINT) AS c
  FROM events WHERE month(ts) = 1
  GROUP BY 1, 2
),
w AS (
  SELECT event_type, d,
         SUM(c) OVER (PARTITION BY event_type ORDER BY d
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS pref,
         SUM(c) OVER (PARTITION BY event_type) AS tot,
         COUNT(*) OVER (PARTITION BY event_type) AS nd
  FROM daily
),
s AS (
  SELECT event_type, d,
         ABS(nd * pref - (ROW_NUMBER() OVER (PARTITION BY event_type
                                             ORDER BY d)) * tot)
           AS stat
  FROM w
),
rk AS (
  SELECT event_type, d, stat,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY stat DESC, d) AS rn
  FROM s
)
SELECT event_type, d AS changepoint_day, CAST(stat AS BIGINT) AS n_cusum
FROM rk WHERE rn = 1
"""


@register("cusum_volume_changepoint", _CUSUM_SQL)
def cusum_volume_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type, the day maximizing |CUSUM| of daily volume —
    integer-only via the n·S_k = n·prefix − k·total scaling."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_CUSUM_SQL)


# --- stay-point detection (trajectory mining) ---------------------------------
#
# The classic stay-point extraction (Li et al. 2008, GeoLife): split
# each user's time-ordered ping sequence wherever the jump to the
# previous ping exceeds a radius; maximal runs of near-stationary
# pings with >= 2 fixes are "stays".  Segment ids are a cumulative sum
# of break flags over the per-user window — one window pass, one
# grouped agg, both partitioned by user (trajectory-local at any
# scale; no user's data ever meets another's).

_STAY_R2 = 150000.0 * 150000.0   # 150 km break radius, squared

def _stay_sql(us_max: str, us_min: str) -> str:
    return f"""
WITH pos AS (
  SELECT user_id, ts, event_id, {_TCX} AS x, {_TCY} AS y FROM events
),
seq AS (
  SELECT user_id, ts, event_id, x, y,
         LAG(x) OVER w AS px, LAG(y) OVER w AS py
  FROM pos
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
flagged AS (
  SELECT user_id, ts, event_id, x, y,
         CASE WHEN px IS NULL
                OR (x - px) * (x - px) + (y - py) * (y - py) > {_STAY_R2!r}
              THEN 1 ELSE 0 END AS brk
  FROM seq
),
seg AS (
  SELECT user_id, ts, event_id, x, y,
         SUM(brk) OVER (PARTITION BY user_id
                        ORDER BY ts, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS seg_id
  FROM flagged
)
SELECT user_id, CAST(seg_id AS BIGINT) AS seg_id,
       CAST(COUNT(*) AS BIGINT) AS n_pings,
       MIN(event_id) AS first_event,
       CAST({us_max} - {us_min} AS BIGINT) AS dwell_us,
       ROUND(AVG(x), 4) AS cx, ROUND(AVG(y), 4) AS cy
FROM seg
GROUP BY 1, 2
HAVING COUNT(*) >= 2
"""


@register("trajectory_stay_points",
          _stay_sql("epoch_us(MAX(ts))", "epoch_us(MIN(ts))"))
def trajectory_stay_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stay-point extraction per user trajectory: radius-broken
    segments with >= 2 fixes, dwell time and centroid per stay —
    user-partitioned window + agg, zero cross-user traffic."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_stay_sql(
        "unix_micros(CAST(MAX(ts) AS TIMESTAMP))",
        "unix_micros(CAST(MIN(ts) AS TIMESTAMP))",
    ))


# --- Knox space-time interaction test ------------------------------------------
#
# THE epidemiology/event-analytics clustering test: do events close in
# space tend to also be close in time?  X = #pairs within (ds, dt) of
# each other vs the independence expectation S·T/N_pairs.  Every pair
# set is BOUNDED: space pairs via the 3×3-neighbor cell join (each
# event probes its 9 cells, so an unordered pair matches on exactly
# one probe row — counted once under id-order), time pairs via the
# same trick on 1D time bins (probe k−1, k, k+1); the total pair count
# is the n(n−1)/2 closed form — no all-pairs join anywhere.

_KNOX_DS = 30000.0                 # 30 km
# 12 h: the LCG fixture anti-correlates space and time (the minimum
# Δt among 30 km-close pairs is ~9.5 h), so a 6 h cutoff made
# pairs_both STRUCTURALLY zero and the Knox ratio degenerate at every
# scale — caught by the brute-force numpy replay test; at 12 h the
# gate fixture yields ~5k joint pairs
_KNOX_DT_US = 12 * 3600 * 1000000  # 12 h in µs
# cell width == the space cutoff: the 3×3 probe is complete at any
# cell >= ds, and ds-sized cells minimize candidate density (a 50 km
# cell carried 2.6× the candidates for the same 30 km answer)
_KNOX_CW = _KNOX_DS
_KNOX_CH = _KNOX_DS


def _knox_sql(us: str, hint: str = "") -> str:
    # hint: Spark passes /*+ REPARTITION(n) */ on evt — the probe side
    # of both pair joins derives from it, and without the shuffle a
    # single small parquet file scans as ONE task that then evaluates
    # every candidate pair alone against the broadcast build side
    # (measured 27 s -> ~2 s at sf0.1).  DuckDB gets no hint: its
    # morsel scheduler parallelizes the scan itself.
    ds2 = _KNOX_DS * _KNOX_DS
    return f"""
WITH ev AS (
  SELECT event_id, {_TCX} AS x, {_TCY} AS y,
         CAST({us} AS BIGINT) AS t,
         CAST(FLOOR({_TCX} / {_KNOX_CW!r}) AS BIGINT) AS cx,
         CAST(FLOOR({_TCY} / {_KNOX_CH!r}) AS BIGINT) AS cy
  FROM events
),
evt AS (
  SELECT {hint} ev.*, CAST(FLOOR(t / {_KNOX_DT_US}.0) AS BIGINT) AS tb
  FROM ev
),
sprobe AS (
  SELECT e.event_id, e.x, e.y, e.t, e.cx + o.dx AS pcx, e.cy + o.dy AS pcy
  FROM evt e CROSS JOIN (
    VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)
  ) AS o(dx, dy)
),
spairs AS (
  SELECT COUNT(*) AS s,
         SUM(CASE WHEN ABS(a.t - b.t) < {_KNOX_DT_US}
                  THEN 1 ELSE 0 END) AS st
  FROM sprobe a JOIN evt b
    ON a.pcx = b.cx AND a.pcy = b.cy AND a.event_id < b.event_id
  WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) < {ds2!r}
),
tprobe AS (
  SELECT e.event_id, e.t, e.tb + o.db AS ptb
  FROM evt e CROSS JOIN (VALUES (-1), (0), (1)) AS o(db)
),
tpairs AS (
  SELECT COUNT(*) AS t
  FROM tprobe a JOIN evt b
    ON a.ptb = b.tb AND a.event_id < b.event_id
  WHERE ABS(a.t - b.t) < {_KNOX_DT_US}
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM evt)
SELECT n.n AS n_events,
       n.n * (n.n - 1) / 2 AS n_pairs,
       CAST(spairs.s AS BIGINT) AS pairs_space,
       CAST(tpairs.t AS BIGINT) AS pairs_time,
       CAST(spairs.st AS BIGINT) AS pairs_both,
       CAST(FLOOR(CAST(spairs.st AS DOUBLE) * (n.n * (n.n - 1) / 2)
                  / spairs.s / tpairs.t * 1000000 + 0.5) AS BIGINT)
         AS knox_ratio_micro
FROM n CROSS JOIN spairs CROSS JOIN tpairs
"""


@register(
    "knox_space_time",
    _knox_sql("epoch_us(ts)"),
)
def knox_space_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Knox space-time interaction: observed (ds, dt)-close pair count
    vs the independence expectation — pair sets bounded by cell /
    time-bin probes, total pairs in closed form.  The space-time count
    is a conditional SUM inside the spatial pair join (pairs_both ⊆
    pairs_space), so the expensive join runs once, not twice."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_knox_sql(
        "unix_micros(CAST(ts AS TIMESTAMP))",
        hint="/*+ REPARTITION(64) */",
    ))


# --- rolling 7-day user volume (RANGE-frame window) ---------------------------
#
# The one window-frame shape the registry lacked: a RANGE frame over a
# numeric ORDER BY key (epoch days), so gaps in activity are handled by
# VALUE distance, not row count — ROWS BETWEEN 6 PRECEDING would be
# wrong across quiet days.  Day keys are exact integers (the µs→day
# floor can never flip: the quotient's distance from an integer is
# ≥ 1/86400e6, far above the double ulp), and the windowed sums are
# int64 — the whole query is deterministic at any partitioning.
#
# Scale shape: the raw scan folds to (user, day) BEFORE the window, so
# the sort frame is activity-span sized per user, not event sized.


def _roll7_sql(epoch_us: str) -> str:
    return f"""
WITH d AS (
  SELECT user_id,
         CAST(FLOOR(CAST({epoch_us} AS DOUBLE) / 86400000000.0) AS BIGINT)
           AS day,
         CAST(FLOOR((value) * 100 + 0.5) AS BIGINT) AS cents
  FROM events
),
g AS (
  SELECT user_id, day, COUNT(*) AS n_events,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM d GROUP BY 1, 2
)
SELECT user_id, day, n_events,
       CAST(SUM(n_events) OVER (PARTITION BY user_id ORDER BY day
              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_7day,
       ROUND(CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY day
              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
             / 100.0, 2) AS value_7day
FROM g
"""


@register("rolling_7day_user_volume", _roll7_sql("epoch_us(ts)"))
def rolling_7day_user_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 7-day event count and value over daily
    pre-aggregates — the RANGE-frame (value-distance) window shape."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_roll7_sql("unix_micros(CAST(ts AS TIMESTAMP))"))


# --- space-time kernel density (STKDE) -----------------------------------------
#
# The smoothed intensity surface over (x, y, t) — the density
# companion of the Knox interaction test: at each of 288 space-time
# nodes (8×6 grid × 6 five-day bins), the sum of separable Gaussian
# kernel products over events within the space/time cutoffs.  Both
# kernel factors quantize to the 2^12 lattice BEFORE the product, so
# every node's sum is exact int64; the time axis is anchored to the
# corpus MIN day (one scalar agg), not a hard-coded epoch.
#
# Scale shape: the node table is metadata-sized → broadcast
# nested-loop against the event scan with both cutoffs as residuals,
# then one 288-key hash-agg; at denser node grids the same query
# switches to the cell-stencil equi-join (huff_gravity_share pattern).

_STK_HS = 60_000.0   # spatial bandwidth (m)
_STK_RS = 150_000.0  # spatial cutoff
_STK_HT = 2.5        # temporal bandwidth (days)
_STK_RT = 5.0        # temporal cutoff
_STK_NX, _STK_NY, _STK_NT = 8, 6, 6


def _stkde_sql(epoch_us: str, gen3: str) -> str:
    cw = 800_000.0 / _STK_NX
    ch = 600_000.0 / _STK_NY
    return f"""
WITH ev AS (
  SELECT {_sx.x_expr('event_id')} AS x, {_sx.y_expr('event_id')} AS y,
         CAST(FLOOR(CAST({epoch_us} AS DOUBLE) / 86400000000.0) AS BIGINT)
           AS day
  FROM events
),
d0 AS (SELECT MIN(day) AS d0 FROM ev),
nodes AS (
  SELECT gi, gj, tb,
         (gi + 0.5) * {cw!r} AS cx,
         (gj + 0.5) * {ch!r} AS cy,
         2.5 + 5.0 * tb AS tc
  FROM {gen3}
),
pairs AS (
  SELECT n.gi, n.gj, n.tb,
         CAST(FLOOR(4096 * EXP(-((e.x - n.cx) * (e.x - n.cx)
                                 + (e.y - n.cy) * (e.y - n.cy))
                               / {2.0 * _STK_HS * _STK_HS!r}) + 0.5)
              AS BIGINT)
         * CAST(FLOOR(4096 * EXP(-((e.day - d0.d0 + 0.5) - n.tc)
                                  * ((e.day - d0.d0 + 0.5) - n.tc)
                                / {2.0 * _STK_HT * _STK_HT!r}) + 0.5)
                AS BIGINT) AS w
  FROM ev e CROSS JOIN d0 CROSS JOIN nodes n
  WHERE (e.x - n.cx) * (e.x - n.cx) + (e.y - n.cy) * (e.y - n.cy)
          <= {_STK_RS * _STK_RS!r}
    AND ABS((e.day - d0.d0 + 0.5) - n.tc) <= {_STK_RT!r}
)
SELECT gi, gj, tb, COUNT(*) AS n_within,
       ROUND(CAST(SUM(w) AS DOUBLE) / (4096.0 * 4096.0), 4) AS intensity
FROM pairs
GROUP BY 1, 2, 3
"""


_STK_GEN_SPARK = f"""(
  SELECT gi, gj, tb
  FROM (SELECT explode(sequence(0, {_STK_NX - 1})) AS gi)
  CROSS JOIN (SELECT explode(sequence(0, {_STK_NY - 1})) AS gj)
  CROSS JOIN (SELECT explode(sequence(0, {_STK_NT - 1})) AS tb)
) g"""

_STK_GEN_DUCK = f"""(
  SELECT g1.gi, g2.gj, g3.tb
  FROM generate_series(0, {_STK_NX - 1}) AS g1(gi),
       generate_series(0, {_STK_NY - 1}) AS g2(gj),
       generate_series(0, {_STK_NT - 1}) AS g3(tb)
) g"""


def _stkde_spark_stencil(epoch_us: str, gen3: str) -> str:
    """The engine-side plan: the node table explodes to its exact cell
    stencil and equi-joins the event scan on (cell_x, cell_y, time_bin)
    instead of the broadcast nested-loop with residual cutoffs (guide
    §3: avoid exploding joins; the huff_gravity_share pattern the
    module header already names as the dense-grid switch).

    Stencil exactness (cells are cw=100 km, ch=100 km, 5-day bins):
    * spatial: a pair passing the cutoff has |x-cx| ≤ 150 km = 1.5·cw,
      so x/cw ∈ [gi+0.5−1.5, gi+0.5+1.5] and FLOOR(x/cw) ∈
      {gi−1..gi+2} ⊂ the ±2 stencil (same for y);
    * temporal: |((day−d0)+0.5) − (2.5+5·tb)| ≤ 5 gives day−d0 ∈
      [5·tb−3, 5·tb+7], so FLOOR((day−d0)/5) ∈ {tb−1, tb, tb+1}.
    Every surviving pair therefore appears in exactly one stencil row
    (the offsets address distinct cells), and the UNCHANGED residual
    cutoffs drop the stencil's false candidates — the pair set, kernel
    arithmetic, and aggregation are identical to the oracle's.  28.8M
    nested-loop filter evaluations become ~5M hash probes.
    """
    cw = 800_000.0 / _STK_NX
    ch = 600_000.0 / _STK_NY
    return f"""
WITH ev AS (
  SELECT {_sx.x_expr('event_id')} AS x, {_sx.y_expr('event_id')} AS y,
         CAST(FLOOR(CAST({epoch_us} AS DOUBLE) / 86400000000.0) AS BIGINT)
           AS day
  FROM events
),
d0 AS (SELECT MIN(day) AS d0 FROM ev),
nodes AS (
  SELECT gi, gj, tb,
         (gi + 0.5) * {cw!r} AS cx,
         (gj + 0.5) * {ch!r} AS cy,
         2.5 + 5.0 * tb AS tc
  FROM {gen3}
),
stencil AS (
  SELECT n.gi, n.gj, n.tb, n.cx, n.cy, n.tc,
         n.gi + di AS ci, n.gj + dj AS cj, n.tb + dt AS ub
  FROM nodes n
  CROSS JOIN (SELECT explode(sequence(-2, 2)) AS di)
  CROSS JOIN (SELECT explode(sequence(-2, 2)) AS dj)
  CROSS JOIN (SELECT explode(sequence(-1, 1)) AS dt)
),
evk AS (
  SELECT e.x, e.y, e.day, d0.d0,
         CAST(FLOOR(e.x / {cw!r}) AS BIGINT) AS ci,
         CAST(FLOOR(e.y / {ch!r}) AS BIGINT) AS cj,
         CAST(FLOOR((e.day - d0.d0) / 5.0) AS BIGINT) AS ub
  FROM ev e CROSS JOIN d0
),
pairs AS (
  SELECT s.gi, s.gj, s.tb,
         CAST(FLOOR(4096 * EXP(-((e.x - s.cx) * (e.x - s.cx)
                                 + (e.y - s.cy) * (e.y - s.cy))
                               / {2.0 * _STK_HS * _STK_HS!r}) + 0.5)
              AS BIGINT)
         * CAST(FLOOR(4096 * EXP(-((e.day - e.d0 + 0.5) - s.tc)
                                  * ((e.day - e.d0 + 0.5) - s.tc)
                                / {2.0 * _STK_HT * _STK_HT!r}) + 0.5)
                AS BIGINT) AS w
  FROM evk e JOIN stencil s
    ON s.ci = e.ci AND s.cj = e.cj AND s.ub = e.ub
  WHERE (e.x - s.cx) * (e.x - s.cx) + (e.y - s.cy) * (e.y - s.cy)
          <= {_STK_RS * _STK_RS!r}
    AND ABS((e.day - e.d0 + 0.5) - s.tc) <= {_STK_RT!r}
)
SELECT gi, gj, tb, COUNT(*) AS n_within,
       ROUND(CAST(SUM(w) AS DOUBLE) / (4096.0 * 4096.0), 4) AS intensity
FROM pairs
GROUP BY 1, 2, 3
"""


@register(
    "stkde_events",
    _stkde_sql("epoch_us(ts)", _STK_GEN_DUCK),
)
def stkde_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Space-time kernel density of the event pattern at 288 nodes —
    separable Gaussian kernels on the 2^12 lattice, exact int64 node
    sums, min-day anchored time axis.  Engine plan: exact cell-stencil
    equi-join (see _stkde_spark_stencil) instead of the 288×n
    broadcast nested-loop; the oracle keeps the brute-force form."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(
        _stkde_spark_stencil(
            "unix_micros(CAST(ts AS TIMESTAMP))", _STK_GEN_SPARK
        )
    )


# --- human-mobility battery: OD matrix, predictability, burstiness, gyration ---
#
# The trajectory-mining quartet every movement study computes from a
# geocoded event stream (González/Barabási lineage): the cell-to-cell
# origin–destination matrix, per-user transition entropy ("limits of
# predictability"), Goh–Barabási inter-event burstiness, and radius of
# gyration.  All carriers are exact int64 (counts, second-quantized
# gaps, metre-quantized coords); LN/SQRT appear only in final ROUNDed
# columns.  Scale shape: one per-user window pass (trajectory-local)
# + one vocabulary-bounded agg each — no pair joins anywhere.

_MOB_SEQ = f"""
seq AS (
  SELECT user_id, {_TCELL} AS cell,
         LAG({_TCELL}) OVER (PARTITION BY user_id
                             ORDER BY ts, event_id) AS prev
  FROM events
)"""

_MOBH_SQL = f"""
WITH {_MOB_SEQ.strip()},
t AS (
  SELECT user_id, prev, cell, CAST(COUNT(*) AS BIGINT) AS c
  FROM seq WHERE prev IS NOT NULL
  GROUP BY 1, 2, 3
),
u AS (
  SELECT user_id, CAST(SUM(c) AS BIGINT) AS tot,
         CAST(COUNT(*) AS BIGINT) AS n_od,
         SUM(CAST(c AS DOUBLE) * LN(CAST(c AS DOUBLE))) AS s
  FROM t GROUP BY 1
)
SELECT user_id, tot AS n_moves, n_od AS n_distinct_od,
       ROUND(LN(CAST(tot AS DOUBLE)) - s / tot, 4) AS transition_entropy
FROM u
"""


@register("mobility_entropy_users", _MOBH_SQL)
def mobility_entropy_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user transition (first-order mobility) entropy over cell
    moves — H = ln(tot) − Σc·ln(c)/tot with exact integer counts
    (same LN error budget as host_token_entropy)."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_MOBH_SQL)


def _burst_sql(epoch_us: str) -> str:
    return f"""
WITH es AS (
  SELECT user_id,
         CAST(FLOOR(CAST({epoch_us} AS DOUBLE) / 1000000.0) AS BIGINT)
           AS sec,
         event_id
  FROM events
),
gaps AS (
  SELECT user_id,
         sec - LAG(sec) OVER (PARTITION BY user_id
                              ORDER BY sec, event_id) AS g
  FROM es
),
agg AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(g) AS BIGINT) AS s,
         CAST(SUM(g * g) AS BIGINT) AS s2
  FROM gaps WHERE g IS NOT NULL
  GROUP BY 1
)
SELECT user_id, n AS n_gaps,
       ROUND(CAST(s AS DOUBLE) / n, 2) AS mean_gap_s,
       ROUND((SQRT(CAST(n * s2 - s * s AS DOUBLE)) - s)
             / (SQRT(CAST(n * s2 - s * s AS DOUBLE)) + s), 4) AS burstiness
FROM agg
WHERE n >= 2 AND s > 0
"""


@register("interevent_burstiness", _burst_sql("epoch_us(ts)"))
def interevent_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goh–Barabási burstiness B = (σ−μ)/(σ+μ) of per-user
    inter-event gaps (second-quantized): σ, μ scaled by n so the
    radicand n·Σg²−S² is exact int64.  B → −1 periodic, 0 Poisson,
    → 1 bursty."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_burst_sql("unix_micros(CAST(ts AS TIMESTAMP))"))


_GYR_SQL = f"""
WITH pts AS (
  SELECT user_id,
         CAST(FLOOR({_TCX} + 0.5) AS BIGINT) AS xm,
         CAST(FLOOR({_TCY} + 0.5) AS BIGINT) AS ym
  FROM events
),
agg AS (
  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xm) AS BIGINT) AS sx, CAST(SUM(ym) AS BIGINT) AS sy,
         CAST(SUM(xm * xm + ym * ym) AS BIGINT) AS s2
  FROM pts GROUP BY 1
)
SELECT user_id, n AS n_pings,
       ROUND(SQRT(CAST(n * s2 - sx * sx - sy * sy AS DOUBLE)) / n, 2)
         AS rg_m
FROM agg WHERE n >= 2
"""


@register("radius_of_gyration_users", _GYR_SQL)
def radius_of_gyration_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Radius of gyration per user from metre-quantized coordinates:
    n²·r² = n·Σ(x²+y²) − Sx² − Sy², exact int64 under the radical."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_GYR_SQL)


# --- difference-in-differences (causal effect estimation) ----------------------
#
# The workhorse of observational causal inference (Card & Krueger
# shape): a "treatment" rolls out to half the users on Jan 16 (users
# with even user_id — the deterministic cohort), and the estimand is
# the treatment effect on purchase value under parallel trends:
# DiD = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre).
#
# Exactness: values carry as exact integer cents, each cell mean is
# one cents/count division, and the estimator is a fixed-order chain
# of four such doubles — bit-identical cross-engine, ROUND once.
# Scale shape: ONE scan, one 4-cell agg (partial+final), driver-free.

_DID_SQL = """
WITH cells AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END AS treated,
         CASE WHEN day(ts) >= 16 THEN 1 ELSE 0 END AS post,
         CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
           AS cents,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events
  WHERE event_type = 'purchase' AND month(ts) = 1
  GROUP BY 1, 2
),
m AS (
  SELECT treated, post, cents, n,
         CAST(cents AS DOUBLE) / n / 100.0 AS mean_value
  FROM cells
)
SELECT ROUND(a.mean_value - b.mean_value - c.mean_value + d.mean_value,
             6) AS did_effect,
       ROUND(a.mean_value, 6) AS treat_post,
       ROUND(b.mean_value, 6) AS treat_pre,
       ROUND(c.mean_value, 6) AS ctrl_post,
       ROUND(d.mean_value, 6) AS ctrl_pre,
       a.n AS n_treat_post, b.n AS n_treat_pre,
       c.n AS n_ctrl_post, d.n AS n_ctrl_pre
FROM m a, m b, m c, m d
WHERE a.treated = 1 AND a.post = 1 AND b.treated = 1 AND b.post = 0
  AND c.treated = 0 AND c.post = 1 AND d.treated = 0 AND d.post = 0
"""


@register("did_purchase_effect", _DID_SQL)
def did_purchase_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences estimate of the Jan-16 rollout's
    effect on purchase value (even-user treatment cohort): four
    cents-exact cell means, one scan, one agg."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_DID_SQL)


# --- CUPED variance-reduced experiment readout (Deng et al. WSDM 2013) ---------
#
# The industry-standard pre-period adjustment beside the DiD estimator
# above: users split by parity (the same synthetic assignment rule as
# did_purchase_effect), metric Y = second-half purchase count,
# covariate X = first-half total event count; theta = cov(X,Y)/var(X)
# pooled, effect_cuped = effect_raw - theta * (pre-period imbalance),
# variance reduction = R^2 = cov^2/(varX*varY).
#
# Exactness: counts are int64; every moment (n, SX, SY, SXY, SXX, SYY
# and per-arm sums) is an exact integer, so theta / effects / R^2 are
# single correctly-rounded double expressions over exact carriers —
# no per-user doubles are ever summed.  Scale: one groupBy user (fact
# shuffle), then moments fold to ONE row; arms are a broadcast CASE.

_CUPED_BODY = """
u AS (
  SELECT user_id, CAST(user_id % 2 AS BIGINT) AS arm,
         CAST(SUM(CASE WHEN day(ts) <= 15 THEN 1 ELSE 0 END) AS BIGINT)
           AS x,
         CAST(SUM(CASE WHEN day(ts) > 15
                        AND event_type = 'purchase'
                       THEN 1 ELSE 0 END) AS BIGINT) AS y
  FROM events WHERE month(ts) = 1
  GROUP BY 1, 2
),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy,
         CAST(SUM(x * x) AS BIGINT) AS sxx,
         CAST(SUM(y * y) AS BIGINT) AS syy
  FROM u
),
arms AS (
  SELECT CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(SUM(CASE WHEN arm = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1,
         CAST(SUM(CASE WHEN arm = 0 THEN y ELSE 0 END) AS BIGINT) AS sy0,
         CAST(SUM(CASE WHEN arm = 1 THEN x ELSE 0 END) AS BIGINT) AS sx1,
         CAST(SUM(CASE WHEN arm = 0 THEN x ELSE 0 END) AS BIGINT) AS sx0
  FROM u
)
SELECT m.n AS n_users,
       ROUND((CAST(m.n AS DOUBLE) * m.sxy - CAST(m.sx AS DOUBLE) * m.sy)
             / (CAST(m.n AS DOUBLE) * m.sxx
                - CAST(m.sx AS DOUBLE) * m.sx), 6) AS theta,
       ROUND(CAST(a.sy1 AS DOUBLE) / a.n1
             - CAST(a.sy0 AS DOUBLE) / a.n0, 6) AS effect_raw,
       ROUND(CAST(a.sy1 AS DOUBLE) / a.n1
             - CAST(a.sy0 AS DOUBLE) / a.n0
             - ((CAST(m.n AS DOUBLE) * m.sxy
                 - CAST(m.sx AS DOUBLE) * m.sy)
                / (CAST(m.n AS DOUBLE) * m.sxx
                   - CAST(m.sx AS DOUBLE) * m.sx))
               * (CAST(a.sx1 AS DOUBLE) / a.n1
                  - CAST(a.sx0 AS DOUBLE) / a.n0), 6) AS effect_cuped,
       ROUND(POWER(CAST(m.n AS DOUBLE) * m.sxy
                   - CAST(m.sx AS DOUBLE) * m.sy, 2)
             / ((CAST(m.n AS DOUBLE) * m.sxx
                 - CAST(m.sx AS DOUBLE) * m.sx)
                * (CAST(m.n AS DOUBLE) * m.syy
                   - CAST(m.sy AS DOUBLE) * m.sy)), 6)
         AS variance_reduction
FROM mom m CROSS JOIN arms a
"""

_CUPED_SQL = f"WITH {_CUPED_BODY.strip()}"


@register("cuped_adjusted_effect", _CUPED_SQL)
def cuped_adjusted_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED pre-period covariate adjustment of the parity-split
    purchase experiment: theta, raw vs adjusted effect, and the R^2
    variance reduction — all from exact int64 moments."""
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(_CUPED_SQL)


# --- Markov-chain attribution with removal effects -----------------------------
#
# The model-based counterpart of attribution_last_touch (Anderl et al.
# 2016, "Mapping the customer journey" — the standard data-driven
# attribution): user journeys (split at each purchase) become a
# first-order Markov chain over states {start, view, click, signup,
# error} with absorbers {conv, end}; a channel's credit is its REMOVAL
# EFFECT — how much the start→conv absorption probability drops when
# every path through that channel is failed.
#
# Absorption probabilities come from VALUE ITERATION, 12 rounds, all
# five variants (base + 4 removals) carried as 25 columns of ONE row:
# x_{k+1}(s) = Σ_t p(s,t)·x_k(t) + p(s,conv), with x(c) pinned to 0 in
# variant rm-c.  Transition probabilities are exact-int count ratios,
# each round a fixed double expression tree — bit-identical across
# engines regardless of convergence, so 12 rounds need no epsilon
# argument (the simplifyq/graphq unrolled-fixpoint discipline).  Rounds
# materialize (DuckDB: MATERIALIZED CTEs; Spark: per-round checkpointed
# one-row views) because each round references the previous ~6× —
# inlined, that is a 6^12 expression tree.
#
# Scale shape: the fact-sized work is ONE window pass (journey split +
# LEAD) and one (from,to) count shuffle — 30 cells; everything after is
# arithmetic on a single row.  At 100 TB the chain fit costs the same
# two shuffles; only the sessionize window grows.

_MK_STATES = [("s", "start"), ("v", "view"), ("c", "click"),
              ("g", "signup"), ("e", "error")]
_MK_TOS = [("v", "view"), ("c", "click"), ("g", "signup"),
           ("e", "error"), ("y", "conv")]
_MK_VARIANTS = [("b", None), ("rv", "v"), ("rc", "c"),
                ("rg", "g"), ("re", "e")]
_MK_ROUNDS = 12

_MK_TRANS = """
  SELECT user_id, ts, event_id, event_type,
         COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING), 0) AS j
  FROM events
"""

_MK_STEP = """
  SELECT user_id, j, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id, j
                                ORDER BY ts, event_id) AS nxt,
         ROW_NUMBER() OVER (PARTITION BY user_id, j
                            ORDER BY ts, event_id) AS rn
  FROM mk_ev
"""

_MK_CNT = """
  SELECT f, t, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT 'start' AS f,
           CASE WHEN event_type = 'purchase' THEN 'conv'
                ELSE event_type END AS t
    FROM mk_step WHERE rn = 1
    UNION ALL
    SELECT event_type AS f,
           CASE WHEN nxt IS NULL THEN 'end'
                WHEN nxt = 'purchase' THEN 'conv' ELSE nxt END AS t
    FROM mk_step WHERE event_type <> 'purchase'
  ) u GROUP BY f, t
"""

_MK_PROW = "  SELECT\n    " + ",\n    ".join(
    f"CAST(SUM(CASE WHEN f = '{fn}' AND t = '{tn}' THEN c ELSE 0 END)"
    f" AS DOUBLE)"
    f" / GREATEST(SUM(CASE WHEN f = '{fn}' THEN c ELSE 0 END), 1)"
    f" AS p_{fc}_{tc}"
    for fc, fn in _MK_STATES for tc, tn in _MK_TOS
) + "\n  FROM mk_cnt"

_MK_X0 = "  SELECT " + ", ".join(
    f"CAST(0.0 AS DOUBLE) AS x_{m}_{fc}"
    for m, _ in _MK_VARIANTS for fc, _ in _MK_STATES
)


def _mk_round_exprs() -> str:
    cols = []
    for m, removed in _MK_VARIANTS:
        for fc, _ in _MK_STATES:
            if removed is not None and fc == removed:
                cols.append(f"CAST(0.0 AS DOUBLE) AS x_{m}_{fc}")
                continue
            terms = [f"p_{fc}_y"]
            terms += [
                f"p_{fc}_{tc} * x_{m}_{tc}"
                for tc, _ in _MK_TOS[:4] if tc != removed
            ]
            cols.append("(" + " + ".join(terms) + f") AS x_{m}_{fc}")
    return "  SELECT " + ",\n         ".join(cols)


_MK_FINAL = "\nUNION ALL\n".join(
    f"SELECT '{_MK_TOS[i][1]}' AS channel,"
    f" ROUND(x_b_s, 6) AS base_conv,"
    f" ROUND(x_{m}_s, 6) AS removal_conv,"
    f" ROUND(1.0 - x_{m}_s / x_b_s, 6) AS removal_effect,"
    f" ROUND((1.0 - x_{m}_s / x_b_s) / "
    "((1.0 - x_rv_s / x_b_s) + (1.0 - x_rc_s / x_b_s)"
    " + (1.0 - x_rg_s / x_b_s) + (1.0 - x_re_s / x_b_s)), 6)"
    f" AS attribution_share"
    f" FROM mk_x_{_MK_ROUNDS}"
    for i, (m, _) in enumerate(_MK_VARIANTS[1:])
)


def _mk_oracle() -> str:
    ctes = [
        f"mk_ev AS MATERIALIZED ({_MK_TRANS})",
        f"mk_step AS MATERIALIZED ({_MK_STEP})",
        f"mk_cnt AS MATERIALIZED ({_MK_CNT})",
        f"mk_prow AS MATERIALIZED ({_MK_PROW})",
        f"mk_x_0 AS MATERIALIZED ({_MK_X0})",
    ]
    for r in range(1, _MK_ROUNDS + 1):
        ctes.append(
            f"mk_x_{r} AS MATERIALIZED"
            f" ({_mk_round_exprs()}\n  FROM mk_prow, mk_x_{r - 1})"
        )
    return "WITH " + ",\n".join(ctes) + "\n" + _MK_FINAL


@register("attribution_markov_removal", _mk_oracle())
def attribution_markov_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven channel attribution: first-order Markov journey
    chain (journeys split at purchases), absorption probability via 12
    value-iteration rounds, credit = per-channel removal effect,
    normalized to attribution shares."""
    from chopin_spark.tables import load

    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    spark.sql(_MK_TRANS).createOrReplaceTempView("mk_ev")
    spark.sql(_MK_STEP).createOrReplaceTempView("mk_step")
    spark.sql(_MK_CNT).localCheckpoint().createOrReplaceTempView("mk_cnt")
    spark.sql(_MK_PROW).localCheckpoint().createOrReplaceTempView("mk_prow")
    spark.sql(_MK_X0).createOrReplaceTempView("mk_x_0")
    for r in range(1, _MK_ROUNDS + 1):
        spark.sql(
            f"{_mk_round_exprs()}\n  FROM mk_prow CROSS JOIN mk_x_{r - 1}"
        ).localCheckpoint().createOrReplaceTempView(f"mk_x_{r}")
    return spark.sql(_MK_FINAL)
