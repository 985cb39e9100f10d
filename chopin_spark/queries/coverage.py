"""Coverage-widening queries: P3 skew coalescing, P8/P1 grid-table WKT
materialization, P9 clip extent, JSON props, window functions, and two
more multi-join relational shapes (SURVEY.md §2.5 rows)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chopin_spark import EXTENT, sqlexpr as sx
from chopin_spark.queries import register
from chopin_spark.tables import load

_X = sx.x_expr("doc_id")
_Y = sx.y_expr("doc_id")


# --- P3 par_merge_grid: deterministic coalescing of under-filled cells ------
#
# chopin merges under-threshold cells with spatial neighbors
# (/root/reference/R/gridding.R:558-766). The oracle-expressible variant
# merges to the quad PARENT cell (always spatially contiguous); the full
# rook-MST version with merge_max capping lives in
# chopin_spark.grid.merge_grid (pytest-pinned). Two-level aggregation =
# AQE-style partition coalescing decided from data statistics.

_MNX, _MNY = 16, 12
_MIN_FEATURES = 40

_MERGE_ORACLE = f"""
WITH c AS (
  SELECT {sx.grid_cell_expr(_X, _Y, _MNX, _MNY)} AS cell, COUNT(*) AS n
  FROM documents GROUP BY 1
),
lab AS (
  SELECT cell, n,
         CASE WHEN n < {_MIN_FEATURES}
              THEN 'm' || CAST(
                CAST(FLOOR(CAST(FLOOR(cell / {_MNX}.0) AS BIGINT) / 2.0)
                     AS BIGINT) * {_MNX // 2}
                + CAST(FLOOR((cell % {_MNX}) / 2.0) AS BIGINT) AS STRING)
              ELSE CAST(cell AS STRING) END AS mcell
  FROM c
)
SELECT mcell, CAST(SUM(n) AS BIGINT) AS n_pages, COUNT(*) AS n_merged
FROM lab GROUP BY 1
"""


@register("par_merge_grid_coalesce", _MERGE_ORACLE)
def par_merge_grid_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 par_merge_grid (/root/reference/R/gridding.R:558-766): cells
    under grid_min_features merge into their quad parent; n_merged
    mirrors chopin's dissolve count `summarize(n_merged = n())`
    (:734-737)."""
    docs = load(spark, sf_dir, "documents")
    cells = (
        docs.select(
            F.expr(sx.grid_cell_expr(_X, _Y, _MNX, _MNY)).alias("cell")
        )
        .groupBy("cell")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    parent = (
        F.floor(F.floor(F.col("cell") / _MNX) / 2) * (_MNX // 2)
        + F.floor((F.col("cell") % _MNX) / 2)
    ).cast("long")
    lab = cells.withColumn(
        "mcell",
        F.when(
            F.col("n") < _MIN_FEATURES,
            F.concat(F.lit("m"), parent.cast("string")),
        ).otherwise(F.col("cell").cast("string")),
    )
    return lab.groupBy("mcell").agg(
        F.sum("n").alias("n_pages"), F.count(F.lit(1)).alias("n_merged")
    )


# --- P1/P8 grid-table materialization with WKT ------------------------------

_GNX, _GNY = 8, 6
_CW = int((EXTENT[2] - EXTENT[0]) / _GNX)
_CH = int((EXTENT[3] - EXTENT[1]) / _GNY)
_GPAD = 25_000


def _wkt_sql(x0: str, y0: str, x1: str, y1: str) -> str:
    c = "CAST({v} AS STRING)"
    p = [
        (c.format(v=x0), c.format(v=y0)),
        (c.format(v=x1), c.format(v=y0)),
        (c.format(v=x1), c.format(v=y1)),
        (c.format(v=x0), c.format(v=y1)),
        (c.format(v=x0), c.format(v=y0)),
    ]
    body = " || ', ' || ".join(f"{a} || ' ' || {b}" for a, b in p)
    return f"('POLYGON ((' || {body} || '))')"


_GRID_WKT_ORACLE = f"""
WITH cells AS (
  SELECT i AS cgridid,
         CAST((i % {_GNX}) * {_CW} AS BIGINT) AS x0,
         CAST(CAST(FLOOR(i / {_GNX}.0) AS BIGINT) * {_CH} AS BIGINT) AS y0
  FROM generate_series(0, {_GNX * _GNY - 1}) t(i)
)
SELECT cgridid,
       {_wkt_sql('x0', 'y0', f'x0 + {_CW}', f'y0 + {_CH}')} AS cell_wkt,
       {_wkt_sql(f'x0 - {_GPAD}', f'y0 - {_GPAD}',
                 f'x0 + {_CW + _GPAD}', f'y0 + {_CH + _GPAD}')} AS padded_wkt
FROM cells
"""


@register("par_pad_grid_wkt", _GRID_WKT_ORACLE)
def par_pad_grid_wkt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1+P8 grid table as WKT (chopin's return_wkt mode,
    /root/reference/R/gridding.R:208-220, and par_split_list task
    enumeration :798-825): the (original, padded) polygon pair per
    CGRIDID, padding = square-cap mitre buffer = bbox expansion."""
    cells = (
        spark.range(_GNX * _GNY)
        .withColumnRenamed("id", "cgridid")
        .withColumn("x0", (F.col("cgridid") % _GNX) * _CW)
        .withColumn("y0", F.floor(F.col("cgridid") / _GNX) * _CH)
    )

    def wkt(x0, y0, x1, y1):
        pts = [(x0, y0), (x1, y0), (x1, y1), (x0, y1), (x0, y0)]
        body = [F.lit("POLYGON ((")]
        for i, (a, b) in enumerate(pts):
            if i:
                body.append(F.lit(", "))
            body += [a.cast("string"), F.lit(" "), b.cast("string")]
        body.append(F.lit("))"))
        return F.concat(*body)

    x0, y0 = F.col("x0"), F.col("y0")
    return cells.select(
        "cgridid",
        wkt(x0, y0, x0 + _CW, y0 + _CH).alias("cell_wkt"),
        wkt(
            x0 - _GPAD, y0 - _GPAD, x0 + _CW + _GPAD, y0 + _CH + _GPAD
        ).alias("padded_wkt"),
    )


# --- P9 get_clip_ext ---------------------------------------------------------

_CLIP_R = 50_000.0
_PX = sx.x_expr("p_partkey")
_PY = sx.y_expr("p_partkey")

_CLIP_ORACLE = f"""
WITH b AS (
  SELECT MIN({_PX}) AS bx0, MAX({_PX}) AS bx1,
         MIN({_PY}) AS by0, MAX({_PY}) AS by1
  FROM part
)
SELECT COUNT(*) AS n_inside,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents, b
WHERE {_X} >= bx0 - 1.1 * {_CLIP_R!r} AND {_X} <= bx1 + 1.1 * {_CLIP_R!r}
  AND {_Y} >= by0 - 1.1 * {_CLIP_R!r} AND {_Y} <= by1 + 1.1 * {_CLIP_R!r}
"""


@register("get_clip_ext", _CLIP_ORACLE)
def get_clip_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 get_clip_ext (/root/reference/R/preprocessing.R:16-36):
    clipping extent = target bbox expanded by 1.1×radius, applied as a
    pushdown-able bbox predicate (the Spark-side filter reaches the
    scan once x/y are stored columns)."""
    poi = load(spark, sf_dir, "part")
    b = poi.agg(
        F.min(F.expr(_PX)).alias("bx0"), F.max(F.expr(_PX)).alias("bx1"),
        F.min(F.expr(_PY)).alias("by0"), F.max(F.expr(_PY)).alias("by1"),
    )
    docs = load(spark, sf_dir, "documents").select(
        F.expr(_X).alias("x"), F.expr(_Y).alias("y"), "n_chars"
    )
    r = 1.1 * _CLIP_R
    return (
        docs.crossJoin(F.broadcast(b))
        .filter(
            (F.col("x") >= F.col("bx0") - r)
            & (F.col("x") <= F.col("bx1") + r)
            & (F.col("y") >= F.col("by0") - r)
            & (F.col("y") <= F.col("by1") + r)
        )
        .agg(
            F.count(F.lit(1)).alias("n_inside"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# --- salted skew-safe aggregation --------------------------------------------

_SALT_ORACLE = f"""
SELECT {sx.grid_cell_expr(_X, _Y, 4, 3)} AS cgridid,
       COUNT(*) AS n_pages,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM documents GROUP BY 1
"""


@register("salted_zone_agg", _SALT_ORACLE)
def salted_zone_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-aware salted two-phase aggregation (SURVEY.md §4 skew
    split): hot cells fan out on a deterministic salt, partial-agg on
    (cell, salt), final-agg on cell. Result is provably identical to
    the direct aggregation (the oracle IS the direct aggregation) —
    integer sums are associative, so salting is invisible."""
    from chopin_spark.grid import salted_agg

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(sx.grid_cell_expr(_X, _Y, 4, 3)).alias("cgridid"),
        "n_chars",
    )
    return salted_agg(
        docs,
        key_col="cgridid",
        row_key="doc_id",
        aggs_partial=[
            F.count(F.lit(1)).alias("pn"),
            F.sum("n_chars").alias("pc"),
        ],
        aggs_final=[
            F.sum("pn").alias("n_pages"),
            F.sum("pc").alias("sum_chars"),
        ],
        target_rows=200,
    )


# --- JSON props --------------------------------------------------------------

_JSON_ORACLE = """
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       ROUND(AVG(CAST(json_extract(props, '$.k') AS INTEGER)), 4) AS avg_k,
       COUNT(*) AS n_events
FROM events GROUP BY 1
"""


@register("json_props_rollup", _JSON_ORACLE)
def json_props_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction over the events props column (semi-structured
    payload — the events-table analogue of web-page metadata)."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 4).alias("avg_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


# --- window functions (rank / lag) --------------------------------------------

_WIN_ORACLE = """
WITH r AS (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rank,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY value DESC, event_id) AS prev_type
  FROM events
)
SELECT user_id, rank, event_id, ROUND(value, 4) AS value, prev_type
FROM r WHERE rank <= 3
"""


@register("top_events_per_user", _WIN_ORACLE)
def top_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic-window coverage: per-user top-3 by value with LAG —
    partitioned windows (shuffle on user_id, no global sort)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    return (
        ev.select(
            "user_id",
            "event_id",
            "value",
            "event_type",
            F.row_number().over(w).alias("rank"),
            F.lag("event_type").over(w).alias("prev_type"),
        )
        .filter(F.col("rank") <= 3)
        .select(
            "user_id",
            F.col("rank").cast("long").alias("rank"),
            "event_id",
            F.round("value", 4).alias("value"),
            "prev_type",
        )
    )


# --- union by name with fill (chopin's rowbind(fill=TRUE)) ----------------------

_UNION_ORACLE = """
WITH u AS (
  SELECT doc_id, lang, NULL AS n_chars FROM documents WHERE doc_id % 2 = 0
  UNION ALL BY NAME
  SELECT doc_id, NULL AS lang, n_chars FROM documents WHERE doc_id % 2 = 1
)
SELECT COUNT(*) AS n_rows,
       COUNT(lang) AS n_lang,
       COUNT(n_chars) AS n_chars_present,
       CAST(SUM(COALESCE(n_chars, 0)) AS BIGINT) AS sum_chars
FROM u
"""


@register("union_by_name_fill", _UNION_ORACLE)
def union_by_name_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Union-all with schema fill — chopin's per-task result union
    `collapse::rowbind(fill=TRUE)` (/root/reference/R/scale_process.R:229)
    as unionByName(allowMissingColumns=True): mismatched columns fill
    with NULL, never error."""
    docs = load(spark, sf_dir, "documents")
    a = docs.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang")
    b = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", "n_chars")
    u = a.unionByName(b, allowMissingColumns=True)
    return u.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("lang").alias("n_lang"),
        F.count("n_chars").alias("n_chars_present"),
        F.sum(F.coalesce(F.col("n_chars"), F.lit(0))).alias("sum_chars"),
    )


# --- rollup (grouping sets) ----------------------------------------------------

_ROLLUP_ORACLE = """
WITH d AS (
  SELECT SUBSTRING(lang, 1, 2) AS lang2, source, n_chars
  FROM documents
)
SELECT lang2, source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM d
GROUP BY ROLLUP (lang2, source)
"""


@register("lang_source_rollup", _ROLLUP_ORACLE)
def lang_source_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets coverage: ROLLUP(lang, source) — per-(lang,source),
    per-lang, and grand-total rows in one pass (NULL super-aggregate
    markers are identical in Spark and DuckDB)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(
            F.substring("lang", 1, 2).alias("lang2"), "source", "n_chars"
        )
        .rollup("lang2", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


# --- pivot (conditional aggregation) ---------------------------------------------

_EVENT_TYPES = ("click", "view", "purchase", "signup", "error")

_PIVOT_ORACLE = (
    "SELECT user_id,\n"
    + ",\n".join(
        f"       COUNT(*) FILTER (WHERE event_type = '{t}') AS n_{t}"
        for t in _EVENT_TYPES
    )
    + "\nFROM events GROUP BY user_id"
)


@register("events_pivot_by_type", _PIVOT_ORACLE)
def events_pivot_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot coverage: per-user event counts widened by type — Spark
    pivot() with an explicit value list (one pass, no value-discovery
    scan; the DuckDB oracle is the equivalent conditional aggregation)."""
    ev = load(spark, sf_dir, "events")
    out = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    for t in _EVENT_TYPES:
        out = out.withColumnRenamed(t, f"n_{t}")
    return out.fillna(0, subset=[f"n_{t}" for t in _EVENT_TYPES])


# --- composed training-data pipeline ---------------------------------------------

_NTOK_COVER = "(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)"

_PIPE_ORACLE = f"""
WITH quality AS (
  SELECT doc_id, lang, n_chars,
         {_NTOK_COVER} AS n_tokens,
         md5(text) AS text_md5
  FROM documents
  WHERE {_NTOK_COVER} >= 12
),
dedup AS (
  SELECT MIN(doc_id) AS doc_id FROM quality GROUP BY text_md5
)
SELECT q.lang, COUNT(*) AS n_docs,
       CAST(SUM(q.n_chars) AS BIGINT) AS sum_chars,
       ROUND(AVG(CAST(q.n_tokens AS DOUBLE)), 4) AS avg_tokens
FROM quality q
JOIN dedup d ON q.doc_id = d.doc_id
GROUP BY q.lang
"""


@register("training_pipeline_stats", _PIPE_ORACLE)
def training_pipeline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composition query — the minimal training-data pipeline: quality
    filter (token floor) → exact dedup (md5 canonical survivor) →
    per-language corpus stats. One scan, two shuffles; at 100 TB the
    dedup shuffle is the cost center and partitions by the 16-byte
    hash (uniform — no skew by construction)."""
    docs = load(spark, sf_dir, "documents")
    ntok = F.expr(_NTOK_COVER)
    quality = docs.select(
        "doc_id", "lang", "n_chars", ntok.alias("n_tokens"),
        F.md5("text").alias("text_md5"),
    ).filter(ntok >= 12)
    dedup = quality.groupBy("text_md5").agg(F.min("doc_id").alias("doc_id"))
    return (
        quality.join(dedup.select("doc_id"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.round(F.avg(F.col("n_tokens").cast("double")), 4).alias(
                "avg_tokens"
            ),
        )
    )


# --- TPC-H Q3 / Q5 shapes -------------------------------------------------------

_Q3_ORACLE = """
SELECT o.o_orderkey,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       o.o_orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o.o_orderkey, o.o_orderdate
ORDER BY revenue DESC, o_orderkey
LIMIT 20
"""


@register("shipping_priority_q3", _Q3_ORACLE)
def shipping_priority_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → two joins → agg → top-k.
    customer is the small filtered side (broadcast); lineitem⋈orders
    shuffles on the order key."""
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
        .select("o_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(20)
    )


_Q5_ORACLE = """
SELECT n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
       COUNT(*) AS n_items
FROM region r
JOIN nation n ON n.n_regionkey = r.r_regionkey
JOIN supplier s ON s.s_nationkey = n.n_nationkey
JOIN lineitem l ON l.l_suppkey = s.s_suppkey
WHERE r.r_name = 'ASIA'
GROUP BY n.n_name
"""


@register("local_supplier_volume_q5", _Q5_ORACLE)
def local_supplier_volume_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: snowflake dims (region→nation→supplier) all
    broadcast; one fact scan, one agg shuffle."""
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n = load(spark, sf_dir, "nation")
    s = load(spark, sf_dir, "supplier")
    li = load(spark, sf_dir, "lineitem")
    dims = F.broadcast(
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "n_name")
    )
    return (
        li.join(dims, li.l_suppkey == F.col("s_suppkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )
