"""Second coverage batch: having-on-aggregate subqueries, corpus
n-gram frequencies, multi-layer raster algebra, and batch
sessionization via gaps-and-islands windows."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chopin_spark.queries import register
from chopin_spark.tables import load

# --- TPC-H Q18 shape: join against an aggregated subquery -----------------------

_Q18_ORACLE = """
WITH big AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM(l_quantity) > 150
)
SELECT c.c_name, o.o_orderkey, o.o_orderdate,
       ROUND(SUM(l.l_quantity), 4) AS total_qty
FROM orders o
JOIN big ON o.o_orderkey = big.l_orderkey
JOIN customer c ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY c.c_name, o.o_orderkey, o.o_orderdate
"""


@register("large_volume_q18", _Q18_ORACLE)
def large_volume_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: aggregate → HAVING filter → semi-style join
    back to the fact (subquery decorrelation territory: the aggregated
    key set is the join filter)."""
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("tq"))
        .filter(F.col("tq") > 150)
        .select("l_orderkey")
    )
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    return (
        li.join(big, "l_orderkey")
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_name", "o_orderkey", "o_orderdate")
        .agg(F.round(F.sum("l_quantity"), 4).alias("total_qty"))
    )


# --- corpus bigram frequencies (LM preprocessing) --------------------------------

_BIGRAM_ORACLE = """
WITH toks AS (
  SELECT STRING_SPLIT(text, ' ') AS w FROM documents
),
bg AS (
  SELECT UNNEST(LIST_TRANSFORM(generate_series(1, LEN(w) - 1),
                i -> w[i] || ' ' || w[i+1])) AS bigram
  FROM toks WHERE LEN(w) >= 2
),
cnt AS (
  SELECT bigram, COUNT(*) AS n FROM bg GROUP BY 1
),
r AS (
  SELECT bigram, n,
         ROW_NUMBER() OVER (ORDER BY n DESC, bigram) AS rank
  FROM cnt
)
SELECT rank, bigram, n FROM r WHERE rank <= 25
"""


@register("corpus_top_bigrams", _BIGRAM_ORACLE)
def corpus_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-25 bigrams: HOF shingle generation → hash agg →
    top-k (TakeOrdered). The LM-preprocessing token-statistics op; at
    100 TB the count shuffle partitions by bigram hash (vocabulary-
    bounded, no skew beyond stopword pairs — AQE handles those)."""
    docs = load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    bg = F.transform(
        F.sequence(F.lit(0), F.size("w") - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("w"), (i + 1).cast("int")),
            F.element_at(F.col("w"), (i + 2).cast("int")),
        ),
    )
    cnt = (
        docs.select(w.alias("w"))
        .filter(F.size("w") >= 2)
        .select(F.explode(bg).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = cnt.orderBy(F.desc("n"), "bigram").limit(25)
    return top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("n"), "bigram")),
    ).select("rank", "bigram", "n")


# --- PMI collocations (lexical association mining) ----------------------------
#
# Pointwise mutual information of corpus bigrams vs their unigram
# marginals — the collocation-extraction step of phrase mining /
# tokenizer curation.  Counts: one bigram agg + one unigram agg (both
# vocabulary-bounded); marginals re-attach by TWO broadcast joins on
# the word key.  Ordering discipline: the top-25 is ordered by the RAW
# likelihood-ratio score (a division chain of identically-ordered IEEE
# ops — bit-equal in both engines), never by the rounded LN output, so
# rank ties can't flip across engines; LN appears only in the reported
# pmi under the repo's ROUND(,6) grain.

_PMI_MIN_N = 5
_PMI_SCORE = (
    "(((CAST(n_ab AS DOUBLE) * ntok) * ntok)"
    " / ((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) * nbg))"
)

_PMI_ORACLE = f"""
WITH toks AS (
  SELECT STRING_SPLIT(text, ' ') AS w FROM documents
),
bg AS (
  SELECT UNNEST(LIST_TRANSFORM(generate_series(1, LEN(w) - 1),
                i -> w[i] || ' ' || w[i+1])) AS bigram
  FROM toks WHERE LEN(w) >= 2
),
bcnt AS (
  SELECT STRING_SPLIT(bigram, ' ')[1] AS w1,
         STRING_SPLIT(bigram, ' ')[2] AS w2,
         COUNT(*) AS n_ab
  FROM bg GROUP BY 1, 2
),
uni AS (
  SELECT UNNEST(w) AS word FROM toks
),
ucnt AS (
  SELECT word, COUNT(*) AS n FROM uni GROUP BY 1
),
tot AS (
  SELECT CAST(SUM(n) AS DOUBLE) AS ntok FROM ucnt
),
btot AS (
  SELECT CAST(SUM(n_ab) AS DOUBLE) AS nbg FROM bcnt
),
scored AS (
  SELECT w1, w2, n_ab, {_PMI_SCORE} AS score
  FROM bcnt
  JOIN ucnt a ON a.word = w1
  JOIN ucnt b ON b.word = w2
  CROSS JOIN tot CROSS JOIN btot,
  LATERAL (SELECT a.n AS n_a, b.n AS n_b) m
  WHERE n_ab >= {_PMI_MIN_N}
)
SELECT ROW_NUMBER() OVER (ORDER BY score DESC, w1, w2) AS rank,
       w1, w2, n_ab, ROUND(LN(score), 6) AS pmi
FROM scored
ORDER BY rank
LIMIT 25
"""


@register("pmi_collocations", _PMI_ORACLE)
def pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-25 corpus collocations by PMI (n_ab >= 5): bigram + unigram
    aggs, marginals re-attached by two broadcast joins, ordered by the
    exact-double raw score so the cut is cross-engine deterministic."""
    docs = load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    bgx = F.transform(
        F.sequence(F.lit(0), F.size("w") - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("w"), (i + 1).cast("int")),
            F.element_at(F.col("w"), (i + 2).cast("int")),
        ),
    )
    bcnt = (
        docs.select(w.alias("w"))
        .filter(F.size("w") >= 2)
        .select(F.explode(bgx).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .select(
            F.split("bigram", " ")[0].alias("w1"),
            F.split("bigram", " ")[1].alias("w2"),
            "n_ab",
        )
    )
    ucnt = (
        docs.select(F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = ucnt.agg(F.sum("n").cast("double").alias("ntok"))
    btot = bcnt.agg(F.sum("n_ab").cast("double").alias("nbg"))
    scored = (
        bcnt.filter(F.col("n_ab") >= _PMI_MIN_N)
        .join(
            F.broadcast(ucnt.selectExpr("word AS w1", "n AS n_a")), "w1"
        )
        .join(
            F.broadcast(ucnt.selectExpr("word AS w2", "n AS n_b")), "w2"
        )
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .withColumn("score", F.expr(_PMI_SCORE))
    )
    top = scored.orderBy(F.desc("score"), "w1", "w2").limit(25)
    return top.withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.desc("score"), "w1", "w2")),
    ).selectExpr(
        "CAST(rank AS BIGINT) AS rank", "w1", "w2", "n_ab",
        "ROUND(LN(score), 6) AS pmi",
    )



# --- multi-layer raster algebra ----------------------------------------------------

from chopin_spark import zones as Z  # noqa: E402
from chopin_spark.queries.zonal import _PCX, _PCY, _PX_GRID, _tiles  # noqa: E402
from chopin_spark.raster import V_MOD, V_MX, V_MY, V_SEED, extract_at  # noqa: E402

_DIFF_ORACLE = f"""
WITH px AS ({_PX_GRID})
SELECT {Z.zone_id_expr(_PCX, _PCY)} AS zone_id,
       CAST(SUM(((i * {V_MX} + j * {V_MY}) % {V_MOD})
           - ((i * {V_MX} + j * {V_MY} + {V_SEED}) % {V_MOD})) AS BIGINT) AS sum_diff,
       COUNT(*) AS n_pixels
FROM px
GROUP BY 1
"""


@register("raster_algebra_diff", _DIFF_ORACLE)
def raster_algebra_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-layer raster algebra (chopin's multi-layer SpatRaster,
    /root/reference/R/check.R:933-972): per-pixel difference r0 - r1 as
    a tile-aligned equi-join + JVM zip_with, then zonal sum per tract —
    no UDF, no pixel explosion; the arrays subtract element-wise inside
    codegen."""
    tiles = _tiles(spark, n_rasters=2)
    t0 = tiles.filter(F.col("rid") == 0).select(
        "tile_id", "tile_row", "tile_col", F.col("values").alias("v0")
    )
    t1 = tiles.filter(F.col("rid") == 1).select(
        "tile_id", F.col("values").alias("v1")
    )
    diff = t0.join(t1, "tile_id").select(
        F.lit("r0-r1").alias("raster_id"),
        "tile_id",
        "tile_row",
        "tile_col",
        F.zip_with("v0", "v1", lambda a, b: a - b).alias("values"),
    )
    rects = Z.zones_df(spark).select("zone_id", "xmin", "ymin", "xmax", "ymax")
    out = extract_at(diff, rects, rect_id="zone_id", stats=("sum",))
    return out.select("zone_id", F.col("sum_val").alias("sum_diff"), "n_pixels")


# --- batch sessionization (gaps and islands) -----------------------------------------

_SESS_ORACLE = """
WITH o AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts)
                   - LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= 1800000000
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session,
         event_id
  FROM events
),
s AS (
  SELECT user_id, ts, value,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_no
  FROM o
)
SELECT user_id, session_no, COUNT(*) AS n_events,
       ROUND(SUM(CAST(FLOOR((value) * 100 + 0.5) AS BIGINT)) / 100.0, 4) AS sum_value,
       MIN(ts) AS session_start
FROM s GROUP BY 1, 2
"""


@register("sessionize_events", _SESS_ORACLE)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via gaps-and-islands (LAG + running sum) —
    the declarative twin of the streaming session_window operator;
    windows partition by user (no global sort)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ → session-TZ timestamp (UTC) → epoch MICROSECONDS: whole-
    # second truncation disagrees with the oracle's microsecond gap at
    # sub-second boundaries (confirmed one extra session at sf0.1)
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    o = ev.withColumn(
        "new_session",
        F.when(us - F.lag(us).over(w) >= 1800 * 1_000_000, 1)
        .when(F.lag("ts").over(w).isNull(), 1)
        .otherwise(0),
    )
    s = o.withColumn(
        "session_no",
        F.sum("new_session").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return s.groupBy("user_id", "session_no").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum(F.expr("CAST(FLOOR((value) * 100 + 0.5) AS BIGINT)")) / 100.0, 4).alias("sum_value"),
        F.min("ts").alias("session_start"),
    )


# --- exact interpolated quantiles per group ---------------------------------

_MEDIAN_ORACLE = """
SELECT lang,
       COUNT(*) AS n_docs,
       ROUND(QUANTILE_CONT(n_chars, 0.5), 4) AS median_chars,
       ROUND(QUANTILE_CONT(n_chars, 0.9), 4) AS p90_chars
FROM documents
GROUP BY 1
"""


@register("lang_char_quantiles", _MEDIAN_ORACLE)
def lang_char_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated median/p90 per language (Spark `percentile`
    == DuckDB QUANTILE_CONT: both linear interpolation).  The exact
    percentile is a per-group sort — fine on group-sized data; the
    documented scale twin is approx_percentile with a bounded error
    (same pattern as quantile_grid vs ntile, docs/SCALE.md)."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.expr("percentile(n_chars, 0.5)"), 4).alias("median_chars"),
        F.round(F.expr("percentile(n_chars, 0.9)"), 4).alias("p90_chars"),
    )


# --- doc commonness score (CCNet-style corpus-frequency filter) -------------

_COMMON_ORACLE = """
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
),
bg AS (
  SELECT doc_id,
         UNNEST(LIST_TRANSFORM(generate_series(1, LEN(w) - 1),
                i -> w[i] || ' ' || w[i + 1])) AS bigram
  FROM toks WHERE LEN(w) >= 2
),
df AS (SELECT bigram, COUNT(*) AS n FROM bg GROUP BY 1)
SELECT bg.doc_id,
       COUNT(*) AS n_bigrams,
       ROUND(CAST(SUM(df.n) AS DOUBLE) / COUNT(*), 4) AS mean_bigram_df,
       MAX(df.n) AS max_bigram_df
FROM bg JOIN df USING (bigram)
GROUP BY 1
"""


@register("doc_commonness_score", _COMMON_ORACLE)
def doc_commonness_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency quality signal (the integer-exact stand-in for
    CCNet's LM-perplexity filter): each document scored by the mean
    corpus document-frequency of its bigrams — high = boilerplate,
    low = novel text.  Two shuffles (bigram count, doc re-agg); the
    integer SUM keeps the float division deterministic, so the score
    is oracle-exact with no tolerance."""
    docs = load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    bg_arr = F.transform(
        F.sequence(F.lit(0), F.size("w") - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("w"), (i + 1).cast("int")),
            F.element_at(F.col("w"), (i + 2).cast("int")),
        ),
    )
    bg = (
        docs.select("doc_id", w.alias("w"))
        .filter(F.size("w") >= 2)
        .select("doc_id", F.explode(bg_arr).alias("bigram"))
    )
    df_counts = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("n"))
    return (
        bg.join(df_counts, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum("n").cast("double") / F.count(F.lit(1)), 4
            ).alias("mean_bigram_df"),
            F.max("n").alias("max_bigram_df"),
        )
    )
