"""Relational-operator coverage queries (SURVEY.md §2.5 cross-reference):
projection, filter, equi-join, semi-join, hash-agg, distinct, window,
sort/top-k, string + date functions — all stock DataFrame ops that
Catalyst pushes down / reorders / codegens."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark.queries import register
from chopin_spark.tables import load

_PRICING_ORACLE = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


@register("pricing_summary", _PRICING_ORACLE)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style scan→filter→hash-agg; partial+final agg automatic
    (map-side combine), filter + 6-column pruning reach the parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_TOPCUST_ORACLE = """
SELECT c.c_custkey, c.c_name, n.n_name,
       COUNT(o.o_orderkey) AS n_orders,
       ROUND(SUM(o.o_totalprice), 4) AS total_spent
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN orders o ON o.o_custkey = c.c_custkey
WHERE o.o_orderstatus <> 'F'
GROUP BY c.c_custkey, c.c_name, n.n_name
ORDER BY total_spent DESC, c_custkey
LIMIT 50
"""


@register("top_customers", _TOPCUST_ORACLE)
def top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join + agg + top-k. nation (25 rows) broadcast explicitly;
    orders⋈customer shuffles on the key; TakeOrderedAndProject for the
    top-k (no global sort materialization)."""
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "F")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_spent"),
        )
        .orderBy(F.desc("total_spent"), "c_custkey")
        .limit(50)
    )


_ST_ORACLE = """
SELECT event_type,
       date_trunc('hour', ts) AS ts_hour,
       COUNT(*) AS n_events,
       CAST((SUM(CAST(FLOOR((value) * 100 + 0.5) AS BIGINT)) * 200 + COUNT(*)) // (2 * COUNT(*)) AS BIGINT)
         / 10000.0 AS avg_value,
       ROUND(SUM(CAST(FLOOR((value) * 100 + 0.5) AS BIGINT)) / 100.0, 4) AS sum_value
FROM events
GROUP BY 1, 2
"""


@register("summarize_st_hourly", _ST_ORACLE)
def summarize_st_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7 summarize_st temporal branch
    (/root/reference/R/processing.R:1158-1202): tumbling time floor via
    date_trunc + groupBy over numeric columns — chopin's only temporal
    operator, golden hourly-floor semantics from its tests
    (/root/reference/tests/testthat/test-processing.R:768-801)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("ts_hour")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # integer-cents accumulation: value is exactly 2-decimal,
            # so this is lossless AND reduction-order independent
            # (ROUND(AVG(double),4) flipped a 4th decimal at sf0.1).
            # The 4-decimal average itself is an INTEGER half-up
            # division — cents·100/n lands on exact .xxxx5 ties that
            # double ROUND resolves differently per engine.
            (
                F.expr(
                    f"CAST((SUM(CAST(FLOOR((value) * 100 + 0.5) AS BIGINT)) * 200 + COUNT(*))"
                    " DIV (2 * COUNT(*)) AS BIGINT)"
                )
                / 10000.0
            ).alias("avg_value"),
            F.round(F.sum(F.expr("CAST(FLOOR((value) * 100 + 0.5) AS BIGINT)")) / 100.0, 4).alias("sum_value"),
        )
    )


_SEMI_ORACLE = """
SELECT p.p_brand, COUNT(*) AS n_parts
FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 45)
GROUP BY p.p_brand
"""


@register("semi_join_parts", _SEMI_ORACLE)
def semi_join_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (the reference's subset-by-geometry `x[y, ]`
    pattern, /root/reference/R/check.R:357-395, in relational form)."""
    p = load(spark, sf_dir, "part")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return (
        p.join(li, p.p_partkey == li.l_partkey, "left_semi")
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n_parts"))
    )


# --- q14-style promo revenue share (decimal-exact money aggregation) --------
#
# Double SUMs are reduction-order dependent; money must not be.  Prices
# quantize exactly to DECIMAL(18,2) (TPC-H prices are cents) and the
# discount factor to DECIMAL(18,2), so every product and both SUMs are
# exact decimals — partition-order independent, hash-identical across
# engines — and only the final share converts to DOUBLE.

_Q14_SQL = """
SELECT ROUND(
         100.0
         * CAST(SUM(CASE WHEN p_type = 'PROMO'
                         THEN CAST(l_extendedprice AS DECIMAL(18, 2))
                              * (CAST(1.0 AS DECIMAL(18, 2))
                                 - CAST(l_discount AS DECIMAL(18, 2)))
                         ELSE CAST(0 AS DECIMAL(18, 2)) END) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18, 2))
                    * (CAST(1.0 AS DECIMAL(18, 2))
                       - CAST(l_discount AS DECIMAL(18, 2)))) AS DOUBLE),
         4) AS promo_share,
       COUNT(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
"""


@register("promo_revenue_share_q14", _Q14_SQL)
def promo_revenue_share_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share over a ship-date year.
    part (dimension) broadcasts; revenue accumulates in exact DECIMAL
    so the share is reduction-order independent (a requirement the
    usual double-sum formulation silently violates)."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql(_Q14_SQL)


# --- deterministic bootstrap of a corpus mean ----------------------------------
#
# Error bars at 100 TB: the Poisson/multinomial bootstrap reweights
# every row independently, so B resamples are ONE pass with a B-way
# explode of a 2-column projection — no sampling shuffle, no reservoir.
# Weights are a closed form of (doc_id, replicate): w ∈ {0, 1, 2} with
# P = (1/4, 1/2, 1/4) — mean 1 (unbiased resample size), variance 1/2
# (a documented, deterministic stand-in for Poisson(1)'s variance 1 —
# CI widths scale by √2 narrower; the point here is the PLAN and the
# cross-engine exactness, both weight draws being pure integer LCG).
# Output: B replicate means on the exact integer lattice — the
# consumer takes percentiles of 32 numbers.

_BOOT_B = 32
_BOOT_W = (
    "(CASE ((doc_id * 2654435761 + b * 40503) % 4)"
    " WHEN 0 THEN 0 WHEN 3 THEN 2 ELSE 1 END)"
)

_BOOT_ORACLE = f"""
WITH reps AS (
  SELECT doc_id, n_chars, r.b
  FROM documents, generate_series(0, {_BOOT_B - 1}) AS r(b)
),
w AS (
  SELECT b, CAST({_BOOT_W} AS BIGINT) AS w, n_chars FROM reps
)
SELECT b AS replicate,
       CAST(SUM(w) AS BIGINT) AS n_eff,
       ROUND(CAST(SUM(w * n_chars) AS BIGINT)
             / CAST(SUM(w) AS DOUBLE), 4) AS boot_mean
FROM w
GROUP BY 1
"""


@register("bootstrap_mean_chars", _BOOT_ORACLE)
def bootstrap_mean_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B=32 deterministic bootstrap replicates of mean document length
    — one pass, a B-way explode of a two-column projection, exact
    integer accumulators."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    reps = docs.select(
        "doc_id", "n_chars",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    ).withColumn("w", F.expr(_BOOT_W).cast("long"))
    return (
        reps.groupBy(F.col("b").cast("long").alias("replicate"))
        .agg(
            F.sum("w").cast("long").alias("n_eff"),
            F.round(
                F.sum(F.col("w") * F.col("n_chars")).cast("long")
                / F.sum("w").cast("double"),
                4,
            ).alias("boot_mean"),
        )
    )


# --- robust statistics: exact trimmed mean per group ---------------------------
#
# Outlier-proof corpus monitoring: the 5%-trimmed mean of document
# length per language.  Trimming is RANK-based with a total order
# (n_chars, doc_id) and integer threshold arithmetic
# (rn·20 > n AND rn·20 ≤ 19·n) — no percentile function, whose
# boundary/tie conventions differ between engines; both sides keep
# exactly the same rows.  One window pass per group + one agg.

_TRIM_SQL = """
WITH r AS (
  SELECT lang, n_chars,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY n_chars, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY lang) AS n
  FROM documents
),
kept AS (
  SELECT lang, n_chars, n FROM r
  WHERE rn * 20 > n AND rn * 20 <= 19 * n
)
SELECT lang,
       CAST(MIN(n) AS BIGINT) AS n_total,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       ROUND(CAST(SUM(n_chars) AS BIGINT) / CAST(COUNT(*) AS DOUBLE), 4)
         AS trimmed_mean
FROM kept
GROUP BY 1
"""


@register("trimmed_mean_chars_by_lang", _TRIM_SQL)
def trimmed_mean_chars_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5%-trimmed mean document length per language — rank-based
    trimming with integer thresholds, engine-stable by construction."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_TRIM_SQL)


# --- Benford first-digit audit (data-quality / anomaly screen) -----------------
#
# The classic numeric-integrity screen: the first significant digit of
# money amounts against Benford's log10(1 + 1/d) law, with the per-
# digit χ² contribution.  The first digit is extracted by an unrolled
# integer halving chain on exact CENTS (four FLOOR-divisions by 1e8 /
# 1e4 / 1e2 / 10 — power-of-ten divisions of int-valued doubles are
# correctly rounded and far from integer boundaries, so both engines
# agree bit-for-bit; no LOG10, no string formatting, whose conventions
# split engines).  The Benford expectations are Python-baked literals.
# One scan, one 9-key agg.

_BF_CENTS = "CAST(FLOOR((l_extendedprice) * 100 + 0.5) AS BIGINT)"


def _bf_first_digit(c: str) -> str:
    s = c
    for p in (100000000, 10000, 100, 10):
        s = (
            "(CASE WHEN %s >= %d THEN"
            " CAST(FLOOR(%s / %d.0) AS BIGINT) ELSE %s END)"
            % (s, p, s, p, s)
        )
    return s


_BF_LOG = "(CASE digit __EXPCASE__ END)"

_BENFORD_SQL = """
WITH d AS (
  SELECT __FD__ AS digit FROM lineitem
),
cnt AS (
  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM d GROUP BY 1
),
tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM cnt)
SELECT digit, n_obs,
       ROUND(CAST(n AS DOUBLE) * __LOG__, 4) AS n_expected,
       ROUND((n_obs - CAST(n AS DOUBLE) * __LOG__)
             * (n_obs - CAST(n AS DOUBLE) * __LOG__)
             / (CAST(n AS DOUBLE) * __LOG__), 6) AS chi2_contrib
FROM cnt CROSS JOIN tot
""".replace("__LOG__", _BF_LOG.replace("__EXPCASE__", 'WHEN 1 THEN 0.3010299956639812 WHEN 2 THEN 0.17609125905568124 WHEN 3 THEN 0.12493873660829992 WHEN 4 THEN 0.09691001300805642 WHEN 5 THEN 0.07918124604762482 WHEN 6 THEN 0.06694678963061322 WHEN 7 THEN 0.05799194697768673 WHEN 8 THEN 0.05115252244738129 WHEN 9 THEN 0.04575749056067514')).replace(
    "__FD__", _bf_first_digit(_BF_CENTS)
)


@register("benford_price_audit", _BENFORD_SQL)
def benford_price_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit distribution of l_extendedprice vs Benford's law
    with per-digit χ² contributions — integer digit extraction, baked
    log literals, one 9-key agg."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_BENFORD_SQL)


# --- TPC-H Q2 shape: correlated scalar subquery (min-cost supplier) -----------
#
# The decorrelation stress shape: a scalar MIN subquery correlated on
# the outer part key.  Catalyst rewrites it to an aggregated self-join
# (no per-row re-execution); DuckDB does the same — the plans differ,
# the rows must not.

_Q2_SQL = """
SELECT p.p_partkey, p.p_brand, l.l_suppkey,
       ROUND(l.l_extendedprice, 2) AS best_price
FROM part p
JOIN lineitem l ON l.l_partkey = p.p_partkey
WHERE p.p_size = 5
  AND l.l_extendedprice = (
    SELECT MIN(l2.l_extendedprice)
    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
  )
"""


@register("min_cost_supplier_q2", _Q2_SQL)
def min_cost_supplier_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: per size-5 part, the supplier rows at the
    minimum offered price via a correlated scalar subquery — the
    decorrelation-to-join-agg rewrite exercised end to end."""
    for t in ("part", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q2_SQL)


# --- TPC-H Q21 shape: EXISTS + NOT EXISTS (waiting orders) --------------------

_Q21_SQL = """
SELECT l1.l_suppkey AS suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
FROM lineitem l1
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
WHERE l1.l_returnflag = 'R'
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey
      AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey
      AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_returnflag = 'R'
  )
GROUP BY 1
"""


@register("waiting_orders_q21", _Q21_SQL)
def waiting_orders_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers solely responsible for the returned
    line in multi-supplier finished orders — correlated EXISTS (semi
    join) plus NOT EXISTS (anti join) in one predicate, both
    decorrelated by the optimizer."""
    for t in ("lineitem", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q21_SQL)


# --- TPC-H plan-shape pack (Q4 / Q7 / Q10 / Q19 / Q22 analogs) ----------------
#
# Five more canonical optimizer shapes over the TPC-H-ish tables, each
# distinct from the Q1/Q2/Q3/Q5/Q14/Q18/Q21 family already registered:
# correlated EXISTS decorrelated to a left-semi join (Q4), the two-role
# dimension join with a symmetric pair predicate (Q7), grouped top-k
# revenue (Q10), a disjunction of conjunctions that must still push to
# both scans (Q19), and scalar-subquery + anti-join (Q22).  Money sums
# use the repo's integer-cents discipline: per-row quantize to 1e-4
# (price is 2-dec, discount 2-dec), SUM as int64, divide once at the
# end — reduction-order independent where ROUND(SUM(double)) is not.

_REV_Q = ("CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000 + 0.5) "
          "AS BIGINT)")

_Q4_ORACLE = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY 1
"""


@register("order_priority_q4", _Q4_ORACLE)
def order_priority_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: correlated EXISTS over lineitem decorrelated to
    a LEFT SEMI join on the order key (the join carries the correlated
    l_shipdate > o_orderdate residual), then a tiny hash-agg on the
    5-value priority column.  The quarter filter prunes the orders scan
    before the join on both sides."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


_Q7_PAIR = (
    "((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7') OR "
    "(n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))"
)

_Q7_ORACLE = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
       COUNT(*) AS n_lines,
       ROUND(SUM({_REV_Q}) / 10000.0, 4) AS revenue
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE {_Q7_PAIR}
GROUP BY 1, 2, 3
"""


@register("volume_shipping_q7", _Q7_ORACLE)
def volume_shipping_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the nation dimension joined twice under two
    roles with a symmetric pair predicate, revenue bucketed by ship
    year.  Both nation joins broadcast; the pair disjunction filters
    after the two independent dimension joins (Catalyst cannot split
    it per-role, so the residual sits on the joined row — the
    canonical two-role-dimension test)."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(F.col("n_nationkey").alias("n1_key"),
                  F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("n2_key"),
                  F.col("n_name").alias("cust_nation"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(
            ((F.col("supp_nation") == "NATION_3")
             & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7")
               & (F.col("cust_nation") == "NATION_3"))
        )
        .groupBy(
            "supp_nation", "cust_nation",
            F.expr("CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT)")
            .alias("l_year"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.round(F.expr(f"SUM({_REV_Q})") / 10000.0, 4)).alias("revenue"),
        )
    )


_Q10_ORACLE = f"""
SELECT c_custkey, c_name, n_name,
       COUNT(*) AS n_lines,
       ROUND(SUM({_REV_Q}) / 10000.0, 4) AS revenue
FROM customer
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON n_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


@register("returned_items_q10", _Q10_ORACLE)
def returned_items_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-line revenue per customer over a
    half-year window, grouped top-20 (TakeOrderedAndProject — no
    global sort materialization).  The returnflag filter pushes to the
    lineitem scan, the date window to orders; ties at the revenue
    cutoff break on the customer key so the LIMIT is deterministic."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01").cast("timestamp"))
    )
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.round(F.expr(f"SUM({_REV_Q})") / 10000.0, 4)).alias("revenue"),
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


_Q19_PRED = """
  ((p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 10
    AND l_quantity BETWEEN 1 AND 15)
   OR (p_brand = 'Brand#22' AND p_size BETWEEN 10 AND 25
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#33' AND p_size BETWEEN 20 AND 40
       AND l_quantity BETWEEN 20 AND 45))
"""

_Q19_ORACLE = f"""
SELECT COUNT(*) AS n_lines,
       ROUND(SUM({_REV_Q}) / 10000.0, 4) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE {_Q19_PRED}
"""


@register("disjunctive_parts_q19", _Q19_ORACLE)
def disjunctive_parts_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR of brand/size/quantity conjunctions.
    Catalyst derives the implied single-side disjunctions (brand IN
    (...) on part, quantity BETWEEN 1 AND 45 on lineitem) and pushes
    them into both scans while the full residual evaluates post-join —
    the classic disjunctive-pushdown test."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(F.expr(_Q19_PRED))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (F.round(F.expr(f"SUM({_REV_Q})") / 10000.0, 4)).alias("revenue"),
        )
    )


_Q22_CUTOFF = "TIMESTAMP '1999-01-01 00:00:00'"
_BAL_CENTS = "CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT)"

_Q22_ORACLE = f"""
WITH avg_bal AS (
  SELECT CAST(SUM({_BAL_CENTS}) AS DOUBLE) / (100.0 * COUNT(*)) AS ab
  FROM customer WHERE c_acctbal > 0.0
)
SELECT c_nationkey, COUNT(*) AS numcust,
       ROUND(SUM({_BAL_CENTS}) / 100.0, 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT ab FROM avg_bal)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= {_Q22_CUTOFF})
GROUP BY 1
"""


@register("lapsed_customers_q22", _Q22_ORACLE)
def lapsed_customers_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no recent
    orders, per nation.  The scalar average (integer-cents exact) comes
    from a 1-row broadcast; the no-recent-orders condition is a LEFT
    ANTI join against the date-pruned orders scan — the
    scalar-subquery + anti-join pair that Q22 exists to test."""
    c = load(spark, sf_dir, "customer")
    ab = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (F.expr(f"CAST(SUM({_BAL_CENTS}) AS DOUBLE)")
             / (100.0 * F.count(F.lit(1)))).alias("ab")
        )
    )
    recent = load(spark, sf_dir, "orders").filter(
        F.expr(f"o_orderdate >= {_Q22_CUTOFF}")
    ).select("o_custkey")
    return (
        c.join(F.broadcast(ab))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, c.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.expr(f"SUM({_BAL_CENTS})") / 100.0, 2)
            .alias("totacctbal"),
        )
    )


# --- CUBE grouping sets (the Expand-operator plan shape) ----------------------

_CUBE_SQL = """
SELECT COALESCE(lang, 'ALL') AS lang,
       COALESCE(source, 'ALL') AS source,
       CAST(GROUPING(lang) AS BIGINT) AS g_lang,
       CAST(GROUPING(source) AS BIGINT) AS g_source,
       COUNT(*) AS n_docs,
       CAST(SUM(CAST(n_chars AS BIGINT)) AS BIGINT) AS sum_chars
FROM documents
GROUP BY CUBE(lang, source)
"""


@register("cube_lang_source", _CUBE_SQL)
def cube_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(lang, source) corpus census: all four grouping sets in one
    pass.  Catalyst plans this as an Expand (4× row replication into
    the partial agg) — replication happens AFTER the scan folds to the
    two grouping columns, so the cost is 4× the distinct-combination
    stream, not 4× the corpus; GROUPING() flags disambiguate rolled-up
    NULLs from the 'ALL' sentinel."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_CUBE_SQL)


_Q6_ORACLE = """
SELECT COUNT(*) AS n_lines,
       ROUND(SUM(CAST(FLOOR(l_extendedprice * l_discount * 10000 + 0.5)
                      AS BIGINT)) / 10000.0, 4) AS revenue_delta
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


@register("forecast_revenue_q6", _Q6_ORACLE)
def forecast_revenue_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-filter-agg probe — every
    predicate (date window, discount band, quantity cap) must reach
    the parquet scan as a pushed filter; no join, no shuffle beyond
    the single-row final agg."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            (
                F.expr(
                    "SUM(CAST(FLOOR(l_extendedprice * l_discount * 10000"
                    " + 0.5) AS BIGINT))"
                )
                / 10000.0
            ).alias("revenue_delta"),
        )
        .select(
            "n_lines", F.round("revenue_delta", 4).alias("revenue_delta")
        )
    )


_Q15_REV = ("CAST(SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 10000"
            " + 0.5) AS BIGINT)) AS BIGINT)")

_Q15_ORACLE = f"""
WITH rev AS (
  SELECT l_suppkey, {_Q15_REV} AS r
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY 1
)
SELECT s.s_suppkey, s.s_name,
       ROUND(CAST(rev.r AS DOUBLE) / 10000.0, 4) AS total_revenue
FROM supplier s
JOIN rev ON rev.l_suppkey = s.s_suppkey
WHERE rev.r = (SELECT MAX(r) FROM rev)
"""


@register("top_supplier_q15", _Q15_ORACLE)
def top_supplier_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: per-supplier quarter revenue vs the global
    maximum — the view-plus-scalar-MAX pattern (the revenue agg is
    computed once and compared against its own 1-row broadcast max;
    integer-cents revenue makes the equality exact, no float ==)."""
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(F.expr(_Q15_REV).alias("r"))
    rev = rev.localCheckpoint()  # one pass: feeds both max and join
    mx = rev.agg(F.max("r").alias("rmax"))
    s = load(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev.r == F.col("rmax"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select(
            "s_suppkey", "s_name",
            F.round(F.col("r").cast("double") / 10000.0, 4)
            .alias("total_revenue"),
        )
    )


# --- TPC-H battery completion (Q8/Q9/Q11/Q12/Q13/Q16/Q17/Q20) -----------------
#
# The eight canonical optimizer shapes still missing after the
# Q1/Q2/Q3/Q4/Q5/Q6/Q7/Q10/Q14/Q15/Q18/Q19/Q21/Q22 family: with these
# the repo exercises all 22 TPC-H plan shapes (partsupp-dependent
# queries are re-targeted at the lineitem/supplier face since the
# testdata has no partsupp table — the plan shape, not the schema, is
# the thing under test).  All eight are shared-SQL (identical text in
# both engines); money follows the integer-cents discipline and every
# threshold comparison is pure int64 (5·qty·cnt < Σqty, 2·Σqty > Σtot,
# 200·value > Σvalue) so no float rounding can flip a row.

_Q8_SQL = f"""
WITH flat AS (
  SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
         {_REV_Q} AS r,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN part     ON p_partkey = l_partkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n1.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation n2 ON n2.n_nationkey = s_nationkey
  WHERE r_name = 'EUROPE' AND p_type = 'ECONOMY'
)
SELECT o_year,
       CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN r ELSE 0 END)
            AS BIGINT) AS nation_rev_1e4,
       CAST(SUM(r) AS BIGINT) AS total_rev_1e4,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' THEN r ELSE 0 END)
             / CAST(SUM(r) AS DOUBLE), 6) AS mkt_share
FROM flat
GROUP BY o_year
"""


@register("national_market_share_q8", _Q8_SQL)
def national_market_share_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's revenue share inside a region's
    customer market by order year — six-table snowflake with the
    nation dimension under two roles, share via conditional sum over
    the same grouped pass (never two scans).  All four small dims
    broadcast; the two fact joins (orders, part) shuffle on their
    keys.  The share ratio divides two exact int64 sums."""
    for t in ("lineitem", "orders", "part", "customer", "nation",
              "region", "supplier"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q8_SQL)


_Q9_COST = ("CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) * 100"
            " * CAST(l_quantity AS BIGINT)")

_Q9_SQL = f"""
SELECT n_name AS supp_nation,
       CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS o_year,
       COUNT(*) AS n_lines,
       ROUND(CAST(SUM({_REV_Q} - {_Q9_COST}) AS DOUBLE) / 10000.0, 4)
         AS profit
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
WHERE p_name LIKE '%red%'
GROUP BY 1, 2
"""


@register("product_profit_q9", _Q9_SQL)
def product_profit_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus cost, both quantized to
    1e-4 before the subtraction so the sum is one exact int64 fold)
    per supplier nation per ship year, parts filtered by an
    un-pushable LIKE '%red%' (evaluated at the part scan — still
    prunes to two columns).  Cost re-targets p_retailprice x quantity
    since the testdata carries no partsupp (ref Q9 uses
    ps_supplycost)."""
    for t in ("lineitem", "part", "supplier", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q9_SQL)


_Q11_SQL = f"""
WITH v AS (
  SELECT l_partkey, CAST(SUM({_REV_Q}) AS BIGINT) AS value_1e4
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_5'
  GROUP BY 1
)
SELECT l_partkey, value_1e4,
       ROUND(CAST(value_1e4 AS DOUBLE) / 10000.0, 4) AS value
FROM v
WHERE 600 * value_1e4 > (SELECT CAST(SUM(value_1e4) AS BIGINT) FROM v)
"""


@register("important_parts_q11", _Q11_SQL)
def important_parts_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value restricted to one nation's
    suppliers, kept only where the part exceeds a fixed fraction of
    the SAME aggregate's grand total — the grouped-agg-vs-its-own-
    scalar-sum pattern (HAVING against a scalar subquery).  The
    fraction test is exact integer math (600*v > total, i.e. >1/600);
    re-targeted at lineitem value since there is no partsupp."""
    for t in ("lineitem", "supplier", "nation"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q11_SQL)


_Q12_SQL = """
SELECT l_linestatus AS ship_class,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders
JOIN lineitem ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
"""


@register("shipmode_priority_q12", _Q12_SQL)
def shipmode_priority_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-fact equi-join with the date window
    pushed to the lineitem scan, priority split via two conditional
    counts in one grouped pass (l_linestatus stands in for the
    testdata's missing l_shipmode)."""
    for t in ("orders", "lineitem"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q12_SQL)


_Q13_SQL = """
WITH c_orders AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON o_custkey = c_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY 1
)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders
GROUP BY 1
"""


@register("customer_distribution_q13", _Q13_SQL)
def customer_distribution_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: the count-of-counts distribution — LEFT JOIN
    with a residual predicate folded INTO the join condition (so
    zero-order customers survive as c_count=0), then a second
    aggregation over the first's output.  Two shuffles by
    construction; the second is 1500-key metadata."""
    for t in ("customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q13_SQL)


_Q16_SQL = """
SELECT p_brand, p_type, p_size,
       COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM part
JOIN lineitem ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#3'
  AND p_type <> 'ECONOMY'
  AND p_size IN (1, 2, 5, 11, 28, 37)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


@register("parts_supplier_variety_q16", _Q16_SQL)
def parts_supplier_variety_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: COUNT(DISTINCT) per part attribute triple with
    a NOT IN exclusion subquery — the null-aware anti-join path (the
    excluded set is provably non-null here, so it degenerates to a
    broadcast anti-join) plus the expand-based distinct aggregate."""
    for t in ("part", "lineitem", "supplier"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q16_SQL)


_Q17_SQL = f"""
SELECT COUNT(*) AS n_lines,
       ROUND(CAST(SUM({_REV_Q}) AS DOUBLE) / 10000.0 / 7.0, 4)
         AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#7'
  AND 5 * CAST(l_quantity AS BIGINT)
        * (SELECT COUNT(*) FROM lineitem l2
           WHERE l2.l_partkey = p_partkey)
      < (SELECT CAST(SUM(CAST(l3.l_quantity AS BIGINT)) AS BIGINT)
         FROM lineitem l3 WHERE l3.l_partkey = p_partkey)
"""


@register("small_qty_revenue_q17", _Q17_SQL)
def small_qty_revenue_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: lines below 20% of their part's mean quantity
    — TWO correlated scalar subqueries over the same fact, which the
    optimizer decorrelates into per-part aggregate joins.  The mean
    test is exact integer cross-multiplication (5*qty*cnt < sum(qty)),
    never a float AVG comparison."""
    for t in ("lineitem", "part"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q17_SQL)


_Q20_SQL = """
WITH w AS (
  SELECT l_suppkey, l_partkey,
         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
  FROM lineitem
  JOIN part ON p_partkey = l_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  GROUP BY 1, 2
),
tot AS (
  SELECT l_partkey, CAST(SUM(sq) AS BIGINT) AS tq
  FROM w GROUP BY 1
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT w.l_suppkey
  FROM w JOIN tot ON tot.l_partkey = w.l_partkey
  WHERE 2 * w.sq > tq
)
"""


@register("promo_part_suppliers_q20", _Q20_SQL)
def promo_part_suppliers_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped the majority (>50%) of
    some promo part's one-year volume — nested IN semi-join whose
    inner query is a two-level aggregate (per supplier-part, then
    per part) with an exact integer majority test (2*sq > tq;
    ps_availqty re-targeted at shipped volume, no partsupp)."""
    for t in ("lineitem", "part", "supplier"):
        load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_Q20_SQL)


# --- Fellegi–Sunter probabilistic record linkage --------------------------------
#
# The census/data-integration classic (Fellegi & Sunter 1969): link the
# customer dimension against a corrupted twin (derived in-plan by
# deterministic LCG perturbation — name typo 30%, segment swap 20%,
# balance jitter ±$10) using per-field match weights
# w = ln(m/u) on agreement, ln((1−m)/(1−u)) on disagreement, with
# link / possible / non-link decision bands.  Distinct from the dedup
# family: FS scores AGREEMENT PATTERNS across typed fields with
# trained m/u probabilities (baked literals here, the classifier-
# weights convention), not token-set similarity.
#
# Exactness: agreements are exact string/int comparisons (balances in
# cents); the score is a sum of three fixed double literals — bit-
# identical.  Scale shape: candidate pairs come from BLOCKING on
# nationkey (the standard FS practice) — Σ_b |block|², never |A|·|B|;
# at web scale the block key becomes (nation, name-prefix) and the
# same plan holds.

_FS_T = 2654435761
_FS_S = 1103515245
_FS_B = 48271

_FS_SQL = f"""
WITH cust AS (
  SELECT c_custkey AS k, c_nationkey AS nat, c_name AS nm,
         c_mktsegment AS seg,
         CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer
),
twin AS (
  SELECT k AS tk, nat AS tnat,
         CASE WHEN (k * {_FS_T}) % 100 < 30
              THEN CONCAT('Cust0mer', SUBSTRING(nm, 9)) ELSE nm END AS tnm,
         CASE WHEN (k * {_FS_S}) % 100 < 20
              THEN 'CORRUPTED' ELSE seg END AS tseg,
         cents + (k * {_FS_B}) % 2001 - 1000 AS tcents
  FROM cust
),
pairs AS (
  SELECT c.k, t.tk,
         CASE WHEN c.nm = t.tnm THEN 6.551080335043404
              ELSE -1.2029723039923526 END
         + CASE WHEN c.seg = t.tseg THEN 1.3862943611198906
                ELSE -1.3862943611198906 END
         + CASE WHEN ABS(c.cents - t.tcents) <= 500 THEN 3.912023005428146
                ELSE -0.6830968447064438 END AS score
  FROM cust c JOIN twin t ON t.tnat = c.nat
),
decided AS (
  SELECT CASE WHEN score >= 6.0 THEN 'link'
              WHEN score >= 0.0 THEN 'possible' ELSE 'non-link' END
           AS decision,
         CASE WHEN k = tk THEN 1 ELSE 0 END AS is_true
  FROM pairs
)
SELECT decision,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(is_true) AS BIGINT) AS n_true_matches,
       ROUND(CAST(SUM(is_true) AS DOUBLE) / COUNT(*), 6) AS precision_band
FROM decided
GROUP BY 1
"""


@register("fellegi_sunter_linkage", _FS_SQL)
def fellegi_sunter_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter record linkage of the customer dimension against
    its LCG-corrupted twin: nation blocking, three-field agreement
    weights, link/possible/non-link bands with per-band precision."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_FS_SQL)


# --- market-basket association rules (Agrawal & Srikant a-priori pass) ---------
#
# Support / confidence / lift over order baskets — the canonical
# distributed co-occurrence workload (and PMI's basket-data sibling:
# lift is PMI's exponential on transaction support).  The pair join is
# a-priori pruned: items below the pair support floor cannot appear in
# a qualifying pair, so they are dropped BEFORE the per-basket
# self-join (the hot-bucket rule on basket data); per-basket fan-out
# is bounded by basket size squared (~4^2 here, never |items|^2).
#
# All supports are exact int64; confidence and lift are final
# correctly-rounded ratios.  Rules are emitted in both directions
# (confidence is asymmetric).

_MB_MINSUP = 3  # pair support floor (items pruned at the same floor)

_MB_SQL = f"""
WITH b AS (
  SELECT DISTINCT l_orderkey AS oid, CAST(l_partkey AS BIGINT) AS item
  FROM lineitem
),
ntx AS (SELECT CAST(COUNT(DISTINCT oid) AS BIGINT) AS n FROM b),
supp AS (
  SELECT item, CAST(COUNT(*) AS BIGINT) AS s FROM b GROUP BY 1
),
freq AS (SELECT item, s FROM supp WHERE s >= {_MB_MINSUP}),
fb AS (
  SELECT b.oid, b.item FROM b JOIN freq f ON f.item = b.item
),
pairs AS (
  SELECT a.item AS i1, c.item AS i2, CAST(COUNT(*) AS BIGINT) AS sab
  FROM fb a JOIN fb c ON c.oid = a.oid AND a.item < c.item
  GROUP BY 1, 2
  HAVING COUNT(*) >= {_MB_MINSUP}
),
rules AS (
  SELECT i1 AS antecedent, i2 AS consequent, sab FROM pairs
  UNION ALL
  SELECT i2, i1, sab FROM pairs
)
SELECT r.antecedent, r.consequent, r.sab AS pair_support,
       sa.s AS ante_support,
       ROUND(CAST(r.sab AS DOUBLE) / sa.s, 4) AS confidence,
       ROUND(CAST(r.sab AS DOUBLE) * ntx.n
             / (CAST(sa.s AS DOUBLE) * sc.s), 4) AS lift
FROM rules r
JOIN supp sa ON sa.item = r.antecedent
JOIN supp sc ON sc.item = r.consequent
CROSS JOIN ntx
"""


@register("market_basket_rules", _MB_SQL)
def market_basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over order baskets: a-priori-pruned pair
    supports, directional confidence, lift — exact integer supports,
    basket-bounded pair fan-out."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_MB_SQL)


# --- Soundex phonetic blocking audit (record-linkage verb) ---------------------
#
# American Soundex (Russell 1918; the variant WITHOUT the h/w
# transparency rule, stated explicitly since both engines share the
# text): first letter + the first three consonant-class digits, where
# any intervening character (vowel, digit, punctuation) breaks
# run-collapsing.  Applied to the SAME corrupted-twin fixture as
# fellegi_sunter_linkage: the 30% name corruption ('Customer' ->
# 'Cust0mer') defeats EXACT-name blocking but not phonetic blocking —
# the digit '0' is a non-coding character, so both spellings encode
# C236.  The audit reports exact-match vs soundex-match recall over
# the true pairs plus the blocking-quality histogram (code block
# sizes — the Σ|block|² cost driver).
#
# Determinism: the encoding is CASE chains + one LAG + three
# positional MAX-pivots (no order-unstable string_agg); everything is
# integer/string-exact.  Scale: encoding is per-row column math; the
# audit joins on the true key (fixture) and on the code (bounded
# blocks).

_SDX_LEN = 12  # chars scanned per name (covers the letter prefix)


def _soundex_cte(src: str, name_col: str, key: str, tag: str) -> str:
    """CTEs computing soundex({name_col}) -> sdx_{tag}(k, code)."""
    code = (
        "CASE WHEN ch IN ('b','f','p','v') THEN '1' "
        "WHEN ch IN ('c','g','j','k','q','s','x','z') THEN '2' "
        "WHEN ch IN ('d','t') THEN '3' "
        "WHEN ch = 'l' THEN '4' "
        "WHEN ch IN ('m','n') THEN '5' "
        "WHEN ch = 'r' THEN '6' ELSE '0' END"
    )
    return f"""
ch_{tag} AS (
  SELECT {key} AS k, i AS pos,
         LOWER(SUBSTRING({name_col}, CAST(i AS INT), 1)) AS ch
  FROM {src} CROSS JOIN idx WHERE i <= LENGTH({name_col})
),
cd_{tag} AS (
  SELECT k, pos, {code} AS d FROM ch_{tag}
),
runs_{tag} AS (
  SELECT k, pos, d,
         LAG(d) OVER (PARTITION BY k ORDER BY pos) AS pd
  FROM cd_{tag}
),
digs_{tag} AS (
  SELECT k, d,
         ROW_NUMBER() OVER (PARTITION BY k ORDER BY pos) AS rn
  FROM runs_{tag}
  WHERE pos > 1 AND d <> '0' AND (pd IS NULL OR d <> pd)
),
sdx_{tag} AS (
  SELECT c.k,
         UPPER(SUBSTRING(n.nm0, 1, 1))
         || COALESCE(MAX(CASE WHEN d1.rn = 1 THEN d1.d END), '0')
         || COALESCE(MAX(CASE WHEN d2.rn = 2 THEN d2.d END), '0')
         || COALESCE(MAX(CASE WHEN d3.rn = 3 THEN d3.d END), '0')
           AS code
  FROM (SELECT DISTINCT k FROM cd_{tag}) c
  JOIN (SELECT {key} AS k, {name_col} AS nm0 FROM {src}) n ON n.k = c.k
  LEFT JOIN digs_{tag} d1 ON d1.k = c.k AND d1.rn = 1
  LEFT JOIN digs_{tag} d2 ON d2.k = c.k AND d2.rn = 2
  LEFT JOIN digs_{tag} d3 ON d3.k = c.k AND d3.rn = 3
  GROUP BY c.k, n.nm0
)"""


_SDX_SQL = f"""
WITH idx AS ({{seq}}),
cust AS (
  SELECT c_custkey AS k, c_name AS nm FROM customer
),
twin AS (
  SELECT k, CASE WHEN (k * {_FS_T}) % 100 < 30
                 THEN CONCAT('Cust0mer', SUBSTRING(nm, 9))
                 ELSE nm END AS tnm
  FROM cust
),
{_soundex_cte('cust', 'nm', 'k', 'a').strip()},
{_soundex_cte('twin', 'tnm', 'k', 'b').strip()},
truth AS (
  SELECT c.k,
         CASE WHEN c.nm = t.tnm THEN 1 ELSE 0 END AS name_eq,
         CASE WHEN sa.code = sb.code THEN 1 ELSE 0 END AS sdx_eq
  FROM cust c
  JOIN twin t ON t.k = c.k
  JOIN sdx_a sa ON sa.k = c.k
  JOIN sdx_b sb ON sb.k = c.k
),
-- composite blocking key (soundex, nation) — the fixture's name
-- universe folds to ONE phonetic code, so the code alone is a
-- degenerate single block; compounding with an uncorrupted field is
-- the standard FS practice and is what the Σ|block|² stats grade
blocks AS (
  SELECT s.code, c2.nat, CAST(COUNT(*) AS BIGINT) AS sz
  FROM sdx_a s
  JOIN (SELECT c_custkey AS k, c_nationkey AS nat FROM customer) c2
    ON c2.k = s.k
  GROUP BY 1, 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pairs,
       CAST(SUM(name_eq) AS BIGINT) AS exact_name_matches,
       CAST(SUM(sdx_eq) AS BIGINT) AS soundex_matches,
       ROUND(CAST(SUM(name_eq) AS DOUBLE) / COUNT(*), 4) AS exact_recall,
       ROUND(CAST(SUM(sdx_eq) AS DOUBLE) / COUNT(*), 4) AS soundex_recall,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM blocks) AS n_blocks,
       (SELECT CAST(MAX(sz) AS BIGINT) FROM blocks) AS max_block,
       (SELECT CAST(SUM(sz * sz) AS BIGINT) FROM blocks) AS sum_block_sq
FROM truth
"""

_SDX_SPARK = _SDX_SQL.format(
    seq=(
        "SELECT CAST(x AS BIGINT) AS i"
        f" FROM (SELECT explode(sequence(1, {_SDX_LEN})) AS x)"
    )
)
_SDX_ORACLE = _SDX_SQL.format(
    seq=(
        "SELECT CAST(UNNEST(generate_series(1,"
        f" {_SDX_LEN})) AS BIGINT) AS i"
    )
)


@register("soundex_blocking_audit", _SDX_ORACLE)
def soundex_blocking_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soundex phonetic blocking vs exact-name blocking over the
    corrupted-twin linkage fixture: recall of each blocking key on the
    true pairs plus block-size quality stats (the Σ|block|² driver)."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_SDX_SPARK)
