"""Classical ML estimators trained fully in-plan: multinomial naive
Bayes language identification (McCallum & Nigam 1998's event model —
the standard fast lang-ID baseline behind fastText-style classifiers).

Complements the existing learned models (logistic quality classifier
with unrolled GD rounds, queries/trainprep.py; bigram LMs,
queries/lmq.py): NB is the closed-form generative counterpart — no
iterations, training IS one groupBy.

Cross-engine discipline: the only transcendental is LN(), quantized to
int64 micro-nats (FLOOR(LN(x)*1e6 + 0.5), the lmq.py:474 pattern) the
moment it is computed, so every downstream sum and the argmax are
EXACT integer arithmetic — no float summation-order hazard between
engines.  Ties broken lexicographically by lang.

Scale shape (100 TB): the model is |vocab|x|lang| counts — one
map-side-combinable groupBy over the exploded train split.  Scoring
never densifies doc x lang x vocab: score(d,l) = prior(l) +
n_invocab(d)*q0(l) + SUM over the doc's SEEN (token,lang) pairs of
(q(t,l) - q0(l))*cnt, so the shuffled volume is the postings join
(test tokens x seen pairs) and two broadcast-sized dims (langs,
priors).  The confusion matrix folds to |lang|^2 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from chopin_spark.queries import register
from chopin_spark.tables import load

# quantized log: exact int64 micro-nats (lmq.py zipf_slope pattern)
_QLN = "CAST(FLOOR(LN(CAST({x} AS DOUBLE)) * 1000000 + 0.5) AS BIGINT)"


def _nb_sql(split_fn: str, unnest_fn: str) -> str:
    qln_cond = _QLN.format(x="(cnt + 1)")
    qln_den = _QLN.format(x="(ntok + v)")
    qln_prior = _QLN.format(x="n_train_docs")
    return f"""
WITH toks AS (
  SELECT doc_id, lang, {split_fn} AS tk,
         CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END AS is_test
  FROM documents
),
train_tok AS (
  SELECT lang, {unnest_fn} AS t FROM toks WHERE is_test = 0
),
vocab AS (SELECT DISTINCT t FROM train_tok),
vsize AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vocab),
lang_tot AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS ntok
  FROM train_tok GROUP BY 1
),
priors AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_train_docs
  FROM toks WHERE is_test = 0 GROUP BY 1
),
-- per-lang constants: the unseen-token quantized logprob q0 and the
-- quantized log prior (denominator of the prior cancels in argmax)
lang_const AS (
  SELECT lt.lang,
         CAST(0 AS BIGINT) - {qln_den} AS q0,
         {qln_prior} AS qprior
  FROM lang_tot lt
  JOIN priors p ON p.lang = lt.lang
  CROSS JOIN vsize
),
seen AS (
  SELECT lang, t, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM train_tok GROUP BY 1, 2
),
-- q(t,l) - q0(l): the seen-token bonus over the smoothing floor
bonus AS (
  SELECT s.lang, s.t,
         {qln_cond} AS qcond
  FROM seen s
),
test_tok AS (
  SELECT t.doc_id, t.lang AS true_lang, {unnest_fn} AS tok
  FROM toks t WHERE is_test = 1
),
test_cnt AS (
  SELECT doc_id, true_lang, tok, CAST(COUNT(*) AS BIGINT) AS c
  FROM test_tok GROUP BY 1, 2, 3
),
test_iv AS (
  SELECT tc.doc_id, tc.true_lang, tc.tok, tc.c
  FROM test_cnt tc JOIN vocab ON vocab.t = tc.tok
),
doc_iv AS (
  SELECT doc_id, true_lang, CAST(SUM(c) AS BIGINT) AS n_iv
  FROM test_iv GROUP BY 1, 2
),
doc_bonus AS (
  SELECT ti.doc_id, b.lang,
         CAST(SUM(ti.c * b.qcond) AS BIGINT) AS bsum
  FROM test_iv ti JOIN bonus b ON b.t = ti.tok
  GROUP BY 1, 2
),
scored AS (
  SELECT d.doc_id, d.true_lang, lc.lang,
         lc.qprior + d.n_iv * lc.q0 + COALESCE(db.bsum, CAST(0 AS BIGINT))
           AS score
  FROM doc_iv d
  CROSS JOIN lang_const lc
  LEFT JOIN doc_bonus db ON db.doc_id = d.doc_id AND db.lang = lc.lang
),
pred AS (
  SELECT doc_id, true_lang, lang AS predicted,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, lang ASC) AS rk
  FROM scored
)
SELECT true_lang, predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
FROM pred WHERE rk = 1
GROUP BY 1, 2
"""


_NB_SPARK = _nb_sql("split(text, ' ')", "explode(tk)")
_NB_ORACLE = _nb_sql("STRING_SPLIT(text, ' ')", "UNNEST(tk)")


@register("naive_bayes_lang_confusion", _NB_ORACLE)
def naive_bayes_lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial naive Bayes lang-ID trained on the 80% doc_id split
    and scored on the held-out 20%, add-1 smoothing, int64 micro-nat
    logprobs end-to-end; emits the confusion matrix."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_NB_SPARK)


# --- Burrows' Delta stylometry between sources ---------------------------------
#
# The standard authorship-attribution distance (Burrows 2002; Evert et
# al. 2017): z-score the relative frequencies of the top-m corpus
# words across the 5 ingest sources, Delta(a,b) = mean |z_a - z_b|.
#
# Exactness: relative frequencies are quantized ONCE to int64
# micro-frequencies (FLOOR(n*1e6/T + 0.5) — one correctly-rounded
# division, deterministic), after which mean/variance clear to exact
# integers: with ns sources, S = sum fq, V = ns*sum fq^2 - S^2
# (population variance x ns^2), z = (ns*fq - S)/sqrt(V), so
# |z_a - z_b| = ns*|fq_a - fq_b|/sqrt(V) — one sqrt + one division per
# term under the ROUND(4) grain.  The (word x source) frame is
# densified (absent pairs = 0) before moments; V = 0 words carry zero
# discriminating power and contribute 0.
#
# Scale shape: one vocabulary-bounded count agg; everything after is
# top-m x |sources| (metadata-sized).  Source pairs = |sources|^2/2.

_BD_TOP = 20


def _bd_sql(unnest_fn: str) -> str:
    return f"""
WITH tok AS (
  SELECT source, {unnest_fn} AS t
  FROM (SELECT source, tk FROM (
    SELECT source, {{split_fn}} AS tk FROM documents) q0) q1
),
cnt AS (
  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY 1, 2
),
tot AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS tt FROM cnt GROUP BY 1
),
topw AS (
  SELECT t FROM (
    SELECT t, SUM(n) AS g FROM cnt GROUP BY 1
    ORDER BY g DESC, t ASC LIMIT {_BD_TOP}
  ) q
),
dense AS (
  SELECT w.t, s.source,
         CAST(FLOOR(COALESCE(c.n, 0) * 1000000.0 / s.tt + 0.5) AS BIGINT)
           AS fq
  FROM topw w
  CROSS JOIN tot s
  LEFT JOIN cnt c ON c.t = w.t AND c.source = s.source
),
ns AS (SELECT CAST(COUNT(*) AS BIGINT) AS ns FROM tot),
mom AS (
  SELECT t,
         CAST(SUM(fq) AS BIGINT) AS s1,
         CAST((SELECT ns FROM ns) * SUM(fq * fq)
              - SUM(fq) * SUM(fq) AS BIGINT) AS v
  FROM dense GROUP BY 1
),
pairs AS (
  SELECT a.source AS src1, b.source AS src2, a.t,
         ABS(a.fq - b.fq) AS dfq
  FROM dense a
  JOIN dense b ON b.t = a.t AND a.source < b.source
)
SELECT p.src1, p.src2,
       ROUND(SUM(CASE WHEN m.v > 0
                      THEN CAST((SELECT ns FROM ns) AS DOUBLE) * p.dfq
                           / SQRT(CAST(m.v AS DOUBLE))
                      ELSE 0.0 END) / {_BD_TOP}, 4) AS burrows_delta,
       CAST(SUM(p.dfq) AS BIGINT) AS fq_l1
FROM pairs p JOIN mom m ON m.t = p.t
GROUP BY 1, 2
"""


_BD_SPARK = _bd_sql("explode(tk)").format(split_fn="split(text, ' ')")
_BD_ORACLE = _bd_sql("UNNEST(tk)").format(split_fn="STRING_SPLIT(text, ' ')")


@register("burrows_delta_sources", _BD_ORACLE)
def burrows_delta_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Burrows' Delta stylometric distance between every ingest-source
    pair over the top-20 word profile — micro-frequency int64 carriers,
    z-scores cleared to one sqrt + one division per term."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_BD_SPARK)


# --- IPS off-policy evaluation (Horvitz-Thompson / Li et al. 2011) -------------
#
# Offline evaluation of a target content-selection policy from logged
# interaction data — the recsys/bandit counterpart to the causal
# family in temporalq: context = lang, logged arm = ingest source,
# reward = length-quality indicator (n_chars >= 300), logging
# propensity = the empirical p(source|lang) on the eval split.  The
# target policy is trained on the doc_id%2=0 half (argmax per-lang
# mean reward, tie -> source asc) and evaluated on the held-out half.
#
# With empirical propensities the per-lang IPS sum COLLAPSES exactly:
# every matched row shares the same arm, so sum(r/p)/n =
# R_matched / n_matched — the estimator is a ratio of exact int64
# counts (the collapse is documented, not accidental; with true
# propensities the terms would differ and need the dyadic-sum
# discipline).  DM (direct method) reuses the train-split mean.
#
# Scale: two groupBys (train stats, eval stats) over (lang, source) —
# vocabulary-bounded; the policy is a broadcast-sized dimension.

_IPS_RW = "CASE WHEN n_chars >= 300 THEN 1 ELSE 0 END"

_IPS_SQL = f"""
WITH d AS (
  SELECT doc_id, lang, source, CAST({_IPS_RW} AS BIGINT) AS r,
         -- fold on floor(doc_id/20) parity: source IS doc_id % 20 in
         -- the fixture, so a doc_id%2 fold would put every even source
         -- in train and every odd source in eval (zero matched rows);
         -- (x - x%20)/20 is the exact-integer-division idiom (bare
         -- CAST(x/20) truncates in Spark but rounds in DuckDB)
         CAST((doc_id - (doc_id % 20)) / 20 AS BIGINT) % 2 AS fold
  FROM documents
),
train AS (
  SELECT lang, source,
         CAST(SUM(r) AS BIGINT) AS rs, CAST(COUNT(*) AS BIGINT) AS c
  FROM d WHERE fold = 0 GROUP BY 1, 2
),
policy AS (
  SELECT lang, source AS arm,
         ROUND(CAST(rs AS DOUBLE) / c, 4) AS dm_value
  FROM (
    SELECT lang, source, rs, c,
           ROW_NUMBER() OVER (
             PARTITION BY lang
             ORDER BY CAST(rs AS DOUBLE) / c DESC, source ASC
           ) AS rk
    FROM train
  ) q WHERE rk = 1
),
eval_stats AS (
  SELECT d.lang,
         CAST(COUNT(*) AS BIGINT) AS n_eval,
         CAST(SUM(CASE WHEN d.source = p.arm THEN 1 ELSE 0 END)
              AS BIGINT) AS n_matched,
         CAST(SUM(CASE WHEN d.source = p.arm THEN d.r ELSE 0 END)
              AS BIGINT) AS r_matched
  FROM d JOIN policy p ON p.lang = d.lang
  WHERE d.fold = 1
  GROUP BY 1
)
SELECT e.lang, p.arm AS target_arm, e.n_eval, e.n_matched,
       -- NULL when the target arm never appears in the eval fold
       -- (IPS undefined; Spark ANSI raises on /0, DuckDB returns inf)
       CASE WHEN e.n_matched = 0 THEN NULL
            ELSE ROUND(CAST(e.r_matched AS DOUBLE) / e.n_matched, 4)
       END AS ips_value,
       p.dm_value
FROM eval_stats e JOIN policy p ON p.lang = e.lang
"""


@register("ips_offline_policy_eval", _IPS_SQL)
def ips_offline_policy_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Off-policy evaluation of the per-lang best-source policy:
    train/eval doc split, empirical-propensity IPS (exactly collapsing
    to a matched-row count ratio) beside the direct-method estimate."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_IPS_SQL)


# --- single-pass OLS via normal equations (exact-int Gram + Cramer) -----------
#
# The classic "trillion-row regression in one aggregate": the Gram
# matrix X'X and moment vector X'y are SUM aggregates — map-side
# combinable, one shuffle of 14 scalars regardless of fact size — and
# the 4×4 normal-equation solve is a Cramer-rule cofactor expansion
# over those scalars (closed form, no iteration; the explicit-inverse
# analog of what MLlib's l-BFGS would fit).  Gradient methods need a
# pass per step; the normal-equation plan needs ONE pass, full stop —
# at 100 TB that is the entire cost difference.
#
# Cross-engine discipline: features are quantized to int64 at the scan
# (×100 on the 2-decimal money/rate columns — exact, the decimal-money
# rule), so every Gram entry is an EXACT int64 sum with no float
# summation-order hazard (bounds at sf1000: Σq·p ≈ 50·1e7·6e9 = 3e18,
# inside int64; y'y alone exceeds int64 and is carried as
# DECIMAL(38,0), exact in both engines, cast to DOUBLE once).  The
# determinants then evaluate a FIXED expression tree over those exact
# ints in DOUBLE — correctly-rounded IEEE ops, bit-identical across
# engines — and outputs round at 1e-6.

_OLS_Q = "CAST(l_quantity AS BIGINT)"
_OLS_D = "CAST(ROUND(l_discount * 100) AS BIGINT)"
_OLS_T = "CAST(ROUND(l_tax * 100) AS BIGINT)"
_OLS_Y = "CAST(ROUND(l_extendedprice * 100) AS BIGINT)"


def _det3(m) -> str:
    (a, b, c), (d, e, f), (g, h, i) = m
    return (
        f"({a} * ({e} * {i} - {f} * {h})"
        f" - {b} * ({d} * {i} - {f} * {g})"
        f" + {c} * ({d} * {h} - {e} * {g}))"
    )


def _det4(m) -> str:
    """Cofactor expansion along the first row — the SAME association
    order in both engines, so the double result is bit-identical."""
    minor = lambda r, c: [  # noqa: E731
        [m[i][j] for j in range(4) if j != c] for i in range(4) if i != r
    ]
    return (
        f"({m[0][0]} * {_det3(minor(0, 0))}"
        f" - {m[0][1]} * {_det3(minor(0, 1))}"
        f" + {m[0][2]} * {_det3(minor(0, 2))}"
        f" - {m[0][3]} * {_det3(minor(0, 3))})"
    )


_G = [
    ["gn", "gq", "gd", "gt"],
    ["gq", "gqq", "gqd", "gqt"],
    ["gd", "gqd", "gdd", "gdt"],
    ["gt", "gqt", "gdt", "gtt"],
]
_B = ["gy", "gqy", "gdy", "gty"]


def _replace_col(col: int):
    return [
        [(_B[i] if j == col else _G[i][j]) for j in range(4)]
        for i in range(4)
    ]


_OLS_BETas = ",\n       ".join(
    f"{_det4(_replace_col(k))} / {_det4(_G)} AS b{k}" for k in range(4)
)

_OLS_SQL = f"""
WITH q AS (
  SELECT {_OLS_Q} AS xq, {_OLS_D} AS xd, {_OLS_T} AS xt, {_OLS_Y} AS yy
  FROM lineitem
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(xq) AS BIGINT) AS sq, CAST(SUM(xd) AS BIGINT) AS sd,
         CAST(SUM(xt) AS BIGINT) AS st, CAST(SUM(yy) AS BIGINT) AS sy,
         CAST(SUM(xq * xq) AS BIGINT) AS sqq,
         CAST(SUM(xq * xd) AS BIGINT) AS sqd,
         CAST(SUM(xq * xt) AS BIGINT) AS sqt,
         CAST(SUM(xd * xd) AS BIGINT) AS sdd,
         CAST(SUM(xd * xt) AS BIGINT) AS sdt,
         CAST(SUM(xt * xt) AS BIGINT) AS stt,
         CAST(SUM(xq * yy) AS BIGINT) AS sqy,
         CAST(SUM(xd * yy) AS BIGINT) AS sdy,
         CAST(SUM(xt * yy) AS BIGINT) AS sty,
         CAST(SUM(CAST(yy * yy AS DECIMAL(38, 0))) AS DOUBLE) AS syy
  FROM q
),
g AS (
  SELECT CAST(n AS DOUBLE) AS gn,
         CAST(sq AS DOUBLE) AS gq, CAST(sd AS DOUBLE) AS gd,
         CAST(st AS DOUBLE) AS gt, CAST(sy AS DOUBLE) AS gy,
         CAST(sqq AS DOUBLE) AS gqq, CAST(sqd AS DOUBLE) AS gqd,
         CAST(sqt AS DOUBLE) AS gqt, CAST(sdd AS DOUBLE) AS gdd,
         CAST(sdt AS DOUBLE) AS gdt, CAST(stt AS DOUBLE) AS gtt,
         CAST(sqy AS DOUBLE) AS gqy, CAST(sdy AS DOUBLE) AS gdy,
         CAST(sty AS DOUBLE) AS gty, syy, n
  FROM s
),
beta AS (
  SELECT n, gn, gy, gqy, gdy, gty, syy,
         gq, gd, gt, gqq, gqd, gqt, gdd, gdt, gtt,
       {_OLS_BETas}
  FROM g
)
SELECT n,
       ROUND(b0 / 100.0, 6) AS beta_intercept,
       ROUND(b1 / 100.0, 6) AS beta_qty,
       ROUND(b2, 6) AS beta_discount,
       ROUND(b3, 6) AS beta_tax,
       ROUND(1.0 - (
         syy - 2.0 * (b0 * gy + b1 * gqy + b2 * gdy + b3 * gty)
         + (b0 * (b0 * gn + b1 * gq + b2 * gd + b3 * gt)
            + b1 * (b0 * gq + b1 * gqq + b2 * gqd + b3 * gqt)
            + b2 * (b0 * gd + b1 * gqd + b2 * gdd + b3 * gdt)
            + b3 * (b0 * gt + b1 * gqt + b2 * gdt + b3 * gtt))
       ) / (syy - gy * gy / gn), 9) AS r2
FROM beta
"""


@register("ols_price_normal_eq", _OLS_SQL)
def ols_price_normal_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OLS of extendedprice on (1, quantity, discount, tax) solved in
    ONE aggregate pass: exact-int64 Gram/moment sums, Cramer 4×4
    cofactor solve, R² from the same scalars — no gradient iterations,
    no second pass.  Coefficients reported in original units."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_OLS_SQL)
