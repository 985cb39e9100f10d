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
