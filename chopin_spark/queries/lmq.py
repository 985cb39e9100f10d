"""CCNet-style statistical language-model quality filter: train an
add-1-smoothed bigram LM on a held-out corpus slice, score every other
document by mean negative log-likelihood (the perplexity proxy CCNet
thresholds per language with a KenLM model — here the LM itself is
trained distributed, in-engine).

Complements doc_commonness_score (coverage2.py), which is the
integer-exact corpus-frequency stand-in; this is the actual
conditional-probability LM with train/score separation, smoothing, and
an OOV path.  Floats appear only in the final LN()/divide; the count
carriers (c2, c1, V, n_oov) are exact integers, and the per-doc score
is ROUND 4 (per-element ln differs across engines by ≤1 ulp; the
summed error is ~1e-12 against a 1e-4 grid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark.queries import register
from chopin_spark.tables import load

_LM_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS w FROM documents
),
bg AS (
  SELECT doc_id, lang, w[i] AS w1, w[i + 1] AS w2
  FROM (
    SELECT doc_id, lang, w,
           UNNEST(generate_series(1, LEN(w) - 1)) AS i
    FROM toks WHERE LEN(w) >= 2
  )
),
c2 AS (
  SELECT w1, w2, COUNT(*) AS c2 FROM bg WHERE doc_id % 10 = 0
  GROUP BY 1, 2
),
c1 AS (
  SELECT w1, COUNT(*) AS c1 FROM bg WHERE doc_id % 10 = 0 GROUP BY 1
),
vocab AS (
  SELECT COUNT(DISTINCT tok) AS v FROM (
    SELECT UNNEST(w) AS tok FROM toks WHERE doc_id % 10 = 0
  )
)
SELECT bg.doc_id, bg.lang,
       COUNT(*) AS n_bigrams,
       CAST(SUM(CASE WHEN c2.c2 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       ROUND(SUM(LN(CAST(COALESCE(c1.c1, 0) + vocab.v AS DOUBLE))
                 - LN(CAST(COALESCE(c2.c2, 0) + 1 AS DOUBLE)))
             / COUNT(*), 4) AS nll_per_tok
FROM bg
LEFT JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2
LEFT JOIN c1 ON bg.w1 = c1.w1
CROSS JOIN vocab
WHERE bg.doc_id % 10 <> 0
GROUP BY 1, 2
"""


@register("lm_perplexity_bigram", _LM_ORACLE)
def lm_perplexity_bigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed bigram-LM perplexity scoring (CCNet's quality
    signal, trained in-engine on the doc_id%10==0 slice).

    Scale shape: two count shuffles over the train slice (bigram and
    prefix keys — vocabulary-bounded, stopword-pair skew absorbed by
    AQE), then two hash joins of the scored bigram stream against the
    count tables on the same keys.  The vocabulary size V is a 1-row
    aggregate crossed in as a broadcast (metadata, not data).  Unseen
    bigram → c2=0 (add-1 numerator), unseen prefix → uniform 1/V —
    exactly the oracle's COALESCE arithmetic."""
    docs = load(spark, sf_dir, "documents")
    w = F.split(F.col("text"), " ")
    pairs = F.transform(
        F.sequence(F.lit(0), F.size("w") - 2),
        lambda i: F.struct(
            F.element_at(F.col("w"), (i + 1).cast("int")).alias("w1"),
            F.element_at(F.col("w"), (i + 2).cast("int")).alias("w2"),
        ),
    )
    bg = (
        docs.select("doc_id", "lang", w.alias("w"))
        .filter(F.size("w") >= 2)
        .select("doc_id", "lang", F.explode(pairs).alias("p"))
        .select("doc_id", "lang", F.col("p.w1").alias("w1"),
                F.col("p.w2").alias("w2"))
    )
    train = bg.filter(F.col("doc_id") % 10 == 0)
    c2 = train.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    c1 = train.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab = (
        docs.filter(F.col("doc_id") % 10 == 0)
        .select(F.explode(w).alias("tok"))
        .agg(F.countDistinct("tok").alias("v"))
    )
    scored = (
        bg.filter(F.col("doc_id") % 10 != 0)
        .join(c2, ["w1", "w2"], "left")
        .join(c1, ["w1"], "left")
        .crossJoin(F.broadcast(vocab))
    )
    nll = F.log(
        (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v")).cast("double")
    ) - F.log((F.coalesce(F.col("c2"), F.lit(0)) + 1).cast("double"))
    return (
        scored.groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum(
                F.when(F.col("c2").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_oov"),
            F.round(F.sum(nll) / F.count(F.lit(1)), 4).alias("nll_per_tok"),
        )
    )
