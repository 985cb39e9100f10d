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


# --- in-engine quality-classifier TRAINING (quantized logistic GD) -----------
#
# The scoring half lives in textops (quality_classifier_scores applies
# a fixed hashed-linear model); this is the TRAINING half: two
# unrolled rounds of full-batch logistic gradient descent over hashed
# bigram features, label = (lang = 'en'), the fastText-style
# recipe every crawl pipeline uses to bootstrap a quality filter.
#
# Exactness discipline (the repo rule: partition-order-independent,
# zero cross-engine tolerance):
# * weights live in INTEGER micro-units; gradients are sums of
#   per-document integer contributions q_d = FLOOR((p_d − y_d)·10^6) ·
#   n_{d,b} — the double-valued p_d is built ONLY from IEEE-correctly-
#   rounded ops (+, −, ×, ÷, ABS) via the rational "fast sigmoid"
#   p = 1/2 + z / (2·(1 + |z|)) — no exp/ln, so the FLOOR cannot flip
#   between engines;
# * the margin z = Σ n·w / (10^6 · n_feats) is one exact integer sum
#   per doc divided once.
#
# Scale shape per round: one broadcast join of the (≤ 2^9-row) weight
# table onto the exploded features + a doc-key agg (margins), one
# doc-key broadcast-back + bucket-key agg (gradients) — both partial+
# final on uniform keys; rounds are unrolled, no driver-side state but
# the plan itself.

from chopin_spark.textops import (  # noqa: E402
    shingles_from_uh_duckdb, shingles_from_uh_spark,
    token_hashes_duckdb, token_hashes_spark,
)

_LR_B = 512
_LR_STEP = 4.0  # learning-rate divisor: delta_w = -FLOOR(g / (STEP·N))

_P_FROM_Z = "(0.5 + ({z}) / (2.0 * (1.0 + ABS({z}))))"


def _lr_round_ctes(rnd: int, prev_w: str | None) -> str:
    """CTEs for one GD round: q{rnd} (per-doc quantized residual),
    g{rnd} (per-bucket integer gradient), w{rnd} (updated weights)."""
    if prev_w is None:  # w = 0 ⇒ z = 0 ⇒ p = 1/2 on every doc
        q = f"""
q{rnd} AS (
  SELECT doc_id, y, CAST(FLOOR((0.5 - y) * 1000000) AS BIGINT) AS q
  FROM nd
)"""
    else:
        z = f"(CAST(zn AS DOUBLE) / (1000000.0 * n_feats))"
        p = _P_FROM_Z.format(z=z)
        q = f"""
z{rnd} AS (
  SELECT c.doc_id, MIN(c.y) AS y, MIN(nd.n_feats) AS n_feats,
         CAST(SUM(c.n * COALESCE(w.w, 0)) AS BIGINT) AS zn
  FROM cnt c
  JOIN nd ON nd.doc_id = c.doc_id
  LEFT JOIN {prev_w} w ON w.b = c.b
  GROUP BY 1
),
q{rnd} AS (
  SELECT doc_id, y,
         CAST(FLOOR(({p} - y) * 1000000) AS BIGINT) AS q
  FROM z{rnd}
)"""
    prev = f"COALESCE(w.w, 0)" if prev_w else "0"
    join_prev = f"LEFT JOIN {prev_w} w ON w.b = g.b" if prev_w else ""
    return f"""{q},
g{rnd} AS (
  SELECT c.b, CAST(SUM(c.n * q.q) AS BIGINT) AS g
  FROM cnt c JOIN q{rnd} q ON q.doc_id = c.doc_id
  GROUP BY 1
),
w{rnd} AS (
  SELECT g.b,
         CAST({prev} - FLOOR(CAST(g.g AS DOUBLE)
              / ({_LR_STEP!r} * (SELECT nn FROM ntot))) AS BIGINT) AS w
  FROM g{rnd} g {join_prev}
)"""


def _lr_sql(tok_hashes: str, bigrams: str, unnest: str) -> str:
    return f"""
WITH uh AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         {tok_hashes} AS _uh
  FROM documents
),
feats AS (
  SELECT doc_id, y, g % {_LR_B} AS b
  FROM (
    SELECT doc_id, y, {unnest} AS g
    FROM (SELECT doc_id, y, {bigrams} AS _bg FROM uh)
  )
),
cnt AS (
  SELECT doc_id, MIN(y) AS y, b, CAST(COUNT(*) AS BIGINT) AS n
  FROM feats GROUP BY doc_id, b
),
nd AS (
  SELECT doc_id, MIN(y) AS y, CAST(SUM(n) AS BIGINT) AS n_feats
  FROM cnt GROUP BY 1
),
ntot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nn FROM nd),
{_lr_round_ctes(1, None)},
{_lr_round_ctes(2, 'w1')}
SELECT b, w AS w_micro
FROM w2
"""


_LR_ORACLE = _lr_sql(
    token_hashes_duckdb(), shingles_from_uh_duckdb(2), "UNNEST(_bg)"
)
_LR_SPARK = _lr_sql(
    token_hashes_spark(), shingles_from_uh_spark(2), "explode(_bg)"
)


@register("quality_classifier_train", _LR_ORACLE)
def quality_classifier_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final per-bucket weights (integer micro-units) of the two-round
    quantized logistic trainer.

    The Spark text is the same recipe but is REBUILT as DataFrame ops
    below to keep the token-hash HOF un-inlined (the dsir lesson,
    tests/test_plans.py::test_no_hof_inline_blowup): feats
    materializes through an explode barrier, then the unrolled rounds
    are plain joins/aggs on it."""
    docs = load(spark, sf_dir, "documents")
    uh = docs.selectExpr(
        "doc_id", "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y",
        f"{token_hashes_spark()} AS _uh",
    )
    feats = uh.select(
        "doc_id", "y",
        F.explode(F.expr(shingles_from_uh_spark(2))).alias("g"),
    ).select("doc_id", "y", (F.col("g") % _LR_B).alias("b"))
    cnt = feats.groupBy("doc_id", "b").agg(
        F.min("y").alias("y"), F.count(F.lit(1)).cast("long").alias("n")
    )
    nd = cnt.groupBy("doc_id").agg(
        F.min("y").alias("y"), F.sum("n").cast("long").alias("n_feats")
    )
    n_total = float(nd.count())

    # round 1: w = 0 ⇒ p = 1/2
    q1 = nd.selectExpr(
        "doc_id", "CAST(FLOOR((0.5 - y) * 1000000) AS BIGINT) AS q"
    )
    g1 = (
        cnt.join(q1, "doc_id")
        .groupBy("b")
        .agg(F.sum(F.col("n") * F.col("q")).cast("long").alias("g"))
    )
    w1 = g1.selectExpr(
        "b",
        f"CAST(0 - FLOOR(CAST(g AS DOUBLE) / ({_LR_STEP!r} * {n_total!r}))"
        " AS BIGINT) AS w",
    )

    # round 2
    z2 = (
        cnt.join(nd.select("doc_id", "n_feats"), "doc_id")
        .join(F.broadcast(w1), "b", "left")
        .groupBy("doc_id")
        .agg(
            F.min("y").alias("y"),
            F.min("n_feats").alias("n_feats"),
            F.sum(F.col("n") * F.coalesce(F.col("w"), F.lit(0)))
            .cast("long")
            .alias("zn"),
        )
    )
    zexpr = "(CAST(zn AS DOUBLE) / (1000000.0 * n_feats))"
    q2 = z2.selectExpr(
        "doc_id",
        f"CAST(FLOOR(({_P_FROM_Z.format(z=zexpr)} - y) * 1000000)"
        " AS BIGINT) AS q",
    )
    g2 = (
        cnt.join(q2, "doc_id")
        .groupBy("b")
        .agg(F.sum(F.col("n") * F.col("q")).cast("long").alias("g"))
    )
    w2 = g2.join(F.broadcast(w1.withColumnRenamed("w", "w_prev")), "b", "left")
    return w2.selectExpr(
        "b",
        "CAST(COALESCE(w_prev, 0)"
        f" - FLOOR(CAST(g AS DOUBLE) / ({_LR_STEP!r} * {n_total!r}))"
        " AS BIGINT) AS w_micro",
    )


# --- Heaps'-law vocabulary growth curve ----------------------------------------
#
# Tokenizer/corpus curation diagnostic: how fast does the vocabulary
# still grow as the corpus doubles?  The curve is computed without any
# sequential pass: a word's FIRST APPEARANCE is min(doc_id) (one
# vocabulary-bounded agg), the corpus prefix axis is doc-id deciles,
# and cumulative vocabulary is a 10-row window sum.  Integer-exact
# end to end.  At 10^12 docs the NTILE over doc order becomes decile
# boundaries from exact count quantiles (the par_cut_coords path);
# the first-appearance agg shape is unchanged.

_HEAPS_ORACLE = """
WITH d AS (
  SELECT doc_id, NTILE(10) OVER (ORDER BY doc_id) AS dec FROM documents
),
w AS (
  SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents
),
fw AS (
  SELECT word, MIN(doc_id) AS first_doc FROM w GROUP BY 1
),
nd AS (
  SELECT d.dec, COUNT(*) AS n_new
  FROM fw JOIN d ON d.doc_id = fw.first_doc GROUP BY 1
),
dd AS (
  SELECT dec, COUNT(*) AS n_docs FROM d GROUP BY 1
)
SELECT CAST(dd.dec AS BIGINT) AS decile,
       CAST(dd.n_docs AS BIGINT) AS n_docs,
       CAST(COALESCE(nd.n_new, 0) AS BIGINT) AS n_new_words,
       CAST(SUM(COALESCE(nd.n_new, 0))
            OVER (ORDER BY dd.dec) AS BIGINT) AS cum_vocab
FROM dd LEFT JOIN nd ON nd.dec = dd.dec
"""


@register("vocab_growth_heaps", _HEAPS_ORACLE)
def vocab_growth_heaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth by corpus decile (Heaps' law curve): new-word
    count = first-appearance agg per word; cumulative vocabulary = a
    10-row window sum."""
    from pyspark.sql import Window

    docs = load(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", F.ntile(10).over(Window.orderBy("doc_id")).alias("dec")
    )
    fw = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("word")
        .agg(F.min("doc_id").alias("first_doc"))
    )
    nd = (
        fw.join(d, fw.first_doc == d.doc_id)
        .groupBy("dec")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    dd = d.groupBy("dec").agg(F.count(F.lit(1)).alias("n_docs"))
    out = dd.join(nd, "dec", "left").select(
        F.col("dec").cast("long").alias("decile"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.coalesce("n_new", F.lit(0)).cast("long").alias("n_new_words"),
    )
    return out.withColumn(
        "cum_vocab",
        F.sum("n_new_words").over(
            Window.orderBy("decile").rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ).cast("long"),
    )


# --- per-host token entropy -----------------------------------------------------
#
# Template-farm detection: a host whose pages are one boilerplate
# template has LOW unigram entropy; a diverse host is near the corpus
# ceiling.  H = ln(T) − Σ n·ln(n) / T with exact-integer count
# carriers; ln enters once per DISTINCT (host, word) and the summed
# ≤1-ulp per-element divergence is ~1e-12 against the 1e-4 output
# grid (the lm_perplexity_bigram error-budget argument — see module
# docstring).  Shape: one (host, word) agg (vocabulary-bounded per
# host) + one host agg; the 97-host key follows host_quality_wilson's
# fixture so singleton hosts don't trivialize the statistic.

_ENT_HOST = "('h' || CAST((doc_id * 40503) % 97 AS STRING) || '.example.com')"

_ENT_ORACLE = f"""
WITH w AS (
  SELECT {_ENT_HOST} AS host,
         UNNEST(STRING_SPLIT(text, ' ')) AS word
  FROM documents
),
cnt AS (
  SELECT host, word, CAST(COUNT(*) AS BIGINT) AS n FROM w GROUP BY 1, 2
),
h AS (
  SELECT host,
         CAST(SUM(n) AS BIGINT) AS t,
         CAST(COUNT(*) AS BIGINT) AS vocab,
         SUM(CAST(n AS DOUBLE) * LN(CAST(n AS DOUBLE))) AS s
  FROM cnt GROUP BY 1
)
SELECT host, t AS n_tokens, vocab,
       ROUND(LN(CAST(t AS DOUBLE)) - s / CAST(t AS DOUBLE), 4) AS entropy
FROM h
"""


@register("host_token_entropy", _ENT_ORACLE)
def host_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram Shannon entropy per host (template-farm detector):
    H = ln(T) − Σ n·ln(n)/T over exact integer counts."""
    docs = load(spark, sf_dir, "documents")
    cnt = (
        docs.selectExpr(
            f"{_ENT_HOST} AS host",
            "explode(split(text, ' ')) AS word",
        )
        .groupBy("host", "word")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        cnt.groupBy("host")
        .agg(
            F.sum("n").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("vocab"),
            F.sum(
                F.col("n").cast("double")
                * F.log(F.col("n").cast("double"))
            ).alias("s"),
        )
        .selectExpr(
            "host", "n_tokens", "vocab",
            "ROUND(LN(CAST(n_tokens AS DOUBLE))"
            " - s / CAST(n_tokens AS DOUBLE), 4) AS entropy",
        )
    )


# --- Zipf rank-frequency slope (Heaps'-law twin) -------------------------------
#
# The corpus-health scaling exponent: OLS of ln(count) on ln(rank)
# over the top-200 terms.  Ranks are deterministic (count DESC, term)
# over the vocabulary-bounded frequency table; both logs land on the
# 1e-6 integer lattice before any sum (the repo's ln ROUND-grain
# discipline), so the five OLS moments are exact int64.


def _zipf_sql(tok: str) -> str:
    return f"""
WITH w AS (
  SELECT {tok} AS word FROM documents
),
cnt AS (
  SELECT word, COUNT(*) AS c FROM w GROUP BY 1
),
rk AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, word) AS r FROM cnt
),
lat AS (
  SELECT CAST(FLOOR(LN(CAST(r AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(LN(CAST(c AS DOUBLE)) * 1000000 + 0.5) AS BIGINT) AS y
  FROM rk WHERE r <= 200
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM lat
)
SELECT n AS n_terms,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx),
             6) AS zipf_slope,
       ROUND((CAST(sy AS DOUBLE)
              - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                 / (CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx))
                * CAST(sx AS DOUBLE))
             / CAST(n AS DOUBLE) / 1000000.0,
             4) AS ln_c_at_rank1
FROM s
"""


@register(
    "zipf_slope_terms",
    _zipf_sql("UNNEST(STRING_SPLIT(text, ' '))"),
)
def zipf_slope_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf exponent of the term rank-frequency curve (top-200 ranks),
    integer-lattice logs, exact OLS moments."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_zipf_sql("explode(split(text, ' '))"))


# --- CCNet head/middle/tail perplexity buckets ---------------------------------
#
# CCNet's defining curation move (Wenzek et al. 2020): per language,
# split the corpus into head/middle/tail TERCILES of the LM score and
# report each bucket's document count and token mass (the head bucket
# is what gets trained on; tail is discarded or down-weighted).
#
# Bucketing is HISTOGRAM-based, never a global sort of documents: the
# per-doc scores fold to (lang, score-bin) counts first, the cumulative
# window runs over the metadata-sized bin domain (1e-4 grain), and the
# tercile test is exact integer math over bin-start ranks
# (3*(cum-c) < tot), so every doc in a bin lands in one deterministic
# bucket in both engines.  This is the quantile_grid/percentile-norm
# scale pattern applied to CCNet: at crawl scale the only shuffle
# beyond the scoring joins is the (lang, bin) count.

_BUCKET_BODY = """
hist AS (
  SELECT lang,
         CAST(FLOOR(nll_per_tok * 10000 + 0.5) AS BIGINT) AS s,
         COUNT(*) AS c,
         CAST(SUM(n_bigrams) AS BIGINT) AS m
  FROM scored
  GROUP BY 1, 2
),
cum AS (
  SELECT lang, s, c, m,
         SUM(c) OVER (PARTITION BY lang ORDER BY s) AS cc,
         SUM(c) OVER (PARTITION BY lang) AS tot
  FROM hist
),
b AS (
  SELECT lang, c, m,
         CASE WHEN 3 * (cc - c) < tot THEN 'head'
              WHEN 3 * (cc - c) < 2 * tot THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM cum
)
SELECT lang, bucket,
       CAST(SUM(c) AS BIGINT) AS n_docs,
       CAST(SUM(m) AS BIGINT) AS n_bigrams
FROM b
GROUP BY 1, 2
"""

_CCNET_ORACLE = f"WITH scored AS ({_LM_ORACLE}),\n{_BUCKET_BODY.lstrip()}"


@register("ccnet_perplexity_buckets", _CCNET_ORACLE)
def ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail terciles of the bigram-LM score per
    language, with per-bucket doc counts and bigram mass.  Reuses the
    lm_perplexity_bigram scoring plan verbatim, then buckets through
    the score histogram (no global doc sort — the window runs over
    1e-4-grain score bins per language)."""
    lm_perplexity_bigram(spark, sf_dir).createOrReplaceTempView("scored")
    return spark.sql(f"WITH {_BUCKET_BODY.lstrip()}")


# --- BPE merge training (3 greedy rounds, vocab-local) --------------------------
#
# Sennrich et al. byte-pair-encoding TRAINING, the step upstream of
# token_bpe_stats: count adjacent-symbol pairs weighted by word
# frequency, merge the argmax pair everywhere, repeat.  The corpus is
# touched exactly ONCE (the word-frequency agg); every round after that
# runs on the vocabulary table (31 rows here; O(|vocab|) at crawl
# scale — the reason BPE training is feasible on 10^12 docs at all).
# Merging uses left-to-right non-overlapping REPLACE on the
# space-padded symbol string — both engines scan the original string
# identically, so consecutive overlapping sites resolve the same way.
# Argmax ties break on (count DESC, left, right): deterministic.

_BPE_ROUNDS = 3
_BPE_MAXLEN = 12

_BPE_CHARSEQ = "(' ' || TRIM(CONCAT(" + ", ".join(
    f"CASE WHEN LENGTH(w) >= {k} THEN SUBSTR(w, {k}, 1) || ' ' ELSE '' END"
    for k in range(1, _BPE_MAXLEN + 1)
) + ")) || ' ')"

_BPE_SYMS = "(LENGTH(TRIM(seq)) - LENGTH(REPLACE(TRIM(seq), ' ', '')) + 1)"


def _bpe_wf(tok_gen: str) -> str:
    return (f"SELECT w, CAST(COUNT(*) AS BIGINT) AS f, {_BPE_CHARSEQ} AS seq"
            f" FROM ({tok_gen}) tk GROUP BY 1")


_BPE_TOKS_DUCK = "SELECT UNNEST(STRING_SPLIT(text, ' ')) AS w FROM documents"
_BPE_TOKS_SPARK = "SELECT explode(split(text, ' ')) AS w FROM documents"


def _bpe_pairs_duck(src: str) -> str:
    return f"""SELECT w1, w2, CAST(SUM(f) AS BIGINT) AS c FROM (
  SELECT f, wl[i] AS w1, wl[i + 1] AS w2 FROM (
    SELECT f, wl, UNNEST(generate_series(1, LEN(wl) - 1)) AS i
    FROM (SELECT f, STRING_SPLIT(TRIM(seq), ' ') AS wl FROM {src}) q0
    WHERE LEN(wl) >= 2
  ) q1
) q2 GROUP BY 1, 2"""


def _bpe_pairs_spark(src: str) -> str:
    return f"""SELECT w1, w2, CAST(SUM(f) AS BIGINT) AS c FROM (
  SELECT f, p.w1 AS w1, p.w2 AS w2 FROM (
    SELECT f, explode(transform(sequence(1, size(wl) - 1),
      i -> named_struct('w1', element_at(wl, CAST(i AS INT)),
                        'w2', element_at(wl, CAST(i + 1 AS INT))))) AS p
    FROM (SELECT f, split(trim(seq), ' ') AS wl FROM {src}) q0
    WHERE size(wl) >= 2
  ) q1
) q2 GROUP BY 1, 2"""


def _bpe_argmax(pairs: str) -> str:
    return (f"SELECT w1, w2, c FROM ({pairs}) pr"
            " ORDER BY c DESC, w1, w2 LIMIT 1")


def _bpe_merge(src: str, m: str) -> str:
    return f"""SELECT w, f,
  REPLACE(seq, ' ' || m.w1 || ' ' || m.w2 || ' ',
          ' ' || m.w1 || m.w2 || ' ') AS seq
FROM {src} CROSS JOIN {m} m"""


def _bpe_round_row(r: int, m: str, s_after: str) -> str:
    return f"""SELECT CAST({r} AS BIGINT) AS round,
  m.w1 AS merge_left, m.w2 AS merge_right, m.c AS pair_count,
  (SELECT CAST(SUM(f * {_BPE_SYMS}) AS BIGINT) FROM {s_after})
    AS corpus_symbols_after
FROM {m} m"""


def _bpe_oracle() -> str:
    ctes = [f"s0 AS ({_bpe_wf(_BPE_TOKS_DUCK)})"]
    rows = []
    for r in range(1, _BPE_ROUNDS + 1):
        ctes.append(
            f"m{r} AS ({_bpe_argmax(_bpe_pairs_duck(f's{r - 1}'))})"
        )
        ctes.append(f"s{r} AS ({_bpe_merge(f's{r - 1}', f'm{r}')})")
        rows.append(_bpe_round_row(r, f"m{r}", f"s{r}"))
    return "WITH " + ",\n".join(ctes) + "\n" + "\nUNION ALL\n".join(rows)


@register("bpe_merge_train", _bpe_oracle())
def bpe_merge_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy BPE merge training, 3 rounds: per round the merged pair,
    its frequency-weighted count, and the corpus symbol count after
    applying it.  Spark builds the rounds imperatively (localCheckpoint
    per round) so the single word-frequency fact agg is never re-run
    per UNION branch — the tile-pyramid no-rescan discipline."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    s = spark.sql(_bpe_wf(_BPE_TOKS_SPARK)).localCheckpoint()
    rows = None
    for r in range(1, _BPE_ROUNDS + 1):
        s.createOrReplaceTempView(f"bpe_s{r - 1}")
        m = spark.sql(
            _bpe_argmax(_bpe_pairs_spark(f"bpe_s{r - 1}"))
        ).localCheckpoint()
        m.createOrReplaceTempView(f"bpe_m{r}")
        s = spark.sql(
            _bpe_merge(f"bpe_s{r - 1}", f"bpe_m{r}")
        ).localCheckpoint()
        s.createOrReplaceTempView(f"bpe_sa{r}")
        row = spark.sql(_bpe_round_row(r, f"bpe_m{r}", f"bpe_sa{r}"))
        rows = row if rows is None else rows.unionAll(row)
    return rows


# --- interpolated Kneser–Ney bigram LM ----------------------------------------
#
# The smoothing the KenLM models CCNet actually ships use (modified KN;
# here the classic single-discount interpolated form, D = 0.75):
#
#   P(w2|w1) = max(c(w1w2) − D, 0)/c(w1•)
#            + (D·N1+(w1•)/c(w1•)) · Pcont(w2)
#   Pcont(w2) = (N1+(•w2) + 1) / (N1+(••) + V)       [add-1 OOV floor]
#
# with the unseen-prefix backoff P = Pcont.  Every carrier (c2, c1,
# N1+ fan-outs, V) is an exact int64 count; D = 0.75 is an exactly
# representable double, and each probability is a fixed-order chain of
# correctly-rounded double ops — bit-identical cross-engine — so only
# the final LN() needs the ROUND-4 error budget (same argument as
# lm_perplexity_bigram above).
#
# Scale shape: identical to the add-1 LM — two count shuffles over the
# train slice plus one per-suffix count, then hash joins on (w1,w2),
# (w1), (w2); N1+(••) and V cross in as 1-row broadcasts.  The KN
# continuation counts are the piece add-1 lacks: they cost one extra
# vocabulary-bounded aggregate over c2, nothing over the fact.

_KN_PCONT = (
    "(CAST(COALESCE(nb.n1b, 0) + 1 AS DOUBLE) / (tot.n1all + vocab.v))"
)

_KN_BODY = f"""
c2 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM bg
  WHERE doc_id % 10 = 0 GROUP BY 1, 2
),
c1 AS (
  SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1,
         CAST(COUNT(*) AS BIGINT) AS n1f
  FROM c2 GROUP BY 1
),
nb AS (SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1b FROM c2 GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1all FROM c2),
vocab AS (SELECT CAST(COUNT(DISTINCT tok) AS BIGINT) AS v FROM uni),
scored AS (
  SELECT bg.doc_id, bg.lang,
         CASE WHEN c2.c2 IS NULL THEN 1 ELSE 0 END AS unseen,
         CASE
           WHEN c1.c1 IS NULL THEN {_KN_PCONT}
           WHEN c2.c2 IS NULL THEN
             ((0.75 * CAST(c1.n1f AS DOUBLE)) / c1.c1) * {_KN_PCONT}
           ELSE
             (CAST(c2.c2 AS DOUBLE) - 0.75) / c1.c1
             + ((0.75 * CAST(c1.n1f AS DOUBLE)) / c1.c1) * {_KN_PCONT}
         END AS p
  FROM bg
  LEFT JOIN c2 ON bg.w1 = c2.w1 AND bg.w2 = c2.w2
  LEFT JOIN c1 ON bg.w1 = c1.w1
  LEFT JOIN nb ON bg.w2 = nb.w2
  CROSS JOIN tot CROSS JOIN vocab
  WHERE bg.doc_id % 10 <> 0
)
SELECT doc_id, lang, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(unseen) AS BIGINT) AS n_unseen,
       ROUND(SUM(0.0 - LN(p)) / COUNT(*), 4) AS kn_nll_per_tok
FROM scored GROUP BY 1, 2
"""

_KN_TOKS_DUCK = """
toks AS (
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
uni AS (
  SELECT UNNEST(w) AS tok FROM toks WHERE doc_id % 10 = 0
)"""

_KN_TOKS_SPARK = """
toks AS (
  SELECT doc_id, lang, split(text, ' ') AS w FROM documents
),
bg AS (
  SELECT doc_id, lang, p.w1 AS w1, p.w2 AS w2
  FROM (
    SELECT doc_id, lang,
           explode(transform(sequence(1, size(w) - 1),
                   i -> named_struct('w1', element_at(w, i),
                                     'w2', element_at(w, i + 1)))) AS p
    FROM toks WHERE size(w) >= 2
  )
),
uni AS (
  SELECT explode(w) AS tok FROM toks WHERE doc_id % 10 = 0
)"""

_KN_SPARK = f"WITH {_KN_TOKS_SPARK.strip()},\n{_KN_BODY.strip()}"
_KN_ORACLE = f"WITH {_KN_TOKS_DUCK.strip()},\n{_KN_BODY.strip()}"


@register("kneser_ney_bigram_ppl", _KN_ORACLE)
def kneser_ney_bigram_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser–Ney bigram NLL per held-out document —
    the continuation-count smoothing of production KenLM filters,
    trained in-engine on the doc_id%10==0 slice."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_KN_SPARK)
