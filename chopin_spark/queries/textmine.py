"""Text-mining trio over the documents table: robust winnowing
fingerprints (Schleimer, Wilkerson & Aiken, SIGMOD 2003 — the MOSS
local fingerprinting guarantee), RAKE keyword extraction (Rose et al.
2010 — degree/frequency scoring of stopword-delimited phrases), and
corpus readability from integer syllable/word/sentence aggregates
(Flesch 1948).

Complements the existing fingerprint family (doc_fingerprint is a
prefix polynomial hash, queries/textops.py:140; simhash / minhash are
whole-doc sketches): winnowing selects a position-robust SUBSET of
k-gram hashes with the guarantee that any match of length ≥ w+k−1 is
caught — the unit the reference-scale dedup literature uses for local
(substring-level) overlap, where the whole-doc sketches only see
global similarity.

Shared-SQL discipline: every carrier is exact int64 (shingle hashes
< 2^30 via chopin_spark.textops; the winnow argmin is packed as
h·2^20 + (2^20−1−pos), < 2^50; RAKE degree/freq are counts).  Doubles
appear only in final ROUND()ed ratio columns, always computed from
integer aggregates — never averaged over per-row doubles (summation
order is not cross-engine stable; integer sums are).

Scale shape (100 TB): winnowing is one narrow projection per document
(array HOFs + a window over ≤ doc-length rows partitioned BY doc) —
embarrassingly parallel, zero shuffles until the per-doc agg; the
selected-fingerprint density is ~2/(w+1), so downstream joins see a
4× smaller postings table than full shingling.  RAKE is two
vocabulary-bounded aggs over an exploded phrase-token frame.
Readability is a single linear scan folded to |lang| rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from chopin_spark.queries import register
from chopin_spark.tables import load
from chopin_spark.textops import (
    shingles_from_uh_duckdb,
    shingles_from_uh_spark,
    token_hashes_duckdb,
    token_hashes_spark,
)

# --- robust winnowing fingerprints ---------------------------------------------
#
# k = 5 token shingles, window w = 4.  For every window of w
# consecutive shingle hashes, select the minimum; ties broken by the
# RIGHTMOST minimal position (the "robust" rule that makes the
# selected set depend only on local content, not window phase).  The
# (min-hash, rightmost) argmin is one packed-int64 window MIN:
#     key(pos) = h(pos) · 2^20 + (2^20 − 1 − pos)
# so the usual integer MIN realizes (min h, max pos).  Positions are
# 1-based in both engines (Spark posexplode is 0-based: pos+1).

_WIN_W = 4
_POS_M = 1 << 20  # position packing radix (h < 2^30 → key < 2^50)

_WINNOW_BODY = f"""
keyed AS (
  SELECT doc_id, pos,
         sh * {_POS_M} + ({_POS_M - 1} - pos) AS key
  FROM sh
),
wins AS (
  SELECT doc_id, pos,
         MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN {_WIN_W - 1} PRECEDING
                                 AND CURRENT ROW) AS wkey
  FROM keyed
),
sel AS (
  -- (wkey - wkey%M)/M: exact integer division in BOTH engines (bare
  -- `/` is double division, and CAST(double) truncates in Spark but
  -- ROUNDS in DuckDB — the subtraction makes the quotient exact)
  SELECT DISTINCT doc_id,
         CAST((wkey - (wkey % {_POS_M})) / {_POS_M} AS BIGINT) AS fp,
         {_POS_M - 1} - (wkey % {_POS_M}) AS fp_pos
  FROM wins WHERE pos >= {_WIN_W}
),
per_doc AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_fp,
         CAST(SUM(fp) AS BIGINT) AS fp_sum,
         CAST(MIN(fp) AS BIGINT) AS fp_min
  FROM sel GROUP BY 1
),
grams AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kgrams FROM sh GROUP BY 1
)
SELECT g.doc_id, g.n_kgrams, p.n_fp,
       ROUND(CAST(p.n_fp AS DOUBLE) / g.n_kgrams, 4) AS density,
       p.fp_sum, p.fp_min
FROM grams g JOIN per_doc p ON p.doc_id = g.doc_id
"""

_WINNOW_SPARK = f"""
WITH sh AS (
  -- posexplode the shingle transform DIRECTLY (the hll/cdc shape):
  -- projecting the shingle array as its own column first lets the
  -- optimizer's inferred size(_sh)>0 pre-Generate filter inline the
  -- WHOLE two-level HOF, where every element_at(_uh_expr, i)
  -- re-evaluates the full token-hash transform — a measured 1.5 s →
  -- 129 s blowup at sf0.1
  SELECT doc_id, pos + 1 AS pos, sh
  FROM (SELECT doc_id, {token_hashes_spark()} AS _uh
        FROM documents) q0
  LATERAL VIEW posexplode({shingles_from_uh_spark(5)}) AS pos, sh
),
{_WINNOW_BODY.strip()}
"""

_WINNOW_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, i AS pos, _sh[i] AS sh
  FROM (
    SELECT doc_id, _sh, UNNEST(generate_series(1, LEN(_sh))) AS i
    FROM (SELECT doc_id, {shingles_from_uh_duckdb(5)} AS _sh
          FROM (SELECT doc_id, {token_hashes_duckdb()} AS _uh
                FROM documents) q00) q0
  ) q1
),
{_WINNOW_BODY.strip()}
"""


@register("winnowing_fingerprints", _WINNOW_ORACLE)
def winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust winnowing (k=5 shingles, w=4 windows, rightmost-min tie
    rule) — per-doc selected-fingerprint count, density ≈ 2/(w+1), and
    exact integer checksums of the selected set."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_WINNOW_SPARK)


# --- RAKE keyword extraction ----------------------------------------------------
#
# Candidate phrases = maximal stopword-free token runs (the repo's
# two-word stopword lexicon 'a'/'the', as in lang_id_stopword).  Word
# scores: freq(w) = occurrences in candidates, deg(w) = Σ over
# occurrences of the containing phrase's length (RAKE's degree =
# within-phrase co-occurrence counting, self included).  score =
# deg/freq.  Phrase ids are a running stopword count (window SUM) —
# identical in both engines.

_RAKE_BODY = """
marked AS (
  SELECT doc_id, pos, t,
         CASE WHEN t IN ('a', 'the') THEN 1 ELSE 0 END AS is_stop
  FROM tok
),
numbered AS (
  SELECT doc_id, pos, t, is_stop,
         SUM(is_stop) OVER (PARTITION BY doc_id ORDER BY pos) AS run_id
  FROM marked
),
runs AS (
  -- run_id must be assigned over ALL tokens (WHERE runs before window
  -- functions, so filtering first would zero every run_id); stopword
  -- rows are dropped only after numbering
  SELECT doc_id, pos, t, run_id FROM numbered WHERE is_stop = 0
),
phrase_len AS (
  SELECT doc_id, run_id, CAST(COUNT(*) AS BIGINT) AS plen
  FROM runs GROUP BY 1, 2
),
occ AS (
  SELECT r.t, p.plen
  FROM runs r
  JOIN phrase_len p ON p.doc_id = r.doc_id AND p.run_id = r.run_id
),
scored AS (
  SELECT t AS word,
         CAST(COUNT(*) AS BIGINT) AS freq,
         CAST(SUM(plen) AS BIGINT) AS degree
  FROM occ GROUP BY 1
)
SELECT word, freq, degree,
       ROUND(CAST(degree AS DOUBLE) / freq, 4) AS rake_score
FROM scored
WHERE freq >= 5
ORDER BY rake_score DESC, degree DESC, word ASC
LIMIT 20
"""

_RAKE_SPARK = f"""
WITH tok AS (
  SELECT doc_id, pos + 1 AS pos, t
  FROM (SELECT doc_id, split(text, ' ') AS _tk FROM documents) q0
  LATERAL VIEW posexplode(_tk) AS pos, t
),
{_RAKE_BODY.strip()}
"""

_RAKE_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, i AS pos, _tk[i] AS t
  FROM (
    SELECT doc_id, _tk, UNNEST(generate_series(1, LEN(_tk))) AS i
    FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS _tk FROM documents) q0
  ) q1
),
{_RAKE_BODY.strip()}
"""


@register("rake_keywords", _RAKE_ORACLE)
def rake_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAKE keyword extraction: stopword-delimited candidate phrases,
    degree/frequency word scores, corpus top-20 — two
    vocabulary-bounded aggs, no pair enumeration."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_RAKE_SPARK)


# --- corpus readability (Flesch reading ease from integer aggregates) ----------
#
# Syllables ≈ maximal vowel-group count per token (the standard
# dictionary-free proxy); pseudo-sentences = ⌈tokens/10⌉ (the corpus
# is unpunctuated synthetic prose, so sentence boundaries are fixed
# 10-token frames — deterministic and engine-identical).  The Flesch
# score is computed per LANGUAGE from the int64 sums (score of the
# aggregate), never averaged over per-doc doubles.

_READ_BODY = """
WITH per_doc AS (
  SELECT doc_id, lang,
         CAST({size_fn}({split_fn}) AS BIGINT) AS n_words,
         CAST(CEIL(CAST({size_fn}({split_fn}) AS DOUBLE) / 10.0) AS BIGINT)
           AS n_sentences,
         CAST({syll_expr} AS BIGINT) AS n_syllables
  FROM documents
),
per_lang AS (
  SELECT lang,
         CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_words) AS BIGINT) AS words,
         CAST(SUM(n_sentences) AS BIGINT) AS sentences,
         CAST(SUM(n_syllables) AS BIGINT) AS syllables
  FROM per_doc GROUP BY 1
)
SELECT lang, n_docs, words, sentences, syllables,
       ROUND(CAST(words AS DOUBLE) / sentences, 4) AS words_per_sentence,
       ROUND(CAST(syllables AS DOUBLE) / words, 4) AS syllables_per_word,
       ROUND(206.835 - 1.015 * (CAST(words AS DOUBLE) / sentences)
                     - 84.6 * (CAST(syllables AS DOUBLE) / words), 2)
         AS flesch
FROM per_lang
"""

_READ_SPARK = _READ_BODY.format(
    size_fn="size",
    split_fn="split(text, ' ')",
    syll_expr=(
        "aggregate(transform(split(text, ' '),"
        " _t -> cast(size(regexp_extract_all(_t, '[aeiou]+', 0)) as bigint)),"
        " cast(0 as bigint), (_a, _b) -> _a + _b)"
    ),
)

_READ_ORACLE = _READ_BODY.format(
    size_fn="LEN",
    split_fn="STRING_SPLIT(text, ' ')",
    syll_expr=(
        "LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(text, ' '),"
        " _t -> CAST(LEN(REGEXP_EXTRACT_ALL(_t, '[aeiou]+')) AS BIGINT)))"
    ),
)


@register("readability_flesch", _READ_ORACLE)
def readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language Flesch reading ease from exact integer
    word/sentence/vowel-group-syllable sums — one linear scan folded to
    |lang| rows, full codegen, no shuffle beyond the final agg."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_READ_SPARK)


# --- bitext candidate mining (cross-lingual parallel-corpus discovery) ---------
#
# The CCMatrix/CCAligned pipeline verb: find cross-language document
# pairs that plausibly translate each other.  Anchor features =
# RARE 5-token shingles (df <= _BT_DF_CAP) — the numbers / names /
# code spans that survive translation; candidate pairs share >= 2
# anchors AND pass the 2:1 length-ratio gate (Resnik & Smith's STRAND
# filters).  Jaccard over each pair's anchor sets ranks candidates.
#
# Scale shape: the inverted anchor index bounds every shingle's pair
# fan-out at df_cap² (the repo's hot-bucket rule — same guard as
# dedup_ngram_jaccard_capped); the cross-lang constraint a.lang <
# b.lang halves the join and kills same-language near-dup noise.
# Length ratio and Jaccard are exact integer predicates.

_BT_DF_CAP = 3
_BT_MIN_ANCHORS = 2


def _bitext_sql(sh_src: str, size_fn: str, split_fn: str) -> str:
    return f"""
WITH sh AS ({sh_src}),
dlen AS (
  SELECT doc_id, CAST({size_fn}({split_fn}) AS BIGINT) AS n_tok
  FROM documents
),
df AS (
  SELECT s, CAST(COUNT(*) AS BIGINT) AS c FROM sh GROUP BY 1
),
an AS (
  SELECT sh.doc_id, sh.lang, sh.s
  FROM sh JOIN df ON df.s = sh.s AND df.c <= {_BT_DF_CAP}
),
asz AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_anchors FROM an GROUP BY 1
),
p AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2,
         a.lang AS lang1, b.lang AS lang2,
         CAST(COUNT(*) AS BIGINT) AS n_shared
  FROM an a JOIN an b ON b.s = a.s AND a.lang < b.lang
  GROUP BY 1, 2, 3, 4
)
SELECT p.d1, p.d2, p.lang1, p.lang2, p.n_shared,
       l1.n_tok AS tok1, l2.n_tok AS tok2,
       ROUND(CAST(p.n_shared AS DOUBLE)
             / (s1.n_anchors + s2.n_anchors - p.n_shared), 4)
         AS anchor_jaccard
FROM p
JOIN dlen l1 ON l1.doc_id = p.d1
JOIN dlen l2 ON l2.doc_id = p.d2
JOIN asz s1 ON s1.doc_id = p.d1
JOIN asz s2 ON s2.doc_id = p.d2
WHERE p.n_shared >= {_BT_MIN_ANCHORS}
  AND 2 * LEAST(l1.n_tok, l2.n_tok) >= GREATEST(l1.n_tok, l2.n_tok)
"""


_BT_SH_SPARK = f"""
  SELECT DISTINCT doc_id, lang, s
  FROM (SELECT doc_id, lang, explode({shingles_from_uh_spark(5)}) AS s
        FROM (SELECT doc_id, lang, {token_hashes_spark()} AS _uh
              FROM documents) q0) q1
"""

_BT_SH_DUCK = f"""
  SELECT DISTINCT doc_id, lang, UNNEST({shingles_from_uh_duckdb(5)}) AS s
  FROM (SELECT doc_id, lang, {token_hashes_duckdb()} AS _uh
        FROM documents) q0
"""

_BITEXT_SPARK = _bitext_sql(_BT_SH_SPARK, "size", "split(text, ' ')")
_BITEXT_ORACLE = _bitext_sql(_BT_SH_DUCK, "LEN", "STRING_SPLIT(text, ' ')")


@register("bitext_mining_pairs", _BITEXT_ORACLE)
def bitext_mining_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-lingual parallel-document candidates: rare-shingle anchor
    blocking (df-capped inverted index), 2:1 length-ratio gate, exact
    anchor-Jaccard scores."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_BITEXT_SPARK)


# --- TextTiling topic segmentation (Hearst 1997) --------------------------------
#
# Lexical-cohesion segmentation: cosine similarity between adjacent
# 10-token blocks, boundary wherever the gap similarity drops below
# mean - std/2 of the doc's gap profile.  Similarities are quantized
# ONCE to int64 micro-units (FLOOR(cos*1e6 + 0.5) after one sqrt + one
# division, both correctly rounded), after which the Hearst threshold
# clears to a PURE INTEGER predicate: with n gaps, S = sum q,
# V = n*sum q^2 - S^2 (population variance x n^2),
#     q < S/n - sqrt(V)/(2n)  <=>  L > 0 AND L^2 > V,  L = 2S - 2nq
# — the segmentation decision is exact int64 comparisons, no float
# summation anywhere.
#
# Scale shape: one groupBy (doc, block, token) — per-doc bounded — and
# one adjacent-block equi-join per doc; the gap profile is <= 40 rows
# per doc and never leaves its partition.

_TT_BLK = 10


def _texttiling_sql(tok_src: str) -> str:
    return f"""
WITH tok AS ({tok_src}),
blk AS (
  SELECT doc_id, CAST(FLOOR((pos - 1) / {_TT_BLK}.0) AS BIGINT) AS b,
         t, CAST(COUNT(*) AS BIGINT) AS c
  FROM tok GROUP BY 1, 2, 3
),
norms AS (
  SELECT doc_id, b, CAST(SUM(c * c) AS BIGINT) AS nrm
  FROM blk GROUP BY 1, 2
),
dots AS (
  SELECT a.doc_id, a.b, CAST(SUM(a.c * x.c) AS BIGINT) AS dot
  FROM blk a JOIN blk x
    ON x.doc_id = a.doc_id AND x.b = a.b + 1 AND x.t = a.t
  GROUP BY 1, 2
),
gaps AS (
  SELECT n1.doc_id, n1.b,
         CAST(FLOOR(COALESCE(d.dot, 0)
                    / SQRT(CAST(n1.nrm AS DOUBLE) * n2.nrm)
                    * 1000000.0 + 0.5) AS BIGINT) AS q
  FROM norms n1
  JOIN norms n2 ON n2.doc_id = n1.doc_id AND n2.b = n1.b + 1
  LEFT JOIN dots d ON d.doc_id = n1.doc_id AND d.b = n1.b
),
prof AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(q) AS BIGINT) AS s,
         CAST(COUNT(*) * SUM(q * q) - SUM(q) * SUM(q) AS BIGINT) AS v
  FROM gaps GROUP BY 1
)
SELECT g.doc_id,
       p.n AS n_gaps,
       p.s AS sum_simq,
       CAST(MIN(g.q) AS BIGINT) AS min_simq,
       CAST(SUM(CASE WHEN 2 * p.s - 2 * p.n * g.q > 0
                      AND (2 * p.s - 2 * p.n * g.q)
                          * (2 * p.s - 2 * p.n * g.q) > p.v
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_boundaries
FROM gaps g JOIN prof p ON p.doc_id = g.doc_id
GROUP BY 1, 2, 3
"""


_TT_TOK_SPARK = """
  SELECT doc_id, pos + 1 AS pos, t
  FROM (SELECT doc_id, split(text, ' ') AS _tk FROM documents) q0
  LATERAL VIEW posexplode(_tk) AS pos, t
"""

_TT_TOK_DUCK = """
  SELECT doc_id, i AS pos, _tk[i] AS t
  FROM (
    SELECT doc_id, _tk, UNNEST(generate_series(1, LEN(_tk))) AS i
    FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS _tk FROM documents) q0
  ) q1
"""


@register("texttiling_segments", _texttiling_sql(_TT_TOK_DUCK))
def texttiling_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TextTiling lexical-cohesion segmentation: block-cosine gap
    profile quantized once, Hearst's mean - std/2 boundary rule cleared
    to exact integer comparisons; per-doc gap/boundary counts."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_texttiling_sql(_TT_TOK_SPARK))


# --- Luhn extractive summarization (Luhn 1958) ----------------------------------
#
# The original auto-abstract algorithm: significant words = the top-20
# corpus words excluding stopwords (the RAKE lexicon convention);
# sentence = the 10-token pseudo-sentence frame (readability_flesch
# convention); sentence score = (significant-word occurrences)^2 /
# sentence length; summary = each doc's best sentence (tie -> earliest
# frame).  All carriers exact int64; the score comparison is cleared
# of division by cross-multiplying (n1^2*len2 > n2^2*len1), so even
# the argmax is pure integer — ROUND appears only in the emitted
# score column.
#
# Scale shape: one vocabulary-bounded top-k (broadcast), one
# (doc, frame) agg, one per-doc argmax window — no pair work.

_LUHN_TOP = 20
_LUHN_FRAME = 10


def _luhn_sql(tok_src: str) -> str:
    return f"""
WITH tok AS ({tok_src}),
sig AS (
  SELECT t FROM (
    SELECT t, CAST(COUNT(*) AS BIGINT) AS g
    FROM tok WHERE t NOT IN ('a', 'the')
    GROUP BY 1
    ORDER BY g DESC, t ASC LIMIT {_LUHN_TOP}
  ) q
),
frames AS (
  SELECT doc_id,
         CAST(FLOOR((pos - 1) / {_LUHN_FRAME}.0) AS BIGINT) AS frame,
         CAST(COUNT(*) AS BIGINT) AS flen,
         CAST(SUM(CASE WHEN sig.t IS NOT NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS nsig
  FROM tok LEFT JOIN sig ON sig.t = tok.t
  GROUP BY 1, 2
),
best AS (
  SELECT doc_id, frame, flen, nsig,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id
           -- integer argmax of nsig^2/flen: order by the exact
           -- rational via its double image (correctly rounded from
           -- exact int64 operands), ties broken by earliest frame
           ORDER BY CAST(nsig * nsig AS DOUBLE) / flen DESC, frame ASC
         ) AS rk
  FROM frames
)
SELECT doc_id, frame AS best_frame, flen, nsig,
       ROUND(CAST(nsig * nsig AS DOUBLE) / flen, 4) AS luhn_score
FROM best WHERE rk = 1
"""


@register("luhn_extract_summary", _luhn_sql(_TT_TOK_DUCK))
def luhn_extract_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Luhn auto-abstract: best 10-token frame per document by
    significant-word density (top-20 non-stopword lexicon), integer
    carriers with an exact-rational argmax."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_luhn_sql(_TT_TOK_SPARK))
