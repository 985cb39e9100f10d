"""Training-corpus preparation queries beyond dedup: benchmark
contamination detection, C4-style span-duplication statistics, and
Gopher-style within-document repetition metrics.

These are the remaining filters a 100 TB pretraining pipeline runs
between raw crawl and training shards (alongside the dedup/quality
family in queries.textops):

- contamination: does a training document share long n-grams with a
  held-out evaluation set?  (the standard 8-to-13-gram overlap test)
- span duplication: what fraction of a document's fixed-token spans
  appear verbatim in OTHER documents?  (C4 deduplicates three-sentence
  spans; here spans are fixed 16-token windows, the tokenizer-agnostic
  analogue)
- within-doc repetition: Gopher's "fraction of tokens in the most
  frequent 2-gram" + duplicate-token fraction — boilerplate/spam
  signals computed per row.

All three are oracle-checked value-exact against DuckDB over the same
parquet, using the engine-constant polynomial token hashes from
chopin_spark.textops (no xxhash64 — VERDICT r01 next-steps #5 pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark.queries import register
from chopin_spark.tables import load
from chopin_spark.textops import (
    packed_chunk_hashes_duckdb,
    packed_chunk_hashes_spark,
    shingles_from_uh_duckdb,
    shingles_from_uh_spark,
    token_hashes_duckdb,
    token_hashes_spark,
)

# --- benchmark contamination (eval-set n-gram overlap) -----------------------
#
# Benchmark set = doc_id % 13 == 0 (a deterministic stand-in for the
# held-out eval suite); training set = everything else.  A training doc
# is contaminated when any of its distinct 8-gram shingle hashes occurs
# in the benchmark shingle universe.  At 10^12 docs the benchmark side
# is dimension-sized (eval suites are millions of shingles, not
# trillions) → broadcast; the training side never shuffles its shingles,
# only the per-doc counts.  If the benchmark universe outgrows the
# broadcast threshold the same plan runs as a shuffle equi-join on the
# shingle hash (extract_at's size-switch pattern, raster.py).

_NGRAM = 8
_BENCH_MOD = 13

_CONTAM_SPARK = f"""
WITH uh AS (
  SELECT doc_id, {token_hashes_spark()} AS _uh FROM documents
),
sh AS (
  SELECT doc_id,
         explode(array_distinct({shingles_from_uh_spark(_NGRAM)})) AS v
  FROM uh WHERE size(_uh) >= {_NGRAM}
),
bench AS (
  SELECT DISTINCT v FROM sh WHERE doc_id % {_BENCH_MOD} = 0
),
train AS (SELECT doc_id, v FROM sh WHERE doc_id % {_BENCH_MOD} != 0),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM train GROUP BY 1),
hits AS (
  SELECT {{HINT}} t.doc_id, COUNT(*) AS n_hits
  FROM train t JOIN bench b ON t.v = b.v
  GROUP BY 1
)
SELECT s.doc_id, s.n_shingles, h.n_hits,
       ROUND(CAST(h.n_hits AS DOUBLE) / s.n_shingles, 4) AS hit_frac
FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
"""

_CONTAM_ORACLE = f"""
WITH uh AS (
  SELECT doc_id, {token_hashes_duckdb()} AS _uh FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         UNNEST({shingles_from_uh_duckdb(_NGRAM)}) AS v
  FROM uh WHERE len(_uh) >= {_NGRAM}
),
bench AS (
  SELECT DISTINCT v FROM sh WHERE doc_id % {_BENCH_MOD} = 0
),
train AS (SELECT doc_id, v FROM sh WHERE doc_id % {_BENCH_MOD} != 0),
sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM train GROUP BY 1),
hits AS (
  SELECT t.doc_id, COUNT(*) AS n_hits
  FROM train t JOIN bench b ON t.v = b.v
  GROUP BY 1
)
SELECT s.doc_id, s.n_shingles, h.n_hits,
       ROUND(CAST(h.n_hits AS DOUBLE) / s.n_shingles, 4) AS hit_frac
FROM hits h JOIN sizes s ON h.doc_id = s.doc_id
"""


_BENCH_BROADCAST_MAX = 5_000_000  # distinct shingles


@register("benchmark_contamination", _CONTAM_ORACLE)
def benchmark_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set contamination check: per training document, how many of
    its distinct 8-gram shingles occur anywhere in the benchmark set.
    Output rows = contaminated docs only (the drop/flag list a pipeline
    materializes); docs with zero overlap never leave the map side.

    Broadcast is a SIZE-BASED switch (extract_at pattern): a hint would
    override autoBroadcastJoinThreshold and force-broadcast an
    over-threshold benchmark universe — the opposite of the documented
    shuffle fallback.  The count probe is one aggregation over the
    (small) benchmark subset.

    The registered view is spread across the scheduler's parallelism
    first (textops.spread_input — the guide §2.5 unsplittable-input
    guard): the 8-gram char-fold projection is the dominant cost and
    otherwise runs on the single scan task of a one-row-group file,
    three separate times (bench CTE, train CTE, probe)."""
    from chopin_spark.textops import spread_input

    spread_input(load(spark, sf_dir, "documents")).createOrReplaceTempView(
        "documents"
    )
    n_bench = spark.sql(
        f"SELECT COUNT(DISTINCT v) FROM (SELECT"
        f" explode(array_distinct({shingles_from_uh_spark(_NGRAM)})) AS v"
        f" FROM (SELECT {token_hashes_spark()} AS _uh FROM documents"
        f" WHERE doc_id % {_BENCH_MOD} = 0)"
        f" WHERE size(_uh) >= {_NGRAM})"
    ).first()[0]
    hint = "/*+ BROADCAST(b) */ " if n_bench <= _BENCH_BROADCAST_MAX else ""
    return spark.sql(_CONTAM_SPARK.replace("{HINT}", hint))


# --- C4-style span-duplication statistics ------------------------------------
#
# Non-overlapping 16-token spans, each identified by the polynomial
# fold of its token-hash slice (doc_chunk_windows machinery with
# window == stride).  A span is corpus-duplicated when its hash occurs
# in >= 2 DISTINCT documents.  Two shuffles: span-hash df count, per-doc
# re-agg — both on uniform keys; the span table is ~n_tokens/16 rows.

_SPAN = 16

_SPAN_SPARK = f"""
WITH uh AS (
  SELECT doc_id, {token_hashes_spark()} AS _uh FROM documents
),
ex AS (
  SELECT doc_id, _uh,
         explode(sequence(0, CAST(FLOOR((size(_uh) - 1) / {_SPAN}.0) AS INT)))
           AS span_idx
  FROM uh
),
ch AS (
  SELECT doc_id, span_idx,
         aggregate(slice(_uh, span_idx * {_SPAN} + 1, {_SPAN}),
                   CAST(0 AS BIGINT),
                   (h, x) -> (h * 31 + x) % 1000000007) AS h
  FROM ex
),
df AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY 1)
SELECT ch.doc_id,
       COUNT(*) AS n_spans,
       CAST(SUM(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_spans,
       ROUND(CAST(SUM(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS dup_frac
FROM ch JOIN df ON ch.h = df.h
GROUP BY 1
"""

_SPAN_ORACLE = f"""
WITH uh AS (
  SELECT doc_id, {token_hashes_duckdb()} AS _uh FROM documents
),
ex AS (
  SELECT doc_id, _uh,
         UNNEST(generate_series(
           0, CAST(FLOOR((len(_uh) - 1) / {_SPAN}.0) AS BIGINT))) AS span_idx
  FROM uh
),
ch AS (
  SELECT doc_id, span_idx,
         LIST_REDUCE(
           LIST_PREPEND(CAST(0 AS BIGINT),
             _uh[span_idx * {_SPAN} + 1 : span_idx * {_SPAN} + {_SPAN}]),
           (h, x) -> (h * 31 + x) % 1000000007) AS h
  FROM ex
),
df AS (SELECT h, COUNT(DISTINCT doc_id) AS nd FROM ch GROUP BY 1)
SELECT ch.doc_id,
       COUNT(*) AS n_spans,
       CAST(SUM(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_spans,
       ROUND(CAST(SUM(CASE WHEN df.nd >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 4) AS dup_frac
FROM ch JOIN df ON ch.h = df.h
GROUP BY 1
"""


@register("span_dup_stats", _SPAN_ORACLE)
def span_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document span duplication (C4's three-sentence-span dedup
    reshaped to fixed 16-token windows): per document, the count and
    fraction of its spans that appear verbatim in at least one OTHER
    document.  `doc_id != comp` drop policies read dup_frac >= cutoff
    as the removal set."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_SPAN_SPARK)


# --- Gopher within-document repetition ---------------------------------------
#
# Two of Gopher's repetition rules, integer-exact: duplicate-token
# fraction (1 - types/tokens) and top-2-gram fraction (occurrences of
# the modal bigram / total bigram occurrences).  The token side is
# per-row array math (zero shuffles); the bigram mode needs a
# (doc, bigram) count — one shuffle keyed by doc_id+bigram, then a
# per-doc re-agg.  Both keys are uniform at any corpus size.

_REP_SPARK = """
WITH toks AS (
  SELECT doc_id,
         split(text, ' ') AS w
  FROM documents
),
tok_stats AS (
  SELECT doc_id,
         size(w) AS n_tokens,
         size(array_distinct(w)) AS n_types
  FROM toks
),
bg AS (
  SELECT doc_id,
         explode(transform(sequence(1, size(w) - 1),
                 i -> concat_ws(' ', element_at(w, i),
                                element_at(w, i + 1)))) AS bigram
  FROM toks WHERE size(w) >= 2
),
bgc AS (
  SELECT doc_id, bigram, COUNT(*) AS n FROM bg GROUP BY 1, 2
),
bstats AS (
  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams, MAX(n) AS max_bigram_n
  FROM bgc GROUP BY 1
)
SELECT t.doc_id, t.n_tokens, t.n_types,
       ROUND(1.0 - CAST(t.n_types AS DOUBLE) / t.n_tokens, 4)
         AS dup_token_frac,
       b.max_bigram_n,
       ROUND(CAST(b.max_bigram_n AS DOUBLE) / b.n_bigrams, 4)
         AS top_bigram_frac
FROM tok_stats t JOIN bstats b ON t.doc_id = b.doc_id
"""

_REP_ORACLE = """
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
),
tok_stats AS (
  SELECT doc_id,
         CAST(LEN(w) AS INT) AS n_tokens,
         CAST(LEN(LIST_DISTINCT(w)) AS INT) AS n_types
  FROM toks
),
bg AS (
  SELECT doc_id,
         UNNEST(LIST_TRANSFORM(generate_series(1, LEN(w) - 1),
                i -> w[i] || ' ' || w[i + 1])) AS bigram
  FROM toks WHERE LEN(w) >= 2
),
bgc AS (
  SELECT doc_id, bigram, COUNT(*) AS n FROM bg GROUP BY 1, 2
),
bstats AS (
  SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_bigrams, MAX(n) AS max_bigram_n
  FROM bgc GROUP BY 1
)
SELECT t.doc_id, t.n_tokens, t.n_types,
       ROUND(1.0 - CAST(t.n_types AS DOUBLE) / t.n_tokens, 4)
         AS dup_token_frac,
       b.max_bigram_n,
       ROUND(CAST(b.max_bigram_n AS DOUBLE) / b.n_bigrams, 4)
         AS top_bigram_frac
FROM tok_stats t JOIN bstats b ON t.doc_id = b.doc_id
"""


@register("doc_repetition_stats", _REP_ORACLE)
def doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition signals per document: duplicate-token fraction
    and the fraction of bigram occurrences taken by the single most
    frequent bigram.  High values flag boilerplate/keyword-stuffed
    pages before they reach training shards."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_REP_SPARK)


# --- BPE-ish regex tokenization ----------------------------------------------
#
# The GPT-2 pre-tokenizer shape reduced to three backslash-free
# categories: letter runs, digit runs, punctuation/symbol runs.  The
# synthetic corpus is pure lowercase words, so a deterministic noise
# suffix (version strings, numbers, punctuation) is injected into a
# doc_id subset first — same SQL both engines — to exercise every
# category.  Map-only array stage, fuses into the scan at 10^12 docs.

_BPE_PAT = "[a-z]+|[0-9]+|[^a-z0-9 ]+"

_BPE_BASE = """
  SELECT doc_id,
         CASE WHEN doc_id % 4 = 0
              THEN text || ' v' || CAST(doc_id % 10 AS STRING) || '.'
                        || CAST(doc_id % 7 AS STRING)
                        || ' (rev-' || CAST(doc_id % 100 AS STRING) || ')!'
              ELSE text END AS t
  FROM documents
"""

_BPE_SPARK = f"""
WITH base AS ({_BPE_BASE}),
tok AS (
  SELECT doc_id, regexp_extract_all(t, '{_BPE_PAT}', 0) AS toks FROM base
)
SELECT doc_id,
       size(toks) AS n_bpe_tokens,
       size(array_distinct(toks)) AS n_distinct,
       size(filter(toks, x -> x rlike '^[0-9]+$')) AS n_digit,
       size(filter(toks, x -> x rlike '^[^a-z0-9 ]+$')) AS n_punct
FROM tok
"""

_BPE_ORACLE = f"""
WITH base AS ({_BPE_BASE}),
tok AS (
  SELECT doc_id, regexp_extract_all(t, '{_BPE_PAT}') AS toks FROM base
)
SELECT doc_id,
       CAST(len(toks) AS INT) AS n_bpe_tokens,
       CAST(len(list_distinct(toks)) AS INT) AS n_distinct,
       CAST(len(list_filter(toks,
             x -> regexp_matches(x, '^[0-9]+$'))) AS INT) AS n_digit,
       CAST(len(list_filter(toks,
             x -> regexp_matches(x, '^[^a-z0-9 ]+$'))) AS INT) AS n_punct
FROM tok
"""


@register("token_bpe_stats", _BPE_ORACLE)
def token_bpe_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex tokenization (letter / digit / punctuation runs —
    the GPT-2 pre-tokenizer shape) with per-document token, type, and
    category counts.  Complements text_quality's whitespace tokens:
    this is the tokenizer-aligned count a training-budget estimate
    uses."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_BPE_SPARK)


# --- CCNet/RefinedWeb-style boilerplate line removal --------------------------
#
# A crawl pipeline's line-level dedup: split every document into
# "lines" (non-overlapping 4-token chunks — the corpus has no \n; same
# tokenizer-agnostic move as the C4 spans above), count in how many
# DISTINCT documents each line occurs, and drop lines occurring in >= 2
# documents (RefinedWeb drops exact-duplicate lines; CCNet drops lines
# duplicated across a shard).  Output per document: line counts plus an
# ORDER-EXACT fingerprint of the kept lines (polynomial fold over the
# pos-packed hashes in document order) — the value-level proof that the
# reconstructed document is the right lines in the right order, without
# shipping line strings through the shuffle.
#
# Scale shape at 10^12 docs: one explode (~tokens/4 rows), one
# count-distinct agg keyed on the 30-bit line hash (partial+final),
# one shuffle equi-join back on that key (the frequency side is
# distinct-keyed, so the hot boilerplate lines skew only the probe
# side — AQE's skew-join case), one per-doc agg.  Zero Python.

_LINE_N = 4
_BOILER_T = 2  # boilerplate = line seen in >= T distinct documents

_BOILER_SPARK = f"""
WITH uh AS (
  SELECT doc_id, {token_hashes_spark()} AS _uh FROM documents
),
lines AS (
  SELECT doc_id, explode({packed_chunk_hashes_spark(_LINE_N)}) AS packed
  FROM uh WHERE size(_uh) >= {_LINE_N}
),
l AS (
  SELECT doc_id, packed, packed % 2147483648 AS lh FROM lines
),
freq AS (
  SELECT lh, COUNT(DISTINCT doc_id) AS n_docs FROM l GROUP BY 1
)
SELECT l.doc_id,
       COUNT(*) AS n_lines,
       SUM(CASE WHEN f.n_docs < {_BOILER_T} THEN 1 ELSE 0 END) AS n_kept,
       ROUND(CAST(SUM(CASE WHEN f.n_docs < {_BOILER_T} THEN 1 ELSE 0 END)
                  AS DOUBLE) / COUNT(*), 4) AS kept_frac,
       aggregate(
         array_sort(collect_list(
           CASE WHEN f.n_docs < {_BOILER_T} THEN l.packed END)),
         CAST(0 AS BIGINT),
         (_h, _p) -> (_h * 1000003 + _p % 2147483648) % 1000000007
       ) AS kept_fp
FROM l JOIN freq f ON l.lh = f.lh
GROUP BY l.doc_id
"""

_BOILER_ORACLE = f"""
WITH uh AS (
  SELECT doc_id, {token_hashes_duckdb()} AS _uh FROM documents
),
lines AS (
  SELECT doc_id, UNNEST({packed_chunk_hashes_duckdb(_LINE_N)}) AS packed
  FROM uh WHERE len(_uh) >= {_LINE_N}
),
l AS (
  SELECT doc_id, packed, packed % 2147483648 AS lh FROM lines
),
freq AS (
  SELECT lh, COUNT(DISTINCT doc_id) AS n_docs FROM l GROUP BY 1
)
SELECT l.doc_id,
       COUNT(*) AS n_lines,
       CAST(SUM(CASE WHEN f.n_docs < {_BOILER_T} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_kept,
       ROUND(SUM(CASE WHEN f.n_docs < {_BOILER_T} THEN 1.0 ELSE 0.0 END)
             / COUNT(*), 4) AS kept_frac,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_sort(COALESCE(
             list(l.packed) FILTER (WHERE f.n_docs < {_BOILER_T}),
             CAST([] AS BIGINT[])))),
         (_h, _p) -> (_h * 1000003 + _p % 2147483648) % 1000000007
       ) AS kept_fp
FROM l JOIN freq f ON l.lh = f.lh
GROUP BY l.doc_id
"""


@register("boilerplate_line_removal", _BOILER_ORACLE)
def boilerplate_line_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level boilerplate removal (CCNet / RefinedWeb): drop every
    4-token line occurring in >= 2 distinct documents, and emit per-doc
    kept counts plus an order-exact fingerprint of the surviving lines.
    The fingerprint folds the pos-packed line hashes in document order,
    so a hash match proves content AND reconstruction order without
    materializing the filtered text."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_BOILER_SPARK)


# --- deterministic stratified sampling (language rebalancing) ----------------
#
# The curation step every multilingual corpus build runs (CCNet's
# per-language shards, the C4/mC4 language buckets): downsample
# over-represented languages to target rates.  Sampling must be
# DETERMINISTIC — a hash-derived per-document key against a per-stratum
# threshold — so a resumed/replayed job keeps exactly the same rows
# (the checkpoint/lineage story) and so two engines can agree row-for-
# row, which `rand()` can never do.  One linear scan, one per-lang agg:
# no shuffle of the kept rows at all at 10^12 docs (the agg is by the
# ~100-key lang column; map-side partials collapse it).
#
# key = ((doc_id mod P30)·1103515245 + 12345) mod P30 stays < 2^61 at
# any doc_id, and its low four decimal digits are the basis-point
# threshold domain.

_RATE_BP = {"en": 4000, "zh": 6000, "de": 8000, "es": 8000, "fr": 8000}
_RATE_DEFAULT_BP = 10000

_RATE_CASE = (
    "CASE lang "
    + " ".join(f"WHEN '{k}' THEN {v}" for k, v in sorted(_RATE_BP.items()))
    + f" ELSE {_RATE_DEFAULT_BP} END"
)
_SAMPLE_KEY = "(((doc_id % 1000000007) * 1103515245 + 12345) % 1000000007)"

_STRAT_SPARK = f"""
WITH k AS (
  SELECT doc_id, lang,
         CASE WHEN {_SAMPLE_KEY} % 10000 < {_RATE_CASE}
              THEN 1 ELSE 0 END AS kept
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_total,
       SUM(kept) AS n_kept,
       ROUND(CAST(SUM(kept) AS DOUBLE) / COUNT(*), 4) AS kept_frac,
       aggregate(
         array_sort(collect_list(CASE WHEN kept = 1 THEN doc_id END)),
         CAST(0 AS BIGINT),
         (_h, _p) -> (_h * 1000003 + _p % 2147483648) % 1000000007
       ) AS kept_fp
FROM k GROUP BY lang
"""

_STRAT_ORACLE = f"""
WITH k AS (
  SELECT doc_id, lang,
         CASE WHEN {_SAMPLE_KEY} % 10000 < {_RATE_CASE}
              THEN 1 ELSE 0 END AS kept
  FROM documents
)
SELECT lang,
       COUNT(*) AS n_total,
       CAST(SUM(kept) AS BIGINT) AS n_kept,
       ROUND(SUM(CAST(kept AS DOUBLE)) / COUNT(*), 4) AS kept_frac,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
           list_sort(COALESCE(
             list(doc_id) FILTER (WHERE kept = 1),
             CAST([] AS BIGINT[])))),
         (_h, _p) -> (_h * 1000003 + _p % 2147483648) % 1000000007
       ) AS kept_fp
FROM k GROUP BY lang
"""


@register("stratified_sample_by_lang", _STRAT_ORACLE)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language downsampling (hash-keyed basis-point
    thresholds; en→40%, zh→60%, de/es/fr→80%).  Emits per-lang totals,
    kept counts, and an order-exact fingerprint of the kept doc_ids —
    the value-level proof both engines select the IDENTICAL rows, not
    just the same count."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_STRAT_SPARK)


# --- sequence packing (concat-and-chunk into training windows) ---------------
#
# The GPT-style data-loader step: concatenate documents (per shard, in
# a deterministic order) and chop the token stream into fixed
# SEQ_LEN-token training windows; documents may straddle a window
# boundary.  This is pure prefix-sum — one window function per shard —
# NOT a sequential bin-packing loop: each document's byte/token offset
# is cumsum(ntok) - ntok within its shard, and the windows it occupies
# are offset DIV SEQ_LEN .. (offset + ntok - 1) DIV SEQ_LEN.  At 10^12
# docs: one hash shuffle on the shard key, one in-partition running
# sum (shards are explicit parallelism, NB ≫ executors), zero Python.

_SEQ_LEN = 256
_N_SHARDS = 8
_SHARD_KEY = f"(((doc_id % 1000000007) * 16807) % 1000000007) % {_N_SHARDS}"

_PACK_SPARK = f"""
WITH t AS (
  SELECT doc_id, {_SHARD_KEY} AS shard,
         CAST(size(split(text, ' ')) AS BIGINT) AS ntok
  FROM documents
),
o AS (
  SELECT doc_id, shard, ntok,
         SUM(ntok) OVER (PARTITION BY shard ORDER BY doc_id
                         ROWS UNBOUNDED PRECEDING) - ntok AS start_off
  FROM t
)
SELECT doc_id, shard, ntok, start_off,
       start_off DIV {_SEQ_LEN} AS first_seq,
       (start_off + ntok - 1) DIV {_SEQ_LEN} - start_off DIV {_SEQ_LEN} + 1
         AS seqs_spanned
FROM o
"""

_PACK_ORACLE = f"""
WITH t AS (
  SELECT doc_id, {_SHARD_KEY} AS shard,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
  FROM documents
),
o AS (
  SELECT doc_id, shard, ntok,
         CAST(SUM(ntok) OVER (PARTITION BY shard ORDER BY doc_id
                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
           - ntok AS start_off
  FROM t
)
SELECT doc_id, shard, ntok, start_off,
       start_off // {_SEQ_LEN} AS first_seq,
       (start_off + ntok - 1) // {_SEQ_LEN} - start_off // {_SEQ_LEN} + 1
         AS seqs_spanned
FROM o
"""


@register("pack_sequences", _PACK_ORACLE)
def pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: per-shard deterministic doc
    order, running token offsets, and the SEQ_LEN-token training
    windows each document lands in.  Window-function prefix sums — the
    distributed formulation of the sequential packing loop."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_PACK_SPARK)


# --- Gopher quality-rule battery (MassiveText filter gate) --------------------

# Gopher/MassiveText document filters (Rae et al. 2021 §A1.1) adapted to
# the synthetic corpus, every ratio test an integer cross-multiplication:
#   R1 word count in [30, 120]
#   R2 mean word length in [4.3, 4.7] (10·sum_len between 43·n and 47·n
#      — band tuned to the synthetic vocab so the rule discriminates)
#   R3 ≥ 2 distinct stopwords present ('a', 'the', 'key', 'row')
#   R4 most-common word ≤ 20% of tokens (5·top_cnt ≤ n)
_GOPHER_ORACLE = """
WITH toks AS (
  SELECT doc_id, lang, UNNEST(STRING_SPLIT(text, ' ')) AS w
  FROM documents
),
wc AS (
  SELECT doc_id, lang, w, COUNT(*) AS c FROM toks GROUP BY 1, 2, 3
),
per_doc AS (
  SELECT doc_id, lang,
         SUM(c) AS n_words,
         SUM(LENGTH(w) * c) AS sum_len,
         MAX(c) AS top_cnt,
         SUM(CASE WHEN w IN ('a', 'the', 'key', 'row') THEN 1 ELSE 0 END)
           AS n_stop_distinct
  FROM wc GROUP BY 1, 2
),
flags AS (
  SELECT lang,
         CASE WHEN n_words BETWEEN 30 AND 120 THEN 0 ELSE 1 END AS f_len,
         CASE WHEN 10 * sum_len >= 43 * n_words
               AND 10 * sum_len <= 47 * n_words THEN 0 ELSE 1 END AS f_wlen,
         CASE WHEN n_stop_distinct >= 2 THEN 0 ELSE 1 END AS f_stop,
         CASE WHEN 5 * top_cnt <= n_words THEN 0 ELSE 1 END AS f_rep
  FROM per_doc
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(f_len) AS BIGINT) AS fail_len,
       CAST(SUM(f_wlen) AS BIGINT) AS fail_wordlen,
       CAST(SUM(f_stop) AS BIGINT) AS fail_stopwords,
       CAST(SUM(f_rep) AS BIGINT) AS fail_repetition,
       CAST(SUM(CASE WHEN f_len + f_wlen + f_stop + f_rep = 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
FROM flags
GROUP BY 1
"""


@register("gopher_quality_gate", _GOPHER_ORACLE)
def gopher_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/MassiveText quality-rule battery as one combined gate:
    word-count bounds, mean-word-length band, stopword presence, and
    top-word repetition — each ratio tested by integer
    cross-multiplication (no float thresholds to disagree on).  One
    explode + one (doc, word) hash agg + one per-doc agg + one per-lang
    rollup; every stage partial-aggregates map-side, and at 10^12 docs
    the only wide exchange is the (doc_id, word) count — bounded by
    document length, no corpus-global state."""
    docs = load(spark, sf_dir, "documents")
    wc = (
        docs.select(
            "doc_id", "lang",
            F.explode(F.split(F.col("text"), " ")).alias("w"),
        )
        .groupBy("doc_id", "lang", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_doc = wc.groupBy("doc_id", "lang").agg(
        F.sum("c").alias("n_words"),
        F.sum(F.length("w") * F.col("c")).alias("sum_len"),
        F.max("c").alias("top_cnt"),
        F.sum(
            F.when(F.col("w").isin("a", "the", "key", "row"), 1).otherwise(0)
        ).alias("n_stop_distinct"),
    )
    f_len = F.when(
        F.col("n_words").between(30, 120), 0
    ).otherwise(1)
    f_wlen = F.when(
        (10 * F.col("sum_len") >= 43 * F.col("n_words"))
        & (10 * F.col("sum_len") <= 47 * F.col("n_words")), 0
    ).otherwise(1)
    f_stop = F.when(F.col("n_stop_distinct") >= 2, 0).otherwise(1)
    f_rep = F.when(5 * F.col("top_cnt") <= F.col("n_words"), 0).otherwise(1)
    flags = per_doc.select(
        "lang",
        f_len.alias("f_len"), f_wlen.alias("f_wlen"),
        f_stop.alias("f_stop"), f_rep.alias("f_rep"),
    )
    return flags.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("f_len").cast("long").alias("fail_len"),
        F.sum("f_wlen").cast("long").alias("fail_wordlen"),
        F.sum("f_stop").cast("long").alias("fail_stopwords"),
        F.sum("f_rep").cast("long").alias("fail_repetition"),
        F.sum(
            F.when(
                F.col("f_len") + F.col("f_wlen")
                + F.col("f_stop") + F.col("f_rep") == 0, 1
            ).otherwise(0)
        ).cast("long").alias("n_pass"),
    )


# --- DSIR importance resampling (Xie et al. 2023) ----------------------------
#
# Data Selection via Importance Resampling: score every raw document by
# the log-likelihood ratio of a TARGET bag-of-hashed-ngrams model vs
# the RAW model, then keep the head.  Target here = the English slice
# (the "high-quality domain" stand-in); features = hashed token bigrams
# folded to 2^10 buckets (DSIR's hashed generative model).  Both bucket
# count tables are add-1-smoothed; the per-doc score is the
# feature-count-weighted mean LLR.
#
# 100 TB shape: the two models aggregate STRAIGHT to 1024 buckets
# (map-side combine collapses the bigram explosion before any
# shuffle), the 1024-row LLR table broadcasts back onto the exploded
# bigrams, and the per-doc score is one doc-key agg whose partial
# aggregation compresses each doc inside its own partition — the
# (doc, bucket) intermediate that would shuffle ~n_bigrams rows is
# never materialized.  (That intermediate was the original plan here:
# 77 s at sf0.1; this shape is ~6 s for identical output.)
# Float discipline: the per-bucket LLR is QUANTIZED to integer
# micro-units (FLOOR(llr·10^6) — the sedc quantized-weight move) so
# every per-doc sum is integer-exact; the only remaining float ops are
# 1024 per-bucket FLOOR(ln·10^6) calls (flip probability ~1e-6 vs the
# per-DOC rounding boundaries that DID flip at sf0.1 with raw float
# sums) and one final IEEE division of two exact integers, which is
# bit-identical across engines.

_DSIR_B = 1024


def _dsir_sql(tok_hashes: str, bigrams: str, unnest_bigram: str) -> str:
    return f"""
WITH uh AS (
  SELECT doc_id, lang, {tok_hashes} AS _uh FROM documents
),
feats AS (
  SELECT doc_id, lang, g % {_DSIR_B} AS b
  FROM (
    SELECT doc_id, lang, {unnest_bigram} AS g
    FROM (SELECT doc_id, lang, {bigrams} AS _bg FROM uh)
  )
),
model AS (
  SELECT b,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS t,
         COUNT(*) AS r
  FROM feats GROUP BY 1
),
tot AS (SELECT SUM(t) AS tt, SUM(r) AS rt FROM model),
llr AS (
  SELECT b,
         CAST(FLOOR((LN(CAST(t + 1 AS DOUBLE) / (tt + {_DSIR_B}))
                     - LN(CAST(r + 1 AS DOUBLE) / (rt + {_DSIR_B})))
                    * 1000000) AS BIGINT) AS lq
  FROM model CROSS JOIN tot
),
scored AS (
  SELECT f.doc_id, f.lang,
         COUNT(*) AS n_feats,
         CAST(SUM(llr.lq) AS BIGINT) AS sq
  FROM feats f JOIN llr ON llr.b = f.b
  GROUP BY 1, 2
)
SELECT doc_id, lang, n_feats,
       sq AS dsir_micro_sum,
       ROUND(CAST(sq AS DOUBLE) / 1000000 / n_feats, 4) + 0 AS dsir_score
FROM scored
"""


_DSIR_ORACLE = _dsir_sql(
    token_hashes_duckdb(),
    shingles_from_uh_duckdb(2),
    "UNNEST(_bg)",
)
# (the SQL-text Spark twin of _DSIR_ORACLE was removed: the engine path
# is the DataFrame chain _dsir_scored below — the analyzer-inlining
# blowup that killed the SQL-text path is documented there and pinned
# by tests/test_plans.py::test_no_hof_inline_blowup)


def _dsir_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-side scored frame as DataFrame ops, NOT the shared SQL
    text: Spark's SQL analyzer inlines CTE projections, so the nested
    token-hash HOF would be substituted into every element access of
    the shingle transform and re-evaluated per BIGRAM — a measured
    quadratic 60× blowup at sf0.1.  The DataFrame select chain keeps
    `_uh` a single projected expression (verified by counting
    `transform(split` occurrences in the executed plan,
    tests/test_plans.py::test_no_hof_inline_blowup).  Values are
    identical to _DSIR_ORACLE."""
    docs = load(spark, sf_dir, "documents")
    uh = docs.select(
        "doc_id", "lang", F.expr(token_hashes_spark()).alias("_uh")
    )
    feats = uh.select(
        "doc_id", "lang",
        F.explode(F.expr(shingles_from_uh_spark(2))).alias("g"),
    ).select("doc_id", "lang", (F.col("g") % _DSIR_B).alias("b"))
    model = feats.groupBy("b").agg(
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("t"),
        F.count(F.lit(1)).alias("r"),
    )
    tot = model.agg(
        F.sum("t").alias("tt"), F.sum("r").alias("rt")
    )
    llr = model.crossJoin(F.broadcast(tot)).selectExpr(
        "b",
        f"CAST(FLOOR((LN(CAST(t + 1 AS DOUBLE) / (tt + {_DSIR_B}))"
        f" - LN(CAST(r + 1 AS DOUBLE) / (rt + {_DSIR_B})))"
        f" * 1000000) AS BIGINT) AS lq",
    )
    return (
        feats.join(F.broadcast(llr), "b")
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("lq").alias("sq"),
        )
        .selectExpr(
            "doc_id", "lang", "n_feats",
            "sq AS dsir_micro_sum",
            "ROUND(CAST(sq AS DOUBLE) / 1000000 / n_feats, 4) + 0"
            " AS dsir_score",
        )
    )


@register("dsir_importance_weights", _DSIR_ORACLE)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document DSIR importance score (mean hashed-bigram LLR of
    target-vs-raw bag models, both trained in-engine in the same plan).
    Resampling reads the score column with a threshold or a stratified
    top-k — composable with stratified_sample_by_lang."""
    return _dsir_scored(spark, sf_dir)


# --- DSIR resampling: Gumbel top-k over the importance scores ----------------
#
# Xie et al. 2023 resample with probability ∝ exp(score/T); the
# Gumbel-top-k trick makes that a deterministic ranking: key_i =
# score_i + T·g_i with g_i = -ln(-ln(u_i)) and u_i hash-uniform — the
# top k keys ARE a weighted sample without replacement.  u_i derives
# from doc_id by the shared LCG recipe, so the "randomness" is
# replay/resume-identical and the oracle reproduces the exact sample.
# Quantization discipline: the score term reuses dsir's exact integer
# micro-sum (floored per-doc mean), the Gumbel term floors to micro
# units, and the final ordering key is a BIGINT with doc_id as the
# total tiebreak — cross-engine ties are impossible.
#
# Scale shape: scoring is the dsir plan (bounded 1024-key model aggs);
# the selection is a distributed top-k (TakeOrdered — per-partition
# heaps + one k-row merge at the driver), NEVER a global sort: at
# 10^12 docs the only full-width pass is the per-partition heap scan.

_DSIR_TOPK = 100
_DSIR_TEMP_INV = 100  # 1/T — the corpus' ~0.1-LLR score spread needs
# T ≈ 0.01 for score to dominate the unit-scale Gumbel noise while
# borderline docs still churn (the stochastic part of the resample)
_GUMBEL_U = (
    "((CAST((doc_id * 2654435761) % 1000003 AS DOUBLE) + 1.0) / 1000004.0)"
)
_GUMBEL_Q = (
    f"CAST(FLOOR(-LN(-LN({_GUMBEL_U})) * 1000000) AS BIGINT)"
)


def _dsir_topk_sql(inner: str) -> str:
    return f"""
WITH scored AS ({inner}),
keyed AS (
  SELECT doc_id, lang,
         CAST(FLOOR(CAST(dsir_micro_sum AS DOUBLE) / n_feats) AS BIGINT)
           * {_DSIR_TEMP_INV} + {_GUMBEL_Q} AS key_micro
  FROM scored
)
SELECT doc_id, lang, key_micro
FROM keyed
ORDER BY key_micro DESC, doc_id
LIMIT {_DSIR_TOPK}
"""


@register("dsir_gumbel_topk", _dsir_topk_sql(_DSIR_ORACLE))
def dsir_gumbel_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sample-without-replacement of the corpus ∝ exp(DSIR
    score): deterministic Gumbel keys over the in-plan importance
    scores, selected by distributed top-k (orderBy+limit compiles to
    TakeOrderedAndProject — per-partition heaps, no global sort)."""
    keyed = _dsir_scored(spark, sf_dir).selectExpr(
        "doc_id", "lang",
        "CAST(FLOOR(CAST(dsir_micro_sum AS DOUBLE) / n_feats) AS BIGINT)"
        f" * {_DSIR_TEMP_INV} + {_GUMBEL_Q} AS key_micro",
    )
    return keyed.orderBy(
        F.col("key_micro").desc(), F.col("doc_id")
    ).limit(_DSIR_TOPK)


# --- temperature-scaled language mixing (mC4 / LLaMA alpha-sampling) ---------
#
# Multilingual corpora are rebalanced by sampling language l with rate
# ∝ p_l^(α−1) (α < 1 boosts low-resource languages).  α = 0.5 makes
# the rate EXACTLY sqrt(n_min / n_l) after normalizing the rarest
# language to rate 1 — and IEEE sqrt is correctly rounded, so both
# engines derive bit-identical rates from the integer counts (no pow(),
# whose last-ulp behavior is library-specific).  Rates quantize to
# basis points; the per-doc keep decision is the stratified-sampling
# hash-threshold (replay/resume-identical, no rand()).
#
# Scale shape: one lang-key count agg (5 keys), the 5-row rate table
# broadcast back, one scan with an integer compare, one lang-key
# rollup.  Zero fact shuffle beyond the count partials.

_ALPHA_MIX = """
WITH counts AS (
  SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1
),
rates AS (
  SELECT lang, n,
         CAST(FLOOR(10000 * SQRT(CAST((SELECT MIN(n) FROM counts)
                                      AS DOUBLE) / n)) AS BIGINT)
           AS rate_bp
  FROM counts
),
kept AS (
  SELECT d.lang, r.n, r.rate_bp, d.doc_id,
         CASE WHEN ((d.doc_id * 48271) % 10007) % 10000 < r.rate_bp
              THEN 1 ELSE 0 END AS keep
  FROM documents d JOIN rates r ON r.lang = d.lang
)
SELECT lang,
       CAST(MIN(n) AS BIGINT) AS n_total,
       MIN(rate_bp) AS rate_bp,
       CAST(SUM(keep) AS BIGINT) AS n_kept,
       CAST(SUM(keep * doc_id) AS BIGINT) AS kept_id_sum
FROM kept
GROUP BY 1
"""


@register("alpha_mix_by_lang", _ALPHA_MIX)
def alpha_mix_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (α = 0.5) language rebalancing with the
    sampling rates derived IN-PLAN from corpus counts; kept set
    identified order-free by per-lang kept-id sums.  The rarest
    language keeps rate 1.0 by construction."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_ALPHA_MIX)


# --- ExactSubstr-style duplicated-span REMOVAL accounting --------------------
#
# span_dup_stats counts duplicated windows; the deduplication paper's
# actual edit (Lee et al. 2022, "Deduplicating Training Data Makes
# Language Models Better") REMOVES every maximal span covered by
# duplicated windows.  This operator computes that edit's accounting:
# overlapping 16-token windows (stride 4), windows whose hash occurs
# >= 2 times anywhere in the corpus (same doc included — true
# ExactSubstr policy, unlike span_dup_stats' cross-doc rule), merged
# per document into maximal islands by the classic gaps-and-islands
# window chain, then per-doc removed-token counts.  Distributed shape:
# one window-hash df agg + one per-doc sort of ONLY the duplicated
# starts (bounded by doc length), never a global sort.

_XS_W, _XS_STRIDE = 16, 4


def _exact_substr_sql(token_hashes: str, slice_fold: str) -> str:
    return f"""
WITH uh AS (
  SELECT doc_id, {token_hashes} AS _uh FROM documents
),
ex AS (
  SELECT doc_id, _uh, {{SEQ}} AS span_idx
  FROM uh
),
ch AS (
  SELECT doc_id, span_idx * {_XS_STRIDE} AS s,
         {{N_TOK}} AS n_tokens,
         {slice_fold} AS h
  FROM ex
),
df AS (SELECT h, COUNT(*) AS cnt FROM ch GROUP BY 1),
starts AS (
  SELECT ch.doc_id, ch.s, ch.n_tokens
  FROM ch JOIN df ON ch.h = df.h
  WHERE df.cnt >= 2
),
isl AS (
  SELECT doc_id, s, n_tokens,
         CASE WHEN s > COALESCE(MAX(s + {_XS_W}) OVER (
                  PARTITION BY doc_id ORDER BY s
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                -1)
              THEN 1 ELSE 0 END AS new_isl
  FROM starts
),
isl2 AS (
  SELECT doc_id, s, n_tokens,
         SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY s
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl_id
  FROM isl
),
spans AS (
  SELECT doc_id, isl_id,
         MIN(s) AS a,
         LEAST(MAX(s) + {_XS_W}, MIN(n_tokens)) AS b,
         MIN(n_tokens) AS n_tokens
  FROM isl2 GROUP BY 1, 2
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_islands,
       CAST(SUM(b - a) AS BIGINT) AS removed_tokens,
       ROUND(CAST(SUM(b - a) AS DOUBLE) / MIN(n_tokens), 4)
         AS removed_frac
FROM spans
GROUP BY 1
"""


_XS_MAXI = f"CAST(FLOOR((size(_uh) - {_XS_W}) / {_XS_STRIDE}.0) AS INT)"
_XS_SPARK = (
    _exact_substr_sql(
        token_hashes_spark(),
        f"aggregate(slice(_uh, span_idx * {_XS_STRIDE} + 1, {_XS_W}),"
        f" CAST(0 AS BIGINT), (h, x) -> (h * 31 + x) % 1000000007)",
    )
    .replace("{SEQ}", f"explode(sequence(0, GREATEST({_XS_MAXI}, 0)))")
    .replace("{N_TOK}", "size(_uh)")
)

_XS_MAXI_D = f"CAST(FLOOR((len(_uh) - {_XS_W}) / {_XS_STRIDE}.0) AS BIGINT)"
_XS_ORACLE = (
    _exact_substr_sql(
        token_hashes_duckdb(),
        f"LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT),"
        f" _uh[span_idx * {_XS_STRIDE} + 1"
        f" : span_idx * {_XS_STRIDE} + {_XS_W}]),"
        f" (h, x) -> (h * 31 + x) % 1000000007)",
    )
    .replace(
        "{SEQ}",
        f"UNNEST(generate_series(0, GREATEST({_XS_MAXI_D}, 0)))",
    )
    .replace("{N_TOK}", "len(_uh)")
)


@register("exact_substring_removal", _XS_ORACLE)
def exact_substring_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document removal accounting for ExactSubstr dedup: maximal
    merged spans of corpus-duplicated 16-token windows and the token
    count an ExactSubstr pass would delete.  The island merge runs per
    document over only that document's duplicated window starts, so
    the window sort is bounded by doc length at any corpus size."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_XS_SPARK)


# --- deterministic epoch shuffle → training-shard plan -----------------------
#
# The pipeline's last stage: assign every kept document to a training
# shard and fix the WITHIN-SHARD read order, reproducibly (a re-run,
# a resumed run, and the oracle must produce byte-identical shard
# manifests — the same replay discipline as the stratified sampler; no
# rand()).  Order key = an LCG mix of doc_id and the epoch seed;
# shard = key mod n_shards (uniform, so shards balance to ±√n).
#
# The per-shard ORDER-SENSITIVE fingerprint (polynomial fold over the
# ordered doc ids) is what proves the order: any transposition changes
# it.  At 10^12 docs the shard writer is `repartition(shard)` +
# `sortWithinPartitions(key)` with the fold computed incrementally by
# the writer task — the collect_list here is the test-scale stand-in,
# bounded by corpus/n_shards.

_EPOCH_SEED = 20260818
_N_SHARDS = 16
_EPOCH_KEY = f"((doc_id * 2654435761 + {_EPOCH_SEED}) % 999999937)"

_SHARD_ORACLE = f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         {_EPOCH_KEY} AS k,
         {_EPOCH_KEY} % {_N_SHARDS} AS shard
  FROM documents
)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       LIST_REDUCE(
         LIST_PREPEND(CAST(0 AS BIGINT), LIST(doc_id ORDER BY k, doc_id)),
         (h, d) -> (h * 1000003 + d) % 1000000007) AS order_fp
FROM keyed
GROUP BY 1
"""

_SHARD_SPARK = f"""
WITH keyed AS (
  SELECT doc_id, n_chars,
         {_EPOCH_KEY} AS k,
         {_EPOCH_KEY} % {_N_SHARDS} AS shard
  FROM documents
)
SELECT shard,
       COUNT(*) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
       aggregate(
         transform(array_sort(collect_list(struct(k, doc_id))),
                   s -> s.doc_id),
         CAST(0 AS BIGINT),
         (h, d) -> (h * 1000003 + d) % 1000000007) AS order_fp
FROM keyed
GROUP BY 1
"""


@register("epoch_shard_plan", _SHARD_ORACLE)
def epoch_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible epoch-shuffle shard manifest: per shard, the doc
    count, byte mass, and an order-sensitive fingerprint of the exact
    read order.  One shuffle on the shard key; order is a per-shard
    local sort (sortWithinPartitions at the writer — never a global
    sort)."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_SHARD_SPARK)


# --- weighted priority sample (Efraimidis–Spirakis A-ES) -----------------------
#
# The one-pass distributed weighted sample every curation pipeline
# needs (quota sampling by quality/length weight, mergeable across
# partitions): key_i = −ln(u_i)/w_i with u_i a deterministic LCG draw;
# the k SMALLEST keys are a weighted sample without replacement.  The
# top-k is a TakeOrdered (partial per partition, merged on the driver)
# — never a global sort; keys are rounded to the 1e-6 lattice before
# ranking so cross-engine ordering is exact, ties by doc_id.

_AES_K = 25
_AES_U = "((doc_id * 2654435761 + 40503) % 999983 + 1)"  # 1..999983


def _aes_sql() -> str:
    # u in (0, 1]: exact rational; -ln(u)/w with w = n_chars
    return f"""
WITH keyed AS (
  SELECT doc_id, lang, n_chars,
         ROUND(-LN(CAST({_AES_U} AS DOUBLE) / 999983.0)
               / CAST(n_chars AS DOUBLE), 6) AS aes_key
  FROM documents
  WHERE n_chars > 0
)
SELECT doc_id, lang, n_chars, aes_key,
       CAST(rnk AS BIGINT) AS rank
FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY aes_key, doc_id) AS rnk
  FROM keyed
) r
WHERE rnk <= {_AES_K}
"""


@register("weighted_priority_sample", _aes_sql())
def weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Efraimidis–Spirakis weighted sample-without-replacement (k=25,
    weight = n_chars): deterministic LCG draws, lattice-rounded keys,
    top-k by TakeOrdered — one pass, mergeable, no global sort."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_aes_sql())
