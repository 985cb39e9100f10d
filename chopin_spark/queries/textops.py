"""Text-pipeline queries over the documents table: dedup, quality,
language heuristic, fingerprinting. All oracle-checked except the
LSH/SimHash internals (registered rows-only; their semantics are pinned
by tests/test_textops.py against exact-Jaccard oracles)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark.queries import register
from chopin_spark.tables import load
from chopin_spark.textops import (
    minhash_dedup_verified,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash,
)

# --- exact dedup ------------------------------------------------------------

_DEDUP_ORACLE = """
SELECT md5(text) AS text_md5,
       COUNT(*) AS n_copies,
       MIN(doc_id) AS canonical_doc
FROM documents
GROUP BY 1
"""


@register("dedup_exact", _DEDUP_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: one shuffle on the content hash; canonical row =
    min doc_id (deterministic survivor policy)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.groupBy(F.md5("text").alias("text_md5"))
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("canonical_doc"),
        )
    )


# --- text quality / token stats ----------------------------------------------
#
# Token count via pure length arithmetic (texts are single-space
# separated) so the SQL text is engine-agnostic; distinct-token and
# stopword counts via list HOFs with identical semantics.

_NTOK = "(LENGTH(text) - LENGTH(REPLACE(text, ' ', '')) + 1)"

_QUALITY_ORACLE = f"""
SELECT doc_id,
       {_NTOK} AS n_tokens,
       LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS n_distinct,
       LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                       x -> x IN ('a', 'the'))) AS n_stop,
       ROUND(CAST(LENGTH(REPLACE(text, ' ', '')) AS DOUBLE)
             / {_NTOK}, 4) AS mean_token_len,
       ROUND(CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                                  x -> x IN ('a', 'the'))) AS DOUBLE)
             / {_NTOK}, 4) AS stop_ratio
FROM documents
"""


@register("text_quality", _QUALITY_ORACLE)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: token count, type count, stopword ratio, mean
    token length — linear scan, zero shuffles, full codegen."""
    docs = load(spark, sf_dir, "documents")
    ntok = F.expr(_NTOK)
    toks = F.split(F.col("text"), " ")
    nstop = F.size(F.filter(toks, lambda x: x.isin("a", "the")))
    return docs.select(
        "doc_id",
        ntok.alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        nstop.alias("n_stop"),
        F.round(
            F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast(
                "double"
            )
            / ntok,
            4,
        ).alias("mean_token_len"),
        F.round(nstop.cast("double") / ntok, 4).alias("stop_ratio"),
    )


# --- language-id heuristic -----------------------------------------------------

_LANG_ORACLE = f"""
WITH scored AS (
  SELECT lang,
         CASE WHEN CAST(LEN(LIST_FILTER(STRING_SPLIT(text, ' '),
                   x -> x IN ('a', 'the'))) AS DOUBLE) / {_NTOK} >= 0.05
              THEN 'en' ELSE 'unk' END AS predicted
  FROM documents
)
SELECT lang, predicted, COUNT(*) AS n_docs
FROM scored GROUP BY 1, 2
"""


@register("lang_id_stopword", _LANG_ORACLE)
def lang_id_stopword(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio language heuristic (n-gram-lexicon shape) and its
    confusion matrix against the labeled lang column."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    ratio = F.size(F.filter(toks, lambda x: x.isin("a", "the"))).cast(
        "double"
    ) / F.expr(_NTOK)
    return (
        docs.select(
            "lang",
            F.when(ratio >= 0.05, "en").otherwise("unk").alias("predicted"),
        )
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


# --- rolling-hash document fingerprint -----------------------------------------

_FP_ORACLE = """
SELECT doc_id,
       LIST_REDUCE(
         LIST_PREPEND(CAST(0 AS BIGINT),
           LIST_TRANSFORM(generate_series(1, LEAST(LENGTH(text), 100)),
             i -> CAST(ASCII(SUBSTR(text, CAST(i AS INT), 1)) AS BIGINT))),
         (h, c) -> (h * 31 + c) % 1000000007) AS fp
FROM documents
"""


@register("doc_fingerprint", _FP_ORACLE)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Polynomial rolling hash over the first 100 chars (document
    fingerprinting) — a left fold, evaluated JVM-side via the aggregate
    HOF; bit-identical to the DuckDB list_reduce oracle."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(
            "aggregate("
            " transform(sequence(1, least(length(text), 100)),"
            "           i -> cast(ascii(substring(text, i, 1)) as bigint)),"
            " cast(0 as bigint),"
            " (h, c) -> (h * 31 + c) % 1000000007)"
        ).alias("fp"),
    )


# --- n-gram Jaccard near-dup pairs ---------------------------------------------

_JACCARD_ORACLE = """
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         UNNEST(LIST_TRANSFORM(generate_series(1, LEN(w) - 4),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                || w[i+3] || ' ' || w[i+4])) AS shingle
  FROM toks WHERE LEN(w) >= 5
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d1, d2,
       ROUND(CAST(i AS DOUBLE) / (s1.n_sh + s2.n_sh - i), 4) AS jaccard
FROM inter
JOIN sizes s1 ON d1 = s1.doc_id
JOIN sizes s2 ON d2 = s2.doc_id
WHERE ROUND(CAST(i AS DOUBLE) / (s1.n_sh + s2.n_sh - i), 4) >= 0.5
"""


@register("dedup_ngram_jaccard", _JACCARD_ORACLE)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 5-gram Jaccard near-dup pairs (threshold 0.5) via
    inverted-index self-join — the exact baseline the MinHash-LSH path
    approximates."""
    docs = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.5)


_MAX_DF = 2

_JACCARD_CAPPED_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
),
sh0 AS (
  SELECT DISTINCT doc_id,
         UNNEST(LIST_TRANSFORM(generate_series(1, LEN(w) - 4),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                || w[i+3] || ' ' || w[i+4])) AS shingle
  FROM toks WHERE LEN(w) >= 5
),
keep AS (
  SELECT shingle FROM sh0 GROUP BY 1 HAVING COUNT(*) <= {_MAX_DF}
),
sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d1, d2,
       ROUND(CAST(i AS DOUBLE) / (s1.n_sh + s2.n_sh - i), 4) AS jaccard
FROM inter
JOIN sizes s1 ON d1 = s1.doc_id
JOIN sizes s2 ON d2 = s2.doc_id
WHERE ROUND(CAST(i AS DOUBLE) / (s1.n_sh + s2.n_sh - i), 4) >= 0.5
"""


@register("dedup_ngram_jaccard_capped", _JACCARD_CAPPED_ORACLE)
def dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB-safe variant of the inverted-index Jaccard join:
    shingles with document frequency > max_df are dropped before the
    pair join (textops.ngram_jaccard_pairs max_df), bounding the join's
    fan-out at max_df² per shingle regardless of boilerplate skew.
    Jaccard is re-based on the retained shingle universe; the oracle
    applies the identical cap, so values stay hash-exact."""
    docs = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(docs, threshold=0.5, max_df=_MAX_DF)


# --- MinHash-LSH and SimHash ---------------------------------------------------
#
# Value-level DuckDB oracles (VERDICT r01 next-steps #5): the base hash
# is the engine-constant polynomial char fold (textops.charfold_*), so
# signatures, band buckets, SimHash bits and verified Jaccard all
# recompute exactly in SQL.

from chopin_spark.textops import (  # noqa: E402
    _MERSENNE, _SHINGLE_B, _hash_params, P30, SIMHASH_BITS,
    shingles_from_uh_duckdb, token_hashes_duckdb, token_hash60_duckdb,
    token_hashes_spark,
)

_N_HASHES, _BANDS = 32, 8
_R = _N_HASHES // _BANDS

# token-hash array projected in its OWN CTE so the fold runs once per
# row (inlined it re-evaluates per reference — see textops.py)
_SH_CTE = f"""
uh AS (
  SELECT doc_id, {token_hashes_duckdb()} AS _uh FROM documents
),
toks AS (
  SELECT doc_id, {shingles_from_uh_duckdb(5)} AS svs
  FROM uh WHERE len(_uh) >= 5
),
sh AS (SELECT DISTINCT doc_id, UNNEST(svs) AS v FROM toks)
"""

_SIG_COLS = ",\n       ".join(
    f"MIN((v * {a} + {b}) % {_MERSENNE}) AS h{i}"
    for i, (a, b) in enumerate(_hash_params(_N_HASHES))
)

_BAND_ROWS = "\n  UNION ALL\n".join(
    f"  SELECT doc_id, {bi} AS band, concat_ws('_', "
    + ", ".join(f"h{bi * _R + k}" for k in range(_R))
    + ") AS bucket FROM sig"
    for bi in range(_BANDS)
)

_CAND_SQL = f"""
WITH {_SH_CTE},
sig AS (
  SELECT doc_id,
       {_SIG_COLS}
  FROM sh GROUP BY 1
),
bands AS (
{_BAND_ROWS}
)
SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
FROM bands a
JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
            AND a.doc_id < b.doc_id
"""

_DEDUP_SQL = f"""
WITH {_SH_CTE},
sig AS (
  SELECT doc_id,
       {_SIG_COLS}
  FROM sh GROUP BY 1
),
bands AS (
{_BAND_ROWS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
              AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT c.d1, c.d2, COUNT(*) AS i
  FROM cand c
  JOIN sh a ON a.doc_id = c.d1
  JOIN sh b ON b.doc_id = c.d2 AND b.v = a.v
  GROUP BY 1, 2
)
SELECT d1, d2,
       ROUND(CAST(i AS DOUBLE) / (s1.n_sh + s2.n_sh - i), 4) AS jaccard
FROM inter
JOIN sizes s1 ON d1 = s1.doc_id
JOIN sizes s2 ON d2 = s2.doc_id
WHERE ROUND(CAST(i AS DOUBLE) / (s1.n_sh + s2.n_sh - i), 4) >= 0.9
"""


@register("minhash_lsh_dedup", _DEDUP_SQL)
def minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(32) → 8-band LSH candidates → exact-Jaccard verify ≥0.9
    over the hashed shingle sets; recall additionally pinned against the
    exact-Jaccard oracle in tests/test_textops.py."""
    docs = load(spark, sf_dir, "documents")
    return minhash_dedup_verified(docs, threshold=0.9)


@register("minhash_lsh_candidates", _CAND_SQL)
def minhash_lsh_candidates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw LSH band-bucket candidate pairs (pre-verification)."""
    docs = load(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs)


_SIMHASH_SUMS = ",\n       ".join(
    f"SUM(CASE WHEN (h >> {k}) & 1 = 1 THEN 1 ELSE -1 END) AS b{k}"
    for k in range(SIMHASH_BITS)
)
_SIMHASH_FP = " + ".join(
    f"(CASE WHEN b{k} > 0 THEN CAST(1 AS BIGINT) << {k}"
    f" ELSE CAST(0 AS BIGINT) END)"
    for k in range(SIMHASH_BITS)
)

_SIMHASH_SQL = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents
),
h AS (SELECT doc_id, {token_hash60_duckdb('t')} AS h FROM tok),
sums AS (
  SELECT doc_id,
       {_SIMHASH_SUMS}
  FROM h GROUP BY 1
)
SELECT doc_id, {_SIMHASH_FP} AS simhash FROM sums
"""


@register("simhash_fingerprints", _SIMHASH_SQL)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per document (pure column math, one groupBy)."""
    docs = load(spark, sf_dir, "documents")
    return simhash(docs)


# --- duplicate CLUSTERS from verified pairs (connected components) ----------

_PAIR_CTES = f"""{_SH_CTE},
sig AS (
  SELECT doc_id,
       {_SIG_COLS}
  FROM sh GROUP BY 1
),
bands AS (
{_BAND_ROWS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
              AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT c.d1, c.d2, COUNT(*) AS i
  FROM cand c
  JOIN sh a ON a.doc_id = c.d1
  JOIN sh b ON b.doc_id = c.d2 AND b.v = a.v
  GROUP BY 1, 2
),
pairs AS (
  SELECT d1, d2
  FROM inter
  JOIN sizes s1 ON d1 = s1.doc_id
  JOIN sizes s2 ON d2 = s2.doc_id
  WHERE ROUND(CAST(i AS DOUBLE) / (s1.n_sh + s2.n_sh - i), 4) >= 0.9
)"""

_COMP_SQL = f"""
WITH RECURSIVE {_PAIR_CTES},
edges AS (
  SELECT d1 AS src, d2 AS dst FROM pairs
  UNION
  SELECT d2, d1 FROM pairs
),
reach AS (
  SELECT src AS a, dst AS b FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
)
SELECT a AS doc_id, LEAST(a, MIN(b)) AS comp_id
FROM reach GROUP BY a
"""


@register("dedup_components", _COMP_SQL)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate CLUSTERS, not just pairs: MinHash-LSH candidates →
    exact-Jaccard verify ≥0.9 → connected components by min-label
    propagation (chopin_spark.components — diameter-bounded rounds,
    localCheckpoint lineage cuts).  comp_id = min doc_id per cluster;
    keep-one-representative dedup reads `doc_id != comp_id` as the
    drop set.  Oracle: transitive closure via DuckDB recursive CTE
    over the identically-recomputed verified pairs — an entirely
    different algorithm arriving at the same fixpoint."""
    from chopin_spark.components import connected_components

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_dedup_verified(docs, threshold=0.9).select("d1", "d2")
    return connected_components(pairs).select(
        F.col("node").alias("doc_id"), "comp_id"
    )


# --- fixed-window chunking with overlap (training-sequence prep) ------------

_CW, _CS = 32, 24  # window 32 tokens, stride 24 (8-token overlap)

_CHUNK_SPARK = f"""
WITH uh AS (
  SELECT doc_id, {token_hashes_spark()} AS _uh FROM documents
),
ex AS (
  SELECT doc_id, _uh,
         explode(sequence(0, CAST(FLOOR((size(_uh) - 1) / {_CS}.0) AS INT)))
           AS chunk_idx
  FROM uh
),
ck AS (
  SELECT doc_id, chunk_idx,
         slice(_uh, chunk_idx * {_CS} + 1, {_CW}) AS c
  FROM ex
)
SELECT doc_id, chunk_idx, size(c) AS n_tokens,
       aggregate(c, CAST(0 AS BIGINT),
                 (h, x) -> (h * 31 + x) % 1000000007) AS chunk_hash
FROM ck
"""

_CHUNK_ORACLE = f"""
WITH uh AS (
  SELECT doc_id, {token_hashes_duckdb()} AS _uh FROM documents
),
ex AS (
  SELECT doc_id, _uh,
         UNNEST(generate_series(
           0, CAST(FLOOR((len(_uh) - 1) / {_CS}.0) AS BIGINT))) AS chunk_idx
  FROM uh
),
ck AS (
  SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx,
         _uh[chunk_idx * {_CS} + 1 : chunk_idx * {_CS} + {_CW}] AS c
  FROM ex
)
SELECT doc_id, chunk_idx, CAST(len(c) AS INT) AS n_tokens,
       LIST_REDUCE(LIST_PREPEND(CAST(0 AS BIGINT), c),
                   (h, x) -> (h * 31 + x) % 1000000007) AS chunk_hash
FROM ck
"""


@register("doc_chunk_windows", _CHUNK_ORACLE)
def doc_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-sequence chunking: every document split into
    32-token windows at stride 24 (8-token overlap), each chunk
    identified by a polynomial hash of its token-hash slice.  One
    explode + per-row array math, zero shuffles, zero Python — at
    10^12 docs this is a map-only stage.  The fold-with-zero spelling
    matches between Spark `aggregate` and DuckDB
    LIST_REDUCE(LIST_PREPEND(0, …)) (doc_fingerprint pattern)."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_CHUNK_SPARK)


# --- PII scrubbing (regex redaction + audit counts) --------------------------
#
# The synthetic corpus has no PII, so the query INJECTS deterministic
# email/phone strings into a known subset first (same SQL both
# engines), then scrubs — the redaction count and the fingerprint of
# the scrubbed text pin both the detector and the replacement.
# Patterns avoid backslashes entirely ([.] instead of \.) so Java
# (Spark) and RE2 (DuckDB) parse them identically through each SQL
# dialect's string-literal rules.

_EMAIL_RE = "[a-z0-9._%+-]+@[a-z0-9.-]+[.][a-z][a-z]+"
_PHONE_RE = "555-[0-9][0-9][0-9][0-9]"

_PII_BASE = """
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN text || ' contact user' || CAST(doc_id AS STRING)
                        || '@mail.example.com or 555-'
                        || CAST(1000 + doc_id % 9000 AS STRING)
              ELSE text END AS t
  FROM documents
"""

_PII_SPARK = f"""
WITH base AS ({_PII_BASE}),
scrub AS (
  SELECT doc_id,
         regexp_count(t, '{_EMAIL_RE}') AS n_emails,
         regexp_count(t, '{_PHONE_RE}') AS n_phones,
         regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '[EMAIL]'),
                        '{_PHONE_RE}', '[PHONE]') AS clean
  FROM base
)
SELECT doc_id, CAST(n_emails AS INT) AS n_emails,
       CAST(n_phones AS INT) AS n_phones,
       aggregate(
         transform(sequence(1, least(length(clean), 200)),
                   i -> cast(ascii(substring(clean, i, 1)) as bigint)),
         CAST(0 AS BIGINT), (h, c) -> (h * 31 + c) % 1000000007
       ) AS clean_fp
FROM scrub
"""

_PII_ORACLE = f"""
WITH base AS ({_PII_BASE}),
scrub AS (
  SELECT doc_id,
         LEN(regexp_extract_all(t, '{_EMAIL_RE}')) AS n_emails,
         LEN(regexp_extract_all(t, '{_PHONE_RE}')) AS n_phones,
         regexp_replace(regexp_replace(t, '{_EMAIL_RE}', '[EMAIL]', 'g'),
                        '{_PHONE_RE}', '[PHONE]', 'g') AS clean
  FROM base
)
SELECT doc_id, CAST(n_emails AS INT) AS n_emails,
       CAST(n_phones AS INT) AS n_phones,
       LIST_REDUCE(
         LIST_PREPEND(CAST(0 AS BIGINT),
           LIST_TRANSFORM(generate_series(1, LEAST(LENGTH(clean), 200)),
             i -> CAST(ASCII(SUBSTR(clean, CAST(i AS INT), 1)) AS BIGINT))),
         (h, c) -> (h * 31 + c) % 1000000007) AS clean_fp
FROM scrub
"""


@register("pii_scrub_stats", _PII_ORACLE)
def pii_scrub_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction pass: detect + replace emails/phones, emit per-doc
    redaction counts and a fingerprint of the scrubbed text (so the
    REPLACEMENT is pinned, not just the count).  Map-only regex stage —
    JVM codegen in Spark; at 10^12 docs this fuses into the scan."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_PII_SPARK)


@register("dedup_components_star", _COMP_SQL)
def dedup_components_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The alternating large-star/small-star variant of
    dedup_components (components.connected_components_star — Kiveris
    SoCC'14, O(log n) rounds for adversarial diameters).  Same verified
    pair graph, same recursive-CTE oracle, THIRD independent algorithm
    arriving at the identical fixpoint."""
    from chopin_spark.components import connected_components_star

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_dedup_verified(docs, threshold=0.9).select("d1", "d2")
    return connected_components_star(pairs).select(
        F.col("node").alias("doc_id"), "comp_id"
    )


# --- canonical-document selection per duplicate cluster ----------------------
#
# The dedup ENDGAME a training pipeline actually executes: clusters →
# pick ONE representative per cluster (the longest document, doc_id
# tie-break) → everything else is the drop list.  The argmax is a
# packed-ordinal MAX_BY (n_chars·10^6 − doc_id), which partial-
# aggregates map-side — no per-cluster sort/window at 10^12 docs.

_CANON_SQL = f"""
WITH RECURSIVE {_PAIR_CTES},
edges AS (
  SELECT d1 AS src, d2 AS dst FROM pairs
  UNION
  SELECT d2, d1 FROM pairs
),
reach AS (
  SELECT src AS a, dst AS b FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
),
comp AS (
  SELECT a AS doc_id, LEAST(a, MIN(b)) AS comp_id FROM reach GROUP BY a
),
q AS (
  SELECT c.comp_id, c.doc_id, d.n_chars
  FROM comp c JOIN documents d ON d.doc_id = c.doc_id
)
SELECT comp_id,
       CAST(arg_max(doc_id, n_chars * 1000000 - doc_id) AS BIGINT)
         AS canonical_doc,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(doc_id) - arg_max(doc_id, n_chars * 1000000 - doc_id)
            AS BIGINT) AS dropped_id_sum
FROM q GROUP BY comp_id
"""


@register("dedup_cluster_canonical", _CANON_SQL)
def dedup_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-one-per-cluster dedup: MinHash-LSH verified pairs →
    connected components → per-cluster canonical document = longest
    text (min doc_id on ties), everything else summarized as the drop
    set.  The selection is max_by over a packed ordinal — an argmax
    WITHOUT a window, one combiner-friendly shuffle on comp_id.  The
    oracle recomputes the identical pipeline with a recursive-CTE
    closure standing in for the distributed components algorithm."""
    from chopin_spark.components import connected_components

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_dedup_verified(docs, threshold=0.9).select("d1", "d2")
    comp = connected_components(pairs).select(
        F.col("node").alias("doc_id"), "comp_id"
    )
    j = comp.join(docs.select("doc_id", "n_chars"), "doc_id")
    ordinal = "n_chars * 1000000 - doc_id"
    return j.groupBy("comp_id").agg(
        F.expr(f"max_by(doc_id, {ordinal})").cast("long").alias("canonical_doc"),
        F.count(F.lit(1)).alias("n_members"),
        (
            F.sum("doc_id") - F.expr(f"max_by(doc_id, {ordinal})")
        ).cast("long").alias("dropped_id_sum"),
    )


# --- model-based quality filtering (hashed linear classifier) ----------------
#
# The DCLM / FineWeb-Edu curation step: a linear classifier over hashed
# token features scores every document and a threshold keeps the head.
# The MODEL is data: a 2^14-bucket weight vector applied as a sparse
# dot product — at 10^12 docs this is one broadcast of a 16k-entry
# weight table (here folded to a closed-form expression, the
# deterministic stand-in for trained weights) and one linear scan with
# JVM higher-order functions; per-doc score = Σ w[h(tok) mod 2^14],
# integer-exact, zero shuffle before the final keep-rate rollup.

_QC_BUCKETS = 16384
_QC_W = "((({b}) * 2654435761) % 1999 - 999)"  # weights in [-999, 999]

_QCLS_SPARK = f"""
WITH uh AS (
  SELECT doc_id, lang, {token_hashes_spark()} AS _uh FROM documents
),
s AS (
  SELECT doc_id, lang,
         CAST(size(_uh) AS BIGINT) AS n_tok,
         aggregate(
           transform(_uh, _u -> {_QC_W.format(b='_u % ' + str(_QC_BUCKETS))}),
           CAST(0 AS BIGINT), (_a, _w) -> _a + _w
         ) AS w_sum
  FROM uh
)
SELECT doc_id, lang, n_tok, w_sum,
       ROUND(CAST(w_sum AS DOUBLE) / n_tok, 4) AS q_score,
       CAST(CASE WHEN w_sum > 0 THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM s
"""

_QCLS_ORACLE = f"""
WITH uh AS (
  SELECT doc_id, lang, {token_hashes_duckdb()} AS _uh FROM documents
),
s AS (
  SELECT doc_id, lang,
         CAST(len(_uh) AS BIGINT) AS n_tok,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(_uh,
               _u -> {_QC_W.format(b='_u % ' + str(_QC_BUCKETS))})),
           (_a, _w) -> _a + _w
         ) AS w_sum
  FROM uh
)
SELECT doc_id, lang, n_tok, w_sum,
       ROUND(CAST(w_sum AS DOUBLE) / n_tok, 4) AS q_score,
       CAST(CASE WHEN w_sum > 0 THEN 1 ELSE 0 END AS BIGINT) AS kept
FROM s
"""


@register("quality_classifier_scores", _QCLS_ORACLE)
def quality_classifier_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear quality classifier: per-document sparse
    dot product against a 2^14-bucket weight vector (closed-form
    deterministic weights standing in for a trained model), integer
    score sum, mean-weight score, threshold keep flag.  One scan, all
    JVM HOFs — the model-based filtering stage of a curation
    pipeline."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_QCLS_SPARK)


# --- BM25 top-k retrieval (inverted-index scoring over the corpus) -----------
#
# The IR primitive of a web-corpus engine: score every document against
# a fixed keyword query with Okapi BM25 (Lucene IDF variant) and return
# the top-k.  Distributed shape: explode tokens -> FILTER TO QUERY
# TERMS FIRST (the selective predicate prunes ~90% of postings before
# any shuffle) -> per-(doc, term) tf; df and the global (N, avgdl)
# scalars ride a broadcast; one final per-doc sum + top-k.  At 100 TB
# the shuffled volume is the POSTINGS OF THE QUERY TERMS only — the
# inverted-index access path, never the corpus.

_BM_TERMS = ("dup", "spark", "merge")
_BM_K1, _BM_B, _BM_K = 1.2, 0.75, 20

_BM_TERMS_SQL = ", ".join(f"'{t}'" for t in _BM_TERMS)


def _bm25_sql(split_fn: str) -> str:
    """Shared SQL text; `split_fn` is the dialect's split-to-list call."""
    return f"""
WITH toks AS (
  SELECT doc_id, {split_fn} AS tk FROM documents
),
dl AS (
  SELECT doc_id, CAST({{size_fn}}(tk) AS BIGINT) AS dl FROM toks
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
post AS (
  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, {{unnest_fn}} AS t FROM toks)
  WHERE t IN ({_BM_TERMS_SQL})
  GROUP BY 1, 2
),
df AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM post GROUP BY 1
),
scored AS (
  SELECT p.doc_id,
         SUM(
           LN((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
           * (p.tf * ({_BM_K1!r} + 1.0))
           / (p.tf + {_BM_K1!r}
              * (1.0 - {_BM_B!r} + {_BM_B!r} * d.dl / s.avgdl))
         ) AS score,
         CAST(COUNT(*) AS BIGINT) AS n_terms
  FROM post p
  JOIN df f ON f.t = p.t
  JOIN dl d ON d.doc_id = p.doc_id
  CROSS JOIN stats s
  GROUP BY 1
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY ROUND(score, 4) DESC, doc_id)
            AS BIGINT) AS rank,
       doc_id, ROUND(score, 4) AS score_bm25, n_terms
FROM scored
ORDER BY rank
LIMIT {_BM_K}
"""


_BM25_SPARK = _bm25_sql("split(text, ' ')").format(
    size_fn="size", unnest_fn="explode(tk)"
)
_BM25_ORACLE = _bm25_sql("string_split(text, ' ')").format(
    size_fn="len", unnest_fn="UNNEST(tk)"
)


@register("bm25_topk", _BM25_ORACLE)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-20 for the fixed query {dup, spark, merge} (mixed
    document frequencies: rare + common terms).  Scores rounded to 4
    decimals BEFORE ranking so cross-engine ordering is deterministic
    (ties broken by doc_id); the only doubles are LN and divisions on
    identical inputs."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_BM25_SPARK)


# --- prefix-filtered (AllPairs/PPJoin) exact Jaccard join ---------------------

_PREFIX_JACCARD_ORACLE = """
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         UNNEST(LIST_TRANSFORM(generate_series(1, LEN(w) - 4),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                || w[i+3] || ' ' || w[i+4])) AS shingle
  FROM toks WHERE LEN(w) >= 5
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT d1, d2,
       CAST(i AS BIGINT) AS inter,
       CAST(s1.n_sh + s2.n_sh - i AS BIGINT) AS uni,
       ROUND(CAST(i AS DOUBLE) / (s1.n_sh + s2.n_sh - i), 4) AS jaccard
FROM inter
JOIN sizes s1 ON d1 = s1.doc_id
JOIN sizes s2 ON d2 = s2.doc_id
WHERE 10 * i >= 6 * (s1.n_sh + s2.n_sh - i)
"""


@register("dedup_jaccard_prefix_filter", _PREFIX_JACCARD_ORACLE)
def dedup_jaccard_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AllPairs/PPJoin prefix filtering at J ≥ 0.6: docs index only
    their p = |s| − ceil(0.6·|s|) + 1 globally-rarest shingles; the
    prefix-to-prefix equi-join is complete by theorem (the smallest
    common shingle of a qualifying pair lies in both prefixes), then
    an exact verify join computes |A∩B| for candidates only.  The
    ORACLE is the brute-force inverted-index join over ALL postings —
    a value-hash match proves the prefix filter lost no pair.  The
    threshold test is the integer cross-multiplication 10·i ≥ 6·u on
    both sides — no float knife-edge."""
    from chopin_spark.textops import jaccard_prefix_pairs

    docs = load(spark, sf_dir, "documents")
    return jaccard_prefix_pairs(docs, threshold_tenths=6)


# --- cross-split leakage audit (near-dups straddling train/val/test) ---------
#
# The QA check downstream of pages_split_leakage_safe: a host-keyed
# split guarantees no HOST straddles splits, but near-duplicate TEXT
# can still leak across hosts (mirrors, syndication).  This audit
# composes the verified MinHash near-dup pairs (jaccard >= 0.9) with
# the split assignment and rolls up pair counts per (split, split)
# cell — the off-diagonal cells are the leakage a curator must fix
# (drop the eval-side copy).  Pair ids are summed order-free so the
# value hash pins WHICH pairs leak, not just how many.

from chopin_spark.pages import host_sql  # noqa: E402
from chopin_spark.textops import charfold_duckdb, charfold_spark  # noqa: E402


def _split_map_sql(fold_fn) -> str:
    """doc_id -> split, the pages_split_leakage_safe recipe keyed on
    the derived host (every page of a host in one split)."""
    return f"""
SELECT doc_id,
       CASE WHEN b < 800 THEN 'train' WHEN b < 900 THEN 'val'
            ELSE 'test' END AS split
FROM (
  SELECT doc_id, (({fold_fn('host')}) * 2654435761) % 1000 AS b
  FROM (SELECT doc_id, {host_sql('doc_id')} AS host FROM documents)
)
"""


_LEAK_TAIL = """
SELECT LEAST(m1.split, m2.split) AS split_a,
       GREATEST(m1.split, m2.split) AS split_b,
       COUNT(*) AS n_pairs,
       CAST(SUM(p.d1 + p.d2) AS BIGINT) AS pair_id_sum
FROM pairs p
JOIN smap m1 ON m1.doc_id = p.d1
JOIN smap m2 ON m2.doc_id = p.d2
GROUP BY 1, 2
"""

_LEAK_ORACLE = f"""
WITH {_SH_CTE},
sig AS (
  SELECT doc_id,
       {_SIG_COLS}
  FROM sh GROUP BY 1
),
bands AS (
{_BAND_ROWS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM bands a
  JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
              AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT c.d1, c.d2, COUNT(*) AS i
  FROM cand c
  JOIN sh a ON a.doc_id = c.d1
  JOIN sh b ON b.doc_id = c.d2 AND b.v = a.v
  GROUP BY 1, 2
),
pairs AS (
  SELECT d1, d2
  FROM inter
  JOIN sizes s1 ON d1 = s1.doc_id
  JOIN sizes s2 ON d2 = s2.doc_id
  WHERE ROUND(CAST(i AS DOUBLE) / (s1.n_sh + s2.n_sh - i), 4) >= 0.9
),
smap AS ({_split_map_sql(charfold_duckdb)})
{_LEAK_TAIL}
"""


@register("split_leakage_audit", _LEAK_ORACLE)
def split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs per (split, split) cell.  Engine: the verified
    MinHash pair pipeline (bucketed LSH join, never n²) composed with
    the broadcast split map — one extra dimension join + a 6-key
    rollup on top of minhash_lsh_dedup's plan."""
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_dedup_verified(docs, threshold=0.9).select("d1", "d2")
    docs.createOrReplaceTempView("documents")
    smap = spark.sql(_split_map_sql(charfold_spark))
    pairs.createOrReplaceTempView("pairs")
    smap.createOrReplaceTempView("smap")
    return spark.sql(_LEAK_TAIL)


# --- asymmetric containment near-dup pairs ------------------------------------
#
# Broder's SECOND measure.  Jaccard (resemblance) under-scores subset
# copies: a 40-token document pasted verbatim into a 400-token one has
# containment ~1.0 but Jaccard ~0.1, so every resemblance-thresholded
# dedup pass above keeps both copies.  Real crawls are full of these
# (article + site chrome, quote-heavy aggregators), which is why
# curation stacks run a containment pass besides MinHash.  Same
# inverted-index + df-cap plan as dedup_ngram_jaccard_capped — only the
# scoring finish differs.

_CONT_MAX_DF = 4
_CONT_THRESHOLD = 0.8

_CONTAINMENT_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
),
sh0 AS (
  SELECT DISTINCT doc_id,
         UNNEST(LIST_TRANSFORM(generate_series(1, LEN(w) - 4),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                || w[i+3] || ' ' || w[i+4])) AS shingle
  FROM toks WHERE LEN(w) >= 5
),
keep AS (
  SELECT shingle FROM sh0 GROUP BY 1 HAVING COUNT(*) <= {_CONT_MAX_DF}
),
sh AS (SELECT sh0.* FROM sh0 JOIN keep USING (shingle)),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1),
inter AS (
  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS i
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
scored AS (
  SELECT d1, d2, i,
         ROUND(CAST(i AS DOUBLE) / s1.n_sh, 4) AS c_fwd,
         ROUND(CAST(i AS DOUBLE) / s2.n_sh, 4) AS c_rev
  FROM inter
  JOIN sizes s1 ON d1 = s1.doc_id
  JOIN sizes s2 ON d2 = s2.doc_id
)
SELECT d1, d2, i, c_fwd, c_rev
FROM scored
WHERE GREATEST(c_fwd, c_rev) >= {_CONT_THRESHOLD}
"""


@register("dedup_containment_pairs", _CONTAINMENT_ORACLE)
def dedup_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric 5-gram containment pairs (either direction >= 0.8),
    df-capped like the capped-Jaccard query.  The subset-copy case the
    resemblance queries miss is pinned semantically in
    tests/test_textops.py (containment flags it, Jaccard does not)."""
    docs = load(spark, sf_dir, "documents")
    from chopin_spark.textops import containment_pairs

    return containment_pairs(
        docs, threshold=_CONT_THRESHOLD, n=5, max_df=_CONT_MAX_DF
    )


# --- benchmark decontamination (13-gram overlap vs a held-out eval set) -------
#
# The GPT-3-appendix / standard eval-decontamination recipe: a training
# document is contaminated if it shares any 13-token n-gram with a
# benchmark document.  The eval set here is a deterministic corpus
# slice (doc_id % 7 = 3 — benchmark stand-in; no external data by
# design); at crawl scale the eval side is benchmark-sized and
# BROADCAST, so the plan is one map-side semi-join over the corpus
# shingles — no shuffle of the 100 TB side at all.  Shingles stay
# literal strings here (exactness, zero collision caveat); a production
# run at 10^12 docs would hash them first (textops.hashed_shingles)
# since the broadcast set is the only thing a collision could inflate.

_DECONTAM_N = 13
_EVAL_MOD, _EVAL_REM = 7, 3

_DECONTAM_SHINGLE = " || ' ' || ".join(
    f"w[i+{k}]" if k else "w[i]" for k in range(_DECONTAM_N)
)

_DECONTAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         UNNEST(LIST_TRANSFORM(generate_series(1, LEN(w) - {_DECONTAM_N - 1}),
           i -> {_DECONTAM_SHINGLE})) AS shingle
  FROM toks WHERE LEN(w) >= {_DECONTAM_N}
),
ev AS (
  SELECT DISTINCT shingle FROM sh WHERE doc_id % {_EVAL_MOD} = {_EVAL_REM}
),
sizes AS (
  SELECT doc_id, COUNT(*) AS n_sh FROM sh
  WHERE doc_id % {_EVAL_MOD} <> {_EVAL_REM} GROUP BY 1
),
hits AS (
  SELECT s.doc_id, COUNT(*) AS n_contam
  FROM sh s JOIN ev USING (shingle)
  WHERE s.doc_id % {_EVAL_MOD} <> {_EVAL_REM}
  GROUP BY 1
)
SELECT h.doc_id, h.n_contam, z.n_sh,
       ROUND(CAST(h.n_contam AS DOUBLE) / z.n_sh, 4) AS contam_frac
FROM hits h JOIN sizes z USING (doc_id)
"""


@register("benchmark_decontam_13gram", _DECONTAM_ORACLE)
def benchmark_decontam_13gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per contaminated training doc: distinct 13-grams shared with the
    eval slice, its shingle count, and the contaminated fraction.  Eval
    shingle set is broadcast (benchmark-sized at any corpus scale)."""
    from chopin_spark.textops import shingles

    docs = load(spark, sf_dir, "documents")
    sh = shingles(docs, "doc_id", _DECONTAM_N)
    is_eval = (F.col("doc_id") % _EVAL_MOD) == _EVAL_REM
    ev = sh.filter(is_eval).select("shingle").distinct()
    corpus = sh.filter(~is_eval)
    sizes = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    hits = (
        corpus.join(F.broadcast(ev), "shingle")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contam"))
    )
    return hits.join(sizes, "doc_id").select(
        "doc_id",
        "n_contam",
        "n_sh",
        F.round(F.col("n_contam").cast("double") / F.col("n_sh"), 4).alias(
            "contam_frac"
        ),
    )


# --- quality-score language-bias audit -----------------------------------------
#
# The curation fairness check: a quality classifier trained on one
# language's conventions silently down-weights others — audited here as
# the language composition of each score decile.  Deciles come from
# NTILE over (q_score, doc_id) (total order, engine-stable); shares
# are exact-integer ratios rounded once.  Reuses the _QCLS scorer
# verbatim, so the audit scores EXACTLY what the filter deploys.  At
# 10^12 docs the NTILE becomes exact count quantiles of the score
# (par_cut_coords path); the per-(decile, lang) rollup is unchanged.

_QBIAS_CORE = """
d AS (
  SELECT lang, NTILE(10) OVER (ORDER BY q_score, doc_id) AS decile
  FROM s2
),
tot AS (
  SELECT decile, COUNT(*) AS n_dec FROM d GROUP BY 1
)
SELECT d.decile, d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(COUNT(*) AS DOUBLE) / MIN(tot.n_dec), 6) AS share
FROM d JOIN tot ON tot.decile = d.decile
GROUP BY 1, 2
"""


def _qbias_sql(qcls: str) -> str:
    # reuse the full classifier text as a subquery named s2
    return f"WITH s2 AS (\n{qcls}\n),\n{_QBIAS_CORE}"


@register("qscore_lang_bias_audit", _qbias_sql(_QCLS_ORACLE))
def qscore_lang_bias_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language composition per quality-score decile — the fairness
    audit of the deployed hashed-feature classifier (same scorer text
    as quality_classifier_scores)."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_qbias_sql(_QCLS_SPARK))


# --- Spearman rank correlation: length vs classifier score ---------------------
#
# Does the deployed quality classifier just measure document LENGTH?
# Spearman's ρ = 1 − 6Σd²/(n(n²−1)) over the two rank vectors —
# integer-exact end to end: ranks come from ROW_NUMBER over the total
# orders (value, doc_id) (the deterministic tie convention, stated
# rather than averaged), d² sums stay under n³ ≪ 2^63, and the single
# division is the last op under ROUND(,6).  Two window passes + one
# 1-row agg.

_SPEAR_SQL = f"""
WITH s AS (
{{scorer}}
),
r AS (
  SELECT ROW_NUMBER() OVER (ORDER BY n_tok, doc_id) AS r_len,
         ROW_NUMBER() OVER (ORDER BY w_sum, doc_id) AS r_q
  FROM s
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM((r_len - r_q) * (r_len - r_q)) AS BIGINT) AS d2
  FROM r
)
SELECT n, d2,
       ROUND(1.0 - 6.0 * d2 / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE)
             * CAST(n AS DOUBLE) - 1.0)), 6) AS spearman_rho
FROM agg
"""


@register("spearman_len_vs_score", _SPEAR_SQL.format(scorer=_QCLS_ORACLE))
def spearman_len_vs_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman ρ between token count and classifier score (reusing
    the deployed _QCLS scorer verbatim) — the length-confound check."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_SPEAR_SQL.format(scorer=_QCLS_SPARK))


# --- Kolmogorov-Smirnov two-sample test: en vs de length distributions -------
#
# The distribution-shift audit a curation pipeline runs between corpus
# slices (languages, epochs, sources): exact two-sample KS statistic
# D = sup_v |F_en(v) - F_de(v)| over the pooled support.  Putting both
# ECDFs over a common denominator n_en*n_de keeps the sup an INTEGER
# max: D_num = max_v |c_en(v)*n_de - c_de(v)*n_en| with c = cumulative
# counts at distinct v (one sort-free groupBy + one window over the
# distinct-value table, never the raw rows).  At 100 TB the grouped
# distinct-value table is |support|-sized (~1e5), so the window is a
# metadata-scale step after a map-side-combining agg.

_KS_SQL = """
WITH s AS (
  SELECT n_chars AS v,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS g1,
         CASE WHEN lang = 'de' THEN 1 ELSE 0 END AS g2
  FROM documents WHERE lang IN ('en', 'de')
),
per_v AS (
  SELECT v, CAST(SUM(g1) AS BIGINT) AS a, CAST(SUM(g2) AS BIGINT) AS b
  FROM s GROUP BY v
),
cum AS (
  SELECT v,
         SUM(a) OVER (ORDER BY v) AS c1,
         SUM(b) OVER (ORDER BY v) AS c2
  FROM per_v
),
tot AS (
  SELECT CAST(SUM(a) AS BIGINT) AS n1, CAST(SUM(b) AS BIGINT) AS n2
  FROM per_v
)
SELECT tot.n1 AS n_en, tot.n2 AS n_de,
       CAST(MAX(ABS(cum.c1 * tot.n2 - cum.c2 * tot.n1)) AS BIGINT)
         AS d_num,
       ROUND(MAX(ABS(cum.c1 * tot.n2 - cum.c2 * tot.n1))
             / (CAST(tot.n1 AS DOUBLE) * CAST(tot.n2 AS DOUBLE)),
             6) AS ks_d
FROM cum CROSS JOIN tot
GROUP BY tot.n1, tot.n2
"""


@register("ks_two_sample_lang", _KS_SQL)
def ks_two_sample_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov D between the en and de
    document-length distributions — integer sup over the common
    denominator, one final double division."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_KS_SQL)


# --- hard-negative mining for contrastive retrieval training ------------------
#
# The pair-mining step of training a retriever (DPR/E5-style): for each
# anchor document, the top-k BM25-most-similar documents from OTHER
# sources are the "hard negatives" — lexically close, semantically
# non-duplicate.  Anchors are a deterministic 1/139 slice of the
# corpus; terms are word BIGRAMS (phrase-level lexical overlap — the
# unigram vocabulary is stopword-grade) scored through the
# inverted-index access path of bm25_topk with a df cap
# (df*10 <= n_docs) so hot shingles never enter the join — the
# postings shuffled are those of the anchors' RARE bigrams only,
# never the corpus.

_HN_MOD, _HN_RES = 139, 3   # anchor slice: corpus/139 anchors
_HN_K = 5
_HN_K1, _HN_B = 1.2, 0.75


def _hard_neg_sql(split_fn: str) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, {split_fn} AS w FROM documents
),
dl AS (
  SELECT doc_id, CAST({{size_fn}}(w) AS BIGINT) - 1 AS dl FROM toks
  WHERE {{size_fn}}(w) >= 2
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
allpost AS (
  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, {{bigram_fn}} AS t FROM toks
        WHERE {{size_fn}}(w) >= 2)
  GROUP BY 1, 2
),
df AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM allpost GROUP BY 1
),
qterms AS (
  SELECT p.doc_id AS q_id, p.t
  FROM allpost p
  CROSS JOIN stats s
  JOIN df f ON f.t = p.t
  WHERE p.doc_id % {_HN_MOD} = {_HN_RES}
    AND f.df * 10 <= s.n_docs
),
scored AS (
  SELECT q.q_id, p.doc_id AS neg_id,
         SUM(
           LN((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
           * (p.tf * ({_HN_K1!r} + 1.0))
           / (p.tf + {_HN_K1!r}
              * (1.0 - {_HN_B!r} + {_HN_B!r} * d.dl / s.avgdl))
         ) AS score,
         CAST(COUNT(*) AS BIGINT) AS n_shared_terms
  FROM qterms q
  JOIN allpost p ON p.t = q.t AND p.doc_id <> q.q_id
  JOIN df f ON f.t = q.t
  JOIN dl d ON d.doc_id = p.doc_id
  CROSS JOIN stats s
  JOIN documents qa ON qa.doc_id = q.q_id
  JOIN documents ca ON ca.doc_id = p.doc_id
  WHERE qa.source <> ca.source
  GROUP BY 1, 2
)
SELECT q_id, neg_id, rank, score_bm25, n_shared_terms
FROM (
  SELECT q_id, neg_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY q_id
              ORDER BY ROUND(score, 4) DESC, neg_id) AS BIGINT) AS rank,
         ROUND(score, 4) AS score_bm25, n_shared_terms
  FROM scored
) r
WHERE rank <= {_HN_K}
"""


_HN_SPARK = _hard_neg_sql("split(text, ' ')").format(
    size_fn="size",
    bigram_fn=(
        "explode(transform(sequence(1, size(w) - 1),"
        " i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1))))"
    ),
)
_HN_ORACLE = _hard_neg_sql("string_split(text, ' ')").format(
    size_fn="len",
    bigram_fn=(
        "UNNEST(LIST_TRANSFORM(generate_series(1, LEN(w) - 1),"
        " i -> w[i] || ' ' || w[i+1]))"
    ),
)


@register("hard_negative_mining", _HN_ORACLE)
def hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive-retrieval hard negatives: per anchor (1/139 slice),
    BM25 top-5 over rare-bigram overlap from other sources via the
    df-capped inverted index — scores rounded before ranking, ties by
    neg_id, cross-engine deterministic."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_HN_SPARK)


# --- chi-square independence audit: lang × source ------------------------------
#
# The corpus-composition independence test (is language mix uniform
# across ingestion sources, or does one source skew the mixture?).
# Pearson chi² via the sparse-safe identity
#   chi² = n · Σ_cells O²/(R·C) − n
# — zero cells contribute nothing to the sum, so the OBSERVED cells
# alone yield the complete statistic.  Each cell's n·O²/(R·C) is an
# exact-integer numerator over one division, rounded to the 1e-6
# lattice and SUMMED AS SCALED BIGINT — reduction-order independent,
# cross-engine exact (the statistics battery's standard recipe,
# docs/SCALE.md).  The contingency table is |langs|×|sources| —
# metadata-sized after one fact-pass agg.

_CHI2_SQL = """
WITH cells AS (
  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS o
  FROM documents GROUP BY 1, 2
),
rows_ AS (SELECT lang, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
cols_ AS (SELECT source, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells),
dims AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM rows_) AS n_langs,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM cols_) AS n_sources
),
terms AS (
  SELECT CAST(FLOOR(
           (t.n * ce.o * ce.o)
           / (CAST(r.r AS DOUBLE) * c.c) * 1000000 + 0.5
         ) AS BIGINT) AS term_micro
  FROM cells ce
  JOIN rows_ r ON r.lang = ce.lang
  JOIN cols_ c ON c.source = ce.source
  CROSS JOIN tot t
)
SELECT t.n AS n_docs, d.n_langs, d.n_sources,
       (d.n_langs - 1) * (d.n_sources - 1) AS dof,
       (SELECT CAST(SUM(term_micro) AS BIGINT) FROM terms)
         - t.n * 1000000 AS chi2_micro,
       ROUND(CAST((SELECT SUM(term_micro) FROM terms) - t.n * 1000000
                  AS DOUBLE) / 1000000.0, 6) AS chi2
FROM tot t CROSS JOIN dims d
"""


@register("chi_square_lang_source", _CHI2_SQL)
def chi_square_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square independence test of the lang × source
    contingency table via the sparse-safe identity n·ΣO²/(R·C) − n
    (zero cells contribute nothing, so the observed-cell sum is the
    COMPLETE statistic) — integer carriers per cell, micro-lattice
    rounding before the associative BIGINT sum."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_CHI2_SQL)


# --- per-source TF-IDF signature terms ----------------------------------------
#
# The corpus-slicing diagnostic: which terms CHARACTERIZE each ingest
# source (tf within source × inverse source frequency)?  One exploded
# agg to (source, term, tf), one term-keyed agg for the source df, a
# broadcast-sized n_sources scalar, then a per-source top-3 window over
# the (source × vocab)-bounded scored table — fact rows are touched
# exactly once.

def _tfidf_sql(unnest_src: str) -> str:
    return f"""
WITH tf AS (
  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS tf
  FROM ({unnest_src})
  GROUP BY 1, 2
),
sdf AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS n_src FROM tf GROUP BY 1
),
ns AS (
  SELECT CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources FROM tf
),
scored AS (
  SELECT tf.source, tf.t, tf.tf,
         ROUND(tf.tf * LN((ns.n_sources + 1.0) / (sdf.n_src + 1.0)), 4)
           AS tfidf
  FROM tf JOIN sdf ON sdf.t = tf.t CROSS JOIN ns
)
SELECT source, t AS term, rank, tf, tfidf
FROM (
  SELECT source, t, tf, tfidf,
         CAST(ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY tfidf DESC, t) AS BIGINT) AS rank
  FROM scored
) r
WHERE rank <= 3
"""


_TFIDF_SPARK = _tfidf_sql(
    "SELECT source, explode(split(text, ' ')) AS t FROM documents"
)
_TFIDF_ORACLE = _tfidf_sql(
    "SELECT source, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents"
)


@register("tfidf_source_terms", _TFIDF_ORACLE)
def tfidf_source_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF signature terms per ingest source (smoothed inverse
    source frequency) — scores rounded before ranking, ties by term,
    cross-engine deterministic."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_TFIDF_SPARK)


# --- conjunctive (AND) search: postings-list intersection ----------------------
#
# The boolean-retrieval primitive under every filtered corpus scan:
# documents containing ALL query terms.  The inverted-index plan —
# explode → filter to the query terms → doc-keyed agg HAVING
# COUNT(DISTINCT term) = k — shuffles only the query terms' postings
# and intersects them in one partial-aggregable pass (no k-way
# self-join chain, which would shuffle the shortest list k−1 times).

_AND_TERMS = ("spark", "merge", "window")


def _and_search_sql(unnest_src: str) -> str:
    terms = ", ".join(f"'{t}'" for t in _AND_TERMS)
    return f"""
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_hits,
       CAST(COUNT(DISTINCT t) AS BIGINT) AS n_terms
FROM ({unnest_src})
WHERE t IN ({terms})
GROUP BY doc_id
HAVING COUNT(DISTINCT t) = {len(_AND_TERMS)}
"""


@register(
    "conjunctive_term_search",
    _and_search_sql(
        "SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents"
    ),
)
def conjunctive_term_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Docs containing ALL of {spark, merge, window}: postings filter +
    one doc-keyed agg with a distinct-term gate — never a k-way
    self-join."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        _and_search_sql(
            "SELECT doc_id, explode(split(text, ' ')) AS t FROM documents"
        )
    )


# --- sorted-neighborhood dedup (windowed-adjacency blocking) ------------------
#
# The classic entity-resolution alternative to equi-key blocking
# (Hernández & Stolfo's merge/purge): sort records by a discriminating
# key and compare only records that land within a fixed window of each
# other.  Complements the repo's other pair producers — MinHash/LSH
# band equi-joins, n-gram inverted index, prefix-filtered AllPairs —
# with the *ordering-based* family: candidate count is n·w by
# construction, no hot-bucket risk at any skew.
#
# Scale shape: the block key is (lang, 8-char text prefix), so the sort
# is per-block inside hash partitions — a bounded window function, not
# a global ORDER BY; the comparator (banded edit distance on the
# 48-char prefix) is a JVM builtin on both engines.

_SNM_WINDOW = 2  # compare each record to its next-2 neighbors
_SNM_MAXLEV = 12  # accept pairs within this edit distance on prefix-48

_SNM_SQL = f"""
WITH s AS (
  SELECT doc_id, text,
         LEAD(doc_id, 1) OVER (PARTITION BY lang, substr(text, 1, 8)
                               ORDER BY text, doc_id) AS nb1_id,
         LEAD(text, 1)   OVER (PARTITION BY lang, substr(text, 1, 8)
                               ORDER BY text, doc_id) AS nb1_t,
         LEAD(doc_id, 2) OVER (PARTITION BY lang, substr(text, 1, 8)
                               ORDER BY text, doc_id) AS nb2_id,
         LEAD(text, 2)   OVER (PARTITION BY lang, substr(text, 1, 8)
                               ORDER BY text, doc_id) AS nb2_t
  FROM documents
),
cand AS (
  SELECT s.doc_id AS doc_a,
         CASE WHEN o.k = 1 THEN nb1_id ELSE nb2_id END AS doc_b,
         CAST(o.k AS BIGINT) AS win_offset,
         substr(s.text, 1, 48) AS pa,
         CASE WHEN o.k = 1 THEN substr(nb1_t, 1, 48)
              ELSE substr(nb2_t, 1, 48) END AS pb,
         substr(s.text, 1, 96) AS qa,
         CASE WHEN o.k = 1 THEN substr(nb1_t, 1, 96)
              ELSE substr(nb2_t, 1, 96) END AS qb
  FROM s CROSS JOIN (VALUES (1), (2)) AS o(k)
)
SELECT doc_a, doc_b, win_offset,
       CAST(levenshtein(pa, pb) AS BIGINT) AS lev48,
       CAST(levenshtein(qa, qb) AS BIGINT) AS lev96
FROM cand
WHERE doc_b IS NOT NULL AND levenshtein(pa, pb) <= {_SNM_MAXLEV}
"""


@register("dedup_sorted_neighborhood", _SNM_SQL)
def dedup_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted-neighborhood near-dup candidates: per (lang, prefix-8)
    block, each document is compared to its next-2 neighbors in text
    order; pairs within edit distance {12} on the 48-char prefix
    survive, reported with the 96-char distance as well."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_SNM_SQL)


# --- content-defined chunking (CDC) dedup --------------------------------------
#
# The missing granularity in the dedup family: exact/minhash/simhash/
# containment/substring all compare DOCUMENTS (or fixed windows); CDC
# (FastCDC/rsync lineage) cuts each document at CONTENT-derived
# boundaries — a rolling gear hash over the last 3 token hashes,
# boundary where it ≡ 0 (mod 8) — so an insertion early in a page
# shifts every fixed window but leaves all later CDC chunks (and their
# dedup hits) intact.  Chunk signature = (length, Σuh, Σuh·rank) mod
# P30: order-sensitive, integer-exact, commutative-collision-resistant.
#
# Scale shape: one shuffle by doc_id feeds every window (LAG gear,
# cumulative boundary count, per-chunk rank) — per-doc sequential state
# bounded by doc length, the sessionize pattern; then one signature agg
# and one broadcast-back join.  No pair enumeration anywhere: duplicate
# chunks meet in the signature GROUP BY exactly like dedup_exact.

_CDC_MOD = 8  # expected chunk length = 8 tokens

_CDC_BODY = f"""
l AS (
  SELECT doc_id, source, pos, uh,
         LAG(uh, 1) OVER w AS l1, LAG(uh, 2) OVER w AS l2
  FROM t
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
),
b AS (
  SELECT doc_id, source, pos, uh,
         CASE WHEN pos >= 3
                   AND ((((l2 * {_SHINGLE_B} + l1) % {P30})
                         * {_SHINGLE_B} + uh) % {P30}) % {_CDC_MOD} = 0
              THEN 1 ELSE 0 END AS brk
  FROM l
),
c AS (
  SELECT doc_id, source, pos, uh,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS chunk_no
  FROM b
),
r AS (
  SELECT doc_id, source, chunk_no, uh,
         pos - MIN(pos) OVER (PARTITION BY doc_id, chunk_no) + 1 AS rk
  FROM c
),
ch AS (
  SELECT doc_id, source, chunk_no,
         CAST(COUNT(*) AS BIGINT) AS len,
         CAST(SUM(uh) % {P30} AS BIGINT) AS s1,
         CAST(SUM(uh * rk % {P30}) % {P30} AS BIGINT) AS swt
  FROM r
  GROUP BY 1, 2, 3
),
sig AS (
  SELECT len, s1, swt, COUNT(*) AS occ
  FROM ch GROUP BY 1, 2, 3
)
SELECT ch.source,
       COUNT(*) AS n_chunks,
       CAST(SUM(CASE WHEN sig.occ > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_chunks,
       CAST(SUM(CASE WHEN sig.occ > 1 THEN ch.len ELSE 0 END) AS BIGINT)
         AS dup_token_mass
FROM ch
JOIN sig ON sig.len = ch.len AND sig.s1 = ch.s1 AND sig.swt = ch.swt
GROUP BY 1
"""

_CDC_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source, i AS pos, uh[i] AS uh
  FROM (
    SELECT doc_id, source, uh,
           UNNEST(generate_series(1, LEN(uh))) AS i
    FROM (SELECT doc_id, source, {token_hashes_duckdb()} AS uh
          FROM documents) q0
  ) q1
),
{_CDC_BODY.lstrip()}
"""

_CDC_SPARK = f"""
WITH t AS (
  SELECT doc_id, source, pos + 1 AS pos, uh
  FROM (SELECT doc_id, source, {token_hashes_spark()} AS _uh
        FROM documents) q0
  LATERAL VIEW posexplode(_uh) AS pos, uh
),
{_CDC_BODY.lstrip()}
"""


@register("cdc_chunk_dedup", _CDC_ORACLE)
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking dedup per ingest source: rolling-gear
    boundaries (mod-8 on the 3-token shingle hash), exact integer chunk
    signatures, duplicate-chunk counts and token mass — shift-robust
    sub-document dedup with zero pair enumeration."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_CDC_SPARK)


# --- query-likelihood retrieval with Dirichlet smoothing -----------------------
#
# The language-model retrieval family beside BM25 (Ponte & Croft;
# Zhai & Lafferty's Dirichlet prior): score(d) = Σ_t ln((tf + µ·P(t|C))
# / (dl + µ)) over the SAME query terms.  Unlike BM25, absent terms
# still contribute (the smoothing mass), so candidates (docs matching
# ≥1 term) cross the 3-term query dimension and LEFT JOIN their tfs.
#
# Scale shape: identical inverted-index access path as bm25_topk —
# postings of the query terms are the only shuffled volume; the
# collection LM P(t|C) is one token agg folded to 3 broadcast scalars;
# the candidate × 3-term frame is candidate-sized.  ln enters once per
# (candidate, term) and the 3-term sum sits ~1e-15 under the 1e-4
# ROUND grain.

_QL_MU = 2000.0


def _ql_sql(split_fn: str) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, {split_fn} AS tk FROM documents
),
dl AS (
  SELECT doc_id, CAST({{size_fn}}(tk) AS BIGINT) AS dl FROM toks
),
allt AS (
  SELECT doc_id, {{unnest_fn}} AS t FROM toks
),
coll AS (SELECT CAST(COUNT(*) AS BIGINT) AS ct FROM allt),
cf AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS cf
  FROM allt WHERE t IN ({_BM_TERMS_SQL}) GROUP BY 1
),
post AS (
  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
  FROM allt WHERE t IN ({_BM_TERMS_SQL}) GROUP BY 1, 2
),
cand AS (SELECT DISTINCT doc_id FROM post),
scored AS (
  SELECT c.doc_id,
         SUM(LN((COALESCE(p.tf, 0) + {_QL_MU!r} * (CAST(cf.cf AS DOUBLE) / coll.ct))
                / (d.dl + {_QL_MU!r}))) AS score,
         CAST(SUM(CASE WHEN p.tf IS NULL THEN 0 ELSE 1 END) AS BIGINT)
           AS n_matched
  FROM cand c
  CROSS JOIN cf
  CROSS JOIN coll
  JOIN dl d ON d.doc_id = c.doc_id
  LEFT JOIN post p ON p.doc_id = c.doc_id AND p.t = cf.t
  GROUP BY 1
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY ROUND(score, 4) DESC, doc_id)
            AS BIGINT) AS rank,
       doc_id, ROUND(score, 4) AS score_ql, n_matched
FROM scored
ORDER BY rank
LIMIT {_BM_K}
"""


_QL_SPARK = _ql_sql("split(text, ' ')").format(
    size_fn="size", unnest_fn="explode(tk)"
)
_QL_ORACLE = _ql_sql("string_split(text, ' ')").format(
    size_fn="len", unnest_fn="UNNEST(tk)"
)


@register("query_likelihood_topk", _QL_ORACLE)
def query_likelihood_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dirichlet-smoothed query-likelihood top-20 for the BM25 query
    terms — the LM retrieval model on the same inverted-index access
    path; scores rounded before ranking, doc_id tie-break."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_QL_SPARK)


# --- Pareto skyline (multi-criteria document selection) -------------------------
#
# The classic database skyline operator over two maximize-criteria:
# length (n_chars) and lexical richness (distinct token count).  A doc
# is on the skyline iff NO other doc beats it strictly on BOTH.  The
# 2-D case needs no pair join at all: collapse to one row per a-value
# (MAX b), take the prefix maximum over strictly-greater a (one window
# over the DISTINCT-a spine, a-bounded metadata), and a doc survives
# iff its b exceeds every b reachable at higher a.  At 10^12 docs the
# only fact-sized stages are the token-count agg and the final
# broadcast-joined filter — the skyline frontier itself is tiny by
# nature, which is the operator's selling point for curation shortlists
# ("no doc both longer AND richer exists").

_SKY_SQL = """
WITH pts AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS a, b
  FROM documents
  JOIN (
    SELECT doc_id AS td, CAST(COUNT(DISTINCT t) AS BIGINT) AS b
    FROM ({TOKS}) GROUP BY 1
  ) tc ON tc.td = doc_id
),
spine AS (
  SELECT a, MAX(b) AS mb FROM pts GROUP BY a
),
pref AS (
  SELECT a,
         MAX(mb) OVER (ORDER BY a DESC
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS best_gt
  FROM spine
)
SELECT p.doc_id, p.a AS n_chars, p.b AS n_distinct_tokens
FROM pts p
JOIN pref f ON f.a = p.a
WHERE f.best_gt IS NULL OR p.b > f.best_gt
"""

_SKY_ORACLE = _SKY_SQL.format(
    TOKS="SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents"
)
_SKY_SPARK = _SKY_SQL.format(
    TOKS="SELECT doc_id, explode(split(text, ' ')) AS t FROM documents"
)


@register("pareto_skyline_docs", _SKY_ORACLE)
def pareto_skyline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline of (n_chars, distinct-token count): docs no other doc
    strictly dominates on both axes — the 2-D sort-scan formulation
    (distinct-a spine + prefix max), zero pair enumeration."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_SKY_SPARK)


# --- isotonic calibration of the quality classifier ----------------------------
#
# The probability-calibration step between training a filter and
# trusting its scores (Zadrozny & Elkan; sklearn's
# IsotonicRegression): bin documents by score decile, measure the
# empirical label rate (lang='en', the classifier's training target),
# and fit the monotone-nondecreasing rate curve by pool-adjacent-
# violators.  PAVA is sequential, but its SOLUTION has the closed
# minimax form iso(i) = max_{j<=i} min_{k>=i} avg(y[j..k]) — over 10
# deciles that is a 220-triple enumeration of exact integer interval
# sums (cp_k − cp_{j−1})/(cn_k − cn_{j−1}), so the whole fit is one
# declarative plan: NTILE → prefix sums → bounded interval join →
# two deterministic argmin/argmax windows.  Scale shape: the fact
# table is touched once (score + decile); everything after the 10-row
# pre-agg is metadata-sized, at any corpus size.

_ISO_CORE = """
d AS (
  SELECT NTILE(10) OVER (ORDER BY q_score, doc_id) AS bin,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
  FROM s2
),
b AS (
  SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS pos
  FROM d GROUP BY 1
),
pref AS (
  SELECT bin, n, pos,
         CAST(SUM(n) OVER (ORDER BY bin
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cn,
         CAST(SUM(pos) OVER (ORDER BY bin
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cp
  FROM b
),
iv AS (
  SELECT j.bin AS j, k.bin AS k,
         k.cp - j.cp + j.pos AS num,
         k.cn - j.cn + j.n AS den
  FROM pref j JOIN pref k ON j.bin <= k.bin
),
mn AS (
  SELECT i.bin AS i, iv.j, iv.num, iv.den,
         ROW_NUMBER() OVER (PARTITION BY i.bin, iv.j
                            ORDER BY CAST(iv.num AS DOUBLE) / iv.den,
                                     iv.k) AS rn
  FROM b i JOIN iv ON iv.j <= i.bin AND iv.k >= i.bin
),
mx AS (
  SELECT i, num, den,
         ROW_NUMBER() OVER (PARTITION BY i
                            ORDER BY CAST(num AS DOUBLE) / den DESC,
                                     j) AS rn2
  FROM mn WHERE rn = 1
)
SELECT b.bin, b.n, b.pos,
       ROUND(CAST(b.pos AS DOUBLE) / b.n, 6) AS raw_rate,
       ROUND(CAST(mx.num AS DOUBLE) / mx.den, 6) AS iso_rate
FROM b JOIN mx ON mx.i = b.bin AND mx.rn2 = 1
"""


def _iso_sql(qcls: str) -> str:
    return f"WITH s2 AS (\n{qcls}\n),\n{_ISO_CORE}"


@register("isotonic_calibration_qcls", _iso_sql(_QCLS_ORACLE))
def isotonic_calibration_qcls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic (PAVA) calibration curve of the deployed quality
    classifier: per score decile, raw empirical en-rate and the
    monotone minimax fit — same scorer text the filter ships."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_iso_sql(_QCLS_SPARK))


# --- NDCG@10 retrieval evaluation ----------------------------------------------
#
# The missing half of a retrieval stack: the repo ships five rankers
# (BM25, query-likelihood, RRF fusion, ANN, MMR) — this op EVALUATES
# one.  Per single-term query, the deployed BM25 ordering is scored
# against deterministic tf-graded qrels (rel = min(tf, 3): more
# mentions, more relevant) with NDCG@10.  Gains use the exact integer
# 2^rel−1 ∈ {1,3,7} (a CASE, no POWER); discounts are LN ratios on
# small integers; per-query DCG sums ≤10 doubles under the ROUND-4
# budget.  NDCG < 1 is structural, not a bug: BM25's tf saturation
# (k1) deliberately disagrees with raw-tf relevance in the tail.
#
# Scale shape: identical to bm25_topk — postings of the query terms
# only (the IN filter prunes before any shuffle), df/N/avgdl ride
# broadcasts, then two 10-row-per-query window heads.

_NDCG_K = 10


def _ndcg_sql(split_fn: str) -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, {split_fn} AS tk FROM documents
),
dl AS (
  SELECT doc_id, CAST({{size_fn}}(tk) AS BIGINT) AS dl FROM toks
),
stats AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM dl
),
post AS (
  SELECT doc_id, t, CAST(COUNT(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, {{unnest_fn}} AS t FROM toks)
  WHERE t IN ({_BM_TERMS_SQL})
  GROUP BY 1, 2
),
rel AS (
  SELECT doc_id, t, LEAST(tf, CAST(3 AS BIGINT)) AS rel FROM post
),
df AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS df FROM post GROUP BY 1
),
scored AS (
  SELECT p.t, p.doc_id, r.rel,
         LN((s.n_docs - f.df + 0.5) / (f.df + 0.5) + 1.0)
         * (p.tf * ({_BM_K1!r} + 1.0))
         / (p.tf + {_BM_K1!r}
            * (1.0 - {_BM_B!r} + {_BM_B!r} * d.dl / s.avgdl)) AS score
  FROM post p
  JOIN rel r ON r.doc_id = p.doc_id AND r.t = p.t
  JOIN df f ON f.t = p.t
  JOIN dl d ON d.doc_id = p.doc_id
  CROSS JOIN stats s
),
ranked AS (
  SELECT t, rel,
         ROW_NUMBER() OVER (PARTITION BY t
                            ORDER BY ROUND(score, 4) DESC, doc_id) AS rnk
  FROM scored
),
gains AS (
  SELECT t, rnk,
         CASE WHEN rel >= 3 THEN 7 WHEN rel = 2 THEN 3 ELSE 1 END AS g
  FROM ranked
),
dcg AS (
  SELECT t, SUM(g / (LN(CAST(rnk + 1 AS DOUBLE)) / LN(2.0))) AS dcg
  FROM gains WHERE rnk <= {_NDCG_K}
  GROUP BY 1
),
ideal AS (
  SELECT t, g,
         ROW_NUMBER() OVER (PARTITION BY t ORDER BY g DESC, rnk) AS irnk
  FROM gains
),
idcg AS (
  SELECT t, SUM(g / (LN(CAST(irnk + 1 AS DOUBLE)) / LN(2.0))) AS idcg
  FROM ideal WHERE irnk <= {_NDCG_K}
  GROUP BY 1
),
nrel AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS n_rel FROM rel GROUP BY 1
)
SELECT d.t AS term, nrel.n_rel,
       ROUND(d.dcg, 4) AS dcg_at10,
       ROUND(i.idcg, 4) AS idcg_at10,
       ROUND(d.dcg / i.idcg, 4) AS ndcg_at10
FROM dcg d
JOIN idcg i ON i.t = d.t
JOIN nrel ON nrel.t = d.t
"""


_NDCG_SPARK = _ndcg_sql("split(text, ' ')").format(
    size_fn="size", unnest_fn="explode(tk)"
)
_NDCG_ORACLE = _ndcg_sql("string_split(text, ' ')").format(
    size_fn="len", unnest_fn="UNNEST(tk)"
)


@register("ndcg_bm25_eval", _NDCG_ORACLE)
def ndcg_bm25_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@10 of the deployed BM25 ranking per query term, against
    tf-graded qrels — the retrieval-evaluation op of the ranking
    family."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_NDCG_SPARK)


# --- Bradley–Terry source ranking from pairwise quality preferences ------------
#
# The preference-model shape of an RLHF data pipeline: pairwise "doc A
# beats doc B" judgments aggregated into per-SOURCE strengths with the
# Bradley–Terry model, fit by 3 unrolled MM rounds (Hunter 2004):
# w_i ← W_i / Σ_j n_ij/(w_i+w_j), renormalized to mean 1.
#
# Preferences come from the deployed quality scorer's TOTAL order
# (q_score, doc_id) — so wins(s1,s2) is a rank statistic computed with
# ONE window pass over the source-exploded ranking (k× data for k
# sources), never the |s1|·|s2| pair join.  n_ij = |s_i|·|s_j| exactly
# (every cross-source pair is comparable under a total order) — a
# built-in sanity identity the tests pin.
#
# Scale shape: one fact scan for the scorer, one k-way window, then
# the MM rounds run on the k×k wins table (metadata).  The Spark side
# checkpoints the wins table so the 2-references-per-round MM chain
# re-reads 25 rows, not the corpus; the DuckDB twin marks it
# MATERIALIZED for the same reason.

_BT_ROUNDS = """
n AS (
  SELECT a.i, a.j, a.wins + b.wins AS n
  FROM bt_wins a JOIN bt_wins b ON b.i = a.j AND b.j = a.i
),
tw AS (SELECT i, CAST(SUM(wins) AS BIGINT) AS w_i FROM bt_wins GROUP BY 1),
k AS (SELECT CAST(COUNT(*) AS DOUBLE) AS k FROM tw),
w0 AS (SELECT i, CAST(1.0 AS DOUBLE) AS w FROM tw),
{MM}
SELECT tw.i AS source, tw.w_i AS n_wins,
       ROUND(w3n.w, 4) AS bt_strength,
       CAST(ROW_NUMBER() OVER (ORDER BY ROUND(w3n.w, 4) DESC, tw.i)
            AS BIGINT) AS quality_rank
FROM tw JOIN w3n ON w3n.i = tw.i
"""


def _bt_mm_round(prev: str, out: str) -> str:
    return f"""
{out}_raw AS (
  SELECT n.i, tw.w_i / SUM(n.n / (wi.w + wj.w)) AS w
  FROM n
  JOIN {prev} wi ON wi.i = n.i
  JOIN {prev} wj ON wj.i = n.j
  JOIN tw ON tw.i = n.i
  GROUP BY n.i, tw.w_i
),
{out} AS (
  SELECT i, w * (SELECT k FROM k) / SUM(w) OVER () AS w FROM {out}_raw
)"""


_BT_MM = ",".join(
    _bt_mm_round(p, o) for p, o in (("w0", "w1n"), ("w1n", "w2n"),
                                    ("w2n", "w3n"))
)
_BT_FINAL = _BT_ROUNDS.replace("{MM}", _BT_MM)


def _bt_wins_sql(qcls: str) -> str:
    return f"""
s2 AS (
{qcls}
),
ranked AS (
  SELECT s2.doc_id, d.source,
         ROW_NUMBER() OVER (ORDER BY s2.q_score, s2.doc_id) AS ord
  FROM s2 JOIN documents d ON d.doc_id = s2.doc_id
),
srcs AS (SELECT DISTINCT source FROM documents),
exp AS (
  SELECT r.ord, r.source AS src, s.source AS other
  FROM ranked r CROSS JOIN srcs s
),
run AS (
  SELECT ord, src, other,
         SUM(CASE WHEN src = other THEN 1 ELSE 0 END)
           OVER (PARTITION BY other ORDER BY ord
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS cnt_before
  FROM exp
)
SELECT src AS i, other AS j,
       CAST(SUM(COALESCE(cnt_before, CAST(0 AS BIGINT))) AS BIGINT) AS wins
FROM run WHERE src <> other
GROUP BY 1, 2
"""


_BT_ORACLE = (
    "WITH bt_wins AS MATERIALIZED (\nWITH "
    + _bt_wins_sql(_QCLS_ORACLE).strip()
    + "\n),\n"
    + _BT_FINAL.strip()
)


@register("bradley_terry_sources", _BT_ORACLE)
def bradley_terry_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley–Terry strength of each document source from pairwise
    quality-score preferences (3 MM rounds over rank-derived win
    counts)."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    spark.sql(
        "WITH " + _bt_wins_sql(_QCLS_SPARK).strip()
    ).localCheckpoint().createOrReplaceTempView("bt_wins")
    return spark.sql("WITH " + _BT_FINAL.strip())


# --- SimHash Hamming-ball dedup (Manku block-permutation banding) --------------
#
# Manku, Jain & Das Sarma (WWW'07), the Google crawl near-dup design:
# pairs within Hamming distance ≤ 3 of the 60-bit SimHash must share
# at least ONE of 4 15-bit blocks exactly (pigeonhole), so candidates
# come from 4 equi-joins on block values — never an all-pairs XOR.
# Completes the dedup family's third recall geometry: MinHash bands
# (Jaccard), prefix filter (containment), Hamming ball (SimHash).
#
# Verify = popcount(fp XOR fp') ≤ 3 on candidates only.  The ORACLE is
# the independent brute force — all-pairs popcount — so the hash match
# PROVES the pigeonhole banding loses no pair (the road_intersections
# bucketing contract applied to Hamming space).  Dialect seams: XOR is
# `^` in Spark / xor() in DuckDB; blocks by shift+mask are common text.
#
# Scale shape: 4 equi-joins keyed by (block_idx, block_value) — at
# crawl scale each block key fans out ~n/2^15 per bucket ceiling (add
# permuted block tables to push the ball radius, exactly the paper's
# table ladder); the verify is one popcount per candidate.

_HB_BLOCKS = 4
_HB_RADIUS = 3


def _hb_body(xor_fn) -> str:
    blocks = " UNION ALL ".join(
        f"SELECT doc_id, {k} AS blk,"
        f" (simhash >> {15 * k}) % 32768 AS bval FROM fp"
        for k in range(_HB_BLOCKS)
    )
    return f"""
blocks AS (
  {blocks}
),
cand AS (
  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
  FROM blocks a JOIN blocks b
    ON b.blk = a.blk AND b.bval = a.bval AND b.doc_id > a.doc_id
),
pairs AS (
  SELECT c.d1, c.d2,
         CAST(bit_count({xor_fn('f1.simhash', 'f2.simhash')}) AS BIGINT)
           AS ham
  FROM cand c
  JOIN fp f1 ON f1.doc_id = c.d1
  JOIN fp f2 ON f2.doc_id = c.d2
)
SELECT d1, d2, ham FROM pairs WHERE ham <= {_HB_RADIUS}
ORDER BY d1, d2
"""


_HB_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents
),
h AS (SELECT doc_id, {token_hash60_duckdb('t')} AS h FROM tok),
sums AS (
  SELECT doc_id,
       {_SIMHASH_SUMS}
  FROM h GROUP BY 1
),
fp AS (SELECT doc_id, {_SIMHASH_FP} AS simhash FROM sums)
SELECT a.doc_id AS d1, b.doc_id AS d2,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS ham
FROM fp a JOIN fp b ON b.doc_id > a.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {_HB_RADIUS}
ORDER BY d1, d2
"""


@register("simhash_hamming_dedup", _HB_ORACLE)
def simhash_hamming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs at SimHash Hamming distance ≤ 3 via Manku 4-block
    pigeonhole banding (4 equi-joins, popcount verify) — oracle is the
    independent all-pairs brute force, proving zero recall loss."""
    from chopin_spark.textops import simhash

    docs = load(spark, sf_dir, "documents")
    simhash(docs).localCheckpoint().createOrReplaceTempView("fp")
    return spark.sql(
        "WITH " + _hb_body(lambda a, b: f"({a} ^ {b})").strip()
    )
