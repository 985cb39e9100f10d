"""Deterministic distributed sketches + snapshot versioning.

* ``hll_distinct_urls`` — a from-scratch HyperLogLog whose hash, register
  assignment, and rank function are SHARED SQL text (polynomial char
  folds from chopin_spark.textops), so the sketch is bit-reproducible in
  both engines — unlike approx_count_distinct, whose HLL++ internals are
  engine-private.  The inverse-power sum Σ2^−M is a sum of dyadic
  rationals (exact in float64 regardless of reduction order), so even
  the final estimate is deterministic to the last bit.
* ``url_snapshot_scd2`` — slowly-changing-dimension (type 2) validity
  windows over crawl snapshots: lead() builds [valid_from, valid_to)
  per host, integer carriers pin the version ordering exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from chopin_spark.pages import epoch_sql, url_sql
from chopin_spark.queries import register
from chopin_spark.textops import charfold_duckdb, charfold_spark

_M = 64  # registers
_ALPHA_M = 0.709  # HLL alpha for m=64


def _hll_sql(charfold, series: str) -> str:
    """One SQL text, two dialect seams: the charfold builder and the
    0..m−1 register series (Spark: explode(sequence), DuckDB:
    generate_series) — the sketch arithmetic itself is common."""
    url = url_sql("doc_id")
    h1 = charfold("_u", 31)
    h2 = charfold("_u", 37)
    return f"""
WITH u AS (
  SELECT {url} AS _u FROM documents
),
hashed AS (
  SELECT {h1} AS h1, {h2} AS h2 FROM u
),
regs AS (
  SELECT h1 % {_M} AS reg,
         MAX(CASE WHEN h2 = 0 THEN 31
                  ELSE 31 - LENGTH(BIN(h2)) END) AS m_j
  FROM hashed GROUP BY 1
),
allregs AS (
  {series}
),
filled AS (
  SELECT a.reg, COALESCE(r.m_j, 0) AS m_j
  FROM allregs a LEFT JOIN regs r ON a.reg = r.reg
),
sketch AS (
  SELECT SUM(POWER(2.0, -m_j)) AS sum_inv,
         SUM(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS n_zero,
         CAST(SUM(m_j * ((reg * 13) % 31)) AS BIGINT) AS reg_chk
  FROM filled
),
exact AS (SELECT COUNT(DISTINCT _u) AS n_exact FROM u)
SELECT CAST({_M} AS BIGINT) AS m,
       CAST(n_zero AS BIGINT) AS n_zero,
       reg_chk,
       ROUND({_ALPHA_M} * {_M} * {_M} / sum_inv, 4) AS est_raw,
       ROUND(CASE WHEN {_ALPHA_M} * {_M} * {_M} / sum_inv <= 2.5 * {_M}
                       AND n_zero > 0
                  THEN {_M} * LN(CAST({_M} AS DOUBLE) / n_zero)
                  ELSE {_ALPHA_M} * {_M} * {_M} / sum_inv END, 4)
         AS est_corrected,
       CAST(n_exact AS BIGINT) AS n_exact,
       ROUND(({_ALPHA_M} * {_M} * {_M} / sum_inv - n_exact)
             / n_exact, 4) AS rel_err
FROM sketch CROSS JOIN exact
"""


_DDB_SERIES = f"SELECT i AS reg FROM generate_series(0, {_M - 1}) s(i)"
_SPK_SERIES = f"SELECT explode(sequence(0, {_M - 1})) AS reg"


@register("hll_distinct_urls", _hll_sql(charfold_duckdb, _DDB_SERIES))
def hll_distinct_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HyperLogLog cardinality sketch over page URLs —
    the custom distributed sketch operator: register = h1 mod 64,
    rank = leading-zero count of an independent 30-bit fold (BIN +
    LENGTH, no float log), per-register MAX merges associatively
    (partial agg map-side), and the estimate is a closed-form fold of
    the 64-entry register vector (a GROUP BY on a 64-value key — the
    sketch state is bytes, not data).  The exact distinct runs
    alongside to report the observed relative error of the sketch."""
    from chopin_spark.tables import load

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_hll_sql(charfold_spark, _SPK_SERIES))


_SCD2_ORACLE = f"""
WITH snaps AS (
  SELECT doc_id % 97 AS host_num,
         {epoch_sql('doc_id')} AS epoch,
         doc_id
  FROM documents
),
v AS (
  SELECT host_num, epoch, doc_id,
         ROW_NUMBER() OVER (PARTITION BY host_num ORDER BY epoch, doc_id)
           AS version,
         LEAD(epoch) OVER (PARTITION BY host_num ORDER BY epoch, doc_id)
           AS valid_to
  FROM snaps
)
SELECT host_num,
       COUNT(*) AS n_versions,
       CAST(SUM(CASE WHEN valid_to IS NULL THEN 0
                     ELSE valid_to - epoch END) AS BIGINT)
         AS covered_seconds,
       CAST(MAX(epoch) AS BIGINT) AS current_from,
       CAST(SUM(version * (epoch % 86400)) AS BIGINT) AS order_chk
FROM v
GROUP BY 1
"""


@register("url_snapshot_scd2", _SCD2_ORACLE)
def url_snapshot_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD-type-2 validity windows over crawl snapshots: per host
    (the 97-host graph universe, so every host carries many versions),
    lead() closes each version's [valid_from, valid_to) interval (the
    crawl-history verb behind 'text as of time T' queries).  One
    host-keyed sort-window — at 10^12 rows this partitions by host
    hash with AQE absorbing hot hosts; the order checksum Σ
    version·(epoch mod 86400) pins the within-host ordering
    exactly, not just the interval sums."""
    from chopin_spark.tables import load

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_SCD2_ORACLE)


# --- content drift across crawl snapshots (SimHash Hamming deltas) -----------
#
# The crawl-maintenance question behind recrawl scheduling: how much
# does a host's content change between consecutive captures?  Chains
# the SCD2 snapshot ordering (above) with the 60-bit SimHash
# fingerprint (queries.textops): drift = popcount(fp_v XOR fp_v+1).
# Scale shape: fingerprinting is one token-hash groupBy; the chaining
# is one host-keyed lead() window — both partition by host hash at
# 10^12 rows, no global sort.  Dialect seam: XOR is `^` in Spark but
# `xor()` in DuckDB (`^` is power there); popcount is bit_count in both.

from chopin_spark.queries.textops import (  # noqa: E402
    _SIMHASH_FP,
    _SIMHASH_SUMS,
)
from chopin_spark.textops import token_hash60_duckdb  # noqa: E402

_DRIFT_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, UNNEST(string_split(text, ' ')) AS t FROM documents
),
h AS (SELECT doc_id, {token_hash60_duckdb('t')} AS h FROM tok),
sums AS (
  SELECT doc_id,
       {_SIMHASH_SUMS}
  FROM h GROUP BY 1
),
fp AS (SELECT doc_id, {_SIMHASH_FP} AS simhash FROM sums),
snaps AS (
  SELECT doc_id % 97 AS host_num,
         {epoch_sql('doc_id')} AS epoch,
         doc_id
  FROM documents
),
v AS (
  SELECT s.host_num, f.simhash,
         LEAD(f.simhash) OVER (PARTITION BY s.host_num
                               ORDER BY s.epoch, s.doc_id) AS next_fp
  FROM snaps s JOIN fp f ON s.doc_id = f.doc_id
),
d AS (
  SELECT host_num,
         CAST(bit_count(xor(simhash, next_fp)) AS BIGINT) AS ham
  FROM v WHERE next_fp IS NOT NULL
)
SELECT host_num,
       CAST(COUNT(*) AS BIGINT) AS n_transitions,
       CAST(SUM(ham) AS BIGINT) AS total_drift_bits,
       CAST(MAX(ham) AS BIGINT) AS max_drift_bits,
       CAST(SUM(CASE WHEN ham > 12 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_major_rewrites
FROM d GROUP BY 1
"""


@register("url_content_drift", _DRIFT_ORACLE)
def url_content_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host content drift between consecutive crawl captures:
    SimHash fingerprints chained by a host-keyed lead() window, drift =
    popcount of the XOR of neighbors (> 12/60 bits ≈ major rewrite)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from chopin_spark.tables import load
    from chopin_spark.textops import simhash

    docs = load(spark, sf_dir, "documents")
    fp = simhash(docs)
    snaps = docs.select(
        (F.col("doc_id") % 97).alias("host_num"),
        F.expr(epoch_sql("doc_id")).alias("epoch"),
        "doc_id",
    )
    w = Window.partitionBy("host_num").orderBy("epoch", "doc_id")
    v = (
        snaps.join(fp, "doc_id")
        .withColumn("next_fp", F.lead("simhash").over(w))
        .filter(F.col("next_fp").isNotNull())
        .withColumn(
            "ham",
            F.expr("CAST(bit_count(simhash ^ next_fp) AS BIGINT)"),
        )
    )
    return v.groupBy("host_num").agg(
        F.count(F.lit(1)).cast("long").alias("n_transitions"),
        F.sum("ham").cast("long").alias("total_drift_bits"),
        F.max("ham").cast("long").alias("max_drift_bits"),
        F.sum(F.when(F.col("ham") > 12, 1).otherwise(0))
        .cast("long")
        .alias("n_major_rewrites"),
    )


# --- recrawl scheduling tiers (change-frequency estimator) -------------------
#
# The decision layer on top of url_content_drift: hosts whose captures
# rewrite often get short recrawl intervals (the Cho & Garcia-Molina
# change-frequency policy, reduced to its integer-exact core: tier by
# the ratio of major-rewrite transitions, compared as cross-products
# so no division ever happens).  Consumes the drift rollup unchanged —
# pipeline composition, not recomputation.

_TIER_CASE = """CASE
  WHEN n_major_rewrites * 2 >= n_transitions THEN 'hourly'
  WHEN n_major_rewrites * 5 >= n_transitions THEN 'daily'
  WHEN n_major_rewrites * 20 >= n_transitions THEN 'weekly'
  ELSE 'monthly' END"""

_TIER_TAIL = f"""
SELECT {_TIER_CASE} AS tier,
       CAST(COUNT(*) AS BIGINT) AS n_hosts,
       CAST(SUM(n_transitions) AS BIGINT) AS transitions,
       CAST(SUM(n_major_rewrites) AS BIGINT) AS rewrites,
       CAST(SUM(host_num) AS BIGINT) AS host_set_sum
FROM drift
GROUP BY 1
"""

_RECRAWL_ORACLE = f"""
WITH drift AS ({_DRIFT_ORACLE})
{_TIER_TAIL}
"""


@register("recrawl_schedule_tiers", _RECRAWL_ORACLE)
def recrawl_schedule_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hosts bucketed into recrawl-frequency tiers by their major-
    rewrite ratio (integer cross-product compares — no division, no
    float).  host_set_sum pins WHICH hosts land in each tier, order-
    free.  One 4-key rollup on top of the drift plan."""
    url_content_drift(spark, sf_dir).createOrReplaceTempView("drift")
    return spark.sql(_TIER_TAIL)


# --- Count-Min heavy-hitter estimation ---------------------------------------
#
# The mergeable frequency sketch (Cormode & Muthukrishnan '05): d=4
# pairwise-independent hash rows x w=256 counters.  At stream scale the
# sketch is FIXED-SIZE state — every partition folds its tokens into
# its own 4x256 grid and grids merge by cell-wise SUM, so heavy-hitter
# estimation over 10^12 tokens shuffles 1024 counters per partition,
# never the token stream.  Estimates can only OVERcount (min over rows
# of a sum that includes the true count): the probe set includes an
# absent term whose estimate is pure collision mass, and the gate's
# hash match pins every counter in both engines.

_CM_P = 1_000_000_007
_CM_W = 256
_CM_HASHES = ((0, 1, 0), (1, 31, 17), (2, 977, 401), (3, 8191, 12345))
_CM_PROBES = ("table", "value", "a", "the", "spark", "zorro")


def _cm_sql(charfold, hashes: str, probes: str, toks: str) -> str:
    """One SQL text, three dialect seams (charfold builder, VALUES
    syntax, token explode) — the sketch arithmetic itself is common."""
    return f"""
WITH toks AS ({toks}),
tf AS (
  SELECT tok, {charfold('tok')} AS fold, COUNT(*) AS cnt FROM toks GROUP BY tok
),
sketch AS (
  SELECT hrow, (fold * ha + hb) % {_CM_P} % {_CM_W} AS hcol,
         CAST(SUM(cnt) AS BIGINT) AS c
  FROM tf CROSS JOIN {hashes}
  GROUP BY 1, 2
),
pr AS (
  SELECT term, hrow,
         ({charfold('term')} * ha + hb) % {_CM_P} % {_CM_W} AS hcol
  FROM {probes} CROSS JOIN {hashes}
),
est AS (
  SELECT term, MIN(s.c) AS est_count
  FROM pr JOIN sketch s USING (hrow, hcol) GROUP BY term
),
exact AS (
  SELECT tok AS term, CAST(SUM(cnt) AS BIGINT) AS exact_count
  FROM tf GROUP BY tok
)
SELECT e.term, e.est_count, COALESCE(x.exact_count, 0) AS exact_count,
       e.est_count - COALESCE(x.exact_count, 0) AS overestimate
FROM est e LEFT JOIN exact x USING (term)
"""


_CM_VALS = ", ".join(f"({r}, {a}, {b})" for r, a, b in _CM_HASHES)
_CM_PVALS = ", ".join(f"('{t}')" for t in _CM_PROBES)

_CM_ORACLE = _cm_sql(
    charfold_duckdb,
    f"(VALUES {_CM_VALS}) h(hrow, ha, hb)",
    f"(VALUES {_CM_PVALS}) p(term)",
    "SELECT UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents",
)


@register("countmin_heavy_hitters", _CM_ORACLE)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CM-sketch estimates vs exact counts for six probe terms (one
    absent — its estimate is pure collision mass, 934 at sf0.01)."""
    from chopin_spark.tables import load

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(
        _cm_sql(
            charfold_spark,
            f"VALUES {_CM_VALS} AS h(hrow, ha, hb)",
            f"VALUES {_CM_PVALS} AS p(term)",
            "SELECT explode(split(text, ' ')) AS tok FROM documents",
        )
    )


# --- grouped HLL: per-host sketch audited against exact ------------------------
#
# The production shape of a distinct-count sketch is GROUPED — one
# 64-register vector per key, merged associatively under the key's
# shuffle — and a sketch nobody audits is a number nobody should trust:
# every host row carries its exact distinct count and the relative
# error, so the m=64 error envelope (~1.04/√64 ≈ 13%) is checkable
# row by row.  Register fill uses a host × register frame (hosts·64
# rows — key-bounded metadata, never fact-sized).

_GH_HOST = "('h' || CAST((doc_id * 40503) % 97 AS STRING) || '.example.com')"


def _hll_host_sql(charfold, series: str) -> str:
    url = url_sql("doc_id")
    h1 = charfold("_u", 31)
    h2 = charfold("_u", 37)
    return f"""
WITH u AS (
  SELECT {_GH_HOST} AS host, {url} AS _u FROM documents
),
hashed AS (
  SELECT host, {h1} AS h1, {h2} AS h2 FROM u
),
regs AS (
  SELECT host, h1 % {_M} AS reg,
         MAX(CASE WHEN h2 = 0 THEN 31
                  ELSE 31 - LENGTH(BIN(h2)) END) AS m_j
  FROM hashed GROUP BY 1, 2
),
hosts AS (SELECT DISTINCT host FROM u),
frame AS (
  SELECT h.host, a.reg FROM hosts h CROSS JOIN ({series}) a
),
filled AS (
  SELECT f.host, f.reg, COALESCE(r.m_j, 0) AS m_j
  FROM frame f LEFT JOIN regs r ON r.host = f.host AND r.reg = f.reg
),
sk AS (
  SELECT host,
         SUM(POWER(2.0, -m_j)) AS sum_inv,
         SUM(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS n_zero
  FROM filled GROUP BY 1
),
ex AS (
  SELECT host, COUNT(DISTINCT _u) AS n_exact FROM u GROUP BY 1
)
SELECT sk.host,
       CAST(ex.n_exact AS BIGINT) AS n_exact,
       ROUND(CASE WHEN {_ALPHA_M} * {_M} * {_M} / sum_inv <= 2.5 * {_M}
                       AND n_zero > 0
                  THEN {_M} * LN(CAST({_M} AS DOUBLE) / n_zero)
                  ELSE {_ALPHA_M} * {_M} * {_M} / sum_inv END, 4)
         AS est,
       ROUND((CASE WHEN {_ALPHA_M} * {_M} * {_M} / sum_inv <= 2.5 * {_M}
                        AND n_zero > 0
                   THEN {_M} * LN(CAST({_M} AS DOUBLE) / n_zero)
                   ELSE {_ALPHA_M} * {_M} * {_M} / sum_inv END
              - ex.n_exact) / ex.n_exact, 4) AS rel_err
FROM sk JOIN ex ON ex.host = sk.host
"""


@register("hll_per_host_audit", _hll_host_sql(charfold_duckdb, _DDB_SERIES))
def hll_per_host_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host HLL distinct-URL estimate with its exact count and
    relative error — the grouped-sketch production shape, audited."""
    from chopin_spark.tables import load

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_hll_host_sql(charfold_spark, _SPK_SERIES))


# --- HLL set algebra: shared content between crawl epochs ----------------------
#
# The property that makes HLL the fleet-scale sketch is MERGEABILITY:
# register-wise MAX of two sketches IS the sketch of the union, so
# |A∩B| falls out by inclusion-exclusion (est_a + est_b − est_union)
# without ever co-shuffling the two item sets.  Item = 5-token shingle
# hash (the dedup family's unit), so the intersection measures CONTENT
# shared across the two crawl half-years — the sketch-algebra answer
# to "how much of epoch B is recrawled epoch A text" that the exact
# split_leakage_audit computes pair-by-pair.
#
# Scale shape: one shingle explode → (epoch, register) MAX agg (128
# rows of state); the union sketch is a register-keyed MAX over those
# 128 rows — sketch algebra on bytes, not data.  The exact distinct /
# exact intersection run alongside ONLY to report observed error (at
# production scale you'd drop them; they are the audit, not the op).
# Σ2^−m_j is a sum of dyadic rationals (order-independent in float64),
# LN gets the ROUND grain — the module's determinism contract.

_EPOCH_MID = 1704067200 + 15768000  # 2024-07-01ish: half the LCG year


def _hll_overlap_sql(series: str, toks: str) -> str:
    # integer-item rehash: register from the shingle hash itself
    # (polynomial fold, uniform low bits), rank from an independent
    # Lehmer step — both pure int64 ops, identical across engines
    h1 = "tok"
    h2 = "((tok * 48271) % 2147483647)"
    est = (
        f"CASE WHEN {_ALPHA_M} * {_M} * {_M} / sum_inv <= 2.5 * {_M}"
        f"          AND n_zero > 0"
        f"     THEN {_M} * LN(CAST({_M} AS DOUBLE) / n_zero)"
        f"     ELSE {_ALPHA_M} * {_M} * {_M} / sum_inv END"
    )
    return f"""
WITH t AS (
  SELECT CASE WHEN {epoch_sql('doc_id')} < {_EPOCH_MID}
              THEN 'a' ELSE 'b' END AS grp, tok
  FROM ({toks})
),
hashed AS (SELECT grp, {h1} AS h1, {h2} AS h2 FROM t),
regs AS (
  SELECT grp, h1 % {_M} AS reg,
         MAX(CASE WHEN h2 = 0 THEN 31
                  ELSE 31 - LENGTH(BIN(h2)) END) AS m_j
  FROM hashed GROUP BY 1, 2
),
allregs AS (
  SELECT 'a' AS grp, reg FROM ({series})
  UNION ALL SELECT 'b' AS grp, reg FROM ({series})
  UNION ALL SELECT 'u' AS grp, reg FROM ({series})
),
merged AS (
  SELECT grp, reg, m_j FROM regs
  UNION ALL
  SELECT 'u' AS grp, reg, MAX(m_j) AS m_j FROM regs GROUP BY 2
),
filled AS (
  SELECT a.grp, a.reg, COALESCE(MAX(m.m_j), 0) AS m_j
  FROM allregs a LEFT JOIN merged m ON m.grp = a.grp AND m.reg = a.reg
  GROUP BY 1, 2
),
sk AS (
  SELECT grp,
         SUM(POWER(2.0, -m_j)) AS sum_inv,
         SUM(CASE WHEN m_j = 0 THEN 1 ELSE 0 END) AS n_zero
  FROM filled GROUP BY 1
),
ests AS (SELECT grp, {est} AS est FROM sk),
wide AS (
  SELECT MAX(CASE WHEN grp = 'a' THEN est END) AS est_a,
         MAX(CASE WHEN grp = 'b' THEN est END) AS est_b,
         MAX(CASE WHEN grp = 'u' THEN est END) AS est_u
  FROM ests
),
ex AS (
  SELECT CAST(COUNT(CASE WHEN has_a = 1 THEN 1 END) AS BIGINT) AS exact_a,
         CAST(COUNT(CASE WHEN has_b = 1 THEN 1 END) AS BIGINT) AS exact_b,
         CAST(COUNT(CASE WHEN has_a = 1 AND has_b = 1 THEN 1 END)
              AS BIGINT) AS exact_i
  FROM (
    SELECT tok,
           MAX(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS has_a,
           MAX(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS has_b
    FROM t GROUP BY tok
  )
)
SELECT ROUND(est_a, 4) AS est_a,
       ROUND(est_b, 4) AS est_b,
       ROUND(est_u, 4) AS est_union,
       ROUND(est_a + est_b - est_u, 4) AS est_intersect,
       exact_a, exact_b, exact_i AS exact_intersect,
       ROUND((est_a + est_b - est_u - exact_i)
             / CAST(exact_i AS DOUBLE), 4) AS intersect_rel_err
FROM wide CROSS JOIN ex
"""


from chopin_spark.textops import (  # noqa: E402
    shingles_from_uh_duckdb,
    shingles_from_uh_spark,
    token_hashes_duckdb,
    token_hashes_spark,
)

_OV_TOKS_DUCK = f"""
  SELECT doc_id, UNNEST({shingles_from_uh_duckdb(5)}) AS tok
  FROM (SELECT doc_id, {token_hashes_duckdb()} AS _uh FROM documents)
"""
# token-hash array stays its OWN projection (the no-HOF-inlining rule,
# textops.token_hashes_spark docstring) — explode from a subquery
_OV_TOKS_SPARK = f"""
  SELECT doc_id, explode({shingles_from_uh_spark(5)}) AS tok
  FROM (SELECT doc_id, {token_hashes_spark()} AS _uh FROM documents)
"""


@register(
    "hll_epoch_overlap",
    _hll_overlap_sql(_DDB_SERIES, _OV_TOKS_DUCK),
)
def hll_epoch_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared-content estimate between the two crawl half-years by HLL
    set algebra over 5-token shingle hashes: per-epoch sketches,
    register-MAX merge for the union, inclusion-exclusion for the
    intersection — audited against the exact counts."""
    from chopin_spark.tables import load

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_hll_overlap_sql(_SPK_SERIES, _OV_TOKS_SPARK))


# --- KMV (bottom-k) distinct sketch with direct intersection ------------------
#
# The k-minimum-values sketch (Bar-Yossef et al. 2002; Beyer et al.
# SIGMOD 2007) beside the HLL family: keep the k smallest DISTINCT
# hash values; D-hat = (k-1)*M/h_(k).  Unlike HLL's
# inclusion-exclusion, KMV estimates the intersection DIRECTLY: the
# union's bottom-k is a uniform sample of the union, so
# |A ∩ B|-hat = (matches in bottom-k(U)) / k * D-hat(U) — the
# mergeable-sample property that makes bottom-k the right sketch for
# multi-way overlap audits at crawl scale (sketch size k, merge =
# union + re-truncate, all associative).
#
# Determinism: hashes and kth-order statistics are exact int64 (the
# rehash is an independent Lehmer step from the same shingle hash the
# HLL sketch reuses); the only doubles are final correctly-rounded
# ratios under ROUND(4).  Degenerate n_distinct < k falls back to the
# exact count (the sketch IS the set).  Scale: one DISTINCT + one
# bounded window per group — the window input is already unique hash
# values, and a k-th order statistic over 2^31 uniform values touches
# ~k rows per partition after the per-partition bottom-k combine.

_KMV_K = 64
_KMV_M = 2147483647


def _kmv_sql(toks: str) -> str:
    rehash = "((tok * 1103515245 + 12345) % 2147483647)"
    est = (
        f"CASE WHEN kk < {_KMV_K} THEN CAST(kk AS DOUBLE)"
        f"     ELSE CAST({_KMV_K} - 1 AS DOUBLE) * {_KMV_M} / hk END"
    )
    return f"""
WITH t AS (
  SELECT CASE WHEN {epoch_sql('doc_id')} < {_EPOCH_MID}
              THEN 'a' ELSE 'b' END AS grp, tok
  FROM ({toks})
),
dh AS (SELECT DISTINCT grp, {rehash} AS h FROM t),
rk AS (
  SELECT grp, h,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY h) AS rn
  FROM dh
),
kth AS (
  SELECT grp, CAST(MAX(h) AS BIGINT) AS hk,
         CAST(COUNT(*) AS BIGINT) AS kk
  FROM rk WHERE rn <= {_KMV_K} GROUP BY 1
),
-- union bottom-k ⊆ union of the per-group bottom-ks (each group's k
-- smallest already contains every union candidate), so the global
-- ORDER BY window runs over <= 2k rows — metadata-sized, not the
-- distinct-hash universe
du AS (SELECT DISTINCT h FROM rk WHERE rn <= {_KMV_K}),
rku AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM du),
kthu AS (
  SELECT CAST(MAX(h) AS BIGINT) AS hk, CAST(COUNT(*) AS BIGINT) AS kk
  FROM rku WHERE rn <= {_KMV_K}
),
bk AS (SELECT h FROM rku WHERE rn <= {_KMV_K}),
matches AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_both
  FROM bk
  JOIN (SELECT h FROM dh WHERE grp = 'a') a ON a.h = bk.h
  JOIN (SELECT h FROM dh WHERE grp = 'b') b ON b.h = bk.h
),
ests AS (
  SELECT MAX(CASE WHEN grp = 'a' THEN {est} END) AS est_a,
         MAX(CASE WHEN grp = 'b' THEN {est} END) AS est_b
  FROM kth
),
estu AS (SELECT {est} AS est_u FROM kthu),
ex AS (
  SELECT CAST(COUNT(CASE WHEN has_a = 1 AND has_b = 1 THEN 1 END)
              AS BIGINT) AS exact_i
  FROM (
    SELECT tok,
           MAX(CASE WHEN grp = 'a' THEN 1 ELSE 0 END) AS has_a,
           MAX(CASE WHEN grp = 'b' THEN 1 ELSE 0 END) AS has_b
    FROM t GROUP BY tok
  ) q
)
SELECT ROUND(est_a, 4) AS est_a,
       ROUND(est_b, 4) AS est_b,
       ROUND(est_u, 4) AS est_union,
       n_both,
       ROUND(CAST(n_both AS DOUBLE) / {_KMV_K} * est_u, 4)
         AS est_intersect,
       exact_i AS exact_intersect,
       ROUND((CAST(n_both AS DOUBLE) / {_KMV_K} * est_u - exact_i)
             / CAST(exact_i AS DOUBLE), 4) AS intersect_rel_err
FROM ests CROSS JOIN estu CROSS JOIN matches CROSS JOIN ex
"""


@register("kmv_epoch_intersect", _kmv_sql(_OV_TOKS_DUCK))
def kmv_epoch_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k (KMV) distinct sketches per crawl epoch with the
    direct union-sample intersection estimator, audited against the
    exact overlap — the mergeable-sample counterpart to
    hll_epoch_overlap's register sketch."""
    from chopin_spark.tables import load

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_kmv_sql(_OV_TOKS_SPARK))


# --- AMS F2 sketch (self-join size / skew estimator) ---------------------------
#
# Alon–Matias–Szegedy second frequency moment (STOC'96): F2 = Σ_h f_h²
# is exactly the row count of the self-equi-join on the key — THE
# number a planner needs to decide whether a join key is skewed enough
# to salt (docs/SCALE.md salting rule).  The sketch estimates it in
# one streaming pass with O(1) state per sketch row: Z_i = Σ_x ξ_i(x)
# over the stream, E[Z_i²] = F2; variance drops by averaging 4 rows
# and a median-of-3 groups kills outliers.  Exact F2 needs a full
# groupBy per key — at 100 TB the sketch is 12 integers per executor
# merged by plain SUM (algebraic agg, map-side combinable), no key
# shuffle at all.
#
# Deterministic fixture discipline: the key is a ZIPF-LIKE synthetic
# host (⌊97/(u+1)⌋, u = doc_id mod 97 — the head key carries half the
# mass, exactly the shape a salting decision is about; a near-uniform
# key makes F2 ≈ n²/k and the probe pointless).  ξ_i(h) = ±1 from the
# parity of a CUBED affine hash (((h·A_i + B_i) mod 9973)³ mod 9973) —
# a plain affine parity is too equidistributed over a small key range
# (measured: every |Σξ| ≤ 3, collapsing Z for uniform-ish tails); the
# cubic residue breaks the linearity (measured rel_err ≈ −11%, a
# credible single-sketch draw).  Exact int64 carriers end-to-end
# (s³ ≤ 9973³ ≈ 9.9e11; |Z| ≤ n, Z² ≤ n² — headroom to n ≈ 3e9, past
# which the group means move to DOUBLE).  The median-of-3 is the
# closed form a+b+c − max − min.  Estimate quality is data, not a
# guarantee: the query reports exact F2, the estimate, and the signed
# relative error; the oracle replays every step.

_AMS_COEFS = [
    (131, 7), (137, 11), (139, 13), (149, 17),
    (151, 19), (157, 23), (163, 29), (167, 31),
    (173, 37), (179, 41), (181, 43), (191, 47),
]

_AMS_HOST = "CAST(FLOOR(97.0 / ((doc_id % 97) + 1)) AS BIGINT)"


def _ams_sign(a: int, b: int) -> str:
    s = f"((({_AMS_HOST}) * {a} + {b}) % 9973)"
    return f"(CASE WHEN {s} * {s} * {s} % 9973 % 2 = 0 THEN 1 ELSE -1 END)"


_AMS_Z = ",\n         ".join(
    f"CAST(SUM({_ams_sign(a, b)}) AS BIGINT) AS z{i}"
    for i, (a, b) in enumerate(_AMS_COEFS)
)

_AMS_GROUPS = [
    # CAST, not a /4.0 literal: Spark types exact-numeric literals as
    # DECIMAL and the division would come back decimal(31,6), not the
    # DOUBLE DuckDB produces
    "(" + " + ".join(f"z{i} * z{i}" for i in range(g * 4, g * 4 + 4))
    + ") / CAST(4 AS DOUBLE)"
    for g in range(3)
]

_AMS_SQL = f"""
WITH z AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
         {_AMS_Z}
  FROM documents
),
exact AS (
  SELECT CAST(SUM(f * f) AS BIGINT) AS f2
  FROM (SELECT CAST(COUNT(*) AS BIGINT) AS f
        FROM documents GROUP BY {_AMS_HOST}) t
),
est AS (
  SELECT n_docs,
         {_AMS_GROUPS[0]} AS g0,
         {_AMS_GROUPS[1]} AS g1,
         {_AMS_GROUPS[2]} AS g2
  FROM z
)
SELECT e.n_docs,
       x.f2 AS exact_f2,
       e.g0 + e.g1 + e.g2
         - GREATEST(e.g0, e.g1, e.g2)
         - LEAST(e.g0, e.g1, e.g2) AS est_f2,
       ROUND((e.g0 + e.g1 + e.g2
                - GREATEST(e.g0, e.g1, e.g2)
                - LEAST(e.g0, e.g1, e.g2)) / x.f2 - 1.0, 6)
         AS rel_err
FROM est e CROSS JOIN exact x
"""


@register("ams_f2_host_skew", _AMS_SQL)
def ams_f2_host_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS F2 sketch of the host frequency vector (12 ±1 sign rows,
    median of 3 means-of-4) next to the exact self-join size Σf² —
    the one-pass skew probe a salting planner runs before a key join."""
    from chopin_spark.tables import load

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_AMS_SQL)


# --- KLL-style mergeable quantile sketch ---------------------------------------
#
# The quantile member of the sketch family (HLL distinct, Count-Min
# frequency, Bloom membership, KMV intersection, AMS F2): a two-level
# compactor in the Karnin–Lang–Liberty mold.  Each of 8 hash groups
# ("executors") sorts its items and keeps the even ranks at weight 2
# (level-1 compaction = the per-partition partial state); the merged
# survivors compact once more to weight 4 (the combiner).  Quantiles
# read off the cumulative-weight profile.
#
# Determinism over unbiasedness, stated honestly: real KLL picks the
# odd/even offset per compaction with a random bit so rank error is
# zero-mean; the repo's reproducibility discipline pins the offset,
# which biases each estimate ≤1 rank per compaction level — and the
# query REPORTS the realized rank error next to the exact quantile, so
# the bias is data, not a hidden claim.
#
# Scale shape: per-group state after level-1 is n/(2·groups) rows and
# only survivors shuffle; at 100 TB the same two levels run as
# partial-sort-per-partition + one merge of Σ survivors (add levels as
# log(n) grows — each level halves rows and doubles weight, the
# standard KLL ladder).

_KLL_QS = [(i + 1) / 10.0 for i in range(9)]

_KLL_BODY = f"""
v AS (
  SELECT n_chars AS x, doc_id FROM documents
),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM v),
g AS (
  SELECT x, doc_id,
         ROW_NUMBER() OVER (PARTITION BY doc_id % 8
                            ORDER BY x, doc_id) AS r
  FROM v
),
l1 AS (
  SELECT x, doc_id FROM g WHERE r % 2 = 0
),
m AS (
  SELECT x, ROW_NUMBER() OVER (ORDER BY x, doc_id) AS r2
  FROM l1
),
l2 AS (
  SELECT x, CAST(4 AS BIGINT) AS w FROM m WHERE r2 % 2 = 0
),
prof AS (
  SELECT x,
         SUM(w) OVER (ORDER BY x
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cw,
         SUM(w) OVER () AS tw
  FROM l2
),
qs AS (
  {" UNION ALL ".join(f"SELECT CAST({q!r} AS DOUBLE) AS q" for q in _KLL_QS)}
),
est AS (
  SELECT qs.q, MIN(prof.x) AS est_x
  FROM qs JOIN prof ON CAST(prof.cw AS DOUBLE) >= qs.q * prof.tw
  GROUP BY qs.q
),
exact AS (
  SELECT qs.q, MIN(t.x) AS exact_x
  FROM qs JOIN (
    SELECT x, ROW_NUMBER() OVER (ORDER BY x, doc_id) AS rk FROM v
  ) t ON t.rk >= CAST(CEIL(qs.q * (SELECT n FROM n)) AS BIGINT)
  GROUP BY qs.q
)
SELECT e.q, e.est_x, x.exact_x,
       ROUND(ABS(CAST((SELECT COUNT(*) FROM v WHERE v.x <= e.est_x)
                      AS DOUBLE) / (SELECT n FROM n) - e.q), 6)
         AS rank_err
FROM est e JOIN exact x ON x.q = e.q
ORDER BY e.q
"""


@register("kll_quantile_sketch", f"WITH {_KLL_BODY.strip()}")
def kll_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic two-level KLL-style compactor over document
    lengths: sketch quantiles at q = 0.1..0.9 next to the exact order
    statistics and the realized rank error."""
    from chopin_spark.tables import load

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(f"WITH {_KLL_BODY.strip()}")
