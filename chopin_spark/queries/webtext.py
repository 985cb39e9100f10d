"""Web-corpus maintenance queries over the Common-Crawl-style page
shape (north-rule input_hint: url / warc_ts / text / lang).

The parquet `documents` table carries no URL column, so both engines
derive the deterministic URL and crawl timestamp from ``doc_id`` with
the same LCG recipe as :mod:`chopin_spark.pages.synth_pages` — the
derivation is part of the query text on BOTH sides, keeping the oracle
hash bit-exact.

Two pipeline staples a 100 TB crawl store runs constantly:

* ``url_host_tld_rollup`` — parse URLs back into host / ccTLD and roll
  up.  Engine side uses Spark's real ``parse_url`` (JVM, codegen);
  the oracle re-derives the host with a regexp — two independent
  parsers agreeing on every row.
* ``host_latest_snapshot`` — keep the newest snapshot per host.  The
  canonical formulation is a row_number window (full sort of every
  group); here it is a plain MAX over a packed ``epoch*10^7 + doc_id``
  ordinal, which partial-aggregates map-side (argmax without a window
  — at 10^12 rows this is one combiner-friendly shuffle instead of a
  sort, and the tie-break on doc_id is explicit in the ordinal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark.pages import CCTLDS, cctld_sql, epoch_sql, host_sql, url_sql
from chopin_spark.queries import register
from chopin_spark.tables import load

# deterministic URL parts from doc_id — SHARED builders (pages.py), so
# the recipe cannot drift from synth_pages or the pagespipe queries
_CCTLD = cctld_sql("doc_id")
_HOST = host_sql("doc_id")
_URL = url_sql("doc_id")
_EPOCH = epoch_sql("doc_id")

_TLD_ORACLE = f"""
SELECT regexp_extract(host, '([a-z]+)$', 1) AS tld,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT host) AS n_hosts,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM (
  SELECT regexp_extract({_URL}, '^https?://([^/]+)', 1) AS host, n_chars
  FROM documents
)
GROUP BY 1
"""


@register("url_host_tld_rollup", _TLD_ORACLE)
def url_host_tld_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse page URLs (real ``parse_url``, JVM-side) into host + ccTLD
    and aggregate per TLD.  The oracle parses the same URLs with a
    regexp instead — a hash match means two independent URL parsers
    agree row-for-row.  Scale shape: derive → parse → one partial+final
    agg on a 20-value key; zero Python, zero extra shuffles."""
    docs = load(spark, sf_dir, "documents").selectExpr(
        f"parse_url({_URL}, 'HOST') AS host", "n_chars"
    )
    return (
        docs.select(
            F.element_at(F.split("host", r"\."), -1).alias("tld"),
            "host",
            "n_chars",
        )
        .groupBy("tld")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("host").alias("n_hosts"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


# snapshot dedup uses a small host universe (mod 97, TLD derived from
# the host number) so hosts really do carry many snapshots
# (~n_docs/97 each) — the interesting case
_CCTLD_OF_HOSTNUM = (
    "CASE ((doc_id * 69069) % 97) % " + str(len(CCTLDS))
    + "".join(f" WHEN {i} THEN '{c}'" for i, c in enumerate(CCTLDS))
    + " END"
)
_HOST_SMALL = (
    f"('h' || CAST((doc_id * 69069) % 97 AS STRING)"
    f" || '.example.' || {_CCTLD_OF_HOSTNUM})"
)

_SNAP_ORACLE = f"""
SELECT host,
       COUNT(*) AS n_snapshots,
       CAST(MAX(ord) % 10000000 AS BIGINT) AS latest_doc_id,
       CAST(MAX(ord) // 10000000 AS BIGINT) AS latest_epoch
FROM (
  SELECT {_HOST_SMALL} AS host,
         {_EPOCH} * 10000000 + doc_id AS ord
  FROM documents
)
GROUP BY host
"""


@register("host_latest_snapshot", _SNAP_ORACLE)
def host_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-snapshot-per-host dedup via a packed argmax ordinal.

    ``ord = epoch*10^7 + doc_id`` makes (timestamp, doc_id) one BIGINT
    whose MAX partial-aggregates map-side — the scale replacement for
    the usual row_number()-over-window formulation, which cannot
    combine before the shuffle and sorts every host group.  Decode is
    INTEGER div/mod in the projection (``DIV``, not ``/``: ord ≈
    1.7e16 exceeds 2^53, so a double division can round the quotient
    across the floor boundary when doc_id is near 0 or the base).
    Pack-width precondition: doc_id < 10^7; for a wider id domain use
    ``max_by(struct(epoch, doc_id))``, which combines map-side the
    same way without the int64 width limit."""
    docs = load(spark, sf_dir, "documents").selectExpr(
        f"{_HOST_SMALL} AS host",
        f"{_EPOCH} * 10000000 + doc_id AS ord",
    )
    return docs.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_snapshots"),
        (F.max("ord") % F.lit(10000000)).cast("bigint").alias("latest_doc_id"),
        F.expr("CAST(MAX(ord) DIV 10000000 AS BIGINT)").alias("latest_epoch"),
    )


# --- URL canonicalization dedup ----------------------------------------------
#
# The crawl-store staple: the same page arrives under many URL spellings
# (tracking params, fragments, case-shifted scheme/host, trailing
# slash).  The messy variants are derived deterministically from doc_id
# over a SHARED canonical id (doc_id % 200 → real collisions), then
# normalized back: strip fragment, strip utm_*/fbclid params (keeping
# legitimate params), trim dangling separators and trailing slash,
# lowercase scheme+host.  Regexes avoid backslashes entirely (character
# classes only) so Java and RE2 parse them identically — the
# pii_scrub_stats dialect rule.

_CANON = "(doc_id % 200)"
_C_HOST = host_sql(_CANON)

_MESSY = f"""(
  CASE WHEN doc_id % 5 = 0 THEN 'HTTPS://' || UPPER({_C_HOST})
       ELSE 'https://' || {_C_HOST} END
  || '/p/' || CAST({_CANON} AS STRING)
  || CASE WHEN doc_id % 7 = 0 THEN '/' ELSE '' END
  || CASE
       WHEN doc_id % 6 = 0 AND doc_id % 3 = 0
         THEN '?page=' || CAST(doc_id % 9 AS STRING)
              || '&utm_source=feed&utm_medium=rss'
       WHEN doc_id % 6 = 0 THEN '?page=' || CAST(doc_id % 9 AS STRING)
       WHEN doc_id % 3 = 0 THEN '?utm_source=feed&utm_medium=rss'
       ELSE '' END
  || CASE WHEN doc_id % 4 = 0 THEN '#section-2' ELSE '' END
)"""

# normalization chain — built per engine: Spark regexp_replace is
# global, DuckDB's replaces only the FIRST match unless given the 'g'
# flag (the utm-strip must remove utm_source AND utm_medium)


def _urlnorm_sql(g: str) -> str:
    n1 = f"regexp_replace({_MESSY}, '[#].*', ''{g})"  # drop fragment
    n2 = f"regexp_replace({n1}, '(utm_[a-z]+|fbclid)=[^&]*[&]?', ''{g})"
    n3 = f"regexp_replace({n2}, '[?&]+$', ''{g})"  # dangling ? / &
    n4 = f"regexp_replace({n3}, '/[?]', '?'{g})"  # slash before query
    norm = (
        f"('https://' || LOWER(regexp_extract({n4},"
        f" '^[a-zA-Z]+://([^/?#]+)', 1))"
        f" || regexp_replace(regexp_extract({n4},"
        f" '^[a-zA-Z]+://[^/?#]+(.*)$', 1), '/$', ''{g}))"
    )
    return f"""
SELECT {norm} AS norm_url,
       COUNT(*) AS n_variants,
       COUNT(DISTINCT {_MESSY}) AS n_spellings,
       MIN(doc_id) AS canonical_doc
FROM documents
GROUP BY 1
"""


_URLNORM_SQL = _urlnorm_sql(", 'g'")
_URLNORM_SPARK = _urlnorm_sql("")


# --- URL template mining (crawler-trap / faceted-nav detection) ---------------
#
# Crawl frontiers drown in URL FAMILIES (page=1..10^6, session ids,
# calendar traps), not URLs: normalizing every digit run to {n} folds
# a family to one template, and a template with huge instance counts
# but few distinct pages is a trap.  Same messy-URL fixture and
# dialect rule as url_normalize_dedup (Spark regexp_replace is global,
# DuckDB needs 'g'); host is kept verbatim (templates are per-host
# signals) while path+query digits fold.

def _urltmpl_sql(g: str) -> str:
    host = f"LOWER(regexp_extract({_MESSY}, '^[a-zA-Z]+://([^/?#]+)', 1))"
    rest = f"regexp_extract({_MESSY}, '^[a-zA-Z]+://[^/?#]+(.*)$', 1)"
    tmpl = (
        f"({host} || regexp_replace({rest},"
        f" '[0-9]+', '(n)'{g}))"
    )
    return f"""
SELECT {tmpl} AS template,
       COUNT(*) AS n_fetches,
       COUNT(DISTINCT {_MESSY}) AS n_urls,
       MIN(doc_id) AS first_doc
FROM documents
GROUP BY 1
"""


@register("url_template_mining", _urltmpl_sql(", 'g'"))
def url_template_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-family rollup: digit runs in path+query fold to (n), hosts
    stay verbatim — fetch count vs distinct-URL count per template is
    the crawler-trap signal."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_urltmpl_sql(""))



@register("url_normalize_dedup", _URLNORM_SQL)
def url_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + dedup: normalize tracking-param/fragment/
    case/slash variants to one canonical URL, then one shuffle on the
    normalized key (n_variants, distinct raw spellings, min-doc
    survivor).  Map-side regex chain — fuses into the scan at 10^12
    rows; legitimate params (page=) survive normalization, tracking
    params (utm_*, fbclid) do not."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_URLNORM_SPARK)


# --- host blocklist filter (broadcast anti-join) ------------------------------

# blocked hosts: hash of the host's numeric id (dimension-sized set)
_BLOCK = "((((doc_id * 69069) % 99991) * 2654435761) % 13) = 0"

_BLOCKLIST_SQL = f"""
WITH pages AS (
  SELECT doc_id, {_HOST} AS host, {_CCTLD} AS tld, n_chars FROM documents
),
blocked AS (SELECT DISTINCT host FROM pages WHERE {_BLOCK})
SELECT tld,
       COUNT(*) AS n_docs,
       COUNT(DISTINCT host) AS n_hosts,
       CAST(SUM(n_chars) AS BIGINT) AS sum_chars
FROM pages
WHERE host NOT IN (SELECT host FROM blocked)
GROUP BY 1
"""


@register("host_blocklist_filter", _BLOCKLIST_SQL)
def host_blocklist_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-blocklist filtering: anti-join the pages against a
    blocked-host dimension (here derived by hash; in production a real
    denylist table), then roll up survivors per TLD.  The blocklist is
    dimension-sized → broadcast anti-join (BroadcastHashJoin LeftAnti),
    zero fact shuffle before the final rollup."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    pages = spark.sql(
        f"SELECT doc_id, {_HOST} AS host, {_CCTLD} AS tld, n_chars"
        " FROM documents"
    )
    blocked = spark.sql(
        f"SELECT DISTINCT {_HOST} AS host FROM documents WHERE {_BLOCK}"
    )
    return (
        pages.join(F.broadcast(blocked), "host", "left_anti")
        .groupBy("tld")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("host").alias("n_hosts"),
            F.sum("n_chars").cast("bigint").alias("sum_chars"),
        )
    )


# --- HTML → text extraction with byte-identity proof -------------------------
#
# The north-rule invariant: "byte-identical extracted text per url
# preserved through every stage".  The page html is built from the text
# (same SQL both engines), the extraction strips the markup back off,
# and the output carries md5(extracted) PLUS the identity flag — the
# driver's value hash then pins the extraction stage byte-for-byte on
# every row.

_HTML_EXTRACT_SQL = """
WITH page AS (
  SELECT doc_id,
         text,
         '<html><body>' || text || '</body></html>' AS html
  FROM documents
),
ex AS (
  SELECT doc_id, text,
         regexp_extract(html, '(?s)<body>(.*)</body>', 1) AS extracted
  FROM page
)
SELECT doc_id,
       md5(extracted) AS extracted_md5,
       CAST(extracted = text AS INT) AS byte_identical,
       length(extracted) AS n_chars
FROM ex
"""


@register("html_extract_text", _HTML_EXTRACT_SQL)
def html_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML→text extraction stage with the north-rule byte-identity
    invariant as a VALUE check: per document, the md5 of the extracted
    text and an extracted==original flag (1 on every row — any
    extraction bug flips the hash).  Map-only regex; fuses into the
    scan at 10^12 pages."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_HTML_EXTRACT_SQL)


# --- host link-graph PageRank (integer-exact power iteration) ----------------
#
# Links are synthesized deterministically over the 97-host universe
# (every doc contributes one src→dst edge from two independent LCG
# draws of its id; self-loops dropped).  Rank iterates in integer
# micro-units — components.pagerank_int — and the oracle replays the
# identical recurrence as unrolled CTEs, so all three rounds are
# value-hash-exact.

_PR_ITERS = 3
_PR_BASE = 150000  # 1e6 · (1 − 0.85)

_PR_EDGES = """(
  SELECT (doc_id * 69069) % 97 AS src,
         (doc_id * 48271) % 97 AS dst
  FROM documents
  WHERE (doc_id * 69069) % 97 <> (doc_id * 48271) % 97
)"""


def _pr_oracle() -> str:
    ctes = [
        f"e AS (SELECT * FROM {_PR_EDGES})",
        """n AS (SELECT DISTINCT node FROM
             (SELECT src AS node FROM e UNION ALL SELECT dst FROM e))""",
        "deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1)",
        "r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM n)",
    ]
    for it in range(1, _PR_ITERS + 1):
        ctes.append(f"""
c{it} AS (
  SELECT e.dst AS node, SUM(r.rank // deg.deg) AS inb
  FROM e
  JOIN r{it - 1} r ON r.node = e.src
  JOIN deg ON deg.src = e.src
  GROUP BY 1
),
r{it} AS (
  SELECT n.node,
         {_PR_BASE} + CAST(FLOOR(0.85 * COALESCE(c{it}.inb, 0) + 0.5)
                           AS BIGINT) AS rank
  FROM n LEFT JOIN c{it} ON c{it}.node = n.node
)""".strip())
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node AS host_num, rank AS rank_micro FROM r{_PR_ITERS}"
    )


@register("host_pagerank", _pr_oracle())
def host_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the host link graph, integer-exact (3 damped
    power iterations in micro-rank units — components.pagerank_int).
    The canonical web-graph centrality a crawl store computes for
    quality weighting; every iteration is one rank⋈edges join + one
    dst-keyed partial+final sum, the shape that holds at 10^9 hosts."""
    from chopin_spark.components import pagerank_int

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    edges = spark.sql(f"SELECT * FROM {_PR_EDGES}")
    return pagerank_int(edges, iters=_PR_ITERS).select(
        F.col("node").alias("host_num"), F.col("rank").alias("rank_micro")
    )


# --- triangle counting on the host link graph --------------------------------
#
# The third classic distributed graph kernel next to the CC and
# PageRank rounds above: per-host triangle counts on the simple
# undirected host graph.  Degree-ordered orientation (orient each edge
# toward the higher-(degree, id) endpoint) makes the wedge join's
# fan-out O(m^1.5) worst-case instead of O(Σ deg²) — hub hosts, the
# skew case at crawl scale, stop generating wedges as soon as they
# outrank their neighbors.  Each triangle is counted exactly once as
# (u→v, v→w, u→w); the whole kernel is three equi-joins + one agg,
# dialect-neutral SQL shared verbatim by both engines.
#
# The PageRank edge rule cannot be reused here: its dst is a fixed
# linear function of src mod 97 (a functional graph — cycles only,
# ZERO triangles by construction).  The triangle kernel draws its two
# endpoints from independent digits of doc_id instead.

_TRI_SRC = "(doc_id * 69069) % 97"
_TRI_DST = "((CAST(FLOOR(doc_id / 97.0) AS BIGINT) * 48271) + doc_id) % 97"

_TRI_SQL = f"""
WITH und AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM (
    SELECT {_TRI_SRC} AS src, {_TRI_DST} AS dst
    FROM documents WHERE {_TRI_SRC} <> {_TRI_DST}
  ) raw
),
deg AS (
  SELECT node, COUNT(*) AS d
  FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und) n
  GROUP BY node
),
ore AS (
  SELECT CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND u < v)
              THEN u ELSE v END AS s,
         CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND u < v)
              THEN v ELSE u END AS t
  FROM und
  JOIN deg d1 ON d1.node = u
  JOIN deg d2 ON d2.node = v
),
tri AS (
  SELECT e1.s AS x, e1.t AS y, e2.t AS z
  FROM ore e1
  JOIN ore e2 ON e2.s = e1.t
  JOIN ore e3 ON e3.s = e1.s AND e3.t = e2.t
),
pn AS (
  SELECT x AS node FROM tri
  UNION ALL SELECT y AS node FROM tri
  UNION ALL SELECT z AS node FROM tri
)
SELECT node AS host_id, COUNT(*) AS tri_cnt
FROM pn GROUP BY node
"""


_TRI_ORE_SQL = _TRI_SQL[: _TRI_SQL.index("tri AS (")].rstrip().rstrip(",") + "\nSELECT s, t FROM ore"

_TRI_FINISH_SQL = (
    "WITH " + _TRI_SQL[_TRI_SQL.index("tri AS (") :].replace("ore e1", "ore_m e1")
    .replace("ore e2", "ore_m e2")
    .replace("ore e3", "ore_m e3")
)


@register("host_triangle_counts", _TRI_SQL)
def host_triangle_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host triangle counts via degree-ordered wedge joins — each
    triangle found exactly once, hub-skew bounded by the orientation.
    The oriented edge list materializes ONCE (localCheckpoint — it is
    host-dimension-sized) before the three-way join; Spark inlines
    CTEs, so running _TRI_SQL directly would recompute the distinct
    edge shuffle for every one of the seven references.  The oracle
    runs the single shared _TRI_SQL text (DuckDB materializes CTEs)."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    ore = spark.sql(_TRI_ORE_SQL).localCheckpoint()
    ore.createOrReplaceTempView("ore_m")
    return spark.sql(_TRI_FINISH_SQL)


# --- robots.txt-style longest-prefix path rules --------------------------------

# deterministic path segments under each host (the /p/<id> leaf keeps
# the shared url recipe untouched): section a in 0..6, topic b in 0..12
_SEG_A = "CAST((doc_id * 7919) % 7 AS BIGINT)"
_SEG_B = "CAST((doc_id * 104729) % 13 AS BIGINT)"

# (prefix, decision) — longest matching prefix wins, default allow;
# depth-2 rules override their depth-1 parent ('/s0/t5' re-allows
# inside denied '/s0', '/s4/t11' inside denied '/s4')
_RULES = (
    ("/s0", "deny"), ("/s0/t5", "allow"),
    ("/s1", "deny"),
    ("/s2/t3", "deny"),
    ("/s4", "deny"), ("/s4/t11", "allow"),
    ("/s5/t7", "deny"),
)

_RULES_VALUES = ", ".join(f"('{p}', '{d}')" for p, d in _RULES)

_ROBOTS_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, lang, n_chars,
         '/s' || {_SEG_A} AS pre1,
         '/s' || {_SEG_A} || '/t' || {_SEG_B} AS pre2
  FROM documents
),
rules(prefix, decision) AS (VALUES {_RULES_VALUES}),
cand AS (
  SELECT doc_id, UNNEST([pre1, pre2]) AS prefix FROM docs
),
matched AS (
  SELECT c.doc_id,
         ARG_MAX(r.decision, LENGTH(r.prefix)) AS decision
  FROM cand c JOIN rules r ON c.prefix = r.prefix
  GROUP BY 1
)
SELECT COALESCE(m.decision, 'allow') AS decision, d.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
FROM docs d LEFT JOIN matched m ON d.doc_id = m.doc_id
GROUP BY 1, 2
"""


@register("robots_prefix_rules", _ROBOTS_ORACLE)
def robots_prefix_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """robots.txt-style LONGEST-PREFIX-MATCH filtering: each page's
    path expands to its (depth-bounded) prefix chain, equi-joins the
    broadcast rule table, and the longest matched prefix decides —
    `max_by(decision, length)` is the argmax-without-a-window shape
    (combiner-friendly; no per-group sort).  Unmatched pages fall
    through to allow via the left join.

    Scale shape: rules are a crawl-config dimension (broadcast); the
    fact side shuffles once on doc_id for the argmax and once for the
    rollup — prefix explosion is a bounded ×depth flatMap, never a
    regex scan over the rule set per row."""
    docs = load(spark, sf_dir, "documents").selectExpr(
        "doc_id", "lang", "n_chars",
        f"'/s' || {_SEG_A} AS pre1",
        f"'/s' || {_SEG_A} || '/t' || {_SEG_B} AS pre2",
    )
    from chopin_spark.tables import values_df

    rules = values_df(spark, list(_RULES), "prefix string, decision string")
    cand = docs.select(
        "doc_id", F.explode(F.array("pre1", "pre2")).alias("prefix")
    )
    matched = (
        cand.join(F.broadcast(rules), "prefix")
        .groupBy("doc_id")
        .agg(
            F.max_by("decision", F.length("prefix")).alias("decision")
        )
    )
    return (
        docs.join(matched, "doc_id", "left")
        .groupBy(
            F.coalesce("decision", F.lit("allow")).alias("decision"),
            "lang",
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("sum_chars"),
        )
    )


# --- host link-graph HITS (hubs & authorities, integer-exact) -----------------

_HITS_ITERS = 2


def _hits_oracle() -> str:
    ctes = [
        f"e AS (SELECT * FROM {_PR_EDGES})",
        """n AS (SELECT DISTINCT node FROM
             (SELECT src AS node FROM e UNION ALL SELECT dst FROM e))""",
        "h0 AS (SELECT node, CAST(1000000 AS BIGINT) AS hub FROM n)",
    ]
    for it in range(1, _HITS_ITERS + 1):
        ctes.append(f"""
ar{it} AS (
  SELECT e.dst AS node, SUM(h.hub) AS raw
  FROM e JOIN h{it - 1} h ON h.node = e.src GROUP BY 1
),
a{it} AS (
  SELECT node, (raw * 1000000) // (SELECT SUM(raw) FROM ar{it}) AS auth
  FROM ar{it}
),
hr{it} AS (
  SELECT e.src AS node, SUM(a.auth) AS raw
  FROM e JOIN a{it} a ON a.node = e.dst GROUP BY 1
),
h{it} AS (
  SELECT node, (raw * 1000000) // (SELECT SUM(raw) FROM hr{it}) AS hub
  FROM hr{it}
)""".strip())
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT n.node AS host_num,
       CAST(COALESCE(a{_HITS_ITERS}.auth, 0) AS BIGINT) AS auth_micro,
       CAST(COALESCE(h{_HITS_ITERS}.hub, 0) AS BIGINT) AS hub_micro
FROM n
LEFT JOIN a{_HITS_ITERS} ON a{_HITS_ITERS}.node = n.node
LEFT JOIN h{_HITS_ITERS} ON h{_HITS_ITERS}.node = n.node"""
    )


@register("host_hits", _hits_oracle())
def host_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs & authorities over the same host link graph as
    host_pagerank — the query-dependent web centrality pair
    (Kleinberg).  Integer micro-units with per-round renormalization
    by floor division (components.hits_int); each round is two
    rank⋈edges joins + two keyed sums, the distributed shape that
    holds at 10^9 hosts.  The oracle replays the identical recurrence
    as unrolled CTEs — value-hash exact, no float tolerance."""
    from chopin_spark.components import hits_int

    docs = load(spark, sf_dir, "documents")
    edges = docs.selectExpr(
        "(doc_id * 69069) % 97 AS src",
        "(doc_id * 48271) % 97 AS dst",
    ).filter("src <> dst")
    out = hits_int(edges, iters=_HITS_ITERS)
    return out.select(
        F.col("node").alias("host_num"),
        F.col("auth").alias("auth_micro"),
        F.col("hub").alias("hub_micro"),
    )


# --- Bloom-filter incremental dedup (recrawl vs stored corpus) ---------------
#
# The recrawl staple: which pages of the NEW snapshot are already in
# the corpus?  The exact answer is an anti-join on content identity —
# at 10^12 stored docs that join shuffles the full probe side against
# the full corpus.  The Bloom path compresses the corpus membership
# set to a FIXED-size bit set (m = 2^16 here; m scales with corpus
# size, never with probe size): 3 bit positions per stored doc via
# Kirsch–Mitzenmacher double hashing pos_k = (h1 + k*h2) mod m, and a
# probe doc is "seen" iff all 3 of its positions are set.  The bit set
# is corpus-size-INDEPENDENT state that broadcasts to every executor
# (the ≤ m distinct-position table below IS that bitmap in relational
# clothing), so probing is three broadcast-hash lookups per row — zero
# shuffle of either fact table.  False positives are inherent to the
# sketch and DETERMINISTIC given the shared hash recipe, so the oracle
# reproduces them bit-for-bit; exact_seen (join on the (h1, h2) 60-bit
# content identity) is carried alongside, so the query also measures
# the sketch's FP behavior.  Membership is keyed on the content HEAD
# fingerprint (first 8 tokens) rather than the full text — the
# truncation-robust identity a crawl store dedups on (pages recrawled
# with different tail boilerplate share the head).  Reference anchor:
# chopin has no sketch layer; this extends the engine for crawl-store
# maintenance.

_BLOOM_M = 65_536
_BLOOM_K = 8  # head-fingerprint token count
_H1 = "_h1"  # charfold(head, 31)  — computed once, reused
_H2 = "_h2"  # charfold(head, 131)


def _bloom_oracle() -> str:
    from chopin_spark.textops import charfold_duckdb

    h1, h2 = charfold_duckdb("pref", 31), charfold_duckdb("pref", 131)
    pos = [f"(({_H1} + {k} * {_H2}) % {_BLOOM_M})" for k in range(3)]
    return f"""
WITH pref AS (
  SELECT doc_id, CAST(SUBSTR(source, 4) AS INT) AS snap,
         array_to_string(string_split(text, ' ')[1:{_BLOOM_K}], ' ')
           AS pref
  FROM documents
),
hashed AS (
  SELECT doc_id, snap, {h1} AS {_H1}, {h2} AS {_H2} FROM pref
),
oldd AS (SELECT * FROM hashed WHERE snap < 10),
newd AS (
  SELECT doc_id, {_H1}, {_H2},
         {pos[0]} AS p0, {pos[1]} AS p1, {pos[2]} AS p2
  FROM hashed WHERE snap >= 10
),
bits AS (
  SELECT DISTINCT pos FROM (
    SELECT {pos[0]} AS pos FROM oldd
    UNION ALL SELECT {pos[1]} FROM oldd
    UNION ALL SELECT {pos[2]} FROM oldd
  )
),
ident AS (SELECT DISTINCT {_H1} AS i1, {_H2} AS i2 FROM oldd)
SELECT n.doc_id,
       CAST(CASE WHEN b0.pos IS NOT NULL AND b1.pos IS NOT NULL
                  AND b2.pos IS NOT NULL THEN 1 ELSE 0 END AS INT)
         AS bloom_seen,
       CAST(CASE WHEN ident.i1 IS NOT NULL THEN 1 ELSE 0 END AS INT)
         AS exact_seen
FROM newd n
LEFT JOIN bits b0 ON b0.pos = n.p0
LEFT JOIN bits b1 ON b1.pos = n.p1
LEFT JOIN bits b2 ON b2.pos = n.p2
LEFT JOIN ident ON ident.i1 = n.{_H1} AND ident.i2 = n.{_H2}
"""


@register("bloom_incremental_dedup", _bloom_oracle())
def bloom_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flag new-snapshot docs already present in the stored corpus via
    a fixed-size Bloom membership sketch (3 double-hashed positions
    into m = 2^16), with the exact content-identity verdict alongside.
    Scale shape: the distinct-position table is ≤ m rows no matter the
    corpus size — explicitly broadcast — so the probe side never
    shuffles; the exact-identity table is corpus-sized in general, so
    production keeps only the Bloom verdict and routes the (tiny)
    positive slice through the exact join."""
    from chopin_spark.textops import charfold_spark

    docs = load(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        "CAST(SUBSTR(source, 4) AS INT) AS snap",
        f"array_join(slice(split(text, ' '), 1, {_BLOOM_K}), ' ') AS pref",
    ).selectExpr(
        "doc_id",
        "snap",
        f"{charfold_spark('pref', 31)} AS {_H1}",
        f"{charfold_spark('pref', 131)} AS {_H2}",
    )
    pos = [
        ((F.col(_H1) + k * F.col(_H2)) % _BLOOM_M).alias(f"p{k}")
        for k in range(3)
    ]
    old = docs.filter("snap < 10")
    new = docs.filter("snap >= 10").select("doc_id", _H1, _H2, *pos)
    bits = (
        old.select(pos[0].alias("pos"))
        .unionAll(old.select(pos[1].alias("pos")))
        .unionAll(old.select(pos[2].alias("pos")))
        .distinct()
    )
    ident = old.select(
        F.col(_H1).alias("i1"), F.col(_H2).alias("i2")
    ).distinct()
    out = new
    for k in range(3):
        bk = F.broadcast(bits.withColumnRenamed("pos", f"pos{k}"))
        out = out.join(bk, F.col(f"p{k}") == F.col(f"pos{k}"), "left")
    out = out.join(
        F.broadcast(ident),
        (F.col(_H1) == F.col("i1")) & (F.col(_H2) == F.col("i2")),
        "left",
    )
    seen = (
        F.col("pos0").isNotNull()
        & F.col("pos1").isNotNull()
        & F.col("pos2").isNotNull()
    )
    return out.select(
        "doc_id",
        F.when(seen, 1).otherwise(0).cast("int").alias("bloom_seen"),
        F.when(F.col("i1").isNotNull(), 1).otherwise(0).cast("int")
        .alias("exact_seen"),
    )


# --- anchor extraction → host link graph -------------------------------------
#
# The real-payload twin of the LCG edge fixtures (graphq.py,
# host_pagerank): here the link graph is EXTRACTED FROM THE HTML — each
# page's html carries three <a href> anchors (deterministic targets in
# a 997-host universe), the engine recovers the hrefs with
# regexp_extract_all + explode (JVM codegen, zero Python), and the
# oracle never runs a regex at all: it re-derives each anchor target
# arithmetically from doc_id.  A value-hash match means the regex
# parser agrees with the generator on every row — the same
# two-independent-parsers discipline as url_host_tld_rollup.

_ANCHOR_DST = [
    f"('h' || CAST((doc_id * {m} + {c}) % 997 AS STRING) || '.example.com')"
    for m, c in ((31, 7), (131, 63), (523, 11))
]

_ANCHOR_HTML = (
    "('<html><body><p>' || text || '</p>'"
    + " || "
    + " || ".join(
        f"'<a href=\"https://' || {d} || '/x\">l</a>'" for d in _ANCHOR_DST
    )
    + " || '</body></html>')"
)

_LINK_ORACLE = f"""
WITH hits AS (
  SELECT {_ANCHOR_DST[0]} AS dst_host FROM documents
  UNION ALL
  SELECT {_ANCHOR_DST[1]} FROM documents
  UNION ALL
  SELECT {_ANCHOR_DST[2]} FROM documents
)
SELECT dst_host, COUNT(*) AS n_inlinks
FROM hits
GROUP BY 1
"""


@register("html_link_edges", _LINK_ORACLE)
def html_link_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-link counts per target host, extracted from page html.

    Engine: build html → ``regexp_extract_all(html,
    '<a href="https?://([^/"]+)', 1)`` → explode → one partial+final
    count agg on the host key.  Map-side regex fuses into the scan; the
    explode is 3× row growth of a 20-byte column (the html payload is
    projected away first), so at 10^12 pages the shuffle carries hosts,
    not pages.  Oracle: arithmetic re-derivation of the anchor targets
    — no regex — so a hash match proves extraction is exact."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return (
        spark.sql(f"SELECT {_ANCHOR_HTML} AS html FROM documents")
        .select(
            F.explode(
                F.expr(
                    "regexp_extract_all(html,"
                    " '<a href=\"https?://([^/\"]+)', 1)"
                )
            ).alias("dst_host")
        )
        .groupBy("dst_host")
        .agg(F.count(F.lit(1)).alias("n_inlinks"))
    )


# --- Wilson-score host quality ranking ---------------------------------------
#
# Crawl prioritization: rank hosts by the LOWER confidence bound of
# their quality pass rate, not the raw rate — a 2/2 host must not
# outrank a 95/100 host.  Wilson interval at z=1.96; +, −, ×, ÷, sqrt
# are all IEEE-correctly-rounded, so the shared SQL text is bit-exact
# in both engines at full double precision (same determinism argument
# as chopin_spark/crs.py).

# 97-host universe (the pagerank fixture's cardinality, independent
# multiplier) — the full 99991-host recipe leaves every host a
# singleton at test scale, which would make the interval vacuous
_WILSON_HOST = "('h' || CAST((doc_id * 40503) % 97 AS STRING) || '.example.com')"

_WILSON_SQL = f"""
WITH per_host AS (
  SELECT {_WILSON_HOST} AS host,
         COUNT(*) AS n_docs,
         CAST(SUM(CASE WHEN n_chars >= 200 AND n_chars <= 5000
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
  FROM documents
  GROUP BY 1
  HAVING COUNT(*) >= 2
),
w AS (
  SELECT host, n_docs, n_pass,
         CAST(n_pass AS DOUBLE) / n_docs AS p,
         CAST(n_docs AS DOUBLE) AS n
  FROM per_host
)
SELECT host, n_docs, n_pass,
       (p + 1.9208 / n - 1.96 * SQRT((p * (1.0 - p) + 0.9604 / n) / n))
         / (1.0 + 3.8416 / n) AS wilson_lb
FROM w
"""


@register("host_quality_wilson", _WILSON_SQL)
def host_quality_wilson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host quality pass rate with its Wilson lower confidence
    bound (z = 1.96) — the crawl-frontier scoring rule that is robust
    to small hosts.  One partial+final agg on the host key, then pure
    column math; no window, no sort, no Python.  At 10^12 pages the
    host cardinality (~10^8) is the shuffle size, not the page count."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_WILSON_SQL)


# --- co-citation communities over the EXTRACTED link graph -------------------
#
# Chains the anchor-extraction path into the iterative CC machinery:
# pages (a sparse 1-in-7 sample, so the co-citation graph actually
# decomposes instead of collapsing into one giant component)
# contribute edges between CONSECUTIVE anchor targets in their html;
# connected components of that graph are link communities (host
# clusters that co-occur on the same pages).  Engine edges come from
# the regexp extraction; the oracle re-derives them arithmetically and
# closes them with a transitive-closure CTE — extraction, edge
# building, AND the O(log n) star fixpoint are all cross-checked by
# one value hash.

_COCITE_MOD = 7

# numeric host ids (the N of hN.example.com) — connected_components_star
# needs numeric nodes for its integer convergence fingerprint; the
# engine recovers N from the EXTRACTED host string with a regexp, the
# oracle derives it arithmetically
_ANCHOR_NUM = [
    f"((doc_id * {m} + {c}) % 997)" for m, c in ((31, 7), (131, 63), (523, 11))
]

_COCITE_ORACLE = f"""
WITH RECURSIVE sel AS (
  SELECT doc_id FROM documents WHERE doc_id % {_COCITE_MOD} = 0
),
e0 AS (
  SELECT {_ANCHOR_NUM[0]} AS s, {_ANCHOR_NUM[1]} AS t FROM sel
  UNION
  SELECT {_ANCHOR_NUM[1]}, {_ANCHOR_NUM[2]} FROM sel
),
edges AS (
  SELECT s AS src, t AS dst FROM e0 WHERE s <> t
  UNION
  SELECT t, s FROM e0 WHERE s <> t
),
reach AS (
  SELECT src AS a, dst AS b FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b
),
lab AS (
  SELECT a AS host, LEAST(a, MIN(b)) AS comp_id
  FROM reach GROUP BY a
)
SELECT comp_id,
       CAST(COUNT(*) AS BIGINT) AS n_hosts,
       CAST(MIN(host) AS BIGINT) AS first_host,
       md5(string_agg(CAST(host AS VARCHAR), ',' ORDER BY host))
         AS member_md5
FROM lab
GROUP BY 1
"""


@register("link_graph_components", _COCITE_ORACLE)
def link_graph_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link communities of the anchor-extracted co-citation graph:
    regexp extraction → consecutive-target edges → alternating-star
    connected components (components.py, O(log n) rounds).  The
    member_md5 over the sorted member list pins exact community
    membership, not just sizes."""
    from chopin_spark.components import connected_components_star

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    arr = spark.sql(
        f"SELECT {_ANCHOR_HTML} AS html FROM documents"
        f" WHERE doc_id % {_COCITE_MOD} = 0"
    ).select(
        F.expr(
            "regexp_extract_all(html,"
            " '<a href=\"https?://([^/\"]+)', 1)"
        ).alias("dsts")
    )
    num = "CAST(regexp_extract({h}, \'^h([0-9]+)\', 1) AS BIGINT)"
    e0 = (
        arr.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("dsts")[0].alias("hs"),
                        F.col("dsts")[1].alias("ht"),
                    ),
                    F.struct(
                        F.col("dsts")[1].alias("hs"),
                        F.col("dsts")[2].alias("ht"),
                    ),
                )
            ).alias("e")
        )
        .selectExpr(
            num.format(h="e.hs") + " AS s",
            num.format(h="e.ht") + " AS t",
        )
        .filter(F.col("s") != F.col("t"))
        .distinct()
    )
    comps = connected_components_star(e0, src="s", dst="t")
    return (
        comps.groupBy("comp_id")
        .agg(
            F.count(F.lit(1)).alias("n_hosts"),
            F.min("node").alias("first_host"),
            F.md5(
                F.concat_ws(",", F.array_sort(F.collect_list("node")))
            ).alias("member_md5"),
        )
        .select(
            "comp_id",
            F.col("n_hosts").cast("long").alias("n_hosts"),
            F.col("first_host").cast("long").alias("first_host"),
            "member_md5",
        )
    )


# --- per-host page cap (bounded top-k, no window sort) -----------------------
#
# CCNet-style per-domain contribution cap: keep each host's best 3
# pages by length score.  Engine uses the knn_join trick — ONE
# aggregation with slice(array_sort(collect_list(struct))) — so the
# shuffle carries (host, 3-struct) rows and nothing ever sorts a full
# host group (the row_number()-window formulation cannot combine
# map-side; at 10^12 rows a hot host would sort millions of rows).
# The fingerprint folds kept ids IN RANK ORDER, pinning the exact
# selection and its ordering.

_CAP_K = 3

_CAP_ORACLE = f"""
WITH ranked AS (
  SELECT host, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY host
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM (SELECT {_WILSON_HOST} AS host, doc_id, n_chars FROM documents)
)
SELECT host,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum,
       LIST_REDUCE(
         LIST_PREPEND(CAST(0 AS BIGINT), LIST(doc_id ORDER BY rn)),
         (h, d) -> (h * 1000003 + d) % 1000000007) AS kept_fp
FROM ranked WHERE rn <= {_CAP_K}
GROUP BY 1
"""


@register("host_page_cap", _CAP_ORACLE)
def host_page_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{k} pages per host by (n_chars DESC, doc_id) — single-agg
    bounded top-k; deterministic tie-break; rank-ordered fingerprint."""
    docs = load(spark, sf_dir, "documents").selectExpr(
        f"{_WILSON_HOST} AS host", "doc_id", "n_chars"
    )
    kept = docs.groupBy("host").agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("n_chars")).alias("negs"),
                        F.col("doc_id").alias("d"),
                    )
                )
            ),
            1,
            _CAP_K,
        ).alias("top")
    )
    return kept.selectExpr(
        "host",
        "CAST(size(top) AS BIGINT) AS n_kept",
        "CAST(aggregate(top, CAST(0 AS BIGINT), (s, t) -> s + t.d)"
        " AS BIGINT) AS kept_id_sum",
        "aggregate(top, CAST(0 AS BIGINT),"
        " (h, t) -> (h * 1000003 + t.d) % 1000000007) AS kept_fp",
    )


# --- exact percentile normalization via the value histogram ------------------
#
# Quality scores feed sampling/mixing as PERCENTILES, not raw values.
# A global sort (or percent_rank window) is the naive formulation; the
# scale path collapses 10^12 rows to the HISTOGRAM of the bounded
# integer score domain (metadata-sized), runs one running-sum window
# over that manifest, and broadcast-joins the cumulative table back —
# the s2_write_layout_plan two-phase discipline applied to ranking.
# percentile = rank among all docs with <= score, integer-exact ratio.

_PCTL_SQL = """
WITH hist AS (
  SELECT n_chars AS v, CAST(COUNT(*) AS BIGINT) AS c
  FROM documents GROUP BY 1
),
cum AS (
  SELECT v,
         SUM(c) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cle,
         (SELECT SUM(c) FROM hist) AS tot
  FROM hist
)
SELECT d.doc_id, d.n_chars,
       ROUND(CAST(cum.cle AS DOUBLE) / cum.tot, 4) AS len_pctl
FROM documents d JOIN cum ON cum.v = d.n_chars
"""


@register("quality_percentile_norm", _PCTL_SQL)
def quality_percentile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document exact percentile of its length score, computed
    from the score histogram (no global sort of facts; the window
    runs over the metadata-sized value domain)."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_PCTL_SQL)


# --- inbound anchor-text profile per target host -------------------------------
#
# The ranking-signal twin of html_link_edges: what the WEB SAYS a host
# is (inbound anchor text), not what the host says.  The html here
# carries the same three deterministic targets but each anchor's text
# is a distinct md5-derived snippet of the page, so the engine must
# recover (target, anchor_text) PAIRS — full-tag regexp_extract_all,
# then per-tag host + text extracts, all JVM codegen.  The oracle never
# parses html: it re-derives both fields arithmetically (host from
# doc_id, text from the same md5 slice), so a hash match proves the
# tag-pairing parse is exact — a parser that pairs host k with anchor
# text k±1 breaks it.  Aggregation is host-keyed (pages shuffle only
# their ≤3 short anchor rows, html projected away at the scan).

_ANCHOR_TXT = [
    f"substr(md5(text), {1 + 8 * k}, 6)" for k in range(3)
]

_ANCHOR_HTML_TXT = (
    "('<html><body><p>' || text || '</p>'"
    + " || "
    + " || ".join(
        f"'<a href=\"https://' || {d} || '/x\">' || {t} || '</a>'"
        for d, t in zip(_ANCHOR_DST, _ANCHOR_TXT)
    )
    + " || '</body></html>')"
)

_ANCHOR_PROF_ORACLE = f"""
WITH hits AS (
  SELECT {_ANCHOR_DST[0]} AS dst_host, {_ANCHOR_TXT[0]} AS anchor
  FROM documents
  UNION ALL
  SELECT {_ANCHOR_DST[1]}, {_ANCHOR_TXT[1]} FROM documents
  UNION ALL
  SELECT {_ANCHOR_DST[2]}, {_ANCHOR_TXT[2]} FROM documents
)
SELECT dst_host,
       COUNT(*) AS n_inlinks,
       COUNT(DISTINCT anchor) AS n_texts,
       MIN(anchor) AS first_text
FROM hits
GROUP BY 1
"""


@register("anchor_text_profile", _ANCHOR_PROF_ORACLE)
def anchor_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inbound anchor-text profile per target host: full <a> tags via
    regexp_extract_all, host and text re-extracted per tag (pairing
    preserved), host-keyed count / distinct-text / min-text rollup."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    tags = spark.sql(
        f"SELECT {_ANCHOR_HTML_TXT} AS html FROM documents"
    ).select(
        F.explode(
            F.expr(
                "regexp_extract_all(html,"
                " \'<a href=\"https?://[^\"]*\"[^>]*>[^<]*</a>\', 0)"
            )
        ).alias("tag")
    )
    pairs = tags.select(
        F.expr(
            "regexp_extract(tag, \'https?://([^/\"]+)\', 1)"
        ).alias("dst_host"),
        F.expr("regexp_extract(tag, \'>([^<]*)</a>\', 1)").alias("anchor"),
    )
    return pairs.groupBy("dst_host").agg(
        F.count(F.lit(1)).alias("n_inlinks"),
        F.countDistinct("anchor").alias("n_texts"),
        F.min("anchor").alias("first_text"),
    )


# --- shingle novelty per crawl epoch ------------------------------------------
#
# The "how much of this crawl is NEW content" measurement (RefinedWeb /
# CommonCrawl dedup planning): per quarter-year epoch, the fraction of
# distinct 5-gram shingles whose FIRST appearance is that epoch.
# Shape: one distinct-(shingle, epoch) agg, one min-epoch agg, one
# equi-join back — all hash-partitioned on the shingle key, no windows,
# no pairs; at crawl scale the shingle table is the dedup index the
# pipeline already maintains.

_EPOCH_Q = "CAST(FLOOR(((doc_id * 48271) % 31536000) / 7884000.0) AS BIGINT)"


def _novelty_sql(shingle_src: str) -> str:
    return f"""
WITH sh AS (
  SELECT DISTINCT shingle, epoch_q
  FROM ({shingle_src})
),
firsts AS (
  SELECT shingle, MIN(epoch_q) AS e0 FROM sh GROUP BY 1
)
SELECT sh.epoch_q,
       CAST(COUNT(*) AS BIGINT) AS n_shingles,
       CAST(SUM(CASE WHEN f.e0 = sh.epoch_q THEN 1 ELSE 0 END)
            AS BIGINT) AS n_novel,
       ROUND(SUM(CASE WHEN f.e0 = sh.epoch_q THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS novelty_ratio
FROM sh JOIN firsts f ON f.shingle = sh.shingle
GROUP BY 1
"""


_NOV_SPARK = _novelty_sql(f"""
  SELECT explode(transform(sequence(1, size(w) - 4),
           i -> concat_ws(' ', element_at(w, i), element_at(w, i + 1),
                element_at(w, i + 2), element_at(w, i + 3),
                element_at(w, i + 4)))) AS shingle,
         {_EPOCH_Q} AS epoch_q
  FROM (SELECT doc_id, split(text, ' ') AS w FROM documents)
  WHERE size(w) >= 5
""")
_NOV_ORACLE = _novelty_sql(f"""
  SELECT UNNEST(LIST_TRANSFORM(generate_series(1, LEN(w) - 4),
           i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' '
                || w[i+3] || ' ' || w[i+4])) AS shingle,
         {_EPOCH_Q} AS epoch_q
  FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS w FROM documents)
  WHERE LEN(w) >= 5
""")


@register("shingle_novelty_by_epoch", _NOV_ORACLE)
def shingle_novelty_by_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-epoch 5-gram novelty: distinct shingles whose first
    appearance is this quarter / distinct shingles this quarter —
    shingle-keyed aggs + one equi-join, the incremental-crawl dedup
    planning statistic."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_NOV_SPARK)


# --- host lifetime hazard table (Kaplan–Meier discipline) ----------------------
#
# Crawl-ops survival analysis: when do hosts disappear from the crawl?
# Per host the first/last active quarter; at each quarter t the
# at-risk set (first ≤ t ≤ last) and the deaths (last = t, censored at
# the horizon).  The fact table collapses to a (first, last) COHORT
# table (≤ quarters² rows) before any per-epoch math — the KM at-risk
# sums are then metadata-scale; hazards are single exact divisions on
# the 1e-6 lattice, never a cumulative float product.

_HAZ_SQL = f"""
WITH pages AS (
  SELECT {_HOST} AS host,
         CAST(FLOOR(((doc_id * 48271) % 31536000) / 7884000.0) AS BIGINT)
           AS q
  FROM documents
),
h AS (
  SELECT host, MIN(q) AS fq, MAX(q) AS lq FROM pages GROUP BY 1
),
cohort AS (
  SELECT fq, lq, CAST(COUNT(*) AS BIGINT) AS n FROM h GROUP BY 1, 2
),
t(q) AS (VALUES (0), (1), (2), (3))
SELECT CAST(t.q AS BIGINT) AS quarter,
       CAST(SUM(CASE WHEN c.fq <= t.q AND c.lq >= t.q THEN c.n
                     ELSE 0 END) AS BIGINT) AS n_at_risk,
       CAST(SUM(CASE WHEN c.lq = t.q AND t.q < 3 THEN c.n
                     ELSE 0 END) AS BIGINT) AS n_deaths,
       CAST(FLOOR(
         SUM(CASE WHEN c.lq = t.q AND t.q < 3 THEN c.n ELSE 0 END)
         * 1000000.0
         / SUM(CASE WHEN c.fq <= t.q AND c.lq >= t.q THEN c.n ELSE 0 END)
         + 0.5) AS BIGINT) AS hazard_micro
FROM t CROSS JOIN cohort c
GROUP BY 1
"""


@register("host_survival_hazard", _HAZ_SQL)
def host_survival_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-quarter host survival hazard: at-risk counts and death
    hazards from the cohorted (first, last) lifetime table — exact
    integers plus one micro-lattice division per epoch."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_HAZ_SQL)


# --- typosquat candidate pairs (blocked edit-distance join) --------------------
#
# Domain-abuse detection: same-length host pairs within edit distance
# 2 (substitution typos — the dominant squatting pattern) are
# registration-typo candidates.  The edit-distance join is BLOCKED on
# (ccTLD, host length): substitutions preserve length, so the block
# key is lossless for this pattern, each block is a bounded self-join,
# and the quadratic term is Σ|block|², never n² (the guard discipline
# of every pair producer in this repo).  levenshtein() is the classic
# integer DP in both engines — exact, no float anywhere.

_TYPO_SQL = f"""
WITH h AS (
  SELECT DISTINCT {_HOST} AS host, {_CCTLD} AS cc
  FROM documents
)
SELECT a.host AS host_a, b.host AS host_b,
       CAST(levenshtein(a.host, b.host) AS BIGINT) AS edit_dist
FROM h a JOIN h b
  ON a.cc = b.cc AND LENGTH(a.host) = LENGTH(b.host) AND a.host < b.host
WHERE levenshtein(a.host, b.host) <= 2
"""


@register("host_typosquat_pairs", _TYPO_SQL)
def host_typosquat_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-≤2 same-length host pairs under (ccTLD, length)
    blocking — Σ|block|² bounded candidates, integer DP distance.

    Engine plan: the distinct host table is a few hundred KB, so AQE
    coalesces its shuffle to ~1 partition — but the expensive part is
    the DP that EXPLODES after the join (Σ|block|² levenshtein cells),
    which AQE cannot see from shuffle bytes (guide §2.5: cheap rows,
    expensive downstream compute).  An explicit repartition on exactly
    the join's block key, width = defaultParallelism (core-count
    parameterised, never a constant), spreads the DP across the
    cluster; because both self-join sides carry that same partitioning
    the join adds no exchange.  Same SQL text as the oracle otherwise."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    p = spark.sparkContext.defaultParallelism
    h = spark.sql(f"""
      SELECT DISTINCT {_HOST} AS host, {_CCTLD} AS cc
      FROM documents
    """).withColumn("hl", F.length("host")).repartition(p, "cc", "hl")
    a = h.select(
        F.col("host").alias("host_a"), F.col("cc"), F.col("hl")
    )
    b = h.select(
        F.col("host").alias("host_b"), F.col("cc"), F.col("hl")
    )
    return (
        a.join(b, ["cc", "hl"])
        .filter(F.col("host_a") < F.col("host_b"))
        .withColumn(
            "edit_dist",
            F.levenshtein("host_a", "host_b").cast("long"),
        )
        .filter(F.col("edit_dist") <= 2)
        .select("host_a", "host_b", "edit_dist")
    )


# --- Gini coefficient of host content inequality -------------------------------
#
# How concentrated is the corpus across hosts?  The crawl-balance
# audit behind per-host caps and temperature mixing: Gini of per-host
# character mass over the 97-host universe, computed from the ranked
# cumulative-sum identity G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) with
# deterministic ranks (mass, host) — all integer until the final
# ratio.  The rank window runs over the HOST table (universe-bounded),
# never the fact.

_GINI_SQL = f"""
WITH h AS (
  SELECT {_TRI_SRC} AS host_num, CAST(SUM(n_chars) AS BIGINT) AS mass
  FROM documents GROUP BY 1
),
r AS (
  SELECT mass, ROW_NUMBER() OVER (ORDER BY mass, host_num) AS i FROM h
),
s AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(mass) AS BIGINT) AS tot,
         CAST(SUM(i * mass) AS BIGINT) AS wsum
  FROM r
)
SELECT n AS n_hosts, tot AS total_chars,
       ROUND((2.0 * wsum - (CAST(n AS DOUBLE) + 1) * tot)
             / (CAST(n AS DOUBLE) * tot),
             6) AS gini
FROM s
"""


@register("host_gini_inequality", _GINI_SQL)
def host_gini_inequality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-host content mass — the inequality
    summary driving host-cap and mixing decisions."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_GINI_SQL)


# --- consistent-hash crawler shard planner -------------------------------------
#
# The fleet-assignment primitive: map every host onto a hash ring of
# 32 crawler shards × 8 virtual nodes so shard membership is stable
# under shard add/remove (only ~1/33 of hosts move — the property
# modulo sharding lacks).  Ring positions come from the repo's
# cross-engine charfold polynomial hash (textops.py), clockwise
# distance is pure modular arithmetic, and the owning vnode is an
# encoded MIN — one agg over the host×vnode candidate set.
#
# Scale shape: the vnode table is metadata-sized (256 rows, broadcast);
# hosts fold out of the fact scan first, so the argmin touches
# |hosts|·256 rows of column math, never the corpus.  Imbalance is the
# planner's output contract: per-shard host/mass loads for the
# rebalancing decision.

from chopin_spark.textops import P30, charfold_duckdb, charfold_spark  # noqa: E402

_CH_SHARDS, _CH_VNODES = 32, 8


def _shard_plan_sql(fold, gen_vn: str) -> str:
    vname = "('s' || CAST(s AS STRING) || '#' || CAST(v AS STRING))"
    return f"""
WITH h AS (
  SELECT {_HOST} AS host, CAST(SUM(n_chars) AS BIGINT) AS mass
  FROM documents GROUP BY 1
),
vn AS (
  SELECT s * {_CH_VNODES} + v AS vid, {fold(vname)} AS vpos
  FROM {gen_vn}
),
hp AS (
  SELECT host, mass, {fold('host')} AS hpos FROM h
),
owner AS (
  SELECT host, mass,
         MIN(((vn.vpos - hp.hpos + {P30}) % {P30}) * 512 + vn.vid) AS enc
  FROM hp CROSS JOIN vn
  GROUP BY 1, 2
),
assign AS (
  SELECT host, mass,
         CAST((enc % 512) / {_CH_VNODES} AS BIGINT) AS shard
  FROM owner
),
shards AS (SELECT s AS shard FROM {gen_vn.replace('AS g(s, v)', 'AS g2(s, v)')} WHERE v = 0)
SELECT sh.shard,
       CAST(COUNT(a.host) AS BIGINT) AS n_hosts,
       CAST(COALESCE(SUM(a.mass), 0) AS BIGINT) AS mass_chars
FROM shards sh LEFT JOIN assign a ON a.shard = sh.shard
GROUP BY 1
"""


_CH_GEN_SPARK = f"""(
  SELECT gs.s, gv.v
  FROM (SELECT explode(sequence(0, {_CH_SHARDS - 1})) AS s) gs
  CROSS JOIN (SELECT explode(sequence(0, {_CH_VNODES - 1})) AS v) gv
) AS g(s, v)"""

_CH_GEN_DUCK = f"""(
  SELECT g1.s, g2.v
  FROM generate_series(0, {_CH_SHARDS - 1}) AS g1(s),
       generate_series(0, {_CH_VNODES - 1}) AS g2(v)
) AS g(s, v)"""


@register(
    "consistent_hash_shards",
    _shard_plan_sql(charfold_duckdb, _CH_GEN_DUCK),
)
def consistent_hash_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent-hash assignment of hosts to 32 crawler shards (8
    vnodes each) with per-shard host and mass loads — stable-membership
    fleet planning over the cross-engine charfold ring."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_shard_plan_sql(charfold_spark, _CH_GEN_SPARK))


# --- personalized PageRank (crawl-seed expansion) -------------------------------
#
# The crawl-frontier twin of host_pagerank: random-walk-with-restart
# mass from a trusted SEED set (TrustRank / seed-expansion — "which
# hosts are close to the seeds under the link topology?").  Identical
# integer micro-rank recurrence, but r0 and the (1−d) restart term land
# only on the seeds, so unreachable hosts finish at exactly 0 — the
# discovery frontier is the >0 support.  Same per-round join shape as
# PageRank (rank⋈edges + dst-keyed sum); the restart vector is
# metadata and never shuffles.

_PPR_SEEDS = (3, 17, 42)


def _ppr_oracle() -> str:
    seed_in = "node IN (" + ", ".join(str(s) for s in _PPR_SEEDS) + ")"
    nseed_in = seed_in.replace("node IN", "n.node IN")
    ctes = [
        f"e AS (SELECT * FROM {_PR_EDGES})",
        """n AS (SELECT DISTINCT node FROM
             (SELECT src AS node FROM e UNION ALL SELECT dst FROM e))""",
        "deg AS (SELECT src, COUNT(*) AS deg FROM e GROUP BY 1)",
        f"""r0 AS (SELECT node,
              CAST(CASE WHEN {seed_in} THEN 1000000 ELSE 0 END AS BIGINT)
                AS rank FROM n)""",
    ]
    for it in range(1, _PR_ITERS + 1):
        ctes.append(f"""
c{it} AS (
  SELECT e.dst AS node, SUM(r.rank // deg.deg) AS inb
  FROM e
  JOIN r{it - 1} r ON r.node = e.src
  JOIN deg ON deg.src = e.src
  GROUP BY 1
),
r{it} AS (
  SELECT n.node,
         CAST(CASE WHEN {nseed_in} THEN {_PR_BASE} ELSE 0 END AS BIGINT)
           + CAST(FLOOR(0.85 * COALESCE(c{it}.inb, 0) + 0.5)
                  AS BIGINT) AS rank
  FROM n LEFT JOIN c{it} ON c{it}.node = n.node
)""".strip())
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT node AS host_num, rank AS rank_micro
FROM r{_PR_ITERS} WHERE rank > 0"""
    )


@register("host_pagerank_personalized", _ppr_oracle())
def host_pagerank_personalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank from a 3-host trusted seed set over the
    host link graph (integer-exact, 3 damped rounds, restart mass on
    seeds only) — the TrustRank-style seed-expansion ranking a crawler
    uses to prioritize hosts near known-good ones.  Only the reachable
    support (rank > 0) is returned."""
    from chopin_spark.components import pagerank_int

    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    edges = spark.sql(f"SELECT * FROM {_PR_EDGES}")
    from chopin_spark.tables import values_df

    seeds = values_df(spark, [(s,) for s in _PPR_SEEDS], "node long")
    return (
        pagerank_int(edges, iters=_PR_ITERS, seeds=seeds)
        .filter(F.col("rank") > 0)
        .select(
            F.col("node").alias("host_num"),
            F.col("rank").alias("rank_micro"),
        )
    )


# --- crawl politeness scheduling (queueing recurrence as a window scan) --------
#
# The crawl-ops question OPIC/recrawl tiers don't answer: given each
# host's arrival queue and a politeness budget of one fetch per D
# seconds, WHEN does each fetch actually run and how much does the
# queue wait?  The Lindley-style recurrence
#   start_k = max(arr_k, start_{k-1} + D)
# looks inherently sequential, but closes over a prefix maximum:
#   start_k = k·D + max_{j<=k}(arr_j − j·D)
# — one per-host window scan, no recursion, no UDF.  All carriers are
# integer seconds, so the schedule is exact at any partitioning.
#
# Scale shape: ONE host-keyed window (per-host partitions are
# queue-sized); per-host aggregation folds map-side.  At 10^12 pages
# this is the shape frontier schedulers actually use for capacity
# planning — the recurrence never leaves the host partition.

_POL_D_S = 7200  # politeness: one fetch per 2 h per host
_POL_HOST = "(doc_id % 97)"

_POLITE_SQL = f"""
WITH q AS (
  SELECT {_POL_HOST} AS host_num,
         ({epoch_sql('doc_id')} % 86400) AS arr,
         doc_id
  FROM documents
),
r AS (
  SELECT host_num, arr,
         CAST(ROW_NUMBER() OVER (PARTITION BY host_num
                                 ORDER BY arr, doc_id) AS BIGINT) AS k
  FROM q
),
s AS (
  SELECT host_num, arr, k,
         MAX(arr - k * {_POL_D_S}) OVER (
           PARTITION BY host_num ORDER BY k
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) + k * {_POL_D_S} AS start_s
  FROM r
)
SELECT host_num,
       CAST(COUNT(*) AS BIGINT) AS n_fetches,
       CAST(MAX(start_s) - MIN(arr) AS BIGINT) AS makespan_s,
       CAST(SUM(start_s - arr) AS BIGINT) AS total_wait_s,
       CAST(MAX(start_s - arr) AS BIGINT) AS max_wait_s
FROM s
GROUP BY 1
"""


@register("crawl_politeness_schedule", _POLITE_SQL)
def crawl_politeness_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host fetch schedule under a one-fetch-per-2 h politeness
    budget: the Lindley queueing recurrence closed into a prefix-max
    window (start_k = k·D + max prefix of arr_j − j·D), then makespan /
    wait statistics per host — integer-exact, one window scan."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_POLITE_SQL)


# --- Jensen–Shannon term-distribution drift between crawl epochs --------------
#
# The distribution-space drift check that complements the set-based
# shingle_novelty_by_epoch and the hash-based url_content_drift: JSD
# between each language's unigram distribution in the first half-year
# of crawl timestamps (epoch quarters 0–1) and the second (2–3).
# JSD = ½KL(P‖M)+½KL(Q‖M) with M=(P+Q)/2; substituting p=a/A, q=b/B
# gives per-term ratios 2aB/(aB+bA) and 2bA/(aB+bA) whose carriers are
# exact int64 products — LN enters once per (lang, term) under the
# ROUND-4 budget.  Bounded in [0, ln 2]; 0 = identical distributions.
#
# Scale shape: one token-count shuffle keyed (lang, term) with the
# epoch split folded into two conditional SUMs of the same agg (no
# second scan, no join of two epoch tables), then a language-bounded
# rollup.

_JSD_BODY = """
ct AS (
  SELECT lang, tok,
         CAST(SUM(CASE WHEN ep <= 1 THEN 1 ELSE 0 END) AS BIGINT) AS a,
         CAST(SUM(CASE WHEN ep >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS b
  FROM toks GROUP BY 1, 2
),
ct2 AS (
  SELECT lang, a, b,
         CAST(SUM(a) OVER (PARTITION BY lang) AS BIGINT) AS ta,
         CAST(SUM(b) OVER (PARTITION BY lang) AS BIGINT) AS tb
  FROM ct
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_terms,
       MIN(ta) AS tok_a, MIN(tb) AS tok_b,
       ROUND(SUM(
         CASE WHEN a > 0 THEN
           0.5 * (CAST(a AS DOUBLE) / ta)
               * LN(CAST(2 * a * tb AS DOUBLE)
                    / (a * tb + b * ta))
         ELSE 0.0 END
         +
         CASE WHEN b > 0 THEN
           0.5 * (CAST(b AS DOUBLE) / tb)
               * LN(CAST(2 * b * ta AS DOUBLE)
                    / (a * tb + b * ta))
         ELSE 0.0 END
       ), 4) AS jsd_nats
FROM ct2
GROUP BY 1
"""

_JSD_SPARK = f"""
WITH toks AS (
  SELECT lang, {_EPOCH_Q} AS ep, explode(split(text, ' ')) AS tok
  FROM documents
),
{_JSD_BODY.strip()}
"""

_JSD_ORACLE = f"""
WITH toks AS (
  SELECT lang, {_EPOCH_Q} AS ep, UNNEST(STRING_SPLIT(text, ' ')) AS tok
  FROM documents
),
{_JSD_BODY.strip()}
"""


@register("term_dist_jsd_epochs", _JSD_ORACLE)
def term_dist_jsd_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen–Shannon divergence (nats) between each language's
    unigram term distribution in crawl epochs 0–1 vs 2–3 — the
    distribution-drift alarm of a continuously refreshed corpus."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_JSD_SPARK)


# --- global motif census (wedges, 3-stars, triangles, transitivity) -----------
#
# The whole-graph summary over host_triangle_counts' fixture: wedge
# and 3-star counts come from degree combinatorics (sum C(d,2),
# sum C(d,3) — exact int64: the products are divisible by 2!/3! so the
# one double division is an exact integer), the triangle total from
# the same degree-ordered wedge join, and the global transitivity
# ratio 3T / wedges ties them together (Newman's clustering
# coefficient).  One degree agg + the oriented join — no new shuffle
# shapes; the census is the broadcast-sized tail of the triangle plan.

_MOTIF_SQL = f"""
WITH und AS (
  SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
  FROM (
    SELECT {_TRI_SRC} AS src, {_TRI_DST} AS dst
    FROM documents WHERE {_TRI_SRC} <> {_TRI_DST}
  ) raw
),
deg AS (
  SELECT node, CAST(COUNT(*) AS BIGINT) AS d
  FROM (SELECT u AS node FROM und UNION ALL SELECT v AS node FROM und) n
  GROUP BY node
),
ore AS (
  SELECT CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND u < v)
              THEN u ELSE v END AS s,
         CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND u < v)
              THEN v ELSE u END AS t
  FROM und
  JOIN deg d1 ON d1.node = u
  JOIN deg d2 ON d2.node = v
),
tri AS (
  SELECT COUNT(*) AS t3
  FROM ore e1
  JOIN ore e2 ON e2.s = e1.t
  JOIN ore e3 ON e3.s = e1.s AND e3.t = e2.t
),
moments AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
         CAST(SUM(d) AS BIGINT) AS deg_sum,
         CAST(SUM(CAST(d * (d - 1) / 2 AS BIGINT)) AS BIGINT) AS wedges,
         CAST(SUM(CAST(d * (d - 1) * (d - 2) / 6 AS BIGINT)) AS BIGINT)
           AS three_stars,
         CAST(MAX(d) AS BIGINT) AS max_degree
  FROM deg
)
SELECT m.n_nodes,
       CAST(m.deg_sum / 2 AS BIGINT) AS n_edges,
       m.max_degree, m.wedges, m.three_stars,
       CAST(tri.t3 AS BIGINT) AS triangles,
       -- CAST, not a 3.0 literal: Spark types `3.0` as DECIMAL and the
       -- whole ratio arrives as Decimal object (DuckDB: DOUBLE)
       ROUND(CAST(3 * tri.t3 AS DOUBLE) / m.wedges, 6) AS transitivity
FROM moments m CROSS JOIN tri
"""


@register("graph_motif_census", _MOTIF_SQL)
def graph_motif_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whole-graph motif census: wedges / 3-stars from degree
    combinatorics, triangle total from the degree-ordered join, global
    transitivity — the graph-health summary beside the per-host
    kernels."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    return spark.sql(_MOTIF_SQL)


# --- robots.txt WILDCARD rules (Google REP *, $, longest-match) ----------------
#
# The full Robots Exclusion Protocol matcher (RFC 9309 / Google REP)
# on top of the longest-prefix query above: `*` matches any span, `$`
# anchors the end, precedence = longest RULE TEXT, allow wins exact
# ties.  Patterns translate to SQL LIKE at plan build ('*'→'%', '$'
# dropped, unanchored patterns get a trailing '%') — evaluated as a
# broadcast nested-loop join with a cheap residual predicate, the
# right plan while the rule set is dimension-sized (every real
# robots.txt is).  For crawler-scale MERGED rule sets (10⁶ patterns
# across hosts) the scale path is an equi-join on (host, first literal
# path segment) before the LIKE residual — same SQL, one more join key.

_WC_RULES = (
    ("/s0/*", "deny"), ("/s0/*/p7*", "allow"),
    ("/*.php$", "deny"),
    ("/s2/t3/*", "deny"),
    ("/s4/", "deny"), ("/s4/*.html$", "allow"),
    ("/s5/t*", "deny"),
)


def _wc_like(pat: str) -> str:
    body = pat[:-1] if pat.endswith("$") else pat
    like = body.replace("*", "%")
    if not pat.endswith("$"):
        like += "%"
    return like


_WC_VALUES = ", ".join(
    f"('{p}', '{_wc_like(p)}', '{d}', {len(p)})" for p, d in _WC_RULES
)

_WC_PATH = (
    f"'/s' || {_SEG_A} || '/t' || {_SEG_B} || '/p' || (doc_id % 100)"
    " || CASE WHEN doc_id % 3 = 0 THEN '.html' ELSE '.php' END"
)

_WC_MATCH = f"""
docs AS (
  SELECT doc_id, lang, n_chars, {_WC_PATH} AS path FROM documents
),
liked AS (
  SELECT d.doc_id, r.decision,
         r.plen * 2 + CASE WHEN r.decision = 'allow' THEN 1 ELSE 0 END
           AS prec
  FROM docs d JOIN wrules r ON d.path LIKE r.like_pat
),
decided AS (
  SELECT doc_id, MAX_BY(decision, prec) AS decision
  FROM liked GROUP BY doc_id
)
SELECT COALESCE(m.decision, 'allow') AS decision, d.lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(d.n_chars) AS BIGINT) AS sum_chars
FROM docs d LEFT JOIN decided m ON d.doc_id = m.doc_id
GROUP BY 1, 2
"""

_WC_ORACLE = f"""
WITH wrules(pattern, like_pat, decision, plen) AS (VALUES {_WC_VALUES}),
{_WC_MATCH.strip()}
"""


@register("robots_wildcard_rules", _WC_ORACLE)
def robots_wildcard_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Google-REP wildcard robots matching (*, $, longest rule wins,
    allow breaks ties) as a broadcast LIKE join; per (decision, lang)
    page rollup with default allow."""
    load(spark, sf_dir, "documents").createOrReplaceTempView("documents")
    from chopin_spark.tables import values_df

    rules = values_df(
        spark,
        [(p, _wc_like(p), d, len(p)) for p, d in _WC_RULES],
        "pattern string, like_pat string, decision string, plen int",
    )
    F.broadcast(rules).createOrReplaceTempView("wrules")
    return spark.sql(f"WITH {_WC_MATCH.strip()}")
