"""The north-rule input table: Common-Crawl-style web pages
``(url string, warc_ts timestamp, html binary, text string, lang string)``
(BASELINE.json input_hint), generated deterministically at any scale,
plus the geocode + enrichment pipeline that turns it into the engine's
spatial fact table.

Generation is distributed (spark.range → column expressions; html via
one vectorized pandas stage) — no driver materialization, so the same
code synthesizes 10^3 or 10^9 rows. Derived columns are added by
`enrich`; the payload columns (`html`, `text`) are NEVER touched by any
derivation — byte identity per url is asserted in tests/test_pages.py.

Geocode: a deterministic vectorized function of the url's host hash and
ccTLD (FIXTURES.md §1) — the stand-in for a real geocoder; the point is
the pipeline shape (pure column math → every derived column is
pushdown-friendly), not geographic truth.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark import EXTENT, sqlexpr as sx, zones as Z

CCTLDS = (
    "us", "de", "fr", "uk", "jp", "es", "it", "nl", "br", "in",
    "ca", "au", "ru", "kr", "mx", "se", "pl", "ch", "at", "be",
)
LANGS = ("en", "de", "fr", "en", "ja", "es", "it", "nl", "pt", "hi")

_WORDS = (
    "data table query join scan filter agg window merge batch row value "
    "part hash sort stream spark fast slow big small key line order the a"
).split()


# --- shared SQL builders for the deterministic URL recipe --------------------
#
# pagespipe.py / webtext.py derive the SAME url/host/ccTLD/epoch from a
# row id in portable SQL so DuckDB oracles recompute them.  ONE builder
# per part — duplicated literals would silently drift from synth_pages
# if a constant (69069, 99991, the ccTLD list, the epoch LCG) changed.


def cctld_sql(id_expr: str) -> str:
    """ccTLD of a row id — the CASE-chain twin of synth_pages' cctld."""
    return (
        f"CASE ({id_expr} * 2654435761) % {len(CCTLDS)}"
        + "".join(f" WHEN {i} THEN '{c}'" for i, c in enumerate(CCTLDS))
        + " END"
    )


def host_sql(id_expr: str) -> str:
    return (
        f"('h' || CAST(({id_expr} * 69069) % 99991 AS STRING)"
        f" || '.example.' || {cctld_sql(id_expr)})"
    )


def url_sql(id_expr: str) -> str:
    return (
        f"('https://' || {host_sql(id_expr)}"
        f" || '/p/' || CAST({id_expr} AS STRING))"
    )


def epoch_sql(id_expr: str) -> str:
    """Crawl timestamp seconds: 2024-01-01 + LCG within one year."""
    return f"(1704067200 + ({id_expr} * 48271) % 31536000)"


def lonlat_sql(fold_expr: str) -> tuple[str, str]:
    """Geocode-by-hash: host char-fold → two LCG draws → lon/lat in the
    CONUS window (S2 face 4 interior) — pagespipe's recipe, shared."""
    h = f"({fold_expr})"
    lon = (
        f"(-125.0 + 58.0 * (CAST(({h} * 2654435761) % 999983 AS DOUBLE)"
        f" / 999983.0))"
    )
    lat = (
        f"(25.0 + 16.0 * (CAST(({h} * 1103515245 + 12345) % 999983"
        f" AS DOUBLE) / 999983.0))"
    )
    return lon, lat


def synth_pages(spark: SparkSession, n: int, partitions: int = 32) -> DataFrame:
    """Deterministic pages table of n rows (seeded by row id only)."""
    df = spark.range(0, n, 1, numPartitions=partitions)
    h = F.col("id")
    cctld = F.element_at(
        F.array(*[F.lit(c) for c in CCTLDS]),
        (F.pmod(h * 2654435761, F.lit(len(CCTLDS)))).cast("int") + 1,
    )
    lang = F.element_at(
        F.array(*[F.lit(la) for la in LANGS]),
        (F.pmod(h * 40503, F.lit(len(LANGS)))).cast("int") + 1,
    )
    host = F.concat(F.lit("h"), F.pmod(h * 69069, F.lit(99991)).cast("string"))
    url = F.concat(
        F.lit("https://"), host, F.lit(".example."), cctld,
        F.lit("/p/"), F.col("id").cast("string"),
    )
    warc_ts = F.timestamp_seconds(
        F.lit(1704067200) + F.pmod(h * 48271, F.lit(31_536_000))
    )
    words = F.array(*[F.lit(w) for w in _WORDS])
    text = F.concat_ws(
        " ",
        F.transform(
            F.sequence(F.lit(1), (F.pmod(h, F.lit(40)) + F.lit(10)).cast("int")),
            lambda i: F.element_at(
                words,
                F.pmod(h * 7919 + i * 104729, F.lit(len(_WORDS))).cast("int")
                + 1,
            ),
        ),
    )
    html = F.encode(
        F.concat(F.lit("<html><body>"), text, F.lit("</body></html>")),
        "utf-8",
    )
    return df.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def geocode_cols(url: str = "url") -> tuple[Column, Column]:
    """Deterministic geocode url → (lon, lat) inside the working extent:
    a pure function of the url hash (xxhash64) — vectorized, JVM-side,
    stable across partitionings and resumes."""
    hx = F.pmod(F.xxhash64(F.col(url)), F.lit(1_000_003)).cast("double")
    hy = F.pmod(F.xxhash64(F.col(url), F.lit(1)), F.lit(1_000_003)).cast(
        "double"
    )
    lon = EXTENT[0] + (EXTENT[2] - EXTENT[0]) * hx / 1_000_003.0
    lat = EXTENT[1] + (EXTENT[3] - EXTENT[1]) * hy / 1_000_003.0
    return lon, lat


def enrich(pages: DataFrame, nx: int = 16, ny: int = 12) -> DataFrame:
    """The flagship pipeline stage: pages + (lon, lat, cgridid, hex_cell,
    quad_cell, zone_id). All derivations are column arithmetic on the
    url hash; `html`/`text` pass through untouched (byte-identity
    invariant)."""
    lon, lat = geocode_cols()
    out = pages.withColumn("lon", lon).withColumn("lat", lat)
    xs, ys = "lon", "lat"
    return (
        out.withColumn(
            "cgridid", F.expr(sx.grid_cell_expr(xs, ys, nx, ny))
        )
        .withColumn("hex_cell", F.expr(sx.hex_cell_expr(xs, ys, 40_000.0)))
        .withColumn("quad_cell", F.expr(sx.quad_cell_expr(xs, ys, 6)))
        .withColumn("zone_id", F.expr(Z.zone_id_expr(xs, ys)))
    )
