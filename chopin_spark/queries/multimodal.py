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
