"""Multimodal metadata query: binary payload → typed metadata via the
Arrow-batched mapInPandas pipeline, oracle-checked (fake decode is an
arithmetic function of byte length; sha256 is common to both engines)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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
