"""Multimodal payload plumbing: image/audio/video as opaque binary
columns with typed metadata (SURVEY.md input_hint: `html: binary`
payload semantics extended to media).

The Spark-side machinery is real — schema, partition-preserving
mapInPandas over Arrow batches, vectorized per-batch metadata
extraction. Actual media decoding is stubbed: the container has no
image/audio libs, so `decode_image` raises NotImplementedError unless a
decoder is importable, and the default pipeline uses a DETERMINISTIC
FAKE decode (dimensions derived from byte length) that keeps every
downstream contract testable. Payload bytes are pass-through: the
byte-identity invariant (sha256 per key unchanged) is asserted in
tests/test_multimodal.py.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def decode_image(payload: bytes) -> tuple[int, int]:
    """Real decoder hook — plug PIL/libvips here on a cluster image."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "container; the pipeline uses fake_dims() instead"
        ) from e
    raise NotImplementedError("real decode path intentionally unwired")


def fake_dims(n_bytes: int) -> tuple[int, int]:
    """Deterministic stand-in for decoded media dimensions."""
    return 64 + n_bytes % 512, 64 + (n_bytes * 7) % 512


def attach_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Opaque binary column from the text (stand-in for a stored media
    blob; byte-exact, reversible)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def extract_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas metadata extraction over Arrow batches: byte length,
    (fake-)decoded dimensions, content sha256. Batch shape: the UDF
    sees pandas Series of `bytes`; output is column-oriented (no per-row
    Python beyond the hash calls, which a real decoder replaces)."""
    schema = (
        f"{id_col} long, n_bytes long, width int, height int, sha256 string"
    )

    def meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[payload_col]
            n = payloads.str.len().astype("int64")
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "n_bytes": n,
                    "width": (64 + n % 512).astype("int32"),
                    "height": (64 + (n * 7) % 512).astype("int32"),
                    "sha256": [
                        hashlib.sha256(b).hexdigest() for b in payloads
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(meta, schema)
