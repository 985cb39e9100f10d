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


def decode_bmp(payload: bytes):
    """REAL image decode for uncompressed 24-bit BMP (BI_RGB) — numpy
    only, no codec library needed (mirrors the raw-PCM audio path).

    Parses the actual header fields (magic, pixel-data offset, width,
    height, bpp, compression), honors the 4-byte row stride padding and
    bottom-up row order, and returns an (h, w, 3) uint8 array in BGR
    channel order exactly as stored.  Anything that isn't an
    uncompressed 24-bit BMP raises ValueError — compressed formats
    (PNG/JPEG) still need a codec this container doesn't ship.
    """
    import numpy as np

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = int.from_bytes(payload[10:14], "little")
    w = int.from_bytes(payload[18:22], "little", signed=True)
    h = int.from_bytes(payload[22:26], "little", signed=True)
    bpp = int.from_bytes(payload[28:30], "little")
    compression = int.from_bytes(payload[30:34], "little")
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    top_down = h < 0
    h = abs(h)
    stride = ((3 * w + 3) // 4) * 4
    data = np.frombuffer(payload, dtype=np.uint8,
                         count=stride * h, offset=offset)
    rows = data.reshape(h, stride)[:, : 3 * w]
    if not top_down:
        rows = rows[::-1]  # BMP default is bottom-up
    return rows.reshape(h, w, 3).copy()


def decode_image(payload: bytes) -> tuple[int, int]:
    """Decoded (width, height).  Real for uncompressed BMP
    (:func:`decode_bmp`); compressed formats raise ValueError — plug
    PIL/libvips here on a cluster image with codecs installed."""
    img = decode_bmp(payload)
    return img.shape[1], img.shape[0]


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


_FOLD_P = 1_000_000_007


def _byte_fold(chunk: bytes) -> int:
    """31-based byte fold mod 1e9+7 — equals the engine's charfold for
    ASCII payloads, so frame hashes recompute in SQL."""
    h = 0
    for b in chunk:
        h = (h * 31 + b) % _FOLD_P
    return h


def frame_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_bytes: int = 128,
    every: int = 3,
) -> DataFrame:
    """Video-style frame sampling over an opaque binary column.

    The payload is treated as a concatenation of fixed-size frames
    (``frame_bytes`` each, trailing partial frame included); every
    ``every``-th frame is emitted as its own row with (frame_idx,
    frame_len, frame bytes, fold hash).  This is the 1→N mapInPandas
    batch shape a real video pipeline needs — per-input-row fan-out
    inside one Arrow stage, no explode shuffle, partitioning preserved.
    A real decoder replaces the byte slicing; everything else (schema,
    ordering, fan-out accounting) carries over unchanged."""
    schema = (
        f"{id_col} long, frame_idx int, frame_len int, "
        "frame binary, fhash long"
    )

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, lens, frames, hashes = [], [], [], [], []
            for key, payload in zip(pdf[id_col], pdf[payload_col]):
                n = len(payload)
                n_frames = (n + frame_bytes - 1) // frame_bytes
                for fi in range(0, n_frames, every):
                    chunk = payload[fi * frame_bytes : (fi + 1) * frame_bytes]
                    ids.append(key)
                    idxs.append(fi)
                    lens.append(len(chunk))
                    frames.append(chunk)
                    hashes.append(_byte_fold(chunk))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_len": pd.Series(lens, dtype="int32"),
                    "frame": frames,
                    "fhash": pd.Series(hashes, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(sample, schema)


def thumbnail_dims(
    meta: DataFrame, box_w: int = 128, box_h: int = 128
) -> DataFrame:
    """Aspect-preserving resize plan from decoded dimensions — pure
    column math over the metadata table (the decode-once/plan-cheap
    split: at 100 TB the resize *plan* is a projection over small
    metadata; only the actual pixel work touches payload bytes).
    out = floor(dim * min(box_w/w, box_h/h)), floored at 1 px."""
    s = F.least(
        F.lit(float(box_w)) / F.col("width"),
        F.lit(float(box_h)) / F.col("height"),
    )
    return meta.withColumn(
        "out_w", F.greatest(F.floor(F.col("width") * s), F.lit(1)).cast("int")
    ).withColumn(
        "out_h", F.greatest(F.floor(F.col("height") * s), F.lit(1)).cast("int")
    )


def image_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL image decode → per-image channel statistics.

    Each payload is parsed as an uncompressed 24-bit BMP
    (:func:`decode_bmp` — header fields, stride padding, bottom-up row
    order all honored), then reduced to integer-exact stats: decoded
    dimensions, per-channel byte sums, and an order-sensitive
    positional checksum Σ byte·(pos+1) mod 1e9+7 over the logical
    top-down, per-pixel B,G,R byte order (stride padding excluded).
    The checksum pins the full decoded raster, not just its marginals,
    and is SQL-expressible so the DuckDB oracle re-derives it from hex
    nibbles without any binary handling.

    Batch shape: one numpy decode per row inside mapInPandas — the
    pixel work is vectorized; a resize/feature stage appends as more
    numpy on the decoded array without touching the plan."""
    import numpy as np

    schema = (
        f"{id_col} long, width int, height int, n_px int,"
        " sum_b long, sum_g long, sum_r long, checksum long"
    )

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, npx, sb, sg, sr, ck = [], [], [], [], [], [], [], []
            for key, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_bmp(payload)  # (h, w, 3) uint8, BGR
                h, w = img.shape[:2]
                flat = img.reshape(-1).astype(np.int64)  # top-down BGR
                ids.append(key)
                ws.append(w)
                hs.append(h)
                npx.append(w * h)
                sb.append(int(img[:, :, 0].sum(dtype=np.int64)))
                sg.append(int(img[:, :, 1].sum(dtype=np.int64)))
                sr.append(int(img[:, :, 2].sum(dtype=np.int64)))
                ck.append(
                    int((flat * np.arange(1, flat.size + 1)).sum() % _FOLD_P)
                )
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "n_px": pd.Series(npx, dtype="int32"),
                    "sum_b": pd.Series(sb, dtype="int64"),
                    "sum_g": pd.Series(sg, dtype="int64"),
                    "sum_r": pd.Series(sr, dtype="int64"),
                    "checksum": pd.Series(ck, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(stats, schema)


def image_dhash(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    grid_w: int = 4,
    grid_h: int = 3,
) -> DataFrame:
    """Perceptual difference hash over REAL decoded BMPs — the image
    twin of the text LSH bucketing: decode (numpy, :func:`decode_bmp`),
    integer luma 29·B + 150·G + 77·R (exact int64, no float weights),
    nearest-neighbor sample onto a fixed grid_w × grid_h grid
    (sx = c·w // grid_w, sy = r·h // grid_h), horizontal gradient bits
    b(r,c) = [lum(r,c+1) > lum(r,c)] packed little-endian.  Returns
    (id, width, height, dhash).  Near-dup detection then buckets on
    (width, height, dhash) — an equi-join key, never pixel×pixel."""
    import numpy as np

    schema = f"{id_col} long, width int, height int, dhash long"

    def hashes(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, dh = [], [], [], []
            for key, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_bmp(payload)  # (h, w, 3) BGR uint8
                h, w = img.shape[:2]
                lum = (
                    29 * img[:, :, 0].astype(np.int64)
                    + 150 * img[:, :, 1].astype(np.int64)
                    + 77 * img[:, :, 2].astype(np.int64)
                )
                sy = [(r * h) // grid_h for r in range(grid_h)]
                sx = [(c * w) // grid_w for c in range(grid_w)]
                g = lum[np.ix_(sy, sx)]
                bits = g[:, 1:] > g[:, :-1]
                val = 0
                for r in range(grid_h):
                    for c in range(grid_w - 1):
                        if bits[r, c]:
                            val |= 1 << (r * (grid_w - 1) + c)
                ids.append(key)
                ws.append(w)
                hs.append(h)
                dh.append(val)
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "dhash": pd.Series(dh, dtype="int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(hashes, schema)


def audio_frame_rms(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    frame_samples: int = 8,
) -> DataFrame:
    """Audio framing over an opaque binary column with a REAL decode:
    the payload is 16-bit little-endian PCM (numpy ``frombuffer`` — no
    external codec needed), split into ``frame_samples``-sample frames
    (trailing partial frame included), each emitting integer-exact
    energy statistics (sum of squares, peak |amplitude|).

    Unlike the image path (decoder stubbed behind decode_image), this
    modality is decoded for real — raw PCM needs no library — so the
    whole chain payload → samples → frames → stats is value-checkable
    against a SQL oracle that re-derives the bytes.  Same 1→N
    mapInPandas fan-out shape as frame_sample; a resampler or codec
    drops into the numpy stage without touching the plan."""
    import numpy as np

    schema = (
        f"{id_col} long, frame_idx int, n_samples int, sum_sq long, peak int"
    )

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ns, ss, pk = [], [], [], [], []
            for key, payload in zip(pdf[id_col], pdf[payload_col]):
                arr = np.frombuffer(
                    payload[: len(payload) // 2 * 2], dtype="<i2"
                ).astype(np.int64)
                n_frames = max(
                    1, -(-len(arr) // frame_samples)
                ) if len(arr) else 0
                for fi in range(n_frames):
                    fr = arr[fi * frame_samples : (fi + 1) * frame_samples]
                    ids.append(key)
                    idxs.append(fi)
                    ns.append(len(fr))
                    ss.append(int((fr * fr).sum()))
                    pk.append(int(np.abs(fr).max()))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "n_samples": pd.Series(ns, dtype="int32"),
                    "sum_sq": pd.Series(ss, dtype="int64"),
                    "peak": pd.Series(pk, dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(frames, schema)


# boxes for image_box_stats: (top, left, bottom, right) inclusive in
# logical top-down coordinates; defined as fractions of (h, w) so the
# same spec works for any decoded size
IMAGE_BOXES = ("full", "left_half", "center")


def image_box_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Integral-image (summed-area table) box sums over REAL decoded
    BMPs — the O(1)-per-query region primitive behind Viola–Jones box
    features, thumbnail saliency crops, and tile-brightness heuristics.

    Per image: luminance carrier = B+G+R (int, no weights — keeps the
    oracle exact), SAT = cumsum along both axes, then each named box
    (full frame, left half, center with a 1-px margin) answers from 4
    SAT lookups.  Emits (id, box, n_px, box_sum) rows — integer-exact,
    so the DuckDB oracle can re-derive every box by direct conditional
    sums over hex nibbles (an independent, SAT-free formulation).

    Batch shape: one numpy decode + two cumsums per row inside
    mapInPandas; at fleet scale boxes are O(1) lookups per query
    regardless of box size — the reason to carry the SAT, not crops."""
    import numpy as np

    schema = f"{id_col} long, box string, n_px long, box_sum long"

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, boxes, npx, bsum = [], [], [], []
            for key, payload in zip(pdf[id_col], pdf[payload_col]):
                img = decode_bmp(payload).astype(np.int64)
                h, w = img.shape[:2]
                lum = img.sum(axis=2)
                sat = lum.cumsum(axis=0).cumsum(axis=1)

                def box_sum(t, l, b, r):
                    s = sat[b, r]
                    if t > 0:
                        s -= sat[t - 1, r]
                    if l > 0:
                        s -= sat[b, l - 1]
                    if t > 0 and l > 0:
                        s += sat[t - 1, l - 1]
                    return int(s)

                specs = {
                    "full": (0, 0, h - 1, w - 1),
                    "left_half": (0, 0, h - 1, w // 2 - 1),
                    "center": (1, 1, h - 2, w - 2),
                }
                for name in IMAGE_BOXES:
                    t, l, b, r = specs[name]
                    if b < t or r < l:  # degenerate for tiny frames
                        continue
                    ids.append(key)
                    boxes.append(name)
                    npx.append((b - t + 1) * (r - l + 1))
                    bsum.append(box_sum(t, l, b, r))
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype="int64"),
                    "box": boxes,
                    "n_px": pd.Series(npx, dtype="int64"),
                    "box_sum": pd.Series(bsum, dtype="int64"),
                }
            )

    return df.mapInPandas(stats, schema)
