"""Multimodal plumbing invariants: the 1→N frame fan-out loses no
bytes, and resize planning respects the box and aspect ratio."""

from __future__ import annotations

import pytest

from chopin_spark.multimodal import (
    attach_payload, extract_meta, frame_sample, thumbnail_dims,
)
from chopin_spark.tables import load

SF = "/root/testdata/sf0.001"


def test_frame_sample_every1_recombines_bytes(spark):
    """With every=1 the sampled frames ARE the payload: concatenating
    them in frame order must reproduce the original bytes exactly —
    byte identity through the Arrow fan-out stage."""
    docs = load(spark, SF, "documents").limit(50)
    with_payload = attach_payload(docs)
    frames = frame_sample(with_payload, every=1).toPandas()
    orig = {
        r["doc_id"]: bytes(r["payload"])
        for r in with_payload.select("doc_id", "payload").collect()
    }
    rebuilt = (
        frames.sort_values(["doc_id", "frame_idx"])
        .groupby("doc_id")["frame"]
        .apply(lambda s: b"".join(bytes(b) for b in s))
    )
    assert set(rebuilt.index) == set(orig)
    for k, v in rebuilt.items():
        assert v == orig[k]


def test_frame_sample_fanout_counts(spark):
    docs = load(spark, SF, "documents").limit(50)
    frames = frame_sample(attach_payload(docs), every=3).toPandas()
    lens = {
        r["doc_id"]: len(r["text"])
        for r in docs.select("doc_id", "text").collect()
    }
    counts = frames.groupby("doc_id").size()
    for k, n in lens.items():
        n_frames = (n + 127) // 128
        assert counts[k] == (n_frames + 2) // 3
    # only the trailing frame may be short
    tail = frames.sort_values("frame_idx").groupby("doc_id").tail(1)
    assert (frames.loc[~frames.index.isin(tail.index), "frame_len"] == 128).all()


def test_thumbnail_dims_bounds(spark):
    docs = load(spark, SF, "documents").limit(100)
    out = thumbnail_dims(extract_meta(attach_payload(docs))).toPandas()
    assert (out["out_w"] <= 128).all() and (out["out_h"] <= 128).all()
    assert (out["out_w"] >= 1).all() and (out["out_h"] >= 1).all()
    # aspect preserved: out ratios within one floor step of source
    import numpy as np

    s = np.minimum(128.0 / out["width"], 128.0 / out["height"])
    assert (out["out_w"] == np.maximum(np.floor(out["width"] * s), 1)).all()
    assert (out["out_h"] == np.maximum(np.floor(out["height"] * s), 1)).all()
    # at least one side hits the box (within the floor step)
    assert (
        (out["out_w"] >= 127) | (out["out_h"] >= 127)
    ).all()


def _bmp(w, h, pixels, top_down=False):
    """Build a real 24-bit BI_RGB BMP: pixels = [[(b,g,r)...] per row,
    top-down logical order]."""
    stride = (3 * w + 3) // 4 * 4
    rows = pixels if top_down else pixels[::-1]
    data = b"".join(
        b"".join(bytes(px) for px in row) + b"\x00" * (stride - 3 * w)
        for row in rows
    )
    hdr = (
        b"BM" + (54 + len(data)).to_bytes(4, "little") + b"\x00" * 4
        + (54).to_bytes(4, "little") + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little")
        + (h if not top_down else -h).to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little") + len(data).to_bytes(4, "little")
        + (2835).to_bytes(4, "little") * 2 + b"\x00" * 8
    )
    return hdr + data


def test_decode_bmp_known_pixels():
    """Hand-built 3x2 BMP: stride padding (3*3=9 -> 12) and bottom-up
    row order must both be honored — the decoded array is the logical
    top-down raster."""
    from chopin_spark.multimodal import decode_bmp, decode_image

    px = [
        [(1, 2, 3), (4, 5, 6), (7, 8, 9)],       # top row
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    img = decode_bmp(_bmp(3, 2, px))
    assert img.shape == (2, 3, 3)
    assert img.tolist() == [[list(p) for p in row] for row in px]
    assert decode_image(_bmp(3, 2, px)) == (3, 2)
    # negative height = top-down storage; same logical raster
    img_td = decode_bmp(_bmp(3, 2, px, top_down=True))
    assert img_td.tolist() == img.tolist()


def test_decode_bmp_rejects_non_bmp():
    from chopin_spark.multimodal import decode_bmp

    with pytest.raises(ValueError):
        decode_bmp(b"\x89PNG" + b"\x00" * 64)  # compressed formats: no codec
    with pytest.raises(ValueError):
        decode_bmp(b"BM" + b"\x00" * 10)  # truncated header


def test_image_stats_matches_numpy(spark):
    """image_stats through the Arrow stage == direct numpy decode."""
    import numpy as np

    from chopin_spark.multimodal import decode_bmp, image_stats

    px1 = [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (9, 9, 9)]]
    px2 = [[(1, 2, 3)]]
    payloads = [(0, _bmp(2, 2, px1)), (1, _bmp(1, 1, px2))]
    df = spark.createDataFrame(payloads, "doc_id long, payload binary")
    out = {r["doc_id"]: r for r in image_stats(df).collect()}
    for key, payload in payloads:
        img = decode_bmp(payload)
        flat = img.reshape(-1).astype("int64")
        r = out[key]
        assert (r["width"], r["height"]) == (img.shape[1], img.shape[0])
        assert r["sum_b"] == int(img[:, :, 0].sum())
        assert r["sum_g"] == int(img[:, :, 1].sum())
        assert r["sum_r"] == int(img[:, :, 2].sum())
        assert r["checksum"] == int(
            (flat * np.arange(1, flat.size + 1)).sum() % 1_000_000_007
        )


def test_image_dhash_gradient_pins_bits(spark):
    """dHash bit semantics on hand-built BMPs: a strict left-to-right
    luma ramp sets all 9 gradient bits, the reversed ramp sets none,
    and identical payloads always hash identically."""
    from chopin_spark.multimodal import image_dhash

    # 4x3 image, luma strictly increasing with column (B=G=R=10*c+5)
    inc = [[(10 * c + 5,) * 3 for c in range(4)] for _ in range(3)]
    dec = [[(10 * (3 - c) + 5,) * 3 for c in range(4)] for _ in range(3)]
    rows = [
        (1, bytearray(_bmp(4, 3, inc))),
        (2, bytearray(_bmp(4, 3, dec))),
        (3, bytearray(_bmp(4, 3, inc))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: (r.width, r.height, r.dhash)
           for r in image_dhash(df).collect()}
    assert got[1] == (4, 3, (1 << 9) - 1)   # all gradients positive
    assert got[2] == (4, 3, 0)              # all gradients negative
    assert got[3] == got[1]                 # exact dup -> same bucket
