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
