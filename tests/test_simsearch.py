"""Similarity-search tests: brute-force exactness vs a numpy oracle and
LSH-bucket ANN recall."""

from __future__ import annotations

import numpy as np
import pytest

from chopin_spark.simsearch import ann_lsh_topk, cosine_topk
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    m = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, m


def test_cosine_topk_matches_numpy(spark, emb, emb_np):
    ids, m = emb_np
    q = m[ids == 0][0]
    cos = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    order = sorted(
        [(round(-c, 4), i) for c, i in zip(cos, ids) if i != 0]
    )[:10]
    want = [i for _, i in order]
    got = [
        r["vec_id"]
        for r in cosine_topk(emb, 0, 10).orderBy("rank").collect()
    ]
    assert got == want


@pytest.fixture(scope="module")
def clustered(spark):
    """Planted clusters: 20 centroids × 25 members with small
    deterministic noise — true neighbors have cosine ≈ 0.95+."""
    import pandas as pd

    rng = np.random.default_rng(9)
    cents = rng.normal(size=(20, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    rows = []
    vid = 0
    for c in range(20):
        for _ in range(25):
            v = cents[c] + rng.normal(scale=0.05, size=64)
            rows.append(
                {
                    "vec_id": vid,
                    "label": c,
                    "embedding": [float(x) for x in v],
                }
            )
            vid += 1
    return spark.createDataFrame(pd.DataFrame(rows)), rows


def test_ann_lsh_recall_on_clustered(spark, clustered):
    """Banded hyperplane LSH recovers the true top-10 on clustered data
    (true neighbors cos ≈0.95 → per-plane collision ≈0.9, any-of-4-bands
    match probability ≈1)."""
    df, rows = clustered
    m = np.array([r["embedding"] for r in rows])
    q = m[0]
    cos = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    true_top = {
        i
        for _, i in sorted(
            (round(-c, 4), r["vec_id"])
            for c, r in zip(cos, rows)
            if r["vec_id"] != 0
        )[:10]
    }
    got = {
        r["vec_id"]
        for r in ann_lsh_topk(df, 0, 10, n_planes=16, bands=8).collect()
    }
    assert len(got & true_top) >= 8


def test_ann_lsh_subset_of_exact_ranking(spark, emb, emb_np):
    """On near-orthogonal data ANN returns a valid exact-ranked subset
    of its candidates: scores must match brute force for returned ids."""
    ids, m = emb_np
    q = m[ids == 0][0]
    cos = (m @ q) / (np.linalg.norm(m, axis=1) * np.linalg.norm(q))
    by_id = {int(i): round(float(c), 4) for i, c in zip(ids, cos)}
    out = ann_lsh_topk(emb, 0, 10).collect()
    assert 0 < len(out) <= 10
    for r in out:
        assert r["cos_sim"] == pytest.approx(by_id[r["vec_id"]], abs=2e-4)
