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


# --- integer-exact k-means ---------------------------------------------------


def test_kmeans_matches_numpy_lattice(spark, emb, emb_np):
    """Replay the lattice-snapped Lloyd iterations in numpy and demand
    the identical assignment (the DuckDB oracle is a third
    implementation; this one pins the Spark path independently)."""
    from chopin_spark.kmeans import kmeans_assign

    ids, m = emb_np
    order = np.argsort(ids)
    ids, m = ids[order], m[order]
    q = np.floor(m * 1024 + 0.5).astype(np.int64)
    k, iters = 8, 3
    cent = q[ids < k].astype(np.int64)
    cids = ids[ids < k]
    for _ in range(iters):
        d2 = ((q[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        best = np.argmin(d2, axis=1)  # ties -> lowest index == lowest cid
        assign = cids[best]
        new_cent, new_cids = [], []
        for c in sorted(set(assign.tolist())):
            member = q[assign == c]
            new_cent.append(
                np.floor(member.sum(0) / len(member) + 0.5).astype(np.int64)
            )
            new_cids.append(c)
        cent, cids = np.array(new_cent), np.array(new_cids)
    got = {
        r["vec_id"]: r["cluster"]
        for r in kmeans_assign(
            spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
        ).collect()
    }
    want = dict(zip(ids.tolist(), assign.tolist()))
    assert got == want


def test_kmeans_partition_invariant(spark):
    """Same clustering at 1 and 16 input partitions — the determinism
    the docstring promises (exact integer arithmetic everywhere)."""
    from chopin_spark.kmeans import kmeans_assign

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    a = sorted(
        (r["vec_id"], r["cluster"])
        for r in kmeans_assign(emb.repartition(1)).collect()
    )
    b = sorted(
        (r["vec_id"], r["cluster"])
        for r in kmeans_assign(emb.repartition(16)).collect()
    )
    assert a == b and len(a) == emb.count()


def test_kmeans_seeds_from_present_ids(spark):
    """Offset id domains (filtered shards) must seed k real centroids —
    regression for the `vec_id < k` under-seeding bug."""
    from pyspark.sql import functions as F

    from chopin_spark.kmeans import kmeans_assign

    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
    base = {
        r["vec_id"]: r["cluster"] for r in kmeans_assign(emb).collect()
    }
    shifted = emb.withColumn("vec_id", F.col("vec_id") + 1000)
    got = {
        r["vec_id"] - 1000: r["cluster"] - 1000
        for r in kmeans_assign(shifted).collect()
    }
    assert got == base and len(set(base.values())) > 1


# --- LSH-banded near-dup pairs ----------------------------------------------


def test_near_dup_pairs_recall_on_clustered(spark, clustered):
    """Within one planted cluster every pair has cos ≈ 0.95+, so the
    4-band OR-construction catches nearly all of the 25·24/2 true
    pairs; and every returned pair's cosine must match numpy brute
    force (banding changes recall, never precision)."""
    from chopin_spark.simsearch import near_dup_pairs

    df, rows = clustered
    lbl0 = [r for r in rows if r["label"] == 0]
    m = np.array([r["embedding"] for r in lbl0])
    ids = np.array([r["vec_id"] for r in lbl0])
    n = m / np.linalg.norm(m, axis=1, keepdims=True)
    cos = n @ n.T
    true_pairs = {
        (int(ids[i]), int(ids[j]))
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if round(cos[i, j], 4) >= 0.8
    }
    got = near_dup_pairs(
        df.filter("label = 0"), min_cos=0.8, n_planes=16, bands=8
    ).collect()
    got_pairs = {(r["v1"], r["v2"]) for r in got}
    # precision: every emitted pair is a true pair with the exact score
    by_pair = {
        (int(ids[i]), int(ids[j])): round(float(cos[i, j]), 4)
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
    }
    for r in got:
        assert r["cos_sim"] == pytest.approx(
            by_pair[(r["v1"], r["v2"])], abs=2e-4
        )
    # recall: ≥ 90% of strong pairs survive the banding
    assert len(got_pairs & true_pairs) >= 0.9 * len(true_pairs)


def test_near_dup_pairs_plan_has_no_cartesian(spark, emb):
    """The VERDICT r02 fix: candidate generation must be a (band, bits)
    equi-join, never CartesianProduct / BroadcastNestedLoopJoin."""
    from chopin_spark.simsearch import near_dup_pairs

    plan = near_dup_pairs(
        emb.filter("label = 0"), min_cos=0.2
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_pca_top_component_matches_numpy_eigh(spark):
    """The integer power iteration must align with numpy's top
    eigenvector of the SAME quantized Gram (|cos| > 0.999) and its
    Rayleigh eigenvalue must sit within 1% of numpy's."""
    import numpy as np

    from chopin_spark.queries.simsearch import pca_top_component
    from chopin_spark.tables import load

    sf = "/root/testdata/sf0.01"
    rows = pca_top_component(spark, sf).collect()
    assert len(rows) == 64
    v = np.zeros(64)
    for r in rows:
        v[r.dim] = r.component
    lam = rows[0].eigenvalue

    emb = load(spark, sf, "embeddings").select("embedding").collect()
    Q = np.floor(np.array([r.embedding for r in emb], dtype=np.float64)
                 * 1024 + 0.5).astype(np.int64)
    G = (Q.T @ Q).astype(np.float64)
    w, U = np.linalg.eigh(G)
    top = U[:, -1]
    cos = abs(v @ top) / (np.linalg.norm(v) * np.linalg.norm(top))
    assert cos > 0.999, cos
    assert abs(lam - w[-1]) / w[-1] < 0.01, (lam, w[-1])
