"""Invariant tests for the round-3 curation/interpolation operators:
IDW surface evaluation, deterministic stratified sampling, and
concat-and-chunk sequence packing.  (Value parity vs DuckDB is covered
for all three by test_oracle_parity; these pin the semantics against
independent numpy replays and non-vacuity conditions.)"""

from __future__ import annotations

import numpy as np
import pytest

from chopin_spark import sqlexpr as sx
from tests.conftest import SF_CORRECT

P30 = 1_000_000_007


def _coords(ids: np.ndarray, mx: int, my: int):
    xmin, ymin, xmax, ymax = sx.EXTENT
    x = xmin + (xmax - xmin) * (((ids * sx._MX) % sx._MOD) / sx._MOD)
    y = ymin + (ymax - ymin) * (((ids * sx._MY + 12345) % sx._MOD) / sx._MOD)
    return x, y


def test_idw_matches_numpy_brute_force(spark):
    """Quantized IDW at every document vs an O(n·m) numpy replay —
    the cell-index range join must agree exactly (same quantization
    lattice) with the dense enumeration it replaces."""
    import duckdb

    from chopin_spark.queries.vector import (
        _IDW_D0, _IDW_RADIUS, idw_interpolation_poi,
    )

    rows = {
        r["doc_id"]: r
        for r in idw_interpolation_poi(spark, SF_CORRECT).collect()
    }
    docs = duckdb.sql(
        f"SELECT doc_id FROM '{SF_CORRECT}/documents.parquet'"
    ).df()["doc_id"].to_numpy()
    part = duckdb.sql(
        f"SELECT p_partkey, p_size FROM '{SF_CORRECT}/part.parquet'"
    ).df()
    dx, dy = _coords(docs, sx._MX, sx._MY)
    px, py = _coords(part["p_partkey"].to_numpy(), sx._MX, sx._MY)
    psize = part["p_size"].to_numpy().astype(np.int64)

    d = np.sqrt(
        (dx[:, None] - px[None, :]) ** 2 + (dy[:, None] - py[None, :]) ** 2
    )
    inb = d <= _IDW_RADIUS
    wq = np.floor(65536 / (1.0 + (d * d) / (_IDW_D0 * _IDW_D0)) + 0.5).astype(
        np.int64
    )
    n_checked = 0
    for i, did in enumerate(docs):
        m = inb[i]
        if not m.any():
            assert did not in rows  # inner-join semantics
            continue
        num = int((wq[i][m] * psize[m]).sum())
        den = int(wq[i][m].sum())
        r = rows[int(did)]
        assert r["n_within"] == int(m.sum())
        assert r["p_size_idw"] == pytest.approx(round(num / den, 4), abs=0)
        n_checked += 1
    assert n_checked > 0 and n_checked == len(rows)


def test_stratified_sample_rates_and_determinism(spark):
    """Kept fractions must land near the configured basis-point rates
    (law of large numbers at n≈500), the rule must actually fire
    (en strictly downsampled), and a re-run must keep the identical
    rows (fingerprint equality — determinism, not rand())."""
    from chopin_spark.queries.trainprep import (
        _RATE_BP, stratified_sample_by_lang,
    )

    a = {r["lang"]: r for r in stratified_sample_by_lang(spark, SF_CORRECT).collect()}
    b = {r["lang"]: r for r in stratified_sample_by_lang(spark, SF_CORRECT).collect()}
    assert set(a) == {"de", "en", "es", "fr", "zh"}
    for lang, r in a.items():
        rate = _RATE_BP.get(lang, 10000) / 10000.0
        assert 0 < r["n_kept"] <= r["n_total"]
        # ±3σ binomial envelope around the configured rate
        sigma = (rate * (1 - rate) / r["n_total"]) ** 0.5
        assert abs(r["kept_frac"] - rate) < max(3 * sigma, 0.01)
        assert b[lang]["kept_fp"] == r["kept_fp"]
        assert b[lang]["n_kept"] == r["n_kept"]
    assert a["en"]["n_kept"] < a["en"]["n_total"]  # rule fires


def test_pack_sequences_offsets_are_contiguous(spark):
    """Per shard: offsets sorted by doc_id must tile the token stream
    with no gaps/overlaps, window ids must follow from offsets, and at
    least one document must straddle a SEQ_LEN boundary (else the
    spanning arithmetic is untested)."""
    from chopin_spark.queries.trainprep import _SEQ_LEN, pack_sequences

    rows = pack_sequences(spark, SF_CORRECT).collect()
    by_shard: dict[int, list] = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    assert len(by_shard) > 1
    straddlers = 0
    for docs in by_shard.values():
        docs.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in docs:
            assert r["start_off"] == off
            assert r["first_seq"] == off // _SEQ_LEN
            want_span = (off + r["ntok"] - 1) // _SEQ_LEN - off // _SEQ_LEN + 1
            assert r["seqs_spanned"] == want_span
            straddlers += want_span > 1
            off += r["ntok"]
    assert straddlers > 0


def test_quality_classifier_threshold_fires(spark):
    """Model-based filtering must be non-vacuous (both classes occur),
    scores must equal the numpy replay of the hashed linear model, and
    the keep flag must follow the threshold."""
    from chopin_spark.queries.textops import (
        _QC_BUCKETS, quality_classifier_scores,
    )

    rows = quality_classifier_scores(spark, SF_CORRECT).collect()
    assert len(rows) == 500
    kept = sum(r["kept"] for r in rows)
    assert 0 < kept < len(rows)  # threshold separates, not degenerate
    P30 = 1_000_000_007
    for r in rows[:50]:
        assert r["kept"] == (1 if r["w_sum"] > 0 else 0)
        assert r["q_score"] == pytest.approx(
            round(r["w_sum"] / r["n_tok"], 4), abs=0
        )
    # replay one document's score end-to-end from raw text
    import duckdb

    doc = duckdb.sql(
        f"SELECT doc_id, text FROM '{SF_CORRECT}/documents.parquet' LIMIT 1"
    ).fetchone()
    want = 0
    for tok in doc[1].split(" "):
        h = 0
        for ch in tok:
            h = (h * 31 + ord(ch)) % P30
        want += ((h % _QC_BUCKETS) * 2654435761) % 1999 - 999
    got = next(r for r in rows if r["doc_id"] == doc[0])
    assert got["w_sum"] == want


def test_moran_i_matches_numpy(spark):
    """Moran's I vs a dense numpy replay (true-mean deviations): the
    n·x−S integer identity must reproduce the textbook statistic to
    float precision, and the page surface must be non-degenerate."""
    import duckdb

    from chopin_spark.queries.spatial import moran_i_tracts
    from chopin_spark.zones import TRACT_H, TRACT_NX, TRACT_NY, TRACT_W

    r = moran_i_tracts(spark, SF_CORRECT).collect()[0]
    assert r["n_zones"] == 256
    # 15×16 interior edges per orientation, 2 orientations, 2 directions
    assert r["w_links"] == 2 * 2 * 15 * 16  # = 960 directed links
    docs = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '{SF_CORRECT}/documents.parquet'"
    ).df()
    ids = docs["doc_id"].to_numpy()
    x, y = _coords(ids, sx._MX, sx._MY)
    gx = np.floor(x / TRACT_W).astype(int)
    gy = np.floor(y / TRACT_H).astype(int)
    z = np.zeros((TRACT_NX, TRACT_NY), dtype=np.int64)
    np.add.at(z, (gx, gy), docs["n_chars"].to_numpy().astype(np.int64))
    d = z - z.mean()
    num = (d[1:, :] * d[:-1, :]).sum() * 2 + (d[:, 1:] * d[:, :-1]).sum() * 2
    den = (d * d).sum()
    want = (256 / 960) * num / den
    assert r["moran_i"] == pytest.approx(round(want, 6), abs=1e-6)
    assert den > 0


def test_getis_ord_matches_numpy(spark):
    """Gi* z-scores vs the textbook formula on a dense numpy surface —
    edge/corner tracts exercise the variable W_i path; hot and cold
    tracts must both occur (|z| > 1 somewhere in both signs at this
    fixture, else the statistic is degenerate)."""
    import duckdb

    from chopin_spark.queries.spatial import getis_ord_hotspots
    from chopin_spark.zones import TRACT_H, TRACT_NX, TRACT_NY, TRACT_W

    rows = getis_ord_hotspots(spark, SF_CORRECT).collect()
    assert len(rows) == 256
    docs = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '{SF_CORRECT}/documents.parquet'"
    ).df()
    ids = docs["doc_id"].to_numpy()
    x, y = _coords(ids, sx._MX, sx._MY)
    gx = np.floor(x / TRACT_W).astype(int)
    gy = np.floor(y / TRACT_H).astype(int)
    z = np.zeros((TRACT_NX, TRACT_NY), dtype=np.float64)
    np.add.at(z, (gx, gy), docs["n_chars"].to_numpy().astype(np.float64))
    n = 256
    xbar, s2 = z.mean(), (z * z).mean() - z.mean() ** 2
    S = np.sqrt(s2)
    for r in rows:
        i, j = r["gx"], r["gy"]
        nsum, w = z[i, j], 1
        for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            if 0 <= i + di < TRACT_NX and 0 <= j + dj < TRACT_NY:
                nsum += z[i + di, j + dj]
                w += 1
        assert r["w_i"] == w
        want = (nsum - xbar * w) / (S * np.sqrt((n * w - w * w) / (n - 1)))
        assert r["gi_z"] == pytest.approx(round(float(want), 6), abs=1e-6)
    zs = [r["gi_z"] for r in rows]
    assert max(zs) > 1.0 and min(zs) < -1.0


def test_lisa_matches_numpy(spark):
    """Local Moran I_i vs the textbook per-zone formula; quadrant
    labels must follow the deviation signs, and all four quadrants
    should occur on this fixture."""
    import duckdb

    from chopin_spark.queries.spatial import lisa_local_moran
    from chopin_spark.zones import TRACT_H, TRACT_NX, TRACT_NY, TRACT_W

    rows = lisa_local_moran(spark, SF_CORRECT).collect()
    assert len(rows) == 256
    docs = duckdb.sql(
        f"SELECT doc_id, n_chars FROM '{SF_CORRECT}/documents.parquet'"
    ).df()
    ids = docs["doc_id"].to_numpy()
    x, y = _coords(ids, sx._MX, sx._MY)
    gx = np.floor(x / TRACT_W).astype(int)
    gy = np.floor(y / TRACT_H).astype(int)
    z = np.zeros((TRACT_NX, TRACT_NY), dtype=np.float64)
    np.add.at(z, (gx, gy), docs["n_chars"].to_numpy().astype(np.float64))
    d = z - z.mean()
    m2 = (d * d).mean()
    quads = set()
    for r in rows:
        i, j = r["gx"], r["gy"]
        nsum = 0.0
        for di, dj in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            if 0 <= i + di < TRACT_NX and 0 <= j + dj < TRACT_NY:
                nsum += d[i + di, j + dj]
        # I_i = d_i · Σ_nb d_j / m2  (m2 = Σd²/n, population)
        want = d[i, j] * nsum / m2
        assert r["lisa_i"] == pytest.approx(round(float(want), 6), abs=1e-6)
        want_q = (
            "HH" if d[i, j] >= 0 and nsum >= 0
            else "LL" if d[i, j] < 0 and nsum < 0
            else "HL" if d[i, j] >= 0
            else "LH"
        )
        assert r["quadrant"] == want_q
        quads.add(r["quadrant"])
    assert quads == {"HH", "LL", "HL", "LH"}
