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
