"""Semantic pins for the session-5 analytics batch (tsmine, mobility,
calibration, drift) — properties the DuckDB oracle parity cannot
express: range bounds, algebraic identities, monotonicity.
"""

from __future__ import annotations

import math

from conftest import SF_CORRECT


def _run(spark, name, sf=SF_CORRECT):
    from chopin_spark.queries import load_all

    fn, _ = load_all()[name]
    return fn(spark, sf).toPandas()


def test_acf_bounds_and_lags(spark):
    df = _run(spark, "acf_daily_volume")
    assert set(df.lag.unique()) == {1, 2, 3, 4, 5}
    # Cauchy–Schwarz: |r_k| <= 1 always
    assert (df.acf.abs() <= 1.0 + 1e-9).all()
    # every event type present at all 5 lags
    assert (df.groupby("event_type").size() == 5).all()


def test_sax_words_alphabet_and_count(spark):
    df = _run(spark, "sax_volume_motifs")
    assert df.word.str.len().eq(3).all()
    assert df.word.str.fullmatch("[abcd]{3}").all()
    # 10 PAA blocks -> 8 sliding words per type
    assert (df.groupby("event_type").n_occurrences.sum() == 8).all()


def test_burstiness_range(spark):
    df = _run(spark, "interevent_burstiness")
    # B = (sigma-mu)/(sigma+mu) with mu>0 ⇒ B in (-1, 1)
    assert (df.burstiness > -1.0).all() and (df.burstiness < 1.0).all()
    assert (df.mean_gap_s > 0).all()


def test_gyration_nonneg(spark):
    df = _run(spark, "radius_of_gyration_users")
    assert (df.rg_m >= 0).all()


def test_mobility_entropy_bounds(spark):
    df = _run(spark, "mobility_entropy_users")
    # 0 <= H <= ln(#distinct OD pairs)
    assert (df.transition_entropy >= -1e-9).all()
    ub = df.n_distinct_od.map(math.log)
    assert (df.transition_entropy <= ub + 1e-4).all()


def test_isotonic_monotone_and_mean_preserving(spark):
    df = _run(spark, "isotonic_calibration_qcls").sort_values("bin")
    d = df.iso_rate.diff().dropna()
    assert (d >= -1e-9).all(), "isotonic fit must be nondecreasing"
    # PAVA preserves the weighted mean of the rates
    assert abs(
        (df.iso_rate * df.n).sum() - df.pos.sum()
    ) <= 1e-2 * df.n.sum()


def test_jsd_bounds(spark):
    df = _run(spark, "term_dist_jsd_epochs")
    assert (df.jsd_nats >= -1e-9).all()
    assert (df.jsd_nats <= math.log(2) + 1e-9).all()


def test_stl_components_reconstruct(spark):
    df = _run(spark, "stl_decompose_volume")
    # additive identity: trend + seasonal + remainder == c (exact in
    # rationals; outputs carry three ROUND-4 grains)
    resid = (df.trend + df.seasonal + df.remainder - df.c).abs()
    assert resid.max() <= 2e-4
    # trend only on full 7-day windows
    assert df.d.min() == 4 and df.d.max() == 28


def test_kneser_ney_vs_add1_oov(spark):
    import pandas as pd

    kn = _run(spark, "kneser_ney_bigram_ppl").set_index("doc_id")
    a1 = _run(spark, "lm_perplexity_bigram").set_index("doc_id")
    # identical bigram streams: same held-out docs, same bigram counts
    assert kn.index.sort_values().equals(a1.index.sort_values())
    j = kn.join(a1, lsuffix="_kn", rsuffix="_a1")
    assert (j.n_bigrams_kn == j.n_bigrams_a1).all()
    assert (j.n_unseen == j.n_oov).all()


def test_geodesic_sanity_pins(spark):
    df = _run(spark, "geodesic_nearest_city")
    # all four anchors win somewhere over the CONUS window
    assert set(df.nearest_city.unique()) == {1, 2, 3, 4}
    # distances bounded by the window diagonal (~4700 km)
    assert (df.dist_km > 0).all() and (df.dist_km < 5000).all()


def test_kleinberg_burst_semantics(spark):
    df = _run(spark, "kleinberg_burst_volume", sf="/root/testdata/sf0.001")
    assert len(df) == 155  # 5 types x 31 days
    assert df.burst.sum() > 0, "tuned rates must fire on small-sample noise"
    # flag is exactly the strict cost comparison
    assert (df.burst == (df.cost_burst < df.cost_base).astype(int)).all()
    # bursts are CONTIGUOUS runs (the γ exit cost pools adjacent
    # days), and each maximal run's aggregate share beats the type's
    # base rate R/D — a single day inside a run may dip below it
    n_day = df.groupby("d").c.transform("sum")
    df = df.assign(n=n_day).sort_values(["event_type", "d"])
    for et, g in df.groupby("event_type"):
        rate = g.c.sum() / g.n.sum()
        run = (g.burst.diff().fillna(g.burst) != 0).cumsum()
        for _, r in g[g.burst == 1].groupby(run[g.burst == 1]):
            assert r.d.diff().dropna().eq(1).all(), "run must be contiguous"
            assert r.c.sum() / r.n.sum() > rate, (et, r.d.tolist())


def test_bradley_terry_identities(spark):
    import pandas as pd

    from chopin_spark.queries import load_all
    from chopin_spark.tables import load as load_t

    df = _run(spark, "bradley_terry_sources")
    # mean strength 1 (renormalized each MM round)
    assert abs(df.bt_strength.mean() - 1.0) < 1e-3
    # total wins across sources = number of cross-source pairs
    sizes = (
        load_t(spark, SF_CORRECT, "documents")
        .groupBy("source").count().toPandas().set_index("source")["count"]
    )
    n_pairs = (sizes.sum() ** 2 - (sizes ** 2).sum()) // 2
    assert df.n_wins.sum() == n_pairs
    # strength order consistent with win-count order (balanced design)
    assert (df.sort_values("n_wins").bt_strength.diff().dropna()
            >= -1e-9).all()
