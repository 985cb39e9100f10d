"""Independent pure-Python replays for shared-body-oracle queries.

Several registered queries run ONE shared SQL text in both engines
(COVERAGE.md "identical shared body"), so the oracle gate proves
engine parity but not the estimator semantics.  These tests close
that class: each collects the minimal raw fixture columns, re-derives
the full statistic with plain Python (dicts, math, sorting — no SQL,
no windows), and compares row-for-row.  Integer outputs must match
exactly; ROUND()ed doubles must sit within half an output grain of
the unrounded Python value (the rounding convention itself is pinned
cross-engine by the oracle gate).
"""

from __future__ import annotations

import collections
import math

from tests.conftest import SF_CORRECT


def _close(spark_rounded, py_unrounded, grain):
    return abs(py_unrounded - spark_rounded) <= grain / 2 + 1e-9


def test_cusum_changepoint_replay(spark):
    """CUSUM argmax day per event type: integer n*S_k = n*pref - k*tot
    replayed with a plain running sum — no window functions."""
    from chopin_spark.queries.temporalq import cusum_volume_changepoint
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    daily = collections.Counter()
    for r in spark.sql(
        "SELECT event_type, CAST(day(ts) AS BIGINT) AS d FROM events"
        " WHERE month(ts) = 1"
    ).collect():
        daily[(r.event_type, r.d)] += 1

    expect = {}
    for et in {k[0] for k in daily}:
        days = sorted(d for (e, d) in daily if e == et)
        tot = sum(daily[(et, d)] for d in days)
        nd = len(days)
        pref = 0
        best = None
        for k, d in enumerate(days, start=1):
            pref += daily[(et, d)]
            stat = abs(nd * pref - k * tot)
            if best is None or stat > best[0] or (stat == best[0] and d < best[1]):
                best = (stat, d)
        expect[et] = (best[1], best[0])

    got = {
        r.event_type: (r.changepoint_day, r.n_cusum)
        for r in cusum_volume_changepoint(spark, SF_CORRECT).collect()
    }
    assert got == expect and len(got) >= 3


def test_trimmed_mean_replay(spark):
    """5%-trimmed mean per language: rank thresholds rn*20 > n and
    rn*20 <= 19n replayed by slicing an explicitly sorted list."""
    from chopin_spark.queries.relational import trimmed_mean_chars_by_lang
    from chopin_spark.tables import load

    docs = load(spark, SF_CORRECT, "documents")
    by_lang = collections.defaultdict(list)
    for r in docs.select("lang", "n_chars", "doc_id").collect():
        by_lang[r.lang].append((r.n_chars, r.doc_id))

    got = {
        r.lang: r
        for r in trimmed_mean_chars_by_lang(spark, SF_CORRECT).collect()
    }
    assert set(got) == set(by_lang)
    for lang, vals in by_lang.items():
        vals.sort()
        n = len(vals)
        kept = [c for rn, (c, _) in enumerate(vals, start=1)
                if rn * 20 > n and rn * 20 <= 19 * n]
        row = got[lang]
        assert row.n_total == n and row.n_kept == len(kept)
        assert _close(row.trimmed_mean, sum(kept) / len(kept), 1e-4)


def test_benford_replay(spark):
    """Benford digit counts and chi-square contributions: first
    significant digit taken from the decimal string of exact cents —
    independent of the SQL halving chain."""
    from chopin_spark.queries.relational import benford_price_audit
    from chopin_spark.tables import load

    li = load(spark, SF_CORRECT, "lineitem")
    cnt = collections.Counter()
    for r in li.select("l_extendedprice").collect():
        cents = int(math.floor(float(r.l_extendedprice) * 100 + 0.5))
        cnt[int(str(cents)[0])] += 1
    n = sum(cnt.values())
    logs = {d: math.log10(1 + 1 / d) for d in range(1, 10)}

    rows = benford_price_audit(spark, SF_CORRECT).collect()
    assert {r.digit for r in rows} == set(cnt)
    for r in rows:
        e = n * logs[r.digit]
        assert r.n_obs == cnt[r.digit]
        assert _close(r.n_expected, e, 1e-4)
        assert _close(r.chi2_contrib, (r.n_obs - e) ** 2 / e, 1e-6)


def test_radius_of_gyration_replay(spark):
    """n²r² = n·Σ(x²+y²) − Sx² − Sy² replayed directly from the raw
    coordinate doubles with plain integer accumulators."""
    from chopin_spark.queries.temporalq import (
        _TCX,
        _TCY,
        radius_of_gyration_users,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    acc = collections.defaultdict(lambda: [0, 0, 0, 0])  # n, sx, sy, s2
    for r in spark.sql(
        f"SELECT user_id, {_TCX} AS x, {_TCY} AS y FROM events"
    ).collect():
        xm = int(math.floor(r.x + 0.5))
        ym = int(math.floor(r.y + 0.5))
        a = acc[r.user_id]
        a[0] += 1
        a[1] += xm
        a[2] += ym
        a[3] += xm * xm + ym * ym

    got = {r.user_id: r for r in
           radius_of_gyration_users(spark, SF_CORRECT).collect()}
    expect_users = {u for u, a in acc.items() if a[0] >= 2}
    assert set(got) == expect_users and len(expect_users) >= 10
    for u in expect_users:
        n, sx, sy, s2 = acc[u]
        rg = math.sqrt(n * s2 - sx * sx - sy * sy) / n
        assert got[u].n_pings == n
        assert _close(got[u].rg_m, rg, 1e-2)


def test_mobility_entropy_replay(spark):
    """First-order transition entropy per user: the LAG-over-ordered-
    events OD counting replayed with an explicit per-user sort, then
    H = ln(tot) − Σc·ln(c)/tot."""
    from chopin_spark.queries.temporalq import (
        _TCELL,
        mobility_entropy_users,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    traj = collections.defaultdict(list)
    for r in spark.sql(
        f"SELECT user_id, ts, event_id, {_TCELL} AS cell FROM events"
    ).collect():
        traj[r.user_id].append((r.ts, r.event_id, r.cell))

    got = {r.user_id: r for r in
           mobility_entropy_users(spark, SF_CORRECT).collect()}
    expect_users = {u for u, t in traj.items() if len(t) >= 2}
    assert set(got) == expect_users and len(expect_users) >= 10
    for u in expect_users:
        seq = [c for _, _, c in sorted(traj[u])]
        od = collections.Counter(zip(seq, seq[1:]))
        tot = sum(od.values())
        s = sum(c * math.log(c) for c in od.values())
        h = math.log(tot) - s / tot
        row = got[u]
        assert row.n_moves == tot and row.n_distinct_od == len(od)
        assert _close(row.transition_entropy, h, 1e-4)
