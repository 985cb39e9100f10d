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


def test_acf_replay(spark):
    """Lag-1..5 autocorrelation with n-scaled centering replayed over
    an explicitly densified 31-day calendar."""
    from chopin_spark.queries.tsmine import acf_daily_volume
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    daily = collections.Counter()
    for r in spark.sql(
        "SELECT event_type, CAST(day(ts) AS BIGINT) AS d FROM events"
        " WHERE month(ts) = 1"
    ).collect():
        daily[(r.event_type, r.d)] += 1

    types = {k[0] for k in daily}
    got = {}
    for r in acf_daily_volume(spark, SF_CORRECT).collect():
        got[(r.event_type, r.lag)] = (r.num_scaled, r.acf)
    assert {k[0] for k in got} == types and len(got) == 5 * len(types)
    for et in types:
        c = [daily.get((et, d), 0) for d in range(1, 32)]
        n, s = 31, sum(c)
        z = [n * v - s for v in c]
        den = sum(v * v for v in z)
        for k in range(1, 6):
            num = sum(z[t] * z[t + k] for t in range(31 - k))
            assert got[(et, k)][0] == num
            assert _close(got[(et, k)][1], num / den, 1e-6)


def test_hill_replay(spark):
    """Hill power-law exponent replayed from raw in-degree counts."""
    from chopin_spark.queries.graphq import (
        _EDGES,
        _HILL_DMIN,
        degree_powerlaw_hill,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    deg = collections.Counter()
    for r in spark.sql(f"SELECT * FROM {_EDGES}").collect():
        deg[r.dst] += 1
    tail = [d for d in deg.values() if d >= _HILL_DMIN]
    alpha = 1 + len(tail) / sum(math.log(d / _HILL_DMIN) for d in tail)

    row = degree_powerlaw_hill(spark, SF_CORRECT).collect()[0]
    assert row.n_tail == len(tail) >= 3
    assert row.d_min == min(tail) and row.d_max == max(tail)
    assert _close(row.alpha, alpha, 1e-4)


def test_did_replay(spark):
    """Difference-in-differences cell means replayed with exact cents
    accumulators and the fixed-order four-mean chain."""
    from chopin_spark.queries.temporalq import did_purchase_effect
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    cells = collections.defaultdict(lambda: [0, 0])  # cents, n
    for r in spark.sql(
        "SELECT user_id, CAST(day(ts) AS BIGINT) AS d, value FROM events"
        " WHERE event_type = 'purchase' AND month(ts) = 1"
    ).collect():
        key = (1 if r.user_id % 2 == 0 else 0, 1 if r.d >= 16 else 0)
        cells[key][0] += int(math.floor(float(r.value) * 100 + 0.5))
        cells[key][1] += 1
    mean = {k: v[0] / v[1] / 100.0 for k, v in cells.items()}

    row = did_purchase_effect(spark, SF_CORRECT).collect()[0]
    assert (row.n_treat_post, row.n_treat_pre, row.n_ctrl_post,
            row.n_ctrl_pre) == (cells[(1, 1)][1], cells[(1, 0)][1],
                                cells[(0, 1)][1], cells[(0, 0)][1])
    for col, key in (("treat_post", (1, 1)), ("treat_pre", (1, 0)),
                     ("ctrl_post", (0, 1)), ("ctrl_pre", (0, 0))):
        assert _close(getattr(row, col), mean[key], 1e-6)
    did = mean[(1, 1)] - mean[(1, 0)] - mean[(0, 1)] + mean[(0, 0)]
    assert _close(row.did_effect, did, 1e-6)


def test_label_propagation_replay(spark):
    """Three synchronous LPA rounds replayed sequentially: majority
    label among labeled neighbors, ties to the smaller class, seeds
    pinned, no labeled neighbor this round means unlabeled."""
    from chopin_spark.queries.graphq import (
        _EDGES,
        _SEED_MOD,
        label_propagation_hosts,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    adj = collections.defaultdict(set)
    for r in spark.sql(f"SELECT * FROM {_EDGES}").collect():
        adj[r.src].add(r.dst)
        adj[r.dst].add(r.src)
    nodes = set(adj)
    lbl = {v: (v % 3 if v % _SEED_MOD == 0 else None) for v in nodes}
    for _ in range(3):
        nxt = {}
        for v in nodes:
            if v % _SEED_MOD == 0:
                nxt[v] = v % 3
                continue
            cnt = collections.Counter(
                lbl[u] for u in adj[v] if lbl[u] is not None
            )
            nxt[v] = (min((-c, l) for l, c in cnt.items())[1]
                      if cnt else None)
        lbl = nxt

    got = {r.host_num: r.label
           for r in label_propagation_hosts(spark, SF_CORRECT).collect()}
    expect = {v: (l if l is not None else -1) for v, l in lbl.items()}
    assert got == expect
    assert len({v for v, l in expect.items() if l >= 0}) > len(nodes) // 2


def test_funnel_replay(spark):
    """Ordered view→signup→purchase funnel replayed with per-user
    first-timestamp chains over the raw event list."""
    from chopin_spark.queries.temporalq import funnel_view_signup_purchase
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    ev = collections.defaultdict(list)
    users = set()
    for r in spark.sql(
        "SELECT user_id, event_type, ts FROM events"
    ).collect():
        users.add(r.user_id)
        ev[(r.user_id, r.event_type)].append(r.ts)

    t1 = {u: min(ev[(u, "view")]) for u in users if (u, "view") in ev}
    t2 = {}
    for u, t in t1.items():
        later = [x for x in ev.get((u, "signup"), []) if x > t]
        if later:
            t2[u] = min(later)
    t3 = {}
    for u, t in t2.items():
        later = [x for x in ev.get((u, "purchase"), []) if x > t]
        if later:
            t3[u] = min(later)

    row = funnel_view_signup_purchase(spark, SF_CORRECT).collect()[0]
    assert (row.n_users, row.n_view, row.n_view_signup, row.n_full_funnel) \
        == (len(users), len(t1), len(t2), len(t3))
    assert _close(row.conv_signup, len(t2) / len(t1), 1e-4)
    assert _close(row.conv_purchase, len(t3) / len(t2), 1e-4)


def test_cohort_retention_replay(spark):
    """Purchase-cohort retention triangle replayed from per-user first
    purchase day and distinct activity days."""
    from chopin_spark.queries.temporalq import cohort_retention
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    first = {}
    active = collections.defaultdict(set)
    for r in spark.sql(
        "SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day"
        " FROM events WHERE event_type = 'purchase'"
    ).collect():
        d = str(r.day)
        first[r.user_id] = min(first.get(r.user_id, d), d)
        active[r.user_id].add(d)

    size = collections.Counter(first.values())
    cell = collections.Counter()
    for u, cd in first.items():
        for d in active[u]:
            cell[(cd, d)] += 1

    rows = cohort_retention(spark, SF_CORRECT).collect()
    assert {(r.cohort_day, r.day) for r in rows} == set(cell)
    for r in rows:
        assert r.n_active == cell[(r.cohort_day, r.day)]
        assert r.cohort_size == size[r.cohort_day]
        assert _close(r.retention, r.n_active / r.cohort_size, 1e-4)


def test_bearing_coherence_replay(spark):
    """Mean resultant length per user replayed with an explicit sort
    and unit-vector accumulation."""
    from chopin_spark.queries.temporalq import (
        _TCX,
        _TCY,
        trajectory_bearing_coherence,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    traj = collections.defaultdict(list)
    for r in spark.sql(
        f"SELECT user_id, ts, event_id, {_TCX} AS x, {_TCY} AS y"
        " FROM events"
    ).collect():
        traj[r.user_id].append((r.ts, r.event_id, r.x, r.y))

    expect = {}
    for u, pts in traj.items():
        pts.sort(key=lambda p: (p[0], p[1]))
        sx = sy = 0.0
        n = 0
        for (_, _, x0, y0), (_, _, x1, y1) in zip(pts, pts[1:]):
            dx, dy = x1 - x0, y1 - y0
            if dx == 0.0 and dy == 0.0:
                continue
            ln = math.sqrt(dx * dx + dy * dy)
            sx += dx / ln
            sy += dy / ln
            n += 1
        if n:
            expect[u] = (n, math.sqrt(sx * sx + sy * sy) / n)

    got = {r.user_id: r for r in
           trajectory_bearing_coherence(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect) and len(expect) >= 10
    for u, (n, rr) in expect.items():
        assert got[u].n_steps == n
        assert _close(got[u].resultant_r, rr, 1e-6)


def test_k_anonymity_replay(spark):
    """Equivalence-class k-band audit replayed from raw quasi-
    identifier tuples."""
    from chopin_spark.queries.privacyq import _KA_CELL, k_anonymity_audit
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    cls = collections.Counter()
    for r in spark.sql(
        f"SELECT event_type, CAST(day(ts) AS BIGINT) AS d, {_KA_CELL} AS cell"
        " FROM events WHERE month(ts) = 1"
    ).collect():
        cls[(r.event_type, r.d, r.cell)] += 1

    def band(k):
        return ("k=1" if k == 1 else "k=2-4" if k < 5
                else "k=5-19" if k < 20 else "k>=20")

    n = sum(cls.values())
    bands = collections.defaultdict(lambda: [0, 0])
    for k in cls.values():
        b = bands[band(k)]
        b[0] += 1
        b[1] += k

    rows = k_anonymity_audit(spark, SF_CORRECT).collect()
    assert {r.k_band for r in rows} == set(bands) and len(bands) >= 2
    for r in rows:
        nc, nr = bands[r.k_band]
        assert (r.n_classes, r.n_rows) == (nc, nr)
        assert _close(r.row_share, nr / n, 1e-6)


def test_stl_replay(spark):
    """Additive 7-day decomposition replayed with explicit centred
    window sums and day-of-week seasonal means."""
    from chopin_spark.queries.tsmine import stl_decompose_volume
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    daily = collections.Counter()
    for r in spark.sql(
        "SELECT event_type, CAST(day(ts) AS BIGINT) AS d FROM events"
        " WHERE month(ts) = 1"
    ).collect():
        daily[(r.event_type, r.d)] += 1

    types = {k[0] for k in daily}
    expect = {}
    for et in types:
        c = {d: daily.get((et, d), 0) for d in range(1, 32)}
        det = {d: (c[d], sum(c[x] for x in range(d - 3, d + 4)))
               for d in range(4, 29)}  # full 7-day windows only
        dow = collections.defaultdict(lambda: [0, 0])  # snum, sden
        for d, (cd, t7) in det.items():
            acc = dow[d % 7]
            acc[0] += 7 * cd - t7
            acc[1] += 1
        for d, (cd, t7) in det.items():
            snum, sden = dow[d % 7]
            det7 = 7 * cd - t7
            expect[(et, d)] = (
                cd, t7 / 7, snum / (7 * sden),
                (sden * det7 - snum) / (7 * sden),
            )

    rows = stl_decompose_volume(spark, SF_CORRECT).collect()
    assert {(r.event_type, r.d) for r in rows} == set(expect)
    for r in rows:
        cd, trend, seas, rem = expect[(r.event_type, r.d)]
        assert r.c == cd
        assert _close(r.trend, trend, 1e-4)
        assert _close(r.seasonal, seas, 1e-4)
        assert _close(r.remainder, rem, 1e-4)


def test_sax_replay(spark):
    """SAX words replayed with explicit PAA block sums and NTILE(4)
    tile sizing (3,3,2,2 over the ten 3-day blocks)."""
    from chopin_spark.queries.tsmine import sax_volume_motifs
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    daily = collections.Counter()
    for r in spark.sql(
        "SELECT event_type, CAST(day(ts) AS BIGINT) AS d FROM events"
        " WHERE month(ts) = 1 AND day(ts) <= 30"
    ).collect():
        daily[(r.event_type, r.d)] += 1

    expect = collections.Counter()
    for et in {k[0] for k in daily}:
        blocks = [sum(daily.get((et, d), 0) for d in range(b * 3 + 1, b * 3 + 4))
                  for b in range(10)]
        order = sorted(range(10), key=lambda b: (blocks[b], b))
        n, k = 10, 4
        sym = {}
        pos = 0
        for tile in range(k):
            size = n // k + (1 if tile < n % k else 0)
            for b in order[pos:pos + size]:
                sym[b] = "abcd"[tile]
            pos += size
        for b in range(8):
            expect[(et, sym[b] + sym[b + 1] + sym[b + 2])] += 1

    got = {(r.event_type, r.word): r.n_occurrences
           for r in sax_volume_motifs(spark, SF_CORRECT).collect()}
    assert got == dict(expect) and len(got) >= 5


def test_ewma_replay(spark):
    """Alpha=1/2 exponential smoothing replayed with the exact dyadic
    recurrence s_d = (s_{d-1} + c_d)/2 in Fraction arithmetic."""
    from fractions import Fraction

    from chopin_spark.queries.tsmine import ewma_volume_forecast
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    daily = collections.Counter()
    for r in spark.sql(
        "SELECT event_type, CAST(day(ts) AS BIGINT) AS d FROM events"
        " WHERE month(ts) = 1"
    ).collect():
        daily[(r.event_type, r.d)] += 1

    rows = ewma_volume_forecast(spark, SF_CORRECT).collect()
    assert len(rows) == len({k[0] for k in daily}) >= 3
    for row in rows:
        c = [daily.get((row.event_type, d), 0) for d in range(1, 32)]
        assert row.total == sum(c)
        # s_1 = c_1; s_d = (s_{d-1} + c_d) / 2 — the EWMA recurrence
        s = Fraction(c[0])
        s30 = None
        for d in range(2, 32):
            s = (s + c[d - 1]) / 2
            if d == 30:
                s30 = s
        assert Fraction(row.s31_scaled, 2 ** 30) == s
        assert row.ewma_forecast == float(s)
        assert row.last_step_error == float(Fraction(c[30]) - s30)


def test_mann_whitney_replay(spark):
    """U statistic, tie term, and z replayed with explicit midranks
    over the pooled sorted sample."""
    from chopin_spark.queries.pointpat import (
        _MWU_L1,
        _MWU_L2,
        mann_whitney_u_lang,
    )
    from chopin_spark.tables import load

    docs = load(spark, SF_CORRECT, "documents")
    vals = {_MWU_L1: [], _MWU_L2: []}
    for r in docs.select("lang", "n_chars").collect():
        if r.lang in vals:
            vals[r.lang].append(r.n_chars)

    pooled = sorted(vals[_MWU_L1] + vals[_MWU_L2])
    rank = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j] == pooled[i]:
            j += 1
        rank[pooled[i]] = (i + 1 + j) / 2  # midrank of the tie run
        i = j
    n1, n2 = len(vals[_MWU_L1]), len(vals[_MWU_L2])
    r1 = sum(rank[v] for v in vals[_MWU_L1])
    u1 = r1 - n1 * (n1 + 1) / 2
    cnt = collections.Counter(pooled)
    ties = sum(t ** 3 - t for t in cnt.values())
    n = n1 + n2
    z = (u1 - n1 * n2 / 2) / math.sqrt(
        (n1 * n2 / 12) * ((n + 1) - ties / (n * (n - 1)))
    )

    row = mann_whitney_u_lang(spark, SF_CORRECT).collect()[0]
    assert (row.n1, row.n2, row.tie_term) == (n1, n2, ties)
    assert row.u1 == u1
    assert _close(row.z_score, z, 1e-6)


def test_dp_noisy_counts_replay(spark):
    """Geometric-mechanism noise replayed from the deterministic LCG
    draws; released counts must reproduce exactly and true counts must
    not appear in the output schema."""
    from chopin_spark.queries.privacyq import (
        _DP_EPS_ALPHA,
        _DP_MOD,
        dp_noisy_counts_release,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    cnt = collections.Counter()
    for r in spark.sql(
        "SELECT event_type, CAST(day(ts) AS BIGINT) % 7 AS dow FROM events"
        " WHERE month(ts) = 1"
    ).collect():
        cnt[(r.event_type, r.dow)] += 1

    def geom(key, mult):
        u = ((key * mult + 12345) % _DP_MOD + 1) / (_DP_MOD + 1)
        return math.floor(math.log(u) / math.log(_DP_EPS_ALPHA))

    out = dp_noisy_counts_release(spark, SF_CORRECT)
    assert "c" not in out.columns and "count" not in out.columns
    rows = out.collect()
    assert {(r.event_type, r.dow) for r in rows} == set(cnt)
    for r in rows:
        key = (ord(r.event_type[0]) * 31 + ord(r.event_type[1])) * 7 + r.dow
        z = geom(key, 2654435761) - geom(key, 1103515245)
        assert r.noise == z
        assert r.released_count == max(0, cnt[(r.event_type, r.dow)] + z)
        assert r.epsilon_spent == 1.0


def _event_cells(spark):
    """Collect (gx, gy, day) per January event on the tract lattice."""
    from chopin_spark.queries.spatial import _EVT_X, _EVT_Y
    from chopin_spark.zones import TRACT_H, TRACT_W

    return spark.sql(
        f"SELECT CAST(FLOOR({_EVT_X} / {TRACT_W!r}) AS BIGINT) AS gx,"
        f" CAST(FLOOR({_EVT_Y} / {TRACT_H!r}) AS BIGINT) AS gy,"
        " CAST(day(ts) AS BIGINT) AS d"
        " FROM events WHERE month(ts) = 1"
    ).collect()


def test_mann_kendall_replay(spark):
    """Per-tract S = Σ sign pairs replayed over the exhaustive
    cell × 30-day cube (absent days are zero)."""
    from chopin_spark.queries.spatial import mann_kendall_tract_trend
    from chopin_spark.tables import load
    from chopin_spark.zones import TRACT_NX, TRACT_NY

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    cnt = collections.Counter()
    for r in _event_cells(spark):
        cnt[(r.gx, r.gy, r.d)] += 1

    got = {(r.gx, r.gy): r for r in
           mann_kendall_tract_trend(spark, SF_CORRECT).collect()}
    assert len(got) == TRACT_NX * TRACT_NY
    trends = set()
    for gx in range(TRACT_NX):
        for gy in range(TRACT_NY):
            c = [cnt.get((gx, gy, d), 0) for d in range(1, 31)]
            s = untied = 0
            for i in range(30):
                for j in range(i + 1, 30):
                    if c[j] != c[i]:
                        s += 1 if c[j] > c[i] else -1
                        untied += 1
            row = got[(gx, gy)]
            assert (row.mk_s, row.n_untied_pairs) == (s, untied)
            expect_tr = "up" if s > 0 else "down" if s < 0 else "flat"
            assert row.trend == expect_tr
            trends.add(expect_tr)
    assert len(trends) >= 2  # the fixture must exercise >1 class


def test_theil_sen_replay(spark):
    """Median pairwise slope per tract replayed with an explicit sort
    over the 435 day pairs."""
    from chopin_spark.queries.spatial import theil_sen_tract_slope
    from chopin_spark.tables import load
    from chopin_spark.zones import TRACT_NX, TRACT_NY

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    cnt = collections.Counter()
    for r in _event_cells(spark):
        cnt[(r.gx, r.gy, r.d)] += 1

    got = {(r.gx, r.gy): r for r in
           theil_sen_tract_slope(spark, SF_CORRECT).collect()}
    assert len(got) == TRACT_NX * TRACT_NY
    for gx in range(TRACT_NX):
        for gy in range(TRACT_NY):
            c = [cnt.get((gx, gy, d), 0) for d in range(1, 31)]
            slopes = sorted(
                (c[j] - c[i]) / (j - i)
                for i in range(30) for j in range(i + 1, 30)
            )
            row = got[(gx, gy)]
            assert row.n_pairs == len(slopes) == 435
            assert _close(row.ts_slope, slopes[217], 1e-6)


def test_ks_two_sample_replay(spark):
    """Exact KS sup replayed from raw per-language length lists."""
    from chopin_spark.queries.textops import ks_two_sample_lang
    from chopin_spark.tables import load

    docs = load(spark, SF_CORRECT, "documents")
    en, de = [], []
    for r in docs.select("lang", "n_chars").collect():
        if r.lang == "en":
            en.append(r.n_chars)
        elif r.lang == "de":
            de.append(r.n_chars)
    n1, n2 = len(en), len(de)
    support = sorted(set(en) | set(de))
    c1 = c2 = d_num = 0
    en_cnt, de_cnt = collections.Counter(en), collections.Counter(de)
    for v in support:
        c1 += en_cnt[v]
        c2 += de_cnt[v]
        d_num = max(d_num, abs(c1 * n2 - c2 * n1))

    row = ks_two_sample_lang(spark, SF_CORRECT).collect()[0]
    assert (row.n_en, row.n_de, row.d_num) == (n1, n2, d_num)
    assert d_num > 0
    assert _close(row.ks_d, d_num / (n1 * n2), 1e-6)


def test_tile_pyramid_replay(spark):
    """Zoom-6..0 tile counts replayed with an explicit ix,iy >>1
    parent cascade from the collected level-6 cells."""
    from chopin_spark import sqlexpr as sx
    from chopin_spark.queries.spatial import (
        _DOC_X,
        _DOC_Y,
        tile_pyramid_census,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    base = collections.Counter(
        r.cell for r in spark.sql(
            f"SELECT {sx.quad_cell_expr(_DOC_X, _DOC_Y, 6)} AS cell"
            " FROM documents"
        ).collect()
    )

    expect = {}
    cur = dict(base)
    for lvl in range(6, -1, -1):
        for cell, n in cur.items():
            expect[(lvl, cell)] = n
        if lvl:
            n_side = 1 << lvl
            nxt = collections.Counter()
            for cell, n in cur.items():
                ix, iy = cell % n_side, cell // n_side
                nxt[(iy >> 1) * (n_side >> 1) + (ix >> 1)] += n
            cur = dict(nxt)

    got = {(r.lvl, r.cell): r.n
           for r in tile_pyramid_census(spark, SF_CORRECT).collect()}
    assert got == expect
    assert got[(0, 0)] == sum(base.values())  # root sees every doc


def test_vector_tile_topk_replay(spark):
    """Tile-budget survivors replayed with an explicit per-tile sort
    by (n_chars desc, doc_id)."""
    from chopin_spark import sqlexpr as sx
    from chopin_spark.queries.spatial import (
        _DOC_X,
        _DOC_Y,
        _VT_K,
        _VT_LEVEL,
        vector_tile_topk,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    tiles = collections.defaultdict(list)
    for r in spark.sql(
        f"SELECT doc_id, n_chars,"
        f" {sx.quad_cell_expr(_DOC_X, _DOC_Y, _VT_LEVEL)} AS tile"
        " FROM documents"
    ).collect():
        tiles[r.tile].append((-r.n_chars, r.doc_id))

    expect = {}
    for tile, feats in tiles.items():
        if len(feats) <= _VT_K:
            continue  # under-budget tiles emit nothing
        feats.sort()
        for rnk, (neg, did) in enumerate(feats[:_VT_K], start=1):
            expect[(tile, rnk)] = (did, -neg, len(feats), len(feats) - _VT_K)

    got = {(r.tile, r.rnk): (r.doc_id, r.n_chars, r.n_in_tile, r.n_dropped)
           for r in vector_tile_topk(spark, SF_CORRECT).collect()}
    assert got == expect and len(expect) >= _VT_K


def test_readability_replay(spark):
    """Flesch aggregates replayed with re.findall vowel groups and
    explicit 10-token pseudo-sentences."""
    import re

    from chopin_spark.queries.textmine import readability_flesch
    from chopin_spark.tables import load

    docs = load(spark, SF_CORRECT, "documents")
    agg = collections.defaultdict(lambda: [0, 0, 0, 0])
    for r in docs.select("lang", "text").collect():
        toks = r.text.split(" ")
        a = agg[r.lang]
        a[0] += 1
        a[1] += len(toks)
        a[2] += math.ceil(len(toks) / 10)
        a[3] += sum(len(re.findall("[aeiou]+", t)) for t in toks)

    rows = readability_flesch(spark, SF_CORRECT).collect()
    assert {r.lang for r in rows} == set(agg)
    for r in rows:
        nd, w, s, syl = agg[r.lang]
        assert (r.n_docs, r.words, r.sentences, r.syllables) == (nd, w, s, syl)
        assert _close(r.words_per_sentence, w / s, 1e-4)
        assert _close(r.syllables_per_word, syl / w, 1e-4)
        assert _close(r.flesch, 206.835 - 1.015 * (w / s) - 84.6 * (syl / w),
                      1e-2)


def test_naive_bayes_replay(spark):
    """The multinomial NB confusion matrix replayed with dict counts
    and the same micro-nat quantization — integer-exact scores, so the
    argmax must agree row-for-row."""
    from chopin_spark.queries.mlq import naive_bayes_lang_confusion
    from chopin_spark.tables import load

    docs = load(spark, SF_CORRECT, "documents")
    rows = docs.select("doc_id", "lang", "text").collect()

    def qln(x):
        return math.floor(math.log(x) * 1000000 + 0.5)

    seen = collections.Counter()   # (lang, tok) -> cnt over train docs
    ntok = collections.Counter()
    n_train = collections.Counter()
    vocab = set()
    for r in rows:
        if r.doc_id % 5 == 0:
            continue
        toks = r.text.split(" ")
        n_train[r.lang] += 1
        ntok[r.lang] += len(toks)
        for t in toks:
            seen[(r.lang, t)] += 1
            vocab.add(t)
    v = len(vocab)
    langs = sorted(n_train)

    confusion = collections.Counter()
    for r in rows:
        if r.doc_id % 5 != 0:
            continue
        cnt = collections.Counter(t for t in r.text.split(" ") if t in vocab)
        n_iv = sum(cnt.values())
        best = None
        for lang in langs:
            q0 = -qln(ntok[lang] + v)
            score = qln(n_train[lang]) + n_iv * q0 + sum(
                c * qln(seen[(lang, t)] + 1)
                for t, c in cnt.items() if (lang, t) in seen
            )
            if best is None or score > best[0]:
                best = (score, lang)
        confusion[(r.lang, best[1])] += 1

    got = {(r.true_lang, r.predicted): r.n_docs
           for r in naive_bayes_lang_confusion(spark, SF_CORRECT).collect()}
    assert got == dict(confusion)
    # non-vacuity: the argmax is not constant (several predicted
    # classes) and some docs are classified correctly — the synthetic
    # corpus shares vocabulary across languages, so ACCURACY is weak
    # (en-prior dominated) by construction; the replay pins semantics,
    # not fixture separability
    assert len({p for (_, p) in confusion}) >= 3
    assert sum(n for (t, p), n in confusion.items() if t == p) > 0


def test_ips_policy_eval_replay(spark):
    """Best-arm policy and matched-row IPS value replayed with dict
    aggregation over the deterministic fold split."""
    from chopin_spark.queries.mlq import ips_offline_policy_eval
    from chopin_spark.tables import load

    docs = load(spark, SF_CORRECT, "documents")
    train = collections.defaultdict(lambda: [0, 0])  # (lang,src): rs, c
    ev = collections.defaultdict(list)               # lang: [(src, r)]
    for r in docs.select("doc_id", "lang", "source", "n_chars").collect():
        rew = 1 if r.n_chars >= 300 else 0
        if (r.doc_id // 20) % 2 == 0:
            t = train[(r.lang, r.source)]
            t[0] += rew
            t[1] += 1
        else:
            ev[r.lang].append((r.source, rew))

    policy = {}
    for (lang, src), (rs, c) in train.items():
        key = (-(rs / c), src)
        if lang not in policy or key < policy[lang][0]:
            policy[lang] = (key, src, rs / c)

    rows = ips_offline_policy_eval(spark, SF_CORRECT).collect()
    assert {r.lang for r in rows} == set(policy) and len(rows) >= 3
    for r in rows:
        _, arm, dm = policy[r.lang]
        matched = [rw for s, rw in ev[r.lang] if s == arm]
        assert r.target_arm == arm
        assert (r.n_eval, r.n_matched) == (len(ev[r.lang]), len(matched))
        assert _close(r.dm_value, dm, 1e-4)
        if matched:
            assert _close(r.ips_value, sum(matched) / len(matched), 1e-4)
        else:
            assert r.ips_value is None


def _round_half_up(x, p):
    return math.floor(x * 10 ** p + 0.5) / 10 ** p


def test_burrows_delta_replay(spark):
    """Burrows' Delta over the top-20 word profile replayed with dict
    counts, explicit micro-frequency quantization, and the cleared
    z-score identity."""
    from chopin_spark.queries.mlq import _BD_TOP, burrows_delta_sources
    from chopin_spark.tables import load

    docs = load(spark, SF_CORRECT, "documents")
    cnt = collections.Counter()
    tot = collections.Counter()
    for r in docs.select("source", "text").collect():
        for t in r.text.split(" "):
            cnt[(r.source, t)] += 1
            tot[r.source] += 1
    sources = sorted(tot)
    ns = len(sources)

    word_tot = collections.Counter()
    for (s, t), n in cnt.items():
        word_tot[t] += n
    topw = sorted(word_tot, key=lambda t: (-word_tot[t], t))[:_BD_TOP]

    fq = {(t, s): math.floor(cnt.get((s, t), 0) * 1000000.0 / tot[s] + 0.5)
          for t in topw for s in sources}
    var = {}
    for t in topw:
        vals = [fq[(t, s)] for s in sources]
        var[t] = ns * sum(v * v for v in vals) - sum(vals) ** 2

    got = {(r.src1, r.src2): r
           for r in burrows_delta_sources(spark, SF_CORRECT).collect()}
    assert len(got) == ns * (ns - 1) // 2
    for i, a in enumerate(sources):
        for b in sources[i + 1:]:
            l1 = sum(abs(fq[(t, a)] - fq[(t, b)]) for t in topw)
            delta = sum(
                ns * abs(fq[(t, a)] - fq[(t, b)]) / math.sqrt(var[t])
                for t in topw if var[t] > 0
            ) / _BD_TOP
            row = got[(a, b)]
            assert row.fq_l1 == l1
            assert _close(row.burrows_delta, delta, 1e-4)


def test_radiation_model_replay(spark):
    """Radiation-model flux replayed with an explicit O(Z^3)
    intervening-opportunity triple loop on the zone table."""
    from chopin_spark.queries.interactq import (
        _DX,
        _DY,
        _RAD_CH,
        _RAD_CW,
        _RAD_NY,
        radiation_model_flux,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    pop = collections.Counter()
    for r in spark.sql(
        f"SELECT CAST(FLOOR(({_DX}) / {_RAD_CW}) AS BIGINT) AS gx,"
        f" CAST(FLOOR(({_DY}) / {_RAD_CH}) AS BIGINT) AS gy FROM documents"
    ).collect():
        pop[(r.gx, r.gy)] += 1
    zones = [
        (gx * _RAD_NY + gy,
         gx * _RAD_CW + _RAD_CW // 2, gy * _RAD_CH + _RAD_CH // 2, p)
        for (gx, gy), p in pop.items()
    ]

    cand = []
    for zi, cxi, cyi, mi in zones:
        for zj, cxj, cyj, nj in zones:
            if zi == zj:
                continue
            d2 = (cxi - cxj) ** 2 + (cyi - cyj) ** 2
            s = sum(p for zk, cx, cy, p in zones
                    if zk != zi and zk != zj
                    and (cx - cxi) ** 2 + (cy - cyi) ** 2 < d2)
            flux = _round_half_up(mi * nj / ((mi + s) * (mi + nj + s)), 6)
            cand.append((-flux, zi, zj, mi, nj, s))
    cand.sort()
    expect = cand[:30]

    rows = radiation_model_flux(spark, SF_CORRECT).collect()
    assert [(r.i, r.j, r.mi, r.nj, r.s) for r in rows] \
        == [(zi, zj, mi, nj, s) for _, zi, zj, mi, nj, s in expect]
    for r, (negf, *_rest) in zip(rows, expect):
        assert _close(r.p_flux, -negf, 1e-6)


def test_rake_replay(spark):
    """RAKE degree/frequency scores replayed with explicit stopword
    run splitting per document."""
    from chopin_spark.queries.textmine import rake_keywords
    from chopin_spark.tables import load

    docs = load(spark, SF_CORRECT, "documents")
    freq = collections.Counter()
    degree = collections.Counter()
    for r in docs.select("doc_id", "text").collect():
        phrase = []
        phrases = []
        for t in r.text.split(" "):
            if t in ("a", "the"):
                if phrase:
                    phrases.append(phrase)
                phrase = []
            else:
                phrase.append(t)
        if phrase:
            phrases.append(phrase)
        for ph in phrases:
            for t in ph:
                freq[t] += 1
                degree[t] += len(ph)

    cand = sorted(
        (-_round_half_up(degree[t] / freq[t], 4), -degree[t], t)
        for t in freq if freq[t] >= 5
    )[:20]

    rows = rake_keywords(spark, SF_CORRECT).collect()
    assert [(r.word, r.freq, r.degree) for r in rows] \
        == [(t, freq[t], degree[t]) for _, _, t in cand]
    for r, (negs, _, _) in zip(rows, cand):
        assert _close(r.rake_score, -negs, 1e-4)


def test_quadrat_csr_replay(spark):
    """Pearson X² and VMR replayed from explicit 8x6 quadrat counts
    (absent quadrats are zero)."""
    from chopin_spark import sqlexpr as sx
    from chopin_spark.queries.pointpat import (
        _DX,
        _DY,
        _QK,
        _QNX,
        _QNY,
        quadrat_csr_test,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    cnt = collections.Counter()
    for r in spark.sql(
        f"SELECT {sx.grid_ix_expr(_DX, _QNX)} AS gx,"
        f" {sx.grid_iy_expr(_DY, _QNY)} AS gy FROM documents"
    ).collect():
        cnt[(r.gx, r.gy)] += 1
    n = sum(cnt.values())
    s2 = sum(v * v for v in cnt.values())

    row = quadrat_csr_test(spark, SF_CORRECT).collect()[0]
    assert (row.n_points, row.n_quadrats, row.dof) == (n, _QK, _QK - 1)
    assert _close(row.chi2, (_QK * s2 - n * n) / n, 1e-6)
    assert _close(row.vmr, (_QK * s2 - n * n) / ((_QK - 1) * n), 1e-6)


def test_deviational_ellipse_replay(spark):
    """Mean center, orientation, and axis sigmas replayed from raw
    integer-meter moments and the closed-form 2x2 eigenvalues."""
    from chopin_spark.queries.pointpat import (
        _DX,
        _DY,
        std_deviational_ellipse,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    pts = [(int(math.floor(r.x + 0.5)), int(math.floor(r.y + 0.5)))
           for r in spark.sql(
               f"SELECT {_DX} AS x, {_DY} AS y FROM documents").collect()]
    n = len(pts)
    sx_ = sum(x for x, _ in pts)
    sy_ = sum(y for _, y in pts)
    vxx = n * sum(x * x for x, _ in pts) - sx_ * sx_
    vyy = n * sum(y * y for _, y in pts) - sy_ * sy_
    vxy = n * sum(x * y for x, y in pts) - sx_ * sy_
    disc = math.sqrt((vxx - vyy) ** 2 + 4 * vxy * vxy)

    row = std_deviational_ellipse(spark, SF_CORRECT).collect()[0]
    assert row.n_points == n
    assert _close(row.mean_x, sx_ / n, 1e-4)
    assert _close(row.mean_y, sy_ / n, 1e-4)
    assert _close(row.theta_rad, 0.5 * math.atan2(2 * vxy, vxx - vyy), 1e-6)
    assert _close(row.sigma_major, math.sqrt((vxx + vyy + disc) / 2) / n, 1e-4)
    assert _close(row.sigma_minor, math.sqrt((vxx + vyy - disc) / 2) / n, 1e-4)
    assert row.sigma_major >= row.sigma_minor > 0


def test_weiszfeld_replay(spark):
    """Three Weiszfeld rounds replayed with the same quantized integer
    weights — centers must agree EXACTLY (they are floor-quantized)."""
    from chopin_spark.queries.pointpat import (
        _DX,
        _DY,
        _WZ_SOFT,
        median_center_weiszfeld,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    pts = [(int(math.floor(r.x + 0.5)), int(math.floor(r.y + 0.5)))
           for r in spark.sql(
               f"SELECT {_DX} AS x, {_DY} AS y FROM documents").collect()]
    n = len(pts)
    cx = math.floor(sum(x for x, _ in pts) / n + 0.5)
    cy = math.floor(sum(y for _, y in pts) / n + 0.5)
    mean_c = (cx, cy)
    for _ in range(3):
        wx = wy = wt = 0
        for x, y in pts:
            w = math.floor(
                1.0e9 / math.sqrt((x - cx) ** 2 + (y - cy) ** 2 + _WZ_SOFT)
                + 0.5
            )
            wx += w * x
            wy += w * y
            wt += w
        cx = math.floor(wx / wt + 0.5)
        cy = math.floor(wy / wt + 0.5)
    md = sum(
        math.floor(math.sqrt((x - cx) ** 2 + (y - cy) ** 2) * 1000 + 0.5)
        for x, y in pts
    ) / 1000 / n

    row = median_center_weiszfeld(spark, SF_CORRECT).collect()[0]
    assert (row.mean_cx, row.mean_cy) == mean_c
    assert (row.median_cx, row.median_cy) == (cx, cy)
    assert _close(row.mean_dist_to_median, md, 1e-4)
    assert (cx, cy) != mean_c  # the iteration actually moves


def test_box_counting_replay(spark):
    """Occupied-cell counts at four dyadic scales and the lattice-log
    OLS slope replayed explicitly."""
    from chopin_spark import sqlexpr as sx
    from chopin_spark.queries.pointpat import (
        _BC_SCALES,
        _DX,
        _DY,
        box_counting_dimension,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    occ = {}
    for m in _BC_SCALES:
        cells = {
            (r.gx, r.gy)
            for r in spark.sql(
                f"SELECT {sx.grid_ix_expr(_DX, 8 * m)} AS gx,"
                f" {sx.grid_iy_expr(_DY, 6 * m)} AS gy FROM documents"
            ).collect()
        }
        occ[m] = len(cells)
    lat = [
        (math.floor(math.log(m) * 1000000 + 0.5),
         math.floor(math.log(occ[m]) * 1000000 + 0.5))
        for m in _BC_SCALES
    ]
    k = len(lat)
    sx_ = sum(x for x, _ in lat)
    sy_ = sum(y for _, y in lat)
    sxy = sum(x * y for x, y in lat)
    sxx = sum(x * x for x, _ in lat)
    slope = (k * sxy - sx_ * sy_) / (k * sxx - sx_ * sx_)

    row = box_counting_dimension(spark, SF_CORRECT).collect()[0]
    assert (row.n_occ_base, row.n_occ_finest) == (occ[1], occ[8])
    assert occ[8] > occ[1]  # finer grids must resolve more cells
    assert _close(row.box_dimension, slope, 1e-6)


def test_gini_replay(spark):
    """Host-mass Gini replayed with an explicit (mass, host) rank sort
    and the cumulative-sum identity."""
    from chopin_spark.queries.webtext import _TRI_SRC, host_gini_inequality
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    mass = collections.Counter()
    for r in spark.sql(
        f"SELECT {_TRI_SRC} AS host_num, n_chars FROM documents"
    ).collect():
        mass[r.host_num] += r.n_chars
    ranked = sorted(mass.items(), key=lambda kv: (kv[1], kv[0]))
    n = len(ranked)
    tot = sum(m for _, m in ranked)
    wsum = sum(i * m for i, (_, m) in enumerate(ranked, start=1))
    gini = (2 * wsum - (n + 1) * tot) / (n * tot)

    row = host_gini_inequality(spark, SF_CORRECT).collect()[0]
    assert (row.n_hosts, row.total_chars) == (n, tot)
    assert 0 < gini < 1
    assert _close(row.gini, gini, 1e-6)


def test_assortativity_replay(spark):
    """Newman degree assortativity replayed from the explicit edge
    list with both directed realizations."""
    from chopin_spark.queries.graphq import degree_assortativity_hosts
    from chopin_spark.queries.webtext import _TRI_DST, _TRI_SRC
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    und = {
        (min(r.src, r.dst), max(r.src, r.dst))
        for r in spark.sql(
            f"SELECT {_TRI_SRC} AS src, {_TRI_DST} AS dst FROM documents"
            f" WHERE {_TRI_SRC} <> {_TRI_DST}"
        ).collect()
    }
    deg = collections.Counter()
    for u, v in und:
        deg[u] += 1
        deg[v] += 1
    ep = [(deg[u], deg[v]) for u, v in und] + [(deg[v], deg[u])
                                              for u, v in und]
    m2 = len(ep)
    sjk = sum(j * k for j, k in ep)
    sj2 = sum(j + k for j, k in ep)
    sq2 = sum(j * j + k * k for j, k in ep)
    mu = sj2 / (2 * m2)
    r_exp = (sjk / m2 - mu * mu) / (sq2 / (2 * m2) - mu * mu)

    row = degree_assortativity_hosts(spark, SF_CORRECT).collect()[0]
    assert row.n_edges == len(und)
    assert _close(row.assortativity_r, r_exp, 1e-6)


def test_adamic_adar_replay(spark):
    """Top-20 Adamic-Adar predictions replayed with explicit wedge
    enumeration, the hub cap, and existing-edge removal."""
    from chopin_spark.queries.graphq import (
        _AA_DMAX,
        _AA_TOPK,
        adamic_adar_link_pred,
    )
    from chopin_spark.queries.webtext import _TRI_DST, _TRI_SRC
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    und = {
        (min(r.src, r.dst), max(r.src, r.dst))
        for r in spark.sql(
            f"SELECT {_TRI_SRC} AS src, {_TRI_DST} AS dst FROM documents"
            f" WHERE {_TRI_SRC} <> {_TRI_DST}"
        ).collect()
    }
    adj = collections.defaultdict(set)
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)

    cand = collections.defaultdict(lambda: [0, 0.0])  # n_common, score
    for w, nbs in adj.items():
        if len(nbs) > _AA_DMAX:
            continue
        nl = sorted(nbs)
        for i, u in enumerate(nl):
            for v in nl[i + 1:]:
                if (u, v) in und:
                    continue
                c = cand[(u, v)]
                c[0] += 1
                c[1] += 1.0 / math.log(len(nbs))
    ranked = sorted(
        ((-_round_half_up(s, 4), u, v, nc) for (u, v), (nc, s) in cand.items())
    )[:_AA_TOPK]

    rows = adamic_adar_link_pred(spark, SF_CORRECT).collect()
    assert [(r.rank, r.host_u, r.host_v, r.n_common) for r in rows] \
        == [(i + 1, u, v, nc) for i, (_, u, v, nc) in enumerate(ranked)]
    for r, (negs, *_rest) in zip(rows, ranked):
        assert _close(r.aa_score, -negs, 1e-4)


def test_chi_square_replay(spark):
    """Sparse-safe chi-square identity replayed from the explicit
    lang x source contingency table with per-cell micro quantization."""
    from chopin_spark.queries.textops import chi_square_lang_source
    from chopin_spark.tables import load

    docs = load(spark, SF_CORRECT, "documents")
    cells = collections.Counter()
    for r in docs.select("lang", "source").collect():
        cells[(r.lang, r.source)] += 1
    rowsum = collections.Counter()
    colsum = collections.Counter()
    for (lg, src), o in cells.items():
        rowsum[lg] += o
        colsum[src] += o
    n = sum(cells.values())
    terms = sum(
        math.floor((n * o * o) / (rowsum[lg] * colsum[src]) * 1000000 + 0.5)
        for (lg, src), o in cells.items()
    )
    chi2_micro = terms - n * 1000000

    row = chi_square_lang_source(spark, SF_CORRECT).collect()[0]
    assert (row.n_docs, row.n_langs, row.n_sources) == \
        (n, len(rowsum), len(colsum))
    assert row.dof == (len(rowsum) - 1) * (len(colsum) - 1)
    assert row.chi2_micro == chi2_micro
    assert _close(row.chi2, chi2_micro / 1000000, 1e-6)


def test_cuped_replay(spark):
    """CUPED theta, raw/adjusted effects, and variance reduction
    replayed from per-user integer (x, y) aggregates."""
    from chopin_spark.queries.temporalq import cuped_adjusted_effect
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    users = collections.defaultdict(lambda: [0, 0])  # x, y
    for r in spark.sql(
        "SELECT user_id, CAST(day(ts) AS BIGINT) AS d, event_type"
        " FROM events WHERE month(ts) = 1"
    ).collect():
        u = users[r.user_id]
        if r.d <= 15:
            u[0] += 1
        elif r.event_type == "purchase":
            u[1] += 1

    n = len(users)
    sx = sum(x for x, _ in users.values())
    sy = sum(y for _, y in users.values())
    sxy = sum(x * y for x, y in users.values())
    sxx = sum(x * x for x, _ in users.values())
    syy = sum(y * y for _, y in users.values())
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = {0: [0, 0, 0], 1: [0, 0, 0]}  # n, sy, sx per arm
    for uid, (x, y) in users.items():
        arm = a[uid % 2]
        arm[0] += 1
        arm[1] += y
        arm[2] += x
    raw = a[1][1] / a[1][0] - a[0][1] / a[0][0]
    cuped = raw - theta * (a[1][2] / a[1][0] - a[0][2] / a[0][0])
    r2 = (n * sxy - sx * sy) ** 2 / ((n * sxx - sx * sx) * (n * syy - sy * sy))

    row = cuped_adjusted_effect(spark, SF_CORRECT).collect()[0]
    assert row.n_users == n
    assert _close(row.theta, theta, 1e-6)
    assert _close(row.effect_raw, raw, 1e-6)
    assert _close(row.effect_cuped, cuped, 1e-6)
    assert _close(row.variance_reduction, r2, 1e-6)
    assert 0 < r2 < 1


def test_opic_replay(spark):
    """Three OPIC cash-distribution rounds replayed sequentially with
    integer floor division — every output is exact int64."""
    from chopin_spark.queries.graphq import _EDGES, opic_crawl_priority
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    edges = [(r.src, r.dst)
             for r in spark.sql(f"SELECT * FROM {_EDGES}").collect()]
    nodes = {v for e in edges for v in e}
    outdeg = collections.Counter(s for s, _ in edges)
    cash = {v: 1_000_000 for v in nodes}
    hist = {v: 0 for v in nodes}
    for _ in range(3):
        got = collections.Counter()
        for s, d in edges:
            if cash[s] > 0:
                got[d] += int(cash[s] // outdeg[s])
        hist = {v: hist[v] + cash[v] for v in nodes}
        cash = {v: got.get(v, 0) for v in nodes}

    got_rows = {r.host_num: r
                for r in opic_crawl_priority(spark, SF_CORRECT).collect()}
    assert set(got_rows) == nodes
    for v in nodes:
        r = got_rows[v]
        assert (r.cash_micro, r.hist_micro, r.priority_micro) \
            == (cash[v], hist[v], cash[v] + hist[v])


def test_winnowing_replay(spark):
    """Robust winnowing (k=5, w=4, rightmost-min rule) replayed with
    explicit char-fold hashes, shingle folds, and window argmins —
    every checksum is exact int64."""
    from chopin_spark.queries.textmine import _POS_M, _WIN_W, \
        winnowing_fingerprints
    from chopin_spark.tables import load
    from chopin_spark.textops import P30, _SHINGLE_B

    docs = load(spark, SF_CORRECT, "documents")
    expect = {}
    for r in docs.select("doc_id", "text").collect():
        uh = []
        for t in r.text.split(" "):
            h = 0
            for c in t:
                h = (h * 31 + ord(c)) % P30
            uh.append(h)
        sh = []
        for i in range(len(uh) - 4):
            s = 0
            for k in range(5):
                s = (s * _SHINGLE_B + uh[i + k]) % P30
            sh.append(s)
        if len(sh) < _WIN_W:
            continue
        keys = [s * _POS_M + (_POS_M - 1 - (i + 1))
                for i, s in enumerate(sh)]
        sel = set()
        for pos in range(_WIN_W, len(sh) + 1):  # 1-based window end
            wkey = min(keys[pos - _WIN_W:pos])
            sel.add((wkey // _POS_M, _POS_M - 1 - wkey % _POS_M))
        fps = [fp for fp, _ in sel]
        expect[r.doc_id] = (len(sh), len(sel), sum(fps), min(fps))

    rows = winnowing_fingerprints(spark, SF_CORRECT).collect()
    assert {r.doc_id for r in rows} == set(expect)
    for r in rows:
        k, nfp, fsum, fmin = expect[r.doc_id]
        assert (r.n_kgrams, r.n_fp, r.fp_sum, r.fp_min) \
            == (k, nfp, fsum, fmin)
        assert _close(r.density, nfp / k, 1e-4)
        # the MOSS density guarantee: ~2/(w+1), never above 1
        assert 0 < r.density <= 1


def test_typosquat_replay(spark):
    """Blocked edit-distance pairs replayed with an independent
    Wagner-Fischer DP over the full (cc, length) blocks."""
    from chopin_spark.queries.webtext import (
        _CCTLD,
        _HOST,
        host_typosquat_pairs,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    hosts = {(r.host, r.cc) for r in spark.sql(
        f"SELECT DISTINCT {_HOST} AS host, {_CCTLD} AS cc FROM documents"
    ).collect()}

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, start=1):
            cur = [i]
            for j, cb in enumerate(b, start=1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    blocks = collections.defaultdict(list)
    for host, cc in hosts:
        blocks[(cc, len(host))].append(host)
    expect = {}
    for hs in blocks.values():
        hs.sort()
        for i, a in enumerate(hs):
            for b in hs[i + 1:]:
                d = lev(a, b)
                if d <= 2:
                    expect[(a, b)] = d

    got = {(r.host_a, r.host_b): r.edit_dist
           for r in host_typosquat_pairs(spark, SF_CORRECT).collect()}
    assert got == expect and len(got) >= 1


def test_knox_replay(spark):
    """Knox space-time counts replayed BRUTE-FORCE over all n(n-1)/2
    event pairs with numpy — an independent check that the bounded
    3x3-cell and time-bin probe joins count every qualifying pair
    exactly once."""
    import numpy as np

    from chopin_spark.queries.temporalq import (
        _KNOX_DS,
        _KNOX_DT_US,
        _TCX,
        _TCY,
        knox_space_time,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    rows = spark.sql(
        f"SELECT {_TCX} AS x, {_TCY} AS y,"
        " unix_micros(CAST(ts AS TIMESTAMP)) AS t FROM events"
    ).collect()
    x = np.array([r.x for r in rows])
    y = np.array([r.y for r in rows])
    t = np.array([r.t for r in rows], dtype=np.int64)
    n = len(rows)
    ds2 = _KNOX_DS * _KNOX_DS
    s = st = tc = 0
    blk = 1024
    for i0 in range(0, n, blk):
        i1 = min(i0 + blk, n)
        dx = x[i0:i1, None] - x[None, :]
        dy = y[i0:i1, None] - y[None, :]
        dt = np.abs(t[i0:i1, None] - t[None, :])
        close_s = dx * dx + dy * dy < ds2
        close_t = dt < _KNOX_DT_US
        upper = np.arange(i0, i1)[:, None] < np.arange(n)[None, :]
        s += int(np.sum(close_s & upper))
        st += int(np.sum(close_s & close_t & upper))
        tc += int(np.sum(close_t & upper))

    row = knox_space_time(spark, SF_CORRECT).collect()[0]
    assert (row.n_events, row.n_pairs) == (n, n * (n - 1) // 2)
    assert (row.pairs_space, row.pairs_time, row.pairs_both) == (s, tc, st)
    assert row.knox_ratio_micro == math.floor(
        st * (n * (n - 1) // 2) / s / tc * 1000000 + 0.5
    )
    assert s > 0 and tc > 0 and st > 0


def test_general_g_replay(spark):
    """Global General G replayed with explicit rook-link enumeration
    over the densified tract lattice."""
    from chopin_spark.queries.pointpat import _DX, _DY, general_g_tracts
    from chopin_spark.tables import load
    from chopin_spark.zones import TRACT_H, TRACT_NX, TRACT_NY, TRACT_W

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    mass = collections.Counter()
    for r in spark.sql(
        f"SELECT CAST(FLOOR({_DX} / {TRACT_W!r}) AS BIGINT) AS gx,"
        f" CAST(FLOOR({_DY} / {TRACT_H!r}) AS BIGINT) AS gy, n_chars"
        " FROM documents"
    ).collect():
        mass[(r.gx, r.gy)] += r.n_chars

    x = {(gx, gy): mass.get((gx, gy), 0)
         for gx in range(TRACT_NX) for gy in range(TRACT_NY)}
    num = links = 0
    for (gx, gy), v in x.items():
        for dx_, dy_ in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = (gx + dx_, gy + dy_)
            if nb in x:
                num += v * x[nb]
                links += 1
    tot = sum(x.values())
    den = tot * tot - sum(v * v for v in x.values())

    row = general_g_tracts(spark, SF_CORRECT).collect()[0]
    assert (row.n_zones, row.w_links, row.num, row.den) == \
        (TRACT_NX * TRACT_NY, links, num, den)
    assert _close(row.general_g, num / den, 1e-8)


def test_luhn_replay(spark):
    """Luhn best-frame selection replayed with an explicit top-20
    significant lexicon and the cleared integer argmax."""
    from chopin_spark.queries.textmine import (
        _LUHN_FRAME,
        _LUHN_TOP,
        luhn_extract_summary,
    )
    from chopin_spark.tables import load

    docs = load(spark, SF_CORRECT, "documents")
    texts = {r.doc_id: r.text.split(" ")
             for r in docs.select("doc_id", "text").collect()}
    gcnt = collections.Counter()
    for toks in texts.values():
        for t in toks:
            if t not in ("a", "the"):
                gcnt[t] += 1
    sig = set(sorted(gcnt, key=lambda t: (-gcnt[t], t))[:_LUHN_TOP])

    expect = {}
    for did, toks in texts.items():
        frames = collections.defaultdict(lambda: [0, 0])  # flen, nsig
        for i, t in enumerate(toks):
            fr = frames[i // _LUHN_FRAME]
            fr[0] += 1
            fr[1] += 1 if t in sig else 0
        # integer argmax of nsig^2/flen, ties -> earliest frame
        best = min(
            frames.items(),
            key=lambda kv: (-(kv[1][1] ** 2 / kv[1][0]), kv[0]),
        )
        expect[did] = (best[0], best[1][0], best[1][1])

    got = {r.doc_id: (r.best_frame, r.flen, r.nsig)
           for r in luhn_extract_summary(spark, SF_CORRECT).collect()}
    assert got == expect
    assert any(nsig > 0 for _, _, nsig in expect.values())


def test_bivariate_moran_replay(spark):
    """Bivariate Moran's I (page mass vs rook-lagged event mass)
    replayed with explicit lattice densification and the n*x - S
    centering identity."""
    from chopin_spark.queries.pointpat import (
        _DX,
        _DY,
        _EX,
        _EY,
        moran_i_bivariate,
    )
    from chopin_spark.tables import load
    from chopin_spark.zones import TRACT_H, TRACT_NX, TRACT_NY, TRACT_W

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    xs = collections.Counter()
    for r in spark.sql(
        f"SELECT CAST(FLOOR({_DX} / {TRACT_W!r}) AS BIGINT) AS gx,"
        f" CAST(FLOOR({_DY} / {TRACT_H!r}) AS BIGINT) AS gy, n_chars"
        " FROM documents"
    ).collect():
        xs[(r.gx, r.gy)] += r.n_chars
    ys = collections.Counter()
    for r in spark.sql(
        f"SELECT CAST(FLOOR({_EX} / {TRACT_W!r}) AS BIGINT) AS gx,"
        f" CAST(FLOOR({_EY} / {TRACT_H!r}) AS BIGINT) AS gy FROM events"
    ).collect():
        ys[(r.gx, r.gy)] += 1

    nz = TRACT_NX * TRACT_NY
    cells = [(gx, gy) for gx in range(TRACT_NX) for gy in range(TRACT_NY)]
    sx_tot = sum(xs.get(c, 0) for c in cells)
    sy_tot = sum(ys.get(c, 0) for c in cells)
    ddx = {c: nz * xs.get(c, 0) - sx_tot for c in cells}
    ddy = {c: nz * ys.get(c, 0) - sy_tot for c in cells}
    num = links = 0
    for (gx, gy) in cells:
        for dx_, dy_ in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            nb = (gx + dx_, gy + dy_)
            if nb in ddy:
                num += ddx[(gx, gy)] * ddy[nb]
                links += 1
    denx = sum(v * v for v in ddx.values())
    deny = sum(v * v for v in ddy.values())

    row = moran_i_bivariate(spark, SF_CORRECT).collect()[0]
    assert (row.n_zones, row.w_links, row.num, row.denx, row.deny) \
        == (nz, links, num, denx, deny)
    assert _close(
        row.moran_bv,
        nz * num / (links * math.sqrt(denx) * math.sqrt(deny)),
        1e-6,
    )


def _py_simhash_drift(spark):
    """Shared replay of the SimHash drift chain: per-host consecutive-
    capture Hamming distances from explicit char folds."""
    from chopin_spark.tables import load
    from chopin_spark.textops import P30, SIMHASH_BITS

    docs = load(spark, SF_CORRECT, "documents")
    per_host = collections.defaultdict(list)
    for r in docs.select("doc_id", "text").collect():
        sums = [0] * SIMHASH_BITS
        for t in r.text.split(" "):
            h31 = h131 = 0
            for c in t:
                h31 = (h31 * 31 + ord(c)) % P30
                h131 = (h131 * 131 + ord(c)) % P30
            h = h31 + (h131 << 30)
            for k in range(SIMHASH_BITS):
                sums[k] += 1 if (h >> k) & 1 else -1
        fp = sum(1 << k for k in range(SIMHASH_BITS) if sums[k] > 0)
        epoch = 1704067200 + (r.doc_id * 48271) % 31536000
        per_host[r.doc_id % 97].append((epoch, r.doc_id, fp))

    drift = {}
    for host, snaps in per_host.items():
        snaps.sort()
        hams = [bin(a[2] ^ b[2]).count("1")
                for a, b in zip(snaps, snaps[1:])]
        if hams:
            drift[host] = (len(hams), sum(hams), max(hams),
                           sum(1 for h in hams if h > 12))
    return drift


def test_url_content_drift_replay(spark):
    """Per-host SimHash drift replayed token-by-token — fingerprints,
    Hamming deltas, and rewrite counts are exact integers."""
    from chopin_spark.queries.sketchq import url_content_drift

    drift = _py_simhash_drift(spark)
    got = {r.host_num: (r.n_transitions, r.total_drift_bits,
                        r.max_drift_bits, r.n_major_rewrites)
           for r in url_content_drift(spark, SF_CORRECT).collect()}
    assert got == drift and len(drift) >= 50


def test_recrawl_tiers_replay(spark):
    """Tier rollup replayed from the drift replay with the integer
    cross-product tier rule."""
    from chopin_spark.queries.sketchq import recrawl_schedule_tiers

    drift = _py_simhash_drift(spark)
    tiers = collections.defaultdict(lambda: [0, 0, 0, 0])
    for host, (nt, _tot, _mx, nmr) in drift.items():
        tier = ("hourly" if nmr * 2 >= nt else
                "daily" if nmr * 5 >= nt else
                "weekly" if nmr * 20 >= nt else "monthly")
        t = tiers[tier]
        t[0] += 1
        t[1] += nt
        t[2] += nmr
        t[3] += host

    got = {r.tier: (r.n_hosts, r.transitions, r.rewrites, r.host_set_sum)
           for r in recrawl_schedule_tiers(spark, SF_CORRECT).collect()}
    assert got == {k: tuple(v) for k, v in tiers.items()}
    assert len(got) >= 2


def test_matrix_profile_replay(spark):
    """Banded z-normalized matrix profile replayed with an explicit
    O(n·L) double loop over the densified hourly series — exact
    integer Pearson carriers, same argmax tie rule."""
    from chopin_spark.queries.tsmine import matrix_profile_motif_volume
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    hourly = collections.Counter()
    for r in spark.sql(
        "SELECT event_type,"
        " CAST((day(ts) - 1) * 24 + hour(ts) AS BIGINT) AS h FROM events"
        " WHERE month(ts) = 1"
    ).collect():
        hourly[(r.event_type, r.h)] += 1

    expect = {}
    for et in {k[0] for k in hourly}:
        c = [hourly.get((et, h), 0) for h in range(744)]
        feat = {}
        for h in range(741):
            w = c[h:h + 4]
            s = sum(w)
            q = sum(v * v for v in w)
            if 4 * q - s * s > 0:
                feat[h] = (w, s, q)
        best = None
        n_pairs = 0
        for i, (wa, sa, qa) in feat.items():
            for j in range(i + 4, min(i + 49, 741)):
                if j not in feat:
                    continue
                wb, sb, qb = feat[j]
                n_pairs += 1
                p = 4 * sum(a * b for a, b in zip(wa, wb)) - sa * sb
                va = 4 * qa - sa * sa
                vb = 4 * qb - sb * sb
                r_ = p / math.sqrt(float(va) * float(vb))
                key = (-r_, i, j)
                if best is None or key < best[0]:
                    best = (key, i, j, r_)
        expect[et] = (best[1], best[2], best[3], n_pairs)

    rows = matrix_profile_motif_volume(spark, SF_CORRECT).collect()
    assert {r.event_type for r in rows} == set(expect)
    for r in rows:
        i, j, r_, np_ = expect[r.event_type]
        assert (r.motif_i, r.motif_j, r.n_pairs) == (i, j, np_)
        assert _close(r.pearson_r, r_, 1e-9)
        assert _close(r.znorm_dist, math.sqrt(max(0.0, 8 * (1 - r_))), 1e-9)


def test_texttiling_replay(spark):
    """Hearst gap profile replayed with explicit block vectors and the
    cleared integer boundary predicate."""
    from chopin_spark.queries.textmine import _TT_BLK, texttiling_segments
    from chopin_spark.tables import load

    docs = load(spark, SF_CORRECT, "documents")
    expect = {}
    for rr in docs.select("doc_id", "text").collect():
        toks = rr.text.split(" ")
        blocks = collections.defaultdict(collections.Counter)
        for i, t in enumerate(toks):
            blocks[i // _TT_BLK][t] += 1
        nb = max(blocks) + 1
        qs = []
        for b in range(nb - 1):
            nrm1 = sum(v * v for v in blocks[b].values())
            nrm2 = sum(v * v for v in blocks[b + 1].values())
            dot = sum(blocks[b][t] * blocks[b + 1][t] for t in blocks[b])
            qs.append(math.floor(
                dot / math.sqrt(float(nrm1) * float(nrm2)) * 1000000 + 0.5
            ))
        if not qs:
            continue
        n = len(qs)
        s = sum(qs)
        v = n * sum(q * q for q in qs) - s * s
        bounds = sum(
            1 for q in qs
            if 2 * s - 2 * n * q > 0 and (2 * s - 2 * n * q) ** 2 > v
        )
        expect[rr.doc_id] = (n, s, min(qs), bounds)

    got = {r.doc_id: (r.n_gaps, r.sum_simq, r.min_simq, r.n_boundaries)
           for r in texttiling_segments(spark, SF_CORRECT).collect()}
    assert got == expect
    assert any(b > 0 for *_x, b in expect.values())


def test_gravity_ipf_replay(spark):
    """Eight IPF balancing rounds replayed sequentially with the same
    per-step integer re-quantization — all sums and residuals exact."""
    from chopin_spark.queries.interactq import (
        _IPF_GRID,
        _IPF_ROUNDS,
        _IPF_ZONE,
        gravity_ipf_od_balance,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    o = collections.Counter()
    for r in spark.sql(
        f"SELECT {_IPF_ZONE} AS z, n_chars FROM documents"
    ).collect():
        o[r.z] += r.n_chars
    zones = sorted(o)
    d = {z: o[(z - 5) % (_IPF_GRID * _IPF_GRID)] for z in zones}

    t = {}
    for i in zones:
        for j in zones:
            dr = i // _IPF_GRID - j // _IPF_GRID
            dc = i % _IPF_GRID - j % _IPF_GRID
            t[(i, j)] = math.floor(1000000.0 / (1.0 + float(dr * dr + dc * dc))
                                   + 0.5)
    for _ in range(_IPF_ROUNDS):
        rs = collections.Counter()
        for (i, _j), v in t.items():
            rs[i] += v
        t = {(i, j): math.floor(v * (float(o[i]) / float(rs[i])) + 0.5)
             for (i, j), v in t.items()}
        cs = collections.Counter()
        for (_i, j), v in t.items():
            cs[j] += v
        t = {(i, j): math.floor(v * (float(d[j]) / float(cs[j])) + 0.5)
             for (i, j), v in t.items()}

    rs = collections.Counter()
    cs = collections.Counter()
    for (i, j), v in t.items():
        rs[i] += v
        cs[j] += v

    rows = gravity_ipf_od_balance(spark, SF_CORRECT).collect()
    assert [r.zone for r in rows] == zones
    for r in rows:
        assert (r.target_o, r.row_sum, r.target_d, r.col_sum) \
            == (o[r.zone], rs[r.zone], d[r.zone], cs[r.zone])
        assert (r.row_resid, r.col_resid) \
            == (abs(rs[r.zone] - o[r.zone]), abs(cs[r.zone] - d[r.zone]))
    # IPF must have converged to small residuals relative to targets
    assert all(r.row_resid * 100 <= r.target_o for r in rows)


def test_emerging_hotspots_replay(spark):
    """ESRI emerging-hot-spot analysis replayed end-to-end: daily Gi*
    surfaces from explicit rook+self neighborhoods, Mann-Kendall over
    each tract's u series, the 9-class pattern rule."""
    from chopin_spark.queries.spatial import _MK_DAYS, emerging_hotspots
    from chopin_spark.tables import load
    from chopin_spark.zones import TRACT_NX, TRACT_NY

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    cnt = collections.Counter()
    for r in _event_cells(spark):
        if r.d <= _MK_DAYS:
            cnt[(r.gx, r.gy, r.d)] += 1

    nz = TRACT_NX * TRACT_NY
    cells = [(gx, gy) for gx in range(TRACT_NX) for gy in range(TRACT_NY)]
    u = {}       # (cell, d) -> u
    a_v_w = {}   # (cell, d) -> (a_i, v, w)
    for d in range(1, _MK_DAYS + 1):
        c = {cell: cnt.get((cell[0], cell[1], d), 0) for cell in cells}
        s = sum(c.values())
        v = nz * sum(x * x for x in c.values()) - s * s
        for (gx, gy) in cells:
            hood = [(gx + dx_, gy + dy_)
                    for dx_, dy_ in ((0, 0), (1, 0), (-1, 0), (0, 1),
                                     (0, -1))]
            hood = [h for h in hood if h in c]
            nsum = sum(c[h] for h in hood)
            w = len(hood)
            a_i = nz * nsum - s * w
            u[((gx, gy), d)] = a_i / math.sqrt(float(v))
            a_v_w[((gx, gy), d)] = (a_i, v, w)

    expect = {}
    for cell in cells:
        series = [u[(cell, d)] for d in range(1, _MK_DAYS + 1)]
        mk = sum(
            1 if series[j] > series[i] else -1 if series[j] < series[i]
            else 0
            for i in range(len(series)) for j in range(i + 1, len(series))
        )
        a_i, v, w = a_v_w[(cell, _MK_DAYS)]
        z = a_i / math.sqrt(float(v) * (nz * w - w * w) / (nz - 1.0))
        if z > 1.645:
            pat = ("intensifying-hot" if mk > 0 else
                   "diminishing-hot" if mk < 0 else "persistent-hot")
        elif z < -1.645:
            pat = ("intensifying-cold" if mk < 0 else
                   "diminishing-cold" if mk > 0 else "persistent-cold")
        else:
            pat = ("warming" if mk > 0 else "cooling" if mk < 0
                   else "no-pattern")
        expect[cell] = (mk, z, pat)

    rows = emerging_hotspots(spark, SF_CORRECT).collect()
    assert len(rows) == nz
    pats = set()
    for r in rows:
        mk, z, pat = expect[(r.gx, r.gy)]
        assert r.mk_s == mk and r.pattern == pat
        assert _close(r.z_final, z, 1e-6)
        pats.add(pat)
    assert len(pats) >= 4  # the fixture exercises several classes


def test_survival_hazard_replay(spark):
    """Kaplan-Meier at-risk/death counts replayed from per-host
    first/last active quarters."""
    from chopin_spark.queries.webtext import _HOST, host_survival_hazard
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    span = {}
    for r in spark.sql(
        f"SELECT {_HOST} AS host,"
        " CAST(FLOOR(((doc_id * 48271) % 31536000) / 7884000.0) AS BIGINT)"
        " AS q FROM documents"
    ).collect():
        if r.host in span:
            f, l = span[r.host]
            span[r.host] = (min(f, r.q), max(l, r.q))
        else:
            span[r.host] = (r.q, r.q)

    rows = {r.quarter: r
            for r in host_survival_hazard(spark, SF_CORRECT).collect()}
    assert set(rows) == {0, 1, 2, 3}
    for q in range(4):
        at_risk = sum(1 for f, l in span.values() if f <= q <= l)
        deaths = sum(1 for f, l in span.values() if l == q and q < 3)
        r = rows[q]
        assert (r.n_at_risk, r.n_deaths) == (at_risk, deaths)
        assert r.hazard_micro == math.floor(
            deaths * 1000000.0 / at_risk + 0.5
        )
    assert rows[3].n_deaths == 0  # horizon-censored, never "dead"


def test_duncan_segregation_replay(spark):
    """Duncan dissimilarity and isolation replayed from the raw
    lang x zone counts with the exact quantized terms."""
    from chopin_spark import sqlexpr as sx
    from chopin_spark.queries.spatial import (
        _DOC_X,
        _DOC_Y,
        NX,
        NY,
        lang_segregation_duncan,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    zl = collections.Counter()
    for r in spark.sql(
        f"SELECT {sx.grid_cell_expr(_DOC_X, _DOC_Y, NX, NY)} AS z, lang"
        " FROM documents"
    ).collect():
        zl[(r.z, r.lang)] += 1
    zones = {z for z, _ in zl}
    langs = {lg for _, lg in zl}
    zt = collections.Counter()
    lt = collections.Counter()
    for (z, lg), a in zl.items():
        zt[z] += a
        lt[lg] += a
    n = sum(zl.values())

    got = {r.lang: r for r in
           lang_segregation_duncan(spark, SF_CORRECT).collect()}
    assert set(got) == langs
    for lg in langs:
        atot = lt[lg]
        dnum = iso_q = 0
        for z in zones:
            a = zl.get((z, lg), 0)
            t = zt[z]
            dnum += abs(a * (n - atot) - (t - a) * atot)
            if a:
                iso_q += (a * a * 1000000) // t
        row = got[lg]
        assert row.n_docs == atot
        assert _close(row.duncan_d, dnum / (2 * atot * (n - atot)), 1e-6)
        assert _close(row.isolation, iso_q / (atot * 1000000.0), 1e-6)


def test_bm25_replay(spark):
    """Okapi BM25 top-20 (Lucene IDF) replayed with explicit postings,
    df, and the round-before-rank ordering."""
    from chopin_spark.queries.textops import (
        _BM_B,
        _BM_K,
        _BM_K1,
        _BM_TERMS,
        bm25_topk,
    )
    from chopin_spark.tables import load

    docs = load(spark, SF_CORRECT, "documents")
    dl = {}
    post = collections.Counter()
    for r in docs.select("doc_id", "text").collect():
        toks = r.text.split(" ")
        dl[r.doc_id] = len(toks)
        for t in toks:
            if t in _BM_TERMS:
                post[(r.doc_id, t)] += 1
    n_docs = len(dl)
    avgdl = sum(dl.values()) / n_docs
    df = collections.Counter(t for _, t in post)

    scores = collections.defaultdict(lambda: [0.0, 0])
    for (did, t), tf in post.items():
        idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
        w = idf * (tf * (_BM_K1 + 1.0)) / (
            tf + _BM_K1 * (1.0 - _BM_B + _BM_B * dl[did] / avgdl)
        )
        s = scores[did]
        s[0] += w
        s[1] += 1
    ranked = sorted(
        ((-_round_half_up(s, 4), did, nt) for did, (s, nt) in scores.items())
    )[:_BM_K]

    rows = bm25_topk(spark, SF_CORRECT).collect()
    assert [(r.rank, r.doc_id, r.n_terms) for r in rows] \
        == [(i + 1, did, nt) for i, (_, did, nt) in enumerate(ranked)]
    for r, (negs, *_x) in zip(rows, ranked):
        assert _close(r.score_bm25, -negs, 1e-4)


def test_tfidf_replay(spark):
    """Per-source top-3 TF-IDF signature terms replayed with dict
    counts and the smoothed inverse source frequency."""
    from chopin_spark.queries.textops import tfidf_source_terms
    from chopin_spark.tables import load

    docs = load(spark, SF_CORRECT, "documents")
    tf = collections.Counter()
    for r in docs.select("source", "text").collect():
        for t in r.text.split(" "):
            tf[(r.source, t)] += 1
    sdf = collections.Counter(t for _, t in tf)
    sources = {s for s, _ in tf}
    ns = len(sources)

    expect = {}
    for s in sources:
        cand = sorted(
            (-_round_half_up(
                tf[(s, t)] * math.log((ns + 1.0) / (sdf[t] + 1.0)), 4
            ), t)
            for (s2, t) in tf if s2 == s
        )[:3]
        for rank, (negs, t) in enumerate(cand, start=1):
            expect[(s, rank)] = (t, tf[(s, t)], -negs)

    got = {(r.source, r.rank): (r.term, r.tf, r.tfidf)
           for r in tfidf_source_terms(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect)
    for k, (t, tfv, sc) in expect.items():
        gt, gtf, gsc = got[k]
        assert (gt, gtf) == (t, tfv)
        assert _close(gsc, sc, 1e-4)


def test_zipf_replay(spark):
    """Zipf rank-frequency OLS replayed over the explicit top-200
    frequency table with lattice-quantized logs."""
    from chopin_spark.queries.lmq import zipf_slope_terms
    from chopin_spark.tables import load

    docs = load(spark, SF_CORRECT, "documents")
    cnt = collections.Counter()
    for r in docs.select("text").collect():
        for t in r.text.split(" "):
            cnt[t] += 1
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:200]
    lat = [
        (math.floor(math.log(rk) * 1000000 + 0.5),
         math.floor(math.log(c) * 1000000 + 0.5))
        for rk, (_, c) in enumerate(ranked, start=1)
    ]
    n = len(lat)
    sx = sum(x for x, _ in lat)
    sy = sum(y for _, y in lat)
    sxy = sum(x * y for x, y in lat)
    sxx = sum(x * x for x, _ in lat)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)

    row = zipf_slope_terms(spark, SF_CORRECT).collect()[0]
    # the synthetic corpus vocabulary (31 terms at sf0.01) is smaller
    # than the top-200 cut, so n = |vocab|
    assert row.n_terms == n == min(200, len(cnt)) and n >= 20
    assert _close(row.zipf_slope, slope, 1e-6)
    assert _close(row.ln_c_at_rank1,
                  (sy - slope * sx) / n / 1000000.0, 1e-4)
    assert slope < 0  # a frequency curve must fall with rank


def test_top_bigrams_replay(spark):
    """Corpus top-25 bigram table replayed with a plain Counter over
    adjacent token pairs."""
    from chopin_spark.queries.coverage2 import corpus_top_bigrams
    from chopin_spark.tables import load

    docs = load(spark, SF_CORRECT, "documents")
    cnt = collections.Counter()
    for r in docs.select("text").collect():
        w = r.text.split(" ")
        for a, b in zip(w, w[1:]):
            cnt[a + " " + b] += 1
    expect = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:25]

    rows = corpus_top_bigrams(spark, SF_CORRECT).collect()
    assert [(r.rank, r.bigram, r.n) for r in rows] \
        == [(i + 1, bg, n) for i, (bg, n) in enumerate(expect)]


def test_lang_quantiles_replay(spark):
    """Exact interpolated median/p90 per language replayed with the
    textbook (n-1)*q linear-interpolation rule."""
    from chopin_spark.queries.coverage2 import lang_char_quantiles
    from chopin_spark.tables import load

    docs = load(spark, SF_CORRECT, "documents")
    by_lang = collections.defaultdict(list)
    for r in docs.select("lang", "n_chars").collect():
        by_lang[r.lang].append(r.n_chars)

    def qcont(vals, q):
        vals = sorted(vals)
        pos = (len(vals) - 1) * q
        lo = int(math.floor(pos))
        hi = min(lo + 1, len(vals) - 1)
        return vals[lo] + (pos - lo) * (vals[hi] - vals[lo])

    got = {r.lang: r for r in
           lang_char_quantiles(spark, SF_CORRECT).collect()}
    assert set(got) == set(by_lang)
    for lang, vals in by_lang.items():
        row = got[lang]
        assert row.n_docs == len(vals)
        assert _close(row.median_chars, qcont(vals, 0.5), 1e-4)
        assert _close(row.p90_chars, qcont(vals, 0.9), 1e-4)


def test_pareto_skyline_replay(spark):
    """2-D skyline replayed by brute-force pair domination: keep a doc
    unless some other doc has strictly more chars AND at-least-as-many
    distinct tokens (the sort-scan SQL's exact rule); tokenization
    re-derived with a plain split(' ')."""
    from chopin_spark.queries.textops import pareto_skyline_docs
    from chopin_spark.tables import load

    docs = load(spark, SF_CORRECT, "documents")
    pts = [
        (r.doc_id, int(r.n_chars), len(set(r.text.split(" "))))
        for r in docs.select("doc_id", "n_chars", "text").collect()
    ]
    expect = {
        (i, a, b)
        for (i, a, b) in pts
        if not any(a2 > a and b2 >= b for (_, a2, b2) in pts)
    }
    got = {
        (r.doc_id, r.n_chars, r.n_distinct_tokens)
        for r in pareto_skyline_docs(spark, SF_CORRECT).collect()
    }
    assert got == expect and 0 < len(got) < len(pts)


def test_corridor_cross_track_replay(spark):
    """Signed great-circle cross-track bands replayed with plain
    math: n = a x b normalized, dxt = asin(p . n) * R; integer band
    counts must match exactly, rounded extrema within half a grain."""
    from chopin_spark.queries.s2knn import _XT_A, _XT_B, corridor_cross_track
    from chopin_spark.queries.s2q import _LAT, _LON
    from chopin_spark.s2 import EARTH_RADIUS_M
    from chopin_spark.tables import load

    def unit(lon, lat):
        rl, rp = math.radians(lon), math.radians(lat)
        return (math.cos(rp) * math.cos(rl),
                math.cos(rp) * math.sin(rl), math.sin(rp))

    a, b = unit(*_XT_A), unit(*_XT_B)
    n = (a[1] * b[2] - a[2] * b[1],
         a[2] * b[0] - a[0] * b[2],
         a[0] * b[1] - a[1] * b[0])
    nn = math.sqrt(n[0] ** 2 + n[1] ** 2 + n[2] ** 2)
    n = (n[0] / nn, n[1] / nn, n[2] / nn)

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    bands = collections.defaultdict(lambda: [0, 0, math.inf, -math.inf])
    for r in spark.sql(
        f"SELECT doc_id, {_LON} AS lon, {_LAT} AS lat FROM documents"
    ).collect():
        p = unit(r.lon, r.lat)
        dxt = math.asin(p[0] * n[0] + p[1] * n[1] + p[2] * n[2]) \
            * EARTH_RADIUS_M
        st = bands[int(math.floor(abs(dxt) / 100000.0))]
        st[0 if dxt >= 0 else 1] += 1
        st[2] = min(st[2], abs(dxt))
        st[3] = max(st[3], abs(dxt))

    got = {r.band_100km: r for r in
           corridor_cross_track(spark, SF_CORRECT).collect()}
    assert set(got) == set(bands) and len(got) >= 3
    for band, (nl, nr, mn, mx) in bands.items():
        row = got[band]
        assert (row.n_left, row.n_right) == (nl, nr)
        assert _close(row.min_abs_m, mn, 1e-4)
        assert _close(row.max_abs_m, mx, 1e-4)


def test_ransac_line_fit_replay(spark):
    """The 64 LCG hypotheses, the division-free inlier predicate, and
    the (max inliers, min h) winner replayed in plain Python over the
    collected integer point set."""
    from chopin_spark.queries.spatial import (
        _DOC_X, _DOC_Y, _RS_NHYP, _RS_TOL, ransac_line_fit,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    pts = {
        r.id: (r.x, r.y)
        for r in spark.sql(
            f"SELECT CAST(doc_id AS BIGINT) AS id,"
            f" CAST(FLOOR({_DOC_X}) AS BIGINT) AS x,"
            f" CAST(FLOOR({_DOC_Y}) AS BIGINT) AS y FROM documents"
        ).collect()
    }
    c = len(pts)
    best = None
    for h in range(_RS_NHYP):
        x1, y1 = pts[(h * 69069 + 7) % c]
        x2, y2 = pts[(h * 48271 + 13) % c]
        if (x1, y1) == (x2, y2):
            continue
        dx, dy, l2 = x2 - x1, y2 - y1, float((x2 - x1) ** 2 + (y2 - y1) ** 2)
        n_in = sum(
            1 for (px, py) in pts.values()
            if float(dx * (py - y1) - dy * (px - x1)) ** 2
            <= _RS_TOL * _RS_TOL * l2
        )
        if best is None or n_in > best[0]:
            best = (n_in, h, x1, y1, x2, y2)

    row = ransac_line_fit(spark, SF_CORRECT).collect()[0]
    assert (row.n_inliers, row.best_hypothesis, row.x1, row.y1,
            row.x2, row.y2) == best
    assert _close(row.inlier_share, best[0] / c, 1e-4)
    assert 0 < best[0] < c


def test_graph_motif_census_replay(spark):
    """Wedges / 3-stars from degree combinatorics, triangles by a
    brute-force adjacency scan, Newman transitivity — all re-derived
    from the raw (src, dst) pairs with dicts and sets."""
    from chopin_spark.queries.webtext import (
        _TRI_DST, _TRI_SRC, graph_motif_census,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    und = set()
    for r in spark.sql(
        f"SELECT {_TRI_SRC} AS src, {_TRI_DST} AS dst FROM documents"
    ).collect():
        if r.src != r.dst:
            und.add((min(r.src, r.dst), max(r.src, r.dst)))
    adj = collections.defaultdict(set)
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    deg = {v: len(a) for v, a in adj.items()}
    wedges = sum(d * (d - 1) // 2 for d in deg.values())
    stars = sum(d * (d - 1) * (d - 2) // 6 for d in deg.values())
    # each unordered triangle is seen once per edge with the third
    # vertex in both endpoints' adjacencies — divide the edge scan by 3
    tri = sum(len(adj[u] & adj[v]) for (u, v) in und) // 3

    row = graph_motif_census(spark, SF_CORRECT).collect()[0]
    assert (row.n_nodes, row.n_edges, row.max_degree) \
        == (len(deg), len(und), max(deg.values()))
    assert (row.wedges, row.three_stars, row.triangles) \
        == (wedges, stars, tri)
    assert _close(row.transitivity, 3 * tri / wedges, 1e-6)
    assert tri > 0 and stars > 0


def test_moran_correlogram_replay(spark):
    """Moran's I at Chebyshev ring lags 1-4 replayed from raw per-cell
    character sums: dd = n*x - S centering, ordered ring pairs via a
    dict lookup, one exact integer num/den per lag."""
    from chopin_spark.queries.spatial import (
        _CORR_MAXLAG, _DOC_X, _DOC_Y, _NZ, moran_correlogram,
    )
    from chopin_spark.tables import load
    from chopin_spark.zones import TRACT_H, TRACT_NX, TRACT_NY, TRACT_W

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    x = {(gx, gy): 0 for gx in range(TRACT_NX) for gy in range(TRACT_NY)}
    for r in spark.sql(
        f"SELECT CAST(FLOOR({_DOC_X} / {TRACT_W!r}) AS BIGINT) AS gx,"
        f" CAST(FLOOR({_DOC_Y} / {TRACT_H!r}) AS BIGINT) AS gy,"
        f" CAST(SUM(n_chars) AS BIGINT) AS s FROM documents GROUP BY 1, 2"
    ).collect():
        x[(r.gx, r.gy)] = r.s
    sx_tot = sum(x.values())
    dd = {c: _NZ * v - sx_tot for c, v in x.items()}
    den = sum(d * d for d in dd.values())

    stats = {lag: [0, 0] for lag in range(1, _CORR_MAXLAG + 1)}
    for (gx, gy), d1 in dd.items():
        for ox in range(-_CORR_MAXLAG, _CORR_MAXLAG + 1):
            for oy in range(-_CORR_MAXLAG, _CORR_MAXLAG + 1):
                if ox == 0 and oy == 0:
                    continue
                nb = (gx + ox, gy + oy)
                if nb in dd:
                    st = stats[max(abs(ox), abs(oy))]
                    st[0] += 1
                    st[1] += d1 * dd[nb]

    got = {r.lag: r for r in moran_correlogram(spark, SF_CORRECT).collect()}
    assert set(got) == set(stats)
    for lag, (w, num) in stats.items():
        row = got[lag]
        assert (row.w_links, row.num, row.den) == (w, num, den)
        assert _close(row.moran_i, _NZ * num / (w * den), 1e-6)


def test_lisa_markov_transitions_replay(spark):
    """Local-Moran quadrant per tract in two event epochs and the
    quadrant-transition counts replayed with dict arithmetic: rook
    neighbor sums over the densified grid, HH/HL/LH/LL by sign pairs."""
    from chopin_spark.queries.spatial import (
        _EVT_X, _EVT_Y, _NZ, lisa_markov_transitions,
    )
    from chopin_spark.tables import load
    from chopin_spark.zones import TRACT_H, TRACT_NX, TRACT_NY, TRACT_W

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    counts = collections.Counter()
    for r in spark.sql(
        f"SELECT CAST(FLOOR({_EVT_X} / {TRACT_W!r}) AS BIGINT) AS gx,"
        f" CAST(FLOOR({_EVT_Y} / {TRACT_H!r}) AS BIGINT) AS gy,"
        " CASE WHEN day(ts) <= 15 THEN 0 ELSE 1 END AS ep"
        " FROM events WHERE month(ts) = 1"
    ).collect():
        counts[(r.ep, r.gx, r.gy)] += 1

    quad = {}
    for ep in (0, 1):
        x = {(gx, gy): counts.get((ep, gx, gy), 0)
             for gx in range(TRACT_NX) for gy in range(TRACT_NY)}
        s = sum(x.values())
        dd = {c: _NZ * v - s for c, v in x.items()}
        for (gx, gy), d in dd.items():
            nsum = sum(dd.get(nb, 0) for nb in
                       ((gx + 1, gy), (gx - 1, gy), (gx, gy + 1),
                        (gx, gy - 1)) if nb in dd)
            quad[(ep, gx, gy)] = (
                "HH" if d >= 0 and nsum >= 0 else
                "LL" if d < 0 and nsum < 0 else
                "HL" if d >= 0 else "LH"
            )
    expect = collections.Counter(
        (quad[(0, gx, gy)], quad[(1, gx, gy)])
        for gx in range(TRACT_NX) for gy in range(TRACT_NY)
    )
    got = {(r.q_from, r.q_to): r.n_tracts for r in
           lisa_markov_transitions(spark, SF_CORRECT).collect()}
    assert got == dict(expect) and len(got) >= 4


def test_kmv_epoch_intersect_replay(spark):
    """Bottom-64 KMV sketches and the direct union-sample intersection
    estimator replayed with sorted lists over the collected shingle
    stream: Lehmer rehash, per-group and union kth-order statistics,
    match counting, exact-overlap audit."""
    from chopin_spark.queries.sketchq import (
        _EPOCH_MID, _KMV_K, _KMV_M, _OV_TOKS_SPARK, kmv_epoch_intersect,
    )
    from chopin_spark.pages import epoch_sql
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    grp_toks = collections.defaultdict(set)
    for r in spark.sql(
        f"SELECT CASE WHEN {epoch_sql('doc_id')} < {_EPOCH_MID}"
        f" THEN 'a' ELSE 'b' END AS grp, tok FROM ({_OV_TOKS_SPARK})"
    ).collect():
        grp_toks[r.grp].add(r.tok)

    def rehash(t):
        return (t * 1103515245 + 12345) % 2147483647

    hashes = {g: sorted({rehash(t) for t in toks})
              for g, toks in grp_toks.items()}
    bot = {g: h[:_KMV_K] for g, h in hashes.items()}

    def est(bk):
        return (float(len(bk)) if len(bk) < _KMV_K
                else (_KMV_K - 1) * _KMV_M / bk[-1])

    union_bk = sorted(set(bot["a"]) | set(bot["b"]))[:_KMV_K]
    n_both = sum(1 for h in union_bk
                 if h in set(hashes["a"]) and h in set(hashes["b"]))
    est_u = est(union_bk)
    exact_i = len(grp_toks["a"] & grp_toks["b"])
    est_int = n_both / _KMV_K * est_u

    assert exact_i > 0  # before the rel-err division below can raise

    row = kmv_epoch_intersect(spark, SF_CORRECT).collect()[0]
    assert (row.n_both, row.exact_intersect) == (n_both, exact_i)
    assert _close(row.est_a, est(bot["a"]), 1e-4)
    assert _close(row.est_b, est(bot["b"]), 1e-4)
    assert _close(row.est_union, est_u, 1e-4)
    assert _close(row.est_intersect, est_int, 1e-4)
    assert _close(row.intersect_rel_err, (est_int - exact_i) / exact_i, 1e-4)


def test_market_basket_rules_replay(spark):
    """A-priori pair supports, directional confidence, and lift
    replayed from the raw (order, item) baskets with Counters."""
    from chopin_spark.queries.relational import (
        _MB_MINSUP, market_basket_rules,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "lineitem").createOrReplaceTempView("lineitem")
    baskets = collections.defaultdict(set)
    for r in spark.sql(
        "SELECT DISTINCT l_orderkey AS oid,"
        " CAST(l_partkey AS BIGINT) AS item FROM lineitem"
    ).collect():
        baskets[r.oid].add(r.item)
    ntx = len(baskets)
    supp = collections.Counter(
        i for items in baskets.values() for i in items)
    freq = {i for i, s in supp.items() if s >= _MB_MINSUP}
    psup = collections.Counter()
    for items in baskets.values():
        f = sorted(i for i in items if i in freq)
        for ai in range(len(f)):
            for bi in range(ai + 1, len(f)):
                psup[(f[ai], f[bi])] += 1
    expect = {}
    for (i1, i2), sab in psup.items():
        if sab < _MB_MINSUP:
            continue
        for a, c in ((i1, i2), (i2, i1)):
            expect[(a, c)] = (sab, supp[a])

    rows = market_basket_rules(spark, SF_CORRECT).collect()
    got = {(r.antecedent, r.consequent): (r.pair_support, r.ante_support)
           for r in rows}
    assert got == expect and len(got) >= 2
    for r in rows:
        sab, sa = expect[(r.antecedent, r.consequent)]
        assert _close(r.confidence, sab / sa, 1e-4)
        assert _close(r.lift, sab * ntx / (sa * supp[r.consequent]), 1e-4)


def _round_half_away(x, nd=4):
    g = 10 ** nd
    return math.copysign(math.floor(abs(x) * g + 0.5), x) / g


def test_pq_adc_recall_replay(spark):
    """PQ(M=8, K=4) encode, the 32-row ADC distance table, and the
    exact-top-10 audit replayed with integer loops over the collected
    embedding arrays (int8 half-up quantization re-derived inline)."""
    from chopin_spark.queries.simsearch import (
        _DIM, _PQ_K, _PQ_M, _PQ_SUB, pq_adc_recall,
    )
    from chopin_spark.tables import load

    emb = {
        r.vec_id: [math.floor(float(v) * 127 + 0.5) for v in r.embedding]
        for r in load(spark, SF_CORRECT, "embeddings")
        .select("vec_id", "embedding").collect()
    }
    q = emb[0]
    cb = {c: emb[c] for c in range(1, _PQ_K + 1)}

    def sub_d2(a, b, m):
        lo = (m - 1) * _PQ_SUB
        return sum((a[lo + i] - b[lo + i]) ** 2 for i in range(_PQ_SUB))

    dt = {(m, c): sub_d2(q, cb[c], m)
          for m in range(1, _PQ_M + 1) for c in range(1, _PQ_K + 1)}
    approx, exact = {}, {}
    for vid, e in emb.items():
        if vid <= _PQ_K:
            continue
        total = 0
        for m in range(1, _PQ_M + 1):
            code = min(
                (sub_d2(e, cb[c], m) * _PQ_K + (c - 1), c)
                for c in range(1, _PQ_K + 1)
            )[0] % _PQ_K + 1
            total += dt[(m, code)]
        approx[vid] = total
        exact[vid] = sum((e[i] - q[i]) ** 2 for i in range(_DIM))

    ar = sorted(approx.items(), key=lambda kv: (kv[1], kv[0]))[:10]
    top_exact = {v for v, _ in
                 sorted(exact.items(), key=lambda kv: (kv[1], kv[0]))[:10]}
    expect = [(rk + 1, vid, d2, int(vid in top_exact))
              for rk, (vid, d2) in enumerate(ar)]
    got = [(r.rank, r.vec_id, r.approx_d2, r.in_exact_top10)
           for r in pq_adc_recall(spark, SF_CORRECT)
           .orderBy("rank").collect()]
    assert got == expect and any(f for (_, _, _, f) in expect)


def test_jl_projection_recall_replay(spark):
    """JL ±1 projection (hash signs, odd-prime parity), exact int64
    projected L2² top-10, and the float-cosine audit replayed with
    plain loops in the SQL's fold order."""
    from chopin_spark.queries.simsearch import (
        _DIM, _JL_K, jl_projection_recall,
    )
    from chopin_spark.tables import load

    raw = {
        r.vec_id: list(r.embedding)
        for r in load(spark, SF_CORRECT, "embeddings")
        .select("vec_id", "embedding").collect()
    }

    def sign(j, i):
        return 1 - 2 * (((j * 2654435761 + i * 40503) % 97) % 2)

    def proj(e):
        return [
            sum(sign(j, i) * math.floor(float(e[i - 1]) * 127 + 0.5)
                for i in range(1, _DIM + 1))
            for j in range(1, _JL_K + 1)
        ]

    pj = {vid: proj(e) for vid, e in raw.items()}
    qp, qe = pj[0], raw[0]
    l2 = {vid: sum((p[j] - qp[j]) ** 2 for j in range(_JL_K))
          for vid, p in pj.items() if vid != 0}

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    cos = {
        vid: _round_half_away(
            fold_dot(e, qe)
            / (math.sqrt(fold_dot(e, e)) * math.sqrt(fold_dot(qe, qe))))
        for vid, e in raw.items() if vid != 0
    }
    float_top = {v for v, _ in
                 sorted(cos.items(), key=lambda kv: (-kv[1], kv[0]))[:10]}
    jr = sorted(l2.items(), key=lambda kv: (kv[1], kv[0]))[:10]
    expect = [(rk + 1, vid, d, int(vid in float_top))
              for rk, (vid, d) in enumerate(jr)]
    got = [(r.rank, r.vec_id, r.l2sq, r.in_float_top10)
           for r in jl_projection_recall(spark, SF_CORRECT)
           .orderBy("rank").collect()]
    assert got == expect and any(f for (_, _, _, f) in expect)


def test_query_likelihood_replay(spark):
    """Dirichlet-smoothed query likelihood replayed with Counters:
    collection LM from total token mass, absent-term smoothing terms
    included, round-then-rank with the doc_id tie-break."""
    from chopin_spark.queries.textops import (
        _BM_K, _BM_TERMS, _QL_MU, query_likelihood_topk,
    )
    from chopin_spark.tables import load

    docs = {r.doc_id: r.text.split(" ") for r in
            load(spark, SF_CORRECT, "documents")
            .select("doc_id", "text").collect()}
    ct = sum(len(t) for t in docs.values())
    cf = {t: sum(toks.count(t) for toks in docs.values())
          for t in _BM_TERMS}
    scored = {}
    for did, toks in docs.items():
        tfs = {t: toks.count(t) for t in _BM_TERMS}
        if not any(tfs.values()):
            continue
        s = sum(math.log((tfs[t] + _QL_MU * (cf[t] / ct))
                         / (len(toks) + _QL_MU)) for t in _BM_TERMS)
        scored[did] = (_round_half_away(s), sum(1 for t in _BM_TERMS
                                                if tfs[t] > 0))
    ranked = sorted(scored.items(),
                    key=lambda kv: (-kv[1][0], kv[0]))[:_BM_K]
    expect = [(rk + 1, did, sc, nm)
              for rk, (did, (sc, nm)) in enumerate(ranked)]
    got = [(r.rank, r.doc_id, r.score_ql, r.n_matched)
           for r in query_likelihood_topk(spark, SF_CORRECT).collect()]
    assert got == expect and len(got) == _BM_K


def test_toponym_gazetteer_geocode_replay(spark):
    """The full gazetteer pipeline — vocab, two hash senses,
    language-prior disambiguation, population-weighted micro-degree
    centroid — replayed with dicts; the S2 level-8/4 rollup re-derived
    through the numpy Hilbert chain (itself pinned to the SQL twin and
    to published tokens in test_s2)."""
    from chopin_spark import s2
    from chopin_spark.queries.pagespipe import (
        _TOPO_LANGS, _TOPO_MIN_C, toponym_gazetteer_geocode,
    )
    from chopin_spark.tables import load

    P30 = 1_000_000_007
    rows = load(spark, SF_CORRECT, "documents") \
        .select("doc_id", "lang", "text").collect()
    vocab = collections.Counter(
        t for r in rows for t in r.text.split(" "))

    def fold(t):
        h = 0
        for ch in t:
            h = (h * 31 + ord(ch)) % P30
        return h

    gaz = {}
    for t, c in vocab.items():
        if c < _TOPO_MIN_C:
            continue
        f = fold(t)
        senses = []
        for s in (0, 1):
            pop = ((f * (s * 2 + 3) + 17) % 99991) + c
            lang = _TOPO_LANGS[(f * (s + 2)) % 5]
            h2 = (f * 7 + s * 31) % 999983
            lon = -125.0 + 58.0 * (((h2 * 2654435761) % 999983) / 999983.0)
            lat = 25.0 + 16.0 * (((h2 * 1103515245 + 12345) % 999983)
                                 / 999983.0)
            senses.append((s, pop, lang,
                           math.floor(lon * 1e6 + 0.5),
                           math.floor(lat * 1e6 + 0.5)))
        gaz[t] = senses

    cent = {}
    for r in rows:
        mention = collections.Counter(
            t for t in r.text.split(" ") if t in gaz)
        if not mention:
            continue
        wsum = lx = ly = nm = 0
        for t, m in mention.items():
            s, pop, _, lon_u, lat_u = max(
                gaz[t],
                key=lambda sn: (int(sn[2] == r.lang), sn[1], -sn[0]))
            wsum += m * pop
            lx += m * pop * lon_u
            ly += m * pop * lat_u
            nm += m
        cent[r.doc_id] = (float(lx) / wsum / 1e6, float(ly) / wsum / 1e6, nm)

    import numpy as np
    dids = sorted(cent)
    lon = np.array([cent[d][0] for d in dids])
    lat = np.array([cent[d][1] for d in dids])
    f, u, v = s2.xyz_to_face_uv(*s2.lonlat_to_xyz(lon, lat))
    i = s2.st_to_ij(s2.uv_to_st(u), 8)
    j = s2.st_to_ij(s2.uv_to_st(v), 8)
    pref = s2.prefix_from_cell_id(s2.cell_id(f, i, j, 8), 8)
    expect = {}
    for d, p in zip(dids, pref):
        cell4 = int(p) >> 8
        n, m, first = expect.get(cell4, (0, 0, d))
        expect[cell4] = (n + 1, m + cent[d][2], min(first, d))
    got = {r.s2_cell4: (r.n_docs, r.n_mentions, r.first_doc)
           for r in toponym_gazetteer_geocode(spark, SF_CORRECT).collect()}
    assert got == expect and len(got) >= 3


def test_bitext_mining_pairs_replay(spark):
    """Rare-shingle anchor blocking, the 2:1 length gate, and anchor
    Jaccard replayed with sets: per-token 31-poly hashes, 5-gram
    polynomial shingles, df-capped inverted index, cross-language
    pair counting."""
    from chopin_spark.queries.textmine import (
        _BT_DF_CAP, _BT_MIN_ANCHORS, bitext_mining_pairs,
    )
    from chopin_spark.tables import load

    P30, B = 1_000_000_007, 1_000_003
    rows = load(spark, SF_CORRECT, "documents") \
        .select("doc_id", "lang", "text").collect()

    def tokhash(t):
        h = 0
        for ch in t:
            h = (h * 31 + ord(ch)) % P30
        return h

    sh, n_tok = {}, {}
    for r in rows:
        toks = r.text.split(" ")
        n_tok[r.doc_id] = len(toks)
        uh = [tokhash(t) for t in toks]
        ss = set()
        for i in range(len(uh) - 4):
            h = 0
            for k in range(5):
                h = (h * B + uh[i + k]) % P30
            ss.add(h)
        sh[r.doc_id] = (r.lang, ss)

    df = collections.Counter(s for (_, ss) in sh.values() for s in ss)
    anchors = {d: (lang, {s for s in ss if df[s] <= _BT_DF_CAP})
               for d, (lang, ss) in sh.items()}
    expect = {}
    docs = sorted(anchors)
    for x in docs:
        lx, ax = anchors[x]
        for y in docs:
            ly, ay = anchors[y]
            if not lx < ly:
                continue
            shared = len(ax & ay)
            if shared < _BT_MIN_ANCHORS:
                continue
            t1, t2 = n_tok[x], n_tok[y]
            if 2 * min(t1, t2) < max(t1, t2):
                continue
            jac = shared / (len(ax) + len(ay) - shared)
            expect[(x, y)] = (lx, ly, shared, t1, t2)
            expect[(x, y)] += (jac,)

    out = bitext_mining_pairs(spark, SF_CORRECT).collect()
    got = {(r.d1, r.d2): (r.lang1, r.lang2, r.n_shared, r.tok1, r.tok2)
           for r in out}
    assert got == {k: v[:5] for k, v in expect.items()} and len(got) >= 2
    for r in out:
        assert _close(r.anchor_jaccard, expect[(r.d1, r.d2)][5], 1e-4)


def test_soundex_blocking_audit_replay(spark):
    """The h/w-less soundex CASE-chain encoding, the corrupted-twin
    recall audit, and the (code, nation) block-size stats replayed with
    a plain character loop."""
    from chopin_spark.queries.relational import (
        _FS_T, _SDX_LEN, soundex_blocking_audit,
    )
    from chopin_spark.tables import load

    def digit(ch):
        return ("1" if ch in "bfpv" else "2" if ch in "cgjkqsxz"
                else "3" if ch in "dt" else "4" if ch == "l"
                else "5" if ch in "mn" else "6" if ch == "r" else "0")

    def sdx(nm):
        digs, prev = [], None
        for pos, ch in enumerate(nm[:_SDX_LEN].lower(), start=1):
            d = digit(ch)
            if pos > 1 and d != "0" and d != prev:
                digs.append(d)
            prev = d
        return nm[0].upper() + "".join((digs + ["0", "0", "0"])[:3])

    cust = [(r.c_custkey, r.c_name, r.c_nationkey) for r in
            load(spark, SF_CORRECT, "customer")
            .select("c_custkey", "c_name", "c_nationkey").collect()]
    n = len(cust)
    name_eq = sdx_eq = 0
    blocks = collections.Counter()
    for k, nm, nat in cust:
        tnm = "Cust0mer" + nm[8:] if (k * _FS_T) % 100 < 30 else nm
        name_eq += int(nm == tnm)
        sdx_eq += int(sdx(nm) == sdx(tnm))
        blocks[(sdx(nm), nat)] += 1

    row = soundex_blocking_audit(spark, SF_CORRECT).collect()[0]
    assert (row.n_true_pairs, row.exact_name_matches,
            row.soundex_matches) == (n, name_eq, sdx_eq)
    assert (row.n_blocks, row.max_block, row.sum_block_sq) == (
        len(blocks), max(blocks.values()),
        sum(v * v for v in blocks.values()))
    assert _close(row.exact_recall, name_eq / n, 1e-4)
    assert _close(row.soundex_recall, sdx_eq / n, 1e-4)
    assert 0 < name_eq < n and sdx_eq > name_eq


def test_ndcg_bm25_eval_replay(spark):
    """NDCG@10 per query term replayed with plain loops: BM25 scores,
    round-then-rank, the 7/3/1 gain ladder, and the ideal reordering
    by (gain desc, bm25-rank asc)."""
    from chopin_spark.queries.textops import (
        _BM_B, _BM_K1, _BM_TERMS, _NDCG_K, ndcg_bm25_eval,
    )
    from chopin_spark.tables import load

    docs = {r.doc_id: r.text.split(" ") for r in
            load(spark, SF_CORRECT, "documents")
            .select("doc_id", "text").collect()}
    n_docs = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n_docs
    expect = {}
    for t in _BM_TERMS:
        post = {d: toks.count(t) for d, toks in docs.items()
                if t in toks}
        df = len(post)
        idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        scored = []
        for d, tf in post.items():
            s = idf * (tf * (_BM_K1 + 1.0)) / (
                tf + _BM_K1 * (1.0 - _BM_B + _BM_B * len(docs[d]) / avgdl))
            scored.append((_round_half_away(s), d, min(tf, 3)))
        scored.sort(key=lambda x: (-x[0], x[1]))
        gains = [7 if rel >= 3 else 3 if rel == 2 else 1
                 for (_, _, rel) in scored]
        dcg = sum(g / math.log2(rnk + 2)
                  for rnk, g in enumerate(gains[:_NDCG_K]))
        ideal = sorted(range(len(gains)), key=lambda i: (-gains[i], i))
        idcg = sum(gains[i] / math.log2(irnk + 2)
                   for irnk, i in enumerate(ideal[:_NDCG_K]))
        expect[t] = (df, dcg, idcg, dcg / idcg)

    got = {r.term: r for r in ndcg_bm25_eval(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect)
    for t, (nrel, dcg, idcg, ndcg) in expect.items():
        row = got[t]
        assert row.n_rel == nrel
        assert _close(row.dcg_at10, dcg, 1e-4)
        assert _close(row.idcg_at10, idcg, 1e-4)
        assert _close(row.ndcg_at10, ndcg, 1e-4)
        assert 0 < ndcg <= 1


def test_fellegi_sunter_linkage_replay(spark):
    """FS agreement-weight scoring over nation blocks replayed with a
    double loop: the three corrupted-twin rules, fixed ln(m/u)
    weights, link/possible/non-link bands, per-band precision."""
    from chopin_spark.queries.relational import (
        _FS_B, _FS_S, _FS_T, fellegi_sunter_linkage,
    )
    from chopin_spark.tables import load

    cust = [
        (r.c_custkey, r.c_nationkey, r.c_name, r.c_mktsegment,
         math.floor(float(r.c_acctbal) * 100 + 0.5))
        for r in load(spark, SF_CORRECT, "customer")
        .select("c_custkey", "c_nationkey", "c_name", "c_mktsegment",
                "c_acctbal").collect()
    ]
    twin = [
        (k, nat,
         "Cust0mer" + nm[8:] if (k * _FS_T) % 100 < 30 else nm,
         "CORRUPTED" if (k * _FS_S) % 100 < 20 else seg,
         cents + (k * _FS_B) % 2001 - 1000)
        for (k, nat, nm, seg, cents) in cust
    ]
    by_nat = collections.defaultdict(list)
    for t in twin:
        by_nat[t[1]].append(t)
    bands = collections.defaultdict(lambda: [0, 0])
    for k, nat, nm, seg, cents in cust:
        for tk, _, tnm, tseg, tcents in by_nat[nat]:
            score = (6.551080335043404 if nm == tnm
                     else -1.2029723039923526)
            score += (1.3862943611198906 if seg == tseg
                      else -1.3862943611198906)
            score += (3.912023005428146 if abs(cents - tcents) <= 500
                      else -0.6830968447064438)
            dec = ("link" if score >= 6.0
                   else "possible" if score >= 0.0 else "non-link")
            bands[dec][0] += 1
            bands[dec][1] += int(k == tk)

    got = {r.decision: r for r in
           fellegi_sunter_linkage(spark, SF_CORRECT).collect()}
    assert set(got) == set(bands) and "link" in bands
    for dec, (n, true) in bands.items():
        row = got[dec]
        assert (row.n_pairs, row.n_true_matches) == (n, true)
        assert _close(row.precision_band, true / n, 1e-6)


def test_weighted_priority_sample_replay(spark):
    """Efraimidis–Spirakis keys −ln(u)/w replayed per doc with the
    LCG draw; round-to-1e-6 then rank, doc_id ties."""
    from chopin_spark.queries.trainprep import (
        _AES_K, weighted_priority_sample,
    )
    from chopin_spark.tables import load

    keyed = []
    for r in load(spark, SF_CORRECT, "documents") \
            .select("doc_id", "lang", "n_chars").collect():
        if r.n_chars <= 0:
            continue
        u = (r.doc_id * 2654435761 + 40503) % 999983 + 1
        k = _round_half_away(-math.log(u / 999983.0) / float(r.n_chars), 6)
        keyed.append((k, r.doc_id, r.lang, r.n_chars))
    keyed.sort()
    expect = [(d, lang, nc, k, rnk + 1)
              for rnk, (k, d, lang, nc) in enumerate(keyed[:_AES_K])]
    got = [(r.doc_id, r.lang, r.n_chars, r.aes_key, r.rank)
           for r in weighted_priority_sample(spark, SF_CORRECT)
           .orderBy("rank").collect()]
    assert [g[:3] + g[4:] for g in got] == \
        [e[:3] + e[4:] for e in expect]
    for g, e in zip(got, expect):
        assert _close(g[3], e[3], 1e-6)


def test_crawl_politeness_schedule_replay(spark):
    """The prefix-max window formulation replayed with the DIRECT
    Lindley recurrence start_k = max(arr_k, start_{k-1} + D) — the
    sequential form the window scan closes over."""
    from chopin_spark.queries.webtext import (
        _POL_D_S, crawl_politeness_schedule,
    )
    from chopin_spark.tables import load

    arrs = collections.defaultdict(list)
    for r in load(spark, SF_CORRECT, "documents") \
            .select("doc_id").collect():
        d = r.doc_id
        arr = (1704067200 + (d * 48271) % 31536000) % 86400
        arrs[d % 97].append((arr, d))

    got = {r.host_num: r for r in
           crawl_politeness_schedule(spark, SF_CORRECT).collect()}
    assert set(got) == set(arrs)
    for host, q in arrs.items():
        q.sort()
        start = None
        waits, starts = [], []
        for arr, _ in q:
            start = arr if start is None else max(arr, start + _POL_D_S)
            starts.append(start)
            waits.append(start - arr)
        row = got[host]
        assert row.n_fetches == len(q)
        assert row.makespan_s == starts[-1] - q[0][0]
        assert row.total_wait_s == sum(waits)
        assert row.max_wait_s == max(waits)


def test_geary_c_replay(spark):
    """Geary's C numerator Σw(d1−d2)², den Σdd², and the (n−1)/2W·den
    scaling replayed with the same dict arithmetic as the Moran
    replay — squared DIFFERENCES, not products."""
    from chopin_spark.queries.spatial import (
        _DOC_X, _DOC_Y, _NZ, geary_c_tracts,
    )
    from chopin_spark.tables import load
    from chopin_spark.zones import TRACT_H, TRACT_NX, TRACT_NY, TRACT_W

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    x = {(gx, gy): 0 for gx in range(TRACT_NX) for gy in range(TRACT_NY)}
    for r in spark.sql(
        f"SELECT CAST(FLOOR({_DOC_X} / {TRACT_W!r}) AS BIGINT) AS gx,"
        f" CAST(FLOOR({_DOC_Y} / {TRACT_H!r}) AS BIGINT) AS gy,"
        f" CAST(SUM(n_chars) AS BIGINT) AS s FROM documents GROUP BY 1, 2"
    ).collect():
        x[(r.gx, r.gy)] = r.s
    s = sum(x.values())
    dd = {c: _NZ * v - s for c, v in x.items()}
    w = num = 0
    for (gx, gy), d1 in dd.items():
        for nb in ((gx + 1, gy), (gx - 1, gy), (gx, gy + 1), (gx, gy - 1)):
            if nb in dd:
                w += 1
                num += (d1 - dd[nb]) ** 2
    den = sum(d * d for d in dd.values())

    row = geary_c_tracts(spark, SF_CORRECT).collect()[0]
    assert (row.n_zones, row.w_links, row.num, row.den) == (_NZ, w, num, den)
    assert _close(row.geary_c, (_NZ - 1) * num / (2.0 * w * den), 1e-6)
    assert row.geary_c > 0


def test_join_count_replay(spark):
    """BB/BW/WW rook join counts over the above-mean indicator and
    their free-sampling expectations replayed with sets."""
    from chopin_spark.queries.spatial import (
        _DOC_X, _DOC_Y, _NZ, join_count_tracts,
    )
    from chopin_spark.tables import load
    from chopin_spark.zones import TRACT_H, TRACT_NX, TRACT_NY, TRACT_W

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    x = {(gx, gy): 0 for gx in range(TRACT_NX) for gy in range(TRACT_NY)}
    for r in spark.sql(
        f"SELECT CAST(FLOOR({_DOC_X} / {TRACT_W!r}) AS BIGINT) AS gx,"
        f" CAST(FLOOR({_DOC_Y} / {TRACT_H!r}) AS BIGINT) AS gy,"
        f" CAST(SUM(n_chars) AS BIGINT) AS s FROM documents GROUP BY 1, 2"
    ).collect():
        x[(r.gx, r.gy)] = r.s
    s = sum(x.values())
    b = {c: int(_NZ * v > s) for c, v in x.items()}
    wdir = bb = bw = ww = 0
    for (gx, gy), b1 in b.items():
        for nb in ((gx + 1, gy), (gx - 1, gy), (gx, gy + 1), (gx, gy - 1)):
            if nb in b:
                b2 = b[nb]
                wdir += 1
                bb += b1 * b2
                ww += (1 - b1) * (1 - b2)
                bw += b1 + b2 - 2 * b1 * b2
    nb_black, n = sum(b.values()), _NZ

    row = join_count_tracts(spark, SF_CORRECT).collect()[0]
    assert (row.n_zones, row.n_black, row.w_links) == (n, nb_black, wdir // 2)
    assert (row.bb, row.bw, row.ww) == (bb // 2, bw // 2, ww // 2)
    assert _close(row.e_bb,
                  wdir / 2.0 * nb_black * (nb_black - 1) / (n * (n - 1.0)),
                  1e-6)
    assert _close(row.e_bw,
                  float(wdir) * nb_black * (n - nb_black) / (n * (n - 1.0)),
                  1e-6)
    assert _close(row.e_ww,
                  wdir / 2.0 * (n - nb_black) * (n - nb_black - 1)
                  / (n * (n - 1.0)), 1e-6)
    assert bb > 0 and bw > 0


def test_stkde_events_replay(spark):
    """Space-time kernel density replayed with loops: 4096-lattice
    quantized Gaussian factors, both cutoffs, per-node integer sums."""
    from chopin_spark.queries.temporalq import (
        _STK_HS, _STK_HT, _STK_NT, _STK_NX, _STK_NY, _STK_RS, _STK_RT,
        stkde_events,
    )
    from chopin_spark import sqlexpr as _sx
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    ev = [(r.x, r.y, r.day) for r in spark.sql(
        f"SELECT {_sx.x_expr('event_id')} AS x, {_sx.y_expr('event_id')} AS y,"
        " CAST(FLOOR(CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS DOUBLE)"
        " / 86400000000.0)"
        " AS BIGINT) AS day FROM events"
    ).collect()]
    d0 = min(d for (_, _, d) in ev)
    cw, ch = 800_000.0 / _STK_NX, 600_000.0 / _STK_NY
    expect = {}
    for gi in range(_STK_NX):
        for gj in range(_STK_NY):
            for tb in range(_STK_NT):
                cx, cy = (gi + 0.5) * cw, (gj + 0.5) * ch
                tc = 2.5 + 5.0 * tb
                n_w = wsum = 0
                for (x, y, day) in ev:
                    d2 = (x - cx) ** 2 + (y - cy) ** 2
                    td = (day - d0 + 0.5) - tc
                    if d2 <= _STK_RS * _STK_RS and abs(td) <= _STK_RT:
                        ws = math.floor(
                            4096 * math.exp(-d2 / (2.0 * _STK_HS ** 2))
                            + 0.5)
                        wt = math.floor(
                            4096 * math.exp(-td * td / (2.0 * _STK_HT ** 2))
                            + 0.5)
                        n_w += 1
                        wsum += ws * wt
                if n_w:
                    expect[(gi, gj, tb)] = (n_w, wsum / (4096.0 * 4096.0))

    got = {(r.gi, r.gj, r.tb): r for r in
           stkde_events(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect) and len(got) >= 20
    for k, (n_w, inten) in expect.items():
        assert got[k].n_within == n_w
        assert _close(got[k].intensity, inten, 1e-4)


def test_spatial_scan_llr_replay(spark):
    """Kulldorff circular-window Poisson LLR replayed with loops over
    the per-tract (pop, cases) table; the injected SW cluster must
    surface as the max-LLR window."""
    from chopin_spark.queries.spatial import (
        _CV_TX, _CV_TY, spatial_scan_llr,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    t = {}
    for r in spark.sql(
        f"SELECT {_CV_TX} AS tx, {_CV_TY} AS ty, COUNT(*) AS pop,"
        f" SUM(CASE WHEN doc_id % 7 = 0 OR ({_CV_TX} < 4 AND {_CV_TY} < 4)"
        " THEN 1 ELSE 0 END) AS cases FROM documents GROUP BY 1, 2"
    ).collect():
        t[(r.tx, r.ty)] = (r.pop, r.cases)
    mm = float(sum(p for p, _ in t.values()))
    nn = float(sum(c for _, c in t.values()))
    expect = {}
    for (ctx, cty) in t:
        for rr in (1, 2, 3):
            wp = wc = 0
            for (ox, oy), (p, c) in t.items():
                if (ox - ctx) ** 2 + (oy - cty) ** 2 <= rr * rr:
                    wp += p
                    wc += c
            llr = 0.0
            if wc * mm > nn * wp:
                if wc > 0:
                    llr += wc * math.log(wc / (nn * wp / mm))
                if nn - wc > 0:
                    llr += (nn - wc) * math.log(
                        (nn - wc) / (nn - nn * wp / mm))
            expect[(ctx, cty, rr)] = (wp, wc, llr)

    got = {(r.ctx, r.cty, r.r): r for r in
           spatial_scan_llr(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect)
    for k, (wp, wc, llr) in expect.items():
        assert (got[k].w_pop, got[k].w_cases) == (wp, wc)
        assert _close(got[k].llr, llr, 1e-6)
    best = max(got.values(), key=lambda r: r.llr)
    assert best.ctx < 4 and best.cty < 4 and best.llr > 0


def test_event_volume_anomalies_replay(spark):
    """The division-free z²>4 integer flag and the reported z replayed
    from raw (type, day) counts."""
    from chopin_spark.queries.temporalq import event_volume_anomalies
    from chopin_spark.tables import load

    daily = collections.Counter()
    for r in load(spark, SF_CORRECT, "events") \
            .selectExpr("event_type", "CAST(ts AS DATE) AS day").collect():
        daily[(r.event_type, str(r.day))] += 1
    stats = {}
    for (et, _), c in daily.items():
        n, s, q = stats.get(et, (0, 0, 0))
        stats[et] = (n + 1, s + c, q + c * c)
    expect = {}
    for (et, day), c in daily.items():
        n, s, q = stats[et]
        if (c * n - s) ** 2 > 4 * (n * q - s * s):
            expect[(et, day)] = (c, (c * n - s) / math.sqrt(n * q - s * s))

    got = {(r.event_type, r.day): r for r in
           event_volume_anomalies(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect) and len(got) >= 2
    for k, (c, z) in expect.items():
        assert got[k].n_events == c
        assert _close(got[k].z, z, 1e-4)


def test_rolling_7day_user_volume_replay(spark):
    """The RANGE-frame 7-day window replayed with an explicit
    day-interval filter over each user's (day, count, cents) rows."""
    from chopin_spark.queries.temporalq import rolling_7day_user_volume
    from chopin_spark.tables import load

    per = collections.defaultdict(lambda: collections.defaultdict(
        lambda: [0, 0]))
    for r in load(spark, SF_CORRECT, "events").selectExpr(
        "user_id",
        "CAST(FLOOR(CAST(unix_micros(CAST(ts AS TIMESTAMP)) AS DOUBLE)"
        " / 86400000000.0) AS BIGINT) AS day",
        "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents",
    ).collect():
        st = per[r.user_id][r.day]
        st[0] += 1
        st[1] += r.cents

    expect = {}
    for uid, days in per.items():
        for day, (n, _) in days.items():
            win = [days[d] for d in days if day - 6 <= d <= day]
            expect[(uid, day)] = (
                n, sum(w[0] for w in win),
                round(sum(w[1] for w in win) / 100.0, 2))

    got = {(r.user_id, r.day): (r.n_events, r.n_7day, r.value_7day)
           for r in rolling_7day_user_volume(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect)
    for k, (n, n7, v7) in expect.items():
        assert got[k][0] == n and got[k][1] == n7
        assert abs(got[k][2] - v7) < 0.011  # both round cents/100 to 2dp
    assert any(g[1] > g[0] for g in got.values())


def test_conjunctive_term_search_replay(spark):
    """AND-retrieval replayed with set logic: docs containing all
    three query terms, with per-doc hit counts."""
    from chopin_spark.queries.textops import (
        _AND_TERMS, conjunctive_term_search,
    )
    from chopin_spark.tables import load

    expect = {}
    for r in load(spark, SF_CORRECT, "documents") \
            .select("doc_id", "text").collect():
        toks = r.text.split(" ")
        hits = [t for t in toks if t in _AND_TERMS]
        if len(set(hits)) == len(_AND_TERMS):
            expect[r.doc_id] = (len(hits), len(_AND_TERMS))
    got = {r.doc_id: (r.n_hits, r.n_terms) for r in
           conjunctive_term_search(spark, SF_CORRECT).collect()}
    assert got == expect and 0 < len(got)


def test_quality_percentile_norm_replay(spark):
    """Histogram-cumulative percentile replayed with a sorted scan:
    pctl = |docs with n_chars <= v| / n."""
    from chopin_spark.queries.webtext import quality_percentile_norm
    from chopin_spark.tables import load

    vals = [(r.doc_id, r.n_chars) for r in
            load(spark, SF_CORRECT, "documents")
            .select("doc_id", "n_chars").collect()]
    n = len(vals)
    counts = collections.Counter(v for _, v in vals)
    cum, cle = {}, 0
    for v in sorted(counts):
        cle += counts[v]
        cum[v] = cle

    got = {r.doc_id: (r.n_chars, r.len_pctl) for r in
           quality_percentile_norm(spark, SF_CORRECT).collect()}
    assert set(got) == {d for d, _ in vals}
    for d, v in vals:
        assert got[d][0] == v
        assert _close(got[d][1], cum[v] / n, 1e-4)
    assert max(p for _, p in got.values()) == 1.0


def test_forecast_revenue_q6_replay(spark):
    """Q6 scan-filter-agg replayed row-by-row with the quantized
    revenue-delta cents discipline."""
    from chopin_spark.queries.relational import forecast_revenue_q6
    from chopin_spark.tables import load

    n = rev = 0
    for r in load(spark, SF_CORRECT, "lineitem").selectExpr(
        "l_shipdate", "CAST(l_discount AS DOUBLE) AS disc",
        "CAST(l_quantity AS DOUBLE) AS qty",
        "CAST(l_extendedprice AS DOUBLE) AS price",
    ).collect():
        if (str(r.l_shipdate) >= "1996-01-01"
                and str(r.l_shipdate) < "1997-01-01"
                and 0.05 <= r.disc <= 0.07 and r.qty < 24):
            n += 1
            rev += math.floor(r.price * r.disc * 10000 + 0.5)
    row = forecast_revenue_q6(spark, SF_CORRECT).collect()[0]
    assert row.n_lines == n and n > 0
    assert _close(row.revenue_delta, rev / 10000.0, 1e-4)


def test_cube_lang_source_replay(spark):
    """All four CUBE grouping sets replayed with explicit Counters and
    GROUPING-flag bookkeeping."""
    from chopin_spark.queries.relational import cube_lang_source
    from chopin_spark.tables import load

    base = [(r.lang, r.source, int(r.n_chars)) for r in
            load(spark, SF_CORRECT, "documents")
            .select("lang", "source", "n_chars").collect()]
    expect = collections.defaultdict(lambda: [0, 0])
    for lang, src, nc in base:
        for key in ((lang, src, 0, 0), (lang, "ALL", 0, 1),
                    ("ALL", src, 1, 0), ("ALL", "ALL", 1, 1)):
            st = expect[key]
            st[0] += 1
            st[1] += nc
    got = {(r.lang, r.source, r.g_lang, r.g_source):
           (r.n_docs, r.sum_chars)
           for r in cube_lang_source(spark, SF_CORRECT).collect()}
    assert got == {k: tuple(v) for k, v in expect.items()}


def test_shipmode_priority_q12_replay(spark):
    """Q12 join + conditional split replayed with a dict join."""
    from chopin_spark.queries.relational import shipmode_priority_q12
    from chopin_spark.tables import load

    prio = {r.o_orderkey: r.o_orderpriority for r in
            load(spark, SF_CORRECT, "orders")
            .select("o_orderkey", "o_orderpriority").collect()}
    expect = collections.defaultdict(lambda: [0, 0])
    for r in load(spark, SF_CORRECT, "lineitem").selectExpr(
        "l_orderkey", "l_linestatus", "CAST(l_shipdate AS STRING) AS sd"
    ).collect():
        if "1997-01-01" <= r.sd < "1998-01-01" and r.l_orderkey in prio:
            hi = prio[r.l_orderkey] in ("1-URGENT", "2-HIGH")
            expect[r.l_linestatus][0 if hi else 1] += 1
    got = {r.ship_class: (r.high_line_count, r.low_line_count)
           for r in shipmode_priority_q12(spark, SF_CORRECT).collect()}
    assert got == {k: tuple(v) for k, v in expect.items()} and len(got) >= 1


def test_customer_distribution_q13_replay(spark):
    """Q13 count-of-counts replayed with two Counters; zero-order
    customers must appear in the c_count=0 bucket."""
    from chopin_spark.queries.relational import customer_distribution_q13
    from chopin_spark.tables import load

    per_cust = collections.Counter()
    for r in load(spark, SF_CORRECT, "orders") \
            .select("o_custkey", "o_orderpriority").collect():
        if r.o_orderpriority != "1-URGENT":
            per_cust[r.o_custkey] += 1
    dist = collections.Counter(
        per_cust.get(r.c_custkey, 0)
        for r in load(spark, SF_CORRECT, "customer")
        .select("c_custkey").collect())
    got = {r.c_count: r.custdist for r in
           customer_distribution_q13(spark, SF_CORRECT).collect()}
    assert got == dict(dist) and 0 in got


def _li_rows(spark, cols):
    from chopin_spark.tables import load

    return load(spark, SF_CORRECT, "lineitem").selectExpr(*cols).collect()


def test_order_priority_q4_replay(spark):
    """Q4 EXISTS decorrelation replayed with a set of late-shipping
    orderkeys."""
    from chopin_spark.queries.relational import order_priority_q4
    from chopin_spark.tables import load

    odate = {r.o_orderkey: (str(r.o_orderdate), r.o_orderpriority)
             for r in load(spark, SF_CORRECT, "orders")
             .select("o_orderkey", "o_orderdate", "o_orderpriority")
             .collect()}
    late = set()
    for r in _li_rows(spark, ["l_orderkey",
                              "CAST(l_shipdate AS STRING) AS sd"]):
        od = odate.get(r.l_orderkey)
        if od and r.sd > od[0]:
            late.add(r.l_orderkey)
    expect = collections.Counter(
        pr for ok, (od, pr) in odate.items()
        if "1996-01-01" <= od < "1996-04-01" and ok in late)
    got = {r.o_orderpriority: r.order_count for r in
           order_priority_q4(spark, SF_CORRECT).collect()}
    assert got == dict(expect) and len(got) >= 3


def test_returned_items_q10_replay(spark):
    """Q10 grouped top-20 replayed with dict joins and the quantized
    revenue order (revenue desc, custkey)."""
    from chopin_spark.queries.relational import returned_items_q10
    from chopin_spark.tables import load

    cust = {r.c_custkey: (r.c_name, r.c_nationkey) for r in
            load(spark, SF_CORRECT, "customer")
            .select("c_custkey", "c_name", "c_nationkey").collect()}
    nat = {r.n_nationkey: r.n_name for r in
           load(spark, SF_CORRECT, "nation")
           .select("n_nationkey", "n_name").collect()}
    owin = {r.o_orderkey: r.o_custkey for r in
            load(spark, SF_CORRECT, "orders")
            .selectExpr("o_orderkey", "o_custkey",
                        "CAST(o_orderdate AS STRING) AS od").collect()
            if "1996-01-01" <= r.od < "1996-07-01"}
    agg = collections.defaultdict(lambda: [0, 0])
    for r in _li_rows(spark, [
            "l_orderkey", "l_returnflag",
            "CAST(l_extendedprice AS DOUBLE) AS price",
            "CAST(l_discount AS DOUBLE) AS disc"]):
        ck = owin.get(r.l_orderkey)
        if ck is not None and r.l_returnflag == "R":
            st = agg[ck]
            st[0] += 1
            st[1] += math.floor(r.price * (1 - r.disc) * 10000 + 0.5)
    ranked = sorted(
        ((ck, n, rev) for ck, (n, rev) in agg.items()),
        key=lambda t: (-t[2], t[0]))[:20]
    expect = [(ck, cust[ck][0], nat[cust[ck][1]], n, rev / 10000.0)
              for ck, n, rev in ranked]
    got = [(r.c_custkey, r.c_name, r.n_name, r.n_lines, r.revenue)
           for r in returned_items_q10(spark, SF_CORRECT).collect()]
    assert [g[:4] for g in got] == [e[:4] for e in expect] and len(got) == 20
    for g, e in zip(got, expect):
        assert _close(g[4], e[4], 1e-4)


def test_disjunctive_parts_q19_replay(spark):
    """Q19 disjunction-of-conjunctions replayed with a literal
    three-branch predicate."""
    from chopin_spark.queries.relational import disjunctive_parts_q19
    from chopin_spark.tables import load

    part = {r.p_partkey: (r.p_brand, int(r.p_size)) for r in
            load(spark, SF_CORRECT, "part")
            .select("p_partkey", "p_brand", "p_size").collect()}
    n = rev = 0
    for r in _li_rows(spark, [
            "l_partkey", "CAST(l_quantity AS DOUBLE) AS qty",
            "CAST(l_extendedprice AS DOUBLE) AS price",
            "CAST(l_discount AS DOUBLE) AS disc"]):
        p = part.get(r.l_partkey)
        if p is None:
            continue
        brand, size = p
        q = r.qty
        if ((brand == "Brand#11" and 1 <= size <= 10 and 1 <= q <= 15)
                or (brand == "Brand#22" and 10 <= size <= 25
                    and 10 <= q <= 30)
                or (brand == "Brand#33" and 20 <= size <= 40
                    and 20 <= q <= 45)):
            n += 1
            rev += math.floor(r.price * (1 - r.disc) * 10000 + 0.5)
    row = disjunctive_parts_q19(spark, SF_CORRECT).collect()[0]
    assert row.n_lines == n and n > 0
    assert _close(row.revenue, rev / 10000.0, 1e-4)


def test_small_qty_revenue_q17_replay(spark):
    """Q17's integer cross-multiplied 20%-of-mean test replayed with
    per-part count/sum dicts."""
    from chopin_spark.queries.relational import small_qty_revenue_q17
    from chopin_spark.tables import load

    brand7 = {r.p_partkey for r in
              load(spark, SF_CORRECT, "part")
              .select("p_partkey", "p_brand").collect()
              if r.p_brand == "Brand#7"}
    cnt, qsum = collections.Counter(), collections.Counter()
    rows = _li_rows(spark, [
        "l_partkey", "CAST(l_quantity AS BIGINT) AS qty",
        "CAST(l_extendedprice AS DOUBLE) AS price",
        "CAST(l_discount AS DOUBLE) AS disc"])
    for r in rows:
        cnt[r.l_partkey] += 1
        qsum[r.l_partkey] += r.qty
    n = rev = 0
    for r in rows:
        if (r.l_partkey in brand7
                and 5 * r.qty * cnt[r.l_partkey] < qsum[r.l_partkey]):
            n += 1
            rev += math.floor(r.price * (1 - r.disc) * 10000 + 0.5)
    row = small_qty_revenue_q17(spark, SF_CORRECT).collect()[0]
    assert row.n_lines == n and n > 0
    assert _close(row.avg_yearly, rev / 10000.0 / 7.0, 1e-4)


def test_volume_shipping_q7_replay(spark):
    """Q7 two-role nation pair replayed with dict joins; revenue per
    (supp_nation, cust_nation, ship year)."""
    from chopin_spark.queries.relational import volume_shipping_q7
    from chopin_spark.tables import load

    nat = {r.n_nationkey: r.n_name for r in
           load(spark, SF_CORRECT, "nation")
           .select("n_nationkey", "n_name").collect()}
    snat = {r.s_suppkey: nat[r.s_nationkey] for r in
            load(spark, SF_CORRECT, "supplier")
            .select("s_suppkey", "s_nationkey").collect()}
    cnat = {r.c_custkey: nat[r.c_nationkey] for r in
            load(spark, SF_CORRECT, "customer")
            .select("c_custkey", "c_nationkey").collect()}
    ocust = {r.o_orderkey: r.o_custkey for r in
             load(spark, SF_CORRECT, "orders")
             .select("o_orderkey", "o_custkey").collect()}
    agg = collections.defaultdict(lambda: [0, 0])
    for r in _li_rows(spark, [
            "l_orderkey", "l_suppkey",
            "CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr",
            "CAST(l_extendedprice AS DOUBLE) AS price",
            "CAST(l_discount AS DOUBLE) AS disc"]):
        sn = snat.get(r.l_suppkey)
        cn = cnat.get(ocust.get(r.l_orderkey))
        if {sn, cn} == {"NATION_3", "NATION_7"}:
            st = agg[(sn, cn, r.yr)]
            st[0] += 1
            st[1] += math.floor(r.price * (1 - r.disc) * 10000 + 0.5)
    got = {(r.supp_nation, r.cust_nation, r.l_year): (r.n_lines, r.revenue)
           for r in volume_shipping_q7(spark, SF_CORRECT).collect()}
    assert set(got) == set(agg) and len(got) >= 2
    for k, (n, rev) in agg.items():
        assert got[k][0] == n
        assert _close(got[k][1], rev / 10000.0, 1e-4)


def test_national_market_share_q8_replay(spark):
    """Q8 market share replayed through the six-dict snowflake walk."""
    from chopin_spark.queries.relational import national_market_share_q8
    from chopin_spark.tables import load

    nat = {r.n_nationkey: (r.n_name, r.n_regionkey) for r in
           load(spark, SF_CORRECT, "nation")
           .select("n_nationkey", "n_name", "n_regionkey").collect()}
    europe = {r.r_regionkey for r in
              load(spark, SF_CORRECT, "region")
              .select("r_regionkey", "r_name").collect()
              if r.r_name == "EUROPE"}
    cust_eu = {r.c_custkey for r in
               load(spark, SF_CORRECT, "customer")
               .select("c_custkey", "c_nationkey").collect()
               if nat[r.c_nationkey][1] in europe}
    econ = {r.p_partkey for r in
            load(spark, SF_CORRECT, "part")
            .select("p_partkey", "p_type").collect()
            if r.p_type == "ECONOMY"}
    snat = {r.s_suppkey: nat[r.s_nationkey][0] for r in
            load(spark, SF_CORRECT, "supplier")
            .select("s_suppkey", "s_nationkey").collect()}
    orders = {r.o_orderkey: (r.o_custkey, r.yr) for r in
              load(spark, SF_CORRECT, "orders")
              .selectExpr("o_orderkey", "o_custkey",
                          "CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT)"
                          " AS yr").collect()}
    agg = collections.defaultdict(lambda: [0, 0])
    for r in _li_rows(spark, [
            "l_orderkey", "l_partkey", "l_suppkey",
            "CAST(l_extendedprice AS DOUBLE) AS price",
            "CAST(l_discount AS DOUBLE) AS disc"]):
        o = orders.get(r.l_orderkey)
        if (o and o[0] in cust_eu and r.l_partkey in econ
                and r.l_suppkey in snat):
            rev = math.floor(r.price * (1 - r.disc) * 10000 + 0.5)
            st = agg[o[1]]
            st[1] += rev
            if snat[r.l_suppkey] == "NATION_3":
                st[0] += rev
    got = {r.o_year: (r.nation_rev_1e4, r.total_rev_1e4, r.mkt_share)
           for r in national_market_share_q8(spark, SF_CORRECT).collect()}
    assert set(got) == set(agg) and len(got) >= 2
    for yr, (nrev, trev) in agg.items():
        assert got[yr][:2] == (nrev, trev)
        assert _close(got[yr][2], nrev / trev, 1e-6)


def test_product_profit_q9_replay(spark):
    """Q9 profit replayed with quantized revenue minus quantized cost
    per (supplier nation, ship year)."""
    from chopin_spark.queries.relational import product_profit_q9
    from chopin_spark.tables import load

    nat = {r.n_nationkey: r.n_name for r in
           load(spark, SF_CORRECT, "nation")
           .select("n_nationkey", "n_name").collect()}
    snat = {r.s_suppkey: nat[r.s_nationkey] for r in
            load(spark, SF_CORRECT, "supplier")
            .select("s_suppkey", "s_nationkey").collect()}
    red = {r.p_partkey: math.floor(float(r.p_retailprice) * 100 + 0.5)
           for r in load(spark, SF_CORRECT, "part")
           .select("p_partkey", "p_name", "p_retailprice").collect()
           if "red" in r.p_name}
    agg = collections.defaultdict(lambda: [0, 0])
    for r in _li_rows(spark, [
            "l_partkey", "l_suppkey",
            "CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS yr",
            "CAST(l_quantity AS BIGINT) AS qty",
            "CAST(l_extendedprice AS DOUBLE) AS price",
            "CAST(l_discount AS DOUBLE) AS disc"]):
        if r.l_partkey in red and r.l_suppkey in snat:
            rev = math.floor(r.price * (1 - r.disc) * 10000 + 0.5)
            cost = red[r.l_partkey] * 100 * r.qty
            st = agg[(snat[r.l_suppkey], r.yr)]
            st[0] += 1
            st[1] += rev - cost
    got = {(r.supp_nation, r.o_year): (r.n_lines, r.profit)
           for r in product_profit_q9(spark, SF_CORRECT).collect()}
    assert set(got) == set(agg) and len(got) >= 3
    for k, (n, prof) in agg.items():
        assert got[k][0] == n
        assert _close(got[k][1], prof / 10000.0, 1e-4)


def test_important_parts_q11_replay(spark):
    """Q11's grouped-agg-vs-own-total 1/600 fraction test replayed
    with one Counter and exact integer cross-multiplication."""
    from chopin_spark.queries.relational import important_parts_q11
    from chopin_spark.tables import load

    nat = {r.n_nationkey: r.n_name for r in
           load(spark, SF_CORRECT, "nation")
           .select("n_nationkey", "n_name").collect()}
    s5 = {r.s_suppkey for r in
          load(spark, SF_CORRECT, "supplier")
          .select("s_suppkey", "s_nationkey").collect()
          if nat[r.s_nationkey] == "NATION_5"}
    v = collections.Counter()
    for r in _li_rows(spark, [
            "l_partkey", "l_suppkey",
            "CAST(l_extendedprice AS DOUBLE) AS price",
            "CAST(l_discount AS DOUBLE) AS disc"]):
        if r.l_suppkey in s5:
            v[r.l_partkey] += math.floor(
                r.price * (1 - r.disc) * 10000 + 0.5)
    tot = sum(v.values())
    expect = {pk: val for pk, val in v.items() if 600 * val > tot}
    got = {r.l_partkey: (r.value_1e4, r.value) for r in
           important_parts_q11(spark, SF_CORRECT).collect()}
    assert {k: g[0] for k, g in got.items()} == expect and len(got) >= 2
    for pk, (v4, val) in got.items():
        assert _close(val, v4 / 10000.0, 1e-4)


def test_top_supplier_q15_replay(spark):
    """Q15 view + scalar MAX replayed with one Counter; exact integer
    equality against the max, possibly multiple winners."""
    from chopin_spark.queries.relational import top_supplier_q15
    from chopin_spark.tables import load

    rev = collections.Counter()
    for r in _li_rows(spark, [
            "l_suppkey", "CAST(l_shipdate AS STRING) AS sd",
            "CAST(l_extendedprice AS DOUBLE) AS price",
            "CAST(l_discount AS DOUBLE) AS disc"]):
        if "1996-01-01" <= r.sd < "1996-04-01":
            rev[r.l_suppkey] += math.floor(
                r.price * (1 - r.disc) * 10000 + 0.5)
    mx = max(rev.values())
    sname = {r.s_suppkey: r.s_name for r in
             load(spark, SF_CORRECT, "supplier")
             .select("s_suppkey", "s_name").collect()}
    expect = {sk: sname[sk] for sk, v in rev.items() if v == mx}
    got = {r.s_suppkey: (r.s_name, r.total_revenue) for r in
           top_supplier_q15(spark, SF_CORRECT).collect()}
    assert {k: v[0] for k, v in got.items()} == expect
    for v in got.values():
        assert _close(v[1], mx / 10000.0, 1e-4)


def test_parts_supplier_variety_q16_replay(spark):
    """Q16 distinct-supplier counts with the NOT IN exclusion replayed
    with sets."""
    from chopin_spark.queries.relational import parts_supplier_variety_q16
    from chopin_spark.tables import load

    part = {r.p_partkey: (r.p_brand, r.p_type, int(r.p_size)) for r in
            load(spark, SF_CORRECT, "part")
            .select("p_partkey", "p_brand", "p_type", "p_size").collect()}
    bad = {r.s_suppkey for r in
           load(spark, SF_CORRECT, "supplier")
           .select("s_suppkey", "s_acctbal").collect()
           if float(r.s_acctbal) < 0}
    per = collections.defaultdict(set)
    for r in _li_rows(spark, ["l_partkey", "l_suppkey"]):
        p = part.get(r.l_partkey)
        if (p and p[0] != "Brand#3" and p[1] != "ECONOMY"
                and p[2] in (1, 2, 5, 11, 28, 37)
                and r.l_suppkey not in bad):
            per[p].add(r.l_suppkey)
    expect = {k: len(v) for k, v in per.items()}
    got = {(r.p_brand, r.p_type, r.p_size): r.supplier_cnt for r in
           parts_supplier_variety_q16(spark, SF_CORRECT).collect()}
    assert got == expect and len(got) >= 3


def test_waiting_orders_q21_replay(spark):
    """Q21 sole-returner logic replayed with per-order supplier sets."""
    from chopin_spark.queries.relational import waiting_orders_q21
    from chopin_spark.tables import load

    finished = {r.o_orderkey for r in
                load(spark, SF_CORRECT, "orders")
                .select("o_orderkey", "o_orderstatus").collect()
                if r.o_orderstatus == "F"}
    supps = collections.defaultdict(set)
    rsupps = collections.defaultdict(set)
    rows = _li_rows(spark, ["l_orderkey", "l_suppkey", "l_returnflag"])
    for r in rows:
        supps[r.l_orderkey].add(r.l_suppkey)
        if r.l_returnflag == "R":
            rsupps[r.l_orderkey].add(r.l_suppkey)
    expect = collections.Counter()
    for r in rows:
        ok, sk = r.l_orderkey, r.l_suppkey
        if (r.l_returnflag == "R" and ok in finished
                and len(supps[ok] - {sk}) > 0
                and len(rsupps[ok] - {sk}) == 0):
            expect[sk] += 1
    got = {r.suppkey: r.numwait for r in
           waiting_orders_q21(spark, SF_CORRECT).collect()}
    assert got == dict(expect) and len(got) >= 2


def test_lapsed_customers_q22_replay(spark):
    """Q22 above-average-balance + no-recent-orders replayed with the
    exact cents average and an anti set."""
    from chopin_spark.queries.relational import lapsed_customers_q22
    from chopin_spark.tables import load

    cust = [(r.c_custkey, r.c_nationkey,
             math.floor(float(r.c_acctbal) * 100 + 0.5),
             float(r.c_acctbal))
            for r in load(spark, SF_CORRECT, "customer")
            .select("c_custkey", "c_nationkey", "c_acctbal").collect()]
    pos = [c for c in cust if c[3] > 0.0]
    ab = sum(c[2] for c in pos) / (100.0 * len(pos))
    recent = {r.o_custkey for r in
              load(spark, SF_CORRECT, "orders")
              .selectExpr("o_custkey",
                          "CAST(o_orderdate AS STRING) AS od").collect()
              if r.od >= "1999-01-01"}
    agg = collections.defaultdict(lambda: [0, 0])
    for ck, nk, cents, bal in cust:
        if bal > ab and ck not in recent:
            agg[nk][0] += 1
            agg[nk][1] += cents
    got = {r.c_nationkey: (r.numcust, r.totacctbal) for r in
           lapsed_customers_q22(spark, SF_CORRECT).collect()}
    assert set(got) == set(agg) and len(got) >= 3
    for nk, (n, cents) in agg.items():
        assert got[nk][0] == n
        assert abs(got[nk][1] - cents / 100.0) < 0.005 + 1e-9


def test_utm_zone_rollup_replay(spark):
    """UTM grid-zone designators (incl. 32V and Svalbard X-band
    exceptions) replayed with a from-scratch implementation of the
    public MGRS zone rules over the collected remapped lon/lat."""
    from chopin_spark.queries.crsq import _LAT_UTM, _LON_EU, utm_zone_rollup
    from chopin_spark.tables import load

    bands = "CDEFGHJKLMNPQRSTUVWX"

    def designator(lon, lat):
        if lat < -80.0 or lat > 84.0:
            return None
        band = bands[min(int(math.floor((lat + 80.0) / 8.0)), 19)]
        zone = min(max(int(math.floor((lon + 180.0) / 6.0)) + 1, 1), 60)
        if band == "V" and 3.0 <= lon < 12.0:
            zone = 32
        elif band == "X":
            if 0.0 <= lon < 9.0:
                zone = 31
            elif 9.0 <= lon < 21.0:
                zone = 33
            elif 21.0 <= lon < 33.0:
                zone = 35
            elif 33.0 <= lon < 42.0:
                zone = 37
        return f"{zone}{band}"

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    expect = collections.defaultdict(lambda: [0, 0])
    for r in spark.sql(
        f"SELECT {_LON_EU} AS lon, {_LAT_UTM} AS lat, n_chars"
        " FROM documents"
    ).collect():
        st = expect[designator(r.lon, r.lat)]
        st[0] += 1
        st[1] += r.n_chars
    got = {r.utm_zone: (r.n_docs, r.sum_chars) for r in
           utm_zone_rollup(spark, SF_CORRECT).collect()}
    assert got == {k: tuple(v) for k, v in expect.items()}
    assert any(z and z.endswith("V") for z in got) \
        and any(z and z.endswith("X") for z in got)


def test_geohash_cell_rollup_replay(spark):
    """Precision-5 geohashes replayed with the canonical public
    bisection algorithm (interval halving + base32), independent of
    the engine's floor-quantized bit expressions."""
    from chopin_spark.queries.s2q import _LAT, _LON, geohash_cell_rollup
    from chopin_spark.tables import load

    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"

    def geohash(lon, lat, p=5):
        lo = [-180.0, 180.0]
        la = [-90.0, 90.0]
        out, bit, ch, even = [], 0, 0, True
        while len(out) < p:
            if even:
                mid = (lo[0] + lo[1]) / 2
                if lon >= mid:
                    ch = ch * 2 + 1
                    lo[0] = mid
                else:
                    ch *= 2
                    lo[1] = mid
            else:
                mid = (la[0] + la[1]) / 2
                if lat >= mid:
                    ch = ch * 2 + 1
                    la[0] = mid
                else:
                    ch *= 2
                    la[1] = mid
            even = not even
            bit += 1
            if bit == 5:
                out.append(b32[ch])
                bit, ch = 0, 0
        return "".join(out)

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    expect = collections.defaultdict(lambda: [0, 0])
    for r in spark.sql(
        f"SELECT {_LON} AS lon, {_LAT} AS lat, n_chars FROM documents"
    ).collect():
        st = expect[geohash(r.lon, r.lat)]
        st[0] += 1
        st[1] += r.n_chars
    got = {r.geohash: (r.parent2, r.n_docs, r.sum_chars) for r in
           geohash_cell_rollup(spark, SF_CORRECT).collect()}
    assert {k: v[1:] for k, v in got.items()} \
        == {k: tuple(v) for k, v in expect.items()}
    for gh, (p2, _, _) in got.items():
        assert p2 == gh[:2]


def test_geodesic_nearest_city_replay(spark):
    """Andoyer-Lambert geodesic argmin replayed with plain math over
    the four anchors."""
    from chopin_spark.queries.crsq import (
        _GRS80_A, _GRS80_F, geodesic_nearest_city,
    )
    from chopin_spark.queries.s2q import _LAT, _LON
    from chopin_spark.tables import load

    anchors = [(1, -74.0060, 40.7128), (2, -118.2437, 34.0522),
               (3, -87.6298, 41.8781), (4, -104.9903, 39.7392)]

    def andoyer(dlon, dlat, alon, alat):
        sf = math.sin(math.radians((dlat + alat) / 2))
        cf = math.cos(math.radians((dlat + alat) / 2))
        sg = math.sin(math.radians((dlat - alat) / 2))
        cg = math.cos(math.radians((dlat - alat) / 2))
        sl = math.sin(math.radians((dlon - alon) / 2))
        cl = math.cos(math.radians((dlon - alon) / 2))
        s = sg * sg * cl * cl + cf * cf * sl * sl
        c = cg * cg * cl * cl + sf * sf * sl * sl
        if not (s > 0 and c > 0):
            return None
        om = math.atan(math.sqrt(s / c))
        return 2 * om * _GRS80_A * (
            1 + _GRS80_F * ((3 * math.sqrt(s * c) / om - 1) / (2 * c)
                            * sf * sf * cg * cg
                            - (3 * math.sqrt(s * c) / om + 1) / (2 * s)
                            * cf * cf * sg * sg))

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    expect = {}
    for r in spark.sql(
        f"SELECT doc_id, {_LON} AS lon, {_LAT} AS lat FROM documents"
    ).collect():
        ds = [(andoyer(r.lon, r.lat, alon, alat), aid)
              for aid, alon, alat in anchors]
        ds = [(d, a) for d, a in ds if d is not None]
        d, aid = min(ds)
        expect[r.doc_id] = (aid, d)

    got = {r.doc_id: (r.nearest_city, r.dist_km) for r in
           geodesic_nearest_city(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect)
    for d, (aid, dist) in expect.items():
        assert got[d][0] == aid
        assert _close(got[d][1], dist / 1000.0, 1e-3)
    assert len({a for a, _ in got.values()}) >= 3


def test_zone_geodesic_areas_replay(spark):
    """Spherical rect areas R²Δλ(sinφ2−sinφ1) and doc densities
    replayed directly."""
    from chopin_spark.queries.s2q import (
        _LAT, _LON, _R_EARTH_KM, _ZONES, zone_geodesic_areas,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    pts = [(r.lon, r.lat) for r in spark.sql(
        f"SELECT {_LON} AS lon, {_LAT} AS lat FROM documents").collect()]
    expect = {}
    for zid, lon1, lon2, lat1, lat2 in _ZONES:
        area = (_R_EARTH_KM ** 2 * ((lon2 - lon1) * math.pi / 180.0)
                * (math.sin(lat2 * math.pi / 180.0)
                   - math.sin(lat1 * math.pi / 180.0)))
        n = sum(1 for (lo, la) in pts
                if lon1 <= lo < lon2 and lat1 <= la < lat2)
        if n:
            expect[zid] = (area, n, n / area * 1000.0)

    got = {r.zone_id: r for r in
           zone_geodesic_areas(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect) and len(got) >= 5
    for zid, (area, n, dens) in expect.items():
        assert got[zid].n_docs == n
        assert abs(got[zid].area_km2 - area) < 1e-6
        assert _close(got[zid].docs_per_1000km2, dens, 1e-4)


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_dedup_sorted_neighborhood_replay(spark):
    """Sorted-neighborhood candidate pairs replayed with per-block
    sorts and a from-scratch Levenshtein DP."""
    from chopin_spark.queries.textops import (
        _SNM_MAXLEV, dedup_sorted_neighborhood,
    )
    from chopin_spark.tables import load

    blocks = collections.defaultdict(list)
    for r in load(spark, SF_CORRECT, "documents") \
            .select("doc_id", "lang", "text").collect():
        blocks[(r.lang, r.text[:8])].append((r.text, r.doc_id))
    expect = {}
    for rows in blocks.values():
        rows.sort()
        for i, (ta, da) in enumerate(rows):
            for k in (1, 2):
                if i + k < len(rows):
                    tb, db = rows[i + k]
                    l48 = _lev(ta[:48], tb[:48])
                    if l48 <= _SNM_MAXLEV:
                        expect[(da, db, k)] = (l48, _lev(ta[:96], tb[:96]))
    got = {(r.doc_a, r.doc_b, r.win_offset): (r.lev48, r.lev96)
           for r in dedup_sorted_neighborhood(spark, SF_CORRECT).collect()}
    assert got == expect and len(got) >= 2


def test_shingle_novelty_by_epoch_replay(spark):
    """First-seen shingle novelty per quarter replayed with sets."""
    from chopin_spark.queries.webtext import shingle_novelty_by_epoch
    from chopin_spark.tables import load

    per_epoch = collections.defaultdict(set)
    for r in load(spark, SF_CORRECT, "documents") \
            .select("doc_id", "text").collect():
        w = r.text.split(" ")
        if len(w) < 5:
            continue
        eq = int(((r.doc_id * 48271) % 31536000) // 7884000.0)
        for i in range(len(w) - 4):
            per_epoch[eq].add(" ".join(w[i:i + 5]))
    first = {}
    for eq in sorted(per_epoch):
        for s in per_epoch[eq]:
            first.setdefault(s, eq)
    got = {r.epoch_q: (r.n_shingles, r.n_novel, r.novelty_ratio)
           for r in shingle_novelty_by_epoch(spark, SF_CORRECT).collect()}
    assert set(got) == set(per_epoch) and len(got) == 4
    for eq, sh in per_epoch.items():
        novel = sum(1 for s in sh if first[s] == eq)
        assert got[eq][:2] == (len(sh), novel)
        assert _close(got[eq][2], novel / len(sh), 1e-6)
    assert got[min(got)][2] == 1.0  # first epoch: everything novel


def test_hard_negative_mining_replay(spark):
    """BM25-over-bigrams hard negatives replayed with Counters: rare
    anchor terms (df*10 <= n), cross-source negatives, round-then-rank
    top-5 per anchor."""
    from chopin_spark.queries.textops import (
        _HN_B, _HN_K, _HN_K1, _HN_MOD, _HN_RES, hard_negative_mining,
    )
    from chopin_spark.tables import load

    docs = {}
    for r in load(spark, SF_CORRECT, "documents") \
            .select("doc_id", "source", "text").collect():
        w = r.text.split(" ")
        if len(w) >= 2:
            docs[r.doc_id] = (r.source,
                              [" ".join(w[i:i + 2])
                               for i in range(len(w) - 1)])
    n_docs = len(docs)
    avgdl = sum(len(bg) for (_, bg) in docs.values()) / n_docs
    post = {d: collections.Counter(bg) for d, (_, bg) in docs.items()}
    df = collections.Counter(
        t for tc in post.values() for t in tc)
    expect = {}
    for q, (qsrc, _) in docs.items():
        if q % _HN_MOD != _HN_RES:
            continue
        qt = [t for t in post[q] if df[t] * 10 <= n_docs]
        scored = {}
        for d, (src, bg) in docs.items():
            if d == q or src == qsrc:
                continue
            shared = [t for t in qt if t in post[d]]
            if not shared:
                continue
            s = 0.0
            for t in shared:
                tf = post[d][t]
                idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
                dl = len(bg)
                s += idf * (tf * (_HN_K1 + 1.0)) / (
                    tf + _HN_K1 * (1.0 - _HN_B + _HN_B * dl / avgdl))
            scored[d] = (_round_half_away(s), len(shared))
        ranked = sorted(scored.items(),
                        key=lambda kv: (-kv[1][0], kv[0]))[:_HN_K]
        for rk, (d, (sc, ns)) in enumerate(ranked, 1):
            expect[(q, d)] = (rk, sc, ns)

    got = {(r.q_id, r.neg_id): (r.rank, r.score_bm25, r.n_shared_terms)
           for r in hard_negative_mining(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect) and len(got) >= 3
    for k, (rk, sc, ns) in expect.items():
        assert got[k][0] == rk and got[k][2] == ns
        assert _close(got[k][1], sc, 1e-4)


def test_ann_mmr_rerank_replay(spark):
    """The 3-step greedy MMR replayed with plain loops: rounded
    cosines, lambda-tradeoff scores, max-sim-to-selected."""
    from chopin_spark.queries.simsearch import (
        _MMR_K0, _MMR_LAMBDA, ann_mmr_rerank,
    )
    from chopin_spark.tables import load

    raw = {r.vec_id: list(r.embedding) for r in
           load(spark, SF_CORRECT, "embeddings")
           .select("vec_id", "embedding").collect()}

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    def cos(a, b):
        return _round_half_away(
            fold_dot(a, b)
            / (math.sqrt(fold_dot(a, a)) * math.sqrt(fold_dot(b, b))))

    q = raw[0]
    rel = {v: cos(e, q) for v, e in raw.items() if v != 0}
    pool = [v for v, _ in sorted(rel.items(),
                                 key=lambda kv: (-kv[1], kv[0]))[:_MMR_K0]]
    sim = {(a, b): cos(raw[a], raw[b])
           for a in pool for b in pool if a != b}
    lam, mu = _MMR_LAMBDA, 1.0 - _MMR_LAMBDA
    s1 = min(pool, key=lambda v: (-rel[v], v))
    r2 = {v: _round_half_away(lam * rel[v] - mu * sim[(v, s1)], 6)
          for v in pool if v != s1}
    s2 = min(r2, key=lambda v: (-r2[v], v))
    r3 = {v: _round_half_away(
        lam * rel[v] - mu * max(sim[(v, s1)], sim[(v, s2)]), 6)
        for v in pool if v not in (s1, s2)}
    s3 = min(r3, key=lambda v: (-r3[v], v))
    expect = [(1, s1, rel[s1], rel[s1]), (2, s2, rel[s2], r2[s2]),
              (3, s3, rel[s3], r3[s3])]

    got = [(r.mmr_rank, r.vec_id, r.rel, r.mmr_score) for r in
           ann_mmr_rerank(spark, SF_CORRECT).orderBy("mmr_rank").collect()]
    assert [g[:2] for g in got] == [e[:2] for e in expect]
    for g, e in zip(got, expect):
        assert _close(g[2], e[2], 1e-4) and _close(g[3], e[3], 1e-6)


def test_trajectory_stay_points_replay(spark):
    """Li et al. stay-point segmentation replayed sequentially: break
    on >150 km jumps, keep runs of >= 2 pings, centroid + dwell."""
    from chopin_spark.queries.temporalq import (
        _STAY_R2, trajectory_stay_points,
    )
    from chopin_spark import sqlexpr as _sx
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "events").createOrReplaceTempView("events")
    rows = spark.sql(
        f"SELECT user_id, ts, event_id, {_sx.x_expr('event_id')} AS x,"
        f" {_sx.y_expr('event_id')} AS y,"
        " unix_micros(CAST(ts AS TIMESTAMP)) AS us FROM events"
    ).collect()
    per = collections.defaultdict(list)
    for r in rows:
        per[r.user_id].append((r.ts, r.event_id, r.x, r.y, r.us))
    expect = {}
    for uid, pings in per.items():
        pings.sort(key=lambda p: (p[0], p[1]))
        seg_id, px, py = 0, None, None
        segs = collections.defaultdict(list)
        for (_, eid, x, y, us) in pings:
            if px is None or (x - px) ** 2 + (y - py) ** 2 > _STAY_R2:
                seg_id += 1
            segs[seg_id].append((eid, x, y, us))
            px, py = x, y
        for sid, g in segs.items():
            if len(g) >= 2:
                expect[(uid, sid)] = (
                    len(g), min(e for e, _, _, _ in g),
                    max(u for _, _, _, u in g) - min(u for _, _, _, u in g),
                    sum(x for _, x, _, _ in g) / len(g),
                    sum(y for _, _, y, _ in g) / len(g))
    got = {(r.user_id, r.seg_id): r for r in
           trajectory_stay_points(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect) and len(got) >= 3
    for k, (n, fe, dw, cx, cy) in expect.items():
        row = got[k]
        assert (row.n_pings, row.first_event, row.dwell_us) == (n, fe, dw)
        assert _close(row.cx, cx, 1e-4) and _close(row.cy, cy, 1e-4)


def test_voronoi_seed_regions_replay(spark):
    """Discrete nearest-seed tessellation replayed with the encoded
    integer argmin and a dict doc rollup."""
    from chopin_spark.queries.spatial import (
        _DOC_X, _DOC_Y, _VOR_CH, _VOR_CW, _VOR_NX, _VOR_NY,
        voronoi_seed_regions,
    )
    from chopin_spark import sqlexpr as sx
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "supplier").createOrReplaceTempView("supplier")
    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    seeds = [(r.s_suppkey, r.sx, r.sy) for r in spark.sql(
        f"SELECT s_suppkey, {sx.x_expr('s_suppkey')} AS sx,"
        f" {sx.y_expr('s_suppkey')} AS sy FROM supplier"
        " WHERE s_suppkey % 17 = 3").collect()]
    per_cell = collections.defaultdict(lambda: [0, 0])
    for r in spark.sql(
        f"SELECT CAST(FLOOR({_DOC_X} / {_VOR_CW!r}) AS BIGINT) AS gx,"
        f" CAST(FLOOR({_DOC_Y} / {_VOR_CH!r}) AS BIGINT) AS gy, n_chars"
        " FROM documents").collect():
        st = per_cell[(r.gx, r.gy)]
        st[0] += 1
        st[1] += r.n_chars
    agg = collections.defaultdict(lambda: [0, 0, 0])
    for gx in range(_VOR_NX):
        for gy in range(_VOR_NY):
            cx, cy = (gx + 0.5) * _VOR_CW, (gy + 0.5) * _VOR_CH
            seed = min(
                math.floor((cx - sx_) ** 2 + (cy - sy_) ** 2 + 0.5)
                * 16384 + sk
                for sk, sx_, sy_ in seeds) % 16384
            st = agg[seed]
            st[0] += 1
            pc = per_cell.get((gx, gy))
            if pc:
                st[1] += pc[0]
                st[2] += pc[1]
    got = {r.seed: r for r in
           voronoi_seed_regions(spark, SF_CORRECT).collect()}
    assert set(got) == set(agg) and len(got) == len(seeds)
    for seed, (nc, nd, ch) in agg.items():
        row = got[seed]
        assert (row.n_cells, row.n_docs, row.sum_chars) == (nc, nd, ch)
        assert _close(row.area_km2, nc * _VOR_CW * _VOR_CH / 1e6, 1e-4)


def test_ffunction_empty_space_replay(spark):
    """F-function (probe-to-pattern NN ECDF at 48 fixed probes)
    replayed with a double loop."""
    from chopin_spark.queries.pointpat import (
        _DX, _DY, _GF_RADII, ffunction_empty_space,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    pts = [(r.x, r.y) for r in spark.sql(
        f"SELECT {_DX} AS x, {_DY} AS y FROM documents").collect()]
    nn = []
    for pi in range(8):
        for pj in range(6):
            px, py = (pi + 0.5) * 100000.0, (pj + 0.5) * 100000.0
            nn.append(min(math.sqrt((x - px) ** 2 + (y - py) ** 2)
                          for (x, y) in pts))
    row = ffunction_empty_space(spark, SF_CORRECT).collect()[0]
    for r in _GF_RADII:
        expect = sum(1 for d in nn if d <= r) / 48.0
        assert _close(getattr(row, f"ecdf_{int(r // 1000)}km"),
                      expect, 1e-6)
    assert row.ecdf_30km > row.ecdf_5km


def test_min_cost_supplier_q2_replay(spark):
    """Q2 correlated scalar MIN replayed with a per-part min dict;
    all min-price lines for size-5 parts survive."""
    from chopin_spark.queries.relational import min_cost_supplier_q2
    from chopin_spark.tables import load

    size5 = {r.p_partkey: r.p_brand for r in
             load(spark, SF_CORRECT, "part")
             .select("p_partkey", "p_brand", "p_size").collect()
             if int(r.p_size) == 5}
    rows = _li_rows(spark, [
        "l_partkey", "l_suppkey",
        "CAST(l_extendedprice AS DOUBLE) AS price"])
    pmin = {}
    for r in rows:
        if r.l_partkey not in pmin or r.price < pmin[r.l_partkey]:
            pmin[r.l_partkey] = r.price
    expect = {}
    for r in rows:
        if r.l_partkey in size5 and r.price == pmin[r.l_partkey]:
            expect[(r.l_partkey, r.l_suppkey)] = (
                size5[r.l_partkey], round(r.price, 2))
    got = {(r.p_partkey, r.l_suppkey): (r.p_brand, r.best_price)
           for r in min_cost_supplier_q2(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect) and len(got) >= 2
    for k, (brand, price) in expect.items():
        assert got[k][0] == brand
        assert abs(got[k][1] - price) < 0.005 + 1e-9


def test_promo_part_suppliers_q20_replay(spark):
    """Q20 nested-IN majority test replayed with two Counter levels."""
    from chopin_spark.queries.relational import promo_part_suppliers_q20
    from chopin_spark.tables import load

    red = {r.p_partkey for r in
           load(spark, SF_CORRECT, "part")
           .select("p_partkey", "p_name").collect()
           if r.p_name.startswith("red")}
    w = collections.Counter()
    for r in _li_rows(spark, [
            "l_suppkey", "l_partkey", "CAST(l_shipdate AS STRING) AS sd",
            "CAST(l_quantity AS BIGINT) AS qty"]):
        if r.l_partkey in red and "1996-01-01" <= r.sd < "1997-01-01":
            w[(r.l_suppkey, r.l_partkey)] += r.qty
    tot = collections.Counter()
    for (sk, pk), sq in w.items():
        tot[pk] += sq
    winners = {sk for (sk, pk), sq in w.items() if 2 * sq > tot[pk]}
    sname = {r.s_suppkey: r.s_name for r in
             load(spark, SF_CORRECT, "supplier")
             .select("s_suppkey", "s_name").collect()}
    expect = {sk: sname[sk] for sk in winners}
    got = {r.s_suppkey: r.s_name for r in
           promo_part_suppliers_q20(spark, SF_CORRECT).collect()}
    assert got == expect and len(got) >= 1


def test_modularity_lpa_hosts_replay(spark):
    """Three synchronous LPA rounds (encoded majority tie-break) and
    Newman-Girvan Q replayed with dicts over the derived host graph."""
    from chopin_spark.queries.graphq import (
        _LP_ROUNDS, _SEED_MOD, modularity_lpa_hosts,
    )
    from chopin_spark.tables import load

    und = set()
    for r in load(spark, SF_CORRECT, "documents") \
            .select("doc_id").collect():
        s = (r.doc_id * 69069) % 97
        d = ((r.doc_id * 48271) + 17) % 97
        if s != d:
            und.add((s, d))
            und.add((d, s))
    nodes = {s for s, _ in und}
    adj = collections.defaultdict(list)
    for s, d in und:
        adj[s].append(d)

    lbl = {v: (v % 3 if v % _SEED_MOD == 0 else None) for v in nodes}
    for _ in range(_LP_ROUNDS):
        cnt = collections.defaultdict(collections.Counter)
        for s, d in und:
            if lbl[s] is not None:
                cnt[d][lbl[s]] += 1
        new = {}
        for v in nodes:
            if v % _SEED_MOD == 0:
                new[v] = v % 3
            elif cnt[v]:
                enc = max(c * 4 + (3 - lb) for lb, c in cnt[v].items())
                new[v] = 3 - (enc % 4)
            else:
                new[v] = None
        lbl = new
    comm = {v: (1000 + v if lb is None else lb) for v, lb in lbl.items()}
    m2 = len(und)
    intra = sum(1 for s, d in und if comm[s] == comm[d])
    dc = collections.Counter(comm[s] for s, _ in und)
    sd2 = sum(d * d for d in dc.values())
    q = intra / m2 - sd2 / (m2 * m2)

    row = modularity_lpa_hosts(spark, SF_CORRECT).collect()[0]
    assert (row.n_edges, row.n_comms, row.intra_edges) \
        == (m2 // 2, len(set(comm.values())), intra // 2)
    assert _close(row.modularity_q, q, 1e-6)
    assert row.modularity_q > 0


def test_raster_hillshade_replay(spark):
    """Trig-free hillshade (normal dot baked sun vector) replayed over
    the synthetic elevation formula."""
    from chopin_spark.queries.costdistq import (
        _HS_SX, _HS_SY, _HS_SZ, H, W, raster_hillshade,
    )

    def z(x, y):
        return ((x + y * W) * 389) % (W * H)

    expect = {}
    for x in range(1, W - 1):
        for y in range(1, H - 1):
            gx = (z(x + 1, y) - z(x - 1, y)) / 2.0
            gy = (z(x, y + 1) - z(x, y - 1)) / 2.0
            dot = (0.0 - gx) * _HS_SX + (0.0 - gy) * _HS_SY + _HS_SZ
            norm = math.sqrt(gx * gx + gy * gy + 1.0)
            expect[(x, y)] = max(dot / norm, 0.0)

    got = {(r.x, r.y): r.shade for r in
           raster_hillshade(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect)
    for k, v in expect.items():
        assert _close(got[k], v, 1e-4)
    # the synthetic surface's 389-step jumps keep normals far from the
    # sun: both clipped-dark and lit cells must occur, peaks stay < 0.9
    assert any(v == 0.0 for v in got.values()) \
        and any(v > 0.05 for v in got.values())


def test_str_pack_partition_replay(spark):
    """Sort-tile-recursive packing replayed with explicit rank
    statistics: LCG sample, x-quartile bounds, per-slab y-bounds,
    leaf assignment and extents."""
    from chopin_spark.queries.spatial import (
        _DOC_X, _DOC_Y, _STR_SX, _STR_SY, str_pack_partition,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    pts = [(r.doc_id, r.x, r.y) for r in spark.sql(
        f"SELECT doc_id, {_DOC_X} AS x, {_DOC_Y} AS y FROM documents"
    ).collect()]
    smp = sorted(
        ((x, y) for d, x, y in pts
         if (d * 2654435761) % 1000003 < 50000))
    n = len(smp)
    bx = [smp[int(math.floor(i * n / float(_STR_SX))) - 1][0]
          for i in (1, 2, 3)]

    def xslab(x):
        return sum(1 for b in bx if x > b)

    slabs = collections.defaultdict(list)
    for (x, y) in smp:
        slabs[xslab(x)].append((y, x))
    by = {}
    for xs, rows in slabs.items():
        rows.sort()
        m = len(rows)
        by[xs] = [rows[int(math.floor(j * m / float(_STR_SY))) - 1][0]
                  for j in (1, 2, 3)]

    leafs = collections.defaultdict(list)
    for d, x, y in pts:
        xs = xslab(x)
        ys = sum(1 for b in by.get(xs, []) if y > b)
        leafs[xs * _STR_SY + ys].append((x, y))
    got = {r.leaf_id: r for r in
           str_pack_partition(spark, SF_CORRECT).collect()}
    assert set(got) == set(leafs) and len(got) >= 8
    for lid, rows in leafs.items():
        r = got[lid]
        assert r.n_points == len(rows)
        assert _close(r.xmin, min(x for x, _ in rows), 1e-4)
        assert _close(r.xmax, max(x for x, _ in rows), 1e-4)
        assert _close(r.ymin, min(y for _, y in rows), 1e-4)
        assert _close(r.ymax, max(y for _, y in rows), 1e-4)


def test_gwr_local_slope_replay(spark):
    """Geographically weighted WLS slope/intercept replayed with
    integer moment sums over quantized Gaussian weights."""
    from chopin_spark.queries.interactq import (
        _GWR_CH, _GWR_CW, _GWR_H, _GWR_NX, _GWR_NY, _GWR_R,
        gwr_local_slope,
    )
    from chopin_spark import sqlexpr as sx
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    pts = [(r.x, r.y, r.v) for r in spark.sql(
        f"SELECT {sx.x_expr('doc_id')} AS x, {sx.y_expr('doc_id')} AS y,"
        " CAST(n_chars AS BIGINT) AS v FROM documents").collect()]
    expect = {}
    for gi in range(_GWR_NX):
        for gj in range(_GWR_NY):
            cx, cy = (gi + 0.5) * _GWR_CW, (gj + 0.5) * _GWR_CH
            n = sw = swu = swv = swuu = swuv = 0
            for (x, y, v) in pts:
                d2 = (x - cx) ** 2 + (y - cy) ** 2
                if d2 > _GWR_R * _GWR_R:
                    continue
                u = math.floor(x / 1000.0)
                wq = math.floor(
                    4096 * math.exp(-d2 / (2.0 * _GWR_H ** 2)) + 0.5)
                n += 1
                sw += wq
                swu += wq * u
                swv += wq * v
                swuu += wq * u * u
                swuv += wq * u * v
            slope = (sw * swuv - swu * swv) / (sw * swuu - swu * swu)
            expect[(gi, gj)] = (n, slope, (swv - slope * swu) / sw)
    got = {(r.gi, r.gj): r for r in
           gwr_local_slope(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect)
    for k, (n, slope, icpt) in expect.items():
        assert got[k].n_pts == n
        assert _close(got[k].slope_chars_per_km, slope, 1e-6)
        assert _close(got[k].intercept_chars, icpt, 1e-4)


def test_road_bearing_anisotropy_replay(spark):
    """Octant sign classification folded mod 4 and lattice lengths
    replayed over the collected segment endpoints."""
    from chopin_spark.queries.roads import (
        _ANI_SPARK_SEGS, road_bearing_anisotropy,
    )
    from chopin_spark.zones import TRACT_H, TRACT_NX, TRACT_W

    segs = [(r.ax, r.ay, r.bx2, r.by2) for r in
            spark.sql(_ANI_SPARK_SEGS).collect()]
    agg = collections.defaultdict(lambda: [0, 0])
    for ax, ay, bx, by in segs:
        zone = (int(math.floor(((ay + by) / 2) / TRACT_H)) * TRACT_NX
                + int(math.floor(((ax + bx) / 2) / TRACT_W)))
        gx, gy = bx - ax, by - ay
        axx, ayy = abs(gx), abs(gy)
        if axx >= ayy and gx > 0 and gy >= 0:
            oct_ = 0
        elif axx < ayy and gy > 0 and gx >= 0:
            oct_ = 1
        elif axx < ayy and gy > 0 and gx < 0:
            oct_ = 2
        elif axx >= ayy and gx < 0 and gy >= 0:
            oct_ = 3
        elif axx >= ayy and gx < 0 and gy < 0:
            oct_ = 4
        elif axx < ayy and gy < 0 and gx <= 0:
            oct_ = 5
        elif axx < ayy and gy < 0 and gx > 0:
            oct_ = 6
        else:
            oct_ = 7
        st = agg[(zone, oct_ % 4)]
        st[0] += 1
        st[1] += math.floor(
            math.sqrt(gx * gx + gy * gy) * 1024 + 0.5)
    got = {(r.zone_num, r.sector): (r.n_segs, r.len_mm) for r in
           road_bearing_anisotropy(spark, SF_CORRECT).collect()}
    assert got == {k: tuple(v) for k, v in agg.items()} and len(got) >= 10


def test_concave_hull_cells_replay(spark):
    """Occupied-cell complex statistics (area, boundary perimeter,
    Euler characteristic) replayed with sets of packed keys."""
    from chopin_spark.queries.polygons import (
        _CH_CH, _CH_CW, _X, _Y, concave_hull_cells,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    cells = {(int(math.floor(r.x / _CH_CW)), int(math.floor(r.y / _CH_CH)))
             for r in spark.sql(
                 f"SELECT ({_X}) AS x, ({_Y}) AS y FROM documents"
             ).collect()}
    f = len(cells)
    eh = len({(cx, cy + b) for (cx, cy) in cells for b in (0, 1)})
    ev = len({(cx + a, cy) for (cx, cy) in cells for a in (0, 1)})
    vv = len({(cx + a, cy + b) for (cx, cy) in cells
              for a in (0, 1) for b in (0, 1)})
    row = concave_hull_cells(spark, SF_CORRECT).collect()[0]
    assert row.n_cells == f
    assert _close(row.area_km2, f * _CH_CW * _CH_CH / 1e6, 1e-4)
    assert _close(row.perim_km,
                  (2 * eh - 2 * f) * _CH_CW / 1000.0
                  + (2 * ev - 2 * f) * _CH_CH / 1000.0, 1e-4)
    assert row.euler_chi == vv - eh - ev + f


def test_spatial_cv_folds_replay(spark):
    """Buffered spatial CV fold sizes replayed with dict arithmetic:
    hash fold per tract, 8-adjacent buffer membership."""
    from chopin_spark.queries.spatial import (
        _CV_K, _CV_NX, _CV_NY, _CV_TX, _CV_TY, spatial_cv_folds,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    pts = [(r.tx, r.ty) for r in spark.sql(
        f"SELECT {_CV_TX} AS tx, {_CV_TY} AS ty FROM documents").collect()]
    n = len(pts)

    def fold(tx, ty):
        return (tx * 7 + ty * 13) % _CV_K

    expect = {}
    for k in range(_CV_K):
        test = buf = 0
        for (tx, ty) in pts:
            own = fold(tx, ty)
            if own == k:
                test += 1
            else:
                touch = any(
                    0 <= tx + dx < _CV_NX and 0 <= ty + dy < _CV_NY
                    and fold(tx + dx, ty + dy) == k
                    for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                    if (dx, dy) != (0, 0))
                if touch:
                    buf += 1
        expect[k] = (test, buf, n - test - buf)
    got = {r.fold: (r.n_test, r.n_buffer, r.n_train) for r in
           spatial_cv_folds(spark, SF_CORRECT).collect()}
    assert got == expect and len(got) == _CV_K
    assert all(v[1] > 0 for v in got.values())


def test_route_locate_by_measure_replay(spark):
    """Linear referencing replayed with per-route running sums: 5
    hash measures located into segments and interpolated."""
    from chopin_spark.queries.roads import (
        _LRS_EV_K, road_segments, route_locate_by_measure,
    )

    segs = collections.defaultdict(list)
    for r in road_segments(spark, 800).collect():
        segs[r.line_id].append((r.seg, r.ax, r.ay, r.bx, r.by))
    expect = {}
    for lid, ss in segs.items():
        ss.sort()
        lo, cum = 0.0, []
        for (seg, ax, ay, bx, by) in ss:
            sl = math.sqrt((bx - ax) ** 2 + (by - ay) ** 2)
            cum.append((seg, ax, ay, bx, by, sl, lo))
            lo += sl
        tlen = lo
        for k in range(_LRS_EV_K):
            m = (lid * 7 + k * 13) % 97 / 97.0 * tlen
            for (seg, ax, ay, bx, by, sl, lo_) in cum:
                if lo_ <= m < lo_ + sl:
                    t = (m - lo_) / sl
                    expect[(lid, k)] = (seg, m, ax + t * (bx - ax),
                                        ay + t * (by - ay))
                    break
    got = {(r.line_id, r.ev_id): r for r in
           route_locate_by_measure(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect)
    for k, (seg, m, px, py) in expect.items():
        row = got[k]
        assert row.seg == seg
        assert _close(row.measure, m, 1e-4)
        assert _close(row.px, px, 1e-4) and _close(row.py, py, 1e-4)


def test_s2_write_layout_plan_replay(spark):
    """Hilbert-ordered bin packing replayed: per-cell aggregates from
    the numpy S2 chain, running-sum file assignment, contiguous
    [range_min, range_max] intervals."""
    import numpy as np
    from chopin_spark import s2
    from chopin_spark.queries.s2q import (
        _LAT, _LEVEL, _LON, s2_write_layout_plan,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    rows = spark.sql(
        f"SELECT {_LON} AS lon, {_LAT} AS lat, n_chars FROM documents"
    ).collect()
    lon = np.array([r.lon for r in rows])
    lat = np.array([r.lat for r in rows])
    f, u, v = s2.xyz_to_face_uv(*s2.lonlat_to_xyz(lon, lat))
    i = s2.st_to_ij(s2.uv_to_st(u), _LEVEL)
    j = s2.st_to_ij(s2.uv_to_st(v), _LEVEL)
    pref = s2.prefix_from_cell_id(s2.cell_id(f, i, j, _LEVEL), _LEVEL)
    cells = collections.defaultdict(lambda: [0, 0])
    for p, r in zip(pref, rows):
        st = cells[int(p)]
        st[0] += 1
        st[1] += r.n_chars
    files = collections.defaultdict(lambda: [None, None, 0, 0])
    prev = 0
    for p in sorted(cells):
        nd, by = cells[p]
        fid = int(math.floor(prev / 20000.0))
        st = files[fid]
        st[0] = p if st[0] is None else min(st[0], p)
        st[1] = p if st[1] is None else max(st[1], p)
        st[2] += nd
        st[3] += by
        prev += by
    got = {r.file_id: (r.range_min, r.range_max, r.n_docs, r.sum_bytes)
           for r in s2_write_layout_plan(spark, SF_CORRECT).collect()}
    assert got == {k: tuple(v) for k, v in files.items()} and len(got) >= 5
    ordered = [got[k] for k in sorted(got)]
    assert all(a[1] < b[0] for a, b in zip(ordered, ordered[1:]))


def test_hilbert_write_layout_plan_replay(spark):
    """Planar Hilbert xy2d (from-scratch loop) + bin packing replayed
    over the per-cell aggregates."""
    from chopin_spark import sqlexpr as sx
    from chopin_spark.queries.s2q import hilbert_write_layout_plan
    from chopin_spark.tables import load

    def xy2d(order, x, y):
        rx = ry = 0
        d = 0
        s = (1 << order) >> 1
        while s > 0:
            rx = 1 if (x & s) > 0 else 0
            ry = 1 if (y & s) > 0 else 0
            d += s * s * ((3 * rx) ^ ry)
            if ry == 0:
                if rx == 1:
                    x, y = s - 1 - x, s - 1 - y
                x, y = y, x
            s >>= 1
        return d

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    n = 1 << 6
    cells = collections.defaultdict(lambda: [0, 0])
    for r in spark.sql(
        f"SELECT {sx.grid_ix_expr(sx.x_expr('doc_id'), n)} AS hx,"
        f" {sx.grid_iy_expr(sx.y_expr('doc_id'), n)} AS hy, n_chars"
        " FROM documents"
    ).collect():
        st = cells[xy2d(6, int(r.hx), int(r.hy))]
        st[0] += 1
        st[1] += r.n_chars
    files = collections.defaultdict(lambda: [None, None, 0, 0, 0])
    prev = 0
    for hd in sorted(cells):
        nd, by = cells[hd]
        fid = int(math.floor(prev / 20000.0))
        st = files[fid]
        st[0] = hd if st[0] is None else min(st[0], hd)
        st[1] = hd if st[1] is None else max(st[1], hd)
        st[2] += 1
        st[3] += nd
        st[4] += by
        prev += by
    got = {r.file_id: (r.range_min, r.range_max, r.n_cells, r.n_docs,
                       r.sum_bytes)
           for r in hilbert_write_layout_plan(spark, SF_CORRECT).collect()}
    assert got == {k: tuple(v) for k, v in files.items()} and len(got) >= 5


def test_pycnophylactic_smooth_replay(spark):
    """Tobler's mass-preserving smoothing replayed with two explicit
    rounds on the micro-unit lattice: self+rook average, half-up
    requantize, zone renormalization."""
    from chopin_spark.queries.spatial import (
        _DOC_X, _DOC_Y, _PYC_CPZ, _PYC_NX, _PYC_NY, pycnophylactic_smooth,
    )
    from chopin_spark.tables import load
    from chopin_spark.zones import TRACT_H, TRACT_NX, TRACT_NY, TRACT_W

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    mass = collections.Counter()
    for r in spark.sql(
        f"SELECT CAST(FLOOR({_DOC_Y} / {TRACT_H!r}) AS BIGINT) * {TRACT_NX}"
        f" + CAST(FLOOR({_DOC_X} / {TRACT_W!r}) AS BIGINT) AS zone,"
        " CAST(SUM(n_chars) AS BIGINT) AS m FROM documents GROUP BY 1"
    ).collect():
        mass[r.zone] = r.m * 1000000

    kx, ky = _PYC_NX // TRACT_NX, _PYC_NY // TRACT_NY
    zone_of = {(gx, gy): (gy // ky) * TRACT_NX + (gx // kx)
               for gx in range(_PYC_NX) for gy in range(_PYC_NY)}
    g = {c: math.floor(mass[z] / float(_PYC_CPZ) + 0.5)
         for c, z in zone_of.items()}
    for _ in range(2):
        s = {}
        for (gx, gy), _v in g.items():
            nb = [g[(nx_, ny_)] for (nx_, ny_) in
                  ((gx, gy), (gx + 1, gy), (gx - 1, gy),
                   (gx, gy + 1), (gx, gy - 1)) if (nx_, ny_) in g]
            s[(gx, gy)] = math.floor(sum(nb) / float(len(nb)) + 0.5)
        zv = collections.Counter()
        for c, v in s.items():
            zv[zone_of[c]] += v
        g = {c: (math.floor(v * (mass[zone_of[c]] / float(zv[zone_of[c]]))
                            + 0.5) if zv[zone_of[c]] > 0 else 0)
             for c, v in s.items()}
    expect = {}
    for c, v in g.items():
        z = zone_of[c]
        st = expect.setdefault(z, [0, 0, None, None])
        st[0] += 1
        st[1] += v
        st[2] = v if st[2] is None else min(st[2], v)
        st[3] = v if st[3] is None else max(st[3], v)
    got = {r.zone: r for r in
           pycnophylactic_smooth(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect)
    for z, (nc, sv, mn, mx) in expect.items():
        row = got[z]
        assert row.n_cells == nc
        assert _close(row.zone_mass_check, sv / 1e6, 1e-4)
        assert _close(row.v_range, (mx - mn) / 1e6, 1e-4)
        assert _close(row.v_max, mx / 1e6, 1e-4)


def test_chaikin_smooth_roads_replay(spark):
    """Two Chaikin corner-cut rounds on the 4^k integer lattice
    replayed as list transforms; length and dyadic roughness stats."""
    from chopin_spark.queries.simplifyq import (
        _M, _NL, chaikin_smooth_roads,
    )

    def verts(l):
        out = []
        for i in range(_M):
            x = i * 500 + ((l * 7 + i * 13) % 41) - 20
            y = (l * 10000 + abs((i * 125 + l * 237) % 4000 - 2000)
                 - 1000 + ((l * 13 + i * 29) % 41) - 20)
            out.append((x, y))
        return out

    def chaikin(vs):
        out = [(vs[0][0] * 4, vs[0][1] * 4)]
        for (ax, ay), (bx, by) in zip(vs, vs[1:]):
            out.append((3 * ax + bx, 3 * ay + by))
            out.append((ax + 3 * bx, ay + 3 * by))
        out.append((vs[-1][0] * 4, vs[-1][1] * 4))
        # emitted idx order: 0, then 2i+1 / 2i+2 interleaved, then tail
        return out

    def stats(vs):
        n = len(vs)
        s = sum(math.sqrt((bx - ax) ** 2 + (by - ay) ** 2)
                for (ax, ay), (bx, by) in zip(vs, vs[1:]))
        rough = sum((cx - 2 * bx + ax) ** 2 + (cy - 2 * by + ay) ** 2
                    for (ax, ay), (bx, by), (cx, cy)
                    in zip(vs, vs[1:], vs[2:]))
        return n, s, rough

    got = {r.line_id: r for r in
           chaikin_smooth_roads(spark, SF_CORRECT).collect()}
    assert len(got) == _NL
    for l in range(_NL):
        v0 = verts(l)
        v2 = chaikin(chaikin(v0))
        n0, s0, r0 = stats(v0)
        n2, s2, r2 = stats(v2)
        row = got[l]
        assert (row.n_before, row.n_after) == (n0, n2)
        assert row.rough_before == r0
        assert _close(row.len_before, s0, 1e-4)
        assert _close(row.len_after, s2 / 16.0, 1e-4)
        assert _close(row.rough_after, r2 / 256.0, 1e-4)
        assert row.rough_after < row.rough_before


_P30 = 1_000_000_007


def _cf(s, mult=31):
    h = 0
    for ch in s:
        h = (h * mult + ord(ch)) % _P30
    return h


def test_hll_distinct_urls_replay(spark):
    """The from-scratch HLL (64 registers, BIN-length rank, dyadic
    inverse-power fold, linear-counting correction) replayed with
    dicts over re-derived URLs."""
    from chopin_spark.pages import CCTLDS
    from chopin_spark.queries.sketchq import hll_distinct_urls
    from chopin_spark.tables import load

    urls = set()
    for r in load(spark, SF_CORRECT, "documents") \
            .select("doc_id").collect():
        d = r.doc_id
        url = (f"https://h{(d * 69069) % 99991}.example."
               f"{CCTLDS[(d * 2654435761) % len(CCTLDS)]}/p/{d}")
        urls.add(url)
    regs = collections.defaultdict(int)
    for u in urls:
        h1, h2 = _cf(u, 31), _cf(u, 37)
        rank = 31 if h2 == 0 else 31 - h2.bit_length()
        regs[h1 % 64] = max(regs[h1 % 64], rank)
    m_j = [regs.get(i, 0) for i in range(64)]
    sum_inv = sum(2.0 ** -m for m in m_j)
    n_zero = sum(1 for m in m_j if m == 0)
    reg_chk = sum(m * ((i * 13) % 31) for i, m in enumerate(m_j))
    est_raw = 0.709 * 64 * 64 / sum_inv
    est_cor = (64 * math.log(64.0 / n_zero)
               if est_raw <= 2.5 * 64 and n_zero > 0 else est_raw)

    row = hll_distinct_urls(spark, SF_CORRECT).collect()[0]
    assert (row.m, row.n_zero, row.reg_chk, row.n_exact) \
        == (64, n_zero, reg_chk, len(urls))
    assert _close(row.est_raw, est_raw, 1e-4)
    assert _close(row.est_corrected, est_cor, 1e-4)
    assert _close(row.rel_err, (est_raw - len(urls)) / len(urls), 1e-4)


def test_countmin_heavy_hitters_replay(spark):
    """The 4x256 Count-Min grid replayed with Counters; min-over-rows
    estimates can only overcount."""
    from chopin_spark.queries.sketchq import (
        _CM_HASHES, _CM_P, _CM_PROBES, _CM_W, countmin_heavy_hitters,
    )
    from chopin_spark.tables import load

    tf = collections.Counter()
    for r in load(spark, SF_CORRECT, "documents") \
            .select("text").collect():
        tf.update(r.text.split(" "))
    sketch = collections.Counter()
    for tok, cnt in tf.items():
        f = _cf(tok)
        for hrow, ha, hb in _CM_HASHES:
            sketch[(hrow, (f * ha + hb) % _CM_P % _CM_W)] += cnt
    expect = {}
    for term in _CM_PROBES:
        f = _cf(term)
        # inner-join semantics: cells no token hashed into do not
        # exist in the sketch CTE, so they cannot win the MIN
        est = min(sketch[c] for c in
                  ((hrow, (f * ha + hb) % _CM_P % _CM_W)
                   for hrow, ha, hb in _CM_HASHES) if c in sketch)
        expect[term] = (est, tf.get(term, 0), est - tf.get(term, 0))
    got = {r.term: (r.est_count, r.exact_count, r.overestimate)
           for r in countmin_heavy_hitters(spark, SF_CORRECT).collect()}
    assert got == expect
    assert all(v[2] >= 0 for v in got.values())
    assert got["zorro"][1] == 0  # the absent probe is pure collision mass


def test_ams_f2_host_skew_replay(spark):
    """AMS F2 (12 cubic-residue sign functions, median-of-3 group
    means) replayed with integer sums."""
    from chopin_spark.queries.sketchq import _AMS_COEFS, ams_f2_host_skew
    from chopin_spark.tables import load

    hosts = [int(math.floor(97.0 / ((r.doc_id % 97) + 1))) for r in
             load(spark, SF_CORRECT, "documents")
             .select("doc_id").collect()]
    n = len(hosts)
    z = []
    for a, b in _AMS_COEFS:
        tot = 0
        for h in hosts:
            s = (h * a + b) % 9973
            tot += 1 if (s * s * s % 9973) % 2 == 0 else -1
        z.append(tot)
    groups = [sum(z[g * 4 + i] ** 2 for i in range(4)) / 4.0
              for g in range(3)]
    est = sum(groups) - max(groups) - min(groups)
    f2 = sum(c * c for c in collections.Counter(hosts).values())

    row = ams_f2_host_skew(spark, SF_CORRECT).collect()[0]
    assert (row.n_docs, row.exact_f2) == (n, f2)
    assert _close(row.est_f2, est, 1e-9)
    assert _close(row.rel_err, est / f2 - 1.0, 1e-6)


def test_kll_quantile_sketch_replay(spark):
    """The two-level KLL ladder (per-partition halving, global
    halving at weight 4) and its rank errors replayed with sorts."""
    from chopin_spark.queries.sketchq import _KLL_QS, kll_quantile_sketch
    from chopin_spark.tables import load

    v = [(r.n_chars, r.doc_id) for r in
         load(spark, SF_CORRECT, "documents")
         .select("doc_id", "n_chars").collect()]
    n = len(v)
    l1 = []
    parts = collections.defaultdict(list)
    for x, d in v:
        parts[d % 8].append((x, d))
    for rows in parts.values():
        rows.sort()
        l1.extend(r for i, r in enumerate(rows, 1) if i % 2 == 0)
    l1.sort()
    l2 = [x for i, (x, _) in enumerate(l1, 1) if i % 2 == 0]
    tw = 4 * len(l2)
    xs_sorted = sorted(x for x, _ in v)
    expect = {}
    for q in _KLL_QS:
        cw = 0
        est = None
        for x in l2:
            cw += 4
            if cw >= q * tw:
                est = x
                break
        exact = xs_sorted[int(math.ceil(q * n)) - 1]
        rank_err = abs(sum(1 for x, _ in v if x <= est) / n - q)
        expect[q] = (est, exact, rank_err)
    got = {r.q: (r.est_x, r.exact_x, r.rank_err) for r in
           kll_quantile_sketch(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect)
    for q, (est, exact, rerr) in expect.items():
        assert got[q][:2] == (est, exact)
        assert _close(got[q][2], rerr, 1e-6)
    assert max(v[2] for v in got.values()) < 0.1


def test_pages_geocode_s2_rollup_replay(spark):
    """URL-host geocode (char-fold LCG draws) + level-8/4 S2 rollup
    replayed with dicts and the numpy Hilbert chain."""
    import numpy as np
    from chopin_spark import s2
    from chopin_spark.pages import CCTLDS
    from chopin_spark.queries.pagespipe import pages_geocode_s2_rollup
    from chopin_spark.tables import load

    rows = []
    for r in load(spark, SF_CORRECT, "orders") \
            .select("o_orderkey").collect():
        k = r.o_orderkey
        host = (f"h{(k * 69069) % 99991}.example."
                f"{CCTLDS[(k * 2654435761) % len(CCTLDS)]}")
        f = _cf(host)
        lon = -125.0 + 58.0 * (((f * 2654435761) % 999983) / 999983.0)
        lat = 25.0 + 16.0 * (((f * 1103515245 + 12345) % 999983)
                             / 999983.0)
        rows.append((k, lon, lat))
    lon = np.array([x for _, x, _ in rows])
    lat = np.array([y for _, _, y in rows])
    fc, u, v = s2.xyz_to_face_uv(*s2.lonlat_to_xyz(lon, lat))
    i = s2.st_to_ij(s2.uv_to_st(u), 8)
    j = s2.st_to_ij(s2.uv_to_st(v), 8)
    pref = s2.prefix_from_cell_id(s2.cell_id(fc, i, j, 8), 8)
    agg = {}
    for (k, _, _), p in zip(rows, pref):
        c4 = int(p) >> 8
        st = agg.setdefault(c4, [0, set(), k])
        st[0] += 1
        st[1].add(int(p))
        st[2] = min(st[2], k)
    got = {r.s2_cell4: (r.n_pages, r.n_cells8, r.first_page) for r in
           pages_geocode_s2_rollup(spark, SF_CORRECT).collect()}
    assert got == {c: (n, len(cs), fp) for c, (n, cs, fp) in agg.items()}
    assert len(got) >= 3


def test_bootstrap_mean_chars_replay(spark):
    """The 32 closed-form multiplier-bootstrap replicates replayed
    with the exact {0,1,2} LCG weight draw."""
    from chopin_spark.queries.relational import (
        _BOOT_B, bootstrap_mean_chars,
    )
    from chopin_spark.tables import load

    docs = [(r.doc_id, r.n_chars) for r in
            load(spark, SF_CORRECT, "documents")
            .select("doc_id", "n_chars").collect()]
    expect = {}
    for b in range(_BOOT_B):
        neff = wsum = 0
        for d, nc in docs:
            w = (d * 2654435761 + b * 40503) % 4
            w = 0 if w == 0 else 2 if w == 3 else 1
            neff += w
            wsum += w * nc
        expect[b] = (neff, wsum / neff)
    got = {r.replicate: (r.n_eff, r.boot_mean) for r in
           bootstrap_mean_chars(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect) and len(got) == _BOOT_B
    for b, (neff, mean) in expect.items():
        assert got[b][0] == neff
        assert _close(got[b][1], mean, 1e-4)


def test_host_pagerank_personalized_replay(spark):
    """Three integer micro-rank restart rounds replayed with dicts:
    floor quotients per edge, seed-only restart mass, zero support
    outside the frontier."""
    from chopin_spark.queries.webtext import (
        _PPR_SEEDS, _PR_BASE, _PR_ITERS, host_pagerank_personalized,
    )
    from chopin_spark.tables import load

    # multigraph: duplicate (src, dst) rows each carry one share and
    # each count toward outdeg — keep the list, do NOT dedup
    edges = []
    for r in load(spark, SF_CORRECT, "documents") \
            .select("doc_id").collect():
        s = (r.doc_id * 69069) % 97
        d = (r.doc_id * 48271) % 97
        if s != d:
            edges.append((s, d))
    nodes = {s for e in edges for s in e}
    deg = collections.Counter(s for s, _ in edges)
    rank = {v: (1000000 if v in _PPR_SEEDS else 0) for v in nodes}
    for _ in range(_PR_ITERS):
        inb = collections.Counter()
        for s, d in edges:
            inb[d] += rank[s] // deg[s]
        rank = {v: (_PR_BASE if v in _PPR_SEEDS else 0)
                + math.floor(0.85 * inb.get(v, 0) + 0.5)
                for v in nodes}
    expect = {v: rk for v, rk in rank.items() if rk > 0}
    got = {r.host_num: r.rank_micro for r in
           host_pagerank_personalized(spark, SF_CORRECT).collect()}
    assert got == expect
    assert set(_PPR_SEEDS) <= set(got) and len(got) < len(nodes)


def test_dedup_ngram_jaccard_capped_replay(spark):
    """df-capped exact 5-gram Jaccard pairs replayed with sets; the
    cap must not change which pairs clear the threshold here."""
    from chopin_spark.queries.textops import (
        _MAX_DF, dedup_ngram_jaccard_capped,
    )
    from chopin_spark.tables import load

    sh0 = {}
    for r in load(spark, SF_CORRECT, "documents") \
            .select("doc_id", "text").collect():
        w = r.text.split(" ")
        if len(w) >= 5:
            sh0[r.doc_id] = {" ".join(w[i:i + 5])
                             for i in range(len(w) - 4)}
    df = collections.Counter(s for ss in sh0.values() for s in ss)
    sh = {d: {s for s in ss if df[s] <= _MAX_DF}
          for d, ss in sh0.items()}
    expect = {}
    docs = sorted(sh)
    for ai, a in enumerate(docs):
        for b in docs[ai + 1:]:
            i = len(sh[a] & sh[b])
            if i == 0:
                continue
            jac = _round_half_away(i / (len(sh[a]) + len(sh[b]) - i))
            if jac >= 0.5:
                expect[(a, b)] = jac
    got = {(r.d1, r.d2): r.jaccard for r in
           dedup_ngram_jaccard_capped(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect) and len(got) >= 2
    for k, jac in expect.items():
        assert _close(got[k], jac, 1e-4)


def test_host_triangle_counts_replay(spark):
    """Per-node triangle participation replayed with adjacency sets
    (each triangle credits its three corners once)."""
    from chopin_spark.queries.webtext import (
        _TRI_DST, _TRI_SRC, host_triangle_counts,
    )
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    und = set()
    for r in spark.sql(
        f"SELECT {_TRI_SRC} AS src, {_TRI_DST} AS dst FROM documents"
    ).collect():
        if r.src != r.dst:
            und.add((min(r.src, r.dst), max(r.src, r.dst)))
    adj = collections.defaultdict(set)
    for u, v in und:
        adj[u].add(v)
        adj[v].add(u)
    cnt = collections.Counter()
    for (u, v) in und:
        for w in adj[u] & adj[v]:
            if w > v:  # canonical u < v < w: count each triangle once
                cnt[u] += 1
                cnt[v] += 1
                cnt[w] += 1
    got = {r.host_id: r.tri_cnt for r in
           host_triangle_counts(spark, SF_CORRECT).collect()}
    assert got == dict(cnt) and sum(got.values()) % 3 == 0
    assert sum(got.values()) // 3 >= 100


def test_dedup_containment_pairs_replay(spark):
    """Asymmetric containment (subset-copy detection) replayed with
    sets: forward/reverse overlap ratios, GREATEST gate."""
    from chopin_spark.queries.textops import (
        _CONT_MAX_DF, _CONT_THRESHOLD, dedup_containment_pairs,
    )
    from chopin_spark.tables import load

    sh0 = {}
    for r in load(spark, SF_CORRECT, "documents") \
            .select("doc_id", "text").collect():
        w = r.text.split(" ")
        if len(w) >= 5:
            sh0[r.doc_id] = {" ".join(w[i:i + 5])
                             for i in range(len(w) - 4)}
    df = collections.Counter(s for ss in sh0.values() for s in ss)
    sh = {d: {s for s in ss if df[s] <= _CONT_MAX_DF}
          for d, ss in sh0.items()}
    expect = {}
    docs = sorted(sh)
    for ai, a in enumerate(docs):
        for b in docs[ai + 1:]:
            i = len(sh[a] & sh[b])
            if i == 0:
                continue
            cf = _round_half_away(i / len(sh[a]))
            cr = _round_half_away(i / len(sh[b]))
            if max(cf, cr) >= _CONT_THRESHOLD:
                expect[(a, b)] = (i, cf, cr)
    got = {(r.d1, r.d2): (r.i, r.c_fwd, r.c_rev) for r in
           dedup_containment_pairs(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect) and len(got) >= 2
    for k, (i, cf, cr) in expect.items():
        assert got[k][0] == i
        assert _close(got[k][1], cf, 1e-4) and _close(got[k][2], cr, 1e-4)


def test_alpha_mix_by_lang_replay(spark):
    """Temperature-scaled language rebalancing replayed: sqrt rates in
    basis points, hash-threshold keeps, per-language rollups."""
    from chopin_spark.queries.trainprep import alpha_mix_by_lang
    from chopin_spark.tables import load

    docs = [(r.doc_id, r.lang) for r in
            load(spark, SF_CORRECT, "documents")
            .select("doc_id", "lang").collect()]
    counts = collections.Counter(lang for _, lang in docs)
    nmin = min(counts.values())
    rate = {lang: int(math.floor(10000 * math.sqrt(nmin / n)))
            for lang, n in counts.items()}
    agg = collections.defaultdict(lambda: [0, 0])
    for d, lang in docs:
        if ((d * 48271) % 10007) % 10000 < rate[lang]:
            agg[lang][0] += 1
            agg[lang][1] += d
    got = {r.lang: (r.n_total, r.rate_bp, r.n_kept, r.kept_id_sum)
           for r in alpha_mix_by_lang(spark, SF_CORRECT).collect()}
    assert set(got) == set(counts)
    for lang in counts:
        assert got[lang] == (counts[lang], rate[lang],
                             agg[lang][0], agg[lang][1])
    assert rate[max(counts, key=counts.get)] < 10000


def test_rrf_hybrid_topk_replay(spark):
    """Reciprocal-rank fusion replayed over from-scratch BM25 and
    cosine rankings (both round-then-rank, doc_id ties)."""
    from chopin_spark.queries.simsearch import rrf_hybrid_topk
    from chopin_spark.queries.textops import (
        _BM_B, _BM_K, _BM_K1, _BM_TERMS,
    )
    from chopin_spark.tables import load

    docs = {r.doc_id: r.text.split(" ") for r in
            load(spark, SF_CORRECT, "documents")
            .select("doc_id", "text").collect()}
    n_docs = len(docs)
    avgdl = sum(len(t) for t in docs.values()) / n_docs
    post = {t: {d: toks.count(t) for d, toks in docs.items()
                if t in toks} for t in _BM_TERMS}
    scored = collections.defaultdict(float)
    for t, ps in post.items():
        df = len(ps)
        idf = math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)
        for d, tf in ps.items():
            scored[d] += idf * (tf * (_BM_K1 + 1.0)) / (
                tf + _BM_K1 * (1.0 - _BM_B + _BM_B * len(docs[d]) / avgdl))
    lex = {d: rk + 1 for rk, (d, _) in enumerate(sorted(
        ((d, _round_half_away(s)) for d, s in scored.items()),
        key=lambda kv: (-kv[1], kv[0]))[:_BM_K])}

    raw = {r.vec_id: list(r.embedding) for r in
           load(spark, SF_CORRECT, "embeddings")
           .select("vec_id", "embedding").collect()}

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    q = raw[0]
    cos = {v: _round_half_away(
        fold_dot(e, q) / (math.sqrt(fold_dot(e, e))
                          * math.sqrt(fold_dot(q, q))))
        for v, e in raw.items() if v != 0}
    sem = {v: rk + 1 for rk, (v, _) in enumerate(sorted(
        cos.items(), key=lambda kv: (-kv[1], kv[0]))[:10])}

    fused = {}
    for item in set(lex) | set(sem):
        sc = 0.0
        if item in lex:
            sc += 1.0 / (60.0 + lex[item])
        if item in sem:
            sc += 1.0 / (60.0 + sem[item])
        fused[item] = (_round_half_away(sc, 6),
                       lex.get(item, -1), sem.get(item, -1))
    ranked = sorted(fused.items(), key=lambda kv: (-kv[1][0], kv[0]))[:20]
    expect = [(rk + 1, item, sc, lr, sr)
              for rk, (item, (sc, lr, sr)) in enumerate(ranked)]
    got = [(r.rrf_rank, r.item_id, r.rrf_score, r.lex_rank, r.sem_rank)
           for r in rrf_hybrid_topk(spark, SF_CORRECT)
           .orderBy("rrf_rank").collect()]
    assert [(g[0], g[1], g[3], g[4]) for g in got] \
        == [(e[0], e[1], e[3], e[4]) for e in expect]
    for g, e in zip(got, expect):
        assert _close(g[2], e[2], 1e-6)
    # lex ids are doc_ids, sem ids are vec_ids (disjoint id spaces at
    # this sf): both single-list sources must contribute to the fusion
    assert any(g[3] > 0 for g in got) and any(g[4] > 0 for g in got)


def test_betweenness_brandes_replay(spark):
    """Node betweenness replayed with a per-source BFS + the exact
    quantized backward recurrence (floor(sig_v*(1e6+dq_w)/sig_w+0.5))
    the engine accumulates."""
    from chopin_spark.queries.graphq import _BC_CAP, betweenness_brandes
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    und = set()
    for r in load(spark, SF_CORRECT, "documents") \
            .select("doc_id").collect():
        s = (r.doc_id * 69069) % 97
        d = ((r.doc_id * 48271) + 17) % 97
        if s != d:
            und.add((s, d))
            und.add((d, s))
    adj = collections.defaultdict(set)
    for s, d in und:
        adj[s].add(d)
    nodes = sorted(adj)

    bu = collections.Counter()
    for src in nodes:
        depth = {src: 0}
        sig = {src: 1}
        frontier = [src]
        levels = [[src]]
        # the engine's sweep is DEPTH-BOUNDED at _BC_CAP hops: paths
        # longer than the horizon carry no credit
        while frontier and len(levels) <= _BC_CAP:
            nxt = collections.Counter()
            for v in frontier:
                for w in adj[v]:
                    if w not in depth:
                        nxt[w] += sig[v]
            for w in nxt:
                depth[w] = len(levels)
                sig[w] = nxt[w]
            frontier = sorted(nxt)
            if frontier:
                levels.append(frontier)
        dq = {v: 0 for v in levels[-1]}
        for k in range(len(levels) - 2, 0, -1):
            ndq = {}
            for v in levels[k]:
                acc = 0
                for w in adj[v]:
                    if depth.get(w) == k + 1:
                        acc += math.floor(
                            sig[v] * (1000000.0 + dq[w]) / sig[w] + 0.5)
                ndq[v] = acc
                bu[v] += acc
            dq = ndq

    got = {r.host_id: (r.betweenness_u, r.betweenness) for r in
           betweenness_brandes(spark, SF_CORRECT).collect()}
    expect = {v: u for v, u in bu.items() if u > 0}
    assert {k: v[0] for k, v in got.items()} == expect and len(got) >= 20
    for v, (u, b) in got.items():
        assert _close(b, u / 2000000.0, 1e-4)


def test_attribution_markov_removal_replay(spark):
    """Markov removal-effect attribution replayed: journey splitting
    at purchases, transition row-normalization, 12 fixed-point rounds
    per removal variant, shares."""
    from chopin_spark.queries.temporalq import (
        _MK_ROUNDS, attribution_markov_removal,
    )
    from chopin_spark.tables import load

    rows = load(spark, SF_CORRECT, "events") \
        .select("user_id", "ts", "event_id", "event_type").collect()
    per = collections.defaultdict(list)
    for r in rows:
        per[r.user_id].append((r.ts, r.event_id, r.event_type))
    cnt = collections.Counter()
    for evs in per.values():
        evs.sort()
        seqs = collections.defaultdict(list)
        purchases = 0
        for (_, _, et) in evs:
            seqs[purchases].append(et)
            if et == "purchase":
                purchases += 1
        for seq in seqs.values():
            first = seq[0]
            cnt[("start", "conv" if first == "purchase" else first)] += 1
            for a, b in zip(seq, seq[1:] + [None]):
                if a == "purchase":
                    continue
                cnt[(a, "end" if b is None else
                     "conv" if b == "purchase" else b)] += 1

    states = ["start", "view", "click", "signup", "error"]
    tos = ["view", "click", "signup", "error", "conv"]
    p = {}
    for f in states:
        tot = max(sum(c for (ff, _), c in cnt.items() if ff == f), 1)
        for t in tos:
            p[(f, t)] = cnt[(f, t)] / tot

    def solve(removed):
        x = {f: 0.0 for f in states}
        for _ in range(_MK_ROUNDS):
            nx = {}
            for f in states:
                if removed is not None and f == removed:
                    nx[f] = 0.0
                    continue
                v = p[(f, "conv")]
                for t in ("view", "click", "signup", "error"):
                    if t != removed:
                        v += p[(f, t)] * x[t]
                nx[f] = v
            x = nx
        return x["start"]

    base = solve(None)
    effects = {t: 1.0 - solve(t) / base
               for t in ("view", "click", "signup", "error")}
    tot_eff = sum(effects.values())
    chan_name = {"view": "view", "click": "click", "signup": "signup",
                 "error": "error"}
    got = {r.channel: r for r in
           attribution_markov_removal(spark, SF_CORRECT).collect()}
    assert set(got) == set(chan_name)
    for t, eff in effects.items():
        row = got[t]
        assert _close(row.base_conv, base, 1e-6)
        assert _close(row.removal_conv, solve(t), 1e-6)
        assert _close(row.removal_effect, eff, 1e-6)
        assert _close(row.attribution_share, eff / tot_eff, 1e-6)
    assert 0 < base < 1


def test_simplify_vw_roads_replay(spark):
    """Eight Visvalingam rounds replayed per line: doubled triangle
    areas over the alive chain, drop the single (a2, idx) minimum."""
    from chopin_spark.queries.simplifyq import (
        _M, _NL, _VW_ROUNDS, simplify_vw_roads,
    )

    expect = {}
    for l in range(_NL):
        pts = []
        for i in range(_M):
            x = i * 500 + ((l * 7 + i * 13) % 41) - 20
            y = (l * 10000 + abs((i * 125 + l * 237) % 4000 - 2000)
                 - 1000 + ((l * 13 + i * 29) % 41) - 20)
            pts.append([i, x, y])
        removed_area = 0
        for _ in range(_VW_ROUNDS):
            best = None
            for ix in range(1, len(pts) - 1):
                (_, ax, ay), (i1, bx, by), (_, cx, cy) = \
                    pts[ix - 1], pts[ix], pts[ix + 1]
                a2 = abs((bx - ax) * (cy - ay) - (by - ay) * (cx - ax))
                if best is None or (a2, i1) < best[:2]:
                    best = (a2, i1, ix)
            removed_area += best[0]
            pts.pop(best[2])
        expect[l] = (len(pts), sum(x for _, x, _ in pts),
                     sum(y for _, _, y in pts), _VW_ROUNDS, removed_area)
    got = {r.line_id: (r.n_kept, r.sum_x, r.sum_y, r.n_removed,
                       r.removed_area2)
           for r in simplify_vw_roads(spark, SF_CORRECT).collect()}
    assert got == expect and len(got) == _NL


def test_exact_substring_removal_replay(spark):
    """ExactSubstr removal accounting replayed: strided window hashes,
    corpus-wide df >= 2, gaps-and-islands merge, removed-token spans."""
    from chopin_spark.queries.trainprep import (
        _XS_STRIDE, _XS_W, exact_substring_removal,
    )
    from chopin_spark.tables import load

    P = 1_000_000_007
    docs = {}
    for r in load(spark, SF_CORRECT, "documents") \
            .select("doc_id", "text").collect():
        uh = [_cf(t) for t in r.text.split(" ")]
        docs[r.doc_id] = uh
    windows = []
    for d, uh in docs.items():
        maxi = max(int(math.floor((len(uh) - _XS_W) / float(_XS_STRIDE))), 0)
        for si in range(maxi + 1):
            h = 0
            for x in uh[si * _XS_STRIDE: si * _XS_STRIDE + _XS_W]:
                h = (h * 31 + x) % P
            windows.append((d, si * _XS_STRIDE, len(uh), h))
    dfc = collections.Counter(h for (_, _, _, h) in windows)
    starts = collections.defaultdict(list)
    for (d, s, n, h) in windows:
        if dfc[h] >= 2:
            starts[d].append((s, n))
    expect = {}
    for d, ss in starts.items():
        ss.sort()
        # gaps-and-islands: new island when s > max(prev s + W)
        isl, prev_end = [], None
        for (s, n) in ss:
            if prev_end is None or s > prev_end:
                isl.append([s, s, n])
            else:
                isl[-1][1] = s
                isl[-1][2] = min(isl[-1][2], n)
            prev_end = max(prev_end or -1, s + _XS_W)
        n_isl = len(isl)
        removed = sum(min(mx + _XS_W, n) - a for (a, mx, n) in isl)
        ntok = ss[0][1]
        expect[d] = (n_isl, removed, removed / ntok)
    got = {r.doc_id: (r.n_islands, r.removed_tokens, r.removed_frac)
           for r in exact_substring_removal(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect) and len(got) >= 3
    for d, (ni, rt, rf) in expect.items():
        assert got[d][:2] == (ni, rt)
        assert _close(got[d][2], rf, 1e-4)


def test_spearman_len_vs_score_replay(spark):
    """Spearman rho replayed from scratch INCLUDING the hashed-feature
    scorer: token char-folds, 16k-bucket closed-form weights, rank
    vectors with the (value, doc_id) tie convention."""
    from chopin_spark.queries.textops import spearman_len_vs_score
    from chopin_spark.tables import load

    scored = []
    for r in load(spark, SF_CORRECT, "documents") \
            .select("doc_id", "text").collect():
        uh = [_cf(t) for t in r.text.split(" ")]
        w_sum = sum(((u % 16384) * 2654435761) % 1999 - 999 for u in uh)
        scored.append((r.doc_id, len(uh), w_sum))
    n = len(scored)
    r_len = {d: rk + 1 for rk, (d, _, _) in enumerate(
        sorted(scored, key=lambda t: (t[1], t[0])))}
    r_q = {d: rk + 1 for rk, (d, _, _) in enumerate(
        sorted(scored, key=lambda t: (t[2], t[0])))}
    d2 = sum((r_len[d] - r_q[d]) ** 2 for (d, _, _) in scored)
    row = spearman_len_vs_score(spark, SF_CORRECT).collect()[0]
    assert (row.n, row.d2) == (n, d2)
    assert _close(row.spearman_rho,
                  1.0 - 6.0 * d2 / (n * (float(n) * n - 1.0)), 1e-6)
    assert 0 < row.spearman_rho < 1


def test_consistent_hash_shards_replay(spark):
    """The 256-vnode hash ring replayed with loops: clockwise distance
    encoded MIN, vnode-to-shard fold, per-shard host/mass rollup."""
    from chopin_spark.pages import CCTLDS
    from chopin_spark.queries.webtext import (
        _CH_SHARDS, _CH_VNODES, consistent_hash_shards,
    )
    from chopin_spark.tables import load

    P30 = 1_000_000_007
    mass = collections.Counter()
    for r in load(spark, SF_CORRECT, "documents") \
            .select("doc_id", "n_chars").collect():
        d = r.doc_id
        host = (f"h{(d * 69069) % 99991}.example."
                f"{CCTLDS[(d * 2654435761) % len(CCTLDS)]}")
        mass[host] += r.n_chars
    vnodes = [(s * _CH_VNODES + v, _cf(f"s{s}#{v}"))
              for s in range(_CH_SHARDS) for v in range(_CH_VNODES)]
    agg = {s: [0, 0] for s in range(_CH_SHARDS)}
    for host, m in mass.items():
        hpos = _cf(host)
        enc = min(((vpos - hpos + P30) % P30) * 512 + vid
                  for vid, vpos in vnodes)
        shard = (enc % 512) // _CH_VNODES
        agg[shard][0] += 1
        agg[shard][1] += m
    got = {r.shard: (r.n_hosts, r.mass_chars) for r in
           consistent_hash_shards(spark, SF_CORRECT).collect()}
    assert got == {s: tuple(v) for s, v in agg.items()}
    assert len(got) == _CH_SHARDS and sum(v[0] for v in got.values()) \
        == len(mass)


def test_url_template_mining_replay(spark):
    """Digit-run template folding replayed with re.sub over the
    collected messy-URL fixture strings."""
    import re
    from chopin_spark.queries.webtext import _MESSY, url_template_mining
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    agg = {}
    for r in spark.sql(
        f"SELECT doc_id, {_MESSY} AS u FROM documents"
    ).collect():
        m = re.match(r"^[a-zA-Z]+://([^/?#]+)(.*)$", r.u)
        tmpl = m.group(1).lower() + re.sub(r"[0-9]+", "(n)", m.group(2))
        st = agg.setdefault(tmpl, [0, set(), r.doc_id])
        st[0] += 1
        st[1].add(r.u)
        st[2] = min(st[2], r.doc_id)
    got = {r.template: (r.n_fetches, r.n_urls, r.first_doc) for r in
           url_template_mining(spark, SF_CORRECT).collect()}
    assert got == {t: (n, len(us), fd) for t, (n, us, fd) in agg.items()}
    assert any("(n)" in t for t in got)


def test_embedding_epoch_drift_replay(spark):
    """Per-label mean-vector cosine between parity epochs replayed
    with integer component sums on the 1/1024 lattice."""
    from chopin_spark.queries.simsearch import embedding_epoch_drift
    from chopin_spark.tables import load

    sums = collections.defaultdict(lambda: [0, None])
    for r in load(spark, SF_CORRECT, "embeddings") \
            .select("vec_id", "label", "embedding").collect():
        q = [math.floor(float(x) * 1024 + 0.5) for x in r.embedding]
        st = sums[(r.label, r.vec_id % 2)]
        st[0] += 1
        st[1] = q if st[1] is None else [a + b for a, b in zip(st[1], q)]
    expect = {}
    for (label, ep), (n0, s0) in sums.items():
        if ep != 0 or (label, 1) not in sums:
            continue
        n1, s1 = sums[(label, 1)]
        dot = sum(a * b for a, b in zip(s0, s1))
        na2 = sum(a * a for a in s0)
        nb2 = sum(b * b for b in s1)
        expect[label] = (n0, n1,
                         dot / (math.sqrt(na2) * math.sqrt(nb2)))
    got = {r.label: (r.n0, r.n1, r.mean_cosine) for r in
           embedding_epoch_drift(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect) and len(got) >= 3
    for lab, (n0, n1, cosv) in expect.items():
        assert got[lab][:2] == (n0, n1)
        assert _close(got[lab][2], cosv, 1e-6)


def test_qscore_lang_bias_audit_replay(spark):
    """Language share per quality decile replayed with the scorer
    re-derived from scratch and an explicit NTILE(10) assignment."""
    from chopin_spark.queries.textops import qscore_lang_bias_audit
    from chopin_spark.tables import load

    scored = []
    for r in load(spark, SF_CORRECT, "documents") \
            .select("doc_id", "lang", "text").collect():
        uh = [_cf(t) for t in r.text.split(" ")]
        w_sum = sum(((u % 16384) * 2654435761) % 1999 - 999 for u in uh)
        scored.append((_round_half_away(w_sum / len(uh)), r.doc_id, r.lang))
    scored.sort()
    n = len(scored)
    base, rem = n // 10, n % 10
    agg = collections.Counter()
    ntot = collections.Counter()
    for rk, (_, _, lang) in enumerate(scored, 1):
        if rk <= rem * (base + 1):
            dec = (rk - 1) // (base + 1) + 1
        else:
            dec = rem + (rk - rem * (base + 1) - 1) // base + 1
        agg[(dec, lang)] += 1
        ntot[dec] += 1
    got = {(r.decile, r.lang): (r.n_docs, r.share) for r in
           qscore_lang_bias_audit(spark, SF_CORRECT).collect()}
    assert set(got) == set(agg)
    for k, c in agg.items():
        assert got[k][0] == c
        assert _close(got[k][1], c / ntot[k[0]], 1e-6)
    assert len(ntot) == 10


def test_ccnet_perplexity_buckets_replay(spark):
    """The bigram LM (train slice, add-1 smoothing, OOV path) and the
    head/middle/tail tercile histogram replayed with dicts."""
    from chopin_spark.queries.lmq import ccnet_perplexity_buckets
    from chopin_spark.tables import load

    docs = [(r.doc_id, r.lang, r.text.split(" ")) for r in
            load(spark, SF_CORRECT, "documents")
            .select("doc_id", "lang", "text").collect()]
    c2, c1 = collections.Counter(), collections.Counter()
    vocab = set()
    for d, _, w in docs:
        if d % 10 == 0:
            vocab.update(w)
            if len(w) >= 2:
                for a, b in zip(w, w[1:]):
                    c2[(a, b)] += 1
                    c1[a] += 1
    V = len(vocab)
    scored = []
    for d, lang, w in docs:
        if d % 10 == 0 or len(w) < 2:
            continue
        s = 0.0
        nb = len(w) - 1
        for a, b in zip(w, w[1:]):
            s += (math.log(c1.get(a, 0) + V)
                  - math.log(c2.get((a, b), 0) + 1))
        scored.append((lang, _round_half_away(s / nb), nb))
    hist = collections.defaultdict(lambda: [0, 0])
    for lang, nll, nb in scored:
        st = hist[(lang, math.floor(nll * 10000 + 0.5))]
        st[0] += 1
        st[1] += nb
    expect = collections.defaultdict(lambda: [0, 0])
    langs = {k[0] for k in hist}
    for lang in langs:
        bins = sorted((s, c, m) for (lg, s), (c, m) in hist.items()
                      if lg == lang)
        tot = sum(c for _, c, _ in bins)
        cc = 0
        for s, c, m in bins:
            bucket = ("head" if 3 * cc < tot
                      else "middle" if 3 * cc < 2 * tot else "tail")
            cc += c
            st = expect[(lang, bucket)]
            st[0] += c
            st[1] += m
    got = {(r.lang, r.bucket): (r.n_docs, r.n_bigrams) for r in
           ccnet_perplexity_buckets(spark, SF_CORRECT).collect()}
    assert got == {k: tuple(v) for k, v in expect.items()}
    assert len({k[1] for k in got}) == 3


def test_cdc_chunk_dedup_replay(spark):
    """Content-defined chunking replayed sequentially: rolling 3-token
    gear boundary (mod 8), per-chunk integer signatures, corpus-wide
    duplicate accounting per source."""
    from chopin_spark.queries.textops import cdc_chunk_dedup
    from chopin_spark.tables import load

    P, B = 1_000_000_007, 1_000_003
    chunks = []
    for r in load(spark, SF_CORRECT, "documents") \
            .select("doc_id", "source", "text").collect():
        uh = [_cf(t) for t in r.text.split(" ")]
        cur = []
        doc_chunks = []
        for pos, u in enumerate(uh, 1):
            brk = 0
            if pos >= 3:
                roll = ((uh[pos - 3] * B + uh[pos - 2]) % P * B
                        + u) % P
                brk = 1 if roll % 8 == 0 else 0
            if brk and cur:
                doc_chunks.append(cur)
                cur = []
            cur.append(u)
        if cur:
            doc_chunks.append(cur)
        for ch in doc_chunks:
            s1 = sum(ch) % P
            swt = sum(u * rk % P for rk, u in enumerate(ch, 1)) % P
            chunks.append((r.source, (len(ch), s1, swt)))
    occ = collections.Counter(sig for _, sig in chunks)
    expect = collections.defaultdict(lambda: [0, 0, 0])
    for src, sig in chunks:
        st = expect[src]
        st[0] += 1
        if occ[sig] > 1:
            st[1] += 1
            st[2] += sig[0]
    got = {r.source: (r.n_chunks, r.n_dup_chunks, r.dup_token_mass)
           for r in cdc_chunk_dedup(spark, SF_CORRECT).collect()}
    assert got == {k: tuple(v) for k, v in expect.items()}
    assert any(v[1] > 0 for v in got.values())


def test_hll_epoch_overlap_replay(spark):
    """HLL set algebra between crawl epochs replayed: register MAX
    merge for the union, inclusion-exclusion intersection, exact
    audit."""
    from chopin_spark.queries.sketchq import (
        _EPOCH_MID, _OV_TOKS_SPARK, hll_epoch_overlap,
    )
    from chopin_spark.pages import epoch_sql
    from chopin_spark.tables import load

    load(spark, SF_CORRECT, "documents").createOrReplaceTempView("documents")
    toks = collections.defaultdict(set)
    for r in spark.sql(
        f"SELECT CASE WHEN {epoch_sql('doc_id')} < {_EPOCH_MID}"
        f" THEN 'a' ELSE 'b' END AS grp, tok FROM ({_OV_TOKS_SPARK})"
    ).collect():
        toks[r.grp].add(r.tok)

    def sketch(items):
        regs = [0] * 64
        for t in items:
            h2 = (t * 48271) % 2147483647
            rank = 31 if h2 == 0 else 31 - h2.bit_length()
            reg = t % 64
            regs[reg] = max(regs[reg], rank)
        return regs

    def est(regs):
        sum_inv = sum(2.0 ** -m for m in regs)
        n_zero = sum(1 for m in regs if m == 0)
        raw = 0.709 * 64 * 64 / sum_inv
        return (64 * math.log(64.0 / n_zero)
                if raw <= 2.5 * 64 and n_zero > 0 else raw)

    ra, rb = sketch(toks["a"]), sketch(toks["b"])
    ru = [max(a, b) for a, b in zip(ra, rb)]
    ea, eb, eu = est(ra), est(rb), est(ru)
    exact_i = len(toks["a"] & toks["b"])

    row = hll_epoch_overlap(spark, SF_CORRECT).collect()[0]
    assert (row.exact_a, row.exact_b, row.exact_intersect) \
        == (len(toks["a"]), len(toks["b"]), exact_i)
    assert _close(row.est_a, ea, 1e-4) and _close(row.est_b, eb, 1e-4)
    assert _close(row.est_union, eu, 1e-4)
    assert _close(row.est_intersect, ea + eb - eu, 1e-4)
    assert _close(row.intersect_rel_err,
                  (ea + eb - eu - exact_i) / exact_i, 1e-4)


def test_dedup_ngram_jaccard_replay(spark):
    """Uncapped exact 5-gram Jaccard pairs (threshold 0.5) replayed
    with brute-force set overlap — the MinHash family's exact
    baseline."""
    from chopin_spark.queries.textops import dedup_ngram_jaccard
    from chopin_spark.tables import load

    sh = {}
    for r in load(spark, SF_CORRECT, "documents") \
            .select("doc_id", "text").collect():
        w = r.text.split(" ")
        if len(w) >= 5:
            sh[r.doc_id] = {" ".join(w[i:i + 5])
                            for i in range(len(w) - 4)}
    expect = {}
    docs = sorted(sh)
    for ai, a in enumerate(docs):
        for b in docs[ai + 1:]:
            i = len(sh[a] & sh[b])
            if not i:
                continue
            jac = _round_half_away(i / (len(sh[a]) + len(sh[b]) - i))
            if jac >= 0.5:
                expect[(a, b)] = jac
    got = {(r.d1, r.d2): r.jaccard for r in
           dedup_ngram_jaccard(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect) and len(got) >= 2
    for k, jac in expect.items():
        assert _close(got[k], jac, 1e-4)


def test_hll_per_host_audit_replay(spark):
    """Per-host HLL sketches replayed with dicts — grouped register
    MAX, linear-counting branch, per-host exact audit."""
    from chopin_spark.pages import CCTLDS
    from chopin_spark.queries.sketchq import hll_per_host_audit
    from chopin_spark.tables import load

    per = collections.defaultdict(set)
    for r in load(spark, SF_CORRECT, "documents") \
            .select("doc_id").collect():
        d = r.doc_id
        host = f"h{(d * 40503) % 97}.example.com"
        url = (f"https://h{(d * 69069) % 99991}.example."
               f"{CCTLDS[(d * 2654435761) % len(CCTLDS)]}/p/{d}")
        per[host].add(url)
    expect = {}
    for host, urls in per.items():
        regs = [0] * 64
        for u in urls:
            h1, h2 = _cf(u, 31), _cf(u, 37)
            rank = 31 if h2 == 0 else 31 - h2.bit_length()
            regs[h1 % 64] = max(regs[h1 % 64], rank)
        sum_inv = sum(2.0 ** -m for m in regs)
        n_zero = sum(1 for m in regs if m == 0)
        raw = 0.709 * 64 * 64 / sum_inv
        est = (64 * math.log(64.0 / n_zero)
               if raw <= 2.5 * 64 and n_zero > 0 else raw)
        expect[host] = (len(urls), est)
    got = {r.host: (r.n_exact, r.est, r.rel_err) for r in
           hll_per_host_audit(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect) and len(got) == 97
    for host, (nx, est) in expect.items():
        assert got[host][0] == nx
        assert _close(got[host][1], est, 1e-4)
        assert _close(got[host][2], (est - nx) / nx, 1e-4)


def _net_replay_best(spark):
    """Shared helper: collect the planarized road graph and run the
    hop-bounded multi-source Bellman-Ford in plain Python."""
    from chopin_spark.queries.networkq import (
        _FOLD, _HOPS, _K, _SPARK_SRC, _mq, _spark_net_views,
    )

    _spark_net_views(spark, SF_CORRECT)
    edges = [(r.u, r.v, r.w) for r in spark.sql(
        f"WITH {_SPARK_SRC}, {_FOLD} SELECT u, v, w FROM edges").collect()]
    seeds = {r.node for r in spark.sql(
        f"WITH {_SPARK_SRC} SELECT DISTINCT "
        f"{_mq('ix')} * {_K} + {_mq('iy')} AS node FROM x").collect()}
    adj = collections.defaultdict(list)
    for u, v, w in edges:
        adj[u].append((v, w))
        adj[v].append((u, w))
    best = {s: 0 for s in seeds}
    frontier = dict(best)
    for _ in range(_HOPS):
        nxt = {}
        for v, d in frontier.items():
            for (w_, c) in adj[v]:
                nd = d + c
                if nd < best.get(w_, float("inf")) \
                        and nd < nxt.get(w_, float("inf")):
                    nxt[w_] = nd
        frontier = {v: d for v, d in nxt.items()
                    if d < best.get(v, float("inf"))}
        best.update(frontier)
    return best, _K


def test_road_network_dist_to_crossing_replay(spark):
    """Junction-distance SSSP replayed with an explicit 6-round
    Bellman-Ford over the collected planarized graph."""
    from chopin_spark.queries.networkq import road_network_dist_to_crossing

    best, K = _net_replay_best(spark)
    got = {(r.node_x_mm, r.node_y_mm): r.net_dist_mm for r in
           road_network_dist_to_crossing(spark, SF_CORRECT).collect()}
    expect = {((n - n % K) // K, n % K): d for n, d in best.items()}
    assert got == expect and len(got) > 100
    assert any(d > 0 for d in got.values())


def test_road_isochrone_bands_replay(spark):
    """10 km isochrone band census over the same replayed SSSP."""
    from chopin_spark.queries.networkq import _BAND_MM, road_isochrone_bands

    best, _ = _net_replay_best(spark)
    expect = collections.Counter(
        (d - d % _BAND_MM) // _BAND_MM for d in best.values())
    got = {r.band_10km: r.n_nodes for r in
           road_isochrone_bands(spark, SF_CORRECT).collect()}
    assert got == dict(expect) and len(got) >= 2


def _d8_replay():
    """Shared D8 downstream map for the 32x24 synthetic DEM: first-max
    weighted-drop rule, None at pits — re-derived from the published
    neighbor table, not the engine's encoded argmax."""
    from chopin_spark.queries.costdistq import H, W

    D8 = ((1, 0, 7), (1, 1, 5), (0, 1, 7), (-1, 1, 5),
          (-1, 0, 7), (-1, -1, 5), (0, -1, 7), (1, -1, 5))

    def z(x, y):
        return ((x + y * W) * 389) % (W * H)

    flow = {}
    for x in range(W):
        for y in range(H):
            best = None
            for i, (dx, dy, wt) in enumerate(D8):
                nx_, ny_ = x + dx, y + dy
                if not (0 <= nx_ < W and 0 <= ny_ < H):
                    continue
                drop = z(x, y) - z(nx_, ny_)
                if drop > 0 and (best is None or drop * wt > best[0]):
                    best = (drop * wt, nx_, ny_)
            flow[(x, y)] = (best[1], best[2]) if best else None
    return flow, z, W, H


def test_basin_zonal_stats_replay(spark):
    """Watershed basins by walking D8 chains to their pits, then the
    per-basin area/relief/longest-path rollup."""
    from chopin_spark.queries.costdistq import basin_zonal_stats

    flow, z, W, H = _d8_replay()
    agg = {}
    for x in range(W):
        for y in range(H):
            cx, cy, h = x, y, 0
            while flow[(cx, cy)] is not None:
                cx, cy = flow[(cx, cy)]
                h += 1
            bid = cx + cy * W
            st = agg.setdefault(bid, [0, 0, None, None, 0])
            st[0] += 1
            st[1] += z(x, y)
            zv = z(x, y)
            st[2] = zv if st[2] is None else min(st[2], zv)
            st[3] = zv if st[3] is None else max(st[3], zv)
            st[4] = max(st[4], h)
    got = {r.basin_id: (r.n_cells, r.sum_z, r.relief, r.longest_path)
           for r in basin_zonal_stats(spark, SF_CORRECT).collect()}
    assert got == {b: (n, s, mx - mn, lp)
                   for b, (n, s, mn, mx, lp) in agg.items()}
    assert len(got) >= 5


def test_raster_twi_replay(spark):
    """Topographic wetness index replayed: walk-through-cell flow
    accumulation plus the interior gradient formula."""
    from chopin_spark.queries.costdistq import raster_twi

    flow, z, W, H = _d8_replay()
    acc = collections.Counter()
    for x in range(W):
        for y in range(H):
            cx, cy = x, y
            acc[(cx, cy)] += 1
            while flow[(cx, cy)] is not None:
                cx, cy = flow[(cx, cy)]
                acc[(cx, cy)] += 1
    expect = {}
    for x in range(1, W - 1):
        for y in range(1, H - 1):
            gx = z(x + 1, y) - z(x - 1, y)
            gy = z(x, y + 1) - z(x, y - 1)
            expect[(x, y)] = (
                acc[(x, y)],
                math.log(acc[(x, y)]
                         / math.sqrt(gx * gx + gy * gy + 1)))
    got = {(r.x, r.y): (r.acc, r.twi) for r in
           raster_twi(spark, SF_CORRECT).collect()}
    assert set(got) == set(expect)
    for k, (a, twi) in expect.items():
        assert got[k][0] == a
        assert _close(got[k][1], twi, 1e-4)


def test_road_route_farthest_trace_replay(spark):
    """The worst-served route replayed: strict-descent parent relation
    by encoded argmin, recursive follow from the (d, node)-max
    target."""
    from chopin_spark.queries.networkq import (
        _FOLD, _K, _SPARK_SRC, road_route_farthest_trace,
    )

    best, K = _net_replay_best(spark)
    edges = [(r.u, r.v, r.w) for r in spark.sql(
        f"WITH {_SPARK_SRC}, {_FOLD} SELECT u, v, w FROM edges").collect()]
    e2 = edges + [(v, u, w) for (u, v, w) in edges]
    par = {}
    inc = collections.defaultdict(list)
    for u, v, w in e2:
        if u in best:
            inc[v].append((best[u] + w, u))
    for v, cands in inc.items():
        if v not in best:
            continue
        ud_w, u = min(cands)
        if best[u] < best[v]:
            par[v] = u
    tgt = max(best, key=lambda n: (best[n], n))
    path, node = [(0, tgt)], tgt
    while node in par:
        node = par[node]
        path.append((len(path), node))
    expect = {(s, (n - n % K) // K, n % K): best[n] for s, n in path}
    got = {(r.step, r.node_x_mm, r.node_y_mm): r.dist_mm for r in
           road_route_farthest_trace(spark, SF_CORRECT).collect()}
    assert got == expect and len(got) >= 3
    ds = [best[n] for _, n in path]
    assert all(a > b for a, b in zip(ds, ds[1:]))


def test_ann_multiprobe_lsh_replay(spark):
    """Multiprobe hyperplane LSH replayed: sin-sign plane weights,
    16-bit signatures, Hamming-1/2 probe flips, candidate cosine
    ranking with the exact-top-10 audit."""
    from chopin_spark.queries.simsearch import (
        _DIM, _MP_PLANES, ann_multiprobe_lsh,
    )
    from chopin_spark.tables import load

    raw = {r.vec_id: list(r.embedding) for r in
           load(spark, SF_CORRECT, "embeddings")
           .select("vec_id", "embedding").collect()}
    planes = [[1.0 if math.sin(float(i) + float(p * _DIM)) >= 0 else -1.0
               for i in range(_DIM)] for p in range(_MP_PLANES)]

    def fold_dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + float(x) * float(y)
        return acc

    sig = {}
    for v, e in raw.items():
        s = 0
        for p in range(_MP_PLANES):
            if fold_dot(e, planes[p]) >= 0:
                s += 1 << p
        sig[v] = s
    qs = sig[0]
    probes = {qs}
    for b1 in range(_MP_PLANES):
        probes.add(qs ^ (1 << b1))
        for b2 in range(b1 + 1, _MP_PLANES):
            probes.add(qs ^ (1 << b1) ^ (1 << b2))
    cand = {v for v, s in sig.items() if v != 0 and s in probes}
    q = raw[0]
    cos = {v: _round_half_away(
        fold_dot(raw[v], q) / (math.sqrt(fold_dot(raw[v], raw[v]))
                               * math.sqrt(fold_dot(q, q))))
        for v in raw if v != 0}
    exact10 = {v for v, _ in sorted(
        cos.items(), key=lambda kv: (-kv[1], kv[0]))[:10]}
    ranked = sorted(((cos[v], v) for v in cand),
                    key=lambda t: (-t[0], t[1]))[:10]
    expect = [(rk + 1, v, c, int(v in exact10))
              for rk, (c, v) in enumerate(ranked)]
    got = [(r.rank, r.vec_id, r.cos_sim, r.in_exact_top10) for r in
           ann_multiprobe_lsh(spark, SF_CORRECT).orderBy("rank").collect()]
    assert [(g[0], g[1], g[3]) for g in got] \
        == [(e[0], e[1], e[3]) for e in expect]
    for g, e in zip(got, expect):
        assert _close(g[2], e[2], 1e-4)
    assert len(got) >= 5 and any(f for *_, f in got)
