"""asof_join edge-semantics tests."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from chopin_spark.temporal import asof_join


def _t(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


def test_asof_semantics(spark):
    facts = spark.createDataFrame(
        pd.DataFrame(
            {
                "fid": [1, 2, 3, 4],
                "k": ["a", "a", "a", "b"],
                "ts": [_t(5), _t(10), _t(2), _t(5)],
            }
        )
    )
    state = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": ["a", "a", "a"],
                "ts": [_t(3), _t(10), _t(20)],
                "sid": [100, 200, 300],
                "v": [1.5, None, 9.9],
            }
        )
    )
    got = {
        r["fid"]: (r["st_sid"], r["st_v"])
        for r in asof_join(
            facts, state, keys=["k"], ts_col="ts",
            state_cols=["sid", "v"], tie_col="sid", prefix="st_",
        ).collect()
    }
    assert got[1] == (100, 1.5)        # latest state at ts<=5 is ts=3
    # same-instant state IS visible (<=), and its NULL v is carried
    # faithfully, not skipped back to the older 1.5
    assert got[2] == (200, None)
    assert got[3] == (None, None)      # no prior state
    assert got[4] == (None, None)      # key with no state rows at all


def test_asof_equal_ts_tie_break(spark):
    facts = spark.createDataFrame(
        pd.DataFrame({"fid": [1], "k": ["a"], "ts": [_t(5)]})
    )
    state = spark.createDataFrame(
        pd.DataFrame(
            {"k": ["a", "a"], "ts": [_t(5), _t(5)], "sid": [7, 9], "v": [1.0, 2.0]}
        )
    )
    [row] = asof_join(
        facts, state, keys=["k"], ts_col="ts",
        state_cols=["sid", "v"], tie_col="sid",
    ).collect()
    assert (row["asof_sid"], row["asof_v"]) == (9, 2.0)  # max tie wins


# --- property check vs a pandas brute force ---------------------------------

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@given(seed=st.integers(0, 10_000))
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_asof_matches_brute_force(spark, seed):
    rng = np.random.default_rng(seed)
    nf, ns, nkeys = 60, 40, 5
    facts = pd.DataFrame(
        {
            "fid": np.arange(nf),
            "k": rng.integers(0, nkeys, nf),
            "ts": rng.integers(0, 1000, nf),
        }
    )
    state = pd.DataFrame(
        {
            "k": rng.integers(0, nkeys, ns),
            "ts": rng.integers(0, 1000, ns),
            "sid": np.arange(100, 100 + ns),
            "v": rng.normal(size=ns).round(6),
        }
    )
    got = {
        r["fid"]: (r["asof_sid"], r["asof_v"])
        for r in asof_join(
            spark.createDataFrame(facts),
            spark.createDataFrame(state),
            keys=["k"], ts_col="ts",
            state_cols=["sid", "v"], tie_col="sid",
        ).collect()
    }
    for f in facts.itertuples(index=False):
        cand = state[(state.k == f.k) & (state.ts <= f.ts)]
        if cand.empty:
            assert got[f.fid] == (None, None)
        else:
            best = cand.sort_values(["ts", "sid"]).iloc[-1]
            assert got[f.fid] == (int(best.sid), float(best.v))
