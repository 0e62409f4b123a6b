"""Round-6j: two-state burst Viterbi — Python replica + planted-burst
behavioral pins (hysteresis, penalty monotonicity)."""

import math
from collections import Counter, defaultdict

import pandas as pd
import pytest


def _viterbi(arr, e0, e1, l0, l1, g):
    c0, c1 = 0, g
    p0, p1 = [], []
    for x in arr:
        n0 = min(c0, c1) + (e0 - x * l0)
        n1 = min(c1, c0 + g) + (e1 - x * l1)
        np0 = (p0 if c0 <= c1 else p1) + [0]
        np1 = (p1 if c1 <= c0 + g else p0) + [1]
        c0, c1, p0, p1 = n0, n1, np0, np1
    return (p0, c0) if c0 <= c1 else (p1, c1)


def _consts(n_ev, n_days):
    e0 = int(round(n_ev * 1e6 / n_days + 1e-3))
    e1 = int(round(3 * n_ev * 1e6 / n_days + 1e-3))
    l0 = int(
        round(
            math.log(n_ev / n_days) * 1e6
            + (1e-3 if n_ev >= n_days else -1e-3)
        )
    )
    l1 = int(
        round(
            math.log(3.0 * n_ev / n_days) * 1e6
            + (1e-3 if 3 * n_ev >= n_days else -1e-3)
        )
    )
    g = int(round(math.log(n_days) * 1e6 + 1e-3))
    return e0, e1, l0, l1, g


def test_burst_matches_python(spark):
    sf = "/root/testdata/sf0.001"
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        r.event_type: (
            r.n_days,
            r.n_events,
            r.n_burst_days,
            r.n_episodes,
            r.viterbi_cost_micro,
        )
        for r in QUERIES["events_burst_intervals"](spark, sf).collect()
    }

    e = pd.read_parquet(f"{sf}/events.parquet")
    # Timestamp.value is always nanoseconds regardless of the parquet unit
    days = pd.Series(
        [int(pd.Timestamp(t).value) // (86400 * 10**9) for t in e["ts"]]
    )
    dmin, dmax = int(days.min()), int(days.max())
    t = dmax - dmin + 1
    byt = defaultdict(Counter)
    for ty, d in zip(e["event_type"], days):
        byt[ty][int(d) - dmin] += 1
    want = {}
    for ty, cnt in byt.items():
        arr = [cnt.get(i, 0) for i in range(t)]
        n_ev = sum(arr)
        st, cost = _viterbi(arr, *_consts(n_ev, t))
        eps = st[0] + sum(
            1 for a, b in zip(st, st[1:]) if a == 0 and b == 1
        )
        want[ty] = (t, n_ev, sum(st), eps, cost)
    assert got == want


def test_burst_hysteresis_and_penalty():
    # a planted ~20x burst with ONE mild dip inside must stay one
    # episode: the stay-in-burst surcharge (e1-e0) - c_dip*(l1-l0)
    # must undercut the ln(T) re-entry penalty, which it does at base
    # rate ~2.8 and dip count 3
    arr = [1] * 20 + [20, 22, 3, 21, 19] + [1] * 20
    n_ev, t = sum(arr), len(arr)
    st, _ = _viterbi(arr, *_consts(n_ev, t))
    assert sum(st) >= 4
    eps = st[0] + sum(1 for a, b in zip(st, st[1:]) if a == 0 and b == 1)
    assert eps == 1, "the quiet day inside the burst must not split it"
    # with a huge entry penalty, no burst is ever worth entering
    e0, e1, l0, l1, _ = _consts(n_ev, t)
    st2, _ = _viterbi(arr, e0, e1, l0, l1, 10**15)
    assert sum(st2) == 0
