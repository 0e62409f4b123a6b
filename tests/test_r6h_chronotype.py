"""Round-6h: per-user circadian chronotype — Python replica, plus the
circular-statistics sanity that a planted single-hour user maxes R."""

import math
from collections import Counter, defaultdict

import pandas as pd
import pytest


def test_chronotype_matches_python(spark):
    sf = "/root/testdata/sf0.001"
    from datafusion_functions_extra_spark.suite import QUERIES, _twiddle

    got = {
        r.user_id: (r.n_events, r.peak_hour, r.resultant2_micro, r.concentration)
        for r in QUERIES["events_user_chronotype"](spark, sf).collect()
    }

    e = pd.read_parquet(f"{sf}/events.parquet")
    byu = defaultdict(Counter)
    for ts, u in zip(e["ts"], e["user_id"]):
        byu[int(u)][ts.hour] += 1
    ct, st = _twiddle(24, "cos"), _twiddle(24, "sin")
    want = {}
    for u, hours in byu.items():
        n = sum(hours.values())
        sc = sum(c * ct[h] for h, c in hours.items())
        ss = sum(c * st[h] for h, c in hours.items())
        peak = min(hours, key=lambda h: (-hours[h], h))
        r2 = sc * sc + ss * ss
        want[u] = (
            n,
            peak,
            r2,
            round(math.sqrt(r2) / (1000.0 * n) + 1e-9, 6),
        )
    assert set(got) == set(want)
    for u in want:
        assert got[u][:3] == want[u][:3]
        assert got[u][3] == pytest.approx(want[u][3], abs=2e-6)
    # concentration is the circular mean resultant length: in [0, 1]
    # (up to the milli-twiddle quantization)
    assert all(0 <= v[3] <= 1.001 for v in want.values())


def test_chronotype_extremes():
    from datafusion_functions_extra_spark.suite import _twiddle

    ct, st = _twiddle(24, "cos"), _twiddle(24, "sin")
    # all activity in one hour -> R ~ 1
    sc, ss = 100 * ct[9], 100 * st[9]
    r = math.sqrt(sc * sc + ss * ss) / (1000.0 * 100)
    assert r > 0.999
    # perfectly uniform activity -> R ~ 0
    sc = sum(ct)
    ss = sum(st)
    r0 = math.sqrt(sc * sc + ss * ss) / (1000.0 * 24)
    assert r0 < 0.01
