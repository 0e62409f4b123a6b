"""Round-5r operators: Hilbert clustering keys, AMS F2 sketch, and
Markov removal-effect attribution."""

import hashlib
from collections import Counter, defaultdict

import pytest


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def _r6(x):
    return round(x + 1e-9, 6)


def _xy2d(n, x, y):
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def _d2xy(n, d):
    x = y = 0
    s = 1
    t = d
    while s < n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


def test_hilbert_keys_match_python(spark, sf):
    from datafusion_functions_extra_spark.suite import _HILBERT_N, QUERIES

    got = {
        r.event_id: r.hkey
        for r in QUERIES["events_hilbert_keys"](spark, sf).collect()
    }
    pdf = (
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr(
            "event_id",
            f"cast(user_id & {_HILBERT_N - 1} as long) as xb",
            f"cast((unix_micros(cast(ts as timestamp)) div 3600000000)"
            f" & {_HILBERT_N - 1} as long) as yb",
        )
        .toPandas()
    )
    assert len(got) == len(pdf)
    for eid, xb, yb in zip(pdf["event_id"], pdf["xb"], pdf["yb"]):
        want = _xy2d(_HILBERT_N, int(xb), int(yb))
        assert got[eid] == want, (eid, xb, yb)
        # round-trip: the key inverts to the original cell
        assert _d2xy(_HILBERT_N, want) == (int(xb), int(yb))


def test_hilbert_locality_contiguous_cells():
    from datafusion_functions_extra_spark.suite import _HILBERT_N

    # defining property Morton lacks: consecutive indices are always
    # 4-adjacent grid neighbors
    prev = _d2xy(_HILBERT_N, 0)
    for d in range(1, _HILBERT_N * _HILBERT_N):
        cur = _d2xy(_HILBERT_N, d)
        assert abs(cur[0] - prev[0]) + abs(cur[1] - prev[1]) == 1
        prev = cur


def test_f2_sketch_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import _AMS_LANES, QUERIES

    row = QUERIES["events_f2_sketch"](spark, sf).collect()[0]

    pdf = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("user_id")
        .toPandas()
    )
    c = Counter(int(u) for u in pdf["user_id"])
    f2_exact = sum(v * v for v in c.values())
    assert row.f2_exact == f2_exact

    ests = []
    for lane in range(1, _AMS_LANES + 1):
        sl = 0
        for u, cnt in c.items():
            h = hashlib.md5(f"{lane}:{u}".encode()).hexdigest()[0]
            sign = 1 if h in "02468ace" else -1
            sl += sign * cnt
        ests.append(sl * sl)
    med = sorted(ests)[(_AMS_LANES + 1) // 2 - 1]
    assert row.f2_est == med
    assert row.rel_err == pytest.approx(
        _r6(abs(med - f2_exact) / f2_exact), abs=1e-9
    )


def test_markov_attribution_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import (
        _MATTR_CONV,
        _MATTR_ROUNDS,
        QUERIES,
    )

    got = {
        r.removed_type: r
        for r in QUERIES["events_markov_attribution"](spark, sf).collect()
    }

    pdf = (
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr("user_id", "event_type", "ts", "event_id")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    tr = Counter()
    for _, g in pdf.groupby("user_id"):
        seq = list(g["event_type"])
        cut = (
            seq.index(_MATTR_CONV) + 1 if _MATTR_CONV in seq else len(seq)
        )
        seq = seq[:cut]
        tr[("__start", seq[0])] += 1
        for a, b in zip(seq, seq[1:]):
            tr[(a, b)] += 1
        if seq[-1] != _MATTR_CONV:
            tr[(seq[-1], "__end")] += 1
    rowm = Counter()
    for (a, _b), cnt in tr.items():
        rowm[a] += cnt
    ts_ = sorted({a for (a, _b) in tr})
    n = len(ts_)
    q0 = [
        [_r6(tr.get((a, b), 0) / rowm[a]) for b in ts_] for a in ts_
    ]
    r0 = [_r6(tr.get((a, _MATTR_CONV), 0) / rowm[a]) for a in ts_]

    def p_conv(removed):
        q = [
            [
                0.0
                if (ts_[i] == removed or ts_[j] == removed)
                else q0[i][j]
                for j in range(n)
            ]
            for i in range(n)
        ]
        r = [0.0 if ts_[i] == removed else r0[i] for i in range(n)]
        hv = list(r)
        for _ in range(_MATTR_ROUNDS):
            hv = [
                _r6(r[i] + sum(q[i][j] * hv[j] for j in range(n)))
                for i in range(n)
            ]
        return hv[ts_.index("__start")]

    p_full = p_conv("__full")
    removed = [t for t in ts_ if t != "__start"]
    res = {
        t: max(0.0, _r6(1.0 - p_conv(t) / p_full)) if p_full > 0 else 0.0
        for t in removed
    }
    sre = sum(res.values())

    assert set(got) == set(removed)
    for t in removed:
        assert got[t].p_full == pytest.approx(p_full, abs=1e-9)
        assert got[t].p_conv == pytest.approx(p_conv(t), abs=1e-9)
        assert got[t].removal_effect == pytest.approx(res[t], abs=1e-9)
        if sre > 0:
            assert got[t].credit_share == pytest.approx(
                _r6(res[t] / sre), abs=1e-9
            )
    # shares form a distribution over the removed channels, and the
    # conversion state itself is never a removal variant (it is
    # absorbing, not transient)
    if sre > 0:
        assert sum(r.credit_share for r in got.values()) == pytest.approx(
            1.0, abs=1e-5
        )
    assert _MATTR_CONV not in got
