"""Round-5v operators: integer-twiddle periodogram, kNN-graph link
prediction, WoE/IV feature screen — Python replicas on sf0.001."""

import math
from collections import Counter, defaultdict

import pytest


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def test_periodogram_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import (
        QUERIES,
        _PGRAM_PERIODS,
        _twiddle,
    )

    got = {
        r.period: (r.s_c, r.s_s, r.power_int, r.dominant)
        for r in QUERIES["events_periodogram"](spark, sf).collect()
    }

    import pandas as pd

    e = pd.read_parquet(f"{sf}/events.parquet")
    days = (
        e["ts"].dt.floor("D").astype("datetime64[us]")
        - pd.Timestamp("1970-01-01")
    ).dt.days
    daily = Counter(days)
    want = {}
    for p in _PGRAM_PERIODS:
        ct, st = _twiddle(p, "cos"), _twiddle(p, "sin")
        sc = sum(c * ct[t % p] for t, c in daily.items())
        ss = sum(c * st[t % p] for t, c in daily.items())
        want[p] = (sc, ss, sc * sc + ss * ss)
    mx = max(v[2] for v in want.values())
    want = {p: (sc, ss, pw, pw == mx) for p, (sc, ss, pw) in want.items()}
    assert got == want


def test_periodogram_detects_planted_cycle(spark):
    # a pure 7-day square wave must make period 7 dominant
    import pandas as pd

    from datafusion_functions_extra_spark.suite import (
        _PGRAM_PERIODS,
        _twiddle,
    )

    daily = {t: (500 if t % 7 == 0 else 10) for t in range(70)}
    powers = {}
    for p in _PGRAM_PERIODS:
        ct, st = _twiddle(p, "cos"), _twiddle(p, "sin")
        sc = sum(c * ct[t % p] for t, c in daily.items())
        ss = sum(c * st[t % p] for t, c in daily.items())
        powers[p] = sc * sc + ss * ss
    assert max(powers, key=powers.get) == 7


def _unit_vecs(sf):
    import pandas as pd

    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    out = {}
    for r in emb.itertuples(index=False):
        v = [float(x) for x in r.embedding]
        n = math.sqrt(sum(x * x for x in v))
        out[int(r.vec_id)] = [x / n for x in v]
    return out


def test_knn_link_prediction_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        (r.id_a, r.id_b): (r.common_neighbors, r.aa_micro, r.jaccard)
        for r in QUERIES["embedding_knn_link_prediction"](spark, sf).collect()
    }

    uv = _unit_vecs(sf)
    ids = sorted(uv)
    top3 = {}
    for a in ids:
        scored = sorted(
            (
                (-round(sum(x * y for x, y in zip(uv[a], uv[b])), 6), b)
                for b in ids
                if b != a
            )
        )[:3]
        top3[a] = [b for _, b in scored]
    edges = {
        (min(a, b), max(a, b)) for a, ns in top3.items() for b in ns
    }
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    want = {}
    for v, ns in adj.items():
        ns = sorted(ns)
        for i, a in enumerate(ns):
            for b in ns[i + 1 :]:
                if (a, b) in edges:
                    continue
                want.setdefault((a, b), []).append(v)
    out = {}
    for (a, b), ctrs in want.items():
        cn = len(ctrs)
        if cn < 2:
            continue
        aa = sum(
            int(round(1e6 / math.log(len(adj[c])) + 1e-3)) for c in ctrs
        )
        jac = round(
            cn / (len(adj[a]) + len(adj[b]) - cn) + 1e-9, 6
        )
        out[(a, b)] = (cn, aa, jac)
    assert got == out
    assert out, "sf0.001 kNN graph should produce predictions"


def test_segment_woe_iv_matches_python(spark, sf):
    import pandas as pd

    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        r.segment: (r.n_with_orders, r.n_without, r.woe_micro, r.iv_contrib_scaled)
        for r in QUERIES["segment_woe_iv"](spark, sf).collect()
    }

    cust = pd.read_parquet(f"{sf}/customer.parquet")
    orders = set(pd.read_parquet(f"{sf}/orders.parquet")["o_custkey"])
    seg = defaultdict(lambda: [0, 0])
    for r in cust.itertuples(index=False):
        seg[r.c_mktsegment][0 if r.c_custkey in orders else 1] += 1
    gg = sum(v[0] for v in seg.values())
    bb = sum(v[1] for v in seg.values())
    want = {}
    for s, (g, b) in seg.items():
        num = (2 * g + 1) * (2.0 * bb + 2)
        den = (2.0 * gg + 2) * (2 * b + 1)
        woe = int(round(math.log(num / den) * 1e6 + (1e-3 if num >= den else -1e-3)))
        delta = (2 * g + 1) * (2 * bb + 2) - (2 * b + 1) * (2 * gg + 2)
        want[s] = (g, b, woe, delta * woe)
    assert got == want
    # the IV decomposition respects sign: a segment's contribution is
    # positive iff its share-delta and WoE agree in sign (they always do
    # up to smoothing: both derive from the same odds ratio)
    for g, b, woe, iv in want.values():
        assert iv >= 0 or abs(iv) < abs(woe)  # smoothing-boundary slack
