"""Round-5y: leave-last-out recommender eval + Brown-Forsythe —
Python replicas on sf0.001."""

import math
from collections import defaultdict

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def test_basket_rec_hitrate_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    row = QUERIES["basket_rec_hitrate"](spark, sf).collect()[0]

    orders = pd.read_parquet(f"{sf}/orders.parquet")
    li = pd.read_parquet(f"{sf}/lineitem.parquet")
    part = pd.read_parquet(f"{sf}/part.parquet")
    j = li.merge(orders, left_on="l_orderkey", right_on="o_orderkey").merge(
        part, left_on="l_partkey", right_on="p_partkey"
    )
    last_seen = {}
    for r in j.itertuples(index=False):
        k = (int(r.o_custkey), r.p_brand)
        v = (r.o_orderdate, int(r.o_orderkey))
        if k not in last_seen or v > last_seen[k]:
            last_seen[k] = v
    by_cust = defaultdict(list)
    for (c, b), v in last_seen.items():
        by_cust[c].append((v[0], v[1], b))
    held, kept = {}, defaultdict(set)
    for c, items in by_cust.items():
        h = max(items)
        held[c] = h[2]
        train = {b for _, _, b in items if b != h[2]}
        if train and len(train) <= 64:
            kept[c] = train
    ni = defaultdict(int)
    for c, bs in kept.items():
        for b in bs:
            ni[b] += 1
    co = defaultdict(int)
    for c, bs in kept.items():
        for p in bs:
            for q in bs:
                if p != q:
                    co[(p, q)] += 1
    sim = defaultdict(list)
    for (p, q), npq in co.items():
        if npq < 2:
            continue
        cm = int(round(npq * 1e6 / math.sqrt(ni[p] * ni[q]) + 1e-3))
        sim[p].append((-cm, q))
    top = {
        p: [(q, -negcm) for negcm, q in sorted(v)[:10]]
        for p, v in sim.items()
    }
    n_eval = n_hits = mrr = 0
    for c, bs in kept.items():
        n_eval += 1
        scores = defaultdict(int)
        for b in bs:
            for q, cm in top.get(b, []):
                if q not in bs:
                    scores[q] += cm
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for rk, (cand, _) in enumerate(ranked, 1):
            if cand == held[c]:
                n_hits += 1
                mrr += 1000000 // rk
                break
    assert row.n_eval == n_eval
    assert row.n_hits == n_hits
    assert row.mrr3_micro_sum == mrr
    assert row.hit_rate == round(n_hits / n_eval + 1e-9, 6)
    assert n_hits > 0, "fixture should produce hits"


def test_brown_forsythe_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    row = QUERIES["event_value_brown_forsythe"](spark, sf).collect()[0]

    e = pd.read_parquet(f"{sf}/events.parquet")
    cents = defaultdict(list)
    for r in e.itertuples(index=False):
        cents[r.event_type].append(int(round(r.value * 100)))
    z = {}
    for t, vs in cents.items():
        vs = sorted(vs)
        n = len(vs)
        m2 = vs[n // 2] * 2 if n % 2 else vs[n // 2 - 1] + vs[n // 2]
        z[t] = [abs(2 * v - m2) for v in vs]
    k = len(z)
    n = sum(len(v) for v in z.values())
    s1 = sum(sum(v) for v in z.values())
    s2 = sum(x * x for v in z.values() for x in v)
    fit = sum(sum(v) ** 2 / len(v) for v in z.values())
    ssb = fit - s1 * s1 / n
    ssw = s2 - fit
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert row.n_groups == k and row.n_rows == n
    assert row.f_stat == pytest.approx(f, rel=1e-6)
    assert row.ss_between == pytest.approx(ssb / 40000.0, rel=1e-6)
    assert row.ss_within == pytest.approx(ssw / 40000.0, rel=1e-6)
    # BF on identical groups would be ~0; real event types differ in
    # spread, so F must be positive
    assert row.f_stat > 0
