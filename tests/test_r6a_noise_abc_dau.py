"""Round-6a: kNN label-noise screen, ABC/XYZ classification, DAU/MAU
stickiness — Python replicas on sf0.001."""

import math
from collections import Counter, defaultdict

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def test_label_noise_screen_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        r.vec_id: (r.true_label, r.majority_label, r.n_majority, r.n_agree)
        for r in QUERIES["embedding_label_noise_screen"](spark, sf).collect()
    }

    emb = pd.read_parquet(f"{sf}/embeddings.parquet")
    uv, lbl = {}, {}
    for r in emb.itertuples(index=False):
        v = [float(x) for x in r.embedding]
        n = math.sqrt(sum(x * x for x in v))
        uv[int(r.vec_id)] = [x / n for x in v]
        lbl[int(r.vec_id)] = int(r.label)
    ids = sorted(uv)
    want = {}
    for a in ids:
        top5 = sorted(
            (-round(sum(x * y for x, y in zip(uv[a], uv[b])), 6), b)
            for b in ids
            if b != a
        )[:5]
        labels = [lbl[b] for _, b in top5]
        cnt = Counter(labels)
        maj, n_maj = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        n_agree = cnt.get(lbl[a], 0)
        if n_agree <= 1 and maj != lbl[a]:
            want[a] = (lbl[a], maj, n_maj, n_agree)
    assert got == want


def test_brand_abc_xyz_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        r.brand: (r.abc_class, r.xyz_class, r.revenue, r.n_lines, r.demand_cv)
        for r in QUERIES["brand_abc_xyz"](spark, sf).collect()
    }

    li = pd.read_parquet(f"{sf}/lineitem.parquet")
    pt = pd.read_parquet(f"{sf}/part.parquet")
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    j = li.merge(pt, left_on="l_partkey", right_on="p_partkey").merge(
        orders, left_on="l_orderkey", right_on="o_orderkey"
    )
    rev, nl = defaultdict(int), defaultdict(int)
    mq = defaultdict(lambda: defaultdict(int))
    for r in j.itertuples(index=False):
        u = int(round(r.l_extendedprice * 100)) * (
            100 - int(round(r.l_discount * 100))
        )
        rev[r.p_brand] += u
        nl[r.p_brand] += 1
        m = (r.o_orderdate.year, r.o_orderdate.month)
        mq[r.p_brand][m] += int(round(r.l_quantity))
    t = sum(rev.values())
    order = sorted(rev, key=lambda b: (-rev[b], b))
    want = {}
    c = 0
    for b in order:
        c += rev[b]
        abc = "A" if c * 5 <= t * 4 else ("B" if c * 20 <= t * 19 else "C")
        qs = list(mq[b].values())
        n, s, s2 = len(qs), sum(qs), sum(q * q for q in qs)
        xyz = (
            "X"
            if n * s2 * 4 <= 5 * s * s
            else ("Y" if n * s2 <= 2 * s * s else "Z")
        )
        cv = round(math.sqrt(n * s2 - s * s) / s + 1e-9, 6)
        want[b] = (abc, xyz, round(rev[b] / 1e4, 2), nl[b], cv)
    assert got == want
    # the classification must use every class at least once on A side
    assert {v[0] for v in want.values()} >= {"A", "C"}


def test_dau_mau_stickiness_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        r.day: (r.dau, r.mau, r.stickiness)
        for r in QUERIES["events_dau_mau_stickiness"](spark, sf).collect()
    }
    e = pd.read_parquet(f"{sf}/events.parquet")
    du = {
        (ts.floor("D").date(), int(u))
        for ts, u in zip(e["ts"], e["user_id"])
    }
    days = sorted({d for d, _ in du})
    want = {}
    for d in days:
        dau = sum(1 for dd, _ in du if dd == d)
        mau = len(
            {u for dd, u in du if 0 <= (d - dd).days <= 27}
        )
        want[str(d)] = (dau, mau, round(dau / mau + 1e-9, 6))
    assert got == want
    # stickiness is a share in (0, 1]
    assert all(0 < s <= 1 for _, _, s in want.values())
