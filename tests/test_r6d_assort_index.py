"""Round-6d: degree assortativity + price indices — Python replicas."""

import math
from collections import defaultdict

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def test_assortativity_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    row = QUERIES["embedding_graph_assortativity"](spark, sf).collect()[0]

    from tests.test_r5z_lpa_rocchio import _knn3_edges_py

    ids, edges = _knn3_edges_py(sf)
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    deg = {v: len(us) for v, us in adj.items()}
    xs, ys = [], []
    for a, b in edges:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    m = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    r = (m * sxy - sx * sy) / (
        math.sqrt(m * sxx - sx * sx) * math.sqrt(m * syy - sy * sy)
    )
    assert row.n_edges == len(edges)
    assert row.assortativity == pytest.approx(r, abs=2e-6)
    assert -1 <= row.assortativity <= 1


def test_price_indices_match_python(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        r.month: (r.n_brands, r.laspeyres, r.paasche, r.fisher)
        for r in QUERIES["brand_price_indices"](spark, sf).collect()
    }

    li = pd.read_parquet(f"{sf}/lineitem.parquet")
    pt = pd.read_parquet(f"{sf}/part.parquet")
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    j = li.merge(pt, left_on="l_partkey", right_on="p_partkey").merge(
        orders, left_on="l_orderkey", right_on="o_orderkey"
    )
    cell = defaultdict(lambda: [0, 0])  # (brand, month) -> [spend_c, qty]
    for r in j.itertuples(index=False):
        m = r.o_orderdate.replace(
            day=1, hour=0, minute=0, second=0, microsecond=0
        )
        c = cell[(r.p_brand, m)]
        c[0] += int(round(r.l_extendedprice * 100))
        c[1] += int(round(r.l_quantity))
    p_micro = {
        k: int(round(s * 1e4 / q + 1e-3)) for k, (s, q) in cell.items()
    }
    months = sorted({m for _, m in cell})
    m0 = months[0]
    base = {
        b: (p_micro[(b, m)], cell[(b, m)][1])
        for (b, m) in cell
        if m == m0
    }
    want = {}
    for m in months:
        ln = ld = pn = pdn = 0
        n = 0
        for (b, mm), (s, q) in cell.items():
            if mm != m or b not in base:
                continue
            p0, q0 = base[b]
            p = p_micro[(b, mm)]
            ln += p * q0
            ld += p0 * q0
            pn += p * q
            pdn += p0 * q
            n += 1
        la, pa = ln / ld, pn / pdn
        want[str(m)] = (
            n,
            round(la + 1e-9, 6),
            round(pa + 1e-9, 6),
            round(math.sqrt(la * pa) + 1e-9, 6),
        )
    assert set(got) == set(want)
    for m in want:
        g, w = got[m], want[m]
        assert g[0] == w[0]
        for a, b in zip(g[1:], w[1:]):
            assert a == pytest.approx(b, abs=2e-6)
    # the base month indexes to exactly 1.0 by construction
    assert got[str(m0)][1] == 1.0 and got[str(m0)][2] == 1.0
