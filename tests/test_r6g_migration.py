"""Round-6g: customer segment migration matrix — Python replica."""

from collections import Counter, defaultdict

import math

import pandas as pd
import pytest


def test_segment_migration_matches_python(spark):
    sf = "/root/testdata/sf0.001"
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        (r.seg_h1, r.seg_h2): (r.n_customers, r.share)
        for r in QUERIES["customer_segment_migration"](spark, sf).collect()
    }

    orders = pd.read_parquet(f"{sf}/orders.parquet")
    cust = pd.read_parquet(f"{sf}/customer.parquet")
    us = sorted(int(t.value) // 1000 for t in orders["o_orderdate"])

    def qcont(vals, q):
        n = len(vals)
        pos = (n - 1) * q
        lo = int(math.floor(pos))
        frac = pos - lo
        hi = min(lo + 1, n - 1)
        return vals[lo] + frac * (vals[hi] - vals[lo])

    mid = qcont(us, 0.5)
    spend = defaultdict(int)
    for r in orders.itertuples(index=False):
        h1 = (int(r.o_orderdate.value) // 1000) <= mid
        spend[(int(r.o_custkey), h1)] += int(round(r.o_totalprice * 100))
    seg = {}
    for h1 in (True, False):
        vals = sorted(v for (c, h), v in spend.items() if h == h1)
        cuts = [
            round(qcont(vals, 0.3333333333333333) + 0, 6),
            round(qcont(vals, 0.6666666666666666) + 0, 6),
        ]
        for (c, h), v in spend.items():
            if h != h1:
                continue
            k = 1 + sum(1 for q in cuts if v > q)
            seg[(c, h1)] = {1: "low", 2: "mid"}.get(k, "high")
    want = Counter()
    custs = [int(c) for c in cust["c_custkey"]]
    for c in custs:
        want[
            (seg.get((c, True), "none"), seg.get((c, False), "none"))
        ] += 1
    n = len(custs)
    wantd = {
        k: (v, round(v / n + 1e-9, 6)) for k, v in want.items()
    }
    assert got == wantd
    # mass balance: the matrix covers every customer exactly once
    assert sum(v for v, _ in got.values()) == n
