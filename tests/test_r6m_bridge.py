"""Round-6m: price/volume/joint revenue bridge — Python replica and the
exact-decomposition identity."""

from collections import defaultdict

import pandas as pd
import pytest


def test_bridge_matches_python_and_decomposes_exactly(spark):
    sf = "/root/testdata/sf0.001"
    from datafusion_functions_extra_spark.suite import QUERIES

    rows = QUERIES["brand_price_volume_bridge"](spark, sf).collect()
    got = {
        r.brand: (
            r.rev0_uq,
            r.rev1_uq,
            r.delta_uq,
            r.price_effect_uq,
            r.volume_effect_uq,
            r.joint_effect_uq,
            r.delta_dollars,
        )
        for r in rows
    }

    li = pd.read_parquet(f"{sf}/lineitem.parquet")
    pt = pd.read_parquet(f"{sf}/part.parquet")
    orders = pd.read_parquet(f"{sf}/orders.parquet")
    j = li.merge(pt, left_on="l_partkey", right_on="p_partkey").merge(
        orders, left_on="l_orderkey", right_on="o_orderkey"
    )
    cell = defaultdict(lambda: [0, 0])
    months = set()
    for r in j.itertuples(index=False):
        m = r.o_orderdate.replace(
            day=1, hour=0, minute=0, second=0, microsecond=0
        )
        months.add(m)
        c = cell[(r.p_brand, m)]
        c[0] += int(round(r.l_extendedprice * 100))
        c[1] += int(round(r.l_quantity))
    m0, m1 = min(months), max(months)
    want = {}
    for (b, m), (s, q) in cell.items():
        if m != m0 or (b, m1) not in cell:
            continue
        p0 = int(round(s * 1e4 / q + 1e-3))
        q0 = q
        s1, q1v = cell[(b, m1)]
        p1 = int(round(s1 * 1e4 / q1v + 1e-3))
        r0, r1 = p0 * q0, p1 * q1v
        want[b] = (
            r0,
            r1,
            r1 - r0,
            q0 * (p1 - p0),
            p0 * (q1v - q0),
            (p1 - p0) * (q1v - q0),
            round((r1 - r0) / 1e6, 2),
        )
    assert got == want
    assert want, "fixture should have brands present in both months"
    # the bridge is EXACT: delta == price + volume + joint, to the unit
    for r0, r1, d, pe, ve, je, _ in want.values():
        assert d == pe + ve + je
