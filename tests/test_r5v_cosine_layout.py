"""Round-5v operators: item-item basket cosine, layout skipping eval."""

import math
from collections import Counter, defaultdict

import pytest

from tests.test_r5r_layout_attribution import _xy2d


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def _r6(x):
    return round(x + 1e-9, 6)


def test_basket_cosine_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import (
        _COS_MAX_BASKET,
        _COS_MIN_CO,
        _COS_TOPK,
        QUERIES,
    )

    got = defaultdict(dict)
    for r in QUERIES["parts_basket_cosine"](spark, sf).collect():
        got[r.item][r.rk] = (r.similar_item, r.n_common, r.cosine)

    o = (
        spark.read.parquet(f"{sf}/orders.parquet")
        .select("o_orderkey", "o_custkey")
        .toPandas()
    )
    li = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .toPandas()
    )
    cust_of = dict(zip(o["o_orderkey"], o["o_custkey"]))
    baskets = defaultdict(set)
    for ok, pk in zip(li["l_orderkey"], li["l_partkey"]):
        baskets[int(cust_of[ok])].add(int(pk))
    kept = {c: its for c, its in baskets.items() if len(its) <= _COS_MAX_BASKET}
    ni = Counter()
    co = Counter()
    for its in kept.values():
        for p in its:
            ni[p] += 1
        for p in its:
            for q in its:
                if p != q:
                    co[(p, q)] += 1

    want = defaultdict(list)
    for (p, q), npq in co.items():
        if npq < _COS_MIN_CO:
            continue
        want[p].append((q, npq, _r6(npq / math.sqrt(ni[p] * ni[q]))))
    for p, lst in want.items():
        lst.sort(key=lambda t: (-t[2], t[0]))
        head = lst[:_COS_TOPK]
        assert len(got[p]) == len(head), p
        for rk, (q, npq, cos) in enumerate(head, 1):
            gq, gn, gc = got[p][rk]
            assert (gq, gn) == (q, npq), (p, rk)
            assert gc == pytest.approx(cos, abs=1e-9)
    assert set(got) == set(want)


def test_layout_skipping_eval(spark, sf):
    from datafusion_functions_extra_spark.suite import (
        _SKIP_GROUPS,
        _SKIP_HOUR_HI,
        _SKIP_HOUR_LO,
        _SKIP_USER_HI,
        _SKIP_USER_LO,
        QUERIES,
    )

    got = {
        r.layout: r
        for r in QUERIES["layout_skipping_eval"](spark, sf).collect()
    }
    assert set(got) == {"natural", "morton", "hilbert"}

    pdf = (
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr(
            "event_id",
            "cast(user_id & 255 as long) as xb",
            "cast((unix_micros(cast(ts as timestamp)) div 3600000000)"
            " & 255 as long) as yb",
        )
        .toPandas()
    )
    rows = [
        (int(e), int(x), int(y))
        for e, x, y in zip(pdf["event_id"], pdf["xb"], pdf["yb"])
    ]

    def morton(x, y):
        d = 0
        for i in range(8):
            d += ((x >> i) & 1) << (2 * i)
            d += ((y >> i) & 1) << (2 * i + 1)
        return d

    n = len(rows)
    for layout, key in [
        ("natural", lambda e, x, y: e),
        ("morton", lambda e, x, y: (morton(x, y), e)),
        ("hilbert", lambda e, x, y: (_xy2d(256, x, y), e)),
    ]:
        ordered = sorted(rows, key=lambda t: key(*t))
        zones = defaultdict(
            lambda: [256, -1, 256, -1]
        )  # min_u max_u min_h max_h
        for rn, (_e, x, y) in enumerate(ordered, 1):
            g = (rn - 1) * _SKIP_GROUPS // n
            z = zones[g]
            z[0] = min(z[0], x)
            z[1] = max(z[1], x)
            z[2] = min(z[2], y)
            z[3] = max(z[3], y)
        tu = sum(
            1
            for z in zones.values()
            if z[0] <= _SKIP_USER_HI and z[1] >= _SKIP_USER_LO
        )
        th = sum(
            1
            for z in zones.values()
            if z[2] <= _SKIP_HOUR_HI and z[3] >= _SKIP_HOUR_LO
        )
        r = got[layout]
        assert r.n_groups == len(zones)
        assert r.touched_user_probe == tu, layout
        assert r.touched_hour_probe == th, layout

    # the pruning property is density-dependent: at sf0.001 (1000 rows
    # over a 256x256 grid) every 15-row group can straddle the probe
    # range, so only non-regression is asserted here; at sf0.01 the
    # driver-checked oracle run shows natural=64, morton=20, hilbert=16
    # touched groups on the user probe
    assert (
        got["morton"].touched_user_probe <= got["natural"].touched_user_probe
    )
    assert (
        got["hilbert"].touched_user_probe
        <= got["natural"].touched_user_probe
    )
