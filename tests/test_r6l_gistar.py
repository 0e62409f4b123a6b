"""Round-6l: Getis-Ord Gi* hotspots — Python replica on sf0.001."""

import math
from collections import Counter

import pytest

from tests.test_r5u_spatial import _points


def test_gistar_matches_python(spark):
    sf = "/root/testdata/sf0.001"
    from datafusion_functions_extra_spark.suite import (
        _GISTAR_CELL,
        _GISTAR_GRID,
        QUERIES,
    )

    got = {
        (r.cx, r.cy): (
            r.n_users,
            r.neighborhood_users,
            r.n_neighbors,
            r.gi_star,
            r.hot_99,
        )
        for r in QUERIES["spatial_hotspots_gistar"](spark, sf).collect()
    }

    pts = _points(spark, sf)
    cnt = Counter(
        (
            (lon + 20_000_000) // _GISTAR_CELL,
            (lat + 20_000_000) // _GISTAR_CELL,
        )
        for lat, lon in pts.values()
    )
    g = _GISTAR_GRID
    n = g * g
    xs = [cnt.get((x, y), 0) for x in range(g) for y in range(g)]
    sx, sxx = sum(xs), sum(v * v for v in xs)
    xbar = sx / n
    s = math.sqrt(sxx / n - xbar * xbar)
    want = {}
    for x in range(g):
        for y in range(g):
            nbrs = [
                (x + dx, y + dy)
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
                if 0 <= x + dx < g and 0 <= y + dy < g
            ]
            k = len(nbrs)
            w = sum(cnt.get(p, 0) for p in nbrs)
            gi = (w - xbar * k) / (s * math.sqrt((n * k - k * k) / (n - 1)))
            c = cnt.get((x, y), 0)
            if c > 0 or gi > 2.576:
                want[(x, y)] = (
                    c,
                    w,
                    k,
                    round(gi + (1e-9 if gi >= 0 else -1e-9), 6),
                    gi > 2.576,
                )
    assert set(got) == set(want)
    for key in want:
        assert got[key][:3] == want[key][:3]
        assert got[key][3] == pytest.approx(want[key][3], abs=2e-6)
        assert got[key][4] == want[key][4]
    # the z-scores are centered: global mean of Gi* over ALL cells ~ 0,
    # so the reported (occupied) cells skew positive
    assert any(v[3] > 0 for v in want.values())
