"""Round-6o: Burrows' Delta — Python replica on sf0.001."""

import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest


def test_burrows_delta_matches_python(spark):
    sf = "/root/testdata/sf0.001"
    from datafusion_functions_extra_spark.suite import _DELTA_PANEL, QUERIES

    got = {
        (r.source_a, r.source_b): (r.n_terms, r.burrows_delta)
        for r in QUERIES["source_burrows_delta"](spark, sf).collect()
    }

    docs = pd.read_parquet(f"{sf}/documents.parquet")
    ts = defaultdict(Counter)
    for r in docs.itertuples(index=False):
        toks = re.sub(r"\s+", " ", r.text).strip().lower().split(" ")
        ts[r.source].update(toks)
    total = Counter()
    for c in ts.values():
        total.update(c)
    panel = sorted(total, key=lambda t: (-total[t], t))[:_DELTA_PANEL]
    sources = sorted(ts)
    k = len(sources)
    n = {s: sum(ts[s].values()) for s in sources}
    fm = {
        (s, t): int(round(ts[s].get(t, 0) * 1e6 / n[s] + 1e-3))
        for s in sources
        for t in panel
    }
    want = {}
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            zs = []
            for t in panel:
                vals = [fm[(s, t)] for s in sources]
                s1, s2 = sum(vals), sum(v * v for v in vals)
                if k * s2 <= s1 * s1:
                    continue
                sigma = math.sqrt((k * s2 - s1 * s1) / (k * k))
                zs.append(abs(fm[(a, t)] - fm[(b, t)]) / sigma)
            want[(a, b)] = (len(zs), round(sum(zs) / len(zs) + 1e-9, 6))
    assert set(got) == set(want)
    for key in want:
        assert got[key][0] == want[key][0]
        assert got[key][1] == pytest.approx(want[key][1], abs=2e-6)
    # Delta is a distance: strictly positive for distinct sources here
    assert all(v[1] > 0 for v in want.values())
