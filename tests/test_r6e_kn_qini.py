"""Round-6e: Kneser-Ney bigram scoring + Qini uplift curve — Python
replicas on sf0.001."""

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def test_kneser_ney_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        r.doc_id: (r.n_bigrams, r.lp_micro)
        for r in QUERIES["text_kneser_ney_logprob"](spark, sf).collect()
    }

    docs = pd.read_parquet(f"{sf}/documents.parquet")
    doc_bg = {}
    cb = Counter()
    for r in docs.itertuples(index=False):
        toks = re.sub(r"\s+", " ", r.text).strip().lower().split(" ")
        if len(toks) < 2:
            continue
        bgs = Counter(zip(toks, toks[1:]))
        doc_bg[int(r.doc_id)] = bgs
        cb.update(bgs)
    cw1, n1p, ncont = Counter(), Counter(), Counter()
    for (v, w), c in cb.items():
        cw1[v] += c
        n1p[v] += 1
        ncont[w] += 1
    T = len(cb)
    want = {}
    for d, bgs in doc_bg.items():
        lp = 0
        nb = 0
        for (v, w), cd in bgs.items():
            num = max(4 * cb[(v, w)] - 3, 0) * T + 3 * n1p[v] * ncont[w]
            den = 4.0 * cw1[v] * T
            lp += cd * int(round(math.log(num / den) * 1e6 - 1e-3))
            nb += cd
        want[d] = (nb, lp)
    assert got == want
    # KN log-probs are genuine probabilities: strictly negative
    assert all(lp < 0 for _, lp in want.values())


def test_qini_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    rows = QUERIES["events_uplift_qini"](spark, sf).collect()
    got = {
        r.decile: (r.n_t, r.n_c, r.resp_t, r.resp_c, r.uplift, r.qini_cum)
        for r in rows
    }

    e = pd.read_parquet(f"{sf}/events.parquet")
    users = defaultdict(lambda: [0, 0])  # uid -> [y, score]
    for r in e.itertuples(index=False):
        u = users[int(r.user_id)]
        if r.event_type == "purchase":
            u[0] = 1
        else:
            u[1] += 1

    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    scores = sorted(u[1] for u in users.values())
    n = len(scores)

    def qcont(q):
        pos = (n - 1) * q
        lo = int(math.floor(pos))
        frac = pos - lo
        hi = min(lo + 1, n - 1)
        return round(scores[lo] + frac * (scores[hi] - scores[lo]), 6)

    cuts = [qcont(q / 10) for q in range(1, 10)]
    g = defaultdict(lambda: [0, 0, 0, 0])
    for uid, (y, score) in users.items():
        dec = 1 + sum(1 for c in cuts if score > c)
        treated = h60(f"qini:{uid}") % 2 == 0
        row = g[dec]
        if treated:
            row[0] += 1
            row[2] += y
        else:
            row[1] += 1
            row[3] += y
    want = {}
    cnt = cnc = crt = crc = 0
    for dec in sorted(g, reverse=True):
        n_t, n_c, r_t, r_c = g[dec]
        cnt += n_t
        cnc += n_c
        crt += r_t
        crc += r_c
        up = (
            round(r_t / n_t - r_c / n_c + 1e-9, 6)
            if n_t > 0 and n_c > 0
            else None
        )
        qn = round(crt - crc * cnt / cnc + 1e-9, 6) if cnc > 0 else None
        want[dec] = (n_t, n_c, r_t, r_c, up, qn)
    assert set(got) == set(want)
    for dec in want:
        gg, ww = got[dec], want[dec]
        assert gg[:4] == ww[:4]
        for a, b in zip(gg[4:], ww[4:]):
            if b is None:
                assert a is None
            else:
                assert a == pytest.approx(b, abs=2e-6)
