"""Round-6b: three-way merge classification, k-anonymity ladder,
learning-curve probe — Python replicas on sf0.001."""

import hashlib
import math
import re
from collections import Counter, defaultdict

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def test_three_way_merge_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        r.doc_id: (r.resolution, r.ours_deleted, r.theirs_deleted)
        for r in QUERIES["docs_three_way_merge"](spark, sf).collect()
    }

    docs = pd.read_parquet(f"{sf}/documents.parquet")
    want = {}
    for r in docs.itertuples(index=False):
        d = int(r.doc_id)
        base = r.text
        ours = None if d % 17 == 0 else (base + " rev2" if d % 13 == 0 else base)
        theirs = None if d % 23 == 0 else (base + " revB" if d % 11 == 0 else base)
        eq_ob, eq_tb, eq_ot = ours == base, theirs == base, ours == theirs
        if eq_ob and eq_tb:
            continue
        if not eq_ob and eq_tb:
            res = "take_ours"
        elif eq_ob and not eq_tb:
            res = "take_theirs"
        elif eq_ot:
            res = "converged"
        else:
            res = "conflict"
        want[d] = (res, ours is None, theirs is None)
    assert got == want
    # the fixture must exercise a genuine conflict (13*11 overlap or
    # delete-vs-modify) and both single-sided takes
    kinds = {v[0] for v in want.values()}
    assert {"take_ours", "take_theirs", "conflict"} <= kinds


def test_k_anon_ladder_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import _KANON_K, QUERIES

    got = {
        r.level: (
            r.n_groups,
            r.min_group_size,
            r.n_under_k,
            r.suppressed_docs,
            r.meets_k,
        )
        for r in QUERIES["docs_k_anon_ladder"](spark, sf).collect()
    }
    docs = pd.read_parquet(f"{sf}/documents.parquet")
    want = {}
    for lvl in range(4):
        g = Counter()
        for r in docs.itertuples(index=False):
            if lvl == 0:
                q = (r.lang, r.source, r.n_chars // 100)
            elif lvl == 1:
                q = (r.lang, r.source, r.n_chars // 1000)
            elif lvl == 2:
                q = (r.lang, r.source)
            else:
                q = (r.lang,)
            g[q] += 1
        under = [n for n in g.values() if n < _KANON_K]
        want[lvl] = (
            len(g),
            min(g.values()),
            len(under),
            sum(under),
            len(under) == 0,
        )
    assert got == want
    # generalizing must never increase the under-k group count
    nk = [want[l][2] for l in range(4)]
    assert nk == sorted(nk, reverse=True) or nk[-1] <= nk[0]


def test_learning_curve_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import _LC_LEVELS, QUERIES

    got = {
        r.train_eighths: (
            r.n_train_docs,
            r.vocab,
            r.n_train_tokens,
            r.n_held_tokens,
            r.lp_micro,
        )
        for r in QUERIES["corpus_learning_curve"](spark, sf).collect()
    }

    docs = pd.read_parquet(f"{sf}/documents.parquet")
    def h60(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    toks = {}
    bucket = {}
    for r in docs.itertuples(index=False):
        d = int(r.doc_id)
        bucket[d] = h60(f"lc:{d}") % 8
        toks[d] = re.sub(r"\s+", " ", r.text).strip().lower().split(" ")
    held = Counter()
    for d, b in bucket.items():
        if b == 7:
            held.update(toks[d])
    want = {}
    for lvl in _LC_LEVELS:
        cnt = Counter()
        ndocs = 0
        for d, b in bucket.items():
            if b < lvl:
                cnt.update(toks[d])
                ndocs += 1
        n, v = sum(cnt.values()), len(cnt)
        lp = sum(
            ch * int(round(math.log((cnt.get(t, 0) + 1.0) / (n + v)) * 1e6 - 1e-3))
            for t, ch in held.items()
        )
        want[lvl] = (ndocs, v, n, sum(held.values()), lp)
    assert got == want
    # more data must not make held-out log-prob worse at the extremes
    assert want[7][4] / want[7][3] >= want[1][4] / want[1][3]
