"""Round-5n operators: Wasserstein drift, log-rank test, CUPED,
Horvitz-Thompson estimation, HITS authorities."""

import hashlib
import math
import re

import numpy as np
import pytest


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def _hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _quality(text: str) -> float:
    from datafusion_functions_extra_spark.functions.text import STOPWORDS

    norm = re.sub(r"\s+", " ", text).strip().lower()
    toks = norm.split(" ")
    stop = sum(1 for t in toks if t in STOPWORDS) / len(toks)
    q = (
        0.3 * min(1.0, len(norm) / 500.0)
        + 0.4 * (len(set(toks)) / len(toks))
        + 0.3 * (1.0 - min(1.0, abs(stop - 0.4) / 0.6))
    )
    return round(q + 1e-9, 6)


def test_wasserstein_matches_sorted_integral(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        (r.src_a, r.src_b): r.w1
        for r in QUERIES["source_score_wasserstein"](spark, sf).collect()
    }
    pdf = spark.read.parquet(f"{sf}/documents.parquet").toPandas()
    pdf["score"] = [_quality(t) for t in pdf["text"]]
    sources = sorted(pdf["source"].unique())
    assert len(got) == len(sources) * (len(sources) - 1) // 2
    vals = np.sort(pdf["score"].unique())
    by_src = {
        s: np.sort(g["score"].to_numpy()) for s, g in pdf.groupby("source")
    }
    for i, sa in enumerate(sources):
        for sb in sources[i + 1 :]:
            a, b = by_src[sa], by_src[sb]
            fa = np.searchsorted(a, vals, side="right") / len(a)
            fb = np.searchsorted(b, vals, side="right") / len(b)
            w1 = float(np.sum(np.abs(fa - fb)[:-1] * np.diff(vals)))
            assert got[(sa, sb)] == pytest.approx(w1, abs=5e-6)
            assert got[(sa, sb)] >= 0.0


def test_logrank_matches_pandas(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = QUERIES["users_logrank_test"](spark, sf).collect()[0]
    e = (
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr(
            "user_id",
            "cast((unix_micros(cast(ts as timestamp)) -"
            " pmod(unix_micros(cast(ts as timestamp)), 86400000000))"
            " / 86400000000 as long) as d",
        )
        .toPandas()
    )
    per = e.groupby("user_id")["d"].agg(["min", "max"])
    dmax = per["max"].max()
    per["dur"] = per["max"] - per["min"]
    per["cens"] = (per["max"] >= dmax - 3).astype(int)
    per["grp"] = per.index % 2
    assert (got.n_grp0, got.n_grp1) == (
        int((per["grp"] == 0).sum()),
        int((per["grp"] == 1).sum()),
    )
    oe = v = 0
    ev0 = ev1 = 0
    for t in sorted(per["dur"].unique()):
        at = per[per["dur"] >= t]
        dead = per[(per["dur"] == t) & (per["cens"] == 0)]
        d, d1 = len(dead), int((dead["grp"] == 1).sum())
        if d == 0:
            continue
        n, n1 = len(at), int((at["grp"] == 1).sum())
        ev0 += d - d1
        ev1 += d1
        oe += round((d1 - d * n1 / n) * 1e6)
        if n > 1:
            v += round(d * (n1 / n) * (1 - n1 / n) * ((n - d) / (n - 1)) * 1e6)
    oe, v = oe / 1e6, v / 1e6
    assert (got.events_grp0, got.events_grp1) == (ev0, ev1)
    assert got.o_minus_e == pytest.approx(oe, abs=2e-6)
    assert got.variance == pytest.approx(v, abs=2e-6)
    if v > 0:
        assert got.chi2 == pytest.approx(oe * oe / v, abs=2e-5)
        assert 0.0 <= got.p_value <= 1.0
    else:
        # all-censored corpus (sf0.001): the test degenerates exactly
        assert got.chi2 is None and got.p_value is None


def test_cuped_matches_numpy(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = QUERIES["events_cuped_adjustment"](spark, sf).collect()[0]
    e = (
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr(
            "user_id",
            "cast((unix_micros(cast(ts as timestamp)) -"
            " pmod(unix_micros(cast(ts as timestamp)), 86400000000))"
            " / 86400000000 as long) as d",
            "cast(round(value * 100) as long) as cents",
        )
        .toPandas()
    )
    mid = (e["d"].min() + e["d"].max()) // 2
    x = e[e["d"] <= mid].groupby("user_id")["cents"].sum()
    y = e[e["d"] > mid].groupby("user_id")["cents"].sum()
    users = e["user_id"].unique()
    xv = np.array([x.get(u, 0) for u in users], dtype=float)
    yv = np.array([y.get(u, 0) for u in users], dtype=float)
    n = len(users)
    cov = float(np.mean(xv * yv) - xv.mean() * yv.mean())
    varx = float(np.mean(xv * xv) - xv.mean() ** 2)
    vary = float(np.mean(yv * yv) - yv.mean() ** 2)
    rho2 = cov * cov / (varx * vary)
    assert got.n_users == n
    assert got.theta == pytest.approx(cov / varx, abs=2e-6)
    assert got.corr_pre_post == pytest.approx(cov / math.sqrt(varx * vary), abs=2e-6)
    assert got.var_reduction_pct == pytest.approx(100 * rho2, abs=2e-4)
    assert 0.0 <= got.var_reduction_pct <= 100.0


def test_ht_estimate_matches_replica(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES
    from datafusion_functions_extra_spark.functions.sampling import N_BUCKETS

    got = QUERIES["docs_ht_estimate"](spark, sf).collect()[0]
    pdf = spark.read.parquet(f"{sf}/documents.parquet").toPandas()

    def ntok(text):
        norm = re.sub(r"\s+", " ", text).strip().lower()
        return 0 if not norm else len(norm.split(" "))

    pdf["y"] = [ntok(t) for t in pdf["text"]]
    true_total = int(pdf["y"].sum())
    est = var = 0
    n_s = 0
    for _, r in pdf.iterrows():
        frac = (_hash60(str(r["doc_id"])) % N_BUCKETS) / N_BUCKETS
        p = r["n_chars"] / 500.0
        if frac < p:
            pi = min(1.0, p)
            n_s += 1
            est += round(r["y"] / pi * 1e6)
            var += round(r["y"] ** 2 * (1 - pi) / pi**2 * 1e6)
    assert got.n_sampled == n_s
    assert got.true_total_tokens == true_total
    assert got.ht_total_tokens == pytest.approx(est / 1e6, abs=2e-6)
    assert got.var_est == pytest.approx(var / 1e6, abs=2e-6)
    assert got.rel_err == pytest.approx(
        abs(est / 1e6 - true_total) / true_total, abs=2e-6
    )
    # the length-weighted design should land within a few sigma
    assert abs(got.ht_total_tokens - true_total) < 6 * math.sqrt(
        max(got.var_est, 1.0)
    )


def test_hits_matches_integer_replica(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES
    from datafusion_functions_extra_spark.suite import _HITS_ROUNDS, _HITS_SCALE

    got = QUERIES["doc_term_hits"](spark, sf).collect()
    pdf = spark.read.parquet(f"{sf}/documents.parquet").toPandas()
    edges = set()
    for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
        norm = re.sub(r"\s+", " ", text).strip().lower()
        for t in norm.split(" "):
            edges.add((int(doc_id), t))
    terms = {t for _, t in edges}
    a = {t: _HITS_SCALE for t in terms}
    for _ in range(_HITS_ROUNDS):
        h = {}
        for d, t in edges:
            h[d] = h.get(d, 0) + a[t]
        mh = max(h.values())
        h = {d: v * _HITS_SCALE // mh for d, v in h.items()}
        a = {}
        for d, t in edges:
            a[t] = a.get(t, 0) + h[d]
        ma = max(a.values())
        a = {t: v * _HITS_SCALE // ma for t, v in a.items()}
    want = sorted(a, key=lambda t: (-a[t], t))[:10]
    assert [r.term for r in sorted(got, key=lambda r: r.rank)] == want
    for r in got:
        assert r.auth_int == a[r.term]
        assert r.authority == pytest.approx(a[r.term] / _HITS_SCALE, abs=1e-6)
    assert got[0].auth_int == _HITS_SCALE  # the max normalizes to 1
