"""Round-5q operators: windowed strict funnel, golden-record
survivorship, MAP/MRR retrieval eval, Durbin-Levinson PACF, and
sorted-neighborhood blocking."""

import re
from collections import Counter, defaultdict

import pytest


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def _r6(x):
    return round(x + 1e-9, 6)


def _norm(text):
    return re.sub(r"\s+", " ", text).strip().lower()


def test_window_funnel_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import _FUNNEL_W_US, QUERIES

    got = {
        r.level: r.n_users
        for r in QUERIES["events_window_funnel"](spark, sf).collect()
    }

    pdf = (
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr(
            "user_id",
            "event_type",
            "unix_micros(cast(ts as timestamp)) as us",
            "event_id",
        )
        .toPandas()
        .sort_values(["user_id", "us", "event_id"])
    )
    want = Counter()
    for _, g in pdf.groupby("user_id"):
        anchor = None
        best = None
        l1 = l2 = l3 = 0
        for _, row in g.iterrows():
            t, us = row["event_type"], int(row["us"])
            if t == "click" and anchor is not None and us - anchor <= _FUNNEL_W_US:
                l2 = 1
                best = anchor if best is None else max(best, anchor)
            if t == "purchase" and best is not None and us - best <= _FUNNEL_W_US:
                l3 = 1
            # the frame is 1 PRECEDING: update carried state AFTER
            # evaluating the current row
            if t == "view":
                l1 = 1
                anchor = us if anchor is None else max(anchor, us)
        want[1] += l1
        want[2] += l2
        want[3] += l3

    assert got == dict(want)
    assert got[1] >= got[2] >= got[3] > 0


def test_golden_records_survivorship(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    comp = {
        r.doc_id: r.component
        for r in QUERIES["near_dup_components"](spark, sf).collect()
    }
    docs = {
        r.doc_id: (r.n_chars, r.source)
        for r in spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "n_chars", "source")
        .collect()
    }
    members = defaultdict(list)
    for doc_id, c in comp.items():
        members[c].append(doc_id)

    got = {
        r.component: r
        for r in QUERIES["near_dup_golden_records"](spark, sf).collect()
    }
    want_components = {c for c, m in members.items() if len(m) >= 2}
    assert set(got) == want_components
    for c, row in got.items():
        m = members[c]
        assert row.n_members == len(m)
        assert row.total_chars == sum(docs[d][0] for d in m)
        assert row.n_sources == len({docs[d][1] for d in m})
        mx = max(docs[d][0] for d in m)
        assert row.canonical_doc == min(d for d in m if docs[d][0] == mx)


def test_map_mrr_matches_python(spark, sf):
    from datafusion_functions_extra_spark.functions import text as TX
    from datafusion_functions_extra_spark.suite import (
        _BM25_QUERIES,
        _MAP_K,
        QUERIES,
        load_table,
    )

    got = {
        r.query_id: r
        for r in QUERIES["retrieval_map_mrr"](spark, sf).collect()
    }

    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )
    terms_of = {
        doc_id: set(_norm(text).split(" "))
        for doc_id, text in zip(docs["doc_id"], docs["text"])
    }
    d = load_table(spark, sf, "documents")
    bm = TX.bm25_topk(d, "text", "doc_id", _BM25_QUERIES, k=_MAP_K)
    head = defaultdict(dict)
    for r in bm.collect():
        head[r.query_id][r.rk] = r.doc_id

    for qid, qterms in _BM25_QUERIES:
        rel = {d_ for d_, ts in terms_of.items() if set(qterms) <= ts}
        row = got[qid]
        assert row.n_relevant == len(rel)
        ranked = [head[qid][i] for i in sorted(head[qid])]
        first = next(
            (i for i, d_ in enumerate(ranked, 1) if d_ in rel), None
        )
        assert row.first_rel_rank == first
        assert row.rr == pytest.approx(
            _r6(1.0 / first if first else 0.0), abs=1e-9
        )
        cr, psum = 0, 0.0
        for i, d_ in enumerate(ranked, 1):
            if d_ in rel:
                cr += 1
                psum += cr / i
        ap = psum / min(len(rel), _MAP_K)
        assert row.ap_at_10 == pytest.approx(_r6(ap), abs=1e-9)
        assert 0.0 <= row.ap_at_10 <= 1.0


def test_pacf_matches_python_durbin_levinson(spark, sf):
    from datafusion_functions_extra_spark.suite import _PACF_K, QUERIES

    got = defaultdict(dict)
    for r in QUERIES["events_pacf"](spark, sf).collect():
        got[r.event_type][r.lag] = r.pacf

    pdf = (
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr(
            "event_type",
            "cast((unix_micros(cast(ts as timestamp)) -"
            " pmod(unix_micros(cast(ts as timestamp)), 86400000000))"
            " / 86400000000 as long) as day",
        )
        .toPandas()
    )
    for etype, g in pdf.groupby("event_type"):
        daily = Counter(g["day"])
        n = len(daily)
        s = sum(daily.values())
        q = sum(c * c for c in daily.values())
        rho = []
        for lag in range(1, _PACF_K + 1):
            prs = [
                (daily[d], daily[d + lag])
                for d in daily
                if d + lag in daily
            ]
            if not prs or n * (n * q - s * s) == 0:
                rho.append(0.0)
                continue
            p = len(prs)
            scc = sum(a * b for a, b in prs)
            sp = sum(a + b for a, b in prs)
            rho.append(
                _r6(
                    (n * n * scc - n * s * sp + p * s * s)
                    / (n * (n * q - s * s))
                )
            )
        phi = [rho[0]]
        pac = [rho[0]]
        for k in range(1, _PACF_K):
            num = rho[k] - sum(
                phi[j] * rho[k - 1 - j] for j in range(k)
            )
            den = 1.0 - sum(phi[j] * rho[j] for j in range(k))
            pk = _r6(num / den) if den != 0 else 0.0
            phi = [
                _r6(phi[j] - pk * phi[k - 1 - j]) for j in range(k)
            ] + [pk]
            pac.append(pk)
        for lag in range(1, _PACF_K + 1):
            assert got[etype][lag] == pytest.approx(
                pac[lag - 1], abs=1e-9
            ), (etype, lag)
        # PACF(1) == ACF(1) by definition
        assert got[etype][1] == pytest.approx(rho[0], abs=1e-9)


def _shingles(text):
    toks = _norm(text).split(" ")
    if len(toks) >= 3:
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
    return {_norm(text)}


def test_sorted_neighborhood_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import (
        _SNM_KEYLEN,
        _SNM_THRESHOLD,
        _SNM_W,
        QUERIES,
    )

    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in QUERIES["docs_sorted_neighborhood_pairs"](
            spark, sf
        ).collect()
    }

    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )
    keyed = sorted(
        (( _norm(t)[:_SNM_KEYLEN], d), d, _shingles(t))
        for d, t in zip(docs["doc_id"], docs["text"])
    )
    want = {}
    for i in range(len(keyed)):
        for off in range(1, _SNM_W):
            if i + off >= len(keyed):
                continue
            a, b = keyed[i], keyed[i + off]
            inter = len(a[2] & b[2])
            union = len(a[2] | b[2])
            jac = inter / union
            if jac >= _SNM_THRESHOLD:
                key = (min(a[1], b[1]), max(a[1], b[1]))
                want[key] = _r6(jac)
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9)
        assert got[k] >= _SNM_THRESHOLD
