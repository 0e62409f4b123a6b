"""Round-5p operators: absorbing-chain conversion analysis, CMH
stratified 2x2 test, Dirichlet query-likelihood retrieval, and the
BM25-vs-QL rank-biased-overlap agreement harness."""

import math
import re
from collections import Counter, defaultdict

import pytest


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def _r6(x):
    return round(x + 1e-9, 6)


def _tokens(text):
    return re.sub(r"\s+", " ", text).strip().lower().split(" ")


_AS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_AS_K = 0.2316419
_SQRT_2PI = 2.5066282746310002


def _phi_tail(x):
    k = 1.0 / (1.0 + _AS_K * x)
    poly = sum(b * k ** (i + 1) for i, b in enumerate(_AS_B))
    return math.exp(-(x * x) / 2.0) / _SQRT_2PI * poly


def _event_seq(spark, sf):
    return (
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr("user_id", "event_id", "ts", "event_type")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )


def test_absorbing_steps_matches_python_neumann(spark, sf):
    from datafusion_functions_extra_spark.suite import (
        _ABSORB_ROUNDS,
        _ABSORB_TARGET,
        QUERIES,
    )

    got = {
        r.event_type: r
        for r in QUERIES["events_absorbing_steps"](spark, sf).collect()
    }

    pdf = _event_seq(spark, sf)
    tr = Counter()
    for _, g in pdf.groupby("user_id"):
        seq = list(g["event_type"])
        for a, b in zip(seq, seq[1:]):
            tr[(a, b)] += 1
    rowm = Counter()
    for (a, _b), c in tr.items():
        rowm[a] += c
    types = sorted(
        {a for (a, _b) in tr} - {_ABSORB_TARGET}
    )
    n = len(types)
    q = [
        [_r6(tr.get((a, b), 0) / rowm[a]) for b in types]
        for a in types
    ]
    rv = [_r6(tr.get((a, _ABSORB_TARGET), 0) / rowm[a]) for a in types]

    tv = [1.0] * n
    hv = list(rv)
    for _ in range(_ABSORB_ROUNDS):
        tv = [
            _r6(1.0 + sum(q[i][j] * tv[j] for j in range(n)))
            for i in range(n)
        ]
        hv = [
            _r6(rv[i] + sum(q[i][j] * hv[j] for j in range(n)))
            for i in range(n)
        ]

    assert set(got) == set(types)
    for i, t in enumerate(types):
        assert got[t].expected_steps == pytest.approx(tv[i], abs=1e-9)
        assert got[t].p_absorbed == pytest.approx(hv[i], abs=1e-9)
        # fundamental-matrix sanity: at least one step to absorb, and
        # the absorption probability is a probability
        assert got[t].expected_steps >= 1.0
        assert -1e-9 <= got[t].p_absorbed <= 1.0 + 1e-9


def test_cmh_matches_python_strata(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    row = QUERIES["events_cmh_error_test"](spark, sf).collect()[0]

    pdf = (
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr(
            "cast((unix_micros(cast(ts as timestamp)) -"
            " pmod(unix_micros(cast(ts as timestamp)), 86400000000))"
            " / 86400000000 as long) as day",
            "cast(user_id % 2 as long) as grp",
            "case when event_type = 'error' then 1 else 0 end as is_err",
        )
        .toPandas()
    )
    strata = defaultdict(lambda: [0, 0, 0, 0])  # n1 e1 n0 e0
    for day, grp, is_err in zip(pdf["day"], pdf["grp"], pdf["is_err"]):
        s = strata[day]
        if grp == 1:
            s[0] += 1
            s[1] += int(is_err)
        else:
            s[2] += 1
            s[3] += int(is_err)

    oe_u = v_u = orn_u = ord_u = 0
    n_strata = 0
    for n1, e1, n0, e0 in strata.values():
        if n1 == 0 or n0 == 0:
            continue
        n_strata += 1
        n, e = n1 + n0, e1 + e0
        oe_u += round((e1 - n1 * (e / n)) * 1e6)
        if n > 1:
            v_u += round((n1 * n0 * e * (n - e)) / (n * n * (n - 1.0)) * 1e6)
        orn_u += round((e1 * (n0 - e0)) / n * 1e6)
        ord_u += round((e0 * (n1 - e1)) / n * 1e6)

    oe, v = oe_u / 1e6, v_u / 1e6
    assert row.n_strata == n_strata
    assert row.o_minus_e == pytest.approx(_r6(oe), abs=1e-9)
    assert row.variance == pytest.approx(_r6(v), abs=1e-9)
    assert v > 0
    chi2 = (oe * oe) / v
    assert row.cmh_chi2 == pytest.approx(_r6(chi2), abs=1e-9)
    z6 = round(math.sqrt(chi2) + 1e-9, 6)
    assert row.p_value == pytest.approx(
        _r6(min(1.0, 2.0 * _phi_tail(z6))), abs=1e-9
    )
    assert 0.0 <= row.p_value <= 1.0
    assert row.mh_odds_ratio == pytest.approx(_r6(orn_u / ord_u), abs=1e-9)
    # user parity is an arbitrary split of a synthetic corpus: the null
    # should comfortably survive
    assert row.p_value > 0.001


def _ql_python(spark, sf, k):
    from datafusion_functions_extra_spark.suite import _BM25_QUERIES, _QL_MU

    docs = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
    )
    tf = Counter()
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        for t in _tokens(text):
            tf[(doc_id, t)] += 1
    dl = Counter()
    cf = Counter()
    for (doc_id, t), c in tf.items():
        dl[doc_id] += c
        cf[t] += c
    ctot = sum(tf.values())

    out = {}
    for qid, terms in _BM25_QUERIES:
        scores = Counter()
        matched = defaultdict(int)
        for t in terms:
            if cf[t] == 0:
                continue
            for doc_id in dl:
                c = tf.get((doc_id, t), 0)
                if c:
                    matched[doc_id] += round(
                        math.log(1.0 + (c * ctot) / (_QL_MU * cf[t])) * 1e6
                    )
        nq = len(terms)
        for doc_id, m in matched.items():
            scores[doc_id] = m + nq * round(
                math.log(_QL_MU / (dl[doc_id] + _QL_MU)) * 1e6
            )
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        out[qid] = ranked[:k]
    return out


def test_ql_topk_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = defaultdict(dict)
    for r in QUERIES["text_ql_topk"](spark, sf).collect():
        got[r.query_id][r.rank] = (r.doc_id, r.score)

    want = _ql_python(spark, sf, k=5)
    assert set(got) == set(want)
    for qid, ranked in want.items():
        assert len(got[qid]) == len(ranked)
        for i, (doc_id, micro) in enumerate(ranked, start=1):
            gdoc, gscore = got[qid][i]
            assert gdoc == doc_id
            assert gscore == pytest.approx(round(micro / 1e6, 6), abs=1e-9)


def test_rbo_consistent_with_heads(spark, sf):
    from datafusion_functions_extra_spark.functions import text as TX
    from datafusion_functions_extra_spark.suite import (
        _BM25_QUERIES,
        _RBO_DEPTH,
        _RBO_P,
        QUERIES,
        load_table,
    )

    got = {
        r.query_id: r
        for r in QUERIES["retrieval_rbo_bm25_ql"](spark, sf).collect()
    }

    d = load_table(spark, sf, "documents")
    bm = TX.bm25_topk(d, "text", "doc_id", _BM25_QUERIES, k=_RBO_DEPTH)
    bm_lists = defaultdict(dict)
    for r in bm.collect():
        bm_lists[r.query_id][r.rk] = r.doc_id
    ql = _ql_python(spark, sf, k=_RBO_DEPTH)

    assert set(got) == set(bm_lists)
    for qid, row in got.items():
        a = [bm_lists[qid][i] for i in sorted(bm_lists[qid])]
        b = [doc for doc, _s in ql[qid]]
        xs = [
            len(
                set(a[: min(dpt, len(a))]) & set(b[: min(dpt, len(b))])
            )
            for dpt in range(1, _RBO_DEPTH + 1)
        ]
        assert row.overlap_at_10 == xs[-1]
        rbo = (1.0 - _RBO_P) * sum(
            _RBO_P ** (dpt - 1) * xs[dpt - 1] / dpt
            for dpt in range(1, _RBO_DEPTH + 1)
        )
        assert row.rbo == pytest.approx(_r6(rbo), abs=1e-9)
        # truncated RBO is bounded by the geometric mass at depth 10
        assert 0.0 <= row.rbo <= 1.0
