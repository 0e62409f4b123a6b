"""BM25 retrieval, Zipf rank-frequency fit, encoding-anomaly screen
(round-4 additions)."""

from __future__ import annotations

import math

import pytest

from datafusion_functions_extra_spark.functions.text import bm25_topk
from datafusion_functions_extra_spark.suite import QUERIES

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "spark join join"),
        (2, "spark scan scan scan scan scan"),
        (3, "hash merge hash"),
        (4, "filter filter filter"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _bm25(tf, dl, avgdl, n, df, k1=1.2, b=0.75):
    idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))


def test_bm25_scores_match_closed_form(docs):
    out = bm25_topk(docs, "text", "doc_id", [("q", ["spark", "join"])], k=4)
    got = {r.doc_id: (r.score, r.rk) for r in out.collect()}
    # corpus: N=4, avgdl=(3+6+3+3)/4; df(spark)=2, df(join)=1
    avgdl = 15 / 4
    d1 = _bm25(1, 3, avgdl, 4, 2) + _bm25(2, 3, avgdl, 4, 1)
    d2 = _bm25(1, 6, avgdl, 4, 2)
    assert got[1][0] == pytest.approx(round(d1, 6), abs=2e-6)
    assert got[2][0] == pytest.approx(round(d2, 6), abs=2e-6)
    # doc 1 matches both terms (one rare) -> rank 1; doc 2 only 'spark'
    assert got[1][1] == 1 and got[2][1] == 2


def test_bm25_is_an_index_probe_not_score_everything(docs):
    out = bm25_topk(docs, "text", "doc_id", [("q", ["hash"])], k=10)
    ids = {r.doc_id for r in out.collect()}
    # docs without any query term never appear (no zero-score rows)
    assert ids == {3}


def test_bm25_length_normalization_prefers_short_docs(spark):
    rows = [(1, "term " + "pad " * 50), (2, "term")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = bm25_topk(df, "text", "doc_id", [("q", ["term"])], k=2).collect()
    top = min(out, key=lambda r: r.rk)
    assert top.doc_id == 2  # same tf, shorter doc scores higher under b>0


def test_zipf_slope_matches_numpy_ols(spark):
    import numpy as np
    import pandas as pd

    row = QUERIES["corpus_zipf_slope"](spark, SF).collect()[0]
    docs = pd.read_parquet(f"{SF}/documents.parquet")
    from collections import Counter

    counts = Counter()
    for t in docs["text"]:
        counts.update(" ".join(t.lower().strip().split()).split(" "))
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    x = np.log(np.arange(1, len(ranked) + 1, dtype=float))
    y = np.log(np.array([c for _, c in ranked], dtype=float))
    slope, icept = np.polyfit(x, y, 1)
    assert row.n_terms == len(ranked)
    assert row.zipf_slope == pytest.approx(slope, abs=1e-5)
    assert row.zipf_intercept == pytest.approx(icept, abs=1e-5)
    assert row.zipf_slope < 0  # frequencies decay with rank


def test_encoding_anomalies_flags_exactly_planted_docs(spark):
    rows = QUERIES["text_encoding_anomalies"](spark, SF).collect()
    flagged = {r.doc_id for r in rows if r.flagged}
    assert flagged == {r.doc_id for r in rows if r.doc_id % 23 == 0 or r.doc_id % 31 == 0}
    by_id = {r.doc_id: r for r in rows}
    for r in rows:
        assert r.n_replacement == (2 if r.doc_id % 23 == 0 else 0)
        assert r.n_control == (1 if r.doc_id % 31 == 0 else 0)
    # clean docs are untouched: no false positives on ASCII prose
    assert not any(r.flagged for r in rows if r.doc_id % 23 and r.doc_id % 31)
    assert by_id[0].flagged  # doc 0 hits both injectors


def test_ann_recall_bounds_and_consistency(spark):
    rows = QUERIES["embedding_ann_recall"](spark, SF).collect()
    assert len(rows) == 8
    for r in rows:
        assert 0 <= r.hits_bucket <= 5 and 0 <= r.hits_multiprobe <= 5
        # multi-probe candidates are a superset of the exact bucket, and
        # true top-5 members always outrank other candidates by cosine,
        # so multi-probe can never recall fewer of them
        assert r.hits_multiprobe >= r.hits_bucket
        assert r.recall_bucket == pytest.approx(r.hits_bucket / 5.0, abs=2e-6)
        assert r.recall_multiprobe == pytest.approx(r.hits_multiprobe / 5.0, abs=2e-6)


def test_triangle_census_matches_python_replica(spark):
    from datafusion_functions_extra_spark.suite import QUERIES as Q

    row = Q["near_dup_triangles"](spark, SF).collect()[0]
    edges = {
        (r.id_a, r.id_b)
        for r in Q["near_dup_pairs"](spark, SF).select("id_a", "id_b").collect()
    }
    assert row.n_edges == len(edges)
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    wedges = sum(len(n) * (len(n) - 1) // 2 for n in adj.values())
    tris = sum(
        1
        for a, b in edges
        for c in adj[a] & adj[b]
        if a < b < c or (a < c and b < c and (a, b) in edges)
    )
    # count each triangle once: a<b from the edge, c > b completes it
    tris = sum(1 for a, b in edges for c in (adj[a] & adj[b]) if c > b)
    assert row.n_wedges == wedges
    assert row.n_triangles == tris
    if wedges:
        assert row.global_clustering == pytest.approx(3 * tris / wedges, abs=2e-6)


def test_multi_touch_attribution_conserves_credit(spark):
    import pandas as pd

    rows = QUERIES["events_multi_touch_attribution"](spark, SF).collect()
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["us"] = ev["ts"].astype("int64") // 1000  # ns -> us
    p = ev[ev.event_type == "purchase"]
    t = ev[ev.event_type != "purchase"]
    n_attributed = 0
    for _, pr in p.iterrows():
        w = t[(t.user_id == pr.user_id) & (t.us >= pr.us - 604800000000) & (t.us < pr.us)]
        if len(w):
            n_attributed += 1
    # each attributed purchase hands out exactly one unit of credit per model
    assert sum(r.first_touch for r in rows) == n_attributed
    assert sum(r.last_touch for r in rows) == n_attributed
    assert sum(r.linear_touch for r in rows) == pytest.approx(n_attributed, abs=1e-4)


def test_pareto_frontier_matches_bruteforce(spark):
    import pandas as pd

    rows = {(r.price, r.sz) for r in QUERIES["parts_pareto_frontier"](spark, SF).collect()}
    pts = {
        (p, s)
        for p, s in pd.read_parquet(f"{SF}/part.parquet")[
            ["p_retailprice", "p_size"]
        ].itertuples(index=False)
    }
    def dominated(a):
        return any(
            q[0] <= a[0] and q[1] <= a[1] and q != a for q in pts
        )
    expected = {a for a in pts if not dominated(a)}
    assert rows == expected


def test_threshold_curve_monotone_and_anchored(spark):
    rows = sorted(
        QUERIES["near_dup_threshold_curve"](spark, SF).collect(),
        key=lambda r: r.threshold,
    )
    assert [r.threshold for r in rows] == [0.5, 0.6, 0.7, 0.8, 0.9]
    for a, b in zip(rows, rows[1:]):
        assert b.n_pairs <= a.n_pairs and b.n_docs_dropped <= a.n_docs_dropped
    n_pairs_05 = QUERIES["near_dup_pairs"](spark, SF).count()
    assert rows[0].n_pairs == n_pairs_05  # 0.5 row == the production pipeline


def test_basket_lift_matches_pandas_replica(spark):
    import pandas as pd
    from itertools import combinations
    from collections import Counter

    rows = QUERIES["brand_basket_lift"](spark, SF).collect()
    li = pd.read_parquet(f"{SF}/lineitem.parquet")[["l_orderkey", "l_partkey"]]
    p = pd.read_parquet(f"{SF}/part.parquet")[["p_partkey", "p_brand"]]
    ob = li.merge(p, left_on="l_partkey", right_on="p_partkey")[
        ["l_orderkey", "p_brand"]
    ].drop_duplicates()
    n_orders = ob["l_orderkey"].nunique()
    n_b = ob["p_brand"].value_counts().to_dict()
    pair_counts = Counter()
    for _, grp in ob.groupby("l_orderkey"):
        for a, b in combinations(sorted(grp["p_brand"]), 2):
            pair_counts[(a, b)] += 1
    expected = {
        k: v for k, v in pair_counts.items() if v >= 10
    }
    got = {(r.brand_a, r.brand_b): (r.n_ab, r.lift) for r in rows}
    assert set(got) == set(expected)
    import pytest as _pt

    for (a, b), n_ab in expected.items():
        lift = n_ab * n_orders / (n_b[a] * n_b[b])
        assert got[(a, b)][0] == n_ab
        assert got[(a, b)][1] == _pt.approx(lift, abs=2e-6)


def test_rolling_wau_matches_pandas_replica(spark):
    import pandas as pd

    rows = {r.day: r.wau for r in QUERIES["events_rolling_distinct_users"](spark, SF).collect()}
    ev = pd.read_parquet(f"{SF}/events.parquet")
    ev["d"] = pd.to_datetime(ev["ts"]).dt.floor("D").dt.date
    du = ev[["d", "user_id"]].drop_duplicates()
    expected = {}
    for d in sorted(du["d"].unique()):
        lo = d - pd.Timedelta(days=6).to_pytimedelta()
        expected[str(d)] = du[(du["d"] <= d) & (du["d"] >= lo)]["user_id"].nunique()
    assert rows == expected
    # the rolling count is always >= the single-day distinct count
    daily = du.groupby("d")["user_id"].nunique()
    for d, n in daily.items():
        assert rows[str(d)] >= n


def test_ship_latency_ordering_invariants(spark):
    import pandas as pd

    rows = QUERIES["orders_ship_latency_percentiles"](spark, SF).collect()
    assert len(rows) == 5  # one per priority
    li = pd.read_parquet(f"{SF}/lineitem.parquet")
    assert sum(r.n_lines for r in rows) == len(li)
    for r in rows:
        assert r.min_days <= r.p50_days <= r.p90_days <= r.max_days
        # (no min_days >= 0 invariant: the synthetic generator draws
        # l_shipdate independently of o_orderdate, so "latencies" can be
        # negative — the rollup reports the data as it is)
