"""Round-5s operators: Fellegi-Sunter linkage weights, source
modularity of the near-dup graph, split-half quality monitor."""

import math
from collections import Counter, defaultdict

import pytest


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def _r6(x):
    return round(x + 1e-9, 6)


def test_linkage_weights_match_python(spark, sf):
    from datafusion_functions_extra_spark.suite import (
        _FS_LN2,
        _FS_SHIFT,
        QUERIES,
    )

    got = {
        r.field: r
        for r in QUERIES["parts_linkage_weights"](spark, sf).collect()
    }

    parts = (
        spark.read.parquet(f"{sf}/part.parquet")
        .select("p_partkey", "p_name", "p_brand", "p_type", "p_size")
        .toPandas()
    )
    rows = {
        int(r.p_partkey): (r.p_name, r.p_brand, r.p_type, int(r.p_size))
        for r in parts.itertuples(index=False)
    }
    n = len(rows)
    by_name = defaultdict(list)
    for k, (name, *_rest) in rows.items():
        by_name[name].append(k)
    mpairs = [
        (a, b)
        for ks in by_name.values()
        for i, a in enumerate(sorted(ks))
        for b in sorted(ks)[i + 1 :]
    ]
    upairs = [
        (k, (k + _FS_SHIFT) % n)
        for k in rows
        if (k + _FS_SHIFT) % n != k
    ]

    for idx, fname in [(1, "brand"), (2, "type"), (3, "size")]:
        am = sum(1 for a, b in mpairs if rows[a][idx] == rows[b][idx])
        au = sum(1 for a, b in upairs if rows[a][idx] == rows[b][idx])
        m = (am + 1) / (len(mpairs) + 2)
        u = (au + 1) / (len(upairs) + 2)
        r = got[fname]
        assert r.n_match_pairs == len(mpairs)
        assert r.n_random_pairs == len(upairs)
        assert r.n_agree_match == am
        assert r.n_agree_random == au
        assert r.m_prob == pytest.approx(_r6(m), abs=1e-9)
        assert r.u_prob == pytest.approx(_r6(u), abs=1e-9)
        assert r.w_agree == pytest.approx(
            _r6(math.log(m / u) / _FS_LN2), abs=1e-9
        )
        assert r.w_disagree == pytest.approx(
            _r6(math.log((1 - m) / (1 - u)) / _FS_LN2), abs=1e-9
        )
    # the theory identity: m > u iff 1-m < 1-u, so the agreement and
    # disagreement weights always carry opposite signs (the synthetic
    # fields are independent of the name block, so which sign either
    # lands on is sampling noise — only the identity is guaranteed)
    for fname in ("brand", "type", "size"):
        assert got[fname].w_agree * got[fname].w_disagree <= 0


def test_source_modularity_matches_python(spark, sf):
    from datafusion_functions_extra_spark.operators import similarity as SIM
    from datafusion_functions_extra_spark.suite import QUERIES, load_table

    got = {
        r.source: r
        for r in QUERIES["near_dup_source_modularity"](spark, sf).collect()
    }

    d = load_table(spark, sf, "documents")
    pairs = [
        (r.id_a, r.id_b)
        for r in SIM.near_dup_pairs(d, "text", "doc_id", threshold=0.5)
        .select("id_a", "id_b")
        .collect()
    ]
    src = {
        r.doc_id: r.source
        for r in d.select("doc_id", "source").collect()
    }
    m = len(pairs)
    ein = Counter()
    deg = Counter()
    for a, b in pairs:
        sa, sb = src[a], src[b]
        deg[sa] += 1
        deg[sb] += 1
        if sa == sb:
            ein[sa] += 1

    q = 0.0
    for s_ in deg:
        num = 4 * m * ein.get(s_, 0) - deg[s_] ** 2
        contrib = num / (4.0 * m * m)
        assert got[s_].n_edges_within == ein.get(s_, 0)
        assert got[s_].degree == deg[s_]
        assert got[s_].contribution == pytest.approx(
            _r6(contrib), abs=1e-9
        )
        q += num
    tot = got["__total"]
    assert tot.n_edges_within == sum(ein.values()) <= m
    assert tot.degree == 2 * m
    assert tot.contribution == pytest.approx(
        _r6(q / (4.0 * m * m)), abs=1e-9
    )
    # modularity of any partition is bounded
    assert -0.5 <= tot.contribution <= 1.0


def test_quality_monitor_matches_python(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        r.metric: r
        for r in QUERIES["events_quality_monitor"](spark, sf).collect()
    }

    pdf = (
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr(
            "user_id",
            "event_type",
            "props",
            "cast((unix_micros(cast(ts as timestamp)) -"
            " pmod(unix_micros(cast(ts as timestamp)), 86400000000))"
            " / 86400000000 as long) as day",
            "cast(round(value * 100) as long) as cents",
        )
        .toPandas()
    )
    mid = (pdf["day"].min() + pdf["day"].max()) // 2
    halves = {}
    for tag, g in (
        ("h1", pdf[pdf["day"] <= mid]),
        ("h2", pdf[pdf["day"] > mid]),
    ):
        nr = len(g)
        sc = int(g["cents"].sum())
        qc = int((g["cents"] * g["cents"]).sum())
        halves[tag] = {
            "rows": float(nr),
            "distinct_users": float(g["user_id"].nunique()),
            "distinct_types": float(g["event_type"].nunique()),
            "null_props_rate": _r6(
                sum(
                    1
                    for p in g["props"]
                    if p is None or p == ""
                )
                / nr
            ),
            "value_mean_cents": _r6(sc / nr),
            "value_std_cents": _r6(
                math.sqrt((nr * qc - sc * sc) / (nr * (nr - 1)))
            ),
        }
    assert set(got) == set(halves["h1"])
    for metric in halves["h1"]:
        r = got[metric]
        a, b = halves["h1"][metric], halves["h2"][metric]
        assert r.first_half == pytest.approx(a, abs=1e-9), metric
        assert r.second_half == pytest.approx(b, abs=1e-9), metric
        if a != 0:
            assert r.rel_change == pytest.approx(
                _r6((b - a) / a), abs=1e-9
            )
