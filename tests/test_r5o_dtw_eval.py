"""Round-5o operators: banded integer DTW, pass@k estimation, local
clustering coefficient, streaming SpaceSaving heavy hitters."""

import math
from collections import Counter

import pytest


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def _dtw(a, b, band=7, inf=10**15):
    n, m = len(a), len(b)
    prev = [0] + [inf] * m
    for i in range(1, n + 1):
        cur = [inf]
        for j in range(1, m + 1):
            if abs(i - j) <= band:
                cur.append(
                    min(
                        inf,
                        abs(a[i - 1] - b[j - 1])
                        + min(prev[j], prev[j - 1], cur[j - 1]),
                    )
                )
            else:
                cur.append(inf)
        prev = cur
    return prev[m]


def test_dtw_matches_python_dp(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        (r.type_a, r.type_b): r
        for r in QUERIES["event_type_dtw_distance"](spark, sf).collect()
    }
    pdf = (
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr(
            "event_type",
            "cast((unix_micros(cast(ts as timestamp)) -"
            " pmod(unix_micros(cast(ts as timestamp)), 86400000000))"
            " / 86400000000 as long) as day",
            "cast(round(value * 100) as long) as cents",
        )
        .toPandas()
    )
    dmin, dmax = pdf["day"].min(), pdf["day"].max()
    D = int(dmax - dmin) + 1
    curves = {}
    for t, g in pdf.groupby("event_type"):
        arr = [0] * D
        for day, cents in zip(g["day"], g["cents"]):
            arr[int(day - dmin)] += int(cents)
        curves[t] = arr
    types = sorted(curves)
    assert len(got) == len(types) * (len(types) - 1) // 2
    for i, ta in enumerate(types):
        for tb in types[i + 1 :]:
            r = got[(ta, tb)]
            want = _dtw(curves[ta], curves[tb])
            assert r.n_days == D
            assert r.dtw_cents == want
            assert r.dtw_per_step == pytest.approx(
                want / 100.0 / (2.0 * D), abs=2e-6
            )
            # DTW <= the band-constrained diagonal (Euclidean-L1) cost
            diag = sum(
                abs(x - y) for x, y in zip(curves[ta], curves[tb])
            )
            assert r.dtw_cents <= diag


def test_pass_at_k_matches_combinatorial(spark, sf):
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        r.k: r for r in QUERIES["events_pass_at_k"](spark, sf).collect()
    }
    pdf = (
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr(
            "user_id", "cast(round(value * 100) as long) >= 5000 as s"
        )
        .toPandas()
    )
    per = pdf.groupby("user_id")["s"].agg(["count", "sum"])
    assert sorted(got) == [1, 5, 10]
    for k in (1, 5, 10):
        tot = 0
        for n, c in zip(per["count"], per["sum"]):
            n, c = int(n), int(c)
            if c == 0:
                p = 0.0
            elif n - c < k:
                p = 1.0
            else:
                # the exact combinatorial identity the product realizes
                p = 1.0 - math.comb(n - c, k) / math.comb(n, k)
            tot += round(p * 1e6)
        want = tot / 1e6 / len(per)
        r = got[k]
        assert r.n_users == len(per)
        assert r.mean_pass_at_k == pytest.approx(want, abs=len(per) * 2e-6)
        assert 0.0 <= r.mean_pass_at_k <= 1.0
    # monotone in k
    assert got[1].mean_pass_at_k <= got[5].mean_pass_at_k <= got[10].mean_pass_at_k


def test_clustering_coeff_matches_brute_force(spark, sf):
    from datafusion_functions_extra_spark.operators import similarity as SIM
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        r.doc_id: r
        for r in QUERIES["near_dup_clustering_coeff"](spark, sf).collect()
    }
    d = spark.read.parquet(f"{sf}/documents.parquet")
    pairs = {
        (r.id_a, r.id_b)
        for r in SIM.near_dup_pairs(d, "text", "doc_id", 0.5)
        .select("id_a", "id_b")
        .collect()
    }
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for v, nbrs in adj.items():
        deg = len(nbrs)
        if deg < 2:
            assert v not in got
            continue
        tri = sum(
            1
            for u in nbrs
            for w in nbrs
            if u < w and w in adj.get(u, set())
        )
        r = got[v]
        assert (r.degree, r.triangles) == (deg, tri)
        assert r.lcc == pytest.approx(2 * tri / (deg * (deg - 1)), abs=2e-6)
        assert 0.0 <= r.lcc <= 1.0
    assert set(got) == {v for v, nb in adj.items() if len(nb) >= 2}


def _spacesaving_fold(rows, m=8):
    table = {}
    for it in rows:
        if it in table:
            table[it][0] += 1
        elif len(table) < m:
            table[it] = [1, 0]
        else:
            ev = min(table, key=lambda i: (table[i][0], i))
            cmin = table[ev][0]
            del table[ev]
            table[it] = [cmin + 1, cmin]
    return table


def test_streaming_spacesaving_matches_replica_and_bounds(spark, tmp_path):
    import os

    import pandas as pd

    from datafusion_functions_extra_spark.streaming.events import (
        run_available_now,
        streaming_spacesaving_topk,
    )

    sf = "/root/testdata/sf0.001"
    ev = pd.read_parquet(f"{sf}/events.parquet").sort_values("ts")
    src = str(tmp_path / "src")
    os.makedirs(src)
    cuts = [len(ev) // 3, 2 * len(ev) // 3, len(ev)]
    lo, t0 = 0, 1_000_000.0
    for i, hi in enumerate(cuts):
        p = os.path.join(src, f"b{i}.parquet")
        ev.iloc[lo:hi].to_parquet(
            p, coerce_timestamps="us", allow_truncated_timestamps=True
        )
        os.utime(p, (t0 + i, t0 + i))
        lo = hi
    sdf = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = run_available_now(
        streaming_spacesaving_topk(sdf, m=8), output_mode="update"
    ).collect()
    got = Counter(
        (r.event_type, r.item, r.est, r.err, r.guaranteed) for r in out
    )

    # replica: per key, snapshot after each batch that contained rows
    ev_sorted = ev.sort_values(["ts", "event_id"])
    want = Counter()
    for et, g in ev_sorted.groupby("event_type"):
        hist = []
        for i, hi in enumerate(cuts):
            lo_i = 0 if i == 0 else cuts[i - 1]
            batch = ev_sorted[
                (ev_sorted.index.isin(ev.iloc[lo_i:hi].index))
                & (ev_sorted["event_type"] == et)
            ]
            if batch.empty:
                continue
            hist.extend(int(u) for u in batch["user_id"])
            table = _spacesaving_fold(hist)
            for it, (c, e) in table.items():
                want[(et, it, c, e, c - e)] += 1
    assert got == want

    # error-bound contract on the FINAL table vs exact counts
    exact = ev.groupby(["event_type", "user_id"]).size()
    for et, g in ev.groupby("event_type"):
        final = _spacesaving_fold(
            [int(u) for u in ev_sorted[ev_sorted["event_type"] == et]["user_id"]]
        )
        n = len(g)
        for it, (c, e) in final.items():
            true = int(exact.get((et, it), 0))
            assert c >= true >= c - e
        # guarantee: any item with true count > n/m must be in the table
        for (et2, it), true in exact.items():
            if et2 == et and true > n / 8:
                assert it in final
