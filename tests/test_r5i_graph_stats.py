"""Round-5i operators: Kruskal-Wallis, classical seasonal
decomposition, k-core peeling, streaming Gram-sum OLS."""

import pytest


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def test_kruskal_wallis_matches_reference_fold(spark, sf):
    """The histogram/midrank pipeline must equal a direct rank-based
    computation of the tie-corrected H on the same data."""
    from datafusion_functions_extra_spark.suite import QUERIES

    got = QUERIES["event_value_kruskal_wallis"](spark, sf).collect()[0]
    pdf = (
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr("event_type", "cast(round(value * 100) as long) v")
        .toPandas()
    )
    ranks = pdf["v"].rank(method="average")
    n = len(pdf)
    s = 0.0
    for _, grp in pdf.groupby("event_type"):
        r = ranks[grp.index].sum()
        s += r * r / len(grp)
    h_unc = 12.0 / (n * (n + 1)) * s - 3.0 * (n + 1)
    t = pdf["v"].value_counts()
    c = 1.0 - float((t**3 - t).sum()) / (n**3 - n)
    h = h_unc / c
    assert got.n_rows == n
    # the query reports 6-dp rounded stats (house convention)
    assert got.h_stat == pytest.approx(h, abs=6e-7)
    assert 0.0 <= got.p_wh_approx <= 1.0


def test_seasonal_decomposition_centering_and_parity(spark, sf):
    """Seasonal effects must sum to ~0 across the 7 dows, and each dow's
    mean_detrended must match a pandas moving-average recomputation."""
    from datafusion_functions_extra_spark.suite import QUERIES

    rows = sorted(
        QUERIES["events_seasonal_decomposition"](spark, sf).collect(),
        key=lambda r: r.dow,
    )
    assert [r.dow for r in rows] == list(range(7))
    assert sum(r.seasonal for r in rows) == pytest.approx(0.0, abs=1e-5)
    assert all(r.remainder_std >= 0 for r in rows)

    from datafusion_functions_extra_spark.sources import load_table

    pdf = (
        load_table(spark, sf, "events")
        .selectExpr(
            "date_trunc('day', ts) day",
            "pmod(cast((unix_micros(ts) - pmod(unix_micros(ts), 86400000000))"
            " / 86400000000 as long) + 4, 7) dow",
        )
        .groupBy("day", "dow")
        .count()
        .toPandas()
        .sort_values("day", ignore_index=True)
    )
    s7 = pdf["count"].rolling(7, center=True).sum()
    det = pdf["count"] - s7 / 7.0
    by_dow = det.groupby(pdf["dow"]).mean().dropna()
    for r in rows:
        assert r.mean_detrended == pytest.approx(
            float(by_dow[r.dow]), abs=1e-5
        )


def test_kcore_trajectory_invariants(spark, sf):
    """Node/edge counts must be non-increasing, round 0 must match the
    raw candidate graph, and a pandas re-peel must agree round-by-round."""
    from datafusion_functions_extra_spark import operators as _  # noqa: F401
    from datafusion_functions_extra_spark.operators import similarity as SIM
    from datafusion_functions_extra_spark.suite import QUERIES

    rows = sorted(
        QUERIES["near_dup_kcore_peel"](spark, sf).collect(),
        key=lambda r: r.round,
    )
    assert [r.round for r in rows] == list(range(7))
    for a, b in zip(rows, rows[1:]):
        assert b.n_nodes <= a.n_nodes and b.n_edges <= a.n_edges

    d = spark.read.parquet(f"{sf}/documents.parquet")
    pairs = {
        (r.id_a, r.id_b)
        for r in SIM.near_dup_pairs(d, "text", "doc_id", 0.5)
        .select("id_a", "id_b")
        .collect()
    }
    edges = pairs | {(b, a) for a, b in pairs}
    for r in rows:
        nodes = {a for a, _ in edges}
        assert r.n_nodes == len(nodes)
        assert r.n_edges == len(edges) // 2
        deg: dict[int, int] = {}
        for a, _b in edges:
            deg[a] = deg.get(a, 0) + 1
        keep = {v for v, dv in deg.items() if dv >= 2}
        edges = {(a, b) for a, b in edges if a in keep and b in keep}


def test_streaming_gram_ols_matches_batch(spark, sf):
    """The drained streaming Gram sums must equal a batch recomputation
    (the monoid-merge claim), window by window."""
    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        (r.window_start, r.event_type): r
        for r in QUERIES["events_streaming_gram_ols"](spark, sf).collect()
    }
    from datafusion_functions_extra_spark.sources import load_table

    batch = (
        load_table(spark, sf, "events")
        .selectExpr(
            "date_trunc('hour', ts) w",
            "event_type",
            "cast((unix_micros(ts) % 3600000000) div 60000000 as long) x",
            "cast(round(value * 100) as long) y",
        )
        .groupBy("w", "event_type")
        .agg(
            {"*": "count", "x": "sum", "y": "sum"},
        )
        .collect()
    )
    assert len(got) == len(batch)
    for b in batch:
        r = got[(b.w, b.event_type)]
        assert r.n_events == b["count(1)"]
        if r.slope_cents_per_min is not None:
            # intercept + slope*mean(x) == mean(y) (regression identity)
            mx = b["sum(x)"] / b["count(1)"]
            my = b["sum(y)"] / b["count(1)"]
            assert r.intercept_cents + r.slope_cents_per_min * mx == (
                pytest.approx(my, rel=1e-6)
            )
