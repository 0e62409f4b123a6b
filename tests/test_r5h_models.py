"""Round-5h model-fitting / summary operators: OLS, isotonic
calibration, mergeable heavy hitters, split-conformal intervals."""

import pytest


@pytest.fixture(scope="module")
def sf():
    return "/root/testdata/sf0.001"


def test_ols_matches_numpy_lstsq(spark, sf):
    """The Cramer-solved normal equations must agree with numpy's
    least-squares fit on the same (q, d100 -> p100) design."""
    import numpy as np

    from datafusion_functions_extra_spark.suite import QUERIES

    got = QUERIES["lineitem_ols_price_model"](spark, sf).collect()[0]
    pdf = (
        spark.read.parquet(f"{sf}/lineitem.parquet")
        .selectExpr(
            "cast(l_quantity as long) q",
            "cast(round(l_discount * 100) as long) d",
            "cast(round(l_extendedprice * 100) as long) y",
        )
        .toPandas()
    )
    X = np.column_stack(
        [np.ones(len(pdf)), pdf["q"].to_numpy(), pdf["d"].to_numpy()]
    ).astype(float)
    y = pdf["y"].to_numpy().astype(float)
    beta, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert got.n_rows == len(pdf)
    assert abs(got.beta0_cents - beta[0]) < 1e-3 * max(1, abs(beta[0]))
    assert abs(got.beta_qty_cents - beta[1]) < 1e-3 * max(1, abs(beta[1]))
    assert abs(got.beta_disc_cents - beta[2]) < 1e-3 * max(1, abs(beta[2]))
    resid = y - X @ beta
    r2 = 1.0 - (resid @ resid) / ((y - y.mean()) @ (y - y.mean()))
    assert abs(got.r_squared - r2) < 1e-6


def test_isotonic_matches_pava(spark, sf):
    """The minimax closed form must equal classic pool-adjacent-
    violators on the same weighted decile bins, and be monotone."""
    from datafusion_functions_extra_spark.suite import QUERIES

    rows = sorted(
        QUERIES["quality_isotonic_calibration"](spark, sf).collect(),
        key=lambda r: r.bin,
    )
    # rebuild (w, y) per bin from the reported raw rates
    w = [r.n_docs for r in rows]
    y = [r.dup_rate for r in rows]
    # PAVA: merge adjacent violating blocks
    blocks = [[wi, wi * yi] for wi, yi in zip(w, y)]  # [weight, weighted sum]
    merged: list[list[float]] = []
    for b in blocks:
        merged.append(list(b))
        while (
            len(merged) > 1
            and merged[-2][1] / merged[-2][0] > merged[-1][1] / merged[-1][0]
        ):
            w2, s2 = merged.pop()
            merged[-1][0] += w2
            merged[-1][1] += s2
    # expand each merged block back to its original bins
    fit = []
    i = 0
    for bw, bs in merged:
        acc = 0.0
        while acc + 1e-9 < bw:
            acc += w[i]
            fit.append(bs / bw)
            i += 1
    got = [r.iso_dup_rate for r in rows]
    assert len(fit) == len(got)
    for g, f in zip(got, fit):
        assert abs(g - f) < 5e-6, (got, fit)
    assert all(a <= b + 1e-12 for a, b in zip(got, got[1:]))


def test_heavy_hitter_bounds(spark, sf):
    """SpaceSaving-merge guarantee: est <= exact <= est + err for every
    reported token, and the top-1 token matches the exact top-1."""
    from pyspark.sql import functions as F

    from datafusion_functions_extra_spark.sources.catalog import load_table
    from datafusion_functions_extra_spark.suite import QUERIES

    rows = QUERIES["token_heavy_hitters_merged"](spark, sf).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.est_count <= r.exact_count <= r.est_count + r.err_bound, r
    from datafusion_functions_extra_spark.functions.text import tokens

    d = load_table(spark, sf, "documents")
    top = (
        d.select(F.explode(tokens("text")).alias("t"))
        .groupBy("t")
        .count()
        .orderBy(F.col("count").desc(), F.col("t").asc())
        .limit(1)
        .collect()[0]
    )
    assert rows[0].token == top.t
    assert rows[0].exact_count == top["count"]


def test_conformal_quantile_and_coverage(spark, sf):
    """qhat must be the exact ceil(0.9*(n+1))-th smallest calibration
    residual (pure-python check) and test coverage should sit near the
    nominal 90% level."""
    import math

    from datafusion_functions_extra_spark.suite import QUERIES

    got = {
        r.event_type: r
        for r in QUERIES["events_conformal_intervals"](spark, sf).collect()
    }
    pdf = (
        spark.read.parquet(f"{sf}/events.parquet")
        .selectExpr(
            "event_type", "user_id", "cast(round(value * 100) as long) v"
        )
        .toPandas()
    )
    cal = pdf[pdf.user_id % 2 == 0]
    for et, g in got.items():
        vs = cal[cal.event_type == et]["v"].to_numpy()
        n = len(vs)
        assert g.n_cal == n
        mc = int(round(vs.sum() / n + 1e-9))
        assert g.center_cents == mc
        res = sorted(abs(int(v) - mc) for v in vs)
        k = min(n, math.ceil(0.9 * (n + 1)))
        assert g.qhat_cents == res[k - 1], (et, g.qhat_cents, res[k - 1])
        # finite-sample marginal coverage: allow sampling slack at sf0.001
        assert g.coverage >= 0.80, (et, g.coverage)
