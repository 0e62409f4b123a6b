"""Round-8 operator batch: SNIS reweighting, Huber IRLS, Platt scaling,
MinHash signature-budget ablation, Yule-Walker AR(2).  Oracle equality is
the driver gate; these pin operator-level contracts the hash can't see
(estimator orderings, invariances, stationarity bounds)."""

from __future__ import annotations

from datafusion_functions_extra_spark import suite

SF = "/root/testdata/sf0.001"


def _one(spark, name):
    return suite.QUERIES[name](spark, SF).collect()[0].asDict()


def test_snis_segment_shift_contract(spark):
    r = _one(spark, "orders_snis_segment_shift")
    # self-normalized weights: ESS <= n always (Kong 1992), equality iff
    # the empirical mix is already the target
    assert 0 < r["ess"] <= r["n_orders"]
    assert 0 < r["ess_ratio"] <= 1.0
    # the uniform-mix estimate stays inside the convex hull of segment
    # means, hence within a broad band of the naive mean on this data
    assert abs(r["snis_mean_dollars"] - r["naive_mean_dollars"]) < 0.5 * r[
        "naive_mean_dollars"
    ]
    assert r["se_dollars"] > 0
    assert r["n_segments"] == 5


def test_huber_downweights_tails(spark):
    r = _one(spark, "lineitem_huber_price_model")
    # some rows must actually be down-weighted (heavy-tailed prices) but
    # the bulk keeps full weight
    assert 0.5 < r["weight_mass"] < 1.0
    assert r["sigma_dollars"] > 0
    # the robust fit differs from OLS (outliers had leverage) yet stays
    # the same sign and order of magnitude
    assert r["slope_huber_dollars"] != r["slope_ols_dollars"]
    assert (
        r["slope_huber_dollars"] * r["slope_ols_dollars"] > 0
        or abs(r["slope_ols_dollars"]) < 1.0
    )


def test_platt_scaling_beats_base_rate(spark):
    r = _one(spark, "quality_platt_scaling")
    # three Newton steps on a convex objective from (0,0) must not lose
    # to the constant base-rate predictor
    assert r["logloss_platt"] <= r["logloss_base"] + 1e-9
    assert r["logloss_platt"] > 0
    assert 0 < r["n_pos"] < r["n_docs"]


def test_minhash_ablation_estimator_ordering(spark):
    r = _one(spark, "minhash_estimator_ablation")
    assert r["n_pairs"] > 0
    for k in ("mae_k16", "mae_k8", "mae_b1"):
        assert r[k] >= 0
    # fewer bits => noisier estimate: the half-signature and the 1-bit
    # signature must not beat the full signature on MAE
    assert r["mae_k8"] >= r["mae_k16"]
    assert r["mae_b1"] >= r["mae_k16"]
    # every |bias| is bounded by its MAE by construction
    assert abs(r["bias_k16"]) <= r["mae_k16"] + 1e-12
    assert abs(r["bias_b1"]) <= r["mae_b1"] + 1e-12


def test_ar2_stationarity_and_forecast_band(spark):
    rows = suite.QUERIES["events_ar2_forecast"](spark, SF).collect()
    assert len(rows) == 5  # one per event type
    for r in [x.asDict() for x in rows]:
        # sample autocorrelations live in [-1, 1]
        assert -1.0 <= r["r1"] <= 1.0 and -1.0 <= r["r2"] <= 1.0
        # innovation variance cannot exceed the series variance and must
        # be positive for a proper AR(2)
        assert r["sigma2"] > 0
        # the 1-step forecast of a count series stays in a sane band
        assert -5.0 < r["forecast_next"] < 1000.0
        # Yule-Walker on |r|<1 data keeps the fitted AR(2) stationary:
        # phi2 in (-1, 1) and phi1 + phi2 < 1, phi2 - phi1 < 1
        assert -1.0 < r["phi2"] < 1.0
        assert r["phi1"] + r["phi2"] < 1.0
        assert r["phi2"] - r["phi1"] < 1.0


def test_effective_rank_bounds(spark):
    r = (
        suite.QUERIES["embedding_effective_rank"](spark, SF)
        .collect()[0]
        .asDict()
    )
    # participation ratio lives in [1, dim]; random iid embeddings sit
    # near dim, a collapsed corpus near 1
    assert 1.0 <= r["effective_rank"] <= r["dim"] + 1e-6
    assert 0.0 < r["erank_ratio"] <= 1.0 + 1e-9
    assert r["total_variance"] > 0 and r["cov_frobenius"] > 0


def test_binscatter_consistent_with_global_ols(spark):
    rows = [
        r.asDict()
        for r in suite.QUERIES["lineitem_binscatter_price"](spark, SF).collect()
    ]
    assert 1 <= len(rows) <= 10
    assert sorted(r["bin"] for r in rows) == [r["bin"] for r in rows]
    # the n-weighted average of bin means IS the global mean (exact
    # decomposition identity, up to the 6-dp rounding of each bin mean)
    n_tot = sum(r["n"] for r in rows)
    wmean = sum(r["n"] * r["y_mean_dollars"] for r in rows) / n_tot
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    from pyspark.sql import functions as F

    gmean = li.agg(F.avg("l_extendedprice")).collect()[0][0]
    assert abs(wmean - gmean) < 0.01
    # every bin mean sits inside the global min/max envelope
    for r in rows:
        assert r["n"] > 0
        assert 0 < r["y_mean_dollars"]
    # within-bin x means sit inside their bin's quantity range
    for r in rows:
        lo, hi = r["bin"] * 5 + 1, r["bin"] * 5 + 5
        assert lo - 1e-9 <= r["x_mean"] <= hi + 1e-9


def test_twoway_fe_within_transform(spark):
    r = (
        suite.QUERIES["lineitem_twoway_fe_price"](spark, SF)
        .collect()[0]
        .asDict()
    )
    assert r["n_rows"] > 0 and r["n_groups_i"] > 1 and r["n_groups_t"] > 1
    # within-R^2 is a squared correlation
    assert 0.0 <= r["corr2_within"] <= 1.0
    # absorbing nation/year effects moves the slope but keeps its scale
    assert abs(r["slope_fe_dollars"]) < 10 * abs(
        r["slope_pooled_dollars"]
    ) + 1.0


def test_payload_entropy_bounds(spark):
    rows = [
        r.asDict()
        for r in suite.QUERIES["multimodal_payload_entropy"](
            spark, SF
        ).collect()
    ]
    assert len(rows) == 500
    import math

    for r in rows:
        # Shannon entropy of a byte histogram: 0 <= H <= min(8, log2 of
        # the support size) and the distinct-byte count bounds it
        assert 0.0 <= r["entropy_bits"] <= 8.0 + 1e-9
        assert r["entropy_bits"] <= math.log2(r["n_distinct_bytes"]) + 1e-6
        assert 1 <= r["n_distinct_bytes"] <= min(256, r["n_bytes"])
    # text-bodied payloads sit in the prose band, not the random band
    import statistics

    m = statistics.mean(r["entropy_bits"] for r in rows)
    assert 3.0 < m < 6.5
