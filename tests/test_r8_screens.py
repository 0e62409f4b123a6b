"""Round-8 batch 2: Bloom decontamination screen, LSH band jackknife,
sequential pattern mining — contract tests beyond the driver hash."""

from __future__ import annotations

from datafusion_functions_extra_spark import suite

SF = "/root/testdata/sf0.001"


def test_bloom_decontam_no_false_negatives(spark):
    r = suite.QUERIES["docs_bloom_decontam"](spark, SF).collect()[0].asDict()
    # Bloom filters never miss a true member: every exactly-contaminated
    # (doc, gram) pair must be bloom-positive, at pair AND doc level
    assert r["n_bloom_pairs"] >= r["n_exact_pairs"]
    assert r["n_docs_bloom"] >= r["n_docs_exact"]
    # the 64 Kbit filter is far from saturated at this corpus size, and
    # the measured FPR must sit near the theoretical (fill_ratio)^k
    assert r["fill_ratio"] < 0.5
    theo = r["fill_ratio"] ** 3
    assert r["pair_fpr"] <= 10 * theo + 0.01
    assert r["n_train_docs"] > 0 and r["n_bench_grams"] > 0


def test_band_jackknife_bounds(spark):
    r = (
        suite.QUERIES["near_dup_band_jackknife"](spark, SF)
        .collect()[0]
        .asDict()
    )
    # leaving a band out can only lose pairs, never add them
    for i in range(4):
        assert 0 <= r[f"n_loo_b{i}"] <= r["n_pairs_full"]
    assert 0 <= r["theta_bar"] <= r["n_pairs_full"]
    assert r["jk_se"] >= 0
    # a pair colliding in >= 2 bands survives every leave-one-out; the
    # full count minus any loo count is the band's EXCLUSIVE pairs
    assert sum(r["n_pairs_full"] - r[f"n_loo_b{i}"] for i in range(4)) <= r[
        "n_pairs_full"
    ] * 4


def test_seq_patterns_apriori_monotonicity(spark):
    rows = [
        r.asDict()
        for r in suite.QUERIES["events_seq_patterns"](spark, SF).collect()
    ]
    assert len(rows) <= 125
    sup2 = {}
    for r in rows:
        sup2[(r["a"], r["b"])] = r["n_users_ab"]
        # a-priori: extending a pattern can only shrink its support
        assert r["n_users_abc"] <= r["n_users_ab"]
        assert 0 < r["confidence"] <= 1.0
        assert 0 < r["support"] <= 1.0
    # downward closure across levels: support(a,b) as a prefix is itself
    # bounded by the level-1 support of a (every user counted for (a,b)
    # has an a) — spot-check via the (a,b) table being internally
    # consistent with the triple table's maxima
    for (a, b), s in sup2.items():
        best_ext = max(
            (r["n_users_abc"] for r in rows if r["a"] == a and r["b"] == b),
            default=0,
        )
        assert best_ext <= s


def test_capture_recapture_identities(spark):
    r = (
        suite.QUERIES["near_dup_capture_recapture"](spark, SF)
        .collect()[0]
        .asDict()
    )
    assert r["n_both"] <= min(r["n_a"], r["n_b"])
    assert r["n_union"] == r["n_a"] + r["n_b"] - r["n_both"]
    # Chapman >= observed union (equality only at full overlap), so the
    # undetected estimate is never negative
    assert r["undetected_est"] >= -1e-6
    assert 0 < r["recall_minhash_est"] <= 1.0 + 1e-9
    assert 0 < r["recall_simhash_est"] <= 1.0 + 1e-9


def test_cka_bounds(spark):
    rows = [
        r.asDict()
        for r in suite.QUERIES["embedding_cka_splits"](spark, SF).collect()
    ]
    assert {r["split"] for r in rows} == {"halves", "even_odd"}
    for r in rows:
        # Cauchy-Schwarz: ||Cxy||_F^2 <= ||Cxx||_F ||Cyy||_F => CKA in [0,1]
        assert 0.0 <= r["cka"] <= 1.0
        assert r["frob_xx"] > 0 and r["frob_yy"] > 0


def test_bands_rows_tradeoff_nested_candidates(spark):
    rows = {
        r["n_bands"]: r.asDict()
        for r in suite.QUERIES["near_dup_bands_rows_tradeoff"](
            spark, SF
        ).collect()
    }
    assert set(rows) == {2, 4, 8}
    # agreement on an r-wide band implies agreement on its sub-bands, so
    # candidate sets are NESTED: cand(2x8) ⊆ cand(4x4) ⊆ cand(8x2),
    # and surviving pair counts inherit the monotonicity
    assert rows[2]["n_candidates"] <= rows[4]["n_candidates"] <= rows[8][
        "n_candidates"
    ]
    assert rows[2]["n_pairs"] <= rows[4]["n_pairs"] <= rows[8]["n_pairs"]
    for r in rows.values():
        assert r["n_pairs"] <= r["n_candidates"]
        assert 0.0 < r["collision_p_at_50"] < 1.0
    # theoretical S-curve ordering matches the banding direction
    assert (
        rows[2]["collision_p_at_50"]
        < rows[4]["collision_p_at_50"]
        < rows[8]["collision_p_at_50"]
    )


def test_silence_segments_invariants(spark):
    rows = [
        r.asDict()
        for r in suite.QUERIES["audio_silence_segments"](spark, SF).collect()
    ]
    assert len(rows) == 500
    for r in rows:
        assert 0 <= r["n_quiet"] <= r["n_samples"]
        assert 0 <= r["n_runs"] <= r["n_quiet"]
        assert 0 <= r["longest_quiet_run"] <= r["n_quiet"]
        if r["n_quiet"] > 0:
            assert r["n_runs"] >= 1 and r["longest_quiet_run"] >= 1
        # runs tile the quiet samples: longest * runs >= quiet count
        assert r["longest_quiet_run"] * max(r["n_runs"], 1) >= r["n_quiet"]


def test_bass_fit_always_one_honest_row(spark):
    r = (
        suite.QUERIES["customers_bass_diffusion_fit"](spark, SF)
        .collect()[0]
        .asDict()
    )
    assert r["n_months"] >= 12
    # regression coefficients always reported; structural params only
    # when the quadratic is concave (bass_valid) — never silently absent
    if r["bass_valid"]:
        assert r["m_market_size"] > 0
        assert r["p_innovation"] is not None and r["q_imitation"] is not None
    else:
        assert r["m_market_size"] is None
        assert r["peak_time_months"] is None


def test_greedy_cover_diminishing_returns(spark):
    rows = [
        r.asDict()
        for r in suite.QUERIES["supplier_coverage_greedy"](spark, SF).collect()
    ]
    assert 1 <= len(rows) <= 5
    gains = [r["newly_covered"] for r in rows]
    # submodularity: marginal gains are non-increasing for greedy
    assert gains == sorted(gains, reverse=True)
    cums = [r["cum_covered"] for r in rows]
    assert cums == sorted(cums)
    # cumulative coverage equals the gain telescoping only if the picked
    # supplier's parts were all previously uncovered — in general each
    # round's cum increase IS its gain (greedy counts uncovered only)
    for i, r in enumerate(rows):
        prev = cums[i - 1] if i else 0
        assert r["cum_covered"] == prev + r["newly_covered"]
        assert 0 < r["coverage_ratio"] <= 1.0 + 1e-9
